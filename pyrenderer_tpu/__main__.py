import sys

from pyrenderer_tpu.render.cli import main

sys.exit(main())
