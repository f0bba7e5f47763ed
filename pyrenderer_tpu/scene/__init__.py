from pyrenderer_tpu.scene.types import Scene, Camera  # noqa: F401
from pyrenderer_tpu.scene.tungsten import load_tungsten  # noqa: F401
