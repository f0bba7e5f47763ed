"""Film: progressive accumulation state with checkpoint/resume.

The reference's checkpointable state is (HDR radiance sum, spp count)
dumped as hdr.npy/spp.npy (reference main_taichi.py:119-123, consumed by
tone_map.py:5-6) — but the dump is commented out and Tungsten's
resume_render fields in scene.json are ignored (SURVEY §5.4). Here resume
is first-class: accumulation is associative, so a checkpoint is exactly
(radiance_sum, spp, next_sample_id, seed) and resuming just keeps adding.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class Film:
    radiance_sum: np.ndarray   # (H, W, 3) float32 — running sum over samples
    spp: int                   # samples accumulated so far
    seed: int                  # RNG seed the accumulation was made with
    next_sample: int           # next sample_id to render

    @classmethod
    def blank(cls, width: int, height: int, seed: int) -> "Film":
        return cls(
            radiance_sum=np.zeros((height, width, 3), np.float32),
            spp=0,
            seed=seed,
            next_sample=0,
        )

    def add_pass(self, radiance: np.ndarray, n_samples: int = 1) -> None:
        """Accumulate a pass's summed radiance image (H, W, 3)."""
        self.radiance_sum = self.radiance_sum + np.asarray(radiance, np.float32)
        self.spp += n_samples
        self.next_sample += n_samples

    @property
    def hdr(self) -> np.ndarray:
        """Mean radiance."""
        return self.radiance_sum / max(self.spp, 1)

    def save(self, path: str) -> None:
        np.savez(
            path,
            radiance_sum=self.radiance_sum,
            spp=self.spp,
            seed=self.seed,
            next_sample=self.next_sample,
        )

    @classmethod
    def load(cls, path: str) -> "Film":
        with np.load(path) as data:
            return cls(
                radiance_sum=data["radiance_sum"],
                spp=int(data["spp"]),
                seed=int(data["seed"]),
                next_sample=int(data["next_sample"]),
            )
