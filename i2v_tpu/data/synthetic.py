"""Synthetic clip source: checkpoint-/dataset-free end-to-end runs and the
smoke-test path (SURVEY.md §4 'end-to-end smoke'). Deterministic per label."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..ops.pixel import IMAGENET_MEAN, IMAGENET_STD


class SyntheticAttackDataset:
    """Yields (clip(3,T,H,W) normalized f32, label, name, clip_ind) items with
    the Kinetics item contract; pixel content is a deterministic function of
    the label."""

    def __init__(self, n_samples: int = 8, clip_len: int = 32, size: int = 224,
                 n_classes: Optional[int] = None, raw_uint8: bool = False):
        self.n_samples = n_samples
        self.clip_len = clip_len
        self.size = size
        self.n_classes = n_classes or n_samples
        self.raw_uint8 = raw_uint8

    def __len__(self) -> int:
        return self.n_samples

    def __getitem__(self, index: int):
        label = index % self.n_classes
        rng = np.random.RandomState(label)
        if self.raw_uint8:
            # u8-ingest smoke path: (T,H,W,3) uint8, normalized on device
            # (same rng stream, different shape — synthetic content has no
            # cross-mode equality contract, only determinism per label)
            return (rng.randint(0, 256,
                                (self.clip_len, self.size, self.size, 3),
                                dtype=np.uint8),
                    label, f"synthetic_{label}", label)
        clip01 = rng.rand(3, self.clip_len, self.size, self.size).astype(np.float32)
        mean = np.asarray(IMAGENET_MEAN, np.float32)[:, None, None, None]
        std = np.asarray(IMAGENET_STD, np.float32)[:, None, None, None]
        clip = (clip01 - mean) / std
        return clip, label, f"synthetic_{label}", label


# same batcher contract as Kinetics (its load_batch fallback covers
# per-item datasets like this one) — re-exported rather than duplicated
from .kinetics import iterate_batches  # noqa: E402,F401
