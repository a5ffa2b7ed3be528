"""Kinetics-400 attack-sample pipeline (reference C3: datasets.py).

Manifest: CSV with columns path,gt_label,clip_index — one correctly-classified
clip per class (reference C30). Decode goes through the native C++
FFmpeg library (:mod:`i2v_tpu.data.decode`, the decord-equivalent), frames are
resized to a fixed (new_width × new_height) canvas at decode time, then the
validation transform + deterministic seeded clip selection produce the
(3, 32, 224, 224) normalized clip. Corrupt/missing/too-small videos are
skipped with a warning and a resample (reference: datasets.py:127-147).
"""

from __future__ import annotations

import dataclasses
import os
import warnings
from typing import Iterator, Optional

import numpy as np

from . import transforms
from .decode import decode_video


@dataclasses.dataclass
class KineticsSample:
    path: str
    label: int
    clip_index: int


def read_manifest(anno_path: str) -> list[KineticsSample]:
    import pandas as pd

    df = pd.read_csv(anno_path)
    return [
        KineticsSample(p, int(l), int(c))
        for p, l, c in zip(df["path"], df["gt_label"], df["clip_index"])
    ]


class KineticsAttackDataset:
    """Validation-mode dataset yielding (clip(3,32,224,224) normalized f32,
    label, video_name, clip_ind) — the reference item contract
    (datasets.py:138-150)."""

    def __init__(self, anno_path: str, data_path: str, *, clip_len: int = 32,
                 frame_sample_rate: int = 2, crop_size: int = 224,
                 short_side_size: int = 256, new_height: int = 256,
                 new_width: int = 340, num_segment: int = 1,
                 raw_uint8: bool = False):
        self.samples = read_manifest(anno_path)
        self.data_path = data_path
        self.clip_len = clip_len
        self.frame_sample_rate = frame_sample_rate
        self.crop_size = crop_size
        self.short_side_size = short_side_size
        self.new_height = new_height
        self.new_width = new_width
        self.num_segment = num_segment
        self.raw_uint8 = raw_uint8

    def __len__(self) -> int:
        return len(self.samples)

    def _fname(self, sample: KineticsSample) -> Optional[str]:
        fname = os.path.join(self.data_path, sample.path)
        if not os.path.exists(fname):
            return None
        if os.path.getsize(fname) < 1024:  # reference: datasets.py:197-199
            warnings.warn(f"SKIP tiny file: {fname}")
            return None
        return fname

    def _select_clip(self, frames, sample: KineticsSample) -> Optional[np.ndarray]:
        if frames is None or len(frames) == 0:
            return None
        idx = transforms.kinetics_clip_indices(
            len(frames), sample.clip_index, self.clip_len,
            self.frame_sample_rate, self.num_segment,
        )
        return frames[idx]

    def _load(self, sample: KineticsSample) -> Optional[np.ndarray]:
        fname = self._fname(sample)
        if fname is None:
            return None
        try:
            frames = decode_video(fname, width=self.new_width, height=self.new_height)
        except Exception as e:
            warnings.warn(f"video cannot be decoded: {fname}: {e}")
            return None
        return self._select_clip(frames, sample)

    def load_batch(self, indices) -> list:
        """Batch decode on the native thread pool (one GIL-free C++ call for
        the whole batch — the runtime dual of the reference's 9 DataLoader
        workers, datasets.py:272-274). Per-item failures fall back to
        __getitem__'s skip-and-resample. Returns the __getitem__ tuples."""
        from . import native

        if not native.available():
            return [self[i] for i in indices]
        samples = [self.samples[i] for i in indices]
        fnames = [self._fname(s) for s in samples]
        # sidecar (.npy/.npz) entries go through decode.decode_video's
        # dispatch, not the FFmpeg pool (which would fail-and-refall-back)
        todo = [(j, f) for j, f in enumerate(fnames)
                if f is not None and not f.endswith((".npy", ".npz"))]
        decoded = native.decode_videos(
            [f for _, f in todo], width=self.new_width, height=self.new_height
        )
        # sidecars decode via dispatch; missing/tiny files (fname None) are
        # already known failures — no point re-decoding them
        buffers = [self._load(s) if f is not None and f.endswith((".npy", ".npz"))
                   else None
                   for f, s in zip(fnames, samples)]
        for (j, _), frames in zip(todo, decoded):
            buffers[j] = self._select_clip(frames, samples[j])
        out = []
        for sample, buffer in zip(samples, buffers):
            if buffer is None:
                # decode already failed once here — resample directly
                # instead of re-decoding the known-bad file via self[i]
                out.append(self._resample(sample))
                continue
            out.append(self._pack(sample, buffer))
        return out

    def _pack(self, sample: KineticsSample, buffer: np.ndarray):
        """Apply the validation transform and build the item tuple — the
        single home of the reference item contract (datasets.py:138-150).
        ``raw_uint8`` keeps the clip as the cropped (T,H,W,3) uint8 buffer
        for device-side normalization (ops.pixel.ingest_u8_clips) — 4× less
        host→device traffic, bit-identical downstream numerics."""
        frames_u8 = transforms.kinetics_val_frames_u8(
            buffer, self.short_side_size, self.crop_size
        )
        clip = (frames_u8 if self.raw_uint8
                else transforms.u8_clip_to_normalized(frames_u8))
        return clip, sample.label, sample.path.split(".")[0], sample.clip_index

    def _resample(self, sample: KineticsSample):
        """skip-and-resample (datasets.py:142-147): random picks until one
        loads. ``sample`` is the already-failed item (for the warning).
        Bounded: if no draw succeeds in 3·len(dataset) tries the data source
        itself is broken (wrong path, unmounted volume) — raise loudly
        instead of spinning the warning loop forever."""
        for _ in range(3 * len(self)):
            warnings.warn(f"video {sample.path} not correctly loaded; resampling")
            sample = self.samples[np.random.randint(len(self))]
            buffer = self._load(sample)
            if buffer is not None:
                return self._pack(sample, buffer)
        raise RuntimeError(
            f"no video in the manifest decoded after {3 * len(self)} random "
            f"draws — the data source looks unusable (root: {self.data_path!r})")

    def __getitem__(self, index: int):
        sample = self.samples[index]
        buffer = self._load(sample)
        if buffer is None:
            return self._resample(sample)
        return self._pack(sample, buffer)


def iterate_batches(dataset, batch_size: int, left: int = 0,
                    right: Optional[int] = None) -> Iterator[dict]:
    """Sequential batcher over a [left, right) manifest shard. Returns dicts
    with stacked 'clips' (B,3,T,H,W), 'labels', 'names', 'clip_inds'."""
    right = len(dataset) if right is None else min(right, len(dataset))
    batched = getattr(dataset, "load_batch", None)
    for start in range(left, right, batch_size):
        idxs = range(start, min(start + batch_size, right))
        items = batched(idxs) if batched else [dataset[i] for i in idxs]
        clips, labels, names, inds = zip(*items)
        yield {
            "clips": np.stack(clips),
            "labels": np.asarray(labels, np.int32),
            "names": list(names),
            "clip_inds": list(inds),
        }
