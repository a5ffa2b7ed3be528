"""Deterministic clip preprocessing (host-side numpy/PIL).

Covers the validation paths the attack flows actually use:
  - Kinetics: Resize(short side, bilinear) → CenterCrop(224) → [0,1] CHW →
    ImageNet Normalize (reference: datasets.py:86-93)
  - UCF-101: Scale(224) → CornerCrop(224,'c') → ToTensor → Normalize with
    LoopPadding(32) (reference: dataset_ucf101.py:113-126)
  - temporal crops incl. the reference's frozen-seed "random" variants
    (transforms_ucf101.py:117-128 — every randomize call reseeds to 1024,
    making preprocessing fully deterministic; reproduced faithfully)

Outputs are float32 (C, T, H, W) normalized clips — the attack/eval contract.
"""

from __future__ import annotations

import random
from typing import Sequence

import numpy as np
from PIL import Image

from ..ops.pixel import IMAGENET_MEAN, IMAGENET_STD

_FROZEN_SEED = 1024  # reference: transforms_ucf101.py:117 et al.


# ---------------------------------------------------------------------------
# spatial
# ---------------------------------------------------------------------------

def resize_short_side(img: Image.Image, size: int) -> Image.Image:
    """Resize so the SHORT side equals ``size``, bilinear."""
    w, h = img.size
    if (w <= h and w == size) or (h <= w and h == size):
        return img
    if w < h:
        return img.resize((size, int(size * h / w)), Image.BILINEAR)
    return img.resize((int(size * w / h), size), Image.BILINEAR)


def center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    x1 = int(round((w - size) / 2.0))
    y1 = int(round((h - size) / 2.0))
    return img.crop((x1, y1, x1 + size, y1 + size))


def corner_crop_center(img: Image.Image, size: int) -> Image.Image:
    """CornerCrop(size, 'c') — the center corner (reference:
    transforms_ucf101.py CornerCrop 'c' branch)."""
    w, h = img.size
    x1 = (w - size) // 2
    y1 = (h - size) // 2
    return img.crop((x1, y1, x1 + size, y1 + size))


def frames_to_normalized_clip(frames: Sequence[Image.Image]) -> np.ndarray:
    """PIL frame list → normalized float32 (C, T, H, W)."""
    arr = np.stack([np.asarray(f, dtype=np.float32) for f in frames])  # THWC
    arr /= 255.0
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    arr = (arr - mean) / std
    return np.transpose(arr, (3, 0, 1, 2))  # CTHW


def kinetics_val_transform(frames_thwc: np.ndarray, short_side: int = 256,
                           crop: int = 224) -> np.ndarray:
    """The Kinetics validation pipeline on a decoded uint8 (T,H,W,C) buffer."""
    imgs = [Image.fromarray(f) for f in frames_thwc]
    imgs = [center_crop(resize_short_side(im, short_side), crop) for im in imgs]
    return frames_to_normalized_clip(imgs)


def ucf_test_transform(frames: Sequence[Image.Image], size: int = 224) -> np.ndarray:
    """UCF-101 eval pipeline on loaded PIL frames."""
    imgs = [corner_crop_center(resize_short_side(im, size), size) for im in frames]
    return frames_to_normalized_clip(imgs)


# ---------------------------------------------------------------------------
# temporal
# ---------------------------------------------------------------------------

def loop_padding(frame_indices: list[int], size: int) -> list[int]:
    """Cycle-pad an index list to ``size`` (reference: LoopPadding,
    transforms_ucf101.py:23-43)."""
    out = list(frame_indices[:size])
    i = 0
    while out and len(out) < size:  # cycle the (growing) list like the reference
        out.append(out[i])
        i += 1
    return out


def temporal_begin_crop(frame_indices: list[int], size: int) -> list[int]:
    return loop_padding(frame_indices[:size], size)


def temporal_center_crop(frame_indices: list[int], size: int) -> list[int]:
    center = len(frame_indices) // 2
    begin = max(0, center - size // 2)
    end = min(begin + size, len(frame_indices))
    return loop_padding(frame_indices[begin:end], size)


def temporal_random_crop(frame_indices: list[int], size: int) -> list[int]:
    """'Random' begin crop with the reference's frozen seed — deterministic
    by construction (transforms_ucf101.py:117-128)."""
    random.seed(_FROZEN_SEED)
    rand_end = max(0, len(frame_indices) - size - 1)
    begin = random.randint(0, rand_end)
    end = min(begin + size, len(frame_indices))
    return loop_padding(frame_indices[begin:end], size)


def random_horizontal_flip(img: Image.Image) -> Image.Image:
    """RandomHorizontalFlip with the reference's frozen seed — p<0.5 drawn
    from a freshly re-seeded RNG is CONSTANT, so this never flips
    (transforms_ucf101.py RandomHorizontalFlip + frozen randomize); kept for
    transform-set parity with the quirk preserved."""
    random.seed(_FROZEN_SEED)
    if random.random() < 0.5:
        return img.transpose(Image.FLIP_LEFT_RIGHT)
    return img


_MULTISCALE_POSITIONS = ("c", "tl", "tr", "bl", "br")


def _corner_crop(img: Image.Image, size: int, position: str) -> Image.Image:
    w, h = img.size
    if position == "c":
        x1, y1 = (w - size) // 2, (h - size) // 2
    elif position == "tl":
        x1, y1 = 0, 0
    elif position == "tr":
        x1, y1 = w - size, 0
    elif position == "bl":
        x1, y1 = 0, h - size
    else:  # br
        x1, y1 = w - size, h - size
    return img.crop((x1, y1, x1 + size, y1 + size))


def multiscale_corner_crop(img: Image.Image, size: int,
                           scales=(1.0, 0.8)) -> Image.Image:
    """MultiScaleCornerCrop with frozen-seed 'random' scale/corner choice
    (transforms_ucf101.py:376-469): deterministic by construction."""
    random.seed(_FROZEN_SEED)
    scale = scales[random.randint(0, len(scales) - 1)]
    position = _MULTISCALE_POSITIONS[
        random.randint(0, len(_MULTISCALE_POSITIONS) - 1)]
    min_len = min(img.size)
    crop = int(min_len * scale)
    return _corner_crop(img, crop, position).resize((size, size), Image.BILINEAR)


def multiscale_random_crop(img: Image.Image, size: int,
                           scales=(1.0, 0.8)) -> Image.Image:
    """MultiScaleRandomCrop with frozen-seed position (transforms_ucf101.py:
    471-503)."""
    random.seed(_FROZEN_SEED)
    scale = scales[random.randint(0, len(scales) - 1)]
    tl_x, tl_y = random.random(), random.random()
    min_len = min(img.size)
    crop = int(min_len * scale)
    x1 = int(tl_x * (img.size[0] - crop))
    y1 = int(tl_y * (img.size[1] - crop))
    return img.crop((x1, y1, x1 + crop, y1 + crop)).resize(
        (size, size), Image.BILINEAR)


def kinetics_clip_indices(n_frames: int, clip_ind: int, clip_len: int = 32,
                          frame_sample_rate: int = 2,
                          num_segment: int = 1) -> np.ndarray:
    """Deterministic frame-index selection seeded by the manifest's
    clip_index (reference: datasets.py:218-241). clip_ind == -1 anchors the
    window at the segment end."""
    converted_len = int(clip_len * frame_sample_rate)
    seg_len = n_frames // num_segment
    all_index = []
    for i in range(num_segment):
        if seg_len <= converted_len:
            index = np.linspace(0, seg_len, num=seg_len // frame_sample_rate)
            index = np.concatenate(
                (index, np.ones(clip_len - seg_len // frame_sample_rate) * seg_len)
            )
            index = np.clip(index, 0, seg_len - 1).astype(np.int64)
        else:
            if clip_ind == -1:
                end_idx = seg_len - 1
            else:
                rng = np.random.RandomState(clip_ind)
                end_idx = rng.randint(converted_len, seg_len)
            str_idx = end_idx - converted_len
            index = np.linspace(str_idx, end_idx, num=clip_len)
            index = np.clip(index, str_idx, end_idx - 1).astype(np.int64)
        all_index.extend(list(index + i * seg_len))
    return np.asarray(all_index, dtype=np.int64)
