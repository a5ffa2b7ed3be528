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


# CornerCrop(size, 'c') — the center corner (transforms_ucf101.py:345-346)
# is arithmetically identical to center_crop (both round the margin split);
# keep the reference-named alias, not a second copy of the math
corner_crop_center = center_crop


def frames_to_normalized_clip(frames: Sequence[Image.Image]) -> np.ndarray:
    """PIL frame list → normalized float32 (C, T, H, W)."""
    return u8_clip_to_normalized(
        np.stack([np.asarray(f, dtype=np.uint8) for f in frames]))


def u8_clip_to_normalized(u8_thwc: np.ndarray) -> np.ndarray:
    """uint8 (T,H,W,C) → normalized float32 (C,T,H,W) — the host half of the
    ToTensor+Normalize pipeline. Its device twin is
    ``ops.pixel.ingest_u8_clips`` (same f32 ops, same order); keeping the
    arithmetic in one shape here pins the bit-level contract between them."""
    arr = u8_thwc.astype(np.float32)
    arr /= 255.0
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    arr = (arr - mean) / std
    return np.transpose(arr, (3, 0, 1, 2))  # CTHW


def kinetics_val_frames_u8(frames_thwc: np.ndarray, short_side: int = 256,
                           crop: int = 224) -> np.ndarray:
    """The SPATIAL half of the Kinetics validation pipeline: decoded uint8
    (T,H,W,C) → resized+cropped uint8 (T,crop,crop,C). Normalization happens
    on host (``u8_clip_to_normalized``) or on device
    (``ops.pixel.ingest_u8_clips``) depending on the ingest mode."""
    imgs = [Image.fromarray(f) for f in frames_thwc]
    imgs = [center_crop(resize_short_side(im, short_side), crop) for im in imgs]
    return np.stack([np.asarray(im, dtype=np.uint8) for im in imgs])


def kinetics_val_transform(frames_thwc: np.ndarray, short_side: int = 256,
                           crop: int = 224) -> np.ndarray:
    """The Kinetics validation pipeline on a decoded uint8 (T,H,W,C) buffer."""
    return u8_clip_to_normalized(
        kinetics_val_frames_u8(frames_thwc, short_side, crop))


def ucf_test_frames_u8(frames: Sequence[Image.Image], size: int = 224) -> np.ndarray:
    """SPATIAL half of the UCF-101 eval pipeline → uint8 (T,size,size,C)."""
    imgs = [corner_crop_center(resize_short_side(im, size), size) for im in frames]
    return np.stack([np.asarray(im, dtype=np.uint8) for im in imgs])


def ucf_test_transform(frames: Sequence[Image.Image], size: int = 224) -> np.ndarray:
    """UCF-101 eval pipeline on loaded PIL frames."""
    return u8_clip_to_normalized(ucf_test_frames_u8(frames, size))


# ---------------------------------------------------------------------------
# temporal
# ---------------------------------------------------------------------------

def _cycle_pad(out: list[int], size: int) -> list[int]:
    """Cycle-pad like the reference's self-growing `for index in out` loop
    (the appended tail re-enters the iteration, so out[k] = out[k % len0])."""
    i = 0
    while out and len(out) < size:
        out.append(out[i])
        i += 1
    return out


def loop_padding(frame_indices: list[int], size: int) -> list[int]:
    """LoopPadding (transforms_ucf101.py:23-39). NOTE the reference slices
    ``frame_indices[1:size+1]`` — it SKIPS the first entry; with 1-based frame
    indices [1..duration] the clip starts at image_00002."""
    return _cycle_pad(list(frame_indices[1:size + 1]), size)


def temporal_begin_crop(frame_indices: list[int], size: int) -> list[int]:
    """TemporalBeginCrop ≡ LoopPadding, same [1:size+1] slice
    (transforms_ucf101.py:42-61)."""
    return _cycle_pad(list(frame_indices[1:size + 1]), size)


def temporal_center_crop(frame_indices: list[int], size: int) -> list[int]:
    """TemporalCenterCrop: begin clamps to 1, not 0
    (transforms_ucf101.py:84-94)."""
    center = len(frame_indices) // 2
    begin = max(1, center - size // 2)
    end = min(begin + size, len(frame_indices))
    return _cycle_pad(list(frame_indices[begin:end]), size)


def temporal_random_crop(frame_indices: list[int], size: int) -> list[int]:
    """'Random' begin crop with the reference's frozen seed — deterministic
    by construction; rand_end clamps to 1 (transforms_ucf101.py:115-128)."""
    rand_end = max(1, len(frame_indices) - size - 1)
    random.seed(_FROZEN_SEED)
    begin = random.randint(0, rand_end)
    end = min(begin + size, len(frame_indices))
    return _cycle_pad(list(frame_indices[begin:end]), size)


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


def multiscale_corner_crop(img: Image.Image, size: int,
                           scales=(1.0, 0.8)) -> Image.Image:
    """MultiScaleCornerCrop (transforms_ucf101.py:401-469). The reference
    RESEEDS to 1024 before EACH draw, so scale and position both take the
    stream's first value (scale idx 0, position idx 0 = 'c'); its 'c' box is
    center ± crop//2 (an even-sized box), not CornerCrop's rounded split."""
    random.seed(_FROZEN_SEED)
    scale = scales[random.randint(0, len(scales) - 1)]
    random.seed(_FROZEN_SEED)
    position = _MULTISCALE_POSITIONS[
        random.randint(0, len(_MULTISCALE_POSITIONS) - 1)]
    w, h = img.size
    crop = int(min(w, h) * scale)
    if position == "c":
        cx, cy, half = w // 2, h // 2, crop // 2
        box = (cx - half, cy - half, cx + half, cy + half)
    elif position == "tl":
        box = (0, 0, crop, crop)
    elif position == "tr":
        box = (w - crop, 0, w, crop)
    elif position == "bl":
        box = (0, h - crop, crop, h)
    else:  # br
        box = (w - crop, h - crop, w, h)
    return img.crop(box).resize((size, size), Image.BILINEAR)


def multiscale_random_crop(img: Image.Image, size: int,
                           scales=(1.0, 0.8)) -> Image.Image:
    """MultiScaleRandomCrop (transforms_ucf101.py:471-503). The reference
    reseeds before tl_x and again before tl_y — so tl_x == tl_y always — but
    draws scale from the AMBIENT random state; that would leak whatever the
    caller last did with the global RNG into the output, so here the scale
    draw is reseeded too (conscious fix: this module's contract is
    determinism-by-construction; the transform has no shipped eval caller)."""
    random.seed(_FROZEN_SEED)
    scale = scales[random.randint(0, len(scales) - 1)]
    random.seed(_FROZEN_SEED)
    tl_x = random.random()
    random.seed(_FROZEN_SEED)
    tl_y = random.random()
    w, h = img.size
    crop = int(min(w, h) * scale)
    x1 = tl_x * (w - crop)
    y1 = tl_y * (h - crop)
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
    # ONE RNG stream across segments (the reference seeds once and draws
    # sequentially, datasets.py:230-241) — re-seeding per segment would give
    # every segment the identical window offset
    rng = np.random.RandomState(clip_ind) if clip_ind != -1 else None
    for i in range(num_segment):
        if seg_len <= converted_len:
            index = np.linspace(0, seg_len, num=seg_len // frame_sample_rate)
            index = np.concatenate(
                (index, np.ones(clip_len - seg_len // frame_sample_rate) * seg_len)
            )
            index = np.clip(index, 0, seg_len - 1).astype(np.int64)
        else:
            if rng is None:
                end_idx = seg_len - 1
            else:
                end_idx = rng.randint(converted_len, seg_len)
            str_idx = end_idx - converted_len
            index = np.linspace(str_idx, end_idx, num=clip_len)
            index = np.clip(index, str_idx, end_idx - 1).astype(np.int64)
        all_index.extend(list(index + i * seg_len))
    return np.asarray(all_index, dtype=np.int64)
