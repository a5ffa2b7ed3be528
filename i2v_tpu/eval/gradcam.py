"""GradCAM saliency (reference C21: image_cam.py + image_cam_utils.py).

For a tapped image bundle:
    cam = ReLU(Σ_k mean_spatial(∂logit_y/∂A_k) · A_k),  min-max normalized,
nearest-upsampled to input size (reference: image_cam.py:97-140).

∂logit/∂(tap activation) is exact: the image modules accept a ``tap_offset``
added to the tap in-flow, and we differentiate w.r.t. the offset at 0 — the
functional replacement for the reference's forward+backward hook pair.

The 'update' branch returns ∂‖cam − ref‖₂/∂input (image_cam.py:132-138);
``average_grad_cam`` reproduces ``average_grad_cam_from_images``
(image_cam.py:9-37); ``visualize_cam`` uses a numpy jet colormap (no cv2).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.api import ImageModel


def _cam_raw(bundle: ImageModel, frames01, labels):
    """(cam (B,h,w), acts) before normalization.

    One forward+backward total: the score closure returns the tap
    activations as ``has_aux`` instead of a separate activation-fetch
    forward, and the offset's shape comes from ``jax.eval_shape``
    (trace-only, no compute). With ``labels=None`` the argmax is taken on
    the in-closure logits — identical to a base-forward argmax since the
    offset is evaluated at zero."""
    key = bundle.tap_keys[0]
    logits_shape, taps_shape = jax.eval_shape(
        lambda f: bundle.module.apply(bundle.params, f), frames01)
    if logits_shape is None:
        raise ValueError(
            f"GradCAM needs logits, but bundle {bundle.name!r} was built "
            "truncated (logits=None); build it with truncate=False")
    acts_shape = taps_shape[key]

    def score(offset):
        logits, taps = bundle.module.apply(bundle.params, frames01,
                                           tap_offset={key: offset})
        labs = jnp.argmax(logits, -1) if labels is None else jnp.asarray(labels)
        return jnp.take_along_axis(logits, labs[:, None], axis=-1).sum(), taps[key]

    grads, acts = jax.grad(score, has_aux=True)(
        jnp.zeros(acts_shape.shape, acts_shape.dtype))
    weights = jnp.mean(grads, axis=(1, 2), keepdims=True)  # α_k (GAP of grads)
    return jax.nn.relu(jnp.sum(weights * acts, axis=-1)), acts


def _minmax(cam):
    # GLOBAL min/max over the whole batch tensor — the reference normalizes
    # with scalar saliency_map.min()/.max() (image_cam.py:128-129), so all
    # frames of a clip share one scale
    lo = jnp.min(cam)
    hi = jnp.max(cam)
    return (cam - lo) / jnp.maximum(hi - lo, 1e-12)


def _upsample(cam, size: int):
    # nearest upsample to (size, size) via gather (any integer ratio)
    idx_r = (jnp.arange(size) * cam.shape[1]) // size
    idx_c = (jnp.arange(size) * cam.shape[2]) // size
    return cam[:, idx_r][:, :, idx_c]


def grad_cam(bundle: ImageModel, frames01, labels=None,
             upsample_to: Optional[int] = None) -> jnp.ndarray:
    """Normalized saliency maps (B, H, W) in [0,1] for the bundle's first tap."""
    cam, _ = _cam_raw(bundle, jnp.asarray(frames01), labels)
    cam = _minmax(cam)
    if upsample_to:
        cam = _upsample(cam, upsample_to)
    return cam


def grad_cam_update(bundle: ImageModel, frames01, ref_cam, labels=None):
    """The 'update' branch: gradient of the summed PER-SAMPLE L2 norms
    ‖cam_i(x) − ref_i‖₂ w.r.t. x (image_cam.py:132-138 computes dim=1 norms
    and backprops grad_outputs=ones, i.e. their sum). NOTE the reference's
    own update branch cannot run as written — it detaches the map via
    ``.data`` before building the cost — so this implements the intent."""
    frames01 = jnp.asarray(frames01)
    ref_cam = jnp.asarray(ref_cam)

    def loss(x):
        cam, _ = _cam_raw(bundle, x, labels)
        diff = (_minmax(cam) - ref_cam).reshape(cam.shape[0], -1)
        return jnp.sum(jnp.sqrt(jnp.sum(diff * diff, axis=1) + 1e-24))

    return jax.grad(loss)(frames01)


def minmax_per_clip(cam: jnp.ndarray, frames_per_clip: int) -> jnp.ndarray:
    """Min-max scale a stacked-frame cam (B·T, h, w) with scalar min/max per
    CLIP of ``frames_per_clip`` frames — the reference normalizes one clip's
    stacked frames with scalar saliency_map.min()/.max() (image_cam.py:
    128-129), so a clip's mask must not depend on its batch-mates."""
    per = cam.reshape(-1, frames_per_clip, *cam.shape[1:])
    lo = per.min(axis=(1, 2, 3), keepdims=True)
    hi = per.max(axis=(1, 2, 3), keepdims=True)
    return ((per - lo) / jnp.maximum(hi - lo, 1e-12)).reshape(cam.shape)


def average_grad_cam(bundles: Sequence[ImageModel], frames01,
                     upsample_to: int = 224,
                     frames_per_clip: Optional[int] = None) -> jnp.ndarray:
    """Mean saliency over several image models, each at its own tap
    (reference: average_grad_cam_from_images, image_cam.py:9-37; that code
    stacks maps of UNEQUAL spatial sizes — unrunnable as written — so maps
    are upsampled to a common size here before averaging).

    ``frames_per_clip``: when the frame batch stacks several clips, each
    model's cam is min-max scaled per clip (see :func:`minmax_per_clip`)
    instead of over the whole batch, making every clip's mask independent
    of its batch-mates. Default keeps the single-clip semantics (one global
    min/max — identical when the batch IS one clip)."""
    cams = []
    for b in bundles:
        cam, _ = _cam_raw(b, jnp.asarray(frames01), None)
        cam = (_minmax(cam) if frames_per_clip is None
               else minmax_per_clip(cam, frames_per_clip))
        cams.append(_upsample(cam, upsample_to))
    return jnp.mean(jnp.stack(cams), axis=0)


# ---------------------------------------------------------------------------
# visualization (cv2-free)
# ---------------------------------------------------------------------------

def _jet(v: np.ndarray) -> np.ndarray:
    """Jet colormap: v in [0,1] → RGB in [0,1]."""
    r = np.clip(1.5 - np.abs(4 * v - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * v - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * v - 1), 0, 1)
    return np.stack([r, g, b], axis=-1)


def visualize_cam(cam, frame01, alpha: float = 0.5) -> np.ndarray:
    """Overlay a (H,W) cam onto an (H,W,3) [0,1] frame → uint8 RGB image
    (reference: image_cam_utils.visualize_cam)."""
    cam = np.asarray(cam)
    frame01 = np.asarray(frame01)
    heat = _jet(cam)
    out = alpha * heat + (1 - alpha) * frame01
    return (np.clip(out, 0, 1) * 255).astype(np.uint8)
