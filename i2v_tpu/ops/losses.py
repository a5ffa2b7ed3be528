"""Attack loss functions, vmapped over the frame axis where per-frame.

All losses are pure functions of activations; feature taps arrive as explicit
function outputs (no hooks). Semantics match the reference exactly:
  - per-frame cosine similarity  (reference: image_attacks.py:336-347)
  - activation-std dispersion    (reference: image_attacks.py:216-220)
  - TAP signed-sqrt feature distance (reference: base_attacks.py:784-792)
  - ILAF direction/magnitude gain    (reference: image_attacks.py:597-613)
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

# torch.nn.functional.cosine_similarity clamps each norm at eps=1e-8.
_COS_EPS = 1e-8


def cosine_similarity_flat(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity between row-flattened features, one value per row.

    ``a``/``b``: (N, ...) — flattened to (N, D). Matches
    ``F.cosine_similarity(a.view(N,-1), b.view(N,-1))`` including the
    per-vector norm clamp at 1e-8.
    """
    n = a.shape[0]
    af = a.reshape(n, -1).astype(jnp.float32)
    bf = b.reshape(n, -1).astype(jnp.float32)
    dot = jnp.sum(af * bf, axis=-1)
    na = jnp.maximum(jnp.linalg.norm(af, axis=-1), _COS_EPS)
    nb = jnp.maximum(jnp.linalg.norm(bf, axis=-1), _COS_EPS)
    return dot / (na * nb)


def i2v_cost(
    taps_adv: Sequence[jnp.ndarray],
    taps_clean: Sequence[jnp.ndarray],
    frame_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """The I2V objective: Σ over taps of per-frame cosine similarity, summed
    over frames (reference: image_attacks.py:336-347). Minimized.

    ``frame_weights`` (N,): optional per-frame validity mask — the sharded
    pad-and-slice path zeroes pad frames out of the cost so a padded batch
    computes the exact unpadded objective. A weight of 1.0 multiplies
    exactly (IEEE), so the unmasked reduction order/numerics are unchanged.
    """
    total = 0.0
    for a, c in zip(taps_adv, taps_clean):
        cos = cosine_similarity_flat(a, c)
        if frame_weights is not None:
            cos = cos * frame_weights
        total = total + jnp.sum(cos)
    return total


def per_tap_frame_cosines(
    taps_adv: Sequence[jnp.ndarray], taps_clean: Sequence[jnp.ndarray]
) -> jnp.ndarray:
    """Stacked per-tap per-frame cosine matrix (n_taps, N) used by the adaptive
    AENS re-weighting (reference: TPAMI_attack.py:271-287).
    """
    return jnp.stack([cosine_similarity_flat(a, c) for a, c in zip(taps_adv, taps_clean)])


def dispersion_cost(taps: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Dispersion-Reduction objective: Σ std(activations) over taps, minimized
    (reference: image_attacks.py:216-220). torch ``.std()`` is the unbiased
    (ddof=1) std over all elements.
    """
    total = 0.0
    for t in taps:
        t = t.astype(jnp.float32)
        total = total + jnp.std(t, ddof=1)
    return total


def tap_feature_distance(
    taps_adv: Sequence[jnp.ndarray], taps_clean: Sequence[jnp.ndarray], batch: int
) -> jnp.ndarray:
    """TAP mid-layer distance: per-sample L2 between sign(f)·sqrt(|f|) maps,
    summed over taps → (batch,) (reference: base_attacks.py:789-792).
    Uses the NaN-safe :func:`i2v_tpu.ops.activations.signed_sqrt`.
    """
    from .activations import signed_sqrt

    per_tap = []
    for a, c in zip(taps_adv, taps_clean):
        a32, c32 = a.astype(jnp.float32), c.astype(jnp.float32)
        d = signed_sqrt(a32).reshape(batch, -1) - signed_sqrt(c32).reshape(batch, -1)
        # ε-regularized L2: at step 0 adv == clean, and the exact norm's
        # gradient is 0/0 (a second latent NaN in the reference formulation).
        per_tap.append(jnp.sqrt(jnp.sum(d * d, axis=1) + 1e-12))
    return jnp.sum(jnp.stack(per_tap), axis=0)


def ilaf_cost(
    taps_step: Sequence[jnp.ndarray],
    taps_clean: Sequence[jnp.ndarray],
    init_directions: Sequence[jnp.ndarray],
    init_norms: Sequence[jnp.ndarray],
) -> jnp.ndarray:
    """ILAF objective (minimized): −Σ_taps (0.5·‖Δ_step‖/‖Δ_init‖ + ⟨dir_init, dir_step⟩)
    where Δ = feat(step) − feat(clean) (reference: image_attacks.py:597-613).
    """
    total = 0.0
    for step_t, clean_t, init_dir, init_norm in zip(
        taps_step, taps_clean, init_directions, init_norms
    ):
        delta = (step_t - clean_t).astype(jnp.float32)
        # smooth safe norm: ∂‖δ‖/∂δ is NaN at δ=0 under autodiff; the epsilon
        # inside the sqrt keeps the adv==clean degenerate case finite
        step_norm = jnp.sqrt(jnp.sum(delta * delta) + 1e-24)
        step_dir = delta / step_norm
        magnitude_gain = step_norm / (init_norm + 1e-12)
        angle = jnp.sum(init_dir.astype(jnp.float32) * step_dir)
        total = total + -(0.5 * magnitude_gain + angle)
    return total


def feature_delta_direction(taps_adv, taps_clean):
    """Normalized feature-delta directions + norms for ILAF initialization
    (reference: image_attacks.py:561-567). Returns (directions, norms)."""
    dirs, norms = [], []
    for a, c in zip(taps_adv, taps_clean):
        d = (a - c).astype(jnp.float32)
        n = jnp.linalg.norm(d)
        dirs.append(d / (n + 1e-12))  # 0/0 guard when adv == clean
        norms.append(n)
    return dirs, norms


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax cross-entropy, identical to ``nn.CrossEntropyLoss()``."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)
