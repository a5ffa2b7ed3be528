"""DI-FGSM input diversity as a static-shape gather.

The reference resizes frames to a random size in [224,250), pads randomly to
250, and resizes back to 224, with probability 0.5 (base_attacks.py:356-376).
Dynamic intermediate shapes don't exist under jit, so the whole
resize→pad→resize chain is collapsed into ONE gather with traced *indices*
and static shapes: for each output pixel, compute its source pixel through the
chain (nearest-neighbor both ways) or 0 if it lands in padding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def input_diversity(
    x: jnp.ndarray,
    rng: jax.Array,
    keep_prob: float = 0.5,
    low: int | None = None,
    high: int | None = None,
) -> jnp.ndarray:
    """Apply the DI transform to ``x`` (..., H, W) with H = W = ``low``.

    Defaults derive from the input: low = H, high = round(H·250/224) — the
    reference's fixed 224→[224,250) margin generalized to any resolution.
    With probability ``keep_prob`` the input is returned unchanged — note
    this is the KEEP probability, not torchattacks' diversity_prob apply
    probability (the reference's `random.random() < 0.5: return videos`,
    base_attacks.py:359) — (matching the
    reference's ``random.random() < 0.5`` branch).
    """
    if low is None:
        low = x.shape[-1]
    if high is None:
        high = max(low + 2, round(low * 250 / 224))
    k_apply, k_rnd, k_top, k_left = jax.random.split(rng, 4)
    rnd = jax.random.randint(k_rnd, (), low, high)          # resized size
    h_rem = high - rnd                                       # ≥ 1
    # torch.randint(0, h_rem): uniform over [0, h_rem)
    pad_top = jnp.floor(jax.random.uniform(k_top) * h_rem).astype(jnp.int32)
    pad_left = jnp.floor(jax.random.uniform(k_left) * h_rem).astype(jnp.int32)

    transformed = diversity_gather(x, rnd, pad_top, pad_left, low, high)
    apply = jax.random.uniform(k_apply) >= keep_prob
    return jnp.where(apply, transformed, x)


def diversity_gather(x, rnd, pad_top, pad_left, low: int, high: int):
    """The deterministic resize(low→rnd, nearest) → pad(to high) →
    resize(high→low, nearest) chain for pinned draws, as one gather."""
    out_idx = jnp.arange(low, dtype=jnp.int32)
    # final nearest resize high→low: source index in the padded canvas
    pad_idx = (out_idx * high) // low
    # position inside the resized image (may be out of range → padding)
    in_resized_r = pad_idx - pad_top
    in_resized_c = pad_idx - pad_left
    valid_r = (in_resized_r >= 0) & (in_resized_r < rnd)
    valid_c = (in_resized_c >= 0) & (in_resized_c < rnd)
    # nearest resize low→rnd: source index in the original image
    src_r = jnp.clip((jnp.clip(in_resized_r, 0, None) * low) // rnd, 0, low - 1)
    src_c = jnp.clip((jnp.clip(in_resized_c, 0, None) * low) // rnd, 0, low - 1)

    # Express the per-axis selection as 0/1 matrices and contract on the
    # MXU: out = S_r · x · S_cᵀ. A jnp.take gather would differentiate to a
    # scatter — catastrophically slow on TPU (measured 16× the whole DI-BIM
    # step); the matmul form's VJP is two more matmuls. Each output element
    # sums exactly one (or zero) source element, so values are bit-exact.
    # precision=HIGHEST: the TPU default matmul precision truncates f32
    # operands to bf16, which would quantize the "exact" 0/1 selection and
    # break bit-exactness with the reference's gather-based resize path.
    S_r = jax.nn.one_hot(src_r, low, dtype=x.dtype) * valid_r[:, None].astype(x.dtype)
    S_c = jax.nn.one_hot(src_c, low, dtype=x.dtype) * valid_c[:, None].astype(x.dtype)
    tmp = jnp.einsum("ip,...pq->...iq", S_r, x,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("...iq,jq->...ij", tmp, S_c,
                      precision=jax.lax.Precision.HIGHEST)
