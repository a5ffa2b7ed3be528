"""Pallas TPU kernels for the attack pixel math — validated on-chip, with
the XLA-fused jnp path as the MEASURED production default.

Two elementwise fusions dominate the per-step pixel math:

  1. ``sign_step_project`` — α·sign(g) step + ε-ball projection + [0,1] clip
     (the per-step tail of every iterative sign attack, reference:
     base_attacks.py:289-293).

  2. ``rebuild_adv`` — clamp(clean + clamp(modifier, ±ε), 0, 1), the
     differentiable input-rebuild of the Adam-based image-guided attacks
     (reference: image_attacks.py:331). Exposed with a custom VJP whose
     backward masks match torch.clamp semantics (gradient passes on the
     closed interval), itself a fused Pallas kernel.

Measured status on this project's TPU (PERF_PROBE.json ``exec_pallas``, the
forced-on probe): both kernels compile and execute correctly —
``sign_step_project`` is bit-identical to the jnp path; ``rebuild_adv``'s
VJP differs only at exact clip-boundary ties, where it passes the full
gradient (torch.clamp closed-interval semantics) while jnp.clip splits ties
50/50. But the standalone Pallas ``sign_step_project`` measures ~1.7×
SLOWER than the XLA-fused jnp chain at production size: XLA already fuses
the whole elementwise chain into adjacent kernels, while a separate
pallas_call pays its own HBM round trip and grid overhead. The production
gate (:func:`_on_tpu`) therefore keeps the jnp path on this environment —
a measured decision, not an untested fallback.

Both kernels operate on arbitrary-shaped f32 arrays by viewing them as
(rows, 128) lane-aligned blocks; shapes whose element count is not
lane-aligned (or non-TPU backends, e.g. the CPU test mesh) fall back to the
identical pure-jnp path in :mod:`i2v_tpu.ops.pixel`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pixel

import os as _os

_LANES = 128
_SUBLANES = 8
# Rows per grid step: 512×128 f32 block = 256 KiB/operand; 4 operands in VMEM
# stay far under the ~16 MiB budget while amortizing grid overhead.
# Env-tunable so the exec_pallas probe can sweep it on-chip.
_BLOCK_ROWS = int(_os.environ.get("I2V_TPU_PALLAS_BLOCK_ROWS", "512"))


def _on_tpu() -> bool:
    import os

    if os.environ.get("I2V_TPU_DISABLE_PALLAS"):
        return False
    if os.environ.get("I2V_TPU_FORCE_PALLAS"):
        return True
    # Tunneled axon devices with remote compile choke on Mosaic kernels
    # embedded in large differentiated modules (the HTTP compile helper
    # crashes); the XLA-fused jnp path is equivalent there — elementwise
    # chains fuse into the adjacent conv kernels anyway. Real local TPUs
    # keep the Pallas path.
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1":
        return False
    return jax.default_backend() == "tpu"


def _rows_for(n_elems: int):
    """Return rows if n_elems tiles exactly into (rows, 128) with sublane
    alignment, else None (→ fallback)."""
    if n_elems % _LANES:
        return None
    rows = n_elems // _LANES
    if rows % _SUBLANES:
        return None
    return rows


def _block_grid(rows: int):
    block = min(_BLOCK_ROWS, rows)
    while rows % block:
        block //= 2
    return block, rows // block


# ---------------------------------------------------------------------------
# Kernel 1: fused sign-step + project
# ---------------------------------------------------------------------------

def _sign_step_kernel(scal_ref, adv_ref, grad_ref, clean_ref, out_ref):
    step_size = scal_ref[0]
    epsilon = scal_ref[1]
    stepped = adv_ref[:] + step_size * jnp.sign(grad_ref[:])
    delta = jnp.clip(stepped - clean_ref[:], -epsilon, epsilon)
    out_ref[:] = jnp.clip(clean_ref[:] + delta, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=())
def _sign_step_pallas(adv2d, grad2d, clean2d, scal):
    rows = adv2d.shape[0]
    block, grid = _block_grid(rows)
    # index_map receives (grid_idx, *scalar_prefetch_refs) under
    # PrefetchScalarGridSpec — accept and ignore the scalar ref.
    spec = pl.BlockSpec((block, _LANES), lambda i, s: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _sign_step_kernel,
        out_shape=jax.ShapeDtypeStruct(adv2d.shape, adv2d.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[spec, spec, spec],
            out_specs=spec,
        ),
    )(scal, adv2d, grad2d, clean2d)


def sign_step_project(adv01, grad, clean01, step_size, epsilon):
    """Fused α·sign(g) + ε-project + [0,1] clip. Drop-in for
    :func:`i2v_tpu.ops.pixel.sign_step_project`."""
    rows = _rows_for(adv01.size)
    if not _on_tpu() or rows is None or adv01.dtype != jnp.float32:
        return pixel.sign_step_project(adv01, grad, clean01, step_size, epsilon)
    shape = adv01.shape
    scal = jnp.asarray([step_size, epsilon], dtype=jnp.float32)
    out = _sign_step_pallas(
        adv01.reshape(rows, _LANES),
        grad.reshape(rows, _LANES),
        clean01.reshape(rows, _LANES),
        scal,
    )
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# Kernel 2: differentiable rebuild  clamp(clean + clamp(m, ±ε), 0, 1)
# ---------------------------------------------------------------------------

def _rebuild_fwd_kernel(scal_ref, clean_ref, mod_ref, out_ref):
    epsilon = scal_ref[0]
    out_ref[:] = jnp.clip(
        clean_ref[:] + jnp.clip(mod_ref[:], -epsilon, epsilon), 0.0, 1.0
    )


def _rebuild_bwd_kernel(scal_ref, clean_ref, mod_ref, g_ref, out_ref):
    # torch.clamp backward: gradient passes on the closed interval.
    epsilon = scal_ref[0]
    m = mod_ref[:]
    inner = jnp.clip(m, -epsilon, epsilon)
    u = clean_ref[:] + inner
    inner_mask = jnp.logical_and(m >= -epsilon, m <= epsilon)
    outer_mask = jnp.logical_and(u >= 0.0, u <= 1.0)
    out_ref[:] = jnp.where(jnp.logical_and(inner_mask, outer_mask), g_ref[:], 0.0)


def _rebuild_call(kernel, n_in, arrs, scal):
    rows = arrs[0].shape[0]
    block, grid = _block_grid(rows)
    spec = pl.BlockSpec((block, _LANES), lambda i, s: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(arrs[0].shape, arrs[0].dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[spec] * n_in,
            out_specs=spec,
        ),
    )(scal, *arrs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _rebuild_pallas(clean2d, mod2d, epsilon):
    scal = jnp.asarray([epsilon], dtype=jnp.float32)
    return _rebuild_call(_rebuild_fwd_kernel, 2, (clean2d, mod2d), scal)


def _rebuild_fwd(clean2d, mod2d, epsilon):
    return _rebuild_pallas(clean2d, mod2d, epsilon), (clean2d, mod2d)


def _rebuild_bwd(epsilon, res, g):
    clean2d, mod2d = res
    scal = jnp.asarray([epsilon], dtype=jnp.float32)
    dm = _rebuild_call(_rebuild_bwd_kernel, 3, (clean2d, mod2d, g), scal)
    return (None, dm)


_rebuild_pallas.defvjp(_rebuild_fwd, _rebuild_bwd)


def rebuild_adv(clean01, modifier, epsilon):
    """Fused differentiable modifier rebuild. Drop-in for
    :func:`i2v_tpu.ops.pixel.rebuild_adv` (clean01 is non-differentiable)."""
    rows = _rows_for(clean01.size)
    if not _on_tpu() or rows is None or clean01.dtype != jnp.float32:
        return pixel.rebuild_adv(clean01, jnp.asarray(modifier), epsilon)
    shape = clean01.shape
    out = _rebuild_pallas(
        jax.lax.stop_gradient(clean01).reshape(rows, _LANES),
        modifier.reshape(rows, _LANES),
        float(epsilon),
    )
    return out.reshape(shape)
