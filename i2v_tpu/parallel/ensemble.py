"""Ensemble (model-axis) parallelism for ENS-I2V / AENS.

The reference forwards its 4 surrogate models SEQUENTIALLY every step
(image_attacks.py:469-480). SPMD can't run heterogeneous architectures as
different programs, but it can run them as ONE program with a
``lax.switch`` over the mesh position: each device along the ``model`` axis
executes only its own group's forward+backward (the other branches compile
but don't run), and the modifier gradients are ``psum``'d across the axis.
With 4 surrogates on a 4-wide model axis each step costs ~1 model instead
of 4, plus one gradient all-reduce over ICI.

Composes with the frame axis: shard_map over ('model','frames') where frames
shard the B·T axis (each device holds a frame slice and a model group).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
import functools
import inspect

try:  # jax>=0.8 exports shard_map at top level; experimental for older jax
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map

# key the replication-check kwarg on the actual signature (the kwarg was
# renamed check_rep → check_vma independently of where the symbol lives)
_CHECK_KW = ("check_vma" if "check_vma" in
             inspect.signature(_shard_map).parameters else "check_rep")
shard_map = functools.partial(_shard_map, **{_CHECK_KW: False})

from ..attacks.i2v import MODIFIER_INIT, adam_like_torch
from ..models.api import ImageModel, rebind_params
from ..ops import losses, pixel
from ..ops import pallas_kernels as pk


def ensemble_mesh(devices=None, model: int | None = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    model = model or (4 if n % 4 == 0 else (2 if n % 2 == 0 else 1))
    if model < 1 or n % model:
        raise ValueError(
            f"model axis {model} does not divide the {n} available "
            f"device(s); pick a divisor of the device count")
    frames = n // model
    return Mesh(np.asarray(devices).reshape(model, frames), ("model", "frames"))


def make_ensemble_parallel_runner(
    models: Sequence[ImageModel],
    mesh: Mesh,
    *,
    steps: int,
    step_size: float = 0.005,
    epsilon: float = 16 / 255,
    adaptive: bool = False,
    aens_momentum: float = 0.0,
    coef_ce: bool = False,
    frame_chunk: int | str | None = None,
    donate: bool = False,
    return_modifier: bool = False,
):
    """jitted runner(clean01 clips) -> (adv01 clips, per-step costs), with the
    surrogate ensemble split over the mesh's 'model' axis and the frame batch
    over the 'frames' axis.

    ``runner(..., mod_init=m)`` warm-starts Adam from a caller-built modifier
    in the flattened (B·T,H,W,3) frame layout; ``return_modifier=True``
    appends the final (unclipped) modifier to the outputs — together the
    multigrid handoff contract (same as sharded.py's), so the coarse-to-fine
    schedule composes with model-axis parallelism.

    ``adaptive=True`` runs the AENS objective (TPAMI_attack.py:255-320):
    per-tap coefficients live REPLICATED in the scan carry; each device
    computes its own group's per-tap cosine sums, embeds them at its
    group's static tap offset into a zeros(K) vector, and one psum over
    BOTH axes assembles the exact global coefficient signal (the embeddings
    are disjoint, so the sum concatenates; frame sums complete over the
    'frames' axis in the same psum).

    ``frame_chunk``: exact gradient accumulation over each device's LOCAL
    frame slice (same per-frame-separable argument as sharded.py's
    frame_chunk) — required at reference scale when the model axis is wide
    and the frame axis narrow (e.g. 4 surrogates over 4 chips: the VGG
    device would otherwise hold the full 512-frame activations alone)."""
    if isinstance(frame_chunk, str) and frame_chunk != "auto":
        # fail at factory time like make_sharded_i2v_runner — a junk value
        # must not surface as a ValueError buried in the first shard_map trace
        raise ValueError(f"frame_chunk must be an int, None, or 'auto'; "
                         f"got {frame_chunk!r}")
    m_size = mesh.shape["model"]
    k = len(models)
    if k % m_size:
        raise ValueError(f"{k} models do not split over model axis {m_size}")
    per = k // m_size
    opt = adam_like_torch(step_size)
    # per-group tap offsets/counts in model order (the coefficient vector's
    # layout — matches attacks/i2v.AENS_I2V_MF and the sharded runner)
    tap_cnt = [sum(len(m.tap_keys) for m in models[g * per:(g + 1) * per])
               for g in range(m_size)]
    tap_off = [sum(tap_cnt[:g]) for g in range(m_size)]
    n_taps = sum(tap_cnt)

    def body(params_list, frames_local, fmask_local, state0_local,
             mod_init_local):
        """Runs per (model-group, frame-shard) device. ``fmask_local``:
        None (common case — nothing traced) or a per-frame validity mask
        zeroing pad frames out of the cost AND (via the chain rule) their
        gradients, so a pad-and-slice trailing batch computes the exact
        unpadded objective (same contract as sharded.py's frame mask).
        ``state0_local``: None, or the replicated AENS (coeffs, prev_signal)
        pair persisting across runner calls."""
        bound = [rebind_params(m, p) for m, p in zip(models, params_list)]
        groups = [list(bound[g * per:(g + 1) * per]) for g in range(m_size)]

        def group_taps(g: int, frames01):
            taps = []
            for mdl in groups[g]:
                _, t = mdl.apply01_taps(frames01)
                taps.extend(t)
            return taps

        gidx = jax.lax.axis_index("model")

        # Clean-tap collection must run under a switch too: collecting all
        # groups' taps unconditionally would execute every group's forward
        # on every device. lax.switch branches must agree on output
        # structure — and every branch's output is live for the whole scan
        # (which branch ran is dynamic, so XLA cannot DCE the others) — so
        # a per-group list-of-lists with zero-filled other-group slots would
        # still pin EVERY group's clean taps in HBM. Instead each branch
        # emits ONE flat (n_local, f_max) buffer: its own taps flattened,
        # concatenated, and zero-padded to the max group width. Per-device
        # clean-tap HBM is the largest single group, not the sum. The
        # widen-then-narrow dtype round trip through ``store_dtype`` is
        # bit-exact, so numerics match the sequential runner exactly.
        tap_shapes = [jax.eval_shape(lambda f, gg=g: group_taps(gg, f),
                                     frames_local) for g in range(m_size)]
        n_local = frames_local.shape[0]
        flat_sizes = [[int(np.prod(s.shape[1:])) for s in shapes]
                      for shapes in tap_shapes]
        group_width = [sum(fs) for fs in flat_sizes]
        f_max = max(group_width)
        store_dtype = jnp.result_type(
            *[s.dtype for shapes in tap_shapes for s in shapes])

        # exact frame-chunked gradient accumulation over the LOCAL slice
        # (per-frame-separable objective — same argument as sharded.py);
        # snap to a divisor so any local slice length works. 'auto' resolves
        # per DEVICE here (n_devices=1): frame_chunk is local on this path
        from .sharded import _compute_dtype, resolve_frame_chunk

        fchunk = resolve_frame_chunk(frame_chunk, n_local,
                                     frames_local.shape[1:3],
                                     _compute_dtype(models))
        chunked = fchunk is not None and fchunk < n_local
        if chunked and n_local % fchunk:
            fchunk = max(d for d in range(1, fchunk + 1) if n_local % d == 0)
        k_chunks = (n_local // fchunk) if chunked else 1
        frames_r = (frames_local.reshape((k_chunks, fchunk)
                                         + frames_local.shape[1:])
                    if chunked else None)
        fmask_r = (None if fmask_local is None else
                   fmask_local.reshape(k_chunks, fchunk)) if chunked else None

        def flat_clean_of(g: int, frames01):
            n = frames01.shape[0]
            flat = jnp.concatenate(
                [jax.lax.stop_gradient(t).reshape(n, -1)
                 .astype(store_dtype) for t in group_taps(g, frames01)],
                axis=1)
            if group_width[g] < f_max:
                flat = jnp.pad(flat, ((0, 0), (0, f_max - group_width[g])))
            return flat

        def make_clean_branch(g: int):
            if chunked:
                # chunk-wise clean collection: the full-slice clean forward
                # would set the same activation peak chunking exists to avoid
                return lambda _: jax.lax.map(
                    lambda fr: flat_clean_of(g, fr), frames_r)
            return lambda frames01: flat_clean_of(g, frames01)

        clean_flat = jax.lax.switch(
            gidx, [make_clean_branch(g) for g in range(m_size)], frames_local)

        def unpack_clean(g: int, flat):
            n = flat.shape[0]
            taps, off = [], 0
            for size, s in zip(flat_sizes[g], tap_shapes[g]):
                taps.append(flat[:, off:off + size].astype(s.dtype)
                            .reshape((n,) + s.shape[1:]))
                off += size
            return taps

        def group_cost_aux(g: int, frames01, modifier, clean, fmask, coeffs):
            """(cost, aux) for one group over one frame slice — the local
            term of the global objective."""
            o0, cnt = tap_off[g], tap_cnt[g]
            adv01 = pk.rebuild_adv(frames01, modifier, epsilon)
            taps = group_taps(g, adv01)
            if not adaptive:
                cost = losses.i2v_cost(taps, clean, frame_weights=fmask)
                return cost, jnp.zeros((2, n_taps), jnp.float32)
            per_tap = losses.per_tap_frame_cosines(taps, clean)
            if fmask is not None:
                per_tap = per_tap * fmask[None, :]
            # local slice of the global objective: this group's taps,
            # this slice's frames. mean over ALL K taps → /n_taps here,
            # the cross-group + cross-frame sums complete in the psum
            # (and, when chunked, the cross-chunk sum below).
            each_local = jnp.sum(coeffs[o0:o0 + cnt, None] * per_tap, axis=1)
            raw_local = jnp.sum(per_tap, axis=1)
            cost = jnp.sum(each_local) / n_taps
            aux = (jnp.zeros((2, n_taps), per_tap.dtype)
                   .at[0, o0:o0 + cnt].set(each_local)
                   .at[1, o0:o0 + cnt].set(raw_local))
            return cost, jax.lax.stop_gradient(aux.astype(jnp.float32))

        def make_objective(g: int):
            if not chunked:
                def obj(modifier, coeffs):
                    return group_cost_aux(g, frames_local, modifier,
                                          unpack_clean(g, clean_flat),
                                          fmask_local, coeffs)

                return jax.value_and_grad(obj, has_aux=True)

            def fn(modifier, coeffs):
                def one(args):
                    fr, mod, cf, fm = args

                    def o(m):
                        return group_cost_aux(g, fr, m, unpack_clean(g, cf),
                                              fm, coeffs)

                    (c, aux), gr = jax.value_and_grad(o, has_aux=True)(mod)
                    return c, aux, gr

                mod_r = modifier.reshape(frames_r.shape)
                costs_c, auxs, grads = jax.lax.map(
                    one, (frames_r, mod_r, clean_flat, fmask_r))
                return ((jnp.sum(costs_c), jnp.sum(auxs, axis=0)),
                        grads.reshape(modifier.shape))

            return fn

        branches = [make_objective(g) for g in range(m_size)]

        def step(carry, _):
            modifier, opt_state, state = carry
            if adaptive:
                prev_coeffs, prev_signal = state
                coeffs = jax.nn.softmax(jax.nn.softmax(prev_signal)
                                        + aens_momentum * prev_coeffs)
            else:
                coeffs = jnp.zeros((n_taps,), jnp.float32)  # unused
            (cost, aux), grad = jax.lax.switch(gidx, branches, modifier,
                                               coeffs)
            grad = jax.lax.psum(grad, "model")
            # cost must reduce over BOTH axes: each device's objective covers
            # only its (model-group, frame-shard) slice, and out_specs P()
            # asserts the replicated full-batch value
            cost = jax.lax.psum(cost, ("model", "frames"))
            if adaptive:
                # disjoint per-group embeddings → one psum concatenates AND
                # completes the frame sums; result replicated on all devices
                aux = jax.lax.psum(aux, ("model", "frames"))
                state = (coeffs, aux[0] if coef_ce else aux[1])
            updates, opt_state = opt.update(grad, opt_state)
            modifier = jax.tree.map(lambda a, b: a + b, modifier, updates)
            return (modifier, opt_state, state), cost

        mod0 = (jnp.full_like(frames_local, MODIFIER_INIT)
                if mod_init_local is None
                else mod_init_local.astype(frames_local.dtype))
        (modifier, _, final_state), costs = jax.lax.scan(
            step, (mod0, opt.init(mod0), state0_local), None, length=steps)
        modifier = jax.lax.stop_gradient(modifier)
        out = (pk.rebuild_adv(frames_local, modifier, epsilon), costs,
               final_state)
        return out + (modifier,) if return_modifier else out

    out_specs = (P("frames"), P(), P())
    if return_modifier:
        out_specs = out_specs + (P("frames"),)
    sharded_body = shard_map(
        body, mesh=mesh,
        # params + AENS state replicated; frames + mask + warm-start modifier
        # sharded; costs and final state identical everywhere
        in_specs=(P(), P("frames"), P("frames"), P(), P("frames")),
        out_specs=out_specs,
    )

    def inner(params_list, clean01, fmask, state0, mod_init):
        b = clean01.shape[0]
        frames = pixel.flatten_clip_to_frames(clean01)
        out = sharded_body(params_list, frames, fmask, state0, mod_init)
        adv_frames, costs, final_state = out[:3]
        return (pixel.unflatten_frames_to_clip(adv_frames, b), costs,
                final_state) + out[3:]

    # donate: the clip buffer is dead after the clip→frame transpose (same
    # rationale as parallel/sharded.py — ~308 MB back at B=16 f32); the
    # warm-start modifier is dead once the scan's mod0 is built (donating a
    # None arg is a no-op)
    jitted = jax.jit(inner, donate_argnums=(1, 4) if donate else ())
    params_list = [m.params for m in models]
    # coeffs persist across runner calls like the reference's instance state
    # (TPAMI_attack.py:165,265); previous_cs_loss resets per call (:257)
    coeffs_box = [jnp.ones((n_taps,), jnp.float32)]

    def runner(clean01, n_real: int | None = None, mod_init=None):
        """``n_real``: number of real clips in a pad-and-slice trailing
        batch; pad clips beyond it are masked to zero cost/gradient."""
        b, _, t = clean01.shape[:3]
        fmask = (None if n_real is None or n_real >= b else
                 (jnp.arange(b * t) < n_real * t).astype(jnp.float32))
        state0 = ((coeffs_box[0], jnp.ones((n_taps,), jnp.float32))
                  if adaptive else None)
        out = jitted(params_list, clean01, fmask, state0, mod_init)
        adv, costs, final_state = out[:3]
        if adaptive:
            coeffs_box[0] = final_state[0]
        return (adv, costs) + out[3:]

    return runner


class EnsembleParallelAttack:
    """Reference-calling-convention adapter over the model-axis runner
    (``--model_parallel``): same ``attack(videos, labels, names)`` contract
    as the attack classes / ShardedImageGuidedAttack, for the ensemble
    cosine objectives (ENS-I2V — image_attacks.py:372-376 — and, with
    ``adaptive=True``, AENS-I2V-MF — TPAMI_attack.py:255-320). Each device
    along the 'model' axis owns one surrogate group; gradients psum over
    ICI. Trailing partial batches are padded to frame-axis divisibility and
    masked exactly inert (zero cost + zero gradient), then sliced off."""

    def __init__(self, models: Sequence[ImageModel], mesh: Mesh, *,
                 steps: int, step_size: float = 0.005,
                 adaptive: bool = False, aens_momentum: float = 0.0,
                 coef_ce: bool = False, frame_chunk: int | str | None = None,
                 name: str = "EnsembleParallelENS", multigrid: int = 0,
                 multigrid_scale: int = 2):
        from ..attacks.core import Attack

        self.attack = name
        self.steps = steps
        self.mesh = mesh
        self.loss_info: dict = {}
        self._record_costs = Attack._record_costs.__get__(self)
        if multigrid:
            if adaptive:
                raise ValueError("--multigrid does not compose with the "
                                 "adaptive AENS coefficients (their per-tap "
                                 "signal is resolution-coupled)")
            from .multigrid import make_multigrid_i2v_runner

            self._runner = make_multigrid_i2v_runner(
                models, mesh, steps=steps, coarse_steps=multigrid,
                scale=multigrid_scale, step_size=step_size, donate=True,
                frame_chunk=frame_chunk,
                runner_factory=make_ensemble_parallel_runner)
        else:
            self._runner = make_ensemble_parallel_runner(
                models, mesh, steps=steps, step_size=step_size,
                adaptive=adaptive, aens_momentum=aens_momentum,
                coef_ce=coef_ce, frame_chunk=frame_chunk, donate=True)

    def __call__(self, videos, labels=None, video_names=None):
        u8 = pixel.is_u8_clips(videos)
        videos = jnp.asarray(videos)
        b = videos.shape[0]
        t = videos.shape[1] if u8 else videos.shape[2]
        f_axis = self.mesh.shape["frames"]
        pad = 0
        if (b * t) % f_axis:
            target = b
            while (target * t) % f_axis:
                target += 1
            pad = target - b
            videos = jnp.concatenate(
                [videos, jnp.repeat(videos[-1:], pad, axis=0)], axis=0)
        clean01 = (pixel.ingest_u8_clips(videos) if u8
                   else pixel.unnormalize(videos, channel_axis=1))
        del videos
        adv01, costs = self._runner(clean01, n_real=b if pad else None)
        self._record_costs(costs, video_names)
        if pad:
            adv01 = adv01[:b]
        return pixel.normalize(adv01, channel_axis=1)
