"""pjit-sharded attack steps: dp over clips, sp over the flattened frame axis.

This is the production multi-chip path for the image-guided attacks: the
(B·T) frame batch is constrained to shard over the full mesh, the modifier
and Adam moments inherit that sharding, and the only collectives XLA inserts
are the scalar-cost reduce (I2V) and the per-tap frame-sum reduce (AENS).
Replaces the reference's manual per-process index sharding
(image_main.py:61-63).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..attacks.i2v import MODIFIER_INIT, adam_like_torch
from ..models.api import ImageModel
from ..ops import losses, pixel
from ..ops import pallas_kernels as pk
from .mesh import clip_sharding, frame_sharding

# The measured single-chip chunk optimum (PERF_PROBE.json
# exec_ens16_bf16_chunk256 = 3.07 steps/s vs 2.90 unchunked;
# exec_ens16_f32_chunk128): ~256 frames of 224² bf16 activations per device
# per chunk — small enough that a chunk's fwd↔bwd activations stay
# HBM-resident, large enough to keep the MXU fed. ``frame_chunk="auto"``
# re-expresses that sweet spot as a constant activation-byte budget so other
# dtypes and resolutions resolve consistently: f32 @224² → 128, multigrid's
# 112² bf16 coarse phase → 1024 (≥ the 512-frame batch → unchunked).
AUTO_CHUNK_BYTES = 256 * 2 * 224 * 224


def resolve_frame_chunk(frame_chunk, n_frames: int, hw, compute_dtype,
                        n_devices: int = 1):
    """Resolve a ``frame_chunk`` setting against concrete frame-batch shapes.

    ``int``/``None`` pass through untouched; ``"auto"`` picks the
    measured-optimum chunk for ``(h, w, dtype)`` (see ``AUTO_CHUNK_BYTES``)
    scaled by ``n_devices`` when the chunk is sharded over a mesh, or
    ``None`` (unchunked) when the whole batch already fits that budget.
    The caller's divisor-snapping still applies downstream."""
    if frame_chunk != "auto":
        if isinstance(frame_chunk, str):
            raise ValueError(f"frame_chunk must be an int, None, or 'auto'; "
                             f"got {frame_chunk!r}")
        return frame_chunk
    h, w = int(hw[0]), int(hw[1])
    dbytes = jnp.dtype(compute_dtype).itemsize
    per_dev = max(1, AUTO_CHUNK_BYTES // (dbytes * h * w))
    target = per_dev * n_devices
    return None if n_frames <= target else target


def _compute_dtype(models) -> jnp.dtype:
    """The ensemble's activation dtype (what the chunk budget is spent on):
    the widest compute dtype any surrogate was built with."""
    return jnp.result_type(*[getattr(m.module, "dtype", jnp.float32) or
                             jnp.float32 for m in models])


def make_sharded_i2v_runner(
    models: Sequence[ImageModel],
    mesh: Mesh,
    *,
    steps: int,
    step_size: float = 0.005,
    epsilon: float = 16 / 255,
    adaptive: bool = False,
    aens_momentum: float = 0.0,
    coef_ce: bool = False,
    remat: bool = False,
    unroll: int = 1,
    mu_dtype=None,
    donate: bool = False,
    frame_chunk: int | str | None = None,
    chunk_unroll: int = 1,
    param_dtype=None,
    return_modifier: bool = False,
    opt_state_io: bool = False,
):
    """Build a jitted, mesh-sharded I2V/ENS/AENS attack runner.

    runner(clean01_clips (B,C,T,H,W) [0,1]) -> (adv01 clips, per-step costs).

    ``runner(..., mod_init=m)`` warm-starts the Adam loop from a caller-built
    modifier in the flattened (B·T,H,W,3) frame layout instead of the
    reference's 0.01/255 fill — the handoff point for the coarse-to-fine
    multigrid schedule (parallel/multigrid.py). ``return_modifier=True``
    appends the final (unclipped) modifier to the runner's outputs so a later
    phase can resume from it.

    ``opt_state_io=True`` additionally threads the Adam optimizer state
    through the runner boundary: the runner accepts ``opt_init=(count, mu,
    nu)`` and appends the final ``(count, mu, nu)`` to its outputs. With
    ``return_modifier`` this makes a ``steps``-step runner a resumable
    segment — N chained calls are BIT-IDENTICAL to one N·steps run (the
    scan carry crosses the jit boundary unchanged; tests/
    test_chained_opt.py pins it), which is (a) attack-state checkpointing
    the reference never had (its killed runs re-run from scratch,
    SURVEY §5) and (b) how the true-f32 HIGHEST cost is measured on a
    worker that crashes long HIGHEST programs (tools/perf_probe.py
    exec_ens16_f32hp_chained). The tuple form (not optax's state classes)
    keeps the IO pytree stable across optax versions.

    ``frame_chunk``: gradient accumulation over the frame axis. The I2V/AENS
    objectives are exactly per-frame separable (every frame's cosine term
    depends only on that frame's modifier slice), so chunking the (B·T)
    frame batch into lax.map'd sub-batches computes bit-identical costs and
    gradients while holding only one chunk's surrogate activations — the
    enabler for f32 at B=16 on a single 16 GB chip, where the full 512-frame
    VGG activations alone need ~24 GB. ``frame_chunk="auto"`` picks the
    measured-optimum chunk for the batch's resolution/dtype at trace time
    (``resolve_frame_chunk``). ``param_dtype=jnp.bfloat16`` stores
    surrogate weights in bf16 (XLA casts f32 params to bf16 for the MXU
    anyway when ``dtype=bf16`` — pre-casting drops the dead f32 originals,
    ~300 MB for the 4-surrogate ensemble).
    """
    from ..models.api import rebind_params

    if isinstance(frame_chunk, str) and frame_chunk != "auto":
        raise ValueError(f"frame_chunk must be an int, None, or 'auto'; "
                         f"got {frame_chunk!r}")
    fsharding = frame_sharding(mesh)
    n_taps = sum(len(m.tap_keys) for m in models)
    if mu_dtype is not None:
        # opt-in HBM saving: first moment in bf16 (second moment stays f32);
        # breaks bitwise torch-Adam parity, ASR-equivalent in practice
        import optax

        opt = optax.adam(step_size, b1=0.9, b2=0.999, eps=1e-8,
                         eps_root=0.0, mu_dtype=mu_dtype)
    else:
        opt = adam_like_torch(step_size)

    def collect(bound_models, frames01):
        taps = []
        for m in bound_models:
            _, t = m.apply01_taps(frames01)
            taps.extend(t)
        return taps

    def inner(params_list, clean01, state0, fmask, mod_init, opt0):
        # params/adaptive-state as runtime args: closure-captured arrays
        # would be embedded as HLO constants (huge programs, slow compiles)
        # fmask: None (common case — no masking traced, zero overhead) or a
        # (B·T,) f32 per-frame validity mask with zeros on the pad frames of
        # a pad-and-slice trailing batch, so pad clips contribute nothing to
        # the cost, the gradients, or (critically) the shared adaptive-AENS
        # coefficients. None vs array selects the program at trace time.
        bound = [rebind_params(m, p) for m, p in zip(models, params_list)]

        def collect_b(frames01):
            return collect(bound, frames01)

        if remat:
            # trade MXU recompute for HBM traffic: save only the taps, not
            # the conv residuals, and replay the forward in the backward pass
            collect_b = jax.checkpoint(collect_b)

        b = clean01.shape[0]
        frames = pixel.flatten_clip_to_frames(clean01)
        frames = jax.lax.with_sharding_constraint(frames, fsharding)
        n_frames = frames.shape[0]
        # 'auto' resolves against the traced shapes (exact semantics either
        # way — only the accumulation chunking changes); the global chunk is
        # sharded over the mesh, so the per-device budget scales by mesh.size
        fchunk = resolve_frame_chunk(frame_chunk, n_frames, frames.shape[1:3],
                                     _compute_dtype(models), mesh.size)
        chunked = fchunk is not None and fchunk < n_frames
        if chunked and n_frames % fchunk:
            # trailing partial batch: snap to the largest divisor of the
            # frame batch that fits the requested chunk — the chunked
            # accumulation is exact for any divisor (frame-separable
            # objective), so this preserves outputs instead of raising at
            # the last batch of a long run
            fchunk = max(d for d in range(1, fchunk + 1) if n_frames % d == 0)

        def _next_coeffs(state):
            coeffs, prev = state
            return jax.nn.softmax(jax.nn.softmax(prev) + aens_momentum * coeffs)

        if chunked:
            k = n_frames // fchunk
            frames_r = frames.reshape((k, fchunk) + frames.shape[1:])
            fmask_r = None if fmask is None else fmask.reshape(k, fchunk)
            # clean taps collected chunk-wise too: the full-batch clean
            # forward would otherwise set the same activation peak chunking
            # exists to avoid
            clean_taps_r = jax.lax.map(
                lambda fr: [jax.lax.stop_gradient(t) for t in collect_b(fr)],
                frames_r)

            def grad_and_state(modifier, state):
                coeffs = _next_coeffs(state) if adaptive else None

                def one(args):
                    fr, mod, ct, fm = args

                    def obj(m):
                        taps = collect_b(pk.rebuild_adv(fr, m, epsilon))
                        if adaptive:
                            per_tap = losses.per_tap_frame_cosines(taps, ct)
                            if fm is not None:
                                per_tap = per_tap * fm[None, :]
                            each_c = jnp.sum(coeffs[:, None] * per_tap, axis=1)
                            raw_c = jnp.sum(per_tap, axis=1)
                            return jnp.mean(each_c), (each_c, raw_c)
                        return losses.i2v_cost(taps, ct, frame_weights=fm), ()

                    (c, aux), g = jax.value_and_grad(obj, has_aux=True)(mod)
                    return c, aux, g

                mod_r = modifier.reshape(frames_r.shape)
                # chunk_unroll > 1 unrolls the accumulation loop: chunk
                # gradients are mutually independent (per-frame-separable
                # objective), so an unrolled pair lets XLA overlap one
                # chunk's backward with the next chunk's forward at the
                # price of holding both chunks' activations (the roofline-
                # gap experiment, VERDICT r3 next #7; lax.map is scan with
                # unroll=1)
                _, (costs_c, auxs, grads) = jax.lax.scan(
                    lambda _, args: (None, one(args)), None,
                    (frames_r, mod_r, clean_taps_r, fmask_r),
                    unroll=chunk_unroll)
                cost = jnp.sum(costs_c)
                g = grads.reshape(modifier.shape)
                if adaptive:
                    each = jax.lax.stop_gradient(jnp.sum(auxs[0], axis=0))
                    raw = jax.lax.stop_gradient(jnp.sum(auxs[1], axis=0))
                    return g, (coeffs, each if coef_ce else raw), cost
                return g, state, cost
        else:
            clean_taps = [jax.lax.stop_gradient(t) for t in collect_b(frames)]

            def objective(modifier, coeffs_prev):
                adv01 = pk.rebuild_adv(frames, modifier, epsilon)
                taps = collect_b(adv01)
                if adaptive:
                    coeffs = _next_coeffs(coeffs_prev)
                    per_tap = losses.per_tap_frame_cosines(taps, clean_taps)
                    if fmask is not None:
                        per_tap = per_tap * fmask[None, :]
                    each = jnp.sum(coeffs[:, None] * per_tap, axis=1)
                    cost = jnp.mean(each)
                    # coef_CE picks the weighted per-tap loss as the next
                    # coefficient signal (TPAMI_attack.py:293-297)
                    new_prev = jax.lax.stop_gradient(
                        each if coef_ce else jnp.sum(per_tap, axis=1))
                    return cost, ((coeffs, new_prev), cost)
                cost = losses.i2v_cost(taps, clean_taps, frame_weights=fmask)
                return cost, (coeffs_prev, cost)

            _grad = jax.grad(objective, has_aux=True)

            def grad_and_state(modifier, state):
                g, (state, cost) = _grad(modifier, state)
                return g, state, cost

        def step(carry, _):
            modifier, opt_state, state = carry
            g, state, cost = grad_and_state(modifier, state)
            updates, opt_state = opt.update(g, opt_state)
            modifier = jax.tree.map(lambda m, u: m + u, modifier, updates)
            return (modifier, opt_state, state), cost

        mod0 = jax.lax.with_sharding_constraint(
            jnp.full_like(frames, MODIFIER_INIT) if mod_init is None
            else mod_init.astype(frames.dtype), fsharding
        )
        if opt0 is None:
            opt_state0 = opt.init(mod0)
        else:
            # rebuild optax.adam's state from the stable (count, mu, nu)
            # IO tuple; the structural assumption (scale_by_adam first in
            # the chain) is pinned by tests/test_chained_opt.py
            import optax

            count, mu, nu = opt0
            opt_state0 = (optax.ScaleByAdamState(
                count=count, mu=mu.astype(frames.dtype),
                nu=nu.astype(frames.dtype)), optax.EmptyState())
        (modifier, opt_final, final_state), costs = jax.lax.scan(
            step, (mod0, opt_state0, state0), None, length=steps,
            unroll=unroll,
        )
        modifier = jax.lax.stop_gradient(modifier)
        adv = pk.rebuild_adv(frames, modifier, epsilon)
        out = (pixel.unflatten_frames_to_clip(adv, b), costs, final_state)
        if return_modifier:
            out = out + (modifier,)
        if opt_state_io:
            st = opt_final[0]
            out = out + ((st.count, st.mu, st.nu),)
        return out

    csharding = clip_sharding(mesh)
    rep = jax.sharding.NamedSharding(mesh, P())
    # donate: the (B,C,T,H,W) clip buffer is dead right after the clip→frame
    # transpose, so donating it hands its full B·C·T·H·W·4 bytes (308 MB at
    # B=16 f32) back to XLA for scan-body temporaries — this is what closes
    # the ~33 MB single-chip HBM overshoot of AENS 8-tap B=16 (VERDICT #3).
    # mod_init (same 308 MB in the frame layout) is likewise dead once the
    # scan's mod0 is built — donating it matters for the multigrid fine
    # phase, and donating a None arg is a no-op.
    # Off by default because benchmarks re-call the runner with one input.
    out_sh = (csharding, rep, (rep, rep) if adaptive else None)
    if return_modifier:
        out_sh = out_sh + (fsharding,)
    if opt_state_io:
        out_sh = out_sh + ((rep, fsharding, fsharding),)  # (count, mu, nu)
    jitted = jax.jit(
        inner,
        # opt0 slot unconstrained: its arrays are the previous call's
        # outputs, already laid out by out_shardings above
        in_shardings=(None, csharding, None, None, fsharding, None),
        out_shardings=out_sh,
        donate_argnums=(1, 4) if donate else (),
    )
    params_list = [m.params for m in models]
    if param_dtype is not None:
        params_list = jax.tree.map(
            lambda x: x.astype(param_dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params_list)
    # coeffs persist across runner calls like the reference's instance state
    # (TPAMI_attack.py:165,265; previous_cs_loss resets per call, :257) and
    # like attacks/i2v.AENS_I2V_MF
    coeffs_box = [jnp.ones((n_taps,), jnp.float32)]

    def state0():
        return ((coeffs_box[0], jnp.ones((n_taps,), jnp.float32))
                if adaptive else None)

    def frame_mask(clean01, n_real=None):
        """None (full batch — traces the unmasked program), or a (B·T,)
        clip-major prefix mask of n_real·T ones when the trailing ``pad``
        clips of a pad-and-slice batch must not contribute
        (flatten_clip_to_frames is clip-major)."""
        b, _, t = clean01.shape[:3]
        if n_real is None or n_real >= b:
            return None
        return (jnp.arange(b * t) < n_real * t).astype(jnp.float32)

    def runner(clean01, n_real=None, mod_init=None, opt_init=None):
        out = jitted(params_list, clean01, state0(),
                     frame_mask(clean01, n_real), mod_init, opt_init)
        adv, costs, final_state = out[:3]
        if adaptive:
            coeffs_box[0] = final_state[0]
        return (adv, costs) + out[3:]

    # exposed for AOT lowering / cost analysis (tools/perf_probe.py cost)
    runner.jitted = jitted
    runner.example_args = lambda clean01: (
        params_list, clean01, state0(), frame_mask(clean01), None, None)
    return runner


class ShardedImageGuidedAttack:
    """Reference-calling-convention adapter over the pjit-sharded runner.

    Lets the CLI mains run I2V / ENS-I2V / AENS through the production
    multi-chip path (``--sharded``): same ``attack(videos, labels, names)``
    contract as the attack classes, clips resharded device-side with the
    mesh's clip sharding, per-step costs recorded into ``loss_info``.
    """

    def __init__(self, models: Sequence[ImageModel], mesh: Mesh, *, steps: int,
                 step_size: float, adaptive: bool = False,
                 aens_momentum: float = 0.0, coef_ce: bool = False,
                 name: str = "ShardedI2V", frame_chunk: int | str | None = None,
                 param_dtype=None, multigrid: int = 0, multigrid_scale: int = 2):
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
                frame_chunk=frame_chunk, param_dtype=param_dtype)
        else:
            self._runner = make_sharded_i2v_runner(
                models, mesh, steps=steps, step_size=step_size,
                adaptive=adaptive, aens_momentum=aens_momentum,
                coef_ce=coef_ce, donate=True, frame_chunk=frame_chunk,
                param_dtype=param_dtype)

    def __call__(self, videos, labels=None, video_names=None):
        from .mesh import clip_sharding

        u8 = pixel.is_u8_clips(videos)
        videos = jnp.asarray(videos)
        b = videos.shape[0]
        # clip length: axis 2 of normalized (B,C,T,H,W), axis 1 of raw
        # uint8 (B,T,H,W,3) ingest batches
        t = videos.shape[1] if u8 else videos.shape[2]
        data = self.mesh.shape["data"]
        frames = self.mesh.shape["frames"]
        # A long --sharded generation run ends with a trailing partial batch;
        # rather than dying there (after most artifacts are written) or
        # falling back to a second unsharded program, pad the batch up to
        # mesh divisibility with clip repeats and slice the pad back off.
        # The runner's frame mask zeroes the pad frames out of the cost, the
        # gradients, AND the shared adaptive-AENS coefficient sums, so the
        # real clips' adv output and the recorded per-step costs are exactly
        # the unpadded run's (pad clips are fully inert, not just sliced).
        pad = 0
        if b % data or (b * t) % (data * frames):
            target = b + (-b % data)
            while (target * t) % (data * frames):
                target += data
            pad = target - b
            videos = jnp.concatenate(
                [videos, jnp.repeat(videos[-1:], pad, axis=0)], axis=0)
        if u8:
            # raw uint8 ingest: 4× less host→device traffic; the LUT-gather
            # + eager unnormalize on device (see ingest_u8_clips) is
            # bit-identical to the f32 path; sharding propagates from the
            # device_put through the eager ops, and the runner re-constrains
            # anyway
            clean01 = pixel.ingest_u8_clips(
                jax.device_put(videos, jax.sharding.NamedSharding(
                    self.mesh, P("data"))))
        else:
            clean01 = pixel.unnormalize(videos, channel_axis=1)
            # device-side reshard — a host round trip at relay bandwidth
            # would cost more than the attack itself
            clean01 = jax.device_put(clean01, clip_sharding(self.mesh))
        del videos  # drop the raw copy before the attack pins HBM
        adv01, costs = self._runner(clean01, n_real=b if pad else None)
        self._record_costs(costs, video_names)
        if pad:
            adv01 = adv01[:b]
        return pixel.normalize(adv01, channel_axis=1)
