"""Perf/HBM probe for the attack hot paths on the real chip.

Modes (results are appended into PERF_PROBE.json at the repo root so the
numbers are driver-checkable artifacts, not docstring prose):

    python tools/perf_probe.py base        # time the production ENS config
    python tools/perf_probe.py remat       # jax.checkpoint'd tap collection
    python tools/perf_probe.py cost        # XLA cost analysis → roofline
    python tools/perf_probe.py hbm all     # AOT HBM audit of the reference-
                                           # scale configs that previously
                                           # exceeded a single chip:
                                           #   aens16  AENS 8-tap B=16 f32
                                           #   mi16    MIFGSM B=16 I3D-101
                                           #   ens24   ENS-I2V B=24 f32
                                           #   ens16_f32  ENS-I2V B=16 f32

The hbm mode lowers + compiles each program for the attached backend and
reports XLA's own memory analysis (args + outputs − donated aliases + temps)
against the 16 GB v5e HBM budget. Buffer donation of the dead post-transpose
clip buffer (parallel/sharded.py, attacks/i2v.py) is what brings the *16
configs under budget (round-1 measurements had AENS/MI B=16 over by ~33 MB).
"""

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# paths only imports os — safe before any backend init (ADVICE r3: one
# cache-dir authority instead of five drifting inline copies)
from i2v_tpu.utils.paths import compile_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

STEPS = 60
HBM_BYTES = 16 * 1024**3  # v5e lite
ARTIFACT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PERF_PROBE.json"
)


def record(key: str, payload: dict) -> None:
    data = {}
    if os.path.exists(ARTIFACT):
        with open(ARTIFACT) as f:
            data = json.load(f)
    payload["platform"] = jax.devices()[0].platform
    data[key] = payload
    with open(ARTIFACT, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    print(f"[{key}] recorded → {ARTIFACT}")


def _mem_analysis(compiled) -> dict:
    """fits_16gb = the compile succeeded: the terminal's AOT TPU compiler
    enforces the physical 15.75G budget and raises a permanent
    out-of-memory error otherwise (observed for every unchunked over-budget
    config). CompiledMemoryStats fields are informational only — for
    programs with nested control flow (lax.map inside the attack scan) the
    reported temp size SUMS sub-computation buffers instead of the
    concurrent peak, over-counting by several GB.

    Compile-pass is NECESSARY but in marginal cases not sufficient: runtime
    adds live input/param buffers outside the program budget (observed:
    ens16_f32_chunk256 compiles but RESOURCE_EXHAUSTs at execution, while
    ens16_f32_chunk128 executes — bench row). The ``exec_*`` entries in
    PERF_PROBE.json are the ground truth; every claimed-closed config has
    one."""
    ma = compiled.memory_analysis()
    args = float(ma.argument_size_in_bytes)
    out = float(ma.output_size_in_bytes)
    alias = float(ma.alias_size_in_bytes)
    temp = float(ma.temp_size_in_bytes)
    return {
        "argument_bytes": args,
        "output_bytes": out,
        "alias_bytes": alias,
        "temp_bytes": temp,
        "reported_gb": round((args + out - alias + temp) / 1024**3, 3),
        "fits_16gb": True,
    }


def _ens_models(dtype):
    from i2v_tpu.models import get_image_models

    return get_image_models(
        ["resnet", "vgg", "squeezenet", "alexnet"],
        {"resnet": 2, "vgg": 3, "squeezenet": 2, "alexnet": 3},
        input_hw=224, dtype=dtype)


def _aens_models(dtype):
    from i2v_tpu.models import get_image_models

    # the TPAMI 8-tap config: 2 layers per model, the docstring's example
    # set (TPAMI_attack.py:146) as built by the CLI (cli/common.py:229)
    names = ["resnet", "vgg", "squeezenet", "alexnet"]
    return get_image_models(names, {n: [2, 3] for n in names},
                            input_hw=224, dtype=dtype)


def hbm_probe(which: str) -> None:
    from i2v_tpu.parallel import attack_mesh
    from i2v_tpu.parallel.sharded import make_sharded_i2v_runner

    mesh = attack_mesh(jax.devices()[:1])

    def sharded_case(models, batch, adaptive, remat=False, frame_chunk=None,
                     param_dtype=None):
        runner = make_sharded_i2v_runner(
            models, mesh, steps=STEPS, step_size=0.005, adaptive=adaptive,
            donate=True, remat=remat, frame_chunk=frame_chunk,
            param_dtype=param_dtype)
        clip = jax.ShapeDtypeStruct((batch, 3, 32, 224, 224), jnp.float32)
        ex = list(runner.example_args(clip))
        ex[1] = clip
        return runner.jitted.lower(*ex).compile()

    bf16 = jnp.bfloat16
    cases = {
        # the two round-1 over-by-33MB configs: donation + bf16 param storage
        "aens16_bf16_pcast": lambda: sharded_case(
            _aens_models(bf16), 16, True, param_dtype=bf16),
        "mi16": None,       # filled below (video-model white-box)
        "mi16_remat": None,
        # f32 at B=16 single-chip: full-batch activations need ~24G, so the
        # per-frame-separable objective is chunked over the frame axis
        # (exact gradient accumulation, test_parallel.py parity test)
        "ens16_f32": lambda: sharded_case(_ens_models(jnp.float32), 16, False),
        "ens16_f32_chunk128": lambda: sharded_case(
            _ens_models(jnp.float32), 16, False, frame_chunk=128),
        "ens16_f32_chunk64": lambda: sharded_case(
            _ens_models(jnp.float32), 16, False, frame_chunk=64),
        "ens16_f32_chunk256": lambda: sharded_case(
            _ens_models(jnp.float32), 16, False, frame_chunk=256),
        "aens16_f32_chunk64": lambda: sharded_case(
            _aens_models(jnp.float32), 16, True, frame_chunk=64),
        "aens16_f32_chunk32": lambda: sharded_case(
            _aens_models(jnp.float32), 16, True, frame_chunk=32),
        "aens16_bf16_chunk256": lambda: sharded_case(
            _aens_models(bf16), 16, True, frame_chunk=256, param_dtype=bf16),
        # the round-1 over-by-4GB config:
        "ens24_bf16_chunk256": lambda: sharded_case(
            _ens_models(bf16), 24, False, frame_chunk=256, param_dtype=bf16),
    }

    def mi16(remat=False, batch_chunk=None):
        import dataclasses

        from i2v_tpu.attacks.whitebox import MIFGSM
        from i2v_tpu.models import get_video_model

        model = get_video_model("i3d_resnet101", remat=remat)  # random init
        # is fine: the HBM footprint depends on shapes, not weight values
        atk = MIFGSM(model, steps=10)
        if batch_chunk:
            atk.cfg = dataclasses.replace(atk.cfg, batch_chunk=batch_chunk)
        shape = (16, 3, 32, 224, 224)
        jitted = atk.jitted_runner(shape)
        return jitted.lower(
            model.params,
            jax.ShapeDtypeStruct(shape, jnp.float32),
            jax.ShapeDtypeStruct((16,), jnp.int32),
            jax.random.PRNGKey(0),
        ).compile()

    cases["mi16"] = mi16
    cases["mi16_remat"] = lambda: mi16(remat=True)
    cases["mi16_chunk8"] = lambda: mi16(batch_chunk=8)

    names = list(cases) if which == "all" else [which]
    for name in names:
        t0 = time.time()
        try:
            compiled = cases[name]()
            info = _mem_analysis(compiled)
            info["compile_s"] = round(time.time() - t0, 1)
            print(f"[hbm:{name}] FITS (compiled within the 15.75G budget; "
                  f"reported-stats {info['reported_gb']} GB, args "
                  f"{info['argument_bytes']/1e9:.2f} GB, aliased "
                  f"{info['alias_bytes']/1e9:.2f} GB)")
        except Exception as e:
            # the AOT compiler enforces the 15.75G budget server-side: a
            # compile OOM IS the fits-answer — record it structurally
            msg = str(e)
            info = {"fits_16gb": False, "compile_s": round(time.time() - t0, 1),
                    "error": msg[msg.find("Ran out of memory"):][:160] or
                             msg[:160]}
            print(f"[hbm:{name}] DOES NOT FIT: {info['error'][:100]}")
        record(f"hbm_{name}", info)


def exec_probe(which: str) -> None:
    """Actually EXECUTE a reference-scale config on the chip — the ground
    truth behind the hbm compile audit. Records steps/s into PERF_PROBE.json
    as exec_<name>."""
    import numpy as np

    from i2v_tpu.parallel import attack_mesh, shard_clips
    from i2v_tpu.parallel.sharded import make_sharded_i2v_runner

    mesh = None  # built lazily, AFTER the case name is validated: device
    # init through a dead relay hangs, and an arg typo must not pay that

    def run_sharded(models, batch, adaptive, frame_chunk, param_dtype=None,
                    steps=STEPS, remat=False, chunk_unroll=1):
        runner = make_sharded_i2v_runner(
            models, mesh, steps=steps, step_size=0.005, adaptive=adaptive,
            donate=True, frame_chunk=frame_chunk, param_dtype=param_dtype,
            remat=remat, chunk_unroll=chunk_unroll)
        mk = lambda: shard_clips(
            jnp.full((batch, 3, 32, 224, 224), 0.5, jnp.float32), mesh)
        t0 = time.time()
        _, costs = runner(mk())
        final = float(np.asarray(costs)[-1])
        compile_s = time.time() - t0
        reps = 2
        inputs = [mk() for _ in range(reps)]
        t0 = time.time()
        for x in inputs:
            _, costs = runner(x)
        final = float(np.asarray(costs)[-1])
        dt = time.time() - t0
        return steps * reps / dt * (batch * 32 / 512), final, compile_s

    bf16 = jnp.bfloat16
    # (models_fn, dtype, batch, adaptive, frame_chunk, param_dtype) — the
    # bf16 chunk sweep exists because chunk=256 measured FASTER than
    # unchunked (3.07 vs 2.90 steps/s): smaller fwd↔bwd activation working
    # sets cut HBM traffic on this HBM-bound step, so the optimum is an
    # empirical question per dtype
    sharded_cases = {
        "ens16_f32_chunk64": (_ens_models, jnp.float32, 16, False, 64, None),
        "ens16_f32_chunk128": (_ens_models, jnp.float32, 16, False, 128, None),
        # no chunk between 128 and 256 exists for 512 frames: chunks snap to
        # divisors of the frame batch, and 512 = 2^9 has only power-of-two
        # divisors — 128 is the f32 frontier (256 exceeds HBM, hbm_ens16_
        # f32_chunk256)
        "ens16_f32_chunk256": (_ens_models, jnp.float32, 16, False, 256, None),
        "ens16_bf16_chunk64": (_ens_models, bf16, 16, False, 64, bf16),
        "ens16_bf16_chunk128": (_ens_models, bf16, 16, False, 128, bf16),
        "ens16_bf16_chunk256": (_ens_models, bf16, 16, False, 256, bf16),
        "aens16_bf16_chunk128": (_aens_models, bf16, 16, True, 128, bf16),
        "aens16_bf16_chunk256": (_aens_models, bf16, 16, True, 256, bf16),
        # AENS f32 at B=16: hbm audit says chunk32/64 compile (hbm_aens16_
        # f32_chunk*), but compile-pass is necessary-not-sufficient — these
        # exec cases are the ground truth the VERDICT r2 asked for
        "aens16_f32_chunk32": (_aens_models, jnp.float32, 16, True, 32, None),
        "aens16_f32_chunk64": (_aens_models, jnp.float32, 16, True, 64, None),
        # B=8 unchunked f32 ENS: the default-mode base for the ens8_f32hp
        # HIGHEST-precision cases (60-step HIGHEST crashes the worker at
        # EVERY config tried — see the exec_ens16_f32hp_chunk64 crash
        # record — so the hp measurement uses the _s<N> short variants)
        "ens8_f32": (_ens_models, jnp.float32, 8, False, None, None),
        # bf16-compute AENS with f32 params at B=8: both dtypes fit at B=8,
        # giving the early-trajectory fidelity pair the bench cites
        "aens8_f32": (_aens_models, jnp.float32, 8, True, None, None),
        "aens8_bf16": (_aens_models, bf16, 8, True, None, bf16),
        "ens24_bf16_chunk256": (_ens_models, bf16, 24, False, 256, bf16),
        "ens32_bf16_chunk256": (_ens_models, bf16, 32, False, 256, bf16),
    }
    if (which not in sharded_cases
            and which not in ("mi16_chunk8", "bim16_chunk8", "tt1_chunk15",
                              "tt1_r101_chunk15", "gradcam32", "pallas",
                              "ens16_f32hp_chained")
            and not (which.startswith("ens16_f32hp_chunk")
                     and "ens16_f32_chunk" + which[len("ens16_f32hp_chunk"):]
                     in sharded_cases)
            and not (which.split("_s")[0] in ("ens8_f32hp", "ens8_f32")
                     and (which in ("ens8_f32hp", "ens8_f32")
                          or which.split("_s")[-1].isdigit()))
            and not (which.endswith("_remat")
                     and which[:-6] in sharded_cases)
            and not (which.endswith("_cu2") and which[:-4] in sharded_cases)
            and not (which.startswith("mg16_bf16_cc")
                     and (which[len("mg16_bf16_cc"):] == "full"
                          or (which[len("mg16_bf16_cc"):].isdigit()
                              and int(which[len("mg16_bf16_cc"):]) > 0)))
            and not (which.startswith("mg16_bf16_cs")
                     and which[len("mg16_bf16_cs"):].isdigit()
                     and 0 < int(which[len("mg16_bf16_cs"):]) < STEPS)):
        raise SystemExit(
            f"unknown exec case {which!r}; known: "
            f"{', '.join(sorted(sharded_cases))} (each also with a _remat "
            f"suffix), ens8_f32hp[_s<steps>], ens8_f32_s<steps>, "
            f"mg16_bf16_cc<chunk|full>, mg16_bf16_cs<coarse_steps>, "
            f"mi16_chunk8, bim16_chunk8, tt1_chunk15, gradcam32, pallas")
    mesh = attack_mesh(jax.devices()[:1])
    if which in sharded_cases:
        mf, dt, batch, adaptive, chunk, pdt = sharded_cases[which]
        sps, final, cs = run_sharded(mf(dt), batch, adaptive, chunk,
                                     param_dtype=pdt)
    elif which.split("_s")[0] in ("ens8_f32hp", "ens8_f32"):
        # ens8_f32hp[_s<N>] / ens8_f32_s<N>: HIGHEST-precision (true-f32
        # MXU) ENS at B=8 unchunked, plus the same-shape same-step-count
        # DEFAULT-mode base, so the HIGHEST-vs-default cost ratio is
        # measured apples-to-apples. Step-count matters on this worker:
        # EVERY 60-step HIGHEST attempt crashes it mid-run ("TPU worker
        # process crashed ... kernel fault" — B=16 chunk128 r3, B=16
        # chunk64 r4, B=8 unchunked r4), while the 3-step fidelity pair
        # executes — so the _s<N> suffix walks the program length down to
        # the largest one that survives.
        tail = which.split("_s")[-1]
        n_steps = int(tail) if tail.isdigit() else STEPS
        mf, dt, batch, adaptive, chunk, pdt = sharded_cases["ens8_f32"]
        import contextlib

        ctx = (jax.default_matmul_precision("float32")
               if "hp" in which else contextlib.nullcontext())
        with ctx:
            sps, final, cs = run_sharded(mf(dt), batch, adaptive, chunk,
                                         param_dtype=pdt, steps=n_steps)
    elif which == "ens16_f32hp_chained":
        # production-shape bit-faithful f32 via SIX CHAINED 10-step HIGHEST
        # programs (VERDICT r4 next #5): every 60-step HIGHEST program
        # crashes this environment's worker (exec_ens16_f32hp_chunk64.crash)
        # but 10-step HIGHEST programs survive (exec_ens8_f32hp_s10), and
        # opt_state_io makes a chain of short segments BIT-IDENTICAL to one
        # contiguous run (tests/test_chained_opt.py) — so this measures the
        # true 60-step B=16 HIGHEST cost, not an extrapolation. The
        # (modifier, opt) carry stays on device between jit calls; explicit
        # zero opt_init keeps all six segments on ONE compiled program.
        import numpy as np

        from i2v_tpu.attacks.i2v import MODIFIER_INIT

        mesh = attack_mesh(jax.devices()[:1])
        models = _ens_models(jnp.float32)
        seg_steps, n_seg, batch = 10, 6, 16
        runner = make_sharded_i2v_runner(
            models, mesh, steps=seg_steps, step_size=0.005, frame_chunk=64,
            return_modifier=True, opt_state_io=True)
        clean = shard_clips(
            jnp.full((batch, 3, 32, 224, 224), 0.5, jnp.float32), mesh)

        def zero_carry():
            mod0 = jnp.full((batch * 32, 224, 224, 3), MODIFIER_INIT,
                            jnp.float32)
            return mod0, (jnp.zeros([], jnp.int32), jnp.zeros_like(mod0),
                          jnp.zeros_like(mod0))

        def chain():
            mod, opt = zero_carry()
            segs = []
            for _ in range(n_seg):
                _, costs, mod, opt = runner(clean, mod_init=mod,
                                            opt_init=opt)
                segs.append(costs)
            # one small fetch syncs the whole chain (relay ack caveat)
            tail = jnp.stack([c[-1] for c in segs])
            return float(np.asarray(tail)[-1]), np.asarray(tail)

        with jax.default_matmul_precision("float32"):
            t0 = time.time()
            final, _ = chain()  # compile + first full 60-step chain
            compile_s = time.time() - t0
            t0 = time.time()
            final, seg_tails = chain()
            dt = time.time() - t0
        sps = seg_steps * n_seg / dt * (batch * 32 / 512)
        record("exec_ens16_f32hp_chained", {
            "executed": True,
            "steps_per_s_512norm": round(sps, 3),
            "final_cost": round(final, 3),
            "segment_final_costs": [round(float(x), 3) for x in seg_tails],
            "compile_and_first_s": round(compile_s, 1),
            "segments": f"{n_seg}x{seg_steps}-step HIGHEST, chunk64, "
                        "device-carried (modifier, opt) via opt_state_io — "
                        "bit-identical to one 60-step run "
                        "(tests/test_chained_opt.py)",
        })
        return
    elif which.startswith("ens16_f32hp_chunk"):
        # the f32 headline config with matmul/conv precision forced to
        # HIGHEST (true-f32 MXU passes). The plain "f32" rows keep f32
        # params/state/accumulation but leave dot/conv inputs at the TPU's
        # DEFAULT matmul mode — this case measures what full-f32 compute
        # costs and (with fidelity ens8_hp) what the default mode gives up,
        # so the headline's precision story is a measured one, not a label.
        # Any chunk with an existing f32 base case is accepted: the first
        # chunk128 attempt crashed the TPU worker mid-execution, so a
        # smaller-chunk fallback keeps the measurement reachable
        mf, dt, batch, adaptive, chunk, pdt = sharded_cases[
            "ens16_f32_chunk" + which[len("ens16_f32hp_chunk"):]]
        with jax.default_matmul_precision("float32"):
            sps, final, cs = run_sharded(mf(dt), batch, adaptive, chunk,
                                         param_dtype=pdt)
    elif which.endswith("_cu2") and which[:-4] in sharded_cases:
        # <case>_cu2: unroll the frame-chunk accumulation loop by 2 so XLA
        # can overlap one chunk's backward with the next chunk's forward —
        # chunk grads are independent (per-frame-separable objective). HBM
        # cost: TWO chunks' activations live at once, so only chunks at or
        # below half the dtype's frontier are candidates. The roofline-gap
        # experiment (VERDICT r3 next #7); win or lose, the row lands.
        mf, dt, batch, adaptive, chunk, pdt = sharded_cases[which[:-4]]
        sps, final, cs = run_sharded(mf(dt), batch, adaptive, chunk,
                                     param_dtype=pdt, chunk_unroll=2)
    elif which.endswith("_remat") and which[:-6] in sharded_cases:
        # <case>_remat: save only the taps, replay the forward in the
        # backward — trades HBM activation traffic (the binding resource:
        # the step runs at ~78% of the HBM roofline with MXU headroom,
        # roofline_ens_b16) for ~2x forward FLOPs
        mf, dt, batch, adaptive, chunk, pdt = sharded_cases[which[:-6]]
        sps, final, cs = run_sharded(mf(dt), batch, adaptive, chunk,
                                     param_dtype=pdt, remat=True)
    elif which.startswith("mg16_bf16_cc") or which.startswith("mg16_bf16_cs"):
        # multigrid tuning, two axes:
        #   mg16_bf16_cc<chunk|full> — coarse_frame_chunk (30 coarse @112² +
        #     30 fine @224², fine chunk fixed at 256): the coarse phase's 512
        #     frames at 112² carry 1/4 the activation bytes, so its chunk
        #     optimum need not match the fine phase's
        #   mg16_bf16_cs<K> — coarse_steps: K coarse + (60-K) fine steps.
        #     Fewer coarse steps buys final-cost parity with plain bf16 at a
        #     smaller speedup (the Pareto knob behind the 93.7x headline's
        #     8.7%-worse final cost)
        from i2v_tpu.parallel.multigrid import make_multigrid_i2v_runner

        if which.startswith("mg16_bf16_cc"):
            tag = which[len("mg16_bf16_cc"):]
            cc, cs_steps = (None if tag == "full" else int(tag)), STEPS // 2
        else:
            # cs sweep runs the PRODUCTION coarse config (coarse_frame_chunk
            # follows frame_chunk=256, make_multigrid_i2v_runner's `...`
            # default — what bench_multigrid and the CLI path execute);
            # earlier cs12/cs20 entries were measured with an unchunked
            # coarse phase no shipped code path uses
            cc, cs_steps = 256, int(which[len("mg16_bf16_cs"):])
        models = _ens_models(bf16)
        runner = make_multigrid_i2v_runner(
            models, mesh, steps=STEPS, coarse_steps=cs_steps, scale=2,
            step_size=0.005, donate=True, frame_chunk=256,
            coarse_frame_chunk=cc, param_dtype=bf16)
        batch = 16
        mk = lambda: shard_clips(
            jnp.full((batch, 3, 32, 224, 224), 0.5, jnp.float32), mesh)
        t0 = time.time()
        _, costs = runner(mk())
        final = float(np.asarray(costs)[-1])
        cs = time.time() - t0
        reps = 2
        inputs = [mk() for _ in range(reps)]
        t0 = time.time()
        for x in inputs:
            _, costs = runner(x)
        final = float(np.asarray(costs)[-1])
        sps = STEPS * reps / (time.time() - t0) * (batch * 32 / 512)
    elif which in ("mi16_chunk8", "bim16_chunk8"):
        # MIFGSM/BIM at the reference white-box scale (attack.py:13-61:
        # I3D-NL R101, B=16, steps=10); batch_chunk=8 exact accumulation
        import dataclasses

        from i2v_tpu.attacks.whitebox import BIM, MIFGSM
        from i2v_tpu.models import get_video_model

        model = get_video_model("i3d_resnet101")
        cls = MIFGSM if which.startswith("mi") else BIM
        atk = cls(model, steps=10)
        atk.cfg = dataclasses.replace(atk.cfg, batch_chunk=8)
        clean = jnp.full((16, 3, 32, 224, 224), 0.5, jnp.float32)
        labels = jnp.zeros((16,), jnp.int32)
        jitted = atk.jitted_runner(clean.shape)
        t0 = time.time()
        _, costs = jitted(model.params, clean, labels, jax.random.PRNGKey(0))
        final = float(np.asarray(costs)[-1])
        cs = time.time() - t0
        reps = 2
        t0 = time.time()
        for i in range(reps):
            _, costs = jitted(model.params, clean, labels,
                              jax.random.PRNGKey(i))
        final = float(np.asarray(costs)[-1])
        sps = 10 * reps / (time.time() - t0)
    elif which == "gradcam32":
        # GradCAM at the reference's saliency-figure workload (image_cam.py:
        # 9-37 average_grad_cam_from_images): the 5-model average CAM over
        # one 32-frame clip at 224², depth-4 taps (the find_*_layer
        # last-conv defaults, image_cam_utils.py:26-184). One jitted program
        # — 5 forward+backward passes, per-model min-max, common-size
        # upsample, mean — blocking on a reduced scalar (relay discipline,
        # bench.py header note). Metric: frames/s for the complete 5-model
        # average; the device row for C21, the one component the round-2
        # evidence matrix had no number for.
        import dataclasses

        from i2v_tpu.eval import gradcam as gradcam_mod
        from i2v_tpu.models import get_image_models
        from i2v_tpu.ops import pixel

        names = ["alexnet", "vgg", "resnet", "densenet", "squeezenet"]
        bundles = get_image_models(names, 4, truncate=False, input_hw=224)

        def avg_cam_sum(plist, clip):
            frames = pixel.flatten_clip_to_frames(clip)
            cams = []
            for b, p in zip(bundles, plist):
                cam, _ = gradcam_mod._cam_raw(
                    dataclasses.replace(b, params=p), frames, None)
                cams.append(
                    gradcam_mod._upsample(gradcam_mod._minmax(cam), 224))
            return jnp.mean(jnp.stack(cams), axis=0).sum()

        jitted = jax.jit(avg_cam_sum)
        plist = [b.params for b in bundles]
        clip = jnp.asarray(np.random.RandomState(0)
                           .rand(1, 3, 32, 224, 224).astype(np.float32))
        t0 = time.time()
        final = float(jitted(plist, clip))
        cs = time.time() - t0
        reps = 3
        t0 = time.time()
        for _ in range(reps):
            final = float(jitted(plist, clip))
        fps = 32 * reps / (time.time() - t0)
        print(f"[exec:{which}] {fps:.2f} frames/s (5-model average CAM), "
              f"compile+first {cs:.1f}s")
        record(f"exec_{which}", {
            "frames_per_s": round(fps, 2),
            "cam_sum": round(final, 3),
            "compile_and_first_s": round(cs, 1),
            "executed": True,
        })
        return
    elif which == "pallas":
        # VERDICT r3 next #4: prove (or record the negative for) the Pallas
        # kernels on the ONLY TPU this project runs on. Production gates
        # them OFF under PALLAS_AXON_REMOTE_COMPILE=1 (ops/pallas_kernels.
        # _on_tpu) because Mosaic kernels embedded in large differentiated
        # modules crash the remote-compile helper; this case forces them ON
        # (I2V_TPU_FORCE_PALLAS=1) for three escalating probes:
        #   (a) sign_step_project standalone at the production clip-batch
        #       size (16,3,32,224,224), 50 chained steps, timed vs the
        #       XLA-fused jnp fallback it shadows (ops/pixel),
        #   (b) rebuild_adv fwd+custom-VJP bwd, value/grad diff vs fallback,
        #   (c) a 2-step BIM on a tiny lane-aligned I3D — the kernel inside
        #       a real differentiated attack program.
        # A crash here is itself the documented negative (recorded post-hoc
        # like exec_ens16_f32hp_chunk64.crash).
        os.environ.pop("I2V_TPU_DISABLE_PALLAS", None)
        os.environ["I2V_TPU_FORCE_PALLAS"] = "1"
        from i2v_tpu.ops import pallas_kernels as pk
        from i2v_tpu.ops import pixel

        eps = 16.0 / 255.0
        shape = (16, 3, 32, 224, 224)
        ka, kg, kc = jax.random.split(jax.random.PRNGKey(0), 3)
        adv = jax.random.uniform(ka, shape, jnp.float32)
        grad = jax.random.normal(kg, shape, jnp.float32)
        clean = jnp.clip(
            adv + 0.03 * jax.random.normal(kc, shape, jnp.float32), 0.0, 1.0)
        out = {}

        def sign_loop(op):
            @jax.jit
            def f(a, g, c):
                body = lambda i, x: op(x, g, c, 0.004, eps)
                return jnp.sum(jax.lax.fori_loop(0, 50, body, a))
            return f

        for tag, op in (("pallas", pk.sign_step_project),
                        ("xla", pixel.sign_step_project)):
            f = sign_loop(op)
            v = float(f(adv, grad, clean))  # compile + first (relay sync
            # discipline: a small reduced scalar, bench.py header note)
            t0 = time.time()
            v = float(f(adv, grad, clean))
            out[f"sign_step50_{tag}_ms"] = round((time.time() - t0) * 1e3, 1)
            out[f"sign_step50_{tag}_sum"] = round(v, 2)
        one = {t: o(adv, grad, clean, 0.004, eps) for t, o in
               (("pallas", pk.sign_step_project),
                ("xla", pixel.sign_step_project))}
        out["sign_step_max_abs_diff"] = float(
            jnp.max(jnp.abs(one["pallas"] - one["xla"])))

        def rebuild_loss(op):
            def f(c, m):
                o = op(c, m, eps)
                return jnp.sum(o * jnp.sin(o))
            return jax.jit(jax.value_and_grad(f, argnums=1))

        mod = 0.1 * jax.random.normal(jax.random.PRNGKey(7), shape)
        vp, gp = rebuild_loss(pk.rebuild_adv)(clean, mod)
        vx, gx = rebuild_loss(pixel.rebuild_adv)(clean, mod)
        out["rebuild_val_abs_diff"] = float(jnp.abs(vp - vx))
        out["rebuild_grad_max_abs_diff"] = float(jnp.max(jnp.abs(gp - gx)))

        import dataclasses

        from i2v_tpu.attacks.whitebox import BIM
        from i2v_tpu.models import get_video_model

        tiny = get_video_model("i3d_resnet50", tiny=True, seed=0,
                               example_shape=(1, 3, 8, 32, 32))
        atk = BIM(tiny, steps=2)
        clean8 = jnp.full((8, 3, 8, 32, 32), 0.5, jnp.float32)
        labels = jnp.zeros((8,), jnp.int32)
        jitted = atk.jitted_runner(clean8.shape)
        _, costs = jitted(tiny.params, clean8, labels, jax.random.PRNGKey(0))
        out["bim2_tiny_pallas_final_cost"] = round(
            float(np.asarray(costs)[-1]), 4)
        os.environ["I2V_TPU_DISABLE_PALLAS"] = "1"
        atk2 = BIM(tiny, steps=2)
        jitted2 = atk2.jitted_runner(clean8.shape)
        _, costs2 = jitted2(tiny.params, clean8, labels, jax.random.PRNGKey(0))
        out["bim2_tiny_xla_final_cost"] = round(
            float(np.asarray(costs2)[-1]), 4)
        del os.environ["I2V_TPU_DISABLE_PALLAS"]
        out["executed"] = True
        out["block_rows"] = pk._BLOCK_ROWS
        key = ("exec_pallas" if pk._BLOCK_ROWS == 512
               else f"exec_pallas_block{pk._BLOCK_ROWS}")
        print(f"[exec:pallas] {out}")
        record(key, out)
        return
    elif which in ("tt1_chunk15", "tt1_r101_chunk15"):
        # TemporalTranslation, the heaviest white-box path (15 gradient
        # queries per step, video_attacks.py:189-214): all 15 cycle-shift
        # variants in ONE vmapped query (--tt_chunk 15 — the measured-fastest
        # config, README "0.27 s/step"). Raw steps/s at B=1 (the 15-variant
        # fan-out makes 512-frame normalization meaningless here).
        # tt1_r101_chunk15 is the PRODUCTION-shaped row (VERDICT r3 next #8):
        # the reference's most expensive attack at the reference's surrogate
        # (I3D-NL ResNet-101, attack.py:13-61 default model + kernlen 15).
        from i2v_tpu.attacks.temporal import TemporalTranslation
        from i2v_tpu.models import get_video_model

        model = get_video_model(
            "i3d_resnet101" if "r101" in which else "i3d_resnet50")
        atk = TemporalTranslation(model, {"kernlen": 15, "chunk": 15},
                                  steps=3)
        shape = (1, 3, 32, 224, 224)
        runner = jax.jit(atk._build_runner(shape))
        clean = jnp.full(shape, 0.5, jnp.float32)
        labels = jnp.zeros((1,), jnp.int32)
        t0 = time.time()
        _, costs = runner(model.params, clean, labels, jax.random.PRNGKey(0))
        final = float(np.asarray(costs)[-1])
        cs = time.time() - t0
        reps = 2
        t0 = time.time()
        for i in range(reps):
            _, costs = runner(model.params, clean, labels,
                              jax.random.PRNGKey(i))
        final = float(np.asarray(costs)[-1])
        sps = 3 * reps / (time.time() - t0)
    else:
        raise SystemExit(f"unknown exec case {which!r}")
    print(f"[exec:{which}] {sps:.3f} steps/s (512-frame-normalized), "
          f"final cost {final:.2f}, compile+first {cs:.1f}s")
    record(f"exec_{which}", {
        "steps_per_s_512norm": round(sps, 3),
        "final_cost": round(final, 3),
        "compile_and_first_s": round(cs, 1),
        "executed": True,
    })


def fidelity_probe(which: str) -> None:
    """bf16-vs-f32 early-trajectory fidelity for a config where BOTH dtypes
    fit on one chip. Runs a short (3-step) attack in f32 and in bf16(+bf16
    params) and records the max relative cost deviation over those steps —
    the honest fidelity window: by step ~60 last-ulp reduction-order
    differences amplify chaotically through Adam (bench.py bench_ens note),
    so late-step deltas measure chaos, not dtype error. VERDICT r2 weak #4:
    AENS carried bf16 headline rows with no fidelity number at all."""
    import numpy as np

    from i2v_tpu.parallel import attack_mesh, shard_clips
    from i2v_tpu.parallel.sharded import make_sharded_i2v_runner

    cfgs = {
        "aens8": (_aens_models, 8, True),
        "ens8": (_ens_models, 8, False),
        # ens8_hp: NOT a dtype pair — both runs are f32 params/state; the
        # B side forces matmul/conv precision to HIGHEST (true-f32 MXU
        # passes) while the A side keeps the TPU's DEFAULT matmul mode the
        # "f32" bench rows run in. Quantifies what the default mode gives
        # up vs bit-faithful f32 compute on the same chip.
        "ens8_hp": (_ens_models, 8, False),
    }
    if which not in cfgs:
        raise SystemExit(f"unknown fidelity case {which!r}; known: "
                         f"{', '.join(sorted(cfgs))}")
    mesh = attack_mesh(jax.devices()[:1])
    models_fn, batch, adaptive = cfgs[which]
    steps = 3
    if which.endswith("_hp"):
        pairs = [("f32_default", jnp.float32, None, None),
                 ("f32_highest", jnp.float32, None, "float32")]
        a, bname, rec_key = "f32_default", "f32_highest", \
            f"fidelity_{which[:-3]}_f32default_vs_highest"
    else:
        pairs = [("f32", jnp.float32, None, None),
                 ("bf16", jnp.bfloat16, jnp.bfloat16, None)]
        a, bname, rec_key = "f32", "bf16", f"fidelity_{which}_bf16_vs_f32"
    trajs = {}
    for tag, dtype, pdt, prec in pairs:
        import contextlib

        ctx = (jax.default_matmul_precision(prec) if prec
               else contextlib.nullcontext())
        with ctx:
            runner = make_sharded_i2v_runner(
                models_fn(dtype), mesh, steps=steps, step_size=0.005,
                adaptive=adaptive, donate=True, param_dtype=pdt)
            x = shard_clips(
                jnp.full((batch, 3, 32, 224, 224), 0.5, jnp.float32), mesh)
            _, costs = runner(x)
        trajs[tag] = np.asarray(costs, np.float64)
        print(f"[fidelity:{which}:{tag}] costs={trajs[tag].round(4).tolist()}")
        del runner
    rel = np.abs(trajs[bname] - trajs[a]) / np.abs(trajs[a])
    record(rec_key, {
        "steps": steps,
        "batch": batch,
        f"{a}_costs": [round(float(v), 4) for v in trajs[a]],
        f"{bname}_costs": [round(float(v), 4) for v in trajs[bname]],
        "max_rel_err": round(float(rel.max()), 5),
        "executed": True,
    })


def cost_probe(which: str = "fit") -> None:
    """Roofline audit vs v5e peaks (819 GB/s HBM, ~197 bf16 TFLOP/s).

    XLA cost analysis counts a while/scan BODY ONCE regardless of trip
    count, so lower a steps=1 runner — its numbers ≈ one attack step + the
    one-time clean-tap collection.

    which='fit' (legacy): the steps=1 UNCHUNKED liveness pattern overflows
    HBM at batch 16, so fit fixed+variable·B from B=8 and B=4 programs and
    extrapolate — a naive 2× of the B=8 totals would also double the
    batch-INVARIANT weight traffic and overstate the bound.

    which='f32_chunk128' / 'bf16_chunk256': analyze the EXACT shipped
    headline programs (B=16, frame-chunked) directly — chunking changes the
    liveness pattern enough that steps=1 compiles at B=16, and the bench's
    pct_of_roofline must be computed against the program it actually runs
    (VERDICT r3 next #7), not an unchunked extrapolation.
    """
    from i2v_tpu.parallel import attack_mesh, shard_clips
    from i2v_tpu.parallel.sharded import make_sharded_i2v_runner

    mesh = attack_mesh()

    def analyze(models, batch, frame_chunk=None, param_dtype=None,
                adaptive=False, hw=224):
        c = shard_clips(jnp.full((batch, 3, 32, hw, hw), 0.5, jnp.float32),
                        mesh)
        r1 = make_sharded_i2v_runner(models, mesh, steps=1, step_size=0.005,
                                     frame_chunk=frame_chunk,
                                     param_dtype=param_dtype,
                                     adaptive=adaptive)
        ca = r1.jitted.lower(*r1.example_args(c)).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return (float(ca.get("flops", float("nan"))),
                float(ca.get("bytes accessed", float("nan"))))

    def _param_bytes(models, param_dtype):
        tot = 0
        for m in models:
            for x in jax.tree.leaves(m.params):
                if param_dtype is not None and jnp.issubdtype(x.dtype,
                                                              jnp.floating):
                    tot += x.size * jnp.dtype(param_dtype).itemsize
                else:
                    tot += x.size * x.dtype.itemsize
        return tot

    def chunked_fit(models, c1, pdt, adaptive=False, hw=224,
                    frames=512) -> dict:
        """Per-step roofline of an EXACT shipped chunked program.

        XLA cost analysis counts the frame-chunk SCAN BODY ONCE regardless
        of trip count, so a single compile reports fixed + body(chunk).
        body(c) = w + p·c where w is the per-trip loop-INVARIANT traffic
        (the ensemble weights streamed from HBM each trip — they are ~1 GB,
        far beyond VMEM residency) and p·c the frame-proportional part. Two
        chunk sizes give the slope p, but fixed and w share the intercept,
        so the extra (trips−1) weight re-reads are added from the analytic
        weight-bytes estimate w_est = 2·param_bytes (forward + transposed-
        conv backward reads; modifier-grad accumulation is frame-
        proportional and already in p). ADVICE r4 #1: the previous fit
        omitted this term and understated hbm_bound_ms.
        """
        c2 = c1 // 2
        fa, ba = analyze(models, 16, frame_chunk=c1, param_dtype=pdt,
                         adaptive=adaptive, hw=hw)
        fb, bb = analyze(models, 16, frame_chunk=c2, param_dtype=pdt,
                         adaptive=adaptive, hw=hw)
        kf, kb = (fa - fb) / (c1 - c2), (ba - bb) / (c1 - c2)
        trips = max(1, frames // c1)
        w_est = 2.0 * _param_bytes(models, pdt)
        f16 = fa + kf * (frames - c1)  # flops have no loop-invariant reread
        b16 = ba + kb * (frames - c1) + (trips - 1) * w_est
        return {"flops_per_step": f16, "bytes_per_step": b16,
                "counted": (fa, ba, fb, bb), "trips": trips,
                "weight_bytes_per_trip_est": w_est, "chunks": (c1, c2)}

    aliases = {"f32_chunk128": "ens16_f32_chunk128",
               "bf16_chunk256": "ens16_bf16_chunk256"}
    which = aliases.get(which, which)
    chunk_cases = {
        # family, models_fn, dtype, chunk, param_dtype, adaptive
        "ens16_f32_chunk128": (_ens_models, jnp.float32, 128, None, False),
        "ens16_bf16_chunk256": (_ens_models, jnp.bfloat16, 256, jnp.bfloat16,
                                False),
        "aens16_bf16_chunk256": (_aens_models, jnp.bfloat16, 256,
                                 jnp.bfloat16, True),
    }
    if which in chunk_cases:
        mf, dtype, c1, pdt, adaptive = chunk_cases[which]
        models = mf(dtype)
        fit = chunked_fit(models, c1, pdt, adaptive=adaptive)
        hbm_ms = fit["bytes_per_step"] / 819e9 * 1e3
        # MXU bound at the 197 bf16-TFLOP/s peak: for the f32 program this
        # is the bound on the DEFAULT matmul mode (bf16-multiplier passes
        # with f32 accumulate — the mode the headline row runs); true-f32
        # HIGHEST pays multiple passes (measured: exec_ens16_f32hp_chained)
        mxu_ms = fit["flops_per_step"] / 197e12 * 1e3
        print(f"[cost:{which}] true/step flops={fit['flops_per_step']:.3e} "
              f"bytes={fit['bytes_per_step']:.3e} (incl. "
              f"{fit['trips'] - 1}x{fit['weight_bytes_per_trip_est']:.2e} "
              f"weight rereads) → HBM {hbm_ms:.1f} ms, MXU {mxu_ms:.1f} ms")
        record(f"roofline_{which}", {
            "flops_per_step": fit["flops_per_step"],
            "bytes_per_step": fit["bytes_per_step"],
            "weight_bytes_per_trip_est": fit["weight_bytes_per_trip_est"],
            "trips": fit["trips"],
            "hbm_bound_ms": round(hbm_ms, 1), "mxu_bound_ms": round(mxu_ms, 1),
            "note": "EXACT shipped B=16 chunked program; scan-body-once "
                    "corrected by a two-chunk linear fit (chunk"
                    f"{fit['chunks'][0]}/{fit['chunks'][1]}) PLUS "
                    "(trips-1) analytic weight-reread bytes per step "
                    "(ADVICE r4 #1 — the fit alone understates HBM); v5e "
                    "peaks 819GB/s HBM, 197TFLOP/s (bf16-multiplier) MXU; "
                    "binding resource = the larger bound",
        })
        return
    if which == "mg16_bf16":
        # the multigrid bench row (30 coarse steps @112² + 30 fine @224²,
        # bf16, both phases chunk 256 — bench_multigrid passes
        # frame_chunk=256 and the coarse phase inherits it): per-60-step-
        # equivalent bound = mean of the two phases' per-step bounds
        # (equal step counts).
        models = _ens_models(jnp.bfloat16)
        fine = chunked_fit(models, 256, jnp.bfloat16)
        coarse = chunked_fit(models, 256, jnp.bfloat16, hw=112)
        f_step = 0.5 * (fine["flops_per_step"] + coarse["flops_per_step"])
        b_step = 0.5 * (fine["bytes_per_step"] + coarse["bytes_per_step"])
        hbm_ms = b_step / 819e9 * 1e3
        mxu_ms = f_step / 197e12 * 1e3
        print(f"[cost:mg16_bf16] fine bytes={fine['bytes_per_step']:.3e} "
              f"coarse bytes={coarse['bytes_per_step']:.3e} → "
              f"per-step-equiv HBM {hbm_ms:.1f} ms, MXU {mxu_ms:.1f} ms")
        record("roofline_mg16_bf16", {
            "flops_per_step": f_step, "bytes_per_step": b_step,
            "fine_bytes_per_step": fine["bytes_per_step"],
            "coarse_bytes_per_step": coarse["bytes_per_step"],
            "hbm_bound_ms": round(hbm_ms, 1), "mxu_bound_ms": round(mxu_ms, 1),
            "note": "per-60-step-EQUIVALENT bound for the multigrid row "
                    "(30@112² + 30@224², both chunk256, equal-weight mean); "
                    "both phases trip-corrected like "
                    "roofline_ens16_bf16_chunk256 (ADVICE r4 #1); v5e peaks "
                    "819GB/s, 197TFLOP/s",
        })
        return
    if which != "fit":
        # a typo'd case must not silently run the legacy unchunked fit
        print(f"unknown cost case {which!r}; known: fit, mg16_bf16, "
              f"{', '.join(sorted(chunk_cases))} (aliases: "
              f"{', '.join(sorted(aliases))})")
        return
    models = _ens_models(jnp.bfloat16)
    f8, b8 = analyze(models, 8)
    f4, b4 = analyze(models, 4)
    f16 = f8 + (f8 - f4) * 2  # fixed + var·16
    b16 = b8 + (b8 - b4) * 2
    hbm_ms = b16 / 819e9 * 1e3
    mxu_ms = f16 / 197e12 * 1e3
    print(f"[cost] steps=1: B=4 bytes={b4:.3e}, B=8 bytes={b8:.3e} → "
          f"B=16 fit: flops={f16:.3e} bytes={b16:.3e} "
          f"(batch-fixed bytes {b8 - (b8 - b4) * 2:.3e})")
    print(f"[cost] roofline at B=16: HBM {hbm_ms:.1f} ms, MXU {mxu_ms:.1f} ms")
    record("roofline_ens_b16", {
        "flops_per_step": f16, "bytes_per_step": b16,
        "hbm_bound_ms": round(hbm_ms, 1), "mxu_bound_ms": round(mxu_ms, 1),
        "note": "steps=1 program, fixed+var*B fit from B=4/B=8; bounds for "
                "one bf16 ENS step at B=16 vs v5e peaks 819GB/s / 197TFLOP/s",
    })


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    known = ("base", "remat", "remat_b32", "b24", "unroll2", "mu_bf16",
             "cost", "hbm", "exec", "fidelity")
    if variant not in known:
        # an unknown arg (incl. --help) must NOT fall through to the full
        # base measurement — this tool touches the real device
        print(f"usage: perf_probe.py [{'|'.join(known)}] [case]\n"
              "  hbm [case|all]  AOT compile + CompiledMemoryStats\n"
              "  exec CASE       execute the case (ground-truth HBM fit)\n"
              "  cost            roofline cost analysis -> PERF_PROBE.json\n"
              "  <variant>       timed 60-step ENS run on the device")
        return
    if variant == "cost":
        return cost_probe(sys.argv[2] if len(sys.argv) > 2 else "fit")
    if variant == "hbm":
        return hbm_probe(sys.argv[2] if len(sys.argv) > 2 else "all")
    if variant == "fidelity":
        if len(sys.argv) < 3:
            print("usage: perf_probe.py fidelity CASE  (aens8 | ens8)")
            return
        return fidelity_probe(sys.argv[2])
    if variant == "exec":
        if len(sys.argv) < 3:
            # missing case must print usage, not an IndexError traceback —
            # and must not touch the device
            print("usage: perf_probe.py exec CASE  (run with a bogus CASE "
                  "to list the known ones)")
            return
        return exec_probe(sys.argv[2])

    import numpy as np

    from i2v_tpu.parallel import attack_mesh, shard_clips
    from i2v_tpu.parallel.sharded import make_sharded_i2v_runner

    mesh = attack_mesh()
    models = _ens_models(jnp.bfloat16)
    batch = {"remat_b32": 32, "b24": 24}.get(variant, 16)
    runner = make_sharded_i2v_runner(
        models, mesh, steps=STEPS, step_size=0.005,
        remat=variant in ("remat", "remat_b32"),
        unroll=2 if variant == "unroll2" else 1,
        mu_dtype=jnp.bfloat16 if variant == "mu_bf16" else None)
    clean01 = shard_clips(jnp.full((batch, 3, 32, 224, 224), 0.5, jnp.float32), mesh)
    t0 = time.time()
    adv, costs = runner(clean01)
    jax.block_until_ready(adv)
    print(f"[{variant}] compile+first: {time.time()-t0:.1f}s "
          f"cost[0]={float(costs[0]):.2f} cost[-1]={float(costs[-1]):.2f}")
    reps = 2
    t0 = time.time()
    for _ in range(reps):
        adv, costs = runner(clean01)
        np.asarray(costs)  # true sync (see bench.py: relay block is unreliable)
    dt = time.time() - t0
    norm = batch * 32 / 512  # normalize to the canonical 512-frame step
    print(f"[{variant}] {STEPS*reps/dt*norm:.3f} steps/s (512-frame-normalized)"
          f"  cost[-1]={float(costs[-1]):.2f}")


if __name__ == "__main__":
    main()
