"""One-off perf probe for the ENS-I2V hot step on the real chip.

Times make_sharded_i2v_runner variants on the bench config (BASELINE.md
north-star: 4 surrogates, 60 steps, 16x32x224^2). Usage:

    python tools/perf_probe.py remat      # jax.checkpoint'd tap collection
    python tools/perf_probe.py base       # current production config
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/i2v_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

STEPS = 60


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    from i2v_tpu.models import get_image_models
    from i2v_tpu.parallel import attack_mesh, shard_clips
    from i2v_tpu.parallel.sharded import make_sharded_i2v_runner

    mesh = attack_mesh()
    models = get_image_models(
        ["resnet", "vgg", "squeezenet", "alexnet"],
        {"resnet": 2, "vgg": 3, "squeezenet": 2, "alexnet": 3},
        input_hw=224, dtype=jnp.bfloat16)
    if variant == "cost":
        # roofline audit vs v5e peaks (819 GB/s HBM, ~197 bf16 TFLOP/s).
        # NOTE: XLA cost analysis counts a while/scan BODY ONCE regardless of
        # trip count, so lower a steps=1 runner — its numbers ≈ one attack
        # step + the one-time clean-tap collection. The steps=1 liveness
        # pattern overflows HBM at batch 16, so fit fixed+variable·B from
        # B=8 and B=4 programs and extrapolate — a naive 2× of the B=8
        # totals would also double the batch-INVARIANT weight traffic and
        # overstate the bound.
        def analyze(batch):
            c = shard_clips(jnp.full((batch, 3, 32, 224, 224), 0.5,
                                     jnp.float32), mesh)
            r1 = make_sharded_i2v_runner(models, mesh, steps=1, step_size=0.005)
            ca = r1.jitted.lower(*r1.example_args(c)).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            return (float(ca.get("flops", float("nan"))),
                    float(ca.get("bytes accessed", float("nan"))))

        f8, b8 = analyze(8)
        f4, b4 = analyze(4)
        f16 = f8 + (f8 - f4) * 2  # fixed + var·16
        b16 = b8 + (b8 - b4) * 2
        print(f"[cost] steps=1: B=4 bytes={b4:.3e}, B=8 bytes={b8:.3e} → "
              f"B=16 fit: flops={f16:.3e} bytes={b16:.3e} "
              f"(batch-fixed bytes {b8 - (b8 - b4) * 2:.3e})")
        print(f"[cost] roofline at B=16: HBM {b16/819e9*1e3:.1f} ms, "
              f"MXU {f16/197e12*1e3:.1f} ms "
              f"(measured ENS step: ~347 ms at 2.9 steps/s)")
        return

    import numpy as np

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
