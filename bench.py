"""Benchmark: ENS-I2V attack throughput on the north-star config.

Config (BASELINE.md / reference Table-3: run_image_guided.py:72-80,
image_attacks.py:372-376): 60-step ENS-I2V over the 4-surrogate ensemble
(resnet101 d2, vgg16 d3, squeezenet d2, alexnet d3), ε=16/255, step_size
0.005, clips 16×32×224² — four surrogate fwd+bwd passes over a 512-frame
batch per attack step.

Metric: attack steps/sec/chip. vs_baseline anchors to the PyTorch reference
on its published hardware (RTX 2080Ti, README.md:48-52): the single-model
ResNet-101 f32 proxy is ≈0.21 steps/s (2080Ti ResNet-101 training throughput
≈107 img/s at 512 frames/step); the 4-model ensemble step adds VGG-16 (the
dominant surrogate) + two light models ≈ 4× → ≈0.053 steps/s. The reference
repo records no absolute numbers (BASELINE.md), so the anchor is an estimate,
stated here explicitly.

Roofline (tools/perf_probe.py cost — XLA cost analysis of a steps=1
program, since scan bodies are counted once regardless of trip count): one
B=16 ENS step ≈ 43 TFLOP / ~211 GB accessed → HBM bound 257 ms, MXU bound
220 ms vs ~347 ms measured ⇒ ~74% of the HBM roofline / ~63% MXU
utilization, on a VGG-heavy step whose early layers are intrinsically
bandwidth-colored. Verified non-wins (tools/perf_probe.py): bf16
param pre-cast (XLA hoists it), batch 32 (memory pressure), frame-chunked
grad accumulation, remat'd tap collection (2.09 vs 2.90 steps/s — recompute
costs more than the saved activation traffic), scan unroll=2 (2.88, parity),
bf16 Adam first moment (2.90, parity — optimizer-state traffic is too small
a fraction); remat+batch32 exceeds the remote-compile path in this env.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/i2v_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REF_2080TI_ENS_STEPS_PER_SEC = 0.053  # estimated; see module docstring
STEPS = 60


def log(*a):
    print(*a, file=sys.stderr, flush=True)


REF_2080TI_I2V_STEPS_PER_SEC = 0.21  # single-surrogate anchor (see docstring)

CONFIGS = (
    # (label, surrogate names, depths, anchor)
    ("ENS-I2V attack steps/sec/chip (4-surrogate ensemble, 16x32x224^2-frame steps)",
     ["resnet", "vgg", "squeezenet", "alexnet"],
     {"resnet": 2, "vgg": 3, "squeezenet": 2, "alexnet": 3},
     REF_2080TI_ENS_STEPS_PER_SEC),
    # fallback: the single-surrogate Table-3 config (much faster compile)
    ("I2V attack steps/sec/chip (ResNet-101 d2, 16x32x224^2-frame steps)",
     ["resnet"], {"resnet": 2}, REF_2080TI_I2V_STEPS_PER_SEC),
)


def build_runner(names, depths, batch, frames, hw, dtype):
    from i2v_tpu.models import get_image_models
    from i2v_tpu.parallel import attack_mesh, shard_clips
    from i2v_tpu.parallel.sharded import make_sharded_i2v_runner

    mesh = attack_mesh()
    models = get_image_models(names, depths, input_hw=hw, dtype=dtype)
    runner = make_sharded_i2v_runner(models, mesh, steps=STEPS, step_size=0.005)
    clean01 = shard_clips(
        jnp.full((batch, 3, frames, hw, hw), 0.5, jnp.float32), mesh
    )
    return runner, clean01


def main():
    import warnings

    warnings.filterwarnings("ignore")
    n_chips = len(jax.devices())
    log(f"devices: {jax.devices()}")
    for metric, names, depths, anchor in CONFIGS:
        for batch in (16, 8):
            try:
                runner, clean01 = build_runner(names, depths, batch, 32, 224,
                                               jnp.bfloat16)
                log(f"compiling ({metric} batch={batch})...")
                t0 = time.time()
                adv, costs = runner(clean01)
                jax.block_until_ready(adv)
                log(f"compile+first run: {time.time() - t0:.1f}s; "
                    f"cost[0]={float(costs[0]):.2f} cost[-1]={float(costs[-1]):.2f}")
                reps = 2
                t0 = time.time()
                for _ in range(reps):
                    adv, costs = runner(clean01)
                    # sync on the tiny per-step cost vector, NOT the 308MB adv
                    # clip batch: through the axon relay block_until_ready can
                    # ack before execution finishes (observed: a 60-step run
                    # "completing" in microseconds), while device->host
                    # transfers crawl at ~10MB/s — costs materialize only when
                    # the scan has actually run and cost 240 bytes to fetch
                    final_cost = float(np.asarray(costs)[-1])
                dt = time.time() - t0
                log(f"final cost {final_cost:.2f}")
                # normalize to the canonical 512-frame step
                frames_per_step = batch * 32
                steps_per_sec = STEPS * reps / dt * (frames_per_step / 512)
                per_chip = steps_per_sec / n_chips
                log(f"adv clips/s end-to-end: {batch * reps / dt:.2f}")
                print(json.dumps({
                    "metric": metric,
                    "value": round(per_chip, 3),
                    "unit": "steps/s/chip",
                    "vs_baseline": round(per_chip / anchor, 2),
                }))
                return
            except Exception as e:  # OOM / compile failure → next config
                log(f"{metric} batch={batch} failed: "
                    f"{type(e).__name__}: {str(e)[:300]}")
    raise SystemExit("all bench configs failed")


if __name__ == "__main__":
    main()
