"""Execute the flagship 400-clip fused generate→evaluate END TO END.

VERDICT r4 next #3: the headline "400-clip gen+eval ≈ 765 s" was a
projection from 3 timed batches (bench.py bench_e2e,
projected_400clip_gen_eval_wall_s). This tool runs the reference's actual
production unit of work — run_image_guided.py:62-80's 400-clip
attack→evaluate cycle — for real, through the fused pipeline + artifact
protocol + resume, including a mid-run HARD KILL:

  phase A:  python tools/e2e_400.py --kill_after_batches 18
            (os._exit mid-run — a worker loss; save_adv_clip writes are
             atomic, so the run dir holds only complete artifacts)
  phase B:  python tools/e2e_400.py --resume
            (skip-if-exists: labels already on disk are RE-SCORED through
             the resident eval models — eval/fused.process_artifacts — and
             only the missing labels pay the 60-step attack; finalize
             writes the complete 400-row reference-schema reports)

Config matches the projected row exactly: u8 ingress, bf16 ENS 60 steps,
frame_chunk 256, async f16 artifacts, all six video models (bf16), B=8.

Per-batch progress marks append to <run_dir>/e2e_progress.jsonl (they
survive the kill, so phase A's wall clock is measured, not remembered).
Writes E2E_400.json at the repo root and merges an exec_e2e400 record into
PERF_PROBE.json with `executed: true` and the measured-vs-projected delta.
"""

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from i2v_tpu.utils.paths import compile_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(ROOT, "E2E_400.json")
ENS_NAMES = ["resnet", "vgg", "squeezenet", "alexnet"]
ENS_DEPTHS = {"resnet": 2, "vgg": 3, "squeezenet": 2, "alexnet": 3}
N_CLIPS = 400  # the reference's Kinetics attack set: one clip per class
BATCH = 8
STEPS = 60


def synth_u8_batch(labels) -> np.ndarray:
    """Deterministic per-label uint8 clips (32,224,224,3) — the datasets'
    raw decoded form, so the run exercises the same u8 ingress as bench_e2e.
    Per-label seeding makes phase A and phase B see identical data."""
    out = np.empty((len(labels), 32, 224, 224, 3), dtype=np.uint8)
    for i, lab in enumerate(labels):
        rng = np.random.RandomState(10_000 + int(lab))
        # low-res structure upsampled by repetition: cheap to generate and
        # not degenerate for conv features (pure white noise under-drives
        # early taps); exact content is irrelevant to the timing question
        base = rng.randint(0, 256, (32, 28, 28, 3), dtype=np.uint8)
        out[i] = np.repeat(np.repeat(base, 8, axis=1), 8, axis=2)
    return out


def mark(run_dir: str, **payload) -> None:
    payload["ts"] = round(time.time(), 2)
    with open(os.path.join(run_dir, "e2e_progress.jsonl"), "a") as f:
        f.write(json.dumps(payload) + "\n")


def read_marks(run_dir: str) -> list:
    path = os.path.join(run_dir, "e2e_progress.jsonl")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def build_pipeline(run_dir: str):
    from i2v_tpu.eval.fused import FusedGenerateEvaluate
    from i2v_tpu.models import get_image_models, get_video_model
    from i2v_tpu.models.video_zoo import VIDEO_BUILDERS
    from i2v_tpu.parallel import attack_mesh
    from i2v_tpu.parallel.sharded import ShardedImageGuidedAttack

    mesh = attack_mesh()
    surrogates = get_image_models(ENS_NAMES, ENS_DEPTHS, input_hw=224,
                                  dtype=jnp.bfloat16)
    attack = ShardedImageGuidedAttack(surrogates, mesh, steps=STEPS,
                                      step_size=0.005, frame_chunk=256,
                                      param_dtype=jnp.bfloat16)
    names = list(VIDEO_BUILDERS)
    print(f"[e2e400] eval models ({len(names)}): {names}", flush=True)
    bundles = {n: get_video_model(n, dtype=jnp.bfloat16) for n in names}
    return FusedGenerateEvaluate(attack, bundles, run_dir=run_dir,
                                 n_classes=N_CLIPS,
                                 artifact_dtype=np.float16)


def run(args) -> None:
    from i2v_tpu.utils import artifacts

    os.makedirs(args.run_dir, exist_ok=True)
    phase = "B" if args.resume else "A"
    existing = sorted(artifacts.existing_labels(args.run_dir))
    missing = [lab for lab in range(N_CLIPS) if lab not in set(existing)]
    print(f"[e2e400:{phase}] {len(existing)} labels on disk, "
          f"{len(missing)} to attack", flush=True)
    t_setup = time.time()
    fused = build_pipeline(args.run_dir)
    mark(args.run_dir, phase=phase, event="setup",
         setup_s=round(time.time() - t_setup, 2))

    t_phase = time.time()
    if args.resume and existing:
        files = artifacts.list_adv_files(args.run_dir)
        for chunk in artifacts.batch_files(files, BATCH):
            fused.process_artifacts(chunk)
        mark(args.run_dir, phase=phase, event="rescored",
             clips=len(existing), wall_s=round(time.time() - t_phase, 2))
        print(f"[e2e400:B] re-scored {len(existing)} artifacts in "
              f"{time.time() - t_phase:.1f}s", flush=True)

    t_attack = time.time()
    batches = [missing[i:i + BATCH] for i in range(0, len(missing), BATCH)]
    for bi, labels in enumerate(batches):
        fused.process_batch({
            "clips": synth_u8_batch(labels),
            "labels": np.asarray(labels, dtype=np.int64),
            "names": [f"clip{lab}" for lab in labels],
        })
        mark(args.run_dir, phase=phase, event="batch", batch=bi,
             clips_done=(bi + 1) * len(labels),
             wall_s=round(time.time() - t_attack, 2))
        if bi == 0:
            print(f"[e2e400:{phase}] first batch (compile+run) "
                  f"{time.time() - t_attack:.1f}s", flush=True)
        if args.kill_after_batches and bi + 1 >= args.kill_after_batches:
            # HARD worker loss: no writer drain, no finalize, no atexit —
            # exactly what resume must survive
            print(f"[e2e400:A] hard kill after batch {bi + 1} "
                  f"({time.time() - t_attack:.1f}s)", flush=True)
            os._exit(137)
    attack_wall = time.time() - t_attack

    t_fin = time.time()
    acc = fused.finalize(report_dir=args.run_dir)
    fin_wall = time.time() - t_fin
    mark(args.run_dir, phase=phase, event="finalized",
         attack_wall_s=round(attack_wall, 2),
         finalize_wall_s=round(fin_wall, 2))
    print(f"[e2e400:{phase}] attack {attack_wall:.1f}s, finalize "
          f"{fin_wall:.1f}s, top1 {acc}", flush=True)

    if args.resume:
        summarize(args)


def summarize(args) -> None:
    """Assemble E2E_400.json from the surviving progress marks + reports."""
    import pandas as pd

    from i2v_tpu.utils import artifacts

    marks = read_marks(args.run_dir)
    a = [m for m in marks if m["phase"] == "A"]
    b = [m for m in marks if m["phase"] == "B"]
    a_batches = [m for m in a if m["event"] == "batch"]
    # phase A wall: setup + last surviving batch mark (the in-flight batch
    # at the kill is unmeasured — stated, not hidden)
    a_setup = sum(m["setup_s"] for m in a if m["event"] == "setup")
    a_wall = a_setup + (a_batches[-1]["wall_s"] if a_batches else 0.0)
    b_setup = sum(m["setup_s"] for m in b if m["event"] == "setup")
    b_rescore = next((m for m in b if m["event"] == "rescored"), {})
    b_fin = next((m for m in b if m["event"] == "finalized"), {})
    b_wall = (b_setup + b_rescore.get("wall_s", 0.0)
              + b_fin.get("attack_wall_s", 0.0)
              + b_fin.get("finalize_wall_s", 0.0))

    # steady-state attack+eval rate from consecutive batch marks
    # (first batch of each phase excluded — it pays the jit compile):
    # the un-killed single-process rate the projection estimated
    def _steady(batches):
        if len(batches) < 3:
            return None
        dt = batches[-1]["wall_s"] - batches[0]["wall_s"]
        return round(BATCH * (len(batches) - 1) / dt, 3) if dt > 0 else None

    b_batches = [m for m in b if m["event"] == "batch"]
    steady_a = _steady(a_batches)
    steady = _steady(b_batches) or steady_a

    n_artifacts = len(artifacts.list_adv_files(args.run_dir))
    csv = pd.read_csv(os.path.join(args.run_dir,
                                   "results_all_models_prediction.csv"))
    with open(os.path.join(args.run_dir, "top1_acc_all_models.json")) as f:
        acc = json.load(f)
    model_cols = [c for c in csv.columns if c.endswith("-pre")]
    covered = int((csv[model_cols].to_numpy() != -1).all(axis=1).sum())

    total = round(a_wall + b_wall, 1)
    projected = 765.1  # BENCH_LIVE e2e row, projected_400clip_gen_eval_wall_s
    out = {
        "executed": True,
        "config": ("u8 ingress, bf16 ENS 60 steps frame_chunk=256, async "
                   "f16 artifacts, 6 video models bf16, B=8 — the exact "
                   "projected configuration (bench_e2e)"),
        "clips": N_CLIPS,
        "batch": BATCH,
        "phase_a": {
            "setup_s": round(a_setup, 1),
            "batches_completed": len(a_batches),
            "clips_attacked": (a_batches[-1]["clips_done"]
                               if a_batches else 0),
            "wall_s": round(a_wall, 1),
            "killed": "hard os._exit after the last recorded batch mark; "
                      "the in-flight batch at the kill is unmeasured",
        },
        "phase_b": {
            "setup_s": round(b_setup, 1),
            "rescored_clips": b_rescore.get("clips", 0),
            "rescore_wall_s": b_rescore.get("wall_s", 0.0),
            "attack_wall_s": b_fin.get("attack_wall_s", 0.0),
            "finalize_wall_s": b_fin.get("finalize_wall_s", 0.0),
            "wall_s": round(b_wall, 1),
        },
        "total_measured_wall_s": total,
        "clips_per_s_end_to_end": round(N_CLIPS / total, 3),
        "steady_state_clips_per_s": steady,
        "steady_state_clips_per_s_phase_a": steady_a,
        "artifact_count": n_artifacts,
        "report_rows": int(len(csv)),
        "labels_fully_covered": covered,
        "top1_acc": acc,
        "projected_400clip_gen_eval_wall_s": projected,
        "measured_vs_projected": round(total / projected, 3),
        "note": ("measured total includes what the projection could not: "
                 "two process setups/compiles, the mid-run kill, and the "
                 "resume's re-score of the surviving artifacts (f32 "
                 "re-upload through the ~10 MB/s relay dominates it) — the "
                 "steady_state rates are the like-for-like comparison "
                 "against the projection's attack-only basis "
                 "(phase A ran alone; phase B shared the single host CPU "
                 "with the nice-15 ASR-proxy run)"),
    }
    with open(ARTIFACT, "w") as f:
        json.dump(out, f, indent=1)
    # PERF_PROBE row (VERDICT r4 next #3 'done' criterion)
    from tools.perf_probe import record

    record("exec_e2e400", {
        "executed": True,
        "total_measured_wall_s": total,
        "clips_per_s_end_to_end": out["clips_per_s_end_to_end"],
        "steady_state_clips_per_s": steady,
        "steady_state_clips_per_s_phase_a": steady_a,
        "artifact_count": n_artifacts,
        "labels_fully_covered": covered,
        "projected_wall_s": projected,
        "measured_vs_projected": out["measured_vs_projected"],
        "detail": "E2E_400.json",
    })
    print(json.dumps(out, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir",
                    default=os.path.join(ROOT, "outputs", "e2e400"))
    ap.add_argument("--kill_after_batches", type=int, default=0,
                    help="phase A: os._exit after this many attack batches")
    ap.add_argument("--resume", action="store_true",
                    help="phase B: re-score existing artifacts, attack "
                         "missing labels, write full reports + E2E_400.json")
    ap.add_argument("--summarize_only", action="store_true")
    args = ap.parse_args()
    if args.summarize_only:
        summarize(args)
    else:
        run(args)


if __name__ == "__main__":
    main()
