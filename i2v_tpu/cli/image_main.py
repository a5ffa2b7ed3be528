"""Image-guided attack CLI, Kinetics-400 (reference C24: image_main.py).

    python -m i2v_tpu.cli.image_main --attack_method ImageGuidedFMDirection_Adam \
        --direction_image_model resnet --depth 2 --step 60 --step_size 0.005

Writes ``{label}-adv.npy`` + ``loss_info_{shard}.json`` into
``OPT_PATH/Image-{method}-{step}-{prefix}``. The --batch_nums/--batch_index
manual sharding contract is kept (reference: image_main.py:18-19,61-63);
single-host multi-chip runs shard over the mesh automatically instead.
Additionally wires AENS_I2V_MF, which the reference defines but never
exposes on a CLI (SURVEY.md C19 'no CLI caller in-repo').
"""

from __future__ import annotations

import argparse
import os

from ..utils import artifacts, get_paths
from . import common


def _int_or_auto(s: str):
    """argparse type for --frame_chunk: an int or the literal 'auto'."""
    if s == "auto":
        return s
    try:
        return int(s)
    except ValueError:
        raise argparse.ArgumentTypeError(
            f"expected an integer or 'auto', got {s!r}")


def arg_parse(argv=None, kind: str = "Image", default_step: int = 60):
    """``default_step``: 60 for Kinetics (image_main.py:28), 10 for UCF-101
    (image_main_ucf101.py:26) — default runs must land in the same
    {kind}-{method}-{step}- run dirs as the reference."""
    p = argparse.ArgumentParser(description="image-guided cross-modal attack")
    p.add_argument("--batch_nums", type=int, default=1)
    p.add_argument("--batch_index", type=int, default=1)
    p.add_argument("--attack_method", default="ImageGuidedFMDirection_Adam",
                   choices=common.IMAGE_GUIDED_METHODS)
    p.add_argument("--step", type=int, default=default_step)
    p.add_argument("--file_prefix", default="")
    p.add_argument("--depth", type=int, default=1, help="tap depth 1-4")
    p.add_argument("--step_size", type=float, default=0.004)
    # the reference CLI exposes the 4 ENS surrogates (image_main.py:27);
    # densenet161 and ViT-B/16 exist in its zoo but are never wired
    # (image_attacks.py:96-99, TPAMI_attack.py:88-98) — wired here
    p.add_argument("--direction_image_model", default="resnet",
                   choices=["resnet", "vgg", "alexnet", "squeezenet",
                            "densenet", "vit"])
    p.add_argument("--aens_momentum", type=float, default=0.0)
    p.add_argument("--coef_CE", action="store_true")
    p.add_argument("--profile", default=None,
                   help="write a jax.profiler trace to this directory")
    p.add_argument("--sharded", action="store_true",
                   help="run I2V/ENS/AENS through the pjit-sharded "
                        "multi-chip runner (parallel/sharded.py) instead of "
                        "the single-device attack class")
    p.add_argument("--model_parallel", type=int, default=None, metavar="N",
                   help="split the surrogate ensemble over an N-wide "
                        "'model' mesh axis (parallel/ensemble.py): each "
                        "device runs ~1 surrogate per step instead of all "
                        "4, gradients (and for AENS the per-tap coefficient "
                        "signals) psum over ICI. Ensemble methods "
                        "(ENS/AENS) only")
    p.add_argument("--frame_chunk", type=_int_or_auto, default=None,
                   help="with --sharded/--model_parallel: gradient-"
                        "accumulate over frame-axis chunks of this size "
                        "(exact — the objective is per-frame separable); "
                        "enables f32 at B=16 on one 16GB chip. 'auto' picks "
                        "the measured-optimum chunk for the resolution/dtype "
                        "(parallel/sharded.resolve_frame_chunk)")
    p.add_argument("--param_dtype", default=None,
                   choices=["bfloat16"],
                   help="with --sharded: store surrogate weights in bf16 "
                        "(saves ~300MB HBM for the 4-model ensemble)")
    p.add_argument("--multigrid", type=int, default=0, metavar="K",
                   help="with --sharded or --model_parallel (I2V/ENS only): "
                        "run the first K of "
                        "--step Adam steps on 2x-downsampled clips and "
                        "warm-start the full-resolution phase from the "
                        "upsampled modifier (parallel/multigrid.py). "
                        "~1/4 the surrogate work for the K coarse steps; "
                        "opt-in — the trajectory differs from the "
                        "reference's. Measured Pareto at 60 steps (PERF_"
                        "PROBE.json exec_mg16_bf16_cs*, ASR-gated in "
                        "ASR_PROXY.json): K=12 beats plain bf16 on both "
                        "final cost and steps/s; K=30 is fastest (1.6x) at "
                        "8.7%%-worse final cost")
    p.add_argument("--multigrid_scale", type=int, default=2,
                   help="multigrid downsampling factor (must divide the "
                        "spatial size)")
    p.add_argument("--fused_eval", default=None, metavar="MODELS",
                   help="fuse generation and evaluation: comma-separated "
                        "video model names (or 'all') evaluated on-device "
                        "right after each attacked batch, artifacts written "
                        "asynchronously (eval/fused.py). Replaces the "
                        "reference's generate-then-evaluate artifact round "
                        "trip (run_image_guided.py:48-52)")
    p.add_argument("--artifact_dtype", default="float32",
                   choices=["float32", "float16"],
                   help="artifact storage dtype; float16 halves the "
                        "device->host egress that dominates relay-backed runs")
    p.add_argument("--no_artifacts", action="store_true",
                   help="with --fused_eval: skip artifact writes entirely "
                        "(reports only)")
    common.add_data_args(p)
    args = p.parse_args(argv)
    args.kind = kind
    args.adv_path = os.path.join(
        get_paths().opt_path,
        artifacts.run_dir_name(kind, args.attack_method, args.step,
                               common.effective_file_prefix(args)))
    os.makedirs(args.adv_path, exist_ok=True)
    return args


def run(args) -> str:
    from ..utils.profiling import StepTimer, trace

    print(args)
    dataset, iterate = common.build_dataset(args)
    left, right = common.shard_bounds(args, len(dataset))
    attack = common.build_image_guided_attack(args)
    if getattr(args, "fused_eval", None):
        return _run_fused(args, dataset, iterate, attack, left, right)
    import numpy as np

    dtype = np.float16 if args.artifact_dtype == "float16" else np.float32
    import jax

    # per-CHIP throughput: the mesh runners span every local device, the
    # plain attack classes jit onto one
    n_chips = (len(jax.devices())
               if (getattr(args, "sharded", False)
                   or getattr(args, "model_parallel", None)) else 1)
    timer = StepTimer(steps_per_call=args.step, clips_per_call=args.batch_size,
                      n_chips=n_chips)
    with trace(getattr(args, "profile", None)):
        for step, batch in enumerate(
                common.batch_iterator(args, dataset, iterate, left, right)):
            print(f"Running {args.attack_method}, {step + 1}")
            with timer(clips=len(batch["labels"])):
                out = attack(batch["clips"], batch["labels"], batch["names"])
            adv = out[0] if isinstance(out, tuple) else out  # AENS triple-return
            common.save_attack_outputs(args.adv_path, batch, adv, dtype=dtype)
    artifacts.save_loss_info(args.adv_path, attack.loss_info,
                             common.loss_shard_index(args))
    print(f"[summary] {timer.summary()}")
    return args.adv_path


def _run_fused(args, dataset, iterate, attack, left, right) -> str:
    """Fused generate→evaluate (VERDICT r1 #1): adversarial clips feed the
    video models on-device; artifact egress runs in a background thread."""
    import time

    import numpy as np

    from ..eval.fused import FusedGenerateEvaluate
    from ..models.video_zoo import VIDEO_BUILDERS, get_video_model
    from ..utils.paths import VIDEO_MODEL_NAMES

    names = (list(VIDEO_MODEL_NAMES) if args.fused_eval == "all"
             else [n.strip() for n in args.fused_eval.split(",") if n.strip()])
    for n in names:
        if n not in VIDEO_BUILDERS:
            raise SystemExit(f"unknown video model {n!r}; have "
                             f"{sorted(VIDEO_BUILDERS)}")
    ucf = getattr(args, "kind", "Image").startswith("UCF101")
    bundles = {n: get_video_model(n, tiny=args.tiny, ucf101=ucf and not args.tiny)
               for n in names}
    # report rows: one per class (reference: reference.py:106, _ucf101.py:137)
    n_classes = 101 if ucf else 400
    dtype = np.float16 if args.artifact_dtype == "float16" else np.float32
    fused = FusedGenerateEvaluate(
        attack, bundles,
        run_dir=None if args.no_artifacts else args.adv_path,
        n_classes=n_classes, artifact_dtype=dtype)
    from ..utils.profiling import trace

    t0 = time.time()
    n_clips = 0
    with trace(getattr(args, "profile", None)):
        for step, batch in enumerate(
                common.batch_iterator(args, dataset, iterate, left, right)):
            print(f"Running fused {args.attack_method}+eval, {step + 1}")
            fused.process_batch(batch)
            n_clips += len(batch["labels"])
    import jax

    multi_shard = getattr(args, "batch_nums", 1) > 1 or jax.process_count() > 1
    acc = fused.finalize(
        report_dir=args.adv_path,
        shard=common.loss_shard_index(args) if multi_shard else None)
    dt = time.time() - t0
    artifacts.save_loss_info(args.adv_path, attack.loss_info,
                             common.loss_shard_index(args))
    print(f"[summary] fused gen+eval: {n_clips / dt:.3f} clips/s "
          f"({n_clips} clips, {len(names)} eval models, {dt:.1f}s)")
    print(f"[summary] top1: {acc}")
    return args.adv_path


def main(argv=None) -> str:
    return run(arg_parse(argv))


if __name__ == "__main__":
    main()
