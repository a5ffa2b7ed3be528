"""Transfer-evaluation CLI, Kinetics-400 (reference C27: reference.py).

    python -m i2v_tpu.cli.evaluate --adv_path <run-dir-or-name>

Emits ``results_all_models_prediction.csv`` + ``top1_acc_all_models.json``
into the run dir. Attack success rate = 100 − top-1.
"""

from __future__ import annotations

import argparse
import os

from ..eval import evaluate_run
from ..utils import get_paths


def arg_parse(argv=None, n_classes: int = 400):
    p = argparse.ArgumentParser(description="transfer evaluation")
    p.add_argument("--adv_path", required=True)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--models", nargs="*", default=None,
                   help="subset of video models (default: all six)")
    p.add_argument("--ucf101", action="store_true")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 model compute (halves eval HBM traffic; "
                        "top-1 can differ on borderline clips — default "
                        "stays f32 for report parity)")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard eval batches over all local devices (dp eval; "
                        "partial batches fall back to replicated)")
    p.add_argument("--single_pass", action="store_true",
                   help="keep all models resident and evaluate each uploaded "
                        "batch through every model — one artifact read + "
                        "host→device upload total instead of one per model "
                        "(the reference re-uploads everything per model, "
                        "reference.py:108-125); identical reports")
    p.add_argument("--n_classes", type=int, default=None,
                   help=f"report rows (default: {n_classes}, or 101 with "
                        "--ucf101 — the reference_ucf101.py:137 schema)")
    p.add_argument("--matmul_precision", default=None,
                   choices=["default", "high", "float32"],
                   help="MXU precision for f32 dots/convs in the eval "
                        "forwards (see image_main --matmul_precision; "
                        "'float32' = the torch-parity numerics, so borderline "
                        "top-1 calls match the reference bit-faithfully)")
    args = p.parse_args(argv)
    if args.n_classes is None:
        args.n_classes = 101 if args.ucf101 else n_classes
    if not os.path.isdir(args.adv_path):
        args.adv_path = os.path.join(get_paths().opt_path, args.adv_path)
    return args


def main(argv=None) -> dict:
    args = arg_parse(argv)
    from .common import apply_matmul_precision

    apply_matmul_precision(args)
    import jax.numpy as jnp

    acc = evaluate_run(
        args.adv_path, model_names=args.models, batch_size=args.batch_size,
        n_classes=args.n_classes, ucf101=args.ucf101, tiny=args.tiny,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        data_parallel=args.data_parallel, single_pass=args.single_pass)
    print(acc)
    return acc


if __name__ == "__main__":
    main()
