"""Transfer-evaluation CLI, UCF-101 (reference C28: reference_ucf101.py):
the six video models with fine-tuned 101-class checkpoints, 101 report rows.
"""

from __future__ import annotations

from ..eval import evaluate_run
from . import evaluate


def main(argv=None) -> dict:
    import jax.numpy as jnp

    args = evaluate.arg_parse(argv, n_classes=101)
    acc = evaluate_run(
        args.adv_path, model_names=args.models, batch_size=args.batch_size,
        n_classes=args.n_classes, ucf101=True, tiny=args.tiny,
        dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
        data_parallel=args.data_parallel, single_pass=args.single_pass)
    print(acc)
    return acc


if __name__ == "__main__":
    main()
