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
    p.add_argument("--direction_image_model", default="resnet",
                   choices=["resnet", "vgg", "alexnet", "squeezenet"])
    p.add_argument("--aens_momentum", type=float, default=0.0)
    p.add_argument("--coef_CE", action="store_true")
    p.add_argument("--profile", default=None,
                   help="write a jax.profiler trace to this directory")
    p.add_argument("--sharded", action="store_true",
                   help="run I2V/ENS/AENS through the pjit-sharded "
                        "multi-chip runner (parallel/sharded.py) instead of "
                        "the single-device attack class")
    common.add_data_args(p)
    args = p.parse_args(argv)
    args.adv_path = os.path.join(
        get_paths().opt_path,
        artifacts.run_dir_name(kind, args.attack_method, args.step,
                               args.file_prefix))
    os.makedirs(args.adv_path, exist_ok=True)
    return args


def run(args) -> str:
    from ..utils.profiling import StepTimer, trace

    print(args)
    dataset, iterate = common.build_dataset(args)
    left, right = common.shard_bounds(args, len(dataset))
    attack = common.build_image_guided_attack(args)
    timer = StepTimer(steps_per_call=args.step, clips_per_call=args.batch_size)
    with trace(getattr(args, "profile", None)):
        for step, batch in enumerate(iterate(dataset, args.batch_size, left, right)):
            print(f"Running {args.attack_method}, {step + 1}")
            with timer:
                out = attack(batch["clips"], batch["labels"], batch["names"])
            adv = out[0] if isinstance(out, tuple) else out  # AENS triple-return
            common.save_attack_outputs(args.adv_path, batch, adv)
    artifacts.save_loss_info(args.adv_path, attack.loss_info, args.batch_index)
    print(f"[summary] {timer.summary()}")
    return args.adv_path


def main(argv=None) -> str:
    return run(arg_parse(argv))


if __name__ == "__main__":
    main()
