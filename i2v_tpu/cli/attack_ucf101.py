"""White-box attack CLI, UCF-101 (reference C23: attack_ucf101.py).

Same flow as cli.attack with the UCF-101 frame-JPEG dataset, fine-tuned
101-class checkpoints, and the ``UCF101_Video-…`` run-dir prefix
(reference: attack_ucf101.py:56-59,74-79).
"""

from __future__ import annotations

import argparse
import os

from ..models import get_video_model
from ..utils import artifacts, get_paths
from . import common


def arg_parse(argv=None):
    p = argparse.ArgumentParser(description="white-box video attack (UCF-101)")
    p.add_argument("--model", default="i3d_resnet50")
    p.add_argument("--attack_method", default="BIM",
                   choices=common.WHITEBOX_METHODS)
    p.add_argument("--step", type=int, default=10)
    p.add_argument("--file_prefix", default="")
    # TT params hardcoded in the reference (attack_ucf101.py:86-88)
    p.add_argument("--kernlen", type=int, default=15)
    p.add_argument("--momentum", type=int, default=0)
    p.add_argument("--augmentation_weight", type=float, default=0.0)
    p.add_argument("--move_type", default="adj")
    p.add_argument("--kernel_mode", default="gaussian")
    # TPU perf levers (same semantics as cli.attack)
    p.add_argument("--tt_chunk", type=int, default=5)
    p.add_argument("--sim_batch_scales", action="store_true")
    p.add_argument("--remat", action="store_true")
    common.add_data_args(p)
    args = p.parse_args(argv)
    if args.data == "kinetics":
        args.data = "ucf101"
    args.adv_path = os.path.join(
        get_paths().opt_path,
        artifacts.run_dir_name(f"UCF101_Video_{args.model}",
                               args.attack_method, args.step,
                               common.effective_file_prefix(args)))
    return args


def main(argv=None) -> str:
    args = arg_parse(argv)
    print(args)
    dataset, iterate = common.build_dataset(args)
    bundle = get_video_model(args.model, tiny=args.tiny, ucf101=not args.tiny,
                             remat=args.remat)
    attack = common.build_whitebox_attack(args, bundle)
    for step, batch in enumerate(
            common.batch_iterator(args, dataset, iterate, keep_host=True)):
        print(f"Running {args.attack_method}, {step + 1}")
        adv = attack(batch["clips"], batch["labels"])
        common.save_attack_outputs(args.adv_path, batch, adv, save_ori=True)
    return args.adv_path


if __name__ == "__main__":
    main()
