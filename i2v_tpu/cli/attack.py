"""White-box attack CLI, Kinetics-400 (reference C22: attack.py).

    python -m i2v_tpu.cli.attack --model i3d_resnet50 --attack_method BIM \
        --step 10 [--data kinetics|synthetic] [--tiny]

Writes per-sample ``{label}-adv.npy`` AND ``{label}-ori.npy`` into
``OPT_PATH/{model}-{method}-{step}-{prefix}`` (reference: attack.py:55-60,92-96).
"""

from __future__ import annotations

import argparse
import os

from ..models import get_video_model
from ..utils import artifacts, get_paths
from . import common


def arg_parse(argv=None):
    p = argparse.ArgumentParser(description="white-box video attack (Kinetics-400)")
    p.add_argument("--model", default="i3d_resnet50")
    p.add_argument("--attack_type", default="image", choices=["image", "video"],
                   help="reference-CLI compatibility flag (attack.py:76-83); "
                        "dispatch here is by method name")
    p.add_argument("--attack_method", default="BIM",
                   choices=common.WHITEBOX_METHODS)
    p.add_argument("--step", type=int, default=10)
    p.add_argument("--file_prefix", default="")
    # TemporalTranslation params (reference: attack.py:13-61)
    p.add_argument("--kernlen", type=int, default=15)
    p.add_argument("--momentum", type=int, default=0)
    p.add_argument("--augmentation_weight", type=float, default=0.0)
    p.add_argument("--move_type", default="adj", choices=["adj", "large", "random"])
    p.add_argument("--kernel_mode", default="gaussian",
                   choices=["gaussian", "linear", "uniform", "random"])
    p.add_argument("--remat", action="store_true",
                   help="rematerialize model bottlenecks+stem in backward "
                        "passes (activation HBM vs MXU recompute; raises the "
                        "largest single-chip batch for momentum-carrying "
                        "attacks)")
    p.add_argument("--batch_chunk", type=int, default=None,
                   help="gradient-accumulate over clip-batch chunks of this "
                        "size (exact for the mean-CE attacks); fits MIFGSM "
                        "B=16 on one 16GB chip")
    p.add_argument("--sim_batch_scales", action="store_true",
                   help="SIM: fold the 5 scale copies into one batched "
                        "fwd+bwd (5x activation memory, one gradient query)")
    p.add_argument("--tt_chunk", type=int, default=5,
                   help="TT shift-variants per gradient query (reference "
                        "sub-batches by 5 for GPU memory, video_attacks.py:"
                        "203-210; on one v5e chunk=15 fits I3D-R50 and is "
                        "~1.7x faster)")
    common.add_data_args(p)
    args = p.parse_args(argv)
    args.adv_path = os.path.join(
        get_paths().opt_path,
        artifacts.run_dir_name(args.model, args.attack_method, args.step,
                               common.effective_file_prefix(args)))
    return args


def main(argv=None) -> str:
    args = arg_parse(argv)
    print(args)
    dataset, iterate = common.build_dataset(args)
    bundle = get_video_model(args.model, tiny=args.tiny,
                             remat=getattr(args, "remat", False))
    attack = common.build_whitebox_attack(args, bundle)
    # a sample is done only when BOTH artifacts exist — a crash between the
    # adv and ori writes must not leave the label ori-less forever
    done = (artifacts.existing_labels(args.adv_path)
            & artifacts.existing_labels(args.adv_path, "ori"))
    view = common.resume_subset(dataset, done)
    if view is not None:
        print(f"resume: {len(dataset) - len(view)} of {len(dataset)} "
              "samples already attacked; skipping their decode")
        dataset = view
    for step, batch in enumerate(
            common.batch_iterator(args, dataset, iterate, keep_host=True)):
        if all(int(l) in done for l in batch["labels"]):
            continue  # idempotent resume (sources without cheap labels)
        print(f"Running {args.attack_method}, {step + 1}")
        adv = attack(batch["clips"], batch["labels"])
        common.save_attack_outputs(args.adv_path, batch, adv, save_ori=True)
    return args.adv_path


if __name__ == "__main__":
    main()
