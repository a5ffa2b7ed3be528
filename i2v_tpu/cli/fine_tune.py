"""ILAF fine-tuning CLI (reference C26: image_fine_tune_attack.py).

Pairs ``{id}-adv.npy`` from --used_adv with ``{id}-ori.npy`` from --used_ori
(white-box runs save oris; image-guided runs don't — reference README
workflow, SURVEY.md appendix), fine-tunes each clip on the white-box video
model's mid-layer features, and writes the result to a new run dir.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .. import attacks
from ..models import get_video_model, tap_keys_for
from ..utils import artifacts, get_paths


def arg_parse(argv=None):
    p = argparse.ArgumentParser(description="ILAF fine-tuning")
    p.add_argument("--used_adv", required=True,
                   help="run dir containing {id}-adv.npy inputs")
    p.add_argument("--used_ori", default=None,
                   help="run dir containing {id}-ori.npy (defaults to used_adv)")
    p.add_argument("--model", default="i3d_resnet50")
    p.add_argument("--attack_method", default="ILAF", choices=["ILAF"],
                   help="kept for reference-CLI compatibility "
                        "(image_fine_tune_attack.py defines only ILAF)")
    p.add_argument("--step", type=int, default=60)
    p.add_argument("--step_size", type=float, default=0.005)
    p.add_argument("--file_prefix", default="")
    p.add_argument("--ucf101", action="store_true")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--matmul_precision", default=None,
                   choices=["default", "high", "float32"],
                   help="MXU precision for f32 dots/convs (see image_main "
                        "--matmul_precision)")
    args = p.parse_args(argv)
    opt = get_paths().opt_path
    if not os.path.isabs(args.used_adv) and not os.path.isdir(args.used_adv):
        args.used_adv = os.path.join(opt, args.used_adv)
    args.used_ori = args.used_ori or args.used_adv
    if not os.path.isabs(args.used_ori) and not os.path.isdir(args.used_ori):
        args.used_ori = os.path.join(opt, args.used_ori)
    args.adv_path = os.path.join(
        opt, artifacts.run_dir_name(f"ILAF_{args.model}", "ILAF", args.step,
                                    args.file_prefix))
    return args


def iter_pairs(adv_dir: str, ori_dir: str, batch_size: int):
    """Paired (adv, ori, labels) batches keyed by sample id
    (reference: image_fine_tune_attack.py:16-37)."""
    advs = artifacts.list_adv_files(adv_dir, "adv")
    for chunk in artifacts.batch_files(advs, batch_size):
        adv, labels = artifacts.load_adv_batch(adv_dir, chunk)
        # re-derive the ori name through the protocol helpers (a string
        # .replace would mangle any name with 'adv' elsewhere in it)
        ori_files = [artifacts.adv_filename(artifacts.label_of(f), "ori")
                     for f in chunk]
        ori, _ = artifacts.load_adv_batch(ori_dir, ori_files)
        yield adv, ori, labels


def main(argv=None) -> str:
    args = arg_parse(argv)
    print(args)
    from .common import apply_matmul_precision

    apply_matmul_precision(args)
    advs = artifacts.list_adv_files(args.used_adv, "adv")
    if not advs:
        raise SystemExit(f"no {{id}}-adv.npy under {args.used_adv!r}")
    probe_ori = os.path.join(
        args.used_ori, artifacts.adv_filename(artifacts.label_of(advs[0]),
                                              "ori"))
    if not os.path.exists(probe_ori):
        # fail BEFORE model load/compile: image-guided runs save adv only
        # (image_main.py:90-92), so their dirs have no oris to pair with
        raise SystemExit(
            f"no ori artifact {probe_ori!r} — image-guided runs don't save "
            "oris; point --used_ori at a white-box run dir (attack.py "
            "saves both, reference README workflow)")
    bundle = get_video_model(args.model, tiny=args.tiny,
                             ucf101=args.ucf101 and not args.tiny)
    bundle = bundle.with_taps(tap_keys_for(args.model, "ilaf"))
    attack = attacks.ILAF(bundle, args.model, step_size=args.step_size,
                          steps=args.step)
    for adv, ori, labels in iter_pairs(args.used_adv, args.used_ori,
                                       args.batch_size):
        out = attack(adv, ori, labels, video_names=[str(l) for l in labels])
        artifacts.save_batch(args.adv_path, labels, np.asarray(out))
    artifacts.save_loss_info(args.adv_path, attack.loss_info, 1)
    return args.adv_path


if __name__ == "__main__":
    main()
