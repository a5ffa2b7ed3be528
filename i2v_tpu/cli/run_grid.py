"""Experiment grid driver (reference C29: run_image_guided.py).

Reproduces the papers' tables as in-process config sweeps — each experiment
is a (generate, evaluate) pair over the CLI mains, replacing the reference's
``os.system`` shell loops (run_image_guided.py:42-100). Grids:

  steps_ablation   Fig 4: steps × step_size          (run_image_guided.py:45-52)
  layer_ablation   Table 2 / Fig 5: model × depth    (run_image_guided.py:54-60)
  kinetics_perf    Table 3: DR/I2V per model + ENS   (run_image_guided.py:62-80)
  ucf101_perf      Table 4: UCF-101 equivalents      (run_image_guided.py:82-100)
"""

from __future__ import annotations

import argparse

from . import evaluate, evaluate_ucf101, image_main, image_main_ucf101

# canonical per-model depths (reference: run_image_guided.py:67-70,87-90)
BEST_DEPTH = {"resnet": 2, "squeezenet": 2, "vgg": 3, "alexnet": 3}


# --fused: route every config through the fused generate+evaluate path
# (eval/fused.py) instead of generate → artifact round trip → evaluate
_FUSED = None
# --eval_single_pass: offline evals upload each artifact batch once and run
# every video model on it (eval/transfer.single_pass_eval) — the artifact
# ingress is the two-stage grid's repeated cost, once per model per config
_EVAL_SINGLE_PASS = False


def _gen_and_eval(gen_main, eval_main, gen_args, run_name, extra_eval=()):
    print(f"[grid] {run_name}", flush=True)
    if _FUSED is not None:
        return gen_main(gen_args + ["--fused_eval", _FUSED])
    adv_path = gen_main(gen_args)
    eval_main(["--adv_path", adv_path, *extra_eval])
    return adv_path


def steps_ablation(passthrough):
    # Fig-4 grid points as published (run_image_guided.py:46-47)
    for steps in (20, 40, 60, 80, 100):
        for step_size in (0.001, 0.0025, 0.0050, 0.0075, 0.010):
            _gen_and_eval(
                image_main.main, evaluate.main,
                ["--attack_method", "ImageGuidedFMDirection_Adam",
                 "--direction_image_model", "resnet", "--depth", "2",
                 "--step", str(steps), "--step_size", str(step_size),
                 "--file_prefix", f"ablation_{steps}_{step_size}",
                 *passthrough],
                f"steps_{steps}_{step_size}", _eval_extra(passthrough))


def layer_ablation(passthrough):
    for model in ("resnet", "vgg", "squeezenet", "alexnet"):
        for depth in (1, 2, 3, 4):
            _gen_and_eval(
                image_main.main, evaluate.main,
                ["--attack_method", "ImageGuidedFMDirection_Adam",
                 "--direction_image_model", model, "--depth", str(depth),
                 "--step", "60", "--step_size", "0.005",
                 "--file_prefix", f"layers_{model}_{depth}", *passthrough],
                f"layer_{model}_{depth}", _eval_extra(passthrough))


def kinetics_perf(passthrough):
    for model, depth in BEST_DEPTH.items():
        for method in ("ImageGuidedStd_Adam", "ImageGuidedFMDirection_Adam"):
            _gen_and_eval(
                image_main.main, evaluate.main,
                ["--attack_method", method, "--direction_image_model", model,
                 "--depth", str(depth), "--step", "60", "--step_size", "0.005",
                 "--file_prefix", f"table3_{method}_{model}", *passthrough],
                f"table3_{method}_{model}", _eval_extra(passthrough))
    _gen_and_eval(
        image_main.main, evaluate.main,
        ["--attack_method", "ImageGuidedFML2_Adam_MultiModels", "--step", "60",
         "--file_prefix", "table3_ens", *passthrough],
        "table3_ens", _eval_extra(passthrough))


def ucf101_perf(passthrough):
    for model, depth in BEST_DEPTH.items():
        for method in ("ImageGuidedStd_Adam", "ImageGuidedFMDirection_Adam"):
            _gen_and_eval(
                image_main_ucf101.main, evaluate_ucf101.main,
                ["--attack_method", method, "--direction_image_model", model,
                 "--depth", str(depth), "--step", "60", "--step_size", "0.005",
                 "--file_prefix", f"table4_{method}_{model}", *passthrough],
                f"table4_{method}_{model}", _eval_extra(passthrough))
    _gen_and_eval(
        image_main_ucf101.main, evaluate_ucf101.main,
        ["--attack_method", "ImageGuidedFML2_Adam_MultiModels", "--step", "60",
         "--file_prefix", "table4_ens", *passthrough],
        "table4_ens", _eval_extra(passthrough))


GRIDS = {
    "steps_ablation": steps_ablation,
    "layer_ablation": layer_ablation,
    "kinetics_perf": kinetics_perf,
    "ucf101_perf": ucf101_perf,
}


def _eval_extra(passthrough):
    extra = ["--tiny"] if "--tiny" in passthrough else []
    if _EVAL_SINGLE_PASS:
        extra.append("--single_pass")
    return extra


def main(argv=None):
    p = argparse.ArgumentParser(description="paper-reproduction grid driver")
    p.add_argument("grid", choices=sorted(GRIDS))
    p.add_argument("--limit", type=int, default=None,
                   help="run only the first N grid configs (smoke runs)")
    p.add_argument("--fused", nargs="?", const="all", default=None,
                   metavar="MODELS",
                   help="run each grid config through the fused "
                        "generate+evaluate path (--fused_eval) instead of "
                        "the two-stage artifact round trip; optional "
                        "comma-separated eval-model subset (default all)")
    p.add_argument("--eval_single_pass", action="store_true",
                   help="offline evals read + upload each artifact batch "
                        "once for all six models (evaluate --single_pass); "
                        "no effect under --fused (already single-ingress)")
    args, passthrough = p.parse_known_args(argv)
    global _FUSED, _EVAL_SINGLE_PASS
    _FUSED = args.fused
    _EVAL_SINGLE_PASS = args.eval_single_pass
    if args.limit is not None:
        _install_limit(args.limit)
    else:
        _reset_limit()
    GRIDS[args.grid](passthrough)


_ORIG_GEN_AND_EVAL = _gen_and_eval


def _install_limit(n: int) -> None:
    """Cap the number of (generate, evaluate) pairs executed. Always wraps
    the ORIGINAL function — repeated in-process main() calls must each get a
    fresh budget, not stack exhausted wrappers."""
    global _gen_and_eval
    state = {"left": n}

    def limited(*a, **kw):
        if state["left"] <= 0:
            return None
        state["left"] -= 1
        return _ORIG_GEN_AND_EVAL(*a, **kw)

    _gen_and_eval = limited


def _reset_limit() -> None:
    global _gen_and_eval
    _gen_and_eval = _ORIG_GEN_AND_EVAL


if __name__ == "__main__":
    main()
