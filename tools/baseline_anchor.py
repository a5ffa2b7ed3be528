"""Measure the baseline anchor: same-host torch ENS-I2V step vs JAX ENS step.

The bench's ``vs_baseline`` divides by an RTX 2080Ti throughput estimate for
the reference's 4-surrogate ENS-I2V step (bench.py docstring). The reference
repo records no absolute numbers (SURVEY.md §6), so the estimate rests on
FLOP accounting; this tool cross-checks that accounting with a controlled
measurement: the SAME machine, the SAME CPU backend class, running

  (a) a faithful torch re-statement of the reference's ENS step
      (image_attacks.py:366-496: 4 torchvision surrogates, hook-captured
      taps, per-frame cosine loss, Adam on the modifier), and
  (b) this repo's jitted JAX ENS attack (attacks/i2v.py),

at an identical small config (random weights — throughput is weight-
independent). If the JAX/torch ratio measured on CPU is consistent with the
FLOP model, the 2080Ti anchor derivation in BASELINE.md holds. Writes
BASELINE_ANCHOR.json at the repo root.

Run on CPU explicitly (the conftest trick): this file forces the cpu
platform BEFORE jax initializes, so it works under the axon sitecustomize.
"""

import json
import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# paths only imports os — safe before any backend init (ADVICE r3)
from i2v_tpu.utils.paths import compile_cache_dir  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
jax.config.update("jax_compilation_cache_dir", compile_cache_dir())

import numpy as np  # noqa: E402

EPS = 16 / 255
STEP_SIZE = 0.005
# reference ENS tap depths (image_main.py:72-80) → torchvision modules
# (image_attacks.py:260-271)
ENS_NAMES = ["resnet", "vgg", "squeezenet", "alexnet"]
ENS_DEPTHS = {"resnet": 2, "vgg": 3, "squeezenet": 2, "alexnet": 3}


def _torch_models_and_taps():
    # torchvision is not installed here; tools/torch_surrogates.py restates
    # the four architectures with torchvision-identical structure
    from tools import torch_surrogates as tvm

    mdls = {
        "resnet": tvm.resnet101(),
        "vgg": tvm.vgg16(),
        "squeezenet": tvm.squeezenet1_1(),
        "alexnet": tvm.alexnet(),
    }
    taps = {
        "resnet": lambda m: m.layer2[-1],
        "vgg": lambda m: m.features[20],
        "squeezenet": lambda m: m.features[6].expand3x3_activation,
        "alexnet": lambda m: m.features[7],
    }
    for m in mdls.values():
        m.eval()
        for p in m.parameters():
            p.requires_grad_(False)
    return mdls, {k: taps[k](mdls[k]) for k in ENS_NAMES}


def time_torch_ens(frames: int, hw: int, steps: int, warmup: int = 1):
    """Reference ENS step re-stated in torch (image_attacks.py:405-480)."""
    import torch
    import torch.nn.functional as F

    mdls, tap_modules = _torch_models_and_taps()
    acts: list = []
    for name in ENS_NAMES:
        tap_modules[name].register_forward_hook(
            lambda m, i, o: acts.append(o))

    x = torch.rand(frames, 3, hw, hw)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    unnorm = (x * std + mean).detach()
    modifier = torch.nn.Parameter(torch.full_like(x, 0.01 / 255))
    opt = torch.optim.Adam([modifier], lr=STEP_SIZE)

    acts.clear()
    with torch.no_grad():
        for name in ENS_NAMES:
            mdls[name](x)
    init_feats = [a.detach().reshape(frames, -1) for a in acts]

    def step():
        acts.clear()
        true_image = torch.clamp(
            unnorm + torch.clamp(modifier, -EPS, EPS), 0, 1)
        xn = (true_image - mean) / std
        for name in ENS_NAMES:
            mdls[name](xn)
        cost = sum(
            torch.sum(F.cosine_similarity(a.reshape(frames, -1), init))
            for a, init in zip(acts, init_feats))
        opt.zero_grad()
        cost.backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.time()
    for _ in range(steps):
        step()
    return (time.time() - t0) / steps


def _torch_aens_models_and_taps():
    """The TPAMI 8-tap config (TPAMI_attack.py:146 / cli/common.py:229):
    depths [2,3] per surrogate. Tap modules per the reference's list branch
    of _find_target_layer (TPAMI_attack.py:176-200) — note the squeezenet
    list branch hooks the WHOLE Fire module, unlike the scalar branch's
    expand3x3_activation."""
    from tools import torch_surrogates as tvm

    mdls = {
        "resnet": tvm.resnet101(),
        "vgg": tvm.vgg16(),
        "squeezenet": tvm.squeezenet1_1(),
        "alexnet": tvm.alexnet(),
    }
    taps = {
        "resnet": lambda m: [m.layer2[-1], m.layer3[-1]],
        "vgg": lambda m: [m.features[11], m.features[20]],
        "squeezenet": lambda m: [m.features[6], m.features[9]],
        "alexnet": lambda m: [m.features[4], m.features[7]],
    }
    for m in mdls.values():
        m.eval()
        for p in m.parameters():
            p.requires_grad_(False)
    return mdls, {k: taps[k](mdls[k]) for k in ENS_NAMES}


def time_torch_aens(frames: int, hw: int, steps: int, warmup: int = 1):
    """Reference AENS-I2V-MF step re-stated in torch (TPAMI_attack.py:
    225-313): 8 hook-captured taps, per-tap per-frame cosine vs frozen clean
    taps, adaptive double-softmax coefficients (momentum=0, coef_CE=False),
    Adam on the modifier. Measures the SAME work shape as the reference's
    flagship step so the AENS/ENS step-time ratio is a measurement, not a
    tap-count guess (VERDICT r2 weak #3)."""
    import torch
    import torch.nn.functional as F

    mdls, tap_modules = _torch_aens_models_and_taps()
    acts: list = []
    for name in ENS_NAMES:
        for mod in tap_modules[name]:
            mod.register_forward_hook(lambda m, i, o: acts.append(o))

    x = torch.rand(frames, 3, hw, hw)
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    unnorm = (x * std + mean).detach()
    modifier = torch.nn.Parameter(torch.full_like(x, 0.01 / 255))
    opt = torch.optim.Adam([modifier], lr=STEP_SIZE)

    acts.clear()
    with torch.no_grad():
        for name in ENS_NAMES:
            mdls[name](x)
    init_feats = [a.detach().reshape(frames, -1) for a in acts]
    n_taps = len(init_feats)
    coeffs = torch.ones(n_taps)
    prev_loss = torch.ones(n_taps)

    def step():
        nonlocal coeffs, prev_loss
        # adaptive coefficient update (TPAMI_attack.py:264): momentum=0
        coeffs = torch.softmax(torch.softmax(prev_loss, dim=0), dim=0)
        acts.clear()
        true_image = torch.clamp(
            unnorm + torch.clamp(modifier, -EPS, EPS), 0, 1)
        xn = (true_image - mean) / std
        for name in ENS_NAMES:
            mdls[name](xn)
        cos = torch.stack([
            F.cosine_similarity(a.reshape(frames, -1), init)
            for a, init in zip(acts, init_feats)])  # (8, frames)
        each = torch.sum(coeffs.unsqueeze(1) * cos, dim=1)  # (8,)
        cost = torch.mean(each)
        # coef_CE=False branch: unweighted per-tap frame sums drive coeffs
        prev_loss = torch.sum(cos.detach(), dim=1)
        opt.zero_grad()
        cost.backward()
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.time()
    for _ in range(steps):
        step()
    return (time.time() - t0) / steps


def aens_main(frames: int, hw: int, steps: int):
    """Measure the torch AENS/ENS step-time ratio on this host and merge it
    into BASELINE_ANCHOR.json; bench.py divides the measured 2080Ti ENS
    anchor by this ratio for the AENS vs_baseline."""
    print(f"config: {frames} frames @ {hw}x{hw}, {steps} timed steps "
          f"(torch ENS vs torch 8-tap AENS, CPU)", flush=True)
    t_ens = time_torch_ens(frames, hw, steps)
    print(f"torch ENS  step: {t_ens:.2f} s/step", flush=True)
    t_aens = time_torch_aens(frames, hw, steps)
    print(f"torch AENS step: {t_aens:.2f} s/step", flush=True)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "BASELINE_ANCHOR.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    data["aens"] = {
        "config": {"frames": frames, "hw": hw, "steps": steps,
                   "taps_per_model": 2, "backend": "cpu, same host"},
        "torch_ens_step_s": round(t_ens, 3),
        "torch_aens_step_s": round(t_aens, 3),
        "torch_aens_over_ens_step_ratio": round(t_aens / t_ens, 3),
        "note": "measured same-host torch AENS/ENS step ratio; replaces the "
                "round-2 guessed ÷2 tap-ratio scaling in bench.py's AENS "
                "anchor (VERDICT r2 weak #3)",
    }
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    print(json.dumps(data["aens"]))


def time_jax_ens(frames: int, hw: int, steps: int):
    from i2v_tpu.attacks.i2v import ImageGuidedFML2_Adam_MultiModels
    from i2v_tpu.models import get_image_models
    from i2v_tpu.ops import pixel

    import jax.numpy as jnp
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # random-init warning is the point
        models = get_image_models(ENS_NAMES, ENS_DEPTHS, input_hw=hw)
    # frames = B*T; use T=frames, B=1 (the attack flattens anyway)
    clips01 = jnp.asarray(
        np.random.RandomState(0).rand(1, 3, frames, hw, hw).astype(np.float32))
    videos = pixel.normalize(clips01, channel_axis=1)

    # timed-region parity with the torch loop: one attack call runs `steps`
    # scan iterations; warm up (compile) with an identical call first
    atk = ImageGuidedFML2_Adam_MultiModels([*models], steps=steps)
    atk.step_size = STEP_SIZE
    atk(videos, jnp.asarray([0]), video_names=["w"])  # compile+warm
    t0 = time.time()
    atk(videos, jnp.asarray([0]), video_names=["w"])
    costs = atk.loss_info["w"]  # host sync happened in _record_costs
    del costs
    return (time.time() - t0) / steps


def main():
    args = list(sys.argv[1:])
    aens = bool(args) and args[0] == "aens"
    if aens:
        args = args[1:]
    frames = int(args[0]) if len(args) > 0 else 32
    hw = int(args[1]) if len(args) > 1 else 224
    steps = int(args[2]) if len(args) > 2 else 3
    if aens:
        return aens_main(frames, hw, steps)

    print(f"config: {frames} frames @ {hw}x{hw}, {steps} timed steps "
          f"(full-size 4-surrogate ENS, CPU)", flush=True)
    t_torch = time_torch_ens(frames, hw, steps)
    print(f"torch ENS step: {t_torch:.2f} s/step "
          f"({1/t_torch:.4f} steps/s)", flush=True)
    t_jax = time_jax_ens(frames, hw, steps)
    print(f"jax   ENS step: {t_jax:.2f} s/step ({1/t_jax:.4f} steps/s)",
          flush=True)
    out = {
        "config": {"frames": frames, "hw": hw, "steps": steps,
                   "surrogates": ENS_DEPTHS, "backend": "cpu, same host"},
        "torch_step_s": round(t_torch, 3),
        "jax_step_s": round(t_jax, 3),
        "jax_over_torch_speedup": round(t_torch / t_jax, 3),
        "note": "same-host CPU cross-check of the FLOP accounting behind "
                "the 2080Ti ENS anchor (bench.py vs_baseline); see "
                "BASELINE.md 'Anchor derivation'",
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "BASELINE_ANCHOR.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
