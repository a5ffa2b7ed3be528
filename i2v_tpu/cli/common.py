"""Shared CLI plumbing: dataset construction, model construction, dispatch.

Replaces the reference's seven overlapping argparse scripts' shared idioms
(cfg→data→model→attack loop→artifacts; SURVEY.md §1 L4). ``--data synthetic``
gives a dataset-free smoke path; ``--tiny`` swaps width-reduced backbones so
every CLI runs end-to-end without checkpoints.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..utils.paths import compile_cache_dir

# persistent compile cache: repeat CLI invocations (grid sweeps!) reuse
# compiled attack graphs
jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from .. import attacks
from ..data import kinetics as kinetics_mod
from ..data import transforms as transforms_mod
from ..data import synthetic as synthetic_mod
from ..data import ucf101 as ucf101_mod
from ..ops import pixel
from ..models import get_image_models
from ..utils import artifacts, get_paths

IMAGE_GUIDED_METHODS = (
    "ImageGuidedStd_Adam",
    "ImageGuidedFMDirection_Adam",
    "ImageGuidedFML2_Adam_MultiModels",
    "AENS_I2V_MF",
)
WHITEBOX_METHODS = (
    "FGSM", "BIM", "MIFGSM", "DIFGSM", "TIFGSM", "TIFGSM3D", "SGM", "SIM",
    "TAP", "TemporalTranslation",
)


def add_data_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data", default="synthetic",
                   choices=["kinetics", "ucf101", "synthetic"],
                   help="data source (synthetic = dataset-free smoke path)")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--n_synthetic", type=int, default=4)
    # None = derive: 32/224 normally, 8/32 under --tiny with synthetic data.
    # An explicit value always wins (previously --tiny silently overrode it).
    p.add_argument("--clip_len", type=int, default=None,
                   help="frames per clip (default 32; 8 for --tiny synthetic)")
    p.add_argument("--crop_size", type=int, default=None,
                   help="spatial size (default 224; 32 for --tiny synthetic)")
    p.add_argument("--tiny", action="store_true",
                   help="width-reduced backbones (checkpoint-free runs)")
    p.add_argument("--u8_ingress", action="store_true",
                   help="ship decoded uint8 frames to the device and "
                        "normalize there (4x less host->device traffic; "
                        "bit-identical numerics)")
    p.add_argument("--prefetch", type=int, default=0, metavar="DEPTH",
                   help="decode + upload the next DEPTH batches in a "
                        "background thread while the current batch attacks "
                        "(data/pipeline.py); hides decode and host->device "
                        "ingest behind attack compute. Each prefetched "
                        "batch pins HBM (B=16 f32 is ~308 MB; 77 MB with "
                        "--u8_ingress), so keep DEPTH small")
    p.add_argument("--matmul_precision", default=None,
                   choices=["default", "high", "float32"],
                   help="MXU precision for f32 dots/convs. Unset/'default' "
                        "keeps the TPU's native f32 matmul mode (what the "
                        "bench f32 rows run; fidelity vs true f32 measured "
                        "in PERF_PROBE.json fidelity_ens8_f32default_vs_"
                        "highest). 'float32' forces bit-faithful f32 MXU "
                        "passes — the numerics every torch-parity test "
                        "runs in — at a measured throughput cost (exec_"
                        "ens16_f32hp_chunk128); 'high' is the 3-pass bf16 "
                        "middle tier. No effect on bf16 params")


def data_shape(args) -> tuple[int, int]:
    """Effective (clip_len, crop_size): explicit flags win; --tiny shrinks
    only the derived synthetic defaults."""
    tiny_synth = args.tiny and getattr(args, "data", None) == "synthetic"
    clip_len = args.clip_len if args.clip_len is not None else \
        (8 if tiny_synth else 32)
    crop = args.crop_size if args.crop_size is not None else \
        (32 if tiny_synth else 224)
    return clip_len, crop


def build_dataset(args):
    """→ (dataset, iterate_batches) for the chosen source."""
    paths = get_paths()
    clip_len, crop = data_shape(args)
    u8 = getattr(args, "u8_ingress", False)
    if args.data == "kinetics":
        ds = kinetics_mod.KineticsAttackDataset(
            paths.kinetics_anno, paths.kinetics_data,
            clip_len=clip_len, crop_size=crop, raw_uint8=u8)
        return ds, kinetics_mod.iterate_batches
    if args.data == "ucf101":
        used = ucf101_mod.load_used_idxs(paths.ucf_used_idxs) \
            if os.path.exists(paths.ucf_used_idxs) else None
        ds = ucf101_mod.UCF101AttackDataset(
            paths.ucf_setting, paths.ucf_image_root, used_idxs=used,
            clip_len=clip_len, crop_size=crop, raw_uint8=u8)
        return ds, ucf101_mod.iterate_batches
    ds = synthetic_mod.SyntheticAttackDataset(
        n_samples=args.n_synthetic, clip_len=clip_len, size=crop,
        raw_uint8=u8)
    return ds, synthetic_mod.iterate_batches


def batch_iterator(args, dataset, iterate, left: int = 0, right=None,
                   keep_host: bool = False):
    """The CLI batch stream: synchronous by default; with ``--prefetch N``
    a decode thread + early device_put run N batches ahead of the attack
    (data/pipeline.make_input_pipeline). ``keep_host`` retains the host
    clip array under ``clips_host`` for ori-saving consumers."""
    depth = getattr(args, "prefetch", 0) or 0
    if depth <= 0:
        return iterate(dataset, args.batch_size, left, right)
    from ..data.pipeline import make_input_pipeline

    sharding = None
    if getattr(args, "sharded", False):
        # land prefetched batches directly in the attack mesh's clip layout:
        # without this every batch is device_put whole onto device 0 and
        # re-distributed by the runner (an extra full-batch copy + a chip-0
        # HBM hotspot in multi-chip runs)
        from ..parallel import attack_mesh
        from ..parallel.mesh import clip_sharding

        sharding = clip_sharding(attack_mesh())
    return make_input_pipeline(dataset, args.batch_size, iterate, left=left,
                               right=right, prefetch_depth=depth,
                               keep_host=keep_host, sharding=sharding)


def apply_matmul_precision(args) -> None:
    """Apply --matmul_precision before anything traces. jax reads the
    default matmul precision at trace time, so a config update here (after
    backend init, unlike jax_platforms) governs every runner the CLI builds.
    Idempotent; unset leaves whatever the host/conftest configured."""
    prec = getattr(args, "matmul_precision", None)
    if prec:
        jax.config.update("jax_default_matmul_precision", prec)


def build_whitebox_attack(args, bundle):
    """Dispatch a white-box method name → attack instance (the reference's
    getattr dispatch, attack.py:76-83)."""
    apply_matmul_precision(args)
    name = args.attack_method
    if name == "TemporalTranslation":
        params = {
            "kernlen": args.kernlen,
            "momentum": bool(args.momentum),
            "weight": args.augmentation_weight,
            "move_type": args.move_type,
            "kernel_mode": args.kernel_mode,
            "chunk": getattr(args, "tt_chunk", 5),
        }
        atk = attacks.TemporalTranslation(bundle, params, steps=args.step)
    elif name == "TAP":
        params = {"kernlen": 3, "temporal_kernlen": 3, "eta": 1e3, "conv3d": True}
        atk = attacks.TAP(bundle, params, steps=args.step)
    elif name == "SIM" and getattr(args, "sim_batch_scales", False):
        atk = attacks.SIM(bundle, steps=args.step, batch_scales=True)
    else:
        cls = getattr(attacks, name)
        atk = cls(bundle, steps=args.step)
    chunk = getattr(args, "batch_chunk", None)
    if chunk:
        if hasattr(atk, "cfg"):
            import dataclasses

            atk.cfg = dataclasses.replace(atk.cfg, batch_chunk=chunk)
        else:
            # TAP/TT build their configs internally — a silently dropped
            # memory-fitting flag would OOM the chip the user chunked for
            print(f"[warn] --batch_chunk {chunk} is not supported by "
                  f"{name} and was ignored", flush=True)
    return atk


def build_image_guided_attack(args):
    """Dispatch an image-guided method (reference: image_main.py:66-80),
    incl. the AENS CLI the reference only defines but never wires.
    ``--sharded`` routes the cosine-objective methods through the
    pjit-sharded production runner instead of the attack class."""
    apply_matmul_precision(args)
    method = args.attack_method
    tiny = args.tiny
    hw = 32 if tiny else data_shape(args)[1]
    sharded = getattr(args, "sharded", False)
    model_parallel = getattr(args, "model_parallel", None)
    if model_parallel and method not in ("ImageGuidedFML2_Adam_MultiModels",
                                         "AENS_I2V_MF"):
        raise SystemExit("--model_parallel splits the surrogate ensemble; "
                         "it only applies to the ensemble methods (ENS/AENS)")
    if model_parallel and sharded:
        raise SystemExit("--model_parallel and --sharded are alternative "
                         "parallelizations of the ensemble step; pick one")
    multigrid = getattr(args, "multigrid", 0) or 0
    if multigrid and not (sharded or model_parallel):
        raise SystemExit("--multigrid runs through the sharded or "
                         "model-parallel runners; add --sharded or "
                         "--model_parallel N")
    if multigrid and method == "AENS_I2V_MF":
        raise SystemExit("--multigrid does not compose with AENS's adaptive "
                         "coefficients (resolution-coupled signal)")
    if multigrid and method == "ImageGuidedStd_Adam":
        raise SystemExit("--multigrid supports the cosine-objective methods "
                         "(I2V/ENS), not DR")
    if multigrid and multigrid >= args.step:
        raise SystemExit(f"--multigrid {multigrid} must be smaller than "
                         f"--step {args.step} (some steps must remain for "
                         "the full-resolution phase)")
    mg_scale = getattr(args, "multigrid_scale", 2)
    if multigrid and (mg_scale < 2 or hw % mg_scale):
        raise SystemExit(f"--multigrid_scale {mg_scale} must be >= 2 and "
                         f"divide the spatial size ({hw})")

    def _sharded(models, *, step_size, adaptive=False, momentum=0.0,
                 coef_ce=False):
        import jax.numpy as jnp

        from ..parallel import attack_mesh
        from ..parallel.sharded import ShardedImageGuidedAttack

        return ShardedImageGuidedAttack(
            models, attack_mesh(), steps=args.step, step_size=step_size,
            adaptive=adaptive, aens_momentum=momentum, coef_ce=coef_ce,
            name=method,
            frame_chunk=getattr(args, "frame_chunk", None),
            param_dtype=jnp.bfloat16
            if getattr(args, "param_dtype", None) == "bfloat16" else None,
            multigrid=getattr(args, "multigrid", 0) or 0,
            multigrid_scale=getattr(args, "multigrid_scale", 2))

    if method in ("ImageGuidedStd_Adam", "ImageGuidedFMDirection_Adam"):
        models = get_image_models([args.direction_image_model],
                                  args.depth, tiny=tiny, input_hw=hw)
        if sharded and method == "ImageGuidedFMDirection_Adam":
            return _sharded(models, step_size=args.step_size)
        if sharded:
            raise SystemExit("--sharded supports the cosine-objective "
                             "methods (I2V/ENS/AENS), not DR")
        cls = getattr(attacks, method)
        return cls(models, step_size=args.step_size, steps=args.step)
    if method == "ImageGuidedFML2_Adam_MultiModels":
        names = ["resnet", "vgg", "squeezenet", "alexnet"]
        depths = {"resnet": 2, "vgg": 3, "squeezenet": 2, "alexnet": 3}
        models = get_image_models(names, depths, tiny=tiny, input_hw=hw)
        if model_parallel:
            from ..parallel.ensemble import (EnsembleParallelAttack,
                                             ensemble_mesh)

            return EnsembleParallelAttack(
                models, ensemble_mesh(model=model_parallel),
                steps=args.step, step_size=0.005, name=method,
                frame_chunk=getattr(args, "frame_chunk", None),
                multigrid=multigrid, multigrid_scale=mg_scale)
        if sharded:
            return _sharded(models, step_size=0.005)
        return attacks.ImageGuidedFML2_Adam_MultiModels(models, steps=args.step)
    if method == "AENS_I2V_MF":
        names = ["resnet", "vgg", "squeezenet", "alexnet"]
        depths = {n: [2, 3] for n in names}
        models = get_image_models(names, depths, tiny=tiny, input_hw=hw)
        if model_parallel:
            from ..parallel.ensemble import (EnsembleParallelAttack,
                                             ensemble_mesh)

            return EnsembleParallelAttack(
                models, ensemble_mesh(model=model_parallel),
                steps=args.step, step_size=args.step_size, adaptive=True,
                aens_momentum=args.aens_momentum, coef_ce=args.coef_CE,
                name=method,
                frame_chunk=getattr(args, "frame_chunk", None))
        if sharded:
            return _sharded(models, step_size=args.step_size, adaptive=True,
                            momentum=args.aens_momentum,
                            coef_ce=args.coef_CE)
        return attacks.AENS_I2V_MF(models, step_size=args.step_size,
                                   momentum=args.aens_momentum,
                                   coef_CE=args.coef_CE, steps=args.step)
    raise ValueError(f"unknown image-guided method {method!r}")


def shard_bounds(args, n_samples: int) -> tuple[int, int]:
    """The reference's 1-based --batch_nums/--batch_index contract
    (image_main.py:61-63), upgraded for multi-host: when launched under
    jax.distributed (JAX_COORDINATOR_ADDRESS set) and the CLI flags are at
    their defaults, each process takes its jax.process_index() slice of the
    sample set automatically — the DCN replacement for running N manually
    indexed copies of the script."""
    from ..parallel.dist import maybe_initialize_distributed, process_shard_bounds

    if (maybe_initialize_distributed() and args.batch_nums == 1
            and jax.process_count() > 1):
        return process_shard_bounds(n_samples)
    try:
        return process_shard_bounds(n_samples, args.batch_nums,
                                    args.batch_index - 1)
    except ValueError as e:
        raise SystemExit(f"--batch_index/--batch_nums: {e}")


def effective_file_prefix(args) -> str:
    """Run-dir prefix with the synthetic smoke source marked: a
    ``--data synthetic`` run must not share an artifact dir (and be
    silently skip-if-exists-resumed into) with a real kinetics/ucf101 run
    of the same config."""
    prefix = getattr(args, "file_prefix", "") or ""
    if getattr(args, "data", None) == "synthetic" and "synthetic" not in prefix:
        prefix = f"synthetic{'-' + prefix if prefix else ''}"
    return prefix


class _ResumeSubsetView:
    """Dataset view over the not-yet-attacked manifest indices."""

    def __init__(self, inner, idxs):
        self._inner = inner
        self._idxs = list(idxs)
        if not hasattr(inner, "load_batch"):
            self.load_batch = None  # falsy: iterate_batches item fallback

    def __len__(self):
        return len(self._idxs)

    def __getitem__(self, i):
        return self._inner[self._idxs[i]]

    def load_batch(self, idxs):
        return self._inner.load_batch([self._idxs[i] for i in idxs])


def resume_subset(dataset, done: set):
    """Index-level skip-if-exists: drop manifest entries whose label already
    has artifacts BEFORE decode (the in-loop batch skip still decodes —
    resuming a mostly-complete run would re-decode every finished video).
    Returns None when nothing can be (or needs to be) dropped — datasets
    without cheap label metadata fall back to the in-loop skip."""
    samples = getattr(dataset, "samples", None)
    if not done or not samples or not hasattr(samples[0], "label"):
        return None
    keep = [i for i, s in enumerate(samples) if int(s.label) not in done]
    return None if len(keep) == len(samples) else _ResumeSubsetView(dataset, keep)


def loss_shard_index(args) -> int:
    """``loss_info_{N}.json`` shard id: the CLI's --batch_index, or the
    process index under a distributed launch so each host writes a disjoint
    log (the reference's per-shard loss_info files, image_main.py:94)."""
    if getattr(args, "batch_nums", 1) == 1 and jax.process_count() > 1:
        return jax.process_index() + 1
    return args.batch_index


def save_attack_outputs(run_dir, batch, adv, save_ori: bool = False,
                        dtype=np.float32):
    adv = np.asarray(adv)
    ori = None
    if save_ori:
        # --prefetch batches keep the original host array under clips_host;
        # using it avoids pulling the clips back over the device→host link
        ori = np.asarray(batch.get("clips_host", batch["clips"]))
        if pixel.is_u8_clips(ori):
            # u8-ingress batches carry raw (B,T,H,W,3) frames; the ori
            # artifact protocol stays normalized f32 (B,3,T,H,W)
            ori = np.stack([transforms_mod.u8_clip_to_normalized(c)
                            for c in ori])
    artifacts.save_batch(run_dir, batch["labels"], adv,
                         ori_batch=ori, dtype=dtype)
