"""Transfer evaluation: run adversarial artifacts through the video-model zoo
and emit reference-compatible reports (reference C27/C28: reference.py,
reference_ucf101.py).

Outputs, byte-compatible schemas:
  - ``results_all_models_prediction.csv``: ``gt_label`` + one ``{model}-pre``
    column per model, row-indexed by label (reference: reference.py:106-127)
  - ``top1_acc_all_models.json``: per-model top-1 accuracy
    (attack success rate = 100 − top-1)

TPU design: each model's eval loop is ONE jitted forward per batch with
device-side top-1; with dp eval the batch shards over the LOCAL-device data
mesh and XLA inserts the accuracy reduction (multi-host runs dp-eval their
own artifact shard per process — the loop's host-numpy in / np.asarray out
contract is host-local by design).
Models are loaded serially and dropped after use (the reference's
del-model/empty_cache swap, reference.py:124-125, becomes letting the bundle
go out of scope — XLA frees device buffers on GC).
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.video_zoo import VIDEO_BUILDERS, get_video_model
from ..utils import AverageMeter, artifacts


def accuracy_and_preds(logits, labels):
    """Top-1 accuracy (%) + predictions (reference: reference.py:28-36)."""
    preds = jnp.argmax(logits, axis=-1)
    acc = 100.0 * jnp.mean((preds == labels).astype(jnp.float32))
    return acc, preds


def order_predictions_by_label(labels, preds, n_classes: int) -> np.ndarray:
    """Reorder predictions into label order for the report CSV (reference:
    reference.py:116-119; the label doubles as the sample id).

    A malformed artifact directory must fail loudly, not degrade into a
    quietly wrong CSV: an out-of-range label (file from a different dataset)
    or a duplicate label (two artifacts claiming one sample id) raises.
    Labels genuinely absent from the run (partial/sharded generation) stay
    ``-1``.
    """
    ordered = np.zeros(n_classes, dtype=np.int64) - 1
    seen: set[int] = set()
    for lab, pred in zip(labels, preds):
        lab = int(lab)
        if not 0 <= lab < n_classes:
            raise ValueError(
                f"artifact label {lab} outside [0, {n_classes}) — the run "
                "directory mixes artifacts from a different dataset")
        if lab in seen:
            raise ValueError(
                f"duplicate artifact label {lab} — two artifacts claim the "
                "same sample id; the run directory is malformed")
        seen.add(lab)
        ordered[lab] = pred
    return ordered


def _make_uploader(mesh):
    """Host batch → device, sharded over the mesh when divisible.
    Labels stay host-side (the eval loops extend python lists from them —
    iterating a device array would fetch element-wise over the relay)."""
    n_shards = mesh.size if mesh is not None else 1
    warned_fallback = []

    def _upload(clips, labels):
        if mesh is not None and clips.shape[0] % n_shards == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            spec = P(tuple(mesh.axis_names))  # batch over every mesh axis
            return (jax.device_put(clips, NamedSharding(mesh, spec)),
                    jax.device_put(labels, NamedSharding(mesh, spec)))
        if mesh is not None and not warned_fallback:
            warned_fallback.append(True)
            import warnings

            warnings.warn(
                f"dp eval: batch of {clips.shape[0]} does not divide the "
                f"{n_shards}-device mesh; running this batch on a single "
                "device (pick a batch_size divisible by the device count "
                "to keep eval data-parallel)")
        return jax.device_put(clips), jnp.asarray(labels)

    return _upload


def _prefetched_uploads(files_batches: Sequence[Sequence[str]], run_dir: str,
                        mesh):
    """Iterator of (dev_clips, dev_labels, host_labels) with disk IO AND the
    host→device upload overlapping device compute: the upload starts in the
    loader thread as soon as a batch is read (the H2D link — ~10 MB/s on
    relay-backed hosts — otherwise serializes with the forward). device_put
    is itself async, so yielding right after issuing it already overlaps the
    transfer with the consumer's compute; no extra holding stage. depth=1
    caps device-resident batches at ~3 (consumed + queued + the worker's
    in-hand one) — eval batches are ~308 MB at B=16 f32, so each extra
    in-flight batch is real HBM on a 16 GB chip."""
    from ..data.pipeline import threaded_prefetch

    _upload = _make_uploader(mesh)

    def uploaded():
        for b in files_batches:
            clips, labels = artifacts.load_adv_batch(run_dir, b)
            dev_clips, dev_labels = _upload(clips, labels)
            yield dev_clips, dev_labels, labels

    return threaded_prefetch(uploaded, depth=1)


def reference_eval(bundle, files_batches: Sequence[Sequence[str]], run_dir: str,
                   *, mesh=None, log=print):
    """Evaluate one model over artifact batches → (preds, labels, top1_avg).

    Artifacts are normalized-domain clips (the protocol); the bundle's
    apply_norm consumes them directly. With ``mesh``, batches are sharded
    over the mesh's devices on the clip axis (dp eval): XLA propagates the
    sharding through the forward and inserts the accuracy psum; a batch that
    doesn't divide the device count falls back to single-device execution
    (warned once — if EVERY batch is indivisible, dp eval would otherwise
    silently degrade to 1/N throughput).
    """
    data_time, batch_time, top1 = AverageMeter(), AverageMeter(), AverageMeter()
    predictions: list[int] = []
    labels_all: list[int] = []

    from ..models.api import rebind_params

    def _fwd(params, clips, labels):
        return accuracy_and_preds(rebind_params(bundle, params).apply_norm(clips),
                                  labels)

    fwd_jit = jax.jit(_fwd)
    loaded = _prefetched_uploads(files_batches, run_dir, mesh)

    end = time.time()
    for step, (clips, jlabels, labels) in enumerate(loaded):
        data_time.update(time.time() - end)
        acc, preds = fwd_jit(bundle.params, clips, jlabels)
        preds = np.asarray(preds)
        predictions += list(preds)
        labels_all += list(labels)
        top1.update(float(acc), len(labels))
        batch_time.update(time.time() - end)
        end = time.time()
        if step % 5 == 0:
            log("----validation----")
            log(f"Process: [{step + 1}/{len(files_batches)}]")
            log(f"data_time: {data_time.val:.3f}, batch time: {batch_time.val:.3f}")
            log(f"top-1 accuracy: {top1.avg:.2f}%")
    return predictions, labels_all, top1.avg


def single_pass_eval(bundles: dict, files_batches: Sequence[Sequence[str]],
                     run_dir: str, *, mesh=None, log=print):
    """Evaluate EVERY model over each uploaded batch → ({model: preds},
    labels, {model: top1_avg}).

    The reference's eval (reference.py:108-125) loads the six video models
    serially, re-reading and re-uploading every artifact for each — 6× the
    ingress. On a relay-backed host (~10 MB/s host→device) that upload, not
    the forwards, is the eval bottleneck, so this mode keeps all requested
    models resident in HBM (~1.5 GB f32 for all six — far below chip
    capacity) and runs each batch through all of them after a single
    upload. All forwards are dispatched before any result is fetched, so
    the device queues the programs back-to-back while only tiny (acc,
    preds) outputs cross the relay. Reports are identical to the serial
    path's (same jitted per-model forward, same inputs).
    """
    from ..models.api import rebind_params

    data_time, batch_time = AverageMeter(), AverageMeter()
    top1 = {name: AverageMeter() for name in bundles}
    predictions: dict = {name: [] for name in bundles}
    labels_all: list[int] = []

    fwd_jit = {}
    for name, bundle in bundles.items():
        def _fwd(params, clips, labels, _b=bundle):
            return accuracy_and_preds(
                rebind_params(_b, params).apply_norm(clips), labels)

        fwd_jit[name] = jax.jit(_fwd)

    loaded = _prefetched_uploads(files_batches, run_dir, mesh)
    end = time.time()
    for step, (clips, jlabels, labels) in enumerate(loaded):
        data_time.update(time.time() - end)
        pending = {name: fwd_jit[name](bundles[name].params, clips, jlabels)
                   for name in bundles}
        labels_all += list(labels)
        for name, (acc, preds) in pending.items():
            predictions[name] += list(np.asarray(preds))
            top1[name].update(float(acc), len(labels))
        batch_time.update(time.time() - end)
        end = time.time()
        if step % 5 == 0:
            log("----validation (single pass, all models)----")
            log(f"Process: [{step + 1}/{len(files_batches)}]")
            log(f"data_time: {data_time.val:.3f}, batch time: {batch_time.val:.3f}")
            for name in bundles:
                log(f"top-1 accuracy [{name}]: {top1[name].avg:.2f}%")
    return predictions, labels_all, {n: m.avg for n, m in top1.items()}


def evaluate_run(
    run_dir: str,
    *,
    model_names: Optional[Sequence[str]] = None,
    batch_size: int = 16,
    n_classes: int = 400,
    ucf101: bool = False,
    tiny: bool = False,
    dtype=jnp.float32,
    get_bundle: Optional[Callable] = None,
    mesh=None,
    data_parallel: bool = False,
    single_pass: bool = False,
    log=print,
) -> dict:
    """Evaluate a run directory against the six video models and write the
    reference-compatible CSV + JSON reports. Returns {model: top1}.

    ``single_pass=True`` keeps all models resident and evaluates each
    uploaded batch through every model (one artifact read + upload total
    instead of one per model — the win on slow host→device links); default
    stays the reference's serial model swap (reference.py:108-125)."""
    import pandas as pd

    if data_parallel and mesh is None:
        from ..parallel import attack_mesh

        # LOCAL devices only: the eval loop feeds host numpy and fetches
        # per-batch predictions with np.asarray — on a multi-host pod a
        # global mesh would make those host-local transfers illegal
        # (non-addressable shards). Each process dp-evals its own artifact
        # shard over its own chips instead.
        mesh = attack_mesh(devices=jax.local_devices())
    files = artifacts.list_adv_files(run_dir)
    if not files:
        raise FileNotFoundError(f"no adv artifacts under {run_dir!r}")
    batches = artifacts.batch_files(files, batch_size)
    if model_names is None:
        model_names = list(VIDEO_BUILDERS)

    def _build(name):
        if get_bundle is not None:
            return get_bundle(name)
        return get_video_model(name, ucf101=ucf101, tiny=tiny, dtype=dtype)

    model_val_acc: dict = {}
    info = pd.DataFrame()
    info["gt_label"] = list(range(n_classes))
    if single_pass:
        bundles = {name: _build(name) for name in model_names}
        log(f"Models (single pass): {', '.join(model_names)}")
        preds_by_model, labels, model_val_acc = single_pass_eval(
            bundles, batches, run_dir, mesh=mesh, log=log)
        for name in model_names:
            info[f"{name}-pre"] = order_predictions_by_label(
                labels, preds_by_model[name], n_classes)
    else:
        for name in model_names:
            log(f"Model-{name}:")
            bundle = _build(name)
            preds, labels, top1 = reference_eval(bundle, batches, run_dir,
                                                 mesh=mesh, log=log)
            info[f"{name}-pre"] = order_predictions_by_label(labels, preds,
                                                             n_classes)
            model_val_acc[name] = top1
            del bundle  # device buffers freed on GC (the model-swap pattern)

    info.to_csv(os.path.join(run_dir, "results_all_models_prediction.csv"),
                index=False)
    with open(os.path.join(run_dir, "top1_acc_all_models.json"), "w") as f:
        json.dump(model_val_acc, f)
    return model_val_acc
