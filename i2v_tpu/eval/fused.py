"""Fused generate→evaluate: attack a batch and immediately evaluate the
adversarial clips on-device, with artifact egress overlapped asynchronously.

The reference's unit of work is a two-process artifact round trip
(run_image_guided.py:48-52): image_main.py attacks 400 clips and writes f32
``.npy`` files (attack compute, then device→host egress), then reference.py
re-reads every file and re-uploads it to the device for each of six video
models (host→device ingress × 6). On a relay-backed TPU host where bulk
transfers run at ~10 MB/s, the ~19.3 MB/clip f32 egress + ingress dominates
the attack compute itself.

This module fuses the two stages in one process so adversarial clips never
leave the device between generation and evaluation:

  - the attack's normalized-domain output feeds each video model's jitted
    forward directly (no host round trip — only per-batch predictions, a few
    bytes, are fetched),
  - artifacts are still written (the protocol stays the inter-stage IR for
    ILAF and offline re-eval) but from a background writer thread, so the
    slow egress overlaps the next batch's attack/eval compute; ``dtype``
    selects the opt-in compact f16 format (utils/artifacts.save_adv_clip),
  - reports keep the reference's exact schemas
    (results_all_models_prediction.csv / top1_acc_all_models.json,
    reference.py:105-129).
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models.api import rebind_params
from .transfer import accuracy_and_preds


class AsyncArtifactWriter:
    """Background device→host fetch + per-sample ``.npy`` save.

    ``submit`` returns immediately; the writer thread performs the
    ``np.asarray`` (the actual relay transfer) and the atomic file writes,
    overlapping the main thread's dispatch of the next batch. ``close``
    drains the queue and re-raises any writer-side exception.
    """

    def __init__(self, run_dir: str, dtype=np.float32, kind: str = "adv",
                 depth: int = 2):
        from ..utils import artifacts

        self._artifacts = artifacts
        self.run_dir = run_dir
        self.dtype = dtype
        self.kind = kind
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._err: list[BaseException] = []
        self._done = object()
        self._t = threading.Thread(target=self._worker, daemon=True)
        self._t.start()

    def _worker(self):
        while True:
            item = self._q.get()
            if item is self._done:
                return
            labels, adv = item
            try:
                batch = np.asarray(adv)  # the relay egress happens HERE
                for i, label in enumerate(labels):
                    self._artifacts.save_adv_clip(
                        self.run_dir, int(label), batch[i], self.kind,
                        dtype=self.dtype)
            except BaseException as e:  # surfaced at close()
                self._err.append(e)

    def submit(self, labels: Sequence[int], adv) -> None:
        if self._err:
            raise self._err[0]
        self._q.put((list(labels), adv))

    def close(self) -> None:
        self._q.put(self._done)
        self._t.join()
        if self._err:
            raise self._err[0]


def merge_shard_reports(run_dir: str) -> dict:
    """Merge shard-suffixed fused reports (``*_{k}.csv/json``) into the
    plain reference-schema files.

    The offline alternative is re-running the evaluate CLI over the shared
    artifact dir — but a ``--no_artifacts`` sharded fused run leaves ONLY
    the suffixed reports, so this merges them directly: per-label
    predictions (rows where a shard produced one, i.e. != -1) union across
    shards — two shards claiming the same label with different predictions
    raise, like the malformed-dir guards in eval/transfer — and the merged
    JSON top-1 is recomputed over the union. Returns {model: top1_pct}."""
    import glob
    import re

    import pandas as pd

    shard_csvs = sorted(
        glob.glob(os.path.join(run_dir, "results_all_models_prediction_*.csv")))
    if not shard_csvs:
        raise FileNotFoundError(
            f"no shard-suffixed reports under {run_dir!r} (pattern "
            "results_all_models_prediction_<k>.csv)")
    frames = [pd.read_csv(p) for p in shard_csvs]
    model_cols = [c for c in frames[0].columns if c.endswith("-pre")]
    merged = frames[0].copy()
    for p, df in zip(shard_csvs[1:], frames[1:]):
        if list(df.columns) != list(merged.columns):
            raise ValueError(f"{p!r} has different model columns than "
                             f"{shard_csvs[0]!r}; cannot merge")
        for col in model_cols:
            ours, theirs = merged[col].to_numpy(), df[col].to_numpy()
            clash = (ours != -1) & (theirs != -1) & (ours != theirs)
            if clash.any():
                lab = int(np.flatnonzero(clash)[0])
                raise ValueError(
                    f"shards disagree on label {lab} for {col!r} "
                    f"({int(ours[lab])} vs {int(theirs[lab])} in {p!r}) — "
                    "overlapping shard bounds?")
            merged[col] = np.where(theirs != -1, theirs, ours)
    acc = {}
    gt = merged["gt_label"].to_numpy()
    for col in model_cols:
        preds = merged[col].to_numpy()
        have = preds != -1
        n = max(int(have.sum()), 1)
        acc[re.sub(r"-pre$", "", col)] = 100.0 * float(
            (preds[have] == gt[have]).sum()) / n
    merged.to_csv(os.path.join(run_dir, "results_all_models_prediction.csv"),
                  index=False)
    with open(os.path.join(run_dir, "top1_acc_all_models.json"), "w") as f:
        json.dump(acc, f)
    return acc


class FusedGenerateEvaluate:
    """Drive attack + on-device eval + async artifact egress per batch.

    ``attack`` is any reference-calling-convention attack
    (``attack(videos, labels, names) -> adv_norm``, tuple-returning AENS
    included); ``eval_bundles`` maps model name → VideoModel whose
    ``apply_norm`` consumes normalized clips. Per-model params stay resident
    in HBM across batches (the serial reload-per-model swap of
    reference.py:108-125 disappears — each clip is evaluated by every model
    while it is still on device).
    """

    def __init__(self, attack, eval_bundles: dict, *, run_dir: Optional[str],
                 n_classes: int = 400, artifact_dtype=np.float32):
        self.attack = attack
        self.bundles = dict(eval_bundles)
        self.n_classes = n_classes
        self.run_dir = run_dir
        self.writer = (AsyncArtifactWriter(run_dir, dtype=artifact_dtype)
                       if run_dir is not None else None)
        self._fwd = {}
        for name, bundle in self.bundles.items():
            def fwd(params, clips, labels, _b=bundle):
                return accuracy_and_preds(
                    rebind_params(_b, params).apply_norm(clips), labels)

            self._fwd[name] = jax.jit(fwd)
        self.predictions: dict[str, list[int]] = {n: [] for n in self.bundles}
        self.labels_seen: list[int] = []

    def process_batch(self, batch) -> None:
        labels = np.asarray(batch["labels"])
        out = self.attack(batch["clips"], batch["labels"],
                          batch.get("names"))
        adv = out[0] if isinstance(out, tuple) else out  # AENS triple
        adv = jnp.asarray(adv)
        if self.writer is not None:
            egress = adv
            if np.dtype(self.writer.dtype) == np.float16:
                # cast ON DEVICE so the f16 flag actually halves the
                # device→host transfer, not just the disk bytes
                egress = adv.astype(jnp.float16)
            try:
                # start the host copy now: the queue then pins HBM only for
                # the in-flight transfer, not until the writer gets to it
                egress.copy_to_host_async()
            except AttributeError:
                pass
            self.writer.submit(labels, egress)
        jlabels = jnp.asarray(labels)
        # dispatch every model's forward before fetching any result: the
        # device queues all programs while only tiny (acc, preds) outputs
        # cross the relay
        pending = {name: self._fwd[name](self.bundles[name].params, adv, jlabels)
                   for name in self.bundles}
        self.labels_seen += list(labels)
        for name, (acc, preds) in pending.items():
            self.predictions[name] += list(np.asarray(preds))

    def process_artifacts(self, files: Sequence[str]) -> None:
        """Resume path: re-score EXISTING artifacts through the resident
        eval models — no attack, no re-write. A killed fused run resumes as
        (a) ``process_artifacts`` over the labels already on disk (one
        upload, six forwards — cheap relative to a 60-step attack) and
        (b) ``process_batch`` over the missing labels; ``finalize`` then
        emits the complete un-sharded reports, so resume needs no offline
        merge step. Mirrors the reference's re-evaluate-from-artifacts
        protocol (reference.py:96-103) inside the fused process."""
        from ..utils import artifacts

        clips, labels = artifacts.load_adv_batch(self.run_dir, files)
        adv = jnp.asarray(clips)
        jlabels = jnp.asarray(labels)
        pending = {name: self._fwd[name](self.bundles[name].params, adv,
                                         jlabels)
                   for name in self.bundles}
        self.labels_seen += [int(x) for x in labels]
        for name, (acc, preds) in pending.items():
            self.predictions[name] += list(np.asarray(preds))

    def finalize(self, report_dir: Optional[str] = None,
                 shard: Optional[int] = None) -> dict:
        """Drain the artifact writer and emit the reference-schema reports.
        Returns {model: top1_accuracy_pct}.

        ``shard``: under manual/process sharding the fixed report names
        would be clobbered by sibling shards, so a non-None shard id
        suffixes them ``*_{shard}.csv/json`` (the loss_info_{N}.json
        pattern, image_main.py:94); merge offline by running the evaluate
        CLI over the shared artifact dir."""
        import pandas as pd

        if self.writer is not None:
            self.writer.close()
        labels = [int(x) for x in self.labels_seen]
        keep = list(range(len(labels)))
        if len(set(labels)) != len(labels):
            # skip-and-resample (data/kinetics._resample) can substitute
            # a sample whose label already appears in the stream — a
            # legitimate run, not a malformed dir, so don't let the
            # label-keyed report raise after hours of compute. The
            # artifact writer's LAST write per label wins on disk, so keep
            # the last prediction per label — in the JSON top-1 as well as
            # the CSV, so offline re-eval of the dir agrees with both.
            import warnings

            warnings.warn(
                "duplicate labels in the fused stream (decode "
                "resample); keeping the last occurrence per label")
            last = {lab: i for i, lab in enumerate(labels)}
            keep = sorted(last.values())
        n = max(len(keep), 1)
        model_val_acc = {
            name: 100.0 * sum(
                int(self.predictions[name][i]) == labels[i] for i in keep) / n
            for name in self.bundles}
        report_dir = report_dir or self.run_dir
        if report_dir is not None:
            from .transfer import order_predictions_by_label

            kept_labels = [labels[i] for i in keep]
            info = pd.DataFrame()
            info["gt_label"] = list(range(self.n_classes))
            for name in self.bundles:
                preds = [self.predictions[name][i] for i in keep]
                info[f"{name}-pre"] = order_predictions_by_label(
                    kept_labels, preds, self.n_classes)
            os.makedirs(report_dir, exist_ok=True)
            sfx = "" if shard is None else f"_{shard}"
            info.to_csv(os.path.join(
                report_dir, f"results_all_models_prediction{sfx}.csv"),
                index=False)
            with open(os.path.join(
                    report_dir, f"top1_acc_all_models{sfx}.json"), "w") as f:
                json.dump(model_val_acc, f)
        return model_val_acc
