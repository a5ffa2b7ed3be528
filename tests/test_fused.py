"""Fused generate→evaluate edge cases + Attack.save on image-guided attacks."""

import jax.numpy as jnp
import numpy as np
import pytest

import i2v_tpu.attacks as attacks
from i2v_tpu.models import TinyVideoNet, get_image_models, init_bundle


@pytest.fixture(scope="module")
def tiny_bundle():
    clip = jnp.zeros((2, 3, 4, 32, 32), dtype=jnp.float32)
    return init_bundle(TinyVideoNet(), clip, "tinyvid",
                       tap_keys=("block1", "block2"))


def test_fused_duplicate_labels_kept_last(tmp_path, tiny_bundle):
    """skip-and-resample (data/kinetics._resample) can put the same label in
    the stream twice; finalize must dedupe (last occurrence wins, matching
    the artifact writer's last-write-wins) instead of raising the
    malformed-dir error after the whole run's compute."""
    import pandas as pd

    from i2v_tpu.eval.fused import FusedGenerateEvaluate

    def attack(clips, labels, names=None):
        return jnp.asarray(clips)

    fused = FusedGenerateEvaluate(
        attack, {"tinyvid": tiny_bundle}, run_dir=str(tmp_path), n_classes=8)
    rng = np.random.RandomState(0)
    c1 = rng.rand(2, 3, 4, 32, 32).astype(np.float32)
    c2 = rng.rand(2, 3, 4, 32, 32).astype(np.float32)
    fused.process_batch({"clips": c1, "labels": np.asarray([1, 2])})
    fused.process_batch({"clips": c2, "labels": np.asarray([2, 3])})
    with pytest.warns(UserWarning, match="duplicate labels"):
        fused.finalize(report_dir=str(tmp_path))
    df = pd.read_csv(tmp_path / "results_all_models_prediction.csv")
    # the deduped label-2 prediction is the LAST one (c2's first clip)
    assert df["tinyvid-pre"][2] == fused.predictions["tinyvid"][2]
    assert df["tinyvid-pre"][1] == fused.predictions["tinyvid"][0]
    assert df["tinyvid-pre"][0] == -1  # label never generated


def test_save_works_for_image_guided_attacks(tmp_path):
    """Attack.save must handle image-guided attacks: surrogate ImageModels
    have no normalized-domain forward (skip the progress accuracy, don't
    crash) and AENS returns an (adv, time, costs) triple."""
    import os

    models = get_image_models(["resnet"], {"resnet": [1, 2]}, tiny=True,
                              input_hw=32)
    rng = np.random.RandomState(0)
    videos = jnp.asarray(rng.rand(2, 3, 4, 32, 32).astype(np.float32))
    batches = [{"clips": videos, "labels": np.asarray([0, 1])}]
    atk = attacks.AENS_I2V_MF(models, step_size=0.005, steps=2)
    atk.save(str(tmp_path / "aens"), batches)
    files = sorted(os.listdir(tmp_path / "aens"))
    assert files == ["0-adv.npy", "1-adv.npy"]
    a = np.load(tmp_path / "aens" / "0-adv.npy")
    assert a.dtype == np.float32 and a.shape == (3, 4, 32, 32)


def test_fused_json_top1_matches_deduped_csv(tmp_path, tiny_bundle):
    """On duplicate-label streams the JSON top-1 must score the SAME
    kept-last set the CSV (and the artifact dir) reflects — not every
    occurrence."""
    import json

    from i2v_tpu.eval.fused import FusedGenerateEvaluate

    def attack(clips, labels, names=None):
        return jnp.asarray(clips)

    fused = FusedGenerateEvaluate(
        attack, {"tinyvid": tiny_bundle}, run_dir=None, n_classes=8)
    rng = np.random.RandomState(1)
    fused.process_batch({"clips": rng.rand(2, 3, 4, 32, 32).astype(np.float32),
                         "labels": np.asarray([1, 2])})
    fused.process_batch({"clips": rng.rand(2, 3, 4, 32, 32).astype(np.float32),
                         "labels": np.asarray([2, 3])})
    with pytest.warns(UserWarning, match="duplicate labels"):
        acc = fused.finalize(report_dir=str(tmp_path))
    with open(tmp_path / "top1_acc_all_models.json") as f:
        assert json.load(f) == acc
    # recompute from the CSV's kept set: 3 unique labels
    labels = [int(x) for x in fused.labels_seen]
    last = {lab: i for i, lab in enumerate(labels)}
    keep = sorted(last.values())
    want = 100.0 * sum(
        int(fused.predictions["tinyvid"][i]) == labels[i] for i in keep) / 3
    assert acc["tinyvid"] == want


def test_fused_shard_suffixed_reports(tmp_path, tiny_bundle):
    """shard=N suffixes the report names so concurrent shards of one run
    dir don't clobber each other (the loss_info_{N}.json pattern)."""
    import os

    from i2v_tpu.eval.fused import FusedGenerateEvaluate

    def attack(clips, labels, names=None):
        return jnp.asarray(clips)

    fused = FusedGenerateEvaluate(
        attack, {"tinyvid": tiny_bundle}, run_dir=None, n_classes=8)
    fused.process_batch({
        "clips": np.random.RandomState(2).rand(2, 3, 4, 32, 32)
        .astype(np.float32), "labels": np.asarray([0, 1])})
    fused.finalize(report_dir=str(tmp_path), shard=3)
    assert os.path.exists(tmp_path / "results_all_models_prediction_3.csv")
    assert os.path.exists(tmp_path / "top1_acc_all_models_3.json")
    assert not os.path.exists(tmp_path / "results_all_models_prediction.csv")


def test_fused_resume_rescores_existing_artifacts(tmp_path, tiny_bundle):
    """Kill+resume (tools/e2e_400.py protocol): a second fused process
    re-scores artifacts already on disk via process_artifacts — same
    predictions as if their batches had run fused — then attacks only the
    missing labels; finalize emits complete UN-sharded reports with no
    offline merge."""
    import pandas as pd

    from i2v_tpu.eval.fused import FusedGenerateEvaluate
    from i2v_tpu.utils import artifacts

    def attack(clips, labels, names=None):
        return jnp.asarray(clips)

    rng = np.random.RandomState(4)
    c1 = rng.rand(2, 3, 4, 32, 32).astype(np.float32)
    c2 = rng.rand(2, 3, 4, 32, 32).astype(np.float32)

    # "phase A": processed labels {0,1}, then the process died pre-finalize
    f1 = FusedGenerateEvaluate(attack, {"tinyvid": tiny_bundle},
                               run_dir=str(tmp_path), n_classes=8)
    f1.process_batch({"clips": c1, "labels": np.asarray([0, 1])})
    f1.writer.close()  # artifacts flushed; NO finalize (killed)
    a_preds = list(f1.predictions["tinyvid"])

    # "phase B": fresh process — rescore disk labels, attack the rest
    f2 = FusedGenerateEvaluate(attack, {"tinyvid": tiny_bundle},
                               run_dir=str(tmp_path), n_classes=8)
    assert artifacts.existing_labels(str(tmp_path)) == {0, 1}
    f2.process_artifacts(artifacts.list_adv_files(str(tmp_path)))
    # rescoring reproduces phase A's predictions (identity attack ⇒ the
    # artifact holds exactly what phase A evaluated)
    assert f2.predictions["tinyvid"] == a_preds
    assert f2.labels_seen == [0, 1]
    f2.process_batch({"clips": c2, "labels": np.asarray([2, 3])})
    f2.finalize(report_dir=str(tmp_path))
    df = pd.read_csv(tmp_path / "results_all_models_prediction.csv")
    assert (df["tinyvid-pre"][:4] != -1).all()
    assert len(artifacts.existing_labels(str(tmp_path))) == 4


def test_fused_f16_egress_casts_on_device(tmp_path, tiny_bundle):
    """--artifact_dtype float16 must halve the device→host transfer: the
    array handed to the writer is already f16 (device cast), and the saved
    artifact still round-trips."""
    from i2v_tpu.eval.fused import AsyncArtifactWriter, FusedGenerateEvaluate

    seen = []
    orig_submit = AsyncArtifactWriter.submit

    def spy(self, labels, adv):
        seen.append(adv.dtype)
        return orig_submit(self, labels, adv)

    def attack(clips, labels, names=None):
        return jnp.asarray(clips)

    AsyncArtifactWriter.submit = spy
    try:
        fused = FusedGenerateEvaluate(
            attack, {"tinyvid": tiny_bundle}, run_dir=str(tmp_path),
            n_classes=8, artifact_dtype=np.float16)
        fused.process_batch({
            "clips": np.random.RandomState(3).rand(2, 3, 4, 32, 32)
            .astype(np.float32), "labels": np.asarray([4, 5])})
        fused.finalize(report_dir=str(tmp_path))
    finally:
        AsyncArtifactWriter.submit = orig_submit
    assert seen == [jnp.float16]
    adv = np.load(tmp_path / "4-adv.npy")
    assert adv.dtype == np.float16 and adv.shape == (3, 4, 32, 32)


def test_threaded_prefetch_abandoned_consumer_stops_worker():
    """Dropping the generator mid-stream must unblock and end the worker
    thread (it previously parked forever in q.put holding decoded
    batches)."""
    import threading
    import time

    from i2v_tpu.data.pipeline import threaded_prefetch

    produced = []

    def make_iter():
        for i in range(100):
            produced.append(i)
            yield i

    before = set(threading.enumerate())
    gen = threaded_prefetch(make_iter, depth=1)
    assert next(gen) == 0
    gen.close()  # GeneratorExit → stop event
    new = [t for t in set(threading.enumerate()) - before]
    for t in new:
        t.join(timeout=5)
        assert not t.is_alive()
    time.sleep(0.05)
    assert len(produced) < 100  # the worker did NOT drain the whole source


def test_merge_shard_reports(tmp_path, tiny_bundle):
    """Two sharded fused runs (disjoint label ranges) merge into one plain
    reference-schema report pair; overlap disagreement raises."""
    import json
    import os

    import pandas as pd

    from i2v_tpu.cli import report as report_cli
    from i2v_tpu.eval.fused import FusedGenerateEvaluate, merge_shard_reports

    def attack(clips, labels, names=None):
        return jnp.asarray(clips)

    rng = np.random.RandomState(7)
    for shard, labels in ((1, [0, 1]), (2, [2, 3])):
        fused = FusedGenerateEvaluate(
            attack, {"tinyvid": tiny_bundle}, run_dir=None, n_classes=5)
        fused.process_batch({
            "clips": rng.rand(2, 3, 4, 32, 32).astype(np.float32),
            "labels": np.asarray(labels)})
        fused.finalize(report_dir=str(tmp_path), shard=shard)
    acc = merge_shard_reports(str(tmp_path))
    df = pd.read_csv(tmp_path / "results_all_models_prediction.csv")
    preds = df["tinyvid-pre"].to_numpy()
    assert (preds[:4] != -1).all() and preds[4] == -1  # label 4 unattacked
    with open(tmp_path / "top1_acc_all_models.json") as f:
        assert json.load(f) == acc
    # the CLI front door
    out = report_cli.main(["--merge_shards", str(tmp_path)])
    assert "tinyvid" in out

    # overlapping shards that DISAGREE must raise, not silently pick one
    df2 = pd.read_csv(tmp_path / "results_all_models_prediction_2.csv")
    df2.loc[0, "tinyvid-pre"] = 3  # claim label 0 with a different pred
    if df.loc[0, "tinyvid-pre"] == 3:
        df2.loc[0, "tinyvid-pre"] = 2
    df2.to_csv(tmp_path / "results_all_models_prediction_2.csv", index=False)
    with pytest.raises(ValueError, match="disagree"):
        merge_shard_reports(str(tmp_path))
