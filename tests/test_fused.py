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
