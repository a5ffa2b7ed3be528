"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from i2v_tpu.models import get_image_models
from i2v_tpu.parallel import attack_mesh, clip_sharding, frame_sharding, shard_clips
from i2v_tpu.parallel.dist import process_shard_bounds
from i2v_tpu.parallel.sharded import make_sharded_i2v_runner


def test_mesh_factorization():
    mesh = attack_mesh()
    assert mesh.devices.size == 8
    assert mesh.shape["data"] * mesh.shape["frames"] == 8
    m2 = attack_mesh(data=4)
    assert m2.shape == {"data": 4, "frames": 2}


def test_sharded_i2v_matches_single_device():
    models = get_image_models(["resnet"], {"resnet": 2}, tiny=True, input_hw=32)
    mesh = attack_mesh()
    runner = make_sharded_i2v_runner(models, mesh, steps=3)
    clean01 = jnp.asarray(np.random.RandomState(0).rand(4, 3, 8, 32, 32).astype(np.float32))
    adv_sharded, costs_sharded = runner(shard_clips(clean01, mesh))

    mesh1 = attack_mesh(jax.devices()[:1])
    runner1 = make_sharded_i2v_runner(models, mesh1, steps=3)
    adv_single, costs_single = runner1(shard_clips(clean01, mesh1))

    np.testing.assert_allclose(
        np.asarray(adv_sharded), np.asarray(adv_single), atol=2e-6
    )
    np.testing.assert_allclose(
        np.asarray(costs_sharded), np.asarray(costs_single), rtol=1e-5
    )


def test_sharded_aens_runs():
    models = get_image_models(
        ["resnet", "alexnet"], {"resnet": [1, 2], "alexnet": [2, 3]},
        tiny=True, input_hw=32)
    mesh = attack_mesh()
    runner = make_sharded_i2v_runner(models, mesh, steps=2, adaptive=True)
    clean01 = jnp.full((2, 3, 8, 32, 32), 0.4, jnp.float32)
    adv, costs = runner(shard_clips(clean01, mesh))
    assert adv.shape == clean01.shape
    assert np.isfinite(np.asarray(costs)).all()


def test_shardings():
    mesh = attack_mesh()
    cs, fs = clip_sharding(mesh), frame_sharding(mesh)
    x = shard_clips(jnp.zeros((8, 3, 4, 8, 8)), mesh)
    assert x.sharding == cs
    f = jax.device_put(jnp.zeros((16, 8, 8, 3)), fs)
    assert f.sharding.is_equivalent_to(fs, 4)


def test_process_shard_bounds():
    # reference contract: 400 samples, 4 shards → 100 each
    assert process_shard_bounds(400, 4, 0) == (0, 100)
    assert process_shard_bounds(400, 4, 3) == (300, 400)
    # remainder goes to the last shard
    assert process_shard_bounds(101, 4, 3) == (75, 101)
    # single process default
    assert process_shard_bounds(10) == (0, 10)


def test_dryrun_multichip_8():
    import sys

    if "/root/repo" not in sys.path:
        sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
