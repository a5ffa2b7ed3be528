"""Data-layer tests: native decode, transforms, manifests, pipelines,
artifact protocol."""

import os

import numpy as np
import pytest
from PIL import Image

from i2v_tpu.data import decode, transforms
from i2v_tpu.data.synthetic import SyntheticAttackDataset, iterate_batches
from i2v_tpu.utils import artifacts


def _frames(n=6, w=64, h=48, seed=0):
    rng = np.random.RandomState(seed)
    return [Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
            for _ in range(n)]


class TestNativeDecode:
    def test_available(self):
        from i2v_tpu.data import native

        assert native.available(), "native/libi2vio.so must be built"

    def test_jpeg_roundtrip(self, tmp_path):
        from i2v_tpu.data import native

        img = np.zeros((32, 48, 3), np.uint8)
        img[:16] = [255, 0, 0]
        img[16:] = [0, 0, 255]
        p = str(tmp_path / "t.jpg")
        Image.fromarray(img).save(p, quality=98)
        arr = native.decode_jpeg(p)
        assert arr.shape == (32, 48, 3)
        assert abs(int(arr[0, 0, 0]) - 255) < 12 and int(arr[0, 0, 1]) < 24

    def test_video_decode_mjpeg_avi(self, tmp_path):
        from i2v_tpu.data import native

        from i2v_tpu.data.avi_synth import write_mjpeg_avi

        frames = []
        for i in range(5):
            a = np.full((48, 64, 3), i * 40, np.uint8)
            frames.append(Image.fromarray(a))
        p = str(tmp_path / "clip.avi")
        write_mjpeg_avi(p, frames)
        arr = native.decode_video(p, width=32, height=24)
        assert arr.shape == (5, 24, 32, 3)
        # luminance ramps over frames
        means = arr.reshape(5, -1).mean(axis=1)
        assert (np.diff(means) > 10).all()

    def test_batch_video_decode_matches_sequential(self, tmp_path):
        from i2v_tpu.data import native

        from i2v_tpu.data.avi_synth import write_mjpeg_avi

        rng = np.random.RandomState(3)
        paths = []
        for v in range(6):
            frames = [Image.fromarray(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
                      for _ in range(3 + v)]
            p = str(tmp_path / f"clip{v}.avi")
            write_mjpeg_avi(p, frames)
            paths.append(p)
        bad = str(tmp_path / "bad.avi")
        with open(bad, "wb") as f:
            f.write(b"junk" * 64)
        batch = native.decode_videos(paths + [bad], width=32, height=24, threads=4)
        assert batch[-1] is None  # per-item failure doesn't poison the batch
        for p, arr in zip(paths, batch[:-1]):
            np.testing.assert_array_equal(arr, native.decode_video(p, 32, 24))

    def test_batch_jpeg_decode_matches_sequential(self, tmp_path):
        from i2v_tpu.data import native

        rng = np.random.RandomState(4)
        paths = []
        for i in range(8):
            p = str(tmp_path / f"f{i}.jpg")
            Image.fromarray(rng.randint(0, 255, (24, 32, 3), dtype=np.uint8)).save(p)
            paths.append(p)
        batch = native.decode_jpegs(paths, threads=3)
        for p, arr in zip(paths, batch):
            np.testing.assert_array_equal(arr, native.decode_jpeg(p))
        assert native.decode_jpegs([]) == []

    def test_decode_error_path(self, tmp_path):
        from i2v_tpu.data import native

        p = str(tmp_path / "garbage.mp4")
        with open(p, "wb") as f:
            f.write(b"not a video" * 100)
        with pytest.raises(RuntimeError):
            native.decode_video(p)

    def test_decode_dispatch_sidecar(self, tmp_path):
        arr = np.random.RandomState(0).randint(0, 255, (4, 8, 8, 3), dtype=np.uint8)
        p = str(tmp_path / "x.npy")
        np.save(p, arr)
        out = decode.decode_video(p)
        np.testing.assert_array_equal(out, arr)


class TestTransforms:
    def test_resize_short_side(self):
        img = Image.new("RGB", (100, 50))
        out = transforms.resize_short_side(img, 25)
        assert out.size == (50, 25)
        out = transforms.resize_short_side(Image.new("RGB", (50, 100)), 25)
        assert out.size == (25, 50)

    def test_center_crop(self):
        img = Image.new("RGB", (100, 60))
        assert transforms.center_crop(img, 40).size == (40, 40)

    def test_loop_padding(self):
        # truth values emulated from reference LoopPadding
        # (transforms_ucf101.py:23-39): the [1:size+1] slice SKIPS the first
        # index, and the self-growing pad loop cycles the sliced list
        assert transforms.loop_padding([1, 2, 3], 7) == [2, 3, 2, 3, 2, 3, 2]
        assert transforms.loop_padding(list(range(1, 50)), 4) == [2, 3, 4, 5]

    def test_temporal_crops(self):
        idx = list(range(1, 101))
        center = transforms.temporal_center_crop(idx, 32)
        assert len(center) == 32
        assert center[:4] == [35, 36, 37, 38]  # max(1,...) clamp, ref truth
        # begin crop shares LoopPadding's [1:size+1] slice
        assert transforms.temporal_begin_crop(idx, 8) == list(range(2, 10))
        # frozen-seed "random" crop is deterministic (reference quirk)
        a = transforms.temporal_random_crop(idx, 32)
        b = transforms.temporal_random_crop(idx, 32)
        assert a == b

    def test_kinetics_clip_indices_deterministic(self):
        a = transforms.kinetics_clip_indices(300, clip_ind=7)
        b = transforms.kinetics_clip_indices(300, clip_ind=7)
        np.testing.assert_array_equal(a, b)
        c = transforms.kinetics_clip_indices(300, clip_ind=8)
        assert not np.array_equal(a, c)
        assert a.shape == (32,)
        assert a.max() < 300

    def test_kinetics_clip_indices_matches_reference_formula(self):
        # replicate reference datasets.py:230-237 with global np seed
        n, clip_ind = 500, 42
        np.random.seed(clip_ind)
        end_idx = np.random.randint(64, 500)
        str_idx = end_idx - 64
        want = np.clip(np.linspace(str_idx, end_idx, num=32), str_idx,
                       end_idx - 1).astype(np.int64)
        got = transforms.kinetics_clip_indices(n, clip_ind)
        np.testing.assert_array_equal(got, want)

    def test_kinetics_clip_indices_short_video(self):
        idx = transforms.kinetics_clip_indices(40, clip_ind=3)
        assert idx.shape == (32,)
        assert idx.max() <= 39

    def test_val_transform_shape_and_range(self):
        buf = np.random.RandomState(1).randint(0, 255, (4, 256, 340, 3), np.uint8)
        clip = transforms.kinetics_val_transform(buf, 256, 224)
        assert clip.shape == (3, 4, 224, 224)
        from i2v_tpu.ops import pixel
        import jax.numpy as jnp

        back = pixel.unnormalize(jnp.asarray(clip), channel_axis=0)
        assert float(back.min()) >= -1e-5 and float(back.max()) <= 1 + 1e-5

    def test_ucf_transform(self):
        clip = transforms.ucf_test_transform(_frames(5, 320, 240), 224)
        assert clip.shape == (3, 5, 224, 224)

    def test_u8_spatial_plus_normalize_equals_full_transform(self):
        """The u8-ingest split (spatial half → uint8, normalize later) must
        compose back to the one-shot transforms byte-for-byte — the refactor
        guard for raw_uint8 dataset modes."""
        buf = np.random.RandomState(2).randint(0, 255, (4, 256, 340, 3), np.uint8)
        u8 = transforms.kinetics_val_frames_u8(buf, 256, 224)
        assert u8.dtype == np.uint8 and u8.shape == (4, 224, 224, 3)
        np.testing.assert_array_equal(
            transforms.u8_clip_to_normalized(u8),
            transforms.kinetics_val_transform(buf, 256, 224))
        frames = _frames(5, 320, 240)
        u8u = transforms.ucf_test_frames_u8(frames, 224)
        assert u8u.dtype == np.uint8 and u8u.shape == (5, 224, 224, 3)
        np.testing.assert_array_equal(
            transforms.u8_clip_to_normalized(u8u),
            transforms.ucf_test_transform(frames, 224))


class TestSyntheticAndPipeline:
    def test_batches(self):
        ds = SyntheticAttackDataset(n_samples=5, clip_len=4, size=16)
        batches = list(iterate_batches(ds, 2))
        assert [b["clips"].shape[0] for b in batches] == [2, 2, 1]
        assert batches[0]["clips"].shape[1:] == (3, 4, 16, 16)

    def test_raw_uint8_batches(self):
        ds = SyntheticAttackDataset(n_samples=3, clip_len=4, size=16,
                                    raw_uint8=True)
        batches = list(iterate_batches(ds, 2))
        clips = batches[0]["clips"]
        assert clips.dtype == np.uint8 and clips.shape == (2, 4, 16, 16, 3)
        # deterministic per label, like the f32 mode
        np.testing.assert_array_equal(clips[0], ds[0][0])

    def test_shard_bounds_iteration(self):
        ds = SyntheticAttackDataset(n_samples=10, clip_len=2, size=8)
        batches = list(iterate_batches(ds, 4, left=4, right=8))
        assert sum(b["clips"].shape[0] for b in batches) == 4

    def test_threaded_prefetch(self):
        from i2v_tpu.data.pipeline import threaded_prefetch

        ds = SyntheticAttackDataset(n_samples=6, clip_len=2, size=8)
        items = list(threaded_prefetch(lambda: iterate_batches(ds, 2)))
        assert len(items) == 3

    def test_threaded_prefetch_propagates_errors(self):
        from i2v_tpu.data.pipeline import threaded_prefetch

        def bad():
            yield 1
            raise RuntimeError("decode failed")

        it = threaded_prefetch(lambda: bad())
        assert next(it) == 1
        with pytest.raises(RuntimeError):
            list(it)

    def test_device_pipeline(self):
        from i2v_tpu.data.pipeline import make_input_pipeline
        from i2v_tpu.parallel import attack_mesh, clip_sharding

        mesh = attack_mesh()
        ds = SyntheticAttackDataset(n_samples=8, clip_len=2, size=8)
        out = list(make_input_pipeline(ds, 8, iterate_batches,
                                       sharding=clip_sharding(mesh)))
        assert out[0]["clips"].sharding == clip_sharding(mesh)

    def test_input_pipeline_keep_host(self):
        """keep_host retains the numpy original under clips_host (byte-equal
        to the device copy) so ori-saving skips the device round trip."""
        from i2v_tpu.data.pipeline import make_input_pipeline

        ds = SyntheticAttackDataset(n_samples=4, clip_len=2, size=8)
        out = list(make_input_pipeline(ds, 2, iterate_batches, keep_host=True))
        assert len(out) == 2
        for b in out:
            assert isinstance(b["clips_host"], np.ndarray)
            np.testing.assert_array_equal(b["clips_host"],
                                          np.asarray(b["clips"]))


class TestArtifacts:
    def test_roundtrip(self, tmp_path):
        d = str(tmp_path / artifacts.run_dir_name("Image", "I2V", 60, "test"))
        clips = np.random.RandomState(0).randn(3, 3, 8, 16, 16).astype(np.float32)
        artifacts.save_batch(d, [5, 9, 123], clips, ori_batch=clips + 1)
        advs = artifacts.list_adv_files(d)
        assert advs == ["123-adv.npy", "5-adv.npy", "9-adv.npy"]
        batches = artifacts.batch_files(advs, 2)
        assert [len(b) for b in batches] == [2, 1]
        loaded, labels = artifacts.load_adv_batch(d, batches[0])
        assert loaded.shape == (2, 3, 8, 16, 16)
        assert list(labels) == [123, 5]
        assert artifacts.existing_labels(d) == {5, 9, 123}
        assert artifacts.existing_labels(d, "ori") == {5, 9, 123}

    def test_rejects_bad_shape(self, tmp_path):
        with pytest.raises(ValueError):
            artifacts.save_adv_clip(str(tmp_path), 0, np.zeros((4, 8, 16, 16)))

    def test_loss_info(self, tmp_path):
        p = artifacts.save_loss_info(str(tmp_path), {"v": {0: {"cost": "1.0"}}}, 2)
        assert os.path.basename(p) == "loss_info_2.json"


class TestRealDatasets:
    """End-to-end dataset contracts over real (tmp) media files."""

    def _make_kinetics(self, tmp_path, n_videos=3, n_frames=8):
        from i2v_tpu.data.avi_synth import write_mjpeg_avi

        rng = np.random.RandomState(7)
        rows = ["path,gt_label,clip_index"]
        for v in range(n_videos):
            frames = [
                Image.fromarray(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
                for _ in range(n_frames)
            ]
            write_mjpeg_avi(str(tmp_path / f"vid{v}.avi"), frames)
            rows.append(f"vid{v}.avi,{v},{v}")
        anno = tmp_path / "anno.csv"
        anno.write_text("\n".join(rows) + "\n")
        from i2v_tpu.data.kinetics import KineticsAttackDataset

        return KineticsAttackDataset(str(anno), str(tmp_path))

    def test_kinetics_item_contract(self, tmp_path):
        ds = self._make_kinetics(tmp_path)
        clip, label, name, clip_ind = ds[1]
        assert clip.shape == (3, 32, 224, 224)
        assert clip.dtype == np.float32
        assert (label, name, clip_ind) == (1, "vid1", 1)
        # ImageNet-normalized domain, not [0,1]
        assert clip.min() < -0.5
        # raw_uint8 mode: same decode/crop, clip stays (T,H,W,3) uint8 and
        # normalizes back to the f32 item byte-for-byte
        ds.raw_uint8 = True
        clip_u8, label2, name2, _ = ds[1]
        assert clip_u8.dtype == np.uint8
        assert clip_u8.shape == (32, 224, 224, 3)
        assert (label2, name2) == (label, name)
        from i2v_tpu.data import transforms as tfm

        np.testing.assert_array_equal(tfm.u8_clip_to_normalized(clip_u8), clip)

    def test_kinetics_load_batch_matches_sequential(self, tmp_path):
        ds = self._make_kinetics(tmp_path, n_videos=4)
        seq = [ds[i] for i in range(4)]
        par = ds.load_batch(range(4))
        for (c1, l1, n1, i1), (c2, l2, n2, i2) in zip(seq, par):
            np.testing.assert_array_equal(c1, c2)
            assert (l1, n1, i1) == (l2, n2, i2)

    def test_kinetics_batch_resamples_bad_video(self, tmp_path):
        ds = self._make_kinetics(tmp_path, n_videos=3)
        bad = tmp_path / "vid1.avi"
        bad.write_bytes(b"x" * 4096)  # >1KiB so decode (not size check) fails
        np.random.seed(0)
        with pytest.warns(UserWarning):
            items = ds.load_batch(range(3))
        assert len(items) == 3
        assert all(it[0].shape == (3, 32, 224, 224) for it in items)
        # the resampled stand-in is one of the healthy manifest entries
        assert items[1][1] in (0, 2)

    def test_kinetics_iterate_batches_uses_batch_loader(self, tmp_path):
        from i2v_tpu.data.kinetics import iterate_batches as kin_batches

        ds = self._make_kinetics(tmp_path, n_videos=3)
        batches = list(kin_batches(ds, 2))
        assert [b["clips"].shape[0] for b in batches] == [2, 1]
        assert batches[0]["clips"].shape[1:] == (3, 32, 224, 224)
        assert batches[0]["names"] == ["vid0", "vid1"]

    def test_ucf_native_batch_matches_pil(self, tmp_path, monkeypatch):
        rng = np.random.RandomState(9)
        d = tmp_path / "v_Test_g01_c01"
        d.mkdir()
        for i in range(1, 6):  # 5 frames, LoopPadding to 32
            Image.fromarray(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)).save(
                str(d / f"image_{i:05d}.jpg")
            )
        setting = tmp_path / "setting.txt"
        setting.write_text(f"{d.name} 5 17\n")
        from i2v_tpu.data import native
        from i2v_tpu.data.ucf101 import UCF101AttackDataset

        ds = UCF101AttackDataset(str(setting), str(tmp_path))
        clip_native, label = ds[0]
        assert clip_native.shape == (3, 32, 224, 224) and label == 17
        monkeypatch.setattr(native, "available", lambda: False)
        clip_pil, _ = ds[0]
        np.testing.assert_array_equal(clip_native, clip_pil)

    def test_ucf_overstated_duration_loop_pads(self, tmp_path):
        """A setting-file duration exceeding the real frame count (off-by-one
        in 3D-ResNets-style annotations) must loop-pad the frames that DO
        exist instead of yielding a ragged (< clip_len) clip."""
        rng = np.random.RandomState(3)
        d = tmp_path / "v_Short_g01_c01"
        d.mkdir()
        for i in range(1, 4):  # 3 real frames; annotated duration says 6
            Image.fromarray(
                rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)
            ).save(str(d / f"image_{i:05d}.jpg"))
        setting = tmp_path / "setting.txt"
        setting.write_text(f"{d.name} 6 4\n")
        from i2v_tpu.data.ucf101 import UCF101AttackDataset

        ds = UCF101AttackDataset(str(setting), str(tmp_path))
        clip, label = ds[0]
        assert clip.shape == (3, 32, 224, 224) and label == 4
        assert np.isfinite(np.asarray(clip)).all()

    def test_corrupt_jpeg_does_not_kill_process(self, tmp_path):
        """libjpeg fatal errors must come back as rc!=0 (setjmp recovery),
        not exit() the process — per-item isolation for the batch pool."""
        from i2v_tpu.data import native

        good = str(tmp_path / "good.jpg")
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(good)
        with open(good, "rb") as f:
            data = f.read()
        corrupt = str(tmp_path / "corrupt.jpg")
        with open(corrupt, "wb") as f:  # valid header, truncated+mangled body
            f.write(data[: len(data) // 2] + b"\xff\x00garbage")
        notjpeg = str(tmp_path / "not.jpg")
        with open(notjpeg, "wb") as f:
            f.write(b"PNG?nope" * 16)
        out = native.decode_jpegs([good, corrupt, notjpeg, good])
        assert out[0] is not None and out[3] is not None
        assert out[2] is None
        np.testing.assert_array_equal(out[0], out[3])

    def test_kinetics_batch_with_sidecar_manifest(self, tmp_path):
        """Sidecar (.npy) manifest entries must flow through the decode
        dispatch, not the FFmpeg pool."""
        rng = np.random.RandomState(11)
        rows = ["path,gt_label,clip_index"]
        for v in range(2):
            arr = rng.randint(0, 255, (8, 256, 340, 3), dtype=np.uint8)
            np.save(str(tmp_path / f"clip{v}.npy"), arr)
            rows.append(f"clip{v}.npy,{v},{v}")
        (tmp_path / "anno.csv").write_text("\n".join(rows) + "\n")
        from i2v_tpu.data.kinetics import KineticsAttackDataset

        ds = KineticsAttackDataset(str(tmp_path / "anno.csv"), str(tmp_path))
        seq = [ds[i] for i in range(2)]
        par = ds.load_batch(range(2))
        for a, b in zip(seq, par):
            np.testing.assert_array_equal(a[0], b[0])
            assert a[1:] == b[1:]


from i2v_tpu.utils.paths import MANIFEST_DIR as REF  # packaged C30 copies


class TestReferenceManifests:
    """Parse the PACKAGED copies of the reference's shipped manifests (C30)
    — curated data copied verbatim into i2v_tpu/manifests/, validating both
    the file formats and that the package ships runnable defaults."""

    def test_packaged_defaults_resolve(self, tmp_path, monkeypatch):
        """get_paths() with no env vars and no CWD copies must point every
        manifest at an existing packaged file."""
        from i2v_tpu.utils.paths import get_paths

        for var in ("I2V_TPU_KINETICS_ANNO", "I2V_TPU_UCF_SETTING",
                    "I2V_TPU_UCF_USED_IDXS"):
            monkeypatch.delenv(var, raising=False)
        monkeypatch.chdir(tmp_path)  # no ./kinetics400_attack_samples.csv here
        p = get_paths()
        for path in (p.kinetics_anno, p.ucf_setting, p.ucf_used_idxs):
            assert os.path.isfile(path), path
            assert os.path.dirname(path) == REF

    def test_kinetics_manifest(self):
        from i2v_tpu.data.kinetics import read_manifest

        samples = read_manifest(os.path.join(REF, "kinetics400_attack_samples.csv"))
        assert len(samples) == 400  # one clip per Kinetics-400 class
        assert samples[0].path.endswith(".mp4")
        assert samples[0].label == 0 and samples[0].clip_index == -1
        assert sorted({s.label for s in samples}) == list(range(400))

    def test_ucf_setting_and_used_idxs(self):
        from i2v_tpu.data.ucf101 import load_used_idxs, read_setting

        clips = read_setting(os.path.join(REF, "test01_setting.txt"), "/data")
        assert len(clips) == 3783
        assert clips[0].directory == "/data/ApplyEyeMakeup/v_ApplyEyeMakeup_g01_c01"
        assert clips[0].duration == 165 and clips[0].label == 0
        idxs = load_used_idxs(os.path.join(REF, "used_idxs.pkl"))
        assert len(idxs) == 101 and idxs[:3] == [28, 53, 96]
        # the subset selects one clip per UCF-101 class
        labels = {clips[i].label for i in idxs}
        assert labels == set(range(101))

    def test_kinetics_real_manifest_path_shapes(self, tmp_path):
        """Real-manifest-style entries: class subdirectory with a SPACE in
        the name, clip_index=-1 (end-anchored window) — the exact row format
        of kinetics400_attack_samples.csv."""
        from i2v_tpu.data.avi_synth import write_mjpeg_avi

        from i2v_tpu.data.kinetics import KineticsAttackDataset

        (tmp_path / "air drumming").mkdir()
        rng = np.random.RandomState(0)
        frames = [Image.fromarray(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
                  for _ in range(8)]
        rel = "air drumming/--nQbRBEz2s_000104_000114.avi"
        write_mjpeg_avi(str(tmp_path / rel), frames)
        (tmp_path / "anno.csv").write_text(f"path,gt_label,clip_index\n{rel},1,-1\n")
        ds = KineticsAttackDataset(str(tmp_path / "anno.csv"), str(tmp_path))
        clip, label, name, ind = ds.load_batch([0])[0]
        assert clip.shape == (3, 32, 224, 224)
        assert (label, ind) == (1, -1)
        assert name == "air drumming/--nQbRBEz2s_000104_000114"


class TestDecoderRobustness:
    """Round-2 review fixes in native/i2vio.cc: truncated containers fail
    the item (not a silently short frame set); geometry-tracked sws."""

    def test_truncated_video_never_returns_full_set(self, tmp_path):
        """A mid-payload truncation must fail the item or decode fewer
        frames (short clips are then caught by the clip-length minimum in
        _select_clip) — never a silently complete frame set."""
        from i2v_tpu.data import native
        from i2v_tpu.data.avi_synth import write_mjpeg_avi

        frames = [Image.fromarray(np.full((48, 64, 3), i * 30, np.uint8))
                  for i in range(6)]
        p = tmp_path / "full.avi"
        write_mjpeg_avi(str(p), frames)
        data = p.read_bytes()
        trunc = tmp_path / "trunc.avi"
        trunc.write_bytes(data[: len(data) // 2])
        try:
            arr = native.decode_video(str(trunc), width=32, height=24)
            assert arr.shape[0] < 6
        except RuntimeError:
            pass  # hard failure is equally acceptable

    def test_garbage_file_fails_item_batch_isolated(self, tmp_path):
        from i2v_tpu.data import native
        from i2v_tpu.data.avi_synth import write_mjpeg_avi

        frames = [Image.fromarray(np.full((48, 64, 3), i * 30, np.uint8))
                  for i in range(6)]
        p = tmp_path / "full.avi"
        write_mjpeg_avi(str(p), frames)
        bad = tmp_path / "bad.avi"
        bad.write_bytes(b"\x00" * 4096)
        with pytest.raises(RuntimeError, match="failed with code"):
            native.decode_video(str(bad), width=32, height=24)
        out = native.decode_videos([str(bad), str(p)], width=32, height=24)
        assert out[0] is None
        assert out[1] is not None and out[1].shape == (6, 24, 32, 3)

    def test_missing_file_still_fails_cleanly(self, tmp_path):
        from i2v_tpu.data import native

        with pytest.raises(RuntimeError):
            native.decode_video(str(tmp_path / "nope.avi"), width=32,
                                height=24)
