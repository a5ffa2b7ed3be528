"""End-to-end CLI smoke tests (SURVEY.md §4): synthetic clips, tiny models,
full generate → evaluate → fine-tune chain through the real CLI mains."""

import json
import os

import numpy as np
import pytest


@pytest.fixture()
def opt_path(tmp_path, monkeypatch):
    p = str(tmp_path / "outputs")
    monkeypatch.setenv("I2V_TPU_OPT_PATH", p)
    return p


class TestImageGuidedCLI:
    def test_i2v_generate_and_evaluate(self, opt_path):
        from i2v_tpu.cli import evaluate, image_main

        run_dir = image_main.main([
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", "resnet", "--depth", "2",
            "--step", "2", "--step_size", "0.005", "--tiny",
            "--data", "synthetic", "--n_synthetic", "3", "--batch_size", "2",
            "--file_prefix", "smoke",
        ])
        assert os.path.basename(run_dir) == \
            "Image-ImageGuidedFMDirection_Adam-2-synthetic-smoke"
        advs = sorted(f for f in os.listdir(run_dir) if f.endswith("-adv.npy"))
        assert advs == ["0-adv.npy", "1-adv.npy", "2-adv.npy"]
        clip = np.load(os.path.join(run_dir, advs[0]))
        assert clip.shape == (3, 8, 32, 32) and clip.dtype == np.float32
        assert os.path.exists(os.path.join(run_dir, "loss_info_1.json"))

        acc = evaluate.main([
            "--adv_path", run_dir, "--tiny", "--n_classes", "3",
            "--models", "i3d_resnet50", "tpn_resnet50",
        ])
        assert set(acc) == {"i3d_resnet50", "tpn_resnet50"}
        df_path = os.path.join(run_dir, "results_all_models_prediction.csv")
        assert os.path.exists(df_path)
        with open(os.path.join(run_dir, "top1_acc_all_models.json")) as f:
            report = json.load(f)
        assert set(report) == set(acc)
        import pandas as pd

        df = pd.read_csv(df_path)
        assert list(df.columns) == ["gt_label", "i3d_resnet50-pre",
                                    "tpn_resnet50-pre"]
        assert len(df) == 3

        # --bf16 plumbs through to the model dtype and still reports
        acc_bf16 = evaluate.main([
            "--adv_path", run_dir, "--tiny", "--n_classes", "3",
            "--models", "i3d_resnet50", "--bf16",
        ])
        assert set(acc_bf16) == {"i3d_resnet50"}

    def test_ens_model_parallel_cli(self, opt_path):
        """--model_parallel routes ENS through the model-axis mesh runner
        (parallel/ensemble.py) with the same artifact/loss_info contract."""
        from i2v_tpu.cli import image_main

        run_dir = image_main.main([
            "--attack_method", "ImageGuidedFML2_Adam_MultiModels",
            "--step", "2", "--tiny",
            "--data", "synthetic", "--n_synthetic", "3", "--batch_size", "2",
            "--model_parallel", "2", "--file_prefix", "mp"])
        advs = sorted(f for f in os.listdir(run_dir) if f.endswith("-adv.npy"))
        assert advs == ["0-adv.npy", "1-adv.npy", "2-adv.npy"]
        clip = np.load(os.path.join(run_dir, advs[0]))
        assert clip.shape == (3, 8, 32, 32) and clip.dtype == np.float32
        assert np.isfinite(clip).all()
        with open(os.path.join(run_dir, "loss_info_1.json")) as f:
            info = json.load(f)
        assert all(len(v) == 2 for v in info.values())  # 2 steps/clip
        # the flag guards against non-ENS methods
        with pytest.raises(SystemExit):
            image_main.main([
                "--attack_method", "ImageGuidedFMDirection_Adam",
                "--model_parallel", "2", "--tiny", "--data", "synthetic"])

    def test_ens_model_parallel_multigrid_cli(self, opt_path):
        """--multigrid composes with --model_parallel: the coarse-to-fine
        schedule runs over the model-axis runner (runner_factory hook) and
        the artifacts stay protocol-conformant."""
        from i2v_tpu.cli import image_main
        from i2v_tpu.ops import pixel

        run_dir = image_main.main([
            "--attack_method", "ImageGuidedFML2_Adam_MultiModels",
            "--step", "4", "--tiny",
            "--data", "synthetic", "--n_synthetic", "2", "--batch_size", "2",
            "--model_parallel", "2", "--multigrid", "2",
            "--file_prefix", "mpmg"])
        import jax.numpy as jnp

        for f in ("0-adv.npy", "1-adv.npy"):
            adv = np.load(os.path.join(run_dir, f))
            assert adv.shape == (3, 8, 32, 32) and adv.dtype == np.float32
            a01 = np.asarray(pixel.unnormalize(jnp.asarray(adv),
                                               channel_axis=0))
            assert a01.min() >= -1e-6 and a01.max() <= 1 + 1e-6
        with open(os.path.join(run_dir, "loss_info_1.json")) as f:
            info = json.load(f)
        assert all(len(v) == 4 for v in info.values())  # coarse ‖ fine

    def test_multigrid_composes_with_fused_eval(self, opt_path):
        """--multigrid + --fused_eval in one --sharded run (the production
        drive config: bf16 params, auto chunk, f16 artifacts): coarse-to-fine
        hands the adv clips straight to the on-device eval, reports and f16
        artifacts both land."""
        from i2v_tpu.cli import image_main
        from i2v_tpu.ops import pixel

        run_dir = image_main.main([
            "--attack_method", "ImageGuidedFML2_Adam_MultiModels",
            "--step", "4", "--step_size", "0.005", "--tiny",
            "--data", "synthetic", "--n_synthetic", "2", "--batch_size", "2",
            "--sharded", "--multigrid", "2", "--frame_chunk", "auto",
            "--param_dtype", "bfloat16",
            "--fused_eval", "i3d_resnet50", "--artifact_dtype", "float16",
            "--file_prefix", "mgfused"])
        with open(os.path.join(run_dir, "top1_acc_all_models.json")) as f:
            acc = json.load(f)
        assert set(acc) == {"i3d_resnet50"}
        import jax.numpy as jnp

        for f in ("0-adv.npy", "1-adv.npy"):
            adv = np.load(os.path.join(run_dir, f))
            assert adv.shape == (3, 8, 32, 32) and adv.dtype == np.float16
            a01 = np.asarray(pixel.unnormalize(
                jnp.asarray(adv, jnp.float32), channel_axis=0))
            assert a01.min() >= -2e-3 and a01.max() <= 1 + 2e-3

    def test_fused_generate_evaluate(self, opt_path):
        """--fused_eval runs attack + on-device eval in one pass: reference-
        schema reports AND async-written artifacts must both appear, and the
        fused predictions must match an offline evaluate of the artifacts."""
        from i2v_tpu.cli import evaluate, image_main

        run_dir = image_main.main([
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", "resnet", "--depth", "2",
            "--step", "2", "--step_size", "0.005", "--tiny",
            "--data", "synthetic", "--n_synthetic", "3", "--batch_size", "2",
            "--file_prefix", "fused", "--fused_eval", "i3d_resnet50",
        ])
        advs = sorted(f for f in os.listdir(run_dir) if f.endswith("-adv.npy"))
        assert advs == ["0-adv.npy", "1-adv.npy", "2-adv.npy"]
        with open(os.path.join(run_dir, "top1_acc_all_models.json")) as f:
            fused_acc = json.load(f)
        assert set(fused_acc) == {"i3d_resnet50"}
        import pandas as pd

        fused_df = pd.read_csv(
            os.path.join(run_dir, "results_all_models_prediction.csv"))
        assert list(fused_df.columns) == ["gt_label", "i3d_resnet50-pre"]
        # offline re-eval of the async-written artifacts agrees (same model
        # seed => same random-init tiny weights)
        offline = evaluate.main([
            "--adv_path", run_dir, "--tiny", "--n_classes", "400",
            "--models", "i3d_resnet50",
        ])
        offline_df = pd.read_csv(
            os.path.join(run_dir, "results_all_models_prediction.csv"))
        assert offline["i3d_resnet50"] == pytest.approx(
            fused_acc["i3d_resnet50"])
        assert list(offline_df["i3d_resnet50-pre"]) == \
            list(fused_df["i3d_resnet50-pre"])

    def test_fused_no_artifacts_and_f16(self, opt_path):
        """--no_artifacts writes reports only; --artifact_dtype float16
        halves artifact bytes and still round-trips through eval."""
        from i2v_tpu.cli import image_main
        from i2v_tpu.utils import artifacts

        run_dir = image_main.main([
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", "resnet", "--depth", "2",
            "--step", "1", "--tiny", "--data", "synthetic",
            "--n_synthetic", "2", "--batch_size", "2",
            "--file_prefix", "noart", "--fused_eval", "i3d_resnet50",
            "--no_artifacts",
        ])
        assert not any(f.endswith(".npy") for f in os.listdir(run_dir))
        assert os.path.exists(os.path.join(run_dir, "top1_acc_all_models.json"))

        run16 = image_main.main([
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", "resnet", "--depth", "2",
            "--step", "1", "--tiny", "--data", "synthetic",
            "--n_synthetic", "2", "--batch_size", "2",
            "--file_prefix", "f16", "--artifact_dtype", "float16",
        ])
        raw = np.load(os.path.join(run16, "0-adv.npy"))
        assert raw.dtype == np.float16
        clips, labels = artifacts.load_adv_batch(run16, ["0-adv.npy"])
        assert clips.dtype == np.float32  # protocol dtype restored on load

    @pytest.mark.parametrize("surrogate", ["vit", "densenet"])
    def test_extra_surrogates(self, opt_path, surrogate):
        """densenet161 and ViT-B/16 exist in the reference zoo but are never
        CLI-wired (image_attacks.py:96-99, TPAMI_attack.py:88-98); here they
        are first-class --direction_image_model choices."""
        from i2v_tpu.cli import image_main

        run_dir = image_main.main([
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", surrogate, "--depth", "2",
            "--step", "1", "--tiny", "--data", "synthetic",
            "--n_synthetic", "2", "--batch_size", "2",
            "--file_prefix", surrogate])
        advs = [f for f in os.listdir(run_dir) if f.endswith("-adv.npy")]
        assert len(advs) == 2

    def test_sharded_cli_attack(self, opt_path):
        """--sharded routes generation through the pjit runner on the CPU
        mesh; artifacts must match the class-path run numerically (same
        math, sharded execution)."""
        from i2v_tpu.cli import image_main

        common_args = [
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", "resnet", "--depth", "2",
            "--step", "2", "--step_size", "0.005", "--tiny",
            "--data", "synthetic", "--n_synthetic", "2", "--batch_size", "2",
        ]
        run_a = image_main.main(common_args + ["--file_prefix", "cls"])
        run_b = image_main.main(common_args + ["--file_prefix", "shard",
                                               "--sharded"])
        for f in ("0-adv.npy", "1-adv.npy"):
            a = np.load(os.path.join(run_a, f))
            b = np.load(os.path.join(run_b, f))
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=f)

    def test_multigrid_cli_attack(self, opt_path):
        """--multigrid runs the coarse-to-fine schedule through --sharded;
        artifacts stay protocol-conformant and within the eps-ball of the
        clean clips."""
        from i2v_tpu.cli import image_main
        from i2v_tpu.ops import pixel

        run = image_main.main([
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", "resnet", "--depth", "2",
            "--step", "4", "--step_size", "0.005", "--tiny",
            "--data", "synthetic", "--n_synthetic", "2", "--batch_size", "2",
            "--sharded", "--multigrid", "2", "--file_prefix", "mg",
            "--frame_chunk", "auto"])  # 'auto' parses and flows through
        # both multigrid phases (resolves to unchunked at tiny shapes)
        import jax.numpy as jnp

        for f in ("0-adv.npy", "1-adv.npy"):
            adv = np.load(os.path.join(run, f))
            assert adv.shape == (3, 8, 32, 32) and adv.dtype == np.float32
            a01 = np.asarray(pixel.unnormalize(jnp.asarray(adv),
                                               channel_axis=0))
            assert a01.min() >= -1e-6 and a01.max() <= 1 + 1e-6

    def test_multigrid_cli_guards(self, opt_path):
        from i2v_tpu.cli import image_main

        base = ["--attack_method", "ImageGuidedFML2_Adam_MultiModels",
                "--step", "2", "--tiny", "--data", "synthetic",
                "--n_synthetic", "1", "--batch_size", "1"]
        with pytest.raises(SystemExit, match="sharded"):
            image_main.main(base + ["--multigrid", "1"])
        with pytest.raises(SystemExit, match="AENS"):
            image_main.main(["--attack_method", "AENS_I2V_MF", "--step", "2",
                             "--tiny", "--data", "synthetic", "--sharded",
                             "--multigrid", "1"])

    def test_multigrid_cli_config_guards(self, opt_path):
        """Invalid multigrid configs exit with clean messages, not
        trace-time tracebacks (advisor-style CLI-consistency fix)."""
        from i2v_tpu.cli import image_main

        base = ["--attack_method", "ImageGuidedFMDirection_Adam",
                "--direction_image_model", "resnet", "--depth", "2",
                "--tiny", "--data", "synthetic", "--n_synthetic", "1",
                "--batch_size", "1", "--sharded"]
        with pytest.raises(SystemExit, match="smaller than"):
            image_main.main(base + ["--step", "2", "--multigrid", "2"])
        with pytest.raises(SystemExit, match="divide the spatial"):
            image_main.main(base + ["--step", "4", "--multigrid", "2",
                                    "--multigrid_scale", "3"])

    def test_u8_ingress_cli(self, opt_path):
        """--u8_ingress ships raw uint8 clips and normalizes on device; the
        run must produce protocol-conformant normalized f32 artifacts through
        both the class path and the sharded runner."""
        from i2v_tpu.cli import image_main

        common_args = [
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", "resnet", "--depth", "2",
            "--step", "2", "--step_size", "0.005", "--tiny",
            "--data", "synthetic", "--n_synthetic", "2", "--batch_size", "2",
            "--u8_ingress",
        ]
        run_a = image_main.main(common_args + ["--file_prefix", "u8cls"])
        run_b = image_main.main(common_args + ["--file_prefix", "u8shard",
                                               "--sharded"])
        for f in ("0-adv.npy", "1-adv.npy"):
            a = np.load(os.path.join(run_a, f))
            assert a.dtype == np.float32 and a.shape == (3, 8, 32, 32)
            b = np.load(os.path.join(run_b, f))
            np.testing.assert_allclose(a, b, atol=1e-5, err_msg=f)

    def test_prefetch_pipeline_matches_synchronous(self, opt_path):
        """--prefetch N decodes + device_puts batches ahead of the attack;
        it must be a pure pipelining knob — identical artifacts to the
        synchronous loop, for both the f32 and u8-ingress layouts."""
        from i2v_tpu.cli import image_main

        common_args = [
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", "resnet", "--depth", "2",
            "--step", "2", "--step_size", "0.005", "--tiny",
            "--data", "synthetic", "--n_synthetic", "3", "--batch_size", "2",
        ]
        for extra, tag in (([], "pf"), (["--u8_ingress"], "pfu8")):
            run_s = image_main.main(
                common_args + extra + ["--file_prefix", f"{tag}sync"])
            run_p = image_main.main(
                common_args + extra + ["--file_prefix", f"{tag}pre",
                                       "--prefetch", "2"])
            for f in ("0-adv.npy", "1-adv.npy", "2-adv.npy"):
                np.testing.assert_array_equal(
                    np.load(os.path.join(run_s, f)),
                    np.load(os.path.join(run_p, f)), err_msg=f"{tag}/{f}")

    def test_u8_ingress_composes_with_fused_eval(self, opt_path):
        """--u8_ingress + --fused_eval: the fused driver forwards raw uint8
        batches to the attack untouched, so the combination must produce the
        full reports + normalized-f32 artifacts."""
        import json

        from i2v_tpu.cli import image_main

        run_dir = image_main.main([
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", "resnet", "--depth", "2",
            "--step", "2", "--step_size", "0.005", "--tiny",
            "--data", "synthetic", "--n_synthetic", "2", "--batch_size", "2",
            "--file_prefix", "u8fused", "--u8_ingress",
            "--fused_eval", "i3d_resnet50",
        ])
        a = np.load(os.path.join(run_dir, "0-adv.npy"))
        assert a.dtype == np.float32 and a.shape == (3, 8, 32, 32)
        with open(os.path.join(run_dir, "top1_acc_all_models.json")) as f:
            assert set(json.load(f)) == {"i3d_resnet50"}

    def test_data_parallel_eval_matches_single_device(self, opt_path):
        """--data_parallel shards eval batches over the 8-device CPU mesh;
        predictions and top-1 must match the unsharded run (the accuracy
        mean's psum and the sharded argmax are inserted by XLA from the
        input shardings alone)."""
        import pandas as pd

        from i2v_tpu.cli import evaluate, image_main

        run_dir = image_main.main([
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", "resnet", "--depth", "2",
            "--step", "1", "--step_size", "0.005", "--tiny",
            "--data", "synthetic", "--n_synthetic", "8", "--batch_size", "8",
            "--file_prefix", "dpeval",
        ])
        common = ["--adv_path", run_dir, "--tiny", "--n_classes", "8",
                  "--batch_size", "8", "--models", "i3d_resnet50"]
        acc_single = evaluate.main(common)
        df_single = pd.read_csv(os.path.join(
            run_dir, "results_all_models_prediction.csv"))
        acc_dp = evaluate.main(common + ["--data_parallel"])
        df_dp = pd.read_csv(os.path.join(
            run_dir, "results_all_models_prediction.csv"))
        assert acc_dp == acc_single
        assert df_dp.equals(df_single)

        # mixed batching: first batch of 6 is indivisible by the 8-device
        # mesh → replicated fallback; trailing batch of 2 likewise. Results
        # must still match the single-device run.
        mixed = ["--adv_path", run_dir, "--tiny", "--n_classes", "8",
                 "--batch_size", "6", "--models", "i3d_resnet50"]
        with pytest.warns(UserWarning, match="does not divide"):
            acc_mixed = evaluate.main(mixed + ["--data_parallel"])
        # batch-size 6 changes the AverageMeter accumulation order → tiny fp drift
        assert acc_mixed["i3d_resnet50"] == pytest.approx(
            acc_single["i3d_resnet50"], abs=1e-4)

    def test_single_pass_eval_matches_serial(self, opt_path):
        """--single_pass uploads each artifact batch once and runs every
        model on it; reports must be identical to the serial per-model swap
        (same jitted forwards, same inputs), alone and composed with
        --data_parallel."""
        import pandas as pd

        from i2v_tpu.cli import evaluate, image_main

        run_dir = image_main.main([
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", "resnet", "--depth", "2",
            "--step", "1", "--step_size", "0.005", "--tiny",
            "--data", "synthetic", "--n_synthetic", "8", "--batch_size", "8",
            "--file_prefix", "sp",
        ])
        common = ["--adv_path", run_dir, "--tiny", "--n_classes", "8",
                  "--batch_size", "8",
                  "--models", "i3d_resnet50", "slowfast_resnet50"]
        acc_serial = evaluate.main(common)
        df_serial = pd.read_csv(os.path.join(
            run_dir, "results_all_models_prediction.csv"))
        acc_sp = evaluate.main(common + ["--single_pass"])
        df_sp = pd.read_csv(os.path.join(
            run_dir, "results_all_models_prediction.csv"))
        assert acc_sp == acc_serial
        assert df_sp.equals(df_serial)

        acc_sp_dp = evaluate.main(
            common + ["--single_pass", "--data_parallel"])
        df_sp_dp = pd.read_csv(os.path.join(
            run_dir, "results_all_models_prediction.csv"))
        assert acc_sp_dp == acc_serial
        assert df_sp_dp.equals(df_serial)

    def test_shard_contract(self, opt_path):
        from i2v_tpu.cli import image_main

        run_dir = image_main.main([
            "--attack_method", "ImageGuidedStd_Adam", "--step", "2",
            "--tiny", "--data", "synthetic", "--n_synthetic", "4",
            "--batch_nums", "2", "--batch_index", "2",
            "--file_prefix", "shard",
        ])
        advs = sorted(f for f in os.listdir(run_dir) if f.endswith("-adv.npy"))
        assert advs == ["2-adv.npy", "3-adv.npy"]  # second shard of 4
        assert os.path.exists(os.path.join(run_dir, "loss_info_2.json"))

    def test_aens_cli(self, opt_path):
        from i2v_tpu.cli import image_main

        run_dir = image_main.main([
            "--attack_method", "AENS_I2V_MF", "--step", "2",
            "--step_size", "0.005", "--tiny", "--data", "synthetic",
            "--n_synthetic", "2", "--file_prefix", "aens",
        ])
        assert len([f for f in os.listdir(run_dir) if "adv" in f]) == 2


class TestRealDataCLI:
    """End-to-end over REAL decoded data (native MJPEG-AVI / frame-JPEG
    decode → attack → artifacts → evaluate) — the full C3/C4 + C24/C25 + C27
    chain the synthetic smoke path bypasses."""

    def test_kinetics_decode_attack_evaluate(self, opt_path, tmp_path,
                                             monkeypatch):
        from PIL import Image

        from i2v_tpu.data.avi_synth import write_mjpeg_avi

        rng = np.random.RandomState(0)
        data = tmp_path / "kinetics"
        (data / "class a").mkdir(parents=True)
        rows = ["path,gt_label,clip_index"]
        for i in range(2):
            rel = f"class a/vid{i}.avi"
            frames = [Image.fromarray(
                rng.randint(0, 255, (40, 56, 3), dtype=np.uint8))
                for _ in range(10)]
            write_mjpeg_avi(str(data / rel), frames)
            rows.append(f"{rel},{i},-1")
        anno = tmp_path / "anno.csv"
        anno.write_text("\n".join(rows) + "\n")
        monkeypatch.setenv("I2V_TPU_KINETICS_DATA", str(data))
        monkeypatch.setenv("I2V_TPU_KINETICS_ANNO", str(anno))

        from i2v_tpu.cli import evaluate, image_main

        run_dir = image_main.main([
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", "resnet", "--depth", "2",
            "--step", "2", "--tiny", "--data", "kinetics",
            "--crop_size", "32", "--clip_len", "8",
            "--batch_size", "2", "--file_prefix", "realdata",
        ])
        advs = sorted(f for f in os.listdir(run_dir) if f.endswith("-adv.npy"))
        assert advs == ["0-adv.npy", "1-adv.npy"]
        assert np.load(os.path.join(run_dir, advs[0])).shape == (3, 8, 32, 32)
        acc = evaluate.main(["--adv_path", run_dir, "--tiny",
                             "--n_classes", "2", "--models", "i3d_resnet50"])
        assert set(acc) == {"i3d_resnet50"}

    def test_kinetics_u8_prefetch_bitwise_matches_f32_sync(
            self, opt_path, tmp_path, monkeypatch):
        """The full production ingest composition over REAL decoded video —
        native MJPEG-AVI decode → --u8_ingress (device-side LUT normalize) →
        --prefetch 2 (decode thread + early device_put) — must emit artifacts
        bit-identical to the plain host-normalized synchronous run: both
        knobs are pure transport optimizations (ops/pixel.ingest_u8_clips,
        data/pipeline.py)."""
        from PIL import Image

        from i2v_tpu.data.avi_synth import write_mjpeg_avi

        rng = np.random.RandomState(7)
        data = tmp_path / "kinetics"
        (data / "class a").mkdir(parents=True)
        rows = ["path,gt_label,clip_index"]
        for i in range(3):
            rel = f"class a/vid{i}.avi"
            frames = [Image.fromarray(
                rng.randint(0, 255, (40, 56, 3), dtype=np.uint8))
                for _ in range(10)]
            write_mjpeg_avi(str(data / rel), frames)
            rows.append(f"{rel},{i},-1")
        anno = tmp_path / "anno.csv"
        anno.write_text("\n".join(rows) + "\n")
        monkeypatch.setenv("I2V_TPU_KINETICS_DATA", str(data))
        monkeypatch.setenv("I2V_TPU_KINETICS_ANNO", str(anno))

        from i2v_tpu.cli import image_main

        common_args = [
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", "resnet", "--depth", "2",
            "--step", "2", "--tiny", "--data", "kinetics",
            "--crop_size", "32", "--clip_len", "8", "--batch_size", "2",
        ]
        run_f32 = image_main.main(common_args + ["--file_prefix", "rdsync"])
        run_u8 = image_main.main(common_args + [
            "--file_prefix", "rdu8pf", "--u8_ingress", "--prefetch", "2"])
        for f in ("0-adv.npy", "1-adv.npy", "2-adv.npy"):
            np.testing.assert_array_equal(
                np.load(os.path.join(run_f32, f)),
                np.load(os.path.join(run_u8, f)), err_msg=f)

    def test_ucf101_decode_attack(self, opt_path, tmp_path, monkeypatch):
        from PIL import Image

        rng = np.random.RandomState(1)
        root = tmp_path / "ucf"
        lines = []
        for i, clip in enumerate(("ClassA/v_a_g01_c01", "ClassB/v_b_g01_c01")):
            d = root / clip
            d.mkdir(parents=True)
            for j in range(1, 7):  # 6 frames; LoopPadding fills to clip_len
                Image.fromarray(
                    rng.randint(0, 255, (40, 56, 3), dtype=np.uint8)
                ).save(str(d / f"image_{j:05d}.jpg"))
            lines.append(f"{clip} 6 {i}")
        setting = tmp_path / "setting.txt"
        setting.write_text("\n".join(lines) + "\n")
        monkeypatch.setenv("I2V_TPU_UCF_IMAGE_ROOT", str(root))
        monkeypatch.setenv("I2V_TPU_UCF_SETTING", str(setting))
        import pickle

        used = tmp_path / "used.pkl"
        used.write_bytes(pickle.dumps([0, 1]))
        monkeypatch.setenv("I2V_TPU_UCF_USED_IDXS", str(used))

        from i2v_tpu.cli import image_main_ucf101

        run_dir = image_main_ucf101.main([
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", "resnet", "--depth", "2",
            "--step", "2", "--tiny", "--data", "ucf101",
            "--crop_size", "32", "--clip_len", "8",
            "--batch_size", "2", "--file_prefix", "realdata",
        ])
        assert os.path.basename(run_dir).startswith("UCF101_Image-")
        advs = sorted(f for f in os.listdir(run_dir) if f.endswith("-adv.npy"))
        assert advs == ["0-adv.npy", "1-adv.npy"]
        assert np.load(os.path.join(run_dir, advs[0])).shape == (3, 8, 32, 32)


class TestWhiteboxCLI:
    def test_bim_saves_adv_and_ori(self, opt_path):
        from i2v_tpu.cli import attack

        run_dir = attack.main([
            "--model", "i3d_resnet50", "--attack_method", "BIM", "--step", "2",
            "--tiny", "--data", "synthetic", "--n_synthetic", "2",
            "--file_prefix", "wb",
        ])
        files = sorted(os.listdir(run_dir))
        assert "0-adv.npy" in files and "0-ori.npy" in files
        adv = np.load(os.path.join(run_dir, "0-adv.npy"))
        ori = np.load(os.path.join(run_dir, "0-ori.npy"))
        from i2v_tpu.ops import pixel
        import jax.numpy as jnp

        d = pixel.unnormalize(jnp.asarray(adv), channel_axis=0) - \
            pixel.unnormalize(jnp.asarray(ori), channel_axis=0)
        assert float(jnp.abs(d).max()) <= 16 / 255 + 1e-5

    def test_idempotent_resume(self, opt_path, capsys):
        from i2v_tpu.cli import attack

        args = ["--model", "i3d_resnet50", "--attack_method", "FGSM",
                "--step", "1", "--tiny", "--data", "synthetic",
                "--n_synthetic", "1", "--file_prefix", "resume"]
        attack.main(args)
        out1 = capsys.readouterr().out
        assert "Running FGSM" in out1
        attack.main(args)
        out2 = capsys.readouterr().out
        assert "Running FGSM" not in out2  # skip-if-exists


class TestILAFCLI:
    def test_fine_tune_chain(self, opt_path):
        from i2v_tpu.cli import attack, fine_tune

        wb_dir = attack.main([
            "--model", "i3d_resnet50", "--attack_method", "BIM", "--step", "2",
            "--tiny", "--data", "synthetic", "--n_synthetic", "2",
            "--file_prefix", "forilaf",
        ])
        out_dir = fine_tune.main([
            "--used_adv", wb_dir, "--model", "i3d_resnet50", "--step", "2",
            "--tiny",
        ])
        advs = [f for f in os.listdir(out_dir) if f.endswith("-adv.npy")]
        assert len(advs) == 2


class TestMalformedArtifacts:
    """A malformed run dir must raise, not emit a quietly wrong CSV
    (VERDICT r1 weak #5)."""

    def test_out_of_range_label_raises(self):
        from i2v_tpu.eval.transfer import order_predictions_by_label

        with pytest.raises(ValueError, match="outside"):
            order_predictions_by_label([0, 401], [5, 6], 400)

    def test_duplicate_label_raises(self):
        from i2v_tpu.eval.transfer import order_predictions_by_label

        with pytest.raises(ValueError, match="duplicate"):
            order_predictions_by_label([7, 7], [5, 6], 400)

    def test_partial_run_fills_minus_one(self):
        from i2v_tpu.eval.transfer import order_predictions_by_label

        out = order_predictions_by_label([2, 0], [9, 8], 4)
        assert list(out) == [8, -1, 9, -1]


class TestReport:
    def test_asr_table(self, tmp_path, capsys):
        import json as _json

        from i2v_tpu.cli import report

        for run, accs in (("Image-I2V-60-a", {"i3d_resnet50": 20.0,
                                              "tpn_resnet50": 35.5}),
                          ("Image-DR-60-b", {"i3d_resnet50": 60.0})):
            d = tmp_path / run
            d.mkdir()
            (d / "top1_acc_all_models.json").write_text(_json.dumps(accs))
        table = report.main(["--runs", str(tmp_path / "Image-I2V-60-a"),
                             str(tmp_path / "Image-DR-60-b"),
                             "--format", "markdown"])
        assert "| run | i3d_resnet50 | tpn_resnet50 |" in table
        assert "| Image-I2V-60-a | 80.0 | 64.5 |" in table  # ASR = 100 - top1
        assert "| Image-DR-60-b | 40.0 |  |" in table


class TestGridDriver:
    def test_grid_smoke(self, opt_path):
        """One (generate, evaluate) pair of each Kinetics grid runs end to
        end on tiny models + synthetic data (--limit caps the sweep)."""
        from i2v_tpu.cli import run_grid

        common = ["--limit", "1", "--tiny", "--data", "synthetic",
                  "--n_synthetic", "2", "--batch_size", "2"]
        run_grid.main(["steps_ablation", *common])
        run_grid.main(["kinetics_perf", *common])
        runs = os.listdir(opt_path)
        assert any(r.startswith("Image-ImageGuidedFMDirection_Adam-20-synthetic-ablation")
                   for r in runs)
        assert any("table3" in r for r in runs)
        for r in runs:
            assert os.path.exists(
                os.path.join(opt_path, r, "top1_acc_all_models.json"))

    def test_grid_eval_single_pass_smoke(self, opt_path):
        """--eval_single_pass routes the grid's offline evals through the
        single-upload all-models path; reports still written per config."""
        from i2v_tpu.cli import run_grid

        run_grid.main(["layer_ablation", "--limit", "1",
                       "--eval_single_pass", "--tiny",
                       "--data", "synthetic", "--n_synthetic", "2",
                       "--batch_size", "2"])
        runs = [r for r in os.listdir(opt_path) if "layers_resnet_1" in r]
        assert len(runs) == 1
        with open(os.path.join(opt_path, runs[0],
                               "top1_acc_all_models.json")) as f:
            assert len(json.load(f)) == 6  # all six video models

    def test_grid_fused_smoke(self, opt_path):
        """--fused routes a grid config through the fused generate+evaluate
        path — one process, reports written, no separate eval stage."""
        from i2v_tpu.cli import run_grid

        run_grid.main(["layer_ablation", "--limit", "1",
                       "--fused", "i3d_resnet50", "--tiny",
                       "--data", "synthetic", "--n_synthetic", "2",
                       "--batch_size", "2"])
        runs = [r for r in os.listdir(opt_path) if "layers_resnet_1" in r]
        assert len(runs) == 1
        with open(os.path.join(opt_path, runs[0],
                               "top1_acc_all_models.json")) as f:
            assert set(json.load(f)) == {"i3d_resnet50"}


class TestResumeAndGuards:
    """Round-2 review fixes: data-source-marked run dirs, both-kind resume,
    decode-free resume, bounded resample, UCF eval schema default."""

    def test_synthetic_runs_get_marked_run_dirs(self, opt_path):
        import argparse

        from i2v_tpu.cli import common

        mk = lambda **kw: common.effective_file_prefix(
            argparse.Namespace(**kw))
        assert mk(file_prefix="x", data="synthetic") == "synthetic-x"
        assert mk(file_prefix="", data="synthetic") == "synthetic"
        assert mk(file_prefix="x", data="kinetics") == "x"
        assert mk(file_prefix="synthetic-x", data="synthetic") == "synthetic-x"

    def test_resume_requires_both_artifact_kinds(self, opt_path, tmp_path):
        """A label with only the adv write (crash between adv and ori saves)
        must be re-attacked on resume."""
        import numpy as np

        from i2v_tpu.utils import artifacts

        d = str(tmp_path)
        np.save(os.path.join(d, "5-adv.npy"), np.zeros(1, np.float32))
        np.save(os.path.join(d, "5-ori.npy"), np.zeros(1, np.float32))
        np.save(os.path.join(d, "6-adv.npy"), np.zeros(1, np.float32))
        done = (artifacts.existing_labels(d)
                & artifacts.existing_labels(d, "ori"))
        assert done == {5}

    def test_resume_subset_skips_decode(self):
        """resume_subset drops done manifest entries BEFORE decode."""
        import dataclasses

        from i2v_tpu.cli import common

        @dataclasses.dataclass
        class S:
            label: int

        decoded = []

        class DS:
            samples = [S(0), S(1), S(2), S(3)]

            def __len__(self):
                return 4

            def __getitem__(self, i):
                decoded.append(i)
                return ("clip", self.samples[i].label, f"v{i}", i)

        view = common.resume_subset(DS(), {0, 2})
        assert view is not None and len(view) == 2
        assert view[0][1] == 1 and view[1][1] == 3
        assert decoded == [1, 3]  # only the not-done indices decode
        assert common.resume_subset(DS(), set()) is None
        assert common.resume_subset(object(), {0}) is None

    def test_resample_bounded_failure_raises(self, tmp_path):
        """A dataset whose every video fails to decode must raise loudly,
        not spin the resample loop forever."""
        from i2v_tpu.data import kinetics as kmod

        anno = tmp_path / "anno.csv"
        anno.write_text("path,gt_label,clip_index\nmissing.mp4,0,0\n"
                        "gone.mp4,1,0\n")
        ds = kmod.KineticsAttackDataset(str(anno), str(tmp_path),
                                        clip_len=4, crop_size=32)
        with pytest.warns(UserWarning, match="resampling"), \
                pytest.raises(RuntimeError, match="unusable"):
            ds[0]

    def test_evaluate_ucf101_defaults_101_rows(self, opt_path):
        from i2v_tpu.cli import evaluate

        args = evaluate.arg_parse(["--adv_path", "x", "--ucf101"])
        assert args.n_classes == 101
        args = evaluate.arg_parse(["--adv_path", "x"])
        assert args.n_classes == 400
        args = evaluate.arg_parse(["--adv_path", "x", "--ucf101",
                                   "--n_classes", "7"])
        assert args.n_classes == 7


class TestShardAndReportGuards:
    """Round-2 review fixes: shard-index validation, ILAF ori precheck,
    report name resolution."""

    def test_out_of_range_batch_index_exits(self, opt_path):
        from i2v_tpu.cli import image_main

        base = ["--attack_method", "ImageGuidedFMDirection_Adam",
                "--direction_image_model", "resnet", "--depth", "2",
                "--step", "1", "--tiny", "--data", "synthetic",
                "--n_synthetic", "2", "--batch_size", "1",
                "--batch_nums", "2"]
        with pytest.raises(SystemExit, match="1-based"):
            image_main.main(base + ["--batch_index", "0"])
        with pytest.raises(SystemExit, match="out of range"):
            image_main.main(base + ["--batch_index", "3"])

    def test_ilaf_missing_ori_fails_fast(self, opt_path, tmp_path):
        import numpy as np

        from i2v_tpu.cli import fine_tune

        run = tmp_path / "advonly"
        run.mkdir()
        np.save(run / "0-adv.npy", np.zeros((3, 4, 32, 32), np.float32))
        with pytest.raises(SystemExit, match="white-box"):
            fine_tune.main(["--used_adv", str(run), "--tiny", "--step", "1"])

    def test_report_resolves_bare_run_names(self, opt_path, capsys):
        import json as _json

        from i2v_tpu.cli import report

        d = os.path.join(opt_path, "SomeRun-BIM-2-x")
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "top1_acc_all_models.json"), "w") as f:
            _json.dump({"i3d_resnet50": 40.0}, f)
        table = report.main(["--runs", "SomeRun-BIM-2-x", "missing-run"])
        assert "SomeRun-BIM-2-x" in table and "60.0" in table
        assert "skipping" in capsys.readouterr().out

    def test_multigrid_composes_with_u8_ingress_and_prefetch(self, opt_path):
        """The production levers compose: uint8 ingest + pipelined decode +
        the coarse-to-fine schedule through one --sharded run; artifacts
        stay protocol-conformant."""
        from i2v_tpu.cli import image_main
        from i2v_tpu.ops import pixel

        run = image_main.main([
            "--attack_method", "ImageGuidedFMDirection_Adam",
            "--direction_image_model", "resnet", "--depth", "2",
            "--step", "4", "--step_size", "0.005", "--tiny",
            "--data", "synthetic", "--n_synthetic", "3", "--batch_size", "2",
            "--sharded", "--multigrid", "2", "--u8_ingress", "--prefetch", "1",
            "--file_prefix", "mgcompose"])
        import jax.numpy as jnp

        for f in ("0-adv.npy", "1-adv.npy", "2-adv.npy"):
            adv = np.load(os.path.join(run, f))
            assert adv.shape == (3, 8, 32, 32) and adv.dtype == np.float32
            a01 = np.asarray(pixel.unnormalize(jnp.asarray(adv),
                                               channel_axis=0))
            assert a01.min() >= -1e-6 and a01.max() <= 1 + 1e-6

    def test_fused_sharded_run_writes_suffixed_reports(self, opt_path):
        """--batch_nums N --fused_eval: each shard's reports are suffixed
        (no clobbering), and --merge_shards assembles the plain pair."""
        import json as _json

        from i2v_tpu.cli import image_main, report

        base = ["--attack_method", "ImageGuidedFMDirection_Adam",
                "--direction_image_model", "resnet", "--depth", "2",
                "--step", "2", "--step_size", "0.005", "--tiny",
                "--data", "synthetic", "--n_synthetic", "4",
                "--batch_size", "2", "--fused_eval", "i3d_resnet50",
                "--batch_nums", "2", "--file_prefix", "fshard"]
        run = image_main.main(base + ["--batch_index", "1"])
        run2 = image_main.main(base + ["--batch_index", "2"])
        assert run == run2
        for k in (1, 2):
            assert os.path.exists(
                os.path.join(run, f"top1_acc_all_models_{k}.json"))
        assert not os.path.exists(
            os.path.join(run, "top1_acc_all_models.json"))
        report.main(["--merge_shards", run])
        with open(os.path.join(run, "top1_acc_all_models.json")) as f:
            assert set(_json.load(f)) == {"i3d_resnet50"}


def test_every_cli_help_renders():
    """argparse expands help text with %-formatting at --help time, so an
    unescaped % in any help string crashes the CLI with ValueError instead
    of printing usage (regression: image_main's --multigrid help said
    "8.7%-worse" and --help died with "unsupported format character 'w'").
    Covers every entry point: modules with their own parser directly, the
    UCF variants through the shared arg_parse they delegate to, and
    run_grid's inline parser via main()."""
    import contextlib
    import importlib
    import io

    cases = [
        ("attack", lambda m: m.arg_parse(["--help"])),
        ("attack_ucf101", lambda m: m.arg_parse(["--help"])),
        ("image_main", lambda m: m.arg_parse(["--help"])),
        ("image_main", lambda m: m.arg_parse(["--help"],
                                             kind="UCF101_Image",
                                             default_step=10)),
        ("fine_tune", lambda m: m.arg_parse(["--help"])),
        ("evaluate", lambda m: m.arg_parse(["--help"])),
        ("evaluate", lambda m: m.arg_parse(["--help"], n_classes=101)),
        ("gradcam", lambda m: m.arg_parse(["--help"])),
        ("run_grid", lambda m: m.main(["--help"])),
    ]
    for name, call in cases:
        mod = importlib.import_module(f"i2v_tpu.cli.{name}")
        buf = io.StringIO()
        with pytest.raises(SystemExit) as e, \
                contextlib.redirect_stdout(buf):
            call(mod)
        assert e.value.code == 0, f"{name} --help exited {e.value.code}"
        assert "usage" in buf.getvalue(), f"{name} --help printed no usage"


def test_matmul_precision_flag_plumbs_to_jax_config():
    """--matmul_precision must take effect BEFORE anything traces: the
    attack builders call apply_matmul_precision, which updates jax's
    default matmul precision (read at trace time). 'default' maps to the
    backend default; unset touches nothing (the conftest's float32 parity
    config must survive an attack build with no flag)."""
    import types

    import jax

    from i2v_tpu.cli import common as cli_common

    old = jax.config.jax_default_matmul_precision
    assert old == "float32"  # the conftest parity config this test relies on
    try:
        ns = types.SimpleNamespace(matmul_precision=None)
        cli_common.apply_matmul_precision(ns)
        assert jax.config.jax_default_matmul_precision == "float32"
        ns.matmul_precision = "high"
        cli_common.apply_matmul_precision(ns)
        assert jax.config.jax_default_matmul_precision == "high"
        ns.matmul_precision = "default"
        cli_common.apply_matmul_precision(ns)
        assert jax.config.jax_default_matmul_precision == "default"
        ns.matmul_precision = "float32"
        cli_common.apply_matmul_precision(ns)
        assert jax.config.jax_default_matmul_precision == "float32"
    finally:
        jax.config.update("jax_default_matmul_precision", old)
