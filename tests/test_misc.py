"""Tests for return types, Attack.save, profiling, extra transforms."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

import i2v_tpu.attacks as attacks
from i2v_tpu.data import transforms
from i2v_tpu.models import TinyVideoNet, init_bundle
from i2v_tpu.ops import pixel
from i2v_tpu.utils.profiling import StepTimer, trace


@pytest.fixture(scope="module")
def bundle():
    return init_bundle(TinyVideoNet(), jnp.zeros((1, 3, 4, 16, 16)), "tiny")


def _batch(seed=0):
    rng = np.random.RandomState(seed)
    clips01 = rng.rand(1, 3, 4, 16, 16).astype(np.float32)
    return pixel.normalize(jnp.asarray(clips01), channel_axis=1), jnp.asarray([1])


class TestReturnTypes:
    def test_int_return(self, bundle):
        videos, labels = _batch()
        atk = attacks.FGSM(bundle)
        atk.set_return_type("int")
        adv = atk(videos, labels)
        assert adv.dtype == jnp.uint8
        assert int(adv.max()) <= 255

    def test_invalid_return_type(self, bundle):
        with pytest.raises(ValueError):
            attacks.FGSM(bundle).set_return_type("double")

    def test_str_dump(self, bundle):
        s = str(attacks.BIM(bundle, steps=3))
        assert s.startswith("BIM(") and "attack_mode=default" in s


class TestSave:
    def test_save_loop(self, bundle, tmp_path, capsys):
        videos, labels = _batch()
        batches = [{"clips": videos, "labels": np.asarray([1])},
                   {"clips": videos, "labels": np.asarray([2])}]
        atk = attacks.FGSM(bundle)
        atk.save(str(tmp_path), batches)
        assert sorted(f for f in __import__("os").listdir(tmp_path)) == \
            ["1-adv.npy", "2-adv.npy"]
        assert "Save Progress" in capsys.readouterr().out


class TestProfiling:
    def test_step_timer(self):
        timer = StepTimer(steps_per_call=10, clips_per_call=2, report_every=0)
        for _ in range(3):
            with timer:
                pass
        s = timer.summary()
        assert s["calls"] == 3
        assert s["attack_steps_per_sec_per_chip"] > 0

    def test_trace_noop(self):
        with trace(None):
            pass

    def test_trace_writes(self, tmp_path):
        with trace(str(tmp_path)):
            jnp.ones((4,)).block_until_ready()
        import os

        assert os.listdir(tmp_path)  # trace directory populated


class TestExtraTransforms:
    def test_horizontal_flip_frozen(self):
        img = Image.fromarray(np.arange(12, dtype=np.uint8).reshape(2, 2, 3))
        a = transforms.random_horizontal_flip(img)
        b = transforms.random_horizontal_flip(img)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_multiscale_crops_deterministic(self):
        img = Image.fromarray(
            np.random.RandomState(0).randint(0, 255, (100, 120, 3), np.uint8))
        a = transforms.multiscale_corner_crop(img, 64)
        b = transforms.multiscale_corner_crop(img, 64)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert a.size == (64, 64)
        c = transforms.multiscale_random_crop(img, 64)
        d = transforms.multiscale_random_crop(img, 64)
        np.testing.assert_array_equal(np.asarray(c), np.asarray(d))
        assert c.size == (64, 64)


class TestBenchContract:
    """bench.py is the driver's round-end entry point — its JSON contract
    must survive a dead device relay (observed outage: backend init hangs
    or raises UNAVAILABLE)."""

    def _import_bench(self):
        import importlib
        import os
        import sys

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, root)
        try:
            return importlib.import_module("bench")
        finally:
            sys.path.remove(root)

    def test_device_unavailable_emits_host_rows_json(self, monkeypatch,
                                                     capsys, tmp_path):
        import json

        bench = self._import_bench()
        monkeypatch.setattr(bench, "devices_or_none", lambda: None)
        monkeypatch.setattr(bench, "PERF_PROBE_PATH", "/nonexistent.json")
        monkeypatch.setattr(bench, "BENCH_LIVE_PATH",
                            str(tmp_path / "live.json"))
        monkeypatch.setattr(bench, "BENCH_FULL_PATH",
                            str(tmp_path / "full.json"))
        monkeypatch.setattr(
            bench, "bench_decode",
            lambda b: b.row("native decode clips/s (host)", 1.0, "clips/s"))
        bench.main()
        out = json.loads(capsys.readouterr().out.strip())
        assert out["device_unavailable"] is True
        assert out["metric"] == "native decode clips/s (host)"
        # the printed line is the COMPACT contract (VERDICT r3 next #1):
        # rows live in BENCH_FULL.json, not on the line
        assert "rows" not in out
        assert out["full_summary_in"] == "BENCH_FULL.json"
        full = json.loads((tmp_path / "full.json").read_text())
        assert full["rows"] and {"metric", "value", "unit"} <= set(
            full["rows"][0])
        # a dead-relay run must never write BENCH_LIVE (it would overwrite a
        # good live row set with host-only rows)
        assert not (tmp_path / "live.json").exists()

    def test_main_restores_sigterm_handler(self, monkeypatch, capsys,
                                           tmp_path):
        """A SIGTERM handler left installed after main() returns would fire
        on a LATER signal to the host process (observed: pytest killed
        minutes after this suite ran bench.main) and flush a bogus summary
        over the repo's REAL artifacts — monkeypatched paths are restored
        by then."""
        import signal as _signal

        bench = self._import_bench()
        monkeypatch.setattr(bench, "devices_or_none", lambda: None)
        monkeypatch.setattr(bench, "PERF_PROBE_PATH", "/nonexistent.json")
        monkeypatch.setattr(bench, "BENCH_LIVE_PATH",
                            str(tmp_path / "live.json"))
        monkeypatch.setattr(bench, "BENCH_FULL_PATH",
                            str(tmp_path / "full.json"))
        monkeypatch.setattr(
            bench, "bench_decode",
            lambda b: b.row("native decode clips/s (host)", 1.0, "clips/s"))
        before = _signal.getsignal(_signal.SIGTERM)
        bench.main()
        capsys.readouterr()
        assert _signal.getsignal(_signal.SIGTERM) is before

    def test_device_unavailable_replays_cached_device_rows(self, monkeypatch,
                                                           capsys, tmp_path):
        """A relay outage at bench time still yields the last MEASURED
        device numbers — every cached row marked as such, the headline the
        cached ENS row (not a host decode row)."""
        import json

        bench = self._import_bench()
        probe = {
            "exec_ens16_bf16_chunk256": {
                "steps_per_s_512norm": 3.069, "final_cost": 1330.1,
                "executed": True, "platform": "tpu"},
            "exec_ens16_f32_chunk128": {
                "steps_per_s_512norm": 2.11, "final_cost": 1331.0,
                "executed": True, "platform": "tpu"},
            "exec_ens16_f32_chunk64": {  # slower sweep point: not headline
                "steps_per_s_512norm": 1.506, "final_cost": 1092.2,
                "executed": True, "platform": "tpu"},
            "exec_aens16_bf16_chunk256": {
                "steps_per_s_512norm": 1.518, "final_cost": 44.4,
                "executed": True, "platform": "tpu"},
            "hbm_ens16_f32": {"fits_16gb": False},  # non-exec: ignored
        }
        p = tmp_path / "probe.json"
        p.write_text(json.dumps(probe))
        monkeypatch.setattr(bench, "devices_or_none", lambda: None)
        monkeypatch.setattr(bench, "PERF_PROBE_PATH", str(p))
        monkeypatch.setattr(bench, "BENCH_LIVE_PATH",
                            str(tmp_path / "live.json"))
        monkeypatch.setattr(bench, "BENCH_FULL_PATH",
                            str(tmp_path / "full.json"))
        monkeypatch.setattr(
            bench, "bench_decode",
            lambda b: b.row("native decode clips/s (host)", 1.0, "clips/s"))
        bench.main()
        out = json.loads(capsys.readouterr().out.strip())
        assert out["device_unavailable"] is True
        # headline = the FASTEST f32 ENS row (the numerically validated
        # dtype wins over the faster bf16 row; the slower f32 chunk sweep
        # point loses to the production chunk within the dtype)
        assert "ens16_f32_chunk128" in out["metric"]
        assert "[cached]" in out["metric"]
        assert out["value"] == 2.11 and out["vs_baseline"] > 1
        full = json.loads((tmp_path / "full.json").read_text())
        cached = [r for r in full["rows"] if r.get("cached_from")]
        assert len(cached) == 4  # the hbm_ entry must not leak in
        assert out["rows_cached"] == 4

    def test_device_unavailable_prefers_bench_live_rows(self, monkeypatch,
                                                        capsys, tmp_path):
        """When a previous live run persisted BENCH_LIVE.json, the dead-relay
        path replays its full row set (provenance-marked) instead of the
        thinner PERF_PROBE sweep; headline = fastest cached f32 ENS row."""
        import json

        bench = self._import_bench()
        live = {"git_rev": "abc123def456", "rows": [
            {"metric": "ENS-I2V attack steps/sec/chip (f32, 4-surrogate "
                       "ensemble, B=16, 512-frame-normalized)",
             "value": 2.11, "unit": "steps/s/chip", "vs_baseline": 39.81},
            {"metric": "ENS-I2V attack steps/sec/chip (bf16, 4-surrogate "
                       "ensemble, B=16, 512-frame-normalized)",
             "value": 3.07, "unit": "steps/s/chip", "vs_baseline": 57.92},
            {"metric": "transfer-eval throughput (bf16, I3D-NL R50, B=16)",
             "value": 33.0, "unit": "clips/s/chip"},
        ]}
        p = tmp_path / "live.json"
        p.write_text(json.dumps(live))
        probe = tmp_path / "probe.json"  # present but must NOT be used
        probe.write_text(json.dumps({"exec_ens16_f32_chunk64": {
            "steps_per_s_512norm": 1.506, "executed": True}}))
        monkeypatch.setattr(bench, "devices_or_none", lambda: None)
        monkeypatch.setattr(bench, "BENCH_LIVE_PATH", str(p))
        monkeypatch.setattr(bench, "PERF_PROBE_PATH", str(probe))
        monkeypatch.setattr(bench, "BENCH_FULL_PATH",
                            str(tmp_path / "full.json"))
        monkeypatch.setattr(
            bench, "bench_decode",
            lambda b: b.row("native decode clips/s (host)", 1.0, "clips/s"))
        bench.main()
        out = json.loads(capsys.readouterr().out.strip())
        assert out["device_unavailable"] is True
        assert out["metric"].startswith("[cached] ENS-I2V") \
            and "(f32" in out["metric"]
        assert out["value"] == 2.11 and out["vs_baseline"] == 39.81
        full = json.loads((tmp_path / "full.json").read_text())
        cached = [r for r in full["rows"] if r.get("cached_from")]
        assert len(cached) == 3
        assert all(r["cached_from"].startswith("BENCH_LIVE.json")
                   and "abc123def" in r["cached_from"] for r in cached)
        assert not any("chunk64" in r["metric"] for r in full["rows"])

    def test_device_unavailable_and_no_host_rows_is_an_error(self,
                                                             monkeypatch):
        import pytest as _pytest

        bench = self._import_bench()
        monkeypatch.setattr(bench, "devices_or_none", lambda: None)
        monkeypatch.setattr(bench, "PERF_PROBE_PATH", "/nonexistent.json")
        monkeypatch.setattr(bench, "BENCH_LIVE_PATH", "/nonexistent2.json")
        monkeypatch.setattr(bench, "bench_decode", lambda b: None)
        with _pytest.raises(SystemExit, match="no rows"):
            bench.main()

    def test_rows_persist_incrementally_and_budget_skips_replay(
            self, monkeypatch, capsys, tmp_path):
        """VERDICT r2 weak #1: (a) every measured row lands in BENCH_LIVE
        the moment it is measured — a mid-run kill must not lose earlier
        rows; (b) a section skipped for budget emits an explicit
        ``skipped: budget`` row replaying the last live measurement; (c)
        the final summary still prints with the skip rows included."""
        import json

        bench = self._import_bench()
        live_path = tmp_path / "live.json"
        prev = {"git_rev": "prevrev123", "rows": [
            {"metric": "TemporalTranslation attack steps/sec/chip (f32, "
                       "I3D-NL R50, B=1, 15-variant fused fan-out)",
             "value": 9.9, "unit": "steps/s/chip"},
        ]}
        live_path.write_text(json.dumps(prev))
        monkeypatch.setattr(bench, "BENCH_LIVE_PATH", str(live_path))
        monkeypatch.setattr(bench, "BENCH_FULL_PATH",
                            str(tmp_path / "full.json"))
        monkeypatch.setattr(bench, "devices_or_none", lambda: ["fake-dev"])
        monkeypatch.setattr(bench, "bench_decode", lambda b: None)

        mid_run_live = {}

        def fake_ens_f32(b):
            b.row("ENS-I2V attack steps/sec/chip (f32, 4-surrogate "
                  "ensemble, B=16, 512-frame-normalized)", 2.2,
                  "steps/s/chip", 0.053)
            # capture what a kill right after this row would leave on disk
            mid_run_live.update(json.loads(live_path.read_text()))

        monkeypatch.setattr(bench, "bench_ens_f32", fake_ens_f32)
        # every other section: exhaust the budget so they all skip
        for name in ["bench_ens_bf16", "bench_aens", "bench_i2v",
                     "bench_whitebox", "bench_tt", "bench_eval",
                     "bench_offline_eval", "bench_e2e", "bench_multigrid",
                     "bench_ens_b24"]:
            monkeypatch.setattr(bench, name, lambda b: None)
        monkeypatch.setattr(bench, "BUDGET_S", 10 ** 9)
        bench.main()

        def by_metric(doc, prefix):
            return next(r for r in doc["rows"]
                        if r["metric"].startswith(prefix))

        # (a) the row was on disk before main() returned the summary
        assert by_metric(mid_run_live, "ENS-I2V attack")["value"] == 2.2
        assert mid_run_live["complete"] is False
        out = json.loads(capsys.readouterr().out.strip())
        assert out["metric"].startswith("ENS-I2V attack") \
            and out["value"] == 2.2
        final = json.loads(live_path.read_text())
        assert final["complete"] is True
        # cached/skip rows never launder into the live row set
        assert all("cached_from" not in r and "skipped" not in r
                   for r in final["rows"])
        # (d) previous live rows whose section didn't run are carried
        # forward (a short-budget run must not overwrite a complete
        # BENCH_LIVE with a partial one) — with per-row rev provenance
        carried = by_metric(final, "TemporalTranslation")
        assert carried["value"] == 9.9 and carried["rev"] == "prevrev123"
        assert by_metric(final, "ENS-I2V attack")["rev"] == final["git_rev"]

    def test_budget_skip_replays_previous_live_rows(self, monkeypatch,
                                                    capsys, tmp_path):
        import json

        bench = self._import_bench()
        live_path = tmp_path / "live.json"
        prev = {"git_rev": "prevrev123", "rows": [
            {"metric": "ENS-I2V attack steps/sec/chip (f32, 4-surrogate "
                       "ensemble, B=16, 512-frame-normalized)",
             "value": 2.11, "unit": "steps/s/chip", "vs_baseline": 39.8},
            {"metric": "TemporalTranslation attack steps/sec/chip (f32, "
                       "I3D-NL R50, B=1, 15-variant fused fan-out)",
             "value": 9.9, "unit": "steps/s/chip"},
        ]}
        live_path.write_text(json.dumps(prev))
        monkeypatch.setattr(bench, "BENCH_LIVE_PATH", str(live_path))
        monkeypatch.setattr(bench, "devices_or_none", lambda: ["fake-dev"])
        monkeypatch.setattr(bench, "bench_decode", lambda b: None)
        for name in ["bench_ens_f32", "bench_ens_bf16", "bench_aens",
                     "bench_i2v", "bench_whitebox", "bench_tt", "bench_eval",
                     "bench_offline_eval", "bench_e2e", "bench_multigrid",
                     "bench_ens_b24"]:
            monkeypatch.setattr(bench, name, lambda b: None)
        monkeypatch.setattr(bench, "BENCH_FULL_PATH",
                            str(tmp_path / "full.json"))
        monkeypatch.setattr(bench, "BUDGET_S", -1.0)  # already exhausted
        bench.main()
        out = json.loads(capsys.readouterr().out.strip())
        rows = json.loads((tmp_path / "full.json").read_text())["rows"]
        skipped = [r for r in rows if r.get("skipped") in ("budget", "tier")]
        assert skipped, "skipped sections must emit skip rows"
        replayed = [r for r in skipped if "value" in r]
        # both prev rows replay (under their sections), marked cached —
        # the CORE section (ENS) as a budget casualty, the EXTENDED section
        # (TT) as replay-by-design under the default core tier
        assert {r["metric"] for r in replayed} == {r["metric"]
                                                   for r in prev["rows"]}
        ens = next(r for r in replayed if "ENS-I2V" in r["metric"])
        tt = next(r for r in replayed if "TemporalTranslation" in r["metric"])
        assert ens["skipped"] == "budget"
        assert "budget exhausted" in ens["cached_from"]
        assert tt["skipped"] == "tier"
        assert "replay-by-design" in tt["cached_from"]
        # tier accounting surfaces in the compact summary
        assert out["tier"] == "core"
        assert out["rows_replay_by_design"] >= 1
        assert out["rows_core_total"] == len(rows) - \
            out["rows_replay_by_design"]
        # the summary headline falls back to the cached f32 ENS row
        assert out["value"] == 2.11
        # nothing fresh was measured → BENCH_LIVE must keep the previous set
        assert json.loads(live_path.read_text())["git_rev"] == "prevrev123"

    def test_skip_section_dedups_fresh_rows_and_marks_reason(
            self, monkeypatch, tmp_path):
        """SIGTERM mid-section: the flush replays BENCH_LIVE rows for every
        unreached section, but must not duplicate a metric the in-flight
        section already measured fresh this run."""
        import json

        bench = self._import_bench()
        live_path = tmp_path / "live.json"
        live_path.write_text(json.dumps({"git_rev": "prevrev123", "rows": [
            {"metric": "ENS-I2V attack steps/sec/chip (f32, 4-surrogate "
                       "ensemble, B=16, 512-frame-normalized)",
             "value": 2.11, "unit": "steps/s/chip"},
            {"metric": "TemporalTranslation attack steps/sec/chip (f32, "
                       "I3D-NL R50, B=1, 15-variant fused fan-out)",
             "value": 9.9, "unit": "steps/s/chip"},
        ]}))
        monkeypatch.setattr(bench, "BENCH_LIVE_PATH", str(live_path))
        b = bench.Bench()
        b.device_up = True
        # the in-flight section already measured this metric fresh
        b.rows.append({"metric": "ENS-I2V attack steps/sec/chip (f32, "
                                 "4-surrogate ensemble, B=16, "
                                 "512-frame-normalized)",
                       "value": 2.2, "unit": "steps/s/chip"})
        b.skip_section("ens_f32", ["ENS-I2V attack steps/sec/chip (f32"],
                       reason="sigterm")
        b.skip_section("tt", ["TemporalTranslation"], reason="sigterm")
        ens_rows = [r for r in b.rows if r["metric"].startswith("ENS-I2V")]
        assert len(ens_rows) == 1 and ens_rows[0]["value"] == 2.2
        tt = [r for r in b.rows if r["metric"].startswith("Temporal")]
        assert len(tt) == 1 and tt[0]["skipped"] == "sigterm"
        assert "prevrev12" in tt[0]["cached_from"]

    def test_watchdog_catches_raising_backend(self, monkeypatch):
        bench = self._import_bench()

        def boom():
            raise RuntimeError("UNAVAILABLE: TPU backend setup/compile error")

        monkeypatch.setattr(bench.jax, "devices", boom)
        assert bench.devices_or_none(timeout_s=5) is None


class TestStepTimerSemantics:
    """Round-2 review fixes: per-chip denominator, failed calls, partial
    batches."""

    def test_failed_call_not_counted(self):
        timer = StepTimer(steps_per_call=10, clips_per_call=4, report_every=0)
        with pytest.raises(RuntimeError):
            with timer:
                raise RuntimeError("boom")
        assert timer.calls == 0 and timer.elapsed == 0.0

    def test_variable_clips_per_call(self):
        timer = StepTimer(steps_per_call=10, clips_per_call=16,
                          report_every=0)
        with timer:
            pass
        with timer(clips=10):  # trailing partial batch
            pass
        assert timer.clips == 26 and timer.calls == 2

    def test_n_chips_defaults_to_one(self):
        """The plain attack classes run on one device; dividing by the
        global device count would understate steps/s/chip 8x on the test
        mesh."""
        t1 = StepTimer(steps_per_call=10, clips_per_call=2, report_every=0)
        assert t1.n_chips == 1
        t8 = StepTimer(steps_per_call=10, clips_per_call=2, report_every=0,
                       n_chips=8)
        assert t8.n_chips == 8
