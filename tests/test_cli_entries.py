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
        import cv2

        from lowlight_image_enhancement_tpu import demo as demo_cli

        rng = np.random.default_rng(0)
        inp = tmp_path / "in.png"
        out = tmp_path / "out.png"
        cv2.imwrite(str(inp),
                    rng.integers(0, 255, (48, 48, 3)).astype("uint8"))
        monkeypatch.setattr(sys, "argv", [
            "demo", "-opt",
            str(CONFIGS / "debug" / "sid_newbp_mono_debug.yml"),
            "--input_path", str(inp), "--output_path", str(out),
            "--tile", "32",
        ])
        demo_cli.main()
        assert out.exists()
        back = cv2.imread(str(out))
        assert back.shape == (48, 48, 3)


class TestSweepConfigs:
    @pytest.mark.parametrize("cfg", ["sid_newbp_mono.yml", "sid_unet.yml",
                                     "sid_swinir.yml",
                                     "sid_nafnet_w64.yml",
                                     "sid_nafnet_tpu.yml"])
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
        import cv2
        import yaml

        from lowlight_image_enhancement_tpu import demo_ssr as ssr_cli

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
        cv2.imwrite(str(lp),
                    rng.integers(0, 255, (32, 32, 3)).astype("uint8"))
        cv2.imwrite(str(rp),
                    rng.integers(0, 255, (32, 32, 3)).astype("uint8"))
        monkeypatch.setattr(sys, "argv", [
            "demo_ssr", "-opt", str(cfg_path),
            "--input_l_path", str(lp), "--input_r_path", str(rp),
            "--output_l_path", str(ol), "--output_r_path", str(orr),
        ])
        ssr_cli.main()
        assert ol.exists() and orr.exists()
        assert cv2.imread(str(ol)).shape == (32, 32, 3)
