"""End-to-end integration: config -> dataset -> loader -> trainer -> steps
-> checkpoint -> resume -> validation (port of reference
``tests/test_data_pipeline_and_training.py``), fully hermetic via the
synthetic debug-SID fixtures."""

import json
import os
import pathlib

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-tier only (see pytest.ini)

from lowlight_image_enhancement_tpu.data import make_debug_sid
from lowlight_image_enhancement_tpu.training.config import dict2str, parse
from lowlight_image_enhancement_tpu.training.trainer import Trainer

CONFIG = pathlib.Path(__file__).parent.parent / "configs" / "debug" / \
    "sid_newbp_mono_debug.yml"


@pytest.fixture(scope="module")
def debug_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("debug_sid")
    make_debug_sid(str(root), n_pairs=3, size=64, ratio=10.0)
    os.environ["DEBUG_SID_ROOT"] = str(root)
    yield str(root)


class TestConfig:
    def test_parse_debug_overrides(self, debug_env, tmp_path):
        opt = parse(str(CONFIG), is_train=True, root_dir=str(tmp_path))
        # 'debug' in name flips the frequencies
        assert opt["val"]["val_freq"] == 8
        assert opt["logger"]["print_freq"] == 1
        assert opt["logger"]["save_checkpoint_freq"] == 8
        # env expansion happened
        assert debug_env in opt["datasets"]["train"]["manifest_path"]
        # derived dirs
        assert "training_states" in opt["path"]
        assert opt["datasets"]["val"]["phase"] == "val"
        assert isinstance(dict2str(opt), str)

    def test_parse_test_mode(self, debug_env, tmp_path):
        opt = parse(str(CONFIG), is_train=False, root_dir=str(tmp_path))
        assert "results_root" in opt["path"]


class TestEndToEnd:
    def test_full_training_run(self, debug_env, tmp_path):
        """16 iters on the debug config: loss decreases, checkpoints are
        written, validation metrics come back finite."""
        opt = parse(str(CONFIG), is_train=True, root_dir=str(tmp_path))
        trainer = Trainer(opt)
        losses = []

        # wrap step_fn to record losses
        orig_step = trainer.step_fn

        def recording_step(state, batch):
            state, logs = orig_step(state, batch)
            losses.append(float(logs["l_total"]))
            return state, logs

        trainer.step_fn = recording_step
        state = trainer.train()

        assert int(state.step) == 16
        assert all(np.isfinite(losses))
        # overfit trend on the tiny synthetic set
        assert np.mean(losses[-4:]) < np.mean(losses[:4])

        # checkpoints exist
        states_dir = opt["path"]["training_states"]
        models_dir = opt["path"]["models"]
        assert any(e.isdigit() for e in os.listdir(states_dir))
        assert any(e.startswith("net_g_") for e in os.listdir(models_dir))

        # validation returns the configured metrics
        results = trainer.validate()
        assert {"psnr_linear", "ssim_linear"} <= set(results)
        assert np.isfinite(results["psnr_linear"])
        # 16 steps of a width-8 net: just sanity, not quality
        assert results["psnr_linear"] > 5.0

    def test_auto_resume(self, debug_env, tmp_path):
        """A second Trainer on the same experiment dir resumes at iter 16."""
        opt = parse(str(CONFIG), is_train=True, root_dir=str(tmp_path))
        Trainer(opt).train()
        trainer2 = Trainer(opt)
        assert trainer2.start_iter == 16

    def test_tiled_inference_matches_direct(self, debug_env, tmp_path):
        """grids equivalent: tiled forward ~= direct forward on the same
        image (identical interior; overlap-averaged seams close)."""
        import jax.numpy as jnp

        from lowlight_image_enhancement_tpu.training.validation import (
            tiled_inference,
        )

        opt = parse(str(CONFIG), is_train=True, root_dir=str(tmp_path))
        trainer = Trainer(opt)
        params = trainer.state.params

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), dtype=jnp.float32)

        def forward(z):
            return trainer.eval_fn(params, z)

        direct = np.asarray(forward(x))
        tiled = np.asarray(tiled_inference(forward, x, tile_size=32,
                                           overlap_ratio=0.5))
        assert tiled.shape == direct.shape
        # tile edges see different padding context; interior agrees
        diff = np.abs(tiled - direct)
        assert np.median(diff) < 0.05
