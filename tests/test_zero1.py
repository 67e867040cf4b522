"""ZeRO-1 optimizer-state sharding (parallel/zero.py).

On the 8-device virtual CPU mesh: sharded-optimizer training must be
numerically identical to replicated training (the AdamW update is
elementwise), while each device holds only 1/8th of the moment tensors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.losses import HybridLossPlus
from lowlight_image_enhancement_tpu.models import NAFNet
from lowlight_image_enhancement_tpu.ops.psf import create_crosstalk_psf
from lowlight_image_enhancement_tpu.parallel import (
    create_mesh, shard_batch, zero1_device_put, zero1_shardings)
from lowlight_image_enhancement_tpu.training.train_step import (
    create_train_state, make_optimizer, make_train_step, put_replicated)


def _setup():
    net = NAFNet(img_channel=3, width=8, middle_blk_num=1,
                 enc_blk_nums=(1,), dec_blk_nums=(1,))
    loss = HybridLossPlus(
        use_perc=False, use_deltaE=False, use_ssim=False, use_phys=True,
        physics_psf_module=create_crosstalk_psf("mono", "P2"))
    tx = make_optimizer(1e-3)
    state = create_train_state(net, tx, jax.random.PRNGKey(0),
                               jnp.zeros((1, 16, 16, 3)), loss=loss)
    rng = np.random.default_rng(3)
    n, s = 8, 16
    short = rng.uniform(0, 0.2, (n, s, s, 3)).astype(np.float32)
    lq = np.clip(short * 5.0, 0, 1).astype(np.float32)
    gt = np.clip(lq + 0.02, 0, 1).astype(np.float32)
    batch = {"lq": lq, "gt": gt, "short_raw": short, "long_raw": gt,
             "short_obs": short,
             "expo_ratio": np.full((n,), 5.0, np.float32)}
    return net, loss, tx, state, batch


class TestZero1:
    def test_sharding_specs(self):
        mesh = create_mesh()
        _, _, _, state, _ = _setup()
        sh = zero1_shardings(state, mesh)
        # params replicated
        leaf = jax.tree_util.tree_leaves(sh.params)[0]
        assert leaf.spec == jax.sharding.PartitionSpec()
        # at least one moment leaf sharded over the mesh axis
        specs = [s.spec for s in jax.tree_util.tree_leaves(sh.opt_state)]
        assert any("data" in tuple(sp) for sp in specs if len(sp))

    @pytest.mark.slow
    def test_matches_replicated_training_and_shards_memory(self):
        mesh = create_mesh()
        n = mesh.devices.size
        assert n == 8  # conftest virtual mesh
        net, loss, tx, state0, batch = _setup()

        # --- replicated baseline ---
        rep_state = put_replicated(state0, mesh)
        step = make_train_step(net, loss, tx, donate=False)
        sb = shard_batch(batch, mesh)
        for _ in range(3):
            rep_state, _ = step(rep_state, sb)

        # --- ZeRO-1 ---
        z_state, shardings = zero1_device_put(state0, mesh)
        z_step = make_train_step(net, loss, tx, donate=False,
                                 state_shardings=shardings)
        for _ in range(3):
            z_state, _ = z_step(z_state, sb)

        # numerics identical (elementwise optimizer math)
        for a, b in zip(jax.tree_util.tree_leaves(rep_state.params),
                        jax.tree_util.tree_leaves(z_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-6, rtol=2e-6)

        # moments are actually partitioned: some addressable shard holds
        # 1/n of its global array after the step
        found = False
        for leaf in jax.tree_util.tree_leaves(z_state.opt_state):
            if not hasattr(leaf, "addressable_shards") or leaf.ndim == 0:
                continue
            shard = leaf.addressable_shards[0].data
            if shard.size * n == leaf.size:
                found = True
                break
        assert found, "no optimizer-state leaf is sharded 1/n"


class TestZero1Trainer:
    @pytest.mark.slow
    def test_config_driven_zero1_training(self, tmp_path, monkeypatch):
        """`train.zero1: true` in the YAML shards the trainer's optimizer
        state and trains normally (debug config, 4 iters)."""
        import os
        import pathlib

        from lowlight_image_enhancement_tpu.data import make_debug_sid
        from lowlight_image_enhancement_tpu.training.config import parse
        from lowlight_image_enhancement_tpu.training.trainer import Trainer

        root = tmp_path / "debug_sid"
        make_debug_sid(str(root), n_pairs=2, size=64, ratio=10.0)
        monkeypatch.setenv("DEBUG_SID_ROOT", str(root))
        cfg = pathlib.Path(__file__).parent.parent / "configs" / "debug" \
            / "sid_newbp_mono_debug.yml"
        opt = parse(str(cfg), is_train=True, root_dir=str(tmp_path))
        opt["train"]["zero1"] = True
        opt["train"]["total_iter"] = 4
        opt["val"]["val_freq"] = 100  # skip mid-run validation
        trainer = Trainer(opt)
        assert trainer._zero1_shardings is not None
        state = trainer.train()
        n = trainer.mesh.devices.size
        assert any(
            hasattr(leaf, "addressable_shards") and leaf.ndim > 0
            and leaf.addressable_shards[0].data.size * n == leaf.size
            for leaf in jax.tree_util.tree_leaves(state.opt_state)
        ), "trainer state not ZeRO-1 sharded"
