"""Collective structure of the data-parallel train step (HLO-level).

Reference analogue: DDP's single-bucket gradient all-reduce
(``basicsr/models/base_model.py:72-81``). These tests lower the sharded
full-recipe train step on the 8-device virtual mesh and pin the
partitioner's collective structure so regressions (per-layer all-reduce
storms, accidental activation all-gathers) cannot land silently:

- plain DP: exactly ONE bulk gradient all-reduce, whose payload is
  within a few percent of the fp32 gradient bytes (XLA's all-reduce
  combiner fuses per-parameter reductions into one variadic op);
  tiny scalar all-reduces (loss logs) are allowed.
- ZeRO-1: bulk all-reduce(s) for gradients plus the parameter
  all-gather implied by 1/n-sharded first/second moments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.parallel.introspect import (
    bulk_and_scalar,
    collective_stats,
    compiled_collective_stats,
)

pytestmark = pytest.mark.slow  # compile-heavy


GEOMETRY = dict(img_channel=3, width=8, middle_blk_num=2,
                enc_blk_nums=(1, 2), dec_blk_nums=(1, 1),
                fused_blocks=False, flat_trunk=False)


def _build(accum_steps=1):
    from lowlight_image_enhancement_tpu.losses import HybridLossPlus
    from lowlight_image_enhancement_tpu.models import NAFNet
    from lowlight_image_enhancement_tpu.ops.psf import create_crosstalk_psf
    from lowlight_image_enhancement_tpu.parallel import (
        create_mesh,
        shard_batch,
    )
    from lowlight_image_enhancement_tpu.training import (
        create_train_state,
        make_optimizer,
        make_schedule,
        make_train_step,
        put_replicated,
    )

    mesh = create_mesh(8)
    net = NAFNet(**GEOMETRY)
    # full-recipe terms incl. the perceptual trunk: its (frozen) VGG
    # consts must NOT add collectives; deltaE/phys ride along
    loss = HybridLossPlus(
        use_perc=True, use_deltaE=True, use_ssim=False,
        physics_psf_module=create_crosstalk_psf("mono", "P2"),
    )
    tx = make_optimizer(make_schedule(
        {"type": "TrueCosineAnnealingLR", "T_max": 100, "eta_min": 1e-6},
        base_lr=5e-4), accum_steps=accum_steps)
    state = create_train_state(
        net, tx, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
        loss=loss)
    state = put_replicated(state, mesh)
    rng = np.random.default_rng(0)
    short = rng.uniform(0, 0.2, (8, 32, 32, 3)).astype(np.float32)
    ratio = np.full((8,), 5.0, np.float32)
    lq = np.clip(short * 5.0, 0, 1).astype(np.float32)
    gt = np.clip(lq + 0.02, 0, 1).astype(np.float32)
    batch = shard_batch({"lq": lq, "gt": gt, "short_raw": short,
                         "long_raw": gt, "short_obs": short,
                         "expo_ratio": ratio}, mesh)
    step = make_train_step(net, loss, tx, donate=False)
    return mesh, net, loss, tx, state, batch, step


def _grad_bytes(params) -> int:
    return sum(leaf.size * 4 for leaf in jax.tree_util.tree_leaves(params))


def test_dp_step_has_single_bulk_grad_allreduce():
    mesh, net, loss, tx, state, batch, step = _build()
    stats = compiled_collective_stats(step, state, batch)
    assert "all-reduce" in stats, f"no all-reduce at all: {stats}"
    split = bulk_and_scalar(stats)
    ar = split["all-reduce"]
    # At this geometry (~0.5 MB of grads, far under XLA's combine
    # threshold) the combiner fuses everything into ONE variadic op; the
    # flagship-size step legitimately splits into a few DDP-bucket-like
    # combined ops (asserted <= 8 in __graft_entry__._dryrun_impl).
    assert ar["bulk_count"] == 1, (
        f"expected ONE fused bulk gradient all-reduce, got "
        f"{ar['bulk_count']}: {stats['all-reduce']['shapes']}")
    gbytes = _grad_bytes(state.params)
    assert 0.95 * gbytes <= ar["bulk_bytes"] <= 1.10 * gbytes, (
        f"bulk all-reduce bytes {ar['bulk_bytes']} vs grad bytes {gbytes}")
    # no unexpected bulk gathers/scatters in plain DP
    for kind in ("all-gather", "reduce-scatter", "all-to-all"):
        if kind in split:
            assert split[kind]["bulk_count"] == 0, (
                f"unexpected bulk {kind}: {stats[kind]['shapes']}")


def test_zero1_step_adds_param_gather():
    from lowlight_image_enhancement_tpu.parallel import zero1_device_put
    from lowlight_image_enhancement_tpu.training import make_train_step

    mesh, net, loss, tx, state, batch, _ = _build()
    z_state, z_shardings = zero1_device_put(state, mesh)
    z_step = make_train_step(net, loss, tx, donate=False,
                             state_shardings=z_shardings)
    stats = compiled_collective_stats(z_step, z_state, batch)
    split = bulk_and_scalar(stats)
    # gradients still reduce (all-reduce or reduce-scatter form) ...
    reduced = (split.get("all-reduce", {}).get("bulk_bytes", 0)
               + split.get("reduce-scatter", {}).get("bulk_bytes", 0))
    assert reduced > 0, f"no bulk gradient reduction: {stats}"
    # ... and the 1/n-sharded moments force a bulk parameter all-gather
    assert split.get("all-gather", {}).get("bulk_count", 0) >= 1, (
        f"ZeRO-1 step shows no bulk all-gather: {stats}")


def test_collective_stats_parser():
    hlo = """
  %r = f32[1024]{0} all-reduce(f32[1024]{0} %x), replica_groups={}
  %t = (f32[256]{0}, bf16[128]{0}) all-reduce(%a, %b), channel_id=1
  %g = f32[8,4]{1,0} all-gather(f32[1,4]{1,0} %y), dimensions={0}
  %s = f32[2]{0} all-reduce-start(f32[2]{0} %z)
  %d = f32[2]{0} all-reduce-done(f32[2]{0} %s)
  %n = f32[4]{0} add(f32[4]{0} %p, f32[4]{0} %q)
"""
    stats = collective_stats(hlo)
    assert stats["all-reduce"]["count"] == 3  # two sync + one start
    assert stats["all-reduce"]["bytes"] == 1024 * 4 + 256 * 4 + 128 * 2 + 8
    assert stats["all-gather"]["count"] == 1
    assert stats["all-gather"]["bytes"] == 32 * 4
