"""NAFNetTPU: a space-to-depth NAFNet variant for TPU lane occupancy.

**Not a parity component** — a TPU-first offering. Profiling the standard
NAFNet at SID 512^2 (see BASELINE.md) shows the binding constraint is that
the scale-0/1 stages run at C=32/64 channels: the VPU operates on 128-wide
lanes, so three quarters of every vector are padding, and XLA inserts
layout copies between conv- and elementwise-preferred layouts.

NAFNetTPU restructures the computation: a 2x2 space-to-depth at the stem
folds spatial resolution into channels (3 -> 12 input channels, H/2 x W/2
spatial), the U-Net trunk runs with double width at half resolution
(identical FLOPs, 4x the lane occupancy at the hot scales), and a
depth-to-space at the head restores full resolution. The global residual
is preserved end-to-end in the original resolution.

Quality note: this is a *different* network from the reference NAFNet (its
receptive fields and first-scale statistics differ); use it when training
from scratch for TPU deployment, not for loading reference checkpoints.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lowlight_image_enhancement_tpu.models.nafnet import (
    NAFNet,
    pixel_shuffle,
)
from lowlight_image_enhancement_tpu.ops.image_ops import pixel_unshuffle
from lowlight_image_enhancement_tpu.utils.registry import ARCH_REGISTRY

Array = jax.Array


@ARCH_REGISTRY.register()
class NAFNetTPU(nn.Module):
    """Space-to-depth NAFNet (see module docstring).

    ``width`` is the trunk width *after* space-to-depth; to match the
    capacity profile of a standard ``NAFNet(width=W)``, use ``2*W`` here.
    """

    img_channel: int = 3
    s2d_factor: int = 2
    width: int = 64
    middle_blk_num: int = 12
    enc_blk_nums: Sequence[int] = (2, 2, 4, 8)
    dec_blk_nums: Sequence[int] = (2, 2, 2, 2)
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, inp: Array, *, deterministic: bool = True) -> Array:
        r = self.s2d_factor
        n, h, w, c = inp.shape
        # pad to a multiple of r * trunk padder, then fold space into depth
        trunk_mult = r * (2 ** len(self.enc_blk_nums))
        ph = (trunk_mult - h % trunk_mult) % trunk_mult
        pw = (trunk_mult - w % trunk_mult) % trunk_mult
        x = inp
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        padded = x
        x = pixel_unshuffle(x, r)  # [n, h/r, w/r, c*r^2]

        trunk = NAFNet(
            img_channel=c * r * r,
            width=self.width,
            middle_blk_num=self.middle_blk_num,
            enc_blk_nums=tuple(self.enc_blk_nums),
            dec_blk_nums=tuple(self.dec_blk_nums),
            dtype=self.dtype,
            name="trunk",
        )
        y = trunk(x, deterministic=deterministic)  # includes s2d residual
        y = pixel_shuffle(y, r)  # back to [n, H, W, c]
        # trunk's internal residual already carries the identity; crop pad
        return y[:, :h, :w, :].astype(jnp.float32)
