"""NAFSSR: stereo image super-resolution NAFNet variant (Flax, NHWC).

Rebuild of reference ``archs/NAFSSR_arch.py:25-170`` (component C17;
registered in the reference but unused by SID configs): a weight-shared
NAFNet trunk applied to both stereo views, with SCAM (Stereo Cross
Attention Module) fusing information across views after each block group,
stochastic-depth DropPath on the fused branch, and a pixel-shuffle
upsampler.

Input: ``[N, H, W, 2*C]`` — the two views concatenated on channels
(matching the reference's ``cat([L, R], dim=1)`` convention, transposed
to NHWC).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from lowlight_image_enhancement_tpu.models.nafnet import (
    LayerNorm2d,
    NAFBlock,
    pixel_shuffle,
)
from lowlight_image_enhancement_tpu.utils.registry import ARCH_REGISTRY

Array = jax.Array


class SCAM(nn.Module):
    """Stereo Cross Attention Module (reference ``NAFSSR_arch.py``):
    scaled dot-product attention along the width (epipolar) axis between
    the two views, with zero-init output scales."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xl: Array, xr: Array):
        c = self.features
        scale = c**-0.5
        ql = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                     name="l_proj1")(LayerNorm2d(c, name="norm_l")(xl)
                                     .astype(self.dtype))
        qr = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                     name="r_proj1")(LayerNorm2d(c, name="norm_r")(xr)
                                     .astype(self.dtype))
        vl = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                     name="l_proj2")(xl)
        vr = nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                     name="r_proj2")(xr)

        # attention over the width axis: [n, h, w, c] x [n, h, w', c]
        attn = jnp.einsum("nhwc,nhvc->nhwv", ql, qr,
                          preferred_element_type=jnp.float32) * scale
        f_r2l = jnp.einsum(
            "nhwv,nhvc->nhwc", jax.nn.softmax(attn, axis=-1),
            vr.astype(jnp.float32), preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        f_l2r = jnp.einsum(
            "nhvw,nhvc->nhwc", jax.nn.softmax(attn, axis=-2),
            vl.astype(jnp.float32), preferred_element_type=jnp.float32,
        ).astype(self.dtype)

        beta = self.param("beta", nn.initializers.zeros, (c,))
        gamma = self.param("gamma", nn.initializers.zeros, (c,))
        return (xl + f_r2l * beta.astype(self.dtype),
                xr + f_l2r * gamma.astype(self.dtype))


class DropPath(nn.Module):
    """Stochastic depth on the residual branch (per-sample)."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, delta: Array, *, deterministic: bool = True) -> Array:
        if self.rate == 0.0 or deterministic:
            return delta
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep,
                                    (delta.shape[0], 1, 1, 1))
        return delta * mask.astype(delta.dtype) / keep


class NAFBlockSR(nn.Module):
    """NAFBlock on both views + optional SCAM fusion."""

    features: int
    fusion: bool = True
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xl: Array, xr: Array, *,
                 deterministic: bool = True):
        blk = NAFBlock(self.features, dtype=self.dtype, name="blk")
        dl = blk(xl, deterministic=deterministic) - xl
        dr = blk(xr, deterministic=deterministic) - xr
        dp = DropPath(self.drop_path, name="drop_path")
        xl = xl + dp(dl, deterministic=deterministic)
        xr = xr + dp(dr, deterministic=deterministic)
        if self.fusion:
            xl, xr = SCAM(self.features, dtype=self.dtype,
                          name="scam")(xl, xr)
        return xl, xr


@ARCH_REGISTRY.register()
class NAFSSR(nn.Module):
    """Stereo SR network (reference ``NAFSSR``): shared intro conv, a stack
    of fused NAFBlockSRs, pixel-shuffle up, global bilinear residual."""

    up_scale: int = 2
    width: int = 48
    num_blks: int = 16
    img_channel: int = 3
    fusion_from: int = -1
    fusion_to: int = 1000
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inp: Array, *, deterministic: bool = True) -> Array:
        c = self.img_channel
        xl, xr = inp[..., :c], inp[..., c:]

        intro = nn.Conv(self.width, (3, 3), padding="SAME",
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="intro")
        fl = intro(xl.astype(self.dtype))
        fr = intro(xr.astype(self.dtype))

        for i in range(self.num_blks):
            fl, fr = NAFBlockSR(
                self.width,
                fusion=(self.fusion_from <= i <= self.fusion_to),
                drop_path=self.drop_path_rate,
                dtype=self.dtype,
                name=f"blk{i}",
            )(fl, fr, deterministic=deterministic)

        up = nn.Conv(c * self.up_scale**2, (3, 3), padding="SAME",
                     dtype=self.dtype, param_dtype=jnp.float32, name="up")
        outs = []
        for f, x in ((fl, xl), (fr, xr)):
            y = pixel_shuffle(up(f), self.up_scale)
            n, h, w, _ = x.shape
            base = jax.image.resize(
                x, (n, h * self.up_scale, w * self.up_scale, c),
                method="bilinear",
            ).astype(self.dtype)
            outs.append(y + base)
        return jnp.concatenate(outs, axis=-1).astype(jnp.float32)
