"""The NAFNet paper's "Baseline" architecture (Flax, NHWC).

Rebuild of reference ``archs/Baseline_arch.py:22-202`` (component C16): the
ablation baseline that NAFNet simplifies — same U-shape macro-structure,
but blocks use GELU activations and full (reduction) channel attention
instead of SimpleGate/SCA.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lowlight_image_enhancement_tpu.models.nafnet import (
    LayerNorm2d,
    pixel_shuffle,
)
from lowlight_image_enhancement_tpu.utils.registry import ARCH_REGISTRY

Array = jax.Array


class ChannelAttention(nn.Module):
    """SE-style channel attention: GAP -> 1x1 -> ReLU -> 1x1 -> sigmoid.

    Reduction default matches the reference ``Baseline_arch.py:32-40``
    (``dw_channel // 2``, i.e. reduction 2)."""

    features: int
    reduction: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        a = jnp.mean(x, axis=(1, 2), keepdims=True)
        a = nn.Conv(self.features // self.reduction, (1, 1),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="down")(a)
        a = nn.relu(a)
        a = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="up")(a)
        return x * nn.sigmoid(a)


class BaselineBlock(nn.Module):
    """LN -> 1x1 (c->dw) -> 3x3 dw -> GELU -> CA -> 1x1, then
    LN -> 1x1 (c->ffn) -> GELU -> 1x1; zero-init residual scales."""

    features: int
    dw_expand: int = 1
    ffn_expand: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        c = self.features
        dw = c * self.dw_expand
        conv = lambda feat, k, name, grouped=False: nn.Conv(
            features=feat, kernel_size=(k, k),
            padding="SAME" if k > 1 else "VALID",
            feature_group_count=feat if grouped else 1,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )

        inp = x
        y = LayerNorm2d(c, name="norm1")(x).astype(self.dtype)
        y = conv(dw, 1, "conv1")(y)
        y = conv(dw, 3, "conv2", grouped=True)(y)
        y = nn.gelu(y, approximate=False)
        y = ChannelAttention(dw, dtype=self.dtype, name="ca")(y)
        y = conv(c, 1, "conv3")(y)
        beta = self.param("beta", nn.initializers.zeros, (c,))
        z = inp + y * beta.astype(self.dtype)

        y = LayerNorm2d(c, name="norm2")(z).astype(self.dtype)
        y = conv(c * self.ffn_expand, 1, "conv4")(y)
        y = nn.gelu(y, approximate=False)
        y = conv(c, 1, "conv5")(y)
        gamma = self.param("gamma", nn.initializers.zeros, (c,))
        return z + y * gamma.astype(self.dtype)


@ARCH_REGISTRY.register()
class Baseline(nn.Module):
    """U-shaped Baseline network (reference ``Baseline`` class)."""

    img_channel: int = 3
    width: int = 16
    middle_blk_num: int = 1
    enc_blk_nums: Sequence[int] = ()
    dec_blk_nums: Sequence[int] = ()
    dw_expand: int = 1
    ffn_expand: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inp: Array, *, deterministic: bool = True) -> Array:
        n, h, w, _ = inp.shape
        m = 2 ** len(self.enc_blk_nums)
        ph = (m - h % m) % m
        pw = (m - w % m) % m
        if ph or pw:
            inp = jnp.pad(inp, ((0, 0), (0, ph), (0, pw), (0, 0)))
        x = inp

        conv = lambda feat, k, name, use_bias=True, strides=1: nn.Conv(
            features=feat, kernel_size=(k, k), strides=(strides, strides),
            padding="SAME" if (k > 1 and strides == 1) else "VALID",
            use_bias=use_bias, dtype=self.dtype, param_dtype=jnp.float32,
            name=name,
        )

        x = conv(self.width, 3, "intro")(x.astype(self.dtype))
        skips = []
        chan = self.width
        for si, num in enumerate(self.enc_blk_nums):
            for bi in range(num):
                x = BaselineBlock(chan, self.dw_expand, self.ffn_expand,
                                  self.dtype, name=f"enc{si}_blk{bi}")(
                    x, deterministic=deterministic)
            skips.append(x)
            x = conv(2 * chan, 2, f"down{si}", strides=2)(x)
            chan *= 2
        for bi in range(self.middle_blk_num):
            x = BaselineBlock(chan, self.dw_expand, self.ffn_expand,
                              self.dtype, name=f"mid_blk{bi}")(
                x, deterministic=deterministic)
        for si, num in enumerate(self.dec_blk_nums):
            x = conv(2 * chan, 1, f"up{si}", use_bias=False)(x)
            x = pixel_shuffle(x, 2)
            chan //= 2
            x = x + skips[-(si + 1)]
            for bi in range(num):
                x = BaselineBlock(chan, self.dw_expand, self.ffn_expand,
                                  self.dtype, name=f"dec{si}_blk{bi}")(
                    x, deterministic=deterministic)
        x = conv(self.img_channel, 3, "ending")(x)
        x = x + inp.astype(self.dtype)
        return x[:, :h, :w, :].astype(jnp.float32)
