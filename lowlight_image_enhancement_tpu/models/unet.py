"""U-Net SID baseline (Flax, NHWC).

Rebuild of reference ``archs/unet_sid_arch.py:11-118`` (component C14):
classic 2-conv-per-stage U-Net, base 32 channels, depth (32, 64, 128, 256),
bilinear-resize (default) or transposed-conv upsampling, pad-to-match skip
connections.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lowlight_image_enhancement_tpu.utils.registry import ARCH_REGISTRY

Array = jax.Array


class DoubleConv(nn.Module):
    """Two conv3x3 + norm + ReLU stages.

    Deviation from the reference (which uses BatchNorm2d): normalization is
    **GroupNorm** by default. Rationale: the SID recipe trains at batch 2,
    where BN statistics are extremely noisy, and BN's running-stat state
    complicates the pure-functional train step; GroupNorm is batch-size
    independent, state-free, and standard practice for small-batch
    restoration. ``norm='none'`` disables normalization entirely.
    """

    features: int
    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding="SAME",
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"conv{i + 1}")(x)
            if self.norm == "group":
                x = nn.GroupNorm(
                    num_groups=min(8, self.features), dtype=jnp.float32,
                    name=f"norm{i + 1}",
                )(x).astype(self.dtype)
            x = nn.relu(x)
        return x


@ARCH_REGISTRY.register(name="UNetSIDModel")
@ARCH_REGISTRY.register()
class UNetSID(nn.Module):
    """Encoder-decoder U-Net with skip concats (reference ``UNetSID``)."""

    in_channels: int = 3
    out_channels: int = 3
    base_channels: int = 32
    depths: Sequence[int] = (32, 64, 128, 256)
    bilinear: bool = True
    norm: str = "group"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        x = x.astype(self.dtype)
        chans = tuple(self.depths)

        skips = []
        h = DoubleConv(chans[0], self.norm, self.dtype, name="inc")(x)
        for i, c in enumerate(chans[1:], start=1):
            skips.append(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2))
            h = DoubleConv(c, self.norm, self.dtype, name=f"down{i}")(h)

        for i, c in enumerate(reversed(chans[:-1]), start=1):
            if self.bilinear:
                n, hh, ww, cc = h.shape
                h = jax.image.resize(h, (n, hh * 2, ww * 2, cc),
                                     method="bilinear")
            else:
                h = nn.ConvTranspose(c, (2, 2), strides=(2, 2),
                                     dtype=self.dtype,
                                     param_dtype=jnp.float32,
                                     name=f"upconv{i}")(h)
            skip = skips[-i]
            # pad-to-match (odd input sizes)
            dh = skip.shape[1] - h.shape[1]
            dw = skip.shape[2] - h.shape[2]
            if dh or dw:
                h = jnp.pad(h, ((0, 0), (dh // 2, dh - dh // 2),
                                (dw // 2, dw - dw // 2), (0, 0)))
            h = jnp.concatenate([skip, h], axis=-1)
            h = DoubleConv(c, self.norm, self.dtype, name=f"up{i}")(h)

        out = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                      param_dtype=jnp.float32, name="outc")(h)
        return out.astype(jnp.float32)
