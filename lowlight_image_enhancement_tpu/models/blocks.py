"""Generic architecture building blocks (reference ``arch_util.py`` C18).

- :class:`ResidualBlockNoBN` — conv3x3 -> ReLU -> conv3x3 + identity, with
  the reference's optional 0.1 residual-scale init convention.
- :func:`make_layer` — stack N identical blocks.
- :class:`UpsamplePixelShuffle` — x2^n / x3 upsampling via 1x1-conv +
  pixel shuffle (reference ``Upsample``).
- :func:`default_init_scale` — the "scale=0.1" initializer used by EDSR-
  style residual trunks.
"""

from __future__ import annotations

import math
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from lowlight_image_enhancement_tpu.models.nafnet import pixel_shuffle

Array = jax.Array


def default_init_scale(scale: float = 0.1) -> Callable:
    """Variance-scaling init multiplied by ``scale`` (reference
    ``default_init_weights(scale=0.1)`` for residual trunks)."""
    base = nn.initializers.kaiming_normal()

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


class ResidualBlockNoBN(nn.Module):
    """conv3x3 -> ReLU -> conv3x3, identity residual, no batch norm."""

    features: int = 64
    res_scale: float = 1.0
    small_init: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        init = (default_init_scale(0.1) if self.small_init
                else nn.initializers.kaiming_normal())
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    kernel_init=init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv1")(x)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    kernel_init=init, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(y)
        return x + y * self.res_scale


def make_layer(block_cls, num_blocks: int, name_prefix: str = "block",
               **block_kwargs):
    """Return a callable applying ``num_blocks`` instances sequentially
    (reference ``make_layer``). Use inside an ``nn.compact`` __call__."""

    def apply(x):
        for i in range(num_blocks):
            x = block_cls(name=f"{name_prefix}{i}", **block_kwargs)(x)
        return x

    return apply


class UpsamplePixelShuffle(nn.Module):
    """x ``scale`` upsampling via conv + pixel-shuffle stages; supports
    powers of two and 3 (reference ``Upsample``)."""

    scale: int
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.scale
        if scale & (scale - 1) == 0 and scale > 1:  # power of two
            for i in range(int(math.log2(scale))):
                x = nn.Conv(4 * self.features, (3, 3), padding="SAME",
                            dtype=self.dtype, param_dtype=jnp.float32,
                            name=f"conv{i}")(x)
                x = pixel_shuffle(x, 2)
        elif scale == 3:
            x = nn.Conv(9 * self.features, (3, 3), padding="SAME",
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="conv0")(x)
            x = pixel_shuffle(x, 3)
        elif scale == 1:
            pass
        else:
            raise ValueError(
                f"scale {scale} unsupported (powers of 2 and 3 only)"
            )
        return x
