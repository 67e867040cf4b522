"""U-Net SID baseline (Flax, NHWC).

Rebuild of reference ``archs/unet_sid_arch.py:11-118`` (component C14):
classic 2-conv-per-stage U-Net — ``inc`` DoubleConv, per-stage
MaxPool+DoubleConv downs, a ``bottom`` DoubleConv at the lowest scale,
transposed-conv (or bilinear) ups with pad-to-match skip concats, 1x1
output conv. Plain conv+ReLU stages with bias, no normalization —
reference ``unet_sid_arch.py:16-21`` has none.

Reference defect note: the reference's **default** ``bilinear=True`` path
is structurally broken — ``bottom`` doubles channels to ``C*2``
(``unet_sid_arch.py:88-89``) but ``Up.up``'s 1x1 conv expects
``in_channels // 2`` (``:45``), so the forward raises a channel-mismatch
RuntimeError (verified by executing the reference). Only
``bilinear=False`` (ConvTranspose ups, ``factor=1``) runs. This rebuild
keeps ``bilinear=False`` graph-and-numerics compatible with the reference
(see ``tools/convert_torch_unet.py``), and implements ``bilinear=True`` as
the *repaired* intended graph: 2x bilinear resize + 1x1 channel-halving
conv in place of the ConvTranspose, same channel plan as the working path.

``norm='group'`` is an optional (non-reference) extra: GroupNorm after
each conv, useful at the SID recipe's batch size of 2. Default is
``'none'`` (reference-faithful).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lowlight_image_enhancement_tpu.ops.image_ops import max_pool_2x2

from lowlight_image_enhancement_tpu.utils.registry import ARCH_REGISTRY

Array = jax.Array


class DoubleConv(nn.Module):
    """Two conv3x3(+bias) + [optional norm] + ReLU stages
    (reference ``DoubleConv``, ``unet_sid_arch.py:11-24``)."""

    features: int
    norm: str = "none"
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
    """Encoder-decoder U-Net with skip concats (reference ``UNetSID``,
    ``unet_sid_arch.py:66-114``).

    Stage layout mirrors the reference: ``inc`` -> ``down1..downN``
    (MaxPool2 + DoubleConv) -> ``bottom`` -> ``upconv{i}`` + ``up{i}``
    (upsample, pad-to-match, concat [skip, up], DoubleConv) -> ``outc``.
    With ``bilinear=False`` the graph and parameter tree convert 1:1 from
    torch checkpoints (``tools/convert_torch_unet.py``).
    """

    in_channels: int = 3
    out_channels: int = 3
    base_channels: int = 32
    depths: Sequence[int] = (32, 64, 128, 256)
    bilinear: bool = True
    norm: str = "none"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        x = x.astype(self.dtype)
        chans = tuple(self.depths)

        h = DoubleConv(chans[0], self.norm, self.dtype, name="inc")(x)
        skips = []
        for i, c in enumerate(chans[1:], start=1):
            skips.append(h)
            h = max_pool_2x2(h)
            h = DoubleConv(c, self.norm, self.dtype, name=f"down{i}")(h)

        # extra 2-conv stage at the lowest scale (reference ``bottom``,
        # factor=1 — the working ConvTranspose graph)
        h = DoubleConv(chans[-1], self.norm, self.dtype, name="bottom")(h)

        for i, c in enumerate(reversed(chans[:-1]), start=1):
            if self.bilinear:
                n, hh, ww, cc = h.shape
                h = jax.image.resize(h, (n, hh * 2, ww * 2, cc),
                                     method="bilinear")
                h = nn.Conv(c, (1, 1), dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"upconv{i}")(h)
            else:
                h = nn.ConvTranspose(c, (2, 2), strides=(2, 2),
                                     dtype=self.dtype,
                                     param_dtype=jnp.float32,
                                     name=f"upconv{i}")(h)
            skip = skips[-i]
            # pad-to-match (odd input sizes), reference ``Up.forward``
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
