"""NAFNet restoration backbone — Flax/NHWC, bf16-ready, MXU-friendly.

TPU-native rebuild of the reference architecture
(``NAFNet_base/basicsr/models/archs/NAFNet_arch.py:22-174``):

- :class:`SimpleGate` — channel-halved elementwise product.
- :class:`NAFBlock` — LN -> 1x1 conv (c->2c) -> 3x3 depthwise -> SimpleGate
  -> SCA (global-mean + 1x1) -> 1x1 conv, then LN -> 1x1 (c->2c) ->
  SimpleGate -> 1x1 FFN; residual scales ``beta``/``gamma`` zero-initialized.
- :class:`NAFNet` — U-shape: 3x3 intro, per-scale encoder stacks with 2x2
  stride-2 conv downs, middle stack, decoder stacks with (1x1 conv no-bias
  + PixelShuffle x2) ups and skip-adds, 3x3 ending, global input residual,
  pad-to-multiple-of-2^depth then crop.

TPU design notes:
- NHWC layout: the 1x1 convs (where the FLOPs are) lower to
  ``[N*H*W, C] x [C, C']`` matmuls on the MXU; channels-last keeps them
  layout-native with zero transposes.
- ``dtype`` controls compute/activation dtype (use ``jnp.bfloat16`` for
  training); params stay float32 (``param_dtype``).
- LayerNorm uses the analytic custom-VJP channel-LN op
  (:func:`...ops.layernorm.layer_norm_2d`), computed in fp32 regardless of
  activation dtype.
- PixelShuffle uses the torch channel ordering ``(c, r, r)`` so torch
  checkpoints can be converted 1:1.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from lowlight_image_enhancement_tpu.ops.layernorm import layer_norm_2d
from lowlight_image_enhancement_tpu.utils.registry import ARCH_REGISTRY

Array = jax.Array


class LayerNorm2d(nn.Module):
    """Per-pixel channel LayerNorm with learnable affine (fp32 math)."""

    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return layer_norm_2d(x, w, b, self.eps)


def simple_gate(x: Array) -> Array:
    """Channel-chunk(2) elementwise product (reference ``SimpleGate``)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 * x2


class SimpleGate(nn.Module):
    @nn.compact
    def __call__(self, x: Array) -> Array:
        return simple_gate(x)


def pixel_shuffle(x: Array, r: int = 2) -> Array:
    """NHWC pixel shuffle with torch channel ordering ``(c, r1, r2)``."""
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r1, w, r2, c
    return x.reshape(n, h * r, w * r, c)


# ---------------------------------------------------------------------------
# Flat-trunk ops: the whole U-shape in the fused kernels' [N, C, H*W]
# layout (channels in sublanes, flat spatial in lanes). Motivation
# (xprof, 512^2 b2 bf16 step): the NHWC intro/ending convs cost ~4.3 ms
# (C=3 pads to 128 lanes), and the per-stack NHWC<->[C,S] transposes +
# down/up convs another ~8 ms — pure layout glue around the Pallas
# blocks. These ops re-express conv/resample as shift + MXU matmul in
# the flat layout, with param names/shapes identical to the nn.Conv
# modules they replace (checkpoints interoperate).
# ---------------------------------------------------------------------------


def to_flat(x: Array) -> Array:
    """NHWC -> [N, C, H*W]."""
    n, h, w, c = x.shape
    return jnp.transpose(x, (0, 3, 1, 2)).reshape(n, c, h * w)


def to_nhwc(x: Array, h: int, w: int) -> Array:
    """[N, C, H*W] -> NHWC."""
    n, c, _ = x.shape
    return jnp.transpose(x.reshape(n, c, h, w), (0, 2, 3, 1))


def _flat_shift(x: Array, dr: int, dc: int, h: int, w: int) -> Array:
    """``out[.., r*w+col] = x[.., (r+dr)*w + (col+dc)]`` with zero fill
    outside the image (rows via the concat, columns via the mask)."""
    n, c, s = x.shape
    d = dr * w + dc
    if d > 0:
        y = jnp.concatenate(
            [x[:, :, d:], jnp.zeros((n, c, d), x.dtype)], axis=2)
    elif d < 0:
        y = jnp.concatenate(
            [jnp.zeros((n, c, -d), x.dtype), x[:, :, :d]], axis=2)
    else:
        y = x
    if dc != 0:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, s), 2) % w
        valid = (col <= w - 2) if dc > 0 else (col >= 1)
        y = jnp.where(valid, y, jnp.zeros((), x.dtype))
    return y


class _FlatConv3x3(nn.Module):
    """Full 3x3 conv (SAME, zero pad) on the flat layout.

    Params match ``nn.Conv(features, (3,3), padding='SAME')`` — HWIO
    ``kernel`` [3,3,Cin,Cout] + ``bias`` [Cout]. Two lowerings, both one
    MXU matmul + 9 cheap shifted adds, picked by which side is narrow:

    - gather (Cin <= Cout, e.g. intro 3->32): stack the 9 shifted input
      taps to [9*Cin, S], then ``[Cout, 9*Cin] @ [9*Cin, S]``.
    - scatter (Cin > Cout, e.g. ending 32->3): matmul first to per-tap
      outputs [9*Cout, S], then shift-sum the taps — avoids a [9*Cin, S]
      intermediate when Cin is wide.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, hw) -> Array:
        h, w = int(hw[0]), int(hw[1])
        n, cin, s = x.shape
        cout = self.features
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, cin, cout), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (cout,), jnp.float32)
        kd = k.astype(self.dtype)
        taps = [(kh - 1, kw_ - 1) for kh in range(3) for kw_ in range(3)]
        if cin <= cout:
            stacked = jnp.concatenate(
                [_flat_shift(x, dr, dc, h, w) for (dr, dc) in taps], axis=1)
            kmat = kd.reshape(9 * cin, cout)  # (kh, kw, cin) major->minor
            out = jnp.einsum("ko,nks->nos", kmat, stacked)
        else:
            kt = kd.transpose(0, 1, 3, 2).reshape(9 * cout, cin)
            u = jnp.einsum("kc,ncs->nks", kt, x)  # per-tap outputs
            out = None
            for t, (dr, dc) in enumerate(taps):
                term = _flat_shift(u[:, t * cout : (t + 1) * cout], dr, dc,
                                   h, w)
                out = term if out is None else out + term
        return out.astype(self.dtype) + b.astype(self.dtype)[None, :, None]


class _FlatDown(nn.Module):
    """Strided 2x2 conv (the NAFNet down) on the flat layout.

    Params match ``nn.Conv(2C, (2,2), strides=2, padding='VALID')`` —
    ``kernel`` [2,2,C,2C] + ``bias`` [2C]. Lowering: phase-split the even
    grid into the 4 taps -> [N, 4C, S/4], one MXU matmul [2C, 4C]."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, hw) -> Array:
        h, w = int(hw[0]), int(hw[1])
        n, c, s = x.shape
        cout = self.features
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (2, 2, c, cout), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (cout,), jnp.float32)
        xr = x.reshape(n, c, h // 2, 2, w // 2, 2)
        # stacked index (kh, kw, c) major->minor to match HWIO reshape;
        # lax.reshape with `dimensions` = transpose+reshape in ONE copy
        stacked = jax.lax.reshape(
            xr, (n, 4 * c, (h // 2) * (w // 2)),
            dimensions=(0, 3, 5, 1, 2, 4))
        kmat = k.astype(self.dtype).reshape(4 * c, cout)
        out = jnp.einsum("ko,nks->nos", kmat, stacked.astype(self.dtype))
        return out.astype(self.dtype) + b.astype(self.dtype)[None, :, None]


class _FlatUp(nn.Module):
    """1x1 conv (bias-free) + PixelShuffle(2) (the NAFNet up) on the flat
    layout. Params match ``nn.Conv(2C, (1,1), use_bias=False)`` —
    ``kernel`` [1,1,C,2C]. Lowering: matmul then channel->space
    interleave with torch PixelShuffle ordering ``(c, r1, r2)``."""

    features: int  # conv output channels (2C); shuffled out = features//4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, hw) -> Array:
        h, w = int(hw[0]), int(hw[1])
        n, c, s = x.shape
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, c, self.features), jnp.float32)
        kmat = k[0, 0].astype(self.dtype)  # [C, 2C]
        y = jnp.einsum("co,ncs->nos", kmat, x)  # [N, 2C, S]
        cq = self.features // 4
        yr = y.reshape(n, cq, 2, 2, h, w)
        out = jax.lax.reshape(yr, (n, cq, 4 * s),
                              dimensions=(0, 1, 4, 2, 5, 3))
        return out.astype(self.dtype)


class _DepthwiseShiftAdd(nn.Module):
    """3x3 depthwise conv lowered as 9 shift-multiply-adds.

    Same param names/shapes as ``nn.Conv(features, (3,3),
    feature_group_count=features)`` — HWIO ``kernel`` [3,3,1,C] + ``bias``
    [C] — so checkpoints interoperate with the grouped-conv lowering.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, y: Array) -> Array:
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, 1, self.features), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        taps = k[:, :, 0, :].astype(self.dtype)  # [3, 3, C]
        yp = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
        h, w = y.shape[1], y.shape[2]
        out = None
        for di in range(3):
            for dj in range(3):
                term = yp[:, di : di + h, dj : dj + w, :] * taps[di, dj]
                out = term if out is None else out + term
        return out + b.astype(self.dtype)


class NAFBlock(nn.Module):
    """The NAFNet block (reference ``NAFNet_arch.py:27-80``).

    ``tlc_window``: when set, the SCA global mean becomes a TLC windowed
    mean (test-time local statistics, reference ``local_arch.py``).
    """

    features: int
    dw_expand: int = 2
    ffn_expand: int = 2
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32
    tlc_window: Any = None  # Optional[Tuple[int, int]]
    dw_shift_add: bool = False
    """Lower the 3x3 depthwise conv as 9 shift-multiply-adds (elementwise
    VPU work) instead of a grouped convolution. Param tree is identical
    (same HWIO [3,3,1,C] kernel + bias), so checkpoints interoperate."""

    def _depthwise3x3(self, y: Array, dw: int) -> Array:
        """3x3 depthwise conv named ``conv2``, grouped-conv or shift-add."""
        if not self.dw_shift_add:
            return nn.Conv(
                features=dw, kernel_size=(3, 3), padding="SAME",
                feature_group_count=dw, dtype=self.dtype,
                param_dtype=jnp.float32, name="conv2",
            )(y)
        return _DepthwiseShiftAdd(dw, self.dtype, name="conv2")(y)

    @nn.compact
    def __call__(self, x: Array, *, deterministic: bool = True) -> Array:
        c = self.features
        dw = c * self.dw_expand
        conv = lambda feat, k, name, use_bias=True, grouped=False: nn.Conv(
            features=feat,
            kernel_size=(k, k),
            padding="SAME" if k > 1 else "VALID",
            use_bias=use_bias,
            feature_group_count=feat if grouped else 1,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )

        inp = x
        y = LayerNorm2d(c, name="norm1")(x).astype(self.dtype)
        y = conv(dw, 1, "conv1")(y)
        y = self._depthwise3x3(y, dw)  # 3x3 depthwise
        y = simple_gate(y)
        # Simplified Channel Attention: global mean -> 1x1 -> scale.
        # With TLC, the mean is windowed (per-pixel local statistics).
        if self.tlc_window is not None:
            from lowlight_image_enhancement_tpu.ops.tlc import windowed_mean

            att = windowed_mean(y, tuple(self.tlc_window))
            att = conv(dw // 2, 1, "sca_conv")(att)
        else:
            att = jnp.mean(y, axis=(1, 2), keepdims=True)
            att = conv(dw // 2, 1, "sca_conv")(att)
        y = y * att
        y = conv(c, 1, "conv3")(y)
        if self.dropout_rate > 0.0:
            y = nn.Dropout(self.dropout_rate, deterministic=deterministic)(y)
        beta = self.param("beta", nn.initializers.zeros, (c,))
        z = inp + y * beta.astype(self.dtype)

        y = LayerNorm2d(c, name="norm2")(z).astype(self.dtype)
        y = conv(c * self.ffn_expand, 1, "conv4")(y)
        y = simple_gate(y)
        y = conv(c, 1, "conv5")(y)
        if self.dropout_rate > 0.0:
            y = nn.Dropout(self.dropout_rate, deterministic=deterministic)(y)
        gamma = self.param("gamma", nn.initializers.zeros, (c,))
        return z + y * gamma.astype(self.dtype)


class _Conv2dParams(nn.Module):
    """Parameter holder matching ``nn.Conv``'s tree (kernel HWIO + bias)
    without building the conv — the fused Pallas path consumes the raw
    arrays, but checkpoints stay interchangeable with the unfused path."""

    shape: Any  # HWIO kernel shape
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       tuple(self.shape), jnp.float32)
        if not self.use_bias:
            return k, None
        b = self.param("bias", nn.initializers.zeros,
                       (self.shape[-1],), jnp.float32)
        return k, b


class _LNParams(nn.Module):
    """Parameter holder matching :class:`LayerNorm2d`'s tree."""

    features: int

    @nn.compact
    def __call__(self):
        w = self.param("weight", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return w, b


class FusedNAFBlock(nn.Module):
    """NAFBlock on the fused Pallas kernels (``ops/pallas/nafblock.py``).

    Input/output layout is ``[N, C, H*W]`` (channels in sublanes, flat
    spatial in lanes); ``hw`` carries the static spatial shape. The param
    tree is identical to :class:`NAFBlock` (same names, shapes, inits), so
    checkpoints trained either way interoperate."""

    features: int
    dw_expand: int = 2
    ffn_expand: int = 2
    dtype: Any = jnp.float32
    hw: Any = (0, 0)  # static (H, W)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from lowlight_image_enhancement_tpu.ops.pallas.nafblock import (
            fused_nafblock,
            make_block_config,
            pack_params,
        )

        c = self.features
        dw = c * self.dw_expand
        ffn = c * self.ffn_expand
        n1w, n1b = _LNParams(c, name="norm1")()
        k1, b1 = _Conv2dParams((1, 1, c, dw), name="conv1")()
        k2, b2 = _Conv2dParams((3, 3, 1, dw), name="conv2")()
        ksca, bsca = _Conv2dParams((1, 1, dw // 2, dw // 2),
                                   name="sca_conv")()
        k3, b3 = _Conv2dParams((1, 1, dw // 2, c), name="conv3")()
        n2w, n2b = _LNParams(c, name="norm2")()
        k4, b4 = _Conv2dParams((1, 1, c, ffn), name="conv4")()
        k5, b5 = _Conv2dParams((1, 1, ffn // 2, c), name="conv5")()
        beta = self.param("beta", nn.initializers.zeros, (c,))
        gamma = self.param("gamma", nn.initializers.zeros, (c,))
        p = pack_params(n1w, n1b, k1, b1, k2, b2, ksca, bsca, k3, b3,
                        n2w, n2b, k4, b4, k5, b5, beta, gamma)
        cfg = make_block_config(int(self.hw[0]), int(self.hw[1]), c,
                                self.dw_expand, self.ffn_expand)
        if cfg is None:
            raise ValueError(
                f"FusedNAFBlock: shape {self.hw} x C={c} not tileable — "
                "the caller should have fallen back to NAFBlock")
        return fused_nafblock(x.astype(self.dtype), p, cfg)


class _FlatXLANAFBlock(nn.Module):
    """NAFBlock in the flat ``[N, C, H*W]`` layout as plain XLA ops.

    For stacks the Pallas auto-dispatch leaves unfused (the C=512 middle
    stack: ``fused_blocks="auto"`` fuses C<=256), the flat trunk used to
    transpose back to NHWC and run :class:`NAFBlock` — paying two layout
    copies per stack plus XLA's grouped-conv lowering for the depthwise.
    This block stays flat instead: 1x1 convs are single 2-D MXU einsums
    over the channel axis, the 3x3 depthwise is 9 shift-FMAs
    (:func:`_flat_shift` — trivial VPU work at the middle stack's 32^2
    spatial), LN/SCA reduce over sublanes/lanes directly, and XLA fuses
    the elementwise glue. Param tree identical to :class:`NAFBlock`
    (same names, shapes, inits) — checkpoints interoperate.
    """

    features: int
    dw_expand: int = 2
    ffn_expand: int = 2
    dtype: Any = jnp.float32
    hw: Any = (0, 0)  # static (H, W)
    eps: float = 1e-6

    def _ln(self, x: Array, w: Array, b: Array) -> Array:
        """Channel LN over axis 1 of [N, C, S] (fp32 math)."""
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        xc = xf - mu
        var = jnp.mean(xc * xc, axis=1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + self.eps)
        return (y * w.astype(jnp.float32)[None, :, None]
                + b.astype(jnp.float32)[None, :, None]).astype(self.dtype)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h, w = int(self.hw[0]), int(self.hw[1])
        c = self.features
        dw = c * self.dw_expand
        ffn = c * self.ffn_expand
        cdt = self.dtype

        n1w, n1b = _LNParams(c, name="norm1")()
        k1, b1 = _Conv2dParams((1, 1, c, dw), name="conv1")()
        k2, b2 = _Conv2dParams((3, 3, 1, dw), name="conv2")()
        ksca, bsca = _Conv2dParams((1, 1, dw // 2, dw // 2),
                                   name="sca_conv")()
        k3, b3 = _Conv2dParams((1, 1, dw // 2, c), name="conv3")()
        n2w, n2b = _LNParams(c, name="norm2")()
        k4, b4 = _Conv2dParams((1, 1, c, ffn), name="conv4")()
        k5, b5 = _Conv2dParams((1, 1, ffn // 2, c), name="conv5")()
        beta = self.param("beta", nn.initializers.zeros, (c,))
        gamma = self.param("gamma", nn.initializers.zeros, (c,))

        def conv1x1(t, k, b):
            out = jnp.einsum("co,ncs->nos", k[0, 0].astype(cdt), t)
            if b is not None:
                out = out + b.astype(cdt)[None, :, None]
            return out

        inp = x
        y = self._ln(x, n1w, n1b)
        t = conv1x1(y, k1, b1)
        # 3x3 depthwise, separable-factorized (same scheme as the Pallas
        # kernel): 2 row-shift copies, 9 FMAs, 2 column shifts of the
        # partial sums — 4 shift copies instead of 8
        taps = k2[:, :, 0, :].astype(cdt)
        rows = {dr: (_flat_shift(t, dr, 0, h, w) if dr else t)
                for dr in (-1, 0, 1)}
        u = None
        for dc in (-1, 0, 1):
            s = None
            for dr in (-1, 0, 1):
                term = taps[dr + 1, dc + 1][None, :, None] * rows[dr]
                s = term if s is None else s + term
            if dc:
                s = _flat_shift(s, 0, dc, h, w)
            u = s if u is None else u + s
        u = u + b2.astype(cdt)[None, :, None]
        g = u[:, : dw // 2] * u[:, dw // 2:]          # SimpleGate
        att = jnp.mean(g.astype(jnp.float32), axis=2).astype(cdt)  # [N, C]
        att = att @ ksca[0, 0].astype(cdt) + bsca.astype(cdt)
        y = g * att[:, :, None]
        y = conv1x1(y, k3, b3)
        z = inp + y * beta.astype(cdt)[None, :, None]

        y = self._ln(z, n2w, n2b)
        y = conv1x1(y, k4, b4)
        y = y[:, : ffn // 2] * y[:, ffn // 2:]
        y = conv1x1(y, k5, b5)
        return z + y * gamma.astype(cdt)[None, :, None]


class _ScanBody(nn.Module):
    """scan body: ``(carry, _) -> (carry, None)`` around one NAFBlock."""

    features: int
    dw_expand: int
    ffn_expand: int
    dropout_rate: float
    dtype: Any
    tlc_window: Any
    deterministic: bool
    dw_shift_add: bool = False
    fused_hw: Any = None  # static (H, W) -> use FusedNAFBlock

    @nn.compact
    def __call__(self, carry, _):
        if self.fused_hw is not None:
            y = FusedNAFBlock(
                self.features, self.dw_expand, self.ffn_expand,
                self.dtype, self.fused_hw, name="blk",
            )(carry)
            return y, None
        y = NAFBlock(
            self.features, self.dw_expand, self.ffn_expand,
            self.dropout_rate, self.dtype, self.tlc_window,
            self.dw_shift_add, name="blk",
        )(carry, deterministic=self.deterministic)
        return y, None


class _ScanNAFBlocks(nn.Module):
    """``num`` identical NAFBlocks as one ``lax.scan`` over stacked params."""

    features: int
    num: int
    dw_expand: int
    ffn_expand: int
    dropout_rate: float
    dtype: Any
    tlc_window: Any
    deterministic: bool
    dw_shift_add: bool = False
    fused_hw: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scan = nn.scan(
            _ScanBody,
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            length=self.num,
        )
        y, _ = scan(
            self.features, self.dw_expand, self.ffn_expand,
            self.dropout_rate, self.dtype, self.tlc_window,
            self.deterministic, self.dw_shift_add, self.fused_hw,
            name="scan",
        )(x, None)
        return y


@ARCH_REGISTRY.register()
class NAFNet(nn.Module):
    """U-shaped NAFNet (reference ``NAFNet_arch.py:83-162``).

    SID config: ``width=32, enc_blk_nums=(2,2,4,8), middle_blk_num=12,
    dec_blk_nums=(2,2,2,2)`` — 36 NAFBlocks over 4 scales.
    """

    img_channel: int = 3
    width: int = 16
    middle_blk_num: int = 1
    enc_blk_nums: Sequence[int] = ()
    dec_blk_nums: Sequence[int] = ()
    dw_expand: int = 2
    ffn_expand: int = 2
    dropout_rate: float = 0.0
    dtype: Any = jnp.float32
    tlc_window: Any = None  # Optional[Tuple[int, int]] — TLC local SCA
    scan_blocks: bool = False
    """Roll same-shape block stacks into ``jax.lax.scan`` over stacked
    params. Compiler-friendly control flow: the SID config has 36 NAFBlocks
    — unrolled they produce a huge HLO (multi-minute XLA compiles at 512^2);
    scanned, each stage compiles once. Param layout changes from
    ``enc{i}_blk{j}/...`` to ``enc{i}_blks/...`` with a leading stacked
    axis (see ``stack_block_params`` for converting unrolled checkpoints)."""
    remat_blocks: bool = False
    """Apply ``jax.checkpoint`` to every NAFBlock: the backward recomputes
    block internals from the block input instead of reloading saved
    intermediates. Measured on v5e at SID 512^2: 216 ms/step vs 137 —
    the recompute is itself bandwidth-bound here, so keep False unless
    memory-limited (e.g. much larger batches/crops)."""
    dw_shift_add: bool = False
    """Lower NAFBlock 3x3 depthwise convs as shift-multiply-adds (see
    ``_DepthwiseShiftAdd``); param-tree identical to the grouped conv.
    Measured on v5e at SID 512^2: 202 ms/step vs 137 ms/step for XLA's
    grouped-conv lowering — keep False; the option exists for other
    chip generations / channel widths."""
    fused_blocks: Any = "auto"
    """Run NAFBlocks on the fused Pallas kernels
    (``ops/pallas/nafblock.py``): channels-in-sublanes layout, whole block
    in 2 fwd + 2 bwd kernels. ``True`` fuses every eligible stack; an int
    fuses only stacks with ``channels <= fused_blocks``; ``"auto"``
    (default) fuses ``channels <= 256`` on TPU and nothing elsewhere —
    measured on v5e at SID 512^2 b2 bf16 full-hybrid (tools/
    bench_fused_sweep.py): C<=128 43.2 ms/step, C<=256 **39.7** (winner),
    C<=512 40.5 — even with the 128 lanes full, fusing the C=256 stacks
    still saves HBM round trips, but the C=512 bottleneck loses to XLA's
    native layout. Falls back per-stack
    when the shape is untileable, dropout is active, or TLC is requested.
    Param tree is unchanged — checkpoints interoperate, and the fused
    path composes with sharded jit (DP mesh) and ``scan_blocks``."""

    flat_trunk: Any = "auto"
    """Run the WHOLE U-shape in the fused kernels' flat ``[N, C, H*W]``
    layout: intro/ending become shift+MXU-matmul ops (``_FlatConv3x3``),
    down/up become phase-split/interleave matmuls, and the per-stack
    NHWC↔flat transposes disappear — xprof showed that glue at ~12 ms of
    the 40 ms step (NHWC C=3 convs pad 3→128 lanes). ``"auto"`` enables
    it exactly when the fused-block path is active (TPU, fused_blocks,
    no dropout/TLC); ``True`` forces it (any backend — used by the
    CPU parity tests); ``False`` keeps the reference NHWC graph. Param
    tree is identical in both modes."""

    @property
    def padder_size(self) -> int:
        return 2 ** len(self.enc_blk_nums)

    def _flat_active(self) -> bool:
        if not self.flat_trunk:
            return False
        if self.dropout_rate > 0.0 or self.tlc_window is not None:
            return False
        if self.flat_trunk == "auto":
            import os

            if os.environ.get("LLIE_DISABLE_PALLAS"):
                return False
            return (jax.default_backend() == "tpu"
                    and bool(self.fused_blocks))
        return True

    def _fused_hw(self, chan, h, w):
        """(H, W) when this stack should use the fused kernels, else None."""
        import os

        if not self.fused_blocks or os.environ.get("LLIE_DISABLE_PALLAS"):
            return None
        if self.dropout_rate > 0.0 or self.tlc_window is not None:
            return None
        if self.fused_blocks == "auto":
            if jax.default_backend() != "tpu" or chan > 256:
                return None
        elif self.fused_blocks is not True and chan > int(self.fused_blocks):
            return None
        from lowlight_image_enhancement_tpu.ops.pallas.nafblock import (
            make_block_config,
        )

        cfg = make_block_config(int(h), int(w), chan, self.dw_expand,
                                self.ffn_expand)
        return None if cfg is None else (int(h), int(w))

    def _fused_stack(self, xt, num, chan, name, fused_hw, deterministic):
        """``num`` FusedNAFBlocks on flat ``[N, C, S]`` input."""
        if self.scan_blocks:
            return _ScanNAFBlocks(
                features=chan, num=num, dw_expand=self.dw_expand,
                ffn_expand=self.ffn_expand, dropout_rate=0.0,
                dtype=self.dtype, tlc_window=None,
                deterministic=deterministic, fused_hw=fused_hw,
                name=f"{name}_blks",
            )(xt)
        for bi in range(num):
            xt = FusedNAFBlock(
                chan, self.dw_expand, self.ffn_expand,
                self.dtype, fused_hw, name=f"{name}_blk{bi}",
            )(xt)
        return xt

    def _unfused_stack(self, x, num, chan, name, deterministic):
        """``num`` NAFBlocks on NHWC input (unrolled or scanned)."""
        block_cls = (nn.remat(NAFBlock, static_argnums=())
                     if self.remat_blocks else NAFBlock)
        if not self.scan_blocks:
            for bi in range(num):
                x = block_cls(
                    chan, self.dw_expand, self.ffn_expand,
                    self.dropout_rate, self.dtype, self.tlc_window,
                    self.dw_shift_add,
                    name=f"{name}_blk{bi}",
                )(x, deterministic=deterministic)
            return x
        return _ScanNAFBlocks(
            features=chan,
            num=num,
            dw_expand=self.dw_expand,
            ffn_expand=self.ffn_expand,
            dropout_rate=self.dropout_rate,
            dtype=self.dtype,
            tlc_window=self.tlc_window,
            deterministic=deterministic,
            dw_shift_add=self.dw_shift_add,
            name=f"{name}_blks",
        )(x)

    def _block_stack(self, x, num, chan, name, deterministic,
                     flat_hw=None):
        """Run ``num`` NAFBlocks. ``flat_hw=None``: NHWC in/out (fused
        stacks transpose to flat internally). ``flat_hw=(H, W)``: flat
        ``[N, C, S]`` in/out (unfused fallbacks transpose to NHWC
        locally)."""
        if flat_hw is not None:
            fused_hw = self._fused_hw(chan, flat_hw[0], flat_hw[1])
            if fused_hw is not None:
                return self._fused_stack(x, num, chan, name, fused_hw,
                                         deterministic)
            if not self.scan_blocks:
                # stay flat: XLA-op NAFBlocks (no NHWC round trip, no
                # grouped-conv depthwise) — see _FlatXLANAFBlock
                for bi in range(num):
                    x = _FlatXLANAFBlock(
                        chan, self.dw_expand, self.ffn_expand,
                        self.dtype, flat_hw, name=f"{name}_blk{bi}",
                    )(x)
                return x
            xh = to_nhwc(x, flat_hw[0], flat_hw[1])
            xh = self._unfused_stack(xh, num, chan, name, deterministic)
            return to_flat(xh)
        fused_hw = self._fused_hw(chan, x.shape[1], x.shape[2])
        if fused_hw is not None:
            n_, h_, w_, c_ = x.shape
            xt = to_flat(x.astype(self.dtype))
            xt = self._fused_stack(xt, num, chan, name, fused_hw,
                                   deterministic)
            return to_nhwc(xt, h_, w_)
        return self._unfused_stack(x, num, chan, name, deterministic)

    @nn.compact
    def __call__(self, inp: Array, *, deterministic: bool = True) -> Array:
        n, h, w, c_in = inp.shape
        inp = self._pad_to_multiple(inp)  # padded input is also the residual
        if self._flat_active():
            return self._call_flat(inp, h, w, deterministic)
        x = inp

        conv = lambda feat, k, name, use_bias=True, strides=1: nn.Conv(
            features=feat,
            kernel_size=(k, k),
            strides=(strides, strides),
            padding="SAME" if (k > 1 and strides == 1) else "VALID",
            use_bias=use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )

        x = conv(self.width, 3, "intro")(x.astype(self.dtype))

        skips = []
        chan = self.width
        for si, num in enumerate(self.enc_blk_nums):
            x = self._block_stack(x, num, chan, f"enc{si}", deterministic)
            skips.append(x)
            x = conv(2 * chan, 2, f"down{si}", strides=2)(x)
            chan *= 2

        x = self._block_stack(x, self.middle_blk_num, chan, "mid",
                              deterministic)

        for si, num in enumerate(self.dec_blk_nums):
            x = conv(2 * chan, 1, f"up{si}", use_bias=False)(x)
            x = pixel_shuffle(x, 2)
            chan //= 2
            x = x + skips[-(si + 1)]
            x = self._block_stack(x, num, chan, f"dec{si}", deterministic)

        x = conv(self.img_channel, 3, "ending")(x)
        x = x + inp.astype(self.dtype)
        return x[:, :h, :w, :].astype(jnp.float32)

    def _call_flat(self, inp: Array, h0: int, w0: int,
                   deterministic: bool) -> Array:
        """The flat-trunk forward (see ``flat_trunk``). Same graph as the
        NHWC path, same params — only the layout and the conv lowerings
        differ; parity is tested in ``tests/test_flat_trunk.py``."""
        n, hp, wp, _ = inp.shape
        xf = to_flat(inp.astype(self.dtype))  # [N, C_in, S]
        x = _FlatConv3x3(self.width, self.dtype, name="intro")(xf, (hp, wp))

        skips = []
        chan, hh, ww = self.width, hp, wp
        for si, num in enumerate(self.enc_blk_nums):
            x = self._block_stack(x, num, chan, f"enc{si}", deterministic,
                                  flat_hw=(hh, ww))
            skips.append(x)
            x = _FlatDown(2 * chan, self.dtype, name=f"down{si}")(
                x, (hh, ww))
            chan *= 2
            hh //= 2
            ww //= 2

        x = self._block_stack(x, self.middle_blk_num, chan, "mid",
                              deterministic, flat_hw=(hh, ww))

        for si, num in enumerate(self.dec_blk_nums):
            x = _FlatUp(2 * chan, self.dtype, name=f"up{si}")(x, (hh, ww))
            chan //= 2
            hh *= 2
            ww *= 2
            x = x + skips[-(si + 1)]
            x = self._block_stack(x, num, chan, f"dec{si}", deterministic,
                                  flat_hw=(hh, ww))

        x = _FlatConv3x3(self.img_channel, self.dtype, name="ending")(
            x, (hh, ww))
        x = x + xf
        out = to_nhwc(x, hp, wp)
        return out[:, :h0, :w0, :].astype(jnp.float32)

    def _pad_to_multiple(self, x: Array) -> Array:
        m = self.padder_size
        h, w = x.shape[1], x.shape[2]
        ph = (m - h % m) % m
        pw = (m - w % m) % m
        if ph == 0 and pw == 0:
            return x
        return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))


def stack_block_params(params):
    """Convert an **unrolled** NAFNet param tree (``enc0_blk0`` ...) into
    the **scanned** layout (``enc0_blks/scan/blk`` with a stacked leading
    axis), so checkpoints trained either way interoperate."""
    import re

    import jax

    out = {}
    groups: dict = {}
    for key, sub in params.items():
        m = re.fullmatch(r"(enc\d+|dec\d+|mid)_blk(\d+)", key)
        if not m:
            out[key] = sub
            continue
        groups.setdefault(m.group(1), {})[int(m.group(2))] = sub
    for stage, blocks in groups.items():
        ordered = [blocks[i] for i in range(len(blocks))]
        stacked = jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves), *ordered
        )
        out[f"{stage}_blks"] = {"scan": {"blk": stacked}}
    return out


def unstack_block_params(params):
    """Inverse of :func:`stack_block_params`."""
    import jax

    out = {}
    for key, sub in params.items():
        if not key.endswith("_blks"):
            out[key] = sub
            continue
        stage = key[: -len("_blks")]
        stacked = sub["scan"]["blk"]
        num = jax.tree_util.tree_leaves(stacked)[0].shape[0]
        for i in range(num):
            out[f"{stage}_blk{i}"] = jax.tree_util.tree_map(
                lambda leaf, i=i: leaf[i], stacked
            )
    return out


@ARCH_REGISTRY.register(name="NAFNetLocal")
def nafnet_local(*, train_size=(256, 256), tlc_ratio: float = 1.5,
                 **kwargs) -> NAFNet:
    """Test-time Local Converter variant (reference ``NAFNetLocal`` +
    ``Local_Base.convert``): identical params to NAFNet, but SCA pooling is
    windowed at ``tlc_ratio x train_size``. Load trained NAFNet params
    directly — the param tree is unchanged."""
    from lowlight_image_enhancement_tpu.ops.tlc import (
        tlc_window_from_train_size,
    )

    window = tlc_window_from_train_size(tuple(train_size), tlc_ratio)
    return NAFNet(tlc_window=window, **kwargs)
