"""SwinIR windowed-attention restoration network (Flax, NHWC).

TPU-native rebuild of the SwinIR architecture the reference wraps
(``archs/swinir_arch.py:14-70`` only imports the official external clone —
not vendored there). This module implements the official restoration
topology natively for the ``upsampler=''`` (denoising / low-light) path
used by the reference sweep config ``configs/colab/sid_swinir_baseline.yml``:

- mean/``img_range`` input normalization (RGB mean for 3-channel input),
- ``conv_first`` shallow feature conv,
- patch embed (flatten + optional ``patch_norm`` LayerNorm),
- RSTB stages (shifted-window MHSA blocks + trailing 3x3 conv, residual),
- a final LayerNorm (official ``self.norm``) before ``conv_after_body``,
- global residuals and ``conv_last``.

The config surface accepts the official kwargs (``in_chans``, ``img_size``,
``upscale``, ``img_range``, ``resi_connection``, ``upsampler``,
``patch_norm``, ``ape``) so the reference YAML instantiates unchanged;
``tools/convert_torch_swinir.py`` maps official checkpoints onto this tree.

TPU notes: window attention reshapes to ``[B * num_windows, ws*ws, C]`` —
batched matmuls on the MXU with fully static shapes. Attention masks for
shifted windows are computed at trace time (host numpy) per static (H, W).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lowlight_image_enhancement_tpu.utils.registry import ARCH_REGISTRY

Array = jax.Array

# official SwinIR input normalization for 3-channel input
_RGB_MEAN = (0.4488, 0.4371, 0.4040)


def window_partition(x: Array, ws: int) -> Array:
    """[N, H, W, C] -> [N * H/ws * W/ws, ws, ws, C]."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // ws, ws, w // ws, ws, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, c)


def window_reverse(wins: Array, ws: int, h: int, w: int) -> Array:
    """Inverse of :func:`window_partition`."""
    n = wins.shape[0] // ((h // ws) * (w // ws))
    x = wins.reshape(n, h // ws, w // ws, ws, ws, -1)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, -1)


def _relative_position_index(ws: int) -> np.ndarray:
    """Pairwise relative-position index table for a ws x ws window."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))  # [2, ws, ws]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, n, n]
    rel = rel.transpose(1, 2, 0) + (ws - 1)
    return (rel[..., 0] * (2 * ws - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask for shifted windows: [num_windows, n, n] with 0 /
    -100 entries (the standard Swin construction)."""
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wss in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[:, hs, wss, :] = cnt
            cnt += 1
    mask_windows = np.reshape(
        img_mask.reshape(1, h // ws, ws, w // ws, ws, 1)
        .transpose(0, 1, 3, 2, 4, 5), (-1, ws * ws)
    )
    attn_mask = mask_windows[:, None, :] - mask_windows[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        """x: [B_, n, C] where n = ws*ws; mask: [nW, n, n] or None."""
        b, n, c = x.shape
        head_dim = c // self.num_heads
        scale = head_dim**-0.5

        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.num_heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

        attn = jnp.einsum("bhnd,bhmd->bhnm", q * scale, k,
                          preferred_element_type=jnp.float32)

        rpb_table = self.param(
            "relative_position_bias",
            nn.initializers.truncated_normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads),
        )
        idx = _relative_position_index(self.window_size).reshape(-1)
        bias = rpb_table[idx].reshape(n, n, self.num_heads)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)

        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(b, self.num_heads, n, n)

        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, c).astype(self.dtype)
        return nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 8
    shift: int = 0
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        """x: [N, H, W, C]; H, W multiples of window_size."""
        n, h, w, c = x.shape
        ws = self.window_size
        shift = self.shift if min(h, w) > ws else 0

        shortcut = x
        y = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x).astype(
            self.dtype)
        if shift:
            y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(h, w, ws, shift))
        else:
            mask = None
        wins = window_partition(y, ws).reshape(-1, ws * ws, c)
        wins = WindowAttention(c, self.num_heads, ws, self.dtype,
                               name="attn")(wins, mask)
        y = window_reverse(wins.reshape(-1, ws, ws, c), ws, h, w)
        if shift:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        x = shortcut + y

        y = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x).astype(
            self.dtype)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc2")(y)
        return x + y


class RSTB(nn.Module):
    """Residual Swin Transformer Block: depth Swin blocks + conv + skip."""

    dim: int
    depth: int
    num_heads: int
    window_size: int = 8
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = x
        for i in range(self.depth):
            y = SwinBlock(
                self.dim, self.num_heads, self.window_size,
                shift=0 if i % 2 == 0 else self.window_size // 2,
                mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                name=f"blk{i}",
            )(y)
        y = nn.Conv(self.dim, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv")(y)
        return x + y


@ARCH_REGISTRY.register(name="SwinIRRestoration")
@ARCH_REGISTRY.register()
class SwinIR(nn.Module):
    """SwinIR restoration network, ``upsampler=''`` path (official graph).

    Accepts the official constructor surface so the reference sweep YAML
    (``configs/colab/sid_swinir_baseline.yml``) instantiates unchanged.
    ``img_size``/``upscale`` are accepted for config parity; the forward
    pass is fully resolution-agnostic and ``upscale`` must be 1.
    """

    img_channel: int = 3
    embed_dim: int = 60
    depths: Sequence[int] = (4, 4, 4, 4)
    num_heads: Sequence[int] = (6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32
    # --- official config surface (swinir defaults) ---
    in_chans: int | None = None       # alias for img_channel
    img_size: int = 64                # accepted, unused (static per-trace)
    upscale: int = 1                  # only 1 supported (restoration)
    img_range: float = 1.0
    upsampler: str = ""               # only '' (denoise/low-light) path
    resi_connection: str = "1conv"    # only '1conv' supported
    patch_norm: bool = True           # LayerNorm after patch embedding
    ape: bool = False                 # absolute pos embed: not supported
    qkv_bias: bool = True             # official default; False unsupported

    @nn.compact
    def __call__(self, inp: Array, *, deterministic: bool = True) -> Array:
        if self.upscale != 1:
            raise NotImplementedError("SwinIR: only upscale=1 (restoration)")
        if self.upsampler != "":
            raise NotImplementedError("SwinIR: only upsampler='' supported")
        if self.resi_connection != "1conv":
            raise NotImplementedError("SwinIR: only resi_connection='1conv'")
        if self.ape or not self.qkv_bias:
            raise NotImplementedError("SwinIR: ape/qkv_bias=False unsupported")
        chans = self.in_chans if self.in_chans is not None else (
            self.img_channel)

        n, h, w, _ = inp.shape
        ws = self.window_size
        ph = (ws - h % ws) % ws
        pw = (ws - w % ws) % ws
        x = inp
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        mode="reflect")

        # official input normalization: x = (x - mean) * img_range
        mean = (jnp.asarray(_RGB_MEAN, jnp.float32) if chans == 3
                else jnp.zeros((chans,), jnp.float32))
        x = (x - mean) * self.img_range

        shallow = nn.Conv(self.embed_dim, (3, 3), padding="SAME",
                          dtype=self.dtype, param_dtype=jnp.float32,
                          name="conv_first")(x.astype(self.dtype))
        y = shallow
        # patch embed: NHWC is already the [.., HW, C]-equivalent layout;
        # the official flatten/unflatten is a no-op here beyond the norm
        if self.patch_norm:
            y = nn.LayerNorm(dtype=jnp.float32,
                             name="patch_embed_norm")(y).astype(self.dtype)
        for li, (depth, heads) in enumerate(zip(self.depths,
                                                self.num_heads)):
            y = RSTB(self.embed_dim, depth, heads, ws, self.mlp_ratio,
                     self.dtype, name=f"rstb{li}")(y)
        # official trailing LayerNorm (``self.norm``) closing the body
        y = nn.LayerNorm(dtype=jnp.float32, name="norm")(y).astype(
            self.dtype)
        y = nn.Conv(self.embed_dim, (3, 3), padding="SAME",
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv_after_body")(y)
        y = y + shallow
        out = nn.Conv(chans, (3, 3), padding="SAME",
                      dtype=self.dtype, param_dtype=jnp.float32,
                      name="conv_last")(y)
        out = out + x.astype(self.dtype)
        # undo normalization: x / img_range + mean
        out = out.astype(jnp.float32) / self.img_range + mean
        return out[:, :h, :w, :]
