"""Spatial (height-sharded) model parallelism for giant-image inference.

Beyond-reference TPU capability: the reference handles memory-exceeding
inputs by overlap-tiled inference (``grids``, reproduced in
``training/validation.py:tiled_inference``) or TLC local statistics —
both approximations near tile seams. This module instead runs ONE exact
NAFNet forward with the image's height sharded across the device mesh:

- every 3x3 conv exchanges one boundary row with its mesh neighbors via
  ``jax.lax.ppermute`` (halo exchange over ICI),
- the SCA global mean becomes a ``psum`` — bitwise the same statistic
  the single-device forward computes,
- 2x2-stride-2 downs / pixel-shuffle ups stay shard-local (shard row
  counts are kept even through every scale by construction).

The result equals the single-device forward to float tolerance at ANY
shard count — no seams, no window approximation — while peak activation
memory per chip drops by ``1/n_shards``. Differentiable end-to-end
(ppermute/psum have exact transposes), though its intended use is
inference of inputs too large for one chip's HBM.

Consumes the standard unrolled NHWC ``NAFNet`` param tree (the
checkpoint format) — ``scan_blocks`` trees can be unstacked with
``models.nafnet.unstack_block_params`` first if needed.

Reference counterpart: none (NAFNet_arch.py runs single-GPU; grids
tiling at ``image_restoration_model.py:344-468`` is the closest analog).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lowlight_image_enhancement_tpu.ops.layernorm import layer_norm_2d

Array = jax.Array

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def halo_exchange_rows(x: Array, halo: int, axis_name: str) -> Array:
    """Append ``halo`` boundary rows from each mesh neighbor.

    ``x`` is the local shard ``[N, Hs, W, C]``; returns
    ``[N, Hs + 2*halo, W, C]``. Edge shards receive zeros (matching the
    zero padding a SAME conv applies at the global image boundary).
    ``lax.ppermute`` fills unmatched destinations with zeros, which gives
    exactly that semantics with perms that simply omit the wrap-around
    link.
    """
    n_sh = jax.lax.psum(1, axis_name)
    if n_sh == 1:
        return jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))
    # my top halo rows = my upper neighbor's (index i-1) bottom rows
    top = jax.lax.ppermute(
        x[:, -halo:], axis_name, [(i, i + 1) for i in range(n_sh - 1)]
    )
    # my bottom halo rows = my lower neighbor's (index i+1) top rows
    bot = jax.lax.ppermute(
        x[:, :halo], axis_name, [(i + 1, i) for i in range(n_sh - 1)]
    )
    return jnp.concatenate([top, x, bot], axis=1)


def _conv(x, p, *, stride=1, groups=1, col_pad=0, dtype=None):
    """lax NHWC conv over a kernel/bias param dict. Rows are VALID (halo
    rows, if needed, were exchanged in); columns pad by ``col_pad``."""
    k = p["kernel"]
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), k.astype(dtype),
        window_strides=(stride, stride),
        padding=((0, 0), (col_pad, col_pad)),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(dtype)
    return y


def _conv3x3(x, p, axis_name, *, groups=1, dtype=None):
    xh = halo_exchange_rows(x, 1, axis_name)
    return _conv(xh, p, groups=groups, col_pad=1, dtype=dtype)


def _simple_gate(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 * x2


def _nafblock_sp(x, p, axis_name, dtype):
    """One NAFBlock on a height shard — same math as
    ``models.nafnet.NAFBlock`` with the SCA mean psum'd global."""
    n_sh = jax.lax.psum(1, axis_name)
    inp = x
    y = layer_norm_2d(x, p["norm1"]["weight"], p["norm1"]["bias"])
    y = y.astype(dtype)
    y = _conv(y, p["conv1"], dtype=dtype)
    dw = y.shape[-1]
    y = _conv3x3(y, p["conv2"], axis_name, groups=dw, dtype=dtype)
    y = _simple_gate(y)
    # SCA: the global spatial mean — psum of local sums over the mesh
    local = jnp.sum(y, axis=(1, 2), keepdims=True)
    denom = y.shape[1] * n_sh * y.shape[2]
    att = jax.lax.psum(local, axis_name) / jnp.asarray(denom, local.dtype)
    att = _conv(att, p["sca_conv"], dtype=dtype)
    y = y * att
    y = _conv(y, p["conv3"], dtype=dtype)
    z = inp + y * p["beta"].astype(dtype)

    y = layer_norm_2d(z, p["norm2"]["weight"], p["norm2"]["bias"])
    y = y.astype(dtype)
    y = _conv(y, p["conv4"], dtype=dtype)
    y = _simple_gate(y)
    y = _conv(y, p["conv5"], dtype=dtype)
    return z + y * p["gamma"].astype(dtype)


def _pixel_shuffle(x, r=2):
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, c)


def _nafnet_shard_fn(inp, params, *, net, axis_name):
    """The per-shard NAFNet forward (runs inside shard_map). ``inp`` is
    the local ``[N, Hs, W, C]`` height shard of the padded image."""
    dtype = net.dtype
    x = _conv3x3(inp.astype(dtype), params["intro"], axis_name, dtype=dtype)

    skips = []
    chan = net.width
    for si, num in enumerate(net.enc_blk_nums):
        for bi in range(num):
            x = _nafblock_sp(x, params[f"enc{si}_blk{bi}"], axis_name,
                             dtype)
        skips.append(x)
        x = _conv(x, params[f"down{si}"], stride=2, dtype=dtype)
        chan *= 2

    for bi in range(net.middle_blk_num):
        x = _nafblock_sp(x, params[f"mid_blk{bi}"], axis_name, dtype)

    for si, num in enumerate(net.dec_blk_nums):
        x = _conv(x, params[f"up{si}"], dtype=dtype)
        x = _pixel_shuffle(x, 2)
        chan //= 2
        x = x + skips[-(si + 1)]
        for bi in range(num):
            x = _nafblock_sp(x, params[f"dec{si}_blk{bi}"], axis_name,
                             dtype)

    x = _conv3x3(x, params["ending"], axis_name, dtype=dtype)
    x = x + inp.astype(dtype)
    return x.astype(jnp.float32)


def spatial_pad_multiple(net, n_shards: int) -> int:
    """Height must split evenly into shards that stay even through every
    down: ``n_shards * 2**len(enc_blk_nums)``. Width needs the model's
    own ``padder_size``."""
    return n_shards * net.padder_size


def nafnet_apply_spatial(
    net,
    params: Mapping[str, Any],
    x: Array,
    mesh: Mesh,
    axis_name: str = "sp",
) -> Array:
    """Exact NAFNet forward with height sharded over ``mesh``.

    ``net`` is the ``NAFNet`` module (for its static config), ``params``
    its standard unrolled NHWC param tree, ``x`` NHWC ``[N, H, W, C]``
    (any size — padded internally, cropped back). The mesh must be 1-D
    with axis ``axis_name``.

    Exactness: for heights divisible by ``spatial_pad_multiple(net,
    n_shards)`` the result equals the single-device forward to float
    tolerance. Other heights get more zero-padding than the single-device
    pad, which perturbs the SCA global means slightly (the same class of
    boundary effect the single-device pad itself introduces).
    """
    if net.dropout_rate:
        raise ValueError("spatial inference is deterministic-only")
    if net.tlc_window is not None:
        raise ValueError(
            "TLC local statistics are a single-device approximation; the "
            "spatial-parallel forward computes exact global SCA instead")
    if "mid_blk0" not in params and net.middle_blk_num:
        raise ValueError(
            "expected the unrolled NHWC param tree (scan_blocks=False); "
            "convert stacked trees with unstack_block_params first")
    n_sh = mesh.devices.size
    n, h, w, c = x.shape
    mh = spatial_pad_multiple(net, n_sh)
    mw = net.padder_size
    hp = -(-h // mh) * mh
    wp = -(-w // mw) * mw
    x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))

    fn = shard_map(
        partial(_nafnet_shard_fn, net=net, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(None, axis_name, None, None), P()),
        out_specs=P(None, axis_name, None, None),
        # the static replication checker cannot infer that the TRANSPOSE
        # of this body (param cotangents: per-shard partials + inserted
        # psum) is replicated — disable it so jax.grad works through the
        # sharded forward (gradient parity vs single-device is asserted
        # in tests/test_spatial_parallel.py::TestSpatialGradients)
        check_vma=False,
    )
    x = jax.device_put(x, NamedSharding(mesh, P(None, axis_name)))
    out = fn(x, params)
    return out[:, :h, :w, :]
