"""InceptionV3 pool3 feature extractor for FID (Flax, NHWC).

Rebuild of the extractor the reference's FID is defined over: the
pytorch-fid ``InceptionV3([3])`` used by
``NAFNet_base/basicsr/metrics/fid.py:14-25`` (which imports
``basicsr.models.archs.inception`` — a module absent from the reference
snapshot; the canonical implementation is pytorch-fid's, whose FID
variant loads the ``pt_inception-2015-12-05`` weights). Output block 3 =
the 2048-d global-average-pooled ``Mixed_7c`` activations ("pool3").

Two architecture variants are supported:

- ``fid_variant=True`` (default — what published FID numbers use): the
  pytorch-fid patched blocks, i.e. every in-block average pool runs with
  ``count_include_pad=False``, and the second ``InceptionE`` block
  (``Mixed_7c``) uses a MAX pool in its pool branch.
- ``fid_variant=False``: the stock torchvision ``inception_v3``
  semantics (``count_include_pad=True`` average pools everywhere).

Weights: no torchvision checkpoint ships in this image (no egress), so
weights load from a converted ``.npz`` when available
(``tools/convert_inception_weights.py`` produces one from a torch state
dict; keys keep the torch names, e.g. ``Mixed_5b.branch1x1.conv.weight``).
Otherwise the caller decides — :func:`load_inception_v3` falls back to a
deterministic random init and reports ``pretrained=False`` so FID code
can refuse loudly (published-number comparability requires the real
weights).

BatchNorm is inference-only (the trunk is frozen): each conv carries its
BN as explicit (scale, bias, mean, var) parameters applied analytically
with the torch eps of 1e-3.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

Array = jax.Array

_BN_EPS = 1e-3


def _avg_pool_3x3_s1(x: Array, count_include_pad: bool) -> Array:
    """3x3/stride-1/pad-1 average pool with selectable divisor semantics
    (torch ``F.avg_pool2d(..., count_include_pad=...)``)."""
    summed = jax.lax.reduce_window(
        x, jnp.array(0, x.dtype), jax.lax.add,
        (1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    if count_include_pad:
        return summed / jnp.array(9, x.dtype)
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    counts = jax.lax.reduce_window(
        ones, jnp.array(0, x.dtype), jax.lax.add,
        (1, 3, 3, 1), (1, 1, 1, 1), [(0, 0), (1, 1), (1, 1), (0, 0)])
    return summed / counts


def _max_pool(x: Array, window: int, stride: int, pad: int = 0) -> Array:
    return jax.lax.reduce_window(
        x, jnp.array(-jnp.inf, x.dtype), jax.lax.max,
        (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


class BasicConv(nn.Module):
    """Conv(bias=False) + frozen BatchNorm + ReLU (torchvision
    ``BasicConv2d``, BN eps 1e-3). Param layout: ``kernel`` HWIO plus the
    four BN arrays, so converted torch checkpoints map 1:1."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ci = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, ci, self.features), jnp.float32)
        bn_scale = self.param("bn_scale", nn.initializers.ones,
                              (self.features,), jnp.float32)
        bn_bias = self.param("bn_bias", nn.initializers.zeros,
                             (self.features,), jnp.float32)
        bn_mean = self.param("bn_mean", nn.initializers.zeros,
                             (self.features,), jnp.float32)
        bn_var = self.param("bn_var", nn.initializers.ones,
                            (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=self.strides, padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        inv = jax.lax.rsqrt(bn_var + _BN_EPS) * bn_scale
        y = y * inv.astype(self.dtype) + (
            bn_bias - bn_mean * inv).astype(self.dtype)
        return nn.relu(y)


def _p(k: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    return ((k, k), (k, k))


class InceptionA(nn.Module):
    pool_features: int
    count_include_pad: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dtype
        b1 = BasicConv(64, (1, 1), dtype=d, name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), dtype=d, name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=_p(2), dtype=d,
                       name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=_p(1), dtype=d,
                       name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=_p(1), dtype=d,
                       name="branch3x3dbl_3")(b3)
        bp = _avg_pool_3x3_s1(x, self.count_include_pad)
        bp = BasicConv(self.pool_features, (1, 1), dtype=d,
                       name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dtype
        b3 = BasicConv(384, (3, 3), strides=(2, 2), dtype=d,
                       name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=_p(1), dtype=d,
                       name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), strides=(2, 2), dtype=d,
                       name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    count_include_pad: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d, c7 = self.dtype, self.channels_7x7
        p17 = ((0, 0), (3, 3))
        p71 = ((3, 3), (0, 0))
        b1 = BasicConv(192, (1, 1), dtype=d, name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), dtype=d, name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=p17, dtype=d,
                       name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=p71, dtype=d,
                       name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), dtype=d, name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=p71, dtype=d,
                       name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=p17, dtype=d,
                       name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=p71, dtype=d,
                       name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=p17, dtype=d,
                       name="branch7x7dbl_5")(bd)
        bp = _avg_pool_3x3_s1(x, self.count_include_pad)
        bp = BasicConv(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dtype
        b3 = BasicConv(192, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), strides=(2, 2), dtype=d,
                       name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), dtype=d, name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), dtype=d,
                       name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), dtype=d,
                       name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), strides=(2, 2), dtype=d,
                       name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    """``pool_mode``: "avg" (Mixed_7b) or "max" (Mixed_7c in the FID
    variant — pytorch-fid ``FIDInceptionE_2``)."""

    pool_mode: str
    count_include_pad: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dtype
        p13 = ((0, 0), (1, 1))
        p31 = ((1, 1), (0, 0))
        b1 = BasicConv(320, (1, 1), dtype=d, name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), dtype=d, name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv(384, (1, 3), padding=p13, dtype=d,
                      name="branch3x3_2a")(b3),
            BasicConv(384, (3, 1), padding=p31, dtype=d,
                      name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv(448, (1, 1), dtype=d, name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=_p(1), dtype=d,
                       name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv(384, (1, 3), padding=p13, dtype=d,
                      name="branch3x3dbl_3a")(bd),
            BasicConv(384, (3, 1), padding=p31, dtype=d,
                      name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool_mode == "max":
            bp = _max_pool(x, 3, 1, pad=1)
        else:
            bp = _avg_pool_3x3_s1(x, self.count_include_pad)
        bp = BasicConv(192, (1, 1), dtype=d, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """InceptionV3 trunk up to the 2048-d pool3 features.

    Contract of pytorch-fid ``InceptionV3([3])`` as configured by the
    reference (``basicsr/metrics/fid.py:14-25``): ``resize_input=True``
    (bilinear to 299x299, torch ``align_corners=False`` half-pixel
    semantics = ``jax.image.resize`` bilinear), ``normalize_input=False``
    (inputs are expected already in [-1, 1]; pass
    ``normalize_input=True`` to map [0, 1] -> [-1, 1] like pytorch-fid's
    default pipeline does).
    """

    fid_variant: bool = True
    resize_input: bool = True
    normalize_input: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        cip = not self.fid_variant  # FID pools use count_include_pad=False
        d = self.dtype
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[3]), method="bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = x.astype(d)
        x = BasicConv(32, (3, 3), strides=(2, 2), dtype=d,
                      name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), dtype=d, name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=_p(1), dtype=d,
                      name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv(80, (1, 1), dtype=d, name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), dtype=d, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, cip, dtype=d, name="Mixed_5b")(x)
        x = InceptionA(64, cip, dtype=d, name="Mixed_5c")(x)
        x = InceptionA(64, cip, dtype=d, name="Mixed_5d")(x)
        x = InceptionB(dtype=d, name="Mixed_6a")(x)
        x = InceptionC(128, cip, dtype=d, name="Mixed_6b")(x)
        x = InceptionC(160, cip, dtype=d, name="Mixed_6c")(x)
        x = InceptionC(160, cip, dtype=d, name="Mixed_6d")(x)
        x = InceptionC(192, cip, dtype=d, name="Mixed_6e")(x)
        x = InceptionD(dtype=d, name="Mixed_7a")(x)
        x = InceptionE("avg", cip, dtype=d, name="Mixed_7b")(x)
        x = InceptionE("max" if self.fid_variant else "avg", cip,
                       dtype=d, name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2)).astype(jnp.float32)  # pool3


# ---------------------------------------------------------------------------
# Weight loading (converted npz keeps torch state_dict names)
# ---------------------------------------------------------------------------


def _npz_to_params(npz: Dict[str, np.ndarray],
                   init_params: Dict[str, Any]) -> Dict[str, Any]:
    """Map torch state-dict-named npz entries onto the Flax param tree.

    torch: ``<block>.<branch>.conv.weight`` (OIHW), ``....bn.{weight,
    bias,running_mean,running_var}``; top-level stem convs have no
    ``<branch>`` part.
    """
    import copy

    params = copy.deepcopy(jax.tree.map(np.asarray, init_params))

    def assign(tree: Dict[str, Any], path: Tuple[str, ...], torch_base: str):
        node = tree
        for part in path:
            node = node[part]
        w = npz.get(torch_base + ".conv.weight")
        if w is None:
            raise KeyError(f"missing {torch_base}.conv.weight in npz")
        node["kernel"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        node["bn_scale"] = npz[torch_base + ".bn.weight"].astype(np.float32)
        node["bn_bias"] = npz[torch_base + ".bn.bias"].astype(np.float32)
        node["bn_mean"] = npz[
            torch_base + ".bn.running_mean"].astype(np.float32)
        node["bn_var"] = npz[
            torch_base + ".bn.running_var"].astype(np.float32)

    def walk(tree: Dict[str, Any], path: Tuple[str, ...]):
        if "kernel" in tree and "bn_scale" in tree:
            assign(params, path, ".".join(path))
            return
        for name, sub in tree.items():
            walk(sub, path + (name,))

    walk(init_params, ())
    return params


def load_inception_v3(
    weights_path: Optional[str] = None,
    fid_variant: bool = True,
    resize_input: bool = True,
    normalize_input: bool = False,
    dtype: Any = jnp.float32,
) -> Tuple[InceptionV3Pool3, Dict[str, Any], bool]:
    """Build the pool3 extractor and its (frozen) params.

    Returns ``(module, variables, pretrained)``. Weight search order:
    explicit ``weights_path`` -> ``$LLIE_INCEPTION_NPZ`` ->
    package-relative ``weights/inception_v3_fid.npz`` -> deterministic
    random init (``pretrained=False``; FID callers should refuse — see
    ``metrics/fid.py``).
    """
    module = InceptionV3Pool3(
        fid_variant=fid_variant, resize_input=resize_input,
        normalize_input=normalize_input, dtype=dtype)
    variables = module.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 299, 299, 3), jnp.float32))

    candidates = [
        weights_path,
        os.environ.get("LLIE_INCEPTION_NPZ"),
        os.path.join(os.path.dirname(__file__), "..", "weights",
                     "inception_v3_fid.npz"),
    ]
    for cand in candidates:
        if cand and os.path.exists(cand):
            npz = dict(np.load(cand))
            params = _npz_to_params(npz, variables["params"])
            logger.info("InceptionV3 weights loaded from %s", cand)
            return module, {"params": params}, True
    logger.warning(
        "InceptionV3 pretrained weights not found — random init (set "
        "$LLIE_INCEPTION_NPZ or run tools/convert_inception_weights.py). "
        "FID computed with a random trunk is NOT comparable to published "
        "numbers.")
    return module, variables, False
