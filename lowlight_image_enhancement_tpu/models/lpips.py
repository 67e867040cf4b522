"""LPIPS perceptual distance (Flax, NHWC): backbone features + linear heads.

Rebuild of the reference's ``lpips`` dependency (LPIPS v0.1, nets
``alex``/``vgg``/``squeeze`` — we provide ``alex`` and ``vgg``): inputs in
``[-1, 1]``, per-layer unit-normalized features, 1x1 linear heads with
non-negative weights, spatial mean, sum over layers
(reference usage: ``metrics/lpips_metric.py``, ``metrics/perceptual.py``,
``NewBP_model/losses.py`` LPIPS term).

Weights load from a converted ``.npz`` (``tools/convert_lpips_weights.py``)
via ``$LLIE_LPIPS_NPZ`` or a package-relative path; otherwise deterministic
random init with ``pretrained=False`` recorded (distance stays a valid
differentiable perceptual functional; absolute values then aren't
comparable to published LPIPS numbers — callers surface this in metadata).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

Array = jax.Array

# LPIPS shift/scale (applied to [-1,1] inputs), from LPIPS v0.1.
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class _AlexFeatures(nn.Module):
    """AlexNet feature trunk returning the 5 conv activations (post-ReLU)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        taps = []
        # conv1: 11x11/4 pad 2
        x = nn.Conv(64, (11, 11), strides=(4, 4), padding=((2, 2), (2, 2)),
                    dtype=self.dtype, param_dtype=jnp.float32, name="conv1")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(192, (5, 5), padding=((2, 2), (2, 2)), dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv2")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.Conv(384, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv3")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv4")(x)
        x = nn.relu(x)
        taps.append(x)
        x = nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv5")(x)
        x = nn.relu(x)
        taps.append(x)
        return taps


class _VGGFeatures(nn.Module):
    """VGG16 trunk returning relu1_2/2_2/3_3/4_3/5_3 (LPIPS-vgg taps)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> List[Array]:
        cfg = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
        taps = []
        for stage, (feat, n) in enumerate(cfg, start=1):
            for ci in range(1, n + 1):
                x = nn.Conv(feat, (3, 3), padding="SAME", dtype=self.dtype,
                            param_dtype=jnp.float32,
                            name=f"conv{stage}_{ci}")(x)
                x = nn.relu(x)
            taps.append(x)
            if stage < 5:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


_N_CHANNELS = {
    "alex": (64, 192, 384, 256, 256),
    "vgg": (64, 128, 256, 512, 512),
}


class LPIPSNet(nn.Module):
    """Full LPIPS distance network.

    ``__call__(x, y)`` with NHWC inputs already mapped to ``[-1, 1]``;
    returns per-image distances ``[N]`` (or per-pixel maps when
    ``spatial``).
    """

    net: str = "alex"
    spatial: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        if self.net not in _N_CHANNELS:
            raise ValueError(f"net must be 'alex' or 'vgg', got {self.net!r}")
        shift = jnp.asarray(_SHIFT, dtype=x.dtype)
        scale = jnp.asarray(_SCALE, dtype=x.dtype)
        xn = (x - shift) / scale
        yn = (y - shift) / scale

        trunk = (_AlexFeatures(dtype=self.dtype, name="trunk")
                 if self.net == "alex"
                 else _VGGFeatures(dtype=self.dtype, name="trunk"))
        fx = trunk(xn)
        fy = trunk(yn)

        total = None
        for li, (ax, ay) in enumerate(zip(fx, fy)):
            # unit-normalize along channels
            def unit(z):
                norm = jnp.sqrt(jnp.sum(z * z, axis=-1, keepdims=True))
                return z / (norm + 1e-10)

            d = (unit(ax) - unit(ay)) ** 2
            w = self.param(
                f"lin{li}",
                nn.initializers.uniform(scale=0.1),
                (d.shape[-1],),
            )
            w = jnp.abs(w)  # LPIPS heads are non-negative
            dmap = jnp.sum(d * w.astype(d.dtype), axis=-1)  # [N, h, w]
            if self.spatial:
                dmap = jax.image.resize(
                    dmap, (dmap.shape[0], x.shape[1], x.shape[2]),
                    method="bilinear",
                )
            else:
                dmap = jnp.mean(dmap, axis=(1, 2))
            total = dmap if total is None else total + dmap
        return total


def _npz_to_variables(npz, variables):
    """Merge converted npz weights into initialized variables (in place on
    a copy). Keys: ``trunk.conv*.weight/bias`` (OIHW) and ``lin{i}.weight``."""
    params = jax.tree_util.tree_map(np.asarray, variables["params"])
    trunk = dict(params["trunk"])
    for key, val in npz.items():
        if key.startswith("trunk.") and key.endswith(".weight"):
            name = key[len("trunk."):-len(".weight")]
            if name in trunk and val.ndim == 4:
                trunk[name] = dict(trunk[name])
                trunk[name]["kernel"] = np.transpose(val, (2, 3, 1, 0))
        elif key.startswith("trunk.") and key.endswith(".bias"):
            name = key[len("trunk."):-len(".bias")]
            if name in trunk:
                trunk[name] = dict(trunk[name])
                trunk[name]["bias"] = val
        elif key.startswith("lin") and key.endswith(".weight"):
            name = key[: -len(".weight")]
            if name in params:
                params[name] = val.reshape(-1)
    params["trunk"] = trunk
    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}


def load_lpips(
    net: str = "alex",
    spatial: bool = False,
    weights_path: Optional[str] = None,
) -> Tuple[LPIPSNet, Dict[str, Any], bool]:
    """Build LPIPS net + params. Returns ``(module, variables, pretrained)``."""
    module = LPIPSNet(net=net, spatial=spatial)
    dummy = jnp.zeros((1, 64, 64, 3))
    variables = module.init(jax.random.PRNGKey(0), dummy, dummy)
    candidates = [
        weights_path,
        os.environ.get("LLIE_LPIPS_NPZ"),
        os.path.join(os.path.dirname(__file__), "..", "weights",
                     f"lpips_{net}.npz"),
    ]
    for cand in candidates:
        if cand and os.path.exists(cand):
            variables = _npz_to_variables(dict(np.load(cand)), variables)
            logger.info("LPIPS(%s) weights loaded from %s", net, cand)
            return module, variables, True
    logger.warning(
        "LPIPS(%s) pretrained weights not found — deterministic random "
        "init (set LLIE_LPIPS_NPZ or run tools/convert_lpips_weights.py).",
        net,
    )
    return module, variables, False
