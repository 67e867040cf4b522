"""VGG19 feature extractor for perceptual losses (Flax, NHWC).

Rebuild of the reference's ``PerceptualLoss`` feature trunk
(``NewBP_model/losses.py:32-69``): torchvision ``vgg19.features[:36]``
(conv1_1 .. relu5_4, i.e. everything up to but excluding the final
max-pool), frozen, with ImageNet mean/std normalization of sRGB [0,1]
inputs.

Weights: the runtime image has no torchvision checkpoints and no network
egress, so weights load from a converted ``.npz`` file when available
(``tools/convert_vgg_weights.py`` produces one from a torch checkpoint);
otherwise the extractor falls back to a **deterministic random
initialization** (PRNGKey(0)) and records ``pretrained=False`` — the loss
remains a well-defined differentiable functional (random VGG features are a
known-usable perceptual proxy), and tests exercise the exact same code
path. Reference file for parity: ``NewBP_model/losses.py:32-69``.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from lowlight_image_enhancement_tpu.ops.image_ops import max_pool_2x2

logger = logging.getLogger(__name__)

Array = jax.Array

# torchvision vgg19.features layout: conv counts per stage.
_VGG19_CFG: Tuple[Tuple[int, int], ...] = (
    (64, 2), (128, 2), (256, 4), (512, 4), (512, 4)
)

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class VGG19Features(nn.Module):
    """VGG19 trunk up to relu5_4 (no final pool) returning tap activations.

    ``taps``: names of activations to return, from
    ``relu{stage}_{idx}`` (1-based). Default returns only the final
    ``relu5_4`` (the reference's ``features[:36]`` output).
    """

    taps: Sequence[str] = ("relu5_4",)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Dict[str, Array]:
        mean = jnp.asarray(IMAGENET_MEAN, dtype=x.dtype)
        std = jnp.asarray(IMAGENET_STD, dtype=x.dtype)
        x = (jnp.clip(x, 0.0, 1.0) - mean) / std
        x = x.astype(self.dtype)

        reorder = os.environ.get("LLIE_VGG_POOL_FIRST", "1") != "0"
        outputs: Dict[str, Array] = {}
        for stage, (feat, n_convs) in enumerate(_VGG19_CFG, start=1):
            pooled = False
            for ci in range(1, n_convs + 1):
                x = nn.Conv(
                    features=feat,
                    kernel_size=(3, 3),
                    padding="SAME",
                    dtype=self.dtype,
                    param_dtype=jnp.float32,
                    name=f"conv{stage}_{ci}",
                )(x)
                name = f"relu{stage}_{ci}"
                # Stage-final relu commutes with the 2x2 max pool
                # (``maxpool(relu(x)) == relu(maxpool(x))``, and the
                # gradients agree exactly under torch semantics: the
                # pool routes to the first window max, relu' (0) = 0) —
                # pooling FIRST runs the relu and its backward select at
                # 1/4 resolution, a pure-XLA saving measured ~1 ms/step
                # on the flagship recipe. Skipped when this relu is a
                # requested tap (its full-res activation must exist).
                if (ci == n_convs and stage < len(_VGG19_CFG)
                        and name not in self.taps and reorder):
                    x = nn.relu(max_pool_2x2(x))
                    pooled = True
                else:
                    x = nn.relu(x)
                    pooled = False
                if name in self.taps:
                    outputs[name] = x
            if stage < len(_VGG19_CFG) and not pooled:
                x = max_pool_2x2(x)
        missing = set(self.taps) - set(outputs)
        if missing:
            raise ValueError(f"unknown VGG taps requested: {sorted(missing)}")
        return outputs


def _npz_to_params(npz: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert ``conv{s}_{i}.weight/.bias`` npz entries (torch OIHW) to
    flax param tree (HWIO)."""
    params: Dict[str, Any] = {}
    for key in npz:
        if not key.endswith(".weight"):
            continue
        name = key[: -len(".weight")]
        w = npz[key]
        b = npz.get(name + ".bias")
        if w.ndim != 4:
            continue
        params[name] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),  # OIHW -> HWIO
            "bias": b if b is not None else np.zeros(w.shape[0], np.float32),
        }
    return params


def load_vgg19_features(
    taps: Sequence[str] = ("relu5_4",),
    weights_path: Optional[str] = None,
    dtype: Any = jnp.float32,
) -> Tuple[VGG19Features, Dict[str, Any], bool]:
    """Build the extractor and its (frozen) params.

    Returns ``(module, variables, pretrained)``. Search order for weights:
    explicit ``weights_path`` -> ``$LLIE_VGG19_NPZ`` -> package-relative
    ``weights/vgg19_features.npz`` -> deterministic random init.
    """
    module = VGG19Features(taps=tuple(taps), dtype=dtype)
    dummy = jnp.zeros((1, 64, 64, 3), dtype=jnp.float32)
    variables = module.init(jax.random.PRNGKey(0), dummy)

    candidates = [
        weights_path,
        os.environ.get("LLIE_VGG19_NPZ"),
        os.path.join(os.path.dirname(__file__), "..", "weights",
                     "vgg19_features.npz"),
    ]
    for cand in candidates:
        if cand and os.path.exists(cand):
            npz = dict(np.load(cand))
            loaded = _npz_to_params(npz)
            params = dict(variables["params"])
            for name, entry in loaded.items():
                if name in params:
                    params[name] = {
                        "kernel": jnp.asarray(entry["kernel"]),
                        "bias": jnp.asarray(entry["bias"]),
                    }
            variables = {"params": params}
            logger.info("VGG19 weights loaded from %s", cand)
            return module, variables, True
    logger.warning(
        "VGG19 pretrained weights not found — using deterministic random "
        "features (set LLIE_VGG19_NPZ or run tools/convert_vgg_weights.py)."
    )
    return module, variables, False
