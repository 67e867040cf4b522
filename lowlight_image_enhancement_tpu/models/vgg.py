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


def _s2d_stem_kernel(kernel):
    """Re-layout a full-res 3x3 HWIO kernel into space-to-depth(2) space.

    A stride-1 3x3 conv on ``[N, H, W, Ci]`` equals a stride-1 3x3 conv on
    the s2d(2) tensor ``[N, H/2, W/2, 4*Ci]`` producing ``[..., 4*Co]``
    (output phases stacked), with taps

        K'[Dy, Dx, (py,px,ci), (qy,qx,co)] = K[dy, dx, ci, co],
        dy = 2*Dy + py - qy,  dx = 2*Dx + px - qx,   |dy|,|dx| <= 1

    and zeros elsewhere.  Phase order is row-major ``(phase_y, phase_x,
    channel)`` to match :func:`_space_to_depth`.  This is an exact
    reorganization of the same multiply-adds — it exists because the
    stock lowering of a 3-channel conv (and especially its input
    gradient, a transposed conv with THREE output lanes) leaves the MXU
    ~95% idle at 512^2; in s2d space the contraction is 12->256 lanes.

    Measured on v5e and REJECTED as a default (``LLIE_VGG_S2D_STEM=1``
    keeps it available): the conv fusions do get faster (full-step
    ``fusion`` bucket 15.5 -> 10.5 ms) but the s2d/d2s boundaries
    materialize as data-formatting copies that cost more than the win —
    isolated perceptual value+grad 18.4 -> 24.2 ms
    (``tools/bench_vgg.py``). Kept for the exact-relayout machinery,
    which the fused stage-1 kernel reuses conceptually.
    """
    kh, kw, ci, co = kernel.shape
    assert (kh, kw) == (3, 3), "s2d stem expects a 3x3 kernel"
    out = jnp.zeros((3, 3, 4 * ci, 4 * co), kernel.dtype)
    for dy_ in range(3):
        for dx_ in range(3):
            dy, dx = dy_ - 1, dx_ - 1
            for py in range(2):
                for px in range(2):
                    for qy in range(2):
                        for qx in range(2):
                            if (2 * ((qy + dy - py) // 2) != qy + dy - py
                                    or 2 * ((qx + dx - px) // 2)
                                    != qx + dx - px):
                                continue
                            Dy = (qy + dy - py) // 2
                            Dx = (qx + dx - px) // 2
                            if Dy not in (-1, 0, 1) or Dx not in (-1, 0, 1):
                                continue
                            pi = (py * 2 + px) * ci
                            qi = (qy * 2 + qx) * co
                            out = out.at[
                                Dy + 1, Dx + 1, pi:pi + ci, qi:qi + co
                            ].set(kernel[dy_, dx_])
    return out


def _space_to_depth(x):
    """[N, H, W, C] -> [N, H/2, W/2, 4C], phase order (py, px, c)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // 2, w // 2, 4 * c)


def _depth_to_space(x, c_out: int):
    """Inverse of :func:`_space_to_depth` for ``4*c_out`` channels."""
    n, h2, w2, _ = x.shape
    x = x.reshape(n, h2, w2, 2, 2, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h2 * 2, w2 * 2, c_out)


@jax.custom_vjp
def _phase_max(x4: Array) -> Array:
    """Max over the 4 s2d phases: ``[N, H2, W2, 4, C] -> [N, H2, W2, C]``.

    With phase order (py, px) this IS the full-res 2x2/stride-2 max pool
    of the depth-to-space tensor — computing it in s2d space exits a
    space-to-depth stage back into the native layout with **no
    depth-to-space copy at all** (the boundary cost that sank the
    round-3 conv1_1-only s2d stem, see :func:`_s2d_stem_kernel`).

    The VJP routes the gradient to the FIRST phase attaining the max —
    torch ``MaxPool2d`` / XLA select-and-scatter tie semantics (window
    scan order (0,0),(0,1),(1,0),(1,1) = phase order), matching
    ``ops/image_ops.max_pool_2x2`` on finite inputs.

    NaN windows: a window containing ANY NaN has a NaN max, every
    ``x >= max`` comparison is false, and the window's gradient is
    DROPPED. This is deliberately conservative and differs from both
    stock lowerings — which also differ from each other (measured:
    XLA select-and-scatter routes a one-NaN window's cotangent to the
    largest finite element, torch MaxPool2d to the first NaN) — so
    there is no single stock behavior to match; dropping can never
    amplify a NaN, and the training loss's finite guards abort on NaN
    activations regardless. Pinned in tests/test_vgg_s2d_stages.py.
    """
    return jnp.max(x4, axis=3)


def _phase_max_fwd(x4):
    m = jnp.max(x4, axis=3)
    return m, (x4, m)


def _phase_max_bwd(res, g):
    x4, m = res
    eq = x4 >= m[:, :, :, None, :]
    first = jnp.cumsum(eq.astype(jnp.int32), axis=3) == 1
    gx = jnp.where(eq & first, g[:, :, :, None, :], 0).astype(x4.dtype)
    return (gx,)


_phase_max.defvjp(_phase_max_fwd, _phase_max_bwd)


def _phase_max_pool(x: Array, c_out: int) -> Array:
    """2x2/s2 max pool of the underlying full-res tensor, computed on its
    s2d(2) representation ``[N, H2, W2, 4*c_out]`` (phase-major channels).
    Output is in NATIVE layout ``[N, H2, W2, c_out]``."""
    n, h2, w2, _ = x.shape
    return _phase_max(x.reshape(n, h2, w2, 4, c_out))


class _S2DConv(nn.Module):
    """A 3x3 SAME conv computed entirely in space-to-depth(2) space.

    Input ``[N, H2, W2, 4*in_ch]`` and output ``[N, H2, W2, 4*features]``
    both stay in s2d layout (phase-major); the param tree is identical to
    the stock ``nn.Conv`` (full-res ``(3, 3, in_ch, features)`` kernel),
    so converted torchvision checkpoints load unchanged. The relayouted
    kernel (:func:`_s2d_stem_kernel`) is a fixed linear function of the
    frozen params, so XLA constant-folds it at compile time.

    Why it was built: VGG stages 1-2 have 64/128 channels at
    512^2/256^2 — the stock lowering underfills MXU lanes and the
    conv1_1 input-gradient (a transposed conv with THREE output lanes)
    is ~95% idle. In s2d space every contraction is >=12->256 lanes
    wide at 1/4 the spatial size, and unlike the rejected conv1_1-only
    stem (round 3) the stage-final pool exits via
    :func:`_phase_max_pool` with no depth-to-space boundary copy.

    **Measured on v5e and REJECTED as a default** (round 5, isolated
    perceptual value+grad 512^2 b2 bf16): stock 17.52 ms, stages=1
    19.74 ms, stages=2 28.06 ms — monotone regression. The structural
    reason: the relayouted kernel has 3*3*4ci*4co taps at 1/4 the
    spatial positions = 4x the executed dense MACs, and the MXU cannot
    skip its zeros; no lane-occupancy win repays a 4x FLOP inflation.
    Kept (default-off, exact-tested in tests/test_vgg_s2d_stages.py)
    as documentation of the measured dead end — see BASELINE.md round-5
    roofline section.
    """

    features: int
    in_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, self.in_ch, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        ks = _s2d_stem_kernel(kernel.astype(self.dtype))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), ks, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + jnp.tile(bias.astype(self.dtype), 4)


class _StemS2DConv(nn.Module):
    """conv1_1 with the SAME param tree as ``nn.Conv`` but computed in
    space-to-depth(2) space when the spatial dims are even (exact; see
    :func:`_s2d_stem_kernel`).  Falls back to the stock lowering on odd
    shapes."""

    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        ci = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, ci,
                                                       self.features),
            jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        k = kernel.astype(self.dtype)
        b = bias.astype(self.dtype)
        x = x.astype(self.dtype)
        n, h, w, _ = x.shape
        if h % 2 or w % 2:
            y = jax.lax.conv_general_dilated(
                x, k, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return y + b
        ks = _s2d_stem_kernel(k)
        y = jax.lax.conv_general_dilated(
            _space_to_depth(x), ks, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return _depth_to_space(y, self.features) + b


# Default for the whole-stage s2d lowering (see _S2DConv): stages 1..N
# run in space-to-depth space. Overridable per-process via
# $LLIE_VGG_S2D_STAGES. Only stages that end in a pool qualify (the
# phase-max pool is the free layout exit), so the useful range is 0..4.
VGG_S2D_STAGES_DEFAULT = 0


def _s2d_stages_from_env() -> int:
    """Validated read of ``$LLIE_VGG_S2D_STAGES`` (whole-stage s2d
    lowering depth). Raises a clear error instead of a bare ValueError
    deep inside module apply (ADVICE r4)."""
    raw = os.environ.get("LLIE_VGG_S2D_STAGES")
    if raw is None or raw == "":
        return VGG_S2D_STAGES_DEFAULT
    try:
        val = int(raw)
    except ValueError:
        raise ValueError(
            f"LLIE_VGG_S2D_STAGES must be an integer in [0, 4], got "
            f"{raw!r} (0 = stock lowering; N = run VGG stages 1..N in "
            "space-to-depth space, exiting via the phase-max pool)")
    if not 0 <= val <= 4:
        raise ValueError(
            f"LLIE_VGG_S2D_STAGES must be in [0, 4], got {val} (stage 5 "
            "has no trailing pool so it cannot exit s2d space for free)")
    return val


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
        s2d_stem = os.environ.get("LLIE_VGG_S2D_STEM", "0") == "1"
        s2d_stages = _s2d_stages_from_env()
        outputs: Dict[str, Array] = {}
        for stage, (feat, n_convs) in enumerate(_VGG19_CFG, start=1):
            # Whole-stage s2d lowering (see _S2DConv): only for stages that
            # end in a pool (the phase-max pool is the free layout exit)
            # and even spatial dims.
            if (stage <= s2d_stages and stage < len(_VGG19_CFG)
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
                in_ch = x.shape[-1]
                x = _space_to_depth(x)
                for ci in range(1, n_convs + 1):
                    x = _S2DConv(features=feat, in_ch=in_ch,
                                 dtype=self.dtype,
                                 name=f"conv{stage}_{ci}")(x)
                    in_ch = feat
                    name = f"relu{stage}_{ci}"
                    last = ci == n_convs
                    if last and name not in self.taps and reorder:
                        # pool-before-relu (commutes; see the stock path)
                        x = nn.relu(_phase_max_pool(x, feat))
                    else:
                        x = nn.relu(x)
                        if name in self.taps:
                            outputs[name] = _depth_to_space(x, feat)
                        if last:
                            x = _phase_max_pool(x, feat)
                continue
            pooled = False
            for ci in range(1, n_convs + 1):
                if stage == 1 and ci == 1 and s2d_stem:
                    # Same params, exact math, MXU-shaped lowering —
                    # see _StemS2DConv.
                    x = _StemS2DConv(features=feat, dtype=self.dtype,
                                     name="conv1_1")(x)
                else:
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
