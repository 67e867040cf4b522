"""Scenario-B cross-pixel-crosstalk PSF operator (TPU-native, NHWC).

Rebuilds the reference physics core (``NewBP_model/newbp_layer.py``):

- ``build_psf_kernels``: the canonical P2 (mono) / B2 (rgb) 3x3 kernel
  constants (reference ``newbp_layer.py:129-173``).
- ``newbp_conv``: depthwise conv with an **explicit adjoint backward**
  (``conv`` forward, flipped-kernel ``conv`` backward == conv-transpose),
  mirroring the reference's hand-written ``NewBPFunction``
  (``newbp_layer.py:7-21``) via :func:`jax.custom_vjp`.
- ``CrosstalkPSF``: the Scenario-B PSF module. The kernel is **state, not a
  parameter** (never optimized; rides checkpoints), energy-normalized so
  each output channel sums to ~1 (``newbp_layer.py:88-126``). Forward is a
  depthwise (groups=C) conv with zero padding SAME — applied ONLY in the
  loss graph, never on the network input ("no double crosstalk").

Layout: all image tensors are **NHWC** ``[N, H, W, C]``. Kernels use the
canonical shape ``[C_k, kh, kw]`` with ``C_k == 1`` (mono, broadcast to all
channels) or ``C_k == C`` (per-channel / rgb).

TPU notes: a 3x3 depthwise conv over 3 channels is bandwidth-bound; XLA
fuses it with the surrounding loss arithmetic (residual, abs, mean), so the
default path lets XLA fuse. The explicit custom-VJP path guarantees the
*adjoint* semantics the reference tests assert (grad of <g, K*x> w.r.t. x
equals conv_transpose(g, K)) regardless of autodiff internals.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jax.Array

# ---------------------------------------------------------------------------
# Canonical kernel constants (reference newbp_layer.py:129-173).
# ---------------------------------------------------------------------------

_P2 = np.array(
    [[0.0100, 0.0200, 0.0100],
     [0.0200, 0.8800, 0.0200],
     [0.0100, 0.0200, 0.0100]],
    dtype=np.float32,
)

_B2_RED = np.array(
    [[0.0117, 0.0233, 0.0117],
     [0.0233, 0.8600, 0.0233],
     [0.0117, 0.0233, 0.0117]],
    dtype=np.float32,
)
_B2_GREEN = _P2
_B2_BLUE = np.array(
    [[0.0083, 0.0167, 0.0083],
     [0.0167, 0.9000, 0.0167],
     [0.0083, 0.0167, 0.0083]],
    dtype=np.float32,
)


def build_psf_kernels(mode: str, kernel_spec: str = "P2") -> jnp.ndarray:
    """Build the canonical PSF kernels.

    Args:
      mode: ``'mono'`` (panchromatic, one kernel shared by all channels) or
        ``'rgb'`` (one kernel per RGB channel).
      kernel_spec: ``'P2'`` for mono, ``'B2'`` for rgb.

    Returns:
      ``[1, 3, 3]`` (mono) or ``[3, 3, 3]`` (rgb) float32 array — canonical
      ``[C_k, kh, kw]`` layout. Row order for rgb is (R, G, B) with center
      weights 0.86 / 0.88 / 0.90 and off-center leakage R > G > B.
    """
    if mode not in {"mono", "rgb"}:
        raise ValueError(f"mode must be 'mono' or 'rgb', got {mode!r}")
    if mode == "mono":
        if kernel_spec != "P2":
            raise ValueError("mono mode expects kernel_spec 'P2'")
        return jnp.asarray(_P2[None])  # [1, 3, 3]
    if kernel_spec != "B2":
        raise ValueError("rgb mode expects kernel_spec 'B2'")
    return jnp.asarray(np.stack([_B2_RED, _B2_GREEN, _B2_BLUE]))  # [3, 3, 3]


def normalize_psf_energy(kernel: Array, eps: float = 1e-12) -> Array:
    """Normalize each output-channel kernel to sum ~1 (energy preservation).

    Mirrors reference ``newbp_layer.py:102-106``: per-kernel sum clamped to
    ``eps`` minimum, then divided out.
    """
    kernel = jnp.asarray(kernel)
    s = jnp.clip(
        jnp.sum(kernel.reshape(kernel.shape[0], -1), axis=1), min=eps
    )
    return kernel / s[:, None, None]


# ---------------------------------------------------------------------------
# Depthwise conv primitives (NHWC).
# ---------------------------------------------------------------------------

_PAD_MODES = {"zero": "constant", "replicate": "edge", "reflect": "reflect"}


def _pad_spatial(x: Array, ph: int, pw: int, padding: str) -> Array:
    if ph == 0 and pw == 0:
        return x
    mode = _PAD_MODES[padding]
    return jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode=mode)


def _expand_kernel(kernel: Array, channels: int) -> Array:
    """Canonical ``[C_k, kh, kw]`` -> HWIO depthwise rhs ``[kh, kw, 1, C]``.

    Mono kernels (``C_k == 1``) broadcast to all ``channels`` (reference
    ``newbp_layer.py:120-126`` ``expand(3,1,3,3)``).
    """
    kernel = jnp.asarray(kernel)
    if kernel.ndim == 2:
        kernel = kernel[None]
    ck = kernel.shape[0]
    if ck == 1 and channels > 1:
        kernel = jnp.broadcast_to(kernel, (channels,) + kernel.shape[1:])
    elif ck != channels:
        raise ValueError(
            f"kernel channels ({ck}) must be 1 or match input channels "
            f"({channels})"
        )
    # [C, kh, kw] -> [kh, kw, 1, C]
    return jnp.transpose(kernel, (1, 2, 0))[:, :, None, :]


_SHIFT_ADD_MAX_TAPS = 49


def depthwise_conv(
    x: Array,
    kernel: Array,
    *,
    padding: str = "zero",
    pad_same: bool = True,
) -> Array:
    """Depthwise (groups=C) cross-correlation, NHWC.

    Matches torch ``F.conv2d(x, k, groups=C)`` semantics (cross-correlation,
    no kernel flip). ``padding='zero'|'replicate'|'reflect'`` with SAME
    amounts when ``pad_same`` (otherwise VALID).

    TPU note: XLA lowers a depthwise conv over few channels (C=3 images)
    catastrophically — 3 of 128 lanes busy, measured >100x slower than
    roofline. Small kernels are therefore unrolled into kh*kw
    shift-multiply-adds: pure elementwise VPU work that XLA fuses into one
    pass over the image regardless of C. Large kernels fall back to
    ``lax.conv_general_dilated`` at HIGHEST precision.

    Args:
      x: ``[N, H, W, C]``.
      kernel: ``[C_k, kh, kw]`` canonical kernel (``C_k in {1, C}``).
    """
    if padding not in _PAD_MODES:
        raise ValueError(f"padding must be one of {sorted(_PAD_MODES)}")
    channels = x.shape[-1]
    kernel = jnp.asarray(kernel)
    if kernel.ndim == 2:
        kernel = kernel[None]
    ck, kh, kw = kernel.shape
    if ck not in (1, channels):
        raise ValueError(
            f"kernel channels ({ck}) must be 1 or match input channels "
            f"({channels})"
        )

    if kh * kw <= _SHIFT_ADD_MAX_TAPS:
        xp = _pad_spatial(x, kh // 2 if pad_same else 0,
                          kw // 2 if pad_same else 0, padding)
        h_out = xp.shape[1] - kh + 1
        w_out = xp.shape[2] - kw + 1
        taps = kernel.astype(x.dtype)  # [C_k, kh, kw]
        out = None
        for di in range(kh):
            for dj in range(kw):
                w_tap = taps[:, di, dj]  # [C_k] broadcasts over C
                term = xp[:, di : di + h_out, dj : dj + w_out, :] * w_tap
                out = term if out is None else out + term
        return out

    rhs = _expand_kernel(kernel, channels).astype(x.dtype)
    if pad_same:
        x = _pad_spatial(x, kh // 2, kw // 2, padding)
    return lax.conv_general_dilated(
        x,
        rhs,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels,
        precision=lax.Precision.HIGHEST,
    )


def _flip_kernel(kernel: Array) -> Array:
    """Spatially flip a canonical ``[C_k, kh, kw]`` kernel (the adjoint)."""
    return kernel[:, ::-1, ::-1]


# ---------------------------------------------------------------------------
# newbp_conv: custom-VJP depthwise conv with explicit adjoint backward.
# ---------------------------------------------------------------------------


@jax.custom_vjp
def newbp_conv(x: Array, kernel: Array) -> Array:
    """Depthwise conv (zero pad SAME) with an explicit adjoint backward.

    TPU-native rebuild of the reference's hand-written autograd op
    ``NewBPFunction`` (``newbp_layer.py:7-21``): forward is
    ``conv2d(x, K, groups=C)``; backward w.r.t. ``x`` is
    ``conv_transpose2d(g, K, groups=C)`` — implemented here as a depthwise
    conv of the cotangent with the spatially-flipped kernel, which is the
    exact adjoint for stride-1 SAME zero padding.

    The kernel is treated as a constant (no gradient), matching the
    buffer-not-parameter contract.
    """
    return depthwise_conv(x, kernel, padding="zero", pad_same=True)


def _newbp_conv_fwd(x: Array, kernel: Array):
    return newbp_conv(x, kernel), kernel


def _newbp_conv_bwd(kernel: Array, g: Array):
    dx = depthwise_conv(g, _flip_kernel(kernel), padding="zero", pad_same=True)
    return dx, jnp.zeros_like(kernel)


newbp_conv.defvjp(_newbp_conv_fwd, _newbp_conv_bwd)


def apply_psf(
    x: Array,
    kernel: Array,
    *,
    padding: str = "zero",
    explicit_adjoint: bool = True,
) -> Array:
    """Apply a (normalized) PSF kernel depthwise to an NHWC image batch.

    The shared loss/eval physics operator. With ``explicit_adjoint`` the
    custom-VJP :func:`newbp_conv` path is used (zero padding only); otherwise
    plain autodiff through :func:`depthwise_conv`.
    """
    if explicit_adjoint and padding == "zero":
        return newbp_conv(x, jnp.asarray(kernel))
    return depthwise_conv(x, kernel, padding=padding, pad_same=True)


# ---------------------------------------------------------------------------
# CrosstalkPSF module.
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class CrosstalkPSF:
    """Fixed PSF used ONLY in the loss graph (output-side consistency).

    JAX rebuild of reference ``CrosstalkPSF`` (``newbp_layer.py:88-126``):

    - ``mode='mono'``: canonical kernel ``[1, 3, 3]``, broadcast depthwise
      to all C channels.
    - ``mode='rgb'``: kernel ``[3, 3, 3]``, requires 3-channel sRGB input.
    - Kernel is energy-normalized at construction (sum ~1 per out-channel)
      and is **state, not a parameter**: it is a pytree leaf (rides
      checkpoints / device placement) but receives zero gradient via the
      custom-VJP conv.

    Invariants (Scenario B): the backbone forward never applies K; this
    module is called exactly once, in the physics loss term.
    """

    mode: str
    kernel: Array  # [C_k, 3, 3], energy-normalized

    @classmethod
    def create(cls, mode: str, kernels: Array) -> "CrosstalkPSF":
        if mode not in {"mono", "rgb"}:
            raise ValueError(f"mode must be 'mono' or 'rgb', got {mode!r}")
        kernel = jnp.asarray(kernels, dtype=jnp.float32)
        if kernel.ndim == 2:
            kernel = kernel[None]
        if kernel.ndim == 4:  # accept torch-style [C,1,kh,kw]
            kernel = kernel[:, 0]
        if mode == "mono" and kernel.shape != (1, 3, 3):
            raise ValueError(
                f"mono mode expects kernel [1,3,3], got {kernel.shape}"
            )
        if mode == "rgb" and kernel.shape != (3, 3, 3):
            raise ValueError(
                f"rgb mode expects kernel [3,3,3], got {kernel.shape}"
            )
        return cls(mode=mode, kernel=normalize_psf_energy(kernel))

    def __call__(self, x: Array) -> Array:
        """Depthwise PSF conv on sRGB NHWC input (padding=1, stride=1)."""
        if x.shape[-1] != 3:
            raise ValueError(
                "CrosstalkPSF expects sRGB inputs (3 channels, NHWC); got "
                f"shape {x.shape}"
            )
        kernel = jax.lax.stop_gradient(self.kernel)
        return newbp_conv(x, kernel)

    # pytree protocol: kernel is a leaf (device-movable state), mode is aux.
    def tree_flatten(self):
        return (self.kernel,), self.mode

    @classmethod
    def tree_unflatten(cls, mode, children):
        return cls(mode=mode, kernel=children[0])


def create_crosstalk_psf(
    mode: str = "mono", kernel_spec: Optional[str] = None
) -> CrosstalkPSF:
    """Factory mirroring reference ``create_crosstalk_psf``
    (``newbp_net_arch.py:88-99``): validates mode, builds canonical kernels,
    wraps them in :class:`CrosstalkPSF`.
    """
    if mode not in {"mono", "rgb"}:
        raise ValueError(f"mode must be 'mono' or 'rgb', got {mode!r}")
    if kernel_spec is None:
        kernel_spec = "P2" if mode == "mono" else "B2"
    return CrosstalkPSF.create(mode, build_psf_kernels(mode, kernel_spec))


class NewBPLayer:
    """Deprecated input-side crosstalk layer (API-compat error stub).

    The reference keeps a legacy layer that raises when used with
    ``deprecated=True`` (default) because Scenario B forbids input-side
    crosstalk (``newbp_layer.py:24-85``). We preserve the guard.
    """

    def __init__(self, *args, deprecated: bool = True, **kwargs):
        self.deprecated = deprecated
        if not deprecated:
            raise NotImplementedError(
                "Input-side NewBPLayer is not supported in the TPU rebuild; "
                "use CrosstalkPSF in the loss path (Scenario B)."
            )

    def __call__(self, x):
        raise RuntimeError(
            "Deprecated: use CrosstalkPSF in loss path (Scenario B)"
        )
