"""TLC (Test-time Local Converter) windowed statistics.

Rebuild of reference ``local_arch.py:10-105`` + ``NAFNet_arch.py:164-174``
(component C11): at test time on large images, the NAFBlock's *global*
average pool (SCA) creates a train/test statistics mismatch; TLC replaces
it with a **windowed** mean sized ~1.5x the training crop, computed via a
2-D cumulative sum (integral image) — O(HW) regardless of window size,
which maps to two cheap prefix-scan ops on TPU.

Usage: build the model with ``sca_window=(kh, kw)`` (see
``models.nafnet.NAFNet`` ``tlc_window`` argument) or call
:func:`windowed_mean` directly.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def windowed_mean(x: Array, window: Tuple[int, int]) -> Array:
    """Per-pixel mean over a local window (NHWC), edge-clipped.

    Equivalent to the reference's cumsum ``AvgPool2d`` replacement: each
    output position (i, j) averages the input over a window of at most
    ``window`` centered/clipped the same way the reference computes it
    (windows are anchored by integral-image corner differences; positions
    near the border use the clipped true count).
    """
    kh, kw = window
    n, h, w, c = x.shape
    # no clamping to the image size: index clipping below already bounds the
    # window, and a window >= 2x the image must degrade to the global mean
    # for every pixel (train/test statistics consistency).

    xf = x.astype(jnp.float32)
    # integral image with a leading zero row/col
    ii = jnp.cumsum(jnp.cumsum(xf, axis=1), axis=2)
    ii = jnp.pad(ii, ((0, 0), (1, 0), (1, 0), (0, 0)))

    # window [r0, r1) x [c0, c1) per output pixel, clipped to the image
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    r0 = jnp.clip(rows - kh // 2, 0, h)
    r1 = jnp.clip(rows + (kh + 1) // 2, 0, h)
    c0 = jnp.clip(cols - kw // 2, 0, w)
    c1 = jnp.clip(cols + (kw + 1) // 2, 0, w)

    s11 = ii[:, r1][:, :, c1]
    s01 = ii[:, r0][:, :, c1]
    s10 = ii[:, r1][:, :, c0]
    s00 = ii[:, r0][:, :, c0]
    total = s11 - s01 - s10 + s00
    cnt = ((r1 - r0)[:, None] * (c1 - c0)[None, :]).astype(jnp.float32)
    return (total / cnt[None, :, :, None]).astype(x.dtype)


def tlc_window_from_train_size(train_size: Tuple[int, int],
                               ratio: float = 1.5) -> Tuple[int, int]:
    """The reference sizes TLC windows at ``1.5 x train_size``."""
    return (int(train_size[0] * ratio), int(train_size[1] * ratio))
