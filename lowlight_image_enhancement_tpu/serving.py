"""Production inference serving: static-shape bucketing + batched forward.

The reference serves single images through ``demo.py`` with dynamic shapes
— fine on GPUs, hostile on TPU where every new shape recompiles. This
module is the TPU-native serving layer:

- **Shape bucketing**: arbitrary H x W inputs are padded up to a small set
  of static buckets (powers-of-two steps, aligned to the model's padder
  size), so the jit cache stays bounded and warm.
- **Batching**: requests sharing a bucket run as one padded batch.
- **Tiling**: inputs larger than ``max_bucket`` fall back to overlapping
  tiled inference (``training.validation.tiled_inference``) with one
  static tile shape.
- Optional device mesh: batches shard over ``data`` for multi-chip serving.

Example::

    server = RestorationServer(net, params)
    outs = server.predict([img_hwc_1, img_hwc_2, ...])  # float [0,1] HWC
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _bucket_dim(size: int, step: int, min_size: int) -> int:
    """Round up to the bucket grid (multiples of ``step``, >= min_size)."""
    b = max(size, min_size)
    return ((b + step - 1) // step) * step


class RestorationServer:
    """Batched, bucketed restoration inference."""

    def __init__(
        self,
        net,
        params,
        bucket_step: int = 64,
        min_bucket: int = 64,
        max_bucket: int = 1024,
        max_batch: int = 8,
        tile_overlap: float = 0.5,
        mesh=None,
    ):
        self.net = net
        self.params = params
        self.bucket_step = bucket_step
        self.min_bucket = min_bucket
        self.max_bucket = max_bucket
        self.max_batch = max_batch
        self.tile_overlap = tile_overlap
        self.mesh = mesh
        self._fns: Dict[Tuple[int, int, int], Any] = {}

    # ------------------------------------------------------------------
    def _forward_fn(self, batch: int, h: int, w: int):
        key = (batch, h, w)
        if key not in self._fns:
            net = self.net

            @jax.jit
            def fn(params, x):
                return net.apply({"params": params}, x)

            self._fns[key] = fn
        return self._fns[key]

    def warmup(self, shapes: Sequence[Tuple[int, int]],
               batch: int = 1) -> None:
        """Pre-compile buckets (e.g. at deployment time)."""
        for h, w in shapes:
            bh = _bucket_dim(h, self.bucket_step, self.min_bucket)
            bw = _bucket_dim(w, self.bucket_step, self.min_bucket)
            fn = self._forward_fn(batch, bh, bw)
            out = fn(self.params, jnp.zeros((batch, bh, bw, 3)))
            jax.block_until_ready(out)

    # ------------------------------------------------------------------
    def _predict_bucket(self, imgs: List[np.ndarray],
                        indices: List[int],
                        out: List[Optional[np.ndarray]]) -> None:
        bh = _bucket_dim(max(im.shape[0] for im in imgs),
                         self.bucket_step, self.min_bucket)
        bw = _bucket_dim(max(im.shape[1] for im in imgs),
                         self.bucket_step, self.min_bucket)
        for start in range(0, len(imgs), self.max_batch):
            chunk = imgs[start : start + self.max_batch]
            idxs = indices[start : start + self.max_batch]
            n = len(chunk)
            batch = np.zeros((self.max_batch, bh, bw, 3), np.float32)
            for i, im in enumerate(chunk):
                batch[i, : im.shape[0], : im.shape[1], :] = im
            x = jnp.asarray(batch)
            if self.mesh is not None:
                from lowlight_image_enhancement_tpu.parallel.mesh import (
                    batch_sharding,
                )

                x = jax.device_put(x, batch_sharding(self.mesh))
            fn = self._forward_fn(self.max_batch, bh, bw)
            y = np.asarray(fn(self.params, x))
            for i, idx in enumerate(idxs):
                im = imgs[start + i]
                out[idx] = y[i, : im.shape[0], : im.shape[1], :]

    def _predict_tiled(self, img: np.ndarray) -> np.ndarray:
        from lowlight_image_enhancement_tpu.training.validation import (
            tiled_inference,
        )

        nd = self.mesh.devices.size if self.mesh is not None else 1
        # round up to a multiple of the mesh size so tiled_inference does
        # not bump batch_tiles past the compiled batch (silent recompile)
        bt = ((max(8, nd) + nd - 1) // nd) * nd
        fn = self._forward_fn(bt, self.max_bucket, self.max_bucket)

        def forward(tiles):
            return fn(self.params, tiles)

        out = tiled_inference(
            forward, jnp.asarray(img[None]), self.max_bucket,
            self.tile_overlap, batch_tiles=bt, mesh=self.mesh,
        )
        return np.asarray(out[0])

    def predict(self, images: Sequence[np.ndarray]) -> List[np.ndarray]:
        """Restore a list of float [0,1] HWC images (any sizes).

        Returns outputs at the original sizes, in input order.
        """
        out: List[Optional[np.ndarray]] = [None] * len(images)
        buckets: Dict[Tuple[int, int], Tuple[List[np.ndarray], List[int]]] = \
            defaultdict(lambda: ([], []))
        for idx, img in enumerate(images):
            img = np.asarray(img, np.float32)
            if img.ndim != 3 or img.shape[-1] != 3:
                raise ValueError(f"expected HWC RGB image, got {img.shape}")
            h, w = img.shape[:2]
            if max(h, w) > self.max_bucket:
                out[idx] = self._predict_tiled(img)
                continue
            key = (
                _bucket_dim(h, self.bucket_step, self.min_bucket),
                _bucket_dim(w, self.bucket_step, self.min_bucket),
            )
            buckets[key][0].append(img)
            buckets[key][1].append(idx)
        for imgs, indices in buckets.values():
            self._predict_bucket(imgs, indices, out)
        return [o for o in out]  # type: ignore[return-value]
