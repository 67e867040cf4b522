"""Ahead-of-time model export for deployment (StableHLO via ``jax.export``).

The reference deploys by shipping Python model code plus a ``.pth`` file
and re-building the graph in every serving process (``demo.py``,
``basicsr/test.py``). The TPU-native deployment unit is different: XLA
programs are traced once and compiled per static shape, so the natural
artifact is the **serialized StableHLO** of the forward at each serving
bucket — loadable with ``jax.export.deserialize`` by a process that needs
neither Flax nor this package's model code, and runnable on any listed
platform (TPU/CPU).

Artifact layout (a directory):

- ``manifest.json`` — format version, bucket shapes, platforms, dtype,
  network options, jax version;
- ``bucket_{B}x{H}x{W}.hlo`` — one serialized ``jax.export.Exported`` per
  bucket, taking ``(params, x[B,H,W,3] float32)`` -> clipped float32;
- ``params.npz`` — flat ``{path: array}`` of the network params (kept
  OUTSIDE the HLO so one params file serves all buckets and can be
  hot-swapped without re-exporting).

``ExportedModel`` mirrors the bucket-pad-crop serving conventions of
:class:`lowlight_image_enhancement_tpu.serving.RestorationServer` so
results match the live-jit path exactly on bucket-sized inputs.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_FORMAT_VERSION = 1
_SEP = "//"  # flat param-path separator (param names may contain '/')


# ---------------------------------------------------------------------------
# param tree <-> flat npz
# ---------------------------------------------------------------------------

def flatten_params(params: Any) -> Dict[str, np.ndarray]:
    """Nested param dict -> flat ``{'a//b//w': ndarray}``."""
    out: Dict[str, np.ndarray] = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, prefix + [str(k)])
        else:
            out[_SEP.join(prefix)] = np.asarray(node)

    rec(params, [])
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Inverse of :func:`flatten_params`."""
    tree: Dict[str, Any] = {}
    for path, arr in flat.items():
        parts = path.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr
    return tree


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

def export_model(
    net,
    params: Any,
    out_dir: str,
    buckets: Sequence[Tuple[int, int]] = ((256, 256), (512, 512)),
    batch: int = 1,
    platforms: Sequence[str] = ("tpu", "cpu"),
    network_opt: Optional[dict] = None,
    mesh: Optional[jax.sharding.Mesh] = None,
) -> str:
    """Serialize the clipped forward at each static bucket shape.

    ``platforms`` lists every backend the artifact must run on
    (multi-platform lowering; ``cpu`` included by default so artifacts are
    smoke-testable off-chip). With ``mesh`` (a 1-D data mesh) the export
    is SHARDED: params replicated, batch split over the mesh axis — the
    artifact then requires exactly ``mesh.size`` devices at load time and
    serves multi-chip batches with no Python model code. Returns
    ``out_dir``.
    """
    from jax import export as jexport

    os.makedirs(out_dir, exist_ok=True)

    def forward(p, x):
        return jnp.clip(net.apply({"params": p}, x), 0.0, 1.0)

    mesh_axis = None
    if mesh is not None:
        if len(mesh.axis_names) != 1:
            raise ValueError(f"export needs a 1-D mesh, got {mesh.shape}")
        mesh_axis = mesh.axis_names[0]
        if batch % mesh.size:
            raise ValueError(
                f"batch {batch} not divisible by mesh size {mesh.size}")
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        bsh = NamedSharding(mesh, PartitionSpec(mesh_axis))
        params_shardings = jax.tree.map(lambda _: rep, params)
        jit_fwd = jax.jit(forward, in_shardings=(params_shardings, bsh),
                          out_shardings=bsh)
    else:
        jit_fwd = jax.jit(forward)

    flat = flatten_params(params)
    np.savez(os.path.join(out_dir, "params.npz"), **flat)
    params_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
        params,
    )

    bucket_files = {}
    for h, w in buckets:
        exp = jexport.export(jit_fwd, platforms=tuple(platforms))(
            params_spec,
            jax.ShapeDtypeStruct((batch, int(h), int(w), 3), jnp.float32),
        )
        name = f"bucket_{batch}x{int(h)}x{int(w)}.hlo"
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(exp.serialize())
        bucket_files[f"{int(h)}x{int(w)}"] = name

    manifest = {
        "format_version": _FORMAT_VERSION,
        "kind": "lowlight_image_enhancement_tpu.export",
        "batch": int(batch),
        "buckets": sorted([list(map(int, b)) for b in buckets]),
        "bucket_files": bucket_files,
        "platforms": list(platforms),
        "jax_version": jax.__version__,
        "network_opt": network_opt or {},
        "mesh": ({"axis": mesh_axis, "size": int(mesh.size)}
                 if mesh is not None else None),
        "io": "forward(params, x[B,H,W,3] float32 RGB [0,1]) -> "
              "float32 clipped [0,1]",
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return out_dir


# ---------------------------------------------------------------------------
# load + serve
# ---------------------------------------------------------------------------

class ExportedModel:
    """Load an export directory and serve images from the AOT artifacts.

    Needs only jax + numpy (no Flax, no model code). Bucket choice,
    zero-padding and crop-back mirror ``RestorationServer``.
    """

    def __init__(self, path: str):
        from jax import export as jexport

        with open(os.path.join(path, "manifest.json")) as f:
            self.manifest = json.load(f)
        if self.manifest.get("format_version") != _FORMAT_VERSION:
            raise ValueError(
                f"unsupported export format "
                f"{self.manifest.get('format_version')!r} "
                f"(this loader speaks {_FORMAT_VERSION})"
            )
        self.batch = int(self.manifest["batch"])
        flat = dict(np.load(os.path.join(path, "params.npz")))
        self.params = unflatten_params(flat)
        self.mesh = None
        self._batch_sharding = None
        mesh_info = self.manifest.get("mesh")
        if mesh_info:
            from jax.sharding import NamedSharding, PartitionSpec

            n = int(mesh_info["size"])
            if len(jax.devices()) < n:
                raise ValueError(
                    f"sharded export needs {n} devices, "
                    f"{len(jax.devices())} visible")
            axis = mesh_info["axis"]
            self.mesh = jax.make_mesh((n,), (axis,))
            self._batch_sharding = NamedSharding(
                self.mesh, PartitionSpec(axis))
            rep = NamedSharding(self.mesh, PartitionSpec())
            self.params = jax.device_put(
                self.params, jax.tree.map(lambda _: rep, self.params))
        self._fns: Dict[Tuple[int, int], Any] = {}
        for key, fname in self.manifest["bucket_files"].items():
            h, w = map(int, key.split("x"))
            with open(os.path.join(path, fname), "rb") as f:
                self._fns[(h, w)] = jexport.deserialize(f.read())
        if not self._fns:
            raise ValueError(f"export at {path} contains no buckets")

    @property
    def buckets(self) -> List[Tuple[int, int]]:
        return sorted(self._fns)

    def _pick_bucket(self, h: int, w: int) -> Tuple[int, int]:
        fits = [(bh, bw) for bh, bw in self.buckets if bh >= h and bw >= w]
        if not fits:
            raise ValueError(
                f"input {h}x{w} exceeds every exported bucket "
                f"{self.buckets}; re-export with a larger bucket or use "
                f"the live RestorationServer tiled path"
            )
        return min(fits, key=lambda b: b[0] * b[1])

    def _call(self, bucket: Tuple[int, int], x: np.ndarray) -> np.ndarray:
        xj = jnp.asarray(x)
        if self._batch_sharding is not None:
            xj = jax.device_put(xj, self._batch_sharding)
        return np.asarray(self._fns[bucket].call(self.params, xj))

    def predict(self, img: np.ndarray) -> np.ndarray:
        """float [0,1] HWC RGB -> restored float32 HWC, same H x W."""
        img = np.asarray(img, np.float32)
        if img.ndim != 3 or img.shape[-1] != 3:
            raise ValueError(f"expected HWC RGB, got {img.shape}")
        h, w = img.shape[:2]
        bh, bw = self._pick_bucket(h, w)
        x = np.zeros((self.batch, bh, bw, 3), np.float32)
        x[0, :h, :w, :] = img
        return self._call((bh, bw), x)[0, :h, :w, :]

    def predict_batch(self, imgs: Sequence[np.ndarray]) -> List[np.ndarray]:
        """Serve many images, packing ``batch`` per call (one shared
        bucket per chunk — the bucket that fits the chunk's largest)."""
        imgs = [np.asarray(im, np.float32) for im in imgs]
        out: List[np.ndarray] = []
        for start in range(0, len(imgs), self.batch):
            chunk = imgs[start : start + self.batch]
            bh, bw = self._pick_bucket(
                max(im.shape[0] for im in chunk),
                max(im.shape[1] for im in chunk),
            )
            x = np.zeros((self.batch, bh, bw, 3), np.float32)
            for i, im in enumerate(chunk):
                x[i, : im.shape[0], : im.shape[1], :] = im
            y = self._call((bh, bw), x)
            out.extend(
                y[i, : im.shape[0], : im.shape[1], :]
                for i, im in enumerate(chunk)
            )
        return out
