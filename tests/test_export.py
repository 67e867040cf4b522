"""AOT export (StableHLO) roundtrip + serving-parity tests.

Covers ``lowlight_image_enhancement_tpu/export.py``: serialize the
forward at static buckets, reload through ``ExportedModel`` (which uses
only the artifact — no Flax model code), and check predictions against
the live-jit forward. Reference deployment counterpart:
``basicsr/demo.py:18-59`` (rebuild-graph-from-code + ``.pth``).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lowlight_image_enhancement_tpu.export import (
    ExportedModel,
    export_model,
    flatten_params,
    unflatten_params,
)
from lowlight_image_enhancement_tpu.models import define_network

TINY = {
    "type": "NAFNet",
    "width": 8,
    "enc_blk_nums": (1,),
    "middle_blk_num": 1,
    "dec_blk_nums": (1,),
}


@pytest.fixture(scope="module")
def tiny_net_params():
    net = define_network(dict(TINY))
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    return net, variables["params"]


@pytest.fixture(scope="module")
def export_dir(tiny_net_params, tmp_path_factory):
    net, params = tiny_net_params
    out = str(tmp_path_factory.mktemp("exported"))
    export_model(net, params, out, buckets=[(32, 32), (64, 48)],
                 batch=1, platforms=("cpu",), network_opt=TINY)
    return out


def test_flatten_roundtrip(tiny_net_params):
    _, params = tiny_net_params
    flat = flatten_params(params)
    assert all(isinstance(v, np.ndarray) for v in flat.values())
    back = unflatten_params(flat)
    jax.tree.map(np.testing.assert_array_equal, params,
                 jax.tree.map(np.asarray, back))


def test_artifact_layout(export_dir):
    files = sorted(os.listdir(export_dir))
    assert "manifest.json" in files and "params.npz" in files
    with open(os.path.join(export_dir, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["buckets"] == [[32, 32], [64, 48]]
    assert manifest["network_opt"]["type"] == "NAFNet"
    for fname in manifest["bucket_files"].values():
        assert os.path.getsize(os.path.join(export_dir, fname)) > 0


def test_exported_matches_live_forward(export_dir, tiny_net_params):
    net, params = tiny_net_params
    model = ExportedModel(export_dir)
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    got = model.predict(img)
    want = np.asarray(
        jnp.clip(net.apply({"params": params}, jnp.asarray(img[None])), 0, 1)
    )[0]
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.shape == img.shape


def test_bucket_pick_pad_and_crop(export_dir):
    model = ExportedModel(export_dir)
    # 30x40 only fits the 64x48 bucket; result must crop back exactly
    img = np.random.default_rng(2).uniform(0, 1, (30, 40, 3)).astype(
        np.float32)
    out = model.predict(img)
    assert out.shape == (30, 40, 3)
    # way-too-large input names the failure
    with pytest.raises(ValueError, match="exceeds every exported bucket"):
        model.predict(np.zeros((128, 128, 3), np.float32))


def test_loader_needs_no_model_code(export_dir):
    """ExportedModel must run from the artifact alone — parity with a
    fresh load whose params come only from params.npz."""
    model = ExportedModel(export_dir)
    flat = dict(np.load(os.path.join(export_dir, "params.npz")))
    assert flat  # params actually stored
    img = np.random.default_rng(3).uniform(0, 1, (32, 32, 3)).astype(
        np.float32)
    a = model.predict(img)
    b = ExportedModel(export_dir).predict(img)
    np.testing.assert_array_equal(a, b)


def test_format_version_guard(export_dir, tmp_path):
    import shutil

    bad = tmp_path / "bad"
    shutil.copytree(export_dir, bad)
    mpath = bad / "manifest.json"
    manifest = json.loads(mpath.read_text())
    manifest["format_version"] = 999
    mpath.write_text(json.dumps(manifest))
    with pytest.raises(ValueError, match="unsupported export format"):
        ExportedModel(str(bad))


class TestShardedExport:
    """Sharded (multi-chip) export over the 8-device virtual mesh."""

    @pytest.fixture(scope="class")
    def sharded_dir(self, tiny_net_params, tmp_path_factory):
        net, params = tiny_net_params
        mesh = jax.make_mesh((8,), ("data",))
        out = str(tmp_path_factory.mktemp("exported_sharded"))
        export_model(net, params, out, buckets=[(32, 32)], batch=8,
                     platforms=("cpu",), network_opt=TINY, mesh=mesh)
        return out

    def test_manifest_records_mesh(self, sharded_dir):
        with open(os.path.join(sharded_dir, "manifest.json")) as f:
            manifest = json.load(f)
        assert manifest["mesh"] == {"axis": "data", "size": 8}
        assert manifest["batch"] == 8

    def test_sharded_predict_batch_matches_live(self, sharded_dir,
                                                tiny_net_params):
        net, params = tiny_net_params
        model = ExportedModel(sharded_dir)
        assert model.mesh is not None and model.mesh.size == 8
        rng = np.random.default_rng(7)
        imgs = [rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
                for _ in range(8)]
        got = model.predict_batch(imgs)
        x = jnp.asarray(np.stack(imgs))
        want = np.asarray(
            jnp.clip(net.apply({"params": params}, x), 0.0, 1.0))
        assert len(got) == 8
        np.testing.assert_allclose(np.stack(got), want, atol=1e-5)

    def test_batch_not_divisible_by_mesh_rejected(self, tiny_net_params,
                                                  tmp_path):
        net, params = tiny_net_params
        mesh = jax.make_mesh((8,), ("data",))
        with pytest.raises(ValueError, match="not divisible by mesh"):
            export_model(net, params, str(tmp_path), buckets=[(32, 32)],
                         batch=4, platforms=("cpu",), mesh=mesh)


def test_predict_batch_unsharded_chunks(export_dir, tiny_net_params):
    """predict_batch packs into batch-1 calls and preserves per-image
    shapes across mixed sizes (both buckets exercised)."""
    model = ExportedModel(export_dir)
    rng = np.random.default_rng(9)
    imgs = [rng.uniform(0, 1, (32, 32, 3)).astype(np.float32),
            rng.uniform(0, 1, (30, 40, 3)).astype(np.float32),
            rng.uniform(0, 1, (60, 44, 3)).astype(np.float32)]
    outs = model.predict_batch(imgs)
    assert [o.shape for o in outs] == [im.shape for im in imgs]
    np.testing.assert_allclose(outs[0], model.predict(imgs[0]), atol=1e-6)
