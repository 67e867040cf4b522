"""InceptionV3 pool3 (FID extractor): conversion parity vs torch.

Hermetic counterpart of the VGG19/LPIPS converter tests: build the SAME
architecture in torch (in-image; torchvision is absent so the blocks are
reconstructed here following torchvision/pytorch-fid's published
layout), randomize its weights AND BatchNorm running stats, convert the
state dict with ``tools/convert_inception_weights.py`` machinery, and
assert the Flax trunk (``models/inception.py``) reproduces the torch
forward. This validates the converter key mapping, OIHW->HWIO
transposes, the analytic frozen-BN math (eps 1e-3), every block's
padding/stride, and both pooling-semantics variants
(``count_include_pad`` / the FID max-pool ``Mixed_7c``).

Reference contract: ``NAFNet_base/basicsr/metrics/fid.py:14-25``
(``InceptionV3([3], resize_input=True, normalize_input=False)``).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from lowlight_image_enhancement_tpu.models.inception import (  # noqa: E402
    InceptionV3Pool3,
    _avg_pool_3x3_s1,
    load_inception_v3,
)

import importlib.util  # noqa: E402
import os  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "convert_inception_weights",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "convert_inception_weights.py"))
_conv_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_conv_mod)
convert_state_dict = _conv_mod.convert_state_dict


# ---------------------------------------------------------------------------
# torch-side reference blocks (torchvision inception_v3 layout; FID
# variant pooling per pytorch-fid)
# ---------------------------------------------------------------------------


class TBasicConv(tnn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _avg(x, fid):
    return F.avg_pool2d(x, 3, stride=1, padding=1,
                        count_include_pad=not fid)


class TInceptionA(tnn.Module):
    def __init__(self, cin, pool_features, fid):
        super().__init__()
        self.fid = fid
        self.branch1x1 = TBasicConv(cin, 64, kernel_size=1)
        self.branch5x5_1 = TBasicConv(cin, 48, kernel_size=1)
        self.branch5x5_2 = TBasicConv(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = TBasicConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, kernel_size=3, padding=1)
        self.branch_pool = TBasicConv(cin, pool_features, kernel_size=1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(
                self.branch3x3dbl_1(x))),
            self.branch_pool(_avg(x, self.fid)),
        ], 1)


class TInceptionB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = TBasicConv(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = TBasicConv(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = TBasicConv(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(
                self.branch3x3dbl_1(x))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class TInceptionC(tnn.Module):
    def __init__(self, cin, c7, fid):
        super().__init__()
        self.fid = fid
        self.branch1x1 = TBasicConv(cin, 192, kernel_size=1)
        self.branch7x7_1 = TBasicConv(cin, c7, kernel_size=1)
        self.branch7x7_2 = TBasicConv(c7, c7, kernel_size=(1, 7),
                                      padding=(0, 3))
        self.branch7x7_3 = TBasicConv(c7, 192, kernel_size=(7, 1),
                                      padding=(3, 0))
        self.branch7x7dbl_1 = TBasicConv(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = TBasicConv(c7, c7, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7dbl_3 = TBasicConv(c7, c7, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch7x7dbl_4 = TBasicConv(c7, c7, kernel_size=(7, 1),
                                         padding=(3, 0))
        self.branch7x7dbl_5 = TBasicConv(c7, 192, kernel_size=(1, 7),
                                         padding=(0, 3))
        self.branch_pool = TBasicConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_1(x)
        bd = self.branch7x7dbl_3(self.branch7x7dbl_2(bd))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(bd))
        return torch.cat([
            self.branch1x1(x), b7, bd,
            self.branch_pool(_avg(x, self.fid)),
        ], 1)


class TInceptionD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = TBasicConv(cin, 192, kernel_size=1)
        self.branch3x3_2 = TBasicConv(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = TBasicConv(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = TBasicConv(192, 192, kernel_size=(1, 7),
                                        padding=(0, 3))
        self.branch7x7x3_3 = TBasicConv(192, 192, kernel_size=(7, 1),
                                        padding=(3, 0))
        self.branch7x7x3_4 = TBasicConv(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x)))),
            F.max_pool2d(x, 3, stride=2),
        ], 1)


class TInceptionE(tnn.Module):
    def __init__(self, cin, pool_mode, fid):
        super().__init__()
        self.pool_mode = pool_mode
        self.fid = fid
        self.branch1x1 = TBasicConv(cin, 320, kernel_size=1)
        self.branch3x3_1 = TBasicConv(cin, 384, kernel_size=1)
        self.branch3x3_2a = TBasicConv(384, 384, kernel_size=(1, 3),
                                       padding=(0, 1))
        self.branch3x3_2b = TBasicConv(384, 384, kernel_size=(3, 1),
                                       padding=(1, 0))
        self.branch3x3dbl_1 = TBasicConv(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = TBasicConv(448, 384, kernel_size=3,
                                         padding=1)
        self.branch3x3dbl_3a = TBasicConv(384, 384, kernel_size=(1, 3),
                                          padding=(0, 1))
        self.branch3x3dbl_3b = TBasicConv(384, 384, kernel_size=(3, 1),
                                          padding=(1, 0))
        self.branch_pool = TBasicConv(cin, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd),
                        self.branch3x3dbl_3b(bd)], 1)
        if self.pool_mode == "max":
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = _avg(x, self.fid)
        return torch.cat([self.branch1x1(x), b3, bd,
                          self.branch_pool(bp)], 1)


class TInceptionTrunk(tnn.Module):
    def __init__(self, fid=True):
        super().__init__()
        self.Conv2d_1a_3x3 = TBasicConv(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = TBasicConv(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = TBasicConv(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = TBasicConv(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = TBasicConv(80, 192, kernel_size=3)
        self.Mixed_5b = TInceptionA(192, 32, fid)
        self.Mixed_5c = TInceptionA(256, 64, fid)
        self.Mixed_5d = TInceptionA(288, 64, fid)
        self.Mixed_6a = TInceptionB(288)
        self.Mixed_6b = TInceptionC(768, 128, fid)
        self.Mixed_6c = TInceptionC(768, 160, fid)
        self.Mixed_6d = TInceptionC(768, 160, fid)
        self.Mixed_6e = TInceptionC(768, 192, fid)
        self.Mixed_7a = TInceptionD(768)
        self.Mixed_7b = TInceptionE(1280, "avg", fid)
        self.Mixed_7c = TInceptionE(2048, "max" if fid else "avg", fid)

    def forward(self, x):
        x = self.Conv2d_1a_3x3(x)
        x = self.Conv2d_2a_3x3(x)
        x = self.Conv2d_2b_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_3b_1x1(x)
        x = self.Conv2d_4a_3x3(x)
        x = F.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        return F.adaptive_avg_pool2d(x, 1).flatten(1)


def _randomize(model: tnn.Module, seed: int) -> None:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, tnn.Conv2d):
                m.weight.normal_(0, 0.05, generator=g)
            elif isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0, 0.1, generator=g)
                m.running_mean.normal_(0, 0.1, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_avg_pool_count_include_pad_semantics():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 6, 7, 3)).astype(np.float32)
    xt = torch.tensor(x.transpose(0, 3, 1, 2))
    for fid in (True, False):
        ours = np.asarray(_avg_pool_3x3_s1(jnp.asarray(x),
                                           count_include_pad=not fid))
        ref = _avg(xt, fid).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=1e-6,
                                   err_msg=f"fid={fid}")


@pytest.mark.slow
@pytest.mark.parametrize("fid", [True, False])
def test_pool3_conversion_parity(fid):
    tmodel = TInceptionTrunk(fid=fid).eval()
    _randomize(tmodel, seed=7 if fid else 8)
    npz = convert_state_dict(tmodel.state_dict())
    assert sum(1 for k in npz if k.endswith(".conv.weight")) == 94

    module = InceptionV3Pool3(fid_variant=fid, resize_input=False,
                              normalize_input=False)
    init_vars = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 299, 299, 3), jnp.float32))
    from lowlight_image_enhancement_tpu.models.inception import (
        _npz_to_params,
    )

    params = _npz_to_params(npz, init_vars["params"])

    rng = np.random.default_rng(9)
    x = rng.uniform(-1, 1, (1, 299, 299, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(module.apply({"params": params}, jnp.asarray(x)))
    assert ours.shape == (1, 2048) == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-4)


def test_load_without_weights_reports_random(monkeypatch, tmp_path):
    monkeypatch.delenv("LLIE_INCEPTION_NPZ", raising=False)
    module, variables, pretrained = load_inception_v3()
    assert pretrained is False
    # deterministic init: loading twice gives identical params
    _, v2, _ = load_inception_v3()
    a = jax.tree_util.tree_leaves(variables)[0]
    b = jax.tree_util.tree_leaves(v2)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fid_default_requires_weights(monkeypatch):
    from lowlight_image_enhancement_tpu.metrics.fid import (
        inception_feature_extractor,
    )

    monkeypatch.delenv("LLIE_INCEPTION_NPZ", raising=False)
    with pytest.raises(RuntimeError, match="InceptionV3 weights"):
        inception_feature_extractor()


@pytest.mark.slow
def test_fid_random_trunk_self_consistency(monkeypatch):
    from lowlight_image_enhancement_tpu.metrics.fid import (
        calculate_fid,
        inception_feature_extractor,
    )

    monkeypatch.delenv("LLIE_INCEPTION_NPZ", raising=False)
    ex = inception_feature_extractor(allow_random=True)
    assert ex.metadata["pretrained"] is False
    rng = np.random.default_rng(1)
    imgs1 = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    imgs2 = rng.uniform(0, 1, (4, 64, 64, 3)).astype(np.float32)
    same = calculate_fid(imgs1, imgs1, ex, batch_size=2)
    diff = calculate_fid(imgs1, imgs2, ex, batch_size=2)
    assert same < 1e-4
    assert diff >= same


def test_converted_npz_roundtrip_via_loader(monkeypatch, tmp_path):
    """End-to-end: save a converted npz, point $LLIE_INCEPTION_NPZ at
    it, and check load_inception_v3 reports pretrained and uses the
    converted kernels."""
    tmodel = TInceptionTrunk(fid=True).eval()
    _randomize(tmodel, seed=3)
    npz = convert_state_dict(tmodel.state_dict())
    path = tmp_path / "inc.npz"
    np.savez(path, **npz)
    monkeypatch.setenv("LLIE_INCEPTION_NPZ", str(path))
    module, variables, pretrained = load_inception_v3()
    assert pretrained is True
    got = np.asarray(
        variables["params"]["Conv2d_1a_3x3"]["kernel"])
    want = np.transpose(npz["Conv2d_1a_3x3.conv.weight"], (2, 3, 1, 0))
    np.testing.assert_array_equal(got, want)
