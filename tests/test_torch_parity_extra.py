"""Torch->Flax migration parity for the remaining sweep backbones:
Baseline (C16) and SwinIR (C15).

- Baseline: loads the REAL reference module
  (``Baseline_arch.py:22-202``, executed in place — not copied), converts
  its ``state_dict`` with ``tools/convert_torch_baseline.py``, asserts
  forward parity NCHW-vs-NHWC on identical inputs.
- SwinIR: the reference only wraps the official external clone
  (``archs/swinir_arch.py:14-70``) which is NOT present in this
  environment, so the test builds a minimal torch replica *following the
  official ``network_swinir.py`` state_dict naming and forward semantics*
  (upsampler='' path) and converts it with
  ``tools/convert_torch_swinir.py`` — exercising the converter on the real
  key layout end-to-end.

Hermetic: random weights, no downloads. Skipped without torch.
"""

import importlib.util
import math
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-tier only

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_torch_baseline import (  # noqa: E402
    convert_state_dict as convert_baseline,
)
from convert_torch_baseline import flat_to_tree  # noqa: E402
from convert_torch_swinir import (  # noqa: E402
    convert_state_dict as convert_swinir,
)

REFERENCE_BASELINE = (
    "/root/reference/NAFNet_base/basicsr/models/archs/Baseline_arch.py")

needs_reference = pytest.mark.skipif(
    not os.path.exists(REFERENCE_BASELINE),
    reason="reference checkout not available",
)


def _load_reference_baseline():
    """Load reference Baseline with stubbed basicsr package context."""
    for name in ("basicsr", "basicsr.models", "basicsr.models.archs",
                 "basicsr.utils"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["basicsr.utils"].get_root_logger = (
        lambda *a, **k: __import__("logging").getLogger("stub")
    )

    def load(path, name):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    base = os.path.dirname(REFERENCE_BASELINE)
    load(os.path.join(base, "arch_util.py"),
         "basicsr.models.archs.arch_util")
    load(os.path.join(base, "local_arch.py"),
         "basicsr.models.archs.local_arch")
    arch = load(REFERENCE_BASELINE, "basicsr.models.archs.Baseline_arch")
    return arch.Baseline


class TestBaselineTorchParity:
    @needs_reference
    @pytest.mark.parametrize("shape", [(1, 3, 24, 24), (2, 3, 19, 26)])
    def test_forward_parity(self, rng, shape):
        from lowlight_image_enhancement_tpu.models.baseline import Baseline

        RefBaseline = _load_reference_baseline()
        tnet = RefBaseline(img_channel=3, width=8, middle_blk_num=1,
                           enc_blk_nums=[1, 1], dec_blk_nums=[1, 1])
        tnet.eval()
        # randomize beta/gamma so the residual scales actually matter
        with torch.no_grad():
            for n, p in tnet.named_parameters():
                if n.endswith(("beta", "gamma")):
                    p.copy_(torch.from_numpy(
                        rng.normal(0, 0.5, p.shape).astype(np.float32)))

        x = rng.uniform(0, 1, shape).astype(np.float32)
        with torch.no_grad():
            want = tnet(torch.from_numpy(x)).numpy()

        jnet = Baseline(img_channel=3, width=8, middle_blk_num=1,
                        enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
        params = flat_to_tree(convert_baseline(tnet.state_dict()))
        got = jnet.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)

    @needs_reference
    def test_converted_param_tree_complete(self, rng):
        """Every init-tree leaf is produced by the converter with the
        right shape (no silently-missing params)."""
        from lowlight_image_enhancement_tpu.models.baseline import Baseline

        RefBaseline = _load_reference_baseline()
        tnet = RefBaseline(img_channel=3, width=8, middle_blk_num=2,
                           enc_blk_nums=[1, 2], dec_blk_nums=[2, 1])
        conv = flat_to_tree(convert_baseline(tnet.state_dict()))
        jnet = Baseline(img_channel=3, width=8, middle_blk_num=2,
                        enc_blk_nums=(1, 2), dec_blk_nums=(2, 1))
        init = jnet.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 16, 16, 3)))["params"]

        init_flat = jax.tree_util.tree_leaves_with_path(init)
        conv_flat = {jax.tree_util.keystr(k): v.shape for k, v in
                     jax.tree_util.tree_leaves_with_path(conv)}
        for k, v in init_flat:
            ks = jax.tree_util.keystr(k)
            assert ks in conv_flat, f"missing from converter: {ks}"
            assert conv_flat[ks] == v.shape, (
                f"shape mismatch {ks}: {conv_flat[ks]} vs {v.shape}")


# ---------------------------------------------------------------------------
# Torch SwinIR replica (official network_swinir.py naming, upsampler='')
# ---------------------------------------------------------------------------


class _Mlp(tnn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = tnn.Linear(dim, hidden)
        self.act = tnn.GELU()
        self.fc2 = tnn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


def _win_part(x, ws):
    b, h, w, c = x.shape
    x = x.view(b, h // ws, ws, w // ws, ws, c)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws, ws, c)


def _win_rev(wins, ws, h, w):
    b = wins.shape[0] // (h * w // ws // ws)
    x = wins.view(b, h // ws, w // ws, ws, ws, -1)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(b, h, w, -1)


class _WindowAttention(tnn.Module):
    def __init__(self, dim, ws, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.ws = ws
        self.scale = (dim // num_heads) ** -0.5
        self.relative_position_bias_table = tnn.Parameter(
            torch.randn((2 * ws - 1) ** 2, num_heads) * 0.02)
        coords = torch.stack(torch.meshgrid(
            [torch.arange(ws), torch.arange(ws)], indexing="ij"))
        flat = torch.flatten(coords, 1)
        rel = flat[:, :, None] - flat[:, None, :]
        rel = rel.permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x, mask=None):
        b_, n, c = x.shape
        qkv = (self.qkv(x).reshape(b_, n, 3, self.num_heads,
                                   c // self.num_heads)
               .permute(2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)].view(
            n, n, -1).permute(2, 0, 1).contiguous()
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.view(b_ // nw, nw, self.num_heads, n, n) + \
                mask.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, n, n)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(b_, n, c)
        return self.proj(x)


class _SwinBlock(tnn.Module):
    def __init__(self, dim, num_heads, ws, shift, mlp_ratio):
        super().__init__()
        self.ws, self.shift = ws, shift
        self.norm1 = tnn.LayerNorm(dim)
        self.attn = _WindowAttention(dim, ws, num_heads)
        self.norm2 = tnn.LayerNorm(dim)
        self.mlp = _Mlp(dim, int(dim * mlp_ratio))

    def _mask(self, h, w, device):
        img = torch.zeros((1, h, w, 1), device=device)
        cnt = 0
        for hs in (slice(0, -self.ws), slice(-self.ws, -self.shift),
                   slice(-self.shift, None)):
            for wss in (slice(0, -self.ws), slice(-self.ws, -self.shift),
                        slice(-self.shift, None)):
                img[:, hs, wss, :] = cnt
                cnt += 1
        mw = _win_part(img, self.ws).view(-1, self.ws * self.ws)
        am = mw.unsqueeze(1) - mw.unsqueeze(2)
        return am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)

    def forward(self, x, x_size):
        h, w = x_size
        b, _, c = x.shape
        shortcut = x
        x = self.norm1(x).view(b, h, w, c)
        if self.shift > 0:
            x = torch.roll(x, (-self.shift, -self.shift), dims=(1, 2))
            mask = self._mask(h, w, x.device)
        else:
            mask = None
        wins = _win_part(x, self.ws).view(-1, self.ws * self.ws, c)
        wins = self.attn(wins, mask)
        x = _win_rev(wins.view(-1, self.ws, self.ws, c), self.ws, h, w)
        if self.shift > 0:
            x = torch.roll(x, (self.shift, self.shift), dims=(1, 2))
        x = shortcut + x.view(b, h * w, c)
        return x + self.mlp(self.norm2(x))


class _BasicLayer(tnn.Module):
    def __init__(self, dim, depth, num_heads, ws, mlp_ratio):
        super().__init__()
        self.blocks = tnn.ModuleList([
            _SwinBlock(dim, num_heads, ws,
                       0 if i % 2 == 0 else ws // 2, mlp_ratio)
            for i in range(depth)])

    def forward(self, x, x_size):
        for blk in self.blocks:
            x = blk(x, x_size)
        return x


class _RSTB(tnn.Module):
    def __init__(self, dim, depth, num_heads, ws, mlp_ratio):
        super().__init__()
        self.residual_group = _BasicLayer(dim, depth, num_heads, ws,
                                          mlp_ratio)
        self.conv = tnn.Conv2d(dim, dim, 3, 1, 1)

    def forward(self, x, x_size):
        h, w = x_size
        b, _, c = x.shape
        y = self.residual_group(x, x_size)
        y = y.transpose(1, 2).view(b, c, h, w)
        y = self.conv(y).flatten(2).transpose(1, 2)
        return y + x


class _PatchEmbed(tnn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = tnn.LayerNorm(dim)

    def forward(self, x):
        return self.norm(x.flatten(2).transpose(1, 2))


class _TorchSwinIR(tnn.Module):
    """Official SwinIR graph, upsampler='' path, official param naming."""

    def __init__(self, in_chans=3, embed_dim=12, depths=(2, 2),
                 num_heads=(2, 2), ws=4, mlp_ratio=2.0, img_range=1.0):
        super().__init__()
        self.ws = ws
        self.img_range = img_range
        rgb = torch.tensor([0.4488, 0.4371, 0.4040]).view(1, 3, 1, 1)
        self.mean = rgb if in_chans == 3 else torch.zeros(1, 1, 1, 1)
        self.conv_first = tnn.Conv2d(in_chans, embed_dim, 3, 1, 1)
        self.patch_embed = _PatchEmbed(embed_dim)
        self.layers = tnn.ModuleList([
            _RSTB(embed_dim, d, h, ws, mlp_ratio)
            for d, h in zip(depths, num_heads)])
        self.norm = tnn.LayerNorm(embed_dim)
        self.conv_after_body = tnn.Conv2d(embed_dim, embed_dim, 3, 1, 1)
        self.conv_last = tnn.Conv2d(embed_dim, in_chans, 3, 1, 1)

    def forward(self, x):
        hh, ww = x.shape[2:]
        mh = (self.ws - hh % self.ws) % self.ws
        mw = (self.ws - ww % self.ws) % self.ws
        x = F.pad(x, (0, mw, 0, mh), "reflect")
        x = (x - self.mean) * self.img_range
        b, _, h, w = x.shape
        x_first = self.conv_first(x)
        y = self.patch_embed(x_first)
        for layer in self.layers:
            y = layer(y, (h, w))
        y = self.norm(y)
        y = y.transpose(1, 2).view(b, -1, h, w)
        res = self.conv_after_body(y) + x_first
        x = x + self.conv_last(res)
        x = x / self.img_range + self.mean
        return x[:, :, :hh, :ww]


class TestSwinIRTorchParity:
    @pytest.mark.parametrize("shape", [(1, 3, 12, 16), (2, 3, 11, 13)])
    def test_forward_parity(self, rng, shape):
        from lowlight_image_enhancement_tpu.models.swinir import SwinIR

        torch.manual_seed(0)
        tnet = _TorchSwinIR(in_chans=3, embed_dim=12, depths=(2, 2),
                            num_heads=(2, 2), ws=4, mlp_ratio=2.0)
        tnet.eval()
        x = rng.uniform(0, 1, shape).astype(np.float32)
        with torch.no_grad():
            want = tnet(torch.from_numpy(x)).numpy()

        jnet = SwinIR(in_chans=3, embed_dim=12, depths=(2, 2),
                      num_heads=(2, 2), window_size=4, mlp_ratio=2.0,
                      patch_norm=True)
        params = flat_to_tree(convert_swinir(tnet.state_dict()))
        got = jnet.apply({"params": params},
                         jnp.asarray(x.transpose(0, 2, 3, 1)))
        got = np.asarray(got).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-4)

    def test_converted_param_tree_complete(self):
        from lowlight_image_enhancement_tpu.models.swinir import SwinIR

        torch.manual_seed(1)
        tnet = _TorchSwinIR(in_chans=3, embed_dim=12, depths=(2,),
                            num_heads=(3,), ws=4, mlp_ratio=2.0)
        conv = flat_to_tree(convert_swinir(tnet.state_dict()))
        jnet = SwinIR(in_chans=3, embed_dim=12, depths=(2,),
                      num_heads=(3,), window_size=4, mlp_ratio=2.0)
        init = jnet.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 8, 8, 3)))["params"]
        conv_flat = {jax.tree_util.keystr(k): v.shape for k, v in
                     jax.tree_util.tree_leaves_with_path(conv)}
        for k, v in jax.tree_util.tree_leaves_with_path(init):
            ks = jax.tree_util.keystr(k)
            assert ks in conv_flat, f"missing from converter: {ks}"
            assert conv_flat[ks] == v.shape, (
                f"shape mismatch {ks}: {conv_flat[ks]} vs {v.shape}")

    def test_reference_sweep_config_instantiates(self):
        """The reference's sid_swinir_baseline.yml network_g keys must
        build (config-surface parity with the official constructor)."""
        from lowlight_image_enhancement_tpu.models import define_network

        net = define_network({
            "type": "SwinIRRestoration", "upscale": 1, "in_chans": 3,
            "img_size": 128, "window_size": 8, "img_range": 1.0,
            "depths": [2], "embed_dim": 12, "num_heads": [2],
            "mlp_ratio": 4.0, "resi_connection": "1conv",
            "upsampler": "", "patch_norm": True,
        })
        y = net.init_with_output(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))[0]
        assert y.shape == (1, 16, 16, 3)
