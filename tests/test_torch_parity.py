"""Cross-implementation parity vs the reference torch NAFNet.

Loads the reference implementation from its installed location (read-only,
executed — not copied) when available, converts its ``state_dict`` with
``tools/convert_torch_nafnet.py``, and asserts forward parity between the
torch NCHW network and this framework's NHWC Flax network on identical
inputs. Skipped when the reference checkout or torch is absent (e.g. end
users' machines) — the converter itself is exercised either way via a
synthetic state_dict.
"""

import importlib.util
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # compile-heavy: full-tier only (see pytest.ini)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_torch_nafnet import convert_state_dict, flat_to_tree  # noqa: E402

REFERENCE_ARCH = "/root/reference/NAFNet_base/basicsr/models/archs/NAFNet_arch.py"
REFERENCE_UTIL = "/root/reference/NAFNet_base/basicsr/models/archs/arch_util.py"
REFERENCE_LOCAL = "/root/reference/NAFNet_base/basicsr/models/archs/local_arch.py"
REFERENCE_UNET = "/root/reference/NAFNet_base/basicsr/models/archs/unet_sid_arch.py"


def _load_reference_nafnet():
    """Load the reference NAFNet module with stubbed package context (its
    parent package drags heavy optional deps like lmdb)."""
    import torch  # noqa: F401

    # stub the basicsr package chain + the logger its arch_util imports
    for name in ("basicsr", "basicsr.models", "basicsr.models.archs",
                 "basicsr.utils"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    sys.modules["basicsr.utils"].get_root_logger = (
        lambda *a, **k: __import__("logging").getLogger("stub")
    )

    def load(path, name):
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
        return mod

    load(REFERENCE_UTIL, "basicsr.models.archs.arch_util")
    load(REFERENCE_LOCAL, "basicsr.models.archs.local_arch")
    arch = load(REFERENCE_ARCH, "basicsr.models.archs.NAFNet_arch")
    return arch.NAFNet


def _load_reference_unet():
    """Load the reference UNetSID (standalone torch module, no package
    context needed)."""
    import torch  # noqa: F401

    spec = importlib.util.spec_from_file_location(
        "ref_unet_sid", REFERENCE_UNET)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.UNetSID


needs_reference = pytest.mark.skipif(
    not os.path.exists(REFERENCE_ARCH),
    reason="reference checkout not available",
)


class TestConverter:
    def test_synthetic_state_dict_roundtrip(self, rng):
        """Converter maps all expected key families (no torch needed)."""
        c = 8
        sd = {
            "intro.weight": rng.standard_normal((c, 3, 3, 3)).astype("f4"),
            "intro.bias": rng.standard_normal((c,)).astype("f4"),
            "encoders.0.0.conv1.weight":
                rng.standard_normal((2 * c, c, 1, 1)).astype("f4"),
            "encoders.0.0.conv2.weight":
                rng.standard_normal((2 * c, 1, 3, 3)).astype("f4"),
            "encoders.0.0.sca.1.weight":
                rng.standard_normal((c, c, 1, 1)).astype("f4"),
            "encoders.0.0.norm1.weight": np.ones((c,), "f4"),
            "encoders.0.0.beta": np.zeros((1, c, 1, 1), "f4"),
            "middle_blks.0.gamma": np.zeros((1, c, 1, 1), "f4"),
            "downs.0.weight":
                rng.standard_normal((2 * c, c, 2, 2)).astype("f4"),
            "ups.0.0.weight":
                rng.standard_normal((2 * c, c, 1, 1)).astype("f4"),
            "ending.weight": rng.standard_normal((3, c, 3, 3)).astype("f4"),
        }
        flat = convert_state_dict(sd)
        assert "intro/kernel" in flat and flat["intro/kernel"].shape == \
            (3, 3, 3, c)
        assert flat["enc0_blk0/conv2/kernel"].shape == (3, 3, 1, 2 * c)
        assert flat["enc0_blk0/beta"].shape == (c,)
        assert flat["mid_blk0/gamma"].shape == (c,)
        assert "down0/kernel" in flat and "up0/kernel" in flat
        tree = flat_to_tree(flat)
        assert tree["enc0_blk0"]["conv1"]["kernel"].shape == (1, 1, c, 2 * c)


@needs_reference
class TestTorchParity:
    @pytest.mark.parametrize("shape", [(1, 32, 32, 3), (1, 24, 40, 3)])
    def test_forward_parity(self, rng, shape):
        """Reference torch NAFNet == our Flax NAFNet with converted
        weights, on identical inputs (fp32, atol 1e-4)."""
        import torch

        TorchNAFNet = _load_reference_nafnet()
        kw = dict(img_channel=3, width=8, middle_blk_num=2,
                  enc_blk_nums=[1, 2], dec_blk_nums=[1, 1])
        tnet = TorchNAFNet(**kw).eval()

        # deterministic, non-trivial weights
        torch.manual_seed(0)
        with torch.no_grad():
            for p in tnet.parameters():
                p.copy_(torch.randn_like(p) * 0.05)

        x = rng.uniform(0, 1, shape).astype(np.float32)
        with torch.no_grad():
            t_out = tnet(torch.from_numpy(
                np.transpose(x, (0, 3, 1, 2))))  # NHWC -> NCHW
        t_out = np.transpose(t_out.numpy(), (0, 2, 3, 1))

        from lowlight_image_enhancement_tpu.models import NAFNet

        jnet = NAFNet(img_channel=3, width=8, middle_blk_num=2,
                      enc_blk_nums=(1, 2), dec_blk_nums=(1, 1))
        params = flat_to_tree(convert_state_dict(tnet.state_dict()))
        j_out = np.asarray(jnet.apply({"params": params}, jnp.asarray(x)))

        np.testing.assert_allclose(j_out, t_out, atol=1e-4, rtol=1e-4)

    def test_bf16_policy_parity_tolerance(self, rng):
        """The bf16 activation policy must track the fp32 torch reference
        within bf16 tolerance on converted weights (documents the AMP
        numeric contract)."""
        import torch

        TorchNAFNet = _load_reference_nafnet()
        kw = dict(img_channel=3, width=8, middle_blk_num=1,
                  enc_blk_nums=[1, 1], dec_blk_nums=[1, 1])
        tnet = TorchNAFNet(**kw).eval()
        torch.manual_seed(1)
        with torch.no_grad():
            for p in tnet.parameters():
                p.copy_(torch.randn_like(p) * 0.05)

        x = rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32)
        with torch.no_grad():
            t_out = np.transpose(
                tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
                .numpy(), (0, 2, 3, 1))

        import jax.numpy as jnp2

        from lowlight_image_enhancement_tpu.models import NAFNet

        jnet = NAFNet(img_channel=3, width=8, middle_blk_num=1,
                      enc_blk_nums=(1, 1), dec_blk_nums=(1, 1),
                      dtype=jnp2.bfloat16)
        params = flat_to_tree(convert_state_dict(tnet.state_dict()))
        j_out = np.asarray(jnet.apply({"params": params}, jnp.asarray(x)))
        # bf16 has ~2-3 decimal digits; activations are O(1)
        np.testing.assert_allclose(j_out, t_out, atol=3e-2)

    def test_converted_param_tree_complete(self, rng):
        """Every converted tensor lands on a slot our init tree has, with
        matching shapes (catches silent mapping gaps)."""
        import torch

        TorchNAFNet = _load_reference_nafnet()
        kw = dict(img_channel=3, width=8, middle_blk_num=1,
                  enc_blk_nums=[1, 1], dec_blk_nums=[1, 1])
        tnet = TorchNAFNet(**kw)
        from lowlight_image_enhancement_tpu.models import NAFNet

        jnet = NAFNet(img_channel=3, width=8, middle_blk_num=1,
                      enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
        init_params = jnet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3))
        )["params"]
        converted = flat_to_tree(convert_state_dict(tnet.state_dict()))

        flat_init = {
            "/".join(str(p.key) for p in path): leaf.shape
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(init_params)[0]
        }
        flat_conv = {
            "/".join(str(p.key) for p in path): leaf.shape
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(converted)[0]
        }
        assert flat_init == flat_conv


@needs_reference
class TestUNetTorchParity:
    """UNetSID parity (reference ``archs/unet_sid_arch.py:11-118``).

    Only the reference's working graph (``bilinear=False``) is comparable —
    its default bilinear graph crashes on a channel mismatch, which the
    defect test below pins as executable documentation.
    """

    def _torch_unet(self, depth, seed=0):
        import torch

        TorchUNet = _load_reference_unet()
        tnet = TorchUNet(depth=list(depth), bilinear=False).eval()
        torch.manual_seed(seed)
        with torch.no_grad():
            for p in tnet.parameters():
                p.copy_(torch.randn_like(p) * 0.05)
        return tnet

    @pytest.mark.parametrize("shape", [(1, 32, 32, 3), (2, 24, 40, 3)])
    def test_forward_parity(self, rng, shape):
        import torch

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from convert_torch_unet import convert_unet_state_dict

        depth = (8, 16, 32)
        tnet = self._torch_unet(depth)
        x = rng.uniform(0, 1, shape).astype(np.float32)
        with torch.no_grad():
            t_out = np.transpose(
                tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
                .numpy(), (0, 2, 3, 1))

        from lowlight_image_enhancement_tpu.models.unet import UNetSID

        jnet = UNetSID(depths=depth, bilinear=False, norm="none")
        params = flat_to_tree(convert_unet_state_dict(tnet.state_dict()))
        j_out = np.asarray(jnet.apply({"params": params}, jnp.asarray(x)))
        np.testing.assert_allclose(j_out, t_out, atol=1e-4, rtol=1e-4)

    def test_converted_param_tree_complete(self):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                        "tools"))
        from convert_torch_unet import convert_unet_state_dict

        depth = (8, 16, 32)
        tnet = self._torch_unet(depth)
        from lowlight_image_enhancement_tpu.models.unet import UNetSID

        jnet = UNetSID(depths=depth, bilinear=False, norm="none")
        init_params = jnet.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]
        converted = flat_to_tree(convert_unet_state_dict(tnet.state_dict()))
        flat = lambda tree: {
            "/".join(str(p.key) for p in path): leaf.shape
            for path, leaf in
            jax.tree_util.tree_flatten_with_path(tree)[0]
        }
        assert flat(init_params) == flat(converted)

    def test_reference_bilinear_default_is_broken(self):
        """Executable documentation of the reference defect: the default
        ``bilinear=True`` graph raises a channel mismatch
        (``unet_sid_arch.py:45`` expects C/2 where ``bottom`` emits C).
        Our ``bilinear=True`` is the repaired graph and must run."""
        import torch

        TorchUNet = _load_reference_unet()
        tnet = TorchUNet(depth=[8, 16, 32], bilinear=True).eval()
        with pytest.raises(RuntimeError):
            with torch.no_grad():
                tnet(torch.zeros(1, 3, 32, 32))

        from lowlight_image_enhancement_tpu.models.unet import UNetSID

        jnet = UNetSID(depths=(8, 16, 32), bilinear=True)
        params = jnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        y = jnet.apply(params, jnp.zeros((1, 32, 32, 3)))
        assert y.shape == (1, 32, 32, 3)
