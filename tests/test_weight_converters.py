"""Weight-converter consistency: the torchvision-index mapping tables must
match the Flax modules' actual parameter names (catches drift without
needing torch checkpoints)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


class TestVggConverterMapping:
    @pytest.mark.slow  # measured >=4s on 1-core host (round-3 re-tier)
    def test_idx_map_matches_flax_param_names(self):
        from convert_vgg_weights import _IDX_TO_NAME

        from lowlight_image_enhancement_tpu.models.vgg import VGG19Features

        module = VGG19Features(taps=("relu5_4",))
        params = module.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 32, 32, 3)))["params"]
        assert set(_IDX_TO_NAME.values()) == set(params.keys())
        # torchvision vgg19.features conv indices are strictly increasing
        idxs = sorted(_IDX_TO_NAME)
        assert idxs == list(idxs) and len(idxs) == 16

    @pytest.mark.slow  # measured 8.5s on 1-core host (round-3 re-tier)
    def test_npz_loading_applies_weights(self, tmp_path, rng):
        """A synthetic npz in the converter's output format must actually
        land in the extractor's params."""
        from lowlight_image_enhancement_tpu.models.vgg import (
            load_vgg19_features,
        )

        w = rng.standard_normal((64, 3, 3, 3)).astype(np.float32)  # OIHW
        b = rng.standard_normal((64,)).astype(np.float32)
        npz_path = str(tmp_path / "vgg.npz")
        np.savez(npz_path, **{"conv1_1.weight": w, "conv1_1.bias": b})
        module, variables, pretrained = load_vgg19_features(
            weights_path=npz_path)
        assert pretrained
        got = np.asarray(variables["params"]["conv1_1"]["kernel"])
        np.testing.assert_allclose(got, np.transpose(w, (2, 3, 1, 0)))
        np.testing.assert_allclose(
            np.asarray(variables["params"]["conv1_1"]["bias"]), b)


class TestLpipsConverterMapping:
    @pytest.mark.parametrize("net,cfg_attr", [("alex", "_ALEX_MAP"),
                                              ("vgg", "_VGG_MAP")])
    @pytest.mark.slow  # measured >=4s on 1-core host (round-3 re-tier)
    def test_trunk_maps_match_flax_names(self, net, cfg_attr):
        import convert_lpips_weights as clw

        from lowlight_image_enhancement_tpu.models.lpips import LPIPSNet

        module = LPIPSNet(net=net)
        dummy = jnp.zeros((1, 64, 64, 3))
        params = module.init(jax.random.PRNGKey(0), dummy, dummy)["params"]
        trunk_names = set(params["trunk"].keys())
        assert set(getattr(clw, cfg_attr).values()) == trunk_names
        # 5 linear heads exist
        assert {f"lin{i}" for i in range(5)} <= set(params.keys())

    def test_lpips_npz_loading(self, tmp_path, rng):
        from lowlight_image_enhancement_tpu.models.lpips import load_lpips

        lin0 = np.abs(rng.standard_normal((64,))).astype(np.float32)
        npz_path = str(tmp_path / "lpips_alex.npz")
        np.savez(npz_path, **{"lin0.weight": lin0})
        module, variables, pretrained = load_lpips(
            net="alex", weights_path=npz_path)
        assert pretrained
        np.testing.assert_allclose(
            np.asarray(variables["params"]["lin0"]), lin0)
