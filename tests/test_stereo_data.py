"""Stereo SR data path + trainable NAFSSR (reference
``basicsr/data/paired_image_SR_LR_dataset.py``,
``paired_image_SR_LR_FullImage_Memory_dataset.py``).

Covers: the three stereo dataset classes on synthetic fixtures, the
rectangular crop / padding transforms they use, and a 5-step NAFSSR
training smoke through ``create_model`` (the reference's AMP integration
recipe, ``core_tests/test_integration_forward_amp.py:88-136``, minus
GradScaler)."""

import os
import pickle

import numpy as np
import pytest

from lowlight_image_enhancement_tpu.data import create_dataset, create_loader
from lowlight_image_enhancement_tpu.data.transforms import (
    pad_to_min_size,
    paired_random_crop_hw,
)
from lowlight_image_enhancement_tpu.utils import imgio


def _rand_img(rng, h, w):
    return (rng.random((h, w, 3)) * 255).astype(np.uint8)


@pytest.fixture()
def flat_lr_root(tmp_path):
    """PairedImageSRLRDataset layout: flat folders of {i:04d}_{L,R}.png."""
    rng = np.random.default_rng(0)
    gt_dir, lq_dir = tmp_path / "hr", tmp_path / "lr"
    gt_dir.mkdir(), lq_dir.mkdir()
    for i in (1, 2, 3):
        for side in ("L", "R"):
            imgio.imwrite(str(gt_dir / f"{i:04}_{side}.png"),
                          _rand_img(rng, 64, 96))
            imgio.imwrite(str(lq_dir / f"{i:04}_{side}.png"),
                          _rand_img(rng, 32, 48))
    return str(gt_dir), str(lq_dir)


@pytest.fixture()
def folder_stereo_root(tmp_path):
    """PairedStereoImageDataset layout: one dir per sample (hr0/hr1,
    lr0/lr1)."""
    rng = np.random.default_rng(1)
    gt_dir, lq_dir = tmp_path / "hr", tmp_path / "lr"
    for i in range(3):
        g = gt_dir / f"{i:04}"
        l = lq_dir / f"{i:04}"
        g.mkdir(parents=True), l.mkdir(parents=True)
        imgio.imwrite(str(g / "hr0.png"), _rand_img(rng, 64, 96))
        imgio.imwrite(str(g / "hr1.png"), _rand_img(rng, 64, 96))
        imgio.imwrite(str(l / "lr0.png"), _rand_img(rng, 32, 48))
        imgio.imwrite(str(l / "lr1.png"), _rand_img(rng, 32, 48))
    return str(gt_dir), str(lq_dir)


class TestTransforms:
    def test_crop_hw_shapes_and_alignment(self):
        rng = np.random.default_rng(2)
        gt = rng.random((64, 96, 6)).astype(np.float32)
        lq = gt[::2, ::2]  # exact 2x downsample by decimation
        g, l = paired_random_crop_hw(gt, lq, 24, 40, 2,
                                     rng=np.random.default_rng(3))
        assert g.shape == (24, 40, 6) and l.shape == (12, 20, 6)
        # aligned windows: decimated gt crop == lq crop
        np.testing.assert_allclose(g[::2, ::2], l)

    def test_pad_to_min_size_reflect(self):
        lq = np.arange(12, dtype=np.float32).reshape(3, 4, 1)
        gt = lq.copy()
        lp, gp = pad_to_min_size(lq, gt, 5)
        assert lp.shape == (5, 5, 1) and gp.shape == (5, 5, 1)
        # reflect: row 3 mirrors row 1
        np.testing.assert_allclose(lp[3], lp[1])
        np.testing.assert_allclose(lp[:, 4], lp[:, 2])


class TestStereoDatasets:
    def test_flat_lr_train(self, flat_lr_root):
        gt_dir, lq_dir = flat_lr_root
        ds = create_dataset({
            "type": "PairedImageSRLRDataset", "dataroot_gt": gt_dir,
            "dataroot_lq": lq_dir, "phase": "train", "gt_size": 32,
            "scale": 2, "seed": 0,
        })
        assert len(ds) == 3
        s = ds[0]
        assert s["lq"].shape == (16, 16, 6)
        assert s["gt"].shape == (32, 32, 6)
        assert s["lq"].dtype == np.float32
        assert 0.0 <= s["lq"].min() and s["gt"].max() <= 1.0

    def test_flat_lr_pads_small_images(self, tmp_path):
        rng = np.random.default_rng(4)
        gt_dir, lq_dir = tmp_path / "hr", tmp_path / "lr"
        gt_dir.mkdir(), lq_dir.mkdir()
        for side in ("L", "R"):
            imgio.imwrite(str(gt_dir / f"0001_{side}.png"),
                          _rand_img(rng, 20, 20))
            imgio.imwrite(str(lq_dir / f"0001_{side}.png"),
                          _rand_img(rng, 10, 10))
        ds = create_dataset({
            "type": "PairedImageSRLRDataset", "dataroot_gt": str(gt_dir),
            "dataroot_lq": str(lq_dir), "phase": "train", "gt_size": 32,
            "scale": 2,
        })
        s = ds[0]  # 10 < 16 -> reflect-padded before crop
        assert s["lq"].shape == (16, 16, 6)
        assert s["gt"].shape == (32, 32, 6)

    def test_folder_stereo_train_and_val(self, folder_stereo_root):
        gt_dir, lq_dir = folder_stereo_root
        ds = create_dataset({
            "type": "PairedStereoImageDataset", "dataroot_gt": gt_dir,
            "dataroot_lq": lq_dir, "phase": "train", "gt_size_h": 24,
            "gt_size_w": 40, "scale": 2, "flip_RGB": True,
            "use_hflip": True, "use_vflip": True, "seed": 1,
        })
        assert len(ds) == 3
        s = ds[1]
        assert s["lq"].shape == (12, 20, 6)
        assert s["gt"].shape == (24, 40, 6)
        val = create_dataset({
            "type": "PairedStereoImageDataset", "dataroot_gt": gt_dir,
            "dataroot_lq": lq_dir, "phase": "val", "scale": 2,
        })
        v = val[0]
        assert v["lq"].shape == (32, 48, 6)
        assert v["gt"].shape == (64, 96, 6)

    def test_full_image_memory_pickle_and_npz(self, tmp_path):
        rng = np.random.default_rng(5)
        gts = [(rng.random((40, 40, 6)) * 255).astype(np.uint8)
               for _ in range(2)]
        lqs = [(rng.random((20, 20, 6)) * 255).astype(np.uint8)
               for _ in range(2)]
        gt_pkl, lq_pkl = tmp_path / "gts.pkl", tmp_path / "lqs.pkl"
        gt_pkl.write_bytes(pickle.dumps(gts))
        lq_pkl.write_bytes(pickle.dumps(lqs))
        ds = create_dataset({
            "type": "PairedImageSRLRFullImageMemoryDataset",
            "dataroot_gt": str(gt_pkl), "dataroot_lq": str(lq_pkl),
            "phase": "train", "gt_size": 24, "scale": 2,
        })
        s = ds[3]  # index wraps modulo 2 (reference :84)
        assert s["lq"].shape == (12, 12, 6)
        assert s["gt"].shape == (24, 24, 6)
        assert s["lq_path"] == "1"
        # npz blob path
        np.savez(tmp_path / "gts.npz", **{f"{i:03}": g
                                          for i, g in enumerate(gts)})
        np.savez(tmp_path / "lqs.npz", **{f"{i:03}": l
                                          for i, l in enumerate(lqs)})
        ds2 = create_dataset({
            "type": "PairedImageSRLRFullImageMemoryDataset",
            "dataroot_gt": str(tmp_path / "gts.npz"),
            "dataroot_lq": str(tmp_path / "lqs.npz"),
            "phase": "val",
        })
        np.testing.assert_allclose(ds2[0]["gt"],
                                   gts[0].astype(np.float32) / 255.0)


class TestNAFSSRTraining:
    def test_five_step_smoke(self, folder_stereo_root):
        """NAFSSR trains end to end on the stereo data path: finite,
        decreasing loss over 5 steps (mirror of the reference AMP
        integration recipe at tiny scale)."""
        from lowlight_image_enhancement_tpu.training.model_wrapper import (
            create_model,
        )

        gt_dir, lq_dir = folder_stereo_root
        ds_opt = {
            "type": "PairedStereoImageDataset", "dataroot_gt": gt_dir,
            "dataroot_lq": lq_dir, "phase": "train", "gt_size_h": 16,
            "gt_size_w": 24, "scale": 2, "seed": 2,
            "batch_size_per_gpu": 2,
        }
        ds = create_dataset(ds_opt)
        loader = create_loader(ds, ds_opt)
        opt = {
            "name": "stereo_nafssr_test",
            "model_type": "LowlightModel",
            "scale": 2,
            "manual_seed": 3,
            "network_g": {"type": "NAFSSR", "up_scale": 2, "width": 8,
                          "num_blks": 2, "img_channel": 3},
            "train": {"pixel_opt": {"type": "MSELoss"},
                      "optim_g": {"type": "AdamW", "lr": 1e-3}},
        }
        model = create_model(opt)

        def _batches():
            while True:
                yield from loader

        it = _batches()
        losses = []
        for _ in range(5):
            batch = next(it)
            assert batch["lq"].shape == (2, 8, 12, 6)
            model.feed_data(batch)
            model.optimize_parameters()
            losses.append(model.log_dict["l_total"])
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
        # inference path: output doubles spatial dims, keeps 6 channels
        model.feed_data({"lq": batch["lq"]})
        model.test()
        assert model.output.shape == (2, 16, 24, 6)
