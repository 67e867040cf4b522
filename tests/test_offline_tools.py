"""Offline tooling end-to-end: PNG tree -> manifest builder -> pack builder
-> dataset roundtrip (covers tools/prepare_sid_manifest.py and
tools/create_sid_pack.py via their CLIs)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")


@pytest.fixture(scope="module")
def png_tree(tmp_path_factory):
    from lowlight_image_enhancement_tpu.utils import imgio

    root = tmp_path_factory.mktemp("sid_png")
    rng = np.random.default_rng(0)
    for sub in ("short", "long"):
        os.makedirs(root / sub)
    # SID naming: <id>_<seq>_<exposure>s.png
    for pid in ("00001", "00002", "00003"):
        long_img = rng.integers(0, 65535, (64, 64, 3)).astype(np.uint16)
        imgio.imwrite(str(root / "long" / f"{pid}_00_10s.png"), long_img)
        for seq, expo in (("00", "0.1s"), ("01", "0.04s")):
            short = (long_img // 100).astype(np.uint16)
            imgio.imwrite(str(root / "short" / f"{pid}_{seq}_{expo}.png"),
                          short)
    return root


def run_tool(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script), *args],
        capture_output=True, text=True, check=True,
    )


class TestManifestBuilder:
    def test_builds_manifest_with_ratios_and_splits(self, png_tree,
                                                    tmp_path):
        out = tmp_path / "manifest.json"
        res = run_tool("prepare_sid_manifest.py", "--root", str(png_tree),
                       "--output", str(out), "--val-fraction", "0.34",
                       "--test-fraction", "0.0", "--seed", "1")
        records = json.loads(out.read_text())
        assert len(records) == 6  # 3 pairs x 2 shorts
        r = {rec["short_key"]: rec for rec in records}
        k = "00001_00_0.1s"
        assert r[k]["long_key"] == "00001_00_10s"
        np.testing.assert_allclose(r[k]["exposure_ratio"], 100.0)
        k2 = "00001_01_0.04s"
        np.testing.assert_allclose(r[k2]["exposure_ratio"], 250.0)
        subsets = {rec["subset"] for rec in records}
        assert subsets <= {"train", "val"}
        assert "wrote 6 records" in res.stdout

    def test_explicit_split_file(self, png_tree, tmp_path):
        split = tmp_path / "split.json"
        split.write_text(json.dumps({"00001": "test"}))
        out = tmp_path / "m2.json"
        run_tool("prepare_sid_manifest.py", "--root", str(png_tree),
                 "--output", str(out), "--split-file", str(split))
        records = json.loads(out.read_text())
        assert all(r["subset"] == "test" for r in records
                   if r["pair_id"].startswith("00001"))


@pytest.mark.slow
class TestPackBuilder:
    def test_pack_and_dataset_roundtrip(self, png_tree, tmp_path):
        manifest = tmp_path / "manifest.json"
        run_tool("prepare_sid_manifest.py", "--root", str(png_tree),
                 "--output", str(manifest), "--val-fraction", "0",
                 "--test-fraction", "0")
        packdir = tmp_path / "packs"
        run_tool("create_sid_pack.py", "--manifest", str(manifest),
                 "--root", str(png_tree), "--output", str(packdir),
                 "--subsets", "train")
        assert (packdir / "train_short.pack").exists()
        assert (packdir / "train_long.pack").exists()

        from lowlight_image_enhancement_tpu.data import SonySIDDataset

        ds = SonySIDDataset(
            manifest_path=str(manifest), subset="train", phase="train",
            patch_size=32,
            io_backend={"type": "pack",
                        "short_path": str(packdir / "train_short.pack"),
                        "long_path": str(packdir / "train_long.pack")},
        )
        item = ds[0]
        assert item["lq"].shape == (32, 32, 3)
        # lq is aligned: clip(short * ratio); shorts were long//100 at
        # ratio 100 or 250 -> lq should be close to gt scale
        assert item["lq"].max() <= 1.0

    def test_placeholder_on_corrupt(self, png_tree, tmp_path):
        manifest = tmp_path / "manifest.json"
        run_tool("prepare_sid_manifest.py", "--root", str(png_tree),
                 "--output", str(manifest), "--val-fraction", "0",
                 "--test-fraction", "0")
        # corrupt one PNG
        victim = next((png_tree / "short").glob("00002*"))
        victim.write_bytes(b"not a png")
        packdir = tmp_path / "packs2"
        res = run_tool("create_sid_pack.py", "--manifest", str(manifest),
                       "--root", str(png_tree), "--output", str(packdir),
                       "--subsets", "train", "--placeholder-on-corrupt")
        assert "placeholder" in res.stdout
        # without the flag it must fail
        with pytest.raises(subprocess.CalledProcessError):
            run_tool("create_sid_pack.py", "--manifest", str(manifest),
                     "--root", str(png_tree),
                     "--output", str(tmp_path / "packs3"),
                     "--subsets", "train")
