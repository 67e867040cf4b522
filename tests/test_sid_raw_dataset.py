"""Standalone RAW dataset (C26) — reference-contract tests.

Contracts pinned against ``/root/reference/datasets/sony_sid_dataset.py``:
filename parsing (:51-75), pair discovery incl. duplicate/incomplete
handling (:78-176), preprocessing math (:262-294), in-memory cache
(:296-317), crop semantics (:319-347).  A fake decoder stands in for
rawpy (absent in this image); the decode contract itself is uint16 HWC.
"""

from __future__ import annotations

import logging
from pathlib import Path

import numpy as np
import pytest

from lowlight_image_enhancement_tpu.data.sid_raw_dataset import (
    MAX_16BIT_VALUE,
    SonySIDRawDataset,
    find_sid_pairs,
    parse_sid_filename,
)


def _touch(p: Path) -> None:
    p.parent.mkdir(parents=True, exist_ok=True)
    p.write_bytes(b"")


def make_tree(root: Path, shorts, longs, camera="Sony") -> Path:
    for name in shorts:
        _touch(root / camera / "short" / name)
    for name in longs:
        _touch(root / camera / "long" / name)
    return root


def fake_decoder(shape=(32, 48, 3)):
    """Deterministic uint16 image derived from the filename; counts calls."""
    calls = []

    def decode(path: Path) -> np.ndarray:
        calls.append(path)
        seed = abs(hash(path.name)) % (2**32)
        rng = np.random.default_rng(seed)
        return rng.integers(0, 65536, size=shape, dtype=np.int64).astype(
            np.uint16)

    decode.calls = calls
    return decode


class TestParseFilename:
    def test_seconds_and_ms_units(self):
        assert parse_sid_filename(Path("00001_00_0.04s.ARW")) == (
            "00001_00", 0.04)
        pid, exp = parse_sid_filename(Path("00123_07_100ms.ARW"))
        assert pid == "00123_07" and exp == pytest.approx(0.1)

    def test_rejects_bad_formats(self):
        with pytest.raises(ValueError, match="filename format"):
            parse_sid_filename(Path("badname.ARW"))
        with pytest.raises(ValueError, match="exposure"):
            parse_sid_filename(Path("00001_00_fast.ARW"))
        with pytest.raises(ValueError, match="positive"):
            parse_sid_filename(Path("00001_00_0s.ARW"))


class TestFindPairs:
    def test_matches_sorted_with_ratio(self, tmp_path):
        make_tree(tmp_path,
                  ["00002_00_0.1s.ARW", "00001_00_0.04s.ARW"],
                  ["00002_00_10s.ARW", "00001_00_10s.ARW"])
        pairs = find_sid_pairs(tmp_path)
        assert [p.pair_id for p in pairs] == ["00001_00", "00002_00"]
        assert pairs[0].exposure_ratio == pytest.approx(250.0)
        assert pairs[1].exposure_ratio == pytest.approx(100.0)

    def test_missing_dirs_raise(self, tmp_path):
        with pytest.raises(FileNotFoundError, match="Missing directory"):
            find_sid_pairs(tmp_path)

    def test_incomplete_raises_unless_allowed(self, tmp_path, caplog):
        make_tree(tmp_path, ["00001_00_0.04s.ARW", "00003_00_0.1s.ARW"],
                  ["00001_00_10s.ARW"])
        with pytest.raises(FileNotFoundError, match="no matching long"):
            find_sid_pairs(tmp_path)
        with caplog.at_level(logging.WARNING):
            pairs = find_sid_pairs(tmp_path, allow_incomplete=True)
        assert [p.pair_id for p in pairs] == ["00001_00"]
        assert any("skipped" in r.message for r in caplog.records)

    def test_duplicate_keeps_first_sorted(self, tmp_path, caplog):
        make_tree(tmp_path,
                  ["00001_00_0.04s.ARW", "00001_00_0.1s.ARW"],
                  ["00001_00_10s.ARW"])
        with caplog.at_level(logging.WARNING):
            pairs = find_sid_pairs(tmp_path)
        assert len(pairs) == 1
        # sorted scan: 0.04s file encountered first, duplicate ignored
        assert pairs[0].short_exposure == pytest.approx(0.04)
        assert any("Duplicate" in r.message for r in caplog.records)

    def test_empty_raises_runtime(self, tmp_path):
        (tmp_path / "Sony" / "short").mkdir(parents=True)
        (tmp_path / "Sony" / "long").mkdir(parents=True)
        with pytest.raises(RuntimeError, match="No SID pairs"):
            find_sid_pairs(tmp_path)


class TestDataset:
    def _ds(self, tmp_path, **kw):
        make_tree(tmp_path, ["00001_00_0.1s.ARW", "00002_00_0.04s.ARW"],
                  ["00001_00_10s.ARW", "00002_00_10s.ARW"])
        kw.setdefault("raw_decoder", fake_decoder())
        kw.setdefault("patch_size", 16)
        kw.setdefault("rng_seed", 0)
        return SonySIDRawDataset(tmp_path, **kw)

    def test_item_protocol_and_math(self, tmp_path):
        dec = fake_decoder()
        ds = self._ds(tmp_path, raw_decoder=dec, patch_size=None)
        item = ds[0]
        ratio = 10.0 / 0.1
        assert item["expo_ratio"] == np.float32(ratio)
        for k in ("lq", "gt", "short_raw", "long_raw", "short_obs"):
            assert item[k].shape == (32, 48, 3)
            assert item[k].dtype == np.float32
        # lq = clip(short/65535 * ratio, 0, 1); gt = long/65535
        short = item["short_raw"]
        np.testing.assert_allclose(
            item["lq"], np.clip(short * ratio, 0, 1), rtol=1e-6)
        assert np.all(item["gt"] >= 0) and np.all(item["gt"] <= 1)
        np.testing.assert_array_equal(item["long_raw"], item["gt"])
        np.testing.assert_array_equal(item["short_obs"], item["short_raw"])

    def test_samples_per_pair_and_len(self, tmp_path):
        ds = self._ds(tmp_path, samples_per_pair=3)
        assert len(ds) == 6
        # indices 0..2 map to pair 0, 3..5 to pair 1
        assert ds[0]["expo_ratio"] == ds[2]["expo_ratio"]
        assert ds[0]["expo_ratio"] != ds[3]["expo_ratio"]

    def test_cache_decodes_once_per_path(self, tmp_path):
        dec = fake_decoder()
        ds = self._ds(tmp_path, raw_decoder=dec, cache_in_memory=True)
        ds[0], ds[0], ds[0]
        assert len(dec.calls) == 2  # short + long, decoded once each
        dec2 = fake_decoder()
        ds2 = self._ds(tmp_path, raw_decoder=dec2, cache_in_memory=False)
        ds2[0], ds2[0]
        assert len(dec2.calls) == 4

    def test_center_vs_random_crop(self, tmp_path):
        ds_c = self._ds(tmp_path, random_crop=False, cache_in_memory=True)
        a = ds_c[0]["gt"]
        b = ds_c[0]["gt"]
        np.testing.assert_array_equal(a, b)  # center crop is deterministic
        assert a.shape == (16, 16, 3)

    def test_patch_too_large_raises(self, tmp_path):
        ds = self._ds(tmp_path, patch_size=64)
        with pytest.raises(ValueError, match="exceeds image dimensions"):
            ds[0]

    def test_allowed_pair_ids(self, tmp_path):
        ds = self._ds(tmp_path, allowed_pair_ids=["00002_00"])
        assert len(ds) == 1
        with pytest.raises(ValueError, match="not found"):
            self._ds(tmp_path, allowed_pair_ids=["99999_00"])

    def test_return_metadata(self, tmp_path):
        ds = self._ds(tmp_path, return_metadata=True)
        meta = ds[0]["metadata"]
        assert meta["pair_id"] == "00001_00"
        assert meta["exposure_ratio"] == pytest.approx(100.0)
        assert meta["short_path"].endswith("00001_00_0.1s.ARW")

    def test_registry_and_create_dataset(self, tmp_path):
        from lowlight_image_enhancement_tpu.data import create_dataset

        make_tree(tmp_path, ["00001_00_0.1s.ARW"], ["00001_00_10s.ARW"])
        ds = create_dataset({
            "type": "SonySIDRawDataset", "root_dir": str(tmp_path),
            "patch_size": None, "raw_decoder": fake_decoder(),
        })
        assert len(ds) == 1
