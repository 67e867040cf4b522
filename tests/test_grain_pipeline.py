"""Grain input-pipeline adapter tests (skipped when grain missing)."""

import numpy as np
import pytest

grain = pytest.importorskip("grain.python")

from lowlight_image_enhancement_tpu.data import (  # noqa: E402
    SonySIDDataset,
    make_debug_sid,
)
from lowlight_image_enhancement_tpu.data.grain_pipeline import (  # noqa: E402
    make_grain_loader,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("grain_sid")
    paths = make_debug_sid(str(root), n_pairs=3)
    return SonySIDDataset(
        manifest_path=paths["manifest"], subset="train", patch_size=16,
        samples_per_pair=4,
        io_backend={"type": "pack", "short_path": paths["train_short"],
                    "long_path": paths["train_long"]},
    )


class TestGrainLoader:
    def test_batches_and_contract(self, dataset):
        loader = make_grain_loader(dataset, batch_size=4, num_epochs=1)
        batches = list(loader)
        assert len(batches) == 3
        b = batches[0]
        assert b["lq"].shape == (4, 16, 16, 3)
        assert b["expo_ratio"].shape == (4,)
        np.testing.assert_allclose(
            b["lq"],
            np.clip(b["short_raw"] * b["expo_ratio"][:, None, None, None],
                    0, 1),
            atol=1e-6,
        )

    def test_deterministic_with_seed(self, dataset):
        ids1 = [tuple(b["pair_id"]) for b in
                make_grain_loader(dataset, 4, seed=5, num_epochs=1)]
        ids2 = [tuple(b["pair_id"]) for b in
                make_grain_loader(dataset, 4, seed=5, num_epochs=1)]
        assert ids1 == ids2

    def test_host_sharding(self, dataset):
        """grain shards the 12 records across hosts (6 each), each host
        batching at the local size (global 4 / 2 hosts = 2)."""
        per_host = []
        for host in (0, 1):
            loader = make_grain_loader(dataset, 4, shuffle=False,
                                       num_epochs=1, num_hosts=2,
                                       host_id=host)
            per_host.append(sum(b["lq"].shape[0] for b in loader))
        assert per_host == [6, 6]

    def test_bad_host_split(self, dataset):
        with pytest.raises(ValueError):
            make_grain_loader(dataset, 5, num_hosts=2)
