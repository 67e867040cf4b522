"""Data layer: SIDPack records, SID dataset, transforms, input pipeline.

``create_dataset(opt)`` resolves ``{'type': Name, **kwargs}`` through
DATASET_REGISTRY (reference ``data/__init__.py:38-62``);
``create_loader`` builds the batching pipeline (``data/__init__.py:65-131``).
"""

from __future__ import annotations

import copy
from typing import Any, Mapping

from lowlight_image_enhancement_tpu.data.debug_fixtures import (  # noqa: F401
    make_debug_sid,
)
from lowlight_image_enhancement_tpu.data.pipeline import (  # noqa: F401
    Loader,
    epochs,
    prefetch_to_device,
)
from lowlight_image_enhancement_tpu.data.records import (  # noqa: F401
    SidPackReader,
    SidPackWriter,
    build_sidpack,
)
from lowlight_image_enhancement_tpu.data.paired_image_dataset import (  # noqa: F401
    PairedImageDataset,
    SingleImageDataset,
)
from lowlight_image_enhancement_tpu.data.stereo_dataset import (  # noqa: F401
    PairedImageSRLRDataset,
    PairedImageSRLRFullImageMemoryDataset,
    PairedStereoImageDataset,
)
from lowlight_image_enhancement_tpu.data.sid_dataset import (  # noqa: F401
    SonySIDDataset,
    load_manifest,
)
from lowlight_image_enhancement_tpu.data.sid_raw_dataset import (  # noqa: F401
    SIDPairMetadata,
    SonySIDRawDataset,
    find_sid_pairs,
    parse_sid_filename,
)
from lowlight_image_enhancement_tpu.data.video_test_dataset import (  # noqa: F401
    VideoRecurrentTestDataset,
    VideoTestDataset,
    VideoTestDUFDataset,
    VideoTestVimeo90KDataset,
    duf_downsample,
    generate_frame_indices,
    generate_gaussian_kernel,
    read_img_seq,
)
from lowlight_image_enhancement_tpu.utils.registry import DATASET_REGISTRY


def create_dataset(opt: Mapping[str, Any]):
    """Instantiate a dataset from ``{'type': Name, **kwargs}``."""
    opt = copy.deepcopy(dict(opt))
    ds_type = opt.pop("type")
    return DATASET_REGISTRY.get(ds_type)(**opt)


def create_loader(dataset, opt: Mapping[str, Any], *, num_hosts: int = 1,
                  host_id: int = 0, seed: int = 0) -> Loader:
    """Build a Loader from reference-style dataset options."""
    phase = opt.get("phase", "train")
    is_train = phase == "train"
    batch = int(opt.get("batch_size_per_gpu", 1))
    return Loader(
        dataset,
        batch_size=batch * max(num_hosts, 1),
        shuffle=is_train,
        seed=seed,
        enlarge_ratio=int(opt.get("dataset_enlarge_ratio", 1)),
        drop_last=is_train,
        num_hosts=num_hosts,
        host_id=host_id,
    )
