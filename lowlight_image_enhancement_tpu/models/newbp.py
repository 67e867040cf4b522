"""NewBP model factories (Scenario B).

Rebuild of ``NewBP_model/newbp_net_arch.py:31-99`` and the registry adapter
``archs/newbp_nafnet_arch.py:20-51``:

- :func:`create_newbp_net` returns a **plain NAFNet** — the key Scenario-B
  invariant: the input observation ``A`` is NEVER convolved with the PSF in
  the forward pass (no "double crosstalk"); the PSF lives only in the loss
  branch via :func:`...ops.psf.create_crosstalk_psf`.
- ``NewBPNAFNet`` is the YAML-facing alias resolving through ARCH_REGISTRY.
"""

from __future__ import annotations

import logging
from typing import Any, Mapping, Optional, Sequence

import jax.numpy as jnp

from lowlight_image_enhancement_tpu.models.nafnet import NAFNet
from lowlight_image_enhancement_tpu.ops.psf import (  # noqa: F401  (re-export)
    create_crosstalk_psf,
)
from lowlight_image_enhancement_tpu.utils.registry import ARCH_REGISTRY

logger = logging.getLogger(__name__)


def create_newbp_net(
    in_channels: int = 3,
    width: Optional[int] = None,
    enc_blk_nums: Optional[Sequence[int]] = None,
    middle_blk_num: Optional[int] = None,
    dec_blk_nums: Optional[Sequence[int]] = None,
    nafnet_params: Optional[Mapping[str, Any]] = None,
    dtype: Any = jnp.float32,
    **_ignored: Any,
) -> NAFNet:
    """Build the Scenario-B backbone: a plain NAFNet.

    Mirrors reference ``create_newbp_net`` (``newbp_net_arch.py:31-85``):
    maps ``in_channels/width/enc_blk_nums/middle_blk_num/dec_blk_nums`` or
    a ``nafnet_params`` dict onto NAFNet kwargs and logs the configuration.
    Extra kwargs (e.g. ``kernel_type``/``kernel_spec`` from YAML configs)
    are accepted and ignored here — the PSF is constructed separately for
    the loss path.
    """
    params: dict[str, Any] = dict(nafnet_params or {})
    params.setdefault("img_channel", in_channels)
    if width is not None:
        params["width"] = width
    if enc_blk_nums is not None:
        params["enc_blk_nums"] = tuple(enc_blk_nums)
    if middle_blk_num is not None:
        params["middle_blk_num"] = middle_blk_num
    if dec_blk_nums is not None:
        params["dec_blk_nums"] = tuple(dec_blk_nums)
    params.setdefault("width", 32)
    params.setdefault("enc_blk_nums", (2, 2, 4, 8))
    params.setdefault("middle_blk_num", 12)
    params.setdefault("dec_blk_nums", (2, 2, 2, 2))
    params["enc_blk_nums"] = tuple(params["enc_blk_nums"])
    params["dec_blk_nums"] = tuple(params["dec_blk_nums"])
    params["dtype"] = dtype

    logger.info(
        "create_newbp_net: plain NAFNet (Scenario B — PSF in loss path "
        "only). params=%s",
        params,
    )
    return NAFNet(**params)


@ARCH_REGISTRY.register(name="NewBPNAFNet")
def newbp_nafnet(**kwargs: Any) -> NAFNet:
    """YAML-facing adapter: ``type: NewBPNAFNet`` -> plain NAFNet."""
    return create_newbp_net(**kwargs)
