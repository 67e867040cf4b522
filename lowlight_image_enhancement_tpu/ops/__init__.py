from lowlight_image_enhancement_tpu.ops.psf import (  # noqa: F401
    CrosstalkPSF,
    apply_psf,
    build_psf_kernels,
    create_crosstalk_psf,
    depthwise_conv,
    newbp_conv,
    normalize_psf_energy,
)
