from lowlight_image_enhancement_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    create_mesh,
    replicate_sharding,
    shard_batch,
)
from lowlight_image_enhancement_tpu.parallel.spatial import (  # noqa: F401
    halo_exchange_rows,
    nafnet_apply_spatial,
)
from lowlight_image_enhancement_tpu.parallel.zero import (  # noqa: F401
    zero1_device_put,
    zero1_shardings,
)
