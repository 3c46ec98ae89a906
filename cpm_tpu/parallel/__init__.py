from cpm_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
)
