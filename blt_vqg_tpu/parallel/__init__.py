from blt_vqg_tpu.parallel.mesh import build_mesh, local_mesh
from blt_vqg_tpu.parallel.sharding import (
    batch_sharding,
    param_sharding_rules,
    shard_params,
    replicate,
)
