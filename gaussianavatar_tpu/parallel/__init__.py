from gaussianavatar_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    DATA_AXIS,
)
