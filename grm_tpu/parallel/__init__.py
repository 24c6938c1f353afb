from .mesh import (  # noqa: F401
    make_mesh,
    scm_device_step,
    shard_bit_matrix,
    sharded_presence_counts,
)
