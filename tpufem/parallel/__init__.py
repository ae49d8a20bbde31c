from tpufem.parallel.spmd import (
    ShardedEnsemble,
    build_device_mesh,
    make_sharded_step,
)

__all__ = ["ShardedEnsemble", "build_device_mesh", "make_sharded_step"]
