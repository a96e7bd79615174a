from tgt_tpu.parallel.mesh import (make_mesh, batch_sharding, shard_batch,
                                   replicated, initialize_distributed,
                                   DATA_AXIS, PAIR_AXIS)

__all__ = ["make_mesh", "batch_sharding", "shard_batch", "replicated",
           "initialize_distributed", "DATA_AXIS", "PAIR_AXIS"]
