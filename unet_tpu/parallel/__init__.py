from unet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                    make_parallel_train_step, replicated,
                                    shard_batch, shard_state)

__all__ = ["make_mesh", "batch_sharding", "replicated",
           "make_parallel_train_step", "shard_batch", "shard_state"]
