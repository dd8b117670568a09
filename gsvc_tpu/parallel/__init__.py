from gsvc_tpu.parallel.spmd import (
    make_mesh, make_spmd_train_step, shard_model_state, combine_slab_renders,
)

__all__ = ["make_mesh", "make_spmd_train_step", "shard_model_state",
           "combine_slab_renders"]
