from zeroshotsemanticsegmentation_tpu.parallel.mesh import (
    make_mesh, make_multislice_mesh, shard_params, shard_batch,
    shard_opt_state, param_pspecs, batch_pspecs, replicate)

__all__ = ["make_mesh", "make_multislice_mesh", "shard_params",
           "shard_batch", "shard_opt_state", "param_pspecs", "batch_pspecs",
           "replicate"]
