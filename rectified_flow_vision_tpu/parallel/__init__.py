"""Parallelism: device mesh, shardings, multi-host init."""

from rectified_flow_vision_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_mesh,
    make_param_shardings,
    fsdp_spec,
    make_fsdp_param_shardings,
    maybe_init_distributed,
    place_params,
    place_train_state,
    replicated,
    shard_batch,
    shard_opt_state,
    shard_params,
    shard_params_fsdp,
)
