from .mesh import (  # noqa: F401
    DATA_AXIS,
    batch_sharded,
    initialize_distributed,
    make_dp_eval_step,
    make_dp_train_step,
    make_mesh,
    replicated,
    shard_batch,
)
