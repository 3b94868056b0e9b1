from .loop import (
    TrainState,
    create_train_state,
    make_train_step,
    make_mesh,
    shard_train_step,
    save_checkpoint,
    latest_checkpoint,
    load_checkpoint,
    load_params,
)
