from pistoseg_tpu.train.optim import (  # noqa: F401
    adamw_exponential,
    poly_sgd,
    poly_sgd_grouped,
)
from pistoseg_tpu.train.state import TrainState, create_train_state  # noqa: F401
from pistoseg_tpu.train.loop import (  # noqa: F401
    make_train_step,
    make_eval_step,
    Trainer,
)
