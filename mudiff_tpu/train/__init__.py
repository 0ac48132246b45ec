from mudiff_tpu.train.state import MutualTrainState, create_train_state  # noqa: F401
from mudiff_tpu.train.steps import (  # noqa: F401
    make_d_step,
    make_g_step,
    make_train_step,
)
