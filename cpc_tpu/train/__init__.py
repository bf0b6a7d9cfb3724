from cpc_tpu.train.train_step import make_step_fns  # noqa: F401
from cpc_tpu.train.trainer import Trainer  # noqa: F401
