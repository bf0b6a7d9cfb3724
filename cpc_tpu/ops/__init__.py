from cpc_tpu.ops.infonce import infonce_loss_and_metrics  # noqa: F401
from cpc_tpu.ops.scalogram import cqt, cqt_design, scalogram  # noqa: F401
