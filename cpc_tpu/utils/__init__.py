from cpc_tpu.utils.profiling import (  # noqa: F401
    StepTimer,
    enable_nan_debug,
    sync,
    trace,
)
