from tpu_se.utils.logging import EpochLogger, get_logger
from tpu_se.utils.profiling import profile_trace, StepTimer

__all__ = ["EpochLogger", "get_logger", "profile_trace", "StepTimer"]
