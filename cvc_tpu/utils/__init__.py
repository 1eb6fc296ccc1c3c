from cvc_tpu.utils.logging import MetricLogger
from cvc_tpu.utils.profiling import StepTimer, trace_context

__all__ = ["MetricLogger", "StepTimer", "trace_context"]
