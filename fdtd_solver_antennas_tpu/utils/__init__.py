from .profiling import CellRateReport, cell_rate, timed
from .tracing import StepTimer, summarize_trace, trace

__all__ = [
    "CellRateReport",
    "cell_rate",
    "timed",
    "trace",
    "summarize_trace",
    "StepTimer",
]
