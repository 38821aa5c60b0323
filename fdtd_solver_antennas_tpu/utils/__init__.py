from .profiling import CellRateReport, cell_rate

__all__ = ["CellRateReport", "cell_rate"]
