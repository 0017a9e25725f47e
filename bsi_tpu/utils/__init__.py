from .logging import MetricLogger, count_params

__all__ = ["MetricLogger", "count_params"]
