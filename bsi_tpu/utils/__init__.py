from .compilation_cache import enable_compilation_cache
from .logging import MetricLogger, count_params
from .seed import resolve_seed

__all__ = [
    "MetricLogger",
    "count_params",
    "enable_compilation_cache",
    "resolve_seed",
]
