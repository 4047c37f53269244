from .logging import MetricsLogger  # noqa: F401
from .profiling import annotate, trace_to  # noqa: F401
