from .checkpoint import Checkpointer  # noqa: F401
