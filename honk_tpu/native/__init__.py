from . import wavpack  # noqa: F401
