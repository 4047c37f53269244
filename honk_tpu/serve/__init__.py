from .http import serve  # noqa: F401
from .service import LabelService, TrainingService, default_labels  # noqa: F401
from .streams import StreamHub  # noqa: F401
