from .configs import (  # noqa: F401
    DataConfig,
    ExperimentConfig,
    MeshConfig,
    StreamConfig,
    TrainConfig,
)
