from .mesh import (  # noqa: F401
    batch_sharding,
    make_data_mesh,
    replicate,
    replicated,
    shard_batch,
)
from .runtime import initialize_distributed, is_primary  # noqa: F401
