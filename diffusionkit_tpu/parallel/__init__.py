from .mesh import create_mesh, init_distributed, local_mesh  # noqa: F401
from .sharding import (  # noqa: F401
    data_sharding,
    mmdit_shardings,
    replicate,
    shard_params,
    t5_shardings,
)
from .ring_attention import ring_attention  # noqa: F401
