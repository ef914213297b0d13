from .mesh import (batch_axes, batch_sharding, make_mesh,  # noqa: F401
                   param_sharding)
