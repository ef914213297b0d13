from . import geometry, losses, resize, warp  # noqa: F401
