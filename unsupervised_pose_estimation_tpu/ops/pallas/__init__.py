"""Pallas TPU kernels for the view-synthesis hot path.

Kernels are opt-in (Options.use_pallas_loss) and fall back to the pure-jnp
ops on platforms without Mosaic support; every kernel has an interpret-mode
test asserting bit-level agreement with the jnp reference implementation.
"""

from .reproj_loss import (  # noqa: F401
    reprojection_loss_pallas, reprojection_loss_pallas_planar)
