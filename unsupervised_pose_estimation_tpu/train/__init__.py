from .bundle import ModelBundle  # noqa: F401
from .state import TrainState  # noqa: F401
