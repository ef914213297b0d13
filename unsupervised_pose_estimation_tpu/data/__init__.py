from .datasets import (  # noqa: F401
    KITTIDepthDataset, KITTIOdomDataset, KITTIRAWDataset, LungRAWDataset,
    SCAREDRAWDataset, SyntheticDataset, SyntheticParallaxDataset,
    make_dataset)
from .pipeline import Loader  # noqa: F401
from .split import parse_split_line, readlines  # noqa: F401
