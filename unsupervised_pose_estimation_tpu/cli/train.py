"""Training CLI — the `python train.py` analogue
(`/root/reference/train.py:18-48`), including the reference's fixed
lr/sampling overrides and the random hyperparameter sweep mode.
"""

from __future__ import annotations

import numpy as np

from ..config import parse_options
from ..train.loop import Trainer


def main(argv=None):
    opts = parse_options(argv, description="TPU monodepth training")

    if opts.wandb_sweep:
        # random search over lr and sampling frequency (train.py:38-48)
        rng = np.random.default_rng(opts.seed)
        for trial in range(10):
            lr = float(10 ** rng.uniform(-8, -3))
            sampling = int(rng.integers(1, 5))
            print(f"[sweep trial {trial}] lr={lr:g} sampling={sampling}")
            Trainer(opts, lr=lr, sampling=sampling).train()
    else:
        # fixed defaults of the reference driver (train.py:32-33) are the
        # dataclass defaults; honour explicit flags as-is.
        Trainer(opts).train()


if __name__ == "__main__":
    main()
