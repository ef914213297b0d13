#!/usr/bin/env python
"""Entry point: `python train.py [flags]` — same invocation as the
reference's /root/reference/train.py, dispatching to the TPU framework."""
from unsupervised_pose_estimation_tpu.cli.train import main

if __name__ == "__main__":
    main()
