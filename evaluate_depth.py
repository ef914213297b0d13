#!/usr/bin/env python
"""Entry point: `python evaluate_depth.py [flags]` — same invocation as the
reference's /root/reference/evaluate_depth.py, dispatching to the TPU framework."""
from unsupervised_pose_estimation_tpu.cli.evaluate_depth import main

if __name__ == "__main__":
    main()
