#!/usr/bin/env python
"""Entry point: `python evaluate_pose.py [flags]` — same invocation as the
reference's /root/reference/evaluate_pose.py, dispatching to the TPU framework."""
from unsupervised_pose_estimation_tpu.cli.evaluate_pose import main

if __name__ == "__main__":
    main()
