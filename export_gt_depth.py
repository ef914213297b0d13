#!/usr/bin/env python
"""Entry point: `python export_gt_depth.py [flags]` — same invocation as the
reference's /root/reference/export_gt_depth.py, dispatching to the TPU framework."""
from unsupervised_pose_estimation_tpu.cli.export_gt_depth import main

if __name__ == "__main__":
    main()
