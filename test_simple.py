#!/usr/bin/env python
"""Entry point: `python test_simple.py --image_path X --model_path Y` — same
invocation as the reference's /root/reference/test_simple.py."""
from unsupervised_pose_estimation_tpu.cli.test_simple import main

if __name__ == "__main__":
    main()
