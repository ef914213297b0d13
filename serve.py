#!/usr/bin/env python
"""Entry point: `python serve.py --load_weights_folder <ckpt> --port 8000` —
batched depth-inference HTTP server (new capability; the reference's only
inference surface is the test_simple.py CLI)."""
from unsupervised_pose_estimation_tpu.cli.serve import main

if __name__ == "__main__":
    main()
