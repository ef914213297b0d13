#!/usr/bin/env python
"""Entry point: `python export_model.py --load_weights_folder <ckpt>` —
AOT-export the depth forward as a StableHLO artifact for lean serving."""
from unsupervised_pose_estimation_tpu.cli.export_model import main

if __name__ == "__main__":
    main()
