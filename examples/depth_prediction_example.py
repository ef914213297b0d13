"""Single-image depth prediction walkthrough.

The script form of the reference's `depth_prediction_example.ipynb`: load a
checkpoint, run the depth network on one image, display/save the colormapped
disparity. Runs on CPU or TPU.

Usage:
    python examples/depth_prediction_example.py \
        --model_path logs/mdp/models/orbax --image assets/test_image.jpg
"""

from __future__ import annotations

import argparse

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--image", required=True)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=192)
    ap.add_argument("--out", default="disp_example.png")
    args = ap.parse_args()

    from unsupervised_pose_estimation_tpu.config import Options
    from unsupervised_pose_estimation_tpu.eval.evaluate_depth import (
        _resize_bilinear_np, load_eval_state)
    from unsupervised_pose_estimation_tpu.train.step import build_infer_step

    opt = Options(height=args.height, width=args.width,
                  load_weights_folder=args.model_path)
    bundle, state = load_eval_state(opt)
    infer = build_infer_step(bundle)

    img = Image.open(args.image).convert("RGB")
    orig_w, orig_h = img.size
    feed = np.asarray(img.resize((opt.width, opt.height), Image.LANCZOS),
                      np.float32)[None] / 255.0

    disp = np.asarray(infer(state.params, state.batch_stats, feed)[0]
                      )[0, ..., 0]
    disp_full = _resize_bilinear_np(disp, orig_h, orig_w)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.cm as cm

    vmax = np.percentile(disp_full, 95)
    colored = (cm.get_cmap("magma")(np.clip(disp_full / max(vmax, 1e-9),
                                            0, 1))[..., :3] * 255
               ).astype(np.uint8)
    Image.fromarray(colored).save(args.out)
    print(f"wrote {args.out} (disparity range "
          f"[{disp_full.min():.4f}, {disp_full.max():.4f}])")


if __name__ == "__main__":
    main()
