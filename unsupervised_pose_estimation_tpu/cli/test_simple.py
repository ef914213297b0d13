"""Single-image / folder depth inference CLI.

Mirrors `/root/reference/test_simple.py:46-190`: load a checkpoint, resize
each image to the model feed size, predict disparity, save
``<name>_disp.npy`` (scaled disparity at the model's min/max depth range) and
a magma-colormapped jpeg at input resolution. The optional pose-pair dump
(test_simple.py:173-188, gated off upstream) is exposed via
``--pose_prediction``.
"""

from __future__ import annotations

import argparse
import glob
import os

import jax
import numpy as np
from PIL import Image

from ..config import Options
from ..ops.geometry import disp_to_depth, transformation_from_parameters
from ..train.step import build_infer_step


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Simple testing function for depth prediction")
    parser.add_argument("--image_path", required=True,
                        help="path to a test image or folder of images")
    parser.add_argument("--model_path", required=True,
                        help="orbax checkpoint dir or .pth weights folder")
    parser.add_argument("--ext", default="png",
                        help="image extension to search for in folder")
    parser.add_argument("--num_layers", type=int, default=18)
    parser.add_argument("--height", type=int, default=192)
    parser.add_argument("--width", type=int, default=192)
    parser.add_argument("--min_depth", type=float, default=0.1)
    parser.add_argument("--max_depth", type=float, default=150.0)
    parser.add_argument("--no_save_npy", action="store_true")
    parser.add_argument("--pose_prediction", action="store_true")
    return parser.parse_args(argv)


def _magma_colormap(x: np.ndarray) -> np.ndarray:
    import matplotlib

    matplotlib.use("Agg")

    vmax = np.percentile(x, 95)
    normed = np.clip(x / max(vmax, 1e-9), 0, 1)
    cmap = matplotlib.colormaps["magma"]
    return (cmap(normed)[..., :3] * 255).astype(np.uint8)


def test_simple(args):
    opt = Options(num_layers=args.num_layers, height=args.height,
                  width=args.width, min_depth=args.min_depth,
                  max_depth=args.max_depth,
                  load_weights_folder=args.model_path)
    from ..eval.evaluate_depth import load_eval_state

    bundle, state = load_eval_state(opt)
    infer = build_infer_step(bundle)

    if os.path.isfile(args.image_path):
        paths = [args.image_path]
        out_dir = os.path.dirname(args.image_path)
    elif os.path.isdir(args.image_path):
        paths = sorted(glob.glob(
            os.path.join(args.image_path, f"*.{args.ext}")))
        out_dir = args.image_path
    else:
        raise FileNotFoundError(args.image_path)
    print(f"-> Predicting on {len(paths)} test images")

    for idx, path in enumerate(paths):
        if path.endswith("_disp.jpg"):
            continue
        img = Image.open(path).convert("RGB")
        orig_w, orig_h = img.size
        feed = img.resize((opt.width, opt.height), Image.LANCZOS)
        x = np.asarray(feed, np.float32)[None] / 255.0

        disp = np.asarray(
            infer(state.params, state.batch_stats, x)[0])[0, ..., 0]
        # resize to source resolution for display (test_simple.py:147-150)
        from ..eval.evaluate_depth import _resize_bilinear_np
        disp_resized = _resize_bilinear_np(disp, orig_h, orig_w)

        name = os.path.splitext(os.path.basename(path))[0]
        if not args.no_save_npy:
            scaled_disp, _ = disp_to_depth(disp, opt.min_depth, opt.max_depth)
            np.save(os.path.join(out_dir, f"{name}_disp.npy"),
                    np.asarray(scaled_disp)[None, None])

        Image.fromarray(_magma_colormap(disp_resized)).save(
            os.path.join(out_dir, f"{name}_disp.jpg"))
        print(f"   Processed {idx + 1} of {len(paths)} images - "
              f"saved prediction to {out_dir}/{name}_disp.jpg")

    if args.pose_prediction and len(paths) >= 2 and \
            bundle.pose_encoder is not None:
        import csv

        a = np.asarray(Image.open(paths[0]).convert("RGB").resize(
            (opt.width, opt.height), Image.LANCZOS), np.float32) / 255.0
        b = np.asarray(Image.open(paths[1]).convert("RGB").resize(
            (opt.width, opt.height), Image.LANCZOS), np.float32) / 255.0
        pair = np.concatenate([a, b], -1)[None]
        feats = bundle.pose_encoder.apply(
            {"params": state.params["pose_encoder"],
             "batch_stats": state.batch_stats["pose_encoder"]}, pair, False)
        aa, tt = bundle.pose.apply({"params": state.params["pose"]}, [feats])
        T = np.asarray(transformation_from_parameters(
            np.asarray(aa)[:, 0, 0], np.asarray(tt)[:, 0, 0]))
        with open(os.path.join(out_dir, "rot_trans.csv"), "w",
                  newline="") as f:
            writer = csv.writer(f)
            writer.writerow(["axisangle", np.asarray(aa)[0, 0, 0].tolist()])
            writer.writerow(["translation", np.asarray(tt)[0, 0, 0].tolist()])
        np.savetxt(os.path.join(out_dir, "transform.csv"), T[0],
                   delimiter=",")
    print("-> Done!")


def main(argv=None):
    test_simple(parse_args(argv))


if __name__ == "__main__":
    main()
