"""Depth evaluation driver.

Mirrors `/root/reference/evaluate_depth.py:59-225`: load checkpoint, run
batched inference over the eval split, optional flip-ensemble post-process,
resize predictions to GT, (eigen crop for KITTI splits), median scaling,
clamp to [1e-3, 80], print the 7-metric row.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np

from ..config import Options
from ..data.datasets import make_dataset
from ..data.pipeline import Loader
from ..data.resample import resize_nearest_np
from ..data.split import readlines
from ..ops.geometry import disp_to_depth
from ..train.bundle import ModelBundle
from ..train.step import build_infer_step
from .metrics import (batch_post_process_disparity, compute_depth_errors,
                      resize_bilinear_np as _resize_bilinear_np)

# "stereo" training produces scale-aware depth: nominal 0.1 baseline vs the
# 54 cm KITTI rig (evaluate_depth.py:21-24)
STEREO_SCALE_FACTOR = 5.4

MIN_DEPTH_EVAL = 1e-3
MAX_DEPTH_EVAL = 80.0


class _EvalFrames:
    """Single-frame eval items (frame_ids=[0]) from any dataset class."""

    def __init__(self, dataset):
        self.dataset = dataset

    def __len__(self):
        return len(self.dataset)

    def get_item(self, index, epoch=0):
        item = self.dataset.get_item(index, epoch)
        color = item["color"][0]
        if color.dtype == np.uint8:
            color = color.astype(np.float32) / 255.0
        return {"color": color}  # (H, W, 3) float32 [0,1]


def splits_root(opt: Options) -> str:
    """--split_dir override, else the repo's vendored splits/ tree."""
    return opt.split_dir or os.path.join(os.path.dirname(__file__),
                                         "..", "..", "splits")


def load_eval_state(opt: Options):
    """Build bundle and load weights from either an orbax checkpoint
    directory or a reference-format .pth folder.

    When a .pth depth decoder auto-detects as the other variant (upstream
    monodepth2 vs fork deconv+BN), the bundle is built with the DETECTED
    variant so no randomly-initialized deconv/BN layers silently run."""
    from ..train.state import create_train_state
    from ..train import checkpoint as ck
    from ..train.checkpoint import latest_step, restore_checkpoint

    folder = os.path.expanduser(opt.load_weights_folder)
    assert os.path.isdir(folder), f"Cannot find folder {folder}"
    is_orbax = latest_step(folder) is not None

    dec = None
    if not is_orbax:
        dec = ck.import_depth_decoder(os.path.join(folder, "depth.pth"),
                                      opt.scales)
        if dec["variant"] != opt.depth_decoder_variant:
            print(f"-> depth.pth detected as '{dec['variant']}' decoder; "
                  f"building that variant")
            opt = type(opt)(**{**opt.__dict__,
                               "depth_decoder_variant": dec["variant"]})

    bundle = ModelBundle.create(opt)
    state = create_train_state(bundle, jax.random.PRNGKey(0),
                               opt.learning_rate)
    if is_orbax:
        state = restore_checkpoint(folder, state)
    else:
        params = dict(state.params)
        stats = dict(state.batch_stats)
        enc = ck.import_resnet_encoder(
            os.path.join(folder, "encoder.pth"), opt.num_layers)
        params["encoder"], stats["encoder"] = enc["params"], enc["batch_stats"]
        params["depth"] = {**params["depth"], **dec["params"]}
        state = state.replace(params=params, batch_stats=stats)
    return bundle, state


def predict_disparities(opt: Options, bundle, state, filenames) -> np.ndarray:
    frame_ids = [0]
    ds = make_dataset(opt.dataset, data_path=opt.data_path,
                      filenames=filenames, height=opt.height,
                      width=opt.width, frame_idxs=frame_ids,
                      is_train=False, img_ext=".png")
    loader = Loader(_EvalFrames(ds), min(opt.batch_size, len(ds)),
                    shuffle=False, num_workers=8, prefetch=2)
    infer = build_infer_step(bundle)

    disps = []
    for batch in loader.epoch(0):
        img = batch["color"]
        if opt.post_process:
            img = np.concatenate([np.asarray(img),
                                  np.asarray(img)[:, :, ::-1]], 0)
        out = infer(state.params, state.batch_stats, img)[0][..., 0]
        out = np.asarray(out)
        scaled_disp, _ = disp_to_depth(out, opt.min_depth, opt.max_depth)
        scaled_disp = np.asarray(scaled_disp)
        if opt.post_process:
            n = scaled_disp.shape[0] // 2
            scaled_disp = batch_post_process_disparity(
                scaled_disp[:n], scaled_disp[n:, :, ::-1])
        disps.append(scaled_disp)
    # drop_last trims the tail; evaluate remaining frames individually
    n_done = sum(d.shape[0] for d in disps)
    frames = _EvalFrames(ds)
    for i in range(n_done, len(ds)):
        img = frames.get_item(i)["color"][None]
        out = np.asarray(infer(state.params, state.batch_stats, img)[0][..., 0])
        scaled_disp, _ = disp_to_depth(out, opt.min_depth, opt.max_depth)
        disps.append(np.asarray(scaled_disp))
    return np.concatenate(disps, 0)


def evaluate(opt: Options, gt_depths: Optional[np.ndarray] = None):
    """Returns the metric row dict and prints it reference-style."""
    assert not (opt.eval_mono and opt.eval_stereo), \
        "Please choose mono or stereo evaluation by selecting either " \
        "--eval_mono or --eval_stereo"

    splits_dir = splits_root(opt)

    if opt.ext_disp_to_eval is None:
        from ..data.split import resolve_split_file

        files = readlines(resolve_split_file(splits_dir, opt.eval_split))
        bundle, state = load_eval_state(opt)
        pred_disps = predict_disparities(opt, bundle, state, files)
    else:
        print(f"-> Loading predictions from {opt.ext_disp_to_eval}")
        pred_disps = np.load(opt.ext_disp_to_eval)
        if opt.eval_eigen_to_benchmark:
            # remap eigen-ordered results onto the benchmark split
            # (evaluate_depth.py:133-138)
            ids = np.load(os.path.join(splits_dir, "benchmark",
                                       "eigen_to_benchmark_ids.npy"))
            pred_disps = pred_disps[ids]

    if opt.save_pred_disps:
        out = os.path.join(opt.load_weights_folder or ".",
                           f"disps_{opt.eval_split}_split.npy")
        print("-> Saving predicted disparities to ", out)
        np.save(out, pred_disps)

    if opt.no_eval:
        print("-> Evaluation disabled. Done.")
        return None

    if opt.eval_split == "benchmark":
        # KITTI online-benchmark submission pngs (evaluate_depth.py:149-163):
        # uint16 depth*256 at 1216x352, no local GT to score against.
        save_dir = os.path.join(opt.load_weights_folder or ".",
                                "benchmark_predictions")
        print(f"-> Saving out benchmark predictions to {save_dir}")
        os.makedirs(save_dir, exist_ok=True)
        from PIL import Image

        for idx in range(len(pred_disps)):
            disp_resized = _resize_bilinear_np(pred_disps[idx], 352, 1216)
            depth = STEREO_SCALE_FACTOR / np.maximum(disp_resized, 1e-9)
            depth = np.clip(depth, 0, 80)
            depth16 = (depth * 256).astype(np.uint16)
            Image.fromarray(depth16, mode="I;16").save(
                os.path.join(save_dir, f"{idx:010d}.png"))
        print("-> No ground truth is available for the KITTI benchmark, "
              "so not evaluating. Done.")
        return None

    if gt_depths is None:
        gt_path = os.path.join(splits_dir, opt.eval_split, "gt_depths.npz")
        gt_depths = np.load(gt_path, fix_imports=True,
                            allow_pickle=True)["data"]

    print("-> Evaluating")
    if opt.eval_stereo:
        print("   Stereo evaluation - disabling median scaling, "
              f"scaling by {STEREO_SCALE_FACTOR}")
        opt = type(opt)(**{**opt.__dict__, "disable_median_scaling": True,
                           "pred_depth_scale_factor": STEREO_SCALE_FACTOR})
    else:
        print("   Mono evaluation - using median scaling")

    errors = []
    ratios = []
    for i in range(min(pred_disps.shape[0], len(gt_depths))):
        gt_depth = gt_depths[i]
        gt_height, gt_width = gt_depth.shape[:2]
        pred_disp = pred_disps[i]
        # bilinear-resize pred to GT resolution (evaluate_depth.py:184-186)
        pred_disp = _resize_bilinear_np(pred_disp, gt_height, gt_width)
        pred_depth = 1.0 / np.maximum(pred_disp, 1e-12)

        if opt.eval_split == "eigen":
            mask = np.logical_and(gt_depth > MIN_DEPTH_EVAL,
                                  gt_depth < MAX_DEPTH_EVAL)
            crop = np.array([0.40810811 * gt_height, 0.99189189 * gt_height,
                             0.03594771 * gt_width, 0.96405229 * gt_width]
                            ).astype(np.int32)
            crop_mask = np.zeros(mask.shape)
            crop_mask[crop[0]:crop[1], crop[2]:crop[3]] = 1
            mask = np.logical_and(mask, crop_mask)
        else:
            mask = gt_depth > 0

        pred_depth = pred_depth[mask]
        gt_depth = gt_depth[mask]
        if gt_depth.size == 0:
            continue

        pred_depth *= opt.pred_depth_scale_factor
        if not opt.disable_median_scaling:
            ratio = np.median(gt_depth) / np.median(pred_depth)
            ratios.append(ratio)
            pred_depth *= ratio

        pred_depth = np.clip(pred_depth, MIN_DEPTH_EVAL, MAX_DEPTH_EVAL)
        errors.append(compute_depth_errors(gt_depth, pred_depth))

    if not opt.disable_median_scaling and ratios:
        ratios = np.array(ratios)
        med = np.median(ratios)
        print(f" Scaling ratios | med: {med:0.3f} | "
              f"std: {np.std(ratios / med):0.3f}")

    mean_errors = np.array(errors).mean(0)
    names = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")
    print("\n  " + ("{:>8} | " * 7).format(*names))
    print(("&{: 8.3f}  " * 7).format(*mean_errors.tolist()) + "\\\\")
    print("\n-> Done!")
    return dict(zip(names, mean_errors.tolist()))
