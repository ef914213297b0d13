"""Pose / odometry evaluation driver.

Mirrors `/root/reference/evaluate_pose.py:135-233`: run the pose network over
consecutive frame pairs of the eval split, chain the local SE(3)s, score ATE
and rotation error over 5-frame tracks against GT poses, and optionally plot
the scale-aligned 3D trajectory to ``vo.png``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Options
from ..data.datasets import make_dataset
from ..data.split import readlines
from ..ops.geometry import transformation_from_parameters
from ..train.bundle import ModelBundle
from .metrics import compute_ate, compute_re, dump_r, dump_xyz

TRACK_LENGTH = 5


def predict_pose_sequence(opt: Options, bundle: ModelBundle, state,
                          filenames) -> np.ndarray:
    """-> (N, 4, 4) local source->target transforms for consecutive pairs.

    Reference feeds cat(color[1], color[0]) (evaluate_pose.py:191-197).
    Pairs are batched for the TPU instead of the reference's batch-1 loop.
    """
    frame_ids = [0, 1]
    ds = make_dataset(opt.dataset, data_path=opt.data_path,
                      filenames=filenames, height=opt.height, width=opt.width,
                      frame_idxs=frame_ids, is_train=False, img_ext=".png")

    @jax.jit
    def pose_fwd(params, batch_stats, pair):
        feats = bundle.pose_encoder.apply(
            {"params": params["pose_encoder"],
             "batch_stats": batch_stats["pose_encoder"]}, pair, False)
        aa, tt = bundle.pose.apply({"params": params["pose"]}, [feats])
        return transformation_from_parameters(aa[:, 0, 0], tt[:, 0, 0])

    preds = []
    bs = max(1, opt.batch_size)
    buf = []
    for i in range(len(ds)):
        item = ds.get_item(i)
        color = item["color"].astype(np.float32)
        if item["color"].dtype == np.uint8:
            color = color / 255.0
        # temporal order: [frame 1, frame 0] concat on channels
        pair = np.concatenate([color[1], color[0]], axis=-1)
        buf.append(pair)
        if len(buf) == bs or i == len(ds) - 1:
            out = pose_fwd(state.params, state.batch_stats,
                           jnp.asarray(np.stack(buf, 0)))
            preds.append(np.asarray(out))
            buf = []
    return np.concatenate(preds, 0)


def plot_trajectory(gt_xyz: np.ndarray, pred_xyz: np.ndarray,
                    out_path: str = "vo.png"):
    """Scale-aligned 3D trajectory plot (`evaluate_pose.py:78-119`)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    scale = np.sum(gt_xyz * pred_xyz) / max(np.sum(pred_xyz ** 2), 1e-12)
    pred = pred_xyz * scale
    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    ax.plot(gt_xyz[:, 0], gt_xyz[:, 1], gt_xyz[:, 2], label="ground truth")
    ax.plot(pred[:, 0], pred[:, 1], pred[:, 2], label="predicted")
    ax.legend()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)


def evaluate(opt: Options, gt_poses: Optional[np.ndarray] = None):
    """Score ATE/RE. ``gt_poses``: (N, 4, 4) LOCAL source->target transforms
    (overrides the split's gt_poses_sq2.npz)."""
    from .evaluate_depth import load_eval_state, splits_root

    splits_dir = splits_root(opt)
    from ..data.split import resolve_split_file

    filenames = readlines(resolve_split_file(splits_dir, opt.eval_split))

    bundle, state = load_eval_state(opt)
    assert bundle.pose_encoder is not None, \
        "pose evaluation needs pose_model_type=separate_resnet weights"
    pred_local = predict_pose_sequence(opt, bundle, state, filenames)

    if gt_poses is None:
        gt_path = os.path.join(splits_dir, opt.eval_split,
                               "gt_poses_sq2.npz")
        gt_poses = np.load(gt_path, allow_pickle=True)["data"]
    # The npz stores LOCAL source->target transforms, consumed directly —
    # the reference feeds `gt_local_poses` straight into dump_xyz
    # (evaluate_pose.py:201-213); deriving locals from globals here would
    # score against a different trajectory.
    gt_local = np.asarray(gt_poses)

    n = min(len(pred_local), len(gt_local))
    ates, res = [], []
    for i in range(0, n - TRACK_LENGTH + 1):
        local_xyzs = np.array(dump_xyz(pred_local[i:i + TRACK_LENGTH - 1]))
        gt_xyzs = np.array(dump_xyz(gt_local[i:i + TRACK_LENGTH - 1]))
        local_rs = np.array(dump_r(pred_local[i:i + TRACK_LENGTH - 1]))
        gt_rs = np.array(dump_r(gt_local[i:i + TRACK_LENGTH - 1]))
        ates.append(compute_ate(gt_xyzs, local_xyzs))
        res.append(compute_re(gt_rs, local_rs))

    print(f"\n   Trajectory error: {np.mean(ates):0.4f}, "
          f"std: {np.std(ates):0.4f}\n")
    print(f"\n   Rotation error: {np.mean(res):0.4f}, "
          f"std: {np.std(res):0.4f}\n")

    if opt.eval_pose_trajectory:
        pred_xyz = np.array(dump_xyz(pred_local[:n]))
        gt_xyz = np.array(dump_xyz(gt_local[:n]))
        plot_trajectory(gt_xyz, pred_xyz,
                        os.path.join(opt.eval_out_dir or ".", "vo.png"))

    return {"ate_mean": float(np.mean(ates)), "ate_std": float(np.std(ates)),
            "re_mean": float(np.mean(res)), "re_std": float(np.std(res))}
