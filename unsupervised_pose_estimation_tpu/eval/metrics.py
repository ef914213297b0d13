"""Evaluation metrics: depth error suite, flip post-processing, odometry
ATE / rotation error.

numpy implementations matching the reference formulas:
  * depth metrics `/root/reference/evaluate_depth.py:27-45` (==
    `/root/reference/layers.py:335-353`)
  * flip-ensemble disparity merge `/root/reference/evaluate_depth.py:48-56`
  * ATE over 5-frame tracks `/root/reference/evaluate_pose.py:40-52`
  * rotation error `/root/reference/evaluate_pose.py:55-69`
"""

from __future__ import annotations

import numpy as np


def compute_depth_errors(gt: np.ndarray, pred: np.ndarray):
    """-> (abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3)."""
    thresh = np.maximum(gt / pred, pred / gt)
    a1 = (thresh < 1.25).mean()
    a2 = (thresh < 1.25 ** 2).mean()
    a3 = (thresh < 1.25 ** 3).mean()

    rmse = np.sqrt(((gt - pred) ** 2).mean())
    rmse_log = np.sqrt(((np.log(gt) - np.log(pred)) ** 2).mean())
    abs_rel = (np.abs(gt - pred) / gt).mean()
    sq_rel = (((gt - pred) ** 2) / gt).mean()
    return abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3


def batch_post_process_disparity(l_disp: np.ndarray, r_disp: np.ndarray):
    """Merge left/flipped disparities with the monodepth ramp mask."""
    _, h, w = l_disp.shape
    m_disp = 0.5 * (l_disp + r_disp)
    grid_l, _ = np.meshgrid(np.linspace(0, 1, w), np.linspace(0, 1, h),
                            indexing="xy")
    l_mask = 1.0 - np.clip(20 * (grid_l - 0.05), 0, 1)[None, ...]
    r_mask = l_mask[:, :, ::-1]
    return r_mask * l_disp + l_mask * r_disp + \
        (1.0 - l_mask - r_mask) * m_disp


# ---------------------------------------------------------------------------
# pose / odometry
# ---------------------------------------------------------------------------


def dump_xyz(source_to_target_transformations):
    """Chain local SE(3)s into global translations
    (`evaluate_pose.py:17-26`)."""
    xyzs = []
    cam_to_world = np.eye(4)
    xyzs.append(cam_to_world[:3, 3])
    for t in source_to_target_transformations:
        cam_to_world = np.dot(cam_to_world, t)
        xyzs.append(cam_to_world[:3, 3])
    return xyzs


def dump_r(source_to_target_transformations):
    """Chain local SE(3)s into global rotations (`evaluate_pose.py:28-36`)."""
    rs = []
    cam_to_world = np.eye(4)
    rs.append(cam_to_world[:3, :3])
    for t in source_to_target_transformations:
        cam_to_world = np.dot(cam_to_world, t)
        rs.append(cam_to_world[:3, :3])
    return rs


def compute_ate(gtruth_xyz, pred_xyz_o):
    """Absolute trajectory RMSE after offset + lstsq scale alignment
    (`evaluate_pose.py:40-52`)."""
    offset = gtruth_xyz[0] - pred_xyz_o[0]
    pred_xyz = pred_xyz_o + offset[None, :]

    scale = np.sum(gtruth_xyz * pred_xyz) / max(np.sum(pred_xyz ** 2), 1e-12)
    alignment_error = pred_xyz * scale - gtruth_xyz
    rmse = np.sqrt(np.sum(alignment_error ** 2)) / gtruth_xyz.shape[0]
    return rmse


def compute_re(gtruth_r, pred_r):
    """Mean geodesic rotation error (`evaluate_pose.py:55-69`)."""
    re = 0
    for gt_pose, pred_pose in zip(gtruth_r, pred_r):
        r = np.dot(gt_pose, np.linalg.inv(pred_pose))
        cos_angle = (np.trace(r) - 1.0) / 2.0
        re += np.arccos(np.clip(cos_angle, -1.0, 1.0))
    return re / max(len(gtruth_r), 1)
