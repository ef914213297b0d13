"""KITTI velodyne -> depth-map projection (host-side numpy).

Fresh implementation of the standard KITTI projection pipeline with the same
behaviour as the reference's `generate_depth_map`
(`/root/reference/kitti_utils.py:46-98`): read calib_cam_to_cam +
calib_velo_to_cam, form P_velo->image for the chosen camera, project scan
points with positive depth, round to pixel indices, and resolve duplicate
pixels by keeping the minimum depth.
"""

from __future__ import annotations

import os
from collections import Counter

import numpy as np


def load_velodyne_points(path: str) -> np.ndarray:
    """(N, 4) float32 scan; reflectance column replaced by 1 (homogeneous)."""
    points = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    points[:, 3] = 1.0
    return points


def read_calib_file(path: str) -> dict:
    data = {}
    with open(path, "r") as f:
        for line in f:
            if ":" in line:
                key, value = line.split(":", 1)
            else:
                parts = line.split()
                if not parts:
                    continue
                key, value = parts[0], " ".join(parts[1:])
            try:
                data[key.strip()] = np.asarray(
                    [float(x) for x in value.split()])
            except ValueError:
                data[key.strip()] = value.strip()
    return data


def sub2ind(matrix_size, row_sub, col_sub):
    m, n = matrix_size
    return row_sub * (n - 1) + col_sub - 1


def generate_depth_map(calib_dir: str, velo_filename: str, cam: int = 2,
                       vel_depth: bool = False) -> np.ndarray:
    """-> (H, W) depth map in meters, zeros where no return."""
    cam2cam = read_calib_file(
        os.path.join(calib_dir, "calib_cam_to_cam.txt"))
    velo2cam_raw = read_calib_file(
        os.path.join(calib_dir, "calib_velo_to_cam.txt"))
    velo2cam = np.hstack([velo2cam_raw["R"].reshape(3, 3),
                          velo2cam_raw["T"].reshape(3, 1)])
    velo2cam = np.vstack([velo2cam, [0, 0, 0, 1]])

    im_shape = cam2cam["S_rect_02"][::-1].astype(np.int32)

    r_cam2rect = np.eye(4)
    r_cam2rect[:3, :3] = cam2cam["R_rect_00"].reshape(3, 3)
    p_rect = cam2cam[f"P_rect_0{cam}"].reshape(3, 4)
    p_velo2im = p_rect @ r_cam2rect @ velo2cam

    velo = load_velodyne_points(velo_filename)
    velo = velo[velo[:, 0] >= 0, :]  # points in front of the car

    velo_pts_im = (p_velo2im @ velo.T).T
    velo_pts_im[:, :2] = velo_pts_im[:, :2] / velo_pts_im[:, 2][..., None]
    if vel_depth:
        velo_pts_im[:, 2] = velo[:, 0]

    # round to pixel positions; the reference subtracts 1 (matlab indexing)
    velo_pts_im[:, 0] = np.round(velo_pts_im[:, 0]) - 1
    velo_pts_im[:, 1] = np.round(velo_pts_im[:, 1]) - 1
    val_inds = (velo_pts_im[:, 0] >= 0) & (velo_pts_im[:, 1] >= 0) & \
        (velo_pts_im[:, 0] < im_shape[1]) & (velo_pts_im[:, 1] < im_shape[0])
    velo_pts_im = velo_pts_im[val_inds, :]

    depth = np.zeros(im_shape)
    depth[velo_pts_im[:, 1].astype(np.int64),
          velo_pts_im[:, 0].astype(np.int64)] = velo_pts_im[:, 2]

    # duplicate pixels keep the nearest return
    inds = sub2ind(depth.shape, velo_pts_im[:, 1], velo_pts_im[:, 0])
    dupe_inds = [item for item, count in Counter(inds).items() if count > 1]
    for dd in dupe_inds:
        pts = np.where(inds == dd)[0]
        x_loc = int(velo_pts_im[pts[0], 0])
        y_loc = int(velo_pts_im[pts[0], 1])
        depth[y_loc, x_loc] = velo_pts_im[pts, 2].min()
    depth[depth < 0] = 0
    return depth
