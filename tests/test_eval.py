"""Tests for eval metrics and drivers (`/root/reference/evaluate_depth.py`,
`/root/reference/evaluate_pose.py` parity)."""

import numpy as np
import torch

from unsupervised_pose_estimation_tpu.eval.metrics import (
    batch_post_process_disparity, compute_ate, compute_depth_errors,
    compute_re, dump_r, dump_xyz)


def _torch_depth_errors(gt, pred):
    """Oracle per evaluate_depth.py:27-45 / layers.py:335-353."""
    gt, pred = torch.from_numpy(gt), torch.from_numpy(pred)
    thresh = torch.max(gt / pred, pred / gt)
    a1 = (thresh < 1.25).float().mean()
    a2 = (thresh < 1.25 ** 2).float().mean()
    a3 = (thresh < 1.25 ** 3).float().mean()
    rmse = torch.sqrt(((gt - pred) ** 2).mean())
    rmse_log = torch.sqrt(((torch.log(gt) - torch.log(pred)) ** 2).mean())
    abs_rel = (torch.abs(gt - pred) / gt).mean()
    sq_rel = (((gt - pred) ** 2) / gt).mean()
    return [float(v) for v in (abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3)]


def test_depth_errors_match_torch(rng_np):
    gt = rng_np.uniform(1, 50, size=(1000,)).astype(np.float64)
    pred = gt * rng_np.uniform(0.7, 1.4, size=gt.shape)
    ours = compute_depth_errors(gt, pred)
    oracle = _torch_depth_errors(gt, pred)
    np.testing.assert_allclose(ours, oracle, rtol=1e-6)


def test_depth_errors_perfect_prediction():
    gt = np.linspace(1, 10, 50)
    m = compute_depth_errors(gt, gt.copy())
    np.testing.assert_allclose(m[:4], 0.0, atol=1e-12)
    np.testing.assert_allclose(m[4:], 1.0)


def test_train_time_depth_metrics():
    """compute_depth_losses analogue (ref trainer.py:688-716): garg crop,
    gt>0 mask, median scaling, full 7-metric row."""
    from unsupervised_pose_estimation_tpu.eval.metrics import (
        TRAIN_DEPTH_METRIC_NAMES, train_time_depth_metrics)

    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:375, 0:1242].astype(np.float64)
    smooth = 5.0 + 10.0 * yy / 375 + 5.0 * xx / 1242
    gt = np.stack([smooth, smooth * 1.1])
    gt[:, ::3] = 0.0  # sparse GT (velodyne-style)
    # prediction: half resolution, 2x global scale -> median scaling cancels
    # the factor; the smooth field keeps the resize error tiny
    pred = np.stack([smooth[::2, ::2], smooth[::2, ::2] * 1.1]) * 2.0
    m = train_time_depth_metrics(pred, gt)
    assert set(m) == set(TRAIN_DEPTH_METRIC_NAMES)
    assert m["de/abs_rel"] < 0.01
    assert m["da/a1"] > 0.99

    # perfect, dense, constant-scale prediction -> exact zeros
    gt2 = rng.uniform(5, 20, size=(1, 375, 1242))
    m2 = train_time_depth_metrics(gt2 * 3.0, gt2)
    assert m2["de/abs_rel"] < 1e-6 and m2["da/a1"] == 1.0

    # empty mask (all-zero GT) -> no metrics
    assert train_time_depth_metrics(gt2, np.zeros_like(gt2)) == {}

    # GT smaller than the garg crop origin (endovis/synthetic) -> verbatim
    # crop would be empty; the monitor must fall back to the gt>0 mask
    gt3 = rng.uniform(5, 20, size=(1, 64, 128))
    m3 = train_time_depth_metrics(gt3 * 2.0, gt3)
    assert m3["de/abs_rel"] < 1e-6 and m3["da/a1"] == 1.0


def test_post_process_symmetric(rng_np):
    d = rng_np.uniform(0.01, 1, size=(2, 20, 30)).astype(np.float32)
    out = batch_post_process_disparity(d, d)
    np.testing.assert_allclose(out, d, atol=1e-6)


def test_ate_zero_for_identical_trajectories(rng_np):
    traj = np.cumsum(rng_np.normal(size=(6, 3)), 0)
    assert compute_ate(traj, traj.copy()) < 1e-9


def test_ate_scale_invariance(rng_np):
    # lstsq scale alignment makes a scaled trajectory near-zero error;
    # trajectories from dump_xyz always start at the origin
    traj = np.vstack([np.zeros(3),
                      np.cumsum(rng_np.uniform(0.1, 1.0, size=(5, 3)), 0)])
    assert compute_ate(traj, traj * 3.7) < 1e-9


def test_re_zero_for_identity():
    rs = [np.eye(3)] * 5
    assert compute_re(rs, rs) == 0.0


def test_re_known_angle():
    theta = 0.3
    c, s = np.cos(theta), np.sin(theta)
    rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    assert abs(compute_re([np.eye(3)], [rz]) - theta) < 1e-9


def test_dump_xyz_chains_transforms():
    T = np.eye(4)
    T[:3, 3] = [1.0, 0.0, 0.0]
    xyzs = np.array(dump_xyz([T, T, T]))
    np.testing.assert_allclose(xyzs[:, 0], [0, 1, 2, 3])
    rs = dump_r([T, T])
    np.testing.assert_allclose(rs[-1], np.eye(3))


def test_eigen_crop_and_median_scaling_pipeline(rng_np):
    """End-to-end evaluate() on fabricated predictions + GT."""
    from unsupervised_pose_estimation_tpu.config import Options
    from unsupervised_pose_estimation_tpu.eval.evaluate_depth import evaluate

    n, h, w = 4, 24, 32
    gt = rng_np.uniform(1.0, 20.0, size=(n, h, w)).astype(np.float32)
    disps = 1.0 / gt  # perfect inverse-depth predictions up to scale
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        pred_path = os.path.join(td, "disps.npy")
        np.save(pred_path, disps)
        opt = Options(eval_mono=True, ext_disp_to_eval=pred_path,
                      eval_split="endovis")
        row = evaluate(opt, gt_depths=gt)
    assert row["abs_rel"] < 1e-5
    assert row["a1"] == 1.0
