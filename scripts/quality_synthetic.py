"""Quantitative quality row on the synthetic-parallax benchmark.

This container has no network and no vendored ImageNet weights, so the
reference's `weights_init=pretrained` KITTI protocol cannot be reproduced
offline (documented in BASELINE.md). This script provides the substitute
quality evidence VERDICT r3 asks for: end-to-end scratch training on scenes
with EXACT per-pixel GT depth, scored with the reference's own eval
protocol (`/root/reference/evaluate_depth.py:181-224`: resize to GT, mask
gt>0, median scaling, clamp [1e-3, 80], 7-metric row).

A constant-disparity predictor (what a collapsed/radial model degenerates
to, and what the single-plane SyntheticDataset cannot distinguish) is
scored alongside as the null baseline — the trained row must beat it by
learning the layered structure.

The pose head is scored too: rendered odometry sequences (linear camera
path with EXACT local poses) through the reference's ATE/RE protocol
(`/root/reference/evaluate_pose.py:183-227` — chain local transforms,
offset + lstsq-scale alignment, 5-frame tracks), against a zero-motion
null.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_synthetic.py \
      [--steps 1500] [--height 192 --width 640] [--out docs/quality]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--height", type=int, default=192)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--batch_size", type=int, default=12)
    ap.add_argument("--num_eval", type=int, default=32)
    ap.add_argument("--pool_steps", type=int, default=100,
                    help="scene-pool size in batches; the pool is rendered "
                         "once and revisited over epochs")
    ap.add_argument("--learning_rate", type=float, default=1e-4)
    ap.add_argument("--compute_dtype", default=None,
                    help="default: bfloat16 on TPU, float32 on CPU")
    ap.add_argument("--out", default="docs/quality")
    ap.add_argument("--tag", default="synthetic_parallax",
                    help="basename for the output json/preview (lets a "
                         "short pose-focused run coexist with the main row)")
    ap.add_argument("--log_dir", default="runs")
    ap.add_argument("--model_name", default="synthetic_parallax")
    ap.add_argument("--load_only", action="store_true",
                    help="skip training; evaluate the existing checkpoint")
    ap.add_argument("--resume", action="store_true",
                    help="resume training from the existing checkpoint")
    ap.add_argument("--with_rotation", action="store_true",
                    help="camera path also yaws (train AND odometry eval): "
                         "nonzero GT rotations so RE measures something")
    args = ap.parse_args()

    import jax

    from unsupervised_pose_estimation_tpu.config import Options
    from unsupervised_pose_estimation_tpu.data.datasets import \
        SyntheticParallaxDataset
    from unsupervised_pose_estimation_tpu.eval.metrics import (
        compute_depth_errors, resize_bilinear_np)
    from unsupervised_pose_estimation_tpu.ops.geometry import disp_to_depth
    from unsupervised_pose_estimation_tpu.train.step import build_infer_step

    dtype = args.compute_dtype or (
        "float32" if jax.default_backend() == "cpu" else "bfloat16")
    # A pool of steps_per_epoch*batch scenes is rendered once (the dataset
    # memoizes items in RAM) and revisited over epochs — the 1-core host
    # renders ~4 items/s at 192x640, so re-rendering every step would leave
    # the device >90% idle.
    steps_per_epoch = min(args.steps, args.pool_steps)
    num_epochs = max(1, -(-args.steps // steps_per_epoch))
    cfg = Options(dataset="synthetic_parallax", model_name=args.model_name,
                  height=args.height, width=args.width,
                  batch_size=args.batch_size, compute_dtype=dtype,
                  weights_init="scratch", learning_rate=args.learning_rate,
                  num_epochs=num_epochs, steps_per_epoch=steps_per_epoch,
                  log_dir=args.log_dir, log_frequency=50,
                  synthetic_rotation=args.with_rotation,
                  num_workers=0).validate()
    # num_workers=0 is load-bearing on this 1-core container: the pool is
    # memoized in RAM by the Dataset, and worker PROCESSES each hold (and
    # keep re-rendering) their own un-shared copy — the r5 10k-step run
    # crawled at ~5 items/s (one epoch of pool re-render per epoch) until
    # loading moved in-process. Real multi-core hosts can restore workers.

    from unsupervised_pose_estimation_tpu.train.loop import Trainer

    if args.load_only or args.resume:
        ckpt = os.path.join(args.log_dir, args.model_name, "models", "orbax")
        cfg = Options(**{**cfg.__dict__, "load_weights_folder": ckpt})
    trainer = Trainer(cfg)
    if not args.load_only:
        t0 = time.time()
        trainer.train()
        print(f"training: {args.steps} steps in {time.time() - t0:.0f}s")
    state = trainer.state

    # -- eval: held-out scenes (seed disjoint from train seed 0 / val 1) --
    val = SyntheticParallaxDataset(args.num_eval, args.height, args.width,
                                   [0], is_train=False, seed=7,
                                   load_depth=True,
                                   with_rotation=args.with_rotation)
    infer = build_infer_step(trainer.bundle)
    errors, const_errors, ratios = [], [], []
    previews = []
    for i in range(args.num_eval):
        item = val.get_item(i)
        img = item["color"][0].astype(np.float32)[None] / 255.0
        disp = np.asarray(
            infer(state.params, state.batch_stats, img)[0][..., 0])[0]
        scaled_disp, _ = disp_to_depth(disp, cfg.min_depth, cfg.max_depth)
        scaled_disp = np.asarray(scaled_disp)
        gt = item["depth_gt"]

        def score(pred_disp):
            pd = resize_bilinear_np(pred_disp, *gt.shape)
            pred_depth = 1.0 / np.maximum(pd, 1e-12)
            mask = gt > 0
            pred, g = pred_depth[mask], gt[mask]
            ratio = np.median(g) / np.median(pred)
            pred = np.clip(pred * ratio, 1e-3, 80.0)
            return compute_depth_errors(g, pred), ratio

        err, ratio = score(scaled_disp)
        errors.append(err)
        ratios.append(ratio)
        const_errors.append(
            score(np.full_like(scaled_disp, scaled_disp.mean()))[0])
        if i < 4:
            previews.append((item["color"][0], scaled_disp, gt))

    # -- pose eval: odometry-style ATE/RE on rendered sequences ----------
    # The camera path is linear in x with EXACT local pose gt_pose(idx, 1)
    # per consecutive pair; score with the reference's protocol
    # (`/root/reference/evaluate_pose.py:183-227`: pose net on
    # cat(frame_{i+1}, frame_i) pairs, chain locals, ATE with offset+lstsq
    # scale alignment and RE over 5-frame tracks). A zero-motion (identity
    # pose) predictor is the null baseline.
    pose_row = None
    if trainer.bundle.pose_encoder is not None:
        import jax.numpy as jnp

        from unsupervised_pose_estimation_tpu.eval.metrics import (
            compute_ate, compute_re, dump_r, dump_xyz)
        from unsupervised_pose_estimation_tpu.ops.geometry import \
            transformation_from_parameters

        @jax.jit
        def pose_fwd(params, batch_stats, pairs):
            feats = trainer.bundle.pose_encoder.apply(
                {"params": params["pose_encoder"],
                 "batch_stats": batch_stats["pose_encoder"]}, pairs, False)
            aa, tt = trainer.bundle.pose.apply(
                {"params": params["pose"]}, [feats])
            return transformation_from_parameters(aa[:, 0, 0], tt[:, 0, 0])

        # odometry sequences: rotated path when --with_rotation (exact
        # yawing-pinhole render, nonzero GT rotations so RE measures
        # something — VERDICT r4 #6); the translation-only path otherwise
        pose_ds = SyntheticParallaxDataset(
            args.num_eval, args.height, args.width, [0], is_train=False,
            seed=7, with_rotation=args.with_rotation)
        n_seq, n_frames = 4, 12
        ates, res_, null_ates, null_res = [], [], [], []
        for sidx in range(n_seq):
            frames = pose_ds.render_sequence(sidx, n_frames).astype(
                np.float32) / 255.0
            # NB pairs are (frame_{i+1}, frame_i) — the REFERENCE eval's
            # ordering (`/root/reference/evaluate_pose.py:191`:
            # cat(color[1], color[0])), the reverse of training-time
            # ordering for positive offsets, so pose_fwd predicts the
            # INVERSE local (reference-inherited quirk, ADVICE r3). Score
            # against the gt by inverting the prediction EXPLICITLY — with
            # nonzero gt rotations RE is otherwise biased by ~2x the yaw.
            pairs = np.concatenate([frames[1:], frames[:-1]], axis=-1)
            pred_inv = np.asarray(pose_fwd(
                state.params, state.batch_stats, jnp.asarray(pairs)))
            pred_local = np.linalg.inv(pred_inv)
            gt_local = pose_ds.gt_local_sequence(sidx, n_frames)
            zero_local = np.tile(np.eye(4, dtype=np.float32)[None],
                                 (n_frames - 1, 1, 1))
            # rotation-free null: gt translations with identity rotations —
            # the bar any real rotation estimate must beat on RE
            norot_local = gt_local.copy()
            norot_local[:, :3, :3] = np.eye(3, dtype=np.float32)
            for i in range(n_frames - 1 - 4):
                gt_xyz = np.array(dump_xyz(gt_local[i:i + 4]))
                gt_r = np.array(dump_r(gt_local[i:i + 4]))
                ates.append(compute_ate(
                    gt_xyz, np.array(dump_xyz(pred_local[i:i + 4]))))
                res_.append(compute_re(
                    gt_r, np.array(dump_r(pred_local[i:i + 4]))))
                null_ates.append(compute_ate(
                    gt_xyz, np.array(dump_xyz(zero_local[i:i + 4]))))
                null_res.append(compute_re(
                    gt_r, np.array(dump_r(norot_local[i:i + 4]))))
        pose_row = {
            "ate_mean": round(float(np.mean(ates)), 5),
            "ate_std": round(float(np.std(ates)), 5),
            "re_mean": round(float(np.mean(res_)), 5),
            "re_std": round(float(np.std(res_)), 5),
            "zero_motion_null_ate": round(float(np.mean(null_ates)), 5),
            "zero_rotation_null_re": round(float(np.mean(null_res)), 5),
            "gt_rotations_nonzero": bool(args.with_rotation),
            "num_tracks": len(ates),
            # windows within one sequence share the same camera path, so
            # tracks are independent across the n_seq sequences only and
            # ate_std/re_std understate scene-level variance (ADVICE r3)
            "num_independent_sequences": n_seq,
            "note": "predictions are inverted before scoring (reference "
                    "pair-ordering quirk made explicit); tracks within a "
                    "sequence share gt",
        }
        print(f"\n   Trajectory error: {pose_row['ate_mean']:0.4f}, "
              f"std: {pose_row['ate_std']:0.4f} "
              f"(zero-motion null {pose_row['zero_motion_null_ate']:0.4f})")
        print(f"   Rotation error: {pose_row['re_mean']:0.4f}, "
              f"std: {pose_row['re_std']:0.4f} "
              f"(zero-rotation null {pose_row['zero_rotation_null_re']:0.4f}"
              f", gt rotations {'NONZERO' if args.with_rotation else 'zero'}"
              f")")

    names = ("abs_rel", "sq_rel", "rmse", "rmse_log", "a1", "a2", "a3")
    mean_err = np.asarray(errors).mean(0)
    mean_const = np.asarray(const_errors).mean(0)
    row = dict(zip(names, (round(float(v), 4) for v in mean_err)))
    const_row = dict(zip(names, (round(float(v), 4) for v in mean_const)))
    print("\n  " + ("{:>8} | " * 7).format(*names))
    print(("&{: 8.3f}  " * 7).format(*mean_err.tolist()) + "  (trained)")
    print(("&{: 8.3f}  " * 7).format(*mean_const.tolist()) +
          "  (constant-disparity null)")

    os.makedirs(args.out, exist_ok=True)
    record = {
        "benchmark": "synthetic_parallax",
        "protocol": "median scaling, mask gt>0, clamp [1e-3,80] "
                    "(evaluate_depth.py:181-224)",
        "config": {"height": args.height, "width": args.width,
                   "batch": args.batch_size, "steps": args.steps,
                   "dtype": dtype, "weights_init": "scratch",
                   "backend": jax.default_backend()},
        "trained": row,
        "constant_disparity_null": const_row,
        "median_scale_ratio": round(float(np.median(ratios)), 3),
        "num_eval_scenes": args.num_eval,
    }
    if pose_row is not None:
        record["pose"] = pose_row
    out_json = os.path.join(args.out, f"{args.tag}.json")
    with open(out_json, "w") as f:
        json.dump(record, f, indent=2)
    print(f"-> wrote {out_json}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(len(previews), 3,
                                 figsize=(12, 2.2 * len(previews)))
        for r, (rgb, disp, gt) in enumerate(previews):
            axes[r, 0].imshow(rgb)
            axes[r, 1].imshow(disp, cmap="magma")
            axes[r, 2].imshow(1.0 / gt, cmap="magma")
            for c, title in enumerate(("input", "pred disp", "gt inv-depth")):
                axes[r, c].set_title(title if r == 0 else "")
                axes[r, c].axis("off")
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"{args.tag}_preview.png"),
                    dpi=110)
        print(f"-> wrote {args.out}/{args.tag}_preview.png")
    except Exception as e:  # pragma: no cover
        print(f"(preview skipped: {e})")


if __name__ == "__main__":
    main()
