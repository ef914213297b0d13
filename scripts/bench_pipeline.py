"""Input-pipeline reality check: feed the real TPU train step from the
threaded disk Loader (PNG decode -> augment -> collate -> H2D) and report
achieved frames/s vs the device-resident bench.py number.

Generates a synthetic endovis-layout PNG tree under /tmp on first use.
Prints ONE JSON line {"metric": "pipeline_frames_per_sec", ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

H, W, B = 192, 640, 12


def ensure_tree(root: str, n_frames: int = 200) -> list:
    """Panning-texture PNG sequence (2 px/frame), NOT iid noise: the
    measured step TRAINS on these frames, and training on noise drives the
    pose net off the warp ladder's fast rungs within ~15 steps (r4 bench
    root cause, BASELINE.md) — the pipeline bench would then measure a
    degraded device program instead of the host feed."""
    from PIL import Image

    folder = os.path.join(root, "seq0")
    os.makedirs(folder, exist_ok=True)
    rng = np.random.default_rng(0)
    shift = 2
    wide = W + shift * n_frames
    yy, xx = np.mgrid[0:H, 0:wide].astype(np.float32)
    tex = np.zeros((H, wide, 3), np.float32)
    for _ in range(6):
        fx, fy = rng.uniform(0.01, 0.15, 2)
        phase = rng.uniform(0, 2 * np.pi, 3)
        amp = rng.uniform(0.1, 0.3, 3)
        for ch in range(3):
            tex[..., ch] += amp[ch] * np.sin(
                2 * np.pi * (fx * xx + fy * yy) + phase[ch])
    tex -= tex.min()
    tex /= max(tex.max(), 1e-6)
    tex8 = (tex * 255.0 + 0.5).astype(np.uint8)
    for i in range(n_frames):
        path = os.path.join(folder, f"{i:010d}.png")
        if not os.path.isfile(path):
            Image.fromarray(tex8[:, i * shift:i * shift + W]).save(path)
    return [f"seq0 {i} l" for i in range(1, n_frames - 1)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--num_workers", type=int, default=8)
    ap.add_argument("--num_worker_procs", type=int, default=0,
                    help="spawn-based decode processes (0 = thread pool); "
                         "the thread-vs-process scaling row of VERDICT r3 "
                         "#7 — on this 1-core host processes cannot win, "
                         "which the row should show honestly")
    ap.add_argument("--root", default="/tmp/pipeline_bench_pan")
    ap.add_argument("--cache", action="store_true",
                    help="serve frames from the pre-decoded uint8 cache "
                         "(data/cache.py) instead of decoding PNGs")
    ap.add_argument("--host_only", action="store_true",
                    help="skip the TPU step; measure item assembly alone")
    ap.add_argument("--device_augment", action="store_true",
                    help="ship 6 jitter factors instead of running the "
                         "host PIL pipeline (ops/augment_device.py); the "
                         "step synthesizes color_aug on device")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from unsupervised_pose_estimation_tpu.config import Options
    from unsupervised_pose_estimation_tpu.data.datasets import LungRAWDataset
    from unsupervised_pose_estimation_tpu.data.pipeline import Loader
    from unsupervised_pose_estimation_tpu.train.bundle import ModelBundle
    from unsupervised_pose_estimation_tpu.train.state import \
        create_train_state
    from unsupervised_pose_estimation_tpu.train.step import build_train_step

    files = ensure_tree(args.root)
    cfg = Options(height=H, width=W, batch_size=B, compute_dtype="bfloat16",
                  weights_init="scratch").validate()
    ds = LungRAWDataset(args.root, files, height=H, width=W,
                        frame_idxs=[0, -1, 1], is_train=True,
                        device_augment=args.device_augment)
    if args.cache:
        from unsupervised_pose_estimation_tpu.data.cache import \
            attach_frame_cache
        attach_frame_cache(ds, os.path.join(args.root, "cache_640x192"),
                           build_if_missing=True)
    loader = Loader(ds, B, shuffle=True, num_workers=args.num_workers,
                    num_worker_procs=args.num_worker_procs,
                    prefetch=2, infinite=True)

    if args.host_only:
        it = iter(loader.epoch(0))
        next(it)  # warm the pool
        t0 = time.perf_counter()
        n = 0
        for _ in range(args.steps):
            next(it)
            n += B
        dt = time.perf_counter() - t0
        print(json.dumps({
            "metric": "host_items_per_sec", "value": round(n / dt, 2),
            "unit": "items/s", "cache": args.cache,
            "ms_per_item": round(1000 * dt / n, 2),
            "num_workers": args.num_workers,
            "num_worker_procs": args.num_worker_procs,
            "device_augment": args.device_augment,
            "host_cores": os.cpu_count(),
        }))
        return

    bundle = ModelBundle.create(cfg)
    state = create_train_state(bundle, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    step = build_train_step(bundle)
    key = jax.random.PRNGKey(1)

    it = iter(loader)
    # warmup: compile, fill the prefetch queue, AND train to the converged
    # flow regime (early steps ride the wide-band warp rungs while pose is
    # random; the pipeline row measures the steady state, like bench.py)
    for _ in range(20):
        state, losses = step(state, next(it), key)
    float(losses["loss"])  # value-fetch sync (axon block_until_ready lies)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, losses = step(state, next(it), key)
    loss = float(losses["loss"])
    dt = time.perf_counter() - t0
    assert loss == loss

    fps = args.steps * B / dt
    print(json.dumps({
        "metric": "pipeline_frames_per_sec",
        "value": round(fps, 2),
        "unit": "frames/s",
        "ms_per_step": round(1000 * dt / args.steps, 1),
        "num_workers": args.num_workers,
        "num_worker_procs": args.num_worker_procs,
        "cache": args.cache,
        "device_augment": args.device_augment,
        "host_cores": os.cpu_count(),
    }))


if __name__ == "__main__":
    main()
