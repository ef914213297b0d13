"""Batch/resolution scaling study + roofline verdict for the train step.

VERDICT r4 weak #3: 12.3% device MFU at per-device batch 12 was never
tested for slack — no batch-scaling curve, no statement whether the program
is MXU- or HBM-bound. This script measures the fused train step at a list
of (H, W, B) configs and prints, per config:

  - wall ms/step and frames/s (value-fetch synced; best + median window)
  - step TFLOP and XLA's HBM bytes-accessed estimate (cost_analysis)
  - arithmetic intensity (FLOP/byte) vs the chip ridge point
    (peak_flops / hbm_bw) -> MXU-bound or bandwidth-bound verdict
  - wall MFU, and optional XProf device self-time / device MFU (--trace)

Usage (real chip):
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_scaling.py \
      --configs 192x640x12,192x640x24,192x640x48 --trace
Writes one JSON line per config (stdout) and a summary table (stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# peak dense bf16 FLOP/s and HBM GB/s per chip, by device_kind substring
PEAK = {
    "v4": (275e12, 1228e9),
    "v5 lite": (197e12, 819e9), "v5e": (197e12, 819e9),
    "v5p": (459e12, 2765e9),
    "v6 lite": (918e12, 1640e9), "v6e": (918e12, 1640e9),
}


def _peak(kind: str):
    kind = kind.lower()
    for key, val in sorted(PEAK.items(), key=lambda kv: -len(kv[0])):
        if key in kind:
            return val
    return None, None


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def measure(h, w, b, steps, windows, do_trace, converge):
    import jax

    from unsupervised_pose_estimation_tpu.config import Options
    from unsupervised_pose_estimation_tpu.data.datasets import \
        SyntheticParallaxDataset
    from unsupervised_pose_estimation_tpu.train.bundle import ModelBundle
    from unsupervised_pose_estimation_tpu.train.state import \
        create_train_state
    from unsupervised_pose_estimation_tpu.train.step import build_train_step

    cfg = Options(height=h, width=w, batch_size=b, num_layers=18,
                  compute_dtype="bfloat16", weights_init="scratch"
                  ).validate()
    bundle = ModelBundle.create(cfg)
    state = create_train_state(bundle, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    ds = SyntheticParallaxDataset(b, h, w, [0, -1, 1])
    items = [ds.get_item(i) for i in range(b)]
    batch = jax.device_put(
        {k: np.stack([it[k] for it in items]) for k in items[0]})
    key = jax.random.PRNGKey(1)

    _log(f"[{h}x{w} b{b}] compiling...")
    t0 = time.perf_counter()
    compiled = build_train_step(bundle).lower(state, batch, key).compile()
    _log(f"[{h}x{w} b{b}] compiled in {time.perf_counter() - t0:.0f}s")

    rec = {"height": h, "width": w, "batch": b}
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        rec["step_tflops"] = round(float(cost.get("flops", 0.0)) / 1e12, 3)
        rec["hbm_gbytes"] = round(
            float(cost.get("bytes accessed", 0.0)) / 1e9, 3)
    except Exception as e:
        _log(f"cost_analysis failed: {e}")

    # converge-first warmup: a few self-training steps settle the pose net
    # onto realistic flows so every warp site holds its fast rung (the iid-
    # noise bench regression of r4, BASELINE.md)
    for _ in range(converge):
        state, losses = compiled(state, batch, key)
    float(losses["loss"])

    dts = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(steps):
            state, losses = compiled(state, batch, key)
        final = float(losses["loss"])  # value fetch = the only axon sync
        dts.append(time.perf_counter() - t0)
        assert final == final, "NaN loss"
    ms = sorted(1000.0 * dt / steps for dt in dts)
    rec["wall_ms_per_step"] = round(ms[0], 1)
    rec["wall_ms_median"] = round(ms[len(ms) // 2], 1)
    rec["frames_per_sec"] = round(1000.0 * b / ms[0], 1)

    import jax as _jax

    kind = _jax.devices()[0].device_kind
    rec["device_kind"] = kind
    peak_flops, hbm_bw = _peak(kind)
    if peak_flops and rec.get("step_tflops"):
        flops = rec["step_tflops"] * 1e12
        rec["mfu_wall"] = round(flops / (ms[0] * 1e-3) / peak_flops, 4)
        if rec.get("hbm_gbytes"):
            bytes_ = rec["hbm_gbytes"] * 1e9
            ai = flops / max(bytes_, 1.0)
            ridge = peak_flops / hbm_bw
            rec["arith_intensity"] = round(ai, 1)
            rec["ridge_flop_per_byte"] = round(ridge, 1)
            rec["bound"] = "MXU" if ai >= ridge else "HBM"
            # time lower bounds under each roof
            rec["t_mxu_ms"] = round(flops / peak_flops * 1e3, 2)
            rec["t_hbm_ms"] = round(bytes_ / hbm_bw * 1e3, 2)

    if do_trace:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "trace_step", os.path.join(REPO, "scripts", "trace_step.py"))
        ts = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ts)
        tdir = f"/tmp/bench_scaling_{h}x{w}x{b}_{os.getpid()}"
        n = 3
        with _jax.profiler.trace(tdir):
            for _ in range(n):
                state, losses = compiled(state, batch, key)
            float(losses["loss"])
        dev_ms = ts.total_device_self_ms(tdir) / n
        rec["device_ms_per_step"] = round(dev_ms, 1)
        if peak_flops and rec.get("step_tflops"):
            rec["mfu_device"] = round(
                rec["step_tflops"] * 1e12 / (dev_ms * 1e-3) / peak_flops, 4)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="192x640x12,192x640x24,192x640x48")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--converge", type=int, default=15)
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", os.environ.get(
            "BENCH_CACHE_DIR", os.path.join(REPO, ".jax_cache")))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    rows = []
    for spec in args.configs.split(","):
        h, w, b = (int(v) for v in spec.strip().split("x"))
        rec = measure(h, w, b, args.steps, args.windows, args.trace,
                      args.converge)
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    _log(f"\n{'config':>16} {'wall ms':>8} {'f/s':>7} {'MFU':>6} "
         f"{'dev ms':>7} {'devMFU':>7} {'AI f/B':>7} {'bound':>5}")
    for r in rows:
        _log(f"{r['height']}x{r['width']}x{r['batch']:>4} "
             f"{r.get('wall_ms_per_step', 0):>8} "
             f"{r.get('frames_per_sec', 0):>7} "
             f"{r.get('mfu_wall', 0):>6} "
             f"{r.get('device_ms_per_step', '-'):>7} "
             f"{r.get('mfu_device', '-'):>7} "
             f"{r.get('arith_intensity', '-'):>7} "
             f"{r.get('bound', '-'):>5}")


if __name__ == "__main__":
    main()
