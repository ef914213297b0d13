"""Capture an XProf trace of the fused train step and print a top-op table.

Runs a few steps under ``jax.profiler.trace`` on the live backend, then
parses the dumped ``*.xplane.pb`` with TensorFlow's xplane proto (no
TensorBoard UI on this box) and aggregates per-op self-time on the device
planes. This is the data source for the step-budget ledger in ROADMAP.md —
the marginal-cost ablation (scripts/bench_ablate.py) gives component deltas,
this gives the op-level breakdown inside one compiled program.
"""

import collections
import glob
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, B = 192, 640, 12
TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/xprof_step")

# Persistent compilation cache (same resolution order as bench.py:
# BENCH_CACHE_DIR wins, else the repo-local .jax_cache): cold full-step
# compiles on the remote-compile axon backend run 10+ minutes; warm ~2 min.
# Skipped when the embedding process (e.g. bench.py's worker, which
# exec_module-loads this file) already configured a cache dir.
try:
    if not jax.config.jax_compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir", os.environ.get(
            "BENCH_CACHE_DIR",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache")))
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def build():
    from unsupervised_pose_estimation_tpu.config import Options
    from unsupervised_pose_estimation_tpu.train.bundle import ModelBundle
    from unsupervised_pose_estimation_tpu.train.state import \
        create_train_state
    from unsupervised_pose_estimation_tpu.train.step import build_train_step

    # TRACE_CFG: JSON dict of Options overrides, e.g.
    # TRACE_CFG='{"use_pallas_loss": true}' — device-time A/B of step
    # variants is immune to the pool's coarse time-slicing, unlike
    # wall-clock interleaving (scripts/bench_ablate.py).
    import json as _json
    overrides = _json.loads(os.environ.get("TRACE_CFG", "{}"))
    cfg = Options(height=H, width=W, batch_size=B, compute_dtype="bfloat16",
                  weights_init="scratch", **overrides).validate()
    bundle = ModelBundle.create(cfg)
    state = create_train_state(bundle, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    step = build_train_step(bundle, donate=False)
    # Structured parallax frames, NOT iid noise: a couple of self-training
    # Adam steps on noise push the pose net off the warp ladder's fast
    # rungs (y-span gates sit at 15/16 and 39/40 at scratch init with zero
    # headroom) and the trace then measures the degraded program — the r4
    # bench root-cause (BASELINE.md). bench.py made the same switch.
    from unsupervised_pose_estimation_tpu.data.datasets import \
        SyntheticParallaxDataset

    ds = SyntheticParallaxDataset(B, H, W, [0, -1, 1])
    items = [ds.get_item(i) for i in range(B)]
    batch = jax.device_put(
        {k: np.stack([it[k] for it in items]) for k in items[0]})
    return step, state, batch


def capture(n_steps=3):
    step, state, batch = build()
    key = jax.random.PRNGKey(1)
    print("compiling...", file=sys.stderr)
    state, losses = step(state, batch, key)
    float(losses["loss"])  # value fetch: the only sync on the axon backend
    # converge-first warmup (bench.py/bench_pipeline do the same): settle
    # the pose net onto realistic flows so every warp site holds the rung
    # real training runs on
    for _ in range(15):
        state, losses = step(state, batch, key)
    float(losses["loss"])
    t0 = time.perf_counter()
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(n_steps):
            state, losses = step(state, batch, key)
        final = float(losses["loss"])
    dt = (time.perf_counter() - t0) / n_steps
    print(f"traced {n_steps} steps, {dt * 1e3:.1f} ms/step, loss={final:.4f}",
          file=sys.stderr)


def _category(nm):
    base = nm.lstrip("%").split(" ", 1)[0].split(".")[0].split("(")[0]
    for key in ("fusion", "convolution", "copy-start", "copy-done",
                "copy", "conditional", "branch", "custom-call",
                "dynamic-slice", "dynamic-update-slice", "reduce",
                "transpose", "bitcast", "all-reduce", "select",
                "scatter", "gather", "convert", "broadcast", "iota",
                "dot", "slice", "concatenate", "pad", "reshape"):
        if base.startswith(key) or key in base:
            return key
    return base


def aggregate_device_planes(trace_dir=None):
    """Parse the newest *.xplane.pb under ``trace_dir`` and return a list of
    (plane_name, total_self_ms, category Counter, per-op Counter, count
    Counter) for every TPU/device plane. Importable (bench.py reuses this to
    fold the contention-free device time into its record without a second
    step compile)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    trace_dir = trace_dir or TRACE_DIR
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        raise FileNotFoundError(f"no xplane.pb found under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as fh:
        space.ParseFromString(fh.read())

    planes = []
    for plane in space.planes:
        name = plane.name.lower()
        if "tpu" not in name and "device" not in name:
            continue
        ev_names = dict(plane.event_metadata.items())

        # self-time per event: duration minus directly-nested children on
        # the same line (events are intervals; nesting = containment)
        selfagg = collections.Counter()
        cnt = collections.Counter()
        cat = collections.Counter()
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue  # Steps/Modules duplicate totals; Async overlaps
            evs = sorted(line.events,
                         key=lambda e: (e.offset_ps, -e.duration_ps))
            child = [0] * len(evs)
            idx_stack = []
            for i, ev in enumerate(evs):
                start = ev.offset_ps
                while idx_stack and evs[idx_stack[-1]].offset_ps + \
                        evs[idx_stack[-1]].duration_ps <= start:
                    idx_stack.pop()
                if idx_stack:
                    child[idx_stack[-1]] += ev.duration_ps
                idx_stack.append(i)
            for i, ev in enumerate(evs):
                meta = ev_names.get(ev.metadata_id)
                nm = meta.name if meta else str(ev.metadata_id)
                ms = max(0, ev.duration_ps - child[i]) / 1e9
                selfagg[nm] += ms
                cnt[nm] += 1
                cat[_category(nm)] += ms
        if not selfagg:
            continue
        planes.append((plane.name, sum(selfagg.values()), cat, selfagg, cnt))
    return paths[-1], planes


def total_device_self_ms(trace_dir=None):
    """Total device self-time (ms) across the traced region, first device
    plane. Raises if no trace or no device plane exists."""
    _, planes = aggregate_device_planes(trace_dir)
    if not planes:
        raise RuntimeError("no device plane with XLA Ops found in trace")
    return planes[0][1]


def report(top=40):
    try:
        path, planes = aggregate_device_planes()
    except FileNotFoundError as e:
        print(e)
        return 1
    print(f"parsed {os.path.basename(path)}")
    for name, total, cat, selfagg, cnt in planes:
        print(f"\n== plane {name}: {total:.2f} ms total SELF time ==")
        print("-- by category --")
        for nm, ms in cat.most_common(25):
            print(f"  {ms:9.3f} ms  {nm}")
        print("-- top ops by self time --")
        for nm, ms in selfagg.most_common(top):
            print(f"  {ms:9.3f} ms  x{cnt[nm]:<5d} {nm[:110]}")
    return 0


def device_ms_per_step(n_steps=3):
    """Capture a fresh trace and return total device SELF time / step (ms).

    The pooled chip is time-shared at coarse granularity (BASELINE.md r3
    row), so wall-clock ms/step can read several-fold worse than the
    program's own device time; this is the contention-free number.
    """
    capture(n_steps)
    return total_device_self_ms() / n_steps


if __name__ == "__main__":
    if "--json" in sys.argv:
        import json

        n = 3
        print(json.dumps(
            {"device_ms_per_step": round(device_ms_per_step(n), 2),
             "n_steps": n}))
        sys.exit(0)
    if "--report-only" not in sys.argv:
        capture()
    sys.exit(report())
