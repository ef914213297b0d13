"""Diagnose the bench.py throughput gap: jit vs AOT-compiled executable,
donated vs non-donated state, with/without the persistent compilation cache.

bench.py r3 rewrote the timed loop (worker subprocess + AOT
``.lower().compile()`` + ``jax_compilation_cache_dir`` + donate=True) and
started reporting ~33 f/s where the interleaved ablation harness
(plain ``jax.jit(step, donate=False)``) measures ~77 ms/step (~156 f/s) in
the same minutes. This script times the SAME train step through each
invocation path, interleaved, to find which harness detail eats the 4.7x.

Set BENCH_CACHE=1 to also enable the persistent compilation cache first.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, B = 192, 640, 12
N = 15


def main():
    if os.environ.get("BENCH_CACHE"):
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from unsupervised_pose_estimation_tpu.config import Options
    from unsupervised_pose_estimation_tpu.train.bundle import ModelBundle
    from unsupervised_pose_estimation_tpu.train.state import \
        create_train_state
    from unsupervised_pose_estimation_tpu.train.step import build_train_step

    cfg = Options(height=H, width=W, batch_size=B, num_layers=18,
                  compute_dtype="bfloat16", weights_init="scratch").validate()
    bundle = ModelBundle.create(cfg)
    state = create_train_state(bundle, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    rng = np.random.default_rng(0)
    f = cfg.num_input_frames
    batch = jax.device_put({
        "color": (rng.uniform(size=(B, f, H, W, 3)) * 255).astype(np.uint8),
        "color_aug": (rng.uniform(size=(B, f, H, W, 3)) * 255
                      ).astype(np.uint8),
        "K_norm": np.tile(np.asarray(
            [[0.635, 0, 0.48, 0], [0, 0.634, 0.5, 0],
             [0, 0, 1, 0], [0, 0, 0, 1]], np.float32), (B, 1, 1)),
    })
    key = jax.random.PRNGKey(1)

    jit_nodonate = build_train_step(bundle, donate=False)
    jit_donate = build_train_step(bundle, donate=True)
    t0 = time.perf_counter()
    aot_donate = build_train_step(bundle, donate=True).lower(
        state, batch, key).compile()
    print(f"aot compile {time.perf_counter() - t0:.0f}s", flush=True)

    def run_nodonate(n):
        st, losses = state, None
        for _ in range(n):
            st, losses = jit_nodonate(st, batch, key)
        return float(losses["loss"])

    def run(step_fn, n):
        # donated state: keep threading the NEW state (old buffers invalid)
        st, losses = jax.tree_util.tree_map(jnp.copy, state), None
        for _ in range(n):
            st, losses = step_fn(st, batch, key)
        return float(losses["loss"])

    cases = [
        ("jit donate=False", lambda: run_nodonate(N)),
        ("jit donate=True", lambda: run(jit_donate, N)),
        ("aot donate=True", lambda: run(aot_donate, N)),
    ]
    for name, fn in cases:  # warm: compile + 1 window
        t0 = time.perf_counter()
        fn()
        print(f"warm {name}: {(time.perf_counter() - t0) / N * 1e3:.1f} "
              "ms/step", flush=True)

    best = {name: float("inf") for name, _ in cases}
    for rnd in range(4):
        for name, fn in cases:
            t0 = time.perf_counter()
            fn()
            dt = (time.perf_counter() - t0) / N * 1e3
            best[name] = min(best[name], dt)
            print(f"  round {rnd} {name}: {dt:.1f} ms/step", flush=True)
    for name, _ in cases:
        print(f"{name:20s} {best[name]:8.1f} ms/step")


if __name__ == "__main__":
    main()
