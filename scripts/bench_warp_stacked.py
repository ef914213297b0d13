"""Is ONE stacked warp dispatch cheaper than 8 separate ones?

The train step warps 2 source frames x 4 scales = 8 grid_sample_fast
calls per step (train/step.py:354), each paying its own dispatch ladder
(lax.cond branch), kernel launch and prologue. XProf shows the 8 warp
branches at ~28 ms/step total while one standalone warp is ~2.9 ms
(scripts/trace_step.py, BASELINE.md r3 row). This bench stacks the 8
coordinate sets over the batch axis (source planes tiled 4x) and runs ONE
kernel call on (8B, H, W) vs 8 calls on (B, H, W), value-fetch-synced,
interleaved windows (pool contention).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, B = 192, 640, 12
N_SITES = 8


def main():
    from unsupervised_pose_estimation_tpu.ops.pallas.warp_kernel import \
        grid_sample_fast

    rng = np.random.default_rng(0)
    src = (rng.uniform(size=(2, B, H, W, 3)) * 255).astype(np.uint8)
    # smooth small-motion grids (the regime the fast rung serves): identity
    # + per-site smooth flow, |flow_y| ~ 5 px, |flow_x| ~ 40 px as measured
    # on the real step at init (scripts/diag_warp_dispatch.py)
    gy, gx = np.meshgrid(np.linspace(-1, 1, H), np.linspace(-1, 1, W),
                         indexing="ij")
    grids = []
    for s in range(N_SITES):
        fx = 0.08 * np.sin(2 * np.pi * (gy + s / N_SITES))
        fy = 0.04 * np.cos(2 * np.pi * (gx - s / N_SITES))
        g = np.stack([gx + fx, gy + fy], -1)[None]
        grids.append(np.tile(g, (B, 1, 1, 1)).astype(np.float32))
    grids = jnp.asarray(np.stack(grids))          # (8, B, H, W, 2)
    srcs = jnp.asarray(src)                        # (2, B, H, W, 3)

    @jax.jit
    def separate(srcs, grids):
        tot = 0.0
        for s in range(N_SITES):
            out = grid_sample_fast(srcs[s // 4], grids[s], planar_out=True)
            tot = tot + jnp.sum(out[:, :, ::64, ::64])
        return tot

    @jax.jit
    def stacked4(srcs, grids):
        # per-frame stacking: one call per source frame over its 4 scales.
        # (Full 8x stacking OOMs: the exact-XLA fallback branch of the
        # dispatch ladder allocates its patch buffers at the stacked batch
        # size, and every lax.cond branch is compiled into the program, so
        # peak HBM scales with the stack factor.)
        tot = 0.0
        for i in range(2):
            big_grid = grids[4 * i:4 * i + 4].reshape(4 * B, H, W, 2)
            out = grid_sample_fast(jnp.tile(srcs[i], (4, 1, 1, 1)),
                                   big_grid, planar_out=True)
            tot = tot + jnp.sum(out[:, :, ::64, ::64])
        return tot

    def timeit(fn, n=10, best_of=3):
        for _ in range(2):
            out = fn(srcs, grids)
        float(out)
        best = float("inf")
        for _ in range(best_of):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(srcs, grids)
            float(out)
            best = min(best, (time.perf_counter() - t0) / n)
        return best

    # interleave to be contention-fair
    ts, tt = [], []
    for _ in range(3):
        ts.append(timeit(separate, n=5, best_of=1))
        tt.append(timeit(stacked4, n=5, best_of=1))
    sep, stk = min(ts), min(tt)
    print(f"8 separate warps  : {sep*1e3:7.2f} ms  "
          f"({sep/N_SITES*1e3:5.2f} ms/warp)")
    print(f"2x stacked (4B)   : {stk*1e3:7.2f} ms  "
          f"({stk/N_SITES*1e3:5.2f} ms/warp-equivalent)")
    print(f"delta            : {(sep-stk)*1e3:+7.2f} ms "
          f"({(sep-stk)/sep*100:+.1f}%)")


if __name__ == "__main__":
    main()
