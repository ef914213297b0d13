"""A/B the fused v8 warp kernel's miniband height (mb=8 vs mb=16) and the
full dispatch ladder, on realistic smooth-motion coords.

The mb=8 rung exists because the masked y-reduction — the kernel's
dominant VPU cost — runs on (C*mb, LANE) tiles; halving mb halves it
whenever every (row, 128-chunk)'s y-span (incl. the +1 tap) fits 8 rows
after 8-alignment. Interleaved rounds + value-fetch sync (pooled chip;
axon block_until_ready returns early, CLAUDE.md).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, B, C = 192, 640, 12, 3


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))


def main():
    import unsupervised_pose_estimation_tpu.ops.pallas.warp_kernel as wk

    rng = np.random.default_rng(0)
    img8 = jnp.asarray(rng.integers(0, 255, size=(B, H, W, C)), jnp.uint8)
    xs, ys = np.meshgrid(np.linspace(-1, 1, W), np.linspace(-1, 1, H),
                         indexing="xy")
    base = np.stack([xs, ys], -1)[None].repeat(B, 0).astype(np.float32)
    # smooth few-px inter-frame motion (the common training regime)
    grid = jnp.asarray(base + rng.uniform(-0.01, 0.01, size=base.shape
                                          ).astype(np.float32))

    # precompute kernel inputs exactly as the dispatch does
    x = (grid[..., 0] + 1) * (W - 1) / 2
    y = (grid[..., 1] + 1) * (H - 1) / 2
    x0 = jnp.minimum(jnp.floor(x), W - 2)
    y0 = jnp.minimum(jnp.floor(y), H - 2)
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    wx, wy = x - x0, y - y0
    raw = jnp.moveaxis(img8.astype(jnp.float32), -1, 1).reshape(B, C * H, W)
    yb = y0i.reshape(B, H, W // wk.LANE, wk.LANE)
    mn = jnp.min(yb, axis=3)

    cases = []
    for mb in (8, 16):
        m = jnp.clip((mn // 8) * 8, 0, H - mb)
        yl = jnp.clip(y0i - jnp.repeat(m, wk.LANE, axis=2), 0, mb - 2)
        fn = jax.jit(lambda r, x0_, yl_, m_, wx_, wy_, mb=mb:
                     wk._warp_lerp_fused_v8(r, x0_, yl_, m_, wx_, wy_,
                                            mb=mb))
        cases.append((f"v8 kernel mb={mb}", fn, (raw, x0i, yl, m, wx, wy)))

    ladder = jax.jit(lambda s, g: wk.grid_sample_fast(s, g, planar_out=True))
    cases.append(("full ladder (v8)", ladder, (img8, grid)))

    # numerical check mb=8 == mb=16 == ladder warped plane
    outs = [np.asarray(fn(*args)[0] if isinstance(fn(*args), tuple)
                       else fn(*args)) for _, fn, args in cases]
    w8, w16, lad = outs[0][0], outs[1][0], outs[2]
    np.testing.assert_allclose(w8, w16, atol=1e-6)

    for name, fn, args in cases:
        _sync(fn(*args))
    n, rounds = 30, 4
    best = {name: float("inf") for name, _, _ in cases}
    for _ in range(rounds):
        for name, fn, args in cases:
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*args)
            _sync(out)
            best[name] = min(best[name],
                             (time.perf_counter() - t0) / n * 1e3)
    for name, _, _ in cases:
        print(f"{name:24s} {best[name]:8.3f} ms/warp")


if __name__ == "__main__":
    main()
