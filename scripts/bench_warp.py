"""Warp-kernel micro-benchmark on the real TPU: XLA patch-gather vs the
banded Pallas kernel v1 (block bands + masked y-reduce) vs v2 (per-row
mini-bands + transposed y-select).

All timings are value-fetch synced (the axon backend's block_until_ready
returns early; see CLAUDE.md).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, B, C = 192, 640, 12, 3
N = 20


def timeit(fn, *args, n=N, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    return (time.perf_counter() - t0) / n


def main():
    from unsupervised_pose_estimation_tpu.ops.pallas.warp_kernel import \
        grid_sample_fast
    from unsupervised_pose_estimation_tpu.ops.warp import grid_sample

    rng = np.random.default_rng(0)
    img8 = jnp.asarray(rng.integers(0, 255, size=(B, H, W, C)), jnp.uint8)
    xs, ys = np.meshgrid(np.linspace(-1, 1, W), np.linspace(-1, 1, H),
                         indexing="xy")
    base = np.stack([xs, ys], -1)[None].repeat(B, 0).astype(np.float32)
    # realistic depth+pose displacement: a few px shift + slight rotation
    grid = jnp.asarray(base + rng.uniform(-0.02, 0.02, size=base.shape
                                          ).astype(np.float32))

    xla = jax.jit(lambda s, g: jnp.moveaxis(grid_sample(s, g) / 255.0, -1, 1))
    r_xla = xla(img8, grid)
    t = timeit(xla, img8, grid)
    print(f"xla patch-gather   {t*1e3:7.2f} ms/warp")

    ladder = jax.jit(lambda s, g: grid_sample_fast(s, g, planar_out=True))
    r = ladder(img8, grid)
    err = float(jnp.max(jnp.abs(r - r_xla)))
    t = timeit(ladder, img8, grid)
    print(f"ladder (default)   {t*1e3:7.2f} ms/warp  (max err {err:.2e})")
    assert err < 1e-5

    import unsupervised_pose_estimation_tpu.ops.pallas.warp_kernel as wk
    for version in (4, 6, 7):
        for band in ((40,) if version == 7 else (40, 24)):
            wk.BAND_H = band
            fn = jax.jit(lambda s, g, v=version: grid_sample_fast(
                s, g, planar_out=True, version=v))
            r = fn(img8, grid)
            err = float(jnp.max(jnp.abs(r - r_xla)))
            t = timeit(fn, img8, grid)
            print(f"pallas v{version} band={band:2d} {t*1e3:7.2f} ms/warp  "
                  f"(max err {err:.2e})")
            assert err < 1e-5
    wk.BAND_H = 40


if __name__ == "__main__":
    main()
