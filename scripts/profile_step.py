"""Component-level timing on the real TPU: where does the train step go?

Times the full fused step plus isolated pieces (encoder, decoder, pose,
warp, SSIM) and compares gather layouts for the bilinear warp. Guides the
Pallas fusion work (SURVEY.md §7 step 7).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, B = 192, 640, 12


def _sync(out):
    # value fetch: the only reliable sync on the axon backend
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf if leaf.dtype != jnp.uint8 else leaf.astype(jnp.int32)))


def timeit(fn, *args, n=10, warmup=2, best_of=3):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(best_of):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    from unsupervised_pose_estimation_tpu.config import Options
    from unsupervised_pose_estimation_tpu.ops import geometry as G
    from unsupervised_pose_estimation_tpu.ops import losses as L
    from unsupervised_pose_estimation_tpu.ops.warp import grid_sample
    from unsupervised_pose_estimation_tpu.train.bundle import ModelBundle
    from unsupervised_pose_estimation_tpu.train.state import \
        create_train_state
    from unsupervised_pose_estimation_tpu.train.step import build_train_step

    cfg = Options(height=H, width=W, batch_size=B,
                  compute_dtype="bfloat16").validate()
    bundle = ModelBundle.create(cfg)
    state = create_train_state(bundle, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(B, H, W, 3)), jnp.float32)
    pair = jnp.asarray(rng.uniform(size=(2 * B, H, W, 6)), jnp.float32)
    grid = jnp.asarray(rng.uniform(-1, 1, size=(B, H, W, 2)), jnp.float32)

    batch = {
        "color": jnp.stack([img] * 3, 1),
        "color_aug": jnp.stack([img] * 3, 1),
        "K_norm": jnp.tile(jnp.asarray(
            [[0.635, 0, 0.48, 0], [0, 0.634, 0.5, 0],
             [0, 0, 1, 0], [0, 0, 0, 1]], jnp.float32), (B, 1, 1)),
    }

    # full step
    step = build_train_step(bundle, donate=False)
    t = timeit(lambda: step(state, batch, jax.random.PRNGKey(1))[1]["loss"],
               n=5)
    print(f"full train step: {t*1e3:8.2f} ms  ({B/t:7.1f} frames/s)")

    # encoder fwd
    @jax.jit
    def enc(x):
        return bundle.encoder.apply(
            {"params": state.params["encoder"],
             "batch_stats": state.batch_stats["encoder"]}, x, False)[-1]

    print(f"depth encoder fwd: {timeit(enc, img)*1e3:8.2f} ms")

    @jax.jit
    def encdec(x):
        f = bundle.encoder.apply(
            {"params": state.params["encoder"],
             "batch_stats": state.batch_stats["encoder"]}, x, False)
        return bundle.depth.apply(
            {"params": state.params["depth"],
             "batch_stats": state.batch_stats["depth"]}, f, False)[0]

    print(f"encoder+decoder fwd: {timeit(encdec, img)*1e3:8.2f} ms")

    @jax.jit
    def pose(x):
        f = bundle.pose_encoder.apply(
            {"params": state.params["pose_encoder"],
             "batch_stats": state.batch_stats["pose_encoder"]}, x, False)
        return bundle.pose.apply({"params": state.params["pose"]}, [f])[0]

    print(f"pose enc+dec fwd (2B): {timeit(pose, pair)*1e3:8.2f} ms")

    # warp variants
    warp_rowgather = jax.jit(grid_sample)
    print(f"warp (row gather): {timeit(warp_rowgather, img, grid)*1e3:8.2f} ms")

    @jax.jit
    def warp_lanegather(image, g):
        b, h, w, c = image.shape
        x = jnp.clip((g[..., 0] + 1) * 0.5 * (w - 1), 0, w - 1)
        y = jnp.clip((g[..., 1] + 1) * 0.5 * (h - 1), 0, h - 1)
        x0 = jnp.floor(x); y0 = jnp.floor(y)
        wx = (x - x0)[..., None]; wy = (y - y0)[..., None]
        x0i = x0.astype(jnp.int32); y0i = y0.astype(jnp.int32)
        x1i = jnp.minimum(x0i + 1, w - 1); y1i = jnp.minimum(y0i + 1, h - 1)
        flat = image.transpose(0, 3, 1, 2).reshape(b, c, h * w)

        def take(yy, xx):
            idx = (yy * w + xx).reshape(b, 1, -1)
            out = jnp.take_along_axis(flat, jnp.broadcast_to(idx, (b, c, idx.shape[-1])), axis=2)
            return out.reshape(b, c, h, w).transpose(0, 2, 3, 1)

        v00 = take(y0i, x0i); v01 = take(y0i, x1i)
        v10 = take(y1i, x0i); v11 = take(y1i, x1i)
        top = v00 + (v01 - v00) * wx
        bot = v10 + (v11 - v10) * wx
        return top + (bot - top) * wy

    print(f"warp (lane gather): {timeit(warp_lanegather, img, grid)*1e3:8.2f} ms")

    ssim_j = jax.jit(L.ssim)
    print(f"ssim: {timeit(ssim_j, img, img)*1e3:8.2f} ms")

    reproj = jax.jit(lambda a, b_: L.reprojection_loss(a, b_))
    print(f"reprojection loss: {timeit(reproj, img, img)*1e3:8.2f} ms")

    @jax.jit
    def geom(depth, K):
        pts = G.backproject(depth, G.invert_intrinsics(K))
        return G.project(pts, K, jnp.eye(4)[None].repeat(B, 0), H, W)

    depth = jnp.ones((B, H, W, 1))
    K = G.scaled_intrinsics(batch["K_norm"], W, H, 0)
    print(f"backproject+project: {timeit(geom, depth, K)*1e3:8.2f} ms")

    # fwd+loss only (no grad/update): isolates the backward+Adam share
    from unsupervised_pose_estimation_tpu.train.step import build_eval_step

    estep = build_eval_step(bundle)
    rngk = jax.random.PRNGKey(2)
    t = timeit(lambda: estep(state, batch, rngk)[0]["loss"], n=5)
    print(f"fwd+loss (eval step): {t*1e3:8.2f} ms")

    # conv stacks fwd+bwd (param grads of a scalar of the outputs)
    @jax.jit
    def encdec_grad(p):
        feats = bundle.encoder.apply(
            {"params": p["encoder"],
             "batch_stats": state.batch_stats["encoder"]}, img, False)
        d = bundle.depth.apply(
            {"params": p["depth"],
             "batch_stats": state.batch_stats["depth"]}, feats, False)
        return jnp.mean(d[0])

    g1 = jax.jit(jax.grad(encdec_grad))
    t = timeit(lambda: g1({"encoder": state.params["encoder"],
                           "depth": state.params["depth"]}), n=5)
    print(f"encoder+decoder fwd+bwd: {t*1e3:8.2f} ms")

    @jax.jit
    def pose_grad(p):
        f = bundle.pose_encoder.apply(
            {"params": p["pose_encoder"],
             "batch_stats": state.batch_stats["pose_encoder"]}, pair, False)
        aa, tt = bundle.pose.apply({"params": p["pose"]}, [f])
        return jnp.mean(aa) + jnp.mean(tt)

    g2 = jax.jit(jax.grad(pose_grad))
    t = timeit(lambda: g2({"pose_encoder": state.params["pose_encoder"],
                           "pose": state.params["pose"]}), n=5)
    print(f"pose enc+dec fwd+bwd (2B): {t*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
