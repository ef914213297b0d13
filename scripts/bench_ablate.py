"""Marginal-cost ablation of the fused train step on the real TPU.

Times the flagship step (640x192, batch 12, bf16) with individual features
toggled, so each ablation's delta vs the full step approximates that
component's marginal cost inside the compiled program. Complements
scripts/profile_step.py (which times pieces in isolation and therefore
carries a ~2.5 ms/dispatch tunnel floor per measurement).

Variants:
  full             the bench.py configuration (pallas warp + pallas loss)
  xla_warp         use_pallas_warp=False  -> XLA patch-gather warp
  xla_loss         use_pallas_loss=False  -> XLA SSIM+L1
  no_automask      disable_automasking    -> no identity reprojection
  scale0_only      scales=[0]             -> 1 warp per source frame
  fwd_only         loss value without grad/optimizer (networks fwd + warp)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, B = 192, 640, 12


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))


def timeit(fn, *args, n=10, warmup=2, best_of=5):
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


def build(cfg_kwargs):
    from unsupervised_pose_estimation_tpu.config import Options
    from unsupervised_pose_estimation_tpu.train.bundle import ModelBundle
    from unsupervised_pose_estimation_tpu.train.state import \
        create_train_state
    from unsupervised_pose_estimation_tpu.train.step import build_train_step

    cfg = Options(height=H, width=W, batch_size=B, compute_dtype="bfloat16",
                  weights_init="scratch", **cfg_kwargs).validate()
    bundle = ModelBundle.create(cfg)
    state = create_train_state(bundle, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    return bundle, state, build_train_step(bundle, donate=False)


def main():
    rng = np.random.default_rng(0)
    u8 = jnp.asarray(rng.integers(0, 256, size=(B, 3, H, W, 3)), jnp.uint8)
    batch = {"color": u8, "color_aug": u8,
             "K_norm": jnp.tile(jnp.asarray(
                 [[0.635, 0, 0.48, 0], [0, 0.634, 0.5, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], jnp.float32), (B, 1, 1))}
    key = jax.random.PRNGKey(1)

    variants = [
        ("full", {}),
        ("xla_warp", {"use_pallas_warp": False}),
        ("xla_loss", {"use_pallas_loss": False}),
        ("no_automask", {"disable_automasking": True}),
        ("scale0_only", {"scales": [0]}),
    ]
    base = None
    for name, kw in variants:
        bundle, state, step = build(kw)
        t = timeit(lambda: step(state, batch, key)[1]["loss"])
        delta = "" if base is None else f"  (delta {1e3*(t-base):+7.2f} ms)"
        if base is None:
            base = t
        print(f"{name:14s} {t*1e3:8.2f} ms{delta}", flush=True)

    # forward-only (loss value, no grad): same full config
    from unsupervised_pose_estimation_tpu.train.step import forward_and_loss
    bundle, state, _ = build({})

    @jax.jit
    def fwd(params, stats, b_, k):
        return forward_and_loss(bundle, params, stats, state.frozen, b_, k,
                                train=True)[0]

    t = timeit(lambda: fwd(state.params, state.batch_stats, batch, key))
    print(f"{'fwd_only':14s} {t*1e3:8.2f} ms  (bwd+opt = "
          f"{1e3*(base-t):+7.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
