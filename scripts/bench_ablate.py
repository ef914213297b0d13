"""Marginal-cost ablation of the fused train step on the real TPU.

Times the flagship step (640x192, batch 12, bf16) with individual features
toggled, so each ablation's delta vs the full step approximates that
component's marginal cost inside the compiled program. Complements
scripts/profile_step.py (which times pieces in isolation and therefore
carries a ~2.5 ms/dispatch tunnel floor per measurement).

Variants:
  full             the bench.py configuration (defaults: pallas warp v8,
                   fused Pallas loss)
  xla_loss         use_pallas_loss=False  -> XLA SSIM+L1 (the pre-r3
                   default; the fused Pallas kernel is now on by default)
  xla_warp         use_pallas_warp=False  -> XLA patch-gather warp
  no_automask      disable_automasking    -> no identity reprojection
  scale0_only      scales=[0]             -> 1 warp per source frame
  fwd_only         loss value without grad/optimizer (networks fwd + warp)

The pooled chip shows bursty multi-minute external contention, so variants
are timed INTERLEAVED (round-robin windows, best window per variant) —
sequential per-variant blocks would attribute a contention phase to
whichever variant was unlucky enough to run inside it.
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W, B = 192, 640, 12


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))


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
        ("xla_loss", {"use_pallas_loss": False}),
        ("xla_warp", {"use_pallas_warp": False}),
        ("warp_v7", {"pallas_warp_version": 7}),
        ("no_automask", {"disable_automasking": True}),
        ("scale0_only", {"scales": [0]}),
    ]
    only = os.environ.get("ABLATE_ONLY")
    if only:
        keep = set(only.split(","))
        variants = [(n, kw) for n, kw in variants if n in keep]
    runners = []
    for name, kw in variants:
        bundle, state, step = build(kw)
        runners.append((name, functools.partial(
            lambda st, s, b_, k: s(st, b_, k)[1]["loss"],
            state, step, batch, key)))

    # forward-only (loss value, no grad): same full config
    from unsupervised_pose_estimation_tpu.train.step import forward_and_loss
    bundle, state, _ = build({})

    @jax.jit
    def fwd(params=state.params, stats=state.batch_stats, b_=batch, k=key):
        return forward_and_loss(bundle, params, stats, state.frozen, b_, k,
                                train=True)[0]

    if not only or "fwd_only" in only:
        runners.append(("fwd_only", fwd))

    # eval_bn: the FULL step (grads + adam) but with BatchNorm in inference
    # mode — isolates the train-mode batch-stat reductions (mean/var over
    # every conv output, f32) plus their backward, inside the same program.
    from unsupervised_pose_estimation_tpu.train.state import make_optimizer

    tx = make_optimizer(bundle.cfg.learning_rate)

    @jax.jit
    def eval_bn_step(st=state, b_=batch, k=key):
        def loss_fn(params):
            return forward_and_loss(bundle, params, st.batch_stats,
                                    st.frozen, b_, k, train=False)[0]

        grads = jax.grad(loss_fn)(st.params)
        updates, _ = tx.update(grads, st.opt_state, st.params)
        import optax
        return optax.apply_updates(st.params, updates)

    if not only or "eval_bn" in only:
        runners.append(("eval_bn", eval_bn_step))

    # compile + warm every variant, then interleave timed windows
    best = {}
    for name, fn in runners:
        t0 = time.perf_counter()
        _sync(fn())
        print(f"compiled {name} in {time.perf_counter() - t0:.0f}s",
              flush=True)
        best[name] = float("inf")
    n = 8
    for rnd in range(5):
        for name, fn in runners:
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn()
            _sync(out)
            best[name] = min(best[name], (time.perf_counter() - t0) / n)
        print(f"-- round {rnd}: " + "  ".join(
            f"{k}={v*1e3:.1f}" for k, v in best.items()), flush=True)

    base = best["full"]
    for name, _ in runners:
        t = best[name]
        delta = "" if name == "full" else f"  (delta {1e3*(t-base):+7.2f} ms)"
        extra = (f"  (bwd+opt = {1e3*(base-t):+7.2f} ms)"
                 if name == "fwd_only" else delta)
        print(f"{name:14s} {t*1e3:8.2f} ms{extra}", flush=True)


if __name__ == "__main__":
    main()
