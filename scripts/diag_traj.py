"""Training-trajectory diagnostic on the bench configuration.

r4 finding: after ~15 self-training steps on random frames the XProf trace
shows every warp site on the exact-XLA fallback rung — i.e. predicted flow
magnitudes left the fast-kernel window. This script runs N optimizer steps
of the REAL fused train step on the bench batch and prints loss + grad_norm
per step, so kernel-gradient-driven blow-ups are visible directly and A/B
across configs (DIAG_CFG env, JSON Options overrides — e.g.
'{"use_pallas_loss": false, "use_pallas_warp": false}' for the pure-XLA
oracle) isolates which kernel's hardware gradients misbehave.

Usage: DIAG_CFG='{}' python scripts/diag_traj.py [n_steps]
"""

import json
import os
import sys

import numpy as np

import jax


def main(n_steps=30):
    from unsupervised_pose_estimation_tpu.config import Options
    from unsupervised_pose_estimation_tpu.train.bundle import ModelBundle
    from unsupervised_pose_estimation_tpu.train.state import \
        create_train_state
    from unsupervised_pose_estimation_tpu.train.step import build_train_step

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))), ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    overrides = json.loads(os.environ.get("DIAG_CFG", "{}"))
    H, W, B = 192, 640, 12
    cfg = Options(height=H, width=W, batch_size=B, num_layers=18,
                  compute_dtype="bfloat16", weights_init="scratch",
                  **overrides).validate()
    bundle = ModelBundle.create(cfg)
    state = create_train_state(bundle, jax.random.PRNGKey(0),
                               cfg.learning_rate)
    # donate=True: byte-identical program to bench.py's, so the persistent
    # compile cache from a bench run serves this immediately
    step = build_train_step(bundle)

    # same structured-parallax batch as bench.py (iid noise trains the pose
    # net off the warp ladder's fast rungs — see bench.bench_batch)
    if json.loads(os.environ.get("DIAG_NOISE", "false")):
        rng = np.random.default_rng(0)
        f = cfg.num_input_frames
        batch = {
            "color": (rng.uniform(size=(B, f, H, W, 3)) * 255
                      ).astype(np.uint8),
            "color_aug": (rng.uniform(size=(B, f, H, W, 3)) * 255
                          ).astype(np.uint8),
            "K_norm": np.tile(np.asarray(
                [[0.635, 0, 0.48, 0], [0, 0.634, 0.5, 0],
                 [0, 0, 1, 0], [0, 0, 0, 1]], np.float32), (B, 1, 1)),
        }
    else:
        from unsupervised_pose_estimation_tpu.data.datasets import \
            SyntheticParallaxDataset

        ds = SyntheticParallaxDataset(B, H, W, [0, -1, 1])
        items = [ds.get_item(i) for i in range(B)]
        batch = {k: np.stack([it[k] for it in items]) for k in items[0]}
    batch = jax.device_put(batch)
    key = jax.random.PRNGKey(1)

    print(f"config overrides: {overrides}", file=sys.stderr, flush=True)
    for i in range(n_steps):
        state, losses = step(state, batch, key)
        print(json.dumps({"step": i + 1,
                          "loss": round(float(losses["loss"]), 6),
                          "grad_norm": round(float(losses["grad_norm"]),
                                             4)}),
              flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 30)
