"""Which warp-dispatch rung fires inside the REAL train step at init?

Mirrors train/step.py's coordinate path (disp -> depth -> backproject ->
project per scale/frame) on the bench configuration and prints, per warp
site, the truth value of every ladder predicate (ok7 16-row miniband,
band_ok 40-row band, shift_ok x-window) plus y-span stats.

Optional argv[1] = N: run N optimizer steps of the real fused train step
BEFORE dumping predicates (r4: at scratch init the spans sit 1 row inside
the gates — span7_max 15 vs 16, blk_span_max 39 vs 40 — and a handful of
Adam steps on noise pushes them over, silently dropping every warp site to
the exact-XLA rung; the bench's post-window trace showed exactly that).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

H, W, B = 192, 640, 12
LANE, RB, MB7, BAND_H = 128, 8, 16, 40


def main():
    from unsupervised_pose_estimation_tpu.config import Options
    from unsupervised_pose_estimation_tpu.ops import geometry as G
    from unsupervised_pose_estimation_tpu.ops.resize import resize_bilinear
    from unsupervised_pose_estimation_tpu.train.bundle import ModelBundle
    from unsupervised_pose_estimation_tpu.train.state import \
        create_train_state

    cfg = Options(height=H, width=W, batch_size=B, num_layers=18,
                  compute_dtype="bfloat16",
                  weights_init="scratch").validate()
    bundle = ModelBundle.create(cfg)
    state = create_train_state(bundle, jax.random.PRNGKey(0),
                               cfg.learning_rate)

    if "--noise" in sys.argv:
        # iid-noise frames: the adversarial input (pose drifts off the fast
        # rungs within ~15 self-training steps)
        rng = np.random.default_rng(0)
        f = cfg.num_input_frames
        color = (rng.uniform(size=(B, f, H, W, 3)) * 255).astype(np.uint8)
        K_norm = np.tile(np.asarray(
            [[0.635, 0, 0.48, 0], [0, 0.634, 0.5, 0],
             [0, 0, 1, 0], [0, 0, 0, 1]], np.float32), (B, 1, 1))
    else:
        # the bench's structured-parallax batch (bench.bench_batch)
        from unsupervised_pose_estimation_tpu.data.datasets import \
            SyntheticParallaxDataset

        ds = SyntheticParallaxDataset(B, H, W, [0, -1, 1])
        items = [ds.get_item(i) for i in range(B)]
        color = np.stack([it["color"] for it in items])
        K_norm = np.stack([it["K_norm"] for it in items])

    @jax.jit
    def predicates(params, stats, color, K_norm):
        x01 = color.astype(jnp.float32) / 255.0
        target = x01[:, 0]
        feats = bundle.encoder.apply(
            {"params": params["encoder"], "batch_stats": stats["encoder"]},
            target.astype(jnp.bfloat16), False)
        disps = bundle.depth.apply(
            {"params": params["depth"], "batch_stats": stats["depth"]},
            feats, False)
        K = G.scaled_intrinsics(K_norm, W, H, 0)
        inv_K = G.invert_intrinsics(K)
        out = {}
        for idx, f_i in enumerate((-1, 1)):
            pe_in = jnp.concatenate(
                [x01[:, 0 if f_i < 0 else 1], x01[:, idx * 2]], axis=-1)
            pf = bundle.pose_encoder.apply(
                {"params": params["pose_encoder"],
                 "batch_stats": stats["pose_encoder"]},
                pe_in.astype(jnp.bfloat16), False)
            aa, tt = bundle.pose.apply({"params": params["pose"]}, [pf])
            T = G.transformation_from_parameters(
                aa[:, 0, 0].astype(jnp.float32), tt[:, 0, 0].astype(jnp.float32),
                invert=(f_i < 0))
            for s in cfg.scales:
                disp_full = resize_bilinear(disps[s].astype(jnp.float32),
                                            H, W)
                _, depth = G.disp_to_depth(disp_full, cfg.min_depth,
                                           cfg.max_depth)
                cam = G.backproject(depth, inv_K)
                grid = G.project(cam, K, T, H, W)
                x = jnp.clip((grid[..., 0] + 1) * 0.5 * (W - 1), 0, W - 1)
                y = jnp.clip((grid[..., 1] + 1) * 0.5 * (H - 1), 0, H - 1)
                x0i = jnp.minimum(jnp.floor(x), W - 2).astype(jnp.int32)
                y0i = jnp.minimum(jnp.floor(y), H - 2).astype(jnp.int32)
                yb7 = y0i.reshape(B, H, W // LANE, LANE)
                y_mn = jnp.min(yb7, axis=3)
                y_mx = jnp.max(yb7, axis=3)
                m7 = jnp.clip((y_mn // 8) * 8, 0, H - MB7)
                span7 = y_mx + 1 - m7
                ok7 = jnp.all(span7 <= MB7 - 1)
                col_group = (jnp.arange(W) // LANE)[None, None, :]
                gdiff = x0i // LANE - col_group
                shift_ok = jnp.logical_and(
                    jnp.all(gdiff >= -1),
                    jnp.all((x0i + 1) // LANE - col_group <= 1))
                y_blk = y0i.reshape(B, H // RB, RB * W)
                blk_min = (jnp.min(y_blk, axis=2) // 8) * 8
                blk_max = jnp.max(y_blk, axis=2)
                ymin = jnp.clip(blk_min, 0, H - BAND_H)
                band_ok = jnp.all(blk_max + 1 - ymin <= BAND_H - 1)
                out[(f_i, s)] = dict(
                    ok7=ok7, shift_ok=shift_ok, band_ok=band_ok,
                    span7_max=jnp.max(span7),
                    span7_frac_bad=jnp.mean(
                        (span7 > MB7 - 1).astype(jnp.float32)),
                    blk_span_max=jnp.max(blk_max + 1 - ymin),
                    flow_y_max=jnp.max(jnp.abs(
                        y - jnp.arange(H, dtype=jnp.float32)[None, :, None])),
                    flow_x_max=jnp.max(jnp.abs(
                        x - jnp.arange(W, dtype=jnp.float32)[None, None, :])),
                )
        return out

    ints = [a for a in sys.argv[1:] if a.lstrip("-").isdigit()]
    n_train = int(ints[0]) if ints else 0
    if n_train:
        from unsupervised_pose_estimation_tpu.train.step import \
            build_train_step

        try:
            import os

            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), ".jax_cache"))
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass
        step = build_train_step(bundle)
        batch = jax.device_put({
            "color": color, "color_aug": color, "K_norm": K_norm})
        key = jax.random.PRNGKey(1)
        for i in range(n_train):
            state, losses = step(state, batch, key)
        print(f"trained {n_train} steps, loss={float(losses['loss']):.5f}")

    out = predicates(state.params, state.batch_stats,
                     jnp.asarray(color), jnp.asarray(K_norm))
    for k in sorted(out):
        d = {kk: float(vv) for kk, vv in out[k].items()}
        print(f"frame {k[0]:+d} scale {k[1]}: ok7={d['ok7']:.0f} "
              f"shift_ok={d['shift_ok']:.0f} band_ok={d['band_ok']:.0f} "
              f"span7_max={d['span7_max']:.0f} "
              f"bad_chunks={d['span7_frac_bad']*100:.2f}% "
              f"blk_span_max={d['blk_span_max']:.0f} "
              f"|flow_y|max={d['flow_y_max']:.1f} "
              f"|flow_x|max={d['flow_x_max']:.1f}")


if __name__ == "__main__":
    main()
