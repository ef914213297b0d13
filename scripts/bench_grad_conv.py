"""Forward vs forward+backward cost of the encoder's stride-2 convs.

Hypothesis behind the remaining "diffuse conv tail" (ROADMAP round-3
priorities): the BACKWARD of every stride-2 conv lowers to a
``lhs_dilation=2`` conv on TPU (the input gradient scatters the upstream
gradient into a 75%-zero canvas), which XLA executes at a fraction of MXU
density, while the same math in space-to-depth ("packed") layout is a dense
stride-1 conv in both directions (ops/packed.py rationale; the stem already
uses this via models/resnet._packed_stem_conv).

This script measures, per encoder downsample shape (and the 3x3 stride-1
shape as control):
  fwd          standard stride-2 conv, forward only
  fwd+bwd      value_and_grad wrt input AND kernel
  packed fwd(+bwd)  the space-to-depth formulation (2x2 stride-1 conv with
               a zero-assembled (2, 2, 4Cin, Cout) kernel)

Variants are interleaved round-robin (pooled-chip contention; see
scripts/bench_ablate.py) and synced by value fetch (axon backend rule).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

B = 12


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))


def pack_s2_kernel(kernel):
    """(3, 3, Cin, Cout) stride-2 pad-1 conv kernel -> (2, 2, 4Cin, Cout)
    packed-domain kernel: tap a-1 = 2*dp + rp places K[a, b] at packed tap
    (dp+1, dq+1), input sub-channel (rp, sp)."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    k2 = jnp.zeros((2, 2, 4 * cin, cout), kernel.dtype)
    for a in range(3):
        dp, rp = divmod(a - 1, 2)
        for b_ in range(3):
            dq, sp = divmod(b_ - 1, 2)
            ci = (rp * 2 + sp) * cin
            k2 = k2.at[dp + 1, dq + 1, ci:ci + cin, :].set(kernel[a, b_])
    return k2


def conv_s2(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_s2_packed(x, k):
    from unsupervised_pose_estimation_tpu.ops.packed import space_to_depth

    k2 = pack_s2_kernel(k)
    xp = space_to_depth(x)
    return jax.lax.conv_general_dilated(
        xp, k2, window_strides=(1, 1), padding=((1, 0), (1, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_s1(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def loss_of(conv):
    def f(x, k):
        return jnp.sum(conv(x, k).astype(jnp.float32))
    return jax.jit(jax.value_and_grad(f, argnums=(0, 1)))


def main():
    rng = np.random.default_rng(0)
    # (name, H, W, Cin, Cout, batch): the three ResNet-18 downsample stages
    # for the depth encoder (B=12) and pose encoder (B=24), plus a stride-1
    # control at the layer2 shape.
    shapes = [
        ("layer2_0 s2 96x320 64->128 b12", 96, 320, 64, 128, 12),
        ("layer3_0 s2 48x160 128->256 b12", 48, 160, 128, 256, 12),
        ("layer4_0 s2 24x80 256->512 b12", 24, 80, 256, 512, 12),
        ("pose layer2_0 s2 96x320 b24", 96, 320, 64, 128, 24),
        ("control s1 48x160 128->128 b12", 48, 160, 128, 128, 12),
    ]

    cases = []
    for name, h, w, cin, cout, b in shapes:
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                        jnp.bfloat16)
        stride1 = name.startswith("control")
        conv = conv_s1 if stride1 else conv_s2
        cases.append((f"{name} [fwd]", jax.jit(conv), (x, k)))
        cases.append((f"{name} [fwd+bwd]", loss_of(conv), (x, k)))
        if not stride1:
            cases.append((f"{name} [packed fwd]", jax.jit(conv_s2_packed),
                          (x, k)))
            cases.append((f"{name} [packed fwd+bwd]",
                          loss_of(conv_s2_packed), (x, k)))

    # numerical check packed == standard (bf16 tolerance)
    for name, h, w, cin, cout, b in shapes:
        if name.startswith("control"):
            continue
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                        jnp.float32)
        ref = conv_s2(x, k)
        got = conv_s2_packed(x, k)
        err = float(jnp.max(jnp.abs(ref - got)))
        scale = float(jnp.max(jnp.abs(ref)))
        assert err <= 1e-3 * max(scale, 1.0), (name, err, scale)
    print("packed == standard: ok")

    # warm up all compiles first
    for name, fn, args in cases:
        _sync(fn(*args))

    n, rounds = 30, 3
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
        print(f"{name:44s} {best[name]:8.3f} ms")


if __name__ == "__main__":
    main()
