"""Train-mode BatchNorm statistics cost: reduce-based vs matmul-based.

The step trace (scripts/trace_step.py) shows ~10-20 `convert_reduce_fusion`
ops — f32 mean/var reductions over bf16 conv activations — totalling
several ms/step. Each is a separate HBM pass whose (N*H*W -> C) reduction
runs on the VPU at far below bandwidth. Hypothesis: computing the same
sums as ones-vector matmuls puts the reduction on the MXU:

  sum_c   = ones(1, NHW) @ x(NHW, C)
  sumsq_c = ones(1, NHW) @ (x*x)(NHW, C)

and XLA fuses the elementwise square into the matmul operand, so both
moments cost ~one bandwidth pass. Variants (value-fetch-synced, interleaved
rounds for pooled-chip contention robustness):

  reduce      jnp.mean/var over (0,1,2) in f32 (what flax BatchNorm does)
  matmul      ones-matmul moments, var = E[x^2] - E[x]^2 in f32
  fused_bn    full train-mode BN (stats + normalize) both ways, fwd+bwd

AVENUE CLOSED (r4, measured 1x v5e): stats-only is a wash (0.99 vs 0.96 ms
wall at 24x96x320x64, dispatch-floor dominated), but full BN fwd+bwd is a
clear LOSS for the matmul variant (1.49 -> 5.19 ms at 24x96x320x64,
1.18 -> 2.59 at 12x96x320x64, ~parity at 12x48x160x128): the ones-matmul's
backward materializes extra full-size intermediates that XLA's native
reduce path fuses away. flax BatchNorm's reduce-based stats stay.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

SHAPES = [
    ("stem 24x96x320x64", (24, 96, 320, 64)),
    ("stem 12x96x320x64", (12, 96, 320, 64)),
    ("layer2 12x48x160x128", (12, 48, 160, 128)),
]


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))


def stats_reduce(x):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(xf), axis=(0, 1, 2)) - jnp.square(mean)
    return mean, var


def stats_matmul(x):
    n = x.shape[0] * x.shape[1] * x.shape[2]
    x2 = x.reshape(n, x.shape[3])
    ones = jnp.ones((1, n), x.dtype)
    s = jax.lax.dot_general(ones, x2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    sq = jax.lax.dot_general(ones, x2 * x2, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    mean = s[0] / n
    var = sq[0] / n - jnp.square(mean)
    return mean, var


def bn_train(stats_fn):
    def f(x, scale, bias):
        mean, var = stats_fn(x)
        inv = jax.lax.rsqrt(var + 1e-5)
        y = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return jnp.sum(y.astype(jnp.float32) ** 2)
    return jax.jit(jax.value_and_grad(f, argnums=(0, 1, 2)))


def main():
    rng = np.random.default_rng(0)
    cases = []
    for name, shape in SHAPES:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        scale = jnp.ones((shape[-1],), jnp.float32)
        bias = jnp.zeros((shape[-1],), jnp.float32)
        mr = stats_reduce(x)
        mm = stats_matmul(x)
        err = max(float(jnp.max(jnp.abs(a - b))) for a, b in zip(mr, mm))
        assert err < 1e-2, (name, err)
        cases.append((f"{name} [stats reduce]", jax.jit(stats_reduce), (x,)))
        cases.append((f"{name} [stats matmul]", jax.jit(stats_matmul), (x,)))
        cases.append((f"{name} [bn fwd+bwd reduce]", bn_train(stats_reduce),
                      (x, scale, bias)))
        cases.append((f"{name} [bn fwd+bwd matmul]", bn_train(stats_matmul),
                      (x, scale, bias)))

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
        print(f"{name:40s} {best[name]:8.3f} ms")


if __name__ == "__main__":
    main()
