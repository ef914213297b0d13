"""Maxpool backward: XLA select-and-scatter vs argmax-routed alternatives.

AVENUE CLOSED (r4): the stem maxpool's select-and-scatter backward reads
~1.2 ms/step in the step trace (~3x off bandwidth), but every XLA-level
replacement tried loses on TPU:
  * 9 sublane-strided window slices + interior-dilated pad scatter: 12x
    SLOWER (each interior pad lowers to a 3-4 ms element shuffle).
  * parity-plane (space-to-depth) taps + plane-accumulated scatter with a
    single depth-to-space re-interleave (the variant kept below): batch 12
    parity (1.94 vs 1.91 ms fwd+bwd wall), batch 24 2x LOSS (4.9 vs 2.5) —
    the two s2d/d2s interleave copies (~0.5 ms each at batch 24) eat the
    s&s saving.
Select-and-scatter stays (models/resnet.py uses nn.max_pool). A
VMEM-resident Pallas pool kernel could beat it but the prize (~1 ms/step)
doesn't justify the surface; measured on 1x v5e.
"""

import time

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from unsupervised_pose_estimation_tpu.ops.packed import (depth_to_space,
                                                         space_to_depth)

# window offset d (0, 1, 2) -> (parity plane, block shift)
_PARITY = {0: (1, -1), 1: (0, 0), 2: (1, 0)}


def _parity_planes(x):
    c = x.shape[-1]
    xp = space_to_depth(x)  # (B, H/2, W/2, 4C), channel layout (r, s, c)
    return {(p, q): xp[..., (2 * p + q) * c:(2 * p + q + 1) * c]
            for p in (0, 1) for q in (0, 1)}


def _fwd_argmax(x):
    b, h, w, c = x.shape
    oh, ow = h // 2, w // 2
    neg = jnp.asarray(float("-inf"), x.dtype)
    planes = _parity_planes(x)

    def tap(k):
        dy, dx = divmod(k, 3)
        (p, di), (q, dj) = _PARITY[dy], _PARITY[dx]
        t = planes[(p, q)]
        if di:
            t = jnp.pad(t, ((0, 0), (1, 0), (0, 0), (0, 0)),
                        constant_values=neg)[:, :oh]
        if dj:
            t = jnp.pad(t, ((0, 0), (0, 0), (1, 0), (0, 0)),
                        constant_values=neg)[:, :, :ow]
        return t

    best = tap(0)
    idx = jnp.zeros(best.shape, jnp.int8)
    for k in range(1, 9):
        t = tap(k)
        upd = t > best  # strict: earlier tap wins ties (torch/XLA rule)
        best = jnp.where(upd, t, best)
        idx = jnp.where(upd, jnp.int8(k), idx)
    return best, idx


@jax.custom_vjp
def max_pool_argmax(x):
    return _fwd_argmax(x)[0]


def _pool_fwd(x):
    out, idx = _fwd_argmax(x)
    return out, (idx, x.shape, jnp.zeros((0,), x.dtype))


def _pool_bwd(res, g):
    idx, x_shape, dtype_token = res
    planes = {(p, q): None for p in (0, 1) for q in (0, 1)}
    for k in range(9):
        dy, dx = divmod(k, 3)
        (p, di), (q, dj) = _PARITY[dy], _PARITY[dx]
        contrib = jnp.where(idx == jnp.int8(k), g, jnp.zeros((), g.dtype))
        if di:  # plane[j] += contrib[j + 1]
            contrib = jnp.pad(contrib,
                              ((0, 0), (0, 1), (0, 0), (0, 0)))[:, 1:]
        if dj:
            contrib = jnp.pad(contrib,
                              ((0, 0), (0, 0), (0, 1), (0, 0)))[:, :, 1:]
        key = (p, q)
        planes[key] = contrib if planes[key] is None else \
            planes[key] + contrib
    g4 = jnp.concatenate([planes[(0, 0)], planes[(0, 1)],
                          planes[(1, 0)], planes[(1, 1)]], axis=-1)
    return (depth_to_space(g4).astype(dtype_token.dtype),)


max_pool_argmax.defvjp(_pool_fwd, _pool_bwd)


def run():
    rng = np.random.default_rng(0)
    for shape in [(24, 96, 320, 64), (12, 96, 320, 64)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        cot = jnp.asarray(rng.standard_normal(
            (shape[0], shape[1] // 2, shape[2] // 2, shape[3])),
            jnp.bfloat16)

        def f_nn(a):
            out = nn.max_pool(a, (3, 3), strides=(2, 2),
                              padding=((1, 1), (1, 1)))
            return jnp.sum((out * cot).astype(jnp.float32))

        def f_arg(a):
            return jnp.sum((max_pool_argmax(a) * cot).astype(jnp.float32))

        g_nn = jax.jit(jax.grad(f_nn))
        g_arg = jax.jit(jax.grad(f_arg))
        d = float(jnp.max(jnp.abs(g_nn(x).astype(jnp.float32)
                                  - g_arg(x).astype(jnp.float32))))
        cases = [("nn.max_pool fwd+bwd", g_nn), ("argmax pool fwd+bwd",
                                                 g_arg)]
        for _, fn in cases:
            float(jnp.sum(fn(x).astype(jnp.float32)))  # warm
        best = {}
        n, rounds = 30, 3
        for _ in range(rounds):
            for name, fn in cases:
                t0 = time.perf_counter()
                for _ in range(n):
                    out = fn(x)
                float(jnp.sum(out.astype(jnp.float32)))  # value-fetch sync
                best[name] = min(best.get(name, 1e9),
                                 (time.perf_counter() - t0) / n * 1e3)
        print(f"shape {shape}: grad max|diff|={d:.2e} (bf16 rounding)")
        for name, _ in cases:
            print(f"  {name:24s} {best[name]:7.3f} ms")


if __name__ == "__main__":
    run()
