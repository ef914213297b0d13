"""Microbenchmark: Mosaic lane-gather (take_along_axis axis=1) cost model.

Is the cost per CALL or per ELEMENT? Times a kernel issuing N gathers of
(S, 128) inside one grid step, for a sweep of (N, S).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_kernel(n_calls, s):
    def kernel(src_ref, idx_ref, out_ref):
        acc = jnp.zeros((s, 128), jnp.float32)
        src = src_ref[:]
        idx = idx_ref[:]
        for k in range(n_calls):
            acc = acc + jnp.take_along_axis(src, (idx + k) % 128, axis=1)
        out_ref[:] = acc

    return kernel


def run(n_calls, s, reps=50):
    src = jnp.asarray(np.random.default_rng(0).uniform(size=(s, 128)),
                      jnp.float32)
    idx = jnp.asarray(np.random.default_rng(1).integers(0, 128, size=(s, 128)),
                      jnp.int32)
    fn = pl.pallas_call(
        make_kernel(n_calls, s),
        out_shape=jax.ShapeDtypeStruct((s, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    jfn = jax.jit(lambda a, b: fn(a, b))
    float(jnp.sum(jfn(src, idx)))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = jfn(src, idx)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / reps
    per_call = dt / n_calls
    per_elem = per_call / (s * 128)
    print(f"N={n_calls:4d} S={s:3d}: {dt*1e6:9.1f} us total, "
          f"{per_call*1e9:8.1f} ns/call, {per_elem*1e9:6.3f} ns/elem")


if __name__ == "__main__":
    for s in (8, 16, 24, 40):
        for n in (2048, 8192):
            run(n, s, reps=20)
