"""Per-shape conv throughput on the real TPU.

Times representative convs from the flagship step (ResNet-18 encoder stem +
stages, decoder ConvBlocks, subpixel deconv) with the iteration chain INSIDE
one jit (lax.scan with a serial data dependency), so the ~2.5 ms/dispatch
tunnel floor is amortized away and the number is device time per op.
Reports achieved TFLOP/s vs the chip's bf16 peak to localize MXU
inefficiency (is it the conv shapes, or the graph around them?).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B = 12
ITERS = 200


def bench_conv(name, h, w, cin, cout, k, stride, dtype=jnp.bfloat16,
               pad="SAME"):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (B, h, w, cin)), dtype)
    kern = jnp.asarray(rng.uniform(-0.1, 0.1, (k, k, cin, cout)), dtype)

    def one(x_):
        return jax.lax.conv_general_dilated(
            x_, kern, window_strides=(stride, stride), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ho, wo = h // stride, w // stride

    @jax.jit
    def chain(x0):
        def body(carry, _):
            y = one(carry)
            # feed a (possibly reshaped) result back in to force serial
            # execution; cheap elementwise to map back to input shape
            nxt = jnp.mean(y) * jnp.ones((B, h, w, cin), dtype) + x0
            return nxt, jnp.mean(y)
        _, ys = jax.lax.scan(body, x0, None, length=ITERS)
        return ys[-1]

    for _ in range(2):
        out = chain(x)
    float(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = chain(x)
        float(out)
        best = min(best, (time.perf_counter() - t0) / ITERS)
    flops = 2 * B * ho * wo * cout * cin * k * k
    print(f"{name:22s} {best*1e6:9.1f} us  {flops/best/1e12:6.2f} TFLOP/s",
          flush=True)


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    # encoder (input 192x640)
    bench_conv("stem 7x7/2 3->64", 192, 640, 3, 64, 7, 2)
    bench_conv("L1 3x3 64->64 @96x320", 96, 320, 64, 64, 3, 1)
    bench_conv("L2 3x3 128->128", 48, 160, 128, 128, 3, 1)
    bench_conv("L3 3x3 256->256", 24, 80, 256, 256, 3, 1)
    bench_conv("L4 3x3 512->512", 12, 40, 512, 512, 3, 1)
    # pose encoder stem (6ch, 2B batch folded into B here)
    bench_conv("pose stem 6->64", 192, 640, 6, 64, 7, 2)
    # decoder representative
    bench_conv("dec 3x3 32->32 @96x320", 96, 320, 32, 32, 3, 1)
    bench_conv("dec 3x3 16->16 @192x640", 192, 640, 16, 16, 3, 1)
    bench_conv("dec 2x2 32->128 subpix", 96, 320, 32, 128, 2, 1)
    # f32 comparison on one shape
    bench_conv("L2 f32", 48, 160, 128, 128, 3, 1, dtype=jnp.float32)


if __name__ == "__main__":
    main()
