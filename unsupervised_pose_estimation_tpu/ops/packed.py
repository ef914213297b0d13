"""Space-to-depth ("packed") convolution for low-channel, large-spatial
decoder tails.

The fork decoder's last levels run 3x3 convs with 16-32 channels at up to
640x192 (`/root/reference/networks/depth_decoder.py:53-54,77-78`). On TPU
those shapes are MXU-starved: the 128-lane contraction sees 16 input
channels, and measured throughput is ~3 TFLOP/s vs ~80 for the 256-512
channel encoder stages (scripts/bench_conv.py). The fix is to carry the
tensor in space-to-depth layout — (B, H/2, W/2, 4C), channel index
(r, s, c) for output-row/col parity (r, s) — and run the SAME convolution
there:

  * a reflect-pad(1) 3x3 stride-1 conv at full resolution is EXACTLY a 3x3
    VALID conv on the edge-padded packed tensor with a zero-assembled
    (3, 3, 4*Cin, 4*Cout) kernel built from the original (3, 3, Cin, Cout)
    parameters (`assemble_packed_conv3x3`). Reflect padding at full res
    turns into plain edge replication of packed pixels: full-res row -1 is
    row 1, which lives in packed row 0's r=1 sub-channels — the same place
    the padded packed row's r=1 sub-channels come from when copying packed
    row 0. FLOPs are 4x nominal (36 tap-slots hold the 9 taps) but the MXU
    runs >10x faster at 4x the channel count, a ~2.5-3x net win per conv,
    forward and backward (no dilated gradients).
  * elementwise ops (ELU, sigmoid) are layout-blind; BatchNorm needs its
    stats grouped per ORIGINAL channel, which is a pure reshape
    (B, Hp, Wp, 4, C) — no transpose (see DepthDecoder).

Parameters are untouched — packing is an apply-time layout choice, so
checkpoints and .pth import shims are unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _pad1_dus(x, mode):
    """Replicate/reflect pad of 1 on H and W, built from dynamic-update-
    slices into a fresh buffer instead of ``jnp.pad``.

    Semantically identical to ``jnp.pad(x, [(0,0),(1,1),(1,1),(0,0)],
    mode)`` for mode in {"edge", "reflect"} — but XLA lays out jnp.pad's
    lowering (one fused double-concatenate) W-minor ({2,3,1,0}) while both
    its producer and the consuming convolution are C-minor ({3,0,2,1}),
    inserting TWO full-tensor layout copies around every pad at the packed
    decoder tail (~0.4 ms/step/site at 640x192x12, r5 HEAD trace). The DUS
    chain inherits the consumer's layout: compile-only micro A/B of
    producer-conv -> pad -> VALID-conv (fwd+bwd) drops 6 copy ops to 2 and
    halves the copies' estimated cycles, bit-exact.
    """
    b, h, w, c = x.shape
    # row index the out-of-range rows map to (edge: replicate; reflect:
    # full-res reflect == packed-row bounce, see assemble_packed_conv3x3)
    t = 1 if mode == "reflect" else 0
    bo = h - 2 if mode == "reflect" else h - 1
    l_ = 1 if mode == "reflect" else 0
    r_ = w - 2 if mode == "reflect" else w - 1
    buf = jnp.zeros((b, h + 2, w + 2, c), x.dtype)
    buf = jax.lax.dynamic_update_slice(buf, x, (0, 1, 1, 0))
    buf = jax.lax.dynamic_update_slice(buf, x[:, t:t + 1], (0, 0, 1, 0))
    buf = jax.lax.dynamic_update_slice(buf, x[:, bo:bo + 1],
                                       (0, h + 1, 1, 0))
    # full-height padded columns, corners following the same row rule
    lcol = x[:, :, l_:l_ + 1]
    rcol = x[:, :, r_:r_ + 1]
    lcol = jnp.concatenate([lcol[:, t:t + 1], lcol, lcol[:, bo:bo + 1]], 1)
    rcol = jnp.concatenate([rcol[:, t:t + 1], rcol, rcol[:, bo:bo + 1]], 1)
    buf = jax.lax.dynamic_update_slice(buf, lcol, (0, 0, 0, 0))
    buf = jax.lax.dynamic_update_slice(buf, rcol, (0, 0, w + 1, 0))
    return buf


def space_to_depth(x):
    """(B, H, W, C) -> (B, H/2, W/2, 4C), channel layout (r, s, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space(x):
    """(B, Hp, Wp, 4C) with (r, s, c) channel layout -> (B, 2Hp, 2Wp, C)."""
    b, hp, wp, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, hp, wp, 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * hp, 2 * wp, c)


def packed_concat_channels(xs):
    """Concatenate packed tensors along their ORIGINAL channel dim.

    Each x is (B, Hp, Wp, 4*ci) with (r, s, c) layout; the result is the
    packed form of jnp.concatenate(full_res_xs, -1): per (r, s) block the
    original channels of every input, in order. Pure reshape + concat on
    the minor axis — no spatial shuffle."""
    b, hp, wp, _ = xs[0].shape
    views = [x.reshape(b, hp, wp, 4, x.shape[-1] // 4) for x in xs]
    return jnp.concatenate(views, axis=-1).reshape(b, hp, wp, -1)


def assemble_packed_conv3x3(kernel):
    """(3, 3, Cin, Cout) -> (3, 3, 4Cin, 4Cout) packed-domain kernel.

    Output sub-channel block (r, s, co) at packed position (p, q) equals the
    full-res conv output at (2p + r, 2q + s): tap (a, b) of the original
    kernel reads full-res (2p + r - 1 + a, ...) which lives in packed row
    p + dp, sub-row rp where r - 1 + a = 2*dp + rp.
    """
    cin, cout = kernel.shape[2], kernel.shape[3]
    k3 = jnp.zeros((3, 3, 4 * cin, 4 * cout), kernel.dtype)
    for r in (0, 1):
        for s in (0, 1):
            for a in range(3):
                dp, rp = divmod(r - 1 + a, 2)
                for b_ in range(3):
                    dq, sp = divmod(s - 1 + b_, 2)
                    ci = (rp * 2 + sp) * cin
                    co = (r * 2 + s) * cout
                    k3 = k3.at[dp + 1, dq + 1, ci:ci + cin,
                               co:co + cout].set(kernel[a, b_])
    return k3


def assemble_skip_conv4x4(kernel):
    """(3, 3, Cin, Cout) -> (4, 4, Cin, 4Cout) stride-2 full-res kernel
    emitting packed output directly.

    Output sub-channel block (r, s, co) at packed position (p, q) equals
    the full-res reflect-pad conv output at (2p + r, 2q + s): tap (a, b) of
    the original kernel reads PADDED full-res row 2p + (r + a), col
    2q + (s + b) — i.e. 4x4 tap position (r + a, s + b) of a stride-2
    window anchored at (2p, 2q). So the original 3x3 kernel lands at offset
    (r, s) inside the 4x4 envelope of output block (r, s); the remaining 7
    tap-slots are zero."""
    cin, cout = kernel.shape[2], kernel.shape[3]
    k4 = jnp.zeros((4, 4, cin, 4 * cout), kernel.dtype)
    for r in (0, 1):
        for s in (0, 1):
            co = (r * 2 + s) * cout
            k4 = k4.at[r:r + 3, s:s + 3, :, co:co + cout].set(kernel)
    return k4


def packed_skip_conv3x3(skip, kernel):
    """Reflect-pad(1) 3x3 stride-1 conv on a FULL-RES input, emitting the
    space-to-depth packed result directly — one (4, 4, Cin, 4Cout) stride-2
    dense conv on the reflect-padded input.

    Exactly ``space_to_depth(conv3x3_reflect(skip, kernel))`` but (a) the
    6-D s2d transpose never touches the activation (forward or backward —
    those copies were the largest single seam of the packed decoder tail in
    the r5 HEAD trace), and (b) FLOPs are 16/9 of nominal instead of the 4x
    paid by s2d + packed_conv3x3 (the 4x4 envelope holds the 9 taps once,
    while packing multiplies Cin by 4). Used for the U-Net skip join at the
    packed decoder levels: the skip stays in the encoder's full-res layout
    and its slice of the conv runs here, summed with the packed_conv3x3 of
    the packed operand (conv is linear in its input channels).
    """
    k4 = assemble_skip_conv4x4(kernel)
    xp = _pad1_dus(skip, "reflect")
    return jax.lax.conv_general_dilated(
        xp, k4, window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def packed_conv3x3(xp, kernel):
    """Reflect-pad(1) 3x3 stride-1 conv, evaluated in packed layout.

    xp: (B, Hp, Wp, 4Cin) packed input; kernel: (3, 3, Cin, Cout) original
    full-resolution conv weights. Returns packed (B, Hp, Wp, 4Cout).
    """
    k3 = assemble_packed_conv3x3(kernel)
    xp = _pad1_dus(xp, "edge")
    return jax.lax.conv_general_dilated(
        xp, k3, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
