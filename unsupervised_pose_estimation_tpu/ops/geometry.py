"""Camera geometry ops: disparity<->depth, SE(3) exponentials, back-projection
and projection.

Functional re-design of the reference's geometry layer
(`/root/reference/layers.py:74-264`). Unlike the reference, nothing here bakes
the batch size into buffers (ref `layers.py:216-232` allocates per-batch pixel
grids as nn.Parameters); pixel grids are trace-time constants closed over shape,
so the same function jits for any batch and shards over a mesh.

Layouts are TPU-native NHWC. All ops are pure jnp: the per-pixel 3x3/4x4
matmuls are tiny relative to the conv FLOPs and fuse into neighbouring
elementwise HLOs under XLA; the only irregular op (bilinear gather) lives in
``warp.py``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# The 3x3/4x4 camera matmuls are a vanishing fraction of step FLOPs but feed
# the warp coordinates, so keep them in full fp32 even on the TPU MXU (whose
# default matmul precision is bf16).
_HIGHEST = jax.lax.Precision.HIGHEST


def disp_to_depth(disp, min_depth, max_depth):
    """Convert a network sigmoid output in [0,1] into (scaled_disp, depth).

    Matches `/root/reference/layers.py:85-94`: linearly maps disp into
    [1/max_depth, 1/min_depth] and inverts.
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def depth_to_disp(depth, min_disp=0.00001, max_disp=1.000001):
    """Inverse mapping used by the GAN-prior path.

    Matches `/root/reference/layers.py:74-83` (argument is a normalized depth
    in [0,1]; returns (scaled_depth, disp)).
    """
    min_depth = 1.0 / max_disp
    max_depth = 1.0 / min_disp
    scaled_depth = min_depth + (max_depth - min_depth) * depth
    disp = 1.0 / scaled_depth
    return scaled_depth, disp


def rot_from_axisangle(vec):
    """Axis-angle (B, 3) -> rotation as a (B, 4, 4) homogeneous matrix.

    Rodrigues formula, matching `/root/reference/layers.py:133-172` including
    the 1e-7 guard on the angle norm.
    """
    vec = jnp.asarray(vec)
    angle = jnp.linalg.norm(vec, axis=-1, keepdims=True)  # (B, 1)
    axis = vec / (angle + 1e-7)

    ca = jnp.cos(angle)[..., 0]
    sa = jnp.sin(angle)[..., 0]
    c = 1.0 - ca

    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]

    xs, ys, zs = x * sa, y * sa, z * sa
    xc, yc, zc = x * c, y * c, z * c
    xyc, yzc, zxc = x * yc, y * zc, z * xc

    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)

    rot = jnp.stack(
        [
            x * xc + ca, xyc - zs,    zxc + ys,    zeros,
            xyc + zs,    y * yc + ca, yzc - xs,    zeros,
            zxc - ys,    yzc + xs,    z * zc + ca, zeros,
            zeros,       zeros,       zeros,       ones,
        ],
        axis=-1,
    )
    return rot.reshape(vec.shape[:-1] + (4, 4))


def get_translation_matrix(translation):
    """Translation (B, 3) -> (B, 4, 4) homogeneous matrix.

    Matches `/root/reference/layers.py:117-130`.
    """
    translation = jnp.asarray(translation)
    eye = jnp.broadcast_to(jnp.eye(4, dtype=translation.dtype),
                           translation.shape[:-1] + (4, 4))
    return eye.at[..., :3, 3].set(translation)


def transformation_from_parameters(axisangle, translation, invert=False):
    """(axis-angle, translation) -> (B, 4, 4) SE(3) matrix.

    Matches `/root/reference/layers.py:97-114`: forward frames compose T @ R,
    inverted frames compose R^T @ (-t).
    """
    rot = rot_from_axisangle(axisangle)
    if invert:
        rot = jnp.swapaxes(rot, -1, -2)
        translation = -translation
    trans = get_translation_matrix(translation)
    if invert:
        return jnp.matmul(rot, trans, precision=_HIGHEST)
    return jnp.matmul(trans, rot, precision=_HIGHEST)


@functools.lru_cache(maxsize=None)
def _pixel_grid_np(height: int, width: int):
    import numpy as np

    xs, ys = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    grid = np.stack([xs.ravel(), ys.ravel(), np.ones(height * width)], 0)
    return grid.astype(np.float32)  # (3, H*W)


def pixel_grid(height: int, width: int, dtype=jnp.float32):
    """Homogeneous pixel coordinate grid, shape (3, H*W).

    Trace-time constant; replaces the batch-baked buffers of the reference's
    BackprojectDepth (`/root/reference/layers.py:220-232`).
    """
    return jnp.asarray(_pixel_grid_np(height, width), dtype=dtype)


def backproject(depth, inv_K, homogeneous: bool = True):
    """Depth map -> homogeneous camera-frame point cloud.

    Args:
      depth: (B, H, W, 1) NHWC depth.
      inv_K: (B, 4, 4) inverse intrinsics.
      homogeneous: append the constant ones row (the reference's contract).
        With False, returns (B, 3, H*W) and :func:`project` adds the
        translation column directly — skips materializing (and
        backpropagating through) a fourth plane that is constant anyway.

    Returns:
      (B, 4, H*W) homogeneous points, matching
      `/root/reference/layers.py:234-239` (or (B, 3, H*W), see above).
    """
    b, h, w, _ = depth.shape
    grid = pixel_grid(h, w, dtype=depth.dtype)  # (3, HW)
    rays = jnp.einsum("bij,jn->bin", inv_K[:, :3, :3], grid,
                      precision=_HIGHEST)  # (B, 3, HW)
    points = depth.reshape(b, 1, h * w) * rays
    if not homogeneous:
        return points
    ones = jnp.ones((b, 1, h * w), dtype=depth.dtype)
    return jnp.concatenate([points, ones], axis=1)


def project(points, K, T, height: int, width: int, eps: float = 1e-7,
            planar: bool = False):
    """Project camera-frame points through pose T and intrinsics K to
    normalized [-1, 1] sampling coordinates.

    Args:
      points: (B, 4, H*W) homogeneous points (from :func:`backproject`), or
        (B, 3, H*W) with the ones row implicit (backproject(homogeneous=
        False)) — the translation column is then added post-matmul, same
        math without the constant fourth plane.
      K, T: (B, 4, 4).
      planar: return (B, 2, H, W) with x/y as separate planes instead of the
        channel-last (B, H, W, 2). A trailing dim of 2 tiles pathologically
        on TPU (padded to (8, 128) lanes, then transposed away by every
        consumer); the planar form is a free reshape off the matmul and is
        what the warp kernels slice into anyway.

    Returns:
      pix_coords in [-1, 1], matching `/root/reference/layers.py:253-264`
      (align_corners=True convention: -1 and +1 map to pixel centers 0 and
      W-1/H-1). Shape (B, H, W, 2), or (B, 2, H, W) with ``planar``.
    """
    P = jnp.matmul(K, T, precision=_HIGHEST)[:, :3, :]  # (B, 3, 4)
    if points.shape[1] == 3:
        cam = jnp.einsum("bij,bjn->bin", P[:, :, :3], points,
                         precision=_HIGHEST) + P[:, :, 3:4]  # (B, 3, HW)
    else:
        cam = jnp.einsum("bij,bjn->bin", P, points,
                         precision=_HIGHEST)  # (B, 3, HW)
    xy = cam[:, :2] / (cam[:, 2:3] + eps)
    b = points.shape[0]
    scale = jnp.asarray([width - 1, height - 1], dtype=points.dtype)
    if planar:
        pix = xy.reshape(b, 2, height, width)
        return (pix / scale[:, None, None] - 0.5) * 2.0
    pix = xy.reshape(b, 2, height, width).transpose(0, 2, 3, 1)  # (B,H,W,2)
    return (pix / scale - 0.5) * 2.0


def scaled_intrinsics(K_norm, width: int, height: int, scale: int):
    """Resolution-normalized K (B, 4, 4) -> pixel-unit K at pyramid level
    ``scale``.

    The reference scales K on the host per item
    (`/root/reference/datasets/mono_dataset2.py:167-177`); we do it on device,
    closed-form, so the host ships a single normalized K per example.
    """
    w = width // (2 ** scale)
    h = height // (2 ** scale)
    mult = jnp.ones((4,), K_norm.dtype).at[0].set(w).at[1].set(h)
    return K_norm * mult[None, :, None]


def invert_intrinsics(K):
    """Closed-form inverse of a pinhole intrinsics matrix (B, 4, 4).

    Equivalent to the reference's np.linalg.pinv on the padded K
    (`/root/reference/datasets/mono_dataset2.py:173`) but exact and
    device-side.
    """
    fx = K[:, 0, 0]
    fy = K[:, 1, 1]
    cx = K[:, 0, 2]
    cy = K[:, 1, 2]
    zeros = jnp.zeros_like(fx)
    ones = jnp.ones_like(fx)
    inv = jnp.stack(
        [
            1.0 / fx, zeros,    -cx / fx, zeros,
            zeros,    1.0 / fy, -cy / fy, zeros,
            zeros,    zeros,    ones,     zeros,
            zeros,    zeros,    zeros,    ones,
        ],
        axis=-1,
    )
    return inv.reshape(K.shape[0], 4, 4)
