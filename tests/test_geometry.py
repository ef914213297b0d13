"""Golden-value and torch-oracle tests for ops.geometry (reference layer L1,
`/root/reference/layers.py:74-264`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from unsupervised_pose_estimation_tpu.ops import geometry as G


def test_disp_to_depth_endpoints():
    # sigmoid output 0 -> max_depth, 1 -> min_depth (layers.py:85-94)
    scaled, depth = G.disp_to_depth(jnp.array([0.0, 1.0]), 0.1, 150.0)
    np.testing.assert_allclose(depth, [150.0, 0.1], rtol=1e-6)
    np.testing.assert_allclose(scaled, [1 / 150.0, 10.0], rtol=1e-6)


def test_disp_depth_roundtrip():
    disp = jnp.linspace(0.01, 0.99, 17)
    scaled, depth = G.disp_to_depth(disp, 0.1, 150.0)
    np.testing.assert_allclose(scaled * depth, 1.0, rtol=1e-5)


def test_depth_to_disp_matches_reference_formula():
    depth_norm = jnp.linspace(0.0, 1.0, 11)
    scaled_depth, disp = G.depth_to_disp(depth_norm)
    # layers.py:74-83 with min_disp=1e-5, max_disp=1.000001
    min_depth = 1 / 1.000001
    max_depth = 1 / 0.00001
    expect = min_depth + (max_depth - min_depth) * np.asarray(depth_norm)
    np.testing.assert_allclose(scaled_depth, expect, rtol=1e-6)
    np.testing.assert_allclose(disp, 1.0 / expect, rtol=1e-6)


def _torch_rot_from_axisangle(vec):
    """Oracle: Rodrigues per layers.py:133-172, computed with torch ops."""
    vec = torch.as_tensor(vec)[:, None, :]  # B,1,3
    angle = torch.norm(vec, 2, 2, True)
    axis = vec / (angle + 1e-7)
    ca, sa = torch.cos(angle), torch.sin(angle)
    C = 1 - ca
    x = axis[..., 0].unsqueeze(1)
    y = axis[..., 1].unsqueeze(1)
    z = axis[..., 2].unsqueeze(1)
    xs, ys, zs = x * sa, y * sa, z * sa
    xC, yC, zC = x * C, y * C, z * C
    xyC, yzC, zxC = x * yC, y * zC, z * xC
    rot = torch.zeros((vec.shape[0], 4, 4), dtype=vec.dtype)
    rot[:, 0, 0] = torch.squeeze(x * xC + ca)
    rot[:, 0, 1] = torch.squeeze(xyC - zs)
    rot[:, 0, 2] = torch.squeeze(zxC + ys)
    rot[:, 1, 0] = torch.squeeze(xyC + zs)
    rot[:, 1, 1] = torch.squeeze(y * yC + ca)
    rot[:, 1, 2] = torch.squeeze(yzC - xs)
    rot[:, 2, 0] = torch.squeeze(zxC - ys)
    rot[:, 2, 1] = torch.squeeze(yzC + xs)
    rot[:, 2, 2] = torch.squeeze(z * zC + ca)
    rot[:, 3, 3] = 1
    return rot.numpy()


def test_rot_from_axisangle_matches_rodrigues(rng_np):
    vec = rng_np.normal(size=(5, 3)).astype(np.float32) * 0.3
    ours = np.asarray(G.rot_from_axisangle(jnp.asarray(vec)))
    oracle = _torch_rot_from_axisangle(vec)
    np.testing.assert_allclose(ours, oracle, atol=1e-6)


def test_rotation_is_orthonormal(rng_np):
    vec = rng_np.normal(size=(4, 3)).astype(np.float32)
    R = np.asarray(G.rot_from_axisangle(jnp.asarray(vec)))[:, :3, :3]
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.eye(3)[None].repeat(4, 0), atol=1e-5)


def test_transformation_invert_composes_to_identity(rng_np):
    aa = rng_np.normal(size=(3, 3)).astype(np.float32) * 0.2
    t = rng_np.normal(size=(3, 3)).astype(np.float32) * 0.5
    fwd = np.asarray(G.transformation_from_parameters(aa, t, invert=False))
    bwd = np.asarray(G.transformation_from_parameters(aa, t, invert=True))
    np.testing.assert_allclose(
        fwd @ bwd, np.eye(4)[None].repeat(3, 0), atol=1e-5)


def test_backproject_project_roundtrip(rng_np):
    """Projecting backprojected points with T=I must return the pixel grid
    (layers.py:210-264 round-trip)."""
    b, h, w = 2, 8, 12
    K = np.eye(4, dtype=np.float32)[None].repeat(b, 0)
    K[:, 0, 0], K[:, 1, 1] = 0.8 * w, 1.1 * h
    K[:, 0, 2], K[:, 1, 2] = 0.5 * w, 0.5 * h
    inv_K = np.linalg.inv(K)
    depth = (rng_np.uniform(1.0, 10.0, size=(b, h, w, 1))).astype(np.float32)

    points = G.backproject(jnp.asarray(depth), jnp.asarray(inv_K))
    assert points.shape == (b, 4, h * w)
    T = jnp.asarray(np.eye(4, dtype=np.float32)[None].repeat(b, 0))
    pix = G.project(points, jnp.asarray(K), T, h, w)

    xs, ys = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    gx = (xs / (w - 1) - 0.5) * 2
    gy = (ys / (h - 1) - 0.5) * 2
    expect = np.stack([gx, gy], -1)[None].repeat(b, 0)
    np.testing.assert_allclose(np.asarray(pix), expect, atol=1e-4)

    # planar form is the same values as (B, 2, H, W) planes (the layout the
    # hot path plumbs into the warp kernels)
    pix_p = G.project(points, jnp.asarray(K), T, h, w, planar=True)
    assert pix_p.shape == (b, 2, h, w)
    np.testing.assert_array_equal(
        np.asarray(pix_p), np.asarray(pix).transpose(0, 3, 1, 2))

    # non-homogeneous fast path: implicit ones row, translation added
    # post-matmul — same values up to f32 reduction order (4-term dot vs
    # 3-term dot + add)
    pts3 = G.backproject(jnp.asarray(depth), jnp.asarray(inv_K),
                         homogeneous=False)
    assert pts3.shape == (b, 3, h * w)
    np.testing.assert_array_equal(np.asarray(pts3), np.asarray(points)[:, :3])
    R = np.eye(4, dtype=np.float32)
    R[:3, 3] = (0.3, -0.2, 0.15)
    Tt = jnp.asarray(R[None].repeat(b, 0))
    pix4 = G.project(points, jnp.asarray(K), Tt, h, w, planar=True)
    pix3 = G.project(pts3, jnp.asarray(K), Tt, h, w, planar=True)
    np.testing.assert_allclose(np.asarray(pix3), np.asarray(pix4),
                               rtol=1e-6, atol=1e-6)


def test_backproject_matches_torch_formulation(rng_np):
    """Cross-check against the reference's matmul chain using torch ops."""
    b, h, w = 2, 6, 7
    K = np.eye(4, dtype=np.float32)[None].repeat(b, 0)
    K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2] = 5.0, 4.0, 3.5, 3.0
    inv_K = np.linalg.inv(K)
    depth = rng_np.uniform(0.5, 5.0, size=(b, h, w, 1)).astype(np.float32)

    ours = np.asarray(G.backproject(jnp.asarray(depth), jnp.asarray(inv_K)))

    # Oracle per layers.py:234-239
    mesh = np.meshgrid(range(w), range(h), indexing="xy")
    id_coords = np.stack(mesh, 0).astype(np.float32)
    pix = np.concatenate(
        [id_coords.reshape(2, -1), np.ones((1, h * w), np.float32)], 0)
    pix_t = torch.from_numpy(pix)[None].repeat(b, 1, 1)
    cam = torch.matmul(torch.from_numpy(inv_K[:, :3, :3]), pix_t)
    cam = torch.from_numpy(depth.reshape(b, 1, -1)) * cam
    ones = torch.ones(b, 1, h * w)
    oracle = torch.cat([cam, ones], 1).numpy()
    np.testing.assert_allclose(ours, oracle, atol=1e-5)


def test_scaled_and_inverted_intrinsics():
    K_norm = np.zeros((1, 4, 4), np.float32)
    K_norm[0] = [[0.635, 0, 0.48, 0], [0, 0.634, 0.50, 0],
                 [0, 0, 1, 0], [0, 0, 0, 1]]
    w, h = 192, 192
    for s in range(4):
        Ks = np.asarray(G.scaled_intrinsics(jnp.asarray(K_norm), w, h, s))
        # Oracle per mono_dataset2.py:167-173
        expect = K_norm[0].copy()
        expect[0, :] *= w // (2 ** s)
        expect[1, :] *= h // (2 ** s)
        np.testing.assert_allclose(Ks[0], expect, rtol=1e-6)
        inv = np.asarray(G.invert_intrinsics(jnp.asarray(Ks)))
        np.testing.assert_allclose(inv[0], np.linalg.pinv(expect), atol=1e-5)


def test_project_grad_is_finite(rng_np):
    b, h, w = 1, 4, 5
    K = np.eye(4, dtype=np.float32)[None]
    K[:, 0, 0] = K[:, 1, 1] = 4.0
    depth = rng_np.uniform(1, 2, size=(b, h, w, 1)).astype(np.float32)

    def f(d):
        pts = G.backproject(d, jnp.asarray(np.linalg.inv(K)))
        pix = G.project(pts, jnp.asarray(K), jnp.eye(4)[None], h, w)
        return jnp.sum(pix ** 2)

    g = jax.grad(f)(jnp.asarray(depth))
    assert np.all(np.isfinite(np.asarray(g)))
