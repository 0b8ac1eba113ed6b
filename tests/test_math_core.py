"""Math-core golden tests: quaternions, camera matrices, SH, SSIM."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from grendel_tpu.utils.math3d import (
    quat_to_rotmat, world_to_view, perspective_projection,
    fov_to_focal, focal_to_fov, inverse_sigmoid,
)
from grendel_tpu.ops.sh import eval_sh, sh_to_rgb, rgb_to_sh, sh_to_rgb_dc, C0
from grendel_tpu.ops.ssim import (
    ssim, ssim_map, l1_loss, gaussian_window, psnr,
    pixelwise_l1_with_mask, pixelwise_ssim_with_mask,
)


class TestQuat:
    def test_identity(self):
        r = quat_to_rotmat(jnp.array([1.0, 0, 0, 0]))
        np.testing.assert_allclose(r, np.eye(3), atol=1e-6)

    def test_orthonormal(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (32, 4))
        r = quat_to_rotmat(q)
        eye = jnp.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(r)), np.ones(32), atol=1e-5)

    def test_z_rotation(self):
        # 90 deg about z: w=cos45, z=sin45
        c = np.cos(np.pi / 4)
        r = np.asarray(quat_to_rotmat(jnp.array([c, 0, 0, c])))
        np.testing.assert_allclose(r @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)

    def test_unnormalized_input(self):
        q = jnp.array([2.0, 0, 0, 0])
        np.testing.assert_allclose(quat_to_rotmat(q), np.eye(3), atol=1e-6)


class TestCameraMatrices:
    def test_world_to_view_identity(self):
        w2v = world_to_view(np.eye(3), np.zeros(3))
        np.testing.assert_allclose(w2v, np.eye(4), atol=1e-6)

    def test_world_to_view_translation(self):
        t = np.array([1.0, 2.0, 3.0])
        w2v = world_to_view(np.eye(3), t)
        p = w2v @ np.array([0.0, 0, 0, 1])
        np.testing.assert_allclose(p[:3], t, atol=1e-6)

    def test_camera_center(self):
        # R = c2w rotation, T = w2c translation: center = -R @ T ... verify via inverse
        rng = np.random.RandomState(0)
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        R = np.asarray(quat_to_rotmat(jnp.asarray(q))).T  # c2w convention
        T = rng.randn(3)
        w2v = world_to_view(R, T)
        center = np.linalg.inv(w2v)[:3, 3]
        p = w2v @ np.append(center, 1.0)
        np.testing.assert_allclose(p[:3], 0.0, atol=1e-5)

    def test_projection_maps_frustum(self):
        znear, zfar = 0.01, 100.0
        fovx = fovy = np.pi / 2  # tan = 1
        P = perspective_projection(znear, zfar, fovx, fovy)
        # point on +z axis at znear maps to ndc z=0 (after divide), at zfar -> 1
        for z, expect in [(znear, 0.0), (zfar, 1.0)]:
            v = P @ np.array([0, 0, z, 1.0])
            np.testing.assert_allclose(v[2] / v[3], expect, atol=1e-4)
        # frustum corner at depth z: x = z*tanfov maps to ndc x=1
        v = P @ np.array([5.0, 0, 5.0, 1.0])
        np.testing.assert_allclose(v[0] / v[3], 1.0, atol=1e-5)

    def test_fov_focal_roundtrip(self):
        assert abs(focal_to_fov(fov_to_focal(1.1, 640), 640) - 1.1) < 1e-6


class TestSH:
    def test_degree0(self):
        sh = jnp.zeros((5, 16, 3)).at[:, 0, :].set(2.0)
        dirs = jnp.tile(jnp.array([[0.0, 0, 1]]), (5, 1))
        np.testing.assert_allclose(eval_sh(0, sh, dirs), 2.0 * C0, atol=1e-6)
        np.testing.assert_allclose(eval_sh(3, sh, dirs), 2.0 * C0, atol=1e-6)

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([[0.2, 0.5, 0.9]])
        np.testing.assert_allclose(sh_to_rgb_dc(rgb_to_sh(rgb)), rgb, atol=1e-6)

    def test_degree1_z_direction(self):
        # dir = +z: only the l=1,m=0 band (index 2) contributes +C1*z
        sh = jnp.zeros((1, 16, 3)).at[0, 2, :].set(1.0)
        dirs = jnp.array([[0.0, 0.0, 1.0]])
        out = eval_sh(1, sh, dirs)
        np.testing.assert_allclose(out, 0.4886025119029199, atol=1e-6)

    def test_clamping(self):
        sh = jnp.zeros((1, 16, 3)).at[0, 0, :].set(-10.0)
        dirs = jnp.array([[0.0, 0.0, 1.0]])
        assert (sh_to_rgb(0, sh, dirs) == 0).all()

    def test_degree_monotone_changes(self):
        rng = jax.random.PRNGKey(1)
        sh = jax.random.normal(rng, (4, 16, 3))
        dirs = jax.random.normal(rng, (4, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        outs = [eval_sh(d, sh, dirs) for d in range(4)]
        for a, b in zip(outs[:-1], outs[1:]):
            assert not np.allclose(a, b)


def _np_ssim(img1, img2, window):
    """Direct numpy SSIM with zero-padded depthwise conv for cross-check."""
    from scipy.signal import convolve2d  # scipy is available with numpy stacks

    def conv(x):
        return np.stack(
            [convolve2d(c, window, mode="same", boundary="fill") for c in x]
        )

    mu1, mu2 = conv(img1), conv(img2)
    s1 = conv(img1 * img1) - mu1 * mu1
    s2 = conv(img2 * img2) - mu2 * mu2
    s12 = conv(img1 * img2) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    )
    return m


class TestSSIM:
    def test_self_similarity(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (3, 32, 40))
        assert float(ssim(img, img)) > 0.9999

    def test_degrades_with_noise(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (3, 32, 32))
        noisy = img + 0.2 * jax.random.normal(jax.random.PRNGKey(1), img.shape)
        assert float(ssim(img, noisy)) < float(ssim(img, img))

    def test_vs_numpy(self):
        pytest.importorskip("scipy")
        rng = np.random.RandomState(0)
        a = rng.rand(3, 24, 24).astype(np.float32)
        b = rng.rand(3, 24, 24).astype(np.float32)
        w = np.asarray(gaussian_window(11))
        expect = _np_ssim(a, b, w)
        got = np.asarray(ssim_map(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_masked_partials_sum_to_global(self):
        # the distributed-loss invariant: disjoint masked partial sums == global
        rng = np.random.RandomState(1)
        a = jnp.asarray(rng.rand(3, 32, 32), dtype=jnp.float32)
        b = jnp.asarray(rng.rand(3, 32, 32), dtype=jnp.float32)
        m1 = jnp.zeros((32, 32)).at[:16].set(1.0)
        m2 = 1.0 - m1
        full = pixelwise_l1_with_mask(a, b, jnp.ones((32, 32))).sum()
        parts = pixelwise_l1_with_mask(a, b, m1).sum() + pixelwise_l1_with_mask(a, b, m2).sum()
        np.testing.assert_allclose(full, parts, rtol=1e-5)

    def test_psnr_known(self):
        a = jnp.zeros((3, 8, 8))
        b = jnp.full((3, 8, 8), 0.1)
        np.testing.assert_allclose(float(psnr(a, b)), 20.0, atol=1e-3)


class TestMisc:
    def test_inverse_sigmoid(self):
        x = jnp.array([0.1, 0.5, 0.9])
        np.testing.assert_allclose(jax.nn.sigmoid(inverse_sigmoid(x)), x, atol=1e-6)

    def test_l1(self):
        assert float(l1_loss(jnp.ones(4), jnp.zeros(4))) == 1.0
