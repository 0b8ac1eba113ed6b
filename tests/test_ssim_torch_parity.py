"""Golden parity: our SSIM/L1 vs a torch implementation of the reference's
loss math (/root/reference/utils/loss_utils.py:18-132 semantics: 11x11
Gaussian window sigma 1.5, depthwise conv2d with zero padding k//2)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from grendel_tpu.ops.ssim import ssim, ssim_map, l1_loss, gaussian_window


def _torch_window(size=11, sigma=1.5):
    x = torch.arange(size, dtype=torch.float64) - size // 2
    g = torch.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    w = g[:, None] @ g[None, :]
    return w.float()


def _torch_ssim_map(a, b, size=11):
    # a, b: (C, H, W) torch tensors; reference conv2d zero padding.
    c = a.shape[0]
    w = _torch_window(size).expand(c, 1, size, size).contiguous()
    a = a[None]
    b = b[None]
    pad = size // 2
    mu1 = F.conv2d(a, w, padding=pad, groups=c)
    mu2 = F.conv2d(b, w, padding=pad, groups=c)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = F.conv2d(a * a, w, padding=pad, groups=c) - mu1_sq
    s2 = F.conv2d(b * b, w, padding=pad, groups=c) - mu2_sq
    s12 = F.conv2d(a * b, w, padding=pad, groups=c) - mu12
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    return (((2 * mu12 + c1) * (2 * s12 + c2))
            / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)))[0]


def test_window_matches_torch():
    np.testing.assert_allclose(
        np.asarray(gaussian_window()), _torch_window().numpy(), atol=1e-7)


def test_ssim_map_matches_torch():
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(3, 40, 56)).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.1, size=a.shape), 0, 1).astype(np.float32)
    ours = np.asarray(ssim_map(jnp.asarray(a), jnp.asarray(b)))
    ref = _torch_ssim_map(torch.tensor(a), torch.tensor(b)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_scalar_ssim_and_l1_match_torch():
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(3, 33, 47)).astype(np.float32)
    b = rng.uniform(size=(3, 33, 47)).astype(np.float32)
    ours_ssim = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref_ssim = float(_torch_ssim_map(torch.tensor(a), torch.tensor(b)).mean())
    np.testing.assert_allclose(ours_ssim, ref_ssim, atol=2e-5)
    ours_l1 = float(l1_loss(jnp.asarray(a), jnp.asarray(b)))
    ref_l1 = float((torch.tensor(a) - torch.tensor(b)).abs().mean())
    np.testing.assert_allclose(ours_l1, ref_l1, rtol=1e-6)
