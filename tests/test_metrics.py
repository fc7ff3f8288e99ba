"""Eval-metric protocol tests (run.py parity, VERDICT r2 Weak #8)."""
import numpy as np

from synerfgine_tpu.eval.metrics import psnr, ssim


def test_psnr_basic():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    assert abs(psnr(a, b) - 20.0) < 1e-6
    assert psnr(a, a) == float("inf")


def test_ssim_identity_and_range():
    rng = np.random.default_rng(3)
    a = rng.random((24, 32, 3))
    assert abs(ssim(a, a) - 1.0) < 1e-9
    b = np.clip(a + 0.2 * rng.standard_normal(a.shape), 0, 1)
    s = ssim(a, b)
    assert 0.0 < s < 1.0


def test_ssim_matches_reference_protocol():
    """Numeric parity with the reference's SSIM math
    (/root/reference/scripts/common.py:186-204): Rec.709 luminance,
    the published 5-tap blur kernel, p1*p2 with c1=0.01^2 c2=0.03^2.
    The published kernel constants are used here as the GOLDEN against
    our sigma-1.5 derivation."""
    from scipy.ndimage import convolve1d

    rng = np.random.default_rng(11)
    a = rng.random((20, 28, 3))
    b = np.clip(a + 0.05 * rng.standard_normal(a.shape), 0, 1)

    def lum(x):
        return 0.2126 * x[:, :, 0] + 0.7152 * x[:, :, 1] + 0.0722 * x[:, :, 2]

    k = np.array([0.120078, 0.233881, 0.292082, 0.233881, 0.120078])

    def blur(x):
        return convolve1d(convolve1d(x, k, axis=0), k, axis=1)

    la, lb = lum(a), lum(b)
    mA, mB = blur(la), blur(lb)
    sA = blur(la * la) - mA**2
    sB = blur(lb * lb) - mB**2
    sAB = blur(la * lb) - mA * mB
    c1, c2 = 0.01**2, 0.03**2
    golden = np.mean(((2 * mA * mB + c1) / (mA**2 + mB**2 + c1))
                     * ((2 * sAB + c2) / (sA + sB + c2)))
    assert abs(ssim(a, b) - golden) < 1e-4
