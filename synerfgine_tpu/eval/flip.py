"""FLIP-style perceptual image difference.

Capability match for scripts/flip (NVIDIA LDR-ꟻLIP): a perceptual
difference map combining a color pipeline (opponent color space, contrast-
sensitivity spatial filtering, hue-angle/lightness difference) with an
edge/point feature difference that amplifies structural mismatches, at a
given viewing condition (pixels per degree).

This is a faithful re-derivation of the published algorithm's structure;
constants follow the FLIP paper (Andersson et al. 2020). Exact numeric
parity with the reference's vendored implementation is not claimed — the
metric is monotone in the same perceptual error directions and returns
values in [0, 1].
"""
from __future__ import annotations

import numpy as np
from scipy.ndimage import convolve1d


def _srgb_to_linear(c):
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_to_xyz(rgb):
    M = np.array([
        [0.4124, 0.3576, 0.1805],
        [0.2126, 0.7152, 0.0722],
        [0.0193, 0.1192, 0.9505],
    ])
    return rgb @ M.T


def _xyz_to_ycxcz(xyz):
    # reference white D65
    w = np.array([0.9505, 1.0, 1.0888])
    x, y, z = xyz[..., 0] / w[0], xyz[..., 1] / w[1], xyz[..., 2] / w[2]
    return np.stack([116 * y - 16, 500 * (x - y), 200 * (y - z)], -1)


def _gauss1d(sigma_px):
    r = max(1, int(np.ceil(3 * sigma_px)))
    x = np.arange(-r, r + 1)
    g = np.exp(-(x**2) / (2 * sigma_px**2))
    return g / g.sum()


def _blur(img, sigma_px):
    for ax in (0, 1):
        img = convolve1d(img, _gauss1d(sigma_px), axis=ax, mode="nearest")
    return img


def _hunt(lab_l, c):
    return 0.01 * lab_l * c


def flip(reference: np.ndarray, test: np.ndarray,
         pixels_per_degree: float = 67.0) -> dict:
    """reference/test: (H, W, 3) sRGB in [0, 1]. Returns
    {"map": (H, W), "mean": float}."""
    ref = np.clip(np.asarray(reference, np.float64), 0, 1)
    tst = np.clip(np.asarray(test, np.float64), 0, 1)

    # --- color pipeline: YCxCz, CSF-inspired per-channel blur
    def prep(img):
        return _xyz_to_ycxcz(_linear_to_xyz(_srgb_to_linear(img)))

    yr, yt = prep(ref), prep(tst)
    # CSF cutoffs (cycles/deg) per channel -> Gaussian sigmas in pixels
    sigmas_cpd = {0: 0.0047, 1: 0.0053, 2: 0.04}  # A, RG, BY (paper-ish)
    filtered_r, filtered_t = np.empty_like(yr), np.empty_like(yt)
    for c, s in sigmas_cpd.items():
        sigma_px = max(np.sqrt(s) * pixels_per_degree, 0.35)
        filtered_r[..., c] = _blur(yr[..., c], sigma_px)
        filtered_t[..., c] = _blur(yt[..., c], sigma_px)

    # HyAB-style difference in the filtered opponent space
    dl = np.abs(filtered_r[..., 0] - filtered_t[..., 0])
    dch = np.sqrt((filtered_r[..., 1] - filtered_t[..., 1]) ** 2
                  + (filtered_r[..., 2] - filtered_t[..., 2]) ** 2)
    hyab = dl + dch
    # normalize: max achievable HyAB between in-gamut colors ~ green->blue
    cmax = 203.0
    color_err = (hyab / cmax) ** 0.7
    color_err = np.clip(color_err, 0.0, 1.0)

    # --- feature pipeline: edge & point differences on achromatic channel
    sigma_f = 0.5 * pixels_per_degree / 15.0
    ya_r = (yr[..., 0] + 16) / 116
    ya_t = (yt[..., 0] + 16) / 116

    def edges_points(y):
        g = _gauss1d(sigma_f)
        r = np.arange(-(len(g) // 2), len(g) // 2 + 1)
        dg = -r / (sigma_f**2) * g          # first derivative
        ddg = (r**2 / sigma_f**4 - 1 / sigma_f**2) * g  # second derivative
        ex = convolve1d(convolve1d(y, dg, axis=1, mode="nearest"), g, axis=0,
                        mode="nearest")
        ey = convolve1d(convolve1d(y, dg, axis=0, mode="nearest"), g, axis=1,
                        mode="nearest")
        px = convolve1d(convolve1d(y, ddg, axis=1, mode="nearest"), g, axis=0,
                        mode="nearest")
        py = convolve1d(convolve1d(y, ddg, axis=0, mode="nearest"), g, axis=1,
                        mode="nearest")
        return np.sqrt(ex**2 + ey**2), np.sqrt(px**2 + py**2)

    er, pr = edges_points(ya_r)
    et, pt = edges_points(ya_t)
    qf = 0.5
    feat_err = np.clip(
        np.maximum(np.abs(er - et), np.abs(pr - pt)) ** qf, 0.0, 1.0)

    flip_map = color_err ** (1.0 - feat_err)
    return {"map": flip_map.astype(np.float32), "mean": float(flip_map.mean())}
