"""Image utilities: PSNR, SSIM, gaussian-prefiltered resize, grid concat, IO.

Replaces the reference's skimage/cv2 dependencies with numpy/scipy/PIL
implementations:
  * PSNR — 255-scale MSE formula (parity: reference network/metrics.py:11-17).
  * SSIM — uniform 11x11 window, unbiased covariance, border crop; matches
    skimage.metrics.structural_similarity(win_size=11, data_range=255,
    channel_axis=2) as used at reference network/metrics.py:50-51.
  * downsample_gaussian_blur + resize — gaussian prefilter with the
    cv2-compatible sigma/ksize rule (reference utils/base_utils.py:119-125),
    bilinear resample.
  * concat_images_list — side-by-side grids for validation vis JPEGs
    (reference utils/draw_utils.py:160-184).
"""
from __future__ import annotations

import numpy as np
from scipy.ndimage import uniform_filter


def compute_psnr(img_gt: np.ndarray, img_pr: np.ndarray) -> float:
    """PSNR on uint8-scale images ([0,255]); inputs any shape ending in 3."""
    gt = img_gt.reshape(-1, 3).astype(np.float32)
    pr = img_pr.reshape(-1, 3).astype(np.float32)
    mse = float(np.mean((gt - pr) ** 2))
    return 10.0 * np.log10(255.0 * 255.0 / max(mse, 1e-12))


def compute_ssim(img_gt: np.ndarray, img_pr: np.ndarray, win_size: int = 11,
                 data_range: float = 255.0) -> float:
    """Mean SSIM, uniform window, per-channel then averaged."""
    gt = img_gt.astype(np.float64)
    pr = img_pr.astype(np.float64)
    if gt.ndim == 2:
        gt = gt[..., None]
        pr = pr[..., None]

    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    npix = win_size ** 2
    cov_norm = npix / (npix - 1)  # unbiased covariance
    pad = (win_size - 1) // 2

    vals = []
    for c in range(gt.shape[-1]):
        x, y = gt[..., c], pr[..., c]
        ux = uniform_filter(x, win_size)
        uy = uniform_filter(y, win_size)
        uxx = uniform_filter(x * x, win_size)
        uyy = uniform_filter(y * y, win_size)
        uxy = uniform_filter(x * y, win_size)
        vx = cov_norm * (uxx - ux * ux)
        vy = cov_norm * (uyy - uy * uy)
        vxy = cov_norm * (uxy - ux * uy)
        a1 = 2 * ux * uy + c1
        a2 = 2 * vxy + c2
        b1 = ux ** 2 + uy ** 2 + c1
        b2 = vx + vy + c2
        s = (a1 * a2) / (b1 * b2)
        vals.append(s[pad:-pad, pad:-pad].mean())
    return float(np.mean(vals))


def _gaussian_kernel1d(sigma: float, ksize: int) -> np.ndarray:
    r = (ksize - 1) // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def gaussian_blur(img: np.ndarray, ksize: int, sigma: float) -> np.ndarray:
    """Separable gaussian blur with reflect-101 borders (cv2-compatible)."""
    k = _gaussian_kernel1d(sigma, ksize)
    r = (ksize - 1) // 2
    out = img.astype(np.float64)
    # pad reflect-101 (mirror without repeating the edge sample)
    out = np.pad(out, [(r, r), (r, r)] + [(0, 0)] * (img.ndim - 2), mode="reflect")
    out = np.apply_along_axis(lambda m: np.convolve(m, k, mode="valid"), 0, out)
    out = np.apply_along_axis(lambda m: np.convolve(m, k, mode="valid"), 1, out)
    return out.astype(img.dtype) if np.issubdtype(img.dtype, np.floating) else \
        np.clip(out + 0.5, 0, 255).astype(img.dtype)


def downsample_gaussian_blur(img: np.ndarray, ratio: float) -> np.ndarray:
    """Anti-alias prefilter before downsampling by `ratio` (<1)."""
    sigma = (1.0 / ratio) / 3.0
    ksize = int(np.ceil(((sigma - 0.8) / 0.3 + 1) * 2 + 1))
    ksize = ksize + 1 if ksize % 2 == 0 else ksize
    return gaussian_blur(img, ksize, sigma)


def resize_bilinear(img: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Bilinear resize via PIL (per channel for float inputs)."""
    from PIL import Image
    h, w = out_hw
    if img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] in (3, 4):
        return np.asarray(Image.fromarray(img).resize((w, h), Image.BILINEAR))
    img2 = img[..., None] if img.ndim == 2 else img
    chans = [np.asarray(Image.fromarray(img2[..., c].astype(np.float32), mode="F")
                        .resize((w, h), Image.BILINEAR)) for c in range(img2.shape[2])]
    out = np.stack(chans, axis=-1).astype(img.dtype)
    return out[..., 0] if img.ndim == 2 else out


def resize_img(img: np.ndarray, ratio: float) -> np.ndarray:
    """Gaussian-prefiltered resize by a scale ratio (reference resize_img)."""
    h, w = img.shape[:2]
    hn, wn = int(round(h * ratio)), int(round(w * ratio))
    src = downsample_gaussian_blur(img, ratio) if ratio < 1.0 else img
    return resize_bilinear(src, (hn, wn))


def warp_perspective(img: np.ndarray, H: np.ndarray, out_wh: tuple[int, int]) -> np.ndarray:
    """Homography warp (dst(x,y) = src(H^-1 [x,y,1])), bilinear, zeros outside.

    cv2.warpPerspective-compatible pixel-grid convention (no half-pixel shift).
    """
    from scipy.ndimage import map_coordinates
    w, h = out_wh
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    ones = np.ones_like(xs)
    Hinv = np.linalg.inv(np.asarray(H, np.float64))
    denom = Hinv[2, 0] * xs + Hinv[2, 1] * ys + Hinv[2, 2]
    sx = (Hinv[0, 0] * xs + Hinv[0, 1] * ys + Hinv[0, 2]) / denom
    sy = (Hinv[1, 0] * xs + Hinv[1, 1] * ys + Hinv[1, 2]) / denom
    img2 = img[..., None] if img.ndim == 2 else img
    out = np.stack([map_coordinates(img2[..., c].astype(np.float64),
                                    [sy, sx], order=1, mode="constant", cval=0.0)
                    for c in range(img2.shape[2])], axis=-1)
    if np.issubdtype(img.dtype, np.integer):
        out = np.clip(out + 0.5, 0, np.iinfo(img.dtype).max).astype(img.dtype)
    else:
        out = out.astype(img.dtype)
    return out[..., 0] if img.ndim == 2 else out


def concat_images(img0: np.ndarray, img1: np.ndarray, vert: bool = False) -> np.ndarray:
    if not vert:
        h0, h1 = img0.shape[0], img1.shape[0]
        if h0 < h1:
            img0 = np.pad(img0, [(0, h1 - h0)] + [(0, 0)] * (img0.ndim - 1))
        if h1 < h0:
            img1 = np.pad(img1, [(0, h0 - h1)] + [(0, 0)] * (img1.ndim - 1))
        return np.concatenate([img0, img1], axis=1)
    w0, w1 = img0.shape[1], img1.shape[1]
    if w0 < w1:
        img0 = np.pad(img0, [(0, 0), (0, w1 - w0)] + [(0, 0)] * (img0.ndim - 2))
    if w1 < w0:
        img1 = np.pad(img1, [(0, 0), (0, w0 - w1)] + [(0, 0)] * (img1.ndim - 2))
    return np.concatenate([img0, img1], axis=0)


def concat_images_list(*imgs, vert: bool = False) -> np.ndarray:
    if len(imgs) == 1:
        return imgs[0]
    out = imgs[0]
    for img in imgs[1:]:
        out = concat_images(out, img, vert)
    return out


def imread(path: str) -> np.ndarray:
    import imageio.v2 as iio
    return np.asarray(iio.imread(path))


def imsave(path: str, img: np.ndarray):
    import imageio.v2 as iio
    iio.imwrite(path, img)
