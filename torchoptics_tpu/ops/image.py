"""On-device image formation: spatially-varying convolution, warping, IQ.

Working TPU-native implementation of the reference's image path, which is
broken/dormant there (`image_ops.py` never imports ``fft`` and calls
nonexistent torch APIs — `image_ops.py:54, 65`; the consuming simulator code
is commented out at `optics_simulator_lite.py:272-343`):

* :func:`svola_convolution` — Spatially-Varying OverLap-Add convolution:
  overlapping patches, per-patch FFT convolution with the local PSF, windowed
  recomposition (`image_ops.py:6-98`).
* :func:`interpolate_bicubic` — Keys bicubic (α = −0.75) warp resampler
  (`image_ops.py:109-198`).
* PSF grid interpolation / rotation / resizing and the distortion &
  relative-illumination maps (`optics_simulator_lite.py:580-772`).
* :func:`psnr` / :func:`ssim` image-quality metrics (the reference called
  ``tf.image.psnr/ssim``).

Everything is pure jnp with static shapes: FFT sizes, patch grids, and PSF
shapes resolve at trace time.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def next_fast_fft_len(n: int) -> int:
    """Smallest 2^a·3^b·5^c ≥ n — the sizes XLA:TPU's FFT handles without
    falling back to slow generic (Bluestein) factor paths."""
    best = 1
    while best < n:
        best *= 2
    m = best
    p3 = 1
    while p3 <= best:
        p5 = 1
        while p3 * p5 <= best:
            # smallest power of two lifting p3*p5 over n
            p2 = 1
            while p2 * p3 * p5 < n:
                p2 *= 2
            m = min(m, p2 * p3 * p5)
            p5 *= 5
        p3 *= 3
    return m


def _window(kind: str, n: int) -> np.ndarray:
    xs = np.linspace(0, 1, n + 2)[1:-1]
    if kind == "boxcar":
        return np.ones(n, dtype=np.float32)
    if kind == "hann":
        return (np.sin(np.pi * xs) ** 2).astype(np.float32)
    raise ValueError(f"window_type must be 'boxcar' or 'hann', got {kind!r}")


def svola_convolution(image: jnp.ndarray, overlap_size, psfs: jnp.ndarray,
                      psfs_grid_shape: Tuple[int, int],
                      window_type: str = "boxcar",
                      fft_fast_sizes: bool = False) -> jnp.ndarray:
    """Spatially-Varying OverLap-Add convolution.

    Args:
      image: (B, H, W, C).
      overlap_size: int or (oh, ow) half-overlap between patches.
      psfs: (B, N, kh, kw, C) with N == grid_h * grid_w local kernels
        (odd kh/kw).
      psfs_grid_shape: (grid_h, grid_w).
      window_type: recomposition window, 'boxcar' or 'hann'.

    Returns:
      (B, H, W, C) convolved image.
    """
    if isinstance(overlap_size, int):
        overlap_size = (overlap_size, overlap_size)
    n_img, im_h_orig, im_w_orig, n_channels = image.shape
    n_patches, kh, kw = psfs.shape[1:4]
    assert kh % 2 == 1 and kw % 2 == 1, "PSF kernels must be odd-sized"
    gh, gw = psfs_grid_shape
    assert n_patches == gh * gw

    im_h = im_h_orig + 2 * overlap_size[0]
    im_w = im_w_orig + 2 * overlap_size[1]
    pad_h, pad_w = kh // 2, kw // 2
    tp_h = overlap_size[0] + pad_h
    tp_w = overlap_size[1] + pad_w

    image = jnp.pad(image, ((0, 0), (tp_h, tp_h), (tp_w, tp_w), (0, 0)),
                    mode="symmetric")

    patch_size = (im_h_orig // gh + overlap_size[0] * 2,
                  im_w_orig // gw + overlap_size[1] * 2)

    # Static patch corner grid (reference `image_ops.py:29-39`).
    rows_0 = np.round(np.linspace(0, 1, gh) * (im_h - patch_size[0])).astype(int)
    cols_0 = np.round(np.linspace(0, 1, gw) * (im_w - patch_size[1])).astype(int)
    corners = [(r0, r0 + patch_size[0], c0, c0 + patch_size[1])
               for r0 in rows_0 for c0 in cols_0]

    ph = patch_size[0] + 2 * pad_h
    pw = patch_size[1] + 2 * pad_w
    patches = jnp.stack(
        [image[:, r0:r1 + 2 * pad_h, c0:c1 + 2 * pad_w, :]
         for (r0, r1, c0, c1) in corners], axis=1)  # (B, N, ph, pw, C)

    # FFT convolution per patch with its local PSF. With fft_fast_sizes the
    # transforms run at the next 2^a·3^b·5^c length ≥ the patch size; the
    # region kept below starts at index k-1, so circular wraparound never
    # reaches it for any fft length ≥ the patch (pure zero-pad, bit-exact
    # valid region up to FFT roundoff).
    fh = next_fast_fft_len(ph) if fft_fast_sizes else ph
    fw = next_fast_fft_len(pw) if fft_fast_sizes else pw
    psf_padded = jnp.pad(
        psfs, ((0, 0), (0, 0), (0, ph - kh), (0, pw - kw), (0, 0)))
    f_img = jnp.fft.rfftn(patches, s=(fh, fw), axes=(2, 3))
    f_psf = jnp.fft.rfftn(psf_padded, s=(fh, fw), axes=(2, 3))
    conv = jnp.fft.irfftn(f_img * f_psf, s=(fh, fw), axes=(2, 3))
    # Undo the circular shift introduced by the un-centered kernel.
    conv = jnp.roll(conv, shift=(-pad_h, -pad_w), axis=(2, 3))
    # Crop the kernel padding back to the patch size.
    conv = conv[:, :, pad_h: pad_h + patch_size[0],
                pad_w: pad_w + patch_size[1], :]

    # Windowed recomposition with normalized weights
    # (reference `image_ops.py:68-95`).
    row_w = _window(window_type, patch_size[0])
    col_w = _window(window_type, patch_size[1])
    window = row_w[:, None] * col_w[None, :]
    weights = np.zeros((len(corners), im_h, im_w, 1), dtype=np.float32)
    for i, (r0, r1, c0, c1) in enumerate(corners):
        weights[i, r0:r1, c0:c1, 0] = window
    weights /= weights.sum(axis=0, keepdims=True)

    out = jnp.zeros((n_img, im_h, im_w, n_channels), dtype=conv.dtype)
    for i, (r0, r1, c0, c1) in enumerate(corners):
        w = jnp.asarray(weights[i, r0:r1, c0:c1])
        out = out.at[:, r0:r1, c0:c1, :].add(conv[:, i] * w)

    return out[:, overlap_size[0]: overlap_size[0] + im_h_orig,
               overlap_size[1]: overlap_size[1] + im_w_orig]


# Keys bicubic (α = −0.75) coefficient matrix, shared by every warp path
# in this module (gather, dense-tap, separable): row k dotted with
# (1, t, t², t³) is the weight of neighbor k in the order
# [v0, v0−1, v0+1, v0+2]. Evaluated elementwise — XLA's generic dot is
# reduced-precision on this platform (see CLAUDE.md / ops.abcd._matmul2x2).
_KEYS_ALPHA = -0.75
_KEYS_COEFFS = np.asarray([
    [1, 0, -(_KEYS_ALPHA + 3), (_KEYS_ALPHA + 2)],
    [0, _KEYS_ALPHA, -2 * _KEYS_ALPHA, _KEYS_ALPHA],
    [0, -_KEYS_ALPHA, 2 * _KEYS_ALPHA + 3, -_KEYS_ALPHA - 2],
    [0, 0, _KEYS_ALPHA, -_KEYS_ALPHA]], dtype=np.float64)

# Keys row index for neighbor offset o relative to v0 (neighbor order
# [v0, v0−1, v0+1, v0+2]).
_KEYS_ROW_OF = {0: 0, -1: 1, 1: 2, 2: 3}


def _keys_weights(v, v0):
    """Keys weights [w(0), w(−1), w(+1), w(+2)] at fraction t = v − v0."""
    tv = v - v0
    powers = (jnp.ones_like(tv), tv, tv * tv, tv * tv * tv)
    return [sum(float(_KEYS_COEFFS[i, j]) * powers[j] for j in range(4))
            for i in range(4)]


def _keys_tap_weight(b_map, wk, d, dtype):
    """Weight map of the tap at absolute offset ``d``: the Keys weight of
    whichever of the 4 neighbors (base offset ``b_map`` + o) lands there,
    else 0."""
    w = jnp.zeros(b_map.shape, dtype)
    for o, r in _KEYS_ROW_OF.items():
        w = jnp.where(b_map == d - o, wk[r], w)
    return w


def interpolate_bicubic(im: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                        out_size: Tuple[int, int]) -> jnp.ndarray:
    """Keys bicubic (α = −0.75) gather resampler.

    Args:
      im: (B, H, W, C); x, y: flat sample coordinates in [-1, 1] of length
      B * out_h * out_w (image-major).

    Returns: (B, out_h, out_w, C).

    Reference `image_ops.py:109-198` (whose TF-era indexing bugs — int
    ``.float()``, batch-major base — are fixed here).

    TPU note: the 16 taps are fetched with ONE ``lax.gather`` of 4×4×C
    patches instead of 16 row gathers — TPU gather cost is per *index*, not
    per byte, so this is ~8× faster at 1024² (80 → 10 ms measured,
    `benchmarks/profile_imaging.py`). Edge-padding the operand by (1, 2)
    reproduces the per-neighbor index clamping exactly, and the weighted
    sum keeps the original accumulation order, so results are bit-identical
    to the 16-gather form.
    """
    batch, height, width, channels = im.shape
    out_h, out_w = out_size

    x = jnp.clip(jnp.asarray(x, im.dtype), -1, 1)
    y = jnp.clip(jnp.asarray(y, im.dtype), -1, 1)
    x = (x + 1.0) / 2.0 * (width - 1.0)
    y = (y + 1.0) / 2.0 * (height - 1.0)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)

    wx = _keys_weights(x, x0)
    wy = _keys_weights(y, y0)

    # One SIMPLE row-gather of the whole 4×4×C neighborhood per sample.
    # TPU gather cost is dominated by the per-index slice machinery: 16 row
    # gathers of (R, C) cost 80 ms at 1024² and a multi-dim (1, 4, 4C)
    # slice gather scalarizes to 1.8 s — but one full-row gather of a
    # precomputed (R, 16·C) neighborhood tensor lowers like the fast (R, C)
    # case while fetching all 16 taps at once. The neighborhood tensor is
    # built with 16 static shifted slices of the edge-padded image (pure
    # bandwidth); padding by (1, 2) reproduces the per-neighbor index
    # clamping exactly (the edge replica IS the clamped row/column).
    imp = jnp.pad(im, ((0, 0), (1, 2), (1, 2), (0, 0)), mode="edge")
    nb = jnp.stack(
        [imp[:, dy:dy + height, dx:dx + width, :]
         for dy in range(4) for dx in range(4)], axis=3)  # (B, H, W, 16, C)
    opnd = nb.reshape(batch * height * width, 16 * channels)
    npix = x.shape[0]
    b_idx = (jnp.arange(batch, dtype=jnp.int32)[:, None]
             .repeat(out_h * out_w, axis=1).reshape(-1))
    starts = (b_idx * (height * width)
              + y0.astype(jnp.int32) * width
              + x0.astype(jnp.int32))[:, None]            # (N, 1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(0,), collapsed_slice_dims=(0,), start_index_map=(0,))
    patch = jax.lax.gather(
        opnd, starts, dnums, slice_sizes=(1, 16 * channels),
        mode=jax.lax.GatherScatterMode.CLIP)              # (16C, N): N minor
    patch = patch.reshape(16, channels, npix)

    # Neighborhood slot (dy, dx) = offsets (dy-1, dx-1); the original
    # neighbor order was [v0, v0-1, v0+1, v0+2] with weights
    # [w0, w1, w2, w3] for offsets [0, -1, +1, +2] — slot map [1, 0, 2, 3].
    slot = (1, 0, 2, 3)
    out = jnp.zeros((channels, npix), dtype=im.dtype)
    for i in range(4):
        x_interp = jnp.zeros((channels, npix), dtype=im.dtype)
        for j in range(4):
            x_interp = x_interp + wx[j] * patch[slot[i] * 4 + slot[j]]
        out = out + wy[i] * x_interp
    return jnp.transpose(out).reshape(batch, out_h, out_w, channels)


def apply_distortion_by_warping(img: jnp.ndarray, dist_x: jnp.ndarray,
                                dist_y: jnp.ndarray) -> jnp.ndarray:
    """Warp an image through distorted sampling coordinates
    (reference `optics_simulator_lite.py:758-772`).

    img: (B, H, W, C); dist_x/dist_y: (H*W,) coordinates in [-1, 1].
    """
    b, h, w, c = img.shape
    # Merge batch into channels so one gather serves the whole batch.
    merged = jnp.transpose(img, (1, 2, 0, 3)).reshape(1, h, w, b * c)
    warped = interpolate_bicubic(merged, dist_x, dist_y, (h, w))
    warped = warped.reshape(h, w, b, c)
    return jnp.transpose(warped, (2, 0, 1, 3))


def warp_bicubic_shifts(img: jnp.ndarray, sx_px: jnp.ndarray,
                        sy_px: jnp.ndarray, max_shift_px: int
                        ) -> jnp.ndarray:
    """Keys-bicubic warp for per-pixel SHIFT maps with a static bound —
    gather-free.

    Same resampling math as :func:`interpolate_bicubic` at source
    coordinates (i − sy_px, j − sx_px), but evaluated as a dense tap sum
    over the static offset band [−M−2, M+2]² (M = ``max_shift_px``): each
    tap is a shifted slice of the edge-padded image times a 4-way-select
    Keys weight map. TPU gathers cost ~μs per megapixel *index map*
    (80 ms for the 16-row-gather form, 1.8 s for a 4×4-slice gather at
    1024² — `benchmarks/profile_imaging.py`); this form is pure VPU
    FMA + selects and runs at the few-ms relay floor.

    Exactness: identical neighbors and weights as ``interpolate_bicubic``
    (coordinate clamp to [0, N−1], per-neighbor index clamping via edge
    padding), so results match to f32 accumulation order. Shifts are
    clamped to ±M — pick M ≥ the physical maximum (distortion shifts are
    a few px; ``SimulatorConfig.max_warp_px``).

    Args:
      img: (B, H, W, C); sx_px/sy_px: (H, W) shifts in PIXELS (positive =
        sample from smaller coordinate, i.e. content moves +x/+y).
      max_shift_px: static clamp M; taps scale as (2M+5)².
    """
    B, H, W, C = img.shape
    M = int(max_shift_px)
    dtype = img.dtype

    jj = jnp.arange(W, dtype=dtype)[None, :]
    ii = jnp.arange(H, dtype=dtype)[:, None]
    xs = jnp.clip(jj - jnp.clip(sx_px.astype(dtype), -M, M), 0, W - 1)
    ys = jnp.clip(ii - jnp.clip(sy_px.astype(dtype), -M, M), 0, H - 1)
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)

    wxk = _keys_weights(xs, x0)
    wyk = _keys_weights(ys, y0)
    bx = x0.astype(jnp.int32) - jnp.arange(W, dtype=jnp.int32)[None, :]
    by = y0.astype(jnp.int32) - jnp.arange(H, dtype=jnp.int32)[:, None]

    offsets = range(-M - 2, M + 3)                    # 2M+5 taps per axis
    WX = {d: _keys_tap_weight(bx, wxk, d, dtype) for d in offsets}
    WY = {d: _keys_tap_weight(by, wyk, d, dtype) for d in offsets}

    T = M + 2
    imp = jnp.pad(img, ((0, 0), (T, T), (T, T), (0, 0)), mode="edge")
    out = jnp.zeros_like(img)
    for dy in offsets:
        row_acc = jnp.zeros_like(img)
        for dx in offsets:
            sl = jax.lax.slice(imp, (0, T + dy, T + dx, 0),
                               (B, T + dy + H, T + dx + W, C))
            row_acc = row_acc + WX[dx][None, :, :, None] * sl
        out = out + WY[dy][None, :, :, None] * row_acc
    return out


def _tap1d(img: jnp.ndarray, coord: jnp.ndarray, axis: int,
           max_shift_px: int) -> jnp.ndarray:
    """1-D Keys-bicubic resample of (B, H, W, C) along H (axis=1) or W
    (axis=2) at per-pixel source ``coord`` (H, W), as a static tap sum.

    Same neighbor/clamp/weight semantics as :func:`interpolate_bicubic`
    restricted to one axis; taps cover the static band
    [−max_shift_px−2, max_shift_px+2] (coordinates clamp into it)."""
    B, H, W, C = img.shape
    N = H if axis == 1 else W
    M = int(max_shift_px)
    dtype = img.dtype

    base = (jnp.arange(H, dtype=dtype)[:, None] if axis == 1
            else jnp.arange(W, dtype=dtype)[None, :])
    v = jnp.clip(coord.astype(dtype), 0, N - 1)
    # clamp the effective shift into the static band
    v = jnp.clip(v, base - M, base + M)
    v0 = jnp.floor(v)
    wk = _keys_weights(v, v0)
    b_map = v0.astype(jnp.int32) - base.astype(jnp.int32)

    offsets = range(-M - 2, M + 3)
    T = M + 2
    pad_cfg = [(0, 0), (0, 0), (0, 0), (0, 0)]
    pad_cfg[axis] = (T, T)
    imp = jnp.pad(img, pad_cfg, mode="edge")
    out = jnp.zeros_like(img)
    for d in offsets:
        w = _keys_tap_weight(b_map, wk, d, dtype)
        if axis == 1:
            sl = jax.lax.slice(imp, (0, T + d, 0, 0), (B, T + d + H, W, C))
        else:
            sl = jax.lax.slice(imp, (0, 0, T + d, 0), (B, H, T + d + W, C))
        out = out + w[None, :, :, None] * sl
    return out


def warp_bicubic_separable(img: jnp.ndarray, sx_fn, sy_fn,
                           max_shift_px: int,
                           n_solve_iters: int = 4) -> jnp.ndarray:
    """Two-pass (Catmull–Smith) bicubic warp for smooth per-pixel shift
    FIELDS — the production TPU path for large distortion.

    The direct 2-D warp needs either a gather (TPU gathers move ~2.5 GB/s
    — 78 ms at 1024², `benchmarks/profile_imaging.py`) or a tap sum whose
    cost scales as (2M+5)² in the shift bound M (infeasible at the
    double-Gauss's ~26 px corner shifts). Decomposing into an x-pass then a
    y-pass makes each a 1-D tap sum of (2M+5) taps — pure VPU work, ~2 ms
    per pass.

    Geometry is EXACT: the intermediate x-coordinate map is evaluated at
    the row's preimage (the classical Catmull–Smith solve), found by
    ``n_solve_iters`` fixed-point steps of p = i' + sy(p, j) — shift
    fields are a few % of the radius, so this converges geometrically.
    The only difference vs the one-pass 2-D resample is a filter-footprint
    skew of order |∂sx/∂y|·(kernel radius) ≲ 0.3 px at a 5 %-distortion
    corner — a sub-pixel anisotropy of the interpolation kernel, not a
    position error (parity-tested against the gather path).

    Args:
      img: (B, H, W, C).
      sx_fn/sy_fn: callables (ii, jj) → shift in PIXELS at float pixel
        coordinates (broadcastable (H, W) arrays); source point of output
        pixel (i, j) is (i − sy(i, j), j − sx(i, j)), as in
        :func:`warp_bicubic_shifts`.
      max_shift_px: static per-axis bound M (coordinates clamp into it).
    """
    B, H, W, C = img.shape
    dtype = img.dtype
    ii = jnp.arange(H, dtype=dtype)[:, None]
    jj = jnp.arange(W, dtype=dtype)[None, :]

    # Preimage of each intermediate row: p − sy(p, j) = i'  ⇒  fixed point.
    p = ii
    for _ in range(n_solve_iters):
        p = ii + sy_fn(p, jj)
    xs2 = jj - sx_fn(p, jj)                    # x source map, intermediate
    tmp = _tap1d(img, xs2, axis=2, max_shift_px=max_shift_px)

    ysrc = ii - sy_fn(ii, jj)                  # y source map, final
    return _tap1d(tmp, ysrc, axis=1, max_shift_px=max_shift_px)


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 255.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio over (H, W, C), per batch element."""
    mse = jnp.mean((a - b) ** 2, axis=(-3, -2, -1))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-20))


def _ssim_window(filter_size: int, filter_sigma: float) -> np.ndarray:
    """Normalized Gaussian SSIM window (the `tf.image.ssim` default:
    11x11, sigma = 1.5)."""
    offsets = np.arange(filter_size, dtype=np.float64) - (filter_size - 1) / 2
    g = np.exp(-0.5 * (offsets / filter_sigma) ** 2)
    w2d = g[:, None] * g[None, :]
    return (w2d / w2d.sum()).astype(np.float32)


def _ssim_filter(x: jnp.ndarray, window: np.ndarray) -> jnp.ndarray:
    """Per-channel VALID-padded Gaussian filter over (B, H, W, C).

    The window is separable (outer product of a 1-D Gaussian), so the 2-D
    depthwise conv — which XLA:TPU lowers badly (52 ms of the round-4
    1024 px SSIM, `benchmarks/profile_imaging.py`) — is computed as two
    1-D static-slice weighted sums instead: 2·K fused multiply-adds that
    stay on the VPU."""
    k = window.shape[0]
    # Recover the 1-D factor: window = g ⊗ g with Σ window = 1 ⇒ row sums
    # are g (each row i sums to g_i · Σg = g_i since Σg = 1 here... the
    # normalized 2-D window's row sums ARE the normalized 1-D window).
    g1 = window.sum(axis=1)
    h = x.shape[1] - k + 1
    w_out = x.shape[2] - k + 1
    acc = None
    for i in range(k):
        term = float(g1[i]) * x[:, i:i + h, :, :]
        acc = term if acc is None else acc + term
    out = None
    for j in range(k):
        term = float(g1[j]) * acc[:, :, j:j + w_out, :]
        out = term if out is None else out + term
    return out


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 255.0,
         filter_size: int = 11, filter_sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Mean structural similarity per batch element, matching
    ``tf.image.ssim`` (the reference's metric,
    `optics_simulator_lite.py:303`): Gaussian 11x11 window with sigma = 1.5,
    VALID padding, per-channel filtering, mean over space and channels."""
    window = _ssim_window(filter_size, filter_sigma)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_a = _ssim_filter(a, window)
    mu_b = _ssim_filter(b, window)
    var_a = _ssim_filter(a * a, window) - mu_a ** 2
    var_b = _ssim_filter(b * b, window) - mu_b ** 2
    cov = _ssim_filter(a * b, window) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)
         / ((mu_a ** 2 + mu_b ** 2 + c1) * (var_a + var_b + c2)))
    return jnp.mean(s, axis=(-3, -2, -1))


def ensure_finite(tensor: jnp.ndarray, replace_val: float = 0.0) -> jnp.ndarray:
    """NaN/Inf -> replace_val (reference `optics_simulator_lite.py:576-577`)."""
    return jnp.where(jnp.isfinite(tensor), tensor, replace_val)


def linear_interpolation(soft_indices: jnp.ndarray,
                         values: jnp.ndarray) -> jnp.ndarray:
    """Linear gather interpolation along axis 0
    (reference `optics_simulator_lite.py:580-586`).

    For small 1-D tables (the per-field samples this module interpolates —
    ≤ 64 entries) the gather is replaced by a hat-function contraction
    Σₖ values[k]·max(0, 1−|soft−k|): TPU gathers over megapixel index maps
    cost ~7 ms/map at 1024² while the K fused multiply-adds are sub-ms
    (`benchmarks/profile_imaging.py`). Identical math (the hat basis IS
    linear interpolation, including the clamp)."""
    K = values.shape[0]
    soft = jnp.clip(soft_indices, 0, K - 1)
    if values.ndim == 1 and K <= 64:
        out = jnp.zeros(soft.shape, dtype=values.dtype)
        for k in range(K):
            out = out + values[k] * jnp.maximum(1.0 - jnp.abs(soft - k), 0.0)
        return out
    upper = jnp.ceil(soft).astype(jnp.int32)
    lower = jnp.floor(soft).astype(jnp.int32)
    frac = soft % 1
    return values[lower] * (1 - frac) + values[upper] * frac


def get_psf_weights(grid_h: int, grid_w: int, field_map,
                    n_fields: int) -> jnp.ndarray:
    """Per-patch PSF interpolation weights: fraction of patch pixels closest
    to each sampled field (reference `optics_simulator_lite.py:589-613`).

    When ``field_map`` is a host numpy array (it is pure static geometry —
    normalized radius per pixel), the whole computation runs in numpy at
    trace time and the (n_patches, n_fields) weights enter the program as
    constants instead of a megapixel one-hot reduction re-executed every
    step."""
    img_h, img_w = field_map.shape
    ph = int(round(img_h / grid_h))
    pw = int(round(img_w / grid_w))
    rows_0 = np.round(np.linspace(0, 1, grid_h) * (img_h - ph)).astype(int)
    cols_0 = np.round(np.linspace(0, 1, grid_w) * (img_w - pw)).astype(int)

    xp = np if isinstance(field_map, np.ndarray) else jnp
    discrete = xp.round(field_map * (n_fields - 1)).astype(xp.int32)
    patches = [discrete[r0:r0 + ph, c0:c0 + pw]
               for r0 in rows_0 for c0 in cols_0]
    reshaped = xp.stack(patches)
    fields = xp.arange(n_fields)
    w = xp.mean((reshaped[..., None] == fields).astype(xp.float32),
                axis=(1, 2))
    return jnp.asarray(w)


def interpolate_psfs(sampled_psfs: jnp.ndarray, field_map: jnp.ndarray,
                     psf_grid_shape: Tuple[int, int]) -> jnp.ndarray:
    """Blend per-field PSFs into per-patch PSFs
    (reference `optics_simulator_lite.py:680-686`)."""
    gh, gw = psf_grid_shape
    w = get_psf_weights(gh, gw, field_map, sampled_psfs.shape[0])
    return jnp.sum(w[..., None, None, None] * sampled_psfs, axis=1)


def rotate_image_bilinear(img: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate (H, W, C) images about their center by ``angle`` (radians,
    one per batch element), bilinear sampling, zero fill."""
    n, h, w, c = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=img.dtype),
                          jnp.arange(w, dtype=img.dtype), indexing="ij")
    cy, cxx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = yy - cy
    xx = xx - cxx
    cos = jnp.cos(angle)[:, None, None]
    sin = jnp.sin(angle)[:, None, None]
    src_x = cos * xx[None] - sin * yy[None] + cxx
    src_y = sin * xx[None] + cos * yy[None] + cy

    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = src_x - x0
    fy = src_y - y0

    def gather(yi, xi):
        valid = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w))
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = jnp.take_along_axis(
            img.reshape(n, h * w, c),
            (yi * w + xi).reshape(n, -1, 1), axis=1).reshape(n, h, w, c)
        return vals * valid[..., None]

    out = (gather(y0, x0) * ((1 - fy) * (1 - fx))[..., None]
           + gather(y0, x0 + 1) * ((1 - fy) * fx)[..., None]
           + gather(y0 + 1, x0) * (fy * (1 - fx))[..., None]
           + gather(y0 + 1, x0 + 1) * (fy * fx)[..., None])
    return out


def resize_bilinear(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Resize (N, H, W, C) with jax.image bilinear resize (antialiased when
    downscaling via resize's default kernel)."""
    n, h, w, c = img.shape
    return jax.image.resize(img, (n, out_hw[0], out_hw[1], c),
                            method="linear")


def rotate_and_resize_psfs(interpolated_psfs: jnp.ndarray, x_map, y_map,
                           psf_grid_shape: Tuple[int, int],
                           resized_psf_shape: Tuple[int, int]) -> jnp.ndarray:
    """Rotate each patch PSF to its azimuth and resize to simulation
    resolution (reference `optics_simulator_lite.py:689-707`)."""
    gh, gw = psf_grid_shape
    x_map = np.asarray(x_map)
    y_map = np.asarray(y_map)
    x_center = (np.arange(gw) + 0.5) / gw * (x_map[-1] - x_map[0]) + x_map[0]
    y_center = (np.arange(gh) + 0.5) / gh * (y_map[-1] - y_map[0]) + y_map[0]
    angles = jnp.asarray(
        np.arctan2(x_center[None, :], y_center[:, None]).reshape(-1),
        dtype=interpolated_psfs.dtype)
    rotated = rotate_image_bilinear(interpolated_psfs, -angles)
    resized = resize_bilinear(rotated, tuple(int(v) for v in resized_psf_shape))
    resized = resized / jnp.sum(resized, axis=(1, 2), keepdims=True)
    return resized[None, ...]


def sample_distortion_shifts(specs, lens, y_centroid: jnp.ndarray) -> jnp.ndarray:
    """Relative distortion shifts at equidistant fields
    (reference `optics_simulator_lite.py:726-739`)."""
    from torchoptics_tpu.ops import abcd as abcd_mod
    n_fields = y_centroid.shape[0]
    fields = np.linspace(0, 1, n_fields)
    y_ref = abcd_mod.get_paraxial_heights_at_image_plane(specs, lens, fields)[0]
    return (y_centroid - y_ref) / y_ref[-1]


def interpolate_distortion_shifts(sampled_shifts: jnp.ndarray, x: jnp.ndarray,
                                  y: jnp.ndarray):
    """Radial interpolation of distortion shifts into x/y shift maps
    (reference `optics_simulator_lite.py:742-755`)."""
    n_fields = sampled_shifts.shape[0]
    r = jnp.sqrt(x ** 2 + y ** 2)
    angle = jnp.arctan2(y, x)
    shift = linear_interpolation(r * (n_fields - 1), sampled_shifts)
    return shift * jnp.cos(angle), shift * jnp.sin(angle)


def interpolate_relative_illumination(sampled: jnp.ndarray,
                                      field_map: jnp.ndarray) -> jnp.ndarray:
    """Relative-illumination map from per-field samples
    (reference `optics_simulator_lite.py:719-723`)."""
    n_fields = sampled.shape[0]
    return linear_interpolation(field_map * (n_fields - 1), sampled)
