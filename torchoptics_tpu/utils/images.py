"""Test-image assets for the imaging pipeline.

The reference ships a natural photograph (`data/sample_image.png`) as the
input of its (dormant) aberration-simulation path. This build ships its own
equivalent asset — `torchoptics_tpu/data/sample_image.png`, a public-domain
photograph (the Grace Hopper portrait) — so the demo pipeline is
reproducible with zero external dependencies. Three sources, in preference
order:

* the shipped repo asset (no dependency at all);
* :func:`load_real_test_image` via matplotlib's bundled sample data
  (fallback if the asset is deleted);
* :func:`synthetic_test_image` — a procedural resolution chart (radial
  spokes + edges + color patches), always available.

All return (H, W, 3) float32 in [0, 255].
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

_ASSET = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data", "sample_image.png")


def synthetic_test_image(h: int = 128, w: int = 128) -> np.ndarray:
    """Procedural resolution chart standing in for a natural photo."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = (h - 1) / 2, (w - 1) / 2
    r = np.hypot(yy - cy, xx - cx)
    theta = np.arctan2(yy - cy, xx - cx)
    spokes = (np.sin(theta * 24) > 0).astype(np.float32)
    rings = (np.sin(r / 4.0) > 0).astype(np.float32)
    img = np.where(r < min(h, w) / 4, spokes, rings)
    rgb = np.stack([img, np.roll(img, h // 8, 0), np.roll(img, w // 8, 1)],
                   axis=-1)
    rgb[: h // 8, : w // 8] = [1, 0, 0]
    rgb[: h // 8, -w // 8:] = [0, 1, 0]
    rgb[-h // 8:, : w // 8] = [0, 0, 1]
    return (rgb * 255).astype(np.float32)


def _resize_nearest_box(img: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    """Cheap host-side resize (box-average down, nearest up) — good enough
    for preparing a demo input without pulling in an image library."""
    h, w = img.shape[:2]
    oh, ow = hw
    ys = (np.arange(oh) * (h / oh)).astype(int)
    xs = (np.arange(ow) * (w / ow)).astype(int)
    return img[ys][:, xs]


def load_real_test_image(size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """A real photograph for aberration demos (the working counterpart of the
    reference's `data/sample_image.png` asset).

    Uses the public-domain Grace Hopper portrait bundled with matplotlib.
    Raises ImportError if matplotlib is unavailable — callers that need a
    guaranteed image should fall back to :func:`synthetic_test_image`.
    """
    from matplotlib import cbook, image as mpimg

    path = cbook._get_data_path("sample_data", "grace_hopper.jpg")
    img = np.asarray(mpimg.imread(str(path)), dtype=np.float32)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, axis=-1)
    img = img[..., :3]
    if img.max() <= 1.0:
        img = img * 255.0
    # Square center crop so the field map covers the frame symmetrically.
    h, w = img.shape[:2]
    side = min(h, w)
    top, left = (h - side) // 2, (w - side) // 2
    img = img[top: top + side, left: left + side]
    if size is not None:
        img = _resize_nearest_box(img, size)
    return np.ascontiguousarray(img, dtype=np.float32)


def load_shipped_test_image(size: Optional[Tuple[int, int]] = None
                            ) -> np.ndarray:
    """The repo's own sample photograph
    (`torchoptics_tpu/data/sample_image.png`, public domain) — the working
    counterpart of the reference's `data/sample_image.png` asset."""
    from PIL import Image

    img = np.asarray(Image.open(_ASSET).convert("RGB"), dtype=np.float32)
    if size is not None:
        img = _resize_nearest_box(img, size)
    return np.ascontiguousarray(img, dtype=np.float32)


def load_test_image(size: Optional[Tuple[int, int]] = None,
                    prefer_real: bool = True) -> np.ndarray:
    """Best-available test image: the shipped repo asset, then matplotlib's
    bundled photograph, else the procedural chart."""
    if prefer_real:
        for loader in (load_shipped_test_image, load_real_test_image):
            try:
                return loader(size)
            except Exception:
                pass
    hw = size or (128, 128)
    return synthetic_test_image(*hw)
