"""Pixel kernels for the media leg: deterministic synthetic images, integer
grayscale, integer box-filter resize (exact: floor-boundary blocks, integer
mean), 64-bit average-hash, and block features. Every op is integer-exact so
an independent pure-Python golden (fixtures/media_golden.py) can reproduce
results bit-for-bit — the docs_golden oracle pattern.

Spec shared with the golden (any change must land in BOTH):
  synth:   group base = (doc_id // 7) * 7; w = 16 + (base*2654435761) % 33,
           h = 16 + (base*40503) % 33; pixel (y, x):
             r = (x*7  + y*13 + base)    % 256
             g = (x*3  + y*5  + base*11) % 256
             b = (x    + y    + base*29) % 256
           then a 4x4 marker patch at the origin set to MARKER_RGB[doc_id % 7]
           — seven RGB triples that all share integer gray 128, so
           same-group images differ in COLOR only: their grayscale planes
           (hence aHash and features) are identical, giving the pHash
           near-dup structure (in-group hamming 0) without the marker
           drifting the global hash mean.
  gray:    (r*299 + g*587 + b*114) // 1000
  cells:   block (ty, tx) covers rows [ty*h//th, (ty+1)*h//th) x cols
           [tx*w//tw, (tx+1)*w//tw); value = sum // area (requires th <= h,
           tw <= w so no block is empty)
  ahash:   c = cells(gray, 8, 8) row-major; mean = sum(c) // 64;
           bit j set iff c[j] > mean
  feature: cells(gray, tw=4, th=2) row-major, each / 255.0 (one exact
           division per cell)
"""

from __future__ import annotations

import numpy as np

# seven RGB triples with IDENTICAL integer gray ((r*299+g*587+b*114)//1000
# == 128): the per-doc marker differs in color, never in luma
MARKER_RGB = (
    (80, 128, 254), (104, 116, 253), (128, 104, 252), (152, 92, 251),
    (176, 79, 255), (200, 67, 254), (224, 55, 253),
)


def synth_image(doc_id: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8 RGB test image for one doc id."""
    base = (doc_id // 7) * 7
    w = 16 + (base * 2654435761) % 33
    h = 16 + (base * 40503) % 33
    y = np.arange(h, dtype=np.int64)[:, None]
    x = np.arange(w, dtype=np.int64)[None, :]
    img = np.empty((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = (x * 7 + y * 13 + base) % 256
    img[:, :, 1] = (x * 3 + y * 5 + base * 11) % 256
    img[:, :, 2] = (x + y + base * 29) % 256
    img[:4, :4, :] = MARKER_RGB[doc_id % 7]
    return img


def gray_of(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w) int64 integer luma."""
    p = img.astype(np.int64)
    return (p[:, :, 0] * 299 + p[:, :, 1] * 587 + p[:, :, 2] * 114) // 1000


def _bounds(n: int, t: int) -> np.ndarray:
    return (np.arange(t, dtype=np.int64) * n) // t


def box_cells(gray: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Integer box-filter resize of an (h, w) int64 plane to (th, tw):
    per-block integer mean over floor-boundary blocks (two reduceats)."""
    h, w = gray.shape
    if th > h or tw > w:
        raise ValueError(f"box_cells cannot upscale ({h}x{w} -> {th}x{tw})")
    ys, xs = _bounds(h, th), _bounds(w, tw)
    s = np.add.reduceat(np.add.reduceat(gray, ys, axis=0), xs, axis=1)
    ylen = np.diff(np.r_[ys, h])
    xlen = np.diff(np.r_[xs, w])
    return s // (ylen[:, None] * xlen[None, :])


def box_resize_rgb(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """(h, w, 3) uint8 -> (th, tw, 3) uint8 via per-channel box_cells."""
    out = np.empty((th, tw, 3), dtype=np.uint8)
    for c in range(3):
        out[:, :, c] = box_cells(img[:, :, c].astype(np.int64), tw, th)
    return out


def ahash64(gray: np.ndarray) -> int:
    """64-bit average hash: 8x8 box cells, bit j set iff cell j (row-major)
    exceeds the integer mean of the 64 cells."""
    c = box_cells(gray, 8, 8).ravel()
    mean = int(c.sum()) // 64
    bits = (c > mean).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum())


def feature_cells(gray: np.ndarray) -> list[float]:
    """8-dim block-intensity feature: 4x2 box cells / 255.0, row-major."""
    return (box_cells(gray, 4, 2).ravel() / 255.0).tolist()


def thumb_dims(w: int, h: int, max_side: int = 16) -> tuple[int, int]:
    """Aspect-preserving integer fit into a max_side box (floor, min 1).
    max_side <= 16 <= every synth dimension, so the resize only downscales
    and box_cells' no-empty-block precondition always holds."""
    long_side = max(w, h)
    return max(1, (w * max_side) // long_side), max(1, (h * max_side) // long_side)
