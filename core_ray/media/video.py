"""Real frame handling for the media video leg: a "video" payload is a
CONCATENATION of standard 24-bit BMP frames — each frame's own
BITMAPFILEHEADER carries its byte size (offset 2, u32), so the chain walks
with no invented container index; truncated or corrupt chains fail loud.

Shared synthesis spec (pure-Python mirror in fixtures/media_golden.py —
any change must land in BOTH):
  n_frames = 3 + (doc_id % 5)
  w = 16 + (doc_id * 2654435761) % 17, h = 16 + (doc_id * 40503) % 17
  (constant across a video's frames, like a real stream)
  frame f pixel (y, x):
    r = (x*7 + y*13 + doc_id      + f*31) % 256
    g = (x*3 + y*5  + doc_id*11   + f*17) % 256
    b = (x   + y    + doc_id*29   + f*7 ) % 256
"""

from __future__ import annotations

import struct

import numpy as np

from core_ray.media.bmp import encode_bmp


def synth_frame(doc_id: int, f: int) -> np.ndarray:
    w = 16 + (doc_id * 2654435761) % 17
    h = 16 + (doc_id * 40503) % 17
    y = np.arange(h, dtype=np.int64)[:, None]
    x = np.arange(w, dtype=np.int64)[None, :]
    img = np.empty((h, w, 3), dtype=np.uint8)
    img[:, :, 0] = (x * 7 + y * 13 + doc_id + f * 31) % 256
    img[:, :, 1] = (x * 3 + y * 5 + doc_id * 11 + f * 17) % 256
    img[:, :, 2] = (x + y + doc_id * 29 + f * 7) % 256
    return img


def synth_video(doc_id: int) -> bytes:
    n = 3 + (doc_id % 5)
    return b"".join(encode_bmp(synth_frame(doc_id, f)) for f in range(n))


def split_frames(blob: bytes) -> list[bytes]:
    """Walk the BMP chain by each frame's own header size field."""
    out = []
    off = 0
    n = len(blob)
    while off < n:
        if blob[off:off + 2] != b"BM":
            raise ValueError(f"frame chain corrupt at byte {off}")
        size = struct.unpack_from("<I", blob, off + 2)[0]
        if size < 54 or off + size > n:
            raise ValueError(f"truncated frame at byte {off} (size {size})")
        out.append(blob[off:off + size])
        off += size
    return out
