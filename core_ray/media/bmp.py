"""From-scratch 24-bit BMP codec (numpy + struct; no image libraries).

Scope: the uncompressed BI_RGB / BITMAPINFOHEADER subset — the standard
interchange form of the format. Anything else (palettes, RLE, other bit
depths, V4/V5 headers beyond the first 40 bytes) fails LOUD with
NotImplementedError rather than decoding garbage.

Layout recap (public spec):
  bytes 0..13   BITMAPFILEHEADER: 'BM', u32 file size, u16 x2 reserved,
                u32 pixel-data offset
  bytes 14..53  BITMAPINFOHEADER: u32 40, i32 width, i32 height (positive =
                bottom-up row order, negative = top-down), u16 planes, u16
                bpp, u32 compression (0 = BI_RGB), u32 image size, ...
  pixel data    rows of B,G,R triples, each row zero-padded to a 4-byte
                multiple
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HDR = struct.Struct("<2sIHHI")
_INFO_HDR = struct.Struct("<IiiHHIIiiII")
_HDR_SIZE = 54


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BI_RGB BMP bytes."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_bmp expects (h, w, 3) uint8 RGB")
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    # bottom-up row order, channels B,G,R
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    return (
        _FILE_HDR.pack(b"BM", _HDR_SIZE + len(data), 0, 0, _HDR_SIZE)
        + _INFO_HDR.pack(40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
        + data
    )


def decode_bmp(blob: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> (h, w, 3) uint8 RGB. Supports bottom-up
    (height > 0) and top-down (height < 0) row order."""
    if len(blob) < _HDR_SIZE or blob[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _, _, _, data_off = _FILE_HDR.unpack_from(blob, 0)
    (hdr_sz, w, h_signed, planes, bpp, compression, _, _, _, _, _) = (
        _INFO_HDR.unpack_from(blob, 14)
    )
    if hdr_sz < 40:
        raise NotImplementedError(f"BMP header size {hdr_sz} unsupported")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB supported (got bpp={bpp}, compression={compression})"
        )
    if planes != 1 or w <= 0 or h_signed == 0:
        raise ValueError("malformed BMP dimensions")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    need = data_off + stride * h
    if len(blob) < need:
        raise ValueError(f"truncated BMP: {len(blob)} < {need} bytes")
    rows = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=data_off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]
    if h_signed > 0:  # bottom-up: first stored row is the image's last
        img = img[::-1]
    return np.ascontiguousarray(img)
