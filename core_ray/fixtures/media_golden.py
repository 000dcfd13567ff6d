"""Independent pure-Python golden for the media leg (no numpy — dict/loop
style, the docs_golden.py oracle pattern): re-implements the shared spec in
core_ray/media/ops.py from scratch so the engine's numpy kernels and BMP
codec are checked against a second implementation, not against themselves.
The golden also round-trips its OWN encoder/decoder, so the two codecs are
cross-checked byte-for-byte by tests/test_media.py."""

from __future__ import annotations

import struct
import zlib

import pyarrow as pa


MARKER_RGB = [
    (80, 128, 254), (104, 116, 253), (128, 104, 252), (152, 92, 251),
    (176, 79, 255), (200, 67, 254), (224, 55, 253),
]  # identical integer gray (128) — see media/ops.py spec


def synth_pixels(doc_id: int):
    """-> (w, h, rows) with rows[y][x] = (r, g, b) ints."""
    base = (doc_id // 7) * 7
    w = 16 + (base * 2654435761) % 33
    h = 16 + (base * 40503) % 33
    marker = MARKER_RGB[doc_id % 7]
    rows = []
    for y in range(h):
        row = []
        for x in range(w):
            if y < 4 and x < 4:
                row.append(marker)
            else:
                row.append(
                    (
                        (x * 7 + y * 13 + base) % 256,
                        (x * 3 + y * 5 + base * 11) % 256,
                        (x + y + base * 29) % 256,
                    )
                )
        rows.append(row)
    return w, h, rows


def encode_bmp(w: int, h: int, rows) -> bytes:
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        for r, g, b in rows[y]:
            body += bytes((b, g, r))
        body += pad
    return (
        struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
        + bytes(body)
    )


def decode_bmp(blob: bytes):
    """-> (w, h, rows); 24-bit BI_RGB only, bottom-up or top-down."""
    assert blob[:2] == b"BM", "not a BMP"
    data_off = struct.unpack_from("<I", blob, 10)[0]
    w, h_signed = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    comp = struct.unpack_from("<I", blob, 30)[0]
    assert bpp == 24 and comp == 0, "only 24-bit BI_RGB"
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    rows = []
    for y in range(h):
        src = h - 1 - y if h_signed > 0 else y
        off = data_off + src * stride
        row = []
        for x in range(w):
            b, g, r = blob[off + 3 * x: off + 3 * x + 3]
            row.append((r, g, b))
        rows.append(row)
    return w, h, rows


def gray_rows(rows):
    return [[(r * 299 + g * 587 + b * 114) // 1000 for r, g, b in row] for row in rows]


def box_cells(plane, w: int, h: int, tw: int, th: int):
    """Row-major list of th*tw integer block means (floor boundaries)."""
    out = []
    for ty in range(th):
        y0, y1 = ty * h // th, (ty + 1) * h // th
        for tx in range(tw):
            x0, x1 = tx * w // tw, (tx + 1) * w // tw
            s = 0
            for y in range(y0, y1):
                for x in range(x0, x1):
                    s += plane[y][x]
            out.append(s // ((y1 - y0) * (x1 - x0)))
    return out


def ahash64(gray, w: int, h: int) -> int:
    c = box_cells(gray, w, h, 8, 8)
    mean = sum(c) // 64
    v = 0
    for j, cj in enumerate(c):
        if cj > mean:
            v |= 1 << j
    return v


def synth_video_frames(doc_id: int):
    """-> (w, h, [frame_rows...]) — pure-Python mirror of media/video.py."""
    w = 16 + (doc_id * 2654435761) % 17
    h = 16 + (doc_id * 40503) % 17
    frames = []
    for f in range(3 + (doc_id % 5)):
        rows = []
        for y in range(h):
            row = []
            for x in range(w):
                row.append(
                    (
                        (x * 7 + y * 13 + doc_id + f * 31) % 256,
                        (x * 3 + y * 5 + doc_id * 11 + f * 17) % 256,
                        (x + y + doc_id * 29 + f * 7) % 256,
                    )
                )
            rows.append(row)
        frames.append(rows)
    return w, h, frames


def golden_frames(ids) -> pa.Table:
    """Per-frame golden rows over the BMP-chain video: every frame's index,
    25 fps offset and average-hash (the engine's sampled subset is the
    frame_idx % stride slice). Round-trips the golden's own codec per
    frame, independently of the engine's."""
    out = {"doc_id": [], "frame_idx": [], "frame_offset_ms": [], "frame_ahash": []}
    for doc_id in ids:
        w, h, frames = synth_video_frames(int(doc_id))
        blob = b"".join(encode_bmp(w, h, rows) for rows in frames)
        # independent chain walk: decode each frame back out of the blob
        off, idx = 0, 0
        while off < len(blob):
            size = struct.unpack_from("<I", blob, off + 2)[0]
            fw, fh, rows = decode_bmp(blob[off:off + size])
            assert (fw, fh) == (w, h) and rows == frames[idx]
            out["doc_id"].append(int(doc_id))
            out["frame_idx"].append(idx)
            out["frame_offset_ms"].append(idx * 40)  # 25 fps
            out["frame_ahash"].append(ahash64(gray_rows(rows), fw, fh))
            off += size
            idx += 1
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "frame_idx": pa.array(out["frame_idx"], pa.int64()),
            "frame_offset_ms": pa.array(out["frame_offset_ms"], pa.int64()),
            "frame_ahash": pa.array(out["frame_ahash"], pa.uint64()),
        }
    )


def golden_media(ids) -> pa.Table:
    """Per-doc golden rows: encode -> decode round trip, then features,
    ahash and the real 16-box thumbnail (re-encoded; byte stats + crc32)."""
    out = {
        "doc_id": [], "media_bytes": [], "width": [], "height": [],
        "feature": [], "ahash": [], "thumb_w": [], "thumb_h": [],
        "thumb_bytes": [], "thumb_crc": [],
    }
    for doc_id in ids:
        w, h, rows = synth_pixels(int(doc_id))
        blob = encode_bmp(w, h, rows)
        dw, dh, drows = decode_bmp(blob)
        assert (dw, dh, drows) == (w, h, rows), "golden codec round-trip"
        gray = gray_rows(drows)
        feats = [c / 255.0 for c in box_cells(gray, w, h, 4, 2)]
        ah = ahash64(gray, w, h)
        long_side = max(w, h)
        tw = max(1, (w * 16) // long_side)
        th = max(1, (h * 16) // long_side)
        trows = []
        for ty in range(th):
            y0, y1 = ty * h // th, (ty + 1) * h // th
            trow = []
            for tx in range(tw):
                x0, x1 = tx * w // tw, (tx + 1) * w // tw
                area = (y1 - y0) * (x1 - x0)
                sums = [0, 0, 0]
                for y in range(y0, y1):
                    for x in range(x0, x1):
                        px = drows[y][x]
                        sums[0] += px[0]
                        sums[1] += px[1]
                        sums[2] += px[2]
                trow.append(tuple(s // area for s in sums))
            trows.append(trow)
        tblob = encode_bmp(tw, th, trows)
        out["doc_id"].append(int(doc_id))
        out["media_bytes"].append(len(blob))
        out["width"].append(w)
        out["height"].append(h)
        out["feature"].append(feats)
        out["ahash"].append(ah)
        out["thumb_w"].append(tw)
        out["thumb_h"].append(th)
        out["thumb_bytes"].append(len(tblob))
        out["thumb_crc"].append(zlib.crc32(tblob))
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "media_bytes": pa.array(out["media_bytes"], pa.int64()),
            "width": pa.array(out["width"], pa.int32()),
            "height": pa.array(out["height"], pa.int32()),
            "feature": pa.array(out["feature"], pa.list_(pa.float64())),
            "ahash": pa.array(out["ahash"], pa.uint64()),
            "thumb_w": pa.array(out["thumb_w"], pa.int32()),
            "thumb_h": pa.array(out["thumb_h"], pa.int32()),
            "thumb_bytes": pa.array(out["thumb_bytes"], pa.int64()),
            "thumb_crc": pa.array(out["thumb_crc"], pa.int64()),
        }
    )


def golden_psnr(ids) -> pa.Table:
    """Thumbnail round-trip PSNR golden: box-downscale to the 16-box
    thumb, NEAREST-upscale back (floor source mapping y*th//h, x*tw//w),
    exact integer SSE over all RGB samples, PSNR = 10*log10(255^2 * n /
    sse) rounded to 6 dp (NULL when the round trip is lossless)."""
    import math

    out = {"doc_id": [], "sse": [], "n_px": [], "psnr_db": []}
    for doc_id in ids:
        w, h, rows = synth_pixels(int(doc_id))
        _dw, _dh, drows = decode_bmp(encode_bmp(w, h, rows))
        long_side = max(w, h)
        tw = max(1, (w * 16) // long_side)
        th = max(1, (h * 16) // long_side)
        trows = []
        for ty in range(th):
            y0, y1 = ty * h // th, (ty + 1) * h // th
            trow = []
            for tx in range(tw):
                x0, x1 = tx * w // tw, (tx + 1) * w // tw
                area = (y1 - y0) * (x1 - x0)
                sums = [0, 0, 0]
                for y in range(y0, y1):
                    for x in range(x0, x1):
                        px = drows[y][x]
                        sums[0] += px[0]
                        sums[1] += px[1]
                        sums[2] += px[2]
                trow.append(tuple(s // area for s in sums))
            trows.append(trow)
        sse = 0
        for y in range(h):
            sy = (y * th) // h
            for x in range(w):
                sx = (x * tw) // w
                a, b = drows[y][x], trows[sy][sx]
                sse += (
                    (a[0] - b[0]) ** 2 + (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2
                )
        n = w * h * 3
        psnr = (
            None
            if sse == 0
            else math.floor(
                10.0 * math.log10(255.0 * 255.0 * n / sse) * 1e6 + 0.5
            )
            / 1e6
        )
        out["doc_id"].append(int(doc_id))
        out["sse"].append(sse)
        out["n_px"].append(n)
        out["psnr_db"].append(psnr)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"], pa.int64()),
            "sse": pa.array(out["sse"], pa.int64()),
            "n_px": pa.array(out["n_px"], pa.int64()),
            "psnr_db": pa.array(out["psnr_db"], pa.float64()),
        }
    )
