"""Deterministic synthetic web-page corpus generator (seed=42, order-stable).

Implements FIXTURES.md §1-3: the ``pages`` table per BASELINE.json input_hint
(url, warc_ts, html, text, lang), the ``admin_polygons`` broadcast side, and
the ``geoip_ranges`` host lookup. Replaces the reference's ~40 pinned
real-world repos (reference: tests/integration/repos.yaml) with a seeded
corpus whose expected values are computable by a slow pure-Python oracle.

Key properties:
- ``text`` is the exact expected extraction of ``html`` (byte-identity oracle).
- ~30% of pages embed coordinate mentions in text (3 formats), ~50% rely on
  host geo-IP, ~20% have no geo signal (error side-channel rows).
- Coordinates are drawn from a 10-city mixture holding 60% of mass (top city
  ~20%) + uniform background — the designated hot-cell skew (FIXTURES.md §1).
- ~1% duplicate urls (byte-identical rows) to exercise exact dedup.
"""

from __future__ import annotations

import html as _html
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

SEED = 42
N_HOSTS = 1000

# (name, lat, lon, weight) — weights sum to 0.60; the rest is uniform background.
CITIES = [
    ("metropolis", 40.7128, -74.0060, 0.20),
    ("hauptstadt", 52.5200, 13.4050, 0.10),
    ("megalopole", 48.8566, 2.3522, 0.08),
    ("granciudad", 19.4326, -99.1332, 0.06),
    ("daitoshi", 35.6762, 139.6503, 0.05),
    ("daedosi", 37.5665, 126.9780, 0.04),
    ("cidadegrande", -23.5505, -46.6333, 0.03),
    ("bolshoygorod", 55.7558, 37.6173, 0.02),
    ("grandville", 45.5019, -73.5674, 0.01),
    ("urbsmagna", 41.9028, 12.4964, 0.01),
]
CITY_SIGMA = 0.05
LANGS = ["en", "de", "fr", "es", "ja", "ko", "pt", "ru"]
LANG_WEIGHTS = np.array([0.40, 0.14, 0.11, 0.10, 0.08, 0.07, 0.06, 0.04])

_VOCAB = (
    "web page crawl archive corpus data index link site host server render "
    "article news story report travel city map place region country visit "
    "café münchen 東京 продажа 서울 coração niño forêt"
).split()


@dataclass
class Corpus:
    pages: pa.Table
    admin_polygons: pa.Table
    geoip_ranges: pa.Table


def _draw_coords(rng: np.random.Generator, n: int) -> tuple[np.ndarray, np.ndarray]:
    """City-mixture coordinate draw (60% cities / 40% uniform background)."""
    weights = np.array([c[3] for c in CITIES])
    u = rng.random(n)
    lat = np.empty(n)
    lon = np.empty(n)
    cum = np.cumsum(weights)
    city_idx = np.searchsorted(cum, u)  # u >= 0.60 -> index == len(CITIES) -> background
    bg = city_idx >= len(CITIES)
    for i, (_, clat, clon, _) in enumerate(CITIES):
        m = city_idx == i
        k = int(m.sum())
        if k:
            lat[m] = clat + rng.normal(0, CITY_SIGMA, k)
            lon[m] = clon + rng.normal(0, CITY_SIGMA, k)
    k = int(bg.sum())
    if k:
        lat[bg] = rng.uniform(-60.0, 70.0, k)
        lon[bg] = rng.uniform(-179.0, 179.0, k)
    return np.clip(lat, -84.9, 84.9), lon


def _format_mention(rng: np.random.Generator, lat: float, lon: float, style: int) -> tuple[str, float, float]:
    """Render one mention; returns (text, parsed_lat, parsed_lon) — the parsed
    values are what the extractor will recover (formatting loses precision)."""
    if style == 0:  # decimal pair (>= 4 decimals)
        s = f"{lat:.4f}, {lon:.4f}"
        return s, float(f"{lat:.4f}"), float(f"{lon:.4f}")
    if style == 1:  # geo URI
        s = f"geo:{lat:.4f},{lon:.4f}"
        return s, float(f"{lat:.4f}"), float(f"{lon:.4f}")
    # DMS with integer seconds
    def dms(v):
        a = abs(v)
        d = int(a)
        m = int((a - d) * 60)
        s = int(round(((a - d) * 60 - m) * 60))
        if s == 60:
            s, m = 0, m + 1
        if m == 60:
            m, d = 0, d + 1
        return d, m, s

    dlat, mlat, slat = dms(lat)
    dlon, mlon, slon = dms(lon)
    ns = "N" if lat >= 0 else "S"
    ew = "E" if lon >= 0 else "W"
    text = f"{dlat}°{mlat}'{slat}\"{ns} {dlon}°{mlon}'{slon}\"{ew}"
    plat = (dlat + mlat / 60.0 + slat / 3600.0) * (1 if ns == "N" else -1)
    plon = (dlon + mlon / 60.0 + slon / 3600.0) * (1 if ew == "E" else -1)
    return text, plat, plon


def generate_pages(n_pages: int, seed: int = SEED, html_noise_words: int = 0) -> Corpus:
    """Generate the full fixture corpus. Deterministic in (n_pages, seed,
    html_noise_words).

    ``html_noise_words``: extra boilerplate words wrapped in <div> blocks
    (NOT extracted — text stays byte-identical). Real Common-Crawl pages are
    ~50-100 KB of mostly-boilerplate html; the bench corpus uses this to give
    the extract stage representative parse work (default 0 keeps unit-test
    corpora fast)."""
    rng = np.random.default_rng(seed)

    hosts = [f"host{i:04d}.example{i % 7}.com" for i in range(N_HOSTS)]
    geoip_mask = np.array([i % 5 != 0 for i in range(N_HOSTS)])  # 80% covered
    host_lat, host_lon = _draw_coords(rng, N_HOSTS)

    covered = np.nonzero(geoip_mask)[0]
    uncovered = np.nonzero(~geoip_mask)[0]

    kinds = rng.choice(3, n_pages, p=[0.3, 0.5, 0.2])  # 0=mention 1=geoip 2=none
    langs = rng.choice(len(LANGS), n_pages, p=LANG_WEIGHTS / LANG_WEIGHTS.sum())
    ts_base = np.datetime64("2025-01-01T00:00:00", "us")
    ts_off = rng.integers(0, 365 * 24 * 3600, n_pages)

    # ---- pre-draw everything batched (the per-page Python loop below only
    # assembles strings; all rng calls are vectorized up front) ----
    host_pick_cov = covered[rng.integers(0, len(covered), n_pages)]
    host_pick_unc = uncovered[rng.integers(0, len(uncovered), n_pages)]
    host_pick_any = rng.integers(0, N_HOSTS, n_pages)
    n_paras_all = rng.integers(2, 6, n_pages)
    max_paras = 5
    nw_all = rng.integers(6, 20, (n_pages, max_paras))
    word_idx = rng.integers(0, len(_VOCAB), (n_pages, max_paras, 20))
    decoy_roll = rng.random(n_pages) < 0.15
    decoy_nums = rng.integers(1, 99, (n_pages, 2))
    decoy_frac = rng.integers(10, 99, (n_pages, 2))
    n_mentions_all = rng.integers(1, 4, n_pages)
    max_mentions = 3
    m_lat, m_lon = _draw_coords(rng, n_pages * max_mentions)
    m_lat = m_lat.reshape(n_pages, max_mentions)
    m_lon = m_lon.reshape(n_pages, max_mentions)
    m_style = rng.integers(0, 3, (n_pages, max_mentions))
    m_pidx = rng.integers(0, 1 << 30, (n_pages, max_mentions))  # mod n_paras later

    noise_idx = (
        rng.integers(0, len(_VOCAB), (n_pages, html_noise_words))
        if html_noise_words
        else None
    )
    urls, htmls, texts, langs_out, ts_out = [], [], [], [], []
    vocab = _VOCAB
    escape = _html.escape
    for i in range(n_pages):
        kind = kinds[i]
        if kind == 1:
            host = hosts[host_pick_cov[i]]
        elif kind == 2:
            host = hosts[host_pick_unc[i]]
        else:
            host = hosts[host_pick_any[i]]
        url = f"https://{host}/p/{i}"

        n_paras = int(n_paras_all[i])
        paras = [
            " ".join(vocab[w] for w in word_idx[i, p, : nw_all[i, p]])
            for p in range(n_paras)
        ]
        # junk decoys that must NOT match the coordinate regexes
        if decoy_roll[i]:
            paras[0] += (
                f" price {decoy_nums[i, 0]}.{decoy_frac[i, 0]},"
                f" {decoy_nums[i, 1]}.{decoy_frac[i, 1]} total"
            )
        if kind == 0:
            for j in range(int(n_mentions_all[i])):
                mention, _, _ = _format_mention(
                    rng, float(m_lat[i, j]), float(m_lon[i, j]), int(m_style[i, j])
                )
                paras[int(m_pidx[i, j]) % n_paras] += f" located at {mention} nearby"

        text = "\n".join(paras)
        body = "".join(f"<p>{escape(p)}</p>" for p in paras)
        noise = ""
        if html_noise_words:
            nw_idx = noise_idx[i]
            chunk = " ".join(vocab[w] for w in nw_idx)
            noise = f'<div class="boilerplate">{escape(chunk)}</div>'
        page_html = (
            f'<html><head><title>{escape(f"page {i} on {host}")}</title>'
            f'<meta charset="utf-8"/><script>var q={i};</script></head>'
            f'<body><nav><a href="/">home</a></nav>{noise}{body}'
            f'<div class="footer">© 2025 {host}</div></body></html>'
        )
        urls.append(url)
        htmls.append(page_html.encode("utf-8"))
        texts.append(text)
        langs_out.append(LANGS[langs[i]])
        ts_out.append(ts_base + np.timedelta64(int(ts_off[i]), "s").astype("timedelta64[us]"))

    # ~1% exact duplicates (same url, byte-identical row)
    n_dup = max(1, n_pages // 100)
    dup_idx = rng.integers(0, n_pages, n_dup)
    for d in dup_idx:
        urls.append(urls[d])
        htmls.append(htmls[d])
        texts.append(texts[d])
        langs_out.append(langs_out[d])
        ts_out.append(ts_out[d])

    pages = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts_out, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.large_string()),
            "lang": pa.array(langs_out, pa.string()),
        }
    )

    geoip = pa.table(
        {
            "host": pa.array([hosts[i] for i in covered], pa.string()),
            "lat": pa.array(host_lat[covered], pa.float64()),
            "lon": pa.array(host_lon[covered], pa.float64()),
        }
    )

    return Corpus(pages=pages, admin_polygons=_admin_polygons(), geoip_ranges=geoip)


def _rect(minx, miny, maxx, maxy) -> str:
    return (
        f"POLYGON (({minx} {miny}, {maxx} {miny}, {maxx} {maxy}, "
        f"{minx} {maxy}, {minx} {miny}))"
    )


def _hexagon(cx, cy, r) -> str:
    import math

    pts = [
        (cx + r * math.cos(math.radians(60 * k + 30)), cy + r * math.sin(math.radians(60 * k + 30)))
        for k in range(6)
    ]
    pts.append(pts[0])
    inner = ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts)
    return f"POLYGON (({inner}))"


def _admin_polygons() -> pa.Table:
    """3-level admin hierarchy (FIXTURES.md §2): countries > regions > cities.

    Deterministic, not rng-driven. Includes: overlapping same-level polygons
    over the top city (lexicographic tie-break test, mirroring
    detector.go:176-183), and one MULTIPOLYGON region.
    """
    rows = []  # (admin_id, level, parent_id, wkt)

    # level 0: 8 "countries" tiling the inhabited band
    l0 = []
    k = 0
    for lon0 in (-180, -90, 0, 90):
        for lat0 in (-60, 5):
            aid = f"C{k:02d}"
            rows.append((aid, 0, None, _rect(lon0, lat0, lon0 + 90, lat0 + 65)))
            l0.append((aid, lon0, lat0, lon0 + 90, lat0 + 65))
            k += 1

    def country_of(lon, lat):
        for aid, x0, y0, x1, y1 in l0:
            if x0 <= lon < x1 and y0 <= lat < y1:
                return aid
        return None

    # level 1: one ~2.4° rect per city + 30 background rects
    for i, (name, clat, clon, _) in enumerate(CITIES):
        aid = f"R{i:02d}-{name}"
        rows.append((aid, 1, country_of(clon, clat), _rect(clon - 1.2, clat - 1.2, clon + 1.2, clat + 1.2)))
    for i in range(30):
        lon0 = -170 + (i * 11) % 340
        lat0 = -55 + (i * 7) % 115
        aid = f"R{10 + i:02d}-bg"
        rows.append((aid, 1, country_of(lon0 + 2, lat0 + 2), _rect(lon0, lat0, lon0 + 4, lat0 + 4)))

    # level 2: hexagon per city + two overlapping same-level polygons over the
    # top city (tie-break: lexicographically smaller admin_id wins) + one
    # multipolygon district
    for i, (name, clat, clon, _) in enumerate(CITIES):
        aid = f"Z{i:02d}-{name}"
        rows.append((aid, 2, f"R{i:02d}-{name}", _hexagon(clon, clat, 0.6)))
    top = CITIES[0]
    rows.append(("Z90-overlap-a", 2, "R00-metropolis", _rect(top[2] - 0.3, top[1] - 0.3, top[2] + 0.3, top[1] + 0.3)))
    rows.append(("Z91-overlap-b", 2, "R00-metropolis", _rect(top[2] - 0.25, top[1] - 0.25, top[2] + 0.35, top[1] + 0.35)))
    c1 = CITIES[1]
    rows.append(
        (
            "Z92-multipart",
            2,
            "R01-hauptstadt",
            f"MULTIPOLYGON ((({c1[2]+0.7} {c1[1]-0.2}, {c1[2]+1.0} {c1[1]-0.2}, "
            f"{c1[2]+1.0} {c1[1]+0.2}, {c1[2]+0.7} {c1[1]+0.2}, {c1[2]+0.7} {c1[1]-0.2})), "
            f"(({c1[2]-1.0} {c1[1]-0.2}, {c1[2]-0.7} {c1[1]-0.2}, {c1[2]-0.7} {c1[1]+0.2}, "
            f"{c1[2]-1.0} {c1[1]+0.2}, {c1[2]-1.0} {c1[1]-0.2})))",
        )
    )
    # ~60 more small background hexes for STRtree exercise
    for i in range(60):
        lon0 = -160 + (i * 17) % 320
        lat0 = -50 + (i * 13) % 105
        rows.append((f"Z{30 + i:02d}-bg", 2, None, _hexagon(lon0, lat0, 0.5)))

    return pa.table(
        {
            "admin_id": pa.array([r[0] for r in rows], pa.string()),
            "level": pa.array([r[1] for r in rows], pa.int8()),
            "parent_id": pa.array([r[2] for r in rows], pa.string()),
            "wkt": pa.array([r[3] for r in rows], pa.string()),
        }
    )


def write_corpus(out_dir: str, n_pages: int, seed: int = SEED, n_page_files: int = 1,
                 html_noise_words: int = 0) -> Corpus:
    """Write the corpus as parquet under ``out_dir`` (pages split into
    ``n_page_files`` row-group-aligned files so Ray reads parallelize)."""
    import os

    import pyarrow.parquet as pq

    corpus = generate_pages(n_pages, seed, html_noise_words)
    os.makedirs(f"{out_dir}/pages", exist_ok=True)
    n = corpus.pages.num_rows
    per = (n + n_page_files - 1) // n_page_files
    for f in range(n_page_files):
        part = corpus.pages.slice(f * per, per)
        if part.num_rows:
            # small row groups let ray split large files into parallel read
            # tasks (a single-row-group 300MB file = one serial read/decode)
            pq.write_table(part, f"{out_dir}/pages/part-{f:04d}.parquet",
                           row_group_size=8192)
    pq.write_table(corpus.admin_polygons, f"{out_dir}/admin_polygons.parquet")
    pq.write_table(corpus.geoip_ranges, f"{out_dir}/geoip_ranges.parquet")
    return corpus
