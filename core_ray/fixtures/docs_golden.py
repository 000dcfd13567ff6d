"""Independent pure-Python goldens for the sketch/ANN queries.

Closes VERDICT r2 item 1: the five formerly rows-only queries
(doc_fingerprint, doc_minhash_pairs, doc_simhash_pairs, emb_ann_lsh,
emb_ann_ivf) get hard DuckDB oracles via the same golden-parquet trick the
pages_* queries use (reference analog: everything golden-snapshot-checked,
tests/integration/snapshot.go:216-276): a slow, single-process, independently
written implementation of each operator's SPEC is materialized as parquet at
the driver-correctness scale (sf0.01) and the oracle SQL just reads it back,
so the driver's row/schema/value-hash compare enforces engine == golden.

Independence discipline:
- doc_fingerprint: each window hash is evaluated DIRECTLY as the polynomial
  sum(h_i * base^(w-1-i)) mod p per window position — independently validates
  the engine's rolling Karp-Rabin recurrence (text/analysis.py).
- minhash / simhash: signatures, banding, bucketing and pair generation are
  straight-line Python dict/loop code over Python ints — independently
  validates the engine's vectorized numpy kernels, its exact-text collapse
  (rep/star contract) and its distributed shuffle plumbing. Spec constants
  (permutation seeds, band layout, hash mixes) are shared BY DESIGN: they
  are the operator's published parameters, not implementation detail.
- ANN (LSH / IVF): approximate by contract, so the golden is a fixed-seed
  DETERMINISM check (VERDICT r2 item 1): the same published algorithm run
  as one straight-line numpy process — validates that distributed bucketing,
  probing and merge reproduce the single-process result exactly.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

from core_ray.rounding import sql_round_np

_M64 = (1 << 64) - 1
_GOLD = 0x9E3779B97F4A7C15


def _splitmix(z: int) -> int:
    """Full splitmix64 finalizer (spec shared with text/dedup.shingle_hashes)."""
    z = (z + _GOLD) & _M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & _M64
    return z ^ (z >> 31)


def _avalanche32(h: int) -> int:
    """Band-hash finalizer (spec shared with text/dedup._band_hashes)."""
    h = ((h ^ (h >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    h = ((h ^ (h >> 27)) * 0x94D049BB133111EB) & _M64
    return (h ^ (h >> 31)) & 0xFFFFFFFF


# ---------------- fingerprint ----------------


def golden_fingerprints(doc_ids, texts, window: int = 8) -> pa.Table:
    base, mod = 1000003, (1 << 61) - 1
    out = []
    for t in texts:
        hs = [zlib.crc32(w.encode("utf-8")) & 0xFFFFFFFF for w in t.split()]
        if len(hs) < window:
            acc = 1469598103934665603
            for h in hs:
                acc = ((acc ^ h) * 1099511628211) & _M64
            out.append(acc)
            continue
        # direct polynomial evaluation per window (no rolling recurrence)
        powers = [pow(base, window - 1 - j, mod) for j in range(window)]
        best = None
        for i in range(len(hs) - window + 1):
            v = sum(hs[i + j] * powers[j] for j in range(window)) % mod
            if best is None or v < best:
                best = v
        out.append(best)
    return pa.table(
        {
            "doc_id": pa.array(list(doc_ids), pa.int64()),
            "fingerprint": pa.array(out, pa.uint64()),
        }
    )


# ---------------- minhash near-dup pairs ----------------

_N_PERM, _N_BANDS = 64, 16
_ROWS_PER_BAND = _N_PERM // _N_BANDS


def _perm_tables():
    rng = np.random.default_rng(1234)
    a = (rng.integers(1, 1 << 61, _N_PERM, dtype=np.uint64) | np.uint64(1)).tolist()
    b = rng.integers(0, 1 << 61, _N_PERM, dtype=np.uint64).tolist()
    return [int(x) for x in a], [int(x) for x in b]


def _py_minhash_sig(text: str, a: list, b: list, k: int = 3) -> list[int]:
    toks = text.split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return [_M64] * _N_PERM
    hs = [_splitmix(zlib.crc32(s.encode("utf-8"))) for s in shingles]
    return [min((a[j] * h + b[j]) & _M64 for h in hs) for j in range(_N_PERM)]


def _collapse_by_md5(doc_ids, texts):
    """Exact-text collapse: min-id representative per distinct text + star
    members (the cluster-granularity contract of minhash_near_dups)."""
    groups: dict[bytes, list[int]] = {}
    text_of: dict[int, str] = {}
    for i, t in zip(doc_ids, texts):
        groups.setdefault(hashlib.md5(t.encode("utf-8")).digest(), []).append(int(i))
        text_of[int(i)] = t
    reps, stars = [], []
    for members in groups.values():
        members.sort()
        reps.append(members[0])
        stars.extend((members[0], m) for m in members[1:])
    return reps, stars, text_of


def golden_minhash_pairs(doc_ids, texts, k: int = 3, threshold: float = 0.5) -> pa.Table:
    a, b = _perm_tables()
    reps, stars, text_of = _collapse_by_md5(doc_ids, texts)
    sig = {r: _py_minhash_sig(text_of[r], a, b, k) for r in reps}
    buckets: dict[tuple[int, int], list[int]] = {}
    for r in sorted(reps):
        s = sig[r]
        for band in range(_N_BANDS):
            h = 0
            for lane in s[band * _ROWS_PER_BAND : (band + 1) * _ROWS_PER_BAND]:
                h = (h * _GOLD + lane) & _M64
            buckets.setdefault((band, _avalanche32(h)), []).append(r)
    cand = set()
    for members in buckets.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cand.add((members[i], members[j]))
    id_a, id_b, est = [], [], []
    for x, y in sorted(cand):
        e = sum(u == v for u, v in zip(sig[x], sig[y])) / _N_PERM
        if e >= threshold:
            id_a.append(x)
            id_b.append(y)
            est.append(e)  # m/64 is always exact at <=6 decimals
    for x, y in stars:
        id_a.append(x)
        id_b.append(y)
        est.append(1.0)
    return pa.table(
        {
            "id_a": pa.array(id_a, pa.int64()),
            "id_b": pa.array(id_b, pa.int64()),
            "jaccard_est": pa.array(est, pa.float64()),
        }
    )


# ---------------- simhash near-dup pairs ----------------


def _py_simhash(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    acc = [0] * 64
    for t in toks:
        z = (zlib.crc32(t.encode("utf-8")) + _GOLD) & _M64
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & _M64
        z = z ^ (z >> 31)  # the engine's simhash64 token mix (2-step)
        for bit in range(64):
            acc[bit] += 1 if (z >> bit) & 1 else -1
    out = 0
    for bit in range(64):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


def golden_simhash_pairs(doc_ids, texts, max_hamming: int = 3) -> pa.Table:
    reps, stars, text_of = _collapse_by_md5(doc_ids, texts)
    sh = {r: _py_simhash(text_of[r]) for r in reps}
    buckets: dict[tuple[int, int], list[int]] = {}
    for r in sorted(reps):
        for band in range(4):
            buckets.setdefault((band, (sh[r] >> (16 * band)) & 0xFFFF, ), []).append(r)
    found: dict[tuple[int, int], int] = {}
    for members in buckets.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                x, y = members[i], members[j]
                d = bin(sh[x] ^ sh[y]).count("1")
                if d <= max_hamming:
                    found[(x, y)] = d
    id_a = [p[0] for p in sorted(found)]
    id_b = [p[1] for p in sorted(found)]
    ham = [found[p] for p in sorted(found)]
    for x, y in stars:
        id_a.append(x)
        id_b.append(y)
        ham.append(0)
    return pa.table(
        {
            "id_a": pa.array(id_a, pa.int64()),
            "id_b": pa.array(id_b, pa.int64()),
            "hamming": pa.array(ham, pa.int32()),
        }
    )


# ---------------- ANN determinism goldens ----------------


def _emb_matrix(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = np.array(tbl["embedding"].to_pylist(), dtype=np.float64)
    return ids, x


def _norm(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)


def golden_ann_lsh(tbl: pa.Table, query_modulus: int = 100, k: int = 5,
                   n_planes: int = 5) -> pa.Table:
    ids, x = _emb_matrix(tbl)
    planes = np.random.default_rng(99).normal(size=(n_planes, x.shape[1]))
    bits = (x @ planes.T) > 0
    bucket = np.zeros(len(x), dtype=np.int64)
    for b in range(n_planes):
        bucket |= bits[:, b].astype(np.int64) << b
    q_ids = ids[ids % query_modulus == 0]
    out_q, out_v, out_r, out_s = [], [], [], []
    for bk in np.unique(bucket):
        m = bucket == bk
        b_ids = ids[m]
        qs = [q for q in q_ids if (b_ids == q).any()]
        if not qs:
            continue
        xn = _norm(x[m])
        is_q = np.isin(b_ids, np.asarray(qs))
        sims = xn[is_q] @ xn.T  # same shape as the engine's per-bucket matmul
        for qi, qid in enumerate(b_ids[is_q]):
            row = sims[qi].copy()
            row[b_ids == qid] = -np.inf
            order = np.lexsort((b_ids, -row))[: min(k, int(np.isfinite(row).sum()))]
            for r, ci in enumerate(order):
                out_q.append(int(qid))
                out_v.append(int(b_ids[ci]))
                out_r.append(r)
                out_s.append(float(sql_round_np(row[ci], 6)))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
            "sim": pa.array(out_s, pa.float64()),
        }
    )


def golden_ann_ivf(tbl: pa.Table, query_modulus: int = 100, k: int = 5,
                   n_clusters: int = 16, nprobe: int = 3,
                   train_sample: int = 2048) -> pa.Table:
    ids, x = _emb_matrix(tbl)
    xs = _norm(x[:train_sample])
    rng = np.random.default_rng(7)
    centers = xs[rng.choice(len(xs), size=min(n_clusters, len(xs)), replace=False)]
    for _ in range(10):
        d = ((xs[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(centers)):
            m = assign == c
            if m.any():
                centers[c] = xs[m].mean(axis=0)
    centers = _norm(centers)
    xn = _norm(x)
    sims_c = xn @ centers.T
    home = sims_c.argmax(axis=1)
    q_mask = ids % query_modulus == 0
    out_q, out_v, out_r, out_s = [], [], [], []
    for qi in np.nonzero(q_mask)[0]:
        probes = np.argsort(-sims_c[qi], kind="stable")[:nprobe]
        cand = np.nonzero(np.isin(home, probes))[0]
        cand = cand[ids[cand] != ids[qi]]
        row = xn[cand] @ xn[qi]
        order = np.lexsort((ids[cand], -row))[:k]
        for r, ci in enumerate(order):
            out_q.append(int(ids[qi]))
            out_v.append(int(ids[cand][ci]))
            out_r.append(r)
            out_s.append(float(sql_round_np(row[ci], 6)))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "rank": pa.array(out_r, pa.int32()),
            "sim": pa.array(out_s, pa.float64()),
        }
    )


# ---------------- near-dup cluster assignment (connected components) ----------------


def golden_dup_clusters(pairs: pa.Table) -> pa.Table:
    """Independent oracle for stages/cc.py: textbook union-find with path
    compression over the (already-golden-checked) minhash pair list; every
    node in at least one pair gets its component's minimum doc id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    ids_a = pairs["id_a"].to_pylist()
    ids_b = pairs["id_b"].to_pylist()
    for a, b in zip(ids_a, ids_b):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = sorted(parent)
    comps = [find(n) for n in nodes]
    return pa.table(
        {
            "node": pa.array(nodes, pa.int64()),
            "comp": pa.array(comps, pa.int64()),
        }
    )


# ---------------- distributed Lloyd's k-means (iterative dataflow) ----------------


def golden_pca_power(tbl: pa.Table, iters: int = 8) -> pa.Table:
    """Single-process spec oracle for emb_pca_power: top principal
    direction of the (uncentered) Gram matrix A^T A by power iteration.
    Deterministic spec: v0 = 1/sqrt(d) on every axis rounded to 6
    decimals; each iteration computes y = A^T (A v), renormalizes by the
    double sqrt of the double sum of squares, and re-rounds to 6 — the
    per-iteration rounding is the cross-path float-determinism contract
    (same policy as golden_kmeans). Output = one row per dimension with
    the final loading, plus a dim = -1 summary row carrying the Rayleigh
    eigenvalue ||A v||^2 rounded to 6."""
    _, x = _emb_matrix(tbl)
    d = x.shape[1]
    v = sql_round_np(np.full(d, 1.0) / np.sqrt(float(d)), 6)
    for _ in range(iters):
        z = x @ v
        y = x.T @ z
        nrm = float(np.sqrt((y * y).sum()))
        v = sql_round_np(y / nrm, 6)
    z = x @ v
    lam = float(sql_round_np(np.array([(z * z).sum()]), 6)[0])
    dims = np.arange(d, dtype=np.int64)
    return pa.table(
        {
            "dim": pa.array(np.r_[dims, [-1]], pa.int64()),
            "value": pa.array(np.r_[v, [lam]], pa.float64()),
        }
    )


def golden_kmeans(tbl: pa.Table, k: int = 8, iters: int = 5) -> pa.Table:
    """Single-process spec oracle for emb_kmeans: init = the embeddings of
    the k smallest vec_ids (in vec_id order), centers rounded to 6 decimals;
    each iteration assigns every vector to its nearest center (squared
    euclidean, ties -> lowest center index) and recomputes means (an empty
    cluster keeps its center), re-rounding centers to 6 — the per-iteration
    rounding is the cross-path float-determinism contract (same policy as
    stages/pagerank's 1e-12). Output = assignment against the final rounded
    centers."""
    ids, x = _emb_matrix(tbl)
    order = np.argsort(ids)
    centers = sql_round_np(x[order[:k]], 6)
    for _ in range(iters + 1):
        d = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        newc = centers.copy()
        for c in range(len(centers)):
            m = assign == c
            if m.any():
                newc[c] = x[m].sum(axis=0) / m.sum()
        centers = sql_round_np(newc, 6)
    # `assign` above is the pass against the final centers: the loop runs
    # iters+1 times and the last update is discarded.
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(assign.astype(np.int32), pa.int32()),
        }
    )


# ---------------- per-tile convex hulls (grouped vector geometry) ----------------


def golden_tile_hulls(doc_ids, zoom: int = 4) -> pa.Table:
    """Independent oracle for geo_convex_hull: derives the documents'
    spec coordinate lattice (lat = ((id*7919) % 140000)/1000 - 70,
    lon = ((id*104729) % 360000)/1000 - 180), buckets points into z/x/y
    web-mercator tiles, and computes each tile's convex hull with a
    dict/loop Andrew's monotone chain over DISTINCT points — strict turns
    (collinear vertices dropped), output CCW starting at the
    lexicographically smallest (lon, lat) vertex, 1-or-2-point tiles pass
    through in (lon, lat) order."""
    import math

    n = float(1 << zoom)
    tiles: dict[tuple[int, int], set] = {}
    for d in doc_ids:
        d = int(d)
        lat = ((d * 7919) % 140000) / 1000.0 - 70.0
        lon = ((d * 104729) % 360000) / 1000.0 - 180.0
        x = int(min(n - 1, max(0.0, math.floor((lon + 180.0) / 360.0 * n))))
        yv = 1.0 - math.log(math.tan(math.radians(lat))
                            + 1.0 / math.cos(math.radians(lat))) / math.pi
        y = int(min(n - 1, max(0.0, math.floor(yv / 2.0 * n))))
        tiles.setdefault((x, y), set()).add((lon, lat))

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    out_x, out_y, out_seq, out_lat, out_lon = [], [], [], [], []
    for (tx, ty) in sorted(tiles):
        pts = sorted(tiles[(tx, ty)])
        if len(pts) <= 2:
            hull = pts
        else:
            lower = []
            for p in pts:
                while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
                    lower.pop()
                lower.append(p)
            upper = []
            for p in reversed(pts):
                while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
                    upper.pop()
                upper.append(p)
            hull = lower[:-1] + upper[:-1]
            if len(hull) == 0:  # all points collinear: keep the two extremes
                hull = [pts[0], pts[-1]]
        for i, (lon, lat) in enumerate(hull):
            out_x.append(tx)
            out_y.append(ty)
            out_seq.append(i)
            out_lat.append(lat)
            out_lon.append(lon)
    return pa.table(
        {
            "tile_x": pa.array(out_x, pa.int64()),
            "tile_y": pa.array(out_y, pa.int64()),
            "seq": pa.array(out_seq, pa.int32()),
            "lat": pa.array(out_lat, pa.float64()),
            "lon": pa.array(out_lon, pa.float64()),
        }
    )


def golden_traj_simplify(event_ids, user_ids, ts_us, eps: float = 0.8) -> pa.Table:
    """Recursive pure-Python Douglas-Peucker over each user's (ts,
    event_id)-ordered track on the seq-varying city coordinates (the spec
    shared with queries.events_stay_points). Distance is to the INFINITE
    line through the endpoints; the split point is the FIRST index of the
    maximum; comparisons stay squared (cross^2 > eps^2 * seg2) so no sqrt
    enters either implementation. Independently validates the engine's
    vectorized stack-based kernel (queries.geo_traj_simplify)."""
    rows = sorted(zip(user_ids, ts_us, event_ids))
    pts: dict = {}
    seqc: dict = {}
    for u, _t, e in rows:
        s = seqc.get(u, 0)
        seqc[u] = s + 1
        city = (u * 7 + s // 20) % 12
        lat = (
            ((city * 11003) % 120000) / 1000.0 - 60.0
            + ((u * 7919) % 2001) / 1000.0 - 1.0
            + ((e * 13) % 1001) / 1000.0 - 0.5
        )
        lon = (
            ((city * 104729) % 340000) / 1000.0 - 170.0
            + ((u * 104729) % 2001) / 1000.0 - 1.0
            + ((e * 29) % 1001) / 1000.0 - 0.5
        )
        pts.setdefault(u, []).append((e, lat, lon))
    eps2 = eps * eps
    out_u, out_e = [], []

    def rec(p, i, j, keep):
        if j <= i + 1:
            return
        ay, ax = p[i][1], p[i][2]
        by, bx = p[j][1], p[j][2]
        dx = bx - ax
        dy = by - ay
        seg2 = dx * dx + dy * dy
        best, bestd = -1, -1.0
        for k in range(i + 1, j):
            py, px = p[k][1], p[k][2]
            if seg2 == 0.0:
                d = (px - ax) * (px - ax) + (py - ay) * (py - ay)
                thr = eps2
            else:
                c = dx * (py - ay) - dy * (px - ax)
                d = c * c
                thr = eps2 * seg2
            if d > bestd:
                best, bestd = k, d
        if bestd > thr:
            keep[best] = True
            rec(p, i, best, keep)
            rec(p, best, j, keep)

    for u in sorted(pts):
        p = pts[u]
        keep = [False] * len(p)
        keep[0] = keep[-1] = True
        if len(p) > 2:
            rec(p, 0, len(p) - 1, keep)
        for k, kept in enumerate(keep):
            if kept:
                out_u.append(u)
                out_e.append(p[k][0])
    return pa.table(
        {
            "user_id": pa.array(out_u, pa.int64()),
            "event_id": pa.array(out_e, pa.int64()),
        }
    )


def golden_bpe_merges(texts, n_merges: int = 8) -> pa.Table:
    """Independent straight-line BPE vocabulary induction (Sennrich/GPT
    style, spec shared with queries.doc_bpe_merges): whitespace words ->
    character symbol sequences weighted by word frequency; each round
    counts adjacent symbol pairs (overlapping occurrences all count),
    merges the (count desc, left asc, right asc) winner everywhere
    (greedy left-to-right, non-overlapping), and records it. Pure
    dict/loop Python over the word-frequency map — no numpy, no sharing
    with the engine's vectorized path."""
    freq: dict = {}
    for t in texts:
        for w in t.split():
            freq[w] = freq.get(w, 0) + 1
    seqs = {w: tuple(w) for w in freq}
    out_rank, out_left, out_right, out_cnt = [], [], [], []
    for rank in range(1, n_merges + 1):
        counts: dict = {}
        for w, syms in seqs.items():
            f = freq[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), cnt = best
        merged = left + right
        new_seqs = {}
        for w, syms in seqs.items():
            res = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_seqs[w] = tuple(res)
        seqs = new_seqs
        out_rank.append(rank)
        out_left.append(left)
        out_right.append(right)
        out_cnt.append(cnt)
    return pa.table(
        {
            "rank": pa.array(out_rank, pa.int64()),
            "left": pa.array(out_left, pa.string()),
            "right": pa.array(out_right, pa.string()),
            "merged": pa.array([l + r for l, r in zip(out_left, out_right)], pa.string()),
            "cnt": pa.array(out_cnt, pa.int64()),
        }
    )


def golden_pq_distortion(tbl: pa.Table, m: int = 4, k: int = 16,
                         iters: int = 5) -> pa.Table:
    """Independent straight-line product quantization (spec shared with
    queries.emb_pq_distortion): the embedding splits into m contiguous
    subspaces; each runs Lloyd's k-means with init = sub-vectors of the k
    smallest vec_ids, nearest-center assignment (squared euclidean, ties
    -> lowest index), mean update (empty keeps center), centers rounded
    to 6 decimals per iteration. Per-vector loops over Python floats —
    no matmul, no sharing with the engine's vectorized path."""
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    vecs = [list(map(float, v)) for v in tbl["embedding"].to_pylist()]
    order = np.argsort(ids)
    vecs = [vecs[i] for i in order]
    dim = len(vecs[0])
    sub = dim // m
    out_s, out_mse, out_used = [], [], []
    for s in range(m):
        xs = [v[s * sub:(s + 1) * sub] for v in vecs]
        centers = [list(x) for x in xs[:k]]
        centers = [[float(sql_round_np(c, 6)) for c in row] for row in centers]
        for _ in range(iters):
            sums = [[0.0] * sub for _ in range(k)]
            cnts = [0] * k
            for x in xs:
                best, bd = 0, None
                for ci in range(k):
                    d = 0.0
                    for a, b in zip(x, centers[ci]):
                        d += (a - b) * (a - b)
                    if bd is None or d < bd:
                        bd, best = d, ci
                cnts[best] += 1
                for j in range(sub):
                    sums[best][j] += x[j]
            for ci in range(k):
                if cnts[ci] > 0:
                    centers[ci] = [
                        float(sql_round_np(sums[ci][j] / cnts[ci], 6))
                        for j in range(sub)
                    ]
        sq = 0.0
        used = set()
        for x in xs:
            best, bd = 0, None
            for ci in range(k):
                d = 0.0
                for a, b in zip(x, centers[ci]):
                    d += (a - b) * (a - b)
                if bd is None or d < bd:
                    bd, best = d, ci
            sq += bd
            used.add(best)
        out_s.append(s)
        out_mse.append(float(sql_round_np(sq / len(xs), 6)))
        out_used.append(len(used))
    return pa.table(
        {
            "subspace": pa.array(out_s, pa.int64()),
            "mse": pa.array(out_mse, pa.float64()),
            "n_used_centroids": pa.array(out_used, pa.int64()),
        }
    )


def golden_bpe_apply(texts, n_merges: int = 8) -> pa.Table:
    """Independent encode-side BPE evaluation (spec shared with
    queries.doc_bpe_apply): learns the merges exactly as
    golden_bpe_merges, then reports the total corpus symbol count and
    compression ratio after each merge prefix r = 0..n_merges. Pure
    dict/loop Python."""
    freq: dict = {}
    for t in texts:
        for w in t.split():
            freq[w] = freq.get(w, 0) + 1
    seqs = {w: tuple(w) for w in freq}
    totals = [sum(len(s) * f for s, f in ((seqs[w], freq[w]) for w in freq))]
    for _ in range(n_merges):
        counts: dict = {}
        for w, syms in seqs.items():
            f = freq[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (left, right), _c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merged = left + right
        new_seqs = {}
        for w, syms in seqs.items():
            res = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            new_seqs[w] = tuple(res)
        seqs = new_seqs
        totals.append(sum(len(seqs[w]) * freq[w] for w in freq))
    base = float(totals[0])
    return pa.table(
        {
            "n_merges": pa.array(list(range(len(totals))), pa.int64()),
            "total_symbols": pa.array(totals, pa.int64()),
            "compression": pa.array(
                [float(sql_round_np(base / t, 6)) for t in totals], pa.float64()
            ),
        }
    )


def _pq_train_golden(vecs, m: int, k: int, iters: int):
    """Shared straight-line PQ trainer for the PQ goldens (identical spec
    to golden_pq_distortion's inline loop)."""
    dim = len(vecs[0])
    sub = dim // m
    books = []
    for s in range(m):
        xs = [v[s * sub:(s + 1) * sub] for v in vecs]
        centers = [[float(sql_round_np(c, 6)) for c in row] for row in xs[:k]]
        for _ in range(iters):
            sums = [[0.0] * sub for _ in range(k)]
            cnts = [0] * k
            for x in xs:
                best, bd = 0, None
                for ci in range(k):
                    d = 0.0
                    for a, b in zip(x, centers[ci]):
                        d += (a - b) * (a - b)
                    if bd is None or d < bd:
                        bd, best = d, ci
                cnts[best] += 1
                for j in range(sub):
                    sums[best][j] += x[j]
            for ci in range(k):
                if cnts[ci] > 0:
                    centers[ci] = [
                        float(sql_round_np(sums[ci][j] / cnts[ci], 6))
                        for j in range(sub)
                    ]
        books.append(centers)
    return books, sub


def golden_pq_recall(tbl: pa.Table, m: int = 4, k: int = 16, iters: int = 5,
                     query_modulus: int = 100, topk: int = 10) -> pa.Table:
    """Independent straight-line PQ asymmetric-distance recall (spec shared
    with queries.emb_pq_recall): train codebooks as golden_pq_distortion,
    encode every vector to its nearest per-subspace centroid, rank by the
    ADC distance sum_s ||q_s - c_s[code]||^2 (sequential adds, ties ->
    lower vec_id) vs the exact squared-euclidean ranking, and report
    top-k overlap per probe."""
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    vecs = [list(map(float, v)) for v in tbl["embedding"].to_pylist()]
    order = np.argsort(ids)
    ids = [int(ids[i]) for i in order]
    vecs = [vecs[i] for i in order]
    books, sub = _pq_train_golden(vecs, m, k, iters)
    codes = []
    for v in vecs:
        cv = []
        for s in range(m):
            x = v[s * sub:(s + 1) * sub]
            best, bd = 0, None
            for ci in range(k):
                d = 0.0
                for a, b in zip(x, books[s][ci]):
                    d += (a - b) * (a - b)
                if bd is None or d < bd:
                    bd, best = d, ci
            cv.append(best)
        codes.append(cv)
    out_q, out_ov, out_rec = [], [], []
    for qi, qid in enumerate(ids):
        if qid % query_modulus != 0:
            continue
        q = vecs[qi]
        exact, adc = [], []
        for vi, vid in enumerate(ids):
            if vid == qid:
                continue
            de = 0.0
            for a, b in zip(q, vecs[vi]):
                de += (a - b) * (a - b)
            da = 0.0
            for s in range(m):
                qs = q[s * sub:(s + 1) * sub]
                cs = books[s][codes[vi][s]]
                dd = 0.0
                for a, b in zip(qs, cs):
                    dd += (a - b) * (a - b)
                da += dd
            exact.append((de, vid))
            adc.append((da, vid))
        ex_top = {v for _, v in sorted(exact)[:topk]}
        adc_top = {v for _, v in sorted(adc)[:topk]}
        ov = len(ex_top & adc_top)
        out_q.append(qid)
        out_ov.append(ov)
        out_rec.append(float(sql_round_np(ov / float(topk), 6)))
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "n_overlap": pa.array(out_ov, pa.int64()),
            "recall": pa.array(out_rec, pa.float64()),
        }
    )


def golden_frechet_pairs(
    event_ids, user_ids, ts_us, k: int = 16, max_users: int = 512
) -> pa.Table:
    """Pure-Python discrete Frechet distances (Eiter & Mannila 1994)
    between every pair of same-home-city user trajectories: each user's
    first ``k`` points in (ts, event_id) order on the INTEGER
    milli-degree lattice of the seq-varying city spec (with k <= 20 the
    truncated track never leaves its s=0 home city, so the constant
    city/user offsets cancel in every coordinate DIFFERENCE and the
    squared distances are exact int). Dict/loop DP — independently
    validates the engine's pair-vectorized full-grid kernel."""
    rows = sorted(zip(user_ids, ts_us, event_ids))
    pts: dict = {}
    for u, _t, e in rows:
        tr = pts.setdefault(u, [])
        if len(tr) < k:
            city = (u * 7) % 12
            x = ((city * 104729) % 340000) + ((u * 104729) % 2001) + ((e * 29) % 1001)
            y = ((city * 11003) % 120000) + ((u * 7919) % 2001) + ((e * 13) % 1001)
            tr.append((x, y))
    by_city: dict = {}
    for u in sorted(pts):
        by_city.setdefault((u * 7) % 12, []).append(u)
    out = []
    for _c, us in sorted(by_city.items()):
        us = us[:max_users]
        for ai in range(len(us)):
            for bi in range(ai + 1, len(us)):
                a, b = pts[us[ai]], pts[us[bi]]
                F: dict = {}
                for i in range(len(a)):
                    for j in range(len(b)):
                        d = (a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2
                        if i == 0 and j == 0:
                            best = d
                        elif i == 0:
                            best = max(F[(0, j - 1)], d)
                        elif j == 0:
                            best = max(F[(i - 1, 0)], d)
                        else:
                            best = max(
                                min(F[(i - 1, j)], F[(i, j - 1)], F[(i - 1, j - 1)]),
                                d,
                            )
                        F[(i, j)] = best
                out.append(
                    (us[ai], us[bi], len(a), len(b), F[(len(a) - 1, len(b) - 1)])
                )
    out.sort()
    return pa.table(
        {
            "user_lo": pa.array([r[0] for r in out], pa.int64()),
            "user_hi": pa.array([r[1] for r in out], pa.int64()),
            "n_lo": pa.array([r[2] for r in out], pa.int64()),
            "n_hi": pa.array([r[3] for r in out], pa.int64()),
            "frechet_sq": pa.array([r[4] for r in out], pa.int64()),
        }
    )
