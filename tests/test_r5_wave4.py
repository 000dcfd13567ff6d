"""Round-5 wave-4 operator units: brute-force / independent references for
the percolation census, the audience-overlap bitmask fold, RFM mean-split
segmentation, the Hill tail estimator, and the PCA power iteration. The
driver oracle checks these on the real tables; these tests hammer the
kernels on adversarial synthetic inputs (hot single cells, skewed users,
tied tail values) written as throwaway parquet dirs."""

import math
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(rows: dict) -> str:
    d = tempfile.mkdtemp(prefix="core_ray_wave4_")
    pq.write_table(pa.table(rows), os.path.join(d, "events.parquet"))
    return d


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


# ---------------------------------------------------------------- percolation


def _percolation_reference(eid, uid):
    """Pure-Python (dict/set/BFS) recomputation of geo_percolation."""
    cells = {}
    for e, u in zip(eid, uid):
        e, u = int(e), int(u)
        mlat = ((u % 12) * 11003) % 120000 + (u * 7919) % 2001 + (e * 13) % 1001
        mlon = (
            ((u % 12) * 104729) % 340000
            + (u * 104729) % 2001
            + (e * 29) % 1001
        )
        key = (mlon // 1000, mlat // 1000)
        cells[key] = cells.get(key, 0) + 1
    nc, tot = len(cells), sum(cells.values())
    avg = tot // nc
    rows = []
    for ti, tau in enumerate(
        [1, max(avg // 4, 1), max(avg // 2, 1), max(avg, 1)], start=1
    ):
        occ = {k for k, c in cells.items() if c >= tau}
        if not occ:
            continue
        seen, sizes = set(), []
        for start in occ:
            if start in seen:
                continue
            stack, comp = [start], 0
            seen.add(start)
            while stack:
                gx, gy = stack.pop()
                comp += 1
                for nb in ((gx + 1, gy), (gx - 1, gy), (gx, gy + 1), (gx, gy - 1)):
                    if nb in occ and nb not in seen:
                        seen.add(nb)
                        stack.append(nb)
            sizes.append(comp)
        rows.append((ti, tau, len(occ), len(sizes), max(sizes)))
    return rows


def test_percolation_matches_bfs_reference(ray_session):
    from core_ray.queries import geo_percolation

    rng = _rng(7)
    # a hot blob (many events on few users -> dense city cells) plus sparse
    # scatter, so the threshold sweep actually separates the clusters
    eid = np.r_[rng.integers(0, 1 << 40, 3000), np.arange(500) * 977]
    uid = np.r_[rng.integers(0, 50, 3000), rng.integers(0, 1 << 20, 500)]
    d = _write_events(
        {"event_id": pa.array(eid, pa.int64()), "user_id": pa.array(uid, pa.int64())}
    )
    got = geo_percolation(d)
    want = _percolation_reference(eid, uid)
    assert got.num_rows == len(want)
    for i, (ti, tau, occ, ncl, big) in enumerate(want):
        assert got["thr_idx"][i].as_py() == ti
        assert got["tau"][i].as_py() == tau
        assert got["n_occupied"][i].as_py() == occ
        assert got["n_clusters"][i].as_py() == ncl
        assert got["largest"][i].as_py() == big


# ---------------------------------------------------------- audience overlap


def test_audience_overlap_matches_set_reference(ray_session):
    from core_ray.queries import events_audience_overlap

    rng = _rng(11)
    types = np.array(["a", "b", "c", "d", "e", "f"])
    n = 5000
    uid = rng.integers(0, 300, n)
    # skew: type f only on a handful of users, so small exact sets matter
    ty = types[np.minimum(rng.integers(0, 12, n), 5)]
    d = _write_events(
        {
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(ty.tolist(), pa.string()),
        }
    )
    got = events_audience_overlap(d)
    sets: dict[str, set] = {}
    for u, t in zip(uid, ty):
        sets.setdefault(str(t), set()).add(int(u))
    want = {}
    names = sorted(sets)
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            both = len(sets[a] & sets[b])
            if both:
                want[(a, b)] = (len(sets[a]), len(sets[b]), both)
    assert got.num_rows == len(want)
    for i in range(got.num_rows):
        key = (got["type_a"][i].as_py(), got["type_b"][i].as_py())
        na, nb, nab = want[key]
        assert got["n_a"][i].as_py() == na
        assert got["n_b"][i].as_py() == nb
        assert got["n_both"][i].as_py() == nab
        assert got["jaccard"][i].as_py() == nab / (na + nb - nab)


# ------------------------------------------------------------- RFM segments


def test_rfm_segments_matches_dict_reference(ray_session):
    from core_ray.queries import events_rfm_segments

    rng = _rng(13)
    n = 4000
    uid = rng.integers(0, 250, n)
    day0 = np.int64(20000) * 86400000000
    ts = day0 + rng.integers(0, 60, n) * 86400000000 + rng.integers(0, 1000, n)
    cents = rng.integers(1, 50000, n)
    d = _write_events(
        {
            "user_id": pa.array(uid, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "value": pa.array(cents.astype(np.float64) / 100.0, pa.float64()),
        }
    )
    got = events_rfm_segments(d)
    # pure-dict reference (note: cents reconstructed via round-half-away,
    # matching sql_round on value*100)
    per: dict[int, list] = {}
    for u, t, c in zip(uid, ts, cents):
        e = per.setdefault(int(u), [0, 0, -1])
        e[0] += 1
        e[1] += int(c)
        e[2] = max(e[2], int(t) // 86400000000)
    nu = len(per)
    tf = sum(e[0] for e in per.values())
    tm = sum(e[1] for e in per.values())
    sl = sum(e[2] for e in per.values())
    maxd = max(e[2] for e in per.values())
    thr_f, thr_m, thr_r = tf // nu, tm // nu, (nu * maxd - sl) // nu
    want_n = [0] * 8
    want_s = [0] * 8
    for f, m, lastd in per.values():
        sg = (
            (4 if (maxd - lastd) <= thr_r else 0)
            + (2 if f > thr_f else 0)
            + (1 if m > thr_m else 0)
        )
        want_n[sg] += 1
        want_s[sg] += m
    want = [(g, want_n[g], want_s[g]) for g in range(8) if want_n[g]]
    assert got.num_rows == len(want)
    for i, (g, wn, ws) in enumerate(want):
        assert got["segment"][i].as_py() == g
        assert got["n_users"][i].as_py() == wn
        assert got["sum_cents"][i].as_py() == ws


# ---------------------------------------------------------------- Hill tail


def test_hill_tail_matches_loop_reference(ray_session):
    from core_ray.queries import events_hill_tail
    from core_ray.rounding import sql_round_np

    rng = _rng(17)
    # Pareto(alpha=1.5) tail with deliberate TIES at the k-boundary
    v = (rng.pareto(1.5, 3000) + 1.0) * 10.0
    v[:50] = v[50]  # a tied plateau inside the top-k
    d = _write_events(
        {
            "event_id": pa.array(np.arange(len(v), dtype=np.int64)),
            "value": pa.array(v, pa.float64()),
        }
    )
    got = events_hill_tail(d)
    top = np.sort(v)[::-1][:201]
    x_ref = float(top[200])
    sum_q = 0
    for x in top[:200]:
        sum_q += int(sql_round_np(np.array([math.log(x / x_ref) * 1e6]), 0)[0])
    assert got["n_tail"][0].as_py() == 200
    assert got["x_kplus1"][0].as_py() == x_ref
    assert got["sum_lnratio_micro"][0].as_py() == sum_q
    assert got["hill_alpha"][0].as_py() == 200 * 1000000 / sum_q
    # the estimate should sit near the true tail exponent
    assert 1.0 < got["hill_alpha"][0].as_py() < 2.2


# ------------------------------------------------------------ PCA power iter


def test_pca_power_matches_dense_eig(ray_session):
    """The golden oracle pins determinism; this pins MATH: the returned
    direction must align with the dominant eigenvector of A^T A and the
    dim=-1 row with its eigenvalue."""
    from core_ray.queries import emb_pca_power

    rng = _rng(19)
    n, dim = 400, 12
    # planted dominant direction + noise
    u = rng.normal(size=dim)
    u /= np.linalg.norm(u)
    x = np.outer(rng.normal(size=n) * 3.0, u) + rng.normal(size=(n, dim)) * 0.3
    d = tempfile.mkdtemp(prefix="core_ray_wave4_")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [row.astype(np.float32).tolist() for row in x],
                    pa.list_(pa.float32()),
                ),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    got = emb_pca_power(d)
    v = np.array([got["value"][i].as_py() for i in range(dim)])
    lam = got["value"][dim].as_py()
    x64 = np.array(
        [
            np.array(r, dtype=np.float32).astype(np.float64)
            for r in x
        ]
    )
    w, vecs = np.linalg.eigh(x64.T @ x64)
    top = vecs[:, np.argmax(w)]
    assert abs(float(np.dot(v, top))) > 0.999
    assert abs(lam - float(w.max())) / float(w.max()) < 1e-3
