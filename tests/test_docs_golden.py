"""Engine vs independent pure-Python goldens (fixtures/docs_golden.py) on a
small engineered corpus — verifies the golden logic itself at a second scale
(the driver exercises it at sf0.01), including the exact-dup collapse / star
contract and the ANN determinism contract."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from core_ray.fixtures import docs_golden as dg


def _canon(t: pa.Table) -> pa.Table:
    t = t.select(sorted(t.column_names))
    idx = pa.compute.sort_indices(t, sort_keys=[(c, "ascending") for c in t.column_names])
    return t.take(idx)


def _collect(ds) -> pa.Table:
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns and t.num_rows]
    if not tabs:
        return pa.table({})
    return pa.concat_tables(tabs)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    words = [f"w{i}" for i in range(40)]
    texts, ids = [], []
    for i in range(60):
        n = int(rng.integers(5, 30))
        texts.append(" ".join(rng.choice(words, size=n)))
        ids.append(i)
    # engineered near-dups (shared prefix) and exact dups (star clusters)
    texts[10] = texts[11] = texts[12] = "alpha beta gamma delta " * 6  # 3-way exact
    texts[20] = "the quick brown fox jumps over the lazy dog " * 4
    texts[21] = texts[20] + "extra tail"
    texts[30] = ""  # empty-text edge
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})


def test_fingerprint_matches_golden(ray_session, corpus):
    import ray

    from core_ray.text.analysis import Fingerprinter

    ds = ray.data.from_arrow(corpus).map_batches(
        Fingerprinter, batch_format="pyarrow", batch_size=16, concurrency=1
    ).select_columns(["doc_id", "fingerprint"])
    golden = dg.golden_fingerprints(
        corpus["doc_id"].to_pylist(), corpus["text"].to_pylist()
    )
    assert _canon(_collect(ds)).equals(_canon(golden))


def test_minhash_pairs_match_golden(ray_session, corpus):
    import ray

    from core_ray.text.dedup import minhash_near_dups

    eng = _collect(minhash_near_dups(ray.data.from_arrow(corpus), threshold=0.5))
    golden = dg.golden_minhash_pairs(
        corpus["doc_id"].to_pylist(), corpus["text"].to_pylist(), threshold=0.5
    )
    # the engineered clusters must actually surface (collapse + banding)
    assert golden.num_rows >= 3
    assert _canon(eng).equals(_canon(golden))


def test_simhash_pairs_match_golden(ray_session, corpus):
    import ray

    from core_ray.text.dedup import simhash_near_dups

    eng = _collect(simhash_near_dups(ray.data.from_arrow(corpus), max_hamming=6))
    golden = dg.golden_simhash_pairs(
        corpus["doc_id"].to_pylist(), corpus["text"].to_pylist(), max_hamming=6
    )
    assert golden.num_rows >= 3
    assert _canon(eng).equals(_canon(golden))


@pytest.fixture(scope="module")
def embeddings():
    rng = np.random.default_rng(17)
    n, dim = 80, 16
    x = rng.normal(size=(n, dim)).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64), pa.int64()),
            "embedding": pa.array(x.tolist(), pa.list_(pa.float32())),
        }
    )


def test_ann_lsh_matches_golden(ray_session, embeddings):
    import ray

    from core_ray.text.similarity import lsh_ann_topk

    q_ids = np.arange(0, 80, 20, dtype=np.int64)
    eng = _collect(lsh_ann_topk(ray.data.from_arrow(embeddings), q_ids, k=5))
    golden = dg.golden_ann_lsh(embeddings, query_modulus=20)
    assert golden.num_rows > 0
    assert _canon(eng).equals(_canon(golden))


def test_ann_ivf_matches_golden(ray_session, embeddings):
    import ray

    from core_ray.text.similarity import ivf_ann_topk

    q_ids = np.arange(0, 80, 20, dtype=np.int64)
    eng = _collect(ivf_ann_topk(ray.data.from_arrow(embeddings), q_ids, k=5))
    golden = dg.golden_ann_ivf(embeddings, query_modulus=20)
    assert golden.num_rows > 0
    assert _canon(eng).equals(_canon(golden))


def test_kmeans_matches_golden_second_scale(ray_session):
    """emb_kmeans (distributed partial-sum iterations) must be row-identical
    to golden_kmeans at a scale the driver never runs (sf0.001) — the
    per-iteration 6-decimal center rounding is the cross-path contract."""
    import pyarrow.parquet as pq

    from core_ray.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    eng = _collect(QUERIES["emb_kmeans"](sf))
    emb = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    golden = dg.golden_kmeans(emb)
    assert golden.num_rows == eng.num_rows > 0
    assert len(set(golden["cluster"].to_pylist())) > 1  # non-degenerate
    assert _canon(eng).equals(_canon(golden))
