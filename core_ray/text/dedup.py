"""Corpus-level deduplication: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale shapes (all shuffles are over SMALL derived rows, never raw text):
- exact: md5(text) per batch (map) -> groupby(hash) aggregate  [one shuffle
  keyed by a 16-byte hash; the classic hash-partition + per-group-first]
- MinHash+LSH near-dup: shingle -> 64 minhash sigs per doc (map) -> explode
  to (band_id, band_hash, doc_id, sigs) rows -> groupby(band) -> candidate
  pairs -> dedupe pairs -> estimate Jaccard from sig agreement; optional
  exact verify on the candidate set (n-gram Jaccard kernel) when texts are
  broadcastable. Candidate generation is the published banding scheme.
- SimHash: 64-bit signature (map) -> 4x16-bit band buckets -> pairs ->
  Hamming verify via popcount.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Count, Min

# ---------------- exact dedup ----------------


def add_text_hash(batch: pa.Table, col: str = "text") -> pa.Table:
    hashes = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in batch[col].to_pylist()]
    return batch.append_column("text_hash", pa.array(hashes, pa.string()))


def exact_dedup_groups(ds, id_col: str = "doc_id", col: str = "text"):
    """Dataset[documents] -> (text_hash, doc_id=min id, n_copies)."""
    return (
        ds.map_batches(lambda b: add_text_hash(b, col), batch_format="pyarrow")
        .select_columns(["text_hash", id_col])
        .groupby("text_hash")
        .aggregate(Min(id_col, alias_name=id_col), Count(alias_name="n_copies"))
    )


# ---------------- MinHash + LSH ----------------

N_PERM = 64
N_BANDS = 16
ROWS_PER_BAND = N_PERM // N_BANDS
_MERSENNE = np.uint64(0xFFFFFFFFFFFFFFFF)  # mul-add wraparound "permutations"

_rng = np.random.default_rng(1234)
_PERM_A = _rng.integers(1, 1 << 61, N_PERM, dtype=np.uint64) | np.uint64(1)
_PERM_B = _rng.integers(0, 1 << 61, N_PERM, dtype=np.uint64)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """k-token shingles -> uint64 hashes (crc32 spread via splitmix)."""
    toks = text.split()
    if len(toks) < k:
        shingles = [" ".join(toks)] if toks else []
    else:
        shingles = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    if not shingles:
        return np.zeros(0, dtype=np.uint64)
    h32 = np.array([zlib.crc32(s.encode("utf-8")) for s in shingles], dtype=np.uint64)
    # splitmix64 spread to decorrelate the 32-bit crc
    z = (h32 + np.uint64(0x9E3779B97F4A7C15)) & _MERSENNE
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MERSENNE
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MERSENNE
    return z ^ (z >> np.uint64(31))


def minhash_signature(text: str, k: int = 3) -> np.ndarray:
    """64 minhash values (uint64); empty text -> all-max sentinel."""
    sh = shingle_hashes(text, k)
    if len(sh) == 0:
        return np.full(N_PERM, _MERSENNE, dtype=np.uint64)
    # (a*h + b) wraparound per permutation: (n_sh, n_perm) then min over rows
    vals = (sh[:, None] * _PERM_A[None, :] + _PERM_B[None, :]) & _MERSENNE
    return vals.min(axis=0)


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def _band_hash(band_sigs: np.ndarray) -> int:
    return zlib.crc32(band_sigs.tobytes()) & 0xFFFFFFFF


class MinHashBands:
    """map_batches UDF: (id, text) -> N_BANDS rows (band_id, band_hash, id, sig)."""

    def __init__(self, id_col: str = "doc_id", col: str = "text", k: int = 3):
        self.id_col = id_col
        self.col = col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.col].to_pylist()
        out_band, out_hash, out_id, out_sig = [], [], [], []
        for i, t in zip(ids, texts):
            sig = minhash_signature(t, self.k)
            for b in range(N_BANDS):
                band = sig[b * ROWS_PER_BAND : (b + 1) * ROWS_PER_BAND]
                out_band.append(b)
                out_hash.append(_band_hash(band))
                out_id.append(i)
                out_sig.append(sig.tolist())
        return pa.table(
            {
                "band_id": pa.array(out_band, pa.int32()),
                "band_hash": pa.array(out_hash, pa.uint32()),
                self.id_col: pa.array(out_id),
                "sig": pa.array(out_sig, pa.list_(pa.uint64())),
            }
        )


def _bucket_pairs(group: pa.Table, id_col: str, threshold: float) -> pa.Table:
    ids = group[id_col].to_pylist()
    sigs = group["sig"].to_pylist()
    a_out, b_out, j_out = [], [], []
    order = np.argsort(ids, kind="stable")
    for x in range(len(order)):
        for y in range(x + 1, len(order)):
            ia, ib = order[x], order[y]
            if ids[ia] == ids[ib]:
                continue
            j = float(np.mean(np.asarray(sigs[ia]) == np.asarray(sigs[ib])))
            if j >= threshold:
                a_out.append(ids[ia])
                b_out.append(ids[ib])
                j_out.append(round(j, 6))
    return pa.table(
        {
            "id_a": pa.array(a_out),
            "id_b": pa.array(b_out),
            "jaccard_est": pa.array(j_out, pa.float64()),
        }
    )


def minhash_near_dups(ds, id_col: str = "doc_id", col: str = "text",
                      k: int = 3, threshold: float = 0.6):
    """Dataset[documents] -> near-dup pairs (id_a < id_b, jaccard_est >= t).

    Pairs surfacing in several bands are deduped by a final groupby.
    """
    bands = ds.map_batches(
        MinHashBands, fn_constructor_args=(id_col, col, k),
        batch_format="pyarrow", batch_size=1024, concurrency=(1, 8),
    )
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        lambda g: _bucket_pairs(g, id_col, threshold), batch_format="pyarrow"
    )
    from ray.data.aggregate import Max

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        Max("jaccard_est", alias_name="jaccard_est")
    )


# ---------------- SimHash ----------------


def simhash64(text: str) -> int:
    toks = text.split()
    if not toks:
        return 0
    h32 = np.array([zlib.crc32(t.encode("utf-8")) for t in toks], dtype=np.uint64)
    z = (h32 + np.uint64(0x9E3779B97F4A7C15)) & _MERSENNE
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MERSENNE
    z = z ^ (z >> np.uint64(31))
    bits = ((z[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for b in range(64):
        if acc[b] > 0:
            out |= np.uint64(1) << np.uint64(b)
    return int(out)


class SimHasher:
    def __init__(self, id_col: str = "doc_id", col: str = "text"):
        self.id_col = id_col
        self.col = col

    def __call__(self, batch: pa.Table) -> pa.Table:
        sh = [simhash64(t) for t in batch[self.col].to_pylist()]
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "simhash": pa.array(sh, pa.uint64()),
            }
        )


def _simhash_pairs(group: pa.Table, id_col: str, max_hamming: int) -> pa.Table:
    ids = group[id_col].to_pylist()
    hs = group["simhash"].to_pylist()
    a_out, b_out, d_out = [], [], []
    order = np.argsort(ids, kind="stable")
    for x in range(len(order)):
        for y in range(x + 1, len(order)):
            ia, ib = order[x], order[y]
            if ids[ia] == ids[ib]:
                continue
            d = bin(hs[ia] ^ hs[ib]).count("1")
            if d <= max_hamming:
                a_out.append(ids[ia])
                b_out.append(ids[ib])
                d_out.append(d)
    return pa.table(
        {
            "id_a": pa.array(a_out),
            "id_b": pa.array(b_out),
            "hamming": pa.array(d_out, pa.int32()),
        }
    )


def simhash_near_dups(ds, id_col: str = "doc_id", col: str = "text", max_hamming: int = 3):
    """SimHash near-dup pairs via 4x16-bit band buckets + Hamming verify."""
    sigs = ds.map_batches(
        SimHasher, fn_constructor_args=(id_col, col),
        batch_format="pyarrow", batch_size=2048, concurrency=(1, 8),
    )

    def explode_bands(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        parts = []
        for b in range(4):
            parts.append(
                pa.table(
                    {
                        "band_id": pa.array(np.full(len(h), b, dtype=np.int32), pa.int32()),
                        "band_val": pa.array(
                            (h >> np.uint64(16 * b)) & np.uint64(0xFFFF), pa.uint32()
                        ),
                        id_col: batch[id_col],
                        "simhash": batch["simhash"],
                    }
                )
            )
        return pa.concat_tables(parts)

    pairs = (
        sigs.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band_id", "band_val"])
        .map_groups(lambda g: _simhash_pairs(g, id_col, max_hamming), batch_format="pyarrow")
    )
    from ray.data.aggregate import Min as AggMin

    return pairs.groupby(["id_a", "id_b"]).aggregate(
        AggMin("hamming", alias_name="hamming")
    )


# ---------------- n-gram Jaccard kernel ----------------


def char_ngrams(text: str, n: int = 5) -> set[str]:
    if len(text) < n:
        return {text} if text else set()
    return {text[i : i + n] for i in range(len(text) - n + 1)}


def ngram_jaccard(a: str, b: str, n: int = 5) -> float:
    sa, sb = char_ngrams(a, n), char_ngrams(b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 0.0


def verify_pairs_exact(pairs_ds, docs_ref, id_col: str = "doc_id",
                       n: int = 5, threshold: float = 0.5):
    """Exact n-gram-Jaccard verification of candidate pairs against a
    BROADCAST id->text dict (valid when the doc table fits the object store;
    at larger scale re-join texts by id instead — documented trade-off)."""

    class Verify:
        def __init__(self, docs_ref):
            import ray

            if isinstance(docs_ref, ray.ObjectRef):
                docs_ref = ray.get(docs_ref)
            self.docs: dict = docs_ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch["id_a"].to_pylist()
            b = batch["id_b"].to_pylist()
            j = [round(ngram_jaccard(self.docs[x], self.docs[y], n), 6) for x, y in zip(a, b)]
            out = batch.append_column("jaccard", pa.array(j, pa.float64()))
            import pyarrow.compute as pc

            return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return pairs_ds.map_batches(
        Verify, fn_constructor_args=(docs_ref,),
        batch_format="pyarrow", concurrency=(1, 4),
    )
