"""Text analysis: token counting, quality scoring, language-ID, fingerprinting.

The M1/M2-analog per-document classification/scoring family (SURVEY.md §2.2):
pure vectorized or tight-loop kernels inside map_batches; compiled state
(regexes, stopword tables) built once per actor.

SQL mirrors (kept in exact sync with __ray_entry__.oracle_sql):
- n_tokens    == array_length(regexp_split_to_array(trim(text), '\\s+'))
- n_chars     == length(text)
- distinct_ratio == distinct tokens / total tokens (int/int in float64)
- mean_token_len == avg(length(token))  (sum of ints / count in float64)
"""

from __future__ import annotations

import re
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

TOKEN_RE = r"\S+"
# BPE-ish word/punct splitter for token_count_bpe (GPT-2-style coarse classes)
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")


def add_token_counts(batch: pa.Table, col: str = "text") -> pa.Table:
    """Vectorized: n_tokens (whitespace) + n_chars, pure pyarrow.compute."""
    n_tokens = pc.count_substring_regex(batch[col], TOKEN_RE)
    n_chars = pc.utf8_length(batch[col])
    return batch.append_column(
        "n_tokens", pc.cast(n_tokens, pa.int64())
    ).append_column("n_chars_actual", pc.cast(n_chars, pa.int64()))


def add_quality(batch: pa.Table, col: str = "text") -> pa.Table:
    """Quality features: distinct-token ratio + mean token length (+ counts)."""
    texts = batch[col].to_pylist()
    n_tok = np.empty(len(texts), dtype=np.int64)
    n_distinct = np.empty(len(texts), dtype=np.int64)
    sum_len = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        toks = t.split()
        n_tok[i] = len(toks)
        n_distinct[i] = len(set(toks))
        sum_len[i] = sum(len(w) for w in toks)
    from core_ray.rounding import sql_round_np

    safe = np.maximum(n_tok, 1)
    # half-away rounding to match SQL ROUND: ratios with power-of-two
    # denominators (e.g. 97/128) land on exact ties where numpy's
    # banker's rounding diverges from the oracle
    distinct_ratio = sql_round_np(n_distinct / safe, 6)
    mean_token_len = sql_round_np(sum_len / safe, 6)
    return (
        batch.append_column("n_tokens", pa.array(n_tok, pa.int64()))
        .append_column("distinct_ratio", pa.array(distinct_ratio, pa.float64()))
        .append_column("mean_token_len", pa.array(mean_token_len, pa.float64()))
    )


# Tiny per-language stopword tables for the n-gram/stopword heuristic lang-ID.
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to a in is it you that was for on are with".split()),
    "de": frozenset("der die das und ist ich nicht mit ein eine zu den von".split()),
    "fr": frozenset("le la les et de un une est pas pour dans que vous".split()),
    "es": frozenset("el la los las y de un una es no por con para que".split()),
    "pt": frozenset("o a os as e de um uma é não por com para que em".split()),
    "ru": frozenset("и в не на я что он как это но по к у же вы".split()),
}


class LangId:
    """Actor-pool UDF: stopword-overlap language classifier.

    Scores each language by the fraction of tokens in its stopword table;
    winner = max score, ties broken alphabetically; no token hits -> 'und'.
    (Heuristic lang-ID per the brief; deterministic by construction.)
    """

    def __init__(self, col: str = "text"):
        self.col = col
        self.langs = sorted(STOPWORDS)  # alphabetical = the tie-break order
        # Arrow value sets for the vectorized is_in membership kernel
        self.value_sets = [pa.array(sorted(STOPWORDS[lang]), pa.string()) for lang in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        # tokenization stays Python str.split() (the oracle's exact
        # semantics); SCORING is vectorized (VERDICT r2 "what's wrong" item
        # 4): one flat Arrow token array per batch, one hash-based is_in per
        # language, per-doc counts via bincount over parent indices —
        # instead of nested per-doc x per-lang Python loops.
        texts = batch[self.col].to_pylist()
        n = len(texts)
        toks_per_doc = [t.lower().split() for t in texts]
        counts = np.asarray([len(ts) for ts in toks_per_doc], dtype=np.int64)
        parent = np.repeat(np.arange(n), counts)
        flat = pa.array([w for ts in toks_per_doc for w in ts], pa.string())
        best = np.zeros(n, dtype=np.int64)
        out = np.full(n, "und", dtype=object)
        for lang, vs in zip(self.langs, self.value_sets):
            mask = pc.is_in(flat, value_set=vs).to_numpy(zero_copy_only=False)
            score = (
                np.bincount(parent[mask], minlength=n)
                if mask.any()
                else np.zeros(n, dtype=np.int64)
            )
            win = score > best  # strict: ties keep the earlier (alphabetical) lang
            best = np.maximum(best, score)
            out[win] = lang
        return batch.append_column("lang_pred", pa.array(out.tolist(), pa.string()))


def doc_fingerprint(text: str, window: int = 8) -> int:
    """Deterministic document fingerprint: min Karp-Rabin rolling hash over
    ``window``-token windows (winnowing-style); whole-text crc64-ish when the
    document is shorter than one window."""
    toks = text.split()
    hs = [zlib.crc32(t.encode("utf-8")) & 0xFFFFFFFF for t in toks]
    if len(hs) < window:
        acc = 1469598103934665603
        for h in hs:
            acc = ((acc ^ h) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
        return acc
    base = 1000003
    mod = (1 << 61) - 1
    pw = pow(base, window - 1, mod)
    cur = 0
    for h in hs[:window]:
        cur = (cur * base + h) % mod
    best = cur
    for i in range(window, len(hs)):
        cur = ((cur - hs[i - window] * pw) * base + hs[i]) % mod
        if cur < best:
            best = cur
    return best


class Fingerprinter:
    def __init__(self, col: str = "text", window: int = 8):
        self.col = col
        self.window = window

    def __call__(self, batch: pa.Table) -> pa.Table:
        fps = [doc_fingerprint(t, self.window) for t in batch[self.col].to_pylist()]
        return batch.append_column("fingerprint", pa.array(fps, pa.uint64()))


def repetition_fractions(texts) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-document Gopher/RefinedWeb repetition signals over a space-
    tokenized string column: (n_words, top_word_count, top_bigram_count).
    Exact dictionary-code vectorization — words dictionary-encode to
    integer codes (no hashing, so counts cannot collide), per-doc runs
    reduce with lexsort + reduceat, bigrams are code-pair integers on the
    same machinery. Zero shuffles; documents are row-local."""
    words = pc.split_pattern(texts, " ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    n_per_doc = np.diff(words.offsets.to_numpy(zero_copy_only=False)).astype(np.int64)
    n_docs = len(n_per_doc)
    flat = words.flatten()
    codes = flat.dictionary_encode().indices.to_numpy(zero_copy_only=False).astype(np.int64)
    vocab = int(codes.max()) + 1 if len(codes) else 1
    d_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_per_doc)

    def top_count(keys: np.ndarray, docs: np.ndarray) -> np.ndarray:
        out = np.zeros(n_docs, dtype=np.int64)
        if not len(keys):
            return out
        order = np.lexsort((keys, docs))
        ks, ds_ = keys[order], docs[order]
        new = np.ones(len(ks), dtype=bool)
        new[1:] = (ks[1:] != ks[:-1]) | (ds_[1:] != ds_[:-1])
        starts = np.nonzero(new)[0]
        runs = np.diff(np.append(starts, len(ks)))
        run_doc = ds_[starts]
        doc_new = np.ones(len(run_doc), dtype=bool)
        doc_new[1:] = run_doc[1:] != run_doc[:-1]
        doc_starts = np.nonzero(doc_new)[0]
        out[run_doc[doc_starts]] = np.maximum.reduceat(runs, doc_starts)
        return out

    topw = top_count(codes, d_idx)
    same_doc = d_idx[1:] == d_idx[:-1] if len(d_idx) else np.zeros(0, bool)
    big = codes[:-1][same_doc] * vocab + codes[1:][same_doc]
    topb = top_count(big, d_idx[:-1][same_doc])
    return n_per_doc, topw, topb
