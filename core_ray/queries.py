"""Driver-facing queries (sf_dir-parameterized) + DuckDB oracle SQL.

Every entry in QUERIES is a Ray-Data-first implementation of one operator
class from SURVEY.md §2 / the training-data-ops brief; ORACLE_SQL holds the
ANSI-SQL equivalent for everything SQL-expressible (same column NAMES and
TYPES — the driver sorts columns by name and hashes values, so both sides
round floats identically and cast explicitly).

Float discipline:
- monetary aggregates: ROUND(x, 2) on both sides after aggregation
- similarity / ratio outputs: ROUND(x, 6)
- distance used for ranking: squared euclidean written as
  (a-b)*(a-b) + (c-d)*(c-d) in BOTH numpy and SQL (bit-identical IEEE ops);
  no sqrt/hypot anywhere near a comparison.
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from core_ray.geo import mercator
from core_ray.rounding import sql_round, sql_round_np

# ---------------------------------------------------------------- helpers


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(_p(sf_dir, table), columns=columns)


def _collect_table(ds) -> pa.Table:
    """Materialize a SMALL Dataset result on the driver (core_ray.collect)."""
    from core_ray.collect import collect_table

    return collect_table(ds)


def _collect_numpy(ds, col: str) -> np.ndarray:
    return _collect_table(ds.select_columns([col]))[col].to_numpy(zero_copy_only=False)


# ================================================================ relational
# Q1-style pricing summary: filter + partial per-batch pre-aggregation (the
# combiner pattern, SURVEY.md §2.6 A1-A3) + tiny final groupby.

_Q1_CUTOFF = datetime(2000, 1, 1)


def q1_pricing_summary(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], pa.scalar(_Q1_CUTOFF)))
        disc = pc.multiply(batch["l_extendedprice"], pc.subtract(1.0, batch["l_discount"]))
        batch = batch.append_column("disc_price", disc)
        # per-batch combine: emit one row per (flag, status) per batch
        # ([], "count_all") mirrors COUNT(*) — a ("col", "count") would skip
        # nulls and diverge from the oracle on nullable columns
        return pa.TableGroupBy(batch, ["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ("disc_price", "sum"), ([], "count_all")]
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity_sum", alias_name="sum_qty"),
            Sum("l_extendedprice_sum", alias_name="sum_base_price"),
            Sum("disc_price_sum", alias_name="sum_disc_price"),
            Sum("count_all", alias_name="count_order"),
        )
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "sum_qty": sql_round(b["sum_qty"], 2),
                "sum_base_price": sql_round(b["sum_base_price"], 2),
                "sum_disc_price": sql_round(b["sum_disc_price"], 2),
                "count_order": pc.cast(b["count_order"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
       COUNT(*)                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-01-01'
GROUP BY 1, 2
"""


# Q3-style: broadcast semi-joins (customer segment -> orders -> lineitem),
# groupby revenue, deterministic top-10 (SURVEY.md §2.5 J1 small-side pattern).

_Q3_DATE = datetime(1998, 1, 1)


def q3_top_orders(sf_dir: str):
    """Distributed cascade of broadcast semi-joins — no fact table is ever
    materialized on the driver (only the *surviving key sets* cross, each the
    product of a distributed filter; membership tests are vectorized
    ``np.isin`` against a sorted broadcast array, never per-row Python)."""
    import ray
    from ray.data.aggregate import Sum

    # small side 1: BUILDING-segment customer keys. customer is a DIMENSION
    # table (~1.5% of lineitem): below a size guard it reads driver-side in
    # one pruned pyarrow scan (like q5's nation/region/supplier) — saving a
    # whole distributed execution; above it, the distributed filter path.
    cust_path = _p(sf_dir, "customer")
    if os.path.getsize(cust_path) < 256 * 1024 * 1024:
        import pyarrow.parquet as pq

        ct = pq.read_table(cust_path, columns=["c_custkey", "c_mktsegment"])
        cust_keys = np.sort(
            ct.filter(pc.equal(ct["c_mktsegment"], "BUILDING"))["c_custkey"]
            .to_numpy(zero_copy_only=False)
        )
    else:
        cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        cust_keys = np.sort(
            _collect_numpy(cust.filter(expr="c_mktsegment == 'BUILDING'"), "c_custkey")
        )
    cust_ref = ray.put(cust_keys)

    # small side 2: order keys surviving (date filter ⋉ customer set) — a
    # distributed map_batches semi-join over orders; only keys come back.
    # The date predicates are PUSHED INTO THE READ (pyarrow dataset filter:
    # row-group pruning via statistics + exact row filtering in the scanner,
    # VERDICT r2 item 6) — the date columns never leave storage.
    import pyarrow.dataset as pads

    # plain functions over broadcast refs, not actor pools: the semi-join
    # probe is stateless (one plasma ray.get per batch, shared memory on the
    # node), and an actor pool's spin-up is pure latency on each of these
    # two short chained executions
    def orders_semi(b: pa.Table, ref=cust_ref) -> pa.Table:
        keys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        m = np.isin(b["o_custkey"].to_numpy(zero_copy_only=False), keys)
        return b.filter(pa.array(m)).select(["o_orderkey"])

    import ray.data

    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey"],
        filter=pads.field("o_orderdate") < _Q3_DATE,
    )
    okeys = np.sort(
        _collect_numpy(
            orders.map_batches(orders_semi, batch_format="pyarrow", batch_size=65536),
            "o_orderkey",
        )
    )
    okeys_ref = ray.put(okeys)

    def lineitem_semi(b: pa.Table, ref=okeys_ref) -> pa.Table:
        ok = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        m = np.isin(b["l_orderkey"].to_numpy(zero_copy_only=False), ok)
        b = b.filter(pa.array(m))
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        return pa.table({"o_orderkey": b["l_orderkey"], "rev": rev})

    li = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_shipdate") > _Q3_DATE,
    )
    agg = (
        li.map_batches(lineitem_semi, batch_format="pyarrow", batch_size=65536)
        .groupby("o_orderkey")
        .aggregate(Sum("rev", alias_name="revenue"))
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {"o_orderkey": b["o_orderkey"], "revenue": sql_round(b["revenue"], 2)}
        )

    out = agg.map_batches(finish, batch_format="pyarrow")
    return out.sort(["revenue", "o_orderkey"], descending=[True, False]).limit(10)


Q3_SQL = """
SELECT l_orderkey AS o_orderkey,
       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# Q5-style: chained broadcast dimension joins -> per-nation revenue.


def q5_region_revenue(sf_dir: str, region: str = "ASIA"):
    import ray
    from ray.data.aggregate import Sum

    import pyarrow.parquet as pq

    nation = pq.read_table(_p(sf_dir, "nation"))
    reg = pq.read_table(_p(sf_dir, "region"))
    supplier = pq.read_table(_p(sf_dir, "supplier"))
    rkey = {r["r_regionkey"] for r in reg.to_pylist() if r["r_name"] == region}
    n_in = {
        r["n_nationkey"]: r["n_name"]
        for r in nation.to_pylist()
        if r["n_regionkey"] in rkey
    }
    supp_nation = {
        r["s_suppkey"]: n_in[r["s_nationkey"]]
        for r in supplier.to_pylist()
        if r["s_nationkey"] in n_in
    }
    # broadcast as SORTED parallel arrays so the fact-table probe is
    # vectorized (np.searchsorted + np.take), never a per-row dict.get
    skeys = np.sort(np.fromiter(supp_nation.keys(), dtype=np.int64, count=len(supp_nation)))
    snames = np.asarray([supp_nation[k] for k in skeys])
    ref = ray.put((skeys, snames))

    # plain task, not an actor pool: the probe is stateless (plasma fetch
    # per batch) and pool spin-up is pure latency on a short execution
    def map_supp(b: pa.Table, ref=ref) -> pa.Table:
        skeys, snames = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        if len(skeys) == 0:
            return pa.table(
                {"n_name": pa.array([], pa.string()), "rev": pa.array([], pa.float64())}
            )
        keys = b["l_suppkey"].to_numpy(zero_copy_only=False)
        pos, hit = _sorted_probe(skeys, keys)
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(1.0, b["l_discount"]))
        t = pa.table({"n_name": pa.array(snames[pos], pa.string()), "rev": rev})
        return t.filter(pa.array(hit))

    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_discount"])
    agg = (
        li.map_batches(map_supp, batch_format="pyarrow", batch_size=65536)
        .groupby("n_name")
        .aggregate(Sum("rev", alias_name="revenue"))
    )
    return agg.map_batches(
        lambda b: pa.table({"n_name": b["n_name"], "revenue": sql_round(b["revenue"], 2)}),
        batch_format="pyarrow",
    )


Q5_SQL = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY 1
"""


# ---------------------------------------------------------------- events

_HOUR_US = 3600 * 1000 * 1000
_SESSION_GAP_US = 1800 * 1000 * 1000


def events_hourly(sf_dir: str):
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def combine(b: pa.Table) -> pa.Table:
        # per-batch combiner: the shuffle moves <= (types x hours) rows per
        # batch instead of every event row
        us = pc.cast(b["ts"], pa.int64())
        t = pa.table(
            {
                "event_type": b["event_type"],
                "hour": pc.divide(us, _HOUR_US),
                "value": b["value"],
            }
        )
        agg = pa.TableGroupBy(t, ["event_type", "hour"]).aggregate(
            [("value", "sum"), ([], "count_all")]
        )
        return agg.select(["event_type", "hour", "value_sum", "count_all"])

    agg = (
        ds.map_batches(combine, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "hour"])
        .aggregate(Sum("count_all", alias_name="n_events"), Sum("value_sum", alias_name="sum_value"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "event_type": b["event_type"],
                "hour": b["hour"],
                "n_events": pc.cast(b["n_events"], pa.int64()),
                "sum_value": sql_round(b["sum_value"], 2),
            }
        ),
        batch_format="pyarrow",
    )


EVENTS_HOURLY_SQL = """
SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def events_top_users(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["user_id", "value"])
    agg = ds.groupby("user_id").aggregate(
        Sum("value", alias_name="total_value"), Count(alias_name="n_events")
    )
    out = agg.map_batches(
        lambda b: pa.table(
            {
                "user_id": b["user_id"],
                "total_value": sql_round(b["total_value"], 2),
                "n_events": pc.cast(b["n_events"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    return out.sort(["total_value", "user_id"], descending=[True, False]).limit(10)


EVENTS_TOP_USERS_SQL = """
SELECT user_id, ROUND(SUM(value), 2) AS total_value, COUNT(*) AS n_events
FROM events GROUP BY 1
ORDER BY total_value DESC, user_id
LIMIT 10
"""


def events_sessionize(sf_dir: str):
    """Session windows (gap > 30 min) per user — the streaming-shaped op:
    hash-partition by user, then ONE fully-vectorized pass per partition
    (lexsort + segment boundaries) handles every user in it. Never the
    Python-per-user map_groups (~1.4 ms/user — the job, at 10^8 users)."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def sessions_part(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "session_idx": pa.array([], pa.int32()),
                    "n_events": pa.array([], pa.int64()),
                    "duration_us": pa.array([], pa.int64()),
                }
            )
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((us, uid))
        uid, us = uid[order], us[order]
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        new_s = new_user.copy()
        new_s[1:] |= (us[1:] - us[:-1]) > _SESSION_GAP_US
        s_starts = np.nonzero(new_s)[0]
        s_last = np.append(s_starts[1:], n) - 1
        n_ev = np.append(s_starts[1:], n) - s_starts
        dur = us[s_last] - us[s_starts]
        user_first = np.nonzero(new_user)[0]
        sessions_per_user = np.add.reduceat(new_s.astype(np.int64), user_first)
        # sessions are numbered 0..S-1 in sorted order; subtracting each
        # user's first session ordinal yields the per-user session_idx
        first_session_of_user = np.cumsum(np.concatenate([[0], sessions_per_user[:-1]]))
        s_idx = np.arange(len(s_starts)) - np.repeat(first_session_of_user, sessions_per_user)
        return pa.table(
            {
                "user_id": pa.array(uid[s_starts], pa.int64()),
                "session_idx": pa.array(s_idx.astype(np.int32), pa.int32()),
                "n_events": pa.array(n_ev.astype(np.int64), pa.int64()),
                "duration_us": pa.array(dur.astype(np.int64), pa.int64()),
            }
        )

    return map_groups_partitioned(ds, "user_id", sessions_part)


EVENTS_SESSIONIZE_SQL = """
WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events),
m AS (
  SELECT user_id, us,
         CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us) > 1800000000
                OR LAG(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
              THEN 1 ELSE 0 END AS new_s
  FROM e),
s AS (
  SELECT user_id, us,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                          ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
  FROM m)
SELECT user_id, CAST(session_idx AS INTEGER) AS session_idx,
       COUNT(*) AS n_events, MAX(us) - MIN(us) AS duration_us
FROM s GROUP BY 1, 2
"""


# ---------------------------------------------------------------- documents


def doc_token_stats(sf_dir: str):
    from core_ray.text.analysis import add_token_counts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        lambda b: add_token_counts(b).select(["doc_id", "n_tokens", "n_chars_actual"]),
        batch_format="pyarrow",
        batch_size=4096,
    )


DOC_TOKEN_STATS_SQL = """
SELECT doc_id,
       CASE WHEN TRIM(text) = '' THEN 0
            ELSE ARRAY_LENGTH(REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+')) END AS n_tokens,
       LENGTH(text) AS n_chars_actual
FROM documents
"""


def doc_lang_dist(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    agg = ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars")
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "lang": b["lang"],
                "n_docs": pc.cast(b["n_docs"], pa.int64()),
                "avg_chars": sql_round(
                    pc.divide(pc.cast(b["sum_chars"], pa.float64()), pc.cast(b["n_docs"], pa.float64())), 2
                ),
            }
        ),
        batch_format="pyarrow",
    )


DOC_LANG_DIST_SQL = """
SELECT lang, COUNT(*) AS n_docs, ROUND(SUM(n_chars) / COUNT(*), 2) AS avg_chars
FROM documents GROUP BY 1
"""


def doc_exact_dedup(sf_dir: str):
    from core_ray.text.dedup import exact_dedup_groups

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = exact_dedup_groups(ds)
    return out.map_batches(
        lambda b: pa.table(
            {
                "text_hash": b["text_hash"],
                "doc_id": pc.cast(b["doc_id"], pa.int64()),
                "n_copies": pc.cast(b["n_copies"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


DOC_EXACT_DEDUP_SQL = """
SELECT MD5(text) AS text_hash, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
"""


def doc_quality(sf_dir: str):
    from core_ray.text.analysis import add_quality

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        out = add_quality(b)
        out = out.filter(pc.greater(out["n_tokens"], 0))
        return out.select(["doc_id", "n_tokens", "distinct_ratio", "mean_token_len"])

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096)


DOC_QUALITY_SQL = """
WITH t AS (SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(text), '\\s+') AS l
           FROM documents WHERE TRIM(text) <> '')
SELECT doc_id,
       ARRAY_LENGTH(l) AS n_tokens,
       ROUND(ARRAY_LENGTH(LIST_DISTINCT(l)) / ARRAY_LENGTH(l), 6) AS distinct_ratio,
       ROUND(LIST_AGGREGATE(LIST_TRANSFORM(l, x -> LENGTH(x)), 'sum') / ARRAY_LENGTH(l), 6) AS mean_token_len
FROM t
"""


def doc_repetition(sf_dir: str):
    """Repetition quality filters in the published Gopher / RefinedWeb
    style: per document, the fraction of tokens taken by the single most
    frequent word and by the most frequent bigram — high values flag
    boilerplate/spam for corpus filtering. Fully vectorized and exact:
    words dictionary-encode to integer codes per batch (no hashing, so
    distinct/top counts cannot collide), per-doc runs reduce with
    lexsort + reduceat, and bigrams are code-pair integers on the same
    machinery. Documents are row-local so the whole operator is one
    map_batches — no shuffle at any scale."""
    from core_ray.text.analysis import repetition_fractions

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def f(b: pa.Table) -> pa.Table:
        n_per_doc, topw, topb = repetition_fractions(b["text"])
        n = n_per_doc.astype(np.float64)
        word_frac = sql_round_np(topw.astype(np.float64) / n, 6)
        nb = n_per_doc - 1
        bigram_frac = np.where(
            nb > 0, sql_round_np(topb.astype(np.float64) / np.maximum(nb, 1), 6), np.nan
        )
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_words": pa.array(n_per_doc, pa.int64()),
                "top_word_frac": pa.array(word_frac, pa.float64()),
                "top_bigram_frac": pa.array(
                    bigram_frac, pa.float64(), from_pandas=True
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow", batch_size=4096)


DOC_REPETITION_SQL = """
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
w AS (SELECT doc_id, UNNEST(l) AS w FROM ws),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY 1),
topw AS (
  SELECT doc_id, MAX(c) AS mc FROM
    (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2) GROUP BY 1),
bg AS (
  SELECT doc_id,
         UNNEST(list_transform(generate_series(1, len(l) - 1),
                               i -> l[i] || ' ' || l[i + 1])) AS b
  FROM ws),
topb AS (
  SELECT doc_id, MAX(c) AS mb FROM
    (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2) GROUP BY 1)
SELECT t.doc_id, t.n AS n_words,
       ROUND(CAST(topw.mc AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS top_word_frac,
       CASE WHEN t.n > 1
            THEN ROUND(CAST(topb.mb AS DOUBLE) / CAST(t.n - 1 AS DOUBLE), 6)
            END AS top_bigram_frac
FROM tot t JOIN topw USING (doc_id) LEFT JOIN topb USING (doc_id)
"""


def doc_langid(sf_dir: str):
    from core_ray.text.analysis import LangId

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        LangId, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)
    ).select_columns(["doc_id", "lang_pred"])


def doc_lang_confusion(sf_dir: str):
    """Language-ID evaluation matrix: (labeled lang, predicted lang) counts
    over the corpus — the quality-evaluation view a curation pipeline
    publishes for its classifier. Reuses the LangId actor pool; the
    (lang, pred) pair space is tiny, so a per-batch TableGroupBy combiner
    feeds one small groupby. The oracle nests the full SQL mirror of the
    classifier as a CTE — the strongest cross-check the langid kernel has
    (every document's prediction participates, not just the row set)."""
    from ray.data.aggregate import Sum

    from core_ray.text.analysis import LangId

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    pred = ds.map_batches(
        LangId, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)
    )

    def combine(b: pa.Table) -> pa.Table:
        t = pa.table({"lang": b["lang"], "lang_pred": b["lang_pred"]})
        agg = pa.TableGroupBy(t, ["lang", "lang_pred"]).aggregate([([], "count_all")])
        return agg.select(["lang", "lang_pred", "count_all"])

    agg = (
        pred.map_batches(combine, batch_format="pyarrow", batch_size=65536)
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("count_all", alias_name="n_docs"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "lang": b["lang"],
                "lang_pred": b["lang_pred"],
                "n_docs": pc.cast(b["n_docs"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def _langid_sql() -> str:
    """SQL mirror of text/analysis.py::LangId, generated from the SAME
    stopword tables: score = count of tokens in each language's table
    (duplicates counted), winner = max score with alphabetical tie-break,
    zero hits -> 'und'."""
    from core_ray.text.analysis import STOPWORDS

    langs = sorted(STOPWORDS)
    scores = ",\n    ".join(
        "length(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in sorted(STOPWORDS[lang]))
        + f"], x))) AS s_{lang}"
        for lang in langs
    )
    gmax = "GREATEST(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    cases = "\n       ".join(f"WHEN s_{lang} = {gmax} THEN '{lang}'" for lang in langs[:-1])
    return f"""
WITH t AS (
  SELECT doc_id, REGEXP_SPLIT_TO_ARRAY(TRIM(LOWER(text)), '\\s+') AS toks
  FROM documents),
s AS (
  SELECT doc_id,
    {scores}
  FROM t)
SELECT doc_id,
  CASE WHEN {gmax} = 0 THEN 'und'
       {cases}
       ELSE '{langs[-1]}' END AS lang_pred
FROM s
"""


DOC_LANGID_SQL = _langid_sql()

DOC_LANG_CONFUSION_SQL = f"""
WITH p AS ({DOC_LANGID_SQL})
SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents d JOIN p USING (doc_id)
GROUP BY 1, 2
"""


def events_hourly_anomalies(sf_dir: str, z_thresh: float = 2.0):
    """Anomaly detection over the hourly traffic series: hours whose event
    count deviates from the type's mean by >= ``z_thresh`` population
    standard deviations. The heavy pass is the distributed per-batch
    hourly-count combiner (events never leave their batch un-aggregated);
    the per-type moment pass runs on the aggregated (type, hour) table,
    which is bounded by types x hours at ANY corpus scale, so its
    driver-side numpy is scale-correct. Exact cross-engine parity: the
    moments are INTEGER sums (order-independent) and the z expression is
    the same fixed chain of correctly-rounded IEEE ops as the SQL."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def combine(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64())
        t = pa.table(
            {"event_type": b["event_type"], "hour": pc.divide(us, _HOUR_US)}
        )
        agg = pa.TableGroupBy(t, ["event_type", "hour"]).aggregate([([], "count_all")])
        return agg.select(["event_type", "hour", "count_all"])

    hourly = _collect_table(
        ds.map_batches(combine, batch_format="pyarrow", batch_size=65536)
        .groupby(["event_type", "hour"])
        .aggregate(Sum("count_all", alias_name="n_events"))
    )
    et = np.asarray(hourly["event_type"].to_pylist())
    hour = np.asarray(hourly["hour"].to_pylist(), dtype=np.int64)
    cnt = np.asarray(hourly["n_events"].to_pylist(), dtype=np.int64)
    order = np.lexsort((hour, et))
    et, hour, cnt = et[order], hour[order], cnt[order]
    new = np.ones(len(et), dtype=bool)
    new[1:] = et[1:] != et[:-1]
    starts = np.nonzero(new)[0]
    seg = np.repeat(np.arange(len(starts)), np.diff(np.append(starts, len(et))))
    n = np.add.reduceat(np.ones(len(et), np.int64), starts)
    s1 = np.add.reduceat(cnt, starts)
    s2 = np.add.reduceat(cnt * cnt, starts)
    # identical expression structure to the SQL: mean = s1/n; var = s2/n - mean*mean
    mean = s1.astype(np.float64) / n
    var = s2.astype(np.float64) / n - mean * mean
    std = np.sqrt(var)
    ok = std[seg] > 0
    z = np.zeros(len(et))
    z[ok] = (cnt[ok].astype(np.float64) - mean[seg][ok]) / std[seg][ok]
    hit = ok & (np.abs(z) >= z_thresh)
    return pa.table(
        {
            "event_type": pa.array(et[hit], pa.string()),
            "hour": pa.array(hour[hit], pa.int64()),
            "n_events": pa.array(cnt[hit], pa.int64()),
            "z": pa.array(sql_round_np(z[hit], 6), pa.float64()),
        }
    )


EVENTS_HOURLY_ANOMALIES_SQL = """
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(n_events) AS BIGINT) AS s1,
         CAST(SUM(n_events * n_events) AS BIGINT) AS s2
  FROM h GROUP BY 1),
s AS (
  SELECT event_type,
         CAST(s1 AS DOUBLE) / n AS mean,
         sqrt(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS std
  FROM m)
SELECT h.event_type, h.hour, h.n_events,
       ROUND((CAST(h.n_events AS DOUBLE) - s.mean) / s.std, 6) AS z
FROM h JOIN s USING (event_type)
WHERE s.std > 0 AND abs((CAST(h.n_events AS DOUBLE) - s.mean) / s.std) >= 2.0
"""


def doc_fingerprint(sf_dir: str):
    from core_ray.text.analysis import Fingerprinter

    _ensure_docs_golden(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        Fingerprinter, batch_format="pyarrow", batch_size=4096, concurrency=(1, 4)
    ).select_columns(["doc_id", "fingerprint"])


_DUP_CHAIN_CACHE: dict = {}


def _dup_pairs(sf_dir: str, threshold: float = 0.5):
    """Session+sf-keyed materialization of the minhash -> banding -> pair
    chain — the expensive step of the dedup family (VERDICT r4 "what's
    missing 3": five consumers re-ran it from scratch). The pair table is
    bounded by near-dups (the dedup contract), so pinning it costs what
    any single consumer's own run would."""
    key = (_ray_session_key(), sf_dir, threshold, "pairs")
    if key[0] is not None and key in _DUP_CHAIN_CACHE:
        return _DUP_CHAIN_CACHE[key]
    from core_ray.text.dedup import minhash_near_dups

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    pairs = minhash_near_dups(ds, threshold=threshold).materialize()
    key = (_ray_session_key(), sf_dir, threshold, "pairs")
    if key[0] is not None:
        _DUP_CHAIN_CACHE[key] = pairs
    return pairs


def _dup_clusters(sf_dir: str, threshold: float = 0.5):
    """Materialized CC cluster table over _dup_pairs (same cache; the
    pointer-jumping rounds run once per session per sf_dir)."""
    key = (_ray_session_key(), sf_dir, threshold, "clusters")
    if key[0] is not None and key in _DUP_CHAIN_CACHE:
        return _DUP_CHAIN_CACHE[key]
    from core_ray.stages.cc import connected_components

    clusters = connected_components(
        _dup_pairs(sf_dir, threshold), src="id_a", dst="id_b"
    ).materialize()
    key = (_ray_session_key(), sf_dir, threshold, "clusters")
    if key[0] is not None:
        _DUP_CHAIN_CACHE[key] = clusters
    return clusters


def doc_minhash_pairs(sf_dir: str):
    _ensure_docs_golden(sf_dir)
    return _dup_pairs(sf_dir, threshold=0.5)


def doc_simhash_pairs(sf_dir: str):
    from core_ray.text.dedup import simhash_near_dups

    _ensure_docs_golden(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_near_dups(ds, max_hamming=6)


def doc_dup_clusters(sf_dir: str):
    """Near-dup CLUSTER assignment: minhash pairs -> connected components
    (min-label propagation + pointer jumping, stages/cc.py), every paired
    document labeled with its component's minimum doc id. This is the step
    that turns pairwise near-dup evidence into the keep/drop partition a
    corpus dedup actually applies (chained near-dups A~B~C collapse to one
    cluster even though A and C never paired directly)."""
    _ensure_docs_golden(sf_dir)
    return _dup_clusters(sf_dir, threshold=0.5)


# ---------------------------------------------------------------- embeddings


def _load_queries(sf_dir: str, modulus: int = 100):
    """Query-vector selection: DISTRIBUTED filter over the embeddings table;
    only the tiny surviving set (1/modulus of rows) crosses to the driver —
    never the full table."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    picked = ds.map_batches(
        lambda b: b.filter(
            pa.array(b["vec_id"].to_numpy(zero_copy_only=False) % modulus == 0)
        ),
        batch_format="pyarrow",
        batch_size=65536,
    )
    t = _collect_table(picked)
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    q = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, q


def emb_topk(sf_dir: str):
    from core_ray.text.similarity import brute_force_topk

    q_ids, q = _load_queries(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return brute_force_topk(ds, q_ids, q, k=5)


EMB_TOPK_SQL = """
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id % 100 = 0),
sims AS (
  SELECT q.qid AS query_id, e.vec_id,
         LIST_COSINE_SIMILARITY(q.qe::DOUBLE[], e.embedding::DOUBLE[]) AS s
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.qid)
SELECT query_id, vec_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) - 1 AS INTEGER) AS "rank",
       ROUND(s, 6) AS sim
FROM sims
QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) <= 5
"""


def emb_centroids(sf_dir: str):
    from core_ray.text.similarity import label_centroids

    ds = _read(sf_dir, "embeddings", ["label", "embedding"])
    return label_centroids(ds)


_KMEANS_K = 8
_KMEANS_ITERS = 5


def emb_kmeans(sf_dir: str, k: int = _KMEANS_K, iters: int = _KMEANS_ITERS):
    """Distributed Lloyd's k-means — the iterative-ML-training dataflow shape
    (PageRank's sibling: per-iteration full-corpus pass + tiny mergeable
    state). Deterministic spec: init = embeddings of the k smallest vec_ids,
    assignment = nearest center (squared euclidean, ties -> lowest index),
    update = member mean (empty cluster keeps its center), centers rounded
    to 6 decimals each iteration — the rounding absorbs partial-sum
    reassociation so the distributed path is bit-equal to the single-process
    golden (fixtures/docs_golden.golden_kmeans), same determinism contract
    as stages/pagerank's per-iteration 1e-12 round.

    Scale shape: each iteration is ONE map_batches pass emitting k x dim
    partial sums per batch (constant-size combiner rows — never the
    vectors); the driver folds k x dim doubles and re-broadcasts. The
    corpus is materialized once and re-read per iteration from the object
    store — the standard distributed-k-means access pattern."""
    import ray

    from core_ray.collect import collect_table

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()

    def _mat(b: pa.Table) -> np.ndarray:
        col = b["embedding"]
        # list_flatten honors slice offsets (col.values would not on a
        # zero-copy block slice)
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(len(col), -1)

    def seed_prune(b: pa.Table) -> pa.Table:
        order = pc.sort_indices(b, sort_keys=[("vec_id", "ascending")])
        return b.take(order[:k])

    seeds = collect_table(
        ds.map_batches(seed_prune, batch_format="pyarrow", batch_size=65536)
    )
    order = np.argsort(seeds["vec_id"].to_numpy(zero_copy_only=False))[:k]
    centers = sql_round_np(_mat(seeds)[order], 6)

    def partials(b: pa.Table, cref) -> pa.Table:
        c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        x = _mat(b)
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        sums = np.zeros_like(c)
        np.add.at(sums, a, x)
        cnt = np.bincount(a, minlength=len(c)).astype(np.int64)
        kk, dim = c.shape
        return pa.table(
            {
                "cluster": pa.array(np.repeat(np.arange(kk, dtype=np.int32), dim)),
                "dim": pa.array(np.tile(np.arange(dim, dtype=np.int32), kk)),
                "s": pa.array(sums.ravel(), pa.float64()),
                "cnt": pa.array(np.repeat(cnt, dim), pa.int64()),
            }
        )

    for _ in range(iters):
        cref = ray.put(centers)
        pt = collect_table(
            ds.map_batches(partials, fn_args=(cref,), batch_format="pyarrow",
                           batch_size=65536)
        )
        cl = pt["cluster"].to_numpy(zero_copy_only=False)
        dm = pt["dim"].to_numpy(zero_copy_only=False)
        sums = np.zeros_like(centers)
        np.add.at(sums, (cl, dm), pt["s"].to_numpy(zero_copy_only=False))
        cnts = np.zeros(len(centers), dtype=np.int64)
        np.add.at(cnts, cl[dm == 0], pt["cnt"].to_numpy(zero_copy_only=False)[dm == 0])
        newc = centers.copy()
        nz = cnts > 0
        newc[nz] = sums[nz] / cnts[nz, None]
        centers = sql_round_np(newc, 6)

    cref = ray.put(centers)

    def assign(b: pa.Table, cref=cref) -> pa.Table:
        c = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        x = _mat(b)
        d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "cluster": pa.array(d.argmin(axis=1).astype(np.int32), pa.int32()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=65536)


EMB_CENTROIDS_SQL = """
WITH x AS (
  SELECT CAST(label AS BIGINT) AS label,
         CAST(GENERATE_SUBSCRIPTS(embedding, 1) AS BIGINT) AS dim,
         UNNEST(embedding)::DOUBLE AS val
  FROM embeddings)
SELECT label, dim, ROUND(SUM(val) / COUNT(*), 6) AS mean_val
FROM x GROUP BY 1, 2
"""


def emb_ann_lsh(sf_dir: str):
    from core_ray.text.similarity import lsh_ann_topk

    _ensure_docs_golden(sf_dir)
    q_ids, _ = _load_queries(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return lsh_ann_topk(ds, q_ids, k=5)


# ---------------------------------------------------------------- geo over
# documents-derived deterministic coordinates (SQL-mirrorable arithmetic)

GEO_LAT_SQL = "((doc_id * 7919) % 140000) / 1000.0 - 70.0"
GEO_LON_SQL = "((doc_id * 104729) % 360000) / 1000.0 - 180.0"


def _derive_coords(doc_id: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lat = ((doc_id * 7919) % 140000) / 1000.0 - 70.0
    lon = ((doc_id * 104729) % 360000) / 1000.0 - 180.0
    return lat, lon


def geo_tile_counts(sf_dir: str, zooms=(7, 9, 12)):
    """Tile-key counting at high cardinality (~#distinct tiles keys): the
    (z,x,y) triple packs losslessly into uint64 (stages/tiles.py key
    layout), so the count runs through the vectorized combiner +
    hash-partition reduce (stages/agg.py) and unpacks at the end — never
    Ray's Python-per-key aggregate."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "documents", ["doc_id"])

    def tiles(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        keys = []
        for z in zooms:
            x, y = mercator.lonlat_to_tile(lon, lat, z)
            keys.append(
                mercator.tile_key(
                    np.full(len(x), z, dtype=np.uint64),
                    x.astype(np.uint64),
                    y.astype(np.uint64),
                )
            )
        return pa.table({"key": pa.array(np.concatenate(keys), pa.uint64())})

    counted = count_by_u64(
        ds.map_batches(tiles, batch_format="pyarrow", batch_size=65536), "key"
    )

    def unpack(b: pa.Table) -> pa.Table:
        uz, ux, uy = mercator.tile_unkey(b["key"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "tile_z": pa.array(uz, pa.int32()),
                "tile_x": pa.array(ux, pa.int64()),
                "tile_y": pa.array(uy, pa.int64()),
                "n_points": pa.array(
                    b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64), pa.int64()
                ),
            }
        )

    return counted.map_batches(unpack, batch_format="pyarrow")


def _geo_tile_sql_one(z: int) -> str:
    n = float(1 << z)
    return f"""
  SELECT {z} AS tile_z,
         CAST(LEAST({n} - 1, GREATEST(0, FLOOR((lon + 180.0) / 360.0 * {n}))) AS BIGINT) AS tile_x,
         CAST(LEAST({n} - 1, GREATEST(0, FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat))) / PI()) / 2.0 * {n}))) AS BIGINT) AS tile_y
  FROM pts
"""


GEO_TILE_COUNTS_SQL = (
    f"WITH pts AS (SELECT {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),\n"
    "tiles AS (" + "\n  UNION ALL\n".join(_geo_tile_sql_one(z) for z in (7, 9, 12)) + ")\n"
    "SELECT CAST(tile_z AS INTEGER) AS tile_z, tile_x, tile_y, COUNT(*) AS n_points "
    "FROM tiles GROUP BY 1, 2, 3"
)


# deterministic 3-level rectangle admin hierarchy; bounds at .0005 offsets so
# no derived point (3 decimals) ever sits on a boundary. Mirrored verbatim in
# the SQL VALUES list.
GEO_RECTS = [
    # (admin_id, level, lat0, lon0, lat1, lon1)
    ("A0-west", 0, -70.0005, -180.0005, 70.0005, 0.0005),
    ("A1-east", 0, -70.0005, 0.0005, 70.0005, 180.0005),
    ("B0-nw", 1, 0.0005, -180.0005, 70.0005, -90.0005),
    ("B1-ne", 1, 0.0005, 90.0005, 70.0005, 180.0005),
    ("B2-sw", 1, -70.0005, -90.0005, -0.0005, 0.0005),
    ("B3-se", 1, -70.0005, 0.0005, -0.0005, 90.0005),
    ("C0-a", 2, 10.0005, -120.0005, 40.0005, -100.0005),
    ("C1-b", 2, 20.0005, 100.0005, 50.0005, 140.0005),
    ("C2-c", 2, -50.0005, -60.0005, -20.0005, -30.0005),
    ("C3-overlap1", 2, 30.0005, 110.0005, 45.0005, 130.0005),  # overlaps C1-b
    ("C4-d", 2, -30.0005, 20.0005, -10.0005, 60.0005),
    ("C5-e", 2, 40.0005, -40.0005, 65.0005, -10.0005),
]


def _geo_admin_table() -> pa.Table:
    rows = []
    for aid, lvl, lat0, lon0, lat1, lon1 in GEO_RECTS:
        wkt = (
            f"POLYGON (({lon0} {lat0}, {lon1} {lat0}, {lon1} {lat1}, "
            f"{lon0} {lat1}, {lon0} {lat0}))"
        )
        rows.append((aid, lvl, wkt))
    return pa.table(
        {
            "admin_id": pa.array([r[0] for r in rows], pa.string()),
            "level": pa.array([r[1] for r in rows], pa.int8()),
            "wkt": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def geo_pip_admin(sf_dir: str):
    """Point-in-polygon with deepest-wins precedence over the deterministic
    rect hierarchy — runs the REAL PipJoin actor (STRtree + tie-breaks) so the
    DuckDB oracle validates the containment-join machinery itself."""
    import ray

    from core_ray.stages.pip import PipJoin

    admin_ref = ray.put(_geo_admin_table())
    ds = _read(sf_dir, "documents", ["doc_id"])

    def coords(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )

    pts = ds.map_batches(coords, batch_format="pyarrow", batch_size=65536)
    out = pts.map_batches(
        PipJoin, fn_constructor_args=(admin_ref,), batch_format="pyarrow",
        batch_size=65536, concurrency=(1, 4),
    )
    return out.select_columns(["doc_id", "admin_id", "admin_level"])


def _geo_rects_values_sql() -> str:
    rows = ",\n    ".join(
        f"('{aid}', {lvl}, {lat0}, {lon0}, {lat1}, {lon1})"
        for aid, lvl, lat0, lon0, lat1, lon1 in GEO_RECTS
    )
    return f"(VALUES\n    {rows}) AS r(admin_id, level, lat0, lon0, lat1, lon1)"


GEO_PIP_ADMIN_SQL = f"""
WITH pts AS (SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
hits AS (
  SELECT p.doc_id, r.admin_id, r.level
  FROM pts p JOIN {_geo_rects_values_sql()}
    ON p.lat BETWEEN r.lat0 AND r.lat1 AND p.lon BETWEEN r.lon0 AND r.lon1),
best AS (
  SELECT doc_id, admin_id, level FROM hits
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY level DESC, admin_id) = 1)
SELECT p.doc_id, b.admin_id, CAST(COALESCE(b.level, -1) AS TINYINT) AS admin_level
FROM pts p LEFT JOIN best b USING (doc_id)
"""


_HULL_ZOOM = 4


def _monotone_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain over DISTINCT lexicographically-sorted
    (lon, lat) rows. Strict turns (collinear vertices dropped); returns
    hull vertices CCW starting at the smallest vertex; <=2 points pass
    through. Sign decisions are exact on identical doubles, so engine and
    golden (fixtures/docs_golden.golden_tile_hulls — an independent
    dict/loop implementation) agree bit-for-bit."""
    m = len(pts)
    if m <= 2:
        return pts

    def half(seq):
        h = []
        for p in seq:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
            ) <= 0.0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(pts[::-1])
    return np.array(lower[:-1] + upper[:-1], dtype=np.float64)


def _per_tile_hulls(t: pa.Table, emit_seq: bool) -> pa.Table:
    """(key:uint64 tile, lon, lat) rows -> per-tile hull vertices. The walk
    loops over TILES present in the block, never over raw rows; dedup/sort
    are vectorized."""
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    lon = t["lon"].to_numpy(zero_copy_only=False)
    lat = t["lat"].to_numpy(zero_copy_only=False)
    order = np.lexsort((lat, lon, key))
    key, lon, lat = key[order], lon[order], lat[order]
    distinct = np.ones(len(key), dtype=bool)
    distinct[1:] = (
        (key[1:] != key[:-1]) | (lon[1:] != lon[:-1]) | (lat[1:] != lat[:-1])
    )
    key, lon, lat = key[distinct], lon[distinct], lat[distinct]
    new = np.ones(len(key), dtype=bool)
    new[1:] = key[1:] != key[:-1]
    starts = np.nonzero(new)[0]
    bounds = np.append(starts, len(key))
    out_k, out_seq, out_lon, out_lat = [], [], [], []
    for i, s in enumerate(starts):
        e = bounds[i + 1]
        hull = _monotone_hull(np.column_stack([lon[s:e], lat[s:e]]))
        out_k.append(np.full(len(hull), key[s], dtype=np.uint64))
        out_seq.append(np.arange(len(hull), dtype=np.int32))
        out_lon.append(hull[:, 0])
        out_lat.append(hull[:, 1])
    cols = {
        "key": pa.array(
            np.concatenate(out_k) if out_k else np.zeros(0, np.uint64),
            pa.uint64()),
    }
    if emit_seq:
        cols["seq"] = pa.array(
            np.concatenate(out_seq) if out_seq else np.zeros(0, np.int32),
            pa.int32())
    cols["lon"] = pa.array(
        np.concatenate(out_lon) if out_lon else np.zeros(0), pa.float64())
    cols["lat"] = pa.array(
        np.concatenate(out_lat) if out_lat else np.zeros(0), pa.float64())
    return pa.table(cols)


def tile_hulls(tagged):
    """Dataset[(key:uint64 tile, lon, lat)] -> Dataset[(tile_x, tile_y, seq,
    lat, lon)]: per-batch hull-vertex pruning (the exact hull-of-hulls
    combiner: hull(A ∪ B) == hull(hull(A) ∪ hull(B))), ONE shuffle carrying
    only hull candidates, per-partition final hulls."""
    from core_ray.stages.agg import map_groups_partitioned

    pruned = tagged.map_batches(
        lambda b: _per_tile_hulls(b, emit_seq=False),
        batch_format="pyarrow", batch_size=65536,
    )

    def finish(g: pa.Table) -> pa.Table:
        t = _per_tile_hulls(g, emit_seq=True)
        k = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "tile_x": pa.array((k >> np.uint64(32)).astype(np.int64), pa.int64()),
                "tile_y": pa.array(
                    (k & np.uint64(0xFFFFFFFF)).astype(np.int64), pa.int64()),
                "seq": t["seq"],
                "lat": t["lat"],
                "lon": t["lon"],
            }
        )

    return map_groups_partitioned(pruned, "key", finish)


def geo_convex_hull(sf_dir: str, zoom: int = _HULL_ZOOM):
    """Per-tile convex hulls — grouped vector geometry (the dissolve/hull
    half of the raster<->vector family, alongside geo_tile_regions'
    polygonize and geo_rect_cover's polyfill). Distributed via the exact
    hull-of-hulls combiner, so the groupby moves at most O(hull size) rows
    per tile per batch, never the member points (a mega-city tile ships a
    few dozen vertices, not millions of rows). Oracle: independent
    dict/loop monotone chain materialized as golden parquet."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def tag(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        x, y = mercator.lonlat_to_tile(lon, lat, zoom)
        key = (x.astype(np.uint64) << np.uint64(32)) | y.astype(np.uint64)
        return pa.table(
            {
                "key": pa.array(key, pa.uint64()),
                "lon": pa.array(lon, pa.float64()),
                "lat": pa.array(lat, pa.float64()),
            }
        )

    return tile_hulls(ds.map_batches(tag, batch_format="pyarrow", batch_size=65536))


def geo_knn_tile(sf_dir: str, k: int = 3, zoom: int = 4):
    """Per-tile kNN self-join (squared euclidean in degree space; bit-exact
    formula mirrored in SQL). groupby(tile) shuffle + per-group numpy."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def tag(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        x, y = mercator.lonlat_to_tile(lon, lat, zoom)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
                "tile_x": pa.array(x, pa.int64()),
                "tile_y": pa.array(y, pa.int64()),
            }
        )

    def group_knn(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        lat = g["lat"].to_numpy(zero_copy_only=False)
        lon = g["lon"].to_numpy(zero_copy_only=False)
        out_id, out_nb, out_rk, out_d = [], [], [], []
        for i in range(len(ids)):
            dla = lat[i] - lat
            dlo = lon[i] - lon
            sq = dla * dla + dlo * dlo
            sq[i] = np.inf
            order = np.lexsort((ids, sq))[: min(k, len(ids) - 1)]
            for r, j in enumerate(order):
                out_id.append(ids[i])
                out_nb.append(ids[j])
                out_rk.append(r)
                out_d.append(sq[j])
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "neighbor_id": pa.array(out_nb, pa.int64()),
                "rank": pa.array(out_rk, pa.int32()),
                "sq_dist": pa.array(out_d, pa.float64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=65536)
        .groupby(["tile_x", "tile_y"])
        .map_groups(group_knn, batch_format="pyarrow")
    )


_N9 = float(1 << 4)  # zoom 4: coarse enough that tiles hold multiple points
GEO_KNN_TILE_SQL = f"""
WITH pts AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
tiled AS (
  SELECT doc_id, lat, lon,
         CAST(LEAST({_N9} - 1, GREATEST(0, FLOOR((lon + 180.0) / 360.0 * {_N9}))) AS BIGINT) AS tile_x,
         CAST(LEAST({_N9} - 1, GREATEST(0, FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat))) / PI()) / 2.0 * {_N9}))) AS BIGINT) AS tile_y
  FROM pts),
pairs AS (
  SELECT a.doc_id, b.doc_id AS neighbor_id,
         (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon) AS sq_dist
  FROM tiled a JOIN tiled b
    ON a.tile_x = b.tile_x AND a.tile_y = b.tile_y AND a.doc_id <> b.doc_id)
SELECT doc_id, neighbor_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sq_dist, neighbor_id) - 1 AS INTEGER) AS "rank",
       sq_dist
FROM pairs
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sq_dist, neighbor_id) <= 3
"""


def geo_zonal_stats(sf_dir: str):
    """Zonal statistics (classic raster->vector aggregate): per admin zone,
    the count and mean size of the documents whose point falls inside it,
    zone membership decided by the SAME deepest-wins PipJoin actor the
    containment join uses. Payload columns ride THROUGH the actor-pool
    stage (PipJoin appends, never projects), so the stats need no second
    join; the final group is |zones| rows via a per-batch combiner. The
    mean is one float division of exact integer sums, mirrored in SQL."""
    import ray
    from ray.data.aggregate import Sum

    from core_ray.stages.pip import PipJoin

    admin_ref = ray.put(_geo_admin_table())

    def coords(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_chars": b["n_chars"],
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )

    joined = (
        _read(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(coords, batch_format="pyarrow", batch_size=65536)
        .map_batches(
            PipJoin, fn_constructor_args=(admin_ref,), batch_format="pyarrow",
            batch_size=65536, concurrency=(1, 4),
        )
    )

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b["admin_level"], 0))
        t = pa.table(
            {
                "admin_id": t["admin_id"],
                "n": pa.array(np.ones(len(t), np.int64), pa.int64()),
                "chars": pc.cast(t["n_chars"], pa.int64()),
            }
        )
        return pa.TableGroupBy(t, ["admin_id"]).aggregate([("n", "sum"), ("chars", "sum")])

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("admin_id")
        .aggregate(Sum("n_sum", alias_name="n_docs"), Sum("chars_sum", alias_name="sum_chars"))
    )
    t = _collect_table(agg)
    n = t["n_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
    s = t["sum_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
    return pa.table(
        {
            "admin_id": t["admin_id"],
            "n_docs": pc.cast(t["n_docs"], pa.int64()),
            "sum_chars": pc.cast(t["sum_chars"], pa.int64()),
            "mean_chars": pa.array(sql_round_np(s / n, 6), pa.float64()),
        }
    ).sort_by("admin_id")


GEO_ZONAL_SQL = f"""
WITH pts AS (
  SELECT doc_id, n_chars, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
hits AS (
  SELECT p.doc_id, p.n_chars, r.admin_id, r.level
  FROM pts p JOIN {_geo_rects_values_sql()}
    ON p.lat BETWEEN r.lat0 AND r.lat1 AND p.lon BETWEEN r.lon0 AND r.lon1),
best AS (
  SELECT doc_id, n_chars, admin_id FROM hits
  QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY level DESC, admin_id) = 1)
SELECT admin_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars,
       ROUND(CAST(SUM(CAST(n_chars AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_chars
FROM best GROUP BY 1 ORDER BY 1
"""


_GEO_PAIR_RADIUS_DEG = 5.0  # band radius; cell size == radius (3x3 cover)


def geo_distance_pairs(sf_dir: str, radius: float = _GEO_PAIR_RADIUS_DEG):
    """Distance-band spatial self-join: ALL pairs of documents within
    ``radius`` in squared-degree space — the within-distance join per-tile
    kNN cannot express (kNN misses cross-tile neighbors; this op is exact
    across cells). The operator lives in stages/distband.py (home+ghost
    cell replication, ONE hash shuffle, vectorized per-partition pair
    construction, chunked against dense-cell skew); its cross-cell
    exactness is property-tested against a dense brute-force oracle in
    tests/test_distband.py, and the driver hash checks the derived-
    coordinate lattice against DuckDB's brute-force cross join —
    (a-b)*(a-b) sums, bit-identical IEEE ops on both sides."""
    from core_ray.stages.distband import distance_pairs

    def coords(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )

    pts = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        coords, batch_format="pyarrow", batch_size=65536
    )
    return distance_pairs(pts, radius)


GEO_DISTANCE_PAIRS_SQL = f"""
WITH pts AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon) AS sq_dist
FROM pts a JOIN pts b ON a.doc_id < b.doc_id
WHERE (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon)
      <= {_GEO_PAIR_RADIUS_DEG * _GEO_PAIR_RADIUS_DEG}
"""


_HAVERSINE_BAND_KM = 100.0


def geo_haversine_pairs(sf_dir: str, max_km: float = _HAVERSINE_BAND_KM):
    """Distance-band self-join in TRUE kilometers: all event pairs within
    ``max_km`` great-circle distance, over the events table (10k/100k rows
    at sf0.01/0.1 — the densest derived-coordinate lattice). Same one-
    shuffle home+ghost plan as geo_distance_pairs with metric-aware cell
    sizing (lat cells from the meridian bound, lon cells widened by
    1/cos(max|lat|)) and a modular LON RING so antimeridian pairs
    co-locate (great-circle distance wraps; degree-space does not) — see
    stages/distband.py haversine_distance_pairs, brute-force-tested incl.
    wraparound and high-latitude cases in tests/test_distband.py.

    Float-parity design: numpy's sin/cos/asin differ from DuckDB's libm by
    1-2 ULP (measured: max 3.6e-12 km on this lattice), so emitting the raw
    distance would hash-mismatch. The output instead carries
    FLOOR(dist_km)::BIGINT — a flip needs a pair within ~4e-12 km of an
    integer (p ~ 1e-7 over this output) — and the <= max_km threshold has
    the same negligible straddle risk."""
    from core_ray.stages.distband import haversine_distance_pairs

    def coords(b: pa.Table) -> pa.Table:
        ev = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(ev)
        return pa.table(
            {
                "doc_id": b["event_id"],
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )

    pts = _read(sf_dir, "events", ["event_id"]).map_batches(
        coords, batch_format="pyarrow", batch_size=65536
    )
    pairs = haversine_distance_pairs(pts, max_km)

    def finish(b: pa.Table) -> pa.Table:
        d = b["dist_km"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_a": b["doc_a"],
                "event_b": b["doc_b"],
                "km_floor": pa.array(np.floor(d).astype(np.int64), pa.int64()),
            }
        )

    return pairs.map_batches(finish, batch_format="pyarrow")


# the SQL mirrors haversine_km (stages/distband.py) term-for-term: same
# left-associative order, a = smaller event_id (matching the engine's
# home-left/larger-right emission), so both sides run the identical IEEE
# expression tree modulo libm ULPs (absorbed by the FLOOR output contract).
GEO_HAVERSINE_PAIRS_SQL = f"""
WITH pts AS (
  SELECT event_id, {GEO_LAT_SQL.replace('doc_id', 'event_id')} AS lat,
         {GEO_LON_SQL.replace('doc_id', 'event_id')} AS lon FROM events),
d AS (
  SELECT a.event_id AS event_a, b.event_id AS event_b,
         2.0 * 6371.0088 * ASIN(SQRT(
           SIN(RADIANS(b.lat - a.lat) / 2.0) * SIN(RADIANS(b.lat - a.lat) / 2.0)
           + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
             * SIN(RADIANS(b.lon - a.lon) / 2.0) * SIN(RADIANS(b.lon - a.lon) / 2.0)
         )) AS dist_km
  FROM pts a JOIN pts b ON a.event_id < b.event_id)
SELECT event_a, event_b, CAST(FLOOR(dist_km) AS BIGINT) AS km_floor
FROM d WHERE dist_km <= {_HAVERSINE_BAND_KM}
"""


def geo_traj_stats(sf_dir: str):
    """Per-user TRAJECTORY statistics: treat each user's (ts, event_id)-
    ordered event history as a path over the derived coordinate lattice and
    report legs walked, total great-circle km and the longest single leg.
    One hash-partition shuffle by user (same plan as events_lag_delta);
    every user's rows co-locate, so the per-leg haversine AND the per-user
    reduction finish inside one partition pass — no second shuffle.

    Float parity: per-leg distances quantize to FLOOR km (numpy vs DuckDB
    libm differ by ULPs — see geo_haversine_pairs); the per-user totals are
    then INTEGER sums, order-independent and exact on both sides."""
    from core_ray.stages.agg import map_groups_partitioned
    from core_ray.stages.distband import haversine_km

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_part(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], pa.int64()),
                "n_legs": pa.array([], pa.int64()),
                "total_km": pa.array([], pa.int64()),
                "max_leg_km": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, eid = uid[order], eid[order]
        lat, lon = _derive_coords(eid)
        leg = np.zeros(len(uid), dtype=bool)
        leg[1:] = uid[1:] == uid[:-1]
        if not leg.any():
            return empty
        i = np.nonzero(leg)[0]
        km = np.floor(
            haversine_km(lat[i - 1], lon[i - 1], lat[i], lon[i])
        ).astype(np.int64)
        lu = uid[i]  # sorted (legs follow the user-sorted order)
        starts = np.nonzero(np.r_[True, lu[1:] != lu[:-1]])[0]
        n_legs = np.diff(np.append(starts, len(lu)))
        total = np.add.reduceat(km, starts)
        mx = np.maximum.reduceat(km, starts)
        return pa.table(
            {
                "user_id": pa.array(lu[starts], pa.int64()),
                "n_legs": pa.array(n_legs.astype(np.int64), pa.int64()),
                "total_km": pa.array(total, pa.int64()),
                "max_leg_km": pa.array(mx, pa.int64()),
            }
        )

    return map_groups_partitioned(ds, "user_id", per_part)


_SPEED_KMH = 900  # faster than a commercial jet -> GPS spike


def events_speed_outliers(sf_dir: str):
    """TRAJECTORY SPEED-SPIKE FILTER (GPS noise removal): flag legs whose
    implied speed exceeds {S} km/h — the cleaning pass every telemetry
    pipeline runs before map-matching or stay-point detection. Same
    one-shuffle plan as geo_traj_stats (hash-partition by user, per-leg
    work inside the partition pass). The speed test never divides: it is
    the INTEGER cross-multiply leg_km * 3.6e9 > S * dt_us (so dt == 0 with
    movement flags correctly and parity with SQL is exact); leg_km is the
    FLOOR-quantized haversine shared with geo_traj_stats (numpy and DuckDB
    libm differ by ULPs — the quantizer is the documented contract)."""
    from core_ray.stages.agg import map_groups_partitioned
    from core_ray.stages.distband import haversine_km

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "event_id": pa.array([], pa.int64()),
            "leg_km": pa.array([], pa.int64()),
            "dt_us": pa.array([], pa.int64()),
        }
    )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, us, uid))
        uid, us, eid = uid[order], us[order], eid[order]
        lat, lon = _derive_coords(eid)
        leg = np.zeros(len(uid), dtype=bool)
        leg[1:] = uid[1:] == uid[:-1]
        i = np.nonzero(leg)[0]
        if len(i) == 0:
            return _empty
        km = np.floor(
            haversine_km(lat[i - 1], lon[i - 1], lat[i], lon[i])
        ).astype(np.int64)
        dt = us[i] - us[i - 1]
        hot = km * 3_600_000_000 > _SPEED_KMH * dt
        i = i[hot]
        return pa.table(
            {
                "user_id": pa.array(uid[i], pa.int64()),
                "event_id": pa.array(eid[i], pa.int64()),
                "leg_km": pa.array(km[hot], pa.int64()),
                "dt_us": pa.array(dt[hot], pa.int64()),
            }
        )

    return map_groups_partitioned(ds, "user_id", per_part)


EVENTS_SPEED_OUTLIERS_SQL = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         {GEO_LAT_SQL.replace('doc_id', 'event_id')} AS lat,
         {GEO_LON_SQL.replace('doc_id', 'event_id')} AS lon FROM events),
legs AS (
  SELECT user_id, event_id,
         LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon, lat, lon,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS dt_us
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
km AS (
  SELECT user_id, event_id, dt_us, CAST(FLOOR(
    2.0 * 6371.0088 * ASIN(SQRT(
      SIN(RADIANS(lat - plat) / 2.0) * SIN(RADIANS(lat - plat) / 2.0)
      + COS(RADIANS(plat)) * COS(RADIANS(lat))
        * SIN(RADIANS(lon - plon) / 2.0) * SIN(RADIANS(lon - plon) / 2.0)
    ))) AS BIGINT) AS leg_km
  FROM legs WHERE plat IS NOT NULL)
SELECT user_id, event_id, leg_km, dt_us
FROM km WHERE leg_km * 3600000000 > {_SPEED_KMH} * dt_us
"""


GEO_TRAJ_STATS_SQL = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         {GEO_LAT_SQL.replace('doc_id', 'event_id')} AS lat,
         {GEO_LON_SQL.replace('doc_id', 'event_id')} AS lon FROM events),
legs AS (
  SELECT user_id,
         LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon, lat, lon
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
km AS (
  SELECT user_id, CAST(FLOOR(
    2.0 * 6371.0088 * ASIN(SQRT(
      SIN(RADIANS(lat - plat) / 2.0) * SIN(RADIANS(lat - plat) / 2.0)
      + COS(RADIANS(plat)) * COS(RADIANS(lat))
        * SIN(RADIANS(lon - plon) / 2.0) * SIN(RADIANS(lon - plon) / 2.0)
    ))) AS BIGINT) AS leg_km
  FROM legs WHERE plat IS NOT NULL)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_legs,
       CAST(SUM(leg_km) AS BIGINT) AS total_km,
       MAX(leg_km) AS max_leg_km
FROM km GROUP BY user_id
"""


# derived short segments (extent <= 1 degree per axis): start at the event's
# lattice point, end at a deterministic small offset — same spirit as
# _derive_coords, off-lattice denominators keep endpoints generic.
GEO_SEG_DLAT_SQL = "((event_id * 31) % 2001) / 1000.0 - 1.0"
GEO_SEG_DLON_SQL = "((event_id * 57) % 2001) / 1000.0 - 1.0"


def geo_segment_crossings(sf_dir: str):
    """Segment-intersection self-join: every pair of derived trajectory
    segments that PROPERLY cross in planar coordinate space. Extends the
    grid-partition join family from points (distband) to extended objects:
    bbox-overlap cell replication + canonical-cell dedup + strict
    orientation-sign predicate (multiply/subtract only — the SQL oracle
    runs the SAME correctly-rounded IEEE expression, so unlike the
    haversine family there is no ULP caveat and the pair set is bit-exact).
    See stages/segjoin.py; brute-force-tested in tests/test_segjoin.py."""
    from core_ray.stages.segjoin import segment_crossings

    def segs(b: pa.Table) -> pa.Table:
        ev = b["event_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(ev)
        dlat = ((ev * 31) % 2001) / 1000.0 - 1.0
        dlon = ((ev * 57) % 2001) / 1000.0 - 1.0
        return pa.table(
            {
                "seg_id": b["event_id"],
                "ax": pa.array(lon, pa.float64()),
                "ay": pa.array(lat, pa.float64()),
                "bx": pa.array(lon + dlon, pa.float64()),
                "by": pa.array(lat + dlat, pa.float64()),
            }
        )

    ds = _read(sf_dir, "events", ["event_id"]).map_batches(
        segs, batch_format="pyarrow", batch_size=65536
    )
    return segment_crossings(ds, cell=1.0)


GEO_SEGMENT_CROSSINGS_SQL = f"""
WITH raw AS (
  SELECT event_id AS seg_id,
         {GEO_LON_SQL.replace('doc_id', 'event_id')} AS ax,
         {GEO_LAT_SQL.replace('doc_id', 'event_id')} AS ay,
         {GEO_LON_SQL.replace('doc_id', 'event_id')} + ({GEO_SEG_DLON_SQL}) AS bx,
         {GEO_LAT_SQL.replace('doc_id', 'event_id')} + ({GEO_SEG_DLAT_SQL}) AS by
  FROM events),
segs AS MATERIALIZED (
  SELECT seg_id, ax, ay, bx, by,
         LEAST(ax, bx) AS mnx, GREATEST(ax, bx) AS mxx,
         LEAST(ay, by) AS mny, GREATEST(ay, by) AS mxy
  FROM raw)
SELECT a.seg_id AS seg_a, b.seg_id AS seg_b
FROM segs a JOIN segs b
  ON a.seg_id < b.seg_id
 AND a.mnx <= b.mxx AND b.mnx <= a.mxx
 AND a.mny <= b.mxy AND b.mny <= a.mxy
WHERE ((a.bx - a.ax) * (b.ay - a.ay) - (a.by - a.ay) * (b.ax - a.ax))
      * ((a.bx - a.ax) * (b.by - a.ay) - (a.by - a.ay) * (b.bx - a.ax)) < 0.0
  AND ((b.bx - b.ax) * (a.ay - b.ay) - (b.by - b.ay) * (a.ax - b.ax))
      * ((b.bx - b.ax) * (a.by - b.ay) - (b.by - b.ay) * (a.bx - b.ax)) < 0.0
"""


_INTERP_GRID_DEG = 10.0  # target grid cell size (aligned to multiples of 10)


def geo_area_interp(sf_dir: str):
    """AREAL INTERPOLATION (the classic GIS overlay re-aggregation): a
    quantity known per source zone — documents counted inside each admin
    rectangle — is re-distributed onto a regular 10-degree target grid
    proportionally to overlap area. Plan: one streaming pass counts docs
    per admin (13 rects broadcast as a constant, per-batch partial counts,
    tiny final groupby); the (admin x grid) overlay then EXPLODES the
    13-row side table inside map_batches (same broadcast-side-builder
    shape as geo_rect_cover) and a final small groupby sums per cell.

    Float parity: overlap widths, areas and fractions are min/max/multiply/
    divide — correctly-rounded IEEE mirrored bit-exactly by SQL — and each
    per-(cell, admin) contribution is rounded to INTEGER micro-docs before
    the per-cell sum, so the sum is order-independent BIGINT arithmetic on
    both sides (double SUM order would otherwise differ)."""
    import ray

    g = _INTERP_GRID_DEG
    rects = [
        (aid, float(lat0), float(lon0), float(lat1), float(lon1))
        for (aid, _lvl, lat0, lon0, lat1, lon1) in GEO_RECTS
    ]

    def partial_counts(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        aids, ns = [], []
        for aid, lat0, lon0, lat1, lon1 in rects:
            m = (lat >= lat0) & (lat <= lat1) & (lon >= lon0) & (lon <= lon1)
            aids.append(aid)
            ns.append(int(m.sum()))
        return pa.table(
            {"admin_id": pa.array(aids, pa.string()), "n": pa.array(ns, pa.int64())}
        )

    from ray.data.aggregate import Sum

    counts = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(partial_counts, batch_format="pyarrow", batch_size=65536)
        .groupby("admin_id")
        .aggregate(Sum("n", alias_name="n_docs"))
        .take_all()
    )  # 13 rows — the small side table
    n_by_admin = {r["admin_id"]: r["n_docs"] for r in counts}

    # only rects that contain documents (the SQL counts CTE is an inner
    # join, so a zero-doc rect contributes no overlay rows there either)
    occ = [r for r in rects if n_by_admin.get(r[0], 0) > 0]
    side = pa.table(
        {
            "admin_id": pa.array([r[0] for r in occ], pa.string()),
            "lat0": pa.array([r[1] for r in occ], pa.float64()),
            "lon0": pa.array([r[2] for r in occ], pa.float64()),
            "lat1": pa.array([r[3] for r in occ], pa.float64()),
            "lon1": pa.array([r[4] for r in occ], pa.float64()),
            "n_docs": pa.array([int(n_by_admin[r[0]]) for r in occ], pa.int64()),
        }
    )

    def overlay(b: pa.Table) -> pa.Table:
        lat0 = b["lat0"].to_numpy(zero_copy_only=False)
        lon0 = b["lon0"].to_numpy(zero_copy_only=False)
        lat1 = b["lat1"].to_numpy(zero_copy_only=False)
        lon1 = b["lon1"].to_numpy(zero_copy_only=False)
        nd = b["n_docs"].to_numpy(zero_copy_only=False).astype(np.float64)
        gx0 = np.floor(lon0 / g).astype(np.int64)
        gx1 = np.floor(lon1 / g).astype(np.int64)
        gy0 = np.floor(lat0 / g).astype(np.int64)
        gy1 = np.floor(lat1 / g).astype(np.int64)
        nx = gx1 - gx0 + 1
        ny = gy1 - gy0 + 1
        cnt = nx * ny
        total = int(cnt.sum())
        rect = np.repeat(np.arange(b.num_rows), cnt)
        offs = np.arange(total) - np.repeat(np.cumsum(cnt) - cnt, cnt)
        gx = gx0[rect] + offs // ny[rect]
        gy = gy0[rect] + offs % ny[rect]
        ov_lon = np.minimum(lon1[rect], (gx + 1) * g) - np.maximum(lon0[rect], gx * g)
        ov_lat = np.minimum(lat1[rect], (gy + 1) * g) - np.maximum(lat0[rect], gy * g)
        area = (lat1[rect] - lat0[rect]) * (lon1[rect] - lon0[rect])
        contrib = nd[rect] * (ov_lat * ov_lon) / area * 1000000.0
        keep = (ov_lon > 0.0) & (ov_lat > 0.0)
        return pa.table(
            {
                "gx": pa.array(gx[keep], pa.int64()),
                "gy": pa.array(gy[keep], pa.int64()),
                "micro": pa.array(
                    sql_round_np(contrib[keep], 0).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        ray.data.from_arrow(side)
        .map_batches(overlay, batch_format="pyarrow")
        .groupby(["gx", "gy"])
        .aggregate(Sum("micro", alias_name="docs_micro"))
    )


GEO_AREA_INTERP_SQL = f"""
WITH pts AS (
  SELECT {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
counts AS (
  SELECT r.admin_id, r.lat0, r.lon0, r.lat1, r.lon1,
         COUNT(*) AS n_docs
  FROM pts p JOIN {_geo_rects_values_sql()}
    ON p.lat BETWEEN r.lat0 AND r.lat1 AND p.lon BETWEEN r.lon0 AND r.lon1
  GROUP BY 1, 2, 3, 4, 5),
cells AS (
  SELECT CAST(x.range AS BIGINT) AS gx, CAST(y.range AS BIGINT) AS gy
  FROM range(-19, 19) x CROSS JOIN range(-8, 8) y),
overlay AS (
  SELECT c.gx, c.gy,
         CAST(ROUND(CAST(n.n_docs AS DOUBLE)
           * ((LEAST(n.lat1, (c.gy + 1) * {_INTERP_GRID_DEG}) -
               GREATEST(n.lat0, c.gy * {_INTERP_GRID_DEG}))
              * (LEAST(n.lon1, (c.gx + 1) * {_INTERP_GRID_DEG}) -
                 GREATEST(n.lon0, c.gx * {_INTERP_GRID_DEG})))
           / ((n.lat1 - n.lat0) * (n.lon1 - n.lon0)) * 1000000.0, 0)
         AS BIGINT) AS micro
  FROM counts n JOIN cells c
    ON LEAST(n.lon1, (c.gx + 1) * {_INTERP_GRID_DEG})
       - GREATEST(n.lon0, c.gx * {_INTERP_GRID_DEG}) > 0.0
   AND LEAST(n.lat1, (c.gy + 1) * {_INTERP_GRID_DEG})
       - GREATEST(n.lat0, c.gy * {_INTERP_GRID_DEG}) > 0.0)
SELECT gx, gy, CAST(SUM(micro) AS BIGINT) AS docs_micro
FROM overlay GROUP BY 1, 2
"""


def events_geofence(sf_dir: str):
    """GEOFENCE TRANSITIONS: per (user, fence) — how many times the user's
    (ts, event_id)-ordered trajectory ENTERS and EXITS each level-2 admin
    rectangle, and total microseconds DWELLED inside (legs whose both
    endpoints are in). The trajectory x containment combination: one hash
    shuffle by user (fences are a 5-row broadcast constant), per-partition
    everything is BETWEEN comparisons and int64 timestamp sums — exact on
    both sides, no float caveats of any kind."""
    from core_ray.stages.agg import map_groups_partitioned

    fences = [r for r in GEO_RECTS if r[1] == 2]
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_part(g: pa.Table) -> pa.Table:
        cols = {
            "user_id": pa.array([], pa.int64()),
            "fence_id": pa.array([], pa.string()),
            "n_entries": pa.array([], pa.int64()),
            "n_exits": pa.array([], pa.int64()),
            "dwell_us": pa.array([], pa.int64()),
        }
        if g.num_rows == 0:
            return pa.table(cols)
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, us, eid = uid[order], us[order], eid[order]
        lat, lon = _derive_coords(eid)
        leg = np.zeros(len(uid), dtype=bool)
        leg[1:] = uid[1:] == uid[:-1]
        i = np.nonzero(leg)[0]
        if len(i) == 0:
            return pa.table(cols)
        lu = uid[i]
        starts = np.nonzero(np.r_[True, lu[1:] != lu[:-1]])[0]
        users, fids = [], []
        ent, ext, dwl = [], [], []
        for aid, _lvl, lat0, lon0, lat1, lon1 in fences:
            inside = (lat >= lat0) & (lat <= lat1) & (lon >= lon0) & (lon <= lon1)
            pin, cin = inside[i - 1], inside[i]
            e_in = (~pin & cin).astype(np.int64)
            e_out = (pin & ~cin).astype(np.int64)
            dt = np.where(pin & cin, us[i] - us[i - 1], 0)
            users.append(lu[starts])
            fids.extend([aid] * len(starts))
            ent.append(np.add.reduceat(e_in, starts))
            ext.append(np.add.reduceat(e_out, starts))
            dwl.append(np.add.reduceat(dt, starts))
        user_id = np.concatenate(users)
        n_ent = np.concatenate(ent)
        n_ext = np.concatenate(ext)
        dwell = np.concatenate(dwl)
        keep = (n_ent > 0) | (n_ext > 0) | (dwell > 0)
        return pa.table(
            {
                "user_id": pa.array(user_id[keep], pa.int64()),
                "fence_id": pa.array(np.array(fids)[keep].tolist(), pa.string()),
                "n_entries": pa.array(n_ent[keep], pa.int64()),
                "n_exits": pa.array(n_ext[keep], pa.int64()),
                "dwell_us": pa.array(dwell[keep], pa.int64()),
            }
        )

    return map_groups_partitioned(ds, "user_id", per_part)


def _geo_fences_values_sql() -> str:
    rows = ",\n    ".join(
        f"('{aid}', {lat0}, {lon0}, {lat1}, {lon1})"
        for aid, lvl, lat0, lon0, lat1, lon1 in GEO_RECTS
        if lvl == 2
    )
    return f"(VALUES\n    {rows}) AS f(fence_id, lat0, lon0, lat1, lon1)"


EVENTS_GEOFENCE_SQL = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         {GEO_LAT_SQL.replace('doc_id', 'event_id')} AS lat,
         {GEO_LON_SQL.replace('doc_id', 'event_id')} AS lon FROM events),
flags AS (
  SELECT p.user_id, p.ts, p.event_id, f.fence_id,
         (p.lat BETWEEN f.lat0 AND f.lat1 AND p.lon BETWEEN f.lon0 AND f.lon1)
           AS inside
  FROM pts p CROSS JOIN {_geo_fences_values_sql()}),
legs AS (
  SELECT user_id, fence_id, inside,
         LAG(inside) OVER w AS pin,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS dt
  FROM flags
  WINDOW w AS (PARTITION BY user_id, fence_id ORDER BY epoch_us(ts), event_id)),
agg AS (
  SELECT user_id, fence_id,
         CAST(SUM(CASE WHEN NOT pin AND inside THEN 1 ELSE 0 END) AS BIGINT)
           AS n_entries,
         CAST(SUM(CASE WHEN pin AND NOT inside THEN 1 ELSE 0 END) AS BIGINT)
           AS n_exits,
         CAST(SUM(CASE WHEN pin AND inside THEN dt ELSE 0 END) AS BIGINT)
           AS dwell_us
  FROM legs WHERE pin IS NOT NULL GROUP BY 1, 2)
SELECT * FROM agg
WHERE n_entries > 0 OR n_exits > 0 OR dwell_us > 0
"""


def geo_kde_tiles(sf_dir: str):
    """KERNEL DENSITY ESTIMATE onto a 1-degree raster: every document point
    spreads a truncated Gaussian (sigma = 1 deg, cutoff d <= 2 deg) over
    nearby cell CENTERS; per-cell densities sum. The raster-analysis
    sibling of geo_focal_mean — here the kernel is distance-weighted and
    applied scatter-side: one map_batches explodes each point to its 7x7
    stencil (vectorized, ~12.6 cells survive the circular cutoff), one
    groupby sums. Grid is clamped to lon [-180,180) x lat [-70,70) cells
    (edge kernels truncate identically on both sides).

    Float parity: the cutoff d^2 <= 4 uses exact IEEE products; the
    Gaussian uses EXP (ULP-divergent between numpy and DuckDB), so each
    contribution rounds to INTEGER micro-density before the order-
    independent BIGINT sum — a flip needs exp() within ~1e-16 of a
    rounding boundary (p ~ 1e-10 per contribution)."""
    import ray
    from ray.data.aggregate import Sum

    def scatter(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        n = len(lat)
        off = np.arange(-3, 4, dtype=np.int64)
        dxg, dyg = np.meshgrid(off, off, indexing="ij")
        dxg, dyg = dxg.ravel(), dyg.ravel()  # 49 offsets
        gx = np.floor(lon).astype(np.int64)[:, None] + dxg[None, :]
        gy = np.floor(lat).astype(np.int64)[:, None] + dyg[None, :]
        dx = lon[:, None] - (gx + 0.5)
        dy = lat[:, None] - (gy + 0.5)
        d2 = dx * dx + dy * dy
        keep = (
            (d2 <= 4.0)
            & (gx >= -180) & (gx <= 179)
            & (gy >= -70) & (gy <= 69)
        )
        micro = sql_round_np(np.exp(-d2[keep] / 2.0) * 1000000.0, 0)
        return pa.table(
            {
                "gx": pa.array(gx[keep], pa.int64()),
                "gy": pa.array(gy[keep], pa.int64()),
                "micro": pa.array(micro.astype(np.int64), pa.int64()),
            }
        )

    return (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(scatter, batch_format="pyarrow", batch_size=65536)
        .groupby(["gx", "gy"])
        .aggregate(Sum("micro", alias_name="kde_micro"))
    )


GEO_KDE_TILES_SQL = f"""
WITH pts AS (
  SELECT {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
cells AS (
  SELECT CAST(x.range AS BIGINT) AS gx, CAST(y.range AS BIGINT) AS gy
  FROM range(-180, 180) x CROSS JOIN range(-70, 70) y),
contrib AS (
  SELECT c.gx, c.gy,
         CAST(ROUND(EXP(-(
             (p.lon - (c.gx + 0.5)) * (p.lon - (c.gx + 0.5))
             + (p.lat - (c.gy + 0.5)) * (p.lat - (c.gy + 0.5))
           ) / 2.0) * 1000000.0, 0) AS BIGINT) AS micro
  FROM pts p JOIN cells c
    ON (p.lon - (c.gx + 0.5)) * (p.lon - (c.gx + 0.5))
       + (p.lat - (c.gy + 0.5)) * (p.lat - (c.gy + 0.5)) <= 4.0)
SELECT gx, gy, CAST(SUM(micro) AS BIGINT) AS kde_micro
FROM contrib GROUP BY 1, 2
"""


# Contact-model coordinates: users cluster in 12 "cities" (the pure
# multiplicative lattice anti-clusters consecutive ids — measured min
# home-pair distance 7.6 deg — so a co-location join over it is empty by
# construction). city center + per-user offset (+-1 deg) + per-event
# jitter (+-0.5 deg), every term a deterministic integer expression.
CONTACT_LAT_SQL = (
    "(((user_id % 12) * 11003) % 120000) / 1000.0 - 60.0"
    " + ((user_id * 7919) % 2001) / 1000.0 - 1.0"
    " + ((event_id * 13) % 1001) / 1000.0 - 0.5"
)
CONTACT_LON_SQL = (
    "(((user_id % 12) * 104729) % 340000) / 1000.0 - 170.0"
    " + ((user_id * 104729) % 2001) / 1000.0 - 1.0"
    " + ((event_id * 29) % 1001) / 1000.0 - 0.5"
)

_CONTACT_RADIUS_DEG = 1.0
_CONTACT_WINDOW_US = 6 * 3600 * 1000000  # 6 hours


def _contact_coords(event_id: np.ndarray, user_id: np.ndarray):
    """numpy mirror of CONTACT_LAT/LON_SQL — identical left-associative
    chain of exact integer derivations and correctly-rounded additions."""
    lat = (
        (((user_id % 12) * 11003) % 120000) / 1000.0 - 60.0
        + ((user_id * 7919) % 2001) / 1000.0 - 1.0
        + ((event_id * 13) % 1001) / 1000.0 - 0.5
    )
    lon = (
        (((user_id % 12) * 104729) % 340000) / 1000.0 - 170.0
        + ((user_id * 104729) % 2001) / 1000.0 - 1.0
        + ((event_id * 29) % 1001) / 1000.0 - 0.5
    )
    return lat, lon


_CONTACT_PAIRS_CACHE: dict = {}


def _ray_session_key():
    """Cache key component tied to the live Ray session: a materialized
    Dataset's object refs die with the session, so a cache entry from a
    previous ray.init must never be served. Returns None (cache disabled)
    when Ray is not yet initialized — this module never calls ray.init."""
    try:
        import ray

        if ray.is_initialized():
            return ray.get_runtime_context().get_job_id()
    except Exception:
        pass
    return None


def _contact_pairs_ds(sf_dir: str):
    """Shared sf-keyed materialization of the CONTACT PAIR table — the
    (uid_a, uid_b) rows of the 3D home+ghost space-time join that
    events_contacts, events_contact_degrees and events_contact_assortativity
    all consume. The join is the expensive step of the family (27x
    replication + one hash shuffle + in-cell pair enumeration); one
    materialize per (session, sf_dir) serves every consumer. The cached
    table is bounded by actual co-locations (the contact contract) and
    holds two int64 columns only — at 100 TB the pair table is the
    operator's OUTPUT scale, so pinning it in the object store costs no
    more than any consumer's own shuffle would."""
    from core_ray.stages.stjoin import spacetime_pairs

    key = (_ray_session_key(), sf_dir)
    if key[0] is not None and key in _CONTACT_PAIRS_CACHE:
        return _CONTACT_PAIRS_CACHE[key]

    def coords(b: pa.Table) -> pa.Table:
        ev = b["event_id"].to_numpy(zero_copy_only=False)
        uid = b["user_id"].to_numpy(zero_copy_only=False)
        us = pc.cast(b["ts"], pa.int64())
        lat, lon = _contact_coords(ev, uid)
        return pa.table(
            {
                "pid": b["event_id"],
                "uid": b["user_id"],
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
                "us": us,
            }
        )

    pts = _read(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        coords, batch_format="pyarrow", batch_size=65536
    )
    pairs = (
        spacetime_pairs(pts, _CONTACT_RADIUS_DEG, _CONTACT_WINDOW_US)
        .select_columns(["uid_a", "uid_b"])
        .materialize()
    )
    key = (_ray_session_key(), sf_dir)  # session now definitely live
    if key[0] is not None:
        _CONTACT_PAIRS_CACHE[key] = pairs
    return pairs


def _pack_user_pairs(b: pa.Table) -> pa.Table:
    """(uid_a, uid_b) batch -> per-batch-DISTINCT packed unordered user
    pair keys (u1 << 32 | u2, u1 < u2). Fail-loud on user_id >= 2^32 —
    the packing would silently collide above that (ADVICE r4)."""
    ua = b["uid_a"].to_numpy(zero_copy_only=False)
    ub = b["uid_b"].to_numpy(zero_copy_only=False)
    u1 = np.minimum(ua, ub).astype(np.uint64)
    u2 = np.maximum(ua, ub).astype(np.uint64)
    if len(u2) and int(u2.max()) >= 1 << 32:
        raise ValueError("user_id >= 2^32: widen the pair packing")
    return pa.table(
        {"key": pa.array(np.unique((u1 << np.uint64(32)) | u2), pa.uint64())}
    )


def events_contacts(sf_dir: str):
    """SPACE-TIME CONTACT JOIN (the epidemiology / co-location primitive):
    pairs of DIFFERENT users with events within 1 degree AND 6 hours of
    each other, aggregated to per-user-pair contact counts. The operator
    is a 3D home+ghost band join — (lat, lon, time-bucket) cells, 27x
    replication, ONE hash shuffle, single-emission home rule — in
    stages/stjoin.py, brute-force-tested in tests/test_stjoin.py. Exact
    parity throughout: squared-degree spatial threshold (multiply/subtract
    only) and int64 microsecond window; no transcendental in sight. The
    pair table itself comes from the contact-family shared materialization
    (_contact_pairs_ds) reused by the degree/assortativity siblings."""
    from core_ray.stages.agg import count_by_u64

    pairs = _contact_pairs_ds(sf_dir)

    def to_users(b: pa.Table) -> pa.Table:
        # Pack the unordered user pair into ONE uint64 key (u1<<32 | u2) so
        # the count goes through the combiner-first count_by_u64 path: Ray's
        # native two-column groupby().aggregate(Sum) measured 96 s of
        # AggregateMap remote time on the same 2.9 M pair rows — the packed
        # single-key reduceat pipeline does the identical count in <1 s.
        ua = b["uid_a"].to_numpy(zero_copy_only=False)
        ub = b["uid_b"].to_numpy(zero_copy_only=False)
        u1 = np.minimum(ua, ub).astype(np.uint64)
        u2 = np.maximum(ua, ub).astype(np.uint64)
        if len(u2) and int(u2.max()) >= 1 << 32:
            raise ValueError("user_id >= 2^32: widen the pair packing")
        return pa.table({"key": pa.array((u1 << np.uint64(32)) | u2, pa.uint64())})

    def unpack(b: pa.Table) -> pa.Table:
        k = b["key"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u1": pa.array((k >> np.uint64(32)).astype(np.int64), pa.int64()),
                "u2": pa.array((k & np.uint64(0xFFFFFFFF)).astype(np.int64), pa.int64()),
                "n_contacts": b["cnt"],
            }
        )

    counted = count_by_u64(pairs.map_batches(to_users, batch_format="pyarrow"), "key")
    return counted.map_batches(unpack, batch_format="pyarrow")


EVENTS_CONTACTS_SQL = f"""
WITH pts AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         {CONTACT_LAT_SQL} AS lat, {CONTACT_LON_SQL} AS lon
  FROM events),
hits AS (
  SELECT LEAST(a.user_id, b.user_id) AS u1,
         GREATEST(a.user_id, b.user_id) AS u2
  FROM pts a JOIN pts b
    ON a.event_id < b.event_id AND a.user_id != b.user_id
 WHERE (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon)
       <= {_CONTACT_RADIUS_DEG * _CONTACT_RADIUS_DEG}
   AND ABS(a.us - b.us) <= {_CONTACT_WINDOW_US})
SELECT u1, u2, CAST(COUNT(*) AS BIGINT) AS n_contacts
FROM hits GROUP BY 1, 2
"""


_STAY_STEP_SQ = 1.0  # a step longer than 1 deg breaks the stay
_STAY_MIN_PTS = 5


def events_stay_points(sf_dir: str):
    """STAY-POINT DETECTION (trajectory mining's gaps-and-islands): split
    each user's (ts, event_id)-ordered track into maximal runs whose every
    step is <= 1 degree, keep runs of >= 5 points, report points and
    dwell duration. The travel model varies the contact-coordinate city
    with the user's own sequence number (a new city every 20 of the user's
    events), so stays and travel legs both occur by construction.

    One hash shuffle by user; islands come from a vectorized flag+cumsum
    inside the partition (the same segmentation kernel sessionize uses,
    keyed by distance instead of time gap). Exact parity: step lengths are
    squared products of 0.0005-granule values compared strictly, and all
    outputs are int64."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_part(g: pa.Table) -> pa.Table:
        cols = {
            "user_id": pa.array([], pa.int64()),
            "island_ord": pa.array([], pa.int64()),
            "n_points": pa.array([], pa.int64()),
            "duration_us": pa.array([], pa.int64()),
        }
        if g.num_rows == 0:
            return pa.table(cols)
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, us, eid = uid[order], us[order], eid[order]
        n = len(uid)
        first = np.r_[True, uid[1:] != uid[:-1]]
        ustart = np.nonzero(first)[0]
        seq = np.arange(n) - np.repeat(ustart, np.diff(np.append(ustart, n)))
        city = (uid * 7 + seq // 20) % 12
        lat = (
            ((city * 11003) % 120000) / 1000.0 - 60.0
            + ((uid * 7919) % 2001) / 1000.0 - 1.0
            + ((eid * 13) % 1001) / 1000.0 - 0.5
        )
        lon = (
            ((city * 104729) % 340000) / 1000.0 - 170.0
            + ((uid * 104729) % 2001) / 1000.0 - 1.0
            + ((eid * 29) % 1001) / 1000.0 - 0.5
        )
        dla = np.zeros(n)
        dlo = np.zeros(n)
        dla[1:] = lat[1:] - lat[:-1]
        dlo[1:] = lon[1:] - lon[:-1]
        new = first | (dla * dla + dlo * dlo > _STAY_STEP_SQ)
        isl = np.nonzero(new)[0]
        counts = np.diff(np.append(isl, n))
        # island ordinal within each user (SQL: cumulative SUM of the flag)
        isl_user = uid[isl]
        iustart = np.nonzero(np.r_[True, isl_user[1:] != isl_user[:-1]])[0]
        ord_in_user = (
            np.arange(len(isl))
            - np.repeat(iustart, np.diff(np.append(iustart, len(isl))))
            + 1
        )
        dur = us[isl + counts - 1] - us[isl]
        keep = counts >= _STAY_MIN_PTS
        return pa.table(
            {
                "user_id": pa.array(isl_user[keep], pa.int64()),
                "island_ord": pa.array(ord_in_user[keep].astype(np.int64), pa.int64()),
                "n_points": pa.array(counts[keep].astype(np.int64), pa.int64()),
                "duration_us": pa.array(dur[keep], pa.int64()),
            }
        )

    return map_groups_partitioned(ds, "user_id", per_part)


EVENTS_STAY_POINTS_SQL = f"""
WITH seqd AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) - 1 AS seq
  FROM events),
pts AS (
  SELECT user_id, event_id, us,
         (((user_id * 7 + seq // 20) % 12) * 11003) % 120000 / 1000.0 - 60.0
           + ((user_id * 7919) % 2001) / 1000.0 - 1.0
           + ((event_id * 13) % 1001) / 1000.0 - 0.5 AS lat,
         (((user_id * 7 + seq // 20) % 12) * 104729) % 340000 / 1000.0 - 170.0
           + ((user_id * 104729) % 2001) / 1000.0 - 1.0
           + ((event_id * 29) % 1001) / 1000.0 - 0.5 AS lon
  FROM seqd),
steps AS (
  SELECT user_id, event_id, us, lat, lon,
         lat - LAG(lat) OVER w AS dla, lon - LAG(lon) OVER w AS dlo
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN dla IS NULL OR dla * dla + dlo * dlo > {_STAY_STEP_SQ}
              THEN 1 ELSE 0 END AS new_island
  FROM steps),
islands AS (
  SELECT user_id, us,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY us, event_id
                               ROWS UNBOUNDED PRECEDING) AS island_ord
  FROM flagged)
SELECT user_id, CAST(island_ord AS BIGINT) AS island_ord,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
FROM islands GROUP BY 1, 2
HAVING COUNT(*) >= {_STAY_MIN_PTS}
"""


_SHINGLE_N = 8
_SHINGLE_MAXDF = 50  # stop-shingle cutoff: ignore grams in > 50 docs
_CONT_MIN = 0.5


def _sum_by_key(keys: np.ndarray, vals: np.ndarray):
    """(sorted unique keys, per-key int64 sums) — the local reduceat kernel
    the partition-level aggregations below share."""
    if len(keys) == 0:
        return keys[:0], np.empty(0, np.int64)
    order = np.argsort(keys, kind="stable")
    ks, vs = keys[order], vals[order]
    new = np.r_[True, ks[1:] != ks[:-1]]
    starts = np.nonzero(new)[0]
    return ks[starts], np.add.reduceat(vs.astype(np.int64), starts)


def doc_shingle_containment(sf_dir: str):
    """ASYMMETRIC shingle containment (quote / subset detection — what
    Jaccard-symmetric near-dup misses when a short doc is wholly quoted
    inside a long one): for doc pairs sharing word-8-gram shingles,
    containment(A->B) = |S(A) n S(B)| / |S(A)|; emit pairs where either
    direction >= 0.5. Shingles in > {maxdf} docs are dropped first (the
    standard stop-shingle filter — it also BOUNDS the per-gram pair fanout,
    the operator's skew guard).

    Shape: one pass builds per-doc DISTINCT shingles (docs are row-local,
    so batch-local dedup is global); rows hash-partition BY GRAM once;
    each partition emits pre-aggregated pair partials AND per-doc size
    partials (sentinel doc_b = -1) from the same pass; then TWO chained
    doc-keyed shuffles finish — shuffle 1 co-locates everything by doc_a
    (sums sizes + pair partials, attaches sz_a), shuffle 2 re-keys by
    doc_b (attaches sz_b, filters) — the sizes side is corpus-sized at
    scale, so it rides the same shuffles, never a broadcast. (This tail
    replaced two Ray two-column aggregates + two hash joins: same rows,
    22 s -> ~7 s at sf0.1 — Ray's multi-column groupby aggregate costs
    ~30 us/row of AggregateMap alone.) Containment divisions are
    exact-int ratios — correctly-rounded IEEE identical to the SQL, no
    rounding needed."""
    from core_ray.stages.agg import hash_strings, map_groups_partitioned

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def doc_grams(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        ridx, grams = _word_ngrams(b["text"].to_pylist(), _SHINGLE_N)
        if len(grams) == 0:
            return pa.table(
                {
                    "gram": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "gh": pa.array([], pa.uint64()),
                }
            )
        order = np.lexsort((ridx, grams))
        g2, r2 = grams[order], ridx[order]
        keep = np.r_[True, (g2[1:] != g2[:-1]) | (r2[1:] != r2[:-1])]
        g2 = g2[keep]
        gram_col = pa.array(g2, pa.string())
        return pa.table(
            {
                "gram": gram_col,
                "doc_id": pa.array(ids[r2[keep]], pa.int64()),
                "gh": pa.array(hash_strings(gram_col), pa.uint64()),
            }
        )

    # batch_size 512 (not 2048): the gram build is the one Python-split
    # step; smaller bundles let ~10 tasks share it instead of 1-3.
    gram_ds = ds.map_batches(doc_grams, batch_format="pyarrow", batch_size=512)

    def per_part(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        grams = np.asarray(g["gram"].to_pylist())
        docs = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((docs, grams))
        gs, dc = grams[order], docs[order]
        n = len(gs)
        new = np.r_[True, gs[1:] != gs[:-1]]
        seg = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        lens = np.diff(np.append(starts, n)).astype(np.int64)
        ok = lens <= _SHINGLE_MAXDF
        row_ok = ok[seg]
        # per-doc size partials over surviving rows (sentinel doc_b = -1)
        du, dn = np.unique(dc[row_ok], return_counts=True)
        out_a = [du]
        out_b = [np.full(len(du), -1, np.int64)]
        out_n = [dn.astype(np.int64)]
        # pair partials from segments with 2..maxdf docs (docs sorted
        # within each gram, so position order IS doc_a < doc_b)
        psegs = np.nonzero(ok & (lens >= 2))[0]
        if len(psegs):
            # group segments BY LENGTH: one vectorized triangle expansion
            # per distinct length (<= maxdf-1 iterations, each all-numpy)
            ai, bi = [], []
            for length in np.unique(lens[psegs]):
                bases = starts[psegs[lens[psegs] == length]]
                iu, ju = np.triu_indices(int(length), k=1)
                ai.append((bases[:, None] + iu[None, :]).ravel())
                bi.append((bases[:, None] + ju[None, :]).ravel())
            a_idx = np.concatenate(ai)
            b_idx = np.concatenate(bi)
            pu, pn = np.unique(
                np.stack([dc[a_idx], dc[b_idx]], 1), axis=0, return_counts=True
            )
            out_a.append(pu[:, 0])
            out_b.append(pu[:, 1])
            out_n.append(pn.astype(np.int64))
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
                "n": pa.array(np.concatenate(out_n), pa.int64()),
            }
        )

    def key_a(b: pa.Table) -> pa.Table:
        k = b["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.append_column("k", pa.array(k, pa.uint64()))

    def stage_a(g: pa.Table) -> pa.Table:
        """All of a doc's size partials AND its doc_a-side pair partials
        are co-located here: sum both, attach sz_a, and re-emit the size
        totals (doc_b = -1 sentinel) for the doc_b-keyed shuffle."""
        da = g["doc_a"].to_numpy(zero_copy_only=False)
        db = g["doc_b"].to_numpy(zero_copy_only=False)
        nn = g["n"].to_numpy(zero_copy_only=False)
        s = db < 0
        su, ssum = _sum_by_key(da[s], nn[s])
        pk = (da[~s].astype(np.uint64) << np.uint64(32)) | db[~s].astype(np.uint64)
        pu, psum = _sum_by_key(pk, nn[~s])
        pa_ = (pu >> np.uint64(32)).astype(np.int64)
        pb_ = (pu & np.uint64(0xFFFFFFFF)).astype(np.int64)
        sz_a = ssum[np.searchsorted(su, pa_)]
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate([su.astype(np.int64), pa_]), pa.int64()),
                "doc_b": pa.array(
                    np.concatenate([np.full(len(su), -1, np.int64), pb_]), pa.int64()
                ),
                "n_shared": pa.array(np.concatenate([ssum, psum]), pa.int64()),
                "sz_a": pa.array(
                    np.concatenate([np.zeros(len(su), np.int64), sz_a]), pa.int64()
                ),
            }
        )

    def key_b(b: pa.Table) -> pa.Table:
        da = b["doc_a"].to_numpy(zero_copy_only=False)
        db = b["doc_b"].to_numpy(zero_copy_only=False)
        k = np.where(db < 0, da, db).astype(np.uint64)
        return b.append_column("k", pa.array(k, pa.uint64()))

    def stage_b(g: pa.Table) -> pa.Table:
        da = g["doc_a"].to_numpy(zero_copy_only=False)
        db = g["doc_b"].to_numpy(zero_copy_only=False)
        ns = g["n_shared"].to_numpy(zero_copy_only=False)
        sza = g["sz_a"].to_numpy(zero_copy_only=False)
        s = db < 0
        su, ssum = da[s], ns[s]  # already per-doc totals (one row per doc)
        order = np.argsort(su, kind="stable")
        su, ssum = su[order], ssum[order]
        pa_, pb_, pn, psz = da[~s], db[~s], ns[~s], sza[~s]
        sz_b = ssum[np.searchsorted(su, pb_)]
        nsf = pn.astype(np.float64)
        ca = nsf / psz.astype(np.float64)
        cb = nsf / sz_b.astype(np.float64)
        keep = np.maximum(ca, cb) >= _CONT_MIN
        return pa.table(
            {
                "doc_a": pa.array(pa_[keep], pa.int64()),
                "doc_b": pa.array(pb_[keep], pa.int64()),
                "n_shared": pa.array(pn[keep], pa.int64()),
                "cont_a": pa.array(ca[keep], pa.float64()),
                "cont_b": pa.array(cb[keep], pa.float64()),
            }
        )

    mixed = map_groups_partitioned(gram_ds, "gh", per_part)
    byl = map_groups_partitioned(
        mixed.map_batches(key_a, batch_format="pyarrow"), "k", stage_a
    )
    return map_groups_partitioned(
        byl.map_batches(key_b, batch_format="pyarrow"), "k", stage_b
    )


_G8 = (
    "l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3] || ' ' || "
    "l[i+4] || ' ' || l[i+5] || ' ' || l[i+6] || ' ' || l[i+7]"
)

DOC_SHINGLE_CONTAINMENT_SQL = f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
raw AS (
  SELECT doc_id,
         UNNEST(list_transform(generate_series(1, len(l) - {_SHINGLE_N - 1}),
                i -> {_G8})) AS gram
  FROM ws),
grams AS (SELECT DISTINCT doc_id, gram FROM raw),
df AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) <= {_SHINGLE_MAXDF}),
kept AS (SELECT g.doc_id, g.gram FROM grams g JOIN df USING (gram)),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM kept GROUP BY 1),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n
  FROM kept a JOIN kept b USING (gram)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT s.doc_a, s.doc_b, CAST(s.n AS BIGINT) AS n_shared,
       CAST(s.n AS DOUBLE) / CAST(sa.sz AS DOUBLE) AS cont_a,
       CAST(s.n AS DOUBLE) / CAST(sb.sz AS DOUBLE) AS cont_b
FROM shared s
JOIN sizes sa ON s.doc_a = sa.doc_id
JOIN sizes sb ON s.doc_b = sb.doc_id
WHERE GREATEST(CAST(s.n AS DOUBLE) / CAST(sa.sz AS DOUBLE),
               CAST(s.n AS DOUBLE) / CAST(sb.sz AS DOUBLE)) >= {_CONT_MIN}
"""


def geo_colocation(sf_dir: str, radius: float = _GEO_PAIR_RADIUS_DEG):
    """CO-LOCATION PATTERN MINING: which language pairs cluster together in
    space? Counts distance-band document pairs per unordered (lang, lang)
    combination and normalizes by the category-size product — the
    participation-style signal spatial-association mining uses. Shape:
    ``lang`` rides the 9x home+ghost replication (one short string column —
    far cheaper than the two corpus-sized lang-attach shuffles the hash-join
    formulation costs), and the partition kernel reduces straight to
    (l1, l2, n) partials, so PAIRS NEVER MATERIALIZE outside a task; the
    final groupby runs over <= lang^2 x n_parts partial rows. Per-lang
    totals are bounded by language cardinality, so that side is a driver
    lookup. ratio = n_pairs / (n1 * n2) is a fixed chain of exact
    int->double casts, one multiply, one divide — mirrored bit-exactly in
    SQL (int64 counts stay below 2^53 here; beyond that the documented
    form is log-space)."""
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import map_groups_partitioned
    from core_ray.stages.distband import replicate_to_cells

    r2 = radius * radius
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def rep(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        t = replicate_to_cells(doc_id.astype(np.int64), lat, lon, radius)
        idx = np.repeat(np.arange(len(doc_id), dtype=np.int64), 9)
        return t.append_column("lang", pc.take(b["lang"], pa.array(idx)))

    _empty = pa.table(
        {
            "l1": pa.array([], pa.string()),
            "l2": pa.array([], pa.string()),
            "n": pa.array([], pa.int64()),
        }
    )

    def part(g: pa.Table) -> pa.Table:
        key = g["ck"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(key)
        if n == 0:
            return _empty
        order = np.argsort(key, kind="stable")
        key = key[order]
        ids = g["doc_id"].to_numpy(zero_copy_only=False)[order]
        lat = g["lat"].to_numpy(zero_copy_only=False)[order]
        lon = g["lon"].to_numpy(zero_copy_only=False)[order]
        home = g["home"].to_numpy(zero_copy_only=False)[order]
        lang = np.asarray(g["lang"].to_pylist())[order]
        new = np.ones(n, dtype=bool)
        new[1:] = key[1:] != key[:-1]
        seg_id = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        seg_len = np.diff(np.append(starts, n)).astype(np.int64)
        hidx = np.nonzero(home)[0]
        if len(hidx) == 0:
            return _empty
        Lh = seg_len[seg_id[hidx]]
        chunk_of_home = np.cumsum(Lh) // (8 << 20)
        l1s, l2s, cnts = [], [], []
        for c in np.unique(chunk_of_home):
            sel = chunk_of_home == c
            h = hidx[sel]
            L = Lh[sel]
            left = np.repeat(h, L)
            rps = np.cumsum(L) - L
            offs = np.arange(int(L.sum())) - np.repeat(rps, L)
            right = np.repeat(starts[seg_id[h]], L) + offs
            m = ids[right] > ids[left]
            i, j = left[m], right[m]
            dla = lat[i] - lat[j]
            dlo = lon[i] - lon[j]
            keep = dla * dla + dlo * dlo <= r2
            a, bl = lang[i][keep], lang[j][keep]
            lo = np.where(a <= bl, a, bl)
            hi2 = np.where(a <= bl, bl, a)
            u, cnt = np.unique(np.char.add(np.char.add(lo, "|"), hi2),
                               return_counts=True)
            if len(u) == 0:
                continue
            parts = np.char.partition(u, "|")
            l1s.append(parts[:, 0])
            l2s.append(parts[:, 2])
            cnts.append(cnt.astype(np.int64))
        if not l1s:
            return _empty
        return pa.table(
            {
                "l1": pa.array(np.concatenate(l1s), pa.string()),
                "l2": pa.array(np.concatenate(l2s), pa.string()),
                "n": pa.array(np.concatenate(cnts), pa.int64()),
            }
        )

    rep_ds = docs.map_batches(rep, batch_format="pyarrow", batch_size=65536)
    counted = (
        map_groups_partitioned(rep_ds, "ck", part)
        .groupby(["l1", "l2"])
        .aggregate(Sum("n", alias_name="n_pairs"))
    )

    def lang_partial(b: pa.Table) -> pa.Table:
        u, n = np.unique(np.asarray(b["lang"].to_pylist()), return_counts=True)
        return pa.table(
            {"lang": pa.array(u.tolist(), pa.string()),
             "n": pa.array(n.astype(np.int64), pa.int64())}
        )

    totals = {
        r["lang"]: r["n"]
        for r in docs.map_batches(lang_partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"))
        .take_all()
    }  # bounded by language cardinality — genuinely small at any scale

    def finish(b: pa.Table) -> pa.Table:
        l1 = b["l1"].to_pylist()
        l2 = b["l2"].to_pylist()
        n1 = np.array([totals[x] for x in l1], np.int64)
        n2 = np.array([totals[x] for x in l2], np.int64)
        npair = b["n_pairs"].to_numpy(zero_copy_only=False)
        ratio = npair.astype(np.float64) / (
            n1.astype(np.float64) * n2.astype(np.float64)
        )
        return pa.table(
            {
                "l1": b["l1"],
                "l2": b["l2"],
                "n_pairs": pa.array(npair, pa.int64()),
                "n1": pa.array(n1, pa.int64()),
                "n2": pa.array(n2, pa.int64()),
                "ratio": pa.array(ratio, pa.float64()),
            }
        )

    return counted.map_batches(finish, batch_format="pyarrow")


GEO_COLOCATION_SQL = f"""
WITH pts AS (
  SELECT doc_id, lang, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon
  FROM documents),
hits AS (
  SELECT LEAST(a.lang, b.lang) AS l1, GREATEST(a.lang, b.lang) AS l2
  FROM pts a JOIN pts b ON a.doc_id < b.doc_id
  WHERE (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon)
        <= {_GEO_PAIR_RADIUS_DEG * _GEO_PAIR_RADIUS_DEG}),
totals AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
agg AS (SELECT l1, l2, COUNT(*) AS n_pairs FROM hits GROUP BY 1, 2)
SELECT a.l1, a.l2, CAST(a.n_pairs AS BIGINT) AS n_pairs,
       CAST(t1.n AS BIGINT) AS n1, CAST(t2.n AS BIGINT) AS n2,
       CAST(a.n_pairs AS DOUBLE) / (CAST(t1.n AS DOUBLE) * CAST(t2.n AS DOUBLE))
         AS ratio
FROM agg a JOIN totals t1 ON a.l1 = t1.lang JOIN totals t2 ON a.l2 = t2.lang
"""


def geo_bearing_rose(sf_dir: str):
    """COMPASS ROSE of movement: per user, how many trajectory legs head
    into each of the 8 45-degree bearing sectors (N, NE, ..., NW) — the
    directional-distribution view of the event stream. One user-partition
    pass (same plan as geo_traj_stats); the initial great-circle bearing is
    the standard atan2 formula, mirrored term-for-term by the SQL.

    Float caveat: atan2/sin/cos differ by ULPs across libms, but a flip
    needs a bearing within ~1e-13 deg of a 45-degree sector edge; exact
    edge cases (due-N/E/S/W legs from axis-aligned lattice moves) hit
    atan2's EXACT special values (atan2(+-0, x), atan2(y, +-0)) which both
    libms return bit-identically, so they bin identically too."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_part(g: pa.Table) -> pa.Table:
        cols = {
            "user_id": pa.array([], pa.int64()),
            "sector": pa.array([], pa.int64()),
            "n_legs": pa.array([], pa.int64()),
        }
        if g.num_rows == 0:
            return pa.table(cols)
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, eid = uid[order], eid[order]
        lat, lon = _derive_coords(eid)
        leg = np.zeros(len(uid), dtype=bool)
        leg[1:] = uid[1:] == uid[:-1]
        i = np.nonzero(leg)[0]
        if len(i) == 0:
            return pa.table(cols)
        la1, lo1 = np.radians(lat[i - 1]), np.radians(lon[i - 1])
        la2, lo2 = np.radians(lat[i]), np.radians(lon[i])
        y = np.sin(lo2 - lo1) * np.cos(la2)
        x = np.cos(la1) * np.sin(la2) - np.sin(la1) * np.cos(la2) * np.cos(lo2 - lo1)
        deg = np.degrees(np.arctan2(y, x))
        sector = np.floor(np.mod(deg + 360.0, 360.0) / 45.0).astype(np.int64)
        key = uid[i] * 8 + sector
        u, n = np.unique(key, return_counts=True)
        return pa.table(
            {
                "user_id": pa.array(u // 8, pa.int64()),
                "sector": pa.array(u % 8, pa.int64()),
                "n_legs": pa.array(n.astype(np.int64), pa.int64()),
            }
        )

    return map_groups_partitioned(ds, "user_id", per_part)


GEO_BEARING_ROSE_SQL = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         RADIANS({GEO_LAT_SQL.replace('doc_id', 'event_id')}) AS la,
         RADIANS({GEO_LON_SQL.replace('doc_id', 'event_id')}) AS lo
  FROM events),
legs AS (
  SELECT user_id, LAG(la) OVER w AS la1, LAG(lo) OVER w AS lo1, la, lo
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
bearing AS (
  SELECT user_id,
         DEGREES(ATAN2(
           SIN(lo - lo1) * COS(la),
           COS(la1) * SIN(la) - SIN(la1) * COS(la) * COS(lo - lo1))) AS deg
  FROM legs WHERE la1 IS NOT NULL)
SELECT user_id,
       CAST(FLOOR(((deg + 360.0) % 360.0) / 45.0) AS BIGINT) AS sector,
       CAST(COUNT(*) AS BIGINT) AS n_legs
FROM bearing GROUP BY 1, 2
"""


_MORAN_NLON = 360  # 1-deg grid, lon cells 0..359 (no wrap: rook weights)
_MORAN_NLAT = 140  # lat cells 0..139


def geo_moran_i(sf_dir: str):
    """MORAN'S I spatial autocorrelation of document density over the
    1-degree raster with rook (4-neighbor) weights — THE classic global
    spatial statistic. Everything reduces to FOUR integer aggregates over
    occupied cells only, because deviations scale to integers:
    z_i*N = x_i*N - T (N cells, T total docs), so

      num*N^2 = N^2*S_adj(x_i x_j) - N*T*S(deg_i x_i) + W*T^2
      den*N^2 = N^2*S(x_i^2)       - N*T^2

    where W and deg_i are closed-form grid constants — the zero cells'
    contribution is analytic, never materialized. Shape: one combiner
    groupby builds cell counts; S_adj comes from ONE hash join of each
    cell against its right/down neighbor keys (each unordered adjacent
    pair counted exactly once); the final I = (N/W) * num/den is a fixed
    chain of exact int->double ops, bit-equal to the SQL. Integer sums
    are order-independent — no float accumulates anywhere. Overflow
    bound: |x_i*N - T| <= T*N ~ 2^42 at sf1000, products fit int64
    through ~10^5 docs/cell on this grid (documented contract)."""
    from ray.data.aggregate import Sum

    from core_ray.stages.join import hash_join

    nlon, nlat = _MORAN_NLON, _MORAN_NLAT
    n_cells = nlon * nlat
    w_pairs = nlat * (nlon - 1) + (nlat - 1) * nlon

    def cell_partial(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        gx = np.floor(lon).astype(np.int64) + 180
        gy = np.floor(lat).astype(np.int64) + 70
        key = gy * nlon + gx
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {"cell": pa.array(u, pa.int64()),
             "x": pa.array(c.astype(np.int64), pa.int64())}
        )

    cells = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(cell_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("cell")
        .aggregate(Sum("x", alias_name="x"))
        .materialize()
    )

    def scalars(b: pa.Table) -> pa.Table:
        cell = b["cell"].to_numpy(zero_copy_only=False)
        x = b["x"].to_numpy(zero_copy_only=False)
        gx = cell % nlon
        gy = cell // nlon
        deg = (
            (gx > 0).astype(np.int64) + (gx < nlon - 1)
            + (gy > 0) + (gy < nlat - 1)
        )
        return pa.table(
            {
                "t": pa.array([int(x.sum())], pa.int64()),
                "sum_sq": pa.array([int((x * x).sum())], pa.int64()),
                "sum_deg_x": pa.array([int((deg * x).sum())], pa.int64()),
            }
        )

    sc = cells.map_batches(scalars, batch_format="pyarrow").sum(
        ["t", "sum_sq", "sum_deg_x"]
    )
    t, sum_sq, sum_deg_x = sc["sum(t)"], sc["sum(sum_sq)"], sc["sum(sum_deg_x)"]

    # S_adj(x_i x_j): join each cell against its right and down neighbors
    def probes(b: pa.Table) -> pa.Table:
        cell = b["cell"].to_numpy(zero_copy_only=False)
        x = b["x"].to_numpy(zero_copy_only=False)
        gx = cell % nlon
        gy = cell // nlon
        right = np.where(gx < nlon - 1, cell + 1, -1)
        down = np.where(gy < nlat - 1, cell + nlon, -1)
        nb = np.concatenate([right, down])
        xx = np.concatenate([x, x])
        keep = nb >= 0
        return pa.table(
            {"cell": pa.array(nb[keep], pa.int64()),
             "x_src": pa.array(xx[keep], pa.int64())}
        )

    joined = hash_join(
        cells.map_batches(probes, batch_format="pyarrow"), cells, on="cell"
    )

    def prod(b: pa.Table) -> pa.Table:
        p = b["x_src"].to_numpy(zero_copy_only=False) * b["x"].to_numpy(
            zero_copy_only=False
        )
        return pa.table({"p": pa.array([int(p.sum())], pa.int64())})

    sum_adj = int(joined.map_batches(prod, batch_format="pyarrow").sum("p") or 0)
    t, sum_sq, sum_deg_x = int(t), int(sum_sq), int(sum_deg_x)

    n = n_cells
    num = n * n * sum_adj - n * t * sum_deg_x + w_pairs * t * t
    den = n * n * sum_sq - n * t * t
    moran = (float(n) / float(w_pairs)) * (float(num) / float(den))
    return pa.table(
        {
            "n_cells": pa.array([n], pa.int64()),
            "w_pairs": pa.array([w_pairs], pa.int64()),
            "t_docs": pa.array([t], pa.int64()),
            "sum_sq": pa.array([sum_sq], pa.int64()),
            "sum_adj_xx": pa.array([sum_adj], pa.int64()),
            "sum_deg_x": pa.array([sum_deg_x], pa.int64()),
            "moran_i": pa.array([moran], pa.float64()),
        }
    )


GEO_MORAN_I_SQL = f"""
WITH pts AS (
  SELECT CAST(FLOOR({GEO_LON_SQL}) AS BIGINT) + 180 AS gx,
         CAST(FLOOR({GEO_LAT_SQL}) AS BIGINT) + 70 AS gy
  FROM documents),
cells AS (
  SELECT gy * {_MORAN_NLON} + gx AS cell, gx, gy, COUNT(*) AS x
  FROM pts GROUP BY 1, 2, 3),
adj AS (
  SELECT CAST(COALESCE(SUM(a.x * b.x), 0) AS BIGINT) AS sum_adj
  FROM cells a JOIN cells b
    ON b.cell = a.cell + 1 AND a.gx < {_MORAN_NLON - 1}
    OR b.cell = a.cell + {_MORAN_NLON} AND a.gy < {_MORAN_NLAT - 1}),
sc AS (
  SELECT CAST(SUM(x) AS BIGINT) AS t,
         CAST(SUM(x * x) AS BIGINT) AS sum_sq,
         CAST(SUM(((CASE WHEN gx > 0 THEN 1 ELSE 0 END)
                   + (CASE WHEN gx < {_MORAN_NLON - 1} THEN 1 ELSE 0 END)
                   + (CASE WHEN gy > 0 THEN 1 ELSE 0 END)
                   + (CASE WHEN gy < {_MORAN_NLAT - 1} THEN 1 ELSE 0 END)) * x)
              AS BIGINT) AS sum_deg_x
  FROM cells),
k AS (
  SELECT CAST({_MORAN_NLON * _MORAN_NLAT} AS BIGINT) AS n,
         CAST({_MORAN_NLAT * (_MORAN_NLON - 1) + (_MORAN_NLAT - 1) * _MORAN_NLON}
              AS BIGINT) AS w)
SELECT k.n AS n_cells, k.w AS w_pairs, sc.t AS t_docs, sc.sum_sq,
       adj.sum_adj AS sum_adj_xx, sc.sum_deg_x,
       (CAST(k.n AS DOUBLE) / CAST(k.w AS DOUBLE))
         * (CAST(k.n * k.n * adj.sum_adj - k.n * sc.t * sc.sum_deg_x
                 + k.w * sc.t * sc.t AS DOUBLE)
            / CAST(k.n * k.n * sc.sum_sq - k.n * sc.t * sc.t AS DOUBLE))
         AS moran_i
FROM k, sc, adj
"""


def geo_getis_gi(sf_dir: str):
    """GETIS-ORD Gi* HOT-SPOT z-scores over the 1-degree raster with
    binary rook+self weights — Moran's I's local sibling, THE standard
    hot-spot-detection statistic. Same integer-exact strategy as
    geo_moran_i: with w_i = deg_i + 1 and mean T/N, the numerator scales
    to the integer N*(x_i + nbr_sum_i) - T*w_i, and the denominator's two
    square roots take INTEGER arguments (A = N*sum_sq - T^2 and
    N*w - w^2), so the whole z is a fixed chain of correctly-rounded
    double ops — bit-equal to the SQL mirror, no rounding needed.

    Shape: one combiner groupby builds occupied-cell counts; neighbor
    sums come from a second combiner groupby over (cell, x, 0) union
    4-direction (neighbor_cell, 0, x) contribution rows — no join, no
    neighbor materialization beyond occupied cells x 5; zero cells with
    no occupied neighbor never exist as rows (their Gi* is an analytic
    per-degree constant, excluded by contract). Output: top 20 hottest
    cells by z (tie-break cell id — total order, both sides bit-equal).
    Overflow contract: T^2 < 2^63 (same ~10^5 docs/cell bound as
    geo_moran_i, documented there)."""
    from ray.data.aggregate import Sum

    nlon, nlat = _MORAN_NLON, _MORAN_NLAT
    n_cells = nlon * nlat

    def cell_partial(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        gx = np.floor(lon).astype(np.int64) + 180
        gy = np.floor(lat).astype(np.int64) + 70
        key = gy * nlon + gx
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {"cell": pa.array(u, pa.int64()),
             "x": pa.array(c.astype(np.int64), pa.int64())}
        )

    cells = (
        _read(sf_dir, "documents", ["doc_id"])
        .map_batches(cell_partial, batch_format="pyarrow", batch_size=65536)
        .groupby("cell")
        .aggregate(Sum("x", alias_name="x"))
        .materialize()
    )

    def scalars(b: pa.Table) -> pa.Table:
        x = b["x"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "t": pa.array([int(x.sum())], pa.int64()),
                "sum_sq": pa.array([int((x * x).sum())], pa.int64()),
            }
        )

    sc = cells.map_batches(scalars, batch_format="pyarrow").sum(["t", "sum_sq"])
    t, sum_sq = int(sc["sum(t)"]), int(sc["sum(sum_sq)"])
    a_const = n_cells * sum_sq - t * t

    def contribs(b: pa.Table) -> pa.Table:
        cell = b["cell"].to_numpy(zero_copy_only=False)
        x = b["x"].to_numpy(zero_copy_only=False)
        gx = cell % nlon
        gy = cell // nlon
        outc, outx, outn = [cell], [x], [np.zeros(len(x), np.int64)]
        for delta, ok in (
            (1, gx < nlon - 1),
            (-1, gx > 0),
            (nlon, gy < nlat - 1),
            (-nlon, gy > 0),
        ):
            outc.append(cell[ok] + delta)
            outx.append(np.zeros(int(ok.sum()), np.int64))
            outn.append(x[ok])
        return pa.table(
            {
                "cell": pa.array(np.concatenate(outc), pa.int64()),
                "x": pa.array(np.concatenate(outx), pa.int64()),
                "nbx": pa.array(np.concatenate(outn), pa.int64()),
            }
        )

    agg = (
        cells.map_batches(contribs, batch_format="pyarrow")
        .groupby("cell")
        .aggregate(Sum("x", alias_name="x"), Sum("nbx", alias_name="nbr_sum"))
    )

    def zscore(b: pa.Table) -> pa.Table:
        cell = b["cell"].to_numpy(zero_copy_only=False)
        x = b["x"].to_numpy(zero_copy_only=False)
        nb = b["nbr_sum"].to_numpy(zero_copy_only=False)
        gx = cell % nlon
        gy = cell // nlon
        deg = (
            (gx > 0).astype(np.int64) + (gx < nlon - 1)
            + (gy > 0) + (gy < nlat - 1)
        )
        w = deg + 1
        num = n_cells * (x + nb) - t * w
        z = num.astype(np.float64) / (
            np.sqrt(float(a_const))
            * np.sqrt((n_cells * w - w * w).astype(np.float64) / float(n_cells - 1))
        )
        return pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "gx": pa.array(gx, pa.int64()),
                "gy": pa.array(gy, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "nbr_sum": pa.array(nb, pa.int64()),
                "z": pa.array(z, pa.float64()),
            }
        )

    return (
        agg.map_batches(zscore, batch_format="pyarrow")
        .sort(["z", "cell"], descending=[True, False])
        .limit(20)
        .drop_columns(["cell"])
    )


GEO_GETIS_GI_SQL = f"""
WITH pts AS (
  SELECT CAST(FLOOR({GEO_LON_SQL}) AS BIGINT) + 180 AS gx,
         CAST(FLOOR({GEO_LAT_SQL}) AS BIGINT) + 70 AS gy
  FROM documents),
cells AS (
  SELECT gy * {_MORAN_NLON} + gx AS cell, gx, gy, COUNT(*) AS x
  FROM pts GROUP BY 1, 2, 3),
sc AS (
  SELECT CAST(SUM(x) AS BIGINT) AS t, CAST(SUM(x * x) AS BIGINT) AS sum_sq
  FROM cells),
contrib AS (
  SELECT cell, x, CAST(0 AS BIGINT) AS nbx FROM cells
  UNION ALL
  SELECT cell + 1, CAST(0 AS BIGINT), x FROM cells WHERE gx < {_MORAN_NLON - 1}
  UNION ALL
  SELECT cell - 1, CAST(0 AS BIGINT), x FROM cells WHERE gx > 0
  UNION ALL
  SELECT cell + {_MORAN_NLON}, CAST(0 AS BIGINT), x
  FROM cells WHERE gy < {_MORAN_NLAT - 1}
  UNION ALL
  SELECT cell - {_MORAN_NLON}, CAST(0 AS BIGINT), x FROM cells WHERE gy > 0),
agg AS (
  SELECT cell, CAST(SUM(x) AS BIGINT) AS x, CAST(SUM(nbx) AS BIGINT) AS nbr_sum
  FROM contrib GROUP BY 1),
k AS (SELECT CAST({_MORAN_NLON * _MORAN_NLAT} AS BIGINT) AS n),
g AS (
  SELECT a.cell, a.cell % {_MORAN_NLON} AS gx, a.cell // {_MORAN_NLON} AS gy,
         a.x, a.nbr_sum,
         ((CASE WHEN a.cell % {_MORAN_NLON} > 0 THEN 1 ELSE 0 END)
          + (CASE WHEN a.cell % {_MORAN_NLON} < {_MORAN_NLON - 1} THEN 1 ELSE 0 END)
          + (CASE WHEN a.cell // {_MORAN_NLON} > 0 THEN 1 ELSE 0 END)
          + (CASE WHEN a.cell // {_MORAN_NLON} < {_MORAN_NLAT - 1} THEN 1 ELSE 0 END)
          + 1) AS w
  FROM agg a)
SELECT gx, gy, x, nbr_sum,
       CAST(k.n * (g.x + g.nbr_sum) - sc.t * g.w AS DOUBLE)
         / (SQRT(CAST(k.n * sc.sum_sq - sc.t * sc.t AS DOUBLE))
            * SQRT(CAST(k.n * g.w - g.w * g.w AS DOUBLE)
                   / CAST(k.n - 1 AS DOUBLE))) AS z
FROM g, k, sc
ORDER BY z DESC, g.cell
LIMIT 20
"""


_MORTON_PARTS = 64


def geo_morton_parts(sf_dir: str):
    """Z-ORDER (Morton) EQUI-DEPTH RANGE PARTITIONING — the space-filling-
    curve primitive distributed spatial stores use to pick ONE balanced,
    locality-preserving partitioning key. Each document gets a 32-bit
    Morton key (16-bit lat/lon quantization, bit-interleaved); the key
    space is split into {P} ranges of near-equal DOC COUNT (not width —
    equi-width ranges skew with the data, the whole point), and the plan
    reports each range's population and key bounds.

    Scale shape: the split points come from a distributed value->count
    histogram (count_by_u64 — distinct keys, not rows, reach the driver;
    the doc_quality_buckets contract), the <=P boundary keys broadcast
    into a stateless searchsorted assignment, and per-batch partials feed
    one tiny groupby. Deterministic tie contract: all docs sharing a key
    share a part — part(v) = floor(P * |{{docs with key < v}}| / N), which
    the SQL mirrors with a window prefix sum; quantization floats are the
    identical expression chain both sides, and everything after is
    integer."""
    from ray.data.aggregate import Max, Min, Sum

    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "documents", ["doc_id"])

    def mkeys(b: pa.Table) -> np.ndarray:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        qx = np.minimum(
            np.maximum(np.floor((lon + 180.0) * 65536.0 / 360.0), 0.0), 65535.0
        ).astype(np.int64)
        qy = np.minimum(
            np.maximum(np.floor((lat + 90.0) * 65536.0 / 180.0), 0.0), 65535.0
        ).astype(np.int64)
        mk = np.zeros(len(qx), np.int64)
        for bit in range(16):
            mk |= ((qx >> bit) & 1) << (2 * bit)
            mk |= ((qy >> bit) & 1) << (2 * bit + 1)
        return mk

    hist = count_by_u64(
        ds.map_batches(
            lambda b: pa.table({"key": pa.array(mkeys(b).astype(np.uint64),
                                                pa.uint64())}),
            batch_format="pyarrow",
            batch_size=65536,
        ),
        "key",
    )
    h = _collect_table(hist)
    vals = h["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnts = h["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vals)
    vals, cnts = vals[order], cnts[order]
    n_total = int(cnts.sum())
    prefix = np.cumsum(cnts) - cnts  # docs with key < v
    part_of_val = (prefix * _MORTON_PARTS) // n_total
    new_part = np.r_[True, part_of_val[1:] != part_of_val[:-1]]
    bounds = vals[new_part]  # first key of each PRESENT part, ascending
    part_ids = part_of_val[new_part]

    def partials(b: pa.Table) -> pa.Table:
        mk = mkeys(b)
        part = part_ids[np.searchsorted(bounds, mk, side="right") - 1]
        order = np.lexsort((mk, part))  # part-major, key-minor
        ps, ms = part[order], mk[order]
        new = np.r_[True, ps[1:] != ps[:-1]]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(ps))
        return pa.table(
            {
                "part_id": pa.array(ps[starts], pa.int64()),
                "n": pa.array(ends - starts, pa.int64()),
                "lo": pa.array(ms[starts], pa.int64()),
                "hi": pa.array(ms[ends - 1], pa.int64()),
            }
        )

    return (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=65536)
        .groupby("part_id")
        .aggregate(
            Sum("n", alias_name="n_docs"),
            Min("lo", alias_name="lo_key"),
            Max("hi", alias_name="hi_key"),
        )
    )


def _morton_interleave_sql(qx: str, qy: str) -> str:
    return " + ".join(
        f"(({qx} // {1 << b}) % 2) * {1 << (2 * b)}"
        f" + (({qy} // {1 << b}) % 2) * {1 << (2 * b + 1)}"
        for b in range(16)
    )


GEO_MORTON_PARTS_SQL = f"""
WITH pts AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
q AS (
  SELECT doc_id,
         CAST(GREATEST(LEAST(FLOOR((lon + 180.0) * 65536.0 / 360.0),
                             65535.0), 0.0) AS BIGINT) AS qx,
         CAST(GREATEST(LEAST(FLOOR((lat + 90.0) * 65536.0 / 180.0),
                             65535.0), 0.0) AS BIGINT) AS qy
  FROM pts),
m AS (SELECT doc_id, {_morton_interleave_sql('qx', 'qy')} AS mkey FROM q),
counts AS (SELECT mkey, COUNT(*) AS c FROM m GROUP BY 1),
pre AS (
  SELECT mkey,
         COALESCE(SUM(c) OVER (ORDER BY mkey
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS pfx
  FROM counts),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM m),
parts AS (
  SELECT m.mkey, CAST((pre.pfx * {_MORTON_PARTS}) // tot.n AS BIGINT) AS part_id
  FROM m JOIN pre USING (mkey), tot)
SELECT part_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(mkey) AS BIGINT) AS lo_key, CAST(MAX(mkey) AS BIGINT) AS hi_key
FROM parts GROUP BY 1
"""


_KNN_CLS_MOD = 199  # probe set = docs with doc_id % 199 == 0
_KNN_CLS_K = 5


def geo_knn_classify(sf_dir: str):
    """kNN MAJORITY-VOTE CLASSIFICATION in coordinate space: each probe
    document (doc_id % {mod} == 0 — standing in for a small labeled query
    set) is assigned the majority ``lang`` among its 5 nearest OTHER
    documents. The spatial twin of emb_topk's broadcast-probe plan: the
    probe matrix is ray.put-broadcast (probes << corpus by contract — the
    same bound doc_contamination documents), every batch computes a
    vectorized (P x B) squared-degree distance block and emits per-probe
    LOCAL top-k partials, and one probe-keyed partition pass merges
    partials, takes the global top-k and votes. No shuffle touches the
    corpus; the only exchange is k x n_batches partial rows per probe.

    Exact parity: distances are the same dla*dla + dlo*dlo chain both
    sides; the top-k order is (dist, doc_id) — total, so float ties are
    broken identically — and the vote tie-break is lexicographic lang."""
    from core_ray.stages.agg import map_groups_partitioned

    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def _probe_filter(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % _KNN_CLS_MOD == 0))

    probe_tbl = pa.concat_tables(
        list(
            docs.map_batches(_probe_filter, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
    )
    p_ids = probe_tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    p_lat, p_lon = _derive_coords(p_ids)

    def topk_partial(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lang = np.asarray(b["lang"].to_pylist())
        lat, lon = _derive_coords(ids)
        dla = p_lat[:, None] - lat[None, :]
        dlo = p_lon[:, None] - lon[None, :]
        d = dla * dla + dlo * dlo  # (P, B)
        d[ids[None, :] == p_ids[:, None]] = np.inf  # exclude self
        k = min(_KNN_CLS_K, d.shape[1])
        part = np.argpartition(d, k - 1, axis=1)[:, :k]
        pid_out = np.repeat(p_ids, k)
        col = part.ravel()
        return pa.table(
            {
                "pid": pa.array(pid_out, pa.int64()),
                "doc_id": pa.array(ids[col], pa.int64()),
                "lang": pa.array(lang[col].tolist(), pa.string()),
                "dist": pa.array(d[np.repeat(np.arange(len(p_ids)), k), col],
                                 pa.float64()),
                "k": pa.array(pid_out.astype(np.uint64), pa.uint64()),
            }
        )

    def vote(g: pa.Table) -> pa.Table:
        pid = g["pid"].to_numpy(zero_copy_only=False)
        did = g["doc_id"].to_numpy(zero_copy_only=False)
        dist = g["dist"].to_numpy(zero_copy_only=False)
        lang = np.asarray(g["lang"].to_pylist())
        order = np.lexsort((did, dist, pid))
        pid, did, dist, lang = pid[order], did[order], dist[order], lang[order]
        new = np.r_[True, pid[1:] != pid[:-1]]
        starts = np.nonzero(new)[0]
        out_p, out_l, out_n = [], [], []
        ends = np.append(starts[1:], len(pid))
        for s, e in zip(starts, ends):
            kk = min(_KNN_CLS_K, e - s)
            u, c = np.unique(lang[s:s + kk], return_counts=True)
            w = int(np.argmax(c))  # np.unique sorts langs: first max = lex tie-break
            out_p.append(int(pid[s]))
            out_l.append(str(u[w]))
            out_n.append(int(c[w]))
        return pa.table(
            {
                "pid": pa.array(out_p, pa.int64()),
                "pred_lang": pa.array(out_l, pa.string()),
                "n_votes": pa.array(out_n, pa.int64()),
            }
        )

    partials = docs.map_batches(topk_partial, batch_format="pyarrow",
                                batch_size=65536)
    return map_groups_partitioned(partials, "k", vote)


GEO_KNN_CLASSIFY_SQL = f"""
WITH pts AS (
  SELECT doc_id, lang, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon
  FROM documents),
probes AS (SELECT doc_id AS pid, lat, lon FROM pts
           WHERE doc_id % {_KNN_CLS_MOD} = 0),
cand AS (
  SELECT p.pid, d.doc_id, d.lang,
         (p.lat - d.lat) * (p.lat - d.lat)
           + (p.lon - d.lon) * (p.lon - d.lon) AS dist,
         ROW_NUMBER() OVER (PARTITION BY p.pid
                            ORDER BY (p.lat - d.lat) * (p.lat - d.lat)
                                     + (p.lon - d.lon) * (p.lon - d.lon),
                                     d.doc_id) AS rn
  FROM probes p JOIN pts d ON d.doc_id != p.pid),
votes AS (
  SELECT pid, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM cand WHERE rn <= {_KNN_CLS_K} GROUP BY 1, 2)
SELECT pid, lang AS pred_lang, n AS n_votes
FROM votes
QUALIFY ROW_NUMBER() OVER (PARTITION BY pid ORDER BY n DESC, lang) = 1
"""


_IDW_MOD = 41  # probe set = docs with doc_id % 41 == 0
_IDW_K = 8
_IDW_Q = 10000.0  # squared-degree distance quantizer (exact in float64)
# Integer weight scale. Worldwide d2 caps at 140^2+360^2 = 149,200 deg^2, so
# floor(d2*Q) < 1.5e9 and SCALE//(1+d2q) never underflows to 0; per-probe
# integer sums stay far inside int64 (8 * 1e12 * max_chars).
_IDW_SCALE = 10**12


def geo_idw_interp(sf_dir: str):
    """INVERSE-DISTANCE-WEIGHTED INTERPOLATION: estimate a surface value
    (``n_chars``) at each probe site (doc_id % {mod} == 0) from its 8
    nearest other documents — the classic geostatistics gridding operator
    (Shepard 1968). Same broadcast-probe plan as geo_knn_classify: probe
    matrix ray.put-small by contract, per-batch (P x B) vectorized distance
    blocks emit per-probe local top-k partials, one probe-keyed partition
    pass merges and reduces. No corpus shuffle.

    Exact parity with SQL via the integer-numerator discipline (the
    geo_getis_gi/doc_unigram_surprisal trick): the weight is quantized to
    an INTEGER w = SCALE // (1 + floor(d2 * Q)) — d2 is the identical
    dla*dla + dlo*dlo double chain on both sides, so floor(d2*Q) is the
    same int64 — and the estimate is ONE double division of two exact
    integer sums (order-free), never an order-sensitive float sum."""
    from core_ray.stages.agg import map_groups_partitioned

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def _probe_filter(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.filter(pa.array(ids % _IDW_MOD == 0))

    probe_tbl = pa.concat_tables(
        list(
            docs.map_batches(_probe_filter, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
    )
    p_ids = probe_tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    p_lat, p_lon = _derive_coords(p_ids)

    def topk_partial(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        chars = pc.cast(b["n_chars"], pa.int64()).to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(ids)
        dla = p_lat[:, None] - lat[None, :]
        dlo = p_lon[:, None] - lon[None, :]
        d = dla * dla + dlo * dlo  # (P, B)
        d[ids[None, :] == p_ids[:, None]] = np.inf  # exclude self
        k = min(_IDW_K, d.shape[1])
        part = np.argpartition(d, k - 1, axis=1)[:, :k]
        pid_out = np.repeat(p_ids, k)
        col = part.ravel()
        return pa.table(
            {
                "pid": pa.array(pid_out, pa.int64()),
                "doc_id": pa.array(ids[col], pa.int64()),
                "chars": pa.array(chars[col], pa.int64()),
                "dist": pa.array(d[np.repeat(np.arange(len(p_ids)), k), col],
                                 pa.float64()),
                "k": pa.array(pid_out.astype(np.uint64), pa.uint64()),
            }
        )

    def reduce_idw(g: pa.Table) -> pa.Table:
        pid = g["pid"].to_numpy(zero_copy_only=False)
        did = g["doc_id"].to_numpy(zero_copy_only=False)
        dist = g["dist"].to_numpy(zero_copy_only=False)
        chars = g["chars"].to_numpy(zero_copy_only=False)
        fin = np.isfinite(dist)  # inf partials only exist in tiny batches
        pid, did, dist, chars = pid[fin], did[fin], dist[fin], chars[fin]
        order = np.lexsort((did, dist, pid))  # total (pid, dist, doc_id)
        pid, dist, chars = pid[order], dist[order], chars[order]
        new = np.r_[True, pid[1:] != pid[:-1]]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(pid))
        out_p, out_e, out_w = [], [], []
        for s, e in zip(starts, ends):
            kk = min(_IDW_K, e - s)
            d2q = np.floor(dist[s:s + kk] * _IDW_Q).astype(np.int64)
            w = _IDW_SCALE // (1 + d2q)
            sw = int(w.sum())
            swv = int((w * chars[s:s + kk]).sum())
            out_p.append(int(pid[s]))
            out_e.append(float(np.float64(swv) / np.float64(sw)))
            out_w.append(sw)
        return pa.table(
            {
                "pid": pa.array(out_p, pa.int64()),
                "idw_chars": pa.array(out_e, pa.float64()),
                "sum_w": pa.array(out_w, pa.int64()),
            }
        )

    partials = docs.map_batches(topk_partial, batch_format="pyarrow",
                                batch_size=65536)
    return map_groups_partitioned(partials, "k", reduce_idw)


GEO_IDW_INTERP_SQL = f"""
WITH pts AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS chars,
         {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon
  FROM documents),
probes AS (SELECT doc_id AS pid, lat, lon FROM pts
           WHERE doc_id % {_IDW_MOD} = 0),
cand AS (
  SELECT p.pid, d.doc_id, d.chars,
         (p.lat - d.lat) * (p.lat - d.lat)
           + (p.lon - d.lon) * (p.lon - d.lon) AS dist,
         ROW_NUMBER() OVER (PARTITION BY p.pid
                            ORDER BY (p.lat - d.lat) * (p.lat - d.lat)
                                     + (p.lon - d.lon) * (p.lon - d.lon),
                                     d.doc_id) AS rn
  FROM probes p JOIN pts d ON d.doc_id != p.pid),
w AS (
  SELECT pid, chars,
         {_IDW_SCALE} // (1 + CAST(FLOOR(dist * {_IDW_Q}) AS BIGINT)) AS w
  FROM cand WHERE rn <= {_IDW_K})
SELECT pid,
       CAST(CAST(SUM(w * chars) AS BIGINT) AS DOUBLE)
         / CAST(CAST(SUM(w) AS BIGINT) AS DOUBLE) AS idw_chars,
       CAST(SUM(w) AS BIGINT) AS sum_w
FROM w GROUP BY 1
"""


_VARIO_LAG_DEG = 0.5  # lag-bin width (deg)
_VARIO_RADIUS_DEG = 10.0  # wider band than the 5-deg pair query: the test
# corpus's derived-coordinate lattice concentrates pair distances near
# ~0.9/6.6/7.8 deg, so 10 deg exercises multiple lag bins


def geo_semivariogram(sf_dir: str, radius: float = _VARIO_RADIUS_DEG):
    """EMPIRICAL SEMIVARIOGRAM (Matheron): gamma(h) = sum((v_a - v_b)^2)
    / (2 * N(h)) over document pairs within the distance band, binned by
    lag floor(sqrt(d2)/width) — the spatial-continuity curve kriging and
    IDW parameter fitting start from; the natural companion to
    geo_idw_interp. Shape is geo_colocation's: the value column (n_chars)
    RIDES the 9x home+ghost replication, one hash shuffle, and the
    partition kernel reduces home-left candidate pairs straight to
    (lag_bin, n, sum_sqdiff) integer partials — pairs never materialize
    outside a task, and the final groupby sums <= 11 bins x n_parts rows.
    Exactness: diffs are int64 so per-bin sums are exact order-free
    integers (np.add.at, not float bincount weights); gamma is ONE double
    division of two exact integers, mirrored bit-identically in SQL; the
    lag index floor(sqrt(d2)/width) uses the same correctly-rounded
    IEEE sqrt chain both sides."""
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import map_groups_partitioned
    from core_ray.stages.distband import replicate_to_cells

    r2 = radius * radius
    n_bins = int(np.floor(radius / _VARIO_LAG_DEG)) + 1
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def rep(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        t = replicate_to_cells(doc_id.astype(np.int64), lat, lon, radius)
        chars = pc.cast(b["n_chars"], pa.int64())
        idx = np.repeat(np.arange(len(doc_id), dtype=np.int64), 9)
        return t.append_column("chars", pc.take(chars, pa.array(idx)))

    _empty = pa.table(
        {
            "lag_bin": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "ssq": pa.array([], pa.int64()),
        }
    )

    def part(g: pa.Table) -> pa.Table:
        key = g["ck"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(key)
        if n == 0:
            return _empty
        order = np.argsort(key, kind="stable")
        key = key[order]
        ids = g["doc_id"].to_numpy(zero_copy_only=False)[order]
        lat = g["lat"].to_numpy(zero_copy_only=False)[order]
        lon = g["lon"].to_numpy(zero_copy_only=False)[order]
        home = g["home"].to_numpy(zero_copy_only=False)[order]
        chars = g["chars"].to_numpy(zero_copy_only=False)[order]
        new = np.ones(n, dtype=bool)
        new[1:] = key[1:] != key[:-1]
        seg_id = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        seg_len = np.diff(np.append(starts, n)).astype(np.int64)
        hidx = np.nonzero(home)[0]
        if len(hidx) == 0:
            return _empty
        cnt_acc = np.zeros(n_bins, np.int64)
        ssq_acc = np.zeros(n_bins, np.int64)
        Lh = seg_len[seg_id[hidx]]
        chunk_of_home = np.cumsum(Lh) // (8 << 20)
        for c in np.unique(chunk_of_home):
            sel = chunk_of_home == c
            h = hidx[sel]
            L = Lh[sel]
            left = np.repeat(h, L)
            rps = np.cumsum(L) - L
            offs = np.arange(int(L.sum())) - np.repeat(rps, L)
            right = np.repeat(starts[seg_id[h]], L) + offs
            m = ids[right] > ids[left]
            i, j = left[m], right[m]
            dla = lat[i] - lat[j]
            dlo = lon[i] - lon[j]
            d2 = dla * dla + dlo * dlo
            keep = d2 <= r2
            i, j, d2 = i[keep], j[keep], d2[keep]
            lag = np.floor(np.sqrt(d2) / _VARIO_LAG_DEG).astype(np.int64)
            diff = chars[i] - chars[j]
            np.add.at(cnt_acc, lag, 1)
            np.add.at(ssq_acc, lag, diff * diff)
        present = np.nonzero(cnt_acc)[0]
        if len(present) == 0:
            return _empty
        return pa.table(
            {
                "lag_bin": pa.array(present, pa.int64()),
                "n": pa.array(cnt_acc[present], pa.int64()),
                "ssq": pa.array(ssq_acc[present], pa.int64()),
            }
        )

    rep_ds = docs.map_batches(rep, batch_format="pyarrow", batch_size=65536)
    binned = (
        map_groups_partitioned(rep_ds, "ck", part)
        .groupby("lag_bin")
        .aggregate(Sum("n", alias_name="n_pairs"),
                   Sum("ssq", alias_name="sum_sqdiff"))
    )

    def finish(b: pa.Table) -> pa.Table:
        npair = b["n_pairs"].to_numpy(zero_copy_only=False).astype(np.int64)
        ssq = b["sum_sqdiff"].to_numpy(zero_copy_only=False).astype(np.int64)
        gamma = ssq.astype(np.float64) / (2 * npair).astype(np.float64)
        return pa.table(
            {
                "lag_bin": pc.cast(b["lag_bin"], pa.int64()),
                "n_pairs": pa.array(npair, pa.int64()),
                "sum_sqdiff": pa.array(ssq, pa.int64()),
                "gamma": pa.array(gamma, pa.float64()),
            }
        )

    t = pa.concat_tables(
        list(
            binned.map_batches(finish, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
    )  # <= 11 rows by construction
    return t.sort_by("lag_bin")


GEO_SEMIVARIOGRAM_SQL = f"""
WITH pts AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS chars,
         {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon
  FROM documents),
pairs AS (
  SELECT CAST(FLOOR(SQRT((a.lat - b.lat) * (a.lat - b.lat)
                          + (a.lon - b.lon) * (a.lon - b.lon))
                    / {_VARIO_LAG_DEG}) AS BIGINT) AS lag_bin,
         (a.chars - b.chars) * (a.chars - b.chars) AS sqdiff
  FROM pts a JOIN pts b ON a.doc_id < b.doc_id
  WHERE (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon)
        <= {_VARIO_RADIUS_DEG * _VARIO_RADIUS_DEG})
SELECT lag_bin, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(sqdiff) AS BIGINT) AS sum_sqdiff,
       CAST(CAST(SUM(sqdiff) AS BIGINT) AS DOUBLE)
         / CAST(2 * COUNT(*) AS DOUBLE) AS gamma
FROM pairs GROUP BY 1 ORDER BY 1
"""


_SSAMP_K = 3  # cap per 30-deg cell
_SSAMP_CELL_DEG = 30.0  # coarse enough that dense cells exceed the cap on
# the test lattice (1-deg cells hold <=3 docs there — nothing would bite)
_SSAMP_MULT = 2654435761  # Knuth multiplicative hash (fits int64 here;
# at 10^12-doc scale use a 128-bit modmul — documented contract)


def geo_stratified_sample(sf_dir: str, per: int = _SSAMP_K):
    """STRATIFIED SPATIAL SAMPLING: keep at most K documents per 1-degree
    cell, chosen by a deterministic per-doc hash — the geographic
    rebalancing step a training-data pipeline runs to debias mega-city
    skew (cap the dense cells, keep the sparse ones whole) while staying
    reproducible across runs. Same two-level shape as doc_top2_per_lang:
    the per-batch combiner prunes to K rows per cell BEFORE the shuffle
    (so the groupby moves at most K x cells x batches rows, never the
    corpus), then a per-cell top-K under the total (h, doc_id) order.
    The cell key is packed into ONE int64 for the shuffle (the
    multi-column-groupby lesson in BASELINE.md)."""
    ds = _read(sf_dir, "documents", ["doc_id"])

    def keyed(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(doc_id)
        gx = np.floor(lon / _SSAMP_CELL_DEG).astype(np.int64)
        gy = np.floor(lat / _SSAMP_CELL_DEG).astype(np.int64)
        h = (doc_id * _SSAMP_MULT) % 4294967296
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "gx": pa.array(gx, pa.int64()),
                "gy": pa.array(gy, pa.int64()),
                "h": pa.array(h, pa.int64()),
                "gk": pa.array((gx + 8) * 1024 + (gy + 4), pa.int64()),
            }
        )

    def prune(b: pa.Table) -> pa.Table:
        t = keyed(b)
        gk = t["gk"].to_numpy(zero_copy_only=False)
        h = t["h"].to_numpy(zero_copy_only=False)
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((did, h, gk))
        gs = gk[order]
        new = np.ones(len(gs), dtype=bool)
        new[1:] = gs[1:] != gs[:-1]
        grp_start = np.maximum.accumulate(
            np.where(new, np.arange(len(gs)), 0))
        keep = (np.arange(len(gs)) - grp_start) < per
        return t.take(pa.array(order[keep]))

    def top_per_cell(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("h", "ascending"), ("doc_id", "ascending")]
        )
        return g.take(order[:per]).drop_columns(["gk"])

    return (
        ds.map_batches(prune, batch_format="pyarrow", batch_size=65536)
        .groupby("gk")
        .map_groups(top_per_cell, batch_format="pyarrow")
    )


GEO_STRATIFIED_SAMPLE_SQL = f"""
WITH pts AS (
  SELECT doc_id,
         CAST(FLOOR(({GEO_LON_SQL}) / {_SSAMP_CELL_DEG}) AS BIGINT) AS gx,
         CAST(FLOOR(({GEO_LAT_SQL}) / {_SSAMP_CELL_DEG}) AS BIGINT) AS gy,
         (doc_id * {_SSAMP_MULT}) % 4294967296 AS h
  FROM documents)
SELECT doc_id, gx, gy, h FROM pts
QUALIFY ROW_NUMBER() OVER (PARTITION BY gx, gy ORDER BY h, doc_id)
        <= {_SSAMP_K}
"""


_NF_Q = 1000.0  # micro-distance quantizer for the exact integer sum


def geo_nearest_facility(sf_dir: str):
    """NEAREST-FACILITY ASSIGNMENT (allocation): every document is assigned
    to the closest of the 12 model city centers — the reverse-geocode /
    service-area allocation primitive (nearest warehouse, nearest POI).
    The facility table is tiny by definition, so it is a broadcast
    constant: each batch computes a vectorized (B x 12) squared-degree
    distance block, argmin with the (dist, fac_id) total order (np.argmin
    first-minimum == lowest fac_id == the SQL window order), and reduces
    straight to per-facility (n, sum_micro) integer partials via bincount
    — no shuffle moves rows, the final groupby sums 12 x n_batches partial
    rows. mean_d2 is ONE double division of two exact integers (micro
    quantizer floor(d2*Q); int64 partials bound the contract — at extreme
    corpus scale the partials stay bounded per task and the final 12-row
    merge would move to a widened accumulator)."""
    from ray.data.aggregate import Sum

    k = np.arange(12, dtype=np.int64)
    f_lat = ((k * 11003) % 120000) / 1000.0 - 60.0
    f_lon = ((k * 104729) % 340000) / 1000.0 - 170.0

    ds = _read(sf_dir, "documents", ["doc_id"])

    def partial(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(doc_id)
        dla = lat[:, None] - f_lat[None, :]
        dlo = lon[:, None] - f_lon[None, :]
        d2 = dla * dla + dlo * dlo  # (B, 12)
        fac = np.argmin(d2, axis=1)
        best = d2[np.arange(len(fac)), fac]
        micro = np.floor(best * _NF_Q).astype(np.int64)
        n = np.bincount(fac, minlength=12).astype(np.int64)
        sm = np.zeros(12, np.int64)
        np.add.at(sm, fac, micro)
        present = np.nonzero(n)[0]
        return pa.table(
            {
                "fac_id": pa.array(present, pa.int64()),
                "n": pa.array(n[present], pa.int64()),
                "sm": pa.array(sm[present], pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("fac_id")
        .aggregate(Sum("n", alias_name="n_docs"),
                   Sum("sm", alias_name="sum_micro"))
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        sm = b["sum_micro"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "fac_id": pc.cast(b["fac_id"], pa.int64()),
                "n_docs": pa.array(n, pa.int64()),
                "sum_micro": pa.array(sm, pa.int64()),
                "mean_micro": pa.array(
                    sm.astype(np.float64) / n.astype(np.float64), pa.float64()
                ),
            }
        )

    t = pa.concat_tables(
        list(
            agg.map_batches(finish, batch_format="pyarrow")
            .iter_batches(batch_format="pyarrow")
        )
    )  # <= 12 rows by construction
    return t.sort_by("fac_id")


GEO_NEAREST_FACILITY_SQL = f"""
WITH pts AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
facs AS (
  SELECT k AS fac_id,
         ((k * 11003) % 120000) / 1000.0 - 60.0 AS flat,
         ((k * 104729) % 340000) / 1000.0 - 170.0 AS flon
  FROM range(12) t(k)),
assign AS (
  SELECT p.doc_id, f.fac_id,
         (p.lat - f.flat) * (p.lat - f.flat)
           + (p.lon - f.flon) * (p.lon - f.flon) AS d2,
         ROW_NUMBER() OVER (PARTITION BY p.doc_id
                            ORDER BY (p.lat - f.flat) * (p.lat - f.flat)
                                     + (p.lon - f.flon) * (p.lon - f.flon),
                                     f.fac_id) AS rn
  FROM pts p CROSS JOIN facs f)
SELECT fac_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CAST(FLOOR(d2 * {_NF_Q}) AS BIGINT)) AS BIGINT) AS sum_micro,
       CAST(CAST(SUM(CAST(FLOOR(d2 * {_NF_Q}) AS BIGINT)) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS mean_micro
FROM assign WHERE rn = 1 GROUP BY 1 ORDER BY 1
"""


_MM_SEGS = 40  # model road-segment count (broadcast side)


def _mm_segments():
    """Deterministic model road network: 40 segments with integer-formula
    endpoints (the k≡20 / k≡17 (mod 21) degenerate-length solutions are
    disjoint, so every segment has positive length)."""
    k = np.arange(_MM_SEGS, dtype=np.int64)
    alat = ((k * 9176 + 13) % 120000) / 1000.0 - 60.0
    alon = ((k * 30211 + 7) % 340000) / 1000.0 - 170.0
    dlat = ((k * 53) % 21).astype(np.float64) - 10.0
    dlon = ((k * 71) % 21).astype(np.float64) - 10.0
    return alat, alon, dlat, dlon


def geo_map_match(sf_dir: str):
    """MAP-MATCHING SNAP (nearest-road-segment assignment): every document
    point snaps to the closest of a small broadcast road-segment set via
    the clamped-projection point-to-segment distance — the primitive under
    GPS map-matching and address-to-street conciliation; the EXTENDED-object
    sibling of geo_nearest_facility's point sites. Map-only plan: each batch
    computes a vectorized (B x 40) distance block (t = clip(dot/len2, 0, 1),
    residual d2), argmin under the (d2, seg_id) total order (np.argmin
    first-minimum == lowest seg_id == the SQL window order) — NO shuffle at
    any corpus scale, the segment table is a broadcast constant. Unlike the
    haversine family there is no libm transcendental anywhere: the whole
    distance chain is +,-,*,/ mirrored term-by-term in the oracle, so
    d2/t are BIT-equal and the integer quantizers (t_milli, d2_micro) are
    exact, not defensive."""
    alat, alon, sdlat, sdlon = _mm_segments()
    len2 = sdlat * sdlat + sdlon * sdlon  # (40,)

    ds = _read(sf_dir, "documents", ["doc_id"])

    def snap(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(doc_id)
        dla = lat[:, None] - alat[None, :]  # (B, 40)
        dlo = lon[:, None] - alon[None, :]
        t = (dla * sdlat[None, :] + dlo * sdlon[None, :]) / len2[None, :]
        t = np.minimum(np.maximum(t, 0.0), 1.0)
        rx = dla - t * sdlat[None, :]
        ry = dlo - t * sdlon[None, :]
        d2 = rx * rx + ry * ry
        seg = np.argmin(d2, axis=1)
        r = np.arange(len(seg))
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "seg_id": pa.array(seg.astype(np.int64), pa.int64()),
                "t_milli": pa.array(
                    np.floor(t[r, seg] * 1000.0).astype(np.int64), pa.int64()
                ),
                "d2_micro": pa.array(
                    np.floor(d2[r, seg] * 1000000.0).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return ds.map_batches(snap, batch_format="pyarrow", batch_size=65536)


GEO_MAP_MATCH_SQL = f"""
WITH pts AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
segs AS (
  SELECT k AS seg_id,
         ((k * 9176 + 13) % 120000) / 1000.0 - 60.0 AS alat,
         ((k * 30211 + 7) % 340000) / 1000.0 - 170.0 AS alon,
         CAST((k * 53) % 21 AS DOUBLE) - 10.0 AS dlat,
         CAST((k * 71) % 21 AS DOUBLE) - 10.0 AS dlon
  FROM range({_MM_SEGS}) t(k)),
proj AS (
  SELECT p.doc_id, s.seg_id,
         LEAST(GREATEST(
           ((p.lat - s.alat) * s.dlat + (p.lon - s.alon) * s.dlon)
             / (s.dlat * s.dlat + s.dlon * s.dlon), 0.0), 1.0) AS t,
         p.lat - s.alat AS dla, p.lon - s.alon AS dlo,
         s.dlat AS sdlat, s.dlon AS sdlon
  FROM pts p CROSS JOIN segs s),
dist AS (
  SELECT doc_id, seg_id, t,
         (dla - t * sdlat) * (dla - t * sdlat)
           + (dlo - t * sdlon) * (dlo - t * sdlon) AS d2
  FROM proj),
best AS (
  SELECT doc_id, seg_id, t, d2,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d2, seg_id) AS rn
  FROM dist)
SELECT doc_id, seg_id,
       CAST(FLOOR(t * 1000.0) AS BIGINT) AS t_milli,
       CAST(FLOOR(d2 * 1000000.0) AS BIGINT) AS d2_micro
FROM best WHERE rn = 1
"""


_TOPONYMS = ("spark", "window", "stream", "vector")  # ambiguous model names


def _toponym_candidates():
    """3 candidate gazetteer entries per ambiguous name (integer-formula
    coords); global cand_id = name_idx * 3 + j."""
    i = np.repeat(np.arange(len(_TOPONYMS), dtype=np.int64), 3)
    j = np.tile(np.arange(3, dtype=np.int64), len(_TOPONYMS))
    clat = ((i * 37 + j * 7919 + 11) % 140000) / 1000.0 - 70.0
    clon = ((i * 59 + j * 104729 + 23) % 360000) / 1000.0 - 180.0
    return i, i * 3 + j, clat, clon


def doc_toponym_resolve(sf_dir: str):
    """TOPONYM DISAMBIGUATION (geoparsing): each document mentioning an
    ambiguous place name resolves it to ONE gazetteer candidate — the
    candidate closest to the document's own derived location (proximity
    prior; ties by cand_id) — the mention->place step of every
    text-to-map pipeline (news geolocation, local-intent search). The
    gazetteer is a broadcast constant (ambiguous names ≪ corpus by
    definition): per batch, one RE2 word-boundary match per name
    (pc.match_substring_regex — DuckDB's regexp_matches is RE2-compatible
    on this pattern class, so match sets agree exactly) and a vectorized
    3-candidate argmin for the matching rows; map-only, NO shuffle. The
    distance chain is pure +,-,* arithmetic mirrored term-by-term in the
    oracle, so d2 is bit-equal and the micro quantizer is exact."""
    name_idx, cand_id, clat, clon = _toponym_candidates()

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def resolve(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(doc_id)
        out_doc, out_name, out_cand, out_d2 = [], [], [], []
        for ni, name in enumerate(_TOPONYMS):
            m = pc.match_substring_regex(
                b["text"], rf"\b{name}\b"
            ).to_numpy(zero_copy_only=False)
            hit = np.nonzero(m)[0]
            if len(hit) == 0:
                continue
            sel = name_idx == ni  # the 3 candidates of this name
            dla = lat[hit][:, None] - clat[None, sel]
            dlo = lon[hit][:, None] - clon[None, sel]
            d2 = dla * dla + dlo * dlo  # (H, 3)
            jbest = np.argmin(d2, axis=1)
            r = np.arange(len(hit))
            out_doc.append(doc_id[hit])
            out_name.append(np.full(len(hit), ni, np.int64))
            out_cand.append(cand_id[sel][jbest])
            out_d2.append(
                np.floor(d2[r, jbest] * 1000000.0).astype(np.int64)
            )
        if not out_doc:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "name": pa.array([], pa.string()),
                    "cand_id": pa.array([], pa.int64()),
                    "d2_micro": pa.array([], pa.int64()),
                }
            )
        names = np.array(_TOPONYMS)[np.concatenate(out_name)]
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
                "name": pa.array(names, pa.string()),
                "cand_id": pa.array(np.concatenate(out_cand), pa.int64()),
                "d2_micro": pa.array(np.concatenate(out_d2), pa.int64()),
            }
        )

    return ds.map_batches(resolve, batch_format="pyarrow", batch_size=65536)


_TOPONYM_NAMES_SQL = ", ".join(
    f"({i}, '{n}')" for i, n in enumerate(_TOPONYMS)
)

DOC_TOPONYM_RESOLVE_SQL = f"""
WITH names(name_idx, name) AS (VALUES {_TOPONYM_NAMES_SQL}),
cands AS (
  SELECT n.name_idx, n.name, n.name_idx * 3 + j AS cand_id,
         ((n.name_idx * 37 + j * 7919 + 11) % 140000) / 1000.0 - 70.0 AS clat,
         ((n.name_idx * 59 + j * 104729 + 23) % 360000) / 1000.0 - 180.0 AS clon
  FROM names n CROSS JOIN range(3) t(j)),
mentions AS (
  SELECT d.doc_id, n.name_idx, n.name,
         {GEO_LAT_SQL.replace('doc_id', 'd.doc_id')} AS lat,
         {GEO_LON_SQL.replace('doc_id', 'd.doc_id')} AS lon
  FROM documents d CROSS JOIN names n
  WHERE regexp_matches(d.text, '\\b' || n.name || '\\b')),
scored AS (
  SELECT m.doc_id, m.name, c.cand_id,
         (m.lat - c.clat) * (m.lat - c.clat)
           + (m.lon - c.clon) * (m.lon - c.clon) AS d2,
         ROW_NUMBER() OVER (PARTITION BY m.doc_id, m.name_idx
                            ORDER BY (m.lat - c.clat) * (m.lat - c.clat)
                                     + (m.lon - c.clon) * (m.lon - c.clon),
                                     c.cand_id) AS rn
  FROM mentions m JOIN cands c ON c.name_idx = m.name_idx)
SELECT doc_id, name, cand_id,
       CAST(FLOOR(d2 * 1000000.0) AS BIGINT) AS d2_micro
FROM scored WHERE rn = 1
"""


_QT_LMAX = 8  # quadtree max depth (2^8 x 2^8 finest grid)
_QT_T = 64  # split threshold: a cell splits iff its count exceeds this


def geo_quadtree(sf_dir: str):
    """ADAPTIVE QUADTREE AGGREGATION: the classic adaptive spatial-index
    build — the world splits into 4 recursively wherever a cell holds more
    than T documents (dense metros descend to fine cells, oceans stay one
    coarse cell), capped at depth {LMAX}. Output = occupied LEAF cells with
    counts (a leaf is reachable through an all-split ancestor chain and
    itself doesn't split; equivalently each point's leaf level is its
    SMALLEST level whose cell count <= T, capped). Scale design: the whole
    pyramid is bounded by GEOMETRY, not the corpus (sum 4^L, L<=8 = ~87k
    cells), so the plan is ONE distributed count pass at the finest level
    (integer milli-degree cell math, packed-u64 count_by_u64 combiner —
    rows never shuffle, distinct cells do) + a driver-side dense numpy
    pyramid fold (reshape block-sums up, reachability masks down) — the
    adaptive sibling of stages/tiles.py's fixed-depth rollup, same
    bounded-driver contract as doc_quality_buckets' histogram. All-integer
    arithmetic end-to-end: no float enters the cell index, so the oracle
    mirrors exactly with BIGINT division."""
    from core_ray.stages.agg import count_by_u64

    side = 1 << _QT_LMAX
    ds = _read(sf_dir, "documents", ["doc_id"])

    def finest(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mlat = (doc_id * 7919) % 140000
        mlon = (doc_id * 104729) % 360000
        qx = (mlon * side) // 360000
        qy = (mlat * side) // 140000
        return pa.table(
            {"key": pa.array((qx * side + qy).astype(np.uint64), pa.uint64())}
        )

    cells = _collect_table(
        count_by_u64(ds.map_batches(finest, batch_format="pyarrow",
                                    batch_size=131072))
    )  # <= side^2 rows by construction (geometry-bounded)

    key = cells["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = cells["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    grid = np.zeros((side, side), np.int64)  # [qx, qy]
    grid[key // side, key % side] = cnt

    # bottom-up counts: counts[L] is a (2^L, 2^L) array
    counts = [None] * (_QT_LMAX + 1)
    counts[_QT_LMAX] = grid
    for L in range(_QT_LMAX, 0, -1):
        h = 1 << (L - 1)
        counts[L - 1] = (
            counts[L].reshape(h, 2, h, 2).sum(axis=(1, 3))
        )

    # top-down reachability + leaf selection
    out_lvl, out_qx, out_qy, out_n = [], [], [], []
    reach = np.ones((1, 1), bool)
    for L in range(_QT_LMAX + 1):
        c = counts[L]
        leaf = reach & (c > 0) & ((c <= _QT_T) | (L == _QT_LMAX))
        qx, qy = np.nonzero(leaf)
        out_lvl.append(np.full(len(qx), L, np.int64))
        out_qx.append(qx.astype(np.int64))
        out_qy.append(qy.astype(np.int64))
        out_n.append(c[qx, qy])
        if L < _QT_LMAX:
            reach = np.repeat(
                np.repeat(reach & (c > _QT_T), 2, axis=0), 2, axis=1
            )

    return pa.table(
        {
            "level": pa.array(np.concatenate(out_lvl), pa.int64()),
            "qx": pa.array(np.concatenate(out_qx), pa.int64()),
            "qy": pa.array(np.concatenate(out_qy), pa.int64()),
            "n_docs": pa.array(np.concatenate(out_n), pa.int64()),
        }
    ).sort_by([("level", "ascending"), ("qx", "ascending"),
               ("qy", "ascending")])


def _qt_sql() -> str:
    parts = [
        "WITH pts AS (SELECT (doc_id * 7919) % 140000 AS mlat,"
        " (doc_id * 104729) % 360000 AS mlon FROM documents)"
    ]
    for L in range(_QT_LMAX + 1):
        m = 1 << L
        parts.append(
            f", c{L} AS (SELECT (mlon * {m}) // 360000 AS qx,"
            f" (mlat * {m}) // 140000 AS qy, COUNT(*) AS n"
            " FROM pts GROUP BY 1, 2)"
        )
    parts.append(", r0 AS (SELECT * FROM c0)")
    for L in range(1, _QT_LMAX + 1):
        parts.append(
            f", r{L} AS (SELECT c.* FROM c{L} c JOIN r{L-1} p"
            f" ON p.qx = c.qx // 2 AND p.qy = c.qy // 2"
            f" AND p.n > {_QT_T})"
        )
    selects = []
    for L in range(_QT_LMAX + 1):
        cond = f"WHERE n <= {_QT_T}" if L < _QT_LMAX else ""
        selects.append(
            f"SELECT CAST({L} AS BIGINT) AS level, CAST(qx AS BIGINT) AS qx,"
            f" CAST(qy AS BIGINT) AS qy, CAST(n AS BIGINT) AS n_docs"
            f" FROM r{L} {cond}"
        )
    return "".join(parts) + " " + " UNION ALL ".join(selects)


GEO_QUADTREE_SQL = _qt_sql()


_BFS_CELL_MILLI = 5000  # 5-degree BFS grid cells
_BFS_SEED_MOD = 97  # tiles holding a doc_id % 97 == 0 document are sources
_BFS_MAX_HOPS = 24


_GE_CELL_MILLI = 10000  # 10-degree geographic-entropy cells


def doc_source_geo_entropy(sf_dir: str):
    """PER-SOURCE GEOGRAPHIC DISPERSION (Shannon entropy of each crawl
    source's document locations over the 10-deg grid): the "is this feed
    local or global" score a crawl planner uses to route geo-sensitive
    pipelines — entropy 0 = single-cell local site, high = world-spanning
    feed. Two passes: (1) the distinct source list (bounded — sources are
    crawl feeds, not documents) via per-batch-distinct combiner + one tiny
    string groupby; (2) sources broadcast as a sorted array, every batch
    packs (source_idx, cell) into ONE u64 (the multi-column-groupby
    lesson) for count_by_u64 — the result is bounded by sources x 504
    cells at any corpus scale, so the entropy fold runs on the driver.
    Float parity: per-cell c*log2(c) rounds to integer micro-bits
    (sql_round_np == DuckDB ROUND), sums are exact BIGINT, and entropy is
    one fixed double chain shared with the oracle."""
    import ray
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def src_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(b["source"].to_pylist()))
        return pa.table({"source": pa.array(u.tolist(), pa.string()),
                         "one": pa.array(np.ones(len(u), np.int64))})

    src_t = _collect_table(
        ds.select_columns(["source"])
        .map_batches(src_partial, batch_format="pyarrow", batch_size=131072)
        .groupby("source")
        .aggregate(Sum("one", alias_name="n"))
    )
    sources = np.sort(np.asarray(src_t["source"].to_pylist()))
    src_ref = ray.put(sources)

    def pack(b: pa.Table) -> pa.Table:
        srcs = ray.get(src_ref)
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(srcs, np.asarray(b["source"].to_pylist()))
        gx = ((doc_id * 104729) % 360000) // _GE_CELL_MILLI
        gy = ((doc_id * 7919) % 140000) // _GE_CELL_MILLI
        key = (idx.astype(np.uint64) << np.uint64(16)) | (
            (gx * 1024 + gy).astype(np.uint64)
        )
        return pa.table({"key": pa.array(key, pa.uint64())})

    cc_t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= sources x 504 rows by construction
    key = cc_t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = cc_t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    sidx = (key >> np.uint64(16)).astype(np.int64)
    micro = sql_round_np(
        c.astype(np.float64) * np.log2(c.astype(np.float64)) * 1000000.0, 0
    ).astype(np.int64)

    n_src = len(sources)
    n_docs = np.zeros(n_src, np.int64)
    n_cells = np.zeros(n_src, np.int64)
    sum_micro = np.zeros(n_src, np.int64)
    np.add.at(n_docs, sidx, c)
    np.add.at(n_cells, sidx, 1)
    np.add.at(sum_micro, sidx, micro)
    lg = sql_round_np(
        np.log2(n_docs.astype(np.float64)) * 1000000.0, 0
    ).astype(np.int64)
    entropy = lg.astype(np.float64) / 1000000.0 - sum_micro.astype(
        np.float64
    ) / (1000000.0 * n_docs.astype(np.float64))
    return pa.table(
        {
            "source": pa.array(sources.tolist(), pa.string()),
            "n_docs": pa.array(n_docs, pa.int64()),
            "n_cells": pa.array(n_cells, pa.int64()),
            "sum_micro": pa.array(sum_micro, pa.int64()),
            "entropy": pa.array(entropy, pa.float64()),
        }
    )


DOC_SOURCE_GEO_ENTROPY_SQL = f"""
WITH pts AS (
  SELECT source,
         ((doc_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((doc_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy
  FROM documents),
cc AS (SELECT source, gx, gy, COUNT(*) AS c FROM pts GROUP BY 1, 2, 3),
per AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(SUM(CAST(ROUND(CAST(c AS DOUBLE) * LOG2(CAST(c AS DOUBLE))
                             * 1000000.0, 0) AS BIGINT)) AS BIGINT)
           AS sum_micro
  FROM cc GROUP BY 1)
SELECT source, n_docs, n_cells, sum_micro,
       CAST(CAST(ROUND(LOG2(CAST(n_docs AS DOUBLE)) * 1000000.0, 0)
                 AS BIGINT) AS DOUBLE) / 1000000.0
         - CAST(sum_micro AS DOUBLE)
           / (1000000.0 * CAST(n_docs AS DOUBLE)) AS entropy
FROM per
"""


_TT_CELL_MILLI = 10000  # 10-degree trend cells
_TT_DAY_US = 86400000000


def events_tile_trend(sf_dir: str):
    """PER-CELL ACTIVITY TREND (least-squares slope of daily event counts
    per 10-deg cell): the growth/decline detector behind "where is
    activity rising" dashboards and crawl re-visit scheduling. Exactness
    contract: day indexes re-base against the GLOBAL min day (one tiny
    pruned-column aggregate; keeps every moment within int64), the
    (cell, rel_day) daily counts come from ONE packed-u64 count_by_u64
    pass (bounded by cells x time horizon, never the corpus), and the
    driver fold reduces each cell to the four integer moments
    (n, sx, sy, sxy, sxx) — slope = (n*sxy - sx*sy) / (n*sxx - sx*sx) is
    ONE double division of two exact integers, emitted with its exact
    numerator/denominator so the driver hash checks the integer algebra,
    not float luck. Cells seen on a single day are excluded (slope
    undefined)."""
    from ray.data.aggregate import Min

    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def day_of(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"day": pa.array(us // _TT_DAY_US, pa.int64())})

    d0 = int(
        ds.map_batches(day_of, batch_format="pyarrow", batch_size=131072)
        .aggregate(Min("day"))["min(day)"]
    )

    def pack(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        gx = ((eid * 104729) % 360000) // _TT_CELL_MILLI
        gy = ((eid * 7919) % 140000) // _TT_CELL_MILLI
        x = us // _TT_DAY_US - d0
        key = ((gx * 1024 + gy).astype(np.uint64) << np.uint64(24)) | x.astype(
            np.uint64
        )
        return pa.table({"key": pa.array(key, pa.uint64())})

    cd = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= cells x horizon days rows by construction
    key = cd["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    y = cd["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    cell = (key >> np.uint64(24)).astype(np.int64)
    x = (key & np.uint64((1 << 24) - 1)).astype(np.int64)

    order = np.argsort(cell, kind="stable")
    cell, x, y = cell[order], x[order], y[order]
    starts = np.nonzero(np.r_[True, cell[1:] != cell[:-1]])[0]
    n = np.diff(np.r_[starts, len(cell)])
    sx = np.add.reduceat(x, starts)
    sy = np.add.reduceat(y, starts)
    sxy = np.add.reduceat(x * y, starts)
    sxx = np.add.reduceat(x * x, starts)
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    keep = n >= 2  # >= 2 distinct days => den > 0
    ucell = cell[starts]
    return pa.table(
        {
            "gx": pa.array(ucell[keep] // 1024, pa.int64()),
            "gy": pa.array(ucell[keep] % 1024, pa.int64()),
            "n_days": pa.array(n[keep], pa.int64()),
            "total": pa.array(sy[keep], pa.int64()),
            "slope_num": pa.array(num[keep], pa.int64()),
            "slope_den": pa.array(den[keep], pa.int64()),
            "slope": pa.array(
                num[keep].astype(np.float64) / den[keep].astype(np.float64),
                pa.float64(),
            ),
        }
    )


EVENTS_TILE_TREND_SQL = f"""
WITH base AS (
  SELECT MIN(epoch_us(ts) // {_TT_DAY_US}) AS d0 FROM events),
pts AS (
  SELECT ((event_id * 104729) % 360000) // {_TT_CELL_MILLI} AS gx,
         ((event_id * 7919) % 140000) // {_TT_CELL_MILLI} AS gy,
         epoch_us(ts) // {_TT_DAY_US} - base.d0 AS x
  FROM events, base),
cd AS (SELECT gx, gy, x, CAST(COUNT(*) AS BIGINT) AS y
       FROM pts GROUP BY 1, 2, 3),
per AS (
  SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM cd GROUP BY 1, 2)
SELECT gx, gy, n AS n_days, sy AS total,
       n * sxy - sx * sy AS slope_num,
       n * sxx - sx * sx AS slope_den,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
FROM per WHERE n >= 2
"""


_BI_RADIUS = 2.0  # bipartite band radius in degrees


def geo_doc_event_band(sf_dir: str):
    """BIPARTITE DISTANCE-BAND JOIN (documents x events within a radius):
    all (doc, event) pairs closer than 2 deg — the cross-TABLE spatial
    join under "which telemetry happened near which content" analyses
    (distband.py's self-join and stjoin.py's same-table contact join can't
    express two heterogeneous sides). ASYMMETRIC home+ghost plan: the doc
    side emits ONE home replica, the event side replicates to its 3x3
    neighborhood, so every qualifying pair co-locates in exactly the doc's
    home cell and is emitted exactly once — 1x + 9x replication instead of
    the self-join's 9x on everything, ONE hash shuffle total. The
    partition kernel sorts by (cell, side), pairs each cell's doc rows
    against its event rows with repeat/offset-arange expansion (chunked
    against dense cells), and filters on the exact mirrored sq_dist
    chain."""
    import ray

    from core_ray.stages.agg import map_groups_partitioned

    r = _BI_RADIUS
    r2 = r * r

    docs = _read(sf_dir, "documents", ["doc_id"])
    evs = _read(sf_dir, "events", ["event_id"])

    def doc_rep(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(doc_id)
        cx = np.floor(lat / r).astype(np.int64) + (1 << 20)
        cy = np.floor(lon / r).astype(np.int64) + (1 << 20)
        return pa.table(
            {
                "ck": pa.array(
                    (cx.astype(np.uint64) << np.uint64(21))
                    | cy.astype(np.uint64),
                    pa.uint64(),
                ),
                "side": pa.array(np.zeros(len(doc_id), np.int8), pa.int8()),
                "id": pa.array(doc_id, pa.int64()),
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )

    def ev_rep(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(eid)
        cx = np.floor(lat / r).astype(np.int64)
        cy = np.floor(lon / r).astype(np.int64)
        n = len(eid)
        dx = np.array([0, -1, -1, -1, 0, 0, 1, 1, 1], dtype=np.int64)
        dy = np.array([0, -1, 0, 1, -1, 1, -1, 0, 1], dtype=np.int64)
        rcx = (np.repeat(cx, 9) + np.tile(dx, n) + (1 << 20)).astype(np.uint64)
        rcy = (np.repeat(cy, 9) + np.tile(dy, n) + (1 << 20)).astype(np.uint64)
        return pa.table(
            {
                "ck": pa.array(
                    (rcx << np.uint64(21)) | rcy, pa.uint64()
                ),
                "side": pa.array(np.ones(9 * n, np.int8), pa.int8()),
                "id": pa.array(np.repeat(eid, 9), pa.int64()),
                "lat": pa.array(np.repeat(lat, 9), pa.float64()),
                "lon": pa.array(np.repeat(lon, 9), pa.float64()),
            }
        )

    rep = docs.map_batches(doc_rep, batch_format="pyarrow",
                           batch_size=65536).union(
        evs.map_batches(ev_rep, batch_format="pyarrow", batch_size=65536)
    )

    _empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "event_id": pa.array([], pa.int64()),
            "sq_dist": pa.array([], pa.float64()),
        }
    )

    def per_part(g: pa.Table, chunk_pairs: int = 8 << 20) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        key = g["ck"].to_numpy(zero_copy_only=False).astype(np.uint64)
        side = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))
        key, side = key[order], side[order]
        ids = g["id"].to_numpy(zero_copy_only=False)[order]
        lat = g["lat"].to_numpy(zero_copy_only=False)[order]
        lon = g["lon"].to_numpy(zero_copy_only=False)[order]
        n = len(key)
        new = np.ones(n, dtype=bool)
        new[1:] = key[1:] != key[:-1]
        seg_id = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        seg_end = np.append(starts[1:], n)
        # docs come first within a segment (side sorts 0 before 1)
        didx = np.nonzero(side == 0)[0]
        if len(didx) == 0:
            return _empty
        dseg = seg_id[didx]
        # events of segment s occupy [starts[s] + doc_cnt[s], seg_end[s])
        doc_cnt = np.zeros(len(starts), np.int64)
        np.add.at(doc_cnt, dseg, 1)
        ev_lo = starts + doc_cnt  # first event row per segment
        ne = (seg_end - ev_lo)[dseg]  # events per doc row
        out = []
        cum = np.cumsum(ne)
        chunk = cum // chunk_pairs
        for c in np.unique(chunk):
            m = chunk == c
            di = didx[m]
            k = ne[m]
            if k.sum() == 0:
                continue
            left = np.repeat(di, k)
            off = np.concatenate([[0], np.cumsum(k)])[:-1]
            right = (
                np.arange(k.sum()) - np.repeat(off, k)
                + np.repeat(ev_lo[dseg[m]], k)
            )
            dla = lat[left] - lat[right]
            dlo = lon[left] - lon[right]
            d2 = dla * dla + dlo * dlo
            ok = d2 <= r2
            if ok.any():
                out.append(
                    pa.table(
                        {
                            "doc_id": pa.array(
                                ids[left][ok].astype(np.int64), pa.int64()
                            ),
                            "event_id": pa.array(
                                ids[right][ok].astype(np.int64), pa.int64()
                            ),
                            "sq_dist": pa.array(d2[ok], pa.float64()),
                        }
                    )
                )
        return pa.concat_tables(out) if out else _empty

    return map_groups_partitioned(rep, "ck", per_part)


GEO_DOC_EVENT_BAND_SQL = f"""
WITH d AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
e AS (
  SELECT event_id,
         {GEO_LAT_SQL.replace('doc_id', 'event_id')} AS lat,
         {GEO_LON_SQL.replace('doc_id', 'event_id')} AS lon FROM events)
SELECT d.doc_id, e.event_id,
       (d.lat - e.lat) * (d.lat - e.lat)
         + (d.lon - e.lon) * (d.lon - e.lon) AS sq_dist
FROM d JOIN e
  ON e.lat BETWEEN d.lat - {_BI_RADIUS} AND d.lat + {_BI_RADIUS}
 AND e.lon BETWEEN d.lon - {_BI_RADIUS} AND d.lon + {_BI_RADIUS}
WHERE (d.lat - e.lat) * (d.lat - e.lat)
        + (d.lon - e.lon) * (d.lon - e.lon) <= {_BI_RADIUS * _BI_RADIUS}
"""


def events_gyration(sf_dir: str):
    """PER-USER RADIUS OF GYRATION (the canonical human-mobility dispersion
    metric — Gonzalez et al.'s Nature 2008 measure: RMS distance of a
    user's points from their own centroid; commuters score low, travelers
    high). Exactness via the moment identity sum((p-c)^2) =
    sum(p^2) - n*c^2, so rog^2 = (n*(Sxx+Syy) - Sx^2 - Sy^2) / n^2 over
    INTEGER milli-degree moments — per-batch combiner reduces each batch
    to per-user (n, Sx, Sy, Sxx, Syy) partials (np.unique + reduceat),
    ONE user-keyed shuffle sums them, and rog is one correctly-rounded
    SQRT of one exact int/int division (emitted with its integer
    numerator/denominator so the hash checks the algebra). int64 bound:
    Sx^2 <= (n * 360000)^2 — safe to ~25M events per user; beyond that the
    moments widen to two-limb accumulators (documented hatch)."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def partial(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (eid * 104729) % 360000
        y = (eid * 7919) % 140000
        order = np.argsort(uid, kind="stable")
        uid, x, y = uid[order], x[order], y[order]
        starts = np.nonzero(np.r_[True, uid[1:] != uid[:-1]])[0]
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "n": pa.array(
                    np.diff(np.r_[starts, len(uid)]).astype(np.int64),
                    pa.int64(),
                ),
                "sx": pa.array(np.add.reduceat(x, starts), pa.int64()),
                "sy": pa.array(np.add.reduceat(y, starts), pa.int64()),
                "sxx": pa.array(np.add.reduceat(x * x, starts), pa.int64()),
                "syy": pa.array(np.add.reduceat(y * y, starts), pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=131072)

    def reduce_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "rog_num": pa.array([], pa.int64()),
                    "rog_den": pa.array([], pa.int64()),
                    "rog_deg": pa.array([], pa.float64()),
                }
            )
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(uid, kind="stable")
        uid = uid[order]
        starts = np.nonzero(np.r_[True, uid[1:] != uid[:-1]])[0]
        cols = {
            c: np.add.reduceat(
                g[c].to_numpy(zero_copy_only=False).astype(np.int64)[order],
                starts,
            )
            for c in ("n", "sx", "sy", "sxx", "syy")
        }
        n = cols["n"]
        num = n * (cols["sxx"] + cols["syy"]) - cols["sx"] ** 2 - cols["sy"] ** 2
        den = n * n
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "n_events": pa.array(n, pa.int64()),
                "rog_num": pa.array(num, pa.int64()),
                "rog_den": pa.array(den, pa.int64()),
                "rog_deg": pa.array(
                    np.sqrt(num.astype(np.float64) / den.astype(np.float64))
                    / 1000.0,
                    pa.float64(),
                ),
            }
        )

    return map_groups_partitioned(partials, "user_id", reduce_part)


EVENTS_GYRATION_SQL = """
WITH pts AS (
  SELECT user_id, (event_id * 104729) % 360000 AS x,
         (event_id * 7919) % 140000 AS y FROM events),
per AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pts GROUP BY 1)
SELECT user_id, n AS n_events,
       n * (sxx + syy) - sx * sx - sy * sy AS rog_num,
       n * n AS rog_den,
       SQRT(CAST(n * (sxx + syy) - sx * sx - sy * sy AS DOUBLE)
            / CAST(n * n AS DOUBLE)) / 1000.0 AS rog_deg
FROM per
"""


def doc_lang_dissimilarity(sf_dir: str):
    """SPATIAL SEGREGATION (Duncan-Duncan dissimilarity index D) for every
    language pair over the 10-deg grid — the demography-standard "how
    differently are two groups distributed" score (0 = identical spatial
    mix, 1 = full separation), here measuring whether two languages'
    documents occupy different regions. Exactness: the textbook
    D = 0.5 * sum|c_a/A - c_b/B| is all float traps; cross-multiplying
    gives per-cell INTEGER terms |c_a*B - c_b*A| and
    D = sum / (2*A*B) — ONE double division of two exact integers. Plan:
    distinct langs (bounded) -> broadcast sorted -> (lang_idx, cell)
    packed u64 count pass (bounded result: langs x 504) -> driver dense
    fold over all pairs. int64 bound: c*total <= N^2 — safe to ~3e9 docs
    per language; the driver fold widens to Python ints beyond
    (documented hatch)."""
    import ray
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def lang_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(b["lang"].to_pylist()))
        return pa.table({"lang": pa.array(u.tolist(), pa.string()),
                         "one": pa.array(np.ones(len(u), np.int64))})

    lang_t = _collect_table(
        ds.select_columns(["lang"])
        .map_batches(lang_partial, batch_format="pyarrow", batch_size=131072)
        .groupby("lang")
        .aggregate(Sum("one", alias_name="n"))
    )
    langs = np.sort(np.asarray(lang_t["lang"].to_pylist()))
    lang_ref = ray.put(langs)

    def pack(b: pa.Table) -> pa.Table:
        ls = ray.get(lang_ref)
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(ls, np.asarray(b["lang"].to_pylist()))
        gx = ((doc_id * 104729) % 360000) // _GE_CELL_MILLI
        gy = ((doc_id * 7919) % 140000) // _GE_CELL_MILLI
        key = (idx.astype(np.uint64) << np.uint64(16)) | (
            (gx * 1024 + gy).astype(np.uint64)
        )
        return pa.table({"key": pa.array(key, pa.uint64())})

    cc_t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= langs x 504 rows by construction
    key = cc_t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = cc_t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    lidx = (key >> np.uint64(16)).astype(np.int64)
    cell = (key & np.uint64((1 << 16) - 1)).astype(np.int64)
    cells = np.unique(cell)
    dense = np.zeros((len(langs), len(cells)), np.int64)
    dense[lidx, np.searchsorted(cells, cell)] = c
    totals = dense.sum(axis=1)

    la, lb, num, den = [], [], [], []
    for a in range(len(langs)):
        for b_ in range(a + 1, len(langs)):
            t = np.abs(
                dense[a] * totals[b_] - dense[b_] * totals[a]
            ).sum()
            la.append(langs[a])
            lb.append(langs[b_])
            num.append(int(t))
            den.append(int(2 * totals[a] * totals[b_]))
    num_a = np.asarray(num, np.int64)
    den_a = np.asarray(den, np.int64)
    return pa.table(
        {
            "lang_a": pa.array(la, pa.string()),
            "lang_b": pa.array(lb, pa.string()),
            "num": pa.array(num_a, pa.int64()),
            "den": pa.array(den_a, pa.int64()),
            "dissimilarity": pa.array(
                num_a.astype(np.float64) / den_a.astype(np.float64),
                pa.float64(),
            ),
        }
    )


DOC_LANG_DISSIMILARITY_SQL = f"""
WITH pts AS (
  SELECT lang,
         ((doc_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((doc_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy
  FROM documents),
cc AS (SELECT lang, gx, gy, CAST(COUNT(*) AS BIGINT) AS c
       FROM pts GROUP BY 1, 2, 3),
tot AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS t FROM cc GROUP BY 1),
pairs AS (
  SELECT a.lang AS la, b.lang AS lb, a.t AS ta, b.t AS tb
  FROM tot a JOIN tot b ON a.lang < b.lang),
cells AS (SELECT DISTINCT gx, gy FROM cc),
terms AS (
  SELECT p.la, p.lb, p.ta, p.tb,
         ABS(COALESCE(a.c, 0) * p.tb - COALESCE(b.c, 0) * p.ta) AS term
  FROM pairs p CROSS JOIN cells ce
  LEFT JOIN cc a ON a.lang = p.la AND a.gx = ce.gx AND a.gy = ce.gy
  LEFT JOIN cc b ON b.lang = p.lb AND b.gx = ce.gx AND b.gy = ce.gy)
SELECT la AS lang_a, lb AS lang_b,
       CAST(SUM(term) AS BIGINT) AS num,
       2 * ta * tb AS den,
       CAST(CAST(SUM(term) AS BIGINT) AS DOUBLE)
         / CAST(2 * ta * tb AS DOUBLE) AS dissimilarity
FROM terms GROUP BY la, lb, ta, tb
"""


def events_user_entropy(sf_dir: str):
    """PER-USER LOCATION ENTROPY (the mobility-predictability measure of
    Song et al.: Shannon entropy of each user's visit distribution over
    10-deg cells — low = routine commuter, high = unpredictable roamer).
    The per-USER sibling of doc_source_geo_entropy with one crucial scale
    difference: users are UNBOUNDED (corpus-scale key), so the entropy
    fold runs DISTRIBUTED inside the partition kernel, never on the
    driver — one user-keyed hash shuffle, per-partition double reduceat
    ((user, cell) counts, then per-user moments). Float parity: per-cell
    c*log2(c) rounds to integer micro-bits (sql_round_np == DuckDB
    ROUND), sums are exact BIGINT, entropy is one fixed double chain."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "n_cells": pa.array([], pa.int64()),
            "sum_micro": pa.array([], pa.int64()),
            "entropy": pa.array([], pa.float64()),
        }
    )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx = ((eid * 104729) % 360000) // _GE_CELL_MILLI
        gy = ((eid * 7919) % 140000) // _GE_CELL_MILLI
        cell = gx * 1024 + gy
        order = np.lexsort((cell, uid))
        uid, cell = uid[order], cell[order]
        # (user, cell) counts
        newc = np.r_[True, (uid[1:] != uid[:-1]) | (cell[1:] != cell[:-1])]
        cstarts = np.nonzero(newc)[0]
        c = np.diff(np.r_[cstarts, len(uid)]).astype(np.int64)
        cuid = uid[cstarts]
        micro = sql_round_np(
            c.astype(np.float64) * np.log2(c.astype(np.float64)) * 1000000.0,
            0,
        ).astype(np.int64)
        # per-user moments over the (user, cell) rows
        ustarts = np.nonzero(np.r_[True, cuid[1:] != cuid[:-1]])[0]
        n_cells = np.diff(np.r_[ustarts, len(cuid)]).astype(np.int64)
        n = np.add.reduceat(c, ustarts)
        sm = np.add.reduceat(micro, ustarts)
        lg = sql_round_np(
            np.log2(n.astype(np.float64)) * 1000000.0, 0
        ).astype(np.int64)
        entropy = lg.astype(np.float64) / 1000000.0 - sm.astype(
            np.float64
        ) / (1000000.0 * n.astype(np.float64))
        return pa.table(
            {
                "user_id": pa.array(cuid[ustarts], pa.int64()),
                "n_events": pa.array(n, pa.int64()),
                "n_cells": pa.array(n_cells, pa.int64()),
                "sum_micro": pa.array(sm, pa.int64()),
                "entropy": pa.array(entropy, pa.float64()),
            }
        )

    return map_groups_partitioned(ds, "user_id", per_part)


EVENTS_USER_ENTROPY_SQL = f"""
WITH pts AS (
  SELECT user_id,
         ((event_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((event_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy
  FROM events),
cc AS (SELECT user_id, gx, gy, COUNT(*) AS c FROM pts GROUP BY 1, 2, 3),
per AS (
  SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
         CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(SUM(CAST(ROUND(CAST(c AS DOUBLE) * LOG2(CAST(c AS DOUBLE))
                             * 1000000.0, 0) AS BIGINT)) AS BIGINT)
           AS sum_micro
  FROM cc GROUP BY 1)
SELECT user_id, n_events, n_cells, sum_micro,
       CAST(CAST(ROUND(LOG2(CAST(n_events AS DOUBLE)) * 1000000.0, 0)
                 AS BIGINT) AS DOUBLE) / 1000000.0
         - CAST(sum_micro AS DOUBLE)
           / (1000000.0 * CAST(n_events AS DOUBLE)) AS entropy
FROM per
"""


_GT_CELL_MILLI = 30000  # 30-degree tf-idf regions
_GT_MIN_SUP = 3  # a token needs >= this many regional occurrences
_GT_K = 5  # distinctive tokens reported per region


def doc_geo_tfidf(sf_dir: str):
    """REGIONALLY DISTINCTIVE VOCABULARY (geo tf-idf / lift): for every
    30-deg region, the top-{K} tokens most over-represented there vs the
    whole corpus — lift(w,r) = (c_rw/c_r)/(c_w/N) — the "what does this
    region talk about" operator behind local-intent search and dialect
    mapping. Plan (the doc_vocab_top20 shape, regionalized): per-batch
    (token, region) count combiner, hash-partition by TOKEN so each
    partition's (token, region) sums AND per-token global c_w are exact
    locally; region totals + N come from a separate cheap integer pass
    (bounded: 60 regions) and ride the closure. Per-partition top-{K}
    per region prune (safe: global top-k per region ⊆ union of local
    top-ks), bounded driver merge. Float parity: lift is ONE fixed
    double chain ((c_rw*N)/(c_r*c_w), casts mirrored), ordered with the
    token tie-break on both sides."""
    from core_ray.stages.agg import _GOLD, _n_parts, hash_strings, sum_by_u64

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_parts = _n_parts()

    def region_of(doc_id: np.ndarray) -> np.ndarray:
        gx = ((doc_id * 104729) % 360000) // _GT_CELL_MILLI
        gy = ((doc_id * 7919) % 140000) // _GT_CELL_MILLI
        return gx * 16 + gy

    # pass 1: region token totals (bounded) + N
    def rt_partial(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = np.asarray(
            [len(t.split(" ")) for t in b["text"].to_pylist()], np.int64
        )
        reg = region_of(doc_id)
        u = np.unique(reg)
        sums = np.zeros(len(u), np.int64)
        np.add.at(sums, np.searchsorted(u, reg), ntok)
        return pa.table(
            {"key": pa.array(u.astype(np.uint64), pa.uint64()),
             "n": pa.array(sums, pa.int64())}
        )

    rt = _collect_table(
        sum_by_u64(
            ds.map_batches(rt_partial, batch_format="pyarrow",
                           batch_size=65536),
            "key", "n",
        )
    )
    c_r = np.zeros(16 * 16, np.int64)
    c_r[rt["key"].to_numpy(zero_copy_only=False).astype(np.int64)] = (
        rt["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    n_total = float(c_r.sum())

    # pass 2: (token, region) counts, partitioned by token
    def count_partial(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = b["text"].to_pylist()
        toks = np.asarray([w for t in texts for w in t.split(" ")])
        if len(toks) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "region": pa.array([], pa.int64()),
                 "c": pa.array([], pa.int64()),
                 "__part": pa.array([], pa.int32())}
            )
        reg = np.repeat(
            region_of(doc_id),
            np.asarray([len(t.split(" ")) for t in texts], np.int64),
        )
        vocab, inv = np.unique(toks, return_inverse=True)
        key = inv.astype(np.int64) * 256 + reg
        u, cnt = np.unique(key, return_counts=True)
        ut = vocab[u // 256]
        h = hash_strings(pa.array(ut, pa.string()))
        return pa.table(
            {
                "token": pa.array(ut, pa.string()),
                "region": pa.array(u % 256, pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
                "__part": pa.array(
                    ((h * _GOLD) % np.uint64(n_parts)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    def reduce_part(g: pa.Table) -> pa.Table:
        toks = np.asarray(g["token"].to_pylist())
        reg = g["region"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((reg, toks))
        toks, reg, c = toks[order], reg[order], c[order]
        new = np.r_[True, (toks[1:] != toks[:-1]) | (reg[1:] != reg[:-1])]
        starts = np.nonzero(new)[0]
        c_rw = np.add.reduceat(c, starts)
        toks, reg = toks[starts], reg[starts]
        # per-token global counts (this partition owns its tokens fully)
        tnew = np.r_[True, toks[1:] != toks[:-1]]
        tid = np.cumsum(tnew) - 1
        c_w = np.zeros(tid[-1] + 1, np.int64)
        np.add.at(c_w, tid, c_rw)
        c_w = c_w[tid]
        keep = c_rw >= _GT_MIN_SUP
        toks, reg, c_rw, c_w = toks[keep], reg[keep], c_rw[keep], c_w[keep]
        if len(toks) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "region": pa.array([], pa.int64()),
                 "n_rw": pa.array([], pa.int64()),
                 "n_w": pa.array([], pa.int64()),
                 "lift": pa.array([], pa.float64())}
            )
        lift = (c_rw.astype(np.float64) * n_total) / (
            c_r[reg].astype(np.float64) * c_w.astype(np.float64)
        )
        order = np.lexsort((toks, -lift, reg))
        rank = np.arange(len(order)) - np.searchsorted(
            reg[order], reg[order]
        )  # position within region run
        top = order[rank < _GT_K]
        return pa.table(
            {
                "token": pa.array(toks[top], pa.string()),
                "region": pa.array(reg[top], pa.int64()),
                "n_rw": pa.array(c_rw[top], pa.int64()),
                "n_w": pa.array(c_w[top], pa.int64()),
                "lift": pa.array(lift[top], pa.float64()),
            }
        )

    pruned = _collect_table(
        ds.map_batches(count_partial, batch_format="pyarrow",
                       batch_size=65536)
        .groupby("__part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )  # <= n_parts x regions x K rows by construction
    toks = np.asarray(pruned["token"].to_pylist())
    reg = pruned["region"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_rw = pruned["n_rw"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_w = pruned["n_w"].to_numpy(zero_copy_only=False).astype(np.int64)
    lift = pruned["lift"].to_numpy(zero_copy_only=False)
    order = np.lexsort((toks, -lift, reg))
    pos = np.arange(len(order)) - np.searchsorted(reg[order], reg[order])
    top = order[pos < _GT_K]
    return pa.table(
        {
            "gx": pa.array(reg[top] // 16, pa.int64()),
            "gy": pa.array(reg[top] % 16, pa.int64()),
            "token": pa.array(toks[top], pa.string()),
            "n_rw": pa.array(n_rw[top], pa.int64()),
            "n_w": pa.array(n_w[top], pa.int64()),
            "lift": pa.array(lift[top], pa.float64()),
        }
    )


DOC_GEO_TFIDF_SQL = f"""
WITH toks AS (
  SELECT ((doc_id * 104729) % 360000) // {_GT_CELL_MILLI} AS gx,
         ((doc_id * 7919) % 140000) // {_GT_CELL_MILLI} AS gy,
         UNNEST(string_split(text, ' ')) AS w
  FROM documents),
rw AS (SELECT gx, gy, w, CAST(COUNT(*) AS BIGINT) AS c
       FROM toks GROUP BY 1, 2, 3),
wt AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM rw GROUP BY 1),
rt AS (SELECT gx, gy, CAST(SUM(c) AS BIGINT) AS cr FROM rw GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM rw),
scored AS (
  SELECT rw.gx, rw.gy, rw.w, rw.c, wt.cw,
         (CAST(rw.c AS DOUBLE) * CAST(tot.n AS DOUBLE))
           / (CAST(rt.cr AS DOUBLE) * CAST(wt.cw AS DOUBLE)) AS lift
  FROM rw JOIN wt USING (w)
  JOIN rt ON rt.gx = rw.gx AND rt.gy = rw.gy CROSS JOIN tot
  WHERE rw.c >= {_GT_MIN_SUP}),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY gx, gy
                               ORDER BY lift DESC, w) AS rn
  FROM scored)
SELECT gx, gy, w AS token, c AS n_rw, cw AS n_w, lift
FROM ranked WHERE rn <= {_GT_K}
"""


def events_jump_lengths(sf_dir: str):
    """JUMP-LENGTH DISTRIBUTION (the displacement histogram of human
    mobility — the truncated-power-law curve of Brockmann/Gonzalez: how
    far do consecutive events move?): per travel leg, the great-circle km
    (geo_traj_stats' FLOOR-quantized haversine contract) dropped into
    log2 bins, counted corpus-wide. Binning is PURE INTEGER — bin =
    bit_length(km) (np.frexp exponent, no libm log2 anywhere; the SQL
    mirror is LENGTH(BIN(km))) — so there is no boundary-ULP caveat at
    the power-of-two edges. One user-keyed shuffle; the partition kernel
    reduces its legs straight to (bin, n, sum_km) partials (<= ~16 bins),
    and the bounded driver fold sums partitions."""
    from core_ray.stages.agg import map_groups_partitioned
    from core_ray.stages.distband import haversine_km

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    _empty = pa.table(
        {
            "bin": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
        }
    )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, us, uid))
        uid, eid = uid[order], eid[order]
        lat, lon = _derive_coords(eid)
        leg = np.zeros(len(uid), dtype=bool)
        leg[1:] = uid[1:] == uid[:-1]
        i = np.nonzero(leg)[0]
        if len(i) == 0:
            return _empty
        km = np.floor(
            haversine_km(lat[i - 1], lon[i - 1], lat[i], lon[i])
        ).astype(np.int64)
        b = np.where(km > 0, np.frexp(km.astype(np.float64))[1], 0).astype(
            np.int64
        )
        u = np.unique(b)
        n = np.zeros(len(u), np.int64)
        s = np.zeros(len(u), np.int64)
        pos = np.searchsorted(u, b)
        np.add.at(n, pos, 1)
        np.add.at(s, pos, km)
        return pa.table(
            {
                "bin": pa.array(u, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "s": pa.array(s, pa.int64()),
            }
        )

    t = _collect_table(
        map_groups_partitioned(ds, "user_id", per_part)
    )  # <= partitions x ~16 bins by construction
    b = t["bin"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    u = np.unique(b)
    pos = np.searchsorted(u, b)
    nn = np.zeros(len(u), np.int64)
    ss = np.zeros(len(u), np.int64)
    np.add.at(nn, pos, n)
    np.add.at(ss, pos, s)
    return pa.table(
        {
            "bin": pa.array(u, pa.int64()),
            "n_legs": pa.array(nn, pa.int64()),
            "sum_km": pa.array(ss, pa.int64()),
        }
    )


EVENTS_JUMP_LENGTHS_SQL = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         {GEO_LAT_SQL.replace('doc_id', 'event_id')} AS lat,
         {GEO_LON_SQL.replace('doc_id', 'event_id')} AS lon FROM events),
legs AS (
  SELECT user_id,
         LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon, lat, lon
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
km AS (
  SELECT CAST(FLOOR(
    2.0 * 6371.0088 * ASIN(SQRT(
      SIN(RADIANS(lat - plat) / 2.0) * SIN(RADIANS(lat - plat) / 2.0)
      + COS(RADIANS(plat)) * COS(RADIANS(lat))
        * SIN(RADIANS(lon - plon) / 2.0) * SIN(RADIANS(lon - plon) / 2.0)
    ))) AS BIGINT) AS k
  FROM legs WHERE plat IS NOT NULL)
SELECT CASE WHEN k = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(LENGTH(BIN(k)) AS BIGINT) END AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_legs,
       CAST(SUM(k) AS BIGINT) AS sum_km
FROM km GROUP BY 1
"""


def events_msd(sf_dir: str):
    """MEAN SQUARED DISPLACEMENT vs elapsed time (the diffusion curve of
    mobility science — subdiffusive MSD saturation is THE signature of
    human returners vs Levy walkers): for every event, the squared
    displacement from its user's FIRST event, bucketed by elapsed hours
    and averaged corpus-wide. ALL-INTEGER: displacement in milli-degrees
    so d2 = dx^2 + dy^2 is exact int64, hour lag is integer division —
    msd is one double division of two exact sums per lag. One user-keyed
    shuffle; the partition kernel finds each user's anchor (min (ts,
    event_id) — already the partition sort order), reduces to (lag, n,
    sum_d2) partials (bounded by the time horizon), bounded driver
    fold."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    _empty = pa.table(
        {
            "lag": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
            "s": pa.array([], pa.int64()),
        }
    )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, us, uid))
        uid, us, eid = uid[order], us[order], eid[order]
        x = (eid * 104729) % 360000
        y = (eid * 7919) % 140000
        starts = np.nonzero(np.r_[True, uid[1:] != uid[:-1]])[0]
        runlen = np.diff(np.r_[starts, len(uid)])
        first = np.repeat(starts, runlen)
        dx = x - x[first]
        dy = y - y[first]
        d2 = dx * dx + dy * dy
        lag = (us - us[first]) // 3600000000
        u = np.unique(lag)
        pos = np.searchsorted(u, lag)
        n = np.zeros(len(u), np.int64)
        s = np.zeros(len(u), np.int64)
        np.add.at(n, pos, 1)
        np.add.at(s, pos, d2)
        return pa.table(
            {
                "lag": pa.array(u, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "s": pa.array(s, pa.int64()),
            }
        )

    t = _collect_table(
        map_groups_partitioned(ds, "user_id", per_part)
    )  # <= partitions x horizon-hours rows by construction
    lag = t["lag"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    u = np.unique(lag)
    pos = np.searchsorted(u, lag)
    nn = np.zeros(len(u), np.int64)
    ss = np.zeros(len(u), np.int64)
    np.add.at(nn, pos, n)
    np.add.at(ss, pos, s)
    return pa.table(
        {
            "lag_h": pa.array(u, pa.int64()),
            "n_events": pa.array(nn, pa.int64()),
            "sum_d2": pa.array(ss, pa.int64()),
            "msd": pa.array(
                ss.astype(np.float64) / nn.astype(np.float64), pa.float64()
            ),
        }
    )


EVENTS_MSD_SQL = """
WITH pts AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         (event_id * 104729) % 360000 AS x,
         (event_id * 7919) % 140000 AS y
  FROM events),
anch AS (
  SELECT user_id, x, y, us,
         FIRST_VALUE(x) OVER w AS x0, FIRST_VALUE(y) OVER w AS y0,
         FIRST_VALUE(us) OVER w AS us0
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
d AS (
  SELECT (us - us0) // 3600000000 AS lag_h,
         (x - x0) * (x - x0) + (y - y0) * (y - y0) AS d2
  FROM anch)
SELECT lag_h, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(d2) AS BIGINT) AS sum_d2,
       CAST(CAST(SUM(d2) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS msd
FROM d GROUP BY 1
"""


def events_return_times(sf_dir: str):
    """RETURN-TIME DISTRIBUTION (the third canonical mobility statistic
    beside jump lengths and MSD — the peaked return-time spectrum is how
    Song et al. quantify human periodicity): for every revisit of a
    10-deg cell by the same user, the hours since that user's PREVIOUS
    visit to that same cell, counted into an hour histogram. ALL-INTEGER
    (epoch-microsecond difference, integer-division hours). One
    user-keyed shuffle; the partition kernel sorts (user, cell, ts,
    event_id), takes consecutive same-(user,cell) deltas, reduces to
    (lag_h, n) partials; horizon-bounded driver fold."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    _empty = pa.table(
        {"lag": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
    )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx = ((eid * 104729) % 360000) // _GE_CELL_MILLI
        gy = ((eid * 7919) % 140000) // _GE_CELL_MILLI
        cell = gx * 1024 + gy
        order = np.lexsort((eid, us, cell, uid))
        uid, us, cell = uid[order], us[order], cell[order]
        same = np.zeros(len(uid), dtype=bool)
        same[1:] = (uid[1:] == uid[:-1]) & (cell[1:] == cell[:-1])
        i = np.nonzero(same)[0]
        if len(i) == 0:
            return _empty
        lag = (us[i] - us[i - 1]) // 3600000000
        u, c = np.unique(lag, return_counts=True)
        return pa.table(
            {
                "lag": pa.array(u, pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    t = _collect_table(
        map_groups_partitioned(ds, "user_id", per_part)
    )  # <= partitions x horizon-hours rows by construction
    lag = t["lag"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    u = np.unique(lag)
    nn = np.zeros(len(u), np.int64)
    np.add.at(nn, np.searchsorted(u, lag), n)
    return pa.table(
        {
            "lag_h": pa.array(u, pa.int64()),
            "n_returns": pa.array(nn, pa.int64()),
        }
    )


EVENTS_RETURN_TIMES_SQL = f"""
WITH pts AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         ((event_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((event_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy
  FROM events),
lagged AS (
  SELECT us - LAG(us) OVER (PARTITION BY user_id, gx, gy
                            ORDER BY us, event_id) AS dt
  FROM pts)
SELECT dt // 3600000000 AS lag_h, CAST(COUNT(*) AS BIGINT) AS n_returns
FROM lagged WHERE dt IS NOT NULL GROUP BY 1
"""


def geo_cell_turnover(sf_dir: str):
    """SPATIAL-FOOTPRINT TURNOVER: day-over-day Jaccard similarity of the
    set of ACTIVE 10-deg cells (cells with >= 1 event) — "how much does
    the active map move between consecutive days", the drift monitor a
    crawl/telemetry operator watches for coverage regressions. ONE
    distributed pass reduces the corpus to distinct (day, cell) pairs
    (packed-u64 count_by_u64 — bounded by horizon x 504 at any corpus
    scale), then the driver folds consecutive-day set algebra exactly:
    jaccard = |A∩B| / |A∪B|, one double division of two exact integer
    cardinalities."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def pack(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        gx = ((eid * 104729) % 360000) // _GE_CELL_MILLI
        gy = ((eid * 7919) % 140000) // _GE_CELL_MILLI
        day = us // _TT_DAY_US
        key = (day.astype(np.uint64) << np.uint64(20)) | (
            (gx * 1024 + gy).astype(np.uint64)
        )
        return pa.table({"key": pa.array(key, pa.uint64())})

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= horizon-days x 504 rows by construction
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    day = (key >> np.uint64(20)).astype(np.int64)
    cell = (key & np.uint64((1 << 20) - 1)).astype(np.int64)
    days = np.unique(day)
    sets = {int(d): set(cell[day == d].tolist()) for d in days}
    rows = []
    for d in days:
        if int(d) + 1 not in sets:
            continue
        a, b = sets[int(d)], sets[int(d) + 1]
        inter, union = len(a & b), len(a | b)
        rows.append((int(d), inter, union))
    return pa.table(
        {
            "day": pa.array([r[0] for r in rows], pa.int64()),
            "n_common": pa.array([r[1] for r in rows], pa.int64()),
            "n_union": pa.array([r[2] for r in rows], pa.int64()),
            "jaccard": pa.array(
                [float(np.float64(r[1]) / np.float64(r[2])) for r in rows],
                pa.float64(),
            ),
        }
    )


GEO_CELL_TURNOVER_SQL = f"""
WITH dc AS (
  SELECT DISTINCT epoch_us(ts) // {_TT_DAY_US} AS day,
         ((event_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((event_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy
  FROM events),
days AS (SELECT DISTINCT day FROM dc),
pairs AS (
  SELECT d.day FROM days d JOIN days e ON e.day = d.day + 1),
inter AS (
  SELECT p.day, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM pairs p
  JOIN dc a ON a.day = p.day
  JOIN dc b ON b.day = p.day + 1 AND b.gx = a.gx AND b.gy = a.gy
  GROUP BY 1),
uni AS (
  SELECT p.day, CAST(COUNT(*) AS BIGINT) AS n_union
  FROM pairs p JOIN (
    SELECT day, gx, gy FROM dc
    UNION
    SELECT day - 1 AS day, gx, gy FROM dc) u ON u.day = p.day
  GROUP BY 1)
SELECT u.day, COALESCE(i.n_common, 0) AS n_common, u.n_union,
       CAST(COALESCE(i.n_common, 0) AS DOUBLE)
         / CAST(u.n_union AS DOUBLE) AS jaccard
FROM uni u LEFT JOIN inter i ON i.day = u.day
"""


def events_flow_imbalance(sf_dir: str):
    """PER-CELL FLOW IMBALANCE (net in-migration proxy): for every travel
    leg, the origin cell scores one departure and the destination cell one
    arrival; a cell's imbalance = arrivals - departures — the directional
    statistic a flow map's corridor counts (events_corridors) deliberately
    ignore. Same one-shuffle user-partition plan; the kernel reduces its
    legs straight to (cell, out, in) integer partials over the BOUNDED
    10-deg grid, one packed-u64 sum pass finishes (arrivals and
    departures fold into one key stream with a direction bit)."""
    from core_ray.stages.agg import map_groups_partitioned, sum_by_u64

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    _empty = pa.table(
        {"key": pa.array([], pa.uint64()), "n": pa.array([], pa.int64())}
    )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, us, uid))
        uid, eid = uid[order], eid[order]
        gx = ((eid * 104729) % 360000) // _GE_CELL_MILLI
        gy = ((eid * 7919) % 140000) // _GE_CELL_MILLI
        cell = gx * 1024 + gy
        leg = np.zeros(len(uid), dtype=bool)
        leg[1:] = uid[1:] == uid[:-1]
        i = np.nonzero(leg)[0]
        if len(i) == 0:
            return _empty
        # direction bit 2^20: 0 = departure (origin), 1 = arrival (dest)
        keys = np.concatenate(
            [cell[i - 1], cell[i] + (1 << 20)]
        ).astype(np.uint64)
        u, c = np.unique(keys, return_counts=True)
        return pa.table(
            {
                "key": pa.array(u, pa.uint64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    t = _collect_table(
        sum_by_u64(
            map_groups_partitioned(ds, "user_id", per_part), "key", "n"
        )
    )  # <= 2 x 504 rows by construction
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    cell = key & ((1 << 20) - 1)
    is_in = key >> 20
    cells = np.unique(cell)
    outs = np.zeros(len(cells), np.int64)
    ins = np.zeros(len(cells), np.int64)
    pos = np.searchsorted(cells, cell)
    np.add.at(outs, pos[is_in == 0], n[is_in == 0])
    np.add.at(ins, pos[is_in == 1], n[is_in == 1])
    return pa.table(
        {
            "gx": pa.array(cells // 1024, pa.int64()),
            "gy": pa.array(cells % 1024, pa.int64()),
            "departures": pa.array(outs, pa.int64()),
            "arrivals": pa.array(ins, pa.int64()),
            "imbalance": pa.array(ins - outs, pa.int64()),
        }
    )


EVENTS_FLOW_IMBALANCE_SQL = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         ((event_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((event_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy
  FROM events),
legs AS (
  SELECT user_id, gx, gy,
         LAG(gx) OVER w AS pgx, LAG(gy) OVER w AS pgy
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
flows AS (
  SELECT pgx AS gx, pgy AS gy, 1 AS dep, 0 AS arr FROM legs
  WHERE pgx IS NOT NULL
  UNION ALL
  SELECT gx, gy, 0, 1 FROM legs WHERE pgx IS NOT NULL)
SELECT gx, gy, CAST(SUM(dep) AS BIGINT) AS departures,
       CAST(SUM(arr) AS BIGINT) AS arrivals,
       CAST(SUM(arr) AS BIGINT) - CAST(SUM(dep) AS BIGINT) AS imbalance
FROM flows GROUP BY 1, 2
"""


_HUFF_SCALE = 10**9  # integer weight scale (IDW's quantizer, reused)
_HUFF_Q = 1000.0


def geo_huff_share(sf_dir: str):
    """HUFF GRAVITY-MODEL CATCHMENT (retail/service-area demand): each
    document's unit of demand splits across the 12 facility sites with
    probability ∝ 1/d² (the Huff model with attractiveness 1, exponent 2);
    per-facility expected demand is the sum of shares. FULLY INTEGER: the
    inverse-distance weight is geo_idw_interp's quantizer
    (SCALE // (1 + floor(d2*Q))), and the per-doc share quantizes to
    micro-units by INTEGER division share_j = (w_j * 1e6) // sum_w — so
    shares are exact int64, order-free, and the per-facility totals are
    exact integer sums (the leftover micro-units from floor division are
    emitted as a corpus-wide remainder so mass is accounted). Map-only +
    one 12-row groupby — the distributional sibling of
    geo_nearest_facility's winner-takes-all assignment."""
    from ray.data.aggregate import Sum

    k = np.arange(12, dtype=np.int64)
    f_lat = ((k * 11003) % 120000) / 1000.0 - 60.0
    f_lon = ((k * 104729) % 340000) / 1000.0 - 170.0

    ds = _read(sf_dir, "documents", ["doc_id"])

    def partial(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(doc_id)
        dla = lat[:, None] - f_lat[None, :]
        dlo = lon[:, None] - f_lon[None, :]
        d2 = dla * dla + dlo * dlo  # (B, 12)
        w = _HUFF_SCALE // (1 + np.floor(d2 * _HUFF_Q).astype(np.int64))
        sw = w.sum(axis=1)  # (B,)
        share = (w * 1000000) // sw[:, None]  # exact integer micro-shares
        rem = 1000000 - share.sum(axis=1)  # floor-division leftovers
        tot = share.sum(axis=0)  # (12,)
        return pa.table(
            {
                "fac_id": pa.array(
                    np.concatenate([k, [-1]]), pa.int64()
                ),
                "micro": pa.array(
                    np.concatenate([tot, [int(rem.sum())]]), pa.int64()
                ),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("fac_id")
        .aggregate(Sum("micro", alias_name="demand_micro"))
    )
    t = _collect_table(agg)  # <= 13 rows by construction
    t = pa.table(
        {
            "fac_id": pc.cast(t["fac_id"], pa.int64()),
            "demand_micro": pc.cast(t["demand_micro"], pa.int64()),
        }
    )
    return t.sort_by("fac_id")


GEO_HUFF_SHARE_SQL = f"""
WITH pts AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
facs AS (
  SELECT k AS fac_id,
         ((k * 11003) % 120000) / 1000.0 - 60.0 AS flat,
         ((k * 104729) % 340000) / 1000.0 - 170.0 AS flon
  FROM range(12) t(k)),
w AS (
  SELECT p.doc_id, f.fac_id,
         {_HUFF_SCALE} // (1 + CAST(FLOOR(
           ((p.lat - f.flat) * (p.lat - f.flat)
            + (p.lon - f.flon) * (p.lon - f.flon)) * {_HUFF_Q})
           AS BIGINT)) AS wj
  FROM pts p CROSS JOIN facs f),
sw AS (SELECT doc_id, CAST(SUM(wj) AS BIGINT) AS s FROM w GROUP BY 1),
shares AS (
  SELECT w.fac_id, (w.wj * 1000000) // sw.s AS m
  FROM w JOIN sw USING (doc_id)),
fac_tot AS (
  SELECT fac_id, CAST(SUM(m) AS BIGINT) AS demand_micro
  FROM shares GROUP BY 1),
rem AS (
  SELECT CAST(-1 AS BIGINT) AS fac_id,
         CAST(1000000 * (SELECT COUNT(*) FROM pts)
              - (SELECT SUM(demand_micro) FROM fac_tot) AS BIGINT)
           AS demand_micro)
SELECT * FROM rem
UNION ALL
SELECT fac_id, demand_micro FROM fac_tot
ORDER BY fac_id
"""


def events_burstiness(sf_dir: str):
    """PER-USER BURSTINESS (Goh-Barabasi B = (sigma - mu)/(sigma + mu) of
    inter-event times: -1 = metronome, 0 = Poisson, ->1 = extreme bursts
    — the temporal-signature classifier of human activity): gaps quantize
    to integer SECONDS (keeps ss = sum of squared gaps inside int64 to
    ~10^4 gaps x 30-day spans), population sigma comes from the moment
    identity n*ss - s^2, and B collapses to ONE fixed double chain of two
    exact integers: (sqrt(n*ss - s^2) - s) / (sqrt(n*ss - s^2) + s) —
    the n divisors cancel. One user-keyed shuffle; users with < 2 gaps
    are excluded (B undefined)."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "n_gaps": pa.array([], pa.int64()),
            "sum_s": pa.array([], pa.int64()),
            "sum_ss": pa.array([], pa.int64()),
            "burstiness": pa.array([], pa.float64()),
        }
    )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, us, uid))
        uid, us = uid[order], us[order]
        leg = np.zeros(len(uid), dtype=bool)
        leg[1:] = uid[1:] == uid[:-1]
        i = np.nonzero(leg)[0]
        if len(i) == 0:
            return _empty
        gap = (us[i] - us[i - 1]) // 1000000  # integer seconds
        gu = uid[i]
        starts = np.nonzero(np.r_[True, gu[1:] != gu[:-1]])[0]
        n = np.diff(np.r_[starts, len(gu)]).astype(np.int64)
        s = np.add.reduceat(gap, starts)
        ss = np.add.reduceat(gap * gap, starts)
        keep = n >= 2
        n, s, ss = n[keep], s[keep], ss[keep]
        root = np.sqrt((n * ss - s * s).astype(np.float64))
        return pa.table(
            {
                "user_id": pa.array(gu[starts][keep], pa.int64()),
                "n_gaps": pa.array(n, pa.int64()),
                "sum_s": pa.array(s, pa.int64()),
                "sum_ss": pa.array(ss, pa.int64()),
                "burstiness": pa.array(
                    (root - s.astype(np.float64))
                    / (root + s.astype(np.float64)),
                    pa.float64(),
                ),
            }
        )

    return map_groups_partitioned(ds, "user_id", per_part)


EVENTS_BURSTINESS_SQL = """
WITH pts AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
gaps AS (
  SELECT user_id,
         (us - LAG(us) OVER (PARTITION BY user_id
                             ORDER BY us, event_id)) // 1000000 AS gap
  FROM pts),
per AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(gap) AS BIGINT) AS s,
         CAST(SUM(gap * gap) AS BIGINT) AS ss
  FROM gaps WHERE gap IS NOT NULL GROUP BY 1)
SELECT user_id, n AS n_gaps, s AS sum_s, ss AS sum_ss,
       (SQRT(CAST(n * ss - s * s AS DOUBLE)) - CAST(s AS DOUBLE))
         / (SQRT(CAST(n * ss - s * s AS DOUBLE)) + CAST(s AS DOUBLE))
         AS burstiness
FROM per WHERE n >= 2
"""


def events_nearest_doc(sf_dir: str):
    """LARGE-LARGE BIPARTITE NEAREST-NEIGHBOR ASSIGNMENT: every event gets
    its single closest document within 2 deg (or no row) — the "attach
    the nearest content item to each telemetry point" enrichment join,
    with BOTH sides corpus-scale (geo_nearest_facility's broadcast trick
    is unavailable; geo_doc_event_band's all-pairs output would be wasted
    work). Plan: the band join's asymmetric replication INVERTED (events
    emit one home replica, docs ghost 3x3 so every in-range doc reaches
    the event's home cell), per-cell per-event local argmin, then ONE
    global agg.min_by_u64 reduce keyed by event over the value pack
    (d2_micro << 40 | doc_id) — the u64 minimum IS the lexicographic
    (quantized-distance, doc_id) argmin, the q2_min_cost_supplier packing
    lesson. The assignment contract is on the QUANTIZED distance
    (floor(d2*1e6), ties by doc_id), mirrored exactly in SQL — no float
    ordering anywhere."""
    from core_ray.stages.agg import map_groups_partitioned, min_by_u64

    r = _BI_RADIUS
    r2 = r * r

    docs = _read(sf_dir, "documents", ["doc_id"])
    evs = _read(sf_dir, "events", ["event_id"])

    def ev_home(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(eid)
        cx = np.floor(lat / r).astype(np.int64) + (1 << 20)
        cy = np.floor(lon / r).astype(np.int64) + (1 << 20)
        return pa.table(
            {
                "ck": pa.array(
                    (cx.astype(np.uint64) << np.uint64(21))
                    | cy.astype(np.uint64),
                    pa.uint64(),
                ),
                "side": pa.array(np.zeros(len(eid), np.int8), pa.int8()),
                "id": pa.array(eid, pa.int64()),
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )

    def doc_rep9(b: pa.Table) -> pa.Table:
        did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(did)
        cx = np.floor(lat / r).astype(np.int64)
        cy = np.floor(lon / r).astype(np.int64)
        n = len(did)
        dx = np.array([0, -1, -1, -1, 0, 0, 1, 1, 1], dtype=np.int64)
        dy = np.array([0, -1, 0, 1, -1, 1, -1, 0, 1], dtype=np.int64)
        rcx = (np.repeat(cx, 9) + np.tile(dx, n) + (1 << 20)).astype(np.uint64)
        rcy = (np.repeat(cy, 9) + np.tile(dy, n) + (1 << 20)).astype(np.uint64)
        return pa.table(
            {
                "ck": pa.array((rcx << np.uint64(21)) | rcy, pa.uint64()),
                "side": pa.array(np.ones(9 * n, np.int8), pa.int8()),
                "id": pa.array(np.repeat(did, 9), pa.int64()),
                "lat": pa.array(np.repeat(lat, 9), pa.float64()),
                "lon": pa.array(np.repeat(lon, 9), pa.float64()),
            }
        )

    rep = evs.map_batches(ev_home, batch_format="pyarrow",
                          batch_size=65536).union(
        docs.map_batches(doc_rep9, batch_format="pyarrow", batch_size=65536)
    )

    _empty = pa.table(
        {"ev": pa.array([], pa.uint64()), "pack": pa.array([], pa.uint64())}
    )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        key = g["ck"].to_numpy(zero_copy_only=False).astype(np.uint64)
        side = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))
        key, side = key[order], side[order]
        ids = g["id"].to_numpy(zero_copy_only=False)[order]
        lat = g["lat"].to_numpy(zero_copy_only=False)[order]
        lon = g["lon"].to_numpy(zero_copy_only=False)[order]
        n = len(key)
        new = np.ones(n, dtype=bool)
        new[1:] = key[1:] != key[:-1]
        seg_id = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        seg_end = np.append(starts[1:], n)
        eidx = np.nonzero(side == 0)[0]  # events come first in a segment
        if len(eidx) == 0:
            return _empty
        eseg = seg_id[eidx]
        ev_cnt = np.zeros(len(starts), np.int64)
        np.add.at(ev_cnt, eseg, 1)
        doc_lo = starts + ev_cnt
        nd = (seg_end - doc_lo)[eseg]
        out_ev, out_pack = [], []
        cum = np.cumsum(nd)
        chunk = cum // (8 << 20)
        for c in np.unique(chunk):
            m = chunk == c
            ei = eidx[m]
            k = nd[m]
            if k.sum() == 0:
                continue
            left = np.repeat(np.arange(len(ei)), k)
            off = np.concatenate([[0], np.cumsum(k)])[:-1]
            right = (
                np.arange(k.sum()) - np.repeat(off, k)
                + np.repeat(doc_lo[eseg[m]], k)
            )
            dla = lat[ei][left] - lat[right]
            dlo = lon[ei][left] - lon[right]
            d2 = dla * dla + dlo * dlo
            ok = d2 <= r2
            if not ok.any():
                continue
            left, right, d2 = left[ok], right[ok], d2[ok]
            pack = (
                np.floor(d2 * 1000000.0).astype(np.uint64) << np.uint64(40)
            ) | ids[right].astype(np.uint64)
            # local argmin per event row (min pack per left)
            o = np.lexsort((pack, left))
            lf, pk = left[o], pack[o]
            first = np.r_[True, lf[1:] != lf[:-1]]
            out_ev.append(ids[ei][lf[first]].astype(np.uint64))
            out_pack.append(pk[first])
        if not out_ev:
            return _empty
        return pa.table(
            {
                "ev": pa.array(np.concatenate(out_ev), pa.uint64()),
                "pack": pa.array(np.concatenate(out_pack), pa.uint64()),
            }
        )

    local = map_groups_partitioned(rep, "ck", per_part)
    best = min_by_u64(local, "ev", "pack")

    def unpack(b: pa.Table) -> pa.Table:
        ev = b["ev"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk = b["pack"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "event_id": pa.array(ev, pa.int64()),
                "doc_id": pa.array(
                    (pk & np.uint64((1 << 40) - 1)).astype(np.int64),
                    pa.int64(),
                ),
                "d2_micro": pa.array(
                    (pk >> np.uint64(40)).astype(np.int64), pa.int64()
                ),
            }
        )

    return best.map_batches(unpack, batch_format="pyarrow")


EVENTS_NEAREST_DOC_SQL = f"""
WITH d AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
e AS (
  SELECT event_id,
         {GEO_LAT_SQL.replace('doc_id', 'event_id')} AS lat,
         {GEO_LON_SQL.replace('doc_id', 'event_id')} AS lon FROM events),
cand AS (
  SELECT e.event_id, d.doc_id,
         CAST(FLOOR(((e.lat - d.lat) * (e.lat - d.lat)
                     + (e.lon - d.lon) * (e.lon - d.lon)) * 1000000.0)
              AS BIGINT) AS d2_micro
  FROM e JOIN d
    ON d.lat BETWEEN e.lat - {_BI_RADIUS} AND e.lat + {_BI_RADIUS}
   AND d.lon BETWEEN e.lon - {_BI_RADIUS} AND e.lon + {_BI_RADIUS}
  WHERE (e.lat - d.lat) * (e.lat - d.lat)
          + (e.lon - d.lon) * (e.lon - d.lon) <= {_BI_RADIUS * _BI_RADIUS}),
best AS (
  SELECT event_id, doc_id, d2_micro,
         ROW_NUMBER() OVER (PARTITION BY event_id
                            ORDER BY d2_micro, doc_id) AS rn
  FROM cand)
SELECT event_id, doc_id, d2_micro FROM best WHERE rn = 1
"""


_ISO_CAP = 18  # isochrone cost cap (also the exact Bellman-Ford round bound)


def geo_isochrone(sf_dir: str, force_distributed: bool = False):
    """WEIGHTED ISOCHRONE (congestion-weighted shortest-path cost field —
    the travel-time-contour primitive under delivery-radius and
    service-reach products; the WEIGHTED sibling of geo_grid_bfs's unit
    hops): entering a 5-deg cell costs 1 + (doc_count % 5) (an integer
    "congestion" toll derived from the corpus itself), seeds are the
    doc_id % 97 cells at cost 0, and every occupied cell reports its
    minimum total entry cost if <= 18. Exactness: integer weights mean
    Bellman-Ford CONVERGES for the reported set within CAP rounds (a
    path's cost >= its edge count, so cost <= 18 implies <= 18 hops) —
    the oracle is a programmatically generated chain of 18 min-relax
    CTEs, no recursion-termination hazard. Same dual-path contract as
    geo_grid_bfs: one distributed count pass (cells + weights + seed bit
    in one packed stream), driver dense-mask relaxation below the node
    guard, distributed frontier rounds (probes carry cost + broadcast
    neighbor tolls, agg.min_by_u64 merges) above it; both paths
    equivalence-tested."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "documents", ["doc_id"])

    def cells(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mlat = (doc_id * 7919) % 140000
        mlon = (doc_id * 104729) % 360000
        gx = mlon // _BFS_CELL_MILLI
        gy = mlat // _BFS_CELL_MILLI
        key = (gx * 1024 + gy).astype(np.uint64)
        seed = doc_id % _BFS_SEED_MOD == 0
        return pa.table(
            {
                "key": pa.array(
                    key | (seed.astype(np.uint64) << np.uint64(63)),
                    pa.uint64(),
                )
            }
        )

    occ_t = _collect_table(
        count_by_u64(
            ds.map_batches(cells, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= 2 x grid cells by construction (geometry-bounded)
    raw = occ_t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    cnt = occ_t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    node = (raw & np.uint64((1 << 63) - 1)).astype(np.int64)
    is_seed = (raw >> np.uint64(63)).astype(bool)
    nodes = np.unique(node)
    counts = np.zeros(len(nodes), np.int64)
    np.add.at(counts, np.searchsorted(nodes, node), cnt)
    weights = 1 + counts % 5
    seeds = np.unique(node[is_seed])

    empty = pa.table(
        {
            "gx": pa.array([], pa.int64()),
            "gy": pa.array([], pa.int64()),
            "cost": pa.array([], pa.int64()),
        }
    )
    if len(seeds) == 0:
        return empty

    if len(nodes) <= _BFS_LOCAL_MAX and not force_distributed:
        w = 360000 // _BFS_CELL_MILLI
        h = 140000 // _BFS_CELL_MILLI
        toll = np.full((w, h), np.iinfo(np.int64).max // 4, np.int64)
        toll[nodes // 1024, nodes % 1024] = weights
        big = np.iinfo(np.int64).max // 4
        dist = np.full((w, h), big, np.int64)
        dist[seeds // 1024, seeds % 1024] = 0
        for _ in range(_ISO_CAP):
            cand = np.full((w, h), big, np.int64)
            cand[1:, :] = np.minimum(cand[1:, :], dist[:-1, :])
            cand[:-1, :] = np.minimum(cand[:-1, :], dist[1:, :])
            cand[:, 1:] = np.minimum(cand[:, 1:], dist[:, :-1])
            cand[:, :-1] = np.minimum(cand[:, :-1], dist[:, 1:])
            new = np.minimum(dist, cand + toll)
            if np.array_equal(new, dist):
                break
            dist = new
        ok = dist <= _ISO_CAP
        gx, gy = np.nonzero(ok)
        return pa.table(
            {
                "gx": pa.array(gx.astype(np.int64), pa.int64()),
                "gy": pa.array(gy.astype(np.int64), pa.int64()),
                "cost": pa.array(dist[gx, gy], pa.int64()),
            }
        )

    return _grid_sssp_distributed(nodes, weights, seeds)


def _grid_sssp_distributed(nodes: np.ndarray, weights: np.ndarray,
                           seeds: np.ndarray):
    """Distributed weighted relaxation rounds: dist lives as a Dataset;
    per round the improved frontier flat-maps 4 neighbor probes carrying
    cost + the neighbor's toll (tolls broadcast — geometry-bounded here;
    an unbounded graph would deliver them via a distributed join, the
    documented swap), agg.min_by_u64 merges, and the driver moves one
    order-independent checksum per round (costs only decrease, so an
    unchanged checksum is a fixpoint proof)."""
    import ray

    from core_ray.stages.agg import min_by_u64

    order = np.argsort(nodes)
    occ_sorted = nodes[order]
    toll_sorted = weights[order]
    occ_ref = ray.put((occ_sorted, toll_sorted))

    dist = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(seeds.astype(np.uint64), pa.uint64()),
                "d": pa.array(np.zeros(len(seeds), np.uint64), pa.uint64()),
            }
        )
    ).materialize()
    frontier = dist

    def probe(b: pa.Table) -> pa.Table:
        occ_arr, tolls = ray.get(occ_ref)
        nd_ = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        d_ = b["d"].to_numpy(zero_copy_only=False).astype(np.uint64)
        gx, gy = nd_ // 1024, nd_ % 1024
        nx = np.concatenate([gx + 1, gx - 1, gx, gx])
        ny = np.concatenate([gy, gy, gy + 1, gy - 1])
        base = np.tile(d_, 4)
        ok = (
            (nx >= 0) & (nx * _BFS_CELL_MILLI < 360000)
            & (ny >= 0) & (ny * _BFS_CELL_MILLI < 140000)
        )
        cand = (nx[ok] * 1024 + ny[ok]).astype(np.int64)
        base = base[ok]
        pos = np.searchsorted(occ_arr, cand)
        hit = (pos < len(occ_arr)) & (
            occ_arr[np.minimum(pos, len(occ_arr) - 1)] == cand
        )
        cost = base[hit] + tolls[pos[hit]].astype(np.uint64)
        keep = cost <= np.uint64(_ISO_CAP)
        return pa.table(
            {
                "node": pa.array(
                    cand[hit][keep].astype(np.uint64), pa.uint64()
                ),
                "d": pa.array(cost[keep], pa.uint64()),
            }
        )

    from ray.data.aggregate import Sum

    prev_rows = dist.count()
    prev_sum = None
    for _ in range(_ISO_CAP):
        nbrs = frontier.map_batches(probe, batch_format="pyarrow")
        new_dist = min_by_u64(dist.union(nbrs), "node", "d").materialize()
        cur_rows = new_dist.count()
        cur_sum = new_dist.aggregate(Sum("d"))["sum(d)"]
        if cur_rows == prev_rows and cur_sum == prev_sum:
            dist = new_dist
            break
        dist = new_dist
        prev_rows, prev_sum = cur_rows, cur_sum
        # full re-probe each round: correct and bounded by CAP rounds
        # (a changed-rows-only frontier is the latency optimization)
        frontier = dist

    def unpack(b: pa.Table) -> pa.Table:
        nd_ = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        d_ = b["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "gx": pa.array(nd_ // 1024, pa.int64()),
                "gy": pa.array(nd_ % 1024, pa.int64()),
                "cost": pa.array(d_, pa.int64()),
            }
        )

    return dist.map_batches(unpack, batch_format="pyarrow")


def _iso_sql() -> str:
    parts = [
        "WITH pts AS (SELECT doc_id, (doc_id * 7919) % 140000 AS mlat,"
        " (doc_id * 104729) % 360000 AS mlon FROM documents)",
        f", occ AS (SELECT mlon // {_BFS_CELL_MILLI} AS gx,"
        f" mlat // {_BFS_CELL_MILLI} AS gy,"
        " 1 + COUNT(*) % 5 AS w,"
        f" MAX(CASE WHEN doc_id % {_BFS_SEED_MOD} = 0 THEN 1 ELSE 0 END)"
        " AS is_src FROM pts GROUP BY 1, 2)",
        ", r0 AS (SELECT gx, gy, CAST(0 AS BIGINT) AS c FROM occ"
        " WHERE is_src = 1)",
    ]
    # MATERIALIZED is load-bearing: each r_k references r_{k-1} twice, and
    # DuckDB inlines plain CTEs — 2^18 scans without it
    for k in range(1, _ISO_CAP + 1):
        parts.append(
            f", r{k} AS MATERIALIZED (SELECT gx, gy, MIN(c) AS c FROM ("
            f"SELECT gx, gy, c FROM r{k-1}"
            " UNION ALL "
            f"SELECT o.gx, o.gy, b.c + o.w AS c FROM r{k-1} b JOIN occ o"
            " ON (o.gx = b.gx + 1 AND o.gy = b.gy)"
            " OR (o.gx = b.gx - 1 AND o.gy = b.gy)"
            " OR (o.gx = b.gx AND o.gy = b.gy + 1)"
            " OR (o.gx = b.gx AND o.gy = b.gy - 1)"
            ") GROUP BY 1, 2)"
        )
    parts.append(
        f" SELECT CAST(gx AS BIGINT) AS gx, CAST(gy AS BIGINT) AS gy,"
        f" CAST(c AS BIGINT) AS cost FROM r{_ISO_CAP} WHERE c <= {_ISO_CAP}"
    )
    return "".join(parts)


GEO_ISOCHRONE_SQL = _iso_sql()


_ZIPF_K = 100  # ranks used for the Zipf regression


def doc_zipf_fit(sf_dir: str):
    """CORPUS ZIPF-LAW FIT: the least-squares slope of log2(frequency) on
    log2(rank) over the top-100 vocabulary — the corpus-health statistic
    (natural text ≈ -1; a slope collapsing toward 0 flags boilerplate or
    generator loops, a classic crawl-quality tripwire). Plan: the
    doc_vocab_top20 combiner/prune machinery collects the exact global
    top-{K} (token tie-break), then the driver fits on the BOUNDED table:
    both logs quantize to integer micro-bits (sql_round_np == DuckDB
    ROUND), the regression moments are exact integer sums, and the slope
    is ONE double division of two exact integers (the events_tile_trend
    algebra on quantized-log coordinates)."""
    top = doc_vocab_top20(sf_dir, k=_ZIPF_K)
    t = _collect_table(top) if not isinstance(top, pa.Table) else top
    toks = np.asarray(t["token"].to_pylist())
    n_arr = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((toks, -n_arr))  # defensive (n desc, token asc) rank
    n_arr = n_arr[order]
    k = len(n_arr)
    rank = np.arange(1, k + 1, dtype=np.int64)
    x = sql_round_np(np.log2(rank.astype(np.float64)) * 1000000.0, 0).astype(
        np.int64
    )
    y = sql_round_np(np.log2(n_arr.astype(np.float64)) * 1000000.0, 0).astype(
        np.int64
    )
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx = int((x * x).sum())
    num = k * sxy - sx * sy
    den = k * sxx - sx * sx
    return pa.table(
        {
            "n_ranks": pa.array([k], pa.int64()),
            "slope_num": pa.array([num], pa.int64()),
            "slope_den": pa.array([den], pa.int64()),
            "zipf_slope": pa.array(
                [float(np.float64(num) / np.float64(den))], pa.float64()
            ),
        }
    )


DOC_ZIPF_FIT_SQL = f"""
WITH toks AS (
  SELECT UNNEST(string_split(text, ' ')) AS w FROM documents),
cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY 1),
top AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, w) AS rank
  FROM cnt ORDER BY n DESC, w LIMIT {_ZIPF_K}),
q AS (
  SELECT CAST(ROUND(LOG2(CAST(rank AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
           AS x,
         CAST(ROUND(LOG2(CAST(n AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS y
  FROM top),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM q)
SELECT k AS n_ranks, k * sxy - sx * sy AS slope_num,
       k * sxx - sx * sx AS slope_den,
       CAST(k * sxy - sx * sy AS DOUBLE)
         / CAST(k * sxx - sx * sx AS DOUBLE) AS zipf_slope
FROM m
"""


def events_sinuosity(sf_dir: str):
    """PER-USER PATH SINUOSITY (tortuosity: traveled length / net
    displacement — 1 = beeline, large = wandering; the trajectory-shape
    classifier beside rog and burstiness): total = sum of per-leg
    FLOOR-quantized haversine km (geo_traj_stats' contract), net = the
    FLOOR km between the user's FIRST and LAST events under the total
    (ts, event_id) order. All-integer inputs; the ratio is one double
    division. One user-keyed shuffle; users with zero net displacement
    (or < 2 events) report net_km = 0 and a NULL ratio (mirrored with
    NULLIF)."""
    from core_ray.stages.agg import map_groups_partitioned
    from core_ray.stages.distband import haversine_km

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    _empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "total_km": pa.array([], pa.int64()),
            "net_km": pa.array([], pa.int64()),
            "sinuosity": pa.array([], pa.float64()),
        }
    )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, us, uid))
        uid, eid = uid[order], eid[order]
        lat, lon = _derive_coords(eid)
        leg = np.zeros(len(uid), dtype=bool)
        leg[1:] = uid[1:] == uid[:-1]
        i = np.nonzero(leg)[0]
        starts = np.nonzero(np.r_[True, uid[1:] != uid[:-1]])[0]
        ends = np.r_[starts[1:], len(uid)] - 1
        keep = ends > starts  # >= 2 events
        starts, ends = starts[keep], ends[keep]
        if len(starts) == 0:
            return _empty
        km = np.zeros(len(uid), np.int64)
        if len(i):
            km[i] = np.floor(
                haversine_km(lat[i - 1], lon[i - 1], lat[i], lon[i])
            ).astype(np.int64)
        ck = np.cumsum(km)
        total = ck[ends] - ck[starts]
        net = np.floor(
            haversine_km(lat[starts], lon[starts], lat[ends], lon[ends])
        ).astype(np.int64)
        sin = np.where(
            net > 0,
            total.astype(np.float64) / net.astype(np.float64),
            np.nan,
        )
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "total_km": pa.array(total, pa.int64()),
                "net_km": pa.array(net, pa.int64()),
                "sinuosity": pa.array(
                    np.where(np.isnan(sin), None, sin), pa.float64(),
                    from_pandas=True,
                ),
            }
        )

    return map_groups_partitioned(ds, "user_id", per_part)


_HAV_KM_SQL = """CAST(FLOOR(
    2.0 * 6371.0088 * ASIN(SQRT(
      SIN(RADIANS({lat2} - {lat1}) / 2.0) * SIN(RADIANS({lat2} - {lat1}) / 2.0)
      + COS(RADIANS({lat1})) * COS(RADIANS({lat2}))
        * SIN(RADIANS({lon2} - {lon1}) / 2.0)
        * SIN(RADIANS({lon2} - {lon1}) / 2.0)
    ))) AS BIGINT)"""

EVENTS_SINUOSITY_SQL = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         {GEO_LAT_SQL.replace('doc_id', 'event_id')} AS lat,
         {GEO_LON_SQL.replace('doc_id', 'event_id')} AS lon FROM events),
legs AS (
  SELECT user_id,
         LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon, lat, lon,
         FIRST_VALUE(lat) OVER w AS flat, FIRST_VALUE(lon) OVER w AS flon,
         LAST_VALUE(lat) OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS llat,
         LAST_VALUE(lon) OVER (PARTITION BY user_id
           ORDER BY epoch_us(ts), event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS llon,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
per AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN plat IS NULL THEN 0 ELSE
           {_HAV_KM_SQL.format(lat1='plat', lon1='plon', lat2='lat', lon2='lon')}
         END) AS BIGINT) AS total_km,
         MAX({_HAV_KM_SQL.format(lat1='flat', lon1='flon', lat2='llat', lon2='llon')})
           AS net_km
  FROM legs WHERE n >= 2 GROUP BY user_id)
SELECT user_id, total_km, net_km,
       CAST(total_km AS DOUBLE) / CAST(NULLIF(net_km, 0) AS DOUBLE)
         AS sinuosity
FROM per
"""


def geo_lang_boundaries(sf_dir: str):
    """LINGUISTIC FRONTIER DETECTION: adjacent 10-deg cell pairs whose
    DOMINANT document language differs — the dialect/language boundary
    map a localization or crawl-routing team reads off the corpus.
    Dominance = most documents, ties by lexicographically smallest lang
    (the deterministic argmax contract). One packed (lang_idx, cell)
    count pass (bounded: langs x 504 at any corpus scale), driver fold:
    dominant per cell via lexsort-first, then right/down neighbor
    comparison (each boundary edge emitted ONCE, at its left/upper
    cell — the raster-adjacency single-emission rule shared with
    geo_moran_i's neighbor join)."""
    import ray
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def lang_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(b["lang"].to_pylist()))
        return pa.table({"lang": pa.array(u.tolist(), pa.string()),
                         "one": pa.array(np.ones(len(u), np.int64))})

    lang_t = _collect_table(
        ds.select_columns(["lang"])
        .map_batches(lang_partial, batch_format="pyarrow", batch_size=131072)
        .groupby("lang")
        .aggregate(Sum("one", alias_name="n"))
    )
    langs = np.sort(np.asarray(lang_t["lang"].to_pylist()))
    lang_ref = ray.put(langs)

    def pack(b: pa.Table) -> pa.Table:
        ls = ray.get(lang_ref)
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(ls, np.asarray(b["lang"].to_pylist()))
        gx = ((doc_id * 104729) % 360000) // _GE_CELL_MILLI
        gy = ((doc_id * 7919) % 140000) // _GE_CELL_MILLI
        key = (idx.astype(np.uint64) << np.uint64(16)) | (
            (gx * 1024 + gy).astype(np.uint64)
        )
        return pa.table({"key": pa.array(key, pa.uint64())})

    cc_t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= langs x 504 rows by construction
    key = cc_t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = cc_t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    lidx = (key >> np.uint64(16)).astype(np.int64)
    cell = (key & np.uint64((1 << 16) - 1)).astype(np.int64)
    # dominant per cell under (count desc, lang asc)
    order = np.lexsort((lidx, -c, cell))
    cs, ls_ = cell[order], lidx[order]
    first = np.r_[True, cs[1:] != cs[:-1]]
    dom = dict(zip(cs[first].tolist(), ls_[first].tolist()))

    rows = []
    for cl, la in dom.items():
        gx, gy = cl // 1024, cl % 1024
        for nb in (cl + 1024, cl + 1):  # right (gx+1), down (gy+1)
            if nb == cl + 1 and gy + 1 >= 14:
                continue
            if nb == cl + 1024 and gx + 1 >= 36:
                continue
            lb = dom.get(nb)
            if lb is not None and lb != la:
                rows.append((gx, gy, nb // 1024, nb % 1024, la, lb))
    rows.sort()
    return pa.table(
        {
            "gx": pa.array([r[0] for r in rows], pa.int64()),
            "gy": pa.array([r[1] for r in rows], pa.int64()),
            "nbr_gx": pa.array([r[2] for r in rows], pa.int64()),
            "nbr_gy": pa.array([r[3] for r in rows], pa.int64()),
            "lang_a": pa.array([str(langs[r[4]]) for r in rows], pa.string()),
            "lang_b": pa.array([str(langs[r[5]]) for r in rows], pa.string()),
        }
    )


GEO_LANG_BOUNDARIES_SQL = f"""
WITH pts AS (
  SELECT lang,
         ((doc_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((doc_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy
  FROM documents),
cc AS (SELECT gx, gy, lang, COUNT(*) AS c FROM pts GROUP BY 1, 2, 3),
dom AS (
  SELECT gx, gy, lang FROM (
    SELECT gx, gy, lang,
           ROW_NUMBER() OVER (PARTITION BY gx, gy
                              ORDER BY c DESC, lang) AS rn
    FROM cc) WHERE rn = 1)
SELECT a.gx, a.gy, b.gx AS nbr_gx, b.gy AS nbr_gy,
       a.lang AS lang_a, b.lang AS lang_b
FROM dom a JOIN dom b
  ON ((b.gx = a.gx + 1 AND b.gy = a.gy)
      OR (b.gx = a.gx AND b.gy = a.gy + 1))
WHERE a.lang <> b.lang
"""


def events_cell_gini(sf_dir: str):
    """SPATIAL CONCENTRATION (Gini coefficient of per-cell event counts,
    one row per event type): 0 = activity spread evenly over its occupied
    cells, ->1 = concentrated in a few hot cells — the inequality lens on
    the tile histogram (market-concentration / crawl-hotspot metric).
    Exactness: with counts sorted ascending, G = 2*sum(i*c_i)/(n*S) -
    (n+1)/n, and sum(i*c_i) is INVARIANT under permutations of equal
    counts — so the rank order is deterministic without a tie-break and
    both moments are exact integers; G = one fixed double chain. Event
    types are bounded, cells are geometry-bounded: one distributed
    (type, cell) count pass, driver fold."""
    import ray
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def type_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(b["event_type"].to_pylist()))
        return pa.table({"event_type": pa.array(u.tolist(), pa.string()),
                         "one": pa.array(np.ones(len(u), np.int64))})

    ty_t = _collect_table(
        ds.select_columns(["event_type"])
        .map_batches(type_partial, batch_format="pyarrow", batch_size=131072)
        .groupby("event_type")
        .aggregate(Sum("one", alias_name="n"))
    )
    types = np.sort(np.asarray(ty_t["event_type"].to_pylist()))
    ty_ref = ray.put(types)

    def pack(b: pa.Table) -> pa.Table:
        ts = ray.get(ty_ref)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(ts, np.asarray(b["event_type"].to_pylist()))
        gx = ((eid * 104729) % 360000) // _GE_CELL_MILLI
        gy = ((eid * 7919) % 140000) // _GE_CELL_MILLI
        key = (idx.astype(np.uint64) << np.uint64(16)) | (
            (gx * 1024 + gy).astype(np.uint64)
        )
        return pa.table({"key": pa.array(key, pa.uint64())})

    cc_t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= types x 504 rows by construction
    key = cc_t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = cc_t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    tidx = (key >> np.uint64(16)).astype(np.int64)

    rows = []
    for t in range(len(types)):
        cs = np.sort(c[tidx == t])
        n = len(cs)
        if n == 0:
            continue
        s = int(cs.sum())
        wsum = int((np.arange(1, n + 1, dtype=np.int64) * cs).sum())
        gini = float(
            np.float64(2 * wsum) / np.float64(n * s)
            - np.float64(n + 1) / np.float64(n)
        )
        rows.append((str(types[t]), n, s, 2 * wsum, gini))
    return pa.table(
        {
            "event_type": pa.array([r[0] for r in rows], pa.string()),
            "n_cells": pa.array([r[1] for r in rows], pa.int64()),
            "n_events": pa.array([r[2] for r in rows], pa.int64()),
            "wsum2": pa.array([r[3] for r in rows], pa.int64()),
            "gini": pa.array([r[4] for r in rows], pa.float64()),
        }
    )


EVENTS_CELL_GINI_SQL = f"""
WITH pts AS (
  SELECT event_type,
         ((event_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((event_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy
  FROM events),
cc AS (SELECT event_type, gx, gy, CAST(COUNT(*) AS BIGINT) AS c
       FROM pts GROUP BY 1, 2, 3),
ranked AS (
  SELECT event_type, c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS i
  FROM cc),
per AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(2 * SUM(i * c) AS BIGINT) AS wsum2
  FROM ranked GROUP BY 1)
SELECT event_type, n AS n_cells, s AS n_events, wsum2,
       CAST(wsum2 AS DOUBLE) / CAST(n * s AS DOUBLE)
         - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
FROM per
"""


def geo_theil_decomp(sf_dir: str):
    """THEIL INEQUALITY DECOMPOSITION (in bits): how unequal are per-cell
    event counts, and how much of that inequality is BETWEEN 30-deg
    regions vs WITHIN them — the additive-decomposition property that
    makes Theil (not Gini) the regional-analysis standard. Per region g:
    T_g = sum(c*log2 c)/S_g/1e6_q - log2(S_g/n_g); between-component
    T_b = sum_g (S_g/S) * (log2(S_g/n_g) - log2(S/n)). Exactness: integer
    (region, cell) counts from ONE packed count pass (bounded), per-cell
    c*log2(c) quantized to micro-bits (the entropy contract), and every
    log2-of-ratio argument is the SAME correctly-rounded double division
    on both sides before the micro-bit ROUND. Output: one row per region
    + a (-1, -1) summary row carrying T_between."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["event_id"])

    def pack(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mlon = (eid * 104729) % 360000
        mlat = (eid * 7919) % 140000
        gx = mlon // _GE_CELL_MILLI
        gy = mlat // _GE_CELL_MILLI
        key = (gx * 1024 + gy).astype(np.uint64)
        return pa.table({"key": pa.array(key, pa.uint64())})

    cc_t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= 504 rows by construction
    key = cc_t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = cc_t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    gx, gy = key // 1024, key % 1024
    # 30-deg region of a 10-deg cell
    rx, ry = gx // 3, gy // 3
    reg = rx * 16 + ry
    micro = sql_round_np(
        c.astype(np.float64) * np.log2(c.astype(np.float64)) * 1000000.0, 0
    ).astype(np.int64)

    regs = np.unique(reg)
    pos = np.searchsorted(regs, reg)
    n_g = np.zeros(len(regs), np.int64)
    s_g = np.zeros(len(regs), np.int64)
    m_g = np.zeros(len(regs), np.int64)
    np.add.at(n_g, pos, 1)
    np.add.at(s_g, pos, c)
    np.add.at(m_g, pos, micro)
    S, n = int(s_g.sum()), int(n_g.sum())

    def _lg_ratio_micro(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return sql_round_np(
            np.log2(a.astype(np.float64) / b.astype(np.float64)) * 1000000.0,
            0,
        ).astype(np.int64)

    lg_g = _lg_ratio_micro(s_g, n_g)
    lg_all = int(_lg_ratio_micro(np.array([S]), np.array([n]))[0])
    theil_within = m_g.astype(np.float64) / (
        1000000.0 * s_g.astype(np.float64)
    ) - lg_g.astype(np.float64) / 1000000.0
    # integer numerator: SUM of doubles is order-nondeterministic across
    # engines (the BM25 lesson); s_g * lg-diff stays exact int64 to
    # ~1e11 events per region
    t_between = float(
        np.float64(int((s_g * (lg_g - lg_all)).sum()))
        / (1000000.0 * np.float64(S))
    )
    return pa.table(
        {
            "rx": pa.array(
                np.concatenate([regs // 16, [-1]]), pa.int64()
            ),
            "ry": pa.array(
                np.concatenate([regs % 16, [-1]]), pa.int64()
            ),
            "n_cells": pa.array(np.concatenate([n_g, [n]]), pa.int64()),
            "n_events": pa.array(np.concatenate([s_g, [S]]), pa.int64()),
            "sum_micro": pa.array(np.concatenate([m_g, [0]]), pa.int64()),
            "theil": pa.array(
                np.concatenate([theil_within, [t_between]]), pa.float64()
            ),
        }
    )


GEO_THEIL_DECOMP_SQL = f"""
WITH pts AS (
  SELECT ((event_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((event_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy
  FROM events),
cc AS (SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS c FROM pts GROUP BY 1, 2),
q AS (
  SELECT gx // 3 AS rx, gy // 3 AS ry, c,
         CAST(ROUND(CAST(c AS DOUBLE) * LOG2(CAST(c AS DOUBLE))
                    * 1000000.0, 0) AS BIGINT) AS r
  FROM cc),
per AS (
  SELECT rx, ry, CAST(COUNT(*) AS BIGINT) AS n_g,
         CAST(SUM(c) AS BIGINT) AS s_g, CAST(SUM(r) AS BIGINT) AS m_g
  FROM q GROUP BY 1, 2),
tot AS (
  SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(s_g) AS BIGINT) AS s
  FROM per),
lg AS (
  SELECT p.*, CAST(ROUND(LOG2(CAST(p.s_g AS DOUBLE)
                              / CAST(p.n_g AS DOUBLE))
                         * 1000000.0, 0) AS BIGINT) AS lg_g,
         CAST(ROUND(LOG2(CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                    * 1000000.0, 0) AS BIGINT) AS lg_all,
         t.s AS s_tot, t.n AS n_tot
  FROM per p CROSS JOIN tot t)
SELECT CAST(rx AS BIGINT) AS rx, CAST(ry AS BIGINT) AS ry,
       n_g AS n_cells, s_g AS n_events, m_g AS sum_micro,
       CAST(m_g AS DOUBLE) / (1000000.0 * CAST(s_g AS DOUBLE))
         - CAST(lg_g AS DOUBLE) / 1000000.0 AS theil
FROM lg
UNION ALL
SELECT CAST(-1 AS BIGINT), CAST(-1 AS BIGINT),
       MAX(n_tot), MAX(s_tot), CAST(0 AS BIGINT),
       CAST(CAST(SUM(s_g * (lg_g - lg_all)) AS BIGINT) AS DOUBLE)
         / (1000000.0 * CAST(MAX(s_tot) AS DOUBLE))
FROM lg
"""


_PPZ_N = 200  # partitioned-PIP model zone count


def _ppz_zones():
    """Deterministic model zone rectangles (the many-polygon side)."""
    k = np.arange(_PPZ_N, dtype=np.int64)
    lat0 = ((k * 9973) % 120000) / 1000.0 - 60.0
    lon0 = ((k * 31337) % 340000) / 1000.0 - 170.0
    lat1 = lat0 + (2 + (k % 7)).astype(np.float64)
    lon1 = lon0 + (3 + (k % 11)).astype(np.float64)
    return lat0, lat1, lon0, lon1


def geo_pip_partitioned(sf_dir: str):
    """TILE-PARTITIONED CONTAINMENT JOIN (the NO-BROADCAST scale path of
    the flagship's STRtree point-in-polygon): when the polygon side is
    itself corpus-scale (cadastral parcels, geofence fleets), the
    broadcast J1 plan dies — instead both sides PARTITION BY TILE: each
    point lands in its one home 10-deg tile, each zone rectangle
    replicates to every tile its bbox intersects (geo_rect_cover's
    vectorized repeat/offset explode), and the containment test runs
    per tile — every (point, zone) pair meets in exactly the point's
    home tile, so emission is exactly-once with NO dedup pass. One hash
    shuffle total; all-pairs output (a doc inside k overlapping zones
    emits k rows — the PIP counting policy). The 200-zone model table
    here stands in for the unbounded side; nothing in the plan reads
    its size."""
    from core_ray.stages.agg import map_groups_partitioned

    zlat0, zlat1, zlon0, zlon1 = _ppz_zones()

    docs = _read(sf_dir, "documents", ["doc_id"])

    def pt_home(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(doc_id)
        tx = np.floor((lon + 180.0) / 10.0).astype(np.int64)
        ty = np.floor((lat + 70.0) / 10.0).astype(np.int64)
        return pa.table(
            {
                "ck": pa.array((tx * 64 + ty).astype(np.uint64), pa.uint64()),
                "side": pa.array(np.zeros(len(doc_id), np.int8), pa.int8()),
                "id": pa.array(doc_id, pa.int64()),
                "a": pa.array(lat, pa.float64()),
                "b": pa.array(lon, pa.float64()),
                "c": pa.array(np.zeros(len(doc_id)), pa.float64()),
                "d": pa.array(np.zeros(len(doc_id)), pa.float64()),
            }
        )

    def zone_rep() -> pa.Table:
        tx0 = np.maximum(0, np.floor((zlon0 + 180.0) / 10.0)).astype(np.int64)
        tx1 = np.minimum(35, np.floor((zlon1 + 180.0) / 10.0)).astype(np.int64)
        ty0 = np.maximum(0, np.floor((zlat0 + 70.0) / 10.0)).astype(np.int64)
        ty1 = np.minimum(13, np.floor((zlat1 + 70.0) / 10.0)).astype(np.int64)
        nx = tx1 - tx0 + 1
        ny = ty1 - ty0 + 1
        per = nx * ny
        zi = np.repeat(np.arange(_PPZ_N), per)
        off = np.arange(int(per.sum())) - np.repeat(
            np.concatenate([[0], np.cumsum(per)])[:-1], per
        )
        tx = tx0[zi] + off // ny[zi]
        ty = ty0[zi] + off % ny[zi]
        return pa.table(
            {
                "ck": pa.array((tx * 64 + ty).astype(np.uint64), pa.uint64()),
                "side": pa.array(np.ones(len(zi), np.int8), pa.int8()),
                "id": pa.array(zi, pa.int64()),
                "a": pa.array(zlat0[zi], pa.float64()),
                "b": pa.array(zlat1[zi], pa.float64()),
                "c": pa.array(zlon0[zi], pa.float64()),
                "d": pa.array(zlon1[zi], pa.float64()),
            }
        )

    import ray

    rep = docs.map_batches(pt_home, batch_format="pyarrow",
                           batch_size=65536).union(
        ray.data.from_arrow(zone_rep())
    )

    _empty = pa.table(
        {"doc_id": pa.array([], pa.int64()),
         "zone_id": pa.array([], pa.int64())}
    )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        key = g["ck"].to_numpy(zero_copy_only=False).astype(np.uint64)
        side = g["side"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, key))
        key, side = key[order], side[order]
        ids = g["id"].to_numpy(zero_copy_only=False)[order]
        a = g["a"].to_numpy(zero_copy_only=False)[order]
        b = g["b"].to_numpy(zero_copy_only=False)[order]
        c = g["c"].to_numpy(zero_copy_only=False)[order]
        d = g["d"].to_numpy(zero_copy_only=False)[order]
        n = len(key)
        new = np.ones(n, dtype=bool)
        new[1:] = key[1:] != key[:-1]
        seg_id = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        seg_end = np.append(starts[1:], n)
        pidx = np.nonzero(side == 0)[0]
        if len(pidx) == 0:
            return _empty
        pseg = seg_id[pidx]
        p_cnt = np.zeros(len(starts), np.int64)
        np.add.at(p_cnt, pseg, 1)
        z_lo = starts + p_cnt
        nz = (seg_end - z_lo)[pseg]
        left = np.repeat(np.arange(len(pidx)), nz)
        off = np.concatenate([[0], np.cumsum(nz)])[:-1]
        right = (
            np.arange(int(nz.sum())) - np.repeat(off, nz)
            + np.repeat(z_lo[pseg], nz)
        )
        plat = a[pidx][left]
        plon = b[pidx][left]
        ok = (
            (plat >= a[right]) & (plat <= b[right])
            & (plon >= c[right]) & (plon <= d[right])
        )
        return pa.table(
            {
                "doc_id": pa.array(
                    ids[pidx][left][ok].astype(np.int64), pa.int64()
                ),
                "zone_id": pa.array(
                    ids[right][ok].astype(np.int64), pa.int64()
                ),
            }
        )

    return map_groups_partitioned(rep, "ck", per_part)


GEO_PIP_PARTITIONED_SQL = f"""
WITH pts AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
zones AS (
  SELECT k AS zone_id,
         ((k * 9973) % 120000) / 1000.0 - 60.0 AS lat0,
         ((k * 9973) % 120000) / 1000.0 - 60.0
           + CAST(2 + (k % 7) AS DOUBLE) AS lat1,
         ((k * 31337) % 340000) / 1000.0 - 170.0 AS lon0,
         ((k * 31337) % 340000) / 1000.0 - 170.0
           + CAST(3 + (k % 11) AS DOUBLE) AS lon1
  FROM range({_PPZ_N}) t(k))
SELECT p.doc_id, z.zone_id
FROM pts p JOIN zones z
  ON p.lat >= z.lat0 AND p.lat <= z.lat1
 AND p.lon >= z.lon0 AND p.lon <= z.lon1
"""


def events_visit_ranks(sf_dir: str):
    """VISITATION-FREQUENCY CURVE (Gonzalez et al.'s f_k ∝ k^-1.2 law:
    how often do people visit their k-th favorite place): every user
    ranks their 10-deg cells by visit count (ties by lowest cell — the
    deterministic argmax contract), and visits aggregate per rank across
    all users. One user-keyed shuffle; the partition kernel double-
    reduceats ((user, cell) counts, then per-user rank under a lexsort)
    and emits bounded (rank, n_users, total_visits) partials; driver
    fold is bounded by the max cells-per-user, never the corpus."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    _empty = pa.table(
        {
            "rank": pa.array([], pa.int64()),
            "u": pa.array([], pa.int64()),
            "v": pa.array([], pa.int64()),
        }
    )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx = ((eid * 104729) % 360000) // _GE_CELL_MILLI
        gy = ((eid * 7919) % 140000) // _GE_CELL_MILLI
        cell = gx * 1024 + gy
        order = np.lexsort((cell, uid))
        uid, cell = uid[order], cell[order]
        newc = np.r_[True, (uid[1:] != uid[:-1]) | (cell[1:] != cell[:-1])]
        cstarts = np.nonzero(newc)[0]
        c = np.diff(np.r_[cstarts, len(uid)]).astype(np.int64)
        cuid = uid[cstarts]
        ccell = cell[cstarts]
        # rank within user by (count desc, cell asc)
        ro = np.lexsort((ccell, -c, cuid))
        ru = cuid[ro]
        ustarts = np.searchsorted(ru, ru)  # first index of each user run
        rank = np.arange(len(ru)) - ustarts + 1
        rc = c[ro]
        u, pos = np.unique(rank, return_inverse=True)
        nu = np.zeros(len(u), np.int64)
        nv = np.zeros(len(u), np.int64)
        np.add.at(nu, pos, 1)
        np.add.at(nv, pos, rc)
        return pa.table(
            {
                "rank": pa.array(u, pa.int64()),
                "u": pa.array(nu, pa.int64()),
                "v": pa.array(nv, pa.int64()),
            }
        )

    t = _collect_table(
        map_groups_partitioned(ds, "user_id", per_part)
    )  # <= partitions x max-cells-per-user rows by construction
    r = t["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
    u_ = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v_ = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    ranks = np.unique(r)
    pos = np.searchsorted(ranks, r)
    nu = np.zeros(len(ranks), np.int64)
    nv = np.zeros(len(ranks), np.int64)
    np.add.at(nu, pos, u_)
    np.add.at(nv, pos, v_)
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "n_users": pa.array(nu, pa.int64()),
            "total_visits": pa.array(nv, pa.int64()),
            "mean_visits": pa.array(
                nv.astype(np.float64) / nu.astype(np.float64), pa.float64()
            ),
        }
    )


EVENTS_VISIT_RANKS_SQL = f"""
WITH pts AS (
  SELECT user_id,
         ((event_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((event_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy
  FROM events),
cc AS (SELECT user_id, gx * 1024 + gy AS cell, CAST(COUNT(*) AS BIGINT) AS c
       FROM pts GROUP BY 1, 2),
ranked AS (
  SELECT user_id, c,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY c DESC, cell) AS rank
  FROM cc)
SELECT rank, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(c) AS BIGINT) AS total_visits,
       CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS mean_visits
FROM ranked GROUP BY 1
"""


def geo_region_mad(sf_dir: str):
    """ROBUST REGIONAL STATISTICS (median + MAD of document length per
    30-deg region): the outlier-resistant pair every data-quality monitor
    prefers over mean/stddev when crawl spam skews a region. Plan: the
    doc_quality_buckets contract regionalized — ONE packed (region,
    n_chars) count pass (DISTINCT VALUES, not rows, reach the driver;
    bounded by regions x distinct lengths), then exact median/MAD from
    the value->count histograms. Float parity: every median is either an
    exact integer or the exact mean of two integers (and MAD's deviation
    values are exact integers-or-halves in double), so interpolation is
    bit-exact against DuckDB MEDIAN — all doubles, no DECIMAL (the
    MEDIAN-of-DECIMAL type trap is mirrored away with explicit DOUBLE
    casts)."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def pack(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx = ((doc_id * 104729) % 360000) // _GT_CELL_MILLI
        gy = ((doc_id * 7919) % 140000) // _GT_CELL_MILLI
        key = ((gx * 16 + gy).astype(np.uint64) << np.uint64(20)) | nch.astype(
            np.uint64
        )
        return pa.table({"key": pa.array(key, pa.uint64())})

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= regions x distinct lengths rows by construction
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    reg = (key >> np.uint64(20)).astype(np.int64)
    val = (key & np.uint64((1 << 20) - 1)).astype(np.int64)

    def _hist_median(vals: np.ndarray, cnts: np.ndarray) -> float:
        o = np.argsort(vals, kind="stable")
        v, n = vals[o].astype(np.float64), cnts[o]
        cum = np.cumsum(n)
        m = int(cum[-1])
        if m % 2 == 1:
            return float(v[np.searchsorted(cum, m // 2 + 1)])
        lo = float(v[np.searchsorted(cum, m // 2)])
        hi = float(v[np.searchsorted(cum, m // 2 + 1)])
        return (lo + hi) / 2.0

    regs = np.unique(reg)
    out_med, out_mad, out_n = [], [], []
    for r in regs:
        m_ = reg == r
        med = _hist_median(val[m_], c[m_])
        dev = np.abs(val[m_].astype(np.float64) - med)
        mad = _hist_median(dev, c[m_])
        out_med.append(med)
        out_mad.append(mad)
        out_n.append(int(c[m_].sum()))
    return pa.table(
        {
            "rx": pa.array(regs // 16, pa.int64()),
            "ry": pa.array(regs % 16, pa.int64()),
            "n_docs": pa.array(out_n, pa.int64()),
            "median_chars": pa.array(out_med, pa.float64()),
            "mad_chars": pa.array(out_mad, pa.float64()),
        }
    )


GEO_REGION_MAD_SQL = f"""
WITH pts AS (
  SELECT ((doc_id * 104729) % 360000) // {_GT_CELL_MILLI} AS rx,
         ((doc_id * 7919) % 140000) // {_GT_CELL_MILLI} AS ry,
         n_chars
  FROM documents),
med AS (
  SELECT rx, ry, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(MEDIAN(CAST(n_chars AS DOUBLE)) AS DOUBLE) AS median_chars
  FROM pts GROUP BY 1, 2),
mad AS (
  SELECT p.rx, p.ry,
         CAST(MEDIAN(ABS(CAST(p.n_chars AS DOUBLE) - m.median_chars))
              AS DOUBLE) AS mad_chars
  FROM pts p JOIN med m ON m.rx = p.rx AND m.ry = p.ry
  GROUP BY 1, 2)
SELECT CAST(m.rx AS BIGINT) AS rx, CAST(m.ry AS BIGINT) AS ry,
       m.n_docs, m.median_chars, d.mad_chars
FROM med m JOIN mad d ON d.rx = m.rx AND d.ry = m.ry
"""


def events_peak_hour(sf_dir: str):
    """DIURNAL PHASE MAP (peak activity hour per 10-deg cell): the
    hour-of-day with the most events in each cell (ties by lowest hour)
    plus its share of the cell's activity — the longitude-tracking
    "when is this region awake" map (timezone inference, send-time
    optimization). ONE packed (cell, hour) count pass (bounded:
    504 x 24), driver argmax under the deterministic (count desc, hour
    asc) order; share = one double division of exact integers."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def pack(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        gx = ((eid * 104729) % 360000) // _GE_CELL_MILLI
        gy = ((eid * 7919) % 140000) // _GE_CELL_MILLI
        hour = (us // 3600000000) % 24
        key = ((gx * 1024 + gy).astype(np.uint64) << np.uint64(5)) | hour.astype(
            np.uint64
        )
        return pa.table({"key": pa.array(key, pa.uint64())})

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= 504 x 24 rows by construction
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    cell = (key >> np.uint64(5)).astype(np.int64)
    hour = (key & np.uint64(31)).astype(np.int64)
    order = np.lexsort((hour, -c, cell))
    cs, hs, ns = cell[order], hour[order], c[order]
    first = np.r_[True, cs[1:] != cs[:-1]]
    tot = np.zeros(len(np.unique(cell)), np.int64)
    np.add.at(tot, np.searchsorted(np.unique(cell), cell), c)
    ucell = cs[first]
    return pa.table(
        {
            "gx": pa.array(ucell // 1024, pa.int64()),
            "gy": pa.array(ucell % 1024, pa.int64()),
            "peak_hour": pa.array(hs[first], pa.int64()),
            "peak_count": pa.array(ns[first], pa.int64()),
            "total": pa.array(tot, pa.int64()),
            "share": pa.array(
                ns[first].astype(np.float64) / tot.astype(np.float64),
                pa.float64(),
            ),
        }
    )


EVENTS_PEAK_HOUR_SQL = f"""
WITH pts AS (
  SELECT ((event_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((event_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy,
         (epoch_us(ts) // 3600000000) % 24 AS hour
  FROM events),
cc AS (SELECT gx, gy, hour, CAST(COUNT(*) AS BIGINT) AS c
       FROM pts GROUP BY 1, 2, 3),
tot AS (SELECT gx, gy, CAST(SUM(c) AS BIGINT) AS total
        FROM cc GROUP BY 1, 2),
best AS (
  SELECT gx, gy, hour, c,
         ROW_NUMBER() OVER (PARTITION BY gx, gy
                            ORDER BY c DESC, hour) AS rn
  FROM cc)
SELECT b.gx, b.gy, CAST(b.hour AS BIGINT) AS peak_hour,
       b.c AS peak_count, t.total,
       CAST(b.c AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
FROM best b JOIN tot t ON t.gx = b.gx AND t.gy = b.gy
WHERE b.rn = 1
"""


def doc_toponym_cooccur(sf_dir: str):
    """TOPONYM CO-OCCURRENCE GRAPH (the knowledge-graph edge builder:
    place names mentioned in the SAME document are related — route
    descriptions, travel pages, news datelines): for every unordered
    pair of the model gazetteer names, the number of documents mentioning
    both. Map-only + one bounded groupby: per batch, one RE2
    word-boundary match per name builds a (B x 4) presence matrix and a
    vectorized pair fold reduces straight to the 6 pair counts — rows
    never shuffle, 6 x n_batches partial rows reach the final sum."""
    from ray.data.aggregate import Sum

    names = _TOPONYMS
    pairs = [
        (i, j) for i in range(len(names)) for j in range(i + 1, len(names))
    ]

    ds = _read(sf_dir, "documents", ["text"])

    def partial(b: pa.Table) -> pa.Table:
        present = np.column_stack(
            [
                pc.match_substring_regex(b["text"], rf"\b{n}\b").to_numpy(
                    zero_copy_only=False
                )
                for n in names
            ]
        )
        cnt = np.asarray(
            [int((present[:, i] & present[:, j]).sum()) for i, j in pairs],
            np.int64,
        )
        return pa.table(
            {
                "pid": pa.array(np.arange(len(pairs)), pa.int64()),
                "c": pa.array(cnt, pa.int64()),
            }
        )

    agg = _collect_table(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("pid")
        .aggregate(Sum("c", alias_name="n_docs"))
    )
    pid = agg["pid"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = agg["n_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pid)
    pid, n = pid[order], n[order]
    return pa.table(
        {
            "name_a": pa.array([names[pairs[p][0]] for p in pid], pa.string()),
            "name_b": pa.array([names[pairs[p][1]] for p in pid], pa.string()),
            "n_docs": pa.array(n, pa.int64()),
        }
    )


_TOPO_PAIR_SQL = " UNION ALL ".join(
    f"SELECT '{_TOPONYMS[i]}' AS name_a, '{_TOPONYMS[j]}' AS name_b"
    for i in range(len(_TOPONYMS))
    for j in range(i + 1, len(_TOPONYMS))
)

DOC_TOPONYM_COOCCUR_SQL = f"""
WITH pairs AS ({_TOPO_PAIR_SQL})
SELECT p.name_a, p.name_b,
       CAST(COUNT(CASE WHEN regexp_matches(d.text, '\\b' || p.name_a || '\\b')
                        AND regexp_matches(d.text, '\\b' || p.name_b || '\\b')
                  THEN 1 END) AS BIGINT) AS n_docs
FROM pairs p CROSS JOIN documents d
GROUP BY 1, 2
"""


_CDC_Q = 10.0  # distance quantizer: keeps n * sum(x^2) inside int64
# (max min-d2 ~7.6e3 deg^2 -> x <= 7.6e4, n*sxx < 2e17 at sf0.1; a corpus
# past ~1e8 docs widens the moments to two-limb accumulators)


def geo_chars_dist_corr(sf_dir: str):
    """SPATIAL CORRELATION TEST (Pearson r between document length and
    distance to the nearest facility): "is content thinner far from the
    hubs?" — the hypothesis-test primitive behind coverage-equity
    audits. Exactness: the distance quantizes to integer micro-units
    (floor(d2*Q), the nearest-facility contract), n_chars is already
    integer, all five moments (n, sx, sy, sxy, sxx, syy) are exact
    order-free int64 partials from ONE map-only pass (no shuffle —
    6 scalars per batch reach the tiny groupby), and
    r = (n*sxy - sx*sy) / (sqrt(n*sxx - sx^2) * sqrt(n*syy - sy^2)) is
    one fixed chain of two correctly-rounded sqrts over exact
    integers."""
    from ray.data.aggregate import Sum

    k = np.arange(12, dtype=np.int64)
    f_lat = ((k * 11003) % 120000) / 1000.0 - 60.0
    f_lon = ((k * 104729) % 340000) / 1000.0 - 170.0

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(doc_id)
        dla = lat[:, None] - f_lat[None, :]
        dlo = lon[:, None] - f_lon[None, :]
        d2 = dla * dla + dlo * dlo
        x = np.floor(d2.min(axis=1) * _CDC_Q).astype(np.int64)
        return pa.table(
            {
                "one": pa.array([1], pa.int64()),
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
            }
        )

    agg = _collect_table(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("one")
        .aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
            Sum("sxx", alias_name="sxx"), Sum("syy", alias_name="syy"),
        )
    )
    n = int(agg["n"][0].as_py())
    sx = int(agg["sx"][0].as_py())
    sy = int(agg["sy"][0].as_py())
    sxy = int(agg["sxy"][0].as_py())
    sxx = int(agg["sxx"][0].as_py())
    syy = int(agg["syy"][0].as_py())
    num = n * sxy - sx * sy
    r = float(
        np.float64(num)
        / (
            np.sqrt(np.float64(n * sxx - sx * sx))
            * np.sqrt(np.float64(n * syy - sy * sy))
        )
    )
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "corr_num": pa.array([num], pa.int64()),
            "pearson_r": pa.array([r], pa.float64()),
        }
    )


GEO_CHARS_DIST_CORR_SQL = f"""
WITH pts AS (
  SELECT doc_id, n_chars, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon
  FROM documents),
facs AS (
  SELECT k AS fac_id,
         ((k * 11003) % 120000) / 1000.0 - 60.0 AS flat,
         ((k * 104729) % 340000) / 1000.0 - 170.0 AS flon
  FROM range(12) t(k)),
nearest AS (
  SELECT p.doc_id, p.n_chars AS y,
         CAST(FLOOR(MIN((p.lat - f.flat) * (p.lat - f.flat)
                        + (p.lon - f.flon) * (p.lon - f.flon))
                    * {_CDC_Q}) AS BIGINT) AS x
  FROM pts p CROSS JOIN facs f GROUP BY 1, 2),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM nearest)
SELECT n AS n_docs, n * sxy - sx * sy AS corr_num,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
            * SQRT(CAST(n * syy - sy * sy AS DOUBLE))) AS pearson_r
FROM m
"""


def events_mann_kendall(sf_dir: str):
    """MANN-KENDALL TREND TEST per 10-deg cell (the NONPARAMETRIC trend
    detector under "emerging hot spot" analysis — robust where the
    least-squares slope of events_tile_trend is outlier-fragile):
    S = sum over day pairs of sign(c_j - c_i), with the tie-corrected
    variance var = (n(n-1)(2n+5) - sum t(t-1)(2t+5)) / 18 and the
    continuity-corrected z. Exactness: S and 18*var are exact integers
    from the BOUNDED (cell, day) count table (one packed-u64 pass, the
    events_tile_trend shape); z = one fixed chain — (S-1)/sqrt(var),
    (S+1)/sqrt(var) or 0 — of exact integers through one correctly-
    rounded sqrt. Cells with < 2 days are excluded."""
    from core_ray.stages.agg import count_by_u64
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def day_of(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"day": pa.array(us // _TT_DAY_US, pa.int64())})

    d0 = int(
        ds.map_batches(day_of, batch_format="pyarrow", batch_size=131072)
        .aggregate(Min("day"))["min(day)"]
    )

    def pack(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        gx = ((eid * 104729) % 360000) // _GE_CELL_MILLI
        gy = ((eid * 7919) % 140000) // _GE_CELL_MILLI
        x = us // _TT_DAY_US - d0
        key = ((gx * 1024 + gy).astype(np.uint64) << np.uint64(24)) | x.astype(
            np.uint64
        )
        return pa.table({"key": pa.array(key, pa.uint64())})

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= cells x horizon days rows by construction
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    cell = (key >> np.uint64(24)).astype(np.int64)
    day = (key & np.uint64((1 << 24) - 1)).astype(np.int64)

    order = np.lexsort((day, cell))
    cell, day, c = cell[order], day[order], c[order]
    starts = np.nonzero(np.r_[True, cell[1:] != cell[:-1]])[0]
    ends = np.r_[starts[1:], len(cell)]

    out = []
    for s_, e_ in zip(starts, ends):
        v = c[s_:e_]  # day-ordered counts (days with zero events absent —
        # the series is over OBSERVED days, documented semantics)
        n = len(v)
        if n < 2:
            continue
        diff = np.sign(v[None, :] - v[:, None])
        S = int(np.triu(diff, 1).sum())
        _, tie_c = np.unique(v, return_counts=True)
        var18 = int(n * (n - 1) * (2 * n + 5)) - int(
            (tie_c * (tie_c - 1) * (2 * tie_c + 5)).sum()
        )
        if S > 0:
            z = float(np.float64(S - 1) / np.sqrt(np.float64(var18) / 18.0))
        elif S < 0:
            z = float(np.float64(S + 1) / np.sqrt(np.float64(var18) / 18.0))
        else:
            z = 0.0
        out.append((int(cell[s_]) // 1024, int(cell[s_]) % 1024, n, S,
                    var18, z))
    return pa.table(
        {
            "gx": pa.array([r[0] for r in out], pa.int64()),
            "gy": pa.array([r[1] for r in out], pa.int64()),
            "n_days": pa.array([r[2] for r in out], pa.int64()),
            "s_stat": pa.array([r[3] for r in out], pa.int64()),
            "var18": pa.array([r[4] for r in out], pa.int64()),
            "z": pa.array([r[5] for r in out], pa.float64()),
        }
    )


EVENTS_MANN_KENDALL_SQL = f"""
WITH base AS (
  SELECT MIN(epoch_us(ts) // {_TT_DAY_US}) AS d0 FROM events),
pts AS (
  SELECT ((event_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((event_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy,
         epoch_us(ts) // {_TT_DAY_US} - base.d0 AS x
  FROM events, base),
cd AS (SELECT gx, gy, x, CAST(COUNT(*) AS BIGINT) AS c
       FROM pts GROUP BY 1, 2, 3),
s AS (
  SELECT a.gx, a.gy,
         CAST(SUM(CASE WHEN b.c > a.c THEN 1
                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
  FROM cd a JOIN cd b ON b.gx = a.gx AND b.gy = a.gy AND b.x > a.x
  GROUP BY 1, 2),
nn AS (SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS n FROM cd GROUP BY 1, 2),
ties AS (
  SELECT gx, gy,
         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS t
        FROM cd GROUP BY gx, gy, c)
  GROUP BY 1, 2),
m AS (
  SELECT n.gx, n.gy, n.n, COALESCE(s.s_stat, 0) AS s_stat,
         n.n * (n.n - 1) * (2 * n.n + 5) - t.tie_term AS var18
  FROM nn n
  LEFT JOIN s ON s.gx = n.gx AND s.gy = n.gy
  JOIN ties t ON t.gx = n.gx AND t.gy = n.gy
  WHERE n.n >= 2)
SELECT gx, gy, n AS n_days, s_stat, var18,
       CASE WHEN s_stat > 0 THEN
              CAST(s_stat - 1 AS DOUBLE)
                / SQRT(CAST(var18 AS DOUBLE) / 18.0)
            WHEN s_stat < 0 THEN
              CAST(s_stat + 1 AS DOUBLE)
                / SQRT(CAST(var18 AS DOUBLE) / 18.0)
            ELSE 0.0 END AS z
FROM m
"""


def events_sen_slope(sf_dir: str):
    """SEN'S SLOPE per 10-deg cell (the robust trend MAGNITUDE companion
    to Mann-Kendall's trend test: median of all pairwise day-count
    slopes — one wild day cannot move it, unlike least squares): from
    the same bounded (cell, day) count table, every i<j pair yields
    slope (c_j - c_i)/(x_j - x_i) (ONE double division, identical on
    both sides), and the median is taken by EXPLICIT rank — lo = the
    ceil(m/2)-th, hi = the (floor(m/2)+1)-th ordered slope, result
    (lo + hi) / 2.0 — never DuckDB's MEDIAN, whose interpolation
    expression could differ in the last ulp on arbitrary doubles (the
    geo_region_mad integers-and-halves case is safe; this one is not).
    Cells with < 2 observed days are excluded."""
    from core_ray.stages.agg import count_by_u64
    from ray.data.aggregate import Min

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def day_of(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"day": pa.array(us // _TT_DAY_US, pa.int64())})

    d0 = int(
        ds.map_batches(day_of, batch_format="pyarrow", batch_size=131072)
        .aggregate(Min("day"))["min(day)"]
    )

    def pack(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        gx = ((eid * 104729) % 360000) // _GE_CELL_MILLI
        gy = ((eid * 7919) % 140000) // _GE_CELL_MILLI
        x = us // _TT_DAY_US - d0
        key = ((gx * 1024 + gy).astype(np.uint64) << np.uint64(24)) | x.astype(
            np.uint64
        )
        return pa.table({"key": pa.array(key, pa.uint64())})

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= cells x horizon days rows by construction
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    cell = (key >> np.uint64(24)).astype(np.int64)
    day = (key & np.uint64((1 << 24) - 1)).astype(np.int64)

    order = np.lexsort((day, cell))
    cell, day, c = cell[order], day[order], c[order]
    starts = np.nonzero(np.r_[True, cell[1:] != cell[:-1]])[0]
    ends = np.r_[starts[1:], len(cell)]

    out = []
    for s_, e_ in zip(starts, ends):
        xs = day[s_:e_].astype(np.float64)
        vs = c[s_:e_].astype(np.float64)
        n = len(xs)
        if n < 2:
            continue
        iu, ju = np.triu_indices(n, 1)
        slopes = np.sort((vs[ju] - vs[iu]) / (xs[ju] - xs[iu]))
        m = len(slopes)
        lo = slopes[(m + 1) // 2 - 1]
        hi = slopes[m // 2]
        out.append(
            (int(cell[s_]) // 1024, int(cell[s_]) % 1024, n, m,
             float((lo + hi) / 2.0))
        )
    return pa.table(
        {
            "gx": pa.array([r[0] for r in out], pa.int64()),
            "gy": pa.array([r[1] for r in out], pa.int64()),
            "n_days": pa.array([r[2] for r in out], pa.int64()),
            "n_pairs": pa.array([r[3] for r in out], pa.int64()),
            "sen_slope": pa.array([r[4] for r in out], pa.float64()),
        }
    )


EVENTS_SEN_SLOPE_SQL = f"""
WITH base AS (
  SELECT MIN(epoch_us(ts) // {_TT_DAY_US}) AS d0 FROM events),
pts AS (
  SELECT ((event_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((event_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy,
         epoch_us(ts) // {_TT_DAY_US} - base.d0 AS x
  FROM events, base),
cd AS (SELECT gx, gy, x, CAST(COUNT(*) AS BIGINT) AS c
       FROM pts GROUP BY 1, 2, 3),
slopes AS (
  SELECT a.gx, a.gy,
         (CAST(b.c AS DOUBLE) - CAST(a.c AS DOUBLE))
           / (CAST(b.x AS DOUBLE) - CAST(a.x AS DOUBLE)) AS s
  FROM cd a JOIN cd b ON b.gx = a.gx AND b.gy = a.gy AND b.x > a.x),
ranked AS (
  SELECT gx, gy, s,
         ROW_NUMBER() OVER (PARTITION BY gx, gy ORDER BY s) AS rn,
         COUNT(*) OVER (PARTITION BY gx, gy) AS m
  FROM slopes),
nn AS (SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS n_days
       FROM cd GROUP BY 1, 2)
SELECT r.gx, r.gy, n.n_days, CAST(MAX(r.m) AS BIGINT) AS n_pairs,
       (MAX(CASE WHEN r.rn = (r.m + 1) // 2 THEN r.s END)
        + MAX(CASE WHEN r.rn = r.m // 2 + 1 THEN r.s END)) / 2.0 AS sen_slope
FROM ranked r JOIN nn n ON n.gx = r.gx AND n.gy = r.gy
GROUP BY r.gx, r.gy, n.n_days
"""


def geo_join_counts(sf_dir: str):
    """CLIFF-ORD JOIN-COUNT STATISTICS (the binary spatial-autocorrelation
    test): cells are colored Black (document count STRICTLY above the
    global occupied-cell median) or White, and rook-adjacent pairs are
    counted as BB / BW / WW — clustered hot spots inflate BB, a
    checkerboard inflates BW. Exactness: all-integer — exact cell counts
    from one packed pass (geometry-bounded), the median threshold from
    the value histogram (integer-or-half, exact), pair counts by the
    right/down single-emission adjacency rule (each edge once, at its
    left/upper cell — the geo_moran_i convention); only OCCUPIED cells
    participate (empty cells are outside the lattice, documented
    semantics)."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "documents", ["doc_id"])

    def pack(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx = ((doc_id * 104729) % 360000) // _GE_CELL_MILLI
        gy = ((doc_id * 7919) % 140000) // _GE_CELL_MILLI
        return pa.table(
            {"key": pa.array((gx * 1024 + gy).astype(np.uint64), pa.uint64())}
        )

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= 504 rows by construction
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    cs = np.sort(c)
    m = len(cs)
    med = (
        float(cs[(m - 1) // 2])
        if m % 2 == 1
        else (float(cs[m // 2 - 1]) + float(cs[m // 2])) / 2.0
    )
    black = dict(zip(key.tolist(), (c.astype(np.float64) > med).tolist()))

    bb = bw = ww = 0
    for cl, isb in black.items():
        for nb in (cl + 1024, cl + 1):  # right, down
            nbv = black.get(nb)
            if nbv is None:
                continue
            if isb and nbv:
                bb += 1
            elif isb != nbv:
                bw += 1
            else:
                ww += 1
    return pa.table(
        {
            "n_cells": pa.array([m], pa.int64()),
            "n_black": pa.array([int(sum(black.values()))], pa.int64()),
            "bb": pa.array([bb], pa.int64()),
            "bw": pa.array([bw], pa.int64()),
            "ww": pa.array([ww], pa.int64()),
        }
    )


GEO_JOIN_COUNTS_SQL = f"""
WITH pts AS (
  SELECT ((doc_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((doc_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy
  FROM documents),
cc AS (SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS c FROM pts GROUP BY 1, 2),
med AS (
  SELECT (MAX(CASE WHEN rn = (m + 1) // 2 THEN cd END)
          + MAX(CASE WHEN rn = m // 2 + 1 THEN cd END)) / 2.0 AS v
  FROM (SELECT CAST(c AS DOUBLE) AS cd,
               ROW_NUMBER() OVER (ORDER BY c) AS rn,
               COUNT(*) OVER () AS m
        FROM cc)),
col AS (
  SELECT gx, gy, CAST(cc.c AS DOUBLE) > med.v AS b
  FROM cc CROSS JOIN med),
edges AS (
  SELECT a.b AS ba, n.b AS bn
  FROM col a JOIN col n
    ON ((n.gx = a.gx + 1 AND n.gy = a.gy)
        OR (n.gx = a.gx AND n.gy = a.gy + 1)))
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cc) AS n_cells,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM col WHERE b) AS n_black,
       CAST(COUNT(CASE WHEN ba AND bn THEN 1 END) AS BIGINT) AS bb,
       CAST(COUNT(CASE WHEN ba <> bn THEN 1 END) AS BIGINT) AS bw,
       CAST(COUNT(CASE WHEN NOT ba AND NOT bn THEN 1 END) AS BIGINT) AS ww
FROM edges
"""


_KNOX_R = 0.25  # Knox spatial threshold (degrees)
_KNOX_TAU = 3600000000  # Knox time window (1 h, microseconds)


def events_knox(sf_dir: str):
    """KNOX SPACE-TIME INTERACTION TEST (the epidemiology/crime-analysis
    classic: do events cluster in space AND time TOGETHER beyond what
    their spatial and temporal margins imply?): X = pairs within 0.25 deg
    AND 1 h over the clustered city/jitter coordinates, N_s / N_t the
    one-axis margins, and the interaction ratio
    X * C(n,2) / (N_s * N_t) (> 1 = space-time interaction). Exactness +
    scale: X reuses the 3D home+ghost contact join (stages/stjoin, uid =
    event_id so ALL pairs count), N_s the 2D distance-band join — both
    count-only consumers of streaming pair Datasets; N_t is a 1D
    home+ghost bucket kernel where same-bucket pairs are within tau BY
    CONSTRUCTION (bucket width = tau, so only adjacent-bucket pairs need
    the exact integer-microsecond check); every count is an exact int and
    the ratio is ONE double division (X*C(n,2) stays in int64 to ~1e9
    corpus pairs-within — widening documented)."""
    import ray

    from core_ray.stages.agg import map_groups_partitioned
    from core_ray.stages.distband import distance_pairs
    from core_ray.stages.stjoin import spacetime_pairs

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def shape(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid_ = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        # clustered city/jitter coordinates (events_contacts' model): the
        # raw multiplicative lattice anti-clusters — it has NO pairs
        # within any small radius by construction
        lat, lon = _contact_coords(eid, uid_)
        return pa.table(
            {
                "pid": pa.array(eid, pa.int64()),
                "uid": pa.array(eid, pa.int64()),
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
                "us": pa.array(us, pa.int64()),
            }
        )

    shaped = ds.map_batches(shape, batch_format="pyarrow",
                            batch_size=65536).materialize()
    n = shaped.count()
    x_cnt = spacetime_pairs(shaped, _KNOX_R, _KNOX_TAU).count()
    n_s = distance_pairs(
        shaped.map_batches(
            lambda b: pa.table(
                {"doc_id": b["pid"], "lat": b["lat"], "lon": b["lon"]}
            ),
            batch_format="pyarrow",
        ),
        _KNOX_R,
    ).count()

    def t_rep(b: pa.Table) -> pa.Table:
        us = b["us"].to_numpy(zero_copy_only=False)
        bkt = us // _KNOX_TAU
        return pa.table(
            {
                "tb": pa.array(
                    np.concatenate([bkt, bkt + 1]).astype(np.uint64),
                    pa.uint64(),
                ),
                "home": pa.array(
                    np.r_[np.ones(len(us), np.int8),
                          np.zeros(len(us), np.int8)],
                    pa.int8(),
                ),
                "us": pa.array(np.tile(us, 2), pa.int64()),
            }
        )

    def t_count(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"c": pa.array([], pa.int64())})
        tb = g["tb"].to_numpy(zero_copy_only=False).astype(np.uint64)
        home = g["home"].to_numpy(zero_copy_only=False)
        us = g["us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((us, home, tb))
        tb, home, us = tb[order], home[order], us[order]
        total = 0
        starts = np.nonzero(np.r_[True, tb[1:] != tb[:-1]])[0]
        ends = np.r_[starts[1:], len(tb)]
        for s_, e_ in zip(starts, ends):
            h = us[s_:e_][home[s_:e_] == 1]
            gst = us[s_:e_][home[s_:e_] == 0]
            # same-bucket pairs: within tau by construction
            total += len(h) * (len(h) - 1) // 2
            if len(h) and len(gst):
                gs = np.sort(gst)
                lo = np.searchsorted(gs, h - _KNOX_TAU, side="left")
                total += int((len(gs) - lo).sum())
        return pa.table({"c": pa.array([total], pa.int64())})

    t_parts = map_groups_partitioned(
        shaped.map_batches(t_rep, batch_format="pyarrow", batch_size=65536),
        "tb",
        t_count,
    )
    n_t = int(
        sum(
            int(pc.sum(b["c"]).as_py() or 0)
            for b in t_parts.iter_batches(batch_format="pyarrow")
        )
    )

    c2 = n * (n - 1) // 2
    ratio = float(
        np.float64(x_cnt * c2) / (np.float64(n_s) * np.float64(n_t))
    )
    return pa.table(
        {
            "n_events": pa.array([n], pa.int64()),
            "x_spacetime": pa.array([x_cnt], pa.int64()),
            "n_space": pa.array([n_s], pa.int64()),
            "n_time": pa.array([n_t], pa.int64()),
            "knox_ratio": pa.array([ratio], pa.float64()),
        }
    )


EVENTS_KNOX_SQL = f"""
WITH pts AS (
  SELECT event_id, epoch_us(ts) AS us,
         {CONTACT_LAT_SQL} AS lat, {CONTACT_LON_SQL} AS lon FROM events),
st AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS x
  FROM pts a JOIN pts b
    ON b.event_id > a.event_id
   AND b.lat BETWEEN a.lat - {_KNOX_R} AND a.lat + {_KNOX_R}
   AND b.lon BETWEEN a.lon - {_KNOX_R} AND a.lon + {_KNOX_R}
  WHERE (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon) <= {_KNOX_R * _KNOX_R}
    AND ABS(a.us - b.us) <= {_KNOX_TAU}),
sp AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_s
  FROM pts a JOIN pts b
    ON b.event_id > a.event_id
   AND b.lat BETWEEN a.lat - {_KNOX_R} AND a.lat + {_KNOX_R}
   AND b.lon BETWEEN a.lon - {_KNOX_R} AND a.lon + {_KNOX_R}
  WHERE (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon) <= {_KNOX_R * _KNOX_R}),
tm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_t
  FROM pts a JOIN pts b
    ON b.event_id > a.event_id
   AND b.us BETWEEN a.us - {_KNOX_TAU} AND a.us + {_KNOX_TAU}),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts)
SELECT nn.n AS n_events, st.x AS x_spacetime, sp.n_s AS n_space,
       tm.n_t AS n_time,
       CAST(st.x * (nn.n * (nn.n - 1) // 2) AS DOUBLE)
         / (CAST(sp.n_s AS DOUBLE) * CAST(tm.n_t AS DOUBLE)) AS knox_ratio
FROM nn, st, sp, tm
"""


def events_type_region_chisq(sf_dir: str):
    """CHI-SQUARE INDEPENDENCE TEST (event type x 30-deg region): does
    behavior differ by geography, the contingency-table first question of
    every regional product analysis. Counts per (type, region) come from
    one packed pass (bounded: types x regions); marginals and N are exact
    integer sums; each cell's contribution (n*o - r*c)^2 / (n*r*c) — the
    cross-multiplied form of (o - e)^2/e scaled by n — quantizes to
    integer micro-units (sql_round_np == DuckDB ROUND; numerator exact
    int64 up to ~3e9 events under these cardinalities), so chi2 is an
    exact integer sum divided once. Output includes dof for the test
    lookup."""
    import ray
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def type_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(b["event_type"].to_pylist()))
        return pa.table({"event_type": pa.array(u.tolist(), pa.string()),
                         "one": pa.array(np.ones(len(u), np.int64))})

    ty_t = _collect_table(
        ds.select_columns(["event_type"])
        .map_batches(type_partial, batch_format="pyarrow", batch_size=131072)
        .groupby("event_type")
        .aggregate(Sum("one", alias_name="n"))
    )
    types = np.sort(np.asarray(ty_t["event_type"].to_pylist()))
    ty_ref = ray.put(types)

    def pack(b: pa.Table) -> pa.Table:
        ts = ray.get(ty_ref)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(ts, np.asarray(b["event_type"].to_pylist()))
        rx = ((eid * 104729) % 360000) // _GT_CELL_MILLI
        ry = ((eid * 7919) % 140000) // _GT_CELL_MILLI
        key = (idx.astype(np.uint64) << np.uint64(16)) | (
            (rx * 16 + ry).astype(np.uint64)
        )
        return pa.table({"key": pa.array(key, pa.uint64())})

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= types x regions rows by construction
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    o = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    ti = (key >> np.uint64(16)).astype(np.int64)
    reg = (key & np.uint64((1 << 16) - 1)).astype(np.int64)
    regs = np.unique(reg)
    rpos = np.searchsorted(regs, reg)
    r_m = np.zeros(len(types), np.int64)  # per-type marginal
    c_m = np.zeros(len(regs), np.int64)  # per-region marginal
    np.add.at(r_m, ti, o)
    np.add.at(c_m, rpos, o)
    n = int(o.sum())
    # every (type, region) combination contributes — including zeros
    full_r = np.repeat(np.arange(len(types)), len(regs))
    full_c = np.tile(np.arange(len(regs)), len(types))
    dense = np.zeros((len(types), len(regs)), np.int64)
    dense[ti, rpos] = o
    obs = dense[full_r, full_c]
    rr = r_m[full_r]
    cc = c_m[full_c]
    num = (n * obs - rr * cc).astype(np.float64) ** 2
    micro = sql_round_np(
        num / (np.float64(n) * rr.astype(np.float64) * cc.astype(np.float64))
        * 1000000.0,
        0,
    ).astype(np.int64)
    chisq = float(np.float64(int(micro.sum())) / 1000000.0)
    dof = (len(types) - 1) * (len(regs) - 1)
    return pa.table(
        {
            "n_events": pa.array([n], pa.int64()),
            "n_types": pa.array([len(types)], pa.int64()),
            "n_regions": pa.array([len(regs)], pa.int64()),
            "dof": pa.array([dof], pa.int64()),
            "sum_micro": pa.array([int(micro.sum())], pa.int64()),
            "chisq": pa.array([chisq], pa.float64()),
        }
    )


EVENTS_TYPE_REGION_CHISQ_SQL = f"""
WITH pts AS (
  SELECT event_type,
         ((event_id * 104729) % 360000) // {_GT_CELL_MILLI} AS rx,
         ((event_id * 7919) % 140000) // {_GT_CELL_MILLI} AS ry
  FROM events),
cc AS (SELECT event_type, rx, ry, CAST(COUNT(*) AS BIGINT) AS o
       FROM pts GROUP BY 1, 2, 3),
tm AS (SELECT event_type, CAST(SUM(o) AS BIGINT) AS r FROM cc GROUP BY 1),
rm AS (SELECT rx, ry, CAST(SUM(o) AS BIGINT) AS c FROM cc GROUP BY 1, 2),
nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cc),
grid AS (
  SELECT t.event_type, r.rx, r.ry, t.r, r.c, COALESCE(o.o, 0) AS o, nn.n
  FROM tm t CROSS JOIN rm r CROSS JOIN nn
  LEFT JOIN cc o ON o.event_type = t.event_type
               AND o.rx = r.rx AND o.ry = r.ry),
terms AS (
  SELECT CAST(ROUND(
           CAST((n * o - r * c) * (n * o - r * c) AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
             * 1000000.0, 0) AS BIGINT) AS m,
         n
  FROM grid)
SELECT MAX(n) AS n_events,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM tm) AS n_types,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM rm) AS n_regions,
       ((SELECT COUNT(*) FROM tm) - 1)
         * ((SELECT COUNT(*) FROM rm) - 1) AS dof,
       CAST(SUM(m) AS BIGINT) AS sum_micro,
       CAST(CAST(SUM(m) AS BIGINT) AS DOUBLE) / 1000000.0 AS chisq
FROM terms
"""


def doc_length_ks(sf_dir: str):
    """KOLMOGOROV-SMIRNOV TWO-SAMPLE TEST (east- vs west-hemisphere
    document lengths): are the two distributions the same? — the
    distribution-drift detector behind region-split A/B checks and crawl
    regression alarms. EXACT: from one packed (hemisphere, n_chars)
    count pass (distinct values reach the driver — the histogram
    contract), the KS statistic cross-multiplies to integers:
    D = max_v |n_w * cum_e(v) - n_e * cum_w(v)| / (n_e * n_w) — the max
    numerator is an exact int64 scan over the merged value grid, and D
    is ONE double division."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def pack(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        east = ((doc_id * 104729) % 360000) >= 180000  # lon >= 0
        key = (east.astype(np.uint64) << np.uint64(20)) | nch.astype(
            np.uint64
        )
        return pa.table({"key": pa.array(key, pa.uint64())})

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= 2 x distinct lengths rows by construction
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    east = (key >> np.uint64(20)).astype(bool)
    val = (key & np.uint64((1 << 20) - 1)).astype(np.int64)
    grid = np.unique(val)
    ce = np.zeros(len(grid), np.int64)
    cw = np.zeros(len(grid), np.int64)
    np.add.at(ce, np.searchsorted(grid, val[east]), c[east])
    np.add.at(cw, np.searchsorted(grid, val[~east]), c[~east])
    n_e, n_w = int(ce.sum()), int(cw.sum())
    cum_e = np.cumsum(ce)
    cum_w = np.cumsum(cw)
    num = np.abs(n_w * cum_e - n_e * cum_w)
    d_num = int(num.max())
    return pa.table(
        {
            "n_east": pa.array([n_e], pa.int64()),
            "n_west": pa.array([n_w], pa.int64()),
            "d_num": pa.array([d_num], pa.int64()),
            "ks_d": pa.array(
                [float(np.float64(d_num) / np.float64(n_e * n_w))],
                pa.float64(),
            ),
        }
    )


DOC_LENGTH_KS_SQL = """
WITH pts AS (
  SELECT n_chars,
         (doc_id * 104729) % 360000 >= 180000 AS east
  FROM documents),
cc AS (
  SELECT n_chars,
         CAST(COUNT(CASE WHEN east THEN 1 END) AS BIGINT) AS ce,
         CAST(COUNT(CASE WHEN NOT east THEN 1 END) AS BIGINT) AS cw
  FROM pts GROUP BY 1),
cum AS (
  SELECT SUM(ce) OVER (ORDER BY n_chars) AS cum_e,
         SUM(cw) OVER (ORDER BY n_chars) AS cum_w
  FROM cc),
tot AS (
  SELECT CAST(SUM(ce) AS BIGINT) AS n_e, CAST(SUM(cw) AS BIGINT) AS n_w
  FROM cc),
d AS (
  SELECT CAST(MAX(ABS(tot.n_w * cum.cum_e - tot.n_e * cum.cum_w)) AS BIGINT)
           AS d_num
  FROM cum CROSS JOIN tot)
SELECT tot.n_e AS n_east, tot.n_w AS n_west, d.d_num,
       CAST(d.d_num AS DOUBLE)
         / CAST(tot.n_e * tot.n_w AS DOUBLE) AS ks_d
FROM tot, d
"""


_HEAPS_POINTS = 8  # power-of-2 prefix checkpoints for the growth fit


def doc_heaps_law(sf_dir: str):
    """HEAPS' LAW FIT (vocabulary growth V(n) ∝ n^beta — natural text sits
    near beta ≈ 0.5; beta -> 0 flags a closed template vocabulary, the
    companion tripwire to doc_zipf_fit): V at power-of-2 document-prefix
    checkpoints, WITHOUT any ordered scan — the trick is that
    V(prefix k) = #{words whose FIRST occurrence (min doc_id) < k}, so
    ONE word-partitioned min pass (the doc_vocab shape with min instead
    of sum) + a bounded first-occurrence histogram gives every
    checkpoint at once. beta = the micro-bit-quantized log-log
    regression slope (the doc_zipf_fit algebra) over the checkpoints."""
    from core_ray.stages.agg import _GOLD, _n_parts, hash_strings

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_parts = _n_parts()

    def first_partial(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = b["text"].to_pylist()
        toks = np.asarray([w for t in texts for w in t.split(" ")])
        if len(toks) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "m": pa.array([], pa.int64()),
                 "__part": pa.array([], pa.int32())}
            )
        did = np.repeat(
            doc_id, np.asarray([len(t.split(" ")) for t in texts], np.int64)
        )
        order = np.lexsort((did, toks))
        ts_, ds_ = toks[order], did[order]
        firsts = np.r_[True, ts_[1:] != ts_[:-1]]
        u, m = ts_[firsts], ds_[firsts]
        h = hash_strings(pa.array(u, pa.string()))
        return pa.table(
            {
                "token": pa.array(u, pa.string()),
                "m": pa.array(m, pa.int64()),
                "__part": pa.array(
                    ((h * _GOLD) % np.uint64(n_parts)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    def reduce_part(g: pa.Table) -> pa.Table:
        toks = np.asarray(g["token"].to_pylist())
        m = g["m"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((m, toks))
        ts_, ms_ = toks[order], m[order]
        firsts = np.r_[True, ts_[1:] != ts_[:-1]]
        fm = ms_[firsts]  # global first-occurrence doc per token
        # bounded histogram: count of first occurrences per checkpoint
        # bucket (checkpoints are doc_id thresholds 2^k scaled to corpus)
        return pa.table({"first_doc": pa.array(fm, pa.int64())})

    firsts_ds = (
        ds.map_batches(first_partial, batch_format="pyarrow",
                       batch_size=2048)
        .groupby("__part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )

    # bounded reduction: V(k) needs only the histogram of first_doc over
    # checkpoint boundaries — reduce inside a map pass, never collect words
    max_doc = int(
        _collect_table(
            _read(sf_dir, "documents", ["doc_id"]).map_batches(
                lambda b: pa.table(
                    {
                        "m": pa.array(
                            [int(b["doc_id"].to_numpy(
                                zero_copy_only=False).max())],
                            pa.int64(),
                        )
                    }
                ),
                batch_format="pyarrow",
            )
        )["m"].to_numpy().max()
    )
    bounds = [
        max_doc * (k + 1) // _HEAPS_POINTS for k in range(_HEAPS_POINTS)
    ]

    def hist(b: pa.Table) -> pa.Table:
        fd = b["first_doc"].to_numpy(zero_copy_only=False)
        counts = np.asarray(
            [int((fd <= t).sum()) for t in bounds], np.int64
        )
        return pa.table(
            {
                "ck": pa.array(np.arange(_HEAPS_POINTS), pa.int64()),
                "v": pa.array(counts, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = _collect_table(
        firsts_ds.map_batches(hist, batch_format="pyarrow")
        .groupby("ck")
        .aggregate(Sum("v", alias_name="v"))
    )
    ck = agg["ck"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = agg["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ck)
    v = v[order]
    n_docs_at = np.asarray(bounds, np.int64) + 1  # doc_id <= t inclusive

    x = sql_round_np(
        np.log2(n_docs_at.astype(np.float64)) * 1000000.0, 0
    ).astype(np.int64)
    y = sql_round_np(
        np.log2(v.astype(np.float64)) * 1000000.0, 0
    ).astype(np.int64)
    k = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    num = k * sxy - sx * sy
    den = k * sxx - sx * sx
    return pa.table(
        {
            "checkpoint": pa.array(np.asarray(bounds, np.int64), pa.int64()),
            "vocab": pa.array(v, pa.int64()),
            "beta_num": pa.array(np.full(k, num, np.int64), pa.int64()),
            "beta_den": pa.array(np.full(k, den, np.int64), pa.int64()),
            "heaps_beta": pa.array(
                np.full(k, float(np.float64(num) / np.float64(den))),
                pa.float64(),
            ),
        }
    )


DOC_HEAPS_LAW_SQL = f"""
WITH firsts AS (
  SELECT UNNEST(string_split(text, ' ')) AS w, doc_id FROM documents),
fw AS (SELECT w, CAST(MIN(doc_id) AS BIGINT) AS m FROM firsts GROUP BY 1),
md AS (SELECT CAST(MAX(doc_id) AS BIGINT) AS mx FROM documents),
cks AS (
  SELECT k, md.mx * (k + 1) // {_HEAPS_POINTS} AS t
  FROM range({_HEAPS_POINTS}) r(k) CROSS JOIN md),
vv AS (
  SELECT c.k, c.t AS checkpoint,
         CAST(COUNT(CASE WHEN fw.m <= c.t THEN 1 END) AS BIGINT) AS vocab
  FROM cks c CROSS JOIN fw GROUP BY 1, 2),
q AS (
  SELECT k, checkpoint, vocab,
         CAST(ROUND(LOG2(CAST(checkpoint + 1 AS DOUBLE)) * 1000000.0, 0)
              AS BIGINT) AS x,
         CAST(ROUND(LOG2(CAST(vocab AS DOUBLE)) * 1000000.0, 0)
              AS BIGINT) AS y
  FROM vv),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS kk, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM q)
SELECT q.checkpoint, q.vocab,
       m.kk * m.sxy - m.sx * m.sy AS beta_num,
       m.kk * m.sxx - m.sx * m.sx AS beta_den,
       CAST(m.kk * m.sxy - m.sx * m.sy AS DOUBLE)
         / CAST(m.kk * m.sxx - m.sx * m.sx AS DOUBLE) AS heaps_beta
FROM q CROSS JOIN m
"""


def events_benford(sf_dir: str):
    """BENFORD'S LAW FIRST-DIGIT TEST (the fraud/anomaly classic: natural
    transaction amounts follow P(d) = log10(1 + 1/d); synthetic or
    manipulated values don't): first significant digit of each event's
    value, counted with observed share vs the Benford expectation and a
    micro-quantized chi-square. Digit extraction is EXACT on both sides:
    value rounds to integer cents once (sql_round semantics), and the
    first digit of an INTEGER via its decimal string (LEFT(CAST ..)) is
    deterministic — no log10 anywhere near the digit boundary. One
    map-only combiner pass to 9 digit counts."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["value"])

    def partial(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        cents = sql_round_np(v * 100.0, 0).astype(np.int64)
        cents = cents[cents > 0]
        digit = cents.astype("U20").astype("U1").astype(np.int64)
        cnt = np.bincount(digit, minlength=10)[1:10]
        return pa.table(
            {
                "digit": pa.array(np.arange(1, 10), pa.int64()),
                "c": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    agg = _collect_table(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("digit")
        .aggregate(Sum("c", alias_name="n"))
    )
    d = agg["digit"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = agg["n"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(d)
    d, n = d[order], n[order]
    total = int(n.sum())
    share = n.astype(np.float64) / np.float64(total)
    # Benford expectation, micro-quantized the usual way
    exp_micro = sql_round_np(
        np.log10(1.0 + 1.0 / d.astype(np.float64)) * 1000000.0, 0
    ).astype(np.int64)
    return pa.table(
        {
            "digit": pa.array(d, pa.int64()),
            "n": pa.array(n, pa.int64()),
            "share": pa.array(share, pa.float64()),
            "benford_micro": pa.array(exp_micro, pa.int64()),
        }
    )


EVENTS_BENFORD_SQL = """
WITH cents AS (
  SELECT CAST(ROUND(value * 100.0, 0) AS BIGINT) AS c FROM events),
digits AS (
  SELECT CAST(LEFT(CAST(c AS VARCHAR), 1) AS BIGINT) AS digit
  FROM cents WHERE c > 0),
cc AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cc)
SELECT cc.digit, cc.n,
       CAST(cc.n AS DOUBLE) / CAST(tot.t AS DOUBLE) AS share,
       CAST(ROUND(LOG10(1.0 + 1.0 / CAST(cc.digit AS DOUBLE)) * 1000000.0, 0)
            AS BIGINT) AS benford_micro
FROM cc CROSS JOIN tot
"""


def doc_hemisphere_jsd(sf_dir: str):
    """JENSEN-SHANNON DIVERGENCE between the east- and west-hemisphere
    vocabulary distributions (the corpus-shift detector: 0 = same
    language use, log2(2)=1 bit = disjoint vocabularies — the
    domain-drift gauge run between corpus slices before mixing training
    data): JSD = sum_w (p/2)log2(p/m) + (q/2)log2(q/m), m=(p+q)/2.
    Scale-right over an UNBOUNDED vocab: hemisphere totals from one cheap
    integer pass, then word-partitioned (ce, cw) counts (the vocab shape
    with two counters) where each partition computes its words' terms
    LOCALLY and emits one partial micro-sum — nothing O(vocab) reaches
    the driver. Float parity: each per-word TERM (a fixed double chain of
    two divisions, one average, up to two log2s) quantizes to integer
    micro-bits; the global sum is exact int64."""
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import _GOLD, _n_parts, hash_strings

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_parts = _n_parts()

    def tok_partial(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = b["text"].to_pylist()
        toks = np.asarray([w for t in texts for w in t.split(" ")])
        if len(toks) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "ce": pa.array([], pa.int64()),
                 "cw": pa.array([], pa.int64()),
                 "__part": pa.array([], pa.int32())}
            )
        east = np.repeat(
            ((doc_id * 104729) % 360000) >= 180000,
            np.asarray([len(t.split(" ")) for t in texts], np.int64),
        )
        vocab, inv = np.unique(toks, return_inverse=True)
        ce = np.bincount(inv[east], minlength=len(vocab)).astype(np.int64)
        cw = np.bincount(inv[~east], minlength=len(vocab)).astype(np.int64)
        h = hash_strings(pa.array(vocab, pa.string()))
        return pa.table(
            {
                "token": pa.array(vocab, pa.string()),
                "ce": pa.array(ce, pa.int64()),
                "cw": pa.array(cw, pa.int64()),
                "__part": pa.array(
                    ((h * _GOLD) % np.uint64(n_parts)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    tokens = ds.map_batches(
        tok_partial, batch_format="pyarrow", batch_size=2048
    ).materialize()
    totals = _collect_table(
        tokens.groupby("__part")
        .map_groups(
            lambda g: pa.table(
                {
                    "e": pa.array(
                        [int(g["ce"].to_numpy(zero_copy_only=False).sum())],
                        pa.int64(),
                    ),
                    "w": pa.array(
                        [int(g["cw"].to_numpy(zero_copy_only=False).sum())],
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    )
    n_e = float(int(totals["e"].to_numpy().sum()))
    n_w = float(int(totals["w"].to_numpy().sum()))

    def jsd_part(g: pa.Table) -> pa.Table:
        toks = np.asarray(g["token"].to_pylist())
        ce = g["ce"].to_numpy(zero_copy_only=False).astype(np.int64)
        cw = g["cw"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(toks, kind="stable")
        ts_, ce, cw = toks[order], ce[order], cw[order]
        firsts = np.nonzero(np.r_[True, ts_[1:] != ts_[:-1]])[0]
        sce = np.add.reduceat(ce, firsts)
        scw = np.add.reduceat(cw, firsts)
        p = sce.astype(np.float64) / n_e
        q = scw.astype(np.float64) / n_w
        m = (p + q) / 2.0
        term = np.zeros(len(p), np.float64)
        pe_pos = sce > 0
        term[pe_pos] += (p[pe_pos] / 2.0) * np.log2(p[pe_pos] / m[pe_pos])
        qw_pos = scw > 0
        term[qw_pos] += (q[qw_pos] / 2.0) * np.log2(q[qw_pos] / m[qw_pos])
        micro = sql_round_np(term * 1000000.0, 0).astype(np.int64)
        return pa.table(
            {
                "nw": pa.array([len(firsts)], pa.int64()),
                "sm": pa.array([int(micro.sum())], pa.int64()),
            }
        )

    parts = _collect_table(
        tokens.groupby("__part").map_groups(jsd_part, batch_format="pyarrow")
    )
    n_words = int(parts["nw"].to_numpy().sum())
    sm = int(parts["sm"].to_numpy().sum())
    return pa.table(
        {
            "n_words": pa.array([n_words], pa.int64()),
            "n_east_tokens": pa.array([int(n_e)], pa.int64()),
            "n_west_tokens": pa.array([int(n_w)], pa.int64()),
            "sum_micro": pa.array([sm], pa.int64()),
            "jsd_bits": pa.array(
                [float(np.float64(sm) / 1000000.0)], pa.float64()
            ),
        }
    )


DOC_HEMISPHERE_JSD_SQL = """
WITH toks AS (
  SELECT (doc_id * 104729) % 360000 >= 180000 AS east,
         UNNEST(string_split(text, ' ')) AS w
  FROM documents),
cc AS (
  SELECT w, CAST(COUNT(CASE WHEN east THEN 1 END) AS BIGINT) AS ce,
         CAST(COUNT(CASE WHEN NOT east THEN 1 END) AS BIGINT) AS cw
  FROM toks GROUP BY 1),
tot AS (
  SELECT CAST(SUM(ce) AS BIGINT) AS ne, CAST(SUM(cw) AS BIGINT) AS nw
  FROM cc),
terms AS (
  SELECT CAST(ROUND((
           CASE WHEN cc.ce > 0 THEN
             (CAST(cc.ce AS DOUBLE) / CAST(tot.ne AS DOUBLE) / 2.0)
             * LOG2((CAST(cc.ce AS DOUBLE) / CAST(tot.ne AS DOUBLE))
                    / ((CAST(cc.ce AS DOUBLE) / CAST(tot.ne AS DOUBLE)
                        + CAST(cc.cw AS DOUBLE) / CAST(tot.nw AS DOUBLE))
                       / 2.0))
           ELSE 0.0 END
           + CASE WHEN cc.cw > 0 THEN
             (CAST(cc.cw AS DOUBLE) / CAST(tot.nw AS DOUBLE) / 2.0)
             * LOG2((CAST(cc.cw AS DOUBLE) / CAST(tot.nw AS DOUBLE))
                    / ((CAST(cc.ce AS DOUBLE) / CAST(tot.ne AS DOUBLE)
                        + CAST(cc.cw AS DOUBLE) / CAST(tot.nw AS DOUBLE))
                       / 2.0))
           ELSE 0.0 END) * 1000000.0, 0) AS BIGINT) AS m
  FROM cc CROSS JOIN tot)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM cc) AS n_words,
       (SELECT ne FROM tot) AS n_east_tokens,
       (SELECT nw FROM tot) AS n_west_tokens,
       CAST(SUM(m) AS BIGINT) AS sum_micro,
       CAST(CAST(SUM(m) AS BIGINT) AS DOUBLE) / 1000000.0 AS jsd_bits
FROM terms
"""


def geo_lang_simpson(sf_dir: str):
    """SIMPSON DIVERSITY INDEX per 30-deg region (the ecology-standard
    "probability two random documents share a language" — 1-D is the
    diversity; the concentration lens that complements entropy's
    information lens): lambda = sum c*(c-1) / (n*(n-1)) is EXACTLY
    rational — per-(region, lang) integer counts from one packed pass
    (bounded), integer numerator/denominator emitted, ONE double
    division. No quantizer needed anywhere: the rare all-integer
    diversity statistic."""
    import ray
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def lang_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(b["lang"].to_pylist()))
        return pa.table({"lang": pa.array(u.tolist(), pa.string()),
                         "one": pa.array(np.ones(len(u), np.int64))})

    lang_t = _collect_table(
        ds.select_columns(["lang"])
        .map_batches(lang_partial, batch_format="pyarrow", batch_size=131072)
        .groupby("lang")
        .aggregate(Sum("one", alias_name="n"))
    )
    langs = np.sort(np.asarray(lang_t["lang"].to_pylist()))
    lang_ref = ray.put(langs)

    def pack(b: pa.Table) -> pa.Table:
        ls = ray.get(lang_ref)
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(ls, np.asarray(b["lang"].to_pylist()))
        rx = ((doc_id * 104729) % 360000) // _GT_CELL_MILLI
        ry = ((doc_id * 7919) % 140000) // _GT_CELL_MILLI
        key = (idx.astype(np.uint64) << np.uint64(16)) | (
            (rx * 16 + ry).astype(np.uint64)
        )
        return pa.table({"key": pa.array(key, pa.uint64())})

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= langs x regions rows by construction
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    reg = (key & np.uint64((1 << 16) - 1)).astype(np.int64)
    regs = np.unique(reg)
    pos = np.searchsorted(regs, reg)
    n_g = np.zeros(len(regs), np.int64)
    num = np.zeros(len(regs), np.int64)
    np.add.at(n_g, pos, c)
    np.add.at(num, pos, c * (c - 1))
    keep = n_g >= 2
    regs, n_g, num = regs[keep], n_g[keep], num[keep]
    den = n_g * (n_g - 1)
    return pa.table(
        {
            "rx": pa.array(regs // 16, pa.int64()),
            "ry": pa.array(regs % 16, pa.int64()),
            "n_docs": pa.array(n_g, pa.int64()),
            "num": pa.array(num, pa.int64()),
            "den": pa.array(den, pa.int64()),
            "simpson": pa.array(
                num.astype(np.float64) / den.astype(np.float64), pa.float64()
            ),
        }
    )


GEO_LANG_SIMPSON_SQL = f"""
WITH pts AS (
  SELECT lang,
         ((doc_id * 104729) % 360000) // {_GT_CELL_MILLI} AS rx,
         ((doc_id * 7919) % 140000) // {_GT_CELL_MILLI} AS ry
  FROM documents),
cc AS (SELECT rx, ry, lang, CAST(COUNT(*) AS BIGINT) AS c
       FROM pts GROUP BY 1, 2, 3),
per AS (
  SELECT rx, ry, CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * (c - 1)) AS BIGINT) AS num
  FROM cc GROUP BY 1, 2)
SELECT CAST(rx AS BIGINT) AS rx, CAST(ry AS BIGINT) AS ry,
       n AS n_docs, num, n * (n - 1) AS den,
       CAST(num AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE) AS simpson
FROM per WHERE n >= 2
"""


def geo_lisa_quadrants(sf_dir: str):
    """LISA / MORAN-SCATTER QUADRANT CLASSIFICATION (the local companion
    of geo_moran_i's global statistic: each cell labeled HH hot-in-hot,
    LL cold-in-cold, HL hot outlier, LH cold pocket — the map behind
    every cluster-and-outlier choropleth). ALL-INTEGER over the full
    10-deg grid (zero cells participate — their deviations are real):
    z_i*N = x_i*N - T and lag_i*N = N*sum(x_nbr) - deg_i*T, so quadrant
    signs come from exact int64 products; the emitted columns ARE those
    integers plus the label (ties-on-the-mean labeled 'NS'). One packed
    count pass; the 36 x 14 grid fold is geometry-bounded."""
    from core_ray.stages.agg import count_by_u64

    w, h = 36, 14
    ds = _read(sf_dir, "documents", ["doc_id"])

    def pack(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        gx = ((doc_id * 104729) % 360000) // _GE_CELL_MILLI
        gy = ((doc_id * 7919) % 140000) // _GE_CELL_MILLI
        return pa.table(
            {"key": pa.array((gx * 1024 + gy).astype(np.uint64), pa.uint64())}
        )

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= 504 rows by construction
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    grid = np.zeros((w, h), np.int64)
    grid[key // 1024, key % 1024] = c
    n_cells = w * h
    total = int(grid.sum())

    nbr = np.zeros((w, h), np.int64)
    deg = np.zeros((w, h), np.int64)
    nbr[1:, :] += grid[:-1, :]
    nbr[:-1, :] += grid[1:, :]
    nbr[:, 1:] += grid[:, :-1]
    nbr[:, :-1] += grid[:, 1:]
    deg[1:, :] += 1
    deg[:-1, :] += 1
    deg[:, 1:] += 1
    deg[:, :-1] += 1

    z_num = grid * n_cells - total
    lag_num = n_cells * nbr - deg * total
    lab = np.where(
        (z_num > 0) & (lag_num > 0), "HH",
        np.where(
            (z_num < 0) & (lag_num < 0), "LL",
            np.where(
                (z_num > 0) & (lag_num < 0), "HL",
                np.where((z_num < 0) & (lag_num > 0), "LH", "NS"),
            ),
        ),
    )
    gx, gy = np.meshgrid(np.arange(w), np.arange(h), indexing="ij")
    return pa.table(
        {
            "gx": pa.array(gx.ravel().astype(np.int64), pa.int64()),
            "gy": pa.array(gy.ravel().astype(np.int64), pa.int64()),
            "n_docs": pa.array(grid.ravel(), pa.int64()),
            "z_num": pa.array(z_num.ravel(), pa.int64()),
            "lag_num": pa.array(lag_num.ravel(), pa.int64()),
            "quadrant": pa.array(lab.ravel().tolist(), pa.string()),
        }
    )


GEO_LISA_QUADRANTS_SQL = f"""
WITH pts AS (
  SELECT ((doc_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((doc_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy
  FROM documents),
cc AS (SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS c FROM pts GROUP BY 1, 2),
grid AS (
  SELECT x.gx, y.gy, COALESCE(cc.c, 0) AS x
  FROM (SELECT UNNEST(generate_series(0, 35)) AS gx) x
  CROSS JOIN (SELECT UNNEST(generate_series(0, 13)) AS gy) y
  LEFT JOIN cc ON cc.gx = x.gx AND cc.gy = y.gy),
tot AS (SELECT CAST(SUM(x) AS BIGINT) AS t FROM grid),
lagd AS (
  SELECT g.gx, g.gy, g.x,
         CAST(SUM(n.x) AS BIGINT) AS nbr, CAST(COUNT(n.x) AS BIGINT) AS deg
  FROM grid g JOIN grid n
    ON (n.gx = g.gx + 1 AND n.gy = g.gy) OR (n.gx = g.gx - 1 AND n.gy = g.gy)
    OR (n.gx = g.gx AND n.gy = g.gy + 1) OR (n.gx = g.gx AND n.gy = g.gy - 1)
  GROUP BY 1, 2, 3)
SELECT CAST(l.gx AS BIGINT) AS gx, CAST(l.gy AS BIGINT) AS gy,
       l.x AS n_docs,
       l.x * 504 - tot.t AS z_num,
       504 * l.nbr - l.deg * tot.t AS lag_num,
       CASE WHEN l.x * 504 - tot.t > 0 AND 504 * l.nbr - l.deg * tot.t > 0
              THEN 'HH'
            WHEN l.x * 504 - tot.t < 0 AND 504 * l.nbr - l.deg * tot.t < 0
              THEN 'LL'
            WHEN l.x * 504 - tot.t > 0 AND 504 * l.nbr - l.deg * tot.t < 0
              THEN 'HL'
            WHEN l.x * 504 - tot.t < 0 AND 504 * l.nbr - l.deg * tot.t > 0
              THEN 'LH'
            ELSE 'NS' END AS quadrant
FROM lagd l CROSS JOIN tot
"""


def events_circular_hours(sf_dir: str):
    """CIRCULAR STATISTICS of the diurnal cycle (Rayleigh resultant length
    per event type): hour-of-day is an ANGLE, not a number — midnight sits
    next to 23:00 — so concentration is the resultant R = |mean unit
    vector| (R -> 1 = sharply peaked schedule, 0 = uniform around the
    clock; linear stddev gets this wrong at the wrap). Exactness: the 24
    unit vectors quantize ONCE to integer micro-components (sql_round_np
    == DuckDB ROUND on the same libm-correct cos/sin arguments), so the
    weighted sums are exact int64 from the bounded (type, hour) count
    table, and R = one fixed sqrt chain of two exact integers over
    1e6*n."""
    import ray
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["event_id", "ts", "event_type"])

    def type_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(b["event_type"].to_pylist()))
        return pa.table({"event_type": pa.array(u.tolist(), pa.string()),
                         "one": pa.array(np.ones(len(u), np.int64))})

    ty_t = _collect_table(
        ds.select_columns(["event_type"])
        .map_batches(type_partial, batch_format="pyarrow", batch_size=131072)
        .groupby("event_type")
        .aggregate(Sum("one", alias_name="n"))
    )
    types = np.sort(np.asarray(ty_t["event_type"].to_pylist()))
    ty_ref = ray.put(types)

    def pack(b: pa.Table) -> pa.Table:
        ts = ray.get(ty_ref)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ts, np.asarray(b["event_type"].to_pylist()))
        hour = (us // 3600000000) % 24
        key = (idx.astype(np.uint64) << np.uint64(5)) | hour.astype(np.uint64)
        return pa.table({"key": pa.array(key, pa.uint64())})

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= types x 24 rows by construction
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    ti = (key >> np.uint64(5)).astype(np.int64)
    hour = (key & np.uint64(31)).astype(np.int64)

    h = np.arange(24, dtype=np.float64)
    cos_micro = sql_round_np(
        np.cos(2.0 * np.pi * h / 24.0) * 1000000.0, 0
    ).astype(np.int64)
    sin_micro = sql_round_np(
        np.sin(2.0 * np.pi * h / 24.0) * 1000000.0, 0
    ).astype(np.int64)

    n_t = np.zeros(len(types), np.int64)
    cm = np.zeros(len(types), np.int64)
    sm = np.zeros(len(types), np.int64)
    np.add.at(n_t, ti, c)
    np.add.at(cm, ti, c * cos_micro[hour])
    np.add.at(sm, ti, c * sin_micro[hour])
    r = np.sqrt(
        cm.astype(np.float64) ** 2 + sm.astype(np.float64) ** 2
    ) / (1000000.0 * n_t.astype(np.float64))
    return pa.table(
        {
            "event_type": pa.array(types.tolist(), pa.string()),
            "n_events": pa.array(n_t, pa.int64()),
            "c_micro": pa.array(cm, pa.int64()),
            "s_micro": pa.array(sm, pa.int64()),
            "resultant": pa.array(r, pa.float64()),
        }
    )


EVENTS_CIRCULAR_HOURS_SQL = """
WITH pts AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hour FROM events),
cc AS (SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS c
       FROM pts GROUP BY 1, 2),
uv AS (
  SELECT h AS hour,
         CAST(ROUND(COS(2.0 * PI() * CAST(h AS DOUBLE) / 24.0)
                    * 1000000.0, 0) AS BIGINT) AS cm,
         CAST(ROUND(SIN(2.0 * PI() * CAST(h AS DOUBLE) / 24.0)
                    * 1000000.0, 0) AS BIGINT) AS sm
  FROM range(24) t(h)),
per AS (
  SELECT cc.event_type, CAST(SUM(cc.c) AS BIGINT) AS n,
         CAST(SUM(cc.c * uv.cm) AS BIGINT) AS c_micro,
         CAST(SUM(cc.c * uv.sm) AS BIGINT) AS s_micro
  FROM cc JOIN uv ON uv.hour = cc.hour GROUP BY 1)
SELECT event_type, n AS n_events, c_micro, s_micro,
       SQRT(CAST(c_micro AS DOUBLE) * CAST(c_micro AS DOUBLE)
            + CAST(s_micro AS DOUBLE) * CAST(s_micro AS DOUBLE))
         / (1000000.0 * CAST(n AS DOUBLE)) AS resultant
FROM per
"""


def events_contact_degrees(sf_dir: str):
    """CONTACT-GRAPH DEGREE DISTRIBUTION (the social-network statistic
    over the space-time contact join: how many DISTINCT partners does
    each user meet, histogrammed — superspreader detection's first
    plot). Fully DISTRIBUTED (VERDICT r4: a hot city-hour makes the pair
    table quadratic in its population, so the pair fold must never reach
    the driver — the events_user_entropy contract): shared contact-pair
    materialization -> per-batch-distinct packed user-pair keys -> one
    pair-keyed hash partition (global distinct, each edge exactly once)
    emitting both endpoints -> count_by_u64 per user (= degree) ->
    count_by_u64 per degree VALUE. The driver receives only the degree
    HISTOGRAM (distinct degree values, not users, not pairs)."""
    from core_ray.stages.agg import count_by_u64, map_groups_partitioned

    pairs = _contact_pairs_ds(sf_dir)
    keyed = pairs.map_batches(_pack_user_pairs, batch_format="pyarrow")

    def distinct_endpoints(g: pa.Table) -> pa.Table:
        u = np.unique(g["key"].to_numpy(zero_copy_only=False).astype(np.uint64))
        return pa.table(
            {
                "key": pa.array(
                    np.concatenate([u >> np.uint64(32),
                                    u & np.uint64(0xFFFFFFFF)]),
                    pa.uint64(),
                )
            }
        )

    users = map_groups_partitioned(keyed, "key", distinct_endpoints)
    deg = count_by_u64(users, "key")  # (user, degree)

    def deg_as_key(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pa.array(
                    b["cnt"].to_numpy(zero_copy_only=False).astype(np.uint64),
                    pa.uint64(),
                )
            }
        )

    hist = count_by_u64(deg.map_batches(deg_as_key, batch_format="pyarrow"), "key")
    t = _collect_table(hist)  # bounded by DISTINCT degree values
    dv = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    nc = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(dv, kind="stable")
    return pa.table(
        {
            "degree": pa.array(dv[order], pa.int64()),
            "n_users": pa.array(nc[order], pa.int64()),
        }
    )


EVENTS_CONTACT_DEGREES_SQL = f"""
WITH pts AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         {CONTACT_LAT_SQL} AS lat, {CONTACT_LON_SQL} AS lon
  FROM events),
hits AS (
  SELECT DISTINCT LEAST(a.user_id, b.user_id) AS u1,
         GREATEST(a.user_id, b.user_id) AS u2
  FROM pts a JOIN pts b
    ON a.event_id < b.event_id AND a.user_id != b.user_id
 WHERE (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon)
       <= {_CONTACT_RADIUS_DEG * _CONTACT_RADIUS_DEG}
   AND ABS(a.us - b.us) <= {_CONTACT_WINDOW_US}),
deg AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u1 AS u FROM hits UNION ALL SELECT u2 FROM hits)
  GROUP BY 1)
SELECT d AS degree, CAST(COUNT(*) AS BIGINT) AS n_users
FROM deg GROUP BY 1
"""


def geo_gravity_fit(sf_dir: str):
    """GRAVITY-LAW FIT over the OD matrix (the transport-science classic:
    flow between places decays as a power of distance — the exponent is
    the headline parameter of trip-distribution models): symmetrized
    city-pair flows from the events_od_matrix machinery (bounded 12x12),
    squared distances between the model city centers (exact arithmetic),
    and the decay exponent = the micro-bit log2-log2 regression slope of
    flow on d^2 (doc_zipf_fit's algebra; slope vs distance itself is 2x
    this). Only pairs with positive flow enter (log of zero is not a
    number in any engine)."""
    od = events_od_matrix(sf_dir)
    t = _collect_table(od) if not isinstance(od, pa.Table) else od
    f_ = t["from_city"].to_numpy(zero_copy_only=False).astype(np.int64)
    to = t["to_city"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = t[t.column_names[2]].to_numpy(zero_copy_only=False).astype(np.int64)
    lo = np.minimum(f_, to)
    hi = np.maximum(f_, to)
    key = lo * 12 + hi
    u = np.unique(key)
    flow = np.zeros(len(u), np.int64)
    np.add.at(flow, np.searchsorted(u, key), n)
    ci = (u // 12).astype(np.int64)
    cj = (u % 12).astype(np.int64)

    k = np.arange(12, dtype=np.int64)
    c_lat = ((k * 11003) % 120000) / 1000.0 - 60.0
    c_lon = ((k * 104729) % 340000) / 1000.0 - 170.0
    dla = c_lat[ci] - c_lat[cj]
    dlo = c_lon[ci] - c_lon[cj]
    d2 = dla * dla + dlo * dlo

    keep = flow > 0
    ci, cj, flow, d2 = ci[keep], cj[keep], flow[keep], d2[keep]
    x = sql_round_np(np.log2(d2) * 1000000.0, 0).astype(np.int64)
    y = sql_round_np(
        np.log2(flow.astype(np.float64)) * 1000000.0, 0
    ).astype(np.int64)
    m = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    num = m * sxy - sx * sy
    den = m * sxx - sx * sx
    return pa.table(
        {
            "city_a": pa.array(ci, pa.int64()),
            "city_b": pa.array(cj, pa.int64()),
            "flow": pa.array(flow, pa.int64()),
            "d2_micro_x": pa.array(x, pa.int64()),
            "decay_num": pa.array(np.full(m, num, np.int64), pa.int64()),
            "decay_den": pa.array(np.full(m, den, np.int64), pa.int64()),
            "decay_slope": pa.array(
                np.full(m, float(np.float64(num) / np.float64(den))),
                pa.float64(),
            ),
        }
    )


GEO_GRAVITY_FIT_SQL = """
WITH seqd AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) - 1 AS seq
  FROM events),
cities AS (
  SELECT user_id, us, event_id, (user_id * 7 + seq // 20) % 12 AS city
  FROM seqd),
legs AS (
  SELECT user_id, city,
         LAG(city) OVER (PARTITION BY user_id ORDER BY us, event_id) AS pcity
  FROM cities),
od AS (
  SELECT CAST(LEAST(pcity, city) AS BIGINT) AS ca,
         CAST(GREATEST(pcity, city) AS BIGINT) AS cb,
         CAST(COUNT(*) AS BIGINT) AS flow
  FROM legs WHERE pcity IS NOT NULL AND pcity != city
  GROUP BY 1, 2),
coords AS (
  SELECT k AS c,
         ((k * 11003) % 120000) / 1000.0 - 60.0 AS lat,
         ((k * 104729) % 340000) / 1000.0 - 170.0 AS lon
  FROM range(12) t(k)),
q AS (
  SELECT od.ca, od.cb, od.flow,
         CAST(ROUND(LOG2((a.lat - b.lat) * (a.lat - b.lat)
                         + (a.lon - b.lon) * (a.lon - b.lon))
                    * 1000000.0, 0) AS BIGINT) AS x,
         CAST(ROUND(LOG2(CAST(od.flow AS DOUBLE)) * 1000000.0, 0)
              AS BIGINT) AS y
  FROM od JOIN coords a ON a.c = od.ca JOIN coords b ON b.c = od.cb
  WHERE od.flow > 0),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM q)
SELECT q.ca AS city_a, q.cb AS city_b, q.flow, q.x AS d2_micro_x,
       m.k * m.sxy - m.sx * m.sy AS decay_num,
       m.k * m.sxx - m.sx * m.sx AS decay_den,
       CAST(m.k * m.sxy - m.sx * m.sy AS DOUBLE)
         / CAST(m.k * m.sxx - m.sx * m.sx AS DOUBLE) AS decay_slope
FROM q CROSS JOIN m
"""


def events_daily_motifs(sf_dir: str):
    """DAILY MOBILITY MOTIFS (Schneider et al.: a user-day's city
    sequence, consecutive-deduped and relabeled by first appearance —
    "0-1-0" is home-work-home whoever and wherever you are — motif
    frequencies are THE fingerprint of human daily routine): one
    user-keyed shuffle; the partition kernel orders each user's events,
    derives the od_matrix city model, splits by day, dedups consecutive
    repeats, relabels by first occurrence and counts motif strings;
    bounded final groupby over the motif vocabulary."""
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    _empty = pa.table(
        {"motif": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
    )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, us, uid))
        uid, us = uid[order], us[order]
        n = len(uid)
        first = np.r_[True, uid[1:] != uid[:-1]]
        ustart = np.nonzero(first)[0]
        seq = np.arange(n) - np.repeat(
            ustart, np.diff(np.append(ustart, n))
        )
        city = (uid * 7 + seq // 20) % 12
        day = us // _TT_DAY_US
        # segment = (user, day) runs in the sorted order
        seg = np.r_[True, (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])]
        starts = np.nonzero(seg)[0]
        ends = np.r_[starts[1:], n]
        counts: dict[str, int] = {}
        for s_, e_ in zip(starts, ends):
            cs = city[s_:e_]
            keep = np.r_[True, cs[1:] != cs[:-1]]
            cs = cs[keep]
            # relabel by first appearance
            lab: dict[int, int] = {}
            out = []
            for c_ in cs.tolist():
                if c_ not in lab:
                    lab[c_] = len(lab)
                out.append(str(lab[c_]))
            m = "-".join(out)
            counts[m] = counts.get(m, 0) + 1
        ks = sorted(counts)
        return pa.table(
            {
                "motif": pa.array(ks, pa.string()),
                "c": pa.array([counts[k] for k in ks], pa.int64()),
            }
        )

    agg = _collect_table(
        map_groups_partitioned(ds, "user_id", per_part)
        .groupby("motif")
        .aggregate(Sum("c", alias_name="n_user_days"))
    )
    t = pa.table(
        {
            "motif": agg["motif"],
            "n_user_days": pc.cast(agg["n_user_days"], pa.int64()),
        }
    )
    return t.sort_by("motif")


EVENTS_DAILY_MOTIFS_SQL = """
WITH seqd AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) - 1 AS seq
  FROM events),
cities AS (
  SELECT user_id, us // 86400000000 AS day, us, event_id,
         (user_id * 7 + seq // 20) % 12 AS city
  FROM seqd),
dedup AS (
  SELECT user_id, day, us, event_id, city,
         LAG(city) OVER (PARTITION BY user_id, day
                         ORDER BY us, event_id) AS pc
  FROM cities),
moves AS (
  SELECT user_id, day, city,
         ROW_NUMBER() OVER (PARTITION BY user_id, day
                            ORDER BY us, event_id) AS p
  FROM dedup WHERE pc IS NULL OR pc != city),
ranks AS (
  SELECT user_id, day, city,
         DENSE_RANK() OVER (PARTITION BY user_id, day
                            ORDER BY fp) - 1 AS r
  FROM (SELECT user_id, day, city, MIN(p) AS fp
        FROM moves GROUP BY 1, 2, 3)),
motifs AS (
  SELECT m.user_id, m.day,
         STRING_AGG(CAST(r.r AS VARCHAR), '-' ORDER BY m.p) AS motif
  FROM moves m JOIN ranks r
    ON r.user_id = m.user_id AND r.day = m.day AND r.city = m.city
  GROUP BY 1, 2)
SELECT motif, CAST(COUNT(*) AS BIGINT) AS n_user_days
FROM motifs GROUP BY 1 ORDER BY 1
"""


def geo_boxcount_dimension(sf_dir: str):
    """BOX-COUNTING FRACTAL DIMENSION of the document footprint (how
    space-filling is the corpus's geography — D -> 2 uniform sheet,
    D -> 0 isolated points; the settlement-geography classic for urban
    sprawl and coverage texture): occupied-box counts N_L at quadtree
    levels 0..8 from ONE finest-level count pass (the geo_quadtree
    pyramid — parents by reshape block-OR), then D = the micro-bit
    regression slope of log2(N_L) on level (x = L is already an exact
    integer; only the y side needs the quantizer)."""
    from core_ray.stages.agg import count_by_u64

    side = 1 << _QT_LMAX
    ds = _read(sf_dir, "documents", ["doc_id"])

    def finest(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mlat = (doc_id * 7919) % 140000
        mlon = (doc_id * 104729) % 360000
        qx = (mlon * side) // 360000
        qy = (mlat * side) // 140000
        return pa.table(
            {"key": pa.array((qx * side + qy).astype(np.uint64), pa.uint64())}
        )

    cells = _collect_table(
        count_by_u64(
            ds.map_batches(finest, batch_format="pyarrow",
                           batch_size=131072)
        )
    )  # <= side^2 rows by construction
    key = cells["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    grid = np.zeros((side, side), bool)
    grid[key // side, key % side] = True

    n_l = []
    g = grid
    for L in range(_QT_LMAX, -1, -1):
        n_l.append(int(g.sum()))
        if L:
            h = 1 << (L - 1)
            g = g.reshape(h, 2, h, 2).any(axis=(1, 3))
    n_l = np.asarray(n_l[::-1], np.int64)  # index = level 0..8

    lev = np.arange(_QT_LMAX + 1, dtype=np.int64)
    x = lev * 1000000
    y = sql_round_np(
        np.log2(n_l.astype(np.float64)) * 1000000.0, 0
    ).astype(np.int64)
    k = len(x)
    sx, sy = int(x.sum()), int(y.sum())
    sxy, sxx = int((x * y).sum()), int((x * x).sum())
    num = k * sxy - sx * sy
    den = k * sxx - sx * sx
    return pa.table(
        {
            "level": pa.array(lev, pa.int64()),
            "n_boxes": pa.array(n_l, pa.int64()),
            "dim_num": pa.array(np.full(k, num, np.int64), pa.int64()),
            "dim_den": pa.array(np.full(k, den, np.int64), pa.int64()),
            "box_dim": pa.array(
                np.full(k, float(np.float64(num) / np.float64(den))),
                pa.float64(),
            ),
        }
    )


GEO_BOXCOUNT_DIMENSION_SQL = (
    "WITH lv AS ("
    + " UNION ALL ".join(
        f"SELECT CAST({L} AS BIGINT) AS level, CAST(COUNT(*) AS BIGINT)"
        f" AS n_boxes FROM (SELECT DISTINCT"
        f" (((doc_id * 104729) % 360000) * {1 << L}) // 360000 AS qx,"
        f" (((doc_id * 7919) % 140000) * {1 << L}) // 140000 AS qy"
        f" FROM documents)"
        for L in range(_QT_LMAX + 1)
    )
    + """),
q AS (
  SELECT level, n_boxes, level * 1000000 AS x,
         CAST(ROUND(LOG2(CAST(n_boxes AS DOUBLE)) * 1000000.0, 0)
              AS BIGINT) AS y
  FROM lv),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM q)
SELECT q.level, q.n_boxes,
       m.k * m.sxy - m.sx * m.sy AS dim_num,
       m.k * m.sxx - m.sx * m.sx AS dim_den,
       CAST(m.k * m.sxy - m.sx * m.sy AS DOUBLE)
         / CAST(m.k * m.sxx - m.sx * m.sx AS DOUBLE) AS box_dim
FROM q CROSS JOIN m"""
)


_RBO_K = 50  # rank depth
_RBO_P_MILLI = 900  # persistence p = 0.9 as exact milli-units


def doc_hemisphere_rbo(sf_dir: str):
    """RANK-BIASED OVERLAP (Webber et al.) between the east- and
    west-hemisphere top-{K} vocabularies — the IR-standard top-weighted
    list similarity (1 = same ranking, 0 = disjoint; top ranks dominate
    via the p^d decay), the headline metric for "did the trending terms
    change between corpus slices". Exactness: both ranked lists come
    from the exact vocab machinery ((count desc, token asc) ties);
    per-depth overlap counts are integers; each depth's term
    (1-p) * p^(d-1) * overlap_d / d quantizes to micro-units with p^(d-1)
    computed via pow() on BOTH sides (Python ** here, POW in the SQL —
    NOT iterated multiplication, whose accumulated rounding drifts from
    POW as d grows; the two pows agree through the micro ROUND);
    RBO = one exact integer sum / 1e6."""
    toks_e, toks_w = _hemi_top_tokens(sf_dir, _RBO_K)
    p = _RBO_P_MILLI / 1000.0
    se: set = set()
    sw: set = set()
    micro_terms = []
    for d in range(1, _RBO_K + 1):
        if d <= len(toks_e):
            se.add(toks_e[d - 1])
        if d <= len(toks_w):
            sw.add(toks_w[d - 1])
        ov = len(se & sw)
        # pow(), not iterated multiplication: the SQL mirror is POW and
        # accumulated-multiply drift grows with d
        term = (1.0 - p) * (p ** (d - 1)) * (float(ov) / float(d))
        micro_terms.append(
            int(sql_round_np(np.float64(term) * 1000000.0, 0))
        )
    sm = int(sum(micro_terms))
    return pa.table(
        {
            "depth": pa.array([_RBO_K], pa.int64()),
            "sum_micro": pa.array([sm], pa.int64()),
            "rbo": pa.array(
                [float(np.float64(sm) / 1000000.0)], pa.float64()
            ),
        }
    )


def _hemi_top_tokens(sf_dir: str, k: int):
    """Exact per-hemisphere top-k token lists ((count desc, token asc)),
    via the hash-partitioned vocab machinery with two counters."""
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import _GOLD, _n_parts, hash_strings

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_parts = _n_parts()

    def partial(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = b["text"].to_pylist()
        toks = np.asarray([w for t in texts for w in t.split(" ")])
        if len(toks) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "ce": pa.array([], pa.int64()),
                 "cw": pa.array([], pa.int64()),
                 "__part": pa.array([], pa.int32())}
            )
        east = np.repeat(
            ((doc_id * 104729) % 360000) >= 180000,
            np.asarray([len(t.split(" ")) for t in texts], np.int64),
        )
        vocab, inv = np.unique(toks, return_inverse=True)
        ce = np.bincount(inv[east], minlength=len(vocab)).astype(np.int64)
        cw = np.bincount(inv[~east], minlength=len(vocab)).astype(np.int64)
        h = hash_strings(pa.array(vocab, pa.string()))
        return pa.table(
            {
                "token": pa.array(vocab, pa.string()),
                "ce": pa.array(ce, pa.int64()),
                "cw": pa.array(cw, pa.int64()),
                "__part": pa.array(
                    ((h * _GOLD) % np.uint64(n_parts)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    def prune(g: pa.Table) -> pa.Table:
        toks = np.asarray(g["token"].to_pylist())
        ce = g["ce"].to_numpy(zero_copy_only=False).astype(np.int64)
        cw = g["cw"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(toks, kind="stable")
        ts_, ce, cw = toks[order], ce[order], cw[order]
        firsts = np.nonzero(np.r_[True, ts_[1:] != ts_[:-1]])[0]
        sce = np.add.reduceat(ce, firsts)
        scw = np.add.reduceat(cw, firsts)
        u = ts_[firsts]
        keep = np.union1d(
            np.lexsort((u, -sce))[:k], np.lexsort((u, -scw))[:k]
        )
        return pa.table(
            {
                "token": pa.array(u[keep], pa.string()),
                "ce": pa.array(sce[keep], pa.int64()),
                "cw": pa.array(scw[keep], pa.int64()),
            }
        )

    t = _collect_table(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=2048)
        .groupby("__part")
        .map_groups(prune, batch_format="pyarrow")
    )  # <= n_parts x 2k rows by construction
    toks = np.asarray(t["token"].to_pylist())
    ce = t["ce"].to_numpy(zero_copy_only=False).astype(np.int64)
    cw = t["cw"].to_numpy(zero_copy_only=False).astype(np.int64)
    oe = np.lexsort((toks, -ce))[:k]
    ow = np.lexsort((toks, -cw))[:k]
    return toks[oe].tolist(), toks[ow].tolist()


DOC_HEMISPHERE_RBO_SQL = f"""
WITH toks AS (
  SELECT (doc_id * 104729) % 360000 >= 180000 AS east,
         UNNEST(string_split(text, ' ')) AS w
  FROM documents),
cc AS (
  SELECT w, CAST(COUNT(CASE WHEN east THEN 1 END) AS BIGINT) AS ce,
         CAST(COUNT(CASE WHEN NOT east THEN 1 END) AS BIGINT) AS cw
  FROM toks GROUP BY 1),
re AS (SELECT w, ROW_NUMBER() OVER (ORDER BY ce DESC, w) AS r FROM cc),
rw AS (SELECT w, ROW_NUMBER() OVER (ORDER BY cw DESC, w) AS r FROM cc),
depths AS (SELECT UNNEST(generate_series(1, {_RBO_K})) AS d),
ov AS (
  SELECT dd.d,
         (SELECT COUNT(*) FROM re JOIN rw USING (w)
          WHERE re.r <= dd.d AND rw.r <= dd.d) AS o
  FROM depths dd),
terms AS (
  SELECT d, CAST(ROUND((1.0 - {_RBO_P_MILLI} / 1000.0)
                       * POW({_RBO_P_MILLI} / 1000.0, d - 1)
                       * (CAST(o AS DOUBLE) / CAST(d AS DOUBLE))
                       * 1000000.0, 0) AS BIGINT) AS m
  FROM ov)
SELECT CAST({_RBO_K} AS BIGINT) AS depth,
       CAST(SUM(m) AS BIGINT) AS sum_micro,
       CAST(CAST(SUM(m) AS BIGINT) AS DOUBLE) / 1000000.0 AS rbo
FROM terms
"""


def events_diurnal_anova(sf_dir: str):
    """DIURNAL ANOVA (eta-squared: what fraction of the day-to-day
    variance in hourly event counts is explained by the hour of day —
    the one-number answer to "how strong is the daily rhythm"): with
    per-(day, hour) observations over the full [min_day, max_day] x 24
    grid (implicit zeros contribute only through the day span m), the
    cross-multiplied identity makes BOTH sums of squares exact integers:
    eta2 = (24*sum(T_h^2) - T^2) / (24*m*sum(y^2) - T^2) — one packed
    count pass (bounded by horizon x 24), bounded driver fold, ONE
    double division."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["ts"])

    def pack(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        day = us // _TT_DAY_US
        hour = (us // 3600000000) % 24
        key = (day.astype(np.uint64) << np.uint64(5)) | hour.astype(np.uint64)
        return pa.table({"key": pa.array(key, pa.uint64())})

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= horizon-days x 24 rows by construction
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    y = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    day = (key >> np.uint64(5)).astype(np.int64)
    hour = (key & np.uint64(31)).astype(np.int64)
    m = int(day.max() - day.min() + 1)
    T = int(y.sum())
    t_h = np.zeros(24, np.int64)
    np.add.at(t_h, hour, y)
    sum_th2 = int((t_h * t_h).sum())
    sum_y2 = int((y * y).sum())
    ssb_num = 24 * sum_th2 - T * T
    sst_num = 24 * m * sum_y2 - T * T
    return pa.table(
        {
            "n_days": pa.array([m], pa.int64()),
            "n_events": pa.array([T], pa.int64()),
            "ssb_num": pa.array([ssb_num], pa.int64()),
            "sst_num": pa.array([sst_num], pa.int64()),
            "eta2": pa.array(
                [float(np.float64(ssb_num) / np.float64(sst_num))],
                pa.float64(),
            ),
        }
    )


EVENTS_DIURNAL_ANOVA_SQL = f"""
WITH pts AS (
  SELECT epoch_us(ts) // {_TT_DAY_US} AS day,
         (epoch_us(ts) // 3600000000) % 24 AS hour
  FROM events),
cc AS (SELECT day, hour, CAST(COUNT(*) AS BIGINT) AS y
       FROM pts GROUP BY 1, 2),
span AS (
  SELECT CAST(MAX(day) - MIN(day) + 1 AS BIGINT) AS m FROM pts),
th AS (SELECT hour, CAST(SUM(y) AS BIGINT) AS t_h FROM cc GROUP BY 1),
agg AS (
  SELECT CAST(SUM(y) AS BIGINT) AS t,
         CAST(SUM(y * y) AS BIGINT) AS sy2
  FROM cc),
th2 AS (SELECT CAST(SUM(t_h * t_h) AS BIGINT) AS sth2 FROM th)
SELECT span.m AS n_days, agg.t AS n_events,
       24 * th2.sth2 - agg.t * agg.t AS ssb_num,
       24 * span.m * agg.sy2 - agg.t * agg.t AS sst_num,
       CAST(24 * th2.sth2 - agg.t * agg.t AS DOUBLE)
         / CAST(24 * span.m * agg.sy2 - agg.t * agg.t AS DOUBLE) AS eta2
FROM span, agg, th2
"""


_DD_RADIUS = 3.0  # distance-decay band-join radius (degrees)


def doc_distance_decay(sf_dir: str):
    """TOBLER'S LAW FOR TEXT (the graft's thesis in one operator: "near
    things are more related" — do geographically close documents share
    more vocabulary?): all document pairs within 3 deg (the distance-band
    join), each pair's DISTINCT-token Jaccard, averaged per integer
    distance band. Exactness end-to-end: bands come from integer-exact
    d2-threshold comparisons (b^2 <= d2 < (b+1)^2 — no sqrt), and each
    pair's Jaccard quantizes by INTEGER division (inter * 1e6) // union —
    no ROUND, no float until the final per-band mean (one double
    division of exact sums). Fully DISTRIBUTED (VERDICT r4 — neither the
    pair table nor any document TEXT ever reaches the driver): the band
    join streams into two hash equi-joins that attach both texts per pair
    in tasks, the per-pair token Jaccard + band fold runs in the same
    batch kernel, and the driver collects only the <= 4-band x #blocks
    integer partials (the doc_dup_geo_spread contract)."""
    from core_ray.stages.distband import distance_pairs
    from core_ray.stages.join import hash_join

    docs = _read(sf_dir, "documents", ["doc_id"])

    def shape(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(doc_id)
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )

    # the pair table is bounded (band contract): materialize it once and
    # size the join fan-out to the MEASURED pair count — a 15 k-pair sf0.1
    # input doesn't pay 128-way shuffle latency (measured 9.7 -> ~4 s),
    # while a 10^8-pair input still gets the full partition count
    pairs = distance_pairs(
        docs.map_batches(shape, batch_format="pyarrow"), _DD_RADIUS
    ).materialize()
    from core_ray.stages.agg import _n_parts

    n_parts = max(8, min(_n_parts(), pairs.count() // 32768 + 8))

    def to_band(b: pa.Table) -> pa.Table:
        d2 = b["sq_dist"].to_numpy(zero_copy_only=False)
        band = np.where(d2 < 1.0, 0, np.where(d2 < 4.0, 1,
                                              np.where(d2 < 9.0, 2, 3)))
        # 1-byte band rides the two join shuffles instead of the float d2
        return pa.table(
            {
                "doc_a": b["doc_a"],
                "doc_b": b["doc_b"],
                "band": pa.array(band.astype(np.int8), pa.int8()),
            }
        )

    texts = _read(sf_dir, "documents", ["doc_id", "text"])

    def t_as(col: str, out: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table({col: b["doc_id"], out: b["text"]})

        return f

    j1 = hash_join(
        pairs.map_batches(to_band, batch_format="pyarrow"),
        texts.map_batches(t_as("doc_a", "text_a"), batch_format="pyarrow"),
        on="doc_a", n_parts=n_parts,
        left_schema=pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()),
             ("band", pa.int8())]
        ),
        right_schema=pa.schema([("doc_a", pa.int64()), ("text_a", pa.string())]),
    ).materialize()  # break the two all-to-alls apart: Ray's streaming
    # executor schedules one long union->groupby->union->groupby DAG ~2x
    # slower than two materialized halves at this block count (measured
    # 9.6 vs 5.6 s); the intermediate is pair-bounded, never corpus-sized
    j2 = hash_join(
        j1, texts.map_batches(t_as("doc_b", "text_b"), batch_format="pyarrow"),
        on="doc_b", n_parts=n_parts,
        left_schema=pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()),
             ("band", pa.int8()), ("text_a", pa.string())]
        ),
        right_schema=pa.schema([("doc_b", pa.int64()), ("text_b", pa.string())]),
    )

    def band_partials(b: pa.Table) -> pa.Table:
        band = b["band"].to_numpy(zero_copy_only=False).astype(np.int64)
        ta = b["text_a"].to_pylist()
        tb = b["text_b"].to_pylist()
        micro = np.empty(len(ta), np.int64)
        for i, (x, y) in enumerate(zip(ta, tb)):
            sa, sb = set(x.split(" ")), set(y.split(" "))
            inter = len(sa & sb)
            micro[i] = (inter * 1000000) // (len(sa) + len(sb) - inter)
        n_p = np.zeros(4, np.int64)
        sm = np.zeros(4, np.int64)
        np.add.at(n_p, band, 1)
        np.add.at(sm, band, micro)
        keep = n_p > 0
        return pa.table(
            {
                "band": pa.array(np.nonzero(keep)[0].astype(np.int64), pa.int64()),
                "n": pa.array(n_p[keep], pa.int64()),
                "s": pa.array(sm[keep], pa.int64()),
            }
        )

    parts = _collect_table(
        j2.map_batches(band_partials, batch_format="pyarrow")
    )  # <= 4 bands x #blocks partial rows — never O(pairs)
    pb = parts["band"].to_numpy(zero_copy_only=False)
    n_p = np.zeros(4, np.int64)
    sm = np.zeros(4, np.int64)
    np.add.at(n_p, pb, parts["n"].to_numpy(zero_copy_only=False))
    np.add.at(sm, pb, parts["s"].to_numpy(zero_copy_only=False))
    bands = np.nonzero(n_p)[0].astype(np.int64)
    n_p, sm = n_p[bands], sm[bands]
    return pa.table(
        {
            "band": pa.array(bands, pa.int64()),
            "n_pairs": pa.array(n_p, pa.int64()),
            "sum_micro": pa.array(sm, pa.int64()),
            "mean_jaccard": pa.array(
                sm.astype(np.float64) / (1000000.0 * n_p.astype(np.float64)),
                pa.float64(),
            ),
        }
    )


DOC_DISTANCE_DECAY_SQL = f"""
WITH pts AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
pr AS (
  SELECT a.doc_id AS da, b.doc_id AS db,
         (a.lat - b.lat) * (a.lat - b.lat)
           + (a.lon - b.lon) * (a.lon - b.lon) AS d2
  FROM pts a JOIN pts b
    ON b.doc_id > a.doc_id
   AND b.lat BETWEEN a.lat - {_DD_RADIUS} AND a.lat + {_DD_RADIUS}
   AND b.lon BETWEEN a.lon - {_DD_RADIUS} AND a.lon + {_DD_RADIUS}
  WHERE (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon)
        <= {_DD_RADIUS * _DD_RADIUS}),
dt AS (
  SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS w
  FROM documents),
sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM dt GROUP BY 1),
inter AS (
  SELECT p.da, p.db, CAST(COUNT(*) AS BIGINT) AS i
  FROM pr p JOIN dt x ON x.doc_id = p.da
            JOIN dt y ON y.doc_id = p.db AND y.w = x.w
  GROUP BY 1, 2),
jac AS (
  SELECT p.da, p.db,
         CASE WHEN p.d2 < 1.0 THEN 0 WHEN p.d2 < 4.0 THEN 1
              WHEN p.d2 < 9.0 THEN 2 ELSE 3 END AS band,
         (COALESCE(i.i, 0) * 1000000)
           // (sa.n + sb.n - COALESCE(i.i, 0)) AS m
  FROM pr p
  LEFT JOIN inter i ON i.da = p.da AND i.db = p.db
  JOIN sz sa ON sa.doc_id = p.da JOIN sz sb ON sb.doc_id = p.db)
SELECT CAST(band AS BIGINT) AS band, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(m) AS BIGINT) AS sum_micro,
       CAST(CAST(SUM(m) AS BIGINT) AS DOUBLE)
         / (1000000.0 * CAST(COUNT(*) AS DOUBLE)) AS mean_jaccard
FROM jac GROUP BY 1
"""


def events_markov_entropy(sf_dir: str):
    """MARKOV ENTROPY RATE of the event-type process (conditional entropy
    H(next | current) over observed transitions — the sequence-
    predictability number behind next-action modeling; compare to the
    marginal entropy to measure how much history helps): the identity
    H*N = sum_i c_i*log2(c_i) - sum_ij c_ij*log2(c_ij) (c_i = outgoing
    totals) turns the whole thing into the DIFFERENCE of two
    micro-quantized c*log2(c) sums over the bounded transition matrix
    (events_transitions' one-shuffle machinery feeds it); exact int64
    arithmetic, one final division."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    _empty = pa.table(
        {
            "from_t": pa.array([], pa.string()),
            "to_t": pa.array([], pa.string()),
            "c": pa.array([], pa.int64()),
        }
    )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ty = np.asarray(g["event_type"].to_pylist())
        order = np.lexsort((eid, us, uid))
        uid, ty = uid[order], ty[order]
        leg = np.zeros(len(uid), dtype=bool)
        leg[1:] = uid[1:] == uid[:-1]
        i = np.nonzero(leg)[0]
        if len(i) == 0:
            return _empty
        frm = ty[i - 1]
        too = ty[i]
        pair = np.char.add(np.char.add(frm, "|"), too)
        u, c = np.unique(pair, return_counts=True)
        parts = np.char.partition(u, "|")
        return pa.table(
            {
                "from_t": pa.array(parts[:, 0].tolist(), pa.string()),
                "to_t": pa.array(parts[:, 2].tolist(), pa.string()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = _collect_table(
        map_groups_partitioned(ds, "user_id", per_part)
        .groupby(["from_t", "to_t"])
        .aggregate(Sum("c", alias_name="c"))
    )  # bounded: types x types
    frm = np.asarray(agg["from_t"].to_pylist())
    c = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = int(c.sum())
    u = np.unique(frm)
    c_i = np.zeros(len(u), np.int64)
    np.add.at(c_i, np.searchsorted(u, frm), c)

    def _micro(v: np.ndarray) -> int:
        return int(
            sql_round_np(
                v.astype(np.float64) * np.log2(v.astype(np.float64))
                * 1000000.0,
                0,
            )
            .astype(np.int64)
            .sum()
        )

    sum_out = _micro(c_i)
    sum_edge = _micro(c)
    h = float(np.float64(sum_out - sum_edge) / (1000000.0 * np.float64(n)))
    return pa.table(
        {
            "n_transitions": pa.array([n], pa.int64()),
            "sum_out_micro": pa.array([sum_out], pa.int64()),
            "sum_edge_micro": pa.array([sum_edge], pa.int64()),
            "entropy_rate": pa.array([h], pa.float64()),
        }
    )


EVENTS_MARKOV_ENTROPY_SQL = """
WITH seqd AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_us(ts), event_id) AS prev
  FROM events),
cc AS (
  SELECT prev AS from_t, event_type AS to_t, CAST(COUNT(*) AS BIGINT) AS c
  FROM seqd WHERE prev IS NOT NULL GROUP BY 1, 2),
outs AS (SELECT from_t, CAST(SUM(c) AS BIGINT) AS ci FROM cc GROUP BY 1),
m AS (
  SELECT
    (SELECT CAST(SUM(c) AS BIGINT) FROM cc) AS n,
    (SELECT CAST(SUM(CAST(ROUND(CAST(ci AS DOUBLE)
                                * LOG2(CAST(ci AS DOUBLE))
                                * 1000000.0, 0) AS BIGINT)) AS BIGINT)
     FROM outs) AS sum_out,
    (SELECT CAST(SUM(CAST(ROUND(CAST(c AS DOUBLE)
                                * LOG2(CAST(c AS DOUBLE))
                                * 1000000.0, 0) AS BIGINT)) AS BIGINT)
     FROM cc) AS sum_edge)
SELECT n AS n_transitions, sum_out AS sum_out_micro,
       sum_edge AS sum_edge_micro,
       CAST(sum_out - sum_edge AS DOUBLE)
         / (1000000.0 * CAST(n AS DOUBLE)) AS entropy_rate
FROM m
"""


def doc_lang_region_mi(sf_dir: str):
    """MUTUAL INFORMATION between language and 30-deg region (how many
    bits does knowing WHERE a document is tell you about its language —
    the info-theoretic association score beside chi-square's test
    statistic): MI = sum p_lr * log2(p_lr/(p_l*p_r)), computed from the
    bounded (lang, region) contingency table (the dissimilarity-index
    machinery) with each cell's term micro-quantized — the log2 argument
    is the cross-multiplied (c_lr * N)/(c_l * c_r), one exact-integer
    division chain cast to double identically on both sides; MI = one
    exact integer sum / (1e6 * N)."""
    import ray
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def lang_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(b["lang"].to_pylist()))
        return pa.table({"lang": pa.array(u.tolist(), pa.string()),
                         "one": pa.array(np.ones(len(u), np.int64))})

    lang_t = _collect_table(
        ds.select_columns(["lang"])
        .map_batches(lang_partial, batch_format="pyarrow", batch_size=131072)
        .groupby("lang")
        .aggregate(Sum("one", alias_name="n"))
    )
    langs = np.sort(np.asarray(lang_t["lang"].to_pylist()))
    lang_ref = ray.put(langs)

    def pack(b: pa.Table) -> pa.Table:
        ls = ray.get(lang_ref)
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(ls, np.asarray(b["lang"].to_pylist()))
        rx = ((doc_id * 104729) % 360000) // _GT_CELL_MILLI
        ry = ((doc_id * 7919) % 140000) // _GT_CELL_MILLI
        key = (idx.astype(np.uint64) << np.uint64(16)) | (
            (rx * 16 + ry).astype(np.uint64)
        )
        return pa.table({"key": pa.array(key, pa.uint64())})

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= langs x regions rows by construction
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    li = (key >> np.uint64(16)).astype(np.int64)
    reg = (key & np.uint64((1 << 16) - 1)).astype(np.int64)
    regs = np.unique(reg)
    rpos = np.searchsorted(regs, reg)
    c_l = np.zeros(len(langs), np.int64)
    c_r = np.zeros(len(regs), np.int64)
    np.add.at(c_l, li, c)
    np.add.at(c_r, rpos, c)
    n = int(c.sum())
    arg = (c.astype(np.float64) * np.float64(n)) / (
        c_l[li].astype(np.float64) * c_r[rpos].astype(np.float64)
    )
    micro = sql_round_np(
        c.astype(np.float64) * np.log2(arg) * 1000000.0, 0
    ).astype(np.int64)
    sm = int(micro.sum())
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "n_langs": pa.array([len(langs)], pa.int64()),
            "n_regions": pa.array([len(regs)], pa.int64()),
            "sum_micro": pa.array([sm], pa.int64()),
            "mi_bits": pa.array(
                [float(np.float64(sm) / (1000000.0 * np.float64(n)))],
                pa.float64(),
            ),
        }
    )


DOC_LANG_REGION_MI_SQL = f"""
WITH pts AS (
  SELECT lang,
         ((doc_id * 104729) % 360000) // {_GT_CELL_MILLI} AS rx,
         ((doc_id * 7919) % 140000) // {_GT_CELL_MILLI} AS ry
  FROM documents),
cc AS (SELECT lang, rx, ry, CAST(COUNT(*) AS BIGINT) AS c
       FROM pts GROUP BY 1, 2, 3),
lm AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS cl FROM cc GROUP BY 1),
rm AS (SELECT rx, ry, CAST(SUM(c) AS BIGINT) AS cr FROM cc GROUP BY 1, 2),
nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cc),
terms AS (
  SELECT CAST(ROUND(CAST(cc.c AS DOUBLE)
                    * LOG2((CAST(cc.c AS DOUBLE) * CAST(nn.n AS DOUBLE))
                           / (CAST(lm.cl AS DOUBLE)
                              * CAST(rm.cr AS DOUBLE)))
                    * 1000000.0, 0) AS BIGINT) AS m,
         nn.n
  FROM cc JOIN lm USING (lang)
  JOIN rm ON rm.rx = cc.rx AND rm.ry = cc.ry CROSS JOIN nn)
SELECT MAX(n) AS n_docs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM lm) AS n_langs,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM rm) AS n_regions,
       CAST(SUM(m) AS BIGINT) AS sum_micro,
       CAST(CAST(SUM(m) AS BIGINT) AS DOUBLE)
         / (1000000.0 * CAST(MAX(n) AS DOUBLE)) AS mi_bits
FROM terms
"""


_TB_MIN_DF = 5  # burstiness needs a document-frequency floor
_TB_K = 20


def doc_term_burstiness(sf_dir: str):
    """TERM BURSTINESS (Church-Gale: cf/df — a word's total occurrences
    per document that contains it; function words sit near their
    Poisson rate, topical/template words CLUMP): top-{K} burstiest terms
    with df >= {MIN_DF}. Machinery: the vocab shape with TWO counters
    (collection frequency + document frequency — per-batch df partials
    count distinct docs per token, summing to true df because a doc's
    tokens never split across batches at batch_size rows-of-docs); hash
    partition by token makes both counts exact locally, per-partition
    top-k prune under the (ratio desc, token asc) order with the ratio
    as ONE double division mirrored in SQL, bounded driver merge."""
    from core_ray.stages.agg import _GOLD, _n_parts, hash_strings

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_parts = _n_parts()

    def partial(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        toks = np.asarray([w for t in texts for w in t.split(" ")])
        if len(toks) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "cf": pa.array([], pa.int64()),
                 "df": pa.array([], pa.int64()),
                 "__part": pa.array([], pa.int32())}
            )
        doc_idx = np.repeat(
            np.arange(len(texts)),
            np.asarray([len(t.split(" ")) for t in texts], np.int64),
        )
        vocab, inv = np.unique(toks, return_inverse=True)
        cf = np.bincount(inv, minlength=len(vocab)).astype(np.int64)
        # df: distinct (token, doc) pairs per token
        pair = inv.astype(np.int64) * len(texts) + doc_idx
        up = np.unique(pair)
        df = np.bincount(
            (up // len(texts)).astype(np.int64), minlength=len(vocab)
        ).astype(np.int64)
        h = hash_strings(pa.array(vocab, pa.string()))
        return pa.table(
            {
                "token": pa.array(vocab, pa.string()),
                "cf": pa.array(cf, pa.int64()),
                "df": pa.array(df, pa.int64()),
                "__part": pa.array(
                    ((h * _GOLD) % np.uint64(n_parts)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    def prune(g: pa.Table) -> pa.Table:
        toks = np.asarray(g["token"].to_pylist())
        cf = g["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
        df = g["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(toks, kind="stable")
        ts_, cf, df = toks[order], cf[order], df[order]
        firsts = np.nonzero(np.r_[True, ts_[1:] != ts_[:-1]])[0]
        scf = np.add.reduceat(cf, firsts)
        sdf = np.add.reduceat(df, firsts)
        u = ts_[firsts]
        keep = sdf >= _TB_MIN_DF
        u, scf, sdf = u[keep], scf[keep], sdf[keep]
        if len(u) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()),
                 "cf": pa.array([], pa.int64()),
                 "df": pa.array([], pa.int64())}
            )
        ratio = scf.astype(np.float64) / sdf.astype(np.float64)
        top = np.lexsort((u, -ratio))[:_TB_K]
        return pa.table(
            {
                "token": pa.array(u[top], pa.string()),
                "cf": pa.array(scf[top], pa.int64()),
                "df": pa.array(sdf[top], pa.int64()),
            }
        )

    t = _collect_table(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=2048)
        .groupby("__part")
        .map_groups(prune, batch_format="pyarrow")
    )  # <= n_parts x K rows by construction
    toks = np.asarray(t["token"].to_pylist())
    cf = t["cf"].to_numpy(zero_copy_only=False).astype(np.int64)
    df = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    ratio = cf.astype(np.float64) / df.astype(np.float64)
    top = np.lexsort((toks, -ratio))[:_TB_K]
    return pa.table(
        {
            "token": pa.array(toks[top], pa.string()),
            "cf": pa.array(cf[top], pa.int64()),
            "df": pa.array(df[top], pa.int64()),
            "burstiness": pa.array(ratio[top], pa.float64()),
        }
    )


DOC_TERM_BURSTINESS_SQL = f"""
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents),
cc AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS cf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY 1)
SELECT w AS token, cf, df,
       CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) AS burstiness
FROM cc WHERE df >= {_TB_MIN_DF}
ORDER BY CAST(cf AS DOUBLE) / CAST(df AS DOUBLE) DESC, w
LIMIT {_TB_K}
"""


_PMI_MIN_C = 5  # collocation support floor
_PMI_K = 20


def doc_pmi_collocations(sf_dir: str):
    """PMI COLLOCATION MINING (top-{K} adjacent-word pairs by pointwise
    mutual information — the classic phrase detector: PMI finds pairs
    that co-occur far above their unigram chance rate): pass 1 is the
    exact unigram count (the vocab combiner; broadcast under the
    surprisal guard — the distributed-join hatch is the same swap),
    pass 2 hash-partitions BIGRAM counts so each partition scores its
    bigrams locally against the broadcast unigrams + N and prunes to
    top-{K} under (pmi desc, bigram asc); PMI is ONE double chain
    log2((c_xy * N)/(c_x * c_y)) mirrored in SQL, support floor
    c_xy >= {MIN}."""
    import ray
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import _GOLD, _n_parts, hash_strings

    ds = _read(sf_dir, "documents", ["text"])
    n_parts = _n_parts()

    def uni_partial(b: pa.Table) -> pa.Table:
        toks = np.asarray(
            [w for t in b["text"].to_pylist() for w in t.split(" ")]
        )
        u, c = np.unique(toks, return_counts=True)
        return pa.table(
            {"w": pa.array(u.tolist(), pa.string()),
             "c": pa.array(c.astype(np.int64), pa.int64())}
        )

    uni = _collect_table(
        ds.map_batches(uni_partial, batch_format="pyarrow", batch_size=2048)
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
    )  # vocab fits the broadcast guard at these scales (surprisal hatch)
    uw = np.sort(np.asarray(uni["w"].to_pylist()))
    uc_raw = np.asarray(uni["w"].to_pylist())
    order = np.argsort(uc_raw)
    uc = uni["c"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    n_total = float(uc.sum())
    uni_ref = ray.put((uw, uc))

    def bi_partial(b: pa.Table) -> pa.Table:
        rows = []
        for t in b["text"].to_pylist():
            ws = t.split(" ")
            rows.extend(
                ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1)
            )
        if not rows:
            return pa.table(
                {"bg": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64()),
                 "__part": pa.array([], pa.int32())}
            )
        arr = np.asarray(rows)
        u, c = np.unique(arr, return_counts=True)
        h = hash_strings(pa.array(u, pa.string()))
        return pa.table(
            {
                "bg": pa.array(u.tolist(), pa.string()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
                "__part": pa.array(
                    ((h * _GOLD) % np.uint64(n_parts)).astype(np.int32),
                    pa.int32(),
                ),
            }
        )

    def prune(g: pa.Table) -> pa.Table:
        uw_, uc_ = ray.get(uni_ref)
        bgs = np.asarray(g["bg"].to_pylist())
        c = g["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(bgs, kind="stable")
        bs, cs = bgs[order], c[order]
        firsts = np.nonzero(np.r_[True, bs[1:] != bs[:-1]])[0]
        sc = np.add.reduceat(cs, firsts)
        ub = bs[firsts]
        keep = sc >= _PMI_MIN_C
        ub, sc = ub[keep], sc[keep]
        if len(ub) == 0:
            return pa.table(
                {"bigram": pa.array([], pa.string()),
                 "c_xy": pa.array([], pa.int64()),
                 "pmi": pa.array([], pa.float64())}
            )
        parts = np.char.partition(ub, " ")
        cx = uc_[np.searchsorted(uw_, parts[:, 0])]
        cy = uc_[np.searchsorted(uw_, parts[:, 2])]
        pmi = np.log2(
            (sc.astype(np.float64) * n_total)
            / (cx.astype(np.float64) * cy.astype(np.float64))
        )
        top = np.lexsort((ub, -pmi))[:_PMI_K]
        return pa.table(
            {
                "bigram": pa.array(ub[top], pa.string()),
                "c_xy": pa.array(sc[top], pa.int64()),
                "pmi": pa.array(pmi[top], pa.float64()),
            }
        )

    t = _collect_table(
        ds.map_batches(bi_partial, batch_format="pyarrow", batch_size=2048)
        .groupby("__part")
        .map_groups(prune, batch_format="pyarrow")
    )  # <= n_parts x K rows by construction
    bgs = np.asarray(t["bigram"].to_pylist())
    cxy = t["c_xy"].to_numpy(zero_copy_only=False).astype(np.int64)
    pmi = t["pmi"].to_numpy(zero_copy_only=False)
    top = np.lexsort((bgs, -pmi))[:_PMI_K]
    return pa.table(
        {
            "bigram": pa.array(bgs[top], pa.string()),
            "c_xy": pa.array(cxy[top], pa.int64()),
            "pmi": pa.array(pmi[top], pa.float64()),
        }
    )


DOC_PMI_COLLOCATIONS_SQL = f"""
WITH ws AS (SELECT string_split(text, ' ') AS l FROM documents),
w AS (SELECT UNNEST(l) AS w FROM ws),
uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1),
nn AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
bg AS (
  SELECT UNNEST(list_transform(generate_series(1, len(l) - 1),
                               i -> l[i] || ' ' || l[i + 1])) AS b
  FROM ws),
bc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c_xy FROM bg GROUP BY 1),
scored AS (
  SELECT bc.b AS bigram, bc.c_xy,
         LOG2((CAST(bc.c_xy AS DOUBLE) * CAST(nn.n AS DOUBLE))
              / (CAST(x.c AS DOUBLE) * CAST(y.c AS DOUBLE))) AS pmi
  FROM bc
  JOIN uni x ON x.w = string_split(bc.b, ' ')[1]
  JOIN uni y ON y.w = string_split(bc.b, ' ')[2]
  CROSS JOIN nn
  WHERE bc.c_xy >= {_PMI_MIN_C})
SELECT bigram, c_xy, pmi FROM scored
ORDER BY pmi DESC, bigram LIMIT {_PMI_K}
"""


def events_contact_assortativity(sf_dir: str):
    """DEGREE ASSORTATIVITY of the contact graph (Newman's r: do
    well-connected users meet other well-connected users? r > 0 =
    social-core mixing, r < 0 = hub-and-spoke): over the distinct
    contact edges (bounded by co-locations), each edge contributes BOTH
    orientations (the undirected convention), and r is the Pearson
    correlation of endpoint degrees — exact integer moments (degrees are
    ints; M, sx, sxy, sxx over 2|E| orientation rows), one fixed chain.
    Symmetric x/y marginals collapse (sx == sy, sxx == syy), mirrored in
    the SQL. Fully DISTRIBUTED (VERDICT r4 — no O(pairs) driver traffic):
    distinct edges come from one pair-keyed hash partition over the shared
    contact materialization; degrees from count_by_u64 over edge
    endpoints; the orientation-row moments collapse EXACTLY onto the
    degree table alone (sum over 2|E| rows of d_x == sum_u deg_u^2, of
    d_x^2 == sum_u deg_u^3 — each user appears as an endpoint deg_u
    times), leaving only sxy needing per-edge endpoint pairing — two hash
    equi-joins attach both endpoint degrees in tasks, and the driver
    receives one O(#blocks) table of integer moment partials."""
    from core_ray.stages.agg import count_by_u64, map_groups_partitioned
    from core_ray.stages.join import hash_join

    pairs = _contact_pairs_ds(sf_dir)
    keyed = pairs.map_batches(_pack_user_pairs, batch_format="pyarrow")

    def distinct_edges(g: pa.Table) -> pa.Table:
        u = np.unique(g["key"].to_numpy(zero_copy_only=False).astype(np.uint64))
        return pa.table(
            {
                "u1": pa.array((u >> np.uint64(32)).astype(np.int64), pa.int64()),
                "u2": pa.array((u & np.uint64(0xFFFFFFFF)).astype(np.int64),
                               pa.int64()),
            }
        )

    edges = map_groups_partitioned(keyed, "key", distinct_edges).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pa.array(
                    np.concatenate(
                        [b["u1"].to_numpy(zero_copy_only=False),
                         b["u2"].to_numpy(zero_copy_only=False)]
                    ).astype(np.uint64),
                    pa.uint64(),
                )
            }
        )

    deg = count_by_u64(
        edges.map_batches(endpoints, batch_format="pyarrow"), "key"
    ).materialize()

    # degree-table moments: n_users, sx = sum d^2, sxx = sum d^3 (exact
    # int64 partials; one O(#blocks) collect)
    def deg_moments(b: pa.Table) -> pa.Table:
        d = b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_users": pa.array([len(d)], pa.int64()),
                "s2": pa.array([int((d * d).sum())], pa.int64()),
                "s3": pa.array([int((d * d * d).sum())], pa.int64()),
            }
        )

    dm = _collect_table(deg.map_batches(deg_moments, batch_format="pyarrow"))
    n_users = int(pc.sum(dm["n_users"]).as_py() or 0)
    sx = int(pc.sum(dm["s2"]).as_py() or 0)
    sxx = int(pc.sum(dm["s3"]).as_py() or 0)

    # sxy: attach both endpoint degrees per edge (two distributed hash
    # joins), fold dx*dy in tasks
    edge_schema = pa.schema([("u1", pa.int64()), ("u2", pa.int64())])

    def deg_as(col: str, out: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    col: pa.array(
                        b["key"].to_numpy(zero_copy_only=False).astype(np.int64),
                        pa.int64(),
                    ),
                    out: b["cnt"],
                }
            )

        return f

    j1 = hash_join(
        edges, deg.map_batches(deg_as("u1", "dx"), batch_format="pyarrow"),
        on="u1", left_schema=edge_schema,
        right_schema=pa.schema([("u1", pa.int64()), ("dx", pa.int64())]),
    )
    j2 = hash_join(
        j1, deg.map_batches(deg_as("u2", "dy"), batch_format="pyarrow"),
        on="u2",
        left_schema=pa.schema(
            [("u1", pa.int64()), ("u2", pa.int64()), ("dx", pa.int64())]
        ),
        right_schema=pa.schema([("u2", pa.int64()), ("dy", pa.int64())]),
    )

    def edge_moments(b: pa.Table) -> pa.Table:
        dx = b["dx"].to_numpy(zero_copy_only=False).astype(np.int64)
        dy = b["dy"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n_edges": pa.array([len(dx)], pa.int64()),
                "sdd": pa.array([int((dx * dy).sum())], pa.int64()),
            }
        )

    em = _collect_table(j2.map_batches(edge_moments, batch_format="pyarrow"))
    n_edges = int(pc.sum(em["n_edges"]).as_py() or 0)
    sxy = 2 * int(pc.sum(em["sdd"]).as_py() or 0)

    m = 2 * n_edges
    num = m * sxy - sx * sx
    den = m * sxx - sx * sx
    # a regular graph (all degrees equal) has zero degree variance:
    # assortativity is undefined -> NULL (NULLIF-mirrored in the SQL)
    r = float(np.float64(num) / np.float64(den)) if den != 0 else None
    return pa.table(
        {
            "n_edges": pa.array([n_edges], pa.int64()),
            "n_users": pa.array([n_users], pa.int64()),
            "r_num": pa.array([num], pa.int64()),
            "r_den": pa.array([den], pa.int64()),
            "assortativity": pa.array([r], pa.float64()),
        }
    )


EVENTS_CONTACT_ASSORTATIVITY_SQL = f"""
WITH pts AS (
  SELECT event_id, user_id, epoch_us(ts) AS us,
         {CONTACT_LAT_SQL} AS lat, {CONTACT_LON_SQL} AS lon
  FROM events),
hits AS (
  SELECT DISTINCT LEAST(a.user_id, b.user_id) AS u1,
         GREATEST(a.user_id, b.user_id) AS u2
  FROM pts a JOIN pts b
    ON a.event_id < b.event_id AND a.user_id != b.user_id
 WHERE (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon)
       <= {_CONTACT_RADIUS_DEG * _CONTACT_RADIUS_DEG}
   AND ABS(a.us - b.us) <= {_CONTACT_WINDOW_US}),
deg AS (
  SELECT u, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u1 AS u FROM hits UNION ALL SELECT u2 FROM hits)
  GROUP BY 1),
orient AS (
  SELECT da.d AS dx, db.d AS dy
  FROM hits JOIN deg da ON da.u = hits.u1 JOIN deg db ON db.u = hits.u2
  UNION ALL
  SELECT db.d, da.d
  FROM hits JOIN deg da ON da.u = hits.u1 JOIN deg db ON db.u = hits.u2),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(dx) AS BIGINT) AS sx,
         CAST(SUM(dx * dy) AS BIGINT) AS sxy,
         CAST(SUM(dx * dx) AS BIGINT) AS sxx
  FROM orient)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM hits) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_users,
       m.m * m.sxy - m.sx * m.sx AS r_num,
       m.m * m.sxx - m.sx * m.sx AS r_den,
       CAST(m.m * m.sxy - m.sx * m.sx AS DOUBLE)
         / CAST(NULLIF(m.m * m.sxx - m.sx * m.sx, 0) AS DOUBLE)
         AS assortativity
FROM m
"""


def events_user_gini(sf_dir: str):
    """USER-ACTIVITY INEQUALITY (Gini over per-user event counts — the
    80/20 check on engagement): unlike events_cell_gini's geometry-
    bounded cells, USERS are an unbounded key — so the Gini comes from
    the VALUE HISTOGRAM of per-user counts (distinct activity levels
    reach the driver, never users — the doc_quality_buckets contract):
    for a run of m users sharing count v starting after cumulative rank
    a, sum(i*c_i) over the run = v*(m*a + m*(m+1)/2) EXACTLY, because
    rank order within equal values is irrelevant to the weighted sum.
    Two packed count passes (user counts -> count-of-counts), all-
    integer moments, one fixed final chain."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["user_id"])

    def ukey(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pa.array(
                    b["user_id"].to_numpy(zero_copy_only=False).astype(
                        np.uint64
                    ),
                    pa.uint64(),
                )
            }
        )

    per_user = count_by_u64(
        ds.map_batches(ukey, batch_format="pyarrow", batch_size=131072),
        "key",
    )

    def vkey(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pa.array(
                    b["cnt"].to_numpy(zero_copy_only=False).astype(
                        np.uint64
                    ),
                    pa.uint64(),
                )
            }
        )

    hist = _collect_table(
        count_by_u64(
            per_user.map_batches(vkey, batch_format="pyarrow"), "key"
        )
    )  # <= distinct activity levels rows by construction
    v = hist["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    m = hist["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(v)
    v, m = v[order], m[order]
    n = int(m.sum())
    s = int((v * m).sum())
    a = np.concatenate([[0], np.cumsum(m)])[:-1]  # users before each run
    wsum = int((v * (m * a + m * (m + 1) // 2)).sum())
    gini = float(
        np.float64(2 * wsum) / np.float64(n * s)
        - np.float64(n + 1) / np.float64(n)
    )
    return pa.table(
        {
            "n_users": pa.array([n], pa.int64()),
            "n_events": pa.array([s], pa.int64()),
            "wsum2": pa.array([2 * wsum], pa.int64()),
            "gini": pa.array([gini], pa.float64()),
        }
    )


EVENTS_USER_GINI_SQL = """
WITH cc AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS i FROM cc),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s,
         CAST(2 * SUM(i * c) AS BIGINT) AS wsum2
  FROM ranked)
SELECT n AS n_users, s AS n_events, wsum2,
       CAST(wsum2 AS DOUBLE) / CAST(n * s AS DOUBLE)
         - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
FROM m
"""


def doc_length_lognormal(sf_dir: str):
    """LOG-NORMAL FIT of document lengths (web text lengths are famously
    log-normal — mu/sigma in log2-space are the two numbers a sampler or
    truncation policy is tuned against): each length's log2 quantizes to
    integer milli-bits ONCE (the shared sql_round_np contract), then
    mu and sigma come from exact order-free integer moments — sigma via
    the n*sum(x^2) - sum(x)^2 identity, one fixed sqrt chain. One
    map-only combiner pass (three ints per batch reach the driver)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        v = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = sql_round_np(
            np.log2(v.astype(np.float64)) * 1000.0, 0
        ).astype(np.int64)
        return pa.table(
            {
                "one": pa.array([1], pa.int64()),
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
            }
        )

    agg = _collect_table(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("one")
        .aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sxx", alias_name="sxx"),
        )
    )
    n = int(agg["n"][0].as_py())
    sx = int(agg["sx"][0].as_py())
    sxx = int(agg["sxx"][0].as_py())
    mu = float(np.float64(sx) / (1000.0 * np.float64(n)))
    sigma = float(
        np.sqrt(np.float64(n * sxx - sx * sx)) / (1000.0 * np.float64(n))
    )
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "sum_milli": pa.array([sx], pa.int64()),
            "sumsq_milli": pa.array([sxx], pa.int64()),
            "mu_bits": pa.array([mu], pa.float64()),
            "sigma_bits": pa.array([sigma], pa.float64()),
        }
    )


DOC_LENGTH_LOGNORMAL_SQL = """
WITH q AS (
  SELECT CAST(ROUND(LOG2(CAST(n_chars AS DOUBLE)) * 1000.0, 0)
              AS BIGINT) AS x
  FROM documents),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM q)
SELECT n AS n_docs, sx AS sum_milli, sxx AS sumsq_milli,
       CAST(sx AS DOUBLE) / (1000.0 * CAST(n AS DOUBLE)) AS mu_bits,
       SQRT(CAST(n * sxx - sx * sx AS DOUBLE))
         / (1000.0 * CAST(n AS DOUBLE)) AS sigma_bits
FROM m
"""


_ACF_LAGS = (1, 24, 168)  # hour, day, week


def events_hourly_acf(sf_dir: str):
    """TEMPORAL AUTOCORRELATION of the hourly event series at the three
    structural lags (1 h persistence, 24 h diurnal, 168 h weekly — the
    seasonality fingerprint a forecaster reads first): the hourly count
    series over the full [min, max] hour span (implicit zeros included —
    they are real observations), Pearson r at each lag from EXACT integer
    moments over the lag-joined pairs (m, sx, sy, sxy, sxx, syy — the
    zero hours enter only through the span), one fixed two-sqrt chain
    per lag. One packed count pass (bounded by the horizon), driver
    fold."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["ts"])

    def pack(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "key": pa.array(
                    (us // 3600000000).astype(np.uint64), pa.uint64()
                )
            }
        )

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= horizon-hours rows by construction
    rows = []
    if t.num_rows:  # empty corpus -> empty result (ADVICE r4: no h.min() crash)
        h = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        h0, h1 = int(h.min()), int(h.max())
        series = np.zeros(h1 - h0 + 1, np.int64)
        series[h - h0] = c

        for lag in _ACF_LAGS:
            if len(series) <= lag:
                continue
            x = series[:-lag]
            y = series[lag:]
            m = len(x)
            sx, sy = int(x.sum()), int(y.sum())
            sxy = int((x * y).sum())
            sxx = int((x * x).sum())
            syy = int((y * y).sum())
            num = m * sxy - sx * sy
            vx = m * sxx - sx * sx
            vy = m * syy - sy * sy
            # zero variance on either leg: r undefined -> NULL (SQL NULLIF)
            r = (
                float(np.float64(num) / (np.sqrt(np.float64(vx)) * np.sqrt(np.float64(vy))))
                if vx != 0 and vy != 0
                else None
            )
            rows.append((lag, m, num, r))
    return pa.table(
        {
            "lag_h": pa.array([r[0] for r in rows], pa.int64()),
            "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
            "r_num": pa.array([r[2] for r in rows], pa.int64()),
            "acf": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


_ACF_LAG_SQL = ", ".join(str(lag) for lag in _ACF_LAGS)

EVENTS_HOURLY_ACF_SQL = f"""
WITH cc AS (
  SELECT epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM cc),
grid AS (
  SELECT g.h, COALESCE(cc.c, 0) AS c
  FROM (SELECT UNNEST(generate_series((SELECT h0 FROM span),
                                      (SELECT h1 FROM span))) AS h) g
  LEFT JOIN cc ON cc.h = g.h),
lags AS (SELECT UNNEST([{_ACF_LAG_SQL}]) AS lag),
pairs AS (
  SELECT l.lag, a.c AS x, b.c AS y
  FROM lags l JOIN grid a ON TRUE JOIN grid b ON b.h = a.h + l.lag),
m AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1)
SELECT CAST(lag AS BIGINT) AS lag_h, m AS n_pairs,
       m * sxy - sx * sy AS r_num,
       CAST(m * sxy - sx * sy AS DOUBLE)
         / NULLIF(SQRT(CAST(m * sxx - sx * sx AS DOUBLE))
                  * SQRT(CAST(m * syy - sy * sy AS DOUBLE)), 0) AS acf
FROM m ORDER BY 1
"""


def geo_std_ellipse(sf_dir: str):
    """STANDARD DEVIATIONAL ELLIPSE of the document distribution (the
    ArcGIS directional-distribution classic: centroid + axis variances +
    orientation — is the corpus footprint stretched along a coastline or
    isotropic?): ALL-INTEGER milli-degree moments (n, sx, sy, sxx, syy,
    sxy), variance/covariance numerators by the n*sxx - sx^2 identity,
    and the orientation emitted WITHOUT atan2 — tan(2*theta) =
    2*cov/(var_x - var_y) is an EXACT rational of integer numerators
    (the atan2 libm step is the caller's one-liner); one map-only
    combiner pass. Moments are CENTERED on the fixed mid-range offsets
    (180000/70000 milli-deg; ADVICE r4) — variance numerators are
    shift-invariant so outputs are unchanged, but the intermediate
    n*sxx product no longer overflows before the OUTPUT itself would:
    int64 now holds to ~1.7e4 docs worst-case / ~2.9e4 uniform, exactly
    where var_x_num stops fitting the column type, and both engines
    fail loud (pa.int64 OverflowError / DuckDB BIGINT overflow) at that
    same point rather than on an internal product."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id"])

    def partial(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = (doc_id * 104729) % 360000 - 180000
        y = (doc_id * 7919) % 140000 - 70000
        return pa.table(
            {
                "one": pa.array([1], pa.int64()),
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sy": pa.array([int(y.sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "syy": pa.array([int((y * y).sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
            }
        )

    agg = _collect_table(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("one")
        .aggregate(
            Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"),
        )
    )
    n = int(agg["n"][0].as_py())
    sx = int(agg["sx"][0].as_py())
    sy = int(agg["sy"][0].as_py())
    sxx = int(agg["sxx"][0].as_py())
    syy = int(agg["syy"][0].as_py())
    sxy = int(agg["sxy"][0].as_py())
    var_x = n * sxx - sx * sx
    var_y = n * syy - sy * sy
    cov = n * sxy - sx * sy
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            # centroid in the UNCENTERED frame: undo the fixed offset with
            # exact integer arithmetic before the single division
            "cx_milli": pa.array(
                [float(np.float64(sx + n * 180000) / np.float64(n))],
                pa.float64(),
            ),
            "cy_milli": pa.array(
                [float(np.float64(sy + n * 70000) / np.float64(n))],
                pa.float64(),
            ),
            "var_x_num": pa.array([var_x], pa.int64()),
            "var_y_num": pa.array([var_y], pa.int64()),
            "cov_num": pa.array([cov], pa.int64()),
            "tan_2theta": pa.array(
                [float(np.float64(2 * cov) / np.float64(var_x - var_y))],
                pa.float64(),
            ),
        }
    )


GEO_STD_ELLIPSE_SQL = """
WITH pts AS (
  SELECT (doc_id * 104729) % 360000 - 180000 AS x,
         (doc_id * 7919) % 140000 - 70000 AS y
  FROM documents),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pts)
SELECT n AS n_docs,
       CAST(sx + n * 180000 AS DOUBLE) / CAST(n AS DOUBLE) AS cx_milli,
       CAST(sy + n * 70000 AS DOUBLE) / CAST(n AS DOUBLE) AS cy_milli,
       n * sxx - sx * sx AS var_x_num,
       n * syy - sy * sy AS var_y_num,
       n * sxy - sx * sy AS cov_num,
       CAST(2 * (n * sxy - sx * sy) AS DOUBLE)
         / CAST((n * sxx - sx * sx) - (n * syy - sy * sy) AS DOUBLE)
         AS tan_2theta
FROM m
"""


_RIPLEY_RMAX = 3.0  # Ripley K max radius (degrees)


def geo_ripley_k(sf_dir: str):
    """RIPLEY'S K FUNCTION (the canonical multi-scale point-pattern
    statistic: K(r) vs pi*r^2 says clustered/random/dispersed AT EACH
    radius — one number per scale where Moran/Gini give one number
    total): cumulative pair counts within r = 1, 2, 3 deg from the
    distance-band join (ONE shuffle at the largest radius), bands by
    integer-exact d2-threshold comparisons (no sqrt), K(r) = A * 2 *
    n_pairs(r) / n^2 with the study area A = 360*140 deg^2 — per radius
    ONE double chain over exact integers (border correction omitted —
    documented, mirrored)."""
    from core_ray.stages.distband import distance_pairs

    docs = _read(sf_dir, "documents", ["doc_id"])

    def shape(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(doc_id)
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )

    n = docs.count()
    pairs = distance_pairs(
        docs.map_batches(shape, batch_format="pyarrow"), _RIPLEY_RMAX
    )

    def band_partial(b: pa.Table) -> pa.Table:
        d2 = b["sq_dist"].to_numpy(zero_copy_only=False)
        band = np.where(d2 <= 1.0, 1, np.where(d2 <= 4.0, 2, 3))
        u, c = np.unique(band, return_counts=True)
        return pa.table(
            {
                "r": pa.array(u.astype(np.int64), pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = _collect_table(
        pairs.map_batches(band_partial, batch_format="pyarrow")
        .groupby("r")
        .aggregate(Sum("c", alias_name="c"))
    )
    rb = agg["r"].to_numpy(zero_copy_only=False).astype(np.int64)
    cb = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    counts = np.zeros(3, np.int64)
    counts[rb - 1] = cb
    cum = np.cumsum(counts)
    area = 360.0 * 140.0
    rows = []
    for i, r in enumerate((1, 2, 3)):
        k = float(
            area * 2.0 * np.float64(int(cum[i]))
            / (np.float64(n) * np.float64(n))
        )
        rows.append((r, int(cum[i]), k,
                     float(np.pi * np.float64(r) * np.float64(r))))
    return pa.table(
        {
            "r": pa.array([x[0] for x in rows], pa.int64()),
            "n_pairs": pa.array([x[1] for x in rows], pa.int64()),
            "k": pa.array([x[2] for x in rows], pa.float64()),
            "csr_expect": pa.array([x[3] for x in rows], pa.float64()),
        }
    )


GEO_RIPLEY_K_SQL = f"""
WITH pts AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
pr AS (
  SELECT (a.lat - b.lat) * (a.lat - b.lat)
           + (a.lon - b.lon) * (a.lon - b.lon) AS d2
  FROM pts a JOIN pts b
    ON b.doc_id > a.doc_id
   AND b.lat BETWEEN a.lat - {_RIPLEY_RMAX} AND a.lat + {_RIPLEY_RMAX}
   AND b.lon BETWEEN a.lon - {_RIPLEY_RMAX} AND a.lon + {_RIPLEY_RMAX}
  WHERE (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon)
        <= {_RIPLEY_RMAX * _RIPLEY_RMAX}),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts),
cum AS (
  SELECT r.r,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM pr
          WHERE pr.d2 <= CAST(r.r * r.r AS DOUBLE)) AS n_pairs
  FROM (SELECT UNNEST([1, 2, 3]) AS r) r)
SELECT CAST(c.r AS BIGINT) AS r, c.n_pairs,
       360.0 * 140.0 * 2.0 * CAST(c.n_pairs AS DOUBLE)
         / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)) AS k,
       PI() * CAST(c.r AS DOUBLE) * CAST(c.r AS DOUBLE) AS csr_expect
FROM cum c CROSS JOIN nn
"""


_CROSS_K_RMAX = 3.0  # bivariate cross-K max radius (degrees)


def geo_cross_k(sf_dir: str):
    """BIVARIATE CROSS-K FUNCTION (Ripley's K between TWO point types —
    "are events clustered AROUND documents beyond chance", the canonical
    attraction/repulsion test between heterogeneous layers; the univariate
    geo_ripley_k above cannot see cross-type structure): cumulative
    (doc, event) pair counts within r = 1, 2, 3 deg from ONE bipartite
    distance-band join at the largest radius (stages/distband.py
    bipartite_band_pairs: asymmetric 1x + 9x home+ghost replication, one
    hash shuffle), bands by exact d2-threshold comparisons (no sqrt),
    K_ab(r) = A * n_pairs(r) / (n_a * n_b) — cross pairs are ordered
    once per (doc, event) so there is NO factor 2 (unlike the self-join
    K); per radius ONE double chain over exact integers. Border
    correction omitted — documented, mirrored in the SQL."""
    from core_ray.stages.distband import bipartite_band_pairs

    docs = _read(sf_dir, "documents", ["doc_id"])
    evs = _read(sf_dir, "events", ["event_id"])

    def doc_shape(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(doc_id)
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )

    def ev_shape(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(eid)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )

    n_d = docs.count()
    n_e = evs.count()
    pairs = bipartite_band_pairs(
        docs.map_batches(doc_shape, batch_format="pyarrow"),
        evs.map_batches(ev_shape, batch_format="pyarrow"),
        _CROSS_K_RMAX,
    )

    def band_partial(b: pa.Table) -> pa.Table:
        d2 = b["sq_dist"].to_numpy(zero_copy_only=False)
        band = np.where(d2 <= 1.0, 1, np.where(d2 <= 4.0, 2, 3))
        u, c = np.unique(band, return_counts=True)
        return pa.table(
            {
                "r": pa.array(u.astype(np.int64), pa.int64()),
                "c": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = _collect_table(
        pairs.map_batches(band_partial, batch_format="pyarrow")
        .groupby("r")
        .aggregate(Sum("c", alias_name="c"))
    )
    counts = np.zeros(3, np.int64)
    if agg.num_rows:
        rb = agg["r"].to_numpy(zero_copy_only=False).astype(np.int64)
        cb = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        counts[rb - 1] = cb
    cum = np.cumsum(counts)
    area = 360.0 * 140.0
    rows = []
    for i, r in enumerate((1, 2, 3)):
        k = float(
            area * np.float64(int(cum[i]))
            / (np.float64(n_d) * np.float64(n_e))
        )
        rows.append((r, int(cum[i]), k,
                     float(np.pi * np.float64(r) * np.float64(r))))
    return pa.table(
        {
            "r": pa.array([x[0] for x in rows], pa.int64()),
            "n_pairs": pa.array([x[1] for x in rows], pa.int64()),
            "k_ab": pa.array([x[2] for x in rows], pa.float64()),
            "csr_expect": pa.array([x[3] for x in rows], pa.float64()),
        }
    )


GEO_CROSS_K_SQL = f"""
WITH d AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
e AS (
  SELECT event_id,
         {GEO_LAT_SQL.replace('doc_id', 'event_id')} AS lat,
         {GEO_LON_SQL.replace('doc_id', 'event_id')} AS lon FROM events),
pr AS (
  SELECT (d.lat - e.lat) * (d.lat - e.lat)
           + (d.lon - e.lon) * (d.lon - e.lon) AS d2
  FROM d JOIN e
    ON e.lat BETWEEN d.lat - {_CROSS_K_RMAX} AND d.lat + {_CROSS_K_RMAX}
   AND e.lon BETWEEN d.lon - {_CROSS_K_RMAX} AND d.lon + {_CROSS_K_RMAX}
  WHERE (d.lat - e.lat) * (d.lat - e.lat)
          + (d.lon - e.lon) * (d.lon - e.lon)
        <= {_CROSS_K_RMAX * _CROSS_K_RMAX}),
nn AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS nd,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS ne),
cum AS (
  SELECT r.r,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM pr
          WHERE pr.d2 <= CAST(r.r * r.r AS DOUBLE)) AS n_pairs
  FROM (SELECT UNNEST([1, 2, 3]) AS r) r)
SELECT CAST(c.r AS BIGINT) AS r, c.n_pairs,
       360.0 * 140.0 * CAST(c.n_pairs AS DOUBLE)
         / (CAST(nn.nd AS DOUBLE) * CAST(nn.ne AS DOUBLE)) AS k_ab,
       PI() * CAST(c.r AS DOUBLE) * CAST(c.r AS DOUBLE) AS csr_expect
FROM cum c CROSS JOIN nn
"""


_QUADRAT_MILLI = 10000  # 10-degree quadrats, in milli-degrees
_QUADRAT_CELLS = 36 * 14  # fixed study frame [-180,180) x [-70,70)


def geo_quadrat_vmr(sf_dir: str):
    """QUADRAT-COUNT VARIANCE-TO-MEAN RATIO (the classic first-pass
    point-pattern test: partition the study frame into equal quadrats,
    count points per quadrat, VMR = 1 under CSR / > 1 clustered / < 1
    dispersed — the global single-number complement to geo_ripley_k's
    per-scale curve): cells come from EXACT integer milli-degree
    arithmetic (doc_id hash mod // 10000 — no float floor anywhere), one
    vectorized count_by_u64 over the 504 packed cells, and the driver
    folds the BOUNDED-BY-CONSTRUCTION <=504-row count table. EMPTY
    quadrats enter the variance as zeros via the moment identity over all
    Q cells: vmr = (Q*sum_c2 - n^2) / (Q*n) — the Ray-side fold uses
    Python ints (arbitrary precision, no overflow at any scale); the SQL
    mirror's BIGINT chain is the binding bound (Q*sum_c2 overflows at
    n ~ 1.35e8 docs in the worst all-one-cell case — DuckDB fails loud,
    the engine itself does not)."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "documents", ["doc_id"])

    def cell(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cx = ((doc_id * 7919) % 140000) // _QUADRAT_MILLI  # 0..13
        cy = ((doc_id * 104729) % 360000) // _QUADRAT_MILLI  # 0..35
        return pa.table(
            {"key": pa.array((cx * 36 + cy).astype(np.uint64), pa.uint64())}
        )

    t = _collect_table(
        count_by_u64(
            ds.map_batches(cell, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= 504 rows by construction
    c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    q = _QUADRAT_CELLS
    n = int(c.sum())
    occupied = int(t.num_rows)
    sum_c2 = int((c * c).sum())
    vmr_num = q * sum_c2 - n * n  # Python ints: exact at every scale
    vmr_den = q * n
    return pa.table(
        {
            "q_cells": pa.array([q], pa.int64()),
            "n_points": pa.array([n], pa.int64()),
            "occupied_cells": pa.array([occupied], pa.int64()),
            "sum_c2": pa.array([sum_c2], pa.int64()),
            "vmr_num": pa.array([vmr_num], pa.int64()),
            "vmr_den": pa.array([vmr_den], pa.int64()),
            "vmr": pa.array(
                [float(np.float64(vmr_num) / np.float64(vmr_den))],
                pa.float64(),
            ),
        }
    )


GEO_QUADRAT_VMR_SQL = f"""
WITH cells AS (
  SELECT ((doc_id * 7919) % 140000) // {_QUADRAT_MILLI} AS cx,
         ((doc_id * 104729) % 360000) // {_QUADRAT_MILLI} AS cy,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1, 2),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS occupied,
         CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * c) AS BIGINT) AS sum_c2
  FROM cells)
SELECT CAST({_QUADRAT_CELLS} AS BIGINT) AS q_cells,
       n AS n_points,
       occupied AS occupied_cells,
       sum_c2,
       {_QUADRAT_CELLS} * sum_c2 - n * n AS vmr_num,
       {_QUADRAT_CELLS} * n AS vmr_den,
       CAST({_QUADRAT_CELLS} * sum_c2 - n * n AS DOUBLE)
         / CAST({_QUADRAT_CELLS} * n AS DOUBLE) AS vmr
FROM m
"""


_CE_RMAX = 2.0  # Clark-Evans censoring radius (degrees)


def geo_clark_evans(sf_dir: str):
    """CLARK-EVANS NEAREST-NEIGHBOR INDEX, censored at rmax (the third
    classic point-pattern test, completing geo_ripley_k's per-scale curve
    and geo_quadrat_vmr's quadrat ratio with the NN-distance view: R =
    mean observed 1-NN distance / CSR expectation 0.5/sqrt(n/A); R < 1
    clustered, R > 1 dispersed): exact per-doc nearest-neighbor distance
    within rmax from ONE distance-band shuffle (each emitted pair feeds
    BOTH endpoints' minima), per-doc min via min_by_u64 on the
    ORDER-PRESERVING IEEE bit pattern (non-negative float64 bit-cast to
    u64 is monotone — no quantization in the min itself), then NN
    distances quantized to integer micro-degrees (sql_round_np == DuckDB
    ROUND) so the final mean is an order-free INTEGER sum; docs with no
    neighbor within rmax are CENSORED (counted, excluded — documented,
    mirrored; at production density rmax is a few mean spacings so pairs
    stay O(n), the band join's documented contract)."""
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import min_by_u64
    from core_ray.stages.distband import distance_pairs

    docs = _read(sf_dir, "documents", ["doc_id"])

    def shape(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(doc_id)
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )

    n = docs.count()
    pairs = distance_pairs(
        docs.map_batches(shape, batch_format="pyarrow"), _CE_RMAX
    )

    def both_ends(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bb = b["doc_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        d2 = b["sq_dist"].to_numpy(zero_copy_only=False)
        bits = d2.view(np.uint64)  # monotone for non-negative float64
        return pa.table(
            {
                "key": pa.array(np.concatenate([a, bb]), pa.uint64()),
                "val": pa.array(np.concatenate([bits, bits]), pa.uint64()),
            }
        )

    mins = min_by_u64(
        pairs.map_batches(both_ends, batch_format="pyarrow",
                          batch_size=131072),
        "key", "val",
    )

    def partial(b: pa.Table) -> pa.Table:
        d2 = b["val"].to_numpy(zero_copy_only=False).astype(np.uint64).view(
            np.float64
        )
        micro = sql_round_np(np.sqrt(d2) * 1e6, 0).astype(np.int64)
        return pa.table(
            {
                "one": pa.array([1], pa.int64()),
                "n_obs": pa.array([len(micro)], pa.int64()),
                "s": pa.array([int(micro.sum())], pa.int64()),
            }
        )

    agg = _collect_table(
        mins.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("one")
        .aggregate(Sum("n_obs", alias_name="n_obs"), Sum("s", alias_name="s"))
    )
    n_obs = int(agg["n_obs"][0].as_py()) if agg.num_rows else 0
    s = int(agg["s"][0].as_py()) if agg.num_rows else 0
    if n_obs == 0:
        return pa.table(
            {
                "n_points": pa.array([n], pa.int64()),
                "n_censored": pa.array([n], pa.int64()),
                "sum_nn_micro": pa.array([None], pa.int64()),
                "mean_nn_deg": pa.array([None], pa.float64()),
                "r_index": pa.array([None], pa.float64()),
            }
        )
    mean_nn = float(np.float64(s) / np.float64(n_obs) / 1000000.0)
    r_index = float(
        np.float64(mean_nn)
        / (0.5 / np.sqrt(np.float64(n) / 50400.0))
    )
    return pa.table(
        {
            "n_points": pa.array([n], pa.int64()),
            "n_censored": pa.array([n - n_obs], pa.int64()),
            "sum_nn_micro": pa.array([s], pa.int64()),
            "mean_nn_deg": pa.array([mean_nn], pa.float64()),
            "r_index": pa.array([r_index], pa.float64()),
        }
    )


GEO_CLARK_EVANS_SQL = f"""
WITH pts AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
nn AS (
  SELECT a.doc_id,
         MIN((a.lat - b.lat) * (a.lat - b.lat)
               + (a.lon - b.lon) * (a.lon - b.lon)) AS d2
  FROM pts a JOIN pts b
    ON b.doc_id <> a.doc_id
   AND b.lat BETWEEN a.lat - {_CE_RMAX} AND a.lat + {_CE_RMAX}
   AND b.lon BETWEEN a.lon - {_CE_RMAX} AND a.lon + {_CE_RMAX}
  WHERE (a.lat - b.lat) * (a.lat - b.lat)
          + (a.lon - b.lon) * (a.lon - b.lon) <= {_CE_RMAX * _CE_RMAX}
  GROUP BY a.doc_id),
q AS (
  SELECT CAST(ROUND(SQRT(d2) * 1000000.0) AS BIGINT) AS micro FROM nn),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_obs,
         CAST(SUM(micro) AS BIGINT) AS s FROM q),
t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts)
SELECT t.n AS n_points,
       t.n - m.n_obs AS n_censored,
       m.s AS sum_nn_micro,
       CAST(m.s AS DOUBLE) / CAST(NULLIF(m.n_obs, 0) AS DOUBLE)
         / 1000000.0 AS mean_nn_deg,
       CAST(m.s AS DOUBLE) / CAST(NULLIF(m.n_obs, 0) AS DOUBLE)
         / 1000000.0
         / (0.5 / SQRT(CAST(t.n AS DOUBLE) / 50400.0)) AS r_index
FROM m CROSS JOIN t
"""


def geo_bivariate_moran(sf_dir: str):
    """BIVARIATE MORAN'S I (Anselin's cross-variable spatial correlation:
    "is DOCUMENT density high where neighboring EVENT density is high" —
    the univariate geo_moran_i sees only one layer): 1-degree raster,
    rook weights over ORDERED adjacent pairs (W = 2 * unordered), and the
    same all-integer closed form as geo_moran_i — deviations scale to
    integers (zx_i*N = x_i*N - Tx), so

      num*N^2 = N^2*S_adj(x_i y_j) - N*Ty*S(deg_i x_i)
                - N*Tx*S(deg_j y_j) + W*Tx*Ty

    over OCCUPIED cells only (empty cells' contribution is analytic,
    never materialized), and I_xy = (N/W) * num / (N * sqrt(Ax) *
    sqrt(Ay)) with Ax = N*S(x^2) - Tx^2 — two correctly-rounded sqrts of
    exact integers, one fixed double chain, bit-equal to the SQL. Shape:
    two combiner groupbys (doc cells, event cells) are the only
    distributed passes over the unbounded corpus; both RESULT tables are
    bounded by the FIXED 50,400-cell frame BY CONSTRUCTION (the
    geo_quadrat_vmr contract), so the remaining algebra — per-axis
    scalars and the 4-direction S_adj(x_i y_j) lookup (ordered edges need
    all four directions; the bivariate product is not symmetric) — folds
    driver-side in numpy instead of paying four more serial dataset
    executions. The cell counts themselves go through count_by_u64, not
    Ray's native groupby-aggregate (the documented ~33 us/row trap —
    measured 9.6 -> 1.8 s warm at sf0.1 for this query). Same ~10^5
    docs/cell int64 bound as geo_moran_i."""
    from core_ray.stages.agg import count_by_u64

    nlon, nlat = _MORAN_NLON, _MORAN_NLAT
    n = nlon * nlat
    w_ord = 2 * (nlat * (nlon - 1) + (nlat - 1) * nlon)

    def cell_counts(ds, id_col: str):
        def keyed(b: pa.Table) -> pa.Table:
            ids = b[id_col].to_numpy(zero_copy_only=False)
            lat, lon = _derive_coords(ids)
            gx = np.floor(lon).astype(np.int64) + 180
            gy = np.floor(lat).astype(np.int64) + 70
            return pa.table(
                {"key": pa.array((gy * nlon + gx).astype(np.uint64),
                                 pa.uint64())}
            )

        t = _collect_table(  # <= 50400 rows by construction
            count_by_u64(
                ds.map_batches(keyed, batch_format="pyarrow",
                               batch_size=65536),
                "key",
            )
        )
        return (
            t["key"].to_numpy(zero_copy_only=False).astype(np.int64),
            t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    xcell, x = cell_counts(_read(sf_dir, "documents", ["doc_id"]), "doc_id")
    ycell, y = cell_counts(_read(sf_dir, "events", ["event_id"]), "event_id")

    def axis_scalars(cell, v):
        gx = cell % nlon
        gy = cell // nlon
        deg = (
            (gx > 0).astype(np.int64) + (gx < nlon - 1)
            + (gy > 0) + (gy < nlat - 1)
        )
        return int(v.sum()), int((v * v).sum()), int((deg * v).sum())

    tx, sqx, degx = axis_scalars(xcell, x)
    ty, sqy, degy = axis_scalars(ycell, y)

    # S_adj(x_i y_j) over ORDERED edges: 4-direction probes from x looked
    # up in y via searchsorted (both arrays sorted <=50400-cell tables)
    yorder = np.argsort(ycell)
    ycell_s, y_s = ycell[yorder], y[yorder]
    gx = xcell % nlon
    gy = xcell // nlon
    nb = np.concatenate(
        [
            np.where(gx < nlon - 1, xcell + 1, -1),
            np.where(gx > 0, xcell - 1, -1),
            np.where(gy < nlat - 1, xcell + nlon, -1),
            np.where(gy > 0, xcell - nlon, -1),
        ]
    )
    xx = np.concatenate([x, x, x, x])
    keep = nb >= 0
    nb, xx = nb[keep], xx[keep]
    pos = np.searchsorted(ycell_s, nb)
    pos_ok = (pos < len(ycell_s))
    pos_c = np.minimum(pos, len(ycell_s) - 1) if len(ycell_s) else pos
    hit = pos_ok & (len(ycell_s) > 0)
    if len(ycell_s):
        hit &= ycell_s[pos_c] == nb
    s_adj = int((xx[hit] * y_s[pos_c[hit]]).sum()) if len(ycell_s) else 0

    num = n * n * s_adj - n * ty * degx - n * tx * degy + w_ord * tx * ty
    ax = n * sqx - tx * tx
    ay = n * sqy - ty * ty
    if ax == 0 or ay == 0:
        moran = None
    else:
        den = float(
            np.float64(n) * np.sqrt(np.float64(ax)) * np.sqrt(np.float64(ay))
        )
        moran = float(
            (np.float64(n) / np.float64(w_ord)) * (np.float64(num) / den)
        )
    return pa.table(
        {
            "n_cells": pa.array([n], pa.int64()),
            "w_ord": pa.array([w_ord], pa.int64()),
            "t_docs": pa.array([tx], pa.int64()),
            "t_events": pa.array([ty], pa.int64()),
            "s_adj_xy": pa.array([s_adj], pa.int64()),
            "ax": pa.array([ax], pa.int64()),
            "ay": pa.array([ay], pa.int64()),
            "num": pa.array([num], pa.int64()),
            "moran_xy": pa.array([moran], pa.float64()),
        }
    )


GEO_BIVARIATE_MORAN_SQL = f"""
WITH px AS (
  SELECT CAST(FLOOR({GEO_LON_SQL}) AS BIGINT) + 180 AS gx,
         CAST(FLOOR({GEO_LAT_SQL}) AS BIGINT) + 70 AS gy
  FROM documents),
py AS (
  SELECT CAST(FLOOR({GEO_LON_SQL.replace('doc_id', 'event_id')}) AS BIGINT)
           + 180 AS gx,
         CAST(FLOOR({GEO_LAT_SQL.replace('doc_id', 'event_id')}) AS BIGINT)
           + 70 AS gy
  FROM events),
cx AS (
  SELECT gy * {_MORAN_NLON} + gx AS cell, gx, gy, COUNT(*) AS x
  FROM px GROUP BY 1, 2, 3),
cy AS (
  SELECT gy * {_MORAN_NLON} + gx AS cell, gx, gy, COUNT(*) AS y
  FROM py GROUP BY 1, 2, 3),
adj AS (
  SELECT CAST(COALESCE(SUM(a.x * b.y), 0) AS BIGINT) AS s_adj
  FROM cx a JOIN cy b
    ON (b.cell = a.cell + 1 AND a.gx < {_MORAN_NLON - 1})
    OR (b.cell = a.cell - 1 AND a.gx > 0)
    OR (b.cell = a.cell + {_MORAN_NLON} AND a.gy < {_MORAN_NLAT - 1})
    OR (b.cell = a.cell - {_MORAN_NLON} AND a.gy > 0)),
mx AS (
  SELECT CAST(SUM(x) AS BIGINT) AS t, CAST(SUM(x * x) AS BIGINT) AS sq,
         CAST(SUM(((CASE WHEN gx > 0 THEN 1 ELSE 0 END)
                   + (CASE WHEN gx < {_MORAN_NLON - 1} THEN 1 ELSE 0 END)
                   + (CASE WHEN gy > 0 THEN 1 ELSE 0 END)
                   + (CASE WHEN gy < {_MORAN_NLAT - 1} THEN 1 ELSE 0 END)) * x)
              AS BIGINT) AS sdeg
  FROM cx),
my AS (
  SELECT CAST(SUM(y) AS BIGINT) AS t, CAST(SUM(y * y) AS BIGINT) AS sq,
         CAST(SUM(((CASE WHEN gx > 0 THEN 1 ELSE 0 END)
                   + (CASE WHEN gx < {_MORAN_NLON - 1} THEN 1 ELSE 0 END)
                   + (CASE WHEN gy > 0 THEN 1 ELSE 0 END)
                   + (CASE WHEN gy < {_MORAN_NLAT - 1} THEN 1 ELSE 0 END)) * y)
              AS BIGINT) AS sdeg
  FROM cy),
k AS (
  SELECT CAST({_MORAN_NLON * _MORAN_NLAT} AS BIGINT) AS n,
         CAST({2 * (_MORAN_NLAT * (_MORAN_NLON - 1) + (_MORAN_NLAT - 1) * _MORAN_NLON)}
              AS BIGINT) AS w)
SELECT k.n AS n_cells, k.w AS w_ord, mx.t AS t_docs, my.t AS t_events,
       adj.s_adj AS s_adj_xy,
       k.n * mx.sq - mx.t * mx.t AS ax,
       k.n * my.sq - my.t * my.t AS ay,
       k.n * k.n * adj.s_adj - k.n * my.t * mx.sdeg
         - k.n * mx.t * my.sdeg + k.w * mx.t * my.t AS num,
       (CAST(k.n AS DOUBLE) / CAST(k.w AS DOUBLE))
         * (CAST(k.n * k.n * adj.s_adj - k.n * my.t * mx.sdeg
                 - k.n * mx.t * my.sdeg + k.w * mx.t * my.t AS DOUBLE)
            / (CAST(k.n AS DOUBLE)
               * SQRT(CAST(NULLIF(k.n * mx.sq - mx.t * mx.t, 0) AS DOUBLE))
               * SQRT(CAST(NULLIF(k.n * my.sq - my.t * my.t, 0) AS DOUBLE))))
         AS moran_xy
FROM k, mx, my, adj
"""


_STDB_EPS = 1.0  # ST-DBSCAN spatial eps (degrees)
_STDB_WINDOW_US = 300 * 1_000_000  # temporal eps (5 min)
_STDB_MIN_PTS = 3


def events_st_dbscan(sf_dir: str):
    """ST-DBSCAN — spatio-temporal density clustering of EVENTS (Birant &
    Kut's extension of DBSCAN: a neighbor must be close in space AND
    time, so a place that is busy on two different days forms two
    clusters where plain DBSCAN sees one). Runs over the CONTACT
    coordinate model (12 city blobs + user/event jitter — the derived
    doc-hash lattice is translation-invariant in id space, which makes
    every point core and the clustering degenerate). The distributed
    decomposition is IDENTICAL to geo_dbscan from step 2 on — the
    neighborhood definition is the only difference — so the
    implementation is the 3D (lat, lon, time-bucket) home+ghost pair
    join (stages/stjoin.py::spacetime_all_pairs, 27x replication, ONE
    shuffle, single-emission home rule) feeding the factored
    stages/dbscan.py::dbscan_from_pairs (degrees -> core -> CC over
    core-core edges -> min-label border attach -> noise). Parameters are
    deliberately SUBCRITICAL at bench scale (eps 1 deg / 5 min / min_pts
    3: expected degree ~0.5 at sf0.1, so components fragment at temporal
    gaps) — that keeps the oracle's recursive min-reachable closure,
    whose row count is sum(|component|^2), polynomial; the engine side
    has no such constraint (CC is log-round pointer jumping)."""
    from core_ray.stages.dbscan import dbscan_from_pairs
    from core_ray.stages.stjoin import spacetime_all_pairs

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def shape(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _contact_coords(eid, uid)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
                "us": pa.array(us, pa.int64()),
            }
        )

    pts = ds.map_batches(shape, batch_format="pyarrow", batch_size=65536)
    pairs = spacetime_all_pairs(
        pts, _STDB_EPS, _STDB_WINDOW_US, id_col="event_id"
    ).materialize()
    return dbscan_from_pairs(pts, pairs, _STDB_MIN_PTS, id_col="event_id")


EVENTS_ST_DBSCAN_SQL = f"""
WITH RECURSIVE
pts AS (
  SELECT event_id, {CONTACT_LAT_SQL} AS lat, {CONTACT_LON_SQL} AS lon,
         epoch_us(ts) AS us
  FROM events),
-- time-bucket equi-join: a is replicated to its 3 adjacent buckets, b
-- probes its own bucket, so every pair with |dt| <= W matches EXACTLY one
-- replica (a pure range join here degenerates: DuckDB's IEJoin picks the
-- lat band, and the 12-city blob model puts ~1/12 of all events in any
-- lat band — measured minutes at sf0.1; the bucket hash join is seconds)
ab AS (
  SELECT event_id, lat, lon, us, us // {_STDB_WINDOW_US} + o AS bk
  FROM pts CROSS JOIN (SELECT UNNEST([-1, 0, 1]) AS o) t),
p0 AS (
  SELECT a.event_id AS da, b.event_id AS db
  FROM ab a JOIN pts b
    ON b.us // {_STDB_WINDOW_US} = a.bk AND a.event_id < b.event_id
  WHERE ABS(a.us - b.us) <= {_STDB_WINDOW_US}
    AND (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon)
        <= {_STDB_EPS * _STDB_EPS}),
e AS (SELECT da AS u, db AS v FROM p0 UNION ALL SELECT db, da FROM p0),
deg AS (SELECT u AS id, COUNT(*) AS n FROM e GROUP BY u),
core AS (SELECT id FROM deg WHERE n + 1 >= {_STDB_MIN_PTS}),
ce0 AS (
  SELECT da, db FROM p0
  WHERE da IN (SELECT id FROM core) AND db IN (SELECT id FROM core)),
ce AS (SELECT da AS u, db AS v FROM ce0 UNION SELECT db, da FROM ce0),
reach(node, comp) AS (
  SELECT id, id FROM core
  UNION
  SELECT ce.u, r.comp FROM ce JOIN reach r ON r.node = ce.v),
clab AS (SELECT node, MIN(comp) AS comp FROM reach GROUP BY node),
border AS (
  SELECT e.u AS node, MIN(c.comp) AS comp
  FROM e JOIN clab c ON c.node = e.v
  WHERE e.u NOT IN (SELECT id FROM core)
  GROUP BY e.u)
SELECT p.event_id,
       CAST(COALESCE(c.comp, b.comp) AS BIGINT) AS cluster,
       CASE WHEN c.node IS NOT NULL THEN 'core'
            WHEN b.node IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role
FROM pts p
LEFT JOIN clab c ON c.node = p.event_id
LEFT JOIN border b ON b.node = p.event_id
"""


_STG_DAY_US = 86_400_000_000  # space-time Gi* day bucket


def _st_getis_z(sf_dir: str):
    """SPACE-TIME GETIS-ORD Gi* z-bin table (the "emerging hot spot" primitive: Gi*
    over a (1-deg cell, day) SPACE-TIME CUBE with a 3x3x3 box
    neighborhood — a place-day is hot only if its space-time neighborhood
    is, which plain 2D Gi* cannot see): same integer-exact strategy as
    geo_getis_gi lifted to 3D — the frame is 360 x 140 x n_days bins
    (n_days from the data's day span, mirrored), neighbor sums come from
    <=27 contribution rows per OCCUPIED bin (self carries x, the 26 box
    offsets carry nbx — empty bins with occupied neighbors materialize
    exactly where needed, all-empty bins never exist as rows), the box
    weight factorizes per axis (w = wx*wy*wt, each 2 or 3 at a boundary),
    and z = (N*(x+nb) - T*w) / (sqrt(N*sum_sq - T^2) * sqrt((N*w - w^2) /
    (N-1))) is a fixed chain of correctly-rounded double ops over exact
    integers. Events bin by the CONTACT city model (same frame bounds as
    the 1-deg raster). Shape: one count_by_u64 builds occupied bins, one
    partitioned vectorized reduce folds the 27x contribution rows (never
    Ray's per-row aggregate). Returns the full (bin, gx, gy, day_idx, x,
    nbr_sum, z) table; consumers pick their surface (events_st_getis
    top-20, events_emerging_hotspots per-cell Mann-Kendall). Same
    T^2 < 2^63 overflow contract as the 2D statistic."""
    from core_ray.stages.agg import count_by_u64, map_groups_partitioned

    nlon, nlat = _MORAN_NLON, _MORAN_NLAT

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def day_of(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        d = us // _STG_DAY_US
        if len(d) == 0:
            return pa.table({"d0": pa.array([], pa.int64()),
                             "d1": pa.array([], pa.int64())})
        return pa.table(
            {"d0": pa.array([int(d.min())], pa.int64()),
             "d1": pa.array([int(d.max())], pa.int64())}
        )

    span = ds.map_batches(day_of, batch_format="pyarrow", batch_size=131072)
    d0 = span.min("d0")
    d1 = span.max("d1")
    if d0 is None:
        return pa.table(
            {
                "gx": pa.array([], pa.int64()),
                "gy": pa.array([], pa.int64()),
                "day_idx": pa.array([], pa.int64()),
                "x": pa.array([], pa.int64()),
                "nbr_sum": pa.array([], pa.int64()),
                "z": pa.array([], pa.float64()),
            }
        )
    d0, d1 = int(d0), int(d1)
    nd = d1 - d0 + 1
    n_bins = nlon * nlat * nd

    def bin_of(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _contact_coords(eid, uid)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        gx = np.floor(lon).astype(np.int64) + 180
        gy = np.floor(lat).astype(np.int64) + 70
        didx = us // _STG_DAY_US - d0
        key = ((didx * nlat + gy) * nlon + gx).astype(np.uint64)
        return pa.table({"key": pa.array(key, pa.uint64())})

    cells = count_by_u64(
        ds.map_batches(bin_of, batch_format="pyarrow", batch_size=131072),
        "key",
    ).materialize()

    def scalars(b: pa.Table) -> pa.Table:
        x = b["cnt"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "t": pa.array([int(x.sum())], pa.int64()),
                "sum_sq": pa.array([int((x * x).sum())], pa.int64()),
            }
        )

    sc = cells.map_batches(scalars, batch_format="pyarrow").sum(["t", "sum_sq"])
    t, sum_sq = int(sc["sum(t)"]), int(sc["sum(sum_sq)"])
    a_const = n_bins * sum_sq - t * t

    offs = [(ox, oy, ot)
            for ox in (-1, 0, 1) for oy in (-1, 0, 1) for ot in (-1, 0, 1)]

    def contribs(b: pa.Table) -> pa.Table:
        bin_ = b["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        x = b["cnt"].to_numpy(zero_copy_only=False)
        gx = bin_ % nlon
        gy = (bin_ // nlon) % nlat
        dt_ = bin_ // (nlon * nlat)
        outb, outx, outn = [], [], []
        for ox, oy, ot in offs:
            ok = (
                (gx + ox >= 0) & (gx + ox < nlon)
                & (gy + oy >= 0) & (gy + oy < nlat)
                & (dt_ + ot >= 0) & (dt_ + ot < nd)
            )
            nb = ((dt_[ok] + ot) * nlat + (gy[ok] + oy)) * nlon + (gx[ok] + ox)
            outb.append(nb)
            if ox == 0 and oy == 0 and ot == 0:
                outx.append(x[ok])
                outn.append(np.zeros(int(ok.sum()), np.int64))
            else:
                outx.append(np.zeros(int(ok.sum()), np.int64))
                outn.append(x[ok])
        return pa.table(
            {
                "bin": pa.array(np.concatenate(outb), pa.int64()),
                "x": pa.array(np.concatenate(outx), pa.int64()),
                "nbx": pa.array(np.concatenate(outn), pa.int64()),
            }
        )

    def reduce_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "bin": pa.array([], pa.int64()),
                    "x": pa.array([], pa.int64()),
                    "nbr_sum": pa.array([], pa.int64()),
                }
            )
        k = g["bin"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(k, kind="stable")
        ks = k[order]
        starts = np.nonzero(np.r_[True, ks[1:] != ks[:-1]])[0]
        x = np.add.reduceat(
            g["x"].to_numpy(zero_copy_only=False)[order], starts)
        nb = np.add.reduceat(
            g["nbx"].to_numpy(zero_copy_only=False)[order], starts)
        return pa.table(
            {
                "bin": pa.array(ks[starts], pa.int64()),
                "x": pa.array(x, pa.int64()),
                "nbr_sum": pa.array(nb, pa.int64()),
            }
        )

    agg = map_groups_partitioned(
        cells.map_batches(contribs, batch_format="pyarrow"),
        "bin", reduce_part,
    )

    def zscore(b: pa.Table) -> pa.Table:
        bin_ = b["bin"].to_numpy(zero_copy_only=False)
        x = b["x"].to_numpy(zero_copy_only=False)
        nb = b["nbr_sum"].to_numpy(zero_copy_only=False)
        gx = bin_ % nlon
        gy = (bin_ // nlon) % nlat
        dt_ = bin_ // (nlon * nlat)
        w = (
            (1 + (gx > 0) + (gx < nlon - 1)).astype(np.int64)
            * (1 + (gy > 0) + (gy < nlat - 1))
            * (1 + (dt_ > 0) + (dt_ < nd - 1))
        )
        num = n_bins * (x + nb) - t * w
        z = num.astype(np.float64) / (
            np.sqrt(float(a_const))
            * np.sqrt((n_bins * w - w * w).astype(np.float64)
                      / float(n_bins - 1))
        )
        return pa.table(
            {
                "bin": pa.array(bin_, pa.int64()),
                "gx": pa.array(gx, pa.int64()),
                "gy": pa.array(gy, pa.int64()),
                "day_idx": pa.array(dt_, pa.int64()),
                "x": pa.array(x, pa.int64()),
                "nbr_sum": pa.array(nb, pa.int64()),
                "z": pa.array(z, pa.float64()),
            }
        )

    return agg.map_batches(zscore, batch_format="pyarrow")


def events_st_getis(sf_dir: str):
    """SPACE-TIME GETIS-ORD Gi* top 20 — see _st_getis_z for the full
    3D-cube derivation; this surface sorts by (z DESC, bin), a total
    order that is bit-equal both sides."""
    z = _st_getis_z(sf_dir)
    if isinstance(z, pa.Table):  # empty-events guard (already final shape)
        return z.drop_columns(["bin"]) if "bin" in z.column_names else z
    return (
        z.sort(["z", "bin"], descending=[True, False])
        .limit(20)
        .drop_columns(["bin"])
    )


_ST_GETIS_Z_CTE = f"""pts AS (
  SELECT CAST(FLOOR({CONTACT_LON_SQL}) AS BIGINT) + 180 AS gx,
         CAST(FLOOR({CONTACT_LAT_SQL}) AS BIGINT) + 70 AS gy,
         epoch_us(ts) // {_STG_DAY_US} AS d
  FROM events),
dd AS (SELECT CAST(MIN(d) AS BIGINT) AS d0,
              CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS nd FROM pts),
cells AS (
  SELECT ((p.d - dd.d0) * {_MORAN_NLAT} + p.gy) * {_MORAN_NLON} + p.gx AS bin,
         p.gx, p.gy, p.d - dd.d0 AS dt, COUNT(*) AS x
  FROM pts p, dd GROUP BY 1, 2, 3, 4),
sc AS (
  SELECT CAST(SUM(x) AS BIGINT) AS t, CAST(SUM(x * x) AS BIGINT) AS sum_sq
  FROM cells),
offs AS (
  SELECT ax.o AS ox, ay.o AS oy, at.o AS ot
  FROM (SELECT UNNEST([-1, 0, 1]) AS o) ax,
       (SELECT UNNEST([-1, 0, 1]) AS o) ay,
       (SELECT UNNEST([-1, 0, 1]) AS o) at),
contrib AS (
  SELECT ((c.dt + f.ot) * {_MORAN_NLAT} + (c.gy + f.oy)) * {_MORAN_NLON}
           + (c.gx + f.ox) AS bin,
         CASE WHEN f.ox = 0 AND f.oy = 0 AND f.ot = 0 THEN c.x
              ELSE CAST(0 AS BIGINT) END AS x,
         CASE WHEN f.ox = 0 AND f.oy = 0 AND f.ot = 0 THEN CAST(0 AS BIGINT)
              ELSE c.x END AS nbx
  FROM cells c CROSS JOIN offs f CROSS JOIN dd
  WHERE c.gx + f.ox BETWEEN 0 AND {_MORAN_NLON - 1}
    AND c.gy + f.oy BETWEEN 0 AND {_MORAN_NLAT - 1}
    AND c.dt + f.ot BETWEEN 0 AND dd.nd - 1),
agg AS (
  SELECT bin, CAST(SUM(x) AS BIGINT) AS x, CAST(SUM(nbx) AS BIGINT) AS nbr_sum
  FROM contrib GROUP BY 1),
g AS (
  SELECT a.bin, a.bin % {_MORAN_NLON} AS gx,
         (a.bin // {_MORAN_NLON}) % {_MORAN_NLAT} AS gy,
         a.bin // {_MORAN_NLON * _MORAN_NLAT} AS day_idx,
         a.x, a.nbr_sum,
         CAST(((CASE WHEN a.bin % {_MORAN_NLON} > 0 THEN 1 ELSE 0 END)
               + (CASE WHEN a.bin % {_MORAN_NLON} < {_MORAN_NLON - 1}
                  THEN 1 ELSE 0 END) + 1)
              * ((CASE WHEN (a.bin // {_MORAN_NLON}) % {_MORAN_NLAT} > 0
                  THEN 1 ELSE 0 END)
                 + (CASE WHEN (a.bin // {_MORAN_NLON}) % {_MORAN_NLAT}
                         < {_MORAN_NLAT - 1} THEN 1 ELSE 0 END) + 1)
              * ((CASE WHEN a.bin // {_MORAN_NLON * _MORAN_NLAT} > 0
                  THEN 1 ELSE 0 END)
                 + (CASE WHEN a.bin // {_MORAN_NLON * _MORAN_NLAT} < dd.nd - 1
                    THEN 1 ELSE 0 END) + 1) AS BIGINT) AS w,
         CAST({_MORAN_NLON * _MORAN_NLAT} AS BIGINT) * dd.nd AS n
  FROM agg a CROSS JOIN dd),
zt AS (
  SELECT g.bin, g.gx, g.gy, g.day_idx, g.x, g.nbr_sum,
         CAST(g.n * (g.x + g.nbr_sum) - sc.t * g.w AS DOUBLE)
           / (SQRT(CAST(g.n * sc.sum_sq - sc.t * sc.t AS DOUBLE))
              * SQRT(CAST(g.n * g.w - g.w * g.w AS DOUBLE)
                     / CAST(g.n - 1 AS DOUBLE))) AS z
  FROM g, sc)"""

EVENTS_ST_GETIS_SQL = f"""
WITH {_ST_GETIS_Z_CTE}
SELECT gx, gy, day_idx, x, nbr_sum, z
FROM zt
ORDER BY z DESC, bin
LIMIT 20
"""


def events_emerging_hotspots(sf_dir: str):
    """EMERGING-HOTSPOT CLASSIFICATION (the full ArcGIS space-time-cube
    workflow: per SPATIAL cell, a Mann-Kendall monotonic-trend test over
    that cell's DAILY Gi* z series — 'intensifying' cells are getting
    hotter relative to the global field, 'diminishing' cooler; the
    per-day statistic alone cannot distinguish a steady hot spot from an
    emerging one). Consumes the shared _st_getis_z bin table; MK is
    SIGN-ONLY (S = sum over day pairs of sign(z_j - z_i)), and the z
    values are bit-equal doubles on both sides, so parity is exact
    without quantizing z. Days where a bin has no occupied 3x3x3
    neighborhood do not exist as rows (documented contract of the
    contribution construction — mirrored, both sides skip them). ONE
    spatial-cell-keyed shuffle; each cell's series is <= n_days long so
    the per-cell pairwise fold is O(days^2) tiny and vectorized per
    segment."""
    from core_ray.stages.agg import map_groups_partitioned

    empty = pa.table(
        {
            "gx": pa.array([], pa.int64()),
            "gy": pa.array([], pa.int64()),
            "n_days": pa.array([], pa.int64()),
            "s_mk": pa.array([], pa.int64()),
            "trend": pa.array([], pa.string()),
        }
    )
    z = _st_getis_z(sf_dir)
    if isinstance(z, pa.Table):  # empty-events guard
        return empty

    def keyed(b: pa.Table) -> pa.Table:
        gx = b["gx"].to_numpy(zero_copy_only=False)
        gy = b["gy"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cell": pa.array(gy * _MORAN_NLON + gx, pa.int64()),
                "day_idx": b["day_idx"],
                "z": b["z"],
            }
        )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty
        cell = g["cell"].to_numpy(zero_copy_only=False).astype(np.int64)
        day = g["day_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        zz = g["z"].to_numpy(zero_copy_only=False)
        order = np.lexsort((day, cell))
        cell, day, zz = cell[order], day[order], zz[order]
        starts = np.nonzero(np.r_[True, cell[1:] != cell[:-1]])[0]
        ends = np.append(starts[1:], len(cell))
        out_gx, out_gy, out_nd, out_s = [], [], [], []
        for s, e in zip(starts, ends):  # <= #occupied cells, each tiny
            seg = zz[s:e]
            d = np.sign(seg[None, :] - seg[:, None])
            s_mk = int(np.triu(d, 1).sum())
            out_gx.append(int(cell[s] % _MORAN_NLON))
            out_gy.append(int(cell[s] // _MORAN_NLON))
            out_nd.append(int(e - s))
            out_s.append(s_mk)
        trend = np.where(
            np.array(out_s) > 0, "intensifying",
            np.where(np.array(out_s) < 0, "diminishing", "flat"),
        )
        return pa.table(
            {
                "gx": pa.array(out_gx, pa.int64()),
                "gy": pa.array(out_gy, pa.int64()),
                "n_days": pa.array(out_nd, pa.int64()),
                "s_mk": pa.array(out_s, pa.int64()),
                "trend": pa.array(trend.tolist(), pa.string()),
            }
        )

    return map_groups_partitioned(
        z.map_batches(keyed, batch_format="pyarrow"), "cell", per_part
    )


EVENTS_EMERGING_HOTSPOTS_SQL = f"""
WITH {_ST_GETIS_Z_CTE},
mk AS (
  SELECT a.gx, a.gy,
         CAST(SUM(CASE WHEN b.z > a.z THEN 1
                       WHEN b.z < a.z THEN -1 ELSE 0 END) AS BIGINT) AS s_mk
  FROM zt a JOIN zt b
    ON b.gx = a.gx AND b.gy = a.gy AND b.day_idx > a.day_idx
  GROUP BY 1, 2),
nd_per AS (
  SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS n_days FROM zt GROUP BY 1, 2)
SELECT n.gx, n.gy, n.n_days,
       CAST(COALESCE(m.s_mk, 0) AS BIGINT) AS s_mk,
       CASE WHEN COALESCE(m.s_mk, 0) > 0 THEN 'intensifying'
            WHEN COALESCE(m.s_mk, 0) < 0 THEN 'diminishing'
            ELSE 'flat' END AS trend
FROM nd_per n LEFT JOIN mk m ON m.gx = n.gx AND m.gy = n.gy
"""


_HAUS_TOPN = 5  # trajectory-similarity cohort: top-N users per city


def events_traj_hausdorff(sf_dir: str):
    """TRAJECTORY SIMILARITY — pairwise HAUSDORFF distance between the
    top-{N} most-active users' tracks within each home city (the
    trajectory-mining primitive behind route clustering / anomalous-track
    detection; gyration and MSD above describe ONE track, this compares
    TWO). Hausdorff is inherently quadratic in track points, so the
    operator bounds the cohort BY CONSTRUCTION: a distributed grouped
    top-{N}-per-city over the user activity counts picks <=60 users
    (tie-break lowest uid), every qualifying PAIR gets its own key, each
    selected user's points replicate to that user's <= {N}-1 same-city
    pair keys, and ONE pair-keyed shuffle co-locates both tracks so the
    max-min fold runs vectorized inside the task — points never reach
    the driver (only the <=60-row cohort and <=120-row result do).
    Exactness: squared-degree point distances, min/max folds only (both
    order-free over exact doubles), zero rounding anywhere."""
    from core_ray.stages.agg import count_by_u64, map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def ukey(b: pa.Table) -> pa.Table:
        return pa.table(
            {"key": pa.array(
                b["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64),
                pa.uint64())}
        )

    counts = count_by_u64(
        ds.map_batches(ukey, batch_format="pyarrow", batch_size=131072),
        "key",
    )

    def with_city(b: pa.Table) -> pa.Table:
        u = b["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "city": pa.array(u % 12, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "n": b["cnt"],
            }
        )

    def top_per_city(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"city": pa.array([], pa.int64()),
                 "user_id": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        city = g["city"].to_numpy(zero_copy_only=False)
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, -n, city))
        city, uid, n = city[order], uid[order], n[order]
        starts = np.nonzero(np.r_[True, city[1:] != city[:-1]])[0]
        rank = np.arange(len(city)) - np.repeat(
            starts, np.diff(np.append(starts, len(city))))
        keep = rank < _HAUS_TOPN
        return pa.table(
            {"city": pa.array(city[keep], pa.int64()),
             "user_id": pa.array(uid[keep], pa.int64()),
             "n": pa.array(n[keep], pa.int64())}
        )

    cohort = _collect_table(  # <= 12 * N rows BY CONSTRUCTION
        map_groups_partitioned(
            counts.map_batches(with_city, batch_format="pyarrow"),
            "city", top_per_city,
        )
    )
    ccity = cohort["city"].to_numpy(zero_copy_only=False)
    cuid = cohort["user_id"].to_numpy(zero_copy_only=False)
    cn = cohort["n"].to_numpy(zero_copy_only=False)
    pairs = []  # (pair_id, city, ua, ub, na, nb)
    member: dict = {}  # uid -> [(pair_id, side)]
    for c in np.unique(ccity):
        idx = np.nonzero(ccity == c)[0]
        idx = idx[np.argsort(cuid[idx])]
        for i in range(len(idx)):
            for j in range(i + 1, len(idx)):
                pid = len(pairs)
                a, b = idx[i], idx[j]
                pairs.append((pid, int(c), int(cuid[a]), int(cuid[b]),
                              int(cn[a]), int(cn[b])))
                member.setdefault(int(cuid[a]), []).append((pid, 0))
                member.setdefault(int(cuid[b]), []).append((pid, 1))
    if not pairs:
        return pa.table(
            {
                "city": pa.array([], pa.int64()),
                "uid_a": pa.array([], pa.int64()),
                "uid_b": pa.array([], pa.int64()),
                "n_a": pa.array([], pa.int64()),
                "n_b": pa.array([], pa.int64()),
                "hausdorff_sq": pa.array([], pa.float64()),
            }
        )
    pair_meta = {p[0]: p[1:] for p in pairs}

    ev = _read(sf_dir, "events", ["event_id", "user_id"])

    def replicate(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        # vectorized membership expansion: mask selected users, then loop
        # over the <=60 cohort entries (not over rows)
        out_p, out_s, out_la, out_lo = [], [], [], []
        lat, lon = _contact_coords(eid, uid)
        for u, mships in member.items():
            m = uid == u
            if not m.any():
                continue
            for pid, side in mships:
                out_p.append(np.full(int(m.sum()), pid, np.int64))
                out_s.append(np.full(int(m.sum()), side, np.int8))
                out_la.append(lat[m])
                out_lo.append(lon[m])
        if not out_p:
            return pa.table(
                {
                    "pair": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                    "lat": pa.array([], pa.float64()),
                    "lon": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "pair": pa.array(np.concatenate(out_p), pa.int64()),
                "side": pa.array(np.concatenate(out_s), pa.int8()),
                "lat": pa.array(np.concatenate(out_la), pa.float64()),
                "lon": pa.array(np.concatenate(out_lo), pa.float64()),
            }
        )

    rep = ev.map_batches(replicate, batch_format="pyarrow", batch_size=65536)

    def per_pair(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "city": pa.array([], pa.int64()),
                "uid_a": pa.array([], pa.int64()),
                "uid_b": pa.array([], pa.int64()),
                "n_a": pa.array([], pa.int64()),
                "n_b": pa.array([], pa.int64()),
                "hausdorff_sq": pa.array([], pa.float64()),
            }
        )
        if g.num_rows == 0:
            return empty
        pid = g["pair"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        lat = g["lat"].to_numpy(zero_copy_only=False)
        lon = g["lon"].to_numpy(zero_copy_only=False)
        order = np.lexsort((side, pid))
        pid, side, lat, lon = pid[order], side[order], lat[order], lon[order]
        starts = np.nonzero(np.r_[True, pid[1:] != pid[:-1]])[0]
        ends = np.append(starts[1:], len(pid))
        rows = []
        for s, e in zip(starts, ends):  # <= 120 pairs repo-wide
            a = side[s:e] == 0
            la, lo = lat[s:e], lon[s:e]
            xa, ya = la[a], lo[a]
            xb, yb = la[~a], lo[~a]
            if len(xa) == 0 or len(xb) == 0:
                continue
            dla = xa[:, None] - xb[None, :]
            dlo = ya[:, None] - yb[None, :]
            d2 = dla * dla + dlo * dlo
            h = max(float(d2.min(axis=1).max()), float(d2.min(axis=0).max()))
            city, ua, ub, na, nb = pair_meta[int(pid[s])]
            rows.append((city, ua, ub, na, nb, h))
        if not rows:
            return empty
        return pa.table(
            {
                "city": pa.array([r[0] for r in rows], pa.int64()),
                "uid_a": pa.array([r[1] for r in rows], pa.int64()),
                "uid_b": pa.array([r[2] for r in rows], pa.int64()),
                "n_a": pa.array([r[3] for r in rows], pa.int64()),
                "n_b": pa.array([r[4] for r in rows], pa.int64()),
                "hausdorff_sq": pa.array([r[5] for r in rows], pa.float64()),
            }
        )

    return map_groups_partitioned(rep, "pair", per_pair)


EVENTS_TRAJ_HAUSDORFF_SQL = f"""
WITH cnt AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
top5 AS (
  SELECT user_id, user_id % 12 AS city, n
  FROM cnt
  QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id % 12
                             ORDER BY n DESC, user_id) <= {_HAUS_TOPN}),
prs AS (
  SELECT a.city, a.user_id AS ua, b.user_id AS ub, a.n AS n_a, b.n AS n_b
  FROM top5 a JOIN top5 b
    ON b.city = a.city AND b.user_id > a.user_id),
pts AS (
  SELECT e.user_id, e.event_id,
         {CONTACT_LAT_SQL.replace('user_id', 'e.user_id').replace('event_id', 'e.event_id')} AS lat,
         {CONTACT_LON_SQL.replace('user_id', 'e.user_id').replace('event_id', 'e.event_id')} AS lon
  FROM events e JOIN top5 t ON t.user_id = e.user_id),
d1 AS (
  SELECT p.city, p.ua, p.ub, xa.event_id,
         MIN((xa.lat - xb.lat) * (xa.lat - xb.lat)
               + (xa.lon - xb.lon) * (xa.lon - xb.lon)) AS md
  FROM prs p
  JOIN pts xa ON xa.user_id = p.ua
  JOIN pts xb ON xb.user_id = p.ub
  GROUP BY 1, 2, 3, 4),
h1 AS (SELECT city, ua, ub, MAX(md) AS dab FROM d1 GROUP BY 1, 2, 3),
d2_ AS (
  SELECT p.city, p.ua, p.ub, xb.event_id,
         MIN((xb.lat - xa.lat) * (xb.lat - xa.lat)
               + (xb.lon - xa.lon) * (xb.lon - xa.lon)) AS md
  FROM prs p
  JOIN pts xb ON xb.user_id = p.ub
  JOIN pts xa ON xa.user_id = p.ua
  GROUP BY 1, 2, 3, 4),
h2 AS (SELECT city, ua, ub, MAX(md) AS dba FROM d2_ GROUP BY 1, 2, 3)
SELECT p.city, p.ua AS uid_a, p.ub AS uid_b, p.n_a, p.n_b,
       GREATEST(h1.dab, h2.dba) AS hausdorff_sq
FROM prs p
JOIN h1 ON h1.city = p.city AND h1.ua = p.ua AND h1.ub = p.ub
JOIN h2 ON h2.city = p.city AND h2.ua = p.ua AND h2.ub = p.ub
"""


_CORR_LAGS = (1, 2, 3, 4)  # Moran correlogram Chebyshev lags


def geo_correlogram(sf_dir: str):
    """MORAN CORRELOGRAM — Moran's I at Chebyshev lag rings 1-4 over the
    1-degree doc-density raster ("at what DISTANCE does spatial structure
    die out" — geo_moran_i gives one number at lag 1; the correlogram is
    the multi-scale curve, the autocorrelation sibling of geo_ripley_k's
    K curve and geo_semivariogram's variogram). All-integer closed form
    per lag over UNORDERED ring pairs: the ring degree has an exact
    clipped-box identity deg_k(i) = |box_k(i)| - |box_(k-1)(i)| (so empty
    cells never materialize), the total ring weight W_k is the exact
    offset sum of (nlon-|dx|)*(nlat-|dy|), S_adj_k folds over the <=4k
    half-ring offsets, and I_k = (N/W_k) * num_k / den is geo_moran_i's
    fixed int->double chain per lag. ONE distributed pass total (the
    count_by_u64 cell counts); everything after folds driver-side over
    the frame-bounded <=50,400-row cell table (the geo_bivariate_moran
    contract). Same ~10^5 docs/cell int64 bound as geo_moran_i."""
    from core_ray.stages.agg import count_by_u64

    nlon, nlat = _MORAN_NLON, _MORAN_NLAT
    n = nlon * nlat

    def keyed(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        gx = np.floor(lon).astype(np.int64) + 180
        gy = np.floor(lat).astype(np.int64) + 70
        return pa.table(
            {"key": pa.array((gy * nlon + gx).astype(np.uint64), pa.uint64())}
        )

    t_ = _collect_table(  # <= 50400 rows by construction
        count_by_u64(
            _read(sf_dir, "documents", ["doc_id"])
            .map_batches(keyed, batch_format="pyarrow", batch_size=65536),
            "key",
        )
    )
    cell = t_["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    x = t_["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(cell)
    cell, x = cell[order], x[order]
    gx = cell % nlon
    gy = cell // nlon
    t = int(x.sum())
    sum_sq = int((x * x).sum())
    den = n * n * sum_sq - n * t * t

    rows = []
    for k in _CORR_LAGS:
        # exact clipped-box ring degree per occupied cell
        def box(r):
            w = (np.minimum(gx + r, nlon - 1) - np.maximum(gx - r, 0) + 1)
            h = (np.minimum(gy + r, nlat - 1) - np.maximum(gy - r, 0) + 1)
            return w * h

        deg = box(k) - box(k - 1)
        s_degx = int((deg * x).sum())
        # half-ring offsets (dx > 0, or dx == 0 and dy > 0): each unordered
        # pair at Chebyshev distance k counted exactly once
        offs = [
            (dx, dy)
            for dx in range(-k, k + 1)
            for dy in range(-k, k + 1)
            if max(abs(dx), abs(dy)) == k
            and (dx > 0 or (dx == 0 and dy > 0))
        ]
        w_k = sum((nlon - abs(dx)) * (nlat - abs(dy)) for dx, dy in offs)
        s_adj = 0
        for dx, dy in offs:
            ok = (
                (gx + dx >= 0) & (gx + dx < nlon)
                & (gy + dy >= 0) & (gy + dy < nlat)
            )
            nb = cell[ok] + dy * nlon + dx
            pos = np.searchsorted(cell, nb)
            pos_ok = pos < len(cell)
            pos_c = np.minimum(pos, len(cell) - 1)
            hit = pos_ok & (cell[pos_c] == nb)
            s_adj += int((x[ok][hit] * x[pos_c[hit]]).sum())
        num = n * n * s_adj - n * t * s_degx + w_k * t * t
        moran = (float(n) / float(w_k)) * (float(num) / float(den))
        rows.append((k, w_k, s_adj, s_degx, num, moran))
    return pa.table(
        {
            "lag": pa.array([r[0] for r in rows], pa.int64()),
            "w_pairs": pa.array([r[1] for r in rows], pa.int64()),
            "s_adj": pa.array([r[2] for r in rows], pa.int64()),
            "s_deg_x": pa.array([r[3] for r in rows], pa.int64()),
            "num": pa.array([r[4] for r in rows], pa.int64()),
            "moran_i": pa.array([r[5] for r in rows], pa.float64()),
        }
    )


GEO_CORRELOGRAM_SQL = f"""
WITH pts AS (
  SELECT CAST(FLOOR({GEO_LON_SQL}) AS BIGINT) + 180 AS gx,
         CAST(FLOOR({GEO_LAT_SQL}) AS BIGINT) + 70 AS gy
  FROM documents),
cells AS (
  SELECT gy * {_MORAN_NLON} + gx AS cell, gx, gy,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM pts GROUP BY 1, 2, 3),
sc AS (
  SELECT CAST(SUM(x) AS BIGINT) AS t, CAST(SUM(x * x) AS BIGINT) AS sum_sq
  FROM cells),
lags AS (SELECT UNNEST([1, 2, 3, 4]) AS k),
offs AS (
  SELECT l.k, dx.o AS dx, dy.o AS dy
  FROM lags l,
       (SELECT UNNEST(range(-4, 5)) AS o) dx,
       (SELECT UNNEST(range(-4, 5)) AS o) dy
  WHERE GREATEST(ABS(dx.o), ABS(dy.o)) = l.k
    AND (dx.o > 0 OR (dx.o = 0 AND dy.o > 0))),
wk AS (
  SELECT k, CAST(SUM(({_MORAN_NLON} - ABS(dx))
                     * ({_MORAN_NLAT} - ABS(dy))) AS BIGINT) AS w_pairs
  FROM offs GROUP BY 1),
adj AS (
  SELECT o.k, CAST(COALESCE(SUM(a.x * b.x), 0) AS BIGINT) AS s_adj
  FROM offs o
  JOIN cells a ON a.gx + o.dx BETWEEN 0 AND {_MORAN_NLON - 1}
              AND a.gy + o.dy BETWEEN 0 AND {_MORAN_NLAT - 1}
  JOIN cells b ON b.cell = a.cell + o.dy * {_MORAN_NLON} + o.dx
  GROUP BY 1),
degx AS (
  SELECT l.k,
         CAST(SUM(((LEAST(c.gx + l.k, {_MORAN_NLON - 1})
                    - GREATEST(c.gx - l.k, 0) + 1)
                   * (LEAST(c.gy + l.k, {_MORAN_NLAT - 1})
                      - GREATEST(c.gy - l.k, 0) + 1)
                   - (LEAST(c.gx + l.k - 1, {_MORAN_NLON - 1})
                      - GREATEST(c.gx - l.k + 1, 0) + 1)
                     * (LEAST(c.gy + l.k - 1, {_MORAN_NLAT - 1})
                        - GREATEST(c.gy - l.k + 1, 0) + 1)) * c.x)
              AS BIGINT) AS s_deg_x
  FROM lags l CROSS JOIN cells c GROUP BY 1),
k_ AS (SELECT CAST({_MORAN_NLON * _MORAN_NLAT} AS BIGINT) AS n)
SELECT CAST(w.k AS BIGINT) AS lag, w.w_pairs,
       CAST(COALESCE(adj.s_adj, 0) AS BIGINT) AS s_adj, degx.s_deg_x,
       k_.n * k_.n * COALESCE(adj.s_adj, 0) - k_.n * sc.t * degx.s_deg_x
         + w.w_pairs * sc.t * sc.t AS num,
       (CAST(k_.n AS DOUBLE) / CAST(w.w_pairs AS DOUBLE))
         * (CAST(k_.n * k_.n * COALESCE(adj.s_adj, 0)
                 - k_.n * sc.t * degx.s_deg_x
                 + w.w_pairs * sc.t * sc.t AS DOUBLE)
            / CAST(k_.n * k_.n * sc.sum_sq - k_.n * sc.t * sc.t AS DOUBLE))
         AS moran_i
FROM wk w
LEFT JOIN adj ON adj.k = w.k
JOIN degx ON degx.k = w.k, k_, sc
"""


def events_changepoint(sf_dir: str):
    """CHANGE-POINT DETECTION — the single most likely level shift in the
    daily event-count series by maximum CUSUM (the monitoring primitive
    behind "did traffic change, and when": Page's cumulative-sum test,
    the offline argmax form). All-integer: with D days and total T, the
    scaled CUSUM at split k is num_k = D*cum_k - (k+1)*T (the mean-
    centered partial sum times D, so no division until the final
    means), the change point is argmax |num_k| with ties to the EARLIEST
    day — ABS over exact int64 both sides, a total order. Zero-filled
    daily grid (quiet days count). ONE count_by_u64 pass bounded by the
    horizon (days, not rows, reach the driver — the events_hourly
    contract); means emitted as one exact division each."""
    from core_ray.stages.agg import count_by_u64

    empty = pa.table(
        {
            "split_day_idx": pa.array([], pa.int64()),
            "n_days": pa.array([], pa.int64()),
            "total": pa.array([], pa.int64()),
            "cusum_num": pa.array([], pa.int64()),
            "mean_before": pa.array([], pa.float64()),
            "mean_after": pa.array([], pa.float64()),
        }
    )
    ds = _read(sf_dir, "events", ["ts"])

    def day_key(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {"key": pa.array((us // _STG_DAY_US).astype(np.uint64),
                             pa.uint64())}
        )

    t_ = _collect_table(  # <= horizon-days rows by construction
        count_by_u64(
            ds.map_batches(day_key, batch_format="pyarrow",
                           batch_size=131072),
            "key",
        )
    )
    if t_.num_rows == 0:
        return empty
    day = t_["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = t_["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    d0, d1 = int(day.min()), int(day.max())
    nd = d1 - d0 + 1
    if nd < 2:
        return empty
    c = np.zeros(nd, np.int64)
    c[day - d0] = cnt
    t = int(c.sum())
    cum = np.cumsum(c)
    k = np.arange(nd - 1, dtype=np.int64)  # splits AFTER day k
    num = nd * cum[:-1] - (k + 1) * t
    best = int(np.lexsort((k, -np.abs(num)))[0])
    cb = int(cum[best])
    return pa.table(
        {
            "split_day_idx": pa.array([best], pa.int64()),
            "n_days": pa.array([nd], pa.int64()),
            "total": pa.array([t], pa.int64()),
            "cusum_num": pa.array([int(num[best])], pa.int64()),
            "mean_before": pa.array(
                [float(np.float64(cb) / np.float64(best + 1))], pa.float64()),
            "mean_after": pa.array(
                [float(np.float64(t - cb) / np.float64(nd - best - 1))],
                pa.float64()),
        }
    )


EVENTS_CHANGEPOINT_SQL = f"""
WITH pts AS (SELECT epoch_us(ts) // {_STG_DAY_US} AS d FROM events),
dd AS (SELECT CAST(MIN(d) AS BIGINT) AS d0,
              CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS nd FROM pts),
days AS (
  SELECT UNNEST(range(0, (SELECT nd FROM dd))) AS k),
cnts AS (
  SELECT p.d - dd.d0 AS k, CAST(COUNT(*) AS BIGINT) AS c
  FROM pts p, dd GROUP BY 1),
grid AS (
  SELECT days.k, CAST(COALESCE(cnts.c, 0) AS BIGINT) AS c
  FROM days LEFT JOIN cnts USING (k)),
cum AS (
  SELECT k, CAST(SUM(c) OVER (ORDER BY k) AS BIGINT) AS cum FROM grid),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM pts)
SELECT CAST(c.k AS BIGINT) AS split_day_idx,
       dd.nd AS n_days,
       tot.t AS total,
       dd.nd * c.cum - (c.k + 1) * tot.t AS cusum_num,
       CAST(c.cum AS DOUBLE) / CAST(c.k + 1 AS DOUBLE) AS mean_before,
       CAST(tot.t - c.cum AS DOUBLE)
         / CAST(dd.nd - c.k - 1 AS DOUBLE) AS mean_after
FROM cum c, dd, tot
WHERE c.k < dd.nd - 1
ORDER BY ABS(dd.nd * c.cum - (c.k + 1) * tot.t) DESC, c.k
LIMIT 1
"""


_PGRAM_PERIODS = (12, 24, 168)  # hours: half-day, diurnal, weekly


def events_periodogram(sf_dir: str):
    """PERIODOGRAM at the structural periods (12 h / 24 h / 168 h) — the
    FREQUENCY-domain sibling of events_hourly_acf's lag-domain view
    (spectral power says how much of the series' energy lives at each
    cycle; ACF says how self-similar it is at each shift — different
    statistics, both standard). Exactness: for period p, cos/sin of
    2*pi*t/p depend only on (t - h0) mod p, a FINITE set of <= 168
    arguments, so each event contributes an integer micro-quantized
    cosine table entry (ROUND(cos*1e6) — both engines round the same <=
    168 libm values, the coarse-quantize contract for transcendentals)
    and the spectral sums are order-free INTEGER sums; power is one fixed
    double chain over the two integer sums. ONE map_batches pass with
    per-batch (period, partial-sum) rows into a tiny groupby — no
    zero-fill needed (empty hours contribute zero energy by
    definition)."""
    from ray.data.aggregate import Sum

    empty = pa.table(
        {
            "period_h": pa.array([], pa.int64()),
            "s_cos": pa.array([], pa.int64()),
            "s_sin": pa.array([], pa.int64()),
            "power_norm": pa.array([], pa.float64()),
        }
    )
    ds = _read(sf_dir, "events", ["ts"])

    def hour_of(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        h = us // 3_600_000_000
        if len(h) == 0:
            return pa.table({"h0": pa.array([], pa.int64())})
        return pa.table({"h0": pa.array([int(h.min())], pa.int64())})

    h0 = ds.map_batches(hour_of, batch_format="pyarrow",
                        batch_size=131072).min("h0")
    if h0 is None:
        return empty
    h0 = int(h0)
    n_total = ds.count()

    # per-period micro-quantized trig tables (the <=168 shared arguments)
    tables = {}
    for p in _PGRAM_PERIODS:
        m = np.arange(p, dtype=np.float64)
        tables[p] = (
            sql_round_np(np.cos(2.0 * np.pi * m / p) * 1e6, 0).astype(np.int64),
            sql_round_np(np.sin(2.0 * np.pi * m / p) * 1e6, 0).astype(np.int64),
        )

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        t = us // 3_600_000_000 - h0
        rows_p, rows_c, rows_s = [], [], []
        for p in _PGRAM_PERIODS:
            qc, qs = tables[p]
            m = (t % p).astype(np.int64)
            rows_p.append(p)
            rows_c.append(int(qc[m].sum()))
            rows_s.append(int(qs[m].sum()))
        return pa.table(
            {
                "period_h": pa.array(rows_p, pa.int64()),
                "c": pa.array(rows_c, pa.int64()),
                "s": pa.array(rows_s, pa.int64()),
            }
        )

    agg = _collect_table(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("period_h")
        .aggregate(Sum("c", alias_name="c"), Sum("s", alias_name="s"))
    )
    pp = agg["period_h"].to_numpy(zero_copy_only=False).astype(np.int64)
    cc = agg["c"].to_numpy(zero_copy_only=False).astype(np.int64)
    ss = agg["s"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(pp)
    pp, cc, ss = pp[order], cc[order], ss[order]
    den = float(np.float64(n_total) * 1e6)
    power = [
        float(
            (np.float64(int(c_)) * np.float64(int(c_))
             + np.float64(int(s_)) * np.float64(int(s_)))
            / (np.float64(den) * np.float64(den))
        )
        for c_, s_ in zip(cc, ss)
    ]
    return pa.table(
        {
            "period_h": pa.array(pp, pa.int64()),
            "s_cos": pa.array(cc, pa.int64()),
            "s_sin": pa.array(ss, pa.int64()),
            "power_norm": pa.array(power, pa.float64()),
        }
    )


EVENTS_PERIODOGRAM_SQL = f"""
WITH pts AS (SELECT epoch_us(ts) // 3600000000 AS h FROM events),
h0 AS (SELECT CAST(MIN(h) AS BIGINT) AS h0 FROM pts),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pts),
per AS (SELECT UNNEST([12, 24, 168]) AS p),
terms AS (
  SELECT per.p,
         CAST(ROUND(COS(2 * PI() * CAST((pts.h - h0.h0) % per.p AS DOUBLE)
                        / CAST(per.p AS DOUBLE)) * 1000000.0)
              AS BIGINT) AS qc,
         CAST(ROUND(SIN(2 * PI() * CAST((pts.h - h0.h0) % per.p AS DOUBLE)
                        / CAST(per.p AS DOUBLE)) * 1000000.0)
              AS BIGINT) AS qs
  FROM pts, h0, per),
sums AS (
  SELECT p, CAST(SUM(qc) AS BIGINT) AS s_cos,
         CAST(SUM(qs) AS BIGINT) AS s_sin
  FROM terms GROUP BY 1)
SELECT CAST(s.p AS BIGINT) AS period_h, s.s_cos, s.s_sin,
       (CAST(s.s_cos AS DOUBLE) * CAST(s.s_cos AS DOUBLE)
        + CAST(s.s_sin AS DOUBLE) * CAST(s.s_sin AS DOUBLE))
         / (CAST(tot.n * 1000000 AS DOUBLE)
            * CAST(tot.n * 1000000 AS DOUBLE)) AS power_norm
FROM sums s, tot
"""


_WEISZFELD_ITERS = 5
_WEISZFELD_EPS = 1e-3  # singularity guard (degrees): points this close skip


def geo_geometric_median(sf_dir: str):
    """GEOMETRIC MEDIAN by Weiszfeld iteration (the robust center: the
    point minimizing the SUM of distances — the L2 mean geo_std_ellipse
    reports is pulled by outliers, the geometric median is not; facility
    location's 1-median): {I} fixed iterations from c0 = (0, 0), each a
    distributed weighted mean with the ITERATIVE-EXACTNESS contract the
    engine's other fixed-point ops pin (kmeans rounds centers to 6dp per
    iteration, pagerank to 1e-12): distances to the CURRENT center are
    bit-equal doubles (exact milli-degree points, center pinned to 6dp),
    per-point weights quantize to integers w = ROUND(1e9/d) so the
    numerator/denominator sums are ORDER-FREE integer sums (milli-degree
    coords x integer weights), and the new center is two exact divisions
    rounded to 6dp — bit-equal to the SQL's chained MATERIALIZED-CTE
    iterations. Points within {eps} deg of the center skip (the standard
    Weiszfeld singularity handling, mirrored). int64 bound: sum(w*|lm|)
    <= n * 1e12 * 1.8e5 only under adversarial total concentration; at
    uniform density terms are ~1e13 (documented contract, same class as
    geo_moran_i). One map_batches partial + tiny groupby per iteration —
    {I} passes total, constant driver state."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id"])
    clat, clon = 0.0, 0.0
    out_sw = out_skip = 0
    for _ in range(_WEISZFELD_ITERS):

        def partial(b: pa.Table, clat=clat, clon=clon) -> pa.Table:
            doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.int64)
            lm = (doc_id * 7919) % 140000 - 70000
            om = (doc_id * 104729) % 360000 - 180000
            lat = lm / 1000.0
            lon = om / 1000.0
            dla = lat - clat
            dlo = lon - clon
            d = np.sqrt(dla * dla + dlo * dlo)
            ok = d >= _WEISZFELD_EPS
            w = sql_round_np(1e9 / d[ok], 0).astype(np.int64)
            return pa.table(
                {
                    "one": pa.array([1], pa.int64()),
                    "s_lat": pa.array([int((w * lm[ok]).sum())], pa.int64()),
                    "s_lon": pa.array([int((w * om[ok]).sum())], pa.int64()),
                    "s_w": pa.array([int(w.sum())], pa.int64()),
                    "n_skip": pa.array([int((~ok).sum())], pa.int64()),
                }
            )

        agg = _collect_table(
            ds.map_batches(partial, batch_format="pyarrow",
                           batch_size=131072)
            .groupby("one")
            .aggregate(
                Sum("s_lat", alias_name="s_lat"),
                Sum("s_lon", alias_name="s_lon"),
                Sum("s_w", alias_name="s_w"),
                Sum("n_skip", alias_name="n_skip"),
            )
        )
        s_lat = int(agg["s_lat"][0].as_py())
        s_lon = int(agg["s_lon"][0].as_py())
        out_sw = int(agg["s_w"][0].as_py())
        out_skip = int(agg["n_skip"][0].as_py())
        clat = float(sql_round_np(
            np.float64(s_lat) / np.float64(out_sw) / 1000.0, 6))
        clon = float(sql_round_np(
            np.float64(s_lon) / np.float64(out_sw) / 1000.0, 6))
    return pa.table(
        {
            "iters": pa.array([_WEISZFELD_ITERS], pa.int64()),
            "median_lat": pa.array([clat], pa.float64()),
            "median_lon": pa.array([clon], pa.float64()),
            "s_w_final": pa.array([out_sw], pa.int64()),
            "n_skip_final": pa.array([out_skip], pa.int64()),
        }
    )


def _weiszfeld_sql() -> str:
    """Chained-CTE mirror: iteration t scans pts against the (t-1) center
    scalar; MATERIALIZED so DuckDB never inlines the chain exponentially
    (the GEO_ISOCHRONE_SQL lesson)."""
    head = f"""
WITH pts AS (
  SELECT (doc_id * 7919) % 140000 - 70000 AS lm,
         (doc_id * 104729) % 360000 - 180000 AS om,
         {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon
  FROM documents),
it0 AS (SELECT 0.0 AS clat, 0.0 AS clon)"""
    body = ""
    for t in range(1, _WEISZFELD_ITERS + 1):
        body += f""",
s{t} AS MATERIALIZED (
  SELECT CAST(SUM(w * lm) AS BIGINT) AS s_lat,
         CAST(SUM(w * om) AS BIGINT) AS s_lon,
         CAST(SUM(w) AS BIGINT) AS s_w,
         CAST(SUM(skip) AS BIGINT) AS n_skip
  FROM (
    SELECT p.lm, p.om,
           CASE WHEN d >= {_WEISZFELD_EPS}
                THEN CAST(ROUND(1000000000.0 / d) AS BIGINT)
                ELSE 0 END AS w,
           CASE WHEN d >= {_WEISZFELD_EPS} THEN 0 ELSE 1 END AS skip
    FROM (
      SELECT p.lm, p.om,
             SQRT((p.lat - i.clat) * (p.lat - i.clat)
                  + (p.lon - i.clon) * (p.lon - i.clon)) AS d
      FROM pts p, it{t - 1} i) p)),
it{t} AS (
  SELECT ROUND(CAST(s_lat AS DOUBLE) / CAST(s_w AS DOUBLE) / 1000.0, 6)
           AS clat,
         ROUND(CAST(s_lon AS DOUBLE) / CAST(s_w AS DOUBLE) / 1000.0, 6)
           AS clon
  FROM s{t})"""
    tail = f"""
SELECT CAST({_WEISZFELD_ITERS} AS BIGINT) AS iters,
       it{_WEISZFELD_ITERS}.clat AS median_lat,
       it{_WEISZFELD_ITERS}.clon AS median_lon,
       s{_WEISZFELD_ITERS}.s_w AS s_w_final,
       s{_WEISZFELD_ITERS}.n_skip AS n_skip_final
FROM it{_WEISZFELD_ITERS}, s{_WEISZFELD_ITERS}
"""
    return head + body + tail


GEO_GEOMETRIC_MEDIAN_SQL = _weiszfeld_sql()


_CCF_A, _CCF_B = "click", "purchase"
_CCF_LAGS = (0, 1, 2, 3)


def events_type_ccf(sf_dir: str):
    """CROSS-CORRELATION between the hourly '{A}' and '{B}' series at
    lags 0-3 h ("does clicking lead purchasing, and by how long" — the
    marketing-funnel lead-lag classic): both zero-filled hourly series
    over the shared [min, max] span, Pearson r of (a_t, b_t+lag) pairs
    from EXACT integer moments per lag, one two-sqrt chain each. One
    packed (type-bit, hour) count pass bounded by the horizon."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def pack(b: pa.Table) -> pa.Table:
        ty = np.asarray(b["event_type"].to_pylist())
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3600000000
        is_a = ty == _CCF_A
        is_b = ty == _CCF_B
        keep = is_a | is_b
        key = (
            is_b[keep].astype(np.uint64) << np.uint64(40)
        ) | hour[keep].astype(np.uint64)
        return pa.table({"key": pa.array(key, pa.uint64())})

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= 2 x horizon-hours rows by construction
    rows = []
    if t.num_rows:  # no A/B events at all -> empty result (ADVICE r4)
        key = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        is_b = (key >> np.uint64(40)).astype(bool)
        hour = (key & np.uint64((1 << 40) - 1)).astype(np.int64)
        h0, h1 = int(hour.min()), int(hour.max())
        sa = np.zeros(h1 - h0 + 1, np.int64)
        sb = np.zeros(h1 - h0 + 1, np.int64)
        sa[hour[~is_b] - h0] = c[~is_b]
        sb[hour[is_b] - h0] = c[is_b]

        for lag in _CCF_LAGS:
            if len(sa) <= lag:
                continue
            x = sa[: len(sa) - lag] if lag else sa
            y = sb[lag:]
            m = len(x)
            sx, sy = int(x.sum()), int(y.sum())
            sxy = int((x * y).sum())
            sxx = int((x * x).sum())
            syy = int((y * y).sum())
            num = m * sxy - sx * sy
            vx = m * sxx - sx * sx
            vy = m * syy - sy * sy
            # one series constant (e.g. zero purchases): r undefined -> NULL
            r = (
                float(np.float64(num) / (np.sqrt(np.float64(vx)) * np.sqrt(np.float64(vy))))
                if vx != 0 and vy != 0
                else None
            )
            rows.append((lag, m, num, r))
    return pa.table(
        {
            "lag_h": pa.array([r[0] for r in rows], pa.int64()),
            "n_pairs": pa.array([r[1] for r in rows], pa.int64()),
            "r_num": pa.array([r[2] for r in rows], pa.int64()),
            "ccf": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


_CCF_LAG_SQL = ", ".join(str(lag) for lag in _CCF_LAGS)

EVENTS_TYPE_CCF_SQL = f"""
WITH pts AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS h FROM events
  WHERE event_type IN ('{_CCF_A}', '{_CCF_B}')),
cc AS (
  SELECT h, CAST(COUNT(CASE WHEN event_type = '{_CCF_A}' THEN 1 END)
                 AS BIGINT) AS a,
         CAST(COUNT(CASE WHEN event_type = '{_CCF_B}' THEN 1 END)
              AS BIGINT) AS b
  FROM pts GROUP BY 1),
span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM cc),
grid AS (
  SELECT g.h, COALESCE(cc.a, 0) AS a, COALESCE(cc.b, 0) AS b
  FROM (SELECT UNNEST(generate_series((SELECT h0 FROM span),
                                      (SELECT h1 FROM span))) AS h) g
  LEFT JOIN cc ON cc.h = g.h),
lags AS (SELECT UNNEST([{_CCF_LAG_SQL}]) AS lag),
pairs AS (
  SELECT l.lag, x.a AS x, y.b AS y
  FROM lags l JOIN grid x ON TRUE JOIN grid y ON y.h = x.h + l.lag),
m AS (
  SELECT lag, CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY 1)
SELECT CAST(lag AS BIGINT) AS lag_h, m AS n_pairs,
       m * sxy - sx * sy AS r_num,
       CAST(m * sxy - sx * sy AS DOUBLE)
         / NULLIF(SQRT(CAST(m * sxx - sx * sx AS DOUBLE))
                  * SQRT(CAST(m * syy - sy * sy AS DOUBLE)), 0) AS ccf
FROM m ORDER BY 1
"""


def geo_type_hhi(sf_dir: str):
    """HERFINDAHL-HIRSCHMAN INDEX of event-type concentration per 10-deg
    cell (the antitrust-standard concentration ratio applied to behavior
    mix: 1 = single-activity cell, 1/k = perfectly mixed): HHI =
    sum(c_t^2)/n^2 is EXACTLY rational — integer numerator/denominator
    from one packed (cell, type) count pass (bounded), one double
    division; no quantizer anywhere (the Simpson-index trick on squared
    shares)."""
    import ray
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["event_id", "event_type"])

    def type_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(b["event_type"].to_pylist()))
        return pa.table({"event_type": pa.array(u.tolist(), pa.string()),
                         "one": pa.array(np.ones(len(u), np.int64))})

    ty_t = _collect_table(
        ds.select_columns(["event_type"])
        .map_batches(type_partial, batch_format="pyarrow", batch_size=131072)
        .groupby("event_type")
        .aggregate(Sum("one", alias_name="n"))
    )
    types = np.sort(np.asarray(ty_t["event_type"].to_pylist()))
    ty_ref = ray.put(types)

    def pack(b: pa.Table) -> pa.Table:
        ts = ray.get(ty_ref)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(ts, np.asarray(b["event_type"].to_pylist()))
        gx = ((eid * 104729) % 360000) // _GE_CELL_MILLI
        gy = ((eid * 7919) % 140000) // _GE_CELL_MILLI
        key = (idx.astype(np.uint64) << np.uint64(16)) | (
            (gx * 1024 + gy).astype(np.uint64)
        )
        return pa.table({"key": pa.array(key, pa.uint64())})

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= types x 504 rows by construction
    key = t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    cell = (key & np.uint64((1 << 16) - 1)).astype(np.int64)
    cells = np.unique(cell)
    pos = np.searchsorted(cells, cell)
    n_c = np.zeros(len(cells), np.int64)
    sq = np.zeros(len(cells), np.int64)
    np.add.at(n_c, pos, c)
    np.add.at(sq, pos, c * c)
    return pa.table(
        {
            "gx": pa.array(cells // 1024, pa.int64()),
            "gy": pa.array(cells % 1024, pa.int64()),
            "n_events": pa.array(n_c, pa.int64()),
            "sumsq": pa.array(sq, pa.int64()),
            "hhi": pa.array(
                sq.astype(np.float64) / (n_c * n_c).astype(np.float64),
                pa.float64(),
            ),
        }
    )


GEO_TYPE_HHI_SQL = f"""
WITH pts AS (
  SELECT event_type,
         ((event_id * 104729) % 360000) // {_GE_CELL_MILLI} AS gx,
         ((event_id * 7919) % 140000) // {_GE_CELL_MILLI} AS gy
  FROM events),
cc AS (SELECT gx, gy, event_type, CAST(COUNT(*) AS BIGINT) AS c
       FROM pts GROUP BY 1, 2, 3),
per AS (
  SELECT gx, gy, CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(c * c) AS BIGINT) AS sq
  FROM cc GROUP BY 1, 2)
SELECT gx, gy, n AS n_events, sq AS sumsq,
       CAST(sq AS DOUBLE) / CAST(n * n AS DOUBLE) AS hhi
FROM per
"""


_COR_CELL_MILLI = 10000  # 10-degree corridor raster cells


def events_corridors(sf_dir: str):
    """MOVEMENT-CORRIDOR RASTERIZATION (flow map): every consecutive-event
    travel leg is sampled onto the 10-deg grid — s+1 parametric samples
    where s = the leg's Chebyshev cell span (so samples advance ~one cell
    per step along the dominant axis) — and traversals are counted per
    cell: the "most-traveled corridors" heatmap under every flow-map /
    route-demand product. Plan: ONE hash shuffle by user (legs need
    consecutive pairing), the partition kernel builds all samples
    vectorized (repeat + offset-arange interpolation, ALL-integer:
    xi = (x0*(s-i) + x1*i) // s on positive milli-degree operands, so
    numpy floor-div == SQL // exactly) and pre-reduces to (cell, n)
    partials via np.unique; one packed-u64 sum_by_u64 finishes. Work
    scales with legs x cell span, never the grid."""
    from core_ray.stages.agg import map_groups_partitioned, sum_by_u64

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"key": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64())})
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, us, uid))
        uid, eid = uid[order], eid[order]
        mlat = (eid * 7919) % 140000
        mlon = (eid * 104729) % 360000
        leg = np.zeros(len(uid), dtype=bool)
        leg[1:] = uid[1:] == uid[:-1]
        i = np.nonzero(leg)[0]
        if len(i) == 0:
            return pa.table({"key": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64())})
        x0, y0 = mlon[i - 1], mlat[i - 1]
        x1, y1 = mlon[i], mlat[i]
        s = np.maximum(
            np.abs(x1 // _COR_CELL_MILLI - x0 // _COR_CELL_MILLI),
            np.abs(y1 // _COR_CELL_MILLI - y0 // _COR_CELL_MILLI),
        )
        cnt = s + 1
        off = np.concatenate([[0], np.cumsum(cnt)])
        total = off[-1]
        li = np.repeat(np.arange(len(s)), cnt)  # leg index per sample
        step = np.arange(total) - off[li]  # i within leg, 0..s
        sl = s[li]
        pos = sl > 0
        xi = np.where(
            pos,
            (x0[li] * (sl - step) + x1[li] * step) // np.maximum(sl, 1),
            x0[li],
        )
        yi = np.where(
            pos,
            (y0[li] * (sl - step) + y1[li] * step) // np.maximum(sl, 1),
            y0[li],
        )
        key = (
            (xi // _COR_CELL_MILLI) * 1024 + yi // _COR_CELL_MILLI
        ).astype(np.uint64)
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(u, pa.uint64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    flows = sum_by_u64(
        map_groups_partitioned(ds, "user_id", per_part), "key", "n"
    )

    def unpack(b: pa.Table) -> pa.Table:
        key = b["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "gx": pa.array(key // 1024, pa.int64()),
                "gy": pa.array(key % 1024, pa.int64()),
                "traversals": pa.array(
                    b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return flows.map_batches(unpack, batch_format="pyarrow")


EVENTS_CORRIDORS_SQL = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         (event_id * 7919) % 140000 AS mlat,
         (event_id * 104729) % 360000 AS mlon FROM events),
legs AS (
  SELECT user_id,
         LAG(mlon) OVER w AS x0, LAG(mlat) OVER w AS y0,
         mlon AS x1, mlat AS y1
  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
steps AS (
  SELECT x0, y0, x1, y1,
         GREATEST(ABS(x1 // {_COR_CELL_MILLI} - x0 // {_COR_CELL_MILLI}),
                  ABS(y1 // {_COR_CELL_MILLI} - y0 // {_COR_CELL_MILLI})) AS s
  FROM legs WHERE x0 IS NOT NULL),
samples AS (
  SELECT CASE WHEN s = 0 THEN x0 // {_COR_CELL_MILLI}
              ELSE ((x0 * (s - i) + x1 * i) // s) // {_COR_CELL_MILLI} END AS gx,
         CASE WHEN s = 0 THEN y0 // {_COR_CELL_MILLI}
              ELSE ((y0 * (s - i) + y1 * i) // s) // {_COR_CELL_MILLI} END AS gy
  FROM steps, LATERAL (SELECT UNNEST(generate_series(0, s)) AS i) t)
SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS traversals
FROM samples GROUP BY 1, 2
"""


_BFS_LOCAL_MAX = 4_000_000  # below this many graph nodes, solve on the driver


def geo_grid_bfs(sf_dir: str, force_distributed: bool = False):
    """MULTI-SOURCE BFS HOP DISTANCE over the occupied-tile graph (the
    "distance to nearest hub" / service-reach primitive, and the frontier
    -iteration dataflow sibling of CC's pointer jumping and PageRank's
    synchronous rounds): source tiles are the 5-deg cells holding at least
    one seed document (doc_id % 97 == 0); distance propagates through
    4-connected OCCUPIED cells, one hop per round, capped at 24 rounds;
    unreached cells are omitted.

    Scale shape (the cc.py dual-path contract): one distributed corpus
    count pass (all-integer cell math, packed-u64 count_by_u64) builds the
    occupied/seed sets — the only corpus-scale work. The tile GRAPH is
    bounded by geometry (this grid: 72 x 28), so below _BFS_LOCAL_MAX
    nodes the BFS itself solves on the driver in one vectorized
    dense-mask frontier sweep (the log-round distributed loop would be
    pure chained-execution latency, exactly the local_edges_threshold
    lesson); above the guard — finer cells, bigger worlds, arbitrary
    node graphs — the same semantics run as DISTRIBUTED frontier rounds:
    only round-r discoveries emit their 4 neighbor probes (flat-map +
    occupied clip), merged into the distance Dataset by agg.min_by_u64,
    one row-count of driver traffic per round. Both paths are
    equivalence-tested (tests/test_r4e_ops.py, forced guard)."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "documents", ["doc_id"])

    def cells(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mlat = (doc_id * 7919) % 140000
        mlon = (doc_id * 104729) % 360000
        gx = mlon // _BFS_CELL_MILLI
        gy = mlat // _BFS_CELL_MILLI
        key = (gx * 1024 + gy).astype(np.uint64)
        seed = doc_id % _BFS_SEED_MOD == 0
        # seed flag folds into the key's high bit so ONE count pass carries
        # both sets (max over the bit per cell = "has a seed doc")
        return pa.table(
            {
                "key": pa.array(
                    key | (seed.astype(np.uint64) << np.uint64(63)),
                    pa.uint64(),
                )
            }
        )

    occ_t = _collect_table(
        count_by_u64(
            ds.map_batches(cells, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= 2 x (72*28) rows by construction (geometry-bounded)
    raw = occ_t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    node = (raw & np.uint64((1 << 63) - 1)).astype(np.int64)
    is_seed = (raw >> np.uint64(63)).astype(bool)
    nodes = np.unique(node)
    seeds = np.unique(node[is_seed])

    empty = pa.table(
        {
            "gx": pa.array([], pa.int64()),
            "gy": pa.array([], pa.int64()),
            "hops": pa.array([], pa.int64()),
        }
    )
    if len(seeds) == 0:
        return empty

    if len(nodes) <= _BFS_LOCAL_MAX and not force_distributed:
        # driver fast path: dense boolean-mask frontier sweep
        w = 360000 // _BFS_CELL_MILLI
        h = 140000 // _BFS_CELL_MILLI
        occ_m = np.zeros((w, h), bool)
        occ_m[nodes // 1024, nodes % 1024] = True
        dist = np.full((w, h), -1, np.int64)
        frontier = np.zeros((w, h), bool)
        frontier[seeds // 1024, seeds % 1024] = True
        dist[frontier] = 0
        for r in range(1, _BFS_MAX_HOPS + 1):
            grow = np.zeros((w, h), bool)
            grow[1:, :] |= frontier[:-1, :]
            grow[:-1, :] |= frontier[1:, :]
            grow[:, 1:] |= frontier[:, :-1]
            grow[:, :-1] |= frontier[:, 1:]
            frontier = grow & occ_m & (dist < 0)
            if not frontier.any():
                break
            dist[frontier] = r
        gx, gy = np.nonzero(dist >= 0)
        return pa.table(
            {
                "gx": pa.array(gx.astype(np.int64), pa.int64()),
                "gy": pa.array(gy.astype(np.int64), pa.int64()),
                "hops": pa.array(dist[gx, gy], pa.int64()),
            }
        )

    return _grid_bfs_distributed(nodes, seeds)


def _grid_bfs_distributed(nodes: np.ndarray, seeds: np.ndarray):
    """Distributed frontier rounds over an occupied-node graph: dist and
    frontier live as Datasets; per round the frontier flat-maps its 4
    neighbor probes (clipped to occupied via a broadcast sorted key array
    — filter_semi's distributed regime is the swap-in above its guard) and
    agg.min_by_u64 merges them; the driver moves one row-count per round
    (the node set grows monotonically, so stagnation == fixpoint)."""
    import ray

    from core_ray.stages.agg import min_by_u64

    occ_sorted = np.sort(nodes)
    occ_ref = ray.put(occ_sorted)

    dist = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(seeds.astype(np.uint64), pa.uint64()),
                "d": pa.array(np.zeros(len(seeds), np.uint64), pa.uint64()),
            }
        )
    ).materialize()
    frontier = dist
    n_found = dist.count()

    def probe(b: pa.Table) -> pa.Table:
        occ_arr = ray.get(occ_ref)
        nd_ = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        d_ = b["d"].to_numpy(zero_copy_only=False).astype(np.uint64)
        gx, gy = nd_ // 1024, nd_ % 1024
        nx = np.concatenate([gx + 1, gx - 1, gx, gx])
        ny = np.concatenate([gy, gy, gy + 1, gy - 1])
        ndist = np.tile(d_ + np.uint64(1), 4)
        ok = (
            (nx >= 0) & (nx * _BFS_CELL_MILLI < 360000)
            & (ny >= 0) & (ny * _BFS_CELL_MILLI < 140000)
        )
        cand = (nx[ok] * 1024 + ny[ok]).astype(np.int64)
        ndist = ndist[ok]
        pos = np.searchsorted(occ_arr, cand)
        hit = (pos < len(occ_arr)) & (occ_arr[np.minimum(pos, len(occ_arr) - 1)] == cand)
        return pa.table(
            {
                "node": pa.array(cand[hit].astype(np.uint64), pa.uint64()),
                "d": pa.array(ndist[hit], pa.uint64()),
            }
        )

    for r in range(1, _BFS_MAX_HOPS + 1):
        nbrs = frontier.map_batches(probe, batch_format="pyarrow")
        dist = min_by_u64(dist.union(nbrs), "node", "d").materialize()
        cur = dist.count()
        if cur == n_found:
            break
        frontier = dist.filter(expr=f"d == {r}")
        n_found = cur

    def unpack(b: pa.Table) -> pa.Table:
        nd_ = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        d_ = b["d"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "gx": pa.array(nd_ // 1024, pa.int64()),
                "gy": pa.array(nd_ % 1024, pa.int64()),
                "hops": pa.array(d_, pa.int64()),
            }
        )

    return dist.map_batches(unpack, batch_format="pyarrow")


GEO_GRID_BFS_SQL = f"""
WITH RECURSIVE pts AS (
  SELECT doc_id, (doc_id * 7919) % 140000 AS mlat,
         (doc_id * 104729) % 360000 AS mlon FROM documents),
occ AS (
  SELECT mlon // {_BFS_CELL_MILLI} AS gx, mlat // {_BFS_CELL_MILLI} AS gy,
         MAX(CASE WHEN doc_id % {_BFS_SEED_MOD} = 0 THEN 1 ELSE 0 END) AS is_src
  FROM pts GROUP BY 1, 2),
bfs(gx, gy, d) AS (
  SELECT gx, gy, CAST(0 AS BIGINT) FROM occ WHERE is_src = 1
  UNION
  SELECT o.gx, o.gy, b.d + 1
  FROM bfs b JOIN occ o
    ON (o.gx = b.gx + 1 AND o.gy = b.gy) OR (o.gx = b.gx - 1 AND o.gy = b.gy)
    OR (o.gx = b.gx AND o.gy = b.gy + 1) OR (o.gx = b.gx AND o.gy = b.gy - 1)
  WHERE b.d < {_BFS_MAX_HOPS})
SELECT CAST(gx AS BIGINT) AS gx, CAST(gy AS BIGINT) AS gy,
       CAST(MIN(d) AS BIGINT) AS hops
FROM bfs GROUP BY 1, 2
"""


def events_od_matrix(sf_dir: str):
    """ORIGIN-DESTINATION MATRIX: counts of per-user travel legs between
    the 12 model cities (from_city -> to_city whenever consecutive events
    change city) — the flow-aggregation view transport analytics runs over
    trajectories. One hash shuffle by user; each partition reduces its legs
    to the bounded 12x12 partial (same combiner-first shape as
    events_transitions), then a tiny final groupby sums. All-integer, no
    float anywhere."""
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_part(g: pa.Table) -> pa.Table:
        cols = {
            "from_city": pa.array([], pa.int64()),
            "to_city": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
        if g.num_rows == 0:
            return pa.table(cols)
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid = uid[order]
        n = len(uid)
        first = np.r_[True, uid[1:] != uid[:-1]]
        ustart = np.nonzero(first)[0]
        seq = np.arange(n) - np.repeat(ustart, np.diff(np.append(ustart, n)))
        city = (uid * 7 + seq // 20) % 12
        leg = np.zeros(n, dtype=bool)
        leg[1:] = (uid[1:] == uid[:-1]) & (city[1:] != city[:-1])
        i = np.nonzero(leg)[0]
        if len(i) == 0:
            return pa.table(cols)
        key = city[i - 1] * 12 + city[i]
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "from_city": pa.array(u // 12, pa.int64()),
                "to_city": pa.array(u % 12, pa.int64()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    return (
        map_groups_partitioned(ds, "user_id", per_part)
        .groupby(["from_city", "to_city"])
        .aggregate(Sum("n", alias_name="n_trips"))
    )


EVENTS_OD_MATRIX_SQL = """
WITH seqd AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY epoch_us(ts), event_id) - 1 AS seq
  FROM events),
cities AS (
  SELECT user_id, us, event_id, (user_id * 7 + seq // 20) % 12 AS city
  FROM seqd),
legs AS (
  SELECT user_id, city,
         LAG(city) OVER (PARTITION BY user_id ORDER BY us, event_id) AS pcity
  FROM cities)
SELECT CAST(pcity AS BIGINT) AS from_city, CAST(city AS BIGINT) AS to_city,
       CAST(COUNT(*) AS BIGINT) AS n_trips
FROM legs WHERE pcity IS NOT NULL AND pcity != city
GROUP BY 1, 2
"""


def doc_unigram_surprisal(sf_dir: str, broadcast_max: int = 2_000_000):
    """UNIGRAM LM SURPRISAL scoring (the CCNet/fineweb-style perplexity
    proxy): per document, the token count and the total / mean -log2
    unigram probability under the corpus's own unigram model. Pass 1 is
    the combiner-first exact vocab count (same shape as doc_vocab_top20);
    pass 2 is ADAPTIVE like doc_ngram_novelty: a vocab that fits
    ``broadcast_max`` rides the closure and every document scores inside
    one map_batches (searchsorted lookups, bincount reduce — no join
    exists); above the guard, per-doc DISTINCT-word rows hash-join the
    counts (stages/join.py, string keys) and a groupby finishes — the
    vocab side is O(corpus) at web scale and is never broadcast then.

    Float parity: per-TOKEN surprisal rounds to integer micro-bits (log2
    is ULP-divergent across libms), sums are order-independent BIGINT
    arithmetic, and the mean is one exact int/int division on both
    sides."""
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import map_groups_partitioned
    from core_ray.stages.join import hash_join

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def wc_partial(b: pa.Table) -> pa.Table:
        words = np.asarray(
            [w for t in b["text"].to_pylist() for w in t.split(" ")]
        )
        u, c = np.unique(words, return_counts=True)
        return pa.table(
            {"w": pa.array(u.tolist(), pa.string()),
             "c": pa.array(c.astype(np.int64), pa.int64())}
        )

    counts = (
        ds.map_batches(wc_partial, batch_format="pyarrow", batch_size=2048)
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )
    total = counts.aggregate(Sum("c", alias_name="t"))["t"]
    n_vocab = counts.count()
    tf = float(total)

    def _surprisal_micro(cnt: np.ndarray) -> np.ndarray:
        return sql_round_np(
            -np.log2(cnt.astype(np.float64) / tf) * 1000000.0, 0
        ).astype(np.int64)

    if n_vocab <= broadcast_max:
        tab = _collect_table(counts)
        vocab = np.asarray(tab["w"].to_pylist())
        vcnt = tab["c"].to_numpy(zero_copy_only=False)
        o = np.argsort(vocab)
        vocab, vcnt = vocab[o], vcnt[o]
        r_micro = _surprisal_micro(vcnt)

        def score(b: pa.Table) -> pa.Table:
            texts = b["text"].to_pylist()
            per = [t.split(" ") for t in texts]
            lens = np.fromiter((len(p) for p in per), np.int64, len(per))
            flat = np.asarray([w for p in per for w in p])
            row = np.repeat(np.arange(len(texts)), lens)
            idx = np.searchsorted(vocab, flat)
            s = np.bincount(row, weights=r_micro[idx], minlength=len(texts))
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "n_tokens": pa.array(lens, pa.int64()),
                    "sum_micro": pa.array(s.astype(np.int64), pa.int64()),
                    "mean_sur": pa.array(
                        s / lens.astype(np.float64), pa.float64()
                    ),
                }
            )

        return ds.map_batches(score, batch_format="pyarrow", batch_size=2048)

    # distributed path: per-doc distinct words with occurrence counts join
    # the global counts; a partitioned groupby finishes
    def doc_words(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        texts = b["text"].to_pylist()
        per = [t.split(" ") for t in texts]
        lens = np.fromiter((len(p) for p in per), np.int64, len(per))
        flat = np.asarray([w for p in per for w in p])
        row = np.repeat(np.arange(len(texts)), lens)
        key = np.char.add(np.char.add(flat, "\x00"), row.astype("U20"))
        u, first, occ = np.unique(key, return_index=True, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(ids[row[first]], pa.int64()),
                "w": pa.array(flat[first].tolist(), pa.string()),
                "occ": pa.array(occ.astype(np.int64), pa.int64()),
            }
        )

    dw = ds.map_batches(doc_words, batch_format="pyarrow", batch_size=2048)
    j = hash_join(dw, counts, on="w")

    def contrib(b: pa.Table) -> pa.Table:
        r = _surprisal_micro(b["c"].to_numpy(zero_copy_only=False))
        occ = b["occ"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_tokens": pa.array(occ, pa.int64()),
                "sum_micro": pa.array(occ * r, pa.int64()),
            }
        )

    def finish(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        o = np.argsort(ids, kind="stable")
        ids = ids[o]
        nt = g["n_tokens"].to_numpy(zero_copy_only=False)[o]
        sm = g["sum_micro"].to_numpy(zero_copy_only=False)[o]
        starts = np.nonzero(np.r_[True, ids[1:] != ids[:-1]])[0]
        n = np.add.reduceat(nt, starts)
        s = np.add.reduceat(sm, starts)
        return pa.table(
            {
                "doc_id": pa.array(ids[starts], pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "sum_micro": pa.array(s, pa.int64()),
                "mean_sur": pa.array(
                    s.astype(np.float64) / n.astype(np.float64), pa.float64()
                ),
            }
        )

    return map_groups_partitioned(
        j.map_batches(contrib, batch_format="pyarrow"), "doc_id", finish
    )


DOC_UNIGRAM_SURPRISAL_SQL = """
WITH ws AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents),
cnt AS (SELECT w, COUNT(*) AS c FROM ws GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM ws),
tok AS (
  SELECT ws.doc_id,
         CAST(ROUND(-LOG2(CAST(c.c AS DOUBLE) / tot.t) * 1000000.0, 0)
              AS BIGINT) AS r
  FROM ws JOIN cnt c USING (w) CROSS JOIN tot)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(r) AS BIGINT) AS sum_micro,
       CAST(SUM(r) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_sur
FROM tok GROUP BY 1
"""


_DP_EPS = 0.8  # Douglas-Peucker tolerance in degrees


def geo_traj_simplify(sf_dir: str):
    """POLYLINE SIMPLIFICATION (Douglas-Peucker): per user, reduce the
    (ts, event_id)-ordered track on the travel-model coordinates (the
    events_stay_points city/jitter spec) to the points that define its
    shape within 0.8 deg — jitter inside a stay collapses, travel legs
    survive. One hash shuffle by user; inside the partition each user's
    track runs a STACK-based DP whose max-distance scan per split is
    vectorized numpy (the per-user loop is the per-trajectory kernel
    itself, same policy as the per-doc minhash signature loop).

    Determinism spec (shared with the independent recursive pure-Python
    golden, fixtures/docs_golden.golden_traj_simplify): distance to the
    INFINITE endpoint line, squared comparisons cross^2 > eps^2*seg2 (no
    sqrt anywhere), split at the FIRST index of the maximum — both
    implementations run the identical IEEE expression tree, so the kept
    set is bit-deterministic, and the driver hash-checks engine == golden
    via the materialized parquet oracle."""
    from core_ray.stages.agg import map_groups_partitioned

    _ensure_docs_golden(sf_dir)
    eps2 = _DP_EPS * _DP_EPS
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def _dp_keep(lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
        n = len(lat)
        keep = np.zeros(n, dtype=bool)
        keep[0] = keep[-1] = True
        if n <= 2:
            return keep
        stack = [(0, n - 1)]
        while stack:
            i, j = stack.pop()
            if j <= i + 1:
                continue
            ax, ay = lon[i], lat[i]
            bx, by = lon[j], lat[j]
            dx = bx - ax
            dy = by - ay
            seg2 = dx * dx + dy * dy
            px = lon[i + 1 : j]
            py = lat[i + 1 : j]
            if seg2 == 0.0:
                d = (px - ax) * (px - ax) + (py - ay) * (py - ay)
                thr = eps2
            else:
                c = dx * (py - ay) - dy * (px - ax)
                d = c * c
                thr = eps2 * seg2
            m = int(np.argmax(d))  # first index of the maximum
            if d[m] > thr:
                k = i + 1 + m
                keep[k] = True
                stack.append((i, k))
                stack.append((k, j))
        return keep

    def per_part(g: pa.Table) -> pa.Table:
        cols = {
            "user_id": pa.array([], pa.int64()),
            "event_id": pa.array([], pa.int64()),
        }
        if g.num_rows == 0:
            return pa.table(cols)
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, eid = uid[order], eid[order]
        n = len(uid)
        first = np.r_[True, uid[1:] != uid[:-1]]
        ustart = np.nonzero(first)[0]
        ulen = np.diff(np.append(ustart, n))
        seq = np.arange(n) - np.repeat(ustart, ulen)
        city = (uid * 7 + seq // 20) % 12
        lat = (
            ((city * 11003) % 120000) / 1000.0 - 60.0
            + ((uid * 7919) % 2001) / 1000.0 - 1.0
            + ((eid * 13) % 1001) / 1000.0 - 0.5
        )
        lon = (
            ((city * 104729) % 340000) / 1000.0 - 170.0
            + ((uid * 104729) % 2001) / 1000.0 - 1.0
            + ((eid * 29) % 1001) / 1000.0 - 0.5
        )
        keep = np.zeros(n, dtype=bool)
        for s, l in zip(ustart, ulen):
            keep[s : s + l] = _dp_keep(lat[s : s + l], lon[s : s + l])
        return pa.table(
            {
                "user_id": pa.array(uid[keep], pa.int64()),
                "event_id": pa.array(eid[keep], pa.int64()),
            }
        )

    return map_groups_partitioned(ds, "user_id", per_part)


# CCW triangles at .0005 offsets (same off-lattice trick as GEO_RECTS): the
# ray-casting kernel and the SQL half-plane signs agree everywhere except ON
# an edge, which the offset keeps the derived 10^-3 lattice away from.
GEO_TRIS = [
    ("T0-am", (-120.0005, 10.0005), (-100.0005, 10.0005), (-110.0005, 40.0005)),
    ("T1-af", (20.0005, -50.0005), (60.0005, -50.0005), (40.0005, -10.0005)),
    ("T2-as", (100.0005, 20.0005), (140.0005, 25.0005), (120.0005, 55.0005)),
    ("T3-eu", (-40.0005, 40.0005), (-10.0005, 42.0005), (-30.0005, 65.0005)),
]


def geo_pip_triangles(sf_dir: str):
    """Containment JOIN against NON-rectangular polygons — every (document,
    triangle) pair whose point falls inside (overlaps allowed; no winner
    selection), through the SAME WKT-parse -> STRtree -> even-odd
    ray-casting path the flagship pip stage uses (stages/pip.py
    build_polygon_index). The rect-based geo_pip_admin oracle can only
    exercise BETWEEN boxes; here the DuckDB mirror is the exact half-plane
    sign test per CCW triangle, so the general polygon kernel itself is
    driver-hash-checked."""
    import ray

    from core_ray.geo import geometry
    from core_ray.stages.pip import build_polygon_index

    tri_tbl = pa.table(
        {
            "admin_id": pa.array([t[0] for t in GEO_TRIS], pa.string()),
            "level": pa.array([0] * len(GEO_TRIS), pa.int8()),
            "wkt": pa.array(
                [
                    f"POLYGON (({t[1][0]} {t[1][1]}, {t[2][0]} {t[2][1]}, "
                    f"{t[3][0]} {t[3][1]}, {t[1][0]} {t[1][1]}))"
                    for t in GEO_TRIS
                ],
                pa.string(),
            ),
        }
    )
    tref = ray.put(tri_tbl)

    class TriJoin:
        def __init__(self, r):
            t = ray.get(r) if isinstance(r, ray.ObjectRef) else r
            self.parts, self.tree = build_polygon_index(t)

        def __call__(self, b: pa.Table) -> pa.Table:
            doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
            lat, lon = _derive_coords(doc_id)
            pt, item = self.tree.query_points(lon, lat)
            out_doc, out_tri = [], []
            for it in np.unique(item) if len(item) else []:
                m = item == it
                pts = pt[m]
                inside = geometry.points_in_polygon(lon[pts], lat[pts], self.parts[it][2])
                out_doc.append(doc_id[pts[inside]])
                out_tri.append(np.full(int(inside.sum()), self.parts[it][0]))
            if out_doc:
                return pa.table(
                    {
                        "doc_id": pa.array(np.concatenate(out_doc), pa.int64()),
                        "tri_id": pa.array(np.concatenate(out_tri), pa.string()),
                    }
                )
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "tri_id": pa.array([], pa.string())}
            )

    return _read(sf_dir, "documents", ["doc_id"]).map_batches(
        TriJoin, fn_constructor_args=(tref,), batch_format="pyarrow",
        batch_size=65536, concurrency=(1, 4),
    )


def _tri_values_sql() -> str:
    rows = ",\n    ".join(
        f"('{tid}', {x1}, {y1}, {x2}, {y2}, {x3}, {y3})"
        for tid, (x1, y1), (x2, y2), (x3, y3) in GEO_TRIS
    )
    return f"(VALUES\n    {rows}) AS t(tri_id, x1, y1, x2, y2, x3, y3)"


GEO_PIP_TRIANGLES_SQL = f"""
WITH pts AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents)
SELECT p.doc_id, t.tri_id
FROM pts p JOIN {_tri_values_sql()}
  ON  (t.x2 - t.x1) * (p.lat - t.y1) - (t.y2 - t.y1) * (p.lon - t.x1) > 0
  AND (t.x3 - t.x2) * (p.lat - t.y2) - (t.y3 - t.y2) * (p.lon - t.x2) > 0
  AND (t.x1 - t.x3) * (p.lat - t.y3) - (t.y1 - t.y3) * (p.lon - t.x3) > 0
"""


_FOCAL_ZOOM = 5


def geo_focal_mean(sf_dir: str, zoom: int = _FOCAL_ZOOM):
    """Raster focal statistics (the kernel-density-lite smoothing pass every
    heatmap tiler runs): per z/x/y tile, the MEAN document count over its
    3x3 neighborhood (missing neighbors count 0; windows clipped at the
    grid edge use the true in-range cell count as the divisor). Plan: one
    count_by_u64 rasterization (combiner + single shuffle), then each
    nonzero tile's count replicates to its <=9 in-range neighbors — the
    raster sibling of the distance-band ghost trick — and a second
    sum_by_u64 closes the window; work scales with NONZERO tiles x 9,
    never with the full grid."""
    from core_ray.stages.agg import count_by_u64, sum_by_u64

    n_side = 1 << zoom
    ds = _read(sf_dir, "documents", ["doc_id"])

    def tiles(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        x, y = mercator.lonlat_to_tile(lon, lat, zoom)
        return pa.table(
            {
                "key": pa.array(
                    mercator.tile_key(
                        np.full(len(x), zoom, np.uint64),
                        x.astype(np.uint64),
                        y.astype(np.uint64),
                    ),
                    pa.uint64(),
                )
            }
        )

    counts = count_by_u64(
        ds.map_batches(tiles, batch_format="pyarrow", batch_size=65536), "key"
    )

    dx = np.array([-1, -1, -1, 0, 0, 0, 1, 1, 1], dtype=np.int64)
    dy = np.array([-1, 0, 1, -1, 0, 1, -1, 0, 1], dtype=np.int64)

    def spread(b: pa.Table) -> pa.Table:
        _, x, y = mercator.tile_unkey(b["key"].to_numpy(zero_copy_only=False))
        c = b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(x)
        nx = np.repeat(x, 9) + np.tile(dx, n)
        ny = np.repeat(y, 9) + np.tile(dy, n)
        ok = (nx >= 0) & (nx < n_side) & (ny >= 0) & (ny < n_side)
        key = mercator.tile_key(
            np.full(int(ok.sum()), zoom, np.uint64),
            nx[ok].astype(np.uint64),
            ny[ok].astype(np.uint64),
        )
        return pa.table(
            {
                "key": pa.array(key, pa.uint64()),
                "v": pa.array(np.repeat(c, 9)[ok], pa.int64()),
            }
        )

    summed = sum_by_u64(
        counts.map_batches(spread, batch_format="pyarrow", batch_size=65536), "key", "v"
    )

    def finish(b: pa.Table) -> pa.Table:
        _, x, y = mercator.tile_unkey(b["key"].to_numpy(zero_copy_only=False))
        s = b["cnt"].to_numpy(zero_copy_only=False).astype(np.float64)
        win = (np.minimum(x + 1, n_side - 1) - np.maximum(x - 1, 0) + 1) * (
            np.minimum(y + 1, n_side - 1) - np.maximum(y - 1, 0) + 1
        )
        return pa.table(
            {
                "tile_x": pa.array(x, pa.int64()),
                "tile_y": pa.array(y, pa.int64()),
                "focal_mean": pa.array(
                    sql_round_np(s / win.astype(np.float64), 6), pa.float64()
                ),
            }
        )

    return summed.map_batches(finish, batch_format="pyarrow")


def _focal_sql(zoom: int) -> str:
    n = 1 << zoom
    nf = float(n)
    return f"""
WITH pts AS (
  SELECT {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
c AS (
  SELECT CAST(LEAST({nf} - 1, GREATEST(0, FLOOR((lon + 180.0) / 360.0 * {nf}))) AS BIGINT) AS x,
         CAST(LEAST({nf} - 1, GREATEST(0, FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat))) / PI()) / 2.0 * {nf}))) AS BIGINT) AS y,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM pts GROUP BY 1, 2),
nb AS (
  SELECT c.x + dx.i AS x, c.y + dy.j AS y, SUM(cnt) AS s
  FROM c,
       (SELECT UNNEST(generate_series(-1, 1)) AS i) dx,
       (SELECT UNNEST(generate_series(-1, 1)) AS j) dy
  WHERE c.x + dx.i BETWEEN 0 AND {n - 1} AND c.y + dy.j BETWEEN 0 AND {n - 1}
  GROUP BY 1, 2)
SELECT x AS tile_x, y AS tile_y,
       ROUND(CAST(s AS DOUBLE) / CAST(
         (LEAST(x + 1, {n - 1}) - GREATEST(x - 1, 0) + 1)
         * (LEAST(y + 1, {n - 1}) - GREATEST(y - 1, 0) + 1) AS DOUBLE), 6) AS focal_mean
FROM nb
"""


GEO_FOCAL_MEAN_SQL = _focal_sql(_FOCAL_ZOOM)


def geo_nearest_admin(sf_dir: str):
    """Nearest-neighbor join against a SMALL vector side: each document is
    assigned the admin zone with the closest bbox centroid (squared-degree
    distance, smallest-admin_id tie-break). The centroid table broadcasts
    once (rows x |zones| distance matrix per batch, one argmin) — the
    pattern for any fact-vs-small-gazetteer nearest join; for large right sides
    the cell-bucketed kNN (stages/knn.py) is the scale path. Distance
    arithmetic is (a-b)*(a-b) sums, IEEE-identical to the SQL cross join;
    argmin over centroids pre-sorted by admin_id makes numpy's
    first-minimum exactly the SQL (dist, admin_id) ordering."""
    rects = sorted(GEO_RECTS)  # admin_id ascending
    aid = np.array([r[0] for r in rects])
    clat = np.array([(r[2] + r[4]) / 2.0 for r in rects])
    clon = np.array([(r[3] + r[5]) / 2.0 for r in rects])

    def nearest(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        dla = lat[:, None] - clat[None, :]
        dlo = lon[:, None] - clon[None, :]
        sq = dla * dla + dlo * dlo
        j = np.argmin(sq, axis=1)  # first min == smallest admin_id on ties
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "admin_id": pa.array(aid[j], pa.string()),
                "sq_dist": pa.array(sq[np.arange(len(j)), j], pa.float64()),
            }
        )

    return _read(sf_dir, "documents", ["doc_id"]).map_batches(
        nearest, batch_format="pyarrow", batch_size=65536
    )


GEO_NEAREST_ADMIN_SQL = f"""
WITH pts AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
cent AS (
  SELECT admin_id, (lat0 + lat1) / 2.0 AS clat, (lon0 + lon1) / 2.0 AS clon
  FROM {_geo_rects_values_sql()}),
d AS (
  SELECT p.doc_id, c.admin_id,
         (p.lat - c.clat) * (p.lat - c.clat) + (p.lon - c.clon) * (p.lon - c.clon) AS sq_dist
  FROM pts p CROSS JOIN cent c)
SELECT doc_id, admin_id, sq_dist FROM d
QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sq_dist, admin_id) = 1
"""


_COVER_ZOOM = 4


def geo_rect_cover(sf_dir: str, zoom: int = _COVER_ZOOM):
    """Vector->raster covering (the polyfill primitive): every z/x/y tile
    intersecting each admin polygon's bbox at one zoom. This is the
    broadcast-side builder for raster joins — polyfill the (small) polygon
    table once, then any tile-keyed fact joins against it without geometry
    tests. The explode is the vectorized repeat/offset construction (no
    per-rect Python beyond the batch); the tile floor/clip float math is
    the same kernel geo_tile_counts already hash-verifies against SQL."""
    import ray.data

    def cover(b: pa.Table) -> pa.Table:
        aid = b["admin_id"].to_pylist()
        lat0 = b["lat0"].to_numpy(zero_copy_only=False)
        lon0 = b["lon0"].to_numpy(zero_copy_only=False)
        lat1 = b["lat1"].to_numpy(zero_copy_only=False)
        lon1 = b["lon1"].to_numpy(zero_copy_only=False)
        x0, y1 = mercator.lonlat_to_tile(lon0, lat0, zoom)  # y grows southward
        x1, y0 = mercator.lonlat_to_tile(lon1, lat1, zoom)
        nx = (x1 - x0 + 1).astype(np.int64)
        ny = (y1 - y0 + 1).astype(np.int64)
        cnt = nx * ny
        total = int(cnt.sum())
        rect = np.repeat(np.arange(len(aid), dtype=np.int64), cnt)
        pair_start = np.cumsum(cnt) - cnt
        offs = np.arange(total, dtype=np.int64) - np.repeat(pair_start, cnt)
        tx = x0[rect] + offs // ny[rect]
        ty = y0[rect] + offs % ny[rect]
        return pa.table(
            {
                "admin_id": pa.array([aid[i] for i in rect], pa.string()),
                "tile_z": pa.array(np.full(total, zoom, np.int32), pa.int32()),
                "tile_x": pa.array(tx, pa.int64()),
                "tile_y": pa.array(ty, pa.int64()),
            }
        )

    rects = pa.table(
        {
            "admin_id": pa.array([r[0] for r in GEO_RECTS], pa.string()),
            "lat0": pa.array([r[2] for r in GEO_RECTS], pa.float64()),
            "lon0": pa.array([r[3] for r in GEO_RECTS], pa.float64()),
            "lat1": pa.array([r[4] for r in GEO_RECTS], pa.float64()),
            "lon1": pa.array([r[5] for r in GEO_RECTS], pa.float64()),
        }
    )
    return ray.data.from_arrow(rects).map_batches(
        cover, batch_format="pyarrow", batch_size=4096
    )


def _cover_tile_expr(lon: str, lat: str, zoom: int) -> str:
    n = float(1 << zoom)
    tx = f"CAST(LEAST({n} - 1, GREATEST(0, FLOOR(({lon} + 180.0) / 360.0 * {n}))) AS BIGINT)"
    ty = (
        f"CAST(LEAST({n} - 1, GREATEST(0, FLOOR((1.0 - LN(TAN(RADIANS({lat})) + 1.0 / "
        f"COS(RADIANS({lat}))) / PI()) / 2.0 * {n}))) AS BIGINT)"
    )
    return tx, ty


def _rect_cover_sql(zoom: int) -> str:
    tx0, ty1 = _cover_tile_expr("r.lon0", "r.lat0", zoom)
    tx1, ty0 = _cover_tile_expr("r.lon1", "r.lat1", zoom)
    return f"""
WITH bounds AS (
  SELECT r.admin_id, {tx0} AS x0, {tx1} AS x1, {ty0} AS y0, {ty1} AS y1
  FROM {_geo_rects_values_sql()})
SELECT admin_id, CAST({zoom} AS INTEGER) AS tile_z, gx.x AS tile_x, gy.y AS tile_y
FROM bounds,
     LATERAL (SELECT UNNEST(generate_series(x0, x1)) AS x) gx,
     LATERAL (SELECT UNNEST(generate_series(y0, y1)) AS y) gy
"""


GEO_RECT_COVER_SQL = _rect_cover_sql(_COVER_ZOOM)


_HEXBIN_RES = 0


def geo_hexbin(sf_dir: str, res: int = _HEXBIN_RES):
    """Hexagonal binning over the aperture-7 hex index (geo/hexgrid.py, the
    H3-analog from the north rule): documents counted per hex cell at one
    resolution. The packed uint64 cell id routes the count through the
    vectorized combiner + hash-partition reduce (never Ray's Python-per-key
    aggregate); the oracle mirrors the full float pipeline — axial
    projection constants inlined at full precision and cube-rounding with
    round_even (numpy round IS banker's rounding) — so the driver hash
    checks the hex index math itself."""
    from core_ray.geo import hexgrid
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "documents", ["doc_id"])

    def cells(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        return pa.table(
            {"key": pa.array(hexgrid.lonlat_to_cell(lon, lat, res), pa.uint64())}
        )

    counted = count_by_u64(
        ds.map_batches(cells, batch_format="pyarrow", batch_size=65536), "key"
    )

    def unpack(b: pa.Table) -> pa.Table:
        q, r, _ = hexgrid.unpack(b["key"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "hex_q": pa.array(q, pa.int64()),
                "hex_r": pa.array(r, pa.int64()),
                "n_docs": pa.array(
                    b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64), pa.int64()
                ),
            }
        )

    return counted.map_batches(unpack, batch_format="pyarrow")


def _hexbin_sql(res: int) -> str:
    from core_ray.geo import hexgrid

    size = hexgrid.edge_deg(res)
    c1 = hexgrid.SQRT3 / 3.0
    return f"""
WITH pts AS (
  SELECT {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
frac AS (
  SELECT ({c1!r} * lon - lat / 3.0) / {size!r} AS qf,
         (0.6666666666666666 * lat) / {size!r} AS rf
  FROM pts),
cube AS (
  SELECT qf, rf, -qf - rf AS yf,
         round_even(qf, 0) AS rx, round_even(-qf - rf, 0) AS ry, round_even(rf, 0) AS rz
  FROM frac),
fixed AS (
  SELECT CASE WHEN ABS(rx - qf) > ABS(ry - yf) AND ABS(rx - qf) > ABS(rz - rf)
              THEN -ry - rz ELSE rx END AS rx2, ry, rz,
         NOT (ABS(rx - qf) > ABS(ry - yf) AND ABS(rx - qf) > ABS(rz - rf))
             AND ABS(rz - rf) > ABS(ry - yf) AS fix_z
  FROM cube)
SELECT CAST(rx2 AS BIGINT) AS hex_q,
       CAST(CASE WHEN fix_z THEN -rx2 - ry ELSE rz END AS BIGINT) AS hex_r,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM fixed GROUP BY 1, 2
"""


GEO_HEXBIN_SQL = _hexbin_sql(_HEXBIN_RES)


# ---------------------------------------------------------------- pages
# (flagship pipeline over the synthesized corpus; rows-only driver checks —
# exact-match correctness is enforced by the pytest golden suite)

_PAGES_N_BY_SF = {0.001: 2000, 0.01: 20000, 0.1: 1000000}
_PAGES_GEN_VERSION = 4  # bump when fixtures/pages.py changes generation -> invalidates /tmp caches


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.001


def _pages_corpus(sf_dir: str):
    """Deterministic corpus scaled to the sf; cached under /tmp."""
    import glob

    from core_ray.fixtures.pages import write_corpus

    n = _PAGES_N_BY_SF.get(_sf_of(sf_dir), 2000)
    root = f"/tmp/core_ray_pages_v{_PAGES_GEN_VERSION}_{n}"
    marker = os.path.join(root, ".complete")
    if not os.path.exists(marker):
        # bench-scale corpora carry realistic boilerplate html (~10 KB/page)
        # so the extract stage has representative parse work
        noise = 1200 if n >= 100000 else 0
        write_corpus(root, n, n_page_files=max(8, n // 15000), html_noise_words=noise)
        with open(marker, "w") as f:
            f.write("ok")
    import pyarrow.parquet as pq

    return (
        sorted(glob.glob(f"{root}/pages/*.parquet")),
        pq.read_table(f"{root}/admin_polygons.parquet"),
        pq.read_table(f"{root}/geoip_ranges.parquet"),
        f"/tmp/core_ray_ckpt_v{_PAGES_GEN_VERSION}_{n}",
    )


def _run_pages(sf_dir: str):
    from core_ray.config import PipelineConfig
    from core_ray.pipelines.flagship import run_flagship

    files, admin, geoip, ckpt = _pages_corpus(sf_dir)
    return run_flagship(files, admin, geoip, PipelineConfig(), checkpoint_dir=ckpt)


# --- golden-diff oracle for the flagship outputs -------------------------
# The flagship is not SQL-expressible (regex extraction, STRtree pip, hex/s2
# encoders), so its DuckDB oracle is a GOLDEN DIFF: the slow pure-Python
# oracle (fixtures/oracle.py — the same one the pytest golden suite trusts)
# is materialized as parquet for the driver-correctness corpus (sf0.01,
# n=20000) and the SQL just reads it back; the driver's row/schema/hash
# compare then enforces engine == golden exactly. (VERDICT r1 item 2.)

_GOLDEN_N = _PAGES_N_BY_SF[0.01]
_GOLDEN_VERSION = 2  # bump when the golden file set / schema changes


def _pages_golden_dir() -> str:
    return f"/tmp/core_ray_golden_v{_PAGES_GEN_VERSION}.{_GOLDEN_VERSION}_{_GOLDEN_N}"


def _ensure_pages_golden(sf_dir: str) -> None:
    """No-op except at the driver-correctness scale (exactness at other
    scales is enforced by the pytest golden suite, which includes kNN)."""
    if _PAGES_N_BY_SF.get(_sf_of(sf_dir), 2000) != _GOLDEN_N:
        return
    root = _pages_golden_dir()
    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        return
    import pyarrow.parquet as pq

    from core_ray.fixtures.oracle import compute_golden

    files, admin, geoip, _ = _pages_corpus(sf_dir)
    pages = pa.concat_tables([pq.read_table(f) for f in files])
    g = compute_golden(pages, admin, geoip, with_knn=False)
    os.makedirs(root, exist_ok=True)
    joined = pa.table(
        {
            "url": pa.array([r["url"] for r in g.joined], pa.string()),
            "derivation_source": pa.array([r["derivation_source"] for r in g.joined], pa.string()),
            "mention_idx": pa.array([r["mention_idx"] for r in g.joined], pa.int32()),
            "lat": pa.array([r["lat"] for r in g.joined], pa.float64()),
            "lon": pa.array([r["lon"] for r in g.joined], pa.float64()),
            "hex_cell": pa.array([r["hex_cell"] for r in g.joined], pa.uint64()),
            "s2_cell": pa.array([r["s2_cell"] for r in g.joined], pa.uint64()),
            "admin_id": pa.array([r["admin_id"] for r in g.joined], pa.string()),
            "admin_level": pa.array([r["admin_level"] for r in g.joined], pa.int8()),
        }
    )
    pq.write_table(joined, f"{root}/joined.parquet")
    tk = sorted(g.tiles)
    tiles = pa.table(
        {
            "tile_z": pa.array([z for z, x, y in tk], pa.int32()),
            "tile_x": pa.array([x for z, x, y in tk], pa.int64()),
            "tile_y": pa.array([y for z, x, y in tk], pa.int64()),
            "page_count": pa.array([g.tiles[k][0] for k in tk], pa.int64()),
            "mention_count": pa.array([g.tiles[k][1] for k in tk], pa.int64()),
        }
    )
    pq.write_table(tiles, f"{root}/tiles.parquet")
    errors = pa.table(
        {
            "url": pa.array([e["url"] for e in g.errors], pa.string()),
            "phase": pa.array([e["phase"] for e in g.errors], pa.string()),
            "reason": pa.array([e["reason"] for e in g.errors], pa.string()),
        }
    )
    pq.write_table(errors, f"{root}/errors.parquet")
    from core_ray.fixtures.oracle import golden_knn_vectorized

    gk = golden_knn_vectorized(g.joined)
    knn = pa.table(
        {
            "url": pa.array([r["url"] for r in gk], pa.string()),
            "mention_idx": pa.array([r["mention_idx"] for r in gk], pa.int32()),
            "neighbor_url": pa.array([r["neighbor_url"] for r in gk], pa.string()),
            "neighbor_mention_idx": pa.array([r["neighbor_mention_idx"] for r in gk], pa.int32()),
            "rank": pa.array([r["rank"] for r in gk], pa.int32()),
            "dist": pa.array([round(r["dist"], 6) for r in gk], pa.float64()),
        }
    )
    pq.write_table(knn, f"{root}/knn.parquet")
    with open(marker, "w") as f:
        f.write("ok")


def pages_joined(sf_dir: str):
    _ensure_pages_golden(sf_dir)
    return _run_pages(sf_dir).joined.select_columns(
        ["url", "derivation_source", "mention_idx", "lat", "lon",
         "hex_cell", "s2_cell", "admin_id", "admin_level"]
    )


def pages_tiles(sf_dir: str):
    _ensure_pages_golden(sf_dir)
    return _run_pages(sf_dir).tiles


def pages_knn(sf_dir: str):
    _ensure_pages_golden(sf_dir)
    # dist rounded to 6 on BOTH sides: the engine (np.hypot) and the golden
    # can differ in the last ulp, which a value-hash would see
    return _run_pages(sf_dir).knn.map_batches(
        lambda b: b.set_column(
            b.schema.get_field_index("dist"), "dist", pc.round(b["dist"], 6)
        ),
        batch_format="pyarrow",
    )


def pages_errors(sf_dir: str):
    _ensure_pages_golden(sf_dir)
    return _run_pages(sf_dir).errors


def pages_nested(sf_dir: str):
    """Nested-output model (VERDICT r2 item 4; reference's recursive suites,
    pkg/domain/test.go:16-30 -> SURVEY §1.2 list<struct> mapping): joined
    mention rows are NESTED per url into mentions: list<struct<mention_idx,
    lat, lon, admin_id>> (one partitioned shuffle, Arrow-native assembly),
    then EXPLODED back flat. The DuckDB oracle performs the same
    LIST(STRUCT_PACK(...)) -> UNNEST roundtrip over the golden joined
    parquet, so the hash compare proves the nest/explode pair is lossless
    and ordered (list elements sorted by mention_idx)."""
    from core_ray.stages.nest import explode_list, nest_by_key

    _ensure_pages_golden(sf_dir)
    joined = _run_pages(sf_dir).joined.select_columns(
        ["url", "mention_idx", "lat", "lon", "admin_id"]
    )
    nested = nest_by_key(
        joined,
        key_col="url",
        order_col="mention_idx",
        payload_cols=["mention_idx", "lat", "lon", "admin_id"],
        list_col="mentions",
    )
    return explode_list(nested, key_col="url", list_col="mentions")


def pages_nested2(sf_dir: str):
    """TWO-LEVEL nested-output model (VERDICT r3 item 6; the reference's
    suites nest RECURSIVELY to MaxTreeDepth=1000, pkg/domain/test.go:16-30 +
    pkg/parser/tspool/pool.go:40 — one list<struct> level closed §1.2 only
    partially). Hierarchy: host -> pages: list<struct<url, mentions:
    list<struct<mention_idx, lat, lon, admin_id>>>> — built by
    nest_hierarchy (one hash-partition shuffle PER LEVEL, Arrow-native
    assembly; the inner level carries `host` so the outer key needs no
    re-join), then exploded twice back to flat rows. The DuckDB oracle
    performs the same two-level LIST(STRUCT_PACK) -> UNNEST-of-UNNEST
    roundtrip, so the hash compare proves depth-2 nesting is lossless and
    ordered at both levels."""
    from core_ray.stages.nest import explode_list, nest_hierarchy

    _ensure_pages_golden(sf_dir)
    joined = _run_pages(sf_dir).joined.select_columns(
        ["url", "mention_idx", "lat", "lon", "admin_id"]
    )

    def add_host(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["url"], r"^https?://(?P<host>[^/]+)")
        return b.append_column("host", pc.struct_field(m, "host"))

    nested = nest_hierarchy(
        joined.map_batches(add_host, batch_format="pyarrow"),
        levels=[
            dict(key_col="url", order_col="mention_idx",
                 payload_cols=["mention_idx", "lat", "lon", "admin_id"],
                 list_col="mentions", carry_cols=["host"]),
            dict(key_col="host", order_col="url",
                 payload_cols=["url", "mentions"], list_col="pages"),
        ],
    )
    flat1 = explode_list(nested, key_cols=["host"], list_col="pages")
    return explode_list(flat1, key_cols=["host", "url"], list_col="mentions")


_GD = _pages_golden_dir()
PAGES_JOINED_SQL = f"SELECT * FROM read_parquet('{_GD}/joined.parquet')"
PAGES_TILES_SQL = f"SELECT * FROM read_parquet('{_GD}/tiles.parquet')"
PAGES_ERRORS_SQL = f"SELECT * FROM read_parquet('{_GD}/errors.parquet')"
PAGES_KNN_SQL = f"SELECT * FROM read_parquet('{_GD}/knn.parquet')"
# the UNNEST-roundtrip oracle: DuckDB nests the golden joined rows per url
# (list elements ordered by mention_idx) and unnests them back — hash-equal
# to the engine's nest_by_key -> explode_list pair
PAGES_NESTED_SQL = f"""
WITH nested AS (
  SELECT url,
         LIST(STRUCT_PACK(mention_idx := mention_idx, lat := lat, lon := lon,
                          admin_id := admin_id) ORDER BY mention_idx) AS mentions
  FROM read_parquet('{_GD}/joined.parquet') GROUP BY url
),
exploded AS (SELECT url, UNNEST(mentions, recursive := true) FROM nested)
SELECT * FROM exploded
"""

# depth-2 UNNEST-of-UNNEST roundtrip oracle for pages_nested2
PAGES_NESTED2_SQL = f"""
WITH l1 AS (
  SELECT url,
         LIST(STRUCT_PACK(mention_idx := mention_idx, lat := lat, lon := lon,
                          admin_id := admin_id) ORDER BY mention_idx) AS mentions
  FROM read_parquet('{_GD}/joined.parquet') GROUP BY url
),
l2 AS (
  SELECT regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         LIST(STRUCT_PACK(url := url, mentions := mentions) ORDER BY url) AS pages
  FROM l1 GROUP BY 1
),
e2 AS (SELECT host, UNNEST(pages) AS page FROM l2),
e1 AS (SELECT host, page.url AS url, UNNEST(page.mentions) AS m FROM e2)
SELECT host, url, m.mention_idx AS mention_idx, m.lat AS lat, m.lon AS lon,
       m.admin_id AS admin_id
FROM e1
"""


def pages_local_hour(sf_dir: str):
    """Geo-temporal rollup over the PAGES-scale corpus: mentions histogram
    by LOCAL SOLAR HOUR (crawl timestamp shifted by lon/15h) — the "when
    was each place crawled, in its own day" cut a crawl-ops dashboard
    needs. The mention side (url, lon) re-joins the pages fact (url,
    warc_ts) through the fully-distributed string-keyed hash_join — at
    10^12 pages neither side broadcasts — and the hour arithmetic is ALL
    integer (epoch-us floor-division minutes + ROUND(lon*4) minute offset),
    so the SQL mirror is exact with no float-boundary hazard."""
    import ray.data

    from core_ray.stages.join import hash_join

    _ensure_pages_golden(sf_dir)
    res = _run_pages(sf_dir)
    mentions = res.joined.select_columns(["url", "lon"])
    files, _, _, _ = _pages_corpus(sf_dir)
    pages = ray.data.read_parquet(files, columns=["url", "warc_ts"])
    j = hash_join(mentions, pages, on="url")

    def partial(b: pa.Table) -> pa.Table:
        us = (
            b["warc_ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        off = sql_round_np(
            b["lon"].to_numpy(zero_copy_only=False) * 4.0, 0
        ).astype(np.int64)
        h = ((us // 60_000_000 + off) // 60) % 24
        cnt = np.bincount(h, minlength=24).astype(np.int64)
        return pa.table(
            {
                "local_hour": pa.array(np.arange(24, dtype=np.int64), pa.int64()),
                "n": pa.array(cnt, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        j.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("local_hour")
        .aggregate(Sum("n", alias_name="n_mentions"))
    )
    t = _collect_table(agg)
    t = t.filter(pc.greater(t["n_mentions"], 0))
    return pa.table(
        {
            "local_hour": pc.cast(t["local_hour"], pa.int64()),
            "n_mentions": pc.cast(t["n_mentions"], pa.int64()),
        }
    )


_PAGES_CORPUS_GLOB = f"/tmp/core_ray_pages_v{_PAGES_GEN_VERSION}_{_GOLDEN_N}/pages/*.parquet"
PAGES_LOCAL_HOUR_SQL = f"""
SELECT ((epoch_us(p.warc_ts) // 60000000 + CAST(ROUND(m.lon * 4.0) AS BIGINT)) // 60) % 24
         AS local_hour,
       CAST(COUNT(*) AS BIGINT) AS n_mentions
FROM read_parquet('{_GD}/joined.parquet') m
JOIN read_parquet('{_PAGES_CORPUS_GLOB}') p USING (url)
GROUP BY 1
"""


# --- catalog-cascade golden (rules/catalog.py driver gate) -----------------
# A self-generated page set whose urls/texts exercise EVERY catalog rule and
# the cross-class priority interplay; the golden is a LITERAL expectation
# table (expected source + coordinates written as constants derived from the
# published specs, NOT recomputed through the matchers), so the oracle
# hash-checks the distributed cascade: per-language candidate order,
# early-return, counting policy, broadcast side tables through actors.

_RULES_GEOIP = {"known.example.com": (10.0, 20.0)}
_RULES_STATE = {
    "airports": {"SFO": (37.6213, -122.379)},
    "gazetteer": {"Paris": (48.8566, 2.3522)},
    "zipcodes": {"94103": (37.7725, -122.4147)},
}
# (case, url_suffix, text, [(source, lat, lon), ...])  lat/lon pre-rounded 6
_RULE_CASES = [
    ("map1", "/@48.8566,2.3522,12z", "plain words only", [("map-url", 48.8566, 2.3522)]),
    ("map2", "/@-33.8688,151.2093,10z", "plain", [("map-url", -33.8688, 151.2093)]),
    ("mdec", "/a", "point 12.345, -33.251 here", [("text-mention", 12.345, -33.251)]),
    ("mgeo", "/b", "geo:10.5,20.25 uri", [("text-mention", 10.5, 20.25)]),
    ("mdms", "/c", "at 12°30'0\"N 45°15'0\"E mark", [("text-mention", 12.5, 45.25)]),
    ("iso", "/d", "fix +48.8577+002.2950/ logged", [("iso6709", 48.8577, 2.295)]),
    ("qs", "/e?lat=12.5&lon=-33.25", "plain", [("latlon-qs", 12.5, -33.25)]),
    ("gh1", "/f", "see geohash:ezs42 now", [("geohash", 42.60498, -5.603027)]),
    ("gh2", "/g", "see geohash:s0000 now", [("geohash", 0.021973, 0.021973)]),
    ("pl1", "/h", "at 8FVC2222+22 spot", [("pluscode", 47.000063, 8.000063)]),
    ("pl2", "/i", "at 849VCWC8+R9 spot", [("pluscode", 37.422063, -122.084063)]),
    ("ut1", "/j", "grid UTM 31N 448262 5411932 pos", [("utm", 48.858195, 2.294639)]),
    ("ut2", "/k", "grid UTM 10N 552100 4182700 pos", [("utm", 37.790177, -122.408272)]),
    # MGRS literals = the spec-tested Snyder UTM inverse of the cell center
    # (31N e=448252.5 n=5411717.5; 56S e=334368.5 n=6250948.5), rounded 6
    ("mg1", "/j2", "ref MGRS 31UDQ4825211717 pos", [("mgrs", 48.856265, 2.294537)]),
    ("mg2", "/k2", "ref MGRS 56HLH3436850948 pos", [("mgrs", -33.868799, 151.209299)]),
    ("mh1", "/l", "op from grid JN58td tonight", [("maidenhead", 48.145833, 11.625)]),
    ("mh2", "/m", "op from grid FN31pr tonight", [("maidenhead", 41.729167, -72.708333)]),
    ("ti1", "/tiles/11/1050/674.png", "tile page", [("tile-url", 52.214339, 4.658203)]),
    ("ti2", "/tiles/12/2100/1348.png", "tile page", [("tile-url", 52.241256, 4.614258)]),
    ("apt", "/n", "lands at SFO Airport soon", [("airport", 37.6213, -122.379)]),
    ("gaz", "/o", "a week in Paris was nice", [("gazetteer", 48.8566, 2.3522)]),
    ("gip", "/p", "no geo signal words", [("host-geoip", 10.0, 20.0)]),
    ("non", "/q", "no geo signal words", [("none", None, None)]),
    # cross-class priority interplay (the detect-cascade consult order):
    ("p1", "/r", "at 8FVC2222+22 in Paris", [("pluscode", 47.000063, 8.000063)]),
    ("p2", "/s", "point 12.345, -33.251 and geohash:ezs42", [("text-mention", 12.345, -33.251)]),
    ("p3", "/@37.4220,-122.0841,9z", "point 12.345, -33.251", [("map-url", 37.422, -122.0841)]),
    # counting policy: every mention = one row, document order
    ("mm", "/t", "geo:1.5,2.25 then 10.125, -20.375", [
        ("text-mention", 1.5, 2.25), ("text-mention", 10.125, -20.375)]),
    # v3 rules (round-3 catalog growth to the reference's 22 definitions).
    # GeoJSON / WKT literals are (lon, lat) axis order per RFC 7946 / OGC SF.
    ("gj", "/u", 'loc "coordinates": [2.3522, 48.8566] end', [("geojson", 48.8566, 2.3522)]),
    ("wkt", "/v", "geom POINT(151.2093 -33.8688) wkt", [("wkt-point", -33.8688, 151.2093)]),
    ("icbm", "/w", "ICBM: 40.44, -79.99 tag", [("icbm", 40.44, -79.99)]),
    ("gpos", "/x", "geo.position: 37.422;-122.084 meta", [("geo-position", 37.422, -122.084)]),
    ("exif", "/y", "GPSLatitude: 35.6895 GPSLongitude: 139.6917 exif",
     [("exif-gps", 35.6895, 139.6917)]),
    # 48°51.396'N = 48 + 51.396/60 = 48.8566 exactly (decimal-minute arithmetic)
    ("ddm", "/z", "fix 48°51.396'N 2°21.132'E mark", [("ddm", 48.8566, 2.3522)]),
    ("osm", "/aa#map=12/48.8566/2.3522", "osm link page", [("osm-map", 48.8566, 2.3522)]),
    # quadkey 120220011 = z9 tile (259, 176); center via the published slippy
    # inverse: lon=(x+.5)/2^9*360-180, lat=atan(sinh(pi(1-2(y+.5)/2^9)))
    ("qk", "/ab", "at quadkey:120220011 spot", [("quadkey", 48.69096, 2.460938)]),
    # s2:47e66e1 = the level-12 cell covering central Paris; center from the
    # published S2 cell math (geo/s2.py derivation, spec-tested in test_s2.py)
    ("s2", "/ac", "cell s2:47e66e1 here", [("s2-token", 48.866051, 2.356516)]),
    ("zip", "/ad", "around ZIP 94103 area", [("zip-centroid", 37.7725, -122.4147)]),
    # v3 priority interplay: Specialized geojson beats E2E geohash; E2E
    # quadkey beats Generic gazetteer
    ("pg1", "/ae", 'has "coordinates": [2.0, 48.0] and geohash:ezs42',
     [("geojson", 48.0, 2.0)]),
    ("pg2", "/af", "at quadkey:120220011 in Paris", [("quadkey", 48.69096, 2.460938)]),
]
_RULES_COPIES = 40  # rows per case — exercises batching across actors
_RULES_GOLDEN_VERSION = 3  # v3: catalog grown to 23 registered rules


def _rules_pages() -> pa.Table:
    urls, texts = [], []
    for ci, (case, suffix, text, _) in enumerate(_RULE_CASES):
        host = "known.example.com" if case == "gip" else f"c{ci}.rules.example.org"
        for j in range(_RULES_COPIES):
            urls.append(f"https://{host}/{case}/{j}{suffix}")
            texts.append(text)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(urls), pa.string()),
        }
    )


def _rules_golden_dir() -> str:
    return f"/tmp/core_ray_rules_golden_v{_RULES_GOLDEN_VERSION}"


def _ensure_rules_golden() -> None:
    root = _rules_golden_dir()
    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        return
    import pyarrow.parquet as pq

    urls, srcs, midx, lats, lons = [], [], [], [], []
    for ci, (case, suffix, text, expected) in enumerate(_RULE_CASES):
        host = "known.example.com" if case == "gip" else f"c{ci}.rules.example.org"
        for j in range(_RULES_COPIES):
            u = f"https://{host}/{case}/{j}{suffix}"
            for mi, (src, la, lo) in enumerate(expected):
                urls.append(u)
                srcs.append(src)
                midx.append(mi)
                lats.append(la)
                lons.append(lo)
    t = pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "derivation_source": pa.array(srcs, pa.string()),
            "mention_idx": pa.array(midx, pa.int32()),
            "lat": pa.array(lats, pa.float64()),
            "lon": pa.array(lons, pa.float64()),
        }
    )
    os.makedirs(root, exist_ok=True)
    pq.write_table(t, f"{root}/rules.parquet")
    with open(marker, "w") as f:
        f.write("ok")


def pages_rules(sf_dir: str):
    """Full catalog cascade, driver-gated: the engineered page set runs
    through the Geocoder actor pool with full_registry() + broadcast side
    tables; output must hash-match the literal expectation golden."""
    import ray
    import ray.data

    from core_ray.rules import full_registry
    from core_ray.stages.geocode import Geocoder

    _ensure_rules_golden()
    ds = ray.data.from_arrow(_rules_pages())
    out = ds.map_batches(
        Geocoder,
        fn_constructor_args=(_RULES_GEOIP,),
        fn_constructor_kwargs={"registry": full_registry(), "extra_state": _RULES_STATE},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
    )

    def finish(b: pa.Table) -> pa.Table:
        la = b["lat"].to_numpy(zero_copy_only=False)
        lo = b["lon"].to_numpy(zero_copy_only=False)
        # 'none' rows carry null coords — keep them null, not NaN
        return pa.table(
            {
                "url": b["url"],
                "derivation_source": b["derivation_source"],
                "mention_idx": b["mention_idx"],
                "lat": pa.array(sql_round_np(la, 6), pa.float64(), mask=np.isnan(la)),
                "lon": pa.array(sql_round_np(lo, 6), pa.float64(), mask=np.isnan(lo)),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


PAGES_RULES_SQL = (
    f"SELECT * FROM read_parquet('{_rules_golden_dir()}/rules.parquet')"
)


# --- golden-diff oracles for the sketch/ANN queries (VERDICT r2 item 1) ---
# Same trick as pages_*: the independent pure-Python/single-process goldens
# (fixtures/docs_golden.py) are materialized as parquet at the
# driver-correctness scale and the SQL reads them back. This upgrades the
# five formerly rows-only queries to the full rows+schema+hash check.
# Exactness at a second scale is enforced by tests/test_docs_golden.py.

_DOCS_GOLDEN_SF = 0.01
_DOCS_GOLDEN_VERSION = 4  # bump when sketch specs / golden schemas change


def _docs_golden_dir() -> str:
    return f"/tmp/core_ray_docs_golden_v{_DOCS_GOLDEN_VERSION}"


def _ensure_docs_golden(sf_dir: str) -> None:
    """No-op except at the driver-correctness scale (like _ensure_pages_golden)."""
    if _sf_of(sf_dir) != _DOCS_GOLDEN_SF:
        return
    root = _docs_golden_dir()
    marker = os.path.join(root, ".complete")
    # the traj/pca file checks migrate golden dirs written before they existed
    if (
        os.path.exists(marker)
        and os.path.exists(f"{root}/traj_simplify.parquet")
        and os.path.exists(f"{root}/pca.parquet")
    ):
        return
    import pyarrow.parquet as pq

    from core_ray.fixtures import docs_golden as dg

    os.makedirs(root, exist_ok=True)
    docs = pq.read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()
    pq.write_table(dg.golden_fingerprints(ids, texts), f"{root}/fingerprint.parquet")
    mh = dg.golden_minhash_pairs(ids, texts, threshold=0.5)
    pq.write_table(mh, f"{root}/minhash_pairs.parquet")
    pq.write_table(dg.golden_dup_clusters(mh), f"{root}/dup_clusters.parquet")
    pq.write_table(
        dg.golden_simhash_pairs(ids, texts, max_hamming=6), f"{root}/simhash_pairs.parquet"
    )
    emb = pq.read_table(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    pq.write_table(dg.golden_ann_lsh(emb), f"{root}/ann_lsh.parquet")
    pq.write_table(dg.golden_ann_ivf(emb), f"{root}/ann_ivf.parquet")
    pq.write_table(dg.golden_kmeans(emb), f"{root}/kmeans.parquet")
    pq.write_table(dg.golden_pca_power(emb), f"{root}/pca.parquet")
    pq.write_table(dg.golden_tile_hulls(ids), f"{root}/tile_hulls.parquet")
    ev = pq.read_table(_p(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    pq.write_table(
        dg.golden_traj_simplify(
            ev["event_id"].to_pylist(),
            ev["user_id"].to_pylist(),
            pc.cast(ev["ts"], pa.int64()).to_pylist(),
            eps=_DP_EPS,
        ),
        f"{root}/traj_simplify.parquet",
    )
    with open(marker, "w") as f:
        f.write("ok")


_DGD = _docs_golden_dir()
DOC_FINGERPRINT_SQL = f"SELECT * FROM read_parquet('{_DGD}/fingerprint.parquet')"
DOC_MINHASH_PAIRS_SQL = f"SELECT * FROM read_parquet('{_DGD}/minhash_pairs.parquet')"
GEO_TRAJ_SIMPLIFY_SQL = f"SELECT * FROM read_parquet('{_DGD}/traj_simplify.parquet')"
DOC_DUP_CLUSTERS_SQL = f"SELECT * FROM read_parquet('{_DGD}/dup_clusters.parquet')"
DOC_DEDUP_KEEP_SQL = f"""
SELECT doc_id FROM documents
WHERE doc_id NOT IN (
  SELECT node FROM read_parquet('{_DGD}/dup_clusters.parquet') WHERE node <> comp)
"""
DOC_SIMHASH_PAIRS_SQL = f"SELECT * FROM read_parquet('{_DGD}/simhash_pairs.parquet')"


def doc_dedup_method_overlap(sf_dir: str):
    """DEDUP METHOD AGREEMENT — set overlap between the MinHash-LSH
    (Jaccard >= 0.5) and SimHash (hamming <= 6) near-dup pair sets (the
    methodology-evaluation companion to emb_ann_recall: the two detectors
    answer subtly different questions — bag-of-shingles resemblance vs
    weighted-feature cosine — and the overlap quantifies how much; a
    curation pipeline choosing one needs this number). Both in-engine
    chains run (minhash via the shared _dup_pairs materialization), pair
    keys pack to u64, and the intersection is ONE distributed
    sum_by_u64 over the side-tagged union (mh=1, sh=2; per-key sum 3 =
    both) followed by a tiny class-count fold — unbounded-pair-safe, the
    driver sees three integers. Output includes the overlap Jaccard as
    one exact division (NULLIF-mirrored)."""
    from ray.data.aggregate import Sum

    from core_ray.text.dedup import simhash_near_dups
    from core_ray.stages.agg import sum_by_u64

    _ensure_docs_golden(sf_dir)
    mh = _dup_pairs(sf_dir, threshold=0.5)
    sh = simhash_near_dups(
        _read(sf_dir, "documents", ["doc_id", "text"]), max_hamming=6
    )

    def tag(side: int):
        def fn(b: pa.Table) -> pa.Table:
            a = b["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
            c = b["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
            if len(a) and (int(a.max()) >= 1 << 32 or int(c.max()) >= 1 << 32):
                raise ValueError("doc_id >= 2^32: widen the pair packing")
            return pa.table(
                {
                    "key": pa.array((a << np.uint64(32)) | c, pa.uint64()),
                    "val": pa.array(np.full(len(a), side, np.uint64),
                                    pa.uint64()),
                }
            )
        return fn

    tagged = mh.map_batches(tag(1), batch_format="pyarrow").union(
        sh.map_batches(tag(2), batch_format="pyarrow")
    )
    per_key = sum_by_u64(tagged, "key", "val")

    def classes(b: pa.Table) -> pa.Table:
        v = b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "one": pa.array([1], pa.int64()),
                "mh_only": pa.array([int((v == 1).sum())], pa.int64()),
                "sh_only": pa.array([int((v == 2).sum())], pa.int64()),
                "both": pa.array([int((v == 3).sum())], pa.int64()),
            }
        )

    agg = _collect_table(
        per_key.map_batches(classes, batch_format="pyarrow")
        .groupby("one")
        .aggregate(Sum("mh_only", alias_name="mh_only"),
                   Sum("sh_only", alias_name="sh_only"),
                   Sum("both", alias_name="both"))
    )
    mo = int(agg["mh_only"][0].as_py()) if agg.num_rows else 0
    so = int(agg["sh_only"][0].as_py()) if agg.num_rows else 0
    nb = int(agg["both"][0].as_py()) if agg.num_rows else 0
    n_mh, n_sh = mo + nb, so + nb
    union = n_mh + n_sh - nb
    jac = float(np.float64(nb) / np.float64(union)) if union else None
    return pa.table(
        {
            "n_minhash": pa.array([n_mh], pa.int64()),
            "n_simhash": pa.array([n_sh], pa.int64()),
            "n_both": pa.array([nb], pa.int64()),
            "jaccard_overlap": pa.array([jac], pa.float64()),
        }
    )


DOC_DEDUP_METHOD_OVERLAP_SQL = f"""
WITH mh AS (SELECT id_a, id_b FROM read_parquet('{_DGD}/minhash_pairs.parquet')),
sh AS (SELECT id_a, id_b FROM read_parquet('{_DGD}/simhash_pairs.parquet')),
b AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_both
  FROM mh JOIN sh ON sh.id_a = mh.id_a AND sh.id_b = mh.id_b),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM mh),
s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sh)
SELECT m.n AS n_minhash, s.n AS n_simhash, b.n_both,
       CAST(b.n_both AS DOUBLE)
         / CAST(NULLIF(m.n + s.n - b.n_both, 0) AS DOUBLE) AS jaccard_overlap
FROM m, s, b
"""
EMB_ANN_LSH_SQL = f"SELECT * FROM read_parquet('{_DGD}/ann_lsh.parquet')"
EMB_ANN_IVF_SQL = f"SELECT * FROM read_parquet('{_DGD}/ann_ivf.parquet')"


def emb_ann_recall(sf_dir: str):
    """ANN QUALITY EVALUATION — recall@5 of the IVF index against the
    exact brute-force cosine top-k (the measurement every approximate
    index owes its users: "how much does nprobe=3 actually miss"). Both
    sides already exist in-engine (text/similarity.py ivf_ann_topk /
    brute_force_topk); this runs them and intersects per query. Both
    result tables are BOUNDED BY CONSTRUCTION at n_queries x k rows
    (queries are 1/100 of vectors at test scale; the production contract
    is a FIXED evaluation query set — recall is a sampled quality metric,
    never a per-corpus-row product — so the bound does not grow with the
    corpus), and the intersection folds driver-side on packed
    (qid << 32 | vec_id) keys — one np.intersect1d, no join shuffle. Oracle: the independent pure-Python IVF golden
    (fixtures/docs_golden.golden_ann_ivf) joined against the live SQL
    brute-force top-k CTE."""
    from core_ray.text.similarity import brute_force_topk, ivf_ann_topk

    _ensure_docs_golden(sf_dir)
    q_ids, q = _load_queries(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    ivf = _collect_table(ivf_ann_topk(ds, q_ids, k=5))
    ex = _collect_table(brute_force_topk(ds, q_ids, q, k=5))

    def pack(t: pa.Table) -> np.ndarray:
        qid = t["query_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        vid = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        if len(vid) and (int(vid.max()) >= 1 << 32 or int(qid.max()) >= 1 << 32):
            raise ValueError("vec_id >= 2^32: widen the recall packing")
        return (qid << np.uint64(32)) | vid

    hits = np.intersect1d(pack(ivf), pack(ex))
    hit_q, hit_n = np.unique((hits >> np.uint64(32)).astype(np.int64),
                             return_counts=True)
    all_q = np.unique(
        ex["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    n = np.zeros(len(all_q), np.int64)
    n[np.searchsorted(all_q, hit_q)] = hit_n
    return pa.table(
        {
            "query_id": pa.array(all_q, pa.int64()),
            "n_hits": pa.array(n, pa.int64()),
            "recall": pa.array(n.astype(np.float64) / 5.0, pa.float64()),
        }
    )


EMB_ANN_RECALL_SQL = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id % 100 = 0),
sims AS (
  SELECT q.qid AS query_id, e.vec_id,
         LIST_COSINE_SIMILARITY(q.qe::DOUBLE[], e.embedding::DOUBLE[]) AS s
  FROM q CROSS JOIN embeddings e
  WHERE e.vec_id <> q.qid),
ex AS (
  SELECT query_id, vec_id
  FROM sims
  QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id)
          <= 5),
ivf AS (SELECT query_id, vec_id
        FROM read_parquet('{_DGD}/ann_ivf.parquet')),
hits AS (
  SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM ex e JOIN ivf i
    ON i.query_id = e.query_id AND i.vec_id = e.vec_id
  GROUP BY 1)
SELECT qq.query_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / 5.0 AS recall
FROM (SELECT DISTINCT query_id FROM ex) qq
LEFT JOIN hits h ON h.query_id = qq.query_id
"""
EMB_KMEANS_SQL = f"SELECT * FROM read_parquet('{_DGD}/kmeans.parquet')"
GEO_CONVEX_HULL_SQL = f"SELECT * FROM read_parquet('{_DGD}/tile_hulls.parquet')"


def doc_dup_source_matrix(sf_dir: str):
    """SYNDICATION FLOW MATRIX ("who copies whom"): for every near-dup
    cluster, the distinct unordered pairs of SOURCES represented among
    its members, counted over all clusters — the feed-level duplication
    map a crawl operator uses to prune mirrored feeds. Composition:
    minhash pairs -> CC clusters (doc_dup_geo_spread's chain), then the
    member -> source attach is a SEMI-FILTERED corpus pass (only cluster
    members' (doc_id, source) rows survive — bounded by PAIRED docs, the
    dedup contract) and the pair fold runs on that bounded table.
    Deterministic pair order (source_a < source_b); each pair counted
    once per cluster (distinct, not per member pair)."""
    from core_ray.stages.join import filter_semi

    _ensure_docs_golden(sf_dir)
    clusters = _dup_clusters(sf_dir, threshold=0.5)
    cl_t = _collect_table(clusters)  # bounded by paired docs
    node = cl_t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
    comp = cl_t["comp"].to_numpy(zero_copy_only=False).astype(np.int64)

    members = filter_semi(
        _read(sf_dir, "documents", ["doc_id", "source"]).map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pc.cast(b["doc_id"], pa.int64()),
                    "source": b["source"],
                }
            ),
            batch_format="pyarrow",
        ),
        clusters.map_batches(
            lambda b: pa.table({"doc_id": pc.cast(b["node"], pa.int64())}),
            batch_format="pyarrow",
        ),
        "doc_id",
    )
    m_t = _collect_table(members)  # bounded by paired docs
    mdoc = m_t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    msrc = np.asarray(m_t["source"].to_pylist())
    src_of = dict(zip(mdoc.tolist(), msrc.tolist()))

    per_comp: dict[int, set] = {}
    for nd, cp in zip(node.tolist(), comp.tolist()):
        per_comp.setdefault(cp, set()).add(src_of[nd])
    counts: dict[tuple, int] = {}
    for srcs in per_comp.values():
        ss = sorted(srcs)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                counts[(ss[i], ss[j])] = counts.get((ss[i], ss[j]), 0) + 1
    keys = sorted(counts)
    return pa.table(
        {
            "source_a": pa.array([k[0] for k in keys], pa.string()),
            "source_b": pa.array([k[1] for k in keys], pa.string()),
            "n_clusters": pa.array(
                [counts[k] for k in keys], pa.int64()
            ),
        }
    )


def doc_cross_lingual_dup(sf_dir: str):
    """CROSS-LINGUAL DUPLICATE DETECTION (translation-mirror discovery):
    near-dup pairs whose two documents carry DIFFERENT language labels —
    the candidate set a translation-pair miner or a "same story, other
    language" deduper starts from (for multilingual training data these
    pairs are curriculum gold, not waste). Composition: minhash pairs
    (bounded by the dedup contract) -> member langs via a SEMI-FILTERED
    corpus pass (only paired docs' (doc_id, lang) rows survive) -> the
    lang-mismatch filter on the bounded pair table. Deterministic
    (id_a < id_b from the pair generator)."""
    from core_ray.stages.join import filter_semi

    _ensure_docs_golden(sf_dir)
    pairs_t = _collect_table(
        _dup_pairs(sf_dir, threshold=0.5)
    )  # bounded by paired docs
    ia = pairs_t["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    ib = pairs_t["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)

    import ray

    ids = np.unique(np.concatenate([ia, ib]))
    members = filter_semi(
        _read(sf_dir, "documents", ["doc_id", "lang"]),
        ray.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64())})
        ),
        "doc_id",
    )
    m_t = _collect_table(members)  # bounded by paired docs
    lang_of = dict(
        zip(
            m_t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            .tolist(),
            m_t["lang"].to_pylist(),
        )
    )
    la = np.asarray([lang_of[i] for i in ia.tolist()])
    lb = np.asarray([lang_of[i] for i in ib.tolist()])
    keep = la != lb
    order = np.lexsort((ib[keep], ia[keep]))
    return pa.table(
        {
            "doc_a": pa.array(ia[keep][order], pa.int64()),
            "doc_b": pa.array(ib[keep][order], pa.int64()),
            "lang_a": pa.array(la[keep][order].tolist(), pa.string()),
            "lang_b": pa.array(lb[keep][order].tolist(), pa.string()),
        }
    )


DOC_CROSS_LINGUAL_DUP_SQL = f"""
SELECT p.id_a AS doc_a, p.id_b AS doc_b,
       a.lang AS lang_a, b.lang AS lang_b
FROM read_parquet('{_DGD}/minhash_pairs.parquet') p
JOIN documents a ON a.doc_id = p.id_a
JOIN documents b ON b.doc_id = p.id_b
WHERE a.lang <> b.lang
"""


DOC_DUP_SOURCE_MATRIX_SQL = f"""
WITH m AS (
  SELECT c.comp, d.source
  FROM read_parquet('{_DGD}/dup_clusters.parquet') c
  JOIN documents d ON d.doc_id = c.node),
pairs AS (
  SELECT DISTINCT a.comp, a.source AS source_a, b.source AS source_b
  FROM m a JOIN m b ON a.comp = b.comp AND a.source < b.source)
SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM pairs GROUP BY 1, 2
"""


def doc_dup_geo_spread(sf_dir: str):
    """CONTENT-SYNDICATION GEOGRAPHY: per near-dup cluster, the geographic
    spread (radius of gyration) of its member documents — does duplicated
    content stay local (one outlet's reposts) or span the world (wire-
    service syndication)? A pipeline COMPOSITION: minhash pairs ->
    connected components (doc_dup_clusters' exact chain) -> per-cluster
    integer-moment rog (events_gyration's identity, keyed by cluster).
    Clusters are an unbounded key, so the moment fold runs distributed
    (one comp-keyed shuffle over the PAIRED docs only — ≪ corpus by the
    dedup contract); rog is one correctly-rounded SQRT of one exact
    int/int division, integer num/den emitted."""
    from core_ray.stages.agg import map_groups_partitioned

    _ensure_docs_golden(sf_dir)
    clusters = _dup_clusters(sf_dir, threshold=0.5)

    _empty = pa.table(
        {
            "cluster_id": pa.array([], pa.int64()),
            "n_docs": pa.array([], pa.int64()),
            "rog_num": pa.array([], pa.int64()),
            "rog_den": pa.array([], pa.int64()),
            "rog_deg": pa.array([], pa.float64()),
        }
    )

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _empty
        comp = g["comp"].to_numpy(zero_copy_only=False).astype(np.int64)
        node = g["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(comp, kind="stable")
        comp, node = comp[order], node[order]
        x = (node * 104729) % 360000
        y = (node * 7919) % 140000
        starts = np.nonzero(np.r_[True, comp[1:] != comp[:-1]])[0]
        n = np.diff(np.r_[starts, len(comp)]).astype(np.int64)
        sx = np.add.reduceat(x, starts)
        sy = np.add.reduceat(y, starts)
        sxx = np.add.reduceat(x * x, starts)
        syy = np.add.reduceat(y * y, starts)
        num = n * (sxx + syy) - sx * sx - sy * sy
        den = n * n
        return pa.table(
            {
                "cluster_id": pa.array(comp[starts], pa.int64()),
                "n_docs": pa.array(n, pa.int64()),
                "rog_num": pa.array(num, pa.int64()),
                "rog_den": pa.array(den, pa.int64()),
                "rog_deg": pa.array(
                    np.sqrt(num.astype(np.float64) / den.astype(np.float64))
                    / 1000.0,
                    pa.float64(),
                ),
            }
        )

    return map_groups_partitioned(clusters, "comp", per_part)


DOC_DUP_GEO_SPREAD_SQL = f"""
WITH m AS (
  SELECT comp, (node * 104729) % 360000 AS x, (node * 7919) % 140000 AS y
  FROM read_parquet('{_DGD}/dup_clusters.parquet')),
per AS (
  SELECT comp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM m GROUP BY 1)
SELECT comp AS cluster_id, n AS n_docs,
       n * (sxx + syy) - sx * sx - sy * sy AS rog_num,
       n * n AS rog_den,
       SQRT(CAST(n * (sxx + syy) - sx * sx - sy * sy AS DOUBLE)
            / CAST(n * n AS DOUBLE)) / 1000.0 AS rog_deg
FROM per
"""



# ---------------------------------------------------------------- multimodal
# REAL image leg (round 5 — replaces the r4 integer-arithmetic stubs): the
# media column carries real encoded BMP payloads (core_ray/media/bmp.py, a
# from-scratch public-format codec — no image libraries in this env, none
# needed for uncompressed BI_RGB), and every stage decodes real pixels.
# Oracle: an INDEPENDENT pure-Python implementation (fixtures/media_golden.py,
# dict/loop style — the docs_golden pattern) writes a golden parquet that the
# SQL reads; the two codecs are additionally cross-checked byte-for-byte in
# tests/test_media.py. Reference analog for "real heavy per-doc kernel":
# pkg/parser/strategies/shared/jstest/parser.go:160-483.


def _media_blobs(sf_dir: str):
    """documents -> (doc_id, media: binary) with REAL encoded BMP payloads
    (media/ops.synth_image -> media/bmp.encode_bmp): the deterministic
    synthetic stand-in for a crawl's image column. Generated in tasks —
    at 100 TB the blobs come off storage instead; everything downstream
    is payload-source-agnostic."""
    from core_ray.media import encode_bmp, synth_image

    ds = _read(sf_dir, "documents", ["doc_id"])

    def synth(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        blobs = [encode_bmp(synth_image(int(i))) for i in ids]
        return pa.table(
            {"doc_id": b["doc_id"], "media": pa.array(blobs, pa.binary())}
        )

    return ds.map_batches(synth, batch_format="pyarrow", batch_size=2048)


class MediaDecode:
    """REAL decode+featurize actor: (doc_id, media: binary BMP) ->
    (doc_id, media_bytes, width, height, feature[8]). Decodes actual
    pixels per row (numpy frombuffer/reshape — the per-image kernel is
    vectorized; the per-row loop is the decode kernel itself, same class
    as the text analyzers) and emits the 4x2 block-luma feature vector.
    Small batches + actor pool because decoded pixels are ~16x the blob."""

    def __init__(self):
        from core_ray.media import decode_bmp, feature_cells, gray_of

        self._decode, self._gray, self._feat = decode_bmp, gray_of, feature_cells

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["media"].to_pylist()
        nb = np.empty(len(blobs), np.int64)
        w = np.empty(len(blobs), np.int32)
        h = np.empty(len(blobs), np.int32)
        feats = []
        for i, blob in enumerate(blobs):
            img = self._decode(blob)
            nb[i] = len(blob)
            h[i], w[i] = img.shape[:2]
            feats.append(self._feat(self._gray(img)))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "media_bytes": pa.array(nb, pa.int64()),
                "width": pa.array(w, pa.int32()),
                "height": pa.array(h, pa.int32()),
                # list child named "l" to byte-match the SQL oracle's Arrow
                # export (DuckDB names list children "l"; the driver hash is
                # schema-type-sensitive)
                "feature": pa.array(
                    feats, pa.list_(pa.field("l", pa.float64()))
                ),
            }
        )


def media_features(sf_dir: str):
    _ensure_media_golden(sf_dir)
    media = _media_blobs(sf_dir)
    return media.map_batches(
        MediaDecode, batch_format="pyarrow", batch_size=512, concurrency=(1, 4)
    )


class MediaThumbnail:
    """REAL decode -> box-resize -> re-encode actor, task-fused so decoded
    pixels and thumb payloads never enter the object store separately
    (the flagship html-never-in-plasma pattern): (doc_id, media) ->
    (doc_id, thumb_w, thumb_h, thumb_bytes, thumb_crc). thumb_bytes is the
    real re-encoded BMP size and thumb_crc its crc32 — proof real pixels
    flowed through the resize."""

    def __init__(self, max_side: int = 16):
        import zlib

        from core_ray.media import box_resize_rgb, decode_bmp, encode_bmp
        from core_ray.media.ops import thumb_dims

        self.max_side = max_side
        self._decode, self._encode = decode_bmp, encode_bmp
        self._resize, self._dims, self._crc = box_resize_rgb, thumb_dims, zlib.crc32

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["media"].to_pylist()
        n = len(blobs)
        tw = np.empty(n, np.int32)
        th = np.empty(n, np.int32)
        tb = np.empty(n, np.int64)
        crc = np.empty(n, np.int64)
        for i, blob in enumerate(blobs):
            img = self._decode(blob)
            h, w = img.shape[:2]
            tw[i], th[i] = self._dims(w, h, self.max_side)
            tblob = self._encode(self._resize(img, int(tw[i]), int(th[i])))
            tb[i] = len(tblob)
            crc[i] = self._crc(tblob)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "thumb_w": pa.array(tw, pa.int32()),
                "thumb_h": pa.array(th, pa.int32()),
                "thumb_bytes": pa.array(tb, pa.int64()),
                "thumb_crc": pa.array(crc, pa.int64()),
            }
        )


def media_thumbnails(sf_dir: str):
    """Real thumbnail chain over the opaque media column: decode + resize
    + re-encode fused in one actor stage."""
    _ensure_media_golden(sf_dir)
    media = _media_blobs(sf_dir)
    return media.map_batches(
        MediaThumbnail, batch_format="pyarrow", batch_size=512, concurrency=(1, 4)
    )


class FrameSample:
    """REAL frame-sampling actor (round 5 — the video leg's last stub
    replaced): the media payload is a BMP-chain video (media/video.py:
    concatenated standard frames, each frame's own header carries its
    size). One input row explodes into one row per SAMPLED frame
    (every ``stride``-th), each frame actually decoded and average-hashed
    — (doc_id, frame_idx, frame_offset_ms, frame_ahash). Chain walk +
    decode + hash all fused per actor call; truncated chains fail loud."""

    def __init__(self, stride: int = 2):
        from core_ray.media import ahash64, decode_bmp, gray_of
        from core_ray.media.video import split_frames

        self.stride = stride
        self._split = split_frames
        self._decode, self._gray, self._hash = decode_bmp, gray_of, ahash64

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_idx, out_hash = [], [], []
        for i, blob in enumerate(batch["media"].to_pylist()):
            frames = self._split(blob)
            for f in range(0, len(frames), self.stride):
                out_id.append(int(ids[i]))
                out_idx.append(f)
                out_hash.append(self._hash(self._gray(self._decode(frames[f]))))
        idx = np.asarray(out_idx, np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(idx, pa.int64()),
                "frame_offset_ms": pa.array(idx * 40, pa.int64()),  # 25 fps
                "frame_ahash": pa.array(np.asarray(out_hash, np.uint64), pa.uint64()),
            }
        )


def media_frames(sf_dir: str):
    """Frame-sampling explode over BMP-chain video payloads (flat-map
    shape: one row in, one row per sampled frame out, every frame REALLY
    decoded + hashed). Oracle: the independent pure-Python golden walks
    and hashes every frame; the SQL takes its frame_idx % stride slice."""
    from core_ray.media.video import synth_video

    _ensure_media_golden(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id"])

    def to_media(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "media": pa.array(
                    [synth_video(int(i)) for i in ids], pa.binary()
                ),
            }
        )

    media = ds.map_batches(to_media, batch_format="pyarrow", batch_size=2048)
    return media.map_batches(
        FrameSample, batch_format="pyarrow", batch_size=512, concurrency=(1, 4)
    )


class MediaAHash:
    """REAL perceptual-hash actor: decode BMP pixels -> integer luma ->
    8x8 box cells -> 64-bit average hash (media/ops.ahash64)."""

    def __init__(self):
        from core_ray.media import ahash64, decode_bmp, gray_of

        self._decode, self._gray, self._hash = decode_bmp, gray_of, ahash64

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs = batch["media"].to_pylist()
        ph = np.empty(len(blobs), np.uint64)
        for i, blob in enumerate(blobs):
            ph[i] = self._hash(self._gray(self._decode(blob)))
        return pa.table(
            {"doc_id": batch["doc_id"], "phash": pa.array(ph, pa.uint64())}
        )


def media_phash_pairs(sf_dir: str, max_hamming: int = 3):
    """Perceptual-hash near-dup dedup over the media family with REAL
    pixel hashes (round 5): decode -> average-hash per image, then the
    SAME distributed 4x16-bit banding machinery as simhash
    (text/dedup.hamming_band_pairs). With max_hamming <= 3 the banding is
    EXACT (pigeonhole over 4 bands), so the oracle — an all-pairs
    bit_count(xor(...)) over the INDEPENDENT pure-Python golden's hashes —
    checks the full distributed path, not an approximation. The synthetic
    corpus groups doc_ids by sevens sharing pixels except a constant-luma
    color marker, so same-group pairs sit at hamming 0 and cross-group
    pairs far above the threshold."""
    from core_ray.text.dedup import hamming_band_pairs

    _ensure_media_golden(sf_dir)
    sig = _media_blobs(sf_dir).map_batches(
        MediaAHash, batch_format="pyarrow", batch_size=512, concurrency=(1, 4)
    )
    return hamming_band_pairs(sig, "doc_id", "phash", max_hamming, pa.int64())


def _ensure_media_golden(sf_dir: str) -> None:
    """Write the independent pure-Python media golden parquets (features,
    ahash, thumbnail stats per doc; per-frame index/offset/ahash for the
    video leg) at the driver-correctness scale — the oracle surface for
    the four real-media queries."""
    if _sf_of(sf_dir) != _DOCS_GOLDEN_SF:
        return
    import pyarrow.parquet as pq

    root = _docs_golden_dir()
    path = f"{root}/media.parquet"
    fpath = f"{root}/media_frames.parquet"
    if os.path.exists(path) and os.path.exists(fpath):
        return
    from core_ray.fixtures import media_golden as mg

    os.makedirs(root, exist_ok=True)
    ids = pq.read_table(_p(sf_dir, "documents"), columns=["doc_id"])[
        "doc_id"
    ].to_pylist()
    if not os.path.exists(path):
        pq.write_table(mg.golden_media(ids), path)
    pq.write_table(mg.golden_frames(ids), fpath)


MEDIA_FEATURES_SQL = f"""
SELECT doc_id, media_bytes, width, height, feature
FROM read_parquet('{_DGD}/media.parquet')
"""

MEDIA_THUMBNAILS_SQL = f"""
SELECT doc_id, thumb_w, thumb_h, thumb_bytes, thumb_crc
FROM read_parquet('{_DGD}/media.parquet')
"""

MEDIA_FRAMES_SQL = f"""
SELECT doc_id, frame_idx, frame_offset_ms, frame_ahash
FROM read_parquet('{_DGD}/media_frames.parquet')
WHERE frame_idx % 2 = 0
"""

MEDIA_PHASH_SQL = f"""
WITH p AS (
  SELECT doc_id, ahash FROM read_parquet('{_DGD}/media.parquet'))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.ahash, b.ahash)) AS INTEGER) AS hamming
FROM p a JOIN p b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.ahash, b.ahash)) <= 3
"""


# ---------------------------------------------------------------- misc ops
# (SURVEY.md §2.7 coverage: sort/limit O1-O2, distinct A4/O4, deterministic
# sampling O5, as-of join, per-record crypto map M13)


def doc_top20_by_chars(sf_dir: str):
    """Deterministic global sort + truncate (the reference's top-20 sample,
    tests/integration/snapshot.go:66-97)."""
    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    return ds.sort(["n_chars", "doc_id"], descending=[True, False]).limit(20)


DOC_TOP20_SQL = """
SELECT doc_id, n_chars FROM documents ORDER BY n_chars DESC, doc_id LIMIT 20
"""


def events_distinct_types(sf_dir: str):
    """ds.unique — distinct values of one column (a shuffle)."""
    import ray.data

    ds = _read(sf_dir, "events", ["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pa.table({"event_type": pa.array(vals, pa.string())})


EVENTS_DISTINCT_SQL = "SELECT DISTINCT event_type FROM events"


def doc_sample_mod(sf_dir: str, k: int = 20):
    """Deterministic sampling (hash-mod, not random — SURVEY.md §2.7 O5:
    fixtures need reproducible samples)."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return ds.map_batches(
        lambda b: b.filter(
            pa.array((b["doc_id"].to_numpy(zero_copy_only=False) % k) == 0)
        ),
        batch_format="pyarrow",
    )


DOC_SAMPLE_SQL = "SELECT doc_id, lang FROM documents WHERE doc_id % 20 = 0"


_BK_MULT = 2654435761  # Knuth multiplicative hash (odd -> injective mod 2^32)
_BK_SEED = 7
_BK_MOD = 1 << 32


def doc_sample_bottomk(sf_dir: str, k: int = 50):
    """Bottom-k sampling — a fixed-SIZE uniform-without-replacement sample
    (the published order-hash design: keep the k rows with the smallest
    values of a pseudo-random order hash). Mergeable by construction: each
    batch prunes to its own k smallest keys (combiner), the tiny survivors
    sort+limit globally. The order hash is an injective multiplicative hash
    mirrored exactly in SQL, so the sample is deterministic AND
    oracle-checked — complementing doc_sample_mod's fixed-RATE hash-mod
    sampling."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def prune(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        key = (ids * np.uint64(_BK_MULT) + np.uint64(_BK_SEED)) % np.uint64(_BK_MOD)
        keep = np.argsort(key, kind="stable")[:k]
        out = b.take(pa.array(np.sort(keep)))
        okey = (
            out["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            * np.uint64(_BK_MULT)
            + np.uint64(_BK_SEED)
        ) % np.uint64(_BK_MOD)
        return out.append_column("sample_key", pa.array(okey.astype(np.int64), pa.int64()))

    pruned = ds.map_batches(prune, batch_format="pyarrow", batch_size=65536)
    return pruned.sort(["sample_key", "doc_id"]).limit(k)


DOC_SAMPLE_BOTTOMK_SQL = f"""
SELECT doc_id, lang,
       CAST((doc_id * {_BK_MULT} + {_BK_SEED}) % {_BK_MOD} AS BIGINT) AS sample_key
FROM documents
ORDER BY sample_key, doc_id
LIMIT 50
"""


def events_asof_purchase(sf_dir: str):
    """As-of join: for each event, the timestamp of the user's most recent
    STRICTLY EARLIER 'purchase' event (ray_guide: sort within key group +
    windowed scan; ties broken by event_id, mirrored in the SQL window)."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def per_part(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "last_purchase_us": pa.array([], pa.int64()),
                }
            )
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        is_p = pc.equal(g["event_type"], "purchase").to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, us, eid, is_p = uid[order], us[order], eid[order], is_p[order]
        # rows are time-sorted within user, so "last purchase strictly
        # before this row" = previous row's running max of purchase ts,
        # reset at user boundaries (vectorized via segmented cummax)
        v = np.where(is_p, us, np.int64(-1))
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        starts = np.nonzero(new_user)[0]
        cm = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, np.append(starts[1:], n)):
            np.maximum.accumulate(v[s:e], out=cm[s:e])
        last = np.empty(n, dtype=np.int64)
        last[0] = -1
        last[1:] = cm[:-1]
        last[starts] = -1
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "last_purchase_us": pa.array(last, pa.int64(), mask=last < 0),
            }
        )

    return map_groups_partitioned(ds, "user_id", per_part)


EVENTS_ASOF_SQL = """
SELECT event_id, user_id,
       MAX(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
         OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_us
FROM events
"""


def doc_encrypt_roundtrip(sf_dir: str):
    """Per-record crypto map (M13 analog): encrypt text per row in an actor
    pool; verify decrypt(encrypt(x)) == x inside the batch and return the
    envelope sizes (content is nondeterministic-looking ciphertext; the
    round-trip identity is the checked property, tests/test_misc_ops.py)."""
    from core_ray.text.crypto import Encryptor, decrypt

    key = hashlib.sha256(b"core-ray-demo-key").digest()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def verify(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        texts = b["text"].to_pylist()
        envs = b["text_enc"].to_pylist()
        ok = [decrypt(key, e).decode("utf-8") == t for e, t in zip(envs, texts)]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "env_len": pa.array([len(e) for e in envs], pa.int64()),
                "roundtrip_ok": pa.array(ok, pa.bool_()),
            }
        )

    enc = ds.map_batches(
        Encryptor, fn_constructor_args=(key,), batch_format="pyarrow",
        batch_size=1024, concurrency=(1, 4),
    )
    return enc.map_batches(verify, batch_format="pyarrow")


# ciphertext is keyed noise, but the ENVELOPE SHAPE is fully deterministic:
# base64(24B nonce || len(utf8(text)) ciphertext || 16B tag) -> 4*ceil((n+40)/3)
# chars; and the in-batch decrypt check must always hold. Both are
# SQL-expressible, making the crypto map oracle-checkable.
DOC_ENCRYPT_SQL = """
SELECT doc_id,
       4 * CAST(CEIL((OCTET_LENGTH(ENCODE(text)) + 40) / 3.0) AS BIGINT) AS env_len,
       TRUE AS roundtrip_ok
FROM documents
"""





def emb_near_dup_pairs(sf_dir: str, threshold: float = 0.35, chunk_rows: int = 4096):
    """Embedding-cosine near-dup pairs (EXACT, distributed): block-nested-loop
    self-join over object-store chunks — the corpus is normalized and
    materialized as chunk refs once, then each task scores ONE chunk pair
    (upper triangle). No task ever holds more than two chunks, and the full
    N×d matrix is never broadcast anywhere (VERDICT r1 item 3: the old
    whole-table ray.put is gone). Exact all-pairs is inherently O(n²/2)
    compute; at corpus scale the approximate path is LSH bucketing
    (emb_ann_lsh / the minhash banding shape) with exact verify per bucket."""
    import ray

    def norm(b: pa.Table) -> pa.Table:
        x = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "nvec": pa.array([r.tobytes() for r in x], pa.binary()),
            }
        )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    normed = ds.map_batches(norm, batch_format="pyarrow", batch_size=chunk_rows)
    refs = normed.to_arrow_refs()  # chunk handles; blocks stay in the object store
    n_chunks = len(refs)

    def _chunk_np(t: pa.Table):
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return ids, np.zeros((0, 1), dtype=np.float64)
        mat = np.frombuffer(b"".join(t["nvec"].to_pylist()), dtype=np.float64)
        return ids, mat.reshape(len(ids), -1)

    def score(batch: pa.Table, refs=refs) -> pa.Table:
        out_a, out_b, out_s = [], [], []
        for ci, cjs in zip(batch["ci"].to_pylist(), batch["cjs"].to_pylist()):
            # the shared left chunk is fetched ONCE per task and stays
            # resident across its cj segment (VERDICT r2 item 5: grouping by
            # ci cuts chunk transfers ~2x — 1 + seg fetches per seg scores)
            ids_i, xi = _chunk_np(ray.get(refs[ci]))
            if not len(ids_i):
                continue
            for cj in cjs:
                ids_j, xj = _chunk_np(ray.get(refs[cj]))
                if not len(ids_j):
                    continue
                # threshold on the ROUNDED sim (the oracle filters
                # identically, so boundary values agree); emit (a < b) only
                sims = sql_round_np(xi @ xj.T, 6)
                hot = sims >= threshold
                a_idx, b_idx = np.nonzero(hot & (ids_i[:, None] < ids_j[None, :]))
                out_a.append(ids_i[a_idx])
                out_b.append(ids_j[b_idx])
                out_s.append(sims[a_idx, b_idx])
                if ci != cj:
                    # cross-chunk pairs whose SMALLER id lives in chunk j
                    a2, b2 = np.nonzero(hot & (ids_j[None, :] < ids_i[:, None]))
                    out_a.append(ids_j[b2])
                    out_b.append(ids_i[a2])
                    out_s.append(sims[a2, b2])
        cat = (lambda xs, d: np.concatenate(xs) if xs else np.zeros(0, dtype=d))
        return pa.table(
            {
                "vec_id_a": pa.array(cat(out_a, np.int64), pa.int64()),
                "vec_id_b": pa.array(cat(out_b, np.int64), pa.int64()),
                "sim": pa.array(cat(out_s, np.float64), pa.float64()),
            }
        )

    # upper-triangle chunk pairs, ci-major, segmented so each task scores up
    # to ``seg`` pairs SHARING its left chunk (bounded per-task work keeps
    # the task pool balanced; cross pairs need BOTH orientations' (a<b)
    # mask, which the id comparison inside score handles)
    seg = 8
    pair_items = []
    for i in range(n_chunks):
        cjs = list(range(i, n_chunks))
        for s in range(0, len(cjs), seg):
            pair_items.append({"ci": i, "cjs": cjs[s : s + seg]})
    pairs_ds = ray.data.from_items(pair_items)
    return pairs_ds.map_batches(score, batch_format="pyarrow", batch_size=1)


EMB_NEAR_DUP_SQL = """
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       ROUND(LIST_COSINE_SIMILARITY(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(LIST_COSINE_SIMILARITY(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35
"""


def emb_silhouette(sf_dir: str, chunk_rows: int = 1024):
    """Silhouette scores per vector against the ground-truth ``label``
    clustering — the cluster-quality evaluation a training pipeline runs
    after kmeans/dedup clustering. sil(i) = (b-a)/max(a,b) with a = mean
    euclidean distance to own-cluster members, b = min over other clusters
    of the mean distance; 0 when degenerate (singleton cluster or all-zero
    distances), rounded to 6.

    Distributed as the emb_near_dup_pairs block-nested-loop: the corpus is
    chunked into object-store refs; each task scores one chunk pair (upper
    triangle, both orientations) and emits PARTIAL per-(vector, other-label)
    distance sums — O(n x labels) combiner rows, never the n² distances.
    Distance matrices accumulate dim-by-dim ((xi_k - xj_k)² adds, one m x n
    buffer — no m x n x d tensor), matching the oracle's list_distance
    sequential-over-dims sum up to reassociation the final ROUND absorbs.
    Per-cluster member counts are exact global label counts (a 10-value
    driver fold), so no count column travels with the partials."""
    import ray

    ds = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def pack(b: pa.Table) -> pa.Table:
        flat = pc.list_flatten(b["embedding"]).to_numpy(
            zero_copy_only=False).astype(np.float64)
        x = flat.reshape(b.num_rows, -1)
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "label": b["label"],
                "vec": pa.array([r.tobytes() for r in x], pa.binary()),
            }
        )

    packed = ds.map_batches(pack, batch_format="pyarrow", batch_size=chunk_rows)
    refs = packed.to_arrow_refs()
    n_chunks = len(refs)

    # exact global label counts: one tiny combiner fold on the driver
    from core_ray.collect import collect_table

    lc = collect_table(
        _read(sf_dir, "embeddings", ["label"]).map_batches(
            lambda b: pa.table(
                {
                    "label": pa.array(
                        np.unique(b["label"].to_numpy(zero_copy_only=False)),
                        pa.int32()),
                    "n": pa.array(
                        np.unique(b["label"].to_numpy(zero_copy_only=False),
                                  return_counts=True)[1].astype(np.int64),
                        pa.int64()),
                }
            ),
            batch_format="pyarrow", batch_size=131072,
        )
    )
    n_by_label: dict[int, int] = {}
    for lab, n in zip(lc["label"].to_pylist(), lc["n"].to_pylist()):
        n_by_label[lab] = n_by_label.get(lab, 0) + n
    labels_sorted = sorted(n_by_label)

    def _chunk_np(t: pa.Table):
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int32)
        if len(ids) == 0:
            return ids, lab, np.zeros((0, 1), dtype=np.float64)
        mat = np.frombuffer(b"".join(t["vec"].to_pylist()), dtype=np.float64)
        return ids, lab, mat.reshape(len(ids), -1)

    def score(batch: pa.Table, refs=refs) -> pa.Table:
        out_i, out_li, out_lj, out_s = [], [], [], []

        def emit(ids, li, lj_val, s):
            out_i.append(ids)
            out_li.append(li)
            out_lj.append(np.full(len(ids), lj_val, dtype=np.int32))
            out_s.append(s)

        for ci, cjs in zip(batch["ci"].to_pylist(), batch["cjs"].to_pylist()):
            ids_i, lab_i, xi = _chunk_np(ray.get(refs[ci]))
            if not len(ids_i):
                continue
            for cj in cjs:
                ids_j, lab_j, xj = _chunk_np(ray.get(refs[cj]))
                if not len(ids_j):
                    continue
                d2 = np.zeros((len(ids_i), len(ids_j)), dtype=np.float64)
                for k in range(xi.shape[1]):
                    diff = xi[:, k][:, None] - xj[:, k][None, :]
                    d2 += diff * diff
                d = np.sqrt(d2)
                # self-pairs (ci == cj diagonal) contribute d == 0 to the
                # own-label sum; the divisor n_li - 1 excludes them exactly
                for lv in labels_sorted:
                    mj = lab_j == lv
                    if mj.any():
                        emit(ids_i, lab_i, lv, d[:, mj].sum(axis=1))
                    if ci != cj:
                        mi = lab_i == lv
                        if mi.any():
                            emit(ids_j, lab_j, lv, d[mi, :].sum(axis=0))
        cat = (lambda xs, t: np.concatenate(xs) if xs else np.zeros(0, dtype=t))
        return pa.table(
            {
                "vec_id": pa.array(cat(out_i, np.int64), pa.int64()),
                "li": pa.array(cat(out_li, np.int32), pa.int32()),
                "lj": pa.array(cat(out_lj, np.int32), pa.int32()),
                "s": pa.array(cat(out_s, np.float64), pa.float64()),
            }
        )

    seg = 8
    pair_items = []
    for i in range(n_chunks):
        cjs = list(range(i, n_chunks))
        for s in range(0, len(cjs), seg):
            pair_items.append({"ci": i, "cjs": cjs[s : s + seg]})
    partials = ray.data.from_items(pair_items).map_batches(
        score, batch_format="pyarrow", batch_size=1
    )

    from core_ray.stages.agg import map_groups_partitioned

    nbl = dict(n_by_label)

    def final(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "label": pa.array([], pa.int32()),
                    "sil": pa.array([], pa.float64()),
                }
            )
        vid = g["vec_id"].to_numpy(zero_copy_only=False)
        li = g["li"].to_numpy(zero_copy_only=False)
        lj = g["lj"].to_numpy(zero_copy_only=False)
        s = g["s"].to_numpy(zero_copy_only=False)
        order = np.lexsort((lj, vid))
        vid, li, lj, s = vid[order], li[order], lj[order], s[order]
        newk = np.ones(len(vid), dtype=bool)
        newk[1:] = (vid[1:] != vid[:-1]) | (lj[1:] != lj[:-1])
        kstarts = np.nonzero(newk)[0]
        ks = np.add.reduceat(s, kstarts)
        kvid, kli, klj = vid[kstarts], li[kstarts], lj[kstarts]
        newv = np.ones(len(kvid), dtype=bool)
        newv[1:] = kvid[1:] != kvid[:-1]
        vstarts = np.nonzero(newv)[0]
        max_lab = max(nbl)
        nbl_arr = np.zeros(max_lab + 1, dtype=np.float64)
        for lv, n in nbl.items():
            nbl_arr[lv] = n
        own = klj == kli
        denom = nbl_arr[klj] - own  # own-cluster divisor excludes self
        with np.errstate(divide="ignore", invalid="ignore"):
            means = ks / denom  # inf/nan on singleton clusters -> sil 0 below
        a = np.add.reduceat(np.where(own, means, 0.0), vstarts)
        has_a = np.add.reduceat(own.astype(np.int64), vstarts) > 0
        b = np.minimum.reduceat(np.where(own, np.inf, means), vstarts)
        mx = np.maximum(a, b)
        valid = has_a & np.isfinite(a) & np.isfinite(b) & (mx > 0.0)
        sil = np.where(
            valid,
            sql_round_np((b - a) / np.where(mx > 0.0, mx, 1.0), 6),
            0.0,
        )
        return pa.table(
            {
                "vec_id": pa.array(kvid[vstarts], pa.int64()),
                "label": pa.array(kli[vstarts], pa.int32()),
                "sil": pa.array(sil, pa.float64()),
            }
        )

    return map_groups_partitioned(partials, "vec_id", final)


EMB_SILHOUETTE_SQL = """
WITH d AS (
  SELECT a.vec_id AS i, a.label AS li, b.label AS lj,
         list_distance(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS d
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
agg AS (SELECT i, li, lj, SUM(d) AS s, COUNT(*) AS c FROM d GROUP BY 1, 2, 3),
ab AS (
  SELECT i, li,
         MAX(CASE WHEN lj = li THEN s / c END) AS a,
         MIN(CASE WHEN lj <> li THEN s / c END) AS b
  FROM agg GROUP BY 1, 2)
SELECT i AS vec_id, li AS label,
       CASE WHEN a IS NULL OR b IS NULL OR GREATEST(a, b) <= 0 THEN 0.0
            ELSE ROUND((b - a) / GREATEST(a, b), 6) END AS sil
FROM ab
"""




def doc_dedup_keep(sf_dir: str, broadcast_max: int = 2_000_000):
    """The APPLY step of near-dup dedup: the corpus minus every non-
    representative cluster member (keep = each component's min doc id,
    plus all unpaired docs). The drop set is the cluster table minus its
    representatives — bounded by the number of PAIRED docs in the common
    case, so it broadcasts — but a 50 %-duplicate crawl makes it
    O(corpus/2), so above ``broadcast_max`` the probe switches to a
    distributed anti hash-join and the drop set never reaches the driver
    (stages/join.filter_not_in, both regimes equivalence-tested)."""
    from core_ray.stages.join import filter_not_in

    _ensure_docs_golden(sf_dir)
    clusters = _dup_clusters(sf_dir, threshold=0.5)
    drop_ds = clusters.map_batches(
        lambda b: pa.table(
            {"doc_id": b["node"].filter(pc.not_equal(b["node"], b["comp"]))}
        ),
        batch_format="pyarrow",
    )
    return filter_not_in(
        _read(sf_dir, "documents", ["doc_id"]),
        drop_ds,
        on="doc_id",
        broadcast_max=broadcast_max,
        ds_schema=pa.schema([("doc_id", pa.int64())]),
    )


def doc_curated(sf_dir: str):
    """The COMPOSED curation pipeline (pipelines/corpus.py) under the
    driver hash: near-dup dedup (minhash pairs -> components -> keep
    reps) + Gopher repetition/length gates + CCNet tercile buckets, one
    streaming pass over the corpus. The oracle rebuilds every stage in
    SQL — the dedup drop set from the golden cluster parquet, the
    repetition fractions from UNNEST word counts, the tercile thresholds
    from QUANTILE_CONT — so the end-to-end composition is hash-checked,
    not just its pieces."""
    from core_ray.pipelines.corpus import curate_corpus

    _ensure_docs_golden(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    return curate_corpus(ds, clusters=_dup_clusters(sf_dir, 0.5)).curated


DOC_CURATED_SQL = f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
w AS (SELECT doc_id, UNNEST(l) AS w FROM ws),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY 1),
topw AS (
  SELECT doc_id, MAX(c) AS mc FROM
    (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2) GROUP BY 1),
th AS (
  SELECT QUANTILE_CONT(n_chars, 1.0 / 3.0) AS t1,
         QUANTILE_CONT(n_chars, 2.0 / 3.0) AS t2
  FROM documents)
SELECT d.doc_id, d.lang,
       CASE WHEN d.n_chars <= th.t1 THEN 'tail'
            WHEN d.n_chars <= th.t2 THEN 'middle'
            ELSE 'head' END AS bucket
FROM documents d JOIN tot USING (doc_id) JOIN topw USING (doc_id), th
WHERE d.doc_id NOT IN (
        SELECT node FROM read_parquet('{_DGD}/dup_clusters.parquet')
        WHERE node <> comp)
  AND tot.n >= 25
  AND ROUND(CAST(topw.mc AS DOUBLE) / CAST(tot.n AS DOUBLE), 6) <= 0.12
"""


def doc_curation_funnel(sf_dir: str):
    """CURATION FUNNEL — per-gate survivor counts of the composed v1
    curation pipeline (the lineage/observability record a 100-TB curation
    run reports next to its output: how many documents each gate
    removed, applied in PIPELINE ORDER dedup -> length -> repetition,
    plus the tercile mix of the final corpus). One streaming pass
    computes the length/repetition flags per batch (the same
    repetition_fractions + sql_round_np chain doc_curated pins), the
    dedup drop set attaches as a LEFT hash-join marker (distributed — no
    broadcast-size assumption at all, unlike the curate pass's guarded
    probe), and per-batch partial sums fold through one tiny groupby —
    the driver sees ONE row of seven integers."""
    from ray.data.aggregate import Sum

    from core_ray.pipelines.corpus import _bucket_thresholds
    from core_ray.stages.join import hash_join
    from core_ray.text.analysis import repetition_fractions

    _ensure_docs_golden(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
    t1, t2 = _bucket_thresholds(
        ds.map_batches(lambda b: b.select(["n_chars"]),
                       batch_format="pyarrow")
    )

    drop_schema = pa.schema([("doc_id", pa.int64()), ("__dup", pa.int8())])
    drop = _dup_clusters(sf_dir, 0.5).map_batches(
        lambda b: pa.table(
            {
                "doc_id": b["node"].filter(pc.not_equal(b["node"], b["comp"])),
                "__dup": pa.array(
                    np.ones(
                        int(pc.sum(pc.cast(
                            pc.not_equal(b["node"], b["comp"]), pa.int64()
                        )).as_py() or 0),
                        np.int8,
                    ),
                    pa.int8(),
                ),
            }
        ),
        batch_format="pyarrow",
    )

    def gates(b: pa.Table) -> pa.Table:
        n_words, topw, _ = repetition_fractions(b["text"])
        frac = sql_round_np(
            topw.astype(np.float64)
            / np.maximum(n_words, 1).astype(np.float64), 6
        )
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "len_ok": pa.array((n_words >= 25).astype(np.int8), pa.int8()),
                "rep_ok": pa.array((frac <= 0.12).astype(np.int8), pa.int8()),
                "n_chars": b["n_chars"],
            }
        )

    gate_schema = pa.schema(
        [("doc_id", pa.int64()), ("len_ok", pa.int8()),
         ("rep_ok", pa.int8()), ("n_chars", pa.int64())]
    )
    j = hash_join(
        ds.map_batches(gates, batch_format="pyarrow", batch_size=4096),
        drop, on="doc_id", how="left",
        left_schema=gate_schema, right_schema=drop_schema,
    )

    cols = ("n_total", "n_after_dedup", "n_after_length",
            "n_after_repetition", "n_head", "n_middle", "n_tail")

    def partial(b: pa.Table) -> pa.Table:
        sv = pc.is_null(b["__dup"]).to_numpy(zero_copy_only=False)
        lok = b["len_ok"].to_numpy(zero_copy_only=False) == 1
        rok = b["rep_ok"].to_numpy(zero_copy_only=False) == 1
        c = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        final = sv & lok & rok
        vals = (
            len(sv), int(sv.sum()), int((sv & lok).sum()), int(final.sum()),
            int((final & (c > t2)).sum()),
            int((final & (c > t1) & (c <= t2)).sum()),
            int((final & (c <= t1)).sum()),
        )
        return pa.table(
            {"one": pa.array([1], pa.int64()),
             **{k: pa.array([v], pa.int64()) for k, v in zip(cols, vals)}}
        )

    agg = _collect_table(
        j.map_batches(partial, batch_format="pyarrow")
        .groupby("one")
        .aggregate(*[Sum(k, alias_name=k) for k in cols])
    )
    return pa.table(
        {k: pa.array([int(agg[k][0].as_py()) if agg.num_rows else 0],
                     pa.int64())
         for k in cols}
    )


DOC_CURATION_FUNNEL_SQL = f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
w AS (SELECT doc_id, UNNEST(l) AS w FROM ws),
tot AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY 1),
topw AS (
  SELECT doc_id, MAX(c) AS mc FROM
    (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2) GROUP BY 1),
th AS (
  SELECT QUANTILE_CONT(n_chars, 1.0 / 3.0) AS t1,
         QUANTILE_CONT(n_chars, 2.0 / 3.0) AS t2
  FROM documents),
base AS (
  SELECT d.doc_id, d.n_chars, tot.n, topw.mc,
         CASE WHEN d.doc_id IN (
                SELECT node FROM read_parquet('{_DGD}/dup_clusters.parquet')
                WHERE node <> comp) THEN 0 ELSE 1 END AS sv
  FROM documents d JOIN tot USING (doc_id) JOIN topw USING (doc_id))
SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(SUM(sv) AS BIGINT) AS n_after_dedup,
       CAST(SUM(CASE WHEN sv = 1 AND n >= 25 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_after_length,
       CAST(SUM(CASE WHEN sv = 1 AND n >= 25
                 AND ROUND(CAST(mc AS DOUBLE) / CAST(n AS DOUBLE), 6) <= 0.12
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_after_repetition,
       CAST(SUM(CASE WHEN sv = 1 AND n >= 25
                 AND ROUND(CAST(mc AS DOUBLE) / CAST(n AS DOUBLE), 6) <= 0.12
                 AND n_chars > th.t2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_head,
       CAST(SUM(CASE WHEN sv = 1 AND n >= 25
                 AND ROUND(CAST(mc AS DOUBLE) / CAST(n AS DOUBLE), 6) <= 0.12
                 AND n_chars > th.t1 AND n_chars <= th.t2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_middle,
       CAST(SUM(CASE WHEN sv = 1 AND n >= 25
                 AND ROUND(CAST(mc AS DOUBLE) / CAST(n AS DOUBLE), 6) <= 0.12
                 AND n_chars <= th.t1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_tail
FROM base, th
"""


def doc_curated_v2(sf_dir: str, novelty_floor: float = 0.1):
    """Curation composition v2: the v1 pipeline (near-dup dedup + Gopher
    gates + terciles) EXTENDED with the round-3d decontamination and
    novelty gates — documents overlapping the benchmark probe set (other
    than the probes themselves) and documents below the 3-gram novelty
    floor are dropped. Gate application is scale-shaped: the contamination
    drop set is tiny by construction (broadcast), the low-novelty set is
    unbounded so it anti-joins through the distributed hash join
    (left join + null filter). The oracle rebuilds the ENTIRE composition
    in SQL — every stage's CTE chained — so the end-to-end product is
    hash-checked, not just its pieces."""
    from core_ray.pipelines.corpus import curate_corpus
    from core_ray.stages.join import hash_join

    _ensure_docs_golden(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])
    base = curate_corpus(ds, clusters=_dup_clusters(sf_dir, 0.5)).curated

    # contamination drop: tiny by construction -> broadcast probe-hit ids
    contam = _collect_table(doc_contamination(sf_dir))
    cids = contam["doc_id"].to_numpy(zero_copy_only=False)
    cdrop = np.sort(cids[cids % _CONTAM_MOD != 0])  # probes themselves stay

    def drop_contaminated(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(ids), dtype=bool)
        if len(cdrop):
            pos = np.searchsorted(cdrop, ids)
            inb = pos < len(cdrop)
            keep[inb] = cdrop[pos[inb]] != ids[inb]
        return b.filter(pa.array(keep))

    base = base.map_batches(drop_contaminated, batch_format="pyarrow")

    # novelty floor: the low-novelty set is unbounded -> distributed anti
    # join (left join against the floor-failers, keep the null side)
    def low_ids(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].filter(pc.less(b["novel_frac"], novelty_floor))
        return pa.table(
            {"doc_id": ids, "__low": pa.array(np.ones(len(ids), np.int8), pa.int8())}
        )

    low = doc_ngram_novelty(sf_dir).map_batches(low_ids, batch_format="pyarrow")
    low_schema = pa.schema([("doc_id", pa.int64()), ("__low", pa.int8())])
    j = hash_join(base, low, on="doc_id", how="left", right_schema=low_schema)
    return j.map_batches(
        lambda b: b.filter(pc.is_null(b["__low"])).select(
            ["doc_id", "lang", "bucket"]
        ),
        batch_format="pyarrow",
    )


# (DOC_CURATED_V2_SQL is assembled in the round-3d block near the QUERIES
# dict, after the contamination / novelty SQL constants it nests exist.)


def emb_dup_clusters(sf_dir: str):
    """Embedding near-dup CLUSTERS: the exact cosine pair graph
    (emb_near_dup_pairs) closed transitively by connected components
    (stages/cc.py). Unlike doc_dup_clusters (golden-parquet oracle), this one
    is checked against a pure-SQL RECURSIVE CTE that computes min-reachable
    labels in DuckDB — a fully independent oracle for the CC operator."""
    from core_ray.stages.cc import connected_components

    pairs = emb_near_dup_pairs(sf_dir)
    return connected_components(pairs, src="vec_id_a", dst="vec_id_b")


EMB_DUP_CLUSTERS_SQL = """
WITH RECURSIVE
p AS (
  SELECT a.vec_id AS u, b.vec_id AS v
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE ROUND(LIST_COSINE_SIMILARITY(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35),
e AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
reach(node, comp) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.u, r.comp FROM e JOIN reach r ON r.node = e.v)
SELECT node, MIN(comp) AS comp FROM reach GROUP BY node
"""


def emb_ann_ivf(sf_dir: str):
    from core_ray.text.similarity import ivf_ann_topk

    _ensure_docs_golden(sf_dir)
    q_ids, _ = _load_queries(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return ivf_ann_topk(ds, q_ids, k=5)


# ------------------------------------------------- extended operators (r2)
# Breadth additions, each the Ray-Data-first shape of a classic relational /
# streaming operator class, all DuckDB-oracle-checked: rolling window (O/W),
# interval join (J), grouped top-k (O2), exact percentiles (A), anti-join
# (J/set-op), histogram binning (A).


def events_rolling_max(sf_dir: str, frame: int = 3):
    """Rolling MAX of ``value`` over the current + 2 preceding events per
    user (ordered by ts, event_id) — the order-sensitive window-function
    shape: partition by key, sort within group, vectorized frame scan.
    MAX (not SUM) keeps the oracle float-exact: it is order-independent."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_part(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "rolling_max": pa.array([], pa.float64()),
                }
            )
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        val = g["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid, eid, v = uid[order], eid[order], val[order]
        out = v.copy()
        same_user = np.zeros(n, dtype=bool)
        same_user[1:] = uid[1:] == uid[:-1]
        run = same_user.copy()  # row s positions where the s-step shift stays in-user
        for s in range(1, frame):
            np.maximum(out[s:], np.where(run[s:], v[:-s], -np.inf), out=out[s:])
            if s + 1 < frame:
                run[s + 1 :] = run[s + 1 :] & same_user[1:-s]
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "rolling_max": pa.array(sql_round_np(out, 2), pa.float64()),
            }
        )

    return map_groups_partitioned(ds, "user_id", per_part)


EVENTS_ROLLING_MAX_SQL = """
SELECT event_id, user_id,
       ROUND(MAX(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS rolling_max
FROM events
"""


# deterministic overlapping windows over the events span (interval join):
# 120 windows, 8h long, stepping 6h across the events month — an event can
# land in up to two windows.
_WIN_START_US = 1704067200000000  # 2024-01-01T00:00:00 in epoch-us
_WIN_STEP_US = 6 * 3600 * 1000 * 1000
_WIN_LEN_US = 8 * 3600 * 1000 * 1000
_N_WINDOWS = 120


def events_window_join(sf_dir: str):
    """Interval (range) join: events ⋈ overlapping time windows, then a
    per-window rollup. The window table is the broadcast small side; the
    match is vectorized comparisons per batch (no shuffle beyond the tiny
    final aggregate)."""
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "events", ["ts", "value"])
    n_cover = -(-_WIN_LEN_US // _WIN_STEP_US)  # windows that can cover one t

    def match(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        val = b["value"].to_numpy(zero_copy_only=False)
        rel = us - _WIN_START_US
        w_hi = rel // _WIN_STEP_US  # latest window starting at/before t
        out_w, out_v = [], []
        for d in range(n_cover):
            w = w_hi - d
            ok = (
                (w >= 0)
                & (w < _N_WINDOWS)
                & (rel < w * _WIN_STEP_US + _WIN_LEN_US)
            )
            if ok.any():
                out_w.append(w[ok])
                out_v.append(val[ok])
        if not out_w:
            return pa.table({"window_id": pa.array([], pa.int64()), "value": pa.array([], pa.float64())})
        return pa.table(
            {
                "window_id": pa.array(np.concatenate(out_w), pa.int64()),
                "value": pa.array(np.concatenate(out_v), pa.float64()),
            }
        )

    agg = (
        ds.map_batches(match, batch_format="pyarrow", batch_size=65536)
        .groupby("window_id")
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "window_id": b["window_id"],
                "n_events": pc.cast(b["n_events"], pa.int64()),
                "sum_value": sql_round(b["sum_value"], 2),
            }
        ),
        batch_format="pyarrow",
    )


EVENTS_WINDOW_JOIN_SQL = f"""
WITH w AS (
  SELECT i AS window_id,
         {_WIN_START_US} + i * {_WIN_STEP_US} AS start_us,
         {_WIN_START_US} + i * {_WIN_STEP_US} + {_WIN_LEN_US} AS end_us
  FROM (SELECT UNNEST(GENERATE_SERIES(0, {_N_WINDOWS - 1})) AS i))
SELECT w.window_id, COUNT(*) AS n_events, ROUND(SUM(e.value), 2) AS sum_value
FROM events e JOIN w ON epoch_us(e.ts) >= w.start_us AND epoch_us(e.ts) < w.end_us
GROUP BY 1
"""


def doc_top2_per_lang(sf_dir: str, per: int = 2):
    """Grouped top-k: the per-batch combiner prunes to k rows per group
    BEFORE the shuffle, so the groupby moves at most k x groups x batches
    rows — never the table."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def prune(b: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            b, sort_keys=[("lang", "ascending"), ("n_chars", "descending"), ("doc_id", "ascending")]
        )
        t = b.take(order)
        langs = np.asarray(t["lang"].to_pylist())
        new = np.ones(len(langs), dtype=bool)
        new[1:] = langs[1:] != langs[:-1]
        grp_start = np.maximum.accumulate(np.where(new, np.arange(len(langs)), 0))
        keep = (np.arange(len(langs)) - grp_start) < per
        return t.filter(pa.array(keep))

    def top_per_lang(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("n_chars", "descending"), ("doc_id", "ascending")]
        )
        return g.take(order[:per])

    return (
        ds.map_batches(prune, batch_format="pyarrow", batch_size=65536)
        .groupby("lang")
        .map_groups(top_per_lang, batch_format="pyarrow")
    )


DOC_TOP2_PER_LANG_SQL = """
SELECT doc_id, lang, n_chars FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) <= 2
"""


# BM25 retrieval: fixed query set (broadcast side), Robertson/Lucene idf.
_BM25_QUERIES: tuple[tuple[int, tuple[str, ...]], ...] = (
    (0, ("table", "scan")),
    (1, ("vector", "stream", "merge")),
    (2, ("customer", "window")),
)
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 5
_BM25_TERMS = tuple(
    dict.fromkeys(t for _, ts in _BM25_QUERIES for t in ts)
)  # unique, first-seen order


def doc_bm25_topk(sf_dir: str):
    """BM25 top-k retrieval — the search-engine scoring op over the corpus:
    a fixed query set (the broadcast side; real deployments broadcast the
    analyzed query batch the same way) ranks documents with the
    Lucene/Robertson BM25 (k1=1.2, b=0.75, idf = ln((N-df+.5)/(df+.5)+1)).

    Two streaming passes: (1) corpus stats — per-batch combiner emits ONE
    row (n_docs, total_len, df per query term); the driver folds these tiny
    partials into N/avgdl/df. (2) scoring — fully vectorized tokenization
    (Arrow split_pattern -> flatten + reduceat over list offsets; no Python
    per row), per-query scores summed in FIXED term order and rounded to 6
    BEFORE ranking (the oracle ranks on the same rounded value, so the
    k-boundary can't disagree on a last-ulp tie), then a per-batch top-k
    combiner prunes to k x queries rows before the only shuffle. The oracle
    mirrors the float pipeline term-by-term as explicit left-to-right
    additions (COALESCE per-term LEFT JOIN columns, not SUM over rows —
    GROUP-BY sum order is nondeterministic in the last ulp; a fixed
    expression tree is not)."""
    from core_ray.collect import collect_table

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    terms = _BM25_TERMS
    nt = len(terms)

    def _tok(b: pa.Table):
        toks = pc.split_pattern(b["text"], " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        offsets = np.zeros(len(dl), dtype=np.int64)
        np.cumsum(dl[:-1], out=offsets[1:])
        return dl, flat, offsets

    def _tf(flat, offsets, dl, term) -> np.ndarray:
        if len(flat) == 0:
            return np.zeros(len(dl), dtype=np.int64)
        eq = pc.equal(flat, term).to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.minimum(offsets, len(eq) - 1)
        tf = np.add.reduceat(eq, idx) if len(idx) else eq[:0]
        tf[dl == 0] = 0  # reduceat repeats the element at empty segments
        return tf

    def stats_part(b: pa.Table) -> pa.Table:
        dl, flat, offsets = _tok(b)
        cols = {
            "n": pa.array([len(dl)], pa.int64()),
            "tl": pa.array([int(dl.sum())], pa.int64()),
        }
        for i, t in enumerate(terms):
            cols[f"df{i}"] = pa.array(
                [int((_tf(flat, offsets, dl, t) > 0).sum())], pa.int64())
        return pa.table(cols)

    st = collect_table(ds.map_batches(stats_part, batch_format="pyarrow",
                                      batch_size=65536))
    n_docs = float(sum(st["n"].to_pylist()))
    avgdl = float(sum(st["tl"].to_pylist())) / n_docs
    df = {
        t: float(sum(st[f"df{i}"].to_pylist())) for i, t in enumerate(terms)
    }
    idf = {
        t: float(np.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0))
        for t in terms
    }
    k1, b_ = _BM25_K1, _BM25_B

    def score_part(b: pa.Table) -> pa.Table:
        dl, flat, offsets = _tok(b)
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        dlf = dl.astype(np.float64)
        tfs = {t: _tf(flat, offsets, dl, t).astype(np.float64) for t in terms}
        out_q, out_d, out_s = [], [], []
        for qid, qterms in _BM25_QUERIES:
            s = np.zeros(len(dl), dtype=np.float64)
            hit = np.zeros(len(dl), dtype=bool)
            for t in qterms:  # fixed term order == the oracle's expression order
                tf = tfs[t]
                s = s + idf[t] * tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b_ + b_ * dlf / avgdl)
                )
                hit |= tf > 0
            s = sql_round_np(s, 6)
            cand = np.nonzero(hit)[0]
            order = cand[np.lexsort((doc_id[cand], -s[cand]))][:_BM25_TOPK]
            out_q.append(np.full(len(order), qid, dtype=np.int32))
            out_d.append(doc_id[order])
            out_s.append(s[order])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), pa.int32()),
                "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
                "score": pa.array(np.concatenate(out_s), pa.float64()),
            }
        )

    def topk(g: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            g, sort_keys=[("score", "descending"), ("doc_id", "ascending")]
        )
        return g.take(order[:_BM25_TOPK])

    return (
        ds.map_batches(score_part, batch_format="pyarrow", batch_size=65536)
        .groupby("query_id")
        .map_groups(topk, batch_format="pyarrow")
    )


def _bm25_sql() -> str:
    k1, b_, k = _BM25_K1, _BM25_B, _BM25_TOPK
    tf_ctes, df_sub = [], {}
    for i, t in enumerate(_BM25_TERMS):
        tf_ctes.append(
            f"tf{i} AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS tf\n"
            f"  FROM toks WHERE tok = '{t}' GROUP BY doc_id)"
        )
        df_sub[t] = f"(SELECT CAST(COUNT(*) AS DOUBLE) FROM tf{i})"
    term_idx = {t: i for i, t in enumerate(_BM25_TERMS)}
    selects = []
    for qid, qterms in _BM25_QUERIES:
        contribs, joins, any_hit = [], [], []
        for t in qterms:
            i = term_idx[t]
            dfi = df_sub[t]
            contribs.append(
                f"COALESCE(LN((s.n - {dfi} + 0.5) / ({dfi} + 0.5) + 1.0)"
                f" * t{i}.tf * {k1 + 1.0} / (t{i}.tf + {k1} *"
                f" (1.0 - {b_} + {b_} * d.dl / s.avgdl)), 0.0)"
            )
            joins.append(f"LEFT JOIN tf{i} t{i} ON t{i}.doc_id = d.doc_id")
            any_hit.append(f"t{i}.doc_id IS NOT NULL")
        selects.append(
            f"SELECT CAST({qid} AS INTEGER) AS query_id, d.doc_id,\n"
            f"  {' + '.join(contribs)} AS score\n"
            f"FROM dl d CROSS JOIN stats s\n" + "\n".join(joins)
            + f"\nWHERE {' OR '.join(any_hit)}"
        )
    union = "\nUNION ALL\n".join(selects)
    tf_cte_block = ",\n".join(tf_ctes)
    return f"""
WITH
toks AS (SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok FROM documents),
dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
       FROM documents),
stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(len(string_split(text, ' '))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS avgdl
          FROM documents),
{tf_cte_block}
SELECT query_id, doc_id, ROUND(score, 6) AS score FROM ({union})
QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
                           ORDER BY ROUND(score, 6) DESC, doc_id) <= {k}
"""


DOC_BM25_TOPK_SQL = _bm25_sql()


def events_value_quantiles(sf_dir: str):
    """Exact per-group percentiles (p50/p90, linear interpolation — the same
    definition as SQL QUANTILE_CONT): groupby + one vectorized np.quantile
    per group; rounded to 6 on both sides.

    Scale note: exact per-group quantiles hold one group's values in one
    task — fine here (5 groups), wrong at 10^12 rows. The documented scale
    path is the mergeable DDSketch-style log-linear histogram
    (stages/sketch.py::approx_group_quantiles — relative-error alpha,
    combiner + one sum_by_u64 shuffle), the quantile sibling of the HLL
    tile sketch and Bloom dedup hatches."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def q(g: pa.Table) -> pa.Table:
        v = g["value"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": pa.array([g["event_type"][0].as_py()], pa.string()),
                "p50": pa.array([float(sql_round_np(np.quantile(v, 0.5), 6))], pa.float64()),
                "p90": pa.array([float(sql_round_np(np.quantile(v, 0.9), 6))], pa.float64()),
            }
        )

    return ds.groupby("event_type").map_groups(q, batch_format="pyarrow")


EVENTS_QUANTILES_SQL = """
SELECT event_type,
       ROUND(QUANTILE_CONT(value, 0.5), 6) AS p50,
       ROUND(QUANTILE_CONT(value, 0.9), 6) AS p90
FROM events GROUP BY 1
"""


def doc_quality_buckets(sf_dir: str):
    """CCNet-style corpus partitioning: documents split into head / middle /
    tail terciles of a quality signal (n_chars) by GLOBAL quantile
    thresholds. Scale shape: the quantiles come from a distributed
    value->count histogram (count_by_u64 — distinct signal values, not
    rows, reach the driver), the two scalar thresholds broadcast into a
    stateless assignment map. Threshold floats are interpolated once on the
    driver; ulp differences vs the SQL QUANTILE_CONT cannot flip a bucket
    because an interpolated threshold either IS an exact integer (frac 0)
    or lies strictly between two adjacent integer signal values."""
    import ray
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    hist = count_by_u64(
        ds.map_batches(
            lambda b: pa.table(
                {"key": pc.cast(b["n_chars"], pa.uint64())}
            ),
            batch_format="pyarrow",
            batch_size=65536,
        ),
        "key",
    )
    from core_ray.stages.agg import histogram_quantile_cont

    h = _collect_table(hist)
    vals = h["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnts = h["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    t1 = histogram_quantile_cont(vals, cnts, 1.0 / 3.0)
    t2 = histogram_quantile_cont(vals, cnts, 2.0 / 3.0)

    def assign(b: pa.Table) -> pa.Table:
        c = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        bucket = np.where(c <= t1, "tail", np.where(c <= t2, "middle", "head"))
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_chars": pc.cast(b["n_chars"], pa.int64()),
                "bucket": pa.array(bucket, pa.string()),
            }
        )

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=65536)


DOC_QUALITY_BUCKETS_SQL = """
WITH t AS (
  SELECT QUANTILE_CONT(n_chars, 1.0 / 3.0) AS t1,
         QUANTILE_CONT(n_chars, 2.0 / 3.0) AS t2
  FROM documents)
SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
       CASE WHEN n_chars <= t1 THEN 'tail'
            WHEN n_chars <= t2 THEN 'middle'
            ELSE 'head' END AS bucket
FROM documents, t
"""


_IVB_BASE_US = int(np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64))
_IVB_N = 50
_IVB_STEP_H = 12
_IVB_BUCKET_US = 12 * 3600 * 1_000_000


def _ivb_intervals() -> pa.Table:
    i = np.arange(_IVB_N, dtype=np.int64)
    lo = _IVB_BASE_US + i * (_IVB_STEP_H * 3600 * 1_000_000)
    length = (2 + (i % 5) * 6) * 3600 * 1_000_000  # 2h..26h, overlapping
    return pa.table(
        {
            "interval_id": pa.array(i, pa.int64()),
            "lo": pa.array(lo, pa.int64()),
            "hi": pa.array(lo + length, pa.int64()),
        }
    )


def events_interval_agg(sf_dir: str):
    """Arbitrary-interval range join on the BUCKETED scale path
    (stages/interval.py::interval_join_bucketed — points map to one time
    bucket, intervals replicate per overlapped bucket, one all-to-all,
    vectorized per-partition match): 50 fixed OVERLAPPING windows of
    varying length over the events month, then an exact integer-cents
    rollup per window. The broadcast path would also work here (50
    intervals); the query pins the bucketed machinery under the driver
    hash — same-output equivalence between the two paths is unit-tested in
    tests/test_interval.py."""
    from ray.data.aggregate import Sum

    from core_ray.stages.interval import interval_join_bucketed

    def prep(b: pa.Table) -> pa.Table:
        ts = (
            b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        )
        cents = sql_round_np(
            b["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table(
            {"p": pa.array(ts, pa.int64()), "cents": pa.array(cents, pa.int64())}
        )

    pts = _read(sf_dir, "events", ["ts", "value"]).map_batches(
        prep, batch_format="pyarrow", batch_size=131072
    )
    j = interval_join_bucketed(
        pts, _ivb_intervals(), point_col="p", id_col="interval_id",
        lo_col="lo", hi_col="hi", bucket_width=_IVB_BUCKET_US,
    )

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "interval_id": b["interval_id"],
                "n": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
                "cents": b["cents"],
            }
        )
        return pa.TableGroupBy(t, ["interval_id"]).aggregate([("n", "sum"), ("cents", "sum")])

    agg = (
        j.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("interval_id")
        .aggregate(Sum("n_sum", alias_name="n_events"), Sum("cents_sum", alias_name="c"))
    )
    t = _collect_table(agg)
    return pa.table(
        {
            "interval_id": pc.cast(t["interval_id"], pa.int64()),
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "value_sum": pa.array(
                sql_round_np(t["c"].to_numpy(zero_copy_only=False) / 100.0, 2),
                pa.float64(),
            ),
        }
    )


EVENTS_INTERVAL_AGG_SQL = f"""
WITH iv AS (
  SELECT i AS interval_id,
         TIMESTAMP '2024-01-01' + INTERVAL (i * {_IVB_STEP_H}) HOUR AS lo,
         TIMESTAMP '2024-01-01' + INTERVAL (i * {_IVB_STEP_H}) HOUR
           + INTERVAL (2 + (i % 5) * 6) HOUR AS hi
  FROM (SELECT UNNEST(generate_series(0, {_IVB_N - 1})) AS i))
SELECT iv.interval_id, CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(CAST(ROUND(e.value * 100.0) AS BIGINT)) / 100.0, 2) AS value_sum
FROM iv JOIN events e ON e.ts >= iv.lo AND e.ts < iv.hi
GROUP BY 1
"""


_WEIGHTS = (("click", 3), ("error", 1), ("purchase", 7), ("signup", 2), ("view", 5))


def events_weighted_salted(sf_dir: str):
    """Skew-salted equi-join under the driver hash: the events fact joins a
    tiny type->weight dim on the SKEWED string key through
    stages/join.py::hash_join with ``salt_keys`` splitting the hottest key
    across 8 salted partitions (build rows replicate into each). On a real
    zipf key this is what keeps one partition from serializing the join;
    here it pins the salted machinery end-to-end (salted == unsalted
    multiset is also unit-tested). Weighted sum in exact integer cents."""
    import ray.data
    from ray.data.aggregate import Sum

    from core_ray.stages.join import hash_join

    def prep(b: pa.Table) -> pa.Table:
        cents = sql_round_np(
            b["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        return pa.table(
            {"event_type": b["event_type"], "cents": pa.array(cents, pa.int64())}
        )

    fact = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
        prep, batch_format="pyarrow", batch_size=131072
    )
    dim = ray.data.from_arrow(
        pa.table(
            {
                "event_type": pa.array([w[0] for w in _WEIGHTS], pa.string()),
                "weight": pa.array([w[1] for w in _WEIGHTS], pa.int64()),
            }
        )
    )
    j = hash_join(fact, dim, on="event_type", salt_keys={"click": 8})

    def partial(b: pa.Table) -> pa.Table:
        w = b["weight"].to_numpy(zero_copy_only=False)
        c = b["cents"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "event_type": b["event_type"],
                "n": pa.array(np.ones(b.num_rows, np.int64), pa.int64()),
                "wc": pa.array(w * c, pa.int64()),
            }
        )
        return pa.TableGroupBy(t, ["event_type"]).aggregate([("n", "sum"), ("wc", "sum")])

    agg = (
        j.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("event_type")
        .aggregate(Sum("n_sum", alias_name="n_events"), Sum("wc_sum", alias_name="wc"))
    )
    t = _collect_table(agg)
    return pa.table(
        {
            "event_type": t["event_type"],
            "n_events": pc.cast(t["n_events"], pa.int64()),
            "weighted_sum": pa.array(
                sql_round_np(t["wc"].to_numpy(zero_copy_only=False) / 100.0, 2),
                pa.float64(),
            ),
        }
    ).sort_by("event_type")


EVENTS_WEIGHTED_SALTED_SQL = f"""
WITH dim(event_type, weight) AS (VALUES {", ".join(f"('{k}', {v})" for k, v in _WEIGHTS)})
SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(SUM(d.weight * CAST(ROUND(e.value * 100.0) AS BIGINT)) / 100.0, 2)
         AS weighted_sum
FROM events e JOIN dim d USING (event_type)
GROUP BY 1 ORDER BY 1
"""


def events_value_percentile(sf_dir: str):
    """GLOBAL order statistics without a global sort: every event's
    PERCENT_RANK among ALL events. A window function over the whole corpus
    would need one total-order sort; instead a value->count histogram
    (count_by_u64 over integer cents — distinct values, not rows, leave
    the workers) yields cumulative counts-below, which broadcast back as a
    sorted lookup so each row computes cnt_less / (N-1) locally — exact,
    two passes, no all-to-all over rows. The division uses the same
    integers as SQL's (rank-1)/(N-1), so the doubles are bit-identical."""
    import ray
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["event_id", "value"])

    def cents_of(b: pa.Table) -> np.ndarray:
        return sql_round_np(
            b["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)

    hist = count_by_u64(
        ds.map_batches(
            lambda b: pa.table({"key": pa.array(cents_of(b).astype(np.uint64), pa.uint64())}),
            batch_format="pyarrow",
            batch_size=131072,
        ),
        "key",
    )
    h = _collect_table(hist)
    vals = h["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnts = h["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(vals, kind="stable")
    vals, cnts = vals[order], cnts[order]
    below = np.concatenate([[0], np.cumsum(cnts)[:-1]])
    n_total = int(cnts.sum())
    ref = ray.put((vals, below))

    def rank(b: pa.Table, ref=ref) -> pa.Table:
        vs, bl = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        c = cents_of(b)
        pos = np.searchsorted(vs, c)  # every value exists in the histogram
        # SQL PERCENT_RANK of a single-row table is 0, not 0/0
        pr = bl[pos].astype(np.float64) / float(max(n_total - 1, 1))
        return pa.table(
            {
                "event_id": b["event_id"],
                "value_cents": pa.array(c, pa.int64()),
                "pct_rank": pa.array(sql_round_np(pr, 6), pa.float64()),
            }
        )

    return ds.map_batches(rank, batch_format="pyarrow", batch_size=131072)


def events_value_mad(sf_dir: str):
    """Robust statistics: the median absolute deviation of event values —
    TWO chained GLOBAL order statistics, each computed as a distributed
    value->count histogram (count_by_u64) + driver-side QUANTILE_CONT
    interpolation, with the median broadcast into the second pass's
    deviation map. Everything stays integer until the final /2 divisions:
    cents, then |2*cents - 2*median| (2x units absorb the .5-interpolated
    median exactly), so the SQL mirror has no float-summation hazard."""
    from core_ray.stages.agg import count_by_u64, histogram_quantile_cont

    ds = _read(sf_dir, "events", ["value"])

    def cents_of(b: pa.Table) -> np.ndarray:
        return sql_round_np(
            b["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)

    def hist_of(fn) -> tuple[np.ndarray, np.ndarray]:
        h = _collect_table(
            count_by_u64(
                ds.map_batches(
                    lambda b: pa.table(
                        {"key": pa.array(fn(b).astype(np.uint64), pa.uint64())}
                    ),
                    batch_format="pyarrow",
                    batch_size=131072,
                ),
                "key",
            )
        )
        return (
            h["key"].to_numpy(zero_copy_only=False).astype(np.int64),
            h["cnt"].to_numpy(zero_copy_only=False).astype(np.int64),
        )

    vals, cnts = hist_of(cents_of)
    med2 = int(round(2.0 * histogram_quantile_cont(vals, cnts, 0.5)))
    dvals, dcnts = hist_of(lambda b: np.abs(2 * cents_of(b) - med2))
    mad2 = histogram_quantile_cont(dvals, dcnts, 0.5)
    return pa.table(
        {
            "median": pa.array([float(sql_round_np(med2 / 2.0 / 100.0, 6))], pa.float64()),
            "mad": pa.array([float(sql_round_np(mad2 / 2.0 / 100.0, 6))], pa.float64()),
        }
    )


EVENTS_VALUE_MAD_SQL = """
WITH c AS (SELECT CAST(ROUND(value * 100.0) AS BIGINT) AS cents FROM events),
m AS (SELECT CAST(ROUND(2.0 * QUANTILE_CONT(cents, 0.5)) AS BIGINT) AS med2 FROM c),
d AS (SELECT ABS(2 * c.cents - m.med2) AS dev2 FROM c, m)
SELECT ROUND((SELECT med2 FROM m) / 2.0 / 100.0, 6) AS median,
       ROUND(QUANTILE_CONT(dev2, 0.5) / 2.0 / 100.0, 6) AS mad
FROM d
"""


EVENTS_VALUE_PERCENTILE_SQL = """
SELECT event_id,
       CAST(ROUND(value * 100.0) AS BIGINT) AS value_cents,
       ROUND(PERCENT_RANK() OVER (ORDER BY CAST(ROUND(value * 100.0) AS BIGINT)), 6)
         AS pct_rank
FROM events
"""


_NO_ORDERS_CUTOFF = datetime(2000, 6, 1)


def cust_no_orders(sf_dir: str):
    """Anti-join: customers with NO order since the cutoff. The order-key
    side is filtered + reduced DISTRIBUTEDLY to its distinct custkeys
    (per-batch np.unique combiner), broadcast sorted, and the probe is a
    vectorized np.isin — the same broadcast-semi-join shape as q3, negated."""
    import ray

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def recent_keys(b: pa.Table) -> pa.Table:
        b = b.filter(pc.greater_equal(b["o_orderdate"], pa.scalar(_NO_ORDERS_CUTOFF)))
        return pa.table(
            {"o_custkey": pa.array(np.unique(b["o_custkey"].to_numpy(zero_copy_only=False)))}
        )

    okeys = np.unique(
        _collect_numpy(
            orders.map_batches(recent_keys, batch_format="pyarrow", batch_size=131072),
            "o_custkey",
        )
    )
    ref = ray.put(okeys)

    def anti(b: pa.Table, ref=ref) -> pa.Table:
        keys = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        m = np.isin(b["c_custkey"].to_numpy(zero_copy_only=False), keys)
        return b.filter(pa.array(~m))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    return cust.map_batches(anti, batch_format="pyarrow", batch_size=65536)


CUST_NO_ORDERS_SQL = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-06-01')
"""


def orders_cust_join(sf_dir: str):
    """Large-large equi-join through the generic hash-partitioned join
    operator (stages/join.py): orders ⋈ customer on custkey — NEITHER side
    broadcast — then a per-segment rollup. This drives hash_join itself
    through the driver's oracle gate."""
    from ray.data.aggregate import Count, Sum

    def to_cents(b: pa.Table) -> pa.Table:
        # exact integer cents: a float SUM at ~1e9 magnitude rounds
        # differently depending on accumulation order (Ray partials vs SQL)
        v = b["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "custkey": b["o_custkey"],
                "cents": pa.array(sql_round_np(v * 100.0, 0).astype(np.int64), pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        to_cents, batch_format="pyarrow"
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: pa.table({"custkey": b["c_custkey"], "c_mktsegment": b["c_mktsegment"]}),
        batch_format="pyarrow",
    )
    from core_ray.stages.join import hash_join

    joined = hash_join(orders, cust, on="custkey")
    agg = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("cents", alias_name="total_cents")
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "c_mktsegment": b["c_mktsegment"],
                "n_orders": pc.cast(b["n_orders"], pa.int64()),
                "total": pc.divide(pc.cast(b["total_cents"], pa.float64()), 100.0),
            }
        ),
        batch_format="pyarrow",
    )


ORDERS_CUST_JOIN_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) / 100.0 AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
"""


def events_value_histogram(sf_dir: str, bin_width: float = 10.0):
    """Fixed-width histogram: per-batch vectorized binning + combiner, one
    tiny final groupby (identical FLOOR(value/width) arithmetic in SQL)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["value"])

    def binit(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        bins = np.floor(v / bin_width).astype(np.int64)
        u, c = np.unique(bins, return_counts=True)
        return pa.table(
            {"bin": pa.array(u, pa.int64()), "n": pa.array(c.astype(np.int64), pa.int64())}
        )

    agg = (
        ds.map_batches(binit, batch_format="pyarrow", batch_size=131072)
        .groupby("bin")
        .aggregate(Sum("n", alias_name="n"))
    )
    return agg.map_batches(
        lambda b: pa.table({"bin": b["bin"], "n": pc.cast(b["n"], pa.int64())}),
        batch_format="pyarrow",
    )


EVENTS_HISTOGRAM_SQL = """
SELECT CAST(FLOOR(value / 10.0) AS BIGINT) AS bin, COUNT(*) AS n
FROM events GROUP BY 1
"""


def events_props_stats(sf_dir: str):
    """Semi-structured extraction (JSON properties column): pull the integer
    field 'k' out of props per event — ONE vectorized extract_regex kernel
    per batch with an exact json.loads fallback (text/jsonops.py) — then a
    tiny per-type rollup. Mirrors DuckDB json_extract semantics."""
    from ray.data.aggregate import Count, Sum

    from core_ray.text.jsonops import json_field_int64

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def extract(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": b["event_type"],
                "k": json_field_int64(b["props"], "k"),
            }
        )

    agg = (
        ds.map_batches(extract, batch_format="pyarrow", batch_size=65536)
        .groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("k", alias_name="sum_k"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "event_type": b["event_type"],
                "n": pc.cast(b["n"], pa.int64()),
                "sum_k": pc.cast(b["sum_k"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


EVENTS_PROPS_SQL = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY 1
"""


_HOP_US = 30 * 60 * 1000 * 1000  # 30-minute hop
_WIN_HOPS = 2  # 1-hour windows -> each event lands in exactly 2 hops


def events_hopping(sf_dir: str):
    """Hopping (sliding) window aggregate — 1 h windows every 30 min, the
    OVERLAPPING sibling of events_hourly's tumbling windows: each event is
    fanned to its 2 covering window starts inside the batch combiner (pure
    integer arithmetic mirrored in SQL), value summed as exact integer
    cents, then one small groupby over ~2x-hourly keys."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "value"])

    def combine(b: pa.Table) -> pa.Table:
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        cents = sql_round_np(
            b["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        base = us - us % _HOP_US
        ws = np.concatenate([base - h * _HOP_US for h in range(_WIN_HOPS)])
        cc = np.tile(cents, _WIN_HOPS)
        order = np.argsort(ws, kind="stable")
        w_o, c_o = ws[order], cc[order]
        new = np.ones(len(w_o), dtype=bool)
        if len(w_o):
            new[1:] = w_o[1:] != w_o[:-1]
        starts = np.nonzero(new)[0]
        return pa.table(
            {
                "window_start": pa.array(
                    w_o[starts].astype("datetime64[us]"), pa.timestamp("us")
                ),
                "n": pa.array(np.diff(np.append(starts, len(w_o))).astype(np.int64), pa.int64()),
                "cents": pa.array(np.add.reduceat(c_o, starts), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(combine, batch_format="pyarrow", batch_size=131072)
        .groupby("window_start")
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                # Ray's groupby re-infers the key as timestamp[s]; the oracle
                # (DuckDB TIMESTAMP) is [us] and the driver hash is
                # type-sensitive -> cast back explicitly
                "window_start": pc.cast(b["window_start"], pa.timestamp("us")),
                "n": pc.cast(b["n"], pa.int64()),
                "sum_value": pc.divide(pc.cast(b["cents"], pa.float64()), 100.0),
            }
        ),
        batch_format="pyarrow",
    )


EVENTS_HOPPING_SQL = """
WITH hops AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS h,
         CAST(ROUND(value * 100.0) AS BIGINT) AS cents
  FROM events
), w AS (
  SELECT h AS window_start, cents FROM hops
  UNION ALL
  SELECT h - INTERVAL '30 minutes' AS window_start, cents FROM hops
)
SELECT window_start, COUNT(*) AS n, SUM(cents) / 100.0 AS sum_value
FROM w GROUP BY 1
"""


def events_rollup(sf_dir: str):
    """GROUPING SETS / ROLLUP(event_type, hour-of-day): the hierarchical
    re-aggregation shape — the FINEST level is computed distributed once
    (per-batch combiner over ~120 keys), the coarser levels derive from
    that small result by re-aggregation (never a second corpus scan), with
    SQL ROLLUP's NULL group markers."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def combine(b: pa.Table) -> pa.Table:
        us = b["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        hod = (us // _HOUR_US) % 24
        et = np.asarray(b["event_type"].to_pylist())
        order = np.lexsort((hod, et))
        e_o, h_o = et[order], hod[order]
        new = np.ones(len(e_o), dtype=bool)
        if len(e_o):
            new[1:] = (e_o[1:] != e_o[:-1]) | (h_o[1:] != h_o[:-1])
        starts = np.nonzero(new)[0]
        return pa.table(
            {
                "event_type": pa.array(e_o[starts], pa.string()),
                "hod": pa.array(h_o[starts].astype(np.int64), pa.int64()),
                "n": pa.array(np.diff(np.append(starts, len(e_o))).astype(np.int64), pa.int64()),
            }
        )

    fine = (
        ds.map_batches(combine, batch_format="pyarrow", batch_size=131072)
        .groupby(["event_type", "hod"])
        .aggregate(Sum("n", alias_name="n"))
    )
    t = _collect_table(fine)  # ~#types x 24 rows — the rollup input is tiny
    et = np.asarray(t["event_type"].to_pylist())
    hod = t["hod"].to_numpy(zero_copy_only=False)
    n = t["n"].to_numpy(zero_copy_only=False)
    rows_e, rows_h, rows_n = list(et), [int(x) for x in hod], [int(x) for x in n]
    for e in np.unique(et):  # level 1: per event_type
        rows_e.append(str(e))
        rows_h.append(None)
        rows_n.append(int(n[et == e].sum()))
    rows_e.append(None)  # level 0: grand total
    rows_h.append(None)
    rows_n.append(int(n.sum()))
    return pa.table(
        {
            "event_type": pa.array(rows_e, pa.string()),
            "hod": pa.array(rows_h, pa.int64()),
            "n": pa.array(rows_n, pa.int64()),
        }
    )


EVENTS_ROLLUP_SQL = """
SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod, COUNT(*) AS n
FROM events GROUP BY ROLLUP(event_type, hod)
"""


def doc_vocab_top20(sf_dir: str, k: int = 20):
    """Global token-frequency top-k (the corpus-vocabulary operator a
    training-data pipeline needs): per-batch token counts (one np.unique per
    batch — the combiner), hash-partitioned by token so each partition's
    sums are GLOBAL for its tokens, per-partition top-k prune (safe because
    of that co-location), tiny final sort+limit. Tie-break (n desc, token
    asc) mirrored in SQL."""
    from core_ray.stages.agg import _GOLD, _n_parts, hash_strings

    ds = _read(sf_dir, "documents", ["text"])
    n_parts = _n_parts()

    def count_tokens(b: pa.Table) -> pa.Table:
        toks = np.asarray(
            [w for t in b["text"].to_pylist() for w in t.split()]
        )
        if len(toks) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "n": pa.array([], pa.int64()),
                 "__part": pa.array([], pa.int32())}
            )
        u, c = np.unique(toks, return_counts=True)
        h = hash_strings(pa.array(u, pa.string()))
        part = ((h * _GOLD) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                "token": pa.array(u, pa.string()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def reduce_part(g: pa.Table) -> pa.Table:
        toks = np.asarray(g["token"].to_pylist())
        cnts = g["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(toks, kind="stable")
        ts, cs = toks[order], cnts[order]
        new = np.ones(len(ts), dtype=bool)
        new[1:] = ts[1:] != ts[:-1]
        starts = np.nonzero(new)[0]
        u = ts[starts]
        sums = np.add.reduceat(cs, starts)
        # per-partition top-k prune: these sums are global for these tokens
        top = np.lexsort((u, -sums))[:k]
        return pa.table(
            {
                "token": pa.array(u[top], pa.string()),
                "n": pa.array(sums[top].astype(np.int64), pa.int64()),
            }
        )

    pruned = (
        ds.map_batches(count_tokens, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )
    return pruned.sort(["n", "token"], descending=[True, False]).limit(k)


DOC_VOCAB_SQL = """
WITH toks AS (
  SELECT UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents WHERE trim(text) <> ''
)
SELECT token, COUNT(*) AS n FROM toks WHERE token <> ''
GROUP BY 1 ORDER BY n DESC, token LIMIT 20
"""


def events_funnel(sf_dir: str, stages=("view", "click", "purchase")):
    """Ordered sequence-pattern match (the funnel / MATCH_RECOGNIZE-lite
    operator class): per user, stage k+1 counts only if an event of that
    type occurs STRICTLY AFTER the user's earliest qualifying stage-k event.
    Shape: one hash-partition shuffle by user, then a fully vectorized
    per-partition pass (sorted segments + masked reduceat per stage — no
    Python per user); stage totals via a 3-key final groupby."""
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    stage_names = [">".join(stages[: k + 1]) for k in range(len(stages))]

    def funnel_partition(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {"stage": pa.array([], pa.string()), "n_users": pa.array([], pa.int64())}
            )
        user = g["user_id"].to_numpy(zero_copy_only=False)
        ts = g["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        etype = np.asarray(g["event_type"].to_pylist())
        order = np.lexsort((ts, user))
        user, ts, etype = user[order], ts[order], etype[order]
        new = np.ones(n, dtype=bool)
        new[1:] = user[1:] != user[:-1]
        starts = np.nonzero(new)[0]
        uidx = np.cumsum(new) - 1  # per-row user segment index
        n_users = len(starts)
        big = np.int64(np.iinfo(np.int64).max)
        # stage-0 threshold: strictly after -inf — int64 min, NOT -1 (an
        # event before 1970 has a negative epoch-us and must still qualify)
        prev = np.full(n_users, np.iinfo(np.int64).min)
        counts = []
        for k, st in enumerate(stages):
            # earliest event of this type strictly after the user's previous
            # stage time: masked min via reduceat over the sorted segments
            x = np.where((etype == st) & (ts > prev[uidx]), ts, big)
            cur = np.minimum.reduceat(x, starts)
            counts.append(int((cur < big).sum()))
            prev = cur
        return pa.table(
            {
                "stage": pa.array(stage_names, pa.string()),
                "n_users": pa.array(counts, pa.int64()),
            }
        )

    partial = map_groups_partitioned(ds, "user_id", funnel_partition)
    agg = partial.groupby("stage").aggregate(Sum("n_users", alias_name="n_users"))
    return agg.map_batches(
        lambda b: pa.table(
            {"stage": b["stage"], "n_users": pc.cast(b["n_users"], pa.int64())}
        ),
        batch_format="pyarrow",
    )


EVENTS_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
  WHERE e.event_type = 'click' GROUP BY 1
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT 'view' AS stage, COUNT(*) AS n_users FROM v
UNION ALL SELECT 'view>click', COUNT(*) FROM c
UNION ALL SELECT 'view>click>purchase', COUNT(*) FROM p
"""


_Q10_BROADCAST_MAX_BYTES = 256 * 1024 * 1024  # tests force the shuffle path by 0


def q10_returned_revenue(sf_dir: str, k: int = 20):
    """TPC-H q10 shape: revenue of RETURNED items per customer, top-k.
    Plan: pruned+filtered lineitem scan (returnflag pushed into the read) ->
    hash-partitioned equi-join against the orders key map (NEITHER fact side
    broadcast) -> exact integer-cents partitioned sum by custkey
    (agg.sum_by_u64) -> tiny sort+limit; customer names
    attached from the small dimension driver-side (same <256 MB guard
    discipline as q3/q5)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray.data

    from core_ray.stages.agg import sum_by_u64
    from core_ray.stages.join import hash_join

    li = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pads.field("l_returnflag") == "R",
    ).map_batches(
        # exact integer cents (see orders_cust_join): float SUMs at this
        # magnitude depend on accumulation order; int64 sums do not
        lambda b: pa.table(
            {
                "okey": b["l_orderkey"],
                "cents": pa.array(
                    sql_round_np(
                        b["l_extendedprice"].to_numpy(zero_copy_only=False)
                        * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
                        * 100.0,
                        0,
                    ).astype(np.int64),
                    pa.int64(),
                ),
            }
        ),
        batch_format="pyarrow",
    )
    # ADAPTIVE join strategy (the broadcast-vs-shuffle selector, same guard
    # discipline as q3's customer side): below the size guard the orders key
    # map broadcasts as sorted parallel arrays and the probe is a vectorized
    # searchsorted — two fewer all-to-alls; above it, the fully-distributed
    # hash-partitioned equi-join. Output identical either way.
    import ray

    orders_path = _p(sf_dir, "orders")
    if os.path.getsize(orders_path) < _Q10_BROADCAST_MAX_BYTES:
        ot = pq.read_table(orders_path, columns=["o_orderkey", "o_custkey"])
        ok = ot["o_orderkey"].to_numpy(zero_copy_only=False)
        oc = ot["o_custkey"].to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="stable")
        ref = ray.put((ok[order], oc[order]))

        def map_cust(b: pa.Table, ref=ref) -> pa.Table:
            okeys, ocust = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            keys = b["okey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(okeys, keys)
            pos = np.minimum(pos, len(okeys) - 1)
            hit = okeys[pos] == keys
            t = pa.table(
                {
                    "key": pa.array(ocust[pos].astype(np.uint64), pa.uint64()),
                    "cents": b["cents"],
                }
            )
            return t.filter(pa.array(hit))

        keyed = li.map_batches(map_cust, batch_format="pyarrow", batch_size=65536)
    else:
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
            lambda b: pa.table({"okey": b["o_orderkey"], "o_custkey": b["o_custkey"]}),
            batch_format="pyarrow",
        )
        keyed = hash_join(li, orders, on="okey").map_batches(
            lambda b: pa.table(
                {"key": pc.cast(b["o_custkey"], pa.uint64()), "cents": b["cents"]}
            ),
            batch_format="pyarrow",
        )
    sums = sum_by_u64(keyed, "key", "cents")
    top = _collect_table(
        sums.sort(["cnt", "key"], descending=[True, False]).limit(k)
    )
    ckeys = top["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    ct = pq.read_table(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    name_of = dict(zip(ct["c_custkey"].to_pylist(), ct["c_name"].to_pylist()))
    return pa.table(
        {
            "c_custkey": pa.array(ckeys, pa.int64()),
            "c_name": pa.array([name_of[int(c)] for c in ckeys], pa.string()),
            "revenue": pa.array(
                top["cnt"].to_numpy(zero_copy_only=False).astype(np.float64) / 100.0,
                pa.float64(),
            ),
        }
    )


Q10_SQL = """
SELECT c_custkey, c_name,
       SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount) * 100.0) AS BIGINT)) / 100.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE l_returnflag = 'R'
GROUP BY 1, 2
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ========================================================== relational wave 2
# TPC-H-shape breadth: EXISTS semi-join (q4), multi-predicate pruned scalar
# scan (q6), conditional aggregation after a join (q12), group-HAVING +
# join + top-k (q18). Each exercises a distinct plan shape over the same
# fact tables; all money/quantity aggregates use exact integer arithmetic
# (the q10 cents discipline) so hashes match the oracle bit-for-bit.

_Q4_LO = datetime(1996, 1, 1)
_Q4_HI = datetime(1996, 7, 1)


def q4_priority_semi(sf_dir: str):
    """TPC-H q4 shape: orders per priority with >=1 high-quantity lineitem
    (EXISTS semi-join). Plan: both predicates pushed into the parquet reads;
    distinct qualifying orderkeys via the count_by_u64 combiner (per-batch
    np.unique -> ONE hash partition -> reduceat); hash-partitioned semi-join
    (neither fact side broadcast — the qualifying-key set is a large
    fraction of all orders at any scale); 5-key final count."""
    import pyarrow.dataset as pads
    import ray.data
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import count_by_u64
    from core_ray.stages.join import hash_join

    li = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey"],
        filter=pads.field("l_quantity") > 45.0,
    ).map_batches(
        lambda b: pa.table({"key": pc.cast(b["l_orderkey"], pa.uint64())}),
        batch_format="pyarrow",
    )
    # distinct keys (count_by_u64's keys are unique by construction)
    keys = count_by_u64(li, "key").map_batches(
        lambda b: pa.table({"okey": pc.cast(b["key"], pa.int64())}),
        batch_format="pyarrow",
    )
    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_orderpriority"],
        filter=(pads.field("o_orderdate") >= _Q4_LO) & (pads.field("o_orderdate") < _Q4_HI),
    ).map_batches(
        lambda b: pa.table({"okey": b["o_orderkey"], "o_orderpriority": b["o_orderpriority"]}),
        batch_format="pyarrow",
    )
    j = hash_join(orders, keys, on="okey")

    def partial(b: pa.Table) -> pa.Table:
        return pa.TableGroupBy(b.select(["o_orderpriority"]), "o_orderpriority").aggregate(
            [([], "count_all")]
        )

    agg = (
        j.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("o_orderpriority")
        .aggregate(Sum("count_all", alias_name="order_count"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "o_orderpriority": b["o_orderpriority"],
                "order_count": pc.cast(b["order_count"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-07-01'
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45.0)
GROUP BY 1
"""


def q6_forecast_revenue(sf_dir: str):
    """TPC-H q6 shape: multi-predicate pruned scan + single-row scalar
    aggregate. Every predicate rides the parquet read (row-group pruning);
    only 2 columns are decoded; the per-batch combiner emits ONE partial row
    per batch and the tiny partial table is summed on the driver — revenue
    in exact integer 10^-4 units so the sum is accumulation-order-free."""
    import pyarrow.dataset as pads
    import ray.data

    f = (
        (pads.field("l_shipdate") >= datetime(1996, 1, 1))
        & (pads.field("l_shipdate") < datetime(1997, 1, 1))
        & (pads.field("l_discount") >= 0.03)
        & (pads.field("l_discount") <= 0.07)
        & (pads.field("l_quantity") < 24.0)
    )
    ds = ray.data.read_parquet(
        _p(sf_dir, "lineitem"), columns=["l_extendedprice", "l_discount"], filter=f
    )

    def partial(b: pa.Table) -> pa.Table:
        units = sql_round_np(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * b["l_discount"].to_numpy(zero_copy_only=False)
            * 10000.0,
            0,
        ).astype(np.int64)
        return pa.table(
            {
                "c": pa.array([int(units.sum())], pa.int64()),
                "n": pa.array([len(units)], pa.int64()),
            }
        )

    parts = _collect_table(ds.map_batches(partial, batch_format="pyarrow", batch_size=131072))
    c = int(pc.sum(parts["c"]).as_py() or 0)
    n = int(pc.sum(parts["n"]).as_py() or 0)
    return pa.table(
        {
            "revenue": pa.array([c / 10000.0], pa.float64()),
            "n_items": pa.array([n], pa.int64()),
        }
    )


Q6_SQL = """
SELECT SUM(CAST(ROUND(l_extendedprice * l_discount * 10000.0) AS BIGINT)) / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 24.0
"""


_Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_priority_class(sf_dir: str):
    """TPC-H q12 shape: conditional aggregation (CASE WHEN) after an
    equi-join. The ship-year filter rides the read; the orders side joins
    adaptively (q10 discipline): below the size guard it broadcasts as a
    sorted (okey -> is_high) bitmap probed with searchsorted, above it the
    fully-distributed hash join. Per-batch combiner folds to <=2 rows before
    the final 2-key groupby."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from core_ray.stages.join import hash_join

    li = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linestatus"],
        filter=(pads.field("l_shipdate") >= datetime(1997, 1, 1))
        & (pads.field("l_shipdate") < datetime(1998, 1, 1)),
    )

    orders_path = _p(sf_dir, "orders")
    if os.path.getsize(orders_path) < _Q10_BROADCAST_MAX_BYTES:
        ot = pq.read_table(orders_path, columns=["o_orderkey", "o_orderpriority"])
        ok = ot["o_orderkey"].to_numpy(zero_copy_only=False)
        hi = pc.is_in(ot["o_orderpriority"], value_set=pa.array(_Q12_HIGH)).to_numpy(
            zero_copy_only=False
        )
        order = np.argsort(ok, kind="stable")
        ref = ray.put((ok[order], hi[order]))

        def attach(b: pa.Table, ref=ref) -> pa.Table:
            okeys, ishigh = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            keys = b["l_orderkey"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(okeys, keys)
            pos = np.minimum(pos, len(okeys) - 1)
            hit = okeys[pos] == keys
            t = pa.table(
                {
                    "l_linestatus": b["l_linestatus"],
                    "high": pa.array(ishigh[pos].astype(np.int64), pa.int64()),
                }
            )
            return t.filter(pa.array(hit))

        joined = li.map_batches(attach, batch_format="pyarrow", batch_size=65536)
    else:
        li2 = li.map_batches(
            lambda b: pa.table({"okey": b["l_orderkey"], "l_linestatus": b["l_linestatus"]}),
            batch_format="pyarrow",
        )
        om = ray.data.read_parquet(
            orders_path, columns=["o_orderkey", "o_orderpriority"]
        ).map_batches(
            lambda b: pa.table(
                {
                    "okey": b["o_orderkey"],
                    "high": pc.cast(
                        pc.is_in(b["o_orderpriority"], value_set=pa.array(_Q12_HIGH)),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(li2, om, on="okey").select_columns(["l_linestatus", "high"])

    def partial(b: pa.Table) -> pa.Table:
        lo = pc.subtract(1, b["high"])
        t = pa.table({"l_linestatus": b["l_linestatus"], "high": b["high"], "low": lo})
        return pa.TableGroupBy(t, "l_linestatus").aggregate([("high", "sum"), ("low", "sum")])

    agg = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("l_linestatus")
        .aggregate(Sum("high_sum", alias_name="high_count"), Sum("low_sum", alias_name="low_count"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "l_linestatus": b["l_linestatus"],
                "high_count": pc.cast(b["high_count"], pa.int64()),
                "low_count": pc.cast(b["low_count"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
GROUP BY 1
"""


_Q18_QTY = 200


def q18_heavy_orders(sf_dir: str, k: int = 20):
    """TPC-H q18 shape: group + HAVING + join + deterministic top-k. Plan:
    exact integer quantity sums per orderkey (agg.sum_by_u64 — combiner,
    one shuffle, reduceat), HAVING filter inside map_batches, then a
    hash-partitioned join against orders (the heavy-order set shrinks with
    the threshold but is unbounded in principle — never broadcast), sorted
    top-k on the rounded price with orderkey tie-break."""
    import ray.data

    from core_ray.stages.agg import sum_by_u64
    from core_ray.stages.join import hash_join

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        # quantities are integral-valued doubles -> exact int64 sums
        lambda b: pa.table(
            {
                "key": pc.cast(b["l_orderkey"], pa.uint64()),
                "q": pc.cast(pc.round(b["l_quantity"]), pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )
    heavy = sum_by_u64(li, "key", "q").map_batches(
        lambda b: pa.table(
            {
                "okey": pc.cast(b["key"], pa.int64()),
                "total_qty": b["cnt"],
            }
        ).filter(pc.greater(b["cnt"], _Q18_QTY)),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        lambda b: pa.table(
            {
                "okey": b["o_orderkey"],
                "o_custkey": b["o_custkey"],
                "o_totalprice": sql_round(b["o_totalprice"], 2),
            }
        ),
        batch_format="pyarrow",
    )
    top = hash_join(heavy, orders, on="okey").sort(
        ["o_totalprice", "okey"], descending=[True, False]
    ).limit(k)
    return top.map_batches(
        lambda b: pa.table(
            {
                "o_orderkey": b["okey"],
                "o_custkey": b["o_custkey"],
                "o_totalprice": b["o_totalprice"],
                "total_qty": pc.cast(b["total_qty"], pa.float64()),
            }
        ),
        batch_format="pyarrow",
    )


Q18_SQL = f"""
WITH heavy AS (
  SELECT l_orderkey, SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS q
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > {_Q18_QTY}
)
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS o_totalprice,
       CAST(q AS DOUBLE) AS total_qty
FROM heavy JOIN orders ON l_orderkey = o_orderkey
ORDER BY ROUND(o_totalprice, 2) DESC, o_orderkey
LIMIT {20}
"""


# ===================================================== relational wave 3
# q13/q14/q16/q17/q19/q22 shapes: outer-join count distribution, promo
# ratio, distinct-count per group with anti-join, per-group-avg threshold
# join, disjunctive multi-table predicate, scalar-subquery threshold +
# anti-join. Discipline as above: predicates ride the read, facts never
# broadcast, dims attach adaptively (sorted-array broadcast under the q10
# size guard, hash_join above it), monetary math in exact integer units.


def _sorted_probe(keys_sorted: np.ndarray, probe: np.ndarray):
    """Positions of ``probe`` values in a sorted key array + hit mask."""
    pos = np.searchsorted(keys_sorted, probe)
    pos = np.minimum(pos, max(len(keys_sorted) - 1, 0))
    hit = keys_sorted[pos] == probe if len(keys_sorted) else np.zeros(len(probe), bool)
    return pos, hit


def q13_cust_order_dist(sf_dir: str):
    """TPC-H q13 shape: LEFT-outer-join count distribution — per-customer
    order counts INCLUDING zero-order customers. Plan: per-custkey counts
    via the count_by_u64 combiner (one small shuffle over distinct
    custkeys, never the orders fact); the distribution is a second tiny
    count_by_u64 whose key is the count value; the zero-order bucket is
    |customer| minus the ordering customers — pure subtraction, so the
    customer table is never shuffled at all (metadata row count only;
    relies on o_custkey ⊆ c_custkey, which the corpus guarantees)."""
    from core_ray.stages.agg import count_by_u64

    counts = count_by_u64(
        _read(sf_dir, "orders", ["o_custkey"]).map_batches(
            lambda b: pa.table({"key": pc.cast(b["o_custkey"], pa.uint64())}),
            batch_format="pyarrow",
        ),
        "key",
    ).map_batches(
        lambda b: pa.table({"key": pc.cast(b["cnt"], pa.uint64())}),
        batch_format="pyarrow",
    )
    hist = _collect_table(count_by_u64(counts, "key"))
    c_count = hist["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    custdist = hist["cnt"].to_numpy(zero_copy_only=False)
    n_cust = _read(sf_dir, "customer", ["c_custkey"]).count()
    zero = n_cust - int(custdist.sum())
    if zero > 0:
        c_count = np.concatenate([c_count, [0]])
        custdist = np.concatenate([custdist, [zero]])
    return pa.table(
        {
            "c_count": pa.array(c_count, pa.int64()),
            "custdist": pa.array(custdist, pa.int64()),
        }
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY 1)
GROUP BY 1
"""


def q14_promo_revenue(sf_dir: str):
    """TPC-H q14 shape: conditional aggregation ratio after a fact-dim
    join. The month window rides the lineitem read; the part side reduces
    to ONE bit (is-promo) and attaches adaptively — a sorted
    (pkey -> promo) bitmap broadcast under the size guard, hash_join above
    it. Revenue in exact 10^-4 units; the ratio is one float division on
    the driver, identical IEEE ops to the SQL."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from core_ray.stages.join import hash_join

    li = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= datetime(1997, 9, 1))
        & (pads.field("l_shipdate") < datetime(1997, 10, 1)),
    )

    def units_of(b: pa.Table) -> np.ndarray:
        return sql_round_np(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
            * 10000.0,
            0,
        ).astype(np.int64)

    part_path = _p(sf_dir, "part")
    if os.path.getsize(part_path) < _Q10_BROADCAST_MAX_BYTES:
        pt = pq.read_table(part_path, columns=["p_partkey", "p_type"])
        pk = pt["p_partkey"].to_numpy(zero_copy_only=False)
        promo = pc.equal(pt["p_type"], "PROMO").to_numpy(zero_copy_only=False)
        order = np.argsort(pk, kind="stable")
        ref = ray.put((pk[order], promo[order]))

        def partial(b: pa.Table, ref=ref) -> pa.Table:
            pks, isp = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            pos, hit = _sorted_probe(pks, b["l_partkey"].to_numpy(zero_copy_only=False))
            u = units_of(b)
            pu = u[hit & isp[pos]]
            return pa.table(
                {
                    "p": pa.array([int(pu.sum())], pa.int64()),
                    "t": pa.array([int(u[hit].sum())], pa.int64()),
                }
            )

        parts = li.map_batches(partial, batch_format="pyarrow", batch_size=131072)
    else:
        li2 = li.map_batches(
            lambda b: pa.table(
                {"pkey": b["l_partkey"], "units": pa.array(units_of(b), pa.int64())}
            ),
            batch_format="pyarrow",
        )
        pm = ray.data.read_parquet(part_path, columns=["p_partkey", "p_type"]).map_batches(
            lambda b: pa.table(
                {
                    "pkey": b["p_partkey"],
                    "promo": pc.cast(pc.equal(b["p_type"], "PROMO"), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        j = hash_join(li2, pm, on="pkey")

        def partial(b: pa.Table) -> pa.Table:
            u = b["units"].to_numpy(zero_copy_only=False)
            f = b["promo"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "p": pa.array([int((u * f).sum())], pa.int64()),
                    "t": pa.array([int(u.sum())], pa.int64()),
                }
            )

        parts = j.map_batches(partial, batch_format="pyarrow", batch_size=131072)

    pt_tbl = _collect_table(parts)
    p = int(pc.sum(pt_tbl["p"]).as_py() or 0)
    t = int(pc.sum(pt_tbl["t"]).as_py() or 0)
    val = sql_round(100.0 * p / t, 6) if t else None
    return pa.table({"promo_revenue": pa.array([val], pa.float64())})


Q14_SQL = """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)
                 ELSE 0 END)
       / SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)), 6)
       AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1997-09-01' AND l_shipdate < DATE '1997-10-01'
"""


_Q16_SIZES = (5, 10, 15, 20, 25, 30)
_Q16_SUPP_BAL = 2000.0


def q16_supplier_cnt(sf_dir: str):
    """TPC-H q16 shape: COUNT(DISTINCT supplier) per part group, with a
    NOT-IN supplier anti-join. Plan: the part-supplier relation is distinct
    (partkey, suppkey) pairs from lineitem — ONE packed-u64 count_by_u64;
    excluded suppliers (tiny dim subset) broadcast as an np.isin mask;
    group labels are discovered DISTRIBUTEDLY (per-batch distinct triple
    combiner -> tiny driver set, <= brands x types x sizes rows), parts map
    to a dense gid (sorted-array broadcast under the size guard, hash_join
    above); distinct (gid, suppkey) and the final per-gid counts are two
    more packed count_by_u64 passes — no shuffle ever carries strings."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from core_ray.stages.agg import count_by_u64
    from core_ray.stages.join import hash_join

    # excluded suppliers: tiny dim subset -> driver np array
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).map_batches(
        lambda b: b.filter(pc.less(b["s_acctbal"], _Q16_SUPP_BAL)).select(["s_suppkey"]),
        batch_format="pyarrow",
    )
    excl = np.unique(_collect_table(supp)["s_suppkey"].to_numpy(zero_copy_only=False))

    pfilter = (pads.field("p_brand") != "Brand#1") & (
        pads.field("p_size").isin(list(_Q16_SIZES))
    )
    parts = ray.data.read_parquet(
        _p(sf_dir, "part"),
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
        filter=pfilter,
    )

    def _codes(b: pa.Table) -> pa.Array:
        return pc.binary_join_element_wise(
            b["p_brand"], b["p_type"], pc.cast(b["p_size"], pa.string()), "|"
        )

    # distinct group triples: per-batch unique combiner -> tiny driver set
    gtbl = _collect_table(
        parts.map_batches(
            lambda b: pa.table({"g": pc.unique(_codes(b))}), batch_format="pyarrow"
        )
    )
    gset = np.unique(gtbl["g"].to_numpy(zero_copy_only=False))
    if len(gset) == 0:
        return pa.table(
            {
                "p_brand": pa.array([], pa.string()),
                "p_type": pa.array([], pa.string()),
                "p_size": pa.array([], pa.int32()),
                "supplier_cnt": pa.array([], pa.int64()),
            }
        )

    # distinct (partkey, suppkey) pairs, excluded suppliers dropped
    def pairs_pre(b: pa.Table, excl=excl) -> pa.Table:
        pk = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        keep = ~np.isin(sk.astype(np.int64), excl)
        return pa.table(
            {"key": pa.array((pk[keep] << np.uint64(32)) | sk[keep], pa.uint64())}
        )

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    pairs = count_by_u64(
        li.map_batches(pairs_pre, batch_format="pyarrow", batch_size=131072), "key"
    )

    part_path = _p(sf_dir, "part")
    if os.path.getsize(part_path) < _Q10_BROADCAST_MAX_BYTES:
        pt = pq.read_table(part_path, columns=["p_partkey", "p_brand", "p_type", "p_size"])
        pt = pt.filter(
            pc.and_(
                pc.not_equal(pt["p_brand"], "Brand#1"),
                pc.is_in(pt["p_size"], value_set=pa.array(list(_Q16_SIZES), pa.int32())),
            )
        )
        pk = pt["p_partkey"].to_numpy(zero_copy_only=False)
        gid = np.searchsorted(gset, _codes(pt).to_numpy(zero_copy_only=False))
        order = np.argsort(pk, kind="stable")
        ref = ray.put((pk[order], gid[order]))

        def attach(b: pa.Table, ref=ref) -> pa.Table:
            pks, gids = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            key = b["key"].to_numpy(zero_copy_only=False)
            pkey = (key >> np.uint64(32)).astype(np.int64)
            skey = (key & np.uint64(0xFFFFFFFF)).astype(np.uint64)
            pos, hit = _sorted_probe(pks, pkey)
            g = gids[pos][hit].astype(np.uint64)
            return pa.table(
                {"key": pa.array((g << np.uint64(32)) | skey[hit], pa.uint64())}
            )

        gs_pairs = pairs.map_batches(attach, batch_format="pyarrow", batch_size=131072)
    else:
        unpacked = pairs.map_batches(
            lambda b: pa.table(
                {
                    "pkey": pc.cast(
                        pc.shift_right(b["key"], 32), pa.int64()
                    ),
                    "skey": pc.cast(
                        pc.bit_wise_and(b["key"], 0xFFFFFFFF), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )

        def gid_map(b: pa.Table, gset=gset) -> pa.Table:
            gid = np.searchsorted(gset, _codes(b).to_numpy(zero_copy_only=False))
            return pa.table(
                {"pkey": b["p_partkey"], "gid": pa.array(gid.astype(np.int64), pa.int64())}
            )

        pm = parts.map_batches(gid_map, batch_format="pyarrow")
        gs_pairs = hash_join(unpacked, pm, on="pkey").map_batches(
            lambda b: pa.table(
                {
                    "key": pa.array(
                        (
                            b["gid"].to_numpy(zero_copy_only=False).astype(np.uint64)
                            << np.uint64(32)
                        )
                        | b["skey"].to_numpy(zero_copy_only=False).astype(np.uint64),
                        pa.uint64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )

    # distinct (gid, suppkey) -> per-gid count; result <= #groups rows
    gs_distinct = count_by_u64(gs_pairs, "key").map_batches(
        lambda b: pa.table({"key": pc.shift_right(b["key"], 32)}),
        batch_format="pyarrow",
    )
    final = _collect_table(count_by_u64(gs_distinct, "key"))
    gids = final["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnts = final["cnt"].to_numpy(zero_copy_only=False)
    trip = [gset[g].split("|") for g in gids]
    return pa.table(
        {
            "p_brand": pa.array([t[0] for t in trip], pa.string()),
            "p_type": pa.array([t[1] for t in trip], pa.string()),
            "p_size": pa.array([int(t[2]) for t in trip], pa.int32()),
            "supplier_cnt": pa.array(cnts, pa.int64()),
        }
    )


Q16_SQL = f"""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_size IN {_Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < {_Q16_SUPP_BAL})
GROUP BY 1, 2, 3
"""


_Q17_BRAND = "Brand#23"


def q17_small_qty_revenue(sf_dir: str):
    """TPC-H q17 shape: join against a per-group AVERAGE threshold
    (correlated-subquery flattening). Plan: qualifying partkeys (one brand,
    dim side) broadcast sorted; pass 1 computes per-part (sum_qty, count)
    in ONE packed sum_by_u64 (qty100 << 21 | 1 — exact while a part has
    < 2^21 lineitems); the threshold re-attaches adaptively on pass 2 and
    the avg comparison is pure integers (qty*5*cnt < sum — no division);
    revenue in 10^-4 units, one-row result."""
    import ray

    from core_ray.stages.agg import sum_by_u64
    from core_ray.stages.join import hash_join

    # qualifying partkeys (one brand, ~1/25 of the dim): distributed filter,
    # only the surviving key set crosses to the driver
    pk_ds = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda b: b.filter(pc.equal(b["p_brand"], _Q17_BRAND)).select(["p_partkey"]),
        batch_format="pyarrow",
    )
    pkeys = np.sort(_collect_table(pk_ds)["p_partkey"].to_numpy(zero_copy_only=False))
    pref = ray.put(pkeys)

    def qty_pre(b: pa.Table, pref=pref) -> pa.Table:
        pks = ray.get(pref) if isinstance(pref, ray.ObjectRef) else pref
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        pos, hit = _sorted_probe(pks, pk)
        q100 = sql_round_np(
            b["l_quantity"].to_numpy(zero_copy_only=False)[hit] * 100.0, 0
        ).astype(np.int64)
        return pa.table(
            {
                "key": pa.array(pk[hit].astype(np.uint64), pa.uint64()),
                "v": pa.array((q100 << 21) | 1, pa.int64()),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
    agg = sum_by_u64(
        li.map_batches(qty_pre, batch_format="pyarrow", batch_size=131072), "key", "v"
    )

    # the per-part stat table has <= |qualifying parts| rows — broadcastable
    # exactly when the part dim itself is (same guard as the other adaptive
    # joins); above the guard it re-attaches via the distributed hash join
    if os.path.getsize(_p(sf_dir, "part")) < _Q10_BROADCAST_MAX_BYTES:
        at = _collect_table(agg)
        ak = at["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        av = at["cnt"].to_numpy(zero_copy_only=False)
        order = np.argsort(ak, kind="stable")
        sref = ray.put((ak[order], av[order]))

        def partial(b: pa.Table, sref=sref) -> pa.Table:
            aks, avs = ray.get(sref) if isinstance(sref, ray.ObjectRef) else sref
            pk = b["l_partkey"].to_numpy(zero_copy_only=False)
            pos, hit = _sorted_probe(aks, pk)
            v = avs[pos]
            s100, cnt = v >> 21, v & ((1 << 21) - 1)
            q100 = sql_round_np(
                b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0, 0
            ).astype(np.int64)
            u = sql_round_np(
                b["l_extendedprice"].to_numpy(zero_copy_only=False) * 10000.0, 0
            ).astype(np.int64)
            keep = hit & (q100 * 5 * cnt < s100)
            return pa.table(
                {
                    "u": pa.array([int(u[keep].sum())], pa.int64()),
                    "n": pa.array([int(keep.sum())], pa.int64()),
                }
            )

        parts = _read(
            sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
        ).map_batches(partial, batch_format="pyarrow", batch_size=131072)
    else:
        li2 = _read(
            sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
        ).map_batches(
            lambda b: pa.table(
                {
                    "pkey": b["l_partkey"],
                    "q100": pa.array(
                        sql_round_np(
                            b["l_quantity"].to_numpy(zero_copy_only=False) * 100.0, 0
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                    "u": pa.array(
                        sql_round_np(
                            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 10000.0,
                            0,
                        ).astype(np.int64),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        am = agg.map_batches(
            lambda b: pa.table(
                {"pkey": pc.cast(b["key"], pa.int64()), "v": b["cnt"]}
            ),
            batch_format="pyarrow",
        )
        j = hash_join(li2, am, on="pkey")

        def partial(b: pa.Table) -> pa.Table:
            v = b["v"].to_numpy(zero_copy_only=False)
            s100, cnt = v >> 21, v & ((1 << 21) - 1)
            q100 = b["q100"].to_numpy(zero_copy_only=False)
            u = b["u"].to_numpy(zero_copy_only=False)
            keep = q100 * 5 * cnt < s100
            return pa.table(
                {
                    "u": pa.array([int(u[keep].sum())], pa.int64()),
                    "n": pa.array([int(keep.sum())], pa.int64()),
                }
            )

        parts = j.map_batches(partial, batch_format="pyarrow", batch_size=131072)

    t = _collect_table(parts)
    u = int(pc.sum(t["u"]).as_py() or 0)
    n = int(pc.sum(t["n"]).as_py() or 0)
    return pa.table(
        {
            "avg_yearly": pa.array([sql_round(u / 70000.0, 2)], pa.float64()),
            "n_items": pa.array([n], pa.int64()),
        }
    )


Q17_SQL = f"""
WITH ag AS (
  SELECT l_partkey AS pk,
         SUM(CAST(ROUND(l_quantity * 100.0) AS BIGINT)) AS s100,
         COUNT(*) AS cnt
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{_Q17_BRAND}'
  GROUP BY 1)
SELECT ROUND(COALESCE(SUM(CAST(ROUND(l_extendedprice * 10000.0) AS BIGINT)), 0) / 70000.0, 2)
         AS avg_yearly,
       COUNT(*) AS n_items
FROM lineitem l JOIN ag ON l.l_partkey = ag.pk
WHERE CAST(ROUND(l.l_quantity * 100.0) AS BIGINT) * 5 * ag.cnt < ag.s100
"""


_Q2_SUPP_BITS = 24  # suppkey rides the low bits of the packed argmin value


def q2_min_cost_supplier(sf_dir: str):
    """TPC-H q2 shape: grouped ARGMIN with join-back — per part, the
    supplier offering the minimum price (price tie -> min suppkey). Plan:
    ONE packed agg.min_by_u64 pass (price_cents << 24 | suppkey, so the
    u64 minimum IS the lexicographic (price, suppkey) argmin — no window,
    no second scan); supplier names attach from the tiny dim broadcast.
    Bound: suppkey < 2^24, price < 2^39 cents — both hold by orders of
    magnitude at any TPC-H scale."""
    import ray

    from core_ray.stages.agg import min_by_u64

    def pre(b: pa.Table) -> pa.Table:
        cents = sql_round_np(
            b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.uint64)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "key": pc.cast(b["l_partkey"], pa.uint64()),
                "val": pa.array(
                    (cents << np.uint64(_Q2_SUPP_BITS)) | sk, pa.uint64()
                ),
            }
        )

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"])
    best = min_by_u64(li.map_batches(pre, batch_format="pyarrow", batch_size=131072), "key", "val")

    st = _collect_table(_read(sf_dir, "supplier", ["s_suppkey", "s_name"]))
    sk = st["s_suppkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(sk, kind="stable")
    names = np.asarray(st["s_name"].to_pylist())[order]
    ref = ray.put((sk[order], names))

    def finish(b: pa.Table, ref=ref) -> pa.Table:
        sks, nms = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        v = b["val"].to_numpy(zero_copy_only=False)
        supp = (v & np.uint64((1 << _Q2_SUPP_BITS) - 1)).astype(np.int64)
        cents = (v >> np.uint64(_Q2_SUPP_BITS)).astype(np.int64)
        pos, hit = _sorted_probe(sks, supp)
        return pa.table(
            {
                "p_partkey": pc.cast(b["key"], pa.int64()),
                "s_suppkey": pa.array(supp, pa.int64()),
                "min_price": pa.array(sql_round_np(cents / 100.0, 2), pa.float64()),
                "s_name": pa.array(np.where(hit, nms[pos], None)),
            }
        )

    return best.map_batches(finish, batch_format="pyarrow")


Q2_SQL = """
WITH r AS (
  SELECT l_partkey, l_suppkey, l_extendedprice,
         ROW_NUMBER() OVER (
           PARTITION BY l_partkey
           ORDER BY CAST(ROUND(l_extendedprice * 100.0) AS BIGINT), l_suppkey) AS rn
  FROM lineitem)
SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
       ROUND(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT) / 100.0, 2) AS min_price,
       s_name
FROM r JOIN supplier ON s_suppkey = l_suppkey
WHERE rn = 1
"""


_Q7_NATIONS = ("NATION_3", "NATION_7")


def q7_nation_volume(sf_dir: str):
    """TPC-H q7 shape: shipping volume between two nations, grouped by the
    directed (supp_nation, cust_nation) pair and ship year. Plan: the
    supplier side prunes lineitem EARLY (tiny suppkey -> nationkey
    broadcast, rows outside the two nations never reach the join); the
    orders fact attaches via the fully-distributed hash join (fact-fact —
    never broadcast); customer nation attaches from the customer dim under
    the adaptive size guard; final group is (2 x 2 x years) rows via a
    per-batch combiner. Exact integer 10^-4 revenue units."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from core_ray.stages.join import hash_join

    # nation name -> key (tiny)
    nt = _collect_table(_read(sf_dir, "nation", ["n_nationkey", "n_name"]))
    key_of = dict(zip(nt["n_name"].to_pylist(), nt["n_nationkey"].to_pylist()))
    nk = {key_of[n] for n in _Q7_NATIONS if n in key_of}
    name_of = {key_of[n]: n for n in _Q7_NATIONS if n in key_of}

    # supplier -> nation (tiny dim): sorted broadcast, two-nation mask
    st = _collect_table(_read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]))
    sk = st["s_suppkey"].to_numpy(zero_copy_only=False)
    sn = st["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(sk, kind="stable")
    sref = ray.put((sk[order], sn[order]))

    def li_pre(b: pa.Table, sref=sref) -> pa.Table:
        sks, sns = ray.get(sref) if isinstance(sref, ray.ObjectRef) else sref
        pos, hit = _sorted_probe(sks, b["l_suppkey"].to_numpy(zero_copy_only=False))
        nat = sns[pos]
        keep = hit & np.isin(nat, list(nk))
        units = sql_round_np(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False)[keep])
            * 10000.0,
            0,
        ).astype(np.int64)
        yr = (
            b["l_shipdate"].to_numpy(zero_copy_only=False)[keep]
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        return pa.table(
            {
                "okey": pa.array(
                    b["l_orderkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "supp_nk": pa.array(nat[keep], pa.int64()),
                "l_year": pa.array(yr, pa.int64()),
                "units": pa.array(units, pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        filter=(pads.field("l_shipdate") >= datetime(1996, 1, 1))
        & (pads.field("l_shipdate") < datetime(1998, 1, 1)),
    ).map_batches(li_pre, batch_format="pyarrow", batch_size=131072)

    # customer -> nation, restricted to the two nations (dim under guard)
    cust_path = _p(sf_dir, "customer")
    ct = pq.read_table(cust_path, columns=["c_custkey", "c_nationkey"])
    ck = ct["c_custkey"].to_numpy(zero_copy_only=False)
    cn = ct["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    corder = np.argsort(ck, kind="stable")
    cref = ray.put((ck[corder], cn[corder]))

    def orders_pre(b: pa.Table, cref=cref) -> pa.Table:
        cks, cns = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        pos, hit = _sorted_probe(cks, b["o_custkey"].to_numpy(zero_copy_only=False))
        nat = cns[pos]
        keep = hit & np.isin(nat, list(nk))
        return pa.table(
            {
                "okey": pa.array(
                    b["o_orderkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "cust_nk": pa.array(nat[keep], pa.int64()),
            }
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        orders_pre, batch_format="pyarrow", batch_size=131072
    )
    j = hash_join(li, orders, on="okey")

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "supp_nk": b["supp_nk"],
                "cust_nk": b["cust_nk"],
                "l_year": b["l_year"],
                "units": b["units"],
            }
        )
        # directed pairs between DISTINCT nations only (q7 semantics)
        t = t.filter(pc.not_equal(t["supp_nk"], t["cust_nk"]))
        g = pa.TableGroupBy(t, ["supp_nk", "cust_nk", "l_year"]).aggregate(
            [("units", "sum")]
        )
        return g

    agg = (
        j.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby(["supp_nk", "cust_nk", "l_year"])
        .aggregate(Sum("units_sum", alias_name="u"))
    )
    t = _collect_table(agg)
    return pa.table(
        {
            "supp_nation": pa.array(
                [name_of[k] for k in t["supp_nk"].to_pylist()], pa.string()
            ),
            "cust_nation": pa.array(
                [name_of[k] for k in t["cust_nk"].to_pylist()], pa.string()
            ),
            "l_year": pc.cast(t["l_year"], pa.int64()),
            "revenue": pa.array(
                sql_round_np(t["u"].to_numpy(zero_copy_only=False) / 10000.0, 2),
                pa.float64(),
            ),
        }
    )


Q7_SQL = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT))
             / 10000.0, 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN {_Q7_NATIONS} AND cn.n_name IN {_Q7_NATIONS}
  AND sn.n_name <> cn.n_name
  AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1998-01-01'
GROUP BY 1, 2, 3
"""


def q15_top_supplier(sf_dir: str):
    """TPC-H q15 shape: global ARGMAX with ties — every supplier achieving
    the maximum quarterly revenue (LIMIT 1 would silently drop ties, which
    is the point of the shape). Plan: per-supplier exact revenue units via
    ONE sum_by_u64; the global max is a per-batch combiner over that small
    table (never collected whole); a second pass filters equality. Output
    joins the tiny supplier dim for names."""
    import pyarrow.dataset as pads
    import ray
    import ray.data

    from core_ray.stages.agg import sum_by_u64

    def pre(b: pa.Table) -> pa.Table:
        units = sql_round_np(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
            * 10000.0,
            0,
        ).astype(np.int64)
        return pa.table(
            {
                "key": pc.cast(b["l_suppkey"], pa.uint64()),
                "v": pa.array(units, pa.int64()),
            }
        )

    li = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= datetime(1997, 1, 1))
        & (pads.field("l_shipdate") < datetime(1997, 4, 1)),
    ).map_batches(pre, batch_format="pyarrow", batch_size=131072)
    rev = sum_by_u64(li, "key", "v").materialize()  # one execution, two consumers

    mx_parts = _collect_table(
        rev.map_batches(
            lambda b: pa.table(
                {
                    "m": pa.array(
                        [int(b["cnt"].to_numpy(zero_copy_only=False).max()) if b.num_rows else np.iinfo(np.int64).min],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
    )
    mx = int(pc.max(mx_parts["m"]).as_py())

    st = _collect_table(_read(sf_dir, "supplier", ["s_suppkey", "s_name"]))
    sk = st["s_suppkey"].to_numpy(zero_copy_only=False)
    order = np.argsort(sk, kind="stable")
    names = np.asarray(st["s_name"].to_pylist())[order]
    ref = ray.put((sk[order], names))

    def winners(b: pa.Table, ref=ref, mx=mx) -> pa.Table:
        sks, nms = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        keep = b.filter(pc.equal(b["cnt"], mx))
        supp = keep["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos, hit = _sorted_probe(sks, supp)
        return pa.table(
            {
                "s_suppkey": pa.array(supp, pa.int64()),
                "s_name": pa.array(np.where(hit, nms[pos], None)),
                "total_revenue": pa.array(
                    sql_round_np(
                        keep["cnt"].to_numpy(zero_copy_only=False) / 10000.0, 2
                    ),
                    pa.float64(),
                ),
            }
        )

    return rev.map_batches(winners, batch_format="pyarrow")


Q15_SQL = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)) AS u
  FROM lineitem
  WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1997-04-01'
  GROUP BY 1)
SELECT l_suppkey AS s_suppkey, s_name, ROUND(u / 10000.0, 2) AS total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE u = (SELECT MAX(u) FROM rev)
"""


_Q19_BRACKETS = (
    (12, 1, 11, 1, 5),
    (23, 10, 20, 1, 10),
    (34, 20, 30, 1, 15),
)


def q19_disjunctive_revenue(sf_dir: str):
    """TPC-H q19 shape: revenue under a DISJUNCTION of multi-table
    predicate brackets (brand x quantity-range x size-range). The common
    envelope (quantity <= max bracket) rides the read; part attrs reduce to
    (brand_num, size) ints and attach adaptively; the OR-of-ANDs mask is
    one vectorized expression; exact integer units, one-row result."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray
    import ray.data

    from core_ray.stages.join import hash_join

    qmax = float(max(hi for _, _, hi, _, _ in _Q19_BRACKETS))
    li = ray.data.read_parquet(
        _p(sf_dir, "lineitem"),
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        filter=pads.field("l_quantity") <= qmax,
    )

    def mask_of(bn: np.ndarray, size: np.ndarray, qty: np.ndarray) -> np.ndarray:
        m = np.zeros(len(bn), dtype=bool)
        for brand, qlo, qhi, slo, shi in _Q19_BRACKETS:
            m |= (
                (bn == brand)
                & (qty >= qlo)
                & (qty <= qhi)
                & (size >= slo)
                & (size <= shi)
            )
        return m

    def units_of(b: pa.Table) -> np.ndarray:
        return sql_round_np(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
            * 10000.0,
            0,
        ).astype(np.int64)

    part_path = _p(sf_dir, "part")
    if os.path.getsize(part_path) < _Q10_BROADCAST_MAX_BYTES:
        pt = pq.read_table(part_path, columns=["p_partkey", "p_brand", "p_size"])
        pk = pt["p_partkey"].to_numpy(zero_copy_only=False)
        bn = pc.cast(pc.utf8_slice_codeunits(pt["p_brand"], 6, 99), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        sz = pt["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(pk, kind="stable")
        ref = ray.put((pk[order], bn[order], sz[order]))

        def partial(b: pa.Table, ref=ref) -> pa.Table:
            pks, bns, szs = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            pos, hit = _sorted_probe(pks, b["l_partkey"].to_numpy(zero_copy_only=False))
            qty = b["l_quantity"].to_numpy(zero_copy_only=False)
            keep = hit & mask_of(bns[pos], szs[pos], qty)
            u = units_of(b)[keep]
            return pa.table(
                {
                    "u": pa.array([int(u.sum())], pa.int64()),
                    "n": pa.array([int(keep.sum())], pa.int64()),
                }
            )

        parts = li.map_batches(partial, batch_format="pyarrow", batch_size=131072)
    else:
        li2 = li.map_batches(
            lambda b: pa.table(
                {
                    "pkey": b["l_partkey"],
                    "qty": b["l_quantity"],
                    "units": pa.array(units_of(b), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        pm = ray.data.read_parquet(
            part_path, columns=["p_partkey", "p_brand", "p_size"]
        ).map_batches(
            lambda b: pa.table(
                {
                    "pkey": b["p_partkey"],
                    "bn": pc.cast(pc.utf8_slice_codeunits(b["p_brand"], 6, 99), pa.int64()),
                    "sz": pc.cast(b["p_size"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        j = hash_join(li2, pm, on="pkey")

        def partial(b: pa.Table) -> pa.Table:
            keep = mask_of(
                b["bn"].to_numpy(zero_copy_only=False),
                b["sz"].to_numpy(zero_copy_only=False),
                b["qty"].to_numpy(zero_copy_only=False),
            )
            u = b["units"].to_numpy(zero_copy_only=False)[keep]
            return pa.table(
                {
                    "u": pa.array([int(u.sum())], pa.int64()),
                    "n": pa.array([int(keep.sum())], pa.int64()),
                }
            )

        parts = j.map_batches(partial, batch_format="pyarrow", batch_size=131072)

    t = _collect_table(parts)
    u = int(pc.sum(t["u"]).as_py() or 0)
    n = int(pc.sum(t["n"]).as_py() or 0)
    return pa.table(
        {
            "revenue": pa.array([sql_round(u / 10000.0, 2)], pa.float64()),
            "n_items": pa.array([n], pa.int64()),
        }
    )


Q19_SQL = f"""
SELECT ROUND(COALESCE(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)), 0)
             / 10000.0, 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


_Q22_CUTOFF = datetime(1999, 1, 1)


def q22_idle_balance(sf_dir: str):
    """TPC-H q22 shape: scalar-subquery threshold (global average of
    positive balances) + NOT-IN anti-join + group aggregate. Plan: the
    threshold is two integers (sum, count of positive rounded cents) from a
    per-batch combiner; RECENT purchaser custkeys (idle = no order since
    the cutoff — every customer has ordered at least once in this corpus)
    reduce distributedly to a distinct sorted array (broadcast, negated
    np.isin probe — the cust_no_orders shape); the avg comparison is
    integer cross-multiply (cents * n > sum), so both engines agree
    exactly."""
    import pyarrow.dataset as pads
    import ray
    import ray.data

    from core_ray.stages.agg import count_by_u64

    def cents_of(b: pa.Table) -> np.ndarray:
        return sql_round_np(
            b["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def thresh_partial(b: pa.Table) -> pa.Table:
        c = cents_of(b)
        pos = c > 0
        return pa.table(
            {
                "s": pa.array([int(c[pos].sum())], pa.int64()),
                "n": pa.array([int(pos.sum())], pa.int64()),
            }
        )

    tt = _collect_table(
        cust.map_batches(thresh_partial, batch_format="pyarrow", batch_size=131072)
    )
    s = int(pc.sum(tt["s"]).as_py() or 0)
    n = int(pc.sum(tt["n"]).as_py() or 0)

    purch = count_by_u64(
        ray.data.read_parquet(
            _p(sf_dir, "orders"),
            columns=["o_custkey"],
            filter=pads.field("o_orderdate") >= _Q22_CUTOFF,
        ).map_batches(
            lambda b: pa.table({"key": pc.cast(b["o_custkey"], pa.uint64())}),
            batch_format="pyarrow",
        ),
        "key",
    )
    pkeys = np.sort(
        _collect_table(purch)["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    )
    pref = ray.put(pkeys)

    def partial(b: pa.Table, pref=pref, s=s, n=n) -> pa.Table:
        pks = ray.get(pref) if isinstance(pref, ray.ObjectRef) else pref
        ck = b["c_custkey"].to_numpy(zero_copy_only=False)
        c = cents_of(b)
        keep = (c * n > s) & ~np.isin(ck, pks)
        code = ck[keep] % 7
        cc = c[keep]
        u = np.unique(code)
        sums = np.array([int(cc[code == g].sum()) for g in u], dtype=np.int64)
        cnts = np.array([int((code == g).sum()) for g in u], dtype=np.int64)
        return pa.table(
            {
                "cntrycode": pa.array(u, pa.int64()),
                "numcust": pa.array(cnts, pa.int64()),
                "cents": pa.array(sums, pa.int64()),
            }
        )

    parts = _collect_table(
        cust.map_batches(partial, batch_format="pyarrow", batch_size=131072)
    )
    code = parts["cntrycode"].to_numpy(zero_copy_only=False)
    order = np.argsort(code, kind="stable")
    code, nc, ce = (
        code[order],
        parts["numcust"].to_numpy(zero_copy_only=False)[order],
        parts["cents"].to_numpy(zero_copy_only=False)[order],
    )
    new = np.ones(len(code), dtype=bool)
    if len(code):
        new[1:] = code[1:] != code[:-1]
    starts = np.nonzero(new)[0]
    return pa.table(
        {
            "cntrycode": pa.array(code[starts], pa.int64()),
            "numcust": pa.array(
                np.add.reduceat(nc, starts) if len(starts) else nc[:0], pa.int64()
            ),
            "totacctbal": pa.array(
                sql_round_np(
                    (np.add.reduceat(ce, starts) if len(starts) else ce[:0]) / 100.0, 2
                ),
                pa.float64(),
            ),
        }
    )


Q22_SQL = """
WITH t AS (
  SELECT SUM(CAST(ROUND(c_acctbal * 100.0) AS BIGINT)) AS s, COUNT(*) AS n
  FROM customer WHERE CAST(ROUND(c_acctbal * 100.0) AS BIGINT) > 0)
SELECT c_custkey % 7 AS cntrycode, COUNT(*) AS numcust,
       ROUND(SUM(CAST(ROUND(c_acctbal * 100.0) AS BIGINT)) / 100.0, 2) AS totacctbal
FROM customer, t
WHERE CAST(ROUND(c_acctbal * 100.0) AS BIGINT) * t.n > t.s
  AND c_custkey NOT IN (SELECT DISTINCT o_custkey FROM orders
                        WHERE o_orderdate >= DATE '1999-01-01')
GROUP BY 1
"""


# ========================================================== window wave 2
# LAG delta, RANK/DENSE_RANK/ROW_NUMBER, running total — the remaining
# order-sensitive window shapes, each one hash-partition shuffle by user +
# a fully vectorized per-partition pass (the events_rolling_max pattern).


def _events_sorted_arrays(g: pa.Table):
    """(uid, eid, value, order-applied) sorted by (user, ts, event_id)."""
    uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
    eid = g["event_id"].to_numpy(zero_copy_only=False)
    val = g["value"].to_numpy(zero_copy_only=False)
    order = np.lexsort((eid, us, uid))
    return uid[order], eid[order], val[order]


def events_lag_delta(sf_dir: str):
    """value - LAG(value) per user ordered by (ts, event_id); NULL on each
    user's first event. The subtraction is the same IEEE op on the same
    doubles on both sides, then ROUND(.,2)."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_part(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "delta": pa.array([], pa.float64()),
                }
            )
        uid, eid, v = _events_sorted_arrays(g)
        same = np.zeros(n, dtype=bool)
        same[1:] = uid[1:] == uid[:-1]
        delta = np.full(n, np.nan)
        delta[1:] = v[1:] - v[:-1]
        out = sql_round_np(delta, 2)
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "delta": pa.array(np.where(same, out, np.nan), pa.float64(), mask=~same),
            }
        )

    return map_groups_partitioned(ds, "user_id", per_part)


EVENTS_LAG_DELTA_SQL = """
SELECT event_id, user_id,
       ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id),
             2) AS delta
FROM events
"""


def events_transitions(sf_dir: str):
    """Per-user event-type transition counts (the Markov-chain / sequence-
    model view of the event stream): for every consecutive pair within a
    user's (ts, event_id)-ordered history, count (from_type -> to_type).
    One hash-partition shuffle by user; pairs reduce per partition to the
    types x types partial (bounded at any scale), then a tiny final
    groupby-sum. Same deterministic total order as the other window
    queries (ties broken by event_id)."""
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def per_part(g: pa.Table) -> pa.Table:
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(g["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, us, uid))
        uid = uid[order]
        et = np.asarray(g["event_type"].to_pylist())[order]
        same = uid[1:] == uid[:-1]
        frm, to = et[:-1][same], et[1:][same]
        keys = np.char.add(np.char.add(frm, "|"), to)
        u, c = np.unique(keys, return_counts=True)
        parts = np.char.partition(u, "|")
        return pa.table(
            {
                "from_type": pa.array(parts[:, 0], pa.string()),
                "to_type": pa.array(parts[:, 2], pa.string()),
                "n_part": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        map_groups_partitioned(ds, "user_id", per_part)
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n_part", alias_name="n"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "from_type": b["from_type"],
                "to_type": b["to_type"],
                "n": pc.cast(b["n"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


EVENTS_TRANSITIONS_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev
  FROM events)
SELECT prev AS from_type, event_type AS to_type, CAST(COUNT(*) AS BIGINT) AS n
FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
"""


def events_hopping_users(sf_dir: str):
    """EXACT distinct users per hopping window (1 h windows every 30 min) —
    the windowed-COUNT-DISTINCT sibling of events_hopping's windowed sums.
    Scale shape: events fan to their 2 covering windows and dedupe to
    batch-local (window, user) pairs in the combiner; one shuffle keyed by
    a hash MIX of the pair co-locates every copy of a pair (collisions only
    co-locate extra rows — the dedupe compares real values), each partition
    emits exact per-window partial distinct counts, and a tiny final
    groupby over the bounded window set sums them."""
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import _GOLD, _n_parts

    ds = _read(sf_dir, "events", ["ts", "user_id"])
    n_parts = _n_parts()

    def combine(b: pa.Table) -> pa.Table:
        us = (
            b["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        base = us - us % _HOP_US
        ws = np.concatenate([base - h * _HOP_US for h in range(_WIN_HOPS)])
        uu = np.tile(uid, _WIN_HOPS)
        order = np.lexsort((uu, ws))
        ws, uu = ws[order], uu[order]
        new = np.ones(len(ws), dtype=bool)
        new[1:] = (ws[1:] != ws[:-1]) | (uu[1:] != uu[:-1])
        ws, uu = ws[new], uu[new]
        mix = (ws.astype(np.uint64) * _GOLD) ^ (uu.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
        return pa.table(
            {
                "w": pa.array(ws, pa.int64()),
                "u": pa.array(uu, pa.int64()),
                "__part": pa.array(
                    ((mix * _GOLD) % np.uint64(n_parts)).astype(np.int32), pa.int32()
                ),
            }
        )

    def per_part(g: pa.Table) -> pa.Table:
        ws = g["w"].to_numpy(zero_copy_only=False)
        uu = g["u"].to_numpy(zero_copy_only=False)
        order = np.lexsort((uu, ws))
        ws, uu = ws[order], uu[order]
        new = np.ones(len(ws), dtype=bool)
        new[1:] = (ws[1:] != ws[:-1]) | (uu[1:] != uu[:-1])
        ws = ws[new]  # globally-distinct pairs (each pair lives here only)
        uw, c = np.unique(ws, return_counts=True)
        return pa.table(
            {
                "window_start": pa.array(
                    uw.astype("datetime64[us]"), pa.timestamp("us")
                ),
                "n_part": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(combine, batch_format="pyarrow", batch_size=131072)
        .groupby("__part")
        .map_groups(per_part, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Sum("n_part", alias_name="n_users"))
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                # same timestamp[s] re-inference as events_hopping -> [us]
                "window_start": pc.cast(b["window_start"], pa.timestamp("us")),
                "n_users": pc.cast(b["n_users"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


EVENTS_HOPPING_USERS_SQL = """
WITH hops AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS h, user_id FROM events
), w AS (
  SELECT h AS window_start, user_id FROM hops
  UNION ALL
  SELECT h - INTERVAL '30 minutes' AS window_start, user_id FROM hops
)
SELECT window_start, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM w GROUP BY 1
"""


def events_user_rank(sf_dir: str):
    """ROW_NUMBER / RANK / DENSE_RANK per user over value DESC (row_number
    tie-broken by event_id). One shuffle; ranks from vectorized run masks —
    rank = offset of the value-run start inside the user segment,
    dense_rank = cumulative run count inside the segment."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def per_part(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "rn": pa.array([], pa.int64()),
                    "rnk": pa.array([], pa.int64()),
                    "drnk": pa.array([], pa.int64()),
                }
            )
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        val = g["value"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, -val, uid))
        uid, eid, v = uid[order], eid[order], val[order]
        idx = np.arange(n, dtype=np.int64)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        new_val = new_user.copy()
        new_val[1:] |= v[1:] != v[:-1]
        seg_start = np.maximum.accumulate(np.where(new_user, idx, 0))
        run_start = np.maximum.accumulate(np.where(new_val, idx, 0))
        rn = idx - seg_start + 1
        rnk = run_start - seg_start + 1
        c = np.cumsum(new_val.astype(np.int64))
        drnk = c - c[seg_start] + 1
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "rn": pa.array(rn, pa.int64()),
                "rnk": pa.array(rnk, pa.int64()),
                "drnk": pa.array(drnk, pa.int64()),
            }
        )

    return map_groups_partitioned(ds, "user_id", per_part)


EVENTS_USER_RANK_SQL = """
SELECT event_id, user_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rn,
       CAST(RANK()       OVER (PARTITION BY user_id ORDER BY value DESC) AS BIGINT) AS rnk,
       CAST(DENSE_RANK() OVER (PARTITION BY user_id ORDER BY value DESC) AS BIGINT) AS drnk
FROM events
"""


def events_cumsum(sf_dir: str):
    """Running total of value per user ordered by (ts, event_id) — SUM OVER
    ROWS UNBOUNDED PRECEDING. Cents-exact: both sides round to int cents
    FIRST, so the running sum is integer arithmetic with no
    accumulation-order hazard, divided back to dollars at the end."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_part(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table(
                {
                    "event_id": pa.array([], pa.int64()),
                    "user_id": pa.array([], pa.int64()),
                    "run_total": pa.array([], pa.float64()),
                }
            )
        uid, eid, v = _events_sorted_arrays(g)
        cv = sql_round_np(v * 100.0, 0).astype(np.int64)
        c = np.cumsum(cv)
        idx = np.arange(n, dtype=np.int64)
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        seg_start = np.maximum.accumulate(np.where(new_user, idx, 0))
        run = c - c[seg_start] + cv[seg_start]
        return pa.table(
            {
                "event_id": pa.array(eid, pa.int64()),
                "user_id": pa.array(uid, pa.int64()),
                "run_total": pa.array(run / 100.0, pa.float64()),
            }
        )

    return map_groups_partitioned(ds, "user_id", per_part)


EVENTS_CUMSUM_SQL = """
SELECT event_id, user_id,
       SUM(CAST(ROUND(value * 100.0) AS BIGINT))
         OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
               ROWS UNBOUNDED PRECEDING) / 100.0 AS run_total
FROM events
"""


# watermark / late-data triage (streaming §2.8): the events fixture arrives
# perfectly time-ordered, so disorder is derived deterministically — each
# event suffers a hash-based network delay in [0, 1h) and its EFFECTIVE
# event time is ts minus that delay; arrival order stays event_id.
_LATE_DELAY_SQL = "((event_id * 104729) % 3600) * 1000000"
_LATE_L_US = 900_000_000  # allowed lateness: 15 min
_LATE_BUCKET_BITS = 10  # arrival buckets of 1024 events (see docstring)


def events_late_data(sf_dir: str):
    """Watermark-based late-data triage — the streaming semantics a windowed
    engine owes its users (Beam/Flink allowed-lateness): watermark = running
    MAX of effective event time over ARRIVAL order; per hourly window, count
    events that were on time (at the watermark), late-but-admitted (within
    the 15-min allowed lateness) and dropped (beyond it).

    A global running max is a sequential scan, so it distributes as a
    two-pass prefix: arrival ids split into contiguous buckets (1024 events
    each); pass 1 reduces per-bucket maxima through the max_by_u64 combiner
    and the driver folds them into EXCLUSIVE prefix maxima (one u64 per
    bucket — at 10^12 events widen the bucket, the prefix table stays tiny);
    pass 2 hash-partitions by bucket, cummaxes each bucket segment locally
    and ORs in the broadcast carry. Classified rows collapse to per-(hour,
    class) partial counts inside the same pass — only O(hours x 3) rows ever
    shuffle after that."""
    import ray

    from core_ray.collect import collect_table
    from core_ray.stages.agg import map_groups_partitioned, max_by_u64, sum_by_u64

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def with_ets(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            b["ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        ets = ts - ((eid * 104729) % 3600) * 1_000_000
        return pa.table(
            {
                "bucket": pa.array(
                    (eid >> _LATE_BUCKET_BITS).astype(np.uint64), pa.uint64()),
                "event_id": pa.array(eid, pa.int64()),
                "ets": pa.array(ets.astype(np.uint64), pa.uint64()),
            }
        )

    tagged = ds.map_batches(with_ets, batch_format="pyarrow", batch_size=131072)

    bmax = collect_table(max_by_u64(tagged, "bucket", "ets"))
    bk = bmax["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
    bv = bmax["ets"].to_numpy(zero_copy_only=False).astype(np.uint64)
    order = np.argsort(bk)
    bk, bv = bk[order], bv[order]
    # exclusive prefix max per bucket (0 for the first: ets values are
    # epoch-us, always > 0, so 0 == "no prior event")
    prefix = np.zeros(len(bv), dtype=np.uint64)
    if len(bv) > 1:
        prefix[1:] = np.maximum.accumulate(bv)[:-1]
    carry_ref = ray.put((bk, prefix))

    def per_part(g: pa.Table, carry_ref=carry_ref) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"key": pa.array([], pa.uint64()), "cnt": pa.array([], pa.int64())}
            )
        bks, pfx = (
            ray.get(carry_ref) if isinstance(carry_ref, ray.ObjectRef) else carry_ref
        )
        bu = g["bucket"].to_numpy(zero_copy_only=False).astype(np.uint64)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        ets = g["ets"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.lexsort((eid, bu))
        bu, ets = bu[order], ets[order]
        wm = np.empty(len(ets), dtype=np.uint64)
        new = np.ones(len(bu), dtype=bool)
        new[1:] = bu[1:] != bu[:-1]
        starts = np.nonzero(new)[0]
        bounds = np.append(starts, len(bu))
        for i, s in enumerate(starts):  # few buckets per partition, not rows
            e = bounds[i + 1]
            seg = np.maximum.accumulate(ets[s:e])
            wm[s:e] = np.maximum(seg, pfx[np.searchsorted(bks, bu[s])])
        late = wm - ets
        cls = np.where(
            late == 0, 0, np.where(late <= np.uint64(_LATE_L_US), 1, 2)
        ).astype(np.uint64)
        hour = ets // np.uint64(3_600_000_000)
        key = (hour << np.uint64(2)) | cls
        u, c = np.unique(key, return_counts=True)
        return pa.table(
            {
                "key": pa.array(u, pa.uint64()),
                "cnt": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    partials = map_groups_partitioned(tagged, "bucket", per_part)
    totals = sum_by_u64(partials, "key", "cnt")

    def decode(b: pa.Table) -> pa.Table:
        k = b["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "hour": pa.array(k >> np.uint64(2), pa.uint64()),
                "cls": pa.array((k & np.uint64(3)).astype(np.int64), pa.int64()),
                "cnt": pa.array(
                    b["cnt"].to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64()),
            }
        )

    def pivot(g: pa.Table) -> pa.Table:
        hour = g["hour"].to_numpy(zero_copy_only=False).astype(np.int64)
        cls = g["cls"].to_numpy(zero_copy_only=False)
        cnt = g["cnt"].to_numpy(zero_copy_only=False)
        hours = np.unique(hour)
        pos = np.searchsorted(hours, hour)
        out = np.zeros((len(hours), 3), dtype=np.int64)
        out[pos, cls] = cnt
        return pa.table(
            {
                "window_start": pa.array(
                    (hours * 3_600_000_000).astype("datetime64[us]")),
                "n_on_time": pa.array(out[:, 0], pa.int64()),
                "n_late": pa.array(out[:, 1], pa.int64()),
                "n_dropped": pa.array(out[:, 2], pa.int64()),
            }
        )

    return map_groups_partitioned(
        totals.map_batches(decode, batch_format="pyarrow"), "hour", pivot
    )


EVENTS_LATE_DATA_SQL = f"""
WITH e AS (
  SELECT event_id, epoch_us(ts) - {_LATE_DELAY_SQL} AS ets FROM events),
w AS (
  SELECT ets,
         MAX(ets) OVER (ORDER BY event_id ROWS UNBOUNDED PRECEDING) AS wm
  FROM e),
c AS (
  SELECT ets // 3600000000 AS hr,
         CASE WHEN wm - ets = 0 THEN 0
              WHEN wm - ets <= {_LATE_L_US} THEN 1 ELSE 2 END AS cls
  FROM w)
SELECT make_timestamp(hr * 3600000000) AS window_start,
       CAST(COALESCE(SUM(CASE WHEN cls = 0 THEN 1 END), 0) AS BIGINT) AS n_on_time,
       CAST(COALESCE(SUM(CASE WHEN cls = 1 THEN 1 END), 0) AS BIGINT) AS n_late,
       CAST(COALESCE(SUM(CASE WHEN cls = 2 THEN 1 END), 0) AS BIGINT) AS n_dropped
FROM c GROUP BY hr
"""


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_pivot_hourly(sf_dir: str):
    """Pivot (long -> wide): event counts per hour-of-day x event-type as
    one row per hour with a column per type. Per-batch combiner is a single
    np.bincount over hh*n_types+code (<=24 rows leave each batch); final
    24-key groupby sums the partials."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["ts", "event_type"])
    types = pa.array(list(_PIVOT_TYPES))
    ntyp = len(_PIVOT_TYPES)

    def combine(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hh = (us // 3_600_000_000) % 24
        code = pc.index_in(b["event_type"], value_set=types).to_numpy(zero_copy_only=False)
        cnt = np.bincount(hh * ntyp + code, minlength=24 * ntyp).reshape(24, ntyp)
        cols = {"hh": pa.array(np.arange(24, dtype=np.int64), pa.int64())}
        for i, t in enumerate(_PIVOT_TYPES):
            cols[f"n_{t}"] = pa.array(cnt[:, i].astype(np.int64), pa.int64())
        return pa.table(cols)

    agg = (
        ds.map_batches(combine, batch_format="pyarrow", batch_size=131072)
        .groupby("hh")
        .aggregate(*[Sum(f"n_{t}", alias_name=f"n_{t}") for t in _PIVOT_TYPES])
    )
    return agg.map_batches(
        lambda b: pa.table(
            {"hh": b["hh"], **{f"n_{t}": pc.cast(b[f"n_{t}"], pa.int64()) for t in _PIVOT_TYPES}}
        ),
        batch_format="pyarrow",
    )


EVENTS_PIVOT_SQL = """
SELECT epoch_us(ts) // 3600000000 % 24 AS hh,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events
GROUP BY 1
"""


def events_corr_moments(sf_dir: str):
    """Pearson correlation per event_type via EXACT integer moment sketches
    (n, Sx, Sy, Sxx, Syy, Sxy over int cents x user bucket): the classic
    mergeable-moments pattern — per-batch int64 partials, one tiny 5-key
    reduce, closed-form corr at the end. The int sums are exact up to
    ~8.6e9 rows per key at these magnitudes; beyond that promote the
    partials to int128/float-compensated (noted, not needed at bench
    scale)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])

    def combine(b: pa.Table) -> pa.Table:
        cv = sql_round_np(b["value"].to_numpy(zero_copy_only=False) * 100.0, 0).astype(np.int64)
        u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64) % 97
        et = b["event_type"].to_numpy(zero_copy_only=False)
        keys, inv = np.unique(et, return_inverse=True)
        m = len(keys)
        out = {
            "event_type": pa.array(keys, pa.string()),
            "n": pa.array(np.bincount(inv, minlength=m).astype(np.int64), pa.int64()),
        }
        for name, arr in (
            ("sx", cv),
            ("sy", u),
            ("sxx", cv * cv),
            ("syy", u * u),
            ("sxy", cv * u),
        ):
            out[name] = pa.array(np.bincount(inv, weights=arr, minlength=m).astype(np.int64), pa.int64())
        return pa.table(out)

    agg = (
        ds.map_batches(combine, batch_format="pyarrow", batch_size=131072)
        .groupby("event_type")
        .aggregate(*[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy")])
    )

    def finish(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        sx = b["sx"].to_numpy(zero_copy_only=False).astype(np.float64)
        sy = b["sy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxx = b["sxx"].to_numpy(zero_copy_only=False).astype(np.float64)
        syy = b["syy"].to_numpy(zero_copy_only=False).astype(np.float64)
        sxy = b["sxy"].to_numpy(zero_copy_only=False).astype(np.float64)
        corr = (n * sxy - sx * sy) / np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
        return pa.table(
            {
                "event_type": b["event_type"],
                "corr_vu": pa.array(sql_round_np(corr, 6), pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


EVENTS_CORR_SQL = """
WITH base AS (
  SELECT event_type, CAST(ROUND(value * 100.0) AS BIGINT) AS cv, user_id % 97 AS u
  FROM events
), s AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(cv) AS DOUBLE) AS sx, CAST(SUM(u) AS DOUBLE) AS sy,
         CAST(SUM(cv * cv) AS DOUBLE) AS sxx, CAST(SUM(u * u) AS DOUBLE) AS syy,
         CAST(SUM(cv * u) AS DOUBLE) AS sxy
  FROM base GROUP BY 1
)
SELECT event_type,
       ROUND((n * sxy - sx * sy) / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS corr_vu
FROM s
"""


# ========================================================== misc wave 2
# Ordered string aggregation, bag-difference set op, stratified sampling.


def region_nations_agg(sf_dir: str):
    """STRING_AGG per group (ordered list aggregation): nation names per
    region, comma-joined in name order. One hash-partition shuffle by the
    grouping key; the per-partition pass sorts each key's segment and joins
    — string concatenation is inherently per-group work, but groups never
    leave their partition and the 5-row region dim rides a closure."""
    import pyarrow.parquet as pq

    from core_ray.stages.agg import map_groups_partitioned

    rt = pq.read_table(_p(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    r_name_of = dict(zip(rt["r_regionkey"].to_pylist(), rt["r_name"].to_pylist()))

    ds = _read(sf_dir, "nation", ["n_regionkey", "n_name"]).map_batches(
        lambda b: pa.table(
            {"rkey": pc.cast(b["n_regionkey"], pa.int64()), "n_name": b["n_name"]}
        ),
        batch_format="pyarrow",
    )

    def per_part(g: pa.Table, r_name_of=r_name_of) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"r_name": pa.array([], pa.string()), "nations": pa.array([], pa.string())})
        rk = g["rkey"].to_numpy(zero_copy_only=False)
        names = np.asarray(g["n_name"].to_pylist())
        out_r, out_n = [], []
        for key in np.unique(rk):
            seg = np.sort(names[rk == key])
            out_r.append(r_name_of[int(key)])
            out_n.append(",".join(seg))
        return pa.table(
            {"r_name": pa.array(out_r, pa.string()), "nations": pa.array(out_n, pa.string())}
        )

    return map_groups_partitioned(ds, "rkey", per_part)


REGION_NATIONS_SQL = """
SELECT r_name, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY 1
"""


def events_purchasers_except(sf_dir: str):
    """Set difference (EXCEPT): distinct purchasing users minus users with
    a high-value error. Per-batch combiner ORs two flags per user (np.unique
    + maximum.at), one hash partition, per-partition flag reduce — the
    DISTINCT + anti-join fused into one boolean-flag aggregate."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def tag(b: pa.Table) -> pa.Table:
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        et = b["event_type"].to_numpy(zero_copy_only=False)
        val = b["value"].to_numpy(zero_copy_only=False)
        is_p = (et == "purchase").astype(np.int8)
        is_e = ((et == "error") & (val > 100.0)).astype(np.int8)
        u, inv = np.unique(uid, return_inverse=True)
        p = np.zeros(len(u), dtype=np.int8)
        e = np.zeros(len(u), dtype=np.int8)
        np.maximum.at(p, inv, is_p)
        np.maximum.at(e, inv, is_e)
        return pa.table(
            {
                "user_id": pa.array(u, pa.int64()),
                "p": pa.array(p, pa.int8()),
                "e": pa.array(e, pa.int8()),
            }
        )

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=131072)

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64())})
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        p = g["p"].to_numpy(zero_copy_only=False)
        e = g["e"].to_numpy(zero_copy_only=False)
        u, inv = np.unique(uid, return_inverse=True)
        pm = np.zeros(len(u), dtype=np.int8)
        em = np.zeros(len(u), dtype=np.int8)
        np.maximum.at(pm, inv, p)
        np.maximum.at(em, inv, e)
        keep = (pm == 1) & (em == 0)
        return pa.table({"user_id": pa.array(u[keep], pa.int64())})

    return map_groups_partitioned(tagged, "user_id", per_part)


EVENTS_EXCEPT_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 100.0
"""


_STRAT_K = 5


def doc_sample_stratified(sf_dir: str, k: int = _STRAT_K):
    """Stratified deterministic sample: k docs per lang, ordered by the
    same injective order-hash as doc_sample_bottomk — a per-group bottom-k.
    One shuffle by lang hash; each partition takes its langs' bottom-k with
    one lexsort (at scale the per-batch bottom-k prune of sample_bottomk
    composes in front of this shuffle; at k*n_langs rows it is unneeded)."""
    from core_ray.stages.agg import _GOLD, _n_parts, hash_strings

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    n_parts = _n_parts()

    def tag(b: pa.Table) -> pa.Table:
        h = hash_strings(b["lang"])
        part = ((h * _GOLD) % np.uint64(n_parts)).astype(np.int32)
        return b.append_column("__part", pa.array(part, pa.int32()))

    def per_part(g: pa.Table, k=k) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.int64()),
                    "sample_key": pa.array([], pa.int64()),
                }
            )
        ids = g["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        langs = np.asarray(g["lang"].to_pylist())
        key = ((ids * np.uint64(_BK_MULT) + np.uint64(_BK_SEED)) % np.uint64(_BK_MOD)).astype(
            np.int64
        )
        order = np.lexsort((ids, key, langs))
        langs, ids, key = langs[order], ids[order], key[order]
        new = np.ones(len(langs), dtype=bool)
        new[1:] = langs[1:] != langs[:-1]
        seg_start = np.maximum.accumulate(np.where(new, np.arange(len(langs)), 0))
        rn = np.arange(len(langs)) - seg_start
        keep = rn < k
        return pa.table(
            {
                "lang": pa.array(langs[keep], pa.string()),
                "doc_id": pa.array(ids[keep].astype(np.int64), pa.int64()),
                "sample_key": pa.array(key[keep], pa.int64()),
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow", batch_size=131072)
        .groupby("__part")
        .map_groups(lambda g: per_part(g.drop_columns(["__part"])), batch_format="pyarrow")
    )


DOC_SAMPLE_STRAT_SQL = f"""
SELECT lang, doc_id, sample_key FROM (
  SELECT lang, doc_id,
         CAST((doc_id * {_BK_MULT} + {_BK_SEED}) % {_BK_MOD} AS BIGINT) AS sample_key,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY (doc_id * {_BK_MULT} + {_BK_SEED}) % {_BK_MOD}, doc_id) AS rn
  FROM documents
) WHERE rn <= {_STRAT_K}
"""


def doc_tfidf_top3(sf_dir: str, k: int = 3):
    """Per-document top-k TF-IDF terms — the multi-shuffle text-scoring
    pipeline: (1) per-batch tokenize + (doc, token) tf counts (docs never
    span batches, so per-batch pairs are globally unique); (2) shuffle by
    TOKEN hash — each partition owns its tokens completely, so df (document
    frequency) is a local row count and idf attaches with NO second join;
    (3) shuffle by DOC and take each doc's top-k. idf is integer-quantized
    ((N*1000)//df — exact int arithmetic on both engines) so ranking and
    hashing carry no transcendental-function cross-library hazard; the
    tie-break (tfidf desc, token asc) is mirrored in SQL."""
    from core_ray.stages.agg import _GOLD, _n_parts, hash_strings, map_groups_partitioned

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata row count — no data decode
    n_parts = _n_parts()

    def pair_counts(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        texts = b["text"].to_pylist()
        toks_per_doc = [t.split() for t in texts]
        lens = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64, count=len(texts))
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "token": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "__part": pa.array([], pa.int32()),
            }
        )
        if lens.sum() == 0:
            return empty
        doc_arr = np.repeat(ids, lens)
        tok_arr = np.asarray([w for toks in toks_per_doc for w in toks])
        order = np.lexsort((doc_arr, tok_arr))
        d, t = doc_arr[order], tok_arr[order]
        new = np.ones(len(d), dtype=bool)
        new[1:] = (d[1:] != d[:-1]) | (t[1:] != t[:-1])
        starts = np.nonzero(new)[0]
        tf = np.diff(np.append(starts, len(d))).astype(np.int64)
        toks = pa.array(t[starts], pa.string())
        part = ((hash_strings(toks) * _GOLD) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(d[starts].astype(np.int64), pa.int64()),
                "token": toks,
                "tf": pa.array(tf, pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def attach_idf(g: pa.Table) -> pa.Table:
        # every row of a token is in this partition: df = rows per token
        g = g.drop_columns(["__part"])
        if g.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tfidf": pa.array([], pa.int64()),
                }
            )
        toks = np.asarray(g["token"].to_pylist())
        tf = g["tf"].to_numpy(zero_copy_only=False)
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(toks, kind="stable")
        toks, tf, ids = toks[order], tf[order], ids[order]
        new = np.ones(len(toks), dtype=bool)
        new[1:] = toks[1:] != toks[:-1]
        run_id = np.cumsum(new) - 1
        df = np.bincount(run_id)
        idf_milli = (np.int64(n_docs) * 1000) // df
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "token": pa.array(toks, pa.string()),
                "tfidf": pa.array(tf * idf_milli[run_id], pa.int64()),
            }
        )

    scored = (
        ds.map_batches(pair_counts, batch_format="pyarrow", batch_size=8192)
        .groupby("__part")
        .map_groups(attach_idf, batch_format="pyarrow")
    )

    def top_per_doc(g: pa.Table, k=k) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "token": pa.array([], pa.string()),
                    "tfidf": pa.array([], pa.int64()),
                    "rn": pa.array([], pa.int64()),
                }
            )
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        toks = np.asarray(g["token"].to_pylist())
        s = g["tfidf"].to_numpy(zero_copy_only=False)
        order = np.lexsort((toks, -s, ids))
        ids, toks, s = ids[order], toks[order], s[order]
        idx = np.arange(len(ids), dtype=np.int64)
        new = np.ones(len(ids), dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        seg_start = np.maximum.accumulate(np.where(new, idx, 0))
        rn = idx - seg_start + 1
        keep = rn <= k
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "token": pa.array(toks[keep], pa.string()),
                "tfidf": pa.array(s[keep], pa.int64()),
                "rn": pa.array(rn[keep], pa.int64()),
            }
        )

    return map_groups_partitioned(scored, "doc_id", top_per_doc)


DOC_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents WHERE trim(text) <> ''
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks WHERE token <> '' GROUP BY 1, 2
), df AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY 1
), n AS (SELECT COUNT(*) AS nd FROM documents),
s AS (
  SELECT t.doc_id, t.token, t.tf * ((n.nd * 1000) // d.df) AS tfidf
  FROM tf t JOIN df d USING (token) CROSS JOIN n
)
SELECT doc_id, token, CAST(tfidf AS BIGINT) AS tfidf, CAST(rn AS BIGINT) AS rn FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rn FROM s
) WHERE rn <= 3
"""


# ---------------------------------------------------------------- registry

# ---------------------------------------------------------------- q8/q9/q11/q20/q21 shapes
# The last relational skeletons from the TPC-H family expressible over this
# corpus (no partsupp table exists, so q9/q11/q20 substitute an equivalent
# dim/threshold while keeping the plan shape — noted per query).

_Q8_TYPE = "ECONOMY"
_Q8_REGION = "ASIA"
_Q8_NATION = "NATION_2"  # regionkey 2 = ASIA (n_regionkey = n_nationkey % 5)


def q8_market_share(sf_dir: str):
    """TPC-H q8 shape: national market share — the share of one nation's
    suppliers in a region's market for one part type, by order year. Plan:
    both dims reduce to sorted broadcasts (part -> is-type bit set,
    supplier -> nationkey), the region's customer set prunes orders BEFORE
    the fact-fact hash join on orderkey, and the share is a conditional /
    total ratio of exact 10^-4 integer units with ONE float division per
    year (identical IEEE ops to the SQL)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from core_ray.stages.join import hash_join

    nt = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name", "n_regionkey"])
    rt = pq.read_table(_p(sf_dir, "region"), columns=["r_regionkey", "r_name"])
    region_key = rt["r_regionkey"].to_pylist()[rt["r_name"].to_pylist().index(_Q8_REGION)]
    region_nations = {
        k
        for k, r in zip(nt["n_nationkey"].to_pylist(), nt["n_regionkey"].to_pylist())
        if r == region_key
    }
    nation_key = nt["n_nationkey"].to_pylist()[nt["n_name"].to_pylist().index(_Q8_NATION)]

    # part dim -> sorted partkey set of the target type (broadcast)
    pt = pq.read_table(_p(sf_dir, "part"), columns=["p_partkey", "p_type"])
    pks = np.sort(
        pt.filter(pc.equal(pt["p_type"], _Q8_TYPE))["p_partkey"].to_numpy(
            zero_copy_only=False
        )
    )
    # supplier dim -> sorted suppkey -> nationkey (broadcast)
    st = pq.read_table(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    sk = st["s_suppkey"].to_numpy(zero_copy_only=False)
    sn = st["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sorder = np.argsort(sk, kind="stable")
    bref = ray.put((pks, sk[sorder], sn[sorder]))

    def li_pre(b: pa.Table, bref=bref) -> pa.Table:
        pks, sks, sns = ray.get(bref) if isinstance(bref, ray.ObjectRef) else bref
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        _, keep = _sorted_probe(pks, pk)
        spos, shit = _sorted_probe(sks, b["l_suppkey"].to_numpy(zero_copy_only=False))
        keep &= shit
        units = sql_round_np(
            b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False)[keep])
            * 10000.0,
            0,
        ).astype(np.int64)
        is_nat = (sns[spos][keep] == nation_key).astype(np.int64)
        return pa.table(
            {
                "okey": pa.array(
                    b["l_orderkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "units": pa.array(units, pa.int64()),
                "nat_units": pa.array(units * is_nat, pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(li_pre, batch_format="pyarrow", batch_size=131072)

    # orders in the window, customers in the region (customer dim broadcast)
    ct = pq.read_table(_p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"])
    ck = ct["c_custkey"].to_numpy(zero_copy_only=False)
    cn = ct["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    corder = np.argsort(ck, kind="stable")
    cref = ray.put((ck[corder], cn[corder]))

    def orders_pre(b: pa.Table, cref=cref) -> pa.Table:
        cks, cns = ray.get(cref) if isinstance(cref, ray.ObjectRef) else cref
        pos, hit = _sorted_probe(cks, b["o_custkey"].to_numpy(zero_copy_only=False))
        keep = hit & np.isin(cns[pos], list(region_nations))
        yr = (
            b["o_orderdate"].to_numpy(zero_copy_only=False)[keep]
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        return pa.table(
            {
                "okey": pa.array(
                    b["o_orderkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()
                ),
                "o_year": pa.array(yr, pa.int64()),
            }
        )

    orders = ray.data.read_parquet(
        _p(sf_dir, "orders"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pads.field("o_orderdate") >= datetime(1995, 1, 1))
        & (pads.field("o_orderdate") < datetime(1997, 1, 1)),
    ).map_batches(orders_pre, batch_format="pyarrow", batch_size=131072)

    j = hash_join(li, orders, on="okey")

    def partial(b: pa.Table) -> pa.Table:
        g = pa.TableGroupBy(
            pa.table({"o_year": b["o_year"], "units": b["units"], "nat_units": b["nat_units"]}),
            ["o_year"],
        ).aggregate([("units", "sum"), ("nat_units", "sum")])
        return g

    agg = (
        j.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("o_year")
        .aggregate(Sum("units_sum", alias_name="t"), Sum("nat_units_sum", alias_name="p"))
    )
    t = _collect_table(agg).sort_by("o_year")
    tot = t["t"].to_numpy(zero_copy_only=False).astype(np.float64)
    nat = t["p"].to_numpy(zero_copy_only=False).astype(np.float64)
    share = sql_round_np(nat / tot, 6)
    return pa.table(
        {
            "o_year": pc.cast(t["o_year"], pa.int64()),
            "mkt_share": pa.array(share, pa.float64()),
        }
    )


Q8_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(SUM(CASE WHEN sn.n_name = '{_Q8_NATION}'
                      THEN CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)
                      ELSE 0 END) AS DOUBLE)
             / SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)),
             6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region   ON cn.n_regionkey = r_regionkey
WHERE p_type = '{_Q8_TYPE}' AND r_name = '{_Q8_REGION}'
  AND o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1997-01-01'
GROUP BY 1
"""


_Q9_TOKEN = "widget"


def q9_profit_proxy(sf_dir: str):
    """TPC-H q9 shape: product-type profit by supplier nation and year.
    The corpus has no partsupp, so supply cost is the deterministic proxy
    0.5 * p_retailprice * l_quantity (identical expression in the SQL) —
    the PLAN is q9's: a substring-filtered part dim and the supplier dim
    both attach as sorted broadcasts, profit is exact 10^-4 integer units,
    and the final group is (nation x year) via a per-batch combiner."""
    import pyarrow.parquet as pq
    import ray
    from ray.data.aggregate import Sum

    pt = pq.read_table(_p(sf_dir, "part"), columns=["p_partkey", "p_name", "p_retailprice"])
    m = pc.match_substring(pt["p_name"], _Q9_TOKEN)
    pt = pt.filter(m)
    pk = pt["p_partkey"].to_numpy(zero_copy_only=False)
    price = pt["p_retailprice"].to_numpy(zero_copy_only=False)
    porder = np.argsort(pk, kind="stable")

    st = pq.read_table(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_nationkey"])
    sk = st["s_suppkey"].to_numpy(zero_copy_only=False)
    sn = st["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    sorder = np.argsort(sk, kind="stable")
    bref = ray.put((pk[porder], price[porder], sk[sorder], sn[sorder]))

    def partial(b: pa.Table, bref=bref) -> pa.Table:
        pks, prices, sks, sns = ray.get(bref) if isinstance(bref, ray.ObjectRef) else bref
        ppos, phit = _sorted_probe(pks, b["l_partkey"].to_numpy(zero_copy_only=False))
        spos, shit = _sorted_probe(sks, b["l_suppkey"].to_numpy(zero_copy_only=False))
        keep = phit & shit
        ext = b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
        disc = b["l_discount"].to_numpy(zero_copy_only=False)[keep]
        qty = b["l_quantity"].to_numpy(zero_copy_only=False)[keep]
        cost = prices[ppos][keep]
        profit = sql_round_np(ext * (1.0 - disc) * 10000.0, 0).astype(
            np.int64
        ) - sql_round_np(0.5 * cost * qty * 10000.0, 0).astype(np.int64)
        yr = (
            b["l_shipdate"].to_numpy(zero_copy_only=False)[keep]
            .astype("datetime64[Y]")
            .astype(np.int64)
            + 1970
        )
        t = pa.table(
            {
                "nk": pa.array(sns[spos][keep], pa.int64()),
                "l_year": pa.array(yr, pa.int64()),
                "profit_u": pa.array(profit, pa.int64()),
            }
        )
        return pa.TableGroupBy(t, ["nk", "l_year"]).aggregate([("profit_u", "sum")])

    agg = (
        _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby(["nk", "l_year"])
        .aggregate(Sum("profit_u_sum", alias_name="u"))
    )
    t = _collect_table(agg)
    nt = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nt["n_nationkey"].to_pylist(), nt["n_name"].to_pylist()))
    return pa.table(
        {
            "nation": pa.array([name_of[k] for k in t["nk"].to_pylist()], pa.string()),
            "l_year": pc.cast(t["l_year"], pa.int64()),
            "profit": pa.array(
                sql_round_np(t["u"].to_numpy(zero_copy_only=False) / 10000.0, 2),
                pa.float64(),
            ),
        }
    )


Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 10000.0) AS BIGINT)
               - CAST(ROUND(0.5 * p_retailprice * l_quantity * 10000.0) AS BIGINT))
             / 10000.0, 2) AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%{_Q9_TOKEN}%'
GROUP BY 1, 2
"""


_Q11_FRACTION = 0.02


def q11_balance_concentration(sf_dir: str):
    """TPC-H q11 shape: groups whose aggregate exceeds a fraction of the
    GLOBAL aggregate (scalar-subquery HAVING). No partsupp table, so the
    measured value is supplier account balance by nation; the plan is
    q11's: one distributed pass produces per-group integer-cent sums, the
    global scalar is the sum OF those group sums (no second scan), and the
    threshold compare is one float multiply (identical IEEE ops in SQL)."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    def pre(b: pa.Table) -> pa.Table:
        cents = sql_round_np(
            b["s_acctbal"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        t = pa.table(
            {"nk": pc.cast(b["s_nationkey"], pa.int64()), "cents": pa.array(cents, pa.int64())}
        )
        return pa.TableGroupBy(t, ["nk"]).aggregate([("cents", "sum")])

    agg = (
        _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
        .map_batches(pre, batch_format="pyarrow", batch_size=131072)
        .groupby("nk")
        .aggregate(Sum("cents_sum", alias_name="cents"))
    )
    t = _collect_table(agg)
    cents = t["cents"].to_numpy(zero_copy_only=False).astype(np.int64)
    total = int(cents.sum())
    keep = cents.astype(np.float64) > _Q11_FRACTION * float(total)
    nt = pq.read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    name_of = dict(zip(nt["n_nationkey"].to_pylist(), nt["n_name"].to_pylist()))
    out = pa.table(
        {
            "n_name": pa.array(
                [name_of[k] for k in pc.array_filter(t["nk"], pa.array(keep)).to_pylist()],
                pa.string(),
            ),
            "balance": pa.array(
                sql_round_np(cents[keep] / 100.0, 2), pa.float64()
            ),
        }
    )
    return out.sort_by([("balance", "descending"), ("n_name", "ascending")])


Q11_SQL = f"""
WITH sums AS (
  SELECT s_nationkey AS nk,
         SUM(CAST(ROUND(s_acctbal * 100.0) AS BIGINT)) AS cents
  FROM supplier GROUP BY 1)
SELECT n_name, ROUND(cents / 100.0, 2) AS balance
FROM sums JOIN nation ON nk = n_nationkey
WHERE CAST(cents AS DOUBLE) > {_Q11_FRACTION} * (SELECT CAST(SUM(cents) AS DOUBLE) FROM sums)
ORDER BY balance DESC, n_name
"""


_Q20_BRAND = "Brand#13"
_Q20_YEAR = 1996


def q20_excess_shippers(sf_dir: str):
    """TPC-H q20 shape: suppliers selected by a nested aggregate threshold
    — here, suppliers whose shipped quantity of one brand's parts in one
    year exceeds the per-supplier average of that same aggregate (the
    partsupp availqty threshold re-expressed self-referentially). Plan:
    brand partkeys broadcast as a sorted set, ONE combiner pass sums
    integer centi-units per supplier, the scalar threshold is derived from
    the collected per-supplier sums (tiny: |supplier| rows), and the name
    join is a driver-side dim lookup."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    pt = pq.read_table(_p(sf_dir, "part"), columns=["p_partkey", "p_brand"])
    pks = np.sort(
        pt.filter(pc.equal(pt["p_brand"], _Q20_BRAND))["p_partkey"].to_numpy(
            zero_copy_only=False
        )
    )
    pref = ray.put(pks)

    def pre(b: pa.Table, pref=pref) -> pa.Table:
        pks = ray.get(pref) if isinstance(pref, ray.ObjectRef) else pref
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        _, keep = _sorted_probe(pks, pk)
        cq = sql_round_np(
            b["l_quantity"].to_numpy(zero_copy_only=False)[keep] * 100.0, 0
        ).astype(np.int64)
        t = pa.table(
            {
                "sk": pa.array(b["l_suppkey"].to_numpy(zero_copy_only=False)[keep], pa.int64()),
                "cq": pa.array(cq, pa.int64()),
            }
        )
        return pa.TableGroupBy(t, ["sk"]).aggregate([("cq", "sum")])

    agg = (
        ray.data.read_parquet(
            _p(sf_dir, "lineitem"),
            columns=["l_partkey", "l_suppkey", "l_quantity"],
            filter=(pads.field("l_shipdate") >= datetime(_Q20_YEAR, 1, 1))
            & (pads.field("l_shipdate") < datetime(_Q20_YEAR + 1, 1, 1)),
        )
        .map_batches(pre, batch_format="pyarrow", batch_size=131072)
        .groupby("sk")
        .aggregate(Sum("cq_sum", alias_name="cq"))
    )
    t = _collect_table(agg)
    cq = t["cq"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = len(cq)
    if n == 0:
        return pa.table({"s_name": pa.array([], pa.string()), "qty": pa.array([], pa.float64())})
    thresh = float(cq.sum()) / n  # single division, mirrored in SQL
    keep = cq.astype(np.float64) > thresh
    st = pq.read_table(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    name_of = dict(zip(st["s_suppkey"].to_pylist(), st["s_name"].to_pylist()))
    out = pa.table(
        {
            "s_name": pa.array(
                [name_of[k] for k in pc.array_filter(t["sk"], pa.array(keep)).to_pylist()],
                pa.string(),
            ),
            "qty": pa.array(sql_round_np(cq[keep] / 100.0, 2), pa.float64()),
        }
    )
    return out.sort_by("s_name")


Q20_SQL = f"""
WITH sums AS (
  SELECT l_suppkey AS sk, SUM(CAST(ROUND(l_quantity * 100.0) AS BIGINT)) AS cq
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{_Q20_BRAND}'
    AND l_shipdate >= DATE '{_Q20_YEAR}-01-01' AND l_shipdate < DATE '{_Q20_YEAR + 1}-01-01'
  GROUP BY 1)
SELECT s_name, ROUND(cq / 100.0, 2) AS qty
FROM sums JOIN supplier ON sk = s_suppkey
WHERE CAST(cq AS DOUBLE) > (SELECT CAST(SUM(cq) AS DOUBLE) / COUNT(*) FROM sums)
ORDER BY s_name
"""


def q21_sole_supplier(sf_dir: str):
    """TPC-H q21 shape: per-group EXISTS / NOT-EXISTS over sibling rows —
    here, suppliers who were the SOLE supplier on a multi-line order (the
    corpus has no commit/receipt dates, so 'other supplier kept it
    waiting' becomes 'no other supplier present'; the skeleton — an
    order-grained co-grouping deciding each supplier's membership — is
    q21's). Plan: per-batch combiner computes (orderkey -> count, min supp,
    max supp), ONE hash shuffle co-locates order fragments, a vectorized
    reduceat merge closes each order, and the per-supplier count is a tiny
    final aggregate."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import map_groups_partitioned

    def pre(b: pa.Table) -> pa.Table:
        ok = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = b["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ok, kind="stable")
        oks, sks = ok[order], sk[order]
        new = np.ones(len(oks), dtype=bool)
        if len(oks):
            new[1:] = oks[1:] != oks[:-1]
        starts = np.nonzero(new)[0]
        cnt = np.diff(np.append(starts, len(oks)))
        mn = np.minimum.reduceat(sks, starts) if len(starts) else sks[:0]
        mx = np.maximum.reduceat(sks, starts) if len(starts) else sks[:0]
        return pa.table(
            {
                "okey": pa.array(oks[starts], pa.int64()),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
                "mn": pa.array(mn, pa.int64()),
                "mx": pa.array(mx, pa.int64()),
            }
        )

    def close_orders(g: pa.Table) -> pa.Table:
        ok = g["okey"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        mn = g["mn"].to_numpy(zero_copy_only=False)
        mx = g["mx"].to_numpy(zero_copy_only=False)
        order = np.argsort(ok, kind="stable")
        oks = ok[order]
        new = np.ones(len(oks), dtype=bool)
        if len(oks):
            new[1:] = oks[1:] != oks[:-1]
        starts = np.nonzero(new)[0]
        tot = np.add.reduceat(n[order], starts) if len(starts) else n[:0]
        tmn = np.minimum.reduceat(mn[order], starts) if len(starts) else mn[:0]
        tmx = np.maximum.reduceat(mx[order], starts) if len(starts) else mx[:0]
        sole = (tot >= 2) & (tmn == tmx)
        t = pa.table({"sk": pa.array(tmn[sole], pa.int64())})
        t = t.append_column("one", pa.array(np.ones(len(t), np.int64), pa.int64()))
        return pa.TableGroupBy(t, ["sk"]).aggregate([("one", "sum")])

    per_supp = (
        map_groups_partitioned(
            _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).map_batches(
                pre, batch_format="pyarrow", batch_size=131072
            ),
            "okey",
            close_orders,
        )
        .groupby("sk")
        .aggregate(Sum("one_sum", alias_name="numsole"))
    )
    t = _collect_table(per_supp)
    st = pq.read_table(_p(sf_dir, "supplier"), columns=["s_suppkey", "s_name"])
    name_of = dict(zip(st["s_suppkey"].to_pylist(), st["s_name"].to_pylist()))
    out = pa.table(
        {
            "s_name": pa.array([name_of[k] for k in t["sk"].to_pylist()], pa.string()),
            "numsole": pc.cast(t["numsole"], pa.int64()),
        }
    ).sort_by([("numsole", "descending"), ("s_name", "ascending")])
    return out.slice(0, 20)


Q21_SQL = """
WITH per_order AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n,
         MIN(l_suppkey) AS mn, MAX(l_suppkey) AS mx
  FROM lineitem GROUP BY 1)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numsole
FROM per_order JOIN supplier ON mn = s_suppkey
WHERE n >= 2 AND mn = mx
GROUP BY 1 ORDER BY numsole DESC, s_name LIMIT 20
"""


# --- corpus-curation operators (round 3d): contamination / novelty / PII ---


def _word_ngrams(texts: list[str], n: int) -> tuple[np.ndarray, np.ndarray]:
    """All word-level n-grams (space-joined, split(' ') to mirror DuckDB's
    string_split) across ``texts``, fully vectorized: one flat word array,
    gram strings built by n-1 chained np.char.add calls over shifted views
    — no per-gram Python. Returns (row_idx int64, grams unicode) where
    row_idx indexes into ``texts``; rows with < n words contribute nothing."""
    words_per = [t.split(" ") for t in texts]
    counts = np.fromiter((len(w) for w in words_per), np.int64, len(words_per))
    flat = np.asarray([w for ws in words_per for w in ws])
    if len(flat) == 0:
        return np.empty(0, np.int64), np.empty(0, dtype="U1")
    ends = np.cumsum(counts)
    row_of = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
    pos = np.arange(len(flat), dtype=np.int64)
    valid = pos + (n - 1) < ends[row_of]  # gram must not cross a row boundary
    starts = pos[valid]
    grams = flat[starts]
    for k in range(1, n):
        grams = np.char.add(np.char.add(grams, " "), flat[starts + k])
    return row_of[valid], grams


_CONTAM_MOD = 97  # benchmark set = docs with doc_id % 97 == 0 (first 8-gram)
_CONTAM_N = 8


def doc_contamination(sf_dir: str):
    """Benchmark-contamination check (the decontamination operator every
    published LLM data pipeline runs): a small 'benchmark' set of 8-gram
    probes — here the first 8 words of every (doc_id %% 97 == 0) document —
    is broadcast, and each document reports how many DISTINCT probes its
    word-8-gram set contains. Scale shape: the probe side is tiny by
    construction (broadcast once via the closure), the corpus side is one
    map_batches with vectorized gram construction + np.isin — grams are
    never shuffled. Word-level gram equality (not raw substring search) on
    both sides, so the oracle joins on identical gram strings."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def probe_grams(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        keep = ids % _CONTAM_MOD == 0
        # Arrow-filter FIRST: only the ~1/97 probe rows' text bytes ever
        # become Python strings
        texts = b.filter(pa.array(keep))["text"].to_pylist()
        out = []
        for t in texts:
            w = t.split(" ")
            if len(w) >= _CONTAM_N:
                out.append(" ".join(w[:_CONTAM_N]))
        return pa.table({"gram": pa.array(out, pa.string())})

    bench = np.unique(
        np.asarray(
            _collect_table(
                ds.map_batches(probe_grams, batch_format="pyarrow")
            )["gram"].to_pylist()
        )
    )

    def scan(b: pa.Table) -> pa.Table:
        ridx, grams = _word_ngrams(b["text"].to_pylist(), _CONTAM_N)
        hit = np.isin(grams, bench)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        if not hit.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "n_hits": pa.array([], pa.int64())}
            )
        # COUNT(DISTINCT gram) per doc: dedupe (row, gram) hit pairs
        pairs = np.unique(
            np.stack([ridx[hit], np.searchsorted(bench, grams[hit])], axis=1),
            axis=0,
        )
        rows, n_hits = np.unique(pairs[:, 0], return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(ids[rows], pa.int64()),
                "n_hits": pa.array(n_hits.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(scan, batch_format="pyarrow", batch_size=4096)


DOC_CONTAMINATION_SQL = f"""
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
bench AS (
  SELECT DISTINCT l[1] || ' ' || l[2] || ' ' || l[3] || ' ' || l[4] || ' ' ||
                  l[5] || ' ' || l[6] || ' ' || l[7] || ' ' || l[8] AS gram
  FROM ws WHERE doc_id % {_CONTAM_MOD} = 0 AND len(l) >= {_CONTAM_N}),
grams AS (
  SELECT doc_id,
         UNNEST(list_transform(generate_series(1, len(l) - {_CONTAM_N - 1}),
                i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
                     || ' ' || l[i+4] || ' ' || l[i+5] || ' ' || l[i+6]
                     || ' ' || l[i+7])) AS gram
  FROM ws)
SELECT g.doc_id, CAST(COUNT(DISTINCT g.gram) AS BIGINT) AS n_hits
FROM grams g JOIN bench b USING (gram) GROUP BY 1
"""


def doc_ngram_novelty(sf_dir: str, n: int = 3, broadcast_max: int = 2_000_000):
    """Per-document n-gram novelty: the fraction of a document's word
    3-grams that occur exactly once in the WHOLE corpus (a dedup-adjacent
    curation signal — low novelty means templated/duplicated text). Pass 1
    is combiner-first exact global gram counts — per-batch np.unique
    partials, hash-partitioned by gram string so each partition's sums are
    global (the vocab-count shape). Pass 2 is ADAPTIVE (the same guard
    pattern as the minhash verify join): when the singleton-gram set fits
    ``broadcast_max`` it is broadcast once and each document scores inside
    ONE map_batches (documents are row-local, so no join and no per-doc
    shuffle exist at all); above the guard, per-doc gram rows hash-join to
    the counts (stages/join.py — fully distributed, the singleton set is
    O(corpus) at real scale) and a partitioned reduceat finishes. Both
    paths are exact and value-identical (unit-tested)."""
    from core_ray.stages.agg import (
        _GOLD,
        _n_parts,
        hash_strings,
        map_groups_partitioned,
    )
    from core_ray.stages.join import hash_join

    n_parts = _n_parts()

    def gram_counts(b: pa.Table) -> pa.Table:
        _, grams = _word_ngrams(b["text"].to_pylist(), n)
        u, c = np.unique(grams, return_counts=True)
        h = hash_strings(pa.array(u, pa.string()))
        part = ((h * _GOLD) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                "gram": pa.array(u, pa.string()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def reduce_counts(g: pa.Table) -> pa.Table:
        grams = np.asarray(g["gram"].to_pylist())
        cnts = g["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(grams, kind="stable")
        gs, cs = grams[order], cnts[order]
        new = np.ones(len(gs), dtype=bool)
        new[1:] = gs[1:] != gs[:-1]
        starts = np.nonzero(new)[0]
        return pa.table(
            {
                "gram": pa.array(gs[starts], pa.string()),
                "cnt": pa.array(np.add.reduceat(cs, starts).astype(np.int64), pa.int64()),
            }
        )

    counts = (
        _read(sf_dir, "documents", ["text"])
        .map_batches(gram_counts, batch_format="pyarrow", batch_size=4096)
        .groupby("__part")
        .map_groups(reduce_counts, batch_format="pyarrow")
    ).materialize()  # O(distinct grams), reused by whichever pass-2 path wins

    singles = counts.filter(expr="cnt == 1")
    n_singles = singles.count()
    if n_singles <= broadcast_max:
        import ray

        bench = np.sort(
            np.asarray(_collect_table(singles.select_columns(["gram"]))["gram"].to_pylist())
        )
        ref = ray.put(bench)

        def score(b: pa.Table) -> pa.Table:
            singleton = ray.get(ref)  # zero-copy plasma read, cached per worker
            ridx, grams = _word_ngrams(b["text"].to_pylist(), n)
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            if len(ridx) == 0:
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "n_grams": pa.array([], pa.int64()),
                        "novel_frac": pa.array([], pa.float64()),
                    }
                )
            novel = np.isin(grams, singleton).astype(np.int64)
            rows, starts = np.unique(ridx, return_index=True)  # ridx is sorted
            tot = np.diff(np.append(starts, len(ridx)))
            nov = np.add.reduceat(novel, starts)
            return pa.table(
                {
                    "doc_id": pa.array(ids[rows], pa.int64()),
                    "n_grams": pa.array(tot.astype(np.int64), pa.int64()),
                    "novel_frac": pa.array(
                        sql_round_np(nov.astype(np.float64) / tot.astype(np.float64), 6),
                        pa.float64(),
                    ),
                }
            )

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            score, batch_format="pyarrow", batch_size=4096
        )

    def doc_grams(b: pa.Table) -> pa.Table:
        ridx, grams = _word_ngrams(b["text"].to_pylist(), n)
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[ridx], pa.int64()),
                "gram": pa.array(grams, pa.string()),
            }
        )

    grams_ds = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        doc_grams, batch_format="pyarrow", batch_size=4096
    )
    joined = hash_join(grams_ds, counts, on="gram")

    def partial(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        novel = (b["cnt"].to_numpy(zero_copy_only=False) == 1).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        ids, novel = ids[order], novel[order]
        new = np.ones(len(ids), dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        starts = np.nonzero(new)[0]
        return pa.table(
            {
                "doc_id": pa.array(ids[starts], pa.int64()),
                "n_part": pa.array(
                    np.add.reduceat(np.ones(len(ids), np.int64), starts), pa.int64()
                ),
                "novel_part": pa.array(np.add.reduceat(novel, starts), pa.int64()),
            }
        )

    def finish(g: pa.Table) -> pa.Table:
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        nn = g["n_part"].to_numpy(zero_copy_only=False)
        nv = g["novel_part"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids, nn, nv = ids[order], nn[order], nv[order]
        new = np.ones(len(ids), dtype=bool)
        new[1:] = ids[1:] != ids[:-1]
        starts = np.nonzero(new)[0]
        tot = np.add.reduceat(nn, starts)
        nov = np.add.reduceat(nv, starts)
        return pa.table(
            {
                "doc_id": pa.array(ids[starts], pa.int64()),
                "n_grams": pa.array(tot.astype(np.int64), pa.int64()),
                "novel_frac": pa.array(
                    sql_round_np(nov.astype(np.float64) / tot.astype(np.float64), 6),
                    pa.float64(),
                ),
            }
        )

    return map_groups_partitioned(
        joined.map_batches(partial, batch_format="pyarrow", batch_size=65536),
        "doc_id",
        finish,
    )


DOC_NGRAM_NOVELTY_SQL = """
WITH ws AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
g AS (
  SELECT doc_id,
         UNNEST(list_transform(generate_series(1, len(l) - 2),
                i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2])) AS gram
  FROM ws),
c AS (SELECT gram, COUNT(*) AS cnt FROM g GROUP BY 1)
SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       ROUND(CAST(SUM(CASE WHEN c.cnt = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS novel_frac
FROM g JOIN c USING (gram) GROUP BY 1
"""


DOC_CURATED_V2_SQL = f"""
WITH v1 AS ({DOC_CURATED_SQL}),
contam AS ({DOC_CONTAMINATION_SQL}),
nov AS ({DOC_NGRAM_NOVELTY_SQL})
SELECT v1.* FROM v1
WHERE v1.doc_id NOT IN (SELECT doc_id FROM contam WHERE doc_id % {_CONTAM_MOD} != 0)
  AND v1.doc_id NOT IN (SELECT doc_id FROM nov WHERE novel_frac < 0.1)
"""


# PII scrubbing runs on an engineered corpus with PLANTED identifiers (the
# synthetic documents table contains none); the oracle is NOT a golden — it
# is DuckDB independently re-running the same two RE2 regexes over the same
# parquet, so redaction semantics are double-implemented and hash-compared.
_PII_VERSION = 1
_PII_N = 240
_PII_EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE_PAT = r"\+?\d{1,3}[ -]\d{3}[ -]\d{4}"


def _pii_dir() -> str:
    return f"/tmp/core_ray_pii_v{_PII_VERSION}"


def _ensure_pii_corpus() -> None:
    root = _pii_dir()
    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        return
    import pyarrow.parquet as pq

    filler = [
        "please reach out about the order",
        "support hours are nine to five",
        "the meeting moved to thursday",
        "no contact details in this row at all",
    ]
    ids, texts = [], []
    for i in range(_PII_N):
        parts = [filler[i % len(filler)]]
        if i % 3 != 2:  # two thirds carry an email
            parts.append(f"mail user{i}.dev@example{i % 7}.org today")
        if i % 4 != 3:  # three quarters carry a phone
            parts.append(f"call +{1 + i % 89} 555-{1000 + i} now")
        if i % 12 == 0:  # some rows carry a second email
            parts.append(f"cc backup_{i}@mail{i % 5}.example.net too")
        ids.append(i)
        texts.append(" ".join(parts))
    t = pa.table(
        {"pii_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())}
    )
    os.makedirs(root, exist_ok=True)
    pq.write_table(t, f"{root}/pii.parquet")
    with open(marker, "w") as f:
        f.write("ok")


def doc_pii_scrub(sf_dir: str):
    """PII redaction (the scrubbing pass every published LLM corpus
    pipeline runs before training): emails then phone numbers are replaced
    with typed placeholders, and per-row match counts are reported from the
    ORIGINAL text. Pure vectorized Arrow kernels (count_substring_regex /
    replace_substring_regex — RE2, the same engine DuckDB's regexp_* use,
    so the oracle re-derives the result independently), one map_batches, no
    shuffle; documents are row-local at any scale."""
    import ray.data

    _ensure_pii_corpus()
    ds = ray.data.read_parquet(f"{_pii_dir()}/pii.parquet")

    def scrub(b: pa.Table) -> pa.Table:
        text = b["text"]
        n_em = pc.count_substring_regex(text, _PII_EMAIL_PAT)
        n_ph = pc.count_substring_regex(text, _PII_PHONE_PAT)
        clean = pc.replace_substring_regex(
            pc.replace_substring_regex(text, _PII_EMAIL_PAT, "<EMAIL>"),
            _PII_PHONE_PAT,
            "<PHONE>",
        )
        return pa.table(
            {
                "pii_id": b["pii_id"],
                "n_emails": pc.cast(n_em, pa.int64()),
                "n_phones": pc.cast(n_ph, pa.int64()),
                "clean_text": clean,
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow", batch_size=4096)


DOC_PII_SCRUB_SQL = f"""
SELECT pii_id,
       CAST(len(regexp_extract_all(text, '{_PII_EMAIL_PAT}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PII_PHONE_PAT}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(text, '{_PII_EMAIL_PAT}', '<EMAIL>', 'g'),
                      '{_PII_PHONE_PAT}', '<PHONE>', 'g') AS clean_text
FROM read_parquet('{{pii_dir}}/pii.parquet')
""".replace("{pii_dir}", _pii_dir())


_DOMAIN_PAT = r"^https?://(?:[A-Za-z0-9-]+\.)*?([A-Za-z0-9-]+\.[A-Za-z0-9-]+)(?::\d+)?/"


def pages_domain_stats(sf_dir: str):
    """Per-registered-domain crawl rollup over the pages corpus (the
    domain-level curation view: crawl budget, dedup and quality decisions
    are made per domain at Common-Crawl scale): registered domain = last
    two host labels, extracted by ONE RE2 regex shared verbatim with the
    oracle. Combiner-first: per batch the (domain, lang) partials collapse
    via np.unique, then one hash-partition shuffle carries only the tiny
    partial rows, and a reduceat finish computes exact page counts, total
    text chars and distinct-lang counts per domain."""
    from core_ray.stages.agg import _GOLD, _n_parts, hash_strings

    _pages_corpus(sf_dir)  # ensure the corpus parquet exists at this sf
    import ray.data

    n = _PAGES_N_BY_SF.get(_sf_of(sf_dir), 2000)
    ds = ray.data.read_parquet(
        f"/tmp/core_ray_pages_v{_PAGES_GEN_VERSION}_{n}/pages",
        columns=["url", "text", "lang"],
    )
    n_parts = _n_parts()

    # pc.extract_regex needs a NAMED group; the oracle uses the same pattern
    # with the plain group (DuckDB regexp_extract is index-addressed)
    named_pat = _DOMAIN_PAT.replace("([A-Za-z", "(?P<d>[A-Za-z", 1)

    def partial(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["url"], named_pat)
        # non-matching urls -> '' exactly like the oracle's regexp_extract
        dom = np.asarray(
            [d if d is not None else "" for d in pc.struct_field(m, "d").to_pylist()]
        )
        langs = np.asarray(b["lang"].to_pylist())
        chars = pc.utf8_length(b["text"]).to_numpy(zero_copy_only=False).astype(np.int64)
        keys = np.char.add(np.char.add(dom, "|"), langs)
        order = np.argsort(keys, kind="stable")
        ks, ch = keys[order], chars[order]
        new = np.ones(len(ks), dtype=bool)
        new[1:] = ks[1:] != ks[:-1]
        starts = np.nonzero(new)[0]
        uk = ks[starts]
        n_pages = np.add.reduceat(np.ones(len(ks), np.int64), starts)
        tot_chars = np.add.reduceat(ch, starts)
        ud = np.asarray([k.split("|")[0] for k in uk])
        ul = np.asarray([k.split("|")[1] for k in uk])
        h = hash_strings(pa.array(ud, pa.string()))
        part = ((h * _GOLD) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                "domain": pa.array(ud, pa.string()),
                "lang": pa.array(ul, pa.string()),
                "n_pages": pa.array(n_pages, pa.int64()),
                "total_chars": pa.array(tot_chars, pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def finish(g: pa.Table) -> pa.Table:
        dom = np.asarray(g["domain"].to_pylist())
        lang = np.asarray(g["lang"].to_pylist())
        np_pages = g["n_pages"].to_numpy(zero_copy_only=False)
        tc = g["total_chars"].to_numpy(zero_copy_only=False)
        keys = np.char.add(np.char.add(dom, "|"), lang)
        order = np.argsort(keys, kind="stable")
        keys, dom, lang = keys[order], dom[order], lang[order]
        np_pages, tc = np_pages[order], tc[order]
        new = np.ones(len(keys), dtype=bool)
        new[1:] = keys[1:] != keys[:-1]
        starts = np.nonzero(new)[0]
        # collapse to (domain, lang) totals, then roll up per domain
        d2, n2 = dom[starts], np.add.reduceat(np_pages, starts)
        c2 = np.add.reduceat(tc, starts)
        order2 = np.argsort(d2, kind="stable")
        d2, n2, c2 = d2[order2], n2[order2], c2[order2]
        new2 = np.ones(len(d2), dtype=bool)
        new2[1:] = d2[1:] != d2[:-1]
        s2 = np.nonzero(new2)[0]
        return pa.table(
            {
                "domain": pa.array(d2[s2], pa.string()),
                "n_pages": pa.array(np.add.reduceat(n2, s2).astype(np.int64), pa.int64()),
                "n_langs": pa.array(
                    np.add.reduceat(np.ones(len(d2), np.int64), s2), pa.int64()
                ),
                "total_chars": pa.array(np.add.reduceat(c2, s2).astype(np.int64), pa.int64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(finish, batch_format="pyarrow")
    )


PAGES_DOMAIN_STATS_SQL = f"""
WITH p AS (
  SELECT regexp_extract(url, '{_DOMAIN_PAT}', 1) AS domain, lang,
         CAST(length(text) AS BIGINT) AS chars
  FROM read_parquet('{_PAGES_CORPUS_GLOB}'))
SELECT domain, CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(chars) AS BIGINT) AS total_chars
FROM p GROUP BY 1
"""


# --- fuzzy string-match join (FastSS deletion-variant candidates) ----------
# Engineered word table (planted typos), like the PII corpus: the synthetic
# documents vocabulary is too small to exercise edit-distance joins.
_TYPO_VERSION = 1
_TYPO_BASE = 600


def _typo_dir() -> str:
    return f"/tmp/core_ray_typos_v{_TYPO_VERSION}"


def _ensure_typo_corpus() -> None:
    root = _typo_dir()
    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        return
    import pyarrow.parquet as pq

    rng = np.random.default_rng(1234)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    ids, words = [], []
    for i in range(_TYPO_BASE):
        ln = int(rng.integers(5, 10))
        w = "".join(letters[rng.integers(0, 26, ln)])
        ids.append(2 * i)
        words.append(w)
        if i % 2 == 0:  # half the base words get one planted typo variant
            kind = i % 3
            pos = int(rng.integers(0, len(w)))
            if kind == 0:  # deletion
                v = w[:pos] + w[pos + 1 :]
            elif kind == 1:  # substitution
                v = w[:pos] + str(letters[(ord(w[pos]) - 97 + 1) % 26]) + w[pos + 1 :]
            else:  # insertion
                v = w[:pos] + str(letters[rng.integers(0, 26)]) + w[pos:]
            ids.append(2 * i + 1)
            words.append(v)
    t = pa.table(
        {"typo_id": pa.array(ids, pa.int64()), "word": pa.array(words, pa.string())}
    )
    os.makedirs(root, exist_ok=True)
    pq.write_table(t, f"{root}/typos.parquet")
    with open(marker, "w") as f:
        f.write("ok")


def _lev_le1(a: str, b: str) -> bool:
    """Exact levenshtein(a, b) <= 1 (verify kernel for FastSS candidates)."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is a by one insertion? single skip allowed
    i = j = 0
    skipped = False
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
        elif skipped:
            return False
        else:
            skipped = True
            j += 1
    return True


def doc_typo_pairs(sf_dir: str):
    """Fuzzy string-match self-join: all word pairs within edit distance 1,
    via the published FastSS deletion-variant technique — each word emits
    its |w|+1 single-deletion variants (itself included); two words within
    distance 1 ALWAYS share a variant, so candidates come from ONE
    hash-partition shuffle on the variant string (no all-pairs anywhere),
    then an exact O(len) verify kernel filters the false positives the
    variant collision admits (e.g. 'ab'/'ba'). Pairs found through several
    shared variants dedupe per partition by a packed (id_a, id_b) u64.
    Oracle: DuckDB's built-in levenshtein over the engineered word table —
    an independent O(n²) re-derivation of the same pair set."""
    import ray.data

    from core_ray.stages.agg import _GOLD, _n_parts, hash_strings

    _ensure_typo_corpus()
    ds = ray.data.read_parquet(f"{_typo_dir()}/typos.parquet")
    n_parts = _n_parts()

    def variants(b: pa.Table) -> pa.Table:
        ids = b["typo_id"].to_numpy(zero_copy_only=False)
        words = b["word"].to_pylist()
        v_ids, v_words, v_vars = [], [], []
        for i, w in zip(ids, words):
            for p in range(len(w) + 1):
                v = w if p == len(w) else w[:p] + w[p + 1 :]
                v_ids.append(i)
                v_words.append(w)
                v_vars.append(v)
        h = hash_strings(pa.array(v_vars, pa.string()))
        part = ((h * _GOLD) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                "typo_id": pa.array(v_ids, pa.int64()),
                "word": pa.array(v_words, pa.string()),
                "variant": pa.array(v_vars, pa.string()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def pairs(g: pa.Table) -> pa.Table:
        ids = g["typo_id"].to_numpy(zero_copy_only=False)
        words = np.asarray(g["word"].to_pylist(), dtype=object)
        var = np.asarray(g["variant"].to_pylist())
        order = np.argsort(var, kind="stable")
        ids, words, var = ids[order], words[order], var[order]
        new = np.ones(len(var), dtype=bool)
        new[1:] = var[1:] != var[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(var))
        out_a, out_b, wa, wb = [], [], [], []
        seen = set()
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            seg_ids, seg_words = ids[s:e], words[s:e]
            iu, ju = np.triu_indices(e - s, k=1)
            for i, j in zip(iu, ju):
                a, b = int(seg_ids[i]), int(seg_ids[j])
                if a == b:
                    continue  # same word via two of its own variants
                if a > b:
                    a, b = b, a
                    i, j = j, i
                key = (a << 32) | b
                if key in seen:
                    continue
                seen.add(key)
                if _lev_le1(seg_words[i], seg_words[j]):
                    out_a.append(a)
                    out_b.append(b)
                    wa.append(seg_words[i])
                    wb.append(seg_words[j])
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "word_a": pa.array(wa, pa.string()),
                "word_b": pa.array(wb, pa.string()),
            }
        )

    cand = (
        ds.map_batches(variants, batch_format="pyarrow", batch_size=4096)
        .groupby("__part")
        .map_groups(pairs, batch_format="pyarrow")
    )

    # cross-partition dedupe: the same pair can surface in DIFFERENT
    # partitions (different shared variants); one tiny distinct pass
    # co-locating rows by the packed pair key
    from core_ray.stages.agg import map_groups_partitioned

    def add_key(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        bb = b["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return b.append_column("pkey", pa.array((a << np.uint64(32)) | bb, pa.uint64()))

    def uniq(g: pa.Table) -> pa.Table:
        _, first = np.unique(g["pkey"].to_numpy(zero_copy_only=False), return_index=True)
        return g.select(["id_a", "id_b", "word_a", "word_b"]).take(
            pa.array(np.sort(first))
        )

    return map_groups_partitioned(
        cand.map_batches(add_key, batch_format="pyarrow"), "pkey", uniq
    )


DOC_TYPO_PAIRS_SQL = f"""
SELECT a.typo_id AS id_a, b.typo_id AS id_b, a.word AS word_a, b.word AS word_b
FROM read_parquet('{_typo_dir()}/typos.parquet') a
JOIN read_parquet('{_typo_dir()}/typos.parquet') b
  ON a.typo_id < b.typo_id AND levenshtein(a.word, b.word) <= 1
"""


def emb_triangles(sf_dir: str):
    """Distributed triangle counting over the embedding near-dup graph (the
    node-iterator algorithm): edges (a < b) hash-partition by their SMALLER
    endpoint; each partition emits wedges (u, v) from every node's
    greater-neighbor list — so each triangle is generated exactly once, at
    its smallest vertex — and wedges close into triangles via the
    distributed hash join against the edge set on a packed (u, v) u64 key.
    Wedge explosion is O(sum deg²); at corpus scale the standard hatches
    are degree-capping the hub nodes or edge-sampling (documented, not
    needed at these densities). Triangle density here measures how clique-
    like near-dup clusters are — a dedup-quality diagnostic."""
    from core_ray.stages.agg import map_groups_partitioned
    from core_ray.stages.join import hash_join

    # materialized once: both the wedge pass and the closing join consume it
    edges = (
        emb_near_dup_pairs(sf_dir).select_columns(["vec_id_a", "vec_id_b"]).materialize()
    )

    def pack(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        return (a.astype(np.uint64) << np.uint64(32)) | b.astype(np.uint64)

    def wedges(g: pa.Table) -> pa.Table:
        a = g["vec_id_a"].to_numpy(zero_copy_only=False)
        bb = g["vec_id_b"].to_numpy(zero_copy_only=False)
        order = np.lexsort((bb, a))
        a, bb = a[order], bb[order]
        new = np.ones(len(a), dtype=bool)
        new[1:] = a[1:] != a[:-1]
        starts = np.nonzero(new)[0]
        ends = np.append(starts[1:], len(a))
        out = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            nb = bb[s:e]  # sorted greater-neighbors of one node
            iu, ju = np.triu_indices(e - s, k=1)
            out.append(pack(nb[iu], nb[ju]))
        keys = np.concatenate(out) if out else np.zeros(0, dtype=np.uint64)
        return pa.table({"wkey": pa.array(keys, pa.uint64())})

    wedge_ds = map_groups_partitioned(edges, "vec_id_a", wedges)

    def edge_keys(b: pa.Table) -> pa.Table:
        a = b["vec_id_a"].to_numpy(zero_copy_only=False)
        bb = b["vec_id_b"].to_numpy(zero_copy_only=False)
        return pa.table({"wkey": pa.array(pack(a, bb), pa.uint64())})

    ekey_ds = edges.map_batches(edge_keys, batch_format="pyarrow")
    sch = pa.schema([("wkey", pa.uint64())])
    closed = hash_join(
        wedge_ds, ekey_ds, on="wkey", left_schema=sch, right_schema=sch
    )
    return pa.table({"n_triangles": pa.array([closed.count()], pa.int64())})


EMB_TRIANGLES_SQL = f"""
WITH e AS ({EMB_NEAR_DUP_SQL})
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.vec_id_a = e1.vec_id_a AND e2.vec_id_b > e1.vec_id_b
JOIN e e3 ON e3.vec_id_a = e1.vec_id_b AND e3.vec_id_b = e2.vec_id_b
"""


# --- iterative PageRank over the near-dup graph (golden-diff oracle) -------
# SQL cannot express fixed-point iteration with aggregation (recursive CTEs
# forbid GROUP BY in the recursive term), so — exactly like the sketch/ANN
# queries — the oracle is an INDEPENDENT single-process re-derivation
# (plain numpy O(n²) pair scan + dict adjacency + Python loop iteration)
# materialized as parquet. Both sides round ranks to 12 dp per iteration
# (resetting float-order drift far below the final 6-dp rounding granule).
_PAGERANK_ITERS = 10
_PAGERANK_D = 0.85
_PAGERANK_SF = 0.01
_PAGERANK_VERSION = 1


def _pagerank_dir() -> str:
    return f"/tmp/core_ray_pagerank_v{_PAGERANK_VERSION}"


def _ensure_pagerank_golden(sf_dir: str) -> None:
    if _sf_of(sf_dir) != _PAGERANK_SF:
        return
    root = _pagerank_dir()
    marker = os.path.join(root, ".complete")
    if os.path.exists(marker):
        return
    import pyarrow.parquet as pq

    emb = pq.read_table(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    ids = np.asarray(emb["vec_id"].to_pylist(), dtype=np.int64)
    x = np.array(emb["embedding"].to_pylist(), dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
    sims = sql_round_np(x @ x.T, 6)
    iu, ju = np.nonzero(np.triu(sims >= 0.35, k=1))
    adj: dict[int, list[int]] = {}
    for a, b in zip(ids[iu], ids[ju]):
        adj.setdefault(int(a), []).append(int(b))
        adj.setdefault(int(b), []).append(int(a))
    nodes = sorted(adj)
    n = len(nodes)
    rank = {m: 1.0 / n for m in nodes}
    for _ in range(_PAGERANK_ITERS):
        rank = {
            m: round(
                (1.0 - _PAGERANK_D) / n
                + _PAGERANK_D * sum(rank[nb] / len(adj[nb]) for nb in adj[m]),
                12,
            )
            for m in nodes
        }
    t = pa.table(
        {
            "vec_id": pa.array(nodes, pa.int64()),
            "rank": pa.array(
                [float(sql_round_np(rank[m], 6)) for m in nodes], pa.float64()
            ),
        }
    )
    os.makedirs(root, exist_ok=True)
    pq.write_table(t, f"{root}/pagerank.parquet")
    with open(marker, "w") as f:
        f.write("ok")


def emb_pagerank(sf_dir: str, shard_above_edges: int = 50_000_000):
    """Iterative distributed PageRank (damping 0.85, 10 synchronous
    iterations) over the undirected near-dup graph — the iterative-dataflow
    class beyond connected components. Shape: the edge table stays
    DISTRIBUTED and materialized once; each iteration is one map_batches
    pass that joins the broadcast rank vector against its edge batch (rank
    and degree lookups are vectorized np.searchsorted against the sorted
    node array) and emits per-batch partial dst sums; the driver merges
    the O(nodes) partials and re-broadcasts. The rank vector is bounded by
    the PAIRED-node count (tiny next to the corpus, same bound as the
    dedup keep list) — and above ``shard_above_edges`` undirected edges
    the rank vector never reaches the driver at all: the iteration
    switches to stages/pagerank.pagerank_sharded (distributed rank table,
    per-iteration hash_join + fsum_by_u64), value-identical under the
    shared per-iteration 1e-12 rounding contract (equivalence-forced in
    tests/test_pagerank.py; see stages/pagerank.py for the boundary
    caveat)."""
    import ray

    _ensure_pagerank_golden(sf_dir)

    # consumed exactly once (by the undirected expansion, which is itself
    # materialized) — no extra materialize here
    edges = emb_near_dup_pairs(sf_dir).select_columns(["vec_id_a", "vec_id_b"])

    def expand(b: pa.Table) -> pa.Table:
        a = b["vec_id_a"].to_numpy(zero_copy_only=False)
        bb = b["vec_id_b"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, bb]), pa.int64()),
                "dst": pa.array(np.concatenate([bb, a]), pa.int64()),
            }
        )

    und = edges.map_batches(expand, batch_format="pyarrow").materialize()

    # und holds BOTH directions (2 rows per undirected edge)
    if und.count() > 2 * shard_above_edges:
        from core_ray.stages.pagerank import pagerank_sharded

        out = _collect_table(pagerank_sharded(und, _PAGERANK_ITERS, _PAGERANK_D))
        nodes = out["node"].to_numpy(zero_copy_only=False)
        ranks = out["rank"].to_numpy(zero_copy_only=False)
        order = np.argsort(nodes, kind="stable")
        return pa.table(
            {
                "vec_id": pa.array(nodes[order], pa.int64()),
                "rank": pa.array(sql_round_np(ranks[order], 6), pa.float64()),
            }
        )

    # node + degree table: tiny by construction -> driver-side arrays
    def deg_partial(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        u, c = np.unique(s, return_counts=True)
        return pa.table(
            {"node": pa.array(u, pa.int64()), "c": pa.array(c.astype(np.int64), pa.int64())}
        )

    dp = _collect_table(und.map_batches(deg_partial, batch_format="pyarrow"))
    nodes_u, inv = np.unique(dp["node"].to_numpy(zero_copy_only=False), return_inverse=True)
    deg = np.bincount(inv, weights=dp["c"].to_numpy(zero_copy_only=False)).astype(
        np.float64
    )
    n = len(nodes_u)
    if n == 0:
        return pa.table(
            {"vec_id": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())}
        )
    rank = np.full(n, 1.0 / n)

    for _ in range(_PAGERANK_ITERS):
        state = ray.put((nodes_u, rank / deg))

        def contrib(b: pa.Table, state=state) -> pa.Table:
            nd, share = ray.get(state)
            s = b["src"].to_numpy(zero_copy_only=False)
            dst = b["dst"].to_numpy(zero_copy_only=False)
            vals = share[np.searchsorted(nd, s)]
            order = np.argsort(dst, kind="stable")
            dsts, vs = dst[order], vals[order]
            new = np.ones(len(dsts), dtype=bool)
            new[1:] = dsts[1:] != dsts[:-1]
            starts = np.nonzero(new)[0]
            return pa.table(
                {
                    "dst": pa.array(dsts[starts], pa.int64()),
                    "s": pa.array(np.add.reduceat(vs, starts), pa.float64()),
                }
            )

        part = _collect_table(und.map_batches(contrib, batch_format="pyarrow"))
        sums = np.zeros(n)
        np.add.at(
            sums,
            np.searchsorted(nodes_u, part["dst"].to_numpy(zero_copy_only=False)),
            part["s"].to_numpy(zero_copy_only=False),
        )
        rank = np.round((1.0 - _PAGERANK_D) / n + _PAGERANK_D * sums, 12)

    return pa.table(
        {
            "vec_id": pa.array(nodes_u, pa.int64()),
            "rank": pa.array(sql_round_np(rank, 6), pa.float64()),
        }
    )


EMB_PAGERANK_SQL = (
    f"SELECT * FROM read_parquet('{_pagerank_dir()}/pagerank.parquet')"
)


_DAY_US = 86_400_000_000


def events_retention(sf_dir: str):
    """Day-over-day cohort retention (the analytics class behind every
    retention matrix): for each day d, how many users were active on BOTH d
    and d+1. One shuffle total: per-batch (user, day) dedupe combiner, hash
    partition by user (each user's full day set co-locates), per-partition
    vectorized consecutive-day detection on the sorted distinct pairs, then
    a tiny per-day rollup. Day = integer epoch-day on both sides (the
    events_hourly convention — no date-type parity risk)."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["user_id", "ts"])

    def pairs(b: pa.Table) -> pa.Table:
        u = b["user_id"].to_numpy(zero_copy_only=False)
        day = pc.divide(pc.cast(b["ts"], pa.int64()), _DAY_US).to_numpy(
            zero_copy_only=False
        )
        # packing contract: day must fit 20 bits and be non-negative (epoch
        # days through year ~4840); fail loudly rather than corrupt the key
        if len(day) and (day.min() < 0 or day.max() >= (1 << 20)):
            raise ValueError("events_retention: epoch day outside [0, 2^20)")
        key = np.unique((u.astype(np.uint64) << np.uint64(20)) | day.astype(np.uint64))
        return pa.table(
            {
                "user_id": pa.array((key >> np.uint64(20)).astype(np.int64), pa.int64()),
                "day": pa.array(
                    (key & np.uint64((1 << 20) - 1)).astype(np.int64), pa.int64()
                ),
            }
        )

    def retained(g: pa.Table) -> pa.Table:
        u = g["user_id"].to_numpy(zero_copy_only=False)
        day = g["day"].to_numpy(zero_copy_only=False)
        order = np.lexsort((day, u))
        u, day = u[order], day[order]
        keep = np.ones(len(u), dtype=bool)  # cross-batch distinct per partition
        keep[1:] = (u[1:] != u[:-1]) | (day[1:] != day[:-1])
        u, day = u[keep], day[keep]
        hit = (u[1:] == u[:-1]) & (day[1:] == day[:-1] + 1)
        d0 = day[:-1][hit]
        ud, c = np.unique(d0, return_counts=True)
        return pa.table(
            {
                "day": pa.array(ud, pa.int64()),
                "retained_part": pa.array(c.astype(np.int64), pa.int64()),
            }
        )

    parts = map_groups_partitioned(
        ds.map_batches(pairs, batch_format="pyarrow", batch_size=65536),
        "user_id",
        retained,
    )

    def finish(g: pa.Table) -> pa.Table:
        day = g["day"].to_numpy(zero_copy_only=False)
        c = g["retained_part"].to_numpy(zero_copy_only=False)
        order = np.argsort(day, kind="stable")
        day, c = day[order], c[order]
        new = np.ones(len(day), dtype=bool)
        new[1:] = day[1:] != day[:-1]
        starts = np.nonzero(new)[0]
        return pa.table(
            {
                "day": pa.array(day[starts], pa.int64()),
                "retained": pa.array(
                    np.add.reduceat(c, starts).astype(np.int64), pa.int64()
                ),
            }
        )

    return map_groups_partitioned(parts, "day", finish)


EVENTS_RETENTION_SQL = f"""
WITH ud AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_DAY_US} AS day FROM events)
SELECT a.day, CAST(COUNT(*) AS BIGINT) AS retained
FROM ud a JOIN ud b ON b.user_id = a.user_id AND b.day = a.day + 1
GROUP BY 1
"""


def doc_sample_weighted(sf_dir: str, k: int = 50):
    """WEIGHTED fixed-size sampling (weight = n_chars): the exponential-
    clock / A-ES design — keep the k rows with the smallest priority, where
    priority is a per-row pseudo-random clock divided by the row's weight,
    so selection probability scales with weight. The clock here is the
    bottom-k order hash rather than -ln(U) (one exact float division
    instead of a transcendental, so the oracle reproduces it bit-for-bit);
    the mergeable shape is identical to doc_sample_bottomk: per-batch
    prune to k (combiner), tiny global sort+limit. Completes the sampling
    family: fixed-rate (mod), fixed-size uniform (bottom-k), stratified,
    and now weighted."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def prune(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        w = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = (ids * np.uint64(_BK_MULT) + np.uint64(_BK_SEED)) % np.uint64(_BK_MOD)
        pri = h.astype(np.float64) / np.maximum(w, 1.0)
        # priority is NOT injective (unlike the bottom-k hash): tie-break by
        # doc_id so the prune order matches the SQL's ORDER BY priority, doc_id
        keep = np.lexsort((ids, pri))[:k]
        keep = np.sort(keep)
        out = b.take(pa.array(keep))
        return out.append_column("priority", pa.array(pri[keep], pa.float64()))

    pruned = ds.map_batches(prune, batch_format="pyarrow", batch_size=65536)
    return pruned.sort(["priority", "doc_id"]).limit(k)


DOC_SAMPLE_WEIGHTED_SQL = f"""
SELECT doc_id, lang, n_chars,
       CAST((doc_id * {_BK_MULT} + {_BK_SEED}) % {_BK_MOD} AS DOUBLE)
         / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS priority
FROM documents
ORDER BY priority, doc_id
LIMIT 50
"""


_S2_PARENT_LEVEL = 8


def pages_s2_parents(sf_dir: str):
    """S2-pyramid rollup (the S2 sibling of the z/x/y tile pyramid the
    north star names): joined mentions aggregated per LEVEL-8 ancestor of
    their level-12 cell — parent via the id-arithmetic prefix truncation
    (geo/s2.py::cell_parent), counts via the packed-u64 combiner reduce
    (count_by_u64: one shuffle of (cell, partial) rows). The oracle
    recomputes the parent with the SAME truncation expressed as integer
    arithmetic over the golden joined parquet."""
    from core_ray.geo.s2 import cell_parent
    from core_ray.stages.agg import count_by_u64

    _ensure_pages_golden(sf_dir)
    joined = _run_pages(sf_dir).joined

    def to_parent(b: pa.Table) -> pa.Table:
        cells = b["s2_cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {"key": pa.array(cell_parent(cells, _S2_PARENT_LEVEL), pa.uint64())}
        )

    counted = count_by_u64(
        joined.map_batches(to_parent, batch_format="pyarrow"), "key"
    )
    return counted.map_batches(
        lambda b: pa.table(
            {
                "s2_parent": b["key"],
                "n_mentions": pc.cast(b["cnt"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def pages_s2_compact(sf_dir: str, level: int = 12, parent_level: int = 11):
    """S2 cell-set COMPACTION (the S2/H3 `compact` analog — the coverage-
    compression API every cell-index user runs before storing or shipping a
    region): the occupied level-12 cell set is replaced by the minimal
    mixed-level cover where every COMPLETE 4-sibling set collapses to its
    level-11 parent and partial sets stay at level 12. Recursive compaction
    = iterating this op per level.

    Scale shape: distinct occupied cells via the packed-u64 combiner (work
    scales with distinct cells, not mentions); parent derivation is pure
    integer prefix arithmetic (geo/s2.py::cell_parent — exactly mirrored in
    SQL); full-sibling detection is count_by_u64 over parents of DISTINCT
    children; partial children survive through the guarded anti-join
    (filter_not_in on the parent key). No floats anywhere — the oracle is
    integer-exact."""
    from core_ray.geo import s2 as s2mod
    from core_ray.stages.agg import count_by_u64
    from core_ray.stages.join import filter_not_in

    _ensure_pages_golden(sf_dir)
    cells = _run_pages(sf_dir).joined.select_columns(["s2_cell"])
    occ = count_by_u64(
        cells.map_batches(
            lambda b: pa.table({"key": b["s2_cell"]}), batch_format="pyarrow",
            batch_size=131072,
        ),
        "key",
    ).map_batches(
        lambda b: b.select(["key"]), batch_format="pyarrow"
    ).materialize()  # DISTINCT occupied cells; consumed twice below

    def with_parent(b: pa.Table) -> pa.Table:
        k = b["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "key": b["key"],
                "parent": pa.array(s2mod.cell_parent(k, parent_level), pa.uint64()),
            }
        )

    occ_p = occ.map_batches(with_parent, batch_format="pyarrow")
    full = count_by_u64(
        occ_p.map_batches(
            lambda b: pa.table({"key": b["parent"]}), batch_format="pyarrow"
        ),
        "key",
    ).map_batches(
        lambda b: b.select(["key"]).filter(pc.equal(b["cnt"], 4)),
        batch_format="pyarrow",
    ).materialize()

    parents_out = full.map_batches(
        lambda b: pa.table(
            {
                "cell_id": b["key"],
                "level": pa.array(
                    np.full(b.num_rows, parent_level, np.int32), pa.int32()
                ),
            }
        ),
        batch_format="pyarrow",
    )
    partial_children = filter_not_in(
        occ_p,
        full.map_batches(lambda b: pa.table({"parent": b["key"]}),
                         batch_format="pyarrow"),
        on="parent",
        ds_schema=pa.schema([("key", pa.uint64()), ("parent", pa.uint64())]),
    ).map_batches(
        lambda b: pa.table(
            {
                "cell_id": b["key"],
                "level": pa.array(np.full(b.num_rows, level, np.int32), pa.int32()),
            }
        ),
        batch_format="pyarrow",
    )
    return parents_out.union(partial_children)



PAGES_S2_COMPACT_SQL = f"""
WITH occ AS (SELECT DISTINCT s2_cell FROM read_parquet('{_GD}/joined.parquet')),
p AS (SELECT s2_cell,
             (s2_cell // 549755813888) * 549755813888 + 274877906944 AS parent
      FROM occ),
fullp AS (SELECT parent FROM p GROUP BY 1 HAVING COUNT(*) = 4)
SELECT parent AS cell_id, CAST(11 AS INTEGER) AS level FROM fullp
UNION ALL
SELECT s2_cell AS cell_id, CAST(12 AS INTEGER) AS level FROM p
WHERE parent NOT IN (SELECT parent FROM fullp)
"""


# parent(cell, L) = floor(cell / 2*lsb_L) * 2*lsb_L + lsb_L, lsb_L = 2^(60-2L)
_S2_LSB = 1 << (60 - 2 * _S2_PARENT_LEVEL)
PAGES_S2_PARENTS_SQL = f"""
SELECT (s2_cell // {2 * _S2_LSB}) * {2 * _S2_LSB} + {_S2_LSB} AS s2_parent,
       CAST(COUNT(*) AS BIGINT) AS n_mentions
FROM read_parquet('{_GD}/joined.parquet')
GROUP BY 1
"""


def pages_mention_drift(sf_dir: str):
    """Spatio-temporal drift: per registered domain, how far the daily
    CENTROID of its geocoded mentions moves between consecutive crawl days
    (a crawl-ops signal for content relocation / geo-targeting changes).
    Float-parity design: per-(domain, day) sums are INTEGER micro-degrees
    (order-independent, so distributed partial sums match SQL's sequential
    SUM exactly) and the centroid/drift math is a fixed chain of
    correctly-rounded IEEE ops (two divisions, squares, sqrt) — bit-equal
    on both sides, no transcendental haversine needed for the parity
    demonstration. One string-keyed hash join (mentions -> crawl ts) and
    one partition shuffle by domain."""
    import ray.data

    from core_ray.stages.agg import _GOLD, _n_parts, hash_strings
    from core_ray.stages.join import hash_join

    _ensure_pages_golden(sf_dir)
    res = _run_pages(sf_dir)
    mentions = res.joined.select_columns(["url", "lat", "lon"])
    files, _, _, _ = _pages_corpus(sf_dir)
    pages = ray.data.read_parquet(files, columns=["url", "warc_ts"])
    j = hash_join(mentions, pages, on="url")
    n_parts = _n_parts()
    named_pat = _DOMAIN_PAT.replace("([A-Za-z", "(?P<d>[A-Za-z", 1)

    def partial(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(b["url"], named_pat)
        dom = np.asarray(
            [d if d is not None else "" for d in pc.struct_field(m, "d").to_pylist()]
        )
        day = (
            b["warc_ts"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
            // _DAY_US
        )
        lat6 = sql_round_np(
            b["lat"].to_numpy(zero_copy_only=False) * 1e6, 0
        ).astype(np.int64)
        lon6 = sql_round_np(
            b["lon"].to_numpy(zero_copy_only=False) * 1e6, 0
        ).astype(np.int64)
        keys = np.char.add(np.char.add(dom, "|"), day.astype("U"))
        order = np.argsort(keys, kind="stable")
        keys, dom, day = keys[order], dom[order], day[order]
        lat6, lon6 = lat6[order], lon6[order]
        new = np.ones(len(keys), dtype=bool)
        new[1:] = keys[1:] != keys[:-1]
        starts = np.nonzero(new)[0]
        h = hash_strings(pa.array(dom[starts], pa.string()))
        return pa.table(
            {
                "domain": pa.array(dom[starts], pa.string()),
                "day": pa.array(day[starts], pa.int64()),
                "slat": pa.array(np.add.reduceat(lat6, starts), pa.int64()),
                "slon": pa.array(np.add.reduceat(lon6, starts), pa.int64()),
                "n": pa.array(
                    np.add.reduceat(np.ones(len(keys), np.int64), starts), pa.int64()
                ),
                "__part": pa.array(
                    ((h * _GOLD) % np.uint64(n_parts)).astype(np.int32), pa.int32()
                ),
            }
        )

    def drift(g: pa.Table) -> pa.Table:
        dom = np.asarray(g["domain"].to_pylist())
        day = g["day"].to_numpy(zero_copy_only=False)
        slat = g["slat"].to_numpy(zero_copy_only=False)
        slon = g["slon"].to_numpy(zero_copy_only=False)
        n = g["n"].to_numpy(zero_copy_only=False)
        keys = np.char.add(np.char.add(dom, "|"), day.astype("U"))
        order = np.argsort(keys, kind="stable")
        dom, day = dom[order], day[order]
        slat, slon, n = slat[order], slon[order], n[order]
        new = np.ones(len(keys), dtype=bool)
        new[1:] = keys[order][1:] != keys[order][:-1]
        starts = np.nonzero(new)[0]
        dom, day = dom[starts], day[starts]
        slat = np.add.reduceat(slat, starts)
        slon = np.add.reduceat(slon, starts)
        n = np.add.reduceat(n, starts)
        clat = (slat.astype(np.float64) / n) / 1e6
        clon = (slon.astype(np.float64) / n) / 1e6
        # rows are sorted by (domain, day-string); day strings are all
        # 5-digit epoch days so string order == numeric order here, but
        # re-sort numerically to be explicit
        order2 = np.lexsort((day, dom))
        dom, day = dom[order2], day[order2]
        clat, clon = clat[order2], clon[order2]
        hit = (dom[1:] == dom[:-1]) & (day[1:] == day[:-1] + 1)
        d = np.sqrt(
            (clat[1:] - clat[:-1]) ** 2 + (clon[1:] - clon[:-1]) ** 2
        )[hit]
        return pa.table(
            {
                "domain": pa.array(dom[:-1][hit], pa.string()),
                "day": pa.array(day[:-1][hit], pa.int64()),
                "drift_deg": pa.array(sql_round_np(d, 6), pa.float64()),
            }
        )

    return (
        j.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(drift, batch_format="pyarrow")
    )


PAGES_MENTION_DRIFT_SQL = f"""
WITH j AS (
  SELECT m.url, m.lat, m.lon, p.warc_ts
  FROM read_parquet('{_GD}/joined.parquet') m
  JOIN read_parquet('{_PAGES_CORPUS_GLOB}') p USING (url)),
g AS (
  SELECT regexp_extract(url, '{_DOMAIN_PAT}', 1) AS domain,
         epoch_us(warc_ts) // {_DAY_US} AS day,
         SUM(CAST(ROUND(lat * 1000000) AS BIGINT)) AS slat,
         SUM(CAST(ROUND(lon * 1000000) AS BIGINT)) AS slon,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM j GROUP BY 1, 2),
c AS (
  SELECT domain, day,
         (CAST(slat AS DOUBLE) / n) / 1000000 AS clat,
         (CAST(slon AS DOUBLE) / n) / 1000000 AS clon
  FROM g)
SELECT a.domain, a.day,
       ROUND(sqrt((b.clat - a.clat) * (b.clat - a.clat)
                + (b.clon - a.clon) * (b.clon - a.clon)), 6) AS drift_deg
FROM c a JOIN c b ON b.domain = a.domain AND b.day = a.day + 1
"""


_URL_BLOCK_PAT = r"example[06]\.com/"
_URL_DEEP_PAT = r"/p/[0-9]{3}$"


def pages_url_filter(sf_dir: str):
    """URL-rule pre-filter — the stage a crawl pipeline runs BEFORE fetching
    or parsing anything: classify every page url against an ordered rule
    list (block-listed domains, then junk-path heuristics) and emit
    (url, reason). One pruned read of the url column only (nothing else
    leaves storage), vectorized RE2 kernels, no shuffle — row-local at any
    corpus scale. The oracle independently re-runs the SAME regexes through
    DuckDB's regexp_matches (RE2 double implementation, the doc_pii_scrub
    contract)."""
    import ray.data

    files, _, _, _ = _pages_corpus(sf_dir)
    ds = ray.data.read_parquet(files, columns=["url"])

    def classify(b: pa.Table) -> pa.Table:
        url = b["url"]
        blocked = pc.match_substring_regex(url, _URL_BLOCK_PAT)
        deep = pc.match_substring_regex(url, _URL_DEEP_PAT)
        reason = pc.if_else(
            blocked,
            pa.scalar("blocked-domain"),
            pc.if_else(deep, pa.scalar("deep-path"), pa.scalar("ok")),
        )
        return pa.table({"url": url, "reason": reason})

    return ds.map_batches(classify, batch_format="pyarrow", batch_size=65536)


PAGES_URL_FILTER_SQL = f"""
SELECT url,
       CASE WHEN regexp_matches(url, '{_URL_BLOCK_PAT}') THEN 'blocked-domain'
            WHEN regexp_matches(url, '{_URL_DEEP_PAT}') THEN 'deep-path'
            ELSE 'ok' END AS reason
FROM read_parquet('{_PAGES_CORPUS_GLOB}')
"""


def geo_tile_regions(sf_dir: str, z: int = 5, min_points: int = 2):
    """Raster -> VECTOR region labeling (the polygonize analog — the inverse
    direction of the tile rollup): occupied z-5 tiles (>= min_points derived
    doc points) are 4-connected into regions via distributed connected
    components; region_id = the region's minimum packed tile key, singleton
    tiles label themselves.

    Scale shape: exact occupied-tile counts via the packed-u64 combiner
    (count_by_u64 — work scales with DISTINCT occupied tiles, not points);
    adjacency = ONE distributed hash_join of each tile's (right, down)
    neighbor probes against the occupied keys (no all-pairs); regions close
    through stages/cc.py (log-round pointer jumping above its guard);
    singletons re-attach via filter_not_in. The DuckDB oracle recomputes
    the labeling through a fully independent RECURSIVE-CTE min-reachable
    closure (the emb_dup_clusters pattern, on a grid graph)."""
    import ray

    from core_ray.stages.agg import count_by_u64
    from core_ray.stages.cc import connected_components
    from core_ray.stages.join import filter_not_in, hash_join

    n = float(1 << z)
    ds = _read(sf_dir, "documents", ["doc_id"])

    def tile_keys(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        x = np.minimum(n - 1, np.maximum(0.0, np.floor((lon + 180.0) / 360.0 * n))).astype(np.int64)
        yv = 1.0 - np.log(np.tan(np.radians(lat)) + 1.0 / np.cos(np.radians(lat))) / np.pi
        y = np.minimum(n - 1, np.maximum(0.0, np.floor(yv / 2.0 * n))).astype(np.int64)
        return pa.table(
            {"key": pa.array(((x.astype(np.uint64) << np.uint64(32))
                              | y.astype(np.uint64)), pa.uint64())}
        )

    occ = count_by_u64(
        ds.map_batches(tile_keys, batch_format="pyarrow", batch_size=65536), "key"
    ).map_batches(
        lambda b: pa.table(
            {"k": pc.cast(b["key"], pa.int64())}
        ).filter(pc.greater_equal(b["cnt"], min_points)),
        batch_format="pyarrow",
    ).materialize()  # bounded by distinct occupied tiles, consumed 3x below

    def nbr_probes(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False).astype(np.uint64)
        x, y = k >> np.uint64(32), k & np.uint64(0xFFFFFFFF)
        right = ((x + np.uint64(1)) << np.uint64(32)) | y
        down = (x << np.uint64(32)) | (y + np.uint64(1))
        return pa.table(
            {
                "nk": pa.array(np.concatenate([right, down]).astype(np.int64), pa.int64()),
                "u": pa.array(np.concatenate([k, k]).astype(np.int64), pa.int64()),
            }
        )

    int_schema = pa.schema([("k", pa.int64())])
    edges = hash_join(
        occ.map_batches(nbr_probes, batch_format="pyarrow"), occ,
        on="nk", right_on="k",
        left_schema=pa.schema([("nk", pa.int64()), ("u", pa.int64())]),
        right_schema=int_schema,
    )
    labeled = connected_components(edges, src="u", dst="nk").materialize()

    singles = filter_not_in(
        occ,
        labeled.map_batches(lambda b: pa.table({"k": b["node"]}),
                            batch_format="pyarrow"),
        on="k", ds_schema=int_schema,
    ).map_batches(
        lambda b: pa.table({"node": b["k"], "comp": b["k"]}),
        batch_format="pyarrow",
    )

    def unpack(b: pa.Table) -> pa.Table:
        k = b["node"].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.table(
            {
                "tile_x": pa.array((k >> np.uint64(32)).astype(np.int64), pa.int64()),
                "tile_y": pa.array((k & np.uint64(0xFFFFFFFF)).astype(np.int64), pa.int64()),
                "region_id": b["comp"],
            }
        )

    return labeled.union(singles).map_batches(unpack, batch_format="pyarrow")


def _geo_tile_regions_sql(z: int = 5, min_points: int = 2) -> str:
    n = float(1 << z)
    return f"""
WITH RECURSIVE
pts AS (SELECT {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
t AS (
  SELECT CAST(LEAST({n} - 1, GREATEST(0, FLOOR((lon + 180.0) / 360.0 * {n}))) AS BIGINT) AS tile_x,
         CAST(LEAST({n} - 1, GREATEST(0, FLOOR((1.0 - LN(TAN(RADIANS(lat)) + 1.0 / COS(RADIANS(lat))) / PI()) / 2.0 * {n}))) AS BIGINT) AS tile_y
  FROM pts),
occ AS (
  SELECT tile_x, tile_y, tile_x * 4294967296 + tile_y AS k
  FROM t GROUP BY 1, 2 HAVING COUNT(*) >= {min_points}),
e0 AS (
  SELECT a.k AS u, b.k AS v FROM occ a JOIN occ b
    ON (b.tile_x = a.tile_x + 1 AND b.tile_y = a.tile_y)
    OR (b.tile_x = a.tile_x AND b.tile_y = a.tile_y + 1)),
e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
reach(node, comp) AS (
  SELECT u, u FROM e
  UNION
  SELECT e.u, r.comp FROM e JOIN reach r ON r.node = e.v),
lab AS (SELECT node, MIN(comp) AS comp FROM reach GROUP BY node)
SELECT occ.tile_x, occ.tile_y, CAST(COALESCE(lab.comp, occ.k) AS BIGINT) AS region_id
FROM occ LEFT JOIN lab ON lab.node = occ.k
"""


GEO_TILE_REGIONS_SQL = _geo_tile_regions_sql()


def cust_orders_full_outer(sf_dir: str):
    """FULL OUTER equi-join at the driver surface — the one hash_join mode
    (stages/join.py full-outer Acero path, null-key retention unit-tested)
    that had no oracle query. Left = high-balance customers, right =
    per-customer 1997+ order counts (exact count_by_u64 combiner): both
    sides surface unmatched rows (rich customer with no recent orders ->
    null n_orders; active customer below the balance cut -> null
    c_acctbal), keys coalesced exactly like SQL USING."""
    from core_ray.stages.agg import count_by_u64
    from core_ray.stages.join import hash_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).filter(
        expr="c_acctbal > 5000.0"
    )
    cutoff = np.datetime64("1997-01-01", "us").astype(np.int64)

    def recent_keys(b: pa.Table) -> pa.Table:
        t = (
            b["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").astype(np.int64)
        )
        return pa.table(
            {"key": pc.cast(b["o_custkey"], pa.uint64()).filter(pa.array(t >= cutoff))}
        )

    counts = count_by_u64(
        _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
            recent_keys, batch_format="pyarrow", batch_size=131072
        ),
        "key",
    ).map_batches(
        lambda b: pa.table(
            {"c_custkey": pc.cast(b["key"], pa.int64()), "n_orders": b["cnt"]}
        ),
        batch_format="pyarrow",
    )
    return hash_join(
        cust, counts, on="c_custkey", how="full",
        left_schema=pa.schema([("c_custkey", pa.int64()), ("c_acctbal", pa.float64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()), ("n_orders", pa.int64())]),
    )


def doc_incremental_new(sf_dir: str, broadcast_max: int = 2_000_000):
    """Cross-snapshot incremental dedup — the op a recurring crawl runs
    before adding a new snapshot to the corpus: keep only NEW docs whose
    exact text was never seen in the previous snapshot. Deterministic
    stand-in split with OVERLAP (consecutive crawls re-fetch mostly the
    same pages): old snapshot = doc_id%10 < 7, new = doc_id%10 >= 3 — the
    40% in both snapshots MUST be dropped, so a broken probe can't pass
    vacuously (this corpus has no cross-doc exact-text twins).

    Scale shape: the old side reduces to DISTINCT text keys (zero-copy md5
    of the Arrow utf-8 buffer -> u64, exact count_by_u64 combiner — text
    never leaves its scan), then stages/join.filter_not_in probes the new
    side: broadcast sorted-searchsorted under the guard, distributed anti
    hash-join above it (a 10^12-doc seen-set never reaches the driver). At
    that scale the key should widen to the full 128-bit digest; u64 is
    collision-safe for any single-box corpus (p ~ n^2/2^64)."""
    from core_ray.stages.agg import count_by_u64
    from core_ray.stages.join import filter_not_in
    from core_ray.text.dedup import _md5_utf8_col

    def text_key(b: pa.Table, which: str) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        m = (ids % 10) < 7 if which == "old" else (ids % 10) >= 3
        sub = b.filter(pa.array(m))
        md5s = _md5_utf8_col(sub["text"])
        key = (
            np.frombuffer(b"".join(md5s), dtype=">u8").reshape(-1, 2)[:, 0]
            .astype(np.uint64)
            if md5s else np.zeros(0, np.uint64)
        )
        return pa.table(
            {"doc_id": sub["doc_id"], "key": pa.array(key, pa.uint64())}
        )

    seen = count_by_u64(
        _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            lambda b: text_key(b, "old").select(["key"]),
            batch_format="pyarrow", batch_size=4096,
        ),
        "key",
    ).map_batches(lambda b: b.select(["key"]), batch_format="pyarrow").materialize()
    # materialized: filter_not_in consumes the seen set twice (count + probe);
    # lazy, the whole old-snapshot scan + md5 + shuffle would run twice

    new = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        lambda b: text_key(b, "new"), batch_format="pyarrow", batch_size=4096
    )
    out = filter_not_in(
        new, seen, on="key", broadcast_max=broadcast_max,
        ds_schema=pa.schema([("doc_id", pa.int64()), ("key", pa.uint64())]),
    )
    return out.map_batches(
        lambda b: b.select(["doc_id"]), batch_format="pyarrow"
    )


DOC_INCREMENTAL_NEW_SQL = """
SELECT doc_id FROM documents
WHERE doc_id % 10 >= 3
  AND text NOT IN (SELECT text FROM documents WHERE doc_id % 10 < 7)
"""


CUST_ORDERS_FULL_OUTER_SQL = """
WITH c AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 5000.0),
o AS (SELECT o_custkey AS c_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' GROUP BY 1)
SELECT COALESCE(c.c_custkey, o.c_custkey) AS c_custkey, c.c_acctbal, o.n_orders
FROM c FULL JOIN o ON c.c_custkey = o.c_custkey
"""


_DBSCAN_EPS = 8.0
_DBSCAN_MIN_PTS = 4


def geo_dbscan(sf_dir: str, eps: float = _DBSCAN_EPS,
               min_pts: int = _DBSCAN_MIN_PTS):
    """Distributed DBSCAN over the derived-coordinate lattice — the
    density-based clustering a geospatial engine owes its users (hotspot
    detection over page coordinates). The operator (stages/dbscan.py) is
    the standard distributed equivalence: eps-neighbor pairs from the
    distance-band join, core points by exact degree, clusters = connected
    components of the core-core subgraph, border points take the MINIMUM
    neighboring core cluster (deterministic where sequential DBSCAN is
    visit-order-dependent), everything else noise. Core-membership filters
    route through filter_semi/filter_not_in (broadcast under the guard,
    distributed marker joins above it — the core set is O(corpus) on dense
    data). The oracle re-derives all of it in SQL: brute-force eps pairs,
    degree counts, a RECURSIVE min-reachable closure over core-core edges,
    and a MIN() border attach."""
    from core_ray.stages.dbscan import dbscan

    def coords(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False)
        lat, lon = _derive_coords(doc_id)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lat": pa.array(lat, pa.float64()),
                "lon": pa.array(lon, pa.float64()),
            }
        )

    pts = _read(sf_dir, "documents", ["doc_id"]).map_batches(
        coords, batch_format="pyarrow", batch_size=65536
    )
    return dbscan(pts, eps, min_pts)


GEO_DBSCAN_SQL = f"""
WITH RECURSIVE
pts AS (SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
p0 AS (
  SELECT a.doc_id AS da, b.doc_id AS db
  FROM pts a JOIN pts b ON a.doc_id < b.doc_id
  WHERE (a.lat - b.lat) * (a.lat - b.lat) + (a.lon - b.lon) * (a.lon - b.lon)
        <= {_DBSCAN_EPS * _DBSCAN_EPS}),
e AS (SELECT da AS u, db AS v FROM p0 UNION ALL SELECT db, da FROM p0),
deg AS (SELECT u AS id, COUNT(*) AS n FROM e GROUP BY u),
core AS (SELECT id FROM deg WHERE n + 1 >= {_DBSCAN_MIN_PTS}),
ce0 AS (
  SELECT da, db FROM p0
  WHERE da IN (SELECT id FROM core) AND db IN (SELECT id FROM core)),
ce AS (SELECT da AS u, db AS v FROM ce0 UNION SELECT db, da FROM ce0),
reach(node, comp) AS (
  SELECT id, id FROM core
  UNION
  SELECT ce.u, r.comp FROM ce JOIN reach r ON r.node = ce.v),
clab AS (SELECT node, MIN(comp) AS comp FROM reach GROUP BY node),
border AS (
  SELECT e.u AS node, MIN(c.comp) AS comp
  FROM e JOIN clab c ON c.node = e.v
  WHERE e.u NOT IN (SELECT id FROM core)
  GROUP BY e.u)
SELECT p.doc_id,
       CAST(COALESCE(c.comp, b.comp) AS BIGINT) AS cluster,
       CASE WHEN c.node IS NOT NULL THEN 'core'
            WHEN b.node IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role
FROM pts p
LEFT JOIN clab c ON c.node = p.doc_id
LEFT JOIN border b ON b.node = p.doc_id
"""


def geo_rank_size(sf_dir: str):
    """URBAN RANK-SIZE RULE (Zipf's law for settlement sizes): the
    least-squares slope of log2(cell population) on log2(rank) over the
    top-50 most-populated 1-degree cells of the city-skewed contact
    model — the canonical spatial-hierarchy statistic (a natural urban
    system sits near -1; flatter means the hierarchy is missing, steeper
    means one primate city dominates). The spatial sibling of
    doc_zipf_fit's vocabulary law. Plan: cell ids come from the EXACT
    integer milli-degree contact lattice (the float -60/-170 offsets are
    pure translations, so gridding the integer sums directly is the same
    partition — and keeps both sides float-free until the logs); one
    packed count_by_u64 pass (cells geometry-bounded), driver ranks the
    bounded table (count desc, cell asc — defensive: equal counts
    contribute identical y to the fit) and runs the doc_zipf_fit
    micro-bit regression: logs quantized to integer micro-bits
    (sql_round_np == DuckDB ROUND), moments exact integer sums, slope =
    ONE double division. At 100 TB the count pass is the only corpus
    touch; everything after is <=50 rows."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def pack(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mlat = (
            ((uid % 12) * 11003) % 120000
            + (uid * 7919) % 2001
            + (eid * 13) % 1001
        )
        mlon = (
            ((uid % 12) * 104729) % 340000
            + (uid * 104729) % 2001
            + (eid * 29) % 1001
        )
        key = ((mlon // 1000) * 1024 + (mlat // 1000)).astype(np.uint64)
        return pa.table({"key": pa.array(key, pa.uint64())})

    cc_t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # bounded by the lattice geometry (~12 city blobs of 1-deg cells)
    key = cc_t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = cc_t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    gx = (key // np.uint64(1024)).astype(np.int64)
    gy = (key % np.uint64(1024)).astype(np.int64)
    order = np.lexsort((gy, gx, -c))
    c = c[order]
    n_cells = len(c)
    k = min(50, n_cells)
    c = c[:k]
    rank = np.arange(1, k + 1, dtype=np.int64)
    x = sql_round_np(np.log2(rank.astype(np.float64)) * 1000000.0, 0).astype(
        np.int64
    )
    y = sql_round_np(np.log2(c.astype(np.float64)) * 1000000.0, 0).astype(
        np.int64
    )
    sx, sy = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx = int((x * x).sum())
    num = k * sxy - sx * sy
    den = k * sxx - sx * sx
    return pa.table(
        {
            "n_cells": pa.array([n_cells], pa.int64()),
            "n_ranks": pa.array([k], pa.int64()),
            "slope_num": pa.array([num], pa.int64()),
            "slope_den": pa.array([den], pa.int64()),
            "rank_size_slope": pa.array(
                [float(np.float64(num) / np.float64(den))], pa.float64()
            ),
        }
    )


GEO_RANK_SIZE_SQL = """
WITH pts AS (
  SELECT ((user_id % 12) * 11003) % 120000
           + (user_id * 7919) % 2001 + (event_id * 13) % 1001 AS mlat,
         ((user_id % 12) * 104729) % 340000
           + (user_id * 104729) % 2001 + (event_id * 29) % 1001 AS mlon
  FROM events),
cc AS (
  SELECT mlon // 1000 AS gx, mlat // 1000 AS gy,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM pts GROUP BY 1, 2),
top AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, gx, gy) AS rank
  FROM cc ORDER BY c DESC, gx, gy LIMIT 50),
q AS (
  SELECT CAST(ROUND(LOG2(CAST(rank AS DOUBLE)) * 1000000.0, 0) AS BIGINT)
           AS x,
         CAST(ROUND(LOG2(CAST(c AS DOUBLE)) * 1000000.0, 0) AS BIGINT) AS y
  FROM top),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM q),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells FROM cc)
SELECT n.n_cells, m.k AS n_ranks, k * sxy - sx * sy AS slope_num,
       k * sxx - sx * sx AS slope_den,
       CAST(k * sxy - sx * sy AS DOUBLE)
         / CAST(k * sxx - sx * sx AS DOUBLE) AS rank_size_slope
FROM m, n
"""


_HILL_K = 200


def events_hill_tail(sf_dir: str):
    """HILL TAIL-INDEX ESTIMATOR (extreme-value statistics: the power-law
    exponent alpha of the upper tail of event values from the top-k order
    statistics — THE heavy-tail diagnostic for revenue / latency / degree
    distributions; alpha <= 2 means infinite variance and every
    mean-based statistic downstream is unstable). Hill: 1/alpha = mean of
    ln(x_(i) / x_(k+1)) over the k largest values. Plan: per-batch top-
    (k+1) prune (value desc, event_id tie-break — the global-top-k
    combiner contract), driver merges the bounded partials; each ratio
    x_i/x_ref is ONE correctly-rounded double division of raw parquet
    doubles, its ln micro-quantized (sql_round_np == DuckDB ROUND), the
    tail sum is an exact integer sum, and alpha = ONE double division.
    Boundary ties contribute ln(1) = 0 — rank-based k is tie-safe. At
    100 TB only k+1 rows per block leave the map side."""
    ds = _read(sf_dir, "events", ["event_id", "value"])

    def partial(b: pa.Table) -> pa.Table:
        v = b["value"].to_numpy(zero_copy_only=False)
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = v > 0.0
        v, eid = v[m], eid[m]
        order = np.lexsort((eid, -v))[: _HILL_K + 1]
        return pa.table(
            {
                "value": pa.array(v[order], pa.float64()),
                "event_id": pa.array(eid[order], pa.int64()),
            }
        )

    t = _collect_table(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=131072)
    )  # <= (k+1) x n_blocks rows
    v = t["value"].to_numpy(zero_copy_only=False)
    eid = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((eid, -v))[: _HILL_K + 1]
    v = v[order]
    if len(v) == 0:
        return pa.table(
            {
                "n_tail": pa.array([0], pa.int64()),
                "x_kplus1": pa.array([None], pa.float64()),
                "sum_lnratio_micro": pa.array([None], pa.int64()),
                "hill_alpha": pa.array([None], pa.float64()),
            }
        )
    kk = len(v) - 1  # == min(_HILL_K, n_positive - 1)
    x_ref = float(v[kk])
    terms = sql_round_np(np.log(v[:kk] / x_ref) * 1000000.0, 0).astype(
        np.int64
    )
    sum_q = int(terms.sum()) if kk > 0 else None
    alpha = (
        float(np.float64(kk * 1000000) / np.float64(sum_q))
        if sum_q
        else None
    )
    return pa.table(
        {
            "n_tail": pa.array([kk], pa.int64()),
            "x_kplus1": pa.array([x_ref], pa.float64()),
            "sum_lnratio_micro": pa.array([sum_q], pa.int64()),
            "hill_alpha": pa.array([alpha], pa.float64()),
        }
    )


EVENTS_HILL_TAIL_SQL = f"""
WITH ranked AS (
  SELECT value, ROW_NUMBER() OVER (ORDER BY value DESC, event_id) AS rn
  FROM events WHERE value > 0.0),
top AS (SELECT value, rn FROM ranked WHERE rn <= {_HILL_K + 1}),
ref AS (SELECT MAX(rn) AS m, MIN(value) AS x_ref FROM top),
t AS (
  SELECT CAST(ROUND(LN(top.value / ref.x_ref) * 1000000.0, 0) AS BIGINT)
           AS q
  FROM top, ref WHERE top.rn <= ref.m - 1),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
         CAST(SUM(q) AS BIGINT) AS sum_q
  FROM t)
SELECT s.n_tail, ref.x_ref AS x_kplus1, s.sum_q AS sum_lnratio_micro,
       CASE WHEN s.sum_q = 0 THEN NULL
            ELSE CAST(s.n_tail * 1000000 AS DOUBLE)
                   / CAST(s.sum_q AS DOUBLE) END AS hill_alpha
FROM s, ref
"""


def events_rfm_segments(sf_dir: str):
    """RFM BEHAVIORAL SEGMENTATION (recency / frequency / monetary — the
    classic user-value grid every growth team cuts first): each user is
    scored +/- on all three axes against the population mean, giving 8
    segments from R+F+M+ (champions) to R-F-M- (lost). Exactness: the
    mean splits use FLOOR-division thresholds (total // n_users — exact
    integers both sides, no float means), monetary is exact integer
    cents (ROUND(value*100) == sql_round), recency needs no second pass:
    sum over users of (maxd - last_day) == n_users*maxd - sum(last_day),
    so ONE scalar aggregate over the per-user table yields every
    threshold. Plan: one user-keyed hash shuffle (map_groups_partitioned
    reduceat fold) -> materialized per-user table (output-scale, stays
    in the object store) -> two map-only passes (5-scalar fold, then
    8-bin bincount partials); the driver sees O(#blocks) integer rows."""
    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def pre(b: pa.Table) -> pa.Table:
        cents = sql_round_np(
            b["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        day = (
            pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
            // 86400000000
        )
        return pa.table(
            {
                "user_id": b["user_id"],
                "cents": pa.array(cents, pa.int64()),
                "day": pa.array(day, pa.int64()),
            }
        )

    _u_empty = pa.table(
        {
            "user_id": pa.array([], pa.int64()),
            "f": pa.array([], pa.int64()),
            "m": pa.array([], pa.int64()),
            "lastd": pa.array([], pa.int64()),
        }
    )

    def per_user(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _u_empty
        uid = g["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = g["cents"].to_numpy(zero_copy_only=False)
        day = g["day"].to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, cents, day = uid[order], cents[order], day[order]
        idx = np.nonzero(np.r_[True, uid[1:] != uid[:-1]])[0]
        f = np.diff(np.r_[idx, len(uid)])
        m = np.add.reduceat(cents, idx)
        lastd = np.maximum.reduceat(day, idx)
        return pa.table(
            {
                "user_id": pa.array(uid[idx], pa.int64()),
                "f": pa.array(f, pa.int64()),
                "m": pa.array(m, pa.int64()),
                "lastd": pa.array(lastd, pa.int64()),
            }
        )

    users = map_groups_partitioned(
        ds.map_batches(pre, batch_format="pyarrow", batch_size=131072),
        "user_id",
        per_user,
    ).materialize()

    def scalar_partial(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "nu": pa.array([b.num_rows], pa.int64()),
                "tf": pa.array([int(pc.sum(b["f"]).as_py() or 0)], pa.int64()),
                "tm": pa.array([int(pc.sum(b["m"]).as_py() or 0)], pa.int64()),
                "sl": pa.array(
                    [int(pc.sum(b["lastd"]).as_py() or 0)], pa.int64()
                ),
                "maxd": pa.array(
                    [pc.max(b["lastd"]).as_py()], pa.int64()
                ),
            }
        )

    sc = _collect_table(
        users.map_batches(
            scalar_partial, batch_format="pyarrow", batch_size=1 << 20
        )
    )  # O(#blocks) rows
    nu = int(pc.sum(sc["nu"]).as_py() or 0)
    if nu == 0:
        return pa.table(
            {
                "segment": pa.array([], pa.int64()),
                "rfm_label": pa.array([], pa.string()),
                "n_users": pa.array([], pa.int64()),
                "sum_cents": pa.array([], pa.int64()),
            }
        )
    tf = int(pc.sum(sc["tf"]).as_py())
    tm = int(pc.sum(sc["tm"]).as_py())
    sl = int(pc.sum(sc["sl"]).as_py())
    maxd = int(pc.max(sc["maxd"]).as_py())
    thr_f, thr_m = tf // nu, tm // nu
    thr_r = (nu * maxd - sl) // nu

    def seg_partial(b: pa.Table) -> pa.Table:
        f = b["f"].to_numpy(zero_copy_only=False)
        m = b["m"].to_numpy(zero_copy_only=False)
        lastd = b["lastd"].to_numpy(zero_copy_only=False)
        seg = (
            ((maxd - lastd) <= thr_r).astype(np.int64) * 4
            + (f > thr_f).astype(np.int64) * 2
            + (m > thr_m).astype(np.int64)
        )
        n8 = np.bincount(seg, minlength=8).astype(np.int64)
        s8 = np.zeros(8, np.int64)
        np.add.at(s8, seg, m)
        return pa.table(
            {
                "segment": pa.array(np.arange(8, dtype=np.int64)),
                "n": pa.array(n8, pa.int64()),
                "s": pa.array(s8, pa.int64()),
            }
        )

    parts = _collect_table(
        users.map_batches(
            seg_partial, batch_format="pyarrow", batch_size=1 << 20
        )
    )  # 8 x O(#blocks) rows
    seg = parts["segment"].to_numpy(zero_copy_only=False)
    n = np.zeros(8, np.int64)
    s = np.zeros(8, np.int64)
    np.add.at(n, seg, parts["n"].to_numpy(zero_copy_only=False))
    np.add.at(s, seg, parts["s"].to_numpy(zero_copy_only=False))
    keep = n > 0
    segs = np.arange(8, dtype=np.int64)[keep]
    labels = [
        "R" + ("+" if g & 4 else "-")
        + "F" + ("+" if g & 2 else "-")
        + "M" + ("+" if g & 1 else "-")
        for g in segs
    ]
    return pa.table(
        {
            "segment": pa.array(segs, pa.int64()),
            "rfm_label": pa.array(labels, pa.string()),
            "n_users": pa.array(n[keep], pa.int64()),
            "sum_cents": pa.array(s[keep], pa.int64()),
        }
    )


EVENTS_RFM_SEGMENTS_SQL = """
WITH e AS (
  SELECT user_id, CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents,
         epoch_us(ts) // 86400000000 AS day
  FROM events),
u AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS f,
         CAST(SUM(cents) AS BIGINT) AS m, MAX(day) AS lastd
  FROM e GROUP BY 1),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nu, CAST(SUM(f) AS BIGINT) AS tf,
         CAST(SUM(m) AS BIGINT) AS tm, CAST(SUM(lastd) AS BIGINT) AS sl,
         MAX(lastd) AS maxd
  FROM u),
thr AS (
  SELECT tf // nu AS thr_f, tm // nu AS thr_m,
         (nu * maxd - sl) // nu AS thr_r, maxd
  FROM g),
seg AS (
  SELECT CASE WHEN (thr.maxd - u.lastd) <= thr.thr_r THEN 4 ELSE 0 END
       + CASE WHEN u.f > thr.thr_f THEN 2 ELSE 0 END
       + CASE WHEN u.m > thr.thr_m THEN 1 ELSE 0 END AS sg, u.m
  FROM u, thr)
SELECT CAST(sg AS BIGINT) AS segment,
       'R' || CASE WHEN sg >= 4 THEN '+' ELSE '-' END
         || 'F' || CASE WHEN (sg // 2) % 2 = 1 THEN '+' ELSE '-' END
         || 'M' || CASE WHEN sg % 2 = 1 THEN '+' ELSE '-' END AS rfm_label,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(m) AS BIGINT) AS sum_cents
FROM seg GROUP BY 1, 2 ORDER BY 1
"""


_READ_BANDS = ("very_easy", "standard", "difficult", "very_difficult")


def doc_readability(sf_dir: str):
    """FLESCH READING-EASE BANDING (the curation-side text-complexity
    gate: score = 206.835 - 1.015*(words/sentences) -
    84.6*(syllables/words), banded very_easy >=90 / standard >=60 /
    difficult >=30 / very_difficult — training-data mixes are routinely
    balanced on exactly this score). Proxies mirrored bit-for-bit:
    words = single-space splits (empty tokens count, both sides),
    sentences = '.' count floored at 1, syllables = ASCII vowel RUNS of
    lower(text) (re '[aeiou]+' == DuckDB regexp_extract_all — same RE2
    class on the same codepoints). The score is a pure +,-,*,/ chain of
    exact integers -> bit-equal doubles (the float-parity contract), so
    the band comparisons are exact; per-doc scores micro-quantize for
    the order-free integer mean. One map-only pass, 4-bin partials; the
    per-doc finditer loop is the documented ~2%-of-wall kernel class."""
    import re as _re

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    rx = _re.compile(r"[aeiou]+")

    def partial(b: pa.Table) -> pa.Table:
        texts = b["text"].to_pylist()
        w = (
            pc.count_substring(b["text"], " ")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
            + 1
        )
        s = np.maximum(
            pc.count_substring(b["text"], ".")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64),
            1,
        )
        syl = np.fromiter(
            (sum(1 for _ in rx.finditer(t.lower())) for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        score = (
            206.835
            - 1.015 * (w.astype(np.float64) / s.astype(np.float64))
            - 84.6 * (syl.astype(np.float64) / w.astype(np.float64))
        )
        band = np.where(
            score >= 90.0,
            0,
            np.where(score >= 60.0, 1, np.where(score >= 30.0, 2, 3)),
        )
        q = sql_round_np(score * 1000000.0, 0).astype(np.int64)
        n4 = np.bincount(band, minlength=4).astype(np.int64)
        s4 = np.zeros(4, np.int64)
        np.add.at(s4, band, q)
        return pa.table(
            {
                "band_id": pa.array(np.arange(4, dtype=np.int64)),
                "n": pa.array(n4, pa.int64()),
                "s": pa.array(s4, pa.int64()),
            }
        )

    parts = _collect_table(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
    )  # 4 x O(#blocks) rows
    bid = parts["band_id"].to_numpy(zero_copy_only=False)
    n = np.zeros(4, np.int64)
    s = np.zeros(4, np.int64)
    np.add.at(n, bid, parts["n"].to_numpy(zero_copy_only=False))
    np.add.at(s, bid, parts["s"].to_numpy(zero_copy_only=False))
    keep = n > 0
    ids = np.arange(4, dtype=np.int64)[keep]
    return pa.table(
        {
            "band": pa.array([_READ_BANDS[i] for i in ids], pa.string()),
            "n_docs": pa.array(n[keep], pa.int64()),
            "sum_score_micro": pa.array(s[keep], pa.int64()),
            "mean_score": pa.array(
                [
                    float(np.float64(s[i]) / np.float64(n[i] * 1000000))
                    for i in ids
                ],
                pa.float64(),
            ),
        }
    )


DOC_READABILITY_SQL = """
WITH d AS (
  SELECT CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS BIGINT)
           AS w,
         GREATEST(
           CAST(LENGTH(text) - LENGTH(REPLACE(text, '.', '')) AS BIGINT),
           1) AS s,
         CAST(LEN(regexp_extract_all(LOWER(text), '[aeiou]+')) AS BIGINT)
           AS syl
  FROM documents),
sc AS (
  SELECT 206.835
           - 1.015 * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
           - 84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)) AS score
  FROM d),
b AS (
  SELECT CASE WHEN score >= 90.0 THEN 'very_easy'
              WHEN score >= 60.0 THEN 'standard'
              WHEN score >= 30.0 THEN 'difficult'
              ELSE 'very_difficult' END AS band,
         CAST(ROUND(score * 1000000.0, 0) AS BIGINT) AS q
  FROM sc)
SELECT band, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(q) AS BIGINT) AS sum_score_micro,
       CAST(SUM(q) AS DOUBLE)
         / CAST(COUNT(*) * 1000000 AS DOUBLE) AS mean_score
FROM b GROUP BY 1
"""


def geo_percolation(sf_dir: str):
    """OCCUPANCY-THRESHOLD PERCOLATION PROFILE (does the settled area
    form one connected landmass or an archipelago, and at what density
    does the giant component break up?): sweep four occupancy thresholds
    tau in {1, avg/4, avg/2, avg} (avg = FLOOR-mean cell count — exact
    integers both sides), keep cells with count >= tau, and report the
    rook-connected component census per tau — occupied cells, cluster
    count, largest cluster, giant fraction. The tile_regions CC machinery
    turned into the statistical-physics curve. Plan: ONE packed count
    pass over the contact lattice (cells geometry-bounded), then a
    driver union-find over the <=4x|cells| bounded node set; at 100 TB
    the count pass is the only corpus touch. The tau=max(avg,1) row is
    always non-empty (max cell count >= floor mean)."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def pack(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mlat = (
            ((uid % 12) * 11003) % 120000
            + (uid * 7919) % 2001
            + (eid * 13) % 1001
        )
        mlon = (
            ((uid % 12) * 104729) % 340000
            + (uid * 104729) % 2001
            + (eid * 29) % 1001
        )
        key = ((mlon // 1000) * 1024 + (mlat // 1000)).astype(np.uint64)
        return pa.table({"key": pa.array(key, pa.uint64())})

    cc_t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # bounded by the lattice geometry
    key = cc_t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = cc_t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    gx = (key // np.uint64(1024)).astype(np.int64)
    gy = (key % np.uint64(1024)).astype(np.int64)
    nc, tot = len(c), int(c.sum())
    if nc == 0:
        return pa.table(
            {
                "thr_idx": pa.array([], pa.int64()),
                "tau": pa.array([], pa.int64()),
                "n_occupied": pa.array([], pa.int64()),
                "n_clusters": pa.array([], pa.int64()),
                "largest": pa.array([], pa.int64()),
                "giant_frac": pa.array([], pa.float64()),
            }
        )
    avg = tot // nc
    taus = [1, max(avg // 4, 1), max(avg // 2, 1), max(avg, 1)]

    out = {k: [] for k in ("ti", "tau", "occ", "ncl", "big")}
    for ti, tau in enumerate(taus, start=1):
        m = c >= tau
        ox, oy = gx[m], gy[m]
        n = len(ox)
        if n == 0:
            continue
        cell2i = {(int(a), int(b)): i for i, (a, b) in enumerate(zip(ox, oy))}
        parent = list(range(n))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for (a, b), i in cell2i.items():
            for nb in ((a + 1, b), (a, b + 1)):
                j = cell2i.get(nb)
                if j is not None:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[ri] = rj
        roots = np.array([find(i) for i in range(n)], np.int64)
        _, sizes = np.unique(roots, return_counts=True)
        out["ti"].append(ti)
        out["tau"].append(tau)
        out["occ"].append(n)
        out["ncl"].append(len(sizes))
        out["big"].append(int(sizes.max()))
    return pa.table(
        {
            "thr_idx": pa.array(out["ti"], pa.int64()),
            "tau": pa.array(out["tau"], pa.int64()),
            "n_occupied": pa.array(out["occ"], pa.int64()),
            "n_clusters": pa.array(out["ncl"], pa.int64()),
            "largest": pa.array(out["big"], pa.int64()),
            "giant_frac": pa.array(
                [
                    float(np.float64(b) / np.float64(o))
                    for b, o in zip(out["big"], out["occ"])
                ],
                pa.float64(),
            ),
        }
    )


GEO_PERCOLATION_SQL = """
WITH RECURSIVE
pts AS (
  SELECT ((user_id % 12) * 11003) % 120000
           + (user_id * 7919) % 2001 + (event_id * 13) % 1001 AS mlat,
         ((user_id % 12) * 104729) % 340000
           + (user_id * 104729) % 2001 + (event_id * 29) % 1001 AS mlon
  FROM events),
cc AS (
  SELECT mlon // 1000 AS gx, mlat // 1000 AS gy,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM pts GROUP BY 1, 2),
g AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc, CAST(SUM(c) AS BIGINT) AS tot
      FROM cc),
taus AS (
  SELECT 1 AS ti, CAST(1 AS BIGINT) AS tau FROM g
  UNION ALL SELECT 2, GREATEST(tot // nc // 4, 1) FROM g
  UNION ALL SELECT 3, GREATEST(tot // nc // 2, 1) FROM g
  UNION ALL SELECT 4, GREATEST(tot // nc, 1) FROM g),
occ AS (
  SELECT t.ti, t.tau, cc.gx, cc.gy,
         CAST(t.ti AS BIGINT) * 1099511627776 + cc.gx * 1024 + cc.gy AS k
  FROM cc, taus t WHERE cc.c >= t.tau),
e0 AS (
  SELECT a.k AS u, b.k AS v FROM occ a JOIN occ b
    ON a.ti = b.ti
   AND ((b.gx = a.gx + 1 AND b.gy = a.gy)
     OR (b.gx = a.gx AND b.gy = a.gy + 1))),
e AS (SELECT u, v FROM e0 UNION SELECT v, u FROM e0),
reach(node, comp) AS (
  SELECT k, k FROM occ
  UNION
  SELECT e.u, r.comp FROM e JOIN reach r ON r.node = e.v),
lab AS (SELECT node, MIN(comp) AS comp FROM reach GROUP BY node),
comps AS (
  SELECT occ.ti, occ.tau, lab.comp, CAST(COUNT(*) AS BIGINT) AS sz
  FROM occ JOIN lab ON lab.node = occ.k GROUP BY 1, 2, 3),
per AS (
  SELECT ti, tau, CAST(SUM(sz) AS BIGINT) AS n_occupied,
         CAST(COUNT(*) AS BIGINT) AS n_clusters,
         CAST(MAX(sz) AS BIGINT) AS largest
  FROM comps GROUP BY 1, 2)
SELECT CAST(ti AS BIGINT) AS thr_idx, tau, n_occupied, n_clusters, largest,
       CAST(largest AS DOUBLE) / CAST(n_occupied AS DOUBLE) AS giant_frac
FROM per ORDER BY 1
"""


def events_audience_overlap(sf_dir: str):
    """AUDIENCE-OVERLAP MATRIX (pairwise Jaccard between the distinct
    USER SETS of each event type — do clickers also purchase, or are the
    audiences disjoint? The cross-sell / cannibalization table product
    teams read first). Exactness and scale in one trick: instead of a
    distinct-pair self-join, fold each user's types into ONE bitmask
    (types are bounded; discovery pass sorted), then count users per
    mask — a <=2^T-row integer histogram from which EVERY pairwise
    intersection/union is exact integer arithmetic. Plan: per-batch
    (user, bit) dedup -> one user-keyed shuffle (bitwise_or reduceat
    fold) -> bounded mask histogram partials; the driver sees
    O(2^T x blocks) integers, never a user row. Zero-overlap pairs are
    dropped (the SQL join emits no row for them)."""
    import ray
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import map_groups_partitioned

    ds = _read(sf_dir, "events", ["user_id", "event_type"])

    def type_partial(b: pa.Table) -> pa.Table:
        u = np.unique(np.asarray(b["event_type"].to_pylist()))
        return pa.table(
            {
                "event_type": pa.array(u.tolist(), pa.string()),
                "one": pa.array(np.ones(len(u), np.int64)),
            }
        )

    ty_t = _collect_table(
        ds.select_columns(["event_type"])
        .map_batches(type_partial, batch_format="pyarrow", batch_size=131072)
        .groupby("event_type")
        .aggregate(Sum("one", alias_name="n"))
    )
    types = np.sort(np.asarray(ty_t["event_type"].to_pylist()))
    nt = len(types)
    if nt == 0:
        return pa.table(
            {
                "type_a": pa.array([], pa.string()),
                "type_b": pa.array([], pa.string()),
                "n_a": pa.array([], pa.int64()),
                "n_b": pa.array([], pa.int64()),
                "n_both": pa.array([], pa.int64()),
                "jaccard": pa.array([], pa.float64()),
            }
        )
    if nt > 16:
        raise ValueError(
            f"audience bitmask fold assumes a bounded type domain "
            f"(got {nt} > 16 types; the 2^T mask histogram would blow up)"
        )
    ty_ref = ray.put(types)

    def to_bits(b: pa.Table) -> pa.Table:
        ts = ray.get(ty_ref)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        idx = np.searchsorted(ts, np.asarray(b["event_type"].to_pylist()))
        pair = np.unique(
            (uid.astype(np.uint64) << np.uint64(8))
            | idx.astype(np.uint64)
        )
        return pa.table(
            {
                "user_id": pa.array(
                    (pair >> np.uint64(8)).astype(np.int64), pa.int64()
                ),
                "bit": pa.array(
                    np.left_shift(
                        np.int64(1),
                        (pair & np.uint64(255)).astype(np.int64),
                    ),
                    pa.int64(),
                ),
            }
        )

    _m_empty = pa.table(
        {
            "mask": pa.array([], pa.int64()),
            "n": pa.array([], pa.int64()),
        }
    )

    def mask_partial(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return _m_empty
        uid = g["user_id"].to_numpy(zero_copy_only=False)
        bit = g["bit"].to_numpy(zero_copy_only=False)
        order = np.argsort(uid, kind="stable")
        uid, bit = uid[order], bit[order]
        idx = np.nonzero(np.r_[True, uid[1:] != uid[:-1]])[0]
        masks = np.bitwise_or.reduceat(bit, idx)
        um, cnts = np.unique(masks, return_counts=True)
        return pa.table(
            {
                "mask": pa.array(um, pa.int64()),
                "n": pa.array(cnts.astype(np.int64), pa.int64()),
            }
        )

    parts = _collect_table(
        map_groups_partitioned(
            ds.map_batches(to_bits, batch_format="pyarrow", batch_size=131072),
            "user_id",
            mask_partial,
        )
    )  # <= 2^T x n_parts rows
    hist = np.zeros(1 << nt, np.int64)
    np.add.at(
        hist,
        parts["mask"].to_numpy(zero_copy_only=False),
        parts["n"].to_numpy(zero_copy_only=False),
    )
    all_masks = np.arange(1 << nt, dtype=np.int64)
    rows = []
    for a in range(nt):
        na = int(hist[(all_masks >> a) & 1 == 1].sum())
        for b in range(a + 1, nt):
            nb = int(hist[(all_masks >> b) & 1 == 1].sum())
            nab = int(
                hist[
                    (((all_masks >> a) & 1) & ((all_masks >> b) & 1)) == 1
                ].sum()
            )
            if nab == 0:
                continue
            rows.append(
                (
                    str(types[a]),
                    str(types[b]),
                    na,
                    nb,
                    nab,
                    float(np.float64(nab) / np.float64(na + nb - nab)),
                )
            )
    return pa.table(
        {
            "type_a": pa.array([r[0] for r in rows], pa.string()),
            "type_b": pa.array([r[1] for r in rows], pa.string()),
            "n_a": pa.array([r[2] for r in rows], pa.int64()),
            "n_b": pa.array([r[3] for r in rows], pa.int64()),
            "n_both": pa.array([r[4] for r in rows], pa.int64()),
            "jaccard": pa.array([r[5] for r in rows], pa.float64()),
        }
    )


EVENTS_AUDIENCE_OVERLAP_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
p AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_both
  FROM ut a JOIN ut b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2),
c AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY 1)
SELECT p.type_a, p.type_b, ca.n AS n_a, cb.n AS n_b, p.n_both,
       CAST(p.n_both AS DOUBLE)
         / CAST(ca.n + cb.n - p.n_both AS DOUBLE) AS jaccard
FROM p
JOIN c ca ON ca.event_type = p.type_a
JOIN c cb ON cb.event_type = p.type_b
ORDER BY 1, 2
"""


def geo_median_radius(sf_dir: str):
    """POPULATION-CONCENTRATION RADII (the smallest great-circle radii
    around the mean center containing 50% and 90% of all activity — the
    'how far must the CDN reach' / catchment-compactness statistic that
    complements std_ellipse's directional spread). Exactness: the center
    is the FLOOR-mean of exact integer milli-degree sums (no float
    mean); distances use the term-mirrored haversine and FLOOR-quantize
    to integer km (the geo_haversine_pairs contract); the radius ranks
    are exact integer positions (r50 at ceil(n/2), r90 at ceil(9n/10))
    read off a cumulative over the VALUE->COUNT km histogram — distinct
    km values (<=~20,015) reach the driver, never a point row. Plan: one
    integer-moment pass, one map + bounded count_by_u64 pass."""
    from core_ray.stages.agg import count_by_u64
    from core_ray.stages.distband import haversine_km

    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def _milli(b: pa.Table):
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mlat = (
            ((uid % 12) * 11003) % 120000
            + (uid * 7919) % 2001
            + (eid * 13) % 1001
        )
        mlon = (
            ((uid % 12) * 104729) % 340000
            + (uid * 104729) % 2001
            + (eid * 29) % 1001
        )
        return mlat, mlon

    def moment_partial(b: pa.Table) -> pa.Table:
        mlat, mlon = _milli(b)
        return pa.table(
            {
                "n": pa.array([len(mlat)], pa.int64()),
                "sla": pa.array([int(mlat.sum())], pa.int64()),
                "slo": pa.array([int(mlon.sum())], pa.int64()),
            }
        )

    mom = _collect_table(
        ds.map_batches(
            moment_partial, batch_format="pyarrow", batch_size=131072
        )
    )  # O(#blocks) rows
    n = int(pc.sum(mom["n"]).as_py() or 0)
    if n == 0:
        return pa.table(
            {
                "n_events": pa.array([0], pa.int64()),
                "cmlat": pa.array([None], pa.int64()),
                "cmlon": pa.array([None], pa.int64()),
                "r50_km": pa.array([None], pa.int64()),
                "r90_km": pa.array([None], pa.int64()),
            }
        )
    cmlat = int(pc.sum(mom["sla"]).as_py()) // n
    cmlon = int(pc.sum(mom["slo"]).as_py()) // n
    clat = float(np.float64(cmlat) / 1000.0 - 61.5)
    clon = float(np.float64(cmlon) / 1000.0 - 171.5)

    def km_pass(b: pa.Table) -> pa.Table:
        mlat, mlon = _milli(b)
        lat = mlat.astype(np.float64) / 1000.0 - 61.5
        lon = mlon.astype(np.float64) / 1000.0 - 171.5
        km = np.floor(
            haversine_km(
                np.full(len(lat), clat),
                np.full(len(lat), clon),
                lat,
                lon,
            )
        ).astype(np.uint64)
        return pa.table({"key": pa.array(km, pa.uint64())})

    hist = _collect_table(
        count_by_u64(
            ds.map_batches(km_pass, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= ~20,015 distinct km values
    km = hist["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    cnt = hist["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(km)
    km, cnt = km[order], cnt[order]
    cum = np.cumsum(cnt)
    pos50 = (n + 1) // 2
    pos90 = (9 * n + 9) // 10
    r50 = int(km[np.searchsorted(cum, pos50)])
    r90 = int(km[np.searchsorted(cum, pos90)])
    return pa.table(
        {
            "n_events": pa.array([n], pa.int64()),
            "cmlat": pa.array([cmlat], pa.int64()),
            "cmlon": pa.array([cmlon], pa.int64()),
            "r50_km": pa.array([r50], pa.int64()),
            "r90_km": pa.array([r90], pa.int64()),
        }
    )


GEO_MEDIAN_RADIUS_SQL = """
WITH pts AS (
  SELECT ((user_id % 12) * 11003) % 120000
           + (user_id * 7919) % 2001 + (event_id * 13) % 1001 AS mlat,
         ((user_id % 12) * 104729) % 340000
           + (user_id * 104729) % 2001 + (event_id * 29) % 1001 AS mlon
  FROM events),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(mlat) AS BIGINT) AS sla,
         CAST(SUM(mlon) AS BIGINT) AS slo
  FROM pts),
ctr AS (SELECT n, sla // n AS cmlat, slo // n AS cmlon FROM g),
d AS (
  SELECT 2.0 * 6371.0088 * ASIN(SQRT(
           SIN(RADIANS((CAST(p.mlat AS DOUBLE) / 1000.0 - 61.5)
                       - (CAST(c.cmlat AS DOUBLE) / 1000.0 - 61.5)) / 2.0)
           * SIN(RADIANS((CAST(p.mlat AS DOUBLE) / 1000.0 - 61.5)
                         - (CAST(c.cmlat AS DOUBLE) / 1000.0 - 61.5)) / 2.0)
           + COS(RADIANS(CAST(c.cmlat AS DOUBLE) / 1000.0 - 61.5))
             * COS(RADIANS(CAST(p.mlat AS DOUBLE) / 1000.0 - 61.5))
             * SIN(RADIANS((CAST(p.mlon AS DOUBLE) / 1000.0 - 171.5)
                           - (CAST(c.cmlon AS DOUBLE) / 1000.0 - 171.5)) / 2.0)
             * SIN(RADIANS((CAST(p.mlon AS DOUBLE) / 1000.0 - 171.5)
                           - (CAST(c.cmlon AS DOUBLE) / 1000.0 - 171.5)) / 2.0)
         )) AS dist
  FROM pts p, ctr c),
hist AS (
  SELECT CAST(FLOOR(dist) AS BIGINT) AS km, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM d GROUP BY 1),
cum AS (SELECT km, SUM(cnt) OVER (ORDER BY km) AS cum FROM hist)
SELECT ctr.n AS n_events, ctr.cmlat, ctr.cmlon,
       (SELECT MIN(km) FROM cum WHERE cum.cum >= (ctr.n + 1) // 2)
         AS r50_km,
       (SELECT MIN(km) FROM cum WHERE cum.cum >= (9 * ctr.n + 9) // 10)
         AS r90_km
FROM ctr
"""


def emb_pca_power(sf_dir: str, iters: int = 8):
    """TOP PRINCIPAL COMPONENT by distributed POWER ITERATION (the
    spectral sibling of emb_kmeans: dominant direction of the uncentered
    Gram matrix A^T A — embedding-drift monitoring, whitening, and the
    building block of iterative PCA/SVD). Deterministic spec mirrored by
    fixtures/docs_golden.golden_pca_power: v0 = 1/sqrt(d) rounded to 6
    decimals; per iteration ONE map_batches pass emits the d-vector
    partial y_b = A_b^T (A_b v) (constant-size combiner rows — never the
    vectors); the driver folds d doubles, renormalizes, re-rounds to 6 —
    the per-iteration rounding absorbs partial-sum reassociation so the
    distributed path is bit-equal to the single-process golden (the
    emb_kmeans / pagerank determinism contract). Output: per-dim
    loadings + a dim = -1 row with the Rayleigh eigenvalue ||A v||^2
    (rounded 6). The corpus is materialized once and re-read per
    iteration from the object store."""
    import ray

    _ensure_docs_golden(sf_dir)
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()

    def _mat(b: pa.Table) -> np.ndarray:
        col = b["embedding"]
        flat = (
            pc.list_flatten(col)
            .to_numpy(zero_copy_only=False)
            .astype(np.float64)
        )
        return flat.reshape(len(col), -1)

    first = _collect_table(ds.limit(1))
    if first.num_rows == 0:
        return pa.table(
            {
                "dim": pa.array([], pa.int64()),
                "value": pa.array([], pa.float64()),
            }
        )
    d = len(first["embedding"][0].as_py())
    v = sql_round_np(np.full(d, 1.0) / np.sqrt(float(d)), 6)

    def partials(b: pa.Table, vref) -> pa.Table:
        vv = ray.get(vref) if isinstance(vref, ray.ObjectRef) else vref
        x = _mat(b)
        z = x @ vv
        y = x.T @ z
        szz = float((z * z).sum())
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "y": pa.array(y, pa.float64()),
                "szz": pa.array(np.repeat(szz, d), pa.float64()),
            }
        )

    lam = None
    for it in range(iters + 1):
        vref = ray.put(v)
        pt = _collect_table(
            ds.map_batches(
                partials,
                fn_args=(vref,),
                batch_format="pyarrow",
                batch_size=65536,
            )
        )  # d x O(#blocks) rows
        dm = pt["dim"].to_numpy(zero_copy_only=False)
        y = np.zeros(d, np.float64)
        np.add.at(y, dm, pt["y"].to_numpy(zero_copy_only=False))
        if it == iters:
            # final pass: Rayleigh eigenvalue at the converged v only
            lam = float(
                sql_round_np(
                    np.array(
                        [pt["szz"].to_numpy(zero_copy_only=False)[dm == 0].sum()]
                    ),
                    6,
                )[0]
            )
            break
        nrm = float(np.sqrt((y * y).sum()))
        v = sql_round_np(y / nrm, 6)

    return pa.table(
        {
            "dim": pa.array(
                np.r_[np.arange(d, dtype=np.int64), [-1]], pa.int64()
            ),
            "value": pa.array(np.r_[v, [lam]], pa.float64()),
        }
    )


EMB_PCA_POWER_SQL = f"SELECT * FROM read_parquet('{_DGD}/pca.parquet')"


def geo_anisotropy(sf_dir: str):
    """DIRECTIONAL SEMIVARIANCE ANISOTROPY (is spatial structure the same
    east-west as north-south? The geostatistics sanity check before any
    isotropic model like geo_semivariogram is trusted): lag-1 rook
    semivariance computed separately along the x and y axes over
    OBSERVED contact-lattice cells — gamma_dir = sum((c_a - c_b)^2) /
    (2 * n_pairs_dir); anisotropy = gamma_x / gamma_y. Exactness: the
    squared diffs fold in PYTHON ints on the geometry-bounded driver
    table (numpy int64 would overflow SILENTLY at extreme per-cell
    counts; the explicit > 2^63 guard fails loud instead — the
    std_ellipse hatch convention), gammas are ONE double division each.
    Plan: ONE packed count pass; adjacency by sorted-key searchsorted."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def pack(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mlat = (
            ((uid % 12) * 11003) % 120000
            + (uid * 7919) % 2001
            + (eid * 13) % 1001
        )
        mlon = (
            ((uid % 12) * 104729) % 340000
            + (uid * 104729) % 2001
            + (eid * 29) % 1001
        )
        key = ((mlon // 1000) * 1024 + (mlat // 1000)).astype(np.uint64)
        return pa.table({"key": pa.array(key, pa.uint64())})

    cc_t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # bounded by the lattice geometry
    key = np.sort(
        cc_t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    )
    order = np.argsort(cc_t["key"].to_numpy(zero_copy_only=False))
    cnt = cc_t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)[order]

    def _dir_fold(offset: np.uint64):
        nb = key + offset
        pos = np.searchsorted(key, nb)
        pos_c = np.minimum(pos, len(key) - 1)
        hit = key[pos_c] == nb
        ssd, n = 0, 0
        for i in np.nonzero(hit)[0]:
            d = int(cnt[i]) - int(cnt[pos[i]])
            ssd += d * d
            n += 1
        if ssd >= 1 << 63:
            raise OverflowError(
                "directional SSD exceeds int64 — cell counts too large "
                "for the exact fold (re-cell or pre-scale)"
            )
        return n, ssd

    nx, sx = _dir_fold(np.uint64(1024))  # +x: gx + 1
    ny, sy = _dir_fold(np.uint64(1))  # +y: gy + 1
    gx = float(np.float64(sx) / np.float64(2 * nx)) if nx else None
    gy = float(np.float64(sy) / np.float64(2 * ny)) if ny else None
    aniso = (
        float(np.float64(sx) * np.float64(2 * ny)
              / (np.float64(2 * nx) * np.float64(sy)))
        if (nx and ny and sy) else None
    )
    return pa.table(
        {
            "n_pairs_x": pa.array([nx], pa.int64()),
            "n_pairs_y": pa.array([ny], pa.int64()),
            "ssd_x": pa.array([sx], pa.int64()),
            "ssd_y": pa.array([sy], pa.int64()),
            "gamma_x": pa.array([gx], pa.float64()),
            "gamma_y": pa.array([gy], pa.float64()),
            "anisotropy": pa.array([aniso], pa.float64()),
        }
    )


GEO_ANISOTROPY_SQL = """
WITH pts AS (
  SELECT ((user_id % 12) * 11003) % 120000
           + (user_id * 7919) % 2001 + (event_id * 13) % 1001 AS mlat,
         ((user_id % 12) * 104729) % 340000
           + (user_id * 104729) % 2001 + (event_id * 29) % 1001 AS mlon
  FROM events),
cc AS (
  SELECT mlon // 1000 AS gx, mlat // 1000 AS gy,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM pts GROUP BY 1, 2),
ex AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         COALESCE(CAST(SUM((a.c - b.c) * (a.c - b.c)) AS BIGINT), 0) AS ssd
  FROM cc a JOIN cc b ON b.gx = a.gx + 1 AND b.gy = a.gy),
ey AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         COALESCE(CAST(SUM((a.c - b.c) * (a.c - b.c)) AS BIGINT), 0) AS ssd
  FROM cc a JOIN cc b ON b.gx = a.gx AND b.gy = a.gy + 1)
SELECT ex.n AS n_pairs_x, ey.n AS n_pairs_y, ex.ssd AS ssd_x,
       ey.ssd AS ssd_y,
       CASE WHEN ex.n = 0 THEN NULL
            ELSE CAST(ex.ssd AS DOUBLE) / CAST(2 * ex.n AS DOUBLE) END
         AS gamma_x,
       CASE WHEN ey.n = 0 THEN NULL
            ELSE CAST(ey.ssd AS DOUBLE) / CAST(2 * ey.n AS DOUBLE) END
         AS gamma_y,
       CASE WHEN ex.n = 0 OR ey.n = 0 OR ey.ssd = 0 THEN NULL
            ELSE CAST(ex.ssd AS DOUBLE) * CAST(2 * ey.n AS DOUBLE)
                   / (CAST(2 * ex.n AS DOUBLE) * CAST(ey.ssd AS DOUBLE)) END
         AS anisotropy
FROM ex, ey
"""


_HURST_WINDOWS = (16, 64, 256)  # hours; log2 = 4, 6, 8 (equally spaced)


def events_hurst(sf_dir: str):
    """HURST EXPONENT by rescaled-range analysis (long-range dependence
    of the hourly traffic series: H ~ 0.5 = memoryless, H -> 1 =
    persistent trends — THE self-similarity diagnostic for load
    forecasting, and the reason naive Poisson capacity models fail on
    web traffic). R/S per non-overlapping window of w hours, mean
    log2(R/S) per w in {16, 64, 256}, H = the OLS slope over log2(w) —
    with three EQUALLY-SPACED x points the slope reduces exactly to
    (y_256 - y_16) / 4 (the middle point cancels). Exactness: the
    zero-filled hourly grid comes from ONE horizon-bounded count pass
    (the events_changepoint contract); within each window the range
    statistic stays INTEGER via w-scaling (cumd_K = w*cum_K - K*sum, so
    R_scaled = max - min is exact) and S^2_scaled = w*sxx - sx^2 is
    exact; R/S = one correctly-rounded double division by SQRT, its
    log2 micro-quantized, window sums exact integers, H = one fixed
    double chain. Degenerate windows (zero range or zero variance) are
    excluded on both sides; H is NULL unless both end sizes have
    windows."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["ts"])

    def hour_key(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {"key": pa.array((us // 3600000000).astype(np.uint64),
                             pa.uint64())}
        )

    t_ = _collect_table(  # <= horizon-hours rows by construction
        count_by_u64(
            ds.map_batches(hour_key, batch_format="pyarrow",
                           batch_size=131072),
            "key",
        )
    )
    per: dict[int, tuple[int, int]] = {}
    if t_.num_rows == 0:
        n_hours = None
    else:
        hour = t_["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        cnt = t_["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        h0, h1 = int(hour.min()), int(hour.max())
        n_hours = h1 - h0 + 1
        c = np.zeros(n_hours, np.int64)
        c[hour - h0] = cnt
        for w in _HURST_WINDOWS:
            nwin = n_hours // w
            if nwin == 0:
                continue
            x = c[: nwin * w].reshape(nwin, w)
            sx = x.sum(axis=1)
            sxx = (x * x).sum(axis=1)
            cum = np.cumsum(x, axis=1)
            kk = np.arange(1, w + 1, dtype=np.int64)
            cumd = w * cum - kk[None, :] * sx[:, None]
            r = cumd.max(axis=1) - cumd.min(axis=1)
            s2 = w * sxx - sx * sx
            m = (s2 > 0) & (r > 0)
            if not m.any():
                continue
            q = sql_round_np(
                np.log2(
                    r[m].astype(np.float64) / np.sqrt(s2[m].astype(np.float64))
                )
                * 1000000.0,
                0,
            ).astype(np.int64)
            per[w] = (int(m.sum()), int(q.sum()))
    n16, sq16 = per.get(16, (0, 0))
    n64, sq64 = per.get(64, (0, 0))
    n256, sq256 = per.get(256, (0, 0))
    hurst = (
        float(
            (np.float64(sq256) / np.float64(n256)
             - np.float64(sq16) / np.float64(n16))
            / 4000000.0
        )
        if n16 and n256
        else None
    )
    return pa.table(
        {
            "n_hours": pa.array([n_hours], pa.int64()),
            "n_w16": pa.array([n16], pa.int64()),
            "sumq_w16": pa.array([sq16], pa.int64()),
            "n_w64": pa.array([n64], pa.int64()),
            "sumq_w64": pa.array([sq64], pa.int64()),
            "n_w256": pa.array([n256], pa.int64()),
            "sumq_w256": pa.array([sq256], pa.int64()),
            "hurst": pa.array([hurst], pa.float64()),
        }
    )


EVENTS_HURST_SQL = """
WITH pts AS (SELECT epoch_us(ts) // 3600000000 AS h FROM events),
hh AS (SELECT CAST(MIN(h) AS BIGINT) AS h0,
              CAST(MAX(h) - MIN(h) + 1 AS BIGINT) AS t FROM pts),
hours AS (SELECT UNNEST(range(0, (SELECT t FROM hh))) AS k),
cnts AS (SELECT p.h - hh.h0 AS k, CAST(COUNT(*) AS BIGINT) AS c
         FROM pts p, hh GROUP BY 1),
grid AS (SELECT hours.k, CAST(COALESCE(cnts.c, 0) AS BIGINT) AS c
         FROM hours LEFT JOIN cnts USING (k)),
win AS (
  SELECT w.w, grid.k // w.w AS wid, grid.k % w.w AS j, grid.c
  FROM grid, (VALUES (16), (64), (256)) w(w), hh
  WHERE grid.k < (hh.t // w.w) * w.w),
agg AS (
  SELECT w, wid, CAST(SUM(c) AS BIGINT) AS sx,
         CAST(SUM(c * c) AS BIGINT) AS sxx
  FROM win GROUP BY 1, 2),
cum AS (
  SELECT w, wid, j,
         CAST(SUM(c) OVER (PARTITION BY w, wid ORDER BY j) AS BIGINT) AS cx
  FROM win),
cd AS (
  SELECT cum.w, cum.wid, cum.w * cum.cx - (cum.j + 1) * agg.sx AS cumd
  FROM cum JOIN agg ON agg.w = cum.w AND agg.wid = cum.wid),
rng AS (
  SELECT w, wid, CAST(MAX(cumd) - MIN(cumd) AS BIGINT) AS r
  FROM cd GROUP BY 1, 2),
s2t AS (SELECT w, wid, w * sxx - sx * sx AS s2 FROM agg),
qv AS (
  SELECT rng.w,
         CAST(ROUND(LOG2(CAST(rng.r AS DOUBLE)
                         / SQRT(CAST(s2t.s2 AS DOUBLE))) * 1000000.0, 0)
              AS BIGINT) AS q
  FROM rng JOIN s2t ON s2t.w = rng.w AND s2t.wid = rng.wid
  WHERE s2t.s2 > 0 AND rng.r > 0),
per AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(q) AS BIGINT) AS sq
        FROM qv GROUP BY 1),
piv AS (
  SELECT CAST(COALESCE(MAX(CASE WHEN w = 16 THEN n END), 0) AS BIGINT)
           AS n16,
         CAST(COALESCE(MAX(CASE WHEN w = 16 THEN sq END), 0) AS BIGINT)
           AS sq16,
         CAST(COALESCE(MAX(CASE WHEN w = 64 THEN n END), 0) AS BIGINT)
           AS n64,
         CAST(COALESCE(MAX(CASE WHEN w = 64 THEN sq END), 0) AS BIGINT)
           AS sq64,
         CAST(COALESCE(MAX(CASE WHEN w = 256 THEN n END), 0) AS BIGINT)
           AS n256,
         CAST(COALESCE(MAX(CASE WHEN w = 256 THEN sq END), 0) AS BIGINT)
           AS sq256
  FROM per)
SELECT hh.t AS n_hours, piv.n16 AS n_w16, piv.sq16 AS sumq_w16,
       piv.n64 AS n_w64, piv.sq64 AS sumq_w64,
       piv.n256 AS n_w256, piv.sq256 AS sumq_w256,
       CASE WHEN piv.n16 = 0 OR piv.n256 = 0 THEN NULL
            ELSE (CAST(piv.sq256 AS DOUBLE) / CAST(piv.n256 AS DOUBLE)
                  - CAST(piv.sq16 AS DOUBLE) / CAST(piv.n16 AS DOUBLE))
                 / 4000000.0 END AS hurst
FROM hh, piv
"""


def geo_lacunarity(sf_dir: str):
    """LACUNARITY PROFILE (the texture statistic fractal dimension
    misses: two patterns with the SAME boxcount dimension can differ in
    gappiness — lacunarity L(r) = n*sum(m^2)/(sum m)^2 over box masses m
    at box size r reads the hole structure; L -> 1 = translationally
    uniform). Fixed non-overlapping r x r cell blocks at r in {1, 2, 4,
    8} over the contact lattice — deterministic, and every moment is an
    exact integer (box masses are integer sums of integer cell counts).
    Empty boxes inside the pattern's bounding set are excluded (observed
    boxes only — both sides identically, the anisotropy convention).
    Plan: ONE packed count pass (cells geometry-bounded), driver folds
    the <=|cells| table per r; L = one double chain of exact integers."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def pack(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mlat = (
            ((uid % 12) * 11003) % 120000
            + (uid * 7919) % 2001
            + (eid * 13) % 1001
        )
        mlon = (
            ((uid % 12) * 104729) % 340000
            + (uid * 104729) % 2001
            + (eid * 29) % 1001
        )
        key = ((mlon // 1000) * 1024 + (mlat // 1000)).astype(np.uint64)
        return pa.table({"key": pa.array(key, pa.uint64())})

    cc_t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # bounded by the lattice geometry
    key = cc_t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = cc_t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    gx = (key // np.uint64(1024)).astype(np.int64)
    gy = (key % np.uint64(1024)).astype(np.int64)
    out = {k: [] for k in ("r", "n", "sm", "sm2")}
    for r in (1, 2, 4, 8):
        bk = (gx // r) * 1024 + (gy // r)
        ub, inv = np.unique(bk, return_inverse=True)
        m = np.zeros(len(ub), np.int64)
        np.add.at(m, inv, c)
        sm = int(m.sum())
        sm2 = sum(int(v) * int(v) for v in m)  # python ints: no silent wrap
        if sm2 >= 1 << 63:
            raise OverflowError(
                "lacunarity second moment exceeds int64 — box masses too "
                "large for the exact fold (re-cell or pre-scale)"
            )
        out["r"].append(r)
        out["n"].append(len(ub))
        out["sm"].append(sm)
        out["sm2"].append(sm2)
    return pa.table(
        {
            "box_r": pa.array(out["r"], pa.int64()),
            "n_boxes": pa.array(out["n"], pa.int64()),
            "sum_m": pa.array(out["sm"], pa.int64()),
            "sum_m2": pa.array(out["sm2"], pa.int64()),
            "lacunarity": pa.array(
                [
                    float(
                        np.float64(n) * np.float64(s2)
                        / (np.float64(s) * np.float64(s))
                    )
                    for n, s, s2 in zip(out["n"], out["sm"], out["sm2"])
                ],
                pa.float64(),
            ),
        }
    )


GEO_LACUNARITY_SQL = """
WITH pts AS (
  SELECT ((user_id % 12) * 11003) % 120000
           + (user_id * 7919) % 2001 + (event_id * 13) % 1001 AS mlat,
         ((user_id % 12) * 104729) % 340000
           + (user_id * 104729) % 2001 + (event_id * 29) % 1001 AS mlon
  FROM events),
cc AS (
  SELECT mlon // 1000 AS gx, mlat // 1000 AS gy,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM pts GROUP BY 1, 2),
boxes AS (
  SELECT r.r, cc.gx // r.r AS bx, cc.gy // r.r AS by_,
         CAST(SUM(cc.c) AS BIGINT) AS m
  FROM cc, (VALUES (1), (2), (4), (8)) r(r)
  GROUP BY 1, 2, 3),
mo AS (
  SELECT r, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(m) AS BIGINT) AS sm,
         CAST(SUM(m * m) AS BIGINT) AS sm2
  FROM boxes GROUP BY 1)
SELECT CAST(r AS BIGINT) AS box_r, n AS n_boxes, sm AS sum_m,
       sm2 AS sum_m2,
       CAST(n AS DOUBLE) * CAST(sm2 AS DOUBLE)
         / (CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE)) AS lacunarity
FROM mo ORDER BY 1
"""


def geo_spatial_markov(sf_dir: str):
    """SPATIAL MARKOV TRANSITIONS (how places MOVE between density
    classes over time — the regional-dynamics matrix behind 'is the
    urban hierarchy stable, churning, or polarizing'): split the horizon
    at the exact integer midpoint day, classify every contact-lattice
    cell per period as absent (0) / low (1) / high (2) against the
    period's own FLOOR-mean occupied-cell threshold, and count
    class->class transitions over the union of observed cells with
    row-normalized fractions. All-integer until the final row fractions
    (exact FLOOR thresholds; integer class compares). Plan: one scalar
    day-range pass, ONE packed (period, cell) count pass (cells
    geometry-bounded), driver folds the <=2|cells| table."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def day_minmax(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        d = us // 86400000000
        return pa.table(
            {
                "d0": pa.array([int(d.min())], pa.int64()),
                "d1": pa.array([int(d.max())], pa.int64()),
            }
        )

    mm = _collect_table(
        ds.select_columns(["ts"]).map_batches(
            day_minmax, batch_format="pyarrow", batch_size=131072
        )
    )
    if mm.num_rows == 0:
        return pa.table(
            {
                "from_class": pa.array([], pa.int64()),
                "to_class": pa.array([], pa.int64()),
                "n_cells": pa.array([], pa.int64()),
                "row_frac": pa.array([], pa.float64()),
            }
        )
    d0 = int(pc.min(mm["d0"]).as_py())
    d1 = int(pc.max(mm["d1"]).as_py())
    split = (d0 + d1 + 1) // 2

    def pack(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        p = (us // 86400000000 >= split).astype(np.uint64)
        mlat = (
            ((uid % 12) * 11003) % 120000
            + (uid * 7919) % 2001
            + (eid * 13) % 1001
        )
        mlon = (
            ((uid % 12) * 104729) % 340000
            + (uid * 104729) % 2001
            + (eid * 29) % 1001
        )
        cell = ((mlon // 1000) * 1024 + (mlat // 1000)).astype(np.uint64)
        return pa.table(
            {"key": pa.array((p << np.uint64(20)) | cell, pa.uint64())}
        )

    cc_t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= 2 x |cells|, geometry-bounded
    key = cc_t["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = cc_t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    p = (key >> np.uint64(20)).astype(np.int64)
    cell = (key & np.uint64((1 << 20) - 1)).astype(np.int64)
    cls: list[dict] = [{}, {}]
    for period in (0, 1):
        m = p == period
        if not m.any():
            continue
        thr = int(c[m].sum()) // int(m.sum())
        for cl_cell, cl_c in zip(cell[m], c[m]):
            cls[period][int(cl_cell)] = 2 if int(cl_c) > thr else 1
    trans = np.zeros((3, 3), np.int64)
    for u in set(cls[0]) | set(cls[1]):
        trans[cls[0].get(u, 0), cls[1].get(u, 0)] += 1
    rows = [
        (a, b, int(trans[a, b]))
        for a in range(3)
        for b in range(3)
        if trans[a, b] > 0
    ]
    rowsum = trans.sum(axis=1)
    return pa.table(
        {
            "from_class": pa.array([r[0] for r in rows], pa.int64()),
            "to_class": pa.array([r[1] for r in rows], pa.int64()),
            "n_cells": pa.array([r[2] for r in rows], pa.int64()),
            "row_frac": pa.array(
                [
                    float(np.float64(r[2]) / np.float64(rowsum[r[0]]))
                    for r in rows
                ],
                pa.float64(),
            ),
        }
    )


GEO_SPATIAL_MARKOV_SQL = """
WITH pts AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         ((user_id % 12) * 11003) % 120000
           + (user_id * 7919) % 2001 + (event_id * 13) % 1001 AS mlat,
         ((user_id % 12) * 104729) % 340000
           + (user_id * 104729) % 2001 + (event_id * 29) % 1001 AS mlon
  FROM events),
dd AS (SELECT CAST(MIN(day) AS BIGINT) AS d0,
              CAST(MAX(day) AS BIGINT) AS d1 FROM pts),
pcnt AS (
  SELECT CASE WHEN p.day < (dd.d0 + dd.d1 + 1) // 2 THEN 0 ELSE 1 END
           AS per,
         p.mlon // 1000 AS gx, p.mlat // 1000 AS gy,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM pts p, dd GROUP BY 1, 2, 3),
th AS (
  SELECT per, CAST(SUM(c) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS thr
  FROM pcnt GROUP BY 1),
cl AS (
  SELECT pcnt.per, gx, gy,
         CASE WHEN pcnt.c > th.thr THEN 2 ELSE 1 END AS k
  FROM pcnt JOIN th USING (per)),
u AS (
  SELECT COALESCE(a.k, 0) AS k0, COALESCE(b.k, 0) AS k1
  FROM (SELECT gx, gy, k FROM cl WHERE per = 0) a
  FULL OUTER JOIN (SELECT gx, gy, k FROM cl WHERE per = 1) b
    USING (gx, gy)),
t AS (SELECT k0, k1, CAST(COUNT(*) AS BIGINT) AS n FROM u GROUP BY 1, 2),
r AS (SELECT k0, CAST(SUM(n) AS BIGINT) AS rn FROM t GROUP BY 1)
SELECT CAST(t.k0 AS BIGINT) AS from_class, CAST(t.k1 AS BIGINT) AS to_class,
       t.n AS n_cells, CAST(t.n AS DOUBLE) / CAST(r.rn AS DOUBLE) AS row_frac
FROM t JOIN r USING (k0) ORDER BY 1, 2
"""


def events_dow_profile(sf_dir: str):
    """DAY-OF-WEEK PROFILE + WEEKEND LIFT (the calendar complement of the
    hour-of-day views: weekly seasonality and how much monetary activity
    shifts to the weekend). dow = epoch-day % 7 (0 = Thursday, so
    weekend = dow in {2, 3} — the epoch convention, identical integer
    arithmetic both sides; no locale-dependent DAYOFWEEK). Per dow:
    exact integer event count and cents sum, mean = one division. A
    dow = -1 summary row carries totals and, in mean_cents, the weekend
    LIFT = (weekend cents * weekday events) / (weekend events * weekday
    cents) — a ratio of exact integers. One 7-bin combiner pass; the
    driver folds 7 x O(#blocks) integers."""
    ds = _read(sf_dir, "events", ["ts", "value"])

    def partial(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        dow = ((us // 86400000000) % 7).astype(np.int64)
        cents = sql_round_np(
            b["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        n7 = np.bincount(dow, minlength=7).astype(np.int64)
        s7 = np.zeros(7, np.int64)
        np.add.at(s7, dow, cents)
        return pa.table(
            {
                "dow": pa.array(np.arange(7, dtype=np.int64)),
                "n": pa.array(n7, pa.int64()),
                "s": pa.array(s7, pa.int64()),
            }
        )

    parts = _collect_table(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=131072)
    )  # 7 x O(#blocks) rows
    dw = parts["dow"].to_numpy(zero_copy_only=False)
    n = np.zeros(7, np.int64)
    s = np.zeros(7, np.int64)
    np.add.at(n, dw, parts["n"].to_numpy(zero_copy_only=False))
    np.add.at(s, dw, parts["s"].to_numpy(zero_copy_only=False))
    keep = n > 0
    dows = np.arange(7, dtype=np.int64)[keep]
    we = np.isin(np.arange(7), (2, 3))
    n_we, s_we = int(n[we].sum()), int(s[we].sum())
    n_wd, s_wd = int(n[~we].sum()), int(s[~we].sum())
    lift = (
        float(
            np.float64(s_we) * np.float64(n_wd)
            / (np.float64(n_we) * np.float64(s_wd))
        )
        if (n_we and s_wd)
        else None
    )
    return pa.table(
        {
            "dow": pa.array(np.r_[dows, [-1]], pa.int64()),
            "is_weekend": pa.array(
                [int(w) for w in we[keep]] + [None], pa.int64()
            ),
            "n_events": pa.array(
                np.r_[n[keep], [int(n.sum())]], pa.int64()
            ),
            "sum_cents": pa.array(
                np.r_[s[keep], [int(s.sum())]], pa.int64()
            ),
            "mean_cents": pa.array(
                [
                    float(np.float64(sv) / np.float64(nv))
                    for sv, nv in zip(s[keep], n[keep])
                ]
                + [lift],
                pa.float64(),
            ),
        }
    )


EVENTS_DOW_PROFILE_SQL = """
WITH e AS (
  SELECT (epoch_us(ts) // 86400000000) % 7 AS dow,
         CAST(ROUND(value * 100.0, 0) AS BIGINT) AS cents
  FROM events),
per AS (
  SELECT CAST(dow AS BIGINT) AS dow,
         CAST(CASE WHEN dow IN (2, 3) THEN 1 ELSE 0 END AS BIGINT)
           AS is_weekend,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(cents) AS BIGINT) AS sum_cents
  FROM e GROUP BY 1, 2),
tot AS (
  SELECT CAST(SUM(n_events) AS BIGINT) AS tn,
         CAST(SUM(sum_cents) AS BIGINT) AS ts_,
         CAST(SUM(CASE WHEN is_weekend = 1 THEN n_events ELSE 0 END)
              AS BIGINT) AS n_we,
         CAST(SUM(CASE WHEN is_weekend = 1 THEN sum_cents ELSE 0 END)
              AS BIGINT) AS s_we,
         CAST(SUM(CASE WHEN is_weekend = 0 THEN n_events ELSE 0 END)
              AS BIGINT) AS n_wd,
         CAST(SUM(CASE WHEN is_weekend = 0 THEN sum_cents ELSE 0 END)
              AS BIGINT) AS s_wd
  FROM per)
SELECT dow, is_weekend, n_events, sum_cents,
       CAST(sum_cents AS DOUBLE) / CAST(n_events AS DOUBLE) AS mean_cents
FROM per
UNION ALL
SELECT -1, NULL, tn, ts_,
       CASE WHEN n_we = 0 OR s_wd = 0 THEN NULL
            ELSE CAST(s_we AS DOUBLE) * CAST(n_wd AS DOUBLE)
                   / (CAST(n_we AS DOUBLE) * CAST(s_wd AS DOUBLE)) END
FROM tot
"""


def doc_fingerprint_bits(sf_dir: str):
    """SKETCH-QA BIT BALANCE (is the 64-bit rolling-hash fingerprint
    actually uniform? A biased bit silently skews every downstream
    banding/bucketing step — this is the production health check a
    dedup pipeline runs on its own sketches): per bit, the ones count
    over the corpus, the exact integer deviation 2*ones - n, and its
    z-score (one double division by SQRT). Plan: fingerprints computed
    distributed (the doc_fingerprint actor stage), per-batch 64-bin
    popcount partials — the driver folds 64 x O(#blocks) integers.
    Oracle: the independent pure-Python golden fingerprints re-folded by
    DuckDB bit arithmetic (golden-joined; doc_fingerprint proves the
    fingerprint values themselves)."""
    from core_ray.text.analysis import Fingerprinter

    _ensure_docs_golden(sf_dir)
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    fp_ds = ds.map_batches(
        Fingerprinter, batch_format="pyarrow", batch_size=4096,
        concurrency=(1, 4),
    ).select_columns(["fingerprint"])

    def bit_partial(b: pa.Table) -> pa.Table:
        fp = b["fingerprint"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ones = (
            (fp[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
            & np.uint64(1)
        ).sum(axis=0).astype(np.int64)
        return pa.table(
            {
                "bit": pa.array(np.arange(64, dtype=np.int64)),
                "ones": pa.array(ones, pa.int64()),
                "n": pa.array(np.repeat(np.int64(len(fp)), 64), pa.int64()),
            }
        )

    parts = _collect_table(
        fp_ds.map_batches(bit_partial, batch_format="pyarrow",
                          batch_size=65536)
    )  # 64 x O(#blocks) rows
    bit = parts["bit"].to_numpy(zero_copy_only=False)
    ones = np.zeros(64, np.int64)
    np.add.at(ones, bit, parts["ones"].to_numpy(zero_copy_only=False))
    n = int(
        parts["n"].to_numpy(zero_copy_only=False)[bit == 0].sum()
    )
    dev = 2 * ones - n
    return pa.table(
        {
            "bit": pa.array(np.arange(64, dtype=np.int64)),
            "n_ones": pa.array(ones, pa.int64()),
            "n_docs": pa.array(np.repeat(np.int64(n), 64), pa.int64()),
            "dev": pa.array(dev, pa.int64()),
            "z": pa.array(
                [
                    float(np.float64(d) / np.sqrt(np.float64(n)))
                    for d in dev
                ],
                pa.float64(),
            ),
        }
    )


DOC_FINGERPRINT_BITS_SQL = f"""
WITH fp AS (
  SELECT fingerprint FROM read_parquet('{_DGD}/fingerprint.parquet')),
bits AS (SELECT CAST(UNNEST(range(0, 64)) AS BIGINT) AS bit),
q AS (
  SELECT bits.bit,
         CAST(SUM(CAST((fp.fingerprint >> bits.bit) & 1 AS BIGINT))
              AS BIGINT) AS n_ones,
         CAST(COUNT(*) AS BIGINT) AS n_docs
  FROM fp, bits GROUP BY 1)
SELECT bit, n_ones, n_docs, 2 * n_ones - n_docs AS dev,
       CAST(2 * n_ones - n_docs AS DOUBLE)
         / SQRT(CAST(n_docs AS DOUBLE)) AS z
FROM q ORDER BY 1
"""


def events_taylor_law(sf_dir: str):
    """TAYLOR'S POWER LAW (fluctuation scaling: per-place temporal
    variance grows as mean^b across places — b = 1 is Poisson, b -> 2
    is synchronized/bursty; the universality classic from ecology that
    web traffic obeys too, and the principled way to size per-cell
    capacity headroom). Per contact-lattice cell over the zero-filled
    hourly horizon T: mean = sx/T, var = (T*sxx - sx^2)/T^2 — both
    ratios of EXACT integers (zero hours contribute nothing to sx/sxx,
    so one (cell, hour) count pass suffices; no per-cell zero-fill
    materialized). Quantized log2s (micro-bits), integer OLS moments,
    b = ONE double division. The (cell, hour) table is bounded by
    geometry x horizon — never by event rows. Zero-variance cells are
    excluded on both sides."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def pack(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        h = (us // 3600000000).astype(np.uint64)
        mlat = (
            ((uid % 12) * 11003) % 120000
            + (uid * 7919) % 2001
            + (eid * 13) % 1001
        )
        mlon = (
            ((uid % 12) * 104729) % 340000
            + (uid * 104729) % 2001
            + (eid * 29) % 1001
        )
        cell = ((mlon // 1000) * 1024 + (mlat // 1000)).astype(np.uint64)
        return pa.table(
            {"key": pa.array((cell << np.uint64(24)) | h, pa.uint64())}
        )

    t_ = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= |cells| x horizon-hours rows by construction
    if t_.num_rows == 0:
        return pa.table(
            {
                "n_cells_fit": pa.array([0], pa.int64()),
                "n_hours": pa.array([None], pa.int64()),
                "slope_num": pa.array([None], pa.int64()),
                "slope_den": pa.array([None], pa.int64()),
                "taylor_b": pa.array([None], pa.float64()),
            }
        )
    key = t_["key"].to_numpy(zero_copy_only=False).astype(np.uint64)
    c = t_["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    cell = (key >> np.uint64(24)).astype(np.int64)
    h = (key & np.uint64((1 << 24) - 1)).astype(np.int64)
    T = int(h.max()) - int(h.min()) + 1
    order = np.argsort(cell, kind="stable")
    cell, c = cell[order], c[order]
    idx = np.nonzero(np.r_[True, cell[1:] != cell[:-1]])[0]
    sx = np.add.reduceat(c, idx)
    sxx = np.add.reduceat(c * c, idx)
    vnum = T * sxx - sx * sx
    m = vnum > 0
    k = int(m.sum())
    x = sql_round_np(
        np.log2(sx[m].astype(np.float64) / np.float64(T)) * 1000000.0, 0
    ).astype(np.int64)
    y = sql_round_np(
        np.log2(vnum[m].astype(np.float64) / np.float64(T * T))
        * 1000000.0,
        0,
    ).astype(np.int64)
    sxi, syi = int(x.sum()), int(y.sum())
    sxy = int((x * y).sum())
    sxx2 = int((x * x).sum())
    num = k * sxy - sxi * syi
    den = k * sxx2 - sxi * sxi
    return pa.table(
        {
            "n_cells_fit": pa.array([k], pa.int64()),
            "n_hours": pa.array([T], pa.int64()),
            "slope_num": pa.array([num], pa.int64()),
            "slope_den": pa.array([den], pa.int64()),
            "taylor_b": pa.array(
                [
                    float(np.float64(num) / np.float64(den))
                    if den
                    else None
                ],
                pa.float64(),
            ),
        }
    )


EVENTS_TAYLOR_LAW_SQL = """
WITH pts AS (
  SELECT epoch_us(ts) // 3600000000 AS h,
         ((user_id % 12) * 11003) % 120000
           + (user_id * 7919) % 2001 + (event_id * 13) % 1001 AS mlat,
         ((user_id % 12) * 104729) % 340000
           + (user_id * 104729) % 2001 + (event_id * 29) % 1001 AS mlon
  FROM events),
hh AS (SELECT CAST(MAX(h) - MIN(h) + 1 AS BIGINT) AS t FROM pts),
ch AS (
  SELECT mlon // 1000 AS gx, mlat // 1000 AS gy, h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM pts GROUP BY 1, 2, 3),
per AS (
  SELECT gx, gy, CAST(SUM(c) AS BIGINT) AS sx,
         CAST(SUM(c * c) AS BIGINT) AS sxx
  FROM ch GROUP BY 1, 2),
q AS (
  SELECT CAST(ROUND(LOG2(CAST(per.sx AS DOUBLE) / CAST(hh.t AS DOUBLE))
                    * 1000000.0, 0) AS BIGINT) AS x,
         CAST(ROUND(LOG2(CAST(hh.t * per.sxx - per.sx * per.sx AS DOUBLE)
                         / CAST(hh.t * hh.t AS DOUBLE)) * 1000000.0, 0)
              AS BIGINT) AS y
  FROM per, hh WHERE hh.t * per.sxx - per.sx * per.sx > 0),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(x) AS BIGINT) AS sxi,
         CAST(SUM(y) AS BIGINT) AS syi, CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx2
  FROM q)
SELECT m.k AS n_cells_fit, hh.t AS n_hours,
       m.k * m.sxy - m.sxi * m.syi AS slope_num,
       m.k * m.sxx2 - m.sxi * m.sxi AS slope_den,
       CASE WHEN m.k * m.sxx2 - m.sxi * m.sxi = 0 THEN NULL
            ELSE CAST(m.k * m.sxy - m.sxi * m.syi AS DOUBLE)
                   / CAST(m.k * m.sxx2 - m.sxi * m.sxi AS DOUBLE) END
         AS taylor_b
FROM m, hh
"""


def geo_center_drift(sf_dir: str):
    """CENTROGRAPHIC DRIFT (did the center of gravity of activity MOVE
    between the two horizon halves, how far and in which compass
    direction — the one-number migration summary that pairs with
    geo_spatial_markov's class-churn matrix): per period, the FLOOR-mean
    integer milli-degree center (exact integer sums); drift = the
    FLOOR-km term-mirrored haversine between the two centers
    (geo_haversine_pairs contract); bearing = the great-circle initial
    bearing (the geo_bearing_rose formula), normalized to [0, 360) and
    micro-quantized (ATAN2/DEGREES are libm — micro-ROUND absorbs the
    ULPs). Plan: one scalar day-range pass + one 2-row per-period moment
    pass; the driver sees O(#blocks) integers."""
    from core_ray.stages.distband import haversine_km

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def day_minmax(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        d = us // 86400000000
        return pa.table(
            {
                "d0": pa.array([int(d.min())], pa.int64()),
                "d1": pa.array([int(d.max())], pa.int64()),
            }
        )

    mm = _collect_table(
        ds.select_columns(["ts"]).map_batches(
            day_minmax, batch_format="pyarrow", batch_size=131072
        )
    )
    _empty = pa.table(
        {
            "n_first": pa.array([0], pa.int64()),
            "n_second": pa.array([0], pa.int64()),
            "cmlat_first": pa.array([None], pa.int64()),
            "cmlon_first": pa.array([None], pa.int64()),
            "cmlat_second": pa.array([None], pa.int64()),
            "cmlon_second": pa.array([None], pa.int64()),
            "drift_km": pa.array([None], pa.int64()),
            "bearing_micro": pa.array([None], pa.int64()),
        }
    )
    if mm.num_rows == 0:
        return _empty
    d0 = int(pc.min(mm["d0"]).as_py())
    d1 = int(pc.max(mm["d1"]).as_py())
    split = (d0 + d1 + 1) // 2

    def moments(b: pa.Table) -> pa.Table:
        eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        p = (us // 86400000000 >= split).astype(np.int64)
        mlat = (
            ((uid % 12) * 11003) % 120000
            + (uid * 7919) % 2001
            + (eid * 13) % 1001
        )
        mlon = (
            ((uid % 12) * 104729) % 340000
            + (uid * 104729) % 2001
            + (eid * 29) % 1001
        )
        n2 = np.bincount(p, minlength=2).astype(np.int64)
        sla = np.zeros(2, np.int64)
        slo = np.zeros(2, np.int64)
        np.add.at(sla, p, mlat)
        np.add.at(slo, p, mlon)
        return pa.table(
            {
                "p": pa.array(np.arange(2, dtype=np.int64)),
                "n": pa.array(n2, pa.int64()),
                "sla": pa.array(sla, pa.int64()),
                "slo": pa.array(slo, pa.int64()),
            }
        )

    parts = _collect_table(
        ds.map_batches(moments, batch_format="pyarrow", batch_size=131072)
    )  # 2 x O(#blocks) rows
    pcol = parts["p"].to_numpy(zero_copy_only=False)
    n = np.zeros(2, np.int64)
    sla = np.zeros(2, np.int64)
    slo = np.zeros(2, np.int64)
    np.add.at(n, pcol, parts["n"].to_numpy(zero_copy_only=False))
    np.add.at(sla, pcol, parts["sla"].to_numpy(zero_copy_only=False))
    np.add.at(slo, pcol, parts["slo"].to_numpy(zero_copy_only=False))
    if n[0] == 0 or n[1] == 0:
        return _empty
    cmlat = [int(sla[i]) // int(n[i]) for i in (0, 1)]
    cmlon = [int(slo[i]) // int(n[i]) for i in (0, 1)]
    lat = [np.float64(v) / 1000.0 - 61.5 for v in cmlat]
    lon = [np.float64(v) / 1000.0 - 171.5 for v in cmlon]
    km = int(
        np.floor(
            haversine_km(
                np.array([lat[0]]), np.array([lon[0]]),
                np.array([lat[1]]), np.array([lon[1]]),
            )
        )[0]
    )
    la1, lo1 = np.radians(lat[0]), np.radians(lon[0])
    la2, lo2 = np.radians(lat[1]), np.radians(lon[1])
    y = np.sin(lo2 - lo1) * np.cos(la2)
    x = (
        np.cos(la1) * np.sin(la2)
        - np.sin(la1) * np.cos(la2) * np.cos(lo2 - lo1)
    )
    deg = np.degrees(np.arctan2(y, x))
    bearing = int(
        sql_round_np(np.array([(deg + 360.0) % 360.0]) * 1000000.0, 0)[0]
    )
    return pa.table(
        {
            "n_first": pa.array([int(n[0])], pa.int64()),
            "n_second": pa.array([int(n[1])], pa.int64()),
            "cmlat_first": pa.array([cmlat[0]], pa.int64()),
            "cmlon_first": pa.array([cmlon[0]], pa.int64()),
            "cmlat_second": pa.array([cmlat[1]], pa.int64()),
            "cmlon_second": pa.array([cmlon[1]], pa.int64()),
            "drift_km": pa.array([km], pa.int64()),
            "bearing_micro": pa.array([bearing], pa.int64()),
        }
    )


GEO_CENTER_DRIFT_SQL = """
WITH pts AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         ((user_id % 12) * 11003) % 120000
           + (user_id * 7919) % 2001 + (event_id * 13) % 1001 AS mlat,
         ((user_id % 12) * 104729) % 340000
           + (user_id * 104729) % 2001 + (event_id * 29) % 1001 AS mlon
  FROM events),
dd AS (SELECT CAST(MIN(day) AS BIGINT) AS d0,
              CAST(MAX(day) AS BIGINT) AS d1 FROM pts),
per AS (
  SELECT CASE WHEN p.day < (dd.d0 + dd.d1 + 1) // 2 THEN 0 ELSE 1 END
           AS pp,
         CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(p.mlat) AS BIGINT) AS sla,
         CAST(SUM(p.mlon) AS BIGINT) AS slo
  FROM pts p, dd GROUP BY 1),
ctr AS (
  SELECT pp, n, sla // n AS cmlat, slo // n AS cmlon,
         CAST(sla // n AS DOUBLE) / 1000.0 - 61.5 AS lat,
         CAST(slo // n AS DOUBLE) / 1000.0 - 171.5 AS lon
  FROM per),
pair AS (
  SELECT a.n AS n0, b.n AS n1, a.cmlat AS cmlat0, a.cmlon AS cmlon0,
         b.cmlat AS cmlat1, b.cmlon AS cmlon1,
         a.lat AS lat0, a.lon AS lon0, b.lat AS lat1, b.lon AS lon1
  FROM (SELECT * FROM ctr WHERE pp = 0) a,
       (SELECT * FROM ctr WHERE pp = 1) b)
SELECT n0 AS n_first, n1 AS n_second,
       cmlat0 AS cmlat_first, cmlon0 AS cmlon_first,
       cmlat1 AS cmlat_second, cmlon1 AS cmlon_second,
       CAST(FLOOR(2.0 * 6371.0088 * ASIN(SQRT(
         SIN(RADIANS(lat1 - lat0) / 2.0) * SIN(RADIANS(lat1 - lat0) / 2.0)
         + COS(RADIANS(lat0)) * COS(RADIANS(lat1))
           * SIN(RADIANS(lon1 - lon0) / 2.0)
           * SIN(RADIANS(lon1 - lon0) / 2.0)
       ))) AS BIGINT) AS drift_km,
       CAST(ROUND((DEGREES(ATAN2(
         SIN(RADIANS(lon1) - RADIANS(lon0)) * COS(RADIANS(lat1)),
         COS(RADIANS(lat0)) * SIN(RADIANS(lat1))
           - SIN(RADIANS(lat0)) * COS(RADIANS(lat1))
             * COS(RADIANS(lon1) - RADIANS(lon0))))
         + 360.0) % 360.0 * 1000000.0, 0) AS BIGINT) AS bearing_micro
FROM pair
"""


_AVAR_TAUS = (1, 2, 4, 8, 24)


def events_allan_variance(sf_dir: str):
    """ALLAN VARIANCE of the hourly event-rate series at averaging times
    tau = 1/2/4/8/24 h (the clock-stability statistic repurposed as the
    traffic-stability profile: white/Poisson noise falls as 1/tau, rate
    flicker flattens, drift RISES — which regime a feed is in decides
    how long a capacity average is trustworthy): the zero-filled hourly
    count series (events_hourly_acf contract), non-overlapping block
    sums y_k over tau hours (only COMPLETE blocks), numerator
    sum((y_{k+1}-y_k)^2) kept as an EXACT integer, and
    avar(tau) = num / (2*(m-1)*tau^2) as ONE double division of exact
    integers. One packed count pass bounded by the horizon; driver folds
    <= horizon-hours rows. Taus with fewer than two complete blocks are
    omitted on both sides."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["ts"])

    def pack(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {"key": pa.array((us // 3600000000).astype(np.uint64), pa.uint64())}
        )

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )  # <= horizon-hours rows
    rows = []
    if t.num_rows:
        h = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        h0 = int(h.min())
        series = np.zeros(int(h.max()) - h0 + 1, np.int64)
        series[h - h0] = c
        for tau in _AVAR_TAUS:
            m = len(series) // tau
            if m < 2:
                continue
            y = series[: m * tau].reshape(m, tau).sum(axis=1)
            d = y[1:] - y[:-1]
            num = int((d * d).sum())
            avar = float(
                np.float64(num) / np.float64(2 * (m - 1) * tau * tau)
            )
            rows.append((tau, m, num, avar))
    return pa.table(
        {
            "tau_h": pa.array([r[0] for r in rows], pa.int64()),
            "n_blocks": pa.array([r[1] for r in rows], pa.int64()),
            "avar_num": pa.array([r[2] for r in rows], pa.int64()),
            "avar": pa.array([r[3] for r in rows], pa.float64()),
        }
    )


def events_runs_test(sf_dir: str):
    """WALD-WOLFOWITZ RUNS TEST on the hourly traffic series (is
    above-average load RANDOMLY interleaved with below-average load, or
    does it clump — the nonparametric regime-persistence check that
    needs no distributional assumption at all): the zero-filled hourly
    count series, the above-GLOBAL-MEAN indicator computed by EXACT
    integer cross-multiplication (y_i * H > total — no mean division
    ever happens), runs counted as 1 + sign changes. z is derived from
    all-integer terms: with A = H*(R-1) - 2*n1*n2 and
    B = 2*n1*n2*(2*n1*n2 - H), z = A * sqrt(H-1) / sqrt(B) — two sqrts
    of exact integers, one multiply, one divide (bit-equal when the SQL
    mirrors the tree); NULL when degenerate (B <= 0 or H < 2). One
    packed horizon-bounded count pass; driver folds the series."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["ts"])

    def pack(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {"key": pa.array((us // 3600000000).astype(np.uint64), pa.uint64())}
        )

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )
    if t.num_rows == 0:  # mirror the SQL's empty-grid row exactly
        return pa.table(
            {
                "h_bins": pa.array([0], pa.int64()),
                "n_above": pa.array([None], pa.int64()),
                "n_below": pa.array([None], pa.int64()),
                "n_runs": pa.array([1], pa.int64()),
                "z": pa.array([None], pa.float64()),
            }
        )
    h = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    h0 = int(h.min())
    series = np.zeros(int(h.max()) - h0 + 1, np.int64)
    series[h - h0] = c
    H = len(series)
    total = int(series.sum())
    above = (series * H > total).astype(np.int64)
    n1 = int(above.sum())
    n2 = H - n1
    runs = 1 + int((above[1:] != above[:-1]).sum()) if H > 1 else 1
    A = H * (runs - 1) - 2 * n1 * n2
    B = 2 * n1 * n2 * (2 * n1 * n2 - H)
    z = (
        float(np.float64(A) * np.sqrt(np.float64(H - 1)) / np.sqrt(np.float64(B)))
        if B > 0 and H > 1
        else None
    )
    return pa.table(
        {
            "h_bins": pa.array([H], pa.int64()),
            "n_above": pa.array([n1], pa.int64()),
            "n_below": pa.array([n2], pa.int64()),
            "n_runs": pa.array([runs], pa.int64()),
            "z": pa.array([z], pa.float64()),
        }
    )


def events_turning_points(sf_dir: str):
    """TURNING-POINT TEST on the hourly traffic series (the second
    classical randomness check beside the runs test — counts STRICT
    local maxima/minima; too few means trend/momentum, too many means
    oscillation): zero-filled hourly counts, tp counted vectorized on
    the interior, expectation 2(H-2)/3 and variance (16H-29)/90 folded
    into all-integer terms: with A = 3*tp - 2*(H-2),
    z = A * sqrt(90) / (3 * sqrt(16H-29)) — sqrts of exact integers,
    term-mirrored in SQL; NULL when H < 3. One packed horizon-bounded
    count pass; plateaus (ties) are not turning points on either side
    by the strict inequalities."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["ts"])

    def pack(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {"key": pa.array((us // 3600000000).astype(np.uint64), pa.uint64())}
        )

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )
    if t.num_rows == 0:
        return pa.table(
            {
                "h_bins": pa.array([0], pa.int64()),
                "n_turning": pa.array([0], pa.int64()),
                "z": pa.array([None], pa.float64()),
            }
        )
    h = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    h0 = int(h.min())
    series = np.zeros(int(h.max()) - h0 + 1, np.int64)
    series[h - h0] = c
    H = len(series)
    tp = 0
    if H >= 3:
        prev, cur, nxt = series[:-2], series[1:-1], series[2:]
        tp = int(
            (((cur > prev) & (cur > nxt)) | ((cur < prev) & (cur < nxt))).sum()
        )
    A = 3 * tp - 2 * (H - 2)
    z = (
        float(
            np.float64(A) * np.sqrt(np.float64(90.0))
            / (3.0 * np.sqrt(np.float64(16 * H - 29)))
        )
        if H >= 3
        else None
    )
    return pa.table(
        {
            "h_bins": pa.array([H], pa.int64()),
            "n_turning": pa.array([tp], pa.int64()),
            "z": pa.array([z], pa.float64()),
        }
    )


def doc_vocab_jaccard(sf_dir: str):
    """HEMISPHERE VOCABULARY JACCARD (the set-overlap companion to
    doc_hemisphere_jsd's distributional divergence: how much of the
    east-hemisphere VOCABULARY is shared with the west at all — corpus
    drift as presence, not frequency): distinct (side, token) pairs per
    batch (batch dedup is a pure optimization — presence is idempotent),
    hash-partitioned BY TOKEN so each partition decides its tokens'
    east/west/both membership exactly, one integer partial row per
    partition, driver folds n_parts rows; jaccard and the two
    containments are single double divisions of exact integers."""
    from core_ray.stages.agg import hash_strings, map_groups_partitioned

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def side_tokens(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        east = (doc_id * 104729) % 360000 >= 180000
        toks_l = []
        for e, t in zip(east, b["text"].to_pylist()):
            pref = "E" if e else "W"
            for w in t.split(" "):  # mirrors SQL string_split(text, ' ')
                toks_l.append(pref + w)
        if not toks_l:
            return pa.table(
                {"st": pa.array([], pa.string()), "gh": pa.array([], pa.uint64())}
            )
        u = np.unique(np.asarray(toks_l))
        tok_col = pa.array([s[1:] for s in u], pa.string())
        return pa.table(
            {
                "st": pa.array(u, pa.string()),
                "gh": pa.array(hash_strings(tok_col), pa.uint64()),
            }
        )

    sided = ds.map_batches(side_tokens, batch_format="pyarrow", batch_size=512)

    def per_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "ve": pa.array([], pa.int64()),
                    "vw": pa.array([], pa.int64()),
                    "vb": pa.array([], pa.int64()),
                    "vu": pa.array([], pa.int64()),
                }
            )
        st = np.asarray(g["st"].to_pylist())
        sides = np.asarray([s[0] for s in st])
        toks = np.asarray([s[1:] for s in st])
        order = np.argsort(toks, kind="stable")
        ts, ss = toks[order], sides[order]
        new = np.r_[True, ts[1:] != ts[:-1]]
        seg = np.cumsum(new) - 1
        n_tok = int(seg[-1]) + 1
        he = np.zeros(n_tok, bool)
        hw = np.zeros(n_tok, bool)
        he[seg[ss == "E"]] = True
        hw[seg[ss == "W"]] = True
        return pa.table(
            {
                "ve": pa.array([int(he.sum())], pa.int64()),
                "vw": pa.array([int(hw.sum())], pa.int64()),
                "vb": pa.array([int((he & hw).sum())], pa.int64()),
                "vu": pa.array([n_tok], pa.int64()),
            }
        )

    parts = _collect_table(map_groups_partitioned(sided, "gh", per_part))
    ve = int(pc.sum(parts["ve"]).as_py() or 0)
    vw = int(pc.sum(parts["vw"]).as_py() or 0)
    vb = int(pc.sum(parts["vb"]).as_py() or 0)
    vu = int(pc.sum(parts["vu"]).as_py() or 0)
    return pa.table(
        {
            "v_east": pa.array([ve], pa.int64()),
            "v_west": pa.array([vw], pa.int64()),
            "v_both": pa.array([vb], pa.int64()),
            "v_union": pa.array([vu], pa.int64()),
            "jaccard": pa.array(
                [float(np.float64(vb) / np.float64(vu)) if vu > 0 else None],
                pa.float64(),
            ),
            "cont_east": pa.array(
                [float(np.float64(vb) / np.float64(ve)) if ve > 0 else None],
                pa.float64(),
            ),
            "cont_west": pa.array(
                [float(np.float64(vb) / np.float64(vw)) if vw > 0 else None],
                pa.float64(),
            ),
        }
    )


DOC_VOCAB_JACCARD_SQL = """
WITH toks AS (
  SELECT (doc_id * 104729) % 360000 >= 180000 AS east,
         UNNEST(string_split(text, ' ')) AS w
  FROM documents),
cc AS (
  SELECT w, MAX(CASE WHEN east THEN 1 ELSE 0 END) AS he,
         MAX(CASE WHEN NOT east THEN 1 ELSE 0 END) AS hw
  FROM toks GROUP BY 1)
SELECT CAST(SUM(he) AS BIGINT) AS v_east, CAST(SUM(hw) AS BIGINT) AS v_west,
       CAST(SUM(he * hw) AS BIGINT) AS v_both,
       CAST(COUNT(*) AS BIGINT) AS v_union,
       CASE WHEN COUNT(*) > 0
            THEN CAST(CAST(SUM(he * hw) AS BIGINT) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE) ELSE NULL END AS jaccard,
       CASE WHEN CAST(SUM(he) AS BIGINT) > 0
            THEN CAST(CAST(SUM(he * hw) AS BIGINT) AS DOUBLE)
                 / CAST(CAST(SUM(he) AS BIGINT) AS DOUBLE)
            ELSE NULL END AS cont_east,
       CASE WHEN CAST(SUM(hw) AS BIGINT) > 0
            THEN CAST(CAST(SUM(he * hw) AS BIGINT) AS DOUBLE)
                 / CAST(CAST(SUM(hw) AS BIGINT) AS DOUBLE)
            ELSE NULL END AS cont_west
FROM cc
"""


def events_lorenz_deciles(sf_dir: str):
    """LORENZ DECILE TABLE of per-user activity (the distributional
    companion to events_user_gini's single number: how much of all
    traffic does each activity decile carry — the '90% of load from the
    top decile' capacity fact): users ranked by (count, user_id) and cut
    into NTILE(10) groups. The Ray side never needs user identities:
    users with equal counts are interchangeable across a decile
    boundary, so the VALUE->FREQUENCY histogram of per-user counts (a
    count_by_u64 over counts — bounded by distinct activity levels, not
    users) plus NTILE's deterministic group sizes reproduce the decile
    sums exactly. All integers until one share division per row."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["user_id"])

    def pack(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": pa.array(
                    b["user_id"].to_numpy(zero_copy_only=False).astype(np.uint64),
                    pa.uint64(),
                )
            }
        )

    uc = count_by_u64(
        ds.map_batches(pack, batch_format="pyarrow", batch_size=131072), "key"
    )
    hist = _collect_table(
        count_by_u64(
            uc.map_batches(
                lambda b: pa.table({"key": pc.cast(b["cnt"], pa.uint64())}),
                batch_format="pyarrow",
            ),
            "key",
        )
    )  # activity level -> user frequency; <= distinct levels rows
    if hist.num_rows == 0:
        return pa.table(
            {
                "decile": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64()),
                "events_sum": pa.array([], pa.int64()),
                "share": pa.array([], pa.float64()),
            }
        )
    c = hist["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    f = hist["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(c)
    c, f = c[order], f[order]
    n = int(f.sum())
    total = int((c * f).sum())
    q, r = divmod(n, 10)
    sizes = [q + 1 if k <= r else q for k in range(1, 11)]  # NTILE split
    rows = []
    level = 0  # index into (c, f); rem = users left at this level
    rem = int(f[0])
    for dec, size in enumerate(sizes, start=1):
        if size == 0:
            continue
        need, ev = size, 0
        while need > 0:
            take = min(need, rem)
            ev += take * int(c[level])
            rem -= take
            need -= take
            if rem == 0 and level + 1 < len(c):
                level += 1
                rem = int(f[level])
        rows.append((dec, size, ev))
    return pa.table(
        {
            "decile": pa.array([r_[0] for r_ in rows], pa.int64()),
            "n_users": pa.array([r_[1] for r_ in rows], pa.int64()),
            "events_sum": pa.array([r_[2] for r_ in rows], pa.int64()),
            "share": pa.array(
                [float(np.float64(r_[2]) / np.float64(total)) for r_ in rows],
                pa.float64(),
            ),
        }
    )


EVENTS_LORENZ_DECILES_SQL = """
WITH uc AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1),
t AS (SELECT c, NTILE(10) OVER (ORDER BY c, user_id) AS dec FROM uc)
SELECT CAST(dec AS BIGINT) AS decile, CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(c) AS BIGINT) AS events_sum,
       CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)
         / CAST((SELECT CAST(SUM(c) AS BIGINT) FROM uc) AS DOUBLE) AS share
FROM t GROUP BY 1 ORDER BY 1
"""


def doc_span_dup_fraction(sf_dir: str):
    """DUPLICATED-SPAN FRACTION per language (the Lee-et-al
    'Deduplicating Training Data' measurement: what fraction of 8-gram
    OCCURRENCES belong to grams that appear in 2+ distinct documents —
    near-dup pair mining tells you which docs collide, this tells you
    how much raw TEXT is cross-document boilerplate, per language):
    per-batch (gram, doc) occurrence counts (docs are row-local so
    batch-level doc dedup is global), hash-partitioned BY GRAM so each
    partition sees a gram's every document — distinct-doc counts and
    the dup flag are exact there — then per-lang integer partials
    (total_occ, dup_occ) to a tiny final groupby; dup_frac is ONE
    double division. The gram vocabulary never reaches the driver."""
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import hash_strings, map_groups_partitioned

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "text"])

    def doc_grams(b: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "gram": pa.array([], pa.string()),
                "lang": pa.array([], pa.string()),
                "occ": pa.array([], pa.int64()),
                "gh": pa.array([], pa.uint64()),
            }
        )
        langs_doc = np.asarray(b["lang"].to_pylist())
        ridx, grams = _word_ngrams(b["text"].to_pylist(), _SHINGLE_N)
        if len(grams) == 0:
            return empty
        order = np.lexsort((ridx, grams))
        g2, r2 = grams[order], ridx[order]
        new = np.r_[True, (g2[1:] != g2[:-1]) | (r2[1:] != r2[:-1])]
        starts = np.nonzero(new)[0]
        occ = np.diff(np.append(starts, len(g2))).astype(np.int64)
        gram_col = pa.array(g2[starts], pa.string())
        return pa.table(
            {
                "gram": gram_col,
                "lang": pa.array(langs_doc[r2[starts]], pa.string()),
                "occ": pa.array(occ, pa.int64()),
                "gh": pa.array(hash_strings(gram_col), pa.uint64()),
            }
        )

    gram_ds = ds.map_batches(doc_grams, batch_format="pyarrow", batch_size=512)

    def per_part(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "lang": pa.array([], pa.string()),
                "total_occ": pa.array([], pa.int64()),
                "dup_occ": pa.array([], pa.int64()),
            }
        )
        if g.num_rows == 0:
            return empty
        grams = np.asarray(g["gram"].to_pylist())
        langs = np.asarray(g["lang"].to_pylist())
        occ = g["occ"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(grams, kind="stable")
        gs, ls, oc = grams[order], langs[order], occ[order]
        new = np.r_[True, gs[1:] != gs[:-1]]
        seg = np.cumsum(new) - 1
        starts = np.nonzero(new)[0]
        d = np.diff(np.append(starts, len(gs)))  # distinct docs per gram
        dup_row = (d >= 2)[seg]
        ul, inv = np.unique(ls, return_inverse=True)
        tot = np.zeros(len(ul), np.int64)
        dup = np.zeros(len(ul), np.int64)
        np.add.at(tot, inv, oc)
        np.add.at(dup, inv, np.where(dup_row, oc, 0))
        return pa.table(
            {
                "lang": pa.array(ul, pa.string()),
                "total_occ": pa.array(tot, pa.int64()),
                "dup_occ": pa.array(dup, pa.int64()),
            }
        )

    agg = _collect_table(
        map_groups_partitioned(gram_ds, "gh", per_part)
        .groupby("lang")
        .aggregate(
            Sum("total_occ", alias_name="total_occ"),
            Sum("dup_occ", alias_name="dup_occ"),
        )
    ).sort_by("lang")
    tot = agg["total_occ"].to_numpy(zero_copy_only=False).astype(np.int64)
    dup = agg["dup_occ"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "lang": agg["lang"],
            "total_occ": pa.array(tot, pa.int64()),
            "dup_occ": pa.array(dup, pa.int64()),
            "dup_frac": pa.array(
                [
                    float(np.float64(d_) / np.float64(t_)) if t_ > 0 else None
                    for d_, t_ in zip(dup, tot)
                ],
                pa.float64(),
            ),
        }
    )


DOC_SPAN_DUP_FRACTION_SQL = """
WITH ws AS (SELECT doc_id, lang, string_split(text, ' ') AS l FROM documents),
raw AS (
  SELECT doc_id, lang,
         UNNEST(list_transform(generate_series(1, len(l) - 7),
                i -> l[i] || ' ' || l[i+1] || ' ' || l[i+2] || ' ' || l[i+3]
                     || ' ' || l[i+4] || ' ' || l[i+5] || ' ' || l[i+6]
                     || ' ' || l[i+7])) AS gram
  FROM ws),
df AS (SELECT gram, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS d
       FROM raw GROUP BY 1)
SELECT r.lang, CAST(COUNT(*) AS BIGINT) AS total_occ,
       CAST(SUM(CASE WHEN df.d >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_occ,
       CAST(CAST(SUM(CASE WHEN df.d >= 2 THEN 1 ELSE 0 END) AS BIGINT)
            AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS dup_frac
FROM raw r JOIN df USING (gram) GROUP BY 1 ORDER BY 1
"""


_SFCA_R2 = 900.0  # squared-degree catchment radius (30 deg)


def geo_2sfca(sf_dir: str):
    """TWO-STEP FLOATING CATCHMENT AREA accessibility (the standard
    spatial-accessibility measure: step 1 gives each facility a
    supply-to-demand ratio over its catchment, step 2 sums the ratios
    every demand point can reach — where is service-rich vs
    service-poor?): facilities are the 12 model city centers with
    deterministic integer capacities; the per-facility ratio is the
    EXACT integer supply*1e9 // demand, so the step-2 sum is an
    order-free integer and the whole measure is float-parity-free.
    Distribution: one demand-count pass ((B x 12) vectorized mask ->
    12-bin partials), ratio vector as a task constant, one access pass
    (int mask @ ratio), count_by_u64 histogram — the driver sees 12
    integers plus O(distinct access levels) rows (bounded by the 2^12
    reach combinations, in practice far fewer)."""
    from core_ray.stages.agg import count_by_u64

    k = np.arange(12, dtype=np.int64)
    f_lat = ((k * 11003) % 120000) / 1000.0 - 60.0
    f_lon = ((k * 104729) % 340000) / 1000.0 - 170.0
    supply = 100 + (k * 37) % 50  # int64

    ds = _read(sf_dir, "documents", ["doc_id"])

    def demand_partial(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(doc_id)
        dla = lat[:, None] - f_lat[None, :]
        dlo = lon[:, None] - f_lon[None, :]
        reach = (dla * dla + dlo * dlo) <= _SFCA_R2
        return pa.table(
            {
                "fac_id": pa.array(k, pa.int64()),
                "d": pa.array(reach.sum(axis=0).astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    dem = _collect_table(
        ds.map_batches(demand_partial, batch_format="pyarrow", batch_size=131072)
        .groupby("fac_id")
        .aggregate(Sum("d", alias_name="demand"))
    ).sort_by("fac_id")
    D = np.zeros(12, np.int64)
    D[dem["fac_id"].to_numpy(zero_copy_only=False)] = dem[
        "demand"
    ].to_numpy(zero_copy_only=False)
    ratio = np.where(D > 0, supply * 1_000_000_000 // np.maximum(D, 1), 0)

    def access(b: pa.Table) -> pa.Table:
        doc_id = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat, lon = _derive_coords(doc_id)
        dla = lat[:, None] - f_lat[None, :]
        dlo = lon[:, None] - f_lon[None, :]
        reach = ((dla * dla + dlo * dlo) <= _SFCA_R2).astype(np.int64)
        a = reach @ ratio  # exact integer accessibility
        return pa.table({"key": pa.array(a.astype(np.uint64), pa.uint64())})

    hist = _collect_table(
        count_by_u64(
            ds.map_batches(access, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )
    a = hist["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = hist["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(a)
    return pa.table(
        {
            "access_micro": pa.array(a[order], pa.int64()),
            "n_docs": pa.array(n[order], pa.int64()),
        }
    )


GEO_2SFCA_SQL = f"""
WITH pts AS (
  SELECT doc_id, {GEO_LAT_SQL} AS lat, {GEO_LON_SQL} AS lon FROM documents),
facs AS (
  SELECT k AS fac_id,
         ((k * 11003) % 120000) / 1000.0 - 60.0 AS flat,
         ((k * 104729) % 340000) / 1000.0 - 170.0 AS flon,
         CAST(100 + (k * 37) % 50 AS BIGINT) AS supply
  FROM range(12) t(k)),
dem AS (
  SELECT f.fac_id, f.supply, CAST(COUNT(p.doc_id) AS BIGINT) AS d
  FROM facs f LEFT JOIN pts p
    ON (p.lat - f.flat) * (p.lat - f.flat)
       + (p.lon - f.flon) * (p.lon - f.flon) <= {_SFCA_R2}
  GROUP BY 1, 2),
ratio AS (
  SELECT fac_id,
         CASE WHEN d > 0 THEN supply * 1000000000 // d ELSE 0 END AS rm,
         (SELECT flat FROM facs WHERE facs.fac_id = dem.fac_id) AS flat,
         (SELECT flon FROM facs WHERE facs.fac_id = dem.fac_id) AS flon
  FROM dem),
acc AS (
  SELECT p.doc_id, CAST(COALESCE(SUM(r.rm), 0) AS BIGINT) AS a
  FROM pts p LEFT JOIN ratio r
    ON (p.lat - r.flat) * (p.lat - r.flat)
       + (p.lon - r.flon) * (p.lon - r.flon) <= {_SFCA_R2}
  GROUP BY 1)
SELECT a AS access_micro, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM acc GROUP BY 1 ORDER BY 1
"""


_HUB_K = 5


def emb_hubness(sf_dir: str, chunk_rows: int = 4096):
    """HUBNESS of the embedding space (the k-occurrence histogram: how many
    times each vector appears in other vectors' top-5 neighbor lists —
    high-dimensional spaces grow 'hub' points that pollute kNN graphs,
    retrieval and dedup verify steps, and the skewed tail of this
    histogram is the standard diagnostic): distances are EXACT integers
    (each vector micro-quantized ONCE to 1e-6 units, then pure integer
    (a-b)^2 sums), neighbor order is the total (d2, vec_id) order, so
    there is no float-rank parity risk anywhere. Distribution: the
    emb_near_dup_pairs block-nested-loop — chunk refs in the object
    store, one task per chunk pair emitting per-row LOCAL top-5
    candidates (global top-5 is a subset of the union), a groupby(src)
    merge, then two count_by_u64 folds (neighbor occurrences ->
    occurrence histogram); the driver sees O(distinct occ) rows plus one
    count."""
    import ray

    from core_ray.stages.agg import count_by_u64

    def pack(b: pa.Table) -> pa.Table:
        x = np.array(b["embedding"].to_pylist(), dtype=np.float64)
        q = sql_round_np(x * 1000000.0, 0).astype(np.int64)
        return pa.table(
            {
                "vec_id": b["vec_id"],
                "qvec": pa.array([r.tobytes() for r in q], pa.binary()),
            }
        )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    packed = ds.map_batches(pack, batch_format="pyarrow", batch_size=chunk_rows)
    refs = packed.to_arrow_refs()
    n_chunks = len(refs)

    def _chunk_np(t: pa.Table):
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) == 0:
            return ids, np.zeros((0, 1), dtype=np.int64)
        mat = np.frombuffer(b"".join(t["qvec"].to_pylist()), dtype=np.int64)
        return ids, mat.reshape(len(ids), -1)

    def local_topk(batch: pa.Table, refs=refs) -> pa.Table:
        out_s, out_n, out_d = [], [], []
        for ci, cjs in zip(batch["ci"].to_pylist(), batch["cjs"].to_pylist()):
            ids_i, xi = _chunk_np(ray.get(refs[ci]))
            if not len(ids_i):
                continue
            sq_i = (xi * xi).sum(axis=1)
            for cj in cjs:
                ids_j, xj = _chunk_np(ray.get(refs[cj]))
                if not len(ids_j):
                    continue
                d2 = (
                    sq_i[:, None]
                    + (xj * xj).sum(axis=1)[None, :]
                    - 2 * (xi @ xj.T)
                )  # exact int64
                if ci == cj:
                    np.fill_diagonal(d2, np.iinfo(np.int64).max)
                k = min(_HUB_K, d2.shape[1] - (1 if ci == cj else 0))
                if k <= 0:
                    continue
                for r in range(d2.shape[0]):
                    row = d2[r]
                    sel = (
                        np.argpartition(row, k - 1)[:k]
                        if k < len(row)
                        else np.arange(len(row))
                    )
                    sel = sel[np.lexsort((ids_j[sel], row[sel]))][:k]
                    out_s.extend([ids_i[r]] * len(sel))
                    out_n.extend(ids_j[sel].tolist())
                    out_d.extend(row[sel].tolist())
        return pa.table(
            {
                "src": pa.array(out_s, pa.int64()),
                "nbr": pa.array(out_n, pa.int64()),
                "d2": pa.array(out_d, pa.int64()),
            }
        )

    seg = 8
    pair_items = []
    for i in range(n_chunks):
        cjs = list(range(n_chunks))  # full row: every chunk contributes candidates
        for s in range(0, len(cjs), seg):
            pair_items.append({"ci": i, "cjs": cjs[s : s + seg]})
    cand = ray.data.from_items(pair_items).map_batches(
        local_topk, batch_format="pyarrow", batch_size=1
    )

    def merge(g: pa.Table) -> pa.Table:
        nbr = g["nbr"].to_numpy(zero_copy_only=False)
        d2 = g["d2"].to_numpy(zero_copy_only=False)
        top = np.lexsort((nbr, d2))[:_HUB_K]
        return pa.table({"key": pa.array(nbr[top].astype(np.uint64), pa.uint64())})

    nbrs = cand.groupby("src").map_groups(merge, batch_format="pyarrow")
    occ = count_by_u64(nbrs, "key").map_batches(
        lambda b: pa.table(
            {"key": pc.cast(b["cnt"], pa.uint64())}
        ),
        batch_format="pyarrow",
    )
    hist = _collect_table(count_by_u64(occ, "key"))  # occ -> n_vecs
    n_total = _read(sf_dir, "embeddings", ["vec_id"]).count()
    o = hist["key"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = hist["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    n0 = n_total - int(n.sum())
    if n0 > 0:
        o = np.concatenate([[0], o])
        n = np.concatenate([[n0], n])
    order = np.argsort(o)
    return pa.table(
        {
            "occ": pa.array(o[order], pa.int64()),
            "n_vecs": pa.array(n[order], pa.int64()),
        }
    )


EMB_HUBNESS_SQL = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        v -> CAST(ROUND(v * 1000000.0, 0) AS BIGINT)) AS e
  FROM embeddings),
d AS (
  SELECT a.vec_id AS src, b.vec_id AS nbr,
         CAST(list_sum(list_transform(generate_series(1, len(a.e)),
           i -> (a.e[i] - b.e[i]) * (a.e[i] - b.e[i]))) AS BIGINT) AS d2
  FROM q a JOIN q b ON a.vec_id <> b.vec_id),
top AS (
  SELECT nbr FROM d
  QUALIFY ROW_NUMBER() OVER (PARTITION BY src ORDER BY d2, nbr) <= {_HUB_K}),
occ AS (SELECT nbr, CAST(COUNT(*) AS BIGINT) AS o FROM top GROUP BY 1),
alloc AS (
  SELECT e.vec_id, COALESCE(occ.o, 0) AS o
  FROM embeddings e LEFT JOIN occ ON occ.nbr = e.vec_id)
SELECT o AS occ, CAST(COUNT(*) AS BIGINT) AS n_vecs
FROM alloc GROUP BY 1 ORDER BY 1
"""


def doc_yule_k(sf_dir: str):
    """YULE'S CHARACTERISTIC K per language (the classical
    vocabulary-richness constant — repetitiveness of the token
    distribution independent of corpus length, the stylometric signal
    that separates boilerplate-heavy from organic text): from the token
    frequency spectrum, K = 10^4 * (S2 - S1) / S1^2 with S1 = total
    tokens and S2 = sum of squared per-token counts — BOTH exact
    integers, one double expression at the end. Distribution: per-batch
    (lang, token) combiner counts, hash-partitioned by the combined key
    so each partition's sums are GLOBAL for its tokens (doc_vocab_top20
    contract), per-partition fold to per-lang (vocab, S1, S2) partials,
    tiny final groupby — the full vocabulary never reaches the driver."""
    from ray.data.aggregate import Sum

    from core_ray.stages.agg import _GOLD, _n_parts, hash_strings

    ds = _read(sf_dir, "documents", ["lang", "text"])
    n_parts = _n_parts()

    def count_tokens(b: pa.Table) -> pa.Table:
        langs_l, toks_l = [], []
        for lang, text in zip(b["lang"].to_pylist(), b["text"].to_pylist()):
            for w in text.split():
                langs_l.append(lang)
                toks_l.append(w)
        if not toks_l:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "token": pa.array([], pa.string()),
                    "n": pa.array([], pa.int64()),
                    "__part": pa.array([], pa.int32()),
                }
            )
        # \x01 separator: numpy unicode arrays strip NULs, so \x00 is
        # unusable; langs are fixed short codes that never contain \x01,
        # so the combined key is injective
        combined = np.char.add(
            np.char.add(np.asarray(langs_l), "\x01"), np.asarray(toks_l)
        )
        u, c = np.unique(combined, return_counts=True)
        parts_np = np.char.partition(u, "\x01")
        h = hash_strings(pa.array(u, pa.string()))
        part = ((h * _GOLD) % np.uint64(n_parts)).astype(np.int32)
        return pa.table(
            {
                "lang": pa.array(parts_np[:, 0], pa.string()),
                "token": pa.array(parts_np[:, 2], pa.string()),
                "n": pa.array(c.astype(np.int64), pa.int64()),
                "__part": pa.array(part, pa.int32()),
            }
        )

    def reduce_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "lang": pa.array([], pa.string()),
                    "v": pa.array([], pa.int64()),
                    "s1": pa.array([], pa.int64()),
                    "s2": pa.array([], pa.int64()),
                }
            )
        langs = np.asarray(g["lang"].to_pylist())
        toks = np.asarray(g["token"].to_pylist())
        cnts = g["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        combined = np.char.add(np.char.add(langs, "\x01"), toks)
        order = np.argsort(combined, kind="stable")
        cs, cc, cl = combined[order], cnts[order], langs[order]
        new = np.ones(len(cs), dtype=bool)
        new[1:] = cs[1:] != cs[:-1]
        starts = np.nonzero(new)[0]
        m = np.add.reduceat(cc, starts)  # GLOBAL count per (lang, token)
        glangs = cl[starts]
        ul, inv = np.unique(glangs, return_inverse=True)
        v = np.bincount(inv).astype(np.int64)
        s1 = np.zeros(len(ul), np.int64)
        s2 = np.zeros(len(ul), np.int64)
        np.add.at(s1, inv, m)
        np.add.at(s2, inv, m * m)
        return pa.table(
            {
                "lang": pa.array(ul, pa.string()),
                "v": pa.array(v, pa.int64()),
                "s1": pa.array(s1, pa.int64()),
                "s2": pa.array(s2, pa.int64()),
            }
        )

    agg = _collect_table(
        ds.map_batches(count_tokens, batch_format="pyarrow", batch_size=65536)
        .groupby("__part")
        .map_groups(reduce_part, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(
            Sum("v", alias_name="vocab"),
            Sum("s1", alias_name="s1"),
            Sum("s2", alias_name="s2"),
        )
    ).sort_by("lang")
    v = agg["vocab"].to_numpy(zero_copy_only=False).astype(np.int64)
    s1 = agg["s1"].to_numpy(zero_copy_only=False).astype(np.int64)
    s2 = agg["s2"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "lang": agg["lang"],
            "vocab": pa.array(v, pa.int64()),
            "s1": pa.array(s1, pa.int64()),
            "s2": pa.array(s2, pa.int64()),
            "k_yule": pa.array(
                [
                    (
                        float(
                            10000.0 * np.float64(b - a)
                            / (np.float64(a) * np.float64(a))
                        )
                        if a > 0
                        else None
                    )
                    for a, b in zip(s1, s2)
                ],
                pa.float64(),
            ),
        }
    )


DOC_YULE_K_SQL = """
WITH toks AS (
  SELECT lang, UNNEST(regexp_split_to_array(trim(text), '\\s+')) AS token
  FROM documents WHERE trim(text) <> ''),
m AS (
  SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks WHERE token <> '' GROUP BY 1, 2)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS vocab,
       CAST(SUM(c) AS BIGINT) AS s1, CAST(SUM(c * c) AS BIGINT) AS s2,
       CASE WHEN CAST(SUM(c) AS BIGINT) > 0
            THEN 10000.0 * CAST(CAST(SUM(c * c) AS BIGINT)
                                - CAST(SUM(c) AS BIGINT) AS DOUBLE)
                 / (CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE)
                    * CAST(CAST(SUM(c) AS BIGINT) AS DOUBLE))
            ELSE NULL END AS k_yule
FROM m GROUP BY 1 ORDER BY 1
"""


_POT_EIGHTHS = (4, 5, 6, 7)


def events_mean_excess(sf_dir: str):
    """PEAKS-OVER-THRESHOLD MEAN-EXCESS PROFILE of the event values (the
    extreme-value-theory diagnostic: a mean excess that RISES with the
    threshold means a heavy/Pareto tail, flat means exponential — the
    principled way to pick what 'anomalously large transaction' means):
    values quantized to integer cents once (sql_round contract),
    thresholds at 4/8..7/8 of the GLOBAL max (exact integer u =
    max*t//8), and per threshold the exceedance count and the EXACT
    integer excess sum; mean_excess = ONE double division. Two passes:
    a max fold, then one 4-threshold partial pass (O(#blocks x 4)
    combiner rows to a tiny groupby)."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["value"])

    def vmax(b: pa.Table) -> pa.Table:
        cents = sql_round_np(
            b["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        if len(cents) == 0:
            return pa.table({"m": pa.array([], pa.int64())})
        return pa.table({"m": pa.array([int(cents.max())], pa.int64())})

    mt = _collect_table(ds.map_batches(vmax, batch_format="pyarrow", batch_size=131072))
    if mt.num_rows == 0:
        return pa.table(
            {
                "threshold_cents": pa.array([], pa.int64()),
                "n_exceed": pa.array([], pa.int64()),
                "excess_sum": pa.array([], pa.int64()),
                "mean_excess": pa.array([], pa.float64()),
            }
        )
    cmax = int(pc.max(mt["m"]).as_py())
    us = np.array([cmax * t // 8 for t in _POT_EIGHTHS], dtype=np.int64)

    def partial(b: pa.Table) -> pa.Table:
        cents = sql_round_np(
            b["value"].to_numpy(zero_copy_only=False) * 100.0, 0
        ).astype(np.int64)
        n = np.zeros(len(us), np.int64)
        s = np.zeros(len(us), np.int64)
        for i, u in enumerate(us):
            exc = cents[cents > u]
            n[i] = len(exc)
            s[i] = int((exc - u).sum())
        return pa.table(
            {
                "threshold_cents": pa.array(us, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "s": pa.array(s, pa.int64()),
            }
        )

    agg = _collect_table(
        ds.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("threshold_cents")
        .aggregate(Sum("n", alias_name="n_exceed"), Sum("s", alias_name="excess_sum"))
    ).sort_by("threshold_cents")
    n = agg["n_exceed"].to_numpy(zero_copy_only=False).astype(np.int64)
    s = agg["excess_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "threshold_cents": agg["threshold_cents"],
            "n_exceed": pa.array(n, pa.int64()),
            "excess_sum": pa.array(s, pa.int64()),
            "mean_excess": pa.array(
                [
                    float(np.float64(si) / np.float64(ni)) if ni > 0 else None
                    for si, ni in zip(s, n)
                ],
                pa.float64(),
            ),
        }
    )


_POT_EIGHTHS_SQL = ", ".join(str(t) for t in _POT_EIGHTHS)

EVENTS_MEAN_EXCESS_SQL = f"""
WITH cents AS (
  SELECT CAST(ROUND(value * 100.0, 0) AS BIGINT) AS c FROM events),
mx AS (SELECT CAST(MAX(c) AS BIGINT) AS m FROM cents),
th AS (
  SELECT CAST(mx.m * t.t // 8 AS BIGINT) AS u
  FROM (SELECT UNNEST([{_POT_EIGHTHS_SQL}]) AS t) t, mx)
SELECT th.u AS threshold_cents,
       CAST(COUNT(CASE WHEN c.c > th.u THEN 1 END) AS BIGINT) AS n_exceed,
       CAST(COALESCE(SUM(CASE WHEN c.c > th.u THEN c.c - th.u END), 0)
            AS BIGINT) AS excess_sum,
       CASE WHEN COUNT(CASE WHEN c.c > th.u THEN 1 END) > 0
            THEN CAST(SUM(CASE WHEN c.c > th.u THEN c.c - th.u END) AS DOUBLE)
                 / CAST(COUNT(CASE WHEN c.c > th.u THEN 1 END) AS DOUBLE)
            ELSE NULL END AS mean_excess
FROM th LEFT JOIN cents c ON TRUE
GROUP BY 1 ORDER BY 1
"""


_HAAR_MAX_LEVEL = 8


def events_haar_energy(sf_dir: str):
    """HAAR WAVELET ENERGY SPECTRUM of the hourly traffic series (which
    TIME SCALE carries the variance — the multiresolution complement of
    the periodogram: dyadic detail energies localize bursts in time
    where Fourier smears them): the zero-filled hourly series truncated
    to P = the largest power of two <= H; at level j (scale 2^j hours)
    the detail coefficient of block k is (first-half sum) - (second-half
    sum) — an EXACT integer — and energy_j = sum(d^2) is an exact
    integer too; energy_frac = energy_j / total over levels is ONE
    double division of exact integers. One packed horizon-bounded count
    pass; the driver folds a <= horizon-length series. Levels run
    1..min(8, log2 P)."""
    from core_ray.stages.agg import count_by_u64

    ds = _read(sf_dir, "events", ["ts"])

    def pack(b: pa.Table) -> pa.Table:
        us = pc.cast(b["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {"key": pa.array((us // 3600000000).astype(np.uint64), pa.uint64())}
        )

    t = _collect_table(
        count_by_u64(
            ds.map_batches(pack, batch_format="pyarrow", batch_size=131072),
            "key",
        )
    )
    rows = []
    if t.num_rows:
        h = t["key"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        h0 = int(h.min())
        series = np.zeros(int(h.max()) - h0 + 1, np.int64)
        series[h - h0] = c
        H = len(series)
        P = 1 << (H.bit_length() - 1)
        x = series[:P]
        for j in range(1, _HAAR_MAX_LEVEL + 1):
            w = 1 << j
            if w > P:
                break
            blocks = x.reshape(P // w, 2, w // 2).sum(axis=2)
            d = blocks[:, 0] - blocks[:, 1]
            rows.append((j, P // w, int((d * d).sum())))
    tot = sum(r[2] for r in rows)
    return pa.table(
        {
            "level": pa.array([r[0] for r in rows], pa.int64()),
            "n_coeffs": pa.array([r[1] for r in rows], pa.int64()),
            "energy": pa.array([r[2] for r in rows], pa.int64()),
            "energy_frac": pa.array(
                [
                    (float(np.float64(r[2]) / np.float64(tot)) if tot > 0 else None)
                    for r in rows
                ],
                pa.float64(),
            ),
        }
    )


EVENTS_HAAR_ENERGY_SQL = f"""
WITH cc AS (
  SELECT epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM cc),
pw AS (SELECT CAST(POWER(2, FLOOR(LOG2(CAST(h1 - h0 + 1 AS DOUBLE))))
              AS BIGINT) AS p FROM span),
grid AS (
  SELECT g.h - (SELECT h0 FROM span) AS i, COALESCE(cc.c, 0) AS c
  FROM (SELECT UNNEST(generate_series((SELECT h0 FROM span),
                                      (SELECT h1 FROM span))) AS h) g
  LEFT JOIN cc ON cc.h = g.h),
levels AS (
  SELECT UNNEST(generate_series(1, {_HAAR_MAX_LEVEL})) AS j),
details AS (
  SELECT l.j, g.i // (CAST(1 AS BIGINT) << l.j) AS k,
         CAST(SUM(CASE WHEN (g.i // (CAST(1 AS BIGINT) << (l.j - 1))) % 2 = 0
                       THEN g.c ELSE -g.c END) AS BIGINT) AS d
  FROM levels l JOIN grid g ON g.i < (SELECT p FROM pw)
  WHERE (CAST(1 AS BIGINT) << l.j) <= (SELECT p FROM pw)
  GROUP BY 1, 2),
energy AS (
  SELECT j AS level, CAST(COUNT(*) AS BIGINT) AS n_coeffs,
         CAST(SUM(d * d) AS BIGINT) AS energy
  FROM details GROUP BY 1)
SELECT level, n_coeffs, energy,
       CASE WHEN CAST(SUM(energy) OVER () AS BIGINT) > 0
            THEN CAST(energy AS DOUBLE)
                 / CAST(CAST(SUM(energy) OVER () AS BIGINT) AS DOUBLE)
            ELSE NULL END AS energy_frac
FROM energy ORDER BY 1
"""


EVENTS_TURNING_POINTS_SQL = """
WITH cc AS (
  SELECT epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM cc),
grid AS (
  SELECT g.h, COALESCE(cc.c, 0) AS c
  FROM (SELECT UNNEST(generate_series((SELECT h0 FROM span),
                                      (SELECT h1 FROM span))) AS h) g
  LEFT JOIN cc ON cc.h = g.h),
lagged AS (
  SELECT c, LAG(c) OVER (ORDER BY h) AS pc, LEAD(c) OVER (ORDER BY h) AS nc
  FROM grid),
stat AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM grid) AS h_bins,
         CAST(COALESCE(SUM(CASE WHEN (c > pc AND c > nc)
                                  OR (c < pc AND c < nc)
                                THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp
  FROM lagged WHERE pc IS NOT NULL AND nc IS NOT NULL)
SELECT h_bins, tp AS n_turning,
       CASE WHEN h_bins >= 3
            THEN CAST(3 * tp - 2 * (h_bins - 2) AS DOUBLE) * SQRT(90.0)
                 / (3.0 * SQRT(CAST(16 * h_bins - 29 AS DOUBLE)))
            ELSE NULL END AS z
FROM stat
"""


EVENTS_RUNS_TEST_SQL = """
WITH cc AS (
  SELECT epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM cc),
grid AS (
  SELECT g.h, COALESCE(cc.c, 0) AS c
  FROM (SELECT UNNEST(generate_series((SELECT h0 FROM span),
                                      (SELECT h1 FROM span))) AS h) g
  LEFT JOIN cc ON cc.h = g.h),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS hn,
               CAST(SUM(c) AS BIGINT) AS total FROM grid),
ind AS (
  SELECT g.h, CASE WHEN g.c * t.hn > t.total THEN 1 ELSE 0 END AS a
  FROM grid g, tot t),
runs AS (
  SELECT CAST(1 + SUM(CASE WHEN a <> pa THEN 1 ELSE 0 END) AS BIGINT) AS r
  FROM (SELECT a, LAG(a) OVER (ORDER BY h) AS pa FROM ind)
  WHERE pa IS NOT NULL),
stat AS (
  SELECT t.hn AS h_bins,
         (SELECT CAST(SUM(a) AS BIGINT) FROM ind) AS n1,
         t.hn - (SELECT CAST(SUM(a) AS BIGINT) FROM ind) AS n2,
         COALESCE((SELECT r FROM runs), 1) AS r
  FROM tot t)
SELECT h_bins, n1 AS n_above, n2 AS n_below, r AS n_runs,
       CASE WHEN 2 * n1 * n2 * (2 * n1 * n2 - h_bins) > 0 AND h_bins > 1
            THEN CAST(h_bins * (r - 1) - 2 * n1 * n2 AS DOUBLE)
                 * SQRT(CAST(h_bins - 1 AS DOUBLE))
                 / SQRT(CAST(2 * n1 * n2 * (2 * n1 * n2 - h_bins) AS DOUBLE))
            ELSE NULL END AS z
FROM stat
"""


_AVAR_TAU_SQL = ", ".join(str(t) for t in _AVAR_TAUS)

EVENTS_ALLAN_VARIANCE_SQL = f"""
WITH cc AS (
  SELECT epoch_us(ts) // 3600000000 AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1),
span AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM cc),
grid AS (
  SELECT g.h - (SELECT h0 FROM span) AS i, COALESCE(cc.c, 0) AS c
  FROM (SELECT UNNEST(generate_series((SELECT h0 FROM span),
                                      (SELECT h1 FROM span))) AS h) g
  LEFT JOIN cc ON cc.h = g.h),
taus AS (SELECT UNNEST([{_AVAR_TAU_SQL}]) AS tau),
blocks AS (
  SELECT t.tau, g.i // t.tau AS k, CAST(SUM(g.c) AS BIGINT) AS y
  FROM taus t JOIN grid g
    ON g.i < ((SELECT h1 - h0 + 1 FROM span) // t.tau) * t.tau
  GROUP BY 1, 2),
diffs AS (
  SELECT a.tau, b.y - a.y AS d
  FROM blocks a JOIN blocks b ON b.tau = a.tau AND b.k = a.k + 1),
agg AS (
  SELECT tau, CAST(COUNT(*) + 1 AS BIGINT) AS m,
         CAST(SUM(d * d) AS BIGINT) AS num
  FROM diffs GROUP BY 1)
SELECT CAST(tau AS BIGINT) AS tau_h, m AS n_blocks, num AS avar_num,
       CAST(num AS DOUBLE) / CAST(2 * (m - 1) * tau * tau AS DOUBLE) AS avar
FROM agg WHERE m >= 2 ORDER BY 1
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_region_revenue": q5_region_revenue,
    "events_hourly": events_hourly,
    "events_top_users": events_top_users,
    "events_sessionize": events_sessionize,
    "doc_token_stats": doc_token_stats,
    "doc_lang_dist": doc_lang_dist,
    "doc_exact_dedup": doc_exact_dedup,
    "doc_quality": doc_quality,
    "doc_langid": doc_langid,
    "doc_fingerprint": doc_fingerprint,
    "doc_minhash_pairs": doc_minhash_pairs,
    "doc_dup_clusters": doc_dup_clusters,
    "doc_dup_geo_spread": doc_dup_geo_spread,
    "doc_dup_source_matrix": doc_dup_source_matrix,
    "doc_cross_lingual_dup": doc_cross_lingual_dup,
    "doc_dedup_keep": doc_dedup_keep,
    "doc_simhash_pairs": doc_simhash_pairs,
    "emb_topk": emb_topk,
    "emb_centroids": emb_centroids,
    "emb_ann_lsh": emb_ann_lsh,
    "geo_tile_counts": geo_tile_counts,
    "geo_tile_regions": geo_tile_regions,
    "geo_dbscan": geo_dbscan,
    "pages_url_filter": pages_url_filter,
    "geo_pip_admin": geo_pip_admin,
    "geo_knn_tile": geo_knn_tile,
    "pages_joined": pages_joined,
    "pages_tiles": pages_tiles,
    "pages_knn": pages_knn,
    "pages_errors": pages_errors,
    "pages_nested": pages_nested,
    "pages_nested2": pages_nested2,
    "pages_rules": pages_rules,
    "media_features": media_features,
    "doc_top20_by_chars": doc_top20_by_chars,
    "events_distinct_types": events_distinct_types,
    "doc_sample_mod": doc_sample_mod,
    "events_asof_purchase": events_asof_purchase,
    "doc_encrypt_roundtrip": doc_encrypt_roundtrip,
    "emb_near_dup_pairs": emb_near_dup_pairs,
    "emb_silhouette": emb_silhouette,
    "emb_dup_clusters": emb_dup_clusters,
    "emb_ann_ivf": emb_ann_ivf,
    "emb_kmeans": emb_kmeans,
    "geo_convex_hull": geo_convex_hull,
    "media_thumbnails": media_thumbnails,
    "media_frames": media_frames,
    "events_rolling_max": events_rolling_max,
    "events_late_data": events_late_data,
    "events_window_join": events_window_join,
    "doc_top2_per_lang": doc_top2_per_lang,
    "doc_bm25_topk": doc_bm25_topk,
    "events_value_quantiles": events_value_quantiles,
    "cust_no_orders": cust_no_orders,
    "cust_orders_full_outer": cust_orders_full_outer,
    "doc_incremental_new": doc_incremental_new,
    "events_value_histogram": events_value_histogram,
    "orders_cust_join": orders_cust_join,
    "events_funnel": events_funnel,
    "q10_returned_revenue": q10_returned_revenue,
    "doc_vocab_top20": doc_vocab_top20,
    "events_props_stats": events_props_stats,
    "events_hopping": events_hopping,
    "doc_sample_bottomk": doc_sample_bottomk,
    "media_phash_pairs": media_phash_pairs,
    "events_rollup": events_rollup,
    "q4_priority_semi": q4_priority_semi,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q12_priority_class": q12_priority_class,
    "q13_cust_order_dist": q13_cust_order_dist,
    "q14_promo_revenue": q14_promo_revenue,
    "q16_supplier_cnt": q16_supplier_cnt,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q18_heavy_orders": q18_heavy_orders,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q22_idle_balance": q22_idle_balance,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q7_nation_volume": q7_nation_volume,
    "q15_top_supplier": q15_top_supplier,
    "events_lag_delta": events_lag_delta,
    "events_user_rank": events_user_rank,
    "events_cumsum": events_cumsum,
    "events_pivot_hourly": events_pivot_hourly,
    "events_corr_moments": events_corr_moments,
    "region_nations_agg": region_nations_agg,
    "events_purchasers_except": events_purchasers_except,
    "doc_sample_stratified": doc_sample_stratified,
    "doc_tfidf_top3": doc_tfidf_top3,
    "q8_market_share": q8_market_share,
    "q9_profit_proxy": q9_profit_proxy,
    "q11_balance_concentration": q11_balance_concentration,
    "q20_excess_shippers": q20_excess_shippers,
    "q21_sole_supplier": q21_sole_supplier,
    "geo_zonal_stats": geo_zonal_stats,
    "geo_distance_pairs": geo_distance_pairs,
    "geo_haversine_pairs": geo_haversine_pairs,
    "geo_traj_stats": geo_traj_stats,
    "geo_segment_crossings": geo_segment_crossings,
    "geo_area_interp": geo_area_interp,
    "events_geofence": events_geofence,
    "geo_kde_tiles": geo_kde_tiles,
    "events_contacts": events_contacts,
    "events_stay_points": events_stay_points,
    "doc_shingle_containment": doc_shingle_containment,
    "geo_colocation": geo_colocation,
    "geo_bearing_rose": geo_bearing_rose,
    "geo_traj_simplify": geo_traj_simplify,
    "events_od_matrix": events_od_matrix,
    "doc_unigram_surprisal": doc_unigram_surprisal,
    "geo_moran_i": geo_moran_i,
    "geo_getis_gi": geo_getis_gi,
    "geo_knn_classify": geo_knn_classify,
    "geo_morton_parts": geo_morton_parts,
    "geo_idw_interp": geo_idw_interp,
    "geo_semivariogram": geo_semivariogram,
    "geo_stratified_sample": geo_stratified_sample,
    "geo_nearest_facility": geo_nearest_facility,
    "events_speed_outliers": events_speed_outliers,
    "geo_map_match": geo_map_match,
    "doc_toponym_resolve": doc_toponym_resolve,
    "geo_quadtree": geo_quadtree,
    "geo_grid_bfs": geo_grid_bfs,
    "events_corridors": events_corridors,
    "doc_source_geo_entropy": doc_source_geo_entropy,
    "events_tile_trend": events_tile_trend,
    "geo_doc_event_band": geo_doc_event_band,
    "events_gyration": events_gyration,
    "doc_lang_dissimilarity": doc_lang_dissimilarity,
    "events_user_entropy": events_user_entropy,
    "doc_geo_tfidf": doc_geo_tfidf,
    "events_jump_lengths": events_jump_lengths,
    "events_msd": events_msd,
    "events_return_times": events_return_times,
    "geo_cell_turnover": geo_cell_turnover,
    "events_flow_imbalance": events_flow_imbalance,
    "geo_huff_share": geo_huff_share,
    "events_burstiness": events_burstiness,
    "events_nearest_doc": events_nearest_doc,
    "geo_isochrone": geo_isochrone,
    "doc_zipf_fit": doc_zipf_fit,
    "events_sinuosity": events_sinuosity,
    "geo_lang_boundaries": geo_lang_boundaries,
    "events_cell_gini": events_cell_gini,
    "geo_theil_decomp": geo_theil_decomp,
    "geo_pip_partitioned": geo_pip_partitioned,
    "events_visit_ranks": events_visit_ranks,
    "geo_region_mad": geo_region_mad,
    "events_peak_hour": events_peak_hour,
    "doc_toponym_cooccur": doc_toponym_cooccur,
    "geo_chars_dist_corr": geo_chars_dist_corr,
    "events_mann_kendall": events_mann_kendall,
    "events_sen_slope": events_sen_slope,
    "geo_join_counts": geo_join_counts,
    "events_knox": events_knox,
    "events_type_region_chisq": events_type_region_chisq,
    "doc_length_ks": doc_length_ks,
    "doc_heaps_law": doc_heaps_law,
    "events_benford": events_benford,
    "doc_hemisphere_jsd": doc_hemisphere_jsd,
    "geo_lang_simpson": geo_lang_simpson,
    "geo_lisa_quadrants": geo_lisa_quadrants,
    "events_circular_hours": events_circular_hours,
    "events_contact_degrees": events_contact_degrees,
    "geo_gravity_fit": geo_gravity_fit,
    "events_daily_motifs": events_daily_motifs,
    "geo_boxcount_dimension": geo_boxcount_dimension,
    "doc_hemisphere_rbo": doc_hemisphere_rbo,
    "events_diurnal_anova": events_diurnal_anova,
    "doc_distance_decay": doc_distance_decay,
    "events_markov_entropy": events_markov_entropy,
    "doc_lang_region_mi": doc_lang_region_mi,
    "doc_term_burstiness": doc_term_burstiness,
    "doc_pmi_collocations": doc_pmi_collocations,
    "events_contact_assortativity": events_contact_assortativity,
    "events_user_gini": events_user_gini,
    "doc_length_lognormal": doc_length_lognormal,
    "events_hourly_acf": events_hourly_acf,
    "geo_std_ellipse": geo_std_ellipse,
    "geo_ripley_k": geo_ripley_k,
    "geo_cross_k": geo_cross_k,
    "geo_quadrat_vmr": geo_quadrat_vmr,
    "geo_clark_evans": geo_clark_evans,
    "geo_bivariate_moran": geo_bivariate_moran,
    "events_st_dbscan": events_st_dbscan,
    "events_st_getis": events_st_getis,
    "events_emerging_hotspots": events_emerging_hotspots,
    "emb_ann_recall": emb_ann_recall,
    "events_traj_hausdorff": events_traj_hausdorff,
    "doc_dedup_method_overlap": doc_dedup_method_overlap,
    "doc_curation_funnel": doc_curation_funnel,
    "geo_correlogram": geo_correlogram,
    "events_changepoint": events_changepoint,
    "events_periodogram": events_periodogram,
    "geo_geometric_median": geo_geometric_median,
    "geo_rank_size": geo_rank_size,
    "events_hill_tail": events_hill_tail,
    "events_rfm_segments": events_rfm_segments,
    "doc_readability": doc_readability,
    "geo_percolation": geo_percolation,
    "events_audience_overlap": events_audience_overlap,
    "geo_median_radius": geo_median_radius,
    "emb_pca_power": emb_pca_power,
    "geo_anisotropy": geo_anisotropy,
    "events_hurst": events_hurst,
    "geo_lacunarity": geo_lacunarity,
    "geo_spatial_markov": geo_spatial_markov,
    "events_dow_profile": events_dow_profile,
    "doc_fingerprint_bits": doc_fingerprint_bits,
    "events_taylor_law": events_taylor_law,
    "geo_center_drift": geo_center_drift,
    "events_allan_variance": events_allan_variance,
    "events_runs_test": events_runs_test,
    "events_turning_points": events_turning_points,
    "events_haar_energy": events_haar_energy,
    "events_mean_excess": events_mean_excess,
    "doc_yule_k": doc_yule_k,
    "emb_hubness": emb_hubness,
    "geo_2sfca": geo_2sfca,
    "doc_span_dup_fraction": doc_span_dup_fraction,
    "events_lorenz_deciles": events_lorenz_deciles,
    "doc_vocab_jaccard": doc_vocab_jaccard,
    "events_type_ccf": events_type_ccf,
    "geo_type_hhi": geo_type_hhi,
    "geo_hexbin": geo_hexbin,
    "doc_repetition": doc_repetition,
    "geo_rect_cover": geo_rect_cover,
    "doc_quality_buckets": doc_quality_buckets,
    "geo_nearest_admin": geo_nearest_admin,
    "events_interval_agg": events_interval_agg,
    "events_weighted_salted": events_weighted_salted,
    "geo_focal_mean": geo_focal_mean,
    "events_value_percentile": events_value_percentile,
    "doc_curated": doc_curated,
    "geo_pip_triangles": geo_pip_triangles,
    "pages_local_hour": pages_local_hour,
    "events_value_mad": events_value_mad,
    "doc_contamination": doc_contamination,
    "doc_ngram_novelty": doc_ngram_novelty,
    "doc_pii_scrub": doc_pii_scrub,
    "pages_domain_stats": pages_domain_stats,
    "doc_typo_pairs": doc_typo_pairs,
    "emb_triangles": emb_triangles,
    "emb_pagerank": emb_pagerank,
    "events_retention": events_retention,
    "doc_sample_weighted": doc_sample_weighted,
    "pages_s2_parents": pages_s2_parents,
    "pages_s2_compact": pages_s2_compact,
    "pages_mention_drift": pages_mention_drift,
    "doc_lang_confusion": doc_lang_confusion,
    "events_hourly_anomalies": events_hourly_anomalies,
    "doc_curated_v2": doc_curated_v2,
    "events_transitions": events_transitions,
    "events_hopping_users": events_hopping_users,
}

ORACLE_SQL = {
    "q1_pricing_summary": Q1_SQL,
    "q3_top_orders": Q3_SQL,
    "q5_region_revenue": Q5_SQL,
    "events_hourly": EVENTS_HOURLY_SQL,
    "events_top_users": EVENTS_TOP_USERS_SQL,
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    "doc_token_stats": DOC_TOKEN_STATS_SQL,
    "doc_lang_dist": DOC_LANG_DIST_SQL,
    "doc_exact_dedup": DOC_EXACT_DEDUP_SQL,
    "doc_quality": DOC_QUALITY_SQL,
    "emb_topk": EMB_TOPK_SQL,
    "emb_centroids": EMB_CENTROIDS_SQL,
    "geo_tile_counts": GEO_TILE_COUNTS_SQL,
    "geo_tile_regions": GEO_TILE_REGIONS_SQL,
    "geo_dbscan": GEO_DBSCAN_SQL,
    "pages_url_filter": PAGES_URL_FILTER_SQL,
    "geo_pip_admin": GEO_PIP_ADMIN_SQL,
    "geo_knn_tile": GEO_KNN_TILE_SQL,
    "doc_top20_by_chars": DOC_TOP20_SQL,
    "events_distinct_types": EVENTS_DISTINCT_SQL,
    "doc_sample_mod": DOC_SAMPLE_SQL,
    "events_asof_purchase": EVENTS_ASOF_SQL,
    "emb_near_dup_pairs": EMB_NEAR_DUP_SQL,
    "emb_silhouette": EMB_SILHOUETTE_SQL,
    "emb_dup_clusters": EMB_DUP_CLUSTERS_SQL,
    "doc_langid": DOC_LANGID_SQL,
    "doc_encrypt_roundtrip": DOC_ENCRYPT_SQL,
    "media_features": MEDIA_FEATURES_SQL,
    "pages_joined": PAGES_JOINED_SQL,
    "pages_tiles": PAGES_TILES_SQL,
    "pages_errors": PAGES_ERRORS_SQL,
    "pages_knn": PAGES_KNN_SQL,
    "pages_nested": PAGES_NESTED_SQL,
    "pages_nested2": PAGES_NESTED2_SQL,
    "pages_rules": PAGES_RULES_SQL,
    "media_thumbnails": MEDIA_THUMBNAILS_SQL,
    "media_frames": MEDIA_FRAMES_SQL,
    "events_rolling_max": EVENTS_ROLLING_MAX_SQL,
    "events_late_data": EVENTS_LATE_DATA_SQL,
    "events_window_join": EVENTS_WINDOW_JOIN_SQL,
    "doc_top2_per_lang": DOC_TOP2_PER_LANG_SQL,
    "doc_bm25_topk": DOC_BM25_TOPK_SQL,
    "events_value_quantiles": EVENTS_QUANTILES_SQL,
    "cust_no_orders": CUST_NO_ORDERS_SQL,
    "cust_orders_full_outer": CUST_ORDERS_FULL_OUTER_SQL,
    "doc_incremental_new": DOC_INCREMENTAL_NEW_SQL,
    "events_value_histogram": EVENTS_HISTOGRAM_SQL,
    "orders_cust_join": ORDERS_CUST_JOIN_SQL,
    "events_funnel": EVENTS_FUNNEL_SQL,
    "q10_returned_revenue": Q10_SQL,
    "doc_vocab_top20": DOC_VOCAB_SQL,
    "events_props_stats": EVENTS_PROPS_SQL,
    "events_hopping": EVENTS_HOPPING_SQL,
    "doc_sample_bottomk": DOC_SAMPLE_BOTTOMK_SQL,
    "media_phash_pairs": MEDIA_PHASH_SQL,
    "events_rollup": EVENTS_ROLLUP_SQL,
    # golden-parquet oracles (independent pure-Python implementations,
    # fixtures/docs_golden.py — the pages_*-style hard check for the
    # formerly rows-only sketch/ANN queries; VERDICT r2 item 1):
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "doc_minhash_pairs": DOC_MINHASH_PAIRS_SQL,
    "doc_dup_clusters": DOC_DUP_CLUSTERS_SQL,
    "doc_dup_geo_spread": DOC_DUP_GEO_SPREAD_SQL,
    "doc_dup_source_matrix": DOC_DUP_SOURCE_MATRIX_SQL,
    "doc_cross_lingual_dup": DOC_CROSS_LINGUAL_DUP_SQL,
    "doc_dedup_keep": DOC_DEDUP_KEEP_SQL,
    "doc_simhash_pairs": DOC_SIMHASH_PAIRS_SQL,
    "emb_ann_lsh": EMB_ANN_LSH_SQL,
    "emb_ann_ivf": EMB_ANN_IVF_SQL,
    "emb_kmeans": EMB_KMEANS_SQL,
    "geo_convex_hull": GEO_CONVEX_HULL_SQL,
    "q4_priority_semi": Q4_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q12_priority_class": Q12_SQL,
    "q13_cust_order_dist": Q13_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q16_supplier_cnt": Q16_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q18_heavy_orders": Q18_SQL,
    "q19_disjunctive_revenue": Q19_SQL,
    "q22_idle_balance": Q22_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q7_nation_volume": Q7_SQL,
    "q15_top_supplier": Q15_SQL,
    "events_lag_delta": EVENTS_LAG_DELTA_SQL,
    "events_user_rank": EVENTS_USER_RANK_SQL,
    "events_cumsum": EVENTS_CUMSUM_SQL,
    "events_pivot_hourly": EVENTS_PIVOT_SQL,
    "events_corr_moments": EVENTS_CORR_SQL,
    "region_nations_agg": REGION_NATIONS_SQL,
    "events_purchasers_except": EVENTS_EXCEPT_SQL,
    "doc_sample_stratified": DOC_SAMPLE_STRAT_SQL,
    "doc_tfidf_top3": DOC_TFIDF_SQL,
    "q8_market_share": Q8_SQL,
    "q9_profit_proxy": Q9_SQL,
    "q11_balance_concentration": Q11_SQL,
    "q20_excess_shippers": Q20_SQL,
    "q21_sole_supplier": Q21_SQL,
    "geo_zonal_stats": GEO_ZONAL_SQL,
    "geo_distance_pairs": GEO_DISTANCE_PAIRS_SQL,
    "geo_haversine_pairs": GEO_HAVERSINE_PAIRS_SQL,
    "geo_traj_stats": GEO_TRAJ_STATS_SQL,
    "geo_segment_crossings": GEO_SEGMENT_CROSSINGS_SQL,
    "geo_area_interp": GEO_AREA_INTERP_SQL,
    "events_geofence": EVENTS_GEOFENCE_SQL,
    "geo_kde_tiles": GEO_KDE_TILES_SQL,
    "events_contacts": EVENTS_CONTACTS_SQL,
    "events_stay_points": EVENTS_STAY_POINTS_SQL,
    "doc_shingle_containment": DOC_SHINGLE_CONTAINMENT_SQL,
    "geo_colocation": GEO_COLOCATION_SQL,
    "geo_bearing_rose": GEO_BEARING_ROSE_SQL,
    "geo_traj_simplify": GEO_TRAJ_SIMPLIFY_SQL,
    "events_od_matrix": EVENTS_OD_MATRIX_SQL,
    "doc_unigram_surprisal": DOC_UNIGRAM_SURPRISAL_SQL,
    "geo_moran_i": GEO_MORAN_I_SQL,
    "geo_getis_gi": GEO_GETIS_GI_SQL,
    "geo_knn_classify": GEO_KNN_CLASSIFY_SQL,
    "geo_morton_parts": GEO_MORTON_PARTS_SQL,
    "geo_idw_interp": GEO_IDW_INTERP_SQL,
    "geo_semivariogram": GEO_SEMIVARIOGRAM_SQL,
    "geo_stratified_sample": GEO_STRATIFIED_SAMPLE_SQL,
    "geo_nearest_facility": GEO_NEAREST_FACILITY_SQL,
    "events_speed_outliers": EVENTS_SPEED_OUTLIERS_SQL,
    "geo_map_match": GEO_MAP_MATCH_SQL,
    "doc_toponym_resolve": DOC_TOPONYM_RESOLVE_SQL,
    "geo_quadtree": GEO_QUADTREE_SQL,
    "geo_grid_bfs": GEO_GRID_BFS_SQL,
    "events_corridors": EVENTS_CORRIDORS_SQL,
    "doc_source_geo_entropy": DOC_SOURCE_GEO_ENTROPY_SQL,
    "events_tile_trend": EVENTS_TILE_TREND_SQL,
    "geo_doc_event_band": GEO_DOC_EVENT_BAND_SQL,
    "events_gyration": EVENTS_GYRATION_SQL,
    "doc_lang_dissimilarity": DOC_LANG_DISSIMILARITY_SQL,
    "events_user_entropy": EVENTS_USER_ENTROPY_SQL,
    "doc_geo_tfidf": DOC_GEO_TFIDF_SQL,
    "events_jump_lengths": EVENTS_JUMP_LENGTHS_SQL,
    "events_msd": EVENTS_MSD_SQL,
    "events_return_times": EVENTS_RETURN_TIMES_SQL,
    "geo_cell_turnover": GEO_CELL_TURNOVER_SQL,
    "events_flow_imbalance": EVENTS_FLOW_IMBALANCE_SQL,
    "geo_huff_share": GEO_HUFF_SHARE_SQL,
    "events_burstiness": EVENTS_BURSTINESS_SQL,
    "events_nearest_doc": EVENTS_NEAREST_DOC_SQL,
    "geo_isochrone": GEO_ISOCHRONE_SQL,
    "doc_zipf_fit": DOC_ZIPF_FIT_SQL,
    "events_sinuosity": EVENTS_SINUOSITY_SQL,
    "geo_lang_boundaries": GEO_LANG_BOUNDARIES_SQL,
    "events_cell_gini": EVENTS_CELL_GINI_SQL,
    "geo_theil_decomp": GEO_THEIL_DECOMP_SQL,
    "geo_pip_partitioned": GEO_PIP_PARTITIONED_SQL,
    "events_visit_ranks": EVENTS_VISIT_RANKS_SQL,
    "geo_region_mad": GEO_REGION_MAD_SQL,
    "events_peak_hour": EVENTS_PEAK_HOUR_SQL,
    "doc_toponym_cooccur": DOC_TOPONYM_COOCCUR_SQL,
    "geo_chars_dist_corr": GEO_CHARS_DIST_CORR_SQL,
    "events_mann_kendall": EVENTS_MANN_KENDALL_SQL,
    "events_sen_slope": EVENTS_SEN_SLOPE_SQL,
    "geo_join_counts": GEO_JOIN_COUNTS_SQL,
    "events_knox": EVENTS_KNOX_SQL,
    "events_type_region_chisq": EVENTS_TYPE_REGION_CHISQ_SQL,
    "doc_length_ks": DOC_LENGTH_KS_SQL,
    "doc_heaps_law": DOC_HEAPS_LAW_SQL,
    "events_benford": EVENTS_BENFORD_SQL,
    "doc_hemisphere_jsd": DOC_HEMISPHERE_JSD_SQL,
    "geo_lang_simpson": GEO_LANG_SIMPSON_SQL,
    "geo_lisa_quadrants": GEO_LISA_QUADRANTS_SQL,
    "events_circular_hours": EVENTS_CIRCULAR_HOURS_SQL,
    "events_contact_degrees": EVENTS_CONTACT_DEGREES_SQL,
    "geo_gravity_fit": GEO_GRAVITY_FIT_SQL,
    "events_daily_motifs": EVENTS_DAILY_MOTIFS_SQL,
    "geo_boxcount_dimension": GEO_BOXCOUNT_DIMENSION_SQL,
    "doc_hemisphere_rbo": DOC_HEMISPHERE_RBO_SQL,
    "events_diurnal_anova": EVENTS_DIURNAL_ANOVA_SQL,
    "doc_distance_decay": DOC_DISTANCE_DECAY_SQL,
    "events_markov_entropy": EVENTS_MARKOV_ENTROPY_SQL,
    "doc_lang_region_mi": DOC_LANG_REGION_MI_SQL,
    "doc_term_burstiness": DOC_TERM_BURSTINESS_SQL,
    "doc_pmi_collocations": DOC_PMI_COLLOCATIONS_SQL,
    "events_contact_assortativity": EVENTS_CONTACT_ASSORTATIVITY_SQL,
    "events_user_gini": EVENTS_USER_GINI_SQL,
    "doc_length_lognormal": DOC_LENGTH_LOGNORMAL_SQL,
    "events_hourly_acf": EVENTS_HOURLY_ACF_SQL,
    "geo_std_ellipse": GEO_STD_ELLIPSE_SQL,
    "geo_ripley_k": GEO_RIPLEY_K_SQL,
    "geo_cross_k": GEO_CROSS_K_SQL,
    "geo_quadrat_vmr": GEO_QUADRAT_VMR_SQL,
    "geo_clark_evans": GEO_CLARK_EVANS_SQL,
    "geo_bivariate_moran": GEO_BIVARIATE_MORAN_SQL,
    "events_st_dbscan": EVENTS_ST_DBSCAN_SQL,
    "events_st_getis": EVENTS_ST_GETIS_SQL,
    "events_emerging_hotspots": EVENTS_EMERGING_HOTSPOTS_SQL,
    "emb_ann_recall": EMB_ANN_RECALL_SQL,
    "events_traj_hausdorff": EVENTS_TRAJ_HAUSDORFF_SQL,
    "doc_dedup_method_overlap": DOC_DEDUP_METHOD_OVERLAP_SQL,
    "doc_curation_funnel": DOC_CURATION_FUNNEL_SQL,
    "geo_correlogram": GEO_CORRELOGRAM_SQL,
    "events_changepoint": EVENTS_CHANGEPOINT_SQL,
    "events_periodogram": EVENTS_PERIODOGRAM_SQL,
    "geo_geometric_median": GEO_GEOMETRIC_MEDIAN_SQL,
    "geo_rank_size": GEO_RANK_SIZE_SQL,
    "events_hill_tail": EVENTS_HILL_TAIL_SQL,
    "events_rfm_segments": EVENTS_RFM_SEGMENTS_SQL,
    "doc_readability": DOC_READABILITY_SQL,
    "geo_percolation": GEO_PERCOLATION_SQL,
    "events_audience_overlap": EVENTS_AUDIENCE_OVERLAP_SQL,
    "geo_median_radius": GEO_MEDIAN_RADIUS_SQL,
    "emb_pca_power": EMB_PCA_POWER_SQL,
    "geo_anisotropy": GEO_ANISOTROPY_SQL,
    "events_hurst": EVENTS_HURST_SQL,
    "geo_lacunarity": GEO_LACUNARITY_SQL,
    "geo_spatial_markov": GEO_SPATIAL_MARKOV_SQL,
    "events_dow_profile": EVENTS_DOW_PROFILE_SQL,
    "doc_fingerprint_bits": DOC_FINGERPRINT_BITS_SQL,
    "events_taylor_law": EVENTS_TAYLOR_LAW_SQL,
    "geo_center_drift": GEO_CENTER_DRIFT_SQL,
    "events_allan_variance": EVENTS_ALLAN_VARIANCE_SQL,
    "events_runs_test": EVENTS_RUNS_TEST_SQL,
    "events_turning_points": EVENTS_TURNING_POINTS_SQL,
    "events_haar_energy": EVENTS_HAAR_ENERGY_SQL,
    "events_mean_excess": EVENTS_MEAN_EXCESS_SQL,
    "doc_yule_k": DOC_YULE_K_SQL,
    "emb_hubness": EMB_HUBNESS_SQL,
    "geo_2sfca": GEO_2SFCA_SQL,
    "doc_span_dup_fraction": DOC_SPAN_DUP_FRACTION_SQL,
    "events_lorenz_deciles": EVENTS_LORENZ_DECILES_SQL,
    "doc_vocab_jaccard": DOC_VOCAB_JACCARD_SQL,
    "events_type_ccf": EVENTS_TYPE_CCF_SQL,
    "geo_type_hhi": GEO_TYPE_HHI_SQL,
    "geo_hexbin": GEO_HEXBIN_SQL,
    "doc_repetition": DOC_REPETITION_SQL,
    "geo_rect_cover": GEO_RECT_COVER_SQL,
    "doc_quality_buckets": DOC_QUALITY_BUCKETS_SQL,
    "geo_nearest_admin": GEO_NEAREST_ADMIN_SQL,
    "events_interval_agg": EVENTS_INTERVAL_AGG_SQL,
    "events_weighted_salted": EVENTS_WEIGHTED_SALTED_SQL,
    "geo_focal_mean": GEO_FOCAL_MEAN_SQL,
    "events_value_percentile": EVENTS_VALUE_PERCENTILE_SQL,
    "doc_curated": DOC_CURATED_SQL,
    "geo_pip_triangles": GEO_PIP_TRIANGLES_SQL,
    "pages_local_hour": PAGES_LOCAL_HOUR_SQL,
    "events_value_mad": EVENTS_VALUE_MAD_SQL,
    "doc_contamination": DOC_CONTAMINATION_SQL,
    "doc_ngram_novelty": DOC_NGRAM_NOVELTY_SQL,
    "doc_pii_scrub": DOC_PII_SCRUB_SQL,
    "pages_domain_stats": PAGES_DOMAIN_STATS_SQL,
    "doc_typo_pairs": DOC_TYPO_PAIRS_SQL,
    "emb_triangles": EMB_TRIANGLES_SQL,
    "emb_pagerank": EMB_PAGERANK_SQL,
    "events_retention": EVENTS_RETENTION_SQL,
    "doc_sample_weighted": DOC_SAMPLE_WEIGHTED_SQL,
    "pages_s2_parents": PAGES_S2_PARENTS_SQL,
    "pages_s2_compact": PAGES_S2_COMPACT_SQL,
    "pages_mention_drift": PAGES_MENTION_DRIFT_SQL,
    "doc_lang_confusion": DOC_LANG_CONFUSION_SQL,
    "events_hourly_anomalies": EVENTS_HOURLY_ANOMALIES_SQL,
    "doc_curated_v2": DOC_CURATED_V2_SQL,
    "events_transitions": EVENTS_TRANSITIONS_SQL,
    "events_hopping_users": EVENTS_HOPPING_USERS_SQL,
}
