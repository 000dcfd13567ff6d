"""Fault injection: a worker crash mid-batch must be retried by Ray's
task-lineage machinery with EXACT output (the single-node analog of node
preemption on a multi-node cluster — the failure mode the checkpoint/resume
layer above this, tests/test_flagship.py, handles at stage granularity)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


def test_map_task_crash_is_retried_and_output_exact(ray_session, tmp_path):
    import ray.data

    marker = str(tmp_path / "crash_once")
    with open(marker, "w") as f:
        f.write("x")

    n = 10_000
    t = pa.table({"x": pa.array(range(n), pa.int64())})

    def flaky_double(b: pa.Table) -> pa.Table:
        try:
            os.unlink(marker)  # exactly one concurrent task wins the unlink
            os._exit(1)  # hard worker death, not a Python exception
        except FileNotFoundError:
            pass
        return b.set_column(0, "x", pc.multiply(b["x"], 2))

    ds = ray.data.from_arrow(t).repartition(8)
    out = ds.map_batches(flaky_double, batch_format="pyarrow").sum("x")
    # the crashed task re-ran from lineage; nothing lost, nothing doubled
    assert out == n * (n - 1)  # sum(range(n)) * 2
    assert not os.path.exists(marker)


def test_actor_pool_worker_death_recovers(ray_session, tmp_path):
    """Same contract through an ACTOR-pool stage (the stateful-stage shape
    every heavy pipeline step uses): one actor dies mid-batch, the pool
    replaces it, output is exact."""
    import ray.data

    marker = str(tmp_path / "actor_crash_once")
    with open(marker, "w") as f:
        f.write("x")

    n = 5_000
    t = pa.table({"x": pa.array(range(n), pa.int64())})

    class FlakyAdd:
        def __init__(self):
            self.offset = 7  # per-actor state built in __init__

        def __call__(self, b: pa.Table) -> pa.Table:
            try:
                os.unlink(marker)  # exactly one concurrent call wins
                os._exit(1)
            except FileNotFoundError:
                pass
            return b.set_column(0, "x", pc.add(b["x"], self.offset))

    ds = ray.data.from_arrow(t).repartition(8)
    out = ds.map_batches(
        FlakyAdd, batch_format="pyarrow", concurrency=2
    ).sum("x")
    assert out == n * (n - 1) // 2 + 7 * n
    assert not os.path.exists(marker)
