"""Isolate the minhash-signature kernel's 2->8 cpu scaling (VERDICT r3
item 5: r2 measured 0.86-0.95 efficiency, r3 measured 0.72 — bisect the r3
change, the text_md5 column added to the signature row).

Child mode runs ONE (variant, ncpu) measurement in a fresh process over the
page-cached deduped text of the 1M-page bench corpus; orchestrate mode runs
the matrix and prints an efficiency table.

    python scripts/sig_kernel_scaling.py                 # matrix
    python scripts/sig_kernel_scaling.py md5 2           # child
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

DATA = os.environ.get(
    "SIG_DATA_DIR", "/tmp/core_ray_ckpt_v4_1000000/deduped/data"
)
CPU_POINTS = (2, 8)
VARIANTS = ("md5", "nomd5", "md5only")


def _warm(files):
    for f in files:
        with open(f, "rb") as fh:
            while fh.read(1 << 22):
                pass


def child(variant: str, ncpu: int) -> None:
    import ray

    ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import hashlib

    import pyarrow as pa

    from core_ray.text.dedup import MinHashSigs, minhash_signature

    files = sorted(glob.glob(os.path.join(DATA, "*.parquet")))
    _warm(files)

    full = MinHashSigs(id_col="url", col="text")

    def nomd5(batch: pa.Table) -> pa.Table:
        # the r2 kernel shape: signatures only, no per-doc md5
        texts = batch["text"].to_pylist()
        sigs = [minhash_signature(t, 3).tobytes() for t in texts]
        return pa.table({"url": batch["url"], "sig": pa.array(sigs, pa.binary())})

    def md5only(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        md5s = [hashlib.md5(t.encode("utf-8")).digest() for t in texts]
        return pa.table({"url": batch["url"], "text_md5": pa.array(md5s, pa.binary(16))})

    fn = {"md5": full, "nomd5": nomd5, "md5only": md5only}[variant]
    docs = __import__("ray").data.read_parquet(
        DATA, columns=["url", "text"], override_num_blocks=256
    )
    t0 = time.perf_counter()
    n = docs.map_batches(fn, batch_format="pyarrow", batch_size=1024).count()
    wall = time.perf_counter() - t0
    ray.shutdown()
    print(json.dumps({"variant": variant, "num_cpus": ncpu,
                      "wall_s": round(wall, 2), "rows": n}))


def orchestrate() -> None:
    here = os.path.abspath(__file__)
    rows = {}
    for variant in ("md5", "nomd5", "md5only"):
        rows[variant] = {}
        for ncpu in CPU_POINTS:
            out = subprocess.run(
                [sys.executable, here, variant, str(ncpu)],
                capture_output=True, text=True, check=True,
                env={**os.environ, "PYTHONPATH": "/root/repo"},
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            rows[variant][ncpu] = r["wall_s"]
            print(r, flush=True)
    lo, hi = CPU_POINTS
    for variant, w in rows.items():
        eff = (w[lo] / w[hi]) / (hi / lo)
        print(f"{variant:8s} {lo}cpu={w[lo]:7.2f}s {hi}cpu={w[hi]:7.2f}s "
              f"eff({lo}->{hi})={eff:.2f}")


if __name__ == "__main__":
    if len(sys.argv) == 3:
        child(sys.argv[1], int(sys.argv[2]))
    else:
        orchestrate()
