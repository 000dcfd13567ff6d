"""Arrow IPC connector + sink units: pages roundtrip through write_ipc ->
ingest_ipc byte-identically, text-only tables normalize through the shared
inverse-extract so the flagship extract stage reproduces the text, and a
table with neither html nor text fails loud."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _ipc_bytes(t: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_file(sink, t.schema) as w:
        w.write_table(t)
    return sink.getvalue().to_pybytes()


def test_ipc_pages_roundtrip(ray_session, tmp_path):
    import ray.data

    from core_ray.sources.ipc import ingest_ipc, write_ipc

    pages = pa.table(
        {
            "url": ["https://a/1", "https://a/2", "https://b/3"],
            "warc_ts": pa.array(
                [np.datetime64("2024-03-01T10:00:00", "us")] * 3,
                pa.timestamp("us"),
            ),
            "html": [b"<p>one</p>", b"<p>two &amp; half</p>", b"<p>three</p>"],
            "lang": ["en", "de", "fr"],
        }
    )
    sink_dir = tmp_path / "ipc_out"
    n = write_ipc(ray.data.from_arrow(pages), str(sink_dir))
    assert n == 3
    files = sorted(sink_dir.glob("part-*.arrow"))
    assert files, "sink must write .arrow parts"
    # the sink is content-addressed: a re-run rewrites, never duplicates
    n2 = write_ipc(ray.data.from_arrow(pages), str(sink_dir), overwrite=True)
    assert n2 == 3 and sorted(sink_dir.glob("part-*.arrow")) == files

    out = tmp_path / "pages"
    n3 = ingest_ipc(str(sink_dir), str(out))
    assert n3 == 3
    got = pq.read_table(sorted(out.glob("*.parquet"))[0]).sort_by("url")
    assert got["url"].to_pylist() == pages["url"].to_pylist()
    assert got["html"].to_pylist() == pages["html"].to_pylist()  # bytes ==
    assert got["lang"].to_pylist() == pages["lang"].to_pylist()
    assert [x.isoformat() for x in got["warc_ts"].to_pylist()] == [
        "2024-03-01T10:00:00"
    ] * 3


def test_ipc_text_table_extract_roundtrip(ray_session, tmp_path):
    from core_ray.sources import open_source
    from core_ray.stages.extract import ExtractText

    t = pa.table(
        {
            "id": ["d1", "d2"],
            "timestamp": [1700000000, 1700000001],
            "text": ["First & <second>\nline two", "plain body"],
            "language": ["de", None],
        }
    )
    (tmp_path / "corpus.arrow").write_bytes(_ipc_bytes(t))
    with open_source("ipc", str(tmp_path)) as src:
        assert src.n_pages == 2
        assert src.describe()["type"] == "ipc"
        pages = pq.read_table(src.pages()[0])
        rows = dict(zip(pages["url"].to_pylist(), pages["lang"].to_pylist()))
        assert rows == {"d1": "de", "d2": "en"}
        got = ExtractText()(pages)
        texts = dict(zip(got["url"].to_pylist(), got["text"].to_pylist()))
        # the core contract: byte-identical text through extract
        assert texts["d1"] == "First & <second>\nline two"
        assert texts["d2"] == "plain body"


def test_ipc_no_payload_fails_loud(ray_session, tmp_path):
    from core_ray.sources.ipc import ingest_ipc

    t = pa.table({"url": ["https://x/1"], "n": [1]})
    (tmp_path / "bad.feather").write_bytes(_ipc_bytes(t))
    with pytest.raises(Exception, match="neither"):
        ingest_ipc(str(tmp_path), str(tmp_path / "pages"))
