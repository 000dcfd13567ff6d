"""Extract stage: html (binary) -> text (large_string), byte-identical per url.

The per-document deterministic transform — the analog of the reference's
tree-sitter parse stage (SURVEY.md §2.2 M10, strategies/shared/jstest/parser.go):
an actor-pool ``map_batches`` whose compiled state (regexes) is built once per
actor. The wide ``html`` column is DROPPED here (SURVEY.md §7.3: it dominates
block size and would wreck shuffle economics downstream).

Extraction spec (owned by this engine; the fixture generator produces html
whose expected extraction is stored in the pages.text column):
  text = "\n".join(html.unescape(p) for each <p>...</p> body, document order)
Oversized documents (> max_html_bytes) are NOT parsed — the MaxFileSize
analog (scanner.go:37-38, 478-489). They are retained as error-as-data rows
with ``text`` null; the geocode stage routes null-text rows to
``derivation_source='oversize'`` and the flagship errors side-channel emits
``(url, phase='extract', reason='max-html-bytes')`` for them.
"""

from __future__ import annotations

import html as _html
import re

import pyarrow as pa
import pyarrow.compute as pc

from core_ray.config import register_stage


@register_stage("extract")
class ExtractText:
    """Actor-pool batch UDF: (url, warc_ts, html, lang) -> (url, warc_ts, lang, text)."""

    def __init__(self, max_html_bytes: int = 10 * 1024 * 1024):
        self.p_re = re.compile(r"<p>(.*?)</p>", re.S)
        self.unescape = _html.unescape
        self.max_bytes = max_html_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        oversize = pc.greater(
            pc.binary_length(batch["html"]), self.max_bytes
        ).to_numpy(zero_copy_only=False)
        htmls = batch["html"].to_pylist()
        p_re, unescape = self.p_re, self.unescape
        # oversized html is never decoded/parsed (that's the point of the
        # cap); the row survives with text=null as an error-as-data marker
        texts = [
            None
            if oversize[i]
            else "\n".join(unescape(m) for m in p_re.findall(h.decode("utf-8")))
            for i, h in enumerate(htmls)
        ]
        return pa.table(
            {
                "url": batch["url"],
                "warc_ts": batch["warc_ts"],
                "lang": batch["lang"],
                "text": pa.array(texts, pa.large_string()),
            }
        )
