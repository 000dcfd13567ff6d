"""Geocode stage: the coordinate-derivation cascade (early-return).

The M3 analog (reference Detector.Detect, pkg/parser/detection/detector.go:42-79
— 4-stage early-return classification with the winning stage recorded in
ConfidenceDist):

  0. text null (extract skipped the page: oversize) -> one row with
     derivation_source='oversize' (error-as-data; routed to the errors
     side-channel as phase='extract' downstream)
  1. explicit coordinate mentions in text  -> one row PER MENTION
     (counting policy per SURVEY.md §7.3 / ADR-02 analog)
  2. host geo-IP via a broadcast lookup table -> exactly one row
  3. no signal -> one row with derivation_source='none' (error-as-data;
     routed to the side-channel table downstream, scanner.go:81-100 analog)

The geo-IP table is the broadcast small side (ST4/J1 pattern): ``ray.put``
once on the driver, ``ray.get`` once per actor in __init__.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from core_ray.config import register_stage
from core_ray.geo.coords import MENTION_RE, extract_mentions


def host_of(url: str) -> str:
    """scheme://host/... -> host (cheap, no urlparse allocation per row)."""
    start = url.find("//")
    start = start + 2 if start >= 0 else 0
    end = url.find("/", start)
    return url[start:] if end < 0 else url[start:end]


@register_stage("geocode")
class Geocoder:
    """Actor-pool batch UDF: explodes pages into geocoded rows.

    Output: (url, warc_ts, lang, text, derivation_source, mention_idx, lat, lon)
    — lat/lon are null for 'none' rows.
    """

    def __init__(self, geoip_ref):
        # broadcast small side, fetched once per actor (zero per-batch cost).
        # Ray auto-resolves ObjectRefs passed in fn_constructor_args, so this
        # is usually already the value; accept a raw ref too for direct use.
        import ray

        if isinstance(geoip_ref, ray.ObjectRef):
            geoip_ref = ray.get(geoip_ref)
        self.geoip: dict[str, tuple[float, float]] = geoip_ref
        self.mention_re = MENTION_RE  # compiled at import; pinned per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        texts = batch["text"].to_pylist()
        idx, srcs, midx, lats, lons = [], [], [], [], []
        geoip = self.geoip
        for i, (u, t) in enumerate(zip(urls, texts)):
            if t is None:  # extract skipped this page (oversize)
                idx.append(i)
                srcs.append("oversize")
                midx.append(0)
                lats.append(None)
                lons.append(None)
                continue
            mentions = extract_mentions(t)
            if mentions:
                for j, (la, lo) in enumerate(mentions):
                    idx.append(i)
                    srcs.append("text-mention")
                    midx.append(j)
                    lats.append(la)
                    lons.append(lo)
            else:
                hit = geoip.get(host_of(u))
                idx.append(i)
                midx.append(0)
                if hit is not None:
                    srcs.append("host-geoip")
                    lats.append(hit[0])
                    lons.append(hit[1])
                else:
                    srcs.append("none")
                    lats.append(None)
                    lons.append(None)
        take = pa.array(np.asarray(idx, dtype=np.int64))
        out = batch.take(take)
        return out.append_column(
            "derivation_source", pa.array(srcs, pa.string())
        ).append_column(
            "mention_idx", pa.array(midx, pa.int32())
        ).append_column(
            "lat", pa.array(lats, pa.float64())
        ).append_column(
            "lon", pa.array(lons, pa.float64())
        )
