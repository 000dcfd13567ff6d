"""Ingestion connectors (the Source-plugin surface, SURVEY.md §2.1/§2.10)."""

from core_ray.sources.base import (  # noqa: F401
    SOURCE_REGISTRY,
    Source,
    open_source,
    register_source,
)
from core_ray.sources import warc as _warc  # noqa: F401  (registers "warc")
from core_ray.sources import jsonl as _jsonl  # noqa: F401  (registers "jsonl")
