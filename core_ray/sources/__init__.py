"""Ingestion connectors (the Source-plugin surface, SURVEY.md §2.1/§2.10)."""
