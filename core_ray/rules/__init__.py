"""Derivation-rule catalog (the 22-strategy breadth analog, SURVEY.md §2.9)."""

from core_ray.rules.catalog import CATALOG_RULES, full_registry  # noqa: F401
