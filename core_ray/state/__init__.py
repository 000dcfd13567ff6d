"""Checkpoint + per-partition lineage (resumable batch execution)."""
