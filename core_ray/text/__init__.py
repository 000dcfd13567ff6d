"""Web-text training-data operators: analysis, dedup, similarity.

These are first-class components of the engine (per the build brief): each has
a Ray Data implementation over the ``documents`` / ``embeddings`` tables, a
``queries()`` entry in __ray_entry__.py, and where SQL-expressible a DuckDB
oracle. Kernels are pure functions (unit-testable without Ray); Ray wrappers
are thin map_batches / groupby compositions.
"""
