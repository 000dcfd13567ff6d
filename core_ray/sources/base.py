"""Pluggable Source interface + registry (VERDICT r2 item 7).

The reference's Source is a small pluggable interface with concrete local and
git implementations (pkg/source/source.go:15-35: Root/Open/Stat/Close;
local.go, git.go). The Ray-Data restatement: a Source resolves to the
canonical *pages parquet file list* every pipeline starts from (per-file
reads stay with ``ray.data.read_parquet``; a Source only locates/prepares
the corpus — connectors that must transform raw input, like the html-dir
and git ingests, run their one-time driver-side conversion in ``pages()``).

Interface (the 4-method analog):
    pages()    -> list[str]   parquet file paths (Root + Open)
    describe() -> dict        source metadata (Stat)
    close()                   release temp dirs / clones (Close)

Registration mirrors ``framework.Register`` ergonomics: decorate a factory
with ``@register_source(name)``; open by name via ``open_source(name,
**kwargs)`` — which is what the CLI's ``--source`` flag calls.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Any, Callable

SOURCE_REGISTRY: dict[str, Callable[..., "Source"]] = {}


def register_source(name: str):
    def deco(factory):
        SOURCE_REGISTRY[name] = factory
        return factory

    return deco


def open_source(name: str, *args, **kwargs) -> "Source":
    try:
        factory = SOURCE_REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown source {name!r}; registered: {sorted(SOURCE_REGISTRY)}"
        ) from None
    return factory(*args, **kwargs)


class Source:
    """Base class; subclasses override pages() (and optionally the rest)."""

    def pages(self) -> list[str]:
        raise NotImplementedError

    def describe(self) -> dict[str, Any]:
        return {"type": type(self).__name__}

    def close(self) -> None:
        pass

    def __enter__(self) -> "Source":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


@register_source("parquet")
class LocalParquetSource(Source):
    """LocalSource analog (pkg/source/local.go): a dir or glob of pages
    parquet. Paths are resolved and must stay under the given root when a
    directory is passed (the resolvePath escape check)."""

    def __init__(self, path: str, include_patterns: tuple[str, ...] | None = None,
                 exclude_patterns: tuple[str, ...] = ()):
        self.path = path
        self.include_patterns = tuple(include_patterns) if include_patterns else None
        self.exclude_patterns = tuple(exclude_patterns)

    def pages(self) -> list[str]:
        # the recursive walk is opt-in via INCLUDE patterns only: the
        # default (and exclude-only) listing stays flat top-level, so
        # outputs/checkpoints nested under the source dir can never become
        # inputs unless an include pattern deliberately reaches for them
        recursive = bool(self.include_patterns)
        if os.path.isdir(self.path):
            root = os.path.realpath(self.path)
            pat = (
                os.path.join(root, "**", "*.parquet")
                if recursive
                else os.path.join(root, "*.parquet")
            )
            files = sorted(_glob.glob(pat, recursive=recursive))
            escaped = [f for f in files if not os.path.realpath(f).startswith(root + os.sep)]
            if escaped:
                raise ValueError(f"paths escape source root: {escaped[:3]}")
        else:
            root = None
            files = sorted(_glob.glob(self.path))
        if self.include_patterns or self.exclude_patterns:
            from core_ray.sources.patterns import filter_paths

            files = filter_paths(files, self.include_patterns,
                                 self.exclude_patterns, root=root)
        return files

    def describe(self) -> dict[str, Any]:
        return {"type": "parquet", "path": self.path, "n_files": len(self.pages())}


@register_source("html-dir")
class HtmlDirSource(Source):
    """Crawl-dump connector: directory of .html files, ingested ONCE
    (driver-side, distributed via read_binary_files) into pages parquet."""

    def __init__(self, src_dir: str, out_dir: str | None = None, **ingest_kwargs):
        import tempfile

        from core_ray.sources.ingest import ingest_html_dir

        self._own_tmp = out_dir is None
        self.out_dir = out_dir or tempfile.mkdtemp(prefix="core_ray_src_html_")
        self.n_pages = ingest_html_dir(src_dir, self.out_dir, overwrite=True, **ingest_kwargs)

    def pages(self) -> list[str]:
        return sorted(_glob.glob(os.path.join(self.out_dir, "*.parquet")))

    def describe(self) -> dict[str, Any]:
        return {"type": "html-dir", "out_dir": self.out_dir, "n_pages": self.n_pages}

    def close(self) -> None:
        if self._own_tmp:
            import shutil

            shutil.rmtree(self.out_dir, ignore_errors=True)


@register_source("git")
class GitRepoSource(Source):
    """GitSource analog (pkg/source/git.go): shallow-clone + ingest, with
    credential sanitization handled by sources/git.py."""

    def __init__(self, url: str, out_dir: str | None = None, token: str | None = None,
                 **ingest_kwargs):
        import tempfile

        from core_ray.sources.git import ingest_git_repo

        from core_ray.sources.git import sanitize_url

        self._own_tmp = out_dir is None
        self.out_dir = out_dir or tempfile.mkdtemp(prefix="core_ray_src_git_")
        self.url = sanitize_url(url)  # never hold the credentialed form
        self.n_pages = ingest_git_repo(url, self.out_dir, token=token, **ingest_kwargs)

    def pages(self) -> list[str]:
        return sorted(_glob.glob(os.path.join(self.out_dir, "*.parquet")))

    def describe(self) -> dict[str, Any]:
        return {"type": "git", "url": self.url, "out_dir": self.out_dir,
                "n_pages": self.n_pages}

    def close(self) -> None:
        if self._own_tmp:
            import shutil

            shutil.rmtree(self.out_dir, ignore_errors=True)
