"""GitSource analog (reference pkg/source/git.go:51-160): shallow-clone a
repository, then expose its working tree to the html-dir ingestion connector
(sources/ingest.py) so downstream pipelines start from pages parquet.

Credential discipline mirrors the reference: an access token may be injected
into the clone URL for the fetch ONLY, and never surfaces afterwards — every
URL string this module emits (metadata base_url, error messages, logs) goes
through ``sanitize_url``; raised errors additionally have the raw token
redacted. No network exists in the test sandbox, so tests clone ``file://``
URLs — the code path is identical for https remotes.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess
import tempfile

_USERINFO_RE = re.compile(r"//[^/@]*@")


def sanitize_url(url: str) -> str:
    """Strip userinfo (user / user:token) from a URL: the only form of the
    URL that may appear in metadata, logs, or errors."""
    return _USERINFO_RE.sub("//", url)


_LEADING_USERINFO_RE = re.compile(r"^[^/@]*@")


def inject_token(url: str, token: str) -> str:
    """https://host/... -> https://<token>@host/... (clone-time only).
    Existing userinfo in the URL is REPLACED, never concatenated."""
    if "://" not in url:
        raise ValueError("token injection needs a scheme:// URL")
    scheme, rest = url.split("://", 1)
    return f"{scheme}://{token}@{_LEADING_USERINFO_RE.sub('', rest)}"


def shallow_clone(url: str, dest: str | None = None, token: str | None = None,
                  depth: int = 1, timeout_s: float = 300.0) -> str:
    """``git clone --depth N --single-branch`` into ``dest`` (a fresh temp
    dir by default). Returns the working-tree path. Errors are raised with
    the URL sanitized and the token redacted."""
    dest = dest or tempfile.mkdtemp(prefix="core_ray_git_")
    clone_url = inject_token(url, token) if token else url
    cmd = ["git", "clone", "--quiet", "--depth", str(depth), "--single-branch",
           clone_url, dest]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout_s,
            env=dict(os.environ, GIT_TERMINAL_PROMPT="0"),
        )
    except subprocess.TimeoutExpired as e:
        raise RuntimeError(f"git clone timed out after {timeout_s}s: {sanitize_url(url)}") from e
    if proc.returncode != 0:
        msg = (proc.stderr or "").strip()
        if token:
            msg = msg.replace(token, "***")
        msg = sanitize_url(msg)
        raise RuntimeError(f"git clone failed for {sanitize_url(url)}: {msg}")
    return dest


def ingest_git_repo(url: str, out_dir: str, token: str | None = None,
                    base_url: str | None = None, depth: int = 1,
                    default_lang: str = "en",
                    warc_ts: str = "2025-01-01T00:00:00") -> int:
    """Shallow-clone ``url`` and ingest every *.html in the tree into
    pages-schema parquet at ``out_dir`` (the GitSource -> LocalSource
    composition, git.go:51-160 + source.go:15-35). Returns pages written.
    The clone is deleted afterwards; the emitted page urls are rooted at
    the SANITIZED repo URL."""
    from core_ray.sources.ingest import ingest_html_dir

    tree = shallow_clone(url, token=token, depth=depth)
    try:
        base = base_url or sanitize_url(url).rstrip("/")
        return ingest_html_dir(
            tree, out_dir, base_url=base, default_lang=default_lang, warc_ts=warc_ts
        )
    finally:
        shutil.rmtree(tree, ignore_errors=True)
