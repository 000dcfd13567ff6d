"""Doublestar include/exclude path filtering (VERDICT r3 item 7).

The reference pipeline takes WithPatterns / WithExcludePatterns options and
matches candidate files with doublestar semantics during the discovery walk
(pkg/parser/options.go:42-100, scanner.go:954-971). This is the engine's
analog, applied where discovery happens here: the SOURCE LISTING — the
parquet shard list every pipeline starts from.

Semantics (the published doublestar / gitignore contract, implemented from
the spec — no library in this container):

  *        any run of non-separator characters (may be empty)
  ?        exactly one non-separator character
  [...]    character class within one segment ([!...] negated)
  **       zero or more whole path segments
  {a,b}    alternation (nestable)

Patterns match the path RELATIVE to the source root, never the absolute
path. Selection rule mirrors the reference: a file is kept iff it matches
at least one include pattern (no include patterns = include everything)
and matches no exclude pattern.

Matching is segment-recursive driver-side Python over the FILE LIST (a few
thousand entries at 100 TB — never row data), so per-path recursion is
deliberate, not a hot-path loop.
"""

from __future__ import annotations

import fnmatch
import os


def expand_braces(pattern: str) -> list[str]:
    """{a,b{c,d}} -> [a, bc, bd]; no braces -> [pattern]."""
    start = pattern.find("{")
    if start == -1:
        return [pattern]
    depth = 0
    for i in range(start, len(pattern)):
        if pattern[i] == "{":
            depth += 1
        elif pattern[i] == "}":
            depth -= 1
            if depth == 0:
                end = i
                break
    else:
        return [pattern]  # unbalanced: treat literally
    head, body, tail = pattern[:start], pattern[start + 1:end], pattern[end + 1:]
    alts, depth, cur = [], 0, []
    for ch in body:
        if ch == "{":
            depth += 1
        elif ch == "}":
            depth -= 1
        if ch == "," and depth == 0:
            alts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    alts.append("".join(cur))
    out = []
    for a in alts:
        for mid in expand_braces(a):
            out.extend(expand_braces(head + mid + tail))
    return out


def _match_segs(pat: list[str], path: list[str]) -> bool:
    if not pat:
        return not path
    head, rest = pat[0], pat[1:]
    if head == "**":
        if _match_segs(rest, path):  # ** consumes zero segments
            return True
        return bool(path) and _match_segs(pat, path[1:])
    if not path:
        return False
    return fnmatch.fnmatchcase(path[0], head) and _match_segs(rest, path[1:])


def match_doublestar(pattern: str, relpath: str) -> bool:
    """Does ``relpath`` (separator-normalized, relative) match ``pattern``?"""
    path_segs = [s for s in relpath.replace(os.sep, "/").split("/") if s]
    for p in expand_braces(pattern):
        if _match_segs([s for s in p.split("/") if s], path_segs):
            return True
    return False


def filter_paths(files: list[str], include: tuple[str, ...] | None = None,
                 exclude: tuple[str, ...] = (), root: str | None = None) -> list[str]:
    """Apply include/exclude doublestar patterns to ``files``. ``root``
    defaults to the files' common directory; each file is matched by its
    path relative to it."""
    if not files or (not include and not exclude):
        return list(files)
    # realpath both sides: a symlink component in root (or in the listed
    # paths, which sources resolve) would otherwise push '../' into every
    # relpath and silently match nothing
    real = [os.path.realpath(f) for f in files]
    if root is None:
        root = os.path.commonpath([os.path.dirname(f) for f in real])
    else:
        root = os.path.realpath(root)
    out = []
    for f, rf in zip(files, real):
        rel = os.path.relpath(rf, root)
        if include and not any(match_doublestar(p, rel) for p in include):
            continue
        if any(match_doublestar(p, rel) for p in exclude):
            continue
        out.append(f)
    return out
