"""Derivation-rule registry: priority classes, per-language candidates,
cascade routing (the reference's registry/detect semantics,
pkg/parser/framework/registry.go:68-96 + detector.go:42-79)."""

from __future__ import annotations

import pyarrow as pa

from core_ray.registry import (
    DEFAULT_REGISTRY,
    PRIORITY_E2E,
    PRIORITY_GENERIC,
    PRIORITY_SPECIALIZED,
    DerivationRule,
    default_registry,
)
from core_ray.stages.geocode import Geocoder

GEOIP = {"known.example.com": (10.0, 20.0)}


def _batch(rows):
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def _sources(out: pa.Table) -> list[str]:
    return out["derivation_source"].to_pylist()


def test_candidates_priority_order_and_name_ties():
    reg = default_registry()
    reg.register(DerivationRule("zz-e2e", PRIORITY_E2E, lambda u, t, s: [None] * len(u)))
    reg.register(DerivationRule("aa-e2e", PRIORITY_E2E, lambda u, t, s: [None] * len(u)))
    names = [r.name for r in reg.candidates("en")]
    assert names == ["text-mention", "aa-e2e", "zz-e2e", "host-geoip"]


def test_lookup_by_name_and_replace():
    reg = default_registry()
    assert reg.get("host-geoip").priority == PRIORITY_GENERIC
    reg.register(DerivationRule("host-geoip", PRIORITY_E2E, lambda u, t, s: [None] * len(u)))
    assert reg.get("host-geoip").priority == PRIORITY_E2E  # latest wins


def test_default_cascade_unchanged():
    g = Geocoder(GEOIP)  # default registry
    out = g(
        _batch(
            [
                ("https://known.example.com/a", "no coords here", "en"),
                ("https://x.com/b", "point at 12.345, -33.251 ok", "en"),
                ("https://x.com/c", "nothing", "en"),
            ]
        )
    )
    assert _sources(out) == ["host-geoip", "text-mention", "none"]


def test_specialized_user_rule_beats_generic_on_same_document():
    # the reference's registration test shape: a user-registered Specialized
    # matcher outranks the built-in Generic one on a doc BOTH could match
    reg = default_registry()

    def url_rule(urls, texts, state):
        return [[(1.0, 2.0)] if "/geo/" in u else None for u in urls]

    reg.register(DerivationRule("url-pattern", PRIORITY_SPECIALIZED, url_rule))
    g = Geocoder(GEOIP, registry=reg)
    out = g(
        _batch(
            [
                # host-geoip would match, but the Specialized rule wins
                ("https://known.example.com/geo/x", "no coords", "en"),
                # Specialized rule doesn't match -> Generic still applies
                ("https://known.example.com/other", "no coords", "en"),
            ]
        )
    )
    assert _sources(out) == ["url-pattern", "host-geoip"]
    assert out["lat"].to_pylist()[0] == 1.0


def test_e2e_priority_slots_between_specialized_and_generic():
    reg = default_registry()
    reg.register(
        DerivationRule(
            "campaign", PRIORITY_E2E, lambda u, t, s: [[(5.0, 6.0)]] * len(u)
        )
    )
    g = Geocoder(GEOIP, registry=reg)
    out = g(
        _batch(
            [
                ("https://x.com/a", "at 12.345, -33.251", "en"),  # mention still wins
                ("https://known.example.com/b", "none here", "en"),  # E2E beats geoip
            ]
        )
    )
    assert _sources(out) == ["text-mention", "campaign"]


def test_language_subsetting():
    reg = default_registry()
    reg.register(
        DerivationRule(
            "de-only",
            PRIORITY_SPECIALIZED,
            lambda u, t, s: [[(50.0, 8.0)]] * len(u),
            langs=frozenset({"de"}),
        )
    )
    g = Geocoder(GEOIP, registry=reg)
    out = g(
        _batch(
            [
                ("https://known.example.com/a", "kein text", "de"),
                ("https://known.example.com/b", "no text", "en"),
            ]
        )
    )
    assert _sources(out) == ["de-only", "host-geoip"]


def test_counting_policy_multi_match_rule():
    # a rule returning N coordinate pairs emits N rows (mention_idx 0..N-1)
    reg = default_registry()
    reg.register(
        DerivationRule(
            "multi", PRIORITY_SPECIALIZED, lambda u, t, s: [[(1.0, 1.0), (2.0, 2.0)]] * len(u)
        )
    )
    g = Geocoder(GEOIP, registry=reg)
    out = g(_batch([("https://x.com/a", "whatever", "en")]))
    assert _sources(out) == ["multi", "multi"]
    assert out["mention_idx"].to_pylist() == [0, 1]


def test_oversize_bypasses_cascade():
    g = Geocoder(GEOIP)
    b = pa.table(
        {
            "url": pa.array(["https://known.example.com/a"], pa.string()),
            "text": pa.array([None], pa.string()),
            "lang": pa.array(["en"], pa.string()),
        }
    )
    assert _sources(g(b)) == ["oversize"]


def test_default_registry_is_shared_copy_isolates():
    reg = DEFAULT_REGISTRY.copy()
    reg.register(DerivationRule("x", PRIORITY_E2E, lambda u, t, s: [None] * len(u)))
    assert DEFAULT_REGISTRY.get("x") is None and reg.get("x") is not None


def test_custom_registry_through_actor_pool(ray_session):
    # a user registry must survive cloudpickle into map_batches actors
    import ray

    reg = default_registry()

    def url_rule(urls, texts, state):
        return [[(1.0, 2.0)] if "/geo/" in u else None for u in urls]

    reg.register(DerivationRule("url-pattern", PRIORITY_SPECIALIZED, url_rule))
    b = _batch(
        [
            ("https://known.example.com/geo/x", "no coords", "en"),
            ("https://known.example.com/other", "no coords", "en"),
        ]
    )
    out = (
        ray.data.from_arrow(b)
        .map_batches(
            Geocoder,
            fn_constructor_args=(GEOIP,),
            fn_constructor_kwargs={"registry": reg},
            batch_format="pyarrow",
            concurrency=1,
        )
        .take_all()
    )
    assert sorted(r["derivation_source"] for r in out) == ["host-geoip", "url-pattern"]
