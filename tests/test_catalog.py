"""Catalog merge / diff / classify tests (types/catalog.go semantics)."""

from __future__ import annotations

from olake_spark.plans.catalog import classify_streams, diff_catalogs, merge_catalogs


def _stream(name, ns="default", schema=None, modes=("full_refresh", "cdc")):
    return {
        "name": name,
        "namespace": ns,
        "type_schema": schema or {"fields": [{"name": "id", "type": "long"}]},
        "sync_modes": list(modes),
    }


def test_merge_keeps_user_edits_drops_vanished():
    old = {
        "streams": [_stream("a"), _stream("b")],
        "selected_streams": {
            "default.a": {"sync_mode": "cdc", "chunk_column": "id"},
            "default.b": {"sync_mode": "full_refresh"},
        },
    }
    new = {"streams": [_stream("a"), _stream("c")]}
    merged = merge_catalogs(old, new)
    assert {s["name"] for s in merged["streams"]} == {"a", "c"}
    # user metadata survives for 'a'; 'b' vanished from source → dropped;
    # 'c' is new → unselected
    assert merged["selected_streams"] == {
        "default.a": {"sync_mode": "cdc", "chunk_column": "id"}
    }


def test_diff_added_removed_changed():
    a = {"streams": [_stream("x"), _stream("y")]}
    b = {
        "streams": [
            _stream("y", schema={"fields": [{"name": "id", "type": "string"}]}),
            _stream("z"),
        ]
    }
    d = diff_catalogs(a, b)
    assert d == {
        "added": ["default.z"],
        "removed": ["default.x"],
        "schema_changed": ["default.y"],
    }


def test_classify_streams():
    cat = {
        "streams": [_stream("a"), _stream("b", modes=("full_refresh",))],
        "selected_streams": {
            "default.a": {"sync_mode": "cdc"},
            "default.b": {"sync_mode": "cdc"},  # cdc unsupported → full_load
            "default.ghost": {"sync_mode": "full_refresh"},
        },
    }
    c = classify_streams(cat)
    assert c["cdc"] == ["default.a"]
    assert c["full_load"] == ["default.b"]
    assert c["unknown"] == ["default.ghost"]
