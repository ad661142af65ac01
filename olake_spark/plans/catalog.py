"""Stream catalog: merge-with-user-edits and difference.

Driver-side set algebra over stream catalogs, mirroring the
reference's catalog protocol:

- ``merge_catalogs``: re-discovery output merged with the previous
  catalog so user selections/metadata survive a re-discover
  (types/catalog.go:80-138) — source wins on schema, user wins on
  selection metadata.
- ``diff_catalogs``: ``discover --difference`` (protocol/discover.go:
  77-93, types/catalog.go:180-274): added / removed / schema-changed
  streams between two catalogs.
- ``classify_streams``: selected ∩ source-valid split into
  full-load / incremental / cdc buckets (protocol/sync.go:145-221).

A catalog here is the JSON shape cli.cmd_discover emits:
``{"streams": [{"name", "namespace", "type_schema", ...}]}`` plus an
optional ``"selected_streams"`` map of per-stream user metadata
(chunk_column, partition_regex, append_mode, normalization, filter —
types/catalog.go:40-47).
"""

from __future__ import annotations

import json
from typing import Any

Catalog = dict[str, Any]


def _key(s: dict) -> tuple[str, str]:
    return (s.get("namespace", "default"), s["name"])


def _by_key(cat: Catalog) -> dict[tuple[str, str], dict]:
    return {_key(s): s for s in cat.get("streams", [])}


def merge_catalogs(old: Catalog, new: Catalog) -> Catalog:
    """New discovery wins on schema/stats; old wins on user metadata.

    Streams gone from the source are dropped; brand-new streams appear
    unselected (the user opts in), matching the reference's
    keep-user-edits merge (types/catalog.go:80-138)."""
    old_sel = old.get("selected_streams", {})
    new_keys = {_key(s) for s in new.get("streams", [])}
    merged_sel = {
        sid: meta
        for sid, meta in old_sel.items()
        if tuple(sid.split(".", 1)) in new_keys or sid in {
            f"{ns}.{nm}" for ns, nm in new_keys
        }
    }
    return {"streams": list(new.get("streams", [])), "selected_streams": merged_sel}


def diff_catalogs(a: Catalog, b: Catalog) -> dict:
    """EXCEPT-style difference a→b: added, removed, schema_changed."""
    am, bm = _by_key(a), _by_key(b)
    added = sorted(".".join(k) for k in bm.keys() - am.keys())
    removed = sorted(".".join(k) for k in am.keys() - bm.keys())
    changed = []
    for k in sorted(am.keys() & bm.keys()):
        sa = json.dumps(am[k].get("type_schema"), sort_keys=True)
        sb = json.dumps(bm[k].get("type_schema"), sort_keys=True)
        if sa != sb:
            changed.append(".".join(k))
    return {"added": added, "removed": removed, "schema_changed": changed}


def classify_streams(catalog: Catalog) -> dict:
    """selected ∩ source-valid → full_load / incremental / cdc buckets
    (protocol/sync.go:145-221). Selection metadata's sync_mode decides;
    unknown streams in the selection are reported, not silently run."""
    by = _by_key(catalog)
    out = {"full_load": [], "incremental": [], "cdc": [], "unknown": []}
    for sid, meta in catalog.get("selected_streams", {}).items():
        ns, _, nm = sid.partition(".")
        s = by.get((ns, nm))
        if s is None:
            out["unknown"].append(sid)
            continue
        mode = meta.get("sync_mode", "full_refresh")
        if mode == "cdc" and "cdc" in s.get("sync_modes", []):
            out["cdc"].append(sid)
        elif mode == "incremental":
            out["incremental"].append(sid)
        else:
            out["full_load"].append(sid)
    return out
