"""ES ``_aliases`` — named index aliases with atomic multi-action swaps.

The reference's blue/green rebuild swaps an alias from the old index to the
new one in a single call (IndexerMetadataServiceImpl.java — create new,
reindex, swap alias, drop old; the per-root ``CURRENT`` pointer in
``catalog.py`` is the GENERATION-level analog). This module is the
INDEX-level analog: many named aliases over many index roots, updated
atomically as one action list, exactly the ES ``POST _aliases {actions}``
contract the reference's operators use.

Layout: one registry file ``_aliases.json`` inside a caller-chosen cluster
dir (the directory that holds the index roots). All updates are
write-then-rename — readers see the old or the new alias table, never a
torn one; a multi-action swap (remove a→old, add a→new) is therefore atomic
the same way ES's cluster-state update is.

An alias may point at several indices (legal to SEARCH — ES fans the query
out; joining result frames is the caller's union) but a WRITE through such
an alias is ambiguous and raises, matching ES's write-alias rule (one index
per alias unless ``is_write_index`` is set — supported).
"""

from __future__ import annotations

import json
import os
import tempfile


def _path(cluster_dir: str) -> str:
    return os.path.join(cluster_dir, "_aliases.json")


def _load(cluster_dir: str) -> dict:
    """{alias: [{"index": ..., "is_write_index": bool}, ...]}"""
    p = _path(cluster_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def _store(cluster_dir: str, table: dict) -> None:
    os.makedirs(cluster_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=cluster_dir, prefix="._aliases.")
    with os.fdopen(fd, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)
    os.replace(tmp, _path(cluster_dir))


def update_aliases(cluster_dir: str, actions: list[dict]) -> dict:
    """Apply an ES ``_aliases`` action list ATOMICALLY (all-or-nothing: any
    invalid action aborts the whole batch before the single registry write).

    Actions: ``{"add": {"index": ..., "alias": ..., "is_write_index":
    bool?}}`` / ``{"remove": {"index": ..., "alias": ...}}`` /
    ``{"remove_index": {"index": ...}}`` (drops every alias entry pointing
    at the index — the alias-table half of ES's remove_index; deleting the
    data is ``catalog.delete_index``, kept separate on purpose).
    Returns the new alias table."""
    table = _load(cluster_dir)
    for action in actions:
        if not isinstance(action, dict) or len(action) != 1:
            raise ValueError(f"each action is a single-key object, got {action!r}")
        op, spec = next(iter(action.items()))
        if op == "add":
            alias, index = str(spec["alias"]), str(spec["index"])
            entries = [e for e in table.get(alias, []) if e["index"] != index]
            entries.append({
                "index": index,
                "is_write_index": bool(spec.get("is_write_index", False)),
            })
            n_write = sum(1 for e in entries if e["is_write_index"])
            if n_write > 1:
                raise ValueError(
                    f"alias {alias!r} would have {n_write} write indices"
                )
            table[alias] = entries
        elif op == "remove":
            alias, index = str(spec["alias"]), str(spec["index"])
            entries = [e for e in table.get(alias, []) if e["index"] != index]
            if len(entries) == len(table.get(alias, [])):
                raise ValueError(
                    f"alias {alias!r} does not point at {index!r}"
                )
            if entries:
                table[alias] = entries
            else:
                table.pop(alias, None)
        elif op == "remove_index":
            index = str(spec["index"])
            for alias in list(table):
                entries = [e for e in table[alias] if e["index"] != index]
                if entries:
                    table[alias] = entries
                else:
                    del table[alias]
        else:
            raise ValueError(
                f"action must be add/remove/remove_index, got {op!r}"
            )
    _store(cluster_dir, table)
    return table


def get_aliases(cluster_dir: str, alias: str | None = None) -> dict:
    """``GET _aliases`` / ``GET _alias/<name>``: the alias table, optionally
    one alias's entries."""
    table = _load(cluster_dir)
    if alias is None:
        return table
    return {alias: table.get(alias, [])}


def resolve_read(cluster_dir: str, name: str) -> list[str]:
    """The index roots a SEARCH through ``name`` fans out to. A plain index
    path passes through untouched (ES lets every API take index-or-alias)."""
    table = _load(cluster_dir)
    if name in table:
        return [e["index"] for e in table[name]]
    return [name]


def resolve_write(cluster_dir: str, name: str) -> str:
    """The single index a WRITE through ``name`` lands in: the alias's
    ``is_write_index`` entry, or its only entry; several entries without a
    write index raise (ES's write-alias rule)."""
    table = _load(cluster_dir)
    if name not in table:
        return name
    entries = table[name]
    writers = [e["index"] for e in entries if e.get("is_write_index")]
    if len(writers) == 1:
        return writers[0]
    if len(entries) == 1:
        return entries[0]["index"]
    raise ValueError(
        f"alias {name!r} points at {len(entries)} indices and none is the "
        "write index — set is_write_index on one, or write to the index "
        "directly"
    )


def cat_aliases(cluster_dir: str) -> list[dict]:
    """``_cat/aliases`` analog: one flat row per (alias, index) pair."""
    return [
        {"alias": a, "index": e["index"],
         "is_write_index": e["is_write_index"]}
        for a, entries in sorted(_load(cluster_dir).items())
        for e in entries
    ]


def rollover(
    cluster_dir: str,
    alias: str,
    new_index: str,
    *,
    max_docs: int | None = None,
    max_age_sec: float | None = None,
    dry_run: bool = False,
) -> dict:
    """ES ``_rollover``: when the alias's current WRITE index meets any
    condition, atomically repoint the write alias at ``new_index`` (the old
    index stays aliased for reads — ES's rollover keeps it searchable).

    Conditions read the write index's published stats manifest (doc count)
    and the version dir's mtime (age) — metadata only, no data job. Unlike
    ES this does not CREATE the new index (an index here is born from a
    corpus build, not an empty mapping): rollover hands the next ingest its
    target path. ``dry_run`` evaluates conditions without swapping."""
    import time as _time

    from es_indexer_spark.index import catalog

    if max_docs is None and max_age_sec is None:
        raise ValueError("rollover needs at least one condition")
    old = resolve_write(cluster_dir, alias)
    if old == alias:
        raise ValueError(f"alias {alias!r} does not exist")
    vdir = catalog.resolve(old)
    st = catalog.read_stats(vdir)
    age = _time.time() - os.stat(vdir).st_mtime
    conditions = {}
    if max_docs is not None:
        conditions["max_docs"] = st["n_docs"] >= max_docs
    if max_age_sec is not None:
        conditions["max_age_sec"] = age >= max_age_sec
    rolled = any(conditions.values())
    if rolled and not dry_run:
        # old index keeps the alias for READS; the new one takes writes
        update_aliases(cluster_dir, [
            {"add": {"alias": alias, "index": old, "is_write_index": False}},
            {"add": {"alias": alias, "index": new_index,
                     "is_write_index": True}},
        ])
    return {
        "rolled_over": bool(rolled and not dry_run),
        "dry_run": dry_run,
        "conditions": conditions,
        "old_index": old,
        "new_index": new_index if rolled else None,
    }


def swap_alias(cluster_dir: str, alias: str, old: str | None, new: str) -> dict:
    """The blue/green one-liner: atomically repoint ``alias`` from ``old``
    (None = wherever it currently points) to ``new`` — the reference's
    rebuild-then-swap step at the index level."""
    table = _load(cluster_dir)
    actions: list[dict] = []
    current = [e["index"] for e in table.get(alias, [])]
    for idx in ([old] if old is not None else current):
        if idx in current:
            actions.append({"remove": {"alias": alias, "index": idx}})
    actions.append({"add": {"alias": alias, "index": new}})
    return update_aliases(cluster_dir, actions)
