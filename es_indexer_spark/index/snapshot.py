"""ES ``_snapshot`` — durable point-in-time copies of a published index.

ES snapshots an index into a repository and restores it later, possibly
under another name; segments being immutable makes repeated snapshots
incremental. This engine's layout has the same property — a published
version dir is immutable except for its append-only ``_tombstones`` — so a
snapshot is a HARDLINK tree of the published version (metadata-speed, zero
data copied on the same filesystem; transparent byte copy across
filesystems) plus a real copy of the small mutable parts (tombstones,
checkpoint manifests, stats). A restore materializes the snapshot as a new
version under any root and publishes it atomically.

Difference vs :mod:`es_indexer_spark.query.pit` (the other "frozen view"):
a PIT is a cheap short-lived READ cursor that dies with ``expire_pits``; a
snapshot survives ``delete_index`` of the source and restores into a fresh
root — the backup/restore surface, not the pagination one.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from es_indexer_spark.index import catalog

_MUTABLE = ("_tombstones", "_ckpt")


def _copy_tree(src: str, dst: str, *, link: bool = True) -> int:
    """Hardlink (or copy, cross-device) every file under src into dst,
    preserving layout. Returns the file count."""
    n = 0
    for dirpath, _dirs, files in os.walk(src):
        rel = os.path.relpath(dirpath, src)
        out = os.path.join(dst, rel) if rel != "." else dst
        os.makedirs(out, exist_ok=True)
        for f in files:
            s, d = os.path.join(dirpath, f), os.path.join(out, f)
            if link:
                try:
                    os.link(s, d)
                except OSError:
                    shutil.copy2(s, d)
            else:
                shutil.copy2(s, d)
            n += 1
    return n


def create_snapshot(
    index_root: str, repo_dir: str, snapshot_id: str
) -> dict:
    """Snapshot the PUBLISHED version of ``index_root`` into
    ``repo_dir/snapshot_id``. Immutable segment files hardlink (incremental
    in spirit — same-filesystem snapshots share bytes with the live index
    and with each other); the mutable tombstone/checkpoint files copy, so a
    later delete in the live index never mutates the snapshot. The manifest
    is written LAST — a crash mid-snapshot leaves a directory without a
    manifest, which list/restore ignore (never a torn snapshot)."""
    if not snapshot_id or "/" in snapshot_id:
        raise ValueError(f"bad snapshot id {snapshot_id!r}")
    vdir = catalog.resolve(index_root)
    sdir = os.path.join(repo_dir, snapshot_id)
    if os.path.exists(os.path.join(sdir, "MANIFEST.json")):
        raise ValueError(f"snapshot {snapshot_id!r} already exists")
    os.makedirs(sdir, exist_ok=True)
    t0 = time.time()
    n_files = 0
    for entry in sorted(os.listdir(vdir)):
        src = os.path.join(vdir, entry)
        dst = os.path.join(sdir, "data", entry)
        if os.path.isdir(src):
            n_files += _copy_tree(src, dst, link=entry not in _MUTABLE)
        else:
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.copy2(src, dst)  # stats.json etc: small, always copy
            n_files += 1
    manifest = {
        "snapshot_id": snapshot_id,
        "source_root": os.path.abspath(index_root),
        "source_version": os.path.basename(vdir),
        "n_files": n_files,
        "stats": catalog.read_stats(vdir),
        "took_sec": round(time.time() - t0, 3),
    }
    tmp = os.path.join(sdir, ".MANIFEST.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(sdir, "MANIFEST.json"))
    return manifest


def list_snapshots(repo_dir: str) -> list[dict]:
    """``GET _snapshot/<repo>/_all``: manifests of every COMPLETE snapshot
    (directories without a manifest are in-flight or torn — skipped)."""
    if not os.path.isdir(repo_dir):
        return []
    out = []
    for d in sorted(os.listdir(repo_dir)):
        p = os.path.join(repo_dir, d, "MANIFEST.json")
        if os.path.exists(p):
            with open(p) as f:
                out.append(json.load(f))
    return out


def delete_snapshot(repo_dir: str, snapshot_id: str) -> bool:
    sdir = os.path.join(repo_dir, snapshot_id)
    if not os.path.isdir(sdir):
        return False
    shutil.rmtree(sdir)
    return True


def restore_snapshot(
    repo_dir: str, snapshot_id: str, dest_root: str
) -> str:
    """Restore a snapshot as a NEW version of ``dest_root`` and publish it
    atomically (restoring over a live index never disturbs readers — they
    flip at the CURRENT swap, ES's restore-then-alias behavior). Segment
    files hardlink back where possible; the restored version carries the
    snapshot's tombstone set, so logically-deleted docs stay deleted.
    Returns the new version dir."""
    sdir = os.path.join(repo_dir, snapshot_id)
    mpath = os.path.join(sdir, "MANIFEST.json")
    if not os.path.exists(mpath):
        raise FileNotFoundError(
            f"no complete snapshot {snapshot_id!r} under {repo_dir}"
        )
    version = catalog.next_version(dest_root)
    vdir = os.path.join(dest_root, version)
    _copy_tree(os.path.join(sdir, "data"), vdir, link=True)
    catalog.publish(dest_root, version)
    return vdir
