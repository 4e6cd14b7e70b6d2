"""ES point-in-time (PIT) readers and the scroll API over them.

The reference's clients page deep result sets two ways: the legacy
``_search?scroll=`` cursor and the modern ``_pit`` + ``search_after``
combination (GeoNetworkServiceImpl pages its uuid-sorted export scan with a
resume token — `geonetwork4-api/.../GeoNetworkServiceImpl.java:586-604`).
Both contracts promise a STABLE view: pages keep coming from the index as
it was when the cursor was opened, even while reindexes, upserts and
deletes publish new generations underneath.

Native snapshot design — this leans on the catalog's blue/green layout
instead of Lucene segment readers:

* a PIT is a lightweight alias directory ``<root>/_pit/<id>/`` whose
  ``CURRENT`` pins the generation that was published at open time. Its
  ``snap/`` version dir SYMLINKS the immutable data dirs (``docs/``,
  ``postings/``, ``dict/``, ``stats.json`` — zero bytes copied) and COPIES
  the tombstone set (``_tomb/``, the only mutable read-side state). The
  returned path is itself a valid ``index_root``: every engine function
  (topk, phrase, bool, aggs, …) runs against the snapshot unchanged.
* version-replacing operations (rebuild, ``upsert_batch``, ``compact_index``)
  publish a NEW ``v<N>`` and repoint the root's CURRENT — the PIT keeps
  reading the old generation (version dirs are never deleted except by
  ``delete_index``). Post-open ``delete_docs`` tombstones land in the real
  version dir, not the PIT's copy — the snapshot also freezes deletes,
  matching ES's pinned-segment-reader semantics.
* ``keep_alive`` is advisory like ES: ``expire_pits`` garbage-collects
  cursors past their keep-alive; an expired-then-used PIT fails fast with
  the catalog's missing-CURRENT error.

:class:`Scroll` drives keyset pagination over a PIT: ranked (BM25
``search_after`` cursor), sorted (``topk_sorted`` keyset), or scan order
(docid keyset, the reference's export-scan shape). Pages concatenate
exactly to the one-shot larger-k result (pytest-pinned) — no offset
rescans, so page N costs the same as page 1 at any depth.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession

from es_indexer_spark.index import catalog

_SNAP = "snap"


def _pit_base(index_root: str) -> str:
    return os.path.join(index_root, "_pit")


def open_pit(index_root: str, keep_alive_s: float = 300.0) -> str:
    """Open a point-in-time reader over the currently published generation.
    Returns the PIT path — pass it anywhere an ``index_root`` goes; reads
    through it see the index exactly as it is now (generation AND delete
    set frozen), regardless of later publishes."""
    if os.path.basename(os.path.dirname(index_root.rstrip("/"))) == "_pit":
        raise ValueError("cannot open a PIT over a PIT — use the original root")
    vdir = os.path.abspath(catalog.resolve(index_root))
    base = _pit_base(index_root)
    os.makedirs(base, exist_ok=True)
    pit_dir = tempfile.mkdtemp(prefix="p", dir=base)
    snap = os.path.join(pit_dir, _SNAP)
    os.makedirs(snap)
    for entry in os.listdir(vdir):
        if entry.startswith("_ckpt"):
            continue
        src = os.path.join(vdir, entry)
        if entry == "_tomb":
            shutil.copytree(src, os.path.join(snap, entry))
        else:
            os.symlink(src, os.path.join(snap, entry))
    with open(os.path.join(pit_dir, "pit.json"), "w") as fh:
        json.dump(
            {
                "created": time.time(),
                "keep_alive_s": float(keep_alive_s),
                "version": os.path.basename(vdir),
                "root": os.path.abspath(index_root),
            },
            fh,
        )
    # the PIT dir is itself a root: CURRENT names its snapshot version dir
    catalog.publish(pit_dir, _SNAP)
    return pit_dir


def close_pit(pit_path: str) -> None:
    """Release a PIT (ES ``DELETE /_pit``). Idempotent."""
    if os.path.basename(os.path.dirname(pit_path.rstrip("/"))) != "_pit":
        raise ValueError(f"not a PIT path: {pit_path!r}")
    shutil.rmtree(pit_path, ignore_errors=True)


def list_pits(index_root: str) -> list[dict]:
    """Open cursors under ``index_root`` with their age and pinned version."""
    base = _pit_base(index_root)
    out = []
    if not os.path.isdir(base):
        return out
    for name in sorted(os.listdir(base)):
        meta_path = os.path.join(base, name, "pit.json")
        try:
            with open(meta_path) as fh:
                meta = json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            continue
        meta["id"] = name
        meta["path"] = os.path.join(base, name)
        meta["age_s"] = time.time() - meta["created"]
        out.append(meta)
    return out


def expire_pits(index_root: str, now: float | None = None) -> list[str]:
    """Garbage-collect cursors past their keep-alive (the ES reaper's job).
    Returns the closed PIT paths."""
    now = time.time() if now is None else now
    closed = []
    for meta in list_pits(index_root):
        if now - meta["created"] > meta["keep_alive_s"]:
            close_pit(meta["path"])
            closed.append(meta["path"])
    return closed


class Scroll:
    """Keyset pagination over a point-in-time snapshot (ES scroll / PIT +
    ``search_after``). Modes by arguments:

    - ``query`` only → ranked BM25 pages ((score, docid) cursor);
    - ``query`` + ``sort`` → sorted-surface pages (``topk_sorted`` keyset);
    - neither → docid-order scan pages (the reference's export scan).

    ``next_page()`` returns one page as a DataFrame (empty when exhausted —
    further calls stay empty); :meth:`pages` iterates to exhaustion. The
    page rows are materialized once to advance the cursor (they are the
    page the caller is about to consume — same cost shape as ES, which
    serializes every page through the response anyway)."""

    def __init__(
        self,
        spark: SparkSession,
        index_root: str,
        query: str | None = None,
        *,
        page_size: int = 10,
        sort: list | None = None,
        lang: str | None = None,
        keep_alive_s: float = 300.0,
        pit: str | None = None,
    ) -> None:
        if page_size < 1:
            raise ValueError("page_size must be >= 1")
        if sort is not None and query is None:
            raise ValueError("sorted scroll needs a query (use '' for match_all"
                             " via the sorted surface)")
        self.spark = spark
        self.page_size = int(page_size)
        self.query = query
        self.sort = sort
        self.lang = lang
        self._own_pit = pit is None
        self.pit = pit if pit is not None else open_pit(index_root, keep_alive_s)
        self._cursor = None
        self._done = False
        self._schema = None

    # -------------------------------------------------------------- paging

    def _fetch(self) -> DataFrame:
        if self.sort is not None:
            from es_indexer_spark.query.engine import topk_sorted

            return topk_sorted(
                self.spark, self.pit, self.query, sort=self.sort,
                k=self.page_size, after=self._cursor, lang=self.lang,
            )
        if self.query is not None:
            from es_indexer_spark.query.engine import topk

            return topk(
                self.spark, self.pit, self.query, k=self.page_size,
                after=self._cursor, lang=self.lang,
            )
        from es_indexer_spark.query.lookup import scan_after

        return scan_after(
            self.spark, self.pit, after=self._cursor,
            page_size=self.page_size,
        )

    def _advance(self, rows) -> None:
        if len(rows) < self.page_size:
            self._done = True
        if not rows:
            return
        last = rows[-1]
        if self.sort is not None:
            names = [
                ("score" if (s if isinstance(s, str) else s[0]) == "_score"
                 else (s if isinstance(s, str) else s[0]))
                for s in self.sort
            ]
            self._cursor = tuple(last[n] for n in names) + (last["docid"],)
        elif self.query is not None:
            self._cursor = (last["score"], last["docid"])
        else:
            self._cursor = last["docid"]

    def next_page(self) -> DataFrame:
        """One page (empty DataFrame once exhausted)."""
        page = self._fetch()
        if self._schema is None:
            self._schema = page.schema
        if self._done:
            return self.spark.createDataFrame([], self._schema)
        rows = page.collect()
        self._advance(rows)
        return self.spark.createDataFrame(rows, self._schema)

    def pages(self, max_pages: int = 1 << 20):
        """Iterate pages until exhaustion (ES scroll loop)."""
        for _ in range(max_pages):
            rows_df = self.next_page()
            if not rows_df.take(1):
                return
            yield rows_df

    # ----------------------------------------------------------- lifecycle

    def close(self) -> None:
        """Release the cursor (and its PIT if this scroll opened it)."""
        if self._own_pit:
            close_pit(self.pit)
        self._done = True

    def __enter__(self) -> "Scroll":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
