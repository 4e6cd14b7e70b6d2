"""Training-data assembly operators: deterministic dataset splitting and
sequence packing — the steps between a cleaned corpus (ops/dedup.py,
ops/textstats.py) and an LLM training run.

- :func:`assign_split` — hash-based train/val/test assignment. Deterministic
  and data-independent (re-running on a grown corpus never moves an existing
  doc between splits — the property random sampling lacks), no RNG state, no
  shuffle: one projection. The hash is 15 hex digits of sha256(id), the same
  SQL-replayable construction as the dedup ``sha`` hash family
  (ops/dedup.py:123).
- :func:`pack_documents` — assign docs to fixed-token-budget packs
  (training sequences) by contiguous cumulative-sum chunking within a group:
  ``pack = floor((cumsum_exclusive) / budget)``. Each pack's token sum is
  < budget + the group's max doc length (bounded overflow — the downstream
  truncation the packing feeds tolerates exactly this, and the rule is a
  pure window expression, unlike exact first-fit packing whose
  close-on-overflow recurrence cannot be evaluated in parallel).

Scale: ``assign_split`` is embarrassingly parallel. ``pack_documents``
windows within ``group_col`` — parallel across groups; with ``group_col=None``
the cumsum is one global window (single task) and is only for small frames,
which the docstring and a runtime guard make explicit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _sha_bucket(col, buckets: int):
    """Deterministic bucket in [0, buckets): first 15 hex digits of
    sha256(str(col)) mod buckets — bit-replayable in ANSI SQL."""
    h = F.substring(F.sha2(col.cast("string"), 256), 1, 15)
    return F.pmod(F.conv(h, 16, 10).cast("long"), F.lit(buckets))


def assign_split(
    df: DataFrame,
    id_col: str,
    val_buckets: int = 100,
    test_buckets: int = 100,
    buckets: int = 1000,
) -> DataFrame:
    """Add a ``split`` column: 'test' for hash buckets [0, test_buckets),
    'val' for [test_buckets, test_buckets+val_buckets), else 'train'.
    Fractions are buckets/1000 by default (100/100 = 10%/10%)."""
    if val_buckets + test_buckets >= buckets:
        raise ValueError("val + test buckets must leave room for train")
    b = _sha_bucket(F.col(id_col), buckets)
    return df.withColumn(
        "split",
        F.when(b < test_buckets, F.lit("test"))
        .when(b < test_buckets + val_buckets, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def pack_documents(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    group_col: str | None = None,
    max_rows_ungrouped: int = 1_000_000,
) -> DataFrame:
    """Assign every doc a ``pack_id`` (training-sequence id, 0-based within
    its group) and ``pack_offset`` (the doc's token offset inside the pack):
    docs are taken in ``id_col`` order and chunked at cumulative-token
    boundaries of ``budget``. A doc that crosses a boundary belongs to the
    pack its FIRST token falls in, so pack sums are < budget + max doc
    length (bounded overflow; see module docstring for why exact first-fit
    is not a parallel operator).

    ``group_col`` partitions the packing (and the window) — REQUIRED for
    large inputs; ``group_col=None`` runs one global window (single task)
    and refuses frames over ``max_rows_ungrouped`` rows."""
    if budget <= 0:
        raise ValueError("budget must be > 0")
    if group_col is None:
        if df.limit(max_rows_ungrouped + 1).count() > max_rows_ungrouped:
            raise ValueError(
                "ungrouped packing is a single global window; pass group_col"
            )
        w = Window.orderBy(F.col(id_col))
    else:
        w = Window.partitionBy(group_col).orderBy(F.col(id_col))
    cum_excl = F.coalesce(
        F.sum(F.col(token_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    return df.withColumn(
        "pack_id", F.floor(cum_excl / F.lit(int(budget))).cast("long")
    ).withColumn("pack_offset", F.pmod(cum_excl, F.lit(int(budget))).cast("long"))
