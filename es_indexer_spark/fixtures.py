"""Deterministic synthetic ``code_files`` corpus + reference query set.

BASELINE.json:input_hint pins the engine's primary input shape:
``(repo string, path string, commit string, lang string, content string)``.
This module synthesizes that table at any scale, fully distributed (mapInPandas over
``spark.range`` — no driver-side materialization, so the generator itself scales to
the bench sizes) and deterministic per row id (seed=42 ^ row id), matching
/root/repo/FIXTURES.md:

- Zipf-distributed identifier vocabulary (term df skew exercises the bucket-salting
  path), camelCase and snake_case identifiers, very-high-df "stop" tokens
  (def/return/import/public);
- langs weighted python 30 / java 25 / js 20 / go 10 / rust 10 / md 5 (%);
- commit = sha1(repo/path)[:40] — stable pseudo-commit.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
LANGS = ["python", "java", "js", "go", "rust", "md"]
LANG_W = np.array([30, 25, 20, 10, 10, 5], dtype=np.float64)
LANG_EXT = {"python": "py", "java": "java", "js": "js", "go": "go", "rust": "rs", "md": "md"}

_BASES = [
    "get", "set", "run", "load", "save", "parse", "build", "merge", "split",
    "index", "query", "score", "token", "block", "shard", "batch", "user",
    "name", "data", "file", "path", "node", "tree", "list", "map", "hash",
    "read", "write", "open", "close", "init", "util", "core", "test", "main",
]
_STOPS = ["def", "return", "import", "public", "class", "if", "for", "while"]


def _vocab(n_terms: int = 2000) -> list[str]:
    """Deterministic identifier vocabulary: camelCase + snake_case combos."""
    rng = np.random.default_rng(SEED)
    out = []
    for i in range(n_terms):
        a, b = rng.choice(_BASES, 2)
        if i % 3 == 0:
            out.append(f"{a}{b.capitalize()}{i % 97}")  # camelCase-ish
        elif i % 3 == 1:
            out.append(f"{a}_{b}_{i % 89}")  # snake_case
        else:
            out.append(f"{a}{i % 83}")
    return out


_VOCAB = _vocab()
_ZIPF_P = 1.0 / np.arange(1, len(_VOCAB) + 1) ** 1.1
_ZIPF_P /= _ZIPF_P.sum()


def _gen_batch(ids: np.ndarray) -> pd.DataFrame:
    rows = []
    lang_p = LANG_W / LANG_W.sum()
    for i in ids:
        rng = np.random.default_rng(SEED ^ (int(i) * 2654435761 % 2**63))
        lang = LANGS[int(rng.choice(len(LANGS), p=lang_p))]
        repo = f"org{i % 7}/repo{i % 23}"
        path = f"src/mod{int(rng.integers(0, 40))}/f{i}.{LANG_EXT[lang]}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        n_lines = int(np.clip(rng.lognormal(2.5, 0.8), 4, 300))
        lines = []
        for _ in range(n_lines):
            k = int(rng.integers(2, 8))
            toks = list(np.asarray(_VOCAB, dtype=object)[rng.choice(len(_VOCAB), size=k, p=_ZIPF_P)])
            toks.insert(0, _STOPS[int(rng.integers(0, len(_STOPS)))])
            lines.append(" ".join(toks))
        rows.append((repo, path, commit, lang, "\n".join(lines)))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def code_files(spark: SparkSession, n_rows: int, partitions: int | None = None) -> DataFrame:
    """Distributed deterministic corpus of ``n_rows`` source files."""
    parts = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _gen_batch(pdf["id"].to_numpy())

    return spark.range(0, n_rows, numPartitions=parts).mapInPandas(
        gen, schema="repo string, path string, commit string, lang string, content string"
    )


# reference query set (FIXTURES.md §2): covers rare terms, stop terms, conjunctions,
# camelCase / snake_case sub-token matches, lang-tagged terms, absent terms, ties
REFERENCE_QUERIES: list[tuple[int, str, int]] = [
    (1, "getName42", 10),
    (2, "def", 10),
    (3, "index query score", 10),
    (4, "load_save_12 merge", 10),
    (5, "getUserName", 10),           # camelCase sub-token match
    (6, "read_write_3", 10),          # snake_case identifier
    (7, "lang:python index", 10),     # lang-tagged term
    (8, "zzz_absent_term", 10),
    (9, "return import public", 10),  # tie-heavy stop conjunction
    (10, "shard block token", 10),
    (11, "parseTree", 10),
    (12, "main util core test", 10),
]
