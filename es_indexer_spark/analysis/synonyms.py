"""Query-time synonym expansion, the native analog of the reference's
``acronym_search_analyser`` + live synonym set.

Reference behavior:
- the synonym graph is applied at **search time only** (``search_analyzer`` on
  ``title.synonyms``/``description.synonyms``,
  stacmodel/.../portal_records_index_schema.json:10-14,39-43,106-110,163-168) —
  documents are never rewritten, queries are expanded;
- the rule set is built by flattening the vocabulary trees and keeping hidden
  acronym labels that map to a full name
  (indexer/.../AcronymService.java:260-275 flatten, :282-305 rule-per-concept,
  :328-347 ``isAcronym`` heuristic, :353-359 normalize, :391-405 strip parens,
  :237,:240-241 dedupe + sort).

Spark mapping (SURVEY.md §1.3, J7): the rule set is a small driver-side dict,
broadcast implicitly by closure into query parsing. Expansion happens on the ≤|q|
query terms — zero document-side cost, zero shuffle.
"""

from __future__ import annotations

import re

_PAREN_RE = re.compile(r"\s*\([^)]*\)")
_WS_RE = re.compile(r"\s+")
_LOWER_RUN_RE = re.compile(r"[a-z]{2,}")


def is_acronym(label: str) -> bool:
    """The reference's acronym heuristic (AcronymService.java:328-347): short
    (≤12 chars), contains at least one capital, and no run of 2+ lowercase
    letters (so ``IMOS``/``CO2`` qualify, ``Imos``/``Argo`` do not)."""
    if not label or len(label) > 12:
        return False
    if not any(c.isupper() for c in label):
        return False
    return not _LOWER_RUN_RE.search(label)


def normalize_label(label: str) -> str:
    """Strip parenthesised qualifiers and collapse whitespace
    (AcronymService.java:353-359,391-405)."""
    return _WS_RE.sub(" ", _PAREN_RE.sub("", label)).strip()


def build_synonym_rules(
    concepts: list[tuple[str, list[str]]],
) -> dict[str, list[str]]:
    """Build acronym→expansion rules from ``(preferred_label, hidden_labels)``
    concept pairs (the flattened vocab tree of AcronymService.java:260-305).

    Returns a lowercased map ``acronym -> [full-name tokens...]``, deduplicated
    and sorted (the A→Z sort of :240-241).
    """
    rules: dict[str, set[str]] = {}
    for pref, hidden in concepts:
        full = normalize_label(pref)
        if not full:
            continue
        for h in hidden:
            h = normalize_label(h)
            if is_acronym(h) and h.lower() != full.lower():
                rules.setdefault(h.lower(), set()).add(full.lower())
    return {k: sorted(v) for k, v in sorted(rules.items())}


def expand_terms(
    terms: list[str], rules: dict[str, list[str]], tokenize
) -> list[str]:
    """Expand query terms through the synonym rules (synonym_graph analog: the
    acronym stays AND its expansions' tokens are added — a disjunctive widening
    of the query, matching ES synonym_graph OR semantics)."""
    out: list[str] = []
    for t in terms:
        out.append(t)
        for expansion in rules.get(t, ()):  # expansion is a phrase; tokenize it
            out.extend(tokenize(expansion))
    # preserve order, drop dups (term weight comes from idf, not multiplicity)
    seen: dict[str, None] = {}
    for t in out:
        seen.setdefault(t, None)
    return list(seen)
