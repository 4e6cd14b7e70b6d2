"""ES ``_search/template`` — mustache-parameterized request bodies.

ES clients ship canned queries as stored search templates and fill in
parameters per call (``POST _search/template {"id": ..., "params": ...}``);
the reference's portal issues its facet/search bodies programmatically, but
the template surface is the standard ES way to pin those bodies server-side.
This module renders the published mustache subset and dispatches the rendered
body onto :func:`es_indexer_spark.query.dsl.search` — no matching logic lives
here, only text rendering + the stored-template registry.

Supported mustache subset (the constructs ES's own docs use for search
templates):

- ``{{var}}`` — scalar substitution. Strings are JSON-escaped in place
  (deliberate divergence: raw mustache would splice ``"`` through the JSON
  body; escaping keeps every rendered body parseable — same values, never a
  mis-parse);
- ``{{#toJson}}var{{/toJson}}`` — JSON-encode any value (lists, dicts);
- ``{{#var}}...{{/var}}`` / ``{{^var}}...{{/var}}`` — truthy / falsy
  sections (no iteration — ES templates use ``toJson`` for arrays), so the
  ES default-value idiom ``{{q}}{{^q}}match_all{{/q}}`` works;
- dotted names (``params.size``) resolve through nested dicts.

Stored templates live as JSON files under ``<index_root>/templates/<id>.json``
(:func:`put_template` / :func:`get_template` / :func:`delete_template` /
:func:`cat_templates`), the catalog analog of ES's cluster-state scripts —
they survive generation swaps because they describe QUERIES, not segments.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession

_TAG = re.compile(r"\{\{\s*([#^/]?)\s*([\w.]+)\s*\}\}")


def _resolve(params: dict, name: str):
    cur: object = params
    for part in name.split("."):
        if not isinstance(cur, dict) or part not in cur:
            return None
        cur = cur[part]
    return cur


def _scalar(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return json.dumps(v)
    # JSON-escape WITHOUT the surrounding quotes: the template supplies its
    # own quoting context ('"{{q}}"'), we guarantee the splice can't break it
    return json.dumps(str(v))[1:-1]


def render_template(source: str, params: dict | None = None) -> dict:
    """Render mustache ``source`` with ``params`` and parse the result as a
    JSON request body. Unknown ``{{var}}`` renders empty (mustache's rule);
    unbalanced sections raise by name."""
    params = params or {}
    out: list[str] = []
    pos = 0
    # stack of (name, emitting?) — a section only emits when every enclosing
    # section emits
    stack: list[tuple[str, bool]] = []

    def emitting() -> bool:
        return all(e for _, e in stack)

    for m in _TAG.finditer(source):
        if m.start() < pos:
            # already consumed by a {{#toJson}}...{{/toJson}} span
            continue
        if emitting():
            out.append(source[pos : m.start()])
        pos = m.end()
        sigil, name = m.group(1), m.group(2)
        if sigil == "#":
            if name == "toJson":
                # the ES helper: section body is the PARAM NAME to encode
                end = source.find("{{/toJson}}", pos)
                if end < 0:
                    raise ValueError("unclosed {{#toJson}} section")
                pname = source[pos:end].strip()
                if emitting():
                    out.append(json.dumps(_resolve(params, pname)))
                pos = end + len("{{/toJson}}")
            else:
                stack.append((name, bool(_resolve(params, name))))
        elif sigil == "^":
            stack.append((name, not _resolve(params, name)))
        elif sigil == "/":
            if not stack or stack[-1][0] != name:
                raise ValueError(
                    f"unbalanced section close {{{{/{name}}}}} "
                    f"(open: {[n for n, _ in stack]!r})"
                )
            stack.pop()
        else:
            if emitting():
                out.append(_scalar(_resolve(params, name)))
    if stack:
        raise ValueError(
            f"unclosed template sections: {[n for n, _ in stack]!r}"
        )
    out.append(source[pos:])
    rendered = "".join(out)
    try:
        return json.loads(rendered)
    except json.JSONDecodeError as e:
        raise ValueError(
            f"rendered template is not valid JSON at char {e.pos}: "
            f"{rendered[max(0, e.pos - 40) : e.pos + 40]!r}"
        ) from e


# ------------------------------------------------------- stored templates
def _tdir(index_root: str) -> str:
    return os.path.join(index_root, "templates")


def put_template(index_root: str, template_id: str, source: str) -> None:
    """Store (or overwrite) a search template under the index root — the
    ``PUT _scripts/<id>`` analog. Write-then-rename so readers never see a
    torn file."""
    if not re.fullmatch(r"[\w-]+", template_id):
        raise ValueError(f"template id must be [\\w-]+, got {template_id!r}")
    os.makedirs(_tdir(index_root), exist_ok=True)
    path = os.path.join(_tdir(index_root), f"{template_id}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"id": template_id, "source": source}, f)
    os.replace(tmp, path)


def get_template(index_root: str, template_id: str) -> str:
    path = os.path.join(_tdir(index_root), f"{template_id}.json")
    if not os.path.exists(path):
        raise FileNotFoundError(f"no stored template {template_id!r}")
    with open(path) as f:
        return json.load(f)["source"]


def delete_template(index_root: str, template_id: str) -> bool:
    path = os.path.join(_tdir(index_root), f"{template_id}.json")
    if not os.path.exists(path):
        return False
    os.remove(path)
    return True


def cat_templates(index_root: str) -> list[str]:
    d = _tdir(index_root)
    if not os.path.isdir(d):
        return []
    return sorted(
        f[: -len(".json")] for f in os.listdir(d) if f.endswith(".json")
    )


def search_template(
    spark: SparkSession,
    index_root: str,
    *,
    source: str | None = None,
    template_id: str | None = None,
    params: dict | None = None,
    **search_kwargs,
) -> DataFrame:
    """``POST _search/template``: render an inline ``source`` or a stored
    ``template_id`` with ``params`` and run the body through
    :func:`es_indexer_spark.query.dsl.search` (extra kwargs — ``emb_df``,
    ``geo_root``, … — pass straight through)."""
    from es_indexer_spark.query.dsl import search

    if (source is None) == (template_id is None):
        raise ValueError("pass exactly one of source= / template_id=")
    if template_id is not None:
        source = get_template(index_root, template_id)
    body = render_template(source, params)
    return search(spark, index_root, body, **search_kwargs)


def msearch_template(
    spark: SparkSession,
    index_root: str,
    searches: list[dict],
    **search_kwargs,
) -> list[DataFrame]:
    """``POST _msearch/template``: each entry is ``{"source": ...}`` or
    ``{"id": ...}`` plus ``{"params": ...}``. Bodies render first, then the
    WHOLE batch goes through :func:`es_indexer_spark.query.dsl.msearch` —
    so a batch of plain-match templates (the common saved-search shape)
    shares ONE dictionary lookup + ONE postings scan, exactly like
    ``_msearch``."""
    from es_indexer_spark.query.dsl import msearch

    bodies = []
    for s in searches:
        src = s.get("source")
        if (src is None) == (s.get("id") is None):
            raise ValueError(
                "each msearch_template entry needs exactly one of source/id"
            )
        if src is None:
            src = get_template(index_root, str(s["id"]))
        bodies.append(render_template(src, s.get("params")))
    return msearch(spark, index_root, bodies, **search_kwargs)


def render_search_template(
    index_root: str,
    *,
    source: str | None = None,
    template_id: str | None = None,
    params: dict | None = None,
) -> dict:
    """``POST _render/template``: the rendered body without running it —
    the debugging half of the API."""
    if (source is None) == (template_id is None):
        raise ValueError("pass exactly one of source= / template_id=")
    if template_id is not None:
        source = get_template(index_root, template_id)
    return render_template(source, params)
