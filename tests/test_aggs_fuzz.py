"""Randomized aggs-body differential fuzz: hypothesis generates arbitrary
terms / histogram bucket requests with random metric children and options
(order, include, min_doc_count, missing, offset) and replays each against
pandas over the same docs frame. The JSON dispatch and the single-pass
groupBy compilation must agree with the naive reference on every
configuration — the fixed cases in test_dsl_aggs*.py pin one point each;
this sweeps the cross-product."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from es_indexer_spark.index.builder import build_index
from es_indexer_spark.query.dsl_aggs import aggregations

METRICS = ["avg", "sum", "min", "max", "value_count"]


@pytest.fixture(scope="module")
def agg_index(spark, documents, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("idx_aggfuzz"))
    build_index(
        spark, documents, root,
        content_col="text", id_col="doc_id",
        meta_cols=("lang", "source", "n_chars"),
        tokenizer="standard", n_buckets=8, shard_size=100,
        n_ckpt_batches=2,
    )
    return root


@pytest.fixture(scope="module")
def pdf(spark, agg_index):
    from es_indexer_spark.query.aggs import index_docs

    return index_docs(spark, agg_index).toPandas()


def _metric_ref(sub: pd.DataFrame, fam: str, name: str) -> dict:
    col = sub["n_chars"]
    if fam == "avg":
        return {name: round(float(col.mean()), 6) if len(col) else None}
    if fam == "sum":
        return {name: int(col.sum()) if len(col) else None}
    if fam == "min":
        return {name: int(col.min()) if len(col) else None}
    if fam == "max":
        return {name: int(col.max()) if len(col) else None}
    return {name: int(col.notna().sum())}


TERMS_CFG = st.fixed_dictionaries({
    "fam": st.just("terms"),
    "field": st.sampled_from(["lang", "source"]),
    "size": st.integers(min_value=1, max_value=6),
    "mdc": st.sampled_from([1, 1, 2, 5]),
    "order": st.sampled_from(["_count", "_key", "metric"]),
    "dir": st.sampled_from(["asc", "desc"]),
    "metrics": st.lists(st.sampled_from(METRICS), max_size=2, unique=True),
})
HIST_CFG = st.fixed_dictionaries({
    "fam": st.just("histogram"),
    "interval": st.sampled_from([100.0, 250.0, 500.0]),
    "offset": st.sampled_from([0.0, 0.0, 30.0, 130.0]),
    "mdc": st.sampled_from([1, 1, 2]),
    "metrics": st.lists(st.sampled_from(METRICS), max_size=2, unique=True),
})


@settings(max_examples=25, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(st.one_of(TERMS_CFG, HIST_CFG))
def test_bucket_agg_matches_pandas(spark, agg_index, pdf, cfg):
    metrics = {f"m_{m}": {m: {"field": "n_chars"}} for m in cfg["metrics"]}
    if cfg["fam"] == "terms":
        if cfg["order"] == "metric" and not cfg["metrics"]:
            cfg = {**cfg, "order": "_count"}
        order_path = {
            "_count": "_count", "_key": "_key",
        }.get(cfg["order"], f"m_{cfg['metrics'][0]}" if cfg["metrics"] else "_count")
        body = {"aggs": {"a": {
            "terms": {"field": cfg["field"], "size": cfg["size"],
                      "min_doc_count": cfg["mdc"],
                      "order": {order_path: cfg["dir"]}},
            **({"aggs": metrics} if metrics else {}),
        }}}
        got = aggregations(spark, agg_index, body)["a"].toPandas()

        sub = pdf[pdf[cfg["field"]].notna()]
        rows = []
        for key, g in sub.groupby(cfg["field"]):
            row = {"key": key, "doc_count": len(g)}
            for m in cfg["metrics"]:
                row.update(_metric_ref(g, m, f"m_{m}"))
            rows.append(row)
        ref = pd.DataFrame(rows)
        ref = ref[ref.doc_count >= cfg["mdc"]]
        ocol = {"_count": "doc_count", "_key": "key"}.get(order_path, order_path)
        asc = cfg["dir"] == "asc"
        by = [ocol] + ([] if ocol == "key" else ["key"])
        ref = ref.sort_values(by, ascending=[asc] + [True] * (len(by) - 1))
        ref = ref.head(cfg["size"]).reset_index(drop=True)
        assert list(got["key"]) == list(ref["key"])
        assert list(got["doc_count"]) == list(ref["doc_count"])
        for m in cfg["metrics"]:
            got_v = [round(float(x), 6) for x in got[f"m_{m}"]]
            ref_v = [round(float(x), 6) for x in ref[f"m_{m}"]]
            assert got_v == pytest.approx(ref_v)
    else:
        body = {"aggs": {"a": {
            "histogram": {"field": "n_chars", "interval": cfg["interval"],
                          "offset": cfg["offset"],
                          "min_doc_count": cfg["mdc"]},
            **({"aggs": metrics} if metrics else {}),
        }}}
        got = aggregations(spark, agg_index, body)["a"].toPandas()
        iv, off = cfg["interval"], cfg["offset"]
        b = np.floor((pdf["n_chars"] - off) / iv) * iv + off
        rows = []
        for key, g in pdf.groupby(b):
            row = {"bucket": key, "doc_count": len(g)}
            for m in cfg["metrics"]:
                row.update(_metric_ref(g, m, f"m_{m}"))
            rows.append(row)
        ref = pd.DataFrame(rows)
        ref = ref[ref.doc_count >= cfg["mdc"]].sort_values("bucket")
        assert list(got["bucket"]) == list(ref["bucket"])
        assert list(got["doc_count"]) == list(ref["doc_count"])
        for m in cfg["metrics"]:
            assert [round(float(x), 6) for x in got[f"m_{m}"]] == pytest.approx(
                [round(float(x), 6) for x in ref[f"m_{m}"]])
