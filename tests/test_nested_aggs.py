"""ES nested / join-field queries (query/nested.py) and the round-5c
aggregation additions (normalize, percentiles_bucket, extended_stats_bucket,
moving_fn, t_test, matrix_stats) — each checked against numpy/pandas math."""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import Row, functions as F

from es_indexer_spark.query import aggs
from es_indexer_spark.query.nested import (
    children_agg,
    has_child,
    has_parent,
    nested_agg,
    nested_count,
    nested_query,
    parent_id_query,
    reverse_nested_agg,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))


# ------------------------------------------------------------------ nested
@pytest.fixture(scope="module")
def nested_users(spark):
    rows = [
        Row(user_id=1, evs=[Row(kind="click", v=10.0), Row(kind="view", v=500.0)]),
        Row(user_id=2, evs=[Row(kind="click", v=500.0)]),
        Row(user_id=3, evs=[Row(kind="view", v=1.0)]),
        Row(user_id=4, evs=[Row(kind="click", v=600.0), Row(kind="click", v=700.0)]),
    ]
    return spark.createDataFrame(rows)


def test_nested_query_same_object_semantics(nested_users):
    # user 1 has a click AND a value>100, but never in the SAME element —
    # the cross-object false-match nested queries exist to prevent
    got = sorted(
        r["user_id"]
        for r in nested_query(
            nested_users, "evs", lambda e: (e.kind == "click") & (e.v > 100)
        ).collect()
    )
    assert got == [2, 4]


def test_nested_count(nested_users):
    got = {
        r["user_id"]: r["nested_hits"]
        for r in nested_count(
            nested_users, "evs", lambda e: (e.kind == "click") & (e.v > 100)
        ).collect()
    }
    assert got == {1: 0, 2: 1, 3: 0, 4: 2}


def test_nested_agg_counts_nested_docs(nested_users):
    got = {
        r["kind"]: (r["doc_count"], r["avg_v"])
        for r in nested_agg(nested_users, "evs", "kind", metric_field="v").collect()
    }
    assert got["click"][0] == 4  # nested docs, not roots
    assert got["view"][0] == 2
    assert got["click"][1] == pytest.approx((10 + 500 + 600 + 700) / 4)


def test_reverse_nested_root_counts(nested_users):
    got = {
        r["kind"]: (r["doc_count"], r["root_doc_count"])
        for r in reverse_nested_agg(nested_users, "user_id", "evs", "kind").collect()
    }
    assert got["click"] == (4, 3)  # 4 nested click docs across 3 roots
    assert got["view"] == (2, 2)


# --------------------------------------------------------------- join field
def test_has_child_modes_and_bounds(spark, orders, lineitem):
    pred = F.col("l_quantity") >= 45
    got = {
        r["o_orderkey"]: (r["child_count"], r["_score"])
        for r in has_child(
            orders, lineitem,
            parent_key="o_orderkey", child_parent_key="l_orderkey",
            child_pred=pred, score_mode="sum",
            child_score=F.col("l_quantity"), min_children=2,
        ).collect()
    }
    pdf = lineitem.filter(pred).groupBy("l_orderkey").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("s")
    ).collect()
    want = {
        r["l_orderkey"]: (r["n"], float(r["s"])) for r in pdf if r["n"] >= 2
    }
    # orders table must actually contain those keys
    okeys = {r["o_orderkey"] for r in orders.select("o_orderkey").collect()}
    want = {k: v for k, v in want.items() if k in okeys}
    assert got == {k: (n, pytest.approx(s)) for k, (n, s) in want.items()}
    # score_mode none: _score 0, same membership with min_children=1
    none_rows = has_child(
        orders, lineitem,
        parent_key="o_orderkey", child_parent_key="l_orderkey",
        child_pred=pred, score_mode="none",
    ).select("o_orderkey", "_score").collect()
    assert all(r["_score"] == 0.0 for r in none_rows)
    with pytest.raises(ValueError, match="needs child_score"):
        has_child(
            orders, lineitem,
            parent_key="o_orderkey", child_parent_key="l_orderkey",
            child_pred=pred, score_mode="avg",
        )


def test_has_parent_score_inherit(spark, orders, lineitem):
    pred = F.col("o_totalprice") > 400000
    got = has_parent(
        orders, lineitem,
        parent_key="o_orderkey", child_parent_key="l_orderkey",
        parent_pred=pred, score=True, parent_score=F.col("o_totalprice"),
    ).select("l_orderkey", "l_linenumber", "_score").collect()
    parents = {
        r["o_orderkey"]: float(r["o_totalprice"])
        for r in orders.filter(pred).collect()
    }
    n_children = lineitem.filter(
        F.col("l_orderkey").isin(list(parents))
    ).count()
    assert len(got) == n_children
    for r in got:
        assert r["_score"] == pytest.approx(parents[r["l_orderkey"]])


def test_parent_id_query(spark, lineitem):
    some = lineitem.select("l_orderkey").first()["l_orderkey"]
    got = parent_id_query(lineitem, "l_orderkey", some)
    assert got.count() == lineitem.filter(F.col("l_orderkey") == some).count()
    assert got.select("_score").first()["_score"] == 1.0


def test_children_agg(spark, orders, lineitem):
    got = {
        r["o_orderpriority"]: (r["doc_count"], r["avg_disc"])
        for r in children_agg(
            orders, lineitem,
            parent_key="o_orderkey", child_parent_key="l_orderkey",
            group_field="o_orderpriority",
            child_metric=F.avg("l_discount"), metric_name="avg_disc",
        ).collect()
    }
    want_rows = (
        orders.select("o_orderkey", "o_orderpriority")
        .join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.avg("l_discount").alias("a"))
        .collect()
    )
    for r in want_rows:
        n, a = got[r["o_orderpriority"]]
        assert n == r["n"] and a == pytest.approx(r["a"])


# ------------------------------------------------------------- new aggs
@pytest.fixture(scope="module")
def day_buckets(spark, events):
    return (
        events.groupBy(F.date_trunc("day", "ts").alias("bucket"))
        .agg(F.count("*").alias("doc_count"))
    )


def _bucket_series(day_buckets):
    rows = sorted(day_buckets.collect(), key=lambda r: r["bucket"])
    return np.array([r["doc_count"] for r in rows], dtype=float)


@pytest.mark.parametrize("method", [
    "rescale_0_1", "rescale_0_100", "percent_of_sum", "mean", "z-score", "softmax",
])
def test_normalize_methods(day_buckets, method):
    rows = sorted(
        aggs.normalize_agg(day_buckets, "doc_count", method).collect(),
        key=lambda r: r["bucket"],
    )
    v = np.array([r["doc_count"] for r in rows], dtype=float)
    want = {
        "rescale_0_1": (v - v.min()) / (v.max() - v.min()),
        "rescale_0_100": (v - v.min()) / (v.max() - v.min()) * 100,
        "percent_of_sum": v / v.sum(),
        "mean": v - v.mean(),
        "z-score": (v - v.mean()) / v.std(),
        "softmax": np.exp(v - 0) / np.exp(v - 0).sum(),
    }[method]
    got = np.array([r["doc_count_norm"] for r in rows])
    assert np.allclose(got, want, rtol=1e-9)


def test_normalize_unknown_method(day_buckets):
    with pytest.raises(ValueError, match="unknown normalize"):
        aggs.normalize_agg(day_buckets, "doc_count", "nope")


def test_percentiles_bucket(day_buckets):
    v = _bucket_series(day_buckets)
    row = aggs.percentiles_bucket(day_buckets, "doc_count", (25, 50, 99)).first()
    assert row["p25"] == pytest.approx(np.percentile(v, 25))
    assert row["p50"] == pytest.approx(np.percentile(v, 50))
    assert row["p99"] == pytest.approx(np.percentile(v, 99))


def test_extended_stats_bucket(day_buckets):
    v = _bucket_series(day_buckets)
    row = aggs.extended_stats_bucket(day_buckets, "doc_count", sigma=3.0).first()
    assert row["count"] == len(v)
    assert row["variance"] == pytest.approx(v.var())
    assert row["sum_of_squares"] == pytest.approx((v * v).sum())
    assert row["std_deviation_bounds_upper"] == pytest.approx(
        v.mean() + 3 * v.std()
    )


@pytest.mark.parametrize("fn,shift", [
    ("sum", 0), ("min", 0), ("max", 1), ("unweightedAvg", 0),
    ("stdDev", 0), ("linearWeightedAvg", 0), ("linearWeightedAvg", 1),
])
def test_moving_fn(day_buckets, fn, shift):
    rows = sorted(
        aggs.moving_fn(
            day_buckets, "doc_count", window=3, fn=fn, shift=shift
        ).collect(),
        key=lambda r: r["bucket"],
    )
    v = [float(r["doc_count"]) for r in rows]
    for i, r in enumerate(rows):
        lo, hi = i - 3 + shift, i + shift - 1
        seg = v[max(lo, 0): hi + 1] if hi >= 0 else []
        if not seg:
            assert r["doc_count_mfn"] is None
            continue
        a = np.array(seg)
        want = {
            "sum": a.sum(), "min": a.min(), "max": a.max(),
            "unweightedAvg": a.mean(), "stdDev": a.std(),
            "linearWeightedAvg": (a * np.arange(1, len(a) + 1)).sum()
            / (len(a) * (len(a) + 1) / 2),
        }[fn]
        assert r["doc_count_mfn"] == pytest.approx(want), (fn, shift, i)


@pytest.mark.parametrize("ttype", ["heteroscedastic", "homoscedastic"])
def test_t_test(events, ttype):
    row = aggs.t_test_agg(
        events, "value", "event_type", "click", "view", test_type=ttype
    ).first()
    pdf = events.select("event_type", "value").toPandas()
    a = pdf[pdf.event_type == "click"].value.to_numpy()
    b = pdf[pdf.event_type == "view"].value.to_numpy()
    na, nb = len(a), len(b)
    va, vb = a.var(ddof=1), b.var(ddof=1)
    if ttype == "heteroscedastic":
        se2 = va / na + vb / nb
        t = (a.mean() - b.mean()) / math.sqrt(se2)
        dof = se2**2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    else:
        sp2 = ((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)
        t = (a.mean() - b.mean()) / math.sqrt(sp2 * (1 / na + 1 / nb))
        dof = na + nb - 2
    assert row["n_a"] == na and row["n_b"] == nb
    assert row["t_stat"] == pytest.approx(t, rel=1e-9)
    assert row["dof"] == pytest.approx(dof, rel=1e-9)


def test_matrix_stats(lineitem):
    fields = ["l_quantity", "l_extendedprice", "l_discount"]
    rows = aggs.matrix_stats_agg(lineitem, fields).collect()
    pdf = lineitem.select(*fields).toPandas().astype(float)
    got = {(r["field_x"], r["field_y"]): (r["covariance"], r["correlation"])
           for r in rows}
    assert len(got) == 6  # upper triangle incl. diagonal of 3 fields
    for (fx, fy), (cov, cor) in got.items():
        assert cov == pytest.approx(pdf[fx].cov(pdf[fy]), rel=1e-9)
        assert cor == pytest.approx(pdf[fx].corr(pdf[fy]), rel=1e-9)
