"""CLI job dispatch (the spark-submit entry pinned by BASELINE.json:north_rule;
reference analog: indexer/.../CLIRunner.java:31-60 + BatchJobRunner.java:54-99).
Runs embedded (reusing the test session) — the true spark-submit launch is
exercised by tools/bench_scaling.py and the verify recipe."""

from __future__ import annotations

import json
import os

from es_indexer_spark.cli import main

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_cli_build_query_suggest_resume(spark, tmp_path, capsys):
    root = str(tmp_path / "idx")
    src = os.path.join(SF_DIR, "documents.parquet")
    common = ["--index", root, "--content-col", "text", "--id-col", "doc_id"]
    rc = main(
        ["--job", "build", "--input", src, *common, "--tokenizer", "standard",
         "--n-buckets", "4", "--ckpt-batches", "2"]
    )
    assert rc == 0
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["n_docs"] == 500 and built["job"] == "build"

    rc = main(["--job", "query", "--index", root, "--query", "spark join window", "-k", "3"])
    assert rc == 0
    hits = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(hits) == 3 and hits[0]["score"] >= hits[1]["score"]

    rc = main(["--job", "query", "--index", root, "--query", "vector", "-k", "2",
               "--fetch-meta"])
    assert rc == 0
    hits = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(hits) == 2 and "doc_len" in hits[0]

    rc = main(["--job", "suggest", "--index", root, "--query", "da", "-k", "3"])
    assert rc == 0
    sugg = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert sugg and all(s["term"].startswith("da") for s in sugg)

    # resume over a completed build is a no-op that still publishes
    rc = main(["--job", "resume", "--input", src, *common])
    assert rc == 0
    again = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert again["n_docs"] == 500


def test_cli_missing_args(spark, capsys):
    assert main(["--job", "build", "--index", "/tmp/x"]) == 2
    assert main(["--job", "query", "--index", "/tmp/x"]) == 2


def test_cli_batch_job(spark, tmp_path, capsys):
    root = str(tmp_path / "idx_b")
    src = os.path.join(SF_DIR, "documents.parquet")
    rc = main(
        ["--job", "build", "--input", src, "--index", root, "--content-col",
         "text", "--id-col", "doc_id", "--tokenizer", "standard",
         "--n-buckets", "4", "--ckpt-batches", "2"]
    )
    assert rc == 0
    capsys.readouterr()
    qjson = json.dumps({"qa": "spark join window", "qb": "vector"})
    rc = main(["--job", "batch", "--index", root, "--queries-json", qjson, "-k", "3"])
    assert rc == 0
    hits = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    by_qid = {}
    for h in hits:
        by_qid.setdefault(h["qid"], []).append(h)
    assert set(by_qid) == {"qa", "qb"} and all(len(v) == 3 for v in by_qid.values())
    # file-path form of --queries-json
    qfile = tmp_path / "queries.json"
    qfile.write_text(qjson)
    rc = main(["--job", "batch", "--index", root, "--queries-json", str(qfile), "-k", "1"])
    assert rc == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 2

    assert main(["--job", "batch", "--index", root]) == 2  # missing --queries-json


def test_cli_delete_and_compact(spark, tmp_path, capsys):
    root = str(tmp_path / "idx_d")
    src = os.path.join(SF_DIR, "documents.parquet")
    rc = main(["--job", "build", "--input", src, "--index", root,
               "--content-col", "text", "--id-col", "doc_id",
               "--tokenizer", "standard", "--n-buckets", "4",
               "--ckpt-batches", "2"])
    assert rc == 0
    capsys.readouterr()

    rc = main(["--job", "query", "--index", root, "--query", "spark join window", "-k", "1"])
    assert rc == 0
    top1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["docid"]

    assert main(["--job", "delete", "--index", root]) == 2  # --ids required
    capsys.readouterr()
    rc = main(["--job", "delete", "--index", root, "--ids", str(top1)])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["n_ids"] == 1

    rc = main(["--job", "query", "--index", root, "--query", "spark join window", "-k", "3"])
    assert rc == 0
    hits = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert top1 not in {h["docid"] for h in hits}

    rc = main(["--job", "compact", "--index", root])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] == 499 and out["purged_docs"] == 1
    rc = main(["--job", "query", "--index", root, "--query", "spark join window", "-k", "3"])
    assert rc == 0
    hits = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert top1 not in {h["docid"] for h in hits}


def test_cli_round3_query_jobs(spark, tmp_path, capsys):
    """bool / fuzzy / prefix / explain / delete-query dispatch."""
    root = str(tmp_path / "idx_r3")
    src = os.path.join(SF_DIR, "documents.parquet")
    rc = main(
        ["--job", "build", "--input", src, "--index", root,
         "--content-col", "text", "--id-col", "doc_id",
         "--tokenizer", "standard", "--n-buckets", "4", "--ckpt-batches", "2",
         "--store-positions"]
    )
    assert rc == 0
    capsys.readouterr()

    rc = main(["--job", "bool", "--index", root, "--must", "data",
               "--should", "stream,batch", "--must-not", "key", "-k", "3"])
    assert rc == 0
    hits = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(hits) == 3 and hits[0]["score"] >= hits[1]["score"]

    rc = main(["--job", "bool", "--index", root, "--must", "customer",
               "--filter-phrase", "data stream", "-k", "3"])
    assert rc == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 3

    rc = main(["--job", "fuzzy", "--index", root, "--query", "strea", "-k", "3"])
    assert rc == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 3

    # Damerau fuzzy (round 5h): the flag routes transpositions=True; on a
    # swap-free input the result matches the classic run
    rc = main(["--job", "fuzzy", "--index", root, "--query", "strea",
               "--transpositions", "-k", "3"])
    assert rc == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 3

    rc = main(["--job", "prefix", "--index", root, "--query", "dup", "-k", "5"])
    assert rc == 0
    pref = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert pref and all(h["score"] == 1.0 for h in pref)

    rc = main(["--job", "explain", "--index", root,
               "--query", "spark join window", "--docid", "42"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert {r["term"] for r in rows} <= {"spark", "join", "window"}

    # --must-not narrows the tombstone set (regression: it must be forwarded)
    rc = main(["--job", "delete-query", "--index", root,
               "--must", "dup", "--must-not", "customer"])
    assert rc == 0
    n_excl = json.loads(capsys.readouterr().out.strip().splitlines()[-1])["deleted"]
    rc = main(["--job", "delete-query", "--index", root, "--must", "dup"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["deleted"] > 0  # the customer-carrying dup docs remained
    assert n_excl >= 0
    rc = main(["--job", "delete-query", "--index", root, "--must", "dup"])
    assert rc == 0
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1])["deleted"] == 0


def test_cli_late_round3_query_jobs(spark, tmp_path, capsys):
    """wildcard / phrase-prefix / mlt / simple-qs / rescore / range dispatch."""
    root = str(tmp_path / "idx_r3b")
    src = os.path.join(SF_DIR, "documents.parquet")
    rc = main(
        ["--job", "build", "--input", src, "--index", root,
         "--content-col", "text", "--id-col", "doc_id",
         "--meta-cols", "lang,n_chars",
         "--tokenizer", "standard", "--n-buckets", "4", "--ckpt-batches", "2",
         "--store-positions"]
    )
    assert rc == 0
    capsys.readouterr()

    rc = main(["--job", "wildcard", "--index", root, "--query", "s?a*", "-k", "3"])
    assert rc == 0
    hits = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(hits) == 3 and all(h["score"] == 1.0 for h in hits)

    rc = main(["--job", "phrase-prefix", "--index", root, "--query", "data s", "-k", "3"])
    assert rc == 0
    hits = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert hits and all(h["phrase_tf"] >= 1 for h in hits)

    rc = main(["--job", "mlt", "--index", root,
               "--query", "data stream data stream batch batch", "-k", "3"])
    assert rc == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 3

    rc = main(["--job", "simple-qs", "--index", root,
               "--query", '+data -key batch', "-k", "3"])
    assert rc == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 3

    rc = main(["--job", "rescore", "--index", root,
               "--query", "spark join window", "--rescore-phrase", "data stream",
               "--window-size", "20", "--rescore-weight", "2.0", "-k", "3"])
    assert rc == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 3

    rc = main(["--job", "range", "--index", root, "--field", "n_chars",
               "--gte", "150", "--lt", "400", "-k", "5"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and all(150 <= r["n_chars"] < 400 for r in rows)

    # missing required args -> exit 2, not a crash
    assert main(["--job", "rescore", "--index", root, "--query", "x"]) == 2
    assert main(["--job", "range", "--index", root, "--field", "n_chars"]) == 2


def test_cli_sortquery_geo_bbox_and_bool_knobs(spark, tmp_path, capsys):
    root = str(tmp_path / "idx4")
    src = os.path.join(SF_DIR, "documents.parquet")
    rc = main(
        ["--job", "build", "--input", src, "--index", root, "--content-col",
         "text", "--id-col", "doc_id", "--tokenizer", "standard",
         "--n-buckets", "4", "--ckpt-batches", "2", "--meta-cols", "lang"]
    )
    assert rc == 0
    capsys.readouterr()

    # sort-by-field ranked search
    rc = main(["--job", "sortquery", "--index", root, "--query", "data stream",
               "--sort", "lang:asc,_score", "-k", "5"])
    assert rc == 0
    hits = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(hits) == 5
    keys = [(h["lang"], -h["score"]) for h in hits]
    assert keys == sorted(keys)

    # bool with msm + ES ^boost syntax + fuzzy clause
    rc = main(["--job", "bool", "--index", root, "--should", "data,stream,batch",
               "--min-should-match", "2", "-k", "5"])
    assert rc == 0
    assert len(capsys.readouterr().out.strip().splitlines()) == 5
    rc = main(["--job", "bool", "--index", root, "--must", "data^2.0",
               "--must-fuzzy", "strea", "-k", "5"])
    assert rc == 0
    assert capsys.readouterr().out.strip()

    # geo-bbox over a written data index
    import pyspark.sql.functions as F
    from es_indexer_spark.ops.geoindex import write_geo_index

    geo = str(tmp_path / "geo")
    pts = spark.range(200).select(
        F.lit("c0").alias("collection"),
        F.to_timestamp(F.lit("2024-01-15 00:00:00")).alias("ts"),
        (F.col("id") % 30).alias("lon"),
        (F.col("id") % 11).alias("lat"),
    )
    write_geo_index(pts, geo, cell_deg=5.0, n_files=2)
    rc = main(["--job", "geo-bbox", "--index", geo, "--bbox", "2,1,8,6",
               "--date-range", "2024-01,2024-01", "--collections", "c0"])
    assert rc == 0
    cells = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert cells and all(2 <= c["lon"] <= 8 and 1 <= c["lat"] <= 6 for c in cells)


def test_cli_round5_jobs(spark, tmp_path, capsys):
    """Round-5 CLI surfaces: phrase --slop, span-near (ordered + unordered),
    suggest-fuzzy, bool --min-should-match string specs."""
    root = str(tmp_path / "idx5")
    src = os.path.join(SF_DIR, "documents.parquet")
    rc = main(
        ["--job", "build", "--input", src, "--index", root, "--content-col",
         "text", "--id-col", "doc_id", "--tokenizer", "standard",
         "--n-buckets", "4", "--ckpt-batches", "2", "--store-positions"]
    )
    assert rc == 0
    capsys.readouterr()

    # sloppy phrase widens the exact match set
    rc = main(["--job", "phrase", "--index", root, "--query", "data stream",
               "-k", "50"])
    assert rc == 0
    exact = capsys.readouterr().out.strip().splitlines()
    rc = main(["--job", "phrase", "--index", root, "--query", "data stream",
               "--slop", "3", "-k", "50"])
    assert rc == 0
    sloppy = capsys.readouterr().out.strip().splitlines()
    assert len(sloppy) > len(exact) > 0

    # span-near unordered is clause-order invariant
    rc = main(["--job", "span-near", "--index", root, "--clauses",
               "stream,data", "--slop", "2", "--in-order", "false", "-k", "50"])
    assert rc == 0
    a = capsys.readouterr().out.strip()
    rc = main(["--job", "span-near", "--index", root, "--clauses",
               "data,stream", "--slop", "2", "--in-order", "false", "-k", "50"])
    assert rc == 0
    assert capsys.readouterr().out.strip() == a and a

    # fuzzy completion
    rc = main(["--job", "suggest-fuzzy", "--index", root, "--query", "sta",
               "--fuzziness", "1", "-k", "5"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and all("edits" in r for r in rows)

    # phrase suggester (round 5h): whole-phrase did-you-mean
    rc = main(["--job", "suggest-phrase", "--index", root, "--query",
               "dat stream", "--fuzziness", "2", "-k", "3"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert rows and rows[0]["suggestion"] == "data stream"
    assert main(["--job", "suggest-phrase", "--index", root]) == 2

    # msm percentage spec
    rc = main(["--job", "bool", "--index", root, "--should",
               "data,stream,batch,key", "--min-should-match", "75%", "-k", "5"])
    assert rc == 0
    pct = capsys.readouterr().out.strip()
    rc = main(["--job", "bool", "--index", root, "--should",
               "data,stream,batch,key", "--min-should-match", "3", "-k", "5"])
    assert rc == 0
    assert capsys.readouterr().out.strip() == pct and pct


def test_cli_validate_job(spark, tmp_path, capsys):
    root = str(tmp_path / "idx_val")
    src = os.path.join(SF_DIR, "documents.parquet")
    assert main(
        ["--job", "build", "--input", src, "--index", root, "--content-col",
         "text", "--id-col", "doc_id", "--tokenizer", "standard",
         "--n-buckets", "4", "--ckpt-batches", "2"]
    ) == 0
    capsys.readouterr()
    ok_body = json.dumps({"query": {"match": {"text": "data"}}})
    assert main(["--job", "validate", "--index", root, "--body", ok_body]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out == {"valid": True, "error": None}
    bad_body = json.dumps({"query": {"frankenquery": {}}})
    assert main(["--job", "validate", "--index", root, "--body", bad_body]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["valid"] is False and "frankenquery" in out["error"]
    assert main(["--job", "validate", "--index", root]) == 2


def test_cli_msearch_job(spark, tmp_path, capsys):
    root = str(tmp_path / "idx_ms")
    src = os.path.join(SF_DIR, "documents.parquet")
    assert main(
        ["--job", "build", "--input", src, "--index", root, "--content-col",
         "text", "--id-col", "doc_id", "--tokenizer", "standard",
         "--n-buckets", "4", "--ckpt-batches", "2"]
    ) == 0
    capsys.readouterr()
    bodies = json.dumps([
        {"query": {"match": {"text": "data stream"}}, "size": 2},
        {"query": {"match": {"text": "spark window"}}, "size": 3},
    ])
    assert main(["--job", "msearch", "--index", root, "--body", bodies]) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert {x["q"] for x in lines} == {0, 1}
    assert sum(1 for x in lines if x["q"] == 0) == 2
    assert sum(1 for x in lines if x["q"] == 1) == 3
    assert main(["--job", "msearch", "--index", root]) == 2


def test_cli_round5g_jobs(spark, tmp_path, capsys):
    root = str(tmp_path / "idx_5g")
    src = os.path.join(SF_DIR, "documents.parquet")
    rc = main(
        ["--job", "build", "--input", src, "--index", root, "--content-col",
         "text", "--id-col", "doc_id", "--meta-cols", "doc_id,lang,source",
         "--tokenizer", "standard", "--n-buckets", "4", "--ckpt-batches", "2"]
    )
    assert rc == 0
    capsys.readouterr()

    # mget: request order preserved, miss rows flagged
    rc = main(["--job", "mget", "--index", root, "--ids", "7,999999,3"])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert [(r["docid"], r["found"]) for r in rows] == [
        (7, True), (999999, False), (3, True)
    ]

    # stored template: put -> render -> search
    tsrc = ('{"query": {"term": {"lang": {"value": "{{lang}}"}}}, '
            '"size": {{size}}{{^size}}10{{/size}}}')
    rc = main(["--job", "put-template", "--index", root,
               "--template-id", "by-lang", "--template-source", tsrc])
    assert rc == 0
    capsys.readouterr()
    rc = main(["--job", "render-template", "--index", root,
               "--template-id", "by-lang", "--params", '{"lang": "fr"}'])
    assert rc == 0
    body = json.loads(capsys.readouterr().out.strip())
    assert body == {"query": {"term": {"lang": {"value": "fr"}}}, "size": 10}
    rc = main(["--job", "search-template", "--index", root,
               "--template-id", "by-lang",
               "--params", '{"lang": "fr", "size": 4}'])
    assert rc == 0
    hits = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    assert len(hits) == 4 and all(h["lang"] == "fr" for h in hits)

    # reindex the en slice into a new root
    dst = str(tmp_path / "idx_5g_dst")
    rc = main(["--job", "reindex", "--index", root, "--dest", dst,
               "--input", src, "--content-col", "text", "--id-col", "doc_id",
               "--meta-cols", "lang,source",
               "--body", '{"term": {"lang": {"value": "en"}}}'])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["created"] == 193

    # update-by-query: fr -> fra in place
    rc = main(["--job", "update-by-query", "--index", root, "--input", src,
               "--content-col", "text", "--id-col", "doc_id",
               "--meta-cols", "doc_id,lang,source",
               "--body", '{"term": {"lang": {"value": "fr"}}}',
               "--script", '{"lang": "\'fra\'"}'])
    assert rc == 0
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["updated"] == 82


def test_cli_aliases_snapshot_mtermvectors(spark, tmp_path, capsys):
    root = str(tmp_path / "idx_ops")
    src = os.path.join(SF_DIR, "documents.parquet")
    rc = main(
        ["--job", "build", "--input", src, "--index", root, "--content-col",
         "text", "--id-col", "doc_id", "--tokenizer", "standard",
         "--n-buckets", "4", "--ckpt-batches", "2"]
    )
    assert rc == 0
    capsys.readouterr()

    # aliases: action list applies atomically, no --index needed
    cd = str(tmp_path / "cluster")
    rc = main(["--job", "aliases", "--cluster-dir", cd, "--body",
               '[{"add": {"alias": "live", "index": "' + root + '"}}]'])
    assert rc == 0
    table = json.loads(capsys.readouterr().out.strip())
    assert table["live"][0]["index"] == root
    rc = main(["--job", "aliases", "--cluster-dir", cd])
    assert rc == 0 and "live" in json.loads(capsys.readouterr().out.strip())

    # snapshot -> list -> restore
    repo = str(tmp_path / "repo")
    rc = main(["--job", "snapshot", "--index", root, "--repo", repo,
               "--snapshot-id", "s1"])
    assert rc == 0
    man = json.loads(capsys.readouterr().out.strip())
    assert man["stats"]["n_docs"] == 500
    rc = main(["--job", "snapshots", "--repo", repo])
    assert rc == 0
    assert [m["snapshot_id"] for m in
            json.loads(capsys.readouterr().out.strip())] == ["s1"]
    dest = str(tmp_path / "idx_ops_back")
    rc = main(["--job", "restore", "--repo", repo, "--snapshot-id", "s1",
               "--dest", dest])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["version_dir"].startswith(dest)

    # mtermvectors over artificial docs
    rc = main(["--job", "mtermvectors", "--index", root,
               "--body", '{"a": "spark spark data"}'])
    assert rc == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    tf = {r["term"]: r["term_freq"] for r in rows}
    assert tf == {"spark": 2, "data": 1}

    # missing --index for an index job is a clean rc=2
    assert main(["--job", "query", "--query", "x"]) == 2


def test_cli_rank_eval_job(spark, tmp_path, capsys):
    root = str(tmp_path / "idx_re_cli")
    src = os.path.join(SF_DIR, "documents.parquet")
    rc = main(["--job", "build", "--input", src, "--index", root,
               "--content-col", "text", "--id-col", "doc_id",
               "--tokenizer", "standard", "--n-buckets", "4",
               "--ckpt-batches", "2"])
    assert rc == 0
    capsys.readouterr()
    body = json.dumps({
        "requests": [
            {"id": "q1",
             "request": {"query": {"match": {"content": "spark join window"}}},
             "ratings": [{"_id": 206, "rating": 2}]},
        ],
        "metric": {"precision": {"k": 5}},
    })
    rc = main(["--job", "rank-eval", "--index", root, "--body", body])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out["metric_score"] == 0.2  # docid 206 is the top hit on sf0.001
    assert out["details"]["q1"]["rated_in_topk"] == 1
    assert main(["--job", "rank-eval", "--index", root]) == 2


def test_cli_bulk_job(spark, tmp_path, capsys):
    root = str(tmp_path / "idx_bulk_cli")
    src = os.path.join(SF_DIR, "documents.parquet")
    rc = main(["--job", "build", "--input", src, "--index", root,
               "--content-col", "text", "--id-col", "doc_id",
               "--meta-cols", "doc_id,lang",
               "--tokenizer", "standard", "--n-buckets", "4",
               "--ckpt-batches", "2"])
    assert rc == 0
    capsys.readouterr()
    nd = "\n".join([
        json.dumps({"index": {"_id": 3}}),
        json.dumps({"text": "bulk cli fresh", "lang": "xx"}),
        json.dumps({"delete": {"_id": 5}}),
    ])
    rc = main(["--job", "bulk", "--index", root, "--content-col", "text",
               "--id-col", "doc_id", "--meta-cols", "doc_id,lang",
               "--body", nd])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["errors"] is False and len(out["items"]) == 2
    rc = main(["--job", "query", "--index", root, "--query", "bulk cli fresh",
               "-k", "1", "--fetch-meta"])
    assert rc == 0
    hit = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert hit["lang"] == "xx"
