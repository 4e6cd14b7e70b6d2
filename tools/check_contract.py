"""Mimic the driver's correctness gate locally: run every ``queries()`` entry on
Spark and its ``oracle_sql()`` on DuckDB at the given sf dir, compare row count,
column names, and an order-insensitive value hash (values stringified with stable
formatting, rows sorted). Usage: python tools/check_contract.py [sf_dir] [name...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(val) -> str:
    import datetime
    import math

    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(round(val, 9))
    if isinstance(val, datetime.datetime):
        return val.strftime("%Y-%m-%d %H:%M:%S")
    return str(val)


def table_hash(cols: list[str], rows: list[tuple]) -> tuple[str, int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]
    return h, len(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entry
    from es_indexer_spark.session import get_spark

    spark = get_spark("contract-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, os_ = entry.queries(), entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if name not in os_:
                print(f"  {name:28s} rows-only: {len(srows)} rows, cols={scols}")
                continue
            res = con.sql(os_[name])
            ocols = res.columns
            orows = res.fetchall()
            sh, sn = table_hash(scols, srows)
            oh, on = table_hash(ocols, orows)
            ok = (sorted(scols) == sorted(ocols)) and sh == oh and sn == on
            status = "OK " if ok else "FAIL"
            print(f"  {name:28s} {status} spark={sn}/{sh} duck={on}/{oh}")
            if not ok:
                failures += 1
                if sorted(scols) != sorted(ocols):
                    print(f"    cols spark={sorted(scols)} duck={sorted(ocols)}")
                else:
                    sset = {tuple(canon(v) for v in r) for r in srows}
                    oset = {tuple(canon(v) for v in r) for r in orows}
                    so = list(sset - oset)[:3]
                    os2 = list(oset - sset)[:3]
                    print(f"    spark-only: {so}\n    duck-only:  {os2}")
        except Exception:
            failures += 1
            print(f"  {name:28s} ERROR")
            traceback.print_exc()
    spark.stop()
    print(f"{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
