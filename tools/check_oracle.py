"""Local replica of the driver's correctness gate: run each queries() entry
on Spark at sf0.01 and its oracle_sql() on DuckDB, compare row count, column
names, and order-insensitive values. Usage:

    python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, bool):
        return bool(v)
    return v


def rows_key(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def main():
    import duckdb

    import __spark_entry__ as E
    from searchengines_spark.session import get_spark

    only = set(sys.argv[1:])
    spark = get_spark("check-oracle", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # queries_all = driver registry (<=50, newest-first) + demoted baseline
    # twins — the local gate checks the full surface every run
    qs = E.queries_all() if hasattr(E, "queries_all") else E.queries()
    osql = E.oracle_sql()
    assert len(E.queries()) <= 50, "driver registry must stay <=50 entries"
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = [c.lower() for c in sdf.columns]
            srows = [[r[i] for i in range(len(scols))] for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in osql:
            print(f"WEAK {name}: no oracle sql; spark rows={len(srows)}")
            continue
        try:
            res = con.execute(osql[name])
            dcols = [d[0].lower() for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {ex}")
            failures += 1
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_count = len(srows) == len(drows)
        ok_vals = ok_cols and ok_count and rows_key(srows, scols) == rows_key(drows, dcols)
        if ok_vals:
            print(f"PASS {name}: rows={len(srows)}")
        else:
            failures += 1
            print(f"FAIL {name}: cols {scols} vs {dcols}; rows {len(srows)} vs {len(drows)}")
            if ok_cols and ok_count:
                a, b = rows_key(srows, scols), rows_key(drows, dcols)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
                for x, y in diffs:
                    print(f"   spark={x}\n   duck ={y}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
