"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at the given sf dir, then compares row count, column names/sorted order, and
an order-insensitive value hash (rows sorted, columns sorted by name, values
stringified with float rounding already applied inside the queries).

Usage: python tools/check_driver_contract.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")


def canon(v):
    if isinstance(v, float):
        # queries round floats already; normalize -0.0 and format
        if v == 0:
            v = 0.0
        return f"{v:.10g}"
    if hasattr(v, "isoformat"):
        s = v.isoformat()
        return s.replace("+00:00", "")
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import __spark_entry__ as e
    from search_engine_spark.session import get_spark

    spark = get_spark(app_name="contract-check")
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        try:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
        except Exception:
            pass

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            scols = df.columns
            srows = [tuple(r) for r in df.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            failures.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"rows-only {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            failures.append(name)
            continue
        ok_rows = len(srows) == len(orows)
        ok_cols = sorted(scols) == sorted(ocols)
        sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
        ok_hash = sh == oh
        status = "OK  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(f"{status} {name}: rows {len(srows)}/{len(orows)} cols={ok_cols} hash {sh}/{oh} ({time.time()-t0:.1f}s)")
        if status == "FAIL":
            failures.append(name)
            if ok_cols and ok_rows:
                order = sorted(range(len(scols)), key=lambda i: scols[i])
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                sset = sorted("|".join(canon(r[i]) for i in order) for r in srows)
                oset = sorted("|".join(canon(r[i]) for i in oorder) for r in orows)
                diffs = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
                for a, b in diffs:
                    print(f"    spark:  {a[:160]}")
                    print(f"    oracle: {b[:160]}")
    spark.stop()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all green")


if __name__ == "__main__":
    main()
