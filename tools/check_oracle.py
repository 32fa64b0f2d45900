"""Local replica of the driver's t2 correctness gate.

Runs every catalog query on Spark AND its DuckDB oracle SQL at a given sf,
then compares row count, schema (column names), and an order-insensitive
value multiset (doubles rounded as produced). Usage:

    python tools/check_oracle.py [sf_dir] [name_substring]
"""

from __future__ import annotations

import os
import sys
import time
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # collapse -0.0 / 0.0 and FP noise surviving the query-side rounding
        return round(v + 0.0, 4)
    if hasattr(v, "timestamp"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return round(float(v), 4)
    except ImportError:
        pass
    return v


def row_key(row, cols_sorted, colpos):
    return tuple(norm(row[colpos[c]]) for c in cols_sorted)


def main() -> int:
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = argv[1] if len(argv) > 1 else ""

    # lazy (callable) oracles read the gate parquet to build their SQL —
    # pin them to THIS run's sf_dir so Spark and oracle see the same corpus
    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir

    from opentsdb_spark.catalog import CATALOG, resolve_sql
    from opentsdb_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    results: dict[str, dict] = {}
    for name, qd in CATALOG.items():
        if only and only not in name:
            continue
        t0 = time.time()
        try:
            sdf = qd.fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"SPARK ERROR: {e}"))
            results[name] = {"status": "fail", "detail": f"spark error: {e}"}
            print(f"FAIL  {name}: spark error {e}")
            continue
        try:
            sql = resolve_sql(qd)  # lazy oracles may read the gate parquet
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE RESOLVE ERROR: {e}"))
            results[name] = {"status": "fail", "detail": f"oracle resolve error: {e}"}
            print(f"FAIL  {name}: oracle resolve error {e}")
            continue
        if sql is None:
            results[name] = {"status": "rows_only", "rows": len(srows),
                             "sec": round(time.time() - t0, 2)}
            print(f"ok    {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(sql)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append((name, f"ORACLE ERROR: {e}"))
            results[name] = {"status": "fail", "detail": f"oracle error: {e}"}
            print(f"FAIL  {name}: oracle error {e}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"SCHEMA {sorted(scols)} vs {sorted(ocols)}"))
            results[name] = {"status": "fail", "detail": "schema mismatch"}
            print(f"FAIL  {name}: schema {sorted(scols)} vs {sorted(ocols)}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"ROWS {len(srows)} vs {len(orows)}"))
            results[name] = {"status": "fail", "detail": f"rowcount {len(srows)} vs {len(orows)}"}
            print(f"FAIL  {name}: rowcount {len(srows)} vs {len(orows)}")
            continue
        cs = sorted(scols)
        spos = {c: scols.index(c) for c in cs}
        opos = {c: ocols.index(c) for c in cs}
        smul = Counter(row_key(r, cs, spos) for r in srows)
        omul = Counter(row_key(r, cs, opos) for r in orows)
        if smul != omul:
            diff_s = list((smul - omul).items())[:3]
            diff_o = list((omul - smul).items())[:3]
            failures.append((name, f"VALUES spark-only={diff_s} oracle-only={diff_o}"))
            results[name] = {"status": "fail", "detail": "value multiset mismatch"}
            print(f"FAIL  {name}: values differ; spark-only={diff_s} oracle-only={diff_o}")
            continue
        results[name] = {"status": "match", "rows": len(srows),
                         "sec": round(time.time() - t0, 2)}
        print(f"ok    {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{len(failures)} failures / {len([n for n in CATALOG if not only or only in n])} queries")
    if json_out:
        import json

        summary = {
            "sf_dir": sf_dir,
            "total": len(results),
            "match": sum(1 for r in results.values() if r["status"] == "match"),
            "rows_only": sum(1 for r in results.values() if r["status"] == "rows_only"),
            "fail": len(failures),
            "queries": results,
        }
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
