"""Self-check: run every queries() entry and its DuckDB oracle twin at a
given sf dir and compare row-count + schema-less order-insensitive value
multiset (mirrors the driver's CORRECTNESS gate).

Usage: python scripts/check_oracles.py [sf_dir] [only_query_prefix]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from gocrawler_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def df_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(",".join(norm_cell(r[i]) for i in order) for r in rows)
    return [cols[i] for i in order], out


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark(cpus=8, app_name="oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and not name.startswith(only):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append((name, f"SPARK ERROR: {e}"))
            print(f"{name}: SPARK ERROR {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"{name}: rows-only, {len(srows)} rows, {time.time()-t0:.1f}s")
            if len(srows) == 0:
                failures.append((name, "0 rows (rows-only check)"))
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [c.lower() for c in res.columns]
            otypes = [str(t).upper() for t in res.types]
            orows = res.fetchall()
        except Exception as e:
            failures.append((name, f"DUCKDB ERROR: {e}"))
            print(f"{name}: DUCKDB ERROR {str(e)[:200]}")
            continue
        # the driver's value hash is TYPED: DuckDB HUGEINT (e.g. a bare
        # SUM(BIGINT)) hash-mismatches Spark BIGINT even when the values
        # stringify identically — flag it here (round-1 q05/q06 lesson)
        hugeints = [c for c, t in zip(res.columns, otypes) if "HUGEINT" in t]
        if hugeints:
            failures.append((name, f"ORACLE TYPE: HUGEINT column(s) {hugeints} — cast to BIGINT in the oracle SQL"))
            print(f"{name}: ORACLE HUGEINT {hugeints}")
            continue
        sc, sm = df_multiset([c.lower() for c in scols], srows)
        oc, om = df_multiset(ocols, orows)
        status = []
        if sc != oc:
            status.append(f"SCHEMA {sc} != {oc}")
        if len(sm) != len(om):
            status.append(f"ROWS {len(sm)} != {len(om)}")
        elif sm != om:
            diff = [(a, b) for a, b in zip(sm, om) if a != b][:3]
            status.append(f"VALUES differ e.g. {diff}")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"{name}: MISMATCH {'; '.join(status)[:400]}")
        else:
            print(f"{name}: OK {len(sm)} rows, {time.time()-t0:.1f}s")

    print(f"\n{len(failures)} failures")
    for n, msg in failures:
        print(f"  {n}: {msg[:300]}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
