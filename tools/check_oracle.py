"""Local replica of the driver's correctness gate: run each
``queries()[name]`` on Spark and ``oracle_sql()[name]`` on DuckDB at
sf0.01, compare row-count, schema (column names), and order-insensitive
values.

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("CHECK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = {}
    for r in rows:
        key = tuple(_norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main() -> int:
    import __spark_entry__ as entrymod
    from publicationsretriever_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    wanted = sys.argv[1:] or list(qs)
    failures = 0
    for name in wanted:
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: no oracle; spark rows={len(srows)}")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        problems = []
        if sorted(scols) != sorted(dcols):
            problems.append(f"schema: spark={sorted(scols)} duckdb={sorted(dcols)}")
        if len(srows) != len(drows):
            problems.append(f"rowcount: spark={len(srows)} duckdb={len(drows)}")
        if not problems:
            s_set = _rows_to_set(scols, srows)
            d_set = _rows_to_set(dcols, drows)
            if s_set != d_set:
                only_s = [k for k in s_set if s_set[k] != d_set.get(k)][:3]
                only_d = [k for k in d_set if d_set[k] != s_set.get(k)][:3]
                problems.append(f"values: spark-only={only_s} duckdb-only={only_d}")
        if problems:
            print(f"FAIL  {name}: " + " | ".join(problems))
            failures += 1
        else:
            print(f"OK    {name}: {len(srows)} rows match")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
