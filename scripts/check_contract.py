"""Mimic the grading driver: run every __spark_entry__ query on Spark and
its oracle on DuckDB at a given sf, compare row count + column names +
order-insensitive values. Usage: python scripts/check_contract.py [sf_dir]."""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from scalable_blocking_for_privacy_preserving_record_linkage_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm_val(v):
        if isinstance(v, float):
            return f"{v:.9g}"
        return str(v)

    out = df.map(norm_val)
    return out.sort_values(by=list(out.columns)).reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    spark = get_spark(master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    # the driver grades queries(); the extra_* window gets the identical
    # compare here (and in tests/test_rel_parity.py)
    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    oracles = {**entrymod.oracle_sql(), **entrymod.extra_oracle_sql()}
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark error: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s, rows-only)")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb error: {ex}")
            failures += 1
            continue
        scols, ocols = sorted(sdf.columns), sorted(odf.columns)
        if scols != ocols:
            print(f"FAIL  {name}: columns {scols} vs {ocols}")
            failures += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: rows {len(sdf)} vs {len(odf)}")
            failures += 1
            continue
        a, b = normalize(sdf), normalize(odf)
        if not a.equals(b):
            diff = (a != b).any(axis=1)
            print(f"FAIL  {name}: {int(diff.sum())}/{len(a)} differing rows; first:")
            idx = diff.idxmax()
            print("  spark:", a.loc[idx].to_dict())
            print("  duck :", b.loc[idx].to_dict())
            failures += 1
            continue
        print(f"OK    {name}: {len(sdf)} rows match ({time.time()-t0:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
