"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() twin on DuckDB, compare row count, schema
width, and order-insensitive values. Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: round(v, 6) if isinstance(v, float) else v)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def values_equal(a, b) -> bool:
    # Representation-strict, mirroring the driver's value hash: a DuckDB
    # HUGEINT rendered as float64 (3.0) must NOT match Spark's bigint (3),
    # even though they're numerically equal — that divergence produced a
    # false local "OK" in round 1 (VERDICT r1 "What's wrong" #1).
    if isinstance(a, float) != isinstance(b, float):
        return False
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b  # both already rounded to 6dp in normalize()
    return type(a) == type(b) and a == b


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str:
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"SCHEMA {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWS {len(spark_pdf)} vs {len(duck_pdf)}"
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    for c in a.columns:
        ka, kb = a[c].dtype.kind, b[c].dtype.kind
        if ka != kb:
            return f"DTYPE col={c}: {a[c].dtype} vs {b[c].dtype}"
        # vectorized fast paths (the per-cell loop took minutes on sf1
        # results with long chunk texts). Typed numeric columns can't mix
        # int/float within the column (dtype is uniform and kinds already
        # match), so C-speed equality is exactly the strict semantics;
        # float uses equal_nan. Object columns CAN mix (3.0 vs 3 inside an
        # object cell), so they keep the strict per-cell check.
        if ka in "iub" and a[c].equals(b[c]):
            continue
        if ka == "f":
            import numpy as np
            if np.array_equal(a[c].to_numpy(), b[c].to_numpy(),
                              equal_nan=True):
                continue
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not values_equal(x, y):
                return f"VALUE col={c} row={i}: {x!r} vs {y!r}"
    return "OK"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entrymod
    from fetcho_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"{name:24s} SPARK-ERROR {str(e).splitlines()[0][:140]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"{name:24s} rows-only ({len(spdf)})")
            continue
        try:
            dpdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"{name:24s} DUCK-ERROR {str(e).splitlines()[0][:140]}")
            failures += 1
            continue
        verdict = compare(name, spdf, dpdf)
        print(f"{name:24s} {verdict}" + ("" if verdict == "OK" else "  <<<"))
        if verdict != "OK":
            failures += 1
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
