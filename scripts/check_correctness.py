#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry and its oracle_sql() twin at a given SF,
compare row count, column names, and an order-insensitive value hash.

Usage: python scripts/check_correctness.py [sf_dir] [--only q1,q2,...]
"""

from __future__ import annotations

import hashlib
import sys

sys.path.insert(0, ".")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from paper_layout_parser_spark.session import get_spark  # noqa: E402

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.astype(str)
        elif str(col.dtype).startswith(("float", "Float")):
            df[c] = col.map(lambda v: repr(float(v)) if pd.notna(v) else "<NA>")
        else:
            df[c] = col.astype(str)
    rows = sorted(df.apply(lambda r: "\x1f".join(r.values), axis=1).tolist())
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]


def main() -> int:
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    # env-tunable so the gate can be replayed at odd parallelism — results
    # must be partition-count-invariant or the bit-identity claim is hollow
    import os

    cores = int(os.environ.get("PLP_GATE_CORES", "8"))
    parts = int(os.environ.get("PLP_GATE_PARTITIONS", "16"))
    spark = get_spark(master=f"local[{cores}]", shuffle_partitions=parts)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:20s} rows-only: {len(sdf)} rows")
            continue
        odf = con.sql(oracles[name]).df()
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(odf)
        status = "OK" if ok_hash else "FAIL"
        if not ok_hash:
            failures += 1
        print(f"{name:20s} {status}  spark={len(sdf)} duck={len(odf)} "
              f"cols={'=' if ok_cols else sorted(sdf.columns)!r}")
        if not ok_hash and ok_rows and ok_cols:
            merged = None
            key_cols = [c for c in ("url", "doc_id", "id_a", "query_id",
                                    "figure_type", "class_name", "item_id")
                        if c in sdf.columns]
            s2 = sdf.sort_values(list(sdf.columns)).reset_index(drop=True)
            o2 = odf[sdf.columns].sort_values(list(sdf.columns)).reset_index(drop=True)
            neq = (s2.fillna("<N>").astype(str) != o2.fillna("<N>").astype(str)).any(axis=1)
            print(f"  first diffs ({int(neq.sum())} rows):")
            print(pd.concat([s2[neq].head(3), o2[neq].head(3)]).to_string())
    spark.stop()
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
