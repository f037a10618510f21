#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB (same parquet tables registered as views),
then compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, floats rounded).

Usage:
    python tools/check_oracle.py [query_name ...] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import hashlib
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        r = round(v, 6)
        if r == int(r) and abs(r) < 1e15:
            return str(int(r))
        return f"{r:.6f}".rstrip("0").rstrip(".")
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_value(x) for x in v) + "]"
    try:  # decimal
        import decimal

        if isinstance(v, decimal.Decimal):
            return canon_value(float(v))
    except Exception:
        pass
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["|".join(canon_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def value_hash(cols, rows):
    h = hashlib.sha256()
    for line in canon_rows(cols, rows):
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entry
    from feature_extractor_mbo_lob_spark import get_spark

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = args.names or list(qs.keys())

    spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{args.sf}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"create view {t} as select * from read_parquet('{p}')")

    failures = []
    for name in names:
        if name not in qs:
            print(f"UNKNOWN {name}")
            failures.append(name)
            continue
        try:
            sdf = qs[name](spark, args.sf)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(s_rows)} (no oracle — rows-only check)")
            continue
        try:
            # Fetch via Arrow to reproduce the driver's canonicalizer exactly:
            # DuckDB sum(INTEGER) -> HUGEINT surfaces as decimal128(38,0) in
            # Arrow, which hashes differently from BIGINT. fetchall() masks
            # this by converting through Python ints.
            import pyarrow as pa

            tbl = con.execute(oracles[name]).fetch_arrow_table()
            d_cols = list(tbl.column_names)
            dec_cols = [
                n for n, t in zip(tbl.column_names, tbl.schema.types)
                if pa.types.is_decimal(t)
            ]
            d_rows = [
                tuple(row[c] for c in d_cols) for row in tbl.to_pylist()
            ]
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            continue

        problems = []
        if dec_cols:
            problems.append(
                f"decimal128 oracle columns (HUGEINT leak — add cast(... as "
                f"bigint/double)): {dec_cols}"
            )
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if not problems:
            hs, hd = value_hash(s_cols, s_rows), value_hash(d_cols, d_rows)
            if hs != hd:
                problems.append(f"value hash {hs} != {hd}")
                a, b = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
                diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
                for x, y in diffs:
                    print(f"      spark : {x[:160]}")
                    print(f"      duckdb: {y[:160]}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"ok    {name}: rows={len(s_rows)}")

    spark.stop()
    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
