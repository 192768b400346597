"""Local replica of the driver's correctness gate: for every queries() entry
with an oracle_sql(), run both at the given sf and compare row count, column
names, and order-insensitive values (rounded floats).

Usage: python tools/check_driver_contract.py [sf_dir] [entry_name ...]
(entry names filter the run to a subset — substring match)
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, ".")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def norm_rows(cols, rows):
    out = sorted(",".join(norm_cell(v) for v in r) for r in rows)
    return out


def main():
    import __spark_entry__ as entrymod
    from xapian_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        try:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
            )
        except Exception:
            pass

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = sys.argv[2:]
    if only:
        qs = {k: v for k, v in qs.items() if any(pat in k for pat in only)}
    n_pass = n_fail = 0
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = [c.lower() for c in sdf.columns]
            srows = [[r[c] for c in sdf.columns] for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows-only {name}: {len(srows)} rows")
            continue
        try:
            res = con.sql(oracles[name])
            ocols = [c.lower() for c in res.columns]
            orows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if scols != ocols:
            print(f"FAIL {name}: columns {scols} vs {ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            n_fail += 1
            continue
        a, b = norm_rows(scols, srows), norm_rows(ocols, orows)
        if a != b:
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"FAIL {name}: value mismatch, e.g. {diff}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(srows)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
