"""Local approximation of the driver's correctness gate.

Runs every entry of __spark_entry__.queries() on Spark and its
oracle_sql() twin on DuckDB at sf0.01, compares row count, sorted column
names, and an order-insensitive multiset hash of normalized values.

Usage: python tools/parity_check.py [name ...]
       python tools/parity_check.py --sample K --seed R [--cap N]

``--sample K --seed R`` draws a deterministic K-query sample of the TAIL —
the registry entries past the driver's 50-slot cap (cost-ordered exactly
like __spark_entry__.queries(), so the tail is precisely the set the
driver never re-checks). Seeding by round number gives each round a
different-but-reproducible rotation through the expensive gates; the full
173-query sweep stays available by passing no arguments. ``--cap``
overrides the assumed driver cap (default 50).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SF_DIR = "/root/testdata/sf0.01"


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # strict: bit-exact float parity required
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def df_hash(pdf) -> tuple[int, list[str], str]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = sorted(
        "|".join(norm_cell(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    h = hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]
    return len(pdf), cols, h


DRIVER_CAP = 50  # the driver's correctness pass runs only this many gates


def _parse_args(argv: list[str]) -> tuple[list[str], int | None, int, int]:
    names, sample, seed, cap = [], None, 0, DRIVER_CAP
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--sample":
            sample, i = int(argv[i + 1]), i + 2
        elif a == "--seed":
            seed, i = int(argv[i + 1]), i + 2
        elif a == "--cap":
            cap, i = int(argv[i + 1]), i + 2
        else:
            names.append(a)
            i += 1
    return names, sample, seed, cap


def main(argv: list[str]) -> int:
    import __spark_entry__ as entry_mod
    from spider_go_spark.session import get_spark

    names, sample, seed, cap = _parse_args(argv)

    spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    if sample is not None:
        import random

        tail = list(qs)[cap:]  # cost-ordered: exactly the driver-uncovered set
        targets = sorted(random.Random(seed).sample(tail, min(sample, len(tail))))
        print(f"sampled {len(targets)} of {len(tail)} tail gates (seed={seed}, cap={cap})")
    else:
        targets = names or list(qs)
    n_fail = 0
    for name in targets:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR).toPandas()
            s_n, s_cols, s_h = df_hash(sdf)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={s_n} (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            ddf = con.execute(oracles[name]).fetchdf()
            d_n, d_cols, d_h = df_hash(ddf)
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        ok = (s_n, s_cols, s_h) == (d_n, d_cols, d_h)
        if ok:
            print(f"PASS {name}: rows={s_n} hash={s_h} [{time.time()-t0:.1f}s]")
        else:
            n_fail += 1
            print(f"FAIL {name}: spark(rows={s_n},cols={s_cols},h={s_h}) vs duckdb(rows={d_n},cols={d_cols},h={d_h})")
            if s_cols == d_cols and s_n and d_n:
                merged = sdf[sorted(sdf.columns)].copy()
                print("  spark sample:", merged.head(3).to_dict("records"))
                print("  duck  sample:", ddf[sorted(ddf.columns)].head(3).to_dict("records"))
    print(f"\n{len(targets) - n_fail}/{len(targets)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
