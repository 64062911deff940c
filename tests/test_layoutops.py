"""Pure-Python replays of the storage-layout operators
(queries/layoutops.py). Cross-engine value parity vs DuckDB is the driver
gate's job; these pin the Morton-interleave bit math and the min/max
file-skipping rule against an independent Python evaluator, plus the
invariants that make the audit trustworthy (no false skips: every file
containing a matching row is scanned)."""

from collections import defaultdict
from datetime import date

from spider_go_spark.queries import layoutops as L

SF = "/root/testdata/sf0.001"


def _pyz(x: int, y: int) -> int:
    z = 0
    for i in range(L.ZBITS):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _rows(spark):
    day0 = date(1995, 1, 1)
    out = []
    for r in spark.read.parquet(f"{SF}/orders.parquet").collect():
        d = r["o_orderdate"]
        day = (date(d.year, d.month, d.day) - day0).days
        out.append((r["o_orderkey"], r["o_custkey"], day))
    return out


def test_zorder_key_sample_matches_python(spark):
    rows = _rows(spark)
    expect = sorted(
        ((ok, c, day, _pyz(c, day)) for ok, c, day in rows),
        key=lambda t: (t[3], t[0]),
    )[:64]
    got = [
        (r["o_orderkey"], r["cust"], r["day"], r["zkey"])
        for r in L.zorder_key_sample(spark, SF).collect()
    ]
    assert sorted(got, key=lambda t: (t[3], t[0])) == expect


def test_zkey_deinterleaves_back():
    # the Morton key is a bijection on (x, y) ∈ [0, 2^ZBITS)^2
    for x, y in [(0, 0), (1, 0), (0, 1), (1499, 2404), (65535, 65535), (123, 45)]:
        z = _pyz(x, y)
        rx = sum(((z >> (2 * i)) & 1) << i for i in range(L.ZBITS))
        ry = sum(((z >> (2 * i + 1)) & 1) << i for i in range(L.ZBITS))
        assert (rx, ry) == (x, y)


def test_minmax_pruning_audit_matches_python(spark):
    rows = _rows(spark)
    files = defaultdict(list)  # (layout, file_id) -> [(cust, day)]
    for ok, c, day in rows:
        files[("natural", ok // L.FILE_SPAN)].append((c, day))
        files[("zorder", _pyz(c, day) >> L.ZCELL_SHIFT)].append((c, day))
    preds = {
        "cust_range": (0, L.CUST_LO, L.CUST_HI),
        "day_range": (1, L.DAY_LO, L.DAY_HI),
    }
    rows_cd = [(c, day) for _, c, day in rows]
    expect = {}
    for pname, (ix, lo, hi) in preds.items():
        matched = sum(lo <= t[ix] <= hi for t in rows_cd)
        for layout in ("natural", "zorder"):
            fs = [v for (lay, _), v in files.items() if lay == layout]
            scanned = [v for v in fs if min(t[ix] for t in v) <= hi and max(t[ix] for t in v) >= lo]
            expect[(layout, pname)] = (
                len(fs),
                len(scanned),
                sum(len(v) for v in scanned),
                matched,
                1000 * (len(fs) - len(scanned)) // len(fs),
            )
    got = {
        (r["layout"], r["predicate"]): (
            r["n_files"], r["files_scanned"], r["rows_scanned"],
            r["rows_matched"], r["skip_pm"],
        )
        for r in L.minmax_pruning_audit(spark, SF).collect()
    }
    assert got == expect
    # no false skips: scanned rows always cover every matching row
    for (layout, pname), (_, _, rows_scanned, matched, _) in got.items():
        assert rows_scanned >= matched, (layout, pname)


def test_write_zordered_improves_skipping(spark, tmp_path):
    """The real write path: z-ordered parquet must yield strictly better
    file-skipping than a natural write for range predicates on BOTH
    clustered dimensions, with identical content."""
    from pyspark.sql import functions as F

    from spider_go_spark.queries.layoutops import (
        _dims,
        file_minmax_stats,
        write_zordered,
    )

    # sf0.01 and 32 files: the z-curve needs enough range splits to cut
    # BOTH dimensions (log2(files) bits deep, alternating dims)
    d = _dims(spark, "/root/testdata/sf0.01").select("o_orderkey", "cust", "day")
    nat, zo = str(tmp_path / "nat"), str(tmp_path / "zo")
    d.orderBy("o_orderkey").repartitionByRange(32, "o_orderkey").write.parquet(nat)
    write_zordered(d, zo, "cust", "day", n_files=32)

    a = spark.read.parquet(nat)
    b = spark.read.parquet(zo)
    key = lambda r: (r["o_orderkey"], r["cust"], r["day"])
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))

    def skipped(path, col, lo, hi):
        stats = file_minmax_stats(spark.read.parquet(path), [col]).collect()
        return sum(r[f"{col}_max"] < lo or r[f"{col}_min"] > hi for r in stats), len(stats)

    for col, lo, hi in (("cust", 100, 180), ("day", 300, 400)):
        ns, nf = skipped(nat, col, lo, hi)
        zs, zf = skipped(zo, col, lo, hi)
        assert nf == zf == 32
        assert zs > ns, (col, ns, zs)  # z-layout skips strictly more files
