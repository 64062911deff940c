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
