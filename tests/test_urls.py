import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from spider_go_spark.functions.urls import (
    bloom_hashes,
    canonicalize_one,
    canonicalize_series,
    host_of_one,
    path_of_series,
)

CASES = [
    ("http://example.com", "http://example.com/"),
    ("HTTP://Example.COM/", "http://example.com/"),
    ("http://example.com:80/a", "http://example.com/a"),
    ("https://example.com:443/a", "https://example.com/a"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("http://example.com/a#frag", "http://example.com/a"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?", "http://example.com/a"),
    ("http://example.com/a/./b", "http://example.com/a/b"),
    ("http://example.com/a/../b", "http://example.com/b"),
    ("http://example.com//a//b/", "http://example.com/a/b/"),
    ("http://example.com./a", "http://example.com/a"),
    ("  http://example.com/a  ", "http://example.com/a"),
    ("http://user@example.com/a", "http://user@example.com/a"),
    ("not a url", None),
    ("ftp//missing-scheme", None),
    ("", None),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_canonicalize_cases(raw, expected):
    assert canonicalize_one(raw) == expected


def test_canonicalize_vectorized_matches_single():
    raws = [c[0] for c in CASES]
    vec = canonicalize_series(pd.Series(raws)).tolist()
    single = [canonicalize_one(r) for r in raws]
    assert vec == single


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=80))
@settings(max_examples=200, deadline=None)
def test_canonicalize_idempotent(s):
    url = "http://ex.com/" + s.replace("#", "").replace("?", "")
    c1 = canonicalize_one(url)
    if c1 is not None:
        assert canonicalize_one(c1) == c1


def test_host_and_path():
    assert host_of_one("http://a.b.c:8080/x/y") == "a.b.c"
    assert host_of_one("http://u@a.b/x") == "a.b"
    assert path_of_series(pd.Series(["http://a.b/x/y?q=1", "http://a.b"])).tolist() == [
        "/x/y?q=1",
        "/",
    ]


def test_bloom_hashes_stable_and_in_range():
    h1 = bloom_hashes(pd.Series(["u1", "u2"]).to_numpy(object), 1024, 5)
    h2 = bloom_hashes(pd.Series(["u1", "u2"]).to_numpy(object), 1024, 5)
    assert (h1 == h2).all()
    assert h1.shape == (2, 5)
    assert (h1 >= 0).all() and (h1 < 1024).all()
    assert (h1[0] != h1[1]).any()


PSL_CASES = {
    # plain nested suffix beats shorter ('example.test' over 'test')
    "s3.h7.example.test": "h7.example.test",
    "h7.example.test": "h7.example.test",
    "example.test": None,  # a public suffix itself has no registrable domain
    "foo.test": "foo.test",
    # private-domain entries (github.io shape)
    "a.x.github.io": "x.github.io",
    "github.io": None,
    # wildcard *.ck: every <label>.ck is a suffix
    "a.foo.bar.ck": "foo.bar.ck",
    "bar.ck": None,
    # exception !www.ck prevails over the wildcard
    "www.ck": "www.ck",
    "sub.www.ck": "www.ck",
    # implicit '*' fallback for unknown TLDs
    "b.a.unknowntld": "a.unknowntld",
    "single": None,
}


def test_registrable_domain_python_twin():
    from spider_go_spark.functions.urls import registrable_domain_one

    for host, want in PSL_CASES.items():
        assert registrable_domain_one(host) == want, host


def test_registrable_domain_spark_matches_twin(spark):
    from pyspark.sql import Row

    from spider_go_spark.functions.urls import registrable_domain

    df = spark.createDataFrame([Row(host=h) for h in PSL_CASES])
    got = {
        r["host"]: r["rd"]
        for r in df.select("host", registrable_domain("host").alias("rd")).collect()
    }
    for host, want in PSL_CASES.items():
        assert got[host] == want, host


def test_registrable_domain_duckdb_matches_twin():
    import duckdb

    from spider_go_spark.functions.urls import registrable_domain_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE hh(host VARCHAR)")
    for h in PSL_CASES:
        con.execute("INSERT INTO hh VALUES (?)", [h])
    got = dict(con.execute(
        f"SELECT host, {registrable_domain_sql('host')} FROM hh").fetchall())
    for host, want in PSL_CASES.items():
        assert got[host] == want, host


def test_registrable_domain_fuzz_tri_engine(spark):
    """300 random hosts over the rule alphabet (labels that do and don't
    collide with every rule shape) — the CASE cascade and the recursive
    twin must agree everywhere, including hosts that ARE suffixes, deep
    subdomain towers, and single labels."""
    import random

    import duckdb
    from pyspark.sql import Row

    from spider_go_spark.functions.urls import (
        registrable_domain,
        registrable_domain_one,
        registrable_domain_sql,
    )

    rng = random.Random(23)
    labels = ["a", "b", "www", "h7", "blog", "example", "github", "co", "ck",
              "uk", "io", "com", "test", "fake", "x9", "deep"]
    hosts = list({
        ".".join(rng.choice(labels) for _ in range(rng.randint(1, 5)))
        for _ in range(300)
    })
    want = {h: registrable_domain_one(h) for h in hosts}

    con = duckdb.connect()
    con.execute("CREATE TABLE hh(host VARCHAR)")
    for h in hosts:
        con.execute("INSERT INTO hh VALUES (?)", [h])
    got_d = dict(con.execute(
        f"SELECT host, {registrable_domain_sql('host')} FROM hh").fetchall())

    df = spark.createDataFrame([Row(host=h) for h in hosts])
    got_s = {r["host"]: r["rd"]
             for r in df.select("host", registrable_domain("host").alias("rd")).collect()}

    for h in hosts:
        assert want[h] == got_d[h] == got_s[h], (h, want[h], got_d[h], got_s[h])
