import pandas as pd

from spider_go_spark.functions.robots import (
    parse_robots,
    robots_allowed_one,
    robots_allowed_series,
)

ROBOTS = """# test robots
User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /*.pdf$
Disallow:

User-agent: otherbot
Disallow: /
"""


def test_basic_rules():
    assert robots_allowed_one(ROBOTS, "/") is True
    assert robots_allowed_one(ROBOTS, "/public/x") is True
    assert robots_allowed_one(ROBOTS, "/private") is False
    assert robots_allowed_one(ROBOTS, "/private/x") is False
    assert robots_allowed_one(ROBOTS, "/private/ok") is True
    assert robots_allowed_one(ROBOTS, "/private/ok/deeper") is True


def test_wildcard_and_anchor():
    assert robots_allowed_one(ROBOTS, "/doc.pdf") is False
    assert robots_allowed_one(ROBOTS, "/a/b/doc.pdf") is False
    assert robots_allowed_one(ROBOTS, "/doc.pdfx") is True


def test_other_agent_group_ignored():
    # the otherbot group's Disallow: / must not apply to us (*)
    assert robots_allowed_one(ROBOTS, "/anything") is True


def test_empty_and_none():
    assert robots_allowed_one(None, "/x") is True
    assert robots_allowed_one("", "/x") is True
    assert robots_allowed_one("User-agent: *\nDisallow:\n", "/x") is True


def test_disallow_all():
    r = "User-agent: *\nDisallow: /\n"
    assert robots_allowed_one(r, "/") is False
    assert robots_allowed_one(r, "/any") is False


def test_vectorized_matches_single():
    robots = pd.Series([ROBOTS, ROBOTS, "", None, "User-agent: *\nDisallow: /\n"])
    paths = pd.Series(["/private/x", "/public", "/a", "/b", "/c"])
    vec = robots_allowed_series(robots, paths).tolist()
    single = [robots_allowed_one(r, p) for r, p in zip(robots, paths)]
    assert vec == single == [False, True, True, True, False]


def test_parse_cached_ordering():
    rules = parse_robots(ROBOTS)
    lengths = [r[0] for r in rules]
    assert lengths == sorted(lengths, reverse=True)
