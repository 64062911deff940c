import pandas as pd

from spider_go_spark.functions.robots import (
    parse_robots,
    robots_allowed_one,
    robots_allowed_series,
    robots_crawl_delay_ms,
    robots_decision_frame,
    robots_sitemaps,
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


# --- RFC 9309 user-agent group selection -----------------------------------

AGENT_ROBOTS = """User-agent: SpiderBot
Disallow: /bot-only
Crawl-delay: 2.5

User-agent: *
Disallow: /everyone
Crawl-delay: 1

User-agent: spiderbot
Disallow: /merged

Sitemap: https://example.test/sitemap.xml
Sitemap: https://example.test/sitemap2.xml
"""


def test_named_agent_selects_its_groups_only():
    # SpiderBot gets BOTH groups naming its token (case-insensitive, merged)
    assert robots_allowed_one(AGENT_ROBOTS, "/bot-only", "SpiderBot") is False
    assert robots_allowed_one(AGENT_ROBOTS, "/merged", "SpiderBot") is False
    # ...and does NOT inherit the * group once a named group matched
    assert robots_allowed_one(AGENT_ROBOTS, "/everyone", "SpiderBot") is True


def test_version_suffix_and_case_insensitive_token():
    assert robots_allowed_one(AGENT_ROBOTS, "/bot-only", "spiderbot/1.0") is False
    assert robots_allowed_one(AGENT_ROBOTS, "/everyone", "SPIDERBOT/2.1") is True


def test_unknown_agent_falls_back_to_wildcard():
    assert robots_allowed_one(AGENT_ROBOTS, "/everyone", "otherbot") is False
    assert robots_allowed_one(AGENT_ROBOTS, "/bot-only", "otherbot") is True


def test_wildcard_agent_sees_only_wildcard_groups():
    assert robots_allowed_one(AGENT_ROBOTS, "/everyone") is False
    assert robots_allowed_one(AGENT_ROBOTS, "/bot-only") is True


def test_crawl_delay_per_group():
    assert robots_crawl_delay_ms(AGENT_ROBOTS, "SpiderBot") == 2500
    assert robots_crawl_delay_ms(AGENT_ROBOTS, "*") == 1000
    assert robots_crawl_delay_ms(AGENT_ROBOTS, "otherbot") == 1000  # * fallback
    assert robots_crawl_delay_ms("User-agent: *\nDisallow: /x\n") is None
    assert robots_crawl_delay_ms(None) is None
    # malformed delay values are ignored, not fatal
    assert robots_crawl_delay_ms("User-agent: *\nCrawl-delay: soon\n") is None


def test_sitemaps_are_group_independent():
    assert robots_sitemaps(AGENT_ROBOTS) == (
        "https://example.test/sitemap.xml",
        "https://example.test/sitemap2.xml",
    )
    assert robots_sitemaps(None) == ()
    assert robots_sitemaps("User-agent: *\nDisallow: /\n") == ()


def test_decision_frame_matches_scalar_paths():
    robots = pd.Series([AGENT_ROBOTS, AGENT_ROBOTS, None, ROBOTS])
    paths = pd.Series(["/bot-only", "/everyone", "/x", "/private"])
    frame = robots_decision_frame(robots, paths, "SpiderBot")
    assert frame["allowed"].tolist() == [
        robots_allowed_one(r, p, "SpiderBot") for r, p in zip(robots, paths)
    ]
    assert frame["delay_ms"].tolist() == [2500, 2500, 0, 0]


def test_agent_groups_do_not_leak_between_cached_parses():
    # same body parsed under two agents must give independent rule sets
    assert parse_robots(AGENT_ROBOTS, "SpiderBot") != parse_robots(AGENT_ROBOTS, "*")
