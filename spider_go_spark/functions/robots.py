"""Vectorized robots.txt parsing + matching.

Implements the robots exclusion protocol (RFC 9309): user-agent **group
selection** (rules from the groups whose product token matches the
crawler's agent, case-insensitive; groups with the same matching token
merge; no matching token → the ``*`` groups), ``Allow:`` / ``Disallow:``
rules with ``*`` wildcards and ``$`` end anchors, longest-match-wins with
Allow winning length ties; no matching rule → allowed; empty Disallow →
allowed. Non-standard but ubiquitous extensions: per-group
``Crawl-delay`` (seconds, fractional allowed) and file-level ``Sitemap:``
lines (group-independent per RFC §2.3).

Reference analogue: the ``Disabled`` action check that drops messages
(/root/reference/pkg/spider/workflow.go:100-102) — generalized to per-path
rules per the north rule. Matching is vectorized: robots bodies are parsed
and compiled once per distinct (body, agent) per Arrow batch (hosts repeat
heavily in a crawl round), then applied via compiled-regex vectorized
search.
"""

from __future__ import annotations

import re
from functools import lru_cache

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _pattern_to_regex(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = [re.escape(p) for p in pattern.split("*")]
    body = ".*".join(parts)
    return re.compile("^" + body + ("$" if anchored else ""))


def _agent_token(value: str) -> str:
    """The product token of a User-agent line: the value up to any ``/``
    (version suffix), lowercased — RFC 9309 §2.2.1 matching unit."""
    return value.split("/", 1)[0].strip().lower()


@lru_cache(maxsize=4096)
def _parse_groups(
    robots_txt: str,
) -> tuple[tuple[tuple[str, ...], tuple[tuple[int, bool, str], ...], float | None], ...]:
    """Parse a robots.txt body into groups:
    ((agent_tokens, ((pattern_len, is_allow, pattern), ...), crawl_delay_s),
    ...). Patterns stay as strings here (regexes compile in the cached
    group-selection step)."""
    groups: list[tuple[list[str], list[tuple[int, bool, str]], list[float]]] = []
    current: tuple[list[str], list[tuple[int, bool, str]], list[float]] | None = None
    in_ua_block = False
    for raw in robots_txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_ua_block:  # consecutive UA lines form one group header
                current = ([], [], [])
                groups.append(current)
                in_ua_block = True
            current[0].append(_agent_token(value))
        elif field in ("allow", "disallow"):
            in_ua_block = False
            if current is not None and value:  # empty Disallow allows all
                current[1].append((len(value), field == "allow", value))
        elif field == "crawl-delay":
            in_ua_block = False
            if current is not None:
                try:
                    current[2].append(float(value))
                except ValueError:
                    pass
    return tuple(
        (tuple(uas), tuple(rules), (delays[0] if delays else None))
        for uas, rules, delays in groups
    )


def _select_groups(robots_txt: str, agent: str):
    """RFC 9309 group selection: every group naming the agent's product
    token (merged); if none and agent != '*', fall back to the '*'
    groups."""
    groups = _parse_groups(robots_txt)
    tok = _agent_token(agent)
    chosen = [g for g in groups if tok in g[0]]
    if not chosen and tok != "*":
        chosen = [g for g in groups if "*" in g[0]]
    return chosen


@lru_cache(maxsize=4096)
def parse_robots(
    robots_txt: str, agent: str = "*"
) -> tuple[tuple[int, bool, re.Pattern], ...]:
    """Compile a robots.txt body to ((pattern_len, is_allow, regex), ...)
    for the group(s) selected by ``agent``. Cached per distinct
    (body, agent)."""
    rules: list[tuple[int, bool, re.Pattern]] = []
    for _uas, group_rules, _delay in _select_groups(robots_txt, agent):
        for plen, is_allow, pattern in group_rules:
            rules.append((plen, is_allow, _pattern_to_regex(pattern)))
    rules.sort(key=lambda r: (-r[0], not r[1]))  # longest first, Allow wins ties
    return tuple(rules)


def robots_crawl_delay_ms(robots_txt: str | None, agent: str = "*") -> int | None:
    """``Crawl-delay`` of the agent's selected group, in milliseconds
    (first delay line of the first matching group wins), or None."""
    if not robots_txt:
        return None
    for _uas, _rules, delay in _select_groups(robots_txt, agent):
        if delay is not None:
            return int(delay * 1000)
    return None


def robots_sitemaps(robots_txt: str | None) -> tuple[str, ...]:
    """All ``Sitemap:`` URLs of the file — group-independent (RFC 9309
    treats them as non-group records), in file order."""
    if not robots_txt:
        return ()
    out = []
    for raw in robots_txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return tuple(out)


def sitemap_urls_col(body) -> "F.Column":
    """JVM-side twin of :func:`robots_sitemaps`: an ``array<string>`` Column
    of the ``Sitemap:`` URLs in a robots body (comment-stripped,
    case-insensitive field, space-trimmed value, file order). Pure
    codegen'd higher-order functions — at 10^8 hosts this is a map-only
    projection with no Python, so sitemap discovery over the whole policy
    table costs one scan."""
    pre = "split_part(l, '#', 1)"
    return F.expr(
        f"""filter(
              transform(split(coalesce({body}, ''), '\\n'),
                l -> CASE WHEN lower(trim(split_part({pre}, ':', 1))) = 'sitemap'
                     THEN trim(substr({pre}, instr({pre}, ':') + 1))
                     ELSE '' END),
              v -> v <> '')"""
    )


def robots_allowed_one(robots_txt: str | None, path: str, agent: str = "*") -> bool:
    if not robots_txt:
        return True
    for _, is_allow, rx in parse_robots(robots_txt, agent):
        if rx.search(path):
            return is_allow
    return True


def _match_paths(rules, grp_paths: pd.Series) -> pd.Series:
    """Longest-match-wins decision for one compiled rule set over a path
    array (rules pre-sorted longest-first, Allow before Disallow on ties)."""
    decided = pd.Series(False, index=grp_paths.index)
    allowed = pd.Series(True, index=grp_paths.index)
    for _, is_allow, rx in rules:
        hits = grp_paths.str.contains(rx) & ~decided
        if hits.any():
            allowed[hits] = is_allow
            decided |= hits
        if decided.all():
            break
    return allowed


def robots_allowed_series(
    robots_txts: pd.Series, paths: pd.Series, agent: str = "*"
) -> pd.Series:
    """Vectorized per-(robots_txt) grouping: compile once, match the whole
    group's path array per rule."""
    out = pd.Series(True, index=paths.index)
    bodies = robots_txts.fillna("")
    for body, idx in bodies.groupby(bodies).groups.items():
        if body == "":
            continue
        rules = parse_robots(body, agent)
        if not rules:
            continue
        out.loc[idx] = _match_paths(rules, paths.loc[idx].fillna("/"))
    return out


def robots_decision_frame(
    robots_txts: pd.Series, paths: pd.Series, agent: str = "*"
) -> pd.DataFrame:
    """``allowed`` + the selected group's ``Crawl-delay`` (milliseconds, 0
    when absent) in ONE vectorized pass per distinct body — the scheduler
    needs both, and a second Arrow round-trip over the whole frontier just
    to read a per-body scalar would double the only Python cost in the
    scheduling path."""
    allowed = pd.Series(True, index=paths.index)
    delay = pd.Series(0, index=paths.index, dtype="int64")
    bodies = robots_txts.fillna("")
    for body, idx in bodies.groupby(bodies).groups.items():
        if body == "":
            continue
        d = robots_crawl_delay_ms(body, agent)
        if d:
            delay.loc[idx] = d
        rules = parse_robots(body, agent)
        if not rules:
            continue
        allowed.loc[idx] = _match_paths(rules, paths.loc[idx].fillna("/"))
    return pd.DataFrame({"allowed": allowed, "delay_ms": delay})


def make_robots_allowed_udf(agent: str):
    """A pandas UDF matching under a fixed crawler agent (the agent is a
    plan-time constant — per-row agents would defeat the per-body compile
    cache)."""

    @F.pandas_udf(T.BooleanType())
    def _udf(robots_txts: pd.Series, paths: pd.Series) -> pd.Series:
        return robots_allowed_series(robots_txts, paths, agent)

    return _udf


def make_robots_decision_udf(agent: str):
    """Struct-returning pandas UDF: ``(allowed boolean, delay_ms bigint)``
    per row, under a fixed plan-time crawler agent."""

    @F.pandas_udf("allowed boolean, delay_ms bigint")
    def _udf(robots_txts: pd.Series, paths: pd.Series) -> pd.DataFrame:
        return robots_decision_frame(robots_txts, paths, agent)

    return _udf


# the default-agent UDF, kept as a module-level singleton (pre-agent callers)
robots_allowed_udf = make_robots_allowed_udf("*")
