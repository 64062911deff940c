"""Vectorized robots.txt parsing + matching.

Implements the longest-match-wins subset of the robots exclusion protocol
(RFC 9309): ``User-agent: *`` groups, ``Allow:`` / ``Disallow:`` rules with
``*`` wildcards and ``$`` end anchors; the longest matching pattern decides,
Allow wins length ties; no matching rule → allowed; empty Disallow → allowed.

Reference analogue: the ``Disabled`` action check that drops messages
(/root/reference/pkg/spider/workflow.go:100-102) — generalized to per-path
rules per the north rule. Matching is vectorized: robots bodies are parsed
and compiled once per distinct body per Arrow batch (hosts repeat heavily in
a crawl round), then applied via compiled-regex vectorized search.
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


@lru_cache(maxsize=4096)
def parse_robots(robots_txt: str) -> tuple[tuple[int, bool, re.Pattern], ...]:
    """Compile a robots.txt body to ((pattern_len, is_allow, regex), ...) for
    the ``*`` user-agent group. Cached per distinct body."""
    rules: list[tuple[int, bool, re.Pattern]] = []
    current_uas: list[str] = []
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
                current_uas = []
                in_ua_block = True
            current_uas.append(value)
        elif field in ("allow", "disallow"):
            in_ua_block = False
            if "*" in current_uas and value:  # empty Disallow allows everything
                rules.append((len(value), field == "allow", _pattern_to_regex(value)))
    rules.sort(key=lambda r: (-r[0], not r[1]))  # longest first, Allow wins ties
    return tuple(rules)


def robots_allowed_one(robots_txt: str | None, path: str) -> bool:
    if not robots_txt:
        return True
    for _, is_allow, rx in parse_robots(robots_txt):
        if rx.search(path):
            return is_allow
    return True


def robots_allowed_series(robots_txts: pd.Series, paths: pd.Series) -> pd.Series:
    """Vectorized per-(robots_txt) grouping: compile once, match the whole
    group's path array per rule."""
    out = pd.Series(True, index=paths.index)
    bodies = robots_txts.fillna("")
    for body, idx in bodies.groupby(bodies).groups.items():
        if body == "":
            continue
        rules = parse_robots(body)
        if not rules:
            continue
        grp_paths = paths.loc[idx].fillna("/")
        decided = pd.Series(False, index=idx)
        allowed = pd.Series(True, index=idx)
        for _, is_allow, rx in rules:
            hits = grp_paths.str.contains(rx) & ~decided
            if hits.any():
                allowed[hits] = is_allow
                decided |= hits
            if decided.all():
                break
        out.loc[idx] = allowed
    return out


@F.pandas_udf(T.BooleanType())
def robots_allowed_udf(robots_txts: pd.Series, paths: pd.Series) -> pd.Series:
    return robots_allowed_series(robots_txts, paths)
