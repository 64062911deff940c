"""5-field cron schedules mapped onto crawl rounds.

The reference schedules recrawls by real cron specs via gocron
(/root/reference/cmd/cron-trigger/main.go:149, ``Config["cron"]`` parsed at
:82-229). This engine's revisit queue is round-granular, so a wall-clock
cron spec is mapped to ELIGIBILITY ROUNDS through a configured round
cadence: round ``r`` represents wall time ``epoch + r·period``, and a URL
fetched in round ``r`` becomes eligible at the first round whose timestamp
reaches the spec's next fire time strictly after ``t(r)``.

Everything here is a pure function of (spec, round, cadence, epoch) — no
wall clock is ever read, so crawls stay deterministic and resume
bit-identically (the same reproducibility contract as the uuidv7→
(round, rank) divergence, SURVEY §1.3).

Supported syntax (the classic POSIX subset gocron accepts): five fields
``minute hour day-of-month month day-of-week``; each field is ``*``,
``N``, ``A-B``, ``*/S``, ``A-B/S`` or a comma list thereof; day-of-week
0-7 with 7 ≡ 0 (Sunday). Standard dom/dow rule: when BOTH are restricted
the day matches if EITHER matches; otherwise the restricted one must
match. Month/day names are not accepted (numeric only).
"""

from __future__ import annotations

import datetime as _dt
from functools import lru_cache

_FIELD_RANGES = (
    ("minute", 0, 59),
    ("hour", 0, 23),
    ("dom", 1, 31),
    ("month", 1, 12),
    ("dow", 0, 6),
)

DEFAULT_EPOCH = "2024-01-01T00:00:00"  # a Monday, 00:00 — fixed anchor


def _parse_field(text: str, name: str, lo: int, hi: int) -> tuple[frozenset[int], bool]:
    """→ (allowed values, was_star). ``was_star`` (a bare ``*`` / ``*/1``
    covering the whole range with step 1) drives the dom/dow OR rule."""
    vals: set[int] = set()
    star = text == "*"
    for part in text.split(","):
        part = part.strip()
        if not part:
            raise ValueError(f"cron field {name}: empty list item in {text!r}")
        step = 1
        if "/" in part:
            part, step_s = part.split("/", 1)
            step = int(step_s)
            if step < 1:
                raise ValueError(f"cron field {name}: step {step} < 1")
        if part == "*":
            a, b = lo, hi
        elif "-" in part:
            a_s, b_s = part.split("-", 1)
            a, b = int(a_s), int(b_s)
        else:
            a = b = int(part)
            if name == "dow" and a == 7:
                a = b = 0  # 7 ≡ Sunday ≡ 0
        if name == "dow":
            a, b = (0 if a == 7 else a), (0 if b == 7 else b)
        if not (lo <= a <= hi and lo <= b <= hi and a <= b):
            raise ValueError(
                f"cron field {name}: {part!r} outside [{lo},{hi}] or inverted"
            )
        vals.update(range(a, b + 1, step))
    return frozenset(vals), star


@lru_cache(maxsize=512)
def parse_cron(expr: str):
    """→ (minute, hour, dom, month, dow) frozensets + (dom_star, dow_star)."""
    fields = expr.split()
    if len(fields) != 5:
        raise ValueError(f"cron spec needs 5 fields, got {len(fields)}: {expr!r}")
    parsed = []
    stars = []
    for text, (name, lo, hi) in zip(fields, _FIELD_RANGES):
        vals, star = _parse_field(text, name, lo, hi)
        parsed.append(vals)
        stars.append(star)
    minute, hour, dom, month, dow = parsed
    return (minute, hour, dom, month, dow, stars[2], stars[4])


def _day_matches(spec, d: _dt.date) -> bool:
    _m, _h, dom, month, dow, dom_star, dow_star = spec
    if d.month not in month:
        return False
    dom_ok = d.day in dom
    dow_ok = ((d.weekday() + 1) % 7) in dow  # python Mon=0 → cron Sun=0
    if dom_star and dow_star:
        return True
    if dom_star:
        return dow_ok
    if dow_star:
        return dom_ok
    return dom_ok or dow_ok  # both restricted: classic OR rule


def cron_matches(expr: str, t: _dt.datetime) -> bool:
    """True iff the spec fires at minute ``t`` (seconds ignored)."""
    spec = parse_cron(expr)
    return (
        t.minute in spec[0] and t.hour in spec[1] and _day_matches(spec, t.date())
    )


def next_fire(expr: str, after: _dt.datetime) -> _dt.datetime:
    """First fire time STRICTLY after ``after`` (minute resolution).
    Day-walk + in-day field selection, bounded at 4 years (covers the
    rarest valid spec, Feb-29-ish combinations); raises if none found —
    an impossible spec like ``0 0 31 2 *`` must fail loudly, not hang a
    revisit forever."""
    spec = parse_cron(expr)
    minutes, hours = sorted(spec[0]), sorted(spec[1])
    start = after.replace(second=0, microsecond=0) + _dt.timedelta(minutes=1)
    d = start.date()
    for _ in range(4 * 366 + 1):
        if _day_matches(spec, d):
            floor_h = start.hour if d == start.date() else 0
            floor_m = start.minute if d == start.date() else 0
            for h in hours:
                if h < floor_h:
                    continue
                for m in minutes:
                    if h == floor_h and d == start.date() and m < floor_m:
                        continue
                    return _dt.datetime(d.year, d.month, d.day, h, m)
        d = d + _dt.timedelta(days=1)
    raise ValueError(f"cron spec {expr!r} never fires within 4 years")


def cron_gap(
    expr: str,
    rnd: int,
    round_period_s: int,
    epoch: str = DEFAULT_EPOCH,
) -> int:
    """Rounds until a URL fetched in round ``rnd`` is next eligible under
    ``expr``: the smallest k ≥ 1 such that round rnd+k's wall time
    ``epoch + (rnd+k)·period`` has reached the spec's next fire strictly
    after round rnd's time. Pure arithmetic over :func:`next_fire` — the
    engine's per-round policy override and the pure-Python oracle both
    call THIS function, so parity holds by construction."""
    t0 = _dt.datetime.fromisoformat(epoch)
    t_rnd = t0 + _dt.timedelta(seconds=rnd * round_period_s)
    fire = next_fire(expr, t_rnd)
    k = -(-int((fire - t0).total_seconds()) // round_period_s) - rnd  # ceil div
    return max(1, k)
