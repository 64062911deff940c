"""Exact integer math kernels shared by the Spark engine and the DuckDB
oracles.

The correctness gate hashes values bit-exactly, so any score that needs a
logarithm cannot use float ``ln()``/``log2()`` — libm results are not
guaranteed identical across engines (see queries/sketchops.py for the same
constraint). ``log2_q20`` computes ``floor-ish(2^20 * log2(p/q))`` for
positive integers ``p >= q >= 1`` using only 64-bit integer multiply,
shift and floor-divide — the classic shift-and-square binary-log algorithm
— so the engine (a Catalyst codegen fold), the oracle (a recursive CTE)
and the Python reference produce the SAME bigint on every input.

Accuracy: the Q30 mantissa seeding does two floor divisions (``p<<15 / q``
then ``>> e``), so the result can differ from true ``log2`` by < 2^-14
bits — far below ranking granularity, and identical everywhere by
construction. Range: exact for ``p < 2^47`` (the ``p << 15`` headroom); at
a 10^10-document design point ``p = 2N+2 < 2^36`` still leaves 11 bits.

Reference parity: spider-go has no scoring math at all (its expr-lang
mappers stop at arithmetic, /root/reference/pkg/spider/workflow.go:379-391);
this kernel exists for the north rule's index/ranking layer (BM25).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: fractional bits of the result (Q20 fixed point)
FRAC_BITS = 20


def int_log2_q20(p: int, q: int) -> int:
    """Pure-Python reference: ``~2^20 * log2(p/q)`` for ``p >= q >= 1``."""
    if not (p >= q >= 1):
        raise ValueError(f"int_log2_q20 requires p >= q >= 1, got {p}/{q}")
    e0 = p.bit_length() - q.bit_length()
    e = e0 - (1 if (q << e0) > p else 0)
    m = ((p << 15) // (q << e)) << 15
    frac = 0
    for _ in range(FRAC_BITS):
        m = (m * m) >> 30
        if m >= 1 << 31:
            m >>= 1
            frac = frac * 2 + 1
        else:
            frac = frac * 2
    return (e << FRAC_BITS) + frac


def log2_q20(p_sql: str, q_sql: str) -> Column:
    """Catalyst twin of :func:`int_log2_q20` — a pure codegen projection.

    ``p_sql``/``q_sql`` are SQL expressions (column names or formulas)
    yielding positive bigints with ``p >= q``. The 20 shift-and-square
    steps run as one ``aggregate`` fold over a constant sequence — no
    shuffle, no Python; ``length(bin(x))`` is the bit length of a
    positive bigint on both engines.
    """
    p, q = f"CAST({p_sql} AS BIGINT)", f"CAST({q_sql} AS BIGINT)"
    e0 = f"(length(bin({p})) - length(bin({q})))"
    e = f"({e0} - (CASE WHEN shiftleft({q}, {e0}) > {p} THEN 1 ELSE 0 END))"
    m0 = f"shiftleft(shiftleft({p}, 15) div shiftleft({q}, {e}), 15)"
    fold = f"""aggregate(
      sequence(1, {FRAC_BITS}),
      named_struct('m', {m0}, 'f', CAST(0 AS BIGINT)),
      (acc, i) -> named_struct(
        'm', CASE WHEN shiftright(acc.m * acc.m, 30) >= 2147483648
                  THEN shiftright(acc.m * acc.m, 31)
                  ELSE shiftright(acc.m * acc.m, 30) END,
        'f', acc.f * 2 + CASE WHEN shiftright(acc.m * acc.m, 30) >= 2147483648
                              THEN 1 ELSE 0 END),
      acc -> shiftleft(CAST({e} AS BIGINT), {FRAC_BITS}) + acc.f)"""
    return F.expr(fold)


def log2_q20_duckdb_ctes(p_expr: str, q_expr: str, src: str, key_cols: str) -> str:
    """DuckDB twin as recursive-CTE fragments.

    Returns CTE bodies (to embed after ``WITH RECURSIVE``) that compute
    ``log2_q20`` for every row of ``src``; the final CTE is named ``lg``
    with columns ``{key_cols}, log2_q20``. ``p_expr``/``q_expr`` may
    reference columns of ``src``.
    """
    return f"""lg0 AS (
  SELECT {key_cols}, ({p_expr})::BIGINT AS p, ({q_expr})::BIGINT AS q
  FROM {src}
), lg1 AS (
  SELECT {key_cols},
         (length(bin(p)) - length(bin(q))
           - CASE WHEN (q << (length(bin(p)) - length(bin(q)))) > p
                  THEN 1 ELSE 0 END) AS e,
         p, q
  FROM lg0
), lgi AS (
  SELECT {key_cols}, e,
         (((p << 15) // (q << e)) << 15) AS m,
         0::BIGINT AS f, 0 AS i
  FROM lg1
  UNION ALL
  SELECT {key_cols}, e,
         CASE WHEN ((m * m) >> 30) >= 2147483648
              THEN (m * m) >> 31 ELSE (m * m) >> 30 END,
         f * 2 + CASE WHEN ((m * m) >> 30) >= 2147483648 THEN 1 ELSE 0 END,
         i + 1
  FROM lgi WHERE i < {FRAC_BITS}
), lg AS (
  SELECT {key_cols}, ((e::BIGINT << {FRAC_BITS}) + f)::BIGINT AS log2_q20
  FROM lgi WHERE i = {FRAC_BITS}
)"""
