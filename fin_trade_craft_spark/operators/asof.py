"""Point-in-time (as-of / interval) join — SURVEY §2.3 J6.

The reference enriches each trade with the most recent fundamental
snapshot whose publication window covers the trade date
(`backtesting/join_fundamentals_to_trades.py:170-269`: 45-day
publication lag, 90-day validity, latest-per-trade, unmatched rows
preserved with NULLs). Spark has no native as-of join; the idiom is

    equi-join on key  +  range predicate  +  row_number dedup

which Catalyst executes as one shuffle on the key plus a window —
no driver-side loop (the reference's row-loop variant,
`backtesting/daily_signal_scorer.py:141-225`, is O(trades) Python).

Scale notes: the join is equi on ``on`` keys, so it shuffles both
sides once by key (or broadcasts a small right side); the range
predicate is applied post-match, and the dedup window reuses the
same partitioning. Skewed keys fall to AQE skew-join splitting. If
the right side per key is huge, pre-filter it to the left side's
time range first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    left_key: str | list[str],
    *,
    validity: Column | None = None,
    tiebreak: list[Column] | None = None,
    how: str = "left",
    direction: str = "backward",
    band_window_us: int | None = None,
) -> DataFrame:
    """For each left row, attach ONE right row selected by
    ``direction`` (pandas ``merge_asof`` parity), preserving
    unmatched left rows when how='left':

    - ``backward`` (default): the latest right row with
      ``right_time <= left_time`` — the reference's
      point-in-time enrichment.
    - ``forward``: the earliest right row with
      ``right_time >= left_time`` (next-event fill).
    - ``nearest``: the right row minimizing
      ``|left_time - right_time|``; equidistant candidates resolve
      BACKWARD (the earlier right row wins), matching pandas.
      No time inequality enters the join condition, so bound the
      candidate set with ``validity`` (a two-sided window) — at
      scale an unbounded nearest join degenerates to the full
      per-key cross product.

    Time distance is measured in microseconds via ``unix_micros``
    (timestamp columns); backward/forward never need the distance,
    only the ordering.

    ``left_key`` uniquely identifies a left row (the dedup grain).
    ``validity`` is an extra boolean Column over the joined row
    (e.g. a bounded lookback window). ``tiebreak`` orders equal
    right_time rows deterministically.

    ``band_window_us`` (r12 optimization, guide §3): when the
    validity window bounds |left_time − right_time| ≤ W
    microseconds, pass W here and the join adds an equality key on
    floor(unix_micros(t)/W), with the right side exploded to its
    bucket ±1. Every validity-passing pair has bucket distance ≤ 1,
    so results are IDENTICAL — but the join enumerates only pairs
    within ±2 windows instead of the full per-key cross product
    (each purchase × every same-user row, which the plain equi-join
    materializes and only then filters — per-key QUADRATIC at
    scale). Both time columns must be timestamps. Callers are
    responsible for W being a true bound on validity-passing |Δt|.

    Column resolution is side-QUALIFIED (``left[...]``/``right[...]``),
    so ``left_time`` and ``right_time`` may share a name (ts-vs-ts is
    the natural as-of call); the right-side copy of each ``on`` key
    is dropped from the output so downstream ``select(key)`` never
    hits AMBIGUOUS_REFERENCE. A shared time-column NAME does leave
    two same-named time columns in the output (both values are
    meaningful) — select them qualified or pre-rename if needed.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    lt, rt = left[left_time], right[right_time]
    if direction == "backward":
        cond = rt <= lt
        order = [rt.desc_nulls_last()]
    elif direction == "forward":
        cond = rt >= lt
        order = [rt.asc_nulls_last()]
    else:  # nearest: candidates bounded by validity only
        cond = F.lit(True)
        dist = F.abs(F.unix_micros(lt) - F.unix_micros(rt))
        # NULL rt (unmatched left-join rows) must sort last so a
        # real match always beats the NULL row at rn=1.
        order = [dist.asc_nulls_last(), rt.asc_nulls_last()]
    if validity is not None:
        cond = cond & validity
    for k in on:
        cond = cond & (left[k] == right[k])

    if band_window_us is not None:
        # bucket equality prunes the per-key candidate enumeration;
        # a NULL time yields a NULL bucket on either side, which
        # fails the equality exactly as the NULL time already failed
        # the validity/ordering predicates — no semantic change.
        lb = F.floor(F.unix_micros(lt) / F.lit(band_window_us))
        rb = F.floor(F.unix_micros(rt) / F.lit(band_window_us))
        left = left.withColumn("__asof_band", lb)
        right = right.withColumn(
            "__asof_band", F.explode(F.array(rb - 1, rb, rb + 1))
        )
        cond = cond & (left["__asof_band"] == right["__asof_band"])

    joined = left.join(right, cond, how)
    if band_window_us is not None:
        joined = joined.drop(left["__asof_band"]).drop(right["__asof_band"])
    for k in on:
        joined = joined.drop(right[k])
    left_key = [left_key] if isinstance(left_key, str) else left_key
    order = order + list(tiebreak or [])
    w = Window.partitionBy(*[left[k] for k in left_key]).orderBy(*order)
    return joined.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
