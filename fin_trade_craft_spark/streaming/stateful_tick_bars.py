"""Streaming stateful tick-imbalance bars — the real-time form of
``queries/microstructure.tick_imbalance_bars``.

Unlike the dollar-bucket VPIN (whose buckets complete only when a
LATER tick overflows them), an imbalance bar closes ON the tick
that carries |θ| to the threshold — so the streamed output is
IDENTICAL to the batch walk, bar for bar, and the batch recursive-
CTE oracle applies verbatim with no completed-only restriction.
Only each series' final PARTIAL bar is absent from both.

State per series: the tick-rule sign carry (prev price + last
non-zero sign), the open bar's (θ, n), the adaptive expectation E,
and the next bar_seq — all integers, carried across micro-batches
by ``applyInPandasWithState``."""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("bar_seq", IntegerType()),
        StructField("closed_at_event", LongType()),
        StructField("n_signed", IntegerType()),
        StructField("threshold", IntegerType()),
        StructField("direction", IntegerType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("prev_cc", LongType()),
        StructField("sign", IntegerType()),
        StructField("theta", IntegerType()),
        StructField("n_in", IntegerType()),
        StructField("e_cur", IntegerType()),
        StructField("seq", IntegerType()),
    ]
)


def _fold(
    uid: int,
    rows: pd.DataFrame,
    e_init: int,
    e_min: int,
    prev_cc: int | None,
    sign: int,
    theta: int,
    n_in: int,
    e_cur: int,
    seq: int,
):
    """One micro-batch of raw ticks through the sign carry + the
    adaptive imbalance walk; resumable from carried state."""
    out = []
    for r in rows.itertuples(index=False):
        cc = int(r.cc)
        if prev_cc is not None:
            d = cc - prev_cc
            if d > 0:
                sign = 1
            elif d < 0:
                sign = -1
        prev_cc = cc
        if sign == 0:
            continue  # pre-first-price-change ticks carry no sign
        theta += sign
        n_in += 1
        if abs(theta) >= e_cur:
            out.append(
                (uid, seq, int(r.event_id), n_in, e_cur, 1 if theta > 0 else -1)
            )
            e_cur = max(e_min, (e_cur + n_in) // 2)
            theta, n_in = 0, 0
            seq += 1
    return out, (prev_cc, sign, theta, n_in, e_cur, seq)


def tick_bars_stateful(
    ticks: DataFrame, e_init: int, e_min: int
) -> DataFrame:
    """ticks (stream): (user_id long, seq long, event_id long,
    cc long) — seq is the event-time sort key, cc exact cents.
    → closed imbalance bars, state carried across micro-batches."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            prev_cc, sign, theta, n_in, e_cur, bseq = state.get
        else:
            prev_cc, sign, theta, n_in, e_cur, bseq = None, 0, 0, 0, e_init, 0
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(["seq", "event_id"])
        out, st = _fold(
            int(key[0]), batch, e_init, e_min,
            prev_cc, sign, theta, n_in, e_cur, bseq,
        )
        prev_cc, sign, theta, n_in, e_cur, bseq = st
        state.update(
            (
                None if prev_cc is None else int(prev_cc),
                int(sign),
                int(theta),
                int(n_in),
                int(e_cur),
                int(bseq),
            )
        )
        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return ticks.groupBy("user_id").applyInPandasWithState(
        fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
