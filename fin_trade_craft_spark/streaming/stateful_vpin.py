"""Streaming stateful VPIN — the real-time form of
``queries/microstructure.vpin_dollar_buckets`` (Easley, López de
Prado, O'Hara 2012).

A live toxicity monitor cannot wait for the batch recompute: each
arriving tick advances the per-series dollar clock, and a bucket's
toxicity is known the moment its successor bucket opens. That is
per-key sequential state — tick-rule sign carry, the open bucket's
flow accumulators, and the trailing toxicity window must all SURVIVE
across micro-batches — exactly ``applyInPandasWithState``.

Semantics vs the batch twin: the stream emits COMPLETED buckets only
(a bucket completes when a later signed tick lands in a higher
bucket; each series' final open bucket never completes), so the SQL
oracle is the batch VPIN restricted to ``bucket < max(bucket)`` per
series. All flow arithmetic is exact integer cents and the trailing
mean folds ascending-sorted doubles left-associated — bit-exact
against the DuckDB replay, the same discipline as the batch query.

Assumes per-series event-time order within and across batches (the
oracle path feeds time-ordered files; production would sort within
batch and gate with a watermark)."""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("bucket", LongType()),
        StructField("toxicity", DoubleType()),
        StructField("vpin", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("prev_cc", LongType()),
        StructField("sign", IntegerType()),
        StructField("pre_cum", LongType()),
        StructField("cur_bucket", LongType()),
        StructField("buy", LongType()),
        StructField("sell", LongType()),
        StructField("trail", ArrayType(DoubleType())),
    ]
)


def _fold(
    uid: int,
    rows: pd.DataFrame,
    bucket_cents: int,
    window: int,
    prev_cc: int | None,
    sign: int,
    pre_cum: int,
    cur_bucket: int | None,
    buy: int,
    sell: int,
    trail: list[float],
):
    """One micro-batch of ticks through the dollar clock; resumable
    from carried state. Returns (emitted rows, new state)."""
    out = []

    def finalize():
        den = buy + sell
        if den > 0:
            tox = abs(buy - sell) / float(den)
            trail.append(tox)
            if len(trail) > window:
                del trail[0]
            if len(trail) == window:
                acc = 0.0
                for x in sorted(trail):  # ascending left-assoc fold
                    acc += x
                out.append((uid, cur_bucket, tox, acc / float(window)))

    for r in rows.itertuples(index=False):
        cc = int(r.cc)
        if prev_cc is not None:
            d = cc - prev_cc
            if d > 0:
                sign = 1
            elif d < 0:
                sign = -1
        b = pre_cum // bucket_cents
        pre_cum += cc
        prev_cc = cc
        if sign == 0:
            continue  # pre-first-price-change ticks carry no flow
        if cur_bucket is None:
            cur_bucket, buy, sell = b, 0, 0
        elif b != cur_bucket:
            finalize()
            cur_bucket, buy, sell = b, 0, 0
        if sign == 1:
            buy += cc
        else:
            sell += cc
    return out, (prev_cc, sign, pre_cum, cur_bucket, buy, sell, trail)


def vpin_stateful(ticks: DataFrame, bucket_cents: int, window: int) -> DataFrame:
    """ticks (stream): (user_id long, seq long, event_id long,
    cc long) — seq is the event-time sort key; cc exact cents.
    → completed-bucket VPIN rows, state carried across batches."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            prev_cc, sign, pre_cum, cur_bucket, buy, sell, trail = state.get
            trail = list(trail)
        else:
            prev_cc, sign, pre_cum, cur_bucket, buy, sell, trail = (
                None,
                0,
                0,
                None,
                0,
                0,
                [],
            )
        batch = pd.concat(list(pdfs), ignore_index=True).sort_values(["seq", "event_id"])
        out, st = _fold(
            int(key[0]), batch, bucket_cents, window,
            prev_cc, sign, pre_cum, cur_bucket, buy, sell, trail,
        )
        prev_cc, sign, pre_cum, cur_bucket, buy, sell, trail = st
        state.update(
            (
                None if prev_cc is None else int(prev_cc),
                int(sign),
                int(pre_cum),
                None if cur_bucket is None else int(cur_bucket),
                int(buy),
                int(sell),
                [float(x) for x in trail],
            )
        )
        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA.fields])

    return ticks.groupBy("user_id").applyInPandasWithState(
        fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
    )
