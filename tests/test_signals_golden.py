"""Golden + property tests for the zone-confirmation signal (W18).

Golden fixture: the reference's own 15-bar RSI series
(test_rsi_crossing.py:8-29 via FIXTURES.md F11): exactly two
signals — BUY at bar 7 (RSI 31), SELL at bar 14 (RSI 65).

Property: the vectorized lag formulation equals a faithful
re-simulation of the reference's state machine
(transform_trading_signals.py:315-384 semantics: zone flags set by
the elif chain, reset after fire) on random series.
"""

from __future__ import annotations

import random
import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fin_trade_craft_spark.operators import rolling, signals  # noqa: E402

GOLDEN = [35, 31, 30, 28, 22, 28, 29, 31, 40, 68, 72, 73, 74, 70, 65]


def _spark_zone_signals(spark, series):
    df = spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate(series)], "sym int, bar int, rsi double"
    )
    w = rolling.rows_window("sym", [F.col("bar")])
    buy, sell = signals.zone_confirmation_signals(F.col("rsi"), w)
    rows = (
        df.select("bar", "rsi", buy.alias("b"), sell.alias("s"))
        .filter(F.col("b") | F.col("s"))
        .orderBy("bar")
        .collect()
    )
    return [(r.bar, "BUY" if r.b else "SELL", r.rsi) for r in rows]


def _state_machine(series, low=30.0, high=70.0):
    """Faithful re-simulation of the reference's loop semantics."""
    out = []
    in_low = in_high = False
    for i, rsi in enumerate(series):
        if rsi <= low:
            in_low, in_high = True, False
        elif rsi >= high:
            in_high, in_low = True, False
        elif in_low and rsi > low:
            if i > 0 and series[i - 1] <= low:
                out.append((i, "BUY", float(rsi)))
                in_low = False
        elif in_high and rsi < high:
            if i > 0 and series[i - 1] >= high:
                out.append((i, "SELL", float(rsi)))
                in_high = False
    return out


def test_golden_reference_series(spark):
    got = _spark_zone_signals(spark, GOLDEN)
    assert got == [(7, "BUY", 31.0), (14, "SELL", 65.0)]


def test_touch_without_dwell_does_not_overfire(spark):
    # crossing straight into the opposite zone must not fire
    series = [40, 28, 75, 69, 40]
    got = _spark_zone_signals(spark, series)
    # bar2 (28→75) lands in overbought: no BUY; bar3 (75→69) SELL fires
    assert got == [(3, "SELL", 69.0)]


def test_property_equals_state_machine(spark):
    rng = random.Random(42)
    for trial in range(25):
        n = rng.randint(3, 40)
        series = [round(rng.uniform(0, 100), 1) for _ in range(n)]
        assert _spark_zone_signals(spark, series) == _state_machine(series), series
