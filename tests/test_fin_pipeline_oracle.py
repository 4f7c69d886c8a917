"""The flagship-pipeline oracle on a LONG-SERIES fixture.

The driver's events table yields only ~27 bars per symbol, so
sma_50-gated strategies (ma_ribbon, trend_following) and
rsi_divergence (needs ≥20 post-warmup rows) never fire there —
their oracle branches would otherwise ship untested. This fixture
synthesizes 90 trending/oscillating bars per symbol (3 ticks per
day so open≠close) and pins:

- Spark pipeline ≡ SQL oracle bit-for-bit on the long series;
- every one of the 11 strategies fires at least once (so ALL
  oracle branches are exercised, not just the short-series six).
"""

from __future__ import annotations

import math
import sys
from datetime import datetime, timedelta
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pytest

from tools.check_correctness import compare  # noqa: E402


def _long_events(spark, tmp_path) -> str:
    import random

    rng = random.Random(99)
    rows = []
    eid = 0
    d0 = datetime(2023, 1, 2)
    for uid in range(1, 13):
        # alternating trend/oscillation regimes to force crossovers,
        # band breaks, ribbon alignment, and price pivots
        c = 40.0 + 5 * uid
        for day in range(90):
            regime = (day // 15) % 2
            drift = 0.004 if regime == 0 else -0.003
            osc = 0.03 * math.sin(day / 3.0 + uid)
            # spike days: >2x the ~3-tick daily volume AND a >2%
            # move, so volume_spike's (vr > 2, |chg| > 2%) branch
            # fires; sign alternates to hit buy and sell
            spike = day > 30 and day % 17 == 0
            jump = (0.035 if (day // 17) % 2 == 0 else -0.035) if spike else 0.0
            c = max(1.0, c * (1 + drift + jump + osc * 0.2 + rng.gauss(0, 0.01)))
            base = d0 + timedelta(days=day)
            for tick in range(8 if spike else 3):
                v = round(c * (1 + rng.gauss(0, 0.004)), 2)
                rows.append(
                    (eid, base + timedelta(hours=tick * 2), uid, "view", v, "{}")
                )
                eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = tmp_path / "long_events"
    out.mkdir()
    df.coalesce(2).write.parquet(str(out / "events.parquet"))
    return str(out)


def test_pipeline_oracle_long_series_all_strategies_fire(spark, tmp_path):
    from fin_trade_craft_spark.queries import fin_domain as FD

    sf = _long_events(spark, tmp_path)
    got = FD.fin_signals_pipeline(spark, sf).toPandas()

    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB needs the part glob
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet/*.parquet'"
    )
    want = con.sql(FD.ORACLES["fin_signals_pipeline"]).df()

    ok, msg = compare(got, want)
    assert ok, msg
    fired = set(got["trade_strategy"])
    missing = {
        "ema_crossover", "rsi_mean_reversion", "rsi_crossing",
        "macd_histogram_reversal", "bollinger_breakout", "volume_spike",
        "williams_extremes", "ma_ribbon", "price_breakout",
        "rsi_divergence", "trend_following",
    } - fired
    assert not missing, f"strategies never fired on the long fixture: {missing}"
