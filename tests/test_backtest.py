"""Golden tests for the trade simulator (U5) — the FIXTURES.md F12
scenarios: open-skip while holding, cooldown suppression,
end-of-period force-close."""

from __future__ import annotations

import sys
from datetime import datetime, timedelta
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fin_trade_craft_spark.operators.backtest import backtest_metrics, simulate_trades  # noqa: E402

D0 = datetime(2024, 1, 1)


def _frames(spark, events):
    """events: list of (day, close, buy, sell) for one symbol."""
    prices = spark.createDataFrame(
        [(1, D0 + timedelta(days=d), float(c)) for d, c, _, _ in events],
        "symbol long, date timestamp, close double",
    )
    sigs = spark.createDataFrame(
        [
            ("s1", 1, D0 + timedelta(days=d), bool(b), bool(s))
            for d, _, b, s in events
            if b or s
        ],
        "strategy string, symbol long, date timestamp, buy_signal boolean, sell_signal boolean",
    )
    return sigs, prices


def test_basic_roundtrip_and_force_close(spark):
    events = [
        (0, 100, 1, 0),   # open @100
        (1, 105, 1, 0),   # already holding -> skipped
        (2, 110, 0, 1),   # close @110
        (3, 100, 0, 0),
        (70, 100, 1, 0),  # past cooldown -> open
        (75, 90, 0, 0),   # no sell -> force-close at end @90
    ]
    sigs, prices = _frames(spark, events)
    trades = simulate_trades(sigs, prices, cooldown_days=60).orderBy("entry_date").collect()
    assert len(trades) == 2
    t1, t2 = trades
    assert (t1.entry_price, t1.exit_price, t1.exit_reason) == (100.0, 110.0, "sell_signal")
    # 2% of 100k = $2000 position -> 20 shares @100
    assert abs(t1.shares - 20.0) < 1e-9
    expected_comm = (100 * 20 + 110 * 20) * 0.001
    assert abs(t1.pnl - ((110 - 100) * 20 - expected_comm)) < 1e-9
    assert t2.exit_reason == "end_of_period" and t2.exit_price == 90.0


def test_cooldown_suppresses_reentry(spark):
    events = [
        (0, 100, 1, 0),
        (2, 110, 0, 1),
        (10, 95, 1, 0),   # within 60d cooldown -> suppressed
        (80, 95, 1, 0),   # past cooldown -> open
        (85, 99, 0, 1),
    ]
    sigs, prices = _frames(spark, events)
    trades = simulate_trades(sigs, prices, cooldown_days=60).orderBy("entry_date").collect()
    assert [t.entry_price for t in trades] == [100.0, 95.0]
    assert trades[1].entry_date == D0 + timedelta(days=80)


def test_sell_without_position_ignored(spark):
    events = [(0, 100, 0, 1), (1, 101, 1, 0), (2, 102, 0, 1)]
    sigs, prices = _frames(spark, events)
    trades = simulate_trades(sigs, prices, cooldown_days=0).collect()
    assert len(trades) == 1
    assert trades[0].entry_price == 101.0 and trades[0].exit_price == 102.0


def test_int_shares_zero_share_skip_and_net_pnl_pct(spark):
    """Reference floors shares to int and skips the trade when the
    price exceeds the position value (backtest_strategies.py:207-210);
    pnl_pct is net of commission relative to entry value (:231-234)."""
    events = [
        (0, 3000, 1, 0),   # 2% of 100k = $2000 < $3000 -> 0 shares, NO trade opens
        (1, 3100, 0, 1),   # nothing to close
        (2, 130, 1, 0),    # 2000/130 = 15.38 -> 15 shares (floored)
        (3, 150, 0, 1),    # close
    ]
    sigs, prices = _frames(spark, events)
    trades = simulate_trades(sigs, prices, cooldown_days=0).collect()
    assert len(trades) == 1
    t = trades[0]
    assert t.shares == 15.0 and t.entry_price == 130.0
    entry_value = 130.0 * 15
    comm = (130.0 * 15 + 150.0 * 15) * 0.001
    pnl = 150.0 * 15 - entry_value - comm
    assert abs(t.pnl - pnl) < 1e-9
    assert abs(t.pnl_pct - pnl / entry_value * 100.0) < 1e-9


def test_metrics_rollup(spark):
    events = [
        (0, 100, 1, 0), (1, 110, 0, 1),   # win
        (2, 100, 1, 0), (3, 95, 0, 1),    # loss
        (4, 100, 1, 0), (5, 120, 0, 1),   # win
    ]
    sigs, prices = _frames(spark, events)
    trades = simulate_trades(sigs, prices, cooldown_days=0)
    m = backtest_metrics(trades).collect()[0]
    assert m.n_trades == 3
    assert abs(m.win_rate - 2 / 3) < 1e-9
    assert m.profit_factor > 1
    assert m.max_drawdown < 0  # the losing trade dents the curve


def test_simulator_cooldown_and_edge_cases(spark):
    """Pin the ledger's edge semantics: same-bar buy+sell resolves
    to SELL while in a position (elif order), cooldown blocks
    re-entry strictly inside the window and allows it exactly AT the
    boundary, a price above the position value skips the trade
    (zero whole shares), and a position opened on the final bar is
    force-closed on that same bar."""
    import datetime

    from fin_trade_craft_spark.operators.backtest import simulate_trades

    d = lambda i: datetime.datetime(2024, 1, i)
    rows = [
        # (date, close, buy, sell)
        (d(1), 100.0, True, False),   # open: 20 shares @100
        (d(2), 110.0, True, True),    # in position + both signals -> SELL wins
        (d(3), 50.0, True, False),    # 1 day since exit < 2-day cooldown: blocked
        (d(4), 50.0, True, False),    # exactly 2 days: allowed -> 40 shares @50
        (d(5), 55.0, False, True),    # close
        (d(7), 3000.0, True, False),  # cooldown ok but int(2000/3000)=0 shares: skip
        (d(8), 40.0, True, False),    # open on the LAST bar -> force-close same bar
    ]
    prices = spark.createDataFrame(
        [(1, dt, c) for dt, c, _, _ in rows], "symbol long, date timestamp, close double"
    )
    sigs = spark.createDataFrame(
        [(1, dt, "s", b, s) for dt, c, b, s in rows],
        "symbol long, date timestamp, strategy string, buy_signal boolean, sell_signal boolean",
    )
    trades = (
        simulate_trades(sigs, prices, cooldown_days=2.0)
        .orderBy("entry_date")
        .collect()
    )
    got = [
        (t.entry_date.day, t.exit_date.day, t.entry_price, t.exit_price, t.shares, t.exit_reason)
        for t in trades
    ]
    assert got == [
        (1, 2, 100.0, 110.0, 20.0, "sell_signal"),
        (4, 5, 50.0, 55.0, 40.0, "sell_signal"),
        (8, 8, 40.0, 40.0, 50.0, "end_of_period"),
    ]
    # the same-bar force-close costs exactly round-trip commission
    t3 = trades[-1]
    assert t3.pnl == -(2000.0 + 2000.0) * 0.001


def test_simulator_batch_scan_matches_per_group_reference(spark):
    """r12 differential: the whole-batch linear-scan simulator (one
    itertuples pass with group-boundary resets, over the JVM-side
    signal/last-row filter) must reproduce the reference per-group
    loop exactly on a randomized multi-strategy/multi-symbol panel
    with both-signal rows, cooldown collisions, and a zero-price
    buy."""
    import random

    import pandas as pd

    from fin_trade_craft_spark.operators.backtest import simulate_trades

    rng = random.Random(41)
    n_days = 90
    symbols = list(range(1, 13))
    strategies = ["alpha", "beta", "gamma"]
    price_rows, sig_rows = [], []
    for sym in symbols:
        c = 40.0 + sym
        for d in range(n_days):
            c *= 1 + rng.uniform(-0.04, 0.04)
            close = 0.0 if (sym == 7 and d == 10) else round(c, 2)
            price_rows.append((sym, D0 + timedelta(days=d), float(close)))
    for st in strategies:
        for sym in symbols:
            for d in range(n_days):
                buy = rng.random() < 0.08
                sell = rng.random() < 0.08
                if buy or sell:
                    sig_rows.append((st, sym, D0 + timedelta(days=d), buy, sell))
    prices = spark.createDataFrame(price_rows, "symbol long, date timestamp, close double")
    sigs = spark.createDataFrame(
        sig_rows,
        "strategy string, symbol long, date timestamp, buy_signal boolean, sell_signal boolean",
    )

    got = (
        simulate_trades(sigs, prices)
        .toPandas()
        .sort_values(["strategy", "symbol", "entry_date"])
        .reset_index(drop=True)
    )

    # independent reference: the per-(strategy, symbol) loop exactly
    # as backtest_strategies.py specifies it
    sig_map = {(st, sym, d): (b, s) for st, sym, d, b, s in sig_rows}
    expected = []
    for st in strategies:
        for sym in symbols:
            rows = [
                (d, c, *sig_map.get((st, sym, d), (False, False)))
                for _, d, c in sorted(
                    (r for r in price_rows if r[0] == sym), key=lambda r: r[1]
                )
            ]
            entry, last_exit, trades = None, None, []
            for d, c, b, s in rows:
                if entry is None and b:
                    if last_exit is not None and (d - last_exit).total_seconds() < 60 * 86400.0:
                        continue
                    if c and c > 0:
                        sh = int(100_000.0 * 0.02 / c)
                        if sh > 0:
                            entry = (d, c, sh)
                elif entry is not None and s:
                    trades.append((entry, (d, c), "sell_signal"))
                    last_exit = d
                    entry = None
            if entry is not None and rows:
                trades.append((entry, (rows[-1][0], rows[-1][1]), "end_of_period"))
            for (ed, ep, sh), (xd, xp), reason in trades:
                ev = ep * sh
                com = (ev + xp * sh) * 0.001
                pnl = xp * sh - ev - com
                expected.append((st, sym, ed, xd, float(ep), float(xp), float(sh),
                                 float(pnl), float(pnl / ev * 100.0), float(com), reason))
    exp = pd.DataFrame(
        expected,
        columns=["strategy", "symbol", "entry_date", "exit_date", "entry_price",
                 "exit_price", "shares", "pnl", "pnl_pct", "commission", "exit_reason"],
    ).sort_values(["strategy", "symbol", "entry_date"]).reset_index(drop=True)

    assert len(got) == len(exp) and len(exp) > 20
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_duplicate_bar_fails_loudly(spark):
    """r12 VERDICT "What's wrong" #3 / ADVICE: the decision-row
    filter and the batch scan both assume (symbol, date) unique in
    prices. A duplicated last bar used to silently survive the
    max-date filter (two force-close candidates); the kernels now
    raise instead of double-closing."""
    import pytest

    prices = spark.createDataFrame(
        [
            (1, D0, 100.0),
            (1, D0 + timedelta(days=1), 110.0),
            (1, D0 + timedelta(days=1), 111.0),  # duplicate last bar
        ],
        "symbol long, date timestamp, close double",
    )
    sigs = spark.createDataFrame(
        [("s1", 1, D0, True, False)],
        "strategy string, symbol long, date timestamp, buy_signal boolean, sell_signal boolean",
    )
    with pytest.raises(Exception, match="duplicate bar"):
        simulate_trades(sigs, prices, cooldown_days=0).collect()


def test_duplicate_signal_bar_fails_loudly(spark):
    """A duplicated signal row reaches the kernel even when it is not
    the last bar; same loud contract."""
    import pytest

    prices = spark.createDataFrame(
        [(1, D0, 100.0), (1, D0 + timedelta(days=1), 110.0)],
        "symbol long, date timestamp, close double",
    )
    sigs = spark.createDataFrame(
        [
            ("s1", 1, D0, True, False),
            ("s1", 1, D0, True, False),  # duplicate (strategy, symbol, date)
        ],
        "strategy string, symbol long, date timestamp, buy_signal boolean, sell_signal boolean",
    )
    with pytest.raises(Exception, match="duplicate bar"):
        simulate_trades(sigs, prices, cooldown_days=0).collect()
