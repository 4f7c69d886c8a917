"""Universe filter: eligibility predicates + semi-join (J8) +
deterministic universe ids (F15 divergence)."""

from __future__ import annotations

import sys
from datetime import date
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fin_trade_craft_spark.domain.universe import build_universe, universe_id  # noqa: E402


def test_universe_filter(spark):
    cm_rows = [
        # symbol, exch, type, ipo, status, desc, industry, sector, bs, is, cf, ect, ts
        ("GOOD", "NYSE", "Stock", date(2015, 1, 1), "Active", "d", "i", "s", 8, 8, 8, 8, 600),
        ("LATEIPO", "NYSE", "Stock", date(2021, 1, 1), "Active", "d", "i", "s", 8, 8, 8, 8, 600),
        ("DELISTED", "NYSE", "Stock", date(2015, 1, 1), "Delisted", "d", "i", "s", 8, 8, 8, 8, 600),
        ("ETF1", "NYSE", "ETF", date(2015, 1, 1), "Active", "d", "i", "s", 8, 8, 8, 8, 600),
        ("NODESC", "NYSE", "Stock", date(2015, 1, 1), "Active", None, "i", "s", 8, 8, 8, 8, 600),
        ("FEWSTMTS", "NYSE", "Stock", date(2015, 1, 1), "Active", "d", "i", "s", 2, 2, 2, 2, 600),
        ("CFPATH", "NYSE", "Stock", date(2015, 1, 1), "Active", "d", "i", "s", 2, 2, 8, 8, 600),
        ("FEWPRICES", "NYSE", "Stock", date(2015, 1, 1), "Active", "d", "i", "s", 8, 8, 8, 8, 100),
        ("POORCO", "NYSE", "Stock", date(2015, 1, 1), "Active", "d", "i", "s", 8, 8, 8, 8, 600),
    ]
    cm = spark.createDataFrame(
        cm_rows,
        "symbol string, exchange string, asset_type string, ipo_date date, status string,"
        " description string, industry string, sector string, balance_sheet_count int,"
        " income_statement_count int, cash_flow_count int, earnings_call_transcript_count int,"
        " time_series_daily_adjusted_count int",
    )
    cf = spark.createDataFrame(
        [
            ("GOOD", "annual", date(2019, 6, 30), 2e9),
            ("LATEIPO", "annual", date(2019, 6, 30), 2e9),
            ("DELISTED", "annual", date(2019, 6, 30), 2e9),
            ("CFPATH", "annual", date(2019, 6, 30), 2e9),
            ("POORCO", "annual", date(2019, 6, 30), 5e8),      # under $1B
            ("FEWSTMTS", "annual", date(2019, 6, 30), 2e9),
            ("NODESC", "annual", date(2019, 6, 30), 2e9),
            ("ETF1", "annual", date(2019, 6, 30), 2e9),
            ("FEWPRICES", "annual", date(2019, 6, 30), 2e9),
            ("GOOD", "quarterly", date(2019, 6, 30), 2e9),     # wrong report type alone wouldn't qualify
        ],
        "symbol string, report_type string, fiscal_date_ending date, net_income double",
    )
    out = build_universe(cm, cf, "test_universe")
    got = sorted(r.symbol for r in out.collect())
    # GOOD passes everything; CFPATH passes via the cf+transcript OR-branch
    assert got == ["CFPATH", "GOOD"]
    rows = out.collect()
    assert all(100000 <= r.universe_id < 1000000 for r in rows)
    assert universe_id("test_universe") == universe_id("test_universe")  # deterministic
    assert universe_id("a") != universe_id("b")
