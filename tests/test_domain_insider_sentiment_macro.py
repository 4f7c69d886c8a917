"""Differential tests for insider, sentiment, and macro domain
transforms vs python/pandas re-implementations of the reference
semantics, on adversarial fixtures (FIXTURES.md F7-F10: tricky
titles, nulls, overflow values, duplicate load_dates)."""

from __future__ import annotations

import random
import re
import sys
from datetime import date, timedelta
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fin_trade_craft_spark.domain import insider as INS  # noqa: E402
from fin_trade_craft_spark.domain import macro as MAC  # noqa: E402
from fin_trade_craft_spark.domain import sentiment as SEN  # noqa: E402

TITLES = [
    "CEO", "Chief Executive Officer", "President", "Chairman", "CFO",
    "Chief Financial Officer", "COO", "EVP", "SVP", "Director", "Vice President",
    "Secretary", "Treasurer", "Controller", "10% Owner", "Ten Percent Owner",
    "CEO and Director", "See Remarks", None, "", "   EVP,  General   Counsel ",
    "Executive Vice President", "VP of Sales", "Chief Technology Officer",
]


def test_title_normalization_matches_reference(spark):
    """tier_regex/roles/owner vs a python re-implementation of the
    reference's regex tables."""
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TITLES)], "id int, insider_title string")
    got = {r.id: r for r in INS.normalize_titles(df).collect()}

    t3 = [r"\bCEO\b", r"Chief\s+Executive\b", r"\bPresident\b", r"\bChair\b", r"Executive\s+Chair"]
    t2 = [r"\bCFO\b", r"\bCOO\b", r"\bCTO\b", r"\bCIO\b", r"\bCMO\b", r"\bEVP\b", r"\bSVP\b",
          r"Chief\s+\w+\s+Officer", r"Executive\s+Vice\s+President", r"Senior\s+Vice\s+President"]
    t1 = [r"\bDirector\b", r"Vice\s+President\b", r"\bSecretary\b", r"\bTreasurer\b",
          r"Assistant\s+Secretary", r"Associate\s+VP", r"\bController\b"]
    owner = [r"10%\s*Owner", r"Ten\s*Percent\s*Owner"]
    roles = [
        ("CEO", [r"\bCEO\b", r"Chief\s+Executive\b"]), ("President", [r"\bPresident\b"]),
        ("Chair", [r"\bChair\b", r"Executive\s+Chair"]), ("CFO", [r"\bCFO\b", r"Chief\s+Financial\b"]),
        ("COO", [r"\bCOO\b", r"Chief\s+Operating\b"]), ("CTO", [r"\bCTO\b", r"Chief\s+Technology\b"]),
        ("CIO", [r"\bCIO\b", r"Chief\s+Information\b"]), ("EVP", [r"\bEVP\b", r"Executive\s+Vice\s+President"]),
        ("SVP", [r"\bSVP\b", r"Senior\s+Vice\s+President"]), ("Director", [r"\bDirector\b"]),
        ("VP", [r"Vice\s+President\b"]), ("Secretary", [r"\bSecretary\b"]),
        ("Treasurer", [r"\bTreasurer\b"]), ("Controller", [r"\bController\b"]),
    ]

    def any_rx(pats, s):
        return any(re.search(p, s, flags=re.IGNORECASE) for p in pats)

    for i, t in enumerate(TITLES):
        clean = re.sub(r"\s+", " ", (t or "").strip())
        tier = 3 if any_rx(t3, clean) else 2 if any_rx(t2, clean) else 1 if any_rx(t1, clean) else 0
        want_roles = [lbl for lbl, pats in roles if any_rx(pats, clean)]
        r = got[i]
        assert r.executive_title_clean == clean, (t, r.executive_title_clean)
        assert r.seniority_tier == tier, (t, r.seniority_tier, tier)
        assert list(r.standardized_roles) == want_roles, (t, r.standardized_roles, want_roles)
        assert r.is_owner_10pct == any_rx(owner, clean), t


def test_daily_agg_matches_pandas(spark):
    rng = random.Random(17)
    rows = []
    d0 = date(2024, 1, 2)
    for i in range(400):
        rows.append(
            (
                rng.randint(1, 5),
                f"SYM{rng.randint(1, 5)}",
                d0 + timedelta(days=rng.randint(0, 10)),
                rng.choice(TITLES),
                rng.choice(["A", "D"]),
                rng.choice([None, 0.0, float(rng.randint(1, 10000)), 2e16]),
                rng.choice([None, 0.0, round(rng.uniform(1, 500), 2)]),
            )
        )
    pdf = pd.DataFrame(
        rows,
        columns=["symbol_id", "symbol", "transaction_date", "insider_title",
                 "transaction_type", "shares", "price_per_share"],
    )
    # symbol must pair with symbol_id for a clean group key
    pdf["symbol"] = "SYM" + pdf["symbol_id"].astype(str)
    got = INS.daily_agg(spark.createDataFrame(pdf)).toPandas()

    d = pdf[pdf.symbol.notna() & pdf.transaction_date.notna() & pdf.shares.notna()].copy()

    def ilike_tier(t):
        u = (t or "").upper()
        if any(s in u for s in ("CEO", "PRESIDENT", "CHAIR")):
            return 3
        if any(s in u for s in ("CFO", "COO", "CTO", "CIO", "CMO", "EVP", "SVP", "CHIEF", "EXECUTIVE VICE")):
            return 2
        if any(s in u for s in ("DIRECTOR", "VICE PRESIDENT", "SECRETARY", "TREASURER", "CONTROLLER", "VP")):
            return 1
        return 0

    d["tier"] = d.insider_title.map(ilike_tier)
    d["own"] = d.insider_title.map(
        lambda t: bool(re.search("10.*OWNER", (t or "").upper()) or re.search("TEN PERCENT.*OWNER", (t or "").upper()))
    )
    d["tv"] = d.shares * d.price_per_share

    g = got.set_index(["symbol_id", "transaction_date"]).sort_index()
    for (sid, dt), grp in d.groupby(["symbol_id", "transaction_date"]):
        row = g.loc[(sid, dt)]
        for ty in ("d", "a"):
            m = grp[grp.transaction_type == ty.upper()]
            from decimal import Decimal
            exact = sum(Decimal(str(v)) for v in m.shares)
            assert row[f"total_shares_{ty}"] == int(exact), (sid, dt, ty)
            assert row[f"transaction_count_{ty}"] == len(m)
            wv = m.tv.fillna(0).sum()
            assert abs(row[f"total_value_{ty}"] - wv) <= 1e-6 + 1e-9 * abs(wv)
            for k in range(4):
                assert row[f"total_shares_{ty}_tier_{k}"] == int(sum(Decimal(str(v)) for v in m[m.tier == k].shares))
            assert row[f"total_shares_{ty}_10pct_owner"] == int(sum(Decimal(str(v)) for v in m[m.own].shares))
            ap = m.price_per_share.mean()
            gp = row[f"avg_price_{ty}"]
            assert (pd.isna(ap) and pd.isna(gp)) or abs(gp - ap) < 1e-9


def test_sentiment_agg_matches_pandas(spark):
    rng = random.Random(23)
    titles = ["CEO", "Chief Financial Officer", "COO", "VP of Ops", "Analyst",
              "Operator", "Moderator", "Random Person", "Director", "Manager", None]
    rows = []
    for i in range(300):
        rows.append(
            (rng.randint(1, 6), f"S{rng.randint(1, 6)}", f"2024Q{rng.randint(1, 4)}",
             rng.choice(titles), rng.choice([None, round(rng.random(), 3)]))
        )
    pdf = pd.DataFrame(rows, columns=["symbol_id", "symbol", "quarter", "title", "sentiment"])
    pdf["symbol"] = "S" + pdf["symbol_id"].astype(str)
    got = SEN.sentiment_agg(spark.createDataFrame(pdf)).toPandas()

    def bucket(t):
        u = (t or "").upper()
        for b, subs in SEN.ROLE_BUCKETS:
            if any(s.upper() in u for s in subs):
                return b
        return "other"

    d = pdf[pdf.sentiment.notna()].copy()
    d["rc"] = d.title.map(bucket)
    d = d[~d.rc.isin(["external", "other"])]
    gk = got.set_index(["symbol_id", "quarter"]).sort_index()
    seen = set()
    for (sid, q), grp in d.groupby(["symbol_id", "quarter"]):
        mgmt = grp[grp.rc.isin(["csuite", "cfo", "senior_exec"])]
        if len(mgmt) == 0:
            assert (sid, q) not in gk.index  # HAVING clause
            continue
        seen.add((sid, q))
        row = gk.loc[(sid, q)]
        for b in ("csuite", "cfo", "senior_exec", "vp_director", "analyst_ir"):
            want = grp[grp.rc == b].sentiment.mean()
            gv = row[f"sentiment_{b}"]
            assert (pd.isna(want) and pd.isna(gv)) or abs(gv - want) < 1e-9, (sid, q, b)
            assert row[f"count_{b}"] == len(grp[grp.rc == b])
        wexp = (
            (grp[grp.rc == "cfo"].sentiment.mean() if len(grp[grp.rc == "cfo"]) else 0) * 0.4
            + (grp[grp.rc == "csuite"].sentiment.mean() if len(grp[grp.rc == "csuite"]) else 0) * 0.4
            + (grp[grp.rc == "senior_exec"].sentiment.mean() if len(grp[grp.rc == "senior_exec"]) else 0) * 0.2
        )
        assert abs(row["sentiment_management_weighted"] - wexp) < 1e-9
        assert row["count_total_statements"] == len(grp)
    assert set(map(tuple, got[["symbol_id", "quarter"]].values)) == seen


def test_macro_features_match_pandas(spark):
    rng = random.Random(31)
    rows = []
    d0 = date(2022, 1, 1)
    for ind in ["GDP", "CPI", "T10Y"]:
        v = 100.0
        for i in range(300):
            v *= 1 + rng.gauss(0, 0.01)
            rows.append((ind, d0 + timedelta(days=i), round(v, 4), d0 + timedelta(days=i)))
    pdf = pd.DataFrame(rows, columns=["indicator", "date", "value", "load_date"])
    # duplicate (series, date) rows with older load_date → dedup drops them
    dups = pdf.sample(20, random_state=1).copy()
    dups["value"] = -999.0
    dups["load_date"] = dups["load_date"] - timedelta(days=5)
    full = pd.concat([pdf, dups], ignore_index=True)

    deduped = MAC.dedup_latest_load(spark.createDataFrame(full), "indicator")
    assert deduped.count() == len(pdf)
    assert deduped.filter("value = -999.0").count() == 0

    got = (
        MAC.economic_indicator_features(deduped)
        .toPandas()
        .sort_values(["indicator", "date"])
        .reset_index(drop=True)
    )

    w = pdf.sort_values(["indicator", "date"]).reset_index(drop=True).copy()
    grouped = w.groupby("indicator")
    for win in (21, 63, 252):
        mp = max(2, win // 2)
        w[f"econ_value_zscore_{win}d"] = grouped["value"].transform(
            lambda x, win=win, mp=mp: (x - x.rolling(win, min_periods=mp).mean())
            / (x.rolling(win, min_periods=mp).std() + 1e-8)
        )
    for k in (1, 5, 21, 63):
        w[f"econ_return_{k}d"] = grouped["value"].pct_change(k, fill_method=None)
    w["econ_volatility_21d"] = grouped["econ_return_1d"].transform(lambda x: x.rolling(21, min_periods=10).std())
    w["econ_volatility_63d"] = grouped["econ_return_1d"].transform(lambda x: x.rolling(63, min_periods=30).std())
    ma5 = grouped["value"].transform(lambda x: x.rolling(5, min_periods=3).mean())
    ma21 = grouped["value"].transform(lambda x: x.rolling(21, min_periods=10).mean())
    ma63 = grouped["value"].transform(lambda x: x.rolling(63, min_periods=30).mean())
    w["econ_ma5_ma21_ratio"] = ma5 / (ma21 + 1e-6)
    w["econ_ma21_ma63_ratio"] = ma21 / (ma63 + 1e-6)

    def slope(series):
        s = series.dropna()
        if len(s) < 2:
            return np.nan
        return np.polyfit(np.arange(len(s)), s.values, 1)[0]

    for win in (21, 63):
        w[f"econ_trend_slope_{win}d"] = grouped["value"].transform(
            lambda x, win=win: x.rolling(win, min_periods=max(2, win // 2)).apply(slope, raw=False)
        )
    gains = w.groupby("indicator")["econ_return_1d"].transform(lambda x: x.where(x > 0, 0))
    losses = w.groupby("indicator")["econ_return_1d"].transform(lambda x: -x.where(x < 0, 0))
    ag = gains.groupby(w["indicator"]).transform(lambda x: x.rolling(14, min_periods=7).mean())
    al = losses.groupby(w["indicator"]).transform(lambda x: x.rolling(14, min_periods=7).mean())
    w["econ_rsi_14d"] = 100 - 100 / (1 + ag / (al + 1e-6))
    w["econ_return_5d_rank"] = w.groupby("date")["econ_return_5d"].rank(pct=True)
    w["econ_volatility_21d_rank"] = w.groupby("date")["econ_volatility_21d"].rank(pct=True)
    w["econ_sharp_move_flag"] = (w["econ_value_zscore_21d"].abs() > 2).astype(int)
    w["econ_high_volatility_flag"] = (w["econ_volatility_21d_rank"] > 0.75).astype(int)

    for col in [c for c in w.columns if c.startswith("econ_")]:
        a = pd.to_numeric(got[col], errors="coerce").astype(float)
        b = pd.to_numeric(w[col], errors="coerce").astype(float)
        ok = (a.isna() & b.isna()) | ((a - b).abs() <= 1e-7 + 1e-7 * b.abs())
        assert ok.all(), f"{col}: {(~ok).sum()} mismatches got={a[~ok].head(3).tolist()} want={b[~ok].head(3).tolist()}"
