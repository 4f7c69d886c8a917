"""Differential tests for the microstructure + meta-label/CUSUM
queries beyond their DuckDB value oracles: each result is re-derived
independently in plain Python (integer-cents arithmetic, the same
agreed double expression trees) from the raw events and compared
exactly, plus the structural invariants a consumer relies on
(bar dollar floors, correlation bounds, side/label agreement,
threshold-crossing magnitudes).
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd

from conftest import SF_SMOKE

from fin_trade_craft_spark.queries.fin_ml import (
    CUSUM_H_CENTS,
    META_SMA_N,
    cusum_event_filter,
    meta_labels,
)
from fin_trade_craft_spark.queries.microstructure import (
    DOLLAR_BAR_CENTS,
    XSECT_TOP_K,
    cross_sectional_correlation,
    dollar_bars,
    microstructure_liquidity,
    order_flow_imbalance,
    volatility_estimators,
    vpin_dollar_buckets,
)


def _events_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMOKE}/events.parquet")


def _cents(v: float) -> int:
    # CAST(value AS DECIMAL(18,2)) * 100 — round-half-up on the
    # already-2-decimal doubles is plain nearest-int rounding
    return int(round(v * 100))


def _daily_bars(ev: pd.DataFrame) -> pd.DataFrame:
    """Per (user, day): close = last tick by (ts, event_id), plus
    exact-cents dollar volume — the ohlcv_resample contract."""
    ev = ev.sort_values(["ts", "event_id"]).copy()
    ev["date"] = ev["ts"].dt.floor("D")
    rows = []
    for (uid, date), g in ev.groupby(["user_id", "date"], sort=True):
        cents = sum(_cents(v) for v in g["value"])
        # traded_value takes the dsum double hop, then the queries
        # re-cast it to DECIMAL(12,2) — recover via the same round
        dvol_c = _cents(float(cents / 100.0))
        rows.append(
            {
                "user_id": uid,
                "date": date,
                "close_c": _cents(g["value"].iloc[-1]),
                "dvol_c": dvol_c,
            }
        )
    return pd.DataFrame(rows).sort_values(["user_id", "date"]).reset_index(drop=True)


def test_dollar_bars_match_python_recompute(spark):
    got = dollar_bars(spark, SF_SMOKE).collect()
    ev = _events_pdf().sort_values(["ts", "event_id"])
    exp: dict[tuple[int, int], dict] = {}
    for uid, g in ev.groupby("user_id", sort=False):
        pre = 0
        for _, r in g.iterrows():
            c = _cents(r["value"])
            bar = pre // DOLLAR_BAR_CENTS
            pre += c
            k = (uid, bar)
            if k not in exp:
                exp[k] = {
                    "open": r["value"],
                    "high": r["value"],
                    "low": r["value"],
                    "close": r["value"],
                    "n": 0,
                    "cents": 0,
                }
            e = exp[k]
            e["high"] = max(e["high"], r["value"])
            e["low"] = min(e["low"], r["value"])
            e["close"] = r["value"]  # rows arrive in (ts, event_id) order
            e["n"] += 1
            e["cents"] += c
    assert len(got) == len(exp)
    for row in got:
        e = exp[(row["user_id"], row["bar_id"])]
        assert row["open"] == e["open"] and row["close"] == e["close"]
        assert row["high"] == e["high"] and row["low"] == e["low"]
        assert row["n_ticks"] == e["n"]
        assert row["dollar_volume"] == e["cents"] / 100.0
    # boundary invariant: the cumulative flow through the END of
    # every non-final bar k has crossed the (k+1)·T boundary (an
    # overshooting tick can leave an individual bar under T, but
    # never the cumulative total)
    by_user: dict[int, list] = {}
    for row in got:
        by_user.setdefault(row["user_id"], []).append(row)
    for rows in by_user.values():
        rows.sort(key=lambda r: r["bar_id"])
        cum = 0
        for r in rows[:-1]:
            cum += round(r["dollar_volume"] * 100)
            assert cum >= (r["bar_id"] + 1) * DOLLAR_BAR_CENTS


def test_microstructure_liquidity_matches_python_recompute(spark):
    got = {r["user_id"]: r for r in microstructure_liquidity(spark, SF_SMOKE).collect()}
    bars = _daily_bars(_events_pdf())
    assert len(got) == bars["user_id"].nunique()
    for uid, g in bars.groupby("user_id"):
        cc = list(g["close_c"])
        dv = list(g["dvol_c"])
        dps = [cc[i] - cc[i - 1] for i in range(1, len(cc))]
        dvs = dv[1:]
        r = got[uid]
        assert r["n_moves"] == len(dps)
        # Roll over adjacent pairs (all-integer sums, double tree)
        pairs = [(dps[i], dps[i - 1]) for i in range(1, len(dps))]
        if len(pairs) >= 2:
            n = float(len(pairs))
            sx = float(sum(x for x, _ in pairs)) / 100.0
            sy = float(sum(y for _, y in pairs)) / 100.0
            sxy = float(sum(x * y for x, y in pairs)) / 10000.0
            cov = (sxy - sx * sy / n) / n
            assert r["roll_spread"] == 2.0 * math.sqrt(max(0.0, -cov))
        # Amihud ratio of sums
        if dps:
            s_abs = sum(abs(d) for d in dps) / 100.0
            s_dv = sum(dvs) / 100.0
            assert r["amihud_illiq"] == 1e6 * s_abs / s_dv
        # Kyle lambda on signed dollar volume
        if len(dps) >= 2:
            xs = [dv_i if d > 0 else (-dv_i if d < 0 else 0) for d, dv_i in zip(dps, dvs)]
            n = float(len(dps))
            k_sx = sum(xs) / 100.0
            k_sy = sum(dps) / 100.0
            k_sxy = sum(x * d for x, d in zip(xs, dps)) / 10000.0
            k_sxx = sum(x * x for x in xs) / 10000.0
            den = n * k_sxx - k_sx * k_sx
            if den != 0:
                assert r["kyle_lambda"] == (n * k_sxy - k_sx * k_sy) / den


def test_cross_sectional_correlation_bounds_and_recompute(spark):
    rows = cross_sectional_correlation(spark, SF_SMOKE).collect()
    assert rows, "expected at least one correlated pair"
    assert len(rows) <= XSECT_TOP_K * (XSECT_TOP_K - 1) // 2
    users = set()
    for r in rows:
        assert r["user_a"] < r["user_b"]
        assert r["n_days"] >= 3
        if r["corr_dp"] is not None:
            assert -1.0 - 1e-12 <= r["corr_dp"] <= 1.0 + 1e-12
        users.update([r["user_a"], r["user_b"]])
    assert len(users) <= XSECT_TOP_K
    # spot-recompute one pair with integer-cents sums
    bars = _daily_bars(_events_pdf())
    r0 = rows[0]
    sub = {}
    for uid in (r0["user_a"], r0["user_b"]):
        g = bars[bars["user_id"] == uid]
        cc = list(g["close_c"])
        sub[uid] = dict(zip(list(g["date"])[1:], [cc[i] - cc[i - 1] for i in range(1, len(cc))]))
    common = sorted(set(sub[r0["user_a"]]) & set(sub[r0["user_b"]]))
    assert len(common) == r0["n_days"]
    xs = [sub[r0["user_a"]][d] for d in common]
    ys = [sub[r0["user_b"]][d] for d in common]
    n = float(len(common))
    sx, sy = sum(xs) / 100.0, sum(ys) / 100.0
    sxy = sum(x * y for x, y in zip(xs, ys)) / 10000.0
    sxx = sum(x * x for x in xs) / 10000.0
    syy = sum(y * y for y in ys) / 10000.0
    den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    assert r0["corr_dp"] == (n * sxy - sx * sy) / den


def test_meta_labels_side_and_agreement(spark):
    got = meta_labels(spark, SF_SMOKE).collect()
    assert got
    bars = _daily_bars(_events_pdf())
    sides = {}
    for uid, g in bars.groupby("user_id"):
        cc = list(g["close_c"])
        dates = list(g["date"])
        for i in range(META_SMA_N - 1, len(cc)):
            lhs = META_SMA_N * cc[i]
            s5 = sum(cc[i - META_SMA_N + 1 : i + 1])
            sides[(uid, dates[i])] = 1 if lhs > s5 else (-1 if lhs < s5 else 0)
    for r in got:
        assert r["side"] == sides[(r["user_id"], r["date"])]
        assert r["side"] != 0
        assert r["meta_label"] == (1 if r["side"] == r["tb_label"] else 0)
        assert r["tb_label"] in (-1, 0, 1)


def test_cusum_event_filter_matches_python_replay(spark):
    got = cusum_event_filter(spark, SF_SMOKE).collect()
    bars = _daily_bars(_events_pdf())
    exp = []
    for uid, g in bars.groupby("user_id"):
        cc = list(g["close_c"])
        dates = list(g["date"])
        sp = sm = 0
        for i in range(1, len(cc)):
            delta = cc[i] - cc[i - 1]
            sp = max(0, sp + delta)
            sm = min(0, sm + delta)
            if sp > CUSUM_H_CENTS:
                exp.append((uid, dates[i], 1, sp / 100.0))
                sp = 0
            elif sm < -CUSUM_H_CENTS:
                exp.append((uid, dates[i], -1, -sm / 100.0))
                sm = 0
    exp.sort()
    assert len(got) == len(exp)
    for row, (uid, date, direction, stat) in zip(got, exp):
        assert (row["user_id"], row["date"], row["direction"], row["stat"]) == (
            uid,
            date.to_pydatetime(),
            direction,
            stat,
        )
        assert row["stat"] > CUSUM_H_CENTS / 100.0


def _tick_signs(ev: pd.DataFrame) -> pd.DataFrame:
    """Per-user tick-rule signs with the last-nonzero carry."""
    ev = ev.sort_values(["ts", "event_id"]).copy()
    out = []
    for uid, g in ev.groupby("user_id", sort=False):
        prev_c = None
        sign = None
        pre = 0
        for _, r in g.iterrows():
            c = _cents(r["value"])
            if prev_c is not None:
                d = c - prev_c
                if d > 0:
                    sign = 1
                elif d < 0:
                    sign = -1
            out.append(
                {
                    "user_id": uid,
                    "ts": r["ts"],
                    "event_id": r["event_id"],
                    "cc": c,
                    "sign": sign,
                    "pre_cum": pre,
                }
            )
            pre += c
            prev_c = c
    return pd.DataFrame(out)


def test_volatility_estimators_match_python_recompute(spark):
    import numpy as np

    got = {r["user_id"]: r for r in volatility_estimators(spark, SF_SMOKE).collect()}
    ev = _events_pdf().sort_values(["ts", "event_id"]).copy()
    ev["date"] = ev["ts"].dt.floor("D")
    ln10 = math.log(10.0)
    c2 = 2.0 * math.log(2.0) - 1.0
    cpark = 1.0 / (4.0 * math.log(2.0))
    agg: dict[int, list] = {}
    for (uid, _), g in ev.groupby(["user_id", "date"], sort=True):
        o, c = g["value"].iloc[0], g["value"].iloc[-1]
        h, lo = g["value"].max(), g["value"].min()
        if lo <= 0 or o <= 0 or c <= 0:
            continue
        lhl = math.log10(h / lo) * ln10
        lco = math.log10(c / o) * ln10
        lhc = math.log10(h / c) * ln10
        lho = math.log10(h / o) * ln10
        llc = math.log10(lo / c) * ln10
        llo = math.log10(lo / o) * ln10
        agg.setdefault(uid, []).append(
            (lhl * lhl, 0.5 * lhl * lhl - c2 * lco * lco, lhc * lho + llc * llo)
        )
    assert set(got) == set(agg)
    for uid, ts in agg.items():
        n = float(len(ts))
        park = math.sqrt(cpark * math.fsum(sorted(t[0] for t in ts)) / n)
        gk = math.sqrt(max(0.0, math.fsum(sorted(t[1] for t in ts)) / n))
        rs = math.sqrt(max(0.0, math.fsum(sorted(t[2] for t in ts)) / n))
        r = got[uid]
        assert r["n_bars"] == len(ts)
        # engine folds left-associated (not fsum); allow only the
        # last-ulp gap fsum can introduce, far inside the round(12)
        assert abs(r["parkinson_vol"] - park) < 1e-9
        assert abs(r["garman_klass_vol"] - gk) < 1e-9
        assert abs(r["rogers_satchell_vol"] - rs) < 1e-9


def test_order_flow_imbalance_matches_python_recompute(spark):
    got = {(r["user_id"], r["date"]): r for r in order_flow_imbalance(spark, SF_SMOKE).collect()}
    t = _tick_signs(_events_pdf())
    t = t[t["sign"].notna()]
    t["date"] = t["ts"].dt.floor("D")
    exp = {}
    for (uid, date), g in t.groupby(["user_id", "date"]):
        buy = int(g.loc[g["sign"] == 1, "cc"].sum())
        sell = int(g.loc[g["sign"] == -1, "cc"].sum())
        exp[(uid, date.to_pydatetime())] = (buy, sell)
    assert set(got) == set(exp)
    for k, (buy, sell) in exp.items():
        r = got[k]
        assert r["buy_flow"] == buy / 100.0
        assert r["sell_flow"] == sell / 100.0
        if buy + sell:
            assert r["flow_imbalance"] == (buy - sell) / float(buy + sell)


def test_vpin_dollar_buckets_matches_python_recompute(spark):
    from fin_trade_craft_spark.queries.microstructure import VPIN_WINDOW

    got = vpin_dollar_buckets(spark, SF_SMOKE).collect()
    assert got, "expected VPIN rows at smoke scale"
    t = _tick_signs(_events_pdf())
    t = t[t["sign"].notna()].copy()
    t["bucket"] = t["pre_cum"] // DOLLAR_BAR_CENTS
    exp = {}
    for uid, g in t.groupby("user_id"):
        ratios = []
        for b, gb in g.groupby("bucket"):
            buy = int(gb.loc[gb["sign"] == 1, "cc"].sum())
            sell = int(gb.loc[gb["sign"] == -1, "cc"].sum())
            tox = abs(buy - sell) / float(buy + sell) if buy + sell else None
            ratios.append((b, tox))
        for i in range(VPIN_WINDOW - 1, len(ratios)):
            trail = [x for _, x in ratios[i - VPIN_WINDOW + 1 : i + 1]]
            b, tox = ratios[i]
            exp[(uid, b)] = (tox, math.fsum(sorted(trail)) / VPIN_WINDOW)
    assert len(got) == len(exp)
    for r in got:
        tox, vpin = exp[(r["user_id"], r["bucket"])]
        assert r["toxicity"] == tox
        assert abs(r["vpin"] - vpin) < 1e-12
        assert -1e-12 <= r["vpin"] <= 1.0 + 1e-12


def test_bet_sizing_expanding_matches_walk(spark):
    from fin_trade_craft_spark.queries.fin_ml import BET_MIN_PRIOR, bet_sizing_expanding

    meta = meta_labels(spark, SF_SMOKE).collect()
    got = bet_sizing_expanding(spark, SF_SMOKE).collect()
    assert got
    hist: dict[int, list] = {}
    exp = {}
    for r in meta:  # already ordered (user, date)
        h = hist.setdefault(r["user_id"], [])
        if len(h) >= BET_MIN_PRIOR:
            p = sum(h) / float(len(h))
            exp[(r["user_id"], r["date"])] = (
                r["side"],
                len(h),
                sum(h),
                float(r["side"]) * (2.0 * p - 1.0),
            )
        h.append(r["meta_label"])
    assert len(got) == len(exp)
    for r in got:
        side, bets, hits, size = exp[(r["user_id"], r["date"])]
        assert (r["side"], r["prior_bets"], r["prior_hits"]) == (side, bets, hits)
        assert r["bet_size"] == size
        assert -1.0 <= r["bet_size"] <= 1.0


def test_cusum_sampled_labels_compose(spark):
    from fin_trade_craft_spark.queries.fin_ml import (
        cusum_sampled_labels,
        triple_barrier_labels,
    )

    fires = {(r["user_id"], r["date"]): r for r in cusum_event_filter(spark, SF_SMOKE).collect()}
    labels = {
        (r["user_id"], r["date"]): r for r in triple_barrier_labels(spark, SF_SMOKE).collect()
    }
    got = cusum_sampled_labels(spark, SF_SMOKE).collect()
    # every fire date has a bar, so the inner join keeps all fires
    assert len(got) == len(fires)
    for r in got:
        k = (r["user_id"], r["date"])
        f, l = fires[k], labels[k]
        assert (r["direction"], r["stat"]) == (f["direction"], f["stat"])
        assert (r["label"], r["bars_to_hit"], r["close"]) == (
            l["label"],
            l["bars_to_hit"],
            l["close"],
        )
        assert r["drift_confirmed"] == (1 if r["direction"] == r["label"] else 0)


def test_realized_variance_jumps_matches_python_recompute(spark):
    from fin_trade_craft_spark.queries.microstructure import (
        RV_JUMP_MARGIN,
        realized_variance_jumps,
    )

    got = {(r["user_id"], r["date"]): r for r in realized_variance_jumps(spark, SF_SMOKE).collect()}
    ev = _events_pdf().sort_values(["ts", "event_id"]).copy()
    ev["date"] = ev["ts"].dt.floor("D")
    half_pi = math.pi / 2.0
    n_checked = 0
    for (uid, date), g in ev.groupby(["user_id", "date"]):
        cc = [_cents(v) for v in g["value"]]
        ds = [cc[i] - cc[i - 1] for i in range(1, len(cc))]
        if len(ds) < 2:
            assert (uid, date.to_pydatetime()) not in got
            continue
        rv_c = sum(d * d for d in ds)
        bp_c = sum(abs(ds[i]) * abs(ds[i - 1]) for i in range(1, len(ds)))
        r = got[(uid, date.to_pydatetime())]
        assert r["n_moves"] == len(ds)
        assert r["rv"] == rv_c / 10000.0
        assert r["bpv"] == half_pi * (bp_c / 10000.0)
        assert r["jump_flag"] == (r["rv"] > (1.0 + RV_JUMP_MARGIN) * r["bpv"])
        n_checked += 1
    assert n_checked == len(got)


def test_feature_mi_ranking_matches_python_recompute(spark):
    from collections import Counter

    from fin_trade_craft_spark.queries.fin_ml import (
        MI_ABS_DP_EDGES,
        MI_VOL_EDGES,
        feature_mi_ranking,
        triple_barrier_labels,
    )

    got = {r["feature"]: r for r in feature_mi_ranking(spark, SF_SMOKE).collect()}
    assert set(got) == {"momentum_sign", "abs_dp_bucket", "volume_bucket"}
    labels = {
        (r["user_id"], r["date"]): r["label"]
        for r in triple_barrier_labels(spark, SF_SMOKE).collect()
    }
    ev = _events_pdf().sort_values(["ts", "event_id"]).copy()
    ev["date"] = ev["ts"].dt.floor("D")
    rows = []
    for uid, g in ev.groupby("user_id"):
        days = g.groupby("date")
        prev = None
        for date, gd in days:
            cc = _cents(gd["value"].iloc[-1])
            vol = len(gd)
            if prev is not None:
                rows.append((uid, date.to_pydatetime(), cc - prev, vol))
            prev = cc
    feats = {
        "momentum_sign": lambda d, v: 1 if d > 0 else (-1 if d < 0 else 0),
        "abs_dp_bucket": lambda d, v: 0
        if abs(d) < MI_ABS_DP_EDGES[0]
        else (1 if abs(d) < MI_ABS_DP_EDGES[1] else 2),
        "volume_bucket": lambda d, v: 0
        if v < MI_VOL_EDGES[0]
        else (1 if v < MI_VOL_EDGES[1] else 2),
    }
    for fname, fn in feats.items():
        cells = Counter()
        for uid, date, d, v in rows:
            cells[(fn(d, v), labels[(uid, date)])] += 1
        n = sum(cells.values())
        mx = Counter()
        my = Counter()
        for (b, l), c in cells.items():
            mx[b] += c
            my[l] += c
        terms = sorted(
            (c / n) * math.log(c * n / (mx[b] * my[l])) for (b, l), c in cells.items()
        )
        acc = 0.0
        for t in terms:
            acc += t
        r = got[fname]
        assert r["n_rows"] == n
        assert r["n_cells"] == len(cells)
        # engine path goes log10*ln10 with round(12); compare at 1e-9
        assert abs(r["mi_nats"] - acc) < 1e-9
        assert r["mi_nats"] >= -1e-9  # MI is non-negative


def test_triple_barrier_dynamic_matches_python_recompute(spark):
    from fin_trade_craft_spark.queries.fin_ml import (
        TB_HORIZON,
        TBD_VOL_N,
        triple_barrier_dynamic,
    )

    got = {(r["user_id"], r["date"]): r for r in triple_barrier_dynamic(spark, SF_SMOKE).collect()}
    assert got
    bars = _daily_bars(_events_pdf())
    closes = {}
    for uid, g in bars.groupby("user_id"):
        closes[uid] = (list(g["date"]), list(g["close_c"]))
    n_checked = 0
    for uid, (dates, cc) in closes.items():
        dps = [None] + [cc[i] - cc[i - 1] for i in range(1, len(cc))]
        for i in range(len(cc)):
            window = [d for d in dps[max(0, i - TBD_VOL_N + 1) : i + 1] if d is not None]
            key = (uid, dates[i].to_pydatetime())
            if len(window) != TBD_VOL_N:
                assert key not in got
                continue
            nv = float(TBD_VOL_N)
            s1 = float(sum(window)) / 100.0
            s2 = float(sum(d * d for d in window)) / 10000.0
            sigma = math.sqrt(max(0.0, (nv * s2 - s1 * s1) / (nv * (nv - 1.0))))
            r = got[key]
            assert r["sigma"] == sigma
            close = cc[i] / 100.0
            # replay the barrier scan against raw lead closes
            first_up = first_dn = None
            for k in range(1, TB_HORIZON + 1):
                if i + k >= len(cc):
                    break
                lead = cc[i + k] / 100.0
                if first_up is None and lead >= close + 2.0 * sigma:
                    first_up = k
                if first_dn is None and lead <= close - 2.0 * sigma:
                    first_dn = k
            if first_up is not None and (first_dn is None or first_up <= first_dn):
                exp_label, exp_hit = 1, first_up
            elif first_dn is not None:
                exp_label, exp_hit = -1, first_dn
            else:
                exp_label, exp_hit = 0, None
            assert (r["label"], r["bars_to_hit"]) == (exp_label, exp_hit)
            n_checked += 1
    assert n_checked == len(got)


def test_return_moments_matches_python_recompute(spark):
    from fin_trade_craft_spark.queries.microstructure import return_moments

    got = {r["user_id"]: r for r in return_moments(spark, SF_SMOKE).collect()}
    assert got
    bars = _daily_bars(_events_pdf())
    for uid, g in bars.groupby("user_id"):
        cc = list(g["close_c"])
        ds = [cc[i] - cc[i - 1] for i in range(1, len(cc))]
        if len(ds) < 4:
            assert uid not in got
            continue
        n = float(len(ds))
        s1 = float(sum(ds)) / 1e2
        s2 = float(sum(d * d for d in ds)) / 1e4
        s3 = float(sum(d**3 for d in ds)) / 1e6
        s4 = float(sum(d**4 for d in ds)) / 1e8
        mean = s1 / n
        m2 = s2 / n - mean * mean
        m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean
        m4 = (
            s4 / n
            - 4.0 * mean * (s3 / n)
            + 6.0 * mean * mean * (s2 / n)
            - 3.0 * mean * mean * mean * mean
        )
        r = got[uid]
        assert r["n"] == len(ds)
        assert r["mean_dp"] == mean
        assert r["std_dp"] == math.sqrt(max(0.0, m2))
        if m2 > 0:
            assert r["skew_dp"] == m3 / (m2 * math.sqrt(m2))
            assert r["ex_kurt_dp"] == m4 / (m2 * m2) - 3.0
            # sanity: excess kurtosis bounded below by skew²-2
            assert r["ex_kurt_dp"] >= r["skew_dp"] ** 2 - 2.0 - 1e-9


def test_tick_imbalance_bars_matches_python_replay(spark):
    from fin_trade_craft_spark.queries.microstructure import (
        TIB_E_INIT,
        TIB_E_MIN,
        tick_imbalance_bars,
    )

    got = tick_imbalance_bars(spark, SF_SMOKE).collect()
    assert got
    t = _tick_signs(_events_pdf())
    t = t[t["sign"].notna()]
    exp = []
    for uid, g in t.groupby("user_id"):
        theta = n_in = 0
        e_cur, seq = TIB_E_INIT, 0
        for _, r in g.iterrows():
            theta += int(r["sign"])
            n_in += 1
            if abs(theta) >= e_cur:
                exp.append(
                    (uid, seq, int(r["event_id"]), n_in, e_cur, 1 if theta > 0 else -1)
                )
                e_cur = max(TIB_E_MIN, (e_cur + n_in) // 2)
                theta, n_in = 0, 0
                seq += 1
    exp.sort()
    assert len(got) == len(exp)
    for row, e in zip(got, exp):
        assert (
            row["user_id"],
            row["bar_seq"],
            row["closed_at_event"],
            row["n_signed"],
            row["threshold"],
            row["direction"],
        ) == e
        # threshold equality at close: |theta| hits E exactly
        assert row["n_signed"] >= row["threshold"]


def test_drawdown_panel_matches_python_recompute(spark):
    from fin_trade_craft_spark.queries.microstructure import drawdown_panel

    got = {r["user_id"]: r for r in drawdown_panel(spark, SF_SMOKE).collect()}
    bars = _daily_bars(_events_pdf())
    assert len(got) == bars["user_id"].nunique()
    for uid, g in bars.groupby("user_id"):
        cc = list(g["close_c"])
        peak = dd_max = spell_max = 0
        last_peak_i = 0
        max_dd_frac = 0.0
        for i, c in enumerate(cc):
            if c >= peak:
                peak = c
            if c == peak:
                last_peak_i = i
            dd = peak - c
            dd_max = max(dd_max, dd)
            max_dd_frac = max(max_dd_frac, (dd / 100.0) / (peak / 100.0))
            spell_max = max(spell_max, i - last_peak_i)
        r = got[uid]
        assert r["n_days"] == len(cc)
        assert r["peak_close"] == peak / 100.0
        assert r["max_dd"] == dd_max / 100.0
        assert r["max_dd_frac"] == max_dd_frac
        assert r["longest_underwater"] == spell_max
        assert 0.0 <= r["max_dd_frac"] < 1.0


def test_pairs_spread_zscore_invariants(spark):
    from fin_trade_craft_spark.queries.microstructure import (
        PAIRS_Z_WINDOW,
        pairs_spread_zscore,
    )

    rows = pairs_spread_zscore(spark, SF_SMOKE).collect()
    assert rows
    # exactly one pair, the argmax-|corr| one from the panel
    pair = {(r["user_a"], r["user_b"]) for r in rows}
    assert len(pair) == 1
    corr = {
        (r["user_a"], r["user_b"]): r["corr_dp"]
        for r in cross_sectional_correlation(spark, SF_SMOKE).collect()
        if r["corr_dp"] is not None
    }
    best = max(corr, key=lambda k: (abs(corr[k]), -k[0], -k[1]))
    assert pair == {best}
    beta = rows[0]["beta"]
    assert all(r["beta"] == beta for r in rows)
    # replay the trailing z from the emitted spreads requires the
    # pre-window spreads too — recompute from bars directly
    bars = _daily_bars(_events_pdf())
    ua, ub = next(iter(pair))
    ga = bars[bars["user_id"] == ua].set_index("date")["close_c"]
    gb = bars[bars["user_id"] == ub].set_index("date")["close_c"]
    common = sorted(set(ga.index) & set(gb.index))
    n = float(len(common))
    xs = [gb[d] for d in common]
    ys = [ga[d] for d in common]
    sx, sy = sum(xs) / 100.0, sum(ys) / 100.0
    sxy = sum(x * y for x, y in zip(xs, ys)) / 10000.0
    sxx = sum(x * x for x in xs) / 10000.0
    exp_beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert beta == exp_beta
    spreads = [ya / 100.0 - exp_beta * (xb / 100.0) for xb, ya in zip(xs, ys)]
    got_by_date = {r["date"]: r for r in rows}
    for i, d in enumerate(common):
        if i < PAIRS_Z_WINDOW - 1:
            assert d.to_pydatetime() not in got_by_date
            continue
        trail = sorted(spreads[i - PAIRS_Z_WINDOW + 1 : i + 1])
        trail2 = sorted(s * s for s in spreads[i - PAIRS_Z_WINDOW + 1 : i + 1])
        acc = 0.0
        for x in trail:
            acc += x
        acc2 = 0.0
        for x in trail2:
            acc2 += x
        mean = acc / PAIRS_Z_WINDOW
        var = acc2 / PAIRS_Z_WINDOW - mean * mean
        r = got_by_date[d.to_pydatetime()]
        assert r["spread"] == spreads[i]
        if var > 0:
            assert r["z_spread"] == (spreads[i] - mean) / math.sqrt(var)


def test_inverse_variance_weights_sum_to_one_and_recompute(spark):
    from fin_trade_craft_spark.queries.microstructure import inverse_variance_weights

    rows = inverse_variance_weights(spark, SF_SMOKE).collect()
    assert rows
    assert len(rows) <= XSECT_TOP_K
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-12
    bars = _daily_bars(_events_pdf())
    for r in rows:
        g = bars[bars["user_id"] == r["user_id"]]
        cc = list(g["close_c"])
        ds = [cc[i] - cc[i - 1] for i in range(1, len(cc))]
        n = float(len(ds))
        s1 = float(sum(ds)) / 1e2
        s2 = float(sum(d * d for d in ds)) / 1e4
        var = (n * s2 - s1 * s1) / (n * (n - 1.0))
        assert r["var_dp"] == var
        assert r["weight"] > 0


def _const_delta_sf_dir(tmp_path, n_days: int) -> str:
    """A degenerate fixture: two series whose daily close rises by
    EXACTLY one cent per day.  The population variance of Δclose is
    zero in exact arithmetic, but the double cancellation
    s2/n − mean² (and the matching correlation denominator
    n·sxx − sx²) rounds a hair NEGATIVE for specific n — pre-guard,
    Spark yielded NaN while DuckDB's SQRT raised 'Out of Range'
    (ADVICE r10), so the oracle replay crashed on data the engine
    handled.  n_days=7 → 6 moves triggers the moments case;
    n_days=8 → 7 shared ret days triggers the correlation case."""
    import json

    rows = []
    eid = 0
    for u in (1, 2):
        for k in range(n_days):
            rows.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp(2024, 1, 1 + k, 12, 0, 0),
                    "user_id": u,
                    "event_type": "purchase",
                    "value": round(100.00 + 0.01 * k, 2),
                    "props": json.dumps({"k": 1}),
                }
            )
            eid += 1
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    d = tmp_path / f"const_delta_{n_days}"
    d.mkdir()
    pdf.to_parquet(d / "events.parquet", index=False)
    return str(d)


def test_return_moments_constant_delta_guarded(spark, tmp_path):
    import duckdb
    import pytest as _pytest

    from fin_trade_craft_spark.queries.microstructure import (
        ORACLE_RETURN_MOMENTS,
        return_moments,
    )

    sf = _const_delta_sf_dir(tmp_path, n_days=7)
    got = return_moments(spark, sf).toPandas()
    assert len(got) == 2
    assert (got["std_dp"] == 0.0).all()
    # zero-variance series: skew/kurt are undefined → NULL, not NaN/crash
    assert got["skew_dp"].isna().all()
    assert got["ex_kurt_dp"].isna().all()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    odf = con.sql(ORACLE_RETURN_MOMENTS).df()  # pre-guard: raised Out of Range
    assert odf["skew_dp"].isna().all()
    # prove the fixture is potent: the UNGUARDED denominator still crashes
    with _pytest.raises(duckdb.Error):
        con.sql(
            """
            WITH d AS (SELECT CAST(1 AS BIGINT) AS d FROM range(6)),
            a AS (SELECT COUNT(*) AS n, SUM(d) AS s1c, SUM(d*d) AS s2c FROM d)
            SELECT SQRT(CAST(s2c AS DOUBLE)/1e4/n
                        - (CAST(s1c AS DOUBLE)/1e2/n)*(CAST(s1c AS DOUBLE)/1e2/n))
            FROM a
            """
        ).df()
    con.close()


def test_cross_sectional_correlation_constant_delta_guarded(spark, tmp_path):
    import duckdb

    from fin_trade_craft_spark.queries.microstructure import (
        ORACLE_CROSS_SECTIONAL_CORRELATION,
    )

    sf = _const_delta_sf_dir(tmp_path, n_days=8)
    got = cross_sectional_correlation(spark, sf).toPandas()
    assert len(got) == 1
    assert got["corr_dp"].isna().all()  # zero-variance pair → undefined corr

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    odf = con.sql(ORACLE_CROSS_SECTIONAL_CORRELATION).df()  # pre-guard: raised
    assert len(odf) == 1
    assert odf["corr_dp"].isna().all()
    con.close()
