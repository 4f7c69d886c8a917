"""Differential tests for the fin-ML dataset-prep queries beyond
their DuckDB value oracles: each result is re-derived independently
in plain Python/pandas from the raw events and compared exactly,
plus the structural invariants a training loop relies on
(fold disjointness, embargo placement, barrier-first semantics).
"""

from __future__ import annotations

import math
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pandas as pd

from conftest import SF_SMOKE

from fin_trade_craft_spark.queries.fin_ml import (
    FFD_WINDOW,
    MAD_Z_CUTOFF,
    MAD_Z_SCALE,
    TB_HORIZON,
    WF_FOLDS,
    _ffd_weights,
    frac_diff_features,
    label_uniqueness_weights,
    purged_walkforward_splits,
    robust_outlier_mad,
    triple_barrier_labels,
)


def _events_pdf() -> pd.DataFrame:
    return pd.read_parquet(f"{SF_SMOKE}/events.parquet")


def _discrete_median(sorted_vals):
    # value at ceil(0.5*n), 1-indexed — the engine's rank selection
    return sorted_vals[math.ceil(0.5 * len(sorted_vals)) - 1]


def test_robust_outlier_mad_matches_python_recompute(spark):
    got = {r["user_id"]: r for r in robust_outlier_mad(spark, SF_SMOKE).collect()}
    ev = _events_pdf()
    assert len(got) == ev["user_id"].nunique()
    for uid, g in ev.groupby("user_id"):
        rows = g.sort_values(["value", "event_id"])
        med = _discrete_median(list(rows["value"]))
        dev = (g["value"] - med).abs()
        mad = _discrete_median(
            list(pd.DataFrame({"d": dev, "e": g["event_id"]}).sort_values(["d", "e"])["d"])
        )
        r = got[uid]
        assert r["n_events"] == len(g)
        assert r["med_value"] == med
        assert r["mad_value"] == mad
        if mad == 0:
            assert r["n_outliers"] == 0 and r["max_abs_z"] is None
        else:
            z = (MAD_Z_SCALE * (g["value"] - med) / mad).abs()
            assert r["n_outliers"] == int((z > MAD_Z_CUTOFF).sum())
            assert r["max_abs_z"] == z.max()


def test_purged_walkforward_splits_fold_algebra(spark):
    rows = purged_walkforward_splits(spark, SF_SMOKE).collect()
    assert rows
    ev = _events_pdf()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    for uid, folds in by_user.items():
        g = ev[ev["user_id"] == uid].sort_values(["ts", "event_id"]).reset_index(drop=True)
        n = len(g)
        # fold assignment replay: ((rn-1)*K) div n
        fold_of = [((i) * WF_FOLDS) // n for i in range(n)]
        folds.sort(key=lambda r: r["fold"])
        assert sum(r["test_rows"] for r in folds) == n
        seen_ids = [r["fold"] for r in folds]
        assert seen_ids == sorted(set(fold_of))
        for r in folds:
            members = g[[f == r["fold"] for f in fold_of]]
            assert r["test_rows"] == len(members)
            assert r["test_start"] == members["ts"].min()
            assert r["test_end"] == members["ts"].max()
            earlier = g[[f < r["fold"] for f in fold_of]]
            embargo = earlier[
                earlier["ts"] >= r["test_start"] - pd.Timedelta(days=1)
            ]
            assert r["embargo_rows"] == len(embargo)
            assert r["train_rows"] == len(earlier) - len(embargo)
            # leak-freedom: every train row strictly precedes the
            # embargoed strip, which precedes the test window
            assert r["train_rows"] + r["embargo_rows"] + r["test_rows"] <= n


def test_triple_barrier_labels_match_python_walk(spark):
    got = triple_barrier_labels(spark, SF_SMOKE).collect()
    assert got
    ev = _events_pdf()
    ev["date"] = ev["ts"].dt.floor("D")
    closes = {}
    for (uid, date), g in ev.groupby(["user_id", "date"]):
        last = g.sort_values(["ts", "event_id"]).iloc[-1]
        closes[(uid, date)] = last["value"]
    series = defaultdict(list)
    for (uid, date), c in sorted(closes.items(), key=lambda kv: (kv[0][0], kv[0][1])):
        series[uid].append((date, c))
    expect = {}
    for uid, bars in series.items():
        vals = [c for _, c in bars]
        for i, (date, entry) in enumerate(bars):
            first_up = first_dn = None
            for j in range(i + 1, min(i + TB_HORIZON, len(bars) - 1) + 1):
                if first_up is None and vals[j] >= entry * 1.05:
                    first_up = j - i
                if first_dn is None and vals[j] <= entry * 0.95:
                    first_dn = j - i
                if first_up is not None and first_dn is not None:
                    break
            if first_up is not None and (first_dn is None or first_up <= first_dn):
                expect[(uid, date)] = (1, first_up)
            elif first_dn is not None:
                expect[(uid, date)] = (-1, first_dn)
            else:
                expect[(uid, date)] = (0, None)
    assert len(got) == len(expect)
    for r in got:
        lbl, dist = expect[(r["user_id"], pd.Timestamp(r["date"]))]
        assert (r["label"], r["bars_to_hit"]) == (lbl, dist), r


def _close_series():
    ev = _events_pdf()
    ev["date"] = ev["ts"].dt.floor("D")
    series = defaultdict(list)
    for (uid, date), g in ev.groupby(["user_id", "date"]):
        last = g.sort_values(["ts", "event_id"]).iloc[-1]
        series[uid].append((date, last["value"]))
    for uid in series:
        series[uid].sort()
    return series


def test_frac_diff_matches_left_assoc_python(spark):
    got = {(r["user_id"], pd.Timestamp(r["date"])): r["ffd"]
           for r in frac_diff_features(spark, SF_SMOKE).collect()}
    w = _ffd_weights()
    # weight recurrence sanity: w0=1, w1=-d, alternating decay
    assert w[0] == 1.0 and w[1] == -0.4 and abs(w[-1]) < abs(w[1])
    n_expected = 0
    for uid, bars in _close_series().items():
        vals = [c for _, c in bars]
        for i in range(FFD_WINDOW - 1, len(bars)):
            acc = w[0] * vals[i]
            for k in range(1, FFD_WINDOW):
                acc = acc + w[k] * vals[i - k]
            assert got[(uid, pd.Timestamp(bars[i][0]))] == acc
            n_expected += 1
    assert len(got) == n_expected


def test_label_uniqueness_weights_concurrency_algebra(spark):
    rows = label_uniqueness_weights(spark, SF_SMOKE).collect()
    assert rows
    labels = {(r["user_id"], pd.Timestamp(r["date"])): r
              for r in triple_barrier_labels(spark, SF_SMOKE).collect()}
    series = _close_series()
    # replay spans + concurrency exactly
    for uid, bars in series.items():
        n = len(bars)
        span_of = {}
        for i, (date, _) in enumerate(bars, start=1):
            lbl = labels[(uid, pd.Timestamp(date))]
            h = lbl["bars_to_hit"] if lbl["bars_to_hit"] is not None else min(
                TB_HORIZON, n - i
            )
            if h >= 1:
                span_of[i] = (date, lbl["label"], h)
        conc = defaultdict(int)
        for i, (_, _, h) in span_of.items():
            for t in range(i + 1, i + h + 1):
                conc[t] += 1
        got_user = [r for r in rows if r["user_id"] == uid]
        assert len(got_user) == len(span_of)
        for r in got_user:
            i = next(i for i, (d, _, _) in span_of.items()
                     if pd.Timestamp(d) == pd.Timestamp(r["date"]))
            date, lbl, h = span_of[i]
            assert r["label"] == lbl and r["span_len"] == h
            inv = sorted(1.0 / conc[t] for t in range(i + 1, i + h + 1))
            acc = 0.0
            for x in inv:
                acc += x
            assert r["avg_uniqueness"] == acc / h
            assert 0.0 < r["avg_uniqueness"] <= 1.0
