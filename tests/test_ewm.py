"""Parity tests: the EWM pandas-UDF island vs pandas itself on
fixture series (the reference's features are *defined* by pandas
ewm output, SURVEY §7.3 risk 1)."""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from fin_trade_craft_spark.operators import ewm  # noqa: E402


def _series(seed: int = 7, n: int = 120) -> list[float]:
    import random

    rng = random.Random(seed)
    v, out = 100.0, []
    for _ in range(n):
        v *= 1 + rng.uniform(-0.02, 0.02)
        out.append(round(v, 2))
    return out


def _df(spark, vals, key=1):
    return spark.createDataFrame(
        [(key, i, v) for i, v in enumerate(vals)], "sym long, bar long, close double"
    )


def test_ema_matches_pandas(spark):
    vals = _series()
    out = (
        ewm.ema_features(_df(spark, vals), "sym", ["bar"], "close", spans=(8, 21))
        .orderBy("bar")
        .toPandas()
    )
    for n in (8, 21):
        want = pd.Series(vals).ewm(span=n).mean()
        assert (out[f"ema_{n}"] - want).abs().max() < 1e-9


def test_macd_matches_pandas(spark):
    vals = _series(11)
    out = ewm.macd_features(_df(spark, vals), "sym", ["bar"], "close").orderBy("bar").toPandas()
    s = pd.Series(vals)
    macd = s.ewm(span=12).mean() - s.ewm(span=26).mean()
    sig = macd.ewm(span=9).mean()
    assert (out["macd"] - macd).abs().max() < 1e-9
    assert (out["macd_signal"] - sig).abs().max() < 1e-9
    assert (out["macd_hist"] - (macd - sig)).abs().max() < 1e-9


def test_rsi_wilder_matches_pandas(spark):
    vals = _series(13)
    out = ewm.rsi_wilder(_df(spark, vals), "sym", ["bar"], "close", 14).orderBy("bar").toPandas()
    s = pd.Series(vals)
    delta = s.diff()
    avg_gain = delta.clip(lower=0).ewm(alpha=1 / 14, min_periods=14).mean()
    avg_loss = (-delta).clip(lower=0).ewm(alpha=1 / 14, min_periods=14).mean()
    want = 100 - 100 / (1 + avg_gain / avg_loss)
    got = out["rsi_14"]
    assert got[:13].isna().all() and not got[14:].isna().any()
    assert (got - want).abs().max() < 1e-9


def test_atr_matches_pandas(spark):
    import random

    rng = random.Random(3)
    rows = []
    c = 100.0
    for i in range(80):
        c *= 1 + rng.uniform(-0.02, 0.02)
        h, lo = c * (1 + rng.uniform(0, 0.01)), c * (1 - rng.uniform(0, 0.01))
        rows.append((1, i, round(h, 2), round(lo, 2), round(c, 2)))
    df = spark.createDataFrame(rows, "sym long, bar long, high double, low double, close double")
    out = ewm.atr_features(df, "sym", ["bar"], "high", "low", "close", (14,)).orderBy("bar").toPandas()
    pdf = pd.DataFrame(rows, columns=["sym", "bar", "high", "low", "close"])
    prev = pdf["close"].shift(1)
    tr = pd.concat(
        [pdf["high"] - pdf["low"], (pdf["high"] - prev).abs(), (pdf["low"] - prev).abs()], axis=1
    ).max(axis=1)
    want = tr.ewm(alpha=1 / 14, min_periods=14).mean()
    assert (out["atr_14"] - want).abs().max() < 1e-9


def test_multi_key_groups_are_independent(spark):
    vals_a, vals_b = _series(1), _series(2)
    rows = [(1, i, v) for i, v in enumerate(vals_a)] + [(2, i, v) for i, v in enumerate(vals_b)]
    df = spark.createDataFrame(rows, "sym long, bar long, close double")
    out = ewm.ema_features(df, "sym", ["bar"], "close", spans=(8,)).toPandas()
    for key, vals in [(1, vals_a), (2, vals_b)]:
        got = out[out.sym == key].sort_values("bar")["ema_8"].reset_index(drop=True)
        want = pd.Series(vals).ewm(span=8).mean()
        assert (got - want).abs().max() < 1e-9


def test_grouped_map_chunk_guard_parity(spark):
    """The memory-guarded chunk path (max_rows_per_frame) must be
    invisible to results: flushing at group boundaries mid-partition
    yields exactly the unchunked output, each fn call still sees its
    WHOLE group (asserted inside fn), and a single group larger than
    the cap stays intact."""
    import pandas as pd
    from pyspark.sql import functions as F

    from fin_trade_craft_spark.operators.ewm import grouped_map

    # 8 groups x 12 rows, plus one giant 40-row group (id 99)
    rows = [(g, i, float(g * 100 + i)) for g in range(8) for i in range(12)]
    rows += [(99, i, float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, seq long, v double")

    expected_sizes = {g: 12 for g in range(8)} | {99: 40}

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        k = int(pdf["k"].iloc[0])
        # every call must receive the FULL group, chunked or not
        assert len(pdf) == expected_sizes[k], (k, len(pdf))
        pdf = pdf.sort_values("seq")
        out = pdf[["k", "seq"]].copy()
        out["ewm"] = pdf["v"].ewm(span=5).mean()
        return out

    schema = "k long, seq long, ewm double"
    unchunked = grouped_map(df, "k", fn, schema, max_rows_per_frame=None).toPandas()
    chunked = grouped_map(df, "k", fn, schema, max_rows_per_frame=7).toPandas()
    key = ["k", "seq"]
    pd.testing.assert_frame_equal(
        unchunked.sort_values(key).reset_index(drop=True),
        chunked.sort_values(key).reset_index(drop=True),
    )
    assert len(chunked) == len(rows)


def test_wilder_rma_warmup_seam_contract():
    """Pin the seam that the env-blocked pandas_ta dependency sits
    on (reference consumes ta.rsi/ta.atr, which smooth via RMA):

    - the engine's RMA is ``ewm(alpha=1/n, min_periods=n).mean()``
      (pandas adjust=True) — exactly what pandas_ta's ``rma()``
      computes, so when pandas_ta IS installable the equality block
      below verifies the engine against the library itself;
    - the CLASSIC seeded Wilder recursion (SMA seed over the first n
      bars, then r_t = (r_{t-1}(n-1) + x_t)/n — TA-Lib/TradingView
      semantics) differs during warmup; the divergence envelope is
      pinned here so the difference is a stated contract, not an
      unverified quirk: gap(t) shrinks by factor <= (1 - 1/n) per
      bar after the seed and is negligible after ~5n bars."""
    import math

    import numpy as np
    import pandas as pd

    n = 14
    x = pd.Series([50.0 + 10.0 * math.sin(0.37 * i) + 0.01 * i for i in range(160)])

    engine = x.ewm(alpha=1.0 / n, min_periods=n).mean()

    # classic seeded recursion
    seeded = pd.Series(np.nan, index=x.index)
    seed = x.iloc[:n].mean()
    seeded.iloc[n - 1] = seed
    for t in range(n, len(x)):
        seeded.iloc[t] = (seeded.iloc[t - 1] * (n - 1) + x.iloc[t]) / n

    assert engine.iloc[: n - 1].isna().all() and seeded.iloc[: n - 1].isna().all()
    gap = (engine - seeded).abs()
    g0 = gap.iloc[n - 1]
    assert g0 > 0  # warmup divergence is real...
    assert g0 < 5.0  # ...but bounded on a price-scale series
    # envelope contraction: the gap tracks the data bar to bar, but
    # its per-n-bar-window MAX contracts by at least (1-1/n)^n ~ 0.36
    # every n bars (measured: 0.27-0.56 per window on this fixture)
    wins = [gap.iloc[n - 1 + k * n : n - 1 + (k + 1) * n].max() for k in range(9)]
    for k in range(8):
        assert wins[k + 1] <= wins[k] * 0.6, (k, wins)
    assert wins[5] < g0 * 0.01           # effectively converged by ~5n bars
    assert gap.iloc[-1] < g0 * 1e-4

    try:  # the auto-verifying branch for richer environments
        import pandas_ta  # noqa: F401
    except ImportError:
        pass
    else:
        lib = pandas_ta.rma(x, length=n)
        pd.testing.assert_series_equal(
            engine[n - 1 :], lib[n - 1 :], check_names=False
        )


def test_ewm_oracle_step_matches_pandas_on_mid_series_nulls():
    """Review-fix regression (r06): the shared SQL EWM step must
    implement pandas' NULL-observation branches (weight decays with
    no observation added; leading NaNs leave state untouched) —
    pinned by running the actual EMA/MACD oracles on a series with
    leading, mid, and consecutive NULLs and comparing bit-for-bit
    against pandas ewm."""
    import datetime

    import duckdb
    import numpy as np
    import pandas as pd

    from fin_trade_craft_spark.queries import pandas_islands as PI

    con = duckdb.connect()
    vals = [None, 1.0, 2.0, None, 4.0, 5.0, None, None, 7.5, 2.0, 2.0, 3.0]
    rows = pd.DataFrame(
        {
            "event_id": range(len(vals)),
            "ts": [
                datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i)
                for i in range(len(vals))
            ],
            "user_id": [1] * len(vals),
            "value": vals,
        }
    )
    con.register("events", rows)
    s = pd.Series(vals, dtype=float)

    got = con.sql(PI._ema_oracle(spans=(8, 21))).df().sort_values("event_id")
    for n in (8, 21):
        want = s.ewm(span=n).mean().to_numpy()
        assert np.array_equal(
            np.nan_to_num(got[f"ema_{n}"].to_numpy(), nan=-1),
            np.nan_to_num(want, nan=-1),
        ), f"span {n} diverged on NULL series"

    got2 = con.sql(PI._macd_oracle()).df().sort_values("event_id")
    macd = s.ewm(span=12).mean() - s.ewm(span=26).mean()
    sig = macd.ewm(span=9).mean()
    for col, want in (("macd", macd), ("macd_signal", sig), ("macd_hist", macd - sig)):
        assert np.array_equal(
            np.nan_to_num(got2[col].to_numpy(), nan=-1),
            np.nan_to_num(want.to_numpy(), nan=-1),
        ), f"{col} diverged on NULL series"


def test_ewm_island_batch_kernel_matches_per_group_reference():
    """The production island path (_ewm_island_batch_fn: pandas
    grouped-window C kernels, one call for all groups) must be
    bit-identical to the definitional per-group kernel
    (_ewm_island_group_fn: plain Series.ewm per symbol — the
    reference's exact semantics). Adversarial shapes: multi-symbol,
    single-row group, constant series (exercises the ewma kernel's
    weighted_avg != cur skip branch), two-row group inside RSI/ATR
    warmup, and unsorted input rows."""
    import numpy as np

    from fin_trade_craft_spark.domain import indicators as I

    rows = []
    # symbol 1: 60-step random walk
    v = 100.0
    import random

    rng = random.Random(13)
    for i in range(60):
        v *= 1 + rng.uniform(-0.03, 0.03)
        rows.append((1, i, round(v + 1, 2), round(v - 1, 2), round(v, 2), 10 + i))
    # symbol 2: constant close (ewma update-skip branch)
    for i in range(30):
        rows.append((2, i, 51.0, 49.0, 50.0, 5))
    # symbol 3: single row
    rows.append((3, 0, 10.5, 9.5, 10.0, 1))
    # symbol 4: two rows (inside min_periods warmup of RSI/ATR)
    rows.append((4, 0, 21.0, 19.0, 20.0, 2))
    rows.append((4, 1, 22.0, 20.0, 21.0, 2))
    pdf = pd.DataFrame(
        rows, columns=["symbol_id", "date", "high", "low", "close", "volume"]
    )
    # shuffle row order: both kernels must sort internally
    pdf = pdf.sample(frac=1.0, random_state=5).reset_index(drop=True)

    # schema stand-in: the island only reads schema field NAMES
    class _F:
        def __init__(self, name):
            self.name = name

    class _S:
        fields = [
            _F(c)
            for c in [
                "symbol_id",
                "date",
                "high",
                "low",
                "close",
                "volume",
                *[f"ohlcv_ema_{n}" for n in I.EMA_PERIODS],
                "ohlcv_macd",
                "ohlcv_macd_signal",
                "ohlcv_macd_histogram",
                *[f"ohlcv_rsi_{n}" for n in I.RSI_PERIODS],
                *[f"ohlcv_atr_{n}" for n in I.ATR_PERIODS],
            ]
        ]

    ref_fn = I._ewm_island_group_fn(_S, "date")
    ref = pd.concat(
        [ref_fn(g) for _, g in pdf.groupby("symbol_id", sort=False, dropna=False)],
        ignore_index=True,
    ).sort_values(["symbol_id", "date"], kind="stable").reset_index(drop=True)
    got = (
        I._ewm_island_batch_fn(_S, "date")(pdf)
        .sort_values(["symbol_id", "date"], kind="stable")
        .reset_index(drop=True)
    )
    assert list(ref.columns) == list(got.columns)
    for c in ref.columns:
        a, b = ref[c].to_numpy(), got[c].to_numpy()
        if a.dtype.kind == "f":
            same = (a == b) | (np.isnan(a) & np.isnan(b))
        else:
            same = a == b
        assert same.all(), (c, a[~same][:5], b[~same][:5])


def test_grouped_kernel_batch_paths_bitwise_vs_per_group(spark):
    """The r12 batch_fn twins (grouped-window C kernels) of
    ema/macd/rsi/atr must be BIT-identical to the per-group pandas
    reference — same fixtures class as the island differential:
    random walk, constant series (ewma update-skip branch), single
    row, warmup-length group."""
    import numpy as np

    rows = []
    v = 100.0
    import random

    rng = random.Random(29)
    for i in range(50):
        v *= 1 + rng.uniform(-0.03, 0.03)
        rows.append((1, i, round(v + 1, 2), round(v - 1, 2), round(v, 2)))
    for i in range(25):
        rows.append((2, i, 51.0, 49.0, 50.0))
    rows.append((3, 0, 10.5, 9.5, 10.0))
    rows.append((4, 0, 21.0, 19.0, 20.0))
    rows.append((4, 1, 22.0, 20.0, 21.0))
    df = spark.createDataFrame(
        rows, "sym long, bar long, high double, low double, close double"
    )

    def ref_per_group(pdf, builder):
        outs = [builder(g.sort_values("bar", kind="mergesort").reset_index(drop=True))
                for _, g in pdf.groupby("sym", sort=False, dropna=False)]
        return pd.concat(outs, ignore_index=True)

    pdf = pd.DataFrame(rows, columns=["sym", "bar", "high", "low", "close"])

    def check(got, ref, cols):
        got = got.sort_values(["sym", "bar"], kind="stable").reset_index(drop=True)
        ref = ref.sort_values(["sym", "bar"], kind="stable").reset_index(drop=True)
        for c in cols:
            a, b = ref[c].to_numpy(), got[c].to_numpy()
            same = (a == b) | (np.isnan(a) & np.isnan(b))
            assert same.all(), (c, np.flatnonzero(~same)[:5])

    # ema
    def b_ema(g):
        out = g[["sym", "bar", "close"]].copy()
        for n in (8, 21):
            e = g["close"].ewm(span=n).mean()
            out[f"ema_{n}"] = e
            out[f"close_ema_{n}_ratio"] = g["close"] / e
        return out

    got = ewm.ema_features(df, "sym", ["bar"], "close", spans=(8, 21)).toPandas()
    check(got, ref_per_group(pdf, b_ema), ["ema_8", "ema_21", "close_ema_8_ratio"])

    # macd
    def b_macd(g):
        out = g[["sym", "bar", "close"]].copy()
        macd = g["close"].ewm(span=12).mean() - g["close"].ewm(span=26).mean()
        sig = macd.ewm(span=9).mean()
        out["macd"], out["macd_signal"], out["macd_hist"] = macd, sig, macd - sig
        return out

    got = ewm.macd_features(df, "sym", ["bar"], "close").toPandas()
    check(got, ref_per_group(pdf, b_macd), ["macd", "macd_signal", "macd_hist"])

    # rsi
    def b_rsi(g):
        out = g[["sym", "bar", "close"]].copy()
        d = g["close"].diff()
        ag = d.clip(lower=0).ewm(alpha=1.0 / 14, min_periods=14).mean()
        al = (-d).clip(lower=0).ewm(alpha=1.0 / 14, min_periods=14).mean()
        out["rsi_14"] = 100.0 - 100.0 / (1.0 + ag / al)
        return out

    got = ewm.rsi_wilder(df, "sym", ["bar"], "close", 14).toPandas()
    check(got, ref_per_group(pdf, b_rsi), ["rsi_14"])

    # atr
    def b_atr(g):
        out = g[["sym", "bar", "high", "low", "close"]].copy()
        pc = g["close"].shift(1)
        tr = pd.concat(
            [g["high"] - g["low"], (g["high"] - pc).abs(), (g["low"] - pc).abs()], axis=1
        ).max(axis=1)
        for n in (10, 14):
            a = tr.ewm(alpha=1.0 / n, min_periods=n).mean()
            out[f"atr_{n}"] = a
            out[f"atr_{n}_pct"] = 100.0 * a / g["close"]
        return out

    got = ewm.atr_features(df, "sym", ["bar"], "high", "low", "close").toPandas()
    check(got, ref_per_group(pdf, b_atr), ["atr_10", "atr_14", "atr_14_pct"])
