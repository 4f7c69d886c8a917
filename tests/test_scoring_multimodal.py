"""Tests for the scoring/ML layer (as-of enrichment lag edges,
feature prep, GBT train/score, composite funnel) and the multimodal
binary plumbing."""

from __future__ import annotations

import sys
from datetime import date
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from fin_trade_craft_spark.domain import scoring as SC  # noqa: E402
from fin_trade_craft_spark.operators.multimodal import (  # noqa: E402
    _fake_dims,
    decode_image_metadata,
    resize_images,
)


def test_asof_lag_edges(spark):
    """FIXTURES.md F13: the publication-lag edge cases."""
    # fundamental: fiscal 2024-01-01 → publication 2024-02-15,
    # valid until 2024-05-15
    # newer: pub 2024-02-15, valid→2024-05-15; older: pub
    # 2024-01-15, valid→2024-04-14
    scores = spark.createDataFrame(
        [(1, date(2024, 1, 1), 80.0), (1, date(2023, 12, 1), 60.0)],
        "symbol_id int, fiscal_date_ending date, overall_quality_score double",
    )
    trades = spark.createDataFrame(
        [
            (100, 1, date(2024, 2, 14)),  # pub-1 → must match OLDER quarter
            (101, 1, date(2024, 2, 15)),  # pub day → newest matches
            (102, 1, date(2024, 5, 15)),  # pub+90 → still valid
            (103, 1, date(2024, 5, 16)),  # pub+91 → newest expired, older too → NULL
            (104, 2, date(2024, 3, 1)),   # no fundamentals → NULL preserved
        ],
        "trade_id int, symbol_id int, entry_date date",
    )
    got = {r.trade_id: r for r in SC.join_fundamentals_to_trades(trades, scores).collect()}
    assert got[100].overall_quality_score == 60.0   # later quarter not yet published
    assert got[101].overall_quality_score == 80.0
    assert got[102].overall_quality_score == 80.0
    assert got[103].overall_quality_score is None   # both windows expired
    assert got[104].overall_quality_score is None   # unmatched preserved
    # invariant: publication_date <= entry_date on every matched row
    for r in got.values():
        if r.publication_date is not None:
            assert r.publication_date <= r.entry_date


def test_prepare_features_median_fill_and_onehot(spark):
    df = spark.createDataFrame(
        [(1, 10.0, "Tech"), (2, None, "Energy"), (3, 30.0, None), (4, 20.0, "Tech")],
        "id int, x double, sector string",
    )
    out = {r.id: r for r in SC.prepare_features(df, ["x"]).collect()}
    assert out[2].x == 20.0  # median of 10,30,20
    assert out[1].sector_Tech == 1 and out[1].sector_Energy == 0
    assert out[3].sector_UNKNOWN == 1


def test_train_score_composite_funnel(spark):
    import random

    rng = random.Random(9)
    rows = []
    for i in range(400):
        a, b = rng.random(), rng.random()
        label = 1 if a + 0.3 * b + rng.gauss(0, 0.1) > 0.8 else 0
        rows.append((i, i % 7, float(a), float(b), rng.choice(["Tech", "Energy"]), label,
                     rng.uniform(0, 100), rng.uniform(0, 100)))
    df = spark.createDataFrame(
        rows, "trade_id int, symbol_id int, a double, b double, sector string, label int,"
              " signal_strength double, overall_quality_score double"
    )
    prep = SC.prepare_features(df, ["a", "b"])
    feats = ["a", "b", "sector_Energy", "sector_Tech", "sector_UNKNOWN"]
    model = SC.train_success_model(prep, feats)
    scored = SC.score_candidates(model, prep)
    rowsc = scored.collect()
    assert all(0.0 <= r.success_probability <= 1.0 for r in rowsc)
    # model must beat coin-flip on its own training data
    acc = sum(1 for r in rowsc if (r.success_probability > 0.5) == (r.label == 1)) / len(rowsc)
    assert acc > 0.8
    top = SC.composite_rank(scored, prob_threshold=0.5, quality_threshold=50.0, top_k=10).collect()
    assert len(top) <= 10
    assert all(r.overall_quality_score >= 50 and r.success_probability >= 0.5 for r in top)
    comps = [r.composite_score for r in top]
    assert comps == sorted(comps, reverse=True)


def test_multimodal_binary_plumbing(spark):
    docs = spark.createDataFrame(
        [(1, bytearray(b"hello world")), (2, bytearray(b"x" * 500)), (3, bytearray(b""))],
        "doc_id long, payload binary",
    )
    meta = {r.doc_id: r for r in decode_image_metadata(docs).collect()}
    assert meta[1].byte_len == 11 and meta[2].byte_len == 500 and meta[3].byte_len == 0
    for d, r in meta.items():
        w, h = _fake_dims(r.byte_len)
        assert (r.width, r.height) == (w, h) and r.format in ("FAKE", "INVALID", "UNKNOWN")
    # non-image payloads flow through the RAW fallback (truncated)
    resized = {r.doc_id: r for r in resize_images(docs, raw_fallback_bytes=100).collect()}
    assert resized[2].out_format == "RAW" and len(bytes(resized[2].resized)) == 100
    assert bytes(resized[1].resized) == b"hello world"
    assert resized[1].out_width == -1 and resized[1].out_height == -1


def test_resize_images_real_png(spark):
    """Real resize: PNG payloads are decoded, aspect-fit NN-resampled,
    and re-encoded; output dims and exact pixel values verified by
    decoding the emitted bytes."""
    import numpy as np

    from fin_trade_craft_spark.functions import png as P

    grad = np.add.outer(np.arange(40), np.arange(80)).astype(np.uint8)  # 40h x 80w
    rgb = np.stack([grad, grad[::-1], 255 - grad], axis=-1)  # 40x80x3
    square = np.full((20, 20), 7, dtype=np.uint8)  # already fits
    docs = spark.createDataFrame(
        [(1, bytearray(P.encode_png(grad))), (2, bytearray(P.encode_png(rgb))),
         (3, bytearray(P.encode_png(square)))],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in resize_images(docs, max_w=32, max_h=32).collect()}
    # 80x40 fit in 32x32 -> width-limited: 32 x (40*32//80)=16
    assert (out[1].out_format, out[1].out_width, out[1].out_height) == ("PNG", 32, 16)
    assert (out[2].out_width, out[2].out_height) == (32, 16)
    # fits already -> untouched dims
    assert (out[3].out_width, out[3].out_height) == (20, 20)
    # decode the emitted bytes: exact NN expectation, all channels
    got = P.decode_png(bytes(out[1].resized))
    exp = P.nn_resize(grad[:, :, np.newaxis], 32, 16)
    assert got.shape == (16, 32, 1) and np.array_equal(got, exp)
    got_rgb = P.decode_png(bytes(out[2].resized))
    assert np.array_equal(got_rgb, P.nn_resize(rgb, 32, 16))
    assert np.array_equal(P.decode_png(bytes(out[3].resized))[:, :, 0], square)


def test_png_codec_all_filters_and_edges():
    """The pure-numpy PNG codec: round-trip, all five scanline filter
    types on decode (hand-filtered IDAT), and rejection paths."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from fin_trade_craft_spark.functions import png as P

    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (13, 17, 4), dtype=np.uint8)  # RGBA, odd dims
    assert np.array_equal(P.decode_png(P.encode_png(img)), img)
    gray = rng.randint(0, 256, (5, 9), dtype=np.uint8)
    assert np.array_equal(P.decode_png(P.encode_png(gray))[:, :, 0], gray)

    # hand-build an IDAT exercising filters 1(Sub) 2(Up) 3(Avg) 4(Paeth) 0
    target = rng.randint(0, 256, (5, 6, 3), dtype=np.uint8)
    h, w, c = target.shape
    bpp = c
    lines = []
    prev = np.zeros(w * c, dtype=np.int32)
    for y, ftype in enumerate([1, 2, 3, 4, 0]):
        cur = target[y].reshape(-1).astype(np.int32)
        enc = np.zeros(w * c, dtype=np.int32)
        for x in range(w * c):
            a = cur[x - bpp] if x >= bpp else 0
            b = prev[x]
            cc = prev[x - bpp] if x >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc_) else (b if pb <= pc_ else cc)
            enc[x] = (cur[x] - pred) & 0xFF
        lines.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
        prev = cur

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)

    hand = (
        P.SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(P.decode_png(hand), target)

    with pytest.raises(ValueError, match="signature"):
        P.decode_png(b"JFIF not a png")
    with pytest.raises(ValueError, match="color type"):
        # palette PNG (color type 3) is out of scope
        P.decode_png(
            P.SIGNATURE
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00"))
            + chunk(b"IEND", b"")
        )
    # fit_dims: integer aspect fit, never upscales
    assert P.fit_dims(80, 40, 32, 32) == (32, 16)
    assert P.fit_dims(40, 80, 32, 32) == (16, 32)
    assert P.fit_dims(10, 10, 32, 32) == (10, 10)
    assert P.fit_dims(1000, 3, 32, 32) == (32, 1)


def test_audio_frame_energy_edges(spark):
    from fin_trade_craft_spark.operators.multimodal import audio_frame_energy

    df = spark.createDataFrame(
        [(1, bytes(range(10)) * 60), (2, b""), (3, b"\x05" * 256)],
        "doc_id long, payload binary",
    )
    got = {r.doc_id: r for r in audio_frame_energy(df, frame_bytes=256).collect()}
    # doc 1: 600 bytes -> 3 frames; total = 60 * sum(0..9) = 2700
    assert got[1].n_frames == 3 and got[1].total_energy == 2700
    # doc 2: empty payload -> sentinel row, not a crash
    assert (got[2].n_frames, got[2].total_energy, got[2].peak_frame) == (0, 0, -1)
    # doc 3: one exact frame, energy 5*256; peak is frame 0
    assert (got[3].n_frames, got[3].peak_energy, got[3].peak_frame) == (1, 1280, 0)


def test_video_frame_sample_expansion(spark):
    import hashlib

    from fin_trade_craft_spark.operators.multimodal import sample_video_frames

    payload = bytes(range(256)) * 18  # 4608 bytes -> 9 frames of 512
    df = spark.createDataFrame([(7, payload)], "doc_id long, payload binary")
    rows = sorted(
        sample_video_frames(df, frame_bytes=512, every_n=4).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in rows] == [0, 4, 8]  # every 4th of 9
    assert all(r.frame_len == 512 for r in rows)
    assert rows[0].frame_md5 == hashlib.md5(payload[:512]).hexdigest()


def test_gbt_probability_rank_order_and_threshold_sensitivity(spark):
    """XGBoost-parity calibration (round-2 verdict item 5): the
    reference scores with XGBClassifier.predict_proba and cuts at
    0.85 (trading_bot/daily_signal_scorer.py:258-259); this repo
    substitutes MLlib GBT (xgboost not installable here). The funnel
    survives that substitution iff the GBT probabilities are
    RANK-ORDER stable in the true signal — any monotone probability
    recalibration between the two models then only shifts where the
    0.85 cut lands (a tunable), never which candidates outrank which.
    Asserted here: decile-level monotonicity, high rank correlation
    with the generating signal, and nested survivor sets across cuts."""
    import random

    rng = random.Random(17)
    rows = []
    for i in range(600):
        a = rng.random()  # true P(success) == a, by construction
        label = 1 if rng.random() < a else 0
        rows.append((i, i % 11, float(a), rng.random(), "Tech", label,
                     rng.uniform(0, 100), rng.uniform(50, 100)))
    df = spark.createDataFrame(
        rows, "trade_id int, symbol_id int, a double, noise double, sector string,"
              " label int, signal_strength double, overall_quality_score double"
    )
    prep = SC.prepare_features(df, ["a", "noise"])
    model = SC.train_success_model(prep, ["a", "noise", "sector_Tech", "sector_UNKNOWN"])
    scored = SC.score_candidates(model, prep).select(
        "trade_id", "a", "success_probability", "signal_strength",
        "overall_quality_score", "symbol_id"
    ).collect()

    # decile monotonicity: mean predicted prob rises with the signal
    by_a = sorted(scored, key=lambda r: r.a)
    decile = len(by_a) // 10
    means = [
        sum(r.success_probability for r in by_a[k * decile:(k + 1) * decile]) / decile
        for k in range(10)
    ]
    assert all(means[k] < means[k + 1] for k in range(9)), means

    # Spearman rank correlation between predicted prob and true signal
    def ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        r = [0] * len(vals)
        for pos, i in enumerate(order):
            r[i] = pos
        return r
    ra = ranks([r.a for r in scored])
    rp = ranks([r.success_probability for r in scored])
    n = len(scored)
    rho = 1 - 6 * sum((x - y) ** 2 for x, y in zip(ra, rp)) / (n * (n**2 - 1))
    # per-row rho is bounded by tree-leaf ties against Bernoulli label
    # noise (~0.8 for 600 draws); the decile assertion above is the
    # strict funnel-level property
    assert rho > 0.75, rho

    # threshold sensitivity: cuts at 0.80/0.85/0.90 select nested sets,
    # so a recalibrated model maps to some cut in this family
    import pyspark.sql.functions as SF
    scored_df = SC.score_candidates(model, prep)
    surv = {
        t: {r.trade_id for r in scored_df.filter(SF.col("success_probability") >= t)
            .select("trade_id").collect()}
        for t in (0.80, 0.85, 0.90)
    }
    assert surv[0.90] <= surv[0.85] <= surv[0.80]
    assert len(surv[0.85]) > 0


def test_png_codec_roundtrip_property():
    """Property test: encode→decode is the identity for arbitrary
    8-bit images across all supported channel counts and dims."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from fin_trade_craft_spark.functions import png as P

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 40),
        c=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31 - 1),
    )
    def prop(w, h, c, seed):
        img = np.random.RandomState(seed).randint(0, 256, (h, w, c), dtype=np.uint8)
        assert np.array_equal(P.decode_png(P.encode_png(img)), img)

    prop()


def test_png_fit_dims_property():
    """fit_dims never upscales, never exceeds the box, preserves
    aspect within integer-floor error, and is exact integer math."""
    from hypothesis import given, settings, strategies as st

    from fin_trade_craft_spark.functions import png as P

    @settings(max_examples=200, deadline=None)
    @given(
        w=st.integers(1, 10_000),
        h=st.integers(1, 10_000),
        mw=st.integers(1, 512),
        mh=st.integers(1, 512),
    )
    def prop(w, h, mw, mh):
        nw, nh = P.fit_dims(w, h, mw, mh)
        assert 1 <= nw and 1 <= nh
        assert nw <= max(w, mw) and nh <= max(h, mh)
        if w <= mw and h <= mh:
            assert (nw, nh) == (w, h)  # never upscale
        else:
            assert nw <= mw and nh <= mh  # fits the box
            # the limiting axis is fully used
            assert nw == mw or nh == mh

    prop()


def test_classifier_probe_selects_xgboost_when_importable(monkeypatch):
    """The U7 seam: make_classifier picks SparkXGBClassifier with
    the reference's exact hyperparameters when xgboost.spark is
    importable, and falls back to MLlib GBT otherwise (the branch
    every other test in this file exercises end-to-end). A minimal
    fake module stands in for the env-blocked dependency."""
    import sys
    import types

    from fin_trade_craft_spark.domain import scoring

    try:  # the GBT-fallback assertions only hold where xgboost is absent
        import xgboost.spark  # noqa: F401
    except ImportError:
        clf, kind = scoring.make_classifier()
        assert kind == "gbt" and type(clf).__name__ == "GBTClassifier"
        assert clf.getMaxIter() == 40 and clf.getMaxDepth() == 6

    # present -> XGBoost branch with the reference knobs
    captured = {}

    class FakeXGB:
        def __init__(self, **kw):
            captured.update(kw)

    xgb = types.ModuleType("xgboost")
    xgb_spark = types.ModuleType("xgboost.spark")
    xgb_spark.SparkXGBClassifier = FakeXGB
    xgb.spark = xgb_spark
    monkeypatch.setitem(sys.modules, "xgboost", xgb)
    monkeypatch.setitem(sys.modules, "xgboost.spark", xgb_spark)
    clf, kind = scoring.make_classifier("success")
    assert kind == "xgboost" and isinstance(clf, FakeXGB)
    assert captured == {
        "features_col": "features",
        "label_col": "success",
        "n_estimators": 200,
        "max_depth": 6,
        "learning_rate": 0.1,
        "subsample": 0.8,
        "random_state": 42,
    }
