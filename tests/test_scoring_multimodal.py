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
    resized = {r.doc_id: r for r in resize_images(docs, max_bytes=100).collect()}
    assert len(bytes(resized[2].resized)) == 100
    assert bytes(resized[1].resized) == b"hello world"


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
