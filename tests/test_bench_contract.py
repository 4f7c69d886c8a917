"""The bench stdout contract the grading driver depends on.

The driver captures only the LAST 2,000 characters of bench.py's
stdout and ``json.loads`` the final line. Rounds 10 and 11 both lost
their official headline number (``parsed: null``) because the line
carried the COMPLETE per-query map, which outgrows that window
(2,705 bytes at 88 queries; the names alone are 1,999 bytes of JSON
keys). r12's scalar-only line parsed but starved the driver's
per-query comparator (PERF_r12 ``n_common: 0``), so per r12 VERDICT
task #1 the line now carries a greedy most-expensive-first subset of
the map within a 1,900-byte budget; the complete maps stay in the
``BENCH_ATTEMPTS.json`` sidecar. These tests pin that contract.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def _fake_run(n_queries: int):
    timings = {f"query_{i:03d}": round(0.001 * i + 1.234, 3) for i in range(n_queries)}
    attempts = {q: [t + 0.5, t] for q, t in timings.items()}
    total = round(sum(timings.values()), 3)
    return total, timings, attempts


def test_headline_line_fits_driver_tail_capture(tmp_path, monkeypatch):
    # Redirect the sidecar into tmp so the test never clobbers the
    # repo's real BENCH_ATTEMPTS.json.
    monkeypatch.setattr(
        bench.os.path, "dirname", lambda p: str(tmp_path)
    )
    total, timings, attempts = _fake_run(300)  # 3.4x today's 88 queries
    line = bench.headline_line(total, 0.1, timings, attempts)
    assert "\n" not in line
    # The driver tail window is 2,000 chars; the line must fit with
    # headroom for the trailing newline / stray stderr.
    assert len(line.encode("utf-8")) <= 1900

    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["value"] == total
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["n_queries"] == 300

    # The map on the line is the MOST EXPENSIVE queries, greedily,
    # with the omitted count accounting for the rest.
    assert parsed["queries"]
    assert len(parsed["queries"]) + parsed["queries_omitted"] == 300
    # entries appear most-expensive-first (json preserves insertion
    # order), and the single most expensive query is always present
    vals = [timings[q] for q in parsed["queries"]]
    assert vals == sorted(vals, reverse=True)
    assert max(timings, key=timings.get) in parsed["queries"]
    # (no strict cost-dominance over the omitted tail: at the budget
    # boundary a shorter-encoded cheap value — "1.4" vs "1.43" — may
    # fit where a longer one missed; the sorted-desc scan order above
    # is the guarantee that matters)
    for q, v in parsed["queries"].items():
        assert v == round(timings[q], 2)

    # The attempts map must NOT be on the headline line.
    assert "attempts" not in parsed

    # ... the COMPLETE maps live in the sidecar.
    sidecar = json.loads((tmp_path / "BENCH_ATTEMPTS.json").read_text())
    assert sidecar["queries"] == timings
    assert sidecar["attempts"] == attempts
    assert sidecar["sf"] == 0.1


def test_headline_line_complete_map_when_it_fits(tmp_path, monkeypatch):
    # A small slate's complete map fits the budget: nothing omitted.
    monkeypatch.setattr(bench.os.path, "dirname", lambda p: str(tmp_path))
    total, timings, attempts = _fake_run(20)
    line = bench.headline_line(total, 0.01, timings, attempts)
    parsed = json.loads(line)
    assert parsed["queries_omitted"] == 0
    assert set(parsed["queries"]) == set(timings)


def test_headline_line_survives_readonly_checkout(tmp_path, monkeypatch):
    # OSError writing the sidecar must not sink the headline record.
    def _boom(*a, **k):
        raise OSError("read-only filesystem")

    monkeypatch.setattr(bench, "open", _boom, raising=False)
    monkeypatch.setattr("builtins.open", _boom)
    total, timings, attempts = _fake_run(88)
    line = bench.headline_line(total, 0.1, timings, attempts)
    parsed = json.loads(line)
    assert parsed["value"] == total
    assert len(line.encode("utf-8")) <= 1900
    assert parsed["queries"]
