"""The bench stdout contract the grading driver depends on.

The driver captures only the LAST 2,000 characters of bench.py's
stdout and ``json.loads`` the final line. Rounds 10 and 11 both lost
their official headline number (``parsed: null``) because the line
carried per-query maps that outgrew that window (2,705 bytes at 88
queries). These tests pin the contract: the headline line is scalars
only, well under the capture window, and round-trips through
``json.loads``.
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
    # Judge's r11 "Done =" criterion: <= 200 bytes (the driver tail
    # window is 2,000; the pytest floor it asked for is 1,500).
    assert len(line.encode("utf-8")) <= 200
    assert len(line.encode("utf-8")) < 1500

    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["value"] == total
    assert parsed["unit"] == "sec"
    assert parsed["sf"] == 0.1
    assert parsed["n_queries"] == 300
    # The bulky maps must NOT be on the headline line.
    assert "queries" not in parsed
    assert "attempts" not in parsed

    # ... they live in the sidecar instead, with both maps intact.
    sidecar = json.loads((tmp_path / "BENCH_ATTEMPTS.json").read_text())
    assert sidecar["queries"] == timings
    assert sidecar["attempts"] == attempts
    assert sidecar["sf"] == 0.1


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
    assert len(line.encode("utf-8")) <= 200
