"""Regenerate the per-round DRIVER_SLATE (r11 verdict, Next round #2).

The grading driver value-checks only the FIRST 50 entries of
``queries()``. To give every registered query driver-side evidence
over successive rounds, the slate rotates: 5 fixed relational anchors
(cross-round regression canaries) + the next 45 queries, in registry
order, that have NEVER appeared in any round's CORRECTNESS_r*.json.

Usage: python tools/rotate_slate.py [round_number]

Prints the python list literal to paste into
``fin_trade_craft_spark/queries/__init__.py`` (DRIVER_SLATE), plus a
coverage projection. Every candidate is already value-oracled and
gate-green at sf0.01 (the full-registry local gate), so any rotation
is safe by construction — including lsh_recall_eval /
dedup_ngram_jaccard, whose guard_exact_tier refusals trip only at
>=50k docs, far above the driver's sf0.01.
"""

from __future__ import annotations

import glob
import importlib
import json
import os
import sys

ANCHORS = [
    "pricing_summary",
    "top_revenue_customers",
    "regional_revenue",
    "latest_order_per_customer",
    "top_orders_per_segment",
]

SLATE_SIZE = 50


def registry_order() -> list[str]:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from fin_trade_craft_spark import queries as Q

    merged: dict = {}
    for m in Q._MODULES:
        mod = importlib.import_module(f"fin_trade_craft_spark.queries.{m}")
        merged.update(mod.QUERIES)
    return list(merged)


def sampled_ever(repo: str) -> set[str]:
    s: set[str] = set()
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        s |= set(json.load(open(f)).keys())
    return s


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rnd = sys.argv[1] if len(sys.argv) > 1 else "?"
    reg = registry_order()
    seen = sampled_ever(repo)
    never = [n for n in reg if n not in seen and n not in ANCHORS]
    fill = never[: SLATE_SIZE - len(ANCHORS)]
    print(f"# r{rnd} slate: {len(ANCHORS)} anchors + {len(fill)} never-sampled")
    print(f"# never-sampled remaining after this round: {max(0, len(never) - len(fill))}")
    print("DRIVER_SLATE: list[str] = [")
    for n in ANCHORS + fill:
        print(f'    "{n}",')
    print("]")


if __name__ == "__main__":
    main()
