"""Named query registry — the driver-facing surface.

Each query module defines two dicts:

- ``QUERIES``: name -> callable(spark, sf_dir) -> DataFrame
- ``ORACLES``: name -> equivalent ANSI SQL for the DuckDB oracle
  (omitted for genuinely non-SQL-expressible operators — the driver
  then records a weaker rows-only check).

``all_queries()`` / ``all_oracles()`` merge the modules; they are
what ``__spark_entry__.py`` re-exports to the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES: list[str] = [
    "relational",
    "tpch_shapes",
    "windows",
    "asof",
    "text",
    "corpus_mix",
    "dedup",
    "similarity",
    "corpus_build",
    "graph",
    "pandas_islands",
    "fin_domain",
    "fin_ml",
    "microstructure",
    "multimodal",
    "sketches",
    "reporting",
    "streaming",
]


def _load_modules():
    import importlib

    mods = []
    for m in _MODULES:
        try:
            mods.append(importlib.import_module(f"{__name__}.{m}"))
        except ModuleNotFoundError as e:
            # only tolerate the listed submodule itself being absent
            # (not built yet this round); a transitive import failure
            # inside an existing module must fail loudly — swallowing
            # it would silently drop a whole query family from the
            # driver's correctness verification
            if e.name != f"{__name__}.{m}":
                raise
            continue
    return mods


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for mod in _load_modules():
        dup = set(out) & set(mod.QUERIES)
        if dup:
            raise ValueError(f"duplicate query names: {dup}")
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _load_modules():
        out.update(getattr(mod, "ORACLES", {}))
    return out
