"""fin_trade_craft_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference repo ``kennydoit/fin-trade-craft``
(single-node Postgres + pandas financial ETL) as idiomatic Spark:
DataFrame/SQL plans optimized by Catalyst, window functions for the
per-symbol time-series features, range joins for point-in-time
enrichment, and grouped pandas UDFs only for genuinely sequential
recurrences (EWM family, stateful signals, trade simulation).

Layout
------
- ``session``    — tuned SparkSession builder
- ``sources``    — table catalog / parquet IO / upsert idioms
- ``functions``  — scalar & text & vector column helpers
- ``operators``  — reusable DataFrame→DataFrame operators
  (rolling windows, lags, ranks, as-of join, signals, dedup,
  similarity, backtest)
- ``queries``    — named queries over the driver's test tables,
  each paired with a DuckDB oracle SQL string
- ``plans``      — incremental pipeline / watermark ledger
- ``streaming``  — Structured Streaming variants
"""

__version__ = "0.1.0"
