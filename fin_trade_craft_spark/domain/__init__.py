"""Reference-facing domain API: the fin-trade-craft feature/signal/
fundamental pipeline re-expressed Spark-first. A user of the
reference's transforms finds the same tables, column names, and
semantics here, computed as window expressions + narrow pandas-UDF
islands instead of per-symbol pandas loops over Postgres."""
