"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference song-recommendation system
(``adlyatarisa/big-data-song-recommendation``), rebuilt Spark-first.

Layout
------
- :mod:`.session` — SparkSession factory (AQE on, UTC, Arrow).
- :mod:`.sources` — schema'd readers/writers (parquet/CSV/JSON; S1-S14).
- :mod:`.functions` — scalar column-expression library (F1-F18), text
  analysis, vector math. Zero row-at-a-time UDFs.
- :mod:`.operators` — cleaning (P3-P8), joins (J1-J5), aggregations
  (A1-A11), dedup, similarity search, multimodal plumbing.
- :mod:`.plans` — the named acceptance queries and their DuckDB oracle
  SQL twins (driver correctness gate).
- :mod:`.ml` — feature pipeline, ALS/KMeans, model registry (M1-M15).
- :mod:`.streaming` — Structured Streaming jobs (T1-T6 superset).

Everything is declarative DataFrame/SQL so Catalyst handles pushdown,
pruning, join selection and AQE handles skew/coalescing at scale.
"""

__version__ = "0.1.0"
