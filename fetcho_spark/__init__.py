"""fetcho_spark — a PySpark-native rebuild of nullabork/fetcho's crawl engine.

A brand-new engine (NOT a port): the persistent crawl loop — URL frontier,
politeness-aware fetch scheduler, partitioned-bloom URL-seen set, robots.txt
gating, priority queue semantics — re-expressed as DataFrame operations with
vectorized pandas/Arrow UDFs, plus the workspace standing-query language and
large-scale training-data operators (dedup, similarity search, text analysis).

State lives in snapshot-versioned tables (Iceberg-style; Parquet-dir shim in
this sandbox — see ``fetcho_spark.catalog``). Everything is seeded and
logical-clocked so crawl order is a pure function of data, never of task
timing (reference is wall-clock nondeterministic; see SURVEY.md §7.1).
"""

__version__ = "0.1.0"

SEED = 42
