"""mirrulations_iceberg_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference project
``mirrulations/mirrulations-iceberg`` (a JSON→Parquet ETL + DuckDB/pandas
analytics stack for US federal rulemaking data) as an idiomatic Spark
engine:

* the flattening ETL (``convert_to_iceberg.py`` in the reference) becomes a
  declarative ``spark.read.json`` → column-expression ``select`` →
  partitioned writer pipeline (:mod:`.etl`);
* the fixed DuckDB/pandas query workload (``demo_optimized_data.py``,
  ``simple_iceberg_exploration.py``) becomes named DataFrame queries with
  ANSI-SQL oracles (:mod:`.operators.relational`);
* table-maintenance experiments (compaction, codec benchmark, delta
  appends, profiling) become Spark utilities (:mod:`.operators.maintenance`);
* the one-docket-at-a-time "streaming" loop becomes Structured Streaming
  with checkpointed, idempotent upserts (:mod:`.streaming`);
* beyond the reference surface, large-scale training-data-pipeline
  operators: dedup (exact / MinHash-LSH / SimHash), similarity search,
  text analysis, multimodal plumbing (:mod:`.operators`).

Everything is DataFrame-first: logical plans are declared with the
DataFrame/SQL API so Catalyst handles pushdown, pruning, join selection
and AQE; Python UDFs appear only where built-ins genuinely cannot express
the semantics (and then only as Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
from .tables import TABLE_NAMES, load_table, register_views  # noqa: F401
