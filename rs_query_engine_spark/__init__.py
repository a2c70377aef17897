"""rs_query_engine_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
``bigboss2063/rs-query-engine`` (a minimal Arrow-backed columnar query
engine: CSV catalog, DataFrame builder over a
Scan/Projection/Selection/Aggregation/Join logical plan, hash
aggregation, equi-join). Here the logical plan IS Spark's Catalyst plan:
the facade only *declares* queries with the public DataFrame API and
lets Catalyst/Tungsten own optimization and execution, so every operator
is distributed, pipelined, and whole-stage-codegen'd by construction.

Layout:
- :mod:`.session`   — SparkSession factory tuned for the harness.
- :mod:`.catalog`   — named-table registry (parquet/CSV/JSON/memory),
  the analogue of the reference's ``Catalog`` (``src/catalog.rs:11-43``).
- :mod:`.expr`      — expression builders (``col``/``lit``/arith/cmp/bool/
  alias), the analogue of ``src/logical_plan/logical_expr.rs``.
- :mod:`.engine`    — ``Engine`` facade + ``Frame`` query builder, the
  analogue of ``src/logical_plan/data_frame.rs``.
- :mod:`.functions` — scalar/text/vector function surface.
- :mod:`.operators` — aggregates, sorts, set ops, windows, dedup,
  similarity search, multimodal plumbing.
- :mod:`.sources`   — reader helpers (parquet/csv/json/memory).
- :mod:`.streaming` — Structured Streaming operators over event streams.
- :mod:`.plans`     — plan introspection/explain helpers.
"""

from rs_query_engine_spark.catalog import Catalog
from rs_query_engine_spark.engine import Engine, Frame
from rs_query_engine_spark.expr import col, lit, alias
from rs_query_engine_spark.session import get_spark

__all__ = [
    "Catalog",
    "Engine",
    "Frame",
    "col",
    "lit",
    "alias",
    "get_spark",
]

__version__ = "0.1.0"
