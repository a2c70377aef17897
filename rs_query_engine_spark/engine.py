"""Engine facade and Frame query builder.

Analogue of the reference's user API: ``Catalog::get_table_df`` returns
a ``DataFrame`` builder over an immutable logical plan
(``src/logical_plan/data_frame.rs:15-102``). Here ``Frame`` wraps a
``pyspark.sql.DataFrame`` — which already *is* a handle on an immutable
(Catalyst) logical plan — so every builder method is a declarative
one-liner and the optimizer/executor are Spark's.

Method-name mapping (reference → here):
- ``DataFrame::project(exprs)``  → :meth:`Frame.project`
  (``data_frame.rs:24-39``)
- ``DataFrame::select(expr)``    → :meth:`Frame.filter` — the reference
  names its *filter* method ``select`` (``data_frame.rs:41-48``); we use
  the SQL-correct name and keep ``select_where`` as an alias.
- ``DataFrame::aggregate(g, a)`` → :meth:`Frame.aggregate`
  (``data_frame.rs:50-71``) — the reference allows exactly one group
  expression; we accept one *or more* (superset).
- ``DataFrame::join(r, t, on)``  → :meth:`Frame.join`
  (``data_frame.rs:73-102``) — SQL-correct semantics (the reference's
  nested-loop join mis-handles duplicate keys and ignores join_type,
  ``src/physical_plan/nested_loop_join.rs:62-191``; we implement what it
  *declares*: inner/left/right multi-key equi-join).

Execution (``PhysicalPlan::execute`` → ``Vec<RecordBatch>``,
``src/physical_plan/physical_plan.rs:11``) maps to ``Frame.df`` actions:
``collect()``/``show()``/``write`` — distributed, pipelined, lazy.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession

from rs_query_engine_spark.catalog import Catalog
from rs_query_engine_spark.errors import raising_engine_errors
from rs_query_engine_spark.session import get_spark


class Frame:
    """Immutable query builder over a Spark DataFrame logical plan."""

    def __init__(self, df: DataFrame):
        self.df = df

    # -- reference-parity builders ------------------------------------

    @raising_engine_errors
    def project(self, *exprs: Column | str) -> "Frame":
        """Projection (``LogicalPlan::Projection``,
        ``src/logical_plan/logical_plan.rs:76-80``). Catalyst prunes the
        scan to exactly these columns. Unknown columns raise
        ``NoSuchColumnError`` (≙ ``src/planner/mod.rs:152-162``)."""
        return Frame(self.df.select(*exprs))

    @raising_engine_errors
    def filter(self, predicate: Column) -> "Frame":
        """Selection / WHERE (``LogicalPlan::Selection``,
        ``src/logical_plan/logical_plan.rs:83-86``). NULL-predicate rows
        are dropped (SQL semantics; the reference inserts a null row —
        ``src/physical_plan/selection.rs:45`` — a bug we do not copy)."""
        return Frame(self.df.filter(predicate))

    # the reference calls its filter `select` (data_frame.rs:41) — alias
    select_where = filter

    @raising_engine_errors
    def aggregate(
        self,
        group_exprs: Column | str | Sequence[Column | str],
        aggr_exprs: Sequence[Column],
    ) -> "Frame":
        """Grouped aggregation (``LogicalPlan::Aggregation``,
        ``src/logical_plan/logical_plan.rs:89-94``).

        The group key may be a computed expression (the reference groups
        by ``age <= 24``, ``src/physical_plan/aggr/mod.rs:270-274``).
        NULL group keys are kept (SQL semantics; the reference drops
        them, ``src/physical_plan/aggr/mod.rs:61-62``). Spark executes
        this as partial (map-side) + final hash aggregation — the
        scale-correct version of the reference's single-phase hash agg.
        """
        if isinstance(group_exprs, (Column, str)):
            group_exprs = [group_exprs]
        return Frame(self.df.groupBy(*group_exprs).agg(*aggr_exprs))

    @raising_engine_errors
    def agg_global(self, aggr_exprs: Sequence[Column]) -> "Frame":
        """Ungrouped aggregation → one row
        (``src/physical_plan/aggr/mod.rs:125-144``)."""
        return Frame(self.df.agg(*aggr_exprs))

    @raising_engine_errors
    def join(
        self,
        right: "Frame | DataFrame",
        on: Sequence[str] | tuple[Sequence[str], Sequence[str]] | Column,
        how: str = "inner",
    ) -> "Frame":
        """Equi-join (``LogicalPlan::Join``,
        ``src/logical_plan/logical_plan.rs:97-110``).

        ``on`` accepts:
        - a list of shared column names (coalesced join keys),
        - a ``(left_keys, right_keys)`` pair — the reference's signature
          (``data_frame.rs:73``); key lists must be equal length,
        - an arbitrary join ``Column`` condition (beyond-reference).

        ``how``: inner/left/right (+ all Spark types: full, semi, anti,
        cross — beyond-reference). Catalyst picks broadcast-hash /
        shuffled-hash / sort-merge; at scale, broadcast small dims with
        ``pyspark.sql.functions.broadcast`` at the call site.
        """
        rdf = right.df if isinstance(right, Frame) else right
        if isinstance(on, tuple) and len(on) == 2 and not isinstance(on, Column):
            left_keys, right_keys = on
            if len(left_keys) != len(right_keys):
                # data_frame.rs:79-84 raises on mismatched key lists
                raise ValueError(
                    f"join key lists differ in length: {left_keys} vs {right_keys}"
                )
            cond = None
            for lk, rk in zip(left_keys, right_keys):
                c = self.df[lk] == rdf[rk]
                cond = c if cond is None else (cond & c)
            return Frame(self.df.join(rdf, cond, how))
        return Frame(self.df.join(rdf, on, how))

    # -- beyond-reference builders (SURVEY §7 M2) ---------------------

    def order_by(self, *exprs: Column | str) -> "Frame":
        return Frame(self.df.orderBy(*exprs))

    def limit(self, n: int) -> "Frame":
        return Frame(self.df.limit(n))

    def distinct(self) -> "Frame":
        return Frame(self.df.distinct())

    def union(self, other: "Frame | DataFrame") -> "Frame":
        odf = other.df if isinstance(other, Frame) else other
        return Frame(self.df.unionByName(odf))

    def intersect(self, other: "Frame | DataFrame") -> "Frame":
        odf = other.df if isinstance(other, Frame) else other
        return Frame(self.df.intersect(odf))

    def except_(self, other: "Frame | DataFrame") -> "Frame":
        """SQL EXCEPT (distinct), matching ``operators.setops.except_``."""
        odf = other.df if isinstance(other, Frame) else other
        return Frame(self.df.subtract(odf))

    def except_all(self, other: "Frame | DataFrame") -> "Frame":
        """SQL EXCEPT ALL (bag semantics — keeps duplicate multiplicity)."""
        odf = other.df if isinstance(other, Frame) else other
        return Frame(self.df.exceptAll(odf))

    def with_column(self, name: str, expr: Column) -> "Frame":
        return Frame(self.df.withColumn(name, expr))

    # -- sinks (beyond-reference: the reference returns in-memory
    # batches only, SURVEY §2.1) ---------------------------------------

    def write_parquet(self, path: str, **kwargs) -> None:
        from rs_query_engine_spark.sources.sinks import write_parquet

        write_parquet(self.df, path, **kwargs)

    def write_csv(self, path: str, **kwargs) -> None:
        from rs_query_engine_spark.sources.sinks import write_csv

        write_csv(self.df, path, **kwargs)

    def write_json(self, path: str, **kwargs) -> None:
        from rs_query_engine_spark.sources.sinks import write_json

        write_json(self.df, path, **kwargs)

    # -- execution ----------------------------------------------------

    def collect(self):
        return self.df.collect()

    def show(self, n: int = 20, truncate: bool = True) -> None:
        self.df.show(n, truncate)

    def explain_str(self, mode: str = "formatted") -> str:
        from rs_query_engine_spark.plans.explain import explain_str

        return explain_str(self.df, mode)

    @property
    def schema(self):
        return self.df.schema

    def count(self) -> int:
        return self.df.count()


class Engine:
    """Top-level facade: session + catalog + table access.

    Usage::

        eng = Engine()
        eng.catalog.register_parquet("lineitem", ".../lineitem.parquet")
        frame = eng.table("lineitem").filter(col("l_quantity") > 30)
    """

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark()
        self.catalog = Catalog(self.spark)

    def table(self, name: str) -> Frame:
        """``Catalog::get_table_df`` (``src/catalog.rs:31-42``): root a
        query builder at a registered table's scan."""
        return Frame(self.catalog.table(name))

    def sql(self, query: str) -> Frame:
        """SQL entry point (beyond-reference: the reference has no SQL
        front end — SURVEY §3). Catalyst parses/optimizes identically
        to the builder path."""
        return Frame(self.spark.sql(query))

    def register_pandas_udf(self, name: str, fn, return_type: str):
        """Register a vectorized (Arrow-batched) scalar UDF usable from
        both SQL and the builder API — beyond-reference (SURVEY §2.6
        lists UDF registration as absent).

        ``fn`` receives/returns ``pandas.Series``. Pandas UDFs are the
        ONLY sanctioned Python hook in the expression hot path: Arrow
        batching keeps the JVM↔Python transfer columnar (~10-100× over
        row-at-a-time Python UDFs); built-in functions still beat them
        — reach for this only when no `pyspark.sql.functions`
        composition expresses the logic."""
        from pyspark.sql.functions import pandas_udf

        udf = pandas_udf(fn, returnType=return_type)
        self.spark.udf.register(name, udf)
        return udf
