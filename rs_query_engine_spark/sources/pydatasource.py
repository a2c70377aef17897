"""Pure-Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) —
the extension point the reference's ``Table`` trait maps to when a
format has no JVM connector (``src/datasource/table.rs:10-19`` defines
exactly this contract: schema + partitioned scan).

``CsvLinesDataSource`` reads a directory of headered CSV part files
with one Spark INPUT PARTITION PER FILE, so a custom pure-Python
format still scans in parallel and scales with file count — the same
planning contract as the built-in file sources. Parsing uses the
stdlib ``csv`` module (correct quoted-field handling) and coerces to
the user-supplied schema; numeric fields round-trip exactly because
Spark's CSV writer emits shortest-repr doubles and ``float()`` parses
them back to the identical bits.

This is the demo-scale reference implementation of the surface: a
production Python source adds column pruning via the reader's schema
argument and predicate pushdown via ``pushFilters`` (Spark 4.1+), and
yields Arrow ``RecordBatch``es instead of tuples once per-row Python
cost matters. What it demonstrates is the part that cannot be faked:
partition planning, executor-side pure-Python reads, and exact value
round-trip through a user-defined format.
"""

from __future__ import annotations

import csv
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)
from pyspark.sql.types import StructType


class CsvLinesDataSource(DataSource):
    """``spark.read.format("rsqes_pycsv").schema(ddl).load(path)`` —
    a headered-CSV directory reader implemented entirely in Python."""

    @classmethod
    def name(cls) -> str:
        return "rsqes_pycsv"

    def schema(self) -> str:
        # Schema is required from the caller (inference would need an
        # extra pass and could downgrade types — the same reason
        # catalog.register_csv takes an explicit schema).
        ddl = self.options.get("schema_ddl")
        if not ddl:
            raise ValueError(
                "rsqes_pycsv requires .schema(ddl) or a schema_ddl option"
            )
        return ddl

    def reader(self, schema: StructType) -> "CsvLinesReader":
        return CsvLinesReader(schema, self.options["path"])


class CsvLinesReader(DataSourceReader):
    def __init__(self, schema: StructType, path: str) -> None:
        self.fields = [(f.name, f.dataType.simpleString()) for f in schema]
        self.path = path

    def partitions(self):
        files = sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if f.endswith(".csv")
        )
        # one partition per part file: parallelism = file count, the
        # same contract the JVM file sources plan with
        return [InputPartition(f) for f in files]

    def read(self, partition: InputPartition):
        def coerce(x: str, t: str):
            if t in ("bigint", "int", "smallint", "tinyint"):
                return int(x) if x != "" else None
            if t in ("double", "float"):
                return float(x) if x != "" else None
            return x

        with open(partition.value, newline="") as f:
            rows = csv.reader(f)
            header = next(rows, None)
            if header is not None and [h for h, _ in self.fields] != header:
                raise ValueError(
                    f"{partition.value}: header {header} does not match "
                    f"schema {[h for h, _ in self.fields]}"
                )
            for row in rows:
                yield tuple(coerce(x, t) for x, (_, t) in zip(row, self.fields))


def ensure_customer_csv(spark, sf_dir: str) -> str:
    """The customer-table CSV artifact (same stable path and contents
    as source_csv_roundtrip's — shared so both the JVM and the Python
    reader scan the identical files)."""
    import hashlib
    import tempfile

    from rs_query_engine_spark.sources.corpus import load_table
    from rs_query_engine_spark.sources.sinks import write_csv

    digest = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:16]
    path = os.path.join(tempfile.gettempdir(), f"rsqes_csv_{digest}", "customer")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        write_csv(load_table(spark, sf_dir, "customer"), path, coalesce_files=4)
    return path
