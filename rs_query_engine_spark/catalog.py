"""Named-table catalog.

Analogue of the reference's ``Catalog`` (``src/catalog.rs:11-43``):
``add_csv_table`` / ``get_table_by_name`` / ``get_table_df``. Differences
by design:

- Registration is **lazy**: we register a reader-backed DataFrame as a
  temp view instead of eagerly materializing the file into RAM
  (the reference loads whole CSVs at registration,
  ``src/datasource/csv_table.rs:44-72``). At 100 TB, eager load is not
  an option; a lazy view lets Catalyst push filters/column pruning into
  the scan so only the needed bytes are read.
- Multiple formats: parquet (primary), CSV (reference's only format),
  JSON, and in-memory rows for tests.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

from rs_query_engine_spark.errors import NoSuchTableError

__all__ = ["Catalog", "NoSuchTableError"]


class Catalog:
    """Registry of named tables bound to one SparkSession."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self._tables: dict[str, DataFrame] = {}

    # -- registration -------------------------------------------------

    def register_parquet(self, name: str, path: str) -> DataFrame:
        """Register a parquet-backed table (vectorized scan + pushdown)."""
        return self._register(name, self.spark.read.parquet(path))

    def register_csv(
        self,
        name: str,
        path: str,
        header: bool = True,
        infer_schema: bool = True,
        schema=None,
        delimiter: str = ",",
    ) -> DataFrame:
        """Register a CSV table.

        Mirrors ``CSVTable::try_create_table``
        (``src/datasource/csv_table.rs:44-72``): header row + inferred
        schema + comma delimiter. Spark's inference scans the file once
        (the reference samples 3 rows); pass an explicit ``schema`` to
        skip inference for large files.
        """
        reader = self.spark.read.option("header", header).option("delimiter", delimiter)
        if schema is not None:
            reader = reader.schema(schema)
        elif infer_schema:
            reader = reader.option("inferSchema", True)
        return self._register(name, reader.csv(path))

    def register_orc(self, name: str, path: str) -> DataFrame:
        """Register an ORC-backed table (vectorized scan + pushdown,
        Spark's second built-in columnar format)."""
        return self._register(name, self.spark.read.orc(path))

    def register_json(self, name: str, path: str, schema=None) -> DataFrame:
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        return self._register(name, reader.json(path))

    def register_memory(self, name: str, rows: Iterable, schema) -> DataFrame:
        """Register an in-memory table (the reference hints at a memory
        source in ``src/datasource/table.rs:9`` but never builds one)."""
        return self._register(name, self.spark.createDataFrame(rows, schema))

    def register_df(self, name: str, df: DataFrame) -> DataFrame:
        """Register an existing DataFrame under a name."""
        return self._register(name, df)

    def _register(self, name: str, df: DataFrame) -> DataFrame:
        df.createOrReplaceTempView(name)
        self._tables[name] = df
        return df

    # -- lookup -------------------------------------------------------

    def table(self, name: str) -> DataFrame:
        """Fetch a registered table (``Catalog::get_table_by_name``,
        ``src/catalog.rs:24-29``)."""
        try:
            return self._tables[name]
        except KeyError:
            raise NoSuchTableError(name) from None

    def table_names(self) -> list[str]:
        return sorted(self._tables)

    def __contains__(self, name: str) -> bool:
        return name in self._tables
