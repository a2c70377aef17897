"""Expression builders.

Analogue of the reference's logical expression layer
(``src/logical_plan/logical_expr.rs``): ``Column``/``Literal``/``Alias``
plus binary comparison, boolean, and arithmetic operators
(``src/physical_plan/expr/binary.rs``). In Spark these are all
``pyspark.sql.Column`` expressions — JVM-side, participating in
whole-stage codegen — so this module is intentionally thin: its job is
to present the reference's builder vocabulary, not to re-evaluate
anything in Python.

Semantic notes vs the reference:
- The reference requires strict same-type operands for arithmetic
  (``src/physical_plan/expr/binary.rs:111-116``); Spark applies standard
  SQL implicit numeric coercion — strictly more permissive, kept.
- The reference's 6 scalar types (Null/Boolean/Int64/UInt64/Float64/
  Utf8, ``src/datatype/scalar.rs:13-26``) map to Spark
  Boolean/Long/Double/String; UInt64 maps to Long (it is only used for
  COUNT results in the reference, where Spark's count() is Long).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["col", "lit", "alias", "and_", "or_", "not_"]


def col(name: str) -> Column:
    """Column reference (``LogicalExpr::Column``,
    ``src/logical_plan/logical_expr.rs:19``)."""
    return F.col(name)


def lit(value) -> Column:
    """Literal scalar, lazily broadcast by Catalyst — the analogue of
    ``ColumnArray::Literal`` (``src/datatype/column_array.rs:11-14``)."""
    return F.lit(value)


def alias(expr: Column, name: str) -> Column:
    """Rename an expression's output field (``LogicalExpr::Alias``,
    ``src/logical_plan/logical_expr.rs:123-127``)."""
    return expr.alias(name)


def and_(*exprs: Column) -> Column:
    """N-ary boolean AND (``Operator::And``,
    ``src/logical_plan/logical_expr.rs:107``)."""
    out = exprs[0]
    for e in exprs[1:]:
        out = out & e
    return out


def or_(*exprs: Column) -> Column:
    """N-ary boolean OR (``Operator::Or``)."""
    out = exprs[0]
    for e in exprs[1:]:
        out = out | e
    return out


def not_(expr: Column) -> Column:
    return ~expr
