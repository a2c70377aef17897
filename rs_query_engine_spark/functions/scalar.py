"""Scalar function surface.

The reference declares five scalar functions as a logical enum with no
physical implementation (``ScalarFunc::{CONCAT, SUBSTRING, ABS, SQRT,
POWER}``, ``src/logical_plan/logical_expr.rs:130-157``; planner hits
``unimplemented!()``, ``src/planner/mod.rs:164``). Here each is the
Spark built-in — JVM-side, codegen'd, fully implemented.

Type notes: SQRT/POWER return Double (the reference declares Int64 —
SURVEY §2.5 says use Spark's SQL-correct types); ABS preserves input
type; CONCAT returns NULL if any argument is NULL (SQL semantics).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["concat", "substring", "abs_", "sqrt", "power"]


def _c(expr: Column | str) -> Column:
    return F.col(expr) if isinstance(expr, str) else expr


def concat(*exprs: Column | str) -> Column:
    """CONCAT(a, b, ...) → string (``logical_expr.rs:133,141-144``)."""
    return F.concat(*[_c(e) for e in exprs])


def substring(expr: Column | str, pos: int, length: int) -> Column:
    """SUBSTRING(s, pos, len) → string; 1-based pos (SQL)."""
    return F.substring(_c(expr), pos, length)


def abs_(expr: Column | str) -> Column:
    """ABS(x); preserves numeric input type."""
    return F.abs(_c(expr))


def sqrt(expr: Column | str) -> Column:
    """SQRT(x) → double."""
    return F.sqrt(_c(expr))


def power(expr: Column | str, exponent: Column | float) -> Column:
    """POWER(x, p) → double."""
    return F.pow(_c(expr), exponent)
