"""Engine error taxonomy.

Analogue of the reference's ``Error`` enum (``src/error.rs:5-14``:
NoSuchField / ArrowError / IOError / NoSuchTable / LogicalPlanError /
PhysicalPlanError / IntervalError (sic, type mismatches) /
NoSuchColumn). Spark surfaces the analysis-time cases as
``AnalysisException`` with error-class codes; this module maps them to
the reference's granularity so callers can catch specific failures
without string-matching JVM messages.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException


class EngineError(Exception):
    """Base class for engine errors (≙ ``Error``, ``src/error.rs:5``)."""


class NoSuchTableError(EngineError, KeyError):
    """Unknown table name (≙ ``Error::NoSuchTable``, ``src/error.rs:9``)."""


class NoSuchColumnError(EngineError, KeyError):
    """Unknown column in an expression (≙ ``Error::NoSuchColumn``,
    ``src/error.rs:13``; the reference raises it at name→ordinal
    resolution, ``src/planner/mod.rs:152-162``)."""


class TypeMismatchError(EngineError, TypeError):
    """Operand type mismatch (≙ ``Error::IntervalError`` — the
    reference's misnamed type-error variant, ``src/error.rs:12``,
    raised by the binary-expr kernels,
    ``src/physical_plan/expr/binary.rs:111-116``)."""


class PlanError(EngineError):
    """Logical/physical planning failure (≙ ``Error::LogicalPlanError``
    / ``Error::PhysicalPlanError``)."""


# Spark error classes → engine error types. UNRESOLVED_COLUMN covers
# both unknown names and out-of-scope references; DATATYPE_MISMATCH
# covers the binary-kernel type errors.
_ERROR_CLASS_MAP = {
    "UNRESOLVED_COLUMN": NoSuchColumnError,
    "UNRESOLVED_ROUTINE": PlanError,
    "TABLE_OR_VIEW_NOT_FOUND": NoSuchTableError,
    "DATATYPE_MISMATCH": TypeMismatchError,
}


def translate(exc: AnalysisException) -> EngineError:
    """Map a Spark ``AnalysisException`` to the engine taxonomy (falls
    back to ``PlanError``)."""
    cls = exc.getCondition() or ""
    for prefix, err_type in _ERROR_CLASS_MAP.items():
        if cls.startswith(prefix):
            return err_type(exc.getMessage())
    return PlanError(exc.getMessage())


def raising_engine_errors(fn):
    """Decorator: re-raise ``AnalysisException`` from ``fn`` as the
    engine taxonomy."""

    def wrapper(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except AnalysisException as exc:
            raise translate(exc) from exc

    return wrapper
