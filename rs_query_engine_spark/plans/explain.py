"""Plan introspection helpers.

Analogue of the reference's logical-plan pretty printer
(``src/logical_plan/logical_plan.rs:113-204``) — except the plan being
printed is Catalyst's, so the output also shows what the optimizer did:
pushed filters, pruned columns, chosen join strategy, codegen stages.
Used by tests to assert scale properties (pushdown happened, a dim join
went broadcast) rather than just result correctness.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Return ``df.explain(mode)`` output as a string instead of
    printing it."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def physical_plan_contains(df: DataFrame, *needles: str, mode: str = "formatted") -> bool:
    """True if every ``needle`` appears in the physical plan text.

    Examples: ``physical_plan_contains(df, "PushedFilters: [IsNotNull")``,
    ``physical_plan_contains(df, "BroadcastHashJoin")``.
    """
    plan = explain_str(df, mode)
    return all(n in plan for n in needles)
