"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §7 M2.6; the reference has no streaming or state concept —
SURVEY §2.6). This is the escape hatch for stream semantics Spark's
built-in windowed aggregations can't express: arbitrary per-key state
machines, custom eviction, cross-batch logic.

Scale notes: state is partitioned by the grouping key and lives in the
executor-local state store (RocksDB-backed in production via
``spark.sql.streaming.stateStore.providerClass``) — state size is
bounded by distinct keys, not event volume. Always configure a timeout
(or watermark-driven eviction) for unbounded key domains; the
demo operator uses NoTimeout because the corpus key domain (user_id)
is finite.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_counts(events: DataFrame) -> DataFrame:
    """Per-user running event count — a stateful stream aggregate
    implemented as an explicit state machine (the ``update``-mode
    emission per micro-batch that ``groupBy().count()`` would give,
    but with user-owned state you can extend with arbitrary logic:
    conditional resets, per-key thresholds, custom eviction).

    Emits one row per (user, micro-batch containing that user):
    the count is monotone, so the latest value per user is
    ``max(n_events)`` — which makes the final state batch-checkable
    against ``SELECT user_id, COUNT(*) FROM events GROUP BY user_id``.
    """

    def update_counts(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        (n,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [user_id], "n_events": [n]})

    return events.groupBy("user_id").applyInPandasWithState(
        update_counts,
        outputStructType="user_id bigint, n_events bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
