#!/usr/bin/env python
"""Capture before/after formatted plans for the probe_pq_index
probe-batch staging (round 18). "before" monkeypatches the staging
back to identity — the exact pre-change spelling."""
import os
import sys

ARM = sys.argv[1]  # before | after
OUT = "/root/repo/plans/r18"

import rs_query_engine_spark.operators.ivf_index as ix  # noqa: E402

if ARM == "before":
    ix.truncate_lineage = lambda df: df

from rs_query_engine_spark import queries as registry  # noqa: E402
from rs_query_engine_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name=f"capture-pq-{ARM}")
qs = registry.queries()
for name in ("similarity_pq_index_probe", "similarity_pq_refine"):
    df = qs[name](spark, "/root/testdata/sf0.1")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(OUT, f"{name}_{ARM}.txt"), "w") as f:
        f.write(buf.getvalue())
    print(name, ARM, "captured", len(buf.getvalue()))
spark.stop()
