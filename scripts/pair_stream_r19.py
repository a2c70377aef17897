#!/usr/bin/env python
"""Interleaved paired timing for stream conf experiments (r19).

Each invocation is ONE fresh-session timed run of the named queries
(the bench's measurement shape: noop sink, gc between). Environment
selects the variant:
  RSQES_STREAM_PARTS   — if set, forces state_partitions for every
                         run_stream_to_memory call
The caller (shell loop) alternates base/variant and aggregates.

Usage: python scripts/pair_stream_r19.py q1 q2 ...   # one run, JSON out
"""
import gc
import json
import os
import sys
import time

import rs_query_engine_spark.streaming.events as ev
from rs_query_engine_spark import queries as registry
from rs_query_engine_spark.session import get_spark

SF = os.environ.get("SF", "/root/testdata/sf0.1")
NAMES = sys.argv[1:]

forced = os.environ.get("RSQES_STREAM_PARTS")
scratch = os.environ.get("RSQES_STREAM_SCRATCH")
if forced or scratch:
    import shutil
    import uuid

    _orig = ev.run_stream_to_memory

    def patched(stream_df, query_name, output_mode="complete",
                state_partitions=8, available_now=False):
        if forced:
            state_partitions = int(forced)
        if not scratch:
            return _orig(stream_df, query_name, output_mode=output_mode,
                         state_partitions=state_partitions,
                         available_now=available_now)
        # replicate _orig but with an explicit tmpfs checkpoint dir
        spark = stream_df.sparkSession
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
        ck = os.path.join(scratch, f"ck-{query_name}-{uuid.uuid4().hex}")
        try:
            writer = (stream_df.writeStream.outputMode(output_mode)
                      .format("memory").queryName(query_name)
                      .option("checkpointLocation", ck))
            if available_now:
                writer = writer.trigger(availableNow=True)
            q = writer.start()
            try:
                if available_now:
                    q.awaitTermination()
                else:
                    q.processAllAvailable()
            finally:
                q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            shutil.rmtree(ck, ignore_errors=True)
        return spark.sql(f"SELECT * FROM {query_name}")

    ev.run_stream_to_memory = patched

spark = get_spark(app_name="pair-stream-r19")
qs = registry.queries()

out = {}
for name in NAMES:
    fn = qs[name]
    gc.collect()
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    out[name] = round(time.perf_counter() - t0, 4)
print(json.dumps(out))
spark.stop()
