"""Driver-shaped DuckDB re-drive for a holding-pen module.

Mirrors the round driver's t2 gate (collect + DuckDB compare with
columns sorted by name, exact values) against a pen module's
``queries()`` / ``oracle_sql()`` at an arbitrary SF dir. This is the
pre-flip gate: every pen query must print PASS here at sf0.01 before
its ``STAGED_R{N}_ENABLED`` flag flips (r12-r15 precedent).

Usage:
    PYTHONPATH=/root/repo python scripts/drive_pen.py \
        rs_query_engine_spark.queries_staged_r15 /root/testdata/sf0.01
"""

from __future__ import annotations

import datetime
import importlib
import math
import sys

import duckdb

from rs_query_engine_spark.session import get_spark
from rs_query_engine_spark.sources.corpus import TABLES
from rs_query_engine_spark.typefamilies import arrow_family, spark_family


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def _normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(_norm_cell(row[i]) for i in order) for row in rows]
    return sorted(out, key=repr)


def main() -> int:
    mod_name, sf_dir = sys.argv[1], sys.argv[2]
    mod = importlib.import_module(mod_name)
    spark = get_spark(shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = mod.queries()
    oracles = mod.oracle_sql()
    failed = []
    for name in sorted(queries):
        sdf = queries[name](spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        sql = oracles.get(name)
        if sql is None:
            print(f"{name}: rows-only ({len(srows)} rows)")
            continue
        tbl = con.execute(sql).fetch_arrow_table()
        dcols = tbl.column_names
        drows = [tuple(r.values()) for r in tbl.to_pylist()]
        ok_cols = sorted(scols) == sorted(dcols)
        ok_rows = len(srows) == len(drows)
        # The driver hash is type-sensitive: equal values in different
        # type families (HUGEINT vs bigint, DECIMAL vs double) still
        # fail the real driver, so the gate asserts families too.
        stypes = {
            f.name: spark_family(f.dataType.simpleString())
            for f in sdf.schema.fields
        }
        dtypes = {f.name: arrow_family(f.type) for f in tbl.schema}
        ok_types = stypes == dtypes
        ok_vals = (
            ok_cols
            and ok_rows
            and ok_types
            and _normalize(srows, scols) == _normalize(drows, dcols)
        )
        status = "PASS" if ok_vals else "FAIL"
        if not ok_vals:
            failed.append(name)
        print(
            f"{name}: {status} rows={len(srows)}/{len(drows)} "
            f"cols={'ok' if ok_cols else (scols, dcols)} "
            f"types={'ok' if ok_types else (stypes, dtypes)}"
        )
    spark.stop()
    if failed:
        print("FAILED:", failed)
        return 1
    print(f"ALL PASS ({len(queries)} queries)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
