"""The reliable-checkpoint switch (VERDICT r09 #4).

``session.truncate_lineage`` is the single helper every lineage cut in
the engine routes through (``df.transform(truncate_lineage)``).
Default = ``localCheckpoint`` (executor block storage); with
``RSQES_CHECKPOINT_DIR`` set it must instead write a reliable
checkpoint under that directory via ``setCheckpointDir`` +
``DataFrame.checkpoint``. These tests pin that the env var flips the
checkpoint KIND (observable as RDD checkpoint files landing under the
directory) and that the data coming back is identical either way.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from rs_query_engine_spark.session import truncate_lineage


def _sample(spark):
    return (
        spark.range(0, 1000)
        .withColumn("g", F.col("id") % 7)
        .groupBy("g")
        .agg(F.count("*").alias("n"), F.sum("id").alias("s"))
    )


def _walk(root):
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        out.extend(os.path.join(dirpath, f) for f in filenames)
    return out


def test_default_is_local_checkpoint(spark, monkeypatch, tmp_path):
    monkeypatch.delenv("RSQES_CHECKPOINT_DIR", raising=False)
    df = _sample(spark)
    cut = truncate_lineage(df)
    # localCheckpoint materializes to executor storage — nothing may
    # appear under any filesystem checkpoint dir because of THIS call
    assert sorted(map(tuple, cut.collect())) == sorted(map(tuple, df.collect()))
    assert not (tmp_path / "ckpt").exists()


def test_env_var_switches_to_reliable_checkpoint(spark, monkeypatch, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    monkeypatch.setenv("RSQES_CHECKPOINT_DIR", ckpt)
    df = _sample(spark)
    cut = truncate_lineage(df)
    rows = sorted(map(tuple, cut.collect()))
    # identical data through the reliable path
    assert rows == sorted(map(tuple, df.collect()))
    # the checkpoint physically landed under the configured dir
    files = _walk(ckpt)
    assert files, "reliable checkpoint wrote no files under RSQES_CHECKPOINT_DIR"
    # and the session's checkpoint dir points inside it
    got = spark.sparkContext.getCheckpointDir()
    assert got is not None and got.replace("file:", "").startswith(ckpt)


def test_reliable_and_local_results_identical(spark, monkeypatch, tmp_path):
    """The flip is a fault-tolerance trade only — both paths must hand
    downstream consumers the same rows (the operators' correctness
    cannot depend on which checkpoint kind materialized them)."""
    df = _sample(spark)
    monkeypatch.delenv("RSQES_CHECKPOINT_DIR", raising=False)
    local_rows = sorted(map(tuple, truncate_lineage(df).collect()))
    monkeypatch.setenv("RSQES_CHECKPOINT_DIR", str(tmp_path / "ckpt2"))
    reliable_rows = sorted(map(tuple, truncate_lineage(df).collect()))
    assert local_rows == reliable_rows


def test_all_lineage_cuts_route_through_the_helper():
    """No raw ``.localCheckpoint()`` call sites may remain in the
    package — every cut goes through ``truncate_lineage`` so ONE env
    var governs all of them (SURVEY §8; VERDICT r09 #4's done
    criterion)."""
    import rs_query_engine_spark

    pkg_root = os.path.dirname(rs_query_engine_spark.__file__)
    offenders = []
    for dirpath, _dirnames, filenames in os.walk(pkg_root):
        if "__pycache__" in dirpath:
            continue
        for fname in filenames:
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            if os.path.basename(path) == "session.py":
                continue  # the helper itself
            with open(path) as f:
                src = f.read()
            if ".localCheckpoint()" in src:
                offenders.append(os.path.relpath(path, pkg_root))
    assert not offenders, f"raw localCheckpoint call sites: {offenders}"


def test_checkpoint_dir_pointed_once_per_session(spark, monkeypatch, tmp_path):
    """ADVICE r10 regression pin: repeated lineage cuts under the same
    RSQES_CHECKPOINT_DIR must NOT re-run setCheckpointDir (each call
    mints a fresh <uuid> subdir, accumulating unboundedly on long
    runs). Two cuts -> exactly one uuid subdir; moving the env var
    re-points exactly once more."""

    def _uuid_dirs(root):
        return [
            d
            for d in os.listdir(root)
            if not d.startswith(".")
            and os.path.isdir(os.path.join(root, d))
        ]

    ckpt = str(tmp_path / "ckpt_once")
    monkeypatch.setenv("RSQES_CHECKPOINT_DIR", ckpt)
    truncate_lineage(_sample(spark)).collect()
    truncate_lineage(_sample(spark)).collect()
    assert len(_uuid_dirs(ckpt)) == 1, _uuid_dirs(ckpt)
    ckpt2 = str(tmp_path / "ckpt_moved")
    monkeypatch.setenv("RSQES_CHECKPOINT_DIR", ckpt2)
    truncate_lineage(_sample(spark)).collect()
    truncate_lineage(_sample(spark)).collect()
    assert len(_uuid_dirs(ckpt2)) == 1, _uuid_dirs(ckpt2)
