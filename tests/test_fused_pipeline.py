"""Single-pass (fused) micro-batch pipeline: state parity with the classic
two-job path, quarantine/stats side-write correctness, pre-commit error-limit
abort, resume, and the one-python-eval plan invariant."""

from __future__ import annotations

import numpy as np
import pytest

from datax_3_0_0_src_spark.cdc.gen import EventGenConfig, write_event_log
from datax_3_0_0_src_spark.cdc.oracle import gen_events_pdf, validate_pd
from datax_3_0_0_src_spark.cdc.quarantine import ErrorLimitExceeded
from datax_3_0_0_src_spark.cdc.replayer import ReplayConfig, Replayer

from test_replayer_e2e import CFG, assert_state_matches

FUSED = dict(merge_mode="mor", dedup_per_batch=False, lineage_level="global",
             single_pass=True)


@pytest.fixture()
def log_and_work(spark, tmp_path):
    log_dir = str(tmp_path / "wal")
    write_event_log(spark, CFG, log_dir, slices=4)
    return log_dir, str(tmp_path / "work"), str(tmp_path / "pages")


def make(spark, log_dir, work, table, **kw) -> Replayer:
    return Replayer(spark, ReplayConfig(
        log_dir=log_dir, work_dir=work, table_path=table, num_buckets=8,
        **{**FUSED, **kw}))


def test_fused_replay_matches_oracle_and_counts(spark, log_and_work):
    log_dir, work, table = log_and_work
    rep = make(spark, log_dir, work, table)
    results = rep.run()
    assert [r.epoch for r in results] == [0, 1, 2]
    assert_state_matches(rep, CFG)

    ev = gen_events_pdf(CFG, np.arange(CFG.n_events))
    n_dirty = int((~validate_pd(ev)).sum())
    q = rep.quarantine()
    assert q.count() == n_dirty
    assert {"log_offset", "url", "reason", "raw_payload", "bucket"} <= set(q.columns)
    assert sum(r.events_quarantined for r in results) == n_dirty
    assert sum(r.events_read for r in results) == CFG.n_events

    m = rep.metrics().toPandas()
    assert m["events_read"].sum() == CFG.n_events
    assert m["events_quarantined"].sum() == n_dirty
    assert m["bytes_in"].sum() > 0
    # per-bucket applied rows (from delta footers) sum to the global applied
    assert (
        m.loc[m.partition_id >= 0, "events_applied"].sum()
        == sum(r.events_applied for r in results)
    )


def test_fused_state_identical_to_classic(spark, log_and_work):
    log_dir, work, table = log_and_work
    classic = Replayer(spark, ReplayConfig(
        log_dir=log_dir, work_dir=work + "_c", table_path=table + "_c",
        num_buckets=8))
    classic.run()
    fused = make(spark, log_dir, work, table)
    fused.run()
    c = classic.table.read().toPandas().sort_values("url").reset_index(drop=True)
    f = fused.table.read().toPandas().sort_values("url").reset_index(drop=True)
    assert list(c["url"]) == list(f["url"])
    assert list(c["text"]) == list(f["text"])
    assert list(c["html"].map(lambda b: None if b is None else bytes(b))) == \
        list(f["html"].map(lambda b: None if b is None else bytes(b)))


def test_fused_error_limit_aborts_before_commit(spark, log_and_work):
    log_dir, work, table = log_and_work
    rep = make(spark, log_dir, work, table, error_record_limit=0,
               error_percentage_limit=None)
    with pytest.raises(ErrorLimitExceeded):
        rep.run()
    # the pre-commit gate fired after the write but before the manifest
    # commit: no snapshot beyond the empty v0, no checkpoints
    assert rep.table.snapshot().version == 0
    assert rep.committed_pairs() == set()


def test_fused_resume_and_idempotent_rerun(spark, log_and_work):
    log_dir, work, table = log_and_work
    rep1 = make(spark, log_dir, work, table)
    assert len(rep1.run(stop_after_batches=1)) == 1
    rep2 = make(spark, log_dir, work, table)
    assert [r.epoch for r in rep2.run()] == [1, 2]
    assert_state_matches(rep2, CFG)
    v = rep2.table.snapshot().version
    rep3 = make(spark, log_dir, work, table)
    assert rep3.run() == []
    assert rep3.table.snapshot().version == v


def test_fused_with_per_batch_dedup(spark, log_and_work):
    log_dir, work, table = log_and_work
    rep = make(spark, log_dir, work, table, dedup_per_batch=True)
    rep.run()
    assert_state_matches(rep, CFG)


def test_fused_single_python_eval_in_plan(spark, log_and_work):
    """Both struct-field references (filter on .reason, project .text) must
    resolve to ONE ArrowEvalPython node — a duplicated evaluation would run
    the whole extraction twice and double the quarantine side-write."""
    from datax_3_0_0_src_spark.cdc.fused import apply_fused
    from datax_3_0_0_src_spark.lake.table import SYS_BUCKET
    from pyspark.sql import functions as F

    log_dir, work, _table = log_and_work
    df = (
        spark.read.parquet(log_dir + "/epoch=0")
        .withColumn(SYS_BUCKET, F.lit(0))
    )
    out = apply_fused(df, epoch=0, slice_dir=work + "/probe")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") + plan.count("BatchEvalPython") == 1, plan
