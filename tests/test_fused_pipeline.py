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


def test_quarantine_requeue_after_rule_fix(spark, log_and_work):
    """Round-4 operator: overtight validation rule quarantines good rows ->
    rule fixed -> requeue reprocesses them through the same fused pipeline ->
    final state equals a replay that never had the bad rule; intrinsically
    dirty rows stay quarantined; lineage carries the requeue pass."""
    from pyspark.sql import functions as F

    from datax_3_0_0_src_spark.cdc.quarantine import reason_col

    log_dir, work, table = log_and_work

    def strict_rule(op_col="op", delete_op="D"):
        base = reason_col(op_col, delete_op)
        overtight = F.pmod(F.xxhash64(F.col("url")), F.lit(7)) == 0
        return (
            F.when(base.isNotNull(), base)
            .when(overtight, F.lit("overtight_rule"))
            .otherwise(F.lit(None).cast("string"))
        )

    rep = make(spark, log_dir, work, table, validity_rule=strict_rule,
               error_percentage_limit=0.5)
    rep.run()
    q0 = rep.quarantine().toPandas()
    n_overtight = int((q0["reason"] == "overtight_rule").sum())
    assert n_overtight > 0  # the bad rule really quarantined good rows

    # rule fixed: a new replayer over the SAME work/table dirs, default rule
    fixed = make(spark, log_dir, work, table)
    out = fixed.requeue_quarantined()
    assert sum(r["events_applied"] for r in out) > 0
    assert_state_matches(fixed, CFG)  # state == replay-without-the-bad-rule

    # only intrinsically dirty rows remain, re-quarantined in rq slices
    ev = gen_events_pdf(CFG, np.arange(CFG.n_events))
    n_dirty = int((~validate_pd(ev)).sum())
    q1 = fixed.quarantine()
    assert q1.count() == n_dirty
    reasons = {r["reason"] for r in q1.select("reason").distinct().collect()}
    assert "overtight_rule" not in reasons

    # lineage: the requeue pass is recorded with a negative checkpoint epoch
    m = fixed.metrics().toPandas()
    rq = m[m["checkpoint_epoch"] < 0]
    assert len(rq) > 0 and rq["events_read"].sum() >= n_overtight

    # repair is idempotent: a second requeue applies nothing and keeps state
    out2 = fixed.requeue_quarantined()
    assert sum(r["events_applied"] for r in out2) == 0
    assert fixed.quarantine().count() == n_dirty
    assert_state_matches(fixed, CFG)


def test_quarantine_schema_stable_across_layouts(spark, log_and_work):
    """ADVICE round-3: quarantine() must surface ONE schema (`bucket` int)
    whether the slices were written by the classic layout (partition column
    `_bucket`), the fused layout (data column), or nobody (typed empty)."""
    log_dir, work, table = log_and_work
    classic = Replayer(spark, ReplayConfig(
        log_dir=log_dir, work_dir=work + "_cl", table_path=table + "_cl",
        num_buckets=8))
    classic.run()
    fused = make(spark, log_dir, work, table)
    fused.run()
    empty = Replayer(spark, ReplayConfig(
        log_dir=log_dir, work_dir=work + "_e", table_path=table + "_e",
        num_buckets=8))
    cols_c = dict(classic.quarantine().dtypes)
    cols_f = dict(fused.quarantine().dtypes)
    cols_e = dict(empty.quarantine().dtypes)
    for cols in (cols_c, cols_f, cols_e):
        assert cols["bucket"] == "int"
        assert "_bucket" not in cols
    assert cols_c.keys() == cols_f.keys() == cols_e.keys()


def test_concurrent_exactly_once_kill_soak(spark, log_and_work):
    """Round-4 soak (verdict item 6): randomized kill points at pipeline
    depth 4 — a batch dies either before its merge or in the window between
    the manifest CAS and its checkpoint write (the exactly-once protocol's
    hard window), while up to 3 sibling batches are in flight. Resume must
    (a) converge to the uninterrupted run's state, (b) apply every event
    exactly once — no duplicate (url, offset) delta rows — across >= 20
    seeded kill points."""
    import random

    from pyspark.sql import functions as F

    log_dir, work, table = log_and_work

    class Kill(RuntimeError):
        pass

    conc = dict(max_events_per_batch=500, max_concurrent_batches=4)

    # uninterrupted baseline
    base = make(spark, log_dir, work + "_b", table + "_b", **conc)
    base.run()
    exp = (base.table.read().toPandas()
           .sort_values("url").reset_index(drop=True))
    n_batches = len(base.plan_batches())
    assert n_batches >= 6

    def delta_rows(rep):
        snap = rep.table.snapshot()
        paths = [
            f"{rep.table.path}/{rel}"
            for b in range(rep.table.num_buckets)
            for rel in snap.bucket_deltas(b)
        ]
        if not paths:
            return 0, 0
        df = spark.read.parquet(*paths)
        dups = (df.groupBy("url", "_lww_offset").count()
                .filter(F.col("count") > 1).count())
        return df.count(), dups

    n_base_delta, _ = delta_rows(base)

    for seed in range(20):
        rng = random.Random(seed)
        target = rng.randrange(n_batches)
        mode = rng.choice(["pre_merge", "post_commit_pre_checkpoint"])
        w, t = f"{work}_k{seed}", f"{table}_k{seed}"
        rep = make(spark, log_dir, w, t, **conc)
        if mode == "post_commit_pre_checkpoint":
            orig_ckpt, fired = rep._write_checkpoint, []

            def ckpt(res, _o=orig_ckpt, _f=fired, _t=target):
                if res.batch_id == _t and not _f:
                    _f.append(1)  # commit already happened; die before ckpt
                    raise Kill(f"kill post-commit batch {_t}")
                _o(res)

            rep._write_checkpoint = ckpt
        else:
            orig_merge, calls = rep.table.merge, []

            def merge(*a, _o=orig_merge, _c=calls, _t=target, **kw):
                _c.append(1)
                if len(_c) - 1 == _t:
                    raise Kill(f"kill pre-merge call {_t}")
                return _o(*a, **kw)

            rep.table.merge = merge
        try:
            rep.run()
            # pre_merge kill on an already-planned batch can land after all
            # real merges when fewer calls happen; a clean run is acceptable
        except (Kill, RuntimeError):
            pass

        resumed = make(spark, log_dir, w, t, **conc)
        resumed.run()
        got = (resumed.table.read().toPandas()
               .sort_values("url").reset_index(drop=True))
        assert list(got["url"]) == list(exp["url"]), f"seed {seed} ({mode})"
        assert list(got["text"]) == list(exp["text"]), f"seed {seed} ({mode})"
        n_delta, dups = delta_rows(resumed)
        assert dups == 0, f"seed {seed} ({mode}): duplicate delta rows"
        assert n_delta == n_base_delta, f"seed {seed} ({mode})"


def test_overlapped_dv_fold_kill_soak(spark, log_and_work):
    """Exactly-once under crashes WITH background DV folds racing the apply:
    kill a merge, a checkpoint write, or the overlapped fold itself; resume
    with the identical config must converge to the uninterrupted baseline
    state with every WAL event present exactly once in the physical rows
    (DV folds promote deltas but never drop rows)."""
    import random

    from pyspark.sql import functions as F

    log_dir, work, table = log_and_work

    class Kill(RuntimeError):
        pass

    conc = dict(max_events_per_batch=500, max_concurrent_batches=4,
                compact_every=2, compact_overlap=True, compact_strategy="dv")

    base = make(spark, log_dir, work + "_db", table + "_db", **conc)
    base.run()
    exp = (base.table.read().toPandas()
           .sort_values("url").reset_index(drop=True))
    n_batches = len(base.plan_batches())

    def physical_rows(rep):
        snap = rep.table.snapshot()
        paths = [f"{rep.table.path}/{rel}"
                 for b in range(rep.table.num_buckets)
                 for rel in snap.bucket_files(b) + snap.bucket_deltas(b)]
        df = spark.read.parquet(*paths)
        dups = (df.groupBy("url", "_lww_offset").count()
                .filter(F.col("count") > 1).count())
        return df.count(), dups

    n_rows_base, dups_base = physical_rows(base)
    assert dups_base == 0

    for seed in range(8):
        rng = random.Random(1000 + seed)
        mode = rng.choice(["pre_merge", "post_commit_pre_checkpoint", "fold"])
        target = rng.randrange(n_batches)
        w, t = f"{work}_dk{seed}", f"{table}_dk{seed}"
        rep = make(spark, log_dir, w, t, **conc)
        if mode == "fold":
            orig_compact, calls = rep.table.compact, []

            def compact(*a, _o=orig_compact, _c=calls, **kw):
                _c.append(1)
                if len(_c) == 1:
                    raise Kill("kill first overlapped fold")
                return _o(*a, **kw)

            rep.table.compact = compact
        elif mode == "post_commit_pre_checkpoint":
            orig_ckpt, fired = rep._write_checkpoint, []

            def ckpt(res, _o=orig_ckpt, _f=fired, _t=target):
                if res.batch_id == _t and not _f:
                    _f.append(1)
                    raise Kill(f"kill post-commit batch {_t}")
                _o(res)

            rep._write_checkpoint = ckpt
        else:
            orig_merge, calls = rep.table.merge, []

            def merge(*a, _o=orig_merge, _c=calls, _t=target, **kw):
                _c.append(1)
                if len(_c) - 1 == _t:
                    raise Kill(f"kill pre-merge call {_t}")
                return _o(*a, **kw)

            rep.table.merge = merge
        try:
            rep.run()
        except (Kill, RuntimeError):
            pass

        resumed = make(spark, log_dir, w, t, **conc)
        resumed.run()
        got = (resumed.table.read().toPandas()
               .sort_values("url").reset_index(drop=True))
        assert list(got["url"]) == list(exp["url"]), f"seed {seed} ({mode})"
        assert list(got["text"]) == list(exp["text"]), f"seed {seed} ({mode})"
        n_rows, dups = physical_rows(resumed)
        assert dups == 0, f"seed {seed} ({mode}): duplicated (url, offset)"
        assert n_rows == n_rows_base, f"seed {seed} ({mode})"


def test_single_pass_normalizes_lineage_level(spark, log_and_work):
    """ADVICE round-3: single_pass cannot produce per-bucket read/dedup
    lineage; requesting 'bucket' alongside it must warn and normalize to
    'global' instead of silently changing the metrics shape."""
    import warnings

    log_dir, work, table = log_and_work
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        rep = Replayer(spark, ReplayConfig(
            log_dir=log_dir, work_dir=work, table_path=table, num_buckets=8,
            merge_mode="mor", dedup_per_batch=False, single_pass=True,
            lineage_level="bucket"))
    assert rep.cfg.lineage_level == "global"
    assert any("lineage_level" in str(x.message) for x in w)


def test_fold_quarantine_compacts_and_preserves_rows(spark, log_and_work):
    """Offline quarantine fold: per-slice small per-task files collapse to
    one, row multiset preserved, idempotent, crash-recovery completes an
    interrupted fold from its marker."""
    import json as _json
    import os

    log_dir, work, table = log_and_work
    rep = make(spark, log_dir, work, table)
    rep.run()
    before = rep.quarantine().toPandas().sort_values(
        ["epoch", "log_offset"]).reset_index(drop=True)
    res = rep.fold_quarantine()
    assert res["slices_scanned"] >= 3
    after = rep.quarantine().toPandas().sort_values(
        ["epoch", "log_offset"]).reset_index(drop=True)
    assert len(after) == len(before)
    assert list(after["log_offset"]) == list(before["log_offset"])
    assert list(after["reason"]) == list(before["reason"])
    # idempotent: nothing left to fold
    res2 = rep.fold_quarantine()
    assert res2["files_removed"] == 0

    # crash recovery: simulate a fold that died between marker write and
    # input deletion — the file listed in the marker must be cleaned up,
    # not re-read alongside the folded output (which would duplicate rows)
    import glob
    import shutil

    q = rep.cfg.quarantine_dir
    d = sorted(glob.glob(os.path.join(q, "slice=*")))[0]
    folded = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(folded) == 1
    dup = "part-orphan.parquet"
    shutil.copy(os.path.join(d, folded[0]), os.path.join(d, dup))
    with open(os.path.join(d, "_fold-deadbeef.json"), "w") as fh:
        _json.dump([dup], fh)
    # a folded-deadbeef.parquet exists? no — marker without dst and without
    # tmp means the fold never wrote output: recovery drops the marker; the
    # orphan input stays and the re-fold merges it normally
    rep.fold_quarantine()
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(files) == 1 and not glob.glob(os.path.join(d, "_fold-*.json"))
    # the orphan was a COPY of the folded file, so the re-fold doubled that
    # slice's rows — precisely what the marker protocol prevents for real
    # interrupted folds (recovery deleted the marker, not the data)
    final = rep.quarantine().toPandas()
    slice_rows = after[after["slice"] == os.path.basename(d)[6:]].shape[0]
    assert len(final) == len(before) + slice_rows


def test_fold_requeue_interleave_with_crash_and_null_offsets(spark, log_and_work):
    """Round-4 verdict item 6: the quarantine lifecycle's last untested seam.
    Interleaves fold -> requeue -> (crash between merge and slice cleanup)
    -> requeue -> fold and asserts (a) convergence to the clean-rule oracle,
    (b) rows with NULL log_offset (foreign WALs — not re-keyable) survive
    every step instead of being deleted by the requeue cleanup (round-4
    advice item 1), (c) metrics reconcile."""
    import glob
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from datax_3_0_0_src_spark.cdc.fused import _dirty_schema
    from datax_3_0_0_src_spark.cdc.quarantine import reason_col

    log_dir, work, table = log_and_work

    def strict_rule(op_col="op", delete_op="D"):
        base = reason_col(op_col, delete_op)
        overtight = F.pmod(F.xxhash64(F.col("url")), F.lit(5)) == 0
        return (F.when(base.isNotNull(), base)
                .when(overtight, F.lit("overtight_rule"))
                .otherwise(F.lit(None).cast("string")))

    rep = make(spark, log_dir, work, table, validity_rule=strict_rule,
               error_percentage_limit=0.9)
    rep.run()

    # inject a foreign-WAL audit row (null log_offset) into an epoch slice
    q = rep.cfg.quarantine_dir
    a_slice = sorted(glob.glob(os.path.join(q, "slice=0-*")))[0]
    foreign = pa.Table.from_pylist(
        [{"log_offset": None, "epoch": 0, "url": "https://foreign.example/",
          "reason": "bad_html", "raw_payload": b"<garbage>", "bucket": 0}],
        schema=_dirty_schema())
    pq.write_table(foreign, os.path.join(a_slice, "part-foreign.parquet"))

    def n_null_offsets(r):
        return r.quarantine().filter(F.col("log_offset").isNull()).count()

    assert n_null_offsets(rep) == 1

    # fold BEFORE requeue: folded slices are what the requeue semi-joins
    rep.fold_quarantine()
    assert n_null_offsets(rep) == 1

    fixed = make(spark, log_dir, work, table)
    # snapshot one epoch's slices; restoring them after the requeue
    # simulates a crash BETWEEN the merge commit and the slice cleanup
    bak_root = os.path.join(work, "slice_bak")  # outside the slice=* glob
    os.makedirs(bak_root, exist_ok=True)
    pre = {d: os.path.join(bak_root, os.path.basename(d))
           for d in glob.glob(os.path.join(q, "slice=1-*"))}
    for d, bak in pre.items():
        shutil.copytree(d, bak)
    out1 = fixed.requeue_quarantined()
    assert sum(r["events_applied"] for r in out1) > 0
    assert n_null_offsets(fixed) == 1  # foreign row survived cleanup
    for d, bak in pre.items():  # "crash": cleanup of epoch 1 never happened
        shutil.rmtree(d, ignore_errors=True)
        os.rename(bak, d)

    # re-run: idempotent merge re-converges, stale slices cleaned again
    fixed2 = make(spark, log_dir, work, table)
    fixed2.requeue_quarantined()
    assert_state_matches(fixed2, CFG)
    assert n_null_offsets(fixed2) == 1

    # fold AFTER a requeue pass folds rq slices without losing rows
    before = fixed2.quarantine().toPandas()
    fixed2.fold_quarantine()
    after = fixed2.quarantine().toPandas()
    key = lambda u: (u is None, u)  # null_url rows sort stably  # noqa: E731
    assert sorted(before["url"], key=key) == sorted(after["url"], key=key)

    # converged: only intrinsically dirty rows + the foreign row remain
    ev = gen_events_pdf(CFG, np.arange(CFG.n_events))
    n_dirty = int((~validate_pd(ev)).sum())
    assert fixed2.quarantine().count() == n_dirty + 1
    reasons = {r["reason"] for r in
               fixed2.quarantine().select("reason").distinct().collect()}
    assert "overtight_rule" not in reasons

    # metrics reconcile: every requeue generation recorded (negative epoch),
    # original-run totals intact
    m = fixed2.metrics().toPandas()
    assert m[m["checkpoint_epoch"] < 0]["events_read"].sum() > 0
    assert m[m["checkpoint_epoch"] >= 0]["events_read"].sum() == CFG.n_events

    # a third requeue is a no-op on table state and quarantine
    out3 = make(spark, log_dir, work, table).requeue_quarantined()
    assert sum(r["events_applied"] for r in out3) == 0
