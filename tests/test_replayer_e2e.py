"""End-to-end CDC replay vs the pandas oracle: clean run, resume, rate caps,
salting, quarantine, error limits, schema evolution (FIXTURES.md §3)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from datax_3_0_0_src_spark.cdc.gen import EventGenConfig, write_event_log
from datax_3_0_0_src_spark.cdc.oracle import expected_pages, validate_pd, gen_events_pdf
from datax_3_0_0_src_spark.cdc.quarantine import ErrorLimitExceeded
from datax_3_0_0_src_spark.cdc.replayer import THROUGHPUT_PROFILE, ReplayConfig, Replayer

CFG = EventGenConfig(seed=42, n_events=3_000, events_per_epoch=1_000)


def engine_state(rep: Replayer) -> pd.DataFrame:
    pdf = rep.table.read().toPandas().sort_values("url").reset_index(drop=True)
    pdf["html"] = pdf["html"].map(lambda b: bytes(b) if b is not None else None)
    pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
    return pdf


def assert_state_matches(rep: Replayer, gcfg: EventGenConfig):
    got = engine_state(rep)
    exp = expected_pages(gcfg)
    exp["warc_ts"] = exp["warc_ts"].astype("datetime64[us]")
    assert len(got) == len(exp), f"row count {len(got)} != {len(exp)}"
    assert list(got["url"]) == list(exp["url"])
    assert (got["warc_ts"].to_numpy() == exp["warc_ts"].to_numpy()).all()
    # the byte-identical invariant: extracted text per url
    assert list(got["text"]) == list(exp["text"])
    assert list(got["lang"]) == list(exp["lang"])
    assert list(got["html"]) == list(exp["html"])
    if "fetch_status" in exp.columns:
        assert "fetch_status" in got.columns
        g = got["fetch_status"].astype("Int32").fillna(-1)
        e = exp["fetch_status"].astype("Int32").fillna(-1)
        assert list(g) == list(e)


@pytest.fixture()
def log_and_work(spark, tmp_path):
    log_dir = str(tmp_path / "wal")
    write_event_log(spark, CFG, log_dir, slices=4)
    return log_dir, str(tmp_path / "work"), str(tmp_path / "pages")


def make_replayer(spark, log_dir, work, table, **kw) -> Replayer:
    # CDC_PROFILE=throughput soaks the ENTIRE e2e suite under the bench's
    # high-throughput profile (pipelined MOR, observe-lineage, deferred
    # dedup); explicit per-test kwargs always win over the profile defaults
    if os.environ.get("CDC_PROFILE") == "throughput":
        kw = {**THROUGHPUT_PROFILE, **kw}
    return Replayer(spark, ReplayConfig(
        log_dir=log_dir, table_path=table, work_dir=work, num_buckets=8, **kw))


def test_clean_replay_matches_oracle(spark, log_and_work):
    log_dir, work, table = log_and_work
    rep = make_replayer(spark, log_dir, work, table)
    results = rep.run()
    assert [r.epoch for r in results] == [0, 1, 2]
    assert_state_matches(rep, CFG)

    # quarantine holds exactly the oracle's dirty events
    ev = gen_events_pdf(CFG, np.arange(CFG.n_events))
    n_dirty = int((~validate_pd(ev)).sum())
    assert rep.quarantine().count() == n_dirty
    assert sum(r.events_quarantined for r in results) == n_dirty

    # lineage: per-(partition, epoch) metrics sum to totals
    m = rep.metrics().toPandas()
    assert m["events_read"].sum() == CFG.n_events
    assert m["events_quarantined"].sum() == n_dirty
    assert set(m.columns) >= {
        "partition_id", "checkpoint_epoch", "events_read", "events_applied",
        "events_deduped", "events_quarantined", "bytes_in", "merge_duration_ms",
    }


def test_resume_from_checkpoint_and_idempotent_rerun(spark, log_and_work):
    log_dir, work, table = log_and_work
    rep1 = make_replayer(spark, log_dir, work, table)
    first = rep1.run(stop_after_batches=1)  # "kill" after epoch 0
    assert len(first) == 1
    v_after_kill = rep1.table.snapshot().version

    # restart from checkpoints: must process only epochs 1..2
    rep2 = make_replayer(spark, log_dir, work, table)
    rest = rep2.run()
    assert [r.epoch for r in rest] == [1, 2]
    assert_state_matches(rep2, CFG)
    final_version = rep2.table.snapshot().version
    assert final_version > v_after_kill

    # re-running a fully committed log is a no-op (no new snapshot)
    rep3 = make_replayer(spark, log_dir, work, table)
    assert rep3.run() == []
    assert rep3.table.snapshot().version == final_version


def test_rate_capped_microbatches_same_state(spark, log_and_work):
    log_dir, work, table = log_and_work
    rep = make_replayer(spark, log_dir, work, table, max_events_per_batch=400)
    results = rep.run()
    # 1000-event epochs with cap 400 => 3 sub-batches per epoch (channel speed cap)
    assert len(results) == 9
    assert max(r.events_read for r in results) <= 400
    assert_state_matches(rep, CFG)


def test_salted_dedup_same_state(spark, log_and_work):
    log_dir, work, table = log_and_work
    rep = make_replayer(spark, log_dir, work, table, salt_partitions=4)
    rep.run()
    assert_state_matches(rep, CFG)


def test_error_limit_aborts(spark, log_and_work):
    log_dir, work, table = log_and_work
    rep = make_replayer(spark, log_dir, work, table,
                        error_percentage_limit=0.0001)
    with pytest.raises(ErrorLimitExceeded):
        rep.run()


def test_schema_evolution_mid_log(spark, tmp_path):
    gcfg = EventGenConfig(seed=42, n_events=3_000, events_per_epoch=1_000, evo_epoch=2)
    log_dir = str(tmp_path / "wal")
    write_event_log(spark, gcfg, log_dir, slices=4)
    rep = make_replayer(spark, log_dir, str(tmp_path / "work"), str(tmp_path / "pages"))
    rep.run()
    # fetch_status appears additively; pre-evolution winners null-backfilled
    got = engine_state(rep)
    assert "fetch_status" in got.columns
    assert got["fetch_status"].isna().any() and got["fetch_status"].notna().any()
    assert_state_matches(rep, gcfg)


def test_mor_nodedup_fast_path_same_state(spark, log_and_work):
    """dedup_per_batch=False: all valid events land as delta rows; the LWW
    (ts, offset) rule applied at read/compact resolution must converge to the
    byte-identical oracle state."""
    log_dir, work, table = log_and_work
    rep = make_replayer(spark, log_dir, work, table, dedup_per_batch=False)
    rep.run()
    assert_state_matches(rep, CFG)
    # folding the deltas preserves the state too
    rep.table.compact(target_files_per_bucket=1)
    assert rep.table.snapshot().deltas == {}
    assert_state_matches(rep, CFG)


def test_nodedup_requires_mor(spark, tmp_path):
    import pytest as _pytest
    with _pytest.raises(ValueError, match="mor"):
        make_replayer(spark, str(tmp_path / "w"), str(tmp_path / "wk"),
                      str(tmp_path / "t"), dedup_per_batch=False, merge_mode="cow")


def test_concurrent_batches_same_state(spark, log_and_work):
    """Pipelined micro-batches (MOR delta layering is commit-order-free):
    concurrent apply + optimistic manifest CAS must converge to the
    byte-identical oracle state and stay exactly-once on re-run."""
    log_dir, work, table = log_and_work
    rep = make_replayer(spark, log_dir, work, table,
                        max_events_per_batch=400, max_concurrent_batches=3)
    results = rep.run()
    assert len(results) == 9
    assert_state_matches(rep, CFG)
    rep2 = make_replayer(spark, log_dir, work, table,
                         max_events_per_batch=400, max_concurrent_batches=3)
    assert rep2.run() == []  # all (epoch, sub) pairs committed
    assert_state_matches(rep2, CFG)


def test_overlapped_fold_same_state_and_fully_folded(spark, log_and_work):
    """compact_overlap: background folds race the still-running batches (the
    CAS commit preserves deltas layered after each fold's read), and the
    post-run tail fold leaves the table byte-identical to the oracle AND
    fully folded — zero deltas, <= compact_target_files files per bucket."""
    log_dir, work, table = log_and_work
    rep = make_replayer(spark, log_dir, work, table,
                        merge_mode="mor", dedup_per_batch=False,
                        single_pass=True, lineage_level="global",
                        max_events_per_batch=400, max_concurrent_batches=3,
                        compact_every=2, compact_overlap=True,
                        compact_strategy="local", compact_concurrency=2)
    results = rep.run()
    assert len(results) == 9
    assert_state_matches(rep, CFG)
    snap = rep.table.snapshot()
    assert all(not v for v in snap.deltas.values())
    assert all(len(fs) <= rep.cfg.compact_target_files
               for fs in snap.files.values())
    # at least one fold commit landed on top of the 9 merge commits (how
    # many mid-run folds fire is timing-dependent; the tail fold no-ops
    # when an overlapped fold already read the final delta set)
    assert snap.version >= len(results) + 1
    # exactly-once on re-run, state unchanged
    rep2 = make_replayer(spark, log_dir, work, table,
                         merge_mode="mor", dedup_per_batch=False,
                         single_pass=True, lineage_level="global",
                         max_events_per_batch=400, max_concurrent_batches=3,
                         compact_every=2, compact_overlap=True,
                         compact_strategy="local")
    assert rep2.run() == []
    assert_state_matches(rep2, CFG)


def test_overlapped_dv_fold_same_state(spark, log_and_work):
    """compact_strategy='dv' through the replayer: overlapped DV minor folds
    + the tail fold leave ZERO deltas (all promoted), delete vectors
    attached, and the read byte-identical to the oracle."""
    log_dir, work, table = log_and_work
    rep = make_replayer(spark, log_dir, work, table,
                        merge_mode="mor", dedup_per_batch=False,
                        single_pass=True, lineage_level="global",
                        max_events_per_batch=400, max_concurrent_batches=3,
                        compact_every=2, compact_overlap=True,
                        compact_strategy="dv")
    results = rep.run()
    assert len(results) == 9
    assert_state_matches(rep, CFG)
    snap = rep.table.snapshot()
    assert all(not v for v in snap.deltas.values())
    assert snap.all_dvs()  # the WAL carries updates/deletes -> losers exist
    # a maintenance rewrite afterwards converges to the same state
    rep.table.compact(target_files_per_bucket=2, strategy="local")
    assert not rep.table.snapshot().all_dvs()
    assert_state_matches(rep, CFG)


def test_overlap_requires_compact_every(spark, tmp_path):
    import pytest as _pytest
    with _pytest.raises(ValueError, match="compact_every"):
        make_replayer(spark, str(tmp_path / "w"), str(tmp_path / "wk"),
                      str(tmp_path / "t"), merge_mode="mor",
                      compact_overlap=True, compact_every=None)


def test_concurrent_requires_mor(spark, tmp_path):
    import pytest as _pytest
    with _pytest.raises(ValueError, match="mor"):
        make_replayer(spark, str(tmp_path / "w"), str(tmp_path / "wk"),
                      str(tmp_path / "t"), max_concurrent_batches=2,
                      merge_mode="cow")


def test_rate_cap_with_offset_gaps_no_events_lost(spark, tmp_path):
    """ADVICE fix: sub-batch slicing must be gap-proof. A WAL whose offsets
    have holes (every 3rd offset missing, plus a big jump) still applies every
    event exactly once under a rate cap."""
    import pyspark.sql.functions as F

    from datax_3_0_0_src_spark.cdc.gen import gen_events_df

    # dense events, then thin them out and warp offsets to create gaps
    dense = gen_events_df(spark, CFG, slices=4)
    gappy = (
        dense.filter(F.col("log_offset") % 3 != 0)
        .withColumn("log_offset",
                    F.when(F.col("log_offset") > 2000,
                           F.col("log_offset") + 100_000)
                    .otherwise(F.col("log_offset") * 7))
        .withColumn("epoch", (F.col("log_offset") % 2).cast("int"))
    )
    log_dir = str(tmp_path / "wal")
    gappy.write.partitionBy("epoch").parquet(log_dir)
    n_events = gappy.count()

    rep = make_replayer(spark, log_dir, str(tmp_path / "work"),
                        str(tmp_path / "pages"), max_events_per_batch=300)
    results = rep.run()
    assert sum(r.events_read for r in results) == n_events  # nothing dropped
    # cap honored to within the quantile sketch's rank error (the boundary
    # planner is approxQuantile-based — no global sort; the cap is a flow
    # control, slice COMPLETENESS is the hard invariant)
    assert max(r.events_read for r in results) <= 300 + max(2, 300 // 50)
    # exactly-once on re-run
    rep2 = make_replayer(spark, log_dir, str(tmp_path / "work"),
                         str(tmp_path / "pages"), max_events_per_batch=300)
    assert rep2.run() == []


def test_throughput_profile_clean_resume_evolution_fold(spark, tmp_path):
    """The bench-default THROUGHPUT_PROFILE (pipelined MOR + observe-lineage +
    deferred dedup + parallel fold) soaked end-to-end: clean replay matches
    the byte-identical oracle, resume stays exactly-once, mid-log schema
    evolution null-backfills, and the parallel compaction fold preserves it
    all."""
    gcfg = EventGenConfig(seed=42, n_events=3_000, events_per_epoch=1_000, evo_epoch=2)
    log_dir = str(tmp_path / "wal")
    write_event_log(spark, gcfg, log_dir, slices=4)
    work, table = str(tmp_path / "work"), str(tmp_path / "pages")

    rep1 = Replayer(spark, ReplayConfig(
        log_dir=log_dir, table_path=table, work_dir=work, num_buckets=8,
        **THROUGHPUT_PROFILE))
    first = rep1.run(stop_after_batches=1)  # "kill" mid-run
    assert len(first) == 1

    rep2 = Replayer(spark, ReplayConfig(
        log_dir=log_dir, table_path=table, work_dir=work, num_buckets=8,
        **THROUGHPUT_PROFILE))
    rest = rep2.run()
    assert sorted(r.epoch for r in rest) == [1, 2]
    assert_state_matches(rep2, gcfg)

    # parallel fold under the profile's compact_concurrency
    rep2.table.compact(
        target_files_per_bucket=1,
        concurrency=THROUGHPUT_PROFILE["compact_concurrency"])
    assert rep2.table.snapshot().deltas == {}
    assert_state_matches(rep2, gcfg)

    # exactly-once: full re-run is a no-op
    rep3 = Replayer(spark, ReplayConfig(
        log_dir=log_dir, table_path=table, work_dir=work, num_buckets=8,
        **THROUGHPUT_PROFILE))
    assert rep3.run() == []
    assert_state_matches(rep3, gcfg)


def test_slice_file_pruning_parity_and_prunes(spark, tmp_path):
    """Round-7 slice-wide scans: a rate-capped replay whose batches read
    file-pruned slice DataFrames (_slice_df) must produce state identical to
    the whole-epoch path, and the pruned scan must actually select a strict
    subset of the epoch's files (plan-time footer stats drive it)."""
    import shutil

    from datax_3_0_0_src_spark.cdc.replayer import THROUGHPUT_PROFILE

    cfg = EventGenConfig(seed=7, n_events=8_000, events_per_epoch=4_000)
    log_dir = str(tmp_path / "wal")
    write_event_log(spark, cfg, log_dir, slices=8)

    def run(cap, sub):
        base = str(tmp_path / sub)
        shutil.rmtree(base, ignore_errors=True)
        rep = Replayer(spark, ReplayConfig(
            log_dir=log_dir, table_path=base + "/pages",
            work_dir=base + "/work", num_buckets=8,
            **dict(THROUGHPUT_PROFILE, max_events_per_batch=cap)))
        rep.run()
        return rep

    sliced = run(1_000, "sliced")      # 8 slices across 2 epochs -> pruning
    whole = run(None, "whole")         # no cap -> whole-epoch DFs, no pruning

    # byte-identical final state
    a = sliced.table.read().toPandas().sort_values("url").reset_index(drop=True)
    b = whole.table.read().toPandas().sort_values("url").reset_index(drop=True)
    assert list(a["url"]) == list(b["url"])
    assert list(a["text"]) == list(b["text"])

    # the footer stats were harvested and a mid-epoch slice really prunes:
    # epoch 0 holds offsets [0, 4000) over 4 files (8 range slices split
    # across 2 epochs), so a 1000-offset slice must read < all files
    fstats = sliced._epoch_file_stats.get(0)
    assert fstats, "plan-time footer stats missing"
    df = sliced._slice_df(0, 1_000, 2_000)
    assert df is not None
    n_files = len(df.inputFiles())
    assert 0 < n_files < len(fstats), (n_files, len(fstats))
