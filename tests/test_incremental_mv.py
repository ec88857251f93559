"""Incremental materialized-view maintenance (lake/mv.py): a grouped
count/sum aggregate advanced from LakeTable.changes() must equal a full
recompute at every version — across inserts, group-moving updates, deletes,
LWW losers, folds, and chained vs single-hop refresh ranges."""

from __future__ import annotations

from test_dv_fold import seed_mor
from test_lake_table import batch, make_table

from datax_3_0_0_src_spark.lake.mv import full_group_agg, refresh_group_agg


def mv_rows(df):
    return sorted(tuple(r) for r in df.collect())


def assert_mv_equals_full(t, mv, version, **kw):
    assert mv_rows(mv) == mv_rows(
        full_group_agg(t, ["lang"], version=version, **kw))


def test_refresh_matches_full_recompute_stepwise(spark, tmp_path):
    t = seed_mor(spark, str(tmp_path / "t"))
    # bootstrap from the empty v0 — refresh(None, 0->v) IS the full compute
    head = t.snapshot().version
    mv = refresh_group_agg(t, None, 0, 1, group_cols=["lang"])
    assert_mv_equals_full(t, mv, 1)
    assert dict(mv_rows(mv)) == {"de": 1, "en": 2, "fr": 1}
    # v1 -> v2: 'b' (en) deleted, 'a' updated in place, 'e' (en) inserted
    mv = refresh_group_agg(t, mv, 1, 2, group_cols=["lang"])
    assert_mv_equals_full(t, mv, 2)
    # v2 -> head: out-of-order losers must NOT move the aggregate
    mv = refresh_group_agg(t, mv, 2, head, group_cols=["lang"])
    assert_mv_equals_full(t, mv, head)
    assert dict(mv_rows(mv)) == {"de": 1, "en": 2, "fr": 1}


def test_single_hop_equals_chained_and_is_idempotent(spark, tmp_path):
    t = seed_mor(spark, str(tmp_path / "t"))
    head = t.snapshot().version
    one_hop = refresh_group_agg(t, None, 0, head, group_cols=["lang"])
    chained = refresh_group_agg(
        t, refresh_group_agg(t, None, 0, 2, group_cols=["lang"]),
        2, head, group_cols=["lang"])
    assert mv_rows(one_hop) == mv_rows(chained)
    # idempotent: an empty range is a no-op
    again = refresh_group_agg(t, one_hop, head, head, group_cols=["lang"])
    assert mv_rows(again) == mv_rows(one_hop)


def test_group_move_decrements_old_group(spark, tmp_path):
    t = seed_mor(spark, str(tmp_path / "t"))
    head = t.snapshot().version
    mv = refresh_group_agg(t, None, 0, head, group_cols=["lang"])
    # move 'c' de -> en: the feed carries only the post-image; the refresh
    # must still decrement de (pre-image via the since-version snapshot)
    t.merge(batch(spark, [
        ("c", "2024-02-01T00:00:00", "<c>", "C2", "en", 90, "U"),
    ]), mode="mor")
    mv = refresh_group_agg(t, mv, head, group_cols=["lang"])
    assert_mv_equals_full(t, mv, t.snapshot().version)
    got = dict(mv_rows(mv))
    assert "de" not in got and got["en"] == 3  # zero-count group dropped


def test_refresh_across_folds_and_with_measure(spark, tmp_path):
    t = seed_mor(spark, str(tmp_path / "t"))
    head = t.snapshot().version
    mv = refresh_group_agg(t, None, 0, head, group_cols=["lang"])
    t.compact(strategy="dv")
    t.compact(target_files_per_bucket=1, strategy="local")
    t.merge(batch(spark, [
        ("z", "2024-03-01T00:00:00", "<z>", "Z0", "fr", 95, "I"),
        ("d", "2024-03-01T00:00:01", None, None, None, 96, "D"),
    ]), mode="mor")
    new_head = t.snapshot().version
    mv = refresh_group_agg(t, mv, head, new_head, group_cols=["lang"])
    assert_mv_equals_full(t, mv, new_head)


def test_sum_measure_over_evolved_numeric_column(spark, tmp_path):
    """sum(measure) MV where the measure column arrived via additive schema
    evolution — pre-evolution rows contribute NULL (ignored by sum), and the
    bootstrap full compute must run at a version where the column exists."""
    from pyspark.sql import functions as F

    m = make_table(spark, str(tmp_path / "m"), nb=2)
    m.merge(batch(spark, [
        ("u1", "2024-01-01T00:00:00", "<a>", "AAAA", "en", 0, "I"),
        ("u2", "2024-01-01T00:00:01", "<b>", "BB", "de", 1, "I"),
    ]), mode="mor")
    m.merge(batch(spark, [
        ("u3", "2024-01-01T00:01:00", "<c>", "CC", "en", 2, "I"),
    ]).withColumn("fetch_ms", F.lit(100)), mode="mor")
    v2 = m.snapshot().version
    mv = refresh_group_agg(m, None, 0, v2, group_cols=["lang"],
                           measure="fetch_ms")
    assert_mv_equals_full(m, mv, v2, measure="fetch_ms")
    # en: u1 (null) + u3 (100); de: u2 (null) -> sum NULL survives as None
    got = {r["lang"]: (r["n_rows"], r["sum_fetch_ms"]) for r in mv.collect()}
    assert got["en"] == (2, 100.0) and got["de"][0] == 1
    # update u3's fetch_ms; the refresh must move the sum, not the count
    m.merge(batch(spark, [
        ("u3", "2024-01-01T00:02:00", "<c>", "CC", "en", 3, "U"),
    ]).withColumn("fetch_ms", F.lit(250)), mode="mor")
    mv = refresh_group_agg(m, mv, v2, group_cols=["lang"], measure="fetch_ms")
    assert_mv_equals_full(m, mv, m.snapshot().version, measure="fetch_ms")
    got = {r["lang"]: (r["n_rows"], r["sum_fetch_ms"]) for r in mv.collect()}
    assert got["en"] == (2, 250.0)


def test_materialized_chain_keeps_bounded_plan(spark, tmp_path):
    """Round-6 verdict item 5: a LONG refresh chain with materialize=True
    must keep a constant-size plan (the previous MV becomes an in-memory
    scan each hop) and still equal the full recompute. Without it, hop N's
    plan embeds hops 1..N-1 — the iterative-plan-growth bug class
    connected_components solves with per-round checkpoints."""
    t = make_table(spark, str(tmp_path / "t"), nb=2)
    n = 100
    for i in range(n):
        t.merge(batch(spark, [
            (f"u{i}", f"2024-01-01T00:{i // 60:02d}:{i % 60:02d}",
             "<x>", f"T{i}", ["en", "de", "fr"][i % 3], i,
             "D" if i % 10 == 9 else "I"),
        ]), mode="mor")
    head = t.snapshot().version
    assert head >= n
    mv = None
    plan_sizes = []
    for v in range(0, head):
        mv = refresh_group_agg(t, mv, v, v + 1, group_cols=["lang"],
                               materialize=True)
        if v + 1 in (10, head):
            plan = mv._jdf.queryExecution().executedPlan().toString()
            final = plan.split("== Initial Plan ==")[0]
            plan_sizes.append((v + 1, len(final),
                               final.count("FileScan parquet")))
    assert_mv_equals_full(t, mv, head)
    # bounded plan: hop-100's plan is the same small shape as hop-10's —
    # a handful of file scans (feed + since/until bucket reads), never a
    # 100-deep chain (mirrors test_changes_single_scan_over_many_commits)
    for hop, size, nscans in plan_sizes:
        assert nscans <= 4, (hop, nscans)
    (h10, s10, _), (h100, s100, _) = plan_sizes
    assert s100 <= 2 * s10, (s10, s100)
