"""Streaming windowed agg (watermark) + applyInPandasWithState sessionizer
vs their batch twins on the shared events fixture."""

from __future__ import annotations

import pandas as pd

from datax_3_0_0_src_spark.queries import events_minutely, events_sessionize
from datax_3_0_0_src_spark.streaming.windows import (
    minutely_counts_stream, sessionize_stream,
)

SF = "/root/testdata/sf0.001"


def _events_dir(tmp_path) -> str:
    # FileStreamSource needs a DIRECTORY; the fixture is a single parquet file
    import os

    d = tmp_path / "events_stream"
    d.mkdir(exist_ok=True)
    os.symlink(f"{SF}/events.parquet", d / "part-0.parquet")
    return str(d)


def _run_stream(df, spark, name, tmp_path, mode):
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name).toPandas()


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)]
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_stream_minutely_matches_batch(spark, tmp_path):
    got = _run_stream(
        minutely_counts_stream(spark, _events_dir(tmp_path)), spark, "m_stream", tmp_path, "append"
    )
    exp = events_minutely(spark, SF).toPandas()
    got["minute"] = got["minute"].astype("datetime64[us]")
    exp["minute"] = exp["minute"].astype("datetime64[us]")
    got_n, exp_n = _norm(got), _norm(exp)
    # append mode only emits windows the watermark has closed: every emitted
    # row must match the batch result exactly...
    merged = got_n.merge(exp_n, how="left", indicator=True)
    assert (merged["_merge"] == "both").all(), "stream emitted a row batch disagrees with"
    # ...and every window strictly older than the watermark horizon must have
    # been emitted (nothing lost, only the unclosed tail withheld)
    cutoff = exp["minute"].max() - pd.Timedelta(minutes=11)
    exp_closed = exp_n[exp_n["minute"] <= cutoff]
    assert len(got_n) >= len(exp_closed) > 0


def test_stream_sessionize_matches_batch(spark, tmp_path):
    got = _run_stream(
        sessionize_stream(spark, _events_dir(tmp_path)), spark, "s_stream", tmp_path, "update"
    )
    # update mode re-emits a session when later batches extend it: keep the
    # final emission per (user, session)
    got = (
        got.sort_values(["user_id", "session_id", "n_events"])
        .groupby(["user_id", "session_id"], as_index=False).last()
    )
    exp = events_sessionize(spark, SF).toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)


def test_stream_sessionize_multi_batch_state_carries(spark, tmp_path):
    # force multiple micro-batches: state must stitch sessions across them
    got = _run_stream(
        sessionize_stream(spark, _events_dir(tmp_path), max_files_per_trigger=1),
        spark, "s_stream_mb", tmp_path, "update",
    )
    got = (
        got.sort_values(["user_id", "session_id", "n_events"])
        .groupby(["user_id", "session_id"], as_index=False).last()
    )
    exp = events_sessionize(spark, SF).toPandas()
    pd.testing.assert_frame_equal(_norm(got), _norm(exp), check_dtype=False)
