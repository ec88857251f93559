"""Fixture generator determinism + extraction byte-identity."""

from __future__ import annotations

import numpy as np
import pandas as pd

from datax_3_0_0_src_spark.cdc.extract import extract_text_pd
from datax_3_0_0_src_spark.cdc.gen import EventGenConfig, gen_events_pdf
from datax_3_0_0_src_spark.cdc.oracle import validate_pd

CFG = EventGenConfig(seed=42, n_events=5_000, events_per_epoch=1_000)


def test_generator_deterministic_and_range_independent():
    full = gen_events_pdf(CFG, np.arange(5_000))
    again = gen_events_pdf(CFG, np.arange(5_000))
    pd.testing.assert_frame_equal(full, again)
    # any worker generating any sub-range must agree with the full run
    part = gen_events_pdf(CFG, np.arange(1_200, 1_300))
    pd.testing.assert_frame_equal(
        part.reset_index(drop=True),
        full.iloc[1_200:1_300].reset_index(drop=True),
    )


def test_generator_distributions():
    ev = gen_events_pdf(CFG, np.arange(5_000))
    ops = ev["op"].value_counts(normalize=True)
    assert 0.65 < ops["I"] < 0.75 and 0.20 < ops["U"] < 0.30 and 0.02 < ops["D"] < 0.08
    dirty_frac = (~validate_pd(ev)).mean()
    assert 0.004 < dirty_frac < 0.02
    # zipf domain skew: top domain must be hot (>5% of urls)
    doms = ev["url"].dropna().str.extract(r"https://(d\d+)\.")[0]
    assert doms.value_counts(normalize=True).iloc[0] > 0.05
    # out-of-order fraction ~2%
    secs = (ev["warc_ts"] - ev["warc_ts"].min()).dt.total_seconds()
    assert 0.005 < (secs != ev["log_offset"]).mean() < 0.05
    # updates/deletes revisit earlier urls: url seen before for most U/D
    ud = ev[ev["op"] != "I"].dropna(subset=["url"])
    first_seen = ev.dropna(subset=["url"]).groupby("url")["log_offset"].min()
    assert (ud["url"].map(first_seen) < ud["log_offset"]).mean() > 0.3


def test_extract_text_pinned():
    html = pd.Series([
        b"<html><head><title>Hello</title></head><body>world <b>bold</b>  x</body></html>",
        b"<html><head><title> T </title></head><body></body></html>",
        None,
    ])
    out = extract_text_pd(html)
    assert out[0] == "Hello\nworld bold x"
    assert out[1] == "T"
    assert out[2] is None


def test_extract_matches_generated_html():
    ev = gen_events_pdf(CFG, np.arange(100))
    live = ev[ev["op"] != "D"]
    texts = extract_text_pd(live["html"])
    # every generated page extracts to "T{url_id}\n<body words>"
    assert texts.str.match(r"T\d+\n\w").all()


def test_schema_evolution_column_presence():
    cfg = EventGenConfig(seed=42, n_events=2_000, events_per_epoch=500, evo_epoch=2)
    ev = gen_events_pdf(cfg, np.arange(2_000))
    assert "fetch_status" in ev.columns
    assert ev.loc[ev["epoch"] < 2, "fetch_status"].isna().all()
    post = ev[(ev["epoch"] >= 2) & (ev["op"] != "D")]
    assert post["fetch_status"].notna().all()
    assert post["fetch_status"].between(200, 204).all()
