"""Naive single-threaded replay oracle (pandas) — ground truth for tests.

Replays the change log over an empty target exactly as FIXTURES.md §3
specifies: per url keep the max (warc_ts, log_offset) non-dirty event; the row
exists iff that winner is not a delete; ``text`` is extracted from the winner's
html. The engine's distributed replay must converge to this state bit-for-bit.
"""

from __future__ import annotations

import pandas as pd

from .extract import extract_text_pd
from .gen import EventGenConfig, gen_events_pdf
import numpy as np


def validate_pd(events: pd.DataFrame) -> pd.Series:
    """The dirty-event predicate — MUST match cdc.quarantine.VALID_PRED.

    Valid iff url and warc_ts present, and for non-deletes the html payload is
    a well-formed page wrapper (utf-8, closing tags intact).
    """
    url_ok = events["url"].notna()
    ts_ok = events["warc_ts"].notna()
    is_del = events["op"] == "D"

    def html_ok(b) -> bool:
        # pure byte checks — must mirror quarantine.reason_col exactly
        return b is not None and b.startswith(b"<html>") and b.endswith(b"</body></html>")

    payload_ok = is_del | events["html"].map(html_ok)
    return url_ok & ts_ok & payload_ok


def replay_pandas(events: pd.DataFrame) -> pd.DataFrame:
    """Expected final pages state for a full event log (pandas)."""
    ev = events[validate_pd(events)].copy()
    ev = ev.sort_values(["warc_ts", "log_offset"])  # LWW order
    # whole-row winner per url (groupby.last would mix columns across rows:
    # it takes the last NON-NULL per column — wrong for deletes' null payloads)
    winners = ev.drop_duplicates("url", keep="last")
    live = winners[winners["op"] != "D"].copy()
    live["text"] = extract_text_pd(live["html"])
    cols = ["url", "warc_ts", "html", "text", "lang"]
    if "fetch_status" in live.columns:
        cols.append("fetch_status")
    return live[cols].sort_values("url").reset_index(drop=True)


def expected_pages(cfg: EventGenConfig) -> pd.DataFrame:
    """Generate the full log in-memory and replay it (small scales only)."""
    events = gen_events_pdf(cfg, np.arange(cfg.n_events))
    if cfg.evo_epoch is not None:
        # pre-evolution events do not carry fetch_status (matches the log layout)
        pre = events["epoch"] < cfg.evo_epoch
        events.loc[pre, "fetch_status"] = pd.NA
    return replay_pandas(events)
