"""Sessionization with the reference's exact anchor-reset rule.

Reference (``functions/reduce/ClickLogSessionSummarizerReduceFunction.cc:10-65``):
scanning a user's clicks in time order with an *anchor* (first click of
the current session):

  - if no anchor, the current click becomes the anchor;
  - if ``ts - anchor_ts >= threshold``, emit a session record
    ``(anchor_ts, ts, anchor_url, url)`` — the closing click IS the
    session's last click — then reset the anchor to null (the *next*
    click starts the next session).

This is NOT the textbook inactivity-gap rule: the emission test is
against the session's FIRST click, and trailing clicks that never reach
the threshold emit nothing.  The anchor state makes the scan genuinely
sequential per user, so the Spark-first implementation is a grouped
Arrow UDF (``applyInPandas``) partitioned by user — the same shuffle a
groupBy would do, with per-group work linear and vectorized per batch.
A window-function formulation cannot express the reset (the anchor
depends on its own output), hence the UDF is justified here.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_pdf(
    pdf: pd.DataFrame, ts_col: str, url_col: str, threshold: int, keys: list[str]
) -> pd.DataFrame:
    """Pure-pandas core of the anchor-reset scan (unit-testable)."""
    out_rows = []
    key_vals = {k: pdf[k].iloc[0] for k in keys} if len(pdf) else {}
    ts = pdf[ts_col].to_numpy()
    urls = pdf[url_col].to_numpy()
    anchor = -1  # index of anchor click, -1 = none
    for i in range(len(pdf)):
        if anchor < 0:
            anchor = i
        if ts[i] - ts[anchor] >= threshold:
            out_rows.append(
                {
                    **key_vals,
                    "first_ts": int(ts[anchor]),
                    "last_ts": int(ts[i]),
                    "first_url": urls[anchor],
                    "last_url": urls[i],
                }
            )
            anchor = -1
    cols = [*keys, "first_ts", "last_ts", "first_url", "last_url"]
    return pd.DataFrame(out_rows, columns=cols)


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    url_col: str,
    threshold: int,
    order_tiebreak: Iterable[str] = (),
) -> DataFrame:
    """Anchor-reset sessionization (reference Q6).

    ``ts_col`` must be integer-like (epoch seconds).  Output:
    (user, first_ts, last_ts, first_url, last_url).
    """
    tiebreak = list(order_tiebreak)
    sort_cols = [ts_col, *tiebreak]

    schema = (
        f"{user_col} long, first_ts long, last_ts long, "
        f"first_url string, last_url string"
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(sort_cols, kind="mergesort")
        return sessionize_pdf(pdf, ts_col, url_col, threshold, [user_col])

    cols = [user_col, ts_col, url_col, *tiebreak]
    return (
        df.select(*dict.fromkeys(cols))  # prune before the shuffle
        .groupBy(user_col)
        .applyInPandas(fn, schema=schema)
    )
