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
sequential per user, so a window-function formulation cannot express the
reset (the anchor depends on its own output) and the implementation is a
Python-side scan — but a cheap one:

  - the scan itself is O(sessions * log events) per user, not
    O(events): with timestamps sorted, the closing click of the session
    anchored at i is the first index with ``ts >= ts[i] + threshold`` —
    one ``np.searchsorted`` jump per session;
  - the Spark plan is ONE hash shuffle on the user (exactly what a
    groupBy would pay) + ``sortWithinPartitions`` + a single
    ``mapInPandas`` pass — users are processed contiguously inside each
    Arrow batch instead of one applyInPandas call (and one tiny Arrow
    frame) per user, which matters when there are millions of users.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scan_spans(ts: np.ndarray, threshold: int) -> list[tuple[int, int]]:
    """Anchor-reset scan over a sorted timestamp array.

    Returns (anchor_idx, close_idx) per emitted session.  Loop runs once
    per SESSION: the closing click is found with a binary search, and
    the next anchor is the click right after the close.
    """
    if threshold <= 0:
        # ts[i] + threshold <= ts[i] would make searchsorted return
        # j <= i and the scan loop forever on duplicate timestamps; the
        # reference semantics are degenerate here anyway (every click
        # closes a session against itself).
        raise ValueError(f"threshold must be positive, got {threshold}")
    spans: list[tuple[int, int]] = []
    n = len(ts)
    i = 0
    while i < n:
        j = int(np.searchsorted(ts, ts[i] + threshold, side="left"))
        if j >= n:
            break  # trailing clicks never reach the threshold: no emit
        spans.append((i, j))
        i = j + 1
    return spans


def sessionize_pdf(
    pdf: pd.DataFrame, ts_col: str, url_col: str, threshold: int, keys: list[str]
) -> pd.DataFrame:
    """Pure-pandas core of the anchor-reset scan (unit-testable).

    ``pdf`` must already be sorted by ``ts_col`` (within one key group).
    """
    key_vals = {k: pdf[k].iloc[0] for k in keys} if len(pdf) else {}
    ts = pdf[ts_col].to_numpy()
    urls = pdf[url_col].to_numpy()
    out_rows = [
        {
            **key_vals,
            "first_ts": int(ts[a]),
            "last_ts": int(ts[c]),
            "first_url": urls[a],
            "last_url": urls[c],
        }
        for a, c in _scan_spans(ts, threshold)
    ]
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

    ``ts_col`` must be integer-like (epoch micros/seconds).  Output:
    (user, first_ts, last_ts, first_url, last_url).
    """
    if threshold <= 0:
        raise ValueError(f"threshold must be positive, got {threshold}")
    tiebreak = list(order_tiebreak)
    schema = (
        f"{user_col} long, first_ts long, last_ts long, "
        f"first_url string, last_url string"
    )
    out_cols = [user_col, "first_ts", "last_ts", "first_url", "last_url"]

    def scan_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Rows arrive sorted by (user, ts, tiebreak); a user's rows are
        # contiguous but may straddle Arrow batch boundaries, so carry
        # the last (possibly incomplete) user over to the next batch.
        leftover: pd.DataFrame | None = None

        def emit(chunk: pd.DataFrame) -> pd.DataFrame:
            users = chunk[user_col].to_numpy()
            ts = chunk[ts_col].to_numpy()
            urls = chunk[url_col].to_numpy()
            starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
            bounds = np.r_[starts, len(users)]
            rows = []
            for s, e in zip(bounds[:-1], bounds[1:]):
                for a, c in _scan_spans(ts[s:e], threshold):
                    rows.append(
                        (int(users[s]), int(ts[s + a]), int(ts[s + c]),
                         urls[s + a], urls[s + c])
                    )
            return pd.DataFrame(rows, columns=out_cols)

        for pdf in batches:
            if leftover is not None and len(leftover):
                pdf = pd.concat([leftover, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last_user = pdf[user_col].iloc[-1]
            complete = pdf[pdf[user_col] != last_user]
            leftover = pdf[pdf[user_col] == last_user]
            if len(complete):
                yield emit(complete)
        if leftover is not None and len(leftover):
            yield emit(leftover)

    cols = [user_col, ts_col, url_col, *tiebreak]
    return (
        df.select(*dict.fromkeys(cols))  # prune before the shuffle
        .repartition(user_col)
        .sortWithinPartitions(user_col, ts_col, *tiebreak)
        .mapInPandas(scan_partition, schema=schema)
    )


def funnel_steps(
    df,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
):
    """Strict-sequence funnel progression: for each user, how many of
    ``steps`` completed in order, where step i+1 must occur STRICTLY
    after the (earliest-possible) completion of step i.  Returns
    (user, stage) with stage in 0..len(steps).

    Semantics match the cascaded-min SQL form (t1 = min ts of step 1;
    t2 = min ts of step 2 with ts > t1; ...) — the greedy
    earliest-advance scan is optimal because advancing earlier only
    loosens every later constraint, and simultaneous-timestamp ties
    cannot advance two stages regardless of scan order (strict >).

    Plan: ONE shuffle (group by user), then a JVM-side fold
    (``aggregate``) over each user's time-sorted event array — no
    Python, no per-step join cascade (the textbook form pays one
    aggregate + join PER STEP).  Assumes per-user event counts are
    bounded (same assumption as sessionization); for unbounded keys,
    pre-filter to the step event types — done here — so the array
    holds only funnel-relevant events.
    """
    from pyspark.sql import functions as F

    n = len(steps)
    if n == 0:
        raise ValueError("steps must be non-empty")
    steps_sql = ", ".join("'" + s.replace("'", "''") + "'" for s in steps)
    evs = (
        df.where(F.col(type_col).isin(list(steps)))
        .groupBy(user_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("t"))
                )
            ).alias("__evs")
        )
    )
    stage = F.expr(
        f"""aggregate(__evs,
              named_struct('stage', 0, 'last', CAST(NULL AS TIMESTAMP)),
              (acc, e) -> IF(acc.stage < {n}
                             AND e.t = array({steps_sql})[acc.stage]
                             AND (acc.stage = 0 OR e.ts > acc.last),
                             named_struct('stage', acc.stage + 1, 'last', e.ts),
                             acc),
              acc -> acc.stage)"""
    )
    return evs.select(F.col(user_col), stage.cast("long").alias("stage"))
