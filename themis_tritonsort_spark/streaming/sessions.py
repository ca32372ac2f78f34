"""Streaming sessionization + windowed aggregation.

The reference's click-log job (Q6) is a batch pass over sorted logs;
the streaming-native formulations are:

  windowed_event_counts — tumbling event-time windows with a watermark
      (late data handled by watermark semantics, not a re-sort).
  session_windows — F.session_window gap-based sessions (the textbook
      inactivity rule; note the reference's batch rule is anchor-reset,
      deliberately different — see operators.sessionize).
  anchor_sessions_stream — the reference's EXACT anchor-reset rule as a
      stateful streaming operator via applyInPandasWithState (per-user
      state = current anchor; emits closed sessions as they happen).

All take any streaming DataFrame with (user_col, ts TIMESTAMP, url).
Tested with availableNow over files + memory sink (tests/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts with watermarking: the streaming analog of
    the reference's per-key count-reduce (A2) over time buckets."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key_col,
            "cnt",
        )
    )


def session_windows(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows (F.session_window): dynamic windows
    that close after ``gap`` of inactivity per user."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(F.col(ts_col), gap), F.col(user_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            user_col,
            "n_events",
        )
    )


def anchor_sessions_stream(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    url_col: str = "url",
    threshold: int = 30_000 * 1_000_000,
):
    """The reference's anchor-reset rule (ClickLogSessionSummarizer) as
    a stateful streaming operator.

    State per user: (anchor_ts, anchor_url) or empty.  Each micro-batch
    processes that user's new events in ts order and emits closed
    sessions.  NOTE: correct under in-order delivery per user (the
    batch operator sorts; a stream must rely on source ordering or an
    upstream watermark+sort) — documented limitation, same tradeoff as
    any order-sensitive stateful operator.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = (
        f"{user_col} long, first_ts long, last_ts long, "
        f"first_url string, last_url string"
    )
    state_schema = "anchor_ts long, anchor_url string"

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        if state.exists:
            anchor_ts, anchor_url = state.get
        else:
            anchor_ts, anchor_url = None, None
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            for ts, url in zip(pdf[ts_col], pdf[url_col]):
                ts = int(ts)
                if anchor_ts is None:
                    anchor_ts, anchor_url = ts, url
                if ts - anchor_ts >= threshold:
                    rows.append((user, anchor_ts, ts, anchor_url, url))
                    anchor_ts, anchor_url = None, None
        if anchor_ts is None:
            state.remove()
        else:
            state.update((anchor_ts, anchor_url))
        cols = [user_col, "first_ts", "last_ts", "first_url", "last_url"]
        yield pd.DataFrame(rows, columns=cols)

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_stream(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts_us",
    type_col: str = "event_type",
):
    """Strict-sequence funnel progression (operators.sessionize.
    funnel_steps) as a stateful streaming operator: per-user state is
    (stage, frontier_ts) — stages completed and the earliest
    completion time of the last one — and each advancement emits an
    immutable (user, stage, reached_ts) fact, so append mode composes
    with any downstream per-stage count.

    The greedy earliest-advance rule is what makes two longs of state
    sufficient: the batch fold never revisits earlier events once a
    stage is reached, so the stream needs no event buffer.  Same
    in-order-delivery caveat as ``anchor_sessions_stream`` (each
    micro-batch is sorted; cross-batch stragglers older than the
    frontier cannot retroactively advance — the watermark tradeoff of
    any order-sensitive stateful operator).  Under in-order delivery
    the max emitted stage per user equals the batch operator's result.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    n = len(steps)
    if n == 0:
        raise ValueError("steps must be non-empty")
    out_schema = f"{user_col} long, stage int, reached_ts long"
    state_schema = "stage int, frontier_ts long"

    def fn(key, pdfs, state: GroupState):
        (user,) = key
        stage, frontier = state.get if state.exists else (0, None)
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            for ts, et in zip(pdf[ts_col], pdf[type_col]):
                if stage >= n:
                    break
                ts = int(ts)
                if et == steps[stage] and (frontier is None or ts > frontier):
                    stage += 1
                    frontier = ts
                    rows.append((user, stage, ts))
        state.update((stage, frontier if frontier is not None else -1))
        yield pd.DataFrame(rows, columns=[user_col, "stage", "reached_ts"])

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
