"""Streaming temporal smoothing — the stateful twin of
operators.temporal.ewma_halving.

The recursion s_i = (x_i + s_{i-1}) / 2 needs exactly ONE double of
state per key (the previous smoothed value), which is what makes it a
natural streaming operator: each micro-batch folds its new events in
time order on top of the carried state and emits one smoothed row per
event.  Because halving is exact binary scaling, the stream output is
bit-identical to the batch operator over the same in-order rows —
pinned by test.

Same in-order-delivery caveat as the other order-sensitive stateful
operators (anchor sessions, funnel): each micro-batch is sorted, but a
cross-batch straggler older than the carried state cannot be
retroactively folded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ewma_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts_us",
    id_col: str = "event_id",
    value_col: str = "value_cents",
):
    """Per-key halving EWMA over a stream: emits (key, id, ts,
    ewma_micro) for every event, maintaining one double of state per
    key via applyInPandasWithState."""
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _round_half_up(v: float) -> int:
        # match Spark's ROUND (HALF_UP, away from zero) — Python's
        # built-in round() is banker's and would differ on exact .5
        # ties, which dyadic EWMA values genuinely produce
        return int(math.copysign(math.floor(abs(v) + 0.5), v))

    out_schema = (
        f"{key_col} long, {id_col} long, {ts_col} long, ewma_micro long"
    )
    state_schema = "s double"

    def fn(key, pdfs, state: GroupState):
        (k,) = key
        s = state.get[0] if state.exists else None
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values([ts_col, id_col], kind="mergesort")
            for ts, eid, x in zip(pdf[ts_col], pdf[id_col], pdf[value_col]):
                x = float(int(x))
                s = x if s is None else (x + s) / 2.0
                rows.append(
                    (k, int(eid), int(ts), _round_half_up(s * 1_000_000.0))
                )
        if s is not None:
            state.update((s,))
        yield pd.DataFrame(
            rows, columns=[key_col, id_col, ts_col, "ewma_micro"]
        )

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
