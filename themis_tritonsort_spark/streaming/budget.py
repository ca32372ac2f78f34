"""Streaming admission control for training-data ingest (the streaming
face of operators/sampling.py: token_budget_sample): admit documents
per group (source/domain) until a hard token budget is consumed, then
go dark for that group.

State per group is two longs (tokens consumed, docs admitted) — the
filter itself is history, so state never grows with the stream; keyed
state hash-partitions across executors like any groupBy.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_budget_stream(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    budget_tokens: int,
) -> DataFrame:
    """Admit each group's documents in arrival order while the tokens
    consumed SO FAR are under ``budget_tokens`` (the admitted doc may
    overflow the budget; nothing after it is admitted — the same
    last-doc rule as the batch operator).  Within a micro-batch, rows
    are processed in ascending id order so replays are deterministic.

    Returns admitted rows only: (group, id, n_tokens, cum_tokens).
    Unlike the batch operator there is no hash re-ordering — a stream
    has an arrival order and the budget is first-come-first-served;
    re-balancing an already-collected corpus is the batch operator's
    job.
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    from pyspark.sql.streaming.state import GroupStateTimeout

    staged = docs.select(
        F.col(group_col).alias("group"),
        F.col(id_col).alias("__id"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit("[^ ]+"), 0)
        ).cast("long").alias("__n"),
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
        consumed, admitted = state.get if state.exists else (0, 0)
        ids, ns, cums = [], [], []
        for pdf in pdfs:
            for _, row in pdf.sort_values("__id").iterrows():
                if consumed >= budget_tokens:
                    break
                consumed += int(row["__n"])
                admitted += 1
                ids.append(int(row["__id"]))
                ns.append(int(row["__n"]))
                cums.append(consumed)
        state.update((consumed, admitted))
        yield pd.DataFrame(
            {
                "group": [key[0]] * len(ids),
                "id": ids,
                "n_tokens": ns,
                "cum_tokens": cums,
            }
        )

    return staged.groupBy("group").applyInPandasWithState(
        fn,
        outputStructType="group string, id long, n_tokens long, cum_tokens long",
        stateStructType="consumed long, admitted long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
