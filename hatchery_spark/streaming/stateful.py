"""Custom stateful streaming operator: per-conversation session tracking.

The reference carries crawl state in-process across pages (cursor chain,
/root/reference/source/slack/slack.go:67-76) and acks work after completion
(/root/reference/source/falcon_data_replicator/client.go:217-224). The
streaming-native generalization is keyed state managed by the engine:
`applyInPandasWithState` keeps one state blob per conv_id in the state store
(checkpointed, recoverable), updated per micro-batch — the pattern for any
"running conversation summary" at 10^12-turn scale, where the state store
shards by key across executors.

Emits, per conv_id seen in a batch, the RUNNING totals: turn count, ts bounds,
error-turn count. Output mode: update.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("n_turns", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("n_error_turns", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_turns", T.LongType()),
        T.StructField("first_ts", T.LongType()),   # epoch micros (state stores prefer primitives)
        T.StructField("last_ts", T.LongType()),
        T.StructField("n_error_turns", T.LongType()),
    ]
)


def _track(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        n, first_us, last_us, errs = state.get
    else:
        n, first_us, last_us, errs = 0, None, None, 0
    for b in batches:
        if len(b) == 0:
            continue
        n += len(b)
        ts_us = b["ts"].astype("int64")  # pandas datetime64 → epoch ns? (int64 is ns)
        b_first = int(ts_us.min()) // 1000
        b_last = int(ts_us.max()) // 1000
        first_us = b_first if first_us is None else min(first_us, b_first)
        last_us = b_last if last_us is None else max(last_us, b_last)
        errs += int(b["severity"].isin(["error", "critical"]).sum())
    state.update((n, first_us, last_us, errs))
    yield pd.DataFrame(
        {
            "conv_id": [conv_id],
            "n_turns": [n],
            "first_ts": [pd.Timestamp(first_us * 1000)],
            "last_ts": [pd.Timestamp(last_us * 1000)],
            "n_error_turns": [errs],
        }
    )


def conversation_sessionizer(parsed_stream: DataFrame) -> DataFrame:
    """Running per-conversation summaries over a parsed transcript stream.

    Input needs columns: conv_id, ts, severity. State is engine-managed and
    checkpointed; on restart summaries continue from the stored totals.
    """
    return (
        parsed_stream.select("conv_id", "ts", "severity")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
