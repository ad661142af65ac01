"""Custom stateful streaming operator: per-stream cursor tracking.

The reference keeps a running max cursor per stream during
incremental syncs (drivers/abstract/incremental.go:149-159) and
resumes from it. In Structured Streaming that is a custom stateful
operator: ``applyInPandasWithState`` keyed by stream, state = the
max cursor + row count seen so far, emitted per micro-batch.

This is the harness for any keyed streaming state the engine needs
(dedup watermarks, per-partition offsets); the cursor tracker is the
reference-shaped instance.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CURSOR_STATE_SCHEMA = "max_cursor long, n_rows long"
CURSOR_OUT_SCHEMA = "stream string, max_cursor long, n_rows long"


def _track(key, pdfs, state: GroupState):
    (stream,) = key
    mx, n = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        if len(pdf):
            m = int(pdf["cursor"].max())
            mx = m if mx is None else max(mx, m)
            n += len(pdf)
    state.update((mx, n))
    yield pd.DataFrame({"stream": [stream], "max_cursor": [mx], "n_rows": [n]})


def track_cursor_stream(stream_df: DataFrame, stream_col: str, cursor_col: str) -> DataFrame:
    """Running (max cursor, row count) per stream across micro-batches.

    State survives batches via the streaming state store — restart
    from checkpoint restores it (the reference's state-file resume,
    types/state.go:64-69). Input: any streaming DF; output one row per
    stream per batch with the cumulative cursor."""
    renamed = stream_df.selectExpr(
        f"{stream_col} AS stream", f"CAST({cursor_col} AS LONG) AS cursor"
    )
    return renamed.groupBy("stream").applyInPandasWithState(
        _track,
        outputStructType=CURSOR_OUT_SCHEMA,
        stateStructType=CURSOR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
