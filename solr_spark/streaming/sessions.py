"""Custom stateful streaming operator: conversation sessionization.

The reference has NO session windows — its only time bucketing is fixed-gap
range facets (stream/TimeSeriesStream.java:55, SURVEY.md §2.9). This operator
is the Spark-first capability that replaces that gap for transcript analytics:
group a conversation's turns into activity sessions separated by >= `gap`
of inactivity, maintained incrementally over a stream with
`applyInPandasWithState` (timeout-driven state eviction), or computed in batch
with a window-function program (same output contract, used as the oracle).

Output: one row per closed session —
    (conv_id, session_id, start_ts, end_ts, n_turns, n_tokens)
"""

from __future__ import annotations

import datetime as _dt

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_SCHEMA = ("conv_id string, session_id int, start_ts timestamp, "
                  "end_ts timestamp, n_turns long, n_tokens long")
_STATE_SCHEMA = ("session_id int, start_ts timestamp, end_ts timestamp, "
                 "n_turns long, n_tokens long")


def sessionize_batch(df: DataFrame, gap_minutes: float = 30.0) -> DataFrame:
    """Batch sessionization: pure window-function program (no Python).

    A new session starts where the gap from the previous turn's ts exceeds
    `gap_minutes`. session_id is 0-based per conversation in time order.
    """
    w = Window.partitionBy("conv_id").orderBy("ts", "turn_idx")
    gap_s = gap_minutes * 60.0
    tokens = F.size(F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != ""))
    marked = (
        df.withColumn("_prev", F.lag("ts").over(w))
          .withColumn(
              "_new",
              (F.col("_prev").isNull()
               # cast via timestamp: parquet TIMESTAMP_NTZ won't cast straight
               # to double (session tz is UTC, so the detour is lossless)
               | (F.col("ts").cast("timestamp").cast("double")
                  - F.col("_prev").cast("timestamp").cast("double")
                  > gap_s)).cast("int"))
          .withColumn("session_id", F.sum("_new").over(w) - 1)
          .withColumn("_tok", tokens)
    )
    return (
        marked.groupBy("conv_id", "session_id")
        .agg(F.min("ts").alias("start_ts"), F.max("ts").alias("end_ts"),
             F.count(F.lit(1)).alias("n_turns"), F.sum("_tok").alias("n_tokens"))
        .orderBy("conv_id", "session_id")
    )


def _session_state_fn(gap_minutes: float):
    """applyInPandasWithState update function (module-level for picklability)."""
    gap = _dt.timedelta(minutes=gap_minutes)

    def update(key, pdfs, state):
        conv_id = key[0]
        if state.hasTimedOut:
            if state.exists:
                sid, st, en, nt, tok = state.get
                state.remove()
                yield pd.DataFrame(
                    {"conv_id": [conv_id], "session_id": [sid],
                     "start_ts": [st], "end_ts": [en],
                     "n_turns": [nt], "n_tokens": [tok]})
            return
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "turn_idx"])
        out = []
        if state.exists:
            sid, st, en, nt, tok = state.get
        else:
            sid, st, en, nt, tok = -1, None, None, 0, 0
        for r in rows.itertuples(index=False):
            ts = r.ts.to_pydatetime() if hasattr(r.ts, "to_pydatetime") else r.ts
            ntok = len([t for t in (r.text or "").split() if t])
            if en is not None and ts - en <= gap:
                en, nt, tok = max(en, ts), nt + 1, tok + ntok
            else:
                if en is not None:
                    out.append((conv_id, sid, st, en, nt, tok))
                sid, st, en, nt, tok = sid + 1, ts, ts, 1, ntok
        state.update((sid, st, en, nt, tok))
        # the session is provably closed once the watermark passes end + gap
        # (no on-time row can extend it); fire the timeout exactly then
        close_at_ms = int(en.timestamp() * 1000 + gap.total_seconds() * 1000)
        state.setTimeoutTimestamp(
            max(close_at_ms, state.getCurrentWatermarkMs() + 1))
        if out:
            yield pd.DataFrame(out, columns=["conv_id", "session_id", "start_ts",
                                             "end_ts", "n_turns", "n_tokens"])

    return update


def sessionize_stream(stream: DataFrame, gap_minutes: float = 30.0,
                      watermark: str = "10 minutes") -> DataFrame:
    """Streaming sessionization over a transcript readStream.

    Custom stateful operator via applyInPandasWithState: per-conversation
    session accumulators, closed (emitted) when the event-time watermark passes
    the session's end + gap — the standard Spark pattern for operators the
    built-in window functions can't express incrementally.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _session_state_fn(gap_minutes),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
