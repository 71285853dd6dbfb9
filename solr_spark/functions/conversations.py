"""Conversation-level curation for agent-transcript corpora.

The input table (BASELINE.json input_hint) is multi-turn conversation / agent
transcripts: (conv_id, turn_idx, role, text, tool, ts). A training pipeline
over such data filters at the CONVERSATION grain before anything else touches
the turns: degenerate conversations (an agent stuck re-issuing the same tool
call, a user-only fragment, a one-turn stub) are dropped whole. These ops are
that grain. The reference engine has no analog — Solr sees documents, not
dialogues — so the semantics here come from the brief's training-pipeline
axis, not a reference file.

Scale shape: everything is one hash shuffle on conv_id (window partitionBy /
groupBy); per-conversation row counts are bounded (thousands of turns at
worst), so no per-key memory risk, and hot conversations do not exist by
construction (conv_id is near-unique-ish by design of the identity).

Run-length machinery: the classic gaps-and-islands construction — a `lag`
change indicator, a running sum over it (the island id), then a count per
island — three stacked windows over ONE partitioning, which Spark executes
with a single exchange.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _sig(sig_cols: Sequence[Column | str]) -> Column:
    cols = [F.col(c) if isinstance(c, str) else c for c in sig_cols]
    return F.md5(F.concat_ws("\x1f", *[F.coalesce(c.cast("string"),
                                                  F.lit("\x00")) for c in cols]))


def turn_runs(df: DataFrame, conv_col: str, order_by: Sequence[Column | str],
              sig_cols: Sequence[Column | str],
              out_col: str = "run_len") -> DataFrame:
    """Annotate each turn with the length of the maximal run of consecutive
    turns sharing the same signature (e.g. same (role, tool) or same text).

    Gaps-and-islands over one conv_id exchange; `order_by` must totally order
    turns within a conversation (turn_idx, or (ts, id) for event streams).
    """
    order = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(conv_col).orderBy(*order)
    sig = _sig(sig_cols)
    changed = F.when(F.lag(sig).over(w).isNull() |
                     (F.lag(sig).over(w) != sig), 1).otherwise(0)
    with_island = df.withColumn("__island",
                                F.sum(changed).over(
                                    w.rowsBetween(Window.unboundedPreceding, 0)))
    wi = Window.partitionBy(conv_col, "__island")
    return with_island.withColumn(out_col,
                                  F.count(F.lit(1)).over(wi)).drop("__island")


def conversation_stats(df: DataFrame, conv_col: str,
                       order_by: Sequence[Column | str],
                       role_col: str, text_col: str,
                       ts_col: str | None = None) -> DataFrame:
    """Per-conversation shape statistics for corpus-level filtering.

    Output per conv_id: n_turns, n_roles (distinct), n_distinct_texts,
    max_role_run (longest streak of one role — alternation health),
    max_text_run (longest streak of verbatim-identical text — loop smell),
    and when `ts_col` is given, duration_sec (last ts - first ts).
    """
    runs_role = turn_runs(df, conv_col, order_by, [role_col], "__role_run")
    runs_both = turn_runs(runs_role, conv_col, order_by, [text_col],
                          "__text_run")
    aggs = [
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct(role_col).alias("n_roles"),
        F.countDistinct(text_col).alias("n_distinct_texts"),
        F.max("__role_run").alias("max_role_run"),
        F.max("__text_run").alias("max_text_run"),
    ]
    if ts_col is not None:
        # unix_micros over a tz-cast handles TIMESTAMP_NTZ parquet columns;
        # with a UTC session the cast is identity on the stored micros
        us = F.unix_micros(F.col(ts_col).cast("timestamp"))
        aggs.append(
            (F.max(us) / F.lit(1000000.0) - F.min(us) / F.lit(1000000.0))
            .alias("duration_sec"))
    return runs_both.groupBy(conv_col).agg(*aggs)


def flag_looping_conversations(df: DataFrame, conv_col: str,
                               order_by: Sequence[Column | str],
                               sig_cols: Sequence[Column | str],
                               min_run: int = 3) -> DataFrame:
    """Conversations where some signature repeats >= min_run times in a row
    (an agent re-issuing the same tool call / message — the canonical stuck
    loop). Output: (conv_id, max_run, is_looping)."""
    runs = turn_runs(df, conv_col, order_by, sig_cols)
    return (runs.groupBy(conv_col)
                .agg(F.max("run_len").alias("max_run"))
                .withColumn("is_looping", F.col("max_run") >= min_run))


def drop_looping_conversations(df: DataFrame, conv_col: str,
                               order_by: Sequence[Column | str],
                               sig_cols: Sequence[Column | str],
                               min_run: int = 3) -> DataFrame:
    """Remove every turn of each looping conversation (left anti semi-join on
    the flagged conv ids — the flag table is conversation-grained and small)."""
    bad = (flag_looping_conversations(df, conv_col, order_by, sig_cols,
                                      min_run)
           .where(F.col("is_looping")).select(conv_col))
    return df.join(bad, conv_col, "left_anti")
