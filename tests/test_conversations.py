"""Conversation-grain curation: run lengths, stats, loop detection."""

from __future__ import annotations

import pytest

from solr_spark.functions.conversations import (
    conversation_stats,
    drop_looping_conversations,
    flag_looping_conversations,
    turn_runs,
)


@pytest.fixture(scope="module")
def convs(spark):
    rows = [
        # conv A: healthy alternation
        ("A", 0, "user", "hi", None),
        ("A", 1, "assistant", "hello", None),
        ("A", 2, "user", "bye", None),
        # conv B: agent stuck re-issuing the same tool call 3x
        ("B", 0, "user", "do it", None),
        ("B", 1, "assistant", "run x", "bash"),
        ("B", 2, "assistant", "run x", "bash"),
        ("B", 3, "assistant", "run x", "bash"),
        ("B", 4, "assistant", "done", None),
        # conv C: same text but NOT consecutive -> not a run
        ("C", 0, "user", "ping", None),
        ("C", 1, "assistant", "pong", None),
        ("C", 2, "user", "ping", None),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string")


def test_turn_runs(spark, convs):
    out = turn_runs(convs, "conv_id", ["turn_idx"], ["text", "tool"])
    got = {(r["conv_id"], r["turn_idx"]): r["run_len"] for r in out.collect()}
    assert got[("B", 1)] == got[("B", 2)] == got[("B", 3)] == 3
    assert got[("B", 0)] == got[("B", 4)] == 1
    assert got[("C", 0)] == got[("C", 2)] == 1  # non-consecutive repeats


def test_null_tool_does_not_conflate(spark, convs):
    # signature must distinguish NULL tool from the string "None"/empty
    rows = [("D", 0, "a", "x", None), ("D", 1, "a", "x", "")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string")
    out = turn_runs(df, "conv_id", ["turn_idx"], ["text", "tool"])
    assert all(r["run_len"] == 1 for r in out.collect())


def test_conversation_stats(spark, convs):
    stats = {r["conv_id"]: r.asDict()
             for r in conversation_stats(convs, "conv_id", ["turn_idx"],
                                         "role", "text").collect()}
    assert stats["A"]["n_turns"] == 3 and stats["A"]["max_role_run"] == 1
    assert stats["B"]["max_role_run"] == 4  # assistant streak incl. 'done'
    assert stats["B"]["max_text_run"] == 3
    assert stats["B"]["n_distinct_texts"] == 3
    assert stats["C"]["n_distinct_texts"] == 2


def test_flag_and_drop_loops(spark, convs):
    flags = {r["conv_id"]: r["is_looping"]
             for r in flag_looping_conversations(
                 convs, "conv_id", ["turn_idx"], ["text", "tool"],
                 min_run=3).collect()}
    assert flags == {"A": False, "B": True, "C": False}
    kept = drop_looping_conversations(convs, "conv_id", ["turn_idx"],
                                      ["text", "tool"], min_run=3)
    assert sorted(set(r["conv_id"] for r in kept.collect())) == ["A", "C"]
