"""tool_call_validation / context_window_pairs / pmi_collocations:
classification truth table, budget-suffix semantics vs a python
reference, PMI vs hand counts."""

import math

from flow_indexer_spark.operators.phrases import pmi_collocations
from flow_indexer_spark.operators.transcripts import (
    context_window_pairs,
    tool_call_audit,
    tool_call_validation,
)

REG = [
    {"name": "search", "required": ["query", "limit"], "int_args": ["limit"]},
    {"name": "fetch", "required": ["url"], "int_args": []},
]


def test_tool_call_classification(spark):
    calls = [
        (0, '{"name": "search", "args": {"query": "q", "limit": 5}}', "ok"),
        (1, '{"name": "search", "args": {"query": "q"}}', "missing_arg"),
        (2, '{"name": "search", "args": {"query": "q", "limit": "x"}}',
         "bad_type"),
        (3, '{"name": "search", "args": {"limit": 5}}', "missing_arg"),
        (4, '{"name": "fetch", "args": {"url": "u"}}', "ok"),
        (5, '{"name": "fetch", "args": {}}', "missing_arg"),
        (6, '{"name": "nope", "args": {}}', "unknown_tool"),
        (7, '{"args": {}}', "malformed"),
        (8, '{"name": "search", "args": {"query": "q", "limit": -3}}', "ok"),
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c, _ in calls], "i int, tool_call string"
    )
    got = {
        r["i"]: r["status"] for r in tool_call_validation(df, REG).collect()
    }
    assert got == {i: want for i, _, want in calls}


def test_tool_call_audit_counts(spark):
    df = spark.createDataFrame(
        [('{"name": "fetch", "args": {"url": "u"}}',)] * 3
        + [('{"name": "fetch", "args": {}}',)],
        "tool_call string",
    )
    rows = {
        (r["tool_name"], r["status"]): r["n_calls"]
        for r in tool_call_audit(df, REG).collect()
    }
    assert rows[("fetch", "ok")] == 3 and rows[("fetch", "missing_arg")] == 1


def _py_context(turns, budget):
    """Reference: maximal contiguous suffix of preceding turns fitting
    the budget."""
    out = {}
    for i, (idx, role, text) in enumerate(turns):
        if role != "a":
            continue
        prior = turns[:i]
        kept = []
        rem = budget
        for pidx, prole, ptext in reversed(prior):
            k = len([w for w in ptext.split(" ") if w])
            if k <= rem:
                kept.append(f"{prole}: {ptext}")
                rem -= k
            else:
                break
        out[idx] = ("\n".join(reversed(kept)), len(kept))
    return out


def test_context_window_pairs_matches_reference(spark):
    turns = [
        (0, "u", "one two three"),
        (1, "a", "reply a"),
        (2, "u", "four five six seven eight"),
        (3, "u", "nine"),
        (4, "a", "reply b"),
        (5, "a", "reply c"),
    ]
    df = spark.createDataFrame(
        [("c1", i, r, t) for i, r, t in turns],
        "conv_id string, turn_idx int, role string, text string",
    )
    got = {
        r["turn_idx"]: (r["context"], r["n_context_turns"])
        for r in context_window_pairs(
            df, response_role="a", budget_tokens=6
        ).collect()
    }
    assert got == _py_context(turns, 6)
    # budget large enough for everything -> full history
    got_all = {
        r["turn_idx"]: r["n_context_turns"]
        for r in context_window_pairs(
            df, response_role="a", budget_tokens=1000
        ).collect()
    }
    assert got_all == {1: 1, 4: 4, 5: 5}


def test_pmi_collocations_hand_counts(spark):
    # corpus: 'a b' x4, 'a c' x2 -> pairs (a,b):4, (a,c):2; words a:6 b:4 c:2
    docs = ["a b"] * 4 + ["a c"] * 2
    df = spark.createDataFrame([(i, t) for i, t in enumerate(docs)],
                               "doc_id int, text string")
    rows = {
        (r["w1"], r["w2"]): r
        for r in pmi_collocations(df, min_count=2, topk=10).collect()
    }
    assert rows[("a", "b")]["n_pair"] == 4
    assert rows[("a", "c")]["n_pair"] == 2
    n, np_ = 12, 6
    want = round(math.log((4 * n * n) / (np_ * 6 * 4)), 10)
    assert abs(rows[("a", "b")]["pmi"] - want) < 1e-9
