"""Trajectory operators (operators/trajectories.py): action paths,
identical-trajectory dedup, truncated-prefix subsumption, fork mining.

Hand fixtures pin exact semantics (what is a duplicate, what is
subsumption, what counts as a branch); a brute-force twin over a
random corpus pins the set algebra; separator-forgery and plan-shape
checks pin the scale posture (fixed-width hashes in every shuffle)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from flow_indexer_spark.operators.trajectories import (
    SEP,
    action_paths,
    path_forks,
    prefix_subsumption,
    trajectory_dedup,
)


def _df(spark, seqs: dict[str, list[str]]):
    rows = [
        (conv, i, c) for conv, seq in seqs.items() for i, c in enumerate(seq)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string"
    )


FIX = {
    "c1": ["a", "b", "c"],
    "c2": ["a", "b", "c"],  # exact duplicate of c1
    "c3": ["a", "b"],       # proper prefix of c1 -> subsumed
    "c4": ["a", "x"],       # diverges at depth 1
    "c5": ["b"],            # unrelated root
}


def test_action_paths_order_is_turn_idx_not_input_order(spark):
    df = _df(spark, FIX).orderBy(F.rand(7))  # scramble physical order
    got = {
        r["conv_id"]: (r["path"], r["path_len"])
        for r in action_paths(df).collect()
    }
    assert got == {c: (s, len(s)) for c, s in FIX.items()}
    # hash is the sha256 of the SEP-joined contents (oracle-matched)
    row = action_paths(df).where("conv_id = 'c1'").first()
    assert row["path_hash"] == hashlib.sha256(
        SEP.join(FIX["c1"]).encode()
    ).hexdigest()


def test_trajectory_dedup_keep_one_witness(spark):
    got = {
        r["path_hash"]: (r["n_conversations"], r["witness_conv_id"])
        for r in trajectory_dedup(_df(spark, FIX)).collect()
    }
    assert len(got) == 4  # abc, ab, ax, b
    h_abc = hashlib.sha256(SEP.join("abc").encode()).hexdigest()
    assert got[h_abc] == (2, "c1")  # min conv_id wins
    assert all(n == 1 for h, (n, _) in got.items() if h != h_abc)


def test_prefix_subsumption_proper_prefix_only(spark):
    got = {
        r["conv_id"]: (r["subsumed"], r["subsumed_by_len"])
        for r in prefix_subsumption(_df(spark, FIX)).collect()
    }
    # c3 is a proper prefix of c1/c2 (len 3); equal-length twins c1/c2
    # are NOT subsumption; c5's 'b' is nobody's prefix at depth 1
    assert got == {
        "c1": (False, None),
        "c2": (False, None),
        "c3": (True, 3),
        "c4": (False, None),
        "c5": (False, None),
    }


def test_path_forks_branches_and_terminals(spark):
    rows = path_forks(_df(spark, FIX), min_branches=1).collect()
    by_key = {(r["depth"], r["prefix_hash"]): r for r in rows}
    h = lambda s: hashlib.sha256(SEP.join(s).encode()).hexdigest()  # noqa: E731
    a = by_key[(1, h("a"))]
    assert (a["n_conversations"], a["n_branches"], a["n_terminal"]) == (4, 2, 0)
    ab = by_key[(2, h("ab"))]
    # continuations of 'a,b': {'c', terminal(c3)} -> 1 branch + 1 terminal
    assert (ab["n_conversations"], ab["n_branches"], ab["n_terminal"]) == (
        3, 1, 1,
    )
    # default threshold keeps only real forks
    forked = path_forks(_df(spark, FIX)).collect()
    assert [(r["depth"], r["prefix_hash"]) for r in forked] == [(1, h("a"))]
    with pytest.raises(ValueError, match="min_branches"):
        path_forks(_df(spark, FIX), min_branches=0)


def test_separator_cannot_be_forged_by_content(spark):
    """('a|b','c') and ('a','b|c') must be DIFFERENT paths: the unit
    separator, not a printable delimiter, joins contents."""
    df = _df(spark, {"p": ["a|b", "c"], "q": ["a", "b|c"]})
    assert trajectory_dedup(df).count() == 2
    sub = {r["conv_id"]: r["subsumed"] for r in prefix_subsumption(df).collect()}
    assert sub == {"p": False, "q": False}


def test_brute_force_twin_on_random_corpus(spark):
    """Random bounded trajectories: dedup groups, subsumption set and
    fork table all equal a plain-python recomputation."""
    rng = np.random.default_rng(17)
    seqs = {}
    for i in range(120):
        n = int(rng.integers(1, 7))
        seqs[f"t{i:03d}"] = [str(x) for x in rng.integers(0, 3, n)]
    df = _df(spark, seqs)

    # dedup
    want_groups: dict[tuple, list] = {}
    for c, s in seqs.items():
        want_groups.setdefault(tuple(s), []).append(c)
    got = {
        r["path_hash"]: (r["n_conversations"], r["witness_conv_id"])
        for r in trajectory_dedup(df).collect()
    }
    want = {
        hashlib.sha256(SEP.join(s).encode()).hexdigest(): (
            len(cs), min(cs),
        )
        for s, cs in want_groups.items()
    }
    assert got == want

    # subsumption
    want_sub = {
        c: any(
            len(o) > len(s) and list(o[: len(s)]) == s
            for o in map(tuple, seqs.values())
        )
        for c, s in seqs.items()
    }
    got_sub = {
        r["conv_id"]: r["subsumed"] for r in prefix_subsumption(df).collect()
    }
    assert got_sub == want_sub

    # forks
    want_forks: dict[tuple, list] = {}
    for c, s in seqs.items():
        for d in range(1, len(s) + 1):
            nxt = s[d] if d < len(s) else None
            want_forks.setdefault(tuple(s[:d]), []).append(nxt)
    expected = sorted(
        (
            len(p),
            hashlib.sha256(SEP.join(p).encode()).hexdigest(),
            len(ns),
            len({x for x in ns if x is not None}),
            sum(1 for x in ns if x is None),
        )
        for p, ns in want_forks.items()
        if len({x for x in ns if x is not None}) >= 2
    )
    got_forks = sorted(
        (
            r["depth"],
            r["prefix_hash"],
            r["n_conversations"],
            r["n_branches"],
            r["n_terminal"],
        )
        for r in path_forks(df).collect()
    )
    assert got_forks == expected


def test_plan_no_path_strings_cross_the_fork_shuffle(spark):
    """Scale posture: the fork/dedup aggregations shuffle fixed-width
    sha256 hex (and small ints) only — no raw prefix/path string column
    survives into an Exchange. trajectory_dedup is exactly two
    Exchanges (conv_id assembly + the hash-keyed aggregate);
    path_forks is three because count_distinct expands to Spark's
    standard two-phase distinct aggregate — every added exchange still
    keyed on (depth, prefix_hash[, next_content])."""
    df = _df(spark, FIX)
    for out, n in ((trajectory_dedup(df), 2), (path_forks(df), 3)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == n, plan
        for ex in [
            ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
        ]:
            assert "prefix#" not in ex and "path#" not in ex, ex
    # subsumption adds the left join back to conversations
    plan = (
        prefix_subsumption(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
