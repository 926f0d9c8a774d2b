"""BLEU/ROUGE sufficient statistics: hand-computed clipping, perfect
match, brevity penalty, and the zero-match convention."""

from __future__ import annotations

import math

from flow_indexer_spark.operators.genmetrics import (
    corpus_bleu,
    ngram_overlap_stats,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "pair bigint, cand string, ref string")


def _stats(spark, rows):
    df = ngram_overlap_stats(_pairs(spark, rows), "pair", "cand", "ref")
    return {r["pair"]: r.asDict() for r in df.collect()}


def test_clipping_is_the_papineni_example(spark):
    # ACL-2002 example: 7x 'the' vs a 2-'the' reference clips to 2
    s = _stats(
        spark, [(1, "the the the the the the the", "the cat is on the mat")]
    )[1]
    assert s["m1"] == 2 and s["tc1"] == 7 and s["tr1"] == 6
    assert s["m2"] == 0 and s["tc2"] == 6  # no shared bigram


def test_hand_counts_all_orders(spark):
    s = _stats(spark, [(1, "a b c d", "a b c e")])[1]
    assert (s["m1"], s["tc1"], s["tr1"]) == (3, 4, 4)
    assert (s["m2"], s["tc2"], s["tr2"]) == (2, 3, 3)
    assert (s["m3"], s["tc3"]) == (1, 2)
    assert (s["m4"], s["tc4"]) == (0, 1)
    assert s["cand_len"] == 4 and s["ref_len"] == 4


def test_perfect_match_scores_one(spark):
    stats = ngram_overlap_stats(
        _pairs(spark, [(1, "a b c d e", "a b c d e")]), "pair", "cand", "ref"
    )
    row = corpus_bleu(stats).collect()[0]
    assert row["bleu"] == 1.0 and row["brevity_penalty"] == 1.0


def test_brevity_penalty_and_zero_match_convention(spark):
    # shorter candidate: bp = exp(1 - ref_len/cand_len) = exp(1 - 6/4)
    stats = ngram_overlap_stats(
        _pairs(spark, [(1, "a b c d", "a b c d e f")]), "pair", "cand", "ref"
    )
    row = corpus_bleu(stats).collect()[0]
    assert row["brevity_penalty"] == round(math.exp(1 - 6 / 4), 9)
    exp_bleu = round(
        math.exp(1 - 6 / 4)
        * math.exp((math.log(4 / 4) + math.log(3 / 3) + math.log(2 / 2)
                    + math.log(1 / 1)) / 4),
        9,
    )
    assert row["bleu"] == exp_bleu
    # disjoint pair: some order has zero matches -> bleu = 0 exactly
    stats0 = ngram_overlap_stats(
        _pairs(spark, [(1, "a b", "c d")]), "pair", "cand", "ref"
    )
    assert corpus_bleu(stats0).collect()[0]["bleu"] == 0.0
