"""nbayes: hand-computed model values, smoothing, unseen tokens,
deterministic tie-break."""

from __future__ import annotations

import math

from flow_indexer_spark.operators.nbayes import nb_predict, nb_score, nb_train


def _toks(spark, rows):
    return spark.createDataFrame(rows, "cls string, doc bigint, token string, n bigint")


def _fit(spark):
    # class a: doc1 = "x x y"; class b: doc2 = "y z"  (V = 3)
    rows = [("a", 1, "x", 2), ("a", 1, "y", 1), ("b", 2, "y", 1), ("b", 2, "z", 1)]
    return nb_train(_toks(spark, rows), "cls", "doc", "token", "n")


def test_model_hand_computed(spark):
    model, classes = _fit(spark)
    m = {(r["cls"], r["token"]): r for r in model.collect()}
    assert m[("a", "x")]["n"] == 2
    assert m[("a", "x")]["log_prob"] == round(math.log(3 / 6), 9)
    assert m[("a", "y")]["log_prob"] == round(math.log(2 / 6), 9)
    assert m[("b", "y")]["log_prob"] == round(math.log(2 / 5), 9)
    assert m[("b", "z")]["log_prob"] == round(math.log(2 / 5), 9)
    c = {r["cls"]: r for r in classes.collect()}
    assert c["a"]["n_docs"] == 1 and c["a"]["tot_tokens"] == 3
    assert c["a"]["log_prior"] == round(math.log(0.5), 9)
    assert c["a"]["log_default"] == round(math.log(1 / 6), 9)
    assert c["b"]["log_default"] == round(math.log(1 / 5), 9)


def test_score_and_predict(spark):
    model, classes = _fit(spark)
    docs = spark.createDataFrame(
        [(10, "x", 1), (10, "y", 1), (11, "z", 1)],
        "doc bigint, token string, n bigint",
    )
    sc = nb_score(docs, model, classes, "doc", "token", "n")
    s = {(r["doc"], r["cls"]): r["score"] for r in sc.collect()}
    # doc 10 "x y": class a sees both tokens; class b has no 'x'
    exp_a = round(math.log(0.5), 9) + round(math.log(3 / 6), 9) + round(
        math.log(2 / 6), 9
    )
    exp_b = round(math.log(0.5), 9) + round(math.log(1 / 5), 9) + round(
        math.log(2 / 5), 9
    )
    assert s[(10, "a")] == round(exp_a, 9)
    assert s[(10, "b")] == round(exp_b, 9)
    pred = {r["doc"]: r["predicted"] for r in nb_predict(sc).collect()}
    assert pred[10] == "a"  # 'x x' evidence wins
    assert pred[11] == "b"  # 'z' only ever seen in b


def test_unseen_token_uses_default_everywhere(spark):
    model, classes = _fit(spark)
    docs = spark.createDataFrame(
        [(20, "never-seen", 2)], "doc bigint, token string, n bigint"
    )
    s = {
        (r["doc"], r["cls"]): r["score"]
        for r in nb_score(docs, model, classes, "doc", "token", "n").collect()
    }
    assert s[(20, "a")] == round(
        round(math.log(0.5), 9) + 2 * round(math.log(1 / 6), 9), 9
    )
    assert s[(20, "b")] == round(
        round(math.log(0.5), 9) + 2 * round(math.log(1 / 5), 9), 9
    )


def test_symmetric_tie_breaks_to_smaller_class(spark):
    # perfectly symmetric classes: identical scores, argmax must pick 'a'
    rows = [("a", 1, "t", 1), ("b", 2, "t", 1)]
    model, classes = nb_train(_toks(spark, rows), "cls", "doc", "token", "n")
    docs = spark.createDataFrame([(5, "t", 1)], "doc bigint, token string, n bigint")
    sc = nb_score(docs, model, classes, "doc", "token", "n")
    vals = {r["cls"]: r["score"] for r in sc.collect()}
    assert vals["a"] == vals["b"]
    assert nb_predict(sc).collect()[0]["predicted"] == "a"
