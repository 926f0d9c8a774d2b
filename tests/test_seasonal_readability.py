"""seasonal_dow_index + readability_report: ISO numbering, exact
ratios, counting conventions."""

from __future__ import annotations

import datetime as dt

from flow_indexer_spark.operators.telemetry import seasonal_dow_index
from flow_indexer_spark.operators.textstats import readability_report


def test_seasonal_dow_iso_and_index(spark):
    # 2024-01-01 is a Monday. Mondays get 4 events over 2 distinct
    # Mondays; Tuesday gets 1 event over 1 day.
    mon1, mon2 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 8)
    tue = dt.datetime(2024, 1, 2)
    rows = (
        [("c", mon1)] * 3 + [("c", mon2)] + [("c", tue)]
    )
    df = spark.createDataFrame(rows, "cls string, ts timestamp")
    out = {r["dow"]: r for r in seasonal_dow_index(df, "cls", "ts").collect()}
    assert set(out) == {1, 2}  # ISO: 1=Monday, 2=Tuesday
    mon = out[1]
    assert (mon["n_events"], mon["n_days"]) == (4, 2)
    assert mon["mean_daily"] == 2.0
    # overall: 5 events / 3 active days -> index = 2 / (5/3) = 1.2
    assert mon["index"] == 1.2
    assert out[2]["index"] == round(1 / (5 / 3), 9)


def test_seasonal_classes_independent(spark):
    d = dt.datetime(2024, 1, 3)  # Wednesday
    df = spark.createDataFrame(
        [("a", d), ("b", d), ("b", d)], "cls string, ts timestamp"
    )
    out = {
        (r["class"], r["dow"]): r["index"]
        for r in seasonal_dow_index(df, "cls", "ts").collect()
    }
    # single active day per class -> index exactly 1.0
    assert out == {("a", 3): 1.0, ("b", 3): 1.0}


def test_readability_hand_computed(spark):
    # "the cat sat." -> words 3, sentences 1, syllables 1+1+1 = 3
    docs = spark.createDataFrame(
        [("g", "the cat sat.")], "src string, text string"
    )
    r = readability_report(docs, "src", "text").collect()[0]
    assert (r["words"], r["sentences"], r["syllables"]) == (3, 1, 3)
    assert r["flesch"] == round(206.835 - 1.015 * 3.0 - 84.6 * 1.0, 9)


def test_readability_conventions(spark):
    # no terminal punctuation -> sentences floored at 1;
    # consonant-only token -> syllables floored at 1;
    # "aeiou" is ONE vowel group -> 1 syllable;
    # "audio" -> groups "au","io"... a-u-d-i-o = [au][io] = 2
    docs = spark.createDataFrame(
        [("g", "xyz aeiou audio")], "src string, text string"
    )
    r = readability_report(docs, "src", "text").collect()[0]
    assert r["sentences"] == 1
    assert r["syllables"] == 1 + 1 + 2
    # multi-sentence run counting: "a! b? c..." -> 3 runs
    docs2 = spark.createDataFrame(
        [("g", "a! b? c...")], "src string, text string"
    )
    assert readability_report(docs2, "src", "text").collect()[0]["sentences"] == 3
