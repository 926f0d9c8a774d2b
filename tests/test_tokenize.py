"""Tokenizer pipeline: vocab census, id encoding, SFT loss spans."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from flow_indexer_spark.operators.tokenize import (
    BOS_ID,
    EOS_ID,
    UNK_ID,
    build_vocab,
    encode_corpus,
    sft_turn_spans,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat sat on the mat"),
            Row(doc_id=2, text="the dog sat"),
            Row(doc_id=3, text="rare words here"),
            Row(doc_id=4, text=""),
        ]
    ).cache()


def test_build_vocab_ids_dense_deterministic(corpus):
    v = {r["token"]: (r["token_id"], r["n"]) for r in build_vocab(
        corpus, max_size=3, min_count=2).collect()}
    # counts: the=3, sat=2, everything else 1 (dropped by min_count)
    assert v == {"the": (4, 3), "sat": (5, 2)}
    # determinism under ties: singletons rank alphabetically when allowed
    v2 = [r["token"] for r in build_vocab(corpus, max_size=4, min_count=1)
          .orderBy("token_id").collect()]
    assert v2[:2] == ["the", "sat"]
    assert v2[2:] == sorted(v2[2:])  # tied count=1 tokens: alpha order


def test_encode_corpus_unk_bos_eos(corpus):
    vocab = build_vocab(corpus, max_size=10, min_count=2)
    enc = {r["doc_id"]: r for r in encode_corpus(corpus, vocab).collect()}
    # doc 2: "the dog sat" -> [BOS, the, UNK, sat, EOS]
    assert enc[2]["input_ids"] == [BOS_ID, 4, UNK_ID, 5, EOS_ID]
    assert enc[2]["n_tokens"] == 5
    # doc 3: all OOV
    assert enc[3]["input_ids"] == [BOS_ID, UNK_ID, UNK_ID, UNK_ID, EOS_ID]
    # empty doc still yields a row
    assert enc[4]["input_ids"] == [BOS_ID, EOS_ID]
    # no specials mode
    raw = {r["doc_id"]: r["input_ids"] for r in encode_corpus(
        corpus, vocab, add_special=False).collect()}
    assert raw[4] == []
    assert raw[2] == [4, UNK_ID, 5]


def test_sft_turn_spans_offsets_and_mask(spark):
    t = spark.createDataFrame(
        [
            Row(conv_id="c1", turn_idx=0, role="user", text="hi there"),
            Row(conv_id="c1", turn_idx=1, role="assistant", text="hello friend one"),
            Row(conv_id="c1", turn_idx=2, role="user", text="bye"),
            Row(conv_id="c2", turn_idx=0, role="assistant", text="solo turn"),
        ]
    )
    out = {(r["conv_id"], r["turn_idx"]): r for r in sft_turn_spans(t).collect()}
    assert (out[("c1", 0)]["start_tok"], out[("c1", 0)]["end_tok"]) == (0, 2)
    assert (out[("c1", 1)]["start_tok"], out[("c1", 1)]["end_tok"]) == (2, 5)
    assert (out[("c1", 2)]["start_tok"], out[("c1", 2)]["end_tok"]) == (5, 6)
    assert (out[("c2", 0)]["start_tok"], out[("c2", 0)]["end_tok"]) == (0, 2)
    assert [out[k]["is_loss"] for k in sorted(out)] == [False, True, False, True]
    # spans tile each conversation exactly: starts == previous ends
    for conv in ("c1", "c2"):
        spans = sorted(
            (r["start_tok"], r["end_tok"])
            for k, r in out.items() if k[0] == conv
        )
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 == e1


def test_materialize_packs_tiles_streams_and_matches_plan(spark):
    import hashlib

    from flow_indexer_spark.operators.curation import pack_sequences
    from flow_indexer_spark.operators.tokenize import PAD_ID, materialize_packs

    rows = [
        Row(doc_id=i, input_ids=[100 * i + j for j in range(3 + i % 4)])
        for i in range(1, 13)
    ]
    enc = spark.createDataFrame(rows).cache()
    budget, n_shards = 5, 2
    packs = materialize_packs(enc, budget, n_shards).collect()

    # reconstruct each shard's token stream from its packs, in pack order
    stream = {}
    for r in sorted(packs, key=lambda r: (r["shard"], r["pack_idx"])):
        stream.setdefault(r["shard"], []).extend(r["input_ids"])
        # every non-tail pack is exactly `budget` tokens
    for shard, toks in stream.items():
        per_shard = [r for r in packs if r["shard"] == shard]
        assert all(
            r["n_tokens"] == budget
            for r in per_shard
            if r["pack_idx"] < max(p["pack_idx"] for p in per_shard)
        )

    # expected stream: docs concatenated in (md5 hash, id) order per shard
    def h(i):
        return int(hashlib.md5(f"pack{i}".encode()).hexdigest()[:8], 16)

    expect = {}
    for r in sorted(rows, key=lambda r: (h(r["doc_id"]), r["doc_id"])):
        expect.setdefault(h(r["doc_id"]) % n_shards, []).extend(r["input_ids"])
    assert stream == expect

    # the PLANNING op (pack_sequences) agrees: each doc's first token
    # lands at its planned (pack_id, offset)
    plan = {
        r["doc_id"]: r
        for r in pack_sequences(
            enc.withColumn("n", F.size("input_ids")),
            budget,
            n_tokens_col="n",
            n_shards=n_shards,
        ).collect()
    }
    for r in rows:
        p = plan[r["doc_id"]]
        shard, pk = p["shard"], int(p["pack_id"].split("-")[1])
        pos = pk * budget + p["offset"]
        assert stream[shard][pos] == r["input_ids"][0]

    # pad mode: tails padded to budget with PAD_ID
    padded = materialize_packs(enc, budget, n_shards, pad=True).collect()
    assert all(r["n_tokens"] == budget for r in padded)
    tail_tokens = sum(len(s) for s in stream.values())
    n_pads = sum(r["input_ids"].count(PAD_ID) for r in padded)
    assert n_pads == budget * len(padded) - tail_tokens


def test_sft_examples_ids_and_mask_aligned(spark):
    from flow_indexer_spark.operators.tokenize import build_vocab, sft_examples

    rows = [
        Row(conv_id="c1", turn_idx=0, role="user", text="the cat sat"),
        Row(conv_id="c1", turn_idx=1, role="assistant", text="on the mat"),
        Row(conv_id="c1", turn_idx=2, role="user", text=""),
        Row(conv_id="c1", turn_idx=3, role="assistant", text="the end"),
        Row(conv_id="c2", turn_idx=0, role="assistant", text="zzz unseen"),
    ]
    t = spark.createDataFrame(rows)
    vocab = build_vocab(t, max_size=100, min_count=2)  # only 'the' repeats
    out = {r["conv_id"]: r.asDict() for r in sft_examples(t, vocab).collect()}

    c1 = out["c1"]
    # turn order preserved, empty turn contributes nothing
    assert c1["n_tokens"] == 3 + 3 + 0 + 2
    assert len(c1["input_ids"]) == len(c1["loss_mask"]) == c1["n_tokens"]
    # mask is 1 exactly over the assistant turns' token spans
    assert c1["loss_mask"] == [0, 0, 0, 1, 1, 1, 1, 1]
    # 'the' is in-vocab (appears 4x); everything else is UNK
    the_id = {r["token"]: r["token_id"] for r in vocab.collect()}["the"]
    assert c1["input_ids"][0] == the_id  # "the cat sat"
    assert c1["input_ids"][4] == the_id  # "on THE mat"
    assert c1["input_ids"][1] == UNK_ID

    c2 = out["c2"]  # all tokens OOV, single loss turn
    assert c2["input_ids"] == [UNK_ID, UNK_ID]
    assert c2["loss_mask"] == [1, 1]


def test_sft_examples_custom_loss_roles(spark):
    from flow_indexer_spark.operators.tokenize import build_vocab, sft_examples

    rows = [
        Row(conv_id="c", turn_idx=0, role="click", text="a b"),
        Row(conv_id="c", turn_idx=1, role="view", text="c"),
    ]
    t = spark.createDataFrame(rows)
    vocab = build_vocab(t, max_size=10, min_count=1)
    r = sft_examples(t, vocab, loss_roles=("click",)).collect()[0]
    assert r["loss_mask"] == [1, 1, 0]


def test_context_length_sweep_counts(spark):
    from flow_indexer_spark.operators.tokenize import context_length_sweep

    rows = [
        Row(doc_id=1, text=" ".join(["a"] * 10)),
        Row(doc_id=2, text=" ".join(["b"] * 3)),
        Row(doc_id=3, text=""),
    ]
    df = spark.createDataFrame(rows)
    out = {r["max_len"]: r.asDict() for r in context_length_sweep(df, (4, 16)).collect()}
    at4 = out[4]
    assert at4["n_docs"] == 3 and at4["n_truncated"] == 1
    assert at4["tokens_kept"] == 4 + 3 + 0
    assert at4["tokens_lost"] == 6
    assert abs(at4["frac_tokens_lost"] - 6 / 13) < 1e-9
    at16 = out[16]
    assert at16["n_truncated"] == 0 and at16["tokens_lost"] == 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        context_length_sweep(df, ())
    with _pytest.raises(ValueError):
        context_length_sweep(df, (0, 8))
