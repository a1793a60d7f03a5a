"""Durable tokenizer artifacts (datapipe/tokenizer_store.py):
train -> write -> read -> encode must equal train -> encode, for all
three tokenizer families."""

import os

import pytest

from carbonapi_spark.datapipe.tokenizer_store import (
    read_tokenizer, write_bpe, write_unigram)


def _docs(spark):
    texts = ["the cat sat on the mat", "a fast hash join order by key",
             "sort merge join order order", "the mat the cat the hash"]
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def _collect_enc(df):
    return sorted((r["doc_id"], r["token"], tuple(r["pieces"] or ()))
                  for r in df.collect())


def test_bpe_round_trip(spark, tmp_path):
    from carbonapi_spark.datapipe.bpe import bpe_encode, bpe_train
    docs = _docs(spark)
    merges = [(r["lhs"], r["rhs"])
              for r in bpe_train(docs, n_merges=6).collect()]
    p = os.path.join(str(tmp_path), "tok_bpe")
    write_bpe(spark, p, merges, params={"n_merges": 6})
    kind, payload, params = read_tokenizer(spark, p)
    assert kind == "bpe" and params == {"n_merges": 6}
    assert payload == merges
    assert _collect_enc(bpe_encode(docs, payload)) \
        == _collect_enc(bpe_encode(docs, merges))


def test_wordpiece_round_trip(spark, tmp_path):
    from carbonapi_spark.datapipe.bpe import wordpiece_train
    docs = _docs(spark)
    merges = [(r["lhs"], r["rhs"])
              for r in wordpiece_train(docs, n_merges=5).collect()]
    p = os.path.join(str(tmp_path), "tok_wp")
    write_bpe(spark, p, merges, kind="wordpiece")
    kind, payload, _ = read_tokenizer(spark, p)
    assert kind == "wordpiece" and payload == merges


def test_unigram_round_trip(spark, tmp_path):
    from carbonapi_spark.datapipe.unigram import (
        unigram_count_vocab, unigram_encode)
    docs = _docs(spark)
    vocab = unigram_count_vocab(docs, iters=1, n_multi=16, keep_multi=8)
    p = os.path.join(str(tmp_path), "tok_uni")
    write_unigram(spark, p, vocab, params={"iters": 1})
    kind, payload, params = read_tokenizer(spark, p)
    assert kind == "unigram" and params == {"iters": 1}
    assert payload == {k: float(v) for k, v in vocab.items()}
    assert _collect_enc(unigram_encode(docs, payload)) \
        == _collect_enc(unigram_encode(docs, vocab))


def test_bad_kind_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        write_bpe(spark, str(tmp_path / "x"), [], kind="unigram")
