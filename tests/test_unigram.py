"""Unigram-LM tokenizer (datapipe/unigram.py): Viterbi recurrence
equivalence (expression vs driver twin), count-train determinism vs a
pure-Python replay of the whole loop, EM invariants, encode edges."""

import math
import random

from pyspark.sql import functions as F

from carbonapi_spark.datapipe.unigram import (
    MAX_PIECE_LEN, SEP, pieces_of, seed_pieces, segment_types,
    unigram_count_train, unigram_encode, unigram_train_em, viterbi_expr,
    word_types, _viterbi_local)


def _mdl_viterbi_py(word, vocab, max_piece_len=MAX_PIECE_LEN):
    """Pure-Python replay of the MDL-objective recurrence."""
    n = len(word)
    best = [(0, 0, SEP)] + [None] * n
    for i in range(1, n + 1):
        for l in range(1, min(max_piece_len, i) + 1):
            p = word[i - l:i]
            s = vocab.get(p)
            prev = best[i - l]
            if s is None or prev is None:
                continue
            cand = (prev[0] + 1, prev[1] + s, prev[2] + p + SEP)
            cur = best[i]
            if (cur is None or cand[0] < cur[0]
                    or (cand[0] == cur[0] and cand[1] > cur[1])
                    or (cand[0] == cur[0] and cand[1] == cur[1]
                        and cand[2] < cur[2])):
                best[i] = cand
    return best[n]


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_viterbi_expr_matches_python_mdl(spark):
    rng = random.Random(8)
    vocab = {c: rng.randint(1, 50) for c in "abcde"}
    for p in ["ab", "bc", "cde", "ea", "abc", "de", "cd"]:
        vocab[p] = rng.randint(1, 400)
    words = ["".join(rng.choice("abcde") for _ in range(rng.randint(1, 16)))
             for _ in range(300)]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    v = viterbi_expr(F.col("word"), vocab)
    got = {r["word"]: (r["s"]["np"], r["s"]["score"], r["s"]["pstr"])
           for r in df.select("word", v.alias("s")).collect()}
    for w in set(words):
        exp = _mdl_viterbi_py(w, vocab)
        assert got[w] == exp, (w, got[w], exp)


def test_viterbi_expr_matches_python_logprob(spark):
    rng = random.Random(9)
    vocab = {c: math.log(rng.uniform(0.01, 0.2)) for c in "abc"}
    for p in ["ab", "bc", "ca", "abc", "aa"]:
        vocab[p] = math.log(rng.uniform(0.001, 0.3))
    words = ["".join(rng.choice("abc") for _ in range(rng.randint(1, 12)))
             for _ in range(200)]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    v = viterbi_expr(F.col("word"), vocab, objective="logprob")
    got = {r["word"]: (r["s"]["score"], r["s"]["np"], r["s"]["pstr"])
           for r in df.select("word", v.alias("s")).collect()}
    for w in set(words):
        exp = _viterbi_local(w, vocab)
        assert got[w][1:] == exp[1:], (w, got[w], exp)
        assert got[w][0] == __import__("pytest").approx(exp[0], abs=1e-12)


def test_viterbi_sql_path_matches_column_path(spark):
    """viterbi_expr(<name>) — the one-parse SQL fast path (r14) — is
    bit-identical to viterbi_expr(F.col(<name>)) for both objectives,
    including words with quote/backslash characters in the vocab."""
    rng = random.Random(10)
    words = ["".join(rng.choice("ab'c\\d") for _ in range(rng.randint(1, 16)))
             for _ in range(200)] + ["", "a" * 17]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    for objective, vocab in (
            ("mdl", {**{c: rng.randint(1, 50) for c in "ab'c\\d"},
                     "ab": 99, "'c": 77, "\\d": 55, "c\\d": 44}),
            ("logprob", {**{c: math.log(rng.uniform(0.01, 0.2))
                            for c in "ab'c\\d"},
                         "ab": math.log(0.17), "b'": math.log(0.13)})):
        vc = viterbi_expr(F.col("word"), vocab, objective=objective)
        vs = viterbi_expr("word", vocab, objective=objective)
        got_c = [tuple(r) for r in
                 df.select("word", vc.alias("s")).collect()]
        got_s = [tuple(r) for r in
                 df.select("word", vs.alias("s")).collect()]
        assert got_c == got_s


def test_viterbi_nulls(spark):
    df = spark.createDataFrame(
        [("a" * 17,), ("axz",), ("aa",)], "word string")
    v = viterbi_expr(F.col("word"), {"a": 3, "aa": 9})
    rows = {r["word"]: r["s"]
            for r in df.select("word", v.alias("s")).collect()}
    assert rows["a" * 17] is None          # over the length cap
    assert rows["axz"] is None             # unreachable char
    assert rows["aa"]["np"] == 1 and rows["aa"]["pstr"] == SEP + "aa" + SEP


def _count_train_py(texts, iters=2, n_multi=48, keep_multi=24,
                    max_piece_len=MAX_PIECE_LEN, max_word_len=16):
    """Pure-Python replay of the full unigram_count_train loop."""
    from collections import Counter
    wc = Counter()
    for t in texts:
        for w in t.split():
            if w and all("!" <= ch <= "~" for ch in w):
                w = w.lower()
                if len(w) <= max_word_len:
                    wc[w] += 1
    cand = Counter()
    for w, c in wc.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                cand[w[i:i + l]] += c
    ranked = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = {p: s for k, (p, s) in enumerate(ranked)
             if len(p) == 1 or k < n_multi}
    for _ in range(iters):
        usage = Counter()
        for w, c in wc.items():
            seg = _mdl_viterbi_py(w, vocab, max_piece_len)
            if seg is None:
                continue
            for p in seg[2].split(SEP):
                if p:
                    usage[p] += c
        singles = [p for p in vocab if len(p) == 1]
        multis = sorted(((p, u) for p, u in usage.items() if len(p) > 1),
                        key=lambda kv: (-kv[1], kv[0]))[:keep_multi]
        vocab = {p: usage.get(p, 0) for p in singles}
        vocab.update(dict(multis))
    out = sorted(((p, s) for p, s in vocab.items() if len(p) > 1),
                 key=lambda kv: (-kv[1], kv[0]))
    return [(i + 1, p, s) for i, (p, s) in enumerate(out)]


def test_count_train_matches_python_replay(spark):
    rng = random.Random(77)
    base = ["the cat sat on the mat", "a fast hash join order by key",
            "sort merge join order", "the window sums the rows",
            "cat cat mat hash the the the"]
    texts = [" ".join(rng.choice(base).split()[rng.randint(0, 2):])
             for _ in range(60)] + base
    df = _docs(spark, texts)
    got = [(r["rank"], r["piece"], r["usage"])
           for r in unigram_count_train(df, iters=2).collect()]
    assert got == _count_train_py(texts, iters=2)


def test_count_train_deterministic(spark):
    df = _docs(spark, ["aab aab bba ccc aab", "bba ccc ccc"])
    a = [tuple(r) for r in unigram_count_train(df, iters=2).collect()]
    b = [tuple(r) for r in unigram_count_train(
        df.repartition(5), iters=2).collect()]
    assert a == b and len(a) > 0


def test_em_ll_nondecreasing_without_pruning(spark):
    df = _docs(spark, ["banana band an anna ban", "nab nanna banana an",
                       "band banana anna nab an an"])
    # vocab_size large enough that nothing is pruned: pure EM must not
    # decrease the Viterbi corpus log-likelihood
    logp, hist = unigram_train_em(df, vocab_size=10_000, iters=5,
                                  local=True)
    assert len(hist) == 5
    for a, b in zip(hist, hist[1:]):
        assert b >= a - 1e-9, hist
    assert sum(1 for p in logp if len(p) == 1) >= 3  # singles immortal


def test_em_local_vs_distributed(spark):
    texts = ["the cat sat on the mat mat", "a hash join order",
             "sort merge join the mat"] * 5
    df = _docs(spark, texts)
    l1, h1 = unigram_train_em(df, vocab_size=30, iters=3, local=True)
    l2, h2 = unigram_train_em(df, vocab_size=30, iters=3, local=False)
    assert set(l1) == set(l2)
    for p in l1:
        assert l1[p] == __import__("pytest").approx(l2[p], rel=1e-12)
    for a, b in zip(h1, h2):
        assert a == __import__("pytest").approx(b, rel=1e-12)


def test_em_prunes_to_vocab_size(spark):
    df = _docs(spark, ["abcabc bcabca cababab abcbca"] * 4)
    logp, _ = unigram_train_em(df, vocab_size=4, iters=6,
                               n_seed_multi=50, local=True)
    assert sum(1 for p in logp if len(p) > 1) <= 4
    assert all(c in logp for c in "abc")


def test_encode_round_trip_and_nulls(spark):
    df = _docs(spark, ["hello hello world " + "x" * 20])
    vocab = {c: 1 for c in "helowrdx"}
    vocab.update({"he": 10, "llo": 10, "wor": 10, "ld": 10})
    enc = unigram_encode(df, vocab)
    rows = {r["token"]: r for r in enc.collect()}
    assert rows["hello"]["pieces"] == ["he", "llo"]
    assert rows["world"]["pieces"] == ["wor", "ld"]
    assert rows["x" * 20]["pieces"] is None   # over the length cap
    # concatenating pieces reconstructs every segmentable token
    for tok, r in rows.items():
        if r["pieces"] is not None:
            assert "".join(r["pieces"]) == tok


def test_seed_pieces_counts(spark):
    df = _docs(spark, ["ab ab b"])
    words = word_types(df)
    got = {r["piece"]: r["score"] for r in seed_pieces(words).collect()}
    # "ab" x2 -> substrings a(2), b(2), ab(2); standalone "b" adds b(1)
    assert got == {"a": 2, "b": 3, "ab": 2}


def test_segment_types_usage_shape(spark):
    df = _docs(spark, ["aa aa a"])
    words = word_types(df)
    seg = segment_types(words, {"a": 1, "aa": 5})
    rows = {r["word"]: r for r in seg.collect()}
    assert rows["aa"]["np"] == 1 and rows["aa"]["score"] == 5
    assert pieces_of is not None and rows["a"]["pstr"] == SEP + "a" + SEP


def test_encode_via_types_equivalent(spark):
    df = _docs(spark, ["the cat sat on the mat", "a mat a cat a hat",
                       "the the the cat"])
    vocab = {c: 1 for c in "thecasonmt "} | {"th": 9, "at": 9, "ca": 5}
    vocab.pop(" ", None)
    a = unigram_encode(df, vocab, via_types=False)
    b = unigram_encode(df, vocab, via_types=True)
    ka = sorted((r["doc_id"], r["token"], tuple(r["pieces"] or ()),
                 r["np"]) for r in a.collect())
    kb = sorted((r["doc_id"], r["token"], tuple(r["pieces"] or ()),
                 r["np"]) for r in b.collect())
    assert ka == kb and len(ka) > 0
