"""Cross-engine (Spark vs DuckDB) hardening tests on HOSTILE text.

Round-7 driver runs hash-failed ``bpe_merges`` and ``quality_auc`` while
every local replay matched — i.e. the exact-oracle contract had
environment-sensitive seams.  These tests feed the nasty inputs that
activate each seam through BOTH engines and require bit-equality:

- ``\\x0B`` (vertical tab): inside Java's ``\\s`` but NOT RE2's — the
  reason every shared regex now spells the whitespace class out.
- astral-plane codepoints (surrogate pairs): ``split(s, '')`` is UTF-16
  code units on the JVM but codepoints in DuckDB.
- U+0130 / dotless-i / final sigma: full-vs-simple ``lower()`` case
  mappings differ across engines.
- unicode spaces (NBSP, NEL, ideographic): in NO engine's ``\\s`` — the
  pinned class keeps that explicit.
- near-tie logit sums: double accumulation is partition-order-dependent;
  the integer micro-logit must not be.
"""

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

NASTY_DOCS = [
    (0, "plain ascii words repeated ascii words"),
    (1, "tab\tand\x0Bvertical\x0Btab splits"),          # the \s seam
    (2, "astral \U0001F600\U0001D518 pair ascii"),      # surrogate pairs
    (3, "turkish İstanbul Iı dotless"),       # lower() seam
    (4, "greek Σigma final sigmaς end"),
    (5, "nbsp joined and thin and　ideographic"),
    (6, "nelline and combining á acute"),
    (7, "sep\x1fbyte and CONTROL\x01char"),
    (8, ""),                                            # empty doc
    (9, "  \x0B \t\n  "),                               # whitespace-only
    (10, "MIXED Case WORDS the and of to in"),
    (11, "the quick\x0Bthe quick the quick"),           # count ties
    # tokens ENDING in a line terminator: Java's default "$" matches
    # before a final NEL/LS/PS, RE2's does not -- the anchored
    # "^[!-~]+$" word gate KEPT these on the JVM and DROPPED them in
    # DuckDB (the round-7 bpe_merges driver hash-fail class); the
    # anchor-free negated-contains gate must drop them in BOTH engines
    (12, "nel-tail abc\u0085 mid"),
    (13, "ls-tail abc\u2028 ps-tail xyz\u2029 end"),
    (14, "crlf-ish tail\u0085\u2028 double"),
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    pdf = pd.DataFrame(NASTY_DOCS, columns=["doc_id", "text"])
    con.register("documents", pdf)
    yield con
    con.close()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(NASTY_DOCS, "doc_id LONG, text STRING")


def test_tokens_pinned_ws_class(spark, docs, ddb):
    """Token streams under the pinned class are identical per doc."""
    from carbonapi_spark.datapipe.text import tokens
    got = {r["doc_id"]: r["toks"] for r in docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")).collect()}
    want = {r[0]: r[1] for r in ddb.execute(r"""
        SELECT doc_id, list_filter(
            regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
            x -> x != '') FROM documents""").fetchall()}
    assert got == want


def test_bpe_word_counts_cross_engine(spark, docs, ddb):
    from carbonapi_spark.datapipe.bpe import word_counts
    got = {(r["word"], r["cnt"]) for r in word_counts(docs).collect()}
    want = set(ddb.execute(r"""
        SELECT lower(word) AS word, count(*) AS cnt
        FROM (SELECT unnest(list_filter(
                  regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'),
                  x -> x != '')) AS word FROM documents)
        WHERE regexp_matches(word, '^[!-~]+$') GROUP BY 1
        """).fetchall())
    assert got == want
    # the filter really dropped every non-ASCII type
    assert all(w.isascii() and w == w.lower() for w, _ in got)


def test_bpe_train_cross_engine(spark, docs, ddb):
    """Full training replay on the hostile corpus — the bpe_merges
    driver-row contract, off the happy-path corpus."""
    from carbonapi_spark.datapipe.bpe import bpe_train
    from carbonapi_spark.entry_queries import ORACLES  # noqa: F401
    from carbonapi_spark import entry_queries
    got = [tuple(r) for r in bpe_train(docs, n_merges=6).collect()]
    want = [tuple(r) for r in
            ddb.execute(entry_queries._bpe_oracle(6)).fetchall()]
    assert got == want


def test_quality_logit_micro_cross_engine(spark, docs, ddb):
    from carbonapi_spark.datapipe.text import quality_logit_micro
    from carbonapi_spark import entry_queries
    got = {(r["doc_id"], r["logit_micro"]) for r in quality_logit_micro(
        docs, entry_queries._LR_WEIGHTS, entry_queries._LR_BIAS).collect()}
    want = set(ddb.execute(
        "WITH " + entry_queries._lr_logit_ctes()
        + " SELECT doc_id, zm FROM __zm").fetchall())
    assert got == want


def test_quality_auc_partition_order_invariance(spark, docs):
    """The AUC ranking key must not depend on partitioning (the r07
    driver-vs-local divergence mode for a double-sum score)."""
    from carbonapi_spark.datapipe.text import quality_logit_micro, roc_auc
    from carbonapi_spark import entry_queries

    def auc_of(df):
        scored = quality_logit_micro(
            df, entry_queries._LR_WEIGHTS, entry_queries._LR_BIAS)
        labeled = scored.join(
            df.select("doc_id",
                      F.col("text").contains("the").cast("int")
                      .alias("__y")), "doc_id")
        return roc_auc(labeled, "logit_micro", "__y").collect()[0]

    base = auc_of(docs)
    for n in (1, 3, 7):
        assert auc_of(docs.repartition(n)) == base


def test_wordpiece_train_cross_engine(spark, docs, ddb):
    """WordPiece's likelihood-scored training replayed on the hostile
    corpus — the argmax rests on one IEEE division of exact counts."""
    from carbonapi_spark.datapipe.bpe import wordpiece_train
    from carbonapi_spark import entry_queries
    got = [tuple(r) for r in wordpiece_train(docs, n_merges=5).collect()]
    want = [tuple(r) for r in
            ddb.execute(entry_queries._wordpiece_oracle(5)).fetchall()]
    assert got == want and len(got) == 5


def test_bradley_terry_cross_engine_random_tables(spark):
    """The unrolled MM replay must be bit-equal on arbitrary match
    tables, not just the catalog's synthesis — the per-iteration 6-dp
    rounding is what keeps both engines on one trajectory, and this
    drives it over three random tournaments (including an undefeated
    item and an item pair that never met)."""
    import random

    from carbonapi_spark.datapipe.evals import bradley_terry
    from carbonapi_spark.entry_queries import _bt_oracle

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        items = list("ABCDEFG")
        rows = [tuple(rng.sample(items, 2)) for _ in range(200)]
        rows += [("A", x) for x in "BCDEFG"]   # help A stay strong
        sdf = spark.createDataFrame(rows, "winner string, loser string")
        got = {r["item"]: (r["wins"], r["strength"])
               for r in bradley_terry(sdf, n_iter=8).collect()}
        con = duckdb.connect()
        con.register("matches", pd.DataFrame(rows,
                                             columns=["winner", "loser"]))
        sql = _bt_oracle(
            n_iter=8, matches_sql="SELECT winner, loser FROM matches")
        want = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
        con.close()
        assert got == want, f"seed {seed}: {got} != {want}"


def test_replace_merge_equals_sequential_fold():
    """The oracle's ONE-replace merge step (wrapped-symbol encoding,
    entry_queries._merge_step_sql) must equal the sequential
    left-to-right non-overlapping fold (bpe._py_merge, itself
    property-pinned to the Spark fold) — including same-symbol runs
    ('a a a a a a' pairs greedily from the left) and merged-token
    boundaries (the merged symbol never re-matches as lhs or rhs).
    Drives randomized symbol tables plus the adversarial run shapes
    through DuckDB's replace()."""
    import random

    from carbonapi_spark.datapipe.bpe import _py_merge
    from carbonapi_spark.entry_queries import _merge_step_sql

    con = duckdb.connect()
    sep = "\x1f"

    def sql_merge(syms, left, right):
        wrapped = "".join(sep + s + sep for s in syms)
        # placeholder order in the rendered SQL: sym, lhs, rhs, lhs, rhs
        expr = _merge_step_sql("?", "?", "?")
        out = con.execute(f"SELECT {expr}",
                          [wrapped, left, right, left, right]
                          ).fetchone()[0]
        return [s for s in out.split(sep) if s != ""]

    cases = [
        (["a"] * 6, "a", "a"),
        (["a"] * 5, "a", "a"),
        (["a", "b"] * 4, "a", "b"),
        (["b", "a", "b", "a", "b"], "a", "b"),
        (["l", "l", "r"], "l", "r"),
        (["lr", "r", "l", "r"], "l", "r"),
        (["x"], "x", "x"),
        ([], "a", "b"),
    ]
    rng = random.Random(7)
    alphabet = ["a", "b", "ab", "ba", "aa"]
    for _ in range(200):
        syms = [rng.choice(alphabet) for _ in range(rng.randrange(0, 12))]
        left, right = rng.choice(alphabet), rng.choice(alphabet)
        cases.append((syms, left, right))
    for syms, left, right in cases:
        assert sql_merge(syms, left, right) == _py_merge(syms, left, right), \
            (syms, left, right)
    con.close()


def test_wordpiece_encode_cross_engine(spark, docs, ddb):
    """The recursive-CTE encode replay (r10: list_reduce purged) must
    reproduce Spark's greedy longest-match segmentation per word TYPE on
    the hostile corpus — training chain included."""
    from carbonapi_spark.datapipe.bpe import (_wp_pieces, word_counts,
                                              wordpiece_train)
    from carbonapi_spark import entry_queries

    vocab = [r["merged"]
             for r in wordpiece_train(docs, n_merges=4).collect()]
    types = word_counts(docs).select("word")
    got = {r["word"]: (r["segmentation"], r["n_pieces"]) for r in
           types.select("word", F.array_join(
               _wp_pieces(F.col("word"), vocab), " ").alias("segmentation"),
               F.size(_wp_pieces(F.col("word"), vocab)).cast("long")
               .alias("n_pieces")).collect()}
    want = {r[0]: (r[1], r[2]) for r in
            ddb.execute(entry_queries._wordpiece_encode_oracle(4)).fetchall()}
    assert got == want and len(got) > 0
