"""Property tests: the round-6 text/sampling operators vs pure-Python
references on randomized documents (the reference repo's table-driven +
randomized test style, SURVEY §5). Each example batches N docs into ONE
Spark job so hypothesis stays fast; xxhash64-gated ops replay the hash
with tools/xxh64_ref.py (validated byte-for-byte against Spark)."""

import math
import re
import sys

from hypothesis import given, settings, strategies as st

sys.path.insert(0, "/root/repo/tools")
from xxh64_ref import xxh64_signed  # noqa: E402

# words + punctuation + structure chars so every rule can fire
_WORDS = ["the", "of", "and", "to", "fox", "#", "...", "lorem", "ipsum",
          "{", "a", "verylongtokenindeed", "42", "-", "•", "x.", "done."]
_doc = st.lists(
    st.sampled_from(_WORDS + ["\n"]), min_size=0, max_size=60
).map(lambda ws: " ".join(ws).replace(" \n ", "\n"))
_docs = st.lists(_doc, min_size=1, max_size=8)


def _tokens(text):
    return [t for t in re.split(r"\s+", text) if t != ""]


def _py_gopher(text, min_words=3):
    toks = _tokens(text)
    n = len(toks)
    lines = text.split("\n")
    nl = len(lines)
    n_sym = (text.count("#")
             + (len(text) - len(text.replace("...", ""))) // 3)
    mean_wl = round(sum(len(t) for t in toks) / n, 6) if n else None
    sym = round(n_sym / n, 6) if n else None
    bullets = [l for l in lines
               if l.lstrip().startswith("•") or l.lstrip().startswith("- ")]
    bf = round(len(bullets) / nl, 6) if nl else None
    ells = [l for l in lines if l.rstrip().endswith("...")]
    ef = round(len(ells) / nl, 6) if nl else None
    alpha = [t for t in toks if re.search("[a-zA-Z]", t)]
    af = round(len(alpha) / n, 6) if n else None
    stops = {"the", "be", "to", "of", "and", "that", "have", "with"}
    sh = len(stops & {t.lower() for t in _tokens(text.lower())})
    keep = bool(
        n and min_words <= n <= 100_000
        and 3.0 <= mean_wl <= 10.0 and sym <= 0.1
        and bf <= 0.9 and ef <= 0.3 and af >= 0.8 and sh >= 2)
    return (n, mean_wl, sym, bf, ef, af, sh, keep)


@settings(max_examples=12, deadline=None)
@given(_docs)
def test_gopher_rules_matches_python(spark, texts):
    from carbonapi_spark.datapipe.text import gopher_rules
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["mean_word_len"],
                         r["symbol_ratio"], r["bullet_frac"],
                         r["ellipsis_frac"], r["alpha_frac"],
                         r["stop_hits"], r["keep"])
           for r in gopher_rules(df, min_words=3).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_gopher(t), (i, t)


def _py_c4(text, min_words_per_line=2, min_sentences=1):
    lines = text.split("\n")
    kept = [l for l in lines
            if l[-1:] in (".", "!", "?", '"', "'")
            and len(_tokens(l)) >= min_words_per_line
            and "javascript" not in l.lower()]
    kt = "\n".join(kept)
    n_sent = sum(kt.count(c) for c in ".!?")
    keep = bool("lorem ipsum" not in text.lower()
                and "{" not in text and n_sent >= min_sentences)
    return (kt, len(kept), n_sent, keep)


@settings(max_examples=12, deadline=None)
@given(_docs)
def test_c4_rules_matches_python(spark, texts):
    from carbonapi_spark.datapipe.text import c4_rules
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_sentences"],
                         r["keep"])
           for r in c4_rules(df, min_words_per_line=2,
                             min_sentences=1).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _py_c4(t), (i, t)


@settings(max_examples=10, deadline=None)
@given(_docs)
def test_hashed_vectors_match_xxh64_reference(spark, texts):
    from carbonapi_spark.datapipe.text import hashed_doc_vectors
    dim = 8
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: r["embedding"]
           for r in hashed_doc_vectors(df, dim=dim).collect()}
    for i, t in enumerate(texts):
        want = [0.0] * dim
        for tok in _tokens(t.lower()):
            h = xxh64_signed(tok)
            b = h % dim
            want[b] += 1.0 if ((h >> 33) & 1) == 0 else -1.0
        assert got[i] == want, (i, t)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.sampled_from(["en", "de", "fr"]), min_size=1,
                max_size=40),
       st.sampled_from([0.3, 0.5, 1.0]))
def test_temperature_mix_matches_gate_math(spark, langs, alpha):
    from carbonapi_spark.datapipe.sampling import temperature_mix
    rows = [(i, lang) for i, lang in enumerate(langs)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    kept = {r["doc_id"] for r in temperature_mix(df, alpha=alpha).collect()}
    counts: dict = {}
    for _, lang in rows:
        counts[lang] = counts.get(lang, 0) + 1
    nmin = min(counts.values())
    want = set()
    for i, lang in rows:
        thresh = round((counts[lang] / nmin) ** (alpha - 1.0) * 1_000_000)
        if xxh64_signed(str(i)) % 1_000_000 < thresh:
            want.add(i)
    assert kept == want


def _py_heavy(texts, threshold):
    from collections import Counter
    c = Counter(t for x in texts for t in _tokens(x.lower()))
    return {(w, n) for w, n in c.items() if n >= threshold}


@settings(max_examples=10, deadline=None)
@given(_docs, st.integers(min_value=1, max_value=6),
       st.sampled_from([2, 16, 2048]))
def test_heavy_hitters_matches_python(spark, texts, threshold, w):
    """CMS pruning is output-invisible at EVERY sketch width, including
    w=2 where nearly everything collides (pure over-count, no false
    negatives)."""
    from carbonapi_spark.datapipe.sketch import heavy_hitters
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {(r["term"], r["cnt"])
           for r in heavy_hitters(df, threshold=threshold, w=w).collect()}
    assert got == _py_heavy(texts, threshold)


def _py_norm(text):
    return re.sub(r"\s+", " ", re.sub(r"[^a-z0-9\s]", "", text.lower())).strip()


@settings(max_examples=10, deadline=None)
@given(_docs)
def test_normalized_dedup_matches_python(spark, texts):
    from collections import defaultdict

    from carbonapi_spark.datapipe.dedup import normalized_dedup
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    groups = defaultdict(list)
    for i, t in enumerate(texts):
        groups[_py_norm(t)].append(i)
    want = {(min(ids), len(ids)) for ids in groups.values()}
    got = {(r["keeper_id"], r["n_copies"])
           for r in normalized_dedup(df).collect()}
    assert got == want


@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=0, max_size=300),
       st.sampled_from([8000, 16000, 44100]))
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_property(samples, rate):
    """Any int16 sample vector survives the WAV container round trip."""
    from carbonapi_spark.datapipe.multimodal import decode_wav, encode_wav
    payload = encode_wav(samples, rate)
    assert len(payload) == 44 + 2 * len(samples)
    got_rate, got = decode_wav(payload)
    assert got_rate == rate and got.tolist() == samples


@given(st.integers(min_value=1, max_value=40),
       st.integers(min_value=1, max_value=30),
       st.booleans(), st.binary(min_size=0, max_size=3600))
@settings(max_examples=40, deadline=None)
def test_pnm_roundtrip_property(w, h, color, raw):
    """Any raster of the right length survives the PNM round trip."""
    from carbonapi_spark.datapipe.multimodal import decode_pnm, encode_pnm
    need = w * h * (3 if color else 1)
    raster = (raw * (need // max(len(raw), 1) + 1))[:need] if raw \
        else bytes(need)
    payload = encode_pnm(w, h, raster, color=color)
    gw, gh, gc, got = decode_pnm(payload)
    assert (gw, gh, gc) == (w, h, 3 if color else 1)
    assert got.tobytes() == raster


# ---------------------------------------------------------------- round 7


@given(st.dictionaries(st.sampled_from(["en", "de", "fr", "zh", "xx"]),
                       st.integers(1, 400), min_size=1, max_size=5),
       st.integers(1, 2000), st.integers(1, 3))
@settings(max_examples=12, deadline=None)
def test_unimax_closed_form_equals_greedy(spark, counts, budget, epochs):
    """The water-filling window closed form must equal the paper's
    greedy loop for arbitrary count tables, budgets, and epoch caps."""
    from carbonapi_spark.datapipe.sampling import unimax_allocation
    rows = [(j, g) for j, g in
            enumerate(g for g, n in counts.items() for _ in range(n))]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    got = {r["lang"]: r["alloc"] for r in
           unimax_allocation(df, budget=budget,
                             max_epochs=epochs).collect()}
    remaining = float(budget)
    langs = sorted(counts, key=lambda g: (counts[g], g))
    for i, g in enumerate(langs):
        share = remaining / (len(langs) - i)
        take = min(counts[g] * epochs, share)
        assert abs(got[g] - take) < 1e-4, (g, got[g], take)
        remaining -= take


@given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
                min_size=1, max_size=120),
       st.integers(1, 119))
@settings(max_examples=10, deadline=None)
def test_hll_shard_merge_lossless(spark, values, cut):
    """Max-merging the register tables of ANY split of the value list
    equals the whole-list register table — the mergeability invariant
    the 100 TB shard story rests on."""
    from pyspark.sql import functions as F

    from carbonapi_spark.datapipe.sketch import hll_registers
    cut = min(cut, len(values))
    lo = spark.createDataFrame([(v,) for v in values[:cut]] or [("",)],
                               "v string")
    hi = spark.createDataFrame([(v,) for v in values[cut:]] or [("",)],
                               "v string")
    whole = spark.createDataFrame([(v,) for v in values], "v string")
    parts = (hll_registers(lo.where(F.col("v") != ""), "v")
             .unionByName(hll_registers(hi.where(F.col("v") != ""), "v"))
             .groupBy("reg").agg(F.max("mrho").alias("mrho")))
    want = {(r["reg"], r["mrho"])
            for r in hll_registers(whole, "v").collect()}
    got = {(r["reg"], r["mrho"]) for r in parts.collect()}
    assert got == want


def _py_bpe_merge(symbols, left, right):
    out = []
    for s in symbols:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


@given(st.lists(st.text(alphabet="ab", min_size=1, max_size=4),
                min_size=1, max_size=10),
       st.text(alphabet="ab", min_size=1, max_size=3),
       st.text(alphabet="ab", min_size=1, max_size=3))
@settings(max_examples=12, deadline=None)
def test_bpe_fold_equals_python_reference(spark, word_toks, left, right):
    """The boundary-padded string fold must implement exactly the
    left-to-right non-overlapping merge, for arbitrary symbol runs and
    merge pairs (including self-pairs and pairs that straddle runs)."""
    from carbonapi_spark.datapipe.bpe import bpe_encode
    word = "".join(word_toks)
    df = spark.createDataFrame([(1, word)], "doc_id long, text string")
    got = list(bpe_encode(df, [(left, right)]).collect()[0]["pieces"])
    assert got == _py_bpe_merge(list(word), left, right), (word, left, right)


def _py_wordpiece(token, vocab):
    """Pure-Python greedy longest-match-first WordPiece reference."""
    out, pos = [], 0
    while pos < len(token):
        best = ""
        for v in vocab:
            if token.startswith(v, pos) and len(v) > len(best):
                best = v
        piece = best or token[pos]
        out.append(piece if pos == 0 else "##" + piece)
        pos += len(piece)
    return out


@given(st.text(alphabet="abc", min_size=1, max_size=12),
       st.lists(st.text(alphabet="abc", min_size=2, max_size=4),
                min_size=0, max_size=6))
@settings(max_examples=12, deadline=None)
def test_wordpiece_fold_equals_python_reference(spark, token, vocab):
    """The string-state fold must implement exactly greedy
    longest-match-first segmentation for arbitrary tokens and vocabs
    (including overlapping pieces, pieces longer than the remainder,
    and the empty vocab)."""
    from carbonapi_spark.datapipe.bpe import wordpiece_encode
    df = spark.createDataFrame([(1, token)], "doc_id long, text string")
    got = list(wordpiece_encode(df, vocab).collect()[0]["pieces"])
    assert got == _py_wordpiece(token, vocab), (token, vocab)


@given(st.lists(st.lists(st.floats(-100, 100, allow_nan=False,
                                   width=32),
                         min_size=4, max_size=4),
                min_size=2, max_size=8))
@settings(max_examples=10, deadline=None)
def test_sq8_quantization_error_bound(spark, vecs):
    """SQ8 dequantization error per coordinate is at most span/510
    (half a code step), and codes stay integral in [0, 255]."""
    from carbonapi_spark.datapipe.similarity import sq8_encode, sq8_ranges
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows,
                               "vec_id LONG, embedding ARRAY<DOUBLE>")
    ranges = sq8_ranges(df, dim=4)
    codes = {r["vec_id"]: r["codes"] for r in sq8_encode(df, ranges).collect()}
    for i, v in enumerate(vecs):
        for j, x in enumerate(v):
            c = codes[i][j]
            assert c == int(c) and 0 <= c <= 255
            mn, mx = ranges[j]
            dq = mn + c * (mx - mn) / 255.0
            tol = (mx - mn) / 510.0 + 1e-9
            assert abs(dq - float(x)) <= tol, (i, j, x, dq, tol)
