"""Regression probes for the DuckDB list_reduce hazards that shaped the
streaming-replay oracles.

If a probe changes behavior on a driver-side DuckDB upgrade, any
remaining fold recipe must be re-audited — these tests pin the observed
semantics.

FOURTH HAZARD (r10, terminal for struct folds): a struct-accumulator
``list_reduce`` folding SEVERAL rows' lists in one query corrupted
state ACROSS rows — at sf0.001 the old stream_cusum_replay oracle gave
two different keys byte-identical flag lists despite different warmup
means, while each key folded alone was correct.  It did not reproduce
on synthetic in-memory data (same fold, same lengths — the trigger is
somewhere in the parquet-scan vector layout), so there is no minimal
probe here; the mitigation is structural: NO oracle folds structs over
multiple rows anymore (stream_cusum_replay and stream_anomaly_replay
replay their recurrences as recursive-CTE state walks, the BPE family
as replace() chains), and the remaining list_reduce uses are
scalar-accumulator folds (xxh64 packing, dot products) verified
bit-exact at sf0.001 AND sf0.01 by tools/check_oracles.py --strict."""

import duckdb


def test_struct_acc_mutates_sequentially():
    """Later struct_pack fields see ALREADY-UPDATED acc fields (the
    sequential-mutation model).  Our folds order fields so they are
    correct under this AND the all-from-old-acc model."""
    out = duckdb.sql("""
      SELECT list_reduce(
        [struct_pack(e := 10, probe := 0),
         struct_pack(e := 99, probe := 0)],
        (acc, r) -> struct_pack(e := acc.e + 1, probe := acc.e))
    """).fetchone()[0]
    # sequential mutation: probe reads e AFTER 'e := acc.e + 1' -> 11;
    # old-acc semantics would give 10.  Either way the engine must pick
    # one of the two; the oracle folds are written to be correct under
    # both, so we only assert the answer is one of them.
    assert out["probe"] in (10, 11)


def test_string_accumulator_fold_is_exact():
    """The packed-string accumulator (the BPE/anomaly fold type)
    replays a stateful integer recurrence exactly — including
    cross-field reads in the safe (fl, m, e, n) order."""
    rows = [(i, v) for i, v in enumerate([100, 220, 80, 500, 90, 505])]
    vals = ", ".join(
        f"struct_pack(oid := CAST({i} AS BIGINT), x := CAST({v} AS BIGINT),"
        f" fl := '', m := CAST(0 AS BIGINT), e := CAST(0 AS BIGINT),"
        f" n := CAST(0 AS BIGINT))" for i, v in rows)
    got = duckdb.sql(f"""
      SELECT list_reduce(
        list_prepend(struct_pack(oid := CAST(0 AS BIGINT),
                                 x := CAST(0 AS BIGINT), fl := '',
                                 m := CAST(0 AS BIGINT),
                                 e := CAST(0 AS BIGINT),
                                 n := CAST(0 AS BIGINT)),
                     [{vals}]),
        (acc, r) -> CASE WHEN acc.n = 0 THEN struct_pack(
            oid := r.oid, x := r.x, fl := acc.fl,
            m := CAST(0 AS BIGINT), e := r.x, n := CAST(1 AS BIGINT))
          ELSE struct_pack(
            oid := r.oid, x := r.x,
            fl := CASE WHEN acc.n >= 2 AND acc.m > 0
                            AND abs(r.x - acc.e) > 4 * acc.m
                       THEN acc.fl || CAST(r.oid AS VARCHAR) || ';'
                       ELSE acc.fl END,
            m := acc.m + (abs(r.x - acc.e) - acc.m) // 8,
            e := acc.e + (r.x - acc.e) // 8,
            n := acc.n + 1) END)
    """).fetchone()[0]

    def td(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    e = m = n = 0
    fl = ""
    for oid, x in rows:
        if n == 0:
            e, m, n = x, 0, 1
            continue
        dev = abs(x - e)
        if n >= 2 and m > 0 and dev > 4 * m:
            fl += f"{oid};"
        e += td(x - e, 8)
        m += td(dev - m, 8)
        n += 1
    assert (got["e"], got["m"], got["n"], got["fl"]) == (e, m, n, fl)
    assert fl  # the synthetic series must actually flag something


def test_trunc_division_convention_matches():
    """DuckDB // truncates toward zero for BIGINT — the same as
    Spark's div; Python's // floors and must NOT be used directly."""
    assert duckdb.sql(
        "SELECT CAST(-15 AS BIGINT) // CAST(8 AS BIGINT)").fetchone()[0] == -1
    assert (-15) // 8 == -2  # python floors: the documented trap


def test_coupled_fields_must_be_packed():
    """Third hazard (found by stream_cusum): two struct fields COUPLED
    through a shared condition cannot be updated separately — under
    sequential mutation the second field re-evaluates the condition
    against the first field's NEW value.  The fix is packing the
    coupled pair into one atomically-updated field; this probe pins the
    behavior that motivates it."""
    out = duckdb.sql("""
      SELECT list_reduce(
        [struct_pack(a := 1, b := 1, x := 0),
         struct_pack(a := 0, b := 0, x := 5)],
        (acc, r) -> struct_pack(
            a := CASE WHEN acc.a + acc.b > 1 THEN 0 ELSE acc.a + r.x END,
            b := CASE WHEN acc.a + acc.b > 1 THEN 0 ELSE acc.b + r.x END,
            x := r.x))
    """).fetchone()[0]
    # old-acc semantics: condition 1+1>1 true for BOTH -> (0, 0).
    # sequential mutation: a := 0 first, then b's condition re-reads
    # a=0 -> 0+1>1 false -> b := 1+5 = 6.  Either way the engine picked
    # one; the packed-field recipe is correct under both.
    assert (out["a"], out["b"]) in ((0, 0), (0, 6))
