"""Suffix-array repeated-substring mining vs a sequential reference.

The reference replays the IDENTICAL algorithm (truncated-suffix sort,
adjacent LCP, run grouping) in plain Python, so outputs must match
EXACTLY — same contract as the BPE trainer's sequential pin. A
hand-built corpus additionally pins the headline semantics (a passage
pasted across docs at different offsets is found at its full length;
short repeats below min_len are not reported).
"""

from __future__ import annotations

import random

import pytest

from irstats2_spark.pipeline.suffix import (
    _sweep_input,
    exact_substring_coverage,
    repeated_substrings,
    repeated_substrings_incremental,
    suffix_windows,
    window_build_span,
    write_suffix_snapshot,
)


def _ref_pairs(texts: dict[int, list[str]], min_len: int, max_span: int):
    wins = sorted(
        (t[p : p + max_span], d, p)
        for d, t in texts.items()
        for p in range(len(t))
    )
    out = []
    for i in range(len(wins) - 1):
        a, b = wins[i][0], wins[i + 1][0]
        lcp = 0
        while lcp < min(len(a), len(b)) and a[lcp] == b[lcp]:
            lcp += 1
        if lcp >= min_len:
            out.append((i, wins[i], wins[i + 1], lcp))
    return out


def _ref_repeats(texts, min_len, min_count, max_span):
    """Sequential lcp-interval enumeration (histogram stack), the same
    algorithm the engine distributes."""
    wins = sorted(
        (t[p : p + max_span], d, p)
        for d, t in texts.items()
        for p in range(len(t))
    )
    qual = _ref_pairs(texts, min_len, max_span)
    intervals = []  # (lo, hi, depth) over suffix indices into wins
    stack, prev_i = [], None

    def flush(last):
        while stack:
            d, lo = stack.pop()
            intervals.append((lo, last, d))

    for i, _wa, _wb, lcp in qual:
        if prev_i is not None and i != prev_i + 1:
            flush(prev_i + 1)
        lo = i
        while stack and stack[-1][0] > lcp:
            d, slo = stack.pop()
            intervals.append((slo, i, d))
            lo = slo
        if not stack or stack[-1][0] < lcp:
            stack.append([lcp, lo])
        prev_i = i
    if prev_i is not None:
        flush(prev_i + 1)

    out = []
    for lo, hi, depth in intervals:
        members = [(wins[s][1], wins[s][2], wins[s][0]) for s in range(lo, hi + 1)]
        if len(members) < min_count:
            continue
        # left-maximality: doc-start occurrences are unique left contexts
        left = {
            ("t", texts[d][p - 1]) if p > 0 else ("s", d, p)
            for d, p, _ in members
        }
        if len(left) < 2:
            continue
        rep = min((d, p, tuple(w)) for d, p, w in members)
        text = " ".join(rep[2][:depth])
        out.append(
            (depth, len(members), len({d for d, _, _ in members}), text)
        )
    return sorted(out)


def _ref_coverage(texts, min_len, max_span):
    spans: dict[tuple[int, int], int] = {}
    for _, (wa, da, pa), (wb, db, pb), lcp in _ref_pairs(
        texts, min_len, max_span
    ):
        for d, p in ((da, pa), (db, pb)):
            spans[(d, p)] = max(spans.get((d, p), 0), lcp)
    cov = {}
    for d in texts:
        ivs = sorted(
            (p, p + s) for (dd, p), s in spans.items() if dd == d
        )
        total, end = 0, 0
        for lo, hi in ivs:
            total += max(0, hi - max(end, lo))
            end = max(end, hi)
        cov[d] = total
    return {
        d: (len(t), cov.get(d, 0), round(cov.get(d, 0) / len(t), 6) if t else 0.0)
        for d, t in texts.items()
    }


def _df(spark, texts):
    return spark.createDataFrame(
        [(d, " ".join(t)) for d, t in texts.items()], "doc_id long, text string"
    )


def test_cross_doc_passage_found_at_full_length(spark):
    passage = "one two three four five six seven eight nine ten".split()
    texts = {
        0: "intro words here".split() + passage + "tail zero".split(),
        1: "completely different offset prefix tokens".split() + passage,
        2: "unrelated content with no repeats at all whatsoever".split(),
    }
    got = repeated_substrings(
        _df(spark, texts), min_len=5, min_count=2, max_span=16
    ).collect()
    assert len(got) == 1
    row = got[0]
    assert row["repeat_len"] == len(passage)
    assert row["repeat_text"] == " ".join(passage)
    assert row["n_docs"] == 2 and row["n_occurrences"] == 2
    # below-threshold repeats (the 3-token 'intro words here' has no twin;
    # nothing shorter than min_len is reported)
    assert all(r["repeat_len"] >= 5 for r in got)


def test_matches_sequential_reference_on_random_corpora(spark):
    rng = random.Random(7)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for trial in range(3):
        texts = {
            d: [rng.choice(vocab) for _ in range(rng.randint(5, 40))]
            for d in range(6)
        }
        min_len, max_span = 3, 8
        got = sorted(
            (r["repeat_len"], r["n_occurrences"], r["n_docs"], r["repeat_text"])
            for r in repeated_substrings(
                _df(spark, texts), min_len=min_len, min_count=2,
                max_span=max_span,
            ).collect()
        )
        want = _ref_repeats(texts, min_len, 2, max_span)
        assert got == want, (trial, got, want)

        cov = {
            r["doc_id"]: (r["n_tokens"], r["covered_tokens"], r["dup_frac"])
            for r in exact_substring_coverage(
                _df(spark, texts), min_len=min_len, max_span=max_span
            ).collect()
        }
        assert cov == _ref_coverage(texts, min_len, max_span), (trial, cov)


def test_coverage_zero_without_repeats_and_full_on_clone(spark):
    texts = {
        0: "q w e r t y u i o p".split(),
        1: "q w e r t y u i o p".split(),  # exact clone of doc 0
        2: "z x c v b n m k j h".split(),
    }
    out = {
        r["doc_id"]: r
        for r in exact_substring_coverage(
            _df(spark, texts), min_len=4, max_span=16
        ).collect()
    }
    assert out[0]["dup_frac"] == 1.0 and out[1]["dup_frac"] == 1.0
    assert out[2]["covered_tokens"] == 0 and out[2]["dup_frac"] == 0.0


def test_nested_longer_repeat_reported_at_full_length(spark):
    """The review regression: A and B share a 10-token passage whose
    8-token prefix also opens a passage in C. BOTH repeats must come
    out — (len 10, count 2) and (len 8, count 3) — not one run-min row."""
    ten = "n1 n2 n3 n4 n5 n6 n7 n8 n9 n10".split()
    texts = {
        0: "lead0 x".split() + ten,
        1: "other lead tokens".split() + ten + ["tail1"],
        2: "c starts here".split() + ten[:8] + "y z".split(),
    }
    got = {
        (r["repeat_len"], r["n_occurrences"], r["n_docs"]): r["repeat_text"]
        for r in repeated_substrings(
            _df(spark, texts), min_len=8, min_count=2, max_span=16
        ).collect()
    }
    assert got[(10, 2, 2)] == " ".join(ten)
    assert got[(8, 3, 3)] == " ".join(ten[:8])
    assert len(got) == 2


def test_incremental_reports_only_new_involving_repeats(spark):
    """The nightly-batch twin: repeats wholly inside the snapshot are
    suppressed (earlier runs reported them); new-vs-snapshot and
    new-vs-new repeats come out, and agree exactly with the full miner
    over the union (modulo snapshot-only rows)."""
    shared = "s1 s2 s3 s4 s5 s6".split()
    old_dup = "o1 o2 o3 o4 o5 o6".split()  # repeats only within snapshot
    snap_texts = {
        0: old_dup + "a b".split(),
        1: "c d".split() + old_dup,
        2: "filler words only here".split() + shared,
    }
    new_texts = {
        10: "fresh prefix".split() + shared + ["fresh1"],  # new-vs-snapshot
        11: "nv1 nv2 nv3 nv4 nv5".split() + ["t11"],  # new-vs-new with 12
        12: "intro".split() + "nv1 nv2 nv3 nv4 nv5".split(),
    }
    snap = suffix_windows(_df(spark, snap_texts), max_span=12)
    got = {
        (r["repeat_len"], r["n_occurrences"], r["repeat_text"])
        for r in repeated_substrings_incremental(
            _df(spark, new_texts), snap, min_len=5, min_count=2, max_span=12
        ).collect()
    }
    assert (6, 2, " ".join(shared)) in got, got
    assert (5, 2, "nv1 nv2 nv3 nv4 nv5") in got, got
    assert not any(" ".join(old_dup).startswith(t) for _, _, t in got), got

    # exact agreement with the full miner over the union, minus rows
    # whose every occurrence lives in the snapshot
    union_rows = repeated_substrings(
        _df(spark, {**snap_texts, **new_texts}),
        min_len=5, min_count=2, max_span=12,
    ).collect()
    new_tok_sets = [set(t) for t in new_texts.values()]
    full = {
        (r["repeat_len"], r["n_occurrences"], r["repeat_text"])
        for r in union_rows
        # keep rows whose repeat occurs in some new doc (token-subset
        # check suffices for this corpus: vocabularies are disjoint)
        if any(set(r["repeat_text"].split()) <= s for s in new_tok_sets)
    }
    assert got == full, (got, full)


def test_shared_windows_param_matches_internal_build(spark):
    """The shingles= sharing idiom: passing a prebuilt suffix_windows
    table to both consumers must reproduce their internal-build output
    exactly."""
    texts = {
        0: "p q r s t u v p q r s t".split(),
        1: "z p q r s t y".split(),
    }
    df = _df(spark, texts)
    win = suffix_windows(df, max_span=8).localCheckpoint()
    for fn, kw in (
        (repeated_substrings, dict(min_len=3, min_count=2, max_span=8)),
        (exact_substring_coverage, dict(min_len=3, max_span=8)),
    ):
        own = sorted(map(tuple, fn(df, **kw).collect()))
        shared = sorted(map(tuple, fn(df, windows=win, **kw).collect()))
        assert own == shared, (fn.__name__, own, shared)


def test_min_count_filters_rare_runs(spark):
    passage = "p1 p2 p3 p4 p5 p6".split()
    texts = {
        0: passage + ["u0"],
        1: ["v0"] + passage,
        2: ["w0", "w1"] + passage,
    }
    df = _df(spark, texts)
    three = repeated_substrings(df, min_len=4, min_count=3, max_span=8).collect()
    assert len(three) == 1 and three[0]["n_occurrences"] == 3
    four = repeated_substrings(df, min_len=4, min_count=4, max_span=8).collect()
    assert four == []


def test_adjacent_rows_matches_self_join_across_buckets(spark):
    """r12: suffix-order adjacency via the bucketed lead window must
    produce exactly the pairs of the sa_idx self-join it replaced —
    including across bucket boundaries (a bucket's first row is
    duplicated into the previous bucket as the lead target) and at the
    array end (the last suffix pairs with nothing). Exercised with a
    tiny bucket width via monkeypatched _ADJ_BUCKET_BITS so boundaries
    actually occur, plus gaps in sa_idx (the incremental miner's
    only_touching_new filter upstream can never make gaps, but the
    guard must still only pair true successors)."""
    from pyspark.sql import functions as F

    from irstats2_spark.pipeline import suffix as sfx

    rows = [(i, f"v{i}") for i in range(0, 40) if i % 11 != 7]
    df = spark.createDataFrame(rows, "sa_idx long, val string").repartition(5)
    expect = sorted(
        (i, f"v{i}", f"v{i + 1}")
        for i, _ in rows
        if any(j == i + 1 for j, _ in rows)
    )
    old = sfx._ADJ_BUCKET_BITS
    sfx._ADJ_BUCKET_BITS = 3  # 8-row buckets: several boundaries in 40 rows
    try:
        got = sorted(
            (r["sa_idx"], r["val"], r["val_b"])
            for r in sfx._adjacent_rows(df, ["val"]).collect()
        )
    finally:
        sfx._ADJ_BUCKET_BITS = old
    assert got == expect
    # plan shape: one keyed window, no join, no SinglePartition exchange
    plan = (
        sfx._adjacent_rows(df, ["val"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert "SinglePartition" not in plan, plan


def test_dense_index_is_dense_ordered_and_scan_free(spark):
    """The shared rank idiom under both suffix_order and the sweep key:
    ranks must be exactly 0..n-1 in order-column order across many
    partitions, the lookup must be a broadcast JOIN (O(1) probe per
    row) — never a create_map literal whose GetMapValue linear-scans
    #partitions entries per row — and no Window may appear. Empty input
    must flow through (the dummy offsets row)."""
    from pyspark.sql import functions as F

    from irstats2_spark.pipeline.suffix import _dense_index

    perm = spark.range(0, 1000).select(((F.col("id") * 37) % 1000).alias("k"))
    out, pin = _dense_index(perm, ["k"], "rank", num_partitions=8)
    try:
        rows = out.orderBy("k").collect()
        assert [r["rank"] for r in rows] == list(range(1000))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan, plan
        assert "Window" not in plan and "map_keys" not in plan
    finally:
        pin.unpersist()
    empty = spark.range(0).select(F.col("id").alias("k"))
    out2, pin2 = _dense_index(empty, ["k"], "rank")
    try:
        assert out2.count() == 0
    finally:
        pin2.unpersist()


def test_sweep_runs_stretch_parallel(spark):
    """The r7-verdict `weak` fix (completed r9): the lcp-interval fold
    must NOT funnel through one partition. Contiguous pair stretches
    are independent (the stack drains at every sa_idx gap), so the
    stretch key must (a) keep each stretch whole within a partition and
    (b) spread distinct stretches across >1 partition — and (c, the r8
    residual) the key ASSIGNMENT itself must not run a single-task
    global pass: since r12 the rank comes from a BUCKET-keyed
    row_number window (sa_idx >> 16 buckets, size-bounded by
    construction) + collected per-bucket offsets, so the plan may
    contain keyed Window nodes but never a SinglePartition exchange
    (the signature of a global-ordered window)."""
    from pyspark.sql import functions as F

    # three stretches of qualifying pairs separated by sa_idx gaps
    rows = [(i, 5) for i in (0, 1, 2, 100, 101, 500, 501, 502, 503)]
    pairs = spark.createDataFrame(rows, "sa_idx long, lcp long")
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    pins = []
    try:
        swept, pins = _sweep_input(pairs)
        plan = swept._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan, plan  # no single-task rank pass
        got = (
            swept.withColumn("pid", F.spark_partition_id())
            .select("stretch", "pid")
            .collect()
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        for p in pins:
            p.unpersist()
    by_stretch: dict[int, set[int]] = {}
    for r in got:
        by_stretch.setdefault(r["stretch"], set()).add(r["pid"])
    assert len(by_stretch) == 3, by_stretch  # gaps-and-islands keying
    assert all(len(p) == 1 for p in by_stretch.values()), by_stretch
    assert len({p for s in by_stretch.values() for p in s}) > 1, by_stretch


def test_shared_windows_span_mismatch_raises(spark):
    """The span guard: a shared/stored window table built at a different
    max_span must fail loudly instead of silently capping LCPs, and a
    parquet round-trip must preserve the stamp (the stored-snapshot
    contract)."""
    texts = {0: "a b c d e f g h".split(), 1: "a b c d e f g h".split()}
    df = _df(spark, texts)
    win = suffix_windows(df, max_span=8)
    assert window_build_span(win) == 8
    for fn in (repeated_substrings, exact_substring_coverage):
        with pytest.raises(ValueError, match="max_span=8"):
            fn(df, min_len=3, max_span=12, windows=win)
    with pytest.raises(ValueError, match="max_span=8"):
        repeated_substrings_incremental(df, win, min_len=3, max_span=12)
    # a stamp-less table (e.g. hand-built) is rejected too; re-aliasing
    # keeps attribute metadata, so strip it via an explicit fresh schema
    naked = spark.createDataFrame(
        win.rdd, "doc_id long, pos int, w array<string>, prev string"
    )
    with pytest.raises(ValueError, match="no max_span metadata"):
        repeated_substrings(df, min_len=3, max_span=8, windows=naked)


def test_snapshot_parquet_roundtrip_preserves_span_and_results(spark, tmp_path):
    """write_suffix_snapshot -> read -> incremental must behave exactly
    like the in-session snapshot (span stamp survives the parquet
    footer; range-sorted storage changes layout only)."""
    snap_texts = {0: "s1 s2 s3 s4 s5 s6 x y".split(), 1: "p q r".split()}
    new_texts = {10: "lead s1 s2 s3 s4 s5 s6 tail".split()}
    win = suffix_windows(_df(spark, snap_texts), max_span=12)
    path = str(tmp_path / "snap")
    write_suffix_snapshot(win, path)
    stored = spark.read.parquet(path)
    assert window_build_span(stored) == 12
    live = {
        tuple(r)
        for r in repeated_substrings_incremental(
            _df(spark, new_texts), win, min_len=5, min_count=2, max_span=12
        ).collect()
    }
    from_store = {
        tuple(r)
        for r in repeated_substrings_incremental(
            _df(spark, new_texts), stored, min_len=5, min_count=2, max_span=12
        ).collect()
    }
    assert live == from_store and len(live) == 1


def test_repeated_substrings_matches_duckdb_oracle_at_sf001(spark):
    """INDEPENDENT correctness characterization (not the same-algorithm
    sequential reference): over the real sf0.01 documents table, the
    lcp-interval output must equal the declarative definition of a
    maximal repeat — an L-gram (min_len <= L <= max_span) occurring
    >= min_count times whose occurrences have >= 2 distinct left
    contexts AND >= 2 distinct right contexts (doc boundaries count as
    per-occurrence-unique; at L = max_span right-extension is truncated
    so the right check is waived). This is the oracle shape staged for
    the round-8 catalog registration."""
    from oracle_utils import SF_ORACLE, assert_matches_oracle

    from irstats2_spark.sources.testdata import load_table

    min_len, max_span = 6, 9
    # \p{L}\p{N} (not [a-z0-9]) so the oracle's tokenization matches
    # normalize_text on NON-ascii text too — this SQL is staged for the
    # round-8 gate, where a testdata regeneration must not desync it
    norm = (
        "trim(regexp_replace(regexp_replace(lower(text), "
        "'[^\\p{L}\\p{N}\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
    )
    sql = f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split({norm}, ' '), x -> length(x) > 0) AS t
      FROM documents
    ),
    grams AS (
      SELECT d.doc_id, l.L, p.p,
             array_to_string(d.t[p.p : p.p + l.L - 1], ' ') AS g,
             CASE WHEN p.p > 1 THEN 't:' || d.t[p.p - 1]
                  ELSE 's:' || d.doc_id || ':' || p.p END AS lctx,
             CASE WHEN p.p + l.L <= len(d.t) THEN 't:' || d.t[p.p + l.L]
                  ELSE 'e:' || d.doc_id || ':' || p.p END AS rctx
      FROM toks d,
           unnest(range({min_len}, {max_span} + 1)) AS l(L),
           unnest(range(1, len(d.t) - l.L + 2)) AS p(p)
    )
    SELECT md5(g) AS fp, CAST(L AS INT) AS repeat_len,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           g AS repeat_text
    FROM grams
    GROUP BY g, L
    HAVING COUNT(*) >= 2 AND COUNT(DISTINCT lctx) >= 2
       AND (L = {max_span} OR COUNT(DISTINCT rctx) >= 2)
    """
    got = repeated_substrings(
        load_table(spark, "documents", SF_ORACLE),
        min_len=min_len, min_count=2, max_span=max_span,
    )
    assert_matches_oracle(got, sql)


def _ref_remove(texts, L, keep_first=True):
    """Brute-force reference for remove_repeated_spans: duplicated
    L-gram classes, canonical keeper = min (doc_id, pos), removal index
    union, token rebuild."""
    occ: dict[tuple, list] = {}
    for d, t in texts.items():
        for p in range(len(t) - L + 1):
            occ.setdefault(tuple(t[p : p + L]), []).append((d, p))
    rm: dict[int, set] = {d: set() for d in texts}
    for members in occ.values():
        if len(members) < 2:
            continue
        keeper = min(members)
        for d, p in members:
            if keep_first and (d, p) == keeper:
                continue
            rm[d].update(range(p, p + L))
    return {
        d: (
            len(t),
            len(rm[d]),
            " ".join(tok for i, tok in enumerate(t) if i not in rm[d]),
        )
        for d, t in texts.items()
    }


def test_remove_repeated_spans_keeps_canonical_and_excises_copies(spark):
    from irstats2_spark.pipeline.suffix import remove_repeated_spans

    passage = "one two three four five six seven eight".split()
    texts = {
        0: "intro words".split() + passage + ["tail"],
        1: "other prefix here".split() + passage + "different tail words".split(),
        2: "nothing shared in this document at all".split(),
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["removed_tokens"], r["text_clean"])
        for r in remove_repeated_spans(_df(spark, texts), min_len=5).collect()
    }
    # doc 0 is canonical at every offset of the shared passage: untouched
    assert got[0] == (11, 0, " ".join(texts[0]))
    # doc 1 loses exactly the passage, keeps its own prose
    assert got[1] == (14, 8, "other prefix here different tail words")
    assert got[2][1] == 0
    # remove-all excises BOTH copies
    all_rm = {
        r["doc_id"]: r["removed_tokens"]
        for r in remove_repeated_spans(
            _df(spark, texts), min_len=5, keep_first=False
        ).collect()
    }
    assert all_rm[0] == 8 and all_rm[1] == 8 and all_rm[2] == 0


def test_remove_repeated_spans_matches_bruteforce_on_random_corpora(spark):
    from irstats2_spark.pipeline.suffix import remove_repeated_spans

    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for trial in range(3):
        texts = {
            d: [rng.choice(vocab) for _ in range(rng.randint(5, 40))]
            for d in range(6)
        }
        for keep_first in (True, False):
            got = {
                r["doc_id"]: (
                    r["n_tokens"],
                    r["removed_tokens"],
                    r["text_clean"],
                )
                for r in remove_repeated_spans(
                    _df(spark, texts), min_len=3, keep_first=keep_first
                ).collect()
            }
            assert got == _ref_remove(texts, 3, keep_first), (
                trial,
                keep_first,
                got,
            )


def test_remove_all_equals_coverage_at_span_eq_min_len(spark):
    """Cross-operator invariant: with max_span == min_len the coverage
    rollup's variable-length witness degenerates to duplicated
    min_len-grams — exactly remove-all's removal set — so
    covered_tokens == removed_tokens doc-by-doc, tying the SA-adjacency
    path and the gram-class path to each other on real data shapes."""
    from irstats2_spark.pipeline.suffix import remove_repeated_spans

    rng = random.Random(13)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = {
        d: [rng.choice(vocab) for _ in range(rng.randint(8, 50))]
        for d in range(8)
    }
    L = 4
    cov = {
        r["doc_id"]: r["covered_tokens"]
        for r in exact_substring_coverage(
            _df(spark, texts), min_len=L, max_span=L
        ).collect()
    }
    rm = {
        r["doc_id"]: r["removed_tokens"]
        for r in remove_repeated_spans(
            _df(spark, texts), min_len=L, keep_first=False
        ).collect()
    }
    assert cov == rm, (cov, rm)


def test_remove_incremental_matches_union_batch(spark, tmp_path):
    """Under ordered-disjoint ids (old < new), cleaning the new batch
    against the old corpus's gram snapshot must equal running the batch
    operator over old UNION new and keeping the new docs' rows — for
    keep-first; remove-all needs only disjointness. The snapshot's
    min_len stamp must survive parquet and mismatches must raise."""
    from irstats2_spark.pipeline.suffix import (
        remove_repeated_spans,
        remove_repeated_spans_incremental,
        write_gram_snapshot,
    )

    rng = random.Random(17)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = {
        d: [rng.choice(vocab) for _ in range(rng.randint(5, 40))]
        for d in range(10)
    }
    old = _df(spark, {d: t for d, t in texts.items() if d < 6})
    new = _df(spark, {d: t for d, t in texts.items() if d >= 6})
    path = str(tmp_path / "gram_snap")
    write_gram_snapshot(old, path, min_len=3)
    snap = spark.read.parquet(path)

    for keep_first in (True, False):
        want = {
            r["doc_id"]: (r["n_tokens"], r["removed_tokens"], r["text_clean"])
            for r in remove_repeated_spans(
                _df(spark, texts), min_len=3, keep_first=keep_first
            ).collect()
            if r["doc_id"] >= 6
        }
        got = {
            r["doc_id"]: (r["n_tokens"], r["removed_tokens"], r["text_clean"])
            for r in remove_repeated_spans_incremental(
                new, snap, min_len=3, keep_first=keep_first
            ).collect()
        }
        assert got == want, (keep_first, got, want)

    with pytest.raises(ValueError, match="min_len=3"):
        remove_repeated_spans_incremental(new, snap, min_len=4)

    # the occ= sharing path guards its build length the same way
    from irstats2_spark.pipeline.suffix import dup_gram_occurrences

    occ3 = dup_gram_occurrences(old, min_len=3)
    with pytest.raises(ValueError, match="min_len=3"):
        remove_repeated_spans(old, min_len=4, occ=occ3)


def test_merge_gram_snapshot_equals_full_rebuild(spark, tmp_path):
    """Snapshot maintenance: folding a batch into a stored snapshot
    must equal rebuilding from the whole corpus — exactly distinct
    across sides — with the min_len stamp surviving the merge (and a
    parquet round-trip), mismatched stamps raising, and the merged
    store driving the incremental cleaner identically to a rebuilt
    one."""
    from irstats2_spark.pipeline.suffix import (
        gram_snapshot,
        gram_snapshot_len,
        merge_gram_snapshot,
        remove_repeated_spans_incremental,
        write_gram_snapshot,
    )

    rng = random.Random(23)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = {
        d: [rng.choice(vocab) for _ in range(rng.randint(5, 40))]
        for d in range(12)
    }
    old = _df(spark, {d: t for d, t in texts.items() if d < 5})
    mid = _df(spark, {d: t for d, t in texts.items() if 5 <= d < 9})
    new = _df(spark, {d: t for d, t in texts.items() if d >= 9})

    path = str(tmp_path / "gram_snap")
    write_gram_snapshot(old, path, min_len=3)
    merged = merge_gram_snapshot(
        spark.read.parquet(path), mid, min_len=3
    )
    assert gram_snapshot_len(merged) == 3
    want = sorted(
        r["h"]
        for r in gram_snapshot(
            _df(spark, {d: t for d, t in texts.items() if d < 9}), min_len=3
        ).collect()
    )
    got = sorted(r["h"] for r in merged.collect())
    assert got == want and len(got) == len(set(got))

    with pytest.raises(ValueError, match="min_len=3"):
        merge_gram_snapshot(spark.read.parquet(path), mid, min_len=4)

    # a merged store cleans the next batch exactly like a rebuilt one
    rebuilt = remove_repeated_spans_incremental(new, gram_snapshot(
        _df(spark, {d: t for d, t in texts.items() if d < 9}), min_len=3
    ), min_len=3).collect()
    via_merge = remove_repeated_spans_incremental(
        new, merged, min_len=3
    ).collect()
    assert sorted(map(tuple, via_merge)) == sorted(map(tuple, rebuilt))


def test_removed_span_log_reconstructs_the_rewrite(spark):
    """The provenance log must agree exactly with the rewrite it
    documents: per doc, the logged intervals are sorted, disjoint,
    non-adjacent (merged), sum to removed_tokens, and manually excising
    them from the normalized tokens reproduces text_clean — so a
    consumer holding only (cleaned shards + log) can verify the dedup
    without re-running it. Remove-all mode and the occ= sharing guard
    are covered too."""
    from irstats2_spark.pipeline.suffix import (
        dup_gram_occurrences,
        remove_repeated_spans,
        removed_span_log,
    )

    rng = random.Random(41)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = {
        d: [rng.choice(vocab) for _ in range(rng.randint(5, 40))]
        for d in range(12)
    }
    df = _df(spark, texts)
    for keep_first in (True, False):
        rr = {
            r["doc_id"]: r
            for r in remove_repeated_spans(
                df, min_len=3, keep_first=keep_first
            ).collect()
        }
        log: dict[int, list[tuple[int, int, int]]] = {}
        for r in removed_span_log(
            df, min_len=3, keep_first=keep_first
        ).collect():
            log.setdefault(r["doc_id"], []).append(
                (r["s"], r["e"], r["n_removed"])
            )
        for d, toks in texts.items():
            ivs = sorted(log.get(d, []))
            assert all(e - s == n for s, e, n in ivs)
            assert all(  # merged: disjoint AND non-adjacent
                ivs[i][1] < ivs[i + 1][0] for i in range(len(ivs) - 1)
            )
            assert sum(n for _, _, n in ivs) == rr[d]["removed_tokens"]
            cut = set()
            for s, e, _ in ivs:
                cut.update(range(s, e))
            kept = " ".join(t for i, t in enumerate(toks) if i not in cut)
            assert kept == rr[d]["text_clean"], (d, ivs)

    occ3 = dup_gram_occurrences(df, min_len=3)
    with pytest.raises(ValueError, match="min_len=3"):
        removed_span_log(df, min_len=4, occ=occ3)


def test_merge_gram_snapshot_is_associative_and_order_free(spark):
    """Nightly folds must commute with how batches arrive: folding b1
    then b2 equals folding b2 then b1 equals one rebuild over
    everything — the property that lets operators replay missed nights
    in any order against the same store."""
    from irstats2_spark.pipeline.suffix import gram_snapshot, merge_gram_snapshot

    rng = random.Random(31)
    vocab = ["aa", "bb", "cc"]
    texts = {
        d: [rng.choice(vocab) for _ in range(rng.randint(3, 25))]
        for d in range(9)
    }
    base = _df(spark, {d: t for d, t in texts.items() if d < 3})
    b1 = _df(spark, {d: t for d, t in texts.items() if 3 <= d < 6})
    b2 = _df(spark, {d: t for d, t in texts.items() if d >= 6})
    s0 = gram_snapshot(base, min_len=2)
    onetwo = merge_gram_snapshot(merge_gram_snapshot(s0, b1, 2), b2, 2)
    twoone = merge_gram_snapshot(merge_gram_snapshot(s0, b2, 2), b1, 2)
    full = gram_snapshot(_df(spark, texts), min_len=2)
    a = sorted(r["h"] for r in onetwo.collect())
    b = sorted(r["h"] for r in twoone.collect())
    c = sorted(r["h"] for r in full.collect())
    assert a == b == c and len(a) == len(set(a))


def test_removal_quality_audit_converges(spark):
    """The audit's whole point: dup mass before > 0 on a corpus with a
    pasted passage, keep-one cut equals the per-doc removal sum, and
    the remeasured dup mass after cleaning is 0 here (no re-splice)."""
    from irstats2_spark.pipeline.suffix import (
        remove_repeated_spans,
        removal_quality_audit,
    )

    passage = "one two three four five six seven eight".split()
    texts = {
        0: "alpha beta".split() + passage,
        1: "gamma delta epsilon".split() + passage + ["zeta"],
        2: "totally unrelated words in this one here".split(),
    }
    row = removal_quality_audit(_df(spark, texts), min_len=5).collect()[0]
    assert row["n_docs"] == 3
    assert row["tokens_before"] == sum(len(t) for t in texts.values())
    assert row["dup_tokens_before"] == 16  # both copies of the passage
    assert row["tokens_removed"] == 8  # keep-one cuts the later copy
    assert row["dup_tokens_after"] == 0
    assert row["dup_frac_after"] == 0.0
    want_removed = sum(
        r["removed_tokens"]
        for r in remove_repeated_spans(_df(spark, texts), min_len=5).collect()
    )
    assert row["tokens_removed"] == want_removed


def test_interval_folds_match_reference_on_random_rows(spark):
    """merged_intervals + excised_tokens are the removal family's in-row
    JVM folds; fuzz them across 200 random (token array, interval set)
    rows in ONE job against a plain-Python interval-union reference —
    overlap, nesting, adjacency, doc-start/doc-end cuts, empty sets."""
    from pyspark.sql import functions as F

    from irstats2_spark.pipeline.suffix import excised_tokens, merged_intervals

    rng = random.Random(23)
    rows = []
    for i in range(200):
        n = rng.randint(0, 30)
        toks = [f"t{j}" for j in range(n)]
        ivs = []
        for _ in range(rng.randint(0, 8)):
            if n == 0:
                break
            s = rng.randint(0, n - 1)
            e = rng.randint(s + 1, min(n, s + rng.randint(1, 6)))
            ivs.append((s, e))
        rows.append((i, toks, sorted(ivs)))

    def ref(toks, ivs):
        rm = set()
        for s, e in ivs:
            rm.update(range(s, e))
        return [t for j, t in enumerate(toks) if j not in rm]

    df = spark.createDataFrame(
        rows, "row_id int, t array<string>, ivs array<struct<s:bigint,e:bigint>>"
    )
    got = {
        r["row_id"]: (r["merged"], r["kept"])
        for r in df.select(
            "row_id",
            merged_intervals(F.col("ivs")).alias("merged"),
            excised_tokens(F.col("t"), merged_intervals(F.col("ivs"))).alias(
                "kept"
            ),
        ).collect()
    }
    for i, toks, ivs in rows:
        merged, kept = got[i]
        # merged must be sorted, non-overlapping, covering the same set
        assert all(a["e"] < b["s"] for a, b in zip(merged, merged[1:])), (
            i, merged,
        )
        covered = set()
        for m in merged:
            covered.update(range(m["s"], m["e"]))
        want_cov = set()
        for s, e in ivs:
            want_cov.update(range(s, e))
        assert covered == want_cov, (i, merged, ivs)
        assert kept == ref(toks, ivs), (i, kept)
