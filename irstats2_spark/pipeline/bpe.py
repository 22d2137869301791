"""Distributed BPE tokenizer training (Sennrich et al. 2016) and
segmentation — the tokenizer-fitting stage of a pretraining pipeline,
expressed Spark-first.

The classic in-memory trainer keeps a word->symbols dict and a pair-count
heap; the distributed shape here is the standard factoring:

1. **Corpus compression**: one groupBy collapses the corpus to its WORD
   FREQUENCY table (word, freq). Every later iteration runs on that
   vocab-sized table — at 100 TB of text the vocab is millions-to-
   hundreds-of-millions of rows, so it stays a DataFrame (never a
   driver-side dict).
2. **Per merge**: adjacent-pair counts are ONE groupBy over the exploded
   symbol pairs (map-side combine; freq-weighted so a word counts once
   per occurrence); the argmax pair is a 1-row TakeOrdered collect —
   small-by-contract, the same pattern as the k-means centroid collect.
   The merge itself is a pure column-expression fold applied map-side to
   the symbol arrays; no shuffle.
3. **Lineage control**: the symbol table is cache()d per iteration and
   the previous cache dropped, so iteration i never re-derives i-1; for
   hundreds of merges, checkpoint to storage every ~32 rounds instead.

Greedy left-to-right non-overlapping merge semantics match the reference
algorithm: within one pass a just-merged symbol never participates in a
second merge ("aaaa" + (a,a) -> [aa, aa], not [aa, a, a]).

No reference-engine counterpart (the reference has no tokenizer); cited
as a beyond-reference training-data operator per SURVEY.md §7.1-10.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus word-frequency table: (word, freq), the BPE working set."""
    from irstats2_spark.pipeline.textstats import tokens

    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def symbolize(word: Column) -> Column:
    """Initial symbol sequence of a word: its characters plus the
    end-of-word marker (so word-final merges differ from word-internal
    ones, as in the reference algorithm)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )
    return F.concat(chars, F.array(F.lit(END_OF_WORD)))


def pair_counts(sym_words: DataFrame) -> DataFrame:
    """Freq-weighted adjacent-pair counts over (freq, symbols) rows:
    (left_sym, right_sym, pair_count). One exploding projection + one
    groupBy with map-side combine; the shuffle carries symbol pairs and
    long partials, never documents."""
    n = F.size("symbols")
    zipped = F.arrays_zip(
        F.slice(F.col("symbols"), 1, n - 1).alias("left_sym"),
        F.slice(F.col("symbols"), 2, n - 1).alias("right_sym"),
    )
    return (
        sym_words.filter(n >= 2)
        .select("freq", F.explode(zipped).alias("p"))
        .groupBy(
            F.col("p.left_sym").alias("left_sym"),
            F.col("p.right_sym").alias("right_sym"),
        )
        .agg(F.sum("freq").alias("pair_count"))
    )


def merge_pair_expr(symbols: Column, left: str, right: str) -> Column:
    """Column expression applying ONE merge (left,right)->left+right to a
    symbol array, greedy left-to-right non-overlapping — the exact
    reference semantics, as a JVM-side fold (no UDF).

    The fold appends each symbol unless the accumulator's last element
    is ``left``, the current is ``right``, AND the last element was not
    itself produced by a merge in this pass (tracked by folding structs
    of (sym, fresh) — without the flag, "aaa" + (a,a) would merge the
    just-created "aa"'s trailing "a" again when left==right+right...
    the flag makes non-overlap explicit rather than accidental)."""
    merged = left + right
    start = F.array().cast("array<struct<sym:string,fresh:boolean>>")

    def step(acc, x):
        # try_: NULL (not an ANSI error) on the empty initial accumulator
        last = F.try_element_at(acc, F.lit(-1))
        can_merge = (
            last.isNotNull()
            & (last["sym"] == left)
            & ~last["fresh"]
            & (x == right)
        )
        head = F.slice(acc, 1, F.size(acc) - 1)
        return F.when(
            can_merge,
            F.concat(
                head,
                F.array(
                    F.struct(
                        F.lit(merged).alias("sym"), F.lit(True).alias("fresh")
                    )
                ),
            ),
        ).otherwise(
            F.concat(
                acc,
                F.array(F.struct(x.alias("sym"), F.lit(False).alias("fresh"))),
            )
        )

    folded = F.aggregate(symbols, start, step)
    return F.transform(folded, lambda s: s["sym"])


def bpe_train(
    docs: DataFrame,
    n_merges: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus. Returns a TINY
    (n_merges-row) DataFrame (merge_rank, left_sym, right_sym,
    pair_count), rank 0 first — the artifact ``bpe_segment`` consumes.
    Ties break by (left_sym, right_sym) ascending, so training is
    deterministic across partitionings and engines.

    Stops early if no pair occurs at least twice (merging singletons is
    pointless and the reference trainer stops there too).

    SCALE CONTRACT: each merge is one distributed groupBy + a 1-row
    collect, i.e. one Spark job per merge — exact and auditable for the
    few-dozen-merge regime this function targets, but NOT the plan for
    a production 32k-merge vocab (32k sequential jobs). For realistic
    vocab sizes use ``bpe_train_sampled`` below: one distributed
    word-table pass, a driver-side merge loop over a size-bounded
    deterministic head of it, and ``bpe_merge_usage`` as the
    distributed full-corpus audit — identical semantics, pytest-pinned
    equal on a covering sample."""
    spark = docs.sparkSession
    words = word_table(docs, text_col)
    sym = words.select("freq", symbolize(F.col("word")).alias("symbols"))
    sym = sym.cache()
    merges: list[tuple[int, str, str, int]] = []
    prev = sym
    try:
        for rank in range(n_merges):
            top = (
                pair_counts(sym)
                .orderBy(
                    F.col("pair_count").desc(),
                    F.col("left_sym").asc(),
                    F.col("right_sym").asc(),
                )
                .limit(1)
                .collect()  # 1 row by contract (the k-means-centroid pattern)
            )
            if not top or top[0].pair_count < 2:
                break
            left, right = top[0].left_sym, top[0].right_sym
            merges.append((rank, left, right, top[0].pair_count))
            new_sym = sym.select(
                "freq", merge_pair_expr(F.col("symbols"), left, right).alias("symbols")
            ).cache()
            if prev is not sym:
                prev.unpersist()
            prev, sym = sym, new_sym
    finally:
        if prev is not sym:
            prev.unpersist()
        sym.unpersist()
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, pair_count bigint",
    )


def bpe_segment(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a learned merge table: apply the merges in
    rank order to every word's symbol sequence, map-side. Output:
    (doc_id, n_words, n_tokens, tokens) where ``tokens`` is the
    flattened sub-word sequence of the document.

    The merge table is collected to the driver (n_merges rows — tiny by
    contract) and baked into the column expression: segmentation is then
    a zero-shuffle map over the corpus, exactly what a 1000-executor
    tokenization pass wants. Expression depth grows linearly with
    n_merges; past a few hundred merges switch to a pandas-UDF
    segmenter — the training artifact is identical either way."""
    ranked = sorted(
        merges.collect(), key=lambda r: r.merge_rank
    )  # tiny by contract
    from irstats2_spark.pipeline.textstats import tokens

    def segment_word(word: Column) -> Column:
        sym = symbolize(word)
        for r in ranked:
            sym = merge_pair_expr(sym, r.left_sym, r.right_sym)
        return sym

    return docs.select(
        F.col(id_col).alias("doc_id"),
        tokens(F.col(text_col)).alias("__words"),
    ).select(
        "doc_id",
        F.size("__words").alias("n_words"),
        F.flatten(F.transform(F.col("__words"), segment_word)).alias("tokens"),
    ).select(
        "doc_id",
        "n_words",
        F.size("tokens").alias("n_tokens"),
        "tokens",
    )


def bpe_train_sampled(
    docs: DataFrame,
    n_merges: int = 16,
    sample_words: int = 200_000,
    text_col: str = "text",
) -> DataFrame:
    """BPE training for REALISTIC vocab sizes (32k+ merges): bound the
    working set, not the merge loop.

    ``bpe_train`` above runs one distributed pair-count groupBy plus a
    1-row collect PER MERGE — exact, and the right shape for a few
    dozen merges, but a production 32k-merge vocab would mean 32k
    sequential Spark jobs: not a 100 TB plan. The standard production
    factoring (SentencePiece and HF tokenizers train the same way):

    1. ONE distributed pass compresses the corpus to its word-frequency
       table — the only stage that reads the 100 TB;
    2. a deterministic size-bounded head of that table — the top
       ``sample_words`` words by (freq DESC, word ASC) — is collected.
       Word frequencies are zipfian, so the head carries virtually all
       pair mass and truncation barely moves the learned merges (the
       pytest pins: sample >= vocab reproduces ``bpe_train`` exactly);
    3. the classic in-memory merge loop runs DRIVER-side over the
       sampled table: n_merges pure-python iterations, zero Spark jobs
       — microseconds per merge at a bounded vocab, so 32k merges are
       seconds, not hours;
    4. ``bpe_merge_usage`` below is the distributed audit: one
       segmentation pass scoring the learned table against the FULL
       corpus.

    Semantics are identical to ``bpe_train`` by construction: same
    freq-weighted adjacent-pair counts, same (count DESC, left ASC,
    right ASC) tie-break, same greedy non-overlapping merge application,
    same stop-below-pair-count-2 rule. Output schema matches
    ``bpe_train`` so ``bpe_segment`` consumes either artifact."""
    spark = docs.sparkSession
    head = (
        word_table(docs, text_col)
        .orderBy(F.col("freq").desc(), F.col("word").asc())
        .limit(sample_words)
        .collect()
    )
    sym: dict[str, tuple] = {
        r.word: tuple(list(r.word) + [END_OF_WORD]) for r in head
    }
    freq = {r.word: r.freq for r in head}
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        counts: dict[tuple, int] = {}
        for w, f in freq.items():
            s = sym[w]
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        top = max(counts.values())
        left, right = min(p for p, c in counts.items() if c == top)
        if top < 2:
            break
        merges.append((rank, left, right, top))
        for w, s in sym.items():
            out: list = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(left + right)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            sym[w] = tuple(out)
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, pair_count bigint",
    )


def bpe_merge_usage(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Distributed audit of a learned merge table against the FULL
    corpus, in ONE pass: segment every document with the table
    (zero-shuffle map, the ``bpe_segment`` expression) and count how
    often each merge's output symbol survives in the final token stream
    — the coverage check that a sample-trained vocab (``
    bpe_train_sampled``) is actually used at corpus scale. A merged
    symbol swallowed entirely by later merges (its uses folded into a
    longer token) legitimately reports 0 final uses.

    Output: (merge_rank, left_sym, right_sym, merged_sym, corpus_uses),
    one row per learned merge — corpus_uses is the full-corpus count of
    the merged symbol among final tokens."""
    ranked = sorted(merges.collect(), key=lambda r: r.merge_rank)  # tiny
    from irstats2_spark.pipeline.textstats import tokens

    def segment_word(word: Column) -> Column:
        s = symbolize(word)
        for r in ranked:
            s = merge_pair_expr(s, r.left_sym, r.right_sym)
        return s

    toks = docs.select(
        F.explode(
            F.flatten(
                F.transform(tokens(F.col(text_col)), segment_word)
            )
        ).alias("tok")
    )
    uses = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("corpus_uses"))
    table = merges.sparkSession.createDataFrame(
        [
            (r.merge_rank, r.left_sym, r.right_sym, r.left_sym + r.right_sym)
            for r in ranked
        ],
        "merge_rank int, left_sym string, right_sym string, merged_sym string",
    )
    return (
        table.join(
            F.broadcast(uses.withColumnRenamed("tok", "merged_sym")),
            "merged_sym",
            "left",
        )
        .select(
            "merge_rank",
            "left_sym",
            "right_sym",
            "merged_sym",
            F.coalesce("corpus_uses", F.lit(0)).cast("long").alias("corpus_uses"),
        )
    )
