"""End-to-end corpus curation: the composition layer of the training-data
pipeline — quality gate -> exact-dedup keeper selection -> deterministic
split assignment — as one declarative DataFrame chain.

Plan shape at scale (the whole point of composing these map/shuffle
primitives declaratively):

- the quality gate is a pure column-expression filter fused into the
  scan stage (no shuffle, pushdown-friendly);
- keeper selection is ONE full-row shuffle: a min-over-window keyed by
  md5(text). The alternative (aggregate keeper ids, semi-join back)
  costs a small shuffle PLUS a full-row join shuffle, so the window
  formulation strictly wins;
- split assignment is map-side hash arithmetic (sampling.split_assign);
- the final summary is an ordinary partial-aggregated groupBy.
Net: one shuffle before the summary, everything else scan-fused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from irstats2_spark.pipeline.lifecycle import release_after
from irstats2_spark.pipeline.sampling import split_assign
from irstats2_spark.pipeline.textstats import LANG_MARKERS, tokens


def curate_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.6,
    splits: dict[str, float] | None = None,
) -> DataFrame:
    """Quality-gate, dedup, and split a document corpus.

    Returns the curated rows (exact-dup keepers only, quality passed)
    with ``n_tokens`` and ``split`` columns added."""
    text = F.col(text_col)
    # tokenize once per row; re-inlining the chain per feature re-runs it
    toks = F.col("__toks")
    n_stop = F.size(F.filter(toks, lambda w: w.isin(LANG_MARKERS["en"])))
    gated = (
        docs.withColumn("__toks", tokens(text))
        .withColumn("n_tokens", F.size(toks))
        .filter(
            (F.col("n_tokens") >= min_tokens)
            & ((n_stop / F.col("n_tokens")) <= max_stopword_ratio)
        )
        .drop("__toks")
    )
    keeper = F.min(id_col).over(Window.partitionBy(F.md5(text)))
    curated = (
        gated.withColumn("__keeper", keeper)
        .filter(F.col(id_col) == F.col("__keeper"))
        .drop("__keeper")
    )
    return split_assign(curated, id_col, splits)


def pretrain_corpus(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.6,
    tau: float = 0.1,
    k: int = 3,
    source_cap: float = 15.0,
    budget: int = 1024,
    splits: dict[str, float] | None = None,
    materialize: bool = False,
) -> DataFrame:
    """The full pretraining-data chain as ONE composition:

        curate (quality gate -> exact-dedup keepers -> split)
        -> decontaminate (drop docs leaking >= tau of their k-grams
           into the benchmark/eval set)
        -> mix (cap every source at ~``source_cap`` expected train docs
           via computed rates — broadcast join + map-side filter)
        -> pack (deterministic shuffle + greedy packing of the train
           split into ``budget``-token sequences)

    This is the LLM-data analog of the access-log silver pipeline
    (etl.processors): each stage is individually gated, but the
    composition is where their contracts actually meet — curate's
    ``n_tokens`` is the size pack bills against, decontaminate must
    preserve curate's split/keeper decisions, and mix's rates are
    computed from the decontaminated (not raw) corpus.

    Plan shape at scale: curate's one full-row shuffle (keeper window),
    decontaminate's broadcast shingle probe + id-only rollup, mix's
    broadcast rates join, pack's bucketed two-phase prefix sum — the
    corpus text crosses an exchange exactly once (the keeper window);
    every later stage shuffles ids/counts or nothing.

    Output: one row per packed train doc —
    (doc_id, source, n_tokens, seq_id).
    """
    from irstats2_spark.pipeline.contamination import decontaminate
    from irstats2_spark.pipeline.sampling import pack_sequences, sample_by_rates

    curated = curate_corpus(
        docs, text_col, id_col, min_tokens, max_stopword_ratio, splits
    )
    decon = decontaminate(
        curated, benchmark, tau=tau, k=k, text_col=text_col, id_col=id_col
    )
    # consumed twice (mix rates + the rate-sampled output): persist so the
    # second consumer doesn't re-run curate+decontaminate (same pattern as
    # select_corpus's kept set); the ``materialize`` contract
    # (pipeline.lifecycle) decides who releases the pin
    train = decon.filter(F.col("split") == "train").persist()
    rates = train.groupBy(source_col).agg(
        F.least(F.lit(1.0), F.lit(source_cap) / F.count(F.lit(1))).alias("rate")
    )
    mixed = sample_by_rates(train, rates, source_col, id_col)
    packed = pack_sequences(mixed, F.col("n_tokens"), id_col, budget=budget)
    return release_after(
        packed.select(id_col, source_col, "n_tokens", "seq_id"),
        [train],
        materialize,
    )


def curation_summary(curated: DataFrame, lang_col: str = "lang") -> DataFrame:
    """Per (split, stratum) doc and token counts — the corpus report a
    training run starts from."""
    return curated.groupBy("split", F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def curate_corpus_neardup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.6,
    lsh_threshold: float = 0.5,
    splits: dict[str, float] | None = None,
) -> DataFrame:
    """curate_corpus with NEAR-dup collapse: after the quality gate and
    exact-dup keeper pass, LSH-verified near-dup pairs are clustered
    (connected components) and only each cluster's min-id keeper
    survives — the full C4/RefinedWeb-style curation chain.

    Plan shape: the exact pass is curate_corpus (one full-row shuffle);
    the near-dup pass adds the one-shuffle LSH chain over the already-
    curated survivors plus the label-propagation rounds, all sized by
    the near-dup pair set, never the corpus. Exact dedup running FIRST
    matters at scale: true duplicates never reach LSH, so boilerplate
    collision sets stay small (see _band_candidates).
    """
    from irstats2_spark.pipeline.dedup import connected_components, minhash_lsh_dedup

    exact = curate_corpus(
        docs, text_col, id_col, min_tokens, max_stopword_ratio, splits
    )
    exact = exact.localCheckpoint()  # reused: LSH source + final anti-join
    pairs = minhash_lsh_dedup(
        exact, text_col=text_col, id_col=id_col, threshold=lsh_threshold
    )
    comp = connected_components(pairs)
    drop = comp.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return exact.join(
        F.broadcast(drop.withColumnRenamed("doc_id", id_col)), id_col, "left_anti"
    )


def source_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    min_tokens: int = 5,
    max_stopword_ratio: float = 0.6,
) -> DataFrame:
    """Per-source curation dashboard: the numbers a rate table
    (``sampling.sample_by_rates``) is actually derived from when
    deciding how to mix a multi-source corpus.

    Per source: n_docs, n_quality_fail (docs the gate would drop),
    n_dups (docs that are NOT the global exact-dup keeper — cross-source
    duplicates count against the later source, mirroring who
    ``curate_corpus`` would drop), total/mean tokens, corpus-level
    stopword ratio, dup rate.

    Engine-exact means: every ratio is a quotient of exact INTEGER sums
    (token/stop/flag counts), one double division at the end — never a
    sum of per-row doubles, so summation order cannot flip a value.

    Plan: one full-row window shuffle keyed md5(text) for keeper
    identity (the same single-shuffle idiom as ``curate_corpus``), then
    a partial-aggregated groupBy(source) with a |sources|-row reduce
    side."""
    text = F.col(text_col)
    base = (
        docs.withColumn("__toks", tokens(text))
        .withColumn("n_tokens", F.size(F.col("__toks")))
        .withColumn(
            "n_stop",
            F.size(F.filter(F.col("__toks"), lambda w: w.isin(LANG_MARKERS["en"]))),
        )
        .drop("__toks")
    )
    keeper = F.min(id_col).over(Window.partitionBy(F.md5(text)))
    flagged = base.withColumn(
        "is_dup", (F.col(id_col) != keeper).cast("int")
    ).withColumn(
        "q_fail",
        F.when(F.col("n_tokens") < min_tokens, F.lit(1))
        .otherwise(
            (
                (F.col("n_stop") / F.col("n_tokens")) > max_stopword_ratio
            ).cast("int")
        ),
    )
    return flagged.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("q_fail").alias("n_quality_fail"),
        F.sum("is_dup").alias("n_dups"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.sum("n_tokens") / F.count(F.lit(1)), 6).alias("mean_tokens"),
        F.round(
            F.try_divide(F.sum("n_stop"), F.sum("n_tokens")), 6
        ).alias("stop_ratio"),
        F.round(F.sum("is_dup") / F.count(F.lit(1)), 6).alias("dup_rate"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Dataset versioning audit between two corpus snapshots: per doc id,
    ``added`` (new only), ``removed`` (old only), ``changed`` (both,
    different content hash), ``unchanged``. The release-to-release diff
    a training-data pipeline publishes alongside a new corpus cut.

    Plan: both sides reduce to (id, md5(text)) map-side — the full-outer
    join shuffles hashes, never document bodies — and the status is a
    pure projection. At 100 TB this is two columnar scans plus one
    id-keyed shuffle of 48-byte rows."""
    o = old.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("__old_h")
    )
    n = new.select(
        F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("__new_h")
    )
    return (
        o.join(n, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.when(F.col("__old_h").isNull(), F.lit("added"))
            .when(F.col("__new_h").isNull(), F.lit("removed"))
            .when(F.col("__old_h") != F.col("__new_h"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("status"),
        )
    )


def select_corpus(
    docs: DataFrame,
    target: DataFrame,
    reference: DataFrame,
    frac: float = 0.5,
    mix_alpha: float = 0.5,
    mix_total: float = 100.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    materialize: bool = False,
) -> DataFrame:
    """Model-based data SELECTION as one composition — the learned-score
    counterpart of ``pretrain_corpus``'s rule-based chain:

        score: per-TOKEN DSIR domain log-weight (how target-like) MINUS
               the per-BIGRAM LM NLL (how fluent under the reference
               model) — micro-nat integers divided by exact counts and
               floored, so the combined ``select_score`` stays exact
               integer math AND is length-invariant (raw totals grow
               with doc length, which would bias the cut toward short
               docs)
        -> cut: keep the global top ``frac`` by (select_score, doc_id)
        -> mix: temperature-balance the survivors across sources
               (p ∝ n^mix_alpha) via computed rates

    Composition is where the contracts meet: both scorers emit a row
    for EVERY doc, but a doc neither scorer can score (no tokens / no
    bigrams) gets a SENTINEL far below any real score — the scorers'
    documented 0 means "cannot score", and ranking an empty doc above
    fluent off-score docs (0 > any negative real score) was exactly the
    bug this composition's first test caught. The mix rates are
    computed over the survivors, not the raw corpus.

    Plan shape at scale: two broadcast score-table joins + id-only
    rollups (the scorers), one global rank window for the cut (swap in
    ``top_fraction_binned`` semantics for 100-TB inputs), broadcast
    rates join for the mix — document text never crosses an exchange.

    Output: (doc_id, source, select_score) for the selected + mixed set.
    """
    from irstats2_spark.pipeline.sampling import (
        dsir_logweights,
        sample_by_rates,
        temperature_mix_rates,
        top_fraction,
    )
    from irstats2_spark.pipeline.textstats import lm_nll_scores

    w = dsir_logweights(docs, target, text_col, id_col).select(
        "doc_id", "n_tokens", "lw_micro"
    )
    q = lm_nll_scores(docs, reference, text_col, id_col).select(
        "doc_id", "n_bigrams", "nll_micro"
    )
    # floor of an exact-integer double ratio: both operands are exact in
    # double (< 2^53), so the division+floor is identical in any IEEE
    # engine — never `div` (truncates toward zero; SQL // floors)
    per_tok = F.floor(F.col("lw_micro") / F.col("n_tokens"))
    per_big = F.floor(F.col("nll_micro") / F.col("n_bigrams"))
    sentinel = F.lit(-(1 << 62))
    scored = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")
        )
        .join(w, "doc_id")
        .join(q, "doc_id")
        .select(
            "doc_id",
            "source",
            F.when(
                (F.col("n_tokens") == 0) | (F.col("n_bigrams") == 0), sentinel
            )
            .otherwise(per_tok - per_big)
            .cast("long")
            .alias("select_score"),
        )
    )
    # kept is consumed twice (the mix rates and the rate-sampled output)
    # and is id+score-sized; persisting it stops the second consumer from
    # re-running the full DSIR+LM scoring chain and the global rank cut.
    # The ``materialize`` contract (pipeline.lifecycle) decides who
    # releases the pin.
    kept = (
        top_fraction(scored, "select_score", frac, "doc_id")
        .drop("quality_rank")
        .persist()
    )
    rates = temperature_mix_rates(kept, "source", mix_alpha, mix_total)
    mixed = sample_by_rates(
        kept, rates.withColumnRenamed("stratum", "source"), "source", "doc_id"
    )
    return release_after(
        mixed.select("doc_id", "source", "select_score"), [kept], materialize
    )


def shard_manifest(
    docs: DataFrame,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dataset manifest for a published corpus: deterministic shard
    assignment plus per-shard stats and a CONTENT CHECKSUM — the
    "dataset card" artifact consumers verify a download against, and
    the precondition for reproducible training-data releases (same
    corpus ⇒ byte-identical manifest, any engine, any partitioning).

    Output per shard: (shard, n_docs, n_tokens, content_checksum) where
    the checksum is md5 over the shard's SORTED doc hashes — order-free
    by construction, so it is stable under repartitioning, and any
    added/removed/changed doc flips it.

    Scale shape: shard assignment is a pure hash column; ONE groupBy
    per shard with sort_array over collected doc hashes. Collected
    state is |shard| hashes — size shards (``n_shards`` ∝ corpus/target
    shard size) so a shard's hash list fits a task comfortably (32-byte
    hashes ⇒ ~30 MB per million docs); for billions of docs per shard,
    use ``shard_manifest_hierarchical`` below (chunk the sorted hashes,
    md5 each, md5 the chunk digests — no task ever holds more than one
    chunk)."""
    from irstats2_spark.pipeline.sampling import hash_bucket
    from irstats2_spark.pipeline.textstats import token_count

    tagged = docs.select(
        hash_bucket(F.col(id_col), n_shards, "shard:").cast("int").alias("shard"),
        F.md5(F.col(text_col)).alias("__h"),
        token_count(F.col(text_col)).alias("__nt"),
    )
    return (
        tagged.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").cast("long").alias("n_tokens"),
            F.md5(
                F.concat_ws("", F.sort_array(F.collect_list("__h")))
            ).alias("content_checksum"),
        )
    )


def shard_manifest_hierarchical(
    docs: DataFrame,
    n_shards: int = 8,
    chunk_size: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``shard_manifest`` for shards too large to checksum in one task:
    the sorted doc-hash list is cut into rank-order chunks of
    ``chunk_size``, each chunk is md5'd independently, and the shard
    checksum is the md5 over the chunk digests in chunk order (md5 of
    md5s). No task ever materializes more than ``chunk_size`` hashes —
    a billion-doc shard is 1000 chunk rows of 32 bytes at the default —
    so the manifest scales to any shard size.

    Agreement contract (pytest-pinned): a shard that fits in ONE chunk
    emits its chunk digest directly (no second md5), so with
    ``chunk_size`` >= every shard's doc count this function is
    byte-identical to the flat ``shard_manifest`` — consumers can
    verify a small download against either form. Chunk boundaries are
    ranks in the SORTED hash order, so the checksum is independent of
    input partitioning and row order (equal hashes are interchangeable
    strings — a boundary splitting a tie still concatenates the same
    bytes), and any added/removed/changed doc flips it.

    Scale shape: one hash+count map over the corpus; rank via a
    per-shard window sort (the same sort a shard file write needs
    anyway); one groupBy per (shard, chunk) bounded by ``chunk_size``;
    one groupBy per shard bounded by the chunk-digest count."""
    from irstats2_spark.pipeline.sampling import hash_bucket
    from irstats2_spark.pipeline.textstats import token_count

    tagged = docs.select(
        hash_bucket(F.col(id_col), n_shards, "shard:").cast("int").alias("shard"),
        F.md5(F.col(text_col)).alias("__h"),
        token_count(F.col(text_col)).alias("__nt"),
    )
    ranked = tagged.withColumn(
        "__chunk",
        F.floor(
            (F.row_number().over(Window.partitionBy("shard").orderBy("__h")) - 1)
            / chunk_size
        ).cast("int"),
    )
    chunks = ranked.groupBy("shard", "__chunk").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum("__nt").cast("long").alias("__t"),
        F.md5(F.concat_ws("", F.sort_array(F.collect_list("__h")))).alias("__cd"),
    )
    one_chunk = F.count(F.lit(1)) == 1
    digest_in_order = F.array_sort(
        F.collect_list(F.struct(F.col("__chunk"), F.col("__cd")))
    )
    concat_digests = F.array_join(
        F.transform(digest_in_order, lambda s: s["__cd"]), ""
    )
    return chunks.groupBy("shard").agg(
        F.sum("__n").alias("n_docs"),
        F.sum("__t").cast("long").alias("n_tokens"),
        F.when(one_chunk, F.min("__cd"))
        .otherwise(F.md5(concat_digests))
        .alias("content_checksum"),
    )


def source_shingle_overlap(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-SOURCE contamination matrix: for every ordered source pair,
    what fraction of source A's distinct k-word shingles also occur in
    source B — the corpus-composition diagnostic behind "these two
    crawls are 40% the same text" decisions (dedup thresholds, mix
    rates, and which source to drop wholesale). Doc-level dedup can't
    see this: two sources can share most of their text with no single
    doc pair crossing a near-dup threshold.

    Output: (source_a, source_b, n_common, frac_of_a) — directed, so
    a small source inside a big one reads 1.0 in one direction and
    small in the other (the containment asymmetry, at source grain).

    Scale shape: ONE corpus-scale shuffle — groupBy(shingle hash) with
    collect_set(source) as the aggregate, so the per-source dedup
    happens inside the same aggregation (partial sets combine map-side
    and are bounded by |sources|, a handful) instead of a separate
    corpus-wide distinct; the shuffle carries 16-byte hashes and
    source names, never shingle text or documents. Per-source totals
    and the directed pair matrix are both derived from that rolled-up
    (|distinct shingles|-row) table by in-row expansion + tiny
    aggregations over a <= |sources|^2 key domain — safe by
    construction where doc-level co-occurrence expansion is not."""
    from irstats2_spark.pipeline.dedup import shingle_array

    sets = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(shingle_array(F.col(text_col), k)).alias("shingle"),
        )
        # 16-byte binary digest, not the 32-char hex string: this key rides
        # the one corpus-scale exchange, so halving it halves the dominant
        # shuffle's key bytes (the key never reaches the output)
        .groupBy(F.unhex(F.md5("shingle")).alias("__sh"))
        .agg(F.array_sort(F.collect_set("source")).alias("__srcs"))
        .persist()
    )
    totals = (
        sets.select(F.explode("__srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_shingles"))
    )
    s = F.col("__srcs")
    pair_structs = F.flatten(
        F.transform(
            s,
            lambda a: F.filter(
                F.transform(
                    s,
                    lambda b: F.struct(a.alias("source_a"), b.alias("source_b")),
                ),
                lambda p: p["source_a"] != p["source_b"],
            ),
        )
    )
    common = (
        sets.select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.source_a").alias("source_a"),
            F.col("p.source_b").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ta = totals.select(
        F.col("source").alias("source_a"), F.col("n_shingles").alias("__na")
    )
    out = (
        common.join(F.broadcast(ta), "source_a")
        .select(
            "source_a",
            "source_b",
            "n_common",
            F.round(F.col("n_common") / F.col("__na"), 6).alias("frac_of_a"),
        )
        # eager-materialize the <=|sources|^2-row matrix so the
        # corpus-sized shingle-set cache can be RELEASED here instead of
        # pinning executor storage until LRU pressure (audit functions
        # own their cache lifecycle; the checkpoint blocks are tiny)
        .localCheckpoint()
    )
    sets.unpersist()
    return out


def dup_rate_by_source(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Exact-duplicate rate at SOURCE grain: per source, how many docs
    are byte-copies of another doc in the SAME source — the first
    number a curation run reports per crawl ("src7 is 40% self-copies")
    and the denominator for judging whether near-dup thresholds are
    even worth tuning there. Output: (source, n_docs, n_unique_texts,
    dup_frac) with dup_frac = 1 - unique/docs, 6dp.

    Scale shape: one groupBy(source) whose COUNT(DISTINCT md5(text))
    plans as Spark's two-phase distinct — the partial pass collapses
    per-partition copies before the exchange, and the shuffle carries
    (source, 16-byte hash). No joins, no second pass."""
    return (
        docs.groupBy(F.col(source_col).alias("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.md5(F.col(text_col))).alias("n_unique_texts"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique_texts",
            F.round(
                F.lit(1.0) - F.col("n_unique_texts") / F.col("n_docs"), 6
            ).alias("dup_frac"),
        )
    )


def shard_compaction_plan(
    manifest: DataFrame,
    target_bytes: int,
    shard_col: str = "shard",
    size_col: str = "n_bytes",
) -> DataFrame:
    """Small-file COMPACTION plan over a shard manifest: assign
    consecutive shards to output files by cumulative size, one plan row
    per input shard — the maintenance step every long-lived parquet
    corpus needs (ingest batches and per-source shards leave files far
    under the efficient scan size; thousands of small files turn a
    100 TB scan into a metadata stampede). Same job as Delta/Iceberg
    OPTIMIZE's bin packing, expressed engine-exactly: file id =
    floor(cum_bytes_before / target_bytes) over shards in shard order,
    so a file closes as soon as the running total crosses the next
    target boundary. Deterministic (integer bytes, stable shard order);
    a shard larger than ``target_bytes`` gets a file to itself (its
    successor's cum_before crosses the boundary) rather than splitting
    — compaction merges, the SPLIT decision belongs to the writer.

    Output: manifest columns + (target_file, file_bytes,
    n_shards_in_file) — ready to drive a merge-rewrite job that reads
    each target_file's shard group and writes one file.

    Scale shape: the manifest is shard-count-sized BY CONSTRUCTION
    (thousands of rows for a 100 TB corpus, not corpus-sized), so the
    ordered cumulative window runs over a table that fits one task; the
    corpus itself is never touched — the plan is metadata-only."""
    from pyspark.sql import Window

    w = (
        Window.orderBy(F.col(shard_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = manifest.withColumn(
        "target_file",
        F.floor(
            F.coalesce(F.sum(size_col).over(w), F.lit(0))
            / F.lit(int(target_bytes))
        ).cast("int"),
    )
    wf = Window.partitionBy("target_file")
    return planned.select(
        *manifest.columns,
        "target_file",
        F.sum(size_col).over(wf).cast("long").alias("file_bytes"),
        F.count(F.lit(1)).over(wf).cast("long").alias("n_shards_in_file"),
    )


def quality_funnel(
    docs: DataFrame,
    pos_seed: DataFrame,
    neg_seed: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Curation FUNNEL: survivor counts through the standard filter
    cascade as one tiny table — the before/after accounting every
    curation run publishes (and the first thing reviewed when a
    training set shrinks unexpectedly). Stages are CUMULATIVE:

      0 ingested     — corpus size
      1 quality_gate — + Gopher rule gate passes
      2 classifier   — + seed-set classifier label is not 'neg'
      3 exact_dedup  — + doc is its md5 group's keeper (min id)
      4 near_dedup   — + doc is not the higher id of any SimHash
                        Hamming<=3 pair (one-shot min-id-wins policy,
                        evaluated on the full corpus so each stage's
                        cut is independently auditable)

    Output: (stage, stage_name, n_docs) — len-5, monotone
    non-increasing in stage.

    Scale shape: every flag is an existing audited operator (zero/one-
    shuffle maps, the banded self-join, the md5 groupBy); flags join on
    the id and the funnel itself is ONE conditional-sum aggregate row
    exploded to 5 rows — nothing new shuffles beyond the component
    operators."""
    from irstats2_spark.pipeline.dedup import (
        exact_dedup,
        simhash_hamming_pairs,
    )
    from irstats2_spark.pipeline.textstats import (
        classifier_vote_scores,
        gopher_quality_gate,
    )

    gate = gopher_quality_gate(docs, text_col=text_col).select(
        id_col, "quality_pass"
    )
    votes = classifier_vote_scores(docs, pos_seed, neg_seed).select(
        id_col, "label"
    )
    keep = exact_dedup(docs, text_col, id_col).select(
        F.col("keeper_id").alias(id_col), F.lit(True).alias("__keeper")
    )
    losers = (
        simhash_hamming_pairs(docs, text_col, id_col)
        .select(F.col("doc_b").alias(id_col))
        .distinct()
        .withColumn("__neardup_loser", F.lit(True))
    )
    flags = (
        docs.select(id_col)
        .join(gate, id_col)
        .join(votes, id_col)
        .join(keep, id_col, "left")
        .join(losers, id_col, "left")
        .select(
            F.col("quality_pass").alias("__s1"),
            (F.col("quality_pass") & (F.col("label") != "neg")).alias("__s2"),
            (
                F.col("quality_pass")
                & (F.col("label") != "neg")
                & F.coalesce("__keeper", F.lit(False))
            ).alias("__s3"),
            (
                F.col("quality_pass")
                & (F.col("label") != "neg")
                & F.coalesce("__keeper", F.lit(False))
                & F.coalesce("__neardup_loser", F.lit(False)).__invert__()
            ).alias("__s4"),
        )
    )
    cnt = lambda c: F.sum(F.when(F.col(c), 1).otherwise(0)).cast("long")  # noqa: E731
    one = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n0"),
        cnt("__s1").alias("n1"),
        cnt("__s2").alias("n2"),
        cnt("__s3").alias("n3"),
        cnt("__s4").alias("n4"),
    )
    names = ("ingested", "quality_gate", "classifier", "exact_dedup",
             "near_dedup")
    stages = F.array(
        *[
            F.struct(
                F.lit(i).cast("int").alias("stage"),
                F.lit(names[i]).alias("stage_name"),
                F.col(f"n{i}").alias("n_docs"),
            )
            for i in range(5)
        ]
    )
    return one.select(F.explode(stages).alias("s")).select(
        "s.stage", "s.stage_name", "s.n_docs"
    )
