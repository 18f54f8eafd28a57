"""Structured-Streaming path: incremental triple extraction and watermarked
window aggregation over file-dropped transcript batches."""

from __future__ import annotations

import os
import tempfile

from amr_kg_spark.fixtures import synth_transcripts
from amr_kg_spark.operators.mentions import detect_mentions
from amr_kg_spark.operators.triples import (
    build_triples,
    cooccurrence_pairs,
    resolve_pairs,
)
from amr_kg_spark.streaming.stream_kg import (
    read_transcript_stream,
    run_available_now,
    stream_triples,
    stream_turn_rates,
)


def _drop_files(spark, d: str, n_turns: int = 600):
    t = synth_transcripts(spark, n_turns=n_turns, n_convs=20)
    # two separate "arrivals"
    t.filter("turn_idx % 2 = 0").coalesce(1).write.mode("append").parquet(d)
    t.filter("turn_idx % 2 = 1").coalesce(1).write.mode("append").parquet(d)
    return t


def test_stream_triples_matches_batch(spark):
    with tempfile.TemporaryDirectory() as root:
        ind, outd, ckpt = (os.path.join(root, x) for x in ("in", "out", "ckpt"))
        t = _drop_files(spark, ind)
        stream = read_transcript_stream(spark, ind, max_files_per_trigger=1)
        run_available_now(stream_triples(spark, stream), outd, ckpt)

        got = {
            (r.subj, r.pred, r.obj)
            for r in spark.read.parquet(outd).dropDuplicates().collect()
        }
        expected = {
            (r.subj, r.pred, r.obj)
            for r in build_triples(
                resolve_pairs(spark, cooccurrence_pairs(detect_mentions(t)))
            ).collect()
        }
        assert got == expected and len(got) > 0


def test_stream_resume_is_incremental(spark):
    """Restarting the stream after new files arrive processes ONLY the new
    files (checkpoint offset tracking)."""
    with tempfile.TemporaryDirectory() as root:
        ind, outd, ckpt = (os.path.join(root, x) for x in ("in", "out", "ckpt"))
        t = synth_transcripts(spark, n_turns=300, n_convs=10)
        t.coalesce(1).write.mode("append").parquet(ind)
        stream = read_transcript_stream(spark, ind)
        run_available_now(stream_triples(spark, stream), outd, ckpt)
        n1 = spark.read.parquet(outd).count()

        # second drop, resume from checkpoint
        t.coalesce(1).write.mode("append").parquet(ind)
        stream = read_transcript_stream(spark, ind)
        run_available_now(stream_triples(spark, stream), outd, ckpt)
        n2 = spark.read.parquet(outd).count()
        assert n2 == 2 * n1  # new batch processed once, old not reprocessed


def test_watermarked_window_counts(spark):
    with tempfile.TemporaryDirectory() as root:
        ind, outd, ckpt = (os.path.join(root, x) for x in ("in", "out", "ckpt"))
        _drop_files(spark, ind, n_turns=400)
        stream = read_transcript_stream(spark, ind)
        run_available_now(stream_turn_rates(stream), outd, ckpt)
        out = spark.read.parquet(outd)
        assert out.columns == ["window_start", "window_end", "role", "n_turns"]
        # availableNow + watermark: only windows older than the watermark
        # are emitted in append mode; total counted turns <= input turns
        total = sum(r.n_turns for r in out.collect())
        assert 0 <= total <= 400


def test_stateful_conversation_state(spark):
    """applyInPandasWithState: state accumulates across micro-batches."""
    from amr_kg_spark.streaming.stream_kg import stream_conversation_state

    with tempfile.TemporaryDirectory() as root:
        ind, outd, ckpt = (os.path.join(root, x) for x in ("in", "out", "ckpt"))
        t = synth_transcripts(spark, n_turns=300, n_convs=10)
        # two drops processed as separate micro-batches (maxFilesPerTrigger=1)
        t.filter("turn_idx % 2 = 0").coalesce(1).write.mode("append").parquet(ind)
        t.filter("turn_idx % 2 = 1").coalesce(1).write.mode("append").parquet(ind)
        from amr_kg_spark.streaming.stream_kg import run_available_now_foreach_batch

        stream = read_transcript_stream(spark, ind, max_files_per_trigger=1)
        run_available_now_foreach_batch(stream_conversation_state(stream), outd, ckpt)

        from amr_kg_spark.streaming.stream_kg import read_drained

        # the documented read contract: latest-batch-wins per key
        out = read_drained(spark, outd, ["conv_id"])
        import pyspark.sql.functions as F
        final = (
            out.groupBy("conv_id").agg(F.max("n_turns").alias("n")).collect()
        )
        expected = {r.conv_id: r.n for r in
                    t.groupBy("conv_id").count().withColumnRenamed("count", "n").collect()}
        got = {r.conv_id: r.n for r in final}
        assert got == expected


def test_stream_dedup_turns_drops_replays(spark):
    """dropDuplicatesWithinWatermark: replayed (conv_id, turn_idx) rows in
    later micro-batches are suppressed; output is one row per turn."""
    from amr_kg_spark.streaming.stream_kg import (
        read_transcript_stream,
        run_available_now,
        stream_dedup_turns,
    )

    with tempfile.TemporaryDirectory() as root:
        ind, outd, ckpt = (os.path.join(root, x) for x in ("in", "out", "ckpt"))
        t = synth_transcripts(spark, n_turns=400, n_convs=8)
        # drop 1: all turns; drop 2: a replay of half of them (at-least-once)
        t.coalesce(1).write.mode("append").parquet(ind)
        t.filter("turn_idx % 2 = 0").coalesce(1).write.mode("append").parquet(ind)

        stream = read_transcript_stream(spark, ind, max_files_per_trigger=1)
        run_available_now(stream_dedup_turns(stream), outd, ckpt)

        out = spark.read.parquet(outd)
        assert out.count() == t.select("conv_id", "turn_idx").distinct().count()
        dups = (
            out.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
        )
        assert dups == 0


def test_stream_corpus_filter_matches_batch(spark):
    """The corpus quality gate is a stateless single projection, so it
    runs under Structured Streaming unchanged: filtering a file stream of
    documents yields exactly the batch corpus_filter verdicts."""
    from amr_kg_spark.operators.text import corpus_filter

    with tempfile.TemporaryDirectory() as root:
        ind, outd, ckpt = (os.path.join(root, x) for x in ("in", "out", "ckpt"))
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        docs.filter("doc_id % 2 = 0").coalesce(1).write.mode("append").parquet(ind)
        docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(ind)

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ind)
        )
        sq = corpus_filter(stream, langs=["en"]).select(
            "doc_id", "reject_reason"
        )
        run_available_now(sq, outd, ckpt)

        got = {
            (r.doc_id, r.reject_reason)
            for r in spark.read.parquet(outd).collect()
        }
        expected = {
            (r.doc_id, r.reject_reason)
            for r in corpus_filter(docs, langs=["en"])
            .select("doc_id", "reject_reason")
            .collect()
        }
        assert got == expected and len(got) == docs.count()


def test_stream_textprep_projections_match_batch(spark):
    """normalize_text + scrub_pii + stratified_sample are stateless
    scan-side expressions, so the crawl-side corpus prep runs under
    Structured Streaming unchanged — micro-batched file stream yields
    byte-identical normalize/scrub outputs and the identical deterministic
    sample set as the batch run (the hash predicate is a pure function of
    ids, so stream vs batch cannot diverge)."""
    from amr_kg_spark.operators.textprep import (
        normalize_text,
        scrub_pii,
        stratified_sample,
    )

    def prep(df):
        cleaned = scrub_pii(normalize_text(df))
        return stratified_sample(
            cleaned, {"en": 0.6, "de": 0.3}, stratum_col="lang"
        ).select("doc_id", "text_norm", "text_scrubbed", "n_email", "n_phone")

    with tempfile.TemporaryDirectory() as root:
        ind, outd, ckpt = (os.path.join(root, x) for x in ("in", "out", "ckpt"))
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        docs.filter("doc_id % 2 = 0").coalesce(1).write.mode("append").parquet(ind)
        docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(ind)

        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ind)
        )
        run_available_now(prep(stream), outd, ckpt)

        got = {tuple(r) for r in spark.read.parquet(outd).collect()}
        expected = {tuple(r) for r in prep(docs).collect()}
        assert got == expected and len(got) > 0


def test_stream_pack_sequences_matches_batch(spark):
    """Stateful streaming packing (one long of state per bin) must equal
    batch pack_sequences exactly when documents arrive as id-ordered
    drops (append-only ingest): two micro-batched file drops — low ids
    then high ids — produce the identical (pack_bin, seq_id, seq_offset)
    assignment for every document."""
    import time as _time

    import pyspark.sql.functions as F

    from amr_kg_spark.operators.dedup import tokens_col
    from amr_kg_spark.operators.textprep import pack_sequences
    from amr_kg_spark.streaming.stream_prep import stream_pack_sequences

    BUDGET, BINS = 256, 8
    with tempfile.TemporaryDirectory() as root:
        ind, outd, ckpt = (os.path.join(root, x) for x in ("in", "out", "ckpt"))
        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).withColumn("n_tokens", F.size(tokens_col("text")).cast("long"))
        toks = docs.select("doc_id", "n_tokens")
        median = toks.approxQuantile("doc_id", [0.5], 0)[0]
        toks.filter(F.col("doc_id") < median).coalesce(1).write.mode(
            "append"
        ).parquet(ind)
        _time.sleep(1.1)  # distinct mod-times so the source orders drops
        toks.filter(F.col("doc_id") >= median).coalesce(1).write.mode(
            "append"
        ).parquet(ind)

        stream = (
            spark.readStream.schema(toks.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ind)
        )
        sq = stream_pack_sequences(stream, budget=BUDGET, num_bins=BINS)
        run_available_now(sq, outd, ckpt)

        got = {
            (r.doc_id, r.pack_bin, r.seq_id, r.seq_offset)
            for r in spark.read.parquet(outd).collect()
        }
        expected = {
            (r.doc_id, r.pack_bin, r.seq_id, r.seq_offset)
            for r in pack_sequences(toks, budget=BUDGET, num_bins=BINS)
            .select("doc_id", "pack_bin", "seq_id", "seq_offset")
            .collect()
        }
        assert got == expected and len(got) == toks.count()


def test_stream_incremental_dedup_matches_batch(spark):
    """Streaming ingest against the persisted corpus fingerprint state:
    a file stream carrying re-crawls of fingerprinted docs plus fresh
    docs must keep exactly what the batch incremental_dedup keeps."""
    import pyspark.sql.functions as F

    from amr_kg_spark.operators.dedup import (
        corpus_fingerprints,
        incremental_dedup,
    )
    from amr_kg_spark.streaming.stream_prep import stream_incremental_dedup

    with tempfile.TemporaryDirectory() as root:
        ind, outd, ckpt = (os.path.join(root, x) for x in ("in", "out", "ckpt"))
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        corpus = docs.filter("doc_id % 3 = 0")
        fps = corpus_fingerprints(corpus)
        # incoming stream: re-crawls of corpus docs (shifted ids) + fresh
        incoming = corpus.select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        ).unionByName(docs.filter("doc_id % 3 = 1").select("doc_id", "text"))
        incoming.filter("doc_id < 100000").coalesce(1).write.mode(
            "append"
        ).parquet(ind)
        incoming.filter("doc_id >= 100000").coalesce(1).write.mode(
            "append"
        ).parquet(ind)

        stream = (
            spark.readStream.schema(incoming.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(ind)
        )
        run_available_now(
            stream_incremental_dedup(stream, fps), outd, ckpt
        )
        got = {r.doc_id for r in spark.read.parquet(outd).collect()}
        expected = {
            r.doc_id for r in incremental_dedup(incoming, fps).collect()
        }
        assert got == expected
        assert got == {r.doc_id for r in docs.filter("doc_id % 3 = 1").collect()}
