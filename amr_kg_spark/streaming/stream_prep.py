"""Streaming corpus-prep operators.

The stateless prep stages (normalize, scrub, strip_urls, corpus_filter,
stratified_sample) are pure projections/filters and run on streams
unchanged — tests/test_streaming.py proves their per-batch output equals
batch. This module adds the one prep stage that is genuinely STATEFUL:
sequence packing, where a document's (seq_id, seq_offset) depends on the
cumulative token count of everything before it in its pack stream.

``stream_pack_sequences`` keeps one number per pack bin in streaming
state (the bin's running token total) via ``applyInPandasWithState`` —
bounded state (num_bins longs, regardless of corpus size), append-mode
output, exactly the incremental-ingest pattern: documents land
continuously, each micro-batch extends every bin's stream and emits the
final packing coordinates for the new documents only.

Equivalence contract (tested): when documents arrive in nondecreasing
id order per bin (append-only ingest with monotone ids — the normal
case), the streamed assignment is IDENTICAL to batch
``pack_sequences``. Under out-of-order arrival the stream packs in
arrival order within each micro-batch (sorted by id inside the batch) —
the honest streaming semantics; a training job that needs the batch
order re-packs at epoch time.

No reference analogue (the reference is batch-only pandas/py2neo;
beyond-reference surface, like streaming/stream_kg.py's incremental KG
path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEQ_BIN_SHIFT = 1 << 40  # same globally-unique seq_id layout as batch


def stream_pack_sequences(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    num_bins: int = 1024,
) -> DataFrame:
    """Incremental GPT-style sequence packing over a stream (see module
    docstring). Same pure-function bin assignment as batch
    (``xxhash64(id) % num_bins``); per-bin state = one long."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    binned = docs.withColumn(
        "pack_bin", F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_bins))
    )
    out_schema = (
        f"{id_col} long, pack_bin long, {token_col} long, "
        "seq_id long, seq_offset long"
    )
    state_schema = "cum long"

    def update(key, pdfs, state: GroupState):
        (pack_bin,) = key
        cum = state.get[0] if state.exists else 0
        # column-wise over the whole micro-batch (sorted by id across ALL
        # Arrow chunks, per the docstring contract) — the only sequential
        # dependence is the running total, which is a cumsum: doc k starts
        # at cum + sum(nt[:k]). No per-row Python (engine rule).
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(id_col, kind="mergesort", ignore_index=True)
        nt = pdf[token_col].astype("int64")
        start = int(cum) + nt.cumsum() - nt
        out = pd.DataFrame(
            {
                id_col: pdf[id_col].astype("int64"),
                "pack_bin": int(pack_bin),
                token_col: nt,
                "seq_id": int(pack_bin) * SEQ_BIN_SHIFT + start // budget,
                "seq_offset": start % budget,
            }
        )
        state.update((int(cum) + int(nt.sum()),))
        yield out

    return binned.groupBy("pack_bin").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_incremental_dedup(
    new_docs: DataFrame,
    fingerprints: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """The streaming half of incremental ingest: drop re-crawled
    documents from a STREAM of incoming docs against the STATIC
    fingerprint table of everything already accepted
    (:func:`~amr_kg_spark.operators.dedup.corpus_fingerprints`,
    ``method="exact"``). A stream-static left_anti join is stateless per
    micro-batch — no watermark, no state store: each batch hashes its
    texts and anti-joins the fingerprint side (broadcast-eligible when it
    fits, scan otherwise), so the operator matches the batch
    :func:`~amr_kg_spark.operators.dedup.incremental_dedup` exactly on
    the same rows. Near-dup (minhash) streaming ingest is deliberately
    batch-only: its banding join + estimate rerank is a multi-join plan
    the micro-batch planner re-executes per trigger — run increments
    through the batch job instead.

    Within-stream duplicates are out of scope here too (same contract as
    the batch operator): compose with ``dropDuplicates`` + a watermark if
    the stream itself replays ids."""
    fp = new_docs.withColumn("__fp", F.xxhash64(F.col(text_col)))
    return fp.join(
        fingerprints.select(F.col("fp").alias("__fp")),
        "__fp",
        "left_anti",
    ).drop("__fp")
