"""Exact-rational BM25 (operators/rank.py) and the round-8 textprep
additions (FIM augmentation, per-stratum quota): value checks against a
pure-Python integer reference — the WHOLE point of the exact-rational
design is that an independent implementation reproduces every score
bit-for-bit — plus the structural properties (segment reconstruction,
determinism, quota bounds) that SQL and score equality don't cover. The
same three operators also verify under the driver's DuckDB value gate as
`dp_textprep` variants `bm25` / `fim` / `quota`."""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from amr_kg_spark.operators.rank import BM25_SCALE, bm25_rank_exact
from amr_kg_spark.operators.textprep import (
    FIM_MIDDLE,
    FIM_PREFIX,
    FIM_SUFFIX,
    cap_per_stratum,
    fim_transform,
)
from tests.conftest import SF_SMALL

TERMS = ["vector", "spark", "customer"]


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\W+", text.lower()) if t]


def _py_bm25(rows, terms, scale=BM25_SCALE):
    """Independent integer reference — plain Python arithmetic only."""
    docs = {r["doc_id"]: _toks(r["text"]) for r in rows}
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) // n_docs
    df = {
        q: sum(1 for t in docs.values() if q in t) for q in terms
    }
    out = {}
    for did, toks in docs.items():
        dl = len(toks)
        score, hit = 0, 0
        for q in terms:
            tf = toks.count(q)
            if tf == 0:
                continue
            hit += 1
            score += (scale * (2 * n_docs - 2 * df[q] + 1) * 44 * tf * avgdl) // (
                (2 * df[q] + 1) * (20 * tf * avgdl + 6 * avgdl + 18 * dl)
            )
        if hit:
            out[did] = (score, dl, hit)
    return out


def test_bm25_matches_python_reference(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    rows = [r.asDict() for r in docs.select("doc_id", "text").collect()]
    exp = _py_bm25(rows, TERMS)
    k = 25
    expected_order = sorted(exp.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
    got = {
        r.doc_id: (r.score_micro, r.rank, r.dl, r.n_terms_hit)
        for r in bm25_rank_exact(docs, TERMS, k=k).collect()
    }
    assert len(got) == min(k, len(exp))
    for rank, (did, (score, dl, hit)) in enumerate(expected_order, start=1):
        assert got[did] == (score, rank, dl, hit)


def test_bm25_score_positive_and_ordering_total(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    rows = bm25_rank_exact(docs, TERMS, k=10).collect()
    assert all(r.score_micro > 0 for r in rows)
    ranks = [r.rank for r in sorted(rows, key=lambda r: r.rank)]
    assert ranks == list(range(1, len(rows) + 1))
    # ordering is by (score desc, id asc) — verify the tiebreak direction
    ordered = sorted(rows, key=lambda r: r.rank)
    for a, b in zip(ordered, ordered[1:]):
        assert a.score_micro > b.score_micro or (
            a.score_micro == b.score_micro and a.doc_id < b.doc_id
        )


def test_fim_reconstruction_and_split_law(spark):
    """Every transformed doc: the three segments are non-empty and
    reassembling prefix+middle+suffix from the PSM layout recovers the
    original token stream exactly; untransformed docs pass through."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    out = fim_transform(docs, rate=0.5, seed=4242)
    rows = out.select(
        "doc_id", "text", "fim_text", "fim_applied",
        "fim_prefix_len", "fim_middle_len",
    ).collect()
    n_applied = 0
    pat = re.compile(
        re.escape(FIM_PREFIX) + " (.*) " + re.escape(FIM_SUFFIX)
        + " (.*) " + re.escape(FIM_MIDDLE) + " (.*)", re.S
    )
    for r in rows:
        toks = _toks(r.text)
        if r.fim_applied:
            n_applied += 1
            m = pat.fullmatch(r.fim_text)
            assert m, r.fim_text[:80]
            pre, suf, mid = m.group(1), m.group(2), m.group(3)
            assert (pre.split(" ") + mid.split(" ") + suf.split(" ")) == toks
            assert r.fim_prefix_len == len(pre.split(" ")) >= 1
            assert r.fim_middle_len == len(mid.split(" ")) >= 1
            assert len(suf.split(" ")) >= 1
        else:
            assert r.fim_text == " ".join(toks)
            assert r.fim_prefix_len is None and r.fim_middle_len is None
    assert 0 < n_applied < len(rows)


def test_fim_deterministic_and_rate_zero(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    a = sorted(
        (r.doc_id, r.fim_text)
        for r in fim_transform(docs, rate=0.5, seed=1).collect()
    )
    b = sorted(
        (r.doc_id, r.fim_text)
        for r in fim_transform(docs, rate=0.5, seed=1).collect()
    )
    assert a == b
    none = fim_transform(docs, rate=0.0, seed=1)
    assert none.filter(F.col("fim_applied")).count() == 0


def test_cap_per_stratum_bounds_and_preference(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    q = 5
    kept = cap_per_stratum(docs, q, stratum_col="source").collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r.source, []).append(r)
    assert all(len(v) <= q for v in by_src.values())
    # kept set per source == the q largest by (n_chars desc, doc_id asc)
    allrows = docs.select("doc_id", "source", "n_chars").collect()
    for src, rows in by_src.items():
        pool = sorted(
            (r for r in allrows if r.source == src),
            key=lambda r: (-r.n_chars, r.doc_id),
        )[:q]
        assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in pool)
        assert sorted(r.stratum_rank for r in rows) == list(
            range(1, len(rows) + 1)
        )


def test_pmi_collocations_matches_duckdb(spark):
    """Exact-rational PMI ordering replayed in DuckDB (HUGEINT floor
    division) — counts, scaled ratio and rank all value-equal."""
    import duckdb

    from amr_kg_spark.operators.textprep import PMI_SCALE, pmi_collocations

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    got = [
        (r.w1, r.w2, r.c_ab, r.c_a, r.c_b, r.pmi_ratio_micro, r.rank)
        for r in pmi_collocations(docs, min_count=5, k=40).collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    toks = r"list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"
    exp = con.execute(f"""
WITH t AS (SELECT doc_id, {toks} AS t, len({toks}) AS n FROM documents),
pairs AS (
  SELECT t[i] AS w1, t[i+1] AS w2
  FROM t, (SELECT unnest(generate_series(1, 100000)) AS i) s
  WHERE n >= 2 AND i <= n - 1
),
big AS (SELECT w1, w2, count(*) AS c_ab FROM pairs GROUP BY 1, 2),
uni AS (
  SELECT unnest(t) AS w FROM t
),
unic AS (SELECT w, count(*) AS c FROM uni GROUP BY 1),
tot AS (
  SELECT (SELECT count(*) FROM uni) AS n_tokens,
         (SELECT count(*) FROM pairs) AS n_bigrams
),
scored AS (
  SELECT b.w1, b.w2, b.c_ab, a.c AS c_a, c.c AS c_b,
         CAST((CAST({PMI_SCALE} AS HUGEINT) * b.c_ab * t.n_tokens * t.n_tokens)
              // (CAST(t.n_bigrams AS HUGEINT) * a.c * c.c) AS BIGINT)
           AS pmi_ratio_micro
  FROM big b
  JOIN unic a ON a.w = b.w1
  JOIN unic c ON c.w = b.w2
  CROSS JOIN tot t
  WHERE b.c_ab >= 5
)
SELECT w1, w2, c_ab, c_a, c_b, pmi_ratio_micro,
       row_number() OVER (ORDER BY pmi_ratio_micro DESC, w1, w2) AS rank
FROM scored
ORDER BY rank LIMIT 40
""").fetchall()
    assert sorted(got, key=lambda x: x[-1]) == [tuple(r) for r in exp]
    assert len(got) > 0


def test_cluster_balanced_sample_bounds_and_determinism(spark):
    from amr_kg_spark.operators.featurize import cluster_balanced_sample

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    per = 7
    a = cluster_balanced_sample(docs, n_clusters=4, per_cluster=per).collect()
    by_cluster = {}
    for r in a:
        by_cluster.setdefault(r.cluster, []).append(r)
    assert all(len(v) <= per for v in by_cluster.values())
    assert len(by_cluster) > 1, "sample must span multiple clusters"
    assert all(
        sorted(x.stratum_rank for x in v) == list(range(1, len(v) + 1))
        for v in by_cluster.values()
    )
    b = cluster_balanced_sample(docs, n_clusters=4, per_cluster=per).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
    ids = {r.doc_id for r in a}
    assert ids <= {r.doc_id for r in docs.select("doc_id").collect()}
