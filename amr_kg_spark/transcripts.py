"""Deterministic ``transcripts`` table derived from the driver testdata.

The engine's primary input (BASELINE.json input_hint) is an Iceberg table
``transcripts(conv_id, turn_idx, role, text, tool, ts)``. The sandbox
testdata has no such table, so we derive one *deterministically* from the
read-only ``documents`` parquet: every document becomes one turn, with
entity mentions (pathogen/strain, compound, MIC-style activity value,
institution) planted by doc_id arithmetic from the controlled vocabularies
in :mod:`amr_kg_spark.vocab`.

The derivation is expressed as ONE SQL text with a tiny dialect knob so the
exact same rows are produced by Spark (engine input) and DuckDB (driver
oracle): any mismatch downstream is then a real engine bug, not input drift.

Planting rules (all arithmetic on doc_id):
  conv_id  = 'c' || (doc_id % 97)           -- 97 conversations
  turn_idx = floor(doc_id / 97)             -- contiguous 0..k per conv
  role     = user/assistant/tool by doc_id % 3
  tool     = 'search' when doc_id % 5 = 0 else NULL
  ts       = 2026-01-01T00:00:00Z + doc_id minutes (monotone per conv)
  pathogen term   = PATHOGENS[doc_id % 12]  (indices 8..11 = strain aliases)
  compound term   = COMPOUNDS[doc_id % 10]
  'resistant to' marker when doc_id % 7 = 0, else 'vs'
  activity value  'MIC <v>.<d> <unit>' when doc_id % 3 = 0
  institution     'at <institute>' when doc_id % 5 = 0
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import vocab
from .session import scan_parquet

_EPOCH = "2026-01-01 00:00:00"


def _vals(rows: list[tuple], cols: list[str]) -> str:
    """Indexed VALUES table (idx = list position), valid in both dialects."""
    indexed = [(i, *r) for i, r in enumerate(rows)]
    return vocab.sql_values(indexed, ["idx", *cols])


def transcripts_cte(dialect: str = "spark") -> str:
    """CTE text defining ``transcripts`` over a ``documents`` view."""
    if dialect == "spark":
        ts_expr = (
            f"timestamp'{_EPOCH}' + make_interval(0,0,0,0,0,CAST(doc_id AS INT),0)"
        )
    else:
        ts_expr = f"TIMESTAMP '{_EPOCH}' + CAST(doc_id AS INT) * INTERVAL 1 MINUTE"

    pathogen_terms = [p for p, _ in vocab.PATHOGENS] + [
        a for a, _ in vocab.STRAIN_ALIASES
    ]
    pv = _vals([(t,) for t in pathogen_terms], ["term"])
    cv = _vals([(c[0],) for c in vocab.COMPOUNDS], ["term"])
    iv = _vals([(i[1],) for i in vocab.INSTITUTES], ["term"])
    uv = _vals([(u,) for u in vocab.ACTIVITY_UNITS], ["term"])

    return f"""
transcripts AS (
  SELECT
    'c' || CAST(doc_id % 97 AS STRING) AS conv_id,
    CAST(FLOOR(doc_id / 97) AS INT) AS turn_idx,
    CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
    d.text || ' | Assay: ' || p.term
      || CASE WHEN doc_id % 7 = 0 THEN ' resistant to ' ELSE ' vs ' END
      || c.term
      || CASE WHEN doc_id % 3 = 0
              THEN ' MIC ' || CAST(doc_id % 64 AS STRING) || '.' || CAST(doc_id % 10 AS STRING) || ' ' || u.term
              ELSE '' END
      || CASE WHEN doc_id % 5 = 0 THEN ' at ' || i.term ELSE '' END
      AS text,
    CASE WHEN doc_id % 5 = 0 THEN 'search' ELSE NULL END AS tool,
    {ts_expr} AS ts
  FROM documents d
  JOIN {pv.replace('AS t(', 'AS p(')} ON p.idx = CAST(doc_id % 12 AS INT)
  JOIN {cv.replace('AS t(', 'AS c(')} ON c.idx = CAST(doc_id % 10 AS INT)
  JOIN {iv.replace('AS t(', 'AS i(')} ON i.idx = CAST(doc_id % 6 AS INT)
  JOIN {uv.replace('AS t(', 'AS u(')} ON u.idx = CAST(FLOOR(doc_id / 3) % 3 AS INT)
)
""".strip()


# Spark's STRING type name is invalid in DuckDB; patch casts per dialect.
def _fix_dialect(sql: str, dialect: str) -> str:
    if dialect == "duckdb":
        sql = sql.replace("AS STRING)", "AS VARCHAR)")
    return sql


_TRANSCRIPTS_PLAN_CACHE: dict[tuple[str, str], DataFrame] = {}


def derive_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load documents parquet and derive the transcripts DataFrame.

    Pure Catalyst plan: parquet scan -> 4 broadcast-able literal-table joins
    -> projection. At production scale the real input is
    ``spark.read.table('catalog.db.transcripts')`` instead.

    Deliberately NOT fanned out here: compute-dense consumers (mention
    detection) fan out themselves, while shuffle-first consumers
    (reconstruction/sessionization) repartition by conv_id anyway — a
    blanket fan_out at the source made kg_reconstruct ~1.8x slower at
    sf0.1 (A/B, min-of-3) for zero benefit.

    The LAZY analyzed plan is memoized per (application, sf_dir):
    re-parsing + re-analyzing the multi-kilobyte derivation CTE cost
    ~0.13 s of driver time on EVERY kg-query construction (guide §1:
    construction is inside the bench wall). Only the unexecuted plan is
    cached — every action still scans the parquet files; results are
    never reused across runs.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _TRANSCRIPTS_PLAN_CACHE.get(key)
    if cached is not None:
        return cached
    scan_parquet(spark, f"{sf_dir}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    cte = _fix_dialect(transcripts_cte("spark"), "spark")
    df = spark.sql(f"WITH {cte} SELECT * FROM transcripts")
    _TRANSCRIPTS_PLAN_CACHE[key] = df
    return df


def transcripts_oracle_cte() -> str:
    """The same derivation as a DuckDB CTE body (driver registers views)."""
    return _fix_dialect(transcripts_cte("duckdb"), "duckdb")
