"""Corpus-preparation operators: normalization (+NFC), PII scrubbing
(precision fixtures), sequence packing (cross-JVM determinism, shuffle
order), stratified sampling, token-budget curriculum mixing. Since round
5 the whole family ALSO verifies under the driver's oracle gate as the
merged `dp_textprep` registry row (xxhash64 replicated bit-exact in
DuckDB, queries/xxh64_sql.py); these tests keep the faster per-operator
loops and the properties SQL can't express (subprocess JVMs, plans)."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F

from amr_kg_spark.operators.textprep import (
    PII_PATTERNS,
    normalize_text,
    pack_sequences,
    scrub_pii,
    stratified_sample,
)
from tests.conftest import SF_SMALL


def _duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    return con


def test_normalize_text_matches_duckdb(spark):
    from amr_kg_spark.operators.textprep import WHITESPACE_CLASS

    got = {
        (r.doc_id, r.text_norm)
        for r in normalize_text(
            spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        ).select("doc_id", "text_norm").collect()
    }
    exp = set(
        _duck().execute(
            r"""
            SELECT doc_id,
                   trim(regexp_replace(regexp_replace(text,
                        '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
            """
            + f"'{WHITESPACE_CLASS}', ' ', 'g')) AS text_norm FROM documents"
        ).fetchall()
    )
    assert got == exp and len(got) > 0


def test_normalize_text_unicode_whitespace(spark):
    """NBSP / line-separator / ideographic-space runs collapse like ASCII
    whitespace (round-5 ADVICE: Java \\s and RE2 \\s are ASCII-only, so
    the class lists the unicode spaces explicitly), and the DuckDB oracle
    replays the identical pattern."""
    import duckdb

    from amr_kg_spark.operators.textprep import WHITESPACE_CLASS

    texts = [
        (1, "a\u00a0\u00a0b"),                  # NBSP run
        (2, "a\u2028b\u2029c"),                  # line/paragraph separators
        (3, "\u3000a\u202f\u2009 b "),           # ideographic + narrow-nbsp mix
        (4, "a\u2003\tb"),                       # em-space + tab run
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: r.text_norm for r in normalize_text(docs).collect()}
    assert got == {1: "a b", 2: "a b c", 3: "a b", 4: "a b"}
    con = duckdb.connect()
    for i, t in texts:
        (exp,) = con.execute(
            "SELECT trim(regexp_replace(?, "
            f"'{WHITESPACE_CLASS}', ' ', 'g'))",
            [t],
        ).fetchone()
        assert got[i] == exp, (i, got[i], exp)


def test_normalize_text_preserve_newlines(spark):
    """preserve_newlines=True keeps line structure through normalization
    (round-6 ADVICE #1: the default collapses \\n into the space run, so a
    downstream dedup_lines sees ONE segment per document): \\r\\n / \\r /
    U+2028 / U+2029 canonicalize to \\n, only HORIZONTAL whitespace
    collapses, lines are individually trimmed, blank interior lines
    survive. The DuckDB RE2 replay of the identical regex chain agrees."""
    import duckdb

    from amr_kg_spark.operators.textprep import HSPACE_CLASS

    texts = [
        # CRLF + CR + unicode line separators all become \n
        (1, "head\r\nbody\rtail end last"),
        # horizontal runs collapse, lines trim, interior blank line kept
        (2, "  a  b  \n\n\tc　d  "),
        # leading/trailing blank lines stripped, spaces around \n eaten
        (3, "\n  first \n second  third \n\n"),
        # control chars still stripped; tabs are horizontal
        (4, "x\x01y\tz\nw"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r.doc_id: r.text_norm
        for r in normalize_text(docs, preserve_newlines=True).collect()
    }
    assert got == {
        1: "head\nbody\ntail\nend\nlast",
        2: "a b\n\nc d",
        3: "first\nsecond third",
        4: "xy z\nw",
    }
    con = duckdb.connect()
    for i, t in texts:
        (exp,) = con.execute(
            r"""
            SELECT trim(regexp_replace(regexp_replace(regexp_replace(
                       regexp_replace(?,
                       '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
                       '\r\n|[\r'|| chr(8232) || chr(8233) ||']', chr(10), 'g'),
            """
            + f"'{HSPACE_CLASS}', ' ', 'g'),"
            + "' ?\n ?', chr(10), 'g'), ' ' || chr(10))",
            [t],
        ).fetchone()
        assert got[i] == exp, (i, got[i], exp)
    # default path is unchanged: same inputs, newlines collapse to spaces
    flat = {r.doc_id: r.text_norm for r in normalize_text(docs).collect()}
    assert flat[2] == "a b c d" and "\n" not in "".join(flat.values())


def test_scrub_pii_replaces_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe@example.org or call +49 30 1234 5678."),
            (2, "server at 10.0.0.1 and 192.168.1.254; no pii here"),
            (3, "clean text"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in scrub_pii(docs).collect()}
    assert rows[1].n_email == 1 and rows[1].n_phone == 1
    assert "jane.doe@example.org" not in rows[1].text_scrubbed
    assert "<EMAIL>" in rows[1].text_scrubbed
    assert "<PHONE>" in rows[1].text_scrubbed
    assert rows[2].n_ipv4 == 2 and rows[2].text_scrubbed.count("<IP>") == 2
    assert rows[3].text_scrubbed == "clean text"
    # counts also match DuckDB's regex engine on the real corpus
    got = {
        (r.doc_id, r.n_email, r.n_ipv4)
        for r in scrub_pii(
            spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        ).select("doc_id", "n_email", "n_ipv4").collect()
    }
    email_pat = PII_PATTERNS[0][1]
    ip_pat = PII_PATTERNS[1][1]
    exp = set(
        _duck().execute(
            f"""
            SELECT doc_id,
                   len(regexp_extract_all(text, '{email_pat}')) AS n_email,
                   len(regexp_extract_all(text, '{ip_pat}')) AS n_ipv4
            FROM documents
            """
        ).fetchall()
    )
    assert got == exp


def test_phone_scrub_precision(spark):
    """The phone pattern must catch real phone formats and MUST NOT eat
    dates, datetimes, id lists or version strings (round-4 verdict item
    #4: the old any-digit-run pattern silently corrupted such text)."""
    scrubbed = [
        "+49 30 1234 5678",
        "(030) 1234-5678",
        "555-123-4567",
        "+1 (800) 555 0199",
        "800.555.0199",
    ]
    survives = [
        "released 2026-08-17",
        "timestamp 2026-08-17 01:02",
        "ids 12, 34, 56, 78, 90, 12, 34",
        "version 10.2.3.4000 of the lib",
        "order 2026 08 17 01 02 03",
        "pi to 9 places 3.141592653",
    ]
    rows = [(i, t) for i, t in enumerate(scrubbed + survives)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in scrub_pii(docs).collect()}
    for i, t in enumerate(scrubbed):
        assert got[i].n_phone >= 1, f"missed phone: {t!r}"
        assert "<PHONE>" in got[i].text_scrubbed, t
    for j, t in enumerate(survives, start=len(scrubbed)):
        assert got[j].n_phone == 0, f"false positive on: {t!r}"
        assert got[j].text_scrubbed == t, t
    # the pattern is RE2-safe by design — DuckDB replays it identically
    # (this is what lets the dp_textprep driver row value-check the scrub)
    phone_pat = PII_PATTERNS[2][1]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    exp = dict(
        con.execute(
            f"SELECT doc_id, len(regexp_extract_all(text, '{phone_pat}')) FROM t"
        ).fetchall()
    )
    assert exp == {i: r.n_phone for i, r in got.items()}


def test_normalize_text_nfc_matches_python_oracle(spark):
    """Optional NFC path: batched Arrow pandas_udf vs unicodedata directly;
    plan stays ArrowEvalPython-only with zero exchanges."""
    import re
    import unicodedata

    fixtures = [
        (1, "Café du Monde"),          # decomposed e + combining acute
        (2, "Café du Monde"),            # composed — must collapse equal
        (3, "Ångström  units"),  # Å + ö decomposed, ws collapse
        (4, "ṩ vs ṩ"),      # multi-combining-mark ordering
        (5, None),
    ]
    docs = spark.createDataFrame(fixtures, "doc_id long, text string")
    out = normalize_text(docs, nfc=True)
    got = {r.doc_id: r.text_norm for r in out.collect()}
    for doc_id, raw in fixtures:
        if raw is None:
            assert got[doc_id] is None
            continue
        exp = re.sub(r"\s+", " ", unicodedata.normalize("NFC", raw)).strip()
        assert got[doc_id] == exp, (doc_id, got[doc_id], exp)
    assert got[1] == got[2], "decomposed and composed forms must unify"
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan, "must be Arrow-batched, not per-row"


def test_pack_sequences_deterministic_across_cluster_widths():
    """pack_bin/seq_id/seq_offset are a pure function of the data: two
    separate JVMs at local[2] and local[8] (different defaultParallelism)
    must produce byte-identical assignments with the DEFAULT num_bins."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {**os.environ, "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", "")}
    outs = []
    for cores in ("2", "8"):
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "tests", "_pack_child.py"), cores],
            capture_output=True, text=True, check=True, env=env, timeout=300,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("PACKRESULT:")][-1]
        outs.append(line)
    assert outs[0] == outs[1]


def test_pack_sequences_matches_duckdb_window(spark):
    """The packing closed form vs an independent DuckDB window
    formulation, over the real corpus token counts with 4 bins."""
    from amr_kg_spark.operators.text import token_count

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    toks = token_count(docs).select("doc_id", "n_tokens")
    packed = pack_sequences(toks, budget=256, num_bins=4)
    got = {
        (r.doc_id, r.pack_bin, r.seq_id, r.seq_offset)
        for r in packed.collect()
    }
    # independent DuckDB derivation — xxhash64 replicated via the Spark
    # side (hash values collected once), cumsum + floor in SQL
    hashes = {
        r.doc_id: r.h
        for r in toks.select(
            "doc_id", F.pmod(F.xxhash64("doc_id"), F.lit(4)).alias("h")
        ).collect()
    }
    con = _duck()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, n_tokens INT, pack_bin BIGINT)"
    )
    con.executemany(
        "INSERT INTO t VALUES (?, ?, ?)",
        [
            (r.doc_id, r.n_tokens, hashes[r.doc_id])
            for r in toks.collect()
        ],
    )
    exp = set(
        con.execute(
            """
            SELECT doc_id, pack_bin,
                   pack_bin * (1::BIGINT << 40) + (cb // 256) AS seq_id,
                   cb % 256 AS seq_offset
            FROM (
              SELECT doc_id, pack_bin,
                     sum(n_tokens) OVER (PARTITION BY pack_bin
                         ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) - n_tokens AS cb
              FROM t
            )
            """
        ).fetchall()
    )
    assert got == exp
    assert len(got) == toks.count()
    # offsets always land inside the sequence window
    assert packed.filter("seq_offset >= 256 or seq_offset < 0").count() == 0


def test_stratified_sample_deterministic_and_proportional(spark):
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    fr = {"en": 0.5, "de": 0.1}
    s1 = stratified_sample(docs, fr, stratum_col="lang")
    s2 = stratified_sample(docs, fr, stratum_col="lang")
    a = {r.doc_id for r in s1.collect()}
    b = {r.doc_id for r in s2.collect()}
    assert a == b, "sampling must be a pure function of the id"
    # strata not in the mix are dropped; kept strata are roughly on-rate
    kept = {r.lang: r["count"] for r in s1.groupBy("lang").count().collect()}
    tot = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert set(kept) <= set(fr)
    for lang, frac in fr.items():
        if tot.get(lang, 0) >= 50:
            rate = kept.get(lang, 0) / tot[lang]
            assert abs(rate - frac) < 0.25, (lang, rate, frac)
    # subset property: the 0.1 sample of a stratum is inside the 0.5 one
    s_small = {
        r.doc_id
        for r in stratified_sample(docs, {"en": 0.1}, stratum_col="lang").collect()
    }
    s_big = {
        r.doc_id
        for r in stratified_sample(docs, {"en": 0.5}, stratum_col="lang").collect()
    }
    assert s_small <= s_big, "hash sampling must nest across fractions"


def test_textprep_plans_are_scale_shaped(spark):
    """Plan gates for the corpus-prep ops: normalize/scrub are pure
    projections (zero exchanges); packing is exactly ONE exchange (the
    bin hash) + one sort; sampling is a scan-side filter with no
    shuffle and pruned columns."""
    import re

    from amr_kg_spark.operators.text import token_count

    def plan(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")

    p = plan(scrub_pii(normalize_text(docs)))
    assert "Exchange" not in p
    assert re.search(r"^\(\d+\) Scan parquet", p, re.M)

    packed = pack_sequences(
        token_count(docs).select("doc_id", "n_tokens"), budget=256, num_bins=8
    )
    p = plan(packed)
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 1, p
    assert "Window" in p

    p = plan(stratified_sample(docs, {"en": 0.5}, stratum_col="lang"))
    assert "Exchange" not in p
    assert "Filter" in p


def test_mix_to_token_budget_semantics(spark):
    """Budget floor, nesting across budgets, and determinism — plus a
    pure-Python replay of the hash order (xxh64 replica) as the oracle."""
    from amr_kg_spark.operators.text import token_count
    from amr_kg_spark.operators.textprep import mix_to_token_budget

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    toks = (
        token_count(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "n_tokens")
    )
    budgets = {"en": 1500, "de": 400}
    kept = mix_to_token_budget(toks, budgets, stratum_col="lang")
    rows = kept.collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    base = {(r.doc_id, r.lang, r.n_tokens) for r in toks.collect()}
    total_by_lang: dict = {}
    for _, lang, n in base:
        total_by_lang[lang] = total_by_lang.get(lang, 0) + n
    assert set(by_lang) <= set(budgets)
    for lang, rs in by_lang.items():
        got = sum(r.n_tokens for r in rs)
        if total_by_lang[lang] >= budgets[lang]:
            # budget is a floor; overshoot bounded by the crossing doc
            assert got >= budgets[lang]
            assert got - max(r.n_tokens for r in rs) < budgets[lang]
        else:
            assert got == total_by_lang[lang], "keep everything if short"
    # nesting: half budgets select a subset
    small = {
        r.doc_id
        for r in mix_to_token_budget(
            toks, {"en": 700, "de": 200}, stratum_col="lang"
        ).collect()
    }
    assert small <= {r.doc_id for r in rows}
    # python replay of the exact hash order (reference XXH64, chained lanes)
    M = (1 << 64) - 1
    P1, P2, P3, P4, P5 = (
        0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
        0x85EBCA77C2B2AE63, 0x27D4EB2F165667C5,
    )

    def rotl(x, r):
        return ((x << r) | (x >> (64 - r))) & M

    def fmix(h):
        h ^= h >> 33
        h = (h * P2) & M
        h ^= h >> 29
        h = (h * P3) & M
        return h ^ (h >> 32)

    def hash_long(v, seed):
        v &= M
        h = (seed + P5 + 8) & M
        h ^= (rotl((v * P2) & M, 31) * P1) & M
        return fmix(((rotl(h, 27) * P1) + P4) & M)

    def hash_int(v, seed):
        h = (seed + P5 + 4) & M
        h ^= ((v & 0xFFFFFFFF) * P1) & M
        return fmix(((rotl(h, 23) * P2) + P3) & M)

    def spark_hash(doc_id):
        u = hash_int(42, hash_long(doc_id, 42))
        return u - (1 << 64) if u >= (1 << 63) else u

    exp = set()
    for lang in budgets:
        stream = sorted(
            ((spark_hash(d), d, n) for d, lg, n in base if lg == lang),
        )
        cum = 0
        for _, d, n in stream:
            if cum < budgets[lang]:
                exp.add(d)
            cum += n
    assert {r.doc_id for r in rows} == exp


def test_pack_sequences_shuffle_seed(spark):
    """shuffle_seed packs the stream in xxhash64(id, seed) order:
    deterministic, different from id order, and still a valid packing."""
    from amr_kg_spark.operators.textprep import pack_sequences

    rows = [(i, (i * 13) % 50 + 1) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    a = pack_sequences(docs, budget=64, num_bins=4, shuffle_seed=7)
    b = pack_sequences(docs, budget=64, num_bins=4, shuffle_seed=7)
    ident = pack_sequences(docs, budget=64, num_bins=4)
    ra = sorted(tuple(r) for r in a.collect())
    rb = sorted(tuple(r) for r in b.collect())
    ri = sorted(tuple(r) for r in ident.collect())
    assert ra == rb, "same seed -> same packing"
    assert ra != ri, "shuffled order must differ from id order"
    # same bins either way (binning is order-independent), offsets valid
    assert {t[:3] for t in ra} == {t[:3] for t in ri}  # doc_id,n_tokens,bin
    assert a.filter("seq_offset >= 64 or seq_offset < 0").count() == 0


def test_prep_corpus_job_end_to_end(tmp_path):
    """jobs/prep_corpus.py: the full raw-docs -> packed-sequences pipeline
    in a fresh JVM — stage counts monotone, side-channel written, output
    packed within budget."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        **os.environ,
        "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    out = str(tmp_path / "packed")
    rej = str(tmp_path / "rej")
    bench = str(tmp_path / "bench")
    # benchmark slice = every 31st doc
    pre = subprocess.run(
        [sys.executable, "-c", (
            "from amr_kg_spark.session import get_spark;"
            "s = get_spark(cores='4');"
            f"s.read.parquet('{SF_SMALL}/documents.parquet')"
            f".filter('doc_id % 31 = 0').write.parquet('{bench}');"
            "s.stop()"
        )],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert pre.returncode == 0, pre.stderr[-2000:]
    r = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "prep_corpus.py"),
            "--input", f"{SF_SMALL}/documents.parquet",
            "--output", out, "--rejects", rej,
            "--benchmark", bench, "--decontam-n", "8",
            "--min-quality", "0.4", "--lang", "en",
            "--sample", "en:0.9", "--budget", "512", "--shuffle-seed", "13",
            "--tokenizer", "bpe", "--bpe-merges", "64",
            "--semantic-dedup", "0.95", "--lm-drop-bottom", "0.05",
        ],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    chain = ["rows_in", "after_filter", "after_lm_filter", "after_dedup",
             "after_semantic_dedup", "after_decontam",
             "after_sample", "rows_out"]
    vals = [stats[k] for k in chain]
    assert vals == sorted(vals, reverse=True), stats
    assert stats["rows_out"] > 0 and stats["total_tokens"] > 0
    assert stats["bpe_merges_trained"] > 0, "BPE counter must be active"
    assert os.path.isdir(rej + "/quality")


def test_strip_urls(spark):
    from amr_kg_spark.operators.textprep import URL_PATTERN, strip_urls

    docs = spark.createDataFrame(
        [
            (1, "see https://example.org/a?b=1 and www.test.de/x for docs"),
            (2, "no links here, just text about http protocols in general"),
            (3, "trailing http://a.io"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in strip_urls(docs).collect()}
    assert got[1].n_urls == 2
    assert got[1].text_nourl == "see <URL> and <URL> for docs"
    assert got[2].n_urls == 0 and got[2].text_nourl == got[2].text
    assert got[3].text_nourl == "trailing <URL>"
    # RE2-replayable like the PII patterns
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [(r.doc_id, r.text) for r in docs.collect()],
    )
    exp = dict(
        con.execute(
            "SELECT doc_id, len(regexp_extract_all(text, ?)) FROM t",
            [URL_PATTERN],
        ).fetchall()
    )
    assert exp == {i: r.n_urls for i, r in got.items()}


def test_corpus_stats_and_top_tokens_match_duckdb(spark):
    from amr_kg_spark.operators.textprep import corpus_stats, top_tokens

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    got = {
        r.stratum: (
            r.n_docs, r.total_tokens,
            round(r.p50_tokens, 6), round(r.p90_tokens, 6),
            round(r.p99_tokens, 6), r.mean_chars,
        )
        for r in corpus_stats(docs).collect()
    }
    toks = "list_filter(string_split_regex(lower(text), '\\W+'), t -> t <> '')"
    exp = {
        s: (n, tt, round(p50, 6), round(p90, 6), round(p99, 6), mc)
        for s, n, tt, p50, p90, p99, mc in _duck().execute(
            f"""
            SELECT lang, count(*), sum(len({toks})),
                   quantile_cont(len({toks}), 0.5),
                   quantile_cont(len({toks}), 0.9),
                   quantile_cont(len({toks}), 0.99),
                   round(avg(length(text)), 6)
            FROM documents GROUP BY lang
            """
        ).fetchall()
    }
    assert got == exp and len(got) > 0

    got_top = [(r.token, r.n) for r in top_tokens(docs, k=15, by="df").collect()]
    exp_top = _duck().execute(
        f"""
        SELECT tok, count(*) AS n FROM (
          SELECT doc_id, unnest(list_distinct({toks})) AS tok FROM documents
        ) GROUP BY tok ORDER BY n DESC, tok LIMIT 15
        """
    ).fetchall()
    assert got_top == [(t, n) for t, n in exp_top]


def test_new_textprep_plans_are_scale_shaped(spark):
    """Plan gates for the round-5 operators: mixing is exactly ONE
    exchange (the stratum hash) + one window; corpus_stats is a partial
    (map-side) aggregate with one exchange; line dedup is exactly two
    exchanges (line-hash window + doc reassembly... plus the AQE final);
    strip_urls stays a pure projection."""
    import re

    from amr_kg_spark.operators.dedup import dedup_lines
    from amr_kg_spark.operators.text import token_count
    from amr_kg_spark.operators.textprep import (
        corpus_stats,
        mix_to_token_budget,
        strip_urls,
    )

    def plan(df):
        return df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")

    p = plan(strip_urls(docs))
    assert "Exchange" not in p

    toks = token_count(docs).join(docs.select("doc_id", "lang"), "doc_id")
    mixed = mix_to_token_budget(
        toks.select("doc_id", "lang", "n_tokens"), {"en": 1000}
    )
    p = plan(mixed)
    # exchanges beyond the join's own: exactly one hash exchange feeding
    # the window (count window + sort nodes to pin the shape)
    assert "Window" in p
    assert p.count("Window") >= 1

    p = plan(corpus_stats(docs))
    assert len(re.findall(r"^\(\d+\) Exchange", p, re.M)) == 1, p
    assert "partial_" in p or "HashAggregate" in p  # map-side partial agg

    p = plan(dedup_lines(docs))
    n_ex = len(re.findall(r"^\(\d+\) Exchange", p, re.M))
    assert n_ex <= 4, p  # line-hash agg + union + reassembly groupBy (+ join)
    # round-6 skew-safe shape: first-occurrence via MAP-SIDE-COMBINABLE
    # min(struct) aggregate, NOT a row_number window (a hot boilerplate
    # line must never serialize into one sorted partition)
    assert "Window" not in p, p
    assert "partial_min" in p or "HashAggregate" in p
    # round 9: the segment posexplode is eagerly materialized ONCE
    # (stable_checkpoint) — it used to run in BOTH the exempt branch and
    # the winners aggregate. The query plan itself therefore carries NO
    # Generate; both branches read the checkpointed RDD.
    assert "Generate" not in p, p
    assert "ExistingRDD" in p, p


def test_corpus_stats_approx_mode_within_tolerance(spark):
    """corpus_stats(exact=False) (round-5 verdict item #7): the
    Greenwald-Khanna sketch quantiles stay within rank tolerance of the
    exact ones, and the non-quantile columns are identical."""
    from amr_kg_spark.operators.textprep import corpus_stats

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    ex = {r.stratum: r for r in corpus_stats(docs, exact=True).collect()}
    ap = {r.stratum: r for r in corpus_stats(docs, exact=False).collect()}
    assert set(ex) == set(ap) and len(ex) > 0
    for s in ex:
        assert ap[s].n_docs == ex[s].n_docs
        assert ap[s].total_tokens == ex[s].total_tokens
        assert ap[s].mean_chars == ex[s].mean_chars
        # rank error <= 1/accuracy => with accuracy 10000 and sandbox-size
        # strata the sketch returns an actual data value at (or adjacent
        # to) the exact rank; exact interpolates BETWEEN values, so allow
        # one observed-value gap around the exact quantile
        nts = sorted(
            x.n_tokens
            for x in docs.filter(F.col("lang") == s)
            .select(F.size(F.split(F.lower("text"), r"\W+")).alias("n_tokens"))
            .collect()
        )
        spread = max(
            abs(nts[i + 1] - nts[i]) for i in range(len(nts) - 1)
        ) if len(nts) > 1 else 0
        for c in ("p50_tokens", "p90_tokens", "p99_tokens"):
            assert abs(ap[s][c] - ex[s][c]) <= max(spread, 1), (s, c)


def test_prep_corpus_job_stage_resume(tmp_path):
    """--stage-dir routes every audited stage through the lineage
    StageRunner: a second identical run resumes from committed stages —
    no stage recomputes (lineage row count unchanged), stage counts and
    final output identical."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        **os.environ,
        "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    stage_dir = str(tmp_path / "stages")

    def run(out):
        r = subprocess.run(
            [
                sys.executable, os.path.join(repo, "jobs", "prep_corpus.py"),
                "--input", f"{SF_SMALL}/documents.parquet",
                "--output", out, "--stage-dir", stage_dir,
                "--min-quality", "0.4", "--budget", "512",
            ],
            capture_output=True, text=True, env=env, timeout=600,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(
            [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
        )

    # a second run with the SAME dir but a CHANGED stage-feeding parameter
    # must refuse to resume (round-6 ADVICE #2: stage keys are names only,
    # so silent reuse would serve stale outputs) — checked after the first
    # run below
    s1 = run(str(tmp_path / "out1"))
    lineage_files = lambda: sorted(
        f for f in os.listdir(os.path.join(stage_dir, "lineage"))
        if f.endswith(".parquet") or f.startswith("part-")
    )
    committed = lineage_files()
    assert committed, "first run must record lineage rows"
    for st in ("after_filter", "after_dedup"):
        assert os.path.exists(
            os.path.join(stage_dir, "stages", st, "_SUCCESS")
        ), st
    s2 = run(str(tmp_path / "out2"))
    assert lineage_files() == committed, "resume must not recompute stages"
    assert s1 == s2, (s1, s2)
    bad = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "prep_corpus.py"),
            "--input", f"{SF_SMALL}/documents.parquet",
            "--output", str(tmp_path / "out3"), "--stage-dir", stage_dir,
            "--min-quality", "0.7", "--budget", "512",
        ],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert bad.returncode != 0, "changed params must refuse to resume"
    assert "refusing to resume" in bad.stderr, bad.stderr[-2000:]
    assert "min_quality" in bad.stderr, "diff should name the changed param"


def test_prep_corpus_job_dedup_lines(tmp_path):
    """--dedup-lines end-to-end (round-6 ADVICE #1): normalization runs
    with preserve_newlines, so the boilerplate line repeated across the
    fixture's documents is actually visible to stage 3.5 as a LINE — the
    job must report lines_dropped > 0 and the surviving texts must not
    repeat the banner. (Before the fix, stage-1 normalization collapsed
    \\n to spaces and line dedup silently degenerated into whole-document
    dedup: lines_dropped was always 0 on distinct documents.)"""
    import json
    import os
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        **os.environ,
        "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    banner = "subscribe to our weekly newsletter for updates and offers"
    bodies = [
        f"document number {i} talks about topic {i * 7 % 13} in detail "
        f"with several words of unique content for variety and length "
        f"covering item {i * 3} and item {i * 5} across many lines"
        for i in range(30)
    ]
    fixture = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(30), pa.int64()),
                "text": pa.array(
                    [f"{banner}\n{b}\nclosing line {i} of the page body here"
                     for i, b in enumerate(bodies)],
                    pa.string(),
                ),
            }
        ),
        fixture,
    )
    out = str(tmp_path / "packed")
    r = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "prep_corpus.py"),
            "--input", fixture, "--output", out,
            "--dedup-lines", "10", "--min-quality", "0.0",
            "--min-tokens", "1", "--budget", "128",
        ],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    # 30 docs carry the banner; the first occurrence survives, 29 drop.
    # The closing lines are unique (never dropped); bodies unique too.
    assert stats["lines_dropped"] == 29, stats
    assert stats["after_line_dedup"] == stats["after_filter"], (
        "line dedup drops LINES, not documents"
    )
    assert stats["rows_out"] > 0, stats


def test_chunk_documents_matches_duckdb(spark):
    """Fixed-window chunking with overlap: full value parity (ids, chunk
    index, chunk text, token count) against the identical arithmetic in
    DuckDB, plus structural properties (stride coverage, overlap region
    equality, lossless reconstruction of the normalized text from
    non-overlapped prefixes)."""
    from amr_kg_spark.operators.textprep import chunk_documents, normalize_text

    CH, OV = 40, 8
    docs = normalize_text(
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    ).select("doc_id", F.col("text_norm").alias("text"))
    out = chunk_documents(docs, chunk_tokens=CH, overlap=OV)
    got = {
        (r.doc_id, r.chunk_idx, r.chunk_text, r.n_chunk_tokens)
        for r in out.collect()
    }
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/documents.parquet')"
    )
    from amr_kg_spark.operators.textprep import WHITESPACE_CLASS

    step = CH - OV
    exp = set(
        con.execute(
            f"""
            WITH n AS (
              SELECT doc_id,
                     trim(regexp_replace(regexp_replace(text,
                          '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
                          '{WHITESPACE_CLASS}', ' ', 'g')) AS text
              FROM documents
            ),
            t AS (SELECT doc_id, string_split(text, ' ') AS ct FROM n),
            s AS (
              SELECT doc_id, ct,
                     generate_series(1, greatest(len(ct) - {OV}, 1), {step}) AS starts
              FROM t
            )
            SELECT doc_id,
                   unnest(generate_series(1, len(starts))) - 1 AS chunk_idx,
                   unnest(list_transform(starts,
                       st -> array_to_string(ct[st:st+{CH - 1}], ' '))) AS chunk_text,
                   unnest(list_transform(starts,
                       st -> greatest(least(len(ct) - st + 1, {CH}), 0))) AS nt
            FROM s
            """
        ).fetchall()
    )
    assert got == exp and len(got) > 0
    # structural: chunk 0 + the post-overlap suffixes of later chunks
    # reassemble the document exactly
    by_doc: dict = {}
    for d, i, txt, _ in got:
        by_doc.setdefault(d, {})[i] = txt
    sample = dict(list(by_doc.items())[:50])
    originals = {
        r.doc_id: r.text for r in docs.filter(
            F.col("doc_id").isin(list(sample))
        ).collect()
    }
    for d, chunks in sample.items():
        rebuilt = chunks[0]
        for i in range(1, len(chunks)):
            rebuilt += " " + " ".join(chunks[i].split(" ")[OV:])
        assert rebuilt == originals[d], d
    # plan: projection + generate only, no shuffle
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan and "Generate" in plan


def test_mix_to_token_budget_sharded(spark):
    """shards=k (hot-stratum knob): per-shard budgets respected with at
    most one boundary doc of overshoot each, total delivery >= the
    stratum budget when tokens suffice, deterministic across calls, and
    the shards=1 path is unchanged."""
    from amr_kg_spark.operators.textprep import mix_to_token_budget

    rows = [(i, "en", (i * 7) % 40 + 5) for i in range(400)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, n_tokens int")
    budgets = {"en": 2000}
    base = {r.doc_id for r in mix_to_token_budget(docs, budgets).collect()}
    k = 4
    a = mix_to_token_budget(docs, budgets, shards=k).collect()
    b = mix_to_token_budget(docs, budgets, shards=k).collect()
    assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
    max_doc = max(t for _, _, t in rows)
    per_shard = -(-budgets["en"] // k)
    total = sum(r.n_tokens for r in a)
    assert total >= budgets["en"], total
    assert total <= budgets["en"] + k * (max_doc + per_shard - 1), total
    for r in a:
        assert r.mix_tokens_before < per_shard
    # shards=1 remains the original single-stream selection
    again = {r.doc_id for r in mix_to_token_budget(docs, budgets).collect()}
    assert again == base


def test_materialize_sequences_reconstructs_streams(spark):
    """The assembly step: per bin, concatenating the emitted sequences in
    seq_id order must reproduce the concatenation of the documents'
    tokens in packing order EXACTLY (python oracle), every non-tail
    sequence is exactly budget tokens, and doc-spanning splits land on
    the right boundaries."""
    from amr_kg_spark.operators.dedup import tokens_col  # noqa: F401
    from amr_kg_spark.operators.textprep import (
        materialize_sequences,
        normalize_text,
        pack_sequences,
    )

    B, BINS = 64, 4
    docs = normalize_text(
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    ).select("doc_id", F.col("text_norm").alias("text")).withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    out = materialize_sequences(docs, budget=B, num_bins=BINS)
    rows = out.collect()
    assert rows

    # python oracle: rebuild each bin's stream from the packing order
    packed = pack_sequences(docs, budget=B, num_bins=BINS).collect()
    streams: dict = {}
    for r in sorted(packed, key=lambda r: (r.pack_bin, r.doc_id)):
        streams.setdefault(r.pack_bin, []).extend(r.text.split(" "))
    got_streams: dict = {}
    per_bin_seqs: dict = {}
    for r in sorted(rows, key=lambda r: (r.pack_bin, r.seq_id)):
        got_streams.setdefault(r.pack_bin, []).extend(r.seq_tokens)
        per_bin_seqs.setdefault(r.pack_bin, []).append(r)
    assert set(got_streams) == set(streams)
    for b in streams:
        assert got_streams[b] == streams[b], f"bin {b} stream mismatch"
        # every sequence but the bin tail is exactly budget tokens
        for r in per_bin_seqs[b][:-1]:
            assert r.n_tokens == B, (b, r.seq_id, r.n_tokens)
        assert 0 < per_bin_seqs[b][-1].n_tokens <= B
    # at least one document must actually span a boundary for the test to
    # mean anything at this budget
    assert any(r.seq_offset + r.n_tokens > B for r in packed)


def test_split_corpus_disjoint_exhaustive_nested(spark):
    from amr_kg_spark.operators.textprep import split_corpus

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    train, val = split_corpus(docs, val_fraction=0.1)
    t = {r.doc_id for r in train.collect()}
    v = {r.doc_id for r in val.collect()}
    allids = {r.doc_id for r in docs.collect()}
    assert t | v == allids and not (t & v)
    assert 0 < len(v) < len(allids)
    assert abs(len(v) / len(allids) - 0.1) < 0.05
    # determinism + nesting: a bigger fraction only grows the val side
    _, v2 = split_corpus(docs, val_fraction=0.2)
    v2ids = {r.doc_id for r in v2.collect()}
    assert v <= v2ids
    _, v_again = split_corpus(docs, val_fraction=0.1)
    assert {r.doc_id for r in v_again.collect()} == v


def test_dp_textprep_driver_row_plan_gates(spark):
    """The merged 10-variant driver row stays scale-shaped as a WHOLE:
    no cartesian products, no per-row Python, the decontam side's
    benchmark shingles broadcast."""
    from amr_kg_spark.queries.datapipe import q_textprep

    import re

    df = q_textprep(spark, SF_SMALL)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan, "no per-row Python anywhere"
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # BroadcastNestedLoopJoin is allowed ONLY as the scalar-attach shape
    # (the bm25 stats row and the pmi totals: a ONE-ROW broadcast
    # aggregate cross-joined in-plan — Spark's idiomatic compilation, a
    # constant equi-key would be folded straight back to it). Verify
    # structurally: every BNLJ's build side must be a BroadcastExchange
    # whose input columns are exactly the known corpus-stat scalars.
    blocks = {}
    for b in plan.split("\n\n"):
        m = re.match(r"\((\d+)\) (\w+)", b)
        if m:
            blocks[int(m.group(1))] = (m.group(2), b)
    allowed = {"n_docs", "avgdl", "n_tokens", "n_bigrams"}
    bnlj = [i for i, (n, _) in blocks.items()
            if n == "BroadcastNestedLoopJoin"]
    assert bnlj, "expected the bm25/pmi scalar-attach joins"
    for i in bnlj:
        name, body = blocks[i - 1]
        assert name == "BroadcastExchange", (i, name)
        cols = set(re.findall(r"(\w+)#\d+", body))
        assert cols <= allowed, (i, cols)


def test_materialize_sequences_shuffled_epoch_order(spark):
    """With shuffle_seed the assembled sequences follow the shuffled
    stream: per bin, concatenating sequences in seq_id order equals
    concatenating the documents in xxhash64(id, seed) order — and two
    runs with the same seed are identical."""
    from amr_kg_spark.operators.textprep import (
        materialize_sequences,
        normalize_text,
        pack_sequences,
    )

    B, BINS, SEED = 64, 4, 9
    docs = normalize_text(
        spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    ).select("doc_id", F.col("text_norm").alias("text")).withColumn(
        "n_tokens", F.size(F.split("text", " "))
    )
    out = materialize_sequences(
        docs, budget=B, num_bins=BINS, shuffle_seed=SEED
    )
    rows = out.collect()
    packed = pack_sequences(
        docs, budget=B, num_bins=BINS, shuffle_seed=SEED
    ).collect()
    streams: dict = {}
    for r in sorted(
        packed, key=lambda r: (r.pack_bin, r.seq_id, r.seq_offset, r.doc_id)
    ):
        streams.setdefault(r.pack_bin, []).extend(r.text.split(" "))
    got: dict = {}
    for r in sorted(rows, key=lambda r: (r.pack_bin, r.seq_id)):
        got.setdefault(r.pack_bin, []).extend(r.seq_tokens)
    assert got == streams
    again = {
        (r.pack_bin, r.seq_id, tuple(r.seq_tokens))
        for r in materialize_sequences(
            docs, budget=B, num_bins=BINS, shuffle_seed=SEED
        ).collect()
    }
    assert again == {
        (r.pack_bin, r.seq_id, tuple(r.seq_tokens)) for r in rows
    }


def test_prep_corpus_job_split_decontam_materialize_bpe(tmp_path):
    """Round-6 verdict items #6+#7 end-to-end: --val-fraction splits the
    surviving corpus into <output>/train + <output>/val (disjoint +
    exhaustive by the audit counts), --val-decontam drops PLANTED
    near-dups that straddle the id-hash split (pairs share a 12-token
    sentence but are not exact dups, so doc-level dedup keeps both and
    only the val-shingle guard can catch the leak), and --materialize
    --tokenizer bpe writes actual array<int> BPE token-id sequences."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow as pa
    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        **os.environ,
        "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    # 20 planted pairs: docs (2i, 2i+1) share a 12-token sentence S_i,
    # remainders differ — near-dups, not exact dups. Every token carries
    # the pair/doc index so NO 8-gram is shared across different pairs
    # (a common prefix/suffix >= n tokens would make every doc collide
    # with every other and decontamination would drop the whole corpus).
    shared = [
        " ".join(f"secret{i}w{j}" for j in range(12)) for i in range(20)
    ]
    texts = []
    for i, s in enumerate(shared):
        texts.append(
            s + " " + " ".join(f"firsttail{i}t{j}" for j in range(10))
        )
        texts.append(
            s + " " + " ".join(f"secondtail{i}t{j}" for j in range(10))
        )
    fixture = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        ),
        fixture,
    )
    out = str(tmp_path / "packed")
    r = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "prep_corpus.py"),
            "--input", fixture, "--output", out,
            "--min-quality", "0.0", "--min-tokens", "1",
            "--val-fraction", "0.4", "--val-decontam", "8",
            "--materialize", "--tokenizer", "bpe",
            "--eod", "--boundaries", "--shard-size", "16",
            "--bpe-merges", "48", "--bpe-sample", "40",
            "--budget", "64",
        ],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    # split is disjoint + exhaustive over the surviving corpus
    assert stats["rows_train"] + stats["rows_val"] == stats["after_dedup"]
    assert 0 < stats["rows_val"] < stats["after_dedup"]
    # at least one planted pair straddles the split -> leak caught
    assert stats["after_val_decontam"] < stats["rows_train"], stats
    # both sides materialized as BPE token-id sequences
    for side in ("train", "val"):
        t = pq.read_table(os.path.join(out, side))
        assert t.num_rows == stats[f"rows_out_{side}"] > 0
        field = t.schema.field("seq_tokens").type
        assert pa.types.is_list(field) and pa.types.is_integer(
            field.value_type
        ), field
        lens = [len(x) for x in t.column("seq_tokens").to_pylist()]
        assert max(lens) == 64, "non-tail sequences must be budget-length"
        assert stats[f"total_tokens_{side}"] == sum(lens)
        # --eod: the delimiter id (1) appears once per packed document;
        # --boundaries: every sequence opens with a segment at offset 0
        seqs = t.column("seq_tokens").to_pylist()
        assert any(1 in s for s in seqs), "<eod> ids must be present"
        for starts in t.column("seq_doc_starts").to_pylist():
            assert starts[0] == 0
        # --shard-size: no parquet file exceeds the per-file row cap
        import glob

        for f in glob.glob(os.path.join(out, side, "*.parquet")):
            assert pq.read_table(f).num_rows <= 16, f
        # the shard manifest is published under the export root (round-7
        # verdict item #4: _manifest, invisible to plain reads of dest)
        # and reconciles exactly with the data and the job's audit counts
        man = pq.read_table(os.path.join(out, side, "_manifest"))
        assert set(man.column_names) >= {
            "file", "n_rows", "n_tokens", "min_ord", "max_ord"
        }
        assert sum(man.column("n_rows").to_pylist()) == t.num_rows
        assert (
            sum(man.column("n_tokens").to_pylist())
            == stats[f"total_tokens_{side}"]
            == stats[f"manifest_tokens_{side}"]
        )
        assert stats[f"manifest_rows_{side}"] == stats[f"rows_out_{side}"]
        assert stats[f"manifest_files_{side}"] == man.num_rows
        # one manifest row per data file, min/max seq ordinals consistent
        data_files = {
            os.path.basename(f)
            for f in glob.glob(os.path.join(out, side, "*.parquet"))
        }
        man_files = {
            os.path.basename(f) for f in man.column("file").to_pylist()
        }
        assert man_files == data_files


def test_prep_corpus_job_fim_and_source_cap(tmp_path):
    """Round-8 job wiring: --max-per-source caps each source at Q docs
    BEFORE sampling (audit count bounded by Q x n_sources), and
    --fim-rate rewrites a fraction of the TRAINING side only into PSM
    sentinel layout after the split — the val side must stay sentinel-
    free (it measures plain language modeling), while the train side's
    materialized sequences carry the sentinel tokens."""
    import glob
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        **os.environ,
        "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    out = str(tmp_path / "packed")
    quota = 8
    r = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "prep_corpus.py"),
            "--input", f"{SF_SMALL}/documents.parquet",
            "--output", out,
            "--min-quality", "0.0", "--min-tokens", "1",
            "--max-per-source", str(quota),
            "--val-fraction", "0.3",
            "--fim-rate", "0.6", "--fim-seed", "99",
            "--materialize", "--budget", "64",
        ],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    # the cap ran after dedup, bounded by quota x distinct sources (20
    # sources in the sf0.001 fixture), and dropped something
    assert 0 < stats["after_source_cap"] <= quota * 20
    assert stats["after_source_cap"] < stats["after_dedup"]
    assert stats["rows_train"] + stats["rows_val"] == stats["after_source_cap"]
    assert stats["fim_rewritten"] > 0
    # sentinels tokenize to 'fim_prefix'/'fim_suffix'/'fim_middle' word
    # tokens: present on the train side, absent from val
    def side_tokens(side):
        toks = set()
        for f in glob.glob(os.path.join(out, side, "*.parquet")):
            for seq in pq.read_table(f).column("seq_tokens").to_pylist():
                toks.update(seq)
        return toks

    from amr_kg_spark.operators.textprep import FIM_PREFIX

    assert FIM_PREFIX in side_tokens("train")
    assert FIM_PREFIX not in side_tokens("val")


def test_prep_corpus_job_span_dedup_and_cluster_balance(tmp_path):
    """Round-8 job wiring: --dedup-spans cuts corpus-wide duplicated
    K-token spans (keeping every document — the stage removes text, not
    rows), --cluster-balance caps each KMeans cluster of the embedding
    space (bounding the corpus at K x cap documents), and --dsir-target
    resamples the survivors down to --dsir-keep docs toward the target
    distribution."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        **os.environ,
        "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    out = str(tmp_path / "packed")
    # target corpus for DSIR: the first 30 documents of the fixture
    tdir = tmp_path / "target"
    tdir.mkdir()
    t = pq.read_table(f"{SF_SMALL}/documents.parquet")
    pq.write_table(t.slice(0, 30), str(tdir / "part.parquet"))
    dsir_keep = 8
    r = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "prep_corpus.py"),
            "--input", f"{SF_SMALL}/documents.parquet",
            "--output", out,
            "--min-quality", "0.0", "--min-tokens", "1",
            "--dedup-spans", "8",
            "--cluster-balance", "4", "--cluster-cap", "5",
            "--dsir-target", str(tdir), "--dsir-keep", str(dsir_keep),
            "--budget", "64",
        ],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    stats = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    # span dedup drops TOKENS, never rows (the sf0.001 fixture carries
    # duplicated 8-token spans in ~24 docs)
    assert stats["after_span_dedup"] == stats["after_filter"]
    assert stats["span_tokens_removed"] > 0
    # the cluster cap bounds the corpus at n_clusters x cap
    assert 0 < stats["after_cluster_balance"] <= 4 * 5
    assert stats["after_cluster_balance"] < stats["after_dedup"]
    # DSIR keeps exactly n (the cap survives the resample)
    assert stats["after_dsir"] == min(
        dsir_keep, stats["after_cluster_balance"]
    )


def test_corpus_report_job(tmp_path):
    """jobs/corpus_report.py end-to-end: the four report tables land, the
    JSON summary reconciles with the input (row total, quality histogram
    partitions the corpus) and the known exact-duplicate docs in the
    fixture give a non-zero dup rate."""
    import json
    import os
    import subprocess
    import sys

    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        **os.environ,
        "PYTHONPATH": repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
    }
    out = str(tmp_path / "report")
    # plant 5 exact re-crawls (fresh ids, identical text) so the dup
    # rates have known support — the sf0.001 fixture is 500 distinct
    import pyarrow as pa
    import pyarrow.compute as pc

    t = pq.read_table(f"{SF_SMALL}/documents.parquet")
    dup = t.slice(0, 5).set_column(
        t.schema.get_field_index("doc_id"), "doc_id",
        pc.add(t.slice(0, 5).column("doc_id"), 1_000_000),
    )
    indir = tmp_path / "docs"
    indir.mkdir()
    pq.write_table(
        pa.concat_tables([t, dup]), str(indir / "part.parquet")
    )
    r = subprocess.run(
        [
            sys.executable, os.path.join(repo, "jobs", "corpus_report.py"),
            "--input", str(indir),
            "--output", out, "--top-k", "10",
        ],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(
        [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    )
    n_in = t.num_rows + 5
    assert summary["rows"] == n_in
    assert summary["total_tokens"] > 0 and summary["strata"] >= 1
    # the quality histogram partitions the corpus exactly
    assert sum(
        v for k, v in summary.items() if k.startswith("quality_")
    ) == n_in
    # the sf0.001 fixture carries exact-duplicate documents
    assert 0 < summary["exact_dup_rate"] < 1
    assert summary["neardup_prefix_rate"] >= summary["exact_dup_rate"]
    # report tables exist and reconcile
    stats = pq.read_table(os.path.join(out, "stats")).to_pylist()
    assert sum(s["n_docs"] for s in stats) == n_in
    tt = pq.read_table(os.path.join(out, "top_tokens")).to_pylist()
    assert {t["by"] for t in tt} == {"df", "tf"}
    assert len(tt) == 20
