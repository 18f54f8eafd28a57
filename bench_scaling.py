"""Two-cluster-size scaling evidence (north_rule: efficiency >= 0.8
between N and 4N executors; sandbox stand-in: local[8] vs local[32]).

Runs the flagship KG extraction (mention detection -> co-occurrence pairs
-> literal-map linking -> distinct triples) over a large synthetic
transcript table (spark.range-generated — no input-I/O bottleneck, pure
compute+shuffle) at both parallelism levels in SEPARATE JVMs, and writes
BENCH/BASELINE.md. Two detector variants are measured:

- udf: Arrow pandas-UDF gazetteer scan (the north-star mandated surface)
- jvm: regexp_extract_all inside whole-stage codegen (zero Python)

Walls are min-of-4 after a warmup run — this box shows up to 20% steal
time from noisy neighbors, so single runs are unreliable.

Usage: python bench_scaling.py [n_turns]         (default 12_000_000)
Child:  python bench_scaling.py --child <cores> <n_turns> <variant>
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPEATS = 4


def child(cores: int, n_turns: int, variant: str) -> None:
    from amr_kg_spark.fixtures import synth_transcripts
    from amr_kg_spark.operators.mentions import detect_mentions, detect_mentions_jvm
    from amr_kg_spark.operators.triples import (
        build_triples,
        cooccurrence_pairs,
        resolve_pairs,
    )
    from amr_kg_spark.session import get_spark

    detect = detect_mentions if variant == "udf" else detect_mentions_jvm
    spark = get_spark(app_name=f"scaling-{variant}-{cores}", cores=cores)
    spark.sparkContext.setLogLevel("ERROR")
    t = synth_transcripts(spark, n_turns=n_turns, n_convs=1000, hot_frac=0.1)
    triples = build_triples(resolve_pairs(spark, cooccurrence_pairs(detect(t))))

    triples.write.format("noop").mode("overwrite").save()  # warmup
    walls = []
    for _ in range(REPEATS):
        t0 = time.monotonic()
        triples.write.format("noop").mode("overwrite").save()
        walls.append(time.monotonic() - t0)
    wall = min(walls)
    print(
        json.dumps(
            {
                "variant": variant,
                "cores": cores,
                "n_turns": n_turns,
                "wall_sec": round(wall, 3),
                "walls": [round(w, 3) for w in walls],
                "turns_per_sec": round(n_turns / wall, 1),
            }
        )
    )
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
        return

    n_turns = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    results: dict[str, dict[int, dict]] = {}
    for variant in ("udf", "jvm"):
        results[variant] = {}
        for cores in (8, 32):
            out = subprocess.run(
                [
                    sys.executable,
                    __file__,
                    "--child",
                    str(cores),
                    str(n_turns),
                    variant,
                ],
                capture_output=True,
                text=True,
                check=True,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            results[variant][cores] = json.loads(line)
            print(line)

    rows = []
    for variant in ("udf", "jvm"):
        tp8 = results[variant][8]["turns_per_sec"]
        tp32 = results[variant][32]["turns_per_sec"]
        eff = (tp32 / tp8) / 4
        rows.append((variant, tp8, tp32, tp32 / tp8, eff))
        print(
            json.dumps(
                {
                    "variant": variant,
                    "throughput_local8": tp8,
                    "throughput_local32": tp32,
                    "speedup": round(tp32 / tp8, 3),
                    "scaling_efficiency": round(eff, 3),
                }
            )
        )

    os.makedirs("BENCH", exist_ok=True)
    table = "\n".join(
        f"| {v} | {results[v][8]['wall_sec']} | {tp8:,.0f} | "
        f"{results[v][32]['wall_sec']} | {tp32:,.0f} | {sp:.2f}x | {eff:.3f} |"
        for v, tp8, tp32, sp, eff in rows
    )
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH — measured numbers (sandbox)

## Scaling evidence (north_rule: efficiency >= 0.8 between N and 4N)

Flagship KG extraction (mention detection -> higher-order co-occurrence
pairs -> literal-map linking -> distinct triples) over a synthetic
{n_turns:,}-turn transcript table (spark.range-generated), identical input
at both parallelism levels, separate JVMs, min of {REPEATS} repeats after
warmup (the sandbox shows up to ~20% CPU steal from co-tenants; raw
per-run walls are in the driver log).

| detector | local[8] wall (s) | turns/s @8 | local[32] wall (s) | turns/s @32 | speedup | efficiency |
|---|---|---|---|---|---|---|
{table}

Detector variants (identical output, asserted in tests):
- **udf** — Arrow pandas-UDF batch-blob gazetteer scan (north-star surface)
- **jvm** — regexp_extract_all in whole-stage codegen (zero Python)

The extraction has no shuffle before the final distinct (mentions + pairs
are computed inside the scan stage), so scaling is limited only by the
Python-worker pool (udf) / codegen throughput (jvm) plus the final dedup
exchange — the same profile a multi-executor cluster shows, where the
mention stage is embarrassingly parallel across input splits.

## Headline bench (sf0.1, local[32])

`python bench.py` — recorded per-round as BENCH_r*.json by the driver.
The reference publishes no numbers (BASELINE.md): it executes per-row
Python with per-row network calls, O(minutes) for O(10^3) rows.
"""
        )
    print("wrote BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
