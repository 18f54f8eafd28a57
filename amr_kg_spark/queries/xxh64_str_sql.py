"""Spark-compatible xxhash64 over STRING columns as pure DuckDB SQL —
extends queries/xxh64_sql.py (the long / long+int-literal replica) to the
full variable-length XXH64 algorithm, so hash-of-text operators
(``corpus_fingerprints``' exact fp, the MinHash signature construction's
``xxhash64(shingle_string)`` base hashes) can carry FULL value oracles in
the driver's DuckDB gate.

Spark's ``F.xxhash64(stringcol)`` is reference XXH64 (seed 42) over the
string's UTF-8 bytes. The replica derives the byte stream in SQL
(codepoints via per-character split + ``ord``, then the standard UTF-8
expansion 1-4 bytes per codepoint), then executes the reference
algorithm:

- the 32-byte-stripe accumulator loop as a ``list_reduce`` whose state is
  a 4-element UBIGINT list (v1..v4) and whose element list is the stripe
  offsets — variable-length iteration WITHOUT recursive CTEs, linear SQL
  size;
- the merge, the <32-byte seed branch, and the bounded tail (up to three
  8-byte lanes, one 4-byte lane, up to three single bytes) as staged
  conditional columns (tail iteration counts are bounded by the
  algorithm, so unrolling is exact);
- the avalanche (fmix) reusing xxh64_sql's staged steps.

All arithmetic is mod-2^64 via UHUGEINT intermediates (DuckDB raises on
BIGINT overflow rather than wrapping). Verified bit-exact against
``F.xxhash64`` for ASCII and multi-byte unicode strings across lengths
spanning every branch (empty, <32, stripe boundaries, every tail shape)
in tests/test_datapipe.py.
"""

from __future__ import annotations

from .xxh64_sql import (
    _M64,
    _P1,
    _P2,
    _P3,
    _P4,
    _P5,
    _fmix_steps,
    _mod64,
    signed64,
    stage,
)

_SEED = 42
# stripe-loop initial accumulators for seed 42 (constants precomputed —
# the seed is fixed, Spark-side and here)
_V0 = [
    (_SEED + _P1 + _P2) & _M64,
    (_SEED + _P2) & _M64,
    _SEED & _M64,
    (_SEED - _P1) & _M64,
]


def _u(x: int) -> str:
    return f"CAST('{x}' AS UHUGEINT)"


def _mul_c(a: str, c: int) -> str:
    return _mod64(f"CAST({a} AS UHUGEINT) * {_u(c)}")


def _add_e(a: str, b: str) -> str:
    return _mod64(f"CAST({a} AS UHUGEINT) + CAST({b} AS UHUGEINT)")


def _rotl_e(x: str, r: int) -> str:
    # (x << r) | (x >> 64-r) with bit-disjoint halves, so + == |
    return _mod64(
        f"CAST({x} AS UHUGEINT) * {_u(1 << r)}"
        f" + CAST(({x}) >> {64 - r} AS UHUGEINT)"
    )


def _round(acc: str, lane: str) -> str:
    """XXH64_round: rotl31(acc + lane*P2) * P1, all mod 2^64."""
    s = _add_e(acc, _mul_c(lane, _P2))
    return _mul_c(_rotl_e(s, 31), _P1)


def _le_lane(blist: str, pos: str, nbytes: int) -> str:
    """Little-endian ``nbytes``-wide lane read from the 1-indexed byte
    list ``blist`` starting at 1-based position ``pos`` (UBIGINT out)."""
    terms = " + ".join(
        f"CAST({blist}[({pos}) + {k}] AS UBIGINT) * {1 << (8 * k)}"
        for k in range(nbytes)
    )
    return f"CAST({terms} AS UBIGINT)"


# UTF-8 expansion of one codepoint (DuckDB lambda body over `cp`)
_UTF8 = (
    "CASE WHEN cp < 128 THEN [cp] "
    "WHEN cp < 2048 THEN [192 + cp // 64, 128 + cp % 64] "
    "WHEN cp < 65536 THEN "
    "[224 + cp // 4096, 128 + (cp // 64) % 64, 128 + cp % 64] "
    "ELSE [240 + cp // 262144, 128 + (cp // 4096) % 64, "
    "128 + (cp // 64) % 64, 128 + cp % 64] END"
)


def spark_xxhash64_str_steps(col: str, out: str) -> list[tuple[str, str]]:
    """Staged columns computing ``F.xxhash64(col)`` (signed, Spark-
    identical) for a VARCHAR column ``col`` into ``out``. Intermediate
    column names are prefixed with ``out`` (same convention as
    xxh64_sql)."""
    b = f"{out}_b"
    n = f"{out}_n"
    ns = f"{out}_ns"  # number of 32-byte stripes
    st = f"{out}_st"  # post-stripe state [v1..v4]
    steps: list[tuple[str, str]] = []
    # bytes: per-char codepoints -> UTF-8 expansion -> flat byte list
    steps.append((
        b,
        f"CASE WHEN {col} = '' THEN CAST([] AS BIGINT[]) ELSE "
        f"flatten(list_transform("
        f"list_transform(regexp_split_to_array({col}, ''), c -> ord(c)), "
        f"cp -> {_UTF8})) END",
    ))
    steps.append((n, f"len({b})"))
    steps.append((ns, f"{n} // 32"))
    # stripe loop: list_reduce over [init_state, [off0], [off8]...] where
    # offsets are the 0-based stripe starts; state and elements share the
    # BIGINT-list type (offsets ride as single-element lists)
    init = "[" + ", ".join(
        f"CAST('{v}' AS UBIGINT)" for v in _V0
    ) + "]"
    lane = [  # the four 8-byte lanes of the stripe at 0-based offset x[1]
        _le_lane(b, f"CAST(x[1] AS BIGINT) + {8 * k} + 1", 8)
        for k in range(4)
    ]
    body = "[" + ", ".join(
        _round(f"acc[{k + 1}]", lane[k]) for k in range(4)
    ) + "]"
    offs = (
        f"list_transform(generate_series(0, {ns} - 1), "
        f"s -> [CAST(32 * s AS UBIGINT)])"
    )
    steps.append((
        st,
        f"list_reduce(list_prepend({init}, {offs}), (acc, x) -> {body})",
    ))
    # merge (>=32 bytes) or the short-input seed branch
    rot_sum = _mod64(
        " + ".join(
            f"CAST({_rotl_e(f'{st}[{k + 1}]', r)} AS UHUGEINT)"
            for k, r in ((0, 1), (1, 7), (2, 12), (3, 18))
        )
    )
    h = f"{out}_h0"
    steps.append((
        h,
        f"CASE WHEN {ns} = 0 THEN CAST('{(_SEED + _P5) & _M64}' AS UBIGINT)"
        f" ELSE {rot_sum} END",
    ))
    for k in range(4):  # mergeRound x4: h = (h ^ round(0, vk)) * P1 + P4
        nh = f"{out}_h{k + 1}"
        merged = _add_e(
            _mul_c(f"xor({h}, {_round('CAST(0 AS UBIGINT)', f'{st}[{k + 1}]')})", _P1),
            f"CAST('{_P4}' AS UBIGINT)",
        )
        steps.append((nh, f"CASE WHEN {ns} = 0 THEN {h} ELSE {merged} END"))
        h = nh
    # h += total length
    hl = f"{out}_hl"
    steps.append((hl, _add_e(h, f"CAST({n} AS UBIGINT)")))
    h = hl
    # tail: rem = n - 32*ns bytes left (< 32)
    rem = f"{out}_rem"
    steps.append((rem, f"{n} - 32 * {ns}"))
    # up to three 8-byte lanes: h = rotl27(h ^ round(0, lane)) * P1 + P4
    for t in range(3):
        nh = f"{out}_t8_{t}"
        lane8 = _le_lane(b, f"32 * {ns} + {8 * t} + 1", 8)
        stepped = _add_e(
            _mul_c(_rotl_e(f"xor({h}, {_round('CAST(0 AS UBIGINT)', lane8)})", 27), _P1),
            f"CAST('{_P4}' AS UBIGINT)",
        )
        steps.append((
            nh, f"CASE WHEN {rem} >= {8 * (t + 1)} THEN {stepped} ELSE {h} END"
        ))
        h = nh
    # one 4-byte lane: h = rotl23(h ^ (lane4 * P1)) * P2 + P3
    p4 = f"32 * {ns} + 8 * ({rem} // 8)"
    lane4 = _le_lane(b, f"{p4} + 1", 4)
    nh = f"{out}_t4"
    stepped4 = _add_e(
        _mul_c(_rotl_e(f"xor({h}, {_mul_c(lane4, _P1)})", 23), _P2),
        f"CAST('{_P3}' AS UBIGINT)",
    )
    steps.append((
        nh, f"CASE WHEN {rem} % 8 >= 4 THEN {stepped4} ELSE {h} END"
    ))
    h = nh
    # up to three single bytes: h = rotl11(h ^ (b * P5)) * P1
    pb = f"{p4} + CASE WHEN {rem} % 8 >= 4 THEN 4 ELSE 0 END"
    for t in range(3):
        nh = f"{out}_tb_{t}"
        byte = f"CAST({b}[({pb}) + {t} + 1] AS UBIGINT)"
        steppedb = _mul_c(
            _rotl_e(f"xor({h}, {_mul_c(byte, _P5)})", 11), _P1
        )
        steps.append((
            nh, f"CASE WHEN {rem} % 4 > {t} THEN {steppedb} ELSE {h} END"
        ))
        h = nh
    # avalanche + signed reinterpretation
    steps += _fmix_steps(h, f"{out}_u")
    steps.append((out, signed64(f"{out}_u")))
    return steps


def spark_xxhash64_str_sql(src: str, col: str, out: str) -> str:
    """``F.xxhash64(stringcol)`` (seed 42) as a staged DuckDB query over
    ``src``; result (signed, Spark-identical) in column ``out``."""
    return stage(src, spark_xxhash64_str_steps(col, out))
