"""COVERAGE.md's registry audit table must stay mechanically current
(round-5 verdict item #6): regenerating it from the live registry —
variants EXECUTED at sf0.001, operator calls AST-resolved — must
reproduce the committed table byte-for-byte, so a registry change that
isn't reflected in the audit table fails CI."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_registry_table_current(spark):
    from gen_registry_table import BEGIN, END, generate

    table = generate(spark)
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    assert BEGIN in text and END in text, "run tools/gen_registry_table.py"
    committed = text.split(BEGIN, 1)[1].split(END, 1)[0]
    fresh = table.split(BEGIN, 1)[1].split(END, 1)[0]
    assert committed == fresh, (
        "COVERAGE.md registry table is stale — rerun tools/gen_registry_table.py"
    )
    # and the audit's core guarantees: 50 rows, no rows-only oracles
    rows = [
        l
        for l in fresh.splitlines()
        if l.startswith("| ") and not l.startswith("| # ") and "---" not in l
    ]
    assert len(rows) == 50
    assert all("| value |" in r for r in rows), "a registry row lost its value oracle"
