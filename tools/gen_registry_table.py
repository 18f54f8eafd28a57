"""Generate the registry audit table in COVERAGE.md (round-5 verdict
item #6): one row per driver-registry query — its variants (EXECUTED at
sf0.001 and read from the result, not hand-maintained), the engine
operators its source actually calls (AST-resolved against the query
function's globals, so a renamed or dropped operator breaks the table
loudly), and oracle presence.

Usage:  python tools/gen_registry_table.py [--check]

--check regenerates and exits 1 if COVERAGE.md is stale (the pytest in
tests/test_registry_doc.py runs the same comparison).
"""

from __future__ import annotations

import ast
import inspect
import os
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BEGIN = "<!-- BEGIN GENERATED REGISTRY TABLE (tools/gen_registry_table.py) -->"
END = "<!-- END GENERATED REGISTRY TABLE -->"

SF_SMALL = "/root/testdata/sf0.001"


def _operator_calls(fn, _depth: int = 0, _seen: set | None = None) -> list[str]:
    """Names of amr_kg_spark functions the query function's source calls,
    resolved through its globals (module-alias attributes like D.foo and
    bare imported names alike). Recurses one level into helpers from the
    queries/realdata layers so a query that composes through a local
    helper still shows the operators it reaches."""
    seen = _seen if _seen is not None else set()
    if fn in seen or _depth > 2:
        return []
    seen.add(fn)
    try:
        src = textwrap.dedent(inspect.getsource(fn))
    except (OSError, TypeError):
        return []
    tree = ast.parse(src)
    g = fn.__globals__
    # function-local `from ..operators.x import y` imports are invisible
    # in __globals__; resolve them explicitly
    local: dict[str, object] = {}
    fn_pkg = fn.__module__.rsplit(".", 1)[0]
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module is not None:
            mod_path = node.module
            if node.level:
                parts = fn.__module__.split(".")
                base = ".".join(parts[: len(parts) - node.level])
                mod_path = f"{base}.{node.module}" if base else node.module
            try:
                import importlib

                mod = importlib.import_module(mod_path)
            except Exception:
                continue
            for alias in node.names:
                local[alias.asname or alias.name] = getattr(
                    mod, alias.name, None
                )
    del fn_pkg
    found: set[str] = set()
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        tgt = node.func
        obj = None
        if isinstance(tgt, ast.Attribute) and isinstance(tgt.value, ast.Name):
            mod = local.get(tgt.value.id) or g.get(tgt.value.id)
            obj = getattr(mod, tgt.attr, None) if mod is not None else None
        elif isinstance(tgt, ast.Name):
            obj = local.get(tgt.id) or g.get(tgt.id)
        if obj is None or not callable(obj):
            continue
        mod_name = getattr(obj, "__module__", "") or ""
        if mod_name.startswith("amr_kg_spark.operators") or mod_name in (
            "amr_kg_spark.refgraph",
        ):
            short = mod_name.rsplit(".", 1)[-1]
            found.add(f"{short}.{obj.__name__}")
        elif mod_name.startswith("amr_kg_spark"):
            found.update(_operator_calls(obj, _depth + 1, seen))
    return sorted(found)


def _variants(df) -> list[str]:
    if "variant" not in df.columns:
        return []
    return sorted(r[0] for r in df.select("variant").distinct().collect())


def generate(spark) -> str:
    from amr_kg_spark.queries import all_queries

    queries, oracles = all_queries()
    lines = [
        BEGIN,
        "",
        "| # | query | variants (executed) | operators called (AST-resolved) | oracle |",
        "|---|---|---|---|---|",
    ]
    for i, (name, fn) in enumerate(queries.items(), 1):
        df = fn(spark, SF_SMALL)
        variants = _variants(df)
        ops = _operator_calls(fn)
        lines.append(
            "| {} | {} | {} | {} | {} |".format(
                i,
                name,
                ", ".join(variants) if variants else "—",
                ", ".join(ops) if ops else "(inline DataFrame/SQL)",
                "value" if oracles.get(name) else "rows-only",
            )
        )
    lines += ["", END]
    return "\n".join(lines)


def main() -> int:
    check = "--check" in sys.argv
    from amr_kg_spark.session import get_spark

    spark = get_spark(cores="8")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        table = generate(spark)
    finally:
        spark.stop()

    path = os.path.join(REPO, "COVERAGE.md")
    text = open(path).read()
    if BEGIN in text and END in text:
        head, rest = text.split(BEGIN, 1)
        _, tail = rest.split(END, 1)
        new = head + table + tail
    else:
        new = text.rstrip() + "\n\n## Registry audit table (generated)\n\n" + table + "\n"
    if check:
        if new != text:
            print("COVERAGE.md registry table is STALE — rerun "
                  "tools/gen_registry_table.py")
            return 1
        print("registry table current")
        return 0
    open(path, "w").write(new)
    print("wrote registry table:", len(table.splitlines()) - 4, "rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
