"""Driver-contract query registry.

Each submodule exposes ``QUERIES: dict[str, Callable[[SparkSession, str],
DataFrame]]`` and ``ORACLES: dict[str, str]`` (DuckDB SQL over the driver's
pre-registered views). ``__spark_entry__`` merges them.
"""

from __future__ import annotations


def all_queries():
    from . import datapipe, kg, relational

    q = {}
    o = {}
    for mod in (kg, relational, datapipe):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    return q, o
