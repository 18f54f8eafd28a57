"""Relational operator queries over the TPC-H-ish testdata (SURVEY §2).

One query per operator family; filled in milestone 2.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
