"""Training-data pipeline operators (dedup / similarity / text analysis).

Filled in milestone 3.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLES: dict = {}
