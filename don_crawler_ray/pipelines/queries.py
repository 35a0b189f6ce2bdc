"""Operator-coverage queries + DuckDB oracle SQL (driver contract).

``QUERIES`` maps query name -> callable(sf_dir) -> Dataset / DataFrame /
pyarrow Table; ``ORACLE_SQL`` maps the same names to equivalent DuckDB
SQL over the pre-registered testdata views. Non-SQL-expressible ops
(crawl pipeline, minhash, ANN...) appear only in ``QUERIES`` and get the
driver's rows-only check plus dedicated pytest oracles.
"""

from __future__ import annotations

QUERIES: dict = {}
ORACLE_SQL: dict = {}
