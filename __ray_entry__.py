"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship crawl pipeline (schedule -> dedup ->
robots -> politeness budget -> fetch -> extract) over a deterministic
tiny synthetic frontier (FIXTURES.md F1; the input_hint table shape)
and also touches the sf0.001 testdata to validate the read contract.

Ray is initialised by the driver BEFORE this module is imported: no
``ray.init`` / ``ray.shutdown`` here or in the library.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

_FRONTIER_CACHE = "/tmp/don_crawler_frontier"


def _frontier_path(scale: str = "tiny", seed: int = 42) -> str:
    """Deterministic synthetic frontier parquet, cached under /tmp."""
    from don_crawler_ray.sources.frontier import generate_frontier_parquet

    os.makedirs(_FRONTIER_CACHE, exist_ok=True)
    path = os.path.join(_FRONTIER_CACHE, f"frontier_{scale}_s{seed}.parquet")
    if not os.path.exists(path):
        tmp = path + ".build"
        generate_frontier_parquet(tmp, scale=scale, seed=seed)
        os.replace(tmp, path)
    return path


def entry() -> Any:
    """Flagship crawl pipeline on the tiny synthetic frontier."""
    import ray

    from don_crawler_ray.pipelines.crawl import crawl_dataset
    from don_crawler_ray.sources.frontier import generate_politeness
    from don_crawler_ray.stages.schedule import PolitenessConfig

    # touch the driver-provided testdata to validate the read contract
    _ = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet").schema()

    politeness = PolitenessConfig.from_table(generate_politeness(42, 20))
    return crawl_dataset(_frontier_path("tiny"), politeness)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2.

    SQL-oracled entries first (stable registration order), then the
    crawl-native no-oracle entries — a driver sampling a prefix of the
    roster always prefers the strongest (value-hash) checks."""
    from don_crawler_ray.pipelines import queries as q

    oracled = {k: v for k, v in q.QUERIES.items() if k in q.ORACLE_SQL}
    rest = {k: v for k, v in q.QUERIES.items() if k not in q.ORACLE_SQL}
    return {**oracled, **rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible query."""
    from don_crawler_ray.pipelines import queries as q

    return q.ORACLE_SQL
