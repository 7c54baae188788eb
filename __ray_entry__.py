"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init()`` itself before importing this module:
``entry()`` runs the flagship crawl pipeline on an sf0.001-sized synthetic
web and returns the interleaved-documents Dataset; ``queries()`` exposes
every implemented operator/pipeline (SURVEY.md §2 + the training-data ops);
``oracle_sql()`` gives the DuckDB-equivalent SQL for the SQL-expressible
subset (identical column names/values). Nothing here calls ray.init().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: deterministic synthetic web sized for sf0.001 →
    full crawl (frontier waves, sharded URL-seen, politeness, extraction) →
    interleaved-span documents Dataset (doc_id, spans)."""
    from cloud_crawler_ray.pipelines.queries import crawl_handle_for

    return crawl_handle_for("/root/testdata/sf0.001").documents()


def queries() -> dict[str, Callable[[str], Any]]:
    from cloud_crawler_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from cloud_crawler_ray.pipelines.queries import ORACLE_SQL, ensure_oracle_tables
    from cloud_crawler_ray.pipelines.serial_twins import ensure_twin_tables

    # crawl-derived oracles read the serial Python oracle's expected tables,
    # and twin-backed oracles the single-threaded recomputation tables, via
    # read_parquet; materialize both (cached, version-keyed) before any of
    # the returned SQL can run
    ensure_oracle_tables()
    ensure_twin_tables()
    return dict(ORACLE_SQL)
