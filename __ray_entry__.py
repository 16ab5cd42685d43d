"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship archive pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose the operator inventory with DuckDB
oracles (see auto_archiver_ray/pipelines/queries.py). Ray is initialised by
the driver before import — nothing here calls ray.init/shutdown.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry() -> Any:
    """Flagship pipeline: archive + content-dedup the sf0.001 pages table."""
    from auto_archiver_ray.pipelines.archive import archive_pages_full

    return archive_pages_full("/root/testdata/sf0.001", extract_concurrency=4)


def queries() -> dict[str, Callable[[str], Any]]:
    from auto_archiver_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from auto_archiver_ray.pipelines.queries import oracles

    return oracles("/root/testdata/sf0.01")
