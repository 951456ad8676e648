"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship parse→enrich→route→aggregate pipeline on
sf0.001; ``queries()`` exposes one pipeline per implemented operator from
SURVEY.md §2 (+ training-data operators); ``oracle_sql()`` gives the DuckDB
equivalent for every SQL-expressible query.

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from opentelemetry_collector_contrib_ray.pipelines import flagship  # noqa: E402
from opentelemetry_collector_contrib_ray.pipelines.queries import (  # noqa: E402
    ORACLE_SQL,
    QUERIES,
)


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    return flagship.flagship_aggregate("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
