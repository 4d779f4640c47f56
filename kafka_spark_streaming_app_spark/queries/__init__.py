"""Driver-facing query definitions, grouped by operator family.

Importing this package registers everything into ``registry.QUERIES``
and ``registry.ORACLES``.
"""

from . import (  # noqa: F401
    alerts,
    analytics,
    asof,
    curation,
    dedup,
    functions_breadth,
    grouped_map,
    jsonpath,
    multimodal,
    nulls,
    pivots,
    profile,
    relational,
    sessions,
    similarity,
    sqlapi,
    streaming,
    text,
    tpch_extra,
    windowed,
)
