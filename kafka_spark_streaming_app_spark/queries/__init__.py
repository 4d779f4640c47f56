"""Driver-facing query definitions, grouped by operator family.

Importing this package registers everything into ``registry.QUERIES``
and ``registry.ORACLES``.
"""

from . import alerts, dedup, jsonpath, relational, similarity, windowed  # noqa: F401
