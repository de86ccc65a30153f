from . import aggregations, dedup, projections, similarity  # noqa: F401
