from . import (  # noqa: F401
    aggregations,
    dedup,
    multimodal,
    projections,
    similarity,
    skew,
)
