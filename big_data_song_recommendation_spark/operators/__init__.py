from . import (  # noqa: F401
    aggregates,
    asof,
    clean,
    dedup,
    joins,
    multimodal,
    similarity,
    skew,
)
