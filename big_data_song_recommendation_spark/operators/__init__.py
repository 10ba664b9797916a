from . import (  # noqa: F401
    aggregates,
    asof,
    clean,
    cooccur,
    dedup,
    joins,
    multimodal,
    similarity,
    skew,
)
