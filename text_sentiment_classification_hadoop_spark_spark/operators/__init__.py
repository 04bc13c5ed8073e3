from . import (  # noqa: F401
    dedup,
    events,
    metrics,
    nb,
    relational,
    sentiment,
    similarity,
    svm,
    text_analysis,
)
