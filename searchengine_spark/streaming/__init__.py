from .dedup import streaming_exact_dedup  # noqa: F401
from .ingest import (  # noqa: F401
    incremental_index,
    stream_corpus,
    streaming_term_counts,
    streaming_window_stats,
)
