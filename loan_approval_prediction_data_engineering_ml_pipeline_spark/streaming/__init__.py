from .events import (  # noqa: F401
    correlated_pairs_stream,
    deduped_stream,
    enriched_stream,
    read_events_stream,
    run_stream_to_table,
    session_aggregates,
    transition_stream,
    user_running_stats,
    windowed_counts,
)
from .ingest import (  # noqa: F401
    fold_ingest_store,
    ivf_drift_refit_due,
    read_corpus,
    reclaim_ingest_store,
    stream_bm25_index_ingest,
    stream_ivf_index_ingest,
    stream_ivfpq_ingest,
    stream_corpus_ingest_dedup,
    stream_corpus_ingest_neardup,
    stream_text_ivf_ingest,
)
