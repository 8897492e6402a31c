from .pipeline import (  # noqa: F401
    message_pipeline,
    read_cdc_snapshot,
    run_idempotent_file_sink,
    run_to_memory,
    session_windows,
    stream_apply_cdc,
    stream_correlate,
    stream_curate,
    stream_dedup,
    stream_events,
    user_running_state,
    windowed_counts,
)
