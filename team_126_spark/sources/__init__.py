from .io import (  # noqa: F401
    clean_headers,
    read_csv_bom,
    read_jdbc,
    read_json_envelope,
    read_parquet_evolved,
    read_json_records,
    summarize_envelope,
    write_json,
    write_json_envelope,
    write_jdbc,
    write_parquet,
)

from . import external, synth  # noqa: F401, E402  (pluggable lookup + generator sources)
