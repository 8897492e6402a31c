from .io import (  # noqa: F401
    clean_headers,
    read_csv_bom,
    read_json_envelope,
    read_json_records,
    write_json,
    write_jdbc,
    write_parquet,
)
