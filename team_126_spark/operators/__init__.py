from . import dedup, geo, health, relational, search, textops, vector  # noqa: F401
