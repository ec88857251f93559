from .casts import (
    as_bool, as_bytes, as_decimal, as_double, as_long, as_string, as_timestamp,
    to_timestamp_multi, try_cast_or_reason,
)

__all__ = [
    "as_long", "as_double", "as_decimal", "as_string", "as_bool", "as_bytes",
    "as_timestamp", "to_timestamp_multi", "try_cast_or_reason",
]
