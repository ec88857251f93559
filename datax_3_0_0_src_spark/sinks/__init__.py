from .registry import WRITERS, register_writer, write_sink
from . import jdbc  # noqa: F401 — registers the jdbc/rdbms writers
from . import http_sinks  # noqa: F401 — registers elasticsearch/clickhouse

__all__ = ["WRITERS", "register_writer", "write_sink"]
