from .registry import WRITERS, register_writer, write_sink
from . import jdbc  # noqa: F401 — registers the jdbc/rdbms writers

__all__ = ["WRITERS", "register_writer", "write_sink"]
