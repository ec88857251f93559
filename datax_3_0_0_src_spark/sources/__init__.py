from .registry import READERS, read_source, register_reader
from . import dbapi  # noqa: F401 — registers the "rdbms" DB-API reader

__all__ = ["READERS", "read_source", "register_reader"]
from . import ftp  # noqa: F401 — registers ftpreader/txtfilereader
from . import docstore  # noqa: F401 — registers the "mongodb" doc reader
