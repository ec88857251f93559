from .registry import READERS, read_source, register_reader

__all__ = ["READERS", "read_source", "register_reader"]
