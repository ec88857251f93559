from .registry import WRITERS, register_writer, write_sink

__all__ = ["WRITERS", "register_writer", "write_sink"]
