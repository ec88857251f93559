from .manifest import Snapshot, current_version, read_snapshot, write_snapshot
from .table import LakeTable, SYS_BUCKET, SYS_DELETED, SYS_OFFSET

__all__ = [
    "Snapshot",
    "current_version",
    "read_snapshot",
    "write_snapshot",
    "LakeTable",
    "SYS_BUCKET",
    "SYS_DELETED",
    "SYS_OFFSET",
]
