from .catalog import TABLES, load_table, load_tables, register_views
from .snapshot_catalog import SnapshotCatalog

__all__ = [
    "TABLES",
    "SnapshotCatalog",
    "load_table",
    "load_tables",
    "register_views",
]
