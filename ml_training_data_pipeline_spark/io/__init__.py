from .sources import load_table, load_tables, register_views, write_parquet

__all__ = ["load_table", "load_tables", "register_views", "write_parquet"]
