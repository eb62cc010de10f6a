from .tables import TABLES, load_table, load_ticks

__all__ = ["TABLES", "load_table", "load_ticks"]
