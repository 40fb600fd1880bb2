from .readers import TESTDATA_TABLES, register_views, table

__all__ = ["TESTDATA_TABLES", "register_views", "table"]
