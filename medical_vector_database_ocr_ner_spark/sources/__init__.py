from .pages import generate_pages_parquet, pages_path, read_pages, PAGES_SCHEMA
from .tables import TESTDATA_TABLES, load_tables, register_views
