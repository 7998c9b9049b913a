from .pages_gen import make_page, pages_pandas, generate_pages_df, PAGES_SCHEMA
from .warc import read_warc, read_warc_stream, make_warc
from .tables import load_table, load_all

__all__ = ["make_page", "pages_pandas", "generate_pages_df", "PAGES_SCHEMA", "load_table", "load_all", "read_warc", "read_warc_stream", "make_warc"]
