from .catalog import Catalog, parse_fq_table  # noqa: F401
