from .catalog import Catalog, parse_fq_table  # noqa: F401
from . import avro, warc  # noqa: F401
