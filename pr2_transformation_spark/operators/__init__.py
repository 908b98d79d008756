from .clean_columns import clean_columns, clean_columns_df, compose_clean_columns  # noqa: F401
from .clean_rows import clean_rows, clean_rows_df, compose_clean_rows  # noqa: F401
from .merge import compose_merge, merge_table_versions, merge_versions_df  # noqa: F401
from .sensitive import compose_sensitive_tier, create_sensitive_tier, sensitive_tier_df  # noqa: F401
