from .audit import save_sql_string, audit_path_for  # noqa: F401
