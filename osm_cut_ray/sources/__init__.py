from .tables import read_table, sf_path  # noqa: F401
