from . import dedup, joins, relational, text, vectors, windows  # noqa: F401
