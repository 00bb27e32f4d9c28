from . import pipeline, queries  # noqa: F401
