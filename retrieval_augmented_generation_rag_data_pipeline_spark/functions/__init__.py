from . import hashing, oracle  # noqa: F401
