from . import binding, hashing, oracle  # noqa: F401
