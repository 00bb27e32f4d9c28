from . import ledger, readers, sinks  # noqa: F401
