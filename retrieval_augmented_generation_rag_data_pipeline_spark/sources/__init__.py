from . import ledger, probe, readers, sinks  # noqa: F401
