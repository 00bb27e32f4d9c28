"""Real-model UDFs (U1-U4) + multimodal column plumbing.

Models (Whisper ASR, pyannote diarization, SentenceTransformer) are NOT
in this environment; each UDF is import-gated and raises a clear error
at call time if its dependency is missing — the Spark-side plumbing
(schemas, Arrow batching, per-executor singletons) is real and tested
with deterministic fakes. Never on the DuckDB-oracle path (SURVEY §7.4).
"""

from . import multimodal, udfs  # noqa: F401
