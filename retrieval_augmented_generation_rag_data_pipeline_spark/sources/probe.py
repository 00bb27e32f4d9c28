"""Artifact-existence probe (SURVEY.md §2.1 S10).

The reference derives a sibling artifact path per input and checks
whether it already exists on disk (reference src/main.py:81-83
``file_path.with_suffix('.wav')`` + ``wav_path.exists()``). At scale
"does this artifact exist" is a set-membership question against the
store's listing, answered for EVERY input at once with one semi/anti
join against the catalog scan — never a per-file RPC loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def derive_artifact(
    df: DataFrame,
    src_col: str = "path",
    suffix: str = ".wav",
    out_col: str = "artifact_path",
) -> DataFrame:
    """Sibling-artifact path: swap the file extension for ``suffix``
    (the relational ``Path.with_suffix``, reference src/main.py:81).
    Paths without an extension get the suffix appended. The lookbehind
    requires a character before the final dot, so a dotfile
    ('/data/.config') keeps its name — matching Path.with_suffix,
    which never treats a leading dot as a suffix."""
    stem = F.regexp_replace(F.col(src_col), r"(?<=[^/])\.[^./]+$", "")
    return df.withColumn(out_col, F.concat(stem, F.lit(suffix)))


def probe_artifacts(
    expected: DataFrame,
    inventory: DataFrame,
    expected_col: str = "artifact_path",
    inventory_col: str = "path",
) -> tuple[DataFrame, DataFrame]:
    """Split ``expected`` by artifact existence: (present, missing).

    ``present``  = expected ⋉ inventory (left_semi),
    ``missing``  = expected ▷ inventory (left_anti) — the rows still
    needing work. ``inventory`` is typically ``scan_catalog(...)``
    (file-status metadata only); the inventory side is deduped so a
    double-listed object can't duplicate expected rows. No broadcast
    hint: an inventory grows with the store, AQE picks the strategy.
    """
    inv = inventory.select(F.col(inventory_col).alias(expected_col)).distinct()
    present = expected.join(inv, expected_col, "left_semi")
    missing = expected.join(inv, expected_col, "left_anti")
    return present, missing
