"""Train the frozen subword tokenizer artifact (round-14 verdict
"What's missing" item 4).

Token counts drive every budget decision in the suite (token_count,
select_token_budget, sequence packing), and whitespace/regex tokens
systematically undercount what a real training tokenizer produces —
budgets calibrated in whitespace tokens overshoot the true compute
cost. This script learns a byte-pair-encoding vocabulary (Sennrich et
al. 2016) over the reference corpus and freezes the resulting PIECES;
application (operators/text.py token_count_subword) segments words by
greedy longest-prefix match over the frozen pieces — WordPiece-style
inference (Wu et al. 2016), the deterministic, engine-portable
restatement of subword tokenization (both engines replay the same
piece literals; no merge ranks needed at apply time).

- TRAINING (here, offline, once): plain-Python BPE over the corpus's
  word-frequency table (read via DuckDB — no Spark needed; the
  frequency table is vocabulary-sized). Start from characters, merge
  the most frequent adjacent pair (ties -> lexicographic), stop at
  MAX_MERGES or when no pair repeats.
- FREEZE: the piece set + every character seen (the UNK fallback
  guarantees termination: any unseen character advances one position
  as a single UNK piece), with the corpus fingerprint guard.
- APPLICATION: per DISTINCT word (the 100-TB shape — segmentation is
  a vocabulary-sized dimension, not a per-token cost), one narrow
  fold expression, broadcast-joined back onto the exploded corpus.

Usage: python tools/train_subword.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import pathlib
import sys
from collections import Counter

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from retrieval_augmented_generation_rag_data_pipeline_spark.functions.artifacts import (
    corpus_fingerprint,
)

MAX_MERGES = 48
DEFAULT_OUT = (
    pathlib.Path(__file__).resolve().parent.parent
    / "artifacts"
    / "subword.json"
)


def word_freqs(src: str) -> Counter:
    import duckdb

    rows = duckdb.connect().execute(
        "SELECT t.term, count(*) AS c FROM ("
        "SELECT unnest(list_filter(string_split_regex(lower(text), "
        r"'[ \t\n\x0B\f\r]+'), x -> x <> '')) AS term "
        f"FROM read_parquet('{src}')) t GROUP BY t.term ORDER BY t.term"
    ).fetchall()
    return Counter(dict(rows))


def bpe_merges(freqs: Counter, max_merges: int) -> list[str]:
    """Classic BPE: words as symbol sequences, repeatedly merge the
    most frequent adjacent pair (count desc, pair asc tie-break —
    fully deterministic). Returns the merged piece strings."""
    words = {w: list(w) for w in freqs}
    pieces: list[str] = []
    for _ in range(max_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            c = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (a, b), top = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if top < 2:
            break
        merged = a + b
        pieces.append(merged)
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return pieces


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = pathlib.Path(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_OUT
    src = f"{sf_dir}/documents.parquet"
    freqs = word_freqs(src)
    chars = sorted({c for w in freqs for c in w})
    merged = bpe_merges(freqs, MAX_MERGES)
    pieces = sorted(set(chars) | set(merged))
    art = {
        "trained_on": src,
        "max_merges": MAX_MERGES,
        "n_chars": len(chars),
        "n_merged": len(merged),
        "max_piece_len": max(len(p) for p in pieces),
        "pieces": pieces,
        "fingerprint": corpus_fingerprint(src, "doc_id", "text"),
    }
    out.write_text(json.dumps(art, indent=1) + "\n")
    print(
        f"subword: {len(pieces)} pieces ({len(chars)} chars + "
        f"{len(merged)} merges, max len {art['max_piece_len']}) -> {out}"
    )


if __name__ == "__main__":
    main()
