"""Train the frozen language-ID classifier artifact (round-14 verdict
item 3).

CCNet's first pipeline stage is a TRAINED language classifier
(fastText-style linear model over character n-grams — Wenzek et al.
2020 §3.1; Joulin et al. 2017), not a stopword heuristic: a stopword
profile scores 0 on any text that happens to avoid the listed function
words, and its tie-break then hands the doc to an arbitrary language.
Same train/freeze/apply seam as tools/train_lm.py /
train_classifier.py:

- TRAINING (this script, offline, once): multinomial Naive Bayes over
  character 3-grams — the linear-in-log-space model family fastText
  reduces to for this task — on (a) a small embedded multilingual seed
  corpus (public common-phrase sentences, below) and (b) the seeded
  reference corpus labeled by the engine's own heuristic ``lang_id``
  teacher (the distillation move of tools/train_classifier.py: the
  already-oracle-checked heuristic labels the in-domain slice so the
  student knows the corpus's trigram mass; without it every word-soup
  trigram is OOV and the per-language OOV floor — highest for the
  SMALLEST training slice — would decide the label).
- FREEZE: per-(trigram, language) log-probabilities + per-language
  priors and OOV floors as plain doubles; neither engine does
  engine-local training math. The artifact embeds the
  functions/artifacts.py corpus fingerprint of the reference-corpus
  training slice — a reseeded testdata slice fails the integrity test
  instead of silently scoring a distribution the model was never fit
  to.
- APPLICATION (operators/text.py lang_id_trained): explode char
  3-grams -> ONE broadcast join against the wide (term, w_<lang>...)
  weight table -> one per-doc sum per language -> argmax with the
  heuristic's (score desc, code asc) tie-break. The DuckDB oracle
  replays the same literals.

At 100 TB the artifact stays metadata-sized (<= MAX_NGRAMS rows) and
broadcast into the scoring plan; only training reads a corpus.

Usage: python tools/train_langid.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import math
import pathlib
import sys
from collections import Counter

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from retrieval_augmented_generation_rag_data_pipeline_spark.functions.artifacts import (
    corpus_fingerprint,
)
from retrieval_augmented_generation_rag_data_pipeline_spark.operators.text import LANG_PROFILES

MAX_NGRAMS = 2048
N = 3
ALPHA = 0.1  # Laplace smoothing mass
CORPUS_DOCS = 25  # in-domain slice size (first N by doc_id) — see below
BALANCED_MASS = 1000.0  # per-language count normalization target
DEFAULT_OUT = (
    pathlib.Path(__file__).resolve().parent.parent
    / "artifacts"
    / "langid.json"
)

# Embedded multilingual seed corpus: common public phrases (composed
# for this script; no external source). Deliberately includes
# function-word-free sentences so the char-ngram student generalizes
# where the stopword teacher cannot.
SEED_SENTENCES: dict[str, list[str]] = {
    "en": [
        "the quick brown fox jumps over the lazy dog",
        "a journey of a thousand miles begins with a single step",
        "knowledge is power and time waits for nobody",
        "good morning everyone welcome to the meeting",
        "please read this document carefully before signing",
        "weather forecast shows heavy rain tomorrow evening",
        "children playing happily outside during summer holidays",
        "fresh bread baked daily delivered straight home",
        "streaming queries process rows within sliding windows",
        "distributed systems require careful failure handling",
    ],
    "fr": [
        "le chat noir dort sur le canapé du salon",
        "une baguette fraîche chaque matin chez le boulanger",
        "nous allons visiter paris pendant les vacances",
        "la voiture rouge roule vite sur la route",
        "bonjour tout le monde bienvenue à la réunion",
        "veuillez lire attentivement ce document avant de signer",
        "prévisions météo pluie forte demain soir",
        "enfants jouant joyeusement dehors pendant vacances",
        "fromage vin pain quotidien cuisine française",
        "château magnifique construit siècle dernier",
    ],
    "de": [
        "der schnelle braune fuchs springt über den faulen hund",
        "eine reise von tausend meilen beginnt mit einem schritt",
        "wissen ist macht und zeit wartet auf niemanden",
        "guten morgen alle zusammen willkommen zur besprechung",
        "bitte lesen sie dieses dokument sorgfältig vor der unterschrift",
        "wettervorhersage zeigt starken regen morgen abend",
        "kinder spielen fröhlich draußen während sommerferien",
        "frisches brot täglich gebacken nach hause geliefert",
        "straßenbahn fährt pünktlich durch stadtzentrum",
        "gebäude wurden letztes jahrhundert errichtet",
    ],
    "es": [
        "el gato negro duerme sobre el sofá del salón",
        "un viaje de mil millas comienza con un solo paso",
        "el conocimiento es poder y el tiempo no espera",
        "buenos días a todos bienvenidos a la reunión",
        "por favor lea este documento cuidadosamente antes de firmar",
        "pronóstico del tiempo muestra lluvia fuerte mañana",
        "niños jugando felizmente afuera durante vacaciones",
        "pan fresco horneado diariamente entregado a casa",
        "ciudad hermosa construida siglo pasado",
        "canciones tradicionales cantadas durante fiestas",
    ],
}


def heuristic_label(text: str) -> tuple[str, float]:
    """The operators/text.py lang_id teacher, restated in plain
    Python: per-language function-word hit rate over whitespace-ish
    tokens, argmax with (score desc, code asc) tie-break. Returns
    (code, score) so callers can discard zero-signal labels — a
    zero-hit doc's label is pure tie-break, not evidence."""
    toks = [t for t in text.lower().split() if t]
    n = max(len(toks), 1)
    best = None
    for code, words in sorted(LANG_PROFILES.items()):
        ws = set(words)
        score = sum(1 for t in toks if t in ws) / n
        if best is None or score > best[0]:
            best = (score, code)
    return best[1], best[0]


def char_ngrams(text: str, n: int = N) -> list[str]:
    s = text.lower()
    return [s[i : i + n] for i in range(len(s) - n + 1)]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = pathlib.Path(sys.argv[2]) if len(sys.argv) > 2 else DEFAULT_OUT
    src = f"{sf_dir}/documents.parquet"

    import duckdb

    docs = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{src}') ORDER BY doc_id"
    ).fetchall()

    langs = sorted(SEED_SENTENCES)
    counts: dict[str, Counter] = {l: Counter() for l in langs}
    for lang, sentences in SEED_SENTENCES.items():
        for s in sentences:
            counts[lang].update(char_ngrams(s))
    # In-domain slice: a SMALL deterministic slice (first CORPUS_DOCS
    # by doc_id), only where the teacher has actual signal (score > 0
    # — a zero-hit label is pure tie-break, and training on it would
    # split one trigram distribution across two labels). Small on
    # purpose: the corpus vocabulary is tiny, so a few docs carry its
    # whole trigram mass, while a 500-doc flood would dilute
    # P(trigram|en) for natural-English trigrams a thousandfold and
    # hand every seed-seen trigram to the smallest language's floor.
    for _, text in docs[:CORPUS_DOCS]:
        code, score = heuristic_label(text)
        if score > 0:
            counts[code].update(char_ngrams(text))

    # vocab: top MAX_NGRAMS by total count (count desc, term asc tie)
    total = Counter()
    for c in counts.values():
        total.update(c)
    vocab = sorted(total, key=lambda t: (-total[t], t))[:MAX_NGRAMS]
    v = len(vocab)

    # Balanced NB: normalize every language's counts to one shared
    # mass before smoothing, so the likelihoods compare language
    # PROFILES rather than training-slice sizes (the imbalance would
    # otherwise leak into every seen-vs-floor comparison).
    raw_totals = {l: sum(counts[l][t] for t in vocab) for l in langs}
    scaled = {
        l: {
            t: counts[l][t] * BALANCED_MASS / raw_totals[l]
            for t in vocab
            if counts[l][t]
        }
        for l in langs
    }
    # v + 1: one shared OOV bucket is reserved in the denominator so
    # the smoothed model normalizes exactly (sum over vocab + floor = 1)
    denom = {l: BALANCED_MASS + ALPHA * (v + 1) for l in langs}
    weights = {
        t: {
            l: round(
                math.log((scaled[l].get(t, 0.0) + ALPHA) / denom[l]), 6
            )
            for l in langs
        }
        for t in vocab
    }
    floors = {l: round(math.log(ALPHA / denom[l]), 6) for l in langs}
    # uniform priors: the training mix's class skew is an artifact of
    # the slice, not of any deployment corpus
    priors = {l: round(math.log(1.0 / len(langs)), 6) for l in langs}

    art = {
        "trained_on": src,
        "n": N,
        "alpha": ALPHA,
        "max_ngrams": MAX_NGRAMS,
        "vocab_size": v,
        "langs": langs,
        "priors": priors,
        "floors": floors,
        "weights": weights,
        "fingerprint": corpus_fingerprint(src, "doc_id", "text"),
    }
    out.write_text(json.dumps(art, indent=1) + "\n")
    print(
        f"langid: {v} trigrams x {len(langs)} langs from "
        f"{len(docs)} docs + {sum(len(s) for s in SEED_SENTENCES.values())} "
        f"seed sentences -> {out}"
    )


if __name__ == "__main__":
    main()
