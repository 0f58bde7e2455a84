"""Text-analysis functions for large-scale training-data pipelines.

All hot-path expressions are JVM-side ``pyspark.sql.functions`` column
math (whole-stage codegen'd; no Python row path): token counting,
quality scoring, language-ID by stopword-marker ratio, and document
fingerprinting. Each is DuckDB-reproducible (plain string/regexp ops)
so the driver's oracle gate can verify them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Small marker-word sets for the language-ID heuristic. Deliberately
# tiny and deterministic — a cheap n-gram/stopword scorer, not a model.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "des", "est", "une", "dans"],
    "es": ["el", "los", "las", "que", "una", "por", "para", "con"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization (single-space split keeps DuckDB parity;
    empty tokens filtered)."""
    return F.filter(F.split(col, " "), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """BPE-flavored proxy: count word-piece-ish units — runs of
    letters, runs of digits, or single non-space symbols."""
    return F.size(
        F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    )


def punct_ratio(col: Column) -> Column:
    n = F.length(col)
    p = F.length(F.regexp_replace(col, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(n > 0, p.cast("double") / n).otherwise(0.0)


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    toks = tokens(F.lower(col))
    hits = F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))
    return F.when(F.size(toks) > 0, hits.cast("double") / F.size(toks)).otherwise(0.0)


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + word shape +
    punctuation sanity — the usual pre-training gating features."""
    n = F.length(col)
    ntok = token_count(col)
    avg_word = F.when(ntok > 0, n.cast("double") / ntok).otherwise(0.0)
    len_ok = F.when((n >= 64) & (n <= 100_000), 1.0).otherwise(0.0)
    word_ok = F.when((avg_word >= 2.5) & (avg_word <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(col) <= 0.2, 1.0).otherwise(0.0)
    return (len_ok + word_ok + punct_ok) / 3.0


def _marker_hits(toks: Column, words: list[str]) -> Column:
    # NB: the lambda must be unary — PySpark infers the (value, index)
    # two-arg form from the signature, so capturing `words` via a
    # default arg would make it receive the index Column instead
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_id(col: Column) -> Column:
    """Best-scoring language by marker-word hits; 'und' when no hits.
    Ties break to the lexicographically largest language code (struct
    max over (hits, lang)), mirrored exactly by the DuckDB oracle."""
    toks = tokens(F.lower(col))
    scores = [
        F.struct(_marker_hits(toks, ws).alias("hits"), F.lit(lang).alias("lang"))
        for lang, ws in sorted(LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: Column) -> Column:
    """Normalized-content fingerprint: sha256 of lowercased,
    whitespace-collapsed text — the dedup/lineage key (DuckDB-parity
    version of a rolling hash)."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.sha2(norm, 256)


def doc_stats(documents: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document feature table — the standard quality-gating scan."""
    c = F.col(text_col)
    return documents.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        F.round(punct_ratio(c), 9).alias("punct_ratio"),
        F.round(stopword_ratio(c), 9).alias("stopword_ratio_en"),
        F.round(quality_score(c), 9).alias("quality"),
        fingerprint(c).alias("fingerprint"),
    )
