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
        n = len(col)
        n_words = pc.count_substring_regex(col, pattern=WORD_RE)
        n_punct = pc.count_substring_regex(col, pattern=r"[^\w\s]")
        n_chars = pc.utf8_length(col)
        # distinct words per doc, whole-batch vectorized (was a pandas
        # .map(lambda) set-build per row): split on the WORD_RE
        # complement -- maximal word-char runs, exactly findall's
        # tokens -- then one C-level (doc, word) drop_duplicates +
        # bincount.  Case preserved, matching the old semantics.
        wl = pc.split_pattern_regex(pc.fill_null(col, ""),
                                    pattern=r"[^A-Za-z0-9_]+")
        raw_counts = np.diff(wl.offsets.to_numpy())
        flat = wl.flatten()
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64),
                            raw_counts)[keep_np]
        dfp = pd.DataFrame({
            "d": doc_idx,
            "w": flat.filter(keep).to_numpy(zero_copy_only=False),
        }).drop_duplicates()
        uniq = np.bincount(dfp["d"], minlength=n).astype(np.int64)
        t = t.append_column("n_words", pc.cast(n_words, pa.int64()))
        t = t.append_column("n_uniq_words", pa.array(uniq, type=pa.int64()))
        t = t.append_column("n_punct", pc.cast(n_punct, pa.int64()))
        t = t.append_column("n_chars_text", pc.cast(n_chars, pa.int64()))
        return t

    return ds.map_batches(stats, batch_format="pyarrow", batch_size=None)


class LanguageId:
    """Actor-pool stage: stopword value-sets built once per actor.

    Heuristic: highest stopword-hit-rate language wins; ties break to
    the first language in STOPWORDS order (strict-greater update over a
    zero floor, so zero hits -> 'other').  Fully vectorized: one
    split_pattern_regex per batch into a flat word stream, one
    ``pc.is_in`` membership scan per language, per-doc hit counts via
    ``np.bincount`` over the doc index -- no Python per row/word."""

    def __init__(self, text_col: str):
        self.text_col = text_col
        self.langs = [lang for lang, sw in STOPWORDS.items() if sw]
        self.value_sets = {
            lang: pa.array(sorted(STOPWORDS[lang]), type=pa.string())
            for lang in self.langs}
        self.lang_arr = np.array(self.langs, dtype=object)

    def __call__(self, t: pa.Table) -> pa.Table:
        col = t[self.text_col].combine_chunks()
        n = len(col)
        wl = pc.split_pattern_regex(pc.fill_null(col, ""),
                                    pattern=r"[^A-Za-z0-9_]+")
        raw_counts = np.diff(wl.offsets.to_numpy())
        flat = pc.utf8_lower(wl.flatten())
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(n, dtype=np.int64),
                            raw_counts)[keep_np]
        flat_kept = flat.filter(keep)
        hits = np.zeros((len(self.langs), n), dtype=np.int64)
        for k, lang in enumerate(self.langs):
            m = pc.is_in(flat_kept, value_set=self.value_sets[lang])
            hits[k] = np.bincount(
                doc_idx[m.to_numpy(zero_copy_only=False)], minlength=n)
        # argmax returns the FIRST max -> same tie-break as the old
        # sequential strict-greater loop over STOPWORDS order
        preds = self.lang_arr[hits.argmax(axis=0)].copy()
        preds[hits.max(axis=0) == 0] = "other"
        return t.append_column("lang_pred",
                               pa.array(preds, type=pa.string()))


_LANG_ID_CACHE: dict = {}


def language_id(ds: ray.data.Dataset, text_col: str) -> ray.data.Dataset:
    """Stateless task stage (NOT an actor pool): the per-worker state is
    four 8-word Arrow value-sets, rebuilt once per worker process via a
    module-level cache -- a plain function lets Ray FUSE this stage into
    the upstream read (see CLAUDE.md fusion rule)."""

    def _predict(t: pa.Table) -> pa.Table:
        kern = _LANG_ID_CACHE.get(text_col)
        if kern is None:
            kern = _LANG_ID_CACHE[text_col] = LanguageId(text_col)
        return kern(t)

    return ds.map_batches(_predict, batch_format="pyarrow",
                          batch_size=8192)


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


# quality-score knobs: shared with the SQL oracle (same RE2 regex engine
# on both sides -- pyarrow and DuckDB -- so counts agree exactly)
QUALITY_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it",
                     "on", "for")
STOPWORD_RE = r"\b(?:" + "|".join(QUALITY_STOPWORDS) + r")\b"
# GPT-2-style pretokenizer, ASCII classes only (identical semantics in
# Python re, RE2/pyarrow and RE2/DuckDB)
BPE_RE = r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def quality_score(ds: ray.data.Dataset, text_col: str, id_col: str) -> ray.data.Dataset:
    """Heuristic document quality features + keep/drop flag.

    All-integer outputs (value-hash safe): word count, stopword
    percentage, punctuation percentage, and ``quality`` =
    1 iff n_words >= 10 AND stop_pct <= 60 AND punct_pct <= 20.
    Pure Arrow kernels -- one count_substring_regex per feature.
    """

    def score(t: pa.Table) -> pa.Table:
        col = t[text_col].combine_chunks()
        lower = pc.utf8_lower(col)
        n_words = pc.cast(pc.count_substring_regex(col, pattern=WORD_RE),
                          pa.int64())
        n_stop = pc.cast(pc.count_substring_regex(lower, pattern=STOPWORD_RE),
                         pa.int64())
        n_punct = pc.cast(pc.count_substring_regex(col, pattern=r"[^\w\s]"),
                          pa.int64())
        n_chars = pc.cast(pc.utf8_length(col), pa.int64())
        one = pa.scalar(1, pa.int64())
        hundred = pa.scalar(100, pa.int64())
        stop_pct = pc.divide(pc.multiply(n_stop, hundred),
                             pc.max_element_wise(n_words, one))
        punct_pct = pc.divide(pc.multiply(n_punct, hundred),
                              pc.max_element_wise(n_chars, one))
        quality = pc.cast(pc.and_(
            pc.and_(pc.greater_equal(n_words, pa.scalar(10, pa.int64())),
                    pc.less_equal(stop_pct, pa.scalar(60, pa.int64()))),
            pc.less_equal(punct_pct, pa.scalar(20, pa.int64()))), pa.int64())
        return pa.table({
            id_col: t[id_col],
            "n_words": n_words,
            "stop_pct": stop_pct,
            "punct_pct": punct_pct,
            "quality": quality,
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def word_topk(ds: ray.data.Dataset, text_col: str, k: int) -> ray.data.Dataset:
    """Corpus-level top-k most frequent words (the classic wordcount,
    exact): per-batch Arrow kernel chain lower -> split on non-word
    runs -> flatten -> drop empties -> local value counts, then a
    vocabulary-sized groupby sum and a tiny global sort+limit.  The
    shuffle carries (word, count) partials -- bounded by vocabulary per
    block, never the corpus.  Ties at the k boundary break by word
    (ascending), so the result is deterministic."""

    def partial(t: pa.Table) -> pa.Table:
        col = pc.utf8_lower(t[text_col].combine_chunks())
        words = pc.split_pattern_regex(col, pattern=r"[^a-z0-9_]+")
        flat = pc.list_flatten(words)
        flat = flat.filter(pc.not_equal(flat, ""))
        vc = flat.value_counts()
        return pa.table({"word": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    from ray.data.aggregate import Sum

    counts = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True).groupby("word").aggregate(
        Sum("n", alias_name="n"))
    return counts.sort(["n", "word"], descending=[True, False]).limit(k)


def repetition_score(ds: ray.data.Dataset, text_col: str, id_col: str) -> ray.data.Dataset:
    """Within-document repetition signal (Gopher-style quality filter,
    Rae et al. 2021: fraction of duplicated n-grams): per document the
    word-bigram count, distinct-bigram count, and integer duplicate
    percentage ``100*(n - n_distinct) // max(n, 1)``.

    All-integer outputs (value-hash safe).  Tokenization splits on
    non-word runs (identical token stream to the shared WORD_RE
    findall) so the SQL oracle (regexp_extract_all + list_transform +
    list_distinct) agrees exactly.  Embarrassingly parallel -- no
    shuffle; the whole batch runs as ONE flattened word stream --
    dictionary-encode words to int codes, pack (doc, c1, c2) into one
    int64 key and count distinct via a single np.unique (exact, no
    hashing-only shortcut; ~1.8x over the per-document Python set
    builds on 100-word docs, BASELINE.md session 8).  Blocks whose
    docs * vocab^2 would overflow the packed key fall back to an Arrow
    hash-distinct over the string triple."""

    def score(t: pa.Table) -> pa.Table:
        texts = pc.utf8_lower(t[text_col].combine_chunks())
        wl = pc.split_pattern_regex(pc.fill_null(texts, ""),
                                    pattern=r"[^a-z0-9_]+")
        raw = np.diff(wl.offsets.to_numpy())
        flat = wl.flatten()
        keep = pc.not_equal(flat, "")
        keep_np = keep.to_numpy(zero_copy_only=False)
        cv = np.concatenate([[0], np.cumsum(keep_np)])
        offs = np.concatenate([[0], np.cumsum(raw)])
        n_words = (cv[offs[1:]] - cv[offs[:-1]]).astype(np.int64)
        flat = flat.filter(keep)
        total = int(len(flat))
        n = np.maximum(n_words - 1, 0)
        nd = np.zeros(len(n_words), np.int64)
        if total >= 2:
            doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64),
                                n_words)
            m = total - 1
            same = doc_idx[:m] == doc_idx[1:]
            codes = pc.cast(flat.dictionary_encode().indices,
                            pa.int64()).to_numpy()
            V = int(codes.max()) + 1
            if len(n_words) * V * V < 2**62:  # Python-int check
                key = (doc_idx[:m] * V + codes[:m]) * V + codes[1:]
                uk = np.unique(key[same])
                d = uk // (V * V)
                starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
                nd[d[starts]] = np.diff(np.r_[starts, len(d)])
            else:
                pairs = pa.table({
                    "d": pa.array(doc_idx[:m][same]),
                    "w1": flat.slice(0, m).filter(pa.array(same)),
                    "w2": flat.slice(1, m).filter(pa.array(same))})
                dist = pairs.group_by(["d", "w1", "w2"]).aggregate([])
                vc = dist["d"].combine_chunks().value_counts()
                nd[vc.field("values").to_numpy()] = pc.cast(
                    vc.field("counts"), pa.int64()).to_numpy()
        dup_pct = (100 * (n - nd)) // np.maximum(n, 1)
        return pa.table({
            id_col: t[id_col],
            "n_2grams": pa.array(n),
            "n_uniq_2grams": pa.array(nd),
            "dup_2gram_pct": pa.array(dup_pct),
        })

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


def token_count_bpe(ds: ray.data.Dataset, text_col: str, group_col: str) -> ray.data.Dataset:
    """Per-group total BPE-ish token counts (GPT-2-style pretokenizer
    regex, counted vectorized with RE2 -- no per-row Python loop), using
    the partial+final aggregate pattern."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        col = t[text_col].combine_chunks()
        n_tok = pc.cast(pc.count_substring_regex(col, pattern=BPE_RE),
                        pa.int64())
        tt = pa.table({group_col: t[group_col].combine_chunks(),
                       "n_tokens": n_tok,
                       "n_docs": pa.array(np.ones(len(t), dtype=np.int64))})
        g = tt.group_by(group_col).aggregate(
            [("n_tokens", "sum"), ("n_docs", "sum")])
        return pa.table({group_col: g[group_col],
                         "n_tokens": g["n_tokens_sum"],
                         "n_docs": g["n_docs_sum"]})

    return ds.map_batches(partial, batch_format="pyarrow").groupby(
        group_col).aggregate(Sum("n_tokens", alias_name="n_tokens"),
                             Sum("n_docs", alias_name="n_docs"))


def tfidf_top_terms(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    k: int = 3,
) -> ray.data.Dataset:
    """Top-``k`` TF-IDF terms per document, integer-exact: score =
    ``tf * n_docs // df`` (rational idf -- deterministic across engines,
    no transcendental log in the hash path).

    Two passes: (1) the document-frequency table (vocabulary-sized
    shuffle of distinct (word, doc) partials) is computed and broadcast
    via ``ray.put`` -- the DF table must be broadcast-sized, the same
    contract as any vocabulary structure; (2) a pure map computes
    per-doc term frequencies and picks top-k by (score desc, term asc).
    Output: id, term, tf, score (int64)."""
    from ci_log_processing_ray.ops.curation import _word_stream

    n_docs = ds.count()

    def df_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        flat, n_words = _word_stream(t[text_col])
        doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), n_words)
        d = pd.DataFrame({"word": flat.to_numpy(zero_copy_only=False),
                          "doc": ids[doc_idx]}).drop_duplicates()
        vc = d.groupby("word", sort=False).size()
        return pa.table({"word": pa.array(vc.index.to_numpy(), pa.string()),
                         "df": pa.array(vc.to_numpy().astype(np.int64))})

    from ray.data.aggregate import Sum

    df_tbl = (ds.map_batches(df_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("word").aggregate(Sum("df", alias_name="df"))
              .to_pandas())
    df_ref = ray.put(dict(zip(df_tbl["word"], df_tbl["df"])))

    def topk(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        flat, n_words = _word_stream(t[text_col])
        doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), n_words)
        d = pd.DataFrame({"word": flat.to_numpy(zero_copy_only=False),
                          "doc": ids[doc_idx]})
        tf = d.groupby(["doc", "word"], sort=False).size().reset_index(
            name="tf")
        dfm = ray.get(df_ref)
        dfv = tf["word"].map(dfm).to_numpy().astype(np.int64)
        tf["score"] = tf["tf"].to_numpy() * np.int64(n_docs) // dfv
        tf = tf.sort_values(["doc", "score", "word"],
                            ascending=[True, False, True], kind="mergesort")
        top = tf.groupby("doc", sort=False).head(k)
        return pa.table({id_col: pa.array(top["doc"].to_numpy()),
                         "term": pa.array(top["word"].to_numpy(),
                                          pa.string()),
                         "tf": pa.array(top["tf"].to_numpy().astype(
                             np.int64)),
                         "score": pa.array(top["score"].to_numpy())})

    return ds.map_batches(topk, batch_format="pyarrow", zero_copy_batch=True)


def compression_ratio(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    level: int = 6,
) -> ray.data.Dataset:
    """zlib compressed-size per document -- the classic repetitive-junk
    signal (boilerplate and template spam compress far below prose).
    Emits (id, raw_bytes, comp_bytes, ratio_milli = comp*1000//raw,
    integer so downstream filters stay engine-exact).  Per-row zlib is
    C-speed; no Python-level text scanning."""
    import zlib

    def fn(t: pa.Table) -> pa.Table:
        texts = [s.encode() for s in t[text_col].to_pylist()]
        raw = np.array([len(b) for b in texts], dtype=np.int64)
        comp = np.array([len(zlib.compress(b, level)) for b in texts],
                        dtype=np.int64)
        safe_raw = np.maximum(raw, 1)
        return pa.table({
            id_col: t[id_col],
            "raw_bytes": pa.array(raw),
            "comp_bytes": pa.array(comp),
            "ratio_milli": pa.array(comp * 1000 // safe_raw)})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def inverted_index(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    n: int = 1,
    min_df: int = 1,
    max_df: int | None = None,
) -> ray.data.Dataset:
    """Inverted-index (posting-list) build: for every word ``n``-gram
    term, its document frequency and the comma-joined posting list of
    doc ids in ascending numeric order -- the retrieval/attribution
    primitive (SQL: ``string_agg(id, ',' ORDER BY id)`` over distinct
    (term, doc) pairs).

    Scale shape: each batch pre-shrinks to DISTINCT (term, doc) pairs
    (curation's vectorized n-gram gather), so the term-hash bucketed
    exchange carries at most one row per (term, doc) -- never raw text.
    Inside a bucket the posting assembly is one sort + boundary diff +
    Arrow ``binary_join``: no per-term Python.  ``min_df``/``max_df``
    bound the output (and a real deployment's max_df caps the hot-term
    posting length -- document frequency of stopword-grade terms makes
    their postings useless for retrieval anyway); the df filter runs
    per bucket, exact because a term lives wholly in one bucket."""
    from .curation import _doc_ngrams

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        d = _doc_ngrams(t[text_col], ids, n)
        return pa.table({"term": pa.array(d["gram"], type=pa.string()),
                         "id": pa.array(d["id"], type=pa.int64())})

    pairs = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(["term", "id"])
              .sort_values(["term", "id"], ignore_index=True))
        if len(g) == 0:
            return pd.DataFrame({"term": np.array([], object),
                                 "df": np.array([], np.int64),
                                 "postings": np.array([], object)})
        terms = g["term"].to_numpy()
        change = np.empty(len(g), dtype=bool)
        change[0] = True
        change[1:] = terms[1:] != terms[:-1]
        starts = np.flatnonzero(change)
        offs = np.concatenate([starts, [len(g)]]).astype(np.int32)
        ids_str = pc.cast(pa.array(g["id"].to_numpy()), pa.string())
        postings = pc.binary_join(
            pa.ListArray.from_arrays(pa.array(offs), ids_str), ",")
        df = np.diff(offs).astype(np.int64)
        out = pd.DataFrame({
            "term": terms[starts],
            "df": df,
            "postings": postings.to_numpy(zero_copy_only=False),
        })
        keep = out["df"] >= min_df
        if max_df is not None:
            keep &= out["df"] <= max_df
        return out[keep].reset_index(drop=True)

    from .window import bucketed_groups

    return bucketed_groups(pairs, "term", kern)


def next_word_model(
    ds: ray.data.Dataset,
    text_col: str,
    *,
    k: int = 3,
) -> ray.data.Dataset:
    """Bigram language-model table: for every word w1, the top-``k``
    next words by corpus bigram count (ties by w2 ascending) with the
    count, w1's total continuation count, and the integer permille
    conditional probability ``1000*n // total`` -- exact in int64 on
    both engines.

    Scale shape: bigram extraction is adjacent-pair slicing of the
    flat word stream (doc-boundary pairs masked out -- no window
    materialization), each batch pre-aggregates (w1, w2) counts, so
    the ONE w1-hash bucketed exchange is bounded by distinct bigrams
    per block, never tokens; the top-k/total kernel is a C-level sort +
    cumcount per bucket."""
    from .curation import _word_stream

    def partial(t: pa.Table) -> pa.Table:
        flat, n_words = _word_stream(t[text_col])
        if len(flat) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        valid = np.ones(len(flat) - 1, dtype=bool)
        starts = np.cumsum(n_words)[:-1]  # doc start offsets after the 1st
        valid[starts[(starts > 0) & (starts <= len(valid))] - 1] = False
        idx = np.flatnonzero(valid)
        tt = pa.table({"w1": flat.take(pa.array(idx)),
                       "w2": flat.take(pa.array(idx + 1)),
                       "n": pa.array(np.ones(len(idx), np.int64))})
        g = tt.group_by(["w1", "w2"]).aggregate([("n", "sum")])
        return pa.table({"w1": g["w1"], "w2": g["w2"], "n": g["n_sum"]})

    counts = ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)

    def kern(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby(["w1", "w2"], sort=False, as_index=False)["n"].sum()
        g["total"] = g.groupby("w1", sort=False)["n"].transform("sum")
        g = g.sort_values(["w1", "n", "w2"],
                          ascending=[True, False, True], kind="mergesort")
        g = g[g.groupby("w1", sort=False).cumcount() < k]
        g["n"] = g["n"].astype(np.int64)
        g["total"] = g["total"].astype(np.int64)
        g["p_permille"] = 1000 * g["n"] // g["total"]
        return g.reset_index(drop=True)

    from .window import bucketed_groups

    return bucketed_groups(counts, "w1", kern)


def score_docs_bigram(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    top_k: int | None = None,
    passthrough_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """Language-model quality scoring: train a corpus bigram model
    (pass 1), broadcast it once, then score every document by the mean
    integer-permille conditional probability of its bigrams (pass 2) --
    the model-based fluency/quality gate of a pretraining pipeline,
    exact in int64 so it cross-checks against a SQL oracle.

    Scale shape: the trained table is VOCABULARY-shaped (distinct
    bigrams), not corpus-shaped -- per-block count partials bound the
    one exchange; ``top_k`` caps the broadcast table for web-scale
    vocabularies (absent bigrams score 0, the standard pruned-LM
    contract).  Scoring is a pure map: flat word-stream slicing,
    doc-boundary masking, one hashed dict lookup and two bincounts per
    batch.

    Output: ``id_col, n_bigrams, score_sum, avg_permille``."""
    from .curation import _word_stream

    def partial(t: pa.Table) -> pa.Table:
        flat, n_words = _word_stream(t[text_col])
        if len(flat) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ends = np.cumsum(n_words)
        doc_of = np.searchsorted(ends, np.arange(len(flat)), side="right")
        idx = np.flatnonzero(doc_of[:-1] == doc_of[1:])
        tt = pa.table({"w1": flat.take(pa.array(idx)),
                       "w2": flat.take(pa.array(idx + 1)),
                       "n": pa.array(np.ones(len(idx), np.int64))})
        g = tt.group_by(["w1", "w2"]).aggregate([("n", "sum")])
        return pa.table({"w1": g["w1"], "w2": g["w2"], "n": g["n_sum"]})

    model = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby(["w1", "w2"]).sum("n").to_pandas()
             .rename(columns={"sum(n)": "n"}))
    model["total"] = model.groupby("w1")["n"].transform("sum")
    model["pm"] = 1000 * model["n"].astype(np.int64) \
        // model["total"].astype(np.int64)
    if top_k is not None:
        model = model.sort_values(["n", "w1", "w2"],
                                  ascending=[False, True, True],
                                  kind="mergesort").head(top_k)
    lut = dict(zip(model["w1"] + "\x1f" + model["w2"],
                   model["pm"].astype(np.int64)))
    lut_ref = ray.put(lut)

    def score(t: pa.Table) -> pa.Table:
        table = ray.get(lut_ref)
        flat, n_words = _word_stream(t[text_col])
        n_docs = len(t)
        sums = np.zeros(n_docs, np.int64)
        cnts = np.zeros(n_docs, np.int64)
        if len(flat) >= 2:
            ends = np.cumsum(n_words)
            doc_of = np.searchsorted(ends, np.arange(len(flat)),
                                     side="right")
            idx = np.flatnonzero(doc_of[:-1] == doc_of[1:])
            if len(idx):
                keys = pc.binary_join_element_wise(
                    flat.take(pa.array(idx)), flat.take(pa.array(idx + 1)),
                    "\x1f")
                pm = (pd.Series(keys.to_pandas()).map(table)
                      .fillna(0).to_numpy(np.int64))
                pair_doc = doc_of[idx]
                sums = np.bincount(pair_doc, weights=pm,
                                   minlength=n_docs).astype(np.int64)
                cnts = np.bincount(pair_doc,
                                   minlength=n_docs).astype(np.int64)
        avg = np.where(cnts == 0, 0,
                       sums // np.where(cnts == 0, 1, cnts))
        return pa.table({id_col: t[id_col],
                         **{c: t[c] for c in passthrough_cols},
                         "n_bigrams": pa.array(cnts),
                         "score_sum": pa.array(sums),
                         "avg_permille": pa.array(avg)})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def collocations(
    ds: ray.data.Dataset,
    text_col: str,
    *,
    min_count: int = 2,
) -> ray.data.Dataset:
    """Collocation / phrase mining (word2phrase): for every adjacent
    word pair seen at least ``min_count`` times, the integer-permille
    lift ``1000 * n_xy * n_tokens // (n_x * n_y)`` -- >1000 means the
    pair co-occurs more than independence predicts, the signal used to
    merge "new york"-style phrases before tokenizer training.  Exact
    int64 (checked multiplies) so both engines agree bit-for-bit.

    Scale shape: one pass emits per-block (w1, w2) count partials
    (bigram-vocabulary-sized exchange) and per-block unigram partials
    (vocabulary-sized); unigram totals and the token count come back as
    one driver-sized table broadcast into the final lift map.  Output:
    ``w1, w2, n_xy, lift_permille``."""
    from .curation import _word_stream

    def bigram_partial(t: pa.Table) -> pa.Table:
        flat, n_words = _word_stream(t[text_col])
        if len(flat) < 2:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        ends = np.cumsum(n_words)
        doc_of = np.searchsorted(ends, np.arange(len(flat)), side="right")
        idx = np.flatnonzero(doc_of[:-1] == doc_of[1:])
        tt = pa.table({"w1": flat.take(pa.array(idx)),
                       "w2": flat.take(pa.array(idx + 1)),
                       "n": pa.array(np.ones(len(idx), np.int64))})
        g = tt.group_by(["w1", "w2"]).aggregate([("n", "sum")])
        return pa.table({"w1": g["w1"], "w2": g["w2"], "n": g["n_sum"]})

    def unigram_partial(t: pa.Table) -> pa.Table:
        flat, _ = _word_stream(t[text_col])
        tt = pa.table({"w": flat,
                       "n": pa.array(np.ones(len(flat), np.int64))})
        g = tt.group_by("w").aggregate([("n", "sum")])
        return pa.table({"w": g["w"], "n": g["n_sum"]})

    uni = (ds.map_batches(unigram_partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("w").sum("n").to_pandas()
           .rename(columns={"sum(n)": "n"}))
    n_tokens = int(uni["n"].sum())
    lut = dict(zip(uni["w"], uni["n"].astype(np.int64)))
    uni_ref = ray.put((lut, n_tokens))

    from ray.data.aggregate import Sum

    bigrams = (ds.map_batches(bigram_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby(["w1", "w2"])
               .aggregate(Sum("n", alias_name="n_xy")))

    def lift(t: pa.Table) -> pa.Table:
        table, total = ray.get(uni_ref)
        t = t.filter(pc.greater_equal(t["n_xy"].combine_chunks(),
                                      min_count))
        n_xy = t["n_xy"].combine_chunks()
        nx = pd.Series(t["w1"].combine_chunks().to_pandas()).map(
            table).to_numpy(np.int64)
        ny = pd.Series(t["w2"].combine_chunks().to_pandas()).map(
            table).to_numpy(np.int64)
        num = pc.multiply_checked(
            pc.multiply_checked(n_xy, pa.scalar(1000, pa.int64())),
            pa.scalar(total, pa.int64()))
        den = pc.multiply_checked(pa.array(nx), pa.array(ny))
        return pa.table({"w1": t["w1"], "w2": t["w2"], "n_xy": n_xy,
                         "lift_permille": pc.divide(num, den)})

    return bigrams.map_batches(lift, batch_format="pyarrow")


def gopher_rules(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    min_words: int = 30,
    max_words: int = 80,
    min_mwl_pm: int = 4000,
    max_mwl_pm: int = 5000,
    min_stopwords: int = 2,
) -> ray.data.Dataset:
    """Gopher-style document quality rule bundle (Rae et al. 2021,
    arXiv:2112.11446 Appendix A1.1): word-count range, mean-word-length
    range, and minimum stop-word presence, each reported per document
    alongside the combined gate -- the per-rule breakdown is what a
    curation run audits (WHY a doc was dropped), not just the verdict.

    Integer-exact (mean word length as chars*1000//words permille) and
    a single pure vectorized map: one word-stream flatten, one
    utf8_length + two bincounts, one is_in per batch.  Thresholds are
    tuned to be BINDING on the synthetic corpus (word counts span
    10-100, mwl permille ~3500-5700) so the oracle checks real
    decisions.

    Output: ``id_col, n_words, mwl_pm, n_stop, r_words, r_mwl, r_stop,
    passed`` (all int64).
    """
    from ci_log_processing_ray.ops.curation import _word_stream

    stop = pa.array(["a", "an", "the", "and", "of", "to", "in", "is"])

    def rules(t: pa.Table) -> pa.Table:
        flat, n_words = _word_stream(t[text_col])
        n_docs = len(t)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)
        wl = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        chars = np.bincount(doc_idx, weights=wl.astype(np.float64),
                            minlength=n_docs).astype(np.int64)
        nw = n_words.astype(np.int64)
        mwl = np.where(nw > 0, chars * 1000 // np.maximum(nw, 1), 0)
        is_stop = pc.is_in(flat, value_set=stop).to_numpy(
            zero_copy_only=False)
        n_stop = np.bincount(doc_idx, weights=is_stop.astype(np.float64),
                             minlength=n_docs).astype(np.int64)
        r_words = ((nw >= min_words) & (nw <= max_words)).astype(np.int64)
        r_mwl = ((mwl >= min_mwl_pm) & (mwl <= max_mwl_pm)).astype(np.int64)
        r_stop = (n_stop >= min_stopwords).astype(np.int64)
        return pa.table({
            id_col: t[id_col],
            "n_words": pa.array(nw),
            "mwl_pm": pa.array(mwl),
            "n_stop": pa.array(n_stop),
            "r_words": pa.array(r_words),
            "r_mwl": pa.array(r_mwl),
            "r_stop": pa.array(r_stop),
            "passed": pa.array(r_words * r_mwl * r_stop),
        })

    return ds.map_batches(rules, batch_format="pyarrow",
                          zero_copy_batch=True)


def distinctive_terms(
    ds: ray.data.Dataset,
    text_col: str,
    group_col: str,
    *,
    min_count: int = 2,
    ratio_num: int = 13,
    ratio_den: int = 10,
) -> pd.DataFrame:
    """Keyness mining: for every (group, word), the exact odds ratio of
    the 2x2 contingency table (word in group vs word elsewhere) as an
    integer rational -- or_num = a*d, or_den = b*c with a = in-group
    occurrences, b = elsewhere occurrences, c/d = the complements.
    Keeps words with ``a >= min_count`` whose ratio exceeds
    ``ratio_num/ratio_den`` via cross-multiplied integer comparison
    (a word exclusive to the group has or_den = 0 and is kept) -- the
    corpus-curation primitive for source-distinctive vocabulary.

    Scale shape: per-block (group, word) count partials collapse the
    token stream BEFORE the exchange (vocabulary x groups sized, never
    rows); the final fold is one driver pandas pass over that
    vocabulary-sized table.  Overflow bound: a*d < 2^63 requires total
    corpus tokens < ~3e9 per run -- compute over a sampled or per-shard
    window above that."""
    from .curation import _word_stream

    def partial(t: pa.Table) -> pa.Table:
        flat, n_words = _word_stream(t[text_col])
        grp = np.repeat(
            t[group_col].combine_chunks().to_numpy(zero_copy_only=False),
            n_words)
        tt = pa.table({group_col: pa.array(grp, pa.string()),
                       "word": flat,
                       "n": pa.array(np.ones(len(flat), np.int64))})
        g = tt.group_by([group_col, "word"]).aggregate([("n", "sum")])
        return pa.table({group_col: g[group_col], "word": g["word"],
                         "n": g["n_sum"]})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby([group_col, "word"]).sum("n").to_pandas()
           .rename(columns={"sum(n)": "a"}))
    if "a" not in agg.columns:   # empty corpus: columns dropped
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "word": pd.Series([], dtype=object),
                             "a": pd.Series([], dtype=np.int64),
                             "or_num": pd.Series([], dtype=np.int64),
                             "or_den": pd.Series([], dtype=np.int64)})
    a = agg["a"].to_numpy(np.int64)
    ts = agg.groupby(group_col)["a"].transform("sum").to_numpy(np.int64)
    tw = agg.groupby("word")["a"].transform("sum").to_numpy(np.int64)
    n = int(a.sum())
    b = tw - a
    c = ts - a
    d = n - tw - ts + a
    or_num = a * d
    or_den = b * c
    keep = (a >= min_count) & (ratio_den * or_num > ratio_num * or_den)
    out = pd.DataFrame({
        group_col: agg[group_col].to_numpy()[keep],
        "word": agg["word"].to_numpy()[keep],
        "a": a[keep], "or_num": or_num[keep], "or_den": or_den[keep]})
    return out.reset_index(drop=True)


def vocab_drift(
    ds: ray.data.Dataset,
    text_col: str,
    group_col: str,
) -> pd.DataFrame:
    """Distribution drift per group: the total-variation distance
    between each group's word distribution and the REST of the
    corpus's, as an exact integer rational --
    TV = tv_num / tv_den with tv_num = sum_w |a_w*(N-ts) - b_w*ts|
    and tv_den = 2*ts*(N-ts) (a_w in-group count, b_w elsewhere count,
    ts group total, N corpus total).  0 = identical mix, 1 = disjoint
    vocabularies; the drift score for a log source or crawl snapshot
    whose content shifted.

    Same scale shape as :func:`distinctive_terms`: per-block
    (group, word) count partials, one vocabulary-sized driver fold.
    Overflow bound: a_w * N < 2^63."""
    from .curation import _word_stream

    def partial(t: pa.Table) -> pa.Table:
        flat, n_words = _word_stream(t[text_col])
        grp = np.repeat(
            t[group_col].combine_chunks().to_numpy(zero_copy_only=False),
            n_words)
        tt = pa.table({group_col: pa.array(grp, pa.string()),
                       "word": flat,
                       "n": pa.array(np.ones(len(flat), np.int64))})
        g = tt.group_by([group_col, "word"]).aggregate([("n", "sum")])
        return pa.table({group_col: g[group_col], "word": g["word"],
                         "n": g["n_sum"]})

    agg = (ds.map_batches(partial, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby([group_col, "word"]).sum("n").to_pandas()
           .rename(columns={"sum(n)": "a"}))
    if "a" not in agg.columns:   # empty corpus: columns dropped
        return pd.DataFrame({group_col: pd.Series([], dtype=object),
                             "tv_num": pd.Series([], dtype=np.int64),
                             "tv_den": pd.Series([], dtype=np.int64)})
    a = agg["a"].to_numpy(np.int64)
    ts = agg.groupby(group_col)["a"].transform("sum").to_numpy(np.int64)
    tw = agg.groupby("word")["a"].transform("sum").to_numpy(np.int64)
    n = int(a.sum())
    # per observed (group, word): |a*(N-ts) - (tw-a)*ts|; words absent
    # from the group contribute b_w*ts -- fold them in via the word
    # total: sum over absent w of tw*ts = (N - sum of tw present)*ts
    term = np.abs(a * (n - ts) - (tw - a) * ts)
    df = pd.DataFrame({group_col: agg[group_col].to_numpy(),
                       "term": term, "tw": tw, "ts": ts})
    g = df.groupby(group_col, as_index=False).agg(
        present=("term", "sum"), tw_seen=("tw", "sum"),
        ts=("ts", "first"))
    absent = (n - g["tw_seen"].to_numpy(np.int64)) * g["ts"].to_numpy(
        np.int64)
    ts_v = g["ts"].to_numpy(np.int64)
    out = pd.DataFrame({
        group_col: g[group_col].to_numpy(),
        "tv_num": g["present"].to_numpy(np.int64) + absent,
        "tv_den": 2 * ts_v * (n - ts_v)})
    return out.reset_index(drop=True)


def bm25_top_terms(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    k: int = 3,
) -> ray.data.Dataset:
    """Top-``k`` BM25 terms per document, integer-exact (the retrieval
    scorer behind search-based curation and query-document relevance
    mining; Robertson/Sparck Jones, k1=1.2 b=0.75).

    Engine-exact integer contract (no transcendental log in the hash
    path): with N docs, avgdl_milli = 1000*W//N for W total words,
    idf_scaled = 1000*(2N-2df+1) // (2df+1) (the BM25 idf RATIO x1000,
    log dropped the way tfidf_top_terms drops it), and k1=6/5, b=3/4
    cleared of denominators::

        score = idf_scaled * 44 * avgdl_milli * tf
                // (20*avgdl_milli*tf + 6*avgdl_milli + 18000*dl)

    (exact rational arithmetic; production at web scale would swap the
    scaled idf for float log idf OUTSIDE the oracle path -- magnitudes
    here hold to ~1e12 docs before int64 pressure).

    Scale shape: one corpus pass builds the document-frequency table
    plus the corpus word total (vocabulary-sized shuffle; the W total
    rides the same exchange as a sentinel row), the DF table broadcasts
    via ``ray.put`` (vocabulary contract, same as tfidf), and a second
    pure-map pass scores and picks top-k per doc.  Output: id, term,
    tf, dl, score (all int64)."""
    from ci_log_processing_ray.ops.curation import _word_stream

    n_docs = ds.count()
    _TOTAL = "\x00__corpus_total__"

    def df_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        flat, n_words = _word_stream(t[text_col])
        doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), n_words)
        d = pd.DataFrame({"word": flat.to_numpy(zero_copy_only=False),
                          "doc": ids[doc_idx]}).drop_duplicates()
        vc = d.groupby("word", sort=False).size()
        words = np.concatenate([vc.index.to_numpy(), [_TOTAL]])
        cnts = np.concatenate([vc.to_numpy().astype(np.int64),
                               [np.int64(n_words.sum())]])
        return pa.table({"word": pa.array(words, pa.string()),
                         "df": pa.array(cnts)})

    from ray.data.aggregate import Sum

    df_tbl = (ds.map_batches(df_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("word").aggregate(Sum("df", alias_name="df"))
              .to_pandas())
    dfm = dict(zip(df_tbl["word"], df_tbl["df"]))
    w_total = int(dfm.pop(_TOTAL))
    avgdl_milli = 1000 * w_total // max(n_docs, 1)
    df_ref = ray.put(dfm)

    def topk(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        flat, n_words = _word_stream(t[text_col])
        doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), n_words)
        d = pd.DataFrame({"word": flat.to_numpy(zero_copy_only=False),
                          "doc": ids[doc_idx]})
        tf = d.groupby(["doc", "word"], sort=False).size().reset_index(
            name="tf")
        dl_by_doc = dict(zip(ids, n_words))
        dfv = tf["word"].map(ray.get(df_ref)).to_numpy().astype(np.int64)
        tfv = tf["tf"].to_numpy().astype(np.int64)
        dlv = tf["doc"].map(dl_by_doc).to_numpy().astype(np.int64)
        am = np.int64(avgdl_milli)
        nn = np.int64(n_docs)
        idf = 1000 * (2 * nn - 2 * dfv + 1) // (2 * dfv + 1)
        tf["dl"] = dlv
        tf["score"] = (idf * 44 * am * tfv
                       // (20 * am * tfv + 6 * am + 18000 * dlv))
        tf = tf.sort_values(["doc", "score", "word"],
                            ascending=[True, False, True],
                            kind="mergesort")
        top = tf.groupby("doc", sort=False).head(k)
        return pa.table({
            id_col: pa.array(top["doc"].to_numpy()),
            "term": pa.array(top["word"].to_numpy(), pa.string()),
            "tf": pa.array(top["tf"].to_numpy().astype(np.int64)),
            "dl": pa.array(top["dl"].to_numpy().astype(np.int64)),
            "score": pa.array(top["score"].to_numpy().astype(np.int64))})

    return ds.map_batches(topk, batch_format="pyarrow",
                          zero_copy_batch=True)


def nb_classifier_score(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    label_col: str,
    pos_value: str,
) -> ray.data.Dataset:
    """fastText-style bag-of-words quality classifier (multinomial
    Naive Bayes shape): train class-distinctive word weights against a
    binary label, then score every document -- the GPT-3/CCNet
    'looks like the target distribution' curation gate.

    Engine-exact integer contract (no transcendental log in the hash
    path, the same convention as :func:`bm25_top_terms`): with
    Laplace-smoothed class-conditional rates
    p(w|+) = (n_w+ + 1)/(tok+ + V) and p(w|-) likewise, the per-word
    weight is the smoothed rate RATIO x1000 floored, centered::

        wgt(w) = 1000 * (n_w+ + 1) * (tok- + V)
                 // ((n_w- + 1) * (tok+ + V)) - 1000

    (sign matches the true per-word log-odds sign; production at web
    scale would sum float log-odds OUTSIDE the oracle path).  A doc's
    score is the int64 sum of wgt over its word OCCURRENCES and
    pred = score > 0.  Unseen-at-train words fall back to the
    totals-ratio weight (both smoothed rates collapse to 1/(tok+V)).

    Scale shape: pass 1 collapses the corpus to per-block
    (word, n_pos, n_neg) partials combined through a vocabulary-sized
    native groupby; weights compute driver-side in Python ints (the
    1000*(n+1)*(tok+V) product overflows int64 at web scale) and
    broadcast ONCE via ray.put as a sorted array; pass 2 is pure map
    -- flat word stream, searchsorted lookup, segment-cumsum per-doc
    sums (empty-doc safe, unlike reduceat).  No corpus-sized
    exchange.  Output: id, score, pred (all int64)."""
    from ray.data.aggregate import Sum

    from ci_log_processing_ray.ops.curation import _word_stream

    def count_partial(t: pa.Table) -> pa.Table:
        pos = pc.equal(t[label_col].combine_chunks(),
                       pos_value).to_numpy(zero_copy_only=False)
        flat, n_words = _word_stream(t[text_col])
        d = pd.DataFrame({
            "word": flat.to_numpy(zero_copy_only=False),
            "np_": np.repeat(pos.astype(np.int64), n_words)})
        g = (d.groupby("word", sort=False)["np_"]
             .agg(["sum", "size"]).reset_index())
        return pa.table({
            "word": pa.array(g["word"], pa.string()),
            "n_pos": pa.array(g["sum"].to_numpy().astype(np.int64)),
            "n_neg": pa.array((g["size"] - g["sum"]).to_numpy()
                              .astype(np.int64))})

    vocab = (ds.map_batches(count_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("word")
             .aggregate(Sum("n_pos", alias_name="n_pos"),
                        Sum("n_neg", alias_name="n_neg"))
             .to_pandas())
    v = len(vocab)
    tp = int(vocab["n_pos"].sum())
    tn = int(vocab["n_neg"].sum())
    order = np.argsort(vocab["word"].to_numpy())
    words_sorted = vocab["word"].to_numpy()[order]
    npv = vocab["n_pos"].to_numpy().astype(object)[order]
    nnv = vocab["n_neg"].to_numpy().astype(object)[order]
    wgt = (1000 * (npv + 1) * (tn + v)
           // ((nnv + 1) * (tp + v)) - 1000).astype(np.int64)
    oov = np.int64(1000 * (tn + v) // (tp + v) - 1000)
    ref = ray.put((words_sorted, wgt))

    def score(t: pa.Table) -> pa.Table:
        ws, wv = ray.get(ref)
        ids = t[id_col].combine_chunks()
        flat, n_words = _word_stream(t[text_col])
        fw = flat.to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(ws, fw), 0, max(len(ws) - 1, 0))
        if len(ws):
            w = np.where(ws[idx] == fw, wv[idx], oov)
        else:
            w = np.full(len(fw), oov)
        cum = np.concatenate([[0], np.cumsum(w, dtype=np.int64)])
        ends = np.cumsum(n_words)
        sums = cum[ends] - cum[ends - n_words]
        return pa.table({
            id_col: ids,
            "score": pa.array(sums, pa.int64()),
            "pred": pa.array((sums > 0).astype(np.int64))})

    return ds.map_batches(score, batch_format="pyarrow",
                          zero_copy_batch=True)


def prediction_kappa(
    ds: ray.data.Dataset,
    true_col: str,
    pred_col: str,
) -> ray.data.Dataset:
    """Cohen's kappa between a predicted and a true categorical column
    -- chance-corrected agreement, the label-quality / annotator-audit
    metric (raw accuracy flatters skewed label sets; kappa does not).

    Exact integer contract: with n rows, A agreements and
    S = sum_k rowmarg_k * colmarg_k,
    ``kappa_permille = 1000*(n*A - S) // (n*n - S)`` (floor; Python
    ints on the driver, no float in the hash path).  Undefined when
    pe = 1 (a single class on both sides) -- raises.

    Scale shape: one map_batches pass collapses each block to its
    confusion-matrix partial (classes^2-sized, vocabulary contract);
    a native groupby-sum merges them; kappa arithmetic touches only
    the final tiny matrix.  Output: one row (n, agree,
    kappa_permille)."""

    def conf_partial(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby([true_col, pred_col], sort=False)
               .size().reset_index(name="c"))
        out["c"] = out["c"].astype(np.int64)
        return out

    conf = (ds.map_batches(conf_partial, batch_format="pandas")
            .groupby([true_col, pred_col]).sum("c").to_pandas())
    n = int(conf["sum(c)"].sum())
    agree = int(conf.loc[conf[true_col] == conf[pred_col],
                         "sum(c)"].sum())
    rm = conf.groupby(true_col)["sum(c)"].sum()
    cm = conf.groupby(pred_col)["sum(c)"].sum()
    s = int(sum(int(rm[k]) * int(cm[k])
                for k in rm.index if k in cm.index))
    denom = n * n - s
    if denom == 0:
        raise ValueError("kappa undefined: chance agreement is 1 "
                         "(single class on both sides)")
    kappa_permille = 1000 * (n * agree - s) // denom
    return ray.data.from_arrow(pa.table({
        "n": pa.array([n], pa.int64()),
        "agree": pa.array([agree], pa.int64()),
        "kappa_permille": pa.array([kappa_permille], pa.int64())}))


def lexical_richness_by_group(
    ds: ray.data.Dataset,
    text_col: str,
    group_col: str,
) -> ray.data.Dataset:
    """Per-group lexical-richness metrics, exact int64: token count,
    type count (distinct words), hapax count (words occurring exactly
    once in the group), type-token ratio and hapax share as permille
    rationals -- the template-spam / vocabulary-collapse audit (a
    boilerplate source shows low TTR and a near-zero hapax share).

    Scale shape: blocks collapse to (group, word, cnt) partials, one
    vocabulary-sized bucketed sum merges them, and a per-group fold
    over the (group's) vocabulary computes the three counts.  Output:
    group, n_tokens, n_types, n_hapax, ttr_permille =
    1000*n_types//n_tokens, hapax_permille = 1000*n_hapax//n_types."""
    from ci_log_processing_ray.ops.curation import _word_stream
    from ci_log_processing_ray.ops.window import bucketed_groups

    def partial(t: pa.Table) -> pa.Table:
        grp = t[group_col].combine_chunks().to_numpy(
            zero_copy_only=False)
        flat, n_words = _word_stream(t[text_col])
        gidx = np.repeat(np.arange(len(grp), dtype=np.int64), n_words)
        d = pd.DataFrame({
            "g": grp[gidx],
            "word": flat.to_numpy(zero_copy_only=False)})
        vc = (d.groupby(["g", "word"], sort=False)
              .size().reset_index(name="cnt"))
        return pa.table({
            "g": pa.array(vc["g"].to_numpy()),
            "word": pa.array(vc["word"].to_numpy(), pa.string()),
            "cnt": pa.array(vc["cnt"].to_numpy().astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    # ONE exchange: hash(g) bucketing co-locates every (g, word)
    # partial of a group, so the kernel merges the word counts AND
    # folds the richness metrics in the same pass
    def fold_vec(g: pd.DataFrame) -> pd.DataFrame:
        pw = (g.groupby(["g", "word"], as_index=False, sort=False)
              ["cnt"].sum())
        cnt = pw["cnt"].to_numpy(np.int64)
        tmp = pd.DataFrame({"g": pw["g"].to_numpy(),
                            "tok": cnt,
                            "hap": (cnt == 1).astype(np.int64)})
        out = (tmp.groupby("g", as_index=False, sort=False)
               .agg(n_tokens=("tok", "sum"), n_types=("tok", "size"),
                    n_hapax=("hap", "sum")))
        toks = out["n_tokens"].to_numpy(np.int64)
        typs = out["n_types"].to_numpy(np.int64)
        haps = out["n_hapax"].to_numpy(np.int64)
        out["ttr_permille"] = 1000 * typs // toks
        out["hapax_permille"] = 1000 * haps // typs
        return out

    return bucketed_groups(partials, "g", fold_vec).map_batches(
        lambda t: t.rename_columns(
            [group_col, "n_tokens", "n_types", "n_hapax",
             "ttr_permille", "hapax_permille"]),
        batch_format="pyarrow", zero_copy_batch=True)


def source_vocab_overlap(
    ds: ray.data.Dataset,
    group_col: str,
    text_col: str,
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Pairwise vocabulary overlap between sources: for every source
    pair (a < b), the EXACT intersection and union sizes of their
    distinct-word sets -- the corpus-mixing diagnostic behind
    source-similarity matrices (emit the integer pair instead of a
    float Jaccard so the hash path stays exact; callers divide).

    Scale shape: blocks collapse to block-distinct (source, word)
    partials, one vocabulary-x-sources-sized distinct exchange, then a
    word-bucketed self-merge generates co-occurrence pairs (per-word
    volume is C(#sources-with-word, 2) -- sources are a small set, so
    this is bounded by vocab * sources^2, never corpus-shaped); sizes
    ride a per-source count and join driver-side (sources-sized).
    Output: src_a, src_b, inter, uni (int64)."""
    from ci_log_processing_ray.ops.curation import _word_stream

    from .window import bucketed_distinct, bucketed_groups, bucketed_sum

    def distinct_partial(t: pa.Table) -> pa.Table:
        src = t[group_col].combine_chunks().to_numpy(
            zero_copy_only=False)
        flat, n_words = _word_stream(t[text_col])
        d = pd.DataFrame({
            "src": np.repeat(src, n_words),
            "w": flat.to_numpy(zero_copy_only=False)}).drop_duplicates()
        return pa.table({"src": pa.array(d["src"], pa.string()),
                         "w": pa.array(d["w"], pa.string())})

    sw = bucketed_distinct(
        ds.map_batches(distinct_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["w", "src"], n_buckets=n_buckets).materialize()

    sizes = (sw.map_batches(
        lambda t: pa.table({"src": t["src"],
                            "one": pa.array(np.ones(t.num_rows,
                                                    np.int64))}),
        batch_format="pyarrow")
        .groupby("src").sum("one").to_pandas())
    size_of = dict(zip(sizes["src"], sizes["sum(one)"]))

    def pair_kern(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="w", suffixes=("_a", "_b"))
        m = m[m["src_a"] < m["src_b"]]
        out = (m.groupby(["src_a", "src_b"], as_index=False,
                         sort=False).size()
               .rename(columns={"size": "inter"}))
        out["inter"] = out["inter"].astype(np.int64)
        return out

    pairs = bucketed_sum(
        bucketed_groups(sw, "w", pair_kern, n_buckets=n_buckets),
        ["src_a", "src_b"], ["inter"], n_buckets=n_buckets)

    def finish(t: pa.Table) -> pa.Table:
        a = t["src_a"].combine_chunks().to_numpy(zero_copy_only=False)
        b = t["src_b"].combine_chunks().to_numpy(zero_copy_only=False)
        inter = t["inter"].combine_chunks().to_numpy(
            zero_copy_only=False)
        na = np.array([size_of[x] for x in a], np.int64)
        nb = np.array([size_of[x] for x in b], np.int64)
        return pa.table({"src_a": t["src_a"], "src_b": t["src_b"],
                         "inter": t["inter"],
                         "uni": pa.array(na + nb - inter, pa.int64())})

    return pairs.map_batches(finish, batch_format="pyarrow")


def ngram_count_of_counts(
    ds: ray.data.Dataset,
    text_col: str,
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Count-of-counts N_c histograms for unigrams and bigrams -- the
    sufficient statistics of Kneser-Ney / Good-Turing smoothing
    (language-model training wants N_1, N_2, ... per order, never the
    gram list itself).  Output: ord (1|2), freq, n_ngrams (int64).

    Scale shape: each block collapses to local (gram, count) partials
    (bigrams never cross document boundaries; the flat word stream is
    masked at doc ends); ONE corpus-shaped bucketed sum produces exact
    global gram frequencies inside the buckets -- the gram list never
    reaches the driver -- and each bucket collapses to its (ord, freq)
    histogram partial, so the final native groupby is
    count-of-count-sized (heavy-tail bound ~O(sqrt(total)))."""
    from ci_log_processing_ray.ops.curation import _word_stream

    from .window import bucketed_sum

    sep = "\x1f"

    def partial(t: pa.Table) -> pa.Table:
        flat, n_words = _word_stream(t[text_col])
        w = pd.Series(flat.to_numpy(zero_copy_only=False))
        ends = np.cumsum(n_words)
        if len(w) > 1:
            mask = np.ones(len(w) - 1, bool)
            cut = ends[:-1] - 1
            mask[cut[(cut >= 0) & (cut < len(w) - 1)]] = False
            bg = (w.iloc[:-1].reset_index(drop=True)[mask] + sep
                  + w.iloc[1:].reset_index(drop=True)[mask])
        else:
            bg = pd.Series([], dtype=object)
        grams = pd.concat(
            ["1" + sep + w, "2" + sep + bg], ignore_index=True)
        vc = grams.value_counts(sort=False)
        return pa.table({
            "g": pa.array(vc.index.to_numpy(), pa.string()),
            "c": pa.array(vc.to_numpy().astype(np.int64))})

    summed = bucketed_sum(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["g"], ["c"], n_buckets=n_buckets)

    def hist_partial(t: pa.Table) -> pa.Table:
        g = t["g"].combine_chunks()
        c = t["c"].combine_chunks().to_numpy(zero_copy_only=False)
        ordv = pc.utf8_slice_codeunits(g, 0, 1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        d = (pd.DataFrame({"ord": ordv, "freq": c})
             .groupby(["ord", "freq"], as_index=False, sort=False)
             .size().rename(columns={"size": "n_ngrams"}))
        return pa.table({"ord": d["ord"].to_numpy(np.int64),
                         "freq": d["freq"].to_numpy(np.int64),
                         "n_ngrams": d["n_ngrams"].to_numpy(np.int64)})

    agg = (summed.map_batches(hist_partial, batch_format="pyarrow")
           .groupby(["ord", "freq"]).sum("n_ngrams"))
    return agg.map_batches(
        lambda t: pa.table({"ord": t["ord"], "freq": t["freq"],
                            "n_ngrams": t["sum(n_ngrams)"]}),
        batch_format="pyarrow")


def skipgram_topk(
    ds: ray.data.Dataset,
    text_col: str,
    *,
    window: int = 3,
    k: int = 20,
) -> ray.data.Dataset:
    """Top-``k`` positional skip-gram pairs: ordered word pairs
    (w1, w2) with w2 at most ``window`` positions after w1 inside one
    document -- the co-occurrence statistic word2vec/GloVe train on
    (doc-level cooccurrence and adjacent-only collocations both miss
    it).  Exact counts; ties at the k boundary break by
    (n desc, w1, w2).

    Scale shape: the flat word stream pairs with itself at each of the
    ``window`` offsets under a doc-boundary mask (no per-doc dispatch);
    blocks collapse to local pair counts, so the shuffle carries
    vocabulary^2-bounded partials and the final native groupby + tiny
    sort stay vocabulary-shaped."""
    from ray.data.aggregate import Sum

    from ci_log_processing_ray.ops.curation import _word_stream

    sep = "\x1f"

    def partial(t: pa.Table) -> pa.Table:
        flat, n_words = _word_stream(t[text_col])
        w = pd.Series(flat.to_numpy(zero_copy_only=False))
        ends = np.cumsum(n_words)
        parts = []
        for off in range(1, window + 1):
            if len(w) <= off:
                break
            # pair i with i+off unless i+off crosses a doc end
            mask = np.ones(len(w) - off, bool)
            for d in range(1, off + 1):
                cut = ends - d
                cut = cut[(cut >= 0) & (cut < len(w) - off)]
                mask[cut] = False
            parts.append(w.iloc[:-off].reset_index(drop=True)[mask]
                         + sep
                         + w.iloc[off:].reset_index(drop=True)[mask])
        if not parts:
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = pd.concat(parts, ignore_index=True).value_counts(
            sort=False)
        pairs = vc.index.to_numpy()
        spl = pd.Series(pairs).str.split(sep, expand=True)
        return pa.table({
            "w1": pa.array(spl[0].to_numpy(), pa.string()),
            "w2": pa.array(spl[1].to_numpy(), pa.string()),
            "n": pa.array(vc.to_numpy().astype(np.int64))})

    counts = (ds.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby(["w1", "w2"]).aggregate(Sum("n", alias_name="n")))
    return counts.sort(["n", "w1", "w2"],
                       descending=[True, False, False]).limit(k)


def gopher_repetition(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """Gopher-style within-document repetition signals (Rae et al.
    2021, arXiv:2112.11446 Appendix A1.2, adapted to word streams):

    - ``top2_pm``:  permille share of word-bigram slots taken by the
      document's single most frequent bigram (floor integer;
      0 for docs with < 2 words);
    - ``dup3_pm``:  permille share of word-3-gram slots occupied by
      REPEATED 3-grams (slots - distinct, floor; 0 for docs with
      < 3 words).  Window sized to the corpus's repetition scale:
      Gopher's A1.2 table spans n = 2..10, and on this corpus n = 3
      is the largest window where the signal is non-trivial
      (27-33 binding docs at sf0.001/0.01; n >= 5 is identically 0).

    Exact integers end to end: words dictionary-encode per batch and
    grams become base-V integer codes (a bijection -- no hashing, no
    collision contract), so the DuckDB string-gram oracle matches
    bit-for-bit.  One pure vectorized map per batch: a flatten, one
    dictionary encode, two lexsorts; per-doc folds are bincount /
    reduceat.  Scale shape: pure map, zero exchange -- per-doc state
    never leaves the batch (the corpus-wide analogue is duplicate_spans).
    Requires batch vocabulary V with V^3 < 2^62 (asserted); corpus
    vocabularies beyond ~1.6M distinct words per batch would need the
    hashed variant."""

    def kern(t: pa.Table) -> pa.Table:
        from ci_log_processing_ray.ops.curation import _word_stream

        flat, n_words = _word_stream(t[text_col])
        n_docs = len(t)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)
        enc = flat.dictionary_encode()
        c = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = max(1, len(enc.dictionary))
        assert V ** 3 < (1 << 62), \
            f"batch vocab {V} too large for exact base-V 3-gram codes"

        top2 = np.zeros(n_docs, np.int64)
        dup3 = np.zeros(n_docs, np.int64)
        if len(c) >= 2:
            same = doc_idx[1:] == doc_idx[:-1]
            bgd = doc_idx[1:][same]
            bg = c[:-1][same] * V + c[1:][same]
            if len(bg):
                order = np.lexsort((bg, bgd))
                sd, sb = bgd[order], bg[order]
                new = np.ones(len(sd), bool)
                new[1:] = (sd[1:] != sd[:-1]) | (sb[1:] != sb[:-1])
                starts = np.flatnonzero(new)
                rl = np.diff(np.append(starts, len(sd)))
                run_doc = sd[starts]
                dnew = np.ones(len(run_doc), bool)
                dnew[1:] = run_doc[1:] != run_doc[:-1]
                dstarts = np.flatnonzero(dnew)
                maxc = np.maximum.reduceat(rl, dstarts)
                nbg = np.bincount(bgd, minlength=n_docs)
                top2[run_doc[dstarts]] = 1000 * maxc
                top2 = np.where(nbg > 0, top2 // np.maximum(nbg, 1), 0)
        if len(c) >= 3:
            same3 = doc_idx[2:] == doc_idx[:-2]
            g3d = doc_idx[2:][same3]
            code3 = ((c[:-2] * V + c[1:-1]) * V + c[2:])[same3]
            if len(code3):
                order = np.lexsort((code3, g3d))
                sd, sg = g3d[order], code3[order]
                new = np.ones(len(sd), bool)
                new[1:] = (sd[1:] != sd[:-1]) | (sg[1:] != sg[:-1])
                distinct = np.bincount(sd[np.flatnonzero(new)],
                                       minlength=n_docs)
                slots = np.bincount(g3d, minlength=n_docs)
                dup3 = np.where(
                    slots > 0,
                    1000 * (slots - distinct) // np.maximum(slots, 1), 0)
        return pa.table({
            id_col: t[id_col],
            "n_words": pa.array(n_words, type=pa.int64()),
            "top2_pm": pa.array(top2.astype(np.int64)),
            "dup3_pm": pa.array(dup3.astype(np.int64)),
        })

    return ds.map_batches(kern, batch_format="pyarrow",
                          batch_size=None, zero_copy_batch=True)


def keyword_occurrences(
    ds: "ray.data.Dataset",
    text_col: str,
    patterns: list[str],
) -> "ray.data.Dataset":
    """Multi-pattern keyword/phrase tagging (the broadcast-dictionary
    curation primitive behind PII flags, topic tags and blocklist
    hits): for each pattern, the number of documents containing it and
    the total number of (non-overlapping, left-to-right) occurrences
    -- the same counting rule SQL's REPLACE-length idiom implements,
    so the oracle is exact.

    Scale shape: pure map -- each batch runs one vectorized
    ``pc.count_substring`` pass per pattern (patterns are a small
    driver-held list by contract; rows never leave Arrow), collapsing
    to a patterns-sized (pattern, n_docs, n_occurrences) partial; the
    only exchange is the patterns-sized final sum."""
    from ray.data.aggregate import Sum

    pats = list(patterns)

    def partial(t: pa.Table) -> pa.Table:
        txt = t[text_col].combine_chunks()
        names, docs, occs = [], [], []
        for p in pats:
            c = pc.count_substring(txt, pattern=p)
            cn = c.to_numpy(zero_copy_only=False)
            names.append(p)
            docs.append(int((cn > 0).sum()))
            occs.append(int(cn.sum()))
        return pa.table({
            "pattern": pa.array(names),
            "n_docs": pa.array(np.asarray(docs, np.int64)),
            "n_occurrences": pa.array(np.asarray(occs, np.int64))})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("pattern").aggregate(
                Sum("n_docs", alias_name="n_docs"),
                Sum("n_occurrences", alias_name="n_occurrences")))
