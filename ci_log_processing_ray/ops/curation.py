"""Training-data curation operators: chunking, train/eval
decontamination, vocabulary coverage, normalization, and PII-style
redaction.

All text kernels share one vectorized word pipeline: Arrow lower +
regex split, flatten, drop empties, and rebuild per-doc offsets with
numpy -- no per-row Python in any hot stage.  N-gram / chunk assembly
uses the gather-index trick (repeat + cumsum-reset arange) so even the
overlapping-window reassembly is one ``take`` + one ``binary_join``.

Shuffle structure at 100 TB:

* chunk_text      -- pure map (no shuffle); output rows ~ tokens/stride.
* decontaminate   -- the eval/benchmark side is SMALL by definition; its
                     distinct grams broadcast once (``ray.put``), and the
                     train-side scan is embarrassingly parallel.
* vocab_coverage  -- pass 1 is the vocabulary-sized wordcount shuffle,
                     pass 2 broadcasts the top-V vocab and aggregates
                     (source, n_tokens, n_oov) partials per batch.
* normalize/redact -- pure maps.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

_WORD_SPLIT = r"[^a-z0-9_]+"


def _word_stream(texts: pa.Array) -> tuple[pa.Array, np.ndarray]:
    """Lower + split every text; return (flat_words, per_doc_counts)
    with empty tokens removed -- all Arrow/numpy, no Python rows."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    wl = pc.split_pattern_regex(
        pc.utf8_lower(pc.fill_null(texts, "")), pattern=_WORD_SPLIT)
    raw_counts = np.diff(wl.offsets.to_numpy())
    flat = wl.flatten()
    keep = pc.not_equal(flat, "")
    keep_np = keep.to_numpy(zero_copy_only=False)
    # per-doc valid-word counts: cumsum of the keep mask, diffed at the
    # original list offsets
    cv = np.concatenate([[0], np.cumsum(keep_np)])
    offs = np.concatenate([[0], np.cumsum(raw_counts)])
    n_words = (cv[offs[1:]] - cv[offs[:-1]]).astype(np.int64)
    return flat.filter(keep), n_words


def _gather_windows(
    n_words: np.ndarray, win: int, stride: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Index plan for overlapping word windows.

    Returns (doc_idx, win_idx, win_len, gather) where ``gather`` indexes
    the flattened word stream and the windows of doc d start at word
    offsets 0, stride, 2*stride, ... (the last window may be short;
    docs with 0 words yield no windows)."""
    n_wins = np.where(
        n_words == 0, 0,
        np.where(n_words <= win, 1, (n_words - win + stride - 1) // stride + 1)
    ).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(n_words), dtype=np.int64), n_wins)
    tot = int(n_wins.sum())
    win_starts = np.concatenate([[0], np.cumsum(n_wins)])
    win_idx = np.arange(tot, dtype=np.int64) - np.repeat(
        win_starts[:-1], n_wins)
    doc_offs = np.concatenate([[0], np.cumsum(n_words)])
    word_start = doc_offs[doc_idx] + win_idx * stride
    win_len = np.minimum(win, n_words[doc_idx] - win_idx * stride)
    tot_words = int(win_len.sum())
    out_offs = np.concatenate([[0], np.cumsum(win_len)])
    gather = (np.arange(tot_words, dtype=np.int64)
              - np.repeat(out_offs[:-1], win_len)
              + np.repeat(word_start, win_len))
    return doc_idx, win_idx, win_len, gather


def _doc_ngrams(
    texts: pa.Array, ids: np.ndarray, n: int
) -> pd.DataFrame:
    """DISTINCT (id, gram) pairs per document, vectorized: sliding
    windows are gathered from the flat word stream, joined with
    ``binary_join``, and deduped with one C-level drop_duplicates."""
    flat, n_words = _word_stream(texts)
    # sliding n-grams == windows of size n with stride 1, minus the
    # short trailing windows
    doc_idx, win_idx, win_len, gather = _gather_windows(n_words, n, 1)
    full = win_len == n
    if not full.any():
        return pd.DataFrame({"id": np.array([], np.int64),
                             "gram": np.array([], object)})
    # rebuild the gather plan restricted to full windows
    keep_words = np.repeat(full, win_len)
    gather = gather[keep_words]
    doc_idx = doc_idx[full]
    k = int(full.sum())
    offs = np.arange(0, (k + 1) * n, n, dtype=np.int32)
    lists = pa.ListArray.from_arrays(pa.array(offs), flat.take(
        pa.array(gather)))
    grams = pc.binary_join(lists, " ").to_numpy(zero_copy_only=False)
    return (pd.DataFrame({"id": ids[doc_idx], "gram": grams})
            .drop_duplicates())


def chunk_text(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    chunk_size: int = 50,
    stride: int = 40,
) -> ray.data.Dataset:
    """Split each document into overlapping fixed-size word windows (the
    RAG / context-window chunking primitive).  Output: id, chunk_idx
    (0-based), n_words, chunk_text.  Pure map -- no shuffle; chunk
    reassembly is one take + binary_join per batch."""

    def kern(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        flat, n_words = _word_stream(t[text_col])
        doc_idx, win_idx, win_len, gather = _gather_windows(
            n_words, chunk_size, stride)
        offs = np.concatenate([[0], np.cumsum(win_len)]).astype(np.int64)
        lists = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()), flat.take(pa.array(gather)))
        return pa.table({
            id_col: pa.array(ids[doc_idx]),
            "chunk_idx": pa.array(win_idx),
            "n_words": pa.array(win_len.astype(np.int64)),
            "chunk_text": pc.binary_join(lists, " "),
        })

    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)


def decontaminate(
    ds: ray.data.Dataset,
    eval_ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    n: int = 5,
) -> ray.data.Dataset:
    """Train/eval contamination check (the benchmark-decontamination
    step of an LLM data pipeline): for every training document, count
    its DISTINCT word ``n``-grams that also occur in the evaluation set;
    emit (id, n_hits) for contaminated docs only (n_hits >= 1).

    The eval side is small by definition (a benchmark), so its distinct
    grams are collected once and broadcast via ``ray.put``; the train
    scan is a pure map with one vectorized ``is_in`` per batch.  At
    100 TB the train side streams; only eval grams are materialized.
    """

    def eval_grams(t: pa.Table) -> pa.Table:
        d = _doc_ngrams(t[text_col], t[id_col].combine_chunks().to_numpy(
            zero_copy_only=False), n)
        return pa.table({"gram": pa.array(
            d["gram"].drop_duplicates().to_numpy(), type=pa.string())})

    grams = (eval_ds.map_batches(eval_grams, batch_format="pyarrow",
                                 zero_copy_batch=True)
             .unique("gram"))
    gram_ref = ray.put(pa.array(sorted(grams), type=pa.string()))

    def count_hits(t: pa.Table) -> pa.Table:
        d = _doc_ngrams(t[text_col], t[id_col].combine_chunks().to_numpy(
            zero_copy_only=False), n)
        if len(d) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64())})
        hit = pc.is_in(pa.array(d["gram"].to_numpy(), type=pa.string()),
                       value_set=ray.get(gram_ref))
        d = d[hit.to_numpy(zero_copy_only=False)]
        agg = d.groupby("id", sort=False).size()
        return pa.table({id_col: pa.array(agg.index.to_numpy()),
                         "n_hits": pa.array(agg.to_numpy().astype(np.int64))})

    # each doc is one row, so per-batch counts are final -- no shuffle
    return ds.map_batches(count_hits, batch_format="pyarrow",
                          zero_copy_batch=True)


def vocab_coverage(
    ds: ray.data.Dataset,
    text_col: str,
    group_col: str,
    *,
    vocab_size: int = 8,
) -> ray.data.Dataset:
    """Vocabulary build + out-of-vocabulary rate: pass 1 computes the
    top-``vocab_size`` words by corpus frequency (count desc, word asc
    tie-break -- the wordcount shuffle carries (word, count) partials);
    pass 2 broadcasts the vocab and aggregates per-group token and OOV
    counts.  Output: group, n_tokens, n_oov (all int64)."""
    from ci_log_processing_ray.ops.textstats import word_topk

    top = word_topk(ds, text_col, vocab_size).to_pandas()
    vocab_ref = ray.put(pa.array(top["word"].to_numpy(), type=pa.string()))

    def partial(t: pa.Table) -> pa.Table:
        groups = t[group_col].combine_chunks()
        flat, n_words = _word_stream(t[text_col])
        oov = pc.invert(pc.is_in(flat, value_set=ray.get(vocab_ref)))
        oov_np = oov.to_numpy(zero_copy_only=False).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(n_words)])
        cv = np.concatenate([[0], np.cumsum(oov_np)])
        n_oov_doc = cv[offs[1:]] - cv[offs[:-1]]
        tt = pa.table({group_col: groups,
                       "n_tokens": pa.array(n_words),
                       "n_oov": pa.array(n_oov_doc.astype(np.int64))})
        g = tt.group_by(group_col).aggregate(
            [("n_tokens", "sum"), ("n_oov", "sum")])
        return pa.table({group_col: g[group_col],
                         "n_tokens": g["n_tokens_sum"],
                         "n_oov": g["n_oov_sum"]})

    return (ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby(group_col).aggregate(
                Sum("n_tokens", alias_name="n_tokens"),
                Sum("n_oov", alias_name="n_oov")))


def strip_stopwords(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    stopwords: tuple[str, ...],
) -> ray.data.Dataset:
    """Normalization map: lowercase, tokenize, drop stopwords, re-join
    single-spaced.  Output: id, norm_text, n_kept, n_dropped.  Pure map;
    the filter + reassembly is one mask + take + binary_join."""
    stop = pa.array(sorted(stopwords), type=pa.string())

    def kern(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks()
        flat, n_words = _word_stream(t[text_col])
        keep = pc.invert(pc.is_in(flat, value_set=stop))
        keep_np = keep.to_numpy(zero_copy_only=False)
        offs = np.concatenate([[0], np.cumsum(n_words)])
        cv = np.concatenate([[0], np.cumsum(keep_np)])
        n_kept = (cv[offs[1:]] - cv[offs[:-1]]).astype(np.int64)
        kept = flat.filter(keep)
        out_offs = np.concatenate([[0], np.cumsum(n_kept)])
        lists = pa.ListArray.from_arrays(
            pa.array(out_offs, type=pa.int32()), kept)
        return pa.table({
            id_col: ids,
            "norm_text": pc.binary_join(lists, " "),
            "n_kept": pa.array(n_kept),
            "n_dropped": pa.array(n_words - n_kept),
        })

    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)


# RE2 syntax on BOTH engines (pyarrow and DuckDB): keep these literal in
# the SQL oracle so the semantics stay engine-identical.
REDACT_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("number", r"\d{4,}", "<NUM>"),
)


def redact_text(
    ds: ray.data.Dataset, text_col: str, id_col: str
) -> ray.data.Dataset:
    """PII-style scrubbing: replace emails, IPv4 addresses, and long
    digit runs with placeholder tokens, in rule order (email first so
    its digits are not half-eaten by the number rule).  Output: id,
    red_text, n_redacted (total matches across rules).  Pure map, RE2
    kernels only."""

    def kern(t: pa.Table) -> pa.Table:
        txt = pc.fill_null(t[text_col].combine_chunks(), "")
        total = np.zeros(len(txt), dtype=np.int64)
        for _name, pat, repl in REDACT_RULES:
            total += pc.count_substring_regex(
                txt, pattern=pat).to_numpy(zero_copy_only=False)
            txt = pc.replace_substring_regex(
                txt, pattern=pat, replacement=repl)
        return pa.table({
            id_col: t[id_col],
            "red_text": txt,
            "n_redacted": pa.array(total),
        })

    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)


def tokenize_to_ids(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """Tokenizer encode step: map every word to its vocabulary id
    (rank by corpus frequency, count desc then word asc -- the
    frequency-sorted vocab every tokenizer ships) and emit per-doc
    (token_id, count) rows.

    Pass 1 is the vocabulary-sized wordcount shuffle; the ranked vocab
    broadcasts once (``ray.put`` -- vocabularies are model-sized, not
    corpus-sized); pass 2 is a pure map.  Output: id, tid, n (int64).
    """
    from ray.data.aggregate import Sum as _Sum

    def wc_partial(t: pa.Table) -> pa.Table:
        flat, _ = _word_stream(t[text_col])
        vc = flat.value_counts()
        return pa.table({"word": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    counts = (ds.map_batches(wc_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .groupby("word").aggregate(_Sum("n", alias_name="n"))
              .to_pandas())
    counts = counts.sort_values(["n", "word"], ascending=[False, True],
                                kind="mergesort").reset_index(drop=True)
    vocab_ref = ray.put(dict(zip(counts["word"],
                                 np.arange(len(counts), dtype=np.int64))))

    def encode(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        flat, n_words = _word_stream(t[text_col])
        doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), n_words)
        vocab = ray.get(vocab_ref)
        d = pd.DataFrame({"doc": ids[doc_idx],
                          "word": flat.to_numpy(zero_copy_only=False)})
        d["tid"] = d["word"].map(vocab).astype(np.int64)
        agg = d.groupby(["doc", "tid"], sort=False).size().reset_index(
            name="n")
        return pa.table({id_col: pa.array(agg["doc"].to_numpy()),
                         "tid": pa.array(agg["tid"].to_numpy()),
                         "n": pa.array(agg["n"].to_numpy().astype(np.int64))})

    return ds.map_batches(encode, batch_format="pyarrow",
                          zero_copy_batch=True)


def cap_per_group(
    ds: ray.data.Dataset,
    group_col: str,
    id_col: str,
    cap: int,
) -> ray.data.Dataset:
    """Deterministic per-group quota (the data-mixing primitive: cap
    each source's contribution): keep at most ``cap`` rows per group,
    chosen by md5-hash order of the id -- a stable pseudo-random pick,
    not "first N by position", which would bias toward early files.

    Mergeable: each batch keeps its local top-``cap`` per group BEFORE
    the shuffle, so the exchange carries at most groups x cap rows per
    block regardless of input size."""
    from ci_log_processing_ray.ops.shuffle import _md5_keys
    from ci_log_processing_ray.ops.window import bucketed_groups

    def add_key(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        keys = _md5_keys(ids, "")  # the epoch-shuffle key, same contract
        return t.append_column("_mk", pa.array(keys, type=pa.string()))

    def local_cap(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, "_mk", id_col], kind="mergesort")
        return g.groupby(group_col, sort=False).head(cap)

    partials = (ds.map_batches(add_key, batch_format="pyarrow",
                               zero_copy_batch=True)
                .map_batches(lambda t: pa.Table.from_pandas(
                    local_cap(t.to_pandas()), preserve_index=False),
                    batch_format="pyarrow"))
    capped = bucketed_groups(partials, group_col, local_cap)
    return capped.drop_columns(["_mk"])


def temperature_mix(
    ds: ray.data.Dataset,
    group_col: str,
    id_col: str,
    *,
    quota_fn=None,
) -> ray.data.Dataset:
    """Temperature-weighted source mixing: per-source quota =
    floor(sqrt(n_source)) rows (the alpha = 0.5 / tau = 2 multilingual
    sampling rule -- big sources are downsampled sub-linearly so small
    sources keep proportionally more mass), rows chosen in md5(id)
    order (stable pseudo-random, same contract as
    :func:`cap_per_group`).  ``quota_fn`` overrides the quota rule
    (``n_rows -> quota``; must be deterministic integer math for the
    oracle to stay binding).

    Scale shape: pass 1 computes per-source counts from per-block
    partials (one vocabulary-sized exchange) and broadcasts the quota
    map; pass 2 is the mergeable cap -- each block keeps its local
    md5-bottom ``quota`` per source BEFORE the exchange, so at most
    sources x quota rows per block ship, then one coarse bucketed
    exchange finishes the exact global pick.  Output: (id, group)."""
    import math

    from ci_log_processing_ray.ops.shuffle import _md5_keys
    from ci_log_processing_ray.ops.window import bucketed_groups

    if quota_fn is None:
        quota_fn = math.isqrt

    def count_partial(t: pa.Table) -> pa.Table:
        u, c = np.unique(t[group_col].combine_chunks().to_numpy(
            zero_copy_only=False), return_counts=True)
        return pa.table({group_col: pa.array(u),
                         "_n": pa.array(c.astype(np.int64))})

    counts = (ds.map_batches(count_partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .to_pandas()
              .groupby(group_col, as_index=False)["_n"].sum())
    quota = {g: int(quota_fn(int(n)))
             for g, n in zip(counts[group_col], counts["_n"])}
    quota_ref = ray.put(quota)

    def local_cap(g: pd.DataFrame) -> pd.DataFrame:
        q = ray.get(quota_ref)
        g = g.sort_values([group_col, "_mk", id_col], kind="mergesort")
        rank = g.groupby(group_col, sort=False).cumcount().to_numpy()
        lim = g[group_col].map(q).fillna(0).to_numpy(np.int64)
        return g[rank < lim]

    def add_key(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        return t.append_column(
            "_mk", pa.array(_md5_keys(ids, ""), type=pa.string()))

    partials = (ds.select_columns([id_col, group_col])
                .map_batches(add_key, batch_format="pyarrow",
                             zero_copy_batch=True)
                .map_batches(lambda t: pa.Table.from_pandas(
                    local_cap(t.to_pandas()), preserve_index=False),
                    batch_format="pyarrow"))
    return bucketed_groups(partials, group_col,
                           local_cap).drop_columns(["_mk"])


def rate_sample_by_group(
    ds: ray.data.Dataset,
    group_col: str,
    id_col: str,
    limits: dict[str, str],
    default_limit: str,
) -> ray.data.Dataset:
    """Per-group RATE sampling (the mixture-weights primitive: sample
    each source at its own rate): keep a row iff the first hex digit of
    md5(id) is lexicographically below the group's limit -- limit '4'
    = 25%, '8' = 50%, '2' = 12.5%.  Deterministic and reproducible on
    any engine computing the same md5; complements ``cap_per_group``
    (hard counts) with proportional rates.  Pure map, no shuffle."""
    from ci_log_processing_ray.ops.shuffle import _md5_keys

    def kern(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        first = pd.Series(_md5_keys(ids, "")).str[0]
        lim = (pd.Series(t[group_col].combine_chunks()
                         .to_numpy(zero_copy_only=False))
               .map(limits).fillna(default_limit))
        return t.filter(pa.array((first < lim).to_numpy()))

    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)


def bottomk_by_hash(
    ds: ray.data.Dataset,
    key_col: str,
    k: int,
    *,
    salt: str = "",
) -> ray.data.Dataset:
    """EXACT-k deterministic uniform sample: the k rows with the
    lexicographically smallest ``md5(salt + str(key))`` (tie-broken by
    the key), i.e. SQL ``ORDER BY md5(key), key LIMIT k`` -- the
    reproducible fixed-size cousin of threshold hash sampling.

    Scale shape: each batch keeps only its LOCAL bottom-k, so at most
    k rows per block reach the final exchange; the closing sort+limit
    runs over blocks x k candidate rows, never the dataset.  Per-row
    md5 is C-speed (the same acceptance as fingerprinting)."""
    import hashlib

    def local_bottomk(t: pa.Table) -> pa.Table:
        digs = np.array(
            [hashlib.md5((salt + str(v)).encode()).hexdigest()
             for v in t[key_col].to_pylist()], dtype=object)
        order = np.argsort(digs, kind="stable")[:k]
        kept = t.take(pa.array(order))
        return kept.append_column("_h", pa.array(digs[order].tolist(),
                                                 type=pa.string()))

    cand = ds.map_batches(local_bottomk, batch_format="pyarrow",
                          zero_copy_batch=True)
    return cand.sort(["_h", key_col]).limit(k).drop_columns(["_h"])


def weighted_bottomk(
    ds: ray.data.Dataset,
    key_col: str,
    weight_col: str,
    k: int,
    *,
    salt: str = "",
) -> ray.data.Dataset:
    """EXACT-k deterministic weight-biased sample: keep the k rows with
    the smallest integer priority ``md5_60bit(salt + str(key)) // w``
    (tie-broken by key) -- a Cohen-Kaplan bottom-k sketch with rank
    h/w, done in pure int64 so both engines agree bit-for-bit
    (SQL: ``('0x' || substr(md5(key),1,15))::BIGINT // w``).  Larger
    integer weights shrink the priority, so selection probability grows
    ~proportionally with weight for k << n; reruns and repartitions
    return the identical sample.

    Scale shape is the same as :func:`bottomk_by_hash`: each batch
    keeps its LOCAL bottom-k, so at most k rows per block reach the
    closing sort+limit.  Weights must be int >= 1 (caller clamps)."""
    import hashlib

    def local_bottomk(t: pa.Table) -> pa.Table:
        h = np.fromiter(
            (int(hashlib.md5((salt + str(v)).encode()).hexdigest()[:15], 16)
             for v in t[key_col].to_pylist()),
            dtype=np.int64, count=len(t))
        w = t[weight_col].to_numpy().astype(np.int64)
        if len(w) and w.min() < 1:
            raise ValueError("weights must be >= 1")
        rank = h // w
        order = np.lexsort((t[key_col].to_numpy(), rank))[:k]
        kept = t.take(pa.array(order))
        return kept.append_column(
            "priority", pa.array(rank[order], type=pa.int64()))

    cand = ds.map_batches(local_bottomk, batch_format="pyarrow",
                          zero_copy_batch=True)
    return cand.sort(["priority", key_col]).limit(k)


def edit1_pairs(
    ds: ray.data.Dataset,
    col: str,
    *,
    min_len: int = 3,
    max_len: int = 40,
) -> ray.data.Dataset:
    """All distinct string pairs at edit distance exactly 1 (the
    spelling-variant / near-key detector) via the SymSpell
    deletion-neighborhood trick: two strings with d(a,b) <= 1 always
    share a 0-or-1-deletion variant, so variants block the candidate
    space and an exact per-pair check removes the d=2 false positives.

    Scale shape: the corpus collapses to DISTINCT values first (the
    only corpus-sized exchange, carrying the value column alone), then
    each distinct string of length L explodes to L+1 variants -- work
    is O(vocab x len), independent of corpus row count.  Variant
    groups are tiny in natural data; the per-pair verify runs inside
    ``map_groups`` on candidates only.  A final pair-key groupby
    dedups pairs that share several variants.

    Output: ``a, b`` (a < b), each pair once."""

    def distinct_partial(t: pa.Table) -> pa.Table:
        v = pc.unique(t[col].combine_chunks())
        n = pc.binary_length(v)
        v = v.filter(pc.and_(pc.greater_equal(n, min_len),
                             pc.less_equal(n, max_len)))
        return pa.table({col: v})

    from .window import bucketed_distinct as _bdistinct

    vocab = _bdistinct(
        ds.map_batches(distinct_partial, batch_format="pyarrow",
                       zero_copy_batch=True), [col])

    def variants(t: pa.Table) -> pa.Table:
        vs, ws = [], []
        for w in t[col].to_pylist():
            vs.append(w)
            ws.append(w)
            for i in range(len(w)):
                vs.append(w[:i] + w[i + 1:])
                ws.append(w)
        return pa.table({"_v": pa.array(vs, pa.string()),
                         "_w": pa.array(ws, pa.string())})

    def _is_edit1(a: str, b: str) -> bool:
        la, lb = len(a), len(b)
        if la == lb:
            return sum(x != y for x, y in zip(a, b)) == 1
        if la > lb:
            a, b, la, lb = b, a, lb, la
        # lb == la + 1: b with one deletion equals a
        i = 0
        while i < la and a[i] == b[i]:
            i += 1
        return a[i:] == b[i + 1:]

    # variant cardinality is vocab x word-length (corpus-shaped), so
    # route variants through the coarse-bucket kernels -- per-distinct-
    # variant map_groups dispatch and the native pair-key groupby both
    # pay per-group costs there (ops/window.py:bucketed_sum rationale)
    def pair_up(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby("_v", sort=False):
            ws = sorted(set(grp["_w"]))
            for i in range(len(ws)):
                for j in range(i + 1, len(ws)):
                    if _is_edit1(ws[i], ws[j]):
                        out_a.append(ws[i])
                        out_b.append(ws[j])
        return pd.DataFrame({"a": out_a, "b": out_b})

    from .window import bucketed_distinct, bucketed_groups

    cand = bucketed_groups(
        vocab.map_batches(variants, batch_format="pyarrow"),
        "_v", pair_up)
    return bucketed_distinct(cand, ["a", "b"])


def _seg_layout(length: int, k: int) -> list[tuple[int, int]]:
    """PassJoin even partition of a length-``length`` string into
    ``k + 1`` segments: the first segments get ``length // (k+1)``
    bytes, the last ``length % (k+1)`` segments one extra.  Returns
    [(start, seg_len), ...] -- deterministic, shared by the index and
    probe sides so signatures align."""
    k1 = k + 1
    base, rem = divmod(length, k1)
    out = []
    p = 0
    for i in range(k1):
        ln = base + (1 if i >= k1 - rem else 0)
        out.append((p, ln))
        p += ln
    return out


def _pad_byte_matrix(strs: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(P, Lmax) zero-padded uint8 matrix + int64 lengths straight from
    the Arrow binary buffers -- one repeat/arange scatter, no per-string
    Python."""
    if isinstance(strs, pa.ChunkedArray):
        strs = strs.combine_chunks()
    b = strs.cast(pa.binary())
    offs = np.frombuffer(b.buffers()[1], np.int32)[
        b.offset: b.offset + len(b) + 1].astype(np.int64)
    data = np.frombuffer(b.buffers()[2], np.uint8)
    lens = np.diff(offs)
    n = len(lens)
    lmax = int(lens.max()) if n else 0
    mat = np.zeros((n, max(lmax, 1)), np.uint8)
    if n and offs[-1] > offs[0]:
        seg = data[offs[0]:offs[-1]]
        rel = (np.arange(len(seg), dtype=np.int64)
               - np.repeat(offs[:-1] - offs[0], lens))
        mat[np.repeat(np.arange(n), lens), rel] = seg
    return mat, lens


def _banded_levenshtein(
    a: pa.Array, b: pa.Array, k: int
) -> np.ndarray:
    """Exact byte-level Levenshtein distance capped at ``k + 1``,
    vectorized ACROSS pairs: a (2k+1)-wide Ukkonen band advances one
    text row per Python step, each step a handful of numpy ops over
    every pair at once -- O(Lmax * (2k+1)) vector steps total, never a
    per-pair loop.  Pairs with ``|len(a) - len(b)| > k`` report
    ``k + 1`` (any true distance > k collapses to k + 1)."""
    A, la = _pad_byte_matrix(a)
    B, lb = _pad_byte_matrix(b)
    npairs = len(la)
    cap = np.int16(k + 1)
    w = 2 * k + 1
    res = np.full(npairs, cap, np.int16)
    if npairs == 0:
        return res.astype(np.int64)
    # row 0: D[0][j] = j at band offset d = j + k
    cur = np.full((npairs, w), cap, np.int16)
    for d in range(k, w):
        j = d - k
        cur[:, d] = np.where(j <= lb, min(j, k + 1), cap)
    fin0 = la == 0
    if fin0.any():
        res[fin0] = np.minimum(lb, k + 1)[fin0]
    dfin = lb - la + k
    oob = (dfin < 0) | (dfin >= w)
    dfin = np.clip(dfin, 0, w - 1)
    for i in range(1, int(la.max()) + 1):
        prev = cur
        cur = np.full((npairs, w), cap, np.int16)
        ai = A[:, i - 1]
        for d in range(w):
            j = i + d - k
            if j < 0:
                continue
            if j == 0:
                cur[:, d] = min(i, k + 1)
                continue
            if j - 1 < B.shape[1]:
                best = prev[:, d] + (ai != B[:, j - 1])
            else:
                best = np.full(npairs, cap, np.int16)
            if d + 1 < w:
                np.minimum(best, prev[:, d + 1] + 1, out=best)
            if d >= 1:
                np.minimum(best, cur[:, d - 1] + 1, out=best)
            np.minimum(best, cap, out=best)
            best[j > lb] = cap
            cur[:, d] = best
        fin = la == i
        if fin.any():
            res[fin] = cur[fin, dfin[fin]]
    res[oob] = cap
    return res.astype(np.int64)


def edit_distance_pairs(
    ds: ray.data.Dataset,
    col: str,
    *,
    k: int = 2,
    min_len: int = 3,
    max_len: int = 40,
) -> ray.data.Dataset:
    """All distinct string pairs at edit distance <= ``k`` (general-k
    fuzzy-key detection; :func:`edit1_pairs` is the k=1 special case
    with a different blocker).  Uses PassJoin partition signatures
    (Li/Deng/Feng, VLDB 2011 -- public algorithm): every string splits
    into ``k + 1`` segments, and if d(r, s) <= k then by pigeonhole
    some segment of the LONGER string appears verbatim in the shorter
    one within a +-k position window, so (segment, slot, target_len)
    keys block the candidate space.

    Scale shape: the corpus collapses to DISTINCT values first (the
    only corpus-sized exchange); each distinct string emits
    O(k^2 * (2k+1)) signatures (45 at k=2) -- vocabulary-shaped, built
    with per-length Arrow slices, no per-string Python.  Candidates
    pair via a hash-bucketed merge inside ``bucketed_groups``; the
    exact verify is the across-pairs banded DP, never a per-pair loop.

    Output: ``a, b, dist`` (a < b lexicographically, byte-level
    distance, each pair once).  Distances are byte-wise -- identical
    to character distance for ASCII keys like the part/name columns
    this targets.

    Blocking contract (measured, scale_proof.py passjoin): candidate
    volume per signature bucket is O(|bucket|^2), so LOW-ENTROPY
    SEGMENTS (keys sharing long constant prefixes) degenerate the
    pigeonhole blocking -- 676 distinct first segments over 300k keys
    measured ~200k-row merges per bucket.  Real key columns carry
    entropy in every segment; for prefix-heavy domains strip the
    shared prefix upstream or raise k's segment count."""
    if min_len <= k:
        raise ValueError("min_len must exceed k so every segment is "
                         "non-empty")

    def distinct_partial(t: pa.Table) -> pa.Table:
        v = pc.unique(pc.drop_null(t[col].combine_chunks()))
        n = pc.binary_length(v)
        v = v.filter(pc.and_(pc.greater_equal(n, min_len),
                             pc.less_equal(n, max_len)))
        return pa.table({col: v})

    from .window import bucketed_distinct, bucketed_groups

    vocab = bucketed_distinct(
        ds.map_batches(distinct_partial, batch_format="pyarrow",
                       zero_copy_batch=True), [col])

    sep = "\x1f"

    def signatures(t: pa.Table) -> pa.Table:
        w = t[col].combine_chunks()
        lens = pc.binary_length(w).to_numpy(zero_copy_only=False)
        keys, words, roles = [], [], []

        def emit(sub: pa.Array, tok: pa.Array, slot: int, m: int,
                 role: int) -> None:
            tag = f"{sep}{slot}{sep}{m}"
            keys.append(pc.binary_join_element_wise(tok, tag, ""))
            words.append(sub)
            roles.append(np.full(len(sub), role, np.int8))

        for length in np.unique(lens):
            length = int(length)
            sub = w.filter(pa.array(lens == length))
            # index side: own segments
            for slot, (p, ln) in enumerate(_seg_layout(length, k)):
                emit(sub, pc.utf8_slice_codeunits(sub, p, p + ln),
                     slot, length, 1)
            # probe side: substrings matching the segment layout of
            # every candidate longer-or-equal length
            for m in range(length, length + k + 1):
                for slot, (p, ln) in enumerate(_seg_layout(m, k)):
                    lo = max(0, p - k)
                    hi = min(length - ln, p + k)
                    for start in range(lo, hi + 1):
                        emit(sub, pc.utf8_slice_codeunits(
                            sub, start, start + ln), slot, m, 0)
        if not keys:
            return pa.table({"_sig": pa.array([], pa.string()),
                             "_w": pa.array([], pa.string()),
                             "_r": pa.array([], pa.int8())})
        return pa.table({
            "_sig": pa.concat_arrays([x.combine_chunks()
                                      if isinstance(x, pa.ChunkedArray)
                                      else x for x in keys]),
            "_w": pa.concat_arrays([x.combine_chunks()
                                    if isinstance(x, pa.ChunkedArray)
                                    else x for x in words]),
            "_r": pa.array(np.concatenate(roles))})

    def pair_up(g: pd.DataFrame) -> pd.DataFrame:
        probe = g[g["_r"] == 0][["_sig", "_w"]]
        index = g[g["_r"] == 1][["_sig", "_w"]]
        m = probe.merge(index, on="_sig", suffixes=("_p", "_i"))
        m = m[m["_w_p"] != m["_w_i"]]
        if not len(m):
            return pd.DataFrame({"a": pd.Series([], dtype=str),
                                 "b": pd.Series([], dtype=str)})
        lo = np.minimum(m["_w_p"].to_numpy(), m["_w_i"].to_numpy())
        hi = np.maximum(m["_w_p"].to_numpy(), m["_w_i"].to_numpy())
        return pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()

    cand = bucketed_distinct(
        bucketed_groups(
            vocab.map_batches(signatures, batch_format="pyarrow"),
            "_sig", pair_up),
        ["a", "b"])

    def verify(t: pa.Table) -> pa.Table:
        if not t.num_rows:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string()),
                             "dist": pa.array([], pa.int64())})
        dist = _banded_levenshtein(t["a"].combine_chunks(),
                                   t["b"].combine_chunks(), k)
        keep = dist <= k
        out = t.filter(pa.array(keep))
        return out.append_column("dist", pa.array(dist[keep]))

    return cand.map_batches(verify, batch_format="pyarrow",
                            zero_copy_batch=True)


def bpe_train(
    ds: ray.data.Dataset,
    text_col: str,
    *,
    n_merges: int,
    driver_vocab_cap: int = 200_000,
) -> pa.Table:
    """Byte-pair-encoding merge training (Sennrich et al. 2016): learn
    ``n_merges`` merge rules from corpus word frequencies.  Returns the
    merge table (rank, left, right, pair_count) -- the artifact a
    tokenizer ships.

    Scale shape: the corpus collapses ONCE to the (word, count)
    vocabulary table (the only corpus-sized exchange, standard
    wordcount partials); every training round then runs over that
    vocabulary-shaped Dataset -- per-block weighted pair-count
    partials, a pair-vocabulary groupby, a driver argmax (ties:
    lexicographic), and a broadcast merge applied in a map.  Rounds
    cost O(vocab), never O(corpus); the driver sees only per-round
    pair tables.

    Vocabularies at or under ``driver_vocab_cap`` run the SAME merge
    loop in-process after the (corpus-sized) distributed wordcount --
    at toy vocabularies the per-round exchange fixed costs dwarf the
    pair counting (parity pinned by
    tests/test_ops.py::test_bpe_driver_distributed_parity; real BPE
    vocabularies are 10k-1M words, comfortably driver-sized -- the
    distributed rounds are the headroom path)."""
    from ray.data.aggregate import Sum

    def wc_partial(t: pa.Table) -> pa.Table:
        flat, _ = _word_stream(t[text_col])
        vc = flat.value_counts()
        return pa.table({"word": vc.field("values"),
                         "n": pc.cast(vc.field("counts"), pa.int64())})

    vocab = (ds.map_batches(wc_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("word").aggregate(Sum("n", alias_name="n"))
             .materialize())

    if vocab.count() <= driver_vocab_cap:
        vdf = vocab.to_pandas()
        wc = dict(zip(vdf["word"], vdf["n"].astype(int)))
        syms = {w: tuple(w) for w in wc}
        merges = []
        for rank in range(n_merges):
            counts: dict = {}
            for w, n in wc.items():
                s = syms[w]
                for a, b in zip(s, s[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + n
            if not counts:
                break
            (left, right), cnt = min(
                counts.items(), key=lambda kv: (-kv[1], kv[0][0],
                                                kv[0][1]))
            merges.append((rank, left, right, int(cnt)))
            for w in wc:
                s, i, m = syms[w], 0, []
                while i < len(s):
                    if (i + 1 < len(s) and s[i] == left
                            and s[i + 1] == right):
                        m.append(left + right)
                        i += 2
                    else:
                        m.append(s[i])
                        i += 1
                syms[w] = tuple(m)
        return pa.table({
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "pair_count": pa.array([m[3] for m in merges],
                                   pa.int64())})

    def to_syms(t: pa.Table) -> pa.Table:
        words = t["word"].to_pylist()
        return pa.table({
            "syms": pa.array([list(w) for w in words],
                             pa.list_(pa.string())),
            "n": t["n"]})

    table = vocab.map_batches(to_syms, batch_format="pyarrow")
    merges = []
    for rank in range(n_merges):
        def pair_partial(t: pa.Table) -> pa.Table:
            counts: dict = {}
            ns = t["n"].to_pylist()
            for syms, n in zip(t["syms"].to_pylist(), ns):
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + n
            if not counts:
                return pa.table({"l": pa.array([], pa.string()),
                                 "r": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            ls, rs = zip(*counts)
            return pa.table({"l": pa.array(ls), "r": pa.array(rs),
                             "n": pa.array(list(counts.values()),
                                           pa.int64())})

        pairs = (table.map_batches(pair_partial, batch_format="pyarrow")
                 .groupby(["l", "r"]).aggregate(Sum("n", alias_name="n"))
                 .to_pandas())
        if pairs.empty:
            break
        pairs = pairs.sort_values(["n", "l", "r"],
                                  ascending=[False, True, True],
                                  kind="mergesort")
        best = pairs.iloc[0]
        merges.append((rank, best["l"], best["r"], int(best["n"])))
        pair_ref = ray.put((best["l"], best["r"]))

        def apply_merge(t: pa.Table) -> pa.Table:
            left, right = ray.get(pair_ref)
            out = []
            for syms in t["syms"].to_pylist():
                i, merged = 0, []
                while i < len(syms):
                    if (i + 1 < len(syms) and syms[i] == left
                            and syms[i + 1] == right):
                        merged.append(left + right)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                out.append(merged)
            return pa.table({"syms": pa.array(out, pa.list_(pa.string())),
                             "n": t["n"]})

        table = table.map_batches(apply_merge,
                                  batch_format="pyarrow").materialize()

    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64())})


def kfold_assign(
    ds: ray.data.Dataset,
    id_col: str,
    strata_col: str,
    k: int,
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Stratified k-fold assignment: within each stratum, rows take
    folds round-robin in md5(id) order -- deterministic, reproducible
    on any cluster size, and exactly balanced (fold sizes within a
    stratum differ by at most 1), the cross-validation split
    primitive.  Output: ``id_col, strata_col, fold`` (0-based int64).

    One bucketed shuffle keyed on the stratum; the kernel sorts its
    whole bucket once by (stratum, md5, id) and assigns
    ``rank_in_stratum % k`` via boundary-masked cumcount."""
    import hashlib

    from .window import bucketed_groups

    def add_hash(t: pa.Table) -> pa.Table:
        hx = [hashlib.md5(str(v).encode()).hexdigest()
              for v in t[id_col].to_pylist()]
        return pa.table({id_col: t[id_col], strata_col: t[strata_col],
                         "_h": pa.array(hx, pa.string())})

    def assign(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([strata_col, "_h", id_col], kind="mergesort")
        s = g[strata_col].to_numpy()
        new = np.r_[True, s[1:] != s[:-1]]
        idx = np.arange(len(g), dtype=np.int64)
        base = np.maximum.accumulate(np.where(new, idx, 0))
        g["fold"] = (idx - base) % k
        return g.drop(columns="_h")

    return bucketed_groups(
        ds.map_batches(add_hash, batch_format="pyarrow",
                       zero_copy_batch=True),
        strata_col, assign, n_buckets=n_buckets)


def take_until_budget(
    ds: ray.data.Dataset,
    group_col: str,
    id_col: str,
    size_col: str,
    budget: int,
    *,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Data mixing to a size budget: within each group (source /
    domain), take documents in md5(id) order while the running total
    of ``size_col`` stays within ``budget`` -- the deterministic
    token-budget sampler that builds a pretraining mixture with fixed
    per-source shares on any cluster size.  A document is kept iff the
    cumulative size INCLUDING it is <= budget.

    One bucketed shuffle keyed on the group; the kernel is one sort +
    boundary-reset cumsum over its whole bucket.  Output keeps the
    input columns."""
    import hashlib

    from .window import bucketed_groups

    def add_hash(t: pa.Table) -> pa.Table:
        hx = [hashlib.md5(str(v).encode()).hexdigest()
              for v in t[id_col].to_pylist()]
        return t.append_column("_h", pa.array(hx, pa.string()))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([group_col, "_h", id_col], kind="mergesort")
        s = g[group_col].to_numpy()
        sz = g[size_col].to_numpy(np.int64)
        cs = np.cumsum(sz)
        starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
        seg_lens = np.diff(np.append(starts, len(g)))
        base = np.repeat(np.r_[0, cs[starts[1:] - 1]], seg_lens)
        keep = (cs - base) <= budget
        return g[keep].drop(columns="_h")

    return bucketed_groups(
        ds.map_batches(add_hash, batch_format="pyarrow",
                       zero_copy_batch=True),
        group_col, pick, n_buckets=n_buckets)


def dsir_select(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    group_col: str,
    target_value: str,
    *,
    k: int = 100,
    scale: int = 1_000_000,
) -> ray.data.Dataset:
    """DSIR-style importance selection (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", arXiv:2302.03169):
    rank raw documents by how target-like their token distribution is,
    using hashed/unigram feature importance weights.

    Integer-exact variant so a DuckDB oracle can check it bit-for-bit:
    per word ``w`` the weight is ``scale * (tgt_n + 1) // (raw_n + 1)``
    (a Laplace-smoothed scaled frequency ratio -- the constant corpus
    totals cancel in the ranking, so dividing them out is unnecessary),
    a document scores the sum of its tokens' weights WITH multiplicity,
    and the top ``k`` docs by ``(score DESC, id ASC)`` are returned.

    Scale shape: pass 1 is per-block (word, raw, tgt) count partials
    into ONE vocabulary-sized groupby-sum; the weight table is
    broadcast once via ``ray.put`` (the standard vocabulary-structure
    contract, same as tf-idf's DF table); pass 2 is a pure map (one
    dict lookup + bincount per batch) followed by a per-batch local
    top-k prune, so the final exact sort+limit exchanges at most
    ``k * n_blocks`` rows, never the corpus.

    Output: ``id_col, score`` (both int64), exactly ``k`` rows (fewer
    only if the corpus is smaller).
    """
    def count_partial(t: pa.Table) -> pa.Table:
        flat, n_words = _word_stream(t[text_col])
        is_tgt = pc.equal(t[group_col], target_value).to_numpy(
            zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), n_words)
        d = pd.DataFrame({
            "word": flat.to_numpy(zero_copy_only=False),
            "raw_n": np.ones(len(doc_idx), np.int64),
            "tgt_n": is_tgt[doc_idx].astype(np.int64),
        })
        g = d.groupby("word", sort=False, as_index=False).sum()
        return pa.table({
            "word": pa.array(g["word"].to_numpy(), pa.string()),
            "raw_n": pa.array(g["raw_n"].to_numpy(np.int64)),
            "tgt_n": pa.array(g["tgt_n"].to_numpy(np.int64)),
        })

    vocab = (ds.map_batches(count_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("word")
             .aggregate(Sum("raw_n", alias_name="raw_n"),
                        Sum("tgt_n", alias_name="tgt_n"))
             .to_pandas())
    wt = (np.int64(scale) * (vocab["tgt_n"].to_numpy(np.int64) + 1)
          // (vocab["raw_n"].to_numpy(np.int64) + 1))
    wt_ref = ray.put(dict(zip(vocab["word"], wt)))

    def score(t: pa.Table) -> pa.Table:
        lut = ray.get(wt_ref)
        flat, n_words = _word_stream(t[text_col])
        doc_idx = np.repeat(np.arange(len(t), dtype=np.int64), n_words)
        w = pd.Series(flat.to_numpy(zero_copy_only=False)).map(lut) \
            .to_numpy(np.int64)
        # float64 bincount is exact here: per-doc sums stay far below
        # 2^53 (scale * tokens-per-doc)
        sums = np.bincount(doc_idx, weights=w,
                           minlength=len(t)).astype(np.int64)
        out = pd.DataFrame({
            id_col: t[id_col].combine_chunks().to_numpy(
                zero_copy_only=False),
            "score": sums,
        }).sort_values(["score", id_col], ascending=[False, True],
                       kind="mergesort").head(k)
        return pa.Table.from_pandas(out, preserve_index=False)

    pruned = ds.map_batches(score, batch_format="pyarrow",
                            zero_copy_batch=True)
    return pruned.sort(["score", id_col],
                       descending=[True, False]).limit(k)


def greedy_max_coverage(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    *,
    k: int = 4,
    ngram: int = 3,
    n_buckets: int | None = None,
) -> ray.data.Dataset:
    """Greedy maximum-coverage document selection -- the classic
    submodular data-curation primitive (Nemhauser 1-1/e guarantee):
    pick ``k`` documents, each round taking the one covering the most
    word ``ngram``-grams NOT covered by earlier picks.  Deterministic:
    ties break by smallest doc id; documents with zero uncovered grams
    never win, and selection stops early once nothing is uncovered
    (matching the SQL formulation, which drops empty-gain docs from
    each round's ranking).

    Scale shape: the distinct (doc, gram) pair table builds ONCE from
    the flattened word stream (Arrow ``binary_join_element_wise`` gram
    concat -- no per-row Python), pre-shrunk by an in-block Arrow
    distinct before one hash(doc) bucketed exchange, then materializes.
    Each of the <= k rounds is one broadcast-filtered pass over the
    pair table emitting per-block (doc, partial-count) rows, a
    doc-shaped ``bucketed_sum``, a per-block top-1 partial, and a tiny
    winner-gram fetch.  The covered set grows by at most one document's
    grams per round, so the broadcast stays k * doc_len-sized; no
    stage ships the corpus after the initial build.

    Returns a Dataset of (pick, doc_id, gain) with pick 1-based in
    selection order and gain the exact marginal covered-gram count.
    """
    from ci_log_processing_ray.ops.window import (bucketed_distinct,
                                                  bucketed_sum)

    def pair_partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].combine_chunks().cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        flat, n_words = _word_stream(t[text_col])
        total = len(flat)
        if total < ngram:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "gram": pa.array([], pa.string())})
        doc_idx = np.repeat(np.arange(len(ids)), n_words)
        m = total - (ngram - 1)
        # a gram is valid only when all ngram positions fall in the
        # same document of the flattened stream
        same = doc_idx[:m] == doc_idx[ngram - 1:]
        grams = pc.binary_join_element_wise(
            *[flat.slice(j, m) for j in range(ngram)], " ")
        tbl = pa.table({
            "doc_id": pa.array(ids[doc_idx[:m][same]]),
            "gram": grams.filter(pa.array(same))})
        # in-block distinct pre-shrink (C-speed Arrow hash group-by)
        return tbl.group_by(["doc_id", "gram"]).aggregate([])

    pairs = bucketed_distinct(
        ds.map_batches(pair_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["doc_id", "gram"], n_buckets=n_buckets).materialize()

    covered: set = set()
    out_pick: list[int] = []
    out_doc: list[int] = []
    out_gain: list[int] = []

    _empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                           "c": pd.Series([], dtype=np.int64)})

    for _round in range(k):
        cov_ref = ray.put(sorted(covered))

        def part(g: pd.DataFrame, _ref=cov_ref) -> pd.DataFrame:
            cov = ray.get(_ref)
            if len(cov):
                g = g[~g["gram"].isin(cov)]
            if not len(g):
                return _empty
            return g.groupby("doc_id", sort=False).size().reset_index(
                name="c")

        totals = bucketed_sum(
            pairs.map_batches(part, batch_format="pandas"),
            ["doc_id"], ["c"], n_buckets=n_buckets)

        # per-block top-1 partial (max of maxes is the max, so block
        # boundaries cannot change the winner), tiny driver fold
        def top1(g: pd.DataFrame) -> pd.DataFrame:
            if not len(g):
                return _empty
            best = g["c"].max()
            doc = g.loc[g["c"] == best, "doc_id"].min()
            return pd.DataFrame({"doc_id": [int(doc)],
                                 "c": [int(best)]})

        cands = totals.map_batches(
            top1, batch_format="pandas").to_pandas()
        if not len(cands):  # empty Dataset.to_pandas() drops columns
            break
        cands = cands[cands["c"] > 0]
        if not len(cands):
            break
        best = int(cands["c"].max())
        doc = int(cands.loc[cands["c"] == best, "doc_id"].min())

        def fetch(g: pd.DataFrame, _d=doc) -> pa.Table:
            # Arrow out: pandas 0-row object frames trip Ray's block
            # size estimator (vectorize-on-empty log noise)
            vals = g.loc[g["doc_id"] == _d, "gram"]
            return pa.table({"gram": pa.array(vals, pa.string())})

        wg = pairs.map_batches(
            fetch, batch_format="pandas").to_pandas()["gram"]
        covered.update(wg.tolist())
        out_pick.append(_round + 1)
        out_doc.append(doc)
        out_gain.append(best)

    return ray.data.from_arrow(pa.table({
        "pick": pa.array(out_pick, pa.int64()),
        "doc_id": pa.array(out_doc, pa.int64()),
        "gain": pa.array(out_gain, pa.int64())}))


def span_corruption_stats(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    span_len: int = 3,
    period: int = 5,
) -> ray.data.Dataset:
    """T5-style span-corruption accounting: deterministically mask runs
    of ``span_len`` tokens every ``span_len * period`` tokens (offset by
    doc id, so masks differ across docs) and report per doc the exact
    seq2seq token budget -- ``n_input = n_tokens - n_masked + n_spans``
    (each span collapses to one sentinel) and
    ``n_target = n_masked + n_spans`` -- the numbers a span-corruption
    pretraining pipeline needs for packing and cost estimates.

    The mask is REALLY built (whole-batch: one global token index via
    cumsum/repeat, one modular test, run starts by a shifted compare,
    per-doc reduceat sums -- no per-row Python), while the DuckDB
    oracle counts the same mask in closed form (qualifying j in
    [d, n+d) with (j // L) % P == 0), so the oracle binds the masking
    kernel exactly.  Token = single-space split (corpus contract:
    no empty/double/edge spaces -- validated in TESTDATA probes)."""
    lp = span_len * period

    def kern(t: pa.Table) -> pa.Table:
        txt = t[text_col].combine_chunks()
        ids = t[id_col].combine_chunks().to_numpy().astype(np.int64)
        n_tok = pc.add(pc.count_substring(txt, " "), 1).to_numpy()
        n_tok = n_tok.astype(np.int64)
        total = int(n_tok.sum())
        ends = np.cumsum(n_tok)
        starts = ends - n_tok
        i = np.arange(total, dtype=np.int64) - np.repeat(starts, n_tok)
        d = np.repeat(ids, n_tok)
        q = ((i + d) // span_len) % period == 0
        seg = np.zeros(total, dtype=bool)
        seg[starts[n_tok > 0]] = True
        run_start = q & (seg | ~np.roll(q, 1))
        # reduceat over doc segments (guard zero-length segments)
        qi = q.astype(np.int64)
        ri = run_start.astype(np.int64)
        n_masked = np.zeros(len(ids), np.int64)
        n_spans = np.zeros(len(ids), np.int64)
        nz = n_tok > 0
        if total:
            n_masked[nz] = np.add.reduceat(qi, starts[nz])
            n_spans[nz] = np.add.reduceat(ri, starts[nz])
        return pa.table({
            id_col: pa.array(ids),
            "n_tokens": pa.array(n_tok),
            "n_masked": pa.array(n_masked),
            "n_spans": pa.array(n_spans),
            "n_input_tokens": pa.array(n_tok - n_masked + n_spans),
            "n_target_tokens": pa.array(n_masked + n_spans)})

    return ds.map_batches(kern, batch_format="pyarrow",
                          zero_copy_batch=True)
