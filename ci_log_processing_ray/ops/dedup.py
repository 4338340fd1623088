"""Deduplication operators.

Shuffle structure (the part that matters at 100 TB):

* exact:     vectorized 64-bit content hash per batch (combiner-style),
             then ONE groupby on the compact hash key -- never on the
             full text -- with per-group first-row selection.
* minhash:   per-batch shingling + minhash signatures (numpy, no Python
             per-row loop), explode to (band, band_hash) candidate keys,
             groupby buckets, verify candidate pairs with true Jaccard,
             union-find over the (small) verified edge set.
* simhash:   per-batch 64-bit simhash; exact-bucket groupby (optionally
             on a rotated prefix for near-matches).
* embedding: random-hyperplane LSH bucket key per batch, within-bucket
             exact cosine verification.

All randomness is seeded and derived per-operator -- results are
deterministic regardless of partitioning.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

_HASH_KEY = "cilogprocraydedu"  # exactly 16 bytes (pandas hash_key contract)


def _hash64(texts: pa.Array | list) -> np.ndarray:
    """Deterministic vectorized 64-bit string hash."""
    arr = np.asarray(
        texts.to_pylist() if isinstance(texts, (pa.Array, pa.ChunkedArray)) else texts,
        dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY).astype(np.uint64)


def exact_dedup(
    ds: ray.data.Dataset, text_col: str, id_col: str
) -> ray.data.Dataset:
    """Keep the lexicographically-first id per distinct text.

    Two-phase: per-batch hash (map_batches, vectorized) -> groupby on the
    8-byte hash (the only shuffle; keys are compact, never the payload)
    -> within-group exact-text resolution (collision-safe).
    Returns (id_col, text_col, dup_count).
    """

    def add_hash(t: pa.Table) -> pa.Table:
        h = _hash64(t[text_col].combine_chunks())
        return t.select([id_col, text_col]).append_column(
            "_h", pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", batch_size=None)

    def first_per_text(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.sort_values(id_col)
            .groupby(text_col, sort=False, as_index=False)
            .agg(**{id_col: (id_col, "first"), "dup_count": (id_col, "size")})
        )
        return out[[id_col, text_col, "dup_count"]]

    return hashed.groupby("_h").map_groups(first_per_text, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH near-duplicate detection
# ---------------------------------------------------------------------------
_MERSENNE = (1 << 61) - 1


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct k-byte shingle hashes of one document (vectorized rolling
    polynomial hash over the UTF-8 bytes)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    if len(data) < k:
        data = np.pad(data, (0, k - len(data)), constant_values=0)
    n = len(data) - k + 1
    # rolling polynomial hash, base 257 mod 2^61-1
    base = np.uint64(257)
    powers = np.empty(k, dtype=np.uint64)
    p = np.uint64(1)
    for i in range(k - 1, -1, -1):
        powers[i] = p
        p = (p * base) % np.uint64(_MERSENNE)
    windows = np.lib.stride_tricks.sliding_window_view(data, k)[:n]
    h = (windows * powers).sum(axis=1) % np.uint64(_MERSENNE)
    return np.unique(h)


def _minhash_signature(
    shingles: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """num_perm minhash values via (a*x + b) mod p universal hashing."""
    if len(shingles) == 0:
        return np.full(len(a), _MERSENNE, dtype=np.uint64)
    v = (np.outer(a, shingles) + b[:, None]) % np.uint64(_MERSENNE)
    return v.min(axis=1)


def _perm_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


class _MinHashBatch:
    """Actor-pool stage: permutation params computed once per actor."""

    def __init__(self, text_col, id_col, k, num_perm, bands, seed):
        self.text_col, self.id_col = text_col, id_col
        self.k, self.num_perm, self.bands = k, num_perm, bands
        self.rows = num_perm // bands
        self.a, self.b = _perm_params(num_perm, seed)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(t[self.id_col].to_pylist(),
                                t[self.text_col].to_pylist()):
            sig = _minhash_signature(
                _shingle_hashes(text, self.k), self.a, self.b)
            for band in range(self.bands):
                chunk = sig[band * self.rows:(band + 1) * self.rows]
                bh = hash_band(chunk)
                ids.append(doc_id)
                band_ids.append(band)
                band_hashes.append(bh)
        return pa.table({
            self.id_col: pa.array(ids),
            "band": pa.array(band_ids, type=pa.int32()),
            "band_hash": pa.array(band_hashes, type=pa.int64()),
        })


def hash_band(chunk: np.ndarray) -> int:
    """Deterministic 63-bit hash of one band's signature slice."""
    h = np.uint64(1469598103934665603)  # FNV offset
    for v in chunk:
        h = np.uint64((int(h) ^ int(v)) * 1099511628211 % (1 << 64))
    return int(h >> np.uint64(1))


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
    seed: int = 97,
) -> "pd.DataFrame":
    """Near-dup clusters: returns (id, cluster_rep) for every clustered doc.

    Pipeline: minhash+band rows (actor pool) -> groupby(band, band_hash)
    -> candidate pairs per bucket -> exact Jaccard verification on the
    candidate docs only -> union-find on the verified edges (driver side;
    the edge set is tiny relative to the corpus by construction).
    """
    banded = ds.map_batches(
        _MinHashBatch,
        fn_constructor_args=(text_col, id_col, k, num_perm, bands, seed),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 8))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(g[id_col].unique())
        if len(ids) < 2:
            return pd.DataFrame({"left": [], "right": []})
        left, right = [], []
        rep = ids[0]
        for other in ids[1:]:  # star expansion keeps pair count linear
            left.append(rep)
            right.append(other)
        return pd.DataFrame({"left": left, "right": right})

    pairs = (
        banded.groupby(["band", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
        .to_pandas()
    )
    if len(pairs) == 0:
        return pd.DataFrame({id_col: [], "cluster_rep": []})
    pairs = pairs.drop_duplicates()

    # exact Jaccard verification on candidate docs only
    cand_ids = set(pairs["left"]) | set(pairs["right"])
    texts = {}
    for t in ds.map_batches(
        lambda t: t.select([id_col, text_col]),
        batch_format="pyarrow", batch_size=None,
    ).iter_batches(batch_format="pyarrow"):
        for i, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            if i in cand_ids:
                texts[i] = _shingle_hashes(txt, k)

    def jac(x, y):
        inter = len(np.intersect1d(x, y, assume_unique=True))
        union = len(x) + len(y) - inter
        return inter / union if union else 1.0

    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for left, right in pairs.itertuples(index=False):
        if jac(texts[left], texts[right]) >= jaccard_threshold:
            rl, rr = find(left), find(right)
            if rl != rr:
                parent[max(rl, rr)] = min(rl, rr)

    rows = sorted((i, find(i)) for i in parent)
    return pd.DataFrame(rows, columns=[id_col, "cluster_rep"])


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, distributed via pair counting)
# ---------------------------------------------------------------------------
_WORD_RE = None  # compiled lazily per worker (module import = once per proc)


def _word_ngram_hashes(text: str, n: int) -> np.ndarray:
    """Distinct word-n-gram hashes of one document (lowercased words)."""
    global _WORD_RE
    if _WORD_RE is None:
        import re

        _WORD_RE = re.compile(r"[a-z0-9_]+")
    words = _WORD_RE.findall(text.lower())
    if len(words) < n:
        return np.empty(0, dtype=np.uint64)
    grams = np.asarray(
        [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)],
        dtype=object)
    return np.unique(pd.util.hash_array(grams, hash_key=_HASH_KEY))


def ngram_jaccard_pairs(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    *,
    n: int = 3,
    threshold_pct: int = 50,
    max_df: int | None = None,
) -> ray.data.Dataset:
    """All document pairs with word-``n``-gram Jaccard >= threshold.

    Exact and fully distributed -- no driver-side loop, no set shipping:

    1. explode each doc to (gram_hash, doc_id, n_grams) rows, grams
       DISTINCT per doc (map_batches);
    2. groupby(gram_hash) -> emit candidate pair rows per bucket
       (each shared gram contributes exactly ONE co-occurrence row);
    3. groupby(left, right): ``count(*)`` IS the intersection size, so
       jaccard = c / (na + nb - c) falls out of pure counting.

    Any pair with jaccard >= t > 0 shares >= 1 gram, so blocking on
    shared grams loses nothing -- the result is exact.  At 100 TB pass
    ``max_df`` to drop grams appearing in more than max_df docs (the
    classic DF cutoff): candidate generation cost drops from
    sum(df^2) to sum(min(df, max_df)^2) at a bounded, documented recall
    loss for pairs that ONLY share ultra-common grams.

    Returns (left_id, right_id, inter, union_sz) with left_id < right_id,
    threshold applied as ``100*inter >= threshold_pct*union`` (integer
    math -- value-hash safe vs a SQL oracle).
    """

    n_buckets = 64  # coarse hash partitions: the ONE shuffle is over 64
    # groups, not one group per distinct gram (per-group dispatch would
    # dominate); within a bucket, pair generation is one vectorized
    # self-merge.

    def explode(t: pa.Table) -> pa.Table:
        ids_out, hashes, counts = [], [], []
        for doc_id, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            h = _word_ngram_hashes(text, n)
            if len(h) == 0:
                continue
            ids_out.append(np.full(len(h), doc_id, dtype=np.int64))
            hashes.append(h.astype(np.int64))
            counts.append(np.full(len(h), len(h), dtype=np.int64))
        if not ids_out:
            return pa.table({"gram": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int32()),
                             "doc": pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64())})
        gram = np.concatenate(hashes)
        return pa.table({
            "gram": pa.array(gram),
            "bucket": pa.array((gram % n_buckets).astype(np.int32)),
            "doc": pa.array(np.concatenate(ids_out)),
            "n_grams": pa.array(np.concatenate(counts)),
        })

    exploded = ds.map_batches(explode, batch_format="pyarrow", batch_size=4096)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        df = g.groupby("gram", sort=False)["doc"].transform("size")
        keep = df >= 2
        if max_df is not None:
            keep &= df <= max_df
        sub = g[keep][["gram", "doc", "n_grams"]]
        if len(sub) == 0:
            return pd.DataFrame({"left": pd.Series([], dtype=np.int64),
                                 "right": pd.Series([], dtype=np.int64),
                                 "na": pd.Series([], dtype=np.int64),
                                 "nb": pd.Series([], dtype=np.int64),
                                 "pair_bucket": pd.Series([], dtype=np.int32)})
        m = sub.merge(sub, on="gram", suffixes=("_a", "_b"))
        m = m[m["doc_a"] < m["doc_b"]]
        left = m["doc_a"].to_numpy()
        return pd.DataFrame({"left": left,
                             "right": m["doc_b"].to_numpy(),
                             "na": m["n_grams_a"].to_numpy(),
                             "nb": m["n_grams_b"].to_numpy(),
                             "pair_bucket": (left % n_buckets).astype(np.int32)})

    pairs = exploded.groupby("bucket").map_groups(
        bucket_pairs, batch_format="pandas")

    # second (and last) shuffle: co-locate each pair's co-occurrence
    # rows by a coarse hash of the left id, then count locally --
    # count(*) IS the intersection size.  (Coarse-bucket map_groups
    # rides the fast sort-exchange with bounded group count;
    # Dataset.groupby(...).aggregate() showed ~20s degenerate
    # single-task sub-stages on the same data, and per-distinct-key
    # map_groups pays per-group dispatch.)
    def combine(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(["left", "right"], as_index=False).agg(
            inter=("na", "size"), na=("na", "min"), nb=("nb", "min"))
        inter = agg["inter"].to_numpy(dtype=np.int64)
        union = agg["na"].to_numpy(dtype=np.int64) + \
            agg["nb"].to_numpy(dtype=np.int64) - inter
        keep = 100 * inter >= threshold_pct * union
        return pd.DataFrame({
            "left_id": agg["left"].to_numpy()[keep],
            "right_id": agg["right"].to_numpy()[keep],
            "inter": inter[keep],
            "union_sz": union[keep],
        })

    return pairs.groupby("pair_bucket").map_groups(
        combine, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def _simhash_batch(texts: list[str], seed: int) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.uint64)
    for i, text in enumerate(texts):
        words = text.split()
        if not words:
            out[i] = 0
            continue
        h = pd.util.hash_array(np.asarray(words, dtype=object),
                               hash_key=f"simhash{seed:09d}").astype(np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        votes = bits.astype(np.int64).sum(axis=0) * 2 - len(h)  # signed!
        out[i] = np.uint64(
            int("".join("1" if v > 0 else "0" for v in votes[::-1]), 2))
    return out


def simhash_clusters(
    ds: ray.data.Dataset, text_col: str, id_col: str, *, seed: int = 11
) -> ray.data.Dataset:
    """Exact-simhash buckets: (id, simhash, bucket_size).  Documents with
    identical 64-bit simhash are near-identical bags of words."""

    def add_sim(t: pa.Table) -> pa.Table:
        sh = _simhash_batch(t[text_col].to_pylist(), seed)
        return pa.table({
            id_col: t[id_col],
            "simhash": pa.array(sh.astype(np.int64)),
        })

    simmed = ds.map_batches(add_sim, batch_format="pyarrow", batch_size=None)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        g["bucket_size"] = len(g)
        return g

    return simmed.groupby("simhash").map_groups(per_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding near-duplicate detection
# ---------------------------------------------------------------------------
def embedding_dedup(
    ds: ray.data.Dataset,
    vec_col: str,
    id_col: str,
    *,
    cosine_threshold: float = 0.95,
    n_planes: int = 12,
    dim: int = 64,
    seed: int = 23,
) -> "pd.DataFrame":
    """Near-dup clusters over an embedding column (list<float>).

    Random-hyperplane LSH assigns each vector a bucket (map_batches,
    one matmul per batch against a broadcast plane matrix); only
    within-bucket pairs are verified with exact cosine.  Returns
    (id, cluster_rep) for docs in clusters of size >= 2.
    """
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    planes_ref = ray.put(planes)

    class Bucketer:
        def __init__(self, planes_ref):
            self.planes = ray.get(planes_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = np.vstack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
            v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-12
            bits = (v @ self.planes) > 0
            bucket = bits @ (1 << np.arange(bits.shape[1], dtype=np.int64))
            return pa.table({
                id_col: t[id_col],
                "bucket": pa.array(bucket.astype(np.int64)),
                "_v": pa.array(list(v), type=pa.list_(pa.float64())),
            })

    bucketed = ds.map_batches(
        Bucketer, fn_constructor_args=(planes_ref,),
        batch_format="pyarrow", batch_size=8192, concurrency=(1, 4))

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({id_col: [], "cluster_rep": []})
        g = g.sort_values(id_col).reset_index(drop=True)
        v = np.vstack(g["_v"].to_numpy())
        sims = v @ v.T
        ids = g[id_col].to_numpy()
        parent = {int(i): int(i) for i in ids}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        ii, jj = np.nonzero(np.triu(sims >= cosine_threshold, 1))
        for i, j in zip(ii, jj):
            ri, rj = find(int(ids[i])), find(int(ids[j]))
            if ri != rj:
                parent[max(ri, rj)] = min(ri, rj)
        rows = [(int(i), find(int(i))) for i in ids]
        out = pd.DataFrame(rows, columns=[id_col, "cluster_rep"])
        sizes = out.groupby("cluster_rep")[id_col].transform("size")
        return out[sizes >= 2]

    clustered = bucketed.groupby("bucket").map_groups(
        verify, batch_format="pandas").to_pandas()
    if len(clustered) == 0:
        return pd.DataFrame({id_col: [], "cluster_rep": []})
    return clustered.sort_values(id_col).reset_index(drop=True)
