"""Approximate-nearest-neighbor search over an embedding column.

* ``knn_bruteforce`` -- the exact baseline: the query matrix is
  broadcast once (``ray.put``), every batch computes one numpy matmul
  and keeps only its local top-k (combiner!), the final reduce merges
  tiny per-batch partials.  Scales linearly in corpus size with no
  shuffle of the vectors themselves.
* ``knn_lsh`` -- the scale path: random-hyperplane buckets with
  multi-probe (query probes its own bucket + Hamming-1 neighbors);
  only bucket-colliding vectors are scored.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _to_matrix(col) -> np.ndarray:
    return np.vstack(col.to_numpy(zero_copy_only=False)).astype(np.float64)


def knn_bruteforce(
    ds: ray.data.Dataset,
    vec_col: str,
    id_col: str,
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
) -> pd.DataFrame:
    """Exact cosine top-k for each query vector.

    Ties broken by ascending id (deterministic).  Returns
    (query_id, id_col, rank) sorted by (query_id, rank).
    """
    qn = queries.astype(np.float64)
    qn = qn / (np.linalg.norm(qn, axis=1, keepdims=True) + 1e-12)
    q_ref = ray.put(qn)

    class Scorer:
        def __init__(self, q_ref, k):
            self.q = ray.get(q_ref)
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            v = _to_matrix(t[vec_col])
            v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-12
            sims = v @ self.q.T  # (batch, nq)
            ids = np.asarray(t[id_col].to_pylist())
            out_q, out_id, out_s = [], [], []
            for qi in range(sims.shape[1]):
                col = sims[:, qi]
                take = min(self.k, len(col))
                # local top-k with (score desc, id asc) determinism
                order = np.lexsort((ids, -col))[:take]
                out_q.extend([qi] * take)
                out_id.extend(ids[order])
                out_s.extend(col[order])
            return pa.table({
                "qi": pa.array(out_q, type=pa.int32()),
                id_col: pa.array(out_id),
                "score": pa.array(out_s, type=pa.float64()),
            })

    partials = ds.map_batches(
        Scorer, fn_constructor_args=(q_ref, k),
        batch_format="pyarrow", batch_size=8192, concurrency=(1, 8)
    ).to_pandas()

    rows = []
    for qi, sub in partials.groupby("qi"):
        best = heapq.nsmallest(
            k, sub.itertuples(index=False), key=lambda r: (-r.score, getattr(r, id_col)))
        for rank, r in enumerate(best):
            rows.append((query_ids[qi], getattr(r, id_col), rank + 1))
    return (
        pd.DataFrame(rows, columns=["query_id", id_col, "rank"])
        .sort_values(["query_id", "rank"]).reset_index(drop=True))


def knn_lsh(
    ds: ray.data.Dataset,
    vec_col: str,
    id_col: str,
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
    *,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 41,
    probe_hamming: int = 1,
) -> pd.DataFrame:
    """Approximate top-k: score only vectors whose hyperplane bucket is
    within Hamming distance ``probe_hamming`` of the query's bucket
    (multi-probe).  The recall/cost knob: distance 1 probes
    1+n_planes of 2^n_planes buckets, distance 2 adds the
    C(n_planes, 2) pair-flips -- on structure-free (uniform) vectors
    recall tracks the probed fraction almost linearly, so size it to
    the recall target."""
    from itertools import combinations

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    qn = queries.astype(np.float64)
    qn = qn / (np.linalg.norm(qn, axis=1, keepdims=True) + 1e-12)
    q_bits = (qn @ planes) > 0
    weights = 1 << np.arange(n_planes, dtype=np.int64)
    q_buckets = q_bits @ weights
    probe_sets = []
    for b in q_buckets:
        probes = {int(b)}
        for j in range(n_planes):
            probes.add(int(b) ^ (1 << j))
        if probe_hamming >= 2:
            for j, l in combinations(range(n_planes), 2):
                probes.add(int(b) ^ (1 << j) ^ (1 << l))
        probe_sets.append(probes)
    # hoisted SORTED probe array (was a per-batch list(set) rebuild)
    wanted = np.array(sorted(set().union(*probe_sets)), dtype=np.int64)

    state = ray.put((planes, qn, wanted))

    class Scorer:
        def __init__(self, state_ref, k):
            self.planes, self.q, self.wanted = ray.get(state_ref)
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            v = _to_matrix(t[vec_col])
            v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-12
            bucket = ((v @ self.planes) > 0) @ weights
            mask = np.isin(bucket, self.wanted)
            if not mask.any():
                return pa.table({
                    "qi": pa.array([], type=pa.int32()),
                    id_col: pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                    "bucket": pa.array([], type=pa.int64()),
                })
            v, bucket = v[mask], bucket[mask]
            ids = np.asarray(t[id_col].to_pylist())[mask]
            sims = v @ self.q.T
            out_q, out_id, out_s, out_b = [], [], [], []
            for qi in range(sims.shape[1]):
                col = sims[:, qi]
                take = min(self.k, len(col))
                order = np.lexsort((ids, -col))[:take]
                out_q.extend([qi] * take)
                out_id.extend(ids[order])
                out_s.extend(col[order])
                out_b.extend(bucket[order])
            return pa.table({
                "qi": pa.array(out_q, type=pa.int32()),
                id_col: pa.array(out_id),
                "score": pa.array(out_s, type=pa.float64()),
                "bucket": pa.array(out_b, type=pa.int64()),
            })

    partials = ds.map_batches(
        Scorer, fn_constructor_args=(state, k),
        batch_format="pyarrow", batch_size=8192, concurrency=(1, 8)
    ).to_pandas()

    rows = []
    for qi, sub in partials.groupby("qi"):
        sub = sub[sub["bucket"].isin(probe_sets[qi])]
        best = heapq.nsmallest(
            k, sub.itertuples(index=False), key=lambda r: (-r.score, getattr(r, id_col)))
        for rank, r in enumerate(best):
            rows.append((query_ids[qi], getattr(r, id_col), rank + 1))
    return (
        pd.DataFrame(rows, columns=["query_id", id_col, "rank"])
        .sort_values(["query_id", "rank"]).reset_index(drop=True))


def _kmeans(sample: np.ndarray, n_centroids: int, seed: int, iters: int) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means on a driver-side sample (the
    coarse quantizer training step of a classic IVF index)."""
    rng = np.random.default_rng(seed)
    idx = rng.choice(len(sample), size=min(n_centroids, len(sample)),
                     replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / (np.linalg.norm(m) + 1e-12)
    return cent


def knn_ivf(
    ds: ray.data.Dataset,
    vec_col: str,
    id_col: str,
    queries: np.ndarray,
    query_ids: list,
    k: int = 10,
    *,
    n_centroids: int = 16,
    n_probe: int = 4,
    sample_size: int = 4096,
    seed: int = 59,
    iters: int = 5,
) -> pd.DataFrame:
    """IVF-style approximate top-k: train a coarse quantizer on a small
    driver-side sample, broadcast the centroids, score ONLY vectors whose
    nearest centroid is among each query's ``n_probe`` closest lists.

    The scale path for ANN beyond LSH: per-batch work is one matmul for
    the assignment plus one matmul over the probed subset; nothing but
    tiny top-k partials leaves the workers.  Returns
    (query_id, id_col, rank) like ``knn_bruteforce``.
    """
    sample = _to_matrix(
        pa.concat_tables(
            [b.select([vec_col]) for b in
             ds.limit(sample_size).iter_batches(batch_format="pyarrow")]
        )[vec_col])
    sample /= np.linalg.norm(sample, axis=1, keepdims=True) + 1e-12
    cent = _kmeans(sample, n_centroids, seed, iters)

    qn = queries.astype(np.float64)
    qn = qn / (np.linalg.norm(qn, axis=1, keepdims=True) + 1e-12)
    probe_lists = np.argsort(-(qn @ cent.T), axis=1)[:, :n_probe]
    # probed[c] = query indices probing centroid c
    probed_by_cent = {c: np.where((probe_lists == c).any(axis=1))[0]
                      for c in range(len(cent))}
    state = ray.put((cent, qn, probed_by_cent))

    class Scorer:
        def __init__(self, state_ref, k):
            self.cent, self.q, self.probed = ray.get(state_ref)
            self.k = k

        def __call__(self, t: pa.Table) -> pa.Table:
            v = _to_matrix(t[vec_col])
            v /= np.linalg.norm(v, axis=1, keepdims=True) + 1e-12
            assign = np.argmax(v @ self.cent.T, axis=1)
            ids = np.asarray(t[id_col].to_pylist())
            out_q, out_id, out_s = [], [], []
            for c in np.unique(assign):
                quers = self.probed.get(int(c))
                if quers is None or len(quers) == 0:
                    continue
                sub = assign == c
                sims = v[sub] @ self.q[quers].T
                sub_ids = ids[sub]
                for col_i, qi in enumerate(quers):
                    col = sims[:, col_i]
                    take = min(self.k, len(col))
                    order = np.lexsort((sub_ids, -col))[:take]
                    out_q.extend([int(qi)] * take)
                    out_id.extend(sub_ids[order])
                    out_s.extend(col[order])
            return pa.table({
                "qi": pa.array(out_q, type=pa.int32()),
                id_col: pa.array(out_id, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            })

    partials = ds.map_batches(
        Scorer, fn_constructor_args=(state, k),
        batch_format="pyarrow", batch_size=8192, concurrency=(1, 8)
    ).to_pandas()

    rows = []
    for qi, sub in partials.groupby("qi"):
        best = heapq.nsmallest(
            k, sub.itertuples(index=False),
            key=lambda r: (-r.score, getattr(r, id_col)))
        for rank, r in enumerate(best):
            rows.append((query_ids[qi], getattr(r, id_col), rank + 1))
    return (
        pd.DataFrame(rows, columns=["query_id", id_col, "rank"])
        .sort_values(["query_id", "rank"]).reset_index(drop=True))


def quantize_embeddings(
    ds: "ray.data.Dataset",
    vec_col: str,
    id_col: str,
) -> "ray.data.Dataset":
    """Symmetric int8 quantization per vector (the 4x storage shrink a
    100 TB embedding table needs): q = round(127 * v / max|v|), stored
    as a fixed-width binary blob + one float32 scale.  Pure map, fully
    vectorized over the stacked batch matrix.  Dequantized cosine error
    is bounded by the per-component step (unit-tested < 1e-2)."""

    def kern(t: pa.Table) -> pa.Table:
        v = np.vstack(t[vec_col].to_numpy(zero_copy_only=False)).astype(
            np.float64)
        amax = np.abs(v).max(axis=1, keepdims=True)
        amax[amax == 0] = 1.0
        q = np.clip(np.rint(v * (127.0 / amax)), -127, 127).astype(np.int8)
        scales = (amax[:, 0] / 127.0).astype(np.float32)
        blobs = [row.tobytes() for row in q]
        return pa.table({
            id_col: t[id_col],
            "qvec": pa.array(blobs, type=pa.binary()),
            "scale": pa.array(scales, type=pa.float32()),
            "dim": pa.array(np.full(len(t), v.shape[1], dtype=np.int32)),
        })

    return ds.map_batches(kern, batch_format="pyarrow", zero_copy_batch=True)


def pca_project(
    ds: ray.data.Dataset,
    vec_col: str,
    id_col: str,
    *,
    n_components: int = 2,
) -> ray.data.Dataset:
    """Distributed PCA over an embedding column via ONE-PASS moment
    partials: each batch emits (count, sum-vector, sum-of-outer-
    products) -- dim + dim^2 numbers regardless of corpus size -- the
    driver assembles the covariance from the merged moments and
    eigendecomposes it (dim x dim, trivially driver-sized), then the
    unit-norm components are broadcast and every vector is projected in
    a pure map.  The corpus is touched exactly twice, nothing is
    shuffled, and no stage materializes the dataset: the canonical
    "sufficient statistics -> broadcast model" shape that survives any
    corpus size as long as dim^2 fits one machine.

    Determinism: eigenvector SIGN is fixed by making each component's
    largest-magnitude coordinate positive (ties by lowest index via
    argmax), so output is reproducible across runs and block layouts
    up to float summation order.

    Output: ``id_col, pc1..pcN`` (float64 projections onto the top
    components, mean-centered).  Rows-only: transcendental
    eigendecomposition is not SQL-expressible; parity vs numpy's
    directly-computed PCA is unit-tested.
    """
    def moments(t: pa.Table) -> pa.Table:
        v = _to_matrix(t[vec_col])
        n = np.array([float(len(v))])
        s = v.sum(axis=0)
        ss = (v.T @ v).reshape(-1)
        return pa.table({"stat": pa.array(np.concatenate([n, s, ss]),
                                          pa.float64()),
                         "pos": pa.array(np.arange(1 + len(s) + len(ss),
                                                   dtype=np.int64))})

    agg = (ds.map_batches(moments, batch_format="pyarrow",
                          zero_copy_batch=True)
           .groupby("pos").sum("stat").to_pandas()
           .sort_values("pos"))
    stats = agg["sum(stat)"].to_numpy()
    n = stats[0]
    dim = int(round((np.sqrt(4 * (len(stats) - 1) + 1) - 1) / 2))
    mean = stats[1:1 + dim] / n
    cov = stats[1 + dim:].reshape(dim, dim) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T  # (n_components, dim)
    # canonical sign: largest-|coord| entry positive
    flips = np.sign(comps[np.arange(len(comps)),
                          np.abs(comps).argmax(axis=1)])
    comps = comps * np.where(flips == 0, 1.0, flips)[:, None]
    state = ray.put((mean, comps))

    class Project:
        def __init__(self, state_ref):
            self.mean, self.comps = ray.get(state_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            v = _to_matrix(t[vec_col])
            proj = (v - self.mean) @ self.comps.T
            cols = {id_col: t[id_col]}
            for i in range(proj.shape[1]):
                cols[f"pc{i + 1}"] = pa.array(proj[:, i], pa.float64())
            return pa.table(cols)

    return ds.map_batches(Project, fn_constructor_args=(state,),
                          batch_format="pyarrow", batch_size=8192,
                          concurrency=(1, 4))
