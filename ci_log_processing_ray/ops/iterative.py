"""Iterative distributed algorithms: k-means and connected components.

Both follow the same shape: a SMALL model state lives on the driver and
is re-broadcast each round (``ray.put``), while the big side streams
through ``map_batches`` producing mergeable partials.  Per-round data
movement is bounded by the model size, never the dataset.

* k-means: centroids (k x dim floats) broadcast; each batch computes
  nearest-centroid assignments with one matmul and emits per-centroid
  (sum, count) partials; the driver updates centroids from the k-row
  aggregate and loops until movement < tol.
* connected components: iterative min-label propagation over the edge
  list (the scale-out replacement for driver-side union-find when the
  edge set itself is too big to collect): each round joins labels to
  edges, emits the min neighbor label per node, and merges -- converges
  in O(diameter) rounds; each round is one bucketed shuffle of
  (node, label) pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data
from ray.data.aggregate import Min, Sum


def kmeans(
    ds: ray.data.Dataset,
    vec_col: str,
    *,
    k: int,
    n_iter: int = 10,
    tol: float = 1e-4,
    seed: int = 42,
    sample_size: int = 1024,
) -> tuple[np.ndarray, "pd.DataFrame"]:
    """Lloyd's k-means over a ``list<float>`` column.

    Init: deterministic farthest-point traversal over a driver-side
    sample (first ``sample_size`` rows): start at the first point, then
    greedily add the sample point farthest from its nearest chosen
    centroid -- one pick per well-separated cluster by construction
    (random init can seed two centroids in one blob and converge to a
    split-blob local optimum).  Each round: ONE streaming pass --
    per-batch assignment matmul against the broadcast centroids,
    in-batch (centroid, sum, count) partials, k-row aggregate to the
    driver.  Returns (centroids [k, dim], per-cluster counts frame).
    The loop stops early when max centroid movement < ``tol``.
    """
    del seed  # deterministic init; kept for signature stability
    first = ds.limit(sample_size).to_pandas()
    sample = np.vstack(first[vec_col].to_numpy()).astype(np.float64)
    k = min(k, len(sample))
    chosen = [0]
    d2 = ((sample - sample[0]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        nxt = int(d2.argmax())
        chosen.append(nxt)
        d2 = np.minimum(d2, ((sample - sample[nxt]) ** 2).sum(axis=1))
    centroids = sample[chosen].copy()
    dim = centroids.shape[1]

    counts = None
    for _round in range(n_iter):
        c_ref = ray.put(centroids)

        def partials(t: pa.Table, _c_ref=c_ref) -> pa.Table:
            c = ray.get(_c_ref)  # zero-copy from the object store
            v = np.vstack(t[vec_col].to_numpy(zero_copy_only=False)).astype(
                np.float64)
            # nearest centroid: argmin ||v - c||^2 = argmin -2 v.c + |c|^2
            d = v @ c.T * -2.0 + (c * c).sum(axis=1)[None, :]
            assign = d.argmin(axis=1)
            sums = np.zeros((len(c), v.shape[1]))
            np.add.at(sums, assign, v)
            cnt = np.bincount(assign, minlength=len(c)).astype(np.int64)
            nz = cnt > 0
            flat = sums[nz].reshape(-1)
            cid = np.flatnonzero(nz).astype(np.int64)
            return pa.table({
                "cid": pa.array(np.repeat(cid, v.shape[1])),
                "pos": pa.array(np.tile(np.arange(dim, dtype=np.int64),
                                        len(cid))),
                "s": pa.array(flat),
                "n": pa.array(np.repeat(cnt[nz], v.shape[1])),
            })

        agg = (ds.map_batches(partials, batch_format="pyarrow",
                              zero_copy_batch=True)
               .groupby(["cid", "pos"]).aggregate(
                   Sum("s", alias_name="s"), Sum("n", alias_name="n"))
               .to_pandas())
        new = centroids.copy()
        agg = agg.sort_values(["cid", "pos"])
        for cid, g in agg.groupby("cid"):
            new[int(cid)] = g["s"].to_numpy() / g["n"].to_numpy()
        move = float(np.abs(new - centroids).max())
        counts = (agg[agg["pos"] == 0][["cid", "n"]]
                  .rename(columns={"n": "count"})
                  .astype({"cid": np.int64, "count": np.int64})
                  .reset_index(drop=True))
        centroids = new
        if move < tol:
            break
    return centroids, counts


def connected_components(
    edges: ray.data.Dataset,
    src_col: str,
    dst_col: str,
    *,
    max_rounds: int = 50,
) -> ray.data.Dataset:
    """Distributed connected components via min-label propagation.

    Labels start as the node id; each round every node adopts the
    minimum label among itself and its neighbors.  One bucketed shuffle
    of (node, label) candidates per round; convergence is detected with
    a driver-side count of changed labels (a one-int aggregate).  This
    replaces driver union-find when the edge list exceeds driver memory
    -- the driver only ever sees per-round change counts.

    Returns (node, component) with component = min node id reachable.
    """
    import pyarrow.compute as pc

    def init_labels(t: pa.Table) -> pa.Table:
        s = t[src_col].combine_chunks().cast(pa.int64())
        d = t[dst_col].combine_chunks().cast(pa.int64())
        nodes = pa.concat_arrays([s, d])
        return pa.table({"node": nodes, "label": nodes})

    labels = (edges.map_batches(init_labels, batch_format="pyarrow")
              .groupby("node").aggregate(Min("label", alias_name="label"))
              .materialize())
    # undirected edge list, symmetrized once
    sym = edges.map_batches(
        lambda t: pa.table({
            "u": pa.concat_arrays([
                t[src_col].combine_chunks().cast(pa.int64()),
                t[dst_col].combine_chunks().cast(pa.int64())]),
            "v": pa.concat_arrays([
                t[dst_col].combine_chunks().cast(pa.int64()),
                t[src_col].combine_chunks().cast(pa.int64())]),
        }), batch_format="pyarrow").materialize()

    ncpu = int(ray.cluster_resources().get("CPU", 8))
    n_part = max(2, ncpu // 4)
    for _round in range(max_rounds):
        # neighbor labels: join edge (u, v) with label(u) -> candidate
        # label for v; union with current labels; min per node
        cand = sym.join(labels, "inner", num_partitions=n_part,
                        on=("u",), right_on=("node",))
        cand = cand.map_batches(
            lambda t: pa.table({"node": t["v"], "label": t["label"]}),
            batch_format="pyarrow")
        new_labels = (cand.union(labels)
                      .groupby("node")
                      .aggregate(Min("label", alias_name="label"))
                      .materialize())
        # convergence: count changed labels (one small join + filter)
        joined = new_labels.join(
            labels.map_batches(
                lambda t: t.rename_columns(["node_old", "old"]),
                batch_format="pyarrow"),
            "inner", num_partitions=n_part,
            on=("node",), right_on=("node_old",))
        changed = joined.map_batches(
            lambda t: pa.table({"c": pa.array(
                [pc.sum(pc.cast(pc.not_equal(t["label"], t["old"]),
                                pa.int64())).as_py() or 0])}),
            batch_format="pyarrow").sum("c")
        labels = new_labels
        if not changed:
            break
    return labels.map_batches(
        lambda t: pa.table({"node": t["node"], "component": t["label"]}),
        batch_format="pyarrow")
