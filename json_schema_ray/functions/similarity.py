"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk``: exact cosine top-k.  The query matrix is
  broadcast once (``ray.put``) and ``ray.get``-cached per worker
  process; each batch contributes its LOCAL top-k per query (numpy
  matmul + argpartition), and the candidate-sized partial set merges
  driver-side — the classic combiner pattern, no full-score shuffle.
- ``ivf_topk``: IVF-style scale path — k-means centroids trained on a
  driver-side sample, vectors assigned to their nearest centroid by a
  map_batches stage; a query probes only the ``nprobe`` closest
  centroids' partitions (candidate filter inside map_batches) before
  exact scoring.  Recall < 1 by design; the partitioning assumption is
  that cluster sizes stay balanced (rebalance by re-training centroids
  on drift).
- ``build_ivf_index`` + ``ivf_topk(index_dir=...)``: the assign-ONCE
  variant — cluster ids are computed one time and persisted as parquet
  partitioned by ``cluster``, so a probed search reads only the
  ``nprobe``/``n_clusters`` fraction of the data (pruning at the READ,
  not post-scan) and never re-assigns rows per batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _to_matrix(col) -> np.ndarray:
    """``list<float>`` column → (n, dim) float64 matrix WITHOUT a Python
    round-trip: flatten the child values buffer and reshape.  ``flatten()``
    honors slice offsets (zero-copy re-batched blocks), so this is
    zero-copy up to the dtype cast — the old ``to_pylist()`` path boxed
    every float into a Python object on the hot path of every
    ANN/embedding stage."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten()
    return np.asarray(flat).reshape(len(arr), -1).astype(np.float64, copy=False)


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.clip(np.linalg.norm(m, axis=1, keepdims=True), 1e-12, None)


# per-worker-process scorer cache (keyed by broadcast ObjectRef): plain
# task maps amortize state like an actor pool does, without its cold start
_WORKER_SCORERS: dict = {}


class _TopKScorer:
    """Actor-pool stage: per-batch local top-k against the broadcast
    query matrix (loaded once per actor)."""

    def __init__(self, queries_ref, k: int, emb_col: str, id_col: str, normalize: bool):
        import ray

        q = queries_ref
        if isinstance(q, ray.ObjectRef):
            q = ray.get(q)
        self.qids = np.asarray(q["qids"])
        self.Q = np.asarray(q["Q"], dtype=np.float64)  # already normalized
        self.k = k
        self.emb_col = emb_col
        self.id_col = id_col
        self.normalize = normalize

    def __call__(self, batch: pa.Table) -> pa.Table:
        E = _to_matrix(batch[self.emb_col])
        if self.normalize:
            E = _normalize(E)
        ids = batch[self.id_col].to_pandas().to_numpy()
        S = E @ self.Q.T  # (n, q)
        k = min(self.k, len(ids))
        top = np.argpartition(-S, k - 1, axis=0)[:k]  # (k, q)
        out_q, out_id, out_s = [], [], []
        for j, qid in enumerate(self.qids):
            rows = top[:, j]
            out_q.append(np.full(k, qid))
            out_id.append(ids[rows])
            out_s.append(S[rows, j])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                self.id_col: pa.array(np.concatenate(out_id)),
                "score": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )


def brute_force_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int = 4,
) -> pa.Table:
    """Exact cosine top-k: (query_id, vec_id, score, rank).

    Shape notes (measured in round 3): the scorer is a plain TASK map —
    an actor pool here paid a ~1-2 s pool cold start for state that is
    just one broadcast ``ray.get`` (cached per worker process, same
    pattern as pipelines/validation._task_validator).  The final merge
    is DRIVER-side pandas: the partials stream is combiner-collapsed to
    ≤ n_blocks × q × k rows (candidate-sized, thousands), so a
    sort-based ``groupby().map_groups`` exchange spent a whole dataset
    stage on rows that fit in one small table.  Together the two cut
    the sf0.1 companion op from ~2.9 s to read+score time."""
    import ray

    Q = _normalize(np.asarray(queries, dtype=np.float64))
    qref = ray.put({"qids": np.asarray(query_ids), "Q": Q})

    def score_batch(batch: pa.Table) -> pa.Table:
        key = qref.hex()
        sc = _WORKER_SCORERS.get(key)
        if sc is None:
            if len(_WORKER_SCORERS) >= 4:
                _WORKER_SCORERS.clear()  # long-lived workers serve many runs
            sc = _TopKScorer(
                queries_ref=qref, k=k, emb_col=emb_col, id_col=id_col, normalize=True
            )
            _WORKER_SCORERS[key] = sc
        return sc(batch)

    partials = ds.map_batches(score_batch, batch_format="pyarrow").to_pandas()

    out = (
        partials.sort_values(["score", id_col], ascending=[False, True])
        .groupby("query_id", sort=False)
        .head(k)
        .sort_values(["query_id", "score", id_col], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    out["rank"] = out.groupby("query_id").cumcount() + 1
    return pa.Table.from_pandas(out, preserve_index=False)


# ----------------------------------------------------------------- IVF


def train_centroids(sample: np.ndarray, n_clusters: int, iters: int = 10, seed: int = 42) -> np.ndarray:
    """Small k-means (driver-side, on a sample) → normalized centroids."""
    rng = np.random.RandomState(seed)
    X = _normalize(np.asarray(sample, dtype=np.float64))
    C = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                C[c] = X[m].mean(axis=0)
        C = _normalize(C)
    return C


def build_ivf_index(
    ds,
    index_dir: str,
    n_clusters: int = 16,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2000,
    seed: int = 42,
) -> np.ndarray:
    """Assign-once IVF index: train centroids on a sample, tag every row
    with its nearest centroid (one distributed pass), write parquet
    PARTITIONED by ``cluster`` + persist the centroid matrix.  A probed
    search then reads only its clusters' directories — column/partition
    pruning at the read, the 100-TB path (no per-batch re-assignment)."""
    import os

    import ray

    sample = _to_matrix(
        pa.concat_tables(
            [pa.table(b) for b in ds.limit(sample_size).iter_batches(batch_format="pyarrow")]
        )[emb_col]
    )
    if sample.ndim != 2 or len(sample) == 0:
        raise ValueError("build_ivf_index: dataset has no embedding rows to train on")
    C = train_centroids(sample, n_clusters, seed=seed)
    cref = ray.put(C)

    class Assign:
        def __init__(self, centroids_ref):
            self.C = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            E = _normalize(_to_matrix(batch[emb_col]))
            cl = np.argmax(E @ self.C.T, axis=1).astype(np.int32)
            return batch.append_column("cluster", pa.array(cl))

    ds.map_batches(
        Assign, fn_constructor_kwargs={"centroids_ref": cref},
        batch_format="pyarrow", concurrency=2,
    ).write_parquet(os.path.join(index_dir, "vectors"), partition_cols=["cluster"])
    np.save(os.path.join(index_dir, "centroids.npy"), C)
    return C


def ivf_topk_indexed(
    index_dir: str,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    concurrency: int = 4,
) -> pa.Table:
    """Probed search over a ``build_ivf_index`` output: reads ONLY the
    probed clusters' partitions.  Logs scored-row count vs index size."""
    import glob
    import logging
    import os

    import ray
    import ray.data as rd
    from ray.data.datasource.partitioning import PathPartitionFilter

    C = np.load(os.path.join(index_dir, "centroids.npy"))
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)
    union = {str(int(c)) for row in probe for c in row}
    n_total = len(glob.glob(os.path.join(index_dir, "vectors", "cluster=*")))
    logging.getLogger(__name__).info(
        "ivf probe: reading %d/%d cluster partitions", len(union), n_total
    )
    # partition_filter prunes non-probed cluster directories AT THE READ
    # (their files are never opened); hive partitioning restores `cluster`
    pruned = rd.read_parquet(
        os.path.join(index_dir, "vectors"),
        partition_filter=PathPartitionFilter.of(
            lambda kv, _u=union: kv.get("cluster") in _u, style="hive"
        ),
    )
    allowed = [frozenset(int(c) for c in row) for row in probe]
    qref = ray.put({"qids": np.asarray(query_ids), "Q": Q})

    class ClusterScorer(_TopKScorer):
        """Scores rows already assigned: per query, mask by its probed
        clusters using the persisted ``cluster`` column (no re-assign)."""

        def __init__(self, queries_ref, k, emb_col, id_col, allowed_sets):
            super().__init__(queries_ref, k, emb_col, id_col, normalize=True)
            self.allowed = allowed_sets

        def __call__(self, batch: pa.Table) -> pa.Table:
            E = _normalize(_to_matrix(batch[self.emb_col]))
            ids = batch[self.id_col].to_pandas().to_numpy()
            cl = batch["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
            out = []
            for j, qid in enumerate(self.qids):
                mask = np.isin(cl, list(self.allowed[j]))
                if not mask.any():
                    continue
                S = E[mask] @ self.Q[j]
                kk = min(self.k, int(mask.sum()))
                rows = np.argpartition(-S, kk - 1)[:kk]
                out.append(
                    pd.DataFrame({"query_id": qid, self.id_col: ids[mask][rows], "score": S[rows]})
                )
            if not out:
                return pa.table(
                    {
                        "query_id": pa.array([], type=pa.int64()),
                        self.id_col: pa.array([], type=pa.int64()),
                        "score": pa.array([], type=pa.float64()),
                    }
                )
            return pa.Table.from_pandas(pd.concat(out), preserve_index=False)

    partials = pruned.map_batches(
        ClusterScorer,
        fn_constructor_kwargs=dict(
            queries_ref=qref, k=k, emb_col=emb_col, id_col=id_col, allowed_sets=allowed
        ),
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    return pa.Table.from_pandas(
        out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True),
        preserve_index=False,
    )


def ivf_topk(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    sample_size: int = 2000,
    seed: int = 42,
    concurrency: int = 4,
) -> pa.Table:
    """Approximate top-k: probe only the nprobe nearest centroids.
    Index-free single-pass variant (assigns per batch); prefer
    ``build_ivf_index`` + ``ivf_topk_indexed`` for repeated searches."""
    import ray

    sample = _to_matrix(
        pa.concat_tables(
            [pa.table(b) for b in ds.limit(sample_size).iter_batches(batch_format="pyarrow")]
        )[emb_col]
    )
    C = train_centroids(sample, n_clusters, seed=seed)
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probe = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (q, nprobe)
    allowed = [set(p) for p in probe]
    qref = ray.put({"qids": np.asarray(query_ids), "Q": Q})
    cref = ray.put(C)

    class ProbedScorer(_TopKScorer):
        def __init__(self, queries_ref, k, emb_col, id_col, centroids_ref, allowed_sets):
            super().__init__(queries_ref, k, emb_col, id_col, normalize=True)
            self.C = ray.get(centroids_ref) if isinstance(centroids_ref, ray.ObjectRef) else centroids_ref
            self.allowed = allowed_sets

        def __call__(self, batch: pa.Table) -> pa.Table:
            E = _normalize(_to_matrix(batch[self.emb_col]))
            ids = batch[self.id_col].to_pandas().to_numpy()
            assign = np.argmax(E @ self.C.T, axis=1)
            out = []
            for j, qid in enumerate(self.qids):
                mask = np.isin(assign, list(self.allowed[j]))
                if not mask.any():
                    continue
                S = E[mask] @ self.Q[j]
                kk = min(self.k, int(mask.sum()))
                rows = np.argpartition(-S, kk - 1)[:kk]
                out.append(
                    pd.DataFrame(
                        {"query_id": qid, self.id_col: ids[mask][rows], "score": S[rows]}
                    )
                )
            if not out:
                return pa.table(
                    {
                        "query_id": pa.array([], type=pa.int64()),
                        self.id_col: pa.array([], type=pa.int64()),
                        "score": pa.array([], type=pa.float64()),
                    }
                )
            return pa.Table.from_pandas(pd.concat(out), preserve_index=False)

    partials = ds.map_batches(
        ProbedScorer,
        fn_constructor_kwargs=dict(
            queries_ref=qref, k=k, emb_col=emb_col, id_col=id_col,
            centroids_ref=cref, allowed_sets=allowed,
        ),
        batch_format="pyarrow",
        concurrency=(1, concurrency),
    )

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["score", id_col], ascending=[False, True]).head(k).copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    out = partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")
    return pa.Table.from_pandas(
        out.to_pandas().sort_values(["query_id", "rank"]).reset_index(drop=True),
        preserve_index=False,
    )


def label_centroids(
    ds,
    *,
    emb_col: str = "embedding",
    label_col: str = "label",
    ndigits: int = 4,
) -> pa.Table:
    """Per-label mean embedding, emitted long-form as
    ``(label, dim, centroid, n_vecs)`` rows (dim is 1-based).

    100-TB shape: each batch collapses to at most
    ``n_labels_in_batch x dim`` partial-sum rows (label-cardinality-
    sized, never data-sized) inside ``map_batches``, so the only
    exchange is a groupby over (label, dim) — tiny for any realistic
    label set.  Sums run in float64; the mean is rounded to ``ndigits``
    so block-order float nondeterminism cannot reach the output (and a
    DuckDB ``avg`` oracle hash-matches despite a different summation
    order).  Labels are cast to int64 (Arrow dictionary/int32 inputs
    normalize to one key type across blocks); null labels raise — the
    int cast would silently fold NaN into INT64_MIN and invent a garbage
    centroid group (SQL oracles group NULL separately, so no silent
    convention matches both; filter or fill upstream)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch[emb_col])
        lab_arr = (
            batch[label_col].combine_chunks()
            if isinstance(batch[label_col], pa.ChunkedArray)
            else batch[label_col]
        )
        if lab_arr.null_count:
            raise ValueError(
                f"label_centroids: column {label_col!r} has "
                f"{lab_arr.null_count} null labels; filter or fill them upstream"
            )
        labels = np.asarray(lab_arr)
        if labels.dtype.kind == "f":
            # a float label column passes the Arrow null check with
            # NaN/inf payloads, and astype(int64) would silently fold
            # non-finite values to INT64_MIN — the garbage centroid group
            # the null guard exists to prevent.  Accept only finite
            # integral floats.
            if not np.isfinite(labels).all():
                raise ValueError(
                    f"label_centroids: column {label_col!r} has NaN/inf "
                    "labels; filter or fill them upstream"
                )
            if not np.array_equal(labels, np.trunc(labels)):
                raise ValueError(
                    f"label_centroids: column {label_col!r} has non-integer "
                    "float labels; cast to an integer type upstream"
                )
        elif labels.dtype.kind not in "iub":  # bool = integral 0/1 labels
            raise ValueError(
                f"label_centroids: column {label_col!r} has non-numeric "
                f"dtype {labels.dtype}; labels must be integers"
            )
        labels = labels.astype(np.int64)
        if m.size == 0:
            return pa.table(
                {
                    "label": pa.array([], type=pa.int64()),
                    "dim": pa.array([], type=pa.int64()),
                    "s_part": pa.array([], type=pa.float64()),
                    "n_part": pa.array([], type=pa.int64()),
                }
            )
        d = m.shape[1]
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                "label": np.repeat(uniq, d),
                "dim": np.tile(np.arange(1, d + 1, dtype=np.int64), len(uniq)),
                "s_part": sums.ravel(),
                "n_part": np.repeat(counts, d),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s_part", alias_name="s"), Sum("n_part", alias_name="n"))
        .to_pandas()  # label-cardinality x dim rows — dimension-sized
    )
    agg["centroid"] = (agg["s"] / agg["n"]).round(ndigits)
    agg["n_vecs"] = agg["n"].astype(np.int64)
    agg["label"] = agg["label"].astype(np.int64)
    agg["dim"] = agg["dim"].astype(np.int64)
    agg = agg.sort_values(["label", "dim"]).reset_index(drop=True)
    return pa.Table.from_pandas(
        agg[["label", "dim", "centroid", "n_vecs"]], preserve_index=False
    )
