"""Similarity search over embedding columns.

* ``knn_brute``: exact cosine top-k — per-batch matmul against a
  broadcast query matrix (``ray.put`` once), per-batch local top-k,
  tiny global merge.  The baseline and the verifier.
* ``knn_ivf``: IVF-style scale path — coarse centroids trained on a
  sample (driver-side k-means, seeded), vectors assigned to their
  nearest centroid per batch; queries probe only the closest
  ``n_probe`` cells.  Same partitioning idea as a 256-node deployment:
  the centroid id IS the shard key.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _as_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = np.asarray(arr.flatten() if hasattr(arr, "flatten") else arr.values, dtype=np.float64)
    return flat.reshape(len(arr), -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(norms == 0, 1, norms)


def knn_brute(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 4096,
) -> pa.Table:
    """Exact cosine top-k for each query row.

    Returns a table (query_idx, rank, id, cosine) — ranks are total
    order (cosine desc, id asc) so results are deterministic.
    """
    qn = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    nq = qn.shape[0]
    qref = ray.put(qn)

    from ..proc_cache import cached_instance

    def score(batch: pa.Table) -> pa.Table:
        # broadcast queries: object-store fetch once per worker process
        q = cached_instance(("knn_q", qref.hex()), lambda: ray.get(qref))
        m = _normalize(_as_matrix(batch[vec_col]))
        sims = m @ q.T  # (n, nq)
        n = m.shape[0]
        kk = min(k, n)
        ids = np.asarray(batch[id_col])
        out_q, out_id, out_sim = [], [], []
        for qi in range(q.shape[0]):
            # lexsort, not argpartition: ties at the k-th boundary must
            # resolve by id asc or the driver merge can lose the row the
            # (cos desc, id asc) total order keeps
            part = np.lexsort((ids, -sims[:, qi]))[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_id.append(ids[part])
            out_sim.append(sims[part, qi])
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id), type=batch[id_col].type),
                "cosine": pa.array(np.concatenate(out_sim), type=pa.float64()),
            }
        )

    partials = ds.map_batches(
        score,
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    ).take_all()  # ≤ nq·k rows per batch — tiny

    # global merge on the driver
    rows = {"query_idx": [], "rank": [], id_col: [], "cosine": []}
    by_q: dict[int, list] = {}
    for r in partials:
        by_q.setdefault(r["query_idx"], []).append((r["cosine"], r[id_col]))
    for qi in range(nq):
        cand = sorted(by_q.get(qi, []), key=lambda t: (-t[0], t[1]))[:k]
        for rank, (sim, vid) in enumerate(cand, 1):
            rows["query_idx"].append(qi)
            rows["rank"].append(rank)
            rows[id_col].append(vid)
            rows["cosine"].append(sim)
    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    return pa.table(
        {
            "query_idx": pa.array(rows["query_idx"], type=pa.int64()),
            "rank": pa.array(rows["rank"], type=pa.int64()),
            id_col: pa.array(rows[id_col], type=id_type),
            "cosine": pa.array(rows["cosine"], type=pa.float64()),
        }
    )


def train_centroids(sample: np.ndarray, n_centroids: int, *, iters: int = 10,
                    seed: int = 42) -> np.ndarray:
    """Seeded Lloyd k-means on (normalized) sample vectors — the IVF
    coarse quantizer.  Driver-side: the sample is small by design."""
    rng = np.random.default_rng(seed)
    s = _normalize(np.asarray(sample, dtype=np.float64))
    n_centroids = min(n_centroids, len(s))
    cent = s[rng.choice(len(s), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = (s @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            members = s[assign == c]
            if len(members):
                v = members.mean(axis=0)
                norm = np.linalg.norm(v)
                if norm > 0:
                    cent[c] = v / norm
    return cent


def knn_ivf(
    ds: "ray.data.Dataset",
    queries: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_centroids: int = 64,
    n_probe: int = 8,
    sample_size: int = 10_000,
    seed: int = 42,
    concurrency: int = 4,
) -> pa.Table:
    """Approximate cosine top-k: probe only the ``n_probe`` IVF cells
    nearest each query.  Returns the same schema as :func:`knn_brute`.

    At cluster scale the assignment stage writes per-cell partitions
    once and many query batches reuse them; here the cell filter runs
    inline per batch (vectors whose cell is probed by ≥1 query are
    scored, the rest are skipped — the matmul shrinks by ~n_probe/n_centroids).
    """
    sample = ds.limit(sample_size).take_all()
    sample.sort(key=lambda r: r[id_col])  # streaming order isn't stable
    sample_m = np.array([r[vec_col] for r in sample], dtype=np.float64)
    centroids = train_centroids(sample_m, n_centroids, seed=seed)

    qn = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe_cells = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]  # (nq, n_probe)
    probed_mask = np.zeros((qn.shape[0], len(centroids)), dtype=bool)
    for qi in range(qn.shape[0]):
        probed_mask[qi, probe_cells[qi]] = True
    qref = ray.put((qn, centroids, probed_mask))

    from ..proc_cache import cached_instance

    def score(batch: pa.Table) -> pa.Table:
        q, cent, mask = cached_instance(("ivf_q", qref.hex()), lambda: ray.get(qref))
        m = _normalize(_as_matrix(batch[vec_col]))
        ids = np.asarray(batch[id_col])
        cells = (m @ cent.T).argmax(axis=1)  # (n,)
        out_q, out_id, out_sim = [], [], []
        for qi in range(q.shape[0]):
            sel = mask[qi, cells]
            if not sel.any():
                continue
            sub = m[sel]
            sims = sub @ q[qi]
            kk = min(k, sub.shape[0])
            part = np.lexsort((ids[sel], -sims))[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_id.append(ids[sel][part])
            out_sim.append(sims[part])
        if not out_q:
            return pa.table(
                {
                    "query_idx": pa.array([], pa.int64()),
                    id_col: pa.array([], batch[id_col].type),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(out_q)),
                id_col: pa.array(np.concatenate(out_id), type=batch[id_col].type),
                "cosine": pa.array(np.concatenate(out_sim), type=pa.float64()),
            }
        )

    partials = ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    ).take_all()

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    rows_q, rows_rank, rows_id, rows_sim = [], [], [], []
    by_q: dict[int, list] = {}
    for r in partials:
        by_q.setdefault(r["query_idx"], []).append((r["cosine"], r[id_col]))
    for qi in range(qn.shape[0]):
        cand = sorted(by_q.get(qi, []), key=lambda t: (-t[0], t[1]))[:k]
        for rank, (sim, vid) in enumerate(cand, 1):
            rows_q.append(qi)
            rows_rank.append(rank)
            rows_id.append(vid)
            rows_sim.append(sim)
    return pa.table(
        {
            "query_idx": pa.array(rows_q, type=pa.int64()),
            "rank": pa.array(rows_rank, type=pa.int64()),
            id_col: pa.array(rows_id, type=id_type),
            "cosine": pa.array(rows_sim, type=pa.float64()),
        }
    )


# ---------------------------------------------------------------------------
# persisted IVF index — the cluster-scale ANN path
# ---------------------------------------------------------------------------

def build_ivf_index(
    ds: "ray.data.Dataset",
    index_path: str,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 64,
    sample_size: int = 10_000,
    seed: int = 42,
) -> np.ndarray:
    """Assign every vector to its coarse-quantizer cell and WRITE the
    corpus as hive-partitioned parquet (one ``cell=N/`` directory per
    cell) plus the trained centroids.  This is the scale path the
    inline :func:`knn_ivf` docstring promises: pay the assignment scan
    once, then every query batch reads ONLY its probed cells' files —
    pruning at the read, not after it.  The per-cell layout is also
    resumable output (a re-run skips finished partitions).  Returns
    the centroids."""
    sample = ds.limit(sample_size).take_all()
    sample.sort(key=lambda r: r[id_col])  # streaming order isn't stable
    sample_m = np.array([r[vec_col] for r in sample], dtype=np.float64)
    centroids = train_centroids(sample_m, n_centroids, seed=seed)
    cref = ray.put(centroids)

    from ..proc_cache import cached_instance

    def assign(batch: pa.Table) -> pa.Table:
        cent = cached_instance(("ivf_cent", cref.hex()), lambda: ray.get(cref))
        m = _normalize(_as_matrix(batch[vec_col]))
        cells = (m @ cent.T).argmax(axis=1).astype(np.int64)
        return batch.append_column("cell", pa.array(cells))

    ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True
                   ).write_parquet(index_path, partition_cols=["cell"])
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({
            "cell": pa.array(np.arange(len(centroids), dtype=np.int64)),
            "centroid": pa.array(list(centroids),
                                 type=pa.list_(pa.float64())),
        }),
        os.path.join(index_path, "_centroids.parquet"))
    return centroids


def query_ivf_index(
    index_path: str,
    queries: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_probe: int = 8,
) -> pa.Table:
    """Top-k over a persisted IVF index: load the (tiny) centroids,
    pick each query's ``n_probe`` nearest cells, and ``read_parquet``
    ONLY those cells' directories — the object store never sees the
    unprobed partitions.  Scoring semantics identical to the inline
    :func:`knn_ivf` (a vector counts for a query iff its cell is
    probed by that query), verified equal in tests."""
    import pyarrow.parquet as pq

    cent_tbl = pq.read_table(os.path.join(index_path, "_centroids.parquet"))
    order = np.argsort(np.asarray(cent_tbl["cell"]))
    centroids = np.array(cent_tbl["centroid"].to_pylist(),
                         dtype=np.float64)[order]

    qn = _normalize(np.atleast_2d(np.asarray(queries, dtype=np.float64)))
    probe_cells = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    probed_mask = np.zeros((qn.shape[0], len(centroids)), dtype=bool)
    for qi in range(qn.shape[0]):
        probed_mask[qi, probe_cells[qi]] = True
    union_cells = sorted(int(c) for c in np.unique(probe_cells))
    dirs = [os.path.join(index_path, f"cell={c}") for c in union_cells
            if os.path.isdir(os.path.join(index_path, f"cell={c}"))]
    files = [os.path.join(d, f) for d in dirs for f in sorted(os.listdir(d))
             if f.endswith(".parquet")]
    if not files:
        return pa.table({"query_idx": pa.array([], pa.int64()),
                         "rank": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})
    ds = ray.data.read_parquet(files, columns=[id_col, vec_col])
    qref = ray.put((qn, centroids, probed_mask))

    from ..proc_cache import cached_instance

    def score(batch: pa.Table) -> pa.Table:
        q, cent, mask = cached_instance(("ivf_q", qref.hex()),
                                        lambda: ray.get(qref))
        m = _normalize(_as_matrix(batch[vec_col]))
        ids = np.asarray(batch[id_col])
        cells = (m @ cent.T).argmax(axis=1)
        out_q, out_id, out_sim = [], [], []
        for qi in range(q.shape[0]):
            sel = mask[qi, cells]
            if not sel.any():
                continue
            sub = m[sel]
            sims = sub @ q[qi]
            kk = min(k, sub.shape[0])
            part = np.lexsort((ids[sel], -sims))[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_id.append(ids[sel][part])
            out_sim.append(sims[part])
        if not out_q:
            return pa.table({"query_idx": pa.array([], pa.int64()),
                             id_col: pa.array([], batch[id_col].type),
                             "cosine": pa.array([], pa.float64())})
        return pa.table({
            "query_idx": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id), type=batch[id_col].type),
            "cosine": pa.array(np.concatenate(out_sim), type=pa.float64()),
        })

    partials = ds.map_batches(score, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    by_q: dict[int, list] = {}
    for r in partials:
        by_q.setdefault(r["query_idx"], []).append((r["cosine"], r[id_col]))
    rows_q, rows_rank, rows_id, rows_sim = [], [], [], []
    for qi in range(qn.shape[0]):
        cand = sorted(by_q.get(qi, []), key=lambda t: (-t[0], t[1]))[:k]
        for rank, (sim, vid) in enumerate(cand, 1):
            rows_q.append(qi)
            rows_rank.append(rank)
            rows_id.append(vid)
            rows_sim.append(sim)
    return pa.table({
        "query_idx": pa.array(rows_q, type=pa.int64()),
        "rank": pa.array(rows_rank, type=pa.int64()),
        id_col: pa.array(rows_id, type=id_type),
        "cosine": pa.array(rows_sim, type=pa.float64()),
    })


def kmeans_fit(
    ds: "ray.data.Dataset",
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
) -> np.ndarray:
    """Fully DISTRIBUTED Lloyd k-means (Euclidean, raw vectors).

    Initialization is deterministic and RNG-free: the ``k`` vectors with
    the smallest ids (per-block bottom-k candidates → tiny driver
    merge — no global sort).  Each iteration is ONE streaming pass:
    every batch computes its local assignment (matmul against the
    broadcast centroids) and emits k partial ``(count, sum-vector)``
    rows, so the driver reduces k×(d+1) floats per block and the data
    itself never moves or shuffles.  Empty clusters keep their previous
    centroid.  Returns the (k, d) centroid matrix.
    """
    import ray as _ray

    # --- deterministic init: k smallest ids, no global sort
    def bottomk(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        take = np.argsort(ids, kind="stable")[:k]
        return batch.select([id_col, vec_col]).take(pa.array(take))

    cand = ds.map_batches(bottomk, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    cand.sort(key=lambda r: r[id_col])
    cent = np.asarray([r[vec_col] for r in cand[:k]], dtype=np.float64)
    k_eff = len(cent)

    for _ in range(iters):
        cent_ref = _ray.put(cent)

        def partials(batch: pa.Table, _ref=cent_ref) -> pa.Table:
            c = _ray.get(_ref) if isinstance(_ref, _ray.ObjectRef) else _ref
            x = _as_matrix(batch[vec_col]).astype(np.float64)
            # dist² = |x|² − 2x·c + |c|²; |x|² constant per row → drop
            scores = x @ c.T - 0.5 * (c * c).sum(axis=1)
            assign = scores.argmax(axis=1)
            cnt = np.bincount(assign, minlength=k_eff).astype(np.int64)
            sums = np.zeros((k_eff, x.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, x)
            return pa.table({
                "cid": pa.array(np.arange(k_eff, dtype=np.int64)),
                "cnt": pa.array(cnt),
                "vsum": pa.array(list(sums)),
            })

        rows = ds.map_batches(partials, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
        cnt = np.zeros(k_eff, dtype=np.int64)
        sums = np.zeros_like(cent)
        for r in rows:
            cnt[r["cid"]] += r["cnt"]
            sums[r["cid"]] += np.asarray(r["vsum"], dtype=np.float64)
        nz = cnt > 0
        cent[nz] = sums[nz] / cnt[nz, None]
    return cent


def nearest_centroid_exact(
    ds: "ray.data.Dataset",
    centroids_ds_rows: list[dict],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1024,
) -> "ray.data.Dataset":
    """Nearest-centroid assignment with EXACT integer distances: vectors
    and centroids are fixed-point quantized (``floor(x·scale + 0.5)``),
    so squared distances are integers computed without rounding (every
    intermediate < 2^53 is exactly representable) — the argmin and its
    cid tie-break are bit-reproducible in any engine, including SQL via
    ``list_inner_product`` over the same quantized lists.

    Output: one row per cluster — member count and member-id sum (both
    exact integers).  Broadcast centroids, zero shuffle beyond the tiny
    per-block partial rows.
    """
    from ..pipelines.relational import grouped_agg

    cmat = np.asarray([r[vec_col] for r in centroids_ds_rows], dtype=np.float64)
    cids = np.asarray([r[id_col] for r in centroids_ds_rows], dtype=np.int64)
    cq = np.floor(cmat * scale + 0.5)          # integer-valued doubles
    c_sq = (cq * cq).sum(axis=1)               # exact ints < 2^53

    def assign(batch: pa.Table) -> pa.Table:
        x = _as_matrix(batch[vec_col]).astype(np.float64)
        xq = np.floor(x * scale + 0.5)
        # dist² = |x|² − 2x·c + |c|² (all terms exact integers); |x|²
        # constant per row → compare −2x·c + |c|²
        d = c_sq[None, :] - 2.0 * (xq @ cq.T)
        best = d.argmin(axis=1)                # ties → lowest index = lowest cid order
        ids = np.asarray(batch[id_col], dtype=np.int64)
        cnt = np.bincount(best, minlength=len(cids)).astype(np.int64)
        idsum = np.zeros(len(cids), dtype=np.int64)
        np.add.at(idsum, best, ids)
        return pa.table({
            "cid": pa.array(cids),
            "n_members": pa.array(cnt),
            "sum_vec_id": pa.array(idsum),
        })

    out = ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_agg(out, ["cid"], [
        ("n_members", "n_members", "sum"),
        ("sum_vec_id", "sum_vec_id", "sum"),
    ]).filter(expr="n_members > 0")   # empty clusters: match SQL GROUP BY


def pca_fit(
    ds: "ray.data.Dataset",
    *,
    vec_col: str = "embedding",
    k: int = 8,
    batch_size: int = 4096,
) -> dict:
    """Distributed PCA via exact sufficient statistics: ONE streaming
    pass emits per-batch ``(n, Σx, XᵀX)`` partials — a d-vector and a
    d×d float64 matrix per block, never the data — summed on the driver
    (d is the embedding width, so the driver state is d² floats, not
    O(rows)).  Covariance eigendecomposition then yields the top-``k``
    components.  Returns ``{components (k, d), explained_variance (k,),
    mean (d,), n}`` with components sign-canonicalized (largest-|coef|
    entry positive) so results are deterministic across partitionings.
    """

    def partial(batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch[vec_col]).astype(np.float64)
        return pa.table({
            "n": pa.array([m.shape[0]], type=pa.int64()),
            "s": pa.array([m.sum(axis=0).tolist()],
                          type=pa.list_(pa.float64())),
            "ss": pa.array([(m.T @ m).ravel().tolist()],
                           type=pa.list_(pa.float64())),
        })

    parts = ds.map_batches(partial, batch_size=batch_size,
                           batch_format="pyarrow",
                           zero_copy_batch=True).take_all()
    n = sum(p["n"] for p in parts)
    if n < 2:
        raise ValueError("pca_fit needs at least 2 rows")
    s = np.sum([np.asarray(p["s"], dtype=np.float64) for p in parts], axis=0)
    d = len(s)
    ss = np.sum([np.asarray(p["ss"], dtype=np.float64).reshape(d, d)
                 for p in parts], axis=0)
    mean = s / n
    cov = (ss - n * np.outer(mean, mean)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)          # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T                    # (k, d)
    flip = np.sign(comps[np.arange(len(order)),
                         np.abs(comps).argmax(axis=1)])
    comps = comps * flip[:, None]
    return {"components": comps,
            "explained_variance": evals[order],
            "mean": mean, "n": int(n)}


def pca_transform(
    ds: "ray.data.Dataset",
    model: dict,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pc",
    batch_size: int = 4096,
) -> "ray.data.Dataset":
    """Project vectors onto a :func:`pca_fit` model — the (tiny) mean +
    components broadcast once via ``ray.put``, each batch is one
    matmul."""
    ref = ray.put((model["mean"], model["components"]))

    from ..proc_cache import cached_instance

    def project(batch: pa.Table) -> pa.Table:
        mean, comps = cached_instance(("pca", ref.hex()),
                                      lambda: ray.get(ref))
        m = _as_matrix(batch[vec_col]).astype(np.float64)
        z = (m - mean) @ comps.T
        return pa.table({
            id_col: batch[id_col],
            out_col: pa.array(list(z), type=pa.list_(pa.float64())),
        })

    return ds.map_batches(project, batch_size=batch_size,
                          batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# product quantization (PQ) — compressed-domain ANN
# ---------------------------------------------------------------------------

def pq_train(
    ds: "ray.data.Dataset",
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    sample_n: int = 2048,
    iters: int = 10,
    seed: int = 42,
) -> np.ndarray:
    """Train PQ codebooks (Jegou et al., "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011): split the vector into ``m``
    subvectors and k-means each subspace independently.

    Training runs on a DETERMINISTIC bounded sample — the ``sample_n``
    lowest-id vectors (per-block bottom-k candidates, tiny driver merge,
    no global sort) — so the codebooks are reproducible with no RNG over
    unordered streaming input.  Returns ``(m, k, d/m)`` float64.
    """
    def bottomn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        take = np.argsort(ids, kind="stable")[:sample_n]
        return batch.select([id_col, vec_col]).take(pa.array(take))

    cand = ds.map_batches(bottomn, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    cand.sort(key=lambda r: r[id_col])
    X = np.asarray([r[vec_col] for r in cand[:sample_n]], dtype=np.float64)
    n, d = X.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    k = min(k, n)
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        S = np.ascontiguousarray(X[:, j * dsub:(j + 1) * dsub])
        rng = np.random.default_rng(seed + j)
        cent = S[rng.choice(n, size=k, replace=False)].copy()
        for _ in range(iters):
            # sample-scale temporaries only (n × k × dsub on ≤ sample_n rows)
            d2 = ((S[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                members = S[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
        books[j] = cent
    return books


def pq_encode(
    ds: "ray.data.Dataset",
    codebooks: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "ray.data.Dataset":
    """Encode every vector to ``m`` uint8 codeword ids — a
    fixed-size-binary column of m bytes (64-dim float32 → 8 bytes:
    a 32× compression an ANN index at 100 TB actually needs).
    Codebooks broadcast once via ``ray.put`` + per-process cache."""
    from ..proc_cache import cached_instance

    ref = ray.put(np.ascontiguousarray(codebooks))
    m_, k_, dsub = codebooks.shape

    def enc(batch: pa.Table) -> pa.Table:
        books = cached_instance(("pq_books", ref.hex()), lambda: ray.get(ref))
        x = _as_matrix(batch[vec_col]).astype(np.float64)
        n = x.shape[0]
        codes = np.empty((n, m_), dtype=np.uint8)
        for j in range(m_):
            S = x[:, j * dsub:(j + 1) * dsub]
            # argmin dist² == argmax (s·c − |c|²/2); matmul, no n×k×d temp
            sc = S @ books[j].T - 0.5 * (books[j] ** 2).sum(axis=1)
            codes[:, j] = sc.argmax(axis=1)
        code_arr = pa.Array.from_buffers(
            pa.binary(m_), n, [None, pa.py_buffer(codes.tobytes())])
        return pa.table({id_col: batch[id_col], "code": code_arr})

    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)


def pq_adc_topk(
    codes_ds: "ray.data.Dataset",
    codebooks: np.ndarray,
    queries: np.ndarray,
    *,
    id_col: str = "vec_id",
    k: int = 10,
    batch_size: int = 65536,
) -> pa.Table:
    """Asymmetric-distance top-k over PQ codes: per query one (m, k')
    LUT of exact subvector distances, per batch a fancy-indexed
    gather-sum over the uint8 codes (no float vectors touched), local
    bottom-k per block, tiny driver merge — the ``knn_brute`` shape in
    the compressed domain.  Returns (query_idx, rank, id, dist2)."""
    from ..proc_cache import cached_instance

    q = np.atleast_2d(np.asarray(queries, dtype=np.float64))
    m_, k_, dsub = codebooks.shape
    nq = q.shape[0]
    lut = np.empty((nq, m_, k_), dtype=np.float64)
    for j in range(m_):
        diff = q[:, None, j * dsub:(j + 1) * dsub] - codebooks[j][None, :, :]
        lut[:, j, :] = (diff ** 2).sum(axis=2)
    lref = ray.put(lut)

    def score(batch: pa.Table) -> pa.Table:
        L = cached_instance(("pq_lut", lref.hex()), lambda: ray.get(lref))
        col = batch["code"].combine_chunks()
        n = len(col)
        codes = np.frombuffer(col.buffers()[1], dtype=np.uint8)[
            col.offset * m_: (col.offset + n) * m_].reshape(n, m_)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        kk = min(k, n)
        out_q, out_id, out_d = [], [], []
        cols_idx = np.arange(m_)[None, :]
        for qi in range(L.shape[0]):
            dist = L[qi][cols_idx, codes].sum(axis=1)
            part = np.lexsort((ids, dist))[:kk]
            out_q.append(np.full(kk, qi, dtype=np.int64))
            out_id.append(ids[part])
            out_d.append(dist[part])
        return pa.table({
            "query_idx": pa.array(np.concatenate(out_q)),
            id_col: pa.array(np.concatenate(out_id)),
            "dist2": pa.array(np.concatenate(out_d), type=pa.float64()),
        })

    partials = codes_ds.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=batch_size).take_all()
    by_q: dict[int, list] = {}
    for r in partials:
        by_q.setdefault(r["query_idx"], []).append((r["dist2"], r[id_col]))
    rows_q, rows_r, rows_i, rows_d = [], [], [], []
    for qi in range(nq):
        for rank, (d2, vid) in enumerate(
                sorted(by_q.get(qi, []))[:k], 1):
            rows_q.append(qi); rows_r.append(rank)
            rows_i.append(vid); rows_d.append(d2)
    return pa.table({
        "query_idx": pa.array(rows_q, type=pa.int64()),
        "rank": pa.array(rows_r, type=pa.int64()),
        id_col: pa.array(rows_i, type=pa.int64()),
        "dist2": pa.array(rows_d, type=pa.float64()),
    })


def pq_recall_gate(
    ds: "ray.data.Dataset",
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_queries: int = 8,
    k: int = 10,
    m: int = 8,
    n_codes: int = 16,
    threshold: float = 0.5,
) -> pa.Table:
    """End-to-end PQ certification: recall@k of ADC search vs EXACT L2
    top-k, both computed in ONE combined scan (each batch emits its
    local exact candidates AND its local ADC candidates; the driver
    merges ≤ 2·nq·k rows per block).  Queries are the ``n_queries``
    lowest-id vectors (deterministic).  Returns (query_id, recall_pct,
    pass) — with fixed seeds the whole computation is deterministic, so
    ``pass`` is a stable, oracle-checkable constant."""
    from ..proc_cache import cached_instance

    books = pq_train(ds, vec_col=vec_col, id_col=id_col, m=m, k=n_codes)
    m_, k_, dsub = books.shape

    def bottomq(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        take = np.argsort(ids, kind="stable")[:n_queries]
        return batch.select([id_col, vec_col]).take(pa.array(take))

    cand = ds.map_batches(bottomq, batch_format="pyarrow",
                          zero_copy_batch=True).take_all()
    cand.sort(key=lambda r: r[id_col])
    cand = cand[:n_queries]
    qids = np.asarray([r[id_col] for r in cand], dtype=np.int64)
    q = np.asarray([r[vec_col] for r in cand], dtype=np.float64)
    nq = q.shape[0]
    lut = np.empty((nq, m_, k_), dtype=np.float64)
    for j in range(m_):
        diff = q[:, None, j * dsub:(j + 1) * dsub] - books[j][None, :, :]
        lut[:, j, :] = (diff ** 2).sum(axis=2)
    pack = ray.put((books, lut, q))

    def both(batch: pa.Table) -> pa.Table:
        B, L, Q = cached_instance(("pq_gate", pack.hex()), lambda: ray.get(pack))
        x = _as_matrix(batch[vec_col]).astype(np.float64)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        n = x.shape[0]
        kk = min(k, n)
        codes = np.empty((n, m_), dtype=np.uint8)
        for j in range(m_):
            S = x[:, j * dsub:(j + 1) * dsub]
            sc = S @ B[j].T - 0.5 * (B[j] ** 2).sum(axis=1)
            codes[:, j] = sc.argmax(axis=1)
        # exact L2²: |x|² − 2x·q + |q|²
        xq = x @ Q.T
        x2 = (x * x).sum(axis=1)
        cols_idx = np.arange(m_)[None, :]
        out = {"query_idx": [], id_col: [], "dist2": [], "exact": []}
        for qi in range(Q.shape[0]):
            ex = x2 - 2.0 * xq[:, qi] + (Q[qi] * Q[qi]).sum()
            pe = np.lexsort((ids, ex))[:kk]
            ad = L[qi][cols_idx, codes].sum(axis=1)
            pa_ = np.lexsort((ids, ad))[:kk]
            out["query_idx"] += [np.full(kk, qi, np.int64)] * 2
            out[id_col] += [ids[pe], ids[pa_]]
            out["dist2"] += [ex[pe], ad[pa_]]
            out["exact"] += [np.ones(kk, bool), np.zeros(kk, bool)]
        return pa.table({
            "query_idx": pa.array(np.concatenate(out["query_idx"])),
            id_col: pa.array(np.concatenate(out[id_col])),
            "dist2": pa.array(np.concatenate(out["dist2"]), type=pa.float64()),
            "exact": pa.array(np.concatenate(out["exact"])),
        })

    partials = ds.map_batches(both, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    ex_by_q: dict[int, list] = {}
    ad_by_q: dict[int, list] = {}
    for r in partials:
        (ex_by_q if r["exact"] else ad_by_q).setdefault(
            r["query_idx"], []).append((r["dist2"], r[id_col]))
    rows_id, rows_rec, rows_pass = [], [], []
    for qi in range(nq):
        ex_ids = {v for _, v in sorted(ex_by_q.get(qi, []))[:k]}
        ad_ids = {v for _, v in sorted(ad_by_q.get(qi, []))[:k]}
        rec = len(ex_ids & ad_ids) / max(1, len(ex_ids))
        rows_id.append(int(qids[qi]))
        rows_rec.append(rec)
        rows_pass.append(rec >= threshold)
    return pa.table({
        "query_id": pa.array(rows_id, type=pa.int64()),
        "recall": pa.array(rows_rec, type=pa.float64()),
        "pass": pa.array(rows_pass, type=pa.bool_()),
    })
