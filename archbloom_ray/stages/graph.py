"""Graph analytics over edge tables — the link-structure family a
web-corpus pipeline needs (the reference has no graph operators; these
are engine-added, like the near-dup clustering in ``dedup.py``).

Design rules: nodes and edges are Datasets, never driver structures,
and NO Ray joins anywhere — Ray's hash join emits schema-less empty
blocks that break downstream column ops (see CLAUDE.md), and a
per-iteration join DAG deadlocked outright in a 4-CPU session.  Every
iteration is instead TWO coarse keyed shuffles in the house
``sessionize_count`` style (hash-bucket the key into ``num_partitions``
partitions, ONE vectorized ``map_groups`` call per partition, numpy
searchsorted/reduceat inside):

  scatter: edge rows and rank rows co-bucket on hash(src) — each
           partition looks up every edge's source rank with one
           searchsorted and emits (dst, rank // outdeg) contributions;
  gather:  contributions and per-node zero rows co-bucket on
           hash(dst) — each partition segment-sums with one
           ``np.add.reduceat`` (int64-exact; bincount's float64
           weights would lose exactness past 2^53).

Rank state is a node-sized Dataset materialized once per iteration
(bounded DAG depth + restartable lineage); edge/out-degree and zero
tables are materialized once and reused across iterations.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _bucket(keys: np.ndarray, num_partitions: int) -> np.ndarray:
    k = keys.astype(np.uint64)
    with np.errstate(over="ignore"):
        return ((k * _MIX) % np.uint64(num_partitions)).astype(np.int32)


def pagerank_int(
    nodes: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    *,
    node_col: str = "node",
    iters: int = 5,
    scale: int = 10**9,
    damp_num: int = 85,
    damp_den: int = 100,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Distributed PageRank in FIXED-POINT integer arithmetic — every
    operation is an int64 multiply / floor-divide / sum, so the result
    is bit-reproducible by any SQL engine (the ``bm25_topk`` integer
    micro-score principle applied to an iterative algorithm):

        r0(v)   = scale
        r_{t+1}(v) = (damp_num * sum_{(u,v) in E} (r_t(u) // outdeg(u)))
                     // damp_den
                     + ((damp_den - damp_num) * scale) // damp_den

    Dangling mass is dropped (nodes with no out-edges contribute
    nothing) and edges whose src is not in ``nodes`` are ignored,
    matching the plain formulation a SQL oracle mirrors with unrolled
    CTEs.

    Scale shape: see module docstring — per iteration exactly two
    keyed exchanges (hash(src) scatter, hash(dst) gather), each ONE
    vectorized map_groups call per coarse partition; contributions are
    (dst, int64) pairs, never rank-table copies.  int64 headroom: needs
    damp_num * (max in-flowing mass per node) < 2^63 — with the default
    scale=1e9 safe for any graph whose heaviest node gathers < ~1e8
    full-rank in-links.
    """
    tele = ((damp_den - damp_num) * scale) // damp_den
    P = num_partitions

    empty_scatter = pa.table({
        "k": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
        "od": pa.array([], pa.int64()), "r": pa.array([], pa.int64()),
        "_pkey": pa.array([], pa.int32()),
    })
    empty_gather = pa.table({
        node_col: pa.array([], pa.int64()),
        "c": pa.array([], pa.int64()),
        "_pkey": pa.array([], pa.int32()),
    })

    def prep_edges(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["src"], dtype=np.int64)
        n = len(src)
        return pa.table({
            "k": pa.array(src),
            "dst": pa.array(np.asarray(batch["dst"], dtype=np.int64)),
            "od": pa.array(np.zeros(n, dtype=np.int64)),  # filled below
            "r": pa.array(np.zeros(n, dtype=np.int64)),
            "_pkey": pa.array(_bucket(src, P)),
        })

    def attach_od(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return empty_scatter
        src = np.asarray(group["k"], dtype=np.int64)
        order = np.argsort(src, kind="stable")
        src_s = src[order]
        uniq, counts = np.unique(src_s, return_counts=True)
        od = counts[np.searchsorted(uniq, src)]
        return pa.table({
            "k": group["k"], "dst": group["dst"],
            "od": pa.array(od.astype(np.int64)), "r": group["r"],
            "_pkey": group["_pkey"],
        })

    edges_b = (
        edges.map_batches(prep_edges, batch_format="pyarrow",
                          zero_copy_batch=True)
        .groupby("_pkey")
        .map_groups(attach_od, batch_format="pyarrow")
        .materialize()
    )

    def init_ranks(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[node_col], dtype=np.int64)
        n = len(ids)
        return pa.table({
            "k": pa.array(ids),
            "dst": pa.array(np.zeros(n, dtype=np.int64)),
            "od": pa.array(np.zeros(n, dtype=np.int64)),  # 0 marks rank row
            "r": pa.array(np.full(n, scale, dtype=np.int64)),
            "_pkey": pa.array(_bucket(ids, P)),
        })

    def zero_rows(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[node_col], dtype=np.int64)
        return pa.table({
            node_col: pa.array(ids),
            "c": pa.array(np.zeros(len(ids), dtype=np.int64)),
            "_pkey": pa.array(_bucket(ids, P)),
        })

    ranks = nodes.map_batches(init_ranks, batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    zeros_b = nodes.map_batches(zero_rows, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    def scatter(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return empty_gather
        k = np.asarray(group["k"], dtype=np.int64)
        dst = np.asarray(group["dst"], dtype=np.int64)
        od = np.asarray(group["od"], dtype=np.int64)
        r = np.asarray(group["r"], dtype=np.int64)
        is_rank = od == 0
        rk, rv = k[is_rank], r[is_rank]
        order = np.argsort(rk, kind="stable")
        rk, rv = rk[order], rv[order]
        ek, ed, eod = k[~is_rank], dst[~is_rank], od[~is_rank]
        if len(ek) == 0 or len(rk) == 0:
            return empty_gather
        pos = np.searchsorted(rk, ek)
        pos_c = np.minimum(pos, len(rk) - 1)
        valid = rk[pos_c] == ek  # drop edges whose src has no node row
        ed, c = ed[valid], rv[pos_c[valid]] // eod[valid]
        return pa.table({
            node_col: pa.array(ed),
            "c": pa.array(c),
            "_pkey": pa.array(_bucket(ed, P)),
        })

    def gather(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return empty_scatter
        node = np.asarray(group[node_col], dtype=np.int64)
        c = np.asarray(group["c"], dtype=np.int64)
        order = np.argsort(node, kind="stable")
        node, c = node[order], c[order]
        starts = np.ones(len(node), dtype=bool)
        starts[1:] = node[1:] != node[:-1]
        idx = np.flatnonzero(starts)
        uniq = node[idx]
        s = np.add.reduceat(c, idx)
        r_new = (damp_num * s) // damp_den + tele
        n = len(uniq)
        return pa.table({
            "k": pa.array(uniq),
            "dst": pa.array(np.zeros(n, dtype=np.int64)),
            "od": pa.array(np.zeros(n, dtype=np.int64)),
            "r": pa.array(r_new),
            "_pkey": pa.array(_bucket(uniq, P)),
        })

    for _ in range(iters):
        contribs = (
            edges_b.union(ranks)
            .groupby("_pkey")
            .map_groups(scatter, batch_format="pyarrow")
        )
        # repartition: groupby emits one output block per INPUT block, so
        # without an explicit coalesce the per-round union compounds the
        # state's block count (measured: 2^rounds blocks, 20s/round by
        # round 8 at 500 rows) — bound it to num_partitions each round
        ranks = (
            contribs.union(zeros_b)
            .groupby("_pkey")
            .map_groups(gather, batch_format="pyarrow")
            .repartition(num_partitions)
            .materialize()
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({node_col: batch["k"], "rank_u": batch["r"]})

    return ranks.map_batches(rename, batch_format="pyarrow",
                             zero_copy_batch=True)


def label_propagation_min(
    nodes: "ray.data.Dataset",
    edges: "ray.data.Dataset",
    *,
    node_col: str = "node",
    iters: int = 8,
    num_partitions: int = 32,
) -> "ray.data.Dataset":
    """Fixed-iteration minimum-label propagation — the connected-
    components primitive:

        l0(v)   = v
        l_{t+1}(v) = min(l_t(v), min_{(u,v) in E} l_t(u))

    The iteration count is FIXED (not run-to-convergence), so the
    result is well-defined and SQL-mirrorable even when unconverged;
    for undirected components pass symmetrized edges and
    ``iters >= component diameter``, after which each node's label is
    its component's minimum node id.

    Same join-free scatter/gather shape as :func:`pagerank_int` (two
    coarse keyed shuffles per iteration, vectorized searchsorted /
    ``np.minimum.reduceat`` per partition); per-round label state is a
    node-sized materialized Dataset.  Simple propagation needs
    O(diameter) rounds — for high-diameter graphs prefer running it on
    a contracted graph (e.g. the near-dup pair graph in ``dedup.py``,
    whose components are tiny).  Returns ``{node_col, comp}``.
    """
    P = num_partitions

    empty_state = pa.table({
        "k": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
        "m": pa.array([], pa.int64()), "l": pa.array([], pa.int64()),
        "_pkey": pa.array([], pa.int32()),
    })
    empty_contrib = pa.table({
        node_col: pa.array([], pa.int64()),
        "l": pa.array([], pa.int64()),
        "_pkey": pa.array([], pa.int32()),
    })

    def prep_edges(batch: pa.Table) -> pa.Table:
        src = np.asarray(batch["src"], dtype=np.int64)
        n = len(src)
        return pa.table({
            "k": pa.array(src),
            "dst": pa.array(np.asarray(batch["dst"], dtype=np.int64)),
            "m": pa.array(np.ones(n, dtype=np.int64)),
            "l": pa.array(np.zeros(n, dtype=np.int64)),
            "_pkey": pa.array(_bucket(src, P)),
        })

    edges_b = edges.map_batches(prep_edges, batch_format="pyarrow",
                                zero_copy_batch=True).materialize()

    def init_labels(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[node_col], dtype=np.int64)
        n = len(ids)
        return pa.table({
            "k": pa.array(ids),
            "dst": pa.array(np.zeros(n, dtype=np.int64)),
            "m": pa.array(np.zeros(n, dtype=np.int64)),
            "l": pa.array(ids),
            "_pkey": pa.array(_bucket(ids, P)),
        })

    labels = nodes.map_batches(init_labels, batch_format="pyarrow",
                               zero_copy_batch=True).materialize()

    def scatter_min(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return empty_contrib
        k = np.asarray(group["k"], dtype=np.int64)
        dst = np.asarray(group["dst"], dtype=np.int64)
        m = np.asarray(group["m"], dtype=np.int64)
        lab = np.asarray(group["l"], dtype=np.int64)
        is_lab = m == 0
        lk, lv = k[is_lab], lab[is_lab]
        order = np.argsort(lk, kind="stable")
        lk, lv = lk[order], lv[order]
        ek, ed = k[~is_lab], dst[~is_lab]
        if len(ek) == 0 or len(lk) == 0:
            return empty_contrib
        pos = np.searchsorted(lk, ek)
        pos_c = np.minimum(pos, len(lk) - 1)
        valid = lk[pos_c] == ek
        ed, c = ed[valid], lv[pos_c[valid]]
        return pa.table({
            node_col: pa.array(ed),
            "l": pa.array(c),
            "_pkey": pa.array(_bucket(ed, P)),
        })

    def to_self(batch: pa.Table) -> pa.Table:
        return pa.table({
            node_col: batch["k"], "l": batch["l"], "_pkey": batch["_pkey"],
        })

    def gather_min(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return empty_state
        node = np.asarray(group[node_col], dtype=np.int64)
        lab = np.asarray(group["l"], dtype=np.int64)
        order = np.argsort(node, kind="stable")
        node, lab = node[order], lab[order]
        starts = np.ones(len(node), dtype=bool)
        starts[1:] = node[1:] != node[:-1]
        idx = np.flatnonzero(starts)
        uniq = node[idx]
        l_new = np.minimum.reduceat(lab, idx)
        n = len(uniq)
        return pa.table({
            "k": pa.array(uniq),
            "dst": pa.array(np.zeros(n, dtype=np.int64)),
            "m": pa.array(np.zeros(n, dtype=np.int64)),
            "l": pa.array(l_new),
            "_pkey": pa.array(_bucket(uniq, P)),
        })

    for _ in range(iters):
        contribs = (
            edges_b.union(labels)
            .groupby("_pkey")
            .map_groups(scatter_min, batch_format="pyarrow")
        )
        self_rows = labels.map_batches(to_self, batch_format="pyarrow",
                                       zero_copy_batch=True)
        # repartition: see pagerank_int — without the coalesce the label
        # state doubles its block count every round (self_rows + contribs
        # each carry the previous round's blocks) and per-round cost
        # grows exponentially
        labels = (
            contribs.union(self_rows)
            .groupby("_pkey")
            .map_groups(gather_min, batch_format="pyarrow")
            .repartition(num_partitions)
            .materialize()
        )

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({node_col: batch["k"], "comp": batch["l"]})

    return labels.map_batches(rename, batch_format="pyarrow",
                              zero_copy_batch=True)


def triangle_count(
    edges: "ray.data.Dataset",
    *,
    num_partitions: int = 32,
) -> int:
    """EXACT distributed triangle count of an undirected simple graph
    (input edges may be directed/duplicated/self-looped — they are
    oriented ``min(u,v) < max(u,v)``, self-loops dropped, and
    de-duplicated globally first).

    Two-round compact-forward shape, join-free:

      round A — bucket oriented edges by ``hash(src)`` (so all of a
        node's out-edges co-locate AND (src,dst) dedup within the
        bucket is global), then per partition: composite lexsort +
        dedup, and for every node emit its wedge candidates
        {(v,w): v<w neighbors} with fully vectorized repeat/arange
        pair generation (no Python loop over nodes).  Each triangle
        {a<b<c} is generated exactly once, as the wedge (b,c) at its
        minimum vertex a.
      round B — wedges and deduped edges co-bucket on
        ``hash(v) ^ mix(w)``; per partition one composite searchsorted
        membership test counts wedges that close.

    Wedge volume is sum(d*(d-1)/2) over oriented out-degrees — skew
    warning: a hub of oriented degree d emits d^2/2 candidates; at
    web scale cap/split hub adjacency lists (orienting low-id→high-id
    already bounds d by the count of HIGHER-id neighbors, the standard
    compact-forward mitigation).  Returns the exact count (the only
    driver-side value is the final int sum).
    """
    P = num_partitions
    MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)

    def pair_bucket(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        ua = a.astype(np.uint64)
        ub = b.astype(np.uint64)
        with np.errstate(over="ignore"):
            h = ua * _MIX + ub * MIX2
            return (h % np.uint64(P)).astype(np.int32)

    def orient(batch: pa.Table) -> pa.Table:
        u = np.asarray(batch["src"], dtype=np.int64)
        v = np.asarray(batch["dst"], dtype=np.int64)
        keep = u != v
        u, v = u[keep], v[keep]
        a, b = np.minimum(u, v), np.maximum(u, v)
        return pa.table({
            "a": pa.array(a), "b": pa.array(b),
            "_pkey": pa.array(_bucket(a, P)),
        })

    def wedges_and_edges(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "x": pa.array([], pa.int64()), "y": pa.array([], pa.int64()),
            "m": pa.array([], pa.int64()), "_pkey": pa.array([], pa.int32()),
        })
        if len(group) == 0:
            return empty
        a = np.asarray(group["a"], dtype=np.int64)
        b = np.asarray(group["b"], dtype=np.int64)
        order = np.lexsort((b, a))
        a, b = a[order], b[order]
        dup = np.zeros(len(a), dtype=bool)
        dup[1:] = (a[1:] == a[:-1]) & (b[1:] == b[:-1])
        a, b = a[~dup], b[~dup]
        # per-node neighbor segments (a sorted, b sorted within)
        starts = np.ones(len(a), dtype=bool)
        starts[1:] = a[1:] != a[:-1]
        seg_id = np.cumsum(starts) - 1
        seg_start = np.flatnonzero(starts)
        deg = np.diff(np.append(seg_start, len(a)))
        # vectorized wedge pairs: for each edge i (the "first" leg),
        # pair b[i] with every LATER neighbor of the same node
        rank_in_seg = np.arange(len(a)) - seg_start[seg_id]
        n_after = deg[seg_id] - rank_in_seg - 1
        first = np.repeat(np.arange(len(a)), n_after)
        # offset within the repeated block: 1..n_after
        csum = np.concatenate(([0], np.cumsum(n_after)))
        offs = np.arange(len(first)) - csum[first] + 1
        second = first + offs
        wx, wy = b[first], b[second]  # v<w by within-segment sort
        ex, ey = a, b
        return pa.table({
            "x": pa.array(np.concatenate([wx, ex])),
            "y": pa.array(np.concatenate([wy, ey])),
            "m": pa.array(np.concatenate([
                np.zeros(len(wx), dtype=np.int64),
                np.ones(len(ex), dtype=np.int64)])),
            "_pkey": pa.array(np.concatenate([
                pair_bucket(wx, wy), pair_bucket(ex, ey)])),
        })

    def close_count(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({"c": pa.array([], pa.int64())})
        x = np.asarray(group["x"], dtype=np.int64)
        y = np.asarray(group["y"], dtype=np.int64)
        m = np.asarray(group["m"], dtype=np.int64)
        is_e = m == 1
        ex, ey = x[is_e], y[is_e]
        wx, wy = x[~is_e], y[~is_e]
        if len(ex) == 0 or len(wx) == 0:
            return pa.table({"c": pa.array([0], pa.int64())})
        order = np.lexsort((ey, ex))
        ex, ey = ex[order], ey[order]
        pos = np.searchsorted(ex * (2**32) + ey, wx * (2**32) + wy)
        key_e = ex * (2**32) + ey
        key_w = wx * (2**32) + wy
        pos_c = np.minimum(pos, len(key_e) - 1)
        hits = int(np.count_nonzero(key_e[pos_c] == key_w))
        return pa.table({"c": pa.array([hits], pa.int64())})

    oriented = edges.map_batches(orient, batch_format="pyarrow",
                                 zero_copy_batch=True)
    mixed = oriented.groupby("_pkey").map_groups(
        wedges_and_edges, batch_format="pyarrow")
    partials = mixed.groupby("_pkey").map_groups(
        close_count, batch_format="pyarrow")
    total = partials.sum("c")
    return int(total) if total is not None else 0


def cooccurrence_pairs(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    k: int = 50,
) -> pa.Table:
    """Term co-occurrence graph: the top-``k`` unordered pairs of
    distinct lowercased tokens by the number of DOCUMENTS containing
    both — the corpus-analysis edge list behind collocation mining and
    topic seeding.

    Per batch: one Arrow sort dedupes (doc, token); within-doc i<j
    pairs generate from pure index arithmetic (repeat/arange over run
    lengths — no Python per doc); an in-batch ``group_by`` pre-combines
    counts before the ONE keyed exchange; the global top-k comes from
    per-block local top-k + a driver merge (no all-to-all sort).  Pair
    volume is Σ m_d(m_d−1)/2 over per-doc distinct-term counts — fine
    for page-sized documents; at 100 TB restrict the token space first
    (broadcast vocabulary filter or a document term cap) before the
    quadratic step.  Token strings compare in UTF-8 byte order ==
    DuckDB binary collation, so ``t1 < t2`` and the tie-break match
    SQL exactly.
    """
    import pyarrow.compute as pc

    from ..pipelines.relational import grouped_agg, topk_rows
    from .text import _tokens_of

    def pairs(batch: pa.Table) -> pa.Table:
        empty = pa.table({"t1": pa.array([], pa.string()),
                          "t2": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        trimmed, toks = _tokens_of(batch[text_col].combine_chunks())
        flat = pc.utf8_lower(toks.flatten())
        n_tok = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        if int(n_tok.sum()) == 0:
            return empty
        doc_of = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        tbl = pa.table({"d": pa.array(doc_of), "w": flat})
        idx = pc.sort_indices(tbl, sort_keys=[("d", "ascending"),
                                              ("w", "ascending")])
        idx_np = np.asarray(idx, dtype=np.int64)
        d_s = doc_of[idx_np]
        w_s = flat.take(idx)
        first = np.ones(d_s.size, dtype=bool)
        keepmask = pc.or_(
            pa.array(d_s[1:] != d_s[:-1]),
            pc.not_equal(w_s.slice(1), w_s.slice(0, len(w_s) - 1)))
        first[1:] = np.asarray(keepmask, dtype=bool)
        d_u = d_s[first]
        w_u = w_s.filter(pa.array(first))
        # per-doc distinct counts and within-doc positions
        uniq_docs, m = np.unique(d_u, return_counts=True)
        offs = np.concatenate(([0], np.cumsum(m)))
        pos = np.arange(d_u.size, dtype=np.int64) - np.repeat(offs[:-1], m)
        reps = np.repeat(m, m) - pos - 1          # pairs led by each row
        total = int(reps.sum())
        if total == 0:
            return empty
        a_idx = np.repeat(np.arange(d_u.size, dtype=np.int64), reps)
        run_start = np.concatenate(([0], np.cumsum(reps)))
        b_off = np.arange(total, dtype=np.int64) - np.repeat(run_start[:-1],
                                                             reps)
        b_idx = a_idx + 1 + b_off
        g = pa.table({
            "t1": w_u.take(pa.array(a_idx)),
            "t2": w_u.take(pa.array(b_idx)),
        }).group_by(["t1", "t2"]).aggregate([([], "count_all")])
        return g.rename_columns(["t1", "t2", "c"])

    counted = grouped_agg(
        ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
        ["t1", "t2"], [("n_docs", "c", "sum")])
    return topk_rows(counted, [("n_docs", "descending"), ("t1", "ascending"),
                               ("t2", "ascending")], k)
