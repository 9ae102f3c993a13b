"""Data selection via importance resampling (DSIR, Xie et al. 2023).

DSIR picks pre-training documents whose feature distribution looks
like a small TARGET corpus rather than the RAW crawl: estimate two
smoothed feature distributions (target p, raw q), weight every raw
document by ``sum_f count_f(doc) * log(p_f / q_f)`` and resample the
top of the weight order.  The published formulation hashes n-grams
into a fixed bucket space; :func:`dsir_weights` implements both that
hashed variant (``buckets=B`` — the 100-TB path, count table bounded
by B) and an exact unigram-vocabulary variant (``buckets=None``) whose
per-term log-ratio is an IEEE expression a SQL engine reproduces
bit-for-bit, making the whole selection DuckDB-oracle-checkable (the
``bigram_lm_scores`` integer micro-log-prob precedent).

Scale shape (mirrors ``stages.text.bigram_lm_scores``): the corpus
explodes to token/bucket rows twice (count pass + score pass — no
materialized intermediate); feature counts flow through ONE keyed
pre-combined shuffle; the three global totals (raw mass, target mass,
vocabulary size) are driver scalars; scoring is ONE large-large hash
join of token rows against the count table followed by a per-doc
grouped integer sum — order-independent, partitioning-invariant.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["dsir_weights", "kcenter_select", "train_linear_classifier"]


def kcenter_select(
    ds: "ray.data.Dataset",
    vec_col: str,
    id_col: str,
    k: int,
) -> pa.Table:
    """Greedy k-center (farthest-point) diversity selection over an
    embedding column — the coverage-maximizing counterpart of
    importance resampling (Sener & Savarese 2018 coreset shape): each
    round adds the point farthest (squared L2) from the chosen set.

    Fully deterministic: the seed is the minimum id, every argmax
    tie-breaks by minimum id, and per-point distances are fixed-order
    float expressions — so the selection is partition- and
    run-invariant (asserted in pytest against a brute-force oracle).

    Distributed shape: the candidate set stays a Dataset; each of the
    k-1 rounds is ONE map_batches pass that (a) updates the running
    min-distance-to-set with the single NEWEST center (broadcast in
    the task closure — O(kn) total distance work, not O(k²n)) and
    (b) pre-reduces to a per-batch champion row; only O(blocks)
    champion rows reach the driver per round.  State is re-materialized
    once per round (bounded DAG depth, restartable lineage), the
    standard iterative-refinement layout shared with k-means and
    PageRank here.

    Returns a k-row table ``(rank, id, dist_sq)`` where ``dist_sq`` is
    the squared distance to the previously selected set (0 for the
    seed).
    """

    def with_dist(center_vec: np.ndarray | None):
        def fn(batch: pa.Table) -> pa.Table:
            from .similarity import _as_matrix

            ids = np.asarray(batch[id_col], dtype=np.int64)
            if center_vec is None:
                d = np.full(len(ids), np.inf)
            else:
                vecs = _as_matrix(batch[vec_col])
                prev = np.asarray(batch["dmin"], dtype=np.float64)
                diff = vecs - center_vec[None, :]
                d = np.minimum(prev, np.einsum("ij,ij->i", diff, diff))
            out = pa.table({
                id_col: pa.array(ids),
                vec_col: batch[vec_col],
                "dmin": pa.array(d),
            })
            return out

        return fn

    def champion(exclude: np.ndarray):
        # exclude the ALREADY-CHOSEN ids inside the batch pass: with
        # exact-duplicate vectors an unchosen dmin-0 point must still
        # be eligible (brute-force greedy picks it), and the chosen
        # point itself would otherwise shadow it as the batch champion
        def fn(batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col], dtype=np.int64)
            keep = ~np.isin(ids, exclude, assume_unique=False)
            if not keep.any():
                return pa.table({id_col: pa.array([], pa.int64()),
                                 vec_col: batch[vec_col].slice(0, 0),
                                 "dmin": pa.array([], pa.float64())})
            batch = batch.filter(pa.array(keep))
            ids = ids[keep]
            d = np.asarray(batch["dmin"], dtype=np.float64)
            best = np.lexsort((ids, -d))[0]
            return batch.take(pa.array([int(best)]))

        return fn

    # deterministic seed: the minimum id (one tiny pre-reduced pass)
    def min_id(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        j = int(np.argmin(ids)) if ids.size else 0
        return batch.take(pa.array([j])) if ids.size else batch

    seed_rows = ds.map_batches(min_id, batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
    if not seed_rows:
        return pa.table({"rank": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "dist_sq": pa.array([], pa.float64())})
    seed = min(seed_rows, key=lambda r: r[id_col])
    chosen = [(0, int(seed[id_col]), 0.0)]
    center = np.asarray(seed[vec_col], dtype=np.float64)
    chosen_ids = {int(seed[id_col])}

    state = ds.map_batches(with_dist(None), batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    for rank in range(1, int(k)):
        state = state.map_batches(with_dist(center), batch_format="pyarrow",
                                  zero_copy_batch=True).materialize()
        excl = np.array(sorted(chosen_ids), dtype=np.int64)
        cands = state.map_batches(champion(excl), batch_format="pyarrow",
                                  zero_copy_batch=True).take_all()
        if not cands:
            break
        best = max(cands, key=lambda r: (r["dmin"], -int(r[id_col])))
        chosen.append((rank, int(best[id_col]), float(best["dmin"])))
        chosen_ids.add(int(best[id_col]))
        center = np.asarray(best[vec_col], dtype=np.float64)

    return pa.table({
        "rank": pa.array([c[0] for c in chosen], pa.int64()),
        id_col: pa.array([c[1] for c in chosen], pa.int64()),
        "dist_sq": pa.array([c[2] for c in chosen], pa.float64()),
    })


def _trunc_div(a: int, b: int) -> int:
    """Truncating integer division (toward zero) on exact Python ints —
    the semantics of DuckDB's BIGINT ``//`` (measured: -7//2 = -3),
    unlike Python/numpy floor division."""
    q = abs(a) // b
    return q if a >= 0 else -q


def train_linear_classifier(
    ds: "ray.data.Dataset",
    feature_cols: list[str],
    label_col: str,
    *,
    iters: int = 3,
    lr_den: int = 10,
    scale: int = 1_000_000,
) -> dict:
    """Distributed full-batch gradient-descent training of a linear
    probability classifier — the trainable quality-filter shape of a
    curation pipeline (cf. the GaussianNB UDAF, which is closed-form).

    Link function is the ALGEBRAIC sigmoid ``s(z) = 0.5 + z / (2*(1+|z|))``
    rather than the logistic ``1/(1+exp(-z))``: libm ``exp`` is NOT
    bit-portable (DuckDB and numpy differ by 1-2 ULP on this host —
    measured — and one ULP at a floor boundary flips an integer), while
    the algebraic form is a fixed tree of single correctly-rounded IEEE
    ops, so the whole K-iteration training run is bit-reproducible in
    any engine.  The update is the usual ``(p - y)·x`` rule with every
    per-document contribution quantized to integer micro-units
    (``floor(scale·(p-y)·x_j + 0.5)``) before summation — gradient
    sums are order-independent int64, weights live in micro-units, and
    the learning-rate step is exact truncating integer division
    ``g_j // (lr_den·n)``.

    Distributed shape: each of the K iterations is ONE pre-combined
    map_batches pass emitting a single partial-gradient row per batch
    (F int64 scalars); the driver reduces O(batches) tiny rows, updates
    F weights, and the next pass broadcasts them in the task closure —
    the honest full-batch GD layout (no parameter server needed for a
    linear model).  A final pass counts correct predictions with a pure
    integer dot-product sign test.

    Features and labels must be exact small integers (quantize upstream);
    per-doc gradient magnitudes must stay below 2^53 for the SQL mirror
    (documents × scale × |feature| — holds to ~10^9 docs per group).

    Returns ``{"weights": [w_0..w_F-1] (micro-units), "n_correct": int,
    "n": int}``.
    """
    F = len(feature_cols)
    w = [0] * F

    def grad_pass(weights: tuple[int, ...]):
        warr = np.array(weights, dtype=np.int64)

        def fn(batch: pa.Table) -> pa.Table:
            X = np.stack([np.asarray(batch[c], dtype=np.int64)
                          for c in feature_cols], axis=1)
            y = np.asarray(batch[label_col], dtype=np.float64)
            z = (X @ warr).astype(np.float64) / float(scale)
            p = 0.5 + z / (2.0 * (1.0 + np.abs(z)))
            resid = p - y
            cols = {
                f"g{j}": pa.array([int(np.floor(
                    scale * resid * X[:, j] + 0.5).astype(np.int64).sum())],
                    type=pa.int64())
                for j in range(F)
            }
            cols["n"] = pa.array([len(batch)], type=pa.int64())
            return pa.table(cols)

        return fn

    n_total = 0
    for _ in range(int(iters)):
        parts = ds.map_batches(grad_pass(tuple(w)), batch_format="pyarrow",
                               zero_copy_batch=True).take_all()
        g = [sum(r[f"g{j}"] for r in parts) for j in range(F)]
        n_total = sum(r["n"] for r in parts)
        if n_total == 0:
            return {"weights": w, "n_correct": 0, "n": 0}
        w = [w[j] - _trunc_div(g[j], lr_den * n_total) for j in range(F)]

    warr = np.array(w, dtype=np.int64)

    def correct(batch: pa.Table) -> pa.Table:
        X = np.stack([np.asarray(batch[c], dtype=np.int64)
                      for c in feature_cols], axis=1)
        y = np.asarray(batch[label_col], dtype=np.int64)
        pred = ((X @ warr) >= 0).astype(np.int64)
        return pa.table({"c": pa.array([int((pred == y).sum())], pa.int64())})

    n_correct = sum(r["c"] for r in ds.map_batches(
        correct, batch_format="pyarrow", zero_copy_batch=True).take_all())
    return {"weights": w, "n_correct": int(n_correct), "n": int(n_total)}


def dsir_weights(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    target_col: str,
    *,
    scale: int = 1_000_000,
    buckets: int | None = None,
) -> "ray.data.Dataset":
    """Per-document DSIR importance weights.

    ``target_col`` is a 0/1 int column marking the target-domain rows
    (both distributions come from the same scan: raw = every doc,
    target = flagged docs).  Features are lowercased whitespace
    unigrams (``buckets=None``, exact / SQL-mirrorable) or their
    ``mmh3_64 % buckets`` hash buckets (the paper's bounded feature
    space for unbounded vocabularies).  With add-one smoothing over a
    vocabulary of V features, each token occurrence of feature f
    contributes the integer micro-log-ratio::

        floor(scale * ln(((ct_f + 1.0) * (CR + V))
                         / ((cr_f + 1.0) * (CT + V))) + 0.5)

    (ct/cr = target/raw occurrence counts of f, CT/CR = total target/
    raw token masses) — every operand is an exactly-representable
    integer and the expression tree is fixed, so numpy and DuckDB agree
    bit-for-bit and the per-doc sum is an order-independent int64.

    Returns one row per document with >=1 token:
    ``(id, sum_logw_u, n_toks)``; higher = more target-like.
    """
    from ..hashing import mmh3_64_batch
    from ..pipelines.relational import grouped_agg, hash_join
    from .text import _tokens_of

    def explode(batch: pa.Table) -> pa.Table:
        trimmed, toks = _tokens_of(batch[text_col].combine_chunks())
        flat = pc.utf8_lower(toks.flatten())
        n_tok = np.asarray(pc.list_value_length(toks), dtype=np.int64)
        doc_of = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        ids = np.asarray(batch[id_col], dtype=np.int64)[doc_of]
        is_t = np.asarray(batch[target_col], dtype=np.int64)[doc_of]
        if buckets is not None:
            w = pa.array(
                (mmh3_64_batch(flat) % np.uint64(int(buckets))).astype(np.int64))
        else:
            w = flat
        return pa.table({id_col: pa.array(ids), "w": w,
                         "is_t": pa.array(is_t)})

    tok = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["w"]).aggregate([([], "count_all"),
                                             ("is_t", "sum")])
        return g.rename_columns(["w", "cr", "ct"])

    counts = grouped_agg(
        tok.map_batches(partial_counts, batch_format="pyarrow",
                        zero_copy_batch=True),
        ["w"], [("cr", "cr", "sum"), ("ct", "ct", "sum")])

    def tot_partial(batch: pa.Table) -> pa.Table:
        return pa.table({
            "cr": pa.array([pc.sum(batch["cr"]).as_py() or 0], pa.int64()),
            "ct": pa.array([pc.sum(batch["ct"]).as_py() or 0], pa.int64()),
            "v": pa.array([len(batch)], pa.int64()),
        })

    tots = counts.map_batches(tot_partial, batch_format="pyarrow",
                              zero_copy_batch=True).take_all()
    CR = float(sum(r["cr"] for r in tots))
    CT = float(sum(r["ct"] for r in tots))
    V = float(sum(r["v"] for r in tots))

    joined = hash_join(tok.drop_columns(["is_t"]), counts, on="w")

    def score(batch: pa.Table) -> pa.Table:
        ct = np.asarray(batch["ct"], dtype=np.float64)
        cr = np.asarray(batch["cr"], dtype=np.float64)
        lp = np.floor(scale * np.log(((ct + 1.0) * (CR + V))
                                     / ((cr + 1.0) * (CT + V))) + 0.5
                      ).astype(np.int64)
        return pa.table({id_col: batch[id_col], "lp": pa.array(lp)})

    scored = joined.map_batches(score, batch_format="pyarrow",
                                zero_copy_batch=True)
    return grouped_agg(scored, [id_col], [
        ("sum_logw_u", "lp", "sum"),
        ("n_toks", None, "count"),
    ])
