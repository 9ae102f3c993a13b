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

__all__ = ["dsir_weights"]


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
