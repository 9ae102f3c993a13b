"""TF-IDF term scoring over a document corpus — Ray-Data-first.

A training-data pipeline uses TF-IDF for keyword extraction, boilerplate
detection, and topic-drift monitoring.  The reference engine
(droberson/archbloom) has no corpus-statistics operators; this module is
engine-added (SURVEY.md §2.10), built from the same tokenizer as the
other text stages (``stages.text._tokens_of`` — mirrored in SQL by
``queries._sql_lower_tokens`` so the whole pipeline is oracle-checkable).

Distributed shape (the part that matters at 100 TB):

1. **Document frequencies** are a grouped count over per-document
   DISTINCT terms: each batch pre-aggregates its own (term → partial df)
   table, so the shuffle moves one row per distinct term per batch, never
   a row per token (``doc_frequencies``).
2. The resulting vocabulary is pruned (``min_df`` / ``max_vocab``) and
   **broadcast once** via ``ray.put`` as two parallel sorted arrays
   (terms, df) — a searchsorted lookup table, not a Python dict.  At web
   scale the pruned vocabulary (say top 1-10 M terms) is tens of MB:
   broadcast is the right join strategy, a term-shuffle join is not.
3. **Scoring streams**: one ``map_batches`` pass computes per-document
   term frequencies with a composite sort + run-length kernel (no Python
   loop over tokens), looks up df via searchsorted, and keeps each
   document's top-``k`` terms — output is O(k) per document regardless of
   document length.

Scores use the raw formula ``tf * ln(N / df)`` (natural-log IDF, no
smoothing — df ≥ 1 for every term actually present, so the log is always
finite and ≥ 0).  Outputs carry only integer/string columns (term, tf,
df, rank); the float score is internal, which keeps driver-side value
hashing robust.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

try:  # pragma: no cover
    import ray
    import ray.data  # noqa: F401
except ImportError:  # pragma: no cover
    ray = None

from .text import token_ngrams_flat

__all__ = ["doc_frequencies", "tfidf_top_terms", "tfidf_top_terms_sharded"]


def _unigrams(col) -> tuple[np.ndarray, np.ndarray]:
    """Lowercased whitespace unigrams of a string column as a numpy
    unicode array + parallel doc index, with the empty-string token a
    blank document splits to dropped (DuckDB's ``string_split_regex``
    produces the same [''] for blanks — the oracle filters it too)."""
    grams, doc_idx = token_ngrams_flat(col, 1)
    keep = np.asarray(pc.not_equal(grams, "")).astype(bool)
    terms = np.asarray(grams)[keep]
    if terms.dtype == object:
        terms = terms.astype("U")
    return terms, doc_idx[keep]


def doc_frequencies(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    *,
    min_df: int = 1,
) -> "ray.data.Dataset":
    """(term, df) — the number of documents containing each term.

    Per-batch pre-aggregation: the batch's (term, doc) pairs are
    deduplicated locally, so the grouped sum shuffles one partial row
    per distinct term per batch — token volume never crosses the wire.
    """
    from ..pipelines.relational import grouped_agg

    def partial(batch: pa.Table) -> pa.Table:
        terms, doc_idx = _unigrams(batch[text_col])
        if terms.size == 0:
            return pa.table({"term": pa.array([], type=pa.string()),
                             "partial_df": pa.array([], type=pa.int64())})
        # distinct (doc, term) then count docs per term — one composite
        # sort, two run-length passes
        order = np.lexsort((terms, doc_idx))
        t_s, d_s = terms[order], doc_idx[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])
        uniq_terms = t_s[first]
        t_order = np.argsort(uniq_terms, kind="stable")
        t_sorted = uniq_terms[t_order]
        t_first = np.ones(len(t_sorted), dtype=bool)
        if len(t_sorted) > 1:
            t_first[1:] = t_sorted[1:] != t_sorted[:-1]
        starts = np.flatnonzero(t_first)
        counts = np.diff(np.append(starts, len(t_sorted)))
        return pa.table({
            "term": pa.array(t_sorted[t_first]),
            "partial_df": pa.array(counts.astype(np.int64)),
        })

    df_ds = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["term"], [("df", "partial_df", "sum")])
    if min_df > 1:
        df_ds = df_ds.filter(expr=f"df >= {min_df}")
    return df_ds


def tfidf_top_terms(
    ds: "ray.data.Dataset",
    docs_again: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 3,
    n_docs: int | None = None,
    min_df: int = 1,
    max_vocab: int | None = None,
) -> "ray.data.Dataset":
    """Per-document top-``k`` terms by ``tf * ln(N/df)``, deterministic
    (score desc, term asc) tie-break.  ``ds`` supplies the corpus for the
    df statistics; ``docs_again`` is the (possibly filtered) document set
    to score — pass a fresh read of the same parquet so both sides
    stream independently.

    Returns a streaming Dataset of (id, rank, term, tf, df) rows with
    rank 1..k — O(k) output per document.  ``max_vocab``
    caps the broadcast vocabulary to the highest-df terms (ties broken
    by term asc) — the knob that bounds broadcast size at corpus scale;
    terms pruned from the vocabulary simply cannot be ranked.
    """
    from ..proc_cache import cached_instance

    if n_docs is None:
        n_docs = ds.count()

    df_rows = doc_frequencies(ds, text_col, min_df=min_df).take_all()
    vocab = np.array([r["term"] for r in df_rows], dtype="U")
    dfs = np.array([r["df"] for r in df_rows], dtype=np.int64)
    if max_vocab is not None and len(vocab) > max_vocab:
        sel = np.lexsort((vocab, -dfs))[:max_vocab]
        vocab, dfs = vocab[sel], dfs[sel]
    order = np.argsort(vocab, kind="stable")
    vocab, dfs = vocab[order], dfs[order]
    vocab_ref = ray.put((vocab, dfs))
    n_total = int(n_docs)

    def score(batch: pa.Table) -> pa.Table:
        vs, ds_arr = cached_instance(
            ("tfidf_vocab", vocab_ref.hex()), lambda: ray.get(vocab_ref))
        ids = batch[id_col].combine_chunks() if isinstance(
            batch[id_col], pa.ChunkedArray) else batch[id_col]
        terms, doc_idx = _unigrams(batch[text_col])
        empty = pa.table({
            id_col: pa.array([], type=ids.type),
            "rank": pa.array([], type=pa.int64()),
            "term": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64()),
            "df": pa.array([], type=pa.int64()),
        })
        if terms.size == 0:
            return empty
        # per-(doc, term) tf: composite sort + run-length
        o = np.lexsort((terms, doc_idx))
        t_s, d_s = terms[o], doc_idx[o]
        first = np.ones(len(o), dtype=bool)
        first[1:] = (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])
        starts = np.flatnonzero(first)
        tf = np.diff(np.append(starts, len(o))).astype(np.int64)
        u_terms, u_docs = t_s[first], d_s[first]
        # vocabulary lookup (terms below min_df / outside max_vocab drop)
        pos = np.searchsorted(vs, u_terms)
        pos_c = np.clip(pos, 0, max(len(vs) - 1, 0))
        hit = (vs[pos_c] == u_terms) if len(vs) else np.zeros(len(u_terms), bool)
        if not hit.any():
            return empty
        tf, u_terms, u_docs, pos_c = tf[hit], u_terms[hit], u_docs[hit], pos_c[hit]
        df_v = ds_arr[pos_c]
        # same float expression as the SQL oracle: tf * ln(N/df), one
        # IEEE division then one log then one multiply per value
        s = tf * np.log(np.float64(n_total) / df_v)
        # per-doc top-k: (doc asc, score desc, term asc), run boundaries
        o2 = np.lexsort((u_terms, -s, u_docs))
        d2 = u_docs[o2]
        run_first = np.ones(len(o2), dtype=bool)
        run_first[1:] = d2[1:] != d2[:-1]
        rank = np.arange(len(o2), dtype=np.int64) - np.maximum.accumulate(
            np.where(run_first, np.arange(len(o2), dtype=np.int64), 0)) + 1
        keep = rank <= k
        sel = o2[keep]
        return pa.table({
            id_col: ids.take(pa.array(u_docs[sel])),
            "rank": pa.array(rank[keep]),
            "term": pa.array(u_terms[sel]),
            "tf": pa.array(tf[sel]),
            "df": pa.array(df_v[sel]),
        })

    # streams: output is O(k) rows per scored document, never the token
    # stream — consume with write_parquet / take_all as appropriate
    return docs_again.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True)


def tfidf_top_terms_sharded(
    ds: "ray.data.Dataset",
    docs_again: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 3,
    n_docs: int | None = None,
    min_df: int = 1,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Term-hash-sharded TF-IDF scoring — the UNBOUNDED-vocabulary path
    (VERDICT r4 item 2): no driver-side vocabulary and no broadcast.

    Shape: one union shuffle routes BOTH the corpus's per-batch
    (term, partial_df) rows and the scored documents' distinct
    (term, id, tf) rows by term hash; each term-shard reducer sums its
    own terms' document frequencies and joins them onto the scoring
    rows in place (the vocabulary exists only as disjoint per-shard
    slices inside reducers — nothing O(vocab) ever sits on the driver
    or in a broadcast object); a second groupby re-keys by document
    and ranks top-``k`` with the same kernel, float expression
    (``tf * ln(N/df)``) and (score desc, term asc) tie-break as
    :func:`tfidf_top_terms`, so the two paths are output-identical.

    Traffic: shuffle 1 ships one partial-df row per distinct term per
    corpus batch + one row per distinct (scored-doc, term); shuffle 2
    ships only the scored rows again.  Prefer :func:`tfidf_top_terms`
    (broadcast vocab) while the pruned vocabulary is ~10⁷ terms or
    less; this path has no vocabulary ceiling.
    """
    from ..hashing import mmh3_64_batch

    if n_docs is None:
        n_docs = ds.count()
    n_total = int(n_docs)
    P = int(num_partitions)

    sch = docs_again.schema()
    id_type = getattr(sch, "base_schema", sch).field(id_col).type

    def _term_pk(terms: np.ndarray) -> np.ndarray:
        h = mmh3_64_batch(pa.array(terms)).astype(np.uint64)
        return (h % np.uint64(P)).astype(np.int32)

    def df_rows(batch: pa.Table) -> pa.Table:
        terms, doc_idx = _unigrams(batch[text_col])
        if terms.size == 0:
            m = 0
            u_terms = np.empty(0, dtype="U1")
            counts = np.empty(0, dtype=np.int64)
        else:
            order = np.lexsort((terms, doc_idx))
            t_s, d_s = terms[order], doc_idx[order]
            first = np.ones(len(order), dtype=bool)
            first[1:] = (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])
            uniq = np.sort(t_s[first], kind="stable")
            t_first = np.ones(len(uniq), dtype=bool)
            if len(uniq) > 1:
                t_first[1:] = uniq[1:] != uniq[:-1]
            starts = np.flatnonzero(t_first)
            counts = np.diff(np.append(starts, len(uniq))).astype(np.int64)
            u_terms = uniq[t_first]
            m = len(u_terms)
        return pa.table({
            "term": pa.array(u_terms),
            "side": pa.array(np.full(m, -1, dtype=np.int8)),
            id_col: pa.nulls(m, type=id_type),
            "tf": pa.array(np.zeros(m, dtype=np.int64)),
            "pdf": pa.array(counts),
            "pk": pa.array(_term_pk(u_terms)),
        })

    def score_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks() if isinstance(
            batch[id_col], pa.ChunkedArray) else batch[id_col]
        terms, doc_idx = _unigrams(batch[text_col])
        if terms.size == 0:
            return pa.table({
                "term": pa.array([], type=pa.string()),
                "side": pa.array([], type=pa.int8()),
                id_col: pa.array([], type=id_type),
                "tf": pa.array([], type=pa.int64()),
                "pdf": pa.array([], type=pa.int64()),
                "pk": pa.array([], type=pa.int32()),
            })
        o = np.lexsort((terms, doc_idx))
        t_s, d_s = terms[o], doc_idx[o]
        first = np.ones(len(o), dtype=bool)
        first[1:] = (t_s[1:] != t_s[:-1]) | (d_s[1:] != d_s[:-1])
        starts = np.flatnonzero(first)
        tf = np.diff(np.append(starts, len(o))).astype(np.int64)
        u_terms, u_docs = t_s[first], d_s[first]
        m = len(u_terms)
        return pa.table({
            "term": pa.array(u_terms),
            "side": pa.array(np.zeros(m, dtype=np.int8)),
            id_col: ids.take(pa.array(u_docs)),
            "tf": pa.array(tf),
            "pdf": pa.array(np.zeros(m, dtype=np.int64)),
            "pk": pa.array(_term_pk(u_terms)),
        })

    dfr = ds.map_batches(df_rows, batch_format="pyarrow", zero_copy_batch=True)
    scr = docs_again.map_batches(score_rows, batch_format="pyarrow",
                                 zero_copy_batch=True)

    def join_df(group: pa.Table) -> pa.Table:
        side = np.asarray(group["side"])
        is_df = side == -1
        d_terms = np.asarray(group["term"].filter(pa.array(is_df)))
        if d_terms.dtype == object:
            d_terms = d_terms.astype("U")
        pdf = np.asarray(group["pdf"].filter(pa.array(is_df)), dtype=np.int64)
        prows = group.filter(pa.array(~is_df))
        empty = pa.table({
            id_col: pa.array([], type=id_type),
            "term": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64()),
            "df": pa.array([], type=pa.int64()),
            "pk2": pa.array([], type=pa.int32()),
        })
        if len(prows) == 0 or len(d_terms) == 0:
            return empty
        # per-term df: sort + reduceat over the partials
        order = np.argsort(d_terms, kind="stable")
        t_sorted = d_terms[order]
        t_first = np.ones(len(t_sorted), dtype=bool)
        if len(t_sorted) > 1:
            t_first[1:] = t_sorted[1:] != t_sorted[:-1]
        starts = np.flatnonzero(t_first)
        dfs = np.add.reduceat(pdf[order], starts).astype(np.int64)
        u_terms = t_sorted[t_first]
        s_terms = np.asarray(prows["term"])
        if s_terms.dtype == object:
            s_terms = s_terms.astype("U")
        pos = np.clip(np.searchsorted(u_terms, s_terms), 0, len(u_terms) - 1)
        hit = u_terms[pos] == s_terms
        df_v = np.where(hit, dfs[pos], 0)
        keep = hit & (df_v >= min_df)
        if not keep.any():
            return empty
        kt = prows.filter(pa.array(keep))
        ids = (kt[id_col].combine_chunks()
               if isinstance(kt[id_col], pa.ChunkedArray) else kt[id_col])
        idh = mmh3_64_batch(_id_strs(ids)).astype(np.uint64)
        return pa.table({
            id_col: ids,
            "term": kt["term"],
            "tf": kt["tf"],
            "df": pa.array(df_v[keep]),
            "pk2": pa.array((idh % np.uint64(P)).astype(np.int32)),
        })

    def top_k(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col])
        if ids.dtype == object:
            ids = ids.astype("U")
        terms = np.asarray(group["term"])
        if terms.dtype == object:
            terms = terms.astype("U")
        tf = np.asarray(group["tf"], dtype=np.int64)
        df_v = np.asarray(group["df"], dtype=np.int64)
        s = tf * np.log(np.float64(n_total) / df_v)
        o2 = np.lexsort((terms, -s, ids))
        d2 = ids[o2]
        run_first = np.ones(len(o2), dtype=bool)
        run_first[1:] = d2[1:] != d2[:-1]
        rank = np.arange(len(o2), dtype=np.int64) - np.maximum.accumulate(
            np.where(run_first, np.arange(len(o2), dtype=np.int64), 0)) + 1
        keep = rank <= k
        sel = pa.array(o2[keep])
        return pa.table({
            id_col: group[id_col].take(sel),
            "rank": pa.array(rank[keep]),
            "term": group["term"].take(sel),
            "tf": group["tf"].take(sel),
            "df": group["df"].take(sel),
        })

    scored = (
        dfr.union(scr)
        .groupby("pk")
        .map_groups(join_df, batch_format="pyarrow")
    )
    return scored.groupby("pk2").map_groups(top_k, batch_format="pyarrow")


def _id_strs(arr) -> pa.Array:
    """String key form of an id column for hash routing — the shared
    helper in hashing.py."""
    from ..hashing import key_str_array

    return key_str_array(arr)


# ---------------------------------------------------------------------------
# BM25 ranked retrieval — fixed query-term set, two streaming scans
# ---------------------------------------------------------------------------

def bm25_topk(
    ds: "ray.data.Dataset",
    terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> "pa.Table":
    """Okapi BM25 top-``k`` documents for a fixed query-term set.

    Distributed shape: scan 1 reduces to a FEW SCALARS (doc count, total
    doc length, one df per query term — per-batch partial rows, summed on
    the driver: #blocks tiny rows, no shuffle); scan 2 streams scoring
    (re2 word-boundary tf counts, pure-vectorized formula) and keeps each
    block's local top-k, so the driver merges ≤ k·#blocks candidate rows.
    Nothing row-scale ever materializes.

    Determinism: idf values come from ``math.log`` (libm — the same ln a
    SQL engine calls), the per-row arithmetic is a fixed IEEE expression
    tree, and the returned score is the integer micro-score
    ``floor(score·1e6 + 0.5)`` so an oracle can reproduce the exact
    ranking bit-for-bit.  Ties break by ascending ``id_col``.
    """
    import math

    from .text import _RE2_WS, _WS_CHARS, _np

    pats = [r"\b" + t + r"\b" for t in terms]

    def _dl(col) -> np.ndarray:
        filled = pc.fill_null(col, "")
        trimmed = pc.utf8_trim(filled, _WS_CHARS)
        runs = _np(pc.count_substring_regex(trimmed, _RE2_WS)).astype(np.int64)
        nonempty = _np(pc.not_equal(filled, "")).astype(bool)
        return np.where(nonempty, runs + 1, 0)

    def stats_partial(batch: pa.Table) -> pa.Table:
        col = batch[text_col].combine_chunks()
        cols = {
            "n_docs": pa.array([len(col)], type=pa.int64()),
            "sum_dl": pa.array([int(_dl(col).sum())], type=pa.int64()),
        }
        for i, pat in enumerate(pats):
            tf = _np(pc.count_substring_regex(pc.fill_null(col, ""), pat))
            cols[f"df_{i}"] = pa.array([int((tf > 0).sum())], type=pa.int64())
        return pa.table(cols)

    stat_rows = ds.map_batches(
        stats_partial, batch_format="pyarrow", zero_copy_batch=True).take_all()
    n = sum(r["n_docs"] for r in stat_rows)
    if n == 0:
        return pa.table({"rank": pa.array([], type=pa.int64()),
                         id_col: pa.array([], type=pa.int64()),
                         "score_u": pa.array([], type=pa.int64())})
    sum_dl = sum(r["sum_dl"] for r in stat_rows)
    dfs = [sum(r[f"df_{i}"] for r in stat_rows) for i in range(len(terms))]
    avgdl = float(sum_dl) / n
    idfs = [math.log((n - df + 0.5) / (df + 0.5) + 1.0) for df in dfs]

    def score_block(batch: pa.Table) -> pa.Table:
        col = batch[text_col].combine_chunks()
        filled = pc.fill_null(col, "")
        dl = _dl(col).astype(np.float64)
        score = np.zeros(len(col), dtype=np.float64)
        denom_norm = k1 * ((1.0 - b) + b * dl / avgdl)
        for idf, pat in zip(idfs, pats):
            tf = _np(pc.count_substring_regex(filled, pat)).astype(np.float64)
            score = score + idf * (tf * (k1 + 1.0)) / (tf + denom_norm)
        score_u = np.floor(score * 1e6 + 0.5).astype(np.int64)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        top = np.lexsort((ids, -score_u))[:k]
        return pa.table({id_col: pa.array(ids[top]),
                         "score_u": pa.array(score_u[top])})

    cands = ds.map_batches(
        score_block, batch_format="pyarrow", zero_copy_batch=True).take_all()
    cands.sort(key=lambda r: (-r["score_u"], r[id_col]))
    cands = cands[:k]
    return pa.table({
        "rank": pa.array(np.arange(1, len(cands) + 1, dtype=np.int64)),
        id_col: pa.array([r[id_col] for r in cands], type=pa.int64()),
        "score_u": pa.array([r["score_u"] for r in cands], type=pa.int64()),
    })
