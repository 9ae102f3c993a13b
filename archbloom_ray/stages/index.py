"""Persisted inverted index + boolean term search — Ray-Data-first.

A web-scale corpus wants keyword retrieval without rescanning text:
build posting lists once, then answer term queries by reading ONLY the
shards that can contain the query terms.  The reference engine has no
IR operators; this module is engine-added (SURVEY.md §2.10) and
complements ``stages.tfidf.bm25_topk`` (which rescans text per query)
with the classic build-once index.

Distributed shape (the part that matters at 100 TB):

1. **Build is one streaming pass**: each batch tokenizes its documents
   (same lowercased-whitespace tokenizer as every text stage —
   ``stages.tfidf._unigrams`` ↔ ``queries._sql_lower_tokens``), dedups
   (term, doc) pairs in-batch, tags each pair with
   ``shard = mmh3(term) % num_shards`` and hive-partition-writes — the
   posting store is partitioned BY TERM HASH, so all of one term's
   postings co-locate.  Each doc_id appears on exactly one input row,
   so in-batch dedup is global dedup; nothing shuffles besides the
   write itself, and the per-shard layout is resumable output.
2. **Query prunes at the read**: hash the query terms with the same
   function, ``read_parquet`` only their shards' directories, filter
   rows to the terms, then resolve AND/OR with a grouped
   distinct-term count per doc (AND ⇔ count == n_terms) — posting
   lists never materialize on the driver.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

try:  # pragma: no cover
    import ray
    import ray.data  # noqa: F401
except ImportError:  # pragma: no cover
    ray = None

from ..hashing import mmh3_128_batch
from .text import _BIGRAM_SEP, token_ngrams_flat
from .tfidf import _unigrams

__all__ = ["build_inverted_index", "query_inverted_index", "query_phrase"]


def _shards_of(terms: np.ndarray, num_shards: int) -> np.ndarray:
    """Term → shard via the engine's murmur3 (identical build/query)."""
    h1, _ = mmh3_128_batch(pa.array(terms.astype("U"), type=pa.string()))
    return (h1 % np.uint64(num_shards)).astype(np.int64)


def build_inverted_index(
    ds: "ray.data.Dataset",
    index_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_shards: int = 32,
    ngram: int = 1,
) -> None:
    """One scan of the corpus → hive-partitioned posting store
    (``shard=N/`` directories of distinct ``(term, doc_id)`` rows).
    With ``ngram > 1`` the terms are word n-grams (sep ``'\\x1f'``,
    same as every bigram stage) — an exact-phrase index."""

    def pairs(batch: pa.Table) -> pa.Table:
        if ngram == 1:
            terms, doc_idx = _unigrams(batch[text_col])
        else:
            grams, doc_idx = token_ngrams_flat(batch[text_col], ngram)
            terms = np.asarray(grams)
            if terms.dtype == object:
                terms = terms.astype("U")
        empty = pa.table({"term": pa.array([], pa.string()),
                          id_col: pa.array([], pa.int64()),
                          "shard": pa.array([], pa.int64())})
        if terms.size == 0:
            return empty
        ids = np.asarray(batch[id_col], dtype=np.int64)[doc_idx]
        order = np.lexsort((ids, terms))
        t, d = terms[order], ids[order]
        first = np.ones(len(t), dtype=bool)
        first[1:] = (t[1:] != t[:-1]) | (d[1:] != d[:-1])
        t, d = t[first], d[first]
        return pa.table({
            "term": pa.array(t, type=pa.string()),
            id_col: pa.array(d, type=pa.int64()),
            "shard": pa.array(_shards_of(t, num_shards)),
        })

    ds.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True
                   ).write_parquet(index_path, partition_cols=["shard"])
    # self-describing store: queries validate/default against this (the
    # leading underscore keeps it invisible to parquet readers)
    with open(os.path.join(index_path, "_meta.json"), "w") as f:
        json.dump({"num_shards": num_shards, "ngram": ngram,
                   "id_col": id_col}, f)


def _load_meta(index_path: str) -> dict | None:
    p = os.path.join(index_path, "_meta.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def query_inverted_index(
    index_path: str,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    mode: str = "and",
    num_shards: int | None = None,
) -> "ray.data.Dataset":
    """Boolean term search over a persisted index: read ONLY the query
    terms' shards, filter to the terms, and resolve ``and``/``or`` with
    a grouped distinct-term count per doc.  Returns ``{id_col}`` rows.
    ``num_shards`` defaults from the store's ``_meta.json`` and raises
    on a mismatch (a wrong shard count would silently miss postings).
    """
    if mode not in ("and", "or"):
        raise ValueError("mode must be 'and' or 'or'")
    if not terms:
        raise ValueError("terms must be non-empty")
    meta = _load_meta(index_path)
    if meta is not None:
        if num_shards is not None and num_shards != meta["num_shards"]:
            raise ValueError(
                f"index was built with num_shards={meta['num_shards']}, "
                f"got {num_shards}")
        num_shards = meta["num_shards"]
    elif num_shards is None:
        num_shards = 32
    uterms = np.unique(np.asarray(terms, dtype="U"))
    shard_ids = sorted(int(s) for s in np.unique(_shards_of(uterms, num_shards)))
    dirs = [os.path.join(index_path, f"shard={s}") for s in shard_ids]
    files = [os.path.join(d, f) for d in dirs
             if os.path.isdir(d) for f in sorted(os.listdir(d))
             if f.endswith(".parquet")]
    if not files:
        return ray.data.from_arrow(pa.table({id_col: pa.array([], pa.int64())}))
    term_set = pa.array(uterms.tolist(), type=pa.string())
    needed = len(uterms)

    def hits(batch: pa.Table) -> pa.Table:
        keep = batch.filter(pc.is_in(batch["term"], value_set=term_set))
        return keep.select([id_col, "term"])

    from ..pipelines.relational import grouped_agg

    matched = (
        ray.data.read_parquet(files, columns=["term", id_col])
        .map_batches(hits, batch_format="pyarrow", zero_copy_batch=True)
    )
    # postings are distinct (term, doc) rows, so count == distinct count
    counts = grouped_agg(matched, [id_col], [("n_terms", None, "count")])
    if mode == "and":
        counts = counts.filter(expr=f"n_terms >= {needed}")
    return counts.select_columns([id_col])


def query_phrase(
    index_path: str,
    phrase_tokens: list[str],
    *,
    id_col: str = "doc_id",
    num_shards: int | None = None,
    ngram: int | None = None,
) -> "ray.data.Dataset":
    """Exact-phrase search over an ``ngram``-term index: a phrase of
    exactly ``ngram`` tokens is ONE index term (sep-joined), so the
    lookup is a single pruned posting read — position lists are never
    needed.  (Longer phrases would AND their sliding n-grams, which is
    the standard necessary-condition prefilter; this engine keeps the
    exact case.)"""
    meta = _load_meta(index_path)
    if meta is not None:
        if ngram is not None and ngram != meta["ngram"]:
            raise ValueError(
                f"index was built with ngram={meta['ngram']}, got {ngram}")
        ngram = meta["ngram"]
    elif ngram is None:
        ngram = 2
    if len(phrase_tokens) != ngram:
        raise ValueError(
            f"phrase has {len(phrase_tokens)} tokens but the index terms "
            f"are {ngram}-grams — it cannot match")
    term = _BIGRAM_SEP.join(t.lower() for t in phrase_tokens)
    return query_inverted_index(index_path, [term], id_col=id_col,
                                mode="and", num_shards=num_shards)
