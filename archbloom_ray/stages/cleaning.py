"""Corpus-cleaning operators for web-scale training-data pipelines.

Two classic pre-training cleanup passes the dedup family did not yet
cover, both exact (SQL-oracle-checkable end to end):

* :func:`duplicate_spans` — the detection half of exact-substring
  dedup (Lee et al. 2021, "Deduplicating Training Data Makes Language
  Models Better"): for every document, how many of its sliding word
  n-gram windows also occur in at least one OTHER document.  The
  suffix-array formulation does not distribute; the standard
  cluster-scale equivalent is the window-hash exchange implemented
  here (hash every window, count distinct documents per window hash,
  charge duplicated windows back to their documents).

* :func:`boilerplate_segments` — C4-style boilerplate removal by
  in-domain frequency: a fixed-width word segment that appears in
  ``min_docs``-or-more distinct documents of the SAME source (nav
  bars, cookie banners, footers) is stripped from every document.

Both run over Arrow batches with no per-row Python in the hot path,
and shuffle only 64-bit hashes + small integer counts — never text.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["duplicate_spans", "boilerplate_segments",
           "remove_duplicate_spans"]


def duplicate_spans(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    n: int = 5,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Per-document duplicated-window counts: ``(id, n_windows,
    n_dup_windows)`` where a window is one of the doc's sliding
    lowercased word ``n``-grams and it counts as duplicated iff the
    same n-gram occurs in >= 2 DISTINCT documents corpus-wide.
    Documents with fewer than ``n`` tokens emit no row (they have no
    windows) — mirroring the SQL ``WHERE len(tk) >= n`` oracle.

    Scale shape (the honest lower bound for corpus-wide substring
    dedup): each batch reduces its windows to distinct ``(hash64,
    doc, occurrences)`` rows before the exchange, so the all-to-all
    volume is the distinct-window mass, not the token stream and
    never the text.  One hash-keyed partition groupby resolves
    distinct-doc counts per window hash with a vectorized segmented
    scan (a document lives in exactly one input row/batch, so
    ``(hash, doc)`` rows are globally unique and the distinct-doc
    count of a hash is just its segment length); per-doc totals ride
    the same unified exchange as pass-through partials keyed by doc
    id, and a final tiny keyed ``grouped_agg`` sums both counters.
    Identical n-grams collide on 64-bit mmh3 only with ~2^-64
    probability per pair — the standard trade of hash-based substring
    dedup at scale.
    """
    from ..pipelines.relational import grouped_agg
    from .text import token_window_hash64

    P = int(num_partitions)
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def rows(batch: pa.Table) -> pa.Table:
        col = batch[text_col].combine_chunks()
        ids = np.asarray(batch[id_col], dtype=np.int64)
        # window IDENTITY only → hash tokens once + positional window
        # mix (token_window_hash64): no gram-string column, no
        # long-string hash passes — same 2^-64 collision contract
        h, doc_idx = token_window_hash64(col, n)
        tot = np.bincount(doc_idx, minlength=len(col)).astype(np.int64)
        present = np.flatnonzero(tot > 0)
        if len(h):
            # distinct (hash, doc) with occurrence count, in one sort
            order = np.lexsort((h, doc_idx))
            hs, dsx = h[order], doc_idx[order]
            first = np.ones(hs.size, dtype=bool)
            first[1:] = (hs[1:] != hs[:-1]) | (dsx[1:] != dsx[:-1])
            starts = np.flatnonzero(first)
            occ = np.diff(np.append(starts, hs.size)).astype(np.int64)
            hu, du = hs[starts], dsx[starts]
        else:
            hu = np.empty(0, np.uint64)
            du = np.empty(0, np.int64)
            occ = np.empty(0, np.int64)
        with np.errstate(over="ignore"):
            pk_h = ((hu * GOLD) % np.uint64(P)).astype(np.int32)
            pk_t = ((ids[present].astype(np.uint64) * GOLD)
                    % np.uint64(P)).astype(np.int32)
        return pa.table({
            "pkey": pa.array(np.concatenate([pk_h, pk_t])),
            "h": pa.array(np.concatenate(
                [hu.view(np.int64), np.zeros(present.size, np.int64)])),
            "doc": pa.array(np.concatenate([ids[du], ids[present]])),
            "cnt": pa.array(np.concatenate([occ, tot[present]])),
            "kind": pa.array(np.concatenate(
                [np.ones(hu.size, np.int8), np.zeros(present.size, np.int8)])),
        })

    def close_partition(group: pa.Table) -> pa.Table:
        kind = np.asarray(group["kind"], dtype=np.int8)
        doc = np.asarray(group["doc"], dtype=np.int64)
        cnt = np.asarray(group["cnt"], dtype=np.int64)
        out_doc = [doc[kind == 0]]
        out_wins = [cnt[kind == 0]]
        out_dups = [np.zeros(int((kind == 0).sum()), np.int64)]
        span = np.flatnonzero(kind == 1)
        if span.size:
            h = np.asarray(group["h"], dtype=np.int64)[span]
            d, c = doc[span], cnt[span]
            order = np.argsort(h, kind="stable")
            hs, ds_, cs = h[order], d[order], c[order]
            bound = np.ones(hs.size, dtype=bool)
            bound[1:] = hs[1:] != hs[:-1]
            seg_start = np.flatnonzero(bound)
            seg_len = np.diff(np.append(seg_start, hs.size))
            dup_rows = np.repeat(seg_len >= 2, seg_len)
            if dup_rows.any():
                dd, dc = ds_[dup_rows], cs[dup_rows]
                uq, inv = np.unique(dd, return_inverse=True)
                sums = np.zeros(uq.size, np.int64)
                np.add.at(sums, inv, dc)
                out_doc.append(uq)
                out_wins.append(np.zeros(uq.size, np.int64))
                out_dups.append(sums)
        return pa.table({
            "doc": pa.array(np.concatenate(out_doc)),
            "wins": pa.array(np.concatenate(out_wins)),
            "dups": pa.array(np.concatenate(out_dups)),
        })

    partials = (
        ds.map_batches(rows, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("pkey")
        .map_groups(close_partition, batch_format="pyarrow")
    )
    summed = grouped_agg(partials, ["doc"], [
        ("n_windows", "wins", "sum"),
        ("n_dup_windows", "dups", "sum"),
    ])

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch["doc"].cast(pa.int64()),
            "n_windows": batch["n_windows"].cast(pa.int64()),
            "n_dup_windows": batch["n_dup_windows"].cast(pa.int64()),
        })

    return summed.map_batches(rename, batch_format="pyarrow",
                              zero_copy_batch=True)


def _segments_of(batch: pa.Table, text_col: str, group_col: str,
                 W: int, sep: str, key_sep: str):
    """Vectorized non-overlapping W-word segmentation of a batch.

    Returns ``(segs, keyed, doc_rep, n_seg)``: the segment strings,
    the segment||key_sep||source strings (the in-domain identity a
    segment is counted under; == ``segs`` when ``group_col`` is
    None), the doc ordinal of each segment and the per-doc segment
    counts.  Same zero-copy shape as
    ``dedup.paragraph_explode`` (new ListArray offsets over the ONE
    flat word buffer, one ``binary_join``) — no per-row Python.
    """
    col = pc.fill_null(batch[text_col].combine_chunks(), "")
    words = pc.split_pattern(col, " ")
    n_words = np.asarray(pc.list_value_length(words), dtype=np.int64)
    flat = words.flatten()
    n_seg = -(-n_words // W)
    total = int(n_seg.sum())
    if total == 0:
        empty = pa.array([], type=pa.string())
        return empty, empty, np.empty(0, np.int64), n_seg
    doc_rep = np.repeat(np.arange(len(n_words)), n_seg)
    pos = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(n_seg)))[:-1], n_seg)
    base = np.concatenate(([0], np.cumsum(n_words)))
    starts = base[doc_rep] + pos * W
    ends = np.minimum(starts + W, base[doc_rep] + n_words[doc_rep])
    offsets = np.empty(total + 1, dtype=np.int64)
    offsets[0] = starts[0]
    offsets[1:] = ends
    seg_list = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                        flat)
    segs = pc.binary_join(seg_list, sep)
    if group_col is None:
        return segs, segs, doc_rep, n_seg
    src = batch[group_col].combine_chunks().take(pa.array(doc_rep))
    keyed = pc.binary_join_element_wise(segs, src, key_sep)
    return segs, keyed, doc_rep, n_seg


def boilerplate_segments(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    group_col: str,
    *,
    words_per_seg: int = 3,
    min_docs: int = 2,
    sep: str = " ",
) -> "ray.data.Dataset":
    """C4-style boilerplate removal: split every document into
    non-overlapping ``words_per_seg``-word segments (the synthetic
    corpus has no newlines — real crawls would split on lines); a
    segment is boilerplate iff it occurs in >= ``min_docs`` DISTINCT
    documents sharing the same ``group_col`` (source/domain).  Returns
    one row per document: ``(id, n_segs, n_boiler, text_clean)`` with
    ``text_clean`` the in-order join of surviving segments (NULL when
    every segment was boilerplate, matching SQL ``string_agg`` over an
    empty set).

    Two passes over the corpus, zero text shuffled:

    1. *Vocabulary build*: per batch, segments reduce to distinct
       ``hash64(segment \\x1e source) -> doc`` rows; a keyed
       ``grouped_agg`` count yields each (source, segment)'s
       distinct-doc frequency, and hashes at/above ``min_docs``
       collect to the driver.  Boilerplate is frequency-thresholded
       by construction, so this vocabulary is small (nav bars and
       banners, not the corpus) — the same bounded-broadcast argument
       as decontamination's benchmark side.
    2. *Scrub*: the vocabulary broadcasts via ``ray.put`` once; each
       batch recomputes its segment hashes locally, drops members
       (one ``np.isin``), and reassembles surviving segments per doc
       zero-copy (offset-sliced ListArray + ``binary_join``).
    """
    import ray as _ray

    from ..hashing import mmh3_64_batch
    from ..pipelines.relational import grouped_agg

    W = int(words_per_seg)
    KEY_SEP = "\x1e"

    def vocab_rows(batch: pa.Table) -> pa.Table:
        _, keyed, doc_rep, _ = _segments_of(batch, text_col, group_col,
                                            W, sep, KEY_SEP)
        if len(keyed) == 0:
            return pa.table({"h": pa.array([], pa.int64()),
                             "doc": pa.array([], pa.int64())})
        h = mmh3_64_batch(keyed).astype(np.uint64)
        order = np.lexsort((h, doc_rep))
        hs, dr = h[order], doc_rep[order]
        first = np.ones(hs.size, dtype=bool)
        first[1:] = (hs[1:] != hs[:-1]) | (dr[1:] != dr[:-1])
        ids = np.asarray(batch[id_col], dtype=np.int64)
        return pa.table({"h": pa.array(hs[first].view(np.int64)),
                         "doc": pa.array(ids[dr[first]])})

    freq = grouped_agg(
        ds.map_batches(vocab_rows, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["h"], [("n_docs", None, "count")],
    ).filter(expr=f"n_docs >= {int(min_docs)}")
    boiler = np.sort(np.array(
        [r["h"] for r in freq.select_columns(["h"]).take_all()],
        dtype=np.int64))
    boiler_ref = _ray.put(boiler)

    def scrub(batch: pa.Table) -> pa.Table:
        vocab = _ray.get(boiler_ref)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        n_docs = len(ids)
        segs, keyed, doc_rep, n_seg = _segments_of(
            batch, text_col, group_col, W, sep, KEY_SEP)
        if len(keyed) == 0:
            return pa.table({
                id_col: pa.array(ids),
                "n_segs": pa.array(np.zeros(n_docs, np.int64)),
                "n_boiler": pa.array(np.zeros(n_docs, np.int64)),
                "text_clean": pa.nulls(n_docs, type=pa.string()),
            })
        bad = np.isin(mmh3_64_batch(keyed).view(np.int64), vocab)
        n_boiler = np.bincount(doc_rep[bad], minlength=n_docs).astype(np.int64)
        keep = ~bad
        kept = segs.filter(pa.array(keep))
        kept_per_doc = np.bincount(doc_rep[keep], minlength=n_docs)
        kept_offs = np.concatenate(
            ([0], np.cumsum(kept_per_doc))).astype(np.int32)
        doc_list = pa.ListArray.from_arrays(pa.array(kept_offs), kept)
        text_clean = pc.if_else(
            pa.array(kept_per_doc > 0), pc.binary_join(doc_list, sep),
            pa.nulls(n_docs, type=pa.string()))
        return pa.table({
            id_col: pa.array(ids),
            "n_segs": pa.array(n_seg),
            "n_boiler": pa.array(n_boiler),
            "text_clean": text_clean,
        })

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)


def remove_duplicate_spans(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    n: int = 5,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """The REMOVAL half of exact-substring dedup (Lee et al. 2021):
    every sliding ``n``-token window occurring in >= 2 distinct
    documents marks its token range; a document's covered ranges merge
    (interval union) and the covered tokens are cut, the survivors
    rejoined in order.  Windows here are RAW space-separated tokens
    (no lowering) so the reconstruction is the original text minus the
    duplicated spans.

    Returns one row per document: ``(id, n_toks, n_removed,
    text_clean)`` with ``text_clean`` NULL when everything was covered.

    Two keyed exchanges, the honest lower bound for the operation:

    1. *Detect*: batches emit ``(window-hash64, doc, start)`` rows
       (positions must travel — removal needs them); a hash-keyed
       partition groupby finds hashes with >= 2 distinct docs with one
       vectorized segmented scan and emits ONLY the duplicated
       ``(doc, start)`` rows — output mass is the duplicated-window
       mass, typically a sliver of the corpus.
    2. *Apply*: text rows and dup-position rows co-partition on
       hash(doc) through one unified-schema exchange (text travels
       ONCE); each partition rebuilds its documents fully vectorized —
       token coverage by scatter over repeat/arange index math, kept
       tokens rejoined per doc via a new offsets ListArray +
       ``binary_join`` (the ``paragraph_dedup`` reassembly shape).
    """
    from ..hashing import mmh3_64_batch
    from .text import _BIGRAM_SEP

    P = int(num_partitions)
    GOLD = np.uint64(0x9E3779B97F4A7C15)

    def window_rows(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch[text_col].combine_chunks(), "")
        words = pc.split_pattern(col, " ")
        flat = words.flatten()
        n_words = np.asarray(pc.list_value_length(words), dtype=np.int64)
        n_flat = len(flat)
        ids = np.asarray(batch[id_col], dtype=np.int64)
        if n_flat < n:
            return pa.table({"pkey": pa.array([], pa.int32()),
                             "h": pa.array([], pa.int64()),
                             "doc": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64())})
        n_pos = n_flat - n + 1
        grams = pc.binary_join_element_wise(
            *[flat.slice(j, n_pos) for j in range(n)], _BIGRAM_SEP)
        doc_of = np.repeat(np.arange(len(n_words), dtype=np.int64), n_words)
        base = np.concatenate(([0], np.cumsum(n_words)))
        valid = doc_of[:n_pos] == doc_of[n - 1:]
        grams = grams.filter(pa.array(valid))
        vidx = np.flatnonzero(valid)
        docs = doc_of[vidx]
        pos = vidx - base[docs]
        h = (mmh3_64_batch(grams).astype(np.uint64)
             if len(grams) else np.empty(0, np.uint64))
        with np.errstate(over="ignore"):
            pk = ((h * GOLD) % np.uint64(P)).astype(np.int32)
        return pa.table({
            "pkey": pa.array(pk),
            "h": pa.array(h.view(np.int64)),
            "doc": pa.array(ids[docs]),
            "pos": pa.array(pos),
        })

    def dup_positions(group: pa.Table) -> pa.Table:
        h = np.asarray(group["h"], dtype=np.int64)
        doc = np.asarray(group["doc"], dtype=np.int64)
        pos = np.asarray(group["pos"], dtype=np.int64)
        order = np.lexsort((pos, doc, h))
        hs, ds_, ps = h[order], doc[order], pos[order]
        hb = np.ones(hs.size, dtype=bool)
        hb[1:] = hs[1:] != hs[:-1]
        seg_start = np.flatnonzero(hb)
        seg_len = np.diff(np.append(seg_start, hs.size))
        # distinct docs per hash segment: count doc boundaries inside it
        db = np.ones(hs.size, dtype=bool)
        db[1:] = hb[1:] | (ds_[1:] != ds_[:-1])
        ndocs = np.add.reduceat(db.astype(np.int64), seg_start)
        dup = np.repeat(ndocs >= 2, seg_len)
        return pa.table({"doc": pa.array(ds_[dup]),
                         "pos": pa.array(ps[dup])})

    dup_pos = (
        ds.map_batches(window_rows, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("pkey")
        .map_groups(dup_positions, batch_format="pyarrow")
    )

    def tag_text(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch[id_col], dtype=np.int64)
        with np.errstate(over="ignore"):
            pk = ((ids.astype(np.uint64) * GOLD) % np.uint64(P)).astype(np.int32)
        return pa.table({
            "pkey": pa.array(pk),
            "doc": pa.array(ids),
            "pos": pa.array(np.full(ids.size, -1, np.int64)),
            "txt": pc.fill_null(batch[text_col].combine_chunks(), ""),
        })

    def tag_pos(batch: pa.Table) -> pa.Table:
        doc = np.asarray(batch["doc"], dtype=np.int64)
        with np.errstate(over="ignore"):
            pk = ((doc.astype(np.uint64) * GOLD) % np.uint64(P)).astype(np.int32)
        return pa.table({
            "pkey": pa.array(pk),
            "doc": batch["doc"],
            "pos": batch["pos"],
            "txt": pa.nulls(len(doc), type=pa.string()).fill_null(""),
        })

    unified = (ds.map_batches(tag_text, batch_format="pyarrow",
                              zero_copy_batch=True)
               .union(dup_pos.map_batches(tag_pos, batch_format="pyarrow",
                                          zero_copy_batch=True)))

    def rebuild(group: pa.Table) -> pa.Table:
        pos = np.asarray(group["pos"], dtype=np.int64)
        doc = np.asarray(group["doc"], dtype=np.int64)
        is_text = pos == -1
        t_idx = np.flatnonzero(is_text)
        # order documents by id for deterministic within-partition layout
        t_order = t_idx[np.argsort(doc[t_idx], kind="stable")]
        ids = doc[t_order]
        texts = group["txt"].combine_chunks().take(pa.array(t_order))
        words = pc.split_pattern(texts, " ")
        flat = words.flatten()
        n_words = np.asarray(pc.list_value_length(words), dtype=np.int64)
        base = np.concatenate(([0], np.cumsum(n_words)))
        covered = np.zeros(int(n_words.sum()), dtype=bool)
        p_idx = np.flatnonzero(~is_text)
        if p_idx.size:
            # map dup rows to the local doc ordinal, then to flat indices
            local = np.searchsorted(ids, doc[p_idx])
            starts = base[local] + pos[p_idx]
            span_idx = (np.repeat(starts, n)
                        + np.tile(np.arange(n, dtype=np.int64), starts.size))
            covered[span_idx] = True
        keep = ~covered
        kept = flat.filter(pa.array(keep))
        kept_per_doc = np.add.reduceat(keep.astype(np.int64), base[:-1]) \
            if n_words.size else np.empty(0, np.int64)
        kept_per_doc = np.where(n_words > 0, kept_per_doc, 0)
        offs = np.concatenate(([0], np.cumsum(kept_per_doc))).astype(np.int32)
        doc_list = pa.ListArray.from_arrays(pa.array(offs), kept)
        text_clean = pc.if_else(
            pa.array(kept_per_doc > 0), pc.binary_join(doc_list, " "),
            pa.nulls(len(ids), type=pa.string()))
        n_removed = n_words - kept_per_doc
        return pa.table({
            id_col: pa.array(ids),
            "n_toks": pa.array(n_words),
            "n_removed": pa.array(n_removed),
            "text_clean": text_clean,
        })

    return unified.groupby("pkey").map_groups(rebuild, batch_format="pyarrow")
