"""Byte-pair-encoding vocabulary training + encoding, distributed.

Standard trainer architecture (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"): BPE merges are learned
over the WORD-FREQUENCY table, not the raw corpus — so the distributed
part is exactly ONE grouped word count (output bounded by |vocab|, not
corpus size), after which the merge loop runs driver-side over the
count table with corpus-frequency weights.  At 100 TB the word table
for web text is tens of millions of rows — driver-sized — while the
corpus is not; this split is how production tokenizer trainers
(GPT-2's, SentencePiece's frequent-word path) are organized.

Encoding broadcasts the learned merge ranks once (``ray.put``) and
memoizes per-word encodings process-locally, so each distinct word is
encoded once per worker process, not once per occurrence.

Determinism: merge selection tie-breaks by (weight DESC, pair ASC), so
the learned vocabulary is a pure function of the word-count multiset —
invariant to input partitioning and Ray scheduling order (tested).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EOW = "▁"  # end-of-word sentinel symbol (never appears in tokens)


def word_counts(ds: "object", text_col: str, *, lowercase: bool = True,
                batch_size: int = 65536) -> "object":
    """Distributed (word, n) table: whitespace split + in-batch
    pre-count, one grouped sum — the only all-to-all in BPE training."""
    from ..pipelines.relational import grouped_agg

    def explode(batch: pa.Table) -> pa.Table:
        txt = batch[text_col].combine_chunks()
        if lowercase:
            txt = pc.utf8_lower(txt)
        words = pc.list_flatten(pc.split_pattern_regex(txt, r"\s+"))
        words = words.filter(pc.not_equal(words, ""))
        t = pa.table({"word": words})
        g = t.group_by(["word"]).aggregate([([], "count_all")])
        return pa.table({"word": g["word"], "n": g["count_all"]})

    pre = ds.map_batches(explode, batch_format="pyarrow",
                         batch_size=batch_size, zero_copy_batch=True)
    return grouped_agg(pre, ["word"], [("n", "n", "sum")])


def bpe_train(words: list[str], counts: np.ndarray, num_merges: int,
              ) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a word-frequency table
    (driver-side: cost ∝ Σ|word| + merges·|affected|, standard
    incremental pair-count maintenance)."""
    counts = np.asarray(counts, dtype=np.int64)
    seqs: list[list[str]] = [list(w) + [EOW] for w in words]
    # pair -> total corpus weight; pair -> word indices containing it
    pair_w: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}

    def add_word_pairs(i: int, sign: int) -> None:
        s, c = seqs[i], int(counts[i]) * sign
        for a, b in zip(s, s[1:]):
            p = (a, b)
            pair_w[p] = pair_w.get(p, 0) + c
            if sign > 0:
                pair_words.setdefault(p, set()).add(i)

    for i in range(len(seqs)):
        add_word_pairs(i, +1)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        live = [(w, p) for p, w in pair_w.items() if w > 0]
        if not live:
            break
        # deterministic: weight DESC, then pair ASC
        best_w = max(w for w, _ in live)
        best = min(p for w, p in live if w == best_w)
        merges.append(best)
        merged = best[0] + best[1]
        for i in list(pair_words.get(best, ())):
            add_word_pairs(i, -1)  # retract old pairs
            s = seqs[i]
            out: list[str] = []
            j = 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == best[0] and s[j + 1] == best[1]:
                    out.append(merged)
                    j += 2
                else:
                    out.append(s[j])
                    j += 1
            seqs[i] = out
            add_word_pairs(i, +1)
        pair_w.pop(best, None)
        pair_words.pop(best, None)
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application (the standard BPE
    encoder); scalar — callers memoize per distinct word."""
    s = list(word) + [EOW]
    while len(s) > 1:
        best_rank, best_j = None, -1
        for j in range(len(s) - 1):
            r = ranks.get((s[j], s[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_j = r, j
        if best_rank is None:
            break
        s[best_j: best_j + 2] = [s[best_j] + s[best_j + 1]]
    return s


def bpe_token_counts(ds: "object", text_col: str, id_col: str,
                     merges: list[tuple[str, str]], *,
                     lowercase: bool = True,
                     batch_size: int = 65536) -> "object":
    """Per-document BPE token counts under a learned merge list: the
    ranks broadcast once (``ray.put``); each batch encodes only its
    DISTINCT words (process-memoized), then scatters counts back to
    rows — no per-occurrence work, no shuffle."""
    import ray as _ray

    from ..proc_cache import cached_instance

    ranks_ref = _ray.put({p: i for i, p in enumerate(merges)})

    def encode(batch: pa.Table) -> pa.Table:
        ranks = cached_instance(("bpe_ranks", ranks_ref.hex()),
                                lambda: _ray.get(ranks_ref))
        memo = cached_instance(("bpe_memo", ranks_ref.hex()), dict)
        txt = batch[text_col].combine_chunks()
        if lowercase:
            txt = pc.utf8_lower(txt)
        lists = pc.split_pattern_regex(txt, r"\s+")
        flat = pc.list_flatten(lists)
        offs = np.asarray(lists.offsets, dtype=np.int64)
        wds = np.asarray(flat).astype("U")
        uniq, inv = np.unique(wds, return_inverse=True)
        tok_per_uniq = np.empty(uniq.size, dtype=np.int64)
        for k, w in enumerate(uniq):
            if w == "":
                tok_per_uniq[k] = 0
                continue
            hit = memo.get(w)
            if hit is None:
                hit = len(bpe_encode_word(w, ranks))
                memo[w] = hit
            tok_per_uniq[k] = hit
        per_word = tok_per_uniq[inv]
        sums = np.add.reduceat(np.concatenate([per_word, [0]]),
                               np.minimum(offs[:-1], len(per_word)))
        sums[offs[:-1] == offs[1:]] = 0  # docs with zero words
        return pa.table({
            id_col: batch[id_col],
            "n_bpe_tokens": pa.array(sums.astype(np.int64)),
        })

    return ds.map_batches(encode, batch_format="pyarrow",
                          batch_size=batch_size, zero_copy_batch=True)
