"""Text-analysis stages for large-scale training-data pipelines.

Each stage is a vectorized ``map_batches`` transform (stateless fn, or
callable class when there's setup worth amortizing per actor).  All are
deterministic — no model downloads, no network — so results are
reproducible and oracle-checkable.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

# token that approximates a BPE pre-tokenizer's word splits (GPT-2-style
# contractions + letter runs + digit runs + punctuation runs)
_BPE_ISH = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")
_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[^\w\s]")
_DIGIT = re.compile(r"\d")

# RE2 (pyarrow.compute) equivalents of the Python regex classes above.
# re2's \s is ASCII-only; Python's \s additionally matches \v, \x1c-\x1f,
# \x85 and the Unicode space separators — spell them out so the Arrow
# kernels count exactly what the scalar reference implementations count.
_WS_CHARS = (" \t\n\r\f\v\x1c\x1d\x1e\x1f\x85\xa0 "
             "           "
             "    　")
# \p{Zs} enumerated literally (Unicode space separators, a stable
# category; \s covers U+0020) so patterns that reach oracle SQL contain
# no literal braces (a driver that str.format()s the SQL would choke on
# the {Zs}).  Parity with the \p{Zs} form is covered by the scalar-vs-
# vectorized tests in tests/test_stages.py.
_ZS_LITERAL = "               　"
_RE2_WS_CLASS = r"[\s\x0b\x1c-\x1f\x85" + _ZS_LITERAL + "  ]"
_RE2_WS = _RE2_WS_CLASS + "+"
# Python \w ≈ letters + numbers + marks + connector punctuation
_RE2_PUNCT = r"[^\p{L}\p{N}_" + _RE2_WS_CLASS[1:-1] + "]"
_RE2_DIGIT = r"\p{Nd}"
# _BPE_ISH minus the pure-whitespace branch: dropping it does not change
# which non-space tokens match (the other branches cannot start mid-run
# of whitespace), so counting matches counts non-space BPE-ish tokens
_RE2_BPE = (r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9"
            r"\x0b\x1c-\x1f\x85" + _ZS_LITERAL + "  ]+")

# Small function-word sets per language (public common stopwords) for
# the n-gram/stopword language-ID heuristic.
_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in a is that it was for on are with as be at by this".split()),
    "de": frozenset("der die das und ist nicht ein eine zu den von mit im für auf des sich".split()),
    "fr": frozenset("le la les de des et un une est dans que pour sur avec ne pas au du".split()),
    "es": frozenset("el la los las de y un una es en que por para con no se del al como".split()),
    "pt": frozenset("o a os as de e um uma é em que por para com não se do da no na".split()),
    "it": frozenset("il la i le di e un una è in che per con non si del al".split()),
    "nl": frozenset("de het een en van is in dat op te zijn met voor niet aan er ook".split()),
    "ru": frozenset("и в не на я что с по это как но из у за то же бы он".split()),
}


def tokenize_ws(text: str) -> list[str]:
    return _WS.split(text.strip()) if text and text.strip() else []


def count_tokens_batch(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Scalar reference implementation of (whitespace tokens, BPE-ish
    tokens) per text — the parity oracle for ``count_tokens_arrow``."""
    ws = np.fromiter((len(tokenize_ws(t or "")) for t in texts), dtype=np.int64, count=len(texts))
    bpe = np.fromiter(
        (sum(1 for m in _BPE_ISH.finditer(t or "") if not m.group().isspace()) for t in texts),
        dtype=np.int64,
        count=len(texts),
    )
    return ws, bpe


def _np(arr) -> np.ndarray:
    return arr.to_numpy(zero_copy_only=False)


def _tokens_of(col: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, pa.Array]:
    """(trimmed, list<token> array) for a string column (nulls → "").
    Blank rows tokenize to a single empty-string token — callers mask
    them via ``trimmed == ""``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    filled = pc.fill_null(col, "")
    trimmed = pc.utf8_trim(filled, _WS_CHARS)
    # utf8_split_whitespace == split_pattern_regex(_RE2_WS) on every
    # char of the WS class AND the non-whitespace lookalikes (ZWSP,
    # word-joiner, BOM, soft hyphen) — probed exhaustively in
    # tests/test_stages.py — at ~3x the throughput (no regex engine)
    return trimmed, pc.utf8_split_whitespace(trimmed)


def count_tokens_arrow(col) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (Arrow re2 kernels) version of ``count_tokens_batch``:
    ws tokens = inner whitespace runs + 1 on the trimmed text, BPE-ish
    tokens = non-overlapping matches of the no-whitespace-branch
    pattern.  Verified equal to the scalar reference in tests."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    filled = pc.fill_null(col, "")
    trimmed = pc.utf8_trim(filled, _WS_CHARS)
    runs = _np(pc.count_substring_regex(trimmed, _RE2_WS)).astype(np.int64)
    nonblank = _np(pc.not_equal(trimmed, "")).astype(bool)
    ws = np.where(nonblank, runs + 1, 0)
    bpe = _np(pc.count_substring_regex(filled, _RE2_BPE)).astype(np.int64)
    return ws, bpe


def add_token_counts(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    """Append ``n_tokens_ws`` and ``n_tokens_bpe`` columns."""

    def fn(batch: pa.Table) -> pa.Table:
        ws, bpe = count_tokens_arrow(batch[text_col])
        return batch.append_column("n_tokens_ws", pa.array(ws)).append_column(
            "n_tokens_bpe", pa.array(bpe)
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


class LanguageId:
    """Actor-pool language-ID stage: stopword-hit scoring with a
    char-script prior (CJK/Cyrillic ranges), ``und`` when no evidence.

    Stopword sets and compiled regexes are built once per actor
    (``__init__``), scoring is per batch.
    """

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.stops = {k: v for k, v in _STOPWORDS.items()}
        self.ws = _WS

    def _classify(self, text: str) -> str:
        if not text:
            return "und"
        # script priors: decisive for zh/ja/ru
        cjk = sum(1 for c in text[:200] if "一" <= c <= "鿿")
        kana = sum(1 for c in text[:200] if "぀" <= c <= "ヿ")
        cyr = sum(1 for c in text[:200] if "Ѐ" <= c <= "ӿ")
        probe = max(1, min(len(text), 200))
        if kana / probe > 0.05:
            return "ja"
        if cjk / probe > 0.2:
            return "zh"
        if cyr / probe > 0.2:
            return "ru"
        toks = [t.lower() for t in self.ws.split(text.strip())[:300]]
        if not toks:
            return "und"
        best, best_hits = "und", 0
        for lang, stop in self.stops.items():
            hits = sum(1 for t in toks if t in stop)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best if best_hits >= 2 else "und"

    def classify_arrow(self, col) -> np.ndarray:
        """Vectorized ``_classify`` over a string column (parity-tested
        against the scalar path): re2 script-range counts on the first
        200 chars, then stopword-hit argmax via one is_in per language
        over the flattened first-300 tokens."""
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        filled = pc.fill_null(col, "")
        n = len(filled)
        if n == 0:
            return np.empty(0, dtype=object)
        head = pc.utf8_slice_codeunits(filled, 0, 200)
        n_chars = _np(pc.utf8_length(filled)).astype(np.int64)
        cjk = _np(pc.count_substring_regex(head, "[一-鿿]")).astype(np.float64)
        kana = _np(pc.count_substring_regex(head, "[぀-ヿ]")).astype(np.float64)
        cyr = _np(pc.count_substring_regex(head, "[Ѐ-ӿ]")).astype(np.float64)
        probe = np.maximum(1, np.minimum(n_chars, 200)).astype(np.float64)
        trimmed, toks = _tokens_of(filled)
        toks300 = pc.list_slice(toks, 0, 300)
        counts = _np(pc.list_value_length(toks300)).astype(np.int64)
        flat_lower = pc.utf8_lower(toks300.flatten())
        starts = np.zeros(n, np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        langs = list(self.stops)
        hits = np.empty((len(langs), n), np.int64)
        for i, lang in enumerate(langs):
            member = _np(pc.is_in(
                flat_lower,
                value_set=pa.array(sorted(self.stops[lang]), type=pa.string()),
            )).astype(np.int64)
            hits[i] = np.add.reduceat(member, starts)
        best_idx = np.argmax(hits, axis=0)  # first max — matches dict order scan
        best_hits = hits[best_idx, np.arange(n)]
        lang_names = np.array(langs, dtype=object)
        stop_pred = np.where(best_hits >= 2, lang_names[best_idx], "und")
        empty = n_chars == 0
        return np.select(
            [empty, kana / probe > 0.05, cjk / probe > 0.2, cyr / probe > 0.2],
            ["und", "ja", "zh", "ru"],
            default=stop_pred,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = self.classify_arrow(batch[self.text_col])
        return batch.append_column(self.out_col, pa.array(preds, type=pa.string()))


def add_language_id(ds: "ray.data.Dataset", text_col: str = "text",
                    concurrency=None) -> "ray.data.Dataset":
    """Plain tasks + process-local LanguageId (stopword sets are cheap
    state — ``proc_cache``); ``concurrency`` kept for API compat."""
    from ..proc_cache import cached_instance

    def fn(batch: pa.Table) -> pa.Table:
        lid = cached_instance(("langid", text_col), lambda: LanguageId(text_col))
        return lid(batch)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def language_signal_matrix(col) -> np.ndarray:
    """(n, len(_STOPWORDS)+3) feature matrix of per-language stopword
    hit ratios plus CJK/kana/Cyrillic script ratios — the numeric form
    of the language-ID evidence, usable as classifier features."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    filled = pc.fill_null(col, "")
    n = len(filled)
    langs = list(_STOPWORDS)
    out = np.zeros((n, len(langs) + 3), np.float64)
    if n == 0:
        return out
    trimmed, toks = _tokens_of(filled)
    counts = _np(pc.list_value_length(toks)).astype(np.int64)
    flat_lower = pc.utf8_lower(toks.flatten())
    starts = np.zeros(n, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    denom = np.maximum(counts, 1).astype(np.float64)
    for i, lang in enumerate(langs):
        member = _np(pc.is_in(
            flat_lower, value_set=pa.array(sorted(_STOPWORDS[lang]), type=pa.string()),
        )).astype(np.int64)
        out[:, i] = np.add.reduceat(member, starts) / denom
    head = pc.utf8_slice_codeunits(filled, 0, 200)
    probe = np.maximum(1, np.minimum(
        _np(pc.utf8_length(filled)).astype(np.int64), 200)).astype(np.float64)
    for j, pat in enumerate(("[一-鿿]", "[぀-ヿ]", "[Ѐ-ӿ]")):
        out[:, len(langs) + j] = (
            _np(pc.count_substring_regex(head, pat)).astype(np.float64) / probe)
    return out


def quality_features_arrow(col) -> dict[str, np.ndarray]:
    """Vectorized quality signals straight off the Arrow column: re2
    char-class counts for punctuation/digits, one regex split for
    tokens, then segmented numpy (reduceat / lexsort boundaries) for the
    per-document word statistics.  Semantics identical to
    ``quality_features_batch`` (the scalar reference; parity-tested)."""
    trimmed, toks = _tokens_of(col)
    n = len(trimmed)
    zeros_f = lambda: np.zeros(n, np.float64)  # noqa: E731
    out = {
        "n_chars": np.zeros(n, np.int64), "n_words": np.zeros(n, np.int64),
        "mean_word_len": zeros_f(), "punct_ratio": zeros_f(),
        "digit_ratio": zeros_f(), "stop_ratio": zeros_f(),
        "dup_word_ratio": zeros_f(),
        # integer raw counts — the ratios' numerators.  Exposed so gate
        # queries can compare in pure integer arithmetic (bit-exact vs a
        # SQL oracle, no float-division rounding in the comparison).
        "n_punct": np.zeros(n, np.int64), "n_digits": np.zeros(n, np.int64),
        "n_distinct_words": np.zeros(n, np.int64),
    }
    if n == 0:
        return out
    filled = pc.fill_null(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col, "")
    n_chars = _np(pc.utf8_length(filled)).astype(np.int64)
    out["n_chars"] = n_chars
    nonempty = n_chars > 0
    nonblank = _np(pc.not_equal(trimmed, "")).astype(bool)
    if not nonblank.any():
        return out
    counts = _np(pc.list_value_length(toks)).astype(np.int64)  # ≥1 everywhere
    # the flat-token arrays are ~40x the row count: keep them in their
    # native narrow dtypes (int32 codes/lengths, bool hits) and widen
    # only inside reduceat's accumulator — on this DRAM-bound host the
    # int64 astype copies alone cost more than the sort.
    # dictionary-encode the RAW tokens FIRST and answer every per-token
    # string question on the (tiny) dictionary, gathering through the
    # int32 codes: utf8_lower / utf8_length / punct / digit / stopword
    # over 4M flat tokens each stream the full string payload; over a
    # ~3k-word dictionary they're free.  punct/digit move here too:
    # every non-whitespace char lives inside exactly one token (the
    # split separators are whitespace, which the PUNCT class excludes),
    # so per-doc token-count sums equal the full-text regex counts —
    # and counting the raw dictionary sidesteps lowercase artifacts
    # (e.g. İ → i + combining dot would otherwise mint a fake punct
    # char and an off-by-one word length vs the scalar reference).
    enc = pc.dictionary_encode(toks.flatten())
    codes_raw = _np(enc.indices)
    dict_len = _np(pc.utf8_length(enc.dictionary)).astype(np.int32)
    dict_punct = _np(pc.count_substring_regex(
        enc.dictionary, _RE2_PUNCT)).astype(np.int32)
    dict_digit = _np(pc.count_substring_regex(
        enc.dictionary, _RE2_DIGIT)).astype(np.int32)
    # lowercase only the dictionary, then re-encode to merge case
    # variants ("The"/"the" → one code) for distinct/stopword semantics
    enc2 = pc.dictionary_encode(pc.utf8_lower(enc.dictionary))
    remap = _np(enc2.indices)
    codes32 = remap[codes_raw]
    stops = pa.array(sorted(_STOPWORDS["en"]), type=pa.string())
    dict_stop = np.asarray(pc.is_in(enc2.dictionary, value_set=stops))
    starts = np.zeros(n, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    sum_len = np.add.reduceat(dict_len[codes_raw], starts, dtype=np.int64)
    hits = np.add.reduceat(dict_stop[codes32], starts, dtype=np.int64)
    if nonempty.any():
        punct = np.add.reduceat(dict_punct[codes_raw], starts,
                                dtype=np.int64)
        digit = np.add.reduceat(dict_digit[codes_raw], starts,
                                dtype=np.int64)
        punct[~nonblank] = 0  # blank rows: single "" token, zero anyway
        digit[~nonblank] = 0
        denom = np.where(nonempty, n_chars, 1)
        out["n_punct"] = np.where(nonempty, punct, 0)
        out["n_digits"] = np.where(nonempty, digit, 0)
        out["punct_ratio"] = np.where(nonempty, punct.astype(np.float64) / denom, 0.0)
        out["digit_ratio"] = np.where(nonempty, digit.astype(np.float64) / denom, 0.0)
    # distinct lower-cased tokens per document: one composite
    # (doc, code) sort + boundary count (~15x faster than a two-key
    # lexsort)
    vocab = int(codes32.max()) + 1 if codes32.size else 1
    if n * vocab < (1 << 31):
        seg32 = np.repeat(np.arange(n, dtype=np.int32), counts)
        comp = seg32 * np.int32(vocab)
        comp += codes32
        # stable = radix for ints: 3-5x faster than the default
        # introsort on these monotone-ish composites
        comp.sort(kind="stable")
        new = np.ones(comp.size, dtype=bool)
        np.not_equal(comp[1:], comp[:-1], out=new[1:])
        distinct = np.bincount(comp[new].astype(np.int64) // vocab,
                               minlength=n)
    elif n * vocab < (1 << 62):
        seg = np.repeat(np.arange(n, dtype=np.int64), counts)
        comp = seg * vocab + codes32.astype(np.int64)
        comp.sort(kind="stable")
        new = np.ones(comp.size, dtype=bool)
        np.not_equal(comp[1:], comp[:-1], out=new[1:])
        distinct = np.bincount(comp[new] // vocab, minlength=n)
    else:  # overflow-safe fallback (never expected at batch sizes)
        seg = np.repeat(np.arange(n, dtype=np.int64), counts)
        codes = codes32.astype(np.int64)
        order = np.lexsort((codes, seg))
        s_seg, s_code = seg[order], codes[order]
        new = np.ones(s_seg.size, dtype=bool)
        np.not_equal(s_seg[1:], s_seg[:-1], out=new[1:])
        new[1:] |= s_code[1:] != s_code[:-1]
        distinct = np.bincount(s_seg[new], minlength=n)
    safe = np.where(nonblank, counts, 1)
    out["n_words"] = np.where(nonblank, counts, 0)
    out["n_distinct_words"] = np.where(nonblank, distinct, 0)
    out["mean_word_len"] = np.where(nonblank, sum_len / safe, 0.0)
    out["stop_ratio"] = np.where(nonblank, hits / safe, 0.0)
    out["dup_word_ratio"] = np.where(nonblank, 1.0 - distinct / safe, 0.0)
    return out


def quality_features_batch(texts: list[str]) -> dict[str, np.ndarray]:
    """Scalar reference implementation (parity oracle for
    ``quality_features_arrow``): deterministic quality signals per text
    (C4/Gopher-style cheap heuristics: length, word stats,
    punctuation/digit ratios, repetition)."""
    n = len(texts)
    n_chars = np.zeros(n, np.int64)
    n_words = np.zeros(n, np.int64)
    n_punct = np.zeros(n, np.int64)
    n_digits = np.zeros(n, np.int64)
    n_distinct_words = np.zeros(n, np.int64)
    mean_word_len = np.zeros(n, np.float64)
    punct_ratio = np.zeros(n, np.float64)
    digit_ratio = np.zeros(n, np.float64)
    stop_ratio = np.zeros(n, np.float64)
    dup_word_ratio = np.zeros(n, np.float64)
    en_stop = _STOPWORDS["en"]
    for i, t in enumerate(texts):
        t = t or ""
        n_chars[i] = len(t)
        words = tokenize_ws(t)
        n_words[i] = len(words)
        if words:
            mean_word_len[i] = sum(map(len, words)) / len(words)
            lower = [w.lower() for w in words]
            stop_ratio[i] = sum(1 for w in lower if w in en_stop) / len(words)
            n_distinct_words[i] = len(set(lower))
            dup_word_ratio[i] = 1.0 - n_distinct_words[i] / len(words)
        if t:
            n_punct[i] = len(_PUNCT.findall(t))
            n_digits[i] = len(_DIGIT.findall(t))
            punct_ratio[i] = n_punct[i] / len(t)
            digit_ratio[i] = n_digits[i] / len(t)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "stop_ratio": stop_ratio,
        "dup_word_ratio": dup_word_ratio,
        "n_punct": n_punct,
        "n_digits": n_digits,
        "n_distinct_words": n_distinct_words,
    }


def quality_score(feat: dict[str, np.ndarray]) -> np.ndarray:
    """Composite [0, 1] quality score from the feature dict — a
    monotone, documented combination (not a learned model)."""
    length_ok = np.clip(feat["n_words"] / 50.0, 0, 1)
    word_len_ok = np.exp(-((feat["mean_word_len"] - 5.0) ** 2) / 18.0)
    punct_pen = np.clip(1.0 - 4.0 * feat["punct_ratio"], 0, 1)
    digit_pen = np.clip(1.0 - 3.0 * feat["digit_ratio"], 0, 1)
    rep_pen = np.clip(1.0 - feat["dup_word_ratio"], 0, 1)
    return length_ok * word_len_ok * punct_pen * digit_pen * rep_pen


def add_quality(ds: "ray.data.Dataset", text_col: str = "text",
                num_cpus: float | None = None,
                batch_size: int | None = None) -> "ray.data.Dataset":
    """Append the quality feature columns + ``quality_score``.

    ``batch_size``: 8–16k keeps the flat-token working set
    cache-resident on a DRAM-bound host (measured 185 vs 139 krows/s
    single-thread against whole-block batches); None = whole block."""

    def fn(batch: pa.Table) -> pa.Table:
        feat = quality_features_arrow(batch[text_col])
        out = batch
        for name, arr in feat.items():
            if name in out.column_names:
                continue  # don't clobber an existing (e.g. exact) column
            out = out.append_column(name, pa.array(arr))
        return out.append_column("quality_score", pa.array(quality_score(feat)))

    extra = {"num_cpus": num_cpus} if num_cpus else {}
    if batch_size:
        extra["batch_size"] = batch_size
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, **extra)


# 64-bit polynomial rolling hash (Rabin–Karp style) — the document
# fingerprint primitive.  Vectorized: fp = Σ byte[i]·B^(L-1-i) mod 2^64.
_FP_BASE = np.uint64(1099511628211)  # FNV prime as the polynomial base


def fingerprint_batch(texts) -> np.ndarray:
    """Fully vectorized polynomial rolling hash over the whole batch:
    ONE pass over the concatenated utf-8 bytes — per-byte exponent =
    distance from its document's end, power lookup by fancy index, then
    a segmented uint64 sum (``np.add.reduceat``; wraparound = the mod
    2^64 semantics).  Accepts a list[str] or an Arrow string column."""
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        col = texts.combine_chunks() if isinstance(texts, pa.ChunkedArray) else texts
        col = pc.fill_null(col, "")
    else:
        if not texts:
            return np.empty(0, dtype=np.uint64)
        col = pa.array([t or "" for t in texts], type=pa.string())
    b = col.cast(pa.large_binary())
    offs = np.frombuffer(b.buffers()[1], dtype=np.int64)[b.offset : b.offset + len(b) + 1]
    n = len(b)
    out = np.zeros(n, dtype=np.uint64)
    if offs[-1] == offs[0]:
        return out
    data = np.frombuffer(b.buffers()[2], dtype=np.uint8)
    lens = np.diff(offs)
    # Horner across rows, byte-position by byte-position, rows sorted by
    # length descending so the active set is always a prefix (no boolean
    # masks, no per-byte temporaries — working set stays cache-resident;
    # ~60x faster than a flat per-byte formulation).
    order = np.argsort(-lens, kind="stable")
    s_offs = offs[:-1][order]
    s_lens = lens[order]
    max_len = int(s_lens[0])
    k_per_pos = np.searchsorted(-s_lens, -np.arange(1, max_len + 1), side="right")
    acc = np.zeros(n, dtype=np.uint64)
    TAIL_K = 32  # few remaining long rows → finish them row-at-a-time
    with np.errstate(over="ignore"):
        p = 0
        while p < max_len and k_per_pos[p] > TAIL_K:
            k = k_per_pos[p]
            vals = data[s_offs[:k] + p]
            a = acc[:k]
            a *= _FP_BASE
            a += vals
            p += 1
        if p < max_len and k_per_pos[p] > 0:
            k = k_per_pos[p]
            rem_max = max_len - p
            powers = np.empty(rem_max + 1, dtype=np.uint64)  # powers[i] = B^i
            powers[0] = 1
            np.cumprod(np.full(rem_max, _FP_BASE, dtype=np.uint64), out=powers[1:])
            for i in range(k):
                rem = int(s_lens[i]) - p
                if rem <= 0:
                    continue
                suffix = data[s_offs[i] + p : s_offs[i] + p + rem].astype(np.uint64)
                # full = prefix·B^rem + Σ suffix[j]·B^(rem-1-j)
                acc[i] = acc[i] * powers[rem] + np.sum(
                    suffix * powers[rem - 1 :: -1], dtype=np.uint64
                )
    out[order] = acc
    return out


def add_fingerprint(ds: "ray.data.Dataset", text_col: str = "text",
                    out_col: str = "fingerprint",
                    num_cpus: float | None = None,
                    batch_size: int | None = None) -> "ray.data.Dataset":
    def fn(batch: pa.Table) -> pa.Table:
        fps = fingerprint_batch(batch[text_col])
        return batch.append_column(out_col, pa.array(fps.astype(np.int64)))

    extra = {"num_cpus": num_cpus} if num_cpus else {}
    if batch_size:
        extra["batch_size"] = batch_size
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, **extra)


# ---------------------------------------------------------------------------
# word n-gram statistics (corpus top-k, per-doc repetition signal)
# ---------------------------------------------------------------------------

_BIGRAM_SEP = "\x1f"


def bigram_flat(col) -> tuple[pa.Array, np.ndarray]:
    """All within-document lowercased word bigrams of a string column,
    flattened: returns ``(bigrams, doc_idx)`` where ``bigrams[i]`` is
    ``tok[j] + '\\x1f' + tok[j+1]`` and ``doc_idx[i]`` the row it came
    from.  Fully vectorized: one token split (``_tokens_of``), one
    ``utf8_lower`` over the flat token values, one
    ``binary_join_element_wise`` of the shifted flat array, one boolean
    mask dropping the pairs that straddle a document boundary."""
    trimmed, toks = _tokens_of(col)
    flat = pc.utf8_lower(toks.flatten())
    n_flat = len(flat)
    tok_counts = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    offs = np.concatenate(([0], np.cumsum(tok_counts)))
    if n_flat < 2:
        return pa.array([], type=pa.string()), np.empty(0, np.int64)
    left = flat.slice(0, n_flat - 1)
    right = flat.slice(1, n_flat - 1)
    pairs = pc.binary_join_element_wise(left, right, _BIGRAM_SEP)
    # a pair starting at a document's last token crosses the boundary
    mask = np.ones(n_flat - 1, dtype=bool)
    ends = offs[1:] - 1
    mask[ends[(ends >= 0) & (ends <= n_flat - 2)]] = False
    # blank docs tokenize to [''] — single token, masked by the above
    doc_idx = (np.repeat(np.arange(len(toks), dtype=np.int64), tok_counts)
               [: n_flat - 1][mask])
    return pairs.filter(pa.array(mask)), doc_idx


def token_ngrams_flat(col, n: int) -> tuple[pa.Array, np.ndarray]:
    """All within-document lowercased word ``n``-grams, flattened:
    ``(ngrams, doc_idx)`` with each n-gram the ``'\\x1f'``-join of
    ``n`` consecutive tokens.  Generalizes :func:`bigram_flat` — one
    split, one lower, ``n`` shifted slices joined element-wise, one
    boundary mask (a window is valid iff its first and last token
    belong to the same document)."""
    trimmed, toks = _tokens_of(col)
    flat = pc.utf8_lower(toks.flatten())
    n_flat = len(flat)
    tok_counts = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    if n_flat < n:
        return pa.array([], type=pa.string()), np.empty(0, np.int64)
    n_pos = n_flat - n + 1
    # join_element_wise takes the separator LAST
    grams = pc.binary_join_element_wise(
        *[flat.slice(j, n_pos) for j in range(n)], _BIGRAM_SEP)
    doc_of = np.repeat(np.arange(len(toks), dtype=np.int64), tok_counts)
    mask = doc_of[: n_pos] == doc_of[n - 1:]
    return grams.filter(pa.array(mask)), doc_of[: n_pos][mask]


def token_window_hash64(col, n: int) -> tuple[np.ndarray, np.ndarray]:
    """uint64 hashes of every within-document lowercased word
    ``n``-gram WITHOUT materializing gram strings: tokens are
    mmh3_64-hashed ONCE (short strings — 1 mixing block instead of the
    3+ a joined 35-byte gram costs), then each window combines its
    ``n`` consecutive token hashes with a positional rotate-multiply-
    xor chain + final avalanche.  Equal token sequences hash equal;
    distinct sequences collide with ~2⁻⁶⁴ probability — the same
    contract as mmh3-over-gram-string, minus the gram-column
    allocation and the long-string hash passes (the DRAM economy this
    host rewards; see CLAUDE.md).  Positional (non-commutative) mix:
    "a b" and "b a" differ.

    Returns ``(h, doc_idx)`` aligned with
    ``token_ngrams_flat(col, n)``'s windows.  Use where only window
    IDENTITY is consumed (duplicate-span counts, decontamination);
    keep :func:`token_ngrams_flat` where the gram STRINGS survive
    (indexes, PMI, top-k reports)."""
    from ..hashing import mmh3_64_batch

    trimmed, toks = _tokens_of(col)
    flat = pc.utf8_lower(toks.flatten())
    n_flat = len(flat)
    tok_counts = np.asarray(pc.list_value_length(toks), dtype=np.int64)
    if n_flat < n:
        return np.empty(0, np.uint64), np.empty(0, np.int64)
    h = mmh3_64_batch(flat).astype(np.uint64)
    n_pos = n_flat - n + 1
    with np.errstate(over="ignore"):
        acc = h[:n_pos].copy()
        for j in range(1, n):
            acc = ((acc << np.uint64(31)) | (acc >> np.uint64(33))) \
                * np.uint64(0x87C37B91114253D5)
            acc ^= h[j: j + n_pos]
        acc ^= acc >> np.uint64(33)
        acc *= np.uint64(0xFF51AFD7ED558CCD)
        acc ^= acc >> np.uint64(33)
    doc_of = np.repeat(np.arange(len(toks), dtype=np.int64), tok_counts)
    mask = doc_of[: n_pos] == doc_of[n - 1:]
    return acc[mask], doc_of[: n_pos][mask]


def top_bigrams(ds: "ray.data.Dataset", text_col: str = "text",
                k: int = 20) -> pa.Table:
    """Corpus-wide top-``k`` word bigrams by exact count, deterministic
    tie-break (count DESC, bigram ASC).  Distributed shape: per-batch
    bigram explode → ``grouped_agg`` count (in-batch pre-aggregation,
    the shuffle moves per-key partials) → per-block LOCAL top-k → tiny
    driver merge — no global sort anywhere (the anti-pattern
    ``sort().limit(k)`` would all-to-all the full bigram table)."""
    from ..pipelines.relational import grouped_agg

    def explode(batch: pa.Table) -> pa.Table:
        pairs, _ = bigram_flat(batch[text_col])
        return pa.table({"bigram": pairs})

    counts = grouped_agg(
        ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True),
        ["bigram"], [("n", None, "count")])

    def local_topk(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=[("n", "descending"),
                                                ("bigram", "ascending")])
        return batch.take(idx.slice(0, k))

    tops = counts.map_batches(local_topk, batch_format="pyarrow").take_all()
    merged = pa.Table.from_pylist(tops) if tops else pa.table(
        {"bigram": pa.array([], type=pa.string()),
         "n": pa.array([], type=pa.int64())})
    idx = pc.sort_indices(merged, sort_keys=[("n", "descending"),
                                             ("bigram", "ascending")])
    out = merged.take(idx.slice(0, k))
    return pa.table({"bigram": out["bigram"].combine_chunks(),
                     "n": pc.cast(out["n"].combine_chunks(), pa.int64())})


def repetition_stats_batch(col) -> tuple[np.ndarray, np.ndarray]:
    """Per-document Gopher-style repetition signal: ``(top_count,
    n_bigrams)`` — the count of the document's most frequent bigram and
    its total bigram count (0/0 for docs with < 2 tokens).  Exact
    within-document counting via one composite (doc, bigram-hash)
    sort + run-length pass; 64-bit hashing makes within-doc collisions
    astronomically unlikely (p ≈ m²/2⁶⁴ per doc) and the comparison is
    between bigrams of the SAME document only."""
    from ..hashing import mmh3_64_batch

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n_docs = len(col)
    pairs, doc_idx = bigram_flat(col)
    totals = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    if len(pairs) == 0:
        return np.zeros(n_docs, np.int64), totals
    h = mmh3_64_batch(pairs).astype(np.uint64)
    order = np.lexsort((h, doc_idx))
    d_s, h_s = doc_idx[order], h[order]
    new_run = np.ones(h_s.size, dtype=bool)
    np.logical_or(d_s[1:] != d_s[:-1], h_s[1:] != h_s[:-1], out=new_run[1:])
    run_starts = np.flatnonzero(new_run)
    run_lens = np.diff(np.append(run_starts, h_s.size))
    run_doc = d_s[run_starts]
    top = np.zeros(n_docs, np.int64)
    np.maximum.at(top, run_doc, run_lens)
    return top, totals


def repetition_gate(ds: "ray.data.Dataset", text_col: str, group_col: str,
                    *, num: int = 18, den: int = 100) -> "ray.data.Dataset":
    """Per-group count of documents whose top-bigram fraction exceeds
    ``num/den`` (Gopher's top-2-gram repetition gate at 0.18) —
    integer-exact: a doc is repetitive iff ``den·top > num·total``."""
    from ..pipelines.relational import grouped_agg

    def fn(batch: pa.Table) -> pa.Table:
        top, tot = repetition_stats_batch(batch[text_col])
        rep = (den * top > num * tot).astype(np.int64)
        return pa.table({group_col: batch[group_col],
                         "is_rep": pa.array(rep),
                         "top": pa.array(top),
                         "tot": pa.array(tot)})

    per_doc = ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_agg(per_doc, [group_col], [
        ("n_docs", None, "count"), ("n_repetitive", "is_rep", "sum"),
        ("sum_top_bigram", "top", "sum"), ("n_bigrams", "tot", "sum")])


# ---------------------------------------------------------------------------
# normalization — canonical text cleanup before dedup / fingerprinting
# ---------------------------------------------------------------------------

def normalize_text_arrow(col) -> pa.Array:
    """Canonical cleanup, fully Arrow-vectorized (re2 kernels): lowercase
    (Unicode), strip C0/C1 control chars, collapse every whitespace run
    (incl. NBSP and other Zs — the `_RE2_WS` class) to a single space,
    trim the ends.  Matches DuckDB's RE2-based lower+regexp_replace, so
    the stage is SQL-oracle-checkable."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = pc.utf8_lower(col)
    out = pc.replace_substring_regex(out, pattern=r"[\x00-\x08\x0e-\x1f\x7f]",
                                     replacement="")
    out = pc.replace_substring_regex(out, pattern=_RE2_WS, replacement=" ")
    out = pc.utf8_trim(out, characters=" ")
    return out


def nfc_normalize_batch(col) -> pa.Array:
    """Unicode NFC canonical composition of a string column, with an
    ASCII FAST PATH: ``pc.string_is_ascii`` masks the rows NFC cannot
    change (ASCII is NFC-invariant), and only the non-ASCII minority
    takes the per-string ``unicodedata.normalize`` call — Arrow ships
    no normalization kernel, so scalar Python is the honest in-process
    option (a production deployment would swap in a utf8proc/ICU
    binding; the stage contract — NFC semantics matching DuckDB's
    ``nfc_normalize`` — would not change).  Decomposed sequences
    (e.g. ``e`` + COMBINING ACUTE) compose to their canonical form, so
    visually identical texts dedup together."""
    import unicodedata

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    filled = pc.fill_null(col, "")
    ascii_mask = _np(pc.string_is_ascii(filled)).astype(bool)
    if ascii_mask.all():
        return filled
    vals = filled.to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(~ascii_mask)
    out = vals.copy()
    norm = unicodedata.normalize
    for i in idx:
        out[i] = norm("NFC", vals[i])
    return pa.array(out, type=pa.string())


def add_normalized(ds: "ray.data.Dataset", text_col: str = "text",
                   out_col: str = "text_norm") -> "ray.data.Dataset":
    """Append the normalized text column (streaming map_batches)."""

    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(out_col, normalize_text_arrow(batch[text_col]))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# PII detection / redaction — scrub emails, IPv4 addresses, phone numbers
# ---------------------------------------------------------------------------

# RE2 patterns (pyarrow.compute AND DuckDB both compile RE2, so a SQL
# oracle can run the *identical* pattern).  Deliberately brace-free
# ({m,n} quantifiers spelled out) so the patterns survive a driver that
# str.format()s the oracle SQL.
_RE2_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
_RE2_PII_IPV4 = r"\b\d+\.\d+\.\d+\.\d+\b"
_RE2_PII_PHONE = r"\b\+?\d\d\d[ .-]\d\d\d[ .-]\d\d\d\d\b"

# Ordered: emails first (their local/domain parts contain digit runs an
# IP/phone pattern could nibble), then IPs (dotted quads would otherwise
# feed the phone pattern), then phones.  Redaction is sequential over
# this order; counts are taken on the text as it stands at each step, so
# an oracle must apply the same nesting.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", _RE2_PII_EMAIL),
    ("ipv4", _RE2_PII_IPV4),
    ("phone", _RE2_PII_PHONE),
)


def pii_scrub_arrow(col, token: str = "<PII>"):
    """Redact PII from a string array.  Returns ``(redacted, counts)``
    where ``counts`` maps category -> int64 numpy array of per-row match
    counts (counted at the step's intermediate text, matching nested
    ``regexp_replace`` oracle semantics).  One re2 pass per category —
    no Python per-row work."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    out = pc.fill_null(col, "")
    counts: dict[str, np.ndarray] = {}
    for name, pat in PII_PATTERNS:
        counts[name] = _np(pc.count_substring_regex(out, pat)).astype(np.int64)
        out = pc.replace_substring_regex(out, pattern=pat, replacement=token)
    return out, counts


def add_pii_scrub(ds: "ray.data.Dataset", text_col: str = "text",
                  out_col: str = "text_redacted",
                  token: str = "<PII>") -> "ray.data.Dataset":
    """Append the redacted text plus per-category match counts and the
    number of characters removed (streaming map_batches stage)."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        red, counts = pii_scrub_arrow(col, token=token)
        orig_len = _np(pc.utf8_length(pc.fill_null(col, ""))).astype(np.int64)
        red_len = _np(pc.utf8_length(red)).astype(np.int64)
        out = batch.append_column(out_col, red)
        for name, arr in counts.items():
            out = out.append_column(f"n_{name}", pa.array(arr, type=pa.int64()))
        return out.append_column(
            "chars_redacted", pa.array(orig_len - red_len, type=pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# byte-distribution entropy — compressibility / gibberish quality signal
# ---------------------------------------------------------------------------

def byte_entropy_by_group(ds: "ray.data.Dataset", text_col: str = "text",
                          group_col: str = "lang") -> "ray.data.Dataset":
    """Per-group Shannon entropy of the utf-8 byte distribution — a
    cheap, model-free gibberish/compressibility signal.

    Scale shape: each batch reduces its text to ≤ 256 ``(group, byte,
    count)`` rows per group present (one ``np.bincount`` over the Arrow
    values buffer — zero per-row Python), the grouped sum shuffles those
    tiny rows, and the reducer computes entropy over ≤ 256 counts.
    Entropy is returned as an integer: the SUM of per-byte micro-nat
    terms ``floor((cnt/total)·ln(total/cnt)·1e6 + 0.5)`` — each term is
    deterministic (libm ln, fixed IEEE tree) and integer addition is
    order-independent, so the result is bit-reproducible in SQL no
    matter how either engine orders the aggregation.  (On an ASCII
    corpus a char-level SQL mirror is byte-identical.)
    """
    import math

    from ..pipelines.relational import grouped_agg

    def partial(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch[text_col].combine_chunks(), "")
        groups = batch[group_col].combine_chunks()
        gs: list[str] = []
        bs: list[np.ndarray] = []
        cs: list[np.ndarray] = []
        for g in pc.unique(groups).to_pylist():     # bounded by #groups
            sel = pc.filter(col, pc.equal(groups, g))
            if isinstance(sel, pa.ChunkedArray):
                sel = sel.combine_chunks()
            offs = np.frombuffer(sel.buffers()[1], dtype=np.int32,
                                 count=len(sel) + 1)
            data = np.frombuffer(sel.buffers()[2], dtype=np.uint8,
                                 count=int(offs[-1]))
            hist = np.bincount(data[int(offs[0]):], minlength=256)
            nz = np.nonzero(hist)[0]
            gs.extend([g] * len(nz))
            bs.append(nz.astype(np.int64))
            cs.append(hist[nz].astype(np.int64))
        if not gs:
            return pa.table({group_col: pa.array([], type=pa.string()),
                             "byte": pa.array([], type=pa.int64()),
                             "cnt": pa.array([], type=pa.int64())})
        return pa.table({group_col: pa.array(gs, type=pa.string()),
                         "byte": pa.array(np.concatenate(bs)),
                         "cnt": pa.array(np.concatenate(cs))})

    hist_ds = grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        [group_col, "byte"], [("cnt", "cnt", "sum")])

    def per_group(group: pa.Table) -> pa.Table:
        cnts = np.asarray(group["cnt"], dtype=np.int64)
        total = int(cnts.sum())
        tot_f = float(total)
        ent = sum(int(math.floor((c / tot_f) * math.log(tot_f / c) * 1e6 + 0.5))
                  for c in cnts.tolist())
        return pa.table({
            group_col: group[group_col].slice(0, 1),
            "total_bytes": pa.array([total], type=pa.int64()),
            "distinct_bytes": pa.array([len(cnts)], type=pa.int64()),
            "entropy_unats": pa.array([ent], type=pa.int64()),
        })

    return hist_ds.groupby(group_col).map_groups(
        per_group, batch_format="pyarrow")


def bigram_lm_scores(
    ds: "ray.data.Dataset",
    text_col: str,
    id_col: str,
    *,
    scale: int = 1_000_000,
) -> "ray.data.Dataset":
    """In-corpus bigram language-model scoring — the perplexity-style
    quality signal of a training-data pipeline, trained and applied over
    the SAME corpus in one job.

    Model: ``p(w2 | w1) = c(w1,w2) / c(w1,·)`` with the context count
    derived by re-aggregating the bigram counts (so only ONE count
    shuffle exists and every scored bigram has ``c ≥ 1`` — no smoothing
    term to mirror in SQL).  Output per document: ``sum_logprob_u`` (the
    integer micro-log-prob ``floor(scale·ln(p) + 0.5)`` summed over its
    bigrams — libm ``ln`` on an IEEE expression both numpy and a SQL
    engine reproduce bit-for-bit, the ``bm25_topk`` precedent) and
    ``n_bigrams``; single-word documents have no bigrams and drop out,
    like the SQL GROUP BY they mirror.

    Scale shape: explode → per-batch partial counts → one keyed count
    shuffle → a vocabulary-scale keyed groupby stitching ``cw`` onto the
    bigram counts → ONE large-large hash join of the exploded corpus
    against that count table — keyed exchanges sized by token count,
    never a broadcast of an unbounded vocabulary — → per-doc grouped
    sum.  The explode runs twice (count pass + score pass) rather than
    materializing the exploded corpus mid-pipeline.
    """
    from ..pipelines.relational import grouped_agg, hash_join

    def explode(batch: pa.Table) -> pa.Table:
        pairs, idx = bigram_flat(batch[text_col].combine_chunks())
        ids = np.asarray(batch[id_col], dtype=np.int64)[idx]
        w1 = pc.list_element(pc.split_pattern(pairs, _BIGRAM_SEP), 0)
        return pa.table({id_col: pa.array(ids), "bg": pairs, "w1": w1})

    bg = ds.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)

    def partial_counts(batch: pa.Table) -> pa.Table:
        g = batch.select(["bg", "w1"]).group_by(["bg", "w1"]).aggregate([([], "count_all")])
        return g.rename_columns(["bg", "w1", "c"])

    cb = grouped_agg(
        bg.map_batches(partial_counts, batch_format="pyarrow", zero_copy_batch=True),
        ["bg", "w1"], [("c", "c", "sum")])

    # Stitch the context total onto each bigram count with a keyed
    # groupby, NOT a second join: Ray's hash-shuffle join emits
    # schema-less EMPTY blocks for empty partitions, and feeding a join
    # output into another join explodes on them (map_batches passes
    # empty blocks through untouched, so a normalizing map can't help —
    # groupby is the one downstream op that tolerates them).
    def attach_cw(group: pa.Table) -> pa.Table:
        cw = pc.sum(group["c"]).as_py()
        return pa.table({
            "bg": group["bg"], "c": group["c"],
            "cw": pa.array(np.full(len(group), cw, dtype=np.int64)),
        })

    cj = cb.groupby("w1").map_groups(attach_cw, batch_format="pyarrow")
    joined = hash_join(bg.drop_columns(["w1"]), cj, on="bg")

    def score(batch: pa.Table) -> pa.Table:
        c = np.asarray(batch["c"], dtype=np.float64)
        cw = np.asarray(batch["cw"], dtype=np.float64)
        lp = np.floor(scale * np.log(c / cw) + 0.5).astype(np.int64)
        return pa.table({id_col: batch[id_col], "lp": pa.array(lp)})

    scored = joined.map_batches(score, batch_format="pyarrow", zero_copy_batch=True)
    return grouped_agg(scored, [id_col], [
        ("sum_logprob_u", "lp", "sum"),
        ("n_bigrams", None, "count"),
    ])


def levenshtein_batch(a_words: list[str], b_words: list[str]) -> np.ndarray:
    """Exact character-level Levenshtein distance for N word pairs at
    once: code-point matrices (utf-32 decode, so multi-byte characters
    count as one edit like DuckDB's ``levenshtein``) + the textbook DP
    with BOTH loops over character positions and every cell update
    vectorized across the pair axis — O(Lmax²) numpy kernels instead of
    O(N·L²) Python steps.  Each pair's answer is harvested from the DP
    row matching its left length, so ragged lengths need no per-pair
    code path."""
    n = len(a_words)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    a_cp = [np.frombuffer(w.encode("utf-32-le"), dtype=np.uint32)
            for w in a_words]
    b_cp = [np.frombuffer(w.encode("utf-32-le"), dtype=np.uint32)
            for w in b_words]
    la = np.array([len(x) for x in a_cp], dtype=np.int64)
    lb = np.array([len(x) for x in b_cp], dtype=np.int64)
    L1, L2 = int(la.max(initial=0)), int(lb.max(initial=0))
    A = np.zeros((n, max(L1, 1)), dtype=np.uint32)
    B = np.zeros((n, max(L2, 1)), dtype=np.uint32)
    for i, x in enumerate(a_cp):
        A[i, :len(x)] = x
    for i, x in enumerate(b_cp):
        B[i, :len(x)] = x
    prev = np.tile(np.arange(L2 + 1, dtype=np.int64), (n, 1))
    final = np.where(la == 0, lb, 0).astype(np.int64)
    for i in range(1, L1 + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, L2 + 1):
            cost = (ai != B[:, j - 1]).astype(np.int64)
            np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1, out=cur[:, j])
            np.minimum(cur[:, j], prev[:, j - 1] + cost, out=cur[:, j])
        done = la == i
        if done.any():
            final[done] = cur[done, lb[done]]
        prev = cur
    return final


def edit_distance_pairs(
    ds: "ray.data.Dataset",
    text_col: str = "text",
    max_dist: int = 2,
    *,
    max_bucket: int = 512,
    batch_size: int = 65536,
) -> "ray.data.Dataset":
    """Fuzzy string self-join over the corpus VOCABULARY: all unordered
    pairs of distinct lowercased whitespace tokens within Levenshtein
    distance ``max_dist``, with the exact distance attached — spelling
    variants / OCR-noise mining for a crawl corpus.

    Scale shape — symmetric-delete (SymSpell) blocking, never all
    pairs: if ``lev(a, b) ≤ d`` then deleting the substituted/deleted
    chars from ``a`` and the substituted/inserted chars from ``b``
    (any optimal alignment) leaves the SAME subsequence, so the two
    ≤ d-deletion neighborhoods intersect — candidates are exactly the
    words sharing a deletion-variant block key (a hash shuffle), no
    quadratic scan.  Corpus-scale work is one tokenize + per-batch
    unique; everything after operates on the DISTINCT vocabulary
    (orders of magnitude smaller), where the per-word Python variant
    loop is acceptable.  Buckets cap at ``max_bucket`` words
    (deterministic lexicographic truncation, same convention as the
    LSH families); candidate pairs dedupe in one grouped count before
    ONE vectorized DP verify (:func:`levenshtein_batch`) per batch.
    """
    from ..pipelines.relational import grouped_agg

    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")

    def vocab_batch(batch: pa.Table) -> pa.Table:
        trimmed, toks = _tokens_of(batch[text_col])
        mask = pc.not_equal(trimmed, "")
        flat = pc.list_flatten(toks.filter(mask))
        return pa.table({"w": pc.unique(pc.utf8_lower(flat))})

    vocab = grouped_agg(
        ds.map_batches(vocab_batch, batch_size=batch_size,
                       batch_format="pyarrow", zero_copy_batch=True),
        ["w"], [("n", None, "count")])

    def explode_deletions(batch: pa.Table) -> pa.Table:
        keys: list[str] = []
        words: list[str] = []
        for w in batch["w"].to_pylist():
            L = len(w)
            var = {w}
            if max_dist >= 1:
                for i in range(L):
                    var.add(w[:i] + w[i + 1:])
            if max_dist >= 2:
                for i in range(L):
                    for j in range(i + 1, L):
                        var.add(w[:i] + w[i + 1:j] + w[j + 1:])
            keys.extend(var)
            words.extend([w] * len(var))
        return pa.table({"key": pa.array(keys, type=pa.string()),
                         "w": pa.array(words, type=pa.string())})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ws = sorted(set(group["w"].to_pylist()))[:max_bucket]
        lens = np.array([len(w) for w in ws], dtype=np.int64)
        w1: list[str] = []
        w2: list[str] = []
        for i in range(len(ws)):
            for j in range(i + 1, len(ws)):
                if abs(int(lens[i] - lens[j])) <= max_dist:
                    w1.append(ws[i])
                    w2.append(ws[j])
        return pa.table({"w1": pa.array(w1, type=pa.string()),
                         "w2": pa.array(w2, type=pa.string())})

    cand = grouped_agg(
        vocab.map_batches(explode_deletions, batch_size=batch_size,
                          batch_format="pyarrow")
        .groupby("key").map_groups(bucket_pairs, batch_format="pyarrow"),
        ["w1", "w2"], [("c", None, "count")])

    def verify(batch: pa.Table) -> pa.Table:
        a = batch["w1"].to_pylist()
        b = batch["w2"].to_pylist()
        dist = levenshtein_batch(a, b)
        keep = dist <= max_dist
        return pa.table({
            "w1": batch["w1"].combine_chunks().filter(pa.array(keep)),
            "w2": batch["w2"].combine_chunks().filter(pa.array(keep)),
            "dist": pa.array(dist[keep], type=pa.int64()),
        })

    return cand.map_batches(verify, batch_size=batch_size,
                            batch_format="pyarrow")
