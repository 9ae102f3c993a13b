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

import ray.data

# token that approximates a BPE pre-tokenizer's word splits (GPT-2-style
# contractions + letter runs + digit runs + punctuation runs)
_BPE_ISH = re.compile(r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+")
_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[^\w\s]")
_DIGIT = re.compile(r"\d")

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
    """(whitespace tokens, BPE-ish tokens) per text."""
    ws = np.fromiter((len(tokenize_ws(t or "")) for t in texts), dtype=np.int64, count=len(texts))
    bpe = np.fromiter(
        (sum(1 for m in _BPE_ISH.finditer(t or "") if not m.group().isspace()) for t in texts),
        dtype=np.int64,
        count=len(texts),
    )
    return ws, bpe


def add_token_counts(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    """Append ``n_tokens_ws`` and ``n_tokens_bpe`` columns."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ws, bpe = count_tokens_batch(texts)
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

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._classify(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column(self.out_col, pa.array(preds, type=pa.string()))


def add_language_id(ds: "ray.data.Dataset", text_col: str = "text",
                    concurrency: int = 4) -> "ray.data.Dataset":
    return ds.map_batches(
        LanguageId,
        fn_constructor_args=(text_col,),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def quality_features_batch(texts: list[str]) -> dict[str, np.ndarray]:
    """Deterministic quality signals per text (C4/Gopher-style cheap
    heuristics: length, word stats, punctuation/digit ratios,
    repetition)."""
    n = len(texts)
    n_chars = np.zeros(n, np.int64)
    n_words = np.zeros(n, np.int64)
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
            dup_word_ratio[i] = 1.0 - len(set(lower)) / len(words)
        if t:
            punct_ratio[i] = len(_PUNCT.findall(t)) / len(t)
            digit_ratio[i] = len(_DIGIT.findall(t)) / len(t)
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "stop_ratio": stop_ratio,
        "dup_word_ratio": dup_word_ratio,
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


def add_quality(ds: "ray.data.Dataset", text_col: str = "text") -> "ray.data.Dataset":
    """Append the quality feature columns + ``quality_score``."""

    def fn(batch: pa.Table) -> pa.Table:
        feat = quality_features_batch(batch[text_col].to_pylist())
        out = batch
        for name, arr in feat.items():
            if name in out.column_names:
                continue  # don't clobber an existing (e.g. exact) column
            out = out.append_column(name, pa.array(arr))
        return out.append_column("quality_score", pa.array(quality_score(feat)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# 64-bit polynomial rolling hash (Rabin–Karp style) — the document
# fingerprint primitive.  Vectorized: fp = Σ byte[i]·B^(L-1-i) mod 2^64.
_FP_BASE = np.uint64(1099511628211)  # FNV prime as the polynomial base


def fingerprint_batch(texts: list[str]) -> np.ndarray:
    """Vectorized per-row polynomial hash: one numpy dot per row over
    precomputable powers (no Python inner loop over bytes)."""
    if not texts:
        return np.empty(0, dtype=np.uint64)
    enc = [(t or "").encode("utf-8") for t in texts]
    max_len = max((len(e) for e in enc), default=0)
    with np.errstate(over="ignore"):
        powers = np.empty(max(max_len, 1), dtype=np.uint64)
        powers[0] = 1
        for i in range(1, max_len):
            powers[i] = powers[i - 1] * _FP_BASE
        out = np.zeros(len(enc), dtype=np.uint64)
        for i, e in enumerate(enc):
            if not e:
                continue
            b = np.frombuffer(e, dtype=np.uint8).astype(np.uint64)
            out[i] = np.sum(b * powers[: len(b)][::-1], dtype=np.uint64)
    return out


def add_fingerprint(ds: "ray.data.Dataset", text_col: str = "text",
                    out_col: str = "fingerprint") -> "ray.data.Dataset":
    def fn(batch: pa.Table) -> pa.Table:
        fps = fingerprint_batch(batch[text_col].to_pylist())
        return batch.append_column(out_col, pa.array(fps.astype(np.int64)))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
