"""Deterministic Common-Crawl-style ``pages`` corpus (FIXTURES.md §1).

``generate_pages(n_rows, seed)`` is a pure function: the same
``(n_rows, seed)`` yields byte-identical Arrow content, and
``write_pages(dir, ...)`` fixes row-group size + compression so the
Parquet bytes are reproducible too (per-partition checkpoint / resume
tests depend on this).

Schema — exactly the BASELINE.json ``input_hint`` shape:

    url:     string        (Zipf(s=1.1) domains; ~10 % exact dup urls)
    warc_ts: timestamp[us] (monotone-ish crawl times, seeded jitter)
    html:    binary        (deterministic template, log-normal-ish size)
    text:    string        (ORACLE column: text = extract_text(html))
    lang:    string        (skewed: en≈60 %, geometric tail)

``extract_text`` is the repo's FROZEN extractor: tag-strip +
whitespace-collapse.  The per-row invariant (pipeline-extracted text
byte-identical to the stored ``text`` per url) is the engine's
correctness canary; the reference repo has no extractor, so this
definition is the oracle (SURVEY.md §2.9).

~5 % of pages are near-duplicates of an earlier page (one sentence
dropped) — fuel for the MinHash/SimHash dedup operators.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["en", "de", "fr", "es", "zh", "ru", "ja", "pt", "it", "nl"]
LANG_PROBS = np.array([0.60, 0.10, 0.08, 0.06, 0.05, 0.04, 0.03, 0.02, 0.013, 0.007])

N_DOMAINS = 1000
ZIPF_S = 1.1
DUP_FRACTION = 0.10       # exact duplicate urls (re-crawls)
NEAR_DUP_FRACTION = 0.05  # near-duplicate pages (dedup-operator fuel)
EPOCH_US = np.datetime64("2025-01-01T00:00:00", "us").astype(np.int64)
CRAWL_WINDOW_S = 72 * 3600

_TAG_RE = re.compile(r"<[^>]+>")

_SYLLABLES = [
    "ba", "be", "bo", "da", "de", "du", "fa", "go", "ka", "ke", "ko", "la",
    "le", "lo", "ma", "me", "mi", "na", "ne", "no", "pa", "po", "ra", "re",
    "ri", "ro", "sa", "se", "so", "ta", "te", "to", "va", "ve", "za", "zo",
]


def extract_text(html: str | bytes) -> str:
    """FROZEN text extractor: strip tags, collapse whitespace.

    This definition is the oracle for the per-row invariant — do not
    change it without regenerating every fixture.
    """
    if isinstance(html, bytes):
        html = html.decode("utf-8")
    return " ".join(_TAG_RE.sub(" ", html).split())


def extract_text_batch(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized-per-batch form of :func:`extract_text` (compiled regex,
    one Python call per row — the stage stays a stateless map_batches)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
        vals = [extract_text(v.as_py()) if v.is_valid else None for v in arr]
    else:
        vals = [extract_text(v.as_py()) if v.is_valid else None for v in arr]
    return pa.array(vals, type=pa.string())


def _make_vocab(rng: np.random.Generator, n_words: int = 4000) -> list[str]:
    syl = rng.integers(0, len(_SYLLABLES), size=(n_words, 4))
    lens = rng.integers(2, 5, size=n_words)
    return ["".join(_SYLLABLES[s] for s in syl[i, : lens[i]]) for i in range(n_words)]


def generate_pages(n_rows: int, seed: int = 42) -> pa.Table:
    """Pure deterministic generator — see module docstring."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_make_vocab(rng), dtype=object)

    # domains, Zipf-skewed (heavy-hitter fuel)
    dom_ranks = np.arange(1, N_DOMAINS + 1, dtype=np.float64)
    dom_p = dom_ranks**-ZIPF_S
    dom_p /= dom_p.sum()
    domains = np.array([f"site{i:04d}.example" for i in range(N_DOMAINS)], dtype=object)

    # sentence pool (shared sentences → realistic near-dup structure)
    n_sentences = max(500, min(50_000, n_rows // 4))
    sent_words = rng.integers(5, 13, size=n_sentences)
    sent_idx = rng.integers(0, len(vocab), size=int(sent_words.sum()))
    sentences = np.empty(n_sentences, dtype=object)
    pos = 0
    for i, w in enumerate(sent_words):
        sentences[i] = " ".join(vocab[sent_idx[pos : pos + w]])
        pos += w

    n_unique = max(1, int(n_rows * (1 - DUP_FRACTION)))

    # unique pages
    page_dom = rng.choice(N_DOMAINS, size=n_unique, p=dom_p)
    title_words = rng.integers(2, 6, size=n_unique)
    title_idx = rng.integers(0, len(vocab), size=int(title_words.sum()))
    n_paras = rng.integers(1, 9, size=n_unique)
    para_idx = rng.integers(0, n_sentences, size=int(n_paras.sum()))
    langs = rng.choice(len(LANGS), size=n_unique, p=LANG_PROBS)

    urls = np.empty(n_unique, dtype=object)
    htmls = np.empty(n_unique, dtype=object)
    page_sents: list[np.ndarray] = []
    tpos = 0
    ppos = 0
    near_dup_coin = rng.random(n_unique)
    for i in range(n_unique):
        tw = title_words[i]
        title = " ".join(vocab[title_idx[tpos : tpos + tw]])
        tpos += tw
        np_i = n_paras[i]
        sidx = para_idx[ppos : ppos + np_i]
        ppos += np_i
        if i > 0 and near_dup_coin[i] < NEAR_DUP_FRACTION:
            # near-duplicate of an earlier page: same sentences minus one
            src = int(rng.integers(0, i))
            prev = page_sents[src]
            sidx = prev[:-1] if len(prev) > 1 else prev
        page_sents.append(sidx)
        paras = "".join(f"<p>{sentences[j]}</p>" for j in sidx)
        urls[i] = f"https://{domains[page_dom[i]]}/p/{i:08d}"
        htmls[i] = (
            f"<html><head><title>{title}</title></head><body>{paras}</body></html>"
        )

    # exact duplicates (re-crawls of the same url → same html/text/lang)
    n_dup = n_rows - n_unique
    dup_src = rng.integers(0, n_unique, size=n_dup)
    all_url = np.concatenate([urls, urls[dup_src]])
    all_html = np.concatenate([htmls, htmls[dup_src]])
    all_lang = np.concatenate([langs, langs[dup_src]])

    # crawl order: interleave deterministically, then monotone-ish times
    order = rng.permutation(n_rows)
    all_url = all_url[order]
    all_html = all_html[order]
    all_lang = all_lang[order]
    base = np.linspace(0, CRAWL_WINDOW_S, n_rows, endpoint=False)
    jitter = rng.normal(0, CRAWL_WINDOW_S / max(n_rows, 1) / 2, n_rows)
    ts_us = EPOCH_US + ((base + np.abs(jitter)) * 1e6).astype(np.int64)

    texts = [extract_text(h) for h in all_html]
    lang_arr = np.array(LANGS, dtype=object)[all_lang]

    return pa.table(
        {
            "url": pa.array(all_url, type=pa.string()),
            "warc_ts": pa.array(ts_us, type=pa.timestamp("us")),
            "html": pa.array([h.encode() for h in all_html], type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(lang_arr, type=pa.string()),
        }
    )


def write_pages(path: str, n_rows: int, seed: int = 42,
                row_group_size: int = 8_192, chunk_rows: int = 250_000) -> str:
    """Write the corpus as a reproducible Parquet DIRECTORY (one file per
    generation chunk, fixed row groups, zstd).

    Sharding into multiple files mirrors real many-file corpora: Ray
    Data assigns one read task per file, so the scan parallelizes from
    the very first operator instead of serializing on a single-file
    read.  Chunks are sub-seeded (seed*1000+chunk) so the bench tier
    never holds the whole corpus in memory.
    """
    os.makedirs(path, exist_ok=True)
    chunks = []
    written = 0
    chunk_id = 0
    while written < n_rows:
        take = min(chunk_rows, n_rows - written)
        chunks.append((chunk_id, take))
        written += take
        chunk_id += 1
    if len(chunks) > 1:
        # chunks are independently sub-seeded → generate in parallel
        import concurrent.futures as cf

        with cf.ProcessPoolExecutor(max_workers=min(8, len(chunks))) as ex:
            list(ex.map(_write_pages_chunk,
                        [(path, cid, take, seed, row_group_size) for cid, take in chunks]))
    else:
        for cid, take in chunks:
            _write_pages_chunk((path, cid, take, seed, row_group_size))
    return path


def _write_pages_chunk(args: tuple) -> None:
    path, chunk_id, take, seed, row_group_size = args
    tbl = generate_pages(take, seed * 1000 + chunk_id)
    pq.write_table(tbl, os.path.join(path, f"part-{chunk_id:05d}.parquet"),
                   compression="zstd", row_group_size=row_group_size)


def pages_fixture(n_rows: int, seed: int = 42,
                  cache_dir: str | None = None) -> str:
    """Cached corpus path (a Parquet directory) for tests/bench —
    generated once per (n, seed).

    Multi-node note: the default cache lives under local ``/tmp``,
    which only works when driver and workers share a filesystem (the
    single-node sandbox).  On a real cluster set ``GRAFT_FIXTURE_DIR``
    to a shared mount so every node's read tasks can open the files —
    the fixture is generated driver-side but READ by workers."""
    if cache_dir is None:
        cache_dir = os.environ.get("GRAFT_FIXTURE_DIR",
                                   "/tmp/archbloom_fixtures")
    # v3: multi-file directory + 8k row groups so Ray Data reads split
    # into enough read tasks AND blocks to keep a whole pool busy
    path = os.path.join(cache_dir, f"pages_v3_n{n_rows}_s{seed}")
    if not os.path.isdir(path):
        tmp = path + ".tmp"
        write_pages(tmp, n_rows, seed)
        os.replace(tmp, path)  # atomic: concurrent bench runs see all-or-nothing
    return path
