"""URL analysis stages — the web-crawl bookkeeping a pages pipeline
needs: vectorized structural parsing (scheme / domain / TLD / path
depth) and per-group deterministic sampling.

All kernels are Arrow ``split_pattern`` / slice compositions — no
Python loop touches a row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def parse_urls(col) -> pa.Table:
    """Vectorized URL structure: ``scheme``, ``domain``, ``tld``,
    ``path_depth`` (number of non-empty path segments) for a string
    column.  Mirrors ``split_part``-style SQL semantics exactly:
    domain = the third ``/``-separated field, tld = the last ``.``
    field of the domain, scheme = text before ``://`` (empty when
    absent), depth = non-empty segments after the third ``/``."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    # scheme: the "name://" prefix when present, else ''
    scheme = pc.fill_null(pc.struct_field(
        pc.extract_regex(col, r"^(?P<s>[A-Za-z][A-Za-z0-9+.-]*)://"), "s"), "")
    parts = pc.split_pattern(col, "/")
    # domain = third '/'-field (split_part(url,'/',3)); '' when absent
    domain = pc.fill_null(pc.list_element(
        pc.list_slice(parts, 2, 3, return_fixed_size_list=True), 0), "")
    # tld = text after the domain's LAST dot (greedy re2, both engines)
    tld = pc.replace_substring_regex(domain, r"^.*\.", "")
    # path depth: non-empty '/'-fields from the fourth onward
    tail = pc.list_slice(parts, 3, 1 << 30, return_fixed_size_list=False)
    flat = tail.flatten()
    counts = np.asarray(pc.list_value_length(tail), dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(counts[:-1])))
    ne = np.asarray(pc.cast(pc.not_equal(flat, ""), pa.int64()), dtype=np.int64)
    if ne.size:
        depth = np.add.reduceat(ne, np.minimum(starts, ne.size - 1))
        depth[counts == 0] = 0
    else:
        depth = np.zeros(len(counts), dtype=np.int64)
    return pa.table({
        "scheme": scheme, "domain": domain, "tld": tld,
        "path_depth": pa.array(depth.astype(np.int64)),
    })


def canonical_urls(col) -> pa.Array:
    """Vectorized crawl-URL canonicalization — the normalization a
    frontier/dedup stage applies before URL-keyed membership or exact
    dedup.  Spec (each step an RE2 kernel, so a SQL oracle using the
    SAME regexes matches byte-for-byte):

    1. drop the fragment (``#.*$``);
    2. lowercase the scheme and the hostport — NOT the userinfo
       (``user:Pass@`` is case-sensitive per RFC 3986 §3.2.1) and NOT
       the path;
    3. drop a default port (``:443`` under https, ``:80`` under http);
    4. drop a TRAILING ``?utm_*=...`` tracker only when that ``?`` is
       the QUERY delimiter (no earlier ``?``/``#`` — a literal ``?``
       inside a query value must survive; full query-param reordering
       is deliberately out of scope).

    Rows without a ``scheme://`` prefix pass through steps 2-3
    unchanged.  Returns a string array aligned with ``col``.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    u1 = pc.replace_substring_regex(col, r"#.*$", "")
    # authority ends at '/', '?' or '#': a query-without-path URL must
    # NOT fold its query into the hostport (case/port rules would then
    # corrupt query values) or into the userinfo
    _AUTH = r"^(?P<s>[^:/?#]+)://(?P<ui>[^/?#@]*@)?(?P<hp>[^/?#]*)"
    parts = pc.extract_regex(u1, _AUTH)
    scheme = pc.utf8_lower(pc.fill_null(pc.struct_field(parts, "s"), ""))
    ui = pc.fill_null(pc.struct_field(parts, "ui"), "")
    hp = pc.utf8_lower(pc.fill_null(pc.struct_field(parts, "hp"), ""))
    hp = pc.if_else(pc.equal(scheme, "https"),
                    pc.replace_substring_regex(hp, r"^(.*):443$", r"\1"),
                    hp)
    hp = pc.if_else(pc.equal(scheme, "http"),
                    pc.replace_substring_regex(hp, r"^(.*):80$", r"\1"),
                    hp)
    tail = pc.replace_substring_regex(u1, _AUTH.replace("(?P<s>", "(?:")
                                      .replace("(?P<ui>", "(?:")
                                      .replace("(?P<hp>", "(?:"),
                                      "", max_replacements=1)
    rebuilt = pc.binary_join_element_wise(scheme, "://", ui, hp, tail, "")
    joined = pc.if_else(pc.equal(scheme, ""), u1, rebuilt)
    return pc.replace_substring_regex(
        joined, r"^([^?#]*)\?utm_[^&#]*$", r"\1")


def add_url_parts(ds: "ray.data.Dataset", url_col: str = "url") -> "ray.data.Dataset":
    """Append the parsed URL columns."""

    def fn(batch: pa.Table) -> pa.Table:
        parsed = parse_urls(batch[url_col])
        for name in parsed.column_names:
            batch = batch.append_column(name, parsed[name])
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(
    ds: "ray.data.Dataset",
    group_col: str,
    id_col: str,
    k: "int | dict",
    *,
    seed: int = 42,
) -> "ray.data.Dataset":
    """Deterministic k-per-group sample: keep each group's ``k`` rows
    with the smallest ``mmh3_64(id, seed)`` — the per-group bottom-k,
    i.e. a uniform-without-replacement sample of each group that is
    IDENTICAL across runs, cluster sizes and resumes (no RNG state).
    ``k`` may be a dict {group value: quota} for per-stratum budgets
    (groups absent from the dict get 0); an int applies uniformly.
    Mergeable shape: per-batch local bottom-k per group (cheap — at
    most k rows per (batch, group) survive), then one groupby keeps
    the global bottom-k."""
    from ..hashing import mmh3_64_batch

    kmap = dict(k) if isinstance(k, dict) else None
    if kmap is not None and (not kmap or max(kmap.values()) <= 0):
        # zero strata (or all-zero quotas): an empty draw — short-
        # circuit rather than shipping a null-typed value_set into
        # pc.index_in inside workers
        return ds.limit(0)
    if kmap is not None:
        k_keys = pa.array(list(kmap.keys()))
        k_vals = np.fromiter(kmap.values(), dtype=np.int64,
                             count=len(kmap))

    def k_of(groups: pa.Array) -> np.ndarray:
        """Per-row quota for a group-value array."""
        if kmap is None:
            return np.full(len(groups), int(k), dtype=np.int64)
        idx = pc.index_in(groups, value_set=k_keys)
        pos = idx.to_numpy(zero_copy_only=False)
        out = np.zeros(len(groups), dtype=np.int64)
        hit = ~np.isnan(pos) if pos.dtype.kind == "f" else \
            np.asarray(idx.is_valid())
        out[hit] = k_vals[pos[hit].astype(np.int64)]
        return out

    def local(batch: pa.Table) -> pa.Table:
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        key = ids if pa.types.is_string(ids.type) else pc.cast(ids, pa.string())
        h = mmh3_64_batch(key, seed=seed).astype(np.uint64)
        batch = batch.append_column("_h", pa.array(h.astype(np.int64)))
        idx = pc.sort_indices(batch, sort_keys=[(group_col, "ascending"),
                                                ("_h", "ascending")])
        t = batch.take(idx)
        g = np.asarray(pc.index_in(
            t[group_col], t[group_col].combine_chunks().unique()))
        # rank within group = position - first position of the group
        first = np.zeros(g.max() + 1 if g.size else 0, dtype=np.int64)
        if g.size:
            changes = np.flatnonzero(np.diff(g) != 0) + 1
            starts = np.concatenate(([0], changes))
            first[g[starts]] = starts
            rank = np.arange(len(t)) - first[g]
            kk = k_of(t[group_col].combine_chunks())
            t = t.filter(pa.array(rank < kk))
        return t

    pruned = ds.map_batches(local, batch_format="pyarrow", zero_copy_batch=True)

    def global_topk(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("_h", "ascending")])
        gk = int(k_of(group[group_col].combine_chunks().slice(0, 1))[0])
        return group.take(idx.slice(0, gk)).drop_columns(["_h"])

    return pruned.groupby(group_col).map_groups(global_topk, batch_format="pyarrow")
