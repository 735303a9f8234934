"""Deduplication operators over document Datasets.

- exact_dedup: content-hash -> hash exchange -> keep the min doc id per
  distinct content (one exchange on the hash key).
- minhash_lsh_pairs: one tokenization pass -> per-doc unique
  shingle-hash sets -> vectorized minhash banding -> slim
  (bucket, doc_id) exchange -> candidate pairs -> exact-Jaccard verify
  from the gram sets (text never enters a shuffle).
- jaccard_pairs: EXACT n-gram Jaccard pairs — gram-hash inverted index
  for candidates (complete: any pair with Jaccard > 0 shares a gram),
  same verify.
- simhash_signatures: 64-bit simhash per document, bit votes reduced
  over one bit matrix.
- embedding_neardup_pairs: cosine >= threshold pairs via multi-probe
  sign-LSH buckets (guaranteed co-location margin) + in-bucket matmul.

All hashes are process-stable (FNV/splitmix), never builtin hash();
every shuffle is a one-pass hash exchange (relational.hash_exchange_map).
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..images.synth import splitmix64
from .analysis import _hash63, _hash63_batch

_TOKEN_RE = re.compile(r"\S+")

_PAIR_CAND_SCHEMA = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64())])


def _enumerate_bucket_pairs(
    keys: np.ndarray, ids: np.ndarray, *, cap: int = 0, what: str = "bucket"
) -> pa.Table:
    """All unordered distinct-id pairs (a_id < b_id) within each key
    group, vectorized: ONE lexsort, consecutive (key, id) dedup, then
    ``np.triu_indices`` per surviving group — no per-pair Python loop.

    ``cap`` > 0 skips groups with more than ``cap`` distinct ids.  A
    degenerate group (10^6 boilerplate-identical docs in one LSH
    bucket) would otherwise emit ~5*10^11 pair rows; the drop is NEVER
    silent — a warning logs how many groups/ids were skipped (use
    exact_dedup first if mass-identical content is expected)."""
    if len(keys) == 0:
        return _PAIR_CAND_SCHEMA.empty_table()
    order = np.lexsort((ids, keys))
    k = keys[order]
    d = ids[order]
    keep = np.r_[True, (k[1:] != k[:-1]) | (d[1:] != d[:-1])]
    k, d = k[keep], d[keep]
    starts = np.flatnonzero(np.r_[True, k[1:] != k[:-1]])
    ends = np.r_[starts[1:], len(k)]
    sizes = ends - starts
    mult = sizes >= 2
    if cap:
        over = mult & (sizes > cap)
        if over.any():
            import logging

            logging.getLogger(__name__).warning(
                "dropping %d oversized %s group(s) (> %d ids; largest %d, "
                "%d ids total) from pair enumeration",
                int(over.sum()), what, cap, int(sizes[over].max()),
                int(sizes[over].sum()),
            )
        mult &= sizes <= cap
    a_out, b_out = [], []
    for s, e in zip(starts[mult], ends[mult]):
        ii, jj = np.triu_indices(int(e - s), k=1)
        a_out.append(d[s + ii])
        b_out.append(d[s + jj])
    if not a_out:
        return _PAIR_CAND_SCHEMA.empty_table()
    return pa.Table.from_pydict(
        {"a_id": np.concatenate(a_out), "b_id": np.concatenate(b_out)},
        schema=_PAIR_CAND_SCHEMA,
    )


def _pair_route_key(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Routing/grouping key for an id pair: splitmix64 mix of both ids.
    Equal pairs always share the key (deterministic), and because every
    consumer groups/dedups on the REAL (a_id, b_id) columns, a rare
    collision only co-locates two pairs in one partition — it can never
    merge them (the old ``a*1_000_003+b`` key collided at ids ≥ 1e6)."""
    mixed = splitmix64(a.astype(np.uint64) ^ splitmix64(b.astype(np.uint64) + np.uint64(0x9E3779B9)))
    return (mixed >> np.uint64(1)).astype(np.int64)


def _distinct_pairs(pairs, num_partitions: int = 16):
    """Distinct (a_id, b_id) rows: route on the mixed pair key, dedup
    on the actual id columns (collision-free)."""
    from ..relational import distinct_on

    keyed = pairs.map_batches(
        lambda t: t.append_column(
            "pair_key",
            pa.array(_pair_route_key(
                t["a_id"].to_numpy(zero_copy_only=False),
                t["b_id"].to_numpy(zero_copy_only=False),
            )),
        ),
        batch_format="pyarrow",
    )
    return distinct_on(
        keyed, "pair_key", num_partitions=num_partitions, subset=["a_id", "b_id"]
    ).drop_columns(["pair_key"])


def _content_hash_col(batch: pa.Table, text_col: str) -> pa.Table:
    """FNV63 content hash of a string OR binary column — vectorized
    buffer-level passes (_hash63_batch), no per-row Python."""
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return batch.append_column("content_hash", pa.array(_hash63_batch(col)))


def exact_dedup(docs, *, text_col: str = "text", id_col: str = "doc_id",
                num_partitions: int = 16):
    """Keep one row (min id) per distinct text. Returns the surviving
    rows' (id, content_hash).  Hash-partition + partition-wise dedup
    (one vectorized pass per partition, not per distinct text)."""
    from ..relational import distinct_on

    hashed = docs.map_batches(
        lambda t: _content_hash_col(t, text_col).select([id_col, "content_hash"]),
        batch_format="pyarrow",
    )
    return distinct_on(hashed, "content_hash", num_partitions=num_partitions,
                       sort_by=[id_col])


def _shingles(words, k: int):
    if len(words) < k:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]


def minhash_signature(text: str, num_hashes: int, shingle_k: int) -> np.ndarray:
    words = [w.lower() for w in _TOKEN_RE.findall(text or "")]
    sh = _shingles(words, shingle_k)
    if not sh:
        return np.zeros(num_hashes, dtype=np.uint64)
    base = np.array([_hash63(s) for s in sh], dtype=np.uint64)
    seeds = np.arange(1, num_hashes + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    # permuted = splitmix64(shingle ^ seed): (n_shingles, num_hashes)
    perm = splitmix64(base[:, None] ^ seeds[None, :])
    return perm.min(axis=0)


def _flat_tokens(col):
    """Vectorized \\S+ tokenization of a string column: returns
    (flat_lower tokens, parent doc index per token, tokens per doc) —
    identical to per-row ``_TOKEN_RE.findall`` + ``str.lower`` for
    ASCII whitespace (regex split emits empties at leading/trailing
    whitespace; dropped).  Uses Arrow/RE2 ``\\s`` (ASCII-only), the
    same dialect as the analyzer stage and the DuckDB oracles'
    ``regexp_split_to_array`` — Python ``re`` additionally treats
    Unicode spaces (\\xa0 etc.) as separators."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    col = pc.fill_null(col, "")
    n = len(col)
    tokens = pc.split_pattern_regex(col, r"\s+")
    flat = pc.list_flatten(tokens)
    parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = pc.utf8_lower(flat.filter(pa.array(nonempty)))
    parent = parent[nonempty]
    return flat, parent, np.bincount(parent, minlength=n).astype(np.int64)


GRAMS_SCHEMA = pa.schema([("doc_id", pa.int64()), ("grams", pa.list_(pa.int64()))])


def grams_dataset(docs, *, text_col: str = "text", id_col: str = "doc_id",
                  shingle_k: int = 3, concurrency: int = 2):
    """One tokenization pass: doc -> sorted unique shingle-hash set
    (list<int64>).  Shared by MinHash-LSH banding and the exact-Jaccard
    operators; materialized because it is consumed by both the
    candidate stage and the verify join."""

    class Grams:
        """doc -> sorted unique shingle hashes (list<int64>), fully
        vectorized: k-gram windows are k shifted takes of the flattened
        token array joined element-wise, hashed by the buffer-level FNV
        batch kernel; per-doc unique+sort is one lexsort + adjacent
        dedupe.  Value-identical to the former per-row loop
        (tests pin parity)."""

        def __init__(self):
            self.k = shingle_k

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = self.k
            n = len(batch)
            flat, parent, n_tokens = _flat_tokens(batch[text_col])
            total = len(flat)
            # gram windows live inside one doc's token run: a start is a
            # position whose (k-1)-ahead neighbour shares the parent
            if total >= k:
                starts = np.flatnonzero(parent[: total - k + 1] == parent[k - 1 :])
            else:
                starts = np.empty(0, dtype=np.int64)
            if len(starts):
                parts = [flat.take(pa.array(starts + j, pa.int64())) for j in range(k)]
                gh = _hash63_batch(pc.binary_join_element_wise(*parts, " "))
                gram_doc = parent[starts]
            else:
                gh = np.empty(0, dtype=np.int64)
                gram_doc = np.empty(0, dtype=np.int64)
            # short docs (1 <= tokens < k) hash their full joined text
            short = np.flatnonzero((n_tokens > 0) & (n_tokens < k))
            if len(short):
                sel = np.flatnonzero(np.isin(parent, short))
                toks = flat.take(pa.array(sel, pa.int64()))
                offs = np.concatenate(([0], np.cumsum(n_tokens[short]))).astype(np.int32)
                joined = pc.binary_join(
                    pa.ListArray.from_arrays(pa.array(offs, pa.int32()), toks),
                    " ",
                )
                gh = np.concatenate([gh, _hash63_batch(joined)])
                gram_doc = np.concatenate([gram_doc, short])
            # per-doc sorted unique hash sets in one pass
            order = np.lexsort((gh, gram_doc))
            gd, gs = gram_doc[order], gh[order]
            if len(gd):
                keep = np.concatenate(
                    ([True], (gd[1:] != gd[:-1]) | (gs[1:] != gs[:-1]))
                )
                gd, gs = gd[keep], gs[keep]
            counts = np.bincount(gd, minlength=n)
            offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
            grams = pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), pa.array(gs, pa.int64())
            )
            return pa.Table.from_arrays(
                [batch[id_col], grams],
                schema=pa.schema([("doc_id", pa.int64()), ("grams", pa.list_(pa.int64()))]),
            )

    return docs.map_batches(
        Grams, batch_format="pyarrow", concurrency=concurrency
    ).materialize()


PAIR_SCHEMA = pa.schema(
    [("a_id", pa.int64()), ("b_id", pa.int64()), ("jaccard", pa.float64())]
)


def minhash_lsh_pairs(
    docs,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    concurrency: int = 2,
    num_partitions: int = 16,
    max_bucket_size: int = 1024,
):
    """Near-duplicate pairs (a_id < b_id, exact-verified n-gram Jaccard
    >= threshold).

    ``max_bucket_size``: LSH buckets with more distinct docs are
    DROPPED from pair enumeration, with a logged warning (a degenerate
    boilerplate bucket is quadratic; run exact_dedup first for
    mass-identical content).  0 disables the cap.

    Scale shape (100-TB regime): document TEXT never enters a shuffle.
    One pass tokenizes each doc into its unique shingle-hash set (grams,
    ~1x text size); band rows carry only (bucket, doc_id) — 16 rows x
    16 bytes per doc instead of 16 copies of the text.  Candidate pairs
    come from the bucket exchange; the exact-Jaccard verify joins the
    grams back for candidate docs only (|A∩B|/|A∪B| over unique
    63-bit shingle hashes == string-set Jaccard up to hash collisions).
    """
    from ..relational import empty_dataset, hash_exchange_map, hash_join

    rows_per_band = num_hashes // bands
    seeds = np.arange(1, num_hashes + 1, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15)

    grams_ds = grams_dataset(docs, text_col=text_col, id_col=id_col,
                              shingle_k=shingle_k, concurrency=concurrency)

    def band_rows(batch: pa.Table) -> pa.Table:
        """minhash from the gram sets (no re-tokenization), then slim
        (bucket, doc_id) rows — one per band."""
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        col = batch["grams"].combine_chunks()
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        offs = np.concatenate(([0], np.cumsum(lens)))
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.uint64)
        n = len(ids)
        out_id = np.repeat(ids, bands)
        # segment-min over ONE (total_grams, num_hashes) permutation
        # matrix (np.minimum.reduceat over doc boundaries) — no per-doc
        # Python loop; chunked so the intermediate stays ~64 MB
        sigs = np.zeros((n, num_hashes), dtype=np.uint64)
        nonempty = np.flatnonzero(lens > 0)
        if len(nonempty):
            CHUNK = 1 << 17  # grams per slice
            doc_of = np.repeat(np.arange(n), lens)
            g_start = 0
            while g_start < len(flat):
                g_end = min(g_start + CHUNK, len(flat))
                # extend to a doc boundary so reduceat segments align
                while g_end < len(flat) and doc_of[g_end] == doc_of[g_end - 1]:
                    g_end += 1
                docs_sl = np.unique(doc_of[g_start:g_end])
                starts = np.maximum(offs[docs_sl], g_start) - g_start
                perm = splitmix64(
                    flat[g_start:g_end, None] ^ seeds[None, :]
                )
                part = np.minimum.reduceat(perm, starts, axis=0)
                sigs[docs_sl] = part
                g_start = g_end
        bsig = sigs.reshape(n, bands, rows_per_band)
        band_seeds = np.arange(1, bands + 1, dtype=np.uint64)[None, :, None]
        bh = (
            splitmix64(bsig ^ band_seeds).sum(axis=2) & np.uint64(0x3FFFFFFFFFFFFF)
        ).astype(np.int64)  # (n, bands)
        out_key = (bh * bands + np.arange(bands, dtype=np.int64)[None, :]).ravel()
        return pa.Table.from_pydict(
            {"bucket": out_key, "doc_id_": out_id},
            schema=pa.schema([("bucket", pa.int64()), ("doc_id_", pa.int64())]),
        )

    banded = grams_ds.map_batches(band_rows, batch_format="pyarrow")

    def partition_pairs(tbl: pa.Table) -> pa.Table:
        return _enumerate_bucket_pairs(
            tbl["bucket"].to_numpy(zero_copy_only=False),
            tbl["doc_id_"].to_numpy(zero_copy_only=False),
            cap=max_bucket_size,
            what="LSH bucket",
        )

    cands = hash_exchange_map(banded, "bucket", num_partitions, partition_pairs)
    if cands is None:
        return empty_dataset(PAIR_SCHEMA)
    cands = _distinct_pairs_ids(cands, num_partitions)
    return _verify_exact_jaccard(cands, grams_ds, jaccard_threshold, num_partitions)


def _verify_exact_jaccard(cands, grams_ds, jaccard_threshold, num_partitions):
    """Exact per-pair n-gram Jaccard verify: explode candidate pairs to
    (pair, side) rows, join the per-doc gram sets back (candidates
    only — the corpus never re-shuffles), regroup by pair and compare
    sorted-unique hash sets."""
    from ..relational import empty_dataset, hash_exchange_map, hash_join

    def explode_sides(t: pa.Table) -> pa.Table:
        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "doc_id": np.concatenate([a, b]),
                "a_id": np.concatenate([a, a]),
                "b_id": np.concatenate([b, b]),
            },
            schema=pa.schema(
                [("doc_id", pa.int64()), ("a_id", pa.int64()), ("b_id", pa.int64())]
            ),
        )

    sides = cands.map_batches(explode_sides, batch_format="pyarrow")
    joined = hash_join(
        sides,
        grams_ds,
        on="doc_id",
        l_schema=pa.schema(
            [("doc_id", pa.int64()), ("a_id", pa.int64()), ("b_id", pa.int64())]
        ),
        r_schema=pa.schema([("doc_id", pa.int64()), ("grams", pa.list_(pa.int64()))]),
        how="inner",
        num_partitions=num_partitions,
    )

    def add_pair_key(t: pa.Table) -> pa.Table:
        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        return t.append_column("pair_key", pa.array(_pair_route_key(a, b)))

    keyed = joined.map_batches(add_pair_key, batch_format="pyarrow")

    def verify(tbl: pa.Table) -> pa.Table:
        a = tbl["a_id"].to_numpy(zero_copy_only=False)
        b = tbl["b_id"].to_numpy(zero_copy_only=False)
        dids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        col = tbl["grams"].combine_chunks()
        lens = pc.fill_null(pc.list_value_length(col), 0).to_numpy(zero_copy_only=False)
        offs = np.concatenate(([0], np.cumsum(lens)))
        flat = col.flatten().to_numpy(zero_copy_only=False)
        # group on the REAL id pair (lexsort), never the routing hash —
        # a hash collision must not fuse two different pairs
        order = np.lexsort((b, a))
        out_a, out_b, out_j = [], [], []
        i = 0
        n = len(a)
        while i < n:
            j = i
            while j < n and a[order[j]] == a[order[i]] and b[order[j]] == b[order[i]]:
                j += 1
            rows = order[i:j]
            ga = gb = None
            for r in rows:
                g = flat[offs[r] : offs[r + 1]]
                if dids[r] == a[r]:
                    ga = g
                else:
                    gb = g
            if ga is not None and gb is not None:
                inter = len(np.intersect1d(ga, gb, assume_unique=True))
                union = len(ga) + len(gb) - inter
                jac = inter / union if union else 0.0
                if jac >= jaccard_threshold:
                    out_a.append(int(a[rows[0]]))
                    out_b.append(int(b[rows[0]]))
                    out_j.append(jac)
            i = j
        return pa.Table.from_pydict(
            {"a_id": out_a, "b_id": out_b, "jaccard": out_j}, schema=PAIR_SCHEMA
        )

    verified = hash_exchange_map(keyed, "pair_key", num_partitions, verify)
    if verified is None:
        return empty_dataset(PAIR_SCHEMA)
    return verified.map_batches(
        lambda t: t.select(["a_id", "b_id", "jaccard"]), batch_format="pyarrow"
    )




def _distinct_pairs_ids(pairs, num_partitions: int = 16):
    """Distinct (a_id, b_id) id pairs (no payload columns)."""
    return _distinct_pairs(pairs, num_partitions)




def jaccard_pairs(
    docs,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    jaccard_threshold: float = 0.8,
    concurrency: int = 2,
    num_partitions: int = 16,
    hot_gram_cap: int = 0,
):
    """EXACT n-gram Jaccard near-dup pairs (no LSH approximation):
    candidates = every pair sharing at least one shingle, found with a
    gram-hash inverted index (exchange keyed on the gram hash), then the
    shared exact-Jaccard verify.  Complete by construction — a pair with
    Jaccard > 0 shares a gram.

    Scale note: a hot gram with D docs emits D*(D-1)/2 candidate rows.
    ``hot_gram_cap`` > 0 skips grams with more than that many docs (a
    standard prefix-filter trade: pairs sharing ONLY ultra-common grams
    cannot reach a high threshold anyway when their sets are large);
    0 keeps exact completeness (the oracle-checked configuration).
    """
    from ..relational import empty_dataset, hash_exchange_map

    grams_ds = grams_dataset(docs, text_col=text_col, id_col=id_col,
                             shingle_k=shingle_k, concurrency=concurrency)

    def invert(batch: pa.Table) -> pa.Table:
        col = batch["grams"].combine_chunks()
        flat = col.flatten()
        parent = pc.list_parent_indices(col)
        return pa.Table.from_arrays(
            [flat, pc.take(batch["doc_id"].combine_chunks(), parent)],
            schema=pa.schema([("gram", pa.int64()), ("doc_id_", pa.int64())]),
        )

    inverted = grams_ds.map_batches(invert, batch_format="pyarrow")

    def partition_pairs(tbl: pa.Table) -> pa.Table:
        return _enumerate_bucket_pairs(
            tbl["gram"].to_numpy(zero_copy_only=False),
            tbl["doc_id_"].to_numpy(zero_copy_only=False),
            cap=hot_gram_cap,
            what="gram posting",
        )

    cands = hash_exchange_map(inverted, "gram", num_partitions, partition_pairs)
    if cands is None:
        return empty_dataset(PAIR_SCHEMA)
    cands = _distinct_pairs_ids(cands, num_partitions)
    return _verify_exact_jaccard(cands, grams_ds, jaccard_threshold, num_partitions)


def ngram_contamination(
    docs,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    concurrency: int = 2,
    num_partitions: int = 16,
):
    """Cross-document n-gram contamination: for every document, how
    many of its DISTINCT k-gram shingles also occur in at least one
    OTHER document (the duplicated-training-data signal of Lee et al.,
    "Deduplicating Training Data Makes Language Models Better", at the
    set level) plus the ratio in ppm.  Documents with no tokens emit
    no row (they have no grams), matching the SQL oracle.

    Scale shape: text is tokenized once (``grams_dataset``); only slim
    (gram_hash:int64, doc_id:int64) rows ride ONE hash exchange keyed
    on the gram, where per-gram document counts are partition-local
    facts (grams are unique within a doc, so a gram's row count IS its
    document count).  Each partition then collapses to <= #docs tiny
    (doc_id, n_grams, n_shared) partials and the final reduce is a
    combiner-push-down groupby over #docs x P rows — raw grams shuffle
    once, text never."""
    from ..relational import hash_exchange_map, partial_grouped_agg

    grams_ds = grams_dataset(docs, text_col=text_col, id_col=id_col,
                             shingle_k=shingle_k, concurrency=concurrency)

    def invert(batch: pa.Table) -> pa.Table:
        col = batch["grams"].combine_chunks()
        flat = col.flatten()
        parent = pc.list_parent_indices(col)
        return pa.Table.from_arrays(
            [flat, pc.take(batch["doc_id"].combine_chunks(), parent)],
            schema=pa.schema([("gram", pa.int64()), ("doc_id", pa.int64())]),
        )

    inverted = grams_ds.map_batches(invert, batch_format="pyarrow")
    return _shared_gram_signal(inverted, num_partitions)


def _shared_gram_signal(inverted, num_partitions: int):
    """Shared tail of the contamination-style signals: from slim
    (gram:int64, doc_id:int64) rows — DISTINCT per doc — compute each
    doc's gram count, the count shared with >= 1 other doc, and the
    ppm ratio.  One hash exchange on the gram; per-gram document
    counts are partition-local facts (a gram's row count IS its
    distinct-document count because grams are unique within a doc)."""
    from ..relational import hash_exchange_map, partial_grouped_agg

    def per_partition(tbl: pa.Table) -> pa.Table:
        gh = tbl["gram"].to_numpy(zero_copy_only=False)
        ids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        # all rows of a gram are co-located here and unique per doc:
        # the gram's multiplicity IS its distinct-document count
        _, inv, counts = np.unique(gh, return_inverse=True, return_counts=True)
        shared = counts[inv] >= 2
        udoc, dinv = np.unique(ids, return_inverse=True)
        n_grams = np.bincount(dinv).astype(np.int64)
        n_shared = np.bincount(dinv, weights=shared).astype(np.int64)
        return pa.Table.from_pydict(
            {"doc_id": udoc, "n_grams": n_grams, "n_shared": n_shared},
            schema=pa.schema([("doc_id", pa.int64()), ("n_grams", pa.int64()),
                              ("n_shared", pa.int64())]),
        )

    partials = hash_exchange_map(inverted, "gram", num_partitions, per_partition)
    if partials is None:  # no grams at all (empty/blank corpus)
        from ..relational import empty_dataset

        return empty_dataset(
            pa.schema([("doc_id", pa.int64()), ("n_grams", pa.int64()),
                       ("n_shared", pa.int64()), ("shared_ppm", pa.int64())])
        )
    out = partial_grouped_agg(
        partials, ["doc_id"],
        {"n_grams": ("n_grams", "sum"), "n_shared": ("n_shared", "sum")},
    )

    def ratio(t: pa.Table) -> pa.Table:
        ng = t["n_grams"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = t["n_shared"].to_numpy(zero_copy_only=False).astype(np.int64)
        # pure integer division: exact on both sides of the gate
        ppm = np.where(ng > 0, (ns * 1_000_000) // np.maximum(ng, 1), 0)
        return t.append_column("shared_ppm", pa.array(ppm, pa.int64()))

    return out.map_batches(ratio, batch_format="pyarrow")


def simhash_signatures(docs, *, text_col: str = "text", id_col: str = "doc_id",
                       concurrency: int = 4):
    """64-bit simhash per doc: weighted bit-vote over token hashes."""

    class Sim:
        def __call__(self, batch: pa.Table) -> pa.Table:
            n = len(batch)
            flat_toks, _parent, counts = _flat_tokens(batch[text_col])
            sigs = np.zeros(n, dtype=np.uint64)
            nz = np.flatnonzero(counts > 0)
            if len(nz):
                hs = _hash63_batch(flat_toks).astype(np.uint64)
                # (G, 64) bit matrix -> per-doc vote sums via reduceat;
                # bit b set when strictly more ones than zeros
                bits = (
                    (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)
                ).astype(np.int64)
                offs = np.concatenate(([0], np.cumsum(counts)))
                ones = np.add.reduceat(bits, offs[nz], axis=0)
                votes = 2 * ones - counts[nz, None]
                sigs[nz] = ((votes > 0).astype(np.uint64)
                            << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
            return pa.Table.from_pydict(
                {"doc_id": batch[id_col],
                 "simhash": pa.array(sigs.astype(np.int64))},
                schema=pa.schema([("doc_id", pa.int64()), ("simhash", pa.int64())]),
            )

    return docs.map_batches(Sim, batch_format="pyarrow", concurrency=concurrency)


def _probe_bucket_codes(
    dots: np.ndarray,
    bucket_bits: int,
    max_probe_planes: Optional[int],
    margin: float = 0.12,
):
    """Per-vector LSH bucket codes with BOUNDED multi-probe fan-out.

    Multi-probe guarantee: a pair with unit-vector distance d
    co-locates in some bucket whenever d * max||proj_row|| < margin
    (both sides straddle every disagreeing hyperplane and probe both
    children); margin 0.12 covers d≈0.05 at ~2.3-norm projections.

    Bound: only the ``max_probe_planes`` straddled planes CLOSEST to
    their boundary probe both children — exactly the planes most likely
    to disagree between two near-identical vectors; further straddles
    take their sign branch (deterministic, so near-identical vectors
    agree on it).  A degenerate near-zero/centroid-like vector that
    straddles every plane therefore emits at most 2^max_probe_planes
    bucket copies instead of 2^bucket_bits.
    """
    straddle = np.abs(dots) < margin
    if max_probe_planes is not None:
        over = np.flatnonzero(straddle.sum(axis=1) > max_probe_planes)
        for i in over:
            planes = np.flatnonzero(straddle[i])
            keep = planes[np.argsort(np.abs(dots[i, planes]), kind="stable")][
                :max_probe_planes
            ]
            row = np.zeros(bucket_bits, dtype=bool)
            row[keep] = True
            straddle[i] = row
    out = []
    for i in range(len(dots)):
        codes = [0]
        for b in range(bucket_bits):
            if straddle[i, b]:
                branches = (1, 0)
            elif dots[i, b] > 0:
                branches = (1,)
            else:
                branches = (0,)
            codes = [c * 2 + br for c in codes for br in branches]
        out.append(set(codes))
    return out


def embedding_neardup_pairs(
    embeddings,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bucket_bits: int = 8,
    num_partitions: int = 16,
    max_probe_planes: Optional[int] = 4,
):
    """Pairs with cosine >= threshold.  Coarse LSH: sign bits of
    ``bucket_bits`` fixed random-ish projections (derived from
    splitmix64, deterministic) route vectors to buckets; vectors near
    the boundary of a projection go to BOTH child buckets (multi-probe)
    so true pairs aren't split.

    Scale shape: 2^bucket_bits buckets (256 at the default) keep the
    in-bucket all-pairs matmul sub-quadratic; buckets are spread over a
    hash exchange on the bucket id (never a per-key groupby), and each
    partition loops its buckets with a bounded-size matmul."""

    def bucket_rows(batch: pa.Table) -> pa.Table:
        from ..vectors import vec_matrix

        vecs = vec_matrix(batch[vec_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        if len(vecs) == 0:
            return pa.Table.from_pydict(
                {"bucket": [], "vec_id_": [], "vec_": []},
                schema=pa.schema(
                    [("bucket", pa.int64()), ("vec_id_", pa.int64()),
                     ("vec_", pa.list_(pa.float64()))]
                ),
            )
        dim = vecs.shape[1]
        rng = splitmix64(np.arange(bucket_bits * dim, dtype=np.uint64) + np.uint64(7))
        proj = (rng.astype(np.float64) / float(1 << 64) - 0.5).reshape(bucket_bits, dim)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        dots = unit @ proj.T  # (n, bits)
        code_sets = _probe_bucket_codes(dots, bucket_bits, max_probe_planes)
        counts = np.fromiter((len(c) for c in code_sets), dtype=np.int64, count=len(code_sets))
        row_idx = np.repeat(np.arange(len(code_sets)), counts)
        buckets = np.fromiter(
            (c for codes in code_sets for c in codes), dtype=np.int64,
            count=int(counts.sum()),
        )
        dim = unit.shape[1]
        n_out = int(counts.sum())
        offsets = np.arange(n_out + 1, dtype=np.int32) * dim
        vec_arr = pa.ListArray.from_arrays(
            pa.array(offsets),
            pa.array(unit[row_idx].ravel()),
        )
        return pa.Table.from_arrays(
            [
                pa.array(buckets),
                pa.array(ids[row_idx].astype(np.int64)),
                vec_arr,
            ],
            schema=pa.schema(
                [("bucket", pa.int64()), ("vec_id_", pa.int64()),
                 ("vec_", pa.list_(pa.float64()))]
            ),
        )

    bucketed = embeddings.map_batches(bucket_rows, batch_format="pyarrow")

    def partition_pairs(df):
        import pandas as pd

        out_a, out_b, out_c = [], [], []
        for _, grp in df.groupby("bucket", sort=False):
            grp = grp.drop_duplicates(subset=["vec_id_"]).sort_values("vec_id_")
            ids = grp["vec_id_"].to_numpy()
            if len(ids) < 2:
                continue
            mat = np.array(grp["vec_"].tolist(), dtype=np.float64)
            sims = mat @ mat.T
            ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
            out_a.append(ids[ai])
            out_b.append(ids[bi])
            out_c.append(np.round(sims[ai, bi], 9))
        if out_a:
            return pd.DataFrame(
                {
                    "a_id": np.concatenate(out_a),
                    "b_id": np.concatenate(out_b),
                    "cosine": np.concatenate(out_c),
                }
            ).astype({"a_id": "int64", "b_id": "int64", "cosine": "float64"})
        return pd.DataFrame({"a_id": [], "b_id": [], "cosine": []}).astype(
            {"a_id": "int64", "b_id": "int64", "cosine": "float64"}
        )

    from ..relational import empty_dataset, hash_exchange_map

    pairs = hash_exchange_map(
        bucketed, "bucket", num_partitions, partition_pairs, fn_format="pandas"
    )
    if pairs is None:
        return empty_dataset(
            pa.schema(
                [("a_id", pa.int64()), ("b_id", pa.int64()), ("cosine", pa.float64())]
            )
        )
    return _distinct_pairs(pairs)


# ------------------------------------------------------------- fuzzy join
_EDIT1_PAIR_SCHEMA = pa.schema([("term_a", pa.string()),
                                ("term_b", pa.string())])


def _is_edit1(a: str, b: str) -> bool:
    """Exact edit-distance-==-1 test (insert/delete/substitute)."""
    la, lb = len(a), len(b)
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if lb - la > 1:
        return False
    if la == lb:
        return sum(1 for x, y in zip(a, b) if x != y) == 1
    # deletion: b drops one char to give a
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _deletion_variant_rows(col: pa.Array) -> pa.Table:
    """(variant_hash, term) rows for every term and every
    single-character deletion of it — vectorized: one
    utf8_slice+concat kernel pass per deletion POSITION (max-term-
    length iterations of whole-column Arrow kernels, never per-row
    Python).  Sharing a variant is a complete candidate generator for
    edit distance <= 1 (delete/insert: the longer's deletion IS the
    shorter; substitute at i: both sides' deletion at i coincide)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return pa.table({"bucket": pa.array([], pa.int64()),
                         "term": pa.array([], pa.string())})
    lens = pc.utf8_length(col).to_numpy(zero_copy_only=False)
    buckets = [(_hash63_batch(col)).astype(np.int64)]
    terms = [col]
    for i in range(int(lens.max())):
        mask = lens > i
        sub = col.filter(pa.array(mask))
        var = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(sub, 0, i),
            pc.utf8_slice_codeunits(sub, i + 1, np.iinfo(np.int32).max),
            "",
        )
        buckets.append(_hash63_batch(var).astype(np.int64))
        terms.append(sub)
    return pa.table({
        "bucket": pa.array(np.concatenate(buckets)),
        "term": pa.concat_arrays([t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t for t in terms]),
    })


def editdist1_pairs(
    terms,
    *,
    term_col: str = "term",
    min_len: int = 1,
    bucket_cap: int = 256,
    num_partitions: int = 16,
):
    """All DISTINCT term pairs at edit distance exactly 1 — the fuzzy
    string-matching / entity-resolution join (SymSpell shape): each
    term emits itself + its single-character deletions as hashed
    blocking keys; terms sharing a key are candidates (a complete
    generator for distance <= 1); candidates dedup on the real string
    pair and an exact edit-distance verify keeps true pairs only.

    Scale shape: the corpus-sized input reduces to its (much smaller)
    distinct-term vocabulary FIRST; variants hash-exchange on the
    blocking key (vectorized triu pair enumeration per bucket with the
    LSH bucket cap + logged drops — a degenerate key such as the empty
    string from length-1 terms would otherwise go quadratic); only the
    slim candidate pairs travel afterwards.  Output: (term_a, term_b),
    term_a < term_b."""
    from ..relational import distinct_on, hash_exchange_map

    def prep(t: pa.Table) -> pa.Table:
        col = t[term_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        keep = pc.and_(pc.is_valid(col),
                       pc.greater_equal(pc.utf8_length(col), min_len))
        col = col.filter(keep)
        return pa.table({
            "term": col,
            "term_key": pa.array(_hash63_batch(col).astype(np.int64)),
        })

    vocab = distinct_on(
        terms.map_batches(prep, batch_format="pyarrow"),
        "term_key", num_partitions=num_partitions, subset=["term"],
    )

    variants = vocab.map_batches(
        lambda t: _deletion_variant_rows(t["term"]),
        batch_format="pyarrow",
    )

    def bucket_pairs(t: pa.Table) -> pa.Table:
        if "__part" in t.column_names:
            t = t.drop_columns(["__part"])
        if len(t) == 0:
            return _EDIT1_PAIR_SCHEMA.empty_table()
        b = t["bucket"].to_numpy(zero_copy_only=False)
        terms_np = t["term"].to_numpy(zero_copy_only=False)
        order = np.lexsort((terms_np, b))
        b, terms_np = b[order], terms_np[order]
        keep = np.r_[True, (b[1:] != b[:-1]) | (terms_np[1:] != terms_np[:-1])]
        b, terms_np = b[keep], terms_np[keep]
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        ends = np.r_[starts[1:], len(b)]
        sizes = ends - starts
        mult = sizes >= 2
        over = mult & (sizes > bucket_cap)
        if over.any():
            import logging

            logging.getLogger(__name__).warning(
                "editdist1_pairs: dropping %d oversized blocking bucket(s) "
                "(> %d terms; largest %d)",
                int(over.sum()), bucket_cap, int(sizes[over].max()),
            )
            mult &= sizes <= bucket_cap
        a_out, b_out = [], []
        for s, e in zip(starts[mult], ends[mult]):
            ii, jj = np.triu_indices(int(e - s), k=1)
            a_out.append(terms_np[s + ii])
            b_out.append(terms_np[s + jj])
        if not a_out:
            return _EDIT1_PAIR_SCHEMA.empty_table()
        ta = np.concatenate(a_out)
        tb = np.concatenate(b_out)
        lo = np.minimum(ta, tb)
        hi = np.maximum(ta, tb)
        return pa.Table.from_pydict({"term_a": lo, "term_b": hi},
                                    schema=_EDIT1_PAIR_SCHEMA)

    cands = hash_exchange_map(variants, "bucket", num_partitions, bucket_pairs)
    if cands is None:
        from ..relational import empty_dataset

        return empty_dataset(_EDIT1_PAIR_SCHEMA)

    def keyed(t: pa.Table) -> pa.Table:
        a = t["term_a"]
        b = t["term_b"]
        if isinstance(a, pa.ChunkedArray):
            a = a.combine_chunks()
        if isinstance(b, pa.ChunkedArray):
            b = b.combine_chunks()
        return t.append_column("pair_key", pa.array(_pair_route_key(
            _hash63_batch(a), _hash63_batch(b))))

    distinct = distinct_on(
        cands.map_batches(keyed, batch_format="pyarrow"),
        "pair_key", num_partitions=num_partitions,
        subset=["term_a", "term_b"],
    )

    def verify(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return _EDIT1_PAIR_SCHEMA.empty_table()
        a = t["term_a"].to_numpy(zero_copy_only=False)
        b = t["term_b"].to_numpy(zero_copy_only=False)
        # candidate stream only (vocabulary-scale, capped): exact
        # verify per pair, same precedent as the LSH pair verify
        ok = np.fromiter((_is_edit1(x, y) for x, y in zip(a, b)),
                         dtype=bool, count=len(a))
        return pa.Table.from_pydict(
            {"term_a": a[ok], "term_b": b[ok]}, schema=_EDIT1_PAIR_SCHEMA)

    return distinct.map_batches(verify, batch_format="pyarrow")


def char_window_dup(docs, *, text_col: str = "text", id_col: str = "doc_id",
                    window: int = 32, concurrency: int = 2,
                    num_partitions: int = 16):
    """Exact duplicated-SUBSTRING signal at fixed width (the practical
    Lee et al. 2022 "dedup exact substrings" detector, window-grained):
    per document, how many of its DISTINCT ``window``-char substrings
    occur verbatim in at least one OTHER document, plus the ppm ratio.
    Catches copy-paste duplication that token-level shingles miss
    (boilerplate headers, quoted passages) and is the signal exact
    substring dedup thresholds on.

    Scale shape: windows are enumerated ZERO-COPY from the Arrow string
    value buffer (one sliding_window_view + a take at per-doc start
    positions — no per-row Python, no substring materialization),
    FNV-1a-hashed column-wise in ``window`` vectorized steps, and
    deduped per doc with one lexsort; only slim DISTINCT
    (gram:int64, doc_id) rows ride the gram-keyed exchange shared with
    ngram_contamination (_shared_gram_signal).  Documents shorter than
    ``window`` emit no row (they have no windows), matching the SQL
    twin.  Input must be ASCII (byte==char, so the byte windows equal
    the oracle's substr windows) — non-ASCII raises loudly.

    Output: (doc_id, n_windows, n_shared, shared_ppm)."""
    fnv_off = np.uint64(14695981039346656037)
    fnv_prime = np.uint64(1099511628211)
    mask63 = np.uint64((1 << 63) - 1)
    out_schema = pa.schema([("gram", pa.int64()), ("doc_id", pa.int64())])

    def windows_batch(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch[text_col], "").combine_chunks()
        if isinstance(col, pa.ChunkedArray):
            col = (col.chunk(0) if col.num_chunks == 1
                   else pa.concat_arrays(col.chunks))
        n = len(col)
        if n == 0:
            return out_schema.empty_table()
        nbytes = pc.binary_length(col).to_numpy(zero_copy_only=False)
        nchars = pc.utf8_length(col).to_numpy(zero_copy_only=False)
        if (nbytes != nchars).any():
            raise ValueError(
                "char_window_dup requires ASCII text (byte windows must "
                "equal the oracle's character windows)")
        offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
            col.offset: col.offset + n + 1].astype(np.int64)
        buf = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        lens = offs[1:] - offs[:-1]
        n_win = np.maximum(lens - window + 1, 0)
        total = int(n_win.sum())
        if total == 0 or len(buf) < window:
            return out_schema.empty_table()
        parent = np.repeat(np.arange(n, dtype=np.int64), n_win)
        run0 = np.concatenate(([0], np.cumsum(n_win)))[:-1]
        starts = (np.repeat(offs[:-1], n_win)
                  + np.arange(total, dtype=np.int64) - np.repeat(run0, n_win))
        sw = np.lib.stride_tricks.sliding_window_view(buf, window)
        wins = sw[starts]
        h = np.full(total, fnv_off, dtype=np.uint64)
        for j in range(window):
            h = (h ^ wins[:, j].astype(np.uint64)) * fnv_prime
        gram = (h & mask63).astype(np.int64)
        # DISTINCT (doc, window) pairs: one lexsort, keep run firsts
        order = np.lexsort((gram, parent))
        ps, gs = parent[order], gram[order]
        keep = np.empty(total, dtype=bool)
        keep[0] = True
        keep[1:] = (ps[1:] != ps[:-1]) | (gs[1:] != gs[:-1])
        ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"gram": gs[keep], "doc_id": ids[ps[keep]]}, schema=out_schema)

    inverted = docs.map_batches(windows_batch, batch_format="pyarrow",
                                concurrency=concurrency)
    return _shared_gram_signal(inverted, num_partitions)


CONTAIN_SCHEMA = pa.schema(
    [("a_id", pa.int64()), ("b_id", pa.int64()),
     ("inter_sz", pa.int64()), ("min_sz", pa.int64())]
)


def containment_pairs(
    docs,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold_num: int = 9,
    threshold_den: int = 10,
    concurrency: int = 2,
    num_partitions: int = 16,
    hot_gram_cap: int = 0,
):
    """EXACT n-gram CONTAINMENT pairs — the asymmetric cousin of
    jaccard_pairs that catches SUBSET duplication (one document quoting
    or embedding another): a pair fires when the smaller gram set is
    mostly inside the larger, |A∩B| / min(|A|,|B|) >= num/den.  A long
    doc containing a short doc verbatim has low Jaccard but containment
    1.0 — the case C4/RealNews-style pipelines dedup separately.

    Same scale shape as jaccard_pairs (one gram-inverted-index exchange
    for candidates — complete, since containment > 0 implies a shared
    gram — then a pair-routed exact verify); the threshold is an exact
    integer rational and the output carries (inter_sz, min_sz) so the
    gate never compares floats."""
    from ..relational import empty_dataset, hash_exchange_map, hash_join

    grams_ds = grams_dataset(docs, text_col=text_col, id_col=id_col,
                             shingle_k=shingle_k, concurrency=concurrency)

    def invert(batch: pa.Table) -> pa.Table:
        col = batch["grams"].combine_chunks()
        return pa.Table.from_arrays(
            [col.flatten(),
             pc.take(batch["doc_id"].combine_chunks(),
                     pc.list_parent_indices(col))],
            schema=pa.schema([("gram", pa.int64()), ("doc_id_", pa.int64())]),
        )

    inverted = grams_ds.map_batches(invert, batch_format="pyarrow")

    def partition_pairs(tbl: pa.Table) -> pa.Table:
        return _enumerate_bucket_pairs(
            tbl["gram"].to_numpy(zero_copy_only=False),
            tbl["doc_id_"].to_numpy(zero_copy_only=False),
            cap=hot_gram_cap,
            what="gram posting",
        )

    cands = hash_exchange_map(inverted, "gram", num_partitions, partition_pairs)
    if cands is None:
        return empty_dataset(CONTAIN_SCHEMA)
    cands = _distinct_pairs_ids(cands, num_partitions)

    def explode_sides(t: pa.Table) -> pa.Table:
        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {"doc_id": np.concatenate([a, b]),
             "a_id": np.concatenate([a, a]),
             "b_id": np.concatenate([b, b])},
            schema=pa.schema([("doc_id", pa.int64()), ("a_id", pa.int64()),
                              ("b_id", pa.int64())]),
        )

    joined = hash_join(
        cands.map_batches(explode_sides, batch_format="pyarrow"),
        grams_ds,
        on="doc_id",
        l_schema=pa.schema([("doc_id", pa.int64()), ("a_id", pa.int64()),
                            ("b_id", pa.int64())]),
        r_schema=pa.schema([("doc_id", pa.int64()),
                            ("grams", pa.list_(pa.int64()))]),
        how="inner",
        num_partitions=num_partitions,
    )

    def add_pair_key(t: pa.Table) -> pa.Table:
        a = t["a_id"].to_numpy(zero_copy_only=False)
        b = t["b_id"].to_numpy(zero_copy_only=False)
        return t.append_column("pair_key", pa.array(_pair_route_key(a, b)))

    keyed = joined.map_batches(add_pair_key, batch_format="pyarrow")

    def verify(tbl: pa.Table) -> pa.Table:
        a = tbl["a_id"].to_numpy(zero_copy_only=False)
        b = tbl["b_id"].to_numpy(zero_copy_only=False)
        dids = tbl["doc_id"].to_numpy(zero_copy_only=False)
        col = tbl["grams"].combine_chunks()
        lens = pc.fill_null(pc.list_value_length(col), 0) \
            .to_numpy(zero_copy_only=False)
        offs = np.concatenate(([0], np.cumsum(lens)))
        flat = col.flatten().to_numpy(zero_copy_only=False)
        # group on the REAL id pair (lexsort), never the routing hash
        order = np.lexsort((b, a))
        out = {"a_id": [], "b_id": [], "inter_sz": [], "min_sz": []}
        i, n = 0, len(a)
        while i < n:
            j = i
            while j < n and a[order[j]] == a[order[i]] and b[order[j]] == b[order[i]]:
                j += 1
            rows = order[i:j]
            ga = gb = None
            for r in rows:
                g = flat[offs[r]: offs[r + 1]]
                if dids[r] == a[r]:
                    ga = g
                else:
                    gb = g
            if ga is not None and gb is not None:
                inter = len(np.intersect1d(ga, gb, assume_unique=True))
                mn = min(len(ga), len(gb))
                if mn and inter * threshold_den >= threshold_num * mn:
                    out["a_id"].append(int(a[rows[0]]))
                    out["b_id"].append(int(b[rows[0]]))
                    out["inter_sz"].append(inter)
                    out["min_sz"].append(mn)
            i = j
        return pa.Table.from_pydict(out, schema=CONTAIN_SCHEMA)

    verified = hash_exchange_map(keyed, "pair_key", num_partitions, verify)
    if verified is None:
        return empty_dataset(CONTAIN_SCHEMA)
    return verified.map_batches(
        lambda t: t.select(["a_id", "b_id", "inter_sz", "min_sz"]),
        batch_format="pyarrow",
    )
