"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

One actor-pool stage computes all signals in a single pass, fully
vectorized: Arrow string kernels tokenize and count, stopword hits come
from one ``is_in`` + ``bincount`` per language over the flattened token
array, and the n-gram fingerprint runs FNV-1a as ~L vectorized passes
over a (grams, max_len) byte matrix instead of a Python loop per
document.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# tiny per-language stopword lists (deterministic heuristic language ID)
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las"},
    "fr": {"le", "la", "de", "et", "un", "une", "les", "des", "que", "pour"},
    "de": {"der", "die", "das", "und", "ein", "eine", "zu", "von", "mit", "ist"},
}

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_MASK63 = 0x7FFFFFFFFFFFFFFF


def _hash63(s: str) -> int:
    """Deterministic 63-bit FNV-1a (stable across processes, unlike
    builtin hash)."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h & 0x7FFFFFFFFFFFFFFF


def _hash63_batch(strings: pa.Array) -> np.ndarray:
    """Vectorized FNV-1a over a utf8/binary (or large_*) Arrow array:
    one pass per byte POSITION (max string length passes), each
    vectorized over all strings — identical results to ``_hash63`` per
    element (for binary payloads, to hashing the raw bytes)."""
    n = len(strings)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    arr = strings.combine_chunks() if isinstance(strings, pa.ChunkedArray) else strings
    if arr.null_count:
        fill = b"" if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type) else ""
        arr = pc.fill_null(arr, fill)
    buffers = arr.buffers()
    # utf8/binary layout: [validity, offsets(int32; int64 for large_*), data]
    off_dt = (
        np.int64
        if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type)
        else np.int32
    )
    offsets = np.frombuffer(buffers[1], dtype=off_dt)[
        arr.offset : arr.offset + n + 1
    ].astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] is not None else np.empty(0, np.uint8)
    lengths = offsets[1:] - offsets[:-1]
    max_len = int(lengths.max()) if n else 0
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    if max_len == 0:
        return (h & np.uint64(_MASK63)).astype(np.int64)
    # gather the (n, max_len) byte matrix once (padded positions are
    # masked out of the update)
    pos = np.arange(max_len, dtype=np.int64)
    idx = np.minimum(offsets[:-1, None] + pos[None, :], len(data) - 1)
    mat = data[idx]
    live = pos[None, :] < lengths[:, None]
    for p in range(max_len):
        m = live[:, p]
        if not m.any():
            break
        hb = h[m]
        hb ^= mat[m, p].astype(np.uint64)
        hb *= _FNV_PRIME
        h[m] = hb
    return (h & np.uint64(_MASK63)).astype(np.int64)


class TextAnalyzer:
    """Batch -> batch + analysis columns (n_tokens, n_chars_calc,
    alpha_ratio, stopword_ratio, quality, lang_pred, fingerprint)."""

    def __init__(self, text_col: str = "text", gram: int = 3):
        self.text_col = text_col
        self.gram = gram
        self.langs = list(_STOPWORDS)
        self.stop_arrays = [
            pa.array(sorted(_STOPWORDS[lang]), pa.string()) for lang in self.langs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        n = len(col)

        n_chars = pc.utf8_length(col).to_numpy(zero_copy_only=False).astype(np.int64)
        n_alpha = (
            pc.count_substring_regex(col, "[a-zA-Z]")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        with np.errstate(invalid="ignore"):
            alpha_ratio = np.where(n_chars > 0, n_alpha / np.maximum(n_chars, 1), 0.0)

        # tokenize once: \S+ runs, lowercased for stopwords/fingerprint
        tokens = pc.split_pattern_regex(col, r"\s+")
        # regex split emits empty strings at leading/trailing whitespace
        # — drop them to match re.findall(r"\S+") exactly
        flat = pc.list_flatten(tokens)
        parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
        n_tokens = np.bincount(parent, minlength=n).astype(np.int64)

        flat_lower = pc.utf8_lower(flat)
        hits = np.zeros((len(self.langs), n), dtype=np.int64)
        for li, stops in enumerate(self.stop_arrays):
            m = pc.is_in(flat_lower, value_set=stops).to_numpy(zero_copy_only=False)
            if m.any():
                hits[li] = np.bincount(parent[m], minlength=n)
        best_li = hits.argmax(axis=0)
        best_hits = hits[best_li, np.arange(n)]
        lang_codes = np.array(self.langs)
        langs = np.where(best_hits > 0, lang_codes[best_li], "und")
        with np.errstate(invalid="ignore"):
            stop_ratio = np.where(n_tokens > 0, best_hits / np.maximum(n_tokens, 1), 0.0)

        fingerprints = self._fingerprint_batch(flat_lower, parent, n_tokens, n)

        quality = np.clip(
            0.4 * alpha_ratio
            + 0.3 * np.minimum(n_tokens / 64.0, 1.0)
            + 0.3 * stop_ratio * 4.0,
            0.0,
            1.0,
        )
        out = batch
        for name, arr in [
            ("n_tokens", pa.array(n_tokens)),
            ("n_chars_calc", pa.array(n_chars)),
            ("alpha_ratio", pa.array(alpha_ratio)),
            ("stopword_ratio", pa.array(stop_ratio)),
            ("quality", pa.array(quality)),
            ("lang_pred", pa.array(langs.tolist(), pa.string())),
            ("fingerprint", pa.array(fingerprints)),
        ]:
            out = out.append_column(name, arr)
        return out

    def _fingerprint_batch(
        self, flat_lower: pa.Array, parent: np.ndarray, n_tokens: np.ndarray, n: int
    ) -> np.ndarray:
        """Rolling min-hash over word n-grams (documents sharing
        phrasing collide) — int64 per document.

        Documents with >= gram tokens: min FNV over all gram-token
        windows, built as ONE element-wise join over shifted views of
        the flattened token array.  Shorter documents hash their full
        joined text.  Identical to the former per-document loop."""
        g = self.gram
        out = np.zeros(n, dtype=np.int64)
        total = len(flat_lower)
        # gram windows exist only inside a single document's token run:
        # token positions are doc-ordered, so window starts are those
        # positions whose (g-1)-ahead neighbour shares the parent doc
        if total >= g:
            starts = np.flatnonzero(parent[: total - g + 1] == parent[g - 1 :])
        else:
            starts = np.empty(0, dtype=np.int64)
        if len(starts):
            parts = [flat_lower.take(pa.array(starts + k, pa.int64())) for k in range(g)]
            grams = pc.binary_join_element_wise(*parts, " ")
            gram_hash = _hash63_batch(grams)
            gram_doc = parent[starts]
            order_docs, first_idx = np.unique(gram_doc, return_index=True)
            mins = np.minimum.reduceat(gram_hash, first_idx)
            out[order_docs] = mins
        short = np.flatnonzero((n_tokens < g))
        if len(short):
            # join each short document's tokens with single spaces —
            # vectorized: slice the shorts' tokens into a list array
            # and element-wise binary_join (token positions are
            # doc-ordered, so the per-doc runs are contiguous)
            sel = np.flatnonzero(np.isin(parent, short))
            toks = flat_lower.take(pa.array(sel, pa.int64()))
            offs = np.concatenate(([0], np.cumsum(n_tokens[short]))).astype(np.int32)
            joined = pc.binary_join(
                pa.ListArray.from_arrays(pa.array(offs, pa.int32()), toks), " "
            )
            out[short] = _hash63_batch(joined)
        return out


def _analyze_task(batch, *, text_col):
    """Task-mode analyzer: the compiled-pattern/stopword state builds
    once per worker process (worker_state cache) — actor-pool state
    without per-stage actor spawn (the state here is milliseconds to
    build, so the spawn cost was pure overhead)."""
    from ..worker_state import get_or_build

    analyzer = get_or_build(
        ("text_analyzer", text_col), lambda: TextAnalyzer(text_col=text_col)
    )
    return analyzer(batch)


def analyze_documents(docs, *, text_col: str = "text", concurrency: int = 2,
                      batch_size=None, compute: str = "tasks"):
    """``concurrency`` sizes the actor pool when ``compute="actors"``;
    in the default task mode it is IGNORED (the warm task pool
    auto-scales with the cluster — capping it would starve workers)."""
    if compute == "tasks":
        import functools

        return docs.map_batches(
            functools.partial(_analyze_task, text_col=text_col),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return docs.map_batches(
        TextAnalyzer,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# ------------------------------------------------------------------ TF-IDF
def _term_freqs(tbl: pa.Table, *, doc_col: str, text_col: str) -> pa.Table:
    """Batch -> long (doc, term, tf) rows, fully vectorized: one Arrow
    regex split (\\s+ runs, the t_token_count-proven tokenization), a
    dictionary encode, and one np.unique over packed (row, term-code)
    keys.  Raw text never leaves this stage."""
    col = tbl[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tokens = pc.split_pattern_regex(col, r"\s+")
    flat = pc.list_flatten(tokens)
    parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(nonempty))
    parent = parent[nonempty].astype(np.int64)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    doc_ids = (
        pc.fill_null(tbl[doc_col], 0)
        .cast(pa.int64())
        .combine_chunks()
        .to_numpy(zero_copy_only=False)
    )
    if len(flat) == 0:
        return pa.table(
            {doc_col: pa.array([], pa.int64()), "term": pa.array([], pa.string()),
             "tf": pa.array([], pa.int64())}
        )
    denc = flat.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    v = len(denc.dictionary)
    pair = parent * v + codes  # row index bounds the high part: no overflow
    uniq, counts = np.unique(pair, return_counts=True)
    return pa.table(
        {
            doc_col: pa.array(doc_ids[(uniq // v)]),
            "term": denc.dictionary.take(pa.array(uniq % v)),
            "tf": pa.array(counts.astype(np.int64)),
        }
    )


def _bigram_counts(tbl: pa.Table, *, text_col: str) -> pa.Table:
    """Batch -> per-batch partial bigram counts (w1, w2, n): the same
    one-regex-split tokenization as ``_term_freqs``, adjacency by a
    shifted parent-index compare (two tokens are a bigram iff they are
    consecutive survivors of the SAME document after empty-token
    filtering), then one np.unique over packed code pairs — the n-gram
    LM-counting hot loop with zero per-row Python."""
    col = tbl[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    tokens = pc.split_pattern_regex(col, r"\s+")
    flat = pc.list_flatten(tokens)
    parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(nonempty))
    parent = parent[nonempty].astype(np.int64)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    empty = pa.table(
        {"w1": pa.array([], pa.string()), "w2": pa.array([], pa.string()),
         "n": pa.array([], pa.int64())}
    )
    if len(flat) < 2:
        return empty
    denc = flat.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    adj = parent[1:] == parent[:-1]
    if not adj.any():
        return empty
    v = np.int64(len(denc.dictionary))
    pair = codes[:-1][adj] * v + codes[1:][adj]  # v^2 <= tokens^2 < 2^62
    uniq, counts = np.unique(pair, return_counts=True)
    return pa.table(
        {
            "w1": denc.dictionary.take(pa.array(uniq // v)),
            "w2": denc.dictionary.take(pa.array(uniq % v)),
            "n": pa.array(counts.astype(np.int64)),
        }
    )


def _tfidf_score(tbl: pa.Table, *, ref, n_docs: float, scale: int,
                 doc_col: str, out_col: str) -> pa.Table:
    import ray as _ray

    from ..worker_state import cache_key_for_ref, get_or_build

    vocab, dfv = get_or_build(
        ("tfidf_df", cache_key_for_ref(ref)), lambda: _ray.get(ref)
    )
    codes = (
        pc.index_in(tbl["term"], value_set=vocab)
        .combine_chunks()
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)  # every term is in the df vocab by construction
    )
    tf = tbl["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
    score = tf * np.log(n_docs / dfv[codes]) * scale
    # half-away-from-zero to match SQL round() (np.round is half-to-even)
    scaled = (np.sign(score) * np.floor(np.abs(score) + 0.5)).astype(np.int64)
    return pa.table({doc_col: tbl[doc_col], "term": tbl["term"], out_col: pa.array(scaled)})


def _tfidf_scaled(tf: np.ndarray, dfv: np.ndarray, n_docs: float, scale: int) -> np.ndarray:
    score = tf * np.log(n_docs / dfv) * scale
    # half-away-from-zero to match SQL round() (np.round is half-to-even)
    return (np.sign(score) * np.floor(np.abs(score) + 0.5)).astype(np.int64)


def tfidf_topk(docs, *, doc_col: str = "doc_id", text_col: str = "text",
               k: int = 3, scale: int = 1_000_000, out_col: str = "score_1e6",
               num_partitions: int = 16, df_mode: str = "join",
               term_salt: int = 8):
    """Top-k TF-IDF terms per document (score = tf * ln(N/df), ranked on
    the integer-scaled score with the term as deterministic tiebreak).

    Distributed shape: tokenize once into a materialized (doc, term, tf)
    stream (TF-IDF is inherently two-pass: df must be complete before
    scoring, and materializing the slim term rows beats re-tokenizing
    the raw text); df comes from a combiner push-down groupby whose
    output is vocabulary-sized; the final per-doc top-k is grouped_topk
    — at most k x docs-in-block candidate rows leave any block, raw
    term rows never sort-shuffle.

    ``df_mode="join"`` (default, web-scale shape): the df table STAYS a
    Dataset — term rows and df rows ride ONE hash exchange keyed on
    (term, doc_id % term_salt) and scoring is a partition-local exact
    ``index_in`` against that partition's slice of the vocabulary.
    Nothing vocabulary-sized ever lands on the driver or in any single
    worker (a 10^8-term vocab splits ~evenly across partitions), and a
    HOT term (a stopword present in every document) spreads across
    ``term_salt`` partitions — the tiny df side is replicated to every
    salt (broadcast-fragment join) so each partition stays self-
    contained.

    ``df_mode="broadcast"``: classic small-side broadcast — the (vocab,
    df) arrays are assembled by a REMOTE reduce task straight from the
    df Dataset's block refs (never driver pandas) and read once per
    worker via the worker_state cache.  Cheaper below ~10^6 terms."""
    import functools

    import ray as _ray

    from ..relational import (
        empty_dataset,
        grouped_topk,
        hash_exchange_map,
        partial_grouped_agg,
    )

    n_docs = float(docs.count())  # parquet metadata count, no scan
    term_rows = docs.map_batches(
        functools.partial(_term_freqs, doc_col=doc_col, text_col=text_col),
        batch_format="pyarrow",
    ).materialize()
    df = partial_grouped_agg(
        term_rows.select_columns(["term"]), ["term"], {"df": (None, "count")}
    )

    if df_mode == "broadcast":
        @_ray.remote
        def _df_pack(*blocks):
            t = pa.concat_tables(blocks, promote_options="default")
            return (
                t["term"].combine_chunks(),
                pc.fill_null(t["df"], 0).cast(pa.int64())
                .combine_chunks().to_numpy(zero_copy_only=False)
                .astype(np.float64),
            )

        block_refs = [
            block_ref
            for bundle in df.iter_internal_ref_bundles()
            for block_ref, _meta in bundle.blocks
        ]
        ref = _df_pack.remote(*block_refs)
        scored = term_rows.map_batches(
            functools.partial(
                _tfidf_score, ref=ref, n_docs=n_docs, scale=scale,
                doc_col=doc_col, out_col=out_col,
            ),
            batch_format="pyarrow",
        )
    else:
        from ..relational import _crc32_vectorized

        union_schema = pa.schema(
            [(doc_col, pa.int64()), ("term", pa.string()),
             ("tf", pa.int64()), ("df", pa.int64()), ("__side", pa.int8()),
             ("__route", pa.int64())]
        )
        S = max(1, int(term_salt))

        # HOT-TERM skew guard: a stopword occurs in ~every document, so
        # routing term rows on the term alone would put O(corpus) rows
        # in one partition.  Salt the big side by doc_id % S and
        # replicate the TINY df side to all S salts (broadcast-fragment
        # join): each partition still holds every df row its term rows
        # need, and a hot term spreads across S partitions.
        def pad_terms(t: pa.Table) -> pa.Table:
            n = len(t)
            crc = _crc32_vectorized(
                t["term"].combine_chunks()
                if isinstance(t["term"], pa.ChunkedArray) else t["term"]
            ).astype(np.int64)
            docs_np = (
                pc.fill_null(t[doc_col], 0).cast(pa.int64())
                .combine_chunks().to_numpy(zero_copy_only=False)
            )
            route = crc * S + (docs_np % S)
            return pa.Table.from_arrays(
                [t[doc_col].cast(pa.int64()), t["term"], t["tf"].cast(pa.int64()),
                 pa.nulls(n, pa.int64()), pa.array(np.zeros(n, np.int8)),
                 pa.array(route)],
                schema=union_schema,
            )

        def pad_df(t: pa.Table) -> pa.Table:
            n = len(t)
            crc = _crc32_vectorized(
                t["term"].combine_chunks()
                if isinstance(t["term"], pa.ChunkedArray) else t["term"]
            ).astype(np.int64)
            rep = t.take(pa.array(np.tile(np.arange(n, dtype=np.int64), S)))
            route = np.tile(crc, S) * S + np.repeat(np.arange(S, dtype=np.int64), n)
            m = len(rep)
            return pa.Table.from_arrays(
                [pa.nulls(m, pa.int64()), rep["term"], pa.nulls(m, pa.int64()),
                 rep["df"].cast(pa.int64()), pa.array(np.ones(m, np.int8)),
                 pa.array(route)],
                schema=union_schema,
            )

        out_schema = pa.schema(
            [(doc_col, pa.int64()), ("term", pa.string()), (out_col, pa.int64())]
        )

        def score_partition(tbl: pa.Table) -> pa.Table:
            # split by side BEFORE numpy extraction: the padded union
            # has nulls that would otherwise round through float64
            lmask = pc.equal(tbl["__side"], 0)
            lt = tbl.filter(lmask)
            rt = tbl.filter(pc.invert(lmask))
            if len(lt) == 0:
                return out_schema.empty_table()
            vocab = rt["term"].combine_chunks()
            dfv = rt["df"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
            codes = (
                pc.index_in(lt["term"], value_set=vocab)
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)  # same rows built df: every term hits
            )
            tf = lt["tf"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.Table.from_arrays(
                [lt[doc_col].combine_chunks(), lt["term"].combine_chunks(),
                 pa.array(_tfidf_scaled(tf, dfv[codes], n_docs, scale))],
                schema=out_schema,
            )

        scored = hash_exchange_map(
            [
                term_rows.map_batches(pad_terms, batch_format="pyarrow"),
                df.map_batches(pad_df, batch_format="pyarrow"),
            ],
            "__route",
            num_partitions,
            score_partition,
        )
        if scored is None:
            return empty_dataset(out_schema)
    return grouped_topk(
        scored, doc_col, [(out_col, True), ("term", False)],
        k=k, num_partitions=num_partitions,
    )


def redact_documents(docs, *, pattern: str, replacement: str = "[REDACTED]",
                     doc_col: str = "doc_id", text_col: str = "text",
                     out_col: str = "redacted", n_col: str = "n_hits"):
    """Regex scrub stage — the PII-redaction shape of a curation
    pipeline (strip emails/phones/IDs before training).  Stateless
    ``map_batches``: per batch ONE ``pc.count_substring_regex`` (hit
    count per document, non-overlapping — the audit column) and ONE
    ``pc.replace_substring_regex`` (global replace), both RE2 executed
    in Arrow C++ — no Python per row, no state, embarrassingly
    parallel at any scale.

    Dialect note: Arrow's regex engine is RE2 and so is DuckDB's
    (``regexp_replace(..., 'g')`` / ``len(regexp_extract_all(...))``),
    which is what makes the driver gate exact — the same caveat as the
    tokenizer dialect documented on ``_term_freqs``.  Reference analog:
    none (the reference has no text surface); this extends the
    training-data curation suite (SURVEY.md §2 training-data ops).
    """
    out_schema = pa.schema([
        (doc_col, pa.int64()), (n_col, pa.int64()), (out_col, pa.string()),
    ])

    def kernel(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        n = pc.count_substring_regex(txt, pattern=pattern).cast(pa.int64())
        red = pc.replace_substring_regex(
            txt, pattern=pattern, replacement=replacement
        )
        return pa.Table.from_arrays(
            [t[doc_col].cast(pa.int64()), n.combine_chunks(),
             red.combine_chunks().cast(pa.string())],
            schema=out_schema,
        )

    return docs.map_batches(kernel, batch_format="pyarrow")


def char_diversity(docs, *, doc_col: str = "doc_id", text_col: str = "text"):
    """Character-diversity / repetitiveness signals per document, all
    exact integers: character count, distinct-character count, and the
    collision sum  sum_c count(c)^2  (the Simpson-index numerator —
    collision_sum / n_chars^2 is the probability two random character
    draws collide, a classic low-quality/repetitive-text flag that
    needs no float anywhere).

    Vectorized per batch with NO per-row work: the batch's utf8 data
    buffer is ONE flat uint8 array (string offsets are gapless), each
    byte is packed with its row index (row * 256 + byte), one
    ``np.unique`` yields all (doc, char) counts, and ``reduceat`` folds
    them to per-doc distinct counts / collision sums.

    Byte == character is asserted per batch (``utf8_length`` vs byte
    length): multi-byte (non-ASCII) input raises loudly rather than
    silently counting bytes as characters — extend with a codepoint
    decode stage for non-ASCII corpora."""
    out_schema = pa.schema([
        (doc_col, pa.int64()), ("n_chars", pa.int64()),
        ("n_distinct_chars", pa.int64()), ("collision_sum", pa.int64()),
    ])

    def kernel(t: pa.Table) -> pa.Table:
        n = len(t)
        if n == 0:
            return out_schema.empty_table()
        arr = t[text_col].combine_chunks()
        if arr.null_count:
            arr = pc.fill_null(arr, "")
        off_dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
        buffers = arr.buffers()
        offsets = np.frombuffer(buffers[1], dtype=off_dt)[
            arr.offset : arr.offset + n + 1
        ].astype(np.int64)
        lengths = offsets[1:] - offsets[:-1]
        char_len = pc.utf8_length(arr).to_numpy(zero_copy_only=False).astype(np.int64)
        if not np.array_equal(char_len, lengths):
            raise ValueError(
                "char_diversity: multi-byte (non-ASCII) text in batch — "
                "byte != character; decode to codepoints upstream"
            )
        data = (
            np.frombuffer(buffers[2], dtype=np.uint8)
            if buffers[2] is not None else np.empty(0, np.uint8)
        )
        flat = data[offsets[0] : offsets[-1]]
        row_of_byte = np.repeat(np.arange(n, dtype=np.int64), lengths)
        packed = row_of_byte * 256 + flat
        uniq, counts = np.unique(packed, return_counts=True)
        rows = uniq >> np.int64(8)
        rstart = np.flatnonzero(np.r_[True, rows[1:] != rows[:-1]])
        nd = np.zeros(n, dtype=np.int64)
        cs = np.zeros(n, dtype=np.int64)
        if len(uniq):
            present = rows[rstart]
            nd[present] = np.diff(np.r_[rstart, len(uniq)])
            cs[present] = np.add.reduceat(counts * counts, rstart)
        return pa.Table.from_pydict(
            {doc_col: t[doc_col].cast(pa.int64()), "n_chars": lengths,
             "n_distinct_chars": nd, "collision_sum": cs},
            schema=out_schema,
        )

    return docs.map_batches(kernel, batch_format="pyarrow")


def _term_freqs_with_dl(tbl: pa.Table, *, doc_col: str, text_col: str) -> pa.Table:
    """(doc, term, tf, dl) rows — ``_term_freqs`` plus the document
    token length attached AT TOKENIZE TIME: a document's text is one
    row, so all its term rows come from this batch and dl is a
    batch-local reduceat fact (no doc-keyed exchange ever needed)."""
    t = _term_freqs(tbl, doc_col=doc_col, text_col=text_col)
    n = len(t)
    if n == 0:
        return t.append_column("dl", pa.array([], pa.int64()))
    ids = t[doc_col].to_numpy(zero_copy_only=False)
    tf = t["tf"].to_numpy(zero_copy_only=False)
    starts = np.flatnonzero(np.r_[True, ids[1:] != ids[:-1]])
    dl = np.add.reduceat(tf, starts)
    reps = np.diff(np.r_[starts, n])
    return t.append_column("dl", pa.array(np.repeat(dl, reps).astype(np.int64)))


def bm25_topk(docs, *, doc_col: str = "doc_id", text_col: str = "text",
              k: int = 3, k1: float = 1.2, b: float = 0.75,
              scale: int = 1_000_000, out_col: str = "score_1e6",
              num_partitions: int = 16):
    """Top-k BM25 terms per document — the retrieval-grade upgrade of
    tfidf_topk: score = idf(term) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
    with idf = ln(1 + (N-df+0.5)/(df+0.5)) (Robertson/Sparck-Jones).

    Parity recipe (proven on tfidf_topk): both engines rank on the
    HALF-AWAY-rounded integer-scaled score with the term as tiebreak,
    so an ulp wobble in ln can never flip a rank; the SQL twin writes
    the arithmetic in the exact same operation order (including
    ``(k1 + 1)`` as a SUM — the literal 2.2 is a DIFFERENT double).

    Scale shape: tokenize once into materialized slim (doc, term, tf,
    dl) rows (dl attached batch-locally — a doc's text is one row, so
    no doc-keyed exchange); df via combiner-push-down groupby; scoring
    reads the (vocab, df) pair assembled by a REMOTE reduce straight
    from the df Dataset's blocks (never driver pandas) through the
    worker_state cache.  For 10^8+-term vocabularies swap the df side
    to the term-salted hash-exchange join exactly as tfidf_topk's
    ``df_mode="join"`` does — the machinery is shared."""
    import functools

    import ray as _ray

    from ..relational import grouped_topk, partial_grouped_agg
    from ..worker_state import cache_key_for_ref, get_or_build

    from ..relational import empty_dataset

    out_schema = pa.schema([(doc_col, pa.int64()), ("term", pa.string()),
                            (out_col, pa.int64())])
    n_docs = float(docs.count())
    rows = docs.map_batches(
        functools.partial(_term_freqs_with_dl, doc_col=doc_col, text_col=text_col),
        batch_format="pyarrow",
    ).materialize()
    total_tokens = rows.sum("tf") if rows.count() else None
    if not n_docs or total_tokens is None:
        return empty_dataset(out_schema)
    avgdl = float(total_tokens) / n_docs
    df = partial_grouped_agg(
        rows.select_columns(["term"]), ["term"], {"df": (None, "count")}
    )

    @_ray.remote
    def _df_pack(*blocks):
        t = pa.concat_tables(blocks, promote_options="default")
        return (
            t["term"].combine_chunks(),
            pc.fill_null(t["df"], 0).cast(pa.int64())
            .combine_chunks().to_numpy(zero_copy_only=False)
            .astype(np.float64),
        )

    block_refs = [
        block_ref
        for bundle in df.iter_internal_ref_bundles()
        for block_ref, _meta in bundle.blocks
    ]
    ref = _df_pack.remote(*block_refs)

    def score(t: pa.Table) -> pa.Table:
        vocab, dfv = get_or_build(
            ("bm25_df", cache_key_for_ref(ref)), lambda: _ray.get(ref)
        )
        codes = (
            pc.index_in(t["term"], value_set=vocab)
            .combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        )
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        dfx = dfv[codes]
        idf = np.log(1.0 + (n_docs - dfx + 0.5) / (dfx + 0.5))
        s = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl)) * scale
        scaled = (np.sign(s) * np.floor(np.abs(s) + 0.5)).astype(np.int64)
        return pa.Table.from_pydict(
            {doc_col: t[doc_col], "term": t["term"], out_col: pa.array(scaled)},
            schema=pa.schema([(doc_col, pa.int64()), ("term", pa.string()),
                              (out_col, pa.int64())]),
        )

    scored = rows.map_batches(score, batch_format="pyarrow")
    return grouped_topk(
        scored, doc_col, [(out_col, True), ("term", False)],
        k=k, num_partitions=num_partitions,
    )


_INVIDX_SCHEMA = pa.schema([("term", pa.string()), ("df", pa.int64()),
                            ("n_occ", pa.int64()), ("postings", pa.string())])


def inverted_index(
    docs,
    *,
    doc_col: str = "doc_id",
    text_col: str = "text",
    max_postings: int = 16,
    num_partitions: int = 16,
):
    """Build the exact-match search index over a document corpus: one
    row per distinct term with its document frequency, total occurrence
    count, and a posting list CAPPED at the ``max_postings`` smallest
    doc ids (comma-joined ascending — deterministic, SQL
    string_agg-comparable).  The cap is the index truncation every
    search engine applies to stop-word-grade terms; df/n_occ stay EXACT
    over all documents.

    Scale shape: raw text reduces to slim (term, doc_id, tf) rows
    inside the reading task (_term_freqs — one Arrow regex split +
    packed np.unique per batch, each doc lives in exactly one row so
    the pairs are globally unique); ONE hash exchange on the term hash
    co-locates each term's postings; the per-partition kernel is a
    single lexsort + reduceat + one pc.binary_join over capped
    list-slices — no per-term Python loop, and raw text never
    shuffles."""
    from ..relational import empty_dataset, hash_exchange_map

    def prep(t: pa.Table) -> pa.Table:
        tf = _term_freqs(t, doc_col=doc_col, text_col=text_col)
        term = tf["term"]
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        return tf.append_column(
            "term_key", pa.array(_hash63_batch(term).astype(np.int64)))

    rows = docs.map_batches(prep, batch_format="pyarrow")

    def kernel(tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        n = len(tbl)
        if n == 0:
            return _INVIDX_SCHEMA.empty_table()
        term = tbl["term"]
        if isinstance(term, pa.ChunkedArray):
            term = term.combine_chunks()
        denc = term.dictionary_encode()
        codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        doc = tbl[doc_col].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = tbl["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((doc, codes))
        cs, ds_, tfs = codes[order], doc[order], tf[order]
        starts = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1]])
        ends = np.r_[starts[1:], n]
        lens = ends - starts
        n_occ = np.add.reduceat(tfs, starts)
        # cap each posting list at the max_postings SMALLEST doc ids
        rank = np.arange(n) - np.repeat(starts, lens)
        keep = rank < max_postings
        capped = np.minimum(lens, max_postings)
        offsets = np.r_[0, np.cumsum(capped)].astype(np.int32)
        doc_str = pc.cast(pa.array(ds_[keep]), pa.string())
        la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), doc_str)
        return pa.Table.from_pydict(
            {"term": denc.dictionary.take(pa.array(cs[starts])),
             "df": pa.array(lens.astype(np.int64)),
             "n_occ": pa.array(n_occ.astype(np.int64)),
             "postings": pc.binary_join(la, ",")},
            schema=_INVIDX_SCHEMA)

    out = hash_exchange_map(rows, "term_key", num_partitions, kernel)
    if out is None:
        return empty_dataset(_INVIDX_SCHEMA)
    return out


def winnowing_fingerprints(docs, *, doc_col: str = "doc_id",
                           text_col: str = "text", gram: int = 3,
                           window: int = 4):
    """Winnowing fingerprints (the MOSS local-similarity algorithm,
    simplified to the distinct-window-min set): hash every word
    ``gram``-gram, slide a ``window`` over the gram-hash sequence, and
    keep the DISTINCT window minima — a position-robust fingerprint set
    guaranteeing any shared run of ``window+gram-1`` words produces a
    shared fingerprint, unlike the single global min.

    Fully batch-local (a document's grams never leave its batch) and
    vectorized: one sliding_window_view min over the flattened gram
    hashes, validity = window start and end share a parent doc;
    documents with fewer than ``window`` grams contribute their global
    gram min; documents shorter than ``gram`` tokens hash their joined
    text (the t_fingerprint short rule).  Output per doc:
    (doc_id, n_fps, min_fp, xor_fp) with xor over the distinct set —
    order-free integer evidence a SQL twin reproduces exactly."""

    def fn(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        col = pc.fill_null(col, "")
        n = len(col)
        tokens = pc.split_pattern_regex(pc.utf8_lower(col), r"\s+")
        flat = pc.list_flatten(tokens)
        parent = pc.list_parent_indices(tokens).to_numpy(zero_copy_only=False)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(nonempty))
        parent = parent[nonempty]
        n_tokens = np.bincount(parent, minlength=n).astype(np.int64)

        total = len(flat)
        if total >= gram:
            starts = np.flatnonzero(parent[: total - gram + 1] == parent[gram - 1:])
        else:
            starts = np.empty(0, dtype=np.int64)
        fd_parts, fv_parts = [], []
        if len(starts):
            parts = [flat.take(pa.array(starts + k, pa.int64())) for k in range(gram)]
            gram_hash = _hash63_batch(pc.binary_join_element_wise(*parts, " "))
            gram_doc = parent[starts]
            ng = np.bincount(gram_doc, minlength=n)
            if len(gram_hash) >= window:
                sw = np.lib.stride_tricks.sliding_window_view(gram_hash, window)
                valid = gram_doc[: len(sw)] == gram_doc[window - 1:]
                fd_parts.append(gram_doc[: len(sw)][valid])
                fv_parts.append(sw.min(axis=1)[valid])
            few = (ng >= 1) & (ng < window)
            if few.any():
                order_docs, first_idx = np.unique(gram_doc, return_index=True)
                mins = np.minimum.reduceat(gram_hash, first_idx)
                sel = few[order_docs]
                fd_parts.append(order_docs[sel])
                fv_parts.append(mins[sel])
        short = np.flatnonzero(n_tokens < gram)
        if len(short):
            sel = np.flatnonzero(np.isin(parent, short))
            toks = flat.take(pa.array(sel, pa.int64()))
            offs = np.concatenate(([0], np.cumsum(n_tokens[short]))).astype(np.int32)
            joined = pc.binary_join(
                pa.ListArray.from_arrays(pa.array(offs, pa.int32()), toks), " "
            )
            fd_parts.append(short)
            fv_parts.append(_hash63_batch(joined))

        fd = np.concatenate(fd_parts) if fd_parts else np.empty(0, np.int64)
        fv = np.concatenate(fv_parts) if fv_parts else np.empty(0, np.int64)
        order = np.lexsort((fv, fd))
        fd, fv = fd[order], fv[order]
        keep = np.ones(len(fd), dtype=bool)
        keep[1:] = (fd[1:] != fd[:-1]) | (fv[1:] != fv[:-1])
        fd, fv = fd[keep], fv[keep]
        udocs, first = np.unique(fd, return_index=True)
        n_fps = np.diff(np.r_[first, len(fd)]).astype(np.int64)
        min_fp = np.minimum.reduceat(fv, first) if len(fv) else fv
        xor_fp = np.bitwise_xor.reduceat(fv, first) if len(fv) else fv
        ids = batch[doc_col].combine_chunks().cast(pa.int64()) \
            .take(pa.array(udocs, pa.int64()))
        return pa.table({
            "doc_id": ids,
            "n_fps": pa.array(n_fps),
            "min_fp": pa.array(min_fp.astype(np.int64)),
            "xor_fp": pa.array(xor_fp.astype(np.int64)),
        })

    return docs.map_batches(fn, batch_format="pyarrow")
