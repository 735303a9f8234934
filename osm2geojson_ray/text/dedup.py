"""Deduplication operators over document Datasets.

- exact_dedup: content-hash -> hash-partitioned groupby -> keep the
  min doc id per distinct content (one shuffle on the hash key).
- minhash_lsh_pairs: shingle -> minhash -> band -> bucket groupby ->
  candidate pairs -> exact Jaccard verify.
- simhash_signatures: 64-bit simhash per document (near-dup key).
- embedding_neardup_pairs: cosine > threshold pairs via coarse bucket
  (sign of first principal-ish hash dims) + in-bucket matmul verify.

All hashes are process-stable (FNV/splitmix), never builtin hash().
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pyarrow as pa

from ..images.synth import splitmix64
from .analysis import _hash63

_TOKEN_RE = re.compile(r"\S+")


def _distinct_pairs(pairs, num_partitions: int = 16):
    """Distinct (a_id, b_id) rows via a synthetic pair key +
    partition-wise dedup."""
    from ..relational import distinct_on

    keyed = pairs.map_batches(
        lambda t: t.append_column(
            "pair_key",
            pa.array(
                t["a_id"].to_numpy(zero_copy_only=False) * np.int64(1_000_003)
                + t["b_id"].to_numpy(zero_copy_only=False)
            ),
        ),
        batch_format="pyarrow",
    )
    return distinct_on(keyed, "pair_key", num_partitions=num_partitions).drop_columns(
        ["pair_key"]
    )


def _content_hash_col(batch: pa.Table, text_col: str) -> pa.Table:
    hashes = np.fromiter(
        (_hash63(t or "") for t in batch[text_col].to_pylist()),
        dtype=np.int64,
        count=len(batch),
    )
    return batch.append_column("content_hash", pa.array(hashes))


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
):
    """Near-duplicate pairs (a_id < b_id, exact-verified n-gram Jaccard
    >= threshold).  Shuffle key: (band index, band hash)."""
    rows_per_band = num_hashes // bands

    class Sigs:
        def __init__(self):
            self.num_hashes = num_hashes
            self.k = shingle_k

        def __call__(self, batch: pa.Table) -> pa.Table:
            out_key, out_id, out_text = [], [], []
            for did, text in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
                sig = minhash_signature(text, self.num_hashes, self.k)
                for b in range(bands):
                    band = sig[b * rows_per_band : (b + 1) * rows_per_band]
                    bh = int(splitmix64(band ^ np.uint64(b + 1)).sum() & np.uint64(0x3FFFFFFFFFFFFF))
                    out_key.append(bh * bands + b)
                    out_id.append(did)
                    out_text.append(text)
            return pa.Table.from_pydict(
                {"bucket": out_key, "doc_id_": out_id, "text_": out_text},
                schema=pa.schema(
                    [("bucket", pa.int64()), ("doc_id_", pa.int64()), ("text_", pa.string())]
                ),
            )

    banded = docs.map_batches(Sigs, batch_format="pyarrow", concurrency=concurrency)

    # partition by bucket hash; within a partition, singleton buckets
    # (the vast majority) are dropped VECTORIZED and only multi-member
    # buckets pay the pairwise Jaccard verify
    def partition_pairs(df):
        import pandas as pd

        df = df[df.duplicated("bucket", keep=False)]
        rows = []
        for _, grp in df.groupby("bucket", sort=False):
            grp = grp.drop_duplicates(subset=["doc_id_"]).sort_values("doc_id_")
            if len(grp) < 2:
                continue
            ids = grp["doc_id_"].tolist()
            grams = [
                set(_shingles([w.lower() for w in _TOKEN_RE.findall(t or "")], shingle_k))
                for t in grp["text_"].tolist()
            ]
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    union = len(grams[i] | grams[j])
                    jac = len(grams[i] & grams[j]) / union if union else 0.0
                    if jac >= jaccard_threshold:
                        rows.append((ids[i], ids[j], jac))
        return pd.DataFrame(rows, columns=["a_id", "b_id", "jaccard"]).astype(
            {"a_id": "int64", "b_id": "int64", "jaccard": "float64"}
        )

    from ..relational import _with_part

    pairs = (
        _with_part(banded, "bucket", 16)
        .groupby("__part")
        .map_groups(partition_pairs, batch_format="pandas")
    )
    return _distinct_pairs(pairs)


def simhash_signatures(docs, *, text_col: str = "text", id_col: str = "doc_id",
                       concurrency: int = 4):
    """64-bit simhash per doc: weighted bit-vote over token hashes."""

    class Sim:
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = []
            for text in batch[text_col].to_pylist():
                words = [w.lower() for w in _TOKEN_RE.findall(text or "")]
                if not words:
                    out.append(0)
                    continue
                hs = np.array([_hash63(w) for w in words], dtype=np.uint64)
                bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                    np.int64
                )
                votes = (2 * bits - 1).sum(axis=0)
                sig = np.uint64(0)
                for b in range(64):
                    if votes[b] > 0:
                        sig |= np.uint64(1) << np.uint64(b)
                out.append(int(sig.astype(np.int64)))
            return pa.Table.from_pydict(
                {"doc_id": batch[id_col], "simhash": pa.array(out, pa.int64())},
                schema=pa.schema([("doc_id", pa.int64()), ("simhash", pa.int64())]),
            )

    return docs.map_batches(Sim, batch_format="pyarrow", concurrency=concurrency)


def embedding_neardup_pairs(
    embeddings,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bucket_bits: int = 4,
    num_partitions: Optional[int] = None,
):
    """Pairs with cosine >= threshold.  Coarse LSH: sign bits of
    ``bucket_bits`` fixed random-ish projections (derived from
    splitmix64, deterministic) route vectors to buckets; vectors near
    the boundary of a projection go to BOTH child buckets (multi-probe)
    so true pairs aren't split."""

    def bucket_rows(batch: pa.Table) -> pa.Table:
        vecs = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
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
        margin = 0.05
        out_bucket, out_id, out_vec = [], [], []
        for i in range(len(vecs)):
            codes = [0]
            for b in range(bucket_bits):
                d = dots[i, b]
                branches = []
                if d > -margin:
                    branches.append(1)
                if d < margin:
                    branches.append(0)
                codes = [c * 2 + br for c in codes for br in branches]
            for c in set(codes):
                out_bucket.append(c)
                out_id.append(int(ids[i]))
                out_vec.append(unit[i].tolist())
        return pa.Table.from_pydict(
            {"bucket": out_bucket, "vec_id_": out_id, "vec_": out_vec},
            schema=pa.schema(
                [("bucket", pa.int64()), ("vec_id_", pa.int64()),
                 ("vec_", pa.list_(pa.float64()))]
            ),
        )

    bucketed = embeddings.map_batches(bucket_rows, batch_format="pyarrow")

    def bucket_pairs(df):
        import pandas as pd

        df = df.drop_duplicates(subset=["vec_id_"]).sort_values("vec_id_")
        ids = df["vec_id_"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a_id": [], "b_id": [], "cosine": []}).astype(
                {"a_id": "int64", "b_id": "int64", "cosine": "float64"}
            )
        mat = np.array(df["vec_"].tolist(), dtype=np.float64)
        sims = mat @ mat.T
        ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {"a_id": ids[ai], "b_id": ids[bi], "cosine": np.round(sims[ai, bi], 9)}
        )

    pairs = bucketed.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
    return _distinct_pairs(pairs)
