"""Image synthesis/codec invariants and text-analysis/dedup operators."""

import numpy as np
import pyarrow as pa

import ray.data

from osm2geojson_ray.images.codec import decode_image, encode_image, psnr
from osm2geojson_ray.images.phash import hamming64, phash64
from osm2geojson_ray.images.synth import _pixels_for, synth_image_batch, synth_image_table
from osm2geojson_ray.text.analysis import analyze_documents
from osm2geojson_ray.text.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    simhash_signatures,
)


def test_codec_lossless_roundtrip():
    px = _pixels_for(5, 24, 16)
    assert (decode_image(encode_image(px, "rgb8")) == px).all()


def test_codec_lossy_psnr_gate():
    px = _pixels_for(9, 24, 16)
    dec = decode_image(encode_image(px, "rgb5"))
    p = psnr(px, dec)
    assert p >= 40.0  # input_hint invariant: PSNR >= 40 dB for lossy


def test_synth_deterministic_and_schema():
    t1 = synth_image_batch(0, 8)
    t2 = synth_image_batch(0, 8)
    assert t1.equals(t2)
    assert t1.schema.names == ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    # per-row invariant: decode matches pixels, phash matches recompute
    for row in t1.to_pylist():
        dec = decode_image(row["bytes"])
        i = int(row["image_id"].split("-")[1])
        px = _pixels_for(i, 24, 16)
        if row["fmt"] == "rgb8":
            assert (dec == px).all()
        else:
            assert psnr(px, dec) >= 40.0
        assert phash64(px) == row["phash"]


def test_synth_table_parallel(ray_session):
    ds = synth_image_table(50, partition_rows=16)
    rows = ds.take_all()
    assert len(rows) == 50
    assert sorted(r["image_id"] for r in rows) == [f"img-{i:012d}" for i in range(50)]


def test_phash_similar_images_close():
    a = _pixels_for(3, 24, 16)
    b = a.copy()
    b[0, 0] = [0, 0, 0]  # tiny perturbation
    d = hamming64(np.array([phash64(a)]), np.array([phash64(b)]))[0]
    assert d <= 4


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog in the park"),
    (1, "the quick brown fox jumps over the lazy dog in the park"),  # dup of 0
    (2, "el perro grande corre en el parque y la casa de la ciudad"),
    (3, "the quick brown fox jumps over the lazy dog in the yard"),  # near-dup of 0
    (4, "completely different content about ray data pipelines and arrow"),
]


def _docs_ds():
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_id": [d[0] for d in DOCS], "text": [d[1] for d in DOCS]}
        )
    )


def test_text_analysis(ray_session):
    rows = {r["doc_id"]: r for r in analyze_documents(_docs_ds(), concurrency=2).take_all()}
    assert rows[0]["n_tokens"] == 12
    assert rows[0]["lang_pred"] == "en"
    assert rows[2]["lang_pred"] == "es"
    assert rows[0]["fingerprint"] == rows[1]["fingerprint"]  # identical docs
    assert 0.0 <= rows[0]["quality"] <= 1.0


def test_exact_dedup(ray_session):
    kept = sorted(r["doc_id"] for r in exact_dedup(_docs_ds()).take_all())
    assert kept == [0, 2, 3, 4]  # doc 1 collapsed into 0


def test_minhash_pairs(ray_session):
    pairs = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs(
            _docs_ds(), jaccard_threshold=0.5, concurrency=2
        ).take_all()
    }
    assert (0, 1) in pairs  # exact dup always found
    assert (0, 3) in pairs or (1, 3) in pairs  # near dup
    assert all(a != 4 and b != 4 for a, b in pairs)


def test_ngram_contamination_matches_bruteforce(ray_session):
    from osm2geojson_ray.text.dedup import ngram_contamination

    docs = DOCS + [(5, ""), (6, "two words"), (7, "two words")]
    ds = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"doc_id": [d[0] for d in docs], "text": [d[1] for d in docs]}
        )
    )

    def gram_set(text):
        ws = text.lower().split()
        if not ws:
            return set()
        if len(ws) < 3:
            return {" ".join(ws)}
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    sets = {i: gram_set(t) for i, t in docs}
    expect = {}
    for i, s in sets.items():
        if not s:
            continue  # no-token docs emit no row
        shared = sum(
            1 for g in s if any(g in sets[j] for j in sets if j != i)
        )
        expect[i] = (len(s), shared, shared * 1_000_000 // len(s))

    got = {
        r["doc_id"]: (r["n_grams"], r["n_shared"], r["shared_ppm"])
        for r in ngram_contamination(ds, num_partitions=4).take_all()
    }
    assert got == expect
    # the planted structure: doc 1 fully contaminated by its dup of 0
    assert got[1][2] == 1_000_000
    assert got[4][1] == 0  # unique content shares nothing


def test_simhash(ray_session):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(_docs_ds()).take_all()}
    assert sigs[0] == sigs[1]
    d03 = hamming64(np.array([sigs[0]]), np.array([sigs[3]]))[0]
    d04 = hamming64(np.array([sigs[0]]), np.array([sigs[4]]))[0]
    assert d03 < d04


def test_embedding_neardup(ray_session):
    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 8))
    vecs = np.vstack([base, base[0] + rng.normal(scale=0.01, size=8)])
    ds = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"vec_id": np.arange(21, dtype=np.int64), "embedding": [v.tolist() for v in vecs]}
        )
    )
    pairs = {(r["a_id"], r["b_id"]) for r in embedding_neardup_pairs(ds, threshold=0.99).take_all()}
    assert (0, 20) in pairs


def test_embedding_neardup_probe_cap(ray_session):
    """An adversarial near-zero vector straddles every projection's
    margin; the probe cap must bound its bucket fan-out to
    2^max_probe_planes instead of 2^bucket_bits, while planted near
    -duplicate pairs are still found."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(10, 8))
    near_zero = np.full(8, 1e-9)
    vecs = np.vstack([base, base[0] + rng.normal(scale=0.01, size=8),
                      near_zero, near_zero * 1.0001])
    ds = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"vec_id": np.arange(len(vecs), dtype=np.int64),
             "embedding": [v.tolist() for v in vecs]}
        )
    )
    pairs = {(r["a_id"], r["b_id"])
             for r in embedding_neardup_pairs(ds, threshold=0.99,
                                              max_probe_planes=3).take_all()}
    assert (0, 10) in pairs          # planted near-dup survives the cap
    assert (11, 12) in pairs         # the degenerate twins still co-locate
    # direct fan-out bound on the code enumeration: a vector straddling
    # every plane emits 2^cap codes, not 2^bucket_bits
    from osm2geojson_ray.text.dedup import _probe_bucket_codes

    dots = np.zeros((1, 8))          # straddles all 8 planes
    assert len(_probe_bucket_codes(dots, 8, 3)[0]) == 2 ** 3
    assert len(_probe_bucket_codes(dots, 8, None)[0]) == 2 ** 8


def test_verify_pixels_sse_matches_scalar_oracle(ray_session):
    from osm2geojson_ray.images.synth import _pixels_for, synth_image_table
    from osm2geojson_ray.images.transform import verify_images

    ds = synth_image_table(64, partition_rows=16)
    rows = {r["image_idx"]: r for r in verify_images(ds).take_all()}
    assert len(rows) == 64
    for i in range(64):
        r = rows[i]
        # scalar per-image oracle: decode + regenerate + exact SSE
        blob = [b for b in ds.take_all() if b["image_id"] == f"img-{i:012d}"][0]["bytes"]
        px = decode_image(blob)
        ref = _pixels_for(i, px.shape[1], px.shape[0])
        want_sse = int(((px.astype(np.int64) - ref.astype(np.int64)) ** 2).sum())
        assert r["sse"] == want_sse
        assert r["lossy"] == (i % 4 == 0)
        assert r["sse_zero"] == (want_sse == 0)
        # lossless rows are bit-exact; lossy rows really are lossy but
        # clear the 40 dB bar (the codec's design point)
        assert r["sse_zero"] == (not r["lossy"])
        assert r["pass_40db"]
        p = psnr(px, ref)
        assert (p == float("inf")) if not r["lossy"] else (40.0 <= p < 46.0)


def test_image_transform_stages(ray_session):
    """resize / feature-extract / frame-sample actor stages: real Ray
    plumbing over the self-contained container."""
    import numpy as np
    import pyarrow as pa

    from osm2geojson_ray.images.codec import decode_image
    from osm2geojson_ray.images.synth import synth_image_table
    from osm2geojson_ray.images.transform import (
        FEATURE_DIM,
        extract_features,
        resize_images,
        sample_frames,
    )

    ds = synth_image_table(64, partition_rows=16)

    small = resize_images(ds, size=(8, 8)).take_all()
    assert len(small) == 64
    for r in small[:4]:
        px = decode_image(r["bytes"])
        assert px.shape == (8, 8, 3)
        assert r["w"] == 8 and r["h"] == 8

    feats = extract_features(ds).take_all()
    assert len(feats) == 64
    v0 = np.array(feats[0]["embedding"], dtype=np.float32)
    assert v0.shape == (FEATURE_DIM,)
    # deterministic: same input row -> same embedding
    feats2 = extract_features(ds).take_all()
    by_id = {r["image_id"]: r["embedding"] for r in feats2}
    assert list(by_id[feats[0]["image_id"]]) == list(feats[0]["embedding"])

    # frame sampling: build 3-frame rows by concatenation, sample every 2nd
    def to_video(batch: pa.Table) -> pa.Table:
        blobs = [b * 3 for b in batch["bytes"].to_pylist()]
        return pa.Table.from_pydict(
            {
                "image_id": batch["image_id"],
                "bytes": blobs,
                "fmt": batch["fmt"],
                "n_frames": [3] * len(batch),
            }
        )

    frames = sample_frames(ds.map_batches(to_video, batch_format="pyarrow"),
                           every_k=2).take_all()
    assert len(frames) == 64 * 2  # frames 0 and 2 of 3
    assert sorted({r["frame"] for r in frames}) == [0, 2]
    px = decode_image(frames[0]["bytes"])
    assert px.shape == (frames[0]["h"], frames[0]["w"], 3)


def test_jaccard_pairs_exact_superset_of_lsh(ray_session):
    """Exact gram-index Jaccard pairs are complete: every LSH pair (an
    approximation of the same predicate) must be found."""
    from osm2geojson_ray.text.dedup import jaccard_pairs

    exact = {
        (r["a_id"], r["b_id"])
        for r in jaccard_pairs(_docs_ds(), jaccard_threshold=0.5).take_all()
    }
    assert (0, 1) in exact
    lsh = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs(_docs_ds(), jaccard_threshold=0.5).take_all()
    }
    assert lsh <= exact


def test_jaccard_pairs_large_ids_no_key_collision(ray_session):
    """Doc ids straddling 1e6: under the old a*1_000_003+b pair key,
    pairs (2,5) and (1,1_000_008) collided to the same key and one was
    silently merged away.  The mixed routing key + real-column grouping
    must emit both."""
    from osm2geojson_ray.text.dedup import jaccard_pairs

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    text_b = "completely different content about distributed shuffles and arrow"
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([2, 5, 1, 1_000_008], pa.int64()),
        "text": pa.array([text_a, text_a, text_b, text_b]),
    }))
    pairs = {
        (r["a_id"], r["b_id"])
        for r in jaccard_pairs(docs, jaccard_threshold=0.9).take_all()
    }
    assert (2, 5) in pairs and (1, 1_000_008) in pairs, pairs


def test_sample_frames_varying_counts_matches_rowwise_oracle(ray_session):
    """Vectorized frame explode == per-row slicing oracle when n_frames
    varies per row (incl. single-frame identity and every_k > n)."""
    import struct as _struct

    import numpy as np
    import pyarrow as pa

    from osm2geojson_ray.images.synth import synth_image_table
    from osm2geojson_ray.images.transform import sample_frames

    rng = np.random.default_rng(3)
    base = synth_image_table(20, partition_rows=10).take_all()
    nfs = rng.integers(1, 6, len(base)).tolist()
    rows = []
    for r, nf in zip(base, nfs):
        rows.append(
            {
                "image_id": r["image_id"],
                "bytes": r["bytes"] * int(nf),
                "fmt": r["fmt"],
                "n_frames": int(nf),
            }
        )
    import ray.data

    for k in (1, 2, 4):
        got = sample_frames(
            ray.data.from_arrow(pa.Table.from_pylist(rows)), every_k=k
        ).take_all()
        want = []
        for r in rows:
            flen = len(r["bytes"]) // r["n_frames"]
            for j in range(0, r["n_frames"], k):
                fb = r["bytes"][j * flen : (j + 1) * flen]
                w, h, _, _ = _struct.unpack("<HHBB", fb[2:8])
                want.append((r["image_id"], j, fb, w, h, r["fmt"]))
        got_t = sorted(
            (g["image_id"], g["frame"], g["bytes"], g["w"], g["h"], g["fmt"])
            for g in got
        )
        assert got_t == sorted(want), f"every_k={k}"


def test_tfidf_topk_hand_values(ray_session):
    """4-doc corpus with hand-computable scores: 'apple' appears in all
    docs (idf=0, never a top term when others exist), 'rare' in one."""
    import math

    from osm2geojson_ray.text.analysis import tfidf_topk

    docs = [
        "apple rare rare",        # rare: tf=2, df=1 -> 2*ln(4)
        "apple banana",           # banana: tf=1, df=2 -> ln(2)
        "apple banana cherry",    # cherry: tf=1, df=2
        "apple  cherry\tcherry",  # whitespace runs collapse
    ]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    )
    out = (
        tfidf_topk(ds, k=2, scale=1_000_000)
        .to_pandas()
        .sort_values(["doc_id", "score_1e6", "term"],
                     ascending=[True, False, True])
        .reset_index(drop=True)
    )
    s = lambda x: int(math.floor(abs(x) * 1e6 + 0.5))
    got = list(map(tuple, out[["doc_id", "term", "score_1e6"]].to_numpy()))
    assert got == [
        (0, "rare", s(2 * math.log(4))),
        (0, "apple", 0),
        (1, "banana", s(math.log(2))),
        (1, "apple", 0),
        (2, "banana", s(math.log(2))),   # tie banana/cherry -> term asc
        (2, "cherry", s(math.log(2))),
        (3, "cherry", s(2 * math.log(2))),
        (3, "apple", 0),
    ]


def test_quantize_embeddings_roundtrip_bound(ray_session):
    import ray.data

    from osm2geojson_ray.vectors import quantize_embeddings, vec_matrix

    rng = np.random.default_rng(13)
    n, d = 64, 8
    M = rng.normal(0, 2.0, (n, d)).astype(np.float32)
    tbl = pa.table(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(M)}
    )
    out = (
        quantize_embeddings(ray.data.from_arrow(tbl).repartition(3),
                            "vec_id", "embedding", levels=127)
        .to_pandas()
        .sort_values(["vec_id", "dim"])
        .reset_index(drop=True)
    )
    assert len(out) == n * d
    codes = out["code"].to_numpy().reshape(n, d)
    assert codes.min() >= -127 and codes.max() <= 127
    amax = np.abs(M.astype(np.float64)).max(axis=0)
    recon = codes * amax / 127.0
    # floor quantization: reconstruction within one step of the input
    assert np.all(np.abs(recon - M.astype(np.float64)) <= amax / 127.0 + 1e-12)


def test_kmeans_recovers_planted_clusters(ray_session):
    import ray.data

    from osm2geojson_ray.vectors import kmeans

    rng = np.random.default_rng(71)
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0], [10.0, 10.0]])
    n_per = 60
    pts = np.concatenate(
        [c + rng.normal(0, 0.3, (n_per, 2)) for c in centers]
    ).astype(np.float32)
    ids = np.arange(len(pts), dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"vec_id": ids, "embedding": list(pts)})
    ).repartition(4)

    assign_ds, cents, iters = kmeans(ds, "vec_id", "embedding", k=4, max_iters=30)
    out = assign_ds.to_pandas().sort_values("id").reset_index(drop=True)
    assert len(out) == len(pts) and iters <= 30

    # every planted cluster maps to exactly one k-means cluster
    labels = out["cluster"].to_numpy()
    for g in range(4):
        grp = labels[g * n_per : (g + 1) * n_per]
        assert len(set(grp.tolist())) == 1
    assert len(set(labels.tolist())) == 4

    # each final centroid is near its planted center
    recovered = sorted(tuple(np.round(c).astype(int)) for c in cents)
    assert recovered == sorted(map(tuple, centers.astype(int)))

    # assignments equal argmin distance to the returned centroids
    d2 = ((pts[:, None, :].astype(np.float64) - cents[None, :, :]) ** 2).sum(axis=2)
    assert (labels == np.argmin(d2, axis=1)).all()


def test_kmeans_deterministic(ray_session):
    import ray.data

    from osm2geojson_ray.vectors import kmeans

    rng = np.random.default_rng(72)
    pts = rng.normal(0, 1, (150, 4)).astype(np.float32)
    tbl = pa.table({"vec_id": np.arange(150, dtype=np.int64), "embedding": list(pts)})
    a1, c1, _ = kmeans(ray.data.from_arrow(tbl).repartition(3), "vec_id", "embedding", k=5)
    a2, c2, _ = kmeans(ray.data.from_arrow(tbl).repartition(5), "vec_id", "embedding", k=5)
    p1 = a1.to_pandas().sort_values("id").reset_index(drop=True)
    p2 = a2.to_pandas().sort_values("id").reset_index(drop=True)
    assert p1["cluster"].tolist() == p2["cluster"].tolist()
    assert np.allclose(c1, c2)


def test_tfidf_df_path_never_driver_materializes(ray_session, monkeypatch):
    """Default (join) mode: the document-frequency table must stay a
    Dataset end-to-end — no .to_pandas()/take_all() of the vocabulary on
    the driver (the 100-TB scale-killer flagged in round 4)."""
    import ray.data

    from osm2geojson_ray.text.analysis import tfidf_topk

    def boom(self, *a, **k):
        raise AssertionError("driver-side materialization inside tfidf_topk")

    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(range(6), pa.int64()),
                  "text": pa.array([f"alpha beta w{i} w{i%3}" for i in range(6)])})
    ).repartition(3)

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", boom)
    monkeypatch.setattr(ray.data.Dataset, "take_all", boom)
    out = tfidf_topk(docs, k=2, scale=1_000_000)
    monkeypatch.undo()
    got = out.to_pandas().sort_values(["doc_id", "score_1e6", "term"],
                                      ascending=[True, False, True])
    assert len(got) == 12  # 2 per doc

    # broadcast mode (remote-assembled ref, still no driver pandas of df)
    monkeypatch.setattr(ray.data.Dataset, "to_pandas", boom)
    out_b = tfidf_topk(docs, k=2, scale=1_000_000, df_mode="broadcast")
    monkeypatch.undo()
    got_b = out_b.to_pandas().sort_values(["doc_id", "score_1e6", "term"],
                                          ascending=[True, False, True])
    assert got.reset_index(drop=True).equals(got_b.reset_index(drop=True))


def test_enumerate_bucket_pairs_vectorized_and_capped():
    from osm2geojson_ray.text.dedup import _enumerate_bucket_pairs

    keys = np.array([5, 5, 5, 9, 9, 9, 9, 2, 5], dtype=np.int64)
    ids = np.array([3, 1, 3, 7, 8, 7, 9, 4, 2], dtype=np.int64)  # dups collapse
    t = _enumerate_bucket_pairs(keys, ids)
    got = sorted(zip(t["a_id"].to_pylist(), t["b_id"].to_pylist()))
    assert got == [(1, 2), (1, 3), (2, 3), (7, 8), (7, 9), (8, 9)]

    # cap: the size-4 group {1,2,3} has 3 ids, group 9 has 3 -> cap=2 drops both
    t2 = _enumerate_bucket_pairs(keys, ids, cap=2)
    assert len(t2) == 0

    # degenerate bucket: 10^4 identical-signature docs complete fast
    # with a logged drop instead of enumerating ~5*10^7 pairs
    big_k = np.zeros(10_000, dtype=np.int64)
    big_i = np.arange(10_000, dtype=np.int64)
    t3 = _enumerate_bucket_pairs(big_k, big_i, cap=1024)
    assert len(t3) == 0


def test_minhash_degenerate_bucket_bounded(ray_session, caplog):
    """10^3 byte-identical docs: with the bucket cap the LSH stage
    completes without enumerating the ~500k-pair clique, and the drop
    is logged (no silent caps)."""
    import logging

    from osm2geojson_ray.text.dedup import minhash_lsh_pairs

    n = 1000
    docs = ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(["the same boilerplate text repeated here"] * n),
        })
    ).repartition(4)
    with caplog.at_level(logging.WARNING, logger="osm2geojson_ray.text.dedup"):
        out = minhash_lsh_pairs(docs, max_bucket_size=100).take_all()
    assert out == []  # every bucket was the oversized clique
    # uncapped still works on a small clique (completeness preserved)
    small = ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(["identical words for everyone present"] * 4),
        })
    )
    pairs = minhash_lsh_pairs(small, max_bucket_size=0).take_all()
    got = sorted((r["a_id"], r["b_id"]) for r in pairs)
    assert got == [(a, b) for a in range(4) for b in range(a + 1, 4)]


def test_tfidf_hot_term_salt_spreads_and_matches(ray_session):
    """A term present in EVERY doc (stopword shape): the salted route
    (term, doc % S) spreads its rows across S partitions instead of
    one, and the scores still match the unsalted broadcast mode."""
    from osm2geojson_ray.relational import _crc32_vectorized
    from osm2geojson_ray.text.analysis import tfidf_topk

    S, P, n = 8, 16, 400
    crc = int(_crc32_vectorized(pa.array(["common"]))[0])
    parts = {(crc * S + d % S) % P for d in range(n)}
    assert parts == {(crc * S + s) % P for s in range(S)}  # all S salt cells
    assert len(parts) == S  # crc*S is a multiple of S: no mod-P collision

    docs = ray.data.from_arrow(
        pa.table({
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array([f"common w{i % 37} w{i % 11}" for i in range(n)]),
        })
    ).repartition(4)
    a = tfidf_topk(docs, k=2).to_pandas().sort_values(
        ["doc_id", "score_1e6", "term"]).reset_index(drop=True)
    b = tfidf_topk(docs, k=2, df_mode="broadcast").to_pandas().sort_values(
        ["doc_id", "score_1e6", "term"]).reset_index(drop=True)
    assert a.equals(b) and len(a) == 2 * n


def test_content_hash_binary_matches_scalar(ray_session):
    """_content_hash_col on a BINARY column: the vectorized buffer-level
    FNV63 equals the scalar reference on raw bytes, including nulls and
    the empty payload; large_binary takes the int64-offset path."""
    from osm2geojson_ray.text.analysis import _hash63
    from osm2geojson_ray.text.dedup import _content_hash_col

    payloads = [b"", b"abc", bytes(range(256)), None, b"abc"]
    want = [_hash63_bytes(p) for p in payloads]
    for typ in (pa.binary(), pa.large_binary()):
        t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                      "payload": pa.array(payloads, typ)})
        got = _content_hash_col(t, "payload")["content_hash"].to_pylist()
        assert got == want, typ
    # string column stays equal to the scalar text hash
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["hello world", ""], pa.string())})
    got = _content_hash_col(t, "text")["content_hash"].to_pylist()
    assert got == [_hash63("hello world"), _hash63("")]


def _hash63_bytes(b):
    h = 0xCBF29CE484222325
    for x in (b or b""):
        h ^= x
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h & 0x7FFFFFFFFFFFFFFF


def test_m_image_dedup_and_phash_clusters_vs_slow_oracle(ray_session):
    """The two multimodal curation queries against exact single-process
    oracles over the same deterministic corpus: byte-content dedup
    groups == pandas groupby(bytes); phash clusters (band-LSH Hamming-0
    pairs -> connected components) == groupby(phash) with size >= 2."""
    import pandas as pd

    from osm2geojson_ray.queries import m_image_dedup, m_phash_clusters

    corpus = synth_image_table(2000, partition_rows=500).to_pandas()
    corpus["image_idx"] = corpus["image_id"].str.slice(4).astype("int64")

    got = (
        m_image_dedup("unused").to_pandas()
        .sort_values(["image_idx"]).reset_index(drop=True)[["image_idx", "n_dups"]]
    )
    g = corpus.groupby("bytes", sort=False)
    want = (
        pd.DataFrame({"image_idx": g["image_idx"].min(), "n_dups": g.size()})
        .sort_values(["image_idx"]).reset_index(drop=True)
    )
    assert got["image_idx"].tolist() == want["image_idx"].tolist()
    assert got["n_dups"].tolist() == want["n_dups"].tolist()

    got_c = (
        m_phash_clusters("unused").to_pandas()
        .sort_values(["rep_idx"]).reset_index(drop=True)[["rep_idx", "csize"]]
    )
    gp = corpus.groupby("phash", sort=False)
    want_c = (
        pd.DataFrame({"rep_idx": gp["image_idx"].min(), "csize": gp.size()})
        .query("csize >= 2")
        .sort_values(["rep_idx"]).reset_index(drop=True)
    )
    assert got_c["rep_idx"].tolist() == want_c["rep_idx"].tolist()
    assert got_c["csize"].tolist() == want_c["csize"].tolist()


def test_fingerprint_short_doc_vectorized_path(ray_session):
    """The vectorized short-doc join (binary_join over contiguous
    token runs) matches the scalar FNV on every boundary shape:
    empty, null, 1 token, 2 tokens, padded whitespace, and the 3-gram
    min path."""
    from osm2geojson_ray.text.analysis import TextAnalyzer, _hash63

    t = pa.table({"text": pa.array(["", "one", "two words", "a b c d",
                                    "  pad  ", None])})
    got = TextAnalyzer()(t)["fingerprint"].to_pylist()
    assert got == [
        _hash63(""),
        _hash63("one"),
        _hash63("two words"),
        min(_hash63("a b c"), _hash63("b c d")),
        _hash63("pad"),
        _hash63(""),
    ]


def test_grams_vectorized_matches_scalar_reference(ray_session):
    """Vectorized Grams stage vs the scalar shingle pipeline
    (_TOKEN_RE.findall + _shingles + _hash63 + unique) over an
    adversarial ASCII corpus: tabs/newlines/padding, repeated tokens,
    case folding, 0/1/2-token docs, duplicate shingles."""
    import numpy as np

    from osm2geojson_ray.text.analysis import _hash63
    from osm2geojson_ray.text.dedup import _TOKEN_RE, _shingles, grams_dataset

    texts = [
        "", "  ", "one", "Two\twords", "a b c d e",
        "x X x X x", "tab\tsep\nnewline  multi   space",
        "dup dup dup dup", None, "end s",
    ]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(3)
    got = {r["doc_id"]: list(r["grams"])
           for r in grams_dataset(ds, shingle_k=3).take_all()}
    for i, text in enumerate(texts):
        words = [w.lower() for w in _TOKEN_RE.findall(text or "")]
        sh = _shingles(words, 3)
        want = sorted(np.unique([_hash63(s) for s in sh]).tolist()) if sh else []
        assert got[i] == want, (i, text)


def test_ngram_contamination_empty_and_allempty_docs(ray_session):
    from osm2geojson_ray.text.dedup import ngram_contamination

    empty = ray.data.from_arrow(
        pa.schema([("doc_id", pa.int64()), ("text", pa.string())]).empty_table()
    )
    assert ngram_contamination(empty, num_partitions=4).take_all() == []

    blank = ray.data.from_arrow(
        pa.Table.from_pydict({"doc_id": [1, 2], "text": ["", "   "]})
    )
    assert ngram_contamination(blank, num_partitions=4).take_all() == []


def test_redact_documents_counts_and_parity(ray_session):
    import pyarrow as pa
    import ray.data

    from osm2geojson_ray.text.analysis import redact_documents

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": [
            "spark is fast but spark is slow",
            "nothing to see here",
            "",
            "sparkly slowly spark",  # \b: sparkly/slowly must NOT match
        ],
    })
    out = (
        redact_documents(
            ray.data.from_arrow(docs), pattern=r"\b(spark|slow)\b",
            replacement="[X]",
        )
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["n_hits"].tolist() == [3, 0, 0, 1]
    assert out["redacted"].tolist() == [
        "[X] is fast but [X] is [X]",
        "nothing to see here",
        "",
        "sparkly slowly [X]",
    ]
    assert out["n_hits"].dtype == "int64"


def test_char_diversity_exact_and_guards(ray_session):
    import numpy as np
    import pyarrow as pa
    import pytest
    import ray.data

    from osm2geojson_ray.text.analysis import char_diversity

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": ["aab", "", "zzzz", "ab ba"],
    })
    out = (
        char_diversity(ray.data.from_arrow(docs))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert out["n_chars"].tolist() == [3, 0, 4, 5]
    assert out["n_distinct_chars"].tolist() == [2, 0, 1, 3]
    # aab: 2^2+1 = 5; zzzz: 16; "ab ba": a=2,b=2,space=1 -> 4+4+1
    assert out["collision_sum"].tolist() == [5, 0, 16, 9]

    # scalar brute-force parity on random ASCII
    rng = np.random.default_rng(3)
    texts = [
        "".join(chr(c) for c in rng.integers(32, 127, rng.integers(0, 50)))
        for _ in range(64)
    ]
    t = pa.table({"doc_id": pa.array(range(64), pa.int64()), "text": texts})
    got = (
        char_diversity(ray.data.from_arrow(t))
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    from collections import Counter
    for i, txt in enumerate(texts):
        c = Counter(txt)
        assert got["n_chars"][i] == len(txt)
        assert got["n_distinct_chars"][i] == len(c)
        assert got["collision_sum"][i] == sum(v * v for v in c.values())

    # non-ASCII raises loudly instead of counting bytes as chars
    bad = pa.table({"doc_id": pa.array([0], pa.int64()), "text": ["héllo"]})
    with pytest.raises(Exception, match="multi-byte"):
        char_diversity(ray.data.from_arrow(bad)).materialize()


def test_bm25_topk_scalar_parity(ray_session):
    import math
    from collections import Counter

    import pyarrow as pa
    import ray.data

    from osm2geojson_ray.text.analysis import bm25_topk

    texts = [
        "apple banana apple cherry",
        "banana banana date",
        "apple date date date cherry",
        "",
        "cherry",
    ]
    docs = pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": texts})
    got = (
        bm25_topk(ray.data.from_arrow(docs), k=2)
        .to_pandas().sort_values(["doc_id", "score_1e6", "term"],
                                 ascending=[True, False, True])
        .reset_index(drop=True)
    )

    # scalar BM25 oracle
    k1, b = 1.2, 0.75
    toks = [t.split() for t in texts]
    tfs = [Counter(t) for t in toks]
    n_docs = float(len(texts))
    df = Counter(w for c in tfs for w in c)
    avgdl = sum(len(t) for t in toks) / n_docs
    want = []
    for i, c in enumerate(tfs):
        scored = []
        for w, tf in c.items():
            idf = math.log(1.0 + (n_docs - df[w] + 0.5) / (df[w] + 0.5))
            s = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(toks[i]) / avgdl))
            scored.append((w, math.floor(abs(s * 1e6) + 0.5) * (1 if s >= 0 else -1)))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for w, s in scored[:2]:
            want.append((i, w, s))
    assert list(zip(got["doc_id"], got["term"], got["score_1e6"])) == want


def test_bm25_topk_empty_corpus(ray_session):
    import pyarrow as pa
    import ray.data

    from osm2geojson_ray.text.analysis import bm25_topk

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
    out = bm25_topk(ray.data.from_arrow(empty)).to_pandas()
    # no crash, zero rows (Ray's zero-row from_arrow block drops the
    # pandas column projection — count is the stable signal here)
    assert len(out) == 0


def test_bigram_counts_adjacency_and_edges():
    """_bigram_counts: multi-space runs collapse (the survivors are
    adjacent), single-token and empty docs emit nothing, bigrams never
    cross documents, repeats accumulate."""
    import pyarrow as pa

    from osm2geojson_ray.text.analysis import _bigram_counts

    t = pa.table({"text": pa.array([
        "a  b b",          # a-b (multi-space), b-b
        "solo",            # no bigram
        "",                # empty
        "x y",             # x-y; must NOT pair with next doc's tokens
        "y x",
    ], pa.string())})
    out = _bigram_counts(t, text_col="text").to_pandas()
    got = {(r.w1, r.w2): int(r.n) for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("b", "b"): 1, ("x", "y"): 1, ("y", "x"): 1}
    empty = _bigram_counts(
        pa.table({"text": pa.array([], pa.string())}), text_col="text"
    )
    assert len(empty) == 0
    assert empty.schema.names == ["w1", "w2", "n"]


def test_editdist1_pairs_exact_and_capped(ray_session):
    """Deletion-variant blocking finds exactly the distance-1 pairs
    (substitution, insertion/deletion), across blocks, with dupes;
    min_len filters; the bucket cap drops degenerate keys."""
    import pyarrow as pa

    import ray
    from osm2geojson_ray.text.dedup import _is_edit1, editdist1_pairs

    words = ["cat", "cut", "cart", "dog", "dot", "dots", "cat", "x", "y"]
    ds = ray.data.from_arrow(
        pa.table({"term": pa.array(words, pa.string())})).repartition(3)
    got = (editdist1_pairs(ds, min_len=2).to_pandas()
           .sort_values(["term_a", "term_b"]).reset_index(drop=True))
    vocab = sorted({w for w in words if len(w) >= 2})
    want = sorted((a, b) for i, a in enumerate(vocab)
                  for b in vocab[i + 1:] if _is_edit1(a, b))
    assert list(map(tuple, got.itertuples(index=False))) == want

    # scalar reference oracle for the verifier itself
    assert _is_edit1("abc", "abd") and _is_edit1("abc", "abcd")
    assert _is_edit1("abc", "bc") and not _is_edit1("abc", "abc")
    assert not _is_edit1("abc", "abcde") and not _is_edit1("ab", "ba ")

    # degenerate blocking key: many length-2 terms share their
    # single-deletion variants; a tiny cap drops those buckets
    many = [f"a{c}" for c in "bcdefghij"]
    ds2 = ray.data.from_arrow(pa.table({"term": pa.array(many)}))
    capped = editdist1_pairs(ds2, min_len=2, bucket_cap=2).to_pandas()
    full = editdist1_pairs(ds2, min_len=2).to_pandas()
    assert len(full) == len(many) * (len(many) - 1) // 2  # all dist-1
    assert len(capped) < len(full)


def test_inverted_index_postings_and_cap(ray_session):
    """df/n_occ exact, postings ascending and capped, empty terms
    dropped, partition-count independent."""
    import pyarrow as pa

    import ray
    from osm2geojson_ray.text.analysis import inverted_index

    docs = pa.table({
        "doc_id": pa.array([3, 1, 2, 4], pa.int64()),
        "text": pa.array(["b a a", "a  c", "c b\ta", "   "], pa.string()),
    })
    for nparts in (1, 3):
        out = (inverted_index(
            ray.data.from_arrow(docs).repartition(nparts), max_postings=2)
            .to_pandas().sort_values("term").reset_index(drop=True))
        assert out["term"].tolist() == ["a", "b", "c"]
        assert out["df"].tolist() == [3, 2, 2]
        assert out["n_occ"].tolist() == [4, 2, 2]
        # cap=2: term 'a' appears in docs 1,2,3 -> keep 1,2
        assert out["postings"].tolist() == ["1,2", "2,3", "1,2"]


def test_image_pyramid_pixels_scalar_parity(ray_session):
    """Each pyramid level's decoded pixels equal a scalar
    nearest-neighbor resize of the PREVIOUS level's decoded pixels
    (with the lossy re-quantization for rgb5 rows) — the chained
    actor-pool path introduces nothing beyond the per-level kernel."""
    import numpy as np

    from osm2geojson_ray.images.codec import decode_image
    from osm2geojson_ray.images.synth import synth_image_table
    from osm2geojson_ray.images.transform import image_pyramid

    ds = synth_image_table(40, partition_rows=10)
    levels = image_pyramid(ds, [(12, 8), (6, 4)])

    def collect(d):
        df = d.to_pandas().set_index("image_id")
        return df

    base = collect(ds.materialize())
    prev = {iid: decode_image(b) for iid, b in base["bytes"].items()}
    fmts = base["fmt"].to_dict()

    for li, (w, h), lvl in levels:
        cur = collect(lvl)
        assert len(cur) == 40
        for iid, row in cur.iterrows():
            px = decode_image(row["bytes"])
            src = prev[iid]
            sh, sw = src.shape[0], src.shape[1]
            ys = (np.arange(h) * sh // h).astype(np.int64)
            xs = (np.arange(w) * sw // w).astype(np.int64)
            want = src[ys][:, xs]
            if fmts[iid] != "rgb8":
                want = np.clip((want.astype(np.int16) + 4) // 8 * 8,
                               0, 255).astype(np.uint8)
            assert np.array_equal(px, want), iid
            prev[iid] = px


def test_tile_mosaic_pixels_scalar_assembly(ray_session):
    """Mosaic pixels equal a scalar paste of the cell's <= grid^2
    smallest-id thumbnails row-major onto a black canvas; unused
    slots stay black; partition-count independent."""
    import numpy as np
    import pyarrow as pa

    import ray
    from osm2geojson_ray.images.codec import decode_image, encode_image
    from osm2geojson_ray.images.transform import tile_mosaic

    rng = np.random.default_rng(37)
    n, w, h = 23, 6, 4
    pix = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    cells = rng.integers(0, 3, n).astype(np.int64)
    ids = np.arange(n, dtype=np.int64)
    t = pa.table({
        "cell_id": pa.array(cells),
        "image_idx": pa.array(ids),
        "bytes": pa.array([encode_image(p, "rgb8") for p in pix],
                          pa.binary()),
    })
    for nparts in (1, 4):
        out = (tile_mosaic(ray.data.from_arrow(t).repartition(nparts),
                           grid=2)
               .to_pandas().set_index("cell_id").sort_index())
        for cell in np.unique(cells):
            members = ids[cells == cell][:4]
            canvas = np.zeros((h * 2, w * 2, 3), np.uint8)
            for pos, mid in enumerate(members):
                r, c = divmod(pos, 2)
                canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = pix[mid]
            row = out.loc[int(cell)]
            assert row["n_used"] == len(members)
            assert np.array_equal(decode_image(row["bytes"]), canvas)


def test_augment_images_flip_crop_scalar(ray_session):
    """Augment pixels equal the scalar center crop (+ flip for
    hash-odd rows); flip=always twice restores the crop; oversized
    crop raises."""
    import numpy as np
    import pytest as _pytest

    from osm2geojson_ray.images.codec import decode_image
    from osm2geojson_ray.images.synth import splitmix64, synth_image_table
    from osm2geojson_ray.images.transform import augment_images

    ds = synth_image_table(30, partition_rows=10)
    base = ds.to_pandas().set_index("image_id")
    out = augment_images(ds, crop=(16, 12), flip="hash").to_pandas() \
        .set_index("image_id")
    for iid, row in out.iterrows():
        src = decode_image(base.loc[iid, "bytes"])
        h, w = src.shape[0], src.shape[1]
        want = src[(h - 12) // 2:(h - 12) // 2 + 12,
                   (w - 16) // 2:(w - 16) // 2 + 16]
        idx = np.uint64(int(iid[4:]))
        if splitmix64(np.array([idx]))[0] & np.uint64(1):
            want = want[:, ::-1]
            assert bool(row["flipped"])
        else:
            assert not bool(row["flipped"])
        assert np.array_equal(decode_image(row["bytes"]), want)

    once = augment_images(ds, crop=(16, 12), flip="always")
    twice = augment_images(once, crop=(16, 12), flip="always").to_pandas() \
        .set_index("image_id")
    plain = augment_images(ds, crop=(16, 12), flip="never").to_pandas() \
        .set_index("image_id")
    for iid in plain.index:
        assert twice.loc[iid, "bytes"] == plain.loc[iid, "bytes"]

    with _pytest.raises(Exception):
        augment_images(ds, crop=(99, 99)).to_pandas()


def test_char_window_dup_matches_bruteforce(ray_session):
    """Window enumeration + shared counts vs a scalar set-based oracle;
    short/empty docs emit no row; non-ASCII raises loudly."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest
    import ray

    from osm2geojson_ray.text.dedup import char_window_dup

    W = 12
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "dogs and cats living together in peace",
        "xx the quick brown fox jumps over the lazy dog yy",
        "the quick brown fox jumps over the lazy dog",  # exact dup
        "tiny",
        "",
    ]
    ids = np.arange(100, 100 + len(texts), dtype=np.int64)

    def brute():
        wins = {i: {t[j:j + W] for j in range(max(len(t) - W + 1, 0))}
                for i, t in zip(ids.tolist(), texts)}
        from collections import Counter
        # distinct docs per window (wins values are sets)
        cnt = Counter()
        for s in wins.values():
            for w in s:
                cnt[w] += 1
        out = {}
        for i, s in wins.items():
            if not s:
                continue
            sh = sum(1 for w in s if cnt[w] >= 2)
            out[i] = (len(s), sh, sh * 1_000_000 // len(s))
        return out

    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts}))
    for parts in (1, 4):
        got = char_window_dup(ds.repartition(3), window=W,
                              num_partitions=parts).to_pandas()
        gd = {r.doc_id: (r.n_grams, r.n_shared, r.shared_ppm)
              for r in got.itertuples()}
        assert gd == brute(), parts

    bad = ray.data.from_arrow(pa.table(
        {"doc_id": np.array([1], np.int64), "text": ["café " * 10]}))
    with _pytest.raises(Exception, match="ASCII"):
        char_window_dup(bad, window=W).to_pandas()


def test_synth_size_ladder_deterministic(ray_session):
    """size_ladder assigns each partition its ladder size as a pure
    function of the start index; regenerating any single partition
    reproduces identical rows (shard resumability)."""
    import pyarrow as pa

    from osm2geojson_ray.images.synth import synth_image_batch, synth_image_table

    ladder = [(24, 16), (16, 24), (20, 20), (32, 12)]
    tbl = (
        synth_image_table(40, partition_rows=10, size_ladder=ladder)
        .to_pandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    for p in range(4):
        part = tbl.iloc[p * 10:(p + 1) * 10]
        w, h = ladder[p % 4]
        assert set(part.w) == {w} and set(part.h) == {h}
        regen = synth_image_batch(p * 10, 10, size=(w, h)).to_pandas()
        assert part.reset_index(drop=True).equals(regen)


def test_aspect_bucket_assignment_exact():
    """The integer nearest-ratio rule maps each ladder size to the
    mathematically nearest bucket (checked against exact fractions),
    ties to the smaller bucket id."""
    from fractions import Fraction

    import numpy as np

    from osm2geojson_ray.queries import (
        _ASPECT_BUCKETS,
        _ASPECT_LADDER,
        _ASPECT_SCALE,
    )

    bw = np.array([b[0] for b in _ASPECT_BUCKETS])
    bh = np.array([b[1] for b in _ASPECT_BUCKETS])
    sc = np.array(_ASPECT_SCALE)
    for w, h in _ASPECT_LADDER + [(9, 16), (21, 9), (10, 10)]:
        score = np.abs(w * bh - bw * h) * sc
        got = int(np.argmin(score))
        exact = [abs(Fraction(w, h) - Fraction(a, b)) for a, b in _ASPECT_BUCKETS]
        want = exact.index(min(exact))
        assert got == want, (w, h, got, want)


def test_winnowing_fingerprints_properties(ray_session):
    """Scalar per-doc recompute matches; the winnowing GUARANTEE holds
    (two docs sharing a run of window+gram-1 = 6 words share at least
    one fingerprint); short-doc and few-gram fallbacks covered;
    partition-count independent."""
    import numpy as np
    import pyarrow as pa

    import ray
    from osm2geojson_ray.text.analysis import _hash63, winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 words
    texts = [
        "one two three " + shared + " four five",
        shared + " completely different tail here now",
        "tiny doc",                       # < 3 tokens: joined-text hash
        "just four little words",         # 2 grams < window: global min
        "",                               # empty
    ]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts, pa.string())})

    def scalar_fps(text, gram=3, window=4):
        toks = text.lower().split()
        if len(toks) < gram:
            return {_hash63(" ".join(toks))}
        hs = [_hash63(" ".join(toks[i:i + gram]))
              for i in range(len(toks) - gram + 1)]
        if len(hs) < window:
            return {min(hs)}
        return {min(hs[i:i + window]) for i in range(len(hs) - window + 1)}

    for nparts in (1, 3):
        got = winnowing_fingerprints(
            ray.data.from_arrow(t).repartition(nparts)).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        for i, text in enumerate(texts):
            want = scalar_fps(text)
            assert int(got.n_fps[i]) == len(want)
            assert int(got.min_fp[i]) == min(want)
            assert int(got.xor_fp[i]) == int(np.bitwise_xor.reduce(
                np.array(sorted(want), dtype=np.int64)))
    # guarantee: docs 0 and 1 share >= 1 fingerprint
    assert scalar_fps(texts[0]) & scalar_fps(texts[1])


def test_containment_pairs_subset_duplication(ray_session):
    """The asymmetric case containment exists for: a long document
    embedding a short one verbatim fires containment 1.0 while its
    Jaccard is far below the dedup threshold; unrelated docs never
    pair; partition-count independent."""
    import pyarrow as pa

    import ray
    from osm2geojson_ray.text.dedup import containment_pairs, jaccard_pairs

    quote = "the quick brown fox jumps over the lazy dog tonight"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(40))
    texts = [
        quote,                             # 0: the short source
        filler + " " + quote,              # 1: long doc quoting it
        "completely unrelated words here never matching anything at all",
    ]
    t = pa.table({"doc_id": pa.array(range(3), pa.int64()),
                  "text": pa.array(texts, pa.string())})

    for nparts in (1, 3):
        ds = ray.data.from_arrow(t).repartition(nparts)
        got = containment_pairs(ds, threshold_num=9, threshold_den=10) \
            .to_pandas()
        pairs = set(map(tuple, got[["a_id", "b_id"]].itertuples(index=False)))
        assert pairs == {(0, 1)}
        row = got.iloc[0]
        assert row.inter_sz == row.min_sz  # fully contained
        jac = jaccard_pairs(ds, jaccard_threshold=0.8).to_pandas()
        assert len(jac) == 0  # Jaccard misses exactly this case


def test_align_corruption_collision_free():
    """The m_align_check harness invariant: a +500/1000 phase offset
    changes the rendered pixels at EVERY phase, on both codecs — so
    aligned=False is exactly the mispaired set, never a quantization
    accident.  Also pins _pixels_batch_phase == _pixels_batch on the
    index-keyed path (the refactor that split them)."""
    import numpy as np

    from osm2geojson_ray.images.synth import (
        _LOSSY_LUT, _pixels_batch, _pixels_batch_phase, splitmix64,
    )

    ph = np.arange(1000, dtype=np.uint64)
    a = _pixels_batch_phase(ph, 24, 16)
    b = _pixels_batch_phase((ph + 500) % 1000, 24, 16)
    flat_a, flat_b = a.reshape(1000, -1), b.reshape(1000, -1)
    assert not (flat_a == flat_b).all(axis=1).any()
    la, lb = _LOSSY_LUT[flat_a], _LOSSY_LUT[flat_b]
    assert not (la == lb).all(axis=1).any()
    # the quantized gap stays wide: no phase is one flipped byte away
    assert int((la != lb).sum(axis=1).min()) > 500

    idx = np.arange(64, dtype=np.uint64) * 31 + 7
    via_idx = _pixels_batch(idx, 24, 16)
    via_phase = _pixels_batch_phase(splitmix64(idx) % np.uint64(1000), 24, 16)
    assert (via_idx == via_phase).all()


def test_align_captions_detects_mispairs(ray_session):
    """End-to-end alignment stage: pristine pairs align, a swapped
    caption (phase from a DIFFERENT image) does not; lossy rows align
    through the quantization LUT."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import ray
    from osm2geojson_ray.images.synth import synth_image_batch
    from osm2geojson_ray.images.transform import align_captions

    t = synth_image_batch(0, 64)
    # swap captions of rows 3 and 17 (different phases by construction)
    cap = t["caption"].to_pylist()
    assert cap[3] != cap[17]
    cap[3], cap[17] = cap[17], cap[3]
    t = t.set_column(t.schema.get_field_index("caption"),
                     "caption", pa.array(cap, pa.string()))
    out = align_captions(ray.data.from_arrow(t)).to_pandas() \
        .sort_values("image_idx").reset_index(drop=True)
    assert len(out) == 64
    misaligned = set(out.loc[~out["aligned"], "image_idx"])
    assert misaligned == {3, 17}
    # lossy rows (idx % 4 == 0) among the aligned set really passed
    # through the LUT comparison path
    assert bool(out.loc[(out.image_idx % 4 == 0)
                        & ~out.image_idx.isin([3, 17]), "aligned"].all())
