"""Image transform stages: resize, feature extraction, frame sampling.

Actor-pool `map_batches` stages over the opaque `bytes` column of the
`input_hint` image schema.  The Ray-side plumbing (schemas, batch
shapes, actor lifecycles, output layout) is REAL and tested; pixel
operations run on the self-contained rgb8/rgb5 container
(`images/codec.py`).  External formats (JPEG/WebP/video) raise
NotImplementedError at the decode boundary exactly like
`codec.decode_image` — a production decoder slots in without touching
any pipeline code.

Design notes for 10^12-row scale (SURVEY §7.8):
- every stage is a callable CLASS: per-actor state (target sizes,
  projection matrices) built once in ``__init__``;
- batches stay Arrow; binary columns are rebuilt with uniform offsets
  from one contiguous buffer (no per-row Python bytes juggling when
  sizes are uniform);
- outputs carry the input's ``image_id`` so stages compose with the
  PIP/kNN joins without a re-key.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa

from .codec import decode_image, encode_image

FEATURE_DIM = 64


class ResizeImages:
    """Nearest-neighbor resize to a fixed (w, h); re-encodes into the
    same container format the row arrived in (rgb8/rgb5)."""

    def __init__(self, size: Tuple[int, int] = (16, 16)):
        self.w, self.h = size

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .codec import batch_pixel_view

        n = len(batch)
        view = batch_pixel_view(batch["bytes"])
        if view is not None:
            # uniform-size fast path: gather-resize the whole batch as
            # one (n, h, w, 3) view and build the output binary column
            # from a single buffer (byte-identical to per-row encode)
            px, src_w, src_h = view
            ys = (np.arange(self.h) * src_h // self.h).astype(np.int64)
            xs = (np.arange(self.w) * src_w // self.w).astype(np.int64)
            small = px[:, ys][:, :, xs]  # (n, th, tw, 3)
            row_len = 8 + self.w * self.h * 3
            buf = np.empty((n, row_len), dtype=np.uint8)
            buf[:, :8] = np.frombuffer(
                b"R8" + struct.pack("<HHBB", self.w, self.h, 0, 0), dtype=np.uint8
            )
            out_px = buf[:, 8:].reshape(n, self.h, self.w, 3)
            out_px[:] = small
            lossy = np.asarray(
                pa.compute.not_equal(batch["fmt"], "rgb8").to_numpy(
                    zero_copy_only=False
                )
            )
            if lossy.any():
                q = buf[lossy, 8:].astype(np.int16)
                buf[lossy, 8:] = np.clip((q + 4) // 8 * 8, 0, 255).astype(np.uint8)
            offsets = np.arange(n + 1, dtype=np.int32) * row_len
            blob_arr = pa.Array.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(offsets), pa.py_buffer(buf.reshape(-1))],
            )
        else:
            out_blobs = []
            fmts = batch["fmt"].to_pylist()
            for i, buf_b in enumerate(batch["bytes"].to_pylist()):
                px = decode_image(buf_b)  # raises NotImplementedError for
                # external formats — the documented stub boundary
                src_h, src_w = px.shape[0], px.shape[1]
                ys = (np.arange(self.h) * src_h // self.h).astype(np.int64)
                xs = (np.arange(self.w) * src_w // self.w).astype(np.int64)
                small = px[ys][:, xs]
                out_blobs.append(encode_image(small, fmts[i]))
            blob_arr = pa.array(out_blobs, pa.binary())
        return pa.Table.from_arrays(
            [
                batch["image_id"],
                blob_arr,
                pa.array(np.full(n, self.w, dtype=np.int32)),
                pa.array(np.full(n, self.h, dtype=np.int32)),
                batch["fmt"],
                batch["caption"],
                batch["phash"],
            ],
            names=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
        )


class ExtractFeatures:
    """bytes -> fixed-dim float32 embedding: channel-mean/std moments +
    an 8x8 luminance block grid, projected to FEATURE_DIM with a
    deterministic splitmix-seeded random matrix (built once per actor)."""

    def __init__(self, dim: int = FEATURE_DIM):
        from .synth import splitmix64

        self.dim = dim
        raw_dim = 6 + 64  # 3 means + 3 stds + 8x8 gray grid
        seeds = splitmix64(np.arange(raw_dim * dim, dtype=np.uint64) + np.uint64(99))
        self.proj = (
            (seeds.astype(np.float64) / float(1 << 64) - 0.5).reshape(raw_dim, dim)
        ).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .codec import batch_pixel_view
        from .phash import _block_mean_8x8, _gray

        n = len(batch)
        view = batch_pixel_view(batch["bytes"])
        if view is not None and view[1] % 8 == 0 and view[2] % 8 == 0:
            # uniform-size fast path: moments + 8x8 grid for the whole
            # batch in a handful of vectorized passes
            px, w, h = view
            pf = px.astype(np.float32)
            means = pf.mean(axis=(1, 2)) / 255.0  # (n, 3)
            stds = pf.std(axis=(1, 2)) / 255.0
            g = _gray(px)  # (n, h, w) float64
            grid = (
                g.reshape(n, 8, h // 8, 8, w // 8).mean(axis=(2, 4)).reshape(n, 64)
                / 255.0
            )
            raw = np.concatenate([means, stds, grid], axis=1).astype(np.float32)
            feats = raw @ self.proj
        else:
            feats = np.empty((n, self.dim), dtype=np.float32)
            for i, buf in enumerate(batch["bytes"].to_pylist()):
                px = decode_image(buf).astype(np.float32)
                raw = np.concatenate(
                    [
                        px.mean(axis=(0, 1)) / 255.0,
                        px.std(axis=(0, 1)) / 255.0,
                        _block_mean_8x8(_gray(px.astype(np.uint8))).ravel() / 255.0,
                    ]
                ).astype(np.float32)
                feats[i] = raw @ self.proj
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.ravel(), pa.float32()), self.dim
        )
        return pa.Table.from_arrays(
            [batch["image_id"], emb], names=["image_id", "embedding"]
        )


class SampleFrames:
    """Video-shaped frame sampling over a concatenated-frames container:
    rows whose ``bytes`` hold F same-size frames back to back (w, h, F
    from columns) emit every k-th frame as its own image row.  For
    single-frame rows this is the identity explode.

    Fully vectorized: the binary column's offsets/data buffers are read
    directly, selected-frame byte ranges are gathered with one fancy
    index, and the per-frame w/h come from header bytes decoded as
    little-endian u16 arithmetic — no per-row Python in the explode."""

    def __init__(self, every_k: int = 2):
        self.k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(batch)
        out_schema = pa.schema(
            [
                ("image_id", pa.string()),
                ("frame", pa.int64()),
                ("bytes", pa.binary()),
                ("w", pa.int32()),
                ("h", pa.int32()),
                ("fmt", pa.string()),
            ]
        )
        if n == 0:
            return out_schema.empty_table()
        blob = batch["bytes"].combine_chunks().cast(pa.large_binary())
        offs = np.frombuffer(blob.buffers()[1], dtype=np.int64,
                             count=n + 1 + blob.offset)[blob.offset:]
        data = np.frombuffer(blob.buffers()[2], dtype=np.uint8)
        row_len = offs[1:] - offs[:-1]
        if "n_frames" in batch.column_names:
            nf = pc.fill_null(batch["n_frames"], 1).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            nf = np.maximum(nf, 1)
        else:
            nf = np.ones(n, dtype=np.int64)
        flen = row_len // nf
        counts = (nf + self.k - 1) // self.k  # frames kept per row
        total_frames = int(counts.sum())
        row_of = np.repeat(np.arange(n, dtype=np.int64), counts)
        # frame index within each row: 0, k, 2k, ... per row run
        run_start = np.repeat(np.cumsum(counts) - counts, counts)
        frame_idx = (np.arange(total_frames, dtype=np.int64) - run_start) * self.k
        f_start = offs[:-1][row_of] + frame_idx * flen[row_of]
        f_len = flen[row_of]
        # one gather for all selected frame bytes
        out_total = int(f_len.sum())
        b_run = np.repeat(np.cumsum(f_len) - f_len, f_len)
        positions = np.repeat(f_start, f_len) + (
            np.arange(out_total, dtype=np.int64) - b_run
        )
        out_data = data[positions]
        out_offs = np.concatenate(([0], np.cumsum(f_len))).astype(np.int64)
        blob_arr = pa.Array.from_buffers(
            pa.large_binary(), total_frames,
            [None, pa.py_buffer(out_offs), pa.py_buffer(out_data)],
        ).cast(pa.binary())
        # header: magic(2) + <HHBB: w/h as little-endian u16 at +2/+4
        w16 = (data[f_start + 2].astype(np.int32)
               | (data[f_start + 3].astype(np.int32) << 8))
        h16 = (data[f_start + 4].astype(np.int32)
               | (data[f_start + 5].astype(np.int32) << 8))
        take = pa.array(row_of)
        return pa.Table.from_arrays(
            [
                batch["image_id"].take(take),
                pa.array(frame_idx),
                blob_arr,
                pa.array(w16, pa.int32()),
                pa.array(h16, pa.int32()),
                batch["fmt"].take(take),
            ],
            schema=out_schema,
        )


class VerifyPixels:
    """Decoded-pixel verification stage — the input_hint's per-row
    invariant ("decoded-pixel allclose, PSNR >= 40 dB for lossy")
    expressed as a distributed operator: decode every image, regenerate
    the REFERENCE pixels from the image index (the synthetic
    generator plays the role of the ground-truth original; a real
    pipeline would read them from the source store), and emit
    pure-integer evidence per row:

    - ``sse``: exact integer sum of squared pixel errors,
    - ``sse_zero``: lossless rows must round-trip bit-exact,
    - ``pass_40db``: PSNR >= 40 dB as the integer inequality
      ``sse * 10^4 <= 255^2 * npx`` (10*log10(255^2*npx/sse) >= 40).

    Uniform-size batches verify on one zero-copy (n, h, w, 3) view;
    ragged batches fall back to per-row decode."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .codec import batch_pixel_view
        from .synth import _pixels_batch, _pixels_for

        n = len(batch)
        idx = (
            pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        lossy = pc.equal(batch["fmt"], "rgb5").to_numpy(zero_copy_only=False)
        view = batch_pixel_view(batch["bytes"])
        if view is not None:
            px, w, h = view
            ref = _pixels_batch(idx.astype(np.uint64), w, h)
            diff = px.astype(np.int32) - ref.astype(np.int32)
            sse = np.square(diff, dtype=np.int64).reshape(n, -1).sum(axis=1)
            npx = np.full(n, w * h * 3, dtype=np.int64)
        else:
            sse = np.empty(n, dtype=np.int64)
            npx = np.empty(n, dtype=np.int64)
            for i, row in enumerate(batch.select(["bytes"]).to_pylist()):
                pxr = decode_image(row["bytes"])
                hh, ww = pxr.shape[0], pxr.shape[1]
                refr = _pixels_for(int(idx[i]), ww, hh)
                d = pxr.astype(np.int32) - refr.astype(np.int32)
                sse[i] = int(np.square(d, dtype=np.int64).sum())
                npx[i] = ww * hh * 3
        pass40 = sse * 10_000 <= np.int64(65025) * npx
        return pa.Table.from_pydict(
            {
                "image_idx": idx,
                "lossy": lossy,
                "npx": npx,
                "sse": sse,
                "sse_zero": sse == 0,
                "pass_40db": pass40,
            },
            schema=pa.schema(
                [("image_idx", pa.int64()), ("lossy", pa.bool_()),
                 ("npx", pa.int64()), ("sse", pa.int64()),
                 ("sse_zero", pa.bool_()), ("pass_40db", pa.bool_())]
            ),
        )


def verify_images(ds, *, concurrency: int = 2,
                  batch_size: Optional[int] = None):
    return ds.map_batches(
        VerifyPixels,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


class AlignCaptionPixels:
    """Cross-modal CONSISTENCY gate — the deterministic stand-in for a
    CLIP-score image<->caption filter (the curation step that drops
    mispaired rows from a crawled image+caption corpus).  Per batch:

    1. parse the caption's structured fields with one vectorized regex
       (no per-row Python),
    2. REGENERATE reference pixels from the caption's phase alone
       (``synth._pixels_batch_phase`` — the caption is treated as the
       description, the generator as the renderer),
    3. decode the actual payload (zero-copy uniform-batch view, per-row
       fallback for ragged batches),
    4. compare exactly — lossy rows through the encoder's quantization
       LUT, so a true pair matches bit-for-bit on BOTH codecs.

    ``aligned`` is FALSE iff the caption does not describe the pixels;
    the +500/1000 phase offset used by the corruption harness is
    collision-free at every phase (pinned by test, min 716 differing
    bytes after quantization)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .codec import batch_pixel_view
        from .synth import _LOSSY_LUT, _pixels_batch_phase

        n = len(batch)
        idx = (
            pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4), pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        ext = pc.extract_regex(
            batch["caption"],
            r"^synthetic scene (?P<scene>\d+) phase (?P<phase>\d+)$",
        )
        cphase = pc.cast(pc.struct_field(ext, "phase"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        lossy = pc.equal(batch["fmt"], "rgb5").to_numpy(zero_copy_only=False)
        view = batch_pixel_view(batch["bytes"])
        if view is not None:
            px, w, h = view
            ref = _pixels_batch_phase(cphase.astype(np.uint64), w, h)
            if lossy.any():
                ref[lossy] = _LOSSY_LUT[ref[lossy]]
            diff = px.astype(np.int32) - ref.astype(np.int32)
            sse = np.square(diff, dtype=np.int64).reshape(n, -1).sum(axis=1)
        else:
            sse = np.empty(n, dtype=np.int64)
            for i, row in enumerate(batch.select(["bytes"]).to_pylist()):
                pxr = decode_image(row["bytes"])
                hh, ww = pxr.shape[0], pxr.shape[1]
                refr = _pixels_batch_phase(
                    np.array([cphase[i]], dtype=np.uint64), ww, hh
                )[0]
                if lossy[i]:
                    refr = _LOSSY_LUT[refr]
                d = pxr.astype(np.int32) - refr.astype(np.int32)
                sse[i] = int(np.square(d, dtype=np.int64).sum())
        return pa.Table.from_pydict(
            {
                "image_idx": idx,
                "caption_phase": cphase,
                "aligned": sse == 0,
            },
            schema=pa.schema(
                [("image_idx", pa.int64()), ("caption_phase", pa.int64()),
                 ("aligned", pa.bool_())]
            ),
        )


def align_captions(ds, *, concurrency: int = 2,
                   batch_size: Optional[int] = None):
    return ds.map_batches(
        AlignCaptionPixels,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def resize_images(ds, *, size: Tuple[int, int] = (16, 16), concurrency: int = 2,
                  batch_size: Optional[int] = None):
    return ds.map_batches(
        ResizeImages,
        fn_constructor_kwargs={"size": size},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def extract_features(ds, *, dim: int = FEATURE_DIM, concurrency: int = 2,
                     batch_size: Optional[int] = None):
    return ds.map_batches(
        ExtractFeatures,
        fn_constructor_kwargs={"dim": dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def sample_frames(ds, *, every_k: int = 2, concurrency: int = 2):
    return ds.map_batches(
        SampleFrames,
        fn_constructor_kwargs={"every_k": every_k},
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def image_pyramid(ds, levels, *, concurrency: int = 2,
                  batch_size: Optional[int] = None):
    """Multi-resolution thumbnail pyramid — the chained actor-pool
    resize every multimodal lake materializes (training thumbnails,
    preview tiles): each level resizes the PREVIOUS level's output, so
    per-level cost shrinks with the image area and the full-resolution
    bytes are read exactly once.

    Each level is materialized before feeding the next (at scale:
    write each level to its own partitioned parquet sink instead — the
    pyramid is a fan-out of sinks, not a single stream).  Returns a
    list of (level_index, (w, h), Dataset)."""
    out = []
    cur = ds
    for li, size in enumerate(levels):
        cur = resize_images(cur, size=size, concurrency=concurrency,
                            batch_size=batch_size).materialize()
        out.append((li, size, cur))
    return out


_MOSAIC_SCHEMA = pa.schema([
    ("cell_id", pa.int64()), ("n_used", pa.int64()),
    ("bytes", pa.binary()), ("w", pa.int64()), ("h", pa.int64()),
])


def tile_mosaic(ds, *, cell_col: str = "cell_id", id_col: str = "image_idx",
                grid: int = 4, num_partitions: int = 16):
    """Contact sheet per map tile — the visual-inspection artifact a
    curation pipeline renders per region: up to grid² images per cell
    (smallest ids, deterministic), pasted row-major onto one canvas;
    unused slots stay black.  Input rows carry (cell, id, bytes) with
    UNIFORM self-contained containers.

    Scale shape: callers pre-cap per cell with grouped_topk so only
    <= grid² thumbnail rows per tile ever shuffle (thumbnails, not
    full-res); ONE hash exchange on the cell co-locates each sheet;
    the kernel decodes the partition's rows as one zero-copy
    (n, h, w, 3) view and pastes per tile — a per-TILE loop over
    <= grid² whole-image slice copies, never per-pixel/per-row
    Python.  Returns (cell_id, n_used, bytes, w, h)."""
    from ..relational import empty_dataset, hash_exchange_map
    from .codec import batch_pixel_view, encode_image

    def kernel(tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        n = len(tbl)
        if n == 0:
            return _MOSAIC_SCHEMA.empty_table()
        view = batch_pixel_view(tbl["bytes"])
        if view is None:
            raise ValueError("tile_mosaic requires uniform-size "
                             "self-contained image containers")
        px, w, h = view
        cells = tbl[cell_col].to_numpy(zero_copy_only=False)
        ids = tbl[id_col].to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, cells))
        cells_s, px_s = cells[order], px[order]
        starts = np.flatnonzero(np.r_[True, cells_s[1:] != cells_s[:-1]])
        ends = np.r_[starts[1:], n]
        out_cells, out_n, out_bytes = [], [], []
        for s, e in zip(starts, ends):
            take = min(int(e - s), grid * grid)
            canvas = np.zeros((h * grid, w * grid, 3), np.uint8)
            for pos in range(take):
                r, c = divmod(pos, grid)
                canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = px_s[s + pos]
            out_cells.append(int(cells_s[s]))
            out_n.append(take)
            out_bytes.append(encode_image(canvas, "rgb8"))
        return pa.Table.from_pydict(
            {"cell_id": pa.array(out_cells, pa.int64()),
             "n_used": pa.array(out_n, pa.int64()),
             "bytes": pa.array(out_bytes, pa.binary()),
             "w": pa.array([w * grid] * len(out_cells), pa.int64()),
             "h": pa.array([h * grid] * len(out_cells), pa.int64())},
            schema=_MOSAIC_SCHEMA)

    out = hash_exchange_map(ds, cell_col, num_partitions, kernel)
    if out is None:
        return empty_dataset(_MOSAIC_SCHEMA)
    return out


class AugmentImages:
    """Deterministic training-time augmentation: optional horizontal
    flip + center crop to (crop_w, crop_h), whole-batch vectorized on
    the zero-copy (n, h, w, 3) view (flip is a negative-stride view,
    crop a slice — pixels copy exactly once into the output buffer).
    ``flip`` selects rows by parity of a splitmix of image index when
    "hash" (the reproducible per-sample coin every aug pipeline needs),
    always/never otherwise.  Lossless re-encode (augmentation must not
    re-quantize)."""

    def __init__(self, crop: Tuple[int, int], flip: str = "hash"):
        self.cw, self.ch = crop
        assert flip in ("hash", "always", "never")
        self.flip = flip

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .codec import batch_pixel_view
        from .synth import splitmix64

        n = len(batch)
        out_schema = pa.schema([
            ("image_id", pa.string()), ("bytes", pa.binary()),
            ("w", pa.int32()), ("h", pa.int32()),
            ("flipped", pa.bool_()),
        ])
        if n == 0:
            return out_schema.empty_table()
        view = batch_pixel_view(batch["bytes"])
        if view is None:
            raise ValueError("AugmentImages requires uniform-size "
                             "self-contained containers")
        px, w, h = view
        if self.cw > w or self.ch > h:
            raise ValueError(f"crop {(self.cw, self.ch)} larger than "
                             f"source {(w, h)}")
        x0 = (w - self.cw) // 2
        y0 = (h - self.ch) // 2
        crop = px[:, y0:y0 + self.ch, x0:x0 + self.cw]
        if self.flip == "always":
            flipped = np.ones(n, bool)
        elif self.flip == "never":
            flipped = np.zeros(n, bool)
        else:
            idx = (
                pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4),
                        pa.int64()).to_numpy(zero_copy_only=False)
            )
            flipped = (splitmix64(idx.astype(np.uint64))
                       & np.uint64(1)).astype(bool)
        row_len = 8 + self.cw * self.ch * 3
        buf = np.empty((n, row_len), dtype=np.uint8)
        buf[:, :8] = np.frombuffer(
            b"R8" + struct.pack("<HHBB", self.cw, self.ch, 0, 0),
            dtype=np.uint8)
        out_px = buf[:, 8:].reshape(n, self.ch, self.cw, 3)
        out_px[:] = crop
        if flipped.any():
            out_px[flipped] = crop[flipped][:, :, ::-1]
        offsets = np.arange(n + 1, dtype=np.int32) * row_len
        blob = pa.Array.from_buffers(
            pa.binary(), n,
            [None, pa.py_buffer(offsets), pa.py_buffer(buf.reshape(-1))])
        return pa.Table.from_arrays(
            [batch["image_id"], blob,
             pa.array(np.full(n, self.cw, np.int32)),
             pa.array(np.full(n, self.ch, np.int32)),
             pa.array(flipped)],
            schema=out_schema)


def augment_images(ds, *, crop: Tuple[int, int], flip: str = "hash",
                   concurrency: int = 2,
                   batch_size: Optional[int] = None):
    return ds.map_batches(
        AugmentImages,
        fn_constructor_kwargs={"crop": crop, "flip": flip},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
