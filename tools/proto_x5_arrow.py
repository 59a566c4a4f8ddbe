"""r14 probe: x5 multimodal kernels — mapInArrow + vectorized inner loops vs the
shipped mapInPandas bodies, plus JVM built-in forms for the md5-derivable rows
(F.md5 exists; the fake decode's arithmetic is conv/substring-expressible).

Equality gate: collect-sorted rows must match the shipped body exactly before any
timing counts.  Timing: noop sink, min-of-N, canary-gated per tools/host_canary.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RUNS = int(os.environ.get("N_RUNS", "4"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/rubix_testdata/sf10")


def _payload_np(batch):
    """(lengths int64, data uint8 ndarray, absolute offsets int64) for the batch's
    payload BinaryArray — zero-copy, slice-offset-safe."""
    import numpy as np

    arr = batch.column("payload")
    # combine_chunks not needed: mapInArrow yields RecordBatch (single chunk)
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    return offs, data


def meta_arrow(df):
    def run(batches):
        import hashlib

        import pyarrow as pa
        import pyarrow.compute as pc

        schema = pa.schema([("doc_id", pa.int64()), ("n_bytes", pa.int32()), ("content_md5", pa.string())])
        for batch in batches:
            arr = batch.column("payload")
            offs, data = _payload_np(batch)
            mv = memoryview(data)
            md5s = [hashlib.md5(mv[offs[i] : offs[i + 1]]).hexdigest() for i in range(len(arr))]
            yield pa.record_batch(
                {
                    "doc_id": batch.column("doc_id"),
                    "n_bytes": pc.binary_length(arr),
                    "content_md5": pa.array(md5s, pa.string()),
                }
            ).cast(schema)

    return df.mapInArrow(run, schema="doc_id bigint, n_bytes int, content_md5 string")


def _digests(offs, data):
    """n x 16 uint8 matrix of per-row md5 digests."""
    import hashlib

    import numpy as np

    n = len(offs) - 1
    out = bytearray(16 * n)
    mv = memoryview(data)
    for i in range(n):
        out[16 * i : 16 * i + 16] = hashlib.md5(mv[offs[i] : offs[i + 1]]).digest()
    return np.frombuffer(bytes(out), dtype=np.uint8).reshape(n, 16)


def decode_arrow(df):
    def run(batches):
        import numpy as np
        import pyarrow as pa

        schema = pa.schema(
            [("doc_id", pa.int64()), ("width", pa.int32()), ("height", pa.int32()), ("channels", pa.int32())]
        )
        for batch in batches:
            offs, data = _payload_np(batch)
            d = _digests(offs, data).astype(np.int32)
            w = (d[:, 0] << 8 | d[:, 1]) % 1920 + 1
            h = (d[:, 2] << 8 | d[:, 3]) % 1080 + 1
            yield pa.record_batch(
                {
                    "doc_id": batch.column("doc_id"),
                    "width": pa.array(w, pa.int32()),
                    "height": pa.array(h, pa.int32()),
                    "channels": pa.array(np.full(len(w), 3, np.int32), pa.int32()),
                }
            ).cast(schema)

    return df.mapInArrow(run, schema="doc_id bigint, width int, height int, channels int")


def frame_arrow(df):
    N_FRAMES = 4

    def run(batches):
        import numpy as np
        import pyarrow as pa

        schema = pa.schema([("doc_id", pa.int64()), ("frame_idx", pa.int32()), ("frame_offset", pa.int32())])
        for batch in batches:
            offs, _ = _payload_np(batch)
            lens = np.diff(offs)
            doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
            n = len(lens)
            idx = np.tile(np.arange(N_FRAMES, dtype=np.int64), n)
            yield pa.record_batch(
                {
                    "doc_id": pa.array(np.repeat(doc, N_FRAMES), pa.int64()),
                    "frame_idx": pa.array(idx, pa.int32()),
                    "frame_offset": pa.array(idx * np.repeat(lens, N_FRAMES) // N_FRAMES, pa.int32()),
                }
            ).cast(schema)

    return df.mapInArrow(run, schema="doc_id bigint, frame_idx int, frame_offset int")


def resize_arrow(df):
    TARGET_EDGE = 224

    def run(batches):
        import numpy as np
        import pyarrow as pa

        schema = pa.schema(
            [("doc_id", pa.int64()), ("width", pa.int32()), ("height", pa.int32()),
             ("rw", pa.int32()), ("rh", pa.int32())]
        )
        for batch in batches:
            offs, data = _payload_np(batch)
            d = _digests(offs, data).astype(np.int32)
            w = (d[:, 0] << 8 | d[:, 1]) % 1920 + 1
            h = (d[:, 2] << 8 | d[:, 3]) % 1080 + 1
            scale = np.minimum(TARGET_EDGE / np.maximum(w, h).astype(np.float64), 1.0)
            rw = np.maximum((w * scale).astype(np.int64), 1)
            rh = np.maximum((h * scale).astype(np.int64), 1)
            yield pa.record_batch(
                {
                    "doc_id": batch.column("doc_id"),
                    "width": pa.array(w, pa.int32()),
                    "height": pa.array(h, pa.int32()),
                    "rw": pa.array(rw, pa.int32()),
                    "rh": pa.array(rh, pa.int32()),
                }
            ).cast(schema)

    return df.mapInArrow(run, schema="doc_id bigint, width int, height int, rw int, rh int")


def features_arrow(df):
    N_FEAT = 8

    def run(batches):
        import numpy as np
        import pyarrow as pa

        for batch in batches:
            offs, data = _payload_np(batch)
            n = len(offs) - 1
            lens = np.diff(offs)
            seg = data[offs[0] : offs[-1]]
            row_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
            hist = np.bincount(row_ids * N_FEAT + (seg >> 5), minlength=n * N_FEAT).astype(np.float64).reshape(n, N_FEAT)
            tot = hist.sum(axis=1, keepdims=True)
            np.divide(hist, tot, out=hist, where=tot != 0)
            flat = pa.array(hist.reshape(-1).astype(np.float32), pa.float32())
            feat = pa.ListArray.from_arrays(pa.array(np.arange(0, (n + 1) * N_FEAT, N_FEAT, np.int32), pa.int32()), flat)
            yield pa.record_batch(
                {"doc_id": batch.column("doc_id"), "feat": feat}
            ).cast(pa.schema([("doc_id", pa.int64()), ("feat", pa.list_(pa.float32()))]))

    return df.mapInArrow(run, schema="doc_id bigint, feat array<float>")


# ---------------- JVM built-in forms (md5-derivable rows) ----------------

def meta_jvm(df):
    from pyspark.sql import functions as F

    return df.select(
        "doc_id",
        F.octet_length("payload").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
    )


def _jvm_dims(df):
    from pyspark.sql import functions as F

    h = F.md5("payload")
    w = (F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % 1920 + 1).cast("int")
    hh = (F.conv(F.substring(h, 5, 4), 16, 10).cast("int") % 1080 + 1).cast("int")
    return df.select("doc_id", w.alias("width"), hh.alias("height"))


def decode_jvm(df):
    from pyspark.sql import functions as F

    return _jvm_dims(df).select("doc_id", "width", "height", F.lit(3).alias("channels"))


def frame_jvm(df):
    from pyspark.sql import functions as F

    return (
        df.select("doc_id", F.octet_length("payload").cast("long").alias("n"))
        .select("doc_id", "n", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("frame_idx"))
        .select(
            "doc_id",
            F.col("frame_idx").cast("int").alias("frame_idx"),
            F.expr("CAST((frame_idx * n) DIV 4 AS INT)").alias("frame_offset"),
        )
    )


def resize_jvm(df):
    from pyspark.sql import functions as F

    d = _jvm_dims(df)
    scale = F.least(F.lit(224.0) / F.greatest("width", "height").cast("double"), F.lit(1.0))
    return d.select(
        "doc_id",
        "width",
        "height",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("rw"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("rh"),
    )


def main():
    from pyspark.sql import SparkSession

    from rubix_spark import catalog
    from rubix_spark.ops.multimodal import (
        _payloads,
        decode_batch,
        extract_features,
        extract_metadata,
        resize_plan,
        sample_frames,
    )
    from tools.host_canary import canary, healthy

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .getOrCreate()
    )
    catalog.ensure_session_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")

    pay = _payloads(spark, SF_DIR)

    variants = {
        "meta": {"cur": extract_metadata(pay), "arrow": meta_arrow(pay), "jvm": meta_jvm(pay)},
        "decode": {"cur": decode_batch(pay), "arrow": decode_arrow(pay), "jvm": decode_jvm(pay)},
        "frame": {"cur": sample_frames(pay), "arrow": frame_arrow(pay), "jvm": frame_jvm(pay)},
        "resize": {"cur": resize_plan(pay), "arrow": resize_arrow(pay), "jvm": resize_jvm(pay)},
        "features": {"cur": extract_features(pay), "arrow": features_arrow(pay)},
    }

    # equality gate on a sample (sort-collect is expensive at sf10: use checksum agg)
    from pyspark.sql import functions as F

    def fingerprint(df):
        cols = [F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in sorted(df.columns)]))]
        return df.select(F.sum(F.conv(F.substring(cols[0], 1, 15), 16, 10).cast("decimal(38,0)")).alias("fp"), F.count("*").alias("n")).collect()[0]

    for op, vs in variants.items():
        ref = fingerprint(vs["cur"])
        for name, df in vs.items():
            if name == "cur":
                continue
            got = fingerprint(df)
            status = "EQUAL" if (got.fp == ref.fp and got.n == ref.n) else f"MISMATCH ref={ref} got={got}"
            print(f"equality {op}.{name}: {status}", flush=True)

    gated = os.environ.get("X5_GATED", "1") == "1"
    for op, vs in variants.items():
        for name, df in vs.items():
            times = []
            for _ in range(N_RUNS):
                if gated:
                    c0 = canary()
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                if gated:
                    c1 = canary()
                    if not (healthy(*c0) and healthy(*c1)):
                        print(f"  [{op}.{name}] run discarded (canary {c0} {c1})", flush=True)
                        continue
                times.append(dt)
            if not times:
                print(f"time {op}.{name}: NO HEALTHY SAMPLES (all {N_RUNS} runs canary-discarded)", flush=True)
                continue
            print(f"time {op}.{name}: min={min(times):.3f} samples={[round(t,3) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
