"""A/B: x9_repetition explode+countDistinct (shuffles ~300 shingle STRINGS per doc)
vs a zero-shuffle doc-local array form with invariant-10 rand barriers.

The per-doc dup-3gram ratio needs no data movement at all — the r4 explode form
existed to dodge projection-collapse inlining of the tokenizer (invariant 3), but
the later-discovered rand-sentinel barrier solves that without the explode: two
barriered projections materialize toks then sh exactly once, and the final
projection references the materialized sh attribute (cheap sibling reads).

    python -u tools/proto_x9_repetition.py [--sf DIR] [--n 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_local(spark, sf_dir):
    from pyspark.sql import functions as F

    from rubix_spark import catalog
    from rubix_spark.fns import round_det
    from rubix_spark.ops import _tok

    docs = catalog.table(spark, sf_dir, "documents")
    sh = _tok.shingles(_tok.tokens("text"), 3)
    # lambda-variable binding: array(sh) evaluates the tokenize+shingle tree ONCE;
    # inside the lambda, x is a bound VALUE, so the three references (two sizes +
    # array_distinct) read it — no projection-collapse re-inlining possible.
    ratio1 = F.element_at(
        F.transform(
            F.array(sh),
            lambda x: F.when(
                F.size(x) > 0,
                F.lit(1.0) - F.size(F.array_distinct(x)).cast("double") / F.size(x),
            ),
        ),
        1,
    )
    t = docs.select("doc_id", ratio1.alias("_r"), F.rand(7).alias("_b"))
    return (
        t.where(F.col("_r").isNotNull())
        .select("doc_id", round_det(F.col("_r"), 4).alias("dup3_ratio"))
    )


def _rep_kernel(batches):
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    for b in batches:
        if b.num_rows == 0:
            continue
        text = b.column(1)
        norm = pc.utf8_lower(pc.replace_substring_regex(text, "[^a-zA-Z0-9 ]", " "))
        norm = pc.utf8_trim_whitespace(pc.replace_substring_regex(norm, " +", " "))
        toks = pc.split_pattern(norm, " ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        flat = toks.values
        offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(flat)
        if n < 3:
            continue
        ids = pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False).astype(np.int64)
        base = np.int64(n + 1)
        k1 = ids[: n - 2] * base + ids[1 : n - 1]
        _, inv = np.unique(k1, return_inverse=True)
        k2 = inv.astype(np.int64) * base + ids[2:]
        idx = np.arange(n - 2)
        doc_of = np.searchsorted(offs, idx, side="right") - 1
        valid = idx <= offs[doc_of + 1] - 3
        if not valid.any():
            continue
        dsel = doc_of[valid]
        keys = k2[valid]
        order = np.lexsort((keys, dsel))
        d_s, k_s = dsel[order], keys[order]
        new = np.ones(len(d_s), bool)
        new[1:] = (d_s[1:] != d_s[:-1]) | (k_s[1:] != k_s[:-1])
        docs_u, first_idx, tot = np.unique(d_s, return_index=True, return_counts=True)
        dist = np.add.reduceat(new.astype(np.int64), first_idx)
        ratio = 1.0 - dist.astype(np.float64) / tot.astype(np.float64)
        ratio = np.floor(ratio * 10000 + 0.5) / 10000.0
        yield pa.record_batch({
            "doc_id": pa.array(b.column(0).to_numpy(zero_copy_only=False)[docs_u], pa.int64()),
            "dup3_ratio": pa.array(ratio, pa.float64()),
        })


def build_arrow(spark, sf_dir):
    from rubix_spark import catalog

    docs = catalog.table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(_rep_kernel, "doc_id bigint, dup3_ratio double")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from rubix_spark import catalog
    from rubix_spark.queries import load_all

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.codegen.cache.maxEntries", "5000")
        .getOrCreate()
    )
    catalog.ensure_session_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    reg = load_all()

    variants = {
        "explode": lambda: reg["x9_repetition"].builder(spark, args.sf),
        "arrow": lambda: build_arrow(spark, args.sf),
    }
    res = {n: sorted((r.doc_id, r.dup3_ratio) for r in b().collect())
           for n, b in variants.items()}
    assert res["explode"] == res["arrow"], "results differ"
    print(f"results identical: {len(res['arrow'])} docs")

    for name, b in variants.items():
        ts = []
        for _ in range(args.n):
            t0 = time.monotonic()
            b().write.format("noop").mode("overwrite").save()
            ts.append(time.monotonic() - t0)
        print(f"{name:8s} min={min(ts):.3f} runs={['%.3f' % t for t in ts]}")


if __name__ == "__main__":
    main()
