"""X2 — similarity search over the ``embeddings`` table (``embedding: array<float>``).

Three paths, mirroring how a 100 TB vector corpus is actually served:

- ``x2_ann_bruteforce`` — exact cosine top-k against a query vector.  The query vector is
  a 1-row broadcast; the scan is embarrassingly parallel; top-k is
  TakeOrderedAndProject (per-partition heaps + driver merge of k rows, never a full sort).
- ``x2_ann_ivf``       — IVF-lite: a deterministic centroid set (first 16 vectors stands in
  for a k-means codebook), every vector assigned to its nearest centroid.  The assignment
  is a WRITTEN table bucketed by ``cid`` (``_ivf_index`` via
  ``sources.bucketing.persisted_bucketed`` — built once per fixture generation, probed
  forever); a probe bucket-prunes to its ``NPROBE`` nearest centroid buckets.
- ``x2_ann_lsh``       — sign-LSH: 8 deterministic md5-derived hyperplanes → 8-bit bucket
  key.  The (vec_id, bucket, embedding) index is likewise a WRITTEN bucketed table
  (``_lsh_index``); serving reads ONLY the query's bucket file — no signature recompute.

The build-once/serve-many split is the reference's own warm-once contract
(``CachingFileSystem.java:227-260`` warms a block once and serves every later read from
the cache; ``BookKeeper.java:248-353`` keeps status lookups cheap) applied to the vector
path: at 100 TB, re-hashing the corpus per probe is a full scan per query, while the
persisted index makes a probe a single bucket read.

All arithmetic is float→double before multiply/sum, sequential fold on both engines, so
the oracle hashes match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rubix_spark import catalog
from rubix_spark.fns import round_det
from rubix_spark.queries import register

TOP_K = 10
N_CENTROIDS = 16
NPROBE = 4
N_PLANES = 8
DIM = 64
QUERY_VEC_ID = 0


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product over array<float> columns, in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    # NULLIF on the norm product: a zero-norm vector makes the division 0/0,
    # which DuckDB maps to NULL (division by zero → NULL, sorted last under
    # DESC) but ANSI Spark turns into a query-killing DIVIDE_BY_ZERO
    # (invariant 31e — found by the adversarial-embeddings corpus, round 13).
    # NULL matches the oracle and sorts last in both engines; NaN *components*
    # (a non-zero denominator) stay NaN and rank first in both.
    return dot(a, b) / F.nullif(F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)), F.lit(0.0))


# Literal-vector variants, built as ONE SQL string each. The Column-DSL forms above
# cost one py4j round-trip per literal element (a 64-dim vector ⇒ ~70 JVM calls; the
# 8-plane LSH bucket ⇒ ~550), which dominated these queries' latency — build time was
# 2-3x execution. The parsed trees are the same shapes (array(...) of foldable
# literals constant-folds to a single array Literal, so the per-row evaluate-once
# property that matters for CLAUDE.md invariant 10 is preserved), and the arithmetic
# is bit-identical: same zip_with/aggregate fold, doubles formatted via repr
# round-trip.
def _arr_sql(vec: list[float]) -> str:
    # non-finite doubles have no bare-literal spelling ('nanD' fails to parse):
    # spell them through the string cast, which Spark folds to the same constant
    # (NaN components reach here via a NaN-norm centroid — r13 review family)
    def lit(x: float) -> str:
        return f"{x!r}D" if x == x and abs(x) != float("inf") else f"double('{x!r}')"

    return "array(" + ", ".join(lit(x) for x in vec) + ")"


def _dot_sql(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def dot_lit(col: str, vec: list[float]) -> Column:
    """dot(col, <literal vector>) as a single parsed expression."""
    return F.expr(_dot_sql(col, _arr_sql(vec)))


def cosine_lit(col: str, vec: list[float]) -> Column:
    """cosine(col, <literal vector>) as a single parsed expression (zero-norm →
    NULL via NULLIF, same contract as ``cosine`` — invariant 31e)."""
    a = _arr_sql(vec)
    return F.expr(
        f"{_dot_sql(col, a)} / "
        f"NULLIF(SQRT({_dot_sql(col, col)}) * SQRT({_dot_sql(a, a)}), CAST(0 AS DOUBLE))"
    )


DUCK_DOT = (
    "list_aggregate(list_transform(list_zip({a}, {b}), "
    "x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')"
)


def _duck_cos(a: str, b: str) -> str:
    return (
        f"{DUCK_DOT.format(a=a, b=b)} / "
        f"(sqrt({DUCK_DOT.format(a=a, b=a)}) * sqrt({DUCK_DOT.format(a=b, b=b)}))"
    )


# ---------------------------------------------------------------------------
# brute force
# ---------------------------------------------------------------------------
# np_exact pays a fixed Python-worker spin-up (~0.2 s) the interpreted fold
# doesn't; the fold pays ~4.7 µs/row. Crossover ~50k rows; sf1 (20k) keeps the
# fold, sf10 (200k) rides the kernel. Measured idle min-of-N: sf1 0.411 fold vs
# 0.475 kernel; sf10 0.921 fold vs 0.550 kernel.
_BRUTEFORCE_NP_MIN_ROWS = 100_000


def _bruteforce_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = catalog.table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qe"))
    sim = cosine(F.col("embedding"), F.col("qe"))
    return (
        emb.crossJoin(F.broadcast(q))
        .select("vec_id", sim.alias("_sim"))
        .orderBy(F.col("_sim").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", round_det(F.col("_sim"), 4).alias("sim"))
    )


def _bruteforce_np_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-identical vectorized form of the HOF fold (NOT the BLAS twin below).

    ``aggregate(zip_with(v,q,x*y), 0.0, acc+x)`` is a strict left fold in element
    order; numpy replicates that exact IEEE add sequence vectorized ACROSS rows by
    accumulating one DIMENSION at a time (``acc += m[:, d] * q[d]``) — each row
    sees the identical sequence of adds, so every cosine is bit-equal to the
    interpreted fold (asserted over all rows in tests/test_ann.py) and the DuckDB
    oracle carries over unchanged. The BLAS matvec (x2_ann_bruteforce_np) is
    faster still but sums in SIMD order — last-ulp diffs, rows-only gate."""
    import numpy as np

    emb = catalog.table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    row = emb.where(F.col("vec_id") == QUERY_VEC_ID).select("embedding").head()
    if row is None:
        raise ValueError(f"embeddings fixture is missing query vec_id {QUERY_VEC_ID}")
    q = np.asarray(row.embedding, dtype=np.float64)
    q_norm = float(_py_dot(row.embedding, row.embedding)) ** 0.5
    k = TOP_K

    d = len(q)

    def score(batches):
        import numpy as np
        import pyarrow as pa

        ids = np.empty(0, dtype=np.int64)
        sims = np.empty(0, dtype=np.float64)
        bad_ids = np.empty(0, dtype=np.int64)  # NULL-sim rows (fold semantics)
        for b in batches:
            col = b.column(1)
            n = len(col)
            if n == 0:
                continue
            # Rows the HOF fold maps to a NULL sim — NULL list, width != query's
            # (zip_with pads with NULL), or a NULL element — are kept aside with
            # sim NULL instead of raising (ADVICE r12): they sort after every
            # real sim downstream exactly like the fold's NULLs, so a single bad
            # row in a regenerated fixture degrades instead of crashing.
            offs = col.offsets.to_numpy(zero_copy_only=False)
            widths = np.diff(offs)
            ok = widths == d
            if col.null_count:
                ok &= ~col.is_null().to_numpy(zero_copy_only=False)
            if col.values.null_count:
                cs = np.concatenate(
                    [[0], np.cumsum(col.values.is_null().to_numpy(zero_copy_only=False))]
                )
                ok &= (cs[offs[1:] - offs[0]] - cs[offs[:-1] - offs[0]]) == 0
            bids = b.column(0).to_numpy(zero_copy_only=False)
            if not ok.all():
                bad_ids = np.sort(np.concatenate([bad_ids, bids[~ok]]))[:k]
                b = b.filter(pa.array(ok))
                col = b.column(1).combine_chunks() if hasattr(b.column(1), "combine_chunks") else b.column(1)
                n = len(col)
                if n == 0:
                    continue
                offs = col.offsets.to_numpy(zero_copy_only=False)
                bids = b.column(0).to_numpy(zero_copy_only=False)
            flat = col.values.to_numpy(zero_copy_only=False)
            m = flat[offs[0]:offs[-1]].astype(np.float64).reshape(n, d)
            dq = np.zeros(n)
            dv = np.zeros(n)
            for j in range(d):  # fold order: dimension-major == the HOF fold
                c = m[:, j]
                dq += c * q[j]
                dv += c * c
            # Zero-norm rows (denominator exactly 0) are NULL in the fold since
            # the cosine() NULLIF guard (invariant 31e) — route them into the
            # NULL pool; NaN from NaN *components* keeps a non-zero denominator
            # and stays NaN (ranked first by both engines).
            denom = np.sqrt(dv) * q_norm
            zero = denom == 0.0
            with np.errstate(invalid="ignore", divide="ignore"):
                s = dq / denom
            if zero.any():
                bad_ids = np.sort(np.concatenate([bad_ids, bids[zero]]))[:k]
                bids, s = bids[~zero], s[~zero]
            ids = np.concatenate([ids, bids])
            sims = np.concatenate([sims, s])
            if len(ids) > 8 * k:
                key = -np.where(np.isnan(sims), np.inf, sims)  # NaN first, like desc
                sel = np.lexsort((ids, key))[:k]
                ids, sims = ids[sel], sims[sel]
        if len(ids):
            key = -np.where(np.isnan(sims), np.inf, sims)
            sel = np.lexsort((ids, key))[:k]
            ids, sims = ids[sel], sims[sel]
        if len(ids) or len(bad_ids):
            out_ids = pa.array(np.concatenate([ids, bad_ids]), pa.int64())
            out_sims = pa.concat_arrays([
                pa.array(sims, pa.float64()),
                pa.array([None] * len(bad_ids), pa.float64()),
            ])
            yield pa.record_batch({"vec_id": out_ids, "_sim": out_sims})

    part = emb.mapInArrow(score, "vec_id bigint, _sim double")
    return (
        part.orderBy(F.col("_sim").desc(), "vec_id")
        .limit(k)
        .select("vec_id", round_det(F.col("_sim"), 4).alias("sim"))
    )


@register(
    "x2_ann_bruteforce",
    f"""
    WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
    SELECT v.vec_id, FLOOR(({_duck_cos('v.embedding', 'q.qe')}) * 10000 + 0.5) / 10000.0 AS sim
    FROM embeddings v, q
    ORDER BY {_duck_cos('v.embedding', 'q.qe')} DESC, v.vec_id
    LIMIT {TOP_K}
    """,
    doc=(
        "Exact cosine top-k, size-adaptive (invariant 16): past "
        f"{_BRUTEFORCE_NP_MIN_ROWS} footer rows the interpreted zip_with/aggregate "
        "fold (~4.7 µs/row) yields to a mapInArrow numpy kernel whose "
        "dimension-major accumulation reproduces the fold's IEEE add order "
        "BIT-IDENTICALLY (same oracle, asserted per-row in tests/test_ann.py); "
        "below it the fold avoids the Python worker spin-up. sf10 idle: 0.550 "
        "kernel vs 0.921 fold; sf1: 0.475 vs 0.411."
    ),
)
def ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from rubix_spark.sources.stats import parquet_row_count

    min_rows = int(os.environ.get("RUBIX_X2_NP_MIN_ROWS", _BRUTEFORCE_NP_MIN_ROWS))
    if parquet_row_count(f"{sf_dir.rstrip('/')}/embeddings.parquet") >= min_rows:
        return _bruteforce_np_exact(spark, sf_dir)
    return _bruteforce_hof(spark, sf_dir)


@register(
    "x2_ann_bruteforce_np",
    None,  # rows-only: BLAS matmul sums in SIMD order — last-ulp diff vs the sequential oracle
    doc=(
        "Vectorized scale path for exact top-k: mapInArrow numpy kernel scores each "
        "Arrow batch with one matvec (BLAS, C loop; zero-copy gather off the "
        "ListArray values buffer) and keeps a per-partition top-k "
        "heap, so the driver-side merge sees only k rows per partition — the same "
        "economics as TakeOrderedAndProject but ~10-100x the interpreted HOF fold of "
        "x2_ann_bruteforce, which remains the oracle-exact proof. Rows-only gate "
        "(BLAS summation order differs from the sequential oracle in the last ulp)."
    ),
)
def ann_bruteforce_np(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = catalog.table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    row = emb.where(F.col("vec_id") == QUERY_VEC_ID).select("embedding").head()
    if row is None:
        raise ValueError(f"embeddings fixture is missing query vec_id {QUERY_VEC_ID}")
    import numpy as np

    q = np.asarray(row.embedding, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    k = TOP_K

    def topk_partition(batches):
        import numpy as np
        import pyarrow as pa

        def rank(s):
            # the engines rank NaN sims FIRST under DESC (NaN compares greatest in
            # Spark and DuckDB); np.lexsort on -s would bury NaN last instead
            return -np.where(np.isnan(s), np.inf, s)

        d = len(qn)
        ids = np.empty(0, dtype=np.int64)
        sims = np.empty(0, dtype=np.float64)
        for b in batches:
            col = b.column("embedding")
            if len(col) == 0:
                continue
            # degrade NULL/off-width rows out of the candidate set exactly like
            # the exact kernel (their fold sim is NULL -> never in the top-k).
            # mapInArrow (round-14): the tile matrix gathers straight off the
            # ListArray's contiguous values buffer (offsets are absolute into the
            # shared child array); NULL elements arrive as NaN (to_numpy null
            # fill) and rank first like every NaN sim.
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            ok = np.diff(offs) == d
            if col.null_count:
                ok &= col.is_valid().to_numpy(zero_copy_only=False)
            if not ok.any():
                continue
            flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            m = flat[offs[:-1][ok][:, None] + np.arange(d)[None, :]]
            nrm = np.linalg.norm(m, axis=1)
            s = (m @ qn) / np.where(nrm == 0.0, 1.0, nrm)
            ids = np.concatenate(
                [ids, b.column("vec_id").to_numpy(zero_copy_only=False)[ok]]
            )
            sims = np.concatenate([sims, s])
            if len(ids) > 8 * k:  # cap scratch: re-prune between batches
                order = np.lexsort((ids, rank(sims)))[:k]
                ids, sims = ids[order], sims[order]
        if len(ids):
            order = np.lexsort((ids, rank(sims)))[:k]
            yield pa.record_batch(
                {
                    "vec_id": pa.array(ids[order], pa.int64()),
                    "sim": pa.array(np.floor(sims[order] * 10000 + 0.5) / 10000.0, pa.float64()),
                }
            )

    part = emb.mapInArrow(topk_partition, "vec_id bigint, sim double")
    return part.orderBy(F.col("sim").desc(), "vec_id").limit(k)


# ---------------------------------------------------------------------------
# IVF-lite probe
# ---------------------------------------------------------------------------
def _py_dot(a, b) -> float:
    """Driver-side sequential-fold dot — bit-identical to dot()/DUCK_DOT evaluation."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _py_cos(a, b) -> float:
    import math

    denom = math.sqrt(_py_dot(a, a)) * math.sqrt(_py_dot(b, b))
    if denom == 0.0:
        # zero-norm vector: the SQL cosine is NULL (NULLIF guard) and NULL sorts
        # LAST under DESC in both engines — -inf ranks identically in the
        # driver-side probe selection (ties still break on cid)
        return float("-inf")
    return _py_dot(a, b) / denom


def _ivf_codebook(
    emb: DataFrame, extra_ids: tuple[int, ...] = (), memo_key: str | None = None
) -> tuple[dict, dict]:
    """Collect the deterministic codebook (first N_CENTROIDS vectors) plus any extra
    vectors (query vectors) — a bounded driver artifact, like shipping k-means
    centroids. Memoized per (session, memo_key, extra_ids): the codebook IS the
    persisted build-pass artifact, so re-collecting it per query call was a wasted
    Spark job on every probe."""
    if memo_key is not None:
        memo = getattr(emb.sparkSession, "_rubix_codebook_memo", None)
        if memo is None:
            memo = {}
            emb.sparkSession._rubix_codebook_memo = memo
        k = (memo_key, tuple(extra_ids))
        if k in memo:
            return memo[k]
    top = max([N_CENTROIDS - 1, *extra_ids])
    rows = emb.where(F.col("vec_id") <= top).select("vec_id", "embedding").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    missing = sorted(set(extra_ids) - set(vecs))
    if missing or not vecs:
        raise ValueError(
            f"embeddings fixture is missing required vec_ids {missing or 'all'} "
            f"(codebook needs vec_id < {N_CENTROIDS} plus query ids {sorted(extra_ids)}; "
            f"got {len(vecs)} of the first {top + 1})"
        )
    cents = {vid: v for vid, v in vecs.items() if vid < N_CENTROIDS}
    extras = {vid: vecs[vid] for vid in extra_ids}
    if memo_key is not None:
        memo[(memo_key, tuple(extra_ids))] = (cents, extras)
    return cents, extras


def _probe_cids(cents: dict, qe: list) -> list[int]:
    """NPROBE nearest centroids to a query — the oracle's ORDER BY cos DESC, cid.

    NaN cosines (a NaN centroid/query component with non-zero norms) rank FIRST:
    both engines order NaN greatest under DESC, while a raw NaN sort key makes
    Python's sorted() comparisons unordered (it can misorder even the non-NaN
    neighbors — r13 review). The explicit NaN-first class key replicates the
    engines; -inf (the zero-norm NULL stand-in) naturally ranks last."""
    import math

    def key(kv):
        c = _py_cos(kv[1], qe)
        return (0 if math.isnan(c) else 1, -c if not math.isnan(c) else 0.0, kv[0])

    return [cid for cid, _ in sorted(cents.items(), key=key)[:NPROBE]]


def _ivf_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITTEN IVF assignment: (vec_id, embedding, cid) for the whole corpus,
    persisted ONCE as a table bucketed by ``cid`` (``persisted_bucketed``; fingerprint
    of embeddings.parquet guards staleness across driver fixture regenerations). A
    probe's ``cid IN (...)`` filter bucket-prunes the scan to the probed centroid
    files — the corpus is never re-assigned at serve time. Same ingest-time economics
    as the dedup corpus band index (``ops/dedup._corpus_band_index``)."""
    from rubix_spark.sources.bucketing import persisted_bucketed

    def build():
        emb = catalog.table(spark, sf_dir, "embeddings")
        cents, _ = _ivf_codebook(emb, (), memo_key=sf_dir)
        return _ivf_assign(emb, cents)

    return persisted_bucketed(
        spark,
        label="ivf_index",
        source_path=f"{sf_dir.rstrip('/')}/embeddings.parquet",
        build=build,
        bucket_col="cid",
        n_buckets=N_CENTROIDS,
    )


def _ivf_assign(emb: DataFrame, cents: dict) -> DataFrame:
    """Zero-shuffle IVF assignment: argmax over dot(e, ĉ) with centroids NORMALIZED
    driver-side — cos(e,c) = dot(e, c/|c|) / |e|, and |e| is a positive per-row
    constant, so the ordering (and the chosen centroid) is the oracle's cosine argmax.
    Keeping the row norm out of the expression matters: filter pushdown would inline it
    once per centroid struct (measured 13× regression). F.lit(list) produces a true
    array Literal evaluated once, not a per-row CreateArray. Ties break to the smaller
    cid via the negated-cid struct field, matching ROW_NUMBER(ORDER BY cos DESC, cid).
    """
    import math

    # Zero-norm centroids are skipped rather than normalized (x/0 would raise
    # driver-side): the oracle's cos(v, zero-centroid) is NULL (invariant 35),
    # and a NULL score never wins ROW_NUMBER(ORDER BY cos DESC) — dropping the
    # struct reproduces exactly that. All-zero codebook (or a zero query
    # vector): every score is NULL/0 on both engines and the tie rule picks the
    # smallest cid. A NaN-COMPONENT centroid (norm NaN, not zero) is the
    # opposite case and must be KEPT: its cosine is NaN and BOTH engines rank
    # NaN greatest under ORDER BY cos DESC / greatest(), so dropping it would
    # hand the win to a different centroid than the oracle (r13 review; the
    # NaN/NaN normalized constants reproduce the NaN score exactly). Fixture
    # codebooks have neither, so generated expressions and measured plans are
    # unchanged.
    scored = [
        F.struct(
            dot_lit("embedding", [x / math.sqrt(_py_dot(ce, ce)) for x in ce]).alias("cs"),
            F.lit(-cid).alias("mcid"),
        )
        for cid, ce in cents.items()
        if _py_dot(ce, ce) > 0.0 or math.isnan(_py_dot(ce, ce))
    ]
    if not scored:
        return emb.select("vec_id", "embedding", F.lit(min(cents)).alias("cid"))
    return emb.select("vec_id", "embedding", (-F.greatest(*scored).getField("mcid")).alias("cid"))


@register(
    "x2_ann_ivf",
    f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < {N_CENTROIDS}),
    assign AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT v.vec_id, v.embedding, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {_duck_cos('v.embedding', 'c.ce')} DESC, c.cid) AS rn
            FROM embeddings v, cent c
        ) WHERE rn = 1
    ),
    q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = {QUERY_VEC_ID}),
    probes AS (
        SELECT cid FROM cent, q
        ORDER BY {_duck_cos('cent.ce', 'q.qe')} DESC, cid LIMIT {NPROBE}
    )
    SELECT a.vec_id, FLOOR(({_duck_cos('a.embedding', 'q.qe')}) * 10000 + 0.5) / 10000.0 AS sim
    FROM assign a JOIN probes p ON a.cid = p.cid, q
    ORDER BY {_duck_cos('a.embedding', 'q.qe')} DESC, a.vec_id
    LIMIT {TOP_K}
    """,
    doc=(
        "IVF probe against the PERSISTED assignment index: vectors are assigned to the "
        "nearest of 16 deterministic centroids ONCE and written bucketed by cid "
        "(_ivf_index); a query bucket-prunes the scan to its 4 nearest centroid "
        "buckets and runs exact cosine inside them only."
    ),
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve path: the probe set resolves driver-side into a cid IN filter that
    bucket-prunes the written index (plan pinned: SelectedBucketsCount <= NPROBE, no
    Exchange — tests/test_shuffle_ops.py); the assignment pass (_ivf_assign) runs only
    inside the one-time index build. Assignment equivalence with the oracle's
    cosine-argmax form is asserted via the oracle hash at every SF (tests/test_queries)."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    cents, extras = _ivf_codebook(emb, (QUERY_VEC_ID,), memo_key=sf_dir)
    qe = extras[QUERY_VEC_ID]
    probe_cids = _probe_cids(cents, qe)
    index = _ivf_index(spark, sf_dir)

    # the query vector is already a driver value — score against it as a literal
    # (same float32-widened doubles the oracle casts), no 1-row scan/broadcast/join
    sim = cosine_lit("embedding", qe)
    return (
        index.where(F.col("cid").isin(probe_cids))
        .select("vec_id", sim.alias("_sim"))
        .orderBy(F.col("_sim").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", round_det(F.col("_sim"), 4).alias("sim"))
    )


# ---------------------------------------------------------------------------
# sign-LSH buckets
# ---------------------------------------------------------------------------
# Deterministic pseudo-random hyperplanes: component (p, j) = (hash32(md5("p_j")) % 1000) - 500.
def _planes() -> list[list[float]]:
    import hashlib

    return [
        [float(int(hashlib.md5(f"{p}_{j}".encode()).hexdigest()[:8], 16) % 1000 - 500) for j in range(DIM)]
        for p in range(N_PLANES)
    ]


def _lsh_bucket() -> Column:
    """The 8-bit signature as ONE parsed expression: sum of IF(dot(e, plane_p) > 0,
    2^p, 0). Bit-equal to the previous CASE-WHEN DSL form (IF == CASE WHEN); the
    per-plane dot products are exact in double (float32 mantissa x |w|<=500 stays
    under 53 bits), so sign bits match the oracle's SUM-based variant."""
    terms = " + ".join(
        f"IF({_dot_sql('embedding', _arr_sql(row))} > 0, {1 << p}, 0)"
        for p, row in enumerate(_planes())
    )
    return F.expr(f"CAST({terms} AS BIGINT)")


def _py_bucket(qe: list) -> int:
    """The query's sign-LSH bucket, computed driver-side. Bit-identical to
    ``_lsh_bucket()``: the per-plane dot products are exact in double (float32
    mantissa × |w|≤500 stays under 53 bits) and ``_py_dot`` is the same sequential
    fold, so the sign bits agree with both engines. NaN dot (a NaN query
    component): BOTH engines evaluate ``NaN > 0`` TRUE (Spark orders NaN greatest;
    DuckDB likewise) while Python's is False — the sign bit must replicate the
    engines' rule or the probe scans a different bucket than the index assigned
    (r13 review)."""
    import math

    b = 0
    for p, plane in enumerate(_planes()):
        d = _py_dot(qe, plane)
        if d > 0 or math.isnan(d):
            b |= 1 << p
    return b


def _lsh_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WRITTEN sign-LSH index: (vec_id, embedding, bucket) persisted ONCE as a
    table bucketed by ``bucket`` (``persisted_bucketed``; fingerprinted against
    embeddings.parquet so a driver fixture regeneration rebuilds instead of serving
    stale signatures). Serving filters ``bucket = <query bucket>`` which bucket-prunes
    to a single file — the 8-hyperplane signature pass runs only at build time, never
    per probe."""
    from rubix_spark.sources.bucketing import persisted_bucketed

    def build():
        emb = catalog.table(spark, sf_dir, "embeddings")
        return emb.select("vec_id", "embedding", _lsh_bucket().alias("bucket"))

    return persisted_bucketed(
        spark,
        label="lsh_index",
        source_path=f"{sf_dir.rstrip('/')}/embeddings.parquet",
        build=build,
        bucket_col="bucket",
        n_buckets=32,
    )
_DUCK_PLANES = f"""
    SELECT p.i AS plane, j.i AS dim,
           CAST(CAST(concat('0x', substr(md5(concat(p.i, '_', j.i)), 1, 8)) AS BIGINT) % 1000 - 500 AS DOUBLE) AS w
    FROM (SELECT unnest(generate_series(0, {N_PLANES - 1})) AS i) p,
         (SELECT unnest(generate_series(0, {DIM - 1})) AS i) j
"""


@register(
    "x2_ann_lsh",
    f"""
    WITH planes AS ({_DUCK_PLANES}),
    sigs AS (
        SELECT v.vec_id, pl.plane,
               CASE WHEN SUM(CAST(v.embedding[pl.dim + 1] AS DOUBLE) * pl.w) > 0 THEN 1 ELSE 0 END AS bit
        FROM embeddings v, planes pl
        GROUP BY v.vec_id, pl.plane
    ),
    keys AS (
        SELECT vec_id, SUM(bit * (1 << plane)) AS bucket FROM sigs GROUP BY vec_id
    ),
    q AS (
        SELECT k.bucket AS qb, v.embedding AS qe
        FROM keys k JOIN embeddings v ON v.vec_id = k.vec_id
        WHERE k.vec_id = {QUERY_VEC_ID}
    )
    SELECT v.vec_id, FLOOR(({_duck_cos('v.embedding', 'q.qe')}) * 10000 + 0.5) / 10000.0 AS sim
    FROM keys k JOIN embeddings v ON v.vec_id = k.vec_id, q
    WHERE k.bucket = q.qb
    ORDER BY {_duck_cos('v.embedding', 'q.qe')} DESC, v.vec_id
    LIMIT {TOP_K}
    """,
    doc=(
        "Sign-LSH against the PERSISTED bucket index: 8 md5-derived deterministic "
        "hyperplanes → 8-bit bucket, written once bucketed by bucket id (_lsh_index); "
        "a probe bucket-prunes to the query's single bucket file. Recall is traded "
        "via multi-probe (x2_ann_lsh_multiprobe) — exactness is NOT claimed."
    ),
)
def ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve path reads the written index only: the query's bucket is computed
    driver-side (``_py_bucket`` — exact, see its docstring) from the memoized query
    vector, and the ``bucket = qb`` filter bucket-prunes the scan to ONE of 32 files
    (plan pinned: SelectedBucketsCount 1/32, zero Exchange —
    tests/test_shuffle_ops.py). The signature pass (one projection of 8 literal-vector
    dot folds, no posexplode/plane-join/shuffle) runs only inside the one-time index
    build. Sign bits match the oracle's SUM-based variant bit-for-bit (exact-in-double
    argument in ``_lsh_bucket``'s docstring)."""
    emb = catalog.table(spark, sf_dir, "embeddings")
    _, extras = _ivf_codebook(emb, (QUERY_VEC_ID,), memo_key=sf_dir)
    qe = extras[QUERY_VEC_ID]
    qb = _py_bucket(qe)
    index = _lsh_index(spark, sf_dir)
    sim = cosine_lit("embedding", qe)
    return (
        index.where(F.col("bucket") == F.lit(qb))
        .select("vec_id", sim.alias("_sim"))
        .orderBy(F.col("_sim").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", round_det(F.col("_sim"), 4).alias("sim"))
    )


# ---------------------------------------------------------------------------
# kNN join (many query vectors at once)
# ---------------------------------------------------------------------------
N_QUERIES = 4
KNN_K = 3


@register(
    "x2_knn_join",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
    scored AS (
        SELECT q.qid, v.vec_id,
               {_duck_cos('v.embedding', 'q.qe')} AS s
        FROM embeddings v, q
        WHERE v.vec_id <> q.qid
    )
    SELECT qid, vec_id, FLOOR(s * 10000 + 0.5) / 10000.0 AS sim FROM (
        SELECT qid, vec_id, s,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) AS rn
        FROM scored
    ) WHERE rn <= {KNN_K}
    """,
    doc=(
        "kNN join: top-3 neighbors for each of 4 query vectors in one pass — queries "
        "broadcast against the corpus scan, per-query ranking via window (at scale: "
        "per-partition top-k combine instead of a global window sort)."
    ),
)
def knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = catalog.table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < N_QUERIES).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qe"))
    scored = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine(F.col("embedding"), F.col("qe")).alias("s"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("s").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KNN_K)
        .select("qid", "vec_id", round_det(F.col("s"), 4).alias("sim"))
    )


# ---------------------------------------------------------------------------
# IVF with a trained codebook (k-means||)
# ---------------------------------------------------------------------------
def _trained_kmeans(spark: SparkSession, sf_dir: str):
    """Fit (or fetch) the per-(session, sf_dir) KMeans codebook over ``embeddings``.

    The trained model is the OFFLINE index-build artifact (like the literal codebook of
    x2_ann_ivf) — memoized so probes/clustering queries don't re-fit; the fit itself
    dominates latency otherwise (~3 s vs ~1 s). Returns (model, vecs) where vecs carries
    (vec_id, embedding, features).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    emb = catalog.table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", "embedding", array_to_vector("embedding").alias("features"))
    memo = getattr(spark, "_rubix_kmeans_memo", None)
    if memo is None:
        memo = {}
        spark._rubix_kmeans_memo = memo
    model = memo.get(sf_dir)
    if model is None:
        # cache ONLY for the duration of the (eager) fit: KMeans re-scans its input
        # every iteration — uncached, that is parquet + array_to_vector × maxIter
        # (measured 4× slower). Random init instead of k-means|| skips ~5 extra init
        # passes; codebook quality is equivalent for IVF bucketing. At 100 TB the fit
        # input is additionally a bounded sample (codebooks train on ~256
        # vectors/centroid, not the corpus). Training input is always small, so a
        # handful of partitions beats 32: each KMeans iteration is a job, and
        # tiny-task overhead dominates (measured 3.1s @32p vs 1.3s @8p, 2000 rows).
        train = vecs.coalesce(8).cache()
        try:
            model = KMeans(k=N_CENTROIDS, seed=42, maxIter=5, initMode="random").fit(train)
        finally:
            train.unpersist()
        memo[sf_dir] = model
    return model, vecs


@register(
    "x2_ann_ivf_trained",
    None,  # rows-only: k-means centroids are Spark-internal, not SQL-reproducible
    doc=(
        "IVF with a *trained* codebook: pyspark.ml KMeans (k-means||, fixed seed) learns "
        "16 centroids, vectors are assigned by the model, and the query probes its 4 "
        "nearest centroid buckets — the production build pass the deterministic-centroid "
        "variant (x2_ann_ivf) stands in for. Rows-only gate (centroids depend on MLlib "
        "internals); recall vs exact brute force is asserted in tests."
    ),
)
def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    model, vecs = _trained_kmeans(spark, sf_dir)
    emb = catalog.table(spark, sf_dir, "embeddings")
    assigned = model.transform(vecs).withColumnRenamed("prediction", "cid")

    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cid int, ce array<double>",
    )
    q = emb.where(F.col("vec_id") == QUERY_VEC_ID).select(F.col("embedding").alias("qe"))
    probes = (
        centroids.crossJoin(F.broadcast(q))
        .orderBy(cosine(F.col("ce"), F.col("qe")).desc(), "cid")
        .limit(NPROBE)
        .select("cid")
    )
    sim = cosine(F.col("embedding"), F.col("qe"))
    return (
        assigned.join(F.broadcast(probes), "cid")
        .crossJoin(F.broadcast(q))
        .select("vec_id", sim.alias("_sim"))
        .orderBy(F.col("_sim").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", round_det(F.col("_sim"), 4).alias("sim"))
    )


# ---------------------------------------------------------------------------
# corpus clustering (the curation-side use of the trained codebook)
# ---------------------------------------------------------------------------
@register(
    "x2_corpus_cluster",
    None,  # rows-only: k-means centroids are Spark-internal, not SQL-reproducible
    doc=(
        "Corpus clustering over the embedding column: the trained KMeans codebook "
        "(shared with x2_ann_ivf_trained) partitions the corpus into topical buckets; "
        "output is per-cluster size plus exact min/max member ids (deterministic under "
        "the fixed seed). The curation use: per-cluster sampling caps (domain balance), "
        "cluster-level dedup, and routing clusters to different filtering recipes. At "
        "100 TB assignment is a broadcast-codebook map-side transform — no shuffle "
        "until the per-cluster aggregate, which partial-aggregates."
    ),
)
def corpus_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    model, vecs = _trained_kmeans(spark, sf_dir)
    assigned = model.transform(vecs).withColumnRenamed("prediction", "cid")
    return (
        assigned.groupBy("cid")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("vec_id").alias("min_vec_id"),
            F.max("vec_id").alias("max_vec_id"),
        )
        .orderBy("cid")
    )


# ---------------------------------------------------------------------------
# multi-probe sign-LSH (Hamming-distance<=2 bucket expansion)
# ---------------------------------------------------------------------------
# own bucket + 8 one-bit flips + 28 two-bit flips = 37 of 256 buckets (~14%).
# Radius 1 (9 buckets) measured recall@10 = 0.2 on a clustered fixture with
# neighbor cosine ~0.93 (per-plane agreement p~0.9 ⇒ P(Hamming<=1) ~0.68 of top-k);
# radius 2 lifts the same fixture to >=0.8 while staying sub-linear in probed data.
_PROBE_MASKS = [0] + [1 << p for p in range(N_PLANES)] + [
    (1 << p) | (1 << q) for p in range(N_PLANES) for q in range(p + 1, N_PLANES)
]


@register(
    "x2_ann_lsh_multiprobe",
    f"""
    WITH planes AS ({_DUCK_PLANES}),
    sigs AS (
        SELECT v.vec_id, pl.plane,
               CASE WHEN SUM(CAST(v.embedding[pl.dim + 1] AS DOUBLE) * pl.w) > 0 THEN 1 ELSE 0 END AS bit
        FROM embeddings v, planes pl
        GROUP BY v.vec_id, pl.plane
    ),
    keys AS (
        SELECT vec_id, SUM(bit * (1 << plane)) AS bucket FROM sigs GROUP BY vec_id
    ),
    q AS (
        SELECT k.bucket AS qb, v.embedding AS qe
        FROM keys k JOIN embeddings v ON v.vec_id = k.vec_id
        WHERE k.vec_id = {QUERY_VEC_ID}
    )
    SELECT v.vec_id, FLOOR(({_duck_cos('v.embedding', 'q.qe')}) * 10000 + 0.5) / 10000.0 AS sim
    FROM keys k JOIN embeddings v ON v.vec_id = k.vec_id, q
    WHERE xor(k.bucket, q.qb) IN ({", ".join(str(m) for m in _PROBE_MASKS)})
    ORDER BY {_duck_cos('v.embedding', 'q.qe')} DESC, v.vec_id
    LIMIT {TOP_K}
    """,
    doc=(
        "Multi-probe sign-LSH: candidates = the query's bucket PLUS every bucket within "
        "Hamming distance 2 on the 8-bit signature (37/256 buckets, ~14% of the corpus) "
        "— the standard recall repair for sign-LSH; radius 2 is calibrated against a "
        "clustered fixture to recall@10 >= 0.8 (tests/test_ann.py). Probes the same "
        "PERSISTED index as x2_ann_lsh: the probe set resolves driver-side to a "
        "37-value IN on the bucket key, i.e. 37 bucket reads of the written table — "
        "still no per-probe signature recompute."
    ),
)
def ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = catalog.table(spark, sf_dir, "embeddings")
    _, extras = _ivf_codebook(emb, (QUERY_VEC_ID,), memo_key=sf_dir)
    qe = extras[QUERY_VEC_ID]
    qb = _py_bucket(qe)
    index = _lsh_index(spark, sf_dir)
    sim = cosine_lit("embedding", qe)
    return (
        index.where(F.col("bucket").isin([qb ^ m for m in _PROBE_MASKS]))
        .select("vec_id", sim.alias("_sim"))
        .orderBy(F.col("_sim").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", round_det(F.col("_sim"), 4).alias("sim"))
    )


# ---------------------------------------------------------------------------
# IVF-bucketed kNN join (the batch-queries scale path)
# ---------------------------------------------------------------------------
@register(
    "x2_knn_join_ivf",
    f"""
    WITH cent AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < {N_CENTROIDS}),
    assign AS (
        SELECT vec_id, embedding, cid FROM (
            SELECT v.vec_id, v.embedding, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                                      ORDER BY {_duck_cos('v.embedding', 'c.ce')} DESC, c.cid) AS rn
            FROM embeddings v, cent c
        ) WHERE rn = 1
    ),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
    probes AS (
        SELECT qid, cid FROM (
            SELECT q.qid, c.cid,
                   ROW_NUMBER() OVER (PARTITION BY q.qid
                                      ORDER BY {_duck_cos('c.ce', 'q.qe')} DESC, c.cid) AS rn
            FROM cent c, q
        ) WHERE rn <= {NPROBE}
    ),
    scored AS (
        SELECT q.qid, a.vec_id, {_duck_cos('a.embedding', 'q.qe')} AS s
        FROM assign a JOIN probes p ON a.cid = p.cid JOIN q ON q.qid = p.qid
        WHERE a.vec_id <> q.qid
    )
    SELECT qid, vec_id, FLOOR(s * 10000 + 0.5) / 10000.0 AS sim FROM (
        SELECT qid, vec_id, s,
               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY s DESC, vec_id) AS rn
        FROM scored
    ) WHERE rn <= {KNN_K}
    """,
    doc=(
        "kNN JOIN through IVF buckets — the batch-queries scale path: the corpus reads "
        "the PERSISTED bucketed assignment index (shared with x2_ann_ivf), each query "
        "probes its 4 nearest buckets, and candidates are scored only inside shared "
        "buckets (a broadcast of the tiny (qid,cid) probe map — never queries x corpus; "
        "the union of probed cids bucket-prunes the index scan). "
        "Per-query top-3 via WindowGroupLimit. Approximate by construction; the oracle "
        "restates the identical bucket semantics, so the gate is exact."
    ),
)
def knn_join_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = catalog.table(spark, sf_dir, "embeddings")
    cents, extras = _ivf_codebook(emb, tuple(range(N_QUERIES)), memo_key=sf_dir)
    assign = _ivf_index(spark, sf_dir)
    probe_pairs = [(qid, cid) for qid, qe in extras.items() for cid in _probe_cids(cents, qe)]
    probes = emb.sparkSession.createDataFrame(probe_pairs, "qid bigint, cid int")

    q = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    scored = (
        # the isin duplicate of the join condition is what bucket-prunes the index
        # scan (pruning keys off filters, not join keys); the join then fans out
        # per-query inside the pruned buckets only
        assign.where(F.col("cid").isin(sorted({cid for _, cid in probe_pairs})))
        .join(F.broadcast(probes), "cid")
        .join(F.broadcast(q), "qid")
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", cosine(F.col("embedding"), F.col("qe")).alias("s"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("s").desc(), "vec_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KNN_K)
        .select("qid", "vec_id", round_det(F.col("s"), 4).alias("sim"))
    )


# ---------------------------------------------------------------------------
# random-projection dimensionality reduction (Johnson-Lindenstrauss sketch)
# ---------------------------------------------------------------------------
# The projection matrix is a FIXED seeded draw, embedded as literals in both engines —
# the offline artifact a pipeline versions alongside its embeddings (re-drawing it
# would silently break comparability of sketches across runs). 64→8 dims here; at
# scale the same single-projection expression reduces storage/IO for a coarse ANN
# pre-filter by dim_out/dim_in while JL keeps relative distances within ~(1±eps).
PROJ_DIM = 8


def _proj_matrix() -> list[list[float]]:
    import numpy as np

    rng = np.random.RandomState(7)
    # 1/sqrt(dim_out) scaling keeps expected norms comparable pre/post projection
    m = rng.standard_normal((PROJ_DIM, DIM)) / float(np.sqrt(PROJ_DIM))
    return [[float(x) for x in row] for row in m]


@register(
    "x2_embedding_project",
    f"""
    SELECT vec_id,
           {", ".join(
               "FLOOR(" + DUCK_DOT.format(a="embedding", b="["
                   + ", ".join(repr(x) for x in row) + "]")
               + " * 10000 + 0.5) / 10000.0 AS p" + str(i)
               for i, row in enumerate(_proj_matrix())
           )}
    FROM embeddings
    """,
    doc=(
        "Random-projection dimensionality reduction: each 64-dim embedding is sketched "
        "to 8 dims through a fixed seeded Gaussian matrix (JL transform). One map-only "
        "projection — the matrix constant-folds into 8 literal-vector dot products, no "
        "shuffle, no Python; both engines fold the same sequence of doubles so the "
        "oracle hash-matches at 4 decimals."
    ),
)
def embedding_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = catalog.table(spark, sf_dir, "embeddings")
    rows = _proj_matrix()
    return emb.select(
        "vec_id",
        *[round_det(dot_lit("embedding", row), 4).alias(f"p{i}") for i, row in enumerate(rows)],
    )


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantized ANN (the memory-compression path at 100 TB)
# ---------------------------------------------------------------------------
# At corpus scale the embedding table itself is the bottleneck: 64 float32 dims =
# 256 B/vector; PQ stores M=8 uint8 codes = 8 B (32x smaller), so the scan that feeds
# candidate scoring reads 1/32 of the bytes and the codes for a trillion vectors fit
# where the raw vectors never would (FAISS IVFPQ economics; Jégou et al. 2011,
# "Product Quantization for Nearest Neighbor Search"). Training is a bounded driver
# artifact like the IVF codebook: per-subspace k-means over the first PQ_TRAIN_N
# vectors — deterministic (index-strided init, fixed Lloyd iterations, ties to the
# lower code) so re-runs produce identical codes.
PQ_M = 8          # subspaces (64 dims -> 8 per subspace)
PQ_KS = 16        # codes per subspace (uint8 budget is 256; 16 suffices at this dim)
PQ_TRAIN_N = 512  # training sample (first N by vec_id) — bounded driver artifact
PQ_RERANK = 64    # exact-cosine re-rank depth


def _pq_train(emb: DataFrame, memo_key: str | None = None):
    """Per-subspace codebooks: ndarray [M, KS, dim/M]. Deterministic k-means:
    init = every (n_train/KS)-th training row, 5 Lloyd iterations, argmin ties to the
    lower code. Memoized per (session, sf_dir) — this IS the offline build pass."""
    import numpy as np

    spark = emb.sparkSession
    if memo_key is not None:
        memo = getattr(spark, "_rubix_pq_memo", None)
        if memo is None:
            memo = {}
            spark._rubix_pq_memo = memo
        if memo_key in memo:
            return memo[memo_key]
    rows = (
        emb.where(F.col("vec_id") < PQ_TRAIN_N).select("vec_id", "embedding")
        .orderBy("vec_id").collect()
    )
    # training degrades NULL/off-width rows out of the sample (np.array on a
    # ragged/None collection crashes the index build — r13 review); the modal
    # width is the corpus contract (TESTDATA.md fixed-width embeddings)
    vecs = [r.embedding for r in rows if r.embedding is not None]
    if not vecs:
        raise ValueError("PQ training sample has no usable embeddings")
    from collections import Counter

    width = Counter(len(v) for v in vecs).most_common(1)[0][0]
    x = np.array([v for v in vecs if len(v) == width], dtype=np.float64)
    n, dim = x.shape
    dsub = dim // PQ_M
    books = np.empty((PQ_M, PQ_KS, dsub))
    for m in range(PQ_M):
        xs = x[:, m * dsub:(m + 1) * dsub]
        cents = xs[:: max(1, n // PQ_KS)][:PQ_KS].copy()
        for _ in range(5):
            d2 = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)  # argmin takes the first (lowest) index on ties
            for j in range(PQ_KS):
                sel = xs[assign == j]
                if len(sel):
                    cents[j] = sel.mean(axis=0)
        books[m] = cents
    if memo_key is not None:
        memo[memo_key] = books
    return books


@register(
    "x2_ann_ivfpq",
    None,  # rows-only: float32 k-means training + BLAS order are not SQL-reproducible
    doc=(
        "IVF-PQ approximate nearest neighbor: coarse assignment under the trained "
        "KMeans codebook (the offline artifact shared with x2_ann_ivf_trained) "
        "restricts the scan to NPROBE centroid "
        "buckets; inside them each vector is product-quantized to M=8 uint8 codes and "
        "scored against the query through per-subspace ADC lookup tables (one LUT dot "
        "per code — no float vector math per row); the approximate top-64 re-rank by "
        "exact cosine and the top-10 return. In production the encode step runs ONCE "
        "at ingest and the scan reads 8-byte codes instead of 256-byte vectors (32x "
        "less IO; codebooks+LUTs broadcast). Rows-only gate; recall@10 >= 0.8 vs "
        "exact brute force asserted on the clustered fixture (tests/test_ann.py), "
        "encode determinism asserted by re-run equality."
    ),
)
def ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    emb = catalog.table(spark, sf_dir, "embeddings")
    # coarse stage: the TRAINED codebook (shared offline artifact with
    # x2_ann_ivf_trained) — real IVF-PQ trains both quantizer levels
    model, vecs = _trained_kmeans(spark, sf_dir)
    books = _pq_train(emb, memo_key=sf_dir)
    row = emb.where(F.col("vec_id") == QUERY_VEC_ID).select("embedding").head()
    if row is None:
        raise ValueError(f"embeddings fixture is missing query vec_id {QUERY_VEC_ID}")
    qe = np.array(row.embedding, dtype=np.float64)
    cc = {i: [float(x) for x in c] for i, c in enumerate(model.clusterCenters())}
    probe = _probe_cids(cc, qe.tolist())

    dsub = books.shape[2]
    # ADC tables: lut[m][j] = dot(q_m, codebook[m][j]) -> approx dot(q, x) = sum of lookups
    lut = np.einsum("mkd,md->mk", books, qe.reshape(PQ_M, dsub))

    d_full = PQ_M * dsub

    def score(batches):
        import pyarrow as pa

        for b in batches:
            col = b.column("embedding")
            n = len(col)
            if n == 0:
                continue
            # mapInArrow (round-14): zero-copy gather off the ListArray values
            # buffer (offsets absolute); off-width/NULL rows leave the candidate
            # set (the pandas form crashed on them instead)
            offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            ok = np.diff(offs) == d_full
            if col.null_count:
                ok &= col.is_valid().to_numpy(zero_copy_only=False)
            if not ok.any():
                continue
            flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
            x = flat[offs[:-1][ok][:, None] + np.arange(d_full)[None, :]]
            n = len(x)
            codes = np.empty((n, PQ_M), dtype=np.uint8)
            for m in range(PQ_M):
                xs = x[:, m * dsub:(m + 1) * dsub]
                d2 = ((xs[:, None, :] - books[m][None, :, :]) ** 2).sum(axis=2)
                codes[:, m] = d2.argmin(axis=1)
            approx = lut[np.arange(PQ_M)[None, :], codes].sum(axis=1)
            # per-partition candidate cut: only the local top keeps flowing
            keep = np.argsort(-approx)[:PQ_RERANK]
            yield pa.record_batch(
                {
                    "vec_id": pa.array(
                        b.column("vec_id").to_numpy(zero_copy_only=False)[ok][keep], pa.int64()
                    ),
                    "approx": pa.array(approx[keep], pa.float64()),
                }
            )

    assigned = model.transform(vecs).withColumnRenamed("prediction", "cid")
    cand = (
        assigned.where(F.col("cid").isin([int(c) for c in probe]))
        .select("vec_id", "embedding")
        .mapInArrow(score, schema="vec_id bigint, approx double")
        .orderBy(F.col("approx").desc(), "vec_id")
        .limit(PQ_RERANK)
    )
    # exact re-rank of the surviving candidates (broadcast id list back onto the table)
    sim = cosine_lit("embedding", qe.tolist())
    return (
        emb.join(F.broadcast(cand.select("vec_id")), "vec_id")
        .select("vec_id", sim.alias("_sim"))
        .orderBy(F.col("_sim").desc(), "vec_id")
        .limit(TOP_K)
        .select("vec_id", round_det(F.col("_sim"), 4).alias("sim"))
    )
