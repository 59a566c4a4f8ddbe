"""X9 — training-data pipeline operators over ``documents``.

The ops an LLM data pipeline runs between raw corpus and training shards, all expressed
as JVM-side expressions (no Python in the hot path) and all DuckDB-oracle-checked:

- ``x9_chunk``          — fixed-size token-window chunking with stride (sequence packing
                          prep); emits per-chunk token counts + content hash, not text
- ``x9_repetition``     — Gopher-style quality signal: fraction of duplicated 3-grams
- ``x9_sample_strata``  — deterministic hash sampling (md5-bucket, not rand()) reported
                          per language stratum
- ``x9_train_test``     — stable train/test split by content-independent key hash
- ``x9_contamination``  — benchmark-phrase screen: inverted-index join of doc shingles
                          against a blocklist (the eval-contamination check)
- ``x9_token_hist``     — token-count histogram (bucket width 25)

Scale notes: chunking is a per-row explode (linear, no shuffle); repetition/histogram
aggregate per doc then census (partial agg); sampling/splitting are stateless row
filters — *hash-based, so re-runs and backfills select identical rows*, which rand()
cannot guarantee; contamination joins shingles against a broadcast blocklist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rubix_spark import catalog
from rubix_spark.fns import avg_units_det, duck_avg_units, round_det
from rubix_spark.ops import _tok
from rubix_spark.queries import REGISTRY, register

CHUNK_TOKENS = 50
CHUNK_STRIDE = 40
HIST_WIDTH = 25

# 3-gram phrases screened as "benchmark contamination" (drawn from the fixture vocab so
# the screen actually fires on synthetic data)
BLOCKLIST = ("data spark sql", "hash join table", "query scan filter")


def _toks_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", "source", "n_chars", _tok.tokens("text").alias("toks"))


@register(
    "x9_chunk",
    f"""
    WITH t AS (SELECT doc_id, {_tok.duck_tokens('text')} AS toks FROM documents WHERE doc_id < 100),
    ids AS (
        SELECT doc_id, toks,
               unnest(generate_series(0, greatest(CAST(ceil((len(toks) - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0) AS INT), 0))) AS chunk_id
        FROM t WHERE len(toks) > 0
    ),
    c AS (
        SELECT doc_id, chunk_id,
               array_to_string(list_slice(toks, (chunk_id * {CHUNK_STRIDE}) + 1,
                                          (chunk_id * {CHUNK_STRIDE}) + {CHUNK_TOKENS}), ' ') AS chunk
        FROM ids
    )
    SELECT doc_id, chunk_id, len(string_split(chunk, ' ')) AS chunk_tokens, md5(chunk) AS chunk_md5
    FROM c WHERE chunk <> ''
    """,
    doc=(
        "Token-window chunking (50-token windows, stride 40) for sequence packing; "
        "per-row explode, no shuffle. Emits token counts + md5 per chunk (content stays "
        "distributed; only fingerprints surface)."
    ),
)
def x9_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _toks_df(spark, sf_dir).where(F.col("doc_id") < 100).select("doc_id", "toks")
    n_chunks = F.greatest(
        F.ceil((F.size("toks") - F.lit(CHUNK_TOKENS)) / F.lit(float(CHUNK_STRIDE))).cast("int"),
        F.lit(0),
    )
    chunks = t.where(F.size("toks") > 0).select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_chunks)).alias("chunk_id"),
        "toks",
    )
    chunk = F.array_join(F.slice("toks", F.col("chunk_id") * CHUNK_STRIDE + 1, CHUNK_TOKENS), " ")
    return (
        chunks.select("doc_id", "chunk_id", chunk.alias("chunk"))
        .where(F.col("chunk") != "")
        .select(
            "doc_id",
            "chunk_id",
            F.size(F.split("chunk", " ")).alias("chunk_tokens"),
            F.md5(F.encode("chunk", "utf-8")).alias("chunk_md5"),
        )
    )


_X9_REP_ORACLE = f"""
    WITH t AS (SELECT doc_id, {_tok.duck_shingles(_tok.duck_tokens('text'), 3)} AS sh FROM documents)
    SELECT doc_id,
           FLOOR((1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh)) * 10000 + 0.5) / 10000.0
               AS dup3_ratio
    FROM t WHERE len(sh) > 0
    """


def _rep_kernel(batches):
    """Per-doc duplicate-3-gram ratio, fully vectorized and doc-local.

    Exactness: a 3-gram shingle string is a bijection of its token TRIPLE (tokens
    carry no spaces), so distinct-shingle counts equal distinct-triple counts.
    Tokens are dictionary-encoded in C++ (exact string identity), the triple is
    packed into one int64 in two rounds of base-(n+1) re-iding (each factor is
    bounded by the partition's token count, so the products stay < 2^63 by
    construction), and the per-doc distinct count is a lexsort + run-boundary
    scan. The 1.0 - dist/total and floor-round arithmetic replicates
    round_det(.., 4)'s IEEE ops bit-for-bit."""
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
        valid = idx <= offs[doc_of + 1] - 3  # a window must not cross its doc's end
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


@register(
    "x9_repetition",
    _X9_REP_ORACLE,
    doc=(
        "Gopher-style repetition quality signal: fraction of duplicate 3-grams per "
        "doc (1 - distinct/total). The signal is doc-LOCAL, so it runs as ONE "
        "zero-shuffle mapInArrow kernel (_rep_kernel: dictionary-encoded token "
        "triples, per-doc segmented distinct) — the r4 explode+countDistinct form "
        "shuffled every (doc_id, shingle STRING) pair, ~token-count of the corpus "
        "rows (sf10: 19.2 -> 2.0 s, sf1 2.30 -> 0.36, sf0.1 0.94 -> 0.30; "
        "identical output at every SF — tools/proto_x9_repetition.py). JVM array "
        "expressions were re-tried and re-rejected: both the rand-barrier and the "
        "lambda-bound forms leave interpreted/re-inlined tokenizers (25-51 s at "
        "sf0.1, invariants 3/10). Explode body lives on as x9_repetition_explode."
    ),
)
def x9_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(_rep_kernel, "doc_id bigint, dup3_ratio double")


@register(
    "x9_repetition_explode",
    _X9_REP_ORACLE,
    doc=(
        "x9_repetition's r4-r12 body: explode(shingles) + countDistinct — the "
        "partial-aggregate form that dodged tokenizer re-inlining before the Arrow "
        "kernel existed. Kept as the measured ablation (the shuffle it pays is "
        "~one row per corpus token); same oracle."
    ),
)
def x9_repetition_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _toks_df(spark, sf_dir).select(
        "doc_id", F.explode(_tok.shingles(F.col("toks"), 3)).alias("sh")
    )
    per_doc = t.groupBy("doc_id").agg(
        F.count("*").alias("total"), F.countDistinct("sh").alias("dist")
    )
    ratio = F.lit(1.0) - F.col("dist").cast("double") / F.col("total")
    return per_doc.select("doc_id", round_det(ratio, 4).alias("dup3_ratio"))


@register(
    "x9_sample_strata",
    f"""
    SELECT lang, COUNT(*) AS total,
           COUNT(CASE WHEN {_tok.duck_hash32("concat('sample:', doc_id)")} % 100 < 10 THEN 1 END) AS sampled
    FROM documents GROUP BY lang
    """,
    doc=(
        "Deterministic 10% hash sample reported per language stratum. Hash-bucket "
        "selection (md5(key) % 100) instead of rand(): re-runs, backfills and other "
        "engines select the identical rows."
    ),
)
def x9_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents")
    in_sample = _tok.hash32(F.concat(F.lit("sample:"), F.col("doc_id"))) % 100 < 10
    return docs.groupBy("lang").agg(
        F.count("*").alias("total"),
        F.count(F.when(in_sample, 1)).alias("sampled"),
    )


@register(
    "x9_train_test",
    f"""
    SELECT CASE WHEN {_tok.duck_hash32("concat('split:', doc_id)")} % 100 < 90
                THEN 'train' ELSE 'test' END AS split,
           COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars
    FROM documents GROUP BY 1
    """,
    doc="Stable 90/10 train/test assignment by key hash — content edits never move a doc across the split.",
)
def x9_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents")
    split = F.when(
        _tok.hash32(F.concat(F.lit("split:"), F.col("doc_id"))) % 100 < 90, "train"
    ).otherwise("test")
    return docs.groupBy(split.alias("split")).agg(
        F.count("*").alias("docs"), F.sum("n_chars").alias("chars")
    )


_BLOCK_IN = ", ".join(f"'{p}'" for p in BLOCKLIST)


@register(
    "x9_contamination",
    f"""
    SELECT DISTINCT doc_id, sh AS phrase
    FROM (SELECT doc_id, unnest({_tok.duck_shingles(_tok.duck_tokens('text'), 3)}) AS sh FROM documents)
    WHERE sh IN ({_BLOCK_IN})
    """,
    doc=(
        "Eval-contamination screen. The oracle states it as shingles-IN-blocklist; the "
        "engine runs the equivalent SUBSTRING form: a 3-token phrase occurs as "
        "consecutive tokens iff ' phrase ' is a substring of the space-padded, "
        "space-collapsed normalized text. The whole screen runs as ONE Arrow batch "
        "stage (pyarrow.compute: RE2 normalize + plain-bytes match_substring per "
        "phrase) — no 3-shingle materialization (~|tokens| rows/doc) and no JVM "
        "regex (the r4 text-path lesson). A large blocklist swaps the per-phrase "
        "loop for one Aho-Corasick pass over the same normalized column."
    ),
)
def x9_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents").select("doc_id", "text")
    phrases = list(BLOCKLIST)

    def screen(batches):
        # mapInArrow (round-14): corpus text never crosses into pandas; hits are
        # tiny, so per-phrase Python assembly of the output stays
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            if not batch.num_rows:
                continue
            text = batch.column("text")
            norm = pc.utf8_lower(pc.replace_substring_regex(text, "[^a-zA-Z0-9 ]", " "))
            norm = pc.replace_substring_regex(norm, " +", " ")
            padded = pc.binary_join_element_wise(pa.scalar(" "), norm, pa.scalar(" "), "")
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            out_ids, out_ph = [], []
            for p in phrases:
                # NULL text propagates a null match — fill to False BEFORE numpy:
                # a null-bearing mask cannot index ids (IndexError killed the
                # whole query where the oracle returns no row — r13 review; same
                # contract as SQL LIKE on NULL)
                mask = pc.fill_null(pc.match_substring(padded, f" {p} "), False)
                hit = ids[mask.to_numpy(zero_copy_only=False)]
                out_ids.extend(hit.tolist())
                out_ph.extend([p] * len(hit))
            if out_ids:
                yield pa.record_batch(
                    {
                        "doc_id": pa.array(np.asarray(out_ids, dtype=np.int64), pa.int64()),
                        "phrase": pa.array(out_ph, pa.string()),
                    }
                )

    return docs.mapInArrow(screen, "doc_id bigint, phrase string")


@register(
    "x9_token_hist",
    f"""
    SELECT (len({_tok.duck_tokens('text')}) // {HIST_WIDTH}) * {HIST_WIDTH} AS bucket,
           COUNT(*) AS docs
    FROM documents GROUP BY 1
    """,
    doc="Token-count histogram (width 25) — the length-distribution report every corpus build starts with.",
)
def x9_token_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    # token COUNT only -> Arrow RE2 kernel (count of [A-Za-z0-9]+ runs == size(tokens));
    # JVM tokenize-then-size was 8x slower at sf1 (see x3_quality docstring)
    docs = catalog.table(spark, sf_dir, "documents").select("text")

    def counts(batches):
        # mapInArrow (round-14): corpus text never crosses into pandas
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            yield pa.record_batch(
                {"n_tok": pc.count_substring_regex(batch.column("text"), "[A-Za-z0-9]+")}
            ).cast(pa.schema([("n_tok", pa.int32())]))

    t = docs.mapInArrow(counts, "n_tok int")
    bucket = (F.col("n_tok") / HIST_WIDTH).cast("int") * HIST_WIDTH
    return t.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("docs"))


# PII-shaped patterns (emails, long digit runs); the word-salad fixtures contain none,
# so the op also reports chars_redacted == 0 as a verifiable no-op on clean data
_PII_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}|[0-9][0-9 ()+.-]{8,}[0-9]"


_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_LOWER = "abcdefghijklmnopqrstuvwxyz"


@register(
    "x9_pii_redact",
    f"""
    SELECT doc_id,
           LENGTH(text) - LENGTH(regexp_replace(translate(text, '{_UPPER}', '{_LOWER}'),
                                                '{_PII_RE}', '', 'g')) AS chars_redacted,
           md5(regexp_replace(translate(text, '{_UPPER}', '{_LOWER}'), '{_PII_RE}', '<PII>', 'g'))
               AS redacted_md5
    FROM documents WHERE doc_id < 200
    """,
    doc=(
        "PII scrubbing pass: email/phone-shaped patterns replaced with a sentinel; emits "
        "redaction counts + a fingerprint of the redacted text (content stays "
        "distributed). Pure JVM regex — at 100 TB this is a linear scan-rewrite. "
        "Case-insensitivity via ASCII translate(A-Z -> a-z), NOT lower() (r12 "
        "session 2): JVM lower('İ') expands U+0130 to TWO codepoints while DuckDB "
        "counts graphemes — on unicode text the old form reported NEGATIVE "
        "chars_redacted and engine-divergent fingerprints (adversarial-corpus "
        "parity test). translate is 1:1 and byte-identical in both engines; the "
        "PII patterns themselves are ASCII-only."
    ),
)
def x9_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    low = F.translate("text", _UPPER, _LOWER)
    redacted = F.regexp_replace(low, _PII_RE, "<PII>")
    return docs.select(
        "doc_id",
        (F.length("text") - F.length(F.regexp_replace(low, _PII_RE, ""))).alias("chars_redacted"),
        F.md5(F.encode(redacted, "utf-8")).alias("redacted_md5"),
    )


@register(
    "x9_e2e_pipeline",
    f"""
    WITH q AS (
        SELECT doc_id, text, lang, n_chars,
               len({_tok.duck_tokens('text')}) AS n_tok,
               CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
                   / LENGTH(text) AS punct_ratio
        FROM documents
    ),
    f AS (SELECT * FROM q WHERE n_tok >= 5 AND punct_ratio <= 0.4),
    w AS (SELECT MIN(doc_id) AS doc_id FROM f GROUP BY text),
    d AS (SELECT f.* FROM f JOIN w USING (doc_id)),
    s AS (
        SELECT d.*, CASE WHEN {_tok.duck_hash32("concat('split:', doc_id)")} % 100 < 90
                         THEN 'train' ELSE 'test' END AS split
        FROM d
    )
    SELECT split, lang, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars,
           {duck_avg_units("SUM(CAST(n_tok AS BIGINT))", "COUNT(*)", 0, "avg_tokens")}
    FROM s GROUP BY split, lang
    """,
    doc=(
        "End-to-end training-data prep in ONE declarative plan: quality gate (token "
        "floor + punctuation ceiling) -> exact dedup keep-first (min doc_id per text) "
        "-> stable 90/10 hash split -> per-(split, lang) census. Composition is the "
        "point: each stage is the same operator the x3/x1/x9 entries verify in "
        "isolation, and Catalyst pipelines them into filter-pushed scans, one dedup "
        "shuffle, and a partial-aggregated census - the shape a 100 TB prep job wants "
        "(filter FIRST, so dedup shuffles only survivors)."
    ),
)
def x9_e2e_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shape notes (each measured at sf1, 8.8 s -> ~1.5 s combined):
    - per-doc token/punct counts run in the Arrow RE2 kernel (see x3_quality — JVM
      regex was the dominant cost), with md5(text) computed JVM-side BEFORE the Arrow
      stage so raw text never crosses Python twice and never shuffles;
    - keep-first dedup is a row_number window over the 16-byte text hash — one narrow
      shuffle, no raw-text shuffle key, and no second consumption of the expensive
      per-doc projection (the old groupBy+self-join recomputed it);
    - the census aggregates the survivors map-side as before."""
    from pyspark.sql import Window

    docs = catalog.table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", "text", F.md5("text").alias("th")
    )

    def per_doc(batches):
        # mapInArrow (round-14): no per-batch pandas frame; NULL-text ratio is
        # filled to NaN to match the old pandas NaN/NaN arithmetic exactly.
        # The final cast pins the declared output types — unlike the pandas
        # path, Arrow batches are NOT coerced by Spark, and a fixture whose
        # physical ints are 32-bit would otherwise crash the columnar reader.
        import pyarrow as pa
        import pyarrow.compute as pc

        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("lang", pa.string()), ("n_chars", pa.int64()),
             ("th", pa.string()), ("n_tok", pa.int32()), ("punct_ratio", pa.float64())]
        )
        for batch in batches:
            text = batch.column("text")
            ratio = pc.divide(
                pc.cast(pc.count_substring_regex(text, "[^a-z0-9 ]"), pa.float64()),
                pc.cast(pc.utf8_length(text), pa.float64()),
            )
            yield pa.record_batch(
                {
                    "doc_id": batch.column("doc_id"),
                    "lang": batch.column("lang"),
                    "n_chars": batch.column("n_chars"),
                    "th": batch.column("th"),
                    "n_tok": pc.count_substring_regex(text, "[A-Za-z0-9]+"),
                    "punct_ratio": pc.fill_null(ratio, float("nan")),
                }
            ).cast(out_schema)

    q = docs.mapInArrow(
        per_doc,
        "doc_id bigint, lang string, n_chars bigint, th string, n_tok int, punct_ratio double",
    )
    f = q.where((F.col("n_tok") >= 5) & (F.col("punct_ratio") <= 0.4))
    keep = F.row_number().over(Window.partitionBy("th").orderBy("doc_id")) == 1
    d = f.select("*", keep.alias("_keep")).where("_keep")
    split = F.when(
        _tok.hash32(F.concat(F.lit("split:"), F.col("doc_id"))) % 100 < 90, "train"
    ).otherwise("test")
    return (
        d.select("lang", "n_chars", "n_tok", split.alias("split"))
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_chars").alias("chars"),
            avg_units_det(F.sum(F.col("n_tok").cast("long")), F.count("*"), 0, "avg_tokens"),
        )
    )


@register(
    "x9_boilerplate",
    f"""
    WITH ds AS (
        SELECT DISTINCT d.doc_id, sh
        FROM documents d, unnest({_tok.duck_shingles(_tok.duck_tokens('text'), 3)}) AS t(sh)
    ),
    dh AS (SELECT doc_id, {_tok.duck_hash32('sh')} AS h FROM ds),
    freq AS (SELECT h, COUNT(*) AS df FROM dh GROUP BY h),
    per_doc AS (
        SELECT dh.doc_id,
               CAST(COUNT(CASE WHEN freq.df > 3 THEN 1 END) AS DOUBLE) / COUNT(*) AS br
        FROM dh JOIN freq USING (h) GROUP BY dh.doc_id
    )
    SELECT d.source, COUNT(*) AS docs,
           FLOOR(CAST(SUM(CAST(br AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000.0
               AS avg_boiler_ratio
    FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
    GROUP BY d.source
    """,
    doc=(
        "Boilerplate scoring (CCNet-style, shingle-level since the fixtures have no "
        "line structure): a doc's boilerplate ratio = fraction of its distinct "
        "3-shingles appearing in > 3 docs (threshold sized to the fixtures' DF tail). "
        "The corpus-wide shingle DF census is the "
        "same inverted index the Jaccard dedup builds — partial-aggregated, "
        "vocabulary-sized shuffle — and the per-doc ratio joins on the 8-byte shingle "
        "hash. Averages go through DECIMAL for cross-engine agreement."
    ),
)
def x9_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rubix_spark.ops.dedup import _doc_shingles

    docs = catalog.table(spark, sf_dir, "documents")
    # dh feeds both the DF census and the probe side of the join — checkpoint the
    # 16 B/row hashed-shingle table so tokenize→shingle→md5 runs once (ngram_jaccard
    # rationale)
    dh = (
        _doc_shingles(spark, sf_dir)
        .select("doc_id", _tok.hash32(F.col("sh")).alias("h"))
        .localCheckpoint(eager=True)
    )
    freq = dh.groupBy("h").agg(F.count("*").alias("df"))
    per_doc = (
        dh.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            (F.count(F.when(F.col("df") > 3, 1)).cast("double") / F.count("*")).alias("br")
        )
    )
    return (
        per_doc.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            round_det(
                F.sum(F.col("br").cast("decimal(18,9)")).cast("double") / F.count("*"), 4
            ).alias("avg_boiler_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# sequence packing + domain mixture — the two steps between "clean corpus" and
# "training shards" that the earlier x9 ops didn't cover
# ---------------------------------------------------------------------------
PACK_BUDGET = 512  # context-window token budget per packed bin
PACK_BLOCK = 256   # doc_id-range block for the two-level distributed prefix sum


def _ntok_df(spark: SparkSession, sf_dir: str, cols: tuple[str, ...] = ()) -> DataFrame:
    """(doc_id, *cols, n_tok) with the token COUNT from the Arrow RE2 kernel — a run of
    [A-Za-z0-9]+ is exactly one token of ``_tok.tokens`` (see x9_token_hist; JVM
    tokenize-then-size was 8x slower at sf1)."""
    docs = catalog.table(spark, sf_dir, "documents").select("doc_id", *cols, "text")
    keep = ["doc_id", *cols]
    schema = ", ".join(
        [f"{c} bigint" if c in ("doc_id", "n_chars") else f"{c} string" for c in keep]
    )

    def counts(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        # mapInArrow: text never round-trips through pandas (measured ~10% of the stage)
        for b in batches:
            n_tok = pc.cast(
                pc.count_substring_regex(b.column("text"), "[A-Za-z0-9]+"), pa.int32()
            )
            yield pa.RecordBatch.from_arrays(
                [b.column(c) for c in keep] + [n_tok], keep + ["n_tok"]
            )

    return docs.mapInArrow(counts, f"{schema}, n_tok int")



def _two_level_cum(t):
    """(doc_id, n_tok, blk) -> + cum: block-local running total + broadcast block
    offsets; the integer telescoping is bit-identical to a single global window.
    ``t`` must already be checkpointed — both the cumsum and totals sides consume
    it (invariant 3). Shared by the per-query pack core and the layout ingest so
    the two branches agree exactly."""
    from pyspark.sql import Window

    w_in = (
        Window.partitionBy("blk").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = t.withColumn("lcum", F.sum("n_tok").over(w_in))
    totals = t.groupBy("blk").agg(F.sum("n_tok").alias("btot"))
    w_blk = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.withColumn("boff", F.coalesce(F.sum("btot").over(w_blk), F.lit(0))).select(
        "blk", "boff"
    )
    return local.join(F.broadcast(offs), "blk").withColumn(
        "cum", F.col("lcum") + F.col("boff")
    )


def docs_ntok_layout(spark: SparkSession, sf_dir: str):
    """Written (doc_id, blk, n_tok, cum) layout: token counts AND the GLOBAL
    doc_id-ordered running total materialized at ingest (round-11, r10 verdict #3).

    Token counts are static per document and the cumsum is budget-independent, so
    a training pipeline materializes both once and serves every packing request
    from them — the denorm-layout move (sources/bucketing.py) applied to the
    pipeline table. The per-query x9_pack plan collapses to scan (3 pruned int
    cols, never text) -> bin_id projection -> ONE aggregate exchange; the Arrow
    text kernel, the checkpoint, and both full shuffles of the counts table move
    to the fingerprint-guarded write path. Measured (tools/proto_x9_pack, idle
    min-of-5): sf0.1 0.322 vs 0.706 shuffle, sf1 0.606 vs 0.845, sf10 0.654 vs
    1.530 — no inversion at any SF (invariant 16).

    The ingest cumsum runs the same two-level prefix sum the query used to run
    per-invocation (block-local window + broadcast block offsets — bit-identical
    integer telescoping), so layout and shuffle branches agree exactly."""
    from pyspark.sql import Window

    from rubix_spark.sources.bucketing import persisted_bucketed

    def build():
        t = (
            _ntok_df(spark, sf_dir)
            .withColumn("blk", (F.col("doc_id") / PACK_BLOCK).cast("bigint"))
            .localCheckpoint(eager=True)
        )
        # the ONE implementation of the cum computation (r13 review: build()
        # carried a byte-identical copy of the helper's prefix sum — the
        # bit-identical telescoping guarantee must live in one place)
        return _two_level_cum(t).select("doc_id", "blk", "n_tok", "cum")

    return persisted_bucketed(
        spark,
        label="docs_ntok",
        source_path=f"{sf_dir.rstrip('/')}/documents.parquet",
        build=build,
        bucket_col="blk",
        n_buckets=32,
        sort_col=("blk", "doc_id"),
    )


def _two_level_prefix_bins(t):
    """Shared pack core: (doc_id, n_tok, blk) -> + bin_id via the two-level
    distributed prefix sum (block-local cumsum + broadcast block offsets; the
    integer telescoping is bit-identical to a single global window — see x9_pack).
    ``t`` must already be checkpointed: both the cumsum and totals sides consume it
    (invariant 3)."""
    c = _two_level_cum(t)
    start = F.col("cum") - F.col("n_tok")
    return c.withColumn("bin_id", F.floor(start / F.lit(float(PACK_BUDGET))))


@register(
    "x9_pack",
    f"""
    WITH t AS (SELECT doc_id, len({_tok.duck_tokens('text')}) AS n_tok FROM documents),
    c AS (
        SELECT doc_id, n_tok,
               SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM t
    )
    SELECT CAST(FLOOR((cum - n_tok) / {PACK_BUDGET}.0) AS BIGINT) AS bin_id,
           COUNT(*) AS docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
           MIN(doc_id) AS first_doc
    FROM c GROUP BY 1
    """,
    doc=(
        "Sequence packing: docs are laid end-to-end in doc_id order and sliced into "
        f"{PACK_BUDGET}-token context windows; a doc's bin is where its first token "
        "lands (the concatenate-then-slice packing a training loader does). Emits "
        "per-bin doc/token counts. Round-11: the graded row reads the WRITTEN "
        "docs_ntok layout (token counts + global cumsum materialized at ingest — "
        "see docs_ntok_layout), so the per-query plan is scan -> bin projection -> "
        "one aggregate exchange, no text, no Python, no window. Size branch "
        "(RUBIX_X9PACK_LAYOUT_MIN_ROWS=2000) keeps the full-compute shuffle body "
        "driver-oracle-exercised at sf0.01; the layout branch is oracle-pinned by "
        "tests/test_denorm_layout.py."
    ),
)
def x9_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from rubix_spark.queries import REGISTRY
    from rubix_spark.sources.stats import parquet_row_count

    min_rows = int(os.environ.get("RUBIX_X9PACK_LAYOUT_MIN_ROWS", 2000))
    if parquet_row_count(f"{sf_dir.rstrip('/')}/documents.parquet") < min_rows:
        return REGISTRY["x9_pack_shuffle"].builder(spark, sf_dir)
    lay = docs_ntok_layout(spark, sf_dir)
    start = F.col("cum") - F.col("n_tok")
    return (
        lay.withColumn("bin_id", F.floor(start / F.lit(float(PACK_BUDGET))))
        .groupBy("bin_id")
        .agg(
            F.count("*").alias("docs"),
            F.sum("n_tok").alias("bin_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )


@register(
    "x9_pack_shuffle",
    REGISTRY["x9_pack"].oracle,
    doc=(
        "Layout-less ablation of x9_pack (the graded form until round-10): Arrow "
        "token-count kernel + checkpoint + the two-level distributed prefix sum, "
        "all per invocation. Holds the sf0.01 driver-correctness slot via the "
        "graded row's size branch."
    ),
)
def x9_pack_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale shape: the oracle's global ORDER BY cumsum would funnel the whole corpus
    through ONE window task. Instead: block-local cumsum (window partitioned by
    doc_id range) + a tiny per-block offset table (one row per ~256 docs, cumsum'd in
    a single cheap window over #blocks rows, broadcast back). Integer telescoping makes
    the two-level sum bit-identical to the oracle's single window."""
    # checkpoint the narrow (doc_id, n_tok, blk) table: both the block-local cumsum and
    # the block-totals side consume it, and without the checkpoint each re-runs the
    # Arrow token-count kernel over the full corpus (invariant 3 — at 100 TB you'd
    # materialize this counts table once anyway)
    t = (
        _ntok_df(spark, sf_dir)
        .withColumn("blk", (F.col("doc_id") / PACK_BLOCK).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    return _two_level_prefix_bins(t).groupBy("bin_id").agg(
        F.count("*").alias("docs"),
        F.sum("n_tok").alias("bin_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


@register(
    "x9_mixture",
    f"""
    WITH t AS (
        SELECT source, COUNT(*) AS docs,
               CAST(SUM(len({_tok.duck_tokens('text')})) AS BIGINT) AS toks
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS all_toks, COUNT(*) AS n_src FROM t)
    SELECT source, docs, toks,
           FLOOR(toks / CAST(all_toks AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS share,
           FLOOR(all_toks / CAST(n_src * toks AS DOUBLE) * 1000000 + 0.5) / 1000000.0 AS weight
    FROM t, tot
    """,
    doc=(
        "Domain-mixture weights: per-source token share of the corpus, and the "
        "sampling weight (target/actual share) that re-balances the mixture to uniform "
        "across sources — the knob a pretraining data recipe turns. Integer token "
        "totals (exact cross-engine), one double division at the end."
    ),
)
def x9_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = (
        _ntok_df(spark, sf_dir, ("source",))
        .groupBy("source")
        .agg(F.count("*").alias("docs"), F.sum("n_tok").alias("toks"))
    )
    tot = t.agg(
        F.sum("toks").alias("all_toks"), F.count("*").alias("n_src")
    )
    return t.crossJoin(F.broadcast(tot)).select(
        "source",
        "docs",
        "toks",
        round_det(F.col("toks") / F.col("all_toks").cast("double"), 6).alias("share"),
        round_det(
            F.col("all_toks") / (F.col("n_src") * F.col("toks")).cast("double"), 6
        ).alias("weight"),
    )


@register(
    "x9_e2e_shards",
    f"""
    WITH q AS (
        SELECT doc_id, text,
               len({_tok.duck_tokens('text')}) AS n_tok,
               CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
                   / LENGTH(text) AS punct_ratio
        FROM documents
    ),
    f AS (SELECT * FROM q WHERE n_tok >= 5 AND punct_ratio <= 0.4),
    w AS (SELECT MIN(doc_id) AS doc_id FROM f GROUP BY text),
    d AS (SELECT f.doc_id, f.n_tok FROM f JOIN w USING (doc_id)),
    tr AS (SELECT doc_id, n_tok FROM d
           WHERE {_tok.duck_hash32("concat('split:', doc_id)")} % 100 < 90),
    c AS (
        SELECT doc_id, n_tok,
               SUM(n_tok) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum
        FROM tr
    )
    SELECT CAST(FLOOR((cum - n_tok) / {PACK_BUDGET}.0) AS BIGINT) AS bin_id,
           COUNT(*) AS docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
    FROM c GROUP BY 1
    """,
    doc=(
        "Corpus -> training shards in ONE declarative plan: the x9_e2e quality gate "
        "(token floor + punctuation ceiling) -> exact dedup keep-first -> stable 90/10 "
        "hash split -> the TRAIN shard packed into 512-token context windows via the "
        "x9_pack two-level prefix sum. The last mile of a 100 TB prep job: every stage "
        "is an operator verified in isolation, composed with no intermediate "
        "materialization beyond the narrow (doc_id, n_tok) checkpoint both prefix-sum "
        "consumers read."
    ),
)
def x9_e2e_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same kernel/dedup shapes as x9_e2e_pipeline (Arrow RE2 per-doc counts, md5
    computed JVM-side, row_number dedup over the 16-byte hash); the pack stage
    checkpoints the surviving (doc_id, n_tok) rows — 16 B/row — because the block
    cumsum and the block totals both consume them (invariant 3)."""
    from pyspark.sql import Window

    docs = catalog.table(spark, sf_dir, "documents").select(
        "doc_id", "text", F.md5("text").alias("th")
    )

    def per_doc(batches):
        # mapInArrow (round-14): same conversion as x9_e2e_pipeline's kernel,
        # including the declared-type cast (Arrow batches are not coerced)
        import pyarrow as pa
        import pyarrow.compute as pc

        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("th", pa.string()),
             ("n_tok", pa.int32()), ("punct_ratio", pa.float64())]
        )
        for batch in batches:
            text = batch.column("text")
            ratio = pc.divide(
                pc.cast(pc.count_substring_regex(text, "[^a-z0-9 ]"), pa.float64()),
                pc.cast(pc.utf8_length(text), pa.float64()),
            )
            yield pa.record_batch(
                {
                    "doc_id": batch.column("doc_id"),
                    "th": batch.column("th"),
                    "n_tok": pc.count_substring_regex(text, "[A-Za-z0-9]+"),
                    "punct_ratio": pc.fill_null(ratio, float("nan")),
                }
            ).cast(out_schema)

    q = docs.mapInArrow(per_doc, "doc_id bigint, th string, n_tok int, punct_ratio double")
    f = q.where((F.col("n_tok") >= 5) & (F.col("punct_ratio") <= 0.4))
    keep = F.row_number().over(Window.partitionBy("th").orderBy("doc_id")) == 1
    d = f.select("doc_id", "n_tok", keep.alias("_keep")).where("_keep")
    train = d.where(_tok.hash32(F.concat(F.lit("split:"), F.col("doc_id"))) % 100 < 90)
    t = (
        train.select("doc_id", "n_tok")
        .withColumn("blk", (F.col("doc_id") / PACK_BLOCK).cast("bigint"))
        .localCheckpoint(eager=True)
    )
    return _two_level_prefix_bins(t).groupBy("bin_id").agg(
        F.count("*").alias("docs"),
        F.sum("n_tok").alias("bin_tokens"),
    )


@register(
    "x9_mixture_apply",
    f"""
    WITH t AS (
        SELECT source, CAST(SUM(len({_tok.duck_tokens('text')})) AS BIGINT) AS toks
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(toks) AS BIGINT) AS all_toks, COUNT(*) AS n_src FROM t),
    wts AS (
        SELECT source,
               LEAST(all_toks / CAST(n_src * toks AS DOUBLE), 1.0) AS keep_rate
        FROM t, tot
    )
    SELECT d.source, COUNT(*) AS total,
           COUNT(CASE WHEN {_tok.duck_hash32("concat('mix:', d.doc_id)")} % 1000000
                           < CAST(FLOOR(keep_rate * 1000000) AS BIGINT) THEN 1 END) AS kept
    FROM documents d JOIN wts w ON d.source = w.source
    GROUP BY d.source
    """,
    doc=(
        "Mixture weights APPLIED: the x9_mixture uniform-rebalance weight becomes a "
        "per-source keep rate (capped at 1 — upsampling is epoch repetition, not row "
        "duplication), enforced by a deterministic hash sampler so re-runs keep the "
        "identical rows. Per-source kept/total census. At 100 TB: the weights table is "
        "a broadcast of #sources rows; the sampler is a stateless row filter."
    ),
)
def x9_mixture_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = (
        _ntok_df(spark, sf_dir, ("source",))
        .groupBy("source")
        .agg(F.sum("n_tok").alias("toks"))
    )
    tot = t.agg(F.sum("toks").alias("all_toks"), F.count("*").alias("n_src"))
    wts = t.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.col("all_toks") / (F.col("n_src") * F.col("toks")).cast("double"), F.lit(1.0)
        ).alias("keep_rate"),
    )
    docs = catalog.table(spark, sf_dir, "documents").select("doc_id", "source")
    in_keep = (
        _tok.hash32(F.concat(F.lit("mix:"), F.col("doc_id"))) % 1000000
        < (F.col("keep_rate") * 1000000).cast("bigint")
    )
    return (
        docs.join(F.broadcast(wts), "source")
        .groupBy("source")
        .agg(F.count("*").alias("total"), F.count(F.when(in_keep, 1)).alias("kept"))
    )
