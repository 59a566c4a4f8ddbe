"""X3 — text analysis over the ``documents`` table.

- per-language corpus stats (``x3_text_stats``)
- token frequency census via explode (``x3_token_stats``)
- token counting, whitespace + regex "BPE-ish" piece count (``x3_token_count``)
- language-ID n-gram/marker heuristic (``x3_langid``)
- quality scoring: length / punctuation / stopword ratios (``x3_quality``)
- document fingerprinting: min-hash-of-shingles rolling fingerprint (``x3_fingerprint``)

Everything is built-in expression API (JVM-side, codegen'd); the only shuffles are the
final groupBys, which aggregate map-side first. At 100 TB the explode-based token census
benefits from partial aggregation exactly the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rubix_spark import catalog
from rubix_spark.fns import avg_units_det, duck_avg_units, duck_round, round_det
from rubix_spark.ops import _tok
from rubix_spark.queries import REGISTRY, register

STOPWORDS = ("the", "a", "of", "and", "to", "in")
_MARKERS = {"en": "the", "fr": "le", "de": "der", "es": "el", "zh": "zh"}


@register(
    "x3_text_stats",
    f"""
    SELECT lang, COUNT(*) AS docs,
           {duck_avg_units("SUM(CAST(n_chars AS BIGINT))", "COUNT(*)", 0, "avg_chars")},
           MAX(LENGTH(text)) AS max_len
    FROM documents GROUP BY lang
    """,
    doc="Per-language corpus stats; exact integer sums, so engines agree bit-for-bit.",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").alias("docs"),
        # round-8: exact integer average (fns.avg_units_det) — the count sum never
        # rides a double, cross-engine exact at any corpus size
        avg_units_det(F.sum(F.col("n_chars").cast("long")), F.count("*"), 0, "avg_chars"),
        F.max(F.length("text")).alias("max_len"),
    )


@register(
    "x3_token_stats",
    f"""
    SELECT tok, COUNT(*) AS cnt
    FROM (SELECT unnest({_tok.duck_tokens('text')}) AS tok FROM documents)
    GROUP BY tok HAVING COUNT(*) >= 10
    """,
    doc="Vocabulary census: explode(tokens) → groupBy(token). Partial agg makes the shuffle proportional to vocab, not corpus.",
)
def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow kernel partial-count: tokenize + value_counts per batch in C++, emit
    # (tok, partial cnt) — the shuffle carries vocab×batches rows, not corpus×tokens
    # (the explode plan shuffled ~10M rows at sf1; this is the map-side-combine the
    # docstring promises, just executed in the Arrow stage)
    docs = catalog.table(spark, sf_dir, "documents").select("text")

    def partial_counts(batches):
        # mapInArrow (round-14): vocabulary strings stay Arrow end-to-end
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column("text")
            norm = pc.utf8_lower(pc.replace_substring_regex(text, "[^a-zA-Z0-9 ]", " "))
            toks = pc.split_pattern(norm, " ").flatten()
            counts = pc.value_counts(toks)
            toks_u, cnt = counts.field("values"), counts.field("counts")
            keep = pc.not_equal(toks_u, "")
            yield pa.record_batch(
                {"tok": toks_u.filter(keep), "cnt": cnt.filter(keep)}
            ).cast(pa.schema([("tok", pa.string()), ("cnt", pa.int64())]))

    partial = docs.mapInArrow(partial_counts, "tok string, cnt long")
    return (
        partial.groupBy("tok")
        .agg(F.sum("cnt").alias("cnt"))
        .where(F.col("cnt") >= 10)
    )


@register(
    "x3_token_count",
    f"""
    SELECT doc_id,
           len({_tok.duck_tokens('text')}) AS ws_tokens,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS bpeish_tokens,
           LENGTH(text) AS n_chars_m
    FROM documents
    """,
    doc="Per-doc token counts: whitespace tokens + a BPE-ish regex piece count (letters runs / digit runs / symbols).",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    # both counts via the Arrow RE2 kernel (count_substring_regex); the JVM
    # regexp_extract_all path materialized every match just to take size()
    docs = catalog.table(spark, sf_dir, "documents").select("doc_id", "text")

    def counts(batches):
        # mapInArrow (round-14): all outputs are numeric Arrow arrays — no
        # pandas frame construction per batch
        import pyarrow as pa
        import pyarrow.compute as pc

        out_schema = pa.schema(
            [("doc_id", pa.int64()), ("ws_tokens", pa.int32()),
             ("bpeish_tokens", pa.int32()), ("n_chars_m", pa.int32())]
        )
        for batch in batches:
            text = batch.column("text")
            low = pc.utf8_lower(text)
            yield pa.record_batch(
                {
                    "doc_id": batch.column("doc_id"),
                    "ws_tokens": pc.count_substring_regex(text, "[A-Za-z0-9]+"),
                    "bpeish_tokens": pc.count_substring_regex(
                        low, r"[a-z]+|[0-9]+|[^a-z0-9\s]"
                    ),
                    "n_chars_m": pc.utf8_length(text),
                }
            ).cast(out_schema)

    return docs.mapInArrow(
        counts, "doc_id bigint, ws_tokens int, bpeish_tokens int, n_chars_m int"
    )


_MARKER_CASE = " ".join(
    f"WHEN ' ' || text || ' ' LIKE '% {w} %' THEN '{lang}'" for lang, w in _MARKERS.items()
)


@register(
    "x3_langid",
    f"""
    SELECT lang, lang_pred, COUNT(*) AS n
    FROM (SELECT lang, CASE {_MARKER_CASE} ELSE 'und' END AS lang_pred FROM documents)
    GROUP BY lang, lang_pred
    """,
    doc=(
        "Marker-token language-ID heuristic (first matching language marker wins), reported "
        "as a lang × lang_pred confusion census. Pure expression work — no shuffle until the "
        "tiny census groupBy."
    ),
)
def langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    expr = None
    for lang, w in _MARKERS.items():
        cond = padded.like(f"% {w} %")
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    pred = expr.otherwise("und")
    return (
        docs.select("lang", pred.alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
    )


_STOP_IN = ", ".join(f"'{w}'" for w in STOPWORDS)


def _quality_rollup(per_doc: DataFrame) -> DataFrame:
    return per_doc.groupBy("source").agg(
        F.count("*").alias("docs"),
        avg_units_det(F.sum(F.col("n_tok").cast("long")), F.count("*"), 0, "avg_tokens"),
        round_det(F.sum(F.col("stop_ratio").cast("decimal(18,9)")).cast("double") / F.count("*"), 4).alias("avg_stop_ratio"),
        round_det(F.sum(F.col("punct_ratio").cast("decimal(18,9)")).cast("double") / F.count("*"), 4).alias("avg_punct_ratio"),
    )



@register(
    "x3_quality",
    f"""
    WITH per_doc AS (
        SELECT source,
               len({_tok.duck_tokens('text')}) AS n_tok,
               CAST(len(list_filter({_tok.duck_tokens('text')}, x -> x IN ({_STOP_IN}))) AS DOUBLE)
                   / NULLIF(len({_tok.duck_tokens('text')}), 0) AS stop_ratio,
               CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS DOUBLE)
                   / LENGTH(text) AS punct_ratio
        FROM documents
    )
    SELECT source, COUNT(*) AS docs,
           {duck_avg_units("SUM(CAST(n_tok AS BIGINT))", "COUNT(*)", 0, "avg_tokens")},
           FLOOR(CAST(SUM(CAST(stop_ratio AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000.0 AS avg_stop_ratio,
           FLOOR(CAST(SUM(CAST(punct_ratio AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) * 10000 + 0.5) / 10000.0 AS avg_punct_ratio
    FROM per_doc GROUP BY source
    """,
    doc=(
        "Quality scoring per source: token count, stopword ratio, punctuation ratio. "
        "Per-doc ratios are exact small-int divisions; averages go through DECIMAL so the "
        "oracle agrees despite groupBy summation order."
    ),
)
def quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-kernel scale path: the per-doc regex work runs in pyarrow.compute (RE2,
    vectorized C++) inside mapInPandas. Measured at sf1 this is ~6× the JVM expression
    variant (java.util.regex backtracking + per-token interpreted HOF lambdas are the
    cost; DuckDB's identical-semantics oracle runs on RE2 too, which is exactly why it
    was 40× faster than the JVM plan). The JVM twin stays registered below
    (x3_quality_jvm, same oracle) as the pure-expression proof.

    Semantics preserved exactly:
    - n_tok  == size(tokens(text)): count of [A-Za-z0-9]+ runs;
    - stops  counted case-insensitively on the punct→space-normalized string, where
      \\b boundaries coincide with token boundaries because only [a-zA-Z0-9 ] remains
      ((?i) replaces the former utf8_lower pass — one fewer full-corpus string copy);
    - punct  == count of chars matching [^a-z0-9 ] (the length-difference trick, one
      regex count here).

    mapInArrow, not mapInPandas: the text column stays an Arrow array end-to-end
    (the pandas conversion round trip was a measured ~10% of the whole kernel stage).
    """
    docs = catalog.table(spark, sf_dir, "documents").select("source", "text")

    def per_doc(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            text = b.column("text")
            n_tok = pc.count_substring_regex(text, "[A-Za-z0-9]+")
            norm = pc.replace_substring_regex(text, "[^a-zA-Z0-9 ]", " ")
            stops = pc.count_substring_regex(norm, r"(?i)\b(?:the|a|of|and|to|in)\b")
            punct = pc.count_substring_regex(text, "[^a-z0-9 ]")
            length = pc.utf8_length(text)
            nt = pc.cast(n_tok, pa.float64())
            nt = pc.if_else(pc.equal(nt, 0.0), pa.scalar(None, pa.float64()), nt)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("source"),
                    pc.cast(n_tok, pa.int32()),
                    pc.divide(pc.cast(stops, pa.float64()), nt),
                    pc.divide(pc.cast(punct, pa.float64()), pc.cast(length, pa.float64())),
                ],
                ["source", "n_tok", "stop_ratio", "punct_ratio"],
            )

    per = docs.mapInArrow(
        per_doc, "source string, n_tok int, stop_ratio double, punct_ratio double"
    )
    return _quality_rollup(per)


@register(
    "x3_quality_jvm",
    REGISTRY["x3_quality"].oracle,
    doc=(
        "Pure-JVM expression twin of x3_quality (same oracle): tokens() + interpreted "
        "HOF stopword filter + regexp_replace length diff. Kept as the no-Python proof; "
        "the Arrow kernel is the measured scale path."
    ),
)
def quality_jvm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents")
    with_toks = docs.select("source", "text", _tok.tokens("text").alias("toks"))
    n_tok = F.size(F.col("toks"))
    stop_ratio = (
        F.size(F.filter(F.col("toks"), lambda x: x.isin(*STOPWORDS))).cast("double")
        / F.nullif(n_tok, F.lit(0))
    )
    # nullif guard (r12 session 2): an EMPTY document made this a 0/0 — ANSI mode
    # raises DIVIDE_BY_ZERO where DuckDB's double division yields NULL; the
    # adversarial-corpus parity test caught it (the Arrow kernel already guarded)
    punct_ratio = (
        (F.length("text") - F.length(F.regexp_replace("text", "[^a-z0-9 ]", ""))).cast("double")
        / F.nullif(F.length("text"), F.lit(0))
    )
    per_doc = with_toks.select(
        "source", n_tok.alias("n_tok"), stop_ratio.alias("stop_ratio"), punct_ratio.alias("punct_ratio")
    )
    return _quality_rollup(per_doc)


@register(
    "x3_fingerprint",
    f"""
    SELECT doc_id, MIN(md5(sh)) AS fp
    FROM (SELECT doc_id, unnest({_tok.duck_shingles(_tok.duck_tokens('text'), 3)}) AS sh FROM documents)
    GROUP BY doc_id
    """,
    doc=(
        "Document fingerprint: min-of-hashed-3-shingles (winnowing-style content signature). "
        "Identical docs (and heavy overlaps) collide; used as a cheap pre-dedup key. "
        "Round-5 plan: tokenize + shingle construction run as ONE Arrow batch stage "
        "(RE2 normalize, C split, shingles = one binary_join over three slices of the "
        "flat token buffer, per-doc bounds as a numpy mask — no JVM regex, no "
        "interpreted HOF transform; measured 2.98 -> 0.80 s at sf1, output "
        "bit-identical); the cross-engine md5 + min-agg stay JVM codegen (md5 is ~4% "
        "of the cost, and partial agg collapses shingles to one row per doc before "
        "the shuffle)."
    ),
)
def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents").select("doc_id", "text")

    def shingle_kernel(batches):
        # mapInArrow (round-14): text and shingle strings stay Arrow end-to-end;
        # the old pandas wrapper materialized every shingle as a Python object
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            if not batch.num_rows:
                continue
            text = batch.column("text")
            norm = pc.utf8_lower(pc.replace_substring_regex(text, "[^a-zA-Z0-9 ]", " "))
            # collapse+trim so split yields NO empty tokens (an empty-norm doc yields
            # one '' token, excluded below by the >=3-token shingle bound)
            norm = pc.utf8_trim_whitespace(pc.replace_substring_regex(norm, " +", " "))
            toks = pc.split_pattern(norm, " ")
            flat = toks.values
            offs = toks.offsets.to_numpy()
            n = len(flat)
            if n < 3:
                continue
            sh_all = pc.binary_join_element_wise(
                flat.slice(0, n - 2), flat.slice(1, n - 2), flat.slice(2, n - 2), " "
            )
            idx = np.arange(n - 2)
            doc_of = np.searchsorted(offs, idx, side="right") - 1
            valid = idx <= offs[doc_of + 1] - 3  # shingle must not cross its doc's end
            doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            ids = doc_ids[doc_of[valid]]
            if len(ids):
                yield pa.record_batch(
                    {
                        "doc_id": pa.array(ids, pa.int64()),
                        "sh": sh_all.take(pa.array(np.flatnonzero(valid))),
                    }
                ).cast(pa.schema([("doc_id", pa.int64()), ("sh", pa.string())]))

    sh = docs.mapInArrow(shingle_kernel, "doc_id bigint, sh string")
    return sh.groupBy("doc_id").agg(F.min(F.md5(F.encode(F.col("sh"), "utf-8"))).alias("fp"))


@register(
    "x3_unigram_lm",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({_tok.duck_tokens('text')}) AS tok FROM documents
    ),
    census AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok)
    SELECT t.doc_id,
           COUNT(*) AS n_toks,
           {duck_round("CAST(SUM(CAST(c.cnt AS BIGINT)) AS DOUBLE) / COUNT(*)")} AS avg_tok_freq,
           CAST(MIN(c.cnt) AS BIGINT) AS rarest_freq
    FROM toks t JOIN census c ON t.tok = c.tok
    GROUP BY t.doc_id
    """,
    doc=(
        "Unigram language-model familiarity score: per-document mean and minimum corpus "
        "frequency of its tokens — documents full of rare tokens (low avg, rarest_freq 1) "
        "are the out-of-distribution/noise candidates a pipeline filters before training. "
        "Exact-arithmetic stand-in for unigram log-perplexity: the census counts are exact "
        "integers and the only float op is one rounded division, so the gate hash-matches "
        "(a SUM(log(p)) would drift in the last ulp between libm builds and across "
        "partition orders), while the per-doc ranking is order-isomorphic."
    ),
)
def unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = catalog.table(spark, sf_dir, "documents")
    # token explosion feeds BOTH the census and the per-doc join — checkpoint it so the
    # tokenize+explode scan runs once (keywords' tf pattern, invariant #3)
    toks = docs.select("doc_id", F.explode(_tok.tokens("text")).alias("tok")).localCheckpoint(
        eager=True
    )
    census = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    # census is vocabulary-sized (≪ corpus) → broadcast; at 100 TB cap the vocabulary
    # (HAVING cnt >= k) or let it shuffle — the per-doc aggregate is partial either way
    return (
        toks.join(F.broadcast(census), "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_toks"),
            round_det(F.sum(F.col("cnt").cast("bigint")).cast("double") / F.count("*")).alias(
                "avg_tok_freq"
            ),
            F.min("cnt").cast("bigint").alias("rarest_freq"),
        )
    )


@register(
    "x3_keywords",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest({_tok.duck_tokens('text')}) AS tok FROM documents
    ),
    tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
    df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY tok)
    SELECT doc_id, tok, rk FROM (
        SELECT tf.doc_id, tf.tok,
               ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                  ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.tok) AS rk
        FROM tf JOIN df ON tf.tok = df.tok
    ) WHERE rk <= 3
    """,
    doc=(
        "Keyword extraction: top-3 terms per doc by tf/df (exact rational score — real "
        "TF-IDF's log() differs in the last ulp between libm implementations, so the "
        "checked variant keeps the score exactly comparable). tf and df are two partial-"
        "aggregated censuses joined on the term."
    ),
)
def keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = catalog.table(spark, sf_dir, "documents").select("doc_id", "text")

    # per-doc term frequencies computed wholly inside the Arrow stage (C++ group_by):
    # docs never span batches, so the per-batch (doc_id, tok) counts are FINAL — the
    # plan shuffles tf rows only for the window/df, never corpus×tokens exploded rows
    def tf_rows(batches):
        # mapInArrow (round-14): token strings stay Arrow through the C++
        # group_by and back out — the .to_pandas() hop materialized every
        # (doc_id, tok) row as Python objects just to re-encode them
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column("text")
            norm = pc.utf8_lower(pc.replace_substring_regex(text, "[^a-zA-Z0-9 ]", " "))
            lists = pc.split_pattern(norm, " ")
            idx = pc.list_parent_indices(lists)
            flat = lists.flatten()
            keep = pc.not_equal(flat, "")
            doc_ids = batch.column("doc_id").take(idx).filter(keep)
            toks_arr = flat.filter(keep)
            agg = (
                pa.table({"doc_id": doc_ids, "tok": toks_arr})
                .group_by(["doc_id", "tok"])
                .aggregate([("tok", "count")])
            )
            out = agg.rename_columns(["doc_id", "tok", "tf"]).cast(
                pa.schema([("doc_id", pa.int64()), ("tok", pa.string()), ("tf", pa.int64())])
            )
            yield from out.to_batches()

    # tf feeds BOTH the df census and the join — checkpoint it so the Arrow pass runs
    # once, and derive df as COUNT(*) over tf rows (one row per (doc_id, tok) ⇒
    # identical to COUNT(DISTINCT doc_id), without the distinct pass)
    tf = docs.mapInArrow(tf_rows, "doc_id bigint, tok string, tf long").localCheckpoint(eager=True)
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = tf.join(df, "tok").select(
        "doc_id", "tok", (F.col("tf").cast("double") / F.col("df")).alias("score")
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "tok")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", "tok", "rk")
    )
