"""Text analysis family: stats, language ID, fingerprints, quality
filters, contamination, token frequencies, distinctive terms.

Split from the single-module registry (round 7); the query/oracle
registration surface (contract.QUERIES / contract.ORACLES) is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from timeseriesfuser_spark.config import FuserConfig, SourceConfig
from timeseriesfuser_spark.intervals import (
    boundary_label_col,
    floor_boundary_col,
    interval_to_ms,
)
from timeseriesfuser_spark.operators.fill import forward_fill
from timeseriesfuser_spark.operators.fuse import TimeSeriesFuser
from timeseriesfuser_spark.operators.resample import resample_last_interval
from timeseriesfuser_spark.ops import dedup as D
from timeseriesfuser_spark.ops import packing as P
from timeseriesfuser_spark.ops import sampling as SA
from timeseriesfuser_spark.ops import similarity as S
from timeseriesfuser_spark.ops import text as X
from timeseriesfuser_spark.ops import timeseries as TS
from timeseriesfuser_spark.timeutils import coerce_to_epoch_ms, ts_epoch_ms_col

from timeseriesfuser_spark.contract._base import (  # noqa: F401
    QUERIES,
    ORACLES,
    register,
    _t,
    _events,
    _sql_hash64,
    _TOKS,
    _SHINGLES,
    _shingle_rel,
    _SHINGLE_REL,
    _H1,
    _ff,
    _fdiv,
    _NH,
    _NB,
    _MT,
    _minhash_sql,
    _H1GAP,
    _DIFF_MID,
)



@register(
    "doc_chunks",
    # Sliding windows of 32 tokens every 24: starts 0,24,48,… while < the
    # token count; chunk key = token offset (no ordinality required).
    oracle=f"""
    WITH tk AS (SELECT doc_id, {_TOKS} AS t FROM documents)
    SELECT doc_id,
           CAST(s AS BIGINT) AS chunk_start,
           CAST(len(t[s+1 : s+32]) AS BIGINT) AS n_tokens,
           array_to_string(t[s+1 : s+32], ' ') AS chunk_text
    FROM tk, unnest(range(0, len(t), 24)) AS u(s)
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window doc chunking (32-token windows, stride 24) — the
    RAG/context-prep step; pure projection + explode, zero shuffles."""
    return P.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_size=32, stride=24
    )


@register(
    "tfidf_keywords",
    oracle=f"""
    WITH tk AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    tf AS (SELECT doc_id, token, count(*) AS tf FROM tk GROUP BY doc_id, token),
    dfr AS (SELECT token, count(*) AS df FROM tf GROUP BY token),
    scored AS (
        SELECT tf.doc_id, tf.token, tf.tf, dfr.df,
               tf.tf * 1000000 // dfr.df AS score
        FROM tf JOIN dfr USING (token)
    ),
    ranked AS (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, token
        ) AS rk FROM scored
    )
    SELECT doc_id, token, tf, df, score FROM ranked WHERE rk <= 5
    """,
)
def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per doc by integer tf-idf rank (score =
    tf·1e6 DIV df — rank-equivalent to tf·idf within one corpus, exact in
    any engine). Keyword extraction for corpus exploration/routing."""
    return X.tfidf_top_terms(_t(spark, sf_dir, "documents"), k=5)


# --------------------------------------------------------------------------- #
# Text analysis (documents)
# --------------------------------------------------------------------------- #

_SW = "['the', 'a', 'of', 'and', 'to', 'in', 'is', 'it']"


@register(
    "text_stats",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, {_TOKS} AS tk FROM documents),
    m AS (SELECT doc_id,
                 CAST(length(text) AS BIGINT) AS n_chars_actual,
                 CAST(len(tk) AS BIGINT) AS n_tokens,
                 CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_bpe_tokens,
                 CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_punct,
                 CAST(len(list_filter(tk, t -> list_contains({_SW}, t))) AS BIGINT) AS n_stopwords,
                 CAST(len(list_filter(tk, t -> regexp_full_match(t, '[a-z]+'))) AS BIGINT) AS n_alpha,
                 CAST(list_aggregate([length(t) FOR t IN tk] || [0], 'sum') AS BIGINT) AS tok_chars
          FROM d)
    SELECT doc_id, n_chars_actual, n_tokens, n_bpe_tokens, n_punct, n_stopwords,
           CASE WHEN n_tokens > 0 THEN CAST(tok_chars AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS avg_token_len,
           CASE WHEN n_tokens > 0 THEN CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stopword_ratio,
           CASE WHEN n_chars_actual > 0 THEN CAST(n_punct AS DOUBLE) / CAST(n_chars_actual AS DOUBLE) ELSE 0.0 END AS punct_ratio,
           CASE WHEN 3 * n_tokens > 0 THEN CAST(2 * n_stopwords + n_alpha AS DOUBLE) / CAST(3 * n_tokens AS DOUBLE) ELSE 0.0 END AS quality_score
    FROM m
    """,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality metrics: token/BPE/punct/stopword counts + composite score."""
    return X.text_stats(_t(spark, sf_dir, "documents"))


def _langid_sql() -> str:
    langs = sorted(X.LANG_STOPWORDS)
    votes = []
    for lang in langs:
        arr = "[" + ", ".join(f"'{w}'" for w in X.LANG_STOPWORDS[lang]) + "]"
        votes.append(
            f"CAST(len(list_filter(tk, t -> list_contains({arr}, t))) AS BIGINT) AS votes_{lang}"
        )
    mx = "greatest(" + ", ".join(f"votes_{lang}" for lang in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN votes_{lang} = {mx} THEN '{lang}'" for lang in langs
    ) + " END"
    vote_cols = ", ".join(f"votes_{lang}" for lang in langs)
    return f"""
    WITH d AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
    v AS (SELECT doc_id, {', '.join(votes)} FROM d)
    SELECT doc_id, {vote_cols}, {pred} AS lang_pred FROM v
    """


@register("lang_id", oracle=_langid_sql())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID (argmax, alphabetical tie-break)."""
    return X.language_id(_t(spark, sf_dir, "documents"))


@register(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp_md5,
           list_aggregate(list_transform({_SHINGLES}, s -> {_sql_hash64('s')}), 'min') AS fp_minshingle
    FROM (SELECT doc_id, text, {_TOKS} AS tk FROM documents)
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fingerprints: normalized-md5 + min-shingle hash."""
    return X.doc_fingerprint(_t(spark, sf_dir, "documents"))


def _ngram_all_sql(n: int) -> str:
    """ALL word n-grams with multiplicities (twin of ops.text.ngram_all_col)."""
    return f"[array_to_string(tk[i:i+{n - 1}], ' ') FOR i IN range(1, len(tk) - {n - 2})]"


def _repetition_sql() -> str:
    tops = []
    for n in (2, 3):
        tops.append(f"""
    g{n} AS (SELECT doc_id, unnest({_ngram_all_sql(n)}) AS g
             FROM (SELECT doc_id, {_TOKS} AS tk FROM documents)),
    pg{n} AS (SELECT doc_id, g, count(*) AS c FROM g{n} GROUP BY doc_id, g),
    top{n} AS (SELECT doc_id, max(c * length(g)) AS m FROM pg{n}
               WHERE c >= 2 GROUP BY doc_id)""")
    return f"""
    WITH lines AS (
        SELECT doc_id, unnest(string_split(text, chr(10))) AS ln FROM documents
    ),
    pl AS (SELECT doc_id, ln, count(*) AS c FROM lines GROUP BY doc_id, ln),
    ls AS (
        SELECT doc_id, sum(c) AS n_lines, count(*) AS n_distinct,
               sum(length(ln) * c) AS line_chars, sum(length(ln)) AS distinct_chars
        FROM pl GROUP BY doc_id
    ),{','.join(tops)}
    SELECT d.doc_id,
           CASE WHEN ls.n_lines > 0
                THEN CAST(ls.n_lines - ls.n_distinct AS DOUBLE) / ls.n_lines
                ELSE 0.0 END AS dup_line_frac,
           CASE WHEN ls.line_chars > 0
                THEN CAST(ls.line_chars - ls.distinct_chars AS DOUBLE) / ls.line_chars
                ELSE 0.0 END AS dup_line_char_frac,
           CASE WHEN top2.m IS NOT NULL AND length(d.text) > 0
                THEN CAST(top2.m AS DOUBLE) / length(d.text)
                ELSE 0.0 END AS top2gram_char_frac,
           CASE WHEN top3.m IS NOT NULL AND length(d.text) > 0
                THEN CAST(top3.m AS DOUBLE) / length(d.text)
                ELSE 0.0 END AS top3gram_char_frac
    FROM documents d
    LEFT JOIN ls ON ls.doc_id = d.doc_id
    LEFT JOIN top2 ON top2.doc_id = d.doc_id
    LEFT JOIN top3 ON top3.doc_id = d.doc_id
    """


@register(
    "source_quality_rollup",
    oracle=f"""
    WITH d AS (
        SELECT source, md5(text) AS h, {_TOKS} AS tk, text FROM documents
    ),
    m AS (
        SELECT source, h,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               CAST(len(list_filter(tk, t -> list_contains({_SW}, t))) AS BIGINT) AS n_stop,
               CASE WHEN len(tk) >= 50 THEN 1 ELSE 0 END AS keep
        FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT h) AS BIGINT) AS n_distinct,
           CAST(count(*) - count(DISTINCT h) AS DOUBLE) / count(*) AS dup_frac,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(n_stop) AS DOUBLE) / sum(n_tokens) AS stopword_token_frac,
           CAST(sum(keep) AS DOUBLE) / count(*) AS keep_frac
    FROM m
    GROUP BY source
    """,
)
def q_source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-crawl-source health rollup — the "which feeds are worth
    keeping" report: doc count, exact-dup fraction (distinct content
    hashes), token volume, corpus-level stopword density, and the
    fraction passing a minimum-length gate. Every emitted ratio is one
    division of integer sums, so the aggregate is order-independent and
    oracle-exact (double sums would not be)."""
    toks = X.tokens_col(F.col("text"))
    sw = F.array([F.lit(s) for s in X.EN_STOPWORDS])
    m = _t(spark, sf_dir, "documents").select(
        "source",
        F.md5(F.col("text")).alias("h"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        .cast("long")
        .alias("n_stop"),
        F.when(F.size(toks) >= 50, F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    )
    return m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("h").alias("n_distinct"),
        (
            (F.count(F.lit(1)) - F.countDistinct("h")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("dup_frac"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_stop").cast("double") / F.sum("n_tokens").cast("double")).alias(
            "stopword_token_frac"
        ),
        (F.sum("keep").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "keep_frac"
        ),
    )


@register(
    "pii_scrub",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{X.PII_PATTERNS["email"]}')) AS BIGINT) AS n_email,
           CAST(len(regexp_extract_all(text, '{X.PII_PATTERNS["ip"]}')) AS BIGINT) AS n_ip,
           CAST(len(regexp_extract_all(text, '{X.PII_PATTERNS["phone"]}')) AS BIGINT) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '{X.PII_PATTERNS["email"]}', '<EMAIL>', 'g'),
               '{X.PII_PATTERNS["ip"]}', '<IP>', 'g'),
               '{X.PII_PATTERNS["phone"]}', '<PHONE>', 'g')) AS redacted_md5
    FROM documents
    """,
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub counts + md5 of the fully-redacted text — the hash makes
    the oracle verify the redaction TRANSFORMATION on every doc, not just
    the (possibly zero) match counts (ops.text.pii_scrub)."""
    out = X.pii_scrub(_t(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "n_email", "n_ip", "n_phone",
        F.md5("text_redacted").alias("redacted_md5"),
    )


@register(
    "corpus_length_stats",
    oracle=f"""
    WITH l AS ({_langid_sql()}),
    t AS (SELECT doc_id, CAST(len({_TOKS}) AS BIGINT) AS n_tokens FROM documents)
    SELECT l.lang_pred,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(t.n_tokens) AS BIGINT) AS min_tokens,
           quantile_cont(t.n_tokens, 0.25) AS q25_tokens,
           quantile_cont(t.n_tokens, 0.5) AS median_tokens,
           quantile_cont(t.n_tokens, 0.75) AS q75_tokens,
           CAST(max(t.n_tokens) AS BIGINT) AS max_tokens,
           CAST(sum(t.n_tokens) AS DOUBLE) / count(*) AS avg_tokens
    FROM l JOIN t USING (doc_id)
    GROUP BY l.lang_pred
    """,
)
def q_corpus_length_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution per predicted language: exact
    interpolated quartiles (Spark `percentile` ≡ DuckDB `quantile_cont`,
    both linear interpolation — deterministic on integer token counts),
    composed from language_id + a token-count aggregate. The per-group
    exact percentile sorts only within a (language) group — the shuffle
    keys on language, never a global sort."""
    docs = _t(spark, sf_dir, "documents")
    lang = X.language_id(docs).select("doc_id", "lang_pred")
    toks = docs.select(
        "doc_id",
        F.size(X.tokens_col(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return (
        lang.join(toks, "doc_id")
        .groupBy("lang_pred")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.expr("percentile(n_tokens, 0.25)").alias("q25_tokens"),
            F.expr("percentile(n_tokens, 0.5)").alias("median_tokens"),
            F.expr("percentile(n_tokens, 0.75)").alias("q75_tokens"),
            F.max("n_tokens").alias("max_tokens"),
            (
                F.sum("n_tokens").cast("double") / F.count(F.lit(1)).cast("double")
            ).alias("avg_tokens"),
        )
    )


@register(
    "quality_filter",
    oracle=f"""
    WITH d AS (SELECT doc_id, text, {_TOKS} AS tk FROM documents),
    m AS (
        SELECT doc_id,
               CAST(len(tk) AS BIGINT) AS n_tokens,
               CAST(COALESCE(list_aggregate(list_transform(tk, t -> length(t)), 'sum'), 0) AS BIGINT) AS tok_chars,
               CAST(len(list_filter(tk, t -> regexp_matches(t, '^[a-z]+$'))) AS BIGINT) AS n_alpha,
               CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\\s]')) AS BIGINT) AS n_punct,
               CAST(len(list_intersect(list_distinct(tk), {_SW})) AS BIGINT) AS n_stop_distinct
        FROM d
    ),
    r AS (
        SELECT doc_id, n_tokens,
               CASE WHEN n_tokens > 0 THEN CAST(tok_chars AS DOUBLE) / n_tokens ELSE 0.0 END AS mean_token_len,
               CASE WHEN n_tokens > 0 THEN CAST(n_punct AS DOUBLE) / n_tokens ELSE 0.0 END AS punct_token_ratio,
               CASE WHEN n_tokens > 0 THEN CAST(n_alpha AS DOUBLE) / n_tokens ELSE 0.0 END AS alpha_token_frac,
               n_stop_distinct
        FROM m
    )
    SELECT doc_id, n_tokens, mean_token_len, punct_token_ratio,
           alpha_token_frac, n_stop_distinct,
           (n_tokens >= 50 AND n_tokens <= 100000) AS ok_token_count,
           (mean_token_len >= 3.0 AND mean_token_len <= 10.0) AS ok_mean_token_len,
           (punct_token_ratio <= 0.5) AS ok_punct_ratio,
           (alpha_token_frac >= 0.8) AS ok_alpha_frac,
           (n_stop_distinct >= 2) AS ok_stopwords,
           ((n_tokens >= 50 AND n_tokens <= 100000)
            AND (mean_token_len >= 3.0 AND mean_token_len <= 10.0)
            AND (punct_token_ratio <= 0.5)
            AND (alpha_token_frac >= 0.8)
            AND (n_stop_distinct >= 2)) AS keep,
           CASE WHEN NOT (n_tokens >= 50 AND n_tokens <= 100000) THEN 'token_count'
                WHEN NOT (mean_token_len >= 3.0 AND mean_token_len <= 10.0) THEN 'mean_token_len'
                WHEN NOT (punct_token_ratio <= 0.5) THEN 'punct_ratio'
                WHEN NOT (alpha_token_frac >= 0.8) THEN 'alpha_frac'
                WHEN NOT (n_stop_distinct >= 2) THEN 'stopwords'
                ELSE NULL END AS drop_reason
    FROM r
    """,
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style composite quality gate (ops.text.quality_filter,
    paper defaults): per-rule booleans + keep + first-failing-rule
    drop_reason."""
    return X.quality_filter(_t(spark, sf_dir, "documents"))


@register(
    "contamination_check",
    oracle=f"""
    WITH bg AS (
        SELECT DISTINCT unnest({_SHINGLES}) AS g
        FROM (SELECT {_TOKS} AS tk FROM documents WHERE doc_id < 10)
    ),
    dg AS (
        SELECT doc_id, unnest({_SHINGLES}) AS g
        FROM (SELECT doc_id, {_TOKS} AS tk FROM documents)
    ),
    pd AS (
        SELECT dg.doc_id,
               CAST(count(*) AS BIGINT) AS n_ngrams,
               CAST(sum(CASE WHEN bg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_contaminated
        FROM dg LEFT JOIN bg ON dg.g = bg.g
        GROUP BY dg.doc_id
    )
    SELECT d.doc_id,
           COALESCE(pd.n_ngrams, CAST(0 AS BIGINT)) AS n_ngrams,
           COALESCE(pd.n_contaminated, CAST(0 AS BIGINT)) AS n_contaminated,
           CASE WHEN pd.n_ngrams > 0
                THEN CAST(pd.n_contaminated AS DOUBLE) / pd.n_ngrams
                ELSE 0.0 END AS contamination_frac
    FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id
    """,
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination signal: distinct word-3-gram overlap of
    each document against a broadcast 'benchmark' sample (docs 0-9 here) —
    ops.text.contamination_check, the GPT-3-style n-gram overlap rule."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 10)
    return X.contamination_check(docs, bench, n=3)


@register("repetition_stats", oracle=_repetition_sql())
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: duplicate-line fractions + top
    repeated-n-gram character mass (ops.text.repetition_stats)."""
    return X.repetition_stats(_t(spark, sf_dir, "documents"))


@register(
    "token_frequencies",
    oracle=f"""
    SELECT token,
           CAST(count(*) AS BIGINT) AS term_freq,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM (SELECT doc_id, unnest({_TOKS}) AS token FROM documents)
    GROUP BY token
    ORDER BY term_freq DESC, token
    LIMIT 100
    """,
)
def q_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics: top-100 tokens by term frequency with
    document frequency (ops.text.token_frequencies) — the word-count shape
    feeding vocab/BPE construction."""
    out = X.token_frequencies(_t(spark, sf_dir, "documents"))
    return out.orderBy(F.desc("term_freq"), F.asc("token")).limit(100)


@register(
    "token_rarity",
    oracle=f"""
    WITH tk AS (SELECT doc_id, unnest({_TOKS}) AS token FROM documents),
    f AS (SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tk GROUP BY token),
    per AS (
        SELECT tk.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               CAST(sum(f.tf) AS BIGINT) AS sum_corpus_tf,
               CAST(sum(CASE WHEN f.tf <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        FROM tk JOIN f USING (token)
        GROUP BY tk.doc_id
    )
    SELECT d.doc_id,
           COALESCE(per.n_tokens, CAST(0 AS BIGINT)) AS n_tokens,
           COALESCE(per.sum_corpus_tf, CAST(0 AS BIGINT)) AS sum_corpus_tf,
           CASE WHEN per.n_tokens > 0
                THEN CAST(per.sum_corpus_tf AS DOUBLE) / CAST(per.n_tokens AS DOUBLE)
                ELSE 0.0 END AS mean_token_tf,
           COALESCE(per.n_rare, CAST(0 AS BIGINT)) AS n_rare,
           CASE WHEN per.n_tokens > 0
                THEN CAST(per.n_rare AS DOUBLE) / CAST(per.n_tokens AS DOUBLE)
                ELSE 0.0 END AS rare_frac
    FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
    """,
)
def q_token_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-free perplexity proxy (ops.text.token_rarity): each document
    scored by the corpus frequency of its own tokens — mean corpus term
    frequency + rare-token fraction, the CCNet-style quality bucket signal
    computable without a language model. Frequency table broadcast so the
    exploded token relation never shuffles on the Zipf-skewed token key."""
    return X.token_rarity(_t(spark, sf_dir, "documents"), rare_threshold=2)


@register(
    "distinctive_terms",
    oracle=f"""
    WITH tok AS (SELECT source AS stratum, unnest({_TOKS}) AS tk
                 FROM documents),
    st AS (SELECT stratum, tk, count(*) AS cnt_s FROM tok GROUP BY 1, 2),
    corpus AS (SELECT tk, sum(cnt_s) AS cnt_c FROM st GROUP BY tk),
    tots AS (SELECT stratum, sum(cnt_s) AS tot_s FROM st GROUP BY stratum),
    total AS (SELECT sum(cnt_s) AS tot_c FROM st),
    scored AS (
        SELECT st.stratum, st.tk, st.cnt_s,
               st.cnt_s * 1000000 // t.tot_s AS ppm_stratum,
               c.cnt_c * 1000000 // total.tot_c AS ppm_corpus
        FROM st JOIN corpus c USING (tk)
        JOIN tots t ON st.stratum IS NOT DISTINCT FROM t.stratum, total
        WHERE st.cnt_s >= 5),
    l AS (SELECT *, ppm_stratum * 1000000 // ppm_corpus AS lift_ppm
          FROM scored WHERE ppm_corpus > 0),
    r AS (SELECT *, row_number() OVER (PARTITION BY stratum
                                       ORDER BY lift_ppm DESC, tk) AS rnk
          FROM l)
    SELECT stratum AS source, tk AS token,
           CAST(cnt_s AS BIGINT) AS cnt_s,
           CAST(ppm_stratum AS BIGINT) AS ppm_stratum,
           CAST(ppm_corpus AS BIGINT) AS ppm_corpus,
           CAST(lift_ppm AS BIGINT) AS lift_ppm,
           CAST(rnk AS BIGINT) AS rank
    FROM r WHERE rnk <= 10
    """,
)
def q_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source characteristic vocabulary (ops.text.distinctive_terms):
    tokens over-represented in a source vs the corpus, exact-integer
    lift_ppm, top-10 per source. Two hash-aggs + broadcast totals; the
    ranking window runs on the aggregated source×vocab relation, never
    the exploded token stream."""
    from timeseriesfuser_spark.ops.text import distinctive_terms

    return distinctive_terms(
        _t(spark, sf_dir, "documents"),
        strata_col="source",
        min_count=5,
        top_k=10,
    )


@register(
    "lang_confusion",
    oracle=f"""
    WITH pred AS ({ORACLES["lang_id"]}),
    j AS (SELECT d.lang AS lang_true, p.lang_pred
          FROM documents d JOIN pred p USING (doc_id)),
    cells AS (SELECT lang_true, lang_pred, count(*) AS n
              FROM j GROUP BY lang_true, lang_pred),
    tot AS (SELECT lang_true, sum(n) AS t FROM cells GROUP BY lang_true)
    SELECT c.lang_true, c.lang_pred, CAST(c.n AS BIGINT) AS n,
           CAST(c.n * 1000000 // t.t AS BIGINT) AS share_ppm
    FROM cells c JOIN tot t ON c.lang_true IS NOT DISTINCT FROM t.lang_true
    """,
)
def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-evaluation confusion matrix: the stopword-vote lang-ID
    predictions against the documents' labeled `lang`, with the exact-ppm
    share of each true language routed to each prediction — the
    measure-before-trust companion of ann_recall, for the text side. Two
    hash-aggs over the |docs|-sized prediction join."""
    docs = _t(spark, sf_dir, "documents")
    pred = X.language_id(docs).select("doc_id", "lang_pred")
    j = docs.select("doc_id", F.col("lang").alias("lang_true")).join(
        pred, "doc_id"
    )
    cells = j.groupBy("lang_true", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = cells.groupBy(F.col("lang_true").alias("__lt")).agg(
        F.sum("n").alias("__t")
    )
    # null-safe totals join: an unlabeled (NULL) language is still a row
    # of the confusion matrix, and equi-joins drop NULL keys.
    return cells.join(
        tot, cells["lang_true"].eqNullSafe(tot["__lt"])
    ).select(
        "lang_true",
        "lang_pred",
        F.col("n").cast("long").alias("n"),
        F.expr("n * 1000000 DIV __t").cast("long").alias("share_ppm"),
    )


# ---------------------------------------------------------------------------
# round 7: intra-document repeated-line removal
# ---------------------------------------------------------------------------

# The raw docs are single-line; both engines build the same multi-line
# text (8-token lines) and plant guaranteed intra-doc duplicates: the
# first line repeated at the end plus a footer appearing twice.
_IDL_FOOTER = "share this article subscribe to our newsletter"


def _idl_built_sql() -> str:
    return f"""
        SELECT doc_id,
               concat(
                   array_to_string(
                       [array_to_string(tk[g*8+1 : g*8+8], ' ')
                        FOR g IN range(0, (len(tk)+7)//8)],
                       chr(10)),
                   chr(10), '{_IDL_FOOTER}',
                   chr(10), array_to_string(tk[1:8], ' '),
                   chr(10), '{_IDL_FOOTER}') AS text
        FROM (SELECT doc_id, split(text, ' ') AS tk FROM documents)
    """


@register(
    "intra_doc_line_dedup",
    oracle=f"""
    WITH built AS ({_idl_built_sql()}),
    l AS (SELECT doc_id, split(text, chr(10)) AS ls FROM built),
    k AS (SELECT doc_id, ls,
                 list_filter(ls, (x, i) -> list_position(ls, x) = i) AS kept
          FROM l)
    SELECT doc_id,
           array_to_string(kept, chr(10)) AS text,
           CAST(len(ls) - len(kept) AS BIGINT) AS n_removed,
           CAST(len(ls) AS BIGINT) AS n_lines
    FROM k
    """,
)
def q_intra_doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repeated-line removal
    (ops.text.dedup_lines_within_doc): first occurrence of each line
    survives, order preserved — zero-shuffle positional-lambda filter
    inside codegen. The constructed corpus plants a repeated first line
    and a doubled footer per doc, so every doc exercises the removal."""
    from timeseriesfuser_spark.ops.text import dedup_lines_within_doc

    d = _t(spark, sf_dir, "documents")
    tk = F.split(F.col("text"), " ")
    ng = F.expr("(size(__tk) + 7) DIV 8").cast("int")
    line_of = F.transform(
        F.sequence(F.lit(0), ng - 1),
        lambda g: F.array_join(F.slice(F.col("__tk"), g * 8 + 1, 8), " "),
    )
    built = (
        d.withColumn("__tk", tk)
        .select(
            "doc_id",
            F.concat(
                F.array_join(line_of, "\n"),
                F.lit("\n" + _IDL_FOOTER + "\n"),
                F.array_join(F.slice(F.col("__tk"), 1, 8), " "),
                F.lit("\n" + _IDL_FOOTER),
            ).alias("text"),
        )
    )
    return dedup_lines_within_doc(built)


@register(
    "decontaminate_spans",
    oracle=f"""
    WITH bg AS (
        SELECT DISTINCT unnest({_SHINGLES}) AS g
        FROM (SELECT {_TOKS} AS tk FROM documents WHERE doc_id < 10)
    ),
    d AS (SELECT doc_id, text, {_TOKS} AS tk FROM documents),
    dg AS (
        SELECT doc_id,
               unnest([{{'i': i, 'g': array_to_string(tk[i:i+2], ' ')}}
                       FOR i IN range(1, len(tk) - 1)]) AS s
        FROM d
    ),
    pos AS (
        SELECT dg.doc_id, s['i'] AS i
        FROM dg JOIN bg ON s['g'] = bg.g
    ),
    cov AS (
        SELECT doc_id,
               list_distinct(flatten(list(range(i, i + 3)))) AS cv
        FROM pos GROUP BY doc_id
    )
    SELECT d.doc_id,
           CASE WHEN d.text IS NULL THEN NULL
                -- DuckDB array_to_string([]) is NULL, Spark concat_ws is ''
                ELSE COALESCE(array_to_string(
                    list_filter(d.tk, (t, j) -> NOT list_contains(
                        COALESCE(cov.cv, CAST([] AS BIGINT[])), j)), ' '), '')
           END AS clean_text,
           CAST(COALESCE(len(d.tk), 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(len(cov.cv), 0) AS BIGINT) AS n_removed
    FROM d LEFT JOIN cov ON d.doc_id = cov.doc_id
    """,
)
def q_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level decontamination against the doc_id<10 'benchmark'
    slice (same benchmark as `contamination_check`): contaminated
    3-gram spans are REMOVED (overlap-unioned), the rest of each
    document survives as token-normalized clean_text."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 10)
    return X.decontaminate_spans(docs, bench, n=3)


@register(
    "phrase_search",
    # The phrase is DERIVED from the corpus (first two tokens of the
    # lowest-id doc) identically on both engines, so the query is fixed
    # yet always matches >= 1 doc on any regenerated testdata. The
    # oracle verifies by direct list-slice comparison — a deliberately
    # different formulation from the op's postings intersection.
    oracle="""
    WITH ph AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+')[1:2] AS p
                FROM documents
                WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 2
                ORDER BY doc_id LIMIT 1),
    docs AS (SELECT doc_id,
                    regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
             FROM documents),
    m AS (SELECT d.doc_id,
                 [i FOR i IN range(1, len(d.tk) - len(ph.p) + 2)
                    IF d.tk[i:i + len(ph.p) - 1] = ph.p] AS hits
          FROM docs d CROSS JOIN ph)
    SELECT doc_id AS id,
           CAST(len(hits) AS BIGINT) AS n_matches,
           CAST(hits[1] AS BIGINT) AS first_pos
    FROM m WHERE len(hits) > 0
    """,
)
def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search via a positional inverted index
    (ops.text.build_token_index + phrase_search_indexed): the i-th
    phrase token's postings shift by -i and equi-join on (doc, aligned
    pos) — k-1 joins over per-token posting lists, never a corpus scan.
    The oracle re-verifies every match by direct token-slice equality."""
    docs = _t(spark, sf_dir, "documents")
    # lowest-id doc WITH >= 2 tokens (a NULL-text/token-less min doc
    # would crash the slice; both engines use the same predicate)
    first = (
        docs.filter(F.size(X._tokens("text")) >= 2)
        .orderBy("doc_id")
        .limit(1)
        .select(X._tokens("text").alias("tk"))
        .first()
    )
    if first is None:
        return spark.createDataFrame(
            [], "id long, n_matches long, first_pos long"
        )
    phrase = [str(w) for w in first["tk"][:2]]
    idx = X.build_token_index(docs)
    return X.phrase_search_indexed(idx, phrase)


@register(
    "fuzzy_supplier_names",
    oracle="""
    WITH d AS (SELECT s_suppkey AS id, s_name AS s FROM supplier
               WHERE s_name IS NOT NULL AND s_suppkey IS NOT NULL),
    v AS (SELECT id, s, unnest(list_distinct(list_append(
              [substr(s, 1, i - 1) || substr(s, i + 1, len(s))
               FOR i IN range(1, len(s) + 1)], s))) AS k
          FROM d),
    p AS (SELECT DISTINCT a.id AS ia, b.id AS ib, a.s AS sa, b.s AS sb
          FROM v a JOIN v b ON a.k = b.k AND a.id < b.id)
    SELECT ia AS id_a, ib AS id_b,
           CAST(levenshtein(sa, sb) AS BIGINT) AS edit_distance
    FROM p WHERE levenshtein(sa, sb) <= 1
    """,
)
def q_fuzzy_supplier_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 supplier-name matches (ops.text.fuzzy_match_pairs,
    FastSS deletion-neighborhood blocking): sequentially numbered
    Supplier#NNN names differing in one digit — the entity-resolution
    shape. Candidate join on deletion variants, exact codegen
    levenshtein verify; the oracle builds the same neighborhood with a
    DuckDB list comprehension."""
    from timeseriesfuser_spark.ops.text import fuzzy_match_pairs

    return fuzzy_match_pairs(
        _t(spark, sf_dir, "supplier"), id_col="s_suppkey", text_col="s_name"
    )


@register(
    "bm25_search",
    # Query terms are DERIVED from the corpus (document-frequency ranks
    # 5, 25 and 125 of the distinct-token vocabulary, ties broken by
    # token text) identically on both engines, so the fixed query spans
    # a common, a mid and a rare term on any regenerated testdata.
    # Log-free integer BM25 (k1 = 6/5, b = 3/4): see ops.text.bm25_topk.
    oracle="""
    WITH tok AS (SELECT doc_id,
                        unnest(list_distinct(
                            regexp_extract_all(lower(text), '[a-z0-9]+'))) AS tk
                 FROM documents),
    vdf AS (SELECT tk, count(*) AS dft FROM tok GROUP BY tk),
    ranked AS (SELECT tk,
                      row_number() OVER (ORDER BY dft DESC, tk) AS rnk
               FROM vdf),
    terms AS (SELECT tk FROM ranked WHERE rnk IN (5, 25, 125)),
    dl AS (SELECT doc_id AS id,
                  COALESCE(len(regexp_extract_all(lower(text), '[a-z0-9]+')), 0) AS dl
           FROM documents),
    stats AS (SELECT count(*) AS d_n, COALESCE(sum(dl), 0) AS t_n FROM dl),
    tf AS (SELECT s.doc_id AS id, s.tk AS token, count(*) AS tf
           FROM (SELECT doc_id,
                        unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tk
                 FROM documents) s
           JOIN terms ON s.tk = terms.tk
           GROUP BY 1, 2),
    dft2 AS (SELECT token, count(*) AS dft FROM tf GROUP BY token),
    scored AS (
        SELECT tf.id,
               CAST((CAST(d_n * 1000000 // dft AS HUGEINT) * 44 * t_n * tf)
                    // (CAST(20 AS HUGEINT) * t_n * tf
                        + CAST(6 AS HUGEINT) * t_n
                        + CAST(18 AS HUGEINT) * dl * d_n) AS BIGINT) AS s
        FROM tf
        JOIN dft2 USING (token)
        JOIN dl ON dl.id = tf.id
        CROSS JOIN stats)
    SELECT id, CAST(sum(s) AS BIGINT) AS bm25_u,
           CAST(count(*) AS BIGINT) AS n_terms
    FROM scored GROUP BY id
    ORDER BY bm25_u DESC, id LIMIT 20
    """,
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical ranked retrieval (ops.text.bm25_topk): log-free integer
    BM25 over the documents table — tf saturation and length
    normalization exact (k1 = 6/5, b = 3/4 cleared to one integer
    fraction in decimal(38,0)), idf the rational N·1e6 DIV df. The
    three query terms are df-ranks 5/25/125 of the corpus vocabulary,
    derived identically in the oracle. Completes the retrieval family:
    phrase (positional index), vector (IVF/PQ), hybrid (RRF) — and now
    ranked lexical."""
    docs = _t(spark, sf_dir, "documents")
    vdf = (
        docs.select(
            "doc_id", F.explode_outer(X._tokens("text")).alias("tk")
        )
        .filter(F.col("tk").isNotNull())
        .distinct()
        .groupBy("tk")
        .agg(F.count(F.lit(1)).alias("dft"))
    )
    # top-125 via TakeOrdered (never a single-partition rank window over
    # the vocabulary), then ranks 5/25/125 picked locally.
    top = vdf.orderBy(F.desc("dft"), F.asc("tk")).limit(125).collect()
    terms = [top[i]["tk"] for i in (4, 24, 124) if i < len(top)]
    if not terms:
        return spark.createDataFrame([], "id long, bm25_u long, n_terms long")
    return X.bm25_topk(docs, terms, k=20)


@register(
    "script_profile_docs",
    oracle=r"""
    WITH base AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
    c AS (SELECT doc_id AS id,
                 CAST(length(t) AS BIGINT) AS n_chars,
                 CAST(length(t) - length(regexp_replace(t, '\p{Latin}', '', 'g'))
                      AS BIGINT) AS n_latin,
                 CAST(length(t) - length(regexp_replace(t, '\p{Han}', '', 'g'))
                      AS BIGINT) AS n_han,
                 CAST(length(t) - length(regexp_replace(t, '\p{Cyrillic}', '', 'g'))
                      AS BIGINT) AS n_cyrillic,
                 CAST(length(t) - length(regexp_replace(t, '[0-9]', '', 'g'))
                      AS BIGINT) AS n_digit,
                 CAST(length(t) - length(regexp_replace(t, '\s', '', 'g'))
                      AS BIGINT) AS n_space
          FROM base)
    SELECT *,
           CAST(n_chars - n_latin - n_han - n_cyrillic - n_digit - n_space
                AS BIGINT) AS n_other,
           CAST(CASE WHEN n_chars > 0
                     THEN n_latin * 1000000 // n_chars ELSE 0 END
                AS BIGINT) AS latin_ppm
    FROM c
    """,
)
def q_script_profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode script composition per doc (ops.text.script_profile):
    Latin/Han/Cyrillic/digit/whitespace codepoint counts + latin_ppm —
    the multilingual mixture triage lang_id's single-label prediction
    can't express. Pure projection, no shuffle; Java \\p{IsLatin} and
    RE2 \\p{Latin} verified identical cross-engine."""
    return X.script_profile(_t(spark, sf_dir, "documents"))


@register(
    "readability_docs",
    oracle=r"""
    WITH base AS (SELECT doc_id, COALESCE(text, '') AS t FROM documents),
    c AS (SELECT doc_id AS id,
                 CAST(len(regexp_extract_all(lower(t), '[a-z0-9]+')) AS BIGINT)
                     AS n_words,
                 CAST(greatest(len(regexp_extract_all(t, '[.!?]+')), 1) AS BIGINT)
                     AS n_sentences,
                 CAST(len(regexp_extract_all(lower(t), '[aeiouy]+')) AS BIGINT)
                     AS n_syllables
          FROM base)
    SELECT *,
           CAST(CASE WHEN n_words > 0
                     THEN 206835 - 1015 * n_words // n_sentences
                                 - 84600 * n_syllables // n_words
                END AS BIGINT) AS flesch_milli
    FROM c
    """,
)
def q_readability_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading ease in exact integer milli-units
    (ops.text.readability_scores): vowel-group syllable heuristic,
    [.!?]+ sentence runs (min 1), WORD_RE words — the Gopher/C4-style
    quality gate with no float surface. Pure projection."""
    return X.readability_scores(_t(spark, sf_dir, "documents"))


# Deterministic HTML wrapper (both engines build the SAME page around
# each doc's text, so the extractor runs on real markup with entities,
# style/script noise and a double-encoded token):
_HTML_PRE = (
    '<html><head><style>p{color:red}</style></head><body>'
    '<h1>T&amp;C &lt;v1&gt; &amp;lt;raw&amp;gt;</h1><p>'
)
_HTML_POST = '</p><script>if (1 < 2 && 3 > 2) { var x = "&amp;"; }</script></body></html>'


@register(
    "html_extract_docs",
    oracle=f"""
    WITH h AS (SELECT doc_id,
                      '{_HTML_PRE}' || text || '{_HTML_POST}' AS html
               FROM documents),
    s1 AS (SELECT doc_id, html,
                  regexp_replace(html, '(?s)<script[^>]*>.*?</script>', ' ', 'g') AS t1
           FROM h),
    s2 AS (SELECT doc_id, html,
                  regexp_replace(t1, '(?s)<style[^>]*>.*?</style>', ' ', 'g') AS t2
           FROM s1),
    s3 AS (SELECT doc_id, html,
                  regexp_replace(
                      regexp_replace(t2, '(?s)<!--.*?-->', ' ', 'g'),
                      '<[^>]*>', ' ', 'g') AS t3
           FROM s2),
    s4 AS (SELECT doc_id, html,
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(
                          regexp_replace(
                            regexp_replace(t3, '&nbsp;', ' ', 'g'),
                            '&lt;', '<', 'g'),
                          '&gt;', '>', 'g'),
                        '&quot;', '"', 'g'),
                      '&#39;', chr(39), 'g'),
                    '&apos;', chr(39), 'g') AS t4
           FROM s3),
    s5 AS (SELECT doc_id, html,
                  trim(regexp_replace(
                      regexp_replace(t4, '&amp;', '&', 'g'),
                      '\\s+', ' ', 'g')) AS clean
           FROM s4)
    SELECT doc_id AS id, clean AS clean_text,
           CAST(COALESCE(length(html), 0) AS BIGINT) AS n_chars_raw,
           CAST(COALESCE(length(clean), 0) AS BIGINT) AS n_chars_clean
    FROM s5
    """,
)
def q_html_extract_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate stripping (ops.text.html_text_extract): each doc
    wrapped in a deterministic page (style/script blocks, entities, a
    double-encoded token) on BOTH engines, then script/style/comment
    removal, tag strip, standard-order entity decode (&amp; last — one
    level per pass), whitespace collapse. Pure projection, zero
    shuffle."""
    docs = _t(spark, sf_dir, "documents")
    wrapped = docs.select(
        "doc_id",
        F.concat(F.lit(_HTML_PRE), F.col("text"), F.lit(_HTML_POST)).alias(
            "html"
        ),
    )
    return X.html_text_extract(wrapped, id_col="doc_id", text_col="html")


@register(
    "supplier_sorted_neighborhood",
    # The oracle states the naive rank-difference theta join — parity
    # proves the asymmetric rank-block equi-join covers every pair
    # within the window exactly once.
    oracle="""
    WITH d AS (SELECT s_suppkey AS id, s_name AS s FROM supplier
               WHERE s_name IS NOT NULL),
    rn AS (SELECT id, s,
                  row_number() OVER (ORDER BY s ASC, id ASC) AS rk
           FROM d)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(a.rk AS BIGINT) AS rank_a,
           CAST(b.rk AS BIGINT) AS rank_b,
           CAST(levenshtein(a.s, b.s) AS BIGINT) AS edit_distance
    FROM rn a JOIN rn b ON b.rk > a.rk AND b.rk - a.rk <= 3
    WHERE levenshtein(a.s, b.s) <= 2
    """,
)
def q_supplier_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood ER blocking
    (ops.entity.sorted_neighborhood_pairs): suppliers sorted by name via
    the two-pass bucketed global rank, every pair within 3 positions a
    candidate (asymmetric rank-block equi-join — candidate volume
    exactly n·window, never a theta join), verified with levenshtein
    <= 2. The prefix-drift complement to fuzzy_supplier_names' deletion
    neighborhoods."""
    from timeseriesfuser_spark.ops.entity import sorted_neighborhood_pairs

    return sorted_neighborhood_pairs(
        _t(spark, sf_dir, "supplier"),
        id_col="s_suppkey",
        sort_col="s_name",
        window=3,
        max_edits=2,
    )


@register(
    "collocations_docs",
    oracle="""
    WITH tk AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS t
                FROM documents),
    big AS (SELECT t[i] AS token_a, t[i+1] AS token_b
            FROM tk, unnest(range(1, len(t))) AS u(i)),
    uni AS (SELECT unnest(t) AS tk FROM tk),
    uc AS (SELECT tk, count(*) AS c FROM uni GROUP BY tk),
    tot AS (SELECT sum(c) AS T FROM uc),
    pairs AS (SELECT token_a, token_b, count(*) AS n_pair
              FROM big GROUP BY 1, 2 HAVING count(*) >= 5),
    scored AS (
        SELECT p.token_a, p.token_b,
               CAST(p.n_pair AS BIGINT) AS n_pair,
               CAST(a.c AS BIGINT) AS n_a,
               CAST(b.c AS BIGINT) AS n_b,
               CAST((CAST(p.n_pair AS HUGEINT) * T * 1000000)
                    // (CAST(a.c AS HUGEINT) * b.c) AS BIGINT) AS lift_ppm
        FROM pairs p
        JOIN uc a ON a.tk = p.token_a
        JOIN uc b ON b.tk = p.token_b
        CROSS JOIN tot)
    SELECT * FROM scored
    ORDER BY lift_ppm DESC, token_a, token_b LIMIT 50
    """,
)
def q_collocations_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 corpus collocations (ops.text.collocations_top): adjacent
    bigrams ranked by integer lift c_ab·T·1e6 DIV (c_a·c_b) — the
    log-free PMI core, the phrase-mining / tokenizer-merge-candidate
    report. One bigram explode + three hash-aggs, unigram counts
    broadcast, TakeOrdered top-k."""
    return X.collocations_top(_t(spark, sf_dir, "documents"))
