"""Corpus language-model scoring: bigram-LM likelihood proxy and a
fastText-style hashed linear quality classifier.

The standard pretraining-data quality stack scores documents with (a) a
KenLM-ish n-gram model trained on the corpus (or a trusted corpus) —
low-likelihood docs are gibberish/boilerplate — and (b) a cheap linear
classifier over hashed bag-of-words features (fastText's architecture).
Both are expressed here as pure DataFrame plans with exact-integer
arithmetic so a SQL oracle matches bit-for-bit.

Scale design
------------

``bigram_lm_score``: one aggregation over the exploded (persisted) bigram
relation builds the bigram counts; the left-unigram counts are derived
from THOSE (a pass over distinct bigrams, not occurrences); the
per-bigram conditional probability (ppm, integer) is attached back by an
equi-join. Default ``broadcast=False`` leaves the join to AQE, which
auto-broadcasts the model when its runtime size is small (the Zipf case)
and shuffles otherwise — measured 44.6 s vs 65.8 s forced-broadcast at 1M
synthetic docs whose bigrams are near-unique (model ≈ input sized).
``broadcast=True`` is the explicit hint for known-small trusted-corpus
models. The Zipf-skewed occurrence side is safe either way: the model
side is one row per key.

``hashed_classifier_score`` is pure projection — per-token weights are
md5-derived on the fly (exactly how a served fastText model hashes OOV
buckets), so there is NO weight table, no join, no shuffle of any kind.
Swapping in real trained weights = one broadcast join against a (bucket,
weight) relation; the plan shape is otherwise identical.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from timeseriesfuser_spark.ops.util import track_persist

from timeseriesfuser_spark.ops.dedup import md5_hash64
from timeseriesfuser_spark.ops.text import tokens_col

_PPM = 1_000_000


def bigram_array(text: Column) -> Column:
    """Ordered (non-distinct) word-bigram strings "w1 w2" of ``text``.

    Token array bound through a single-element ``transform`` lambda so the
    regex tokenization runs once per row, not once per bigram (see
    ``ops.dedup.shingle_array``)."""
    toks = tokens_col(text)

    def grams_of(tk: Column) -> Column:
        starts = F.when(
            F.size(tk) >= 2, F.sequence(F.lit(1), F.size(tk) - 1)
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(starts, lambda i: F.concat_ws(" ", F.slice(tk, i, 2)))

    return F.element_at(F.transform(F.array(toks), grams_of), 1)


def bigram_lm_score(
    df: DataFrame,
    id_cols: Sequence[str] = ("doc_id",),
    text_col: str = "text",
    *,
    broadcast: bool = False,
    cache: bool = True,
) -> DataFrame:
    """Score every document under the corpus's own bigram model.

    For each bigram occurrence (w1, w2) the conditional probability
    P(w2|w1) is estimated as ``c2(w1,w2) / c1(w1)`` where c2 counts the
    bigram corpus-wide and c1 counts w1 as a bigram-left (so the estimate
    is a proper conditional: Σ_w2 P(w2|w1) = 1). Stored integer-exact in
    parts-per-million: ``ppm = c2 * 1e6 DIV c1``.

    Output per doc: ``n_bigrams``, ``sum_ppm`` (Σ over bigram OCCURRENCES
    — exact int), ``min_ppm`` (the rarest transition), and ``avg_ppm`` =
    one final double division. Docs with < 2 tokens emit n_bigrams = 0 and
    null scores. Low sum/avg ⇒ improbable word transitions ⇒ gibberish —
    the decision axis a KenLM perplexity filter uses.
    """
    ids = [F.col(c) for c in id_cols]
    bg = df.select(
        *ids, F.explode_outer(bigram_array(F.col(text_col))).alias("bg")
    )
    # The exploded occurrence relation feeds the model build AND the score
    # join — Catalyst re-executes shared branches, so persist it once
    # (ops.dedup._maybe_cache lesson; tokenize+explode is the dominant
    # cost and must not run twice).
    if cache:
        from pyspark import StorageLevel

        bg = track_persist(bg.persist(StorageLevel.MEMORY_AND_DISK))
    # Model: bigram counts; left-unigram counts derived FROM the bigram
    # counts (Σ c2 over bigrams sharing w1) — one pass over the much
    # smaller distinct-bigram relation instead of a second pass over the
    # occurrences. w1 = prefix of the joined string (cheaper than
    # re-tokenizing; tokens contain no spaces by construction).
    w1 = F.substring_index(F.col("bg"), " ", 1)
    c2 = bg.filter(F.col("bg").isNotNull()).groupBy("bg").agg(
        F.count(F.lit(1)).alias("c2")
    )
    c1 = c2.groupBy(w1.alias("w1")).agg(F.sum("c2").alias("c1"))
    model = c2.join(
        c1, F.substring_index(c2["bg"], " ", 1) == c1["w1"], "inner"
    ).select(
        c2["bg"].alias("__mbg"),
        F.expr("c2 * 1000000 DIV c1").cast("long").alias("__ppm"),
    )
    if broadcast:
        model = F.broadcast(model)
    scored = bg.join(model, bg["bg"] == model["__mbg"], "left")
    n = F.count(F.col("bg"))
    out = scored.groupBy(*id_cols).agg(
        n.cast("long").alias("n_bigrams"),
        F.sum("__ppm").alias("sum_ppm"),
        F.min("__ppm").alias("min_ppm"),
        F.when(n > 0, F.sum("__ppm").cast("double") / n).alias("avg_ppm"),
    )
    return out


def token_weight(tok: Column, *, n_buckets: int = 1 << 20, span: int = 1000) -> Column:
    """Deterministic per-token classifier weight in [-span, span].

    The token is hashed into ``n_buckets`` feature buckets (fastText's
    hashing trick) and the bucket's weight is md5-derived — a stand-in for
    a trained weight vector with identical plan shape and an exact SQL
    twin. Two independent md5 draws (bucket, then weight-of-bucket) so
    colliding tokens share ONE weight, as a real hashed model would.
    """
    bucket = F.pmod(md5_hash64(tok, seed=17), F.lit(n_buckets))
    w = md5_hash64(F.concat(F.lit("qw:"), bucket.cast("string")))
    return (F.pmod(w, F.lit(2 * span + 1)) - F.lit(span)).cast("long")


def hashed_classifier_score(
    df: DataFrame,
    id_cols: Sequence[str] = ("doc_id",),
    text_col: str = "text",
    *,
    n_buckets: int = 1 << 20,
    span: int = 1000,
    bias: int = 0,
) -> DataFrame:
    """fastText-style linear scorer: logit = bias + mean(weight(token)).

    Per doc: ``n_tokens``, ``sum_weight`` (exact int Σ of hashed-bucket
    weights over token OCCURRENCES), ``logit`` (one double division) and
    ``label_keep`` — the integer-exact decision ``sum + bias·n > 0`` (no
    float threshold, so the flag is oracle-bit-identical).

    Zero shuffle: one projection with a bound token array; the aggregate
    over tokens happens INSIDE the row via ``F.aggregate``.
    """
    def doc_score(tk):
        return F.aggregate(
            tk,
            F.lit(0).cast("long"),
            lambda acc, t: acc + token_weight(t, n_buckets=n_buckets, span=span),
        )

    # Bind the token array once (single-element transform lambda — the
    # projection-collapse guard used by minhash_signatures; see NOTES.md).
    bound = F.element_at(
        F.transform(
            F.array(tokens_col(F.col(text_col))),
            lambda tk: F.struct(
                F.size(tk).alias("n"), doc_score(tk).alias("s")
            ),
        ),
        1,
    )
    # NULL text → null token array → null struct fields; a null document
    # has zero tokens and is dropped (label false), not propagated-null —
    # the oracle's COALESCE semantics (caught by test_null_robustness).
    n = F.coalesce(F.col("__sc.n"), F.lit(0)).cast("long")
    s = F.coalesce(F.col("__sc.s"), F.lit(0).cast("long"))
    return df.withColumn("__sc", bound).select(
        *id_cols,
        n.alias("n_tokens"),
        s.alias("sum_weight"),
        F.when(
            n > 0, F.lit(float(bias)) + s.cast("double") / n.cast("double")
        ).alias("logit"),
        (s + F.lit(int(bias)) * n > 0).alias("label_keep"),
    )


def curation_verdicts(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    lm_min_avg_ppm: int = 30_000,
    n_buckets: int = 1 << 20,
    span: int = 1000,
) -> DataFrame:
    """The end-of-pipeline per-document curation decision: exact-duplicate
    check, Gopher quality gate, hashed-classifier label, and bigram-LM
    likelihood threshold composed into one keep/drop verdict with the
    first-failing-stage reason — the quality counterpart of
    ``ops.dedup.dedup_verdicts``.

    Stage precedence (first failure wins, the order a real pipeline
    applies them): ``exact_dup`` → ``gopher:<rule>`` → ``classifier`` →
    ``low_lm_score`` → ``keep``. The LM test is the integer inequality
    ``Σppm ≥ lm_min_avg_ppm · n_bigrams`` (avg ≥ threshold without a
    float compare); bigram-less docs pass it vacuously (the token-count
    gate already catches them).

    Scale: each component keeps its own plan shape (hash/groupBy dedup,
    zero-shuffle gates, LM model join); the composition is four per-doc
    relations equi-joined on the id.
    """
    from timeseriesfuser_spark.ops.text import quality_filter

    hashed = df.select(
        F.col(id_col).alias("id"),
        # sentinel: NULL-text docs form one exact-dup group instead of
        # being dropped by the null-keyed join back (see dedup_verdicts)
        F.coalesce(F.md5(F.col(text_col)), F.lit("__NULL_TEXT__")).alias("__h"),
    )
    canon = hashed.groupBy("__h").agg(F.min("id").alias("__canon"))
    exact = hashed.join(canon, "__h").select(
        "id", (F.col("__canon") != F.col("id")).alias("__is_dup")
    )
    qf = quality_filter(df, text_col, (id_col,)).select(
        F.col(id_col).alias("id"),
        F.col("keep").alias("__qf_keep"),
        F.col("drop_reason").alias("__qf_reason"),
    )
    cls = hashed_classifier_score(
        df, (id_col,), text_col, n_buckets=n_buckets, span=span
    ).select(F.col(id_col).alias("id"), F.col("label_keep").alias("__cls_keep"))
    lm = bigram_lm_score(df, (id_col,), text_col).select(
        F.col(id_col).alias("id"),
        (
            F.coalesce(F.col("sum_ppm"), F.lit(0))
            >= F.lit(int(lm_min_avg_ppm)) * F.col("n_bigrams")
        ).alias("__lm_keep"),
    )
    j = exact.join(qf, "id").join(cls, "id").join(lm, "id")
    verdict = (
        F.when(F.col("__is_dup"), F.lit("exact_dup"))
        .when(~F.col("__qf_keep"), F.concat(F.lit("gopher:"), F.col("__qf_reason")))
        .when(~F.col("__cls_keep"), F.lit("classifier"))
        .when(~F.col("__lm_keep"), F.lit("low_lm_score"))
        .otherwise(F.lit("keep"))
    )
    return j.select(
        F.col("id").alias(id_col),
        verdict.alias("verdict"),
        (verdict == "keep").alias("keep"),
    )
