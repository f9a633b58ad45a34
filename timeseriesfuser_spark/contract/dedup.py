"""Deduplication family: exact, n-gram Jaccard, MinHash LSH, SimHash,
clusters, line/passage/containment dedup, verdicts.

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



# --------------------------------------------------------------------------- #
# Dedup suite (documents)
# --------------------------------------------------------------------------- #


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS canonical_id
    FROM documents GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one hash-groupBy, map-side partial agg, single shuffle."""
    return D.exact_duplicates(_t(spark, sf_dir, "documents"))


_JT = 0.5
_JMAXDF = 64  # candidate-generation document-frequency cutoff


@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_SHINGLE_REL}),
    dfreq AS (SELECT sh, count(*) AS c FROM sh GROUP BY sh),
    rare AS (SELECT s.id, s.sh FROM sh s JOIN dfreq d USING (sh)
             WHERE d.c <= {_JMAXDF}),
    cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
             FROM rare a JOIN rare b ON a.sh = b.sh AND a.id < b.id),
    sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS intersection
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT c.id_a, c.id_b, intersection,
           sa.sz + sb.sz - intersection AS union_size,
           CAST(intersection AS DOUBLE) / (sa.sz + sb.sz - intersection) AS jaccard
    FROM cand c
    JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
    JOIN sizes sa ON sa.id = c.id_a
    JOIN sizes sb ON sb.id = c.id_b
    WHERE CAST(intersection AS DOUBLE) / (sa.sz + sb.sz - intersection) >= {_JT}
    """,
)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs. Candidates come from the
    df-capped inverted index (shingles in > _JMAXDF (=64) docs skipped —
    a hot shingle fans out df² pairs in the self-join, the documented
    100 TB killer of the uncapped baseline); jaccard is then EXACT over
    the full shingle sets (array_intersect verify). The oracle mirrors
    the same candidate rule; its intersection CTE may stay all-pairs
    because DuckDB only ever sees sf0.01."""
    return D.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), threshold=_JT, max_df=_JMAXDF
    )


def _minhash_between_sql() -> str:
    """Cross-corpus twin of :func:`_minhash_sql`: odd doc_ids are the
    'new shard', even the 'reference corpus'."""
    from timeseriesfuser_spark.ops.dedup import MINHASH_MASK

    r = _NH // _NB
    mins = ", ".join(
        f"min((h1 + {i} * h2) & {MINHASH_MASK}) AS h{i}" for i in range(_NH)
    )

    def side(tag: str, pred: str) -> str:
        bands = "\n        UNION ALL ".join(
            f"SELECT id, {b} AS band, md5(concat_ws(',', "
            + ", ".join(f"h{b * r + j}" for j in range(r))
            + f")) AS bkey FROM sig{tag}"
            for b in range(_NB)
        )
        return f"""
    sh{tag} AS ({_shingle_rel(f"(SELECT * FROM documents WHERE {pred})")}),
    hh{tag} AS (SELECT id,
                  CAST(concat('0x', substr(md5(sh), 1, 13)) AS BIGINT) AS h1,
                  CAST(concat('0x', substr(md5(sh), 14, 13)) AS BIGINT) AS h2
           FROM sh{tag}),
    sig{tag} AS (SELECT id, {mins} FROM hh{tag} GROUP BY id),
    bands{tag} AS ({bands}),
    sizes{tag} AS (SELECT id, count(*) AS sz FROM sh{tag} GROUP BY id)"""

    return f"""
    WITH {side('n', 'doc_id % 2 = 1')},
    {side('r', 'doc_id % 2 = 0')},
    cand AS (
        SELECT DISTINCT a.id AS new_id, b.id AS ref_id
        FROM bandsn a JOIN bandsr b ON a.band = b.band AND a.bkey = b.bkey
    ),
    inter AS (
        SELECT new_id, ref_id, count(*) AS intersection
        FROM cand
        JOIN shn sa ON sa.id = cand.new_id
        JOIN shr sb ON sb.id = cand.ref_id AND sb.sh = sa.sh
        GROUP BY new_id, ref_id
    )
    SELECT new_id, ref_id,
           CAST(intersection AS DOUBLE) / (sa.sz + sb.sz - intersection) AS jaccard
    FROM inter
    JOIN sizesn sa ON sa.id = new_id
    JOIN sizesr sb ON sb.id = ref_id
    WHERE CAST(intersection AS DOUBLE) / (sa.sz + sb.sz - intersection) >= {_MT}
    """


@register("cross_corpus_dedup", oracle=_minhash_between_sql())
def q_cross_corpus_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: the odd-doc_id 'new shard' checked against
    the even-doc_id 'reference corpus' via the asymmetric MinHash-LSH join
    (ops.dedup.minhash_lsh_pairs_between) — shared buckets only, never
    |new| x |ref|."""
    docs = _t(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs_between(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
        num_hashes=_NH,
        bands=_NB,
        threshold=_MT,
    )


@register("dedup_minhash_lsh", oracle=_minhash_sql())
def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup: per-row band keys (zero signature shuffles),
    banding equi-join with first-shared-band pair dedup, exact-Jaccard
    verification — the web-corpus scale path."""
    return D.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"),
        num_hashes=_NH,
        bands=_NB,
        threshold=_MT,
    )


@register(
    "dedup_clusters",
    # Component labels via DuckDB's recursive CTE: reach(x, r) holds every
    # (node, label-of-some-component-member); min(r) per node is the
    # component min — the same fixpoint the Spark min-label propagation
    # converges to.
    oracle=f"""
    WITH RECURSIVE pairs AS ({_minhash_sql()}),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.v, reach.r FROM edges e JOIN reach ON reach.id = e.u
    ),
    comp AS (SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id),
    cnt AS (SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id)
    SELECT comp.doc_id, comp.cluster_id, cnt.cluster_size
    FROM comp JOIN cnt USING (cluster_id)
    """,
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: MinHash-LSH pairs → distributed connected
    components (min-label propagation over the edge subgraph only) →
    (doc_id, cluster_id = canonical min id, cluster_size). The step a real
    dedup pipeline runs after pair generation to pick survivors."""
    return D.neardup_clusters(
        _t(spark, sf_dir, "documents"),
        num_hashes=_NH,
        bands=_NB,
        threshold=_MT,
    )


_SB, _SHAM = 48, 3


def _simhash_sql() -> str:
    hash_list = (
        "list_transform(list_distinct(tk), t -> "
        + _sql_hash64("t")
        + ")"
    )
    bit_terms = []
    for i in range(_SB):
        mask = 1 << i
        vote = (
            f"list_aggregate(list_transform(hs, h -> CASE WHEN h & {mask} != 0 "
            f"THEN 1 ELSE -1 END), 'sum')"
        )
        bit_terms.append(f"CASE WHEN {vote} > 0 THEN CAST({mask} AS BIGINT) ELSE 0 END")
    sim = " + ".join(bit_terms)
    nchunks = _SHAM + 1
    chunk = _SB // nchunks
    parts = []
    for c in range(nchunks):
        width = chunk if c < nchunks - 1 else _SB - chunk * (nchunks - 1)
        mask = ((1 << width) - 1) << (c * chunk)
        parts.append(f"SELECT id, sim, {c} AS chunk, sim & {mask} AS ckey FROM sig")
    blocks = "\n        UNION ALL ".join(parts)
    # Token-less docs form their own trivial dup-class: a star of
    # (min empty id, other empty id, hamming 0) pairs, never joined with
    # real text — the op's skew guard semantics (ops/dedup.py
    # simhash_pairs: at web scale millions of empty docs would otherwise
    # share one signature-0 bucket and emit C(n,2) pairs in one task).
    return f"""
    WITH hv AS (SELECT doc_id AS id, {hash_list} AS hs
                FROM (SELECT doc_id, {_TOKS} AS tk FROM documents)),
    ne AS (SELECT id, hs FROM hv WHERE hs IS NOT NULL AND len(hs) > 0),
    em AS (SELECT id FROM hv WHERE hs IS NULL OR len(hs) = 0),
    sig AS (SELECT id, {sim} AS sim FROM ne),
    blocks AS ({blocks})
    SELECT DISTINCT a.id AS id_a, b.id AS id_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS BIGINT) AS hamming
    FROM blocks a
    JOIN blocks b ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.id < b.id
    WHERE bit_count(xor(a.sim, b.sim)) <= {_SHAM}
    UNION ALL
    SELECT (SELECT min(id) FROM em) AS id_a, id AS id_b,
           CAST(0 AS BIGINT) AS hamming
    FROM em WHERE id != (SELECT min(id) FROM em)
    """


@register("dedup_simhash", oracle=_simhash_sql())
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: bit-vote fingerprints + pigeonhole chunk blocking."""
    out = D.simhash_pairs(
        _t(spark, sf_dir, "documents"), bits=_SB, max_hamming=_SHAM
    )
    return out.withColumn("hamming", F.col("hamming").cast("long"))


# line_dedup demo corpus: the raw documents are single-line bags of words,
# so the query deterministically re-lines each doc (8 tokens per line) and
# appends a constant boilerplate footer to every doc — which the operator
# must then detect (doc frequency 100+) and strip from all of them. Both
# engines build the same input expression, so the check is end-to-end.
_LD_FOOTER = "copyright 2024 example corp all rights reserved"
_LD_MIN_DF = 100


@register(
    "line_dedup",
    oracle=f"""
    WITH base AS (SELECT doc_id, split(text, ' ') AS tk FROM documents),
    built AS (
        SELECT doc_id,
               concat(
                   array_to_string(
                       [array_to_string(tk[g*8+1 : g*8+8], ' ')
                        FOR g IN range(0, (len(tk)+7)//8)],
                       chr(10)),
                   chr(10), '{_LD_FOOTER}') AS text
        FROM base
    ),
    l AS (
        SELECT doc_id, u.pos AS pos, u.ln AS ln
        FROM (SELECT doc_id, split(text, chr(10)) AS ls FROM built),
             unnest([{{'pos': i, 'ln': ls[i]}} FOR i IN range(1, len(ls)+1)]) AS t(u)
    ),
    b AS (SELECT ln FROM l GROUP BY ln HAVING count(DISTINCT doc_id) >= {_LD_MIN_DF}),
    m AS (SELECT l.doc_id, l.pos, l.ln, (b.ln IS NOT NULL) AS dropped
          FROM l LEFT JOIN b USING (ln))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN NOT dropped THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(COALESCE(string_agg(CASE WHEN NOT dropped THEN ln END,
                                   chr(10) ORDER BY pos), '')) AS dedup_md5
    FROM m GROUP BY doc_id
    """,
)
def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate line removal (ops.text.line_dedup): drop lines present
    in ≥N distinct docs, reassemble survivors in order. Input lines are
    built deterministically (8-token lines + a constant footer on every
    doc); the footer must be stripped corpus-wide. Compared via md5 of the
    reassembled text — byte-exact reassembly in both engines."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("__tk")
    )
    ng = F.expr("(size(__tk) + 7) DIV 8").cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), ng - 1),
        lambda g: F.concat_ws(" ", F.slice(F.col("__tk"), g * 8 + 1, 8)),
    )
    built = d.select(
        "doc_id",
        F.concat(
            F.concat_ws("\n", lines), F.lit("\n"), F.lit(_LD_FOOTER)
        ).alias("text"),
    )
    out = X.line_dedup(built, min_doc_count=_LD_MIN_DF)
    return out.select(
        "doc_id", "n_lines", "n_kept", F.md5("text_dedup").alias("dedup_md5")
    )


@register(
    "ngram_novelty",
    oracle=f"""
    WITH s AS ({_SHINGLE_REL}),
    o AS (SELECT id, min(id) OVER (PARTITION BY sh) AS first_id FROM s),
    a AS (SELECT id, count(*) AS n_shingles,
                 sum(CASE WHEN first_id = id THEN 1 ELSE 0 END) AS n_novel
          FROM o GROUP BY id)
    SELECT d.doc_id,
           CAST(COALESCE(a.n_shingles, 0) AS BIGINT) AS n_shingles,
           CAST(COALESCE(a.n_novel, 0) AS BIGINT) AS n_novel,
           CASE WHEN COALESCE(a.n_shingles, 0) > 0
                THEN CAST(a.n_novel AS DOUBLE) / CAST(a.n_shingles AS DOUBLE)
           END AS novelty
    FROM documents d LEFT JOIN a ON a.id = d.doc_id
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus n-gram novelty (ops.dedup.ngram_novelty): fraction of each
    doc's distinct 3-gram shingles first seen in that doc (owner = lowest
    doc_id). First-owner via a min window partitioned by shingle — one
    shuffle on the shingle key, no self-join."""
    return D.ngram_novelty(_t(spark, sf_dir, "documents"))


@register(
    "dedup_verdicts",
    oracle=f"""
    WITH RECURSIVE pairs AS ({_minhash_sql()}),
    edges AS (
        SELECT id_a AS u, id_b AS v FROM pairs
        UNION ALL
        SELECT id_b, id_a FROM pairs
    ),
    reach(id, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.v, reach.r FROM edges e JOIN reach ON reach.id = e.u
    ),
    comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
    ex AS (SELECT doc_id AS id,
                  min(doc_id) OVER (PARTITION BY md5(text)) AS ec
           FROM documents)
    SELECT ex.id AS doc_id,
           CASE WHEN ex.ec != ex.id THEN 'exact_dup'
                WHEN comp.cluster_id != ex.id THEN 'near_dup'
                ELSE 'keep' END AS verdict,
           (CASE WHEN ex.ec != ex.id THEN 'exact_dup'
                 WHEN comp.cluster_id != ex.id THEN 'near_dup'
                 ELSE 'keep' END = 'keep') AS keep,
           CAST(CASE WHEN ex.ec != ex.id THEN ex.ec
                     ELSE comp.cluster_id END AS BIGINT) AS canonical_id
    FROM ex JOIN comp ON comp.id = ex.id
    """,
)
def q_dedup_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The materialized per-doc keep/drop decision (ops.dedup.dedup_verdicts):
    exact content-hash dedup composed with MinHash-LSH near-dup clustering;
    survivor = lowest id, exact-dup reason takes precedence."""
    return D.dedup_verdicts(
        _t(spark, sf_dir, "documents"),
        num_hashes=_NH,
        bands=_NB,
        threshold=_MT,
    )


_PASS_TOK, _PASS_MAXPPM = 16, 500_000


@register(
    "passage_dedup",
    oracle=f"""
    WITH tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
                FROM documents),
    p AS (SELECT doc_id,
                 unnest([struct_pack(cs := s,
                                     pt := array_to_string(tk[s+1:s+{_PASS_TOK}], ' '))
                         FOR s IN range(0, len(tk), {_PASS_TOK})],
                        recursive := true)
          FROM tk),
    h AS (SELECT doc_id, cs, {_sql_hash64("pt")} AS hh FROM p),
    f AS (SELECT doc_id, cs,
                 row_number() OVER (PARTITION BY hh ORDER BY doc_id, cs) AS rn
          FROM h),
    per AS (SELECT doc_id, count(*) AS np,
                   sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS nd
            FROM f GROUP BY doc_id)
    SELECT doc_id,
           CAST(np AS BIGINT) AS n_passages,
           CAST(nd AS BIGINT) AS n_dup_passages,
           CAST(1000000 * nd // np AS BIGINT) AS dup_ppm,
           (1000000 * nd // np <= {_PASS_MAXPPM}) AS keep
    FROM per
    """,
)
def q_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level exact dedup (ops.dedup.passage_dedup): RefinedWeb-
    style — non-overlapping 16-token passages, corpus-wide first-occurrence
    ownership (min(struct) window on the passage hash), per-doc dup ratio
    and keep gate. Zero-shuffle chunking + one hash-key window + one
    hash-agg."""
    return D.passage_dedup(
        _t(spark, sf_dir, "documents"),
        passage_tokens=_PASS_TOK,
        max_dup_ppm=_PASS_MAXPPM,
    )


@register(
    "dedup_normalized",
    oracle=r"""
    SELECT md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
             AS content_hash,
           count(*) AS n_copies,
           min(doc_id) AS canonical_id
    FROM documents GROUP BY 1
    """,
)
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over NORMALIZED text (ops.dedup.exact_duplicates with
    normalize=True): whitespace-collapsed lowercase content hash, so
    case/spacing variants of the same document collapse to one group —
    the cheap first pass before near-dup machinery. Same one-shuffle
    hash-groupBy as dedup_exact."""
    return D.exact_duplicates(
        _t(spark, sf_dir, "documents"), normalize=True
    )


_CONT_T = 0.9


@register(
    "dedup_containment",
    oracle=f"""
    WITH sh AS ({_SHINGLE_REL}),
    sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
    inter AS (
        SELECT a.id AS id_a, b.id AS id_b, count(*) AS intersection
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
        GROUP BY a.id, b.id
    )
    SELECT i.id_a, i.id_b, CAST(i.intersection AS BIGINT) AS intersection,
           CAST(least(sa.sz, sb.sz) AS BIGINT) AS min_size,
           CAST(i.intersection AS DOUBLE) / least(sa.sz, sb.sz) AS containment
    FROM inter i
    JOIN sizes sa ON sa.id = i.id_a
    JOIN sizes sb ON sb.id = i.id_b
    WHERE CAST(i.intersection AS DOUBLE) / least(sa.sz, sb.sz) >= {_CONT_T}
    """,
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-containment dedup (ops.dedup.ngram_containment_pairs): pairs
    where the smaller doc's shingle set is >= 90% inside the larger's —
    the quote-inclusion/page-wrapper duplication that symmetric Jaccard
    under-scores. Same inverted-index join as the Jaccard baseline; one
    int/int division."""
    return D.ngram_containment_pairs(
        _t(spark, sf_dir, "documents"), threshold=_CONT_T
    )


@register(
    "streaming_dedup_exact",
    # Emission contract: exactly one emitted row per distinct key (exact
    # all-history dedup, watermark=None -> no state eviction, so the
    # surviving SET of keys is batch-order-independent even though WHICH
    # physical row survived is arrival-order-dependent). The registered
    # result projects only the key columns, the deterministic surface.
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest-time exact dedup driven THROUGH the driver
    harness (streaming.dedup_stream / dropDuplicates): first processed
    occurrence of each (user_id, event_type) key wins; the emitted key
    SET equals the batch DISTINCT regardless of micro-batch splits."""
    from timeseriesfuser_spark.contract._base import (
        _run_availablenow_to_memory,
    )
    from timeseriesfuser_spark.streaming import dedup_stream

    schema = _t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_ms = ts_epoch_ms_col(stream, "ts")
    ev = stream.select(
        ts_ms.cast("long").alias("__ts_ms"), "user_id", "event_type"
    )
    uniq = dedup_stream(
        ev, key_cols=["user_id", "event_type"], watermark=None,
        ts_col="__ts_ms",
    )
    emitted = _run_availablenow_to_memory(uniq, "sd")
    return emitted.select("user_id", "event_type")


@register(
    "streaming_dedup_watermarked",
    # Same deterministic surface as streaming_dedup_exact: the emitted
    # key SET. The watermark delay is SIZED FROM the batch lateness
    # profile (global max_late_ms, ceil-to-seconds + 1 s margin) — the
    # no-drop bound lateness_stats reports — so no row arrives below the
    # watermark and the set still equals batch DISTINCT; an undersized
    # delay would drop late keys (the multi-batch pytest shows exactly
    # that). State is bounded by the watermark horizon instead of
    # growing per distinct key forever.
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_streaming_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming exact dedup
    (streaming.dedup_stream / dropDuplicatesWithinWatermark) with the
    delay sized from ops.timeseries.lateness_stats — closing the loop
    the lateness profile opens: measure the out-of-order bound on a
    backfill sample, then run the bounded-state streaming dedup with
    exactly that horizon."""
    from timeseriesfuser_spark.contract._base import (
        _events,
        _run_availablenow_to_memory,
    )
    from timeseriesfuser_spark.ops.timeseries import lateness_stats
    from timeseriesfuser_spark.streaming import dedup_stream

    prof = (
        lateness_stats(_events(spark, sf_dir).withColumn("__g", F.lit(1)),
                       group_col="__g")
        .agg(F.max("max_late_ms").alias("m"))
        .first()
    )
    delay_s = int((prof["m"] or 0) // 1000 + 1)
    schema = _t(spark, sf_dir, "events").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_ms = ts_epoch_ms_col(stream, "ts")
    ev = stream.select(
        ts_ms.cast("long").alias("__ts_ms"), "user_id", "event_type"
    )
    uniq = dedup_stream(
        ev, key_cols=["user_id", "event_type"],
        watermark=f"{delay_s} seconds", ts_col="__ts_ms",
    )
    emitted = _run_availablenow_to_memory(uniq, "sdw")
    return emitted.select("user_id", "event_type")


@register(
    "lsh_recall_audit",
    # The exact ground truth is the UNCAPPED all-pairs n-gram Jaccard
    # (no df cutoff — fine at oracle scale); the found side is the
    # production MinHash pipeline (verify=True, so found ⊆ exact and
    # the gap is pure candidate-generation loss). Integer counts only —
    # no float hash hazard anywhere.
    oracle=f"""
    WITH sh AS ({_SHINGLE_REL}),
    sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
    inter AS (SELECT a.id AS ia, b.id AS ib, count(*) AS i
              FROM sh a JOIN sh b ON a.sh = b.sh AND a.id < b.id
              GROUP BY 1, 2),
    ex AS (SELECT ia, ib FROM inter
           JOIN sizes sa ON sa.id = ia JOIN sizes sb ON sb.id = ib
           WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= {_MT}),
    mh AS (SELECT id_a, id_b FROM ({_minhash_sql()})),
    c AS (SELECT (SELECT count(*) FROM ex) AS n_exact,
                 (SELECT count(*) FROM mh) AS n_found)
    SELECT CAST(n_exact AS BIGINT) AS n_exact,
           CAST(n_found AS BIGINT) AS n_found,
           CAST(CASE WHEN n_exact > 0
                     THEN n_found * 1000000 // n_exact END AS BIGINT)
               AS recall_ppm
    FROM c
    """,
)
def q_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash candidate-generation recall vs exact all-pairs n-gram
    Jaccard — the LSH twin of ann_recall/pq_recall: verification is
    exact, so every missed pair is a banding miss; the S-curve says
    (16 hashes, 4 bands) crosses 50% at s≈0.5 and this audit measures
    the realized number on the corpus. One row, exact-integer ppm."""
    docs = _t(spark, sf_dir, "documents")
    exact = D.ngram_jaccard_pairs(docs, threshold=_MT)
    found = D.minhash_lsh_pairs(
        docs, num_hashes=_NH, bands=_NB, threshold=_MT
    )
    ne = exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    nf = found.agg(F.count(F.lit(1)).cast("long").alias("n_found"))
    return ne.crossJoin(nf).select(
        "n_exact",
        "n_found",
        F.when(
            F.col("n_exact") > 0,
            F.expr("n_found * 1000000 DIV n_exact"),
        ).cast("long").alias("recall_ppm"),
    )


@register(
    "dedup_prefix_filter",
    # The oracle is the BRUTE-FORCE inverted-index jaccard (every pair
    # sharing >= 1 bigram shingle, exact integer threshold test) — a
    # deliberately different formulation from the op's prefix-filtered
    # candidate generation, so parity proves the prefix filter is
    # LOSSLESS (AllPairs/PPJoin's exactness claim), not just consistent.
    oracle="""
    WITH sh AS (SELECT doc_id AS id, unnest(list_distinct(
            [array_to_string(tk[i:i+1], ' ') FOR i IN range(1, len(tk))])) AS s
        FROM (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
              FROM documents)),
    sizes AS (SELECT id, count(*) AS sz FROM sh GROUP BY id),
    inter AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS i
              FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
              GROUP BY 1, 2)
    SELECT id_a, id_b,
           CAST(i AS BIGINT) AS intersection,
           CAST(sa.sz + sb.sz - i AS BIGINT) AS union_size,
           CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.id = id_a
    JOIN sizes sb ON sb.id = id_b
    WHERE i * 5 >= 2 * (sa.sz + sb.sz - i)
    """,
)
def q_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact set-similarity self-join (ops.dedup.set_similarity_pairs):
    bigram-shingle Jaccard >= 0.4 via AllPairs/PPJoin prefix filtering —
    sets sorted rarest-token-first, candidates only from prefix-token
    collisions + the size-ratio prune, exact array_intersect verify with
    the integer cross-product threshold test. The exact complement to
    dedup_minhash_lsh's probabilistic banding at the same threshold."""
    return D.set_similarity_pairs(
        _t(spark, sf_dir, "documents"), n=2, threshold=(2, 5)
    )
