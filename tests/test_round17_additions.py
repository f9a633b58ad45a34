"""Round-17 additions (judge round 10 VERDICT items): the distributed
two-level peak-concurrency sweep (#4) and friends."""

from collections import defaultdict

import pytest

DAY = 86_400_000


def _py_peak(rows, gap, day_ms=DAY):
    """Pure-Python reference: per-user gap sessionization, sessions
    anchored to their start day, +1/−1 sweep with (t, delta) order."""
    byu = defaultdict(list)
    for u, t in rows:
        byu[u].append(t)
    spans = []
    for u, ts in byu.items():
        ts.sort()
        s = e = ts[0]
        for t in ts[1:]:
            if t - e > gap:
                spans.append((s, e))
                s = e = t
            else:
                e = t
        spans.append((s, e))
    days = defaultdict(list)
    counts = defaultdict(int)
    for s, e in spans:
        d = s // day_ms  # python floor — negative-safe
        counts[d] += 1
        days[d].append((s, 1))
        days[d].append((e + 1, -1))
    out = {}
    for d, b in days.items():
        b.sort()
        cur = peak = 0
        for _, dl in b:
            cur += dl
            peak = max(peak, cur)
        out[d] = (counts[d], peak)
    return out


def _rand_rows(n, n_users, span_ms, seed=7, offset=0):
    state = seed
    rows = []
    for _ in range(n):
        state = (state * 1103515245 + 12345) % (1 << 31)
        u = state % n_users
        state = (state * 1103515245 + 12345) % (1 << 31)
        rows.append((u, offset + state % span_ms))
    return rows


def _run_op(spark, rows, gap, **kw):
    from timeseriesfuser_spark.ops.behavior import peak_concurrency

    df = spark.createDataFrame(rows, "user_id bigint, ts bigint")
    got = peak_concurrency(df, gap, **kw).collect()
    return {r["day"]: (r["n_sessions"], r["peak_concurrent"]) for r in got}


def test_peak_concurrency_matches_python_reference(spark):
    rows = _rand_rows(800, 15, 4 * DAY)
    assert _run_op(spark, rows, 1_800_000) == _py_peak(rows, 1_800_000)


def test_peak_concurrency_bucket_size_invariant(spark):
    """The two-level merge is exact for ANY bucket width: a 1-second
    bucket grid (hundreds of buckets, every seam exercised) must equal
    the default hour grid."""
    rows = _rand_rows(500, 8, 2 * DAY)
    a = _run_op(spark, rows, 600_000, bucket_ms=1_000)
    b = _run_op(spark, rows, 600_000)
    assert a == b == _py_peak(rows, 600_000)


def test_peak_concurrency_negative_ts_floor_buckets(spark):
    """Pre-1970 timestamps: day and bucket assignment must FLOOR (pmod
    idiom), never truncate toward zero."""
    rows = _rand_rows(300, 6, 3 * DAY, offset=-2 * DAY)
    assert _run_op(spark, rows, 900_000) == _py_peak(rows, 900_000)


def test_peak_concurrency_tie_minus_before_plus(spark):
    """A session ending at t and another starting at t+1 are never
    concurrent: the −1 boundary at t+1 sorts before the +1."""
    rows = [(1, 0), (1, 1000), (2, 1001), (2, 2000)]
    assert _run_op(spark, rows, 600_000) == {0: (2, 1)}


def test_peak_concurrency_cross_day_session_anchors_to_start(spark):
    """One session spanning midnight counts toward its START day only,
    and its end boundary lands in that day's sweep (not day 1's)."""
    rows = [(1, DAY - 1000), (1, DAY + 1000), (2, DAY + 500), (2, DAY + 900)]
    got = _run_op(spark, rows, 600_000)
    # u1's whole sweep (incl. its past-midnight end) belongs to day 0;
    # day 1 sees only u2 — peaks stay per-anchor-day, the oracle contract
    assert got == {0: (1, 1), 1: (1, 1)} == _py_peak(rows, 600_000)


def test_peak_concurrency_validates_args(spark):
    from timeseriesfuser_spark.ops.behavior import peak_concurrency

    df = spark.createDataFrame([(1, 0)], "user_id bigint, ts bigint")
    with pytest.raises(ValueError):
        peak_concurrency(df, 0)
    with pytest.raises(ValueError):
        peak_concurrency(df, 1000, bucket_ms=0)


# ---------------------------------------------------------------------------
# VERDICT r10 #3: block-size cap for the blocked-cosine family


def _emb_rows(n, block_of, dim=8, seed=3):
    rows = []
    state = seed
    for i in range(n):
        vec = []
        for d in range(dim):
            state = (state * 1103515245 + 12345) % (1 << 31)
            vec.append(((state % 2001) - 1000) / 1000.0)
        rows.append((i, block_of(i), vec))
    return rows


def _brute_pairs(rows, threshold, scale=1000):
    """Reference pairs via the op's own quantized-integer arithmetic."""
    import math

    out = set()
    q = {i: [round(x * scale) for x in v] for i, _, v in rows}
    blk = {i: b for i, b, _ in rows}
    norms = {i: sum(x * x for x in v) for i, v in q.items()}
    ids = sorted(q)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if blk[a] != blk[b] or norms[a] == 0 or norms[b] == 0:
                continue
            dot = sum(x * y for x, y in zip(q[a], q[b]))
            cos = round(dot / (math.sqrt(norms[a]) * math.sqrt(norms[b])), 6)
            if cos >= threshold:
                out.add((a, b))
    return out


def test_blocked_cosine_exact_below_cap(spark):
    """Every block at/under the cap: result == brute force (the cap is
    invisible — plan untouched, zero recall loss)."""
    from timeseriesfuser_spark import ops

    rows = _emb_rows(60, lambda i: i % 6)  # blocks of 10
    df = spark.createDataFrame(
        rows, "vec_id bigint, label bigint, embedding array<double>"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in ops.blocked_cosine_pairs(
            df, threshold=-1.0, max_block=10
        ).collect()
    }
    assert got == _brute_pairs(rows, -1.0)


def test_blocked_cosine_hot_block_split_is_deterministic_subset(spark):
    """One giant block over an explicit cap: emitted pairs are exactly
    the brute-force pairs whose endpoints share a hash sub-block — a
    deterministic, bounded subset; no false pairs, and two runs agree."""
    from pyspark.sql import functions as F

    from timeseriesfuser_spark import ops

    rows = _emb_rows(60, lambda i: 0)  # ONE block of 60
    cap = 7
    n_sub = -(-60 // cap)  # ceil
    df = spark.createDataFrame(
        rows, "vec_id bigint, label bigint, embedding array<double>"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in ops.blocked_cosine_pairs(
            df, threshold=-1.0, max_block=cap
        ).collect()
    }
    sub = {
        r["vec_id"]: r["s"]
        for r in df.select(
            "vec_id", F.pmod(F.xxhash64("vec_id"), F.lit(n_sub)).alias("s")
        ).collect()
    }
    want = {
        (a, b) for a, b in _brute_pairs(rows, -1.0) if sub[a] == sub[b]
    }
    assert got == want and got  # non-trivial subset survives
    got2 = {
        (r["id_a"], r["id_b"])
        for r in ops.blocked_cosine_pairs(
            df, threshold=-1.0, max_block=cap
        ).collect()
    }
    assert got2 == got


def test_blocked_cosine_planted_pair_recall_with_cap(spark):
    """A planted identical pair in a SMALL block survives any cap
    (exactness below the cap is the recall contract)."""
    from timeseriesfuser_spark import ops

    rows = _emb_rows(40, lambda i: 0 if i < 30 else 1)
    # plant an identical pair in the small block (ids 38, 39)
    rows[38] = (38, 1, rows[39][2])
    df = spark.createDataFrame(
        rows, "vec_id bigint, label bigint, embedding array<double>"
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in ops.blocked_cosine_pairs(
            df, threshold=0.999, max_block=12
        ).collect()
    }
    assert (38, 39) in got


def test_blocked_cosine_cap_off_and_auto_match_below_default(spark):
    """max_block=None and the 'auto' default agree when no block nears
    DEFAULT_MAX_BLOCK (the common certified-scale case)."""
    from timeseriesfuser_spark import ops

    rows = _emb_rows(50, lambda i: i % 5)
    df = spark.createDataFrame(
        rows, "vec_id bigint, label bigint, embedding array<double>"
    )
    a = {
        (r["id_a"], r["id_b"])
        for r in ops.blocked_cosine_pairs(df, threshold=-1.0).collect()
    }
    b = {
        (r["id_a"], r["id_b"])
        for r in ops.blocked_cosine_pairs(
            df, threshold=-1.0, max_block=None
        ).collect()
    }
    assert a == b == _brute_pairs(rows, -1.0)


def test_semantic_dedup_pairs_cap_param(spark):
    """semantic_dedup_pairs: the cluster-blocked family shares the same
    guard — an explicit cap on a hot cluster bounds pairs to sub-blocks,
    and auto (no hot clusters) equals None."""
    from timeseriesfuser_spark import ops

    rows = _emb_rows(30, lambda i: 0)
    df = spark.createDataFrame(
        rows, "vec_id bigint, label bigint, embedding array<double>"
    )
    cents = spark.createDataFrame(
        [rows[0], rows[15]], "vec_id bigint, label bigint, embedding array<double>"
    )
    base = {
        (r["keep_id"], r["drop_id"])
        for r in ops.semantic_dedup_pairs(
            df, cents, threshold=-1.0, max_block=None
        ).collect()
    }
    auto = {
        (r["keep_id"], r["drop_id"])
        for r in ops.semantic_dedup_pairs(
            df, cents, threshold=-1.0
        ).collect()
    }
    assert auto == base and base
    capped = {
        (r["keep_id"], r["drop_id"])
        for r in ops.semantic_dedup_pairs(
            df, cents, threshold=-1.0, max_block=5
        ).collect()
    }
    assert capped < base  # strict subset: the hot cluster was split


# ---------------------------------------------------------------------------
# VERDICT r10 #8: tools/ab.py — interleaved A/B harness


def test_interleaved_ab_structure_and_interleaving(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    from tools.ab import interleaved_ab

    calls = []

    def arm_a(s):
        calls.append("a")
        return s.range(1000)

    def arm_b(s):
        calls.append("b")

    out = interleaved_ab(
        spark, {"a": arm_a, "b": arm_b}, rounds=2, warmup=1,
        control_rounds=1,
    )
    # Interleaved AND counterbalanced: the within-round order alternates
    # (a,b / b,a / a,b), never block-style (a,a,a,b,b,b) and never the
    # same order every round — a null A/B (identical arms, r15) measured
    # the slot right after a query's own previous run 0.65-0.87× faster,
    # so a fixed order systematically flatters the last-listed arm.
    assert calls == ["a", "b", "b", "a", "a", "b"]
    assert set(out["arms"]) == {"a", "b"}
    for st in out["arms"].values():
        assert len(st["times"]) == 2  # warmup round discarded
        assert st["min"] <= st["median"]
        assert st["normalized"] is not None
    assert out["control_sec"] > 0
    assert "ratio_min" in out


# ---------------------------------------------------------------------------
# VERDICT r10 #6: PPJoin positional filter A/B toggle


def test_positional_filter_toggle_is_result_invariant(spark):
    """_positional_filter=False (the benchmark A/B arm) changes only
    candidate volume, never the exact verified result."""
    from timeseriesfuser_spark.ops.dedup import set_similarity_pairs

    rows = []
    for i in range(40):
        toks = [f"w{(i * 3 + j) % 25}" for j in range(8)]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    on = {
        (r["id_a"], r["id_b"], r["intersection"], r["union_size"])
        for r in set_similarity_pairs(
            df, n=1, threshold=(2, 5), cache=False
        ).collect()
    }
    off = {
        (r["id_a"], r["id_b"], r["intersection"], r["union_size"])
        for r in set_similarity_pairs(
            df, n=1, threshold=(2, 5), cache=False, _positional_filter=False
        ).collect()
    }
    assert on == off and on
