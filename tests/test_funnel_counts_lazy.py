"""funnel_counts modernization (VERDICT r9 item #4): the op must build
ONE lazy plan — zero Spark jobs at construction (the pre-r10 form ran one
persist + one count per step) — while keeping the strict-sequence
semantics and output schema bit-identical."""

from pyspark.sql import Row


def _df(spark):
    rows = [
        Row(user_id=1, ts=10, event_type="A"),
        Row(user_id=1, ts=20, event_type="B"),
        Row(user_id=1, ts=30, event_type="C"),
        Row(user_id=2, ts=5, event_type="B"),
        Row(user_id=2, ts=10, event_type="A"),
        Row(user_id=3, ts=1, event_type="A"),
        Row(user_id=3, ts=2, event_type="B"),
        Row(user_id=4, ts=1, event_type="C"),
    ]
    return spark.createDataFrame(rows)


def test_lazy_construction_no_jobs(spark):
    from timeseriesfuser_spark.ops.behavior import funnel_counts
    from timeseriesfuser_spark.ops.util import cache_scope

    tracker = spark.sparkContext.statusTracker()
    with cache_scope():
        before = set(tracker.getJobIdsForGroup(None) or [])
        out = funnel_counts(_df(spark), ["A", "B", "C"])
        after = set(tracker.getJobIdsForGroup(None) or [])
        assert after == before, "funnel_counts ran jobs at construction"
        got = {r["step"]: r for r in out.collect()}
    assert [got[s]["n_users"] for s in "ABC"] == [3, 2, 1]
    assert got["A"]["conv_ppm"] == 1_000_000
    assert got["C"]["conv_ppm"] == 1_000_000 // 3


def test_schema_and_empty_base(spark):
    from timeseriesfuser_spark.ops.behavior import funnel_counts

    out = funnel_counts(_df(spark), ["Z", "A"], cache=False)
    assert [f.simpleString() for f in out.schema.fields] == [
        "step_idx:bigint", "step:string", "n_users:bigint", "conv_ppm:bigint",
    ]
    rows = {r["step_idx"]: r for r in out.collect()}
    assert rows[0]["n_users"] == 0 and rows[0]["conv_ppm"] is None
    assert rows[1]["n_users"] == 0 and rows[1]["conv_ppm"] is None


def test_matches_brute_force(spark):
    """Greedy first-qualifying chain vs a Python brute force on a
    deterministic pseudo-random event log (incl. duplicate timestamps)."""
    import itertools

    from timeseriesfuser_spark.ops.behavior import funnel_counts

    steps = ["s0", "s1", "s2", "s3"]
    rows = []
    state = 1234567
    for uid, i in itertools.product(range(40), range(12)):
        state = (state * 1103515245 + 12345) % (1 << 31)
        ts = state % 50
        state = (state * 1103515245 + 12345) % (1 << 31)
        ev = "s%d" % (state % 5)  # s4 = noise type
        rows.append(Row(user_id=uid, ts=ts, event_type=ev))

    def brute_depth(evts):
        t = None
        d = 0
        for s in steps:
            cand = [ts for ts, e in evts if e == s and (t is None or ts > t)]
            if not cand:
                break
            t = min(cand)
            d += 1
        return d

    byu = {}
    for r in rows:
        byu.setdefault(r.user_id, []).append((r.ts, r.event_type))
    depths = [brute_depth(v) for v in byu.values()]
    expect = [sum(1 for d in depths if d >= i + 1) for i in range(len(steps))]

    got = {
        r["step_idx"]: r["n_users"]
        for r in funnel_counts(
            spark.createDataFrame(rows), steps, cache=False
        ).collect()
    }
    assert [got[i] for i in range(len(steps))] == expect
