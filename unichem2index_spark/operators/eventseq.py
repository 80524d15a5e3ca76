"""Event-sequence operators: a generic AS-OF JOIN primitive (the classic
operator Spark's join zoo lacks) and an EQL-style sequence query built
on it (ES Event Query Language: `sequence by user_id [A] [B] within N`).

As-of join implementation — the union-tag trick, NOT a range join:
tag right rows 0 and left rows 1, union, ONE window per key ordered by
(ts, tag, id) carrying the last right payload forward. A naive
`left.ts BETWEEN right.ts AND right.ts + tol` range join explodes to
O(|L| x |R| / keys) candidate pairs; the union-tag plan is one shuffle
on the key and one linear pass per partition — the same plan shape at
any tolerance, which is why kdb/Flink/QuestDB all serve as-of this way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    right_payload: list[str],
    strict: bool = False,
) -> DataFrame:
    """For every left row: the latest right row with the same ``by`` key
    and ``right.ts <= left.ts`` (``strict=True``: ``<``). Returns the
    left rows plus ``asof_<col>`` for each payload column (NULL when no
    right row precedes). One shuffle (the union's window partition), one
    linear pass — no range-join explosion."""
    lcols = left.columns
    rsel = right.select(
        F.col(by), F.col(ts), F.lit(0).alias("_tag"),
        F.struct(*[F.col(c) for c in [ts, *right_payload]]).alias("_p"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}")
          for c in lcols],
    )
    lsel = left.select(
        F.col(by), F.col(ts), F.lit(1).alias("_tag"),
        F.lit(None).cast(rsel.schema["_p"].dataType).alias("_p"),
        *[F.col(c).alias(f"_l_{c}") for c in lcols],
    )
    u = rsel.unionByName(lsel)
    # At equal ts, rights sort before lefts (tag 0 < 1); the frame end
    # makes <= (current row: the masked left contributes NULL anyway)
    # vs < (exclude same-ts rights via 1 PRECEDING… which also excludes
    # unordered same-ts rights — so strict mode orders rights AFTER).
    # The payload struct is the deterministic FINAL key: when several
    # right rows share (by, ts), F.last must carry the same one at any
    # partitioning/run — without it the carried payload is whichever
    # row the shuffle happened to order last. Left rows all have a NULL
    # payload, so the extra key never reorders them.
    order = [
        F.col(ts),
        F.col("_tag") if not strict else (1 - F.col("_tag")),
        F.col("_p"),
    ]
    w = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    carried = u.withColumn(
        "_asof", F.last(F.when(F.col("_tag") == 0, F.col("_p")), True).over(w)
    )
    out = carried.where(F.col("_tag") == 1).select(
        *[F.col(f"_l_{c}").alias(c) for c in lcols],
        *[F.col(f"_asof.{c}").alias(f"asof_{c}") for c in [ts, *right_payload]],
    )
    return out


def eql_sequence(
    spark: SparkSession,
    t,
    first: str = "click",
    then: str = "then-unset",
    within_sec: float = 7200.0,
) -> DataFrame:
    """EQL `sequence by user_id [event_type == first] [event_type ==
    then] within N seconds` (the ES security-analytics query language):
    every ``then`` event paired with its MOST RECENT strictly-preceding
    ``first`` event by the same user inside the window. (EQL's full
    engine additionally consumes matched events — non-overlapping
    sequences; this is the lookback-join reading, the shape every
    funnel/attribution pipeline runs. Documented scope.)

    One window pass per user over only the two event types (pushed
    type-IN filter), then the gap predicate — no self-join, no range
    explosion."""
    then = "purchase" if then == "then-unset" else then
    ev = t["events"].select("event_id", "ts", "user_id", "event_type")
    e = ev.where(F.col("event_type").isin([first, then]))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lastf = F.last(
        F.when(
            F.col("event_type") == first,
            F.struct(F.col("ts").alias("fts"), F.col("event_id").alias("fid")),
        ),
        True,
    ).over(w)
    m = e.withColumn("_f", lastf).where(
        (F.col("event_type") == then) & F.col("_f").isNotNull()
    )
    # Exact integer microsecond diff, ONE divide — identical doubles in
    # both engines (epoch-double subtraction would lose ulps at 1.7e9 s).
    gap = (
        F.expr("timestampdiff(MICROSECOND, _f.fts, ts)").cast("double")
        / F.lit(1000000.0)
    )
    return (
        m.where(gap <= F.lit(float(within_sec)))
        .select(
            "user_id",
            F.col("_f.fid").alias("first_event_id"),
            F.col("event_id").alias("second_event_id"),
            F.round(gap, 6).alias("gap_sec"),
        )
        .orderBy("second_event_id")
    )


def sessionize(
    spark: SparkSession, t, gap_sec: int = 1800
) -> DataFrame:
    """Sessionization — the classic event-analytics operator (ES gets it
    from Transforms/session scripts; Spark has it NATIVE): group each
    user's events into sessions separated by gaps > ``gap_sec``. Uses
    Spark's built-in ``session_window`` aggregation (the same operator
    the streaming path uses with watermarks, so this batch query IS the
    streaming query), emitting per session: first/last event time,
    event count, exact duration. The DuckDB oracle derives identical
    sessions via the gaps-and-islands window idiom — two independent
    formulations, one answer.

    Scale shape: ONE shuffle on user_id (the session_window agg);
    map-side partial aggregation applies; no self-join, no sort beyond
    the per-key grouping."""
    ev = t["events"]
    agg = (
        ev.groupBy(
            "user_id", F.session_window("ts", f"{int(gap_sec)} seconds")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
        .drop("session_window")
    )
    return finish_sessions(agg)


def finish_sessions(agg: DataFrame) -> DataFrame:
    """Shared session projection: per-user sequence number + exact
    duration over (user_id, n_events, start_ts, end_ts) rows — used by
    batch :func:`sessionize` and the streaming twin's collected result
    (the window/ordering parts streaming aggregation cannot express)."""
    w = Window.partitionBy("user_id").orderBy("start_ts")
    return (
        agg.withColumn("session_seq", F.row_number().over(w))
        .select(
            "user_id",
            "session_seq",
            "n_events",
            "start_ts",
            "end_ts",
            F.round(
                F.expr("timestampdiff(MICROSECOND, start_ts, end_ts)")
                .cast("double")
                / F.lit(1000000.0),
                6,
            ).alias("duration_sec"),
        )
        .orderBy("user_id", "session_seq")
    )


def funnel(
    spark: SparkSession,
    t,
    steps: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """3-step funnel conversion (the event-analytics staple): users who
    did step1, then step2 AFTER their first step1, then step3 AFTER that
    first qualifying step2 — strictly ordered first-touch attribution.
    Per step: user count and conversion vs the previous step.

    Plan shape: three per-user min aggregations chained by equi-joins on
    user_id with the time predicate as the join filter (never a range
    join); each stage's frame is one row per surviving user."""
    ev = t["events"].select("user_id", "ts", "event_type")
    s1, s2, s3 = steps
    t1 = ev.where(F.col("event_type") == s1).groupBy("user_id").agg(
        F.min("ts").alias("t1")
    )
    t2 = (
        ev.where(F.col("event_type") == s2)
        .join(t1, "user_id")
        .where(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.where(F.col("event_type") == s3)
        .join(t2, "user_id")
        .where(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    n1, n2, n3 = t1.count(), t2.count(), t3.count()
    rows = [
        (1, s1, n1, 100.0),
        (2, s2, n2, round(n2 / n1 * 100.0, 6) if n1 else 0.0),
        (3, s3, n3, round(n3 / n2 * 100.0, 6) if n2 else 0.0),
    ]
    return spark.createDataFrame(
        rows, "step int, event_type string, n_users long, pct_of_prev double"
    ).orderBy("step")


# Cohort retention / frequent-item-sets: the two product-analytics
# queries every event warehouse serves daily (Amplitude/Mixpanel
# retention curves; the ES 8.x `frequent_item_sets` agg).

# frequent_item_sets minimum support as an exact fraction (29/200 =
# 0.145): the keep/drop decision compares INTEGERS (n_baskets * DEN >=
# n_total * NUM), never a rounded float, so both engines pick the same
# pairs regardless of division order.
FIS_SUPPORT_NUM = 29
FIS_SUPPORT_DEN = 200


def retention_cohort(spark: SparkSession, t) -> DataFrame:
    """Cohort retention curve: users grouped by first-active day (their
    cohort), and for each day offset since that first day, how many of
    the cohort were active again — the classic triangular retention
    table (day-0 row = cohort size by construction).

    Scale shape: first-active day is ONE hash agg on user_id; the
    activity join is keyed on the same user_id, so the agg output's
    partitioning is reused and only the events side shuffles once; the
    (cohort, offset) rollup aggregates to ~cohorts x horizon rows — tiny
    at any event count. The cohort_size window runs over those reduced
    rows only (same bounded-window pattern as the pipeline aggs). The
    retention ratio divides exact ints and rounds once, shared with the
    oracle."""
    e = t["events"].select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("day")
    )
    firstd = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    act = (
        e.join(firstd, "user_id")
        .groupBy(
            "cohort_day",
            # cast: Spark datediff is INT, DuckDB date_diff is BIGINT —
            # emit int64 on both sides (driver-canon dtype parity).
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("long")
            .alias("offset_days"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )
    w = Window.partitionBy("cohort_day")
    return (
        act.withColumn(
            "cohort_size",
            F.max(
                F.when(F.col("offset_days") == 0, F.col("n_active"))
            ).over(w),
        )
        .select(
            "cohort_day",
            "offset_days",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
        .orderBy("cohort_day", "offset_days")
    )


def frequent_item_sets(spark: SparkSession, t) -> DataFrame:
    """ES 8.x ``frequent_item_sets`` aggregation (2-item sets): which
    event-type pairs co-occur in the same basket — basket = (user_id,
    day) — with support >= FIS_SUPPORT_NUM/FIS_SUPPORT_DEN. The ES agg
    runs Eclat over transactions; for pair-size itemsets the exact
    answer is one self-join on the basket key over the DEDUPLICATED
    (basket, item) frame.

    Scale shape: the distinct (basket, item) frame is bounded by
    baskets x item-vocabulary (event types — tens, not millions), so
    the self-join fan-out per basket is C(items_in_basket, 2), a small
    constant; one shuffle on the basket key, then a hash agg onto the
    pair space (|types|^2 rows at most). No all-pairs over users or
    events. The support threshold compares exact integers (see
    FIS_SUPPORT_*), so engines can't disagree at the boundary."""
    b = (
        t["events"]
        .select(
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("day"),
            "event_type",
        )
        .distinct()
    )
    tot = b.select("user_id", "day").distinct().select(
        F.count(F.lit(1)).alias("n_total")
    )
    pairs = (
        b.alias("a")
        .join(b.alias("bb"), ["user_id", "day"])
        .where(F.col("a.event_type") < F.col("bb.event_type"))
        .groupBy(
            F.col("a.event_type").alias("item_a"),
            F.col("bb.event_type").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_baskets"))
    )
    return (
        pairs.crossJoin(F.broadcast(tot))
        .where(
            F.col("n_baskets") * F.lit(FIS_SUPPORT_DEN)
            >= F.col("n_total") * F.lit(FIS_SUPPORT_NUM)
        )
        .select(
            "item_a",
            "item_b",
            "n_baskets",
            F.round(F.col("n_baskets") / F.col("n_total"), 6).alias("support"),
        )
        .orderBy("item_a", "item_b")
    )


def eql_sequence_until(
    spark: SparkSession,
    t,
    first: str = "click",
    then: str = "purchase",
    until: str = "error",
    within_sec: float = 7200.0,
) -> DataFrame:
    """EQL ``sequence by user_id [first] [then] until [until]``: the
    :func:`eql_sequence` pairing with EQL's UNTIL guard — an ``until``
    event arriving between the first and second steps KILLS the pending
    sequence (the "session reset / logout invalidates the chain"
    semantics security rules lean on).

    Same one-window shape as eql_sequence with a THIRD tracked type:
    the window carries the most recent preceding ``first`` and
    ``until`` markers; a ``then`` row matches iff the first marker
    exists, fits the gap, and the last until marker (if any) is OLDER
    than it — a lexicographic (ts, event_id) struct comparison, the
    same total order the window itself uses, so ties resolve
    identically on both engines."""
    ev = t["events"].select("event_id", "ts", "user_id", "event_type")
    e = ev.where(F.col("event_type").isin([first, then, until]))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lastf = F.last(
        F.when(
            F.col("event_type") == first,
            F.struct(F.col("ts").alias("fts"), F.col("event_id").alias("fid")),
        ),
        True,
    ).over(w)
    lastu = F.last(
        F.when(
            F.col("event_type") == until,
            F.struct(F.col("ts").alias("uts"), F.col("event_id").alias("uid")),
        ),
        True,
    ).over(w)
    m = e.withColumn("_f", lastf).withColumn("_u", lastu).where(
        (F.col("event_type") == then) & F.col("_f").isNotNull()
    )
    gap = (
        F.expr("timestampdiff(MICROSECOND, _f.fts, ts)").cast("double")
        / F.lit(1000000.0)
    )
    alive = F.col("_u").isNull() | (
        F.struct(F.col("_u.uts"), F.col("_u.uid"))
        < F.struct(F.col("_f.fts"), F.col("_f.fid"))
    )
    return (
        m.where((gap <= F.lit(float(within_sec))) & alive)
        .select(
            "user_id",
            F.col("_f.fid").alias("first_event_id"),
            F.col("event_id").alias("second_event_id"),
            F.round(gap, 6).alias("gap_sec"),
        )
        .orderBy("second_event_id")
    )


def transform_pivot(spark: SparkSession, t) -> DataFrame:
    """ES ``_transform`` (pivot mode): the entity-centric index — events
    grouped by entity (user_id) into one summary doc per entity, the
    continuous-transform destination a Kibana entity dashboard reads.
    Aggs per user: event count, purchase count, exact total of the
    integer ``props.k`` amount, distinct event types, first/last seen.

    Spark shape: a pivot transform IS one hash aggregate — ES runs it
    as checkpointed composite-agg pages (its scroll over group keys);
    Spark's shuffle does the paging implicitly and AQE sizes the
    partitions. The incremental/continuous form is the same plan run
    by streaming/incremental.py's foreachBatch with the checkpointed
    high-watermark (T1) — batch and continuous share semantics, like
    batch sessionize vs stream_sessionize. Exact integers; timestamps
    pass through untouched."""
    e = t["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select(
            "user_id",
            "event_type",
            "ts",
            k.alias("k"),
        )
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias(
                "n_purchases"
            ),
            F.sum("k").alias("total_k"),
            F.count_distinct("event_type").alias("n_types"),
            F.min("ts").alias("first_seen"),
            F.max("ts").alias("last_seen"),
        )
        .orderBy("user_id")
    )


def rollup_search(spark: SparkSession, t) -> DataFrame:
    """ES rollup (`_rollup/job` + `_rollup_search`): an HOURLY rollup
    index is materialized from raw events (date_histogram × event_type
    with count + sum metrics), and a DAILY query is answered FROM THE
    ROLLUP ONLY — never touching raw data. The returned frame is the
    rollup-served answer; the DuckDB oracle computes the same daily
    aggregate DIRECTLY from raw events, so the hash check PROVES the
    rollup path is exact (counts and integer sums re-aggregate
    losslessly when the query's calendar buckets align with the
    rollup's — the rollup contract ES documents).

    Scale shape: the rollup build is one hash agg whose output is
    ~hours × types rows — the stored index is orders of magnitude
    smaller than raw; the serving query aggregates only those reduced
    rows. At 100 TB the rollup frame is what lands in the store
    (SegmentStore commit protocol) and serving never rescans raw —
    the exact ES cost model."""
    e = t["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    rollup = (
        e.select(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
            k.alias("k"),
        )
        .groupBy("hour", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sk"),
        )
    )
    return (
        rollup.groupBy(
            F.date_trunc("day", F.col("hour")).alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("sk").alias("total_k"),
        )
        .orderBy("day", "event_type")
    )


def eql_sequence_pipes(
    spark: SparkSession,
    t,
    first: str = "click",
    then: str = "purchase",
    within_sec: float = 7200.0,
    head: int = 10,
) -> DataFrame:
    """EQL pipes over sequence output: ``sequence ... | unique user_id
    | head N`` — EQL's post-processing stage. ``unique`` keeps each
    key's FIRST match in match order (sequences complete in second-
    event order, so match order == second_event_id order — the EQL
    engine's emission order), ``head`` then cuts the stream to N.

    Scale shape: the unique step is one row_number window on the SAME
    user_id partitioning the sequence window already produced (no new
    shuffle key), and head is a LIMIT after a sort over the already-
    reduced match frame — pipes never touch raw events again, exactly
    EQL's pipe contract (pipes run on matches, not the index)."""
    seq = eql_sequence(spark, t, first, then, within_sec)
    w = Window.partitionBy("user_id").orderBy("second_event_id")
    return (
        seq.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .drop("_rk")
        .orderBy("second_event_id")
        .limit(int(head))
    )


def eql_sample(
    spark: SparkSession,
    t,
    first: str = "view",
    then: str = "purchase",
    min_value: float = 50.0,
    n_keys: int = 20,
) -> DataFrame:
    """EQL ``sample by user_id [any where type == first] [any where
    type == then and value > v]`` (ES 8.6): UNORDERED event-set
    matching — keys that have at least one event matching EVERY filter,
    with one representative event per filter. Unlike ``sequence``,
    time order between the steps does not matter.

    Deterministic reading (documented): ES returns "the most recent"
    event per filter and an unspecified choice of keys; here the
    representative is the strict (ts, event_id)-max per key per filter,
    and the sampled keys are the ``n_keys`` smallest user_ids — a total
    order on both choices, so the result is layout-invariant.

    Plan shape: each filter branch is a pushed-down scan filter + one
    window partitioned by user_id (rows-desc row_number, kept row 1);
    the branches then inner-join on user_id — same key as the windows,
    so AQE reuses the exchange. No cross-filter explosion: each branch
    is at most one row per key before the join."""
    ev = t["events"].select("event_id", "ts", "user_id", "event_type", "value")

    def pick(cond, prefix):
        w = Window.partitionBy("user_id").orderBy(
            F.desc("ts"), F.desc("event_id")
        )
        return (
            ev.where(cond)
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select(
                "user_id",
                F.col("event_id").alias(f"{prefix}_event_id"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
        )

    a = pick(F.col("event_type") == first, "s1")
    b = pick(
        (F.col("event_type") == then) & (F.col("value") > min_value), "s2"
    )
    return (
        a.join(b, "user_id")
        .orderBy("user_id")
        .limit(n_keys)
    )


def next_event_markov(spark: SparkSession, t) -> DataFrame:
    """First-order Markov transition table over each user's event
    stream: P(next event type | current) from per-user (ts, event_id)-
    ordered lag pairs — the model behind next-action prediction,
    anomaly scoring, and funnel-dropoff triage in every event pipeline.
    Counts are exact integers; the one probability divide rounds at
    emit; (from, to) ordering makes the frame hash-stable.

    Scale shape: ONE window per user (bounded partitions) to form the
    lag pairs, then a map-side-combined count agg over (from, to) — at
    10^12 events the transition matrix is |types|² rows, trivially
    small."""
    e = t["events"]
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            "user_id",
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("tot"))
    return (
        pairs.join(tot, "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )
