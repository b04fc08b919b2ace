"""Temporal join and rollup operators: as-of join, interval (range) join,
multi-granularity hypertable rollup.

Beyond-reference extensions (SURVEY §7.2): the reference's event handling is
row-at-a-time pandas; a training-data pipeline at 100 TB needs the classic
time-series operators expressed as shuffle-bounded DataFrame plans:

* :func:`asof_join` — the "latest right row at or before each left row" join
  (kdb ``aj``, pandas ``merge_asof``, DuckDB ``ASOF JOIN``). Implemented as
  the union-sort trick: ONE shuffle on the ``by`` key, a sort within
  partitions, and a running ``last(..., ignorenulls=True)`` window — the same
  cost shape as a sort-merge join, with no row explosion and no inequality
  nested-loop.
* :func:`interval_join` — point-in-interval range join. A naive inequality
  join degenerates to BroadcastNestedLoop; here intervals are exploded into
  fixed-width time buckets (bounded fan-out = interval_len/bucket + 1) and
  the join becomes an equi-join on ``(by, bucket)`` + an exact residual
  filter. Each point lives in exactly one bucket, so no post-join dedup is
  needed.
* :func:`hypertable_rollup` — hour/day/week rollups computed in ONE pass via
  ``GROUPING SETS`` (TimescaleDB continuous-aggregate shape): one shuffle
  produces every granularity instead of one scan+shuffle per grain.

All three are pure Catalyst plans — no Python in the hot path.
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "epoch_us",
    "asof_join",
    "interval_join",
    "interval_overlap_join",
    "hypertable_rollup",
    "timeline_features",
]


def epoch_us(col: Union[str, Column]) -> Column:
    """Microseconds since epoch for a timestamp of ANY flavor.

    ``F.unix_micros`` rejects TIMESTAMP_NTZ (the type the driver's parquet
    testdata now yields — no-timezone micros), so every temporal operator
    goes through this helper: the cast to TIMESTAMP interprets NTZ values in
    the session timezone, which :mod:`bio2bel_spark.tables` pins to UTC, so
    the result equals the naive wall-clock epoch and matches DuckDB's
    ``epoch_us`` on the same parquet values bit-for-bit. On a column that is
    already TIMESTAMP the cast is a no-op.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | Sequence[str] = "user_id",
    tolerance_sec: float | None = None,
    right_suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with ``right.on <=
    left.on`` within the same ``by`` group (backward as-of, inclusive), or —
    with ``direction="forward"`` — the earliest right row with ``right.on >=
    left.on``, or — with ``direction="nearest"`` — whichever of the two is
    closer in absolute time, ties preferring backward (pandas ``merge_asof``
    direction semantics). Forward is the same one-shuffle plan scanned in
    descending time order; nearest evaluates both frames over one ascending
    sort, still one shuffle.

    Union-sort plan (scale rationale in the module docstring):

    1. tag sides (right=0, left=1 so a right row at the exact same timestamp
       sorts first and is therefore visible to the left row — inclusive
       semantics, matching DuckDB ``ASOF JOIN ... ON l.ts >= r.ts``);
    2. union on ``(by, on, side, right-payload struct)``;
    3. ``last(payload, ignorenulls=True)`` over a running window per ``by``;
    4. keep left rows, unpack the struct, apply the optional tolerance.

    Right-side ties on ``(by, on)`` are broken deterministically by the
    payload struct's natural ordering (max wins). Left columns keep their
    names; right payload columns get ``right_suffix``.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    by_cols = [by] if isinstance(by, str) else list(by)
    rpay_cols = [c for c in right.columns if c not in set(by_cols)]
    lpay_cols = [c for c in left.columns if c not in {*by_cols, on}]

    # a null-timestamp right row is "at or before" nothing, but Spark's
    # nulls-first sort would make it the running match for every left row —
    # drop it. Null-timestamp LEFT rows sort first, see no payload, and
    # surface with a null match (left-join contract preserved).
    r = right.where(F.col(on).isNotNull()).select(
        *[F.col(c) for c in by_cols],
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in rpay_cols]).alias("__rpay"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in lpay_cols],
    )
    l = left.select(
        *[F.col(c) for c in by_cols],
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__rpay"].dataType).alias("__rpay"),
        *[F.col(c).alias(f"__l_{c}") for c in lpay_cols],
    )

    # secondary sort on the payload struct makes equal-timestamp right rows
    # resolve deterministically (last == struct-max). The forward scan must
    # put NULL timestamps FIRST (desc sorts nulls last by default) so a
    # null-timestamp left row still sees no payload and keeps its null match.
    if direction == "nearest":
        # still ONE shuffle: both candidates come from two frames over the
        # SAME ascending sort — a running last() for the backward match and
        # a following-frame first() for the forward match. A right row at
        # the exact left timestamp sorts before the left row (side 0), lands
        # in the backward frame with gap 0, and wins — so its absence from
        # the forward frame is unobservable. Equal |gap| prefers backward
        # (pandas merge_asof nearest tie rule).
        base = Window.partitionBy(*by_cols).orderBy(
            F.col("__t").asc(), F.col("__side"), F.col("__rpay")
        )
        wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        # the forward frame orders equal-timestamp right rows struct-DESC so
        # first() picks the struct-max payload — the same duplicate-right-
        # timestamp tie convention backward/forward use (last over asc).
        # Same partitioning as `base`, so Catalyst adds a Sort inside the
        # one Exchange, not a second shuffle (asserted in tests).
        wf = (
            Window.partitionBy(*by_cols)
            .orderBy(
                F.col("__t").asc(), F.col("__side"), F.col("__rpay").desc()
            )
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        u = (
            r.unionByName(l)
            .withColumn("__mb", F.last("__rpay", ignorenulls=True).over(wb))
            .withColumn("__mf", F.first("__rpay", ignorenulls=True).over(wf))
        )
        bgap = epoch_us("__t") - epoch_us(F.col("__mb")[on])
        fgap = epoch_us(F.col("__mf")[on]) - epoch_us("__t")
        pick = (
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(bgap <= fgap, F.col("__mb"))
            .otherwise(F.col("__mf"))
        )
        # a null-timestamp left row sorts first and must match nothing —
        # without the guard the forward frame would hand it a future payload
        matched = (
            u.filter(F.col("__side") == 1)
            .withColumn("__m", F.when(F.col("__t").isNotNull(), pick))
            .drop("__mb", "__mf")
        )
    else:
        t_order = (
            F.col("__t").asc()
            if direction == "backward"
            else F.col("__t").desc_nulls_first()
        )
        w = (
            Window.partitionBy(*by_cols)
            .orderBy(t_order, F.col("__side"), F.col("__rpay"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = (
            r.unionByName(l)
            .withColumn("__m", F.last("__rpay", ignorenulls=True).over(w))
            .filter(F.col("__side") == 1)
        )

    if tolerance_sec is not None:
        gap = epoch_us("__t") - epoch_us(F.col("__m")[on])
        if direction == "forward":
            gap = -gap
        elif direction == "nearest":
            gap = F.abs(gap)
        within = F.col("__m").isNotNull() & (
            gap <= int(tolerance_sec * 1_000_000)
        )
        matched = matched.withColumn(
            "__m", F.when(within, F.col("__m"))
        )

    out_cols = [F.col(c) for c in by_cols]
    out_cols.append(F.col("__t").alias(on))
    out_cols += [F.col(f"__l_{c}").alias(c) for c in lpay_cols]
    out_cols += [
        F.col("__m")[c].alias(c + right_suffix) for c in rpay_cols
    ]
    return matched.select(*out_cols)


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    point_ts: str = "ts",
    start: str = "start",
    end: str = "end",
    by: str | Sequence[str] | None = None,
    bucket_sec: int = 3600,
    max_buckets: int = 10_000,
) -> DataFrame:
    """Join each point to every interval containing it: ``start <= ts < end``
    (end-exclusive), optionally per ``by`` key.

    The interval side explodes into the fixed-width buckets it covers
    (``sequence`` over bucket ids — fan-out bounded by
    ``ceil(interval_len / bucket_sec) + 1``); the point side maps each row to
    its single bucket; the join is then a plain shuffled equi-join on
    ``(by, bucket)`` with the exact containment predicate as a residual
    filter. Because a point has exactly one bucket, matches are already
    unique — no dedup shuffle.

    ``max_buckets`` fails the job LOUDLY (ANSI error, names the limit) if any
    single interval would explode past it — one corrupt row (end = year
    9999) must not silently materialize millions of bucket rows at 100 TB.
    Widen ``bucket_sec`` or raise the cap for genuinely long intervals.
    """
    by_cols = ([by] if isinstance(by, str) else list(by)) if by else []
    bucket_us = bucket_sec * 1_000_000

    b0 = (epoch_us(start) / bucket_us).cast("long")
    # end-exclusive: an interval ending exactly on a bucket edge does not
    # cover that bucket
    b1 = ((epoch_us(end) - 1) / bucket_us).cast("long")
    # assert_true returns NULL on pass; folding it into the live sequence
    # bound (coalesce -> +0) keeps the check in the plan — a detached column
    # would be pruned by the optimizer
    guard = F.coalesce(
        F.assert_true(
            b1 - b0 < F.lit(max_buckets),
            F.concat(
                F.lit(
                    f"interval_join: interval spans more than {max_buckets}"
                    f" buckets of {bucket_sec}s (start="
                ),
                F.col(start).cast("string"),
                F.lit(", end="),
                F.col(end).cast("string"),
                F.lit("); widen bucket_sec or raise max_buckets"),
            ),
        ).cast("long"),
        F.lit(0),
    )
    # empty/reversed intervals (end <= start) cover no buckets: gate the
    # sequence on b1 >= b0 so they emit zero rows instead of a DESCENDING
    # sequence (negative span also passes the < max_buckets assert)
    iv = intervals.withColumn(
        "__bucket", F.explode(F.when(b1 >= b0, F.sequence(b0, b1 + guard)))
    )
    pt = points.withColumn(
        "__bucket", (epoch_us(point_ts) / bucket_us).cast("long")
    )
    cond = [pt["__bucket"] == iv["__bucket"]]
    for c in by_cols:
        cond.append(pt[c] == iv[c])
    cond.append(pt[point_ts] >= iv[start])
    cond.append(pt[point_ts] < iv[end])

    joined = pt.join(iv, cond, "inner")
    keep = [pt[c] for c in points.columns]
    keep += [iv[c] for c in intervals.columns if c not in set(by_cols)]
    return joined.select(*keep)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
    by: str | Sequence[str] | None = None,
    bucket_sec: int = 3600,
    max_buckets: int = 10_000,
    suffix: str = "_r",
) -> DataFrame:
    """Interval×interval overlap join: pairs whose half-open intervals
    have a NON-EMPTY intersection — ``l.start < r.end AND r.start < l.end``
    with both intervals themselves non-empty — optionally per ``by`` key.
    (The raw two-inequality predicate alone would claim an EMPTY interval
    sitting strictly inside another "overlaps" it; an empty interval
    intersects nothing, and empty/reversed intervals here participate in
    nothing, matching :func:`interval_join`.)

    Both sides explode into covered buckets and equi-join on ``(by,
    bucket)``. An overlapping pair shares every bucket its intersection
    covers, which would duplicate it once per shared bucket — instead each
    pair is emitted ONLY from its owner bucket, the bucket of
    ``max(l.start, r.start)`` (the first bucket of the intersection). The
    ownership predicate is a pure residual filter, so no post-join
    ``distinct`` shuffle is needed. Fan-out guards as in
    :func:`interval_join`.
    """
    by_cols = ([by] if isinstance(by, str) else list(by)) if by else []
    bucket_us = bucket_sec * 1_000_000

    def _explode(df: DataFrame, start: str, end: str) -> DataFrame:
        b0 = (epoch_us(start) / bucket_us).cast("long")
        b1 = ((epoch_us(end) - 1) / bucket_us).cast("long")
        guard = F.coalesce(
            F.assert_true(
                b1 - b0 < F.lit(max_buckets),
                F.concat(
                    F.lit(
                        f"interval_overlap_join: interval spans more than "
                        f"{max_buckets} buckets of {bucket_sec}s (start="
                    ),
                    F.col(start).cast("string"),
                    F.lit(", end="),
                    F.col(end).cast("string"),
                    F.lit("); widen bucket_sec or raise max_buckets"),
                ),
            ).cast("long"),
            F.lit(0),
        )
        # empty/reversed intervals intersect nothing and must emit no
        # buckets. The b1 >= b0 gate alone is NOT enough: an empty interval
        # strictly inside one bucket has b1 == b0 (only boundary-sitting
        # empties get b1 < b0), and unlike interval_join's containment
        # predicate the two-inequality overlap residual does not reject it —
        # the bucket width would leak into the SEMANTICS (found by the
        # brute-force property test). Gate on genuine non-emptiness too.
        return df.withColumn(
            "__bucket",
            F.explode(
                F.when(
                    (F.col(end) > F.col(start)) & (b1 >= b0),
                    F.sequence(b0, b1 + guard),
                )
            ),
        )

    l = _explode(left, left_start, left_end)
    r = _explode(right, right_start, right_end)
    cond = [l["__bucket"] == r["__bucket"]]
    for c in by_cols:
        cond.append(l[c] == r[c])
    cond.append(l[left_start] < r[right_end])
    cond.append(r[right_start] < l[left_end])
    # owner bucket: emit the pair only where the intersection begins
    inter_start = F.greatest(
        epoch_us(l[left_start]), epoch_us(r[right_start])
    )
    cond.append(l["__bucket"] == (inter_start / bucket_us).cast("long"))

    joined = l.join(r, cond, "inner")
    keep = [l[c] for c in left.columns]
    keep += [
        r[c].alias(c + suffix if c in set(left.columns) else c)
        for c in right.columns
        if c not in set(by_cols)
    ]
    return joined.select(*keep)


def hypertable_rollup(
    events: DataFrame,
    ts: str = "ts",
    dims: Sequence[str] = ("event_type",),
    grains: Sequence[str] = ("hour", "day", "week"),
    aggs: Sequence[Column] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Multi-granularity time rollup in a single scan.

    Default path (``aggs=None``) is HIERARCHICAL: aggregate raw rows once at
    the finest grain, then re-aggregate that (tiny) result for each coarser
    grain — every grain truncates from the finest bucket, which is exact for
    any coarser ``date_trunc``. The full-size shuffle moves each raw row
    ONCE; a ``GROUPING SETS`` plan's Expand would multiply shuffle input by
    the number of grains (3× a 100 TB table). Raw sums are kept unrounded
    until output so re-aggregation stays exact to 2dp.

    Custom ``aggs`` fall back to the single-pass ``GROUPING SETS`` plan
    (correct for non-reaggregable aggregates like count-distinct, at the
    Expand cost). ``grains`` must be ordered finest-first (the default is).
    Output either way: ``(grain, *dims, bucket, <aggs>)``.

    The default path sums ``value_col`` (``"value"``); tables without that
    column must either rename, pass ``value_col``, or supply custom ``aggs``.
    """
    if aggs is None:
        if value_col not in events.columns:
            raise ValueError(
                f"hypertable_rollup: default aggregates need a {value_col!r} "
                f"column (have {events.columns}); pass value_col= or aggs=[...]"
            )
        finest, coarser = grains[0], list(grains[1:])
        fine = events.groupBy(
            *dims, F.date_trunc(finest, F.col(ts)).alias("bucket")
        ).agg(
            F.count(F.lit(1)).alias("__n"),
            F.sum(value_col).alias("__sum"),
        )
        from bio2bel_spark.operators.caching import tracked_persist

        if coarser:
            fine = fine.transform(tracked_persist)
        out = fine.select(
            F.lit(finest).alias("grain"),
            *dims,
            "bucket",
            F.col("__n").alias("n_events"),
            F.round(F.col("__sum"), 2).alias("total_value"),
        )
        for grain in coarser:
            rolled = (
                fine.groupBy(
                    *dims, F.date_trunc(grain, F.col("bucket")).alias("bucket")
                )
                .agg(F.sum("__n").alias("__n"), F.sum("__sum").alias("__sum"))
                .select(
                    F.lit(grain).alias("grain"),
                    *dims,
                    "bucket",
                    F.col("__n").alias("n_events"),
                    F.round(F.col("__sum"), 2).alias("total_value"),
                )
            )
            out = out.unionByName(rolled)
        return out
    aggs = list(aggs)
    g = events
    for grain in grains:
        g = g.withColumn(f"__g_{grain}", F.date_trunc(grain, F.col(ts)))
    grain_cols = [f"__g_{grain}" for grain in grains]

    sets = [[*dims, gc] for gc in grain_cols]
    grouped = g.groupingSets(sets, *[F.col(c) for c in [*dims, *grain_cols]])

    # label each output row with its grain and coalesce the bucket column;
    # grouping() is 0 for the column actually present in the row's set
    grain_label = F.coalesce(
        *[
            F.when(F.grouping(gc) == 0, F.lit(grain))
            for grain, gc in zip(grains, grain_cols)
        ]
    )
    out = grouped.agg(
        grain_label.alias("grain"),
        F.coalesce(*[F.col(gc) for gc in grain_cols]).alias("bucket"),
        *aggs,
    ).drop(*grain_cols)
    agg_names = [c for c in out.columns if c not in {*dims, "grain", "bucket"}]
    return out.select("grain", *dims, "bucket", *agg_names)


def timeline_features(
    events: DataFrame,
    ts: str = "ts",
    by: str = "user_id",
    value_col: str = "value",
    id_col: str = "event_id",
    type_col: str = "event_type",
    lookback_sec: int = 3600,
) -> DataFrame:
    """Per-entity ordered-timeline features — the standard window-function
    feature block of an event-stream training pipeline (lag/lead, running
    total, short rolling mean, and a TIME-range trailing window).

    One shuffle (partition by ``by``); every feature is a Catalyst window
    expression over the same ``(by)`` partitioning, ordered by
    ``(ts, id_col)`` so ties resolve identically on any engine. The trailing
    ``lookback_sec`` aggregates use a RANGE frame over epoch microseconds —
    event-time, not row-count, so the semantics survive irregular sampling.

    Returns the input key columns plus::

        prev_value     value of the previous event (null at the head)
        gap_sec        seconds since the previous event, 6dp
        next_type      event_type of the next event (null at the tail)
        running_sum    cumulative sum of value, 2dp
        moving_avg3    mean of the last 3 rows (incl. current), 6dp
        n_trailing     events in the trailing lookback window (incl. current)
        sum_trailing   value sum over that window, 2dp
    """
    order = [F.col(ts).asc(), F.col(id_col).asc()]
    w = Window.partitionBy(by).orderBy(*order)
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w3 = w.rowsBetween(-2, Window.currentRow)
    us = epoch_us(ts)
    wrange = (
        Window.partitionBy(by)
        .orderBy(us.asc())
        .rangeBetween(-lookback_sec * 1_000_000, 0)
    )
    gap = (us - F.lag(us).over(w)) / 1_000_000.0
    return events.select(
        F.col(id_col),
        F.col(by),
        F.lag(value_col).over(w).alias("prev_value"),
        F.round(gap, 6).alias("gap_sec"),
        F.lead(type_col).over(w).alias("next_type"),
        F.round(F.sum(value_col).over(wrows), 2).alias("running_sum"),
        F.round(F.avg(value_col).over(w3), 6).alias("moving_avg3"),
        F.count(F.lit(1)).over(wrange).alias("n_trailing"),
        F.round(F.sum(value_col).over(wrange), 2).alias("sum_trailing"),
    )
