"""Deterministic synthetic CDC change-log generator.

Every event is a *pure column-expression function of its logical
sequence id* (``xxhash64``-keyed), so the generator is fully
distributed: ``spark.range(10**10)`` streams through the apply kernel
without ever materializing data on the driver, and the same
``(seed, n_events)`` pair always produces byte-identical events —
the property the replay-equivalence tests (SURVEY.md §5 target plan)
and the bench protocol (BASELINE.md) both require.

Scenario knobs mirror FIXTURES.md §F2: duplicate deliveries,
out-of-order timestamps, tombstones, mid-stream schema change (the
``tool`` column), Zipf-ish hot conversations, and garbage keys
(null ``conv_id`` / negative ``turn_idx`` → quarantine path, the
analog of the reference's "prevent partition garbage" rule,
``sql/02_SDI_SA360/01_BRONZE/MERGE/01_merge_sdi_bronze_sa360_campaign_daily.sql:12,130-132``).

Semantics of the log (the contract the oracle reducer also follows):
- key = ``(conv_id, turn_idx)``
- last-writer-wins order = ``(ts DESC, lsn DESC)``; ``lsn`` is unique
  per logical event, so ordering is total and replay deterministic
  (mirrors the reference's ``file_load_datetime/filename/__insert_date``
  tie-breakers, same file ``:139-142``).
- the winning event's ``op`` decides presence: ``D`` → key absent.
- duplicate deliveries re-emit an *earlier logical event verbatim*
  (same lsn, same payload), exactly like a redelivered vendor file.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CDC_COLUMNS = ["op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "lsn", "commit_lsn"]

BASE_EPOCH = 1767225600  # 2026-01-01T00:00:00Z — fixed, no now() dependence

_ROLES = ("user", "assistant", "system", "tool")
_TOOLS = ("search", "python", "browser", "sql", "editor")


def _h(eid: Column, seed: int, tag: str) -> Column:
    """Deterministic 64-bit hash stream keyed by (event id, seed, tag)."""
    return F.xxhash64(eid, F.lit(seed), F.lit(tag))


def _u(eid: Column, seed: int, tag: str) -> Column:
    """Deterministic uniform [0,1) derived from the hash stream."""
    return F.pmod(_h(eid, seed, tag), F.lit(1_000_000)) / F.lit(1_000_000.0)


def change_log(
    spark: SparkSession,
    n_events: int,
    *,
    n_convs: int = 1_000,
    turns_per_conv: int = 50,
    seed: int = 42,
    hot_key_frac: float = 0.15,
    dup_frac: float = 0.05,
    delete_frac: float = 0.03,
    garbage_frac: float = 0.01,
    tool_from_frac: float = 0.5,
    ooo_window_s: int = 3600,
    event_gap_s: float = 0.001,
    commit_size: int = 100_000,
    num_partitions: int | None = None,
    id_range: tuple[int, int] | None = None,
) -> DataFrame:
    """Generate ``n_events`` CDC events with schema ``CDC_COLUMNS``.

    ``hot_key_frac`` of events hit one hot conversation (``conv_00000000``)
    — the skew case the salted/partial-agg dedupe path must absorb.
    Events with id >= ``tool_from_frac * n_events`` may carry a non-null
    ``tool`` value (the mid-stream schema-evolution point; callers that
    want the column *physically absent* early should
    ``.drop("tool")`` on the pre-evolution slice — see
    :func:`split_for_schema_evolution`).

    ``id_range=(lo, hi)`` generates only that slice of the log *without
    scanning the rest* (every event is a pure function of its id, so a
    slice is just ``spark.range(lo, hi)``) — the right way to feed
    batches of a 10^10-event replay; ``n_events`` stays the logical
    total so distribution knobs (``tool_from_frac`` boundary) are
    unchanged. Equivalent to ``change_log(spark, n).filter(lo <= lsn <
    hi)`` but O(slice), not O(total).
    """
    lo, hi = id_range if id_range is not None else (0, n_events)
    rng = spark.range(lo, hi, 1, num_partitions) if num_partitions else spark.range(lo, hi)
    pid = F.col("id")

    # Duplicate deliveries: re-emit an earlier logical event verbatim.
    is_dup = (_u(pid, seed, "dup") < F.lit(dup_frac)) & (pid > 100)
    eid = F.when(is_dup, pid - (F.pmod(_h(pid, seed, "dupoff"), F.lit(97)) + 1)).otherwise(pid)

    g = _u(eid, seed, "garbage")
    is_garbage_null = g < F.lit(garbage_frac / 2)
    is_garbage_neg = (g >= F.lit(garbage_frac / 2)) & (g < F.lit(garbage_frac))

    is_hot = _u(eid, seed, "hot") < F.lit(hot_key_frac)
    conv_num = F.when(is_hot, F.lit(0)).otherwise(F.pmod(_h(eid, seed, "conv"), F.lit(n_convs)))
    conv_id = F.when(is_garbage_null, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("conv_"), F.lpad(conv_num.cast("string"), 8, "0"))
    )
    turn_raw = F.pmod(_h(eid, seed, "turn"), F.lit(turns_per_conv)).cast("int")
    turn_idx = F.when(is_garbage_neg, (-turn_raw - F.lit(1)).cast("int")).otherwise(turn_raw)

    u_op = _u(eid, seed, "op")
    op = (
        F.when(u_op < F.lit(delete_frac), F.lit("D"))
        .when(u_op < F.lit(delete_frac + 0.30), F.lit("I"))
        .otherwise(F.lit("U"))
    )

    # Business time: monotone-ish in lsn but jittered backwards up to
    # ooo_window_s — genuine out-of-order delivery relative to the log.
    jitter = F.pmod(_h(eid, seed, "ooo"), F.lit(ooo_window_s))
    ts = F.timestamp_seconds(
        F.lit(BASE_EPOCH) + eid.cast("double") * F.lit(float(event_gap_s)) - jitter.cast("double")
    )

    role = F.element_at(
        F.array(*[F.lit(r) for r in _ROLES]), (F.pmod(_h(eid, seed, "role"), F.lit(4)) + 1).cast("int")
    )
    text = F.concat(
        F.lit("msg "),
        F.coalesce(conv_id, F.lit("?")),
        F.lit("/"),
        turn_idx.cast("string"),
        F.lit(" rev="),
        eid.cast("string"),
        F.lit(" "),
        F.repeat(F.lit("x"), (F.pmod(_h(eid, seed, "len"), F.lit(40)) + 8).cast("int")),
    )
    tool_active = eid >= F.lit(int(tool_from_frac * n_events))
    tool = F.when(
        tool_active & (role == "tool"),
        F.element_at(F.array(*[F.lit(t) for t in _TOOLS]), (F.pmod(_h(eid, seed, "tool"), F.lit(5)) + 1).cast("int")),
    ).otherwise(F.lit(None).cast("string"))

    is_delete = op == "D"
    return rng.select(
        op.alias("op"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(is_delete, F.lit(None).cast("string")).otherwise(role).alias("role"),
        F.when(is_delete, F.lit(None).cast("string")).otherwise(text).alias("text"),
        F.when(is_delete, F.lit(None).cast("string")).otherwise(tool).alias("tool"),
        ts.alias("ts"),
        eid.alias("lsn"),
        (F.floor(pid / F.lit(commit_size)) * F.lit(commit_size)).cast("long").alias("commit_lsn"),
    )


def split_for_schema_evolution(log: DataFrame, n_events: int, tool_from_frac: float = 0.5):
    """Split a change log at the schema-evolution point.

    Returns ``(pre, post)`` where ``pre`` physically lacks the ``tool``
    column (the pre-evolution feed) and ``post`` carries it — the
    mid-stream new-column scenario the north rule requires.
    """
    boundary = int(tool_from_frac * n_events)
    pre = log.filter(F.col("lsn") < boundary).drop("tool")
    post = log.filter(F.col("lsn") >= boundary)
    return pre, post


def expected_state_sql(log_view: str = "log") -> str:
    """ANSI SQL for the trivially-correct reference reducer (DuckDB-
    runnable): per-key last-writer-wins by (ts, lsn), winner's op
    decides presence, garbage keys dropped. This is the oracle the
    replay-equivalence tests compare the engine's final table against.
    """
    return f"""
        SELECT conv_id, turn_idx, role, text, tool, ts, lsn
        FROM (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY conv_id, turn_idx
                       ORDER BY ts DESC, lsn DESC
                   ) AS rn
            FROM {log_view}
            WHERE conv_id IS NOT NULL AND turn_idx >= 0
        )
        WHERE rn = 1 AND op <> 'D'
    """
