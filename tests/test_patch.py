"""Partial-update (patch) merge semantics: column-wise latest-non-null
with delete masking, exact vs a DuckDB log-replay oracle, under any
batching / ordering / duplication of the feed."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from digital_analytics_data_platform_spark.operators.patch import (
    PatchTable,
    patch_collapse,
)
from digital_analytics_data_platform_spark.queries import SQL_PATCH_MERGE, q_patch_merge

SF_DIR = "/root/testdata/sf0.001"

LOG_SCHEMA = T.StructType(
    [
        T.StructField("uid", T.LongType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("op", T.StringType()),
        T.StructField("a", T.DoubleType()),
        T.StructField("b", T.StringType()),
    ]
)


def _oracle_sql(table: str) -> str:
    """Log-replay patch semantics in DuckDB over (uid, lsn, op, a, b)."""
    return f"""
    WITH agg AS (
      SELECT uid,
        max(lsn) FILTER (WHERE op = 'D') AS del_o,
        max(lsn) FILTER (WHERE op <> 'D') AS live_o,
        arg_max(a, lsn) FILTER (WHERE op <> 'D' AND a IS NOT NULL) AS v_a,
        max(lsn) FILTER (WHERE op <> 'D' AND a IS NOT NULL) AS o_a,
        arg_max(b, lsn) FILTER (WHERE op <> 'D' AND b IS NOT NULL) AS v_b,
        max(lsn) FILTER (WHERE op <> 'D' AND b IS NOT NULL) AS o_b
      FROM {table} GROUP BY uid
    )
    SELECT uid,
      CASE WHEN del_o IS NULL OR o_a > del_o THEN v_a END AS a,
      CASE WHEN del_o IS NULL OR o_b > del_o THEN v_b END AS b
    FROM agg
    WHERE live_o IS NOT NULL AND (del_o IS NULL OR live_o > del_o)
    """


def _rand_log(seed: int, n_keys: int = 40, n_events: int = 400) -> pd.DataFrame:
    rng = random.Random(seed)
    rows = []
    for lsn in range(n_events):
        uid = rng.randrange(n_keys)
        if rng.random() < 0.12:
            rows.append((uid, lsn, "D", None, None))
        else:
            a = round(rng.uniform(0, 100), 3) if rng.random() < 0.55 else None
            b = f"s{rng.randrange(20)}" if rng.random() < 0.55 else None
            rows.append((uid, lsn, "U", a, b))
    return pd.DataFrame(rows, columns=["uid", "lsn", "op", "a", "b"])


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _assert_frames_equal(got: pd.DataFrame, exp: pd.DataFrame):
    g, e = _norm(got), _norm(exp)
    assert list(g.columns) == list(e.columns)
    assert len(g) == len(e), f"rows {len(g)} vs {len(e)}"
    neq = (g != e) & ~(g.isna() & e.isna())
    assert not neq.any().any(), (
        f"value mismatch:\n{g[neq.any(axis=1)].head()}\nvs\n{e[neq.any(axis=1)].head()}"
    )


def test_patch_merge_query_matches_oracle(spark):
    got = q_patch_merge(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    exp = con.sql(SQL_PATCH_MERGE).df()
    assert len(got) > 0
    _assert_frames_equal(got, exp)


def test_patch_collapse_matches_log_replay(spark):
    log = _rand_log(7)
    got = patch_collapse(
        spark.createDataFrame(log, LOG_SCHEMA), ["uid"], "lsn", ["a", "b"]
    ).toPandas()
    con = duckdb.connect()
    con.register("log", log)
    _assert_frames_equal(got, con.sql(_oracle_sql("log")).df())


@pytest.mark.parametrize("seed", [1, 2])
def test_patch_table_replay_equivalence(spark, tmp_path, seed):
    """Batched, shuffled, duplicated application converges to the
    log-replay state — the monoid property end to end."""
    log = _rand_log(seed)
    pt = PatchTable.create(str(tmp_path / "pt"), LOG_SCHEMA, ["uid"], "lsn", n_buckets=4)
    batches = [log.iloc[i : i + 80] for i in range(0, len(log), 80)]
    rng = random.Random(seed)
    rng.shuffle(batches)
    batches.append(batches[0])  # duplicate delivery, fresh batch_key → re-applied
    for i, b in enumerate(batches):
        pt.apply_batch(spark, spark.createDataFrame(b, LOG_SCHEMA), batch_key=f"b{seed}-{i}")
    got = pt.read(spark).toPandas()
    con = duckdb.connect()
    con.register("log", log)
    _assert_frames_equal(got, con.sql(_oracle_sql("log")).df())


def test_compact_preserves_state_and_merges_after(spark, tmp_path):
    log = _rand_log(11)
    pt = PatchTable.create(str(tmp_path / "pt"), LOG_SCHEMA, ["uid"], "lsn", n_buckets=4)
    split = 240
    head, tail = log.iloc[:split], log.iloc[split:]
    for i in range(0, split, 80):
        pt.apply_batch(spark, spark.createDataFrame(head.iloc[i : i + 80], LOG_SCHEMA), batch_key=f"h{i}")
    before = pt.read(spark).toPandas()
    pt.compact(spark)
    _assert_frames_equal(pt.read(spark).toPandas(), before)
    # patches applied AFTER compaction still merge exactly (the stored
    # per-column orders survive the fold)
    pt.apply_batch(spark, spark.createDataFrame(tail, LOG_SCHEMA), batch_key="tail")
    con = duckdb.connect()
    con.register("log", log)
    _assert_frames_equal(pt.read(spark).toPandas(), con.sql(_oracle_sql("log")).df())


def test_delete_then_patch_resurrects_sparse(spark, tmp_path):
    """A patch after a delete re-creates the row with ONLY its columns;
    values set before the delete stay cleared."""
    pt = PatchTable.create(str(tmp_path / "pt"), LOG_SCHEMA, ["uid"], "lsn", n_buckets=2)
    log = pd.DataFrame(
        [
            (1, 1, "U", 10.0, "x"),  # sets a and b
            (1, 2, "D", None, None),  # delete clears the row
            (1, 3, "U", None, "y"),  # patch resurrects with only b
            (2, 1, "U", 5.0, None),
            (2, 2, "D", None, None),  # key 2 stays dead
        ],
        columns=["uid", "lsn", "op", "a", "b"],
    )
    pt.apply_batch(spark, spark.createDataFrame(log, LOG_SCHEMA), batch_key="b0")
    got = pt.read(spark).toPandas().sort_values("uid").reset_index(drop=True)
    assert list(got["uid"]) == [1]
    assert pd.isna(got.loc[0, "a"]), "pre-delete value must stay cleared"
    assert got.loc[0, "b"] == "y"


def test_ledger_skips_replayed_batch_key(spark, tmp_path):
    pt = PatchTable.create(str(tmp_path / "pt"), LOG_SCHEMA, ["uid"], "lsn", n_buckets=2)
    b = spark.createDataFrame(_rand_log(3).iloc[:50], LOG_SCHEMA)
    v1 = pt.apply_batch(spark, b, batch_key="same")
    v2 = pt.apply_batch(spark, b, batch_key="same")
    assert v2 == v1, "replayed batch_key must be a no-op"


def test_schema_evolution_new_payload_column(spark, tmp_path):
    pt = PatchTable.create(str(tmp_path / "pt"), LOG_SCHEMA, ["uid"], "lsn", n_buckets=2)
    pt.apply_batch(
        spark,
        spark.createDataFrame(
            pd.DataFrame([(1, 1, "U", 1.0, "x")], columns=["uid", "lsn", "op", "a", "b"]),
            LOG_SCHEMA,
        ),
        batch_key="b0",
    )
    evolved = T.StructType(list(LOG_SCHEMA.fields) + [T.StructField("c", T.LongType())])
    pt.apply_batch(
        spark,
        spark.createDataFrame(
            pd.DataFrame(
                [(1, 2, "U", None, None, 7), (2, 3, "U", 2.0, None, None)],
                columns=["uid", "lsn", "op", "a", "b", "c"],
            ),
            evolved,
        ),
        batch_key="b1",
    )
    got = pt.read(spark).toPandas().sort_values("uid").reset_index(drop=True)
    assert list(got.columns) == ["uid", "a", "b", "c"]
    assert got.loc[0, "a"] == 1.0 and got.loc[0, "b"] == "x" and got.loc[0, "c"] == 7
    assert pd.isna(got.loc[1, "c"])


def test_garbage_rows_quarantined_not_applied(spark, tmp_path):
    import glob

    pt = PatchTable.create(str(tmp_path / "pt"), LOG_SCHEMA, ["uid"], "lsn", n_buckets=2)
    log = pd.DataFrame(
        [
            (1, 1, "U", 1.0, "x"),
            (None, 2, "U", 9.0, "poison"),  # null key
            (2, None, "U", 3.0, "y"),  # null order
        ],
        columns=["uid", "lsn", "op", "a", "b"],
    )
    pt.apply_batch(spark, spark.createDataFrame(log, LOG_SCHEMA), batch_key="b0")
    got = pt.read(spark).toPandas()
    assert len(got) == 1 and got.loc[0, "uid"] == 1
    qfiles = glob.glob(pt.table.quarantine_path() + "/**/*.parquet", recursive=True)
    assert qfiles, "garbage rows must land in the DLQ"
    q = spark.read.parquet(pt.table.quarantine_path()).toPandas()
    assert len(q) == 2
