"""Thin vertical slice check: generate CDC log → batched MERGE → compare vs DuckDB oracle."""

import shutil
import sys
import tempfile

import duckdb

sys.path.insert(0, "/root/repo")
from digital_analytics_data_platform_spark import datagen
from digital_analytics_data_platform_spark.lake import LakeTable, merge_changes
from digital_analytics_data_platform_spark.session import get_spark
from pyspark.sql import functions as F
from pyspark.sql import types as T

N = 20_000
spark = get_spark("smoke", master="local[8]", shuffle_partitions=8)
log = datagen.change_log(spark, N, n_convs=200, turns_per_conv=20)

tmp = tempfile.mkdtemp(prefix="lake_")
schema = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("lsn", T.LongType()),
    ]
)
tbl = LakeTable.create(f"{tmp}/bronze", schema, ["conv_id", "turn_idx"], ["ts", "lsn"], n_buckets=16)

B = 4
def batch_slice(i):
    return log.filter((F.col("lsn") >= i * N // B) & (F.col("lsn") < (i + 1) * N // B))

for i in range(B):
    r = merge_changes(spark, tbl, batch_slice(i), batch_key=f"b{i}")
    print(f"batch {i}: {r}")

# replay batch 1 again — must be a no-op (ledger)
r = merge_changes(spark, tbl, batch_slice(1), batch_key="b1")
print("replay:", r.skipped)

got = tbl.read(spark).orderBy("conv_id", "turn_idx").toPandas()
log_pd = log.toPandas()
con = duckdb.connect()
con.register("log", log_pd)
exp = con.sql(datagen.expected_state_sql("log") + " ORDER BY conv_id, turn_idx").df()

print("engine rows:", len(got), "oracle rows:", len(exp))
g = got[["conv_id", "turn_idx", "role", "text", "tool"]].reset_index(drop=True)
e = exp[["conv_id", "turn_idx", "role", "text", "tool"]].reset_index(drop=True)
assert len(g) == len(e), (len(g), len(e))
mismatch = (g != e) & ~(g.isna() & e.isna())
assert not mismatch.any().any(), g[mismatch.any(axis=1)].head()
print("REPLAY EQUIVALENCE: PASS")
shutil.rmtree(tmp)
spark.stop()
