"""Property-based check (hypothesis): for ANY small change log, the
engine's LWW dedupe operators agree with a trivially-correct pandas
reducer — and the three physical strategies agree with each other."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from digital_analytics_data_platform_spark.operators.dedupe import (
    dedupe_lww,
    dedupe_lww_salted,
    dedupe_lww_window,
)

event = st.tuples(
    st.integers(0, 4),      # conv
    st.integers(0, 3),      # turn
    st.integers(0, 50),     # ts
    st.text(alphabet="abc", min_size=0, max_size=3),  # payload
)


def pandas_lww(rows):
    df = pd.DataFrame(rows, columns=["conv", "turn", "ts", "text"])
    df["lsn"] = range(len(df))
    df = df.sort_values(["ts", "lsn"]).groupby(["conv", "turn"], as_index=False).last()
    return {(r.conv, r.turn): (r.ts, r.lsn, r.text) for r in df.itertuples()}


_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from digital_analytics_data_platform_spark.session import get_spark

        _spark = get_spark("prop-tests", master="local[2]", shuffle_partitions=2)
    return _spark


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(event, min_size=1, max_size=25))
def test_lww_strategies_agree_with_pandas_reducer(rows):
    spark = _get_spark()
    data = [(c, t, ts, txt, i) for i, (c, t, ts, txt) in enumerate(rows)]
    df = spark.createDataFrame(data, "conv int, turn int, ts int, text string, lsn long")
    expected = pandas_lww(rows)

    for fn in (dedupe_lww, dedupe_lww_window, lambda d, k, o: dedupe_lww_salted(d, k, o, salt=3)):
        got = {
            (r["conv"], r["turn"]): (r["ts"], r["lsn"], r["text"])
            for r in fn(df, ["conv", "turn"], ["ts", "lsn"]).collect()
        }
        assert got == expected, f"{fn} diverged from reducer"
