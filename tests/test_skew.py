"""Salting utilities must be semantics-preserving under real skew."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from hfcommunity_spark.operators.skew import salted_join, salted_two_phase_agg


def _skewed(spark, n_hot=2000, n_cold=50):
    pdf = pd.DataFrame(
        {
            "k": ["hot"] * n_hot + [f"c{i}" for i in range(n_cold)],
            "v": list(range(n_hot)) + list(range(n_cold)),
        }
    )
    return spark.createDataFrame(pdf)


def test_salted_agg_equals_plain(spark):
    df = _skewed(spark)
    got = (
        salted_two_phase_agg(
            df, ["k"],
            [("count", "*", "n"), ("sum", "v", "s"),
             ("min", "v", "lo"), ("max", "v", "hi")],
        )
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    want = (
        df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"),
             F.min("v").alias("lo"), F.max("v").alias("hi"))
        .toPandas().sort_values("k").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_salted_join_equals_plain(spark):
    left = _skewed(spark)
    right = spark.createDataFrame(
        pd.DataFrame({"rk": ["hot", "c1", "c3", "absent"], "label": list("abcd")})
    )
    got = (
        salted_join(left, right, "k", "rk")
        .groupBy("k", "label").count()
        .toPandas().sort_values(["k", "label"]).reset_index(drop=True)
    )
    want = (
        left.join(right, left.k == right.rk)
        .groupBy("k", "label").count()
        .toPandas().sort_values(["k", "label"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
