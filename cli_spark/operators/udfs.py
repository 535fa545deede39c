"""UDF / UDAF / UDTF surface (SURVEY.md §2 "UDF surface") — one graded
query per extension mechanism:

* q57 — grouped-map `applyInPandas` (per-group z-score). Uses
  math.fsum for the group moments, which is correctly rounded and
  therefore independent of Arrow batch/row order — deterministic
  without an oracle-side mirror (no SQL equivalent of a grouped-map
  UDF; rows-only).
* q58 — Python UDTF (one row → many rows, Spark 3.5+/4 `@udtf`).
* q59 — SQL-registered scalar UDF used from `spark.sql` — the
  row-at-a-time slow path, kept deliberately tiny and oracle-checked
  (its docstring is the place we say: never put this on the 100 TB
  hot path; see the pandas/Arrow variants for that).
* q57 also registers a GROUPED_AGG pandas UDF through a Window.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType

from cli_spark.plans.registry import register
from cli_spark.tables import load_table


@register(
    "q57_grouped_map_zscore",
    oracle=None,  # grouped-map python UDF — no SQL mirror; rows-only
    tags=("udf", "pandas", "grouped_map"),
)
def q57_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-mktsegment z-score of customer balances via
    groupBy().applyInPandas — the grouped-map pandas UDF path (Arrow
    batches, one group per call). fsum-based moments make the output
    independent of row arrival order (reproducible run to run)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        mean = math.fsum(pdf["c_acctbal"]) / n
        var = math.fsum((x - mean) ** 2 for x in pdf["c_acctbal"]) / max(n - 1, 1)
        std = math.sqrt(var) or 1.0
        return pd.DataFrame(
            {
                "c_mktsegment": pdf["c_mktsegment"],
                "c_custkey": pdf["c_custkey"],
                "bal_z": [round((x - mean) / std, 6) for x in pdf["c_acctbal"]],
            }
        )

    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_mktsegment")
        .applyInPandas(zscore, "c_mktsegment string, c_custkey long, bal_z double")
        .orderBy("c_custkey")
    )


@register(
    "q58_udtf_expand",
    oracle="""
SELECT doc_id, unnest(generate_series(1, least(len(string_split(text, ' ')), 3))) AS piece_no,
       split_part(text, ' ', unnest(generate_series(1, least(len(string_split(text, ' ')), 3)))) AS piece
FROM documents WHERE doc_id < 10
""",
    tags=("udf", "udtf"),
)
def q58_udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one document row → up to 3 (piece_no, word) rows.
    Deterministic pure function of the input row, so it is
    oracle-checkable (duck mirrors with unnest/generate_series)."""

    @udtf(returnType="doc_id bigint, piece_no int, piece string")
    class HeadWords:
        def eval(self, doc_id: int, text: str):
            for i, w in enumerate(text.split(" ")[:3], start=1):
                yield doc_id, i, w

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 10)
    d.createOrReplaceTempView("udtf_docs_in")
    spark.udtf.register("head_words", HeadWords)
    return spark.sql(
        "SELECT h.doc_id, h.piece_no, h.piece "
        "FROM udtf_docs_in, LATERAL head_words(doc_id, text) h"
    )


@register(
    "q59_registered_scalar_udf",
    oracle="""
SELECT p_partkey,
       upper(trim(p_name)) || '#' || CAST(length(p_name) AS VARCHAR) AS tagged
FROM part WHERE p_partkey % 20 = 0
""",
    tags=("udf", "scalar", "slow_path"),
)
def q59_registered_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF registered for SQL use. THE SLOW PATH:
    each row round-trips through the Python worker — fine for this
    deliberately tiny demonstration slice, never for the 100 TB hot
    path (use built-ins or pandas UDFs there; cf. every other module).
    Pure string function → exact oracle."""

    def tag(name: str) -> str:
        return f"{name.strip().upper()}#{len(name)}"

    spark.udf.register("tag_name", tag, "string")
    load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0).createOrReplaceTempView(
        "udf_parts_in"
    )
    return spark.sql("SELECT p_partkey, tag_name(p_name) AS tagged FROM udf_parts_in")


@register(
    "q56_grouped_agg_pandas_udf",
    oracle=None,  # float mean over arbitrary-order Arrow batches on the
    # oracle side would need fsum too — keep rows-only
    tags=("udf", "pandas", "grouped_agg"),
)
def q56_grouped_agg_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF (vectorized UDAF): order-independent
    trimmed mean (drop min/max, fsum the rest) of order totals per
    priority."""

    @pandas_udf(DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        xs = sorted(v)
        xs = xs[1:-1] if len(xs) > 2 else xs
        return round(math.fsum(xs) / max(len(xs), 1), 6)

    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(trimmed_mean("o_totalprice").alias("trimmed_mean_price"))
        .orderBy("o_orderpriority")
    )
