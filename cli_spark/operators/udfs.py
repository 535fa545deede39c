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
    oracle="""
WITH cents AS (
  SELECT c_mktsegment, c_custkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS c
  FROM customer
),
moments AS (
  SELECT c_mktsegment, c_custkey, c,
         CAST(SUM(c) OVER w AS DOUBLE) AS s,
         CAST(SUM(c * c) OVER w AS DOUBLE) AS ss,
         COUNT(*) OVER w AS n
  FROM cents
  WINDOW w AS (PARTITION BY c_mktsegment)
)
SELECT c_mktsegment, c_custkey,
       floor((c - s / n) / sqrt((ss - s * (s / n)) / (n - 1)) * 1000000)
         / 1000000 AS bal_z
FROM moments
""",
    tags=("udf", "pandas", "grouped_map"),
)
def q57_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-mktsegment z-score of customer balances via
    groupBy().applyInPandas — the grouped-map pandas UDF path (Arrow
    batches, one group per call).

    Cross-engine exact: balances are 2-decimal money, so cents are
    int64 and sum / sum-of-squares are EXACT integers (exact in
    float64 up to ~9e15, fine through sf0.1). Both engines then apply
    the identical IEEE double expression to the same integers —
    mean = s/n, var = (ss - s*(s/n))/(n-1) — and floor-quantize the
    z-score to 1e-6, so the hashes match bit-for-bit with no
    rounding-convention dependence."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (pdf["c_acctbal"] * 100).round().astype("int64")
        n = len(cents)
        s = float(int(cents.sum()))
        ss = float(int((cents * cents).sum()))
        std = math.sqrt((ss - s * (s / n)) / (n - 1)) if n > 1 else 1.0
        mean = s / n
        return pd.DataFrame(
            {
                "c_mktsegment": pdf["c_mktsegment"],
                "c_custkey": pdf["c_custkey"],
                "bal_z": [
                    math.floor((c - mean) / std * 1000000) / 1000000
                    for c in cents
                ],
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
    oracle="""
WITH cents AS (
  SELECT o_orderpriority, CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
)
SELECT o_orderpriority,
       floor(CAST((SUM(c) - MIN(c) - MAX(c)) * 100 AS DOUBLE)
             / (COUNT(*) - 2)) / 10000.0 AS trimmed_mean_price
FROM cents
GROUP BY o_orderpriority
""",
    tags=("udf", "pandas", "grouped_agg"),
)
def q56_grouped_agg_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF (vectorized UDAF): trimmed mean (drop
    one min + one max, average the rest) of order totals per priority.

    Cross-engine exact: totals are 2-decimal money → int64 cents, so
    sum/min/max are exact integers; both engines evaluate the same
    (sum-min-max)*100/(n-2) in IEEE doubles (exact numerator < 2^53)
    and floor-quantize to 1e-4 dollars — bit-identical hashes without
    depending on either engine's round() convention. Order-independent
    by construction, so Arrow batch arrival order can't change it."""

    @pandas_udf(DoubleType())
    def trimmed_mean(v: pd.Series) -> float:
        cents = (v * 100).round().astype("int64")
        n = len(cents)
        if n > 2:
            s, m = int(cents.sum()) - int(cents.min()) - int(cents.max()), n - 2
        else:
            s, m = int(cents.sum()), n
        return math.floor(float(s * 100) / m) / 10000.0

    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(trimmed_mean("o_totalprice").alias("trimmed_mean_price"))
        .orderBy("o_orderpriority")
    )


@register(
    "q316_map_in_arrow_stats",
    oracle="""
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(len(text) - len(replace(text, ' ', '')) AS BIGINT) AS n_spaces,
       CAST(len(text) AS BIGINT) AS n_chars
FROM documents
""",
    tags=("udf", "arrow", "map_in_arrow"),
)
def q316_map_in_arrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mapInArrow` — the zero-copy end of the Python eval spectrum
    (q59 row-at-a-time < pandas UDFs < raw Arrow RecordBatches): the
    transform touches pyarrow.compute kernels only, so batches never
    convert to pandas objects at all — the shape for per-batch work
    where even the Arrow→pandas step is measurable at 100 TB (byte
    lengths, substring counts, dictionary ops). Emitted statistics
    (UTF-8 byte length, space count, char count) are exact integers
    recomputed by the oracle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def _stats(batches: "Iterator[pa.RecordBatch]") -> "Iterator[pa.RecordBatch]":
        for batch in batches:
            text = batch.column(1)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(0),
                    pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64()),
                    pc.cast(pc.count_substring(text, " "), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                ],
                names=["doc_id", "n_bytes", "n_spaces", "n_chars"],
            )

    return d.mapInArrow(
        _stats, "doc_id long, n_bytes long, n_spaces long, n_chars long"
    )


@register(
    "q334_cogroup_merge",
    # Per-user cogrouped merge: for each purchase, errors in the
    # preceding 30 minutes — the oracle states it as an interval
    # join + census; the engine computes it in cogrouped pandas.
    oracle="""
WITH p AS (
  SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'
),
e AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'error'
),
joined AS (
  SELECT p.user_id, p.event_id,
         COUNT(e.ts) AS n_err,
         CAST(COALESCE(SUM(CAST(round(e.value * 100) AS BIGINT)), 0) AS BIGINT)
           AS err_cents
  FROM p LEFT JOIN e
    ON e.user_id = p.user_id
   AND e.ts >= p.ts - INTERVAL 30 MINUTE AND e.ts <= p.ts
  GROUP BY p.user_id, p.event_id
)
SELECT user_id,
       COUNT(*) AS n_purchases,
       CAST(SUM(n_err) AS BIGINT) AS n_err_pairs,
       CAST(SUM(err_cents) AS BIGINT) AS err_cents,
       CAST(SUM(CASE WHEN n_err = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS clean_purchases
FROM joined GROUP BY user_id
""",
    tags=("udf", "cogroup", "pandas"),
)
def q334_cogroup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped pandas map — the LAST Python-eval API surface
    (`groupBy().cogroup().applyInPandas`, Spark's two-sided grouped
    Arrow exchange): purchases and errors cogroup per user and each
    group pair merges in pandas (a windowed interval count per
    purchase — the numpy-side shape of merge_asof/interval joins that
    pandas expresses naturally and SQL states as an interval join).
    Both sides of a user arrive in ONE task as two aligned pandas
    frames — the point of the API — and only the per-user census
    leaves Python.

    Scale shape: one co-partitioned shuffle on user_id for both
    inputs, Arrow-batched transfer, group-bounded memory. The engine
    uses exact integer cents so the cogrouped arithmetic hashes
    bit-exactly against the SQL oracle."""
    from cli_spark.tables import load_table as _lt

    e = _lt(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "value"
    )
    schema = (
        "user_id long, n_purchases long, n_err_pairs long, "
        "err_cents long, clean_purchases long"
    )

    def merge(p: pd.DataFrame, er: pd.DataFrame) -> pd.DataFrame:
        if p.empty:
            return pd.DataFrame(
                columns=["user_id", "n_purchases", "n_err_pairs",
                         "err_cents", "clean_purchases"])
        uid = int(p["user_id"].iloc[0])
        ets = er["ts"].to_numpy() if not er.empty else None
        cents = (
            (er["value"] * 100).round().astype("int64").to_numpy()
            if not er.empty else None
        )
        n_pairs = 0
        sum_cents = 0
        clean = 0
        for ts in p["ts"]:
            if ets is None:
                clean += 1
                continue
            lo = ts - pd.Timedelta(minutes=30)
            mask = (ets >= lo.to_datetime64()) & (ets <= ts.to_datetime64())
            k = int(mask.sum())
            n_pairs += k
            sum_cents += int(cents[mask].sum())
            clean += 1 if k == 0 else 0
        return pd.DataFrame([{
            "user_id": uid,
            "n_purchases": len(p),
            "n_err_pairs": n_pairs,
            "err_cents": sum_cents,
            "clean_purchases": clean,
        }])

    return (
        purchases.groupBy("user_id")
        .cogroup(errors.groupBy("user_id"))
        .applyInPandas(merge, schema)
    )


@register(
    "q339_apply_in_arrow_stats",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(MIN(n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY lang
""",
    tags=("udf", "arrow", "apply_in_arrow"),
)
def q339_apply_in_arrow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped Arrow map (`groupBy().applyInArrow`) — the grouped
    sibling of q316's mapInArrow, closing the Arrow API symmetry
    (grouped-map pandas / grouped-agg pandas / cogrouped pandas /
    mapInPandas / mapInArrow / grouped Arrow): each language's
    documents arrive as ONE pyarrow.Table and the per-group census
    computes entirely in pyarrow.compute kernels — zero pandas
    materialization, the shape for per-group feature extraction where
    group payloads are large binary blobs and the Arrow→pandas copy
    is the bottleneck. Statistics are exact integers the oracle
    recomputes."""
    import pyarrow as pa
    import pyarrow.compute as pc

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text", "n_chars")

    def stats(table: "pa.Table") -> "pa.Table":
        lang = table.column("lang")[0].as_py()
        text = table.column("text")
        nb = pc.sum(pc.binary_length(pc.cast(text, pa.binary()))).as_py() or 0
        nc = table.column("n_chars")
        return pa.Table.from_pylist([{
            "lang": lang,
            "n_docs": table.num_rows,
            "total_bytes": int(nb),
            "min_chars": pc.min(nc).as_py(),
            "max_chars": pc.max(nc).as_py(),
        }])

    return d.groupBy("lang").applyInArrow(
        stats, "lang string, n_docs long, total_bytes long, min_chars long, max_chars long"
    )


@register(
    "q353_polymorphic_udtf",
    # The UDTF's schema (w1..wN string, n_words int) is computed at
    # ANALYZE time from the literal width argument; the oracle mirrors
    # the three fixed columns with split_part (empty string for
    # missing positions, exactly like eval's padding).
    oracle="""
SELECT doc_id,
       split_part(text, ' ', 1) AS w1,
       split_part(text, ' ', 2) AS w2,
       split_part(text, ' ', 3) AS w3,
       CAST(len(string_split(text, ' ')) AS INT) AS n_words
FROM documents WHERE doc_id % 7 = 0
""",
    tags=("udf", "udtf", "polymorphic", "spark4"),
)
def q353_polymorphic_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 `analyze()` static method —
    the last uncovered cell of the UDTF surface after q58's
    fixed-schema form): the output schema is computed at query
    ANALYSIS time from the foldable width argument, so
    `lead_words(doc_id, text, 3)` materializes columns w1..w3 while
    `..., 5` would materialize w1..w5 — the contract behind
    schema-flexible table functions (CSV-ish splitters, pivot-like
    expanders) that static returnType UDTFs cannot express. One row
    in → one row out with literal-width padding, so DuckDB mirrors it
    exactly with split_part. Demo slice kept deliberately small: a
    UDTF is the Python-worker path, not the 100 TB hot path."""
    from pyspark.sql.functions import udtf as _udtf_fn
    from pyspark.sql.types import IntegerType, LongType, StringType, StructType
    from pyspark.sql.udtf import AnalyzeResult

    class LeadWords:
        @staticmethod
        def analyze(doc_id, text, n):
            if n.value is None or not isinstance(n.value, int) or n.value < 1:
                raise ValueError("width must be a positive integer literal")
            st = StructType().add("doc_id", LongType())
            for i in range(1, n.value + 1):
                st = st.add(f"w{i}", StringType())
            return AnalyzeResult(st.add("n_words", IntegerType()))

        def eval(self, doc_id, text, n):
            words = text.split(" ")
            head = [words[i] if i < len(words) else "" for i in range(n)]
            yield (doc_id, *head, len(words))

    spark.udtf.register("lead_words", _udtf_fn(LeadWords))
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 7 == 0
    ).createOrReplaceTempView("poly_docs_in")
    return spark.sql(
        "SELECT t.* FROM poly_docs_in, LATERAL lead_words(doc_id, text, 3) t"
    )


@register(
    "q361_arrow_scalar_udf",
    oracle="""
SELECT p_partkey,
       upper(p_brand) || '/' || CAST(p_size * 2 AS VARCHAR) AS tag,
       CAST(length(p_name) + p_size AS BIGINT) AS weight
FROM part WHERE p_partkey % 25 = 0
""",
    tags=("udf", "scalar", "arrow", "spark4"),
)
def q361_arrow_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARROW-OPTIMIZED scalar Python UDF (`useArrow=True` — Spark
    3.5+/4 per-function Arrow serialization): completes the declared
    Python eval spectrum between q59's pickled row-at-a-time UDF and
    the pandas_udf family. The function still executes per-row in
    Python (unlike a pandas UDF's vectorized batches) but its I/O
    rides Arrow columnar batches instead of per-row pickling — the
    drop-in upgrade for legacy UDFs that can't be vectorized. Pure
    deterministic string/int functions → exact oracle."""

    @F.udf(returnType="string", useArrow=True)
    def brand_tag(brand: str, size: int) -> str:
        return f"{brand.upper()}/{size * 2}"

    @F.udf(returnType="long", useArrow=True)
    def weight(name: str, size: int) -> int:
        return len(name) + size

    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 25 == 0)
        .select(
            "p_partkey",
            brand_tag("p_brand", "p_size").alias("tag"),
            weight("p_name", "p_size").alias("weight"),
        )
    )


@register(
    "q381_pandas_udf_iterator",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT) - 100) AS BIGINT) AS adj_cents
FROM lineitem WHERE l_quantity >= 25
GROUP BY l_returnflag
""",
    tags=("udf", "pandas", "iterator", "spark35"),
)
def q381_pandas_udf_iterator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ITERATOR-of-Series pandas UDF (`Iterator[pd.Series] ->
    Iterator[pd.Series]`, the SCALAR_ITER eval type) — the LAST
    Python evaluation mode missing from the registry's spectrum
    (scalar < arrow-scalar < pandas < pandas-iterator < mapInPandas):
    the function is called ONCE per partition and loops over Arrow
    batches itself, which is the documented pattern for amortizing
    expensive per-worker initialization (model load, dictionary
    build) across all batches instead of paying it per batch. Here
    the "initialized state" is a fee constant fixed before the batch
    loop; the arithmetic itself is exact cents so the oracle is
    closed-form. Same vectorized throughput as a plain pandas UDF —
    the iterator form only changes WHERE setup cost lands."""
    from collections.abc import Iterator

    import pandas as pd

    @F.pandas_udf("long")
    def adj_cents(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np

        fee = 100  # "loaded once" per-worker state
        for s in batches:
            # floor(x*100 + 0.5): half-up like both engines' round()
            # on positive money (pandas .round() is banker's)
            yield pd.Series(np.floor(s.to_numpy() * 100 + 0.5)).astype("int64") - fee

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 25)
    priced = li.select(
        "l_returnflag",
        adj_cents(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("double")
        ).alias("cents"),
    )
    return priced.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("cents").alias("adj_cents"),
    )


@register(
    "q382_udtf_table_argument",
    # Per-nation balance trace: the UDTF receives each nation's
    # customers as a PARTITIONED TABLE argument ordered by acctbal
    # desc and emits running-share checkpoint rows — equivalent to a
    # window cumsum sampled at the checkpoints.
    oracle="""
WITH ranked AS (
  SELECT c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS r,
         COUNT(*) OVER (PARTITION BY c_nationkey) AS n,
         SUM(CAST(round(c_acctbal * 100) AS BIGINT))
           OVER (PARTITION BY c_nationkey
                 ORDER BY c_acctbal DESC, c_custkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS run_cents
  FROM customer
)
SELECT CAST(c_nationkey AS INTEGER) AS nationkey,
       CAST(r AS BIGINT) AS checkpoint_rank,
       CAST(run_cents AS BIGINT) AS cum_cents
FROM ranked
WHERE r % 100 = 0 OR r = n
""",
    tags=("udf", "udtf", "table_argument", "spark4"),
)
def q382_udtf_table_argument(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE ARGUMENT (Spark 3.5+/4
    `my_udtf(TABLE(t) PARTITION BY ... ORDER BY ...)`): the UDTF
    consumes WHOLE PARTITIONS as row iterators instead of scalar
    columns — Spark shuffles by the PARTITION BY key, orders rows
    within each partition, and calls eval() per row with terminate()
    at partition end, i.e. user-defined streaming aggregation over
    grouped, ordered data (the API that subsumes grouped-map for
    sequential per-group logic). The UDTF emits cumulative-balance
    checkpoints every 100 customers per nation; the oracle replays it
    as a window cumsum sampled at the same ranks — any partition
    boundary or intra-partition order violation breaks the hash."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="nationkey int, checkpoint_rank bigint, cum_cents bigint")
    class BalanceTrace:
        def __init__(self):
            self.rank = 0
            self.cum = 0
            self.key = None
            self.last_row = None

        def eval(self, row):
            self.key = row["c_nationkey"]
            self.rank += 1
            self.cum += int(round(row["c_acctbal"] * 100))
            self.last_row = (self.key, self.rank, self.cum)
            if self.rank % 100 == 0:
                yield self.last_row

        def terminate(self):
            if self.last_row is not None and self.last_row[1] % 100 != 0:
                yield self.last_row

    spark.udtf.register("balance_trace", BalanceTrace)
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
SELECT nationkey, checkpoint_rank, cum_cents
FROM balance_trace(
  TABLE(SELECT c_nationkey, c_acctbal, c_custkey FROM customer)
  PARTITION BY c_nationkey
  ORDER BY (c_acctbal DESC, c_custkey)
)
"""
    )
