"""Scalar function packs: string, date/time, math, array (incl.
higher-order), JSON, struct/map — SURVEY.md §2 "Scalar function packs".

All built-in `pyspark.sql.functions` (JVM-side, whole-stage-codegen) —
no Python UDFs. Oracle gotchas handled per SURVEY §2 / §5.2:
* Spark `dayofweek` is Sunday=1, DuckDB's is Sunday=0 → oracle adds 1;
* `unix_micros` ↔ `epoch_us` (duck's `epoch` returns double);
* transcendental fns (exp/ln/sin/…) differ by ulps across libms →
  rounded to 6 decimals on both sides;
* Spark `sequence(1, 0)` counts DOWN ([1,0]) while duck
  `generate_series(1,0)` is empty → shingle builders guard n>=3.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cli_spark.plans.registry import register
from cli_spark.tables import load_table

# q66 golden table: Spark's seeded xxhash64 per fixed NATION_k name
# (pinned from a verified run; drift in any engine version breaks the
# driver's hash compare) + CRC-32 computed HERE via zlib — an
# implementation independent of both engines.
_Q66_XXH64 = [
    (0, -3635279775981152085), (1, -3191739825536951345),
    (2, -1122549408961623051), (3, -6553752320078117943),
    (4, -2331079757126508432), (5, -1294387990695063588),
    (6, 429854463658653475), (7, -1821898194479978266),
    (8, 9004275367934011975), (9, -2287288453389768943),
    (10, 9031943545092929825), (11, 2281512348945990958),
    (12, -5326869236346025150), (13, -1287700060914886076),
    (14, 8953969587697275637), (15, 8921703177071605178),
    (16, -1323510064612203124), (17, 8525034706716842015),
    (18, 9134329436019486759), (19, 3727839146706945451),
    (20, -7170314187469782521), (21, 5021686427711143555),
    (22, 1145888113185677229), (23, -8151388513236445183),
    (24, -1615532261484927898),
]
_Q66_VALUES = ", ".join(
    f"({k}, CAST({v} AS BIGINT), "
    f"CAST({zlib.crc32(f'NATION_{k}'.encode())} AS BIGINT))"
    for k, v in _Q66_XXH64
)


@register(
    "q50_string_pack",
    oracle="""
SELECT p_partkey,
       concat_ws('-', p_brand, p_type) AS brand_type,
       upper(p_name) AS name_upper,
       lower(p_brand) AS brand_lower,
       substring(p_name, 1, 5) AS name_head,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
       rpad(p_type, 10, '.') AS type_padded,
       split_part(p_name, ' ', 1) AS first_word,
       regexp_extract(p_brand, 'Brand#([0-9]+)', 1) AS brand_num,
       regexp_replace(p_name, '[aeiou]', '*', 'g') AS name_devoweled,
       translate(p_type, 'AEO', 'aeo') AS type_translated,
       levenshtein(p_name, 'small widget') AS lev_dist,
       length(p_name) AS name_len,
       strpos(p_name, 'widget') AS widget_pos,
       printf('%s/%03d', p_brand, p_size) AS brand_size,
       md5(p_name) AS name_md5,
       trim('  ' || p_type || ' ') AS type_trimmed
FROM part
""",
    tags=("scalar", "string"),
)
def q50_string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function pack over `part` (concat/case/pad/split/regex/
    translate/levenshtein/printf/md5/trim)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("key_padded"),
        F.rpad("p_type", 10, ".").alias("type_padded"),
        F.element_at(F.split("p_name", " "), 1).alias("first_word"),
        F.regexp_extract("p_brand", r"Brand#([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "*").alias("name_devoweled"),
        F.translate("p_type", "AEO", "aeo").alias("type_translated"),
        F.levenshtein("p_name", F.lit("small widget")).alias("lev_dist"),
        F.length("p_name").alias("name_len"),
        F.instr("p_name", "widget").alias("widget_pos"),
        F.format_string("%s/%03d", "p_brand", "p_size").alias("brand_size"),
        F.md5(F.encode("p_name", "utf-8")).alias("name_md5"),
        F.trim(F.concat(F.lit("  "), F.col("p_type"), F.lit(" "))).alias("type_trimmed"),
    )


@register(
    "q51_date_pack",
    oracle="""
SELECT o_orderkey,
       year(o_orderdate) AS o_year,
       month(o_orderdate) AS o_month,
       day(o_orderdate) AS o_day,
       quarter(o_orderdate) AS o_quarter,
       dayofweek(o_orderdate) + 1 AS o_dow,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus_30d,
       strftime(CAST(o_orderdate AS DATE) - 7, '%Y-%m-%d') AS minus_7d,
       date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_epoch_start,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE), '%Y-%m-%d') AS plus_2mo,
       epoch_us(o_orderdate) AS o_micros,
       strftime(o_orderdate + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS plus_1h
FROM orders
WHERE o_orderkey % 10 = 0
""",
    tags=("scalar", "datetime"),
)
def q51_date_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time pack over `orders` (extract/trunc/add/diff/last_day/
    add_months/epoch micros/interval arithmetic)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("o_year"),
        F.month(d).alias("o_month"),
        F.dayofmonth(d).alias("o_day"),
        F.quarter(d).alias("o_quarter"),
        F.dayofweek(d).alias("o_dow"),
        F.date_format(F.date_trunc("month", d), "yyyy-MM-dd").alias("month_start"),
        F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus_30d"),
        F.date_format(F.date_sub(d, 7), "yyyy-MM-dd").alias("minus_7d"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("days_since_epoch_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.add_months(d, 2), "yyyy-MM-dd").alias("plus_2mo"),
        # parquet ms-timestamps load as TIMESTAMP_NTZ in Spark 4;
        # unix_micros needs TIMESTAMP — identical under the UTC session tz
        F.unix_micros(d.cast("timestamp")).alias("o_micros"),
        F.date_format(d + F.expr("INTERVAL 1 HOUR"), "yyyy-MM-dd HH:mm:ss").alias("plus_1h"),
    )


@register(
    "q52_math_pack",
    oracle="""
SELECT l_orderkey, l_linenumber,
       abs(-l_discount) + 0.0 AS abs_disc,
       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
       round(l_extendedprice, 1) AS price_round1,
       sqrt(l_extendedprice) AS price_sqrt,
       round(pow(l_quantity, 1.5), 6) AS qty_pow,
       round(exp(l_discount), 6) AS disc_exp,
       round(ln(l_extendedprice + 1), 6) AS price_ln,
       round(log10(l_extendedprice + 1), 6) AS price_log10,
       round(sin(l_quantity), 6) AS qty_sin,
       round(atan2(l_quantity, l_extendedprice), 6) AS qty_atan2,
       ((-l_orderkey % 7) + 7) % 7 AS key_pmod,
       greatest(l_quantity, l_discount * 100) AS big,
       least(l_quantity, l_discount * 100) AS small
FROM lineitem
WHERE l_linenumber = 1 AND l_orderkey % 5 = 0
""",
    tags=("scalar", "math"),
)
def q52_math_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math pack (abs/ceil/floor/round/sqrt/pow/exp/ln/log10/trig/
    pmod/greatest/least). Transcendentals rounded to 6dp — JVM
    StrictMath vs C libm differ in final ulps."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_linenumber") == 1) & (F.col("l_orderkey") % 5 == 0)
    )
    q, p = F.col("l_quantity"), F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # + 0.0 on both sides: IEEE-normalizes -0.0 to +0.0 (DuckDB's
        # abs keeps the sign bit of -0.0; a string-level hash would
        # then see '-0.0' vs '0.0'). ceil/floor: Spark returns LONG,
        # DuckDB DOUBLE — the oracle casts to BIGINT to match.
        (F.abs(-F.col("l_discount")) + 0.0).alias("abs_disc"),
        F.ceil(p).alias("price_ceil"),
        F.floor(p).alias("price_floor"),
        F.round(p, 1).alias("price_round1"),
        F.sqrt(p).alias("price_sqrt"),
        F.round(F.pow(q, 1.5), 6).alias("qty_pow"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.log(p + 1), 6).alias("price_ln"),
        F.round(F.log10(p + 1), 6).alias("price_log10"),
        F.round(F.sin(q), 6).alias("qty_sin"),
        F.round(F.atan2(q, p), 6).alias("qty_atan2"),
        F.pmod(-F.col("l_orderkey"), F.lit(7)).alias("key_pmod"),
        F.greatest(q, F.col("l_discount") * 100).alias("big"),
        F.least(q, F.col("l_discount") * 100).alias("small"),
    )


@register(
    "q53_array_pack",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
       len(w) AS n_words,
       w[1] AS first_word,
       list_contains(w, 'spark') AS has_spark,
       len(list_distinct(w)) AS n_distinct,
       array_to_string(list_sort(w)[1:3], '+') AS first3_sorted,
       array_to_string(list_transform(w[1:4], x -> upper(x)), ',') AS head_upper,
       len(list_filter(w, x -> length(x) > 4)) AS n_long_words,
       CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT) AS total_chars,
       (len(list_filter(w, x -> x = 'join')) > 0) AS any_join,
       (len(list_filter(w, x -> length(x) >= 2)) = len(w)) AS all_ge2
FROM t
""",
    tags=("scalar", "array", "higher_order"),
)
def q53_array_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order function pack over tokenized documents:
    size/element_at/contains/distinct/sort/slice/transform/filter/
    aggregate/exists/forall. Arrays cross the hash boundary as joined
    strings (engines serialize lists differently)."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split("text", " ")
    return d.select("doc_id", w.alias("w")).select(
        "doc_id",
        F.size("w").alias("n_words"),
        F.element_at("w", 1).alias("first_word"),
        F.array_contains("w", "spark").alias("has_spark"),
        F.size(F.array_distinct("w")).alias("n_distinct"),
        F.array_join(F.slice(F.array_sort("w"), 1, 3), "+").alias("first3_sorted"),
        F.array_join(F.transform(F.slice("w", 1, 4), lambda x: F.upper(x)), ",").alias(
            "head_upper"
        ),
        F.size(F.filter("w", lambda x: F.length(x) > 4)).alias("n_long_words"),
        F.aggregate(
            "w", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x).cast("long")
        ).alias("total_chars"),
        F.exists("w", lambda x: x == F.lit("join")).alias("any_join"),
        F.forall("w", lambda x: F.length(x) >= 2).alias("all_ge2"),
    )


@register(
    "q54_json_pack",
    oracle="""
SELECT event_id,
       json_extract_string(props, '$.k') AS k_str,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       to_json(struct_pack(user_id := user_id, event_type := event_type)) AS packed,
       CAST(json_extract_string(props, '$.missing') AS VARCHAR) AS missing_field
FROM events
WHERE event_id % 7 = 0
""",
    tags=("scalar", "json"),
)
def q54_json_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON pack over `events.props`: get_json_object / from_json
    (schema'd parse) / to_json round-trip / missing-path NULL."""
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.from_json("props", "k INT").getField("k").alias("k_int"),
        F.to_json(F.struct("user_id", "event_type")).alias("packed"),
        F.get_json_object("props", "$.missing").alias("missing_field"),
    )


@register(
    "q55_struct_map_pack",
    oracle="""
SELECT user_id, event_type AS k, COUNT(*) AS v
FROM events
GROUP BY user_id, event_type
""",
    tags=("scalar", "struct", "map"),
)
def q55_struct_map_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map/struct plumbing: per-user event-type counts built into a
    map (map_from_entries ∘ collect_list ∘ struct), then exploded back
    to flat rows (engines can't hash-compare raw maps — and the round
    trip exercises create/entries/explode)."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "cnt"))).alias("type_counts")
    )
    return as_map.select("user_id", F.explode("type_counts").alias("k", "v"))


@register(
    "q65_scalar_pack2",
    oracle="""
SELECT n_nationkey,
       array_to_string(list_transform(string_split(lower(n_name), ' '),
                       w -> upper(w[1:1]) || w[2:]), ' ') AS name_initcap,
       reverse(n_name) AS name_rev,
       left(n_name, 3) AS name_l3,
       right(n_name, 3) AS name_r3,
       repeat(left(n_name, 2), 3) AS name_rep,
       ascii(n_name) AS first_ascii,
       chr(65 + CAST(n_nationkey % 26 AS INT)) AS key_chr,
       ifnull(NULLIF(n_name, n_name), 'fallback') AS nvl_demo,
       CASE WHEN NULLIF(n_regionkey, 0) IS NOT NULL THEN 'has' ELSE 'none' END AS nvl2_demo,
       CASE WHEN isnan('NaN'::DOUBLE) THEN CAST(n_nationkey AS DOUBLE)
            ELSE 0.0 END AS nanvl_demo,
       strftime(make_date(2000 + CAST(n_nationkey AS INT), 3, 15), '%Y-%m-%d') AS md,
       strftime(last_day(make_date(2000 + CAST(n_nationkey AS INT), 2, 3)), '%Y-%m-%d') AS ld,
       strftime(make_timestamp(CAST(n_nationkey AS BIGINT) * 86400 * 1000000), '%Y-%m-%d %H:%M:%S') AS ts_s
FROM nation
""",
    tags=("scalar", "string", "datetime", "null"),
)
def q65_scalar_pack2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second scalar pack: initcap (DuckDB lacks it — the oracle
    emulates with list_transform), reverse/left/right/repeat/ascii/
    chr, nvl/nvl2/nanvl/isnan three-ways, make_date, last_day,
    epoch-micros timestamps (make_timestamp — naive on both engines;
    to_timestamp would be session-timezone-dependent in DuckDB)."""
    from cli_spark.functions.determinism import date_str, ts_str

    n = load_table(spark, sf_dir, "nation")
    nan = F.lit("NaN").cast("double")
    return n.select(
        "n_nationkey",
        F.initcap(F.lower("n_name")).alias("name_initcap"),
        F.reverse("n_name").alias("name_rev"),
        F.left("n_name", F.lit(3)).alias("name_l3"),
        F.right("n_name", F.lit(3)).alias("name_r3"),
        F.repeat(F.left("n_name", F.lit(2)), 3).alias("name_rep"),
        F.ascii("n_name").alias("first_ascii"),
        F.char(F.lit(65) + (F.col("n_nationkey") % 26).cast("int")).alias("key_chr"),
        F.nvl(F.nullif("n_name", "n_name"), F.lit("fallback")).alias("nvl_demo"),
        F.nvl2(F.nullif("n_regionkey", F.lit(0)), F.lit("has"), F.lit("none")).alias("nvl2_demo"),
        F.when(F.isnan(nan), F.nanvl(nan, F.col("n_nationkey").cast("double")))
        .otherwise(0.0)
        .alias("nanvl_demo"),
        date_str(F.make_date(F.lit(2000) + F.col("n_nationkey"), F.lit(3), F.lit(15))).alias("md"),
        date_str(F.last_day(F.make_date(F.lit(2000) + F.col("n_nationkey"), F.lit(2), F.lit(3)))).alias("ld"),
        ts_str(
            F.timestamp_micros(F.col("n_nationkey").cast("long") * 86400 * 1000000)
        ).alias("ts_s"),
    )


@register(
    "q66_spark_native_funcs",
    oracle=f"""
WITH xxh(k, xxh64, crc32) AS (VALUES {_Q66_VALUES})
SELECT n.n_nationkey,
       'N350' AS name_soundex,
       CAST(12 * n.n_nationkey + 2 AS DOUBLE) AS mb,
       CAST(CASE WHEN n.n_nationkey % 2 = 0 THEN n.n_nationkey
                 ELSE n.n_nationkey + 1 END AS DOUBLE) AS bankers,
       bin(n.n_nationkey) AS binary_repr,
       x.crc32 AS crc,
       x.xxh64 AS xxh,
       base64(CAST(n.n_name AS BLOB)) AS b64,
       hex(n.n_nationkey) AS hex_key,
       CAST(n.n_nationkey * 4 AS INT) AS shl,
       CAST(n.n_nationkey // 2 AS INT) AS shr
FROM nation n JOIN xxh x ON x.k = n.n_nationkey
""",
    tags=("scalar", "spark_native"),
)
def q66_spark_native_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native function surface (soundex, months_between, bround
    banker's rounding, conv base conversion, crc32 / xxhash64, base64,
    hex, bit shifts). Oracle-checked despite DuckDB's thinner surface:
    nation names are the fixed 25-row NATION_k set, so soundex is the
    constant 'N350' (digits are skipped), months_between of two
    day-15 dates is exactly 12k+2, bround(k+0.5) is round-half-even in
    closed form, conv(.,10,2)=bin(), hex/base64/shifts/crc32 exist in
    DuckDB directly, and the Spark-seeded xxhash64 is pinned as a
    25-row VALUES golden (drift in ANY engine version breaks the
    hash compare; also pytest-pinned in test_parity)."""
    n = load_table(spark, sf_dir, "nation")
    return n.select(
        "n_nationkey",
        F.soundex("n_name").alias("name_soundex"),
        F.months_between(
            F.make_date(F.lit(2024), F.lit(3), F.lit(15)),
            F.make_date(F.lit(2024) - F.col("n_nationkey"), F.lit(1), F.lit(15)),
        ).alias("mb"),
        F.bround(F.col("n_nationkey") + 0.5, 0).alias("bankers"),
        F.conv(F.col("n_nationkey").cast("string"), 10, 2).alias("binary_repr"),
        F.crc32(F.encode("n_name", "utf-8")).alias("crc"),
        F.xxhash64("n_name").alias("xxh"),
        F.base64(F.encode("n_name", "utf-8")).alias("b64"),
        F.hex(F.col("n_nationkey")).alias("hex_key"),
        F.shiftleft(F.col("n_nationkey"), 2).alias("shl"),
        F.shiftright(F.col("n_nationkey"), 1).alias("shr"),
    )


@register(
    "q67_map_ops_pack",
    oracle="""
SELECT n_nationkey,
       CAST(length(n_name) AS BIGINT) AS name_len,
       CAST(2 * n_nationkey AS BIGINT) AS key_x2,
       CAST(n_regionkey AS BIGINT) AS reg_upkey,
       CAST(CASE WHEN 2 * n_nationkey >= 10 THEN 1 ELSE 0 END
          + CASE WHEN 2 * n_regionkey >= 10 THEN 1 ELSE 0 END
          + CASE WHEN 2 * length(n_name) >= 10 THEN 1 ELSE 0 END AS INT) AS n_big,
       CAST(2 * n_nationkey AS BIGINT) AS key_sum,
       'key,len,reg' AS keys_sorted,
       CAST(n_nationkey + n_regionkey + length(n_name) AS BIGINT) AS values_total
FROM nation
""",
    tags=("scalar", "map"),
)
def q67_map_ops_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-function pack: create_map / map_concat / transform_keys /
    transform_values / map_filter / map_zip_with / element_at /
    map_keys / map_values — flattened to scalars for the result. The
    flattened scalars are plain arithmetic over (nationkey, regionkey,
    length(name)), so the oracle states them directly in SQL without
    needing DuckDB's (thinner) MAP type at all; exact values also
    pinned in tests/test_parity.py::test_q67_goldens."""
    n = load_table(spark, sf_dir, "nation")
    m = F.create_map(
        F.lit("key"), F.col("n_nationkey").cast("long"),
        F.lit("reg"), F.col("n_regionkey").cast("long"),
    )
    m2 = F.create_map(F.lit("len"), F.length("n_name").cast("long"))
    merged = F.map_concat(m, m2)
    doubled = F.transform_values(merged, lambda k, v: v * 2)
    upkeys = F.transform_keys(merged, lambda k, v: F.upper(k))
    only_big = F.map_filter(doubled, lambda k, v: v >= 10)
    summed = F.map_zip_with(m, m, lambda k, v1, v2: v1 + v2)
    return n.select(
        "n_nationkey",
        F.element_at(merged, "len").alias("name_len"),
        F.element_at(doubled, "key").alias("key_x2"),
        F.element_at(upkeys, "REG").alias("reg_upkey"),
        F.size(only_big).alias("n_big"),
        F.element_at(summed, "key").alias("key_sum"),
        F.array_join(F.array_sort(F.map_keys(merged)), ",").alias("keys_sorted"),
        F.aggregate(
            F.map_values(merged), F.lit(0).cast("long"), lambda acc, v: acc + v
        ).alias("values_total"),
    )


@register(
    "q269_decimal_exact_pack",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS sum_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS VARCHAR) AS sum_disc_price,
       CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS min_price,
       CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS max_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
    tags=("scalar", "decimal", "types"),
)
def q269_decimal_exact_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DECIMAL arithmetic surface: money columns cast to
    DECIMAL(18,2), summed and multiplied under decimal rules — the
    type a financial schema actually stores, where float drift is not
    an option. Decimal sums are exact and order-independent in BOTH
    engines (Spark widens the accumulator per SQL rules; DuckDB
    likewise), so no quantization layer is needed; results cross the
    hash boundary as canonical strings to avoid dtype-object
    mismatches. The doubles→decimal cast itself rounds the shortest
    repr identically here because the source values are 2-decimal
    money.

    Scale: decimal aggregation partial-combines exactly like longs
    (the accumulator is an UnsafeRow fixed-width decimal) — same
    one-exchange plan as q01."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(price).alias("_sp"),
            F.sum(price * disc).alias("_sdp"),
            F.min(price).alias("_mnp"),
            F.max(price).alias("_mxp"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "l_returnflag",
            F.col("_sp").cast("string").alias("sum_price"),
            F.col("_sdp").cast("string").alias("sum_disc_price"),
            F.col("_mnp").cast("string").alias("min_price"),
            F.col("_mxp").cast("string").alias("max_price"),
            "n",
        )
    )


@register(
    "q358_xml_pack",
    # The XML is synthesized from typed event fields, so the oracle
    # recomputes every extracted value from the fields directly —
    # a from_xml/xpath decode bug surfaces as a census mismatch.
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sum,
       CAST(SUM(event_id % 5) AS BIGINT) AS n_sum
FROM events
GROUP BY event_type
""",
    tags=("scalar", "xml", "spark4"),
)
def q358_xml_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native XML expression pack (Spark 4 `from_xml` + the `xpath_*`
    family — the last untouched semi-structured codec after
    JSON/VARIANT/CSV): each event is rendered as an XML element with
    attributes and a child node, then decoded back through BOTH APIs
    — `from_xml` with a struct schema (attributes surface under the
    `_` attributePrefix convention) and `xpath_int` against the child
    — and the per-type census of the decoded values must equal the
    oracle's direct recomputation from the typed source columns.
    Round-tripping through the engine's own rendering is the same
    self-sourced pattern as the BMP/WAV/AVI codecs: the testdata
    ships no XML, and synthesis is what makes the decode exactly
    gradable."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        F.expr(
            "from_xml("
            + "concat('<e k=\"', get_json_object(props, '$.k'), '\" t=\"', "
            + "event_type, '\"><n>', CAST(event_id % 5 AS STRING), '</n></e>'),"
            + " '_k INT, _t STRING, n INT')"
        ).alias("s"),
        F.expr(
            "xpath_int(concat('<e><n>', CAST(event_id % 5 AS STRING), "
            "'</n></e>'), '/e/n')"
        ).alias("n_xpath"),
    ).select(
        F.col("s._t").alias("event_type"),
        F.col("s._k").alias("k"),
        "n_xpath",
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("long").alias("k_sum"),
        F.sum("n_xpath").cast("long").alias("n_sum"),
    )
