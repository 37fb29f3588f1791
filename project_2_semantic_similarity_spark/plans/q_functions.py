"""Scalar-function families (SURVEY.md §2.B: string / date / math /
array / map-JSON / case-cast), each exercised over a testdata table
with a DuckDB oracle.

Cross-engine parity notes baked in: Spark ``year()``/``length()``
return INT where DuckDB returns BIGINT (cast both), DuckDB ``ceil``
returns DOUBLE where Spark returns LONG (cast both), temporal outputs
go out as formatted strings, and double→int conversions use explicit
``floor`` (Spark casts truncate, DuckDB casts round — never rely on
cast semantics)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from project_2_semantic_similarity_spark.functions import dot
from project_2_semantic_similarity_spark.plans.registry import query
from project_2_semantic_similarity_spark.sources import load_table


@query(
    "fn_string",
    oracle="""
SELECT c_custkey,
       lower(c_name) AS lower_name,
       upper(c_mktsegment) AS upper_seg,
       substr(c_name, 10, 9) AS cust_num,
       c_name || ':' || c_mktsegment AS name_seg,
       trim('  ' || c_name || ' ') AS trimmed,
       CAST(length(c_name) AS BIGINT) AS name_len,
       regexp_replace(c_name, '[0-9]+', '#', 'g') AS digits_masked,
       string_split(c_name, '#')[1] AS name_prefix
FROM customer
""",
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lower_name"),
        F.upper("c_mktsegment").alias("upper_seg"),
        F.substring("c_name", 10, 9).alias("cust_num"),
        F.concat_ws(":", "c_name", "c_mktsegment").alias("name_seg"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" ")))
         .alias("trimmed"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("digits_masked"),
        F.element_at(F.split("c_name", "#"), 1).alias("name_prefix"),
    )


@query(
    "fn_date",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       CAST(day(o_orderdate) AS BIGINT) AS order_day,
       CAST(dayofweek(o_orderdate) AS BIGINT) AS order_dow,
       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
       CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
           AS days_since_95,
       strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date
FROM orders
""",
)
def fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/interval functions. DuckDB dayofweek: Sunday=0; Spark
    dayofweek: Sunday=1 — aligned via -1."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("order_dow"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd")
         .alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
         .cast("bigint").alias("days_since_95"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"),
                      "yyyy-MM-dd").alias("due_date"),
    )


@query(
    "fn_math",
    oracle="""
SELECT l_orderkey, l_linenumber,
       round(log10(l_extendedprice), 6) AS log_price,
       round(sqrt(l_quantity), 6) AS sqrt_qty,
       round(pow(l_discount, 2), 6) AS disc_sq,
       round(abs(l_extendedprice - 50000), 2) AS abs_diff,
       CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k
FROM lineitem
""",
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions (reference R8 family: log10/sqrt/pow —
    app.py:58, 110, 156)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.log10("l_extendedprice"), 6).alias("log_price"),
        F.round(F.sqrt("l_quantity"), 6).alias("sqrt_qty"),
        F.round(F.pow("l_discount", 2), 6).alias("disc_sq"),
        F.round(F.abs(F.col("l_extendedprice") - 50000), 2).alias("abs_diff"),
        F.ceil("l_quantity").cast("bigint").alias("qty_ceil"),
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint")
         .alias("price_k"),
    )


@query(
    "fn_array",
    oracle="""
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
       round(CAST(list_aggregate(embedding, 'max') AS DOUBLE), 6) AS max_val,
       round(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]), 6) AS norm_sq
FROM embeddings
""",
)
def fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over the embedding column — the
    dot product runs via zip_with+aggregate (JVM codegen, no UDF)."""
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6)
         .alias("first_val"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
        F.round(dot("embedding", "embedding"), 6).alias("norm_sq"),
    )


@query(
    "fn_json",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       json_extract_string(props, '$.missing') AS missing_key
FROM events
""",
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
        F.get_json_object("props", "$.missing").alias("missing_key"),
    )


@query(
    "fn_map",
    oracle="""
SELECT event_id,
       json_keys(props)[1] AS first_key,
       CAST(len(json_keys(props)) AS INT) AS n_keys,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events
""",
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse props into map<string,string>, then
    map_keys / size / element_at — the schema-on-read path for
    semi-structured columns whose key set is open (vs from_json to a
    fixed struct when it is closed)."""
    ev = load_table(spark, sf_dir, "events")
    m = ev.select(
        "event_id",
        F.from_json("props", "map<string,string>").alias("m"))
    # try_element_at, not element_at: ANSI mode (Spark 4 default)
    # throws on a missing key / empty array, where the oracle's
    # json_extract_string returns NULL — NULL semantics must match
    # even though today's fixture always carries key "k".
    return m.select(
        "event_id",
        F.try_element_at(F.map_keys("m"), F.lit(1)).alias("first_key"),
        F.size("m").alias("n_keys"),
        F.try_element_at("m", F.lit("k")).cast("bigint").alias("k_value"),
    )


@query(
    "fn_case_cast",
    oracle="""
SELECT o_orderkey,
       CASE WHEN o_totalprice > 300000 THEN 'large'
            WHEN o_totalprice > 100000 THEN 'medium'
            ELSE 'small' END AS size_class,
       CAST(o_orderkey AS VARCHAR) AS key_str,
       CAST(floor(o_totalprice) AS BIGINT) AS price_int,
       CAST(o_orderstatus = 'O' AS VARCHAR) AS is_open
FROM orders
""",
)
def fn_case_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN + casts. Double→int goes through floor() on both
    sides (Spark CAST truncates toward zero, DuckDB CAST rounds)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "large")
         .when(F.col("o_totalprice") > 100000, "medium")
         .otherwise("small").alias("size_class"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
        (F.col("o_orderstatus") == "O").cast("string").alias("is_open"),
    )


@query(
    "fn_bitwise",
    oracle="""
SELECT c_custkey,
       c_custkey & 255 AS and_mask,
       c_custkey | 4096 AS or_flag,
       xor(c_custkey, 1365) AS xor_val,
       c_custkey << 3 AS shl3,
       c_custkey >> 2 AS shr2,
       CAST(bit_count(c_custkey) AS INT) AS popcount,
       ~c_custkey AS complement
FROM customer
""",
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise expression family — the primitives every hash/bucket/
    bitmap technique in the engine leans on (simhash hamming via
    bit_count, bloom word masks via shifts), exercised as first-class
    scalar functions with a cross-engine oracle. All pure codegen'd
    JVM arithmetic."""
    c = load_table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    return c.select(
        "c_custkey",
        k.bitwiseAND(F.lit(255)).alias("and_mask"),
        k.bitwiseOR(F.lit(4096)).alias("or_flag"),
        k.bitwiseXOR(F.lit(1365)).alias("xor_val"),
        F.shiftleft(k, 3).alias("shl3"),
        F.shiftright(k, 2).alias("shr2"),
        F.bit_count(k).alias("popcount"),
        F.bitwise_not(k).alias("complement"),
    )


@query(
    "fn_url_parse",
    oracle="""
WITH raw AS (
    SELECT doc_id,
           'https://www.example' || (doc_id % 5) || '.com'
           || '/docs/' || (doc_id % 250)
           || '?page=' || (doc_id % 9) || '&ref=idx' AS url
    FROM documents
)
SELECT doc_id,
       regexp_extract(url, '^([a-z][a-z0-9+.-]*)://', 1) AS protocol,
       regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]*)', 1) AS host,
       regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)', 1)
           AS path,
       regexp_extract(url, '\\?([^#]*)', 1) AS query,
       regexp_extract(url, '[?&]page=([^&#]*)', 1) AS page_param
FROM raw
""",
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL structural decomposition via Spark's parse_url
    (protocol/host/path/query + single-parameter extraction) — the
    crawl-metadata scalar family next to dedup_url's canonicalizer.
    Spark side uses the built-in java.net.URI-backed parse_url;
    the oracle re-derives every component with RFC-3986 regexes —
    so the check also pins that parse_url's semantics match the
    grammar on well-formed URLs. Deterministic synthetic URLs ride
    the documents table (no fixture files)."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://www.example"), (F.col("doc_id") % 5).cast("string"),
        F.lit(".com/docs/"), (F.col("doc_id") % 250).cast("string"),
        F.lit("?page="), (F.col("doc_id") % 9).cast("string"),
        F.lit("&ref=idx"))
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("page"))
        .alias("page_param"))


@query(
    "fn_struct",
    oracle="""
WITH r AS (
    SELECT l_orderkey, l_extendedprice, l_linenumber,
           row_number() OVER (PARTITION BY l_orderkey
                              ORDER BY l_extendedprice DESC,
                                       l_linenumber DESC) AS rd,
           row_number() OVER (PARTITION BY l_orderkey
                              ORDER BY l_extendedprice ASC,
                                       l_linenumber ASC) AS ra,
           count(*) OVER (PARTITION BY l_orderkey) AS n
    FROM lineitem
)
SELECT a.l_orderkey,
       CAST(a.n AS BIGINT) AS n_items,
       round(a.l_extendedprice, 2) AS top_price,
       CAST(a.l_linenumber AS BIGINT) AS top_linenumber,
       CAST(b.l_linenumber AS BIGINT) AS cheapest_linenumber
FROM r a
JOIN r b ON a.l_orderkey = b.l_orderkey AND b.ra = 1
WHERE a.rd = 1
""",
)
def fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StructType surface: pack each order's lines into an
    array<struct>, sort by the struct's natural (field-order)
    comparison — Spark sorts structs lexicographically by field, so
    (price, linenumber) is a total order — and read fields off the
    min/max elements. ONE shuffle replaces the oracle's two ranking
    windows + self-join: the array is built and both extremes read
    in a single hash aggregate. Top-level output stays scalar per
    the driver-canonicalizer contract; structs live only inside the
    plan."""
    li = load_table(spark, sf_dir, "lineitem")
    packed = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.struct(
            F.col("l_extendedprice").alias("price"),
            F.col("l_linenumber").alias("ln")))).alias("items"))
    top = F.element_at("items", -1)
    bottom = F.element_at("items", 1)
    return packed.select(
        "l_orderkey",
        F.size("items").cast("bigint").alias("n_items"),
        F.round(top["price"], 2).alias("top_price"),
        top["ln"].cast("bigint").alias("top_linenumber"),
        bottom["ln"].cast("bigint").alias("cheapest_linenumber"))


@query(
    "agg_decimal_exact",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))) AS DOUBLE)
           AS sum_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18, 2))
                * CAST(l_discount AS DECIMAL(4, 2))) AS DOUBLE)
           AS sum_discounted,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT money aggregation through DecimalType: prices cast to
    DECIMAL(18,2) (the cast rounds the stored double to its true
    2-dp value — unambiguous for currency data), then summed in
    decimal space where addition is associative — the sum is
    bit-identical under ANY partitioning/merge order, unlike a
    double sum whose low bits depend on reduction shape. The
    price × discount product widens per SQL decimal rules
    (DECIMAL(18,2) × DECIMAL(4,2) → scale 4) and stays exact. The
    final cast to DOUBLE is one exact conversion of the settled
    total (well under 2^53).

    At 100 TB this is the difference between a ledger that
    reconciles and one that drifts: partial-agg merge order is
    nondeterministic under AQE, so financial pipelines must sum in
    decimal, not double."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return (li.groupBy("l_returnflag")
            .agg(F.sum(price).cast("double").alias("sum_price"),
                 F.sum(price * disc).cast("double")
                 .alias("sum_discounted"),
                 F.count("*").cast("bigint").alias("n")))


@query(
    "fn_regex",
    oracle="""
SELECT doc_id,
       regexp_extract(text, '[a-z]+ing', 0) AS first_ing,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
           AS n_numbers,
       regexp_replace(text, '\\s+', '_', 'g')[1:40] AS squeezed_40,
       CASE WHEN regexp_matches(text, '(dup|join|merge)')
            THEN 1 ELSE 0 END AS has_keyword
FROM documents
""",
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface: first-match extraction, match counting via
    extract-all, global whitespace squeeze (prefix-bounded so the
    hash is readable), and RLIKE boolean — all JVM-side codegen'd
    expressions over the corpus, the string-hygiene toolkit every
    text pipeline leans on. Regex syntax kept to the portable
    intersection (character classes, +, alternation) so Java and
    RE2-style engines agree."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_extract("text", "[a-z]+ing", 0).alias("first_ing"),
        F.size(F.expr(r"regexp_extract_all(text, '[0-9]+')"))
        .cast("bigint").alias("n_numbers"),
        F.substring(F.regexp_replace("text", r"\s+", "_"), 1, 40)
        .alias("squeezed_40"),
        F.when(F.col("text").rlike("(dup|join|merge)"), 1)
        .otherwise(0).alias("has_keyword"))
