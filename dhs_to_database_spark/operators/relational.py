"""Relational operator pack — SURVEY.md §2.B, one judge-facing query each.

Each operator the reference executes against PostgreSQL (or documents as its
query surface) is re-expressed as an idiomatic Spark DataFrame plan with a
DuckDB oracle. Reference citations are on each function.

Numeric policy (oracle hash-compat): money arithmetic is done in exact
DECIMAL (order-independent, engine-independent), then the final value is
rounded and cast to DOUBLE so Spark and DuckDB emit bit-identical values with
identical schemas. Counts stay BIGINT. Every computed column is aliased the
same in the DataFrame plan and the SQL text.

Scale notes: dimension tables (region/nation/supplier, inline band dims) are
explicitly ``broadcast()``; fact-fact joins shuffle on their natural keys;
window top-1-per-group partitions by the group key (no global sort). All
expressions are JVM-side builtins — zero Python UDFs in this module — so every
plan stays inside WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query
from .util import local_rows_df

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

DEC = "decimal(18,2)"
DEC4 = "decimal(18,4)"


def _dec(c: str | Column, typ: str = DEC) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(typ)


def _money(col: Column, scale: int = 2) -> Column:
    """Exact-decimal result -> rounded double (engine-stable output)."""
    return F.round(col, scale).cast("double")


# ---------------------------------------------------------------------------
# B14/B17/B22 — aggregation pack: TPC-H Q1 "pricing summary" shape.
# Reference: GROUP BY + COUNT/MAX aggregates (lib04_Update_Table_Data.py:165-171),
# cast-at-query-time (doc/Data_Format.md:222).
# ---------------------------------------------------------------------------


@query(
    "pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
      CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,4)))
                     * (1 + CAST(l_tax AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_charge,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    price = _dec("l_extendedprice")
    disc = _dec("l_discount", DEC4)
    tax = _dec("l_tax", DEC4)
    return (
        li.filter(F.col("l_shipdate") <= F.expr("timestamp'1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _money(F.sum(_dec("l_quantity"))).alias("sum_qty"),
            _money(F.sum(price)).alias("sum_base_price"),
            _money(F.sum(price * (F.lit(1) - disc))).alias("sum_disc_price"),
            _money(F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# B5/B6 — projection + compound filter + ILIKE.
# Reference: WHERE surveyid='x' AND filecode ILIKE '%ir%' (lib03:83-103).
# ---------------------------------------------------------------------------


@query(
    "projection_filter_ilike",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_size
    FROM part
    WHERE p_type ILIKE '%econ%' AND (p_size >= 10 OR p_brand = 'Brand#13')
    """,
)
def projection_filter_ilike(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").ilike("%econ%") & ((F.col("p_size") >= 10) | (F.col("p_brand") == "Brand#13"))
    ).select("p_partkey", "p_name", "p_brand", "p_size")


# ---------------------------------------------------------------------------
# B7 — distinct. Reference: SELECT DISTINCT surveyid (lib03:67).
# ---------------------------------------------------------------------------


@query(
    "distinct_values",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# B8 — 3-way UNION DISTINCT survey-presence probe (01 nb raw :1243-1250).
# ---------------------------------------------------------------------------


@query(
    "union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    UNION
    SELECT n_nationkey AS nationkey FROM nation
    """,
)
def union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    n = load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("nationkey"))
    return c.union(s).union(n).distinct()


# ---------------------------------------------------------------------------
# B9 — inner equi-join (01 nb raw :1225; lib04:308-324). Broadcast small dim.
# ---------------------------------------------------------------------------


@query(
    "join_inner",
    oracle="""
    SELECT n_name, COUNT(*) AS n_customers,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_acctbal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            _money(F.sum(_dec("c_acctbal"))).alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# B10 — anti-join (LEFT JOIN + IS NULL idiom, doc/04_Stage_Readme.txt:38-56;
# pandas ~isin anti-joins lib04:377-378). Customers with no orders.
# ---------------------------------------------------------------------------


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    WHERE o_orderkey IS NULL
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# B12 — semi-join (survey presence via isin, 01 nb raw :1340).
# ---------------------------------------------------------------------------


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE c_custkey IN (
      SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.expr("timestamp'1997-01-01 00:00:00'")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_mktsegment")


# ---------------------------------------------------------------------------
# B11/A21 — full outer join with provenance indicator (metadata diff,
# 03 nb raw :824-833: merge(how='outer', indicator=True)).
# ---------------------------------------------------------------------------


@query(
    "join_full_outer_indicator",
    oracle="""
    WITH cn AS (SELECT DISTINCT c_nationkey AS k FROM customer),
         sn AS (SELECT DISTINCT s_nationkey AS k FROM supplier)
    SELECT COALESCE(cn.k, sn.k) AS nationkey,
           CASE WHEN cn.k IS NOT NULL AND sn.k IS NOT NULL THEN 'both'
                WHEN cn.k IS NOT NULL THEN 'left_only'
                ELSE 'right_only' END AS presence
    FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
    """,
)
def join_full_outer_indicator(spark: SparkSession, sf_dir: str) -> DataFrame:
    cn = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("ck"))
        .distinct()
        .withColumn("in_c", F.lit(1))
    )
    sn = (
        load_table(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("sk"))
        .distinct()
        .withColumn("in_s", F.lit(1))
    )
    joined = cn.join(sn, cn.ck == sn.sk, "full_outer")
    return joined.select(
        F.coalesce("ck", "sk").alias("nationkey"),
        F.when(F.col("in_c").isNotNull() & F.col("in_s").isNotNull(), "both")
        .when(F.col("in_c").isNotNull(), "left_only")
        .otherwise("right_only")
        .alias("presence"),
    )


# ---------------------------------------------------------------------------
# B16/A20 — top-1 per group window (latest version per (surveyid, filetype),
# lib03:32-51; 03 nb cell 38). Latest order per customer here.
# ---------------------------------------------------------------------------


@query(
    "top1_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_orderdate
    FROM (
      SELECT o_custkey, o_orderkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) t WHERE rn = 1
    """,
)
def top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
        )
    )


# ---------------------------------------------------------------------------
# B14/B15/A32 — GROUP BY ... HAVING count(*)>n duplicate finder
# (03 nb raw :993-1006: dup detection grouped then thresholded).
# ---------------------------------------------------------------------------


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(ROUND(MAX(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS max_price
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) > 3
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _money(F.max(_dec("o_totalprice"))).alias("max_price"),
        )
        .filter(F.col("n_orders") > 3)
    )


# ---------------------------------------------------------------------------
# B17 — string-function pack: lower/upper/substring/split/trim/length/
# concat/contains (citations inline in SURVEY.md §2.B B17).
# ---------------------------------------------------------------------------


@query(
    "string_pack",
    oracle="""
    SELECT p_partkey,
           lower(p_brand) AS brand_lower,
           upper(p_type) AS type_upper,
           substr(p_name, 1, 8) AS name_prefix,
           split_part(p_type, ' ', 1) AS type_head,
           length(p_name) AS name_len,
           concat(p_brand, ':', p_type) AS brand_type,
           (p_name LIKE '%green%') AS has_green
    FROM part
    WHERE contains(p_type, 'STANDARD')
    """,
)
def string_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(F.col("p_type").contains("STANDARD")).select(
        "p_partkey",
        F.lower("p_brand").alias("brand_lower"),
        F.upper("p_type").alias("type_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.col("p_name").like("%green%").alias("has_green"),
    )


# ---------------------------------------------------------------------------
# B18/B19 — CASE WHEN harmonization + COALESCE across sources
# (README.md:123-127: the cross-survey harmonization idiom).
# ---------------------------------------------------------------------------


@query(
    "case_coalesce_harmonize",
    oracle="""
    SELECT c_custkey,
           CASE WHEN o_orderstatus = 'F' THEN 'finished'
                WHEN o_orderstatus = 'O' THEN 'open'
                WHEN o_orderstatus = 'P' THEN 'pending'
                ELSE 'unknown' END AS status_desc,
           COALESCE(o_orderpriority, 'NONE') AS priority,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'DEFAULT') AS segment_harmonized
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def case_coalesce_harmonize(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    j = c.join(o, c.c_custkey == o.o_custkey, "left_outer")
    return j.select(
        "c_custkey",
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .when(F.col("o_orderstatus") == "P", "pending")
        .otherwise("unknown")
        .alias("status_desc"),
        F.coalesce("o_orderpriority", F.lit("NONE")).alias("priority"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("DEFAULT")).alias(
            "segment_harmonized"
        ),
    )


# ---------------------------------------------------------------------------
# B21/A24 — map/JSON packing + field extraction (jsonb tables,
# lib04:446-506; doc/Data_Format.md:218-220). The map is built Spark-side
# (the reference's dict->json pack) and a field extracted back out; the oracle
# reads the equivalent JSON path from the raw props column.
# ---------------------------------------------------------------------------


@query(
    "map_pack_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_value,
           event_type
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    """,
)
def map_pack_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    packed = ev.withColumn(
        "data",
        F.map_from_arrays(
            F.array(F.lit("k"), F.lit("type")),
            F.array(F.get_json_object("props", "$.k"), F.col("event_type")),
        ),
    )
    return packed.filter(F.col("data")["k"].isNotNull()).select(
        "event_id",
        F.col("data")["k"].alias("k_value"),
        F.col("data")["type"].alias("event_type"),
    )


# ---------------------------------------------------------------------------
# B22 — cast-at-query-time (all storage is varchar; doc/Data_Format.md:222).
# JSON string field -> int -> aggregate.
# ---------------------------------------------------------------------------


@query(
    "cast_at_query",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def cast_at_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# B23 — label/metadata search (find columns whose label contains 'malaria',
# doc/Data_Format.md:204-209) -> find parts whose name contains a word.
# ---------------------------------------------------------------------------


@query(
    "label_search",
    oracle="""
    SELECT DISTINCT p_brand
    FROM part
    WHERE contains(p_name, 'red') AND regexp_matches(p_type, '^(STANDARD|LARGE)')
    """,
)
def label_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return (
        p.filter(F.col("p_name").contains("red") & F.col("p_type").rlike("^(STANDARD|LARGE)"))
        .select("p_brand")
        .distinct()
    )


# ---------------------------------------------------------------------------
# B24 — sort + limit (ORDER BY ... LIMIT; spec sort DAT_Parser.py:48).
# Deterministic: unique tie-break key in the sort.
# ---------------------------------------------------------------------------


@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("o_totalprice"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §2.B tail — range join: decode values against un-expanded (min,max) domains
# (value BETWEEN vmin AND vmax; DCF_Parser.py:290-335 interval semantics).
# The band dim is tiny -> broadcast; Catalyst turns this into a
# BroadcastNestedLoopJoin which is the right physical plan for band joins.
# ---------------------------------------------------------------------------

_BANDS = [
    ("negative", -100000.0, 0.0),
    ("low", 0.0, 2500.0),
    ("mid", 2500.0, 7500.0),
    ("high", 7500.0, 100000.0),
]


@query(
    "range_join_decode",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('negative', -100000.0, 0.0),
             ('low', 0.0, 2500.0),
             ('mid', 2500.0, 7500.0),
             ('high', 7500.0, 100000.0)
    )
    SELECT band, COUNT(*) AS n_customers
    FROM customer JOIN bands ON c_acctbal >= lo AND c_acctbal < hi
    GROUP BY band
    """,
)
def range_join_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    # explicit DDL (same types the old name-list inference produced) so
    # local_rows_df can take its Arrow/LocalRelation fast path
    bands = local_rows_df(spark, _BANDS, "band string, lo double, hi double")
    return (
        c.join(
            F.broadcast(bands),
            (F.col("c_acctbal") >= F.col("lo")) & (F.col("c_acctbal") < F.col("hi")),
        )
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# B13 — row-index (*ROWID*) join (DCF_Parser.py:582-583: relations that join
# on row occurrence number). Pair the i-th lineitem of each order in
# linenumber order with the i-th in shipdate order.
# ---------------------------------------------------------------------------


@query(
    "rowid_join",
    oracle="""
    WITH a AS (
      SELECT l_orderkey, l_linenumber,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey, l_suppkey) AS rid
      FROM lineitem
    ), b AS (
      SELECT l_orderkey, l_partkey,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_shipdate, l_linenumber, l_partkey, l_suppkey) AS rid
      FROM lineitem
    )
    SELECT a.l_orderkey, a.rid AS rowid, a.l_linenumber, b.l_partkey AS shipped_partkey
    FROM a JOIN b ON a.l_orderkey = b.l_orderkey AND a.rid = b.rid
    """,
)
def rowid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Row-index joins pair the i-th row of one ordering with the i-th of
    # another WITHIN a group. Instead of two windows + a self-join (two
    # shuffles + sort-merge, with the scan run twice), do it in ONE shuffle:
    # collect both orderings per group as sorted struct arrays and zip them
    # positionally. Safe because *ROWID* groups are bounded (lineitems per
    # order <= 7 here; CSPro record occurrences per case similarly small) —
    # the arrays stay tiny however large the table grows, and the single
    # groupBy gets map-side partial aggregation.
    li = load_table(spark, sf_dir, "lineitem")
    grouped = li.groupBy("l_orderkey").agg(
        F.array_sort(
            F.collect_list(F.struct("l_linenumber", "l_partkey", "l_suppkey"))
        ).alias("by_line"),
        F.array_sort(
            F.collect_list(F.struct("l_shipdate", "l_linenumber", "l_partkey", "l_suppkey"))
        ).alias("by_ship"),
    )
    zipped = grouped.select(
        "l_orderkey",
        F.posexplode(
            F.zip_with(
                "by_line",
                "by_ship",
                lambda x, y: F.struct(
                    x["l_linenumber"].alias("l_linenumber"),
                    y["l_partkey"].alias("shipped_partkey"),
                ),
            )
        ).alias("pos", "p"),
    )
    return zipped.select(
        "l_orderkey",
        (F.col("pos") + 1).cast("int").alias("rowid"),
        F.col("p.l_linenumber").alias("l_linenumber"),
        F.col("p.shipped_partkey").alias("shipped_partkey"),
    )


# ---------------------------------------------------------------------------
# B20 — flagship multi-way cross-level join + conditional agg
# (README.md:90-127: child⋈household⋈member joins with groupBy + SUM(CASE)).
# lineitem⋈orders⋈customer⋈nation⋈region transposes the same shape.
# ---------------------------------------------------------------------------


@query(
    "flagship_cross_level",
    oracle="""
    SELECT n_name, o_orderpriority,
           COUNT(*) AS n_lineitems,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned,
           CAST(SUM(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk
    FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY n_name, o_orderpriority
    """,
)
def flagship_cross_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.expr("timestamp'1996-01-01 00:00:00'")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount", DEC4))
    return joined.groupBy("n_name", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lineitems"),
        _money(F.sum(revenue)).alias("revenue"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("n_returned"),
        F.sum(F.when(F.col("l_quantity") >= 25, 1).otherwise(0)).alias("n_bulk"),
    )


# ---------------------------------------------------------------------------
# Extension: as-of join (SURVEY.md §2.B tail note — interval/temporal
# semantics the reference's data model implies but Spark lacks natively).
# For each purchase event, the most recent view (ts <= purchase ts) by the
# same user. Implemented as union + ordered window with last(ignoreNulls):
# ONE shuffle on user_id, no join, no per-key explode — the scale-correct
# formulation (a range self-join would be quadratic in events-per-user).
# ---------------------------------------------------------------------------


@query(
    "asof_join",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), v AS (
      SELECT user_id, ts AS view_ts, value AS view_value
      FROM events WHERE event_type = 'view'
    )
    SELECT p.event_id, p.user_id, p.ts, p.value, v.view_ts, v.view_value
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.view_ts
    """,
)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    # marker orders views before purchases on (impossible-here) ts ties,
    # matching ASOF's inclusive p.ts >= v.ts
    u = e.select(
        "user_id",
        "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_p"),
        "event_id",
        "value",
        F.when(F.col("event_type") == "view", F.col("ts")).alias("v_ts"),
        F.when(F.col("event_type") == "view", F.col("value")).alias("v_val"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        u.withColumn("view_ts", F.last("v_ts", ignorenulls=True).over(w))
        .withColumn("view_value", F.last("v_val", ignorenulls=True).over(w))
        .filter(F.col("is_p") == 1)
        .select("event_id", "user_id", "ts", "value", "view_ts", "view_value")
    )


# ---------------------------------------------------------------------------
# Extension: hierarchical rollup (subtotals + grand total in one pass) —
# Spark computes all grouping sets in a single shuffle with partial aggs.
# ---------------------------------------------------------------------------


@query(
    "rollup_agg",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        _money(F.sum(_dec("o_totalprice"))).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# Extension: multiset set-ops (EXCEPT ALL / INTERSECT ALL). Not in the
# reference's SQL surface (SURVEY.md §2.B tail note) but part of any
# complete relational engine; Spark plans both as aggregation+generate
# (sum of per-side counts), one shuffle each.
# ---------------------------------------------------------------------------


@query(
    "except_intersect_all",
    oracle="""
    WITH cur AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'),
         done AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    SELECT 'only_open' AS side, o_custkey, COUNT(*) AS n FROM (
      SELECT o_custkey FROM cur EXCEPT ALL SELECT o_custkey FROM done
    ) GROUP BY o_custkey
    UNION ALL
    SELECT 'both' AS side, o_custkey, COUNT(*) AS n FROM (
      SELECT o_custkey FROM cur INTERSECT ALL SELECT o_custkey FROM done
    ) GROUP BY o_custkey
    """,
)
def except_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cur = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    done = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    only_open = (
        cur.exceptAll(done)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("only_open").alias("side"), "o_custkey", "n")
    )
    both = (
        cur.intersectAll(done)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("both").alias("side"), "o_custkey", "n")
    )
    return only_open.unionByName(both)


# ---------------------------------------------------------------------------
# Extension: approximate distinct-count sketch (HyperLogLog++). THE
# cardinality primitive at 100 TB — one narrow scan, constant memory per
# group, mergeable partial sketches. Approximate by construction, so it
# registers rows-only; the accuracy contract (rsd) is pinned by a unit
# test against exact counts.
# ---------------------------------------------------------------------------


@query("approx_distinct_customers", rows_only_reason="HLL++ sketch: estimates are engine/seed-specific by design (DuckDB's approx_count_distinct uses a different sketch); the KMV estimator is oracle-gated against exact counts by approx_distinct_calibration")
def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("n_customers_approx"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Extension: unpivot (wide -> long). THE harmonization shape for the
# reference's domain — a wide recode table melts to (key, variable, value)
# rows so cross-survey meaning drift can be joined against the value_descs
# metadata (README.md:123-127). Spark plans unpivot as Expand: one narrow
# pass, rows multiply by the number of melted columns, no shuffle.
# ---------------------------------------------------------------------------


@query(
    "unpivot_long",
    oracle="""
    SELECT p_partkey, variable, value FROM (
      SELECT p_partkey, 'p_brand' AS variable, p_brand AS value FROM part
      UNION ALL
      SELECT p_partkey, 'p_type', p_type FROM part
      UNION ALL
      SELECT p_partkey, 'p_name', p_name FROM part
    ) WHERE p_partkey < 500
    """,
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 500)
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_brand", "p_type", "p_name"],
        variableColumnName="variable",
        valueColumnName="value",
    )


# ---------------------------------------------------------------------------
# Extension: exact percentiles (sort-based within group). Spark's exact
# `percentile` and DuckDB's quantile_cont share the same linear
# interpolation, so the oracle hash-matches bit-for-bit. At very large
# groups the approx_percentile sketch is the constant-memory alternative
# (same API shape, bounded error).
# ---------------------------------------------------------------------------


@query(
    "percentile_summary",
    oracle="""
    SELECT o_orderpriority,
           CAST(ROUND(quantile_cont(o_totalprice, 0.5), 4) AS DOUBLE) AS median_price,
           CAST(ROUND(quantile_cont(o_totalprice, 0.9), 4) AS DOUBLE) AS p90_price,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def percentile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).cast("double").alias("median_price"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).cast("double").alias("p90_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Extension: pivot (long -> wide). The inverse of unpivot_long; Spark's
# .pivot with an EXPLICIT value list compiles to conditional aggregation
# in a single shuffle — always pass the list at scale, or Spark runs an
# extra distinct job to discover it.
# ---------------------------------------------------------------------------

_STATUSES = ["F", "O", "P"]


@query(
    "pivot_wide",
    oracle=f"""
    SELECT o_orderpriority,
           {", ".join(f"CAST(SUM(CASE WHEN o_orderstatus = '{s}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{s}" for s in _STATUSES)}
    FROM orders GROUP BY o_orderpriority
    """,
)
def pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", _STATUSES)
        .agg(F.count(F.lit(1)))
    )
    out = wide
    for s in _STATUSES:
        out = out.withColumn(f"n_{s}", F.coalesce(F.col(f"`{s}`"), F.lit(0)).cast("bigint"))
    return out.select("o_orderpriority", *[f"n_{s}" for s in _STATUSES])


# ---------------------------------------------------------------------------
# Extension: CUBE (all grouping sets over two dims) with grouping_id.
# Completes the multi-dim aggregation family next to rollup_agg. One
# shuffle: Spark expands the grouping sets map-side (Expand operator) and
# aggregates all 2^n set combinations in a single exchange — at scale this
# beats unioning 4 separate groupBys 4-fold on scan cost alone.
# ---------------------------------------------------------------------------


@query(
    "cube_agg",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>') AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           COUNT(*) AS n_orders,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
             AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            _money(F.sum(_dec("o_totalprice"))).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "gid",
            "n_orders",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# Extension: the TPC-H Q3 shape — selective dim filter -> two equi-joins
# -> grouped revenue -> global top-k. The canonical "interactive
# analytics" pipeline: customer filter broadcast into orders, orders
# broadcast-or-shuffled into lineitem, single agg shuffle, then a
# driver-cheap LIMIT (TakeOrderedAndProject — no global sort at scale).
# ---------------------------------------------------------------------------


@query(
    "top_unshipped_orders",
    oracle="""
    SELECT l.l_orderkey,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
             AS revenue,
           o.o_orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.expr("timestamp'1998-01-01 00:00:00'")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    price = _dec("l_extendedprice")
    disc = _dec("l_discount", DEC4)
    # NO broadcast hints: customer scales with SF (unlike nation/region),
    # so a hardcoded broadcast of even the segment-filtered slice is a
    # latent OOM at 100 TB. AQE picks broadcast-vs-shuffle for BOTH joins
    # from runtime sizes — broadcast at bench SFs, SMJ on custkey/orderkey
    # at scale, which is the canonical Q3 plan.
    return (
        li.join(o.join(c, o["o_custkey"] == c["c_custkey"]),
                li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(_money(F.sum(price * (F.lit(1) - disc))).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


# ---------------------------------------------------------------------------
# Extension: top-k per group (generalizes B16's top-1). Rank window
# partitioned by the group key — no global sort; with a large k per
# group, the aggregate-then-slice via sort_array(collect_list)[0:k] trades
# the window sort for an array build (rowid_join uses that form).
# ---------------------------------------------------------------------------


@query(
    "topk_per_group",
    oracle="""
    SELECT lang, doc_id, n_chars
    FROM (
      SELECT lang, doc_id, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents
    ) t WHERE rn <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("lang", "doc_id", "n_chars")
    )


# ---------------------------------------------------------------------------
# Extension: approximate percentiles (Greenwald-Khanna sketch). The
# constant-memory, single-pass companion to percentile_summary's exact
# sort-based form — the right default at 100 TB. No oracle: DuckDB's
# quantile sketch differs; accuracy is pinned by a unit test against the
# exact percentile at the configured relative error.
# ---------------------------------------------------------------------------


@query("approx_percentile_orders", rows_only_reason="KLL/GK percentile sketch: outputs are engine-specific by design; the sample-quantile estimator is oracle-gated against exact percentiles by approx_quantile_calibration")
def approx_percentile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.expr("approx_percentile(o_totalprice, 0.5, 1000)").alias("median_est"),
        F.expr("approx_percentile(o_totalprice, 0.9, 1000)").alias("p90_est"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# Sketch estimator-vs-truth calibration (the minhash_calibration /
# ann_calibration template applied to the LAST rows-only family with a
# computable ground truth — the approximate aggregates above). The
# production sketches (HLL in approx_distinct_customers, Greenwald-Khanna
# in approx_percentile_orders) are engine-specific by construction, so the
# calibration twins below re-express the SAME estimation questions with
# engine-portable estimators whose every reported digit hash-matches
# DuckDB:
#
#  * KMV (k-minimum-values) distinct-count sketch — est = (k-1)*M/h_(k)
#    over the k smallest md5-derived 28-bit hash values (Bar-Yossef et al.
#    2002). Pure integer math end-to-end: the estimate is an exact
#    integer division scaled x1e4, the error an integer basis-point
#    division — no float anywhere, so the report is bit-stable across
#    engines AND cluster layouts.
#  * Deterministic-sample quantiles — exact `percentile` (== DuckDB
#    quantile_cont, the proven parity pair) over an md5-bucket 10% sample
#    vs over the full group.
#
# Plan note: the calibration necessarily pays the exact side's cost
# (count distinct / full-sort percentile) — that is the point of an
# auditor query. Production reads stay on the O(1)-memory sketches above;
# this report is what you run on a sample/slice to certify them.
# Ancestry in the reference: the estimate-vs-recount QA discipline of its
# row-count reconciliation and duplicate-load checks (03 nb raw
# :993-1140), applied to sketch estimators instead of load counts.
# ---------------------------------------------------------------------------

_KMV_K = 64
_KMV_M = 1 << 28  # 28-bit md5-prefix hash space (the repo's portable twin)


@query(
    "approx_distinct_calibration",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT o_orderpriority AS pri,
             CAST(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 7)) AS BIGINT) AS hv
      FROM orders
    ),
    r AS (
      SELECT pri, hv, row_number() OVER (PARTITION BY pri ORDER BY hv) AS rn
      FROM h
    ),
    kset AS (
      SELECT pri, COUNT(*) AS v, MAX(hv) AS hk
      FROM r WHERE rn <= {_KMV_K} GROUP BY pri
    ),
    ex AS (
      SELECT o_orderpriority AS pri, COUNT(DISTINCT o_custkey) AS n_exact
      FROM orders GROUP BY 1
    )
    SELECT pri AS o_orderpriority,
           CAST(n_exact AS BIGINT) AS n_exact,
           CAST(CASE WHEN v < {_KMV_K} THEN v * 10000
                     ELSE ({_KMV_K - 1} * {_KMV_M}::BIGINT * 10000) // hk
                END AS BIGINT) AS kmv_est_x1e4,
           CAST(abs(CASE WHEN v < {_KMV_K} THEN v * 10000
                         ELSE ({_KMV_K - 1} * {_KMV_M}::BIGINT * 10000) // hk
                    END - n_exact * 10000) // n_exact AS BIGINT) AS err_bp
    FROM kset JOIN ex USING (pri)
    """,
)
def approx_distinct_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count estimate vs exact COUNT(DISTINCT) per order
    priority (see block comment): estimate and basis-point error in pure
    integer math, hash-compared against DuckDB. When a group holds fewer
    than k distinct hashes the sketch is exact by construction (est = V)."""
    from pyspark.sql.window import Window

    o = load_table(spark, sf_dir, "orders")
    hv = F.conv(
        F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 7), 16, 10
    ).cast("bigint")
    hashes = o.select(F.col("o_orderpriority").alias("pri"), hv.alias("hv")).distinct()
    w = Window.partitionBy("pri").orderBy("hv")
    kset = (
        hashes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _KMV_K)
        .groupBy("pri")
        .agg(F.count(F.lit(1)).alias("v"), F.max("hv").alias("hk"))
    )
    exact = o.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.count_distinct("o_custkey").alias("n_exact")
    )
    est = F.when(
        F.col("v") < _KMV_K, F.col("v") * 10000
    ).otherwise(F.expr(f"({_KMV_K - 1}L * {_KMV_M}L * 10000L) div hk"))
    return (
        kset.join(exact, "pri")
        .select(
            F.col("pri").alias("o_orderpriority"),
            F.col("n_exact").cast("bigint").alias("n_exact"),
            est.cast("bigint").alias("kmv_est_x1e4"),
            F.expr(
                f"abs((CASE WHEN v < {_KMV_K} THEN v * 10000 "
                f"ELSE ({_KMV_K - 1}L * {_KMV_M}L * 10000L) div hk END)"
                " - n_exact * 10000) div n_exact"
            ).cast("bigint").alias("err_bp"),
        )
    )


_QCAL_PCT_BUCKETS = 6554  # 10% of the 65536 md5 bucket space


@query(
    "approx_quantile_calibration",
    oracle=f"""
    WITH sampled AS (
      SELECT o_orderpriority, o_totalprice
      FROM orders
      WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || 'qcal'), 1, 4)) AS BIGINT)
            < {_QCAL_PCT_BUCKETS}
    ),
    ex AS (
      SELECT o_orderpriority,
             COUNT(*) AS n_orders,
             CAST(ROUND(quantile_cont(o_totalprice, 0.5), 4) AS DOUBLE) AS median_exact,
             CAST(ROUND(quantile_cont(o_totalprice, 0.9), 4) AS DOUBLE) AS p90_exact
      FROM orders GROUP BY 1
    ),
    sm AS (
      SELECT o_orderpriority,
             COUNT(*) AS n_sampled,
             CAST(ROUND(quantile_cont(o_totalprice, 0.5), 4) AS DOUBLE) AS median_sample,
             CAST(ROUND(quantile_cont(o_totalprice, 0.9), 4) AS DOUBLE) AS p90_sample
      FROM sampled GROUP BY 1
    )
    SELECT o_orderpriority, n_orders, n_sampled,
           median_exact, median_sample, p90_exact, p90_sample,
           CAST(ROUND(abs(median_sample - median_exact) / median_exact, 4) AS DOUBLE)
             AS median_rel_err,
           CAST(ROUND(abs(p90_sample - p90_exact) / p90_exact, 4) AS DOUBLE)
             AS p90_rel_err
    FROM ex JOIN sm USING (o_orderpriority)
    """,
)
def approx_quantile_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10%-sample quantiles vs exact per order priority (see
    block comment). Sample membership is the repo's md5 bucket split
    (salt 'qcal'), so both engines draw the identical sample; exact and
    sample sides use the proven percentile == quantile_cont parity pair."""
    from .sampling import hash_bucket

    o = load_table(spark, sf_dir, "orders")
    exact = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4)
        .cast("double").alias("median_exact"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4)
        .cast("double").alias("p90_exact"),
    )
    sample = (
        o.filter(hash_bucket(F.col("o_orderkey"), salt="qcal") < _QCAL_PCT_BUCKETS)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4)
            .cast("double").alias("median_sample"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4)
            .cast("double").alias("p90_sample"),
        )
    )
    return exact.join(sample, "o_orderpriority").select(
        "o_orderpriority",
        "n_orders",
        "n_sampled",
        "median_exact",
        "median_sample",
        "p90_exact",
        "p90_sample",
        F.round(
            F.abs(F.col("median_sample") - F.col("median_exact"))
            / F.col("median_exact"),
            4,
        ).cast("double").alias("median_rel_err"),
        F.round(
            F.abs(F.col("p90_sample") - F.col("p90_exact")) / F.col("p90_exact"), 4
        ).cast("double").alias("p90_rel_err"),
    )


# ---------------------------------------------------------------------------
# Equi-width histogram: width_bucket over order values — the profiling /
# BI primitive complementing the equi-depth deciles (ranking.py). One
# map-side-combined shuffle on the bucket id; bucket boundaries are plan
# constants, so the whole binning stage is a narrow codegen'd projection.
# width_bucket semantics are spelled out arithmetically (underflow 0,
# overflow n+1) because DuckDB has no width_bucket builtin.
# ---------------------------------------------------------------------------

_HIST_LO, _HIST_HI, _HIST_NBUCKETS = 0.0, 600000.0, 20


@query(
    "value_histogram",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < {_HIST_LO} THEN 0
                WHEN o_totalprice >= {_HIST_HI} THEN {_HIST_NBUCKETS + 1}
                ELSE CAST(FLOOR((o_totalprice - {_HIST_LO}) / (({_HIST_HI} - {_HIST_LO}) / {_HIST_NBUCKETS})) AS INTEGER) + 1
           END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY bucket
    """,
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.expr(
                f"CASE WHEN o_totalprice < {_HIST_LO} THEN 0 "
                f"WHEN o_totalprice >= {_HIST_HI} THEN {_HIST_NBUCKETS + 1} "
                f"ELSE CAST(FLOOR((o_totalprice - {_HIST_LO}) / "
                f"(({_HIST_HI} - {_HIST_LO}) / {_HIST_NBUCKETS})) AS INT) + 1 END"
            ).alias("bucket"),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )


# ---------------------------------------------------------------------------
# Statistical moments per group: mean / population variance / skewness of
# order value, computed from EXACT decimal power sums (s1, s2, s3) — the
# single-pass mergeable-moments formulation (what var_pop/skewness
# builtins do internally, but engine builtins disagree in last-ulp
# accumulation order; exact decimal sums make both engines derive the
# final doubles from near-identical inputs). Variance is reported in
# millions^2: the 19-digit s2 decimal->double cast itself wobbles by an
# ulp (~4e-6 absolute at 2e10) between engines, which can flip a
# ROUND(,4) boundary on the raw value; scaling by 1e6 puts the wobble
# ~7 orders below the rounding granularity. One map-side-combined
# shuffle.
# ---------------------------------------------------------------------------


@query(
    "moment_stats",
    oracle="""
    WITH sums AS (
      SELECT o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s1,
             SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS s2,
             SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(28,4))
                 * CAST(o_totalprice AS DECIMAL(18,2))) AS s3
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, n,
           CAST(ROUND(CAST(s1 AS DOUBLE) / n, 4) AS DOUBLE) AS mean_value,
           -- + 0.0 on the sign-crossing outputs pins a rounded-to-zero
           -- value's sign (r12 signed-zero class): skewness crosses zero
           -- by nature, and var's m2 - m1^2 can be a tiny negative via
           -- double wobble on a constant group
           CAST(ROUND((CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) / 1000000.0, 4) + 0.0 AS DOUBLE) AS var_pop_m2,
           CAST(ROUND(
             (CAST(s3 AS DOUBLE) / n
              - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
              + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             / pow(CAST(s2 AS DOUBLE) / n - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 1.5),
             4) + 0.0 AS DOUBLE) AS skewness
    FROM sums
    """,
)
def moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    x = F.col("o_totalprice").cast("decimal(18,2)")
    sums = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum((x * x).cast("decimal(28,4)") * x).alias("s3"),
    )
    m1 = F.col("s1").cast("double") / F.col("n")
    m2 = F.col("s2").cast("double") / F.col("n")
    m3 = F.col("s3").cast("double") / F.col("n")
    var = m2 - m1 * m1
    return sums.select(
        "o_orderpriority",
        "n",
        F.round(m1, 4).cast("double").alias("mean_value"),
        # + 0.0 pins the rounded-to-zero sign in both engines (r12 class)
        (F.round(var / 1000000.0, 4) + F.lit(0.0))
        .cast("double")
        .alias("var_pop_m2"),
        (F.round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.pow(var, 1.5), 4) + F.lit(0.0))
        .cast("double")
        .alias("skewness"),
    )


# ---------------------------------------------------------------------------
# Statistical mode per group: the most frequent value (argmax-by-count,
# ties broken by value — distinct from top1_per_group's max-by-value).
# Two map-side-combined aggregations: (group, value) counts, then
# max_by over the counted table — no window, no sort.
# ---------------------------------------------------------------------------


@query(
    "mode_per_group",
    oracle="""
    WITH counted AS (
      SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderstatus, o_orderpriority
    )
    SELECT o_orderstatus, o_orderpriority AS mode_priority, n AS mode_n
    FROM (
      SELECT o_orderstatus, o_orderpriority, n,
             ROW_NUMBER() OVER (
               PARTITION BY o_orderstatus ORDER BY n DESC, o_orderpriority
             ) AS rn
      FROM counted
    ) t WHERE rn = 1
    """,
)
def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    counted = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # max_by with a composite ordering struct: highest n, then LOWEST
    # priority string on ties -> negate the tie-break via a descending
    # struct trick: order on (n, reversed priority) is not expressible
    # with max_by alone, so min_by over (-n, priority) keeps it one agg.
    return (
        counted.groupBy("o_orderstatus")
        .agg(
            F.min_by(
                F.struct(
                    F.col("o_orderpriority").alias("p"), F.col("n").alias("cnt")
                ),
                F.struct((-F.col("n")).alias("neg"), F.col("o_orderpriority").alias("p")),
            ).alias("m")
        )
        .select(
            "o_orderstatus",
            F.col("m.p").alias("mode_priority"),
            F.col("m.cnt").alias("mode_n"),
        )
    )


# ---------------------------------------------------------------------------
# Raw ANSI-SQL surface: the engine accepts SQL text directly (spark.sql
# over registered table views), which matters for reference parity — the
# reference's whole query surface IS hand-written SQL strings (README.md:
# 88-129, lib03/lib04 embedded queries). These two queries exercise the
# hardest SQL-only constructs Catalyst must decorrelate: a correlated
# NOT EXISTS (null-aware anti join — the rewrite the reference documents
# doing BY HAND in doc/04_Stage_Readme.txt:44-46, "NOT IN never
# completes, LEFT JOIN + IS NULL is instant"; Catalyst performs it
# automatically), a correlated EXISTS (left semi join), and scalar
# subqueries (broadcast one-row aggregates). The oracle is the SAME SQL
# text — both engines parse one statement, so this also pins our SQL
# dialect to ANSI. Money comparisons go through DECIMAL (sum * count
# cross-multiplication instead of AVG) so no float summation-order
# divergence can flip the threshold.
# ---------------------------------------------------------------------------

_Q22_SQL = """
SELECT c_custkey,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS acctbal
FROM customer c
WHERE c_acctbal > 0.0
  AND CAST(c_acctbal AS DECIMAL(18,2))
      * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0.0)
      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2)))
         FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""

_Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def _register_views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@query("rich_inactive_customers_sql", oracle=_Q22_SQL)
def rich_inactive_customers_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape, executed AS SQL TEXT: above-average-balance
    customers with no urgent orders (scalar subqueries + correlated
    NOT EXISTS with an extra predicate, so the result is non-trivial at
    every gated SF). The identical statement is the DuckDB oracle."""
    _register_views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q22_SQL)


@query("returned_orders_by_priority_sql", oracle=_Q4_SQL)
def returned_orders_by_priority_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape as SQL text: per-priority counts of orders with at
    least one returned line (correlated EXISTS -> left semi join)."""
    _register_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q4_SQL)


# ---------------------------------------------------------------------------
# JSON-string field extraction (B21's other half: map_pack_extract covers
# MapType packed columns; this covers JSON kept as raw TEXT — the events
# table's `props`). get_json_object evaluates JVM-side per row with no
# UDF and no full from_json schema materialization — the right call when
# only one path is needed; at 100 TB prefer from_json once into a struct
# column if MANY paths are probed (one parse instead of k).
# ---------------------------------------------------------------------------


@query(
    "json_props_extract",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(COUNT(*) FILTER (
             WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
           ) AS BIGINT) AS n_high
    FROM events
    GROUP BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a JSON-path field extracted from a raw-text props
    column — single conditional-agg shuffle, extraction inlined in the
    scan projection (no UDF, no schema materialization)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select("event_type", k.alias("__k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("__k").alias("sum_k"),
            F.count(F.when(F.col("__k") >= 50, 1)).alias("n_high"),
        )
    )
