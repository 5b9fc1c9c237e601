"""Driver contract for the spark-graft builder (PySpark target).

Every query routes through earthmover_spark's operator implementations
(the engine under test), paired with a DuckDB-runnable oracle in
``oracle_sql()``. Column names are aliased identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from earthmover_spark.operators import column as C
from earthmover_spark.operators import dataframe as D
from earthmover_spark.operators import groupby as G
from earthmover_spark.operators import row as R
from earthmover_spark.operators.row import ROW_ORDER


def _p(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) which Spark's vectorized parquet
        # reader rejects; read nanos as long and rebuild a (micro) timestamp.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter_rows + group_by (count/sum/mean) — TPC-H Q1 shape through
    the engine's operators."""
    li = _p(spark, sf_dir, "lineitem")
    f = R.filter_rows(li, query='l_shipdate <= "1998-09-02"')
    g = G.group_by(
        f,
        group_by_columns=["l_returnflag", "l_linestatus"],
        create_columns={
            "n": "count()",
            "sum_qty": "sum(l_quantity)",
            "sum_price": "sum(l_extendedprice)",
            "avg_disc": "mean(l_discount)",
        },
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        "n",
        F.round("sum_qty", 4).alias("sum_qty"),
        F.round("sum_price", 4).alias("sum_price"),
        F.round("avg_disc", 4).alias("avg_disc"),
    )


def q_src_parquet_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _p(spark, sf_dir, "events")
    return R.filter_rows(ev, query="value > 90").select(
        "event_id", "event_type", "value"
    )


def q_keep_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _p(spark, sf_dir, "lineitem")
    return C.keep_columns(li, columns=["l_*key", "l_linenumber"])


def q_drop_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _p(spark, sf_dir, "part")
    return C.drop_columns(part, columns=["p_retailprice", "p_s*", "not_a_column"])


def q_rename_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _p(spark, sf_dir, "nation")
    return C.rename_columns(
        nation, columns={"n_nationkey": "nation_key", "n_name": "nation_name"}
    )


def q_duplicate_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _p(spark, sf_dir, "region")
    return C.duplicate_columns(region, columns={"r_name": "region_name"})


def q_add_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _p(spark, sf_dir, "nation")
    return C.add_columns(
        nation, columns={"tag": "dim", "label": "{{n_name}}-{{n_regionkey}}"}
    )


def q_add_columns_jinja_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _p(spark, sf_dir, "lineitem")
    out = C.add_columns(li, columns={"qty_plus": "{{l_quantity|int + 1}}"})
    return out.select("l_orderkey", "l_linenumber", "qty_plus")


def q_modify_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _p(spark, sf_dir, "customer")
    out = C.modify_columns(
        cust, columns={"c_name": "{{value|upper}}", "c_mktsegment": "{{value|lower}}"}
    )
    return out.select("c_custkey", "c_name", "c_mktsegment")


def q_combine_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _p(spark, sf_dir, "part")
    out = C.combine_columns(
        part, columns=["p_brand", "p_type"], new_column="combo", separator=":"
    )
    return out.select("p_partkey", "combo")


def q_map_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = _p(spark, sf_dir, "region")
    return C.map_values(
        region,
        column="r_name",
        mapping={"AFRICA": "africa", "AMERICA": "america", "ASIA": "asia"},
    )


def q_date_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _p(spark, sf_dir, "orders").withColumn(
        "d", F.date_format("o_orderdate", "yyyy-MM-dd")
    )
    out = C.date_format(orders, column="d", from_format="%Y-%m-%d", to_format="%m/%d/%Y")
    return out.select("o_orderkey", "d")


def q_snake_case_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _p(spark, sf_dir, "nation").toDF("NationKey", "NationName", "RegionKey")
    return C.snake_case_columns(nation)


def q_uppercase_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.uppercase_columns(_p(spark, sf_dir, "region"))


def q_filter_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _p(spark, sf_dir, "lineitem")
    out = R.filter_rows(li, query='l_returnflag == "A" and l_quantity > 45')
    return out.select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")


def q_filter_rows_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _p(spark, sf_dir, "orders")
    out = R.filter_rows(
        orders,
        query='o_orderstatus == "O" or o_totalprice < 50000',
        behavior="exclude",
    )
    return out.select("o_orderkey", "o_orderstatus", "o_totalprice")


def q_filter_rows_contains(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _p(spark, sf_dir, "customer")
    out = R.filter_rows(cust, query='c_name.str.contains("42")')
    return out.select("c_custkey", "c_name")


def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _p(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus")
    return R.distinct_rows(li)


def q_sort_limit_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _p(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    s = R.sort_rows(cust, columns=["-c_acctbal", "+c_custkey"])
    return R.limit_rows(s, count=20, offset=10)


def q_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _p(spark, sf_dir, "lineitem")
    agg = G.group_by(
        li.withColumn(ROW_ORDER, F.col("l_linenumber")),
        group_by_columns=["l_orderkey"],
        create_columns={"lines": "agg(l_linenumber,,)"},
    )
    return R.flatten(agg, flatten_column="lines", value_column="lineno")


def q_flatten_wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _p(spark, sf_dir, "lineitem")
    agg = G.group_by(
        li.withColumn(ROW_ORDER, F.col("l_linenumber")),
        group_by_columns=["l_orderkey"],
        create_columns={"lines": "agg(l_linenumber,|)"},
    )
    wrapped = agg.withColumn("lines", F.concat(F.lit("["), "lines", F.lit("]")))
    return R.flatten(
        wrapped, flatten_column="lines", value_column="lineno", separator="|"
    )


def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _p(spark, sf_dir, "customer")
    nation = _p(spark, sf_dir, "nation")
    region = _p(spark, sf_dir, "region")
    j1 = D.join(
        cust,
        sources=[nation],
        join_type="inner",
        left_key="c_nationkey",
        right_key="n_nationkey",
        broadcast_right=True,
    )
    j2 = D.join(
        j1,
        sources=[region],
        join_type="inner",
        left_key="n_regionkey",
        right_key="r_regionkey",
        broadcast_right=True,
    )
    return j2.select("c_custkey", "c_name", "n_name", "r_name")


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _p(spark, sf_dir, "orders")
    cust = _p(spark, sf_dir, "customer")
    j = D.join(
        orders,
        sources=[cust],
        join_type="left",
        left_key="o_custkey",
        right_key="c_custkey",
        right_keep_columns=["c_name"],
        broadcast_right=True,
    )
    return j.select("o_orderkey", "o_custkey", "c_custkey", "c_name")


def q_join_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _p(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", F.col("l_extendedprice").alias("price"))
    )
    orders = _p(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_totalprice").alias("price")
    )
    j = D.join(
        li,
        sources=[orders],
        join_type="inner",
        left_key="l_orderkey",
        right_key="o_orderkey",
        broadcast_right=True,
    )
    return j.select("l_orderkey", "l_linenumber", "price_x", "o_orderkey", "price_y")


def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _p(spark, sf_dir, "nation")
    region = R.filter_rows(_p(spark, sf_dir, "region"), query="r_regionkey <= 2")
    j = D.join(
        nation,
        sources=[region],
        join_type="outer",
        left_key="n_regionkey",
        right_key="r_regionkey",
    )
    return j.select("n_nationkey", "n_name", "n_regionkey", "r_regionkey", "r_name")


def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _p(spark, sf_dir, "customer")
    auto = R.filter_rows(cust, query='c_mktsegment == "AUTOMOBILE"').select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    mach = R.filter_rows(cust, query='c_mktsegment == "MACHINERY"').select(
        "c_custkey", "c_name"
    )
    return D.union(auto, sources=[mach], fill_missing_columns=True)


def q_group_by_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _p(spark, sf_dir, "lineitem")
    g = G.group_by(
        li,
        group_by_columns=["l_suppkey"],
        create_columns={
            "n": "count()",
            "sum_qty": "sum(l_quantity)",
            "min_price": "min(l_extendedprice)",
            "max_price": "max(l_extendedprice)",
            "avg_disc": "mean(l_discount)",
            "sd_qty": "std(l_quantity)",
            "var_qty": "var(l_quantity)",
        },
    )
    return g.select(
        "l_suppkey",
        "n",
        F.round("sum_qty", 4).alias("sum_qty"),
        "min_price",
        "max_price",
        F.round("avg_disc", 6).alias("avg_disc"),
        F.round("sd_qty", 6).alias("sd_qty"),
        F.round("var_qty", 6).alias("var_qty"),
    )


def q_group_by_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _p(spark, sf_dir, "orders")
    return G.group_by(
        orders,
        group_by_columns=["o_orderstatus"],
        create_columns={
            "n": "count()",
            "pmin": "str_min(o_orderpriority)",
            "pmax": "str_max(o_orderpriority)",
        },
    )


def q_group_by_agg_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _p(spark, sf_dir, "lineitem").withColumn(ROW_ORDER, F.col("l_linenumber"))
    return G.group_by(
        li,
        group_by_columns=["l_orderkey"],
        create_columns={"lines": "agg(l_linenumber,-)"},
    )


def q_json_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _p(spark, sf_dir, "lineitem").withColumn(ROW_ORDER, F.col("l_linenumber"))
    return G.group_by(
        li,
        group_by_columns=["l_orderkey"],
        create_columns={
            "raw": "json_array_agg(l_linenumber)",
            "quoted": "json_array_agg(l_linenumber,str)",
        },
    )


def q_group_by_with_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _p(spark, sf_dir, "lineitem").withColumn(ROW_ORDER, F.col("l_linenumber"))
    ranked = G.group_by_with_rank(
        li, group_by_columns=["l_orderkey"], rank_column="rank"
    )
    return ranked.select("l_orderkey", "l_linenumber", "rank")


def q_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _p(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type", "p_size")
    return D.melt(part, id_vars=["p_partkey"])


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _p(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type", "p_size")
    long = D.melt(part, id_vars=["p_partkey"])
    return D.pivot(
        long, rows_by="p_partkey", cols_by="melt_variable", values="melt_value"
    )


def q_jinja_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _p(spark, sf_dir, "lineitem")
    out = C.add_columns(
        li,
        columns={
            "bucket": "{% if l_quantity > 25 %}big{% else %}small{% endif %}"
        },
    )
    return out.select("l_orderkey", "l_linenumber", "bucket")


def q_jinja_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _p(spark, sf_dir, "customer")
    out = C.add_columns(cust, columns={"name_hash": "{{md5(c_name)}}"})
    return out.select("c_custkey", "name_hash")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "flagship": q_flagship,
        "src_parquet_scan": q_src_parquet_scan,
        "keep_columns": q_keep_columns,
        "drop_columns": q_drop_columns,
        "rename_columns": q_rename_columns,
        "duplicate_columns": q_duplicate_columns,
        "add_columns": q_add_columns,
        "add_columns_jinja_arith": q_add_columns_jinja_arith,
        "modify_columns": q_modify_columns,
        "combine_columns": q_combine_columns,
        "map_values": q_map_values,
        "date_format": q_date_format,
        "snake_case_columns": q_snake_case_columns,
        "uppercase_columns": q_uppercase_columns,
        "filter_rows": q_filter_rows,
        "filter_rows_exclude": q_filter_rows_exclude,
        "filter_rows_contains": q_filter_rows_contains,
        "distinct_rows": q_distinct_rows,
        "sort_limit_rows": q_sort_limit_rows,
        "flatten": q_flatten,
        "flatten_wrapped": q_flatten_wrapped,
        "join_inner": q_join_inner,
        "join_left": q_join_left,
        "join_suffix": q_join_suffix,
        "join_outer": q_join_outer,
        "union": q_union,
        "group_by_stats": q_group_by_stats,
        "group_by_str": q_group_by_str,
        "group_by_agg_concat": q_group_by_agg_concat,
        "json_array_agg": q_json_array_agg,
        "group_by_with_rank": q_group_by_with_rank,
        "melt": q_melt,
        "pivot": q_pivot,
        "jinja_conditional": q_jinja_conditional,
        "jinja_md5": q_jinja_md5,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "flagship": """
            SELECT l_returnflag, l_linestatus,
                   count(*) AS n,
                   round(sum(l_quantity), 4) AS sum_qty,
                   round(sum(l_extendedprice), 4) AS sum_price,
                   round(sum(l_discount) / count(*), 4) AS avg_disc
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "src_parquet_scan": """
            SELECT event_id, event_type, value FROM events WHERE value > 90
        """,
        "keep_columns": """
            SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber FROM lineitem
        """,
        "drop_columns": """
            SELECT p_partkey, p_name, p_brand, p_type FROM part
        """,
        "rename_columns": """
            SELECT n_nationkey AS nation_key, n_name AS nation_name, n_regionkey
            FROM nation
        """,
        "duplicate_columns": """
            SELECT r_regionkey, r_name, r_name AS region_name FROM region
        """,
        "add_columns": """
            SELECT n_nationkey, n_name, n_regionkey, 'dim' AS tag,
                   n_name || '-' || CAST(n_regionkey AS VARCHAR) AS label
            FROM nation
        """,
        "add_columns_jinja_arith": """
            SELECT l_orderkey, l_linenumber,
                   CAST(CAST(trunc(l_quantity) AS BIGINT) + 1 AS VARCHAR) AS qty_plus
            FROM lineitem
        """,
        "modify_columns": """
            SELECT c_custkey, upper(c_name) AS c_name,
                   lower(c_mktsegment) AS c_mktsegment
            FROM customer
        """,
        "combine_columns": """
            SELECT p_partkey, p_brand || ':' || p_type AS combo FROM part
        """,
        "map_values": """
            SELECT r_regionkey,
                   CASE r_name WHEN 'AFRICA' THEN 'africa'
                               WHEN 'AMERICA' THEN 'america'
                               WHEN 'ASIA' THEN 'asia'
                               ELSE r_name END AS r_name
            FROM region
        """,
        "date_format": """
            SELECT o_orderkey, strftime(o_orderdate, '%m/%d/%Y') AS d FROM orders
        """,
        "snake_case_columns": """
            SELECT n_nationkey AS nation_key, n_name AS nation_name,
                   n_regionkey AS region_key
            FROM nation
        """,
        "uppercase_columns": """
            SELECT r_regionkey AS R_REGIONKEY, r_name AS R_NAME FROM region
        """,
        "filter_rows": """
            SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
            FROM lineitem WHERE l_returnflag = 'A' AND l_quantity > 45
        """,
        "filter_rows_exclude": """
            SELECT o_orderkey, o_orderstatus, o_totalprice
            FROM orders
            WHERE NOT (o_orderstatus = 'O' OR o_totalprice < 50000)
        """,
        "filter_rows_contains": """
            SELECT c_custkey, c_name FROM customer WHERE regexp_matches(c_name, '42')
        """,
        "distinct_rows": """
            SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        """,
        "sort_limit_rows": """
            SELECT c_custkey, c_name, c_acctbal FROM customer
            ORDER BY c_acctbal DESC, c_custkey ASC
            LIMIT 20 OFFSET 10
        """,
        "flatten": """
            SELECT l_orderkey, CAST(l_linenumber AS VARCHAR) AS lineno FROM lineitem
        """,
        "flatten_wrapped": """
            SELECT l_orderkey, CAST(l_linenumber AS VARCHAR) AS lineno FROM lineitem
        """,
        "join_inner": """
            SELECT c_custkey, c_name, n_name, r_name
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
        """,
        "join_left": """
            SELECT o_orderkey, o_custkey, c_custkey, c_name
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        """,
        "join_suffix": """
            SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice AS price_x,
                   o.o_orderkey, o.o_totalprice AS price_y
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        """,
        "join_outer": """
            SELECT n_nationkey, n_name, n_regionkey, r_regionkey, r_name
            FROM nation FULL OUTER JOIN
                 (SELECT * FROM region WHERE r_regionkey <= 2) r
                 ON n_regionkey = r_regionkey
        """,
        "union": """
            SELECT c_custkey, c_name, c_mktsegment FROM customer
            WHERE c_mktsegment = 'AUTOMOBILE'
            UNION ALL
            SELECT c_custkey, c_name, NULL AS c_mktsegment FROM customer
            WHERE c_mktsegment = 'MACHINERY'
        """,
        "group_by_stats": """
            SELECT l_suppkey,
                   count(*) AS n,
                   round(sum(l_quantity), 4) AS sum_qty,
                   min(l_extendedprice) AS min_price,
                   max(l_extendedprice) AS max_price,
                   round(sum(l_discount) / count(*), 6) AS avg_disc,
                   round(stddev_samp(l_quantity), 6) AS sd_qty,
                   round(var_samp(l_quantity), 6) AS var_qty
            FROM lineitem GROUP BY l_suppkey
        """,
        "group_by_str": """
            SELECT o_orderstatus, count(*) AS n,
                   min(o_orderpriority) AS pmin, max(o_orderpriority) AS pmax
            FROM orders GROUP BY o_orderstatus
        """,
        "group_by_agg_concat": """
            SELECT l_orderkey,
                   string_agg(CAST(l_linenumber AS VARCHAR), '-'
                              ORDER BY l_linenumber) AS lines
            FROM lineitem GROUP BY l_orderkey
        """,
        "json_array_agg": """
            SELECT l_orderkey,
                   '[' || string_agg(CAST(l_linenumber AS VARCHAR), ','
                                     ORDER BY l_linenumber) || ']' AS raw,
                   '[' || string_agg('"' || CAST(l_linenumber AS VARCHAR) || '"', ','
                                     ORDER BY l_linenumber) || ']' AS quoted
            FROM lineitem GROUP BY l_orderkey
        """,
        "group_by_with_rank": """
            SELECT l_orderkey, l_linenumber,
                   row_number() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_linenumber) - 1 AS rank
            FROM lineitem
        """,
        "melt": """
            SELECT p_partkey, 'p_brand' AS melt_variable, p_brand AS melt_value FROM part
            UNION ALL
            SELECT p_partkey, 'p_type', p_type FROM part
            UNION ALL
            SELECT p_partkey, 'p_size', CAST(p_size AS VARCHAR) FROM part
        """,
        "pivot": """
            SELECT p_partkey, p_brand, p_type, CAST(p_size AS VARCHAR) AS p_size
            FROM part
        """,
        "jinja_conditional": """
            SELECT l_orderkey, l_linenumber,
                   CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS bucket
            FROM lineitem
        """,
        "jinja_md5": """
            SELECT c_custkey, md5(c_name) AS name_hash FROM customer
        """,
    }
