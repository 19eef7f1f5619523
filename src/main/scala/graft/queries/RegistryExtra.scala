package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.streaming.StreamingOps

/** Round-6 operator families completing the relational SQL surface
  * beyond SURVEY §2's literal inventory: outer/semi join shapes,
  * GROUPING SETS, UNPIVOT, ordered string aggregation, higher-order
  * array functions, JSON extraction, SCD2 dimension builds,
  * calendar gap-fill, and two further Structured-Streaming shapes
  * (stream-static enrichment join, sliding windows).
  *
  * Same float/timestamp discipline as [[RegistryCore]]: exact decimal
  * sums with one final double cast, epoch seconds instead of raw
  * event timestamps, every query totally ordered with the oracle
  * mirroring column names exactly.
  */
object RegistryExtra {
  private type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)
  private def decSum(c: Column): Column = sum(c.cast("decimal(18,6)")).cast("double")

  val defs: Map[String, Q] = Map(
    // LEFT OUTER join with the filter in the join CONDITION (not a
    // pre-filter of the probe side): unmatched customers survive with
    // null order columns — count(o_orderkey) vs count(*) witnesses
    // the outer semantics.
    "j8_left_outer_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey") &&
          o("o_orderstatus") === "O", "left")
        .groupBy("c_mktsegment")
        .agg(count(col("o_orderkey")).as("n_open_orders"),
          count(lit(1)).as("n_rows"))
        .orderBy("c_mktsegment")
    }),

    // LEFT SEMI join — existence probe that never duplicates the left
    // side (a customer with 5 urgent orders appears once).
    "j9_semi_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // FULL OUTER join of two asymmetric aggregates (12 vs 9 nations
    // at sf0.01): both sides contribute unmatched rows, keys
    // coalesced, counts zero-filled.
    "j10_full_outer_join" -> ((s, dir) => {
      val sup = t(s, dir, "supplier").where(col("s_acctbal") > 8000)
        .groupBy("s_nationkey").agg(count(lit(1)).as("__ns"))
      val cus = t(s, dir, "customer").where(col("c_acctbal") < -900)
        .groupBy("c_nationkey").agg(count(lit(1)).as("__nc"))
      sup.join(cus, col("s_nationkey") === col("c_nationkey"), "full")
        .select(
          coalesce(col("s_nationkey"), col("c_nationkey")).as("nationkey"),
          coalesce(col("__ns"), lit(0L)).as("n_rich_suppliers"),
          coalesce(col("__nc"), lit(0L)).as("n_debtor_customers"))
        .orderBy("nationkey")
    }),

    // CORRELATED scalar subquery (j4 is the uncorrelated one):
    // per-customer max order price inline in the projection — Catalyst
    // decorrelates to an aggregate + left outer join, never a
    // per-row re-execution.
    "j12_correlated_scalar" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""SELECT c_custkey, c_mktsegment,
                      (SELECT max(o_totalprice) FROM orders
                       WHERE o_custkey = c_custkey) AS max_order_price
               FROM customer
               WHERE c_custkey <= 300
               ORDER BY c_custkey""")
    }),

    // Correlated EXISTS subquery through the SQL entry point —
    // Catalyst decorrelates to a semi-join; DuckDB runs the identical
    // text.
    "j11_exists_subquery" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""SELECT p_partkey, p_name FROM part
               WHERE EXISTS (SELECT 1 FROM lineitem
                             WHERE l_partkey = p_partkey AND l_quantity >= 49)
               ORDER BY p_partkey""")
    }),

    // GROUPING SETS with a grouping-id disambiguator: detail,
    // per-region subtotal, and grand total in one pass (Spark expands
    // to a single shuffle with an internal grouping-id column —
    // map-side combinable, unlike a UNION of three aggregates which
    // would scan three times).
    "a11_grouping_sets" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""SELECT coalesce(r_name, 'ALL') AS region_name,
                      coalesce(n_name, 'ALL') AS nation_name,
                      cast(grouping(r_name) * 2 + grouping(n_name) AS INTEGER) AS gid,
                      count(*) AS n_customers,
                      cast(sum(cast(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
               FROM customer
               JOIN nation ON c_nationkey = n_nationkey
               JOIN region ON n_regionkey = r_regionkey
               GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
               ORDER BY gid, region_name, nation_name""")
    }),

    // UNPIVOT (wide -> long): the inverse of a10_pivot, via the typed
    // Dataset.unpivot API — a metadata-only projection expansion, no
    // shuffle beyond the feeding aggregate.
    "a12_unpivot" -> ((s, dir) => {
      val wide = t(s, dir, "orders").groupBy("o_orderpriority").agg(
        count(when(col("o_orderstatus") === "F", 1)).as("n_f"),
        count(when(col("o_orderstatus") === "O", 1)).as("n_o"),
        count(when(col("o_orderstatus") === "P", 1)).as("n_p"))
      wide.unpivot(Array(col("o_orderpriority")),
          Array(col("n_f"), col("n_o"), col("n_p")), "status_metric", "n")
        .orderBy("o_orderpriority", "status_metric")
    }),

    // Ordered string aggregation (LISTAGG): collect_list is
    // order-nondeterministic under parallel merge, so the sort happens
    // INSIDE the aggregate value (array_sort before join) — the only
    // engine-portable formulation.
    "a13_string_agg" -> ((s, dir) =>
      t(s, dir, "supplier")
        .groupBy("s_nationkey")
        .agg(array_join(array_sort(collect_list(col("s_name"))), ",")
            .as("suppliers"),
          count(lit(1)).as("n_suppliers"))
        .orderBy("s_nationkey")),

    // Higher-order array functions over tokenized text: filter,
    // aggregate (fold), transform+slice, exists — all codegen-friendly
    // lambda expressions, no UDFs.
    "f9_higher_order_fns" -> ((s, dir) => {
      val toks = graft.functions.TextFns.tokens(col("text"))
      t(s, dir, "documents").select(
        col("doc_id"),
        size(filter(toks, x => length(x) > 5)).as("n_long"),
        aggregate(toks, lit(0L), (acc, x) => acc + length(x).cast("long"))
          .as("chars_sum"),
        array_join(transform(slice(toks, 1, 3), x => upper(x)), " ")
          .as("head_upper"),
        exists(toks, x => x === "the").as("has_the"))
        .orderBy("doc_id")
    }),

    // JSON extraction from a string payload column (events.props):
    // path extraction + cast + aggregate. At scale the parse is a
    // per-row projection (no shuffle added to the aggregate's).
    "f10_json_extract" -> ((s, dir) =>
      t(s, dir, "events")
        .withColumn("__k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(sum(col("__k")).as("k_sum"),
          count(col("__k")).as("n_k"),
          min(col("__k")).as("k_min"),
          max(col("__k")).as("k_max"))
        .orderBy("event_type")),

    // SCD2 dimension build: per-user event_type change history with
    // [valid_from, valid_to) epochs and a current flag. Consecutive
    // duplicate attribute values are collapsed first (lag), then
    // validity chains via lead — two window passes over ONE user-key
    // shuffle (same partitioning, Catalyst reuses the exchange).
    // Validity epochs are MICROseconds: events carry exact-micro
    // timestamps, so micros keep the output ordering total and the
    // ranges non-empty — second truncation produced tied sort keys
    // (a real same-second change pair exists at sf0.1) and the tie
    // order would differ between engines.
    "w8_scd2_dimension" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val changes = t(s, dir, "events")
        .withColumn("__prev", lag(col("event_type"), 1).over(byUser))
        .where(col("__prev").isNull || col("__prev") =!= col("event_type"))
      val chained = changes
        .withColumn("__next_ts", lead(col("ts"), 1).over(byUser))
      chained.select(
          col("user_id"),
          col("event_type").as("attr_value"),
          unix_micros(col("ts")).as("valid_from_us"),
          coalesce(unix_micros(col("__next_ts")), lit(253402300800000000L))
            .as("valid_to_us"),
          col("__next_ts").isNull.as("is_current"))
        .orderBy("user_id", "valid_from_us")
    }),

    // Calendar gap-fill: dense (event_type × day) grid from
    // sequence+explode, left join of sparse daily counts, zeros
    // filled — 127 of 150 grid rows are genuine gaps at sf0.01. The
    // grid is generated, never scanned; the counts aggregate is the
    // only shuffle over data.
    "o3_gap_fill_calendar" -> ((s, dir) => {
      // ONE scan of events: the per-(type, day) aggregate carries both
      // the sparse conditional counts AND the material for the
      // calendar bounds + type list (the grid itself is generated,
      // never scanned). The tiny daily frame is cached for its three
      // readers.
      val daily = t(s, dir, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(when(col("value") > 300, 1)).as("__n"))
        .cache()
      val cal = daily.agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
        .select(explode(sequence(col("__d0"), col("__d1"),
          expr("interval 1 day"))).as("day"))
      val types = daily.select("event_type").distinct()
      cal.crossJoin(types)
        .join(daily, Seq("event_type", "day"), "left")
        .select(col("event_type"), col("day"),
          coalesce(col("__n"), lit(0L)).as("n_events"))
        .orderBy("event_type", "day")
    }),

    // Deterministic statistical MODE per group via the struct-max
    // aggregate trick (max count, min value on ties): two map-side-
    // combinable aggregates, no window sort — the built-in mode() is
    // tie-nondeterministic and a per-group sort would not scale to a
    // heavy group.
    "a14_mode" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_quantity"))
        .agg(count(lit(1)).as("__cnt"))
        .groupBy("l_returnflag")
        .agg(max(struct(col("__cnt"), (-col("l_quantity")).as("__negq")))
          .as("__m"))
        .select(col("l_returnflag"),
          (-col("__m.__negq")).as("mode_quantity"),
          col("__m.__cnt").as("mode_count"))
        .orderBy("l_returnflag")),

    // Frame-explicit value window functions: first/last/nth over the
    // full-partition ROWS frame (the default RANGE..CURRENT ROW frame
    // makes last_value a no-op — the explicit frame is the portable,
    // meaningful formulation).
    "w9_value_windows" -> ((s, dir) => {
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").asc, col("c_custkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "customer").select(
        col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        first(col("c_custkey")).over(w).as("poorest_custkey"),
        last(col("c_custkey")).over(w).as("richest_custkey"),
        nth_value(col("c_custkey"), 2).over(w).as("second_custkey"))
        .orderBy("c_custkey")
    }),

    // Calendar arithmetic family: offsets, month boundaries, ISO
    // weekday, quarters, day spans — all per-row projections
    // (shuffle-free except the output sort).
    "f11_date_arithmetic" -> ((s, dir) =>
      t(s, dir, "orders")
        .withColumn("__od", to_date(col("o_orderdate")))
        .select(col("o_orderkey"), col("__od").as("order_date"),
          date_add(col("__od"), 30).as("due_date"),
          last_day(col("__od")).as("month_end"),
          (weekday(col("__od")) + 1).as("iso_dow"),
          quarter(col("__od")).as("qtr"),
          datediff(col("__od"), to_date(lit("1992-01-01")))
            .as("days_since_92"))
        .orderBy("o_orderkey")),

    // ANSI-safe error-handling family (try_divide / try_multiply /
    // try_to_timestamp): under the driver's ANSI-on session these
    // return NULL instead of raising on division-by-zero, bigint
    // overflow, and out-of-range dates — the per-row error-quarantine
    // idiom a 100 TB batch needs (one poisoned row must not kill a
    // stage). Each expression mixes NULL and non-NULL rows
    // deterministically: quantity 25 divides by zero, orderkeys
    // > 1000 overflow Long.MaxValue/1000, linenumber*8 > 31 is an
    // invalid day-of-month.
    "f16_try_arithmetic" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .where(col("l_orderkey") % 50 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          try_divide(col("l_extendedprice"), col("l_quantity") - 25)
            .as("safe_div"),
          try_multiply(col("l_orderkey"), lit(9223372036854775L))
            .as("safe_mul"),
          try_to_timestamp(concat(lit("2024-01-"),
            lpad((col("l_linenumber") * 8).cast("string"), 2, "0")))
            .as("safe_ts"))
        .orderBy("l_orderkey", "l_linenumber")),

    // DataFrameNaFunctions — the API-level null-cleaning verbs
    // (na.replace → na.fill → na.drop) over deterministically planted
    // nulls; all three are pure projections/filters (codegen'd CASE/
    // coalesce under the hood), so the whole cleanup is narrow. The
    // complete-rows count (na.drop) rides along as a broadcast scalar.
    "f17_na_functions" -> ((s, dir) => {
      val c = t(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_custkey") % 11 === 0, lit(null).cast("string"))
            .otherwise(col("c_mktsegment")).as("seg"),
          when(col("c_custkey") % 7 === 0, lit(null).cast("double"))
            .otherwise(col("c_acctbal")).as("bal"))
      val cleaned = c.na.replace("seg", Map("MACHINERY" -> "MACHINES"))
        .na.fill(Map("seg" -> "UNKNOWN", "bal" -> 0.0))
      val complete = c.na.drop("any", Seq("seg", "bal"))
        .agg(count(lit(1)).as("n_complete"))
      cleaned.groupBy("seg")
        .agg(count(lit(1)).as("n"),
          sum(col("bal").cast("decimal(18,6)")).cast("double").as("sum_bal"))
        .crossJoin(broadcast(complete))
        .orderBy("seg")
    }),

    // VARIANT (Spark 4 semi-structured type): a nested JSON document
    // built per row, parsed once with parse_json, then path-extracted
    // with variant_get at typed leaves — the open-schema ingestion
    // shape (one binary-encoded variant column instead of N sparse
    // string columns; extraction is codegen'd, no per-path re-parse
    // of the text). JSON numbers parse to exact decimals, so the
    // value sum stays hash-portable; a JSON null inside the array
    // (to_json keeps array nulls; planted on event_id % 13 — the
    // feed itself is null-free) pins is_variant_null as distinct
    // from a missing path (SQL NULL, not variant null).
    "f18_variant_extract" -> ((s, dir) => {
      val nulledVal = when(col("event_id") % 13 === 0, lit(null).cast("double"))
        .otherwise(col("value"))
      val js = to_json(struct(
        struct(col("user_id").as("uid"), col("event_type").as("etype"))
          .as("meta"),
        array(nulledVal).as("vals"),
        get_json_object(col("props"), "$.k").cast("long").as("k")))
      t(s, dir, "events")
        .select(parse_json(js).as("v"))
        .select(
          expr("variant_get(v, '$.meta.etype', 'string')").as("etype"),
          expr("variant_get(v, '$.meta.uid', 'long')").as("uid"),
          expr("variant_get(v, '$.vals[0]', 'decimal(12,2)')").as("val0"),
          expr("variant_get(v, '$.k', 'long')").as("k"),
          expr("is_variant_null(variant_get(v, '$.vals[0]'))").as("vnull"))
        .groupBy("etype")
        .agg(count(lit(1)).as("n"),
          sum(col("uid")).as("uid_sum"),
          sum(col("k")).as("k_sum"),
          sum(col("val0")).cast("double").as("val_sum"),
          count(when(col("vnull"), 1)).as("n_null_vals"))
        .orderBy("etype")
    }),

    // String collation (Spark 4): UTF8_LCASE makes comparison,
    // grouping, and `contains` case-insensitive WITHOUT materializing
    // a lowercased copy — the collation rides the type, so the
    // group-by shuffle hashes the collation key directly. Exercised
    // over genuinely case-varied Vietnamese text (ĐÀ NẴNG vs Đà
    // Nẵng): the collated `contains 'nẵng'` matches the uppercase
    // variant a binary contains would miss, and case variants of one
    // city+source land in one group (n_case_variants > 1 pins it).
    // The output key is lowered + re-collated to UTF8_BINARY so the
    // result schema (and the oracle's) is a plain string.
    "f19_collated_group" -> ((s, dir) => {
      val city = when(col("doc_id") % 2 === 0,
          when(col("doc_id") % 4 === 0, lit("Hà Nội")).otherwise(lit("HÀ NỘI")))
        .otherwise(
          when(col("doc_id") % 4 === 1, lit("Đà Nẵng")).otherwise(lit("ĐÀ NẴNG")))
      val src = when(col("doc_id") % 3 === 0, upper(col("source")))
        .when(col("doc_id") % 3 === 1, initcap(col("source")))
        .otherwise(col("source"))
      Tables.load(s, dir, "documents")
        .select(col("doc_id"), concat(src, lit(" "), city).as("k"))
        .where(expr("contains(collate(k, 'UTF8_LCASE'), 'nẵng')"))
        .groupBy(expr("collate(k, 'UTF8_LCASE')").as("__ck"))
        .agg(count(lit(1)).as("n"),
          min(col("doc_id")).as("first_doc"),
          countDistinct(col("k")).as("n_case_variants"))
        .select(
          expr("collate(lower(__ck), 'UTF8_BINARY')").as("key_lc"),
          col("n"), col("first_doc"), col("n_case_variants"))
        .orderBy("key_lc")
    }),

    // Linear-regression aggregate family (regr_slope / intercept /
    // r2) per ship month. Spark's native regr_* merge double moments
    // in partition order (run-nondeterministic low bits, never
    // hash-comparable — same reason a17 avoids builtin stddev/corr),
    // so the witness computes the EXACT decimal power sums in the
    // aggregate and applies each closed-form once, driver-free and
    // bit-reproducible: one shuffle on the month key, map-side
    // partial sums, O(groups) output — the shape the builtins plan
    // too, minus the nondeterminism.
    "a20_regr_stats" -> ((s, dir) => {
      def dq(c: Column) = c.cast("decimal(12,2)")
      def dp(c: Column) = c.cast("decimal(18,2)")
      val n = col("n"); val sx = col("__sx").cast("double")
      val sy = col("__sy").cast("double"); val sxx = col("__sxx").cast("double")
      val syy = col("__syy").cast("double"); val sxy = col("__sxy").cast("double")
      val covn = n * sxy - sx * sy
      val varx = n * sxx - sx * sx
      val vary = n * syy - sy * sy
      val slope = covn / varx
      t(s, dir, "lineitem")
        .groupBy(date_trunc("month", col("l_shipdate")).cast("date")
          .as("ship_month"))
        .agg(count(lit(1)).as("n"),
          sum(dq(col("l_quantity"))).as("__sx"),
          sum(dq(col("l_quantity")) * dq(col("l_quantity"))).as("__sxx"),
          sum(dp(col("l_extendedprice"))).as("__sy"),
          sum(dp(col("l_extendedprice")) * dp(col("l_extendedprice")))
            .as("__syy"),
          sum(dq(col("l_quantity")) * dp(col("l_extendedprice"))).as("__sxy"))
        .select(col("ship_month"), n,
          slope.as("slope"),
          ((sy - slope * sx) / n).as("intercept"),
          (covn * covn / (varx * vary)).as("r2"))
        .orderBy("ship_month")
    }),

    // SQL pipe syntax + session variables (Spark 4): the same
    // filter→aggregate→extend→order chain as a classic GROUP BY
    // query, written as a |> pipeline with the threshold bound via
    // DECLARE VARIABLE — the interactive-SQL surface a warehouse
    // user drives the engine through. Compiles to the identical
    // logical plan (one shuffle on the two grouping keys), so the
    // syntax costs nothing at scale; the oracle is the classic
    // formulation with the variable inlined.
    "s22_pipe_sql" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("DECLARE OR REPLACE VARIABLE graft_min_qty DOUBLE DEFAULT 25.0")
      s.sql("""FROM lineitem
           |> WHERE l_quantity >= graft_min_qty
           |> AGGREGATE count(*) AS n,
                        sum(cast(l_extendedprice AS DECIMAL(18,2))) AS __rev
                GROUP BY l_returnflag, l_linestatus
           |> EXTEND cast(__rev AS DOUBLE) / n AS avg_rev
           |> SELECT l_returnflag, l_linestatus, n,
                     cast(__rev AS DOUBLE) AS revenue, avg_rev
           |> ORDER BY l_returnflag, l_linestatus""")
    }),

    // CUBE: all four grouping combinations (detail, each single-dim
    // subtotal, grand total) in ONE Expand pass over one shuffle —
    // same single-scan argument as a11_grouping_sets; gid
    // disambiguates subtotal rows from (hypothetical) real NULL keys.
    "a15_cube" -> ((s, dir) =>
      t(s, dir, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          decSum(col("o_totalprice")).as("total_price"),
          (grouping(col("o_orderstatus")) * 2 +
            grouping(col("o_orderpriority"))).cast("int").as("gid"))
        .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("gid"), col("n_orders"), col("total_price"))
        .orderBy("gid", "status", "priority")),

    // Explode with position (posexplode / UNNEST WITH ORDINALITY):
    // token stream with 1-based offsets — the row-generating operator
    // (one input row → many output rows). Generation is pipelined
    // inside the scan stage (no shuffle before the output sort); the
    // length predicate lands on the generated rows.
    "f12_explode_tokens" -> ((s, dir) => {
      val toks = graft.functions.TextFns.tokens(col("text"))
      t(s, dir, "documents")
        .select(col("doc_id"), posexplode(toks).as(Seq("__p", "token")))
        .where(length(col("token")) > 7)
        .select(col("doc_id"), (col("__p") + 1).as("pos"), col("token"))
        .orderBy("doc_id", "pos")
    }),

    // Exact interpolated percentiles (PERCENTILE_CONT): single-pass
    // aggregate whose partial state is a value→count map — bounded by
    // the 50 distinct quantities here, so it map-side combines; for
    // unbounded continuous domains the 100 TB path is
    // approx_percentile (sketch, engine-specific → rows-only domain).
    // Fractions are binary-exact (.25/.5/.75) so type-7 interpolation
    // is bit-identical across engines.
    "a16_percentile_cont" -> ((s, dir) =>
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(percentile(col("l_quantity"), lit(0.25)).as("p25"),
          percentile(col("l_quantity"), lit(0.5)).as("p50"),
          percentile(col("l_quantity"), lit(0.75)).as("p75"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")),

    // Multiset set operations (INTERSECT ALL / EXCEPT ALL — u3 covers
    // the DISTINCT forms): duplicate-preserving semantics matter when
    // rows are occurrences, not facts. Spark plans both as a single
    // aggregate of per-side counts (min/difference of multiplicities),
    // not a join explosion.
    "u4_set_ops_all" -> ((s, dir) => {
      val orders = t(s, dir, "orders")
      val a = orders.where(col("o_totalprice") < 150000)
        .select("o_orderstatus", "o_orderpriority")
      val b = orders.where(to_date(col("o_orderdate")) >= lit("1995-01-01"))
        .select("o_orderstatus", "o_orderpriority")
      def counted(df: DataFrame, tag: String) =
        df.groupBy("o_orderstatus", "o_orderpriority")
          .agg(count(lit(1)).as("n")).withColumn("op", lit(tag))
      counted(a.intersectAll(b), "intersect_all")
        .unionByName(counted(a.exceptAll(b), "except_all"))
        .orderBy("op", "o_orderstatus", "o_orderpriority")
    }),

    // Second-moment statistics (variance/stddev/correlation) with the
    // float discipline applied to POWER SUMS: the builtin stddev/corr
    // aggregates merge incremental moments in partition order, so
    // their low bits are nondeterministic across runs AND engines.
    // Here Σx, Σx², Σxy accumulate as EXACT decimals (quantity is
    // integral, price has 2 decimals — no rounding ever), and the
    // textbook formulas run once in double at the end: bit-identical
    // everywhere, still one map-side-combinable aggregate pass.
    "a17_moments" -> ((s, dir) => {
      // narrow enough that every product stays inside decimal(38,_)
      // with NO scale adjustment in either engine: (12,2)×(18,2) →
      // (31,4), exact for integral quantities and 2-decimal prices
      def dq(c: Column) = c.cast("decimal(12,2)")
      def dp(c: Column) = c.cast("decimal(18,2)")
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(dq(col("l_quantity"))).as("__sq"),
          sum(dq(col("l_quantity")) * dq(col("l_quantity"))).as("__sq2"),
          sum(dp(col("l_extendedprice"))).as("__sp"),
          sum(dp(col("l_extendedprice")) * dp(col("l_extendedprice"))).as("__sp2"),
          sum(dq(col("l_quantity")) * dp(col("l_extendedprice"))).as("__sqp"))
        .select(col("l_returnflag"), col("n"),
          (col("__sq").cast("double") / col("n")).as("mean_qty"),
          sqrt((col("n") * col("__sq2").cast("double") -
            col("__sq").cast("double") * col("__sq").cast("double")) /
            (col("n") * (col("n") - 1))).as("stddev_qty"),
          ((col("n") * col("__sqp").cast("double") -
            col("__sq").cast("double") * col("__sp").cast("double")) /
            sqrt((col("n") * col("__sq2").cast("double") -
              col("__sq").cast("double") * col("__sq").cast("double")) *
              (col("n") * col("__sp2").cast("double") -
                col("__sp").cast("double") * col("__sp").cast("double"))))
            .as("corr_qty_price"))
        .orderBy("l_returnflag")
    }),

    // NULL-SAFE equi-join (<=> / IS NOT DISTINCT FROM): NULL keys
    // match each other — the semantics plain = can never give (its
    // NULL rows silently vanish). Spark still plans this as a HASH
    // join (null-safe keys are hashable via the internal coalesce
    // trick), not a nested loop — plan-asserted.
    "j16_null_safe_join" -> ((s, dir) => {
      val a = t(s, dir, "orders")
        .groupBy(nullif(col("o_custkey") % 50, lit(49)).as("k"))
        .agg(count(lit(1)).as("n_orders"))
      val b = t(s, dir, "customer")
        .groupBy(nullif(col("c_custkey") % 50, lit(49)).as("k"))
        .agg(count(lit(1)).as("n_customers"))
      a.join(b, a("k") <=> b("k"))
        .select(coalesce(a("k"), lit(-1L)).as("k"),
          col("n_orders"), col("n_customers"))
        .orderBy("k")
    }),

    // Global ORDER BY + LIMIT: the top-k pattern that must NEVER plan
    // as a full sort — Spark's TakeOrderedAndProject keeps a bounded
    // k-element heap per partition and merges heaps on the driver
    // (O(n log k) work, no shuffle of the full table). The unique
    // tiebreak makes the k-row set engine-deterministic.
    "o4_topk_limit" -> ((s, dir) =>
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(20)),

    // Value-based (RANGE) window frame: per-customer order totals
    // summed over a ±3-DAY value window around each order — peers are
    // defined by the order-date VALUE, not row offsets, so the frame
    // widens and narrows with the data (w5's ROWS frame cannot express
    // this). The day number is an integer column, making the frame
    // bounds engine-portable.
    "w10_range_frame_window" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("day_nr"))
        .rangeBetween(-3, 3)
      t(s, dir, "orders")
        .withColumn("day_nr",
          datediff(to_date(col("o_orderdate")), to_date(lit("1992-01-01"))))
        .select(col("o_orderkey"), col("o_custkey"), col("day_nr"),
          sum(col("o_totalprice").cast("decimal(18,6)")).over(w)
            .cast("double").as("nearby_total"),
          count(lit(1)).over(w).as("n_nearby"))
        .orderBy("o_orderkey")
    }),

    // Conditional / boolean aggregate family: count_if, bool_and,
    // bool_or. All three keep flat fixed-width buffers, so the whole
    // group-by stays ONE HashAggregate pair (partial + final, map-side
    // combinable) — deliberately no struct-valued aggregate here,
    // which would silently demote the pass to SortAggregate (struct
    // buffers aren't hash-mutable; the struct-max pattern lives in
    // a14_mode where that trade is the point). Plan-pinned.
    "a18_filtered_aggs" -> ((s, dir) =>
      t(s, dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
          count_if(col("o_orderstatus") === "F").as("n_finished"),
          bool_and(col("o_totalprice") > 0).as("all_positive"),
          bool_or(col("o_totalprice") > 400000d).as("any_jumbo"))
        .orderBy("o_orderpriority")),

    // Forward fill (last observation carried forward): open orders
    // carry no observed price; each row inherits the latest non-null
    // value in its customer's history. `last(..., ignoreNulls)` over a
    // running ROWS frame is the distributed LOCF — one shuffle on the
    // partition key, a single ordered pass per partition, no
    // self-join and no driver loop however long the gap runs.
    "w11_forward_fill" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "orders")
        .where(col("o_custkey") <= 150)
        .withColumn("observed",
          when(col("o_orderstatus") === "O", lit(null).cast("double"))
            .otherwise(col("o_totalprice")))
        .select(col("o_custkey"), col("o_orderkey"), col("observed"),
          last(col("observed"), ignoreNulls = true).over(w).as("filled_price"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // LATERAL correlated subquery (top-2 customers per nation): the
    // per-row subquery carries its own ORDER BY + LIMIT. Catalyst
    // decorrelates to a window rank over ONE shuffled pass of
    // customer — never a per-nation re-execution — so the plan is
    // identical in shape to the hand-written w1 dedup, but the user
    // writes the natural per-group query. DuckDB runs the same text.
    "j17_lateral_topk" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""SELECT n_name, c_custkey, c_acctbal
               FROM nation, LATERAL (
                 SELECT c_custkey, c_acctbal FROM customer
                 WHERE c_nationkey = n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2)
               ORDER BY n_name, c_custkey""")
    }),

    // Recursive CTE (WITH RECURSIVE, Spark 4 / SPARK-24497): binary-
    // tree descent over the customer key space — each iteration is one
    // distributed join of the frontier against the table, the engine
    // unions the per-level results; depth is O(log n) iterations, not
    // a driver loop. Identical SQL text runs on DuckDB.
    "o5_recursive_cte" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""WITH RECURSIVE tree AS (
                 SELECT cast(1 AS BIGINT) AS k, 0 AS depth
                 UNION ALL
                 SELECT c.c_custkey AS k, t.depth + 1 AS depth
                 FROM tree t JOIN customer c
                   ON c.c_custkey = t.k * 2 OR c.c_custkey = t.k * 2 + 1)
               SELECT depth, count(*) AS n_nodes,
                      min(k) AS min_key, max(k) AS max_key
               FROM tree GROUP BY depth ORDER BY depth""")
    }),

    // Bitwise aggregates as a bitmap rollup: each event type owns one
    // bit; bit_or collapses a user bucket's whole history into a
    // single long (the bitmap-index pattern — 100 TB of events reduce
    // to one word per key), bit_count reads the distinct-type
    // cardinality back off the mask. Flat buffers: stays HashAggregate.
    "a19_bitwise_aggs" -> ((s, dir) => {
      val mask = when(col("event_type") === "click", 1L)
        .when(col("event_type") === "error", 2L)
        .when(col("event_type") === "purchase", 4L)
        .when(col("event_type") === "signup", 8L)
        .otherwise(16L)
      t(s, dir, "events")
        .groupBy((col("user_id") % 100).as("user_bucket"))
        .agg(bit_or(mask).as("type_mask"),
          bit_and(mask).as("common_mask"))
        .select(col("user_bucket"), col("type_mask"), col("common_mask"),
          bit_count(col("type_mask")).cast("int").as("n_types"))
        .orderBy("user_bucket")
    }),

    // Map-typed column pipeline: per-user type→count map built with
    // map_from_entries over a sorted entry list, thinned with
    // map_filter, rescored with transform_values (both higher-order
    // map lambdas, codegen'd — no UDF), then exploded back to rows.
    // The map stays a value inside one aggregate row — never a
    // per-entry shuffle beyond the one feeding groupBy.
    "f14_map_ops" -> ((s, dir) => {
      val perType = t(s, dir, "events")
        .where(col("user_id") < 200)
        .groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("cnt"))
      perType.groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("event_type"), col("cnt"))))).as("m"))
        .select(col("user_id"),
          explode(transform_values(
            map_filter(col("m"), (_, v) => v >= 3),
            (k, v) => v * 10 + length(k))))
        .select(col("user_id"), col("key").as("event_type"),
          col("value").as("score"))
        .orderBy("user_id", "event_type")
    }),

    // Streaming SESSION windows (gap-driven, data-defined extent):
    // one open session per active user in state, merged in place —
    // the windowing shape tumbling/sliding cannot express.
    "stream_session_window" -> ((s, dir) =>
      StreamingOps.sessionWindowCounts(s, dir)
        .orderBy("user_id", "session_start_us")),

    // The SAME sessionization contract re-expressed on event-time
    // TIMERS (transformWithState + handleExpiredTimer): state is
    // merged pending sessions per user, one armed timer per key, and
    // finalization happens when the watermark passes last event +
    // gap — the TTL-by-semantics pattern. One oracle pins both this
    // and the declarative session_window witness.
    "stream_timer_sessions" -> ((s, dir) =>
      graft.streaming.SessionTimers.timerSessions(s, dir)
        .orderBy("user_id", "session_start_us")),

    // Stream-static enrichment join (events stream ⋈ broadcast nation
    // dim) feeding a watermarked daily window — the streaming star
    // join.
    "stream_enriched_join" -> ((s, dir) =>
      StreamingOps.enrichedDailyCounts(s, dir)
        .orderBy("report_date", "n_name")),

    // Sliding-window aggregate (2-day windows, 1-day slide): each
    // event feeds exactly two overlapping windows.
    "stream_sliding_window" -> ((s, dir) =>
      StreamingOps.slidingWindowCounts(s, dir)
        .orderBy("window_start", "event_type")),

    // Array SET-operation family (array_intersect / union / except /
    // arrays_overlap): each document's token stream splits in half
    // and the halves compare as sets — all codegen'd array
    // expressions inside the scan stage, no explode, no shuffle
    // before the final sort.
    "f15_array_set_ops" -> ((s, dir) => {
      val ws = graft.functions.TextFns.tokens(col("text"))
      val half = floor(size(ws) / 2).cast("int")
      val a = array_distinct(slice(ws, lit(1), half))
      val b = array_distinct(slice(ws, half + 1, size(ws) - half))
      t(s, dir, "documents")
        .select(col("doc_id"),
          size(array_intersect(a, b)).as("n_shared"),
          size(array_union(a, b)).as("n_union"),
          size(array_except(a, b)).as("n_only_first"),
          arrays_overlap(a, b).as("halves_overlap"))
        .orderBy("doc_id")
    }),

    // Ordered FUNNEL-pattern matching (click → view → purchase as a
    // SUBSEQUENCE of each user-day's event stream): the
    // MATCH_RECOGNIZE-style sequential pattern, done with one
    // grouped sort (array_sort of (ts, event_id, type) structs —
    // collect_list alone has no order guarantee) and greedy
    // earliest-match position arithmetic, all array expressions.
    // Per-day conversion counts; one shuffle on the session key.
    "w13_funnel_pattern" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      s.sql("""WITH ev AS (
                 SELECT user_id, to_date(ts) AS day, event_type, ts, event_id
                 FROM events),
               sess AS (
                 SELECT user_id, day,
                        transform(array_sort(collect_list(struct(ts, event_id, event_type))),
                                  x -> x.event_type) AS l
                 FROM ev GROUP BY user_id, day),
               f AS (
                 -- lateral column aliases: p1/p2r feed the next step's
                 -- greedy search window
                 SELECT user_id, day,
                        nullif(array_position(l, 'click'), 0) AS p1,
                        CASE WHEN p1 IS NOT NULL THEN
                          nullif(array_position(
                            slice(l, CAST(p1 AS INT) + 1, size(l)), 'view'), 0)
                        END AS p2r,
                        CASE WHEN p2r IS NOT NULL THEN
                          nullif(array_position(
                            slice(l, CAST(p1 + p2r AS INT) + 1, size(l)), 'purchase'), 0)
                        END AS p3r
                 FROM sess)
               SELECT day, count(*) AS n_sessions,
                      count(p1) AS n_step1, count(p2r) AS n_step2,
                      count(p3r) AS n_step3
               FROM f GROUP BY day ORDER BY day""")
    }),

    // Explicit NULL-ordering control: Spark's ASC default is NULLS
    // FIRST while ANSI engines commonly default NULLS LAST — a silent
    // cross-engine divergence for any top-k over a nullable sort key.
    // Both directions pinned explicitly (asc_nulls_last /
    // desc_nulls_first) so the k-row set is engine-deterministic;
    // each half still plans as TakeOrderedAndProject, never a full
    // sort.
    "o6_null_ordering" -> ((s, dir) => {
      val base = t(s, dir, "orders")
        .withColumn("v",
          when(col("o_orderstatus") === "O", lit(null).cast("double"))
            .otherwise(col("o_totalprice")))
        .select("o_orderkey", "v")
      val a = base.orderBy(col("v").asc_nulls_last, col("o_orderkey")).limit(5)
        .select(lit("asc_nulls_last").as("mode"), col("o_orderkey"), col("v"))
      val b = base.orderBy(col("v").desc_nulls_first, col("o_orderkey")).limit(5)
        .select(lit("desc_nulls_first").as("mode"), col("o_orderkey"), col("v"))
      a.unionByName(b).orderBy("mode", "o_orderkey")
    }),

    // Salted equi-join on a MANUFACTURED hot key (80% of events
    // collapse onto key 0): the fact side spreads each key over 8
    // salt buckets, the dim replicates 8x, the join key becomes
    // (k, salt) — the hot key's rows land on 8 reducers instead of 1.
    // The oracle is the UNSALTED join: salting must be semantically
    // invisible. Complements skew_salted_agg (aggregation side) and
    // AQE's runtime skew-join split (which can't see every skew).
    "j19_salted_skew_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
        .withColumn("k",
          when(pmod(col("user_id"), lit(10)) < 8, 0L).otherwise(col("user_id")))
      val dim = ev.select("k").distinct()
        .withColumn("grp", concat(lit("grp_"), (col("k") % 7).cast("string")))
      graft.operators.Skew.saltedJoin(ev, dim, "k", col("event_id"), 8)
        .groupBy("grp")
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .orderBy("grp")
    }),

    // Interval-OVERLAP join (the interval-algebra completion of j7's
    // point-in-range): per-user-day session intervals against
    // synthesized maintenance windows, banded on the day so the
    // candidate join is a plain equi-join (every overlapping pair
    // shares the day key — lossless here since both interval families
    // are day-confined), with the exact overlap predicate and overlap
    // DURATION computed on integer epoch-micros. Never a cross join;
    // at 100 TB the band key keeps candidates linear in co-resident
    // intervals per day.
    "j18_interval_overlap_join" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val sessions = ev
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(min(unix_micros(col("ts"))).as("s_start"),
          max(unix_micros(col("ts"))).as("s_end"))
      val windows = ev.select(to_date(col("ts")).as("day")).distinct()
        .where(dayofmonth(col("day")) % 3 === 0)
        .select(col("day"),
          (unix_micros(col("day").cast("timestamp")) + 21600000000L).as("w_start"),
          (unix_micros(col("day").cast("timestamp")) + 64800000000L).as("w_end"))
      sessions.join(windows, "day")
        .where(col("s_start") <= col("w_end") && col("w_start") <= col("s_end"))
        .select(col("user_id"), col("day"),
          (least(col("s_end"), col("w_end")) -
            greatest(col("s_start"), col("w_start"))).as("overlap_us"))
        .orderBy("user_id", "day")
    }),

    // Point-in-interval join through the engine's OWN planner rung:
    // graft.plans.IntervalJoinStrategy recognizes `p BETWEEN lo AND
    // hi` (no equi-conjunct) against a broadcast-hinted build side and
    // plans BroadcastIntervalJoinExec — a centered interval tree
    // probed at O(log n + matches) per event instead of
    // BroadcastNestedLoopJoin's O(n) full scan per probe. Same
    // business-hours-window semantics as j18, but the probe side is
    // the RAW event stream (60k points at sf0.01, the shape that
    // makes nested-loop quadratic), not pre-aggregated sessions.
    // The optimizer-rule rung rides the same witness: the min/max
    // pre-filter (IntervalPrefilterRule) injects derived bounds on
    // the probe side, so out-of-range events die at a codegen'd
    // two-long compare before the tree probe — the oracle pins that
    // strategy + rule together still produce the exact join result.
    "j20_interval_tree_join" -> ((s, dir) => {
      graft.plans.IntervalJoinStrategy.install(s)
      graft.plans.IntervalPrefilterRule.install(s)
      val ev = t(s, dir, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("p"))
      val windows = t(s, dir, "events")
        .select(to_date(col("ts")).as("day")).distinct()
        .where(dayofmonth(col("day")) % 3 === 0)
        .select(col("day"),
          (unix_micros(col("day").cast("timestamp")) + 21600000000L).as("w_start"),
          (unix_micros(col("day").cast("timestamp")) + 64800000000L).as("w_end"))
      ev.join(broadcast(windows),
          col("p") >= col("w_start") && col("p") <= col("w_end"))
        .groupBy("day")
        .agg(count(lit(1)).as("n_events"),
          sum(col("user_id")).as("user_checksum"))
        .orderBy("day")
    }),

    // Spark 4 SQL SCRIPTING (BEGIN…END compound statements): session
    // variables, WHILE control flow, and an array accumulator built
    // per iteration, unwrapped relationally by the script's final
    // SELECT — the procedural-SQL surface (dbt pre/post-hooks, ETL
    // driver scripts) that previously needed an external driver
    // language. The loop body hits the real events view once per
    // day-of-week bucket; the oracle is the equivalent single
    // GROUP BY (DuckDB dayofweek is 0-based, Spark 1-based).
    "sql_scripting_loop" -> ((s, dir) => {
      Tables.registerViews(s, dir)
      val prev = s.conf.getOption("spark.sql.scripting.enabled")
      try {
        s.conf.set("spark.sql.scripting.enabled", "true")
        s.sql("""
          BEGIN
            DECLARE acc ARRAY<STRUCT<dow: INT, n_events: BIGINT>>
              DEFAULT array();
            DECLARE i INT DEFAULT 1;
            WHILE i <= 7 DO
              SET acc = array_append(acc, named_struct('dow', i,
                'n_events',
                (SELECT count(*) FROM events WHERE dayofweek(ts) = i)));
              SET i = i + 1;
            END WHILE;
            -- zero-count weekdays are filtered so the result agrees
            -- with the oracle's GROUP BY (which emits no row for a
            -- weekday absent from the feed) at ANY scale factor
            SELECT s.dow AS dow, s.n_events AS n_events
            FROM (SELECT explode(acc) AS s)
            WHERE s.n_events > 0 ORDER BY dow;
          END""")
      } finally prev match {
        case Some(v) => s.conf.set("spark.sql.scripting.enabled", v)
        case None => s.conf.unset("spark.sql.scripting.enabled")
      }
    }),

    // Pipeline observability via Dataset.observe (§5's dbt-test
    // analog WITHOUT a second scan): the metrics ride the very pass
    // that materializes the frame — a QueryExecutionListener hands
    // them to the driver when the action completes, so a 100 TB
    // write gets its row counts / null counts / control totals for
    // free instead of re-aggregating the table afterwards. The
    // registry result is the observed metrics row itself; the oracle
    // recomputes the same aggregates relationally — any divergence
    // between the observed path and a direct aggregation is a
    // correctness failure of the observation plumbing.
    "quality_observed_metrics" -> ((s, dir) => {
      val obs = org.apache.spark.sql.Observation()
      t(s, dir, "orders").observe(obs,
          count(lit(1)).as("n_rows"),
          count(col("o_orderdate")).as("n_nonnull_dates"),
          decSum(col("o_totalprice")).as("total_price"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key"))
        .write.format("noop").mode("overwrite").save()
      val m = obs.get
      import s.implicits._
      Seq((m("n_rows").asInstanceOf[Long],
        m("n_nonnull_dates").asInstanceOf[Long],
        m("total_price").asInstanceOf[Double],
        m("min_key").asInstanceOf[Long],
        m("max_key").asInstanceOf[Long]))
        .toDF("n_rows", "n_nonnull_dates", "total_price", "min_key",
          "max_key")
    }),

    // COUNT(DISTINCT) as a window value — Spark (like ANSI engines
    // generally) rejects DISTINCT inside window aggregates, so the
    // portable trick is max(dense_rank): rank the values within the
    // partition, the max rank IS the distinct count, attached to every
    // row with no groupBy + join-back. Both windows share one
    // partition key, so the whole thing is a single exchange + sort
    // (plan-pinned), not two passes.
    "w12_distinct_count_window" -> ((s, dir) => {
      val byDate = Window.partitionBy("o_custkey").orderBy("o_orderdate")
      val all = Window.partitionBy("o_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .where(col("o_custkey") <= 100)
        .withColumn("__dr", dense_rank().over(byDate))
        .select(col("o_custkey"), col("o_orderkey"),
          max(col("__dr")).over(all).cast("long").as("n_distinct_dates"))
        .orderBy("o_custkey", "o_orderkey")
    }),

    // Streaming MERGE upsert (foreachBatch + batch-local reduce +
    // versioned-by-batchId target): the streaming-CDC-into-a-keyed-
    // table production pattern; latest-wins on (ts, event_id) so the
    // result is independent of micro-batch assignment.
    "stream_upsert_merge" -> ((s, dir) =>
      StreamingOps.upsertMergeRun(s, dir)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")),

    // flatMapGroupsWithState (variable-arity stateful emission): one
    // row per spend-tier boundary crossed — zero or many rows per
    // group invocation, which mapGroupsWithState cannot express.
    // Exact integer-cents accumulation, O(1) state per key.
    // NOTE (user_id, tier) is no longer unique once refunds allow a
    // tier to be re-crossed — event_id makes the sort total.
    "stream_threshold_emit" -> ((s, dir) =>
      graft.streaming.ThresholdEmit.tierCrossings(s, dir)
        .orderBy("user_id", "tier", "event_id")),

    // transformWithState (state API v2, the CURRENT arbitrary-state
    // API): named typed state cells (2× ValueState + MapState) under
    // the RocksDB provider, state persisted across three real
    // micro-batches; per-batch progress rows fold to an
    // order-independent final shape (per-batch deltas → sum,
    // monotone counters → max).
    "stream_transform_with_state" -> ((s, dir) =>
      graft.streaming.TransformWithStateOps.runningSpend(s, dir)
        .orderBy("user_id")),

    // Stream-STREAM time-range join: per-user click→purchase
    // attribution pairs within a 1-day horizon, aggregated per user
    // from the append-sink read-back.
    "stream_stream_join" -> ((s, dir) =>
      StreamingOps.streamStreamAttribution(s, dir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("purchase_id")).as("n_purchases"))
        .orderBy("user_id")),

    // Stream-STREAM LEFT OUTER time-range join: matched pairs emit
    // eagerly, unmatched clicks emit with a null purchase only after
    // the watermark expires their buffered state — the null-emission
    // path the inner join never takes. n_unmatched in the oracle is
    // what pins it: if expired state never emitted, every user's
    // unmatched count would read 0 and the hash would break.
    "stream_stream_outer_join" -> ((s, dir) =>
      StreamingOps.streamStreamOuterAttribution(s, dir)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("purchase_id") >= 0, 1)).as("n_matched"),
          count(when(col("purchase_id") === -1, 1)).as("n_unmatched"))
        .orderBy("user_id")))

  val oracles: Map[String, String] = Map(
    "a18_filtered_aggs" ->
      """SELECT o_orderpriority,
                count(*) FILTER (o_orderstatus = 'F') AS n_finished,
                bool_and(o_totalprice > 0) AS all_positive,
                bool_or(o_totalprice > 400000) AS any_jumbo
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "w11_forward_fill" ->
      """SELECT o_custkey, o_orderkey,
                CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS observed,
                last_value(CASE WHEN o_orderstatus = 'O' THEN NULL
                                ELSE o_totalprice END IGNORE NULLS)
                  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_price
         FROM orders WHERE o_custkey <= 150
         ORDER BY o_custkey, o_orderkey""",
    "j17_lateral_topk" ->
      """SELECT n_name, c_custkey, c_acctbal
         FROM nation, LATERAL (
           SELECT c_custkey, c_acctbal FROM customer
           WHERE c_nationkey = n_nationkey
           ORDER BY c_acctbal DESC, c_custkey LIMIT 2)
         ORDER BY n_name, c_custkey""",
    "stream_threshold_emit" ->
      """WITH e AS (
           SELECT user_id, event_id, ts,
                  cast(round(value * 100) AS BIGINT) AS cents
           FROM events),
         c AS (SELECT user_id, event_id, ts, cents,
                      sum(cents) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS cum
               FROM e),
         x AS (SELECT user_id, event_id, cast(cum AS BIGINT) AS cum,
                      cast(coalesce(lag(cum) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id), 0) AS BIGINT) AS prev
               FROM c)
         SELECT user_id, event_id, tier FROM (
           SELECT user_id, event_id,
                  unnest(range(prev // 100000 + 1, cum // 100000 + 1)) AS tier
           FROM x WHERE cum // 100000 > prev // 100000)
         WHERE tier >= 1
         ORDER BY user_id, tier, event_id""",
    "f15_array_set_ops" ->
      """WITH s AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS ws
           FROM documents),
         h AS (SELECT doc_id, ws, len(ws) // 2 AS half FROM s),
         ab AS (SELECT doc_id,
                       list_distinct(ws[1 : half]) AS a,
                       list_distinct(ws[half + 1 : len(ws)]) AS b
                FROM h)
         SELECT doc_id,
                cast(len(list_intersect(a, b)) AS INTEGER) AS n_shared,
                cast(len(list_distinct(list_concat(a, b))) AS INTEGER) AS n_union,
                cast(len(list_filter(a, x -> NOT list_contains(b, x))) AS INTEGER) AS n_only_first,
                len(list_intersect(a, b)) > 0 AS halves_overlap
         FROM ab ORDER BY doc_id""",
    "w13_funnel_pattern" ->
      """WITH ev AS (
           SELECT user_id, cast(date_trunc('day', ts) AS DATE) AS day,
                  event_type, ts, event_id
           FROM events),
         sess AS (
           SELECT user_id, day,
                  list(event_type ORDER BY ts, event_id) AS l
           FROM ev GROUP BY user_id, day),
         f AS (
           SELECT user_id, day,
                  nullif(list_position(l, 'click'), 0) AS p1,
                  CASE WHEN p1 IS NOT NULL THEN
                    nullif(list_position(l[p1 + 1 :], 'view'), 0) END AS p2r,
                  CASE WHEN p2r IS NOT NULL THEN
                    nullif(list_position(l[p1 + p2r + 1 :], 'purchase'), 0) END AS p3r
           FROM sess)
         SELECT day, count(*) AS n_sessions,
                count(p1) AS n_step1, count(p2r) AS n_step2,
                count(p3r) AS n_step3
         FROM f GROUP BY day ORDER BY day""",
    "o6_null_ordering" ->
      """WITH base AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS v
           FROM orders),
         a AS (SELECT 'asc_nulls_last' AS mode, o_orderkey, v FROM base
               ORDER BY v ASC NULLS LAST, o_orderkey LIMIT 5),
         b AS (SELECT 'desc_nulls_first' AS mode, o_orderkey, v FROM base
               ORDER BY v DESC NULLS FIRST, o_orderkey LIMIT 5)
         SELECT * FROM a UNION ALL SELECT * FROM b
         ORDER BY mode, o_orderkey""",
    "j19_salted_skew_join" ->
      """WITH f AS (
           SELECT CASE WHEN user_id % 10 < 8 THEN 0 ELSE user_id END AS k, value
           FROM events),
         d AS (SELECT DISTINCT k, 'grp_' || cast(k % 7 AS VARCHAR) AS grp FROM f)
         SELECT grp, count(*) AS n_events,
                cast(sum(cast(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
         FROM f JOIN d USING (k)
         GROUP BY grp ORDER BY grp""",
    "j18_interval_overlap_join" ->
      """WITH s AS (
           SELECT user_id, cast(date_trunc('day', ts) AS DATE) AS day,
                  min(epoch_us(ts)) AS s_start, max(epoch_us(ts)) AS s_end
           FROM events GROUP BY 1, 2),
         w AS (
           SELECT day, epoch_us(cast(day AS TIMESTAMP)) + 21600000000 AS w_start,
                  epoch_us(cast(day AS TIMESTAMP)) + 64800000000 AS w_end
           FROM (SELECT DISTINCT cast(date_trunc('day', ts) AS DATE) AS day FROM events)
           WHERE day(day) % 3 = 0)
         SELECT s.user_id, s.day,
                least(s.s_end, w.w_end) - greatest(s.s_start, w.w_start) AS overlap_us
         FROM s JOIN w USING (day)
         WHERE s.s_start <= w.w_end AND w.w_start <= s.s_end
         ORDER BY s.user_id, s.day""",
    "j20_interval_tree_join" ->
      """WITH w AS (
           SELECT day, epoch_us(cast(day AS TIMESTAMP)) + 21600000000 AS w_start,
                  epoch_us(cast(day AS TIMESTAMP)) + 64800000000 AS w_end
           FROM (SELECT DISTINCT cast(date_trunc('day', ts) AS DATE) AS day FROM events)
           WHERE day(day) % 3 = 0)
         SELECT w.day, count(*) AS n_events,
                cast(sum(e.user_id) AS BIGINT) AS user_checksum
         FROM events e JOIN w
           ON epoch_us(e.ts) >= w.w_start AND epoch_us(e.ts) <= w.w_end
         GROUP BY w.day ORDER BY w.day""",
    "sql_scripting_loop" ->
      """SELECT dayofweek(ts) + 1 AS dow, count(*) AS n_events
         FROM events GROUP BY 1 ORDER BY dow""",
    "quality_observed_metrics" ->
      """SELECT count(*) AS n_rows,
                count(o_orderdate) AS n_nonnull_dates,
                cast(sum(cast(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                  AS total_price,
                cast(min(o_orderkey) AS BIGINT) AS min_key,
                cast(max(o_orderkey) AS BIGINT) AS max_key
         FROM orders""",
    "w12_distinct_count_window" ->
      """SELECT o_custkey, o_orderkey,
                count(DISTINCT o_orderdate)
                  OVER (PARTITION BY o_custkey) AS n_distinct_dates
         FROM orders WHERE o_custkey <= 100
         ORDER BY o_custkey, o_orderkey""",
    "stream_upsert_merge" ->
      """SELECT user_id, event_id, event_type, value FROM (
           SELECT *, row_number() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) AS rn FROM events)
         WHERE rn = 1 ORDER BY user_id""",
    "stream_transform_with_state" ->
      """WITH e AS (
           SELECT user_id, event_type, event_id % 3 AS grp,
                  cast(round(value * 100) AS BIGINT) AS cents
           FROM events)
         SELECT user_id,
                cast(sum(cents) AS BIGINT) AS total_cents,
                count(*) AS n_events,
                cast(count(DISTINCT event_type) AS BIGINT) AS n_types,
                cast(count(DISTINCT grp) AS BIGINT) AS n_batches
         FROM e GROUP BY user_id ORDER BY user_id""",
    "o5_recursive_cte" ->
      """WITH RECURSIVE tree AS (
           SELECT cast(1 AS BIGINT) AS k, 0 AS depth
           UNION ALL
           SELECT c.c_custkey AS k, t.depth + 1 AS depth
           FROM tree t JOIN customer c
             ON c.c_custkey = t.k * 2 OR c.c_custkey = t.k * 2 + 1)
         SELECT depth, count(*) AS n_nodes,
                min(k) AS min_key, max(k) AS max_key
         FROM tree GROUP BY depth ORDER BY depth""",
    "a19_bitwise_aggs" ->
      """WITH m AS (
           SELECT user_id % 100 AS user_bucket,
                  cast(CASE event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                       WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                       ELSE 16 END AS BIGINT) AS mask
           FROM events)
         SELECT user_bucket, bit_or(mask) AS type_mask,
                bit_and(mask) AS common_mask,
                cast(bit_count(bit_or(mask)) AS INTEGER) AS n_types
         FROM m GROUP BY user_bucket ORDER BY user_bucket""",
    "f14_map_ops" ->
      """WITH pt AS (
           SELECT user_id, event_type, count(*) AS cnt
           FROM events WHERE user_id < 200 GROUP BY 1, 2)
         SELECT user_id, event_type, cnt * 10 + length(event_type) AS score
         FROM pt WHERE cnt >= 3
         ORDER BY user_id, event_type""",
    "j8_left_outer_join" ->
      """SELECT c_mktsegment, count(o_orderkey) AS n_open_orders, count(*) AS n_rows
         FROM customer LEFT JOIN orders
           ON o_custkey = c_custkey AND o_orderstatus = 'O'
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "j9_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
         ORDER BY c_custkey""",
    "j10_full_outer_join" ->
      """WITH sup AS (SELECT s_nationkey, count(*) AS ns FROM supplier
                      WHERE s_acctbal > 8000 GROUP BY s_nationkey),
         cus AS (SELECT c_nationkey, count(*) AS nc FROM customer
                 WHERE c_acctbal < -900 GROUP BY c_nationkey)
         SELECT coalesce(s_nationkey, c_nationkey) AS nationkey,
                coalesce(ns, 0) AS n_rich_suppliers,
                coalesce(nc, 0) AS n_debtor_customers
         FROM sup FULL JOIN cus ON s_nationkey = c_nationkey
         ORDER BY nationkey""",
    "j12_correlated_scalar" ->
      """SELECT c_custkey, c_mktsegment,
                (SELECT max(o_totalprice) FROM orders
                 WHERE o_custkey = c_custkey) AS max_order_price
         FROM customer
         WHERE c_custkey <= 300
         ORDER BY c_custkey""",
    "j11_exists_subquery" ->
      """SELECT p_partkey, p_name FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_partkey = p_partkey AND l_quantity >= 49)
         ORDER BY p_partkey""",
    "a11_grouping_sets" ->
      """SELECT coalesce(r_name, 'ALL') AS region_name,
                coalesce(n_name, 'ALL') AS nation_name,
                cast(grouping(r_name) * 2 + grouping(n_name) AS INTEGER) AS gid,
                count(*) AS n_customers,
                cast(sum(cast(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS total_bal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY GROUPING SETS ((r_name, n_name), (r_name), ())
         ORDER BY gid, region_name, nation_name""",
    "a12_unpivot" ->
      """WITH wide AS (
           SELECT o_orderpriority,
                  count(*) FILTER (o_orderstatus = 'F') AS n_f,
                  count(*) FILTER (o_orderstatus = 'O') AS n_o,
                  count(*) FILTER (o_orderstatus = 'P') AS n_p
           FROM orders GROUP BY o_orderpriority)
         SELECT o_orderpriority, status_metric, n FROM (
           SELECT o_orderpriority, 'n_f' AS status_metric, n_f AS n FROM wide
           UNION ALL
           SELECT o_orderpriority, 'n_o', n_o FROM wide
           UNION ALL
           SELECT o_orderpriority, 'n_p', n_p FROM wide)
         ORDER BY o_orderpriority, status_metric""",
    "a13_string_agg" ->
      """SELECT s_nationkey,
                string_agg(s_name, ',' ORDER BY s_name) AS suppliers,
                count(*) AS n_suppliers
         FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""",
    "f9_higher_order_fns" ->
      """WITH tk AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS ws
           FROM documents)
         SELECT doc_id,
                cast(len(list_filter(ws, x -> length(x) > 5)) AS INTEGER) AS n_long,
                cast(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS chars_sum,
                array_to_string(list_transform(ws[1:3], x -> upper(x)), ' ') AS head_upper,
                list_contains(ws, 'the') AS has_the
         FROM tk ORDER BY doc_id""",
    "f10_json_extract" ->
      """SELECT event_type,
                cast(sum(k) AS BIGINT) AS k_sum,
                count(k) AS n_k,
                cast(min(k) AS BIGINT) AS k_min,
                cast(max(k) AS BIGINT) AS k_max
         FROM (SELECT event_type,
                      cast(json_extract(props, '$.k') AS BIGINT) AS k
               FROM events)
         GROUP BY event_type ORDER BY event_type""",
    "w8_scd2_dimension" ->
      """WITH changes AS (
           SELECT user_id, event_type, ts, event_id
           FROM (SELECT user_id, event_type, ts, event_id,
                        lag(event_type) OVER w AS prev
                 FROM events
                 WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
           WHERE prev IS NULL OR prev <> event_type),
         chained AS (
           SELECT user_id, event_type, ts, event_id,
                  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
           FROM changes)
         SELECT user_id, event_type AS attr_value,
                epoch_us(ts) AS valid_from_us,
                coalesce(epoch_us(next_ts), 253402300800000000) AS valid_to_us,
                next_ts IS NULL AS is_current
         FROM chained ORDER BY user_id, valid_from_us""",
    "o3_gap_fill_calendar" ->
      """WITH sparse AS (
           SELECT event_type, cast(ts AS DATE) AS day, count(*) AS n
           FROM events WHERE value > 300 GROUP BY 1, 2),
         cal AS (
           SELECT cast(unnest(generate_series(
                    (SELECT min(cast(ts AS DATE)) FROM events),
                    (SELECT max(cast(ts AS DATE)) FROM events),
                    INTERVAL 1 DAY)) AS DATE) AS day),
         grid AS (SELECT e.event_type, cal.day
                  FROM (SELECT DISTINCT event_type FROM events) e CROSS JOIN cal)
         SELECT g.event_type, g.day, coalesce(s.n, 0) AS n_events
         FROM grid g LEFT JOIN sparse s
           ON g.event_type = s.event_type AND g.day = s.day
         ORDER BY g.event_type, g.day""",
    // DuckDB: double/0.0 is already NULL (matches try_divide); the
    // overflow arm is guarded by the exact boundary (orderkey > 1000
    // overflows orderkey * (Long.MaxValue // 1000)); bad dates via
    // try_cast.
    "f16_try_arithmetic" ->
      """SELECT l_orderkey, l_linenumber,
                l_extendedprice / (l_quantity - 25) AS safe_div,
                CASE WHEN l_orderkey > 1000 THEN NULL
                     ELSE l_orderkey * 9223372036854775 END AS safe_mul,
                try_cast('2024-01-' || lpad(cast(l_linenumber * 8 AS VARCHAR), 2, '0')
                         AS TIMESTAMP) AS safe_ts
         FROM lineitem WHERE l_orderkey % 50 = 0
         ORDER BY l_orderkey, l_linenumber""",
    "f17_na_functions" ->
      """WITH c AS (
           SELECT c_custkey,
                  CASE WHEN c_custkey % 11 = 0 THEN NULL
                       ELSE c_mktsegment END AS seg,
                  CASE WHEN c_custkey % 7 = 0 THEN NULL
                       ELSE c_acctbal END AS bal
           FROM customer),
         cleaned AS (
           SELECT coalesce(CASE WHEN seg = 'MACHINERY' THEN 'MACHINES'
                                ELSE seg END, 'UNKNOWN') AS seg,
                  coalesce(bal, 0.0) AS bal
           FROM c),
         d AS (SELECT count(*) AS n_complete FROM c
               WHERE seg IS NOT NULL AND bal IS NOT NULL)
         SELECT seg, count(*) AS n,
                cast(sum(cast(bal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal,
                (SELECT n_complete FROM d) AS n_complete
         FROM cleaned GROUP BY seg ORDER BY seg""",
    "f18_variant_extract" ->
      """SELECT event_type AS etype, count(*) AS n,
                cast(sum(user_id) AS BIGINT) AS uid_sum,
                cast(sum(cast(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                  AS k_sum,
                cast(sum(CASE WHEN event_id % 13 = 0 THEN NULL
                              ELSE cast(value AS DECIMAL(12,2)) END) AS DOUBLE)
                  AS val_sum,
                count(*) FILTER (event_id % 13 = 0) AS n_null_vals
         FROM events GROUP BY event_type ORDER BY etype""",
    "f19_collated_group" ->
      """WITH k AS (
           SELECT doc_id,
                  (CASE WHEN doc_id % 3 = 0 THEN upper(source)
                        WHEN doc_id % 3 = 1 THEN upper(source[1]) || source[2:]
                        ELSE source END) || ' ' ||
                  (CASE WHEN doc_id % 2 = 0 THEN
                          CASE WHEN doc_id % 4 = 0 THEN 'Hà Nội' ELSE 'HÀ NỘI' END
                        ELSE
                          CASE WHEN doc_id % 4 = 1 THEN 'Đà Nẵng' ELSE 'ĐÀ NẴNG' END
                   END) AS k
           FROM documents)
         SELECT lower(k) AS key_lc, count(*) AS n,
                min(doc_id) AS first_doc,
                count(DISTINCT k) AS n_case_variants
         FROM k WHERE contains(lower(k), 'nẵng')
         GROUP BY lower(k) ORDER BY key_lc""",
    // DuckDB's DECIMAL(38,_)->DOUBLE cast is not correctly rounded once
    // the hugeint-scaled value exceeds 2^53 (it divides a double by the
    // scale power, double-rounding); the VARCHAR hop IS correctly
    // rounded and matches Spark's BigDecimal.doubleValue bit-for-bit.
    "a20_regr_stats" ->
      """WITH s AS (
           SELECT cast(date_trunc('month', l_shipdate) AS DATE) AS ship_month,
                  count(*) AS n,
                  sum(cast(l_quantity AS DECIMAL(12,2))) AS sx,
                  sum(cast(l_quantity AS DECIMAL(12,2)) *
                      cast(l_quantity AS DECIMAL(12,2))) AS sxx,
                  sum(cast(l_extendedprice AS DECIMAL(18,2))) AS sy,
                  sum(cast(l_extendedprice AS DECIMAL(18,2)) *
                      cast(l_extendedprice AS DECIMAL(18,2))) AS syy,
                  sum(cast(l_quantity AS DECIMAL(12,2)) *
                      cast(l_extendedprice AS DECIMAL(18,2))) AS sxy
           FROM lineitem GROUP BY 1),
         d AS (
           SELECT ship_month, n,
                  cast(cast(sx AS VARCHAR) AS DOUBLE) AS sx,
                  cast(cast(sxx AS VARCHAR) AS DOUBLE) AS sxx,
                  cast(cast(sy AS VARCHAR) AS DOUBLE) AS sy,
                  cast(cast(syy AS VARCHAR) AS DOUBLE) AS syy,
                  cast(cast(sxy AS VARCHAR) AS DOUBLE) AS sxy
           FROM s)
         SELECT ship_month, n,
                (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
                (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
                  AS intercept,
                ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
                ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
         FROM d ORDER BY ship_month""",
    "s22_pipe_sql" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
                cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                cast(sum(cast(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*)
                  AS avg_rev
         FROM lineitem WHERE l_quantity >= 25.0
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "a14_mode" ->
      """WITH c AS (SELECT l_returnflag, l_quantity, count(*) AS cnt
                    FROM lineitem GROUP BY 1, 2),
         r AS (SELECT l_returnflag, l_quantity, cnt,
                      row_number() OVER (PARTITION BY l_returnflag
                        ORDER BY cnt DESC, l_quantity ASC) AS rn
               FROM c)
         SELECT l_returnflag, l_quantity AS mode_quantity, cnt AS mode_count
         FROM r WHERE rn = 1 ORDER BY l_returnflag""",
    "w9_value_windows" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
                first_value(c_custkey) OVER w AS poorest_custkey,
                last_value(c_custkey) OVER w AS richest_custkey,
                nth_value(c_custkey, 2) OVER w AS second_custkey
         FROM customer
         WINDOW w AS (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal ASC, c_custkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         ORDER BY c_custkey""",
    "f11_date_arithmetic" ->
      """SELECT o_orderkey,
                cast(o_orderdate AS DATE) AS order_date,
                cast(o_orderdate AS DATE) + 30 AS due_date,
                last_day(cast(o_orderdate AS DATE)) AS month_end,
                cast(isodow(cast(o_orderdate AS DATE)) AS INTEGER) AS iso_dow,
                cast(quarter(cast(o_orderdate AS DATE)) AS INTEGER) AS qtr,
                cast(date_diff('day', DATE '1992-01-01', cast(o_orderdate AS DATE))
                     AS INTEGER) AS days_since_92
         FROM orders ORDER BY o_orderkey""",
    "a15_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
                coalesce(o_orderpriority, 'ALL') AS priority,
                cast(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
                     AS INTEGER) AS gid,
                count(*) AS n_orders,
                cast(sum(cast(o_totalprice AS DECIMAL(18,6))) AS DOUBLE)
                  AS total_price
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY gid, status, priority""",
    "f12_explode_tokens" ->
      """WITH tk AS (
           SELECT doc_id,
                  string_split(trim(regexp_replace(text, '\s+', ' ', 'g')), ' ') AS ws
           FROM documents),
         ex AS (SELECT doc_id,
                       unnest(list_transform(ws, (x, i) -> {'pos': i, 'tok': x})) AS u
                FROM tk)
         SELECT doc_id, cast(u.pos AS INTEGER) AS pos, u.tok AS token
         FROM ex WHERE length(u.tok) > 7 ORDER BY doc_id, pos""",
    "a16_percentile_cont" ->
      """SELECT l_returnflag,
                quantile_cont(l_quantity, 0.25) AS p25,
                quantile_cont(l_quantity, 0.5) AS p50,
                quantile_cont(l_quantity, 0.75) AS p75,
                count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "u4_set_ops_all" ->
      """WITH a AS (SELECT o_orderstatus, o_orderpriority FROM orders
                    WHERE o_totalprice < 150000),
         b AS (SELECT o_orderstatus, o_orderpriority FROM orders
               WHERE cast(o_orderdate AS DATE) >= DATE '1995-01-01'),
         ia AS (SELECT * FROM a INTERSECT ALL SELECT * FROM b),
         ea AS (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
         SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                'intersect_all' AS op
         FROM ia GROUP BY 1, 2
         UNION ALL
         SELECT o_orderstatus, o_orderpriority, count(*), 'except_all'
         FROM ea GROUP BY 1, 2
         ORDER BY op, o_orderstatus, o_orderpriority""",
    "a17_moments" ->
      """WITH s AS (
           SELECT l_returnflag, count(*) AS n,
                  sum(cast(l_quantity AS DECIMAL(12,2))) AS sq,
                  sum(cast(l_quantity AS DECIMAL(12,2)) *
                      cast(l_quantity AS DECIMAL(12,2))) AS sq2,
                  sum(cast(l_extendedprice AS DECIMAL(18,2))) AS sp,
                  sum(cast(l_extendedprice AS DECIMAL(18,2)) *
                      cast(l_extendedprice AS DECIMAL(18,2))) AS sp2,
                  sum(cast(l_quantity AS DECIMAL(12,2)) *
                      cast(l_extendedprice AS DECIMAL(18,2))) AS sqp
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag, n,
                cast(sq AS DOUBLE) / n AS mean_qty,
                sqrt((n * cast(sq2 AS DOUBLE) -
                      cast(sq AS DOUBLE) * cast(sq AS DOUBLE)) /
                     (n * (n - 1))) AS stddev_qty,
                (n * cast(sqp AS DOUBLE) -
                 cast(sq AS DOUBLE) * cast(sp AS DOUBLE)) /
                sqrt((n * cast(sq2 AS DOUBLE) -
                      cast(sq AS DOUBLE) * cast(sq AS DOUBLE)) *
                     (n * cast(sp2 AS DOUBLE) -
                      cast(sp AS DOUBLE) * cast(sp AS DOUBLE)))
                  AS corr_qty_price
         FROM s ORDER BY l_returnflag""",
    "j16_null_safe_join" ->
      """WITH a AS (SELECT nullif(o_custkey % 50, 49) AS k, count(*) AS n_orders
                    FROM orders GROUP BY 1),
         b AS (SELECT nullif(c_custkey % 50, 49) AS k, count(*) AS n_customers
               FROM customer GROUP BY 1)
         SELECT coalesce(a.k, -1) AS k, n_orders, n_customers
         FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
         ORDER BY k""",
    "o4_topk_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20""",
    "w10_range_frame_window" ->
      """SELECT o_orderkey, o_custkey,
                cast(date_diff('day', DATE '1992-01-01',
                     cast(o_orderdate AS DATE)) AS INTEGER) AS day_nr,
                cast(sum(cast(o_totalprice AS DECIMAL(18,6))) OVER w AS DOUBLE)
                  AS nearby_total,
                count(*) OVER w AS n_nearby
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY cast(date_diff('day', DATE '1992-01-01',
                                    cast(o_orderdate AS DATE)) AS INTEGER)
                      RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
         ORDER BY o_orderkey""",
    "stream_session_window" ->
      """WITH flagged AS (
           SELECT user_id, ts, event_id,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                       THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sessions AS (
           SELECT user_id, ts,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
           FROM flagged)
         SELECT user_id,
                epoch_us(min(ts)) AS session_start_us,
                epoch_us(max(ts)) + 1800000000 AS session_end_us,
                count(*) AS n_events
         FROM sessions GROUP BY user_id, session_seq
         ORDER BY user_id, session_start_us""",
    "stream_timer_sessions" ->
      """WITH flagged AS (
           SELECT user_id, ts, event_id,
                  CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                       THEN 1 ELSE 0 END AS brk
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         sessions AS (
           SELECT user_id, ts,
                  sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
           FROM flagged)
         SELECT user_id,
                epoch_us(min(ts)) AS session_start_us,
                epoch_us(max(ts)) + 1800000000 AS session_end_us,
                count(*) AS n_events
         FROM sessions GROUP BY user_id, session_seq
         ORDER BY user_id, session_start_us""",
    "stream_enriched_join" ->
      """SELECT cast(date_trunc('day', ts) AS DATE) AS report_date, n_name,
                count(*) AS n_events
         FROM events JOIN nation ON n_nationkey = user_id % 25
         GROUP BY 1, 2 ORDER BY report_date, n_name""",
    "stream_stream_join" ->
      """SELECT c.user_id, count(*) AS n_pairs,
                count(DISTINCT p.event_id) AS n_purchases
         FROM events c JOIN events p
           ON p.user_id = c.user_id
          AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 DAY
         GROUP BY c.user_id ORDER BY c.user_id""",
    "stream_stream_outer_join" ->
      """SELECT c.user_id, count(*) AS n_rows,
                count(p.event_id) AS n_matched,
                count(*) FILTER (p.event_id IS NULL) AS n_unmatched
         FROM events c LEFT JOIN events p
           ON p.user_id = c.user_id
          AND p.event_type = 'purchase'
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 DAY
         WHERE c.event_type = 'click' AND c.user_id % 3 = 0
         GROUP BY c.user_id ORDER BY c.user_id""",
    "stream_sliding_window" ->
      """WITH x AS (SELECT cast(date_trunc('day', ts) AS DATE) AS d, event_type
                    FROM events),
         win AS (SELECT d AS window_start, event_type FROM x
                 UNION ALL
                 SELECT cast(d - INTERVAL 1 DAY AS DATE), event_type FROM x)
         SELECT window_start, event_type, count(*) AS n_events
         FROM win GROUP BY 1, 2 ORDER BY window_start, event_type""")
}
