package graft.models

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.Dedup

/** The reference's medallion model chain (SURVEY §2.8, §7.3),
  * re-expressed Spark-first and re-targeted onto the harness star
  * schema: a synthetic "raw listings" feed derived deterministically
  * from orders⋈customer⋈nation⋈region stands in for the crawled
  * Vietnamese real-estate records (ASCII-safe per SURVEY §7.4), then
  * the faithful silver cleaning transform
  * (dbt/models/staging/stg_properties.sql:34-102), star-schema dims
  * (dim_locations.sql, dim_legal_status.sql), the central fact
  * (fct_properties.sql), the daily pre-aggregate
  * (fct_daily_summary.sql) and the data-quality window report
  * (fct_data_quality_report.sql).
  *
  * Scale shape: the raw build is fact⋈3 small dims (all
  * auto-broadcast); silver is a pure narrow projection (no shuffle);
  * facts shuffle once on the dedup key; dims are tiny and broadcast
  * into the fact join. Every expression is a built-in (codegen'd).
  */
object RealEstate {

  /** Synthetic raw listing feed — deterministic in the input keys.
    * price_raw reproduces the reference's messy Vietnamese price
    * strings ("5,2 tỷ" / "5200 triệu" / "thỏa thuận") in ASCII. */
  def rawListings(orders: DataFrame, customer: DataFrame,
                  nation: DataFrame, region: DataFrame): DataFrame = {
    val pi = (floor(col("o_totalprice")).cast("long") % 900 + 1).cast("string")
    val pd = (col("o_orderkey") % 10).cast("string")
    val piTrieu = ((floor(col("o_totalprice")).cast("long") % 900 + 1) * 1000 +
      (col("o_orderkey") % 10) * 100).cast("string")
    graft.sources.Tables.scaled(orders)
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("o_orderkey").cast("string").as("listing_id"),
        concat(lit("  "), col("c_mktsegment"), lit(" HOUSE "),
          (col("o_orderkey") % 50).cast("string"), lit("  ")).as("title_raw"),
        when(col("o_orderkey") % 4 === 0, concat(pi, lit(","), pd, lit(" ty")))
          .when(col("o_orderkey") % 4 === 1, concat(piTrieu, lit(" trieu")))
          .when(col("o_orderkey") % 4 === 2, lit("thoa thuan"))
          .otherwise(concat(pi, lit("."), pd, lit(" ty"))).as("price_raw"),
        when(col("o_custkey") % 5 === 4, lit("unknown"))
          .otherwise(concat((col("o_custkey") % 300 + 10).cast("string"), lit(" m2")))
          .as("area_raw"),
        concat((col("o_orderkey") % 5 + 1).cast("string"), lit(" floors")).as("floors_raw"),
        concat(col("c_name"), lit(", "), col("n_name"), lit(", "), col("r_name"))
          .as("address_raw"),
        when(col("o_orderkey") % 11 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")).as("legal_raw"),
        col("o_orderdate").as("updated_at_ts"))
  }

  /** The silver cleaning transform — faithful port of
    * stg_properties.sql:34-102: regex numeric extraction,
    * decimal-comma fix, multi-branch CASE price normalization,
    * whitespace/case normalization, address tail-split, quality flag.
    * Lenient parses use try_cast (ANSI-safe, SURVEY §7.1). */
  def silver(raw: DataFrame): DataFrame = {
    val priceNum = try_to_number_like(col("price_raw"))
    val address = TextFns.normWs(col("address_raw"))
    val parts = split(address, ",")
    raw.select(
      md5(col("listing_id")).as("property_id"),
      lower(TextFns.normWs(col("title_raw"))).as("title"),
      when(lower(col("price_raw")).like("%trieu%"), priceNum / 1000.0)
        .when(lower(col("price_raw")).like("%thoa thuan%") ||
          lower(col("price_raw")).like("%lien he%"), lit(null).cast("double"))
        .when(lower(col("price_raw")).like("%ty%"), priceNum)
        .otherwise(lit(null).cast("double")).as("price_in_billions"),
      try_cast_double(regexp_extract(col("area_raw"), "([0-9]+)", 1)).as("area"),
      try_cast_double(regexp_extract(col("floors_raw"), "([0-9]+)", 1))
        .cast("int").as("floors"),
      address.as("address"),
      trim(element_at(parts, -3)).as("ward"),
      trim(element_at(parts, -2)).as("district"),
      trim(element_at(parts, -1)).as("province"),
      col("legal_raw").as("legal_status"),
      col("updated_at_ts"),
      date_trunc("day", col("updated_at_ts")).cast("date").as("date_key"),
      when(col("address_raw").isNull || trim(col("address_raw")) === "", "MISSING_ADDRESS")
        .when(
          when(lower(col("price_raw")).like("%trieu%"), priceNum / 1000.0)
            .when(lower(col("price_raw")).like("%thoa thuan%") ||
              lower(col("price_raw")).like("%lien he%"), lit(null).cast("double"))
            .when(lower(col("price_raw")).like("%ty%"), priceNum)
            .otherwise(lit(null).cast("double")).isNull, "MISSING_PRICE")
        .when(try_cast_double(regexp_extract(col("area_raw"), "([0-9]+)", 1)).isNull ||
          try_cast_double(regexp_extract(col("area_raw"), "([0-9]+)", 1)) <= 0,
          "INVALID_AREA")
        .otherwise("VALID").as("data_quality_flag"))
  }

  private def try_cast_double(c: Column): Column =
    c.try_cast("double") // lenient: garbage -> NULL (ANSI-safe, SURVEY §7.1)

  /** Fully-diacritic raw feed — the reference crawl's ACTUAL shape
    * (unicode price strings, separate ward/district/province fields,
    * Vietnamese floor counts, legal statuses needing initcap),
    * deterministic in the harness keys so the DuckDB oracle rebuilds
    * it from the same tables. Together with [[silverUnicode]] this is
    * the end-to-end unicode twin of the ASCII-safe chain above. */
  def rawListingsUnicode(orders: DataFrame, customer: DataFrame,
                         nation: DataFrame, region: DataFrame): DataFrame = {
    val pi = (floor(col("o_totalprice")).cast("long") % 900 + 1).cast("string")
    val pd = (col("o_orderkey") % 10).cast("string")
    val piTrieu = ((floor(col("o_totalprice")).cast("long") % 900 + 1) * 1000 +
      (col("o_orderkey") % 10) * 100).cast("string")
    val tySuffix = when(col("o_orderkey") % 2 === 0, " tỷ").otherwise(" TỶ")
    graft.sources.Tables.scaled(orders)
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("o_orderkey").cast("string").as("listing_id"),
        concat(lit("  nhà "), col("c_mktsegment"), lit("   số "),
          (col("o_orderkey") % 50).cast("string"), lit("  ")).as("title_raw"),
        when(col("o_orderkey") % 5 === 0, concat(pi, lit(","), pd, tySuffix))
          .when(col("o_orderkey") % 5 === 1, concat(piTrieu, lit(" triệu")))
          .when(col("o_orderkey") % 5 === 2, lit("Thỏa thuận"))
          .when(col("o_orderkey") % 5 === 3, lit("Liên hệ"))
          .otherwise(concat(pi, lit("."), pd)).as("price_raw"),
        when(col("o_custkey") % 7 === 6, lit(null).cast("string"))
          .otherwise(concat((col("o_custkey") % 300 + 10).cast("string"),
            lit(" m²"))).as("area_raw"),
        concat((col("o_orderkey") % 5 + 1).cast("string"), lit(" tầng"))
          .as("floors_raw"),
        concat(lit("  số "), (col("o_custkey") % 99 + 1).cast("string"),
          lit("   đường "), col("c_name"), lit(",  "), col("n_name"),
          lit("  ")).as("address_raw"),
        concat(lit("phường   BẾN "), col("n_name")).as("ward_raw"),
        concat(lit("QUẬN "), (col("o_custkey") % 12 + 1).cast("string"))
          .as("district_raw"),
        when(col("c_nationkey") % 2 === 0, "THÀNH PHỐ hồ chí minh")
          .otherwise("hà nội").as("province_raw"),
        when(col("o_orderkey") % 11 === 0, lit(null).cast("string"))
          .otherwise(when(col("o_custkey") % 7 === 0, "sổ đỏ chính chủ")
            .when(col("o_custkey") % 7 === 1, "đã có sổ hồng")
            .when(col("o_custkey") % 7 === 2, "sổ riêng từng căn")
            .when(col("o_custkey") % 7 === 3, "đang chờ cấp sổ")
            .when(col("o_custkey") % 7 === 4, " giấy tờ viết tay ")
            .otherwise("hợp đồng mua bán")).as("legal_raw"),
        col("o_orderdate").as("updated_at_ts"))
  }

  /** The silver transform with the reference's LITERAL unicode
    * semantics, expression for expression (stg_properties.sql:34-102):
    * the price CASE in the reference's branch order (tỷ → triệu →
    * thỏa thuận/liên hệ → else PARSES the bare number), diacritic
    * `initcap(trim(regexp_replace(x,'\s+',' ')))` over address/ward/
    * district/province, `initcap(trim(...))` over legal_status, and
    * the reference's quality-flag branch order (price first). */
  def silverUnicode(raw: DataFrame): DataFrame = {
    def normInitcap(c: Column): Column =
      initcap(trim(regexp_replace(c, "\\s+", " ")))
    val num = try_to_number_like(col("price_raw"))
    raw.select(
      md5(col("listing_id")).as("property_id"),
      normInitcap(col("title_raw")).as("title"),
      when(lower(col("price_raw")).like("%tỷ%"), num)
        .when(lower(col("price_raw")).like("%triệu%"), num / 1000.0)
        .when(lower(col("price_raw")).like("%thỏa thuận%") ||
          lower(col("price_raw")).like("%liên hệ%"), lit(null).cast("double"))
        .otherwise(num).as("price_in_billions"),
      try_cast_double(regexp_replace(
        regexp_extract(col("area_raw"), "([0-9][0-9,\\.]*)", 1), ",", "."))
        .as("area"),
      regexp_extract(col("floors_raw"), "([0-9]+)", 1).try_cast("int")
        .as("floors"),
      normInitcap(col("address_raw")).as("address"),
      normInitcap(col("ward_raw")).as("ward"),
      normInitcap(col("district_raw")).as("district"),
      normInitcap(col("province_raw")).as("province"),
      initcap(trim(col("legal_raw"))).as("legal_status"),
      col("updated_at_ts"),
      date_trunc("day", col("updated_at_ts")).cast("date").as("date_key"),
      when(col("price_raw").isNull ||
        lower(col("price_raw")).like("%thỏa thuận%") ||
        lower(col("price_raw")).like("%liên hệ%"), "MISSING_PRICE")
        .when(col("address_raw").isNull || trim(col("address_raw")) === "",
          "MISSING_ADDRESS")
        .otherwise("VALID").as("data_quality_flag"))
  }

  /** Numeric token out of a messy price string: first `[0-9][0-9,.]*`
    * run, decimal-comma fixed (stg_properties.sql:45-47,63-84). */
  private def try_to_number_like(c: Column): Column =
    regexp_replace(
      regexp_extract(c, "([0-9][0-9,\\.]*)", 1), ",", ".").try_cast("double")

  /** dim_locations (dim_locations.sql:30-71): group-dedup on the
    * address grain + md5 surrogate (portable across engines, unlike
    * Murmur3 `hash()` — SURVEY §7.4) + region CASE classifier. */
  def dimLocations(silver: DataFrame): DataFrame =
    silver.where(col("address").isNotNull)
      .select("address", "ward", "district", "province").distinct()
      .select(
        md5(col("address")).as("location_id"),
        col("address").as("full_address"),
        col("ward"), col("district"), col("province"),
        when(col("province") === "ASIA", "Region East")
          .when(col("province") === "EUROPE", "Region West")
          .when(col("province") === "AMERICA", "Region North")
          .when(col("province") === "AFRICA", "Region South")
          .otherwise("Region Unknown").as("region"))

  /** dim_legal_status (dim_legal_status.sql:13-52): distinct statuses
    * UNION a default 'UNKNOWN' row (deliberately UNION-distinct, U1),
    * md5 surrogate, CASE categorizer. */
  def dimLegalStatus(silver: DataFrame): DataFrame =
    silver.where(col("legal_status").isNotNull)
      .select(col("legal_status")).distinct()
      .union(silver.sparkSession.range(1).select(lit("UNKNOWN").as("legal_status")))
      .distinct()
      .select(
        md5(col("legal_status")).as("legal_status_id"),
        col("legal_status"),
        when(col("legal_status").like("%URGENT%") ||
          col("legal_status").like("%HIGH%"), "expedited")
          .when(col("legal_status").like("%MEDIUM%"), "standard")
          .otherwise("basic").as("legal_status_category"),
        concat(lit("status: "), col("legal_status")).as("description"))

  /** dim_properties (dim_properties.sql:13-75): latest-record dedup
    * per property, carrying the SCD-2-shaped columns the reference
    * keeps on an SCD-1 dim (valid_from, always-NULL valid_to,
    * is_current=true). */
  def dimProperties(silver: DataFrame): DataFrame =
    Dedup.latestByKey(silver, Seq("property_id"),
        Seq(col("updated_at_ts").desc, col("address").desc))
      .select(
        col("property_id"), col("title"), col("area"), col("floors"),
        col("legal_status"),
        col("updated_at_ts"),
        col("updated_at_ts").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"),
        lit(true).as("is_current"))

  /** fct_properties (fct_properties.sql:27-94): quality + outlier
    * filters, latest-record dedup, the two dim joins (incl. the
    * coalesce-keyed legal-status join, J2), derived price_per_m2. */
  def fctProperties(silver: DataFrame, dimLoc: DataFrame, dimLegal: DataFrame): DataFrame = {
    val filtered = silver
      .where(col("data_quality_flag") === "VALID")
      .where(col("price_in_billions") > 0 && col("price_in_billions") < 1000)
      .where(col("area").isNull || (col("area") > 0 && col("area") < 10000))
    val deduped = Dedup.latestByKey(filtered, Seq("property_id"),
      Seq(col("updated_at_ts").desc, col("address").desc))
    // Dims are small by construction (distinct addresses / statuses);
    // hint broadcast explicitly — planning happens before the cached
    // silver is materialized, so size estimates would pick SMJ.
    deduped.as("f")
      .join(broadcast(dimLoc.as("l")), col("f.address") === col("l.full_address"))
      .join(broadcast(dimLegal.as("dl")),
        coalesce(col("f.legal_status"), lit("UNKNOWN")) === col("dl.legal_status"))
      .select(
        col("f.property_id"), col("l.location_id"), col("dl.legal_status_id"),
        col("f.date_key"), col("f.price_in_billions"), col("f.area"),
        round(col("f.price_in_billions") * 1000 / col("f.area"), 6)
          .as("price_per_m2_millions"),
        col("f.floors"), col("f.title"), col("l.region"),
        col("dl.legal_status_category"), col("f.updated_at_ts"))
  }

  /** fct_daily_summary (fct_daily_summary.sql:15-39): full-recompute
    * daily aggregate. Sums go through exact decimal arithmetic and a
    * single final cast to double so partial-aggregation order cannot
    * perturb the result (engine-portable bit-for-bit). */
  def fctDailySummary(fct: DataFrame): DataFrame =
    fct.groupBy(col("date_key"))
      .agg(
        countDistinct(col("property_id")).as("total_new_listings"),
        count(lit(1)).as("n_rows"),
        sum(col("price_in_billions").cast("decimal(18,6)")).cast("double")
          .as("total_value_listed_billions"),
        (sum(col("price_per_m2_millions").cast("decimal(18,6)")) * 1000000)
          .cast("long").as("__ppm_units"),
        count(col("price_per_m2_millions")).as("__n_ppm"),
        min(col("price_per_m2_millions")).as("min_price_per_m2_millions"),
        max(col("price_per_m2_millions")).as("max_price_per_m2_millions"),
        (sum(col("area").cast("decimal(18,6)")) * 1000000)
          .cast("long").as("__area_units"),
        count(col("area")).as("__n_area"),
        count(col("floors")).as("properties_with_floor_info"))
      // Averages via exact integer half-up division in micro-units:
      // round(sum/count, 6) on doubles is engine-ambiguous exactly when
      // the true quotient lands on a half boundary (frequent when the
      // inputs are themselves 6-decimal values); integer arithmetic is
      // bit-identical everywhere.
      .withColumn("avg_price_per_m2_millions",
        when(col("__n_ppm") > 0,
          expr("cast((2 * __ppm_units + __n_ppm) div (2 * __n_ppm) as double) / 1000000.0"))
          .otherwise(lit(null).cast("double")))
      .withColumn("avg_area",
        when(col("__n_area") > 0,
          expr("cast((2 * __area_units + __n_area) div (2 * __n_area) as double) / 1000000.0"))
          .otherwise(lit(null).cast("double")))
      .drop("__ppm_units", "__n_ppm", "__area_units", "__n_area")
      .orderBy(col("date_key").desc)

  /** fct_data_quality_report (fct_data_quality_report.sql:5-13):
    * aggregate + percentage-of-total window (A7+A8+W2). */
  def dataQualityReport(silver: DataFrame): DataFrame = {
    val agg = silver.groupBy(col("date_key").as("report_date"), col("data_quality_flag"))
      .agg(count(lit(1)).as("record_count"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("report_date")
    agg.withColumn("__total", sum(col("record_count")).over(w))
      // exact integer half-up percentage (see fctDailySummary note)
      .withColumn("percentage",
        expr("cast((2 * 100000000 * record_count + __total) div (2 * __total) as double) / 1000000.0"))
      .drop("__total")
      .orderBy(col("report_date").desc, col("data_quality_flag"))
  }
}
