package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's bronze column-normalization pass, literally: the
  * full Vietnamese→English rename map, the explicit drop-list, the
  * auto-name fallback for unmapped columns, first-occurrence
  * duplicate collapse, and the latest-wins dedup by listing id
  * (scripts/normalize_bronze_columns.py:11-50 COLUMN_MAPPING,
  * :88-121 skip/auto/collapse, :125-129 dedup window).
  *
  * [[graft.sources.Ingest.sanitizeColumns]] is the generic sanitizer
  * mechanism (P1's companion); this object is the reference's exact
  * production map + policy. One aliased select applies every rename
  * at once — a single projection node, no chained withColumnRenamed
  * (which would build 38 nested projections for the analyzer to
  * collapse).
  */
object RenameMap {

  /** normalize_bronze_columns.py:11-50, verbatim order. */
  val columnMapping: Seq[(String, String)] = Seq(
    "list_id" -> "list_id",
    "title" -> "title",
    "price" -> "price",
    "Giá_m²" -> "price_per_m2_raw",
    "images" -> "images",
    "file_modification_time" -> "file_modification_time",
    "Diện tích đất" -> "land_area_raw",
    "Diện tích" -> "area_raw",
    "Diện tích sử dụng" -> "usable_area_raw",
    "Chiều ngang" -> "frontage_raw",
    "Chiều dài" -> "length_raw",
    "Tổng số tầng" -> "total_floors_raw",
    "Tầng số" -> "floor_number_raw",
    "Số phòng ngủ" -> "bedrooms_raw",
    "Số phòng vệ sinh" -> "bathrooms_raw",
    "Giấy tờ pháp lý" -> "legal_status_raw",
    "Tình trạng" -> "status_raw",
    "Tình trạng bất động sản" -> "property_status_raw",
    "Tình trạng nội thất" -> "furniture_status_raw",
    "Hướng cửa chính" -> "house_direction_raw",
    "Hướng ban công" -> "balcony_direction_raw",
    "Hướng đất" -> "land_direction_raw",
    "Nội thất" -> "furniture_raw",
    "Căn góc" -> "corner_unit_raw",
    "Đặc điểm nhà/đất" -> "property_features_raw",
    "Địa chỉ" -> "address",
    "Phường, thị xã, thị trấn" -> "ward_raw",
    "Quận, Huyện" -> "district_raw",
    "Tỉnh, thành phố" -> "province_raw",
    "Loại hình căn hộ" -> "apartment_type_raw",
    "Loại hình nhà ở" -> "house_type_raw",
    "Loại hình đất" -> "land_type_raw",
    "Loại hình văn phòng" -> "office_type_raw",
    "Mã căn" -> "unit_code_raw",
    "Tên phân khu" -> "subdivision_name_raw",
    "Tên phân khu/lô" -> "subdivision_lot_raw",
    "Số tiền cọc" -> "deposit_amount_raw",
    "Đơn vị (m2/hecta)" -> "unit_measurement_raw")

  /** SKIP_COLUMNS (normalize_bronze_columns.py:88): the raw crawler
    * `address` column is dropped outright — the canonical `address`
    * comes from the mapped `Địa chỉ`. */
  val skipColumns: Set[String] = Set("address")

  /** Auto-generated safe name for columns absent from the map
    * (normalize_bronze_columns.py:108): the reference's exact four
    * replacements, in order, then lowercase. */
  def autoName(c: String): String =
    c.replace(" ", "_").replace(",", "").replace(".", "").replace("/", "_")
      .toLowerCase

  /** Apply skip-list + mapping/auto-name + first-occurrence duplicate
    * collapse as ONE aliased select (py:110-122). */
  def normalize(df: DataFrame): DataFrame = {
    val mapping = columnMapping.toMap
    val used = scala.collection.mutable.HashSet[String]()
    // Resolve source columns POSITIONALLY (rename all to __c<i> first):
    // messy bronze names can collide under Spark's case-insensitive
    // resolution (price vs PRICE → AMBIGUOUS_REFERENCE) or repeat
    // outright; position is unambiguous and keeps the reference's
    // "first occurrence wins" order. Both projections collapse into
    // one node in the optimized plan.
    val tmp = df.toDF(df.columns.indices.map(i => s"__c$i"): _*)
    val exprs: Seq[Column] = df.columns.toSeq.zipWithIndex.flatMap { case (old, i) =>
      if (skipColumns.contains(old)) None
      else {
        val nn = mapping.getOrElse(old, autoName(old))
        if (used.add(nn)) Some(col(s"__c$i").as(nn)) else None
      }
    }
    tmp.select(exprs: _*)
  }

  /** normalize + the reference's latest-wins dedup: one row per
    * `list_id`, newest `file_modification_time` kept (py:125-129).
    * Shuffles once on list_id — the W1 pattern. */
  def normalizeDedup(df: DataFrame,
                     idCol: String = "list_id",
                     tsCol: String = "file_modification_time"): DataFrame = {
    val n = normalize(df)
    val w = Window.partitionBy(col(idCol)).orderBy(col(tsCol).desc)
    n.withColumn("_row_num", row_number().over(w))
      .where(col("_row_num") === 1)
      .drop("_row_num")
  }

  /** Deterministic messy-bronze synthesizer over `orders`: every
    * mapped source column (Vietnamese names included), plus the three
    * policy exercisers — a raw `address` (must be dropped), an
    * unmapped `Extra Field, v1.2/beta` (auto-name hits all four
    * replacement rules), and a trailing `PRICE` whose auto-name
    * collides with the mapped `price` (must collapse to the first
    * occurrence). list_id repeats (o_orderkey % 50) with a unique
    * file_modification_time so the dedup window has real work. */
  def syntheticBronze(orders: DataFrame): DataFrame = {
    val k = col("o_orderkey")
    val cols: Seq[Column] = columnMapping.zipWithIndex.map {
      case (("list_id", _), _)               => (k % 50).as("list_id")
      case (("file_modification_time", _), _) => k.as("file_modification_time")
      case ((src, _), i) => (k % (i + 2)).cast("string").as(src)
    } ++ Seq(
      lit("to-be-dropped").as("address"),
      (k % 41).cast("string").as("Extra Field, v1.2/beta"),
      lit("shadowed-duplicate").as("PRICE"))
    orders.select(cols: _*)
  }

  /** DuckDB twin of normalizeDedup∘syntheticBronze — generated from
    * the SAME mapping so output names can never drift. Only the
    * post-rename (all-ASCII) names reach SQL. */
  def syntheticOracleSql: String = {
    val valueCols = columnMapping.zipWithIndex.map {
      case (("list_id", _), _)               => "o_orderkey % 50 AS list_id"
      case (("file_modification_time", _), _) => "o_orderkey AS file_modification_time"
      case ((_, tgt), i) => s"cast(o_orderkey % ${i + 2} AS VARCHAR) AS $tgt"
    } :+ "cast(o_orderkey % 41 AS VARCHAR) AS extra_field_v12_beta"
    val finalCols = (columnMapping.map(_._2) :+ "extra_field_v12_beta").mkString(", ")
    s"""WITH src AS (SELECT ${valueCols.mkString(", ")} FROM orders),
        keep AS (SELECT *, row_number() OVER (PARTITION BY list_id
                   ORDER BY file_modification_time DESC) AS _rn FROM src)
        SELECT $finalCols FROM keep WHERE _rn = 1 ORDER BY list_id"""
  }
}
