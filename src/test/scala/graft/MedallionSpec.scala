package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Medallion

/** Durable-catalog surface (VERDICT r2 #1): the three medallion
  * databases exist, every model is a named queryable table, the gold
  * fact is date-partitioned, and a dropped catalog entry re-attaches
  * from the on-disk warehouse without recompute (the cross-session
  * durability half).
  */
class MedallionSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  private val dir = SparkTestBase.sfDir

  test("chain materializes bronze/silver/gold databases and all model tables") {
    Medallion.ensureMaterialized(spark, dir)
    Medallion.databases.foreach { db =>
      assert(spark.catalog.databaseExists(db), s"database $db missing")
    }
    Medallion.tables.foreach { case (db, t, _) =>
      assert(spark.catalog.tableExists(s"$db.$t"), s"$db.$t missing")
      assert(spark.table(s"$db.$t").count() > 0, s"$db.$t empty")
    }
  }

  test("gold.fct_properties is partitioned by date_key") {
    Medallion.ensureMaterialized(spark, dir)
    val parts = spark.sql("SHOW PARTITIONS gold.fct_properties").collect()
    assert(parts.length > 1, "expected multiple date_key partitions")
    assert(parts.head.getString(0).startsWith("date_key="))
  }

  test("register re-attaches dropped catalog entries from the warehouse") {
    Medallion.ensureMaterialized(spark, dir)
    val expected = spark.table("gold.fct_properties").count()
    Medallion.tables.foreach { case (db, t, _) =>
      spark.sql(s"DROP TABLE IF EXISTS $db.$t")
    }
    Medallion.register(spark, dir)
    assert(spark.table("gold.fct_properties").count() == expected)
    assert(spark.table("silver.stg_properties").count() > 0)
  }

  test("register re-points a catalog entry left at another location (wrong-SF guard)") {
    Medallion.ensureMaterialized(spark, dir)
    val expected = spark.table("gold.dim_locations").count()
    // Leave the entry pointing at a DIFFERENT model's location — the
    // shape of a session whose catalog outlived a SF switch.
    spark.sql("DROP TABLE IF EXISTS gold.dim_locations")
    val wrongLoc = Medallion.warehouseRoot(dir) + "/gold.db/dim_legal_status"
    spark.sql(s"CREATE TABLE gold.dim_locations USING PARQUET LOCATION '$wrongLoc'")
    assert(spark.table("gold.dim_locations").schema.fieldNames
      .contains("legal_status_id"), "precondition: entry serves wrong data")
    Medallion.register(spark, dir)
    assert(spark.table("gold.dim_locations").schema.fieldNames
      .contains("location_id"), "register must re-point the mismatched entry")
    assert(spark.table("gold.dim_locations").count() == expected)
  }

  test("re-materialization is idempotent under a second explicit build") {
    Medallion.ensureMaterialized(spark, dir)
    val before = spark.table("gold.dim_locations").count()
    // force a rebuild by pretending a different SF was current
    val m = Medallion.getClass.getDeclaredField("materializedSf")
    m.setAccessible(true)
    m.get(Medallion).asInstanceOf[java.util.concurrent.ConcurrentHashMap[String, String]]
      .clear()
    Medallion.ensureMaterialized(spark, dir)
    assert(spark.table("gold.dim_locations").count() == before)
  }
}
