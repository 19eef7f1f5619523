package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TxLog

/** Nested-field audit across the metadata surface (VERDICT r12
  * next-round #6): every verb that takes a column NAME either
  * supports a struct table's `a.b` path or vetoes LOUDLY — a silent
  * top-level-only match on a struct table would corrupt metadata.
  * The reference has zero structs, so the contract here is
  * compose-or-fail-loudly, never silence. */
class TxLogNestedAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val base = "/tmp/graft_txnest/t"

  private def seed(): Unit = {
    TxLog.drop(spark, base)
    import spark.implicits._
    // a genuine struct column `s` with fields (x INT, label STRING)
    val df = Seq((1, 10, "a"), (2, 20, "b")).toDF("k", "x", "label")
      .select(col("k"), struct(col("x"), col("label")).as("s"))
    TxLog.commit(df, base, None, Some("k"))
  }

  test("struct tables READ fine (snapshot, evolved, time travel) — " +
    "nesting is a data shape, not a metadata feature") {
    seed()
    val snap = TxLog.read(spark, base)
    assert(snap.schema("s").dataType.isInstanceOf[StructType])
    assert(snap.select(col("k"), col("s.x")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet == Set((1, 10), (2, 20)))
    assert(TxLog.readEvolved(spark, base).count() == 2)
  }

  test("name-taking metadata verbs on a nested `s.x` reference: " +
    "RENAME/DROP ride the tier-2 nested mapping (TxLogNestedColmapSpec " +
    "holds their laws); everything else vetoes loudly — never a " +
    "silent top-level-only match") {
    seed()
    // RENAME/DROP of a nested path are REAL verbs since tier 2 —
    // metadata-only commits against the frozen physical subfield
    TxLog.renameColumn(spark, base, "s.x", "s.x2")
    assert(TxLog.read(spark, base).select(col("s.x2")).count() == 2)
    TxLog.renameColumn(spark, base, "s.x2", "x")
    // renaming a TOP-LEVEL column TO a dotted name stays rejected
    // (a flat column cannot move into a struct)
    assert(intercept[IllegalArgumentException] {
      TxLog.renameColumn(spark, base, "k", "s.k")
    }.getMessage.contains("invalid column name"))
    // WIDEN: not in the schema → loud
    assert(intercept[IllegalArgumentException] {
      TxLog.alterWidenColumn(spark, base, "s.x", LongType)
    }.getMessage.contains("not in the table schema"))
    // widening the struct column ITSELF is a cross-family change
    assert(intercept[IllegalArgumentException] {
      TxLog.alterWidenColumn(spark, base, "s", LongType)
    }.getMessage.contains("widenings"))
    // CLUSTER BY a nested LEAF is a real verb since r15
    // (TxLogNestedColmapSpec holds its laws); a MISSING dotted key and
    // the struct ITSELF (interleave type rule) stay loud
    assert(intercept[IllegalArgumentException] {
      TxLog.alterClusterBy(spark, base, Seq("s.nope", "k"))
    }.getMessage.contains("not in the table schema"))
    assert(intercept[IllegalArgumentException] {
      TxLog.alterClusterBy(spark, base, Seq("s", "k"))
    }.getMessage.contains("interleave"))
    // PARTITION: declared at birth — a dotted partition column fails
    // the CREATE, and a struct partition column fails the type rule
    assert(intercept[IllegalArgumentException] {
      TxLog.createTable(spark, "/tmp/graft_txnest/p1",
        StructType(Seq(StructField("k", IntegerType),
          StructField("s", StructType(Seq(StructField("x", IntegerType)))))),
        partitionCols = Seq("s.x"))
    }.getMessage.contains("not in the declared schema"))
    assert(intercept[IllegalArgumentException] {
      TxLog.createTable(spark, "/tmp/graft_txnest/p2",
        StructType(Seq(StructField("k", IntegerType),
          StructField("s", StructType(Seq(StructField("x", IntegerType)))))),
        partitionCols = Seq("s"))
    }.getMessage.contains("unsupported stats column type"))
    // IDENTITY assignment guard: a dotted name can never BE an
    // identity column, and declaring one is impossible (identity
    // columns are declared by top-level name); appendIdentity on a
    // dotted target fails the schema probe
    assert(intercept[Exception] {
      TxLog.appendIdentity(TxLog.read(spark, base).drop("k"), base, "s.id")
    }.getMessage.nonEmpty)
  }

  test("EXPRESSION surfaces legitimately reach INTO structs — CHECK " +
    "constraints and generated columns resolve `s.x` as Spark SQL " +
    "does, and enforcement stays row-accurate") {
    seed()
    // a CHECK constraint over a struct field: valid expression, and it
    // actually enforces (the expression surface speaks full Spark SQL)
    TxLog.addConstraint(spark, base, "x_pos", "s.x > 0")
    import spark.implicits._
    val bad = Seq((3, -5, "c")).toDF("k", "x", "label")
      .select(col("k"), struct(col("x"), col("label")).as("s"))
    val e = intercept[Exception] { TxLog.append(bad, base, Some("k")) }
    assert(e.getMessage.contains("x_pos"), e.getMessage)
    val ok = Seq((3, 5, "c")).toDF("k", "x", "label")
      .select(col("k"), struct(col("x"), col("label")).as("s"))
    TxLog.append(ok, base, Some("k"))
    assert(TxLog.read(spark, base).count() == 3)
    // a GENERATED column computed FROM a struct field validates at
    // DDL time and computes at write time
    val g = "/tmp/graft_txnest/gen"
    TxLog.drop(spark, g)
    TxLog.createTable(spark, g, StructType(Seq(
      StructField("k", IntegerType),
      StructField("s", StructType(Seq(StructField("x", IntegerType)))),
      StructField("x2", IntegerType))),
      generated = Seq("x2" -> "s.x * 2"))
    TxLog.append(Seq((1, 7)).toDF("k", "x")
      .select(col("k"), struct(col("x")).as("s")), g, Some("k"))
    assert(TxLog.read(spark, g).select("x2").head.getInt(0) == 14)
  }

  test("interaction (r13 next-round #4): DROP/RENAME of a PARENT " +
    "struct vetoes while a CHECK constraint or generated column " +
    "references a child path — `s.x` registers a dependency on `s`") {
    seed()
    import spark.implicits._
    TxLog.addConstraint(spark, base, "x_band", "s.x BETWEEN 0 AND 1000")
    val eDrop = intercept[Exception] { TxLog.dropColumn(spark, base, "s") }
    assert(eDrop.getMessage.contains("x_band"),
      s"dropping the parent must name the dependent constraint: " +
        eDrop.getMessage)
    val eRen = intercept[Exception] {
      TxLog.renameColumn(spark, base, "s", "t") }
    assert(eRen.getMessage.contains("x_band"), eRen.getMessage)
    TxLog.dropConstraint(spark, base, "x_band")
    // generated-from-nested creates the same parent dependency
    val g = "/tmp/graft_txnest/gen_dep"
    TxLog.drop(spark, g)
    TxLog.createTable(spark, g, StructType(Seq(
      StructField("k", IntegerType),
      StructField("s", StructType(Seq(StructField("x", IntegerType)))),
      StructField("x2", IntegerType))),
      generated = Seq("x2" -> "s.x * 2"))
    TxLog.append(Seq((1, 7)).toDF("k", "x")
      .select(col("k"), struct(col("x")).as("s")), g, Some("k"))
    val eGen = intercept[Exception] { TxLog.dropColumn(spark, g, "s") }
    assert(eGen.getMessage.contains("x2"),
      s"dropping the parent must name the derived column: ${eGen.getMessage}")
    // and after the CONSTRAINT drop above, the first table's parent
    // struct is free to go — the veto tracks live dependents only
    TxLog.dropColumn(spark, base, "s")
    assert(TxLog.readEvolved(spark, base).columns.map(_.toLowerCase)
      .toSet == Set("k"))
  }

  test("nested generated PARTITION column: a partition key GENERATED " +
    "from a struct path computes at write time, splits the layout, " +
    "and prunes reads — the full nested tier-1 composition") {
    import spark.implicits._
    val g = "/tmp/graft_txnest/gen_part"
    TxLog.drop(spark, g)
    TxLog.createTable(spark, g, StructType(Seq(
      StructField("k", IntegerType),
      StructField("s", StructType(Seq(
        StructField("x", IntegerType), StructField("label", StringType)))),
      StructField("band", IntegerType))),
      partitionCols = Seq("band"),
      generated = Seq("band" -> "cast(s.x / 100 as int)"))
    val rows = (1 to 300).map(i => (i, i, s"l$i"))
    TxLog.append(rows.toDF("k", "x", "label")
      .select(col("k"), struct(col("x"), col("label")).as("s")), g, Some("k"))
    val got = TxLog.read(spark, g)
    assert(got.count() == 300)
    assert(got.where("band = cast(s.x / 100 as int)").count() == 300,
      "the generated partition value must derive from the struct path")
    // partition pruning: a band predicate touches a strict subset of
    // the landed files
    val all = TxLog.manifest(spark, g,
      TxLog.latestVersion(spark, g).get)._1.size
    val pruned = TxLog.pruneRanges(spark, g, Seq(("band", 0, 0)))._1.size
    assert(pruned < all && pruned >= 1,
      s"band=0 must prune to a file subset: $pruned of $all")
  }
}
