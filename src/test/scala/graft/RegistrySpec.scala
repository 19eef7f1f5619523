package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{RegistryCore, RegistryExtra, RegistryGold, RegistryIngest, RegistryLlm, RegistryMaint, RegistryMaintDml, RegistryMaintSchema, RegistryMaintStream, RegistryTx}

class RegistrySpec extends AnyFunSuite {

  private val groups = Seq(
    "core" -> RegistryCore.defs.keySet,
    "ingest" -> RegistryIngest.defs.keySet,
    "gold" -> RegistryGold.defs.keySet,
    "llm" -> RegistryLlm.defs.keySet,
    "extra" -> RegistryExtra.defs.keySet,
    "maint" -> RegistryMaint.defs.keySet,
    "maint_dml" -> RegistryMaintDml.defs.keySet,
    "maint_schema" -> RegistryMaintSchema.defs.keySet,
    "maint_stream" -> RegistryMaintStream.defs.keySet,
    "tx" -> RegistryTx.allDefs.keySet)

  test("query names are unique across registries (no Map ++ shadowing)") {
    val all = groups.flatMap(_._2.toSeq)
    val dupes = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    assert(SparkEntry.queries.size == all.size)
  }

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("rows-only queries are the documented engine-hash exceptions only") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("f5_hash_mod_key", "a5_approx_distinct"),
      s"unexpected rows-only set: $rowsOnly")
  }
}
