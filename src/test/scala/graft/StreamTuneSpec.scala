package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamTune

/** Laws for the state-partition sizing policy: stateful operators pin
  * one state store per shuffle partition per store at first
  * checkpoint, so partition count must track STATE volume, floored to
  * keep multi-partition semantics exercised and capped at the
  * session's cluster-sized shuffle knob. */
class StreamTuneSpec extends AnyFunSuite {
  import SparkTestBase._

  private def withParts[A](n: Int)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("small state floors at minPartitions, huge state caps at session conf") {
    withParts(32) {
      assert(StreamTune.statePartitions(spark, 0L) == StreamTune.minPartitions)
      assert(StreamTune.statePartitions(spark, 10000L) == StreamTune.minPartitions)
      // 100 TB-scale estimate: caps at the session's shuffle knob
      assert(StreamTune.statePartitions(spark, 1000000000000L) == 32)
    }
  }

  test("monotone in state rows; scales with the session cap") {
    withParts(32) {
      val sizes = Seq(0L, 100000L, 500000L, 2000000L, 10000000L, 100000000L)
        .map(StreamTune.statePartitions(spark, _))
      assert(sizes == sizes.sorted, s"not monotone: $sizes")
      // one partition per ~targetRowsPerPartition in the linear region
      assert(StreamTune.statePartitions(spark, 2000000L) ==
        (2000000L / StreamTune.targetRowsPerPartition).toInt)
    }
    // a bigger cluster (higher shuffle conf) gets more state partitions
    // for the same huge estimate
    withParts(64) {
      assert(StreamTune.statePartitions(spark, 1000000000000L) == 64)
    }
  }

  test("withStatePartitions restores the session conf, even on failure") {
    withParts(32) {
      StreamTune.withStatePartitions(spark, 10L) {
        assert(spark.conf.get("spark.sql.shuffle.partitions").toInt ==
          StreamTune.minPartitions)
      }
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "32")
      intercept[RuntimeException] {
        StreamTune.withStatePartitions(spark, 10L)(sys.error("boom"))
      }
      assert(spark.conf.get("spark.sql.shuffle.partitions") == "32")
    }
  }

  test("eventRows matches the table and is cached per path") {
    val n = StreamTune.eventRows(spark, sfDir)
    assert(n == graft.sources.Tables.load(spark, sfDir, "events").count())
    assert(StreamTune.eventRows(spark, sfDir) == n)
  }

  test("a stateful query returns the same result under tuned and forced-32 state partitions") {
    import org.apache.spark.sql.functions._
    def run(): Seq[(Long, Long, Long, Long)] =
      graft.streaming.StreamingOps.sessionWindowCounts(spark, sfDir)
        .select(col("user_id"), col("session_start_us"),
          col("session_end_us"), col("n_events"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq.sorted
    // tuned path (events at sf0.001 → minPartitions) vs a session conf
    // so low the cap binds differently — results must be identical
    val tuned = withParts(32)(run())
    val capped = withParts(2)(run())
    assert(tuned == capped)
    assert(tuned.nonEmpty)
  }
}
