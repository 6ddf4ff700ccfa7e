package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsofJoin, RangeJoin}

/** Edge semantics of the temporal joins that the DuckDB oracle rows
  * (asof_attribution / range_attribution) can't isolate: equal-time
  * inclusivity, tie-breaking among simultaneous right rows, strict
  * mode, tolerance nulling, and bucket-boundary correctness. */
class TemporalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(sec * 1000L)

  // left: (id, key, t)   right: (id, key, t)
  private val left = Seq(
    (100L, "a", ts(5)),   // equal-time right rows exist at t=5
    (101L, "a", ts(7)),
    (102L, "a", ts(0)),   // before every right row -> no match
    (103L, "b", ts(50)),  // key with no right rows
    (104L, "a", ts(1000)) // far after the last right row
  ).toDF("id", "k", "t")
  private val right = Seq(
    (1L, "a", ts(1)),
    (2L, "a", ts(5)),  // two right rows at the same (key, time):
    (3L, "a", ts(5)),  //   the greatest tie-break id (3) must win
    (4L, "a", ts(9))
  ).toDF("id", "k", "t")

  private def matches(df: org.apache.spark.sql.DataFrame): Map[Long, Option[Long]] =
    df.select(col("id"), col("asof_id")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap

  test("asof backward: inclusive equal-time match, max-tiebreak winner, null when no prior") {
    val out = AsofJoin.backward(left, right, "k", "k", "t", "t",
      rightPayload = Seq("id"), rightTieBreak = "id")
    assert(out.count() == left.count()) // left-join semantics: every left row kept
    val m = matches(out)
    assert(m(100L).contains(3L)) // t=5 matches the t=5 pair, greatest id wins
    assert(m(101L).contains(3L)) // t=7 still the t=5 pair
    assert(m(102L).isEmpty)      // nothing at or before t=0
    assert(m(103L).isEmpty)      // key with no right rows
    assert(m(104L).contains(4L)) // far future -> last right row
  }

  test("asof strict: equal-time right rows are excluded") {
    val out = AsofJoin.backward(left, right, "k", "k", "t", "t",
      rightPayload = Seq("id"), rightTieBreak = "id", strict = true)
    val m = matches(out)
    assert(m(100L).contains(1L)) // t=5 must skip the t=5 pair -> t=1 row
    assert(m(101L).contains(3L)) // t=7 unaffected
  }

  test("asof tolerance: stale matches null out, rows are kept") {
    val out = AsofJoin.backward(left, right, "k", "k", "t", "t",
      rightPayload = Seq("id"), rightTieBreak = "id",
      tolerance = Some(expr("INTERVAL 10 SECONDS")))
    assert(out.count() == left.count())
    val m = matches(out)
    assert(m(100L).contains(3L)) // gap 0 <= 10s
    assert(m(104L).isEmpty)      // t=1000 vs t=9: beyond tolerance -> nulled
  }

  test("asof NULL keys follow equi-join semantics: null-key rows never match each other") {
    val l = Seq((1L, Some("a"), Some(ts(10))), (2L, None, Some(ts(10))),
      (3L, Some("a"), None)).toDF("id", "k", "t")
    val r = Seq((10L, Some("a"), Some(ts(5))), (11L, None, Some(ts(5))),
      (12L, Some("a"), None)).toDF("id", "k", "t")
    val m = matches(AsofJoin.backward(l, r, "k", "k", "t", "t",
      rightPayload = Seq("id"), rightTieBreak = "id"))
    assert(m.size == 3, "left-join semantics: all left rows kept")
    assert(m(1L).contains(10L)) // normal match; null-time right row 12 ignored
    assert(m(2L).isEmpty, "null-key left row must not match null-key right rows")
    assert(m(3L).isEmpty, "null-time left row gets no match")
  }

  test("asof matches a brute-force per-row computation on random data") {
    val rnd = new scala.util.Random(42)
    val l = (0 until 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(8)}", ts(rnd.nextInt(500).toLong))).toDF("id", "k", "t")
    val r = (0 until 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(10)}", ts(rnd.nextInt(500).toLong))).toDF("id", "k", "t")
    val got = matches(AsofJoin.backward(l, r, "k", "k", "t", "t",
      rightPayload = Seq("id"), rightTieBreak = "id"))
    val rRows = r.collect().map(x => (x.getLong(0), x.getString(1), x.getTimestamp(2)))
    val want = l.collect().map { x =>
      val cands = rRows.filter(c => c._2 == x.getString(1) && !c._3.after(x.getTimestamp(2)))
      x.getLong(0) -> (if (cands.isEmpty) None
                       else Some(cands.maxBy(c => (c._3.getTime, c._1))._1))
    }.toMap
    assert(got == want)
  }

  test("range join equals naive key-join + range filter, across bucket sizes") {
    val rnd = new scala.util.Random(7)
    val l = (0 until 200).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", ts(rnd.nextInt(400).toLong))).toDF("id", "k", "t")
    val r = (0 until 200).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", ts(rnd.nextInt(400).toLong))).toDF("id", "k", "t")
    val naive = l.as("l").join(r.as("r"),
        col("l.k") === col("r.k") &&
        col("r.t") >= col("l.t") - expr("INTERVAL 30 SECONDS") &&
        col("r.t") <= col("l.t"))
      .select(col("l.id"), col("r.id")).collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    for (bucket <- Seq(7L, 30L, 100L)) { // smaller, equal, larger than lookback
      val got = RangeJoin.pointsInLookback(l, r, "k", "k", "t", "t",
          rightPayload = Seq("id"), lookbackSec = 30L, bucketSec = bucket)
        .select(col("id"), col("range_id")).collect()
        .map(x => (x.getLong(0), x.getLong(1)))
      assert(got.length == got.toSet.size, s"bucket=$bucket produced duplicate pairs")
      assert(got.toSet == naive, s"bucket=$bucket diverged from naive join")
    }
    assert(naive.nonEmpty)
  }

  test("streaming as-of enrichment against a static snapshot equals the batch join") {
    import graft.streaming.StreamOps
    val sfDir = "/root/testdata/sf0.001"
    // stream the events fixture; enrich purchases with the latest prior
    // click from the STATIC click snapshot (stream-static temporal join)
    val ev = Tables(spark, sfDir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val collected = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
    val stream = StreamOps.readEventsStream(spark, sfDir,
        globFilter = Some("events.parquet"))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val q = StreamOps.asofEnrichPerBatch(stream, clicks,
      "user_id", "user_id", "ts", "ts",
      rightPayload = Seq("event_id"), rightTieBreak = "event_id") { (out, _) =>
      collected ++= out.select(col("event_id"), col("asof_event_id")).collect()
        .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long]))
    }
    try q.processAllAvailable() finally q.stop()
    val batch = AsofJoin.backward(
        ev.where(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts")),
        clicks, "user_id", "user_id", "ts", "ts",
        rightPayload = Seq("event_id"), rightTieBreak = "event_id")
      .select(col("event_id"), col("asof_event_id")).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(collected.nonEmpty && collected.toMap == batch)
  }

  test("range join boundary: both interval endpoints are inclusive, outside excluded") {
    val l = Seq((1L, "a", ts(100))).toDF("id", "k", "t")
    val r = Seq((10L, "a", ts(70)),  // exactly t - lookback -> included
                (11L, "a", ts(100)), // exactly t -> included
                (12L, "a", ts(69)),  // one second early -> excluded
                (13L, "a", ts(101)), // after t -> excluded
                (14L, "b", ts(90))   // wrong key -> excluded
    ).toDF("id", "k", "t")
    val got = RangeJoin.pointsInLookback(l, r, "k", "k", "t", "t",
        rightPayload = Seq("id"), lookbackSec = 30L, bucketSec = 10L)
      .select(col("range_id")).collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 11L))
  }
}
