package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Bucketing demo: two tables bucketed on the join key join WITHOUT a
 * shuffle — the pre-partitioning technique for repeated fact-to-fact
 * joins at corpus scale (SURVEY §1.5 / the build brief's "bucketing for
 * co-located joins"). On 100 TB this is the difference between
 * re-shuffling the corpus per join and never shuffling it at all.
 */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed tables join with zero shuffle exchanges; plain tables shuffle") {
    val sf = "/root/testdata/sf0.001"
    val li = Tables(spark, sf, "lineitem")
    val o = Tables(spark, sf, "orders")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      o.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("o_bucketed")

      val bucketed = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      val bucketedPlan = bucketed.queryExecution.executedPlan.toString
      assert(!bucketedPlan.contains("Exchange hashpartitioning(l_orderkey") &&
        !bucketedPlan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle the join keys:\n$bucketedPlan")

      val plain = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(sum(col("l_quantity")).as("q"))
      val plainPlan = plain.queryExecution.executedPlan.toString
      assert(plainPlan.contains("Exchange hashpartitioning"),
        "control: the unbucketed join should shuffle")

      // and of course the results agree
      val a = bucketed.collect().map(r => r.getString(0) -> math.round(r.getDouble(1))).toMap
      val b = plain.collect().map(r => r.getString(0) -> math.round(r.getDouble(1))).toMap
      assert(a == b)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
