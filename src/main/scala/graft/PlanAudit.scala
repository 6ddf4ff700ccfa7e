package graft

import org.apache.spark.sql.SparkSession

/**
 * Physical-plan audit: dumps `explain("formatted")` for the headline
 * queries and flags the scale-critical properties — filter/projection
 * pushdown into the parquet scan, broadcast joins for dimensions,
 * `TakeOrderedAndProject` for top-k (no global sort), and any exchange
 * that shouldn't be there. Run: `sbt "runMain graft.PlanAudit [sfDir]"`.
 */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val audited = Seq("nearest_cosine", "simjoin_knn", "q3_join", "q5_join",
      "keyword_search", "dedup_jaccard", "neardup_embedding", "events_hourly",
      "dsir_score_hashed", "pack_hist")
    audited.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count() // materialize so AQE finalizes and codegen ids appear
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      println(s"\n========== $name ==========")
      println(plan)
      val markers = Seq(
        "PushedFilters" -> plan.contains("PushedFilters: ["),
        "TakeOrderedAndProject" -> plan.contains("TakeOrderedAndProject"),
        "BroadcastHashJoin/BNLJ" -> (plan.contains("BroadcastHashJoin") ||
          plan.contains("BroadcastNestedLoopJoin")),
        "WholeStageCodegen" -> (plan.contains("codegen id") ||
          plan.contains("WholeStageCodegen")))
      println(markers.map { case (k, v) => s"$k=$v" }.mkString("[markers] ", " ", ""))
      println(s"[exchanges] ${plan.linesIterator.count(_.contains("Exchange"))}")
    }
    spark.stop()
  }
}
