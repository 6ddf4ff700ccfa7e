package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_ONLY=name1,name2 restricts the run — for iterating on
    // one query's plan without paying for the whole suite
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.map(o => SparkEntry.queries.filter(kv => o(kv._1)))
      .getOrElse(SparkEntry.queries)
    // Warm the JVM/codegen/parquet paths once so the first timed query
    // isn't charged several seconds of one-time startup cost, and —
    // only when an ann_ivf_* query is selected — pre-build the memoized
    // IVF index so those entries time the recurring probe path, not the
    // one-time build (methodology recorded in the output JSON; numbers
    // are not comparable with a build+query timing).
    try SparkEntry.entry(spark).count()
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: $e") }
    val warmText = selected.keys.exists(_.startsWith("ann_ivf"))
    val warmImage = selected.contains("multimodal_image_query_ivf")
    val warmIvf = warmText || warmImage
    if (warmIvf)
      try SparkEntry.warm(spark, sfDir, text = warmText, image = warmImage)
      catch { case e: Throwable => System.err.println(s"[bench] IVF warm failed: $e") }
    // Median-of-5 for queries whose first run exceeds 0.4s: run-to-run
    // noise on this box is ~±15% of suite total (GC/JIT luck), so one
    // sample can show a phantom multi-second swing on an expensive
    // query (observed: +1.04s on q5_join between two runs of the same
    // binary), and even median-of-3 left ~20% cross-JVM deltas on the
    // 1-2s tier. The gate was 1s through r7, which put queries
    // HOVERING near 1s (dedup_simhash_near: 0.79s one round, 1.80s the
    // next, zero code change) in a flip-flop between n=1 and median
    // regimes — exactly the band where regressions matter became
    // uninterpretable round-over-round. At 0.4s the flip-flop band
    // moves below the noise floor; the extra wall cost is bounded
    // (~15 queries in 0.4-1s x 4 extra runs). The genuinely sub-0.4s
    // tail stays single-sample — a 2x swing there is within noise.
    val results = selected.map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => return -1.0 }
        (System.nanoTime() - t0) / 1e9
      }
      // NOTE: no System.gc() between samples — a full GC clears
      // soft-referenced caches (Spark's whole-stage-codegen class
      // cache among them), which measurably SLOWS and destabilizes
      // every subsequent sample rather than quieting it.
      val first = once()
      val t = if (first > 0.4) {
        // failed re-runs (-1 sentinel) must not enter the median — one
        // transient failure would silently deflate the reported time.
        // Median over the successful samples; all-failed reports -1.
        val ok = (first +: Seq.fill(4)(once())).filter(_ >= 0.0)
        if (ok.isEmpty) -1.0 else ok.sorted.apply(ok.size / 2)
      } else first
      name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val method = (if (warmIvf) "ann_ivf_* timed post-warm (probe path only; index build memoized)"
      else "no IVF pre-build") + "; median-of-5 for queries >0.4s (first-run gated)"
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","method":"$method"}""")
    spark.stop()
  }
}
