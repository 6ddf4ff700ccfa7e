package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SimJoin
object ScratchProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val e = Tables(spark, d, "embeddings")
    e.count()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // candidate count for the compound config
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.expressions.RandomProjectionKeys
    val rows = e.where(col("embedding").isNotNull)
    val keyed = rows.select(col("vec_id"),
      ColumnBridge.column(RandomProjectionKeys(
        ColumnBridge.expression(col("embedding")), 8, 0.5, 42, 3)).as("__keys"))
    val banded = keyed.select(col("vec_id"), posexplode(col("__keys")))
      .withColumnRenamed("pos","__table").withColumnRenamed("col","__key")
    val nBanded = time("banded rows")(banded.count())
    val joined = banded.select(col("vec_id").as("id1"), col("__table"), col("__key"))
      .join(banded.select(col("vec_id").as("id2"), col("__table"), col("__key")), Seq("__table","__key"))
      .where(col("id1") < col("id2"))
    val nJoined = time("pre-distinct candidate rows")(joined.count())
    val cands = joined.select("id1","id2").distinct()
    val nC = time("distinct candidates")(cands.count())
    val out = time("full operator")(SimJoin.approxCosineSelfJoin(e, "vec_id", "embedding", 0.35,
      bucketLength = 0.5, numHashTables = 8, projsPerTable = 3).count())
    println(s"[probe] banded=$nBanded preDistinct=$nJoined candidates=$nC output=$out")
    spark.stop()
  }
}
