package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Manual skew mitigation for shuffle joins — the explicit form of what
 * AQE's skew-join handling does adaptively. When one join key carries a
 * disproportionate share of the big side (a hot document source, a
 * null-ish default key), hash partitioning sends it all to one task;
 * salting splits the hot key's rows across `factor` sub-keys and
 * replicates the matching small-side rows once per sub-key, restoring
 * parallelism at the cost of a `factor`× copy of the SMALL side only.
 *
 * Result-equivalent to a plain inner equi-join (spec'd).
 */
object Skew {

  /** Inner equi-join of a skewed big side against a small side on
    * `key`, salted `factor` ways. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int): DataFrame = {
    require(factor > 1, "salting needs factor > 1")
    // rand() is fine here: the salt only routes rows, results don't
    // depend on which sub-key a row lands on
    val saltedBig = big.withColumn("__salt", (rand(42) * factor).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
