package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.util.hashing.MurmurHash3

/**
 * Distinct word-shingle set as SORTED 64-bit hashes — the set
 * representation behind the Jaccard/MinHash family, produced in one
 * codegen pass. Replaces the `transform(sequence(...), concat_ws ∘
 * element_at) → array_distinct` higher-order-function pipeline, which
 * Spark executes as CodegenFallback (interpreted expression-tree walk
 * PER ELEMENT — measured ~50µs/shingle, i.e. 12s for 5k fixture docs;
 * this kernel does the same work in ~0.3s).
 *
 * Hash = two fixed-seed MurmurHash3 32-bit words over the space-joined
 * shingle — the same base hash [[MinHashSig]] uses, so
 * `array_intersect` on two of these columns counts exactly the shared
 * shingles (collisions at 64 bits are negligible: ~n²/2⁶⁴). Sorted
 * ascending for deterministic output; fewer tokens than `shingleSize`
 * yields an empty array.
 */
case class ShingleHashes(child: Expression, shingleSize: Int = 3, seed: Int = 42)
    extends UnaryExpression {

  require(shingleSize > 0, s"shingleSize must be positive, got $shingleSize")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string column, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.hashes(v.asInstanceOf[UTF8String], shingleSize, seed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ShingleHashes.hashes($c, $shingleSize, $seed);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** POSITIONAL word-shingle hashes — [[ShingleHashes]] keeping order
  * and duplicates: element i is the 64-bit hash of the gram STARTING
  * at token i (same tokenize, same baseHash, same seed semantics), so
  * `posexplode` recovers (token position, gram identity) pairs — the
  * frame exact-substring dedup ([[graft.operators.Dedup
  * .removeDuplicateSpans]]) marks and merges into spans. Fewer tokens
  * than `shingleSize` yields an empty array (such docs carry no
  * duplicable span). */
case class PositionalShingleHashes(child: Expression, shingleSize: Int = 13,
    seed: Int = 42) extends UnaryExpression {

  require(shingleSize > 0, s"shingleSize must be positive, got $shingleSize")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "positional_shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"positional_shingle_hashes requires a string column, got ${other.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.positionalHashes(v.asInstanceOf[UTF8String], shingleSize, seed)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.ShingleHashes.positionalHashes($c, $shingleSize, $seed);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object ShingleHashes {

  /** THE whitespace token boundary, pinned as an explicit character
    * class so Java regex (every Spark-side tokenizer and kernel) and
    * RE2 (the DuckDB oracle's `string_split_regex`) split on the
    * IDENTICAL character set. The two engines' `\s` differ: Java's is
    * exactly `[ \t\n\x0B\f\r]` while RE2's is `[ \t\n\f\r]` — no
    * U+000B vertical tab — a latent cross-engine divergence whenever
    * both sides spell `\s` (ASCII fixtures mask it). Spelling the
    * class out (`\x0B` is a valid hex escape in BOTH dialects) makes
    * the boundary set identical by construction; JVM-side behavior is
    * bit-for-bit unchanged because the class IS Java's `\s`. Oracle
    * SQL must interpolate [[WsRegex]] instead of writing `'\s+'`. */
  val WsClass = " \\t\\n\\x0B\\f\\r"
  val WsRegex = s"[$WsClass]+"
  val WsPattern: java.util.regex.Pattern = java.util.regex.Pattern.compile(WsRegex)

  /** Character-predicate form of [[WsClass]] for the character-scanning
    * kernels ([[WinnowFingerprint]], [[HashingEmbed]]) — the same six
    * chars, no regex. `Character.isWhitespace` is a THIRD boundary set
    * (adds U+001C–1F and Unicode space separators) and must not be
    * used where an oracle or a sibling kernel tokenizes with `\s`. */
  @inline def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Shared tokenization of the Jaccard/MinHash family — lowercase
    * (ROOT locale: executor JVM locale must not fork fingerprints),
    * split on whitespace runs ([[WsRegex]]), drop empties.
    * [[MinHashSig]] and [[RepetitionStats]] MUST use this same
    * function: the minhash verify stage counts shared shingles across
    * both kernels, so any tokenization drift silently breaks that
    * invariant. */
  def tokenize(u: UTF8String): Array[String] =
    WsPattern.split(u.toString.toLowerCase(java.util.Locale.ROOT)).filter(_.nonEmpty)

  /** Shared 64-bit base hash of one shingle string: two fixed-seed
    * MurmurHash3 32-bit words. Same bit-identity requirement as
    * [[tokenize]]. */
  @inline def baseHash(shingle: String, seed: Int): Long =
    (MurmurHash3.stringHash(shingle, seed).toLong << 32) |
      (MurmurHash3.stringHash(shingle, seed + 1).toLong & 0xffffffffL)

  /** [[PositionalShingleHashes]]' kernel: hash of the gram starting at
    * each token index, in order, duplicates kept. */
  def positionalHashes(u: UTF8String, shingleSize: Int, seed: Int): ArrayData = {
    val toks = tokenize(u)
    val n = toks.length - shingleSize + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val shingle =
        if (shingleSize == 1) toks(i)
        else toks.slice(i, i + shingleSize).mkString(" ")
      out(i) = baseHash(shingle, seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** The kernel, callable from generated Java (static forwarder). */
  def hashes(u: UTF8String, shingleSize: Int, seed: Int): ArrayData = {
    val toks = tokenize(u)
    val n = toks.length - shingleSize + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Long])
    val set = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      val shingle =
        if (shingleSize == 1) toks(i)
        else toks.slice(i, i + shingleSize).mkString(" ")
      set.add(baseHash(shingle, seed))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }
}
