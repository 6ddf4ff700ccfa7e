package graft.operators

import org.apache.spark.sql.DataFrame

/** Common surface of the single-filter [[ParaBloom]] and the sharded
  * [[ParaBloomBank]] — what the dedup operators and the streaming
  * store actually require of a bounded-memory membership tier. All
  * implementations share the contract that matters for dedup
  * correctness: NO false negatives (a duplicate can never survive),
  * one-sided false positives at a rate the caller sized for. */
trait BloomStore extends Serializable {
  def add(h1: Long, h2: Long): Unit
  def mightContain(h1: Long, h2: Long): Boolean
  /** Fixed memory footprint, independent of items inserted. */
  def sizeBytes: Long
  /** The capacity the store was sized for (`expectedItems` at create,
    * reconstructed from geometry as m·ln2/k — exact up to the integer
    * rounding of m and k): past this, false drops exceed the design
    * rate. */
  def designItems: Long
  /** Saturation gauge: the fullest constituent filter's fill ratio
    * (a store at its design capacity sits at ~50%). */
  def maxFillRatio: Double
  /** Snapshot copy — the broadcast-before-merge discipline
    * ([[graft.streaming.StreamOps.dedupParagraphsPerBatchBloomFrom]]). */
  def copyStore(): BloomStore
  /** Distributed delta build from a `(__h1, __h2)` frame
    * ([[Dedup.paragraphHashFrame]]) OR-merged into this store in
    * place. Rows never collect to the driver — only fixed-size filter
    * partials do. */
  def absorb(hashFrame: DataFrame): Unit
}

/** Bounded-memory Bloom tier for the streaming seen-paragraph store —
  * the shape Dolma actually DEPLOYS its ingest-time paragraph dedup in
  * (cf. reference SURVEY §2.3 D). The exact stores are faithful but
  * unbounded: the string store grows by the distinct-paragraph bytes
  * and the hashed store by 16 B per distinct paragraph, forever — at
  * 100 TB the hashed store alone is ~160 GB of state that must SHUFFLE
  * into every batch's anti-join. This tier caps the state at a
  * user-chosen `m = ceil(-n·ln p / ln²2)` bits, FIXED at create time
  * (inserting more never grows it, only degrades the false-positive
  * rate), and turns the membership test into a broadcast + map-side
  * probe: no shuffle of the store at all.
  *
  * The error model is one-sided and CONSERVATIVE for dedup: a false
  * positive drops a genuinely fresh paragraph (bounded data loss at
  * rate ≤ p when sized honestly), but a duplicate can never survive —
  * there are no false negatives, so the Bloom run's surviving
  * paragraphs are always a SUBSET of the exact store's (spec'd, both
  * the properly-sized identity and the undersized subset).
  *
  * Probes derive from the SAME independent 128-bit paragraph hash pair
  * as the exact hashed store ([[Dedup.paragraphHashFrame]]) via the
  * standard double-hashing construction g_i = h1 + i·h2 (Kirsch &
  * Mitzenmacher 2006: two independent hashes suffice for the Bloom
  * error bound) — so the hashing stays in codegen'd `xxhash64` columns
  * and this tier is literally a lossy compaction of the hashed tier.
  * Deterministic end-to-end: a fixed corpus either collides or it
  * does not, repeatably.
  */
final class ParaBloom private (
    private val words: Array[Long],
    val numHashes: Int) extends BloomStore {

  def numBits: Long = words.length.toLong * 64L

  private[operators] def numWords: Int = words.length

  /** The fixed memory footprint — independent of how many items have
    * been inserted. */
  def sizeBytes: Long = words.length.toLong * 8L

  // double hashing over the 128-bit pair; h2 forced odd so the probe
  // stride never degenerates to 0 (mod 2^64 the odd stride also visits
  // distinct offsets for i = 0..k-1)
  private def bitIndex(h1: Long, h2: Long, i: Int): Int = {
    val combined = h1 + i * (h2 | 1L)
    // (x & Long.MaxValue) % numBits — the Guava convention: a cheap
    // non-negative fold, unbiased enough at numBits << 2^63
    ((combined & Long.MaxValue) % numBits).toInt
  }

  def add(h1: Long, h2: Long): Unit = {
    var i = 0
    while (i < numHashes) {
      val b = bitIndex(h1, h2, i)
      words(b >>> 6) |= (1L << (b & 63))
      i += 1
    }
  }

  /** No false negatives: true for every pair ever [[add]]ed. */
  def mightContain(h1: Long, h2: Long): Boolean = {
    var i = 0
    while (i < numHashes) {
      val b = bitIndex(h1, h2, i)
      if ((words(b >>> 6) & (1L << (b & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Bitwise-OR merge (the distributed build: per-partition partials
    * OR into one). Requires identical geometry. */
  def orInPlace(other: ParaBloom): this.type = {
    require(other.words.length == words.length && other.numHashes == numHashes,
      s"incompatible Bloom geometry: ${other.words.length}×64/${other.numHashes} " +
        s"vs ${words.length}×64/$numHashes")
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
    this
  }

  def copy(): ParaBloom = new ParaBloom(words.clone(), numHashes)

  /** Fraction of bits set — the saturation gauge. The expected
    * false-positive rate at the current fill is `fill^k`; a filter
    * past ~50% fill has been fed beyond its design `n` and is losing
    * more than its promised `p` of fresh paragraphs. */
  def fillRatio: Double = {
    var set = 0L
    var i = 0
    while (i < words.length) { set += java.lang.Long.bitCount(words(i)); i += 1 }
    set.toDouble / numBits
  }

  /** Expected false-positive probability at the current fill: fill^k. */
  def approxFpp: Double = math.pow(fillRatio, numHashes)

  /** Design capacity inverted from geometry: the create-time sizing
    * sets k = round(m/n·ln2), so n ≈ m·ln2/k up to that rounding. */
  def designItems: Long = math.round(numBits * math.log(2) / numHashes)

  def maxFillRatio: Double = fillRatio

  def copyStore(): ParaBloom = copy()

  def absorb(hashFrame: DataFrame): Unit =
    orInPlace(ParaBloom.fromHashFrame(hashFrame, this))
}

object ParaBloom {

  /** Standard sizing: m = ceil(−n·ln p / ln²2) bits, k = round(m/n·ln 2)
    * hash probes — the textbook optimum for `expectedItems` inserts at
    * false-positive rate `fpp`. ~1.44·log2(1/p) bits per expected item
    * (9.6 bits at p = 0.01), REGARDLESS of paragraph length. */
  def create(expectedItems: Long, fpp: Double): ParaBloom = {
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val ln2 = math.log(2)
    val mBits = math.max(64L, math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong)
    require(mBits <= Int.MaxValue.toLong, // bitIndex returns Int; 2^31 bits = 256 MB, ample per filter
      s"requested filter needs $mBits bits (> 2^31 = 256 MB); shard the store instead")
    val nWords = ((mBits + 63) / 64).toInt
    val k = math.max(1, math.round(mBits.toDouble / expectedItems * ln2).toInt)
    new ParaBloom(new Array[Long](nWords), k)
  }

  /** An empty filter with the same geometry (for partials). */
  def emptyLike(proto: ParaBloom): ParaBloom =
    new ParaBloom(new Array[Long](proto.words.length), proto.numHashes)

  /** An empty filter from bare geometry — what a task closure may
    * capture when the proto itself must not ship (two ints instead of
    * a possibly-hundreds-of-MB filter: [[ParaBloomBank.fromHashFrame]]). */
  private[operators] def withGeometry(nWords: Int, k: Int): ParaBloom = {
    require(nWords >= 1 && k >= 1, s"bad Bloom geometry: $nWords words, $k hashes")
    new ParaBloom(new Array[Long](nWords), k)
  }

  /** Per-batch saturation guard — the `driftGuard` convention for the
    * streaming store (r13 VERDICT #5): a filter fed past its design
    * `expectedItems` fills past ~50% and silently exceeds its promised
    * false-drop rate (fpp at fill f is f^k — at 70% fill a 1% filter
    * drops ~8% of fresh paragraphs). Returns a warning line in the
    * soft band (`warnAtFill`, `refuseAtFill`]; throws past
    * `refuseAtFill`, naming the design capacity and both remedies,
    * rather than silently eating data. */
  def saturationGuard(store: BloomStore, warnAtFill: Double = 0.55,
      refuseAtFill: Double = 0.7): Option[String] = {
    require(warnAtFill > 0 && warnAtFill <= refuseAtFill && refuseAtFill < 1,
      s"need 0 < warnAtFill <= refuseAtFill < 1, got ($warnAtFill, $refuseAtFill)")
    val fill = store.maxFillRatio
    if (fill > refuseAtFill) throw new IllegalStateException(
      f"Bloom store is ${fill * 100}%.1f%% full (refuse threshold ${refuseAtFill * 100}%.0f%%): " +
        s"it was sized for expectedItems ≈ ${store.designItems} and has been fed past " +
        "that design capacity, so false drops of FRESH paragraphs now exceed the " +
        "promised rate. Re-create with a larger expectedItems, or shard the store " +
        "(ParaBloomBank.create(expectedItems, fpp, numShards)) — refusing to keep " +
        "deduplicating against a saturated filter")
    else if (fill > warnAtFill) Some(
      f"WARNING: Bloom store ${fill * 100}%.1f%% full (warn threshold " +
        f"${warnAtFill * 100}%.0f%%, sized for expectedItems ≈ ${store.designItems}) — " +
        "approaching saturation; plan a larger or sharded store before the " +
        f"refuse threshold (${refuseAtFill * 100}%.0f%%)")
    else None
  }

  private val MagicV1 = 0x47524254424c4d31L // "GRBTBLM1"

  /** The Hadoop FileSystem a store path resolves to — the checkpoint
    * of a CLUSTER stream lives on hdfs:// or s3a://, and a java.nio
    * write there would land on the driver's local disk instead (the
    * r13-ADVICE sidecar failure class). Scheme-less paths resolve
    * through the active session's default FS, like every other Spark
    * path; local mode keeps writing local files. */
  private def fsFor(path: String): (org.apache.hadoop.fs.FileSystem, org.apache.hadoop.fs.Path) = {
    val conf = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(conf), p)
  }

  /** Persist the filter — the streaming seen-store must survive a
    * restart alongside the query's own checkpoint, or the restarted
    * stream re-admits every paragraph ever seen. Format: magic,
    * numHashes, word count, then the raw bitset words (all
    * big-endian); ~sizeBytes on disk, one sequential write, through
    * the path-owning Hadoop FS (see [[fsFor]]). */
  def save(bloom: ParaBloom, path: String): Unit = {
    val (fs, p) = fsFor(path)
    Option(p.getParent).foreach(fs.mkdirs)
    val buf = java.nio.ByteBuffer.allocate(8 * (3 + bloom.words.length))
    buf.putLong(MagicV1)
    buf.putLong(bloom.numHashes.toLong)
    buf.putLong(bloom.words.length.toLong)
    bloom.words.foreach(buf.putLong)
    val out = fs.create(p, true)
    try out.write(buf.array()) finally out.close()
  }

  /** Reopen a [[save]]d filter: decision-identical to the instance that
    * was saved (spec'd — same bits, same probes). Refuses corrupt or
    * truncated files by magic/length check rather than misreading. */
  def load(path: String): ParaBloom = {
    val (fs, p) = fsFor(path)
    val len = fs.getFileStatus(p).getLen
    require(len <= 8L * (3 + (Int.MaxValue.toLong / 64L)) && len >= 24,
      s"$path is not a ParaBloom file (length $len)")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(bytes) finally in.close()
    require(bytes.length >= 24 && bytes.length % 8 == 0,
      s"$path is not a ParaBloom file (length ${bytes.length})")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    require(buf.getLong() == MagicV1, s"$path: bad magic — not a ParaBloom file")
    // validate the longs BEFORE narrowing (r13 ADVICE): a corrupt
    // header like 2^32+2 would otherwise truncate to a small valid k
    // and silently change membership decisions instead of refusing
    val kLong = buf.getLong()
    val nWordsLong = buf.getLong()
    require(kLong >= 1L && kLong <= 64L && nWordsLong >= 1L &&
        nWordsLong <= Int.MaxValue.toLong / 64L &&
        bytes.length == 8L * (3 + nWordsLong),
      s"$path: truncated or corrupt (k=$kLong, words=$nWordsLong, ${bytes.length} bytes)")
    val k = kLong.toInt
    val nWords = nWordsLong.toInt
    val words = new Array[Long](nWords)
    var i = 0
    while (i < nWords) { words(i) = buf.getLong(); i += 1 }
    new ParaBloom(words, k)
  }

  /** Distributed build from a `(__h1, __h2)` frame
    * ([[Dedup.paragraphHashFrame]]): one fixed-size partial per
    * partition, OR-merged in a tree — the driver receives
    * O(log partitions) filters of `sizeBytes` each, never the rows.
    * This is the per-batch DELTA path of the streaming store; the
    * rows never collect. */
  def fromHashFrame(df: DataFrame, proto: ParaBloom): ParaBloom = {
    val k = proto.numHashes
    val nWords = proto.words.length
    val partials = df.select("__h1", "__h2").rdd.mapPartitions { it =>
      val b = new ParaBloom(new Array[Long](nWords), k)
      it.foreach(r => b.add(r.getLong(0), r.getLong(1)))
      Iterator.single(b)
    }
    if (partials.isEmpty()) emptyLike(proto)
    else partials.treeReduce((a, b) => a.orInPlace(b), depth = 2)
  }
}
