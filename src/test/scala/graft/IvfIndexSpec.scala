package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, Nearest}

class IvfIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val query: Array[Float] =
    e.filter(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray

  test("every vector lands in exactly one of nlist cells") {
    val idx = IvfIndex.build(e, "embedding", nlist = 8)
    assert(idx.indexed.count() == 500)
    val cells = idx.indexed.select("cell").distinct().collect().map(_.getInt(0)).toSet
    assert(cells.subsetOf((0 until 8).toSet) && cells.size == 8)
    assert(idx.centroids.count() == 8)
  }

  test("probing ALL cells reproduces the exact top-k (recall = 1 at nprobe = nlist)") {
    val idx = IvfIndex.build(e, "embedding", nlist = 8)
    val exact = Nearest.topK(e, "embedding", lit(query), n = 10,
      tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val full = idx.search(query, k = 10, nprobe = 8, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(full == exact)
  }

  test("probe-limited search returns only vectors from probed cells, self first") {
    val idx = IvfIndex.build(e, "embedding", nlist = 8)
    val probed = idx.probeCells(query, 2).toSet
    val hits = idx.search(query, k = 10, nprobe = 2, tieBreakers = Seq(asc("vec_id")))
    val hitCells = hits.select("cell").collect().map(_.getInt(0)).toSet
    assert(hitCells.subsetOf(probed))
    // vec_id 0 sits in the best-probed cell, so the self-match leads
    assert(hits.select("vec_id").head().getLong(0) == 0L)
  }

  test("searchMany agrees with per-query search at the same nprobe") {
    import spark.implicits._
    val idx = IvfIndex.build(e, "embedding", nlist = 8)
    val qIds = Seq(0L, 7L, 42L)
    val qTable = e.filter(col("vec_id").isin(qIds.map(Long.box): _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val batch = idx.searchMany(qTable, "query_id", "qe", "vec_id", k = 5, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = qIds.flatMap { id =>
      val qv = e.filter(col("vec_id") === id).select("embedding")
        .head().getSeq[Float](0).toArray
      idx.search(qv, k = 5, nprobe = 3, tieBreakers = Seq(asc("vec_id")))
        .select("vec_id").collect().map(r => (id, r.getLong(0)))
    }.toSet
    assert(batch == single)
  }

  test("save/load round trip: a reloaded index answers identically from the partitioned layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    val idx = IvfIndex.build(e, "embedding", nlist = 8)
    idx.save(s"$dir/idx")
    val back = IvfIndex.load(spark, s"$dir/idx")
    assert(back.centroidVectors.length == 8)
    val orig = idx.search(query, k = 10, nprobe = 3, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val reloaded = back.search(query, k = 10, nprobe = 3, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(reloaded == orig)
    // the probe filter over the loaded layout prunes partition dirs
    val plan = back.indexed.where(col("cell").isin(0, 1))
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PartitionFilters: [cell"), s"expected partition filters in:\n$plan")
  }

  test("recall@10 at nprobe=4/8 is usable on the clustered fixture") {
    val idx = IvfIndex.build(e, "embedding", nlist = 8)
    val exact = Nearest.topK(e, "embedding", lit(query), n = 10,
      tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ann = idx.search(query, k = 10, nprobe = 4, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val recall = (ann & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall@10 was $recall")
  }

  test("NearestCell assignment reproduces KMeansModel.transform exactly") {
    // addBatch's frozen-centroid assignment must agree with the
    // build-time k-means assignment, or build(a).addBatch(b) would
    // place b's rows differently from build(a ∪ b)
    val built = IvfIndex.build(e, "embedding", nlist = 8)
    val ours = IvfIndex.withCentroids(e, "embedding", built.centroidVectors)
    val a = built.indexed.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = ours.indexed.select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("incremental: withCentroids(a).addBatch(b) is row-for-row withCentroids(a ∪ b)") {
    val frozen = IvfIndex.build(e, "embedding", nlist = 8).centroidVectors
    val a = e.where(col("vec_id") % 2 === 0)
    val b = e.where(col("vec_id") % 2 === 1)
    val inc = IvfIndex.withCentroids(a, "embedding", frozen).addBatch(b)
    val full = IvfIndex.withCentroids(e, "embedding", frozen)
    val pairs = (df: IvfIndex) => df.indexed.select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(pairs(inc) == pairs(full))
    assert(inc.indexed.count() == 500)
    // and the served result over the union is the exact one
    val exact = Nearest.topK(e, "embedding", lit(query), n = 10,
      tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val got = inc.search(query, k = 10, nprobe = 8, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == exact)
  }

  test("appendToSaved: appended cell files serve the union without rewriting the base") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_app").toString
    val frozen = IvfIndex.build(e, "embedding", nlist = 8).centroidVectors
    val a = e.where(col("vec_id") % 2 === 0)
    val b = e.where(col("vec_id") % 2 === 1)
    val half = IvfIndex.withCentroids(a, "embedding", frozen)
    half.save(s"$dir/idx")
    val baseFiles = new java.io.File(s"$dir/idx/data").listFiles().flatMap(d =>
      Option(d.listFiles()).getOrElse(Array.empty)).map(f => f.getPath -> f.lastModified).toMap
    half.appendToSaved(s"$dir/idx", b)
    // base files untouched (append adds files, never rewrites)
    new java.io.File(s"$dir/idx/data").listFiles().flatMap(d =>
      Option(d.listFiles()).getOrElse(Array.empty)).foreach { f =>
      baseFiles.get(f.getPath).foreach(m => assert(f.lastModified == m,
        s"append rewrote base file ${f.getPath}"))
    }
    val back = IvfIndex.load(spark, s"$dir/idx")
    assert(back.indexed.count() == 500)
    val exact = Nearest.topK(e, "embedding", lit(query), n = 10,
      tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val got = back.search(query, k = 10, nprobe = 8, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == exact)
    // the vector tier shares the small-file maintenance: stats see the
    // appended files, compaction collapses them, serving is unchanged
    val before = IvfIndex.layoutStats(spark, s"$dir/idx")
      .agg(sum(col("n_files")), max(col("n_files"))).head()
    assert(before.getLong(1) >= 2, s"append must add files per cell: $before")
    IvfIndex.compactSaved(spark, s"$dir/idx")
    val after = IvfIndex.layoutStats(spark, s"$dir/idx")
      .agg(sum(col("n_files")), max(col("n_files"))).head()
    assert(after.getLong(1) == 1 && after.getLong(0) < before.getLong(0),
      s"compaction must collapse files: $before -> $after")
    val reopened = IvfIndex.load(spark, s"$dir/idx")
    assert(reopened.indexed.count() == 500)
    assert(reopened.search(query, k = 10, nprobe = 8,
        tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq == exact,
      "compaction must not change what the vector tier serves")
  }

  test("asAnnIndex: vector tier through the trait — calls equal the concrete index, refine is membership-neutral, recallCurve pins 1.0/corpus-size and unconditional monotonicity, open dispatches _ivf.json") {
    val idx = IvfIndex.build(e, "embedding", nlist = 8)
    val ann = idx.asAnnIndex
    assert(ann.dim == e.select(size(col("embedding"))).head().getInt(0))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id").collect().map(_.getLong(0)).toSeq
    // the trait calls ARE the concrete cosine calls
    assert(ids(ann.search(query, 10, nprobe = 4,
        tieBreakers = Seq(asc("vec_id")))) ==
      ids(idx.search(query, k = 10, nprobe = 4,
        tieBreakers = Seq(asc("vec_id")))))
    // refine over already-exact scores is membership-neutral:
    // searchRefine at n = shortlist must serve the same ids as search
    val raw = e.select(col("vec_id"), col("embedding"))
    assert(ids(ann.searchRefine(raw, "vec_id", "embedding", query, n = 10,
        shortlist = 10, nprobe = 8,
        tieBreakers = Seq(asc("vec_id")))).sorted ==
      ids(ann.search(query, 10, nprobe = 8,
        tieBreakers = Seq(asc("vec_id")))).sorted)
    // the measurement seam the adapter exists for (r18 VERDICT #3):
    // the vector tier's curve is monotone UNCONDITIONALLY (scores are
    // always exact — the coded tiers' lossless caveat is vacuous
    // here), ends at exactly 1.0, and full probe prices the corpus
    val q = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val curve = graft.operators.AnnIndex.recallCurve(ann, q, raw,
        "query_id", "qe", "vec_id", "embedding", k = 5,
        nprobes = Seq(1, 2, 4, 8))
      .collect().map(r => (r.getInt(0), r.getDouble(2), r.getDouble(4)))
    assert(curve.sliding(2).forall(w => w(0)._2 <= w(1)._2),
      s"vector-tier recall must be monotone in nprobe: ${curve.toSeq}")
    assert(curve.last._2 == 1.0 && curve.last._3 == 500.0,
      s"full probe must measure exactly (1.0, corpus size): ${curve.toSeq}")
    // AnnIndex.open now dispatches a saved vector-tier layout through
    // the adapter instead of refusing it by name
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_open").toString
    try {
      idx.save(s"$dir/idx")
      val opened = graft.operators.AnnIndex.open(spark, s"$dir/idx")
      assert(ids(opened.search(query, 10, nprobe = 8,
          tieBreakers = Seq(asc("vec_id")))) ==
        ids(idx.search(query, k = 10, nprobe = 8,
          tieBreakers = Seq(asc("vec_id")))),
        "an opened vector-tier layout must serve the concrete index's result")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("compactSaved parallelizes a hot cell: multiple writer tasks, rows identical, serving unchanged") {
    import spark.implicits._
    // a deliberately skewed layout: one ~5 MB hot cell (20k × 64-float
    // hash-valued vectors — dictionary-proof), one 20-row cold cell.
    // Pre-salt, the whole hot cell was ONE writer task (the r18 VERDICT
    // straggler); post-salt its ceil(bytes/target) subkeys spread over
    // multiple tasks, visible as distinct part-numbers in the output.
    val hot = spark.range(20000).select(col("id").as("vec_id"),
      expr("transform(sequence(0, 63), j -> " +
        "cast(pmod(xxhash64(id, j), 1000000) as float) / 1000000.0f + 10.0f)")
        .as("embedding"))
    val cold = spark.range(20).select((col("id") + 100000L).as("vec_id"),
      expr("transform(sequence(0, 63), j -> " +
        "cast(pmod(xxhash64(id, j), 1000000) as float) / 1000000.0f - 10.0f)")
        .as("embedding"))
    val idx = IvfIndex.build(hot.unionByName(cold), "embedding", nlist = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_salt").toString
    idx.save(s"$dir/idx")
    val beforeIds = spark.read.parquet(s"$dir/idx/data")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    val q = Array.fill(64)(10.5f)
    val servedBefore = IvfIndex.load(spark, s"$dir/idx")
      .search(q, k = 10, nprobe = 2, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    IvfIndex.compactSaved(spark, s"$dir/idx", targetFileBytes = 1L << 20)
    // rows are identical — compaction only moves bytes between files
    val afterIds = spark.read.parquet(s"$dir/idx/data")
      .select("vec_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(afterIds == beforeIds)
    val servedAfter = IvfIndex.load(spark, s"$dir/idx")
      .search(q, k = 10, nprobe = 2, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(servedAfter == servedBefore)
    // the hot cell (>1 MiB at a 1 MiB target) was written by MULTIPLE
    // tasks: parquet part-numbers encode the writer partition id, so
    // >= 2 distinct part-numbers in one cell= dir proves the salt
    // spread the cell across tasks
    val stats = IvfIndex.layoutStats(spark, s"$dir/idx").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val hotCell = IvfIndex.layoutStats(spark, s"$dir/idx")
      .orderBy(desc("bytes")).head().getInt(0)
    val partNums = new java.io.File(s"$dir/idx/data/cell=$hotCell")
      .listFiles().filter(f => f.getName.startsWith("part-"))
      .map(_.getName.split("-")(1)).toSet
    assert(partNums.size >= 2,
      s"hot cell must be written by multiple tasks, saw part-numbers " +
        s"$partNums across ${stats(hotCell)} files")
    // the cold cell stays a single file — salting never fragments
    // under-target cells
    assert(stats(1 - hotCell) == 1L, s"cold cell files: ${stats(1 - hotCell)}")
  }

  test("compaction salt spreads DUPLICATE rows across every writer (r19 ADVICE): round-robin, not a row hash") {
    import spark.implicits._
    // 1000 rows IDENTICAL in every column: a full-row hash puts all of
    // them on ONE salt — the duplicate-heavy hot cell collapses back to
    // the single-writer straggler the salt exists to fix. The
    // round-robin salt must land them on all __n_sub values, roughly
    // evenly, regardless of row content.
    val dup = spark.range(1000)
      .select(lit(7).cast("int").as("cell"), lit("same").as("payload"))
    val widths = Seq((7, 8L)).toDF("cell", "__n_sub")
    val perSalt = graft.operators.IvfIndex.saltedForCompaction(dup, widths)
      .groupBy("__salt").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perSalt.keySet == (0L until 8L).toSet,
      s"identical rows must reach every salt value: $perSalt")
    assert(perSalt.values.forall(_ >= 100L),
      s"salt distribution must be roughly uniform over duplicates: $perSalt")
    // cells with no measured width (NULL __n_sub) default to one salt
    val unmeasured = graft.operators.IvfIndex.saltedForCompaction(
        Seq((3, "x"), (3, "y")).toDF("cell", "payload"), widths)
      .select("__salt").distinct().collect().map(_.getLong(0)).toSet
    assert(unmeasured == Set(0L), s"$unmeasured")
  }

  test("vector-tier ingestBatch: drain == appends row-for-row; replay skipped; empty no-op; cadence fires; serving stays exact") {
    val frozen = IvfIndex.build(e, "embedding", nlist = 8).centroidVectors
    val a = e.where(col("vec_id") % 3 === 0)
    val b1 = e.where(col("vec_id") % 3 === 1)
    val b2 = e.where(col("vec_id") % 3 === 2)
    val half = IvfIndex.withCentroids(a, "embedding", frozen)
    val viaIngest = java.nio.file.Files.createTempDirectory("graft_vec_ing").toString
    val viaAppend = java.nio.file.Files.createTempDirectory("graft_vec_app").toString
    def pairs(dir: String) = spark.read.parquet(s"$dir/data")
      .select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    try {
      half.save(viaIngest); half.save(viaAppend)
      assert(half.ingestBatch(viaIngest, b1, 0L, compactFilesPerCell = 1))
      assert(half.ingestBatch(viaIngest, b2, 1L, compactFilesPerCell = 1))
      half.appendToSaved(viaAppend, b1); half.appendToSaved(viaAppend, b2)
      assert(pairs(viaIngest) == pairs(viaAppend),
        "a drained ingest must leave the layout batch appends would")
      assert(IvfIndex.layoutStats(spark, viaIngest)
        .agg(max(col("n_files"))).head().getLong(0) == 1L,
        "the compaction cadence must have fired")
      // a never-saved path refuses by name — ingest must not grow a
      // data tree no load() can open
      val bogus = intercept[IllegalArgumentException](
        half.ingestBatch(s"$viaIngest/definitely_not_a_layout", b1, 0L))
      assert(bogus.getMessage.contains("not a saved vector-tier IVF layout"),
        bogus.getMessage)
      // replay + empty batch are no-ops
      val before = pairs(viaIngest)
      assert(!half.ingestBatch(viaIngest, b1, 0L))
      assert(!half.ingestBatch(viaIngest, e.where(lit(false)), 9L))
      assert(!new java.io.File(s"$viaIngest/_ingest/batch_9.json").exists())
      assert(pairs(viaIngest) == before)
      // the reopened layout serves the exact whole-corpus result
      val exact = Nearest.topK(e, "embedding", lit(query), n = 10,
          tieBreakers = Seq(asc("vec_id")))
        .select("vec_id").collect().map(_.getLong(0)).toSeq
      assert(IvfIndex.load(spark, viaIngest)
        .search(query, k = 10, nprobe = 8, tieBreakers = Seq(asc("vec_id")))
        .select("vec_id").collect().map(_.getLong(0)).toSeq == exact)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(): Unit
      }
      rm(new java.io.File(viaIngest)); rm(new java.io.File(viaAppend))
    }
  }

  test("driftGuard: healthy index passes, a hot-cell pileup refuses with re-fit advice") {
    val idx = IvfIndex.build(e, "embedding", nlist = 8)
    val healthy = idx.driftGuard(maxFactor = 8.0)
    assert(healthy >= 1.0 && healthy <= 8.0) // max/avg ∈ [1, nlist]
    // pile 4096 copies of one vector onto the index — all land in one
    // cell (note max/avg is capped at nlist, so the refusal threshold
    // here is 4, reachable; at production nlist the cap is irrelevant).
    // Built as ONE local relation — repeated self-union would duplicate
    // the scan subtree 2^12 times in the plan.
    val oneRow = e.where(col("vec_id") === 0).collect().head
    val pile = spark.createDataFrame(
      java.util.Collections.nCopies(4096, oneRow), e.schema)
    val drifted = idx.addBatch(pile)
    val ex = intercept[IllegalStateException](drifted.driftGuard(maxFactor = 4.0))
    assert(ex.getMessage.contains("re-fit"), ex.getMessage)
  }

  test("splitOversized: cells still tile the corpus, exactness at full probe is preserved") {
    val idx = IvfIndex.build(e, "embedding", nlist = 4) // ~125 rows/cell
    val before = idx.cellSizeStats.agg(max(col("n"))).head().getLong(0)
    val split = idx.splitOversized(maxRows = 60)
    // no row lost or duplicated, every cell id in the widened range,
    // and only oversized cells were touched
    assert(split.indexed.count() == 500)
    assert(split.centroidVectors.length > 4)
    val sizes = split.cellSizeStats.collect().map(r => r.getInt(0) -> r.getLong(1))
    assert(sizes.map(_._2).sum == 500)
    assert(sizes.forall { case (c, _) => c >= 0 && c < split.centroidVectors.length })
    assert(sizes.map(_._2).max < before, "the hot cells must shrink")
    // the partition refinement cannot lose recall at full probe: every
    // cell is still probed, so the exact top-k survives the renumbering
    val exact = Nearest.topK(e, "embedding", lit(query), n = 10,
      tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val full = split.search(query, k = 10, nprobe = split.centroidVectors.length,
      tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(full == exact)
    // under-cap index is returned unchanged (no-op fast path)
    assert(split.splitOversized(maxRows = 1000000) eq split)
  }

  test("repairSaved: only hot cell= partitions are rewritten; cold files byte-identical; serving stays exact") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_repair").toString
    val idx = IvfIndex.build(e, "embedding", nlist = 8)
    idx.save(dir)
    val sizes = idx.cellSizeStats.collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val cap = sizes.map(_._2).sorted.apply(sizes.length / 2) // median: some hot, some cold
    val cold = sizes.filter(_._2 <= cap).map(_._1)
    val hot = sizes.filter(_._2 > cap).map(_._1)
    assert(cold.nonEmpty && hot.nonEmpty, s"need both; sizes=${sizes.toSeq}")
    def listing(cells: Seq[Int]): Map[String, (Long, Long)] = cells.flatMap { c =>
      val d = new java.io.File(s"$dir/data/cell=$c")
      d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> (f.lastModified(), f.length()))
    }.toMap
    val coldBefore = listing(cold)
    val repaired = IvfIndex.repairSaved(spark, dir, maxRows = cap)
    // cold partitions: same files, same mtimes, same bytes — untouched
    assert(listing(cold) == coldBefore)
    // hot cells were split: widened quantizer, sidecar in agreement
    assert(repaired.centroidVectors.length > 8)
    val sidecar = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "_ivf.json")))
    assert(sidecar.contains(s""""nlist": ${repaired.centroidVectors.length}"""))
    // no row lost or duplicated across the delete-then-append
    assert(repaired.indexed.count() == 500)
    assert(repaired.cellSizeStats.collect().map(_.getLong(1)).max < sizes.map(_._2).max)
    // the reopened layout serves the exact top-k at full probe
    val exact = Nearest.topK(e, "embedding", lit(query), n = 10,
      tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    val got = repaired.search(query, k = 10,
      nprobe = repaired.centroidVectors.length, tieBreakers = Seq(asc("vec_id")))
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(got == exact)
    // an already-healthy layout is a no-op (nothing deleted or written)
    val all = repaired.indexed.count()
    assert(IvfIndex.repairSaved(spark, dir, maxRows = 1000000).indexed.count() == all)
  }

  test("repair crash sentinel: load and ingestBatch refuse while _repair_in_progress exists; a clean repair leaves none (r20 ADVICE)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_sentinel").toString
    val idx = IvfIndex.build(e, "embedding", nlist = 4)
    idx.save(dir)
    // a successful repair cleans up after itself
    IvfIndex.repairSaved(spark, dir, maxRows = 100)
    assert(!new java.io.File(dir, "_repair_in_progress").exists(),
      "a completed repair must remove its sentinel")
    // plant the sentinel: the crashed-mid-repair state
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "_repair_in_progress"), "{\"repairing\": true}")
    val e1 = intercept[IllegalArgumentException](IvfIndex.load(spark, dir))
    assert(e1.getMessage.contains("_repair_in_progress"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      IvfIndex.repairSaved(spark, dir, maxRows = 100)) // opens via load — same refusal
    assert(e2.getMessage.contains("snapshot"), e2.getMessage)
    val fresh = IvfIndex.build(e, "embedding", nlist = 4)
    val e3 = intercept[IllegalArgumentException](
      fresh.ingestBatch(dir, e.limit(5), 99L))
    assert(e3.getMessage.contains("_repair_in_progress"), e3.getMessage)
    // operator recovery: delete the sentinel, the layout serves again
    assert(new java.io.File(dir, "_repair_in_progress").delete())
    assert(IvfIndex.load(spark, dir).indexed.count() == 500)
  }

  test("compaction salt is order-independent: the same partition multiset maps rows to the same salts regardless of arrival order (r20 ADVICE)") {
    import spark.implicits._
    // distinct payloads in one partition, forward vs reversed arrival:
    // without the within-partition sort the positional round-robin
    // would hand row X a different salt per ordering — exactly the
    // retry nondeterminism (SPARK-23207 class) that drops/duplicates
    // rows across a recomputed map output
    val rows = (0 until 64).map(i => (7, s"payload_$i"))
    val fwd = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1)).toDF("cell", "payload")
    val rev = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.reverse, 1)).toDF("cell", "payload")
    val widths = Seq((7, 8L)).toDF("cell", "__n_sub")
    def salts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      graft.operators.IvfIndex.saltedForCompaction(df, widths)
        .select("payload", "__salt").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salts(fwd) == salts(rev),
      "row-to-salt mapping must be a pure function of partition CONTENT")
  }

  test("capCells: iterates to the cap on separable data; refuses on an unsplittable duplicate pile") {
    val idx = IvfIndex.build(e, "embedding", nlist = 4)
    val capped = idx.capCells(maxRows = 60, maxRounds = 4)
    assert(capped.cellSizeStats.agg(max(col("n"))).head().getLong(0) <= 60)
    assert(capped.indexed.count() == 500)
    // a cell of identical vectors has no geometry to split — capCells
    // must refuse with advice, not loop or silently under-deliver
    val oneRow = e.where(col("vec_id") === 0).collect().head
    val pile = spark.createDataFrame(
      java.util.Collections.nCopies(512, oneRow), e.schema)
    val piled = idx.addBatch(pile)
    val ex = intercept[IllegalStateException](piled.capCells(maxRows = 60, maxRounds = 2))
    assert(ex.getMessage.contains("no progress") || ex.getMessage.contains("still"),
      ex.getMessage)
  }
}
