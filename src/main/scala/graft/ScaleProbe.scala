package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{AsofJoin, Dedup, IvfIndex, IvfPqIndex, Nearest, PqIndex, RangeJoin, SimJoin, Skew, TextAnalysis}

/**
 * Throughput probe beyond the driver fixtures: 1M × 64-dim synthetic
 * vectors (seeded, written once to /tmp), timing the flagship search
 * paths. Validates that the shapes chosen for 100 TB behave linearly at
 * 2000× the sf0.1 vector fixture — run `sbt "runMain graft.ScaleProbe"`.
 * Not part of the driver contract; fixtures for correctness stay the
 * driver-provided ones.
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = args.find(a => a.nonEmpty && a.forall(_.isDigit))
      .map(_.toLong).getOrElse(1000000L)
    val dim = 64
    val path = s"/tmp/graft_scale_probe_$n"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    if (!new java.io.File(path).exists()) {
      spark.range(n).toDF("vec_id")
        .select(col("vec_id"),
          array((0 until dim).map(i => rand(seed = i + 1).cast("float")): _*).as("embedding"))
        .repartition(32)
        .write.mode("overwrite").parquet(path)
    }
    val e = spark.read.parquet(path)
    val query = e.where(col("vec_id") === 0).select("embedding").head().getSeq[Float](0).toArray

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scale-probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    time("warmup count")(e.count())
    time(s"nearest top-10 over ${n / 1000000}M") {
      Nearest.topK(e, "embedding", lit(query), n = 10,
        tieBreakers = Seq(asc("vec_id"))).collect()
    }
    // the same query with the HOF formulation the custom expression
    // replaced (SURVEY §4.2) — per-row lambda dispatch + zip allocation
    time("  same via aggregate(zip_with)") {
      val q = lit(query).cast("array<double>")
      val ed = col("embedding").cast("array<double>")
      val dot = aggregate(zip_with(ed, q, (x, y) => x * y), lit(0.0), (s, v) => s + v)
      val na = aggregate(zip_with(ed, ed, (x, y) => x * y), lit(0.0), (s, v) => s + v)
      val nb = aggregate(zip_with(q, q, (x, y) => x * y), lit(0.0), (s, v) => s + v)
      e.select(col("vec_id"), (dot / (sqrt(na) * sqrt(nb))).as("similarity"))
        .orderBy(desc("similarity"), asc("vec_id")).limit(10).collect()
    }
    time("knnJoinAgg 10q x k10") {
      val q = e.where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      SimJoin.knnJoinAgg(q, e, "query_id", "qe", "vec_id", "embedding", k = 10).collect()
    }
    // PPJoin at 1M docs: sbt "runMain graft.ScaleProbe 1000000 ppjoin".
    // Candidate-count telemetry makes the sub-quadratic claim concrete:
    // 1M docs have ~5·10^11 unordered pairs; the prefix index must emit
    // candidates tracking the true-pair count, orders of magnitude under
    // that. Corpus: 12 uniform tokens from a 50k vocab plus 2 high-
    // frequency tokens from a 40-term head (skew stresses the rarest-
    // first prefix choice); every id ≡ 1 (mod 100) duplicates id-1, so
    // ~1% of docs have a planted exact-dup partner.
    if (args.contains("ppjoin")) {
      val base = when(col("id") % 100 === 1, col("id") - 1).otherwise(col("id"))
      val toks = (0 until 12).map(i =>
        concat(lit("t"), pmod(hash(base * lit(31 + i) + lit(i)), lit(50000)))) ++
        (0 until 2).map(i =>
          concat(lit("h"), pmod(hash(base + lit(i * 7)), lit(40))))
      val docs = spark.range(n).toDF("id")
        .select(col("id"), concat_ws(" ", toks: _*).as("text"))
        .repartition(32)
      docs.write.mode("overwrite").parquet(s"$path-docs")
      val d = spark.read.parquet(s"$path-docs")
      // one shared candidate stage (tokenize/dict/index once), two
      // counts. The lazy checkpoint materializes during the FIRST
      // count, so the candidates timing includes the stage cost — the
      // pairs timing then measures verification over the materialized
      // sets (don't read the two numbers as independent full runs).
      val (cands, pairs) = Dedup.prefixJaccardStaged(d, "text", "id", 0.8)
      var nCands = -1L; var nPairs = -1L
      time(s"ppjoin stage+candidates over ${n / 1000000}M docs") {
        nCands = cands.count()
      }
      time(s"ppjoin verify (reuses stage) over ${n / 1000000}M docs") {
        nPairs = pairs.count()
      }
      println(f"[scale-probe] ppjoin candidates=$nCands%d true_pairs=$nPairs%d " +
        f"(all-pairs would be ${n * (n - 1) / 2}%d)")
      spark.stop()
      return
    }
    // Temporal joins at 10M points: sbt "runMain graft.ScaleProbe 10000000 temporal".
    // The as-of plan is one shuffle + one linear window scan per key
    // partition; the range plan one bucketed equi-join — both should
    // scale like a plain shuffle join on the key, which is the claim
    // to check here (wall-clock tracks input size, no pair blow-up).
    if (args.contains("temporal")) {
      val users = math.max(1L, n / 100)
      val monthSec = 2592000
      // materialize both inputs BEFORE timing — otherwise the timed
      // block includes generating + round-robin-shuffling the 10M-row
      // side, which the production operator plan doesn't contain
      val right = spark.range(n).toDF("id").select(col("id"),
          pmod(hash(col("id")), lit(users)).as("k"),
          timestamp_seconds(pmod(hash(col("id") * 7 + 1), lit(monthSec))).as("t"))
        .repartition(32).localCheckpoint(true)
      val left = spark.range(n / 10).toDF("id").select(col("id"),
          pmod(hash(col("id") + 13), lit(users)).as("k"),
          timestamp_seconds(pmod(hash(col("id") * 3 + 5), lit(monthSec))).as("t"))
        .localCheckpoint(true)
      var nAsof = -1L; var nRange = -1L
      // count matched rows, not rows: a bare count() lets Catalyst
      // prune the window column and time only the union+filter
      time(s"asof join ${n / 10000000.0}M left x ${n / 1000000}M right") {
        nAsof = AsofJoin.backward(left, right, "k", "k", "t", "t",
            rightPayload = Seq("id"), rightTieBreak = "id")
          .where(col("asof_id").isNotNull).count()
      }
      time(s"range join 1h lookback, same inputs") {
        nRange = RangeJoin.pointsInLookback(left, right, "k", "k", "t", "t",
          rightPayload = Seq("id"), lookbackSec = 3600, bucketSec = 3600).count()
      }
      println(s"[scale-probe] asof rows=$nAsof range pairs=$nRange")
      spark.stop()
      return
    }
    // LSH cosine self-join telemetry at 1M×64:
    // sbt "runMain graft.ScaleProbe 1000000 lsh". approxCosineSelfJoin's
    // sub-quadratic claim is banded-candidate count tracking true
    // pairs, not n² — reported per projsPerTable (the compound-key
    // knob ml lacks). Fixture: zero-centered hash vectors (isotropic,
    // so random cosines concentrate as N(0, 1/√d) and essentially only
    // planted pairs pass a 0.99 threshold); every id ≡ 1 (mod 100) is
    // a 2%-noise copy of id-1 (~n/100 planted near-dups, cos ≈ 0.9998).
    //
    // Candidate counts are computed ANALYTICALLY from bucket occupancy
    // (Σ n_b·(n_b−1)/2 over (table, key) cells — exactly the rows the
    // banded self-join would materialize) so the pathological configs
    // can be REPORTED instead of run: at d=64 a unit projection of a
    // unit vector concentrates as N(0, 1/8), so at p=1 nearly the whole
    // corpus lands in one bucket per table and the join approaches all
    // pairs (~10¹² rows at 1M — this is the documented ml-scheme
    // failure the compound keys exist to fix). The full operator runs
    // only where the measured candidate count is feasible.
    if (args.contains("lsh")) {
      import org.apache.spark.sql.graftbridge.ColumnBridge
      import graft.expressions.RandomProjectionKeys
      val lshPath = s"$path-lsh"
      if (!new java.io.File(lshPath).exists()) {
        val base = when(col("id") % 100 === 1, col("id") - 1).otherwise(col("id"))
        val noise = when(col("id") % 100 === 1, lit(0.02)).otherwise(lit(0.0))
        val comps = (0 until dim).map { i =>
          (((pmod(hash(base * 31 + lit(i)), lit(2001)) - 1000).cast("double") / 1000.0) +
            noise * ((pmod(hash(col("id") * 17 + lit(i)), lit(2001)) - 1000)
              .cast("double") / 1000.0)).cast("float")
        }
        spark.range(n).toDF("id")
          .select(col("id").as("vec_id"), array(comps: _*).as("embedding"))
          .repartition(32).write.mode("overwrite").parquet(lshPath)
      }
      val v = spark.read.parquet(lshPath).localCheckpoint(true)
      val planted = n / 100
      val tables = 8; val bucketLen = 0.125
      for (p <- Seq(1, 2, 3, 4, 5, 6, 7, 8)) {
        val banded = v.select(col("vec_id"),
            posexplode(ColumnBridge.column(RandomProjectionKeys(
              ColumnBridge.expression(col("embedding")), tables, bucketLen, 42, p))))
          .withColumnRenamed("pos", "__table").withColumnRenamed("col", "__key")
        var nCand = -1L
        time(s"lsh analytic candidate count p=$p") {
          // n·(n−1) is even and the sum stays < 2^53; divide AFTER the
          // long sum (Column `/` is double division and would make
          // getLong throw)
          nCand = banded.groupBy("__table", "__key").count()
            .agg(sum(col("count") * (col("count") - 1))).head().getLong(0) / 2
        }
        var nOut = -1L; var nFound = -1L
        if (nCand < 2000000000L) {
          time(s"lsh full operator p=$p") {
            val out = SimJoin.approxCosineSelfJoin(v, "vec_id", "embedding", 0.99,
                bucketLength = bucketLen, numHashTables = tables, projsPerTable = p)
              .localCheckpoint(true)
            nOut = out.count()
            nFound = out.where(col("id2") === col("id1") + 1 &&
              col("id2") % 100 === 1).count()
          }
        }
        val ran = if (nOut >= 0) s"output=$nOut planted_found=$nFound/$planted"
          else "operator SKIPPED (candidate count infeasible by design at this p)"
        println(f"[scale-probe] lsh p=$p candidates=$nCand $ran " +
          f"(all-pairs would be ${n * (n - 1) / 2})")
      }
      spark.stop()
      return
    }
    // Salted-join skew telemetry: sbt "runMain graft.ScaleProbe 4000000 skew".
    // The scenario salting exists for: one hot key carrying 30% of the
    // big side, and a small side BEYOND broadcast reach (emulated by
    // autoBroadcastJoinThreshold = -1; under the threshold the big side
    // never shuffles and skew cannot hurt — PlanShapeSpec pins that
    // case instead). Three timings on identical inputs: the naive
    // shuffle join (hot key → one straggler task), Skew.saltedJoin
    // (hot key spread over `factor` tasks at the cost of replicating
    // the small side), and the plain join again with AQE's adaptive
    // skew-split enabled — the modern default this operator is the
    // explicit form of (documented so users reach for AQE first and
    // salting where AQE can't help: non-sort-merge plans, pre-AQE
    // clusters, aggregations).
    if (args.contains("skew")) {
      val keys = math.max(1000L, n / 20)
      val big = spark.range(n).toDF("id").select(col("id"),
          when(pmod(col("id"), lit(10)) < 3, lit(0L))
            .otherwise(pmod(hash(col("id")), lit(keys))).as("k"))
        .repartition(32).localCheckpoint(true)
      val small = spark.range(keys).toDF("k").select(col("k"),
          pmod(hash(col("k") * 13 + 7), lit(1000)).as("attr"))
        .repartition(32).localCheckpoint(true)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
      var nPlain = -1L; var nSalted = -1L; var nAqe = -1L
      time(s"plain shuffle join, 30%-hot key, ${n / 1000000}M rows (AQE skew OFF)") {
        nPlain = big.join(small, Seq("k")).count()
      }
      time("salted join factor=8 (same configs)") {
        nSalted = Skew.saltedJoin(big, small, "k", factor = 8).count()
      }
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      time("plain shuffle join (AQE skew split ON)") {
        nAqe = big.join(small, Seq("k")).count()
      }
      require(nPlain == nSalted && nPlain == nAqe,
        s"skew variants must agree: plain=$nPlain salted=$nSalted aqe=$nAqe")
      println(s"[scale-probe] skew join rows=$nPlain (plain = salted = aqe)")
      spark.stop()
      return
    }
    // Decontamination at 1M docs: sbt "runMain graft.ScaleProbe 1000000 decon".
    // The scale claim to check: the eval side's gram hashes BROADCAST,
    // so the corpus side never shuffles and wall-clock tracks one
    // corpus pass (explode + broadcast probe), not a pair join.
    // Corpus: 12 uniform tokens from a 50k vocab per doc; eval set:
    // n/1000 docs, each the EXACT text of corpus doc (j·997 mod n), so
    // the planted contaminated set is known exactly (accidental shared
    // 8-grams across a 50k vocab are ~0) and the survivor count is a
    // closed-form correctness check, not just a timing.
    if (args.contains("decon")) {
      def docText(idCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        concat_ws(" ", (0 until 12).map(i =>
          concat(lit("t"), pmod(hash(idCol * lit(31 + i) + lit(i)), lit(50000)))): _*)
      val corpus = spark.range(n).toDF("id")
        .select(col("id"), docText(col("id")).as("text"))
        .repartition(32).localCheckpoint(true)
      val nEval = math.max(1L, n / 1000)
      val evalDf = spark.range(nEval).toDF("j")
        .select(pmod(col("j") * 997, lit(n)).as("src"))
        .select(col("src").as("id"), docText(col("src")).as("text"))
        .localCheckpoint(true)
      val planted = evalDf.select("id").distinct().count()
      var surv = -1L
      time(s"decontaminate ${n / 1000000}M docs vs $nEval eval docs (8-grams)") {
        surv = Dedup.decontaminate(corpus, evalDf, "text", "id", n = 8).count()
      }
      require(surv == n - planted,
        s"decontamination must drop exactly the $planted planted docs: " +
          s"survivors=$surv expected=${n - planted}")
      println(s"[scale-probe] decon survivors=$surv dropped=$planted (exact)")
      spark.stop()
      return
    }
    // Unigram-LM scoring under Zipf skew at ~100M tokens:
    // sbt "runMain graft.ScaleProbe 1000000 lmscore".
    // The one shape in the curation operators that changes character
    // when the counts frame outgrows broadcast is lmScore's scoring
    // join on the token key (a natural-language head token is ~5% of
    // ALL token rows). Probe: (a) time the operator on a log-uniform
    // (Zipf-1) token distribution where the head token alone is ~6% of
    // the corpus's 100M tokens; (b) report the scoring-join strategy
    // the planner actually chose (AQE broadcasts the vocab-sized
    // counts frame; the shuffle regime only starts when counts outgrow
    // broadcast — THEN pre-aggregate per (doc, token) first, the shape
    // the replay below demonstrates, which shrinks the join's probe
    // side from n_tokens to n_distinct(doc, token) and caps any one
    // key's rows at n_docs); (c) ASSERT three fixed docs' scores
    // against that independently-shaped computation folded driver-side
    // with the same integer micro-nat quantization — a correctness
    // check, not just a timing.
    // sbt "runMain graft.ScaleProbe 10000000 buckets".
    // qualityBuckets at the shape its quantizeDp knob exists for: n
    // rows over 30 groups with NEAR-UNIQUE raw scores (uniform on
    // [0, 25] — the lm_nll regime). At 6 dp the per-group window input
    // would be ~n/30 rows in ONE task; at 3 dp it is bounded by the
    // score range (≤ 25k bins/group, FOREVER). Closed form asserted:
    // uniform scores ⇒ each group's realized head/middle/tail
    // fractions sit within a bin-width of 0.3/0.4/0.3.
    if (args.contains("buckets")) {
      val corpus = spark.range(n).toDF("id")
        .select(col("id"), (col("id") % 30).cast("string").as("grp"),
          (pmod(hash(col("id")), lit(1000000)).cast("double") / 40000.0).as("score"))
        .repartition(32).localCheckpoint(true)
      val out = TextAnalysis.qualityBuckets(corpus, "score", "grp", quantizeDp = 3)
      time(s"qualityBuckets ${n / 1000000}M rows x 30 groups, quantizeDp=3") {
        require(out.queryExecution.toRdd.count() == n, "every row must be labeled")
      }
      val fracs = out.groupBy("grp", "bucket").count()
        .groupBy("grp").agg(
          max(when(col("bucket") === "head", col("count"))).as("h"),
          max(when(col("bucket") === "middle", col("count"))).as("m"),
          sum(col("count")).as("t")).collect()
      fracs.foreach { r =>
        val (h, m, t) = (r.getLong(1).toDouble, r.getLong(2).toDouble, r.getLong(3).toDouble)
        require(math.abs(h / t - 0.3) < 0.01 && math.abs(m / t - 0.4) < 0.01,
          s"group ${r.getString(0)}: head ${h / t}, middle ${m / t} off the uniform closed form")
      }
      println(s"[scale-probe] buckets closed-form fractions within tolerance (n=$n, 30 groups)")
      spark.stop()
      return
    }
    // sbt "runMain graft.ScaleProbe 1000000 paragraphs".
    // Paragraph dedup at the shape it exists for: every doc carries the
    // SAME boilerplate paragraph (a 1M-occurrence hot key — the cookie
    // banner case) between two per-doc-unique paragraphs. Closed form,
    // asserted not just timed: all n docs survive; exactly ONE doc —
    // the (id, pos) minimum, id 0 — keeps the banner; every other doc
    // keeps exactly its two unique paragraphs. The hot key exercises
    // the map-side-combined SortAggregate partial min (1M occurrences
    // collapse to one row per task before the winner shuffle).
    if (args.contains("paragraphs")) {
      val corpus = spark.range(n).toDF("id")
        .select(col("id"), concat(
          lit("unique opening line of doc "), col("id").cast("string"), lit("\n"),
          lit("shared cookie banner paragraph\n"),
          lit("unique closing line of doc "), col("id").cast("string")).as("text"))
        .repartition(32).localCheckpoint(true)
      val out = Dedup.dedupParagraphs(corpus, "text", "id")
      time(s"dedupParagraphs ${n / 1000000}M docs, 1M-occurrence shared para + 2 unique each") {
        require(out.queryExecution.toRdd.count() == n,
          "every doc keeps its unique paragraphs and must survive")
      }
      val plan = out.queryExecution.executedPlan.toString
      val strategy =
        if (plan.contains("LeftOuter, BuildRight")) "winners BROADCAST"
        else if (plan.contains("LeftOuter"))
          "winners shuffle join" +
            (if (plan.contains("ReusedExchange")) ", occurrence exchange REUSED" else "")
        else "unrecognized - inspect plan"
      println(s"[scale-probe] paragraphs winner-join strategy: $strategy")
      val withBanner = out.where(col("text").contains("shared cookie banner"))
        .select("id").collect().map(_.getLong(0)).toSeq
      require(withBanner == Seq(0L),
        s"exactly doc 0 must keep the banner, got ${withBanner.take(5).mkString(",")}")
      val d1 = out.where(col("id") === 1).head().getAs[String]("text")
      require(d1 == "unique opening line of doc 1\nunique closing line of doc 1",
        s"doc 1 must keep exactly its unique paragraphs, got: $d1")
      println(s"[scale-probe] paragraphs closed-form survivor check passed (n=$n)")
      spark.stop()
      return
    }
    // inverse-CDF log-uniform token draw: p(rank r) ∝ 1/r over the
    // vocab (Zipf exponent 1); P(rank 1) = ln2/ln(vocab) ≈ 6.4%
    def zipfCorpus(tokensPerDoc: Int, vocab: Int) = {
      def tok(i: Int): org.apache.spark.sql.Column = {
        val u = (pmod(hash(col("id") * lit(31 + i) + lit(i)), lit(1000000))
          .cast("double") + 0.5) / 1000000.0
        concat(lit("w"), floor(exp(u * math.log(vocab.toDouble))).cast("long"))
      }
      spark.range(n).toDF("id")
        .select(col("id"), concat_ws(" ", (0 until tokensPerDoc).map(tok): _*).as("text"))
        .repartition(32).localCheckpoint(true)
    }

    if (args.contains("lmscore")) {
      val tokensPerDoc = 100
      val vocab = 50000
      val corpus = zipfCorpus(tokensPerDoc, vocab)
      val scored = TextAnalysis.lmScore(corpus, "text", "id")
      // Count through scored's OWN QueryExecution (toRdd), not
      // Dataset.count() — count() compiles a separate execution, so
      // inspecting scored.queryExecution afterwards would show the
      // PRE-execution adaptive plan (isFinalPlan=false, always a
      // sort-merge join) and misreport whatever AQE actually did.
      time(s"lmScore ${n / 1000000}M docs x $tokensPerDoc Zipf toks " +
        s"(${n * tokensPerDoc / 1000000}M tokens)") {
        require(scored.queryExecution.toRdd.count() == n,
          "every doc has tokens; every doc must be scored")
      }
      val plan = scored.queryExecution.executedPlan.toString
      val strategy =
        if (plan.contains("BroadcastHashJoin")) "broadcast (counts frame under AQE threshold)"
        else if (plan.contains("skew=true")) "shuffle join WITH AQE skew split"
        else "shuffle join (no skew split engaged)"
      println(s"[scale-probe] lmscore scoring-join strategy: $strategy")
      // the bounded-vocab path: counts broadcast explicitly (AQE never
      // offers this upgrade — it reads the counts side's stats at its
      // shuffle, before aggregation collapses it), token stream
      // unshuffled, doc partials collapse to one row per doc
      val scoredB = TextAnalysis.lmScore(corpus, "text", "id", broadcastCounts = true)
      time(s"  same with broadcastCounts=true (vocab=$vocab)") {
        require(scoredB.queryExecution.toRdd.count() == n, "broadcast path must score every doc")
      }
      // independent replay via (doc, token) pre-aggregation — the
      // skew-robust shape — folded driver-side for 3 fixed docs
      val toksAll = corpus.select(col("id"),
        explode(split(lower(col("text")), graft.expressions.ShingleHashes.WsRegex)).as("tok"))
      val perDocTok = toksAll.groupBy("id", "tok").agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      val totRow = perDocTok.agg(sum("c"), countDistinct("tok")).head()
      val (nTotal, nVocab) = (totRow.getLong(0), totRow.getLong(1))
      val globalCounts = perDocTok.groupBy("tok").agg(sum("c").as("ct"))
      val sampleRows = perDocTok.where(col("id") < 3).join(globalCounts, "tok")
        .select("id", "c", "ct").collect()
      val got = scored.where(col("id") < 3).select("id", "lm_nll").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      sampleRows.groupBy(_.getLong(0)).foreach { case (id, rows) =>
        var nll = 0L; var nTok = 0L
        rows.foreach { r =>
          val c = r.getLong(1); val ct = r.getLong(2)
          nll += c * math.round(-1e6 * math.log((ct + 1).toDouble / (nTotal + nVocab).toDouble))
          nTok += c
        }
        val e = nll.toDouble / (1e6 * nTok)
        require(math.abs(got(id) - e) <= 5e-7,
          s"doc $id: operator ${got(id)} vs independent replay $e")
      }
      println(s"[scale-probe] lmscore 3-doc independent replay matches " +
        s"(N=$nTotal V=$nVocab)")
      spark.stop()
      return
    }

    // JSONL interchange throughput at 1M docs:
    //   sbt "runMain graft.ScaleProbe 1000000 jsonl"
    // Quantifies the "parquet is the performance format, JSONL the
    // interchange seam" claim: the same 1M-doc corpus written and read
    // both ways. Measured honestly, FULL-ROW scans are comparable on
    // this corpus (text dominates and must be read either way — gzip
    // even beats snappy parquet at rest on highly compressible text);
    // the structural gaps are (a) COLUMN PRUNING — a doc_id-only
    // aggregate reads ~no bytes from parquet but re-parses every JSON
    // byte (~4x measured) — (b) write cost (gzip ~5x) and (c)
    // parallelism fixed at WRITE time (gzip members are unsplittable:
    // one task per shard forever). Those three are why corpora
    // CONVERT at the seam instead of serving queries from JSONL.
    if (args.contains("jsonl")) {
      val tokensPerDoc = 100
      val corpus = zipfCorpus(tokensPerDoc, vocab = 50000)
        .select(col("id").as("doc_id"), col("text"))
      val pqDir = s"$path-jsonl-parquet"
      val jlDir = s"$path-jsonl-gz"
      time(s"parquet write ${n / 1000000}M docs") {
        corpus.write.mode("overwrite").parquet(pqDir)
      }
      time(s"jsonl.gz write ${n / 1000000}M docs (32 shards)") {
        graft.sources.DocIO.writeJsonl(corpus.repartition(32), jlDir,
          compression = Some("gzip"))
      }
      def dirMb(d: String): Long = {
        def walk(f: java.io.File): Long =
          if (f.isFile) f.length else f.listFiles().map(walk).sum
        walk(new java.io.File(d)) / (1 << 20)
      }
      println(s"[scale-probe] at rest: parquet ${dirMb(pqDir)} MB vs jsonl.gz ${dirMb(jlDir)} MB")
      val schema = corpus.schema
      time("parquet full scan (count tokens)") {
        require(spark.read.parquet(pqDir)
          .select(sum(TextAnalysis.tokenCount(col("text")))).head().getLong(0) > 0)
      }
      time("jsonl.gz full scan, FAILFAST schema-enforced") {
        require(graft.sources.DocIO.readJsonl(spark, jlDir, schema)
          .select(sum(TextAnalysis.tokenCount(col("text")))).head().getLong(0) > 0)
      }
      // column pruning is the structural difference: a doc_id-only
      // aggregate reads ~nothing from parquet but re-parses every
      // JSON byte
      time("parquet doc_id-only aggregate (pruned)") {
        require(spark.read.parquet(pqDir).agg(count(lit(1))).head().getLong(0) == n)
      }
      time("jsonl.gz doc_id-only aggregate (no pruning possible)") {
        require(graft.sources.DocIO.readJsonl(spark, jlDir, schema)
          .agg(count(lit(1))).head().getLong(0) == n)
      }
      spark.stop()
      return
    }
    // Classifier fit at corpus scale:
    //   sbt "runMain graft.ScaleProbe 1000000 classifier"
    // This probe measures the per-pass fit cost at 100M tokens in BOTH
    // join shapes — broadcast weights (r14 default: the feature frame
    // keeps its doc partitioning through every iteration, one
    // map-combined token shuffle per pass) vs the pre-r14 shuffle join
    // (the weight join re-shuffled the feature frame by token every
    // iteration) — and pins the weights BIT-IDENTICAL across them (the
    // integer sums commute, so the plan shape cannot move a bit). It
    // also checks the model is RIGHT at scale: half the zipf docs
    // carry a planted marker phrase (the label), and after the fit the
    // marker tokens must hold the largest weights. The scoring pass is
    // then timed in the broadcastWeights serving shape (token stream
    // never shuffles — plan-spec'd in PlanShapeSpec).
    if (args.contains("classifier")) {
      val tokensPerDoc = 100
      val vocab = 50000
      val marked = zipfCorpus(tokensPerDoc, vocab)
        .select(col("id"),
          when(col("id") % 2 === 1,
            concat(col("text"), lit(" qmark0 qmark1 qmark0 qmark1 qmark0" * 4)))
            .otherwise(col("text")).as("text"),
          (col("id") % 2).cast("int").as("y"))
        .repartition(32).localCheckpoint(true)
      val iters = 4
      val model = time(s"classifier fit ${n / 1000000}M docs x ~$tokensPerDoc toks, " +
        s"$iters GD iterations (broadcast weights)") {
        graft.operators.Classifier.fit(marked, "text", "y", "id",
          minCount = 2L, iters = iters, lr = 1.0)
      }
      val modelShuffle = time(s"classifier fit, same corpus " +
        s"(shuffle-join weights, pre-r14 shape)") {
        graft.operators.Classifier.fit(marked, "text", "y", "id",
          minCount = 2L, iters = iters, lr = 1.0, broadcastWeights = false)
      }
      require(model.biasMicro == modelShuffle.biasMicro &&
        model.weights.except(modelShuffle.weights).isEmpty &&
        modelShuffle.weights.except(model.weights).isEmpty,
        "broadcast and shuffle-join fits must be bit-identical — integer sums commute")
      println("[scale-probe] broadcast and shuffle-join weights bit-identical")
      val top = model.weights.orderBy(col("__w_micro").desc).limit(4).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      println(s"[scale-probe] top weights: ${top.toSeq}")
      require(top.map(_._1).count(t => t == "qmark0" || t == "qmark1") >= 2,
        s"planted markers must dominate the learned weights, got ${top.toSeq}")
      val scored = graft.operators.Classifier.scoreAgainst(
        marked, model, "text", "id", broadcastWeights = true)
      time(s"classifier scoring ${n / 1000000}M docs, broadcast weights") {
        require(scored.queryExecution.toRdd.count() == n, "every doc must score")
      }
      // separation sanity at scale: mean prob by true label
      val m = scored.join(marked.select("id", "y"), "id")
        .groupBy("y").agg(avg("clf_prob").as("p")).collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      println(f"[scale-probe] mean clf_prob: y=1 ${m(1)}%.3f vs y=0 ${m(0)}%.3f")
      require(m(1) > m(0) + 0.2, s"marked docs must score clearly higher: $m")
      spark.stop()
      return
    }
    // Hashed-feature classifier collision trade at a web-scale vocab:
    //   sbt "runMain graft.ScaleProbe 1000000 clfbuckets"
    // The r15 VERDICT #3 measurement: a zipf corpus over 500k surface
    // forms blows past any broadcastable exact vocab; hashing into 10k
    // buckets bounds the artifact at ~0.16 MB. What the probe reports:
    // exact vocab size vs occupied buckets (the compression ratio),
    // mean/max tokens-per-bucket (collision load), and — the number a
    // 100 TB user sizes numBuckets from — whether the filter still
    // SEPARATES after collisions (marker-vs-background probability
    // gap, hashed vs exact, same corpus, same GD budget).
    if (args.contains("clfbuckets")) {
      val tokensPerDoc = 100
      val vocab = 500000
      val numBuckets = 10000
      val marked = zipfCorpus(tokensPerDoc, vocab)
        .select(col("id"),
          when(col("id") % 2 === 1,
            concat(col("text"), lit(" qmark0 qmark1 qmark0 qmark1 qmark0" * 4)))
            .otherwise(col("text")).as("text"),
          (col("id") % 2).cast("int").as("y"))
        .repartition(32).localCheckpoint(true)
      val iters = 2
      val exact = time(s"clfbuckets EXACT fit ${n / 1000000}M docs, " +
        s"~$vocab-form vocab, $iters iters") {
        graft.operators.Classifier.fit(marked, "text", "y", "id",
          minCount = 2L, iters = iters, lr = 1.0)
      }
      val hashed = time(s"clfbuckets HASHED fit, $numBuckets buckets") {
        graft.operators.Classifier.fit(marked, "text", "y", "id",
          minCount = 2L, iters = iters, lr = 1.0, numBuckets = numBuckets)
      }
      val exactVocab = exact.weights.count()
      val occupied = hashed.weights.count()
      require(occupied <= numBuckets,
        s"hashed weight frame $occupied rows > $numBuckets buckets")
      // collision load: distinct in-vocab tokens per occupied bucket
      val toks = marked.select(explode(filter(
          split(lower(col("text")), graft.operators.TextAnalysis.Ws),
          t => length(t) > 0)).as("__tok"))
        .groupBy("__tok").agg(count(lit(1)).as("__c"))
        .where(col("__c") >= 2)
        .select(pmod(xxhash64(col("__tok")), lit(numBuckets.toLong)).as("__b"))
        .groupBy("__b").agg(count(lit(1)).as("__load"))
      val load = toks.agg(avg("__load"), max("__load")).head()
      println(f"[scale-probe] clfbuckets: exact vocab $exactVocab%d → " +
        f"$occupied%d/$numBuckets%d buckets occupied " +
        f"(${exactVocab.toDouble / numBuckets}%.1f tokens/bucket mean target); " +
        f"in-vocab collision load mean ${load.getDouble(0)}%.1f max ${load.getLong(1)}%d")
      // does the filter still separate? marker-vs-background prob gap,
      // both models scoring the same corpus
      def gap(m: graft.operators.Classifier.LinearQualityClassifier): Double = {
        val p = graft.operators.Classifier.scoreAgainst(
            marked, m, "text", "id", broadcastWeights = true)
          .join(marked.select("id", "y"), "id")
          .groupBy("y").agg(avg("clf_prob")).collect()
          .map(r => r.getInt(0) -> r.getDouble(1)).toMap
        p(1) - p(0)
      }
      val (ge, gh) = (gap(exact), gap(hashed))
      println(f"[scale-probe] clfbuckets separation: exact gap $ge%.3f, " +
        f"hashed gap $gh%.3f (${100 * gh / ge}%.0f%% retained at " +
        f"${exactVocab / numBuckets}× vocab compression)")
      require(gh > 0.5 * ge,
        f"hashed separation $gh%.3f lost more than half the exact gap $ge%.3f — " +
          "numBuckets too small for this vocab")
      spark.stop()
      return
    }
    // Round-10 frozen-artifact deployment shape at scale:
    // sbt "runMain graft.ScaleProbe 1000000 frozen". Fit + persist the
    // unigram model on the even-id half, score the odd half against the
    // RELOADED model (the cross-JVM path a backfill takes), then label
    // it against frozen bucketBoundaries (dp=3: the window input is
    // bounded by score range, not corpus size). Asserts: 3-doc
    // independent replay of the frozen scores (model-side counts, OOV
    // coalesce), realized head/middle/tail fractions ≈ the 0.3/0.7
    // cuts (same generator both halves), and the labeling join is a
    // BROADCAST (the scored stream never shuffles to get its label).
    if (args.contains("frozen")) {
      val tokensPerDoc = 100
      val vocab = 50000
      val corpus = zipfCorpus(tokensPerDoc, vocab)
      val ref = corpus.where(col("id") % 2 === 0)
      val shard = corpus.where(col("id") % 2 =!= 0)
      val mPath = s"$path-unigram-lm"
      time(s"fitUnigramLm + save (${n / 2000000.0}M docs)") {
        TextAnalysis.saveUnigramLm(TextAnalysis.fitUnigramLm(ref, "text"), mPath)
      }
      val model = TextAnalysis.loadUnigramLm(spark, mPath)
      val scored = TextAnalysis.lmScoreAgainst(shard, model, "text", "id")
      time(s"lmScoreAgainst reloaded model (${n * tokensPerDoc / 2000000}M tokens)") {
        require(scored.queryExecution.toRdd.count() == n / 2,
          "every shard doc must be scored")
      }
      // independent replay for 3 shard docs: per-doc token counts LEFT
      // joined to the REF half's global counts (the frozen denominator)
      val Ws = graft.expressions.ShingleHashes.WsRegex
      val refCounts = ref
        .select(explode(split(lower(col("text")), Ws)).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("ct")).localCheckpoint(true)
      val totRow = refCounts.agg(sum("ct"), count(lit(1))).head()
      val denom = (totRow.getLong(0) + totRow.getLong(1)).toDouble
      val sampleRows = shard.where(col("id") < 7)
        .select(col("id"), explode(split(lower(col("text")), Ws)).as("tok"))
        .groupBy("id", "tok").agg(count(lit(1)).as("c"))
        .join(refCounts, Seq("tok"), "left")
        .select(col("id"), col("c"), coalesce(col("ct"), lit(0L)).as("ct")).collect()
      val got = scored.where(col("id") < 7).select("id", "lm_nll").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      sampleRows.groupBy(_.getLong(0)).foreach { case (id, rows) =>
        var nll = 0L; var nTok = 0L
        rows.foreach { r =>
          val c = r.getLong(1); val ct = r.getLong(2)
          nll += c * math.round(-1e6 * math.log((ct + 1).toDouble / denom))
          nTok += c
        }
        val e = nll.toDouble / (1e6 * nTok)
        require(math.abs(got(id) - e) <= 5e-7,
          s"doc $id: frozen operator ${got(id)} vs independent replay $e")
      }
      println(s"[scale-probe] frozen 3-doc independent replay matches (denom=$denom)")
      // frozen cuts fit on the scored REF half, applied to the shard.
      // group = (id div 2) mod 4, NOT id mod 4: the halves split on id
      // parity, so id mod 4 would give the ref half groups {0,2} and
      // the shard {1,3} — no overlap, and applyBuckets would (rightly)
      // drop every unknown-group row
      val g = pmod(floor(col("id") / 2).cast("long"), lit(4)).cast("string").as("g")
      val scoredRef = TextAnalysis.lmScoreAgainst(ref, model, "text", "id").withColumn("g", g)
      // bucketBoundaries is EAGER (artifact materializes at fit), so
      // the fit must be constructed inside the timed block or the
      // label lies about what it measures
      val (labeled, fracs) = time(s"bounds fit + applyBuckets (${n / 2000000.0}M docs, 4 groups)") {
        val bounds = TextAnalysis.bucketBoundaries(scoredRef, "lm_nll", "g", quantizeDp = 3)
        val l = TextAnalysis.applyBuckets(scored.withColumn("g", g), bounds,
          "lm_nll", "g", quantizeDp = 3)
        (l, l.groupBy("g", "bucket").agg(count(lit(1)).as("c")).collect())
      }
      val byGroup = fracs.groupBy(_.getString(0))
      byGroup.foreach { case (grp, rows) =>
        val tot = rows.map(_.getLong(2)).sum.toDouble
        val f = rows.map(r => r.getString(1) -> r.getLong(2) / tot).toMap
        require(math.abs(f.getOrElse("head", 0.0) - 0.3) < 0.05 &&
          math.abs(f.getOrElse("middle", 0.0) - 0.4) < 0.05,
          s"group $grp realized fractions $f drifted from the 0.3/0.7 cuts")
      }
      println(s"[scale-probe] frozen-cut fractions within 0.05 of 0.3/0.4/0.3 " +
        s"for all ${byGroup.size} groups")
      val lplan = labeled.queryExecution.executedPlan.toString
      require(lplan.contains("BroadcastHashJoin"),
        "applyBuckets must label through a broadcast join")
      spark.stop()
      return
    }
    // packShards at scale: sbt "runMain graft.ScaleProbe 10000000 pack".
    // Variable token counts with a CLOSED-FORM exclusive cumsum
    // (periodic sizes id%13+1: cum0(id) = 91*(id div 13) + T(id mod 13))
    // let the two-level prefix sum be validated against exact arithmetic
    // on EVERY row — not a sample — in one scan.
    if (args.contains("pack")) {
      val budget = 100000L
      val rows = spark.range(n).toDF("id")
        .withColumn("toks", pmod(col("id"), lit(13)) + 1)
        .repartition(32).localCheckpoint(true)
      val packed = TextAnalysis.packShards(rows, "toks", "id", budget, nBuckets = 256)
      time(s"packShards ${n / 1000000}M rows (budget=$budget, 256 buckets)") {
        require(packed.queryExecution.toRdd.count() == n, "every row must be assigned")
      }
      val k = pmod(col("id"), lit(13))
      val cum0 = (col("id") - k) / lit(13) * lit(91L) + k * (k + 1) / lit(2)
      val expect = floor(cum0 / lit(budget)).cast("long")
      time("full closed-form validation (every row)") {
        require(packed.where(col("shard") =!= expect).count() == 0,
          "two-level prefix sum diverged from the closed-form cumsum")
      }
      val nShards = packed.agg(countDistinct(col("shard"))).head().getLong(0)
      // exact: total = 91 full-cycle tokens per 13 ids + the tail
      // triangle; the last shard is floor(cum0(last)/budget)
      val total = (n / 13) * 91L + (n % 13) * (n % 13 + 1) / 2
      val want = (total - ((n - 1) % 13 + 1)) / budget + 1
      require(nShards == want, s"$nShards shards vs expected $want")
      println(s"[scale-probe] packShards: $nShards shards, all $n rows closed-form exact")
      spark.stop()
      return
    }
    // IVFADC at 1M: sbt "runMain graft.ScaleProbe 1000000 ivfpq".
    // The composed serving tier measured at 2000× the fixture: build
    // both quantizers once (coarse k-means + Lloyd codebooks over the
    // hash-ordered sample), persist the CODED cell-partitioned layout,
    // then time probe-limited ADC search against (a) the lazy lineage
    // and (b) the persisted codes, with recall@10 vs the exact scan
    // asserted — a number, not a vibe — and the at-rest byte telemetry
    // printed (m·codeBytes+8 vs 4·dim per row).
    if (args.contains("ivfpq")) {
      import graft.operators.IvfPqIndex
      // Corpus = the 1M uniform-random background + 10 PLANTED near-
      // duplicates of the query (cos ≈ 0.9999 — the LSH probe's
      // convention). The uniform background is deliberate worst-case
      // context: its own "top-10" are statistical ties whose cosine
      // gaps (~1e-3) sit INSIDE the m=8 quantization distortion, so
      // no coded representation can rank them — and the probe doesn't
      // claim to. What the operator contracts to find is REAL
      // neighbors, far outside distortion: the planted set.
      val planted = spark.range(10).toDF("i")
        .select((col("i") + n).as("vec_id"),
          array((0 until dim).map(j =>
            (lit(query(j)) + (rand(seed = 99 + j) - lit(0.5)) * lit(0.004))
              .cast("float")): _*).as("embedding"))
      val corpus = e.unionByName(planted).repartition(32).localCheckpoint(true)
      // maxTrain bounds the driver-side Lloyd fit — fit cost is a
      // function of the SAMPLE, never the corpus (fit once, encode
      // anywhere, the frozen-artifact contract)
      val idx = time("ivfpq build nlist=64 m=8 k=256 maxTrain=16k") {
        IvfPqIndex.build(corpus, "embedding", nlist = 64, m = 8, k = 256,
          maxTrain = 16384)
      }
      val codedPath = s"$path-ivfpq"
      time("ivfpq save (cell-partitioned codes)")(idx.save(codedPath))
      val re = IvfPqIndex.load(spark, codedPath)
      val truth = (Set(0L) ++ (0 until 10).map(_ + n)) // self + planted
      for (nprobe <- Seq(4, 16, 64)) {
        val shortlist = time(f"ivfpq shortlist-50 nprobe=$nprobe%-3d (persisted codes)") {
          re.search(query, k = 50, nprobe = nprobe, tieBreakers = Seq(asc("vec_id")))
            .select("vec_id").collect().map(_.getLong(0)).toSet
        }
        println(f"[scale-probe]   true neighbors (self+10 planted) in ADC-top-50: " +
          f"${(shortlist & truth).size}%2d/11")
      }
      val perRowCoded = idx.model.m * idx.model.codeBytes + 8
      val perRowVec = dim * 4
      val ratio = perRowVec.toDouble / perRowCoded
      println(f"[scale-probe] at-rest payload: $perRowCoded B/row coded vs " +
        f"$perRowVec B/row float32 ($ratio%.1fx)")
      // batch path: 100 queries through the code-carrying cell join
      time("ivfpq searchMany 100q x k10 nprobe=8") {
        val q = e.where(col("vec_id") < 100)
          .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        re.searchMany(q, "query_id", "qe", "vec_id", k = 10, nprobe = 8).collect()
      }
      spark.stop()
      return
    }
    // Residual vs raw PQ coding at 1M CLUSTERED rows:
    //   sbt "runMain graft.ScaleProbe 1000000 ivfpqresidual"
    // The Jégou §IV-A recall lever measured at scale (r15 VERDICT #2):
    // one clustered corpus (64 seeded centers, per-dim noise — the
    // regime where raw codebooks spend their k codewords separating
    // clusters while residual codebooks keep within-cluster detail),
    // both codings built at EQUAL m/k/maxTrain, top-10 recall vs the
    // exact scan compared over 8 queries — residual ≥ raw asserted, a
    // number not a vibe.
    if (args.contains("ivfpqresidual")) {
      import graft.operators.IvfPqIndex
      // Clustered background (64 seeded centers, in-cluster cosine
      // ≈ 0.985) + 10 PLANTED near-duplicates of the query at
      // cos ≈ 0.9999 — the ivfpq probe's convention. The ranking gap
      // (planted vs in-cluster background ≈ 0.015) is exactly the
      // scale a coding's distortion must beat: raw codebooks spend
      // their k codewords separating 64 clusters (distortion ≈ the
      // cluster radius — the gap drowns), residual codebooks quantize
      // only the within-cluster noise ball. Equal m/k/maxTrain.
      val centers = Array.tabulate(64, dim)((c, j) => math.sin(c * 2.1 + j * 0.7).toFloat)
      val background = spark.range(n).toDF("vec_id")
        .withColumn("__c", pmod(col("vec_id"), lit(64)).cast("int"))
        .select(col("vec_id"), array((0 until dim).map(j =>
          (element_at(lit(centers.map(_(j))), col("__c") + 1) +
            (rand(seed = 7 + j) - lit(0.5)) * lit(0.3)).cast("float")): _*)
          .as("embedding"))
      val probeQ = background.where(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val planted = spark.range(10).toDF("i")
        .select((col("i") + n).as("vec_id"),
          array((0 until dim).map(j =>
            (lit(probeQ(j)) + (rand(seed = 99 + j) - lit(0.5)) * lit(0.004))
              .cast("float")): _*).as("embedding"))
      val corpus = background.unionByName(planted)
        .repartition(32).localCheckpoint(true)
      val truth = (Set(0L) ++ (0 until 10).map(_.toLong + n))
      def recallOf(byResidual: Boolean): Double = {
        val idx = time(f"ivfpqresidual build res=$byResidual nlist=64 m=16 k=256") {
          IvfPqIndex.build(corpus, "embedding", nlist = 64, m = 16, k = 256,
            maxTrain = 16384, byResidual = byResidual)
        }
        val got = idx.search(probeQ, k = 50, nprobe = 8,
            tieBreakers = Seq(asc("vec_id")))
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (got & truth).size.toDouble / truth.size
      }
      val raw = recallOf(byResidual = false)
      val res = recallOf(byResidual = true)
      println(f"[scale-probe] ivfpqresidual planted-neighbor recall in ADC-top-50: " +
        f"raw=$raw%.3f residual=$res%.3f (equal m=16 k=256, nprobe=8/64)")
      require(res >= raw,
        f"residual recall $res%.3f fell below raw $raw%.3f at equal m/k")
      spark.stop()
      return
    }
    // Two-stage Matryoshka retrieval at 1M:
    //   sbt "runMain graft.ScaleProbe 1000000 matryoshka"
    // Two measurements, one honest finding each. (1) CORRECTNESS at
    // scale: on a prefix-heavy corpus the two-stage plan returns the
    // exact top-10 through a 1000-row shortlist. (2) COST: the in-plan
    // slice variant does NOT beat the full scan at in-memory d = 64
    // (the dot is memory-bound; slicing allocates) — the wall-clock
    // win needs the prefix MATERIALIZED as its own column, where stage
    // 1 reads prefixDims/dim of the BYTES (the shape a 100 TB layout
    // stores anyway: a short-vector column beside the full one).
    // Asserted: materialized-prefix stage 1 beats the full-dim pass.
    if (args.contains("matryoshka")) {
      import graft.operators.Nearest
      // signal in dims 0–15, small noise in the tail — the MRL shape
      val corpus = spark.range(n).toDF("vec_id")
        .select(col("vec_id"), array((0 until dim).map(j =>
          (if (j < 16) sin(col("vec_id").cast("double") * lit(0.37 + j * 0.01))
           else (rand(seed = 31 + j) - lit(0.5)) * lit(0.05)).cast("float")): _*)
          .as("embedding"))
        .repartition(32).localCheckpoint(true)
      val q = corpus.where(col("vec_id") === 7).select("embedding")
        .head().getSeq[Float](0).toArray
      val full = time("matryoshka: FULL-dim topK over 1M × 64") {
        Nearest.topK(corpus, "embedding", lit(q), n = 10,
            tieBreakers = Seq(asc("vec_id")))
          .select("vec_id").collect().map(_.getLong(0)).toSeq
      }
      val two = time("matryoshka: prefix-16 shortlist-1000 + re-rank") {
        Nearest.twoStageTopK(corpus, "embedding", q, n = 10,
            prefixDims = 16, shortlist = 1000, tieBreakers = Seq(asc("vec_id")))
          .select("vec_id").collect().map(_.getLong(0)).toSeq
      }
      require(two == full,
        s"prefix-heavy corpus: two-stage must return the exact top-10\n$two\n$full")
      // the BYTES story: a materialized 16-dim prefix column makes
      // stage 1 a quarter-width scan — the layout a 100 TB run stores
      val pref = corpus.select(col("vec_id"),
          slice(col("embedding"), 1, 16).as("prefix"))
        .repartition(32).localCheckpoint(true)
      val tFull = System.nanoTime()
      Nearest.topK(corpus, "embedding", lit(q), n = 1000,
        tieBreakers = Seq(asc("vec_id"))).select("vec_id").collect(): Unit
      val fullNs = System.nanoTime() - tFull
      val tPre = System.nanoTime()
      Nearest.topK(pref, "prefix", lit(q.take(16)), n = 1000,
        tieBreakers = Seq(asc("vec_id"))).select("vec_id").collect(): Unit
      val preNs = System.nanoTime() - tPre
      println(f"[scale-probe] matryoshka stage-1 cost: materialized prefix " +
        f"${preNs / 1e9}%.2f s vs full-dim ${fullNs / 1e9}%.2f s " +
        f"(${fullNs.toDouble / preNs}%.2fx — the win is BYTES, so store the prefix)")
      require(preNs < fullNs,
        "the materialized-prefix pass must beat the full-dim pass")
      println("[scale-probe] matryoshka: exact top-10 recovered through the " +
        "prefix shortlist")
      // Over the AT-REST artifact (r16 VERDICT #2): write the
      // prefix-materialized corpus to parquet once, then measure BYTES
      // READ per pass via /proc/self/io rchar — the one counter that
      // sees parquet's nio local reads (both Spark's task inputMetrics
      // and Hadoop's FS statistics report only footer bytes on this
      // path, measured: 0.2 MB "read" from a 327 MB file). local[32]
      // is one JVM, so rchar covers driver + executors exactly.
      val dir = java.nio.file.Files.createTempDirectory("graft_matry_probe").toString
      try {
        Nearest.materializePrefix(corpus, "embedding", 16)
          .write.mode("overwrite").parquet(dir)
        val stored = spark.read.parquet(dir)
        def du(f: java.io.File): Long =
          if (f.isFile) f.length
          else Option(f.listFiles()).getOrElse(Array.empty).map(du).sum
        println(f"[scale-probe] matryoshka parquet at rest: " +
          f"${du(new java.io.File(dir)) / 1e6}%.1f MB")
        def rchar(): Long =
          java.nio.file.Files.readAllLines(
              java.nio.file.Paths.get("/proc/self/io")).toArray
            .map(_.toString).find(_.startsWith("rchar:"))
            .map(_.split(":")(1).trim.toLong).getOrElse(0L)
        def measured[T](body: => T): (T, Long) = {
          val before = rchar()
          val r = body
          (r, rchar() - before)
        }
        // STAGE 1 — the artifact's claim: the shortlist pass scans
        // (id, prefix) only, prefixDims/dim of the vector bytes
        val (_, s1Bytes) = measured {
          Nearest.prefixShortlistFrame(stored, "embedding_prefix", "vec_id",
            q, prefixDims = 16, shortlist = 1000,
            tieBreakers = Seq(asc("vec_id"))).collect(): Unit
        }
        val (fullRest, fullBytes) = measured {
          Nearest.topK(stored, "embedding", lit(q), n = 10,
              tieBreakers = Seq(asc("vec_id")))
            .select("vec_id").collect().map(_.getLong(0)).toSeq
        }
        val (prefRest, e2eBytes) = measured {
          Nearest.twoStagePrefixTopK(stored, "embedding", "embedding_prefix",
              "vec_id", q, n = 10, prefixDims = 16, shortlist = 1000,
              tieBreakers = Seq(asc("vec_id")))
            .select("vec_id").collect().map(_.getLong(0)).toSeq
        }
        require(prefRest == fullRest,
          s"at-rest prefix path must return the exact top-10\n$prefRest\n$fullRest")
        println(f"[scale-probe] matryoshka bytes read (parquet at rest): " +
          f"stage-1 prefix scan ${s1Bytes / 1e6}%.1f MB vs full-vector pass " +
          f"${fullBytes / 1e6}%.1f MB (${fullBytes.toDouble / s1Bytes}%.2fx cut); " +
          f"two-scan end-to-end ${e2eBytes / 1e6}%.1f MB")
        // the assertable claim is STAGE 1 (the corpus-scale pass reads
        // prefix bytes only); end-to-end is reported, not asserted —
        // stage 2's fetch is LAYOUT-dependent (a uniformly-spread
        // 1000-id shortlist hits every row group, so the pushed In
        // predicate prunes nothing on this unsorted fixture; an
        // id-clustered or bucketed layout is what makes stage 2 cheap
        // at 100 TB, and overclaiming here would test the fixture)
        require(s1Bytes * 2 < fullBytes,
          s"stage 1 must read well under half the full pass's bytes: " +
            s"$s1Bytes vs $fullBytes")
      } finally {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm); f.delete(): Unit
        }
        rm(new java.io.File(dir))
      }
      spark.stop()
      return
    }
    // OPQ vs plain PQ at 1M CORRELATED rows:
    //   sbt "runMain graft.ScaleProbe 1000000 opq"
    // The Ge et al. 2013 regime at scale: axis-aligned anisotropic
    // energy (variance decaying 0.62^d) MIXED by a fixed dense
    // orthogonal matrix, so correlated energy straddles every fixed
    // subspace boundary — plain PQ wastes its codewords, the learned
    // rotation un-mixes. Asserted at equal m/k: the distortion
    // trajectory falls over the alternation AND the corpus-wide
    // reconstruction quality (selfSimilarity over all 1M rows — where
    // the codes actually serve) beats plain PQ's. Top-k recall is the
    // SPEC's claim on a locally-structured fixture; a 1M uniform blob
    // in ~15 effective dims crowds every query too densely for any
    // coding to separate, so asserting recall here would test the
    // fixture, not the coding.
    if (args.contains("opq")) {
      import graft.operators.{OpqIndex, PqIndex}
      import org.apache.spark.sql.graftbridge.ColumnBridge
      // fixed dense rotation via seeded Gram-Schmidt (driver-side)
      val mixRnd = new scala.util.Random(7)
      val gs = Array.fill(dim, dim)(mixRnd.nextGaussian())
      for (j <- 0 until dim) {
        for (p <- 0 until j) {
          val dot = (0 until dim).map(i => gs(i)(j) * gs(i)(p)).sum
          for (i <- 0 until dim) gs(i)(j) -= dot * gs(i)(p)
        }
        val nn = math.sqrt((0 until dim).map(i => gs(i)(j) * gs(i)(j)).sum)
        for (i <- 0 until dim) gs(i)(j) /= nn
      }
      val mix = Array.tabulate(dim * dim)(x => gs(x / dim)(x % dim).toFloat)
      val z = array((0 until dim).map(j =>
        ((rand(seed = 11 + j) - lit(0.5)) * lit(3.46 * math.pow(0.62, j)))
          .cast("float")): _*)
      val corpus = spark.range(n).toDF("vec_id")
        .withColumn("embedding", ColumnBridge.column(
          graft.expressions.RotateVector(
            ColumnBridge.expression(z), mix, dim)))
        .repartition(32).localCheckpoint(true)
      // maxTrain 16k, 4 alternations: the fit is DRIVER-side Lloyd
      // (the production convention — codebooks are always sample-fit),
      // so probe cost is alternations × Lloyd(sample), not corpus size
      val pq = time("opq probe: plain PQ fit m=16 k=256 (16k sample)") {
        PqIndex.fit(corpus, "embedding", m = 16, k = 256, maxTrain = 16384)
      }
      val opq = time("opq probe: OPQ fit m=16 k=256, 4 alternations (16k sample)") {
        OpqIndex.fit(corpus, "embedding", m = 16, k = 256, maxTrain = 16384,
          opqIters = 4)
      }
      println("[scale-probe] opq distortion trajectory: " +
        opq.distortions.map(d => f"$d%.1f").mkString(" → "))
      val encPq = time("opq probe: PQ encode 1M") {
        PqIndex.encode(corpus, "embedding", pq).drop("embedding")
          .localCheckpoint(true)
      }
      val encOpq = time("opq probe: OPQ rotate+encode 1M") {
        OpqIndex.encode(corpus, "embedding", opq).localCheckpoint(true)
      }
      // corpus-wide RECONSTRUCTION quality (PqIndex.selfSimilarity —
      // cos(row, its own codes) over all 1M rows): the distortion cut
      // the alternation won on the sample must survive on the corpus,
      // measured where the codes actually serve. (Top-k recall is not
      // separable on this fixture — 1M points in ~15 effective dims
      // crowd every query within the planted gap, so NO coding finds
      // planted neighbors; the search-quality win is OpqIndexSpec's,
      // on a fixture with real local structure.)
      val meanPq = PqIndex.selfSimilarity(corpus, "embedding", pq)
        .agg(avg("self_sim"), min("self_sim")).head()
      val rotated = corpus.withColumn("__rot", ColumnBridge.column(
        graft.expressions.RotateVector(
          ColumnBridge.expression(col("embedding")), opq.rotation, dim)))
      val meanOpq = PqIndex.selfSimilarity(rotated, "__rot", opq.pq)
        .agg(avg("self_sim"), min("self_sim")).head()
      println(f"[scale-probe] opq corpus self-similarity (1M rows): " +
        f"OPQ mean ${meanOpq.getDouble(0)}%.5f / min ${meanOpq.getDouble(1)}%.5f vs " +
        f"PQ mean ${meanPq.getDouble(0)}%.5f / min ${meanPq.getDouble(1)}%.5f " +
        f"(equal m=16 k=256; ${opq.distortions.head / opq.distortions.last}%.2fx " +
        "distortion cut over the alternation)")
      require(meanOpq.getDouble(0) > meanPq.getDouble(0),
        "OPQ must reconstruct the corpus better than plain PQ at equal m/k")
      require(opq.distortions.last < opq.distortions.head,
        s"the alternation must reduce distortion: ${opq.distortions.toSeq}")
      // the encoded frames exist for their TIMINGS (coded-tier encode
      // throughput at 1M); serving equivalence is the spec's
      require(encPq.count() == n && encOpq.count() == n)
      spark.stop()
      return
    }
    // Budgeted selection at 10M rows:
    //   sbt "runMain graft.ScaleProbe 10000000 budget"
    // The two-level threshold-find vs the naive rule it provably
    // equals: the naive formulation is a GLOBAL ordered cumulative
    // window — an unpartitioned sort + one-task running sum; the
    // two-level path pays one map-combined bucket aggregate, a driver
    // prefix over <= numBuckets rows, and the ordered window over ONE
    // boundary bucket (~1/numBuckets of the corpus). Both timed on the
    // same corpus, results asserted IDENTICAL.
    if (args.contains("budget")) {
      import graft.operators.TextAnalysis
      val corpus = spark.range(n).toDF("doc_id")
        .withColumn("score", pmod(xxhash64(col("doc_id")), lit(100000)).cast("double"))
        .withColumn("toks", pmod(xxhash64(col("doc_id") + 7), lit(500)) + 1)
        .repartition(32).localCheckpoint(true)
      val budget = n * 25L // ~10% of expected total tokens (mean ~250)
      val twoLevel = time(f"budget: two-level threshold-find over ${n / 1000000}M") {
        TextAnalysis.selectTokenBudget(corpus, "score", "doc_id", "toks",
            budget, numBuckets = 1024, maxBoundaryRows = 10000000L)
          .agg(count(lit(1)), sum(col("doc_id"))).head()
      }
      val naive = time(f"budget: naive global ordered window over ${n / 1000000}M") {
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id").asc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        corpus.withColumn("__c", sum(col("toks")).over(w))
          .where(col("__c") <= budget)
          .agg(count(lit(1)), sum(col("doc_id"))).head()
      }
      require(twoLevel.getLong(0) == naive.getLong(0) &&
        twoLevel.getLong(1) == naive.getLong(1),
        s"two-level must equal the naive rule: $twoLevel vs $naive")
      println(f"[scale-probe] budget selection: two-level == naive on " +
        f"${twoLevel.getLong(0)} selected rows (id-sum checked)")
      spark.stop()
      return
    }
    // OPQ∘IVFADC (the first-class FAISS factory stack, r16 VERDICT #1)
    // vs plain residual IVFADC at 1M rows:
    //   sbt "runMain graft.ScaleProbe 1000000 opqivfpq"
    // Fixture = ivfpqresidual's clustered planted-neighbor corpus, but
    // BOTH the centers and the within-cluster noise are ANISOTROPIC in
    // the pre-mix axes (center energy decaying 0.85^d, noise 0.62^d)
    // and the whole space is mixed by ONE fixed dense orthogonal
    // matrix — so residuals straddle every fixed subspace boundary,
    // and un-mixing the full vectors (what the OPQ alternation can
    // see) also un-mixes the residual noise ball. Residual coding
    // alone pays the correlated-energy waste Ge et al. name; the
    // learned pretransform recovers it BEFORE the residual split.
    // (With ISOTROPIC full-dim centers the alternation has nothing to
    // compact — measured: the full-vector-trained rotation then
    // scrambles the residual domain and LOSES to plain residual; the
    // correlated regime is the claim, so the fixture is correlated in
    // centers and noise alike.) Equal m/k/maxTrain/nlist/nprobe;
    // recall of the planted set in the ADC top-50, OPQ∘residual >=
    // residual asserted.
    // Streaming-ingest maintenance loop at 1M (round 19):
    //   sbt "runMain graft.ScaleProbe 1000000 ingest"
    // Claims probed: (a) per-batch ingest cost is BATCH-proportional —
    // assignment/encode are map-side against broadcast frozen
    // artifacts and the existing layout is never re-read, so the cost
    // stays FLAT while the layout grows (the last batch lands in a
    // layout 1.3× the first's); (b) the codecGuard adds one
    // bounded-sample measurement per batch; (c) a replayed batchId
    // costs one FS probe; (d) compaction is the amortized maintenance
    // step — timed separately, and it bounds files/cell back to 1.
    if (args.contains("ingest")) {
      import graft.operators.OpqIvfPqIndex
      val batches = 5
      val batchRows = 50000L
      val baseRows = n - batches * batchRows
      require(baseRows > 0, s"need n > ${batches * batchRows}")
      val dir = s"/tmp/graft_scale_ingest_$n"
      def rmTree(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
        f.delete(): Unit
      }
      rmTree(new java.io.File(dir))
      val idx = time(s"ingest: build OPQ,IVF64,PQ8 on ${baseRows / 1000}k") {
        OpqIvfPqIndex.build(e.where(col("vec_id") < baseRows), "embedding",
          nlist = 64, m = 8, k = 256, maxTrain = 16384, opqIters = 2,
          byResidual = true)
      }
      time("ingest: save layout")(idx.save(dir))
      val perBatch = (0 until batches).map { b =>
        val lo = baseRows + b * batchRows
        val batch = e.where(col("vec_id") >= lo && col("vec_id") < lo + batchRows)
        val t0 = System.nanoTime()
        val appended = idx.ingestBatch(dir, batch, "embedding", b.toLong,
          compactFilesPerCell = 1 << 20) // cadence off: compaction timed below
        val sec = (System.nanoTime() - t0) / 1e9
        require(appended, s"batch $b must append")
        println(f"[scale-probe] ingest: batch $b (${batchRows / 1000}%dk rows into " +
          f"${(lo) / 1000}%dk-row layout) $sec%8.2f s")
        sec
      }
      time("ingest: replay batch 0 (one FS probe, skipped)") {
        require(!idx.ingestBatch(dir,
          e.where(col("vec_id") >= baseRows &&
            col("vec_id") < baseRows + batchRows), "embedding", 0L))
      }
      val preFiles = OpqIvfPqIndex.layoutStats(spark, dir)
        .agg(max(col("n_files"))).head().getLong(0)
      time(s"ingest: compactSaved ($preFiles files in the fullest cell)") {
        OpqIvfPqIndex.compactSaved(spark, dir)
      }
      val postFiles = OpqIvfPqIndex.layoutStats(spark, dir)
        .agg(max(col("n_files"))).head().getLong(0)
      val total = time("ingest: reopen + count") {
        OpqIvfPqIndex.load(spark, dir).inner.encoded.count()
      }
      require(total == n, s"reopened layout must hold all $n rows, got $total")
      require(postFiles < preFiles && postFiles <= 2,
        s"compaction must collapse the accreted files: $preFiles -> $postFiles")
      println(f"[scale-probe] ingest: per-batch seconds " +
        perBatch.map(s => f"$s%.2f").mkString("  ") +
        f"  files/cell $preFiles -> $postFiles")
      // flatness: no O(layout) term in the append (generous bound rides
      // box noise; the regression this guards is re-reading the layout
      // per batch)
      require(perBatch.last <= perBatch.head * 3 + 2.0,
        f"per-batch ingest cost must stay flat as the layout grows: " +
          f"${perBatch.head}%.2f -> ${perBatch.last}%.2f s")
      rmTree(new java.io.File(dir))
      spark.stop()
      return
    }
    // Drift repair IN the streaming loop at 1M (round 20, r19 VERDICT
    // #4 — the ivfskew scenario re-run with the cadence ON):
    //   sbt "runMain graft.ScaleProbe 1000000 ingestrepair"
    // Claims probed: (a) a zipf-drifted STREAM self-heals — the
    // ivfIngestPerBatch repairMaxRows cadence runs repairSaved inside
    // the serial foreachBatch slot and the post-drain cell cap HOLDS;
    // (b) the repair tax lands on the batches that overflow the cap,
    // visible in the per-batch drain timing, and pays only hot-cell
    // rewrites; (c) probe cost on the healed layout is ~nprobe/nlist
    // of the corpus — the scan-rows measure ivfskew shows piling up
    // ~10x without the cadence.
    if (args.contains("ingestrepair")) {
      val nlist = 64
      val rnd = new scala.util.Random(4242)
      val anchors: Array[Array[Float]] =
        Array.fill(nlist)(Array.fill(dim)(((rnd.nextDouble() - 0.5) * 2).toFloat))
      import spark.implicits._
      val anchorsDf = broadcast(anchors.zipWithIndex
        .map { case (v, i) => (i, v) }.toSeq.toDF("zk", "anchor"))
      def cellDraw(zipf: Boolean): org.apache.spark.sql.Column =
        if (!zipf) pmod(hash(col("vec_id") + lit(17)), lit(nlist)).cast("int")
        else {
          val u = (pmod(hash(col("vec_id") * lit(131) + lit(7)), lit(1000000))
            .cast("double") + 0.5) / 1000000.0
          (least(floor(exp(u * math.log(nlist + 1.0))), lit(nlist.toDouble)) - 1)
            .cast("int")
        }
      def corpusSlice(zipf: Boolean, lo: Long, hi: Long) =
        spark.range(lo, hi).toDF("vec_id")
          .withColumn("zk", cellDraw(zipf))
          .join(anchorsDf, "zk")
          .select(col("vec_id"), transform(col("anchor"), (a, j) =>
            (a + (pmod(hash(col("vec_id") * lit(8191) + j * lit(127) + lit(3)),
              lit(1000)).cast("double") / 1000.0 - 0.5) * 0.1).cast("float"))
            .as("embedding"))
      val batches = 4
      val baseRows = n / 2
      val batchRows = (n - baseRows) / batches
      val dir = s"/tmp/graft_scale_ingestrepair_$n"
      val watch = s"$dir-watch"
      def rmTree(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rmTree)
        f.delete(): Unit
      }
      rmTree(new java.io.File(dir)); rmTree(new java.io.File(watch))
      new java.io.File(watch).mkdirs()
      time(s"ingestrepair: balanced base save (${baseRows / 1000}k rows, $nlist cells)") {
        IvfIndex.withCentroids(corpusSlice(zipf = false, 0, baseRows),
          "embedding", anchors).save(dir)
      }
      time(s"ingestrepair: stage $batches zipf-drifted batch files (${batchRows / 1000}k rows each)") {
        (0 until batches).foreach { b =>
          val stage = s"$watch-stage-$b"
          corpusSlice(zipf = true, baseRows + b * batchRows,
            baseRows + (b + 1) * batchRows)
            .coalesce(1).write.mode("overwrite").parquet(stage)
          val part = new java.io.File(stage).listFiles()
            .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
            .getOrElse(sys.error(s"no part file under $stage"))
          java.nio.file.Files.move(part.toPath,
            java.nio.file.Paths.get(s"$watch/b$b.parquet"))
          rmTree(new java.io.File(stage))
        }
      }
      val cap = 2L * n / nlist
      val schema = spark.read.parquet(s"$watch/b0.parquet").schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(watch)
      val idx = IvfIndex.load(spark, dir)
      time(f"ingestrepair: drain $batches batches with repairMaxRows=$cap%,d in the loop") {
        val q = graft.streaming.StreamOps.ivfIngestPerBatch(stream, idx, dir,
          repairMaxRows = Some(cap))
        try q.processAllAvailable() finally q.stop()
      }
      val healed = IvfIndex.load(spark, dir)
      val (total, worst) = healed.cellSizeStats
        .agg(sum(col("n")), max(col("n"))).head() match {
        case r => (r.getLong(0), r.getLong(1))
      }
      require(total == n, s"drained layout must hold all $n rows, got $total")
      require(worst <= cap,
        f"post-drain fullest cell $worst%,d must hold the cap $cap%,d")
      require(healed.centroidVectors.length > nlist,
        "the cadence must have widened the quantizer")
      val factor = worst.toDouble / (total.toDouble / healed.centroidVectors.length)
      // probe cost INSIDE the (pre-repair) hot region: scanned rows on
      // the healed layout stay ~nprobe/nlist of the corpus — compare
      // ivfskew's unrepaired hot-cell pile (~10x the balanced scan)
      val hotQuery = anchors(0).map(v => v * 0.97f)
      val cells = healed.probeCells(hotQuery, 4)
      val scanned = healed.indexed
        .where(col("cell").isin(cells.toIndexedSeq.map(Int.box): _*)).count()
      println(f"[scale-probe] ingestrepair: post-drain nlist " +
        f"${healed.centroidVectors.length}%d, max/avg factor $factor%.1fx, " +
        f"hot-query nprobe=4 scans $scanned%,d of $n%,d rows " +
        f"(${scanned * 100.0 / n}%.1f%%)")
      rmTree(new java.io.File(dir)); rmTree(new java.io.File(watch))
      spark.stop()
      return
    }
    if (args.contains("opqivfpq")) {
      import graft.operators.{IvfPqIndex, OpqIvfPqIndex}
      import org.apache.spark.sql.graftbridge.ColumnBridge
      // fixed dense mixing rotation (seeded Gram-Schmidt, the opq
      // probe's construction)
      val mixRnd = new scala.util.Random(7)
      val gs = Array.fill(dim, dim)(mixRnd.nextGaussian())
      for (j <- 0 until dim) {
        for (p <- 0 until j) {
          val dot = (0 until dim).map(i => gs(i)(j) * gs(i)(p)).sum
          for (i <- 0 until dim) gs(i)(j) -= dot * gs(i)(p)
        }
        val nn = math.sqrt((0 until dim).map(i => gs(i)(j) * gs(i)(j)).sum)
        for (i <- 0 until dim) gs(i)(j) /= nn
      }
      val mix = Array.tabulate(dim * dim)(x => gs(x / dim)(x % dim).toFloat)
      val centers = Array.tabulate(64, dim)((c, j) =>
        (math.sin(c * 2.1 + j * 0.7) * math.pow(0.85, j)).toFloat)
      // pre-mix coordinates: cluster center + anisotropic noise with a
      // SLOW decay (0.9^d): fast decay (0.62^d) concentrates 1M rows in
      // a handful of effective dims and crowds every query inside the
      // planted gap — both recalls measured 0.000, the fixture testing
      // itself; an isotropic floor fixes crowding but hands the
      // rotation nothing to recover (measured 1.000/1.000, then the
      // floor-dominated residuals even favored plain coding at m = 8).
      // Slow anisotropic decay keeps ~25 effective dims (no crowding at
      // 1M) while every dim's variance still differs — exactly the
      // structure the learned pretransform re-axes into balanced
      // subspaces. Measured at 1M, m = 8: residual 0.818, OPQ∘residual
      // 1.000.
      val background = spark.range(n).toDF("vec_id")
        .withColumn("__c", pmod(col("vec_id"), lit(64)).cast("int"))
        .select(col("vec_id"), array((0 until dim).map(j =>
          (element_at(lit(centers.map(_(j))), col("__c") + 1) +
            (rand(seed = 7 + j) - lit(0.5)) * lit(1.5 * math.pow(0.9, j)))
            .cast("float")): _*)
          .as("__z"))
      val zQ = background.where(col("vec_id") === 0)
        .select("__z").head().getSeq[Float](0).toArray
      val planted = spark.range(10).toDF("i")
        .select((col("i") + n).as("vec_id"),
          array((0 until dim).map(j =>
            (lit(zQ(j)) + (rand(seed = 99 + j) - lit(0.5)) * lit(0.004))
              .cast("float")): _*).as("__z"))
      // one global orthogonal mix over background + planted: cosines
      // (and hence the truth set) are untouched, but every coordinate
      // a fixed subspace sees is now a blend of all the others
      val corpus = background.unionByName(planted)
        .withColumn("embedding", ColumnBridge.column(
          graft.expressions.RotateVector(
            ColumnBridge.expression(col("__z")), mix, dim)))
        .drop("__z")
        .repartition(32).localCheckpoint(true)
      val probeQ = corpus.where(col("vec_id") === 0)
        .select("embedding").head().getSeq[Float](0).toArray
      val truth = (Set(0L) ++ (0 until 10).map(_.toLong + n))
      def recallOf(opq: Boolean): Double = {
        val search: (Array[Float], Int, Int) => org.apache.spark.sql.DataFrame =
          if (opq) {
            val idx = time("opqivfpq build OPQ,IVF64,PQ8 res=true k=256") {
              OpqIvfPqIndex.build(corpus, "embedding", nlist = 64, m = 8,
                k = 256, maxTrain = 16384, opqIters = 4, byResidual = true)
            }
            (q, k, np) => idx.search(q, k, np, tieBreakers = Seq(asc("vec_id")))
          } else {
            val idx = time("opqivfpq build plain IVF64,PQ8 res=true k=256") {
              IvfPqIndex.build(corpus, "embedding", nlist = 64, m = 8,
                k = 256, maxTrain = 16384, byResidual = true)
            }
            (q, k, np) => idx.search(q, k, np, tieBreakers = Seq(asc("vec_id")))
          }
        val got = search(probeQ, 50, 8)
          .select("vec_id").collect().map(_.getLong(0)).toSet
        (got & truth).size.toDouble / truth.size
      }
      val res = recallOf(opq = false)
      val ro = recallOf(opq = true)
      println(f"[scale-probe] opqivfpq planted-neighbor recall in ADC-top-50: " +
        f"residual=$res%.3f opq+residual=$ro%.3f (equal m=8 k=256, nprobe=8/64)")
      require(ro >= res,
        f"OPQ∘residual recall $ro%.3f fell below plain residual $res%.3f at equal m/k")
      spark.stop()
      return
    }
    // Batch MMR from the coded index vs the raw-vector scan at 1M:
    //   sbt "runMain graft.ScaleProbe 1000000 mmrindex"
    // The r17 VERDICT #2 shape, measured: mmrTopKMany's shortlist
    // stage scans 1M × 4d-byte raw vectors per query batch
    // (knnJoinAgg), while mmrTopKManyFromIndex scans nprobe/nlist of
    // m-byte CODES and fetches raw vectors only for shortlist rows —
    // the AT-REST bytes story; at 1M fully page-cached the raw
    // single-codegen-pass scan is CPU-cheap, so wall-clock favors it
    // locally and the coded path's win is I/O-bound at corpus scale
    // (both times printed, neither asserted). Fixture = opqivfpq's
    // clustered corpus with PLANTED neighbors: each of 32 queries has
    // 10 planted rows at noise 0.004 (vs cluster noise 1.5), so the
    // true top-10 is the planted set — a fixture whose fine order the
    // codec CAN see (the raw within-cluster top-50 of a 15625-row
    // near-tie ball is exactly what PQ cannot and should not
    // fine-rank). Assertions: (a) every coded-path similarity is the
    // EXACT cosine of its (query, id) pair — the re-score contract at
    // ANY coding quality, asserted pair-by-pair; (b) at λ = 1 (pure
    // relevance — selection IS the top-10, i.e. the planted set) the
    // per-query selection overlap with the raw path above a measured
    // floor: codes cost shortlist membership only, and λ = 1 is the
    // config where membership is all that matters (at λ = 0.5 the
    // greedy DIVERSIFIES away from the planted near-dup ball after one
    // pick — by design — and the diverse picks land in the cluster's
    // near-tie lottery, measured overlap 0.19: asserting there would
    // test tie-breaking, not the codec). Measured at 1M over 32
    // queries: OPQ∘residual overlap 0.847 (floor 0.6 with margin);
    // plain residual coding measured 0.459 on the same fixture — the
    // learned rotation buys the shortlist membership, the r16/r17
    // OPQ claim reproduced on the batch-MMR path.
    if (args.contains("mmrindex")) {
      import graft.operators.{Nearest, OpqIvfPqIndex, SimJoin}
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val centers = Array.tabulate(64, dim)((c, j) =>
        (math.sin(c * 2.1 + j * 0.7) * math.pow(0.85, j)).toFloat)
      val background = spark.range(n).toDF("vec_id")
        .withColumn("__c", pmod(col("vec_id"), lit(64)).cast("int"))
        .select(col("vec_id"), array((0 until dim).map(j =>
          (element_at(lit(centers.map(_(j))), col("__c") + 1) +
            (rand(seed = 7 + j) - lit(0.5)) * lit(1.5 * math.pow(0.9, j)))
            .cast("float")): _*)
          .as("__z"))
      // 10 planted near-duplicates per query row (ids n + q*10 + i):
      // tiny jitter around the query vector — the retrievable truth set
      val qVecs = background.where(col("vec_id") < 32)
        .orderBy("vec_id").collect()
        .map(r => r.getSeq[Float](1).toArray)
      val planted = spark.range(320).toDF("i")
        .withColumn("__q", (col("i") / 10).cast("int"))
        .select((col("i") + n).as("vec_id"),
          array((0 until dim).map(j =>
            (element_at(lit(qVecs.map(_(j))), col("__q") + 1) +
              (rand(seed = 99 + j) - lit(0.5)) * lit(0.004))
              .cast("float")): _*).as("__z"),
          col("__q"))
      // one global orthogonal mix (the opqivfpq probe's construction):
      // cosines untouched, but noise energy spreads across every PQ
      // subspace — UNMIXED, the axis-aligned anisotropic noise piles
      // into the first subvectors and even full-probe ADC top-50
      // becomes a reconstruction-noise lottery (measured: planted
      // recall 0.25 unmixed at nprobe = 64 vs ~0.9 mixed — the Ge et
      // al. subspace-balance effect, reproduced accidentally)
      val mixRnd = new scala.util.Random(7)
      val gs = Array.fill(dim, dim)(mixRnd.nextGaussian())
      for (j <- 0 until dim) {
        for (p <- 0 until j) {
          val dot = (0 until dim).map(i => gs(i)(j) * gs(i)(p)).sum
          for (i <- 0 until dim) gs(i)(j) -= dot * gs(i)(p)
        }
        val nn = math.sqrt((0 until dim).map(i => gs(i)(j) * gs(i)(j)).sum)
        for (i <- 0 until dim) gs(i)(j) /= nn
      }
      val mix = Array.tabulate(dim * dim)(x => gs(x / dim)(x % dim).toFloat)
      val corpus = background.unionByName(planted.drop("__q"))
        .withColumn("embedding", ColumnBridge.column(
          graft.expressions.RotateVector(
            ColumnBridge.expression(col("__z")), mix, dim)))
        .drop("__z")
        .repartition(32).localCheckpoint(true)
      val queries = corpus.where(col("vec_id") < 32)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
        .localCheckpoint(true)
      val raw = time(f"mmrindex: RAW batch MMR 32q over ${n / 1000000}M") {
        Nearest.mmrTopKMany(queries, corpus, "query_id", "qe", "vec_id",
            "embedding", n = 10, lambda = 1.0, shortlist = 50)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      // the OPQ,IVF,PQ stack through the AnnIndex trait — the config
      // the opqivfpq probe measured at planted recall 1.000 (plain
      // residual coding measured 0.459 here over 32 queries: the
      // learned rotation is what buys the shortlist membership)
      val idx = time("mmrindex: build OPQ,IVF64,PQ8 res=true k=256") {
        OpqIvfPqIndex.build(corpus, "embedding", nlist = 64, m = 8, k = 256,
          maxTrain = 16384, opqIters = 4, byResidual = true)
      }
      val codedRows = time("mmrindex: CODED batch MMR 32q nprobe=8") {
        Nearest.mmrTopKManyFromIndex(idx, queries, corpus, "query_id", "qe",
            "vec_id", "embedding", n = 10, lambda = 1.0, shortlist = 50,
            nprobe = 8)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      }
      // (a) emitted similarities are EXACT cosines — the re-score
      // contract, independent of coding quality
      val vecs = corpus.where(col("vec_id") < 32 ||
          col("vec_id").isin(codedRows.map(t => Long.box(t._2)).distinct.toIndexedSeq: _*))
        .collect().map(r => r.getLong(0) ->
          r.getSeq[Float](1).toArray).toMap
      def cosD(a: Array[Float], b: Array[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) {
          dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
          nb += b(i).toDouble * b(i); i += 1
        }
        if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
      }
      codedRows.foreach { case (q, id, sim) =>
        val exact = cosD(vecs(q), vecs(id))
        require(math.abs(exact - sim) < 1e-9,
          f"coded-path sim $sim%.12f != exact cosine $exact%.12f for ($q, $id)")
      }
      // (b) selection overlap with the raw path — at λ = 1 the planted
      // sets ARE both paths' top-10, so overlap measures shortlist
      // recall of the codec, not near-tie lottery
      val coded = codedRows.map(t => (t._1, t._2)).toSet
      val overlap = (coded & raw).size.toDouble / raw.size
      println(f"[scale-probe] mmrindex: selection overlap coded-vs-raw " +
        f"$overlap%.3f over ${raw.size} picks (n=10 x 32q, lambda=1)")
      require(overlap >= 0.6,
        f"coded-path selection overlap $overlap%.3f fell below the 0.6 floor")
      // the recall-vs-nprobe CURVE at 1M — the telemetry a deployment
      // reads to size the probe knob (AnnIndex.recallCurve's scaladoc
      // points here); ground truth computed once over the raw vectors.
      // Measured: bare ADC top-10 recall plateaus ~0.45 from nprobe=2
      // on — the planted rows are near-TIES (0.004 jitter), and PQ
      // fine-order noise at that margin displaces half of them from a
      // bare top-10 — while the shortlist-50 ∘ exact-re-rank MMR path
      // above reached 0.847 from the SAME codec. That contrast is the
      // published refine-stage rationale made concrete: codes find the
      // neighborhood, exact scores order it; flat from nprobe≥2 also
      // says the probe is not the binding constraint here, the codec's
      // fine order is. Floor 0.35 guards the codec, not the refine.
      // round 19: the curve now carries its COST column — recall AND
      // mean rows scanned per query, so the knee (where added scan
      // stops buying recall) is visible in one read; at np=64 (full
      // probe) scanned is the whole 1M corpus by derivation
      val curve = time("mmrindex: recallCurve nprobe 1..64") {
        graft.operators.AnnIndex.recallCurve(idx, queries, corpus,
            "query_id", "qe", "vec_id", "embedding", k = 10,
            nprobes = Seq(1, 2, 4, 8, 16, 64))
          .collect().map(r => (r.getInt(0), r.getDouble(2), r.getDouble(4)))
      }
      println("[scale-probe] mmrindex recall@10 + scan cost (OPQ,IVF64,PQ8): " +
        curve.map { case (np, r, c) =>
          f"np=$np%d:$r%.3f/${c / 1000}%.0fk-rows" }.mkString("  ") +
        f"  (vs $overlap%.3f through shortlist-50 + exact re-rank — the refine story)")
      require(curve.last._2 >= 0.35,
        f"full-probe bare-ADC recall ${curve.last._2}%.3f fell below 0.35 — codec broke")
      require(curve.last._3 == (n + 320).toDouble, // background + planted
        f"full-probe scan cost must price the whole corpus: ${curve.last._3}%.0f vs ${n + 320}%d")
      require(curve.map(_._3).sliding(2).forall(w => w(0) <= w(1)),
        "scan cost must be monotone in nprobe")
      // round 19: the GRID + the PICK at 1M — the deployed tuning flow
      // end to end. The bare curve plateaus ~0.45 (fine-order noise on
      // near-ties); the refined (nprobe, shortlist) grid recovers
      // ~0.85 from the SAME codec, and cheapestAtRecall must choose
      // the partial probe + refine over full probe: same recall band,
      // ~8× less scan — the measured knee the telemetry exists to find.
      val grid = time("mmrindex: recallGrid {8,64} x {10,50}") {
        graft.operators.AnnIndex.recallGrid(idx, queries, corpus,
          "query_id", "qe", "vec_id", "embedding", k = 10,
          nprobes = Seq(8, 64), shortlists = Seq(10, 50))
          .localCheckpoint(true)
      }
      val gRows = grid.collect()
        .map(r => ((r.getInt(0), r.getInt(1)), (r.getDouble(3), r.getDouble(5))))
        .toMap
      println("[scale-probe] mmrindex grid (np, sl) -> recall/scanned: " +
        gRows.toSeq.sortBy(_._1).map { case ((np, sl), (rc, sc)) =>
          f"($np%d,$sl%d):$rc%.3f/${sc / 1000}%.0fk" }.mkString("  "))
      val pick = graft.operators.AnnIndex.cheapestAtRecall(grid, 0.7)
      // round 20: pick._4 is the TOTAL cost (ADC scan + refine fetch)
      println(f"[scale-probe] mmrindex: cheapest config at recall >= 0.7: " +
        f"nprobe=${pick._1}%d shortlist=${pick._2.getOrElse(-1)}%d " +
        f"recall=${pick._3}%.3f cost=${pick._4 / 1000}%.1fk rows/query (scan+fetch)")
      require(pick._3 >= 0.7 && pick._1 == 8 && pick._2.contains(50),
        s"the picker must choose the partial-probe refined config over " +
          s"full probe at the same recall band, got $pick over $gRows")
      spark.stop()
      return
    }
    // IVF probe cost under ZIPF cell skew at 1M:
    //   sbt "runMain graft.ScaleProbe 1000000 ivfskew"
    // The recall/latency story assumes probe cost ≈ nprobe/nlist of the
    // corpus — true only for balanced cells. Here the same frozen
    // quantizer indexes (a) a balanced corpus and (b) a zipf-assigned
    // one (inverse-CDF rank draw, P(hot cell) = ln2/ln64 ≈ 17% of all
    // rows vs 1.6% average — the drifted-append shape driftGuard
    // exists for), a hot-cell query is timed on both, then capCells
    // splits the hot cells and the probe is re-timed: the skew tax and
    // its repair, measured.
    // Exact substring dedup at 1M docs:
    //   sbt "runMain graft.ScaleProbe 1000000 substring"
    // Corpus: 24 unique-ish filler tokens per doc (50k vocab hash
    // draw), ids ≡ 0 (mod 100) are plain sources, ids ≡ 1 (mod 100)
    // FULLY COPY id−1 (10k whole-doc duplicates), ids ≡ 3 (mod 10)
    // append one FIXED 15-token boilerplate tail (100k occurrences of
    // the same grams — the hot-gram stress: every occurrence except
    // the global winner must excise EXACTLY the tail). Closed-form
    // check: changed docs = 10,000 full-dups (→ empty text) +
    // 100,000 − 1 boilerplate losers; everything else byte-identical.
    if (args.contains("substring")) {
      val k = 13
      // globally UNIQUE filler tokens (w<id>x<i>): a vocab draw would
      // let two carriers share their last filler token and legitimately
      // extend the excised island one token left — correct behavior,
      // but it blurs the closed-form check this probe wants
      val filler = (0 until 24).map(i =>
        concat(lit("w"), col("id"), lit(s"x$i")))
      val bp = (1 to 15).map(i => s"bp$i").mkString(" ")
      val base = spark.range(n).toDF("id")
        .select(col("id"), concat_ws(" ", filler: _*).as("__filler"))
        .withColumn("__own",
          when(pmod(col("id"), lit(10)) === 3,
            concat(col("__filler"), lit(" " + bp))).otherwise(col("__filler")))
      // dup docs copy the PREVIOUS doc's final text (sources are
      // ≡ 0 mod 100, never boilerplate carriers)
      val prev = base.select((col("id") + 1).as("id"), col("__own").as("__prev"))
      val docs = base.join(prev, Seq("id"), "left")
        .select(col("id"),
          when(pmod(col("id"), lit(100)) === 1 && col("__prev").isNotNull,
            col("__prev")).otherwise(col("__own")).as("text"))
        .repartition(32).localCheckpoint(true)
      val spans = time(s"duplicateSpans over ${n / 1000000}M docs (k=$k)") {
        Dedup.duplicateSpans(docs, "text", "id", k).localCheckpoint(true)
      }
      println(f"[scale-probe] ${spans.count()}%,d merged spans")
      val out = time("removeDuplicateSpans (excise + reassemble)") {
        Dedup.removeDuplicateSpans(docs, "text", "id", k).localCheckpoint(true)
      }
      val empties = out.where(col("text") === "").count()
      require(empties == n / 100,
        s"every full-copy doc must come back empty: $empties vs ${n / 100}")
      val changed = out.as("o").join(docs.as("d"), "id")
        .where(col("o.text") =!= col("d.text")).count()
      require(changed == n / 100 + n / 10 - 1,
        s"changed docs must be the ${n / 100} full-dups + ${n / 10 - 1} " +
          s"boilerplate losers, got $changed")
      // a surviving boilerplate loser kept exactly its 24 filler tokens
      val survivorToks = out.where(pmod(col("id"), lit(10)) === 3 &&
          pmod(col("id"), lit(100)) =!= 1 && col("text") =!= "")
        .select(size(filter(split(col("text"), "[ ]"), t => length(t) > 0)).as("nt"))
        .groupBy("nt").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      println(s"[scale-probe] boilerplate-carrier token counts after excision: $survivorToks")
      require(survivorToks.keySet.subsetOf(Set(24, 39)),
        s"carriers must keep 24 filler tokens (39 = the one global winner): $survivorToks")
      spark.stop()
      return
    }
    // SemDeDup at scale: sbt "runMain graft.ScaleProbe 200000 semdedup"
    // The within-cluster prune caps candidate pairs at Σ n_c²/2 vs the
    // global n²/2 — measured on (a) a balanced 1024-cell corpus (the
    // deployed shape: many cells, few rows each) and (b) a
    // zipf-drifted one, where the hot cell hoards the candidate mass
    // and splitOversized repairs it. The prune itself (threshold
    // self-join blocked on cell) runs timed on the balanced corpus;
    // the anchor-jittered generator makes same-cell vectors true
    // near-dups, so the pair count is also a correctness signal.
    if (args.contains("semdedup")) {
      val nlist = 1024
      val rnd = new scala.util.Random(4242)
      val anchors: Array[Array[Float]] =
        Array.fill(nlist)(Array.fill(dim)(((rnd.nextDouble() - 0.5) * 2).toFloat))
      import spark.implicits._
      val anchorsDf = broadcast(anchors.zipWithIndex
        .map { case (v, i) => (i, v) }.toSeq.toDF("zk", "anchor"))
      def cellDraw(zipf: Boolean): org.apache.spark.sql.Column =
        if (!zipf) pmod(hash(col("vec_id") + lit(17)), lit(nlist)).cast("int")
        else {
          val u = (pmod(hash(col("vec_id") * lit(131) + lit(7)), lit(1000000))
            .cast("double") + 0.5) / 1000000.0
          (least(floor(exp(u * math.log(nlist + 1.0))), lit(nlist.toDouble)) - 1)
            .cast("int")
        }
      def corpusFor(zipf: Boolean) = spark.range(n).toDF("vec_id")
        .withColumn("zk", cellDraw(zipf))
        .join(anchorsDf, "zk")
        .select(col("vec_id"), transform(col("anchor"), (a, j) =>
          (a + (pmod(hash(col("vec_id") * lit(8191) + j * lit(127) + lit(3)),
            lit(1000)).cast("double") / 1000.0 - 0.5) * 0.02).cast("float"))
          .as("embedding"))
        .repartition(32).localCheckpoint(true)
      def candStats(idx: IvfIndex, label: String): Long = {
        val sizes = idx.cellSizeStats.select("n").collect().map(_.getLong(0))
        val cand = sizes.map(c => c * (c - 1) / 2).sum
        val all = n * (n - 1) / 2
        println(f"[scale-probe] $label%-24s $cand%,d within-cell candidates " +
          f"vs $all%,d all-pairs (${all.toDouble / cand}%,.0fx cut; " +
          f"fullest cell ${sizes.max}%,d rows)")
        cand
      }
      // the frozen quantizer IS the anchor set — the build-once,
      // dedup-and-search-against-it composition. Both layouts are
      // PERSISTED cell-partitioned before any repeated reading (the
      // ivfskew convention; in-memory, the NearestCell assignment
      // lineage would re-run per action — splitOversized alone reads
      // the corpus once per hot cell, ~50 times under zipf)
      def persisted(zipf: Boolean, tag: String): IvfIndex = {
        val p = s"$path-semdedup-$tag"
        IvfIndex.withCentroids(corpusFor(zipf), "embedding", anchors).save(p)
        IvfIndex.load(spark, p)
      }
      val balanced = time("assign+persist balanced layout")(
        persisted(zipf = false, "bal"))
      candStats(balanced, "balanced 1024 cells:")
      val pairs = time("within-cell prune (balanced, t=0.995)") {
        Dedup.semanticPairs(balanced, "vec_id", 0.995).count()
      }
      println(f"[scale-probe] $pairs%,d near-dup pairs confirmed by the exact re-score")
      require(pairs > 0, "anchor-jittered same-cell vectors must be near-dups")
      val zipfIdx = time("assign+persist zipf layout")(
        persisted(zipf = true, "zipf"))
      val zc = candStats(zipfIdx, "zipf-drifted:")
      val repaired = time("splitOversized repair of hot cells") {
        zipfIdx.splitOversized(maxRows = 3L * n / nlist)
      }
      val rc = candStats(repaired, "repaired:")
      require(rc < zc / 2,
        s"hot-cell split must cut the candidate mass, got $zc -> $rc")
      spark.stop()
      return
    }
    // Sharded Bloom bank at 10M paragraphs across 4 shards:
    //   sbt "runMain graft.ScaleProbe 10000000 bloombank"
    // The single filter caps at 2^31 bits (~1.8B items at 1% fpp); the
    // bank lifts that by routing map-side on the probe pair's own
    // hash (r13 VERDICT #1). Measured here: the distributed delta
    // build (per-task memory bounded at ONE shard's bytes — the
    // repartition-by-route shape), the broadcast membership probe over
    // the full frame, per-shard fill balance under the uniform route,
    // the measured whole-bank fpp against the 1% design, and the
    // zero-false-negative contract at scale.
    if (args.contains("bloombank")) {
      import graft.operators.{ParaBloom, ParaBloomBank}
      val numShards = 4
      // synthetic (__h1, __h2) frame — the paragraphHashFrame shape;
      // distinct ids give distinct pairs, so n = distinct paragraphs
      def hashFrame(lo: Long, hi: Long) = spark.range(lo, hi).toDF("id")
        .select(xxhash64(col("id")).as("__h1"),
          xxhash64(lit(0x9e3779b97f4a7c15L), col("id")).as("__h2"))
        .repartition(32)
      val hashes = hashFrame(0, n).localCheckpoint(true)
      val bank = ParaBloomBank.create(n, 0.01, numShards)
      println(f"[scale-probe] bank geometry: $numShards shards x " +
        f"${bank.sizeBytes / numShards / 1048576.0}%.1f MB = " +
        f"${bank.sizeBytes / 1048576.0}%.1f MB total, design ${bank.designItems}%,d items")
      time(f"bank absorb $n%,d pairs") { bank.absorb(hashes) }
      val fills = bank.fillRatios
      println(s"[scale-probe] per-shard fill: " +
        fills.map(f => f"$f%.4f").mkString(", ") +
        f" (max/min ${fills.max / fills.min}%.4f)")
      require(fills.max / fills.min < 1.05,
        "uniform route must balance shards at this scale")
      // the single-filter build over the same items — the shape the
      // bank replaces; same total bits, one treeReduce instead of a
      // route shuffle
      val single = ParaBloom.create(n, 0.01)
      time(f"single-filter absorb $n%,d") { single.absorb(hashes) }
      // broadcast membership probe over the full frame — the map-side
      // dedup decision; every inserted pair MUST probe positive
      val bc = spark.sparkContext.broadcast(bank.copyStore())
      val seenUdf = graft.expressions.BloomMightContain.probe(bc) _
      val positives = time("bank broadcast probe (all inserted)") {
        hashes.where(seenUdf(col("__h1"), col("__h2"))).count()
      }
      require(positives == n,
        s"zero false negatives by construction, got $positives of $n")
      // fresh probes: the measured whole-bank fpp at design load
      val freshN = 1000000L
      val freshHits = time("bank broadcast probe (1M fresh)") {
        hashFrame(n, n + freshN).where(seenUdf(col("__h1"), col("__h2"))).count()
      }
      println(f"[scale-probe] measured fpp at design load: " +
        f"${freshHits.toDouble / freshN}%.4f (design 0.01)")
      require(freshHits < freshN * 3 / 100, "fpp blew past 3x the design rate")
      bc.destroy()
      // restart path at size: save N shard files + manifest, reopen
      val bankPath = s"$path-bank"
      time("bank save (4 shard files)")(ParaBloomBank.save(bank, bankPath))
      val re = time("bank load")(ParaBloomBank.load(bankPath))
      require(re.fillRatios.toSeq == fills.toSeq, "reloaded bank must carry the same bits")
      spark.stop()
      return
    }
    // Bounded SemDeDup store at 1M retained rows:
    //   sbt "runMain graft.ScaleProbe 1000000 semdedupstore"
    // The full-vector store carries d·4 = 256 B/row through every
    // batch's cell join; the PQ-coded store carries m + 8 = 16 B/row
    // (16x). Measured here: both screens of an identical fresh batch
    // against the SAME 1M-row retained corpus — decision agreement
    // under a LOSSY production codebook (k = 256), wall-clock of each
    // screen, and the store bytes. The planted fresh batch is half
    // near-dups (must drop) / half uniform rows (must survive), both
    // far from the threshold, so agreement is the expected outcome and
    // any disagreement counts boundary-effect rows.
    if (args.contains("semdedupstore")) {
      val nlist = 1024
      val rnd = new scala.util.Random(4242)
      val anchors: Array[Array[Float]] =
        Array.fill(nlist)(Array.fill(dim)(((rnd.nextDouble() - 0.5) * 2).toFloat))
      import spark.implicits._
      val anchorsDf = broadcast(anchors.zipWithIndex
        .map { case (v, i) => (i, v) }.toSeq.toDF("zk", "anchor"))
      def jittered(ids: org.apache.spark.sql.DataFrame) = ids
        .withColumn("zk", pmod(hash(col("vec_id") + lit(17)), lit(nlist)).cast("int"))
        .join(anchorsDf, "zk")
        .select(col("vec_id"), transform(col("anchor"), (a, j) =>
          (a + (pmod(hash(col("vec_id") * lit(8191) + j * lit(127) + lit(3)),
            lit(1000)).cast("double") / 1000.0 - 0.5) * 0.02).cast("float"))
          .as("embedding"))
      val base = jittered(spark.range(n).toDF("vec_id"))
        .repartition(32).localCheckpoint(true)
      val model = time("PQ fit (m=8, k=256, lossy)") {
        PqIndex.fit(base, "embedding", m = 8, k = 256)
      }
      require(!model.lossless, "1M continuous vectors must exceed 256 codewords")
      val assigned = IvfIndex.withCentroids(base, "embedding", anchors).indexed
      val fullStore = assigned
        .select(col("vec_id"), col("cell"), col("embedding"),
          lit(null).cast("binary").as("__codes"), lit(null).cast("double").as("__norm"))
        .repartition(32).localCheckpoint(true)
      val codedStore = time(f"encode $n%,d-row coded store") {
        PqIndex.encode(assigned, "embedding", model, "__codes", "__norm")
          .select(col("vec_id"), col("cell"),
            lit(null).cast("array<float>").as("embedding"),
            col("__codes"), col("__norm"))
          .repartition(32).localCheckpoint(true)
      }
      val fullBytes = n * (dim * 4L)
      val codedBytes = n * (model.m * model.codeBytes + 8L)
      println(f"[scale-probe] store payload: full $fullBytes%,d B vs coded " +
        f"$codedBytes%,d B (${fullBytes.toDouble / codedBytes}%.1fx)")
      // the codec's measured reconstruction quality: each row's ADC
      // similarity AGAINST ITS OWN CODES — cos(reconstruction, row).
      // 1 - min(selfSim) is the margin the screen threshold must keep
      // from 1.0 for near-dup decisions to survive quantization: the
      // quantified half of the one-sided contract.
      val simRow = PqIndex.selfSimilarity(base, "embedding", model)
        .agg(min("self_sim"), expr("percentile_approx(self_sim, 0.5)")).head()
      val sMin = simRow.getDouble(0); val sMed = simRow.getDouble(1)
      println(f"[scale-probe] codec self-similarity: min $sMin%.3f median $sMed%.3f " +
        f"-> screen thresholds below ~$sMin%.2f keep full near-dup margin")
      // fresh batch: n/200 planted near-dups of base rows + n/200 uniforms
      val freshDup = jittered(spark.range(n / 200).toDF("vec_id")
          .select((col("vec_id") * 200 + 7).as("vec_id")))
        .select((col("vec_id") + lit(10000000L)).as("vec_id"), col("embedding"))
      val freshNew = spark.range(n / 200).toDF("vec_id")
        .select((col("vec_id") + 20000000L).as("vec_id"),
          array((0 until dim).map(i =>
            (rand(seed = 77 + i) * 2 - 1).cast("float")): _*).as("embedding"))
      val fresh = freshDup.unionByName(freshNew).repartition(32).localCheckpoint(true)
      // threshold 0.6: planted dups score ~1.0 exact / >= selfSim-ish
      // coded, uniforms ~0.2 — BOTH margins clear the measured
      // reconstruction error, the design rule the self-similarity
      // numbers above quantify (a 0.995 threshold under this lossy
      // codec would sit INSIDE the reconstruction band and under-drop
      // — the documented failure mode, not a probe target)
      val thr = 0.6
      val exactSurv = time("screen vs FULL store (exact)") {
        Dedup.semanticBoundedSurvivors(fresh, anchors, fullStore, model,
          "embedding", "vec_id", thr).select("vec_id")
          .collect().map(_.getLong(0)).toSet
      }
      val adcSurv = time("screen vs CODED store (ADC)") {
        Dedup.semanticBoundedSurvivors(fresh, anchors, codedStore, model,
          "embedding", "vec_id", thr).select("vec_id")
          .collect().map(_.getLong(0)).toSet
      }
      val disagree = (exactSurv -- adcSurv) ++ (adcSurv -- exactSurv)
      println(f"[scale-probe] survivors exact=${exactSurv.size}%,d " +
        f"adc=${adcSurv.size}%,d disagreements=${disagree.size}%,d " +
        f"(${disagree.size * 100.0 / (n / 100)}%.3f%% of the batch)")
      // uniforms survive unless one GENUINELY crosses the threshold
      // against some of the 1M store rows (measured: ~1 in 5,000 at
      // t=0.6) — the claim is agreement, not zero true matches
      require(exactSurv.count(_ >= 20000000L) >= n / 200 * 99 / 100,
        ">= 99% of uniform fresh rows must survive the exact screen")
      require(disagree.size <= n / 100 / 50,
        s"lossy ADC must agree with exact on >= 98% of far-from-boundary decisions")
      spark.stop()
      return
    }
    // Centroid-screen SemDeDup on the ZIPF-hot layout:
    //   sbt "runMain graft.ScaleProbe 1000000 semdedupcentroid"
    // The pairwise prune's candidate mass lives in the hot cell
    // (Σ n_c²/2); the centroid screen is O(n) scores + an
    // nlist-bounded min-id table NO MATTER how skewed the cells are —
    // the operator that stays flat exactly where the pairwise path
    // needs splitOversized. Measured: the arithmetic candidate mass
    // the pairwise path would face vs the n scores the screen runs,
    // and the screen's wall-clock ON the hot layout, with a closed-form
    // survivor check (the anchor-jittered generator puts every row in
    // its cell's ball, so survivors == one per non-empty cell).
    if (args.contains("semdedupcentroid")) {
      val nlist = 1024
      val rnd = new scala.util.Random(4242)
      val anchors: Array[Array[Float]] =
        Array.fill(nlist)(Array.fill(dim)(((rnd.nextDouble() - 0.5) * 2).toFloat))
      import spark.implicits._
      val anchorsDf = broadcast(anchors.zipWithIndex
        .map { case (v, i) => (i, v) }.toSeq.toDF("zk", "anchor"))
      // zipf cell draw — the semdedup probe's hot layout
      val u = (pmod(hash(col("vec_id") * lit(131) + lit(7)), lit(1000000))
        .cast("double") + 0.5) / 1000000.0
      val corpus = spark.range(n).toDF("vec_id")
        .withColumn("zk",
          (least(floor(exp(u * math.log(nlist + 1.0))), lit(nlist.toDouble)) - 1)
            .cast("int"))
        .join(anchorsDf, "zk")
        .select(col("vec_id"), transform(col("anchor"), (a, j) =>
          (a + (pmod(hash(col("vec_id") * lit(8191) + j * lit(127) + lit(3)),
            lit(1000)).cast("double") / 1000.0 - 0.5) * 0.02).cast("float"))
          .as("embedding"))
        .repartition(32).localCheckpoint(true)
      // the PERSISTED cell-partitioned layout (the ivfskew/semdedup
      // discipline): deployed dedup reads the saved `cell` column, so
      // the screen must not be charged the in-memory lineage's
      // re-assignment scan (O(n·nlist·d) per pass — measured 55 s of
      // the unpersisted probe's 62 s)
      val layoutPath = s"$path-semdedupcentroid"
      IvfIndex.withCentroids(corpus, "embedding", anchors).save(layoutPath)
      val idx = IvfIndex.load(spark, layoutPath)
      val sizes = idx.cellSizeStats.select("n").collect().map(_.getLong(0))
      val pairCand = sizes.map(c => c * (c - 1) / 2).sum
      println(f"[scale-probe] zipf layout: pairwise candidates $pairCand%,d " +
        f"(hot cell ${sizes.max}%,d rows -> ${sizes.max * (sizes.max - 1) / 2}%,d " +
        f"of them) vs $n%,d centroid scores (${pairCand.toDouble / n}%,.0fx)")
      val survivors = time("centroid screen on the HOT layout (eps=0.7)") {
        Dedup.semanticDedupByCentroid(corpus, idx, "vec_id", eps = 0.7).count()
      }
      // 0.02-jitter around the anchor keeps every row's cosine-to-
      // centroid ~0.9999 >> 0.3, so each non-empty cell collapses to
      // its min id exactly
      val nonEmpty = sizes.count(_ > 0)
      require(survivors == nonEmpty,
        s"closed form: one survivor per non-empty cell ($nonEmpty), got $survivors")
      println(f"[scale-probe] $survivors%,d survivors == $nonEmpty%,d non-empty cells (closed form)")
      spark.stop()
      return
    }
    // Hot-gram ExactSubstr at >= 1M occurrences of ONE gram:
    //   sbt "runMain graft.ScaleProbe 1000000 substrhot"
    // Every doc carries the same 13-token boilerplate -> its grams
    // occur n times each. The default path shuffles all n occurrences
    // of each such gram into ONE partition of the enrich join (the
    // straggler the r14 VERDICT named); the hotGramCap broadcast path
    // marks them map-side. Measured: wall-clock of both paths on the
    // identical corpus and span-set equality (decisions unchanged).
    if (args.contains("substrhot")) {
      val k = 13
      val bp = (1 to 14).map(i => s"bp$i").mkString(" ") // 14 toks -> 2 hot grams
      val filler = (0 until 10).map(i => concat(lit("w"), col("id"), lit(s"x$i")))
      val docs = spark.range(n).toDF("id")
        .select(col("id"),
          concat_ws(" ", concat_ws(" ", filler: _*), lit(bp)).as("text"))
        .repartition(32).localCheckpoint(true)
      def spanSig(capped: Boolean): (Long, Long) = {
        val cap = if (capped) 65536L else Long.MaxValue
        val s = Dedup.duplicateSpans(docs, "text", "id", k, hotGramCap = cap)
        val r = s.agg(count(lit(1)), sum(col("span_start") * 31 + col("span_end")))
          .head()
        (r.getLong(0), r.getLong(1))
      }
      val (nHot, sigHot) = time(f"duplicateSpans BROADCAST hot path ($n%,d-occ grams)") {
        spanSig(capped = true)
      }
      val (nShuf, sigShuf) = time("duplicateSpans single-key shuffle path") {
        spanSig(capped = false)
      }
      require(nHot == nShuf && sigHot == sigShuf,
        s"hot path must be decision-identical: ($nHot,$sigHot) vs ($nShuf,$sigShuf)")
      println(f"[scale-probe] $nHot%,d spans, signatures equal across paths; " +
        "n-1 boilerplate losers excised either way")
      require(nHot == n - 1, s"closed form: one span per non-winner doc, got $nHot")
      spark.stop()
      return
    }
    // Bounded Bloom gram store vs the exact gram frame at ingest:
    //   sbt "runMain graft.ScaleProbe 1000000 substrbloom"
    // Base corpus: n docs of 24 globally-unique filler tokens, ids ≡ 3
    // (mod 10) appending one FIXED 15-token boilerplate tail. Fresh
    // batch: n NEW docs — ids ≡ 1 (mod 100) fully copy a plain base
    // source (every gram store-hits ⇒ empty text), ids ≡ 3 (mod 10)
    // carry the same boilerplate (its 3 pure-bp grams store-hit ⇒
    // exactly the tail excises — and those n/10 hot occurrences
    // short-circuit at the store probe, never entering the
    // batch-internal winner shuffle), everything else byte-identical.
    // Closed form asserted on the exact path; the Bloom path must be
    // a one-sided refinement (never excises less, extra excisions
    // bounded by the design fpp) at a FIXED store size vs the exact
    // store's 8 B per distinct corpus gram reshuffled into every
    // batch's semi-join.
    if (args.contains("substrbloom")) {
      val k = 13
      val bp = (1 to 15).map(i => s"bp$i").mkString(" ")
      require(n % 100 == 0, s"substrbloom wants n % 100 == 0, got $n")
      def corpus(offset: Long) = {
        val filler = (0 until 24).map(i => concat(lit("w"), col("id"), lit(s"x$i")))
        spark.range(n).toDF("__i")
          .select((col("__i") + offset).as("id"))
          .select(col("id"), concat_ws(" ", filler: _*).as("__filler"))
          .select(col("id"),
            when(pmod(col("id"), lit(10)) === 3,
              concat(col("__filler"), lit(" " + bp)))
              .otherwise(col("__filler")).as("text"))
      }
      val base = corpus(0).repartition(32).localCheckpoint(true)
      // fresh id ≡ 1 (mod 100) copies base id (id − n − 1) ≡ 0 (mod
      // 100) — a plain source, never a boilerplate carrier
      val src = base.select(col("id").as("__sid"), col("text").as("__srctext"))
      val fresh = corpus(n)
        .withColumn("__copyFrom",
          when(pmod(col("id"), lit(100)) === 1, col("id") - n - 1))
        .join(src, col("__copyFrom") === col("__sid"), "left")
        .select(col("id"), coalesce(col("__srctext"), col("text")).as("text"))
        .repartition(32).localCheckpoint(true)
      val baseGrams = time("exact gram store build (distinct __gh)") {
        Dedup.substringGramFrame(base, "text", "id", k).localCheckpoint(true)
      }
      val nGrams = baseGrams.count()
      val outExact = time(f"removeDuplicateSpansAcross ($nGrams%,d-gram exact store)") {
        Dedup.removeDuplicateSpansAcross(fresh, baseGrams, "text", "id", k)
          .localCheckpoint(true)
      }
      // closed form on the exact path: n/100 full copies come back
      // empty; changed = those + ALL n/10 carriers (the store holds
      // the winner, so unlike the batch operator no occurrence wins)
      val empties = outExact.where(col("text") === "").count()
      require(empties == n / 100, s"full copies must empty: $empties vs ${n / 100}")
      val changedExact = outExact.as("o").join(fresh.as("f"), "id")
        .where(col("o.text") =!= col("f.text")).count()
      require(changedExact == n / 100 + n / 10,
        s"changed must be ${n / 100} copies + ${n / 10} carriers, got $changedExact")
      val fpp = 1e-4
      val bloom = graft.operators.ParaBloom.create(nGrams, fpp)
      time("Bloom delta build (absorb base gram hashes)") {
        bloom.absorb(Dedup.substringGramHashFrame(base, "text", "id", k))
      }
      println(f"[scale-probe] exact store ${nGrams * 8 / 1048576}%,d MiB " +
        f"(8 B × $nGrams%,d grams, grows forever, reshuffles per batch) vs " +
        f"Bloom ${bloom.sizeBytes / 1048576}%,d MiB FIXED, fill ${bloom.fillRatio}%.4f")
      val bc = spark.sparkContext.broadcast(bloom.copy())
      val outBloom = time("removeDuplicateSpansAcrossBloom (broadcast probe)") {
        Dedup.removeDuplicateSpansAcrossBloom(fresh, bc, "text", "id", k)
          .localCheckpoint(true)
      }
      val both = outExact.select(col("id"), col("text").as("__ex"))
        .join(outBloom.select(col("id"), col("text").as("__bl")), "id")
        .localCheckpoint(true)
      // one-sided: no false negatives ⇒ the Bloom path marks a
      // SUPERSET of gram positions ⇒ surviving text never longer
      val longer = both.where(length(col("__bl")) > length(col("__ex"))).count()
      require(longer == 0, s"Bloom output must never keep more text: $longer rows do")
      val diffs = both.where(col("__bl") =!= col("__ex")).count()
      // each diff needs ≥1 false-positive DISTINCT fresh gram (the
      // probe is a deterministic hash, so every occurrence of one gram
      // shares one decision); expected FPs = fpp × distinct fresh
      // grams — allow 4× slack
      val freshProbes = Dedup.substringGramFrame(fresh, "text", "id", k).count()
      val bound = math.max(8L, (4 * fpp * freshProbes).toLong)
      require(diffs <= bound,
        s"Bloom extra excisions $diffs exceed 4×fpp bound $bound ($freshProbes probes)")
      println(f"[scale-probe] decisions: $diffs%,d of $n%,d docs differ " +
        f"(≤ $bound bound from fpp=$fpp over $freshProbes%,d probes); " +
        "exact-path closed form holds on both")
      bc.destroy()
      spark.stop()
      return
    }
    // DSIR importance scoring at 1M raw docs:
    //   sbt "runMain graft.ScaleProbe 1000000 dsir"
    // Target: n/100 docs over a 1k-token topic vocab. Raw pool: n
    // docs, ids ≡ 0 (mod 100) topic-voiced (same vocab draw as the
    // target), the other 99% over a DISJOINT 50k web vocab; 20
    // deterministic hash-drawn tokens per doc (≈39 features with
    // bigrams). Measures fit (two map-combined feature shuffles) and
    // the scoring pass (one broadcast join of the numBuckets-row
    // ratios + a map-combined per-doc sum — no corpus-scale join),
    // prints the artifact footprint, and asserts the signal: the
    // topic-voiced 1% must average ABOVE the web 99% with positive
    // vs negative means, and resampling must skew toward it.
    if (args.contains("dsir")) {
      val buckets = 10000
      def doc(prefix: String, vocab: Int, salt: Int) = concat_ws(" ",
        (0 until 20).map(i =>
          concat(lit(prefix), pmod(xxhash64(col("id"), lit(i + salt)), lit(vocab)))): _*)
      val target = spark.range(n / 100).toDF("id")
        .select((col("id") + 3 * n).as("id"))
        .select(col("id"), doc("a", 1000, 0).as("text"))
        .repartition(32).localCheckpoint(true)
      val raw = spark.range(n).toDF("id")
        .select(col("id"),
          when(pmod(col("id"), lit(100)) === 0, doc("a", 1000, 7))
            .otherwise(doc("b", 50000, 7)).as("text"))
        .repartition(32).localCheckpoint(true)
      val model = time(f"fitDsir (${n / 100}%,d target + $n%,d raw docs, $buckets buckets)") {
        TextAnalysis.fitDsir(target, raw, "text", numBuckets = buckets)
      }
      println(f"[scale-probe] artifact: ${model.ratios.count()}%,d ratio rows " +
        f"(≤ $buckets buckets × 16 B — broadcastable at any corpus size); " +
        f"Nt=${model.nTarget}%,d Nr=${model.nRaw}%,d")
      val scored = time(f"dsirScoreAgainst ($n%,d docs)") {
        TextAnalysis.dsirScoreAgainst(raw, model, "text", "id")
          .localCheckpoint(true)
      }
      val sep = scored
        .withColumn("__topic", pmod(col("id"), lit(100)) === 0)
        .groupBy("__topic").agg(avg("dsir_logw").as("m"), count(lit(1)).as("c"))
        .collect().map(r => r.getBoolean(0) -> (r.getDouble(1), r.getLong(2))).toMap
      println(f"[scale-probe] mean logw: topic ${sep(true)._1}%.3f " +
        f"(${sep(true)._2}%,d docs) vs web ${sep(false)._1}%.3f (${sep(false)._2}%,d)")
      require(sep(true)._1 > 0 && sep(false)._1 < 0 && sep(true)._1 > sep(false)._1,
        s"topic docs must average positive and above the web pool: $sep")
      val drawn = time(f"dsirResample top-${n / 100}%,d of $n%,d") {
        TextAnalysis.dsirResample(scored, k = (n / 100).toInt, idCol = "id")
          .localCheckpoint(true)
      }
      val topicDrawn = drawn.where(pmod(col("id"), lit(100)) === 0).count()
      println(f"[scale-probe] resample drew $topicDrawn%,d topic docs of ${n / 100}%,d " +
        f"(uniform would draw ~${n / 10000}%,d)")
      require(topicDrawn > n / 1000,
        s"resampling must skew hard toward the topic docs: $topicDrawn")
      spark.stop()
      return
    }
    // DSIR bucketing TELEMETRY at corpus scale (r15 VERDICT #6):
    //   sbt "runMain graft.ScaleProbe 1000000 dsirstats"
    // Same corpus design as the `dsir` probe — which is ADVERSARIAL
    // for bucketing: ~19M distinct features (the bigrams are nearly
    // all hapax) into 10k buckets is ~1,900 features/bucket, and the
    // telemetry duly reads "undersized" (flip mass ≈ 0.48 measured —
    // the refusal signal it exists to give; the `dsir` probe shows
    // RANKING still separates at +26 vs −20, the paper's actual
    // claim). What the probe asserts is the SIZING WORKFLOW: the same
    // telemetry at 2^20 buckets (~18 features/bucket) must report
    // strictly less flipped mass and a smaller mean ratio gap — the
    // two numbers a 100 TB user walks up numBuckets until they like.
    // Also times the 1-in-10 feature-sampled variant (the shape a
    // petabyte corpus would run) and asserts its full-corpus columns
    // match the unsampled row's.
    if (args.contains("dsirstats")) {
      val buckets = 10000
      def doc(prefix: String, vocab: Int, salt: Int) = concat_ws(" ",
        (0 until 20).map(i =>
          concat(lit(prefix), pmod(xxhash64(col("id"), lit(i + salt)), lit(vocab)))): _*)
      val target = spark.range(n / 100).toDF("id")
        .select((col("id") + 3 * n).as("id"))
        .select(col("id"), doc("a", 1000, 0).as("text"))
        .repartition(32).localCheckpoint(true)
      val raw = spark.range(n).toDF("id")
        .select(col("id"),
          when(pmod(col("id"), lit(100)) === 0, doc("a", 1000, 7))
            .otherwise(doc("b", 50000, 7)).as("text"))
        .repartition(32).localCheckpoint(true)
      val model = time(f"fitDsir ($buckets buckets)") {
        TextAnalysis.fitDsir(target, raw, "text", numBuckets = buckets)
      }
      val full = time(f"dsirBucketStats full comparison ($n%,d raw docs)") {
        TextAnalysis.dsirBucketStats(model, target, raw, "text").head()
      }
      val cols = Seq("num_buckets", "buckets_hit", "distinct_feats",
        "feats_per_bucket", "sampled_feats", "sign_flips", "sign_flip_frac",
        "flip_mass_frac", "mean_abs_gap")
      println("[scale-probe] dsirstats full: " +
        cols.zipWithIndex.map { case (c, i) => s"$c=${full.get(i)}" }.mkString(" "))
      val thin = time("dsirBucketStats sampleMod=10 (1-in-10 features)") {
        TextAnalysis.dsirBucketStats(model, target, raw, "text", sampleMod = 10)
          .head()
      }
      println("[scale-probe] dsirstats 1-in-10: " +
        cols.zipWithIndex.map { case (c, i) => s"$c=${thin.get(i)}" }.mkString(" "))
      require(thin.getAs[Long]("buckets_hit") == full.getAs[Long]("buckets_hit") &&
        thin.getAs[Long]("distinct_feats") == full.getAs[Long]("distinct_feats"),
        "sampling must thin only the comparison, never the occupancy columns")
      // the sizing move: 100× more buckets must measurably help — the
      // monotonicity that makes walking numBuckets up a procedure
      val wide = time(f"fitDsir (${1 << 20} buckets) + dsirBucketStats") {
        TextAnalysis.dsirBucketStats(
          TextAnalysis.fitDsir(target, raw, "text", numBuckets = 1 << 20),
          target, raw, "text", sampleMod = 10).head()
      }
      println("[scale-probe] dsirstats 2^20 buckets (1-in-10): " +
        cols.zipWithIndex.map { case (c, i) => s"$c=${wide.get(i)}" }.mkString(" "))
      require(wide.getAs[Double]("flip_mass_frac") <
          thin.getAs[Double]("flip_mass_frac") &&
        wide.getAs[Double]("mean_abs_gap") < thin.getAs[Double]("mean_abs_gap"),
        s"100× more buckets must cut flipped mass and the ratio gap: $wide vs $thin")
      spark.stop()
      return
    }
    // SPFHP histogram packing at 10M sequences:
    //   sbt "runMain graft.ScaleProbe 10000000 packhist"
    // Realistic length mix at maxLen = 512: a quarter of the corpus
    // pinned AT capacity (truncated chunks), the rest hash-spread over
    // [1, 511]. Measures the two bounded fit jobs + the driver loop
    // (corpus-size-free: it sees 512 histogram rows, never N), the
    // broadcast rank-arithmetic assignment over all N rows, and the
    // packing efficiency Σlen / (packs × maxLen) vs the
    // one-doc-per-pack baseline — asserting zero overflow and zero
    // dropped rows at scale.
    if (args.contains("packhist")) {
      val maxLen = 512
      val lens = spark.range(n).toDF("id")
        .select(col("id"),
          when(pmod(col("id"), lit(4)) === 0, lit(maxLen))
            .otherwise((pmod(xxhash64(col("id")), lit(maxLen - 1)) + 1).cast("int"))
            .as("len"))
        .repartition(32).localCheckpoint(true)
      val st = time(f"fitPackStrategy ($n%,d lens, maxLen=$maxLen, depth 3)") {
        TextAnalysis.fitPackStrategy(lens, "len", maxLen, maxPerPack = 3)
      }
      println(f"[scale-probe] strategy: ${st.types.size}%,d pack types, " +
        f"${st.numPacks}%,d packs, ${st.paddingTokens}%,d padding tokens")
      val out = time(f"packWithStrategy ($n%,d rows)") {
        TextAnalysis.packWithStrategy(lens, st, "len", "id")
          .localCheckpoint(true)
      }
      val chk = out.groupBy("pack_id").agg(sum("len").as("s")).agg(
        count(lit(1)), sum(when(col("s") > maxLen, 1L).otherwise(0L)),
        sum(col("s"))).head()
      require(out.count() == n, "every row must keep exactly one assignment")
      require(chk.getLong(1) == 0L, s"${chk.getLong(1)} packs overflowed")
      require(chk.getLong(0) == st.numPacks,
        s"assignment realized ${chk.getLong(0)} packs vs strategy ${st.numPacks}")
      val total = chk.getLong(2).toDouble
      val eff = total / (st.numPacks.toDouble * maxLen)
      val effSingleton = total / (n.toDouble * maxLen)
      println(f"[scale-probe] efficiency: SPFHP $eff%.4f vs one-doc-per-pack " +
        f"$effSingleton%.4f (concat-chunk is 1.0 but splits docs across windows)")
      require(eff > 0.95 && eff > effSingleton,
        s"packing must be near-lossless at this mix: $eff vs singleton $effSingleton")
      spark.stop()
      return
    }
    // nprobe boundary recall: sbt "runMain graft.ScaleProbe 200000 semdedupnprobe"
    // Cross-cell near-dup pairs are invisible to single-assignment
    // SemDeDup by design; nprobe = 2 pairs each row in its two nearest
    // cells. Planted: pairs jittered to OPPOSITE sides of the midpoint
    // between two anchors (each side assigns to a different cell at
    // nprobe = 1). Measured: planted-pair recall at nprobe 1 vs 2 and
    // the candidate-mass cost of the widening.
    if (args.contains("semdedupnprobe")) {
      val nlist = 256
      val rnd = new scala.util.Random(4242)
      val anchors: Array[Array[Float]] =
        Array.fill(nlist)(Array.fill(dim)(((rnd.nextDouble() - 0.5) * 2).toFloat))
      import spark.implicits._
      val anchorsDf = broadcast(anchors.zipWithIndex
        .map { case (v, i) => (i, v) }.toSeq.toDF("zk", "anchor"))
      val nPlant = 500
      // background: anchor-SCATTERED rows (jitter 0.5 — wide enough
      // that same-cell background rows are NOT near-dups, so the pair
      // output stays plant-dominated while the candidate JOIN still
      // carries the full in-cell mass)
      val bg = spark.range(n).toDF("vec_id")
        .withColumn("zk", pmod(hash(col("vec_id") + lit(17)), lit(nlist)).cast("int"))
        .join(anchorsDf, "zk")
        .select(col("vec_id"), transform(col("anchor"), (a, j) =>
          (a + (pmod(hash(col("vec_id") * lit(8191) + j * lit(127) + lit(3)),
            lit(1000)).cast("double") / 1000.0 - 0.5) * 0.5).cast("float"))
          .as("embedding"))
      // planted boundary pairs: both members at the midpoint of anchors
      // (2b, 2b+1), nudged 1% toward opposite anchors -> different
      // cells at nprobe = 1, both carry both cells at nprobe = 2,
      // cosine(pair) ~ 1 >> threshold
      val planted = (0 until nPlant).flatMap { b =>
        val a0 = anchors(2 * (b % (nlist / 2))); val a1 = anchors(2 * (b % (nlist / 2)) + 1)
        val mid = a0.indices.map(i => (a0(i) + a1(i)) / 2).toArray
        def nudge(toward: Array[Float]) =
          mid.indices.map(i => mid(i) + 0.01f * (toward(i) - mid(i))).toSeq
        Seq((1000000000L + 2L * b, nudge(a0)), (1000000000L + 2L * b + 1, nudge(a1)))
      }.toDF("vec_id", "embedding")
      val corpus = bg.unionByName(planted).repartition(32).localCheckpoint(true)
      def recallAt(nprobe: Int): (Long, Long) = {
        // two lazy counts — pair sets at this scale must never
        // materialize (the candidate join streams through the filter)
        def pairs = Dedup.semanticPairsMulti(corpus, anchors,
          "embedding", "vec_id", 0.995, nprobe).select("id1", "id2")
        val planted2 = pairs.where(col("id1") >= 1000000000L &&
          col("id2") === col("id1") + 1 && pmod(col("id1"), lit(2)) === 0).count()
        (planted2, pairs.count())
      }
      val (r1, c1) = time("pairs at nprobe=1")(recallAt(1))
      val (r2, c2) = time("pairs at nprobe=2")(recallAt(2))
      println(f"[scale-probe] planted boundary pairs recovered: " +
        f"$r1%,d/$nPlant%,d at nprobe=1 vs $r2%,d/$nPlant%,d at nprobe=2; " +
        f"total pairs $c1%,d -> $c2%,d (${c2.toDouble / c1}%.2fx cost)")
      require(r2 == nPlant, s"nprobe=2 must recover every planted boundary pair, got $r2")
      require(r1 < nPlant / 4,
        s"plant must actually straddle boundaries at nprobe=1, got $r1 recovered")
      spark.stop()
      return
    }
    if (args.contains("ivfskew")) {
      val nlist = 64
      val rnd = new scala.util.Random(4242)
      val anchors: Array[Array[Float]] =
        Array.fill(nlist)(Array.fill(dim)(((rnd.nextDouble() - 0.5) * 2).toFloat))
      import spark.implicits._
      val anchorsDf = broadcast(anchors.zipWithIndex
        .map { case (v, i) => (i, v) }.toSeq.toDF("zk", "anchor"))
      def cellDraw(zipf: Boolean): org.apache.spark.sql.Column =
        if (!zipf) pmod(hash(col("vec_id") + lit(17)), lit(nlist)).cast("int")
        else {
          // log-uniform inverse CDF (the lmScore corpus' draw): rank
          // r gets P ∝ 1/r over [1, nlist]; rank 1 → cell 0
          val u = (pmod(hash(col("vec_id") * lit(131) + lit(7)), lit(1000000))
            .cast("double") + 0.5) / 1000000.0
          // scale by ln(nlist+1) and clamp to close the top bucket:
          // the bare floor(exp(u·ln nlist)) − 1 capped at nlist−2, so
          // the last cell was always empty (r13 ADVICE); rank-1 mass
          // barely moves (ln2/ln65 ≈ 16.6% vs ln2/ln64 ≈ 16.7%)
          (least(floor(exp(u * math.log(nlist + 1.0))), lit(nlist.toDouble)) - 1)
            .cast("int")
        }
      def corpusFor(zipf: Boolean) =
        spark.range(n).toDF("vec_id")
          .withColumn("zk", cellDraw(zipf))
          .join(anchorsDf, "zk")
          .select(col("vec_id"), transform(col("anchor"), (a, j) =>
            (a + (pmod(hash(col("vec_id") * lit(8191) + j * lit(127) + lit(3)),
              lit(1000)).cast("double") / 1000.0 - 0.5) * 0.1).cast("float"))
            .as("embedding"))
          .repartition(32).localCheckpoint(true)
      // a query INSIDE the hot cell: the zipf draw's rank-1 cell is 0
      val hotQuery = anchors(0).map(v => v * 0.97f)
      def factorOf(idx: IvfIndex): Double = {
        val r = idx.cellSizeStats.agg(sum(col("n")), max(col("n"))).head()
        r.getLong(1).toDouble / (r.getLong(0).toDouble / idx.centroidVectors.length)
      }
      // Wall time at 1M rows is fixed-cost-dominated (the hot cell is
      // ~40 MB); ROWS SCANNED is the measure that scales — probe cost
      // at 100 TB is proportional to it, and it is deterministic.
      def probeHot(label: String, idx: IvfIndex): Unit = {
        val cells = idx.probeCells(hotQuery, 4)
        val scanned = idx.indexed
          .where(col("cell").isin(cells.toIndexedSeq.map(Int.box): _*)).count()
        time(f"$label hot-cell search nprobe=4 (scans $scanned%,d rows)") {
          require(idx.search(hotQuery, k = 10, nprobe = 4,
            tieBreakers = Seq(asc("vec_id"))).collect().length == 10)
        }
      }
      // On a PERSISTED cell-partitioned layout the probe filter prunes
      // FILES, so search cost tracks the probed cells' bytes — that is
      // where skew taxes and where the repair shows. (In-memory, the
      // lineage recomputes assignment over the whole corpus per query
      // and masks both — measured 1.26 s vs 1.30 s, meaningless.)
      // the zipf layout is REPAIRED IN PLACE below, so it must be
      // rebuilt every run — caching it would make a second run measure
      // the already-repaired layout as its "skewed" baseline
      def saved(label: String, zipf: Boolean): IvfIndex = {
        val p = s"$path-ivfskew-$label"
        val rebuild = zipf || !new java.io.File(p).exists()
        if (rebuild)
          IvfIndex.withCentroids(corpusFor(zipf), "embedding", anchors).save(p)
        IvfIndex.load(spark, p)
      }
      val balanced = saved("balanced", zipf = false)
      println(f"[scale-probe] balanced max/avg cell factor: ${factorOf(balanced)}%.1fx")
      probeHot("balanced (persisted)", balanced)
      val skewed = saved("zipf", zipf = true)
      println(f"[scale-probe] zipf     max/avg cell factor: ${factorOf(skewed)}%.1fx")
      probeHot("zipf     (persisted)", skewed)
      val guard = try { skewed.driftGuard(maxFactor = 8.0); "PASSED (unexpected)" }
      catch { case e: IllegalStateException => s"refused: ${e.getMessage.take(80)}..." }
      println(s"[scale-probe] driftGuard(8x) on the zipf index: $guard")
      val cap = 2L * n / nlist
      val hotRows = skewed.cellSizeStats.where(col("n") > cap)
        .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
      val repaired = time(s"repairSaved(maxRows=$cap)") {
        IvfIndex.repairSaved(spark, s"$path-ivfskew-zipf", cap)
      }
      println(f"[scale-probe] repaired max/avg cell factor: ${factorOf(repaired)}%.1fx " +
        f"(nlist ${repaired.centroidVectors.length}; rewrote $hotRows%,d of $n%,d rows — " +
        "cold cell files untouched)")
      probeHot("repaired (persisted)", repaired)
      // the CODED tier follows the repaired vector tier with ZERO
      // re-encoding (IvfPqIndex.repairSavedFrom): build the paired
      // IVFADC layout from the SAME pre-repair assignments, then time
      // the follow — only the hot cells' rows rewrite, and every code
      // byte survives the renumbering untouched
      val pqPath = s"$path-ivfskew-zipf-pq"
      val corpusZ = corpusFor(zipf = true)
      val pqModel = PqIndex.fit(corpusZ, "embedding", m = 8, k = 256)
      time("ivfadc encode+save (paired coded layout, pre-repair quantizer)") {
        IvfPqIndex.withArtifacts(corpusZ, "embedding", anchors, pqModel).save(pqPath)
      }
      val pqRepaired = time("ivfadc repairSavedFrom (follow, zero re-encode)") {
        IvfPqIndex.repairSavedFrom(spark, pqPath, repaired, "vec_id")
      }
      val pqMax = pqRepaired.cellSizeStats.agg(max(col("n"))).head().getLong(0)
      require(pqRepaired.encoded.count() == n, "coded rows must survive the follow")
      require(pqRepaired.centroidVectors.length == repaired.centroidVectors.length,
        "coded tier must adopt the repaired quantizer")
      println(f"[scale-probe] ivfadc followed: nlist ${pqRepaired.centroidVectors.length}, " +
        f"fullest cell $pqMax%,d rows, codes untouched")
      spark.stop()
      return
    }
    val idxPath = s"$path-ivf"
    time("ivf build nlist=64") {
      val idx = IvfIndex.build(e, "embedding", nlist = 64)
      time("ivf search nprobe=4 (flat)") {
        idx.search(query, k = 10, nprobe = 4, tieBreakers = Seq(asc("vec_id"))).collect()
      }
      time("ivf writePartitioned")(idx.writePartitioned(idxPath))
      // cell-partitioned layout: the probe filter prunes FILES, so the
      // scan itself shrinks to ~nprobe/nlist of the corpus
      val cells = idx.probeCells(query, 4)
      time("ivf search nprobe=4 (partitioned)") {
        val part = spark.read.parquet(idxPath)
          .where(col("cell").isin(cells.toIndexedSeq.map(Int.box): _*))
        Nearest.topK(part, "embedding", lit(query), n = 10,
          tieBreakers = Seq(asc("vec_id"))).collect()
      }
    }
    spark.stop()
  }
}
