package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, SimJoin}

class DedupSimJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog", "a"),
    (2L, "the quick brown fox jumps over the lazy dog", "a"),   // exact dup of 1
    (3L, "the quick brown fox leaps over the lazy dog", "a"),   // near dup of 1
    (4L, "completely different text about spark engines", "a"),
    (5L, "dog lazy the over jumps fox brown quick the", "b")    // reorder of 1
  ).toDF("doc_id", "text", "source")

  test("exact dedup keeps the min-id row per duplicate group") {
    val out = Dedup.exact(docs, Seq("text"), "doc_id")
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L, 4L, 5L))
    val groups = Dedup.exactGroups(docs, Seq("text"), "doc_id")
      .where(col("n_copies") > 1).head()
    assert(groups.getAs[Long]("doc_id") == 1L && groups.getAs[Long]("n_copies") == 2L)
  }

  test("unigram jaccard: reordered text scores 1.0; near-dup scores high; unrelated low") {
    val j = Dedup.jaccard(col("a"), col("b"))
    val df = Seq(
      ("the quick fox", "fox quick the"),
      ("the quick brown fox", "the quick brown wolf"),
      ("alpha beta", "gamma delta")).toDF("a", "b").select(j.as("j"))
    val vals = df.collect().map(_.getDouble(0))
    assert(vals(0) == 1.0)
    assert(vals(1) == 3.0 / 5.0)
    assert(vals(2) == 0.0)
  }

  test("trigram shingles: short docs produce no fabricated shingles") {
    val j = Dedup.jaccard(col("a"), col("b"), shingleSize = 3)
    val df = Seq(("one two", "one two")).toDF("a", "b").select(j.as("j"))
    assert(df.head().getDouble(0) == 0.0) // no 3-gram exists in a 2-token doc
  }

  test("jaccardPairs + survivors: dup and reorder drop, near-dup threshold-dependent") {
    val pairs = Dedup.jaccardPairs(docs, "text", "doc_id", threshold = 0.99)
    val dropped = pairs.select("id2").collect().map(_.getLong(0)).toSet
    assert(dropped == Set(2L, 5L)) // exact dup + reorder (set semantics)
    val surv = Dedup.survivors(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(surv == Seq(1L, 3L, 4L))
  }

  test("simhash: identical and reordered unigram text share a fingerprint; dedup keeps min id") {
    val fp = Dedup.withSimHash(docs, "text")
      .select("doc_id", "simhash").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) == fp(5L)) // unigram simhash is order-invariant
    assert(fp(1L) != fp(4L))
    val surv = Dedup.simhash(docs, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(surv == Seq(1L, 3L, 4L))
  }

  test("simhash bucket dedup: merges every multiset-dup, AND near-dups whose votes don't flip") {
    // One direction is algebraic: the fingerprint is a pure function of
    // the token MULTISET (per-bit votes sum over shingles, order-free),
    // so multiset-equal docs always share a fingerprint and bucket
    // dedup merges them — simhash survivors ⊆ multiset-dedup survivors.
    // The CONVERSE IS FALSE BY DESIGN, and not just at the ~2⁻⁶⁴
    // collision level: simhash is locality-sensitive, so a near-dup
    // whose edit doesn't flip any bit's majority vote lands in the SAME
    // bucket (radius-0 merging of near-identical texts is the
    // operator's value over exact dedup). The sf0.001 fixture
    // demonstrates it — its planted near-dups produce fingerprint-equal
    // pairs with DIFFERENT multisets — which is exactly why the tier
    // has a GOLDEN anchor (dedup_simhash_anchor / _drops) instead of a
    // token-level DuckDB derivation: no engine without the hash can
    // predict which near-dups merge.
    def multisetDedup(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val toks = array_sort(filter(
        split(lower(col("text")), graft.expressions.ShingleHashes.WsRegex),
        t => length(t) > 0))
      val keyed = df.select(col("doc_id"), toks.as("__toks"))
      val empty = keyed.where(size(col("__toks")) === 0).select("doc_id")
      val grouped = keyed.where(size(col("__toks")) > 0)
        .groupBy(col("__toks")).agg(min(col("doc_id")).as("doc_id")).select("doc_id")
      empty.unionByName(grouped).collect().map(_.getLong(0)).sorted.toSeq
    }
    // planted corpus: texts far apart except the multiset-dup pair →
    // simhash == multiset dedup exactly (incl. the no-signal rule:
    // empty/blank docs all kept; set-equal but multiset-unequal NOT
    // merged — multiplicity shifts the votes)
    val planted = Seq(
      (1L, "alpha beta gamma alpha"), (2L, "alpha alpha gamma beta"), // multiset dup of 1
      (3L, "alpha beta gamma"),                                       // SET-equal, multiset-unequal
      (4L, ""), (5L, "   "),                                          // no signal: both kept
      (6L, "something else entirely")).toDF("doc_id", "text")
    val viaSimhash = Dedup.simhash(planted, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(viaSimhash == Seq(1L, 3L, 4L, 5L, 6L))
    assert(viaSimhash == multisetDedup(planted))
    // fixture: subset relation holds, and the near-dup merges are REAL
    // (simhash drops strictly more than multiset equality explains)
    val docs01 = Tables(spark, "/root/testdata/sf0.001", "documents")
    val fixtureSimhash = Dedup.simhash(docs01, "text", "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val fixtureMultiset = multisetDedup(docs01).toSet
    assert(fixtureSimhash.subsetOf(fixtureMultiset),
      s"simhash kept docs multiset dedup merged: ${(fixtureSimhash -- fixtureMultiset).take(5)}")
    assert((fixtureMultiset -- fixtureSimhash).nonEmpty,
      "expected the fixture's planted near-dups to produce radius-0 fingerprint merges")
  }

  test("bitsetJaccardPairs equals jaccardPairs exactly; rejects >64-term vocabularies") {
    val docs01 = Tables(spark, "/root/testdata/sf0.001", "documents")
    val viaHash = Dedup.jaccardPairs(docs01, "text", "doc_id", 0.8,
      shingleSize = 1, groupCol = Some("source"))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaBits = Dedup.bitsetJaccardPairs(docs01, "text", "doc_id", 0.8,
      groupCol = Some("source"))
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaBits == viaHash && viaHash.nonEmpty)
    // >64 distinct terms takes the array-of-longs bitmap path — still
    // exactly equal to the hash path
    val wide = (1 to 70).map(i =>
      (i.toLong, s"shared common words term$i term${i % 3}")).toDF("doc_id", "text")
    val wideHash = Dedup.jaccardPairs(wide, "text", "doc_id", 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val wideBits = Dedup.bitsetJaccardPairs(wide, "text", "doc_id", 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(wideBits == wideHash && wideHash.nonEmpty)
    // and the cap still refuses unbounded vocabularies
    intercept[IllegalArgumentException] {
      Dedup.bitsetJaccardPairs(wide, "text", "doc_id", 0.5, maxVocab = 10)
    }
  }

  test("duplicateComponents closes chains transitively; single-pass survivors does not") {
    // chain: 1~2, 2~3 but NOT 1~3
    val chain = Seq((1L, 2L, 0.9), (2L, 3L, 0.9)).toDF("id1", "id2", "similarity")
    val ids = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val comps = Dedup.duplicateComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), "whole chain collapses to rep 1")
    val transitive = Dedup.transitiveSurvivors(ids, "doc_id", chain)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(transitive == Seq(1L, 4L))
    // the documented single-pass rule keeps 1 and 4 but ALSO 3? No: 3 is
    // id2 of pair (2,3) so it drops too; the rules differ on deeper
    // chains where a middle node is only ever an id1 — e.g. (2,3) alone:
    val surv = Dedup.survivors(ids, "doc_id", Seq((2L, 3L, 0.9)).toDF("id1", "id2", "similarity"))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(surv == Seq(1L, 2L, 4L))
  }

  test("duplicateComponents: driver union-find equals the distributed iteration") {
    val rnd = new scala.util.Random(11)
    // random graph with chains, cycles, and isolated pairs
    val pairs = (0 until 400).map { _ =>
      val a = rnd.nextInt(120).toLong; val b = rnd.nextInt(120).toLong
      (math.min(a, b), math.max(a, b) + 1, 0.9) // +1 avoids self-loops
    }.toDF("id1", "id2", "similarity")
    def labelMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val driver = labelMap(Dedup.duplicateComponents(pairs))
    val dist = labelMap(Dedup.duplicateComponents(pairs, maxDriverEdges = 0L))
    assert(driver == dist, "driver fast path must reproduce the distributed labels")
    assert(driver.nonEmpty && driver.forall { case (id, rep) => rep <= id })
  }

  test("simhash: docs shorter than the shingle size are all kept, not merged as fingerprint-0 'duplicates'") {
    val short = Seq(
      (1L, "hello world"), (2L, "price list"), (3L, "totally different"),
      (4L, "one two three four five six seven")
    ).toDF("doc_id", "text")
    val surv = Dedup.simhash(short, "text", "doc_id", shingleSize = 3)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(surv == Seq(1L, 2L, 3L, 4L), s"short docs must all survive, got $surv")
  }

  test("simhashPairs: pigeonhole band join equals brute-force hamming on the fixture") {
    val corpus = Tables(spark, "/root/testdata/sf0.001", "documents")
    for (maxH <- Seq(0, 3, 6)) {
      val got = Dedup.simhashPairs(corpus, "text", "doc_id", maxHamming = maxH)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // brute force over collected fingerprints (fixture-sized only)
      val fps = Dedup.withSimHash(corpus, "text").select("doc_id", "simhash")
        .collect().map(r => (r.getLong(0), r.getLong(1))).filter(_._2 != 0L)
      val want = (for {
        (i1, f1) <- fps; (i2, f2) <- fps
        if i1 < i2 && java.lang.Long.bitCount(f1 ^ f2) <= maxH
      } yield (i1, i2)).toSet
      assert(got == want, s"band-join pairs diverge from brute force at maxHamming=$maxH")
    }
  }

  test("simhashPairs: zero-fingerprint rows never pair; hamming column is exact") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // identical -> hamming 0
      (3L, ""), (4L, "")                           // no signal: must not pair
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(d, "text", "doc_id", maxHamming = 3).collect()
    assert(pairs.length == 1)
    assert(pairs.head.getLong(0) == 1L && pairs.head.getLong(1) == 2L &&
      pairs.head.getInt(2) == 0)
  }

  test("winnowing: shared substrings >= w+k-1 chars guarantee a shared fingerprint") {
    import graft.operators.TextAnalysis
    val k = 5; val w = 4
    val shared = "the stolen passage appears verbatim here" // >> w+k-1 = 8 chars
    val d = Seq(
      (1L, s"totally original opening words $shared and an original ending"),
      (2L, s"different framing text $shared with unrelated conclusion"),
      (3L, "nothing in common with either document whatsoever zebra")
    ).toDF("doc_id", "text")
    val fps = d.select(col("doc_id"),
        TextAnalysis.winnowFingerprint(col("text"), k, w).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "docs sharing a long substring must share a fingerprint (winnowing guarantee)")
    // maxDfFraction = 1.0 disables the boilerplate cap — this corpus is
    // 3 docs, so the planted passage's df of 2 would otherwise be "hot"
    val pairs = Dedup.winnowOverlapPairs(d, "text", "doc_id", minShared = 2,
        maxDfFraction = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "the unrelated doc must not pair")
  }

  test("winnowing df cap drops corpus-wide boilerplate, keeps rare shared passages") {
    val boiler = "standard legal disclaimer attached to every document in the corpus"
    val stolen = "a rare plagiarized sentence appearing twice only"
    val d = (1L to 20L).map { i =>
      val body = s"unique content ${i}a ${i}b ${i}c ${i}d for document number $i"
      val extra = if (i <= 2) s" $stolen" else ""
      (i, s"$body $boiler$extra")
    }.toDF("doc_id", "text")
    val pairs = Dedup.winnowOverlapPairs(d, "text", "doc_id", minShared = 2,
        k = 16, w = 8, maxDfFraction = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"only the stolen-passage pair should survive the boilerplate cap, got $pairs")
  }

  test("winnowing: whitespace-run normalization; short text -> empty; determinism") {
    import graft.operators.TextAnalysis
    val d = Seq(
      (1L, "alpha    beta\tgamma"), (2L, " alpha beta gamma "), (3L, "ab")
    ).toDF("doc_id", "text")
    val fps = d.select(col("doc_id"),
        TextAnalysis.winnowFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fps(1L) == fps(2L), "whitespace runs must not perturb fingerprints")
    assert(fps(1L).nonEmpty)
    assert(fps(3L).isEmpty, "texts shorter than k chars have no k-grams")
  }

  test("winnowing at w=1 degenerates to shared-distinct-k-gram counts (oracle anchor)") {
    // At window w = 1 every k-gram hash is its window's minimum, so
    // selection prunes nothing and n_shared must equal the cardinality
    // of the intersection of the docs' DISTINCT normalized k-gram SETS
    // — the degenerate-parameter equivalence the dedup_winnow_exact
    // DuckDB oracle relies on (the oracle counts substrings, the
    // operator counts their hashes; intersection cardinality is
    // invariant under the renaming, modulo 64-bit collisions).
    val k = 6
    val d = Seq(
      (1L, "the stolen passage appears verbatim in both documents"),
      (2L, "framing text the stolen passage appears verbatim elsewhere"),
      (3L, "Entirely   unrelated\tcontent with odd   spacing"),
      (4L, "entirely unrelated content with odd spacing") // = 3 after normalization
    ).toDF("doc_id", "text")
    def normalize(s: String) =
      s.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).mkString(" ")
    val gramSets = Seq(
      1L -> "the stolen passage appears verbatim in both documents",
      2L -> "framing text the stolen passage appears verbatim elsewhere",
      3L -> "Entirely   unrelated\tcontent with odd   spacing",
      4L -> "entirely unrelated content with odd spacing"
    ).map { case (id, t) =>
      val nt = normalize(t)
      id -> (0 to nt.length - k).map(i => nt.substring(i, i + k)).toSet
    }.toMap
    val want = (for {
      (i1, g1) <- gramSets; (i2, g2) <- gramSets
      if i1 < i2 && (g1 intersect g2).nonEmpty
    } yield (i1, i2) -> (g1 intersect g2).size.toLong).toMap
    val got = Dedup.winnowOverlapPairs(d, "text", "doc_id", minShared = 1,
        k = k, w = 1, maxDfFraction = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == want,
      s"w=1 winnow must equal brute-force distinct-gram intersection: $got vs $want")
  }

  test("minhashPairs finds the planted near-dup pair") {
    val pairs = Dedup.minhashPairs(docs, "text", "doc_id", threshold = 0.5,
      shingleSize = 2, bands = 16)
    val found = pairs.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((1L, 2L)), s"exact dup must be found, got $found")
  }

  test("incremental dedup: new batch deduped against history and within itself") {
    val base = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated corpus content about spark plans")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"), // dup of base 0
      (3L, "novel text one about streaming watermarks and state"),
      (5L, "novel text one about streaming watermarks and state"), // dup of new 3
      (7L, "entirely distinct fresh document with its own words")
    ).toDF("doc_id", "text")
    val across = Dedup.minhashPairsAcross(fresh, base, "text", "doc_id", 0.5,
        shingleSize = 2)
      .select("id_new", "id_base").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(across.contains((1L, 0L)), s"cross-corpus dup must be found, got $across")
    assert(!across.exists(_._1 == 7L), "unique new doc must not match history")
    val surv = Dedup.incrementalSurvivors(fresh, base, "text", "doc_id", 0.5,
        shingleSize = 2)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(surv == Seq(3L, 7L),
      s"expected history-dup 1 and batch-dup 5 dropped, got $surv")
  }

  test("incremental dedup at threshold=1.0 is provably exact (oracle anchor)") {
    // A Jaccard-1 pair has identical shingle sets -> identical MinHash
    // signatures -> collides in EVERY band (recall 1 by construction);
    // the exact-Jaccard verify then admits precisely the
    // identical-set pairs. So survivors must equal the brute-force
    // "fresh docs whose distinct word-3-gram set matches neither base
    // nor an earlier fresh doc" — the equivalence the
    // dedup_incremental_exact DuckDB oracle relies on.
    val base = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight nine"))
    val fresh = Seq(
      (1L, "  ALPHA beta\tgamma delta epsilon zeta eta THETA "), // = base 0 after normalization
      (3L, "one two three four five six seven eight"),  // strict SUBSET of base 2 -> J < 1 -> survives
      (5L, "novel streaming watermark state content here"),
      (7L, "novel streaming watermark state content here"),     // = fresh 5 -> dropped (later id)
      (9L, "too short"))                                        // < 3 tokens: no signal, never pairs
    val surv = Dedup.incrementalSurvivors(fresh.toDF("doc_id", "text"),
        base.toDF("doc_id", "text"), "text", "doc_id", threshold = 1.0)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    def grams(t: String): Set[String] = {
      val toks = t.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty)
      (0 to toks.length - 3).map(i => toks.slice(i, i + 3).mkString(" ")).toSet
    }
    val baseSets = base.map { case (_, t) => grams(t) }.filter(_.nonEmpty).toSet
    val want = fresh.filter { case (id, t) =>
      val g = grams(t)
      g.isEmpty || (!baseSets.contains(g) &&
        !fresh.exists { case (id2, t2) => id2 < id && grams(t2) == g })
    }.map(_._1).sorted
    assert(surv == want, s"threshold=1.0 survivors diverge from brute force: $surv vs $want")
    // pin the intended fixture semantics explicitly, not just the mirror
    assert(surv == Seq(3L, 5L, 9L),
      s"expected: fresh 1 dropped (J=1 vs base 0), 7 dropped (J=1 vs fresh 5), " +
        s"3 survives (strict subset, J<1), 9 survives (no signal); got $surv")
    // same equivalence at shingleSize = 1 (the dedup_incremental_exact
    // config): J=1 now means equal distinct word SETS — 3 still
    // survives ("nine" missing from its set), 9 now has signal
    // ({"too","short"}, unique) and still survives
    val surv1 = Dedup.incrementalSurvivors(fresh.toDF("doc_id", "text"),
        base.toDF("doc_id", "text"), "text", "doc_id",
        threshold = 1.0, shingleSize = 1)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    def wordSet(t: String): Set[String] =
      t.toLowerCase(java.util.Locale.ROOT).split("\\s+").filter(_.nonEmpty).toSet
    val baseWordSets = base.map { case (_, t) => wordSet(t) }.filter(_.nonEmpty).toSet
    val want1 = fresh.filter { case (id, t) =>
      val g = wordSet(t)
      g.isEmpty || (!baseWordSets.contains(g) &&
        !fresh.exists { case (id2, t2) => id2 < id && wordSet(t2) == g })
    }.map(_._1).sorted
    assert(surv1 == want1 && surv1 == Seq(3L, 5L, 9L),
      s"unigram threshold=1.0 survivors diverge: $surv1 vs $want1")
    // single-corpus variant (dedup_minhash_exact's config, bands = 1:
    // the banded join IS signature-identity grouping): all docs
    // pooled, keep-min-id within each identical-word-set group
    val all = (base ++ fresh).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(all, "text", "doc_id", threshold = 1.0,
      shingleSize = 1, bands = 1)
    val surv2 = Dedup.survivors(all, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    // 1 duplicates 0 (same word set, different case/spacing), 7
    // duplicates 5; everyone else unique
    assert(surv2 == Seq(0L, 2L, 3L, 5L, 9L),
      s"single-corpus threshold=1.0 survivors diverge: $surv2")
  }

  test("decontaminate: drops exactly the corpus docs sharing an n-gram with the eval set") {
    val evalDf = Seq(
      (100L, "what is the capital of france paris obviously"),
      (101L, "tiny")).toDF("doc_id", "text")
    val corpus = Seq(
      // contains the eval 4-gram "the capital of france" (case/space-insensitively)
      (1L, "students asked what is THE  Capital of France during class"),
      // shares only shorter runs (3 consecutive words max) -> clean
      (2L, "the capital city of great france is lovely"),
      (3L, "completely unrelated text about spark physical plans"),
      // fewer than n tokens -> no grams -> trivially clean
      (4L, "tiny")).toDF("doc_id", "text")
    val surv = Dedup.decontaminate(corpus, evalDf, "text", "doc_id", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(surv == Seq(2L, 3L, 4L), s"got $surv")
    // n larger than every doc: nothing can match, everything survives
    val all = Dedup.decontaminate(corpus, evalDf, "text", "doc_id", n = 50).count()
    assert(all == 4)
  }

  test("decontaminateReport attributes each contaminated doc to its eval doc with exact gram counts") {
    val evalDf = Seq(
      (100L, "alpha beta gamma delta epsilon"),
      (101L, "omega psi chi phi")).toDF("eval_id", "text")
    val corpus = Seq(
      // shares 4-grams "alpha beta gamma delta" AND "beta gamma delta epsilon" with eval 100
      (1L, "alpha beta gamma delta epsilon zeta"),
      // shares exactly one 4-gram with eval 100 and one with eval 101
      (2L, "alpha beta gamma delta then omega psi chi phi"),
      (3L, "nothing shared here at all")).toDF("doc_id", "text")
    val got = Dedup.decontaminateReport(corpus, evalDf, "text", "doc_id", "eval_id", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == Map((1L, 100L) -> 2L, (2L, 100L) -> 1L, (2L, 101L) -> 1L), s"got $got")
    // the attributed doc set is exactly the decontaminate drop set
    val dropped = corpus.select("doc_id")
      .except(Dedup.decontaminate(corpus, evalDf, "text", "doc_id", n = 4).select("doc_id"))
      .collect().map(_.getLong(0)).toSet
    assert(got.keys.map(_._1).toSet == dropped)
    // repeated gram inside a corpus doc must not inflate the count
    val rep = Seq((9L, "alpha beta gamma delta and alpha beta gamma delta"))
      .toDF("doc_id", "text")
    val repGot = Dedup.decontaminateReport(rep, evalDf, "text", "doc_id", "eval_id", n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(repGot == Map((9L, 100L) -> 1L), s"got $repGot")
  }

  test("streaming decontaminatePerBatch drains to exactly the batch survivors") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val dir = Files.createTempDirectory("graft_stream_decon")
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      dir.resolve("documents.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val docsStatic = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val evalDf = docsStatic.where(col("doc_id") % 7 === 0)
    val want = Dedup.decontaminate(docsStatic.where(col("doc_id") % 7 =!= 0),
        evalDf, "text", "doc_id", n = 13)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val stream = spark.readStream.schema(docsStatic.schema).parquet(dir.toString)
      .where(col("doc_id") % 7 =!= 0)
    val got = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = graft.streaming.StreamOps.decontaminatePerBatch(
      stream, evalDf, "text", "doc_id") { (df, _) =>
      got ++= df.select("doc_id").collect().map(_.getLong(0))
    }
    try q.processAllAvailable() finally q.stop()
    assert(got.size == want.size, s"stream emitted ${got.size} vs batch ${want.size}")
    assert(got.toSet == want)
  }

  test("minhashPairs: exact precision (subset of PPJoin pairs), high recall on the fixture") {
    val fixture = Tables(spark, "/root/testdata/sf0.001", "documents")
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(Dedup.prefixJaccardPairs(fixture, "text", "doc_id", 0.5))
    val mh = pairSet(Dedup.minhashPairs(fixture, "text", "doc_id", 0.5, shingleSize = 1))
    assert(exact.nonEmpty)
    // verify stage makes precision exact: every emitted pair IS a true pair
    assert(mh.subsetOf(exact), s"false positives: ${(mh -- exact).take(5)}")
    // banding recall at t=0.5 with 128/32 is ≥1−(1−J⁴)³² ≈ 0.87 at the
    // boundary and →1 above it; the fixture's dup mass is well above t
    assert(mh.size >= (0.8 * exact.size).toInt,
      s"recall too low: ${mh.size}/${exact.size}")
  }

  test("knnJoin returns exactly k per query and agrees with single-query nearest") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 3).select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val out = SimJoin.knnJoin(q, e, "query_id", "qe", "embedding", k = 4,
      corpusTieBreak = Seq(asc("vec_id")))
    val counts = out.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(counts.forall(_ == 4))
    // each query's own vector must rank first with similarity ~1
    val self = out.where(col("query_id") === col("vec_id"))
      .select("similarity").collect().map(_.getDouble(0))
    assert(self.length == 3 && self.forall(s => math.abs(s - 1.0) < 1e-9))
  }

  test("thresholdSelfJoin emits each qualifying pair once with id1 < id2") {
    val df = Seq(
      (1L, Array(1f, 0f)), (2L, Array(1f, 0.01f)), (3L, Array(0f, 1f))
    ).toDF("id", "emb")
    val pairs = SimJoin.thresholdSelfJoin(df, "id", "emb", 0.9)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("approxCosineSelfJoin: exact precision, high recall vs the exact join") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = SimJoin.thresholdSelfJoin(e, "vec_id", "embedding", 0.35)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = SimJoin.approxCosineSelfJoin(e, "vec_id", "embedding", 0.35,
      bucketLength = 0.5, numHashTables = 6)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((approx -- exact).isEmpty, "LSH path must not emit sub-threshold pairs")
    assert(approx.size >= (exact.size * 0.9).toInt, s"recall ${approx.size}/${exact.size}")
    // the compound-key config the ann_cosine_lsh query ships (3
    // projections ANDed per table, 8 tables) must hold the same recall
    // with far fewer candidates
    val compound = SimJoin.approxCosineSelfJoin(e, "vec_id", "embedding", 0.35,
      bucketLength = 0.5, numHashTables = 8, projsPerTable = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((compound -- exact).isEmpty, "compound LSH path must not emit sub-threshold pairs")
    assert(compound.size >= (exact.size * 0.9).toInt,
      s"compound recall ${compound.size}/${exact.size}")
  }

  test("approxCosineSelfJoin at bucketLength >= 4 EQUALS the exact join (pairs AND scores)") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id1"), col("id2"), round(col("similarity"), 9).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exact = canon(SimJoin.thresholdSelfJoin(e, "vec_id", "embedding", 0.35))
    // centered keys: |dot| <= 1 < bucketLength/2 => every row in bucket
    // 0 => all-pairs candidates => identical to the exact join
    val degenerate = canon(SimJoin.approxCosineSelfJoin(e, "vec_id", "embedding", 0.35,
      bucketLength = 8.0, numHashTables = 1))
    assert(degenerate == exact,
      s"degenerate LSH diverged: ${(degenerate -- exact).take(3)} / ${(exact -- degenerate).take(3)}")
  }

  test("random-projection keys: zero vectors land in a sentinel bucket no unit vector reaches") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq.fill(4)(0f)),
      (2L, Seq.fill(4)(0f)),
      (3L, Seq(1f, 0f, 0f, 0f))).toDF("id", "emb")
    // zero vectors may bucket with each other but their exact re-score
    // (cosine = 0 by engine convention) can never pass a positive
    // threshold — and they must never collide with real vectors
    val pairs = SimJoin.approxCosineSelfJoin(df, "id", "emb", 0.1,
      bucketLength = 0.5, numHashTables = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.isEmpty, s"zero vectors leaked through: ${pairs.mkString(",")}")
  }

  test("semanticDedup at one cell EQUALS the global pairwise operator; multi-cell survivors are a superset") {
    import graft.operators.IvfIndex
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val dim = emb.where(col("embedding").isNotNull)
      .select(size(col("embedding"))).head().getInt(0)
    // one cell (a single frozen centroid): the within-cluster prune is
    // provably the global one — pairs AND survivors must match the
    // pairwise path exactly
    val one = IvfIndex.withCentroids(emb, "embedding", Array(Array.fill(dim)(0f)))
    val exactPairs = Dedup.embeddingPairs(emb, "embedding", "vec_id", 0.35)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val onePairs = Dedup.semanticPairs(one, "vec_id", 0.35)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(onePairs == exactPairs, "one cell must degenerate to the exact pairwise join")
    assert(exactPairs.nonEmpty, "fixture must exercise the prune")
    val exactSurvivors = Dedup.transitiveSurvivors(emb, "vec_id",
        Dedup.embeddingPairs(emb, "embedding", "vec_id", 0.35))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val oneSurvivors = Dedup.semanticDedup(emb, one, "vec_id", 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(oneSurvivors == exactSurvivors)
    // a real multi-cell quantizer: within-cell pairs ⊆ exact pairs, so
    // survivors ⊇ exact — SemDeDup's approximation can only UNDER-prune
    // (never deletes a doc the exact path would keep)
    val idx = IvfIndex.build(emb, "embedding", nlist = 4)
    val cellPairs = Dedup.semanticPairs(idx, "vec_id", 0.35)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cellPairs.subsetOf(exactPairs),
      s"within-cell pairs must be a subset; extras: ${cellPairs -- exactPairs}")
    val cellSurvivors = Dedup.semanticDedup(emb, idx, "vec_id", 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(exactSurvivors.subsetOf(cellSurvivors),
      s"semdedup must never over-delete; missing: ${exactSurvivors -- cellSurvivors}")
    // null embeddings (if any) and unpaired rows always survive: the
    // survivor count can never drop below total - paired
    assert(cellSurvivors.size >= emb.count() -
      cellPairs.flatMap(p => Seq(p._1, p._2)).size)
  }

  test("incremental semanticDedup: one cell equals the global greedy rule; frozen cells only under-drop") {
    import graft.operators.IvfIndex
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val base = emb.where(col("vec_id") % 2 === 0)
    val fresh = emb.where(col("vec_id") % 2 === 1)
    val dim = emb.where(col("embedding").isNotNull)
      .select(size(col("embedding"))).head().getInt(0)
    val baseOne = IvfIndex.withCentroids(base, "embedding", Array(Array.fill(dim)(0f)))
    val got = Dedup.semanticIncrementalSurvivors(fresh, baseOne, "vec_id", 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // reference: the greedy incremental rule computed driver-side from
    // the global pairwise operator — drop a fresh id on any match to a
    // base id, or as the greater id of a fresh-fresh pair
    val pairs = Dedup.embeddingPairs(emb, "embedding", "vec_id", 0.35)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    val dropped = pairs.flatMap { case (i, j) =>
      if (i % 2 == 1 && j % 2 == 0) Some(i)
      else if (i % 2 == 0 && j % 2 == 1) Some(j)
      else if (i % 2 == 1 && j % 2 == 1) Some(j)
      else None
    }.toSet
    val freshIds = fresh.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got == freshIds -- dropped,
      s"one-cell incremental must equal the global greedy rule; " +
        s"diff: ${(got -- (freshIds -- dropped)) ++ ((freshIds -- dropped) -- got)}")
    assert(dropped.nonEmpty, "fixture must exercise both drop directions")
    // a real multi-cell quantizer sees a SUBSET of the pairs, so it
    // can only drop fewer fresh rows — never more
    val base4 = IvfIndex.build(base, "embedding", nlist = 4)
    val got4 = Dedup.semanticIncrementalSurvivors(fresh, base4, "vec_id", 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(got4),
      s"frozen-cell incremental must never over-drop; missing: ${got -- got4}")
  }

  test("streaming semanticDedup: two-batch drain == sequential incremental composition, store carries") {
    import graft.operators.IvfIndex
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val dim = emb.where(col("embedding").isNotNull)
      .select(size(col("embedding"))).head().getInt(0)
    val centroids = Array(Array.fill(dim)(0f)) // one cell — the oracled degenerate
    val b1 = emb.where(col("vec_id") < 250)
    val b2 = emb.where(col("vec_id") >= 250)
    // reference: the incremental operator applied sequentially — batch 1
    // against the empty store, batch 2 against batch 1's survivors
    val s1 = Dedup.semanticIncrementalSurvivors(b1,
      IvfIndex.withCentroids(b1.limit(0), "embedding", centroids), "vec_id", 0.35)
    val s2 = Dedup.semanticIncrementalSurvivors(b2,
      IvfIndex.withCentroids(s1, "embedding", centroids), "vec_id", 0.35)
    val want = (s1.select("vec_id").collect() ++ s2.select("vec_id").collect())
      .map(_.getLong(0)).toSet
    // the drain: two parquet files, maxFilesPerTrigger=1, ordered mtimes
    val dir = java.nio.file.Files.createTempDirectory("graft_semdedup_stream")
    b1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    b2.coalesce(1).write.parquet(dir.resolve("b2").toString)
    val Seq(f1, f2) = Seq("b1", "b2").map(b =>
      new java.io.File(dir.resolve(b).toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head)
    f1.setLastModified(1000000L); f2.setLastModified(2000000L)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val got = scala.collection.mutable.Set.empty[Long]
    var batches = 0
    val q = graft.streaming.StreamOps.semanticDedupPerBatch(stream,
      centroids, "embedding", "vec_id", 0.35) { (survivors, _) =>
      got.synchronized {
        batches += 1
        got ++= survivors.select("vec_id").collect().map(_.getLong(0))
      }
    }
    try q.processAllAvailable() finally q.stop()
    assert(batches == 2, s"expected 2 micro-batches, saw $batches")
    assert(got.toSet == want, s"stream drain ${got.toSet} vs sequential $want")
    // the store carried: at least one batch-2 row must drop AGAINST a
    // batch-1 survivor (not just within batch 2) or the test is toothless
    val b2OnlyWant = Dedup.semanticIncrementalSurvivors(b2,
      IvfIndex.withCentroids(b2.limit(0), "embedding", centroids), "vec_id", 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val s2Set = s2.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(s2Set != b2OnlyWant,
      "fixture must exercise a cross-batch drop against the carried store")
  }

  test("nprobe = 1 multi-assignment pairs == single-assignment semanticPairs") {
    import graft.operators.IvfIndex
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = IvfIndex.build(emb, "embedding", nlist = 8)
    val single = Dedup.semanticPairs(idx, "vec_id", 0.35)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi1 = Dedup.semanticPairsMulti(emb, idx.centroidVectors,
        "embedding", "vec_id", 0.35, nprobe = 1)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(multi1 == single,
      "nprobe = 1 must be the single-assignment operator (same kernel tie rule)")
    assert(single.nonEmpty, "fixture must carry within-cell pairs")
  }

  test("nprobe recall ladder: pairs(1) subset pairs(2) subset exact pairs; a boundary pair is recovered") {
    import graft.operators.IvfIndex
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val idx = IvfIndex.build(emb, "embedding", nlist = 8)
    def pairSet(n: Int) = Dedup.semanticPairsMulti(emb, idx.centroidVectors,
        "embedding", "vec_id", 0.35, nprobe = n)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = pairSet(1); val p2 = pairSet(2)
    val exact = Dedup.embeddingPairs(emb, "embedding", "vec_id", 0.35)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p1.subsetOf(p2), s"nprobe widening must only ADD pairs; lost: ${p1 -- p2}")
    assert(p2.subsetOf(exact), s"multi-assign pairs must stay true pairs; extra: ${p2 -- exact}")
    assert(p2 != p1 || p1 == exact,
      "fixture must either recover a boundary pair at nprobe = 2 or already see all pairs")
  }

  test("streaming centroid screen: two-batch drain == batch operator; the keeper flag carries") {
    import graft.operators.IvfIndex
    val emb = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val cent = emb.agg(graft.functions.AvgVector.column(col("embedding")).as("c"))
      .head().getSeq[Double](0).map(_.toFloat).toArray
    val want = Dedup.semanticDedupByCentroid(emb,
        IvfIndex.withCentroids(emb, "embedding", Array(cent)), "vec_id", eps = 0.7)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_centroid_stream")
    val b1 = emb.where(col("vec_id") < 250)
    val b2 = emb.where(col("vec_id") >= 250)
    b1.coalesce(1).write.parquet(dir.resolve("b1").toString)
    b2.coalesce(1).write.parquet(dir.resolve("b2").toString)
    val Seq(f1, f2) = Seq("b1", "b2").map(b =>
      new java.io.File(dir.resolve(b).toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head)
    f1.setLastModified(1000000L); f2.setLastModified(2000000L)
    val stream = spark.readStream.schema(b1.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/*/")
    val got = scala.collection.mutable.Set.empty[Long]
    var batches = 0
    val q = graft.streaming.StreamOps.semanticDedupByCentroidPerBatch(stream,
      Array(cent), "embedding", "vec_id", eps = 0.7) { (s, _) =>
      got.synchronized {
        batches += 1
        got ++= s.select("vec_id").collect().map(_.getLong(0))
      }
    }
    try q.processAllAvailable() finally q.stop()
    assert(batches == 2, s"expected 2 micro-batches, saw $batches")
    assert(got.toSet == want,
      s"keeper-flag drain must equal the batch ball rule; diff: " +
        s"${(got.toSet -- want) ++ (want -- got.toSet)}")
    // the flag CARRIED: the ball spans both halves (the keeper lives
    // in batch 1, so some batch-2 ball member must have been dropped
    // against the carried flag, not a batch-2 keeper)
    val ballIds = emb
      .join(Seq(cent.toSeq).toDF("__c"), lit(true))
      .where(graft.functions.vectors.cosine_similarity(
        col("embedding"), col("__c")) >= lit(0.3))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(ballIds.exists(_ < 250) && ballIds.exists(_ >= 250),
      "fixture must place ball members in BOTH batches or the carry has no teeth")
  }

  test("centroid-screen: ball members collapse to min id, far rows and other cells survive") {
    import graft.operators.IvfIndex
    val dim = 8
    def at(deg: Double) = {
      val r = math.toRadians(deg)
      Seq.tabulate(dim)(i => if (i == 0) math.cos(r).toFloat
        else if (i == 1) math.sin(r).toFloat else 0f)
    }
    // two cells at 0 and 90 deg; eps = 0.1 => ball = cos >= 0.9 (~25.8 deg)
    val centroids = Array(at(0).toArray, at(90).toArray)
    val emb = Seq(
      (1L, at(2)),   // cell 0, in ball -> keeper (min id)
      (2L, at(-5)),  // cell 0, in ball -> drops to 1
      (3L, at(40)),  // cell 0 (just), cos 40 deg = 0.766 < 0.9 -> survives
      (4L, at(88)),  // cell 1, in its ball -> keeper (min id of cell 1)
      (5L, at(92))   // cell 1, in ball -> drops to 4
    ).toDF("vec_id", "embedding")
    val out = Dedup.semanticDedupByCentroid(emb,
        IvfIndex.withCentroids(emb, "embedding", centroids), "vec_id", eps = 0.1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 3L, 4L), s"got $out")
    // eps bounds refuse
    intercept[IllegalArgumentException](
      Dedup.semanticDedupByCentroid(emb,
        IvfIndex.withCentroids(emb, "embedding", centroids), "vec_id", eps = 0.0))
  }

  test("hardNegatives: hand-traced picks, self and same-label and null-label excluded, fromPairs == exact on an exhaustive frame") {
    // two classes on a line: anchors pick the CLOSEST other-class row
    // first. Vector (x, 1−x)-ish so cosines order by |Δx|.
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), Some(0)),   // class 0
      (2L, Seq(0.9f, 0.1f), Some(0)),
      (3L, Seq(0.6f, 0.4f), Some(1)),   // class 1 — the hard negative for 1/2
      (4L, Seq(0.1f, 0.9f), Some(1)),   // easy negative
      (5L, Seq(0.95f, 0.05f), None)     // unlabeled: mines none, serves as none
    ).toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val got = SimJoin.hardNegatives(emb, "vec_id", "embedding", "label", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // anchors 1 and 2 (class 0) pick 3 (the nearest class-1 row, not 4,
    // and never the closer-but-unlabeled 5); anchors 3 and 4 pick 2 and
    // 3's nearest class-0... 3's nearest is 2, 4's nearest is 3? no —
    // 4's negatives are class-0 rows {1, 2}: 2 is nearer
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 2L, 4L -> 2L),
      s"hand-traced hard negatives diverge: $got")
    assert(!got.contains(5L), "unlabeled anchors mine nothing")
    // fromPairs over an EXHAUSTIVE candidate frame applies the same
    // rule — the scale composition's correctness contract
    val allPairs = SimJoin.thresholdSelfJoin(emb, "vec_id", "embedding",
      threshold = -1.0)
    val viaPairs = SimJoin.hardNegativesFromPairs(allPairs, emb, "vec_id",
        "label", k = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaPairs == got, s"fromPairs over all pairs must equal exact: $viaPairs")
    // k bound + determinism of the (sim desc, neg_id) order
    val k2 = SimJoin.hardNegatives(emb, "vec_id", "embedding", "label", k = 2)
      .groupBy("anchor_id").count().collect().map(_.getLong(1)).toSet
    assert(k2 == Set(2L), s"every labeled anchor has exactly 2 of 2 negatives: $k2")
    intercept[IllegalArgumentException](
      SimJoin.hardNegatives(emb, "vec_id", "embedding", "label", k = 0))
    intercept[IllegalArgumentException](
      SimJoin.hardNegativesFromPairs(allPairs, emb, "vec_id", "label", k = 0))
  }

  test("hardNegativesFromPairs: directed/duplicated pair frames never shrink the effective k (r16 ADVICE)") {
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), Some(0)),
      (2L, Seq(0.9f, 0.1f), Some(0)),
      (3L, Seq(0.6f, 0.4f), Some(1)),
      (4L, Seq(0.1f, 0.9f), Some(1)),
      (5L, Seq(0.95f, 0.05f), None)
    ).toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val undirected = SimJoin.thresholdSelfJoin(emb, "vec_id", "embedding",
      threshold = -1.0)
    // a frame already carrying BOTH directions of every pair, plus an
    // exact duplicate of the undirected half — each negative would
    // enter the per-anchor heap three times without the dedupe
    val messy = undirected
      .unionByName(undirected.select(col("id2").as("id1"),
        col("id1").as("id2"), col("similarity")))
      .unionByName(undirected)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("anchor_id"), col("neg_id"),
          round(col("similarity"), 9).as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = rows(SimJoin.hardNegativesFromPairs(undirected, emb, "vec_id",
      "label", k = 2))
    val got = rows(SimJoin.hardNegativesFromPairs(messy, emb, "vec_id",
      "label", k = 2))
    assert(got == want, s"messy input must mine the same negatives:\n$got\n$want")
    // k DISTINCT negatives per anchor — no anchor's list collapses to
    // duplicates of its single best negative
    got.groupBy(_._1).foreach { case (a, ns) =>
      assert(ns.map(_._2).size == ns.size, s"anchor $a mined duplicate neg_ids: $ns")
      assert(ns.size == 2, s"anchor $a lost effective k: $ns")
    }
  }

  test("minhashTuneBands: closed forms at the extremes, monotone trade, argmin matches brute force, weights steer it") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("bands")).collect().map(r => (r.getInt(0), r.getInt(1),
        r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getBoolean(6)))
    val t = rows(Dedup.minhashTuneBands(spark, numHashes = 128, threshold = 0.5))
    assert(t.map(_._1).toSeq == Seq(1, 2, 4, 8, 16, 32, 64, 128),
      "one row per divisor of 128")
    t.foreach { case (b, r, _, _, _, _, _) => assert(b * r == 128) }
    // extremes: b = 1 (AND of all 128 hashes) collides on s^128 ≈ 0 —
    // no false positives, catastrophic false negatives; b = 128 (r = 1,
    // the spark.ml hash-table shape) collides on 1 − (1−s)^128 ≈ 1 —
    // total candidate explosion, no false negatives
    val by = t.map(x => x._1 -> x).toMap
    assert(by(1)._4 == 0.0 && by(1)._5 > 0.4, s"b=1: ${by(1)}")
    assert(by(128)._5 == 0.0 && by(128)._4 > 0.4, s"b=128: ${by(128)}")
    // the S-curve trade is MONOTONE in b: fp_area non-decreasing,
    // fn_area non-increasing — the sizing dial turns one way
    t.sliding(2).foreach { case Array(a, c) =>
      assert(a._4 <= c._4 && a._5 >= c._5, s"monotone trade violated: $a vs $c")
    }
    // p at the threshold: hand closed form 1 − (1 − 0.5^4)^32 for the
    // deployed (32, 4) default — the scaladoc's "≈0.87 at J = t = 0.5"
    assert(by(32)._3 == math.rint((1.0 - math.pow(1.0 - math.pow(0.5, 4), 32)) * 1e6) / 1e6,
      s"p_at_threshold closed form: ${by(32)}")
    // exactly one best, and it is the brute-force cost argmin — which
    // at equal weights is the deployed default bands = 32
    assert(t.count(_._7) == 1)
    val argmin = t.minBy(x => (x._6, x._1))
    assert(argmin._7 && argmin._1 == 32,
      s"equal-weight argmin must be the deployed (32, 4): $argmin")
    // weights steer the pick: fearing data loss (fn × 100) pushes to
    // MORE bands (higher recall); fearing candidate cost (fp × 100)
    // pushes to fewer
    val fnShy = rows(Dedup.minhashTuneBands(spark, 128, 0.5, fnWeight = 100.0))
      .find(_._7).get._1
    val fpShy = rows(Dedup.minhashTuneBands(spark, 128, 0.5, fpWeight = 100.0))
      .find(_._7).get._1
    assert(fnShy > 32 && fpShy < 32, s"weights must steer: fn-shy $fnShy, fp-shy $fpShy")
    // the closed loop: at the defaults the auto variant provably picks
    // the production bands = 32 and returns minhashPairs' exact output
    val fixDocs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "completely different text about spark engines and shuffles")
    ).toDF("doc_id", "text")
    val auto = Dedup.minhashPairsAuto(fixDocs, "text", "doc_id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val manual = Dedup.minhashPairs(fixDocs, "text", "doc_id", threshold = 0.5,
        bands = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(auto == manual && auto == Set((1L, 2L)),
      s"auto banding must pick the argmin (32) and find the dup pair: $auto")
    // threshold = 1 is a CLOSED FORM, not an error (the
    // dedup_minhash_auto anchor): P(1) = 1 for every banding ⇒ fn mass
    // 0 everywhere, and the argmin is the cheapest candidate generator
    // bands = 1
    val t1 = rows(Dedup.minhashTuneBands(spark, numHashes = 128, threshold = 1.0))
    assert(t1.forall(_._5 == 0.0), s"fn must be 0 for every banding at t = 1: ${t1.toSeq}")
    val best1 = t1.find(_._7).get
    assert(best1._1 == 1, s"t = 1 argmin must be bands = 1: $best1")
    // refusals
    intercept[IllegalArgumentException](Dedup.minhashTuneBands(spark, 0))
    intercept[IllegalArgumentException](Dedup.minhashTuneBands(spark, 128, 1.001))
    intercept[IllegalArgumentException](
      Dedup.minhashTuneBands(spark, 128, 0.5, fpWeight = 0.0, fnWeight = 0.0))
    intercept[IllegalArgumentException](
      Dedup.minhashTuneBands(spark, 128, 0.5, steps = 5))
  }

  test("hardNegativesFromIndex: full probe + lossless + candidates = corpus equals the exact operator; pruned serving works") {
    import graft.operators.IvfPqIndex
    // the hand-traced hardNegatives fixture — integral ids, two
    // classes, one unlabeled row
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), Some(0)),
      (2L, Seq(0.9f, 0.1f), Some(0)),
      (3L, Seq(0.6f, 0.4f), Some(1)),
      (4L, Seq(0.1f, 0.9f), Some(1)),
      (5L, Seq(0.95f, 0.05f), None)
    ).toDF("vec_id", "embedding", "label")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val idx = IvfPqIndex.build(emb, "embedding", nlist = 2, m = 2, k = 65536)
    assert(idx.model.lossless)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("anchor_id"), col("neg_id"),
          round(col("similarity"), 6).as("s"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = rows(SimJoin.hardNegativesFromIndex(idx, emb, emb, "vec_id",
      "embedding", "label", k = 2, candidatesPerAnchor = 5, nprobe = 2))
    val want = rows(SimJoin.hardNegatives(emb, "vec_id", "embedding", "label",
      k = 2))
    assert(got == want,
      s"index mining at the composed degenerates must equal exact:\n$got\n$want")
    // a PRUNED serving config still mines (recall is the index's —
    // here both cells cover everything at nprobe = 1 per anchor side,
    // so each anchor mines from its own cell's candidates)
    val pruned = SimJoin.hardNegativesFromIndex(idx, emb, emb, "vec_id",
      "embedding", "label", k = 1, candidatesPerAnchor = 3, nprobe = 1)
    assert(pruned.count() >= 1)
    // refusals: k < 1, candidates < k
    intercept[IllegalArgumentException](
      SimJoin.hardNegativesFromIndex(idx, emb, emb, "vec_id", "embedding",
        "label", k = 0, candidatesPerAnchor = 5))
    intercept[IllegalArgumentException](
      SimJoin.hardNegativesFromIndex(idx, emb, emb, "vec_id", "embedding",
        "label", k = 3, candidatesPerAnchor = 2))
  }
}
