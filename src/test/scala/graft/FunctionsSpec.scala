package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Dedup, Similarity, TextAnalysis}

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def one(c: org.apache.spark.sql.Column, text: String): Any =
    Seq(text).toDF("text").select(c).collect().head.get(0)

  test("tokenCount: empty, blank, multi-space") {
    assert(one(TextAnalysis.tokenCount($"text"), "") == 0)
    assert(one(TextAnalysis.tokenCount($"text"), "   ") == 0)
    assert(one(TextAnalysis.tokenCount($"text"), "a  b\tc") == 3)
  }

  test("charClassCount + ratio") {
    assert(one(TextAnalysis.alphaCount($"text"), "ab1 c!") == 3)
    assert(one(TextAnalysis.digitCount($"text"), "ab12") == 2)
    assert(one(TextAnalysis.whitespaceCount($"text"), "a b\tc") == 2)
    // 4 alpha / 8 chars = 5000bp
    assert(one(TextAnalysis.alphaRatioBp($"text"), "abcd !!!") == 5000L)
  }

  test("repetitionSignals: hand-computed Gopher fractions, degenerate " +
    "docs, and tie-breaks") {
    val docs = Seq(
      // "the cat the cat sat": bigrams (the cat)x2,(cat the)x1,(cat sat)x1
      // top = "the cat" (6 chars x 2 = 12 covered) / 15 word chars
      // trigrams: all distinct -> dup3 = 0
      (1L, "the cat the cat sat"),
      // "a b a b a b a b": top bigram "a b" count 4, "b a" count 3 ->
      // top2 = 4*2*10000 div 8 = 10000; trigram "a b a" x3, "b a b" x3
      // -> dup3_cov = 3*3 + 3*3 = 18 -> 22500 div... 18*10000 div 8
      (2L, "a b a b a b a b"),
      (3L, "solo"),   // no bigrams: top2=0, null gram
      (4L, "  ")      // no words at all: absent from output
    ).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(!got.contains(4L))
    val d1 = got(1L)
    assert(d1.getAs[String]("top_bigram") == "the cat")
    assert(d1.getAs[Long]("top_bigram_n") == 2L)
    assert(d1.getAs[Long]("top2_bp") == 12L * 10000 / 15)
    assert(d1.getAs[Long]("dup3_bp") == 0L)
    val d2 = got(2L)
    assert(d2.getAs[String]("top_bigram") == "a b")
    assert(d2.getAs[Long]("top2_bp") == 10000L)
    assert(d2.getAs[Long]("dup3_bp") == 18L * 10000 / 8)
    val d3 = got(3L)
    assert(d3.getAs[Long]("top2_bp") == 0L && d3.getAs[Long]("dup3_bp") == 0L
      && d3.getAs[String]("top_bigram") == null)
    // tie-break: "x y x z" -> all bigrams count 1, lexicographic
    // smallest wins
    val tie = TextAnalysis.repetitionSignals(
      Seq((9L, "x y x z")).toDF("doc_id", "text")).collect().head
    assert(tie.getAs[String]("top_bigram") == "x y")
  }

  test("qualityVerdict: first failing rule wins; clean docs keep") {
    val docs = Seq(
      (1L, "short doc"),                                    // 2 words
      (2L, ("ok " * 4) + "1234 5678 9012 3456 7890 !!!! " * 3), // low alpha
      (3L, "spam " * 20),                                   // repetitive
      (4L, "a sensible document with plenty of distinct " +
        "alphabetic words to pass every single quality rule"),
      (5L, "   ")                                           // blank
    ).toDF("doc_id", "text")
    val v = graft.functions.TextAnalysis.qualityVerdict(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(4), if (r.isNullAt(5)) null else r.getString(5))))
      .toMap
    assert(v(1L) == ((false, "too_short")))
    assert(v(2L) == ((false, "low_alpha")))
    assert(v(3L) == ((false, "repetitive")))
    assert(v(4L) == ((true, null)))
    assert(v(5L) == ((false, "too_short")))
  }

  test("wordHits counts standalone tokens only") {
    assert(one(TextAnalysis.wordHits($"text", "the"),
      "the cat theory the end") == 2)
    assert(one(TextAnalysis.wordHits($"text", "the"), "theme theater") == 0)
  }

  test("repetition metrics: run-length fold counts the top word/bigram " +
    "without a shuffle; one-word docs get NULL bigram fraction; blank " +
    "docs report zero words like the kernel twin") {
    def metrics(text: String) = Seq(text).toDF("text")
      .select(TextAnalysis.repetitionMetrics($"text"): _*)
      .collect().head
    val m1 = metrics("a b a b a c")
    assert(m1.getLong(0) == 6 && m1.getLong(1) == 3)
    assert(m1.getDouble(2) == 0.5)      // "a" 3/6
    assert(m1.getDouble(3) == 0.4)      // "a b" 2/5
    val m2 = metrics("x x x x")
    assert(m2.getDouble(2) == 1.0 && m2.getDouble(3) == 1.0)
    val m3 = metrics("solo")
    assert(m3.getLong(0) == 1 && m3.isNullAt(3))
    val m4 = metrics("   ")
    assert(m4.getLong(0) == 0 && m4.isNullAt(2) && m4.isNullAt(3))
  }

  test("repetition census kernel equals the sort+run-length HOF twin on " +
    "real documents") {
    import org.apache.spark.sql.functions._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def m(cols: Seq[org.apache.spark.sql.Column]) = docs
      .select($"doc_id" +: cols: _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val fast = m(TextAnalysis.repetitionMetricsFast($"text"))
    val hof = m(TextAnalysis.repetitionMetrics($"text"))
    assert(fast == hof)
    assert(fast.nonEmpty)
  }

  test("maxSortedRunLength: empty array is 0, distinct elements 1") {
    import org.apache.spark.sql.functions._
    val r = Seq(Seq("a", "a", "b"), Seq("a", "b", "c"), Seq.empty[String])
      .toDF("arr")
      .select(TextAnalysis.maxSortedRunLength(sort_array($"arr")).as("m"))
      .collect().map(_.getInt(0)).toSeq
    assert(r == Seq(2, 1, 0))
  }

  test("stratified hash sampling: deterministic across runs, rates " +
    "approximately honored, bucket is engine-portable md5 math") {
    import org.apache.spark.sql.functions._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def sample() = TextAnalysis.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 40), defaultRate = 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s1 = sample()
    assert(s1 == sample()) // same keys every run — no RNG
    val en = docs.filter($"lang" === "en").count().toDouble
    val enKept = docs.filter($"lang" === "en")
      .filter(TextAnalysis.hashBucket($"doc_id") < 40).count()
    assert(math.abs(enKept / en - 0.4) < 0.15, s"$enKept of $en")
    val other = docs.filter($"lang" =!= "en").count()
    val otherKept = s1.size - enKept
    assert(otherKept == other) // default rate 100 keeps everything
  }

  test("fingerprint is md5 hex") {
    assert(one(TextAnalysis.fingerprint($"text"), "abc")
      == "900150983cd24fb0d6963f7d28e17f72")
  }

  test("char-class census kernel matches the regex strip-and-diff " +
    "formulation on real documents + unicode edges") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
      .select($"text")
      .union(Seq("", "   ", "a1 \t\nB!", "héllo wörld 42",
        "\f\r tabs", "é combining", "😀 emoji")
        .toDF("text"))
    val slow = docs.select(length($"text"),
        TextAnalysis.alphaCount($"text"), TextAnalysis.digitCount($"text"),
        TextAnalysis.whitespaceCount($"text"),
        TextAnalysis.alphaRatioBp($"text"))
      .collect().map(_.toSeq).toSeq
    val cc = TextAnalysis.charClassCountsFast($"text")
    val bp = when(cc.getItem(0) === 0, lit(0L))
      .otherwise(floor(cc.getItem(1) * lit(10000.0) / cc.getItem(0)))
      .cast("long")
    val fast = docs.select(cc.getItem(0), cc.getItem(1), cc.getItem(2),
        cc.getItem(3), bp)
      .collect().map(_.toSeq).toSeq
    assert(fast == slow)
  }

  test("fused stopword kernel matches the replace-diff formulation on " +
    "real documents (all profiles + classify)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
    val profiles = TextAnalysis.stopwordProfiles
    val slow = docs.select(Seq($"doc_id") ++
        profiles.map { case (l, ws) =>
          TextAnalysis.stopwordHits($"text", ws).as(s"h_$l") } :+
        TextAnalysis.classifyLang($"text").as("pred"): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val fast = docs.select(Seq($"doc_id") ++
        profiles.zipWithIndex.map { case ((l, _), i) =>
          TextAnalysis.profileHitsFast($"text", profiles.map(_._2))
            .getItem(i).as(s"h_$l") } :+
        TextAnalysis.classifyLangFast($"text").as("pred"): _*)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(fast == slow)
    // adjacent-token edge: " a a " counts once under replace-diff
    assert(one(TextAnalysis.stopwordHitsFast($"text", Seq("a")), "a a") ==
      one(TextAnalysis.stopwordHits($"text", Seq("a")), "a a"))
  }
}

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river edge"),
    (3L, "completely different text about spark query engines and shuffles"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank")
  ).toDF("doc_id", "text")

  test("exactByText keeps lowest id and counts copies") {
    val m = Dedup.exactByText(docs).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    assert(m(1L) == 2L) // docs 1 and 4 identical
    assert(m(2L) == 1L && m(3L) == 1L)
  }

  test("snapshotDiff classifies added/removed/modified/unchanged by " +
    "content fingerprint") {
    val oldSnap = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val newSnap = Seq(
      (2L, "beta"), (3L, "gamma v2"), (4L, "delta")).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(oldSnap, newSnap).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "modified", 4L -> "added"))
    // empty sides degrade cleanly
    val empty = oldSnap.limit(0)
    assert(Dedup.snapshotDiff(empty, newSnap).collect()
      .forall(_.getString(1) == "added"))
    assert(Dedup.snapshotDiff(oldSnap, empty).collect()
      .forall(_.getString(1) == "removed"))
  }

  test("dsirImportance scores target-distribution docs above the rest " +
    "and counts features exactly") {
    val corpus = graft.sources.Tables.load(TestSpark.spark,
      "/root/testdata/sf0.001", "documents")
    val imp = graft.functions.TextAnalysis.dsirImportance(
      corpus, col("lang") === "en")
    val scored = corpus.select(col("doc_id"), col("lang"), col("text"))
      .join(imp, Seq("doc_id")).collect()
    // selection pressure: the mean importance of target-language docs
    // must exceed the mean of the rest (that is DSIR's whole point)
    val (en, rest) = scored.partition(_.getString(1) == "en")
    assert(en.nonEmpty && rest.nonEmpty)
    def mean(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.getLong(4)).sum.toDouble / rows.length
    assert(mean(en) > mean(rest),
      s"en mean ${mean(en)} should exceed rest mean ${mean(rest)}")
    // n_feat is the doc's exact whitespace token count
    scored.foreach { r =>
      val want = r.getString(2).trim.split("\\s+").count(_.nonEmpty)
      assert(r.getLong(3) == want, s"doc ${r.getLong(0)}")
    }
  }

  test("shingles produce distinct n-grams") {
    val sh = Seq("a b c d").toDF("text")
      .select(Dedup.shingles($"text", 2)).collect()
      .head.getSeq[String](0)
    assert(sh.toSet == Set("a b", "b c", "c d"))
  }

  test("minhash signatures equal for identical docs, near-equal for near-dups") {
    val sig = docs.select($"doc_id",
        Dedup.minhashSignature(Dedup.shingles($"text", 3), 32).as("sig"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[Long](1)).toMap
    assert(sig(1L) == sig(4L))
    val agree12 = sig(1L).zip(sig(2L)).count { case (a, b) => a == b }
    val agree13 = sig(1L).zip(sig(3L)).count { case (a, b) => a == b }
    assert(agree12 > agree13)
  }

  test("nearDuplicates finds the planted pair and the exact dup") {
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text",
        shingleN = 3, bands = 8, rowsPerBand = 4, minJaccard = 0.5,
        exactFirst = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))   // identical
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near-dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("nearDuplicates default collapses exact copies to a representative") {
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text",
        shingleN = 3, bands = 8, rowsPerBand = 4, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!pairs.contains((1L, 4L))) // 4 collapsed into representative 1
    assert(pairs.contains((1L, 2L))) // near-dup still found
  }

  test("fused shingle/minhash kernels equal the composable formulation") {
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    val viaHof = real.select($"doc_id",
        Dedup.shingles($"text", 3).as("sh"))
      .withColumn("hs", org.apache.spark.sql.functions.transform(
        $"sh", s => Dedup.md5Hash64(s)))
      .withColumn("sig", Dedup.minhashSignatureMd5($"hs", 16))
      .select($"doc_id", $"hs", $"sig").collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](1).toSet, r.getSeq[Long](2).toSeq)).toMap
    val viaFast = real.select($"doc_id",
        Dedup.shingleHashesFast($"text", 3).as("hs"),
        Dedup.minhashSignatureFast($"text", 3, 16).as("sig"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Long](1).toSet, r.getSeq[Long](2).toSeq)).toMap
    assert(viaFast == viaHof)
  }

  test("simhash: identical docs equal; near-dups closer than unrelated") {
    val sh = Dedup.simhash64(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)))
  }

  test("content-defined chunks: identical docs identical; shared suffix " +
    "shares chunk fingerprints despite a different prefix") {
    val y = (1 to 60).map(i => s"common$i word$i stays the same").mkString(" ")
    val rows = Seq(
      (1L, "aaa bbb ccc " + y),
      (2L, "completely different lead-in text that changes offsets " + y),
      (3L, "aaa bbb ccc " + y)
    ).toDF("doc_id", "text")
    val chunks = rows.select($"doc_id",
        Dedup.contentChunks($"text").as("ch")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(chunks(1L) == chunks(3L)) // identical content
    val shared = chunks(1L) intersect chunks(2L)
    // content-defined boundaries realign after the edit: the shared tail
    // must contribute common fingerprints even though byte offsets differ
    assert(shared.nonEmpty, s"no shared chunks: ${chunks(1L).size} vs ${chunks(2L).size}")
    assert(chunks(1L) != chunks(2L)) // the differing prefixes do differ
  }

  test("fixed-chunk FNV: known FNV-1a vectors; shares the fnv kernel with " +
    "content-defined chunking on boundary-free docs") {
    // published FNV-1a test vectors pin the kernel to the real algorithm
    val known = Seq((10L, "a"), (11L, ""), (12L, "foobar"))
      .toDF("doc_id", "text")
      .select($"doc_id", Dedup.fixedChunks($"text", 64).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(known(10L) == Seq(0xaf63dc4c8601ec8cL))
    assert(known(11L).isEmpty) // empty doc → no chunks
    assert(known(12L) == Seq(0x85944171f73967e8L))
    // a doc whose rolling hash never hits a boundary is ONE content-defined
    // chunk = FNV of the whole doc = the single fixed chunk at
    // chunkSize >= length: ties both expressions to the identical kernel
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val both = docs.select($"doc_id",
        Dedup.contentChunks($"text").as("cd"),
        Dedup.fixedChunks($"text", 100000).as("fx"),
        length($"text").as("len"))
      .collect()
    val oneChunk = both.filter(_.getSeq[Long](1).size == 1)
    assert(oneChunk.nonEmpty, "fixture has no boundary-free doc")
    oneChunk.foreach { r =>
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"kernel mismatch for doc ${r.getLong(0)}")
    }
  }

  test("group minhash aggregate: partition-invariant, equals elementwise " +
    "min of per-doc signatures") {
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(200)
      .select($"lang", Dedup.shingleHashesFast($"text", 3).as("hs"))
      .filter(size($"hs") > 0)
    def agg(parts: Int): Map[String, Seq[Long]] = real.repartition(parts)
      .groupBy("lang").agg(Dedup.minhashAgg($"hs", 16).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
    val one = agg(1)
    assert(agg(13) == one) // merge path ≡ single-buffer path
    // group signature = elementwise min of the member signatures
    val perDoc = real
      .select($"lang", Dedup.minhashSignatureMd5($"hs", 16).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq)
      .groupBy(_._1).map { case (l, sigs) =>
        l -> sigs.map(_._2).toSeq.transpose.map(_.min)
      }
    assert(one == perDoc)
  }

  test("group minhash aggregate: NULL for groups with no hash elements " +
    "(all-null or empty-array inputs), through both agg paths") {
    val mixed = Seq(
      ("a", Seq(7L, 9L)), ("a", Seq.empty[Long]),
      ("b", Seq.empty[Long]),               // only empty arrays → NULL
      ("c", Seq(3L))
    ).toDF("g", "hs")
      // null row for group "d" (null array input → NULL)
      .unionByName(Seq("d").toDF("g")
        .withColumn("hs", lit(null).cast("array<bigint>")))
    for (parts <- Seq(1, 5)) {
      val out = mixed.repartition(parts).groupBy("g")
        .agg(Dedup.minhashAgg($"hs", 4).as("sig"))
        .collect().map(r => r.getString(0) ->
          (if (r.isNullAt(1)) None else Some(r.getSeq[Long](1).toSeq))).toMap
      assert(out("b").isEmpty && out("d").isEmpty, out)
      assert(out("a").nonEmpty && out("c").nonEmpty, out)
      assert(out("a").get.length == 4)
    }
  }

  test("sorted_intersect_count rejects non-array arguments at analysis " +
    "time") {
    GraftSession.registerFunctions(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT sorted_intersect_count('abc', array(1L))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("type"))
  }

  test("connected components: chains, separate components, and " +
    "convergence beyond one propagation round") {
    // component {1..7} is a CHAIN (diameter 6 → needs multiple rounds);
    // {10,11,12} is a triangle; {20,21} a lone pair
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 7L).forall(comp(_) == 1L), comp)
    assert(Seq(10L, 11L, 12L).forall(comp(_) == 10L), comp)
    assert(comp(20L) == 20L && comp(21L) == 20L)
    assert(comp.size == 12)
  }

  test("applyClusterBatch ≡ full rebuild: a batch doc bridging two " +
    "standing components merges them to the global min; untouched " +
    "components keep labels; batch-only and first-pair-old docs attach") {
    // standing components over old-old pairs: {1,2}, {5,6}, {8,9}
    val oldPairs = Seq((1L, 2L), (5L, 6L), (8L, 9L)).toDF("id_a", "id_b")
    val standing = Dedup.connectedComponents(oldPairs,
      assumeDistinctPairs = true)
    // batch doc 10 bridges {1,2} and {5,6} (transitive merge through a
    // new node); 11-12 form a batch-only component; {8,9} untouched;
    // 13 pairs with old doc 3 whose first-ever pair arrives now
    val newPairs = Seq((2L, 10L), (5L, 10L), (11L, 12L), (3L, 13L))
      .toDF("id_a", "id_b")
    val got = Dedup.applyClusterBatch(standing, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Dedup.connectedComponents(
        oldPairs.unionByName(newPairs), assumeDistinctPairs = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(Seq(1L, 2L, 5L, 6L, 10L).forall(got(_) == 1L), got)
    assert(got(8L) == 8L && got(9L) == 8L)
    assert(got(11L) == 11L && got(12L) == 11L)
    assert(got(3L) == 3L && got(13L) == 3L)
  }

  test("dedupCorpus keeps one representative per near-dup cluster plus " +
    "every unclustered doc") {
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    val kept = Dedup.dedupCorpus(real, "doc_id", "text",
      minJaccardBp = 2000)
    val clusters = Dedup.connectedComponents(
      Dedup.nearDuplicatesPortable(real, "doc_id", "text",
        minJaccardBp = 2000))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val all = real.select("doc_id").collect().map(_.getLong(0)).toSet
    // dropped = exactly the non-representative members
    val expectedDropped = clusters.filter { case (id, comp) => id != comp }
      .keySet
    assert(all -- keptIds == expectedDropped)
    assert(expectedDropped.nonEmpty) // the corpus does contain near-dups
  }

  test("connected components: pointer jumping closes a 100-node chain " +
    "within the default round budget (plain propagation would need " +
    "~50 rounds)") {
    val chain = (1L until 100L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(chain) // default maxIters = 25
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 100)
    assert(comp.values.forall(_ == 1L), comp.filter(_._2 != 1L))
  }

  test("portable md5 simhash: identical docs equal, near-dups closer, " +
    "60-bit range") {
    val sh = Dedup.simhash60Md5(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sh(1L), sh(2L)) < ham(sh(1L), sh(3L)))
    assert(sh.values.forall(v => v >= 0 && v < (1L << 60)))
  }

  test("native simhash kernel is bit-equal to the explode+groupBy plan") {
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val viaAgg = Dedup.simhash64(real, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaFast = real.select($"doc_id",
        Dedup.simhash64Fast($"text").as("simhash")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaFast == viaAgg)
  }

  test("fused md5 simhash kernel is bit-equal to the explode+groupBy plan") {
    val real = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    val viaAgg = Dedup.simhash60Md5(real, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaFast = real
      .filter(length(trim($"text")) > 0)
      .select($"doc_id", Dedup.simhash60Md5Fast($"text").as("simhash"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaFast == viaAgg)
  }

  test("incremental near-dup against a standing index equals the full " +
    "corpus pipeline restricted to batch-touching pairs (incl. planted " +
    "new-old and new-new exact dups)") {
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    // plant: 1007 and 2007 (both % 10 == 7 -> "new") copy doc 3's text,
    // so the batch must flag 1007~3 (new-old), 2007~3 (new-old) and
    // 2007~1007 (new-new, keep-first orientation)
    val copy = base.filter($"doc_id" === 3)
    val corpus = base
      .unionByName(copy.select(lit(1007L).as("doc_id"), $"text"))
      .unionByName(copy.select(lit(2007L).as("doc_id"), $"text"))
    val isNew = $"doc_id" % 10 === 7
    val inc = Dedup.incrementalNearDups(
      corpus.filter(isNew),
      Dedup.nearDupBandRows(corpus.filter(!isNew), "doc_id", "text"),
      Dedup.shingleSets(corpus.filter(!isNew), "doc_id", "text"),
      "doc_id", "text", minJaccardBp = 2000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val full = Dedup.nearDuplicatesPortable(corpus, "doc_id", "text",
      minJaccardBp = 2000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = full.flatMap { case (a, b, j) =>
      if (b % 10 == 7) Some((b, a, j))       // b new (covers both-new: b>a)
      else if (a % 10 == 7) Some((a, b, j))  // a new, b old
      else None                              // old-old: not the batch's job
    }.toSet
    assert(inc == expected)
    assert(inc.contains((1007L, 3L, 10000L)))
    assert(inc.contains((2007L, 3L, 10000L)))
    assert(inc.contains((2007L, 1007L, 10000L)))
  }

  test("contamination: distinct-shingle overlap vs the eval set; short " +
    "docs have zero shingles and are clean") {
    val corpus = Seq(
      (1L, "a b c d e"),   // shingles: abc bcd cde; eval has abc bcd
      (2L, "x y z w"),     // disjoint from eval
      (3L, "a b")          // < 3 tokens: no shingles
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val out = Dedup.contamination(corpus, eval)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out(1L) == ((3L, 2L, true)))
    assert(out(2L) == ((2L, 0L, false)))
    assert(out(3L) == ((0L, 0L, false)))
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.9f, 0.1f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("cosine: identical = 1, orthogonal = 0") {
    val pairs = Similarity.cosinePairs(emb, emb.filter($"vec_id" === 0),
        threshold = -1.0)
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("sim"))
      .toMap
    assert(pairs(1L) == 1.0)
    assert(pairs(2L) == 0.0)
    assert(pairs(3L) > 0.99 && pairs(3L) < 1.0)
  }

  test("bruteForceTopK ranks by similarity desc") {
    val top = Similarity.bruteForceTopK(emb, emb.filter($"vec_id" === 0), 2)
      .collect().sortBy(_.getAs[Int]("rank"))
      .map(_.getAs[Long]("vec_id")).toSeq
    assert(top == Seq(1L, 3L))
  }

  test("lshNeighbors finds identical vectors in the same bucket") {
    val pairs = Similarity.lshNeighbors(emb, planes = 8, dim = 3,
        threshold = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("ivfAssign: every vector lands in exactly one cell; identical " +
    "vectors share cells; ivfTopK finds the twin") {
    val assigned = Similarity.ivfAssign(emb, k = 2).collect()
    assert(assigned.length == 4)
    val cells = assigned.map(r => r.getAs[Long]("vec_id")
      -> r.getAs[Long]("cell")).toMap
    assert(cells(0L) == cells(1L)) // identical vectors, same cell
    val top = Similarity.ivfTopK(emb, emb.filter($"vec_id" === 0),
        cells = 2, k = 2).collect()
    assert(top.exists(r => r.getAs[Long]("vec_id") == 1L
      && r.getAs[Double]("sim") == 1.0))
    assert(top.forall(r => r.getAs[Long]("cell") == cells(0L)))
  }

  test("native dot kernel is bit-identical to the zip_with+fold on real " +
    "embeddings (incl. float widening)") {
    import org.apache.spark.sql.functions._
    val real = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    val plane = array((0 until 64).map(d =>
      lit(Similarity.hyperplaneCoeff(1, d))): _*)
    val both = real.select(
      Similarity.dotFast(Similarity.asDouble($"embedding"), plane).as("fast"),
      Similarity.dot(Similarity.asDouble($"embedding"), plane).as("hof"),
      Similarity.dotFast($"embedding", $"embedding").as("fastf"),
      Similarity.dot(Similarity.asDouble($"embedding"),
        Similarity.asDouble($"embedding")).as("hoff"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(3)))
    }
  }

  test("ivf recall against brute force on real embeddings") {
    val spark2 = spark
    val real = spark2.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = real.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(real, queries, 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = Similarity.ivfTopK(real, queries, cells = 4, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    // nprobe=1 coarse search: sane shape + non-trivial overlap with exact
    assert(ivf.nonEmpty && ivf.size <= 30)
    assert((ivf intersect exact).nonEmpty)

    // multi-probe recall DOMINATES single-probe: probing 2 cells can only
    // widen each query's candidate set
    val probed = Similarity.ivfTopKProbed(real, queries, cells = 4,
        k = 10, nprobe = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    assert((probed intersect exact).size >= (ivf intersect exact).size,
      s"nprobe=2 recall ${(probed intersect exact).size} < " +
        s"nprobe=1 ${(ivf intersect exact).size}")
    // nprobe = all cells ≡ brute force (the probe union covers the corpus)
    val full = Similarity.ivfTopKProbed(real, queries, cells = 4,
        k = 10, nprobe = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    assert(full == exact, s"full-probe should equal brute force")
  }

  test("duplicatedSpans: every position counts, shared span flagged in " +
    "both holders, span-free docs drop out") {
    val docs = Seq(
      (1L, "a b c d e f g h x"),   // spans [a..h], [b..x] — 1st shared
      (2L, "z a b c d e f g h"),   // spans [z..g], [a..h] — 2nd shared
      (3L, "q r s t u v w x y"),   // 2 spans, none shared
      (4L, "too short")            // < 8 tokens → no spans, no row
    ).toDF("doc_id", "text")
    val got = graft.functions.Dedup.duplicatedSpans(docs, n = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((2L, 1L, 5000L)),
      2L -> ((2L, 1L, 5000L)),
      3L -> ((2L, 0L, 0L))))
  }

  test("quantizeInt8: half-up codes, exact nano-unit error, zero-vector " +
    "degenerate") {
    val vecs = Seq(
      (1L, Array(1.0f, -0.5f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = graft.functions.Similarity.quantizeInt8(vecs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getLong(3)))).toMap
    // amax=1: codes 127, floor(-63.5+0.5)=-63, 0; err = only the middle
    // element: floor(|−0.5 − (−63/127)|·1e9)
    val err = math.floor(math.abs(-0.5 - (-63.0 * 1.0 / 127.0)) * 1e9).toLong
    assert(got(1L) == ((1000000L, "127,-63,0", err)))
    assert(got(2L) == ((0L, "0,0,0", 0L)))
  }

  test("quantizedTopK: int8-code search recovers nearly all float " +
    "brute-force neighbours on the fixture (the trade q97's error " +
    "metric budgets)") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val quant = graft.functions.Similarity.quantizedTopK(emb, queries,
        k = 10)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }
    val exact = graft.functions.Similarity.bruteForceTopK(emb, queries,
        k = 10)
      .select("query_id", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) =>
        q -> rs.map(_.getLong(1)).toSet }
    val hits = exact.map { case (q, truth) =>
      (quant.getOrElse(q, Set.empty) intersect truth).size }.sum
    val recall = hits.toDouble / exact.map(_._2.size).sum
    assert(recall >= 0.9, f"int8 recall $recall%.3f below 0.9")
  }

  test("hashFeatures: csv vector has dim entries summing to the token " +
    "count, buckets match the portable md5 formula") {
    val docs = Seq((1L, "a b a c"), (2L, " "), (3L, "b")).toDF("doc_id", "text")
    val dim = 8
    val got = graft.functions.TextAnalysis.hashFeatures(docs, dim)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2)))).toMap
    assert(got.keySet == Set(1L, 3L)) // blank doc drops out
    got.foreach { case (_, (n, csv)) =>
      val fs = csv.split(",").map(_.toLong)
      assert(fs.length == dim && fs.sum == n)
    }
    // independent bucket computation for each distinct token
    val buckets = Seq("a", "b", "c").map { w =>
      w -> spark.sql(
        s"SELECT pmod(cast(conv(substring(md5('$w'),1,8),16,10) as " +
          s"long), $dim)").collect().head.getLong(0)
    }.toMap
    val f1 = got(1L)._2.split(",").map(_.toLong)
    val want = Array.fill(dim)(0L)
    Seq("a", "b", "a", "c").foreach(w => want(buckets(w).toInt) += 1)
    assert(f1.toSeq == want.toSeq)
    assert(got(3L)._2.split(",").map(_.toLong)
      .apply(buckets("b").toInt) == 1L)
  }

  test("gopherGate: each rule trips on a targeted fixture") {
    import graft.functions.TextAnalysis
    val good = (("the that have with " * 13) + "solid prose words here")
    val d = Seq(
      1L -> good,                                   // passes everything
      2L -> "the be short",                         // < 50 words
      3L -> (good + " ## ### #### ##### ######"),   // symbol ratio
      4L -> ("xx " * 30 + good).replace("solid", "a…a"), // still passes
      5L -> "- one\n- two\n- three",                // all bullet lines
      6L -> ("9 9 9 " * 30 + "the be"),               // alpha fraction low
      7L -> "")                                     // zero words
    val df = d.toDF("doc_id", "text")
    val r = TextAnalysis.gopherGate(df).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getBoolean(8))
    assert(!r(2L).getBoolean(8) && r(2L).getLong(1) == 3L)
    assert(!r(3L).getBoolean(8) && r(3L).getLong(3) > 1000L)
    assert(r(4L).getBoolean(8))
    // bullet fixture: 3 lines, all bulleted → 10000 bp
    assert(r(5L).getLong(4) == 10000L && !r(5L).getBoolean(8))
    assert(!r(6L).getBoolean(8) && r(6L).getLong(6) < 8000L)
    assert(!r(7L).getBoolean(8) && r(7L).getLong(1) == 0L)
    // stop-word presence counts exact tokens, not substrings
    val sub = Seq(8L -> ("theory bandage " * 30 + "often words"))
      .toDF("doc_id", "text")
    val s8 = TextAnalysis.gopherGate(sub).collect().head
    assert(s8.getLong(7) == 0L && !s8.getBoolean(8))
  }
}
