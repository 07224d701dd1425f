package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.text.TextAnalysis
import graft.dedup.NearDup
import graft.sim.Similarity
import graft.streaming.Events

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  /** Several tests consume pair/cluster results that come back CACHED
    * (caller-unpersists contract) — sweep after every test so persisted
    * frames can't accumulate across the suite JVM. The hygiene test below
    * still sees its own persists: the sweep runs after each test body. */
  override def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    val before = graft.util.CacheHygiene.snapshot(spark)
    try super.withFixture(test)
    finally graft.util.CacheHygiene.releaseNew(spark, before)
  }

  test("token counts, ratios, fingerprint") {
    val df = Seq((1L, "Hello world!"), (2L, ""), (3L, "a  b   c")).toDF("id", "t")
    val out = df.select($"id",
      TextAnalysis.tokenCount($"t").as("n"),
      TextAnalysis.bpeTokenCount($"t").as("b"),
      TextAnalysis.fingerprint($"t").as("fp")).orderBy("id").collect()
    assert(out(0).getLong(1) == 2 && out(0).getLong(2) == 3) // hello, world, !
    assert(out(1).getLong(1) == 0)
    assert(out(2).getLong(1) == 3)
    // fingerprint is whitespace/case robust
    val fps = Seq((1L, "A  B"), (2L, "a b")).toDF("id", "t")
      .select(TextAnalysis.fingerprint($"t")).distinct()
    assert(fps.count() == 1)
  }

  test("repetition quality signals match hand-computed Gopher fractions") {
    import graft.text.QualityFilters
    // "a b a b c": words=5, distinct=3 -> dup_word_frac = 0.4
    // bigrams: "a b"x2 (cover 2*2=4), "b a"x1 (2), "b c"x1 (2); tc=5
    //   -> top_bigram = 4/5
    // trigrams: each x1, best cover 3 -> 3/5
    val r1 = QualityFilters.repetition("a b a b c")
    assert(r1.n_words == 5 && math.abs(r1.dup_word_frac - 0.4) < 1e-9)
    assert(math.abs(r1.top_bigram_char_frac - 0.8) < 1e-9)
    assert(math.abs(r1.top_trigram_char_frac - 0.6) < 1e-9)
    assert(r1.dup_fivegram_char_frac == 0.0)
    // repeated 5-gram: "x y z w v" twice = all 10 words in dup 5-grams
    // 5-grams: positions 1..6; the exact repeat is pos1 & pos6 (cover
    // 2*5=10 of tc=10); the 4 bridging grams are unique
    val r2 = QualityFilters.repetition("x y z w v x y z w v")
    assert(math.abs(r2.dup_fivegram_char_frac - 1.0) < 1e-9)
    // degenerate inputs: empty, null-ish, single word
    assert(QualityFilters.repetition("").n_words == 0)
    assert(QualityFilters.repetition(null).n_words == 0)
    val r3 = QualityFilters.repetition("word")
    assert(r3.n_words == 1 && r3.top_bigram_char_frac == 0.0)
    // the filter keeps clean docs and drops the spammy one. Gopher
    // thresholds assume document-length text — a short clean doc has one
    // bigram covering >18 % of its chars by arithmetic alone, so the
    // clean fixture needs realistic length (60 distinct words)
    val clean = (0 until 60).map(i => s"word$i").mkString(" ")
    val df = Seq((1L, clean),
      (2L, "spam spam spam spam spam spam spam spam")).toDF("id", "t")
    val kept = QualityFilters.gopherRepetitionFilter(df, "t")
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(1L))
  }

  test("bigram LM scores hand-computed smoothed probabilities") {
    import graft.text.BigramLm
    // reference "a b a b": uni a->2 b->2, V=2; bigrams (a,b)->2 (b,a)->1
    val ref = Seq((0L, "a b a b")).toDF("id", "t")
    val fit = BigramLm.fit(ref, "t")
    assert(fit.vocabSize == 2)
    // doc "a b": one bigram, P = (2+.5)/(2+.5*2) = 2.5/3 -> -log2 = .263034
    // doc "a c": unseen bigram w/ seen w1: P = .5/3
    // doc "z z": unseen w1: P = .5/(0+1) = .5 -> 1 bit
    // doc "a":   no bigram -> null score, n=0
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "z z"), (4L, "a"))
      .toDF("id", "t")
    val got = BigramLm.scoreBits(docs, fit, "t", "id")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    def b(p: Double) = math.round(-math.log(p) / math.log(2) * 1e6) / 1e6
    assert(got == Seq(
      (1L, 1L, Some(b(2.5 / 3))),
      (2L, 1L, Some(b(0.5 / 3))),
      (3L, 1L, Some(1.0)),
      (4L, 0L, None)))
    // the filter keeps only fluent-scoring docs and drops no-evidence ones
    val kept = BigramLm.filterByBits(docs, fit, "t", "id", maxBits = 1.5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("PII redaction replaces emails, IPs, phones with tokens in order") {
    import graft.text.Redact
    val df = Seq(
      (1L, "mail bob.jones+x@sub.example.org or 10.0.0.1 or +4915123456789"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.co c@d.io and 255.255.255.255")).toDF("id", "t")
    val out = df.select($"id", Redact.redactPii($"t").as("t"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(out(0) == "mail [EMAIL] or [IP] or [PHONE]")
    assert(out(1) == "no pii here at all")
    assert(out(2) == "two mails [EMAIL] [EMAIL] and [IP]")
  }

  test("phone redaction requires 9+ actual digits — dates and versions survive") {
    import graft.text.Redact
    val df = Seq(
      (1L, "released 2026-08-13 as version 1.2.3.4567"), // 8 and 7 digits
      (2L, "range 100-200 or (12)34-56.78"),             // short digit runs
      (3L, "call (415) 555-0173 x9"),                    // 10 digits, ") " gap
      (4L, "id 123456789 done"),                         // bare 9-digit run
      (5L, "dial +1 415 555 0173 now")                   // 11 digits, spaced
    ).toDF("id", "t")
    val out = df.select($"id", Redact.redactPii($"t").as("t"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(out(0) == "released 2026-08-13 as version 1.2.3.4567")
    assert(out(1) == "range 100-200 or (12)34-56.78")
    assert(out(2) == "call [PHONE] x9")
    assert(out(3) == "id [PHONE] done")
    assert(out(4) == "dial [PHONE] now")
  }

  test("line dedup strips boilerplate, keeps order, blanks, empty docs") {
    import graft.text.LineDedup
    val df = Seq(
      (1L, "unique one\nfooter\nunique two"),
      (2L, "footer\n\nmiddle line"),   // blank line survives uncounted
      (3L, "footer"),                  // all-boilerplate -> empty string
      (4L, "footer\nfooter\nown text") // within-doc repeat counts once
    ).toDF("id", "t")
    val out = LineDedup.dropBoilerplate(df, "t", "id", minDocFreq = 4)
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(
      1L -> "unique one\nunique two",
      2L -> "\nmiddle line",
      3L -> "",
      4L -> "own text"))
    val freqs = LineDedup.lineDocFrequencies(df, "t", "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(freqs("footer") == 4L && freqs("unique one") == 1L)
    assert(!freqs.contains(""), "blank lines must not be counted")
  }

  test("decontamination flags n-gram overlap with the benchmark set") {
    import graft.text.Decontaminate
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("id", "t")
    val corpus = Seq(
      (1L, "prefix alpha beta gamma delta epsilon suffix"), // shares a 5-gram
      (2L, "alpha beta gamma unrelated delta epsilon zeta"), // longest run 3
      (3L, "totally different words with no overlap at all"),
      (4L, "tiny")).toDF("id", "t")
    val flags = Decontaminate.flagContaminated(corpus, bench, "t", "id", n = 5)
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(flags == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false))
    val kept = Decontaminate.removeContaminated(corpus, bench, "t", "id", n = 5)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L, 4L))
    // sub-n documents produce no grams (the sequence guard: Spark's
    // sequence(1, 0) counts DOWN instead of returning empty)
    val grams = corpus.select(Decontaminate.wordNgrams($"t", 5).as("g"))
      .collect().map(_.getSeq[String](0).length).toSeq
    assert(grams == Seq(3, 3, 4, 0))
  }

  test("bloom decontamination equals the exact path bit-for-bit and " +
      "prunes scan-side (r15)") {
    import graft.text.Decontaminate
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id".as("id"), $"text".as("t"))
    val bench = docs.where($"id" % 10 === 0)
    val corpus = docs.where($"id" % 10 =!= 0)
      .unionAll(bench.select(($"id" + 100000).as("id"),
        regexp_replace($"t", "^\\S+\\s+", "").as("t")))
    val before = graft.util.CacheHygiene.snapshot(spark)
    try {
      val exact = Decontaminate
        .flagContaminated(corpus, bench, "t", "id", n = 6)
        .orderBy("id").collect().toSeq
      val bloom = Decontaminate
        .flagContaminatedBloom(corpus, bench, "t", "id", n = 6)
        .orderBy("id").collect().toSeq
      assert(exact.nonEmpty && bloom == exact,
        "the bloom prefilter must never change the flag set")
      // the plan carries the probe kernel BELOW the verify join
      // (scan-side pruning, not post-join decoration), and as the
      // r16 codegen expression — no ScalaUDF wrapper left
      val p = Decontaminate
        .flagContaminatedBloom(corpus, bench, "t", "id", n = 6)
        .queryExecution.executedPlan.toString
      assert(!p.contains("ScalaUDF"), p)
      val probeAt = p.indexOf("graft_bloom_contains")
      val joinAt = p.indexOf("Join")
      assert(probeAt >= 0 && joinAt >= 0 && probeAt > joinAt,
        s"bloom probe must sit under (print after) the verify join:\n$p")
    } finally graft.util.CacheHygiene.releaseNew(spark, before)
  }

  test("int8 quantization bounds reconstruction error at scale/2 and " +
      "handles degenerate vectors (r15)") {
    import graft.sim.Quantize
    val vecs = Seq(
      (1L, Array(0.1f, -2.5f, 3.75f, 0.0f)),
      (2L, Array(7.0f, 7.0f, 7.0f, 7.0f)),   // constant: scale 0
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f)),   // all-zero constant
      (4L, Array(-1e-6f, 1e-6f, 0.0f, 5e-7f))) // tiny range
      .toDF("vec_id", "embedding")
    val q = Quantize.quantizeInt8(vecs, "vec_id", "embedding")
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("ScalaUDF"),
      s"quantization is a pure projection:\n$p")
    val back = Quantize.dequantizeInt8(q, "vec_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val scales = q.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    vecs.collect().foreach { r =>
      val id = r.getLong(0)
      val orig = r.getSeq[Float](1)
      val rec = back(id)
      val bound = scales(id) / 2 + 1e-12
      orig.zip(rec).foreach { case (o, x) =>
        assert(math.abs(o.toDouble - x) <= bound,
          s"vec $id: |$o - $x| must be <= scale/2 = $bound")
      }
    }
    // constant vectors reconstruct exactly
    assert(back(2L).forall(_ == 7.0f.toDouble))
    assert(back(3L).forall(_ == 0.0))
    // codes span the full signed-byte range on a real spread
    val codes1 = q.where($"vec_id" === 1L)
      .select("codes").head().getSeq[Byte](0)
    assert(codes1.min == -128 && codes1.max == 127)
  }

  test("quantized ANN keeps high recall vs full-precision top-k (r15)") {
    import graft.sim.{Quantize, Similarity}
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val before = graft.util.CacheHygiene.snapshot(spark)
    try {
      val exact = Similarity
        .bruteForceTopK(e, e.where($"vec_id" < 5), 10)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val deq = Quantize.dequantizeInt8(
        Quantize.quantizeInt8(e, "vec_id", "embedding"), "vec_id")
      val quant = Similarity
        .bruteForceTopK(deq, deq.where($"vec_id" < 5), 10,
          vecCol = "vec")
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (exact & quant).size.toDouble / exact.size
      assert(recall >= 0.8,
        s"int8 reconstruction must preserve ranking: recall@10 = $recall")
    } finally graft.util.CacheHygiene.releaseNew(spark, before)
  }

  test("quantized IVF + exact refine keeps recall vs full-precision IVF " +
      "at nprobe < nlist, and the quantized fingerprint keys the index " +
      "(r16)") {
    import graft.sim.{Quantize, Similarity}
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val before = graft.util.CacheHygiene.snapshot(spark)
    val path = s"/tmp/graft_ivfq8_spec_${ProcessHandle.current().pid()}"
    try {
      // the scale path: nprobe < nlist on both sides, same cell budget
      val full = Similarity
        .ivfTopK(e, e.where($"vec_id" < 5), 10, nlist = 8, nprobe = 3)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val idx = Similarity.ivfIndexAtQuantized(e, path, nlist = 8)
      val quant = Similarity
        .ivfTopKQuantizedRefine(e, e.where($"vec_id" < 5), 10,
          nlist = 8, nprobe = 3, overfetch = 2, index = Some(idx))
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (full & quant).size.toDouble / full.size
      assert(recall >= 0.7,
        s"quantized cells + exact refine must track full-precision IVF: " +
          s"recall@10 = $recall")
      // persistent-index cycle: a second call with the same corpus
      // reuses the saved index (fingerprints match)...
      val idx2 = Similarity.ivfIndexAtQuantized(e, path, nlist = 8)
      assert(idx2.fingerprint == idx.fingerprint &&
        idx2.centers.map(_.toSeq).toSeq == idx.centers.map(_.toSeq).toSeq)
      // ...and the fingerprint keys on the QUANTIZED content: the same
      // ids with perturbed vectors produce different codes, so the key
      // must move even though the id set is identical
      val perturbed = e.select($"vec_id",
        transform($"embedding", x => x * 2.0f + 1.0f).as("embedding"))
      val q8a = Quantize.quantizeInt8(e, "vec_id", "embedding")
      val q8b = Quantize.quantizeInt8(perturbed, "vec_id", "embedding")
      assert(Similarity.quantizedFingerprint(q8a) !=
        Similarity.quantizedFingerprint(q8b),
        "re-embedding the same ids must move the quantized index key")
    } finally {
      graft.util.CacheHygiene.releaseNew(spark, before)
      val d = new java.io.File(path)
      if (d.exists()) {
        d.listFiles().foreach(_.delete()); d.delete()
      }
    }
  }

  test("language id votes on function words, CJK short-circuits") {
    val df = Seq(
      (1L, "the cat is on the mat and it was good"),
      (2L, "der hund ist nicht mit der katze und das haus"),
      (3L, "el perro es de la casa y los gatos en un jardin"),
      (4L, "le chien est dans le jardin avec les chats pour une heure"),
      (5L, "中文文本处理测试")).toDF("id", "t")
    val out = df.select($"id", TextAnalysis.langId($"t").as("l"))
      .orderBy("id").collect().map(_.getString(1)).toSeq
    assert(out == Seq("en", "de", "es", "fr", "zh"))
  }

  test("shingles + jaccard behave as set similarity") {
    val df = Seq((1L, "abcdefgh", "abcdefgh"), (2L, "abcdefgh", "zzzzzzzz"))
      .toDF("id", "a", "b")
    val out = df.select($"id", NearDup.jaccard(
      NearDup.shingles($"a"), NearDup.shingles($"b")).as("j"))
      .orderBy("id").collect()
    assert(out(0).getDouble(1) == 1.0)
    assert(out(1).getDouble(1) == 0.0)
  }

  test("minhash-lsh recovers planted near-duplicates") {
    val base = (0 until 30).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog number $i variant alpha beta gamma"))
    val mutated = base.map { case (i, t) => (i + 1000L, t.dropRight(6)) }
    val df = (base ++ mutated).toDF("id", "t")
    val pairs = NearDup.minhashPairs(df, "t", "id", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((0 until 30).forall(i => pairs.contains((i.toLong, i + 1000L))))
  }

  test("stratified sample is deterministic, rate-scaled, monotone") {
    import graft.ops.Sampling
    val df = (0 until 2000).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "fr")).toDF("id", "lang")
    def ids(rates: Map[String, Double]) =
      Sampling.stratifiedSample(df, "lang", "id", rates)
        .collect().map(_.getLong(0)).toSet
    val s1 = ids(Map("en" -> 0.5, "fr" -> 0.1))
    assert(s1 == ids(Map("en" -> 0.5, "fr" -> 0.1))) // deterministic
    val en = s1.count(_ % 2 == 0) // ~0.5 of 1000
    val fr = s1.count(_ % 2 == 1) // ~0.1 of 1000
    assert(en > 420 && en < 580, s"en kept $en of 1000 at rate 0.5")
    assert(fr > 60 && fr < 140, s"fr kept $fr of 1000 at rate 0.1")
    // raising rates only ADDS rows (same salt ⇒ nested thresholds)
    assert(s1.subsetOf(ids(Map("en" -> 0.8, "fr" -> 0.5))))
    // rate 1.0 keeps everything, 0.0 nothing
    assert(ids(Map("en" -> 1.0, "fr" -> 1.0)).size == 2000)
    assert(ids(Map("en" -> 0.0, "fr" -> 0.0)).isEmpty)
  }

  test("winnowing fingerprints share a value on any w+k-1 char overlap") {
    import graft.text.TextAnalysis
    val shared = "the exact same stolen sentence fragment" // >> w+k-1 = 8
    val df = Seq(
      (1L, s"totally original preamble $shared and an original ending"),
      (2L, s"different document here $shared with other words after"),
      (3L, "nothing in common with either of those two documents"),
      (4L, "tiny")  // under k+w-1 -> no fingerprint
    ).toDF("id", "t")
    val fps = df.select($"id",
        TextAnalysis.winnowingFingerprint($"t").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty,
      "docs sharing a long substring must share a fingerprint")
    assert((fps(1L) intersect fps(3L)).size < fps(1L).size / 2,
      "unrelated docs must not share most fingerprints")
    assert(fps(4L).isEmpty)
    // deterministic and sorted ascending
    val again = df.where($"id" === 1)
      .select(TextAnalysis.winnowingFingerprint($"t")).head().getSeq[Long](0)
    assert(again == fps(1L).toSeq.sorted && again == again.sorted)
  }

  test("winnow pairs find containment overlaps, guard boilerplate, cluster transitively") {
    // every 5-gram of a words(c, n) run contains the letter c, so filler
    // runs with distinct letters can never share a fingerprint with each
    // other (the FIRST draft's "w${seed}x$i" tokens shared "x10 w"-style
    // substrings across seeds and paired the boilerplate docs for real)
    def words(c: Char, n: Int) = (0 until n).map(i => s"$c$i$c").mkString(" ")
    val section = "the shared plagiarised passage that both documents quote at length verbatim"
    val big = words('b', 40) + " " + section + " " + words('d', 40)
    val small = "short preamble " + section // contained mid-document in big
    val other = words('z', 60)
    val boiler = "all rights reserved subscribe to the newsletter for updates"
    // 30 docs sharing ONLY boilerplate (df=30 > maxDocFreq) + a unique tail
    // (single repeated symbol: no tail shares any 5-gram with another)
    val syms = "abcdefghijklmnopqrstuvwxyz0123"
    val boilerDocs = (0 until 30).map(i => (100L + i, boiler + " " + syms(i).toString * 5))
    val df = (Seq((1L, big), (2L, small), (3L, other)) ++ boilerDocs).toDF("id", "t")
    val pairs = NearDup.winnowPairs(df, "t", "id", minShared = 2, maxDocFreq = 10)
    val set = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(set.contains((1L, 2L)), "contained section must pair its documents")
    assert(!set.exists { case (a, b) => a >= 100 || b >= 100 },
      "fingerprints over maxDocFreq docs are boilerplate and must not pair")
    // both sides' PAIRABLE fps are exactly the shared section's (their
    // unique words are df=1), so the containment score is ~1
    val ov = pairs.where($"id_a" === 1 && $"id_b" === 2).head().getDouble(3)
    assert(ov > 0.9, s"containment overlap should be ~1.0, got $ov")
    pairs.unpersist(false)
    // transitive: A shares s1 with B, B shares s2 with C, A and C share
    // nothing — clusters must still put all three together
    val s1 = "first shared segment with plenty of characters to fingerprint"
    val s2 = "second shared segment also long enough to produce fingerprints"
    val df2 = Seq(
      (10L, words('e', 30) + " " + s1),
      (20L, s1 + " " + words('f', 30) + " " + s2),
      (30L, s2 + " " + words('g', 30))).toDF("id", "t")
    val cl = NearDup.clusters(
        NearDup.winnowPairs(df2, "t", "id", minShared = 2, maxDocFreq = 10))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cl == Map(10L -> 10L, 20L -> 10L, 30L -> 10L))
    intercept[IllegalArgumentException] {
      NearDup.winnowPairs(df, "t", "id", maxDocFreq = 1)
    }
  }

  test("incremental dedup drops cross-corpus near-dups, keeps new and within-new dups") {
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
      (2L, "completely different reference content about distributed query engines"),
      (3L, "short one")).toDF("id", "t")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog near the river"), // near-dup of 1
      (11L, "completely different reference content about distributed query engines"), // exact dup of 2
      (12L, "genuinely novel text with no overlap whatsoever against anything prior"),
      (13L, "genuinely novel text with no overlap whatsoever against anything prior"), // within-new dup: kept
      (14L, "tiny doc")).toDF("id", "t") // <3 words: no grams, survives
    val got = NearDup.dedupAgainst(batch, ref, "t", "id", threshold = 0.5)
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(12L, 13L, 14L), s"got $got")
  }

  test("token-budget sample derives clamped rates and matches the sampler") {
    import graft.ops.Sampling
    // en: 1000 docs x 10 tokens = 10000; fr: 1000 x 10 = 10000
    val df = (0 until 2000).map(i =>
      (i.toLong, if (i % 2 == 0) "en" else "fr", 10L))
      .toDF("id", "lang", "toks")
    val (out, rates) = Sampling.tokenBudgetSample(df, "lang", "id", "toks",
      budgets = Map("en" -> 5000L, "fr" -> 50000L), defaultRate = 0.0)
    // en rate = 5000/10000 = 0.5; fr budget exceeds corpus -> clamp 1.0
    assert(rates == Map("en" -> 0.5, "fr" -> 1.0))
    val got = out.collect().map(_.getLong(0)).toSet
    // fr kept whole; en equals the plain sampler at the derived rate
    assert(got.count(_ % 2 == 1) == 1000)
    val direct = Sampling.stratifiedSample(df, "lang", "id",
      Map("en" -> 0.5, "fr" -> 1.0)).collect().map(_.getLong(0)).toSet
    assert(got == direct)
    // zero budget and a stratum with no budget both drop under default 0
    val (none, r0) = Sampling.tokenBudgetSample(df, "lang", "id", "toks",
      budgets = Map("en" -> 0L), defaultRate = 0.0)
    assert(r0("en") == 0.0 && none.count() == 0)
    // a high-cardinality strata column (here: the row id — 2000 distinct)
    // must throw, not collect one row per "stratum" onto the driver
    val ex = intercept[IllegalArgumentException] {
      Sampling.tokenBudgetSample(df, "id", "id", "toks",
        budgets = Map("1" -> 10L), maxStrata = 100)
    }
    assert(ex.getMessage.contains("more than 100 distinct"))
    // at the boundary (strata == maxStrata) it still works
    val (_, rOk) = Sampling.tokenBudgetSample(df, "lang", "id", "toks",
      budgets = Map("en" -> 5000L), maxStrata = 2)
    assert(rOk == Map("en" -> 0.5))
  }

  test("temperature sampling flattens the mix: tau=1 is natural " +
      "proportions, tau>1 favors the tail, tiny strata clamp at 1") {
    import graft.ops.Sampling
    // en: 9000 tokens, fr: 2500, de: 900 — a 10:3:1 head/tail mix
    val df = ((0 until 900).map(i => (i.toLong, "en", 10L)) ++
      (1000 until 1250).map(i => (i.toLong, "fr", 10L)) ++
      (2000 until 2090).map(i => (i.toLong, "de", 10L)))
      .toDF("id", "lang", "toks")
    // tau=1: budget_s ∝ tokens_s, so every stratum gets the SAME rate
    // T/Σtokens = 6200/12400 = 0.5
    val (_, r1) = Sampling.temperatureSample(df, "lang", "id", "toks",
      targetTokens = 6200L, tau = 1.0)
    assert(r1 == Map("en" -> 0.5, "fr" -> 0.5, "de" -> 0.5), r1)
    // tau=2: rates ∝ tokens^(-1/2) — strictly higher for smaller strata
    // (T=4000 keeps all three in the unclamped regime)
    val (out2, r2) = Sampling.temperatureSample(df, "lang", "id", "toks",
      targetTokens = 4000L, tau = 2.0)
    assert(r2("de") > r2("fr") && r2("fr") > r2("en"), r2)
    assert(r2.values.forall(v => v > 0 && v < 1.0), r2)
    // the filter is the plain sampler at the derived rates
    val direct = Sampling.stratifiedSample(df, "lang", "id", r2)
      .collect().map(_.getLong(0)).toSet
    assert(out2.collect().map(_.getLong(0)).toSet == direct)
    // a tiny enough stratum clamps at 1.0 (kept whole, never upsampled)
    val (_, r3) = Sampling.temperatureSample(df, "lang", "id", "toks",
      targetTokens = 12400L, tau = 8.0)
    assert(r3("de") == 1.0, r3)
    assert(r3.values.forall(v => v > 0 && v <= 1.0), r3)
  }

  test("split assignment is exhaustive, disjoint, growth-stable, and " +
      "leaves a sub-1 remainder NULL") {
    import graft.ops.Sampling
    val ids = (0 until 4000).map(_.toLong).toDF("id")
    val full = Sampling.assignSplits(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // exhaustive (fractions sum to 1 -> last threshold is the keep-all
    // sentinel) and roughly proportioned
    assert(full.values.forall(v => v != null))
    val n = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(n("train") > 3000 && n("val") > 200 && n("test") > 200, n)
    // growth-stable: the same ids get the same split in a bigger corpus
    val grown = Sampling.assignSplits(
        (0 until 8000).map(_.toLong).toDF("id"), "id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(full.forall { case (id, s) => grown(id) == s })
    // sub-1 fractions leave the remainder explicitly NULL
    val partial = Sampling.assignSplits(ids, "id", Seq("train" -> 0.5))
      .collect().map(r => Option(r.getString(1)))
    assert(partial.exists(_.isEmpty) && partial.exists(_.contains("train")))
    // fractions over 1 refuse
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(ids, "id", Seq("a" -> 0.8, "b" -> 0.3))
    }
    // float edge (r14 advisory): fractions that SUM to 1 in intent but
    // land one ulp under it in doubles (0.7+0.15+0.15) must still close
    // the hash space — the last boundary snaps to the keep-all sentinel.
    assert(Sampling.cumulativeThresholdHex(Seq(0.7, 0.15, 0.15)).last == "g")
    val uneven = Sampling.assignSplits(ids, "id",
      Seq("train" -> 0.7, "val" -> 0.15, "test" -> 0.15))
      .collect().map(_.getString(1))
    assert(uneven.forall(_ != null),
      "fractions summing to 1.0-in-intent must leave no row unassigned")
    // a rate one ulp below 1.0 rounds to 2^32 in the scale-up; the clamp
    // must keep the threshold 8 hex chars (not a 9-char "100000000")
    assert(Sampling.thresholdHex(math.nextDown(1.0)) == "ffffffff")
    ()
  }

  test("near-dup clusters close transitively to the smallest id") {
    val pairs = Seq((2L, 1L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = NearDup.clusters(pairs).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq ==
      Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L)))
    // a chain needing multiple propagation rounds: 5-6, 6-7, 7-8 → all 5
    val chain = Seq((5L, 6L), (6L, 7L), (7L, 8L)).toDF("id_a", "id_b")
    val c = NearDup.clusters(chain).collect().map(_.getLong(1)).toSet
    assert(c == Set(5L))
  }

  test("clusters handles a 50-link chain via pointer jumping, throws past cap") {
    // diameter 50 — plain min-label propagation would need ~50 rounds and
    // the pre-r9 code returned silently WRONG labels at the 20-round cap;
    // pointer jumping converges in O(log 50) ≈ 6 rounds + 1 confirm
    val longChain = (0 until 50).map(i => (i.toLong, i + 1L)).toDF("id_a", "id_b")
    // maxDriverEdges = -1 forces the DISTRIBUTED loop — pointer jumping
    // and the convergence throw are its properties, not the driver path's
    val labels = NearDup.clusters(longChain, maxDriverEdges = -1L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(labels.length == 51 && labels.forall(_._2 == 0L),
      s"all 51 chained ids must label to 0, got ${labels.filter(_._2 != 0L).take(5).toSeq}")
    // a diameter the round budget genuinely cannot cover must FAIL LOUDLY,
    // never return mislabeled clusters
    val e = intercept[IllegalStateException] {
      NearDup.clusters(longChain, maxIters = 2, maxDriverEdges = -1L)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("minhash bucket skew guard keeps mass-duplicate families linear and connected") {
    // 40 identical docs: every copy lands in the same bucket in all 16
    // bands — the unguarded candidate join emits C(40,2)=780 pairs; the
    // guard emits the 39 star pairs and cluster resolution still unifies
    // the whole family
    val fam = (0 until 40).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again"))
    val other = Seq((100L, "completely unrelated content about distributed query engines here"))
    val df = (fam ++ other).toDF("id", "t")
    val pairs = NearDup.minhashPairs(df, "t", "id", threshold = 0.5, maxBucket = 8)
    val collected = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(collected == (1 until 40).map(i => (0L, i.toLong)).toSet,
      s"expected the 39 star pairs, got ${collected.size}")
    val labels = NearDup.clusters(pairs).collect().map(_.getLong(1)).toSet
    assert(labels == Set(0L), "family must resolve to one cluster")
    pairs.unpersist()
  }

  test("embedding bucket skew guard keeps identical-vector families linear") {
    val fam = (0 until 30).map(i => (i.toLong, Seq(1.0, 0.0, 0.5, 0.25)))
    val other = Seq((100L, Seq(-1.0, 0.3, -0.7, 0.9)))
    val df = (fam ++ other).toDF("vec_id", "embedding")
    val pairs = NearDup.embeddingPairs(df, "embedding", "vec_id",
      dim = 4, threshold = 0.99, maxBucket = 8)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (1 until 30).map(i => (0L, i.toLong)).toSet,
      s"expected 29 star pairs, got ${got.size}")
    assert(NearDup.clusters(pairs).collect().map(_.getLong(1)).toSet == Set(0L))
    pairs.unpersist()
  }

  test("clusters and minhash are safe on empty input") {
    // a corpus with no near-dup pairs is a normal outcome, not an error
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(NearDup.clusters(noPairs).count() == 0)
    // docs all shorter than the gram width produce no signatures
    val tiny = Seq((1L, "one two"), (2L, "three")).toDF("id", "t")
    assert(NearDup.minhashPairs(tiny, "t", "id", k = 3).count() == 0)
  }

  test("null embeddings are dropped, not fatal, in every vector operator") {
    // a single null vector — or a vector with a null ELEMENT — in 100 TB
    // of embeddings must not kill the job
    def v(xs: java.lang.Double*): Seq[java.lang.Double] = xs
    val df = Seq(
      (1L, v(1.0, 0.0)),
      (2L, null.asInstanceOf[Seq[java.lang.Double]]),
      (3L, v(1.0, 0.0)),
      (4L, v(1.0, null))).toDF("vec_id", "embedding")
    val pairs = NearDup.embeddingPairs(df, "embedding", "vec_id",
      dim = 2, threshold = 0.9).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 3L)))
    val q = df.where($"vec_id" === 1)
    assert(Similarity.bruteForceTopK(df, q, 2).count() == 1) // only id 3 scores
    assert(Similarity.lshTopK(df, q, 2, dim = 2).count() <= 1)
    assert(Similarity.ivfTopK(df, q, 2, nlist = 1, nprobe = 1).count() == 1)
  }

  test("pair operators release intermediates; caller releases the result") {
    val before = graft.util.CacheHygiene.snapshot(spark)
    val base = (0 until 20).map(i =>
      (i.toLong, s"the quick brown fox jumps over the lazy dog number $i variant alpha beta gamma"))
    val df = (base ++ base.map { case (i, t) => (i + 100L, t.dropRight(6)) })
      .toDF("id", "t")
    val pairs = NearDup.minhashPairs(df, "t", "id", threshold = 0.5)
    pairs.count()
    // the operator dropped its O(corpus) signature/gram stores on return:
    // the only NEW persist left is the result itself
    val after = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before(id) }
    assert(after.size == 1,
      s"exactly the cached pair list should remain, got ${after.size} new persists")
    assert(graft.util.CacheHygiene.releaseNew(spark, before) == 1)
    assert(graft.util.CacheHygiene.snapshot(spark) == before)
  }

  test("simhash of near-identical texts has small hamming distance") {
    val df = Seq((1L,
      "one two three four five six seven eight nine ten eleven twelve")).toDF("id", "t")
    val h1 = df.select(NearDup.simhash($"t")).head().getLong(0)
    val h2 = df.select(NearDup.simhash(concat($"t", lit(" thirteen")))).head().getLong(0)
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 16)
    val h3 = df.select(NearDup.simhash(lit("completely different words entirely distinct content"))).head().getLong(0)
    assert(java.lang.Long.bitCount(h1 ^ h3) > java.lang.Long.bitCount(h1 ^ h2))
  }

  test("cosine similarity exact values") {
    val df = Seq((1L, Seq(1.0, 0.0), Seq(0.0, 1.0)),
      (2L, Seq(1.0, 1.0), Seq(1.0, 1.0)),
      (3L, Seq(1.0, 2.0), Seq(2.0, 4.0))).toDF("id", "a", "b")
    val out = df.select($"id", Similarity.cosine($"a", $"b").as("c"))
      .orderBy("id").collect().map(_.getDouble(1))
    assert(out(0) == 0.0)
    assert(math.abs(out(1) - 1.0) < 1e-12)
    assert(math.abs(out(2) - 1.0) < 1e-12)
  }

  test("brute-force topk ranks by similarity") {
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.0f, 1.0f)), (3L, Seq(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, vecs.where($"vec_id" === 0), 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 3L))
  }

  test("lsh topk achieves reasonable recall against brute force") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 200).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    vecs.cache().count()
    val q = vecs.where($"vec_id" < 3)
    val bf = Similarity.bruteForceTopK(vecs, q, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ls = Similarity.lshTopK(vecs, q, 5, dim = 16, planes = 32, bands = 16)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(ls).size.toDouble / bf.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("ivf probing all cells equals brute force; few cells keeps recall") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(11)
    // clustered data: 4 well-separated centers + noise, so cell probing
    // has real locality to exploit
    val centers = Seq.fill(4)(Seq.fill(16)(rnd.nextGaussian() * 5))
    val vecs = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.5).toFloat))
    }.toDF("vec_id", "embedding")
    vecs.cache().count()
    val q = vecs.where($"vec_id" < 3)
    val bf = Similarity.bruteForceTopK(vecs, q, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // nprobe == nlist: exact equality, independent of clustering quality
    val all = Similarity.ivfTopK(vecs, q, 5, nlist = 6, nprobe = 6)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(all == bf)
    // nprobe = 2 of 6: the query's own cluster is probed, recall stays high
    val few = Similarity.ivfTopK(vecs, q, 5, nlist = 6, nprobe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(few).size.toDouble / bf.size
    assert(recall >= 0.8, s"ivf recall $recall too low")
  }

  test("ivf quantizer sample is uniform, not first-partitions-biased") {
    val spark2 = spark
    import spark2.implicits._
    val rnd = new scala.util.Random(13)
    // Corpus LARGER than the quantizer sample bound (4096 vectors),
    // sorted by cluster and range-partitioned so partitions correlate
    // with clusters — the adversarial layout where a limit(n) sample
    // would see only the first clusters and recall for queries from the
    // last cluster collapses. The xxhash64 draw must keep it high.
    val centers = Seq.fill(8)(Seq.fill(8)(rnd.nextGaussian() * 6))
    val n = 4800
    val vecs = (0 until n).map { i =>
      val c = centers(i * 8 / n)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.4).toFloat))
    }.toDF("vec_id", "embedding")
      .repartitionByRange(8, $"vec_id")
    vecs.cache().count()
    val q = vecs.where($"vec_id" >= (n - 3)) // queries from the LAST cluster
    val bf = Similarity.bruteForceTopK(vecs, q, 5)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val few = Similarity.ivfTopK(vecs, q, 5, nlist = 8, nprobe = 2)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = bf.intersect(few).size.toDouble / bf.size
    assert(recall >= 0.8, s"ivf recall on skewed layout $recall too low")
    vecs.unpersist()
  }

  test("frame sampler keeps every k-th fixed-size frame incl. partial tail") {
    val spark2 = spark
    import spark2.implicits._
    // 10 bytes -> frames of 4: [0123][4567][89]; every 2nd -> frames 0, 2
    val df = graft.multimodal.Multimodal.asMedia(
      Seq((1L, "0123456789")).toDF("doc_id", "text"), "text")
    val out = graft.multimodal.Multimodal.sampleFrames(df, frameBytes = 4,
      every = 2).orderBy("frame_idx").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(0L, 2L))
    def hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0).getString(2) == hex("0123"))
    assert(out(1).getString(2) == hex("89")) // partial tail frame
  }

  test("sessionize splits on gap and aggregates") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(sec: Long) = new java.sql.Timestamp(t0.getTime + sec * 1000)
    val df = Seq(
      (1L, 1L, ts(0)), (2L, 1L, ts(60)), (3L, 1L, ts(4000)),
      (4L, 2L, ts(0))).toDF("event_id", "user_id", "ts")
    val out = Events.sessionize(df, gapSeconds = 1800)
      .orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    assert(out(0).getLong(2) == 2) // user1 session1: 2 events
    assert(out(1).getLong(2) == 1) // user1 session2
    assert(out(2).getLong(2) == 1) // user2
  }

  test("streaming tumbling aggregation matches batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String, Double)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:10:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    mem.addData((ts(0), "click", 1.0), (ts(5), "click", 3.0), (ts(70), "view", 2.0))
    val stream = mem.toDF.toDF("ts", "event_type", "value")
    val q = Events.streamingTumbling(stream, "1 hour", "2 hours")
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").start()
    q.processAllAvailable()
    val rows = spark.table("tumbling_test").orderBy("window_start").collect()
    q.stop()
    assert(rows.length == 2)
    assert(rows(0).getLong(2) == 2 && rows(0).getDouble(3) == 2.0)
    assert(rows(1).getLong(2) == 1)
  }

  test("streaming exact dedup drops duplicates across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    val stream = mem.toDF.toDF("ts", "doc_id", "text")
    val q = graft.ops.Dedup.streamingExact(stream, "ts", "30 minutes",
        Seq("text"))
      .writeStream.format("memory").queryName("stream_dedup_test")
      .outputMode("append").start()
    mem.addData((ts(0), 1L, "aa"), (ts(1), 2L, "bb"), (ts(2), 3L, "aa"))
    q.processAllAvailable()
    mem.addData((ts(3), 4L, "aa"), (ts(5), 5L, "cc")) // dup across batches
    q.processAllAvailable()
    val rows = spark.table("stream_dedup_test").collect()
    q.stop()
    assert(rows.map(_.getString(2)).sorted.toSeq == Seq("aa", "bb", "cc"))
  }

  test("streamTwinExact matches streamingExact under event-time arrival") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(java.sql.Timestamp, Long, String)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(min: Int) = new java.sql.Timestamp(t0.getTime + min * 60000L)
    // duplicates spread across keys; id is the tie-break for equal ts
    val data = Seq(
      (ts(0), 1L, "aa"), (ts(1), 2L, "bb"), (ts(2), 3L, "aa"),
      (ts(3), 4L, "cc"), (ts(3), 5L, "bb"), (ts(6), 6L, "aa"))
    val stream = mem.toDF.toDF("ts", "doc_id", "text")
    val q = graft.ops.Dedup.streamingExact(stream, "ts", "30 minutes",
        Seq("text"))
      .writeStream.format("memory").queryName("stream_twin_test")
      .outputMode("append").start()
    // one micro-batch per row = arrival order IS event-time order, the
    // regime the batch twin models
    data.foreach { r => mem.addData(r); q.processAllAvailable() }
    val streamed = spark.table("stream_twin_test")
      .select("doc_id").as[Long].collect().sorted.toSeq
    q.stop()
    val twin = graft.ops.Dedup.streamTwinExact(
        data.toDF("ts", "doc_id", "text"), "ts", Seq("text"), "doc_id")
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(twin == Seq(1L, 2L, 4L))
    assert(streamed == twin)
  }
}
