package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Encode, TextClean}
import graft.dedup.NearDup

/** Enforces the plan-shape claims the engine is designed around (README
  * "Designed for 100 TB"): pruning and filters reach the parquet scan,
  * categorical joins broadcast, per-row transforms stay exchange-free.
  * These assertions are what make ".explain and iterate" regressions
  * visible in CI rather than in a cluster bill. */
class PlanQualitySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("column pruning reaches the parquet scan") {
    val p = plan(Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity"))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse(
      p.split("ReadSchema").lift(1).getOrElse(""))
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice"),
      "scan reads columns the query never uses")
  }

  test("filters push down to the parquet scan") {
    val p = plan(Tables.load(spark, sf, "lineitem")
      .filter($"l_quantity" > 40).select("l_orderkey"))
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40"),
      s"expected pushed GreaterThan filter in:\n$p")
  }

  test("label encoding joins the dictionary via broadcast, never sort-merge") {
    val df = Tables.load(spark, sf, "customer")
    val p = plan(Encode("label", columns = Seq("c_mktsegment"))(df).df)
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"),
      "fact table must not shuffle for a bounded dictionary join")
  }

  test("label encoding above the cardinality gate never broadcasts the dict") {
    val df = Tables.load(spark, sf, "customer")
    val p = plan(Encode("label", columns = Seq("c_mktsegment"),
      maxLabelBroadcast = 1)(df).df)
    assert(!p.contains("BroadcastExchange") && !p.contains("BroadcastHashJoin"),
      s"an over-gate dictionary must not be broadcast:\n$p")
    assert(!p.contains("Window"), "no global-order window above the gate")
  }

  test("label dictionary global-order window exists only under the HLL gate") {
    // the converse of the over-gate test above: the one-task dense_rank
    // window is REACHABLE only when the HLL probe says the dictionary is
    // bounded (≤ 2^16 values — safe for a single task by construction),
    // and the gate constant itself is pinned
    assert(graft.ops.Encode.MaxBroadcastCardinality == (1 << 16))
    val df = Tables.load(spark, sf, "customer")
    val under = plan(graft.ops.Encode.labelMapping(df, "c_mktsegment"))
    assert(under.contains("Window"),
      s"a bounded dictionary builds codes via the dense_rank window:\n$under")
    val over = plan(graft.ops.Encode.labelMapping(df, "c_mktsegment",
      maxBroadcast = 1))
    assert(!over.contains("Window"),
      s"an over-gate dictionary must rank via rankedDistinct, no window:\n$over")
  }

  test("directional fill uses the global window only on single-partition input") {
    import graft.ops.MissingValues
    val df = Tables.load(spark, sf, "customer")
    // multi-partition input routes to PartitionedFill: range shuffle +
    // per-partition scan-carry, NO one-task WindowExec funnel
    val multi = plan(MissingValues("forward_fill",
      orderCol = Some("c_custkey"))(df.repartition(4)).df)
    assert(!multi.contains("Window"),
      s"multi-partition ffill must not run a global window:\n$multi")
    // single-partition input keeps the exact global window — already one
    // task, a range shuffle would be pure cost
    val single = plan(MissingValues("forward_fill",
      orderCol = Some("c_custkey"))(df.coalesce(1)).df)
    assert(single.contains("Window"),
      s"single-partition ffill keeps the windowed exact path:\n$single")
  }

  test("frequency encoding broadcasts counts, fact side shuffle-free") {
    val df = Tables.load(spark, sf, "customer")
    val p = plan(Encode("target", columns = Seq("c_mktsegment"))(df).df)
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("text cleaning is a pure projection — no exchange") {
    val df = Tables.load(spark, sf, "customer")
    val p = plan(TextClean(operations = Seq("lowercase", "remove_whitespace",
      "remove_punctuation"))(df).df)
    assert(!p.contains("Exchange"), s"text ops must not shuffle:\n$p")
  }

  test("minhash signatures: one UDF eval, only the size-gated repartition") {
    val df = Tables.load(spark, sf, "documents")
    val p = plan(NearDup.ophSignatures(df, "text", "doc_id", 64, 3))
    // r21: a small corpus gains ONE explicit repartition below the
    // signature UDF (Parallelize.bySize — the kernel must not inherit a
    // handful of scan splits on a many-core host); nothing else may
    // shuffle, and the repartition must sit UNDER the UDF projection so
    // the expensive pass runs at full width.
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges <= 1 && (exchanges == 0 ||
        p.contains("REPARTITION_BY_NUM")),
      s"signature stage may shuffle only via the explicit repartition:\n$p")
    // the sigUdf is nondeterministic-marked so the isnotnull filter can't
    // be pushed below its projection and re-evaluate it per row (the
    // pushed copy ALSO defeated the repartition: the duplicate eval ran
    // at scan width)
    assert("UDF".r.findAllIn(p).size == 1,
      s"signature UDF must be evaluated exactly once per row:\n$p")
  }

  test("minhash signatures skip the repartition on a large-estimate input") {
    // same kernel over an input whose size estimate exceeds
    // cores × maxPartitionBytes — the gate must not fire (a 100 TB scan
    // never pays the extra shuffle)
    val df = Tables.load(spark, sf, "documents")
    val prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1")
      val p = plan(NearDup.ophSignatures(df, "text", "doc_id", 64, 3))
      assert(!p.contains("Exchange"),
        s"large-estimate signature stage must not shuffle:\n$p")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", prev)
  }

  test("skew-guarded candidates broadcast the bucket flags, never cross-join") {
    import spark.implicits._
    val buckets = (0 until 100).map(i => (i.toLong, i % 7))
      .toDF("__id", "__bucket")
    val before = graft.util.CacheHygiene.snapshot(spark)
    val (pairs, staged) = NearDup.bucketCandidates(buckets, Seq("__bucket"),
      Nil, maxBucket = 10)(identity)
    val p = plan(pairs)
    assert(p.contains("BroadcastHashJoin"),
      s"the oversized-bucket flag frame must broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"candidates must come from key joins only:\n$p")
    assert(staged.size == 1, "the guard stages exactly the flag frame")
    graft.util.CacheHygiene.releaseNew(spark, before)
  }

  test("winnow pairs meet on fingerprint-value key joins, never cross joins") {
    val docs = Tables.load(spark, sf, "documents")
    val before = graft.util.CacheHygiene.snapshot(spark)
    val pairs = NearDup.winnowPairs(docs, "text", "doc_id")
    val p = plan(pairs)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"winnow candidates must come from the fingerprint key join only:\n$p")
    pairs.unpersist(false)
    graft.util.CacheHygiene.releaseNew(spark, before)
  }

  test("repetition signals and PII redaction stay exchange-free projections") {
    val docs = Tables.load(spark, sf, "documents")
    val pRep = plan(graft.text.QualityFilters
      .repetitionSignals(docs, "text", "doc_id"))
    assert(!pRep.contains("Exchange"),
      s"repetition signals must not shuffle:\n$pRep")
    val pRed = plan(docs.select(col("doc_id"),
      graft.text.Redact.redactPii(col("text")).as("text")))
    assert(!pRed.contains("Exchange"),
      s"PII redaction must not shuffle:\n$pRed")
  }

  test("gram explodes read a staged token array — no inline tokenizer") {
    // HOF lambdas re-evaluate embedded subtrees per element, so an
    // inline split/trim/lower inside the gram transform re-tokenizes
    // once PER GRAM (O(words^2) per row — the r11 q_*_filter finding).
    // The staging contract: no Generate line of these plans may contain
    // the tokenizer chain; it must live in a projection below.
    val docs = Tables.load(spark, sf, "documents")
    val ids = docs.select("doc_id", "text")
    // only per-element lambdas are the hazard: an explode whose CHILD
    // tokenizes runs the tokenizer once per row (fine — the unigram
    // explode in BigramLm.fit is exactly that); a tokenizer inside a
    // transform(sequence...) lambda runs once per GRAM
    def generateLines(df: DataFrame): String =
      df.queryExecution.executedPlan.treeString.linesIterator
        .filter(l => l.contains("Generate") && l.contains("transform(sequence"))
        .mkString("\n")
    val dcn = graft.text.Decontaminate.flagContaminated(
      ids, ids.limit(10), "text", "doc_id", n = 6)
    assert(!generateLines(dcn).contains("split(trim(lower"),
      "decontaminate gram explode re-tokenizes per gram")
    val fit = graft.text.BigramLm.fit(ids.limit(50), "text")
    try {
      val lm = graft.text.BigramLm.scoreBits(ids, fit, "text", "doc_id")
      assert(!generateLines(lm).contains("split(trim(lower"),
        "bigram explode re-tokenizes per element_at")
    } finally fit.release()
  }

  test("gopher filter evaluates the repetition kernel exactly once per row") {
    // the keep-predicate is ONE boolean kernel by construction; this pins
    // that no optimizer rewrite (filter pushdown through a project,
    // project collapse) re-duplicates the kernel into N getField copies
    val docs = Tables.load(spark, sf, "documents")
    val out = graft.text.QualityFilters.gopherRepetitionFilter(docs, "text")
    val nKernel = out.queryExecution.optimizedPlan.collect {
      case p => p.expressions.map(_.collect {
        case k: graft.functions.RepetitionKeep => k
      }.size).sum
    }.sum
    assert(nKernel == 1,
      s"expected exactly one RepetitionKeep kernel in the plan, got $nKernel")
    assert(!plan(out).contains("ScalaUDF"),
      "the gopher filter must not fall back to a Scala UDF")
    assert(!plan(out).contains("Exchange"), "gopher filter must not shuffle")
  }

  test("decontamination meets on gram-hash key joins, never cross joins") {
    val docs = Tables.load(spark, sf, "documents")
    val bench = docs.where(col("doc_id") % 10 === 0)
    val p = plan(graft.text.Decontaminate
      .flagContaminated(docs, bench, "text", "doc_id", n = 6))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"gram overlap must come from key joins only:\n$p")
  }

  test("bigram LM scoring meets the count tables in key joins only") {
    val docs = Tables.load(spark, sf, "documents")
    val before = graft.util.CacheHygiene.snapshot(spark)
    try {
      val fit = graft.text.BigramLm.fit(docs, "text")
      val p = plan(graft.text.BigramLm.scoreBits(docs, fit, "text", "doc_id"))
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
        s"LM scoring must come from key joins only:\n$p")
    } finally graft.util.CacheHygiene.releaseNew(spark, before)
  }

  test("sequence packing has no single-partition exchange") {
    val before = graft.util.CacheHygiene.snapshot(spark)
    try {
      val p = plan(graft.plans.SequencePacking.plan(
        Tables.load(spark, sf, "documents"), "doc_id", "n_chars", 1000))
      assert(!p.contains("SinglePartition"),
        s"the packing prefix sum must stay partition-parallel:\n$p")
    } finally graft.util.CacheHygiene.releaseNew(spark, before)
  }

  test("auto maxBucket heuristic: floor 4096, n/64 midrange, ceiling 65536") {
    assert(NearDup.autoMaxBucket(0) == 4096)
    assert(NearDup.autoMaxBucket(1000) == 4096)
    assert(NearDup.autoMaxBucket(1000000) == 15625)
    assert(NearDup.autoMaxBucket(100000000L) == 65536)
  }

  test("an over-bound flag frame shuffle-joins instead of broadcasting") {
    import spark.implicits._
    // every 3-member bucket is "oversized" at maxBucket=2, so the flag
    // frame has ~100 rows — over a 10-row broadcast bound it must fall
    // back to a plain key join (the guard's own build side is
    // cardinality-guarded like every other broadcast in the library)
    val buckets = (0 until 300).map(i => (i.toLong, i % 100))
      .toDF("__id", "__bucket")
    val before = graft.util.CacheHygiene.snapshot(spark)
    // auto-broadcast off: any tiny frame would otherwise broadcast by
    // size estimate and mask whether the explicit hint was withheld
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (pairs, _) = NearDup.bucketCandidates(buckets, Seq("__bucket"),
        Nil, maxBucket = 2, maxFlagBroadcast = 10)(identity)
      val p = plan(pairs)
      assert(!p.contains("BroadcastHashJoin"),
        s"an over-bound flag frame must not broadcast:\n$p")
      // star semantics survive the strategy change: min ↔ member per bucket
      assert(pairs.count() == 200)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      graft.util.CacheHygiene.releaseNew(spark, before)
    }
  }

  test("ivf rerank broadcasts the probed queries, corpus never cross-joins") {
    val e = Tables.load(spark, sf, "embeddings")
    val p = plan(graft.sim.Similarity.ivfTopK(e, e.where($"vec_id" < 3), 5,
      nlist = 4, nprobe = 2))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"ivf candidate join must be a key join:\n$p")
  }

  test("lsh topk candidates come from a band key join, never a cross join") {
    val e = Tables.load(spark, sf, "embeddings")
    val p = plan(graft.sim.Similarity.lshTopK(e, e.where($"vec_id" < 3), 5,
      dim = 64, planes = 32, bands = 8))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"corpus x queries must join on (band, bandbits):\n$p")
  }

  test("spell correction map is a key join, never a cross join") {
    val d = Tables.load(spark, sf, "documents")
    val p = plan(graft.plans.DistributedSpell.corrections(d, "text",
      sim = graft.plans.DistributedSpell.levSim))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"rare x vocab must join on block keys:\n$p")
  }

  test("star join-agg: Catalyst broadcasts dims, pushes filters, prunes") {
    // the query is the BARE declarative chain (no hints, no pre-filtered
    // scans) — these assertions check the optimizer earned its keep
    val p = plan(SparkEntry.joinAggPlan(spark, sf))
    // every dimension side fits under the auto-broadcast threshold at
    // test scale: no sort-merge join anywhere in this star
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // the literal region filter reached the region parquet scan
    assert(p.contains("EqualTo(r_name,EUROPE)"),
      s"region filter must push into the scan:\n$p")
    // the date range reached the orders scan as pushed predicates
    assert(p.contains("GreaterThanOrEqual(o_orderdate") &&
      p.contains("LessThan(o_orderdate"),
      s"order date range must push into the scan:\n$p")
    // lineitem scan pruned to the 3 used columns
    val liRead = p.linesIterator
      .filter(_.contains("ReadSchema")).find(_.contains("l_orderkey"))
    assert(liRead.exists(l => l.contains("l_extendedprice") &&
      l.contains("l_discount") && !l.contains("l_quantity") &&
      !l.contains("l_shipdate")),
      s"lineitem scan must read exactly its 3 used columns:\n$p")
  }

  test("chunker and split assignment stay shuffle-free projections " +
      "(r14)") {
    val docs = Tables.load(spark, sf, "documents")
    val chunkPlan = plan(graft.text.Chunker
      .chunk(docs, "doc_id", "text", chunkTokens = 6, overlapTokens = 2))
    assert(!chunkPlan.contains("Exchange"),
      s"chunking is a per-row explode — a shuffle here is a regression:\n" +
        chunkPlan)
    assert(!chunkPlan.contains("ScalaUDF") && !chunkPlan.contains("BatchEval"),
      chunkPlan)
    val splitPlan = plan(graft.ops.Sampling.assignSplits(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    assert(!splitPlan.contains("Exchange") && !splitPlan.contains("ScalaUDF"),
      s"split assignment is a pure projection:\n$splitPlan")
  }

  test("tokenizer apply passes are shuffle-free codegen projections " +
      "with the derivation evaluated once per row (r19)") {
    val docs = Tables.load(spark, sf, "documents")
    val bg = graft.text.Bpe.withBigramPreTokens(
      docs.select("doc_id", "text"), "text", "bg_text")
    val bpePlan = plan(graft.text.Bpe.withTokenCount(
      bg, "bg_text", "n", graft.text.BpeLearn1k.Merges.take(64)))
    assert(!bpePlan.contains("Exchange"),
      s"BPE apply must not shuffle the corpus:\n$bpePlan")
    assert(!bpePlan.contains("ScalaUDF"), bpePlan)
    // the zip_with form, not transform(sequence, i -> element_at(ws, i)):
    // a HOF lambda re-evaluates free-variable subtrees PER ELEMENT, so
    // the element_at formulation re-split the whole document once per
    // word — O(words²·chars)/doc, measured 10× at sf0.1 (BASELINE r19)
    assert(bpePlan.contains("zip_with") && !bpePlan.contains("transform("),
      s"bigram derivation must stay the once-per-row zip_with form:\n" +
        bpePlan)
    val wpPlan = plan(graft.text.WordPiece.withPieceCount(
      bg, "bg_text", "n_wp",
      graft.text.WordPiece.vocabFromMerges(graft.text.BpeLearn1k.Merges)))
    assert(!wpPlan.contains("Exchange") && !wpPlan.contains("ScalaUDF"),
      s"wordpiece apply is a pure projection:\n$wpPlan")
  }

  test("over-gate label encoding takes the partition-offset path: no " +
      "global window, no dictionary broadcast (r15)") {
    val customer = Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_name")
    val p = plan(graft.ops.Encode("label", columns = Seq("c_name"),
      maxLabelBroadcast = 100)(customer).df)
    assert(!p.contains("Window"),
      s"an over-gate dictionary must not rank through a window:\n$p")
    assert(!p.contains("SinglePartition"),
      s"no single-partition stage in the big label path:\n$p")
    assert(!p.contains("BroadcastHashJoin") && !p.contains("BroadcastExchange"),
      s"an over-gate dictionary must not broadcast:\n$p")
  }

  test("corpus shuffle is a partition-parallel permutation: no global " +
      "window, positions are a bijection (r15)") {
    val docs = Tables.load(spark, sf, "documents").select("doc_id", "lang")
    val out = graft.ops.Sampling.shufflePositions(docs, "doc_id")
    val p = plan(out)
    assert(!p.contains("Window") && !p.contains("SinglePartition"),
      s"global-order positions must come from the offset pattern:\n$p")
    val pos = out.select("shuffle_pos").collect().map(_.getLong(0))
    assert(pos.sorted.toSeq == (0L until pos.length).toSeq,
      "positions must be exactly 0..n-1, each once")
    // salt change = fresh permutation; same salt = stable
    val again = graft.ops.Sampling.shufflePositions(docs, "doc_id")
      .select("doc_id", "shuffle_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val other = graft.ops.Sampling
      .shufflePositions(docs, "doc_id", salt = "epoch2")
      .select("doc_id", "shuffle_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val first = out.select("doc_id", "shuffle_pos").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == first, "same salt must reproduce the permutation")
    assert(other != first, "a new salt must re-shuffle")
  }

  test("chunk→pack composition adds no shuffle before the pack's own " +
      "range exchange (r15)") {
    val docs = Tables.load(spark, sf, "documents")
    // the stage SequencePacking range-partitions: must still be the
    // chunker's shuffle-free single explode — a shuffle or second
    // Generate here means the composition broke the one-pass shape
    val chunks = graft.text.Chunker
      .chunk(docs, "doc_id", "text", chunkTokens = 6, overlapTokens = 2)
      .select((col("doc_id") * 1000000L + col("chunk_id")).as("chunk_key"),
        col("n_chunk_tokens"))
    val p = plan(chunks)
    assert(!p.contains("Exchange"),
      s"chunk stage feeding the packer must stay shuffle-free:\n$p")
    assert("Generate".r.findAllMatchIn(p).size == 1,
      s"exactly one explode expected in the chunk stage:\n$p")
    val before = graft.util.CacheHygiene.snapshot(spark)
    try {
      val packed = graft.plans.SequencePacking.plan(
        chunks, "chunk_key", "n_chunk_tokens", window = 8)
      val pp = plan(packed)
      assert(!pp.contains("SinglePartition"),
        s"the packing prefix sum must stay partition-parallel:\n$pp")
      // end-to-end sanity: offsets are a prefix sum in key order
      val rows = packed.orderBy("chunk_key")
        .select("n_tokens", "start_token").collect()
      var cum = 0L
      rows.foreach { r =>
        assert(r.getLong(1) == cum, "start_token must equal prefix sum")
        cum += r.getLong(0)
      }
    } finally graft.util.CacheHygiene.releaseNew(spark, before)
  }

  /** The q_train_layout shuffle-budget assertions against `dir`'s
    * documents table: pushed quality filter, scan-side bloom probe,
    * exactly 2 hash exchanges before the epoch shuffle, two-phase
    * window-group-limit cap. Returns the capped frame for further
    * checks. Shared by the sf0.001 test and the sf1-build test — the
    * budget is a property of the PLAN, so partition counts (1 file vs
    * 50 row groups) must not move it. */
  private def assertTrainLayoutBudget(dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select("doc_id", "lang", "text")
    val quality = graft.text.QualityFilters.gopherRepetitionFilter(
      d, "text", 0.60, 0.15, 0.15, 0.15)
    val bench = d.where(col("doc_id") % 20 === 0).select("doc_id", "text")
    val clean = graft.text.Decontaminate
      .flagContaminatedBloom(quality, bench, "text", "doc_id", n = 6)
      .where(!col("contaminated")).drop("contaminated")
    val capped = graft.ops.Sampling
      .capPerGroup(clean, "lang", "doc_id", k = 40)
      .select("doc_id", "text")
    val p = plan(capped)
    // the cached benchGrams build (after "InMemoryRelation") is a
    // separate, already-pinned query — budget the MAIN chain only
    val main = p.split("InMemoryRelation")(0)
    // exactly 2 data shuffles before the epoch shuffle: the hit-id
    // distinct and the per-lang cap window — everything else must be
    // scan-side (pushed repetition filter, bloom probe) or broadcast
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(main).size
    assert(exchanges == 2,
      s"expected exactly 2 hash exchanges in the main chain, got $exchanges:\n$main")
    assert(!main.contains("SinglePartition") &&
      !main.contains("SortMergeJoin"), main)
    // the repetition keep-predicate reaches the parquet scan as a data
    // filter — the corpus is pruned before anything else touches it
    assert(main.linesIterator.exists(l =>
      l.contains("DataFilters") && l.contains("graft_rep_keep")), main)
    // the bloom probe sits under (prints after) the verify semi-join
    val probeAt = main.indexOf("graft_bloom_contains")
    val joinAt = main.indexOf("LeftSemi")
    assert(probeAt >= 0 && joinAt >= 0 && probeAt > joinAt, main)
    // the cap runs the two-phase WindowGroupLimit (partial before the
    // exchange) — a mega-lang cannot materialize on one partition
    assert(main.contains("WindowGroupLimit") && main.contains("Partial"),
      main)
    capped
  }

  test("q_train_layout shuffle budget holds under the sf1 bench build " +
      "(r17): 50 row-group files instead of one — partition counts " +
      "change, the budget must not") {
    assume(new java.io.File("/tmp/sf1/documents.parquet").exists(),
      "/tmp/sf1 bench dataset not built (tools/make_sf1.py)")
    val before = graft.util.CacheHygiene.snapshot(spark)
    try assertTrainLayoutBudget("/tmp/sf1")
    finally graft.util.CacheHygiene.releaseNew(spark, before)
  }

  test("q_train_layout composition keeps the documented shuffle budget " +
      "(r16): pushed quality filter, scan-side bloom, 2 exchanges before " +
      "the epoch shuffle") {
    val before = graft.util.CacheHygiene.snapshot(spark)
    try {
      val capped = assertTrainLayoutBudget(sf)
      // end-to-end: gather emits exactly-64-token sequences except the
      // corpus tail, contiguous seq_ids, and total tokens add up
      val shuffled = graft.ops.Sampling.shufflePositions(capped, "doc_id")
      val chunks = graft.text.Chunker.chunk(shuffled, "shuffle_pos",
          "text", chunkTokens = 6, overlapTokens = 2)
        .select((col("shuffle_pos") * 1000000L + col("chunk_id"))
          .as("chunk_key"), split(col("chunk_text"), " ").as("toks"))
      val seqs = graft.plans.SequencePacking
        .gather(chunks, "chunk_key", "toks", window = 64)
        .orderBy("seq_id").collect()
      assert(seqs.nonEmpty)
      assert(seqs.map(_.getLong(0)).toSeq == (0L until seqs.length).toSeq,
        "seq_ids must be contiguous from 0")
      seqs.init.foreach(r => assert(r.getLong(1) == 64L,
        s"non-tail sequence ${r.getLong(0)} must be exactly 64 tokens"))
      val chunkTokens = chunks.select(sum(size(col("toks")))).head().getLong(0)
      assert(seqs.map(_.getLong(1)).sum == chunkTokens,
        "packed tokens must equal the chunk stream's total")
    } finally graft.util.CacheHygiene.releaseNew(spark, before)
  }
}
