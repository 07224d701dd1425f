package graft

import org.apache.spark.sql.functions._

import graft.dedup.NearDup

/** Pins the `bucketBatches` staged-pair contract (r19 verdict #4 in
  * its r20 bucket-hash-slice form): the batched plan must return
  * EXACTLY the single-pass plan's pair set — same pairs, same jaccard
  * values — for every batch count, including slice counts that leave
  * some slices nearly empty. Slice outputs must also be DISJOINT (the
  * anti-join contract: the final union has no cross-batch distinct to
  * hide a double-verified pair). Also pins cache hygiene: the batched
  * path's localCheckpoint RDDs must be released once the result
  * materializes (only the returned result stays cached, per the
  * pair-operator contract). */
class BandBatchSpec extends SparkSpec {
  import spark.implicits._

  /** Synthetic corpus with planted near-dup families: base docs plus a
    * last-word-dropped mutation (the q_neardup_minhash construction)
    * and a verbatim copy — rich enough that pairs collide in MANY
    * bands (buckets hashing into several slices), which is exactly
    * what the cross-slice anti-join must keep single. */
  private lazy val corpus = {
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    val base = (0L until 60L).map { i =>
      val body = (0 until 12).map(j =>
        words(((i * 7 + j * 3) % words.size).toInt)).mkString(" ")
      (i, body)
    }
    val mutated = base.map { case (i, t) =>
      (i + 1000L, t.split(" ").dropRight(1).mkString(" ")) }
    val copies = base.take(20).map { case (i, t) => (i + 2000L, t) }
    (base ++ mutated ++ copies).toDF("doc_id", "text")
  }

  private def pairs(bucketBatches: Int): Seq[(Long, Long, Double)] = {
    val before = graft.util.CacheHygiene.snapshot(spark)
    val df = NearDup.minhashPairs(corpus, "text", "doc_id",
      threshold = 0.5, bucketBatches = bucketBatches)
    val got = df.select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    graft.util.CacheHygiene.releaseNew(spark, before)
    got
  }

  test("bucketBatches ∈ {2, 3, 16, 64} return the single-pass pair " +
      "set exactly — values included, duplicates impossible") {
    val single = pairs(1)
    assert(single.nonEmpty, "the planted corpus must produce pairs")
    // planted mutations and verbatim copies must be found at all
    assert(single.exists { case (a, b, _) => b == a + 1000L },
      "a last-word-dropped mutation should pair with its source")
    assert(single.exists { case (a, b, j) => b == a + 2000L && j == 1.0 },
      "a verbatim copy should pair at jaccard 1.0")
    for (n <- Seq(2, 3, 16, 64)) {
      val got = pairs(n)
      assert(got === single, s"bucketBatches=$n diverged from single-pass")
      // disjointness: the union carries no distinct, so any pair
      // verified in two slices would surface as a duplicate row here
      assert(got.map(p => (p._1, p._2)).distinct.size === got.size,
        s"bucketBatches=$n emitted a duplicate pair — slice anti-join broke")
    }
  }

  test("the batched path releases its checkpoint/staging storage — " +
      "only the returned result stays cached") {
    val before = graft.util.CacheHygiene.snapshot(spark)
    val df = NearDup.minhashPairs(corpus, "text", "doc_id",
      threshold = 0.5, bucketBatches = 4)
    df.count()
    val fresh = spark.sparkContext.getPersistentRDDs.keySet -- before
    // exactly the result cache survives (one RDD)
    assert(fresh.size == 1,
      s"expected only the result cache to remain, found ${fresh.size} new " +
        "persisted RDDs — a batch checkpoint or staging frame leaked")
    graft.util.CacheHygiene.releaseNew(spark, before)
  }

  test("bucketBatches outside [1, 4096] fails loudly") {
    intercept[IllegalArgumentException] {
      NearDup.minhashPairs(corpus, "text", "doc_id", bucketBatches = 0)
    }
    intercept[IllegalArgumentException] {
      NearDup.minhashPairs(corpus, "text", "doc_id", bucketBatches = 4097)
    }
  }

  /** Synthetic vectors with planted near-dup structure: 40 base unit
    * vectors, each with a close perturbation (cosine ≫ 0.95) and an
    * exact copy — mirrors the perturbed-corpus embedding scheme. */
  private lazy val vectors = {
    val rnd = new scala.util.Random(7L)
    def unit(): Array[Float] = {
      val v = Array.fill(16)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x * x.toDouble).sum).toFloat
      v.map(_ / n)
    }
    val base = (0L until 40L).map(i => (i, unit()))
    val near = base.map { case (i, v) =>
      (i + 1000L, v.zipWithIndex.map { case (x, j) =>
        x + (if (j == 0) 0.02f else 0f) }) }
    val copies = base.take(10).map { case (i, v) => (i + 2000L, v.clone()) }
    (base ++ near ++ copies).toDF("vec_id", "embedding")
  }

  test("embeddingPairs bucketBatches parity: slices return the " +
      "single-pass pair set exactly") {
    def run(n: Int): Seq[(Long, Long, Double)] = {
      val before = graft.util.CacheHygiene.snapshot(spark)
      val got = NearDup.embeddingPairs(vectors, "embedding", "vec_id",
        dim = 16, threshold = 0.95, planes = 32, bands = 4,
        bucketBatches = n)
        .select("id_a", "id_b", "cosine")
        .as[(Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
      graft.util.CacheHygiene.releaseNew(spark, before)
      got
    }
    val single = run(1)
    assert(single.exists { case (a, b, c) => b == a + 2000L && c == 1.0 },
      "an exact copy should pair at cosine 1.0")
    assert(single.exists { case (a, b, _) => b == a + 1000L },
      "a close perturbation should pair above threshold")
    for (n <- Seq(2, 5)) {
      val got = run(n)
      assert(got === single, s"embeddingPairs bucketBatches=$n diverged")
      assert(got.map(p => (p._1, p._2)).distinct.size === got.size,
        s"embeddingPairs bucketBatches=$n emitted a duplicate pair")
    }
  }

  test("autoPlanes: historical 32 planes at driver scales, wider bands " +
      "as the corpus grows, capped by the one-long signature") {
    assert(NearDup.autoPlanes(2020L, 4) === 32)   // 8 bits — unchanged
    assert(NearDup.autoPlanes(20000L, 4) === 36)  // 9 bits at 20k rows
    assert(NearDup.autoPlanes(200000L, 4) === 48) // 12 bits at 200k rows
    assert(NearDup.autoPlanes(1L << 40, 4) === 64) // capped at 16 bits
  }
}
