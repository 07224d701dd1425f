package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication for LLM training corpora (SURVEY.md §7.6; BASELINE.json
  * north star): exact, MinHash+LSH near-dup, SimHash, n-gram Jaccard.
  *
  * Scale shape: signatures are per-row column expressions (one projection,
  * no shuffle); LSH banding turns the all-pairs problem into a key-join on
  * (band, band-signature) — the only shuffles are the bucket join and the
  * final pair dedup, both linear in candidates, never O(n²) over the corpus.
  */
object NearDup {

  /** Normalized text: lowercase, whitespace collapsed. */
  def normalize(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** Exact-dup key: md5 of normalized text (same as
    * [[graft.text.TextAnalysis.fingerprint]]). */
  def exactKey(c: Column): Column = md5(normalize(c).cast(BinaryType))

  /** Exact dedup by content key, keeping the smallest id per group —
    * deterministic, unlike dropDuplicates on a subset. One hash shuffle. */
  def exactDedup(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(exactKey(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Distinct character k-shingles of the normalized text; empty array when
    * the text is shorter than k. */
  def shingles(c: Column, k: Int = 5): Column = {
    val n = normalize(c)
    when(length(n) >= k,
      array_distinct(transform(sequence(lit(1), length(n) - (k - 1)),
        i => substr(n, i, lit(k)))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Distinct word n-gram shingles — more discriminative than character
    * shingles on small-vocabulary text and ~10× smaller sets; the standard
    * choice for corpus-scale near-dup detection. */
  def wordShingles(c: Column, n: Int = 3): Column = {
    val toks = split(normalize(c), " ")
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n))))))
      .otherwise(array().cast(ArrayType(StringType)))
  }

  /** Exact Jaccard similarity of two shingle sets. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) > 0,
      size(array_intersect(a, b)).cast(DoubleType) / size(array_union(a, b)))

  /** MinHash signature positions from a pre-hashed shingle array. Hash
    * family i is xxhash64(shingleHash, i) — the shingle string is hashed
    * once, then each family member hashes the fixed-width (long, int)
    * pair: cheap, overflow-free (ANSI-safe: an affine a·h+b permutation
    * would throw ARITHMETIC_OVERFLOW under Spark 4's default ANSI mode),
    * and deterministic across runs and executors.
    *
    * IMPORTANT staging note: callers must materialize the shingle-hash
    * array in its OWN projection (see [[withMinhashSignature]]) — inlining
    * `shingles(c)` here would duplicate the whole shingle subtree into all
    * numHashes branches: 64× the work and a generated method too large to
    * JIT. CollapseProject keeps a multiply-referenced non-trivial alias in
    * its own stage, which is exactly what we exploit. */
  def minhashFromHashes(hashes: Column, numHashes: Int): Column =
    array((0 until numHashes).map { i =>
      array_min(transform(hashes, h => xxhash64(h, lit(i))))
    }: _*)

  /** df + `sigCol` (array of numHashes minima) + `shCol` (distinct shingle
    * set), staged as: shingles → hashes → signature, one projection each. */
  def withMinhashSignature(df: DataFrame, textCol: String,
      sigCol: String, shCol: String,
      numHashes: Int = 64, k: Int = 5): DataFrame =
    df.withColumn(shCol, shingles(col(textCol), k))
      .withColumn("__mh_hashes", transform(col(shCol), s => xxhash64(s)))
      .withColumn(sigCol, minhashFromHashes(col("__mh_hashes"), numHashes))
      .drop("__mh_hashes")

  /** MinHash-LSH candidate pairs with exact-Jaccard verification.
    * Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    *
    * banding: signature split into `bands` rows of `numHashes/bands`; any
    * equal band → candidate. Bucket join shuffles candidates only; the
    * exact verification joins the two shingle sets back by id (broadcast
    * when small, hash join at scale).
    */
  /** One-permutation-hashing signatures (Li/Owen/Zhang 2012 shape): each
    * shingle is hashed ONCE, bucketed by h mod numHashes, min per bucket —
    * O(shingles) work instead of O(numHashes·shingles), as an explode →
    * two-level aggregation (map-side partial min), fully distributed.
    * Empty buckets are densified with xxhash64(overallMin, bucket): doc-
    * dependent (no spurious cross-doc matches) yet equal for docs sharing
    * their overall min (preserves the similarity signal). */
  def ophSignatures(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int, k: Int,
      shingleFn: (Column, Int) => Column = wordShingles): DataFrame = {
    val base = df.select(col(idCol).as("__id"),
      shingleFn(col(textCol), k).as("__sh"))
    val ex = base.select(col("__id"),
      explode(transform(col("__sh"), s => xxhash64(s))).as("h"))
    val mins = ex.groupBy(col("__id"),
      pmod(col("h"), lit(numHashes.toLong)).cast(IntegerType).as("b"))
      .agg(min("h").as("m"))
    mins.groupBy("__id").agg(
      map_from_entries(collect_list(struct(col("b"), col("m")))).as("mm"),
      min("m").as("overall"))
      .select(col("__id"),
        transform(sequence(lit(0), lit(numHashes - 1)),
          i => coalesce(element_at(col("mm"), i),
            xxhash64(col("overall"), i))).as("__sig"))
      .join(base, "__id")
  }

  def minhashPairs(df: DataFrame, textCol: String, idCol: String,
      numHashes: Int = 64, bands: Int = 16, k: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0)
    val r = numHashes / bands
    val sigDf = ophSignatures(df, textCol, idCol, numHashes, k)
      .select("__id", "__sig", "__sh").cache()
    val buckets = sigDf.select(col("__id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), slice(col("__sig"), b * r + 1, r).as("bits"))): _*))
        .as("__bucket"))
    val a = buckets.select(col("__bucket").as("ka"), col("__id").as("id_a"))
    val b = buckets.select(col("__bucket").as("kb"), col("__id").as("id_b"))
    // a pair can collide in many bands — dedup BEFORE any similarity work
    val pairs = a.join(b, col("ka") === col("kb") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // cheap signature-agreement estimate (64 long compares) prunes the
    // candidate mass before the exact set-intersection verification;
    // estimator std at 64 samples ≈ 0.06, so a 0.15 margin keeps true
    // borderline pairs for the exact check
    val withSig = pairs
      .join(sigDf.select(col("__id").as("id_a"), col("__sig").as("sig_a"),
        col("__sh").as("sh_a")), "id_a")
      .join(sigDf.select(col("__id").as("id_b"), col("__sig").as("sig_b"),
        col("__sh").as("sh_b")), "id_b")
    val est = aggregate(zip_with(col("sig_a"), col("sig_b"),
      (x, y) => when(x === y, 1).otherwise(0)), lit(0), (acc, x) => acc + x)
      .cast(DoubleType) / numHashes
    withSig.where(est >= threshold - 0.15)
      .select(col("id_a"), col("id_b"),
        jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over whitespace tokens: bit b is set when the sum of
    * ±1 votes (token hash bit b) is positive. Near-dups differ in few bits
    * (compare with Hamming distance via bit_count(a ^ b)). */
  def simhash(c: Column): Column = {
    val toks = split(normalize(c), " ")
    val votes = aggregate(toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, i) => a + when(call_function("shiftright", h, i)
            .bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      })
    aggregate(zip_with(votes, sequence(lit(0), lit(63)),
      (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(0L)),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /** Embedding near-dup: pairs whose cosine ≥ threshold, via hyperplane-LSH
    * banding (no all-pairs scan). */
  def embeddingPairs(df: DataFrame, vecCol: String, idCol: String,
      dim: Int, threshold: Double = 0.95,
      planes: Int = 16, bands: Int = 4): DataFrame = {
    import graft.sim.Similarity._
    require(planes % bands == 0)
    val r = planes / bands
    val sigDf = df.select(col(idCol).as("__id"),
      toDoubleArr(col(vecCol)).as("__v"),
      signature(toDoubleArr(col(vecCol)), dim, planes).as("__sig"))
    val buckets = sigDf.withColumn("__band",
      explode(array((0 until bands).map(lit): _*)))
      .withColumn("__bits",
        call_function("shiftright", col("__sig"), col("__band") * r)
          .bitwiseAND(lit((1L << r) - 1)))
    val a = buckets.select(col("__band").as("ba"), col("__bits").as("bia"),
      col("__id").as("id_a"), col("__v").as("va"))
    val b = buckets.select(col("__band").as("bb"), col("__bits").as("bib"),
      col("__id").as("id_b"), col("__v").as("vb"))
    a.join(b, col("ba") === col("bb") && col("bia") === col("bib") &&
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosine(col("va"), col("vb")), 6).as("cosine"))
      .where(col("cosine") >= threshold)
      .groupBy("id_a", "id_b").agg(max("cosine").as("cosine"))
  }
}
