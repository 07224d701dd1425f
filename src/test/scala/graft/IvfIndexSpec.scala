package graft

import org.apache.spark.sql.functions._

import graft.sim.Similarity

/** IVF index persistence (r13 verdict #5): fit once, save, reload, and
  * serve ANN queries from the loaded quantizer — Lloyd must not re-run
  * per call. Keyed by (corpus fingerprint, nlist, seed) so a changed
  * corpus or different build params can never be served by a stale
  * index. */
class IvfIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.load(spark, dir, "embeddings")
  private def scratch(tag: String): String =
    s"/tmp/graft_ivf_spec_${ProcessHandle.current().pid()}_$tag"

  test("save -> load roundtrips the index exactly") {
    val p = scratch("rt")
    val idx = Similarity.fitIvfIndex(emb, nlist = 8)
    Similarity.saveIvfIndex(spark, idx, p)
    val loaded = Similarity.loadIvfIndex(spark, p)
    assert(loaded.fingerprint == idx.fingerprint)
    assert(loaded.nlist == idx.nlist && loaded.seed == idx.seed)
    assert(loaded.centers.length == idx.centers.length)
    assert(loaded.centers.zip(idx.centers)
      .forall { case (a, b) => a.sameElements(b) })
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    ()
  }

  test("q_ann_ivf stays green through a save -> load cycle") {
    // the exact q_ann_ivf shape (nprobe == nlist => must equal exact
    // top-k), served from a persisted index instead of an inline fit
    val p = scratch("q")
    val idx = Similarity.fitIvfIndex(emb, nlist = 8)
    Similarity.saveIvfIndex(spark, idx, p)
    val loaded = Similarity.loadIvfIndex(spark, p)
    val q = emb.where(col("vec_id") < 5)
    val fresh = Similarity.ivfTopK(emb, q, 10, nlist = 8, nprobe = 8)
      .orderBy("query_id", "rank").collect().toSeq
    val served = Similarity.ivfTopK(emb, q, 10, nlist = 8, nprobe = 8,
        index = Some(loaded))
      .orderBy("query_id", "rank").collect().toSeq
    assert(fresh.nonEmpty && served == fresh)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
    ()
  }

  test("ivfIndexAt fits+saves on miss, LOADS on hit, refits on " +
      "fingerprint mismatch") {
    val p = scratch("cache")
    try {
      val built = Similarity.ivfIndexAt(emb, p, nlist = 8)
      // hit: the parquet files must be untouched by the second call
      def sig(): Seq[(String, Long)] = {
        val d = new java.io.File(p)
        d.listFiles().toSeq.filter(_.getName.startsWith("part-"))
          .map(f => f.getName -> f.lastModified()).sorted
      }
      val before = sig()
      val reused = Similarity.ivfIndexAt(emb, p, nlist = 8)
      assert(sig() == before, "a cache hit must not rewrite the index")
      assert(reused.fingerprint == built.fingerprint)
      assert(reused.centers.zip(built.centers)
        .forall { case (a, b) => a.sameElements(b) })
      // corpus change (simulated by poisoning the stored fingerprint):
      // the loaded key no longer matches -> refit + overwrite
      Similarity.saveIvfIndex(spark,
        built.copy(fingerprint = built.fingerprint + 1), p)
      val refit = Similarity.ivfIndexAt(emb, p, nlist = 8)
      assert(refit.fingerprint == built.fingerprint,
        "a stale index must be refit, not served")
      // different params on the same path must also refit
      val other = Similarity.ivfIndexAt(emb, p, nlist = 4)
      assert(other.nlist == 4 && other.centers.length <= 4)
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p))
      ()
    }
  }

  test("re-embedding the same ids moves the corpus fingerprint") {
    // same vec_id set, new vector content — the r14 advisory gap: an
    // id-only fingerprint would serve the stale quantizer after a
    // re-embed. The fingerprint hashes (id, embedding) so it must move.
    val reembedded = emb.withColumn("embedding",
      transform(col("embedding"), v => v * 2.0f))
    assert(Similarity.corpusFingerprint(reembedded) !=
      Similarity.corpusFingerprint(emb),
      "fingerprint must change when vectors change under the same ids")
    ()
  }

  test("mismatched explicit index is rejected, not silently used") {
    val idx = Similarity.fitIvfIndex(emb, nlist = 4)
    val q = emb.where(col("vec_id") < 2)
    intercept[IllegalArgumentException] {
      Similarity.ivfTopK(emb, q, 5, nlist = 8, nprobe = 8,
        index = Some(idx))
    }
    ()
  }
}
