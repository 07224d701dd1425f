package graft

import org.apache.spark.sql.functions._
import graft.ops.MissingValues
import graft.plans.PartitionedFill

class PartitionedFillSpec extends SparkSpec {
  import spark.implicits._

  /** Every fill stages its sorted RDD (caller-unpersists contract) — sweep
    * so persisted storage can't accumulate across the suite JVM. */
  private def sweeping[A](f: => A): A = {
    val before = graft.util.CacheHygiene.snapshot(spark)
    try f finally graft.util.CacheHygiene.releaseNew(spark, before)
  }

  // long null runs force carries across several partition boundaries; the
  // leading run checks the "no carry yet" seed; mixed types check the
  // generic row path
  private def frame = {
    val rows = (1 to 200).map { i =>
      val x: java.lang.Double = if (i <= 5 || i % 3 != 0) null else i.toDouble
      val s: String = if (i % 7 == 0) s"v$i" else null
      (i.toLong, x, s)
    }
    spark.createDataFrame(rows).toDF("id", "x", "s").repartition(6)
  }

  // coalesce(1) pins the op to its global-window branch so these tests
  // compare the two implementations (a multi-partition input now
  // auto-routes to PartitionedFill, which would be tautological here)
  private def windowed(forward: Boolean) =
    MissingValues(if (forward) "forward_fill" else "backward_fill",
      orderCol = Some("id"))(frame.coalesce(1)).df

  test("partitioned ffill matches the global-window fill exactly") {
    sweeping {
      val expect = windowed(forward = true).orderBy("id").collect()
      val got = PartitionedFill.ffill(frame, "id", numPartitions = 7)
        .orderBy("id").collect()
      assert(got.toSeq == expect.toSeq)
    }
  }

  test("partitioned bfill matches the global-window fill exactly") {
    sweeping {
      val expect = windowed(forward = false).orderBy("id").collect()
      val got = PartitionedFill.bfill(frame, "id", numPartitions = 7)
        .orderBy("id").collect()
      assert(got.toSeq == expect.toSeq)
    }
  }

  test("no single-partition exchange in the partitioned plan") {
    sweeping {
      val plan = PartitionedFill.ffill(frame, "id", numPartitions = 7)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SinglePartition"))
    }
  }

  test("the sorted stage is persisted DISK_ONLY once and sweepable") {
    import org.apache.spark.storage.StorageLevel
    val before = graft.util.CacheHygiene.snapshot(spark)
    val out = PartitionedFill.ffill(frame, "id", numPartitions = 7)
    val fresh = spark.sparkContext.getPersistentRDDs
      .filterNot { case (id, _) => before(id) }
    // exactly ONE staged intermediate (the sorted frame shared by both
    // passes), on disk only — never executor memory at corpus size
    assert(fresh.size == 1, s"expected 1 staged RDD, got ${fresh.size}")
    assert(fresh.values.head.getStorageLevel == StorageLevel.DISK_ONLY)
    out.count() // pass 2 consumes the staged copy
    assert(graft.util.CacheHygiene.releaseNew(spark, before) == 1)
    // result survives the sweep (lineage recompute)
    assert(out.orderBy("id").count() == 200)
  }

  test("fill op routes by partition count: window only when single-partition") {
    sweeping {
    val multi = MissingValues("forward_fill", orderCol = Some("id"))(frame).df
    assert(!multi.queryExecution.executedPlan.toString.contains("Window"))
    val single = MissingValues("forward_fill",
      orderCol = Some("id"))(frame.coalesce(1)).df
    assert(single.queryExecution.executedPlan.toString.contains("Window"))
    // routed result still equals the windowed result
    assert(multi.orderBy("id").collect().toSeq ==
      windowed(forward = true).orderBy("id").collect().toSeq)
    }
  }

  test("sequence packing equals the window prefix sum across partitionings") {
    import graft.plans.SequencePacking
    import org.apache.spark.sql.expressions.Window
    sweeping {
      val rnd = new scala.util.Random(11)
      val rows = (0 until 300).map { i =>
        val t: java.lang.Long =
          if (i % 37 == 0) null // null token counts read as 0
          else if (i % 23 == 0) 0L // empty docs occupy no tokens
          else rnd.nextInt(400).toLong
        (i.toLong, t)
      }
      val df = rows.toDF("id", "tok").repartition(7)
      val got = SequencePacking.plan(df, "id", "tok", window = 256,
        numPartitions = 5).orderBy("id").collect()
      // reference: single global window prefix sum (the shape the plan
      // exists to avoid at scale, but exact at test size)
      val w = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
      val expect = df
        .select($"id", coalesce($"tok", lit(0L)).as("n_tokens"))
        .withColumn("start_token", coalesce(sum("n_tokens").over(w), lit(0L)))
        .withColumn("seq_first", expr("start_token div 256"))
        .withColumn("seq_last",
          expr("(start_token + greatest(n_tokens, 1L) - 1L) div 256"))
        .orderBy("id").collect()
      assert(got.toSeq == expect.toSeq)
      // placement sanity: offsets are non-decreasing and gap-free
      val byId = got.map(r => (r.getLong(1), r.getLong(2)))
      byId.sliding(2).foreach { case Array((n, s), (_, s2)) =>
        assert(s2 == s + n, "offsets must tile exactly")
      case _ => ()
      }
    }
  }

  test("gather materializes exact window-token sequences in doc order " +
      "(r15)") {
    import graft.plans.SequencePacking
    sweeping {
      val rnd = new scala.util.Random(7)
      // tokens encode (docId, position) so reassembly order is checkable
      val docs = (0 until 120).map { i =>
        val n = if (i % 11 == 0) 0 else rnd.nextInt(40) + 1
        (i.toLong, (0 until n).map(j => s"d${i}p$j"))
      }
      val df = docs.toDF("id", "toks").repartition(5)
      val got = SequencePacking.gather(df, "id", "toks", window = 16,
        numPartitions = 4).orderBy("seq_id").collect()
      val flat = docs.sortBy(_._1).flatMap(_._2)
      val expectSeqs = flat.grouped(16).toSeq
      assert(got.length == expectSeqs.length)
      got.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(0) == i.toLong)
        val toks = r.getString(3).split(' ').toSeq
        assert(toks == expectSeqs(i),
          s"sequence $i must be the doc-order token stream slice")
        assert(r.getLong(1) == expectSeqs(i).size)
        // every sequence but the corpus tail is exactly window tokens
        if (i < expectSeqs.length - 1) assert(r.getLong(1) == 16L)
      }
      // token conservation: nothing dropped, nothing duplicated
      assert(got.map(_.getLong(1)).sum == flat.size.toLong)
      // n_docs counts contributing docs (empty docs excluded entirely)
      val nDocsTotal = got.map(_.getLong(2)).sum
      val nonEmpty = docs.count(_._2.nonEmpty)
      assert(nDocsTotal >= nonEmpty,
        "every non-empty doc contributes at least one piece")
    }
  }

  test("more partitions than rows degrades gracefully") {
    sweeping {
      val tiny = Seq[(java.lang.Long, java.lang.Double)]((1L, null), (2L, 5.0))
        .toDF("id", "x")
      val out = PartitionedFill.bfill(tiny, "id", numPartitions = 8)
        .orderBy("id").collect()
      assert(out.map(_.getDouble(1)).toSeq == Seq(5.0, 5.0))
    }
  }
}
