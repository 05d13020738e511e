package graft

/** Shuffle-byte budgets for the contract's top shufflers (VERDICT r14
  * task 3): Bench records per-query shuffle bytes since r14, but nothing
  * FAILED when they grew — a plan regression that doubles shuffle volume
  * could ride three rounds before a judge diffed the numbers. Each query
  * here executes once untimed (artifact build / JIT / cache warm-up —
  * the same discipline as Bench's measurement window), then once
  * measured, and the per-execution shuffle-WRITE bytes must stay under a
  * pinned ceiling.
  *
  * Ceilings are calibrated at sf0.01 (the oracle scale; local[4], 4
  * shuffle partitions) at ~2–3× the values measured (2026-08-15; the
  * fingerprint family 2026-08-16) — generous
  * enough for compression/partitioning wobble, tight enough that a
  * shape regression (an unpushed filter, a lost semi-join cap, a raw
  * column riding a shuffle that used to ship digests) fails here first.
  * Measured baselines are recorded next to each ceiling; re-calibrate
  * deliberately when a query's output domain legitimately grows.
  */
class ShuffleBudgetSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.01"
  private val written = new java.util.concurrent.atomic.AtomicLong

  private lazy val listenerReady: Unit =
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null)
            written.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
        }
      })

  private def drain(): Unit =
    org.apache.spark.sql.graftbridge.Bridge.drainListenerBus(
      spark.sparkContext)

  /** Per-execution shuffle-write MiB of a contract query at sf0.01,
    * measured on the SECOND execution (the first warms artifacts and
    * codegen, and releases its persisted blocks, exactly like Bench's
    * window).
    */
  private def measuredMiB(name: String): Double = {
    listenerReady
    val fn = SparkEntry.queries(name)
    fn(spark, sf).count()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    drain()
    val w0 = written.get
    fn(spark, sf).count()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    drain()
    (written.get - w0) / 1048576.0
  }

  /** (query, ceiling MiB, measured-at-calibration MiB). The measured
    * column is documentation — the assertion is only the ceiling.
    */
  private val budgets: Seq[(String, Double, Double)] = Seq(
    // the winnow family ships (fingerprint, position) sketch rows — its
    // output domain — never raw text; the append/remove lifecycle rows
    // add the difference-rebuild exchange
    ("ns_winnow_pairs", 2.0, 0.813),
    ("ns_winnow_append", 2.0, 0.833),
    ("ns_winnow_remove", 3.0, 1.317),
    ("ns_winnow_incoming", 1.0, 0.340),
    // substring overlap ships capped (gram, doc, pos) buckets
    ("ns_substring_overlap", 2.5, 0.964),
    // as-of join shuffles both sides on the join key once
    ("x_asof_join", 1.5, 0.584),
    // LSH exhaustive ships RAW VECTORS through the bucket join — the
    // documented worst case the PQ family exists to avoid
    ("ns_knn_lsh_exhaustive", 1.5, 0.655),
    ("ns_neardup_collapse", 0.8, 0.244),
    ("ns_source_overlap", 1.5, 0.515),
    ("ns_mmr_ann", 1.5, 0.562),
    // the IVF-PQ family's whole point: probe shuffles ship m-byte codes,
    // not vectors — two orders of magnitude under the LSH-exhaustive row
    ("ns_knn_ivfpq", 0.05, 0.004),
    ("ns_knn_ivfpq_serve", 0.05, 0.009),
    // the hierarchical family (VERDICT r16 task 5): assignment is the
    // BROADCAST-relation join — the packed per-supercell relation
    // crosses as a broadcast, so the only data-sized exchanges are the
    // narrow (id, best) argmax agg and the id-keyed vector reattach;
    // a regression that ships the embedding (or the joined sub-matrix)
    // through the argmax sort, or loses the broadcast, lands here
    ("ns_knn_ivf_hier_exhaustive", 0.3, 0.141),
    ("ns_knn_ivf_hier_serve_exhaustive", 0.05, 0.006),
    ("ns_knn_ivfpq_hier_exhaustive", 0.3, 0.141),
    ("ns_knn_ivf_hier_recall", 0.3, 0.145),
    ("ns_knn_ivfpq_hier_recall", 0.3, 0.145),
    // the STORED-CELLS family (continuation (b)): same shape as the
    // hier rows plus one centroid-sized exchange — the per-supercell
    // packing of the parquet-backed cells relation (nCells rows, never
    // corpus rows); a regression that ships vectors through the argmax
    // sort, loses the relation broadcast, or lets the packing go
    // corpus-sized lands here
    ("ns_knn_ivf_stored_exhaustive", 0.05, 0.013),
    ("ns_knn_ivf_stored_serve_exhaustive", 0.05, 0.006),
    ("ns_knn_ivf_stored_recall", 0.05, 0.017),
    ("ns_knn_ivfpq_stored_exhaustive", 0.05, 0.013),
    ("ns_knn_ivfpq_stored_recall", 0.05, 0.017),
    // the perceptual-fingerprint dedup family (r20): every shuffled
    // row is an 8-byte sig + ids — pixels/samples never leave the
    // decode mapPartitions; the lifecycle rows serve from the STORED
    // (id, sig) artifact, so their steady-state exchange is the banded
    // candidate join alone. Ceilings at ~3x measured, the table's
    // convention (pass 3 tightened them from 16x): a lost bucket cap
    // or un-deduplicated banded join lands at ~10x measured, payload
    // bytes riding an exchange at ~100x — both must FAIL here, not
    // slip under a loose bound
    ("ns_imagedup_pairs", 0.1, 0.032),
    ("ns_imagedup_incoming", 0.1, 0.029),
    ("ns_imagedup_append", 0.1, 0.032),
    ("ns_imagedup_remove", 0.1, 0.031),
    ("ns_audiodup_pairs", 0.1, 0.031),
    // the fixed-pair hamming companion zips precomputed sigs — no
    // data-sized exchange at all; any measurable shuffle is a shape
    // regression
    ("ns_audiodup_hamming", 0.05, 0.000),
  )

  budgets.foreach { case (name, ceilMiB, _) =>
    test(f"$name shuffle-write <= $ceilMiB%.2f MiB at sf0.01") {
      val got = measuredMiB(name)
      info(f"$name measured $got%.3f MiB (ceiling $ceilMiB%.2f)")
      assert(got <= ceilMiB,
        f"$name shuffled $got%.3f MiB, budget $ceilMiB%.2f MiB — a plan " +
          "regression (unpushed filter / lost cap / raw columns riding " +
          "a shuffle) or a deliberate output-domain growth; re-calibrate " +
          "only for the latter")
    }
  }
}
