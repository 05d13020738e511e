package graft.northstar

import graft.functions.vectors
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale
  * path next to hyperplane LSH (SURVEY.md §7.4): a k-means coarse
  * quantizer partitions the corpus into cells; queries probe only the
  * `nProbe` cells whose centroids are most similar, so the search join
  * touches nProbe/nCells of the corpus instead of all of it.
  *
  * Training samples the corpus (k-means on the driver-managed MLlib path,
  * fixed seed); the resulting centroids are a small Array[Array[Float]]
  * broadcast into closed-form column expressions — assignment and probing
  * are pure per-row arithmetic over the codegen'd cosine kernel, no model
  * object at scan time. At 100 TB: train on a sample (KMeans scales
  * O(sample × k)), assignment is one narrow pass, the probe join shuffles
  * on cell id with per-cell fan-out bounded by cell balance.
  */
object Ivf {

  /** Auto-sampling sentinel for [[fitCentroids]]. */
  val AutoSample: Double = -1.0

  /** Training rows the auto sample targets per centroid (k-means needs a
    * stable coarse partition, not the full corpus — ~256 points/cell is
    * the standard IVF training budget).
    */
  val TrainRowsPerCell: Long = 256L

  /** Train the coarse quantizer: k-means centroids over a SAMPLE of the
    * corpus embedding column. Deterministic via fixed seed.
    *
    * By default the sample is bounded: min(1, nCells*256 / corpusRows) —
    * full-corpus k-means is a genuine scale hazard (MLlib iterates over
    * the whole training set nIter times), and quantizer quality saturates
    * at a few hundred points per cell. Pass an explicit `sampleFraction`
    * to override (1.0 = train on everything).
    */
  def fitCentroids(corpus: DataFrame, nCells: Int,
                   vecCol: String = "embedding",
                   sampleFraction: Double = AutoSample,
                   seed: Long = 42L): Array[Array[Float]] = {
    val fraction =
      if (sampleFraction > 0.0) sampleFraction
      else {
        val n = corpus.count()
        val target = nCells * TrainRowsPerCell
        if (n <= target) 1.0
        // 1.2× slack: Bernoulli sampling undershoots; k-means only needs
        // the order of magnitude right
        else math.min(1.0, 1.2 * target.toDouble / n)
      }
    val sampled = if (fraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, fraction, seed)
    val train = sampled.select(array_to_vector(col(vecCol)).as("features"))
    // 10 iterations: cell assignment only needs a stable coarse partition,
    // not converged centroids — recall is governed by nProbe
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(10)
      .fit(train)
    model.clusterCenters.map(_.toArray.map(_.toFloat))
  }

  /** Per-centroid cosine similarity as (sim, cellId) structs. */
  private def centroidSims(vec: Column,
                           centroids: Array[Array[Float]]): Seq[Column] =
    centroids.zipWithIndex.map { case (c, i) =>
      struct(vectors.vec_cosine(vec, typedLit(c.toSeq)).as("sim"),
             lit(i).as("cell"))
    }.toSeq

  /** Nearest-centroid cell id (struct max over per-centroid sims). */
  def cellOf(vec: Column, centroids: Array[Array[Float]]): Column =
    greatest(centroidSims(vec, centroids): _*).getField("cell")

  /** The `nProbe` nearest cell ids for a query vector, as an array to
    * explode: sort the (sim, cell) structs descending, take the heads.
    */
  def probeCells(vec: Column, centroids: Array[Array[Float]],
                 nProbe: Int): Column = {
    val sorted = array_sort(
      array(centroidSims(vec, centroids): _*),
      (l, r) => when(l.getField("sim") > r.getField("sim"), -1)
        .when(l.getField("sim") < r.getField("sim"), 1).otherwise(0))
    transform(slice(sorted, 1, nProbe), s => s.getField("cell"))
  }

  /** IVF top-k: corpus assigned to cells once, each query probes its
    * `nProbe` best cells, candidates ranked by exact cosine.
    * Output: (query_id, neighbor_id, rank).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              centroids: Array[Array[Float]], k: Int = 10, nProbe: Int = 3,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      cellOf(col(vecCol), centroids).as("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      explode(probeCells(col(vecCol), centroids, nProbe)).as("cell"))
    val scored = q.join(c, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        vectors.vec_cosine(col("qv"), col("cv")).as("sim"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }
}
