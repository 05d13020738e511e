package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Primitive float-vector kernels. Public static-style methods so generated
  * code can call them directly (the StaticInvoke pattern): the whole
  * similarity expression stays inside whole-stage codegen with one tight
  * primitive loop per row — no boxed lambdas, no per-element virtual
  * dispatch like the equivalent zip_with/aggregate higher-order chain.
  */
object VecOps {

  /** Loud length check for the pairwise kernels: math.min truncation
    * scored the shared prefix of mismatched vectors — a 384-dim probe
    * against 768-dim embeddings returned PLAUSIBLE cosines with no
    * signal (code-review r14), while the PQ/centroid kernels throw a
    * descriptive shape error for exactly this class of mistake.
    */
  private def checkSameDim(a: ArrayData, b: ArrayData, what: String): Int = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"$what dimension mismatch: $n vs ${b.numElements()} — the " +
          "operands come from different embedding models or a truncated " +
          "column, and a prefix score would be silently wrong")
    n
  }

  /** Single-pass dot + norms → cosine; 0.0 when either norm is 0. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = checkSameDim(a, b, "cosine")
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0.0) 0.0 else dot / d
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = checkSameDim(a, b, "dot")
    var s = 0.0; var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** splitmix64 — deterministic pseudo-random hyperplane components.
    * Delegates to the ONE copy of the finalizer constants
    * (TextOps.mixSeed; mix64(x) ≡ mixSeed(x, 1) — the seed multiplies
    * the golden-ratio increment): hand-copied magic constants are the
    * drift class the kernelBuilders comment documents.
    */
  private def mix64(z0: Long): Long = TextOps.mixSeed(z0, 1L)

  /** Hyperplane component for (dim, plane, table) in [-1, 1). */
  def planeComponent(dim: Int, plane: Int, table: Int): Double =
    mix64(dim.toLong * 1000003L + plane.toLong * 10007L + table.toLong)
      .toDouble / Long.MaxValue.toDouble

  /** Plane-matrix cache: components depend only on (i, plane, table) —
    * fixed at plan time — but the splitmix chain used to be recomputed
    * PER ROW, roughly doubling the per-row cost of the LSH bucketing
    * hot path (dim × nPlanes × nTables mixes next to the same number of
    * multiply-adds that are the actual work). Volatile immutable
    * snapshot keyed by (nPlanes, nTables), rows grown to the largest
    * dim seen; concurrent tasks race only into a redundant recompute of
    * the same deterministic values.
    */
  @volatile private var planeCache: Map[(Int, Int), Array[Array[Double]]] =
    Map.empty

  private def planesFor(nPlanes: Int, nTables: Int,
                        dim: Int): Array[Array[Double]] = {
    if (nPlanes == 0) return Array.empty // exhaustive degenerate
    val key = (nPlanes, nTables)
    planeCache.get(key) match {
      case Some(m) if m(0).length >= dim => m
      case _ =>
        val width = math.max(dim, 64)
        val grown = Array.tabulate(nTables * nPlanes) { tp =>
          val t = tp / nPlanes; val p = tp % nPlanes
          Array.tabulate(width)(i => planeComponent(i, p, t))
        }
        planeCache = planeCache.updated(key, grown)
        grown
    }
  }

  /** Per-THREAD two-entry identity cache for the flattened-codebook
    * literal: the PQ kernels receive the codebook as a literal
    * array<float> child, and within one task the generated code passes
    * the SAME ArrayData object for every row — but reading it
    * element-by-element through getFloat on a GenericArrayData boxes
    * every access, so convert once per (thread, object). ThreadLocal,
    * not a JVM-global slot: concurrent tasks each deserialize their OWN
    * literal copy, so a shared slot would be overwritten by alternating
    * tasks on nearly every row. TWO entries, not one: when the probe
    * side is broadcast, pq_encode (corpus literal) and pq_adc_cosine
    * (its own literal from a second flatten) evaluate interleaved per
    * corpus row in ONE stage — a single slot would alternate-miss on
    * every row of the dominant candidate join.
    */
  private val cbCache =
    new ThreadLocal[Array[(AnyRef, Array[Float])]] {
      override def initialValue(): Array[(AnyRef, Array[Float])] =
        new Array[(AnyRef, Array[Float])](2)
    }

  private def cbArray(cb: ArrayData): Array[Float] = {
    val slots = cbCache.get()
    val s0 = slots(0)
    if (s0 != null && (s0._1 eq cb)) return s0._2
    val s1 = slots(1)
    if (s1 != null && (s1._1 eq cb)) {
      // promote to slot 0 so the most-recent two alternate cheaply
      slots(1) = s0; slots(0) = s1
      return s1._2
    }
    val arr = cb.toFloatArray()
    slots(1) = s0; slots(0) = (cb, arr)
    arr
  }

  /** Multi-probe LSH buckets (Lv et al. 2007, "Multi-Probe LSH" — public
    * knowledge): per table, the base bucket PLUS `nFlips` variants, each
    * flipping one of the planes with the smallest |margin| (a vector
    * near a hyperplane is nearly as likely to land on its other side,
    * so probing those neighbor buckets buys recall without more
    * tables). Deterministic: flip order is (|dot| asc, plane index asc).
    * QUERY-side kernel — the corpus keeps single-bucket assignment, so
    * the index is unchanged and the extra probes multiply only the
    * query-side join fan-out. nFlips is CLAMPED to nPlanes (there are
    * only nPlanes bits to flip), so the output stride is perTable =
    * 1 + min(nFlips, nPlanes): for each table t, position
    * [t·perTable] = base, then the flip variants.
    */
  def hyperplaneBucketsMultiprobe(v: ArrayData, nPlanes: Int, nTables: Int,
                                  nFlips: Int): ArrayData = {
    val dim = v.numElements()
    val planes = planesFor(nPlanes, nTables, dim)
    val flips = math.min(nFlips, nPlanes)
    val perTable = 1 + flips
    val out = new Array[Long](nTables * perTable)
    val dots = new Array[Double](math.max(nPlanes, 1))
    val order = new Array[Int](math.max(nPlanes, 1))
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        val row = planes(t * nPlanes + p)
        var d = 0.0
        var i = 0
        while (i < dim) { d += v.getFloat(i).toDouble * row(i); i += 1 }
        dots(p) = d
        if (d > 0) bucket |= (1L << p)
        p += 1
      }
      val tag = t.toLong << 32
      out(t * perTable) = bucket | tag
      if (flips > 0) {
        // selection sort of the first `flips` positions by (|dot|, p) —
        // nPlanes is tiny (<= 32), no allocation beyond the two
        // scratch arrays hoisted out of the loop
        p = 0
        while (p < nPlanes) { order(p) = p; p += 1 }
        var f = 0
        while (f < flips) {
          var best = f
          var j = f + 1
          while (j < nPlanes) {
            val a = math.abs(dots(order(j))); val b = math.abs(dots(order(best)))
            if (a < b || (a == b && order(j) < order(best))) best = j
            j += 1
          }
          val tmp = order(f); order(f) = order(best); order(best) = tmp
          out(t * perTable + 1 + f) = (bucket ^ (1L << order(f))) | tag
          f += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998 —
    * public knowledge) over ONE query's candidate pool: greedily pick k
    * candidates maximizing λ·rel(c) − (1−λ)·max_{s∈S} cos(c, s) — high
    * relevance, low redundancy against what is already selected. Input
    * is the per-query candidate array (id, rel, vector) SORTED by
    * (rel desc, id) by the caller so evaluation order is deterministic;
    * ties on the MMR score break to the earlier (higher-rel, lower-id)
    * candidate. O(k·n·dim): each selection updates every unselected
    * candidate's max-similarity-to-selected incrementally. The pool is
    * query-bounded (an ANN top-R), so the whole selection is in-row —
    * no shuffle beyond the pool's own grouping.
    * Returns the selected ids in selection order.
    */
  def mmrSelect(cands: ArrayData, k: Int, lambdaE4: Int): ArrayData = {
    val n = cands.numElements()
    val take = math.min(k, n)
    val ids = new Array[Long](n)
    val rel = new Array[Double](n)
    val vecs = new Array[ArrayData](n)
    val taken = new Array[Boolean](n)
    // per-candidate norms computed ONCE in the unpack pass (code-review
    // r18): the O(k·n·dim) update loop's fused cosine re-accumulated
    // both operands' norms on every pair — ~3 multiply-adds per element
    // where a dot plus two cached norms needs 1. Identical element-order
    // folds, so every returned value is bit-identical to the fused form
    // (the ns_mmr_relevance hash pin).
    val norm = new Array[Double](n)
    var i = 0
    while (i < n) {
      // null gate (code-review r18): a pool entry with a null id, rel,
      // or vector (a null-embedding corpus row can reach an
      // under-filled pool — the ranking window keeps null-sim rows when
      // the group is smaller than poolSize) used to read garbage 0.0
      // relevance via getDouble-on-null and then NPE in the executor at
      // the cosine; excluded up front instead — the kernel null-gate
      // convention
      if (cands.isNullAt(i)) taken(i) = true
      else {
        val row = cands.getStruct(i, 3)
        if (row.isNullAt(0) || row.isNullAt(1) || row.isNullAt(2))
          taken(i) = true
        else {
          ids(i) = row.getLong(0)
          rel(i) = row.getDouble(1)
          vecs(i) = row.getArray(2)
          val v = vecs(i)
          val d = v.numElements()
          var na = 0.0
          var j = 0
          while (j < d) {
            val x = v.getFloat(j).toDouble; na += x * x; j += 1
          }
          norm(i) = math.sqrt(na)
        }
      }
      i += 1
    }
    val lam = lambdaE4 / 10000.0
    // -inf, not 0: cosine is signed, and clamping at 0 would erase the
    // diversity BONUS an anti-similar candidate earns (max(0, maxcos)
    // is not the Carbonell–Goldstein formula)
    val maxSim = Array.fill(n)(Double.NegativeInfinity)
    val out = new Array[Long](take)
    var s = 0
    while (s < take) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      i = 0
      while (i < n) {
        if (!taken(i)) {
          // first pick has an empty selected set: pure relevance. The
          // lam >= 1 arm is NOT just an optimization: with the skipped
          // update loop maxSim stays -inf, and 0.0 · -inf is NaN.
          // maxSim still -inf AFTER a selection means every cosine
          // against the selected set was NaN (corrupt vector with a
          // finite rel) — score it NaN so it is disqualified, because
          // -(1-lam)·(-inf) = +inf would otherwise PROMOTE the corrupt
          // candidate to the very next pick (code-review r12)
          val score = if (s == 0 || lam >= 1.0) rel(i)
            else if (maxSim(i) == Double.NegativeInfinity) Double.NaN
            else lam * rel(i) - (1.0 - lam) * maxSim(i)
          // strict >: ties keep the EARLIEST candidate in the sorted
          // pool order (higher rel, then lower id)
          if (score > bestScore) { bestScore = score; best = i }
        }
        i += 1
      }
      // every remaining score NaN (corrupt embeddings): stop with what
      // is selected so far rather than indexing at -1 and killing the
      // task over one bad row
      if (best < 0)
        return new GenericArrayData(java.util.Arrays.copyOf(out, s))
      taken(best) = true
      out(s) = ids(best)
      // at lam = 1 the diversity term is weighted 0 — skip the
      // O(n·dim) cosine update entirely (the ns_mmr_relevance path)
      if (lam < 1.0) {
        val bv = vecs(best)
        val bn = norm(best)
        i = 0
        while (i < n) {
          if (!taken(i)) {
            val c = cosinePreNormed(vecs(i), norm(i), bv, bn)
            if (c > maxSim(i)) maxSim(i) = c
          }
          i += 1
        }
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** [[cosine]] with both norms precomputed — the [[mmrSelect]] hot
    * loop's form. Same dot fold and the same `sqrt(na)·sqrt(nb)`
    * product (the caller caches the sqrt'd norms), so results are
    * bit-identical to the fused cosine.
    */
  private def cosinePreNormed(a: ArrayData, na: Double,
                              b: ArrayData, nb: Double): Double = {
    val n = checkSameDim(a, b, "cosine")
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1
    }
    val d = na * nb
    if (d == 0.0) 0.0 else dot / d
  }

  /** Per-thread identity cache for long-array literals (the quantized JL
    * matrix), same rationale as [[cbArray]].
    */
  private val lqCache =
    new ThreadLocal[(AnyRef, Array[Long])] {
      override def initialValue(): (AnyRef, Array[Long]) = null
    }

  private def lqArray(w: ArrayData): Array[Long] = {
    val cached = lqCache.get()
    if (cached != null && (cached._1 eq w)) cached._2
    else {
      val arr = w.toLongArray()
      lqCache.set((w, arr))
      arr
    }
  }

  /** Quantized JL projection: all outDim integer dot products of the
    * 1e-4-grid-rounded vector against the flattened [outDim][dim]
    * integer matrix, in ONE pass (each element quantized once, then
    * multiply-added into every output accumulator). Quantization is
    * nearest-with-ties-away-from-zero — Math.round mirrored for
    * negatives — which equals Spark round()'s decimal HALF_UP on every
    * double (shortest-decimal ties coincide with binary ties; a
    * property test pins the identity against BigDecimal).
    */
  def jlProject(v: ArrayData, wq: ArrayData, outDim: Int,
                scale: Int): ArrayData = {
    val w = lqArray(wq)
    val dim = v.numElements()
    if (w.length != outDim * dim)
      throw new IllegalArgumentException(
        s"JL shape mismatch: vector dim $dim vs matrix of ${w.length} " +
          s"weights for outDim=$outDim (expected ${outDim * dim})")
    val out = new Array[Long](outDim)
    var i = 0
    while (i < dim) {
      val a = v.getFloat(i).toDouble * scale
      val q = if (a < 0) -Math.round(-a) else Math.round(a)
      var j = 0
      while (j < outDim) { out(j) += q * w(j * dim + i); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Loud shape check shared by the PQ kernels: a corpus whose dim
    * doesn't match the codebook's fit dim would otherwise read
    * misaligned sub-centroids — silent garbage codes for smaller dims,
    * an opaque AIOOBE for larger. One integer compare per row.
    */
  private def checkPqShape(dim: Int, m: Int, ksub: Int,
                           codeLen: Int): Int = {
    val sub = dim / m
    if (dim % m != 0 || codeLen != m * ksub * sub)
      throw new IllegalArgumentException(
        s"PQ shape mismatch: vector dim $dim vs codebook of " +
          s"${codeLen} floats for m=$m, ksub=$ksub " +
          s"(expected ${m * ksub * (dim / m)}; was the codebook fit on " +
          "a different embedding dim?)")
    sub
  }

  /** Product-quantization encode: the vector split into m contiguous
    * subspaces, each mapped to the index of its nearest sub-centroid
    * (squared L2; ties to the LOWEST code via strict <). `cb` is the
    * flattened [m][ksub][dim/m] codebook. Output: m codes in [0, ksub).
    */
  def pqEncode(v: ArrayData, cb: ArrayData, m: Int, ksub: Int): ArrayData = {
    val code = cbArray(cb)
    val dim = v.numElements()
    val sub = checkPqShape(dim, m, ksub, code.length)
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0; var bd = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * sub
        var d = 0.0
        var i = 0
        while (i < sub) {
          val diff = v.getFloat(j * sub + i).toDouble - code(base + i).toDouble
          d += diff * diff
          i += 1
        }
        if (d < bd) { bd = d; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance cosine: the query vector against the PQ
    * RECONSTRUCTION of a corpus row (its per-subspace sub-centroids),
    * in one pass — dot and both norms accumulated subspace-by-subspace,
    * identical fold order to [[cosine]] on the reconstructed vector.
    * The corpus side ships only its m codes (4m bytes vs 4·dim for the
    * raw embedding), which is the point: at 100 TB the candidate join
    * shuffles codes, never vectors.
    */
  def pqAdcCosine(q: ArrayData, codes: ArrayData, cb: ArrayData,
                  m: Int, ksub: Int): Double = {
    val code = cbArray(cb)
    // m comes from the CODEBOOK (plan-time constant), not from the codes
    // row: checkPqShape alone cannot catch a codes/codebook m mismatch
    // because codeLen == m·ksub·(dim/m) = ksub·dim for EVERY m dividing
    // dim — serving m=4 codes against an m=8 codebook would silently
    // read misaligned sub-centroids that stay in bounds
    if (codes.numElements() != m)
      throw new IllegalArgumentException(
        s"PQ shape mismatch: ${codes.numElements()} codes per row vs " +
          s"codebook fit with m=$m subspaces (index built under a " +
          "different codebook?)")
    val dim = q.numElements()
    val sub = checkPqShape(dim, m, ksub, code.length)
    var dot = 0.0; var nq = 0.0; var nr = 0.0
    var j = 0
    while (j < m) {
      // range-check the code against ksub (code-review r18): the shape
      // checks above cannot catch codes from a WIDER codebook (an index
      // dumped at ksub=512 probed against a retrained ksub=256 fit) —
      // the offset stays in bounds for all but the last subspace,
      // silently reading subspace j+1's centroids as plausible-but-
      // wrong cosines. One int compare per subspace, off the
      // per-element hot path.
      val cj = codes.getInt(j)
      if (cj < 0 || cj >= ksub)
        throw new IllegalArgumentException(
          s"PQ code $cj out of range for ksub=$ksub (subspace $j) — " +
            "the codes were produced under a different codebook; " +
            "re-encode the index or load the matching codebook")
      val base = (j * ksub + cj) * sub
      var i = 0
      while (i < sub) {
        val x = q.getFloat(j * sub + i).toDouble
        val y = code(base + i).toDouble
        dot += x * y; nq += x * x; nr += y * y
        i += 1
      }
      j += 1
    }
    val d = math.sqrt(nq) * math.sqrt(nr)
    if (d == 0.0) 0.0 else dot / d
  }

  /** Per-thread single-slot cache of (centroid literal, floats, per-
    * centroid sqrt-norms): its OWN slot, not [[cbCache]] — an IVF-PQ
    * assignment stage evaluates nearest_cells AND pq_encode per corpus
    * row, so sharing the two-entry codebook cache would alternate-miss
    * on every row. SOFT reference, unlike the KB-sized codebook slots:
    * a 4096-cell × 1024-dim centroid set is ~16 MB per executor
    * thread, which must not stay pinned for the thread's lifetime
    * after the query completes (code-review r14) — under memory
    * pressure the slot clears and the next row re-converts.
    */
  private val centCache = new ThreadLocal[
      java.lang.ref.SoftReference[(AnyRef, Array[Float], Array[Double])]] {
    override def initialValue()
        : java.lang.ref.SoftReference[(AnyRef, Array[Float], Array[Double])] =
      null
  }

  private def centArrays(cents: ArrayData,
                         nCells: Int): (Array[Float], Array[Double]) = {
    val ref = centCache.get()
    val cached = if (ref == null) null else ref.get()
    if (cached != null && (cached._1 eq cents)) (cached._2, cached._3)
    else {
      val arr = cents.toFloatArray()
      require(arr.length % nCells == 0,
        s"centroid literal of ${arr.length} floats does not divide into " +
          s"$nCells cells")
      val dim = arr.length / nCells
      // per-centroid sqrt(Σy²), accumulated in ascending-i order —
      // identical to the nb fold inside [[cosine]], so hoisting it out
      // of the per-row loop cannot move a single bit
      val norms = new Array[Double](nCells)
      var c = 0
      while (c < nCells) {
        var nb = 0.0
        var i = 0
        while (i < dim) {
          val y = arr(c * dim + i).toDouble
          nb += y * y
          i += 1
        }
        norms(c) = math.sqrt(nb)
        c += 1
      }
      centCache.set(
        new java.lang.ref.SoftReference((cents: AnyRef, arr, norms)))
      (arr, norms)
    }
  }

  /** Spark SQL's double ordering (SQLOrderingUtil.compareDoubles): ±0.0
    * compare equal, NaN greater than everything including itself-as-
    * equal — the ordering `greatest()` and `array_sort()` apply, which
    * [[nearestCells]] must reproduce exactly to keep kernel == compose
    * form on corrupt (NaN) and zero vectors.
    */
  private def cmpSql(x: Double, y: Double): Int =
    if (x == y) 0 else java.lang.Double.compare(x, y)

  /** The `nProbe` nearest centroids of `v` by cosine, ordered (sim desc,
    * cell desc) — the ONE fused pass that replaces an nCells-arm
    * `greatest(struct(cosine, cell)...)` / `array_sort` expression tree:
    * the query norm is computed once (the compose form re-accumulated it
    * per centroid), centroid norms come from the per-literal cache, and
    * per-centroid arithmetic replays [[cosine]]'s fold order bit-for-bit
    * so assignments cannot drift from the pre-kernel plans. Ties break
    * to the HIGHER cell (the duplicate-centroid contract — see
    * Ivf.probeCells). `cents` is the flattened [nCells][dim] literal.
    */
  def nearestCells(v: ArrayData, cents: ArrayData, nCells: Int,
                   nProbe: Int): ArrayData = {
    val (arr, norms) = centArrays(cents, nCells)
    val dim = v.numElements()
    if (arr.length != nCells * dim)
      throw new IllegalArgumentException(
        s"centroid shape mismatch: vector dim $dim vs ${arr.length} " +
          s"centroid floats for nCells=$nCells (expected ${nCells * dim}; " +
          "were the centroids fit on a different embedding dim?)")
    var na = 0.0
    var i = 0
    while (i < dim) {
      val x = v.getFloat(i).toDouble
      na += x * x
      i += 1
    }
    val sqna = math.sqrt(na)
    val sims = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      var dot = 0.0
      var ii = 0
      val base = c * dim
      while (ii < dim) {
        dot += v.getFloat(ii).toDouble * arr(base + ii).toDouble
        ii += 1
      }
      val d = sqna * norms(c)
      sims(c) = if (d == 0.0) 0.0 else dot / d
      c += 1
    }
    // indices ARE the cell ids here, so identity is the tie-break id
    new GenericArrayData(
      selectTop(sims, c2 => c2, math.min(nProbe, nCells)))
  }

  /** Bounded partial selection shared by [[nearestCells]] and
    * [[topCellsIn]] — best→worst under the total order (sim via
    * [[cmpSql]], ties → HIGHER tie id; ids are distinct ints so the
    * top-`take` is unique): one pass, each candidate compared against
    * the current worst and inserted by shifting — O(n + hits·take)
    * instead of the naive repeated-scan O(n·take), which at the
    * 4096-cell/64-probe auto ceiling rivaled the similarity pass
    * itself (code-review r14). ONE definition (code-review r18): the
    * loop existed verbatim in both kernels, and a tie-break or
    * NaN-ordering fix landing in one copy would silently split the
    * batch and streaming probes' cell ordering. Returns INDICES into
    * `sims`, best first; callers pass take <= sims.length.
    */
  private def selectTop(sims: Array[Double], tieId: Int => Int,
                        take: Int): Array[Int] = {
    def better(a: Int, b: Int): Boolean = {
      val cmp = cmpSql(sims(a), sims(b))
      cmp > 0 || (cmp == 0 && tieId(a) > tieId(b))
    }
    val out = new Array[Int](take)
    var size = 0
    var c = 0
    while (c < sims.length) {
      if (size < take || better(c, out(size - 1))) {
        var i = if (size < take) { size += 1; size - 1 } else take - 1
        while (i > 0 && better(c, out(i - 1))) { out(i) = out(i - 1); i -= 1 }
        out(i) = c
      }
      c += 1
    }
    out
  }

  /** Best (cosine, cell) of `v` among a PACKED per-row centroid group:
    * `flat` is the [n][dim] flattened sub-matrix of one supercell's
    * centroids and `cells` their global cell ids (Ivf's hierarchical
    * broadcast relation). Unlike [[nearestCells]] the matrix is PER-ROW
    * JOIN DATA, not a plan literal, so there is no identity cache —
    * norms are accumulated inline, one pass, no allocation beyond the
    * 2-field result. Arithmetic replays [[cosine]]'s fold order
    * bit-for-bit and ties break to the HIGHER cell, so a fold over
    * groups (`max` on the (sim, cell) struct — Spark's nan-safe double
    * ordering is exactly [[cmpSql]]) reproduces [[nearestCells]]'
    * argmax over the union of the groups.
    */
  def bestCellIn(v: ArrayData, flat: ArrayData,
                 cells: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val dim = v.numElements()
    val nc = cells.numElements()
    if (flat.numElements() != nc * dim)
      throw new IllegalArgumentException(
        s"packed centroid shape mismatch: vector dim $dim vs " +
          s"${flat.numElements()} floats for $nc cells (expected " +
          s"${nc * dim}; were the centroids fit on a different dim?)")
    if (nc == 0) return null
    var na = 0.0
    var i = 0
    while (i < dim) {
      val x = v.getFloat(i).toDouble
      na += x * x
      i += 1
    }
    val sqna = math.sqrt(na)
    var bestSim = 0.0
    var bestCell = 0
    var first = true
    var c = 0
    while (c < nc) {
      var dot = 0.0
      var nb = 0.0
      var ii = 0
      val base = c * dim
      while (ii < dim) {
        val y = flat.getFloat(base + ii).toDouble
        dot += v.getFloat(ii).toDouble * y
        nb += y * y
        ii += 1
      }
      val d = sqna * math.sqrt(nb)
      val sim = if (d == 0.0) 0.0 else dot / d
      val cell = cells.getInt(c)
      val cmp = if (first) 1 else cmpSql(sim, bestSim)
      if (cmp > 0 || (cmp == 0 && cell > bestCell)) {
        bestSim = sim; bestCell = cell; first = false
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestSim, bestCell))
  }

  /** The top-`take` cells of `v` within a PACKED per-row centroid group
    * (the [[bestCellIn]] argmax generalized to a partial selection, the
    * [[nearestCells]] insertion loop over per-row join data): cosine
    * order, ties → HIGHER cell, best first. The stream-safe hierarchical
    * probe: per-supercell top-j needs no window, so an ingest screen can
    * bound its cell fan-out on an append-mode stream.
    */
  def topCellsIn(v: ArrayData, flat: ArrayData, cells: ArrayData,
                 take: Int): ArrayData = {
    val dim = v.numElements()
    val nc = cells.numElements()
    if (flat.numElements() != nc * dim)
      throw new IllegalArgumentException(
        s"packed centroid shape mismatch: vector dim $dim vs " +
          s"${flat.numElements()} floats for $nc cells (expected " +
          s"${nc * dim}; were the centroids fit on a different dim?)")
    var na = 0.0
    var i = 0
    while (i < dim) {
      val x = v.getFloat(i).toDouble
      na += x * x
      i += 1
    }
    val sqna = math.sqrt(na)
    val sims = new Array[Double](nc)
    val ids = new Array[Int](nc)
    var c = 0
    while (c < nc) {
      var dot = 0.0
      var nb = 0.0
      var ii = 0
      val base = c * dim
      while (ii < dim) {
        val y = flat.getFloat(base + ii).toDouble
        dot += v.getFloat(ii).toDouble * y
        nb += y * y
        ii += 1
      }
      val d = sqna * math.sqrt(nb)
      sims(c) = if (d == 0.0) 0.0 else dot / d
      ids(c) = cells.getInt(c)
      c += 1
    }
    // the shared bounded insertion selection; ties break on the GLOBAL
    // cell id, not the packed position
    new GenericArrayData(
      selectTop(sims, ids(_), math.min(take, nc)).map(ids(_)))
  }

  /** FLOAT plane rows for the sub-cell split family: the compose form
    * built each plane as `planeComponent(i, p, table).toFloat` inside a
    * typedLit, so the kernel must reproduce the float-rounded values —
    * [[planesFor]]'s double cache would differ in the low bits. Grown
    * volatile snapshot keyed by table (only the split family uses it
    * today, but the key keeps a second family from silently sharing
    * planes).
    */
  @volatile private var splitPlaneCache: Map[Int, Array[Array[Float]]] =
    Map.empty

  private def splitPlanesFor(nBits: Int, dim: Int,
                             table: Int): Array[Array[Float]] = {
    splitPlaneCache.get(table) match {
      case Some(m) if m.length >= nBits && m(0).length >= dim => m
      case _ =>
        val nb = math.max(nBits, 16)
        val w = math.max(dim, 64)
        val grown = Array.tabulate(nb)(p =>
          Array.tabulate(w)(i => planeComponent(i, p, table).toFloat))
        splitPlaneCache = splitPlaneCache.updated(table, grown)
        grown
    }
  }

  /** Sub-cell split bits for one (vector, cell) — the fused form of
    * Ivf.subcellOf's per-oversized-cell `when` chain (each arm a
    * vec_dot against a plane literal): 0 for cells not in the split
    * set; for an oversized cell, `bits(idx)` centroid-centered
    * hyperplane tests of the normalized vector against the driver-
    * computed thresholds. Arithmetic replays the compose form exactly:
    * float planes, dot folds ascending, the norm clamp is the SQL
    * greatest (NaN-largest), and the threshold compare uses Spark's
    * double ordering. `splitCells`/`bits` are parallel arrays;
    * `thrs` is flattened in the same order with per-entry offsets.
    */
  def subcellBits(v: ArrayData, cell: Int, splitCells: Array[Int],
                  bits: Array[Int], thrs: Array[Double],
                  table: Int): Long = {
    var idx = -1; var off = 0
    var j = 0
    while (j < splitCells.length && idx < 0) {
      if (splitCells(j) == cell) idx = j
      else { off += bits(j); j += 1 }
    }
    if (idx < 0) return 0L
    val nBits = bits(idx)
    val dim = v.numElements()
    var dvv = 0.0
    var i = 0
    while (i < dim) {
      val x = v.getFloat(i).toDouble
      dvv += x * x
      i += 1
    }
    val sq = math.sqrt(dvv)
    // greatest(sqrt, 1e-12) under SQL ordering: NaN is largest, so a
    // NaN norm stays NaN (and every threshold compare below then goes
    // through cmpSql with NaN-largest, as the compose form did)
    val nv = if (cmpSql(sq, 1e-12) >= 0) sq else 1e-12
    val planes = splitPlanesFor(nBits, dim, table)
    var out = 0L
    var p = 0
    while (p < nBits) {
      val row = planes(p)
      var d = 0.0
      i = 0
      while (i < dim) {
        d += v.getFloat(i).toDouble * row(i).toDouble
        i += 1
      }
      if (cmpSql(d / nv, thrs(off + p)) > 0) out |= (1L << p)
      p += 1
    }
    out
  }

  /** All nTables bucket ids for one vector: sign bits of nPlanes
    * hyperplane dot products per table, table id folded into bits 32+.
    * One pass over the vector per (table, plane), against the cached
    * plane matrix.
    */
  def hyperplaneBuckets(v: ArrayData, nPlanes: Int, nTables: Int): ArrayData =
    // nFlips = 0 degenerates multiprobe to exactly the base-bucket walk
    // (perTable = 1, out(t) = bucket | tag) — ONE copy of the per-table
    // sign-bit loop instead of two hand-synchronized ones, the drift
    // class the kernelBuilders comment documents (code-review r18); the
    // cost is the two tiny scratch arrays multiprobe hoists
    hyperplaneBucketsMultiprobe(v, nPlanes, nTables, nFlips = 0)
}

/** cosine(array<float>, array<float>) → double, codegen'd. */
case class FloatVecCosine(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.graftbridge.KernelInputTypes {
  // declared input types, not wrapper-enforced convention: the SQL
  // surface has no float-array literal (array(0.1,0.2) is
  // array<double>), and without coercion the kernel would reinterpret
  // 8-byte doubles as 4-byte floats — silent garbage cosines
  // (code-review r13); the analyzer now inserts the element cast
  override def kernelInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.cosine($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecCosine =
    copy(left = newLeft, right = newRight)
}

/** dot(array<float>, array<float>) → double, codegen'd. */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with org.apache.spark.sql.graftbridge.KernelInputTypes {
  override def kernelInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecOps.dot($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** lsh_buckets(array<float>) → array<long>: the nTables multi-table
  * hyperplane bucket ids (deterministic; see VecOps.planeComponent).
  */
case class HyperplaneBuckets(child: Expression, nPlanes: Int, nTables: Int)
    extends UnaryExpression with org.apache.spark.sql.graftbridge.KernelInputTypes {
  override def kernelInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  // plane bits live below bit 32 and the table id above: a 33rd plane
  // would silently flip apparent table ids and merge candidate sets
  // across tables. nPlanes = 0 is the legitimate exhaustive degenerate
  // (every vector lands in table-id-only buckets — lshTopK's
  // brute-force mode).
  require(nPlanes >= 0 && nPlanes <= 32,
    s"nPlanes must be in [0, 32], got $nPlanes")
  require(nTables >= 1, s"nTables must be positive, got $nTables")
  // input: array<float>
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.hyperplaneBuckets(v.asInstanceOf[ArrayData], nPlanes, nTables)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      v => s"graft.functions.VecOps.hyperplaneBuckets($v, $nPlanes, $nTables)")
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBuckets =
    copy(child = newChild)
}

/** pq_encode(array<float>, codebook literal) → array<int>: per-subspace
  * nearest-sub-centroid codes (see VecOps.pqEncode). The codebook rides
  * as a literal child — part of the serialized plan, no broadcast, no
  * model state at scan time.
  */
case class PqEncode(left: Expression, right: Expression, m: Int, ksub: Int)
    extends BinaryExpression with org.apache.spark.sql.graftbridge.KernelInputTypes {
  require(m >= 1, s"m must be positive, got $m")
  require(ksub >= 1, s"ksub must be positive, got $ksub")
  // declared, not assumed (the FloatVecCosine r13 rationale): an
  // array<double> embedding column would otherwise reach getFloat
  // uncast and encode reinterpreted garbage that PASSES the shape
  // check — numElements is unchanged (code-review r14)
  override def kernelInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any, cb: Any): Any =
    VecOps.pqEncode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      m, ksub)
  // summary rendering — the flattened codebook (m·ksub·dim/m floats)
  // otherwise rides verbatim in every plan string (the NearestCells
  // rationale)
  override def toString: String =
    s"pq_encode($left, <codebook m=$m ksub=$ksub>)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, cb) => s"graft.functions.VecOps.pqEncode($v, $cb, $m, $ksub)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(left = newLeft, right = newRight)
}

/** pq_adc_cosine(query array<float>, codes array<int>, codebook literal)
  * → double: cosine of the query against the PQ reconstruction (see
  * VecOps.pqAdcCosine).
  */
case class PqAdcCosine(first: Expression, second: Expression,
                       third: Expression, m: Int, ksub: Int)
    extends TernaryExpression with org.apache.spark.sql.graftbridge.KernelInputTypes {
  require(m >= 1, s"m must be positive, got $m")
  require(ksub >= 1, s"ksub must be positive, got $ksub")
  // query vector and codebook coerce like PqEncode; codes coerce to
  // array<int> (a bigint codes column from an external dump would
  // otherwise be read with getInt at the wrong stride)
  override def kernelInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(IntegerType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(q: Any, codes: Any, cb: Any): Any =
    VecOps.pqAdcCosine(q.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData], m, ksub)
  override def toString: String =
    s"pq_adc_cosine($first, $second, <codebook m=$m ksub=$ksub>)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (q, codes, cb) =>
      s"graft.functions.VecOps.pqAdcCosine($q, $codes, $cb, $m, $ksub)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): PqAdcCosine =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** nearest_cells(array<float>, centroids literal) → array<int>: the
  * nProbe nearest centroids by cosine, ordered (sim desc, cell desc) —
  * see VecOps.nearestCells. The flattened [nCells][dim] centroid matrix
  * rides as a literal child (the PqEncode convention): part of the
  * serialized plan, converted + norm-precomputed once per (thread,
  * object). nProbe = 1 is cell assignment (element 0).
  */
case class NearestCells(left: Expression, right: Expression, nCells: Int,
                        nProbe: Int)
    extends BinaryExpression with org.apache.spark.sql.graftbridge.KernelInputTypes {
  require(nCells >= 1, s"nCells must be positive, got $nCells")
  require(nProbe >= 1, s"nProbe must be positive, got $nProbe")
  override def kernelInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any, cents: Any): Any =
    VecOps.nearestCells(v.asInstanceOf[ArrayData],
      cents.asInstanceOf[ArrayData], nCells, nProbe)
  // render the centroid literal as a summary: the default toString
  // dumps every float into plan strings/logs — megabytes per plan line
  // at the 4096-cell auto ceiling, making .explain unreadable
  override def toString: String =
    s"nearestcells($left, <centroids x$nCells>, nProbe=$nProbe)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.VecOps.nearestCells($v, $c, $nCells, $nProbe)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCells =
    copy(left = newLeft, right = newRight)
}

/** best_cell_in(array<float>, flat array<float>, cells array<int>) →
  * struct<sim double, cell int>: argmax cosine over a PACKED per-row
  * centroid group (see VecOps.bestCellIn). The hierarchical-IVF
  * assignment kernel: the centroid matrix arrives as broadcast-join DATA
  * (one packed row per supercell), so the join fan-out is superProbe
  * rows per input instead of superProbe × cells-per-supercell, and the
  * inner argmax loop stays primitive inside whole-stage codegen.
  */
case class BestCellIn(first: Expression, second: Expression,
                      third: Expression)
    extends TernaryExpression with org.apache.spark.sql.graftbridge.KernelInputTypes {
  override def kernelInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType), ArrayType(IntegerType))
  override def dataType: DataType = StructType(Seq(
    StructField("sim", DoubleType, nullable = false),
    StructField("cell", IntegerType, nullable = false)))
  // nc == 0 returns null (an empty packed group has no argmax)
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any, flat: Any, cells: Any): Any =
    VecOps.bestCellIn(v.asInstanceOf[ArrayData], flat.asInstanceOf[ArrayData],
      cells.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, flat, cells) => {
      s"""
         |${ev.value} = graft.functions.VecOps.bestCellIn($v, $flat, $cells);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): BestCellIn =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** top_cells_in(array<float>, flat array<float>, cells array<int>) →
  * array<int>: the top-`take` cells by cosine within a PACKED per-row
  * centroid group, best first (see VecOps.topCellsIn). The window-free
  * hierarchical probe for append-mode streams.
  */
case class TopCellsIn(first: Expression, second: Expression,
                      third: Expression, take: Int)
    extends TernaryExpression with org.apache.spark.sql.graftbridge.KernelInputTypes {
  require(take >= 1, s"take must be positive, got $take")
  override def kernelInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType), ArrayType(IntegerType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any, flat: Any, cells: Any): Any =
    VecOps.topCellsIn(v.asInstanceOf[ArrayData], flat.asInstanceOf[ArrayData],
      cells.asInstanceOf[ArrayData], take)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, flat, cells) =>
      s"graft.functions.VecOps.topCellsIn($v, $flat, $cells, $take)")
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): TopCellsIn =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** subcell_bits(array<float>, cell int) → long: the mega-cell secondary
  * split key (see VecOps.subcellBits). The split policy — which cells,
  * how many bits, the centroid-centered thresholds — is driver-derived
  * plan data riding as referenced objects; only vector and cell id are
  * per-row inputs. Replaces a per-oversized-cell `when` chain whose arm
  * count grew with corpus skew.
  */
case class SubcellBits(left: Expression, right: Expression,
                       splitCells: Array[Int], bits: Array[Int],
                       thresholds: Array[Double], table: Int)
    extends BinaryExpression with org.apache.spark.sql.graftbridge.KernelInputTypes {
  require(splitCells.length == bits.length,
    s"splitCells/bits length mismatch: ${splitCells.length} vs ${bits.length}")
  require(thresholds.length == bits.sum,
    s"thresholds length ${thresholds.length} != sum of bits ${bits.sum}")
  override def kernelInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), IntegerType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any, cell: Any): Any =
    VecOps.subcellBits(v.asInstanceOf[ArrayData], cell.asInstanceOf[Int],
      splitCells, bits, thresholds, table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sc = ctx.addReferenceObj("splitCells", splitCells, "int[]")
    val bt = ctx.addReferenceObj("splitBits", bits, "int[]")
    val th = ctx.addReferenceObj("splitThrs", thresholds, "double[]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.functions.VecOps.subcellBits($v, $c, $sc, $bt, $th, $table)")
  }
  override def toString: String =
    s"subcellbits($left, $right, <${splitCells.length} split cells>)"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubcellBits =
    copy(left = newLeft, right = newRight)
}

/** mmr_select(array<struct<id,rel,vec>>) → array<long>: greedy MMR
  * selection over a sorted per-query candidate pool (see
  * VecOps.mmrSelect). lambdaE4 is the relevance weight on the 1e-4 grid
  * (10000 = pure relevance ≡ top-k by rel).
  */
case class MmrSelect(child: Expression, k: Int, lambdaE4: Int)
    extends UnaryExpression {
  require(k >= 1, s"k must be positive, got $k")
  require(lambdaE4 >= 0 && lambdaE4 <= 10000,
    s"lambdaE4 must be in [0, 10000], got $lambdaE4")
  // the kernel hard-reads <long, double, array<float>> by ordinal —
  // declared-and-checked at analysis instead of crashing (or silently
  // misreading a double vec) at runtime (code-review r14). A struct
  // input type can't ride ImplicitCastInputTypes (no struct coercion),
  // so [[graft.northstar.Similarity.mmrFromPool]] casts the fields at
  // assembly and this check is the backstop for direct kernel users.
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StructType(Array(a, b, c)), _)
          if a.dataType == LongType && b.dataType == DoubleType &&
            (c.dataType match {
              case ArrayType(FloatType, _) => true
              case _ => false
            }) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "mmr_select expects array<struct<id: bigint, rel: double, " +
            s"vec: array<float>>>, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(cands: Any): Any =
    VecOps.mmrSelect(cands.asInstanceOf[ArrayData], k, lambdaE4)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecOps.mmrSelect($c, $k, $lambdaE4)")
  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)
}

/** lsh_buckets_multiprobe(array<float>) → array<long>: base buckets plus
  * the nFlips lowest-margin flip variants per table (see
  * VecOps.hyperplaneBucketsMultiprobe). Query-side.
  */
case class HyperplaneBucketsMultiprobe(child: Expression, nPlanes: Int,
                                       nTables: Int, nFlips: Int)
    extends UnaryExpression with org.apache.spark.sql.graftbridge.KernelInputTypes {
  // without the declared type an array<double> query column computed
  // buckets from reinterpreted 4-byte halves of doubles — base buckets
  // no longer matched the (coerced) corpus side's HyperplaneBuckets and
  // recall collapsed silently (code-review r14)
  override def kernelInputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  require(nPlanes >= 0 && nPlanes <= 32,
    s"nPlanes must be in [0, 32], got $nPlanes")
  require(nTables >= 1, s"nTables must be positive, got $nTables")
  require(nFlips >= 0, s"nFlips must be non-negative, got $nFlips")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    VecOps.hyperplaneBucketsMultiprobe(v.asInstanceOf[ArrayData], nPlanes,
      nTables, nFlips)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VecOps.hyperplaneBucketsMultiprobe($v, $nPlanes, $nTables, $nFlips)")
  override protected def withNewChildInternal(
      newChild: Expression): HyperplaneBucketsMultiprobe =
    copy(child = newChild)
}

/** jl_project(array<float>, matrix literal) → array<long>: the quantized
  * Johnson–Lindenstrauss projection (see VecOps.jlProject).
  */
case class JlProject(left: Expression, right: Expression, outDim: Int,
                     scale: Int)
    extends BinaryExpression with org.apache.spark.sql.graftbridge.KernelInputTypes {
  require(outDim >= 1, s"outDim must be positive, got $outDim")
  require(scale >= 1, s"scale must be positive, got $scale")
  // vector coerces to array<float> (the PqEncode rationale: a double
  // column quantized reinterpreted garbage deterministically); the
  // matrix literal is integer weights and coerces to array<long>
  override def kernelInputTypes: Seq[DataType] =
    Seq(ArrayType(FloatType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any, wq: Any): Any =
    VecOps.jlProject(v.asInstanceOf[ArrayData], wq.asInstanceOf[ArrayData],
      outDim, scale)
  override def toString: String =
    s"jl_project($left, <matrix outDim=$outDim>, scale=$scale)"
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (v, wq) => s"graft.functions.VecOps.jlProject($v, $wq, $outDim, $scale)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JlProject =
    copy(left = newLeft, right = newRight)
}

/** Column-level API for the vector kernels (graft's `functions._`). */
object vectors {
  private def ex(c: Column) = Bridge.expression(c)

  /** The codebook/matrix argument of [[pq_encode]]/[[pq_adc_cosine]]/
    * [[jl_project]] must be a PLAN CONSTANT (`typedLit(...)` or an
    * expression that folds to one): the kernels convert the boxed
    * ArrayData to a primitive array once per (thread, object identity)
    * — sound only when the generated code passes the SAME literal
    * object for every row. A per-row column there could silently serve
    * a stale conversion if an ArrayData implementation reused one
    * wrapper across rows (code-review r12), so the contract is enforced
    * here, at the public boundary, instead of documented-and-hoped.
    * `Pq.encode`/`Pq.adcCosine`/`Similarity.randomProject*` build the
    * literal internally from Array[Float] and are the intended
    * entrypoints.
    */
  private def requireConstant(c: Column, what: String): Expression = {
    require(Bridge.isPlanConstant(c),
      s"$what must be a plan-constant literal (typedLit), got a per-row " +
        s"expression: $c — the kernels cache the converted array by " +
        "object identity, which is only sound for literals")
    ex(c)
  }
  def vec_cosine(a: Column, b: Column): Column =
    Bridge.column(FloatVecCosine(ex(a), ex(b)))
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(FloatVecDot(ex(a), ex(b)))
  def lsh_buckets(v: Column, nPlanes: Int, nTables: Int): Column =
    Bridge.column(HyperplaneBuckets(ex(v), nPlanes, nTables))
  def pq_encode(v: Column, codebook: Column, m: Int, ksub: Int): Column =
    Bridge.column(PqEncode(ex(v),
      requireConstant(codebook, "pq_encode codebook"), m, ksub))
  def pq_adc_cosine(q: Column, codes: Column, codebook: Column,
                    m: Int, ksub: Int): Column =
    Bridge.column(PqAdcCosine(ex(q), ex(codes),
      requireConstant(codebook, "pq_adc_cosine codebook"), m, ksub))
  def jl_project(v: Column, matrix: Column, outDim: Int,
                 scale: Int): Column =
    Bridge.column(JlProject(ex(v),
      requireConstant(matrix, "jl_project matrix"), outDim, scale))
  def lsh_buckets_multiprobe(v: Column, nPlanes: Int, nTables: Int,
                             nFlips: Int): Column =
    Bridge.column(HyperplaneBucketsMultiprobe(ex(v), nPlanes, nTables,
      nFlips))
  def mmr_select(cands: Column, k: Int, lambdaE4: Int): Column =
    Bridge.column(MmrSelect(ex(cands), k, lambdaE4))
  def nearest_cells(v: Column, centroids: Column, nCells: Int,
                    nProbe: Int): Column =
    Bridge.column(NearestCells(ex(v),
      requireConstant(centroids, "nearest_cells centroids"), nCells, nProbe))
  def best_cell_in(v: Column, flat: Column, cells: Column): Column =
    Bridge.column(BestCellIn(ex(v), ex(flat), ex(cells)))
  def top_cells_in(v: Column, flat: Column, cells: Column,
                   take: Int): Column =
    Bridge.column(TopCellsIn(ex(v), ex(flat), ex(cells), take))
  def subcell_bits(v: Column, cell: Column, splitCells: Array[Int],
                   bits: Array[Int], thresholds: Array[Double],
                   table: Int): Column =
    Bridge.column(SubcellBits(ex(v), ex(cell), splitCells, bits,
      thresholds, table))
}
