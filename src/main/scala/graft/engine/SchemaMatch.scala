package graft.engine

/** Driver-side fuzzy matching over column NAMES (never data).
  *
  * The reference uses Python difflib for: choosing first/last-name columns
  * (transformations_code.py:114-115, cutoff 0.6), detecting date columns
  * (transformations_code.py:23-35, threshold 0.7), and — indirectly — join-key
  * inference (mapping.py:89-103 uses Word2Vec over column names; we replace
  * that non-deterministic model with the same deterministic similarity used
  * here, per SURVEY.md §7.5.2).
  *
  * `ratio` reimplements difflib.SequenceMatcher.ratio() faithfully (without
  * the autojunk heuristic, which never triggers on short identifier strings):
  * 2*M/T where M = total length of matching blocks found by recursively
  * locating the longest matching block. Pure Scala, O(n*m) per pair — runs on
  * the driver against a handful of column names, so scale is irrelevant.
  */
object SchemaMatch {

  /** difflib-equivalent similarity ratio in [0, 1]. */
  def ratio(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val m = matchingBlocksLength(a, 0, a.length, b, 0, b.length)
    2.0 * m / (a.length + b.length)
  }

  /** Longest matching block (difflib find_longest_match, no junk):
    * lowest i, then lowest j, of the longest common substring of
    * a[alo,ahi) x b[blo,bhi). Returns (i, j, size).
    */
  private def longestMatch(a: String, alo: Int, ahi: Int,
                           b: String, blo: Int, bhi: Int): (Int, Int, Int) = {
    var besti = alo; var bestj = blo; var bestsize = 0
    // j2len(j) = length of longest match ending at a(i), b(j)
    var j2len = Map.empty[Int, Int]
    var i = alo
    while (i < ahi) {
      var newj2len = Map.empty[Int, Int]
      var j = blo
      while (j < bhi) {
        if (b.charAt(j) == a.charAt(i)) {
          val k = j2len.getOrElse(j - 1, 0) + 1
          newj2len += (j -> k)
          if (k > bestsize) { besti = i - k + 1; bestj = j - k + 1; bestsize = k }
        }
        j += 1
      }
      j2len = newj2len
      i += 1
    }
    (besti, bestj, bestsize)
  }

  /** Total matched character count from the recursive block decomposition. */
  private def matchingBlocksLength(a: String, alo: Int, ahi: Int,
                                   b: String, blo: Int, bhi: Int): Int = {
    if (alo >= ahi || blo >= bhi) return 0
    val (i, j, k) = longestMatch(a, alo, ahi, b, blo, bhi)
    if (k == 0) 0
    else k +
      matchingBlocksLength(a, alo, i, b, blo, j) +
      matchingBlocksLength(a, i + k, ahi, b, j + k, bhi)
  }

  /** find_similar_column (transformations_code.py:11-21): best match above
    * cutoff, case-insensitive, returning the ORIGINAL column spelling.
    * difflib.get_close_matches ranks via heapq.nlargest over
    * (ratio, lowercased-name) tuples, so a ratio TIE breaks to the
    * lexicographically LARGER lowercased name (empirically verified:
    * get_close_matches("ab", ["abc","abd"]) → "abd" in either input
    * order); the reference then returns the first ORIGINAL spelling
    * whose lowercase equals the winner.
    */
  def findSimilarColumn(target: String, columns: Seq[String],
                        cutoff: Double = 0.7): Option[String] = {
    val t = target.toLowerCase
    // argument order matters: get_close_matches sets seq2 = word and
    // seq1 = each possibility, i.e. ratio(CANDIDATE, TARGET) — the
    // matching-blocks ratio is order-asymmetric (b-side position
    // tracking), and the swapped order diverged from difflib on ~3% of
    // random short names (code-review r13, empirically verified against
    // CPython difflib)
    val scored = columns.map(c => c.toLowerCase -> ratio(c.toLowerCase, t))
      .filter(_._2 >= cutoff)
    if (scored.isEmpty) None
    else {
      val winner = scored.maxBy { case (lc, s) => (s, lc) }(
        Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.String))._1
      columns.find(_.toLowerCase == winner)
    }
  }

  /** is_date_column (transformations_code.py:23-35): name contains "date" or
    * fuzzy-matches a date synonym above threshold.
    */
  def isDateColumn(col: String, threshold: Double = 0.7): Boolean = {
    val lower = col.toLowerCase
    lower.contains("date") ||
      Seq("dob", "dateofbirth", "birthdate").exists(ratio(lower, _) > threshold)
  }

  /** Deterministic replacement for the reference's Word2Vec column-name
    * similarity (mapping.py:79-87): exact case-insensitive match scores 1.0,
    * otherwise the difflib ratio. Same [0,1] scale, same 0.8 threshold usage
    * at the call site (mapping.py:22). Substitution documented in SURVEY.md
    * §7.5.2 — cosine over an unseeded Word2Vec trained on a tiny column-name
    * corpus is near-noise; this preserves the FK-first → semantic → validate
    * control flow with reproducible scores.
    */
  def nameSimilarity(a: String, b: String): Double = {
    val (x, y) = (a.toLowerCase, b.toLowerCase)
    if (x == y) 1.0 else ratio(x, y)
  }
}
