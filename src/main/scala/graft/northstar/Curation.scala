package graft.northstar

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Config-driven corpus curation: the r7 operator set composed into ONE
  * declarative pipeline, in the same JSON-replay style as the
  * reference's config files (SURVEY.md §1.1 — configs drive stages;
  * ours drives the training-data curation stages the reference never
  * had). Stage order is FIXED and semantic, not configurable, because
  * each stage's statistics are computed on its INPUT:
  *
  *   1. quality gate   (q_score >= minQuality)
  *   2. language gate  (lang ∈ langs)
  *   3. length floor   (drop bottom num/den by token count — threshold
  *                      from the gated survivors, not the raw corpus)
  *   4. temperature    (per-lang rebalance over the floored survivors)
  *   5. budget fill    (greedy best-quality-first per lang)
  *
  * Every stage is optional (absent key = skipped). The whole composition
  * stays one lazy plan — histogram/count aggregates ride as broadcast
  * 1-row/stratum-row sides, nothing materializes between stages — and
  * every decision is deterministic integer/hash arithmetic, so an
  * external SQL engine can replay the full pipeline (see the
  * `ns_curation_config` oracle). At 100 TB, persist the scored frame
  * before the fan-out if the repeated text-kernel scan matters (same
  * tradeoff note as TextAnalysis.tfIdf).
  */
object Curation {

  case class CurationConfig(
      minQuality: Option[Double] = None,
      langs: Option[Seq[String]] = None,
      lengthFloorNum: Option[Long] = None,
      lengthFloorDen: Option[Long] = None,
      temperatureAlpha: Option[Double] = None,
      budgetPerLang: Option[Long] = None)

  private val mapper = new ObjectMapper()

  /** Parse a curation config from JSON, e.g.
    * `{"min_quality": 0.5, "langs": ["en","de"], "length_floor": "1/10",
    *   "temperature_alpha": 0.5, "budget_per_lang": 3000}`.
    */
  private val knownKeys = Set("min_quality", "langs", "length_floor",
    "temperature_alpha", "budget_per_lang")

  def parseConfig(json: String): CurationConfig = {
    val root = mapper.readTree(json)
    // a typoed key would silently DISABLE its gate (field lookup misses,
    // stage skipped, unfiltered docs flow into the mixture) — refuse
    // unknown keys at the config boundary instead (code-review r13)
    val unknown = root.fieldNames().asScala.toSet -- knownKeys
    require(unknown.isEmpty,
      s"unknown curation config keys: ${unknown.toSeq.sorted.mkString(", ")} " +
        s"(known: ${knownKeys.toSeq.sorted.mkString(", ")})")
    // JSON null reads as ABSENT for every key: Option(root.get(k)) is
    // Some(NullNode), and treating {"langs": null} as Some(Nil) would
    // make the isin() gate silently drop the ENTIRE corpus (and
    // {"min_quality": null} would become Some(0.0))
    def field(k: String) = Option(root.get(k)).filterNot(_.isNull)
    // numeric fields must BE numbers: Jackson's asDouble()/asLong()
    // coerce a malformed scalar ("3k", true, an object) to 0 instead of
    // throwing — {"min_quality": "strict"} silently DISABLED the
    // quality gate and {"budget_per_lang": "3k"} silently dropped the
    // whole corpus (budget 0) — the exact silent-drop class this
    // boundary exists to refuse (code-review r14)
    def num(k: String): Option[Double] = field(k).map { n =>
      require(n.isNumber, s"$k must be a JSON number, got ${n.getNodeType}")
      n.asDouble()
    }
    def intNum(k: String): Option[Long] = field(k).map { n =>
      require(n.isIntegralNumber,
        s"$k must be a JSON integer, got ${n.getNodeType}")
      n.asLong()
    }
    val floor = field("length_floor").map(_.asText())
      .map { s =>
        s.split("/", 2) match {
          case Array(n, d) => (n.trim.toLong, d.trim.toLong)
          case _ => throw new IllegalArgumentException(
            s"length_floor must be 'num/den', got '$s'")
        }
      }
    // an explicit empty array means "no language filter", same as
    // absent: Some(Nil) would hand isin() ZERO arguments — false for
    // every row, the whole corpus silently dropped (the exact failure
    // the null-guard above documents; code-review r13)
    val langs = field("langs").map { node =>
      require(node.isArray,
        s"langs must be a JSON array, got ${node.getNodeType}")
      node.elements().asScala.map(_.asText()).toSeq
    }.filter(_.nonEmpty)
    val budget = intNum("budget_per_lang")
    // a zero/negative budget admits nothing — refuse rather than
    // silently emptying every language's quota
    budget.foreach(b => require(b > 0,
      s"budget_per_lang must be positive, got $b"))
    CurationConfig(
      minQuality = num("min_quality"),
      langs = langs,
      lengthFloorNum = floor.map(_._1),
      lengthFloorDen = floor.map(_._2),
      temperatureAlpha = num("temperature_alpha"),
      budgetPerLang = budget)
  }

  /** The five stage frames (input, gated, floored, sampled, selected),
    * lazily composed; shared by [[run]] and [[funnel]].
    */
  private def stages(df: DataFrame, cfg: CurationConfig, idCol: String,
                     textCol: String, langCol: String): Seq[DataFrame] = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextAnalysis.qualityScore(df, textCol)
      .select(col(idCol), col(langCol), col("q_score"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val gated0 = cfg.minQuality.fold(scored)(q =>
      scored.filter(col("q_score") >= q))
    val gated = cfg.langs.fold(gated0)(ls =>
      gated0.filter(col(langCol).isin(ls: _*)))
    val floored = (cfg.lengthFloorNum, cfg.lengthFloorDen) match {
      case (Some(n), Some(d)) => Sampling.quantileFloor(gated, "n_tokens", n, d)
      case _ => gated
    }
    val sampled = cfg.temperatureAlpha.fold(floored)(a =>
      Sampling.temperatureSample(floored, langCol, a, idCol))
    val filled = cfg.budgetPerLang.fold(sampled) { budget =>
      val w = Window.partitionBy(langCol)
        .orderBy(col("q_score").desc, col(idCol))
      sampled.withColumn("__cum_before",
          sum(col("n_tokens")).over(w) - col("n_tokens"))
        .filter(col("__cum_before") < budget)
        .drop("__cum_before")
    }
    Seq(scored, gated, floored, sampled, filled)
  }

  /** Run the curation pipeline over a documents frame (doc_id, text,
    * lang, ...). Output: (doc_id, lang, n_tokens, q_e4) for every
    * surviving document.
    */
  def run(df: DataFrame, cfg: CurationConfig,
          idCol: String = "doc_id", textCol: String = "text",
          langCol: String = "lang"): DataFrame =
    stages(df, cfg, idCol, textCol, langCol).last
      .select(col(idCol), col(langCol), col("n_tokens"),
        round(col("q_score") * 10000).cast("long").as("q_e4"))

  /** The deployable artifact of a batch curation run: every data-derived
    * statistic frozen to plain values — the length-floor threshold and
    * the per-language temperature rates. Gates become pure per-row
    * predicates, so [[serve]] can apply them to a STREAM (the
    * "nightly-train, continuously-serve" split, mirroring
    * TextAnalysis.lmHead / scoreWithLm). The budget-fill stage is
    * deliberately absent: admission under a cumulative budget is a
    * batch decision, not a per-row one.
    */
  case class FrozenCuration(
      minQuality: Option[Double],
      langs: Option[Seq[String]],
      lengthThreshold: Option[Long],
      rates: Option[Map[String, Double]])

  /** Freeze a config's data-derived statistics from a batch corpus.
    * Driver collects are bounded: one scalar threshold + one row per
    * language.
    */
  def freeze(df: DataFrame, cfg: CurationConfig,
             idCol: String = "doc_id", textCol: String = "text",
             langCol: String = "lang"): FrozenCuration = {
    val Seq(_, gated, _, _, _) =
      stages(df, cfg, idCol, textCol, langCol)
    val thr = (cfg.lengthFloorNum, cfg.lengthFloorDen) match {
      case (Some(n), Some(d)) =>
        // the exact k-th-smallest cut the batch floor used — NOT derived
        // from the kept set's minimum, which would misplace stream
        // values absent from the training corpus
        Some(Sampling.quantileThresholdFrame(gated, "n_tokens", n, d)
          .first() match {
            case r if r.isNullAt(0) => Long.MaxValue // empty input
            case r => r.getLong(0)
          })
      case _ => None
    }
    val rates = cfg.temperatureAlpha.map { a =>
      // the SAME rate arithmetic the batch run uses
      // (Sampling.temperatureRates): null strata excluded (a tiny
      // null-lang group would poison cmin for every real language —
      // the batch side filters them, so a frozen policy must too or
      // run/serve parity breaks) and the alpha domain require applies.
      // Empty survivor set → empty rates map: serve() then keeps
      // nothing, matching the batch run over the same empty input.
      val floored = thr match {
        case Some(t) => gated.filter(col("n_tokens") > t)
        case None => gated
      }
      Sampling.temperatureRates(floored, langCol, a)
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    }
    FrozenCuration(cfg.minQuality, cfg.langs, thr, rates)
  }

  /** Apply a frozen curation policy as a stateless narrow pass — no
    * aggregates, no joins, no state; runs unchanged on a streaming
    * frame. Unseen languages (absent from the frozen rates) are dropped:
    * the policy has no admission rate for them.
    */
  def serve(df: DataFrame, frozen: FrozenCuration,
            idCol: String = "doc_id", textCol: String = "text",
            langCol: String = "lang"): DataFrame = {
    val scored = TextAnalysis.qualityScore(df, textCol)
      .select(col(idCol), col(langCol), col("q_score"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val q = frozen.minQuality.fold(scored)(x =>
      scored.filter(col("q_score") >= x))
    val l = frozen.langs.fold(q)(ls => q.filter(col(langCol).isin(ls: _*)))
    val f = frozen.lengthThreshold.fold(l)(t =>
      l.filter(col("n_tokens") > t))
    val s = frozen.rates.fold(f) { rs =>
      val rate = rs.foldLeft(lit(-1.0)) { case (acc, (k, v)) =>
        when(col(langCol) === k, lit(v)).otherwise(acc)
      }
      f.filter(Sampling.hashUnit(col(idCol)) < rate)
    }
    s.select(col(idCol), col(langCol), col("n_tokens"),
      round(col("q_score") * 10000).cast("long").as("q_e4"))
  }

  /** Per-source document cap — the C4/RefinedWeb "domain cap" curation
    * step: no single source (domain, crawl host, feed) may contribute
    * more than `cap` documents, so a few mega-domains can't dominate the
    * training mixture the way raw web frequency would make them. Keeps
    * the `cap` BEST documents per source, "best" = the given ordering
    * (default: longest `n_chars` first, `doc_id` as the deterministic
    * tiebreak so reruns and external replays pick identical survivors).
    *
    * Shape: ONE window (row_number partitioned by source) = one shuffle
    * on the source key. At 100 TB the partition count is the domain
    * count (millions), so partitions stay small; a single pathological
    * mega-domain skews its one partition, but the window only needs the
    * top `cap` rows — if that ever matters, pre-filter with a capped
    * groupBy-count semi-join before the window. No collect, no driver
    * state.
    */
  def sourceCap(df: DataFrame, cap: Int, sourceCol: String = "source",
                orderBy: Seq[Column] = Seq(col("n_chars").desc,
                  col("doc_id").asc)): DataFrame = {
    require(cap > 0, s"cap must be positive, got $cap")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(sourceCol)).orderBy(orderBy: _*)
    // temp rank column name must not collide with (and silently
    // overwrite) a caller column — suffix until unique
    val rk = Iterator.iterate("__rk")(_ + "_")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(rk, row_number().over(w))
      .filter(col(rk) <= cap)
      .drop(rk)
  }

  /** Stage-survivor funnel for the same pipeline: how many documents
    * (and tokens) survive each curation stage — the observability row a
    * nightly run logs next to its output.
    *
    * SINGLE-PASS shape (the r7 form aggregated the five shared lazy
    * stage frames independently, re-deriving the text-scoring kernel
    * ~12×; at 100 TB that is ~12 corpus scans for one report row):
    * every stage's survival is decidable PER ROW once the stage
    * statistics are known, so the funnel scores each document once,
    * derives monotone stage flags s2..s5 from broadcast statistic
    * sides, and reduces with ONE conditional aggregate. The statistic
    * subtrees (quantile threshold, temperature rates) still re-derive
    * the scored frame — 3 extra kernel scans, the irreducible
    * stage-stats data dependency — but the main pass, the budget
    * window, and the final aggregate all ride one scan. Stage
    * membership is IDENTICAL to [[run]]/[[stages]]: same threshold
    * frame, same [[Sampling.temperatureRates]] arithmetic, same budget
    * window order; the budget stage's cumulative sum treats
    * non-survivors of stage 4 as zero-token rows, which leaves every
    * survivor's running total unchanged (ids are unique, so the
    * RANGE/ROWS frame distinction is moot).
    */
  def funnel(df: DataFrame, cfg: CurationConfig,
             idCol: String = "doc_id", textCol: String = "text",
             langCol: String = "lang"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = TextAnalysis.qualityScore(df, textCol)
      .select(col(idCol), col(langCol), col("q_score"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"))
    val gatePred = Seq(
        cfg.minQuality.map(q => col("q_score") >= q),
        cfg.langs.map(ls => col(langCol).isin(ls: _*)))
      .flatten.reduceOption(_ && _).getOrElse(lit(true))
    // statistic subtrees replicate stages(): threshold from the GATED
    // survivors, temperature rates from the FLOORED survivors
    val gated = scored.filter(gatePred)
    val floored = (cfg.lengthFloorNum, cfg.lengthFloorDen) match {
      case (Some(n), Some(d)) => Sampling.quantileFloor(gated, "n_tokens", n, d)
      case _ => gated
    }
    val s2 = scored.withColumn("__s2", gatePred)
    val s3 = (cfg.lengthFloorNum, cfg.lengthFloorDen) match {
      case (Some(n), Some(d)) =>
        s2.crossJoin(broadcast(
            Sampling.quantileThresholdFrame(gated, "n_tokens", n, d)))
          .withColumn("__s3", col("__s2") && col("n_tokens") > col("__thr"))
      case _ => s2.withColumn("__s3", col("__s2"))
    }
    val s4 = cfg.temperatureAlpha match {
      case Some(a) =>
        // left join: rows already dead at stage 3 may carry languages
        // absent from the rates side; null rate => flag stays false
        s3.join(broadcast(Sampling.temperatureRates(floored, langCol, a)),
            Seq(langCol), "left")
          .withColumn("__s4", col("__s3") &&
            Sampling.hashUnit(col(idCol)) < col("__rate"))
      case None => s3.withColumn("__s4", col("__s3"))
    }
    val s5 = cfg.budgetPerLang match {
      case Some(budget) =>
        val w = Window.partitionBy(langCol)
          .orderBy(col("q_score").desc, col(idCol))
        val contrib = when(col("__s4"), col("n_tokens")).otherwise(0L)
        s4.withColumn("__s5",
          col("__s4") && (sum(contrib).over(w) - contrib) < budget)
      case None => s4.withColumn("__s5", col("__s4"))
    }
    def n(flag: String) = coalesce(sum(when(col(flag), 1L)), lit(0L))
    def tok(flag: String) =
      coalesce(sum(when(col(flag), col("n_tokens"))), lit(0L))
    s5.agg(
      count(lit(1)).as("n_input"),
      coalesce(sum(col("n_tokens")), lit(0L)).as("tok_input"),
      n("__s2").as("n_gated"), tok("__s2").as("tok_gated"),
      n("__s3").as("n_floored"), tok("__s3").as("tok_floored"),
      n("__s4").as("n_sampled"), tok("__s4").as("tok_sampled"),
      n("__s5").as("n_selected"), tok("__s5").as("tok_selected"))
  }

  /** Multimodal curation gates (VERDICT r13 task 6): config-driven
    * predicates over the DECODED asset metadata
    * ([[Multimodal.decodeAssets]]'s (asset_id, width, height, format)
    * columns) — the modality analogue of the text gates above. `width`/
    * `height` carry per-format meaning by the codec contract: pixel
    * dims for image/video, total samples / channel count for audio —
    * so at a known sample rate the width bounds ARE the audio duration
    * gate (e.g. min 1 s at 44.1 kHz = min_width 44100). All gates are
    * stateless narrow filters: no aggregates, no joins, stream-safe,
    * and replayable by an external SQL engine over the metadata
    * integers (the `ns_asset_curation` oracle).
    */
  case class AssetCurationConfig(
      formats: Option[Seq[String]] = None,
      minWidth: Option[Long] = None, maxWidth: Option[Long] = None,
      minHeight: Option[Long] = None, maxHeight: Option[Long] = None)

  private val knownAssetKeys = Set("formats", "min_width", "max_width",
    "min_height", "max_height")

  /** Parse an asset curation config from JSON, e.g.
    * `{"formats": ["png","mp4"], "min_width": 32, "max_width": 4096}`.
    * Same boundary discipline as [[parseConfig]]: unknown keys refuse
    * (a typo must not silently disable a gate), JSON null reads as
    * absent, and an explicit empty `formats` array means "no format
    * filter" — `Some(Nil)` would hand isin() zero arguments and drop
    * every asset.
    */
  def parseAssetConfig(json: String): AssetCurationConfig = {
    val root = mapper.readTree(json)
    val unknown = root.fieldNames().asScala.toSet -- knownAssetKeys
    require(unknown.isEmpty,
      s"unknown asset curation config keys: " +
        s"${unknown.toSeq.sorted.mkString(", ")} " +
        s"(known: ${knownAssetKeys.toSeq.sorted.mkString(", ")})")
    def field(k: String) = Option(root.get(k)).filterNot(_.isNull)
    val formats = field("formats").map { node =>
      require(node.isArray,
        s"formats must be a JSON array, got ${node.getNodeType}")
      node.elements().asScala.map(_.asText()).toSeq
    }.filter(_.nonEmpty)
    // same numeric-type discipline as parseConfig: asLong() coerces a
    // malformed scalar ("4k") to 0, silently turning a max bound into
    // drop-everything (code-review r14)
    def intNum(k: String): Option[Long] = field(k).map { n =>
      require(n.isIntegralNumber,
        s"$k must be a JSON integer, got ${n.getNodeType}")
      n.asLong()
    }
    AssetCurationConfig(
      formats = formats,
      minWidth = intNum("min_width"),
      maxWidth = intNum("max_width"),
      minHeight = intNum("min_height"),
      maxHeight = intNum("max_height"))
  }

  /** Apply an asset curation config to a decoded-asset frame. Every
    * gate is optional (absent = skipped); rows must carry the
    * [[Multimodal.decodeAssets]] metadata columns.
    */
  def curateAssets(decoded: DataFrame,
                   cfg: AssetCurationConfig): DataFrame = {
    val f0 = cfg.formats.fold(decoded)(fs =>
      decoded.filter(col("format").isin(fs: _*)))
    val f1 = cfg.minWidth.fold(f0)(v => f0.filter(col("width") >= v))
    val f2 = cfg.maxWidth.fold(f1)(v => f1.filter(col("width") <= v))
    val f3 = cfg.minHeight.fold(f2)(v => f2.filter(col("height") >= v))
    cfg.maxHeight.fold(f3)(v => f3.filter(col("height") <= v))
  }

  /** Semantic-dedup stage for the curation chain: within each semantic
    * near-duplicate cluster (precomputed labels — one row per document,
    * `cluster_id` from [[Artifacts.semanticLabelsFor]] or an in-query
    * [[Similarity.semanticDedup]] run) keep the HIGHEST-QUALITY member,
    * with the same quality score the curation gates use feeding the
    * keeper choice (SemDeDup's "keep one per cluster" upgraded from
    * keep-first to keep-best — curation keeps the best copy of a
    * semantic duplicate group, not the one crawled first). Keeper rule
    * is [[Similarity.semanticDedupBestFromLabels]]'s: max q_score, tie
    * → lowest id. The optional `minQuality` gate then screens the
    * KEEPERS (a low-quality cluster contributes nothing, rather than
    * promoting its least-bad member past the gate). One lazy plan: the
    * text-kernel scoring pass is narrow, labels join on the id, keeper
    * selection is one window per cluster. Output: (idCol, cluster_id,
    * q_score) for each surviving keeper.
    */
  def semanticKeepBest(docs: DataFrame, labels: DataFrame,
                       minQuality: Option[Double] = None,
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val labelIdCol = labels.columns.filterNot(_ == "cluster_id").head
    val scored = TextAnalysis.qualityScore(docs, textCol)
      .select(col(idCol).as(labelIdCol), col("q_score"))
    val kept = Similarity.semanticDedupBestFromLabels(
        scored, labels, scoreCol = "q_score", idCol = labelIdCol)
      .filter(col("is_keeper"))
    minQuality.fold(kept)(q => kept.filter(col("q_score") >= q))
      .select(col(labelIdCol).as(idCol), col("cluster_id"), col("q_score"))
  }
}
