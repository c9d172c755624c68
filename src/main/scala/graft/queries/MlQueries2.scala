package graft.queries

import graft.Tables
import graft.functions.TextFunctions.spaceTokens
import graft.plans.Fnv1a64
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Classical ML expressed as relational plans, batch two: multinomial
  * Naive Bayes (train + classify in one query), a full-batch logistic
  * regression gradient step, and hashing-trick featurization.
  *
  * The cross-engine determinism device throughout is FIXED-POINT
  * MICRO-UNITS: every per-row transcendental term is rounded to 1e-6 and
  * cast to BIGINT at the row level, so all downstream aggregation is
  * exact integer arithmetic — order-independent, partition-independent,
  * and hashable by the driver without any float-ordering caveats. (The
  * alternative — serial fold over a sorted list — costs a per-group sort;
  * integer sums cost nothing and parallelize as plain partial aggregates.)
  */
object MlQueries2 {

  private def micro(c: Column): Column =
    round(c * 1000000d).cast("long")

  /** Multinomial Naive Bayes over the documents table: classes = lang,
    * features = space tokens, Laplace smoothing α=1. Trained and applied
    * in the SAME plan (resubstitution — deterministic, no split needed):
    * score(d,c) = Σ_{t∈d} cnt·ln(ctc+1) − n_d·ln(tc+V) + ln(prior_c),
    * where tokens unseen in class c contribute ln(1)=0 and so drop out —
    * the inner join IS the smoothing algebra, no zero-count (V×C)
    * materialization ever exists.
    *
    * Scale: the model is two hash-aggregates (class-token counts, class
    * totals); scoring is one equi-join of doc tokens against the model on
    * token plus a broadcast of the C-row class constants. Nothing is ever
    * collected; the model itself is a DataFrame you could write out and
    * re-join tomorrow — "training" at 100 TB is exactly one shuffle of
    * (lang, tok) pairs.
    */
  def naiveBayes(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = docs
      .select(col("doc_id"), col("lang"), explode(spaceTokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
    val tokClass = toks.groupBy("lang", "tok").agg(count(lit(1)).as("ctc"))
    val vocab = toks.agg(countDistinct("tok").as("v"))
    val classTotals = tokClass.groupBy("lang").agg(sum("ctc").as("tc"))
    val nDocs = docs.agg(count(lit(1)).as("n_total"))
    val priors = docs.groupBy(col("lang").as("clang"))
      .agg(count(lit(1)).as("c_docs"))
      .crossJoin(broadcast(nDocs))
      .crossJoin(broadcast(vocab))
      .join(classTotals.withColumnRenamed("lang", "clang"), "clang")
      .select(col("clang"),
        micro(log(col("c_docs").cast("double") / col("n_total"))).as("prior_m"),
        micro(log((col("tc") + col("v")).cast("double"))).as("lntcv_m"))
    val docToks = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
    val docLen = docToks.groupBy("doc_id").agg(sum("cnt").as("n_d"))
    // matched-token partial sums: micro-rounded per (doc, class, token)
    // term, then EXACT integer aggregation
    // the model (vocab×C rows) is the broadcastable side BY DESIGN — the
    // doc-token side is the corpus-scale stream
    val matched = docToks
      .join(broadcast(tokClass.withColumnRenamed("lang", "clang")), Seq("tok"))
      .groupBy("doc_id", "clang")
      .agg(sum(micro(col("cnt") * log(col("ctc") + lit(1).cast("double")))).as("sum_m"))
    val grid = docs.select(col("doc_id"), col("lang"))
      .crossJoin(broadcast(priors))
    val scored = grid
      .join(matched, Seq("doc_id", "clang"), "left")
      .join(docLen, "doc_id")
      .select(col("doc_id"), col("lang"), col("clang"),
        (coalesce(col("sum_m"), lit(0L))
          - col("n_d") * col("lntcv_m") + col("prior_m")).as("score_m"))
    val best = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score_m").desc, col("clang"))
    scored.withColumn("rn", row_number().over(best)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("clang").as("pred"),
        col("score_m").as("score_micro"))
      .orderBy("doc_id")
  }

  /** One full-batch gradient-descent step of logistic regression
    * (P[l_returnflag='R'] from discount and tax), from nonzero initial
    * weights so the sigmoid is genuinely exercised: per-row gradient and
    * log-loss contributions micro-rounded to integers, summed exactly,
    * then the weight update computed from the integer sums with identical
    * double arithmetic on both engines. The "training epoch as a
    * relational aggregate" pattern: one streamed scan, three integer
    * sums, no shuffle beyond the final 1-row aggregate.
    */
  def logregStep(s: SparkSession, d: String): DataFrame = {
    val (w0, w1, w2, lr) = (0.1d, -0.2d, 0.3d, 0.5d)
    val li = Tables.lineitem(s, d).select(
      col("l_discount").as("x1"), col("l_tax").as("x2"),
      when(col("l_returnflag") === "R", 1.0d).otherwise(0.0d).as("y"))
    val z = lit(w0) + lit(w1) * col("x1") + lit(w2) * col("x2")
    val p = lit(1.0d) / (lit(1.0d) + exp(-z))
    val sums = li.select(
        micro((p - col("y"))).as("g0"),
        micro((p - col("y")) * col("x1")).as("g1"),
        micro((p - col("y")) * col("x2")).as("g2"),
        micro(-(col("y") * log(p) + (lit(1.0d) - col("y")) * log(lit(1.0d) - p)))
          .as("l"))
      .agg(count(lit(1)).as("n"), sum("g0").as("sg0"), sum("g1").as("sg1"),
        sum("g2").as("sg2"), sum("l").as("loss_micro"))
    def upd(w: Double, sg: Column): Column =
      round(lit(w) - lit(lr) * (sg.cast("double") / lit(1000000d) / col("n")), 6)
    sums.select(col("n"),
      upd(w0, col("sg0")).as("w0_new"),
      upd(w1, col("sg1")).as("w1_new"),
      upd(w2, col("sg2")).as("w2_new"),
      col("loss_micro"))
  }

  /** Hashing-trick featurization (the Vowpal-Wabbit/sklearn
    * FeatureHasher): token → FNV index in a 256-dim space with a
    * second-hash sign, per-doc weights summed exactly as integers.
    * Collisions are deterministic and sign-cancelling — the classic
    * variance-reduction trick, all SQL-visible. Output restricted to
    * doc_id < 50 to keep the gate result bounded; the plan is one
    * hash-aggregate regardless.
    */
  def featureHash(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") < 50)
      .select(col("doc_id"), explode(spaceTokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"),
        (Fnv1a64.ihash31(col("tok")) % 256).as("feat"),
        when(Fnv1a64.ihash31(concat(lit("s#"), col("tok"))) % 2 === 0, 1L)
          .otherwise(-1L).as("sign"))
      .groupBy("doc_id", "feat")
      .agg(sum("sign").as("weight"))
      .filter(col("weight") =!= 0)
      .orderBy("doc_id", "feat")

  /** Histogram-based split finding — the distributed-GBDT inner loop
    * (XGBoost/LightGBM "approx" mode). One linear scan folds the corpus
    * into per-feature-value bins (count + exact cent-scaled label sum, a
    * map-side-combinable aggregate); split evaluation then runs entirely
    * on the ~50-row histogram: a cumulative window turns bins into
    * left/right partition stats, and the variance-reduction surrogate
    * score = sl²/nl + sr²/nr picks the best threshold. The single-
    * partition window is over the HISTOGRAM (bins ≤ distinct quantities),
    * never the data — that collapse is exactly why histogram split
    * finding scales to 100 TB while exact sorted-split enumeration
    * cannot. Integer inputs to the score are < 2^53, so the double
    * expression tree is bit-identical across engines.
    */
  def histogramSplit(s: SparkSession, d: String): DataFrame = {
    val bins = Tables.lineitem(s, d)
      .select(col("l_quantity").cast("int").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
      .groupBy("q")
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    val cumW = org.apache.spark.sql.expressions.Window.orderBy("q")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val allW = org.apache.spark.sql.expressions.Window.partitionBy()
    val tot = bins.agg(sum(col("n")).as("tn"), sum(col("sy")).as("tsy"))
    bins
      .select(col("q"), sum(col("n")).over(cumW).as("nl"),
        sum(col("sy")).over(cumW).as("syl"))
      .crossJoin(broadcast(tot))
      .filter(col("nl") < col("tn")) // last bin: empty right side
      .select(col("q").as("split_q"), col("nl").as("n_left"),
        (col("tn") - col("nl")).as("n_right"),
        col("syl").as("sum_left_cents"),
        (col("tsy") - col("syl")).as("sum_right_cents"))
      .withColumn("score",
        col("sum_left_cents").cast("double") * col("sum_left_cents") / col("n_left")
          + col("sum_right_cents").cast("double") * col("sum_right_cents") / col("n_right"))
      .withColumn("is_best", col("score") === max(col("score")).over(allW))
      .orderBy("split_q")
  }

  /** One gradient-BOOSTING round on top of `ml_histogram_split`: the
    * round-1 argmax split defines a two-leaf stump whose leaf values are
    * the exact per-side means; residuals against that stump are
    * micro-rounded to BIGINT hundredth-cents (integer-exact sums, the
    * module's fixed-point discipline) and the round-2 per-threshold
    * variance-reduction scores are emitted over the residual histogram —
    * the GBDT training loop's steady-state iteration, two scans per round
    * (histogram build + residual histogram), everything else on ≤50-row
    * broadcast state.
    */
  def gbdtResidualStep(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = Tables.lineitem(s, d).select(
      col("l_quantity").cast("int").as("q"),
      round(col("l_extendedprice") * 100).cast("long").as("y"))
    val bins = base.groupBy("q").agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    val cumW = Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    val tot = bins.agg(sum(col("n")).as("tn"), sum(col("sy")).as("tsy"))
    val best = bins
      .select(col("q"), sum(col("n")).over(cumW).as("nl"),
        sum(col("sy")).over(cumW).as("syl"))
      .crossJoin(broadcast(tot))
      .filter(col("nl") < col("tn"))
      .withColumn("score",
        col("syl").cast("double") * col("syl") / col("nl")
          + (col("tsy") - col("syl")).cast("double") * (col("tsy") - col("syl"))
            / (col("tn") - col("nl")))
      .orderBy(desc("score"), asc("q")).limit(1)
      .select(col("q").as("r1_split_q"),
        (col("syl").cast("double") / col("nl")).as("pl"),
        ((col("tsy") - col("syl")).cast("double") / (col("tn") - col("nl"))).as("pr"))
    val resid = base.crossJoin(broadcast(best))
      .withColumn("r",
        round((col("y") - when(col("q") <= col("r1_split_q"), col("pl"))
          .otherwise(col("pr"))) * 100).cast("long"))
    val bins2 = resid.groupBy("r1_split_q", "q")
      .agg(count(lit(1)).as("n"), sum(col("r")).as("sr"))
    val tot2 = bins2.agg(sum(col("n")).as("tn"), sum(col("sr")).as("tsr"))
    val cumW2 = Window.partitionBy("r1_split_q").orderBy("q")
      .rowsBetween(Window.unboundedPreceding, 0)
    val allW = Window.partitionBy()
    bins2
      .select(col("r1_split_q"), col("q"), sum(col("n")).over(cumW2).as("nl"),
        sum(col("sr")).over(cumW2).as("srl"))
      .crossJoin(broadcast(tot2))
      .filter(col("nl") < col("tn"))
      .select(col("r1_split_q"), col("q").as("split_q"), col("nl").as("n_left"),
        (col("tn") - col("nl")).as("n_right"),
        col("srl").as("sum_left_rc"), (col("tsr") - col("srl")).as("sum_right_rc"))
      .withColumn("score",
        col("sum_left_rc").cast("double") * col("sum_left_rc") / col("n_left")
          + col("sum_right_rc").cast("double") * col("sum_right_rc") / col("n_right"))
      .withColumn("is_best", col("score") === max(col("score")).over(allW))
      .orderBy("split_q")
  }

  /** EXACT ROC AUC without a global sort: the Mann-Whitney rank-sum
    * computed from the SCORE HISTOGRAM — group rows by (micro-rounded)
    * score, cumulate negatives below each score, and assemble
    * 2·U = Σ_s pos(s)·(2·neg_below(s) + neg(s)) in exact BIGINT
    * arithmetic (the ½-credit for ties stays integral in the doubled
    * form). AUC = U/(P·N) divides exact integers at the end. The
    * histogram (distinct scores) is what flows through the one ordered
    * window — never the row stream — so this scales like a histogram
    * build, not a sort. Scorer shared with ml_calibration_bins.
    */
  def aucExact(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(s, d).select(
      col("l_discount").as("x1"), col("l_tax").as("x2"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"))
    val z = lit(-1.0) + lit(20.0) * col("x1") - lit(15.0) * col("x2")
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val hist = li.withColumn("score", round(p * 1e6).cast("long"))
      .groupBy("score")
      .agg(sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
    val below = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("cum_nn", coalesce(sum(col("nn")).over(below), lit(0L)))
      .agg(sum(col("np")).as("p_total"), sum(col("nn")).as("n_total"),
        sum(col("np") * (lit(2L) * col("cum_nn") + col("nn"))).as("u2"))
      .withColumn("auc",
        round(col("u2") / (lit(2.0) * col("p_total") * col("n_total")), 6))
  }

  /** K-fold evaluation of the shared scorer: rows hash-assign to 3 folds
    * (salted FNV of the row identity — the pipeline_split discipline, so
    * folds are layout- and engine-stable), and each fold gets its own
    * histogram-exact AUC (the ml_auc_exact rank-sum, per fold). The
    * variance across folds is the error bar a single AUC hides. Cost: one
    * scan + a (fold × score) histogram; the ordered window runs over
    * histogram rows partitioned by fold.
    */
  def kfoldAuc(s: SparkSession, d: String, folds: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(s, d).select(
      col("l_discount").as("x1"), col("l_tax").as("x2"),
      when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y"),
      (Fnv1a64.ihash31(concat_ws("-", col("l_orderkey"), col("l_linenumber")))
        % folds).as("fold"))
    val z = lit(-1.0) + lit(20.0) * col("x1") - lit(15.0) * col("x2")
    val p = lit(1.0) / (lit(1.0) + exp(-z))
    val hist = li.withColumn("score", round(p * 1e6).cast("long"))
      .groupBy("fold", "score")
      .agg(sum(col("y")).as("np"), sum(lit(1L) - col("y")).as("nn"))
    val below = Window.partitionBy("fold").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    hist
      .withColumn("cum_nn", coalesce(sum(col("nn")).over(below), lit(0L)))
      .groupBy("fold")
      .agg(sum(col("np")).as("p_total"), sum(col("nn")).as("n_total"),
        sum(col("np") * (lit(2L) * col("cum_nn") + col("nn"))).as("u2"))
      .withColumn("auc",
        round(col("u2") / (lit(2.0) * col("p_total") * col("n_total")), 6))
      .orderBy("fold")
  }

  /** Bradley-Terry preference-strength fitting over sources — the
    * reward-model primitive (`pipeline_dpo_pairs` prepares training
    * pairs; this FITS the pairwise model): deterministic contests pair
    * adjacent doc ids (2t vs 2t+1, linear — never doc×doc), the higher
    * distinct-token-ratio wins (tie → the even/lower id), and two
    * Hunter-MM iterations from uniform θ update
    * θᵢ ← Wᵢ / Σⱼ nᵢⱼ/(θᵢ+θⱼ), renormalized to mean 1. Numeric
    * discipline: θ lives as BIGINT micro-units; every per-pair quotient
    * is micro-rounded BEFORE the per-source sum (order-independent
    * integer addition), and each double step is the same formula text on
    * both engines — the DoReMi/fixed-point device. The ≤ C(|sources|,2)
    * contest matrix (190 rows) is collected driver-side (bounded by the
    * source universe — the isotonic/shapley precedent); the corpus scan
    * is the distributed half.
    */
  def bradleyTerry(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
      graft.functions.TextFunctions.distinctTokenRatio(spaceTokens(col("text"))).as("ttr"),
      shiftright(col("doc_id"), 1).as("g"),
      (col("doc_id") % 2).as("side"))
    val contests = docs.filter(col("side") === 0).as("a")
      .join(docs.filter(col("side") === 1).as("b"), col("a.g") === col("b.g"))
      .filter(col("a.source") =!= col("b.source"))
      .select(col("a.source").as("sa"), col("b.source").as("sb"),
        (col("a.ttr") >= col("b.ttr")).as("a_wins")) // tie → lower id (a)
    val matrix = contests
      .groupBy(least(col("sa"), col("sb")).as("i"), greatest(col("sa"), col("sb")).as("j"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("a_wins") === (col("sa") <= col("sb")), 1L).otherwise(0L)).as("w_i"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val sources = matrix.flatMap(m => Seq(m._1, m._2)).distinct.sorted
    val nMap = matrix.map(m => (m._1, m._2) -> m._3).toMap
    val wMap = sources.map { src =>
      src -> matrix.collect {
        case (i, j, n, wi) if i == src => wi
        case (i, j, n, wi) if j == src => n - wi
      }.sum
    }.toMap
    def nOf(a: String, b: String): Long =
      nMap.getOrElse(if (a < b) (a, b) else (b, a), 0L)
    var theta = sources.map(_ -> 1000000L).toMap
    for (_ <- 1 to 2) {
      val raw = sources.map { i =>
        val denomMicro = sources.filter(_ != i).map { j =>
          math.round(nOf(i, j).toDouble / (theta(i) + theta(j)) * 1.0e12)
        }.sum
        i -> (if (denomMicro == 0L) 1000000L
              else math.round(wMap(i).toDouble / denomMicro * 1.0e18))
      }.toMap
      val sumRaw = raw.values.sum
      // floor at 1 micro: a zero-strength source would make a later
      // θᵢ+θⱼ denominator 0/0 — the floor is the deterministic epsilon
      theta = raw.map { case (i, t) =>
        i -> math.max(1L,
          math.round(t.toDouble / sumRaw * sources.length * 1.0e6))
      }
    }
    import s.implicits._
    sources.toSeq.map { src =>
      (src, sources.filter(_ != src).map(nOf(src, _)).sum, wMap(src),
        theta(src) / 1.0e6)
    }.toDF("source", "n_contests", "n_wins", "theta")
      .withColumn("theta", round(col("theta"), 6))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ml_bradley_terry" -> (bradleyTerry(_, _)),
    "ml_kfold_auc" -> (kfoldAuc(_, _)),
    "ml_auc_exact" -> (aucExact(_, _)),
    "ml_gbdt_residual" -> (gbdtResidualStep(_, _)),
    "ml_histogram_split" -> (histogramSplit(_, _)),
    "ml_naive_bayes" -> (naiveBayes(_, _)),
    "ml_logreg_step" -> (logregStep(_, _)),
    "ml_feature_hash" -> (featureHash(_, _))
  )

  import OracleSql.fnvIhash31

  /** The two Hunter-MM iterations unrolled — generated so the formula
    * text is identical round to round (and to the Scala driver loop). */
  private def btIterSql(i: Int): String = {
    val p = i - 1
    s"""d$i AS (
       |  SELECT sym.s,
       |         CAST(sum(CAST(round(sym.n / CAST(ti.th + tj.th AS DOUBLE)
       |                             * 1.0e12) AS BIGINT)) AS BIGINT) AS dm
       |  FROM sym JOIN t$p ti ON ti.s = sym.s JOIN t$p tj ON tj.s = sym.o
       |  GROUP BY sym.s),
       |r$i AS (
       |  SELECT src.s,
       |         CASE WHEN d$i.dm = 0 THEN CAST(1000000 AS BIGINT)
       |              ELSE CAST(round(src.n_wins / CAST(d$i.dm AS DOUBLE)
       |                              * 1.0e18) AS BIGINT) END AS rt
       |  FROM src JOIN d$i ON d$i.s = src.s),
       |n$i AS (SELECT CAST(sum(rt) AS BIGINT) AS sr,
       |               CAST(count(*) AS BIGINT) AS ns FROM r$i),
       |t$i AS (
       |  SELECT s, greatest(CAST(1 AS BIGINT),
       |    CAST(round(rt / CAST(sr AS DOUBLE) * ns * 1.0e6) AS BIGINT)) AS th
       |  FROM r$i CROSS JOIN n$i)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "ml_bradley_terry" ->
      s"""WITH docs AS (
         |  SELECT doc_id, source,
         |         len(list_distinct(string_split(text, ' ')))
         |           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS ttr,
         |         doc_id >> 1 AS g, doc_id % 2 AS side
         |  FROM documents),
         |contests AS (
         |  SELECT a.source AS sa, b.source AS sb, a.ttr >= b.ttr AS a_wins
         |  FROM docs a JOIN docs b ON a.g = b.g AND a.side = 0 AND b.side = 1
         |  WHERE a.source <> b.source),
         |m AS (
         |  SELECT least(sa, sb) AS i, greatest(sa, sb) AS j,
         |         CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN a_wins = (sa <= sb) THEN 1 ELSE 0 END)
         |              AS BIGINT) AS w_i
         |  FROM contests GROUP BY 1, 2),
         |sym AS (
         |  SELECT i AS s, j AS o, n, w_i AS w FROM m
         |  UNION ALL SELECT j, i, n, n - w_i FROM m),
         |src AS (SELECT s, CAST(sum(n) AS BIGINT) AS n_contests,
         |               CAST(sum(w) AS BIGINT) AS n_wins FROM sym GROUP BY s),
         |t0 AS (SELECT s, CAST(1000000 AS BIGINT) AS th FROM src),
         |${btIterSql(1)},
         |${btIterSql(2)}
         |SELECT src.s AS source, src.n_contests, src.n_wins,
         |       round(t2.th / 1000000.0, 6) AS theta
         |FROM src JOIN t2 ON t2.s = src.s ORDER BY source""".stripMargin,
    "ml_kfold_auc" ->
      s"""WITH li AS (
         |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
         |         CAST(round((1.0 / (1.0 + exp(-(-1.0 + 20.0 * l_discount
         |           - 15.0 * l_tax)))) * 1e6) AS BIGINT) AS score,
         |         CAST(${fnvIhash31(
                    "(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR))")}
         |              % 3 AS BIGINT) AS fold
         |  FROM lineitem),
         |hist AS (
         |  SELECT fold, score, CAST(sum(y) AS BIGINT) AS np,
         |         CAST(sum(1 - y) AS BIGINT) AS nn
         |  FROM li GROUP BY 1, 2),
         |cum AS (
         |  SELECT fold, np, nn,
         |         CAST(coalesce(sum(nn) OVER (PARTITION BY fold ORDER BY score
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |              AS BIGINT) AS cum_nn
         |  FROM hist),
         |tot AS (
         |  SELECT fold, CAST(sum(np) AS BIGINT) AS p_total,
         |         CAST(sum(nn) AS BIGINT) AS n_total,
         |         CAST(sum(np * (2 * cum_nn + nn)) AS BIGINT) AS u2
         |  FROM cum GROUP BY fold)
         |SELECT fold, p_total, n_total, u2,
         |       round(u2 / (2.0 * p_total * n_total), 6) AS auc
         |FROM tot ORDER BY fold""".stripMargin,
    "ml_auc_exact" ->
      """WITH li AS (
        |  SELECT CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y,
        |         CAST(round((1.0 / (1.0 + exp(-(-1.0 + 20.0 * l_discount
        |           - 15.0 * l_tax)))) * 1e6) AS BIGINT) AS score
        |  FROM lineitem),
        |hist AS (
        |  SELECT score, CAST(sum(y) AS BIGINT) AS np,
        |         CAST(sum(1 - y) AS BIGINT) AS nn
        |  FROM li GROUP BY score),
        |cum AS (
        |  SELECT np, nn,
        |         CAST(coalesce(sum(nn) OVER (ORDER BY score ROWS BETWEEN
        |              UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |           AS cum_nn
        |  FROM hist),
        |tot AS (
        |  SELECT CAST(sum(np) AS BIGINT) AS p_total,
        |         CAST(sum(nn) AS BIGINT) AS n_total,
        |         CAST(sum(np * (2 * cum_nn + nn)) AS BIGINT) AS u2
        |  FROM cum)
        |SELECT p_total, n_total, u2,
        |       round(u2 / (2.0 * p_total * n_total), 6) AS auc
        |FROM tot""".stripMargin,
    "ml_gbdt_residual" ->
      """WITH base AS (
        |  SELECT CAST(l_quantity AS INT) AS q,
        |         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
        |  FROM lineitem),
        |bins AS (SELECT q, CAST(count(*) AS BIGINT) AS n,
        |                CAST(sum(y) AS BIGINT) AS sy FROM base GROUP BY q),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
        |               CAST(sum(sy) AS BIGINT) AS tsy FROM bins),
        |cum AS (SELECT q, CAST(sum(n) OVER w AS BIGINT) AS nl,
        |               CAST(sum(sy) OVER w AS BIGINT) AS syl
        |        FROM bins WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED
        |                               PRECEDING AND CURRENT ROW)),
        |best AS (
        |  SELECT q AS r1_split_q, CAST(syl AS DOUBLE) / nl AS pl,
        |         CAST(tsy - syl AS DOUBLE) / (tn - nl) AS pr
        |  FROM cum, tot WHERE nl < tn
        |  ORDER BY CAST(syl AS DOUBLE) * syl / nl
        |           + CAST(tsy - syl AS DOUBLE) * (tsy - syl) / (tn - nl)
        |           DESC, q
        |  LIMIT 1),
        |resid AS (
        |  SELECT r1_split_q, q,
        |         CAST(round((y - CASE WHEN q <= r1_split_q THEN pl ELSE pr END)
        |                    * 100) AS BIGINT) AS r
        |  FROM base CROSS JOIN best),
        |bins2 AS (SELECT r1_split_q, q, CAST(count(*) AS BIGINT) AS n,
        |                 CAST(sum(r) AS BIGINT) AS sr
        |          FROM resid GROUP BY 1, 2),
        |tot2 AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
        |                CAST(sum(sr) AS BIGINT) AS tsr FROM bins2),
        |cum2 AS (SELECT r1_split_q, q, CAST(sum(n) OVER w AS BIGINT) AS nl,
        |                CAST(sum(sr) OVER w AS BIGINT) AS srl
        |         FROM bins2 WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED
        |                                 PRECEDING AND CURRENT ROW)),
        |scored AS (
        |  SELECT r1_split_q, q AS split_q, nl AS n_left, tn - nl AS n_right,
        |         srl AS sum_left_rc, tsr - srl AS sum_right_rc,
        |         CAST(srl AS DOUBLE) * srl / nl
        |           + CAST(tsr - srl AS DOUBLE) * (tsr - srl) / (tn - nl) AS score
        |  FROM cum2, tot2 WHERE nl < tn)
        |SELECT r1_split_q, split_q, n_left, n_right, sum_left_rc,
        |       sum_right_rc, score, score = max(score) OVER () AS is_best
        |FROM scored ORDER BY split_q""".stripMargin,
    "ml_histogram_split" ->
      """WITH bins AS (
        |  SELECT CAST(l_quantity AS INT) AS q, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |              AS BIGINT) AS sy
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
        |               CAST(sum(sy) AS BIGINT) AS tsy FROM bins),
        |cum AS (
        |  SELECT q, CAST(sum(n) OVER w AS BIGINT) AS nl,
        |         CAST(sum(sy) OVER w AS BIGINT) AS syl
        |  FROM bins
        |  WINDOW w AS (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
        |               AND CURRENT ROW)),
        |scored AS (
        |  SELECT q AS split_q, nl AS n_left, tn - nl AS n_right,
        |         syl AS sum_left_cents, tsy - syl AS sum_right_cents,
        |         CAST(syl AS DOUBLE) * syl / nl
        |           + CAST(tsy - syl AS DOUBLE) * (tsy - syl) / (tn - nl) AS score
        |  FROM cum, tot WHERE nl < tn)
        |SELECT split_q, n_left, n_right, sum_left_cents, sum_right_cents,
        |       score, score = max(score) OVER () AS is_best
        |FROM scored ORDER BY split_q""".stripMargin,
    "ml_naive_bayes" ->
      """WITH toks AS (
        |  SELECT doc_id, lang, t AS tok FROM (
        |    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS t
        |    FROM documents)
        |  WHERE t <> ''),
        |tok_class AS (
        |  SELECT lang AS clang, tok, count(*) AS ctc
        |  FROM toks GROUP BY lang, tok),
        |vocab AS (SELECT count(DISTINCT tok) AS v FROM toks),
        |class_tot AS (SELECT clang, sum(ctc) AS tc FROM tok_class GROUP BY clang),
        |n_docs AS (SELECT count(*) AS n_total FROM documents),
        |priors AS (
        |  SELECT cd.clang,
        |         CAST(round(ln(cd.c_docs::DOUBLE / n_docs.n_total) * 1000000)
        |              AS BIGINT) AS prior_m,
        |         CAST(round(ln((ct.tc + vocab.v)::DOUBLE) * 1000000)
        |              AS BIGINT) AS lntcv_m
        |  FROM (SELECT lang AS clang, count(*) AS c_docs
        |        FROM documents GROUP BY lang) cd
        |  JOIN class_tot ct ON ct.clang = cd.clang, n_docs, vocab),
        |doc_toks AS (
        |  SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY doc_id, tok),
        |doc_len AS (SELECT doc_id, sum(cnt) AS n_d FROM doc_toks GROUP BY doc_id),
        |matched AS (
        |  SELECT dt.doc_id, tc.clang,
        |         sum(CAST(round(dt.cnt * ln((tc.ctc + 1)::DOUBLE) * 1000000)
        |                  AS BIGINT)) AS sum_m
        |  FROM doc_toks dt JOIN tok_class tc ON tc.tok = dt.tok
        |  GROUP BY dt.doc_id, tc.clang),
        |scored AS (
        |  SELECT d.doc_id, d.lang, p.clang,
        |         COALESCE(m.sum_m, 0) - dl.n_d * p.lntcv_m + p.prior_m AS score_m
        |  FROM documents d
        |  CROSS JOIN priors p
        |  LEFT JOIN matched m ON m.doc_id = d.doc_id AND m.clang = p.clang
        |  JOIN doc_len dl ON dl.doc_id = d.doc_id)
        |SELECT doc_id, lang, clang AS pred, CAST(score_m AS BIGINT) AS score_micro
        |FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
        |                                   ORDER BY score_m DESC, clang) AS rn
        |      FROM scored)
        |WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "ml_logreg_step" ->
      """WITH rows_ AS (
        |  SELECT l_discount AS x1, l_tax AS x2,
        |         CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END AS y
        |  FROM lineitem),
        |terms AS (
        |  SELECT y,
        |         1.0 / (1.0 + exp(-(0.1 + (-0.2) * x1 + 0.3 * x2))) AS p,
        |         x1, x2
        |  FROM rows_),
        |sums AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         sum(CAST(round((p - y) * 1000000) AS BIGINT)) AS sg0,
        |         sum(CAST(round((p - y) * x1 * 1000000) AS BIGINT)) AS sg1,
        |         sum(CAST(round((p - y) * x2 * 1000000) AS BIGINT)) AS sg2,
        |         sum(CAST(round(-(y * ln(p) + (1.0 - y) * ln(1.0 - p)) * 1000000)
        |                  AS BIGINT)) AS loss_micro
        |  FROM terms)
        |SELECT n,
        |       round(0.1 - 0.5 * (sg0::DOUBLE / 1000000 / n), 6) AS w0_new,
        |       round(-0.2 - 0.5 * (sg1::DOUBLE / 1000000 / n), 6) AS w1_new,
        |       round(0.3 - 0.5 * (sg2::DOUBLE / 1000000 / n), 6) AS w2_new,
        |       CAST(loss_micro AS BIGINT) AS loss_micro
        |FROM sums""".stripMargin,
    "ml_feature_hash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, t AS tok FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS t
         |    FROM documents WHERE doc_id < 50)
         |  WHERE t <> ''),
         |feats AS (
         |  SELECT doc_id,
         |         CAST(${fnvIhash31("tok")} % 256 AS BIGINT) AS feat,
         |         CASE WHEN ${fnvIhash31("'s#' || tok")} % 2 = 0
         |              THEN 1 ELSE -1 END AS sign
         |  FROM toks)
         |SELECT doc_id, feat, CAST(sum(sign) AS BIGINT) AS weight
         |FROM feats GROUP BY doc_id, feat
         |HAVING sum(sign) <> 0
         |ORDER BY doc_id, feat""".stripMargin
  )
}
