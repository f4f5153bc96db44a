package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.md5_lower64

/** Supervised text classifiers over hashed bag-of-n-gram features — the
  * quality/domain-filter models a training-data pipeline actually ships
  * (GPT-3/LLaMA-style "does this page look like the reference corpus"
  * filters are linear classifiers over exactly these features; fastText's
  * supervised mode is the canonical implementation).
  *
  * Two model families, chosen so the whole surface is verifiable:
  *
  *  - '''Multinomial Naive Bayes''' — closed-form counts, so BOTH training
  *    and scoring are single-aggregation SQL-expressible and the declared
  *    queries hash-match a DuckDB oracle end-to-end (`ns_quality_nb_*`).
  *  - '''Binary logistic regression''' — iterative gradient descent, not
  *    SQL-expressible; instead the distributed trainer is INTEGER-EXACT
  *    and therefore bit-identical to a serial reference implementation
  *    regardless of partitioning (spec-pinned, the BPE precedent).
  *
  * Scale shape (both): the corpus-sized work per pass is one hash
  * aggregate over the exploded feature stream; the model is ≤
  * `buckets`·classes rows and BROADCASTS back for scoring, so scoring is
  * map-side until the per-document sum (the only corpus-sized shuffle).
  * LR additionally round-trips a ≤`buckets`-row gradient table through
  * the driver per iteration — the PQ-codebook pattern, geometry-bounded
  * state only.
  *
  * Cross-engine / cross-partitioning determinism:
  *  - features hash with `md5_lower64` (== DuckDB `md5_number_lower`);
  *  - NB log-likelihoods and priors round to 6 decimals; per-document
  *    scores fold in feature-position order and round to 4 (the DSIR
  *    conventions, `Curation.dsirLogRatios`);
  *  - LR keeps weights in integer NANO-units and per-doc residuals in
  *    integer MICRO-units, so every distributed sum is an exact `long`
  *    sum — associative and commutative, immune to partition order; the
  *    only floating-point steps (sigmoid, the driver's weight update) run
  *    on deterministic scalar inputs and re-round to the integer grid.
  */
object Classifier {

  /** Hashed unigram+bigram features in position order: one row per
    * feature occurrence `(id, fpos, b)`. The concatenated
    * unigrams-then-bigrams array gives `fpos` a total per-document order,
    * which pins the float summation order for the NB oracle.
    */
  private[operators] def features(df: DataFrame, id: Column, text: Column,
                                  buckets: Int): DataFrame = {
    // token array staged in its own projection (r18): the one-select form
    // inlined the split into three places (both bigram slices + the
    // concat), and HOFs block codegen CSE — so every row paid three
    // regex splits. CollapseProject keeps the boundary (non-cheap expr,
    // >1 reference); the emitted rows are expression-identical.
    val t = col("__ftoks")
    val bi = zip_with(slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => concat(a, lit(" "), b))
    df.select(id.as("id"), TextOps.tokens(text).as("__ftoks"))
      .select(col("id"), posexplode(concat(t, bi)).as(Seq("fpos", "feat")))
      .withColumn("b", pmod(md5_lower64(col("feat")), lit(buckets.toLong)))
      .drop("feat")
  }

  /** The hashed feature stream `(id, fpos, b)` for external count-based
    * trainers (the streaming NB partials).
    */
  private[graft] def featureRows(df: DataFrame, idCol: String,
                                 textCol: String, buckets: Int): DataFrame =
    features(df, col(idCol), col(textCol), buckets)

  /** Train a multinomial NB model. Returns
    * `(label, b, llh)` — per-class add-k-smoothed feature
    * log-likelihoods `ln((n(c,b)+k)/(T(c)+k·buckets))`, rounded 6 — and
    * `(label, prior, llh0)` — `ln(docs_c/docs)` class priors and the
    * per-class default log-likelihood for buckets unseen in class c.
    * Model size ≤ classes·buckets rows: broadcastable by construction.
    */
  def nbTrain(train: DataFrame, idCol: String, textCol: String,
              labelCol: String, buckets: Int = 4096,
              smoothK: Double = 0.5): (DataFrame, DataFrame) = {
    val f = features(train, col(idCol), col(textCol), buckets)
      .join(train.select(col(idCol).as("id"), col(labelCol).as("label")), "id")
    val counts = f.groupBy("label", "b").agg(count(lit(1)).as("n"))
    val totals = f.groupBy("label").agg(count(lit(1)).as("t"))
    val model = counts.join(totals, "label")
      .select(col("label"), col("b"),
        round(log((col("n") + smoothK) / (col("t") + smoothK * buckets)),
          6).as("llh"))
    val nDocs = train.count().toDouble
    val priors = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nc"))
      .join(totals, "label")
      .select(col("label"),
        round(log(col("nc") / nDocs), 6).as("prior"),
        round(log(lit(smoothK) / (col("t") + smoothK * buckets)),
          6).as("llh0"))
    (model, priors)
  }

  /** Score documents against an NB model: per-document per-class
    * log-posterior `prior(c) + Σ_f llh(c, b_f)` (position-ordered fold,
    * rounded 4) and the argmax prediction (ties → lexically smaller
    * label).
    *
    * Plan shape: the model pivots to a broadcast `b → map(label → llh)`
    * table joined ONCE onto the feature stream (the naive
    * feature × class expansion multiplies the corpus-sized relation by
    * |classes| — measured 170 s vs 18 s at 1 M docs / 5 classes); each
    * document's
    * (fpos, map) list is collected and sorted once, then folded once per
    * class in the SAME fpos order, so the float summation — and
    * therefore the oracle hash — is identical to the per-class
    * formulation. Priors/defaults are collected driver-side (|classes|
    * rows) and inlined as literals.
    */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
              model: DataFrame, priors: DataFrame,
              buckets: Int = 4096): DataFrame = {
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("label"))
    nbScores(docs, idCol, textCol, model, priors, buckets)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("label").as("predicted"), col("score"))
  }

  /** The full per-(document, class) log-posterior table
    * `(idCol, label, score)` behind [[nbScore]] — the input a
    * calibration sweep ([[prCurve]]) or a reject-option policy reads.
    * Same broadcast-pivot plan shape and the same position-ordered fold,
    * so scores are bit-identical to the argmax path's.
    */
  def nbScores(docs: DataFrame, idCol: String, textCol: String,
               model: DataFrame, priors: DataFrame,
               buckets: Int = 4096): DataFrame = {
    val pri = priors.select("label", "prior", "llh0").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    val wide = broadcast(model.groupBy("b")
      .agg(map_from_entries(collect_list(struct(col("label"), col("llh"))))
        .as("m")))
    // struct contains a MAP, so the default struct ordering is
    // unavailable — sort on fpos alone with an explicit comparator
    // (fpos is unique per document, so the order is total)
    val sortedM = transform(
      array_sort(collect_list(struct(col("fpos"), col("m"))),
        (l, r) => when(l.getField("fpos") < r.getField("fpos"), -1)
          .when(l.getField("fpos") > r.getField("fpos"), 1)
          .otherwise(0)),
      s => s.getField("m"))
    val scoresArr = array(pri.toIndexedSeq.map { case (label, prior, llh0) =>
      struct(
        round(lit(prior) + aggregate(col("ms"),
          lit(0.0),
          (acc, m) => acc + coalesce(element_at(m, lit(label)), lit(llh0))),
          4).as("score"),
        lit(label).as("label"))
    }: _*)
    features(docs, col(idCol), col(textCol), buckets)
      .join(wide, Seq("b"), "left")
      .groupBy("id")
      .agg(sortedM.as("ms"))
      .select(col("id"), posexplode(scoresArr).as(Seq("ord", "sl")))
      .select(col("id").as(idCol), col("sl.label").as("label"),
        col("sl.score").as("score"))
  }

  /** Threshold-sweep calibration report over any scored binary relation:
    * one row per DISTINCT score value (descending), with the confusion
    * counts and precision/recall/F1 of the policy "keep when
    * score ≥ threshold" — the table a filtering team reads before picking
    * a keep threshold over [[lrScore]]/[[nbScores]] output.
    *
    * Plan shape: one corpus-sized groupBy collapses the input to the
    * distinct-score relation (bounded by the 4-decimal score grid, NOT
    * the corpus), then one cumulative window and a broadcast 1-row total
    * ride that small relation. Ratios divide exact `long` counts and
    * round to 6; F1 derives from the ROUNDED precision/recall so the
    * arithmetic is reproducible cross-engine.
    */
  def prCurve(scored: DataFrame, scoreCol: String,
              positive: Column): DataFrame = {
    val g = scored
      .select(col(scoreCol).as("thr"), positive.cast("boolean").as("pos"))
      // match rocAuc: a null label belongs to neither class — counting
      // its threshold row (in neither np nor nn) would make the two
      // curves disagree about which thresholds exist on the same input
      .filter(col("pos").isNotNull)
      .groupBy("thr").agg(
        count(when(col("pos"), 1)).as("np"),
        count(when(!col("pos"), 1)).as("nn"))
    val w = Window.orderBy(col("thr").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prec = round(col("tp").cast("double") / (col("tp") + col("fp")), 6)
    // guard the degenerate no-positives input (0/0 → NaN would poison f1)
    val rec = when(col("tpos") > 0,
      round(col("tp").cast("double") / col("tpos"), 6)).otherwise(lit(0.0))
    g.crossJoin(broadcast(g.agg(sum("np").as("tpos"))))
      .withColumn("tp", sum("np").over(w))
      .withColumn("fp", sum("nn").over(w))
      .select(col("thr"), col("tp"), col("fp"),
        (col("tpos") - col("tp")).as("fn"),
        prec.as("prec"), rec.as("rec"),
        when(prec + rec > 0,
          round(lit(2) * prec * rec / (prec + rec), 6))
          .otherwise(lit(0.0)).as("f1"))
  }

  /** ROC-AUC of a scored binary relation — the single ranking-quality
    * number (P[score_pos > score_neg] + ½·P[tie], the tie-corrected
    * Mann–Whitney U statistic) a filter team tracks across model
    * versions, complementing [[prCurve]]'s threshold sweep. Returns one
    * row `(n_pos, n_neg, auc)`; degenerate inputs (no positives or no
    * negatives) return auc 0.
    *
    * Plan shape: same as [[prCurve]] — one corpus-sized groupBy collapses
    * to the distinct-score relation (bounded by the 4-decimal score grid,
    * not the corpus); the cumulative window and final 1-row aggregate
    * ride that small relation. All arithmetic is exact integer sums
    * (pairs won = Σ np·cumneg, ties = Σ np·nn) until the single final
    * division, rounded to 6 — bit-reproducible cross-engine.
    */
  def rocAuc(scored: DataFrame, scoreCol: String,
             positive: Column): DataFrame = {
    val g = scored
      .select(col(scoreCol).as("s"), positive.cast("boolean").as("pos"))
      .filter(col("pos").isNotNull)
      .groupBy("s").agg(
        count(when(col("pos"), 1)).as("np"),
        count(when(!col("pos"), 1)).as("nn"))
    // negatives strictly BELOW each score (ascending cumulative, exclusive)
    val w = Window.orderBy(col("s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    g.withColumn("cumneg", coalesce(sum("nn").over(w), lit(0L)))
      .agg(sum("np").as("n_pos"), sum("nn").as("n_neg"),
        sum(col("np") * col("cumneg")).as("u_gt"),
        sum(col("np") * col("nn")).as("u_tie"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round((col("u_gt").cast("double") +
            lit(0.5) * col("u_tie").cast("double")) /
            (col("n_pos").cast("double") * col("n_neg").cast("double")), 6))
          .otherwise(lit(0.0)).as("auc"))
  }

  /** Per-document posterior P(target | doc) from the per-class NB scores
    * (`(doc_id, label, score)` — [[nbScores]] output): computed in
    * log-space as `1 / (1 + Σ_{c≠target} exp(s_c − s_target))` so no
    * un-normalized likelihood overflows. Cross-engine determinism: scores
    * are already rounded (4); each exp term rounds to 6 and the class sum
    * folds in LABEL order; the posterior rounds to 6. Returns
    * `(doc_id, p)`.
    */
  def nbPosterior(scores: DataFrame, target: String): DataFrame =
    scores.groupBy("doc_id")
      .agg(max(when(col("label") === target, col("score"))).as("s_t"),
        array_sort(collect_list(struct(col("label"), col("score"))))
          .as("a"))
      .filter(col("s_t").isNotNull)
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + aggregate(
          filter(col("a"), s => s.getField("label") =!= target),
          lit(0.0),
          (acc, s) => acc +
            round(exp(s.getField("score") - col("s_t")), 6))), 6).as("p"))

  /** Calibration (reliability) bins over a [0,1] probability column on
    * the engine's rounded grid: bin `i` holds predictions in
    * [i/bins, (i+1)/bins) (the last bin closed at 1.0), reporting count,
    * positive count, empirical positive rate, mean predicted
    * probability, and the calibration gap — the table a reliability
    * diagram plots, and what decides whether a filter's scores can be
    * thresholded by probability at all.
    *
    * Determinism: binning floors an identical double expression on both
    * engines; the mean prediction sums the 1e-6-grid probabilities as
    * exact integers (`Σ round(p·10⁶)`), so it is partition-order-free —
    * a plain float sum would depend on row order.
    */
  def calibrationBins(scored: DataFrame, probCol: String,
                      positive: Column, bins: Int = 10): DataFrame = {
    require(bins > 0, s"need bins > 0, got $bins")
    val b = least(lit(bins - 1),
      floor(col(probCol) * bins).cast("int")).as("bin")
    scored.select(b, col(probCol).as("p"),
        positive.cast("boolean").as("pos"))
      .filter(col("pos").isNotNull)
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        count(when(col("pos"), 1)).as("n_pos"),
        sum(round(col("p") * 1e6).cast("long")).as("psum"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n"), 6).as("pos_rate"),
        round(col("psum").cast("double") / 1e6 / col("n"), 6).as("mean_pred"))
      .withColumn("gap", round(col("mean_pred") - col("pos_rate"), 6))
      .orderBy("bin")
  }

  private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /** Per-document feature ARRAYS `(id, y, bs, cnts)` — the LR trainer's
    * working relation: each document's distinct hashed buckets and their
    * multiplicities as two aligned arrays, prefixed with the bias
    * pseudo-feature (`b = -1, cnt = 1`). One row per document, so margins
    * are a per-row codegen'd fold ([[graft.functions.BucketWeightSum]])
    * and the training loop never shuffles document-sized state again.
    */
  private[graft] def lrFeatureArrays(train: DataFrame, idCol: String,
                                     textCol: String, positive: Column,
                                     buckets: Int): DataFrame = {
    val y = train.select(col(idCol).as("id"),
      when(positive, 1L).otherwise(0L).as("y"))
    features(train, col(idCol), col(textCol), buckets)
      .groupBy("id", "b").agg(count(lit(1)).as("cnt"))
      .groupBy("id")
      .agg(collect_list(struct(col("b"), col("cnt"))).as("f"))
      .join(y, "id")
      .select(col("id"), col("y"),
        concat(array(lit(-1L)), transform(col("f"), s => s.getField("b")))
          .as("bs"),
        concat(array(lit(1L)), transform(col("f"), s => s.getField("cnt")))
          .as("cnts"))
  }

  /** Train binary logistic regression by full-batch gradient descent.
    *
    * Determinism contract (what makes the distributed run EQUAL the
    * serial reference bit-for-bit, any partitioning): weights live on an
    * integer nano-grid (`w_nano: long`), per-document residuals on a
    * micro-grid (`round((p−y)·1e6): long`), so the margin
    * `Σ w_nano[b]·cnt` and the gradient `Σ residual·cnt` are exact long
    * sums — order-free. The driver's update
    * `w ← w − lr·(grad/1e6)/N` runs in scalar doubles on deterministic
    * inputs and re-rounds to the nano grid.
    *
    * Scale shape: the per-document feature arrays are built ONCE
    * (local-checkpointed); each iteration then runs ZERO-SHUFFLE margins —
    * weights ride a torrent broadcast probed by the codegen'd
    * [[graft.functions.BucketWeightSum]] fold, so no join and no
    * document-keyed aggregation — followed by one bucket-keyed gradient
    * aggregate whose map-side partials compress to ≤ `buckets`+1 rows per
    * task before the (tiny) shuffle; the collected gradient is ≤
    * `buckets`+1 rows (the PQ-codebook driver round-trip). Measured at
    * 1 M docs (ScaleSmoke classifier stage): 12.7 s for 5 iterations vs
    * 118 s for the join+groupBy formulation — 9×.
    *
    * Returns the model as `(b, w)` rows (bias at `b = -1`), storable as a
    * tiny parquet — plus the nano weights for exact reuse.
    */
  def lrTrain(train: DataFrame, idCol: String, textCol: String,
              positive: Column, buckets: Int = 1024, iters: Int = 5,
              learnRate: Double = 0.5): DataFrame = {
    val spark = train.sparkSession
    import spark.implicits._
    import graft.functions.{bucket_grad_sum, bucket_weight_sum}
    val f = lrFeatureArrays(train, idCol, textCol, positive, buckets)
      .localCheckpoint()
    val nDocs = f.count()

    var wNano = Array.fill(buckets + 1)(0L) // [bias at b=-1, w_0 .. w_{buckets-1}]
    for (_ <- 0 until iters) {
      val wB = spark.sparkContext.broadcast(wNano)
      // r18 optimization: the gradient folds into a FIXED buckets+1-slot
      // long array per task ([[graft.functions.BucketGradSum]]) instead
      // of explode(arrays_zip) → groupBy(b) → sum — one job per
      // iteration whose exchange carries a single ~8·(buckets+1)-byte
      // row per map task (vs a bucket-keyed shuffle of one row per
      // (task, bucket) plus a second aggregate). Long addition commutes,
      // so the gradient is bit-identical to the grouped form under any
      // partitioning — the serial-equality contract is untouched (the
      // bias pseudo-feature b = -1 rides slot 0 exactly as before).
      val grads =
        try {
          f.withColumn("m_nano",
              bucket_weight_sum(wB, col("bs"), col("cnts")))
            .withColumn("r_micro",
              round(lit(1e6) / (lit(1.0) + exp(-(col("m_nano") / 1e9))))
                .cast("long") - col("y") * 1000000L)
            .select(bucket_grad_sum(col("bs"), col("cnts"),
              col("r_micro"), buckets + 1).as("g"))
            .head().getSeq[Long](0)
        } finally wB.destroy()
      val upd = (wOld: Long, g: Long) =>
        math.round(wOld.toDouble - learnRate * (g / 1e6) / nDocs * 1e9)
      wNano = Array.tabulate(buckets + 1)(i => upd(wNano(i), grads(i)))
    }
    wNano.zipWithIndex
      .map { case (w, i) => (i - 1L, w, w / 1e9) }
      .toSeq.toDF("b", "w_nano", "w")
  }

  /** Serial reference trainer: identical arithmetic to [[lrTrain]] on
    * in-memory rows `(text, y)` — the executable statement of the
    * determinism contract, shipped (not spec-only) so the
    * `ns_quality_lr_audit` query can hash a distributed-equals-serial
    * verdict through the driver's oracle gate. Returns nano-grid weights
    * `[bias, w_0 .. w_{buckets-1}]`.
    */
  def lrTrainSerial(rows: Seq[(String, Long)], buckets: Int = 1024,
                    iters: Int = 5, learnRate: Double = 0.5): Array[Long] = {
    import org.apache.spark.unsafe.types.UTF8String
    def bucket(feat: String): Long = {
      val h = graft.functions.TextHashKernels
        .md5Lower64(UTF8String.fromString(feat))
      ((h % buckets) + buckets) % buckets
    }
    val featRows = rows.map { case (text, y) =>
      val t = text.trim.toLowerCase.split("\\s+").toSeq
      val f = t ++ t.sliding(2).filter(_.size == 2).map(_.mkString(" "))
      (y, f.groupBy(bucket).map { case (b, xs) => b -> xs.size.toLong })
    }
    val n = rows.size
    var w = Array.fill(buckets + 1)(0L)
    for (_ <- 0 until iters) {
      val resid = featRows.map { case (y, cnts) =>
        val mNano = cnts.map { case (b, c) => w(b.toInt + 1) * c }.sum + w(0)
        (math.round(1e6 / (1.0 + math.exp(-(mNano / 1e9)))) - y * 1000000L,
          cnts)
      }
      val grads = resid.flatMap { case (rm, cnts) =>
        cnts.map { case (b, c) => b -> rm * c }
      }.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).sum }
      val biasGrad = resid.map(_._1).sum
      def upd(wOld: Long, g: Long): Long =
        math.round(wOld.toDouble - learnRate * (g / 1e6) / n * 1e9)
      w = upd(w(0), biasGrad) +:
        Array.tabulate(buckets)(b => upd(w(b + 1), grads.getOrElse(b.toLong, 0L)))
    }
    w
  }

  /** Score documents with an LR model (as produced by [[lrTrain]]):
    * margin on the exact nano grid, probability `sigmoid(margin)` rounded
    * 6, prediction at p ≥ 0.5. Broadcast model; one id-keyed shuffle.
    */
  def lrScore(docs: DataFrame, idCol: String, textCol: String,
              model: DataFrame, buckets: Int = 1024): DataFrame = {
    // r18 optimization: the model is a ≤ buckets+1-row relation by
    // construction — collect it into the same dense [bias, w_0..] array
    // lrTrain trains and probe it with the zero-shuffle
    // [[graft.functions.BucketWeightSum]] fold, instead of a
    // broadcast-join against the model relation followed by a second
    // id-keyed aggregate. Saves one join and one shuffle per scoring
    // pass; the margin is the same exact long dot (slot b+1, bias at 0),
    // so margins/p/predicted are bit-identical.
    import graft.functions.bucket_weight_sum
    val spark = docs.sparkSession
    val wNano = {
      val w = new Array[Long](buckets + 1)
      model.select(col("b"), col("w_nano")).collect().foreach { r =>
        val idx = r.getLong(0) + 1
        if (idx >= 0 && idx < w.length) w(idx.toInt) = r.getLong(1)
      }
      w
    }
    val wB = spark.sparkContext.broadcast(wNano)
    val f = features(docs, col(idCol), col(textCol), buckets)
      .groupBy("id", "b").agg(count(lit(1)).as("cnt"))
      .groupBy("id")
      .agg(collect_list(struct(col("b"), col("cnt"))).as("f"))
      .select(col("id"),
        concat(array(lit(-1L)), transform(col("f"), s => s.getField("b")))
          .as("bs"),
        concat(array(lit(1L)), transform(col("f"), s => s.getField("cnt")))
          .as("cnts"))
    f.select(col("id").as(idCol),
        bucket_weight_sum(wB, col("bs"), col("cnts")).as("m"))
      .select(col(idCol),
        round(col("m") / 1e9, 6).as("margin"),
        round(lit(1.0) / (lit(1.0) + exp(-(col("m") / 1e9))), 6).as("p"))
      .withColumn("predicted", (col("p") >= 0.5).cast("int"))
  }

  /** Per-class precision / recall / F1 over a (predicted, actual) label
    * relation — the multi-class completion of the binary [[prCurve]]:
    * one row per class seen on EITHER side (a class the model never
    * predicts still reports its recall=0 row — silently dropping it is
    * how macro averages get inflated), counts exact, the three ratios
    * on the HALF_UP micro-unit grid with 0 for an empty denominator and
    * F1 derived from the ROUNDED micro P/R
    * (`HALF_UP(2·P·R / (P+R))`) so the arithmetic is integer-exact
    * cross-engine end to end. Null-on-either-side rows drop (the
    * [[prCurve]]/[[cohenKappa]] convention).
    *
    * Plan shape: three label-sized groupBys off one corpus scan, joined
    * on the label — label-cardinality shuffles only.
    */
  def classPrf(labeled: DataFrame, predCol: String,
               actualCol: String): DataFrame = {
    val pairs = labeled
      .select(col(predCol).cast("string").as("p"),
        col(actualCol).cast("string").as("a"))
      .filter(col("p").isNotNull && col("a").isNotNull)
    val classes = pairs.select(col("a").as("label"))
      .unionByName(pairs.select(col("p").as("label"))).distinct()
    val tp = pairs.filter(col("p") === col("a"))
      .groupBy(col("a").as("label")).agg(count(lit(1)).as("tp"))
    val pc = pairs.groupBy(col("p").as("label"))
      .agg(count(lit(1)).as("pc"))
    val ac = pairs.groupBy(col("a").as("label"))
      .agg(count(lit(1)).as("ac"))
    classes
      .join(tp, Seq("label"), "left")
      .join(pc, Seq("label"), "left")
      .join(ac, Seq("label"), "left")
      .na.fill(0L, Seq("tp", "pc", "ac"))
      .withColumn("fp", col("pc") - col("tp"))
      .withColumn("fn", col("ac") - col("tp"))
      .withColumn("prec_micro", when(col("pc") > 0,
        expr("(2000000 * tp + pc) div (2 * pc)")).otherwise(lit(0L)))
      .withColumn("rec_micro", when(col("ac") > 0,
        expr("(2000000 * tp + ac) div (2 * ac)")).otherwise(lit(0L)))
      .withColumn("f1_micro", when(col("prec_micro") + col("rec_micro") > 0,
        expr("(2 * (2 * prec_micro * rec_micro) + " +
          "(prec_micro + rec_micro)) div " +
          "(2 * (prec_micro + rec_micro))")).otherwise(lit(0L)))
      .select("label", "tp", "fp", "fn", "prec_micro", "rec_micro",
        "f1_micro")
  }

  /** Cohen's kappa — CHANCE-CORRECTED agreement between two label
    * columns (classifier-vs-truth for a model QC gate, or
    * annotator-vs-annotator for label QC — the statistic that separates
    * "94% accurate" from "94% accurate on a 94%-majority-class corpus"):
    * `κ = (p_o − p_e) / (1 − p_e)` with `p_o` the observed agreement and
    * `p_e = Σ_l row_l·col_l / n²` the marginal-product chance agreement.
    * One row `(n, diag, po_micro, pe_micro, kappa_micro)`, INTEGER-EXACT
    * on the HALF_UP micro-unit grid: the marginal cross products
    * `row_l·col_l` sum as decimal(38,0) (int64 overflows past ~3e9
    * rows), the three divisions run in driver BigInt off 1-row
    * aggregates (the corpusDrift convention), and a below-chance kappa
    * rounds half-AWAY-FROM-ZERO (`sign·HALF_UP(|num|/den)`) so the
    * floor-vs-truncate divergence between engines' integer division
    * never arises. Rows with a null on either side are dropped (the
    * prCurve convention: an unlabeled row belongs to no agreement
    * class); a degenerate `p_e = 1` table (both sides constant and
    * equal) reports κ = 0.
    *
    * Plan shape: one corpus aggregate + two label-sized groupBys joined
    * on the label — corpus-sized scans, label-cardinality shuffles,
    * nothing quadratic.
    */
  def cohenKappa(labeled: DataFrame, predCol: String,
                 actualCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val pairs = labeled
      .select(col(predCol).cast("string").as("p"),
        col(actualCol).cast("string").as("a"))
      .filter(col("p").isNotNull && col("a").isNotNull)
      .cache()
    val head = pairs.agg(count(lit(1)).as("n"),
        sum(when(col("p") === col("a"), 1L).otherwise(0L)).as("diag"))
      .collect().head
    val (n, diag) = (head.getLong(0), head.getLong(1))
    require(n > 0, "cohenKappa needs at least one non-null labeled row")
    val chance = BigInt(pairs.groupBy("p").agg(count(lit(1)).as("r"))
      .join(pairs.groupBy(col("a").as("p")).agg(count(lit(1)).as("c")),
        "p")
      .agg(coalesce(sum(col("r").cast(dec) * col("c").cast(dec)),
        lit(0).cast(dec)).as("ch"))
      .collect().head.getDecimal(0).toBigInteger)
    pairs.unpersist()
    val n2 = BigInt(n) * n
    val po = ((BigInt(diag) * 2000000 + n) / (BigInt(n) * 2)).toLong
    val pe = ((chance * 2000000 + n2) / (n2 * 2)).toLong
    val num = BigInt(n) * diag - chance
    val den = n2 - chance
    val kappa =
      if (den == 0) 0L
      else {
        val mag = ((num.abs * 2000000 + den) / (den * 2)).toLong
        if (num < 0) -mag else mag
      }
    val spark = labeled.sparkSession
    import spark.implicits._
    Seq((n, diag, po, pe, kappa))
      .toDF("n", "diag", "po_micro", "pe_micro", "kappa_micro")
  }
}
