package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Cross
import graft.functions.TextFns

/** Content-based recommender (the reference's flagship model,
  * models/content_based_model.py): business TF-IDF profiles over a
  * top-V vocabulary, user profiles as means of rated-business vectors,
  * cosine affinity, and the geometric decision rule with the cold-start
  * cascade.
  *
  * Differences from the reference worth noting (SURVEY.md §7.3):
  *  - TF-IDF uses the reference's exact formula tf·log2(N/df)
  *    (models/content_based_model.py:163), not MLlib IDF's smoothed log.
  *  - Profiles live in "long form" (entity, term, weight) relations, not
  *    driver-side dicts (reference A9 collectAsMap): at 100 TB the profile
  *    table shuffles on term for the cosine join and nothing lands on the
  *    driver.
  *  - The vocabulary is the global top-V terms by their max TF-IDF
  *    (reference T1/A6 `take(TOP_TFIDF)`), V configurable.
  */
object ContentBased {

  /** Per-business TF-IDF over `bizText(business_id, text)`:
    * returns (business_id, term, tfidf). */
  def bizTfidf(bizText: DataFrame): DataFrame = {
    val tok = bizText
      .select(col("business_id"), explode(TextFns.contentTokens(col("text"))).as("term"))
    val tf = tok.groupBy("business_id", "term").agg(count(lit(1)).as("tf"))
    // df derived FROM tf (round 15, guide §2.4): tf already holds one
    // row per distinct (business, term), so the document frequency is a
    // row count per term over tf — identical to the old
    // `tok.distinct().groupBy(term).count()`, but now both consumers of
    // the tokenize → explode → partial-count subtree share ONE
    // (business_id, term) exchange (the old distinct's exchange carried
    // different aggregate expressions, so ReuseExchange could not fire
    // and the corpus was tokenized twice per tfidf build).
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = bizText.select("business_id").distinct().count()
    tf.join(df, "term")
      .select(col("business_id"), col("term"),
        Cross.r6(col("tf") * log(2.0, lit(n.toDouble) / col("df").cast("double"))).as("tfidf"))
  }

  /** Top-V vocabulary by max TF-IDF any business attains (T1/A6). */
  def vocabulary(tfidf: DataFrame, v: Int): DataFrame =
    tfidf.groupBy("term")
      .agg(Cross.r6(max("tfidf")).as("max_tfidf"))
      .orderBy(col("max_tfidf").desc, col("term"))
      .limit(v)

  /** Business profiles restricted to the vocabulary: (business_id, term, w). */
  def bizProfiles(tfidf: DataFrame, vocab: DataFrame): DataFrame =
    tfidf.join(vocab.select("term"), "term")
      .select(col("business_id"), col("term"), col("tfidf").as("w"))

  /** User profiles: per-term mean over the user's rated businesses,
    * zeros included via the rated-business count (A12 — reference
    * models/extended_content_model.py:156-169 semantics). */
  def userProfiles(reviews: DataFrame, bizProf: DataFrame): DataFrame = {
    val rated = Recommender.dedupReviews(reviews).select("user_id", "business_id")
    val nRated = rated.groupBy("user_id").agg(count(lit(1)).as("n_rated"))
    rated.join(bizProf, "business_id")
      .groupBy("user_id", "term")
      .agg(Cross.dsum(col("w"), 6).as("sw"))
      .join(nRated, "user_id")
      .select(col("user_id"), col("term"),
        Cross.r6(col("sw") / col("n_rated").cast("double")).as("uw"))
  }

  /** Cosine affinity between user and business profiles for given pairs:
    * sparse dot on the term join, norms per entity; missing profile or
    * zero norm → 0 (drives the rule toward the business average). */
  def profileCosine(pairs: DataFrame, userProf: DataFrame, bizProf: DataFrame): DataFrame = {
    val dots = pairs
      .join(userProf, "user_id")
      .join(bizProf, Seq("business_id", "term"))
      .groupBy("user_id", "business_id")
      .agg(Cross.dxsum(col("uw"), col("w")).as("dot"))
    val un = userProf.groupBy("user_id").agg(Cross.dxsum(col("uw"), col("uw")).as("usq"))
    val bn = bizProf.groupBy("business_id").agg(Cross.dxsum(col("w"), col("w")).as("bsq"))
    pairs
      .join(dots, Seq("user_id", "business_id"), "left")
      .join(un, Seq("user_id"), "left")
      .join(bn, Seq("business_id"), "left")
      .select(col("user_id"), col("business_id"),
        Cross.r6(when(col("dot").isNull || col("usq").isNull || col("bsq").isNull ||
            col("usq") === 0.0 || col("bsq") === 0.0, 0.0)
          .otherwise(col("dot") / (sqrt(col("usq")) * sqrt(col("bsq"))))).as("cos"))
  }

  /** M9: the reference's selectable profile encodings over the top-V
    * vocabulary (models/content_based_model.py:209-258, FEATURES config).
    *  - 'onehot': binary presence — w = 1 where the entity's tokens
    *    contain the vocabulary term.
    *  - 'continuous': w = the GLOBAL top-term TF-IDF value (the term's
    *    vocabulary score), NOT a per-entity weight — the SURVEY §7.3.2
    *    trap: the reference's `_encode` writes `top_terms[w]`
    *    (content_based_model.py:252-257).
    * Input: `entityTokens(entity_id, term)` (dupes fine — set semantics
    * applied here); `vocab(term, max_tfidf)` from [[vocabulary]].
    * Output long form (entity_id, term, w): the dense 0-padding of the
    * reference is representational only — cosines over the long form are
    * identical and nothing materializes V columns per row at scale. */
  def encodedProfiles(entityTokens: DataFrame, vocab: DataFrame, encoding: String,
      assumeDistinct: Boolean = false): DataFrame = {
    // assumeDistinct: callers feeding an already-(entity_id, term)-
    // distinct relation (e.g. a cached token table shared by several
    // encoding arms) skip the set-semantics shuffle — four arms over
    // the same cached input otherwise pay four redundant distincts
    val base = entityTokens.select("entity_id", "term")
    val present = (if (assumeDistinct) base else base.distinct())
      .join(vocab, "term")
    encoding match {
      case "onehot" =>
        present.select(col("entity_id"), col("term"), lit(1.0).as("w"))
      case "continuous" =>
        present.select(col("entity_id"), col("term"), col("max_tfidf").as("w"))
      case other =>
        throw new IllegalArgumentException(
          s"unknown profile encoding '$other' (expected onehot/continuous)")
    }
  }

  /** MLlib sparse TF-IDF path (R3 — the reference's `sparse` config uses
    * HashingTF + mllib IDF with its own smoothed-log formula,
    * models/content_based_model.py:195-204; preserved as a distinct path
    * per SURVEY.md §7.2 rather than merged with the exact log2 TF-IDF). */
  def hashingTfidf(bizText: DataFrame, numFeatures: Int, minDocFreq: Int = 2): DataFrame = {
    import org.apache.spark.ml.feature.{HashingTF, IDF}
    val tokened = bizText.select(col("business_id"),
      TextFns.contentTokens(col("text")).as("tokens"))
    val tf = new HashingTF()
      .setInputCol("tokens").setOutputCol("tf").setNumFeatures(numFeatures)
      .transform(tokened)
    new IDF().setInputCol("tf").setOutputCol("tfidf").setMinDocFreq(minDocFreq)
      .fit(tf).transform(tf)
      .select("business_id", "tfidf")
  }

  /** M7 decision rules for the has-both-averages case (reference
    * models/content_based_model.py:516-524, config-selected via
    * hp_params.DECISION_RULE in config/config_content.json:8-15). */
  sealed trait DecisionRule
  object DecisionRule {
    /** ū + slope·(cos − bias); reference defaults slope=0.7, bias=0.5. */
    final case class Linear(slope: Double = 0.7, bias: Double = 0.5) extends DecisionRule
    /** cos·ū + (1−cos)·b̄ — the reference's active default. */
    case object Geometric extends DecisionRule
    /** 5·cos. */
    case object Constant extends DecisionRule
  }

  /** Geometric decision rule + cold-start cascade (reference
    * models/content_based_model.py:509-530): both avgs → cos·ū+(1−cos)·b̄;
    * user only → ū; biz only → b̄; neither → 2.5. */
  def predict(pairs: DataFrame, reviews: DataFrame, userProf: DataFrame,
      bizProf: DataFrame): DataFrame =
    predictRuled(pairs, reviews, userProf, bizProf, DecisionRule.Geometric)
      .drop("decision")

  /** M7/P10: prediction under a selectable decision rule, tagged with the
    * `decision` branch that produced each row ('both', 'user_only',
    * 'biz_only', 'cold') so the per-decision RMSE breakdown
    * (Recommender.rmseByDecision) can re-filter like the reference's
    * evaluator (scripts/evaluate.py:104-121). */
  def predictRuled(pairs: DataFrame, reviews: DataFrame, userProf: DataFrame,
      bizProf: DataFrame, rule: DecisionRule): DataFrame = {
    val withCos = profileCosine(pairs, userProf, bizProf)
    val both = rule match {
      case DecisionRule.Linear(slope, bias) =>
        col("user_avg") + lit(slope) * (col("cos") - lit(bias))
      case DecisionRule.Geometric =>
        col("cos") * col("user_avg") + (lit(1.0) - col("cos")) * col("biz_avg")
      case DecisionRule.Constant =>
        lit(5.0) * col("cos")
    }
    val hasU = col("user_avg").isNotNull
    val hasB = col("biz_avg").isNotNull
    withCos
      .join(Recommender.userAvg(reviews), Seq("user_id"), "left")
      .join(Recommender.bizAvg(reviews), Seq("business_id"), "left")
      .select(col("user_id"), col("business_id"), col("cos"),
        when(hasU && hasB, "both").when(hasU, "user_only")
          .when(hasB, "biz_only").otherwise("cold").as("decision"),
        Cross.r6(
          when(hasU && hasB, both)
            .when(hasU, col("user_avg"))
            .when(hasB, col("biz_avg"))
            .otherwise(2.5)).as("pred"))
  }
}
