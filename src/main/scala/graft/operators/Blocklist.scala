package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Multi-phrase blocklist filtering — the safety/compliance pass of a
  * training-data pipeline: given a list of banned phrases (slurs, PII
  * templates, licensed strings), find every occurrence in the corpus at
  * TOKEN granularity ("bad word" matches "Bad-Word!" but not
  * "badword"), count hits per document, and drop or flag offenders.
  *
  * Scale shape: this is a multi-pattern string search, but per-token
  * normalization turns it into relational algebra — the corpus explodes
  * once into (doc, pos, term) and joins the broadcast phrase-token table
  * (pid, j, token_j) on the term, so the work is proportional to how
  * often BLOCKLIST TOKENS appear in the corpus (an inverted-index probe),
  * not corpus x phrases. A candidate position is a full match iff all np
  * tokens of the phrase land at consecutive positions, i.e. the group
  * (doc, pos - j, pid) collects exactly np hits — one grouped count, no
  * per-document array carried through the shuffle, no backtracking scan.
  * Overlapping and repeated-token phrases fall out naturally: each
  * (pos, j) pair is its own row, so "very very bad" matches at every
  * alignment independently.
  *
  * This is deliberately NOT a regex alternation (`(?:p1|p2|...)` scans
  * every character against every pattern and is uncompilable at 10^5
  * phrases) and NOT a per-row Aho-Corasick UDF (a black box to Catalyst);
  * the join form broadcast-scales to large blocklists and keeps the probe
  * a plain shuffle-free hash lookup per token.
  */
object Blocklist {

  /** JVM-side mirror of [[TextFns.tokens]] for normalizing the phrase
    * list itself (both sides must tokenize identically or a phrase can
    * never match). */
  private[graft] def tokenize(s: String): Seq[String] =
    s.toLowerCase.replaceAll("[^a-z0-9]+", " ").split(" ").filter(_.nonEmpty).toSeq

  /** Phrase-token table rows (pid, j, ptok, np) for `phrases`, skipping
    * phrases that normalize to zero tokens. */
  private[graft] def phraseRows(phrases: Seq[String]): Seq[(Int, Int, String, Int)] =
    phrases.zipWithIndex.flatMap { case (p, pid) =>
      val tk = tokenize(p)
      tk.zipWithIndex.map { case (t, j) => (pid, j, t, tk.length) }
    }

  /** Every token-anchored occurrence of every phrase:
    * (doc_id, start, pid) with `start` the 0-based token position where
    * phrase `pid` (index into `phrases`) begins. */
  def phraseMatches(docs: DataFrame, phrases: Seq[String],
      id: Column = col("doc_id"), text: Column = col("text")): DataFrame = {
    require(phrases.nonEmpty, "blocklist must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    val pdf = phraseRows(phrases).toDF("pid", "j", "ptok", "np")
    val tok = docs.select(id.as("doc_id"),
      posexplode(TextFns.tokens(text)).as(Seq("pos", "term")))
    tok.join(broadcast(pdf), col("term") === col("ptok"))
      .filter(col("pos") >= col("j")) // phrase cannot start before the doc
      .groupBy(col("doc_id"), (col("pos") - col("j")).as("start"),
        col("pid"), col("np"))
      .agg(count(lit(1)).as("hit"))
      .filter(col("hit") === col("np"))
      .select(col("doc_id"), col("start").cast("long").as("start"), col("pid"))
  }

  /** Per-document verdict: total occurrence count across all phrases and
    * the blocked flag (hits > maxHits). Every input doc appears exactly
    * once. Returns (doc_id, hits, blocked). */
  def verdicts(docs: DataFrame, phrases: Seq[String], maxHits: Long = 0L,
      id: Column = col("doc_id"), text: Column = col("text")): DataFrame = {
    require(maxHits >= 0L, s"maxHits must be >= 0, got $maxHits")
    val perDoc = phraseMatches(docs, phrases, id, text)
      .groupBy("doc_id").agg(count(lit(1)).as("hits"))
    docs.select(id.as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("hits"))
      .select(col("doc_id"), col("hits"), (col("hits") > maxHits).as("blocked"))
  }

  /** Closed frequent-phrase mining — the blocklist CANDIDATE generator
    * (and boilerplate detector): all word n-grams (2 ≤ n ≤ `maxN`)
    * appearing in at least `minSupport` documents, reduced to the
    * CLOSED ones — a phrase is dropped when some one-word extension
    * occurs in exactly the same documents (equal df), because the
    * longer phrase subsumes it; what survives is the maximal phrase
    * inventory a reviewer actually reads. Returns (n, phrase, df).
    *
    * Scale shape: one shingle explosion per n (distinct per doc, so df
    * is true document frequency; map-side combinable counts), then the
    * closed check joins each n-level against level n+1 on the
    * prefix/suffix phrase string — hash equi-joins on phrase keys,
    * never a phrase-pair product. The equal-df closed criterion is the
    * standard conservative one: it can only UNDER-prune (a kept
    * non-maximal phrase), never lose a maximal phrase. */
  def closedPhrases(docs: DataFrame, maxN: Int, minSupport: Long): DataFrame = {
    require(maxN >= 2 && maxN <= 8, s"maxN out of range: $maxN")
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    val toks = TextFns.tokens(col("text"))
    def dfTab(n: Int): DataFrame = docs
      .select(col("doc_id"), explode(TextFns.shingles(toks, n)).as("phrase"))
      .distinct()
      .groupBy("phrase").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minSupport)
      .withColumn("n", lit(n))
    val levels = (2 to maxN).map(dfTab)
    val closed = levels.init.zip(levels.tail).map { case (cur, next) =>
      // a phrase is open iff an equal-df extension exists with it as
      // prefix (drop last word) or suffix (drop first word)
      val ext = next.select(
          regexp_replace(col("phrase"), " [^ ]+$", "").as("phrase"),
          col("df"))
        .union(next.select(
          regexp_replace(col("phrase"), "^[^ ]+ ", "").as("phrase"),
          col("df")))
        .distinct()
      cur.join(ext, Seq("phrase", "df"), "left_anti")
    } :+ levels.last
    closed.reduce(_ unionByName _).select("n", "phrase", "df")
  }
}
