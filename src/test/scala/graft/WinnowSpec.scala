package graft

import org.apache.spark.sql.functions._

import graft.operators.Winnow

/** Winnowing fingerprints vs a literal sequential implementation of the
  * SIGMOD'03 algorithm (rightmost minimum of every sliding window), plus
  * the shared-run guarantee and the overlap pair/df-cap behavior. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private def h31(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % 2147483647L
  }

  private def toks(t: String): Seq[String] =
    t.toLowerCase.replaceAll("[^a-z0-9]+", " ").split(" ").filter(_.nonEmpty).toSeq

  private def grams(t: String, k: Int): Seq[Long] = {
    val tk = toks(t)
    if (tk.length < k) Seq.empty else tk.sliding(k).map(g => h31(g.mkString(" "))).toSeq
  }

  /** The paper's definition, run sequentially: for every window position,
    * select the rightmost index attaining the window minimum. */
  private def seqWinnow(hs: Seq[Long], w: Int): Set[Int] = {
    val n = hs.length
    if (n == 0) Set.empty
    else {
      val weff = math.min(w, n)
      (0 to n - weff).map { i =>
        val win = hs.slice(i, i + weff)
        i + win.lastIndexOf(win.min)
      }.toSet
    }
  }

  private val vocab = Seq("spark", "scan", "row", "key", "agg", "sort", "hash",
    "table", "merge", "batch", "the", "a", "fast", "slow", "window")

  test("fingerprints match the sequential rightmost-min definition") {
    val rnd = new scala.util.Random(7)
    val docs = (0 until 60).map { i =>
      val len = rnd.nextInt(40) // includes docs shorter than k and than w+k-1
      (i.toLong, (0 until len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    for (w <- Seq(2, 4, 7); k <- Seq(2, 3)) {
      val got = Winnow.fingerprints(docs.toDF("doc_id", "text"), k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1).toInt, r.getLong(2))).toSet
      val want = docs.flatMap { case (id, t) =>
        val hs = grams(t, k)
        seqWinnow(hs, w).map(p => (id, p, hs(p)))
      }.toSet
      assert(got === want, s"mismatch at k=$k w=$w")
    }
  }

  test("any shared run of w+k-1 tokens yields a shared fingerprint hash") {
    val k = 3; val w = 4
    val run = "alpha beta gamma delta epsilon zeta" // w+k-1 = 6 tokens
    val a = s"spark scan row $run key agg sort"
    val b = s"merge batch table hash $run window fast slow the"
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, k, w)
      .groupBy("fp").agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") === 2).count()
    assert(fps >= 1, "shared run must surface at least one common fingerprint")
    val pairs = Winnow.overlapPairs(docs, k, w, minShared = 1L).collect()
    assert(pairs.length === 1)
    val p = pairs.head
    assert(p.getLong(0) === 1L && p.getLong(1) === 2L)
    assert(p.getDouble(5) > 0.0 && p.getDouble(5) <= 1.0)
  }

  test("df cap drops hot fingerprints from pairing but not from set sizes") {
    val t = "one two three four five six seven eight nine ten"
    val docs = (1L to 4L).map(i => (i, t)).toDF("doc_id", "text")
    // every fingerprint appears in all 4 docs -> df 4 > cap 2 -> no pairs
    assert(Winnow.overlapPairs(docs, 3, 4, 1L, maxFpDf = 2L).count() === 0)
    // uncapped: all 6 ordered pairs, full containment of equal-size sets
    val all = Winnow.overlapPairs(docs, 3, 4, 1L, maxFpDf = 10L).collect()
    assert(all.length === 6)
    assert(all.forall(r => r.getDouble(5) === 1.0 && r.getLong(3) === r.getLong(4)))
  }
}
