package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as builtins, composed scale-right from
  * shuffle + window primitives (beyond-reference operator surface; the
  * natural companions of the event/session queries in EventQueries).
  *
  * Both avoid the naive formulations that die at 100 TB:
  *  - a correlated "max right time ≤ left time" subquery per probe row is
  *    a per-row rescan;
  *  - a raw `BETWEEN` theta-join plans as a broadcast-nested-loop or
  *    cartesian product.
  */
object TemporalJoins {

  /** As-of join: for every left (probe) row, attach the payload of the
    * LATEST right (build) row with the same key and `rightTime` ≤
    * `leftTime` (inclusive; ties among right rows resolve to the highest
    * `rightId` — a total order, so the result is deterministic).
    *
    * Single-pass union trick: tag both sides, shuffle once on the key,
    * sort within partitions by (time, side, id) with build rows first on
    * time ties, and carry a running `last(payload, ignoreNulls)` window —
    * an incremental running frame, not a per-group rescan, and the sort
    * spills through Spark's external sorter (same secondary-sort shape as
    * Sessionize.sessionizeBatch). Left rows with no earlier build row
    * keep a null payload (left-outer as-of semantics). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String, leftId: String, rightId: String,
      rightPayload: Seq[String]): DataFrame = {
    // ids/times are cast to long for the union tag — a non-numeric column
    // would cast to NULL silently, nulling the output ids and collapsing
    // the deterministic tie-break, so fail fast instead
    for ((df, c) <- Seq(left -> leftTime, left -> leftId, right -> rightTime, right -> rightId))
      require(df.schema(c).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"asofJoin needs numeric time/id columns; '$c' is ${df.schema(c).dataType.simpleString}")
    val rightTagged = right.select(col(key).as("__k"), col(rightTime).cast("long").as("__t"),
      lit(0).as("__side"), col(rightId).cast("long").as("__tid"),
      struct(rightPayload.map(col): _*).as("__payload"))
    val payloadType = rightTagged.schema("__payload").dataType
    val leftTagged = left.select(col(key).as("__k"), col(leftTime).cast("long").as("__t"),
      lit(1).as("__side"), col(leftId).cast("long").as("__tid"),
      lit(null).cast(payloadType).as("__payload"))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__side"), col("__tid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val outCols: Seq[Column] =
      Seq(col("__k").as(key), col("__tid").as(leftId), col("__t").as(leftTime)) ++
        rightPayload.map(c => col(s"__p.$c").as(c))
    rightTagged.unionByName(leftTagged)
      .withColumn("__p", last("__payload", ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(outCols: _*)
  }

  /** Range (interval-containment) join: points ⋈ intervals where
    * `startCol ≤ pointCol ≤ endCol`, WITHOUT the cartesian plan a raw
    * BETWEEN theta-join produces. Time is chunked into `bucketWidth`-wide
    * buckets: each interval replicates to the buckets it covers (factor
    * ≈ len/bucketWidth + 1), each point lands in exactly one bucket, and
    * the pair meets via an EQUI-join on the bucket id — a key-partitioned
    * shuffle — before the exact containment filter. Each matching pair
    * meets exactly once (the point's bucket), so no dedup is needed.
    * Pick bucketWidth near the typical interval length: wider → fewer
    * replicas but fatter buckets, narrower → the reverse.
    * Point and interval column names must not collide. */
  def rangeJoinBucketed(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn("__bucket", expr(s"$pointCol div $bucketWidth"))
    val iv = intervals.withColumn("__bucket",
      explode(sequence(expr(s"$startCol div $bucketWidth"), expr(s"$endCol div $bucketWidth"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }
}
