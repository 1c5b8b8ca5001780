package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture compaction: apply a keyed changeset (upserts +
  * delete tombstones, each carrying a version) to a snapshot — the MERGE
  * step every incrementally-maintained 100 TB table needs.
  *
  * Scale shape: one union + ONE algebraic `max_by` aggregate keyed on the
  * primary key. `max_by` carries a single candidate row per key per
  * partition through the shuffle (map-side combinable), where the window
  * `row_number` formulation would sort every version of every key.
  * Deletions ride the same pass: the tombstone wins like any other
  * version and is dropped at the end, so a delete-then-reinsert sequence
  * resolves correctly by version order alone.
  */
object Cdc {

  /** Latest-row-per-key compaction: one `max_by` per key ordered by
    * (version, then the remaining columns as a total-order fallback) —
    * the shared core of snapshot merging, used standalone by the
    * streaming foreachBatch upsert (EventStreams.runUpsertToCompletion,
    * gate q277) where the accumulated table ALREADY carries real
    * versions and [[applyChangeset]]'s snapshot-gets-version-0 contract
    * would let an out-of-order late batch overwrite newer state.
    * Versions unique per key ⇒ pure version order; duplicates still
    * resolve deterministically via the full-row fallback. A null
    * version has no place in a "latest version wins" contract (it
    * would sort below every real version and an all-null-version key
    * would emit an arbitrary-but-deterministic winner), so it raises
    * per-row instead of silently losing. */
  /** (sec, event_id) packed into ONE total-order version long for
    * [[compactLatest]]: ver = sec·10⁷ + event_id, which orders as
    * (sec, event_id) ONLY while event_id ∈ [0, 10⁷) — outside that an
    * overflowing id silently reorders (or collides) versions, so the
    * guard raises per-row instead of diverging (the q277 fail-loud
    * contract; ONE definition shared by the gate and the ingest
    * pipeline so the bound cannot drift between them). */
  def packedVersion(sec: org.apache.spark.sql.Column,
      eventId: org.apache.spark.sql.Column, name: String): org.apache.spark.sql.Column = {
    val eidG = when(eventId < 0L || eventId >= 10000000L,
      raise_error(lit(s"$name: event_id outside [0, 10^7) breaks version packing"))
        .cast("long"))
      .otherwise(eventId)
    sec * 10000000L + eidG
  }

  def compactLatest(df: DataFrame, key: String, version: String): DataFrame = {
    val payload = df.columns.filterNot(_ == key)
    require(payload.contains(version), s"missing version column $version")
    val verG = when(col(version).isNull,
        raise_error(lit(s"Cdc.compactLatest: null $version violates the " +
          "latest-version-wins contract")).cast(df.schema(version).dataType))
      .otherwise(col(version))
    val ordCols = verG +: payload.filterNot(_ == version).map(col)
    df.groupBy(col(key))
      .agg(max_by(struct(payload.map(col): _*), struct(ordCols: _*)).as("w"))
      .select(col(key) +: payload.map(c => col(s"w.$c").as(c)): _*)
  }

  /** [[compactLatest]] with TOMBSTONE GC: after latest-wins, rows whose
    * `deleted` column is true DROP instead of being carried — the LSM
    * bloat fix for a serving table whose key space churns (without GC
    * the base accretes one tombstone row for every key ever deleted; a
    * 100 TB table with churn is eventually mostly tombstones).
    *
    * CORRECTNESS CONTRACT (stricter than compactLatest's): per-key
    * versions must be MONOTONE ACROSS BATCH ARRIVAL ORDER — a batch
    * folded later never carries a lower version for a key than any
    * batch folded earlier. Then dropping a tombstone is safe at any
    * fold: the only row a tombstone exists to defeat is an OLDER
    * version, and under monotone arrival an older version can only
    * re-enter via redelivery of an already-folded batch, which the
    * foldLog manifest no-ops before any reduce sees it (q331/q337
    * drive exactly that). A later batch re-creating the key carries a
    * HIGHER version and wins over the tombstone anyway — GC only
    * removes rows that had already lost every future comparison.
    * Without the monotonicity contract (cross-writer unordered
    * versions), use [[compactLatest]] and filter at read time. */
  def compactLatestGc(df: DataFrame, key: String, version: String,
      deleted: String = "deleted"): DataFrame =
    compactLatest(df, key, version).filter(!col(deleted))

  /** Merge `changes` into `snapshot`. Both must share the schema
    * (key, version, payload...); `changes` additionally carries a
    * boolean `deleted` column. Snapshot rows count as version
    * `snapshotVersion` (must be below every change version). Versions
    * must be unique per key — the caller's CDC log contract; violations
    * would make "latest" ambiguous, so the tie-break on the full row
    * struct keeps even that case deterministic. */
  def applyChangeset(snapshot: DataFrame, changes: DataFrame, key: String,
      version: String, snapshotVersion: Long = 0L): DataFrame = {
    val payload = snapshot.columns.filterNot(c => c == key || c == version)
    require(payload.nonEmpty, "snapshot needs at least one payload column")
    val snap = snapshot
      .withColumn(version, lit(snapshotVersion))
      .withColumn("deleted", lit(false))
    val cols = Seq(key, version) ++ payload :+ "deleted"
    val unioned = snap.select(cols.map(col): _*)
      .unionByName(changes.select(cols.map(col): _*))
    // the ordering key is the FULL row struct (version first): with the
    // contract honored (unique versions per key) only the version
    // matters; if a log ever violates it, ties still resolve by a total
    // order on the row content — deterministic on any engine/partitioning
    unioned
      .groupBy(col(key))
      .agg(max_by(
        struct((Seq(version) ++ payload :+ "deleted").map(col): _*),
        struct((Seq(version, "deleted") ++ payload).map(col): _*)).as("w"))
      .select(col(key) +: (Seq(version) ++ payload :+ "deleted").map(c => col(s"w.$c").as(c)): _*)
      .filter(!col("deleted"))
      .drop("deleted")
  }

  /** Type-2 (SCD2) history from the same keyed change log
    * [[applyChangeset]] compacts: instead of keeping only the latest
    * version, every version becomes a validity interval. Output is one
    * row per SURVIVING version: (key, version, payload...,
    * valid_to, is_current) where `valid_to` is the version that
    * superseded it (null while current) and a delete tombstone closes
    * the preceding interval without opening one of its own.
    *
    * Scale shape: one window per key ordered by version — per-key state
    * is that key's version count (CDC logs are shallow per key), and the
    * partitionBy parallelizes across keys, so no global sort and no
    * driver state at any corpus size. Contrast with the compaction's
    * `max_by`: SCD2 genuinely needs every version, so a window is the
    * minimal shape, not a missed optimization. */
  def scd2History(changes: DataFrame, key: String, version: String): DataFrame = {
    val payload = changes.columns
      .filterNot(c => c == key || c == version || c == "deleted")
    val w = Window.partitionBy(key).orderBy(version)
    changes
      .withColumn("valid_to", lead(col(version), 1).over(w))
      .filter(!col("deleted"))
      .withColumn("is_current", col("valid_to").isNull)
      .select((Seq(key, version) ++ payload ++ Seq("valid_to", "is_current")).map(col): _*)
      .drop("deleted")
  }

  /** Corpus snapshot diff — the data-release audit: what changed
    * between yesterday's corpus and today's, per provenance slice. Rows
    * match on `key`; content identity is the md5 of `payload` (the text
    * never shuffles, only one digest per row). Returns one row per
    * (slice, status) with status ∈ added | removed | changed |
    * unchanged and its count — the governance table a release report
    * prints, and the drift signal that catches a source silently
    * rewriting its archive (high `changed` with stable counts).
    *
    * Scale shape: two digest projections and ONE full-outer hash join
    * on the key, then an algebraic count — no windows, no pair joins;
    * the slice column rides from whichever side exists. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      key: String, payload: String, slice: String): DataFrame = {
    def digests(df: DataFrame, side: String): DataFrame =
      df.select(col(key).as(s"k_$side"), col(slice).as(s"s_$side"),
        md5(col(payload).cast("string")).as(s"h_$side"))
    val o = digests(oldSnap, "old")
    val n = digests(newSnap, "new")
    o.join(n, col("k_old") === col("k_new"), "full_outer")
      .select(
        coalesce(col("s_new"), col("s_old")).as(slice),
        when(col("k_old").isNull, lit("added"))
          .when(col("k_new").isNull, lit("removed"))
          .when(col("h_old") =!= col("h_new"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .groupBy(slice, "status")
      .agg(count(lit(1)).as("n"))
  }
}
