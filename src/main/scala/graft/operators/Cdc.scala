package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application: the two standard shapes a lake's
  * dimension/state tables need when an upstream emits row-level changes
  * (inserts / updates / deletes with a change sequence).
  *
  * [[CdcMerge]] is MERGE INTO as a plain shuffle plan: latest change per
  * key wins over the snapshot, deletes drop the key. One hash shuffle on
  * the merge key per input (no broadcast, no driver state), so it scales
  * to any snapshot size; this is exactly the rewrite table formats run
  * under their MERGE implementations, minus the transactional commit —
  * pair with [[graft.gold.GoldCompaction]]'s manifest protocol for that.
  *
  * [[Scd]] builds type-2 history (effective-dated versions) from a
  * change stream with one window pass — the warehouse-dimension twin of
  * the merge, where updates version rather than overwrite.
  */
object CdcMerge {

  /** Apply a change batch to a snapshot. `changes` carries the snapshot
    * schema plus `opCol` ('I' | 'U' | 'D') and a monotonically increasing
    * `seqCol` (the CDC log sequence — ties broken arbitrarily). Within
    * the batch the HIGHEST seq per key wins; any surviving 'I'/'U'
    * replaces the snapshot row (an 'I' on an existing key degenerates to
    * an update), 'D' removes it. Exactly one exchange per input, keyed
    * on the merge key. */
  def apply(snapshot: DataFrame, changes: DataFrame, keys: Seq[String],
      opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    val dataCols = snapshot.columns.toSeq
    val keyCols = keys.map(col)
    // latest change per key by CDC sequence
    val latest = changes
      .withColumn("_rn", row_number().over(
        Window.partitionBy(keyCols: _*).orderBy(col(seqCol).desc)))
      .filter(col("_rn") === 1)
      .select((dataCols :+ opCol).map(col): _*)
    // snapshot rows lose to any change for the same key
    val tagged = snapshot
      .select(dataCols.map(col): _*)
      .withColumn(opCol, lit(null: String))
      .withColumn("_pri", lit(0))
      .unionByName(latest.withColumn("_pri", lit(1)))
    tagged
      .withColumn("_rn", row_number().over(
        Window.partitionBy(keyCols: _*).orderBy(col("_pri").desc)))
      .filter(col("_rn") === 1 &&
        (col(opCol).isNull || col(opCol) =!= "D"))
      .select(dataCols.map(col): _*)
  }
}

object TableDiff {

  /** Reconciliation diff of two versions of a keyed table: one row per
    * differing key with `change_type` ∈ added | removed | changed
    * (identical rows are omitted). The inverse of [[CdcMerge]] — applying
    * a change batch then diffing against the original recovers the
    * batch's net effect, the audit loop a lake runs to validate a
    * migration or replication path.
    *
    * One full-outer shuffle join on the key; row equality compares the
    * non-key columns as a STRUCT (exact for doubles, well-defined for
    * nulls — no stringification or hashing in the comparison path). */
  def diff(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String]): DataFrame = {
    val dataCols = oldDf.columns.filterNot(keys.contains).toSeq
    require(newDf.columns.sorted.sameElements(oldDf.columns.sorted),
      "diff requires identical schemas")
    def packed(df: DataFrame, tag: String): DataFrame =
      df.select(keys.map(col) :+
        struct(dataCols.map(col): _*).as(s"_row_$tag"): _*)
    packed(oldDf, "old")
      .join(packed(newDf, "new"), keys, "full_outer")
      .withColumn("change_type",
        when(col("_row_old").isNull, lit("added"))
          .when(col("_row_new").isNull, lit("removed"))
          .when(col("_row_old") =!= col("_row_new"), lit("changed")))
      .filter(col("change_type").isNotNull)
      .select(keys.map(col) :+ col("change_type"): _*)
  }
}

object Scd {

  /** Type-2 history from versioned rows: each key's versions (ordered by
    * `effectiveAt`, ties broken by `tieBreak`) become effective-dated
    * records — `effective_from` = the version's own timestamp,
    * `effective_to` = the NEXT version's (null while current),
    * `is_current` on the open record. One window pass, one shuffle on
    * the dimension key. */
  def history(versions: DataFrame, keys: Seq[String], effectiveAt: Column,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(effectiveAt +: tieBreak: _*)
    versions
      .withColumn("effective_from", effectiveAt)
      .withColumn("effective_to", lead(effectiveAt, 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
