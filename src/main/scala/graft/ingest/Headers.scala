package graft.ingest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Header normalization + synonym mapping → canonical schema resolution.
  *
  * Mirrors `scripts/glue_job_raw_to_processed.py:140-186` and
  * `docs/schema_mapping.md` in the reference: lowercase, spaces/dashes →
  * underscore, strip anything not `[a-z0-9_]`, then map known synonyms onto
  * the canonical column set. Unknown extra columns are ignored; missing
  * optional columns resolve to null downstream.
  */
object Headers {

  /** Canonical silver-table business columns, in projection order. */
  val canonical: Seq[String] = Seq(
    "transaction_id", "store_id", "timestamp", "item_id", "item_category",
    "quantity", "unit_price", "revenue", "payment_method", "customer_id")

  /** Columns that must resolve for a row to survive the structural gate. */
  val required: Set[String] = Set(
    "transaction_id", "store_id", "timestamp", "item_id",
    "quantity", "unit_price", "revenue")

  /** Synonym → canonical name map (reference `synonyms` dict, :148-168). */
  val synonyms: Map[String, String] = Map(
    "transactionid" -> "transaction_id",
    "transid" -> "transaction_id",
    "txn_id" -> "transaction_id",
    "storeid" -> "store_id",
    "shop_id" -> "store_id",
    "itemid" -> "item_id",
    "product_id" -> "item_id",
    "qty" -> "quantity",
    "quantitysold" -> "quantity",
    "unitprice" -> "unit_price",
    "price" -> "unit_price",
    "revenueamount" -> "revenue",
    "amount" -> "revenue",
    "revenue" -> "revenue")

  /** Normalize one raw header cell. */
  def normalize(name: String): String =
    name.toLowerCase
      .replace(' ', '_')
      .replace('-', '_')
      .filter(ch => (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9') || ch == '_')

  /** Normalize + synonym-map a full raw header row. */
  def resolveHeader(rawCells: Seq[String]): Seq[String] =
    rawCells.map(normalize).map(h => synonyms.getOrElse(h, h))

  /** name → position in the header; on duplicate names the last position
    * wins, matching the reference's dict comprehension (`:186`). */
  def indexMap(finalHeaders: Seq[String]): Map[String, Int] =
    finalHeaders.zipWithIndex.toMap

  /** Required columns missing from a resolved header. */
  def missingRequired(finalHeaders: Seq[String]): Set[String] =
    required -- finalHeaders.toSet

  /** Column-expression form of [[normalize]] (for SQL-surface parity checks).
    * ASCII-range semantics match `normalize` for the data we process. */
  def normalizeCol(c: Column): Column =
    regexp_replace(regexp_replace(lower(c), "[ -]", "_"), "[^a-z0-9_]", "")

  /** DuckDB SQL mirror of [[normalizeCol]]. */
  def duckNormalizeSql(col: String): String =
    s"regexp_replace(regexp_replace(lower($col), '[ -]', '_', 'g'), '[^a-z0-9_]', '', 'g')"
}
