package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

import graft.lake.Naming

class HeadersSpec extends AnyFunSuite {
  test("normalize lowercases, maps space/dash to underscore, strips junk") {
    assert(Headers.normalize("Transaction ID") == "transaction_id")
    assert(Headers.normalize("store-id") == "store_id")
    assert(Headers.normalize("Unit Price ($)") == "unit_price_")
    assert(Headers.normalize("qty.") == "qty")
  }

  test("synonyms map onto canonical names") {
    assert(Headers.resolveHeader(Seq("txn_id", "storeid", "qty", "price", "amount")) ==
      Seq("transaction_id", "store_id", "quantity", "unit_price", "revenue"))
  }

  test("unknown columns pass through and are ignorable") {
    val resolved = Headers.resolveHeader(Seq("transaction_id", "discount_code"))
    assert(resolved == Seq("transaction_id", "discount_code"))
  }

  test("indexMap keeps the last position on duplicate names (reference :186)") {
    assert(Headers.indexMap(Seq("a", "b", "a")) == Map("a" -> 2, "b" -> 1))
  }

  test("required-column set is the 7 doc-specified columns") {
    assert(Headers.missingRequired(Seq("transaction_id", "store_id", "timestamp",
      "item_id", "quantity", "unit_price", "revenue")).isEmpty)
    assert(Headers.missingRequired(Seq("transaction_id")).size == 6)
  }
}

class DelimitersSpec extends AnyFunSuite {
  test("sample detection picks most frequent candidate") {
    assert(Delimiters.detectFromSample(Seq("a,b,c", "d,e,f")) == ',')
    assert(Delimiters.detectFromSample(Seq("a;b;c", "d;e;f")) == ';')
    assert(Delimiters.detectFromSample(Seq("a|b|c")) == '|')
    assert(Delimiters.detectFromSample(Seq("a\tb")) == '\t')
  }

  test("zero occurrences falls back to comma (intended Q1 semantics)") {
    assert(Delimiters.detectFromSample(Seq("single_field")) == ',')
  }

  test("ties break in candidate order , ; | tab") {
    assert(Delimiters.detectFromSample(Seq("a,b;c")) == ',')
  }

  test("head detection splits first line by best candidate") {
    val Some((d, cells)) = Delimiters.detectFromHead("a;b;c\nrest")
    assert(d == ';' && cells == Seq("a", "b", "c"))
    assert(Delimiters.detectFromHead("  \n\n").isEmpty)
  }

  test("splitKeepingEmpty keeps trailing empties and quotes pipe") {
    assert(Delimiters.splitKeepingEmpty("a,b,", ',') == Seq("a", "b", ""))
    assert(Delimiters.splitKeepingEmpty("a|b", '|') == Seq("a", "b"))
  }
}

class PreflightSpec extends AnyFunSuite {
  private def head(s: String) = s.getBytes("UTF-8")

  test("clean header with synonyms validates (storeid case)") {
    val d = Preflight.check(head(
      "transaction_id,storeid,timestamp,item_id,item_category,quantity,unit_price,revenue,payment_method,customer_id\nx"))
    assert(d.route == Preflight.ToValidated)
    assert(d.resolvedHeader.contains("store_id"))
  }

  test("missing optional customer_id still validates (7-required rule)") {
    val d = Preflight.check(head(
      "transaction_id,store_id,timestamp,item_id,item_category,quantity,unit_price,revenue,payment_method\nx"))
    assert(d.route == Preflight.ToValidated)
  }

  test("missing required column structurally rejects") {
    val d = Preflight.check(head("transaction_id,store_id,timestamp\nx"))
    assert(d.route == Preflight.ToStructuralReject)
    assert(d.errors.head.startsWith("missing_columns:"))
  }

  test("empty file fails delimiter detection") {
    val d = Preflight.check(head("   \n  \n"))
    assert(d.route == Preflight.ToStructuralReject)
    assert(d.errors == Seq("delimiter_detection_failed"))
  }
}

class NamingSpec extends AnyFunSuite {
  test("traceable rename embeds tag, timestamp, uuid, keeps extension") {
    val n = Naming.withTag("sales_2024-10-16.csv", "validated",
      java.time.Instant.parse("2026-01-02T03:04:05Z"), "deadbeef")
    assert(n == "sales_2024-10-16__validated__20260102T030405Z__deadbeef.csv")
  }

  test("run ids are 8 hex chars") {
    assert(Naming.newRunId().matches("[0-9a-f]{8}"))
  }
}
