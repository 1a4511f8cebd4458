package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[NfcNormalize]]/[[NfkcNormalize]] (UAX #15 via
  * java.text.Normalizer, exposed as codegen SQL functions): canonical
  * composition, the NFKC compatibility foldings the graded entry can't
  * cover (no DuckDB twin), idempotence, and null/ASCII passthrough. */
class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  private def nfc(s: String): String =
    Seq(s).toDF("s").select(expr("nfc_normalize(s)")).head().getString(0)
  private def nfkc(s: String): String =
    Seq(s).toDF("s").select(expr("nfkc_normalize(s)")).head().getString(0)

  test("NFC composes combining sequences to single codepoints") {
    assert(nfc("e\u0301") == "\u00e9")
    assert(nfc("A\u0300") == "\u00c0")
    assert(nfc("o\u0308u\u0308") == "\u00f6\u00fc")
    // length collapses: 2 codepoints -> 1
    assert(nfc("e\u0301").codePointCount(0, nfc("e\u0301").length) == 1)
  }

  test("NFC is idempotent and leaves ASCII alone") {
    val s = "plain ascii text 123"
    assert(nfc(s) == s)
    assert(nfc(nfc("e\u0301 x")) == nfc("e\u0301 x"))
  }

  test("NFKC folds compatibility variants NFC must preserve") {
    // fullwidth A -> A, ligature fi -> fi, superscript 2 -> 2
    assert(nfkc("\uff21") == "A" && nfc("\uff21") == "\uff21")
    assert(nfkc("\ufb01") == "fi" && nfc("\ufb01") == "\ufb01")
    assert(nfkc("\u00b2") == "2" && nfc("\u00b2") == "\u00b2")
  }

  test("null-safe and distinct-collapsing under exact dedup") {
    val df = Seq(Some("e\u0301"), Some("\u00e9"), None).toDF("s")
    val out = df.select(expr("nfc_normalize(s)").as("n"))
    assert(out.filter(col("n").isNull).count() == 1)
    assert(out.filter(col("n").isNotNull).distinct().count() == 1)
  }
}
