package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[TextOps.fuzzyMatch]] (SymSpell/FastSS deletion-neighborhood
  * blocking): completeness against the brute-force levenshtein truth at
  * both supported distances, the edge strings a blocking scheme
  * typically drops, and the plan claim — candidates come from an
  * EQUI-join, never a cross product. */
class FuzzyMatchSpec extends SparkSpec {
  import spark.implicits._

  // words with planted structure: substitutions (scan/scam/span),
  // insert/delete chains (cat/cart/card), a 1-char word, repeats
  private val dict = Seq("scan", "scam", "span", "spam", "cat", "cart",
    "card", "a", "at", "hash", "dash", "merge", "marge")
  private val queries = Seq("scan", "sca", "sscan", "xcan", "cst", "art",
    "", "aa", "merge", "mage", "hsah")

  private def brute(q: Seq[String], d: Seq[String], k: Int) =
    q.toDF("q").crossJoin(d.toDF("w"))
      .filter(levenshtein(col("q"), col("w")) <= k)
      .select("q", "w").as[(String, String)].collect().toSet

  private def blocked(q: Seq[String], d: Seq[String], k: Int) =
    TextOps.fuzzyMatch(q.toDF("q"), "q", d.toDF("w"), "w", k)
      .select("q", "w").as[(String, String)].collect().toSet

  test("maxDist 1: blocked result equals brute-force truth") {
    val got = blocked(queries, dict, 1)
    assert(got == brute(queries, dict, 1))
    // sanity on content: a substitution, an insertion, a deletion
    assert(got.contains(("xcan", "scan")))
    assert(got.contains(("sscan", "scan")))
    assert(got.contains(("sca", "scan")))
    assert(got.contains(("", "a")))
  }

  test("maxDist 2: blocked result equals brute-force truth") {
    assert(blocked(queries, dict, 2) == brute(queries, dict, 2))
  }

  test("dist column is the exact levenshtein distance") {
    val m = TextOps.fuzzyMatch(Seq("sca", "scan").toDF("q"), "q",
        Seq("scan").toDF("w"), "w", 1)
      .collect().map(r => (r.getString(0), r.getLong(2))).toMap
    assert(m == Map("sca" -> 1L, "scan" -> 0L))
  }

  test("no cross product in the plan — candidates are an equi-join") {
    val df = TextOps.fuzzyMatch(queries.toDF("q"), "q",
      dict.toDF("w"), "w", 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("duplicate inputs do not duplicate output pairs") {
    val got = blocked(Seq("sca", "sca", "sca"), Seq("scan", "scan"), 1)
    assert(got == Set(("sca", "scan")))
  }
}
