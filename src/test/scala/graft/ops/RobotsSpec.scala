package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** WebOps.parseRobots / robotsRules / robotsAllowed — RFC 9309 subset. */
class RobotsSpec extends SparkSpec {
  import spark.implicits._

  test("parseRobots: groups, case, comments, unknown directives") {
    val txt =
      """# a comment line
        |USER-AGENT: GoogleBot   # trailing comment
        |User-agent: graftbot
        |crawl-delay: 7
        |Disallow: /private/
        |Allow: /private/ok
        |
        |user-agent: *
        |disallow: /tmp/
        |Disallow:
        |not a directive line
        |""".stripMargin
    val rules = WebOps.parseRobots(txt)
    // both consecutive UA lines share the group's two rules
    assert(rules.count(_._1 == "googlebot") == 2)
    assert(rules.count(_._1 == "graftbot") == 2)
    assert(rules.filter(_._1 == "graftbot").map(r => (r._3, r._4)).toSet ==
      Set((false, "/private/"), (true, "/private/ok")))
    // '*' group: exactly one rule — the empty Disallow is a no-op
    assert(rules.filter(_._1 == "*").map(r => (r._3, r._4)) ==
      Seq((false, "/tmp/")))
    // a UA line AFTER rules starts a new group (not appended to the old)
    assert(!rules.exists(r => r._1 == "*" && r._4.startsWith("/private")))
  }

  test("robotsAllowed: group selection, longest match, allow wins ties") {
    val rules = Seq(
      // host a: specific group exists → '*' must be IGNORED for graftbot
      ("a", "*", 0, false, "/"),
      ("a", "graftbot", 1, false, "/x/"),
      ("a", "graftbot", 2, true, "/x/pub"),
      // equal-length tie → allow wins
      ("a", "graftbot", 3, true, "/t/"),
      ("a", "graftbot", 4, false, "/t/"),
      // host b: only '*'
      ("b", "*", 0, false, "/y/")
    ).toDF("host", "agent", "rule_ord", "allow", "prefix")
    val probes = Seq(
      (1L, "a", "/x/secret"), // graftbot disallow /x/
      (2L, "a", "/x/pub/ok"), // longer allow overrides
      (3L, "a", "/free"),     // no graftbot match; '*' ignored → allowed
      (4L, "a", "/t/tie"),    // equal length: allow wins
      (5L, "b", "/y/doc"),    // '*' applies
      (6L, "b", "/z/doc")     // no match → allowed
    ).toDF("id", "host", "path")
    val got = WebOps.robotsAllowed(probes, "id", "host", "path", rules,
        "GraftBot")
      .select("id", "allowed").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> false, 2L -> true, 3L -> true, 4L -> true,
      5L -> false, 6L -> true))
  }
}
