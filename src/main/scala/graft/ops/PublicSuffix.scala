package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registrable-domain extraction under the publicsuffix.org algorithm —
  * the correct replacement for [[WebOps.canonicalize]]'s last-two-labels
  * `domain` approximation (which maps `bbc.co.uk` → `co.uk` and so
  * silently merges every .co.uk site into one "domain" for quotas,
  * authority, and group-coherent splits).
  *
  * The rule list is DATA, not code: [[load]] parses the public-suffix
  * list's published text format (one rule per line, `//` comments,
  * `*.` wildcard rules, `!` exception rules — the format is specified at
  * publicsuffix.org/list/), so the full published list drops in
  * unchanged. A curated subset covering the major ccTLD second-level
  * registries and common private suffixes ships as the bundled resource
  * ([[defaultRules]]) for environments without the full file.
  *
  * Algorithm (publicsuffix.org, "Formal algorithm"):
  *   - a NORMAL rule matches a host when the rule equals one of the
  *     host's dot-suffixes; the public suffix is the matched suffix;
  *   - a WILDCARD rule `*.base` makes every direct child of `base` a
  *     public suffix (one label more than `base`);
  *   - an EXCEPTION rule `!r` declares `r` registrable: the public
  *     suffix is `r` minus its leftmost label, and exceptions beat every
  *     other match;
  *   - otherwise the prevailing rule is the matching rule with the MOST
  *     labels; with no match at all the default rule `*` applies (the
  *     bare TLD is the public suffix);
  *   - registrable domain = public suffix plus one more host label;
  *     a host that IS a public suffix has none (null).
  *
  * 100 TB shape: the algorithm runs over DISTINCT hosts, not corpus
  * rows — candidate suffixes (≤ host label count, a handful) explode
  * from the deduplicated host set, one equi-join against the broadcast
  * rule table marks matches, a per-host argmax picks the prevailing
  * rule (co-partitioned with the distinct, so no extra exchange), and
  * the resulting host → domain mapping joins back on the short host
  * string. Document payloads never ride the explode or either join. */
object PublicSuffix {

  /** One parsed rule: `key` is the rule text minus any `*.`/`!` marker,
    * `kind` ∈ 0=normal, 1=wildcard, 2=exception. */
  final case class Rule(key: String, kind: Int) {
    def labels: Int = key.count(_ == '.') + 1
  }

  /** Parses public-suffix-list text format: blank lines and `//`
    * comments skipped, `*.`/`!` markers peeled, rules lowercased. */
  def parse(lines: Iterator[String]): Seq[Rule] =
    lines.map(_.trim).filter(l => l.nonEmpty && !l.startsWith("//"))
      .map { l =>
        if (l.startsWith("!")) Rule(l.substring(1).toLowerCase, 2)
        else if (l.startsWith("*.")) Rule(l.substring(2).toLowerCase, 1)
        else Rule(l.toLowerCase, 0)
      }.toSeq

  /** The bundled curated rule subset (see scaladoc above). */
  lazy val defaultRules: Seq[Rule] = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "bundled public_suffix_list.dat resource missing")
    try parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** Rules parsed from a PSL-format file on any Hadoop-visible path —
    * how the full published list deploys (it is ~15k rules: still a
    * broadcast-sized table). */
  def load(spark: SparkSession, path: String): Seq[Rule] =
    parse(spark.read.textFile(path).collect().iterator)

  /** Rules as the joinable table: (rule_key, rule_labels, rule_kind). */
  def rulesDf(spark: SparkSession, rules: Seq[Rule] = defaultRules): DataFrame = {
    import spark.implicits._
    rules.map(r => (r.key, r.labels, r.kind)).toDF(
      "rule_key", "rule_labels", "rule_kind")
  }

  /** host → (public_suffix, domain) mapping for the DISTINCT hosts of
    * `df`. `domain` is null when the host itself is a public suffix. */
  def domainTable(df: DataFrame, hostCol: String,
      rules: DataFrame): DataFrame = {
    // the label array is computed ONCE via the Scala API (no SQL-string
    // regex escaping anywhere near this file, by design) and reused by
    // the candidate explode and both final slices
    val hosts = df.select(lower(col(hostCol)).as("host")).distinct()
      .withColumn("__ls", split(col("host"), "\\."))
      .withColumn("__n", size(col("__ls")))
    // candidate dot-suffixes: labels i..n for every start position i;
    // __L = candidate label count. Short strings only — the explode
    // multiplies the distinct-host set, never the corpus.
    val cands = hosts
      .withColumn("__i", explode(expr("sequence(1, __n)")))
      .withColumn("__cand", expr("array_join(slice(__ls, __i, 1000), '.')"))
      .withColumn("__L", col("__n") - col("__i") + 1)
    // one equi-join on the candidate string marks every matching rule;
    // the rule table is broadcast-sized by construction
    val matched = cands.join(broadcast(rules),
        cands("__cand") === rules("rule_key"), "left")
      .withColumn("__ps", expr(
        """CASE rule_kind
          |  WHEN 2 THEN rule_labels - 1
          |  WHEN 1 THEN CASE WHEN __n >= __L + 1 THEN __L + 1 END
          |  WHEN 0 THEN __L
          |END""".stripMargin))
      // prevailing-rule order: exceptions absolutely first, then most
      // labels — encoded on one integer key so max() decides
      .withColumn("__bk", expr(
        "CASE WHEN rule_kind = 2 THEN 1000000 + __ps ELSE __ps END"))
    // co-partitioned with the distinct above: no extra exchange
    val prevailing = matched.groupBy("host")
      .agg(max(col("__bk")).as("__bk"),
        first(col("__n")).as("__n"), first(col("__ls")).as("__ls"))
      .withColumn("__ps", expr(
        """CASE WHEN __bk IS NULL THEN 1
          |     WHEN __bk >= 1000000 THEN __bk - 1000000
          |     ELSE __bk END""".stripMargin))
    prevailing.select(col("host"),
      expr("array_join(slice(__ls, __n - __ps + 1, __ps), '.')")
        .as("public_suffix"),
      expr("""CASE WHEN __n >= __ps + 1
             |  THEN array_join(slice(__ls, __n - __ps, __ps + 1), '.')
             |END""".stripMargin).as("domain"))
  }

  /** Adds `public_suffix` and `domain` (registrable domain, null when
    * the host is itself a public suffix) to `df` by joining the
    * [[domainTable]] mapping back on the lowercased host string. */
  def withRegistrableDomain(df: DataFrame, hostCol: String,
      rules: DataFrame): DataFrame = {
    val mapping = domainTable(df, hostCol, rules)
    df.withColumn("__host_lc", lower(col(hostCol)))
      .join(mapping.withColumnRenamed("host", "__host_lc"),
        Seq("__host_lc"), "left")
      .drop("__host_lc")
  }
}
