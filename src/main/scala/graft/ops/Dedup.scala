package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators — the public library surface. Each takes a
  * DataFrame plus column names and returns a DataFrame; the SparkEntry
  * queries are thin oracle-graded wrappers over these. Scale rationale
  * per operator in docs/DESIGN.md. Requires
  * [[graft.functions.GraftFunctions.register]] on the session (for the
  * codegen'd signature expressions). */
object Dedup {

  /** Exact dedup groups: one row per distinct content digest with the
    * smallest surviving id and the copy count. */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("kept_doc_id"), count(lit(1)).as("n_copies"))

  /** Identical-token-set groups (Jaccard = 1.0 tier): canonical sorted
    * distinct-token digest. */
  def wordSetGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.withColumn("__w", expr(
        s"array_sort(array_distinct(filter(split($textCol, ' '), x -> length(x) > 0)))"))
      .groupBy(md5(concat_ws(" ", col("__w"))).as("set_hash"))
      .agg(min(col(idCol)).as("kept_doc_id"), count(lit(1)).as("n_members"))

  /** MinHash+LSH near-dedup: returns the KEPT ids (a doc is dropped when
    * a verified near-duplicate with a smaller id exists).
    *
    * @param shingleN   word n-gram shingle size
    * @param perms      MinHash permutations (bands * rowsPerBand)
    * @param bands      LSH bands (candidate recall knob)
    * @param threshold  verification Jaccard in tenths (9 = 0.9)
    */
  def minhashKept(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, perms: Int = 32, bands: Int = 8,
      threshold: Int = 9): DataFrame = {
    require(perms % bands == 0, s"perms ($perms) must divide into bands ($bands)")
    require(threshold >= 1 && threshold <= 10, "threshold is in tenths (1..10)")
    val rows = perms / bands
    val base = df.select(col(idCol).as("doc_id"),
      expr(s"filter(split($textCol, ' '), x -> length(x) > 0)").as("toks"))
    val sigs = base.withColumn("sig",
      expr(s"minhash_shingle(toks, $shingleN, $perms)"))
      .select("doc_id", "sig")
    val bandCols = (1 to rows)
      .map(r => s"element_at(sig, b*$rows+$r)").mkString(", ")
    val bandsDf = sigs.select(col("doc_id"), explode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> struct(b as band, xxhash64($bandCols) as bucket))"))
      .as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cand = bandsDf.as("x").join(bandsDf.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .distinct()
    val payload = base
      .withColumn("w", expr(s"array_distinct(word_ngrams(toks, $shingleN))"))
      .withColumn("nw", size(col("w")).cast("bigint"))
      .select("doc_id", "w", "nw")
    // Verification fetches payloads by id through SHUFFLE equi-joins: at
    // corpus scale the payload relation IS the corpus (every doc's shingle
    // set), so broadcasting it would OOM the driver at broadcast build.
    // Candidates are the small side after banding — shuffle-hash keeps the
    // big side streamed and unsorted.
    val verified = cand
      .join(payload.as("pa").hint("shuffle_hash"), col("id_a") === col("pa.doc_id"))
      .join(payload.as("pb").hint("shuffle_hash"), col("id_b") === col("pb.doc_id"))
      .withColumn("inter", size(array_intersect(col("pa.w"), col("pb.w"))).cast("bigint"))
      .withColumn("uni", col("pa.nw") + col("pb.nw") - col("inter"))
      .filter(col("inter") * 10 >= col("uni") * threshold)
      .select(col("id_b")).distinct()
    df.select(col(idCol).as("doc_id"))
      .join(verified, col("doc_id") === col("id_b"), "left_anti")
  }

  /** SimHash near-dedup: kept ids + their 64-bit signature.
    * Candidates from `bandBits`-bit band buckets; Hamming <= maxHamming
    * confirms a duplicate. */
  def simhashKept(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val docs = df.select(col(idCol).as("doc_id"),
        expr(s"array_distinct(filter(split($textCol, ' '), x -> length(x) > 0))").as("w"))
      .withColumn("hs", expr("transform(w, t -> xxhash64(t))"))
      .withColumn("simhash", expr("simhash64(hs)"))
      .select("doc_id", "simhash")
    val bandsDf = docs.select(col("doc_id"), col("simhash"), explode(expr(
        "transform(sequence(0, 3), k -> struct(k as band, shiftright(simhash, k*16) & 65535 as bucket))"))
      .as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val dups = bandsDf.as("x").join(bandsDf.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .filter(expr(s"bit_count(x.simhash ^ y.simhash) <= $maxHamming"))
      .select(col("y.doc_id").as("dup_id")).distinct()
    docs.join(dups, col("doc_id") === col("dup_id"), "left_anti")
      .select("doc_id", "simhash")
  }

  /** Exact token-set Jaccard candidate pairs above `threshold` tenths,
    * blocked by (strata, token-count bucket); integer-exact output
    * (inter/uni sizes) via vocabulary-coded bitmask popcount. */
  def jaccardPairs(df: DataFrame, idCol: String, strataCol: String,
      textCol: String, threshold: Int = 9): DataFrame = {
    val t = df.select(col(idCol).as("doc_id"), col(strataCol).as("lang"),
        expr(s"array_distinct(filter(split($textCol, ' '), x -> length(x) > 0))").as("w"))
      .withColumn("nw", size(col("w")).cast("bigint"))
      .withColumn("bucket", floor(col("nw") / 8).cast("bigint"))
    val tokens = t.select(col("doc_id"), explode(col("w")).as("word"))
    // Dense bit ids via zipWithIndex (scales to any vocab — no global
    // single-partition window). The assignment is an arbitrary bijection:
    // popcount of mask intersections is invariant under bit permutation,
    // so results don't depend on it.
    val spark0 = df.sparkSession
    import spark0.implicits._
    val vocab = tokens.select("word").distinct().as[String].rdd
      .zipWithIndex().toDF("word", "bit")
    val nChunks = ((vocab.count() + 63) / 64).toInt
    val chunks = tokens.join(broadcast(vocab), "word")
      .withColumn("chunk", (col("bit") / 64).cast("int"))
      .groupBy("doc_id", "chunk")
      .agg(expr("bit_or(shiftleft(cast(1 as bigint), cast(bit % 64 as int)))").as("m"))
    val masks = chunks.groupBy("doc_id")
      .agg(map_from_arrays(collect_list(col("chunk")), collect_list(col("m"))).as("cm"))
      .withColumn("mask", expr(
        s"transform(sequence(0, ${nChunks - 1}), c -> coalesce(element_at(cm, c), cast(0 as bigint)))"))
      .select("doc_id", "mask")
    val tm = t.drop("w").join(masks, "doc_id")
    tm.as("a").join(tm.as("b"),
        col("a.lang") === col("b.lang") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", expr("mask_intersect(a.mask, b.mask)"))
      .withColumn("uni", col("a.nw") + col("b.nw") - col("inter"))
      .filter(col("inter") * 10 >= col("uni") * threshold)
      .select(col("a.doc_id").as("doc_id_a"), col("b.doc_id").as("doc_id_b"),
        col("inter"), col("uni"))
  }
}
