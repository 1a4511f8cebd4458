package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** LLM-training-data pipeline operators (BASELINE.json north_star; SURVEY §7.5
  * item 5): deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
  * embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
  * text analysis (language-ID, quality, token counting, fingerprinting) and
  * multimodal column plumbing.
  *
  * Scale design (100 TB): every candidate-generation step is an equi-join on
  * a small derived key (band bucket, length bucket, LSH signature) — never an
  * unblocked cross join; verification joins fetch payloads by id afterwards,
  * so wide columns are not shuffled through candidate generation. Hash-based
  * signatures use xxhash64 (codegen'd, seed-stable); queries whose oracle
  * must be DuckDB-reproducible stick to md5/sha-based or hash-free logic.
  */
object PipelineOps {

  /** Distinct non-empty word tokens per document. */
  private def docsWithWords(spark: SparkSession): DataFrame =
    spark.table("documents")
      .withColumn("w", expr("array_distinct(filter(split(text, ' '), x -> length(x) > 0))"))
      .withColumn("nw", size(col("w")).cast("bigint"))

  val defs: Seq[QueryDef] = Seq(

    // Exact dedup: hash-groupBy on content digest, keep smallest doc_id.
    // Scale: single shuffle on the 128-bit digest; no text comparison.
    QueryDef.views("d1_dedup_exact",
      """SELECT md5(text) AS content_hash, min(doc_id) AS kept_doc_id,
        |       count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY kept_doc_id""".stripMargin) { spark =>
      spark.table("documents")
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(min(col("doc_id")).as("kept_doc_id"), count(lit(1)).as("n_copies"))
        .orderBy("kept_doc_id")
    },

    // MinHash + LSH near-dedup over word-bigram shingles: 32 permutations,
    // 8 bands × 4 rows; candidate pairs from band-bucket equi-join,
    // verified by true shingle Jaccard >= 0.9; a doc is dropped when a
    // verified duplicate with smaller id exists.
    // No DuckDB oracle (xxhash64 not available there) → rows-only check.
    QueryDef("d2_dedup_minhash", (spark, dir) => {
      graft.Tables.registerAll(spark, dir)
      // Signature: fused shingle->hash->minhash codegen expression - one
      // pass over the token array, no shingle strings materialized.
      val base = spark.table("documents")
        .withColumn("toks", expr("filter(split(text, ' '), x -> length(x) > 0)"))
        .select("doc_id", "toks")
      val docs = base.withColumn("sig", expr("minhash_shingle(toks, 2, 32)"))
        .select("doc_id", "sig")
      val bands = docs.select(col("doc_id"), explode(expr(
        """transform(sequence(0, 7), b -> struct(b as band,
          |  xxhash64(element_at(sig, b*4+1), element_at(sig, b*4+2),
          |           element_at(sig, b*4+3), element_at(sig, b*4+4)) as bucket))""".stripMargin))
        .as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct()
      // Verification: true bigram-set Jaccard. word_ngrams is codegen'd,
      // so building shingle sets for every doc is a cheap scan column;
      // candidate pairs fetch them via two broadcast id-joins.
      val payload = base
        .withColumn("w", expr("array_distinct(word_ngrams(toks, 2))"))
        .withColumn("nw", size(col("w")).cast("bigint"))
        .select("doc_id", "w", "nw")
      val verified = cand
        .join(broadcast(payload).as("pa"), col("id_a") === col("pa.doc_id"))
        .join(broadcast(payload).as("pb"), col("id_b") === col("pb.doc_id"))
        .withColumn("inter", size(array_intersect(col("pa.w"), col("pb.w"))).cast("bigint"))
        .withColumn("uni", col("pa.nw") + col("pb.nw") - col("inter"))
        .filter(col("inter") * 10 >= col("uni") * 9)
        .select(col("id_b")).distinct()
      spark.table("documents").select("doc_id")
        .join(verified, col("doc_id") === col("id_b"), "left_anti")
        .orderBy("doc_id")
    }, None),

    // SimHash near-dedup: 64-bit signature from token hashes (native
    // codegen'd simhash64 expression), 4×16-bit band buckets for
    // candidates, Hamming distance <= 3 confirms. Rows-only.
    QueryDef("d3_dedup_simhash", (spark, dir) => {
      graft.Tables.registerAll(spark, dir)
      val docs = docsWithWords(spark)
        .withColumn("hs", expr("transform(w, t -> xxhash64(t))"))
        .withColumn("simhash", expr("simhash64(hs)"))
        .select("doc_id", "simhash")
      val bands = docs.select(col("doc_id"), col("simhash"), explode(expr(
          "transform(sequence(0, 3), k -> struct(k as band, shiftright(simhash, k*16) & 65535 as bucket))"))
        .as("bb"))
        .select(col("doc_id"), col("simhash"),
          col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      val dups = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
            col("x.doc_id") < col("y.doc_id"))
        .filter(expr("bit_count(x.simhash ^ y.simhash) <= 3"))
        .select(col("y.doc_id").as("dup_id")).distinct()
      docs.join(dups, col("doc_id") === col("dup_id"), "left_anti")
        .select("doc_id", "simhash")
        .orderBy("doc_id")
    }, None),

    // N-gram (word-set) Jaccard dedup candidates with integer-only output
    // (inter/uni sizes — exact on both engines). Blocking: same language +
    // token-count bucket (Jaccard >= 0.9 forces near-equal set sizes).
    QueryDef.views("d4_ngram_jaccard",
      """WITH t AS (SELECT doc_id, lang,
        |             list_distinct(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS w
        |           FROM documents),
        |     tt AS (SELECT doc_id, lang, w, CAST(len(w) AS BIGINT) AS nw,
        |                   CAST(floor(len(w) / 8) AS BIGINT) AS bucket FROM t)
        |SELECT doc_id_a, doc_id_b, inter, uni FROM (
        |  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
        |         CAST(len(list_intersect(a.w, b.w)) AS BIGINT) AS inter,
        |         a.nw + b.nw - CAST(len(list_intersect(a.w, b.w)) AS BIGINT) AS uni
        |  FROM tt a JOIN tt b
        |    ON a.lang = b.lang AND a.bucket = b.bucket AND a.doc_id < b.doc_id)
        |WHERE inter * 10 >= uni * 9
        |ORDER BY doc_id_a, doc_id_b""".stripMargin) { spark =>
      val t = docsWithWords(spark)
        .withColumn("bucket", floor(col("nw") / 8).cast("bigint"))
        .select("doc_id", "lang", "w", "nw", "bucket")
      // Vocabulary-coded set masks: each distinct token gets a dense bit;
      // a doc's token set becomes ceil(|vocab|/64) longs, and per-pair
      // intersection is codegen'd popcount (mask_intersect) instead of an
      // array_intersect hash-set build. The pair join is the 100 TB hot
      // path; the vocab build is a one-pass dimension (broadcast).
      val tokens = t.select(col("doc_id"), explode(col("w")).as("word"))
      val vocab = tokens.select("word").distinct()
        .withColumn("bit",
          row_number().over(Window.orderBy("word")).cast("bigint") - 1)
      // Driver-side dimension statistic (tiny): number of 64-bit chunks.
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
        .filter(col("inter") * 10 >= col("uni") * 9)
        .select(col("a.doc_id").as("doc_id_a"), col("b.doc_id").as("doc_id_b"),
          col("inter"), col("uni"))
        .orderBy("doc_id_a", "doc_id_b")
    },

    // Embedding-cosine nearest neighbor per vector (near-dup detection form:
    // the NN + a threshold flag). vec_dot is graft's codegen'd expression;
    // cosine is computed identically (sequential double fold) on both sides.
    QueryDef.views("e1_embed_nn",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |     en AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |     p AS (SELECT a.vec_id AS vec_id, b.vec_id AS nn,
        |                  list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cs
        |           FROM en a JOIN en b ON a.vec_id != b.vec_id),
        |     r AS (SELECT vec_id, nn, cs, row_number() OVER
        |             (PARTITION BY vec_id ORDER BY cs DESC, nn) AS rn FROM p)
        |SELECT vec_id, nn AS nn_id, CAST(round(cs * 10000) AS BIGINT) AS sim_bp,
        |       cs >= 0.4 AS near_dup
        |FROM r WHERE rn = 1 ORDER BY vec_id""".stripMargin) { spark =>
      val en = spark.table("embeddings")
        .withColumn("nrm", expr("sqrt(vec_dot(embedding, embedding))"))
        .select("vec_id", "embedding", "nrm")
      // Stream side repartitioned so the nested-loop pair evaluation runs
      // on every core (the parquet scan is one partition at this size);
      // argmax via map-side max_by instead of a window sort over all pairs
      // — no shuffle of the N² pair rows, only of N per-group maxima.
      val streamed = en.repartition(spark.sparkContext.defaultParallelism)
      val pairs = streamed.as("a")
        .join(broadcast(en).as("b"), col("a.vec_id") =!= col("b.vec_id"))
        .withColumn("cs",
          expr("vec_dot(a.embedding, b.embedding)") / (col("a.nrm") * col("b.nrm")))
        .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("nn"), col("cs"))
      pairs.groupBy("vec_id")
        .agg(max_by(struct(col("nn"), col("cs")),
          struct(col("cs"), (-col("nn")).as("negnn"))).as("best"))
        .select(col("vec_id"), col("best.nn").as("nn_id"),
          round(col("best.cs") * 10000).cast("bigint").as("sim_bp"),
          (col("best.cs") >= 0.4).as("near_dup"))
        .orderBy("vec_id")
    },

    // Brute-force cosine top-k ANN baseline: 20 query vectors vs the corpus.
    // Scale: query side broadcast; corpus side streams (one pass, no shuffle
    // of the corpus). Integer-only output (ranks + ids).
    QueryDef.views("s1_ann_topk",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |           FROM embeddings),
        |     en AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e),
        |     p AS (SELECT q.vec_id AS q_vec_id, b.vec_id AS nn,
        |                  list_dot_product(q.v, b.v) / (q.nrm * b.nrm) AS cs
        |           FROM en q JOIN en b ON q.vec_id != b.vec_id
        |           WHERE q.vec_id < 20),
        |     r AS (SELECT q_vec_id, nn, row_number() OVER
        |             (PARTITION BY q_vec_id ORDER BY cs DESC, nn) AS rn FROM p)
        |SELECT q_vec_id, CAST(rn AS BIGINT) AS rnk, nn AS nn_id
        |FROM r WHERE rn <= 10 ORDER BY q_vec_id, rnk""".stripMargin) { spark =>
      val en = spark.table("embeddings")
        .withColumn("nrm", expr("sqrt(vec_dot(embedding, embedding))"))
        .select("vec_id", "embedding", "nrm")
      val q = en.filter(col("vec_id") < 20)
      val pairs = broadcast(q.as("q")).join(en.as("b"),
          col("q.vec_id") =!= col("b.vec_id"))
        .withColumn("cs",
          expr("vec_dot(q.embedding, b.embedding)") / (col("q.nrm") * col("b.nrm")))
        .select(col("q.vec_id").as("q_vec_id"), col("b.vec_id").as("nn"), col("cs"))
      val w = Window.partitionBy("q_vec_id").orderBy(col("cs").desc, col("nn"))
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
        .select(col("q_vec_id"), col("rn").cast("bigint").as("rnk"),
          col("nn").as("nn_id"))
        .orderBy("q_vec_id", "rnk")
    },

    // LSH-bucketed ANN (the scale path): 8 sign-random-projection bits from
    // hash-derived ±1 hyperplanes; candidates share a bucket; top-5 by exact
    // cosine within bucket. Rows-only (hash planes not portable to DuckDB).
    QueryDef("s2_ann_lsh", (spark, dir) => {
      graft.Tables.registerAll(spark, dir)
      val en = spark.table("embeddings")
        .withColumn("nrm", expr("sqrt(vec_dot(embedding, embedding))"))
        .withColumn("lsh", expr(
          """aggregate(sequence(0, 7), cast(0 as bigint), (acc, p) ->
            |  acc + if(aggregate(sequence(0, 63), cast(0 as double), (s, d) ->
            |             s + cast(element_at(embedding, d + 1) as double) *
            |                 if(pmod(xxhash64(p * 64 + d), 2) = 0, 1.0d, -1.0d)) > 0d,
            |           shiftleft(cast(1 as bigint), p), cast(0 as bigint)))""".stripMargin))
        .select("vec_id", "embedding", "nrm", "lsh")
      val q = en.filter(col("vec_id") < 20)
      val pairs = broadcast(q.as("q")).join(en.as("b"),
          col("q.lsh") === col("b.lsh") && col("q.vec_id") =!= col("b.vec_id"))
        .withColumn("cs",
          expr("vec_dot(q.embedding, b.embedding)") / (col("q.nrm") * col("b.nrm")))
        .select(col("q.vec_id").as("q_vec_id"), col("b.vec_id").as("nn"), col("cs"))
      val w = Window.partitionBy("q_vec_id").orderBy(col("cs").desc, col("nn"))
      pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select(col("q_vec_id"), col("rn").cast("bigint").as("rnk"),
          col("nn").as("nn_id"))
        .orderBy("q_vec_id", "rnk")
    }, None),

    // Word-set dedup groups: docs with IDENTICAL distinct-token sets
    // (Jaccard = 1.0 clusters) grouped by a canonical set digest — the
    // exact tier between d1 (byte-identical) and d2/d4 (near-dup).
    QueryDef.views("d5_wordset_dedup",
      """SELECT md5(array_to_string(list_sort(list_distinct(
        |         list_filter(string_split(text, ' '), x -> len(x) > 0))), ' ')) AS set_hash,
        |       min(doc_id) AS kept_doc_id, count(*) AS n_members
        |FROM documents GROUP BY 1 ORDER BY kept_doc_id""".stripMargin) { spark =>
      spark.table("documents")
        .withColumn("w", expr(
          "array_sort(array_distinct(filter(split(text, ' '), x -> length(x) > 0)))"))
        .groupBy(md5(concat_ws(" ", col("w"))).as("set_hash"))
        .agg(min("doc_id").as("kept_doc_id"), count(lit(1)).as("n_members"))
        .orderBy("kept_doc_id")
    },

    // Deterministic content-hash sampling (reproducible train/eval splits
    // at any scale — no RNG state, membership derivable from the row).
    QueryDef.views("sm1_det_sample",
      """SELECT doc_id, lang FROM documents
        |WHERE ascii(substring(md5(text), 1, 1)) % 4 = 0
        |ORDER BY doc_id""".stripMargin) { spark =>
      spark.table("documents")
        .filter(ascii(substring(md5(col("text")), 1, 1)) % 4 === 0)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Stratified quota sampling: top-N docs per language stratum by a
    // quality signal (length), deterministic tiebreak — the class-balance
    // curation step of a training-data pipeline.
    QueryDef.views("sm2_quota_per_lang",
      """SELECT lang, doc_id, n_chars FROM (
        |  SELECT lang, doc_id, n_chars, row_number() OVER
        |    (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |WHERE rn <= 50 ORDER BY lang, doc_id""".stripMargin) { spark =>
      val w = Window.partitionBy("lang")
        .orderBy(col("n_chars").desc, col("doc_id"))
      spark.table("documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 50)
        .select("lang", "doc_id", "n_chars")
        .orderBy("lang", "doc_id")
    },

    // IVF ANN (the second scale path besides LSH): coarse quantizer from
    // 2 relational Lloyd iterations (deterministic seeds = first K
    // vectors), queries probe the nprobe nearest cells, exact rerank
    // inside probed cells. Centroid table is broadcast-sized (K×dims);
    // each iteration is one pass over the corpus + a tiny regroup —
    // the standard IVF build shape at 100 TB. Rows-only check.
    QueryDef("ivf1_ann", (spark, dir) => {
      graft.Tables.registerAll(spark, dir)
      val k = 16
      val nprobe = 4
      val vecs = spark.table("embeddings")
        .withColumn("v", expr("transform(embedding, x -> cast(x as double))"))
        .withColumn("nrm", expr("sqrt(vec_dot(v, v))"))
        .select("vec_id", "v", "nrm")

      def assign(cents: org.apache.spark.sql.DataFrame) =
        vecs.crossJoin(broadcast(cents))
          .withColumn("score", expr("vec_dot(v, cvec)") / col("nrm"))
          .groupBy("vec_id")
          .agg(max_by(col("cluster"), struct(col("score"), -col("cluster")))
            .as("cluster"),
            first(col("v")).as("v"), first(col("nrm")).as("nrm"))

      def recenter(assigned: org.apache.spark.sql.DataFrame) =
        assigned.select(col("cluster"), posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy("cluster", "dim").agg(avg("x").as("m"))
          .groupBy("cluster")
          .agg(expr("transform(array_sort(collect_list(struct(dim, m))), p -> p.m)")
            .as("cvec"))

      val seed = vecs.filter(col("vec_id") < k)
        .select(col("vec_id").cast("int").as("cluster"), col("v").as("cvec"))
      val cents = recenter(assign(recenter(assign(seed))))
      val assigned = assign(cents).select("vec_id", "cluster", "v", "nrm")

      val queries = assigned.filter(col("vec_id") < 20)
      val probes = broadcast(queries.select(col("vec_id").as("q_vec_id"),
          col("v").as("qv"), col("nrm").as("qnrm")))
        .crossJoin(broadcast(cents))
        .withColumn("score", expr("vec_dot(qv, cvec)") / col("qnrm"))
      val probeW = Window.partitionBy("q_vec_id")
        .orderBy(col("score").desc, col("cluster"))
      val probed = probes.withColumn("rn", row_number().over(probeW))
        .filter(col("rn") <= nprobe)
        .select("q_vec_id", "qv", "qnrm", "cluster")

      val rerankW = Window.partitionBy("q_vec_id")
        .orderBy(col("cs").desc, col("nn"))
      probed.join(assigned, Seq("cluster"))
        .filter(col("vec_id") =!= col("q_vec_id"))
        .withColumn("cs",
          expr("vec_dot(qv, v)") / (col("qnrm") * col("nrm")))
        .select(col("q_vec_id"), col("vec_id").as("nn"), col("cs"))
        .withColumn("rn", row_number().over(rerankW))
        .filter(col("rn") <= 5)
        .select(col("q_vec_id"), col("rn").cast("bigint").as("rnk"),
          col("nn").as("nn_id"))
        .orderBy("q_vec_id", "rnk")
    }, None),

    // Language-ID by marker-word scoring (n-gram heuristic), deterministic
    // argmax tie-break. Token-membership counting (single tokenize pass +
    // set probes) rather than N regex scans per document — the heuristic
    // mirrors into the oracle.
    QueryDef.views("x1_lang_id",
      """WITH tk AS (SELECT doc_id, lang,
        |              list_filter(string_split(text, ' '), x -> len(x) > 0) AS toks
        |            FROM documents),
        |     s AS (SELECT doc_id, lang,
        |    CAST(len(list_filter(toks, x -> x IN ('the','and','of','to','in'))) AS BIGINT) AS s_en,
        |    CAST(len(list_filter(toks, x -> x IN ('el','la','los','de','que'))) AS BIGINT) AS s_es,
        |    CAST(len(list_filter(toks, x -> x IN ('der','die','und','das','ein'))) AS BIGINT) AS s_de,
        |    CAST(len(list_filter(toks, x -> x IN ('le','les','et','des','une'))) AS BIGINT) AS s_fr
        |  FROM tk)
        |SELECT doc_id, s_en, s_es, s_de, s_fr,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |       WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |       WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END AS pred_lang,
        |  (CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |        WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |        WHEN s_de >= s_fr THEN 'de' ELSE 'fr' END) = lang AS is_match
        |FROM s ORDER BY doc_id""".stripMargin) { spark =>
      def score(words: Seq[String]) = {
        val inList = words.map(w => s"'$w'").mkString(", ")
        expr(s"cast(size(filter(toks, x -> x in ($inList))) as bigint)")
      }
      val s = spark.table("documents")
        .withColumn("toks", expr("filter(split(text, ' '), x -> length(x) > 0)"))
        .select(col("doc_id"), col("lang"),
          score(Seq("the", "and", "of", "to", "in")).as("s_en"),
          score(Seq("el", "la", "los", "de", "que")).as("s_es"),
          score(Seq("der", "die", "und", "das", "ein")).as("s_de"),
          score(Seq("le", "les", "et", "des", "une")).as("s_fr"))
        // plan barrier: without it CollapseProject inlines every score
        // expression into each CASE branch below (~10 copies of each
        // tokenize+filter lambda → pathological codegen size)
        .repartition(spark.sparkContext.defaultParallelism)
      val pred = when(col("s_en") >= col("s_es") && col("s_en") >= col("s_de") &&
          col("s_en") >= col("s_fr"), "en")
        .when(col("s_es") >= col("s_de") && col("s_es") >= col("s_fr"), "es")
        .when(col("s_de") >= col("s_fr"), "de")
        .otherwise("fr")
      s.select(col("doc_id"), col("s_en"), col("s_es"), col("s_de"), col("s_fr"),
          pred.as("pred_lang"), (pred === col("lang")).as("is_match"))
        .orderBy("doc_id")
    },

    // Quality scoring: length / punctuation / stopword-ratio signals.
    QueryDef.views("x2_quality",
      """SELECT doc_id, n_chars,
        |  CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS BIGINT) AS n_punct,
        |  CAST(len(regexp_extract_all(text, '\b(the|and|of|to|a|in|is)\b')) AS BIGINT) AS n_stop,
        |  (CAST(len(regexp_extract_all(text, '\b(the|and|of|to|a|in|is)\b')) AS BIGINT) * 100)
        |    // CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) AS stop_pct,
        |  n_chars >= 100 AND
        |    CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS BIGINT) >= 20 AS quality_ok
        |FROM documents ORDER BY doc_id""".stripMargin) { spark =>
      val nTokens = size(expr("filter(split(text, ' '), x -> length(x) > 0)")).cast("bigint")
      val nStop = size(regexp_extract_all(col("text"),
        lit("\\b(the|and|of|to|a|in|is)\\b"), lit(0))).cast("bigint")
      spark.table("documents").select(
          col("doc_id"), col("n_chars"),
          nTokens.as("n_tokens"),
          size(regexp_extract_all(col("text"), lit("[.,!?;:]"), lit(0)))
            .cast("bigint").as("n_punct"),
          nStop.as("n_stop"),
          floor((nStop * 100) / nTokens).cast("bigint").as("stop_pct"),
          (col("n_chars") >= 100 && nTokens >= 20).as("quality_ok"))
        .orderBy("doc_id")
    },

    // Token counting: whitespace tokens + a BPE-ish regex tokenizer.
    QueryDef.views("x3_tokens",
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]')) AS BIGINT) AS bpe_tokens,
        |  n_chars // CAST(len(list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0)) AS BIGINT) AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin) { spark =>
      val ws = size(filter(split(col("text"), "\\s+"),
        x => length(x) > 0)).cast("bigint")
      val bpe = size(regexp_extract_all(col("text"),
        lit("[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\\s]"), lit(0))).cast("bigint")
      spark.table("documents").select(
          col("doc_id"), ws.as("ws_tokens"), bpe.as("bpe_tokens"),
          floor(col("n_chars") / ws).cast("bigint").as("chars_per_token"))
        .orderBy("doc_id")
    },

    // Document fingerprinting: normalized content digest + distinct-bigram
    // shingle stats + minimum bigram digest (rolling-hash-style sketch).
    QueryDef.views("x4_fingerprint",
      """WITH t AS (SELECT doc_id, lower(text) AS lt,
        |             list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
        |           FROM documents),
        |  bg AS (SELECT doc_id, lt,
        |           CASE WHEN len(w) >= 2
        |                THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        |                ELSE NULL END AS bgs
        |         FROM t)
        |SELECT doc_id, substring(md5(lt), 1, 16) AS fp16,
        |  CASE WHEN bgs IS NULL THEN 0
        |       ELSE CAST(len(list_distinct(bgs)) AS BIGINT) END AS n_bigrams,
        |  CASE WHEN bgs IS NULL THEN NULL
        |       ELSE list_min(list_transform(bgs, b -> md5(b))) END AS min_bigram_md5
        |FROM bg ORDER BY doc_id""".stripMargin) { spark =>
      spark.table("documents")
        .withColumn("w", expr("filter(split(text, ' '), x -> length(x) > 0)"))
        .withColumn("bgs", expr(
          """case when size(w) >= 2
            |  then transform(sequence(1, size(w) - 1),
            |                 i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))
            |  else null end""".stripMargin))
        .select(col("doc_id"),
          substring(md5(lower(col("text"))), 1, 16).as("fp16"),
          expr("case when bgs is null then cast(0 as bigint) else cast(size(array_distinct(bgs)) as bigint) end")
            .as("n_bigrams"),
          expr("case when bgs is null then cast(null as string) else array_min(transform(bgs, b -> md5(b))) end")
            .as("min_bigram_md5"))
        .orderBy("doc_id")
    },

    // Multimodal column plumbing: opaque binary payload + typed metadata from
    // a deterministic decode stub (container has no image/audio libs — the
    // Spark-side schema/partitioning/batch plumbing is the real part; see
    // graft.ops.Multimodal for the mapPartitions decode path + its spec).
    QueryDef.views("m1_multimodal_meta",
      """SELECT doc_id,
        |  CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
        |  substring(sha256(text), 1, 16) AS sha16,
        |  64 + CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) % 512 AS width,
        |  64 + n_chars % 512 AS height,
        |  CASE WHEN n_chars % 3 = 0 THEN 'image'
        |       WHEN n_chars % 3 = 1 THEN 'audio' ELSE 'video' END AS modality
        |FROM documents ORDER BY doc_id""".stripMargin) { spark =>
      val byteLen = octet_length(col("text")).cast("bigint")
      spark.table("documents").select(
          col("doc_id"),
          byteLen.as("byte_len"),
          substring(sha2(col("text"), 256), 1, 16).as("sha16"),
          (lit(64) + byteLen % 512).as("width"),
          (lit(64) + col("n_chars") % 512).as("height"),
          when(col("n_chars") % 3 === 0, "image")
            .when(col("n_chars") % 3 === 1, "audio")
            .otherwise("video").as("modality"))
        .orderBy("doc_id")
    },

    // Per-label embedding centroid sums (cluster centroids for training-
    // data curation). Integer-exact cross-engine: each float is scaled by
    // 2^20 in double (exact — power-of-two scaling) and floored, so the
    // per-dimension sums are BIGINT on both sides. The typed-API twin is
    // graft.functions.VectorMeanAggregator (Aggregator[IN,BUF,OUT]).
    QueryDef.views("v1_label_centroid",
      """SELECT CAST(label AS BIGINT) AS label, i - 1 AS dim,
        |       CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT)) AS BIGINT) AS sum_scaled,
        |       count(*) AS n
        |FROM embeddings, generate_series(1, 64) AS t(i)
        |GROUP BY 1, 2 ORDER BY label, dim""".stripMargin) { spark =>
      spark.table("embeddings")
        .select(col("label").cast("bigint").as("label"),
          posexplode(col("embedding")).as(Seq("dim", "x")))
        .groupBy("label", "dim")
        .agg(sum(floor(col("x").cast("double") * 1048576).cast("bigint"))
          .as("sum_scaled"), count(lit(1)).as("n"))
        .select(col("label"), col("dim").cast("bigint").as("dim"),
          col("sum_scaled"), col("n"))
        .orderBy("label", "dim")
    },

    // Sketch aggregation: HLL approximate distinct (engine-specific sketch →
    // rows-only check; exact twin cd1 is the oracle-backed counterpart).
    QueryDef("hll1_approx_distinct", (spark, dir) => {
      graft.Tables.registerAll(spark, dir)
      spark.table("events")
        .groupBy("event_type")
        .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
          countDistinct(col("user_id")).as("exact_users"))
        .orderBy("event_type")
    }, None)
  )
}
