package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Similarity, TextOps}
import graft.spark.{PagesGen, Pipeline}

/** Driver contract — one `queries` entry per implemented operator family
  * (SURVEY.md §2 + the training-data ops), with a DuckDB-runnable oracle for
  * every SQL-expressible one. Column names are aliased identically on both
  * sides (the driver's compare sorts columns by name before hashing).
  *
  * The extraction queries are END-TO-END oracle checks: the pages payloads
  * are built deterministically FROM the documents text by the fixture
  * builders, so extraction must round-trip the text byte-for-byte (PDF) or
  * whitespace-normalized (HTML) — the oracle is plain SQL over `documents`.
  */
object SparkEntry {

  /** Flagship: the full extraction pipeline (dedup -> salted mapPartitions
    * kernel) over a mixed PDF/HTML corpus synthesized from sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val pages = PagesGen.pagesMixed(spark, "/root/testdata/sf0.001").toDF()
    Pipeline.run(spark, pages, runId = "entry").toDF()
      .select("url", "status", "text")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----------------------------------------------------- extraction (E2E)
    "x10_extract_pdf" -> ((s, dir) => {
      import s.implicits._
      // PDF payload variants rotate (classic xref / flate / objstm / multi-
      // filter); extraction must return the exact original text.
      PagesGen.pagesPdf(s, dir).map { row =>
        val r = Extract(row.html)
        (row.url.substring(row.url.lastIndexOf('-') + 1).toLong, r.text)
      }.toDF("doc_id", "extracted").orderBy("doc_id")
    }),
    "x11_extract_html" -> ((s, dir) => {
      import s.implicits._
      PagesGen.pagesHtml(s, dir).map { row =>
        val r = Extract(row.html)
        (row.url.substring(row.url.lastIndexOf('-') + 1).toLong, r.text)
      }.toDF("doc_id", "extracted").orderBy("doc_id")
    }),
    "x23_extract_boilerplate" -> ((s, dir) => {
      import s.implicits._
      // Boilerplate-rich pages: nav/header/aside/footer must be stripped,
      // leaving exactly "Doc <id>\n<collapsed text>".
      PagesGen.pagesHtmlBoiler(s, dir).map { row =>
        val r = Extract(row.html)
        (row.url.substring(row.url.lastIndexOf('-') + 1).toLong, r.text)
      }.toDF("doc_id", "extracted").orderBy("doc_id")
    }),
    "x22_match_rate" -> ((s, dir) => {
      // THE north-rule metric made explicit: byte-identical match rate of
      // extracted text vs the source text (must be 1.0 == n_total).
      import s.implicits._
      val extracted = PagesGen.pagesPdf(s, dir).map { row =>
        (row.url.substring(row.url.lastIndexOf('-') + 1).toLong, Extract(row.html).text)
      }.toDF("doc_id", "extracted")
      val docs = s.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
      extracted.join(docs, "doc_id")
        .agg(sum(when(col("extracted") === col("text"), 1L).otherwise(0L)).as("n_match"),
          count(lit(1)).as("n_total"))
    }),
    "x12_extract_statuses" -> ((s, dir) => {
      val extracted = Pipeline.run(s, PagesGen.pagesMixed(s, dir).toDF(), "x12")
      extracted.toDF().groupBy("status").agg(count(lit(1)).as("n")).orderBy("status")
    }),

    // ------------------------------------------------- relational operators
    "q01_lineitem_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q02_top_orders" -> ((s, dir) => {
      val orders = s.read.parquet(s"$dir/orders.parquet")
      val customer = s.read.parquet(s"$dir/customer.parquet")
      orders.join(broadcast(customer), orders("o_custkey") === customer("c_custkey"))
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
    }),
    "q03_region_customers" -> ((s, dir) => {
      val customer = s.read.parquet(s"$dir/customer.parquet")
      val nation = s.read.parquet(s"$dir/nation.parquet")
      val region = s.read.parquet(s"$dir/region.parquet")
      customer
        .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
        .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("n_cust"))
        .orderBy("r_name")
    }),
    "q10_json_props" -> ((s, dir) => {
      // Semi-structured props column: JSON field extraction + integer sums
      // (engine-exact arithmetic for the oracle).
      s.read.parquet(s"$dir/events.parquet")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
        .orderBy("event_type")
    }),
    "q04_latest_event" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val events = s.read.parquet(s"$dir/events.parquet")
      val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      events.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("event_type").as("last_type"))
        .orderBy("user_id")
    }),

    // ------------------------------------------------------- text analysis
    "q05_token_count" -> ((s, dir) => {
      TextOps.withTokenCount(s.read.parquet(s"$dir/documents.parquet"))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"))
        .orderBy("doc_id")
    }),
    "q06_exact_dedup" -> ((s, dir) => {
      Dedup.exactSurvivors(s.read.parquet(s"$dir/documents.parquet"))
        .join(s.read.parquet(s"$dir/documents.parquet").groupBy("text")
          .agg(count(lit(1)).as("n_copies")), "text")
        .select(col("keep_id"), col("n_copies"))
        .orderBy("keep_id")
    }),
    "q07_quality" -> ((s, dir) => {
      TextOps.withQuality(s.read.parquet(s"$dir/documents.parquet"))
        .select(col("doc_id"), col("n_chars_c").cast("long").as("n_chars_c"),
          col("n_words").cast("long").as("n_words"),
          col("n_punct").cast("long").as("n_punct"),
          col("n_digits").cast("long").as("n_digits"),
          col("n_upper").cast("long").as("n_upper"))
        .orderBy("doc_id")
    }),
    "q08_norm_dedup" -> ((s, dir) => {
      val docs = s.read.parquet(s"$dir/documents.parquet")
        .withColumn("norm", regexp_replace(trim(col("text")), "[ \\t\\r\\n]+", " "))
      docs.groupBy("norm")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    }),

    // -------------------------------------------------- similarity search
    "q09_ann_topk" -> ((s, dir) => {
      // Exact top-10 by QUANTIZED integer dot product (identical arithmetic
      // in DuckDB -> hash-stable oracle).
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val minId = emb.agg(min("vec_id")).head().getLong(0)
      val q = broadcast(emb.filter(col("vec_id") === minId)
        .select(col("embedding").as("qe")))
      emb.filter(col("vec_id") =!= minId)
        .crossJoin(q)
        .withColumn("dot", expr(Similarity.QuantDotExpr))
        .select(col("vec_id").as("neighbor_id"), col("dot"))
        .orderBy(col("dot").desc, col("neighbor_id"))
        .limit(10)
    }),
    "x13_ann_bruteforce_cosine" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val qids = emb.select("vec_id").orderBy("vec_id").limit(3)
        .collect().map(_.getLong(0)).toSeq
      Similarity.bruteForceTopK(s, emb, qids, k = 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy("query_id", "rank")
    }),
    "x14_ann_lsh" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val qids = emb.select("vec_id").orderBy("vec_id").limit(3)
        .collect().map(_.getLong(0)).toSeq
      Similarity.lshTopK(s, emb, qids, k = 10, bits = Similarity.bitsFor(emb.count()))
        .select(col("query_id"), col("neighbor_id"), col("rank"))
        .orderBy("query_id", "rank")
    }),
    "x15_embedding_buckets" -> ((s, dir) => {
      val e15 = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.withLshBucket(e15, bits = Similarity.bitsFor(e15.count()))
        .groupBy("lsh_bucket").agg(count(lit(1)).as("n"))
        .orderBy("lsh_bucket")
    }),

    // ------------------------------------------------------ fuzzy dedup
    "x16_minhash_groups" -> ((s, dir) => {
      Dedup.minhashDupGroups(s, s.read.parquet(s"$dir/documents.parquet"))
        .orderBy("doc_id")
    }),
    "x17_simhash" -> ((s, dir) => {
      Dedup.withSimhash(s.read.parquet(s"$dir/documents.parquet"))
        .select("doc_id", "simhash").orderBy("doc_id")
    }),
    "x18_langid" -> ((s, dir) => {
      TextOps.withLangId(s.read.parquet(s"$dir/documents.parquet"))
        .select("doc_id", "lang", "lang_pred").orderBy("doc_id")
    }),
    "x19_fingerprint" -> ((s, dir) => {
      TextOps.withFingerprint(s.read.parquet(s"$dir/documents.parquet"))
        .select("doc_id", "fp64").orderBy("doc_id")
    }),

    // ----------------------------------------- SQL surface (Catalyst expr)
    "x21_extract_sql" -> ((s, dir) => {
      // The native extract_text Expression through plain SQL; same oracle as
      // the typed-kernel query x10.
      graft.spark.GraftFunctions.register(s)
      PagesGen.pagesPdf(s, dir).toDF().createOrReplaceTempView("graft_pages")
      s.sql(
        """SELECT CAST(substring(url, length(url) - 5, 6) AS BIGINT) AS doc_id,
          |       extract_text(html).text AS extracted
          |FROM graft_pages ORDER BY doc_id""".stripMargin)
    }),

    // -------------------------------------------------------- multimodal
    "x20_multimodal_decode" -> ((s, dir) => {
      Multimodal.decodeFeatures(Multimodal.mediaTable(s, dir)).toDF()
        .select("doc_id", "kind", "width", "height", "n_bytes")
        .orderBy("doc_id")
    }))

  /** DuckDB-runnable oracles. Arithmetic is engine-exact by construction:
    * counts, integer-valued double sums, quantized integer dot products,
    * identical regex classes. Extraction oracles work because the payloads
    * are built FROM documents.text deterministically.
    */
  def oracleSql: Map[String, String] = Map(
    "x10_extract_pdf" ->
      "SELECT doc_id, text AS extracted FROM documents ORDER BY doc_id",
    "x21_extract_sql" ->
      "SELECT doc_id, text AS extracted FROM documents ORDER BY doc_id",
    "x22_match_rate" ->
      "SELECT CAST(count(*) AS BIGINT) AS n_match, CAST(count(*) AS BIGINT) AS n_total FROM documents",
    "x23_extract_boilerplate" ->
      ("SELECT doc_id, CASE WHEN norm = '' THEN 'Doc ' || CAST(doc_id AS VARCHAR) " +
        "ELSE 'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || norm END AS extracted FROM " +
        "(SELECT doc_id, trim(regexp_replace(text, '[ \\t\\r\\n\\x0B\\x0C]+', ' ', 'g'), ' ') AS norm " +
        "FROM documents) ORDER BY doc_id"),
    "x11_extract_html" ->
      ("SELECT doc_id, trim(regexp_replace(text, '[ \\t\\r\\n\\x0B\\x0C]+', ' ', 'g'), ' ') " +
        "AS extracted FROM documents ORDER BY doc_id"),
    "q01_lineitem_agg" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity) AS sum_qty " +
        "FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"),
    "q02_top_orders" ->
      ("SELECT o.o_orderkey, c.c_name, o.o_totalprice FROM orders o " +
        "JOIN customer c ON o.o_custkey = c.c_custkey " +
        "ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 10"),
    "q03_region_customers" ->
      ("SELECT r.r_name, count(*) AS n_cust FROM customer c " +
        "JOIN nation n ON c.c_nationkey = n.n_nationkey " +
        "JOIN region r ON n.n_regionkey = r.r_regionkey " +
        "GROUP BY 1 ORDER BY 1"),
    "q04_latest_event" ->
      ("SELECT user_id, event_id AS last_event_id, event_type AS last_type FROM (" +
        "SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
        "FROM events) WHERE rn = 1 ORDER BY user_id"),
    "q10_json_props" ->
      ("SELECT event_type, count(*) AS n, " +
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k " +
        "FROM events GROUP BY 1 ORDER BY 1"),
    "q05_token_count" ->
      ("SELECT doc_id, CASE WHEN trim(text) = '' THEN 0 ELSE " +
        "len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens " +
        "FROM documents ORDER BY doc_id"),
    "q06_exact_dedup" ->
      ("SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents " +
        "GROUP BY text ORDER BY keep_id"),
    "q07_quality" ->
      ("SELECT doc_id, length(text) AS n_chars_c, " +
        "CASE WHEN trim(text) = '' THEN 0 ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words, " +
        "length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS n_punct, " +
        "length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits, " +
        "length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper " +
        "FROM documents ORDER BY doc_id"),
    "q08_norm_dedup" ->
      ("SELECT min(doc_id) AS keep_id, count(*) AS n_copies FROM documents " +
        "GROUP BY regexp_replace(trim(text), '[ \\t\\r\\n]+', ' ', 'g') ORDER BY keep_id"),
    "q09_ann_topk" ->
      ("WITH mn AS (SELECT min(vec_id) AS mid FROM embeddings), " +
        "q AS (SELECT embedding AS qe FROM embeddings, mn WHERE vec_id = mid) " +
        "SELECT e.vec_id AS neighbor_id, " +
        "CAST(list_sum(list_transform(range(1, len(e.embedding) + 1), i -> " +
        "CAST(round(CAST(e.embedding[i] AS DOUBLE) * 1000) AS BIGINT) * " +
        "CAST(round(CAST(q.qe[i] AS DOUBLE) * 1000) AS BIGINT))) AS BIGINT) AS dot " +
        "FROM embeddings e, q, mn WHERE e.vec_id <> mn.mid " +
        "ORDER BY dot DESC, neighbor_id LIMIT 10"))
}
