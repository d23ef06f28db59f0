package graft

import graft.model.Triple
import graft.operators._
import graft.plans.Pipeline
import graft.sources.{ChemDict, PageGen}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query families:
  *  - `kg_*`  : the KG-construction pipeline (SURVEY.md §2 operators
  *    S4, P1-P3, F1-F10, M1-M4, W1-W3, J3-J4 fused in the dataflow;
  *    J1/J2 linking; J5 canonicalization) over the synthesized page
  *    table. Not SQL-expressible → no oracle entry (driver records
  *    rows-only); the correctness gate for these is `sbt -batch test`
  *    (PipelineSpec asserts triple P/R >= 0.95 vs generated gold).
  *  - `dedup_* / text_* / ann_* / mm_*`: training-data pipeline ops
  *    over the driver's documents/embeddings tables; SQL oracles where
  *    the result is exactly reproducible in DuckDB (integer/string
  *    outputs), rows-only for float/LSH outputs.
  *  - `q*`    : relational analogs (A1-A6 aggregations, J1-style joins,
  *    W1-style windows, set ops, sorts/limits — SURVEY.md §2.3-2.6)
  *    over the TPC-H-ish tables, all with exact DuckDB oracles.
  */
object SparkEntry {

  private def pages(s: SparkSession, dir: String) =
    PageGen.pages(s, PageGen.numPagesFor(dir))

  private def annotated(s: SparkSession, dir: String) =
    Pipeline.annotate(Pipeline.sentences(pages(s, dir)),
      ChemDict.entries.flatMap(_.synonyms))

  private def docs(s: SparkSession, dir: String) =
    s.read.parquet(s"$dir/documents.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.run(PageGen.pages(spark, 200)).toDF()

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------- KG pipeline (rows-only; gated by PipelineSpec P/R) ----------
    "kg_sentences" -> ((s, dir) =>
      Pipeline.sentences(pages(s, dir))
        .select(col("url"), col("sentId"), col("section"), col("title"),
          col("doi"), concat_ws("; ", col("authors")).as("authors"),
          col("pubDate"), col("text"))
        .orderBy("url", "sentId")),
    "kg_tables" -> ((s, dir) => {
      // P1 tables: extracted ragged cells keyed c_0..c_n (colspan-aware)
      import s.implicits._
      pages(s, dir).flatMap { p =>
        graft.functions.Html.extract(p.html).tables.zipWithIndex.toSeq.flatMap {
          case (t, ti) => t.rows.zipWithIndex.toSeq.flatMap { case (r, ri) =>
            r.cells.toSeq.sortBy(_._1).map { case (k, v) =>
              (p.url, ti, t.heading, ri, k, v)
            }
          }
        }
      }.toDF("url", "table_idx", "heading", "row_idx", "cell_key", "cell_value")
        .orderBy("url", "table_idx", "row_idx", "cell_key")
    }),
    "kg_entities" -> ((s, dir) => {
      import s.implicits._
      annotated(s, dir)
        .flatMap(x => x.ents.map(e =>
          (x.url, x.sentId, e.startChar, e.endChar, e.text, e.label, e.entId,
            e.value, e.unit)))
        .toDF("url", "sent_id", "start_char", "end_char", "ent_text", "label",
          "ent_id", "value", "unit")
        .orderBy("url", "sent_id", "start_char")
    }),
    "kg_relations" -> ((s, dir) => {
      import s.implicits._
      annotated(s, dir)
        .flatMap(x => x.rels.map(r => (x.url, x.sentId, r.headTok, r.tailTok,
          r.label, r.score)))
        .toDF("url", "sent_id", "head_tok", "tail_tok", "rel_label", "score")
        .orderBy("url", "sent_id", "head_tok", "tail_tok")
    }),
    "kg_triples" -> ((s, dir) =>
      Pipeline.run(pages(s, dir)).toDF()
        .orderBy("url", "sentId", "headText", "valueText")),
    "kg_linked" -> ((s, dir) =>
      // fused single-pass path: annotated feeds BOTH the triple assembly
      // and the A1 mention count; only compact (mention|triple) rows are
      // persisted, not full Sentence rows (Linking.linkTriplesFused)
      Linking.linkTriplesFused(annotated(s, dir), ChemDict.entries)
        .orderBy("url", "sentId", "headText", "valueText")),
    "kg_linked_salted" -> ((s, dir) => {
      // no persist: a returned-DataFrame query cannot unpersist after its
      // action, and a leaked cache block outlives the query in long
      // sessions — the annotate stage is recomputed for the second scan
      val ann = annotated(s, dir)
      Linking.linkTriplesSalted(Pipeline.triples(ann), ann, ChemDict.entries)
        .orderBy("url", "sentId", "headText", "valueText")
    }),
    "kg_entity_table" -> ((s, dir) =>
      Canonicalize.entityTable(s, ChemDict.entries).toDF()
        .select("clusterId", "cid", "canonicalName", "molecularFormula",
          "molecularWeight")
        .orderBy("clusterId", "cid")),
    "kg_abbreviations" -> ((s, dir) =>
      Pipeline.abbreviations(Pipeline.sentences(pages(s, dir)))
        .toDF("url", "sent_id", "short_text", "short_start", "short_end",
          "long_text", "long_start", "long_end")
        .orderBy("url", "sent_id", "short_start")),
    "kg_rel_sweep" -> ((s, dir) => {
      // model + random-baseline sweep (evaluate.py:71-99); integer-only
      // projection (threshold scaled x1000) so the DuckDB oracle can
      // reproduce it exactly — float P/R/F stay available via
      // Evaluate.thresholdSweep and are derivable from tp/fp/fn
      val n = PageGen.numPagesFor(dir)
      Evaluate.thresholdSweepWithBaseline(annotated(s, dir), PageGen.goldSentences(s, n))
        .select(col("scorer"),
          round(col("threshold") * 1000).cast("int").as("threshold_m"),
          col("tp"), col("fp"), col("fn"))
        .orderBy("scorer", "threshold_m")
    }),
    "kg_kfold" -> ((s, dir) =>
      // S8 cv option: stratified 5-fold assignment histogram
      Corpus.kfoldStratified(annotated(s, dir))
        .groupBy("fold_id", "stratum", "heldout_role")
        .agg(count(lit(1)).as("n"))
        .orderBy("fold_id", "stratum", "heldout_role")),
    "kg_prop_counts" -> ((s, dir) => {
      // A2 per-property-type histogram (ui/utils.py:185-198 analog)
      import s.implicits._
      annotated(s, dir)
        .flatMap(x => x.ents.filter(e => e.label == "PROP" || e.label == "FORMULA")
          .map(_.entId))
        .toDF("prop_type")
        .groupBy("prop_type").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("prop_type"))
    }),
    "kg_quantity_counts" -> ((s, dir) => {
      // A2 per-quantity-label histogram
      import s.implicits._
      annotated(s, dir)
        .flatMap(x => x.ents.filter(e => !Relations.HeadLabels.contains(e.label))
          .map(_.label))
        .toDF("quantity_label")
        .groupBy("quantity_label").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("quantity_label"))
    }),
    "kg_label_studio" -> ((s, dir) =>
      Export.labelStudioJson(annotated(s, dir))
        .orderBy("url", "sent_id")),
    "kg_corpus_split" -> ((s, dir) =>
      Corpus.split(annotated(s, dir))
        .groupBy("fold").agg(count(lit(1)).as("n_sentences"))
        .orderBy("fold")),
    "kg_mention_counts" -> ((s, dir) =>
      Linking.mentionCounts(annotated(s, dir))
        .filter(col("occurrences") >= Linking.MinOccurrences)
        .orderBy(desc("occurrences"), asc("mention"))),
    "kg_doc_filter" -> ((s, dir) => {
      import s.implicits._
      annotated(s, dir)
        .map(x => (x.section, if (Relations.keepDoc(x.ents)) 1 else 0))
        .toDF("section", "kept")
        .groupBy("section").agg(count(lit(1)).as("n_sentences"),
          sum("kept").as("n_kept"))
        .orderBy("section")
    }),

    // ---------- dedup (oracle where exact) ----------
    "dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(docs(s, dir)).orderBy("text_hash")),
    "dedup_exact_survivors" -> ((s, dir) =>
      Dedup.exactSurvivors(docs(s, dir)).select("doc_id").orderBy("doc_id")),
    "dedup_minhash_pairs" -> ((s, dir) =>
      Dedup.minhashPairs(docs(s, dir), threshold = 0.5).orderBy("id_a", "id_b")),
    "dedup_minhash_clusters" -> ((s, dir) =>
      Dedup.minhashClusters(docs(s, dir), threshold = 0.5)
        .orderBy("doc_id")),
    "dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashPairs(docs(s, dir)).orderBy("id_a", "id_b")),
    "dedup_embedding_pairs" -> ((s, dir) => {
      // evidence-bearing: plant exact duplicates (every 50th vector
      // reappears under id+1,000,000). The driver table has no natural
      // cosine>=0.95 pairs, so the expected output is exactly the
      // planted pairs — SQL-oracle-able and regression-sensitive.
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      val planted = emb.filter(col("vec_id") % 50 === 0)
        .withColumn("vec_id", col("vec_id") + lit(1000000L))
      Dedup.embeddingPairs(emb.unionByName(planted), threshold = 0.95)
        .orderBy("id_a", "id_b")
    }),

    // ---------- text analysis ----------
    "text_tokens" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextStats.wsTokenCount(col("text")).as("n_ws_tokens"),
        TextStats.bpeishTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy("doc_id")),
    "text_quality" -> ((s, dir) =>
      TextStats.withQualitySignals(docs(s, dir))
        .select("doc_id", "n_chars_m", "n_punct", "n_digits", "n_upper")
        .orderBy("doc_id")),
    "text_langid" -> ((s, dir) =>
      TextStats.withLangId(docs(s, dir))
        .groupBy("lang_pred").agg(count(lit(1)).as("n"))
        .orderBy("lang_pred")),
    "text_fingerprint" -> ((s, dir) =>
      docs(s, dir).select(col("doc_id"),
        graft.functions.GraftFunctions.fingerprint64(col("text")).as("fp64"))
        .orderBy("doc_id")),

    // ---------- similarity search ----------
    "ann_brute_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.bruteForceTopK(emb, emb.orderBy("vec_id").limit(20), 10)
        .orderBy("query_id", "rank")
    }),
    "ann_lsh_topk" -> ((s, dir) => {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
      Similarity.lshTopK(emb, emb.orderBy("vec_id").limit(20), 10)
        .orderBy("query_id", "rank")
    }),

    // ---------- multimodal plumbing ----------
    "mm_decode" -> ((s, dir) =>
      Multimodal.decode(Multimodal.genMedia(s, 500)).toDF()
        .orderBy("media_id")),
    "mm_frames" -> ((s, dir) =>
      Multimodal.sampleFrames(Multimodal.genMedia(s, 200), 4)
        .orderBy("media_id", "frame_idx")),

    // ---------- relational analogs with DuckDB oracles ----------
    "q1_agg" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")),
    "q2_join" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val part = s.read.parquet(s"$dir/part.parquet")
      li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"), sum("l_quantity").as("sum_qty"))
        .orderBy("p_brand")
    }),
    "q3_topk" -> ((s, dir) =>
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_partkey").agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("l_partkey")).limit(10)),
    "q4_window" -> ((s, dir) => {
      val li = s.read.parquet(s"$dir/lineitem.parquet")
      val w = Window.partitionBy("l_suppkey")
        .orderBy(col("l_shipdate").asc, col("l_orderkey").asc,
          col("l_linenumber").asc)
      li.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("l_suppkey", "rn", "l_orderkey", "l_linenumber")
        .orderBy("l_suppkey", "rn")
    }),
    "q5_antijoin" -> ((s, dir) => {
      val c = s.read.parquet(s"$dir/customer.parquet")
      val o = s.read.parquet(s"$dir/orders.parquet")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select("c_custkey").orderBy("c_custkey")
    }),
    "q6_setops" -> ((s, dir) => {
      val o = s.read.parquet(s"$dir/orders.parquet")
      val hi = o.filter(col("o_totalprice") > 100000).select("o_custkey")
      val recent = o.filter(col("o_orderdate") >= lit("1997-01-01"))
        .select("o_custkey")
      hi.intersect(recent).orderBy("o_custkey")
    }),
    "q7_events_window" -> ((s, dir) =>
      s.read.parquet(s"$dir/events.parquet")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("hour", "event_type")),
    "q8_filter_project" -> ((s, dir) =>
      s.read.parquet(s"$dir/orders.parquet")
        .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 50000)
        .select("o_orderkey", "o_custkey")
        .orderBy("o_orderkey"))
  )

  def oracleSql: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS text_hash, count(*) AS n_dups,
        | min(doc_id) AS keep_id
        | FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,
    "dedup_exact_survivors" ->
      """SELECT min(doc_id) AS doc_id FROM documents
        | GROUP BY md5(text) ORDER BY 1""".stripMargin,
    // n_bpe_tokens via a lookaround-free identity (DuckDB RE2 has no
    // lookarounds): pieces = maximal alnum runs + non-alnum non-space chars
    "text_tokens" ->
      """SELECT doc_id,
        | len(list_filter(string_split(text, ' '), x -> len(x) > 0)) AS n_ws_tokens,
        | len(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'),
        |   x -> len(x) > 0))
        |  + length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS n_bpe_tokens
        | FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """SELECT doc_id, length(text) AS n_chars_m,
        | length(text) - length(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')) AS n_punct,
        | length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
        | length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper
        | FROM documents ORDER BY doc_id""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        | count(*) AS n_rows
        | FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_join" ->
      """SELECT p_brand, count(*) AS n_items, sum(l_quantity) AS sum_qty
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | GROUP BY 1 ORDER BY 1""".stripMargin,
    "q3_topk" ->
      """SELECT l_partkey, count(*) AS n FROM lineitem
        | GROUP BY 1 ORDER BY n DESC, l_partkey ASC LIMIT 10""".stripMargin,
    "q4_window" ->
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber FROM (
        |   SELECT l_suppkey, l_orderkey, l_linenumber,
        |     row_number() OVER (PARTITION BY l_suppkey
        |       ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
        |   FROM lineitem)
        | WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin,
    "q5_antijoin" ->
      """SELECT c_custkey FROM customer
        | WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
        | ORDER BY 1""".stripMargin,
    "q6_setops" ->
      """SELECT o_custkey FROM orders WHERE o_totalprice > 100000
        | INTERSECT
        | SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        | ORDER BY 1""".stripMargin,
    "q7_events_window" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
        | FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q8_filter_project" ->
      """SELECT o_orderkey, o_custkey FROM orders
        | WHERE o_orderstatus = 'O' AND o_totalprice > 50000
        | ORDER BY 1""".stripMargin
  )
}
