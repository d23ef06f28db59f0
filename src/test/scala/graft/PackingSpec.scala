package graft

import graft.operators.Packing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sequence packing: stream-tiling invariants of concat-and-chunk,
  * the greedy no-split fill rule, oversize handling, partition
  * invariance, and the one-exchange plan.
  */
class PackingSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  /** Deterministic fixture: doc i has 10 + (i*7 % 90) tokens. */
  private def toks(n: Int): DataFrame = {
    import spark.implicits._
    (0 until n).map(i => (i.toLong, 10L + (i * 7 % 90)))
      .toDF("doc_id", "n_tokens")
  }

  test("chunk slices tile each document exactly once") {
    import spark.implicits._
    val sl = Packing.concatChunkSlices(toks(300), ctxLen = 64, nShards = 8)
    // per doc: slices cover [0, n_tokens) contiguously
    val perDoc = sl.groupBy("doc_id", "n_tokens")
      .agg(sum("len").as("covered"), min("doc_off").as("first"),
        count(lit(1)).as("k"))
    assert(perDoc.where(col("covered") =!= col("n_tokens") ||
      col("first") =!= 0).count() == 0)
    // straddling docs exist at ctx=64 with 10-99-token docs
    assert(perDoc.where(col("k") > 1).count() > 0)
  }

  test("chunk slices tile each sequence: full ctx except a shard's last seq") {
    import spark.implicits._
    val ctx = 64L
    val sl = Packing.concatChunkSlices(toks(300), ctx, nShards = 8)
    val seqs = Packing.packStats(sl, ctx)
    val lastSeq = sl.groupBy("shard")
      .agg(max("seq_in_shard").as("seq_in_shard"))
    val nonLast = seqs.join(lastSeq, Seq("shard", "seq_in_shard"),
      "left_anti")
    assert(nonLast.where(col("fill") =!= ctx).count() == 0,
      "every non-final sequence must be exactly full")
    // seq_off + len never exceeds ctx
    assert(sl.where(col("seq_off") + col("len") > ctx).count() == 0)
  }

  test("single-shard golden: offsets are the running concatenation") {
    import spark.implicits._
    val docs = Seq((1L, 30L), (2L, 50L), (3L, 10L))
      .toDF("doc_id", "n_tokens")
    val got = Packing
      .concatChunkSlices(docs, ctxLen = 64, nShards = 1)
      .select("doc_id", "tok_start", "seq_in_shard", "doc_off", "seq_off",
        "len")
      .as[(Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._3)).toList
    // stream: doc1 [0,30) doc2 [30,80) doc3 [80,90); cut at 64
    assert(got == List(
      (1L, 0L, 0L, 0L, 0L, 30L),
      (2L, 30L, 0L, 0L, 30L, 34L),
      (2L, 30L, 1L, 34L, 0L, 16L),
      (3L, 80L, 1L, 0L, 16L, 10L)))
  }

  test("greedy: no split, fit-whole rule, new seq only on overflow") {
    import spark.implicits._
    val ctx = 64L
    val g = Packing.greedyPack(toks(300), ctx, nShards = 8)
    // non-oversize docs always fit whole
    assert(g.where(!col("oversize") &&
      col("off_in_seq") + col("n_tokens") > ctx).count() == 0)
    // oversize docs sit alone at offset 0
    assert(g.where(col("oversize") && col("off_in_seq") =!= 0).count() == 0)
    val byShard = g.as[(Long, Int, Long, Long, Long, Boolean)].collect()
      .groupBy(_._2).values
    for (rows <- byShard) {
      val ordered = rows.sortBy(_._1)
      var fill = -1L // sentinel: before any seq
      var seq = -1L
      for ((_, _, n, s, off, _) <- ordered) {
        if (s != seq) {
          // greedy: may only open a new seq when the doc did not fit
          assert(s == seq + 1, "sequence ids are dense")
          assert(fill < 0 || fill + n > 64, s"doc of $n opened seq $s early")
          seq = s; fill = 0L
        }
        assert(off == fill, "docs are laid contiguously")
        fill += n
      }
    }
  }

  test("both variants: partition-invariant, zero-token docs dropped") {
    import spark.implicits._
    val base = toks(200).union(
      Seq((9999L, 0L)).toDF("doc_id", "n_tokens"))
    def fp(df: DataFrame) = df.collect().map(_.toString).sorted.toList
    val a = Packing.concatChunkSlices(base, 64, 8)
    val b = Packing.concatChunkSlices(base.repartition(17), 64, 8)
    assert(fp(a) == fp(b))
    assert(a.where(col("doc_id") === 9999L).count() == 0)
    val ga = Packing.greedyPack(base, 64, 8)
    val gb = Packing.greedyPack(base.repartition(17), 64, 8)
    assert(fp(ga) == fp(gb))
    assert(ga.where(col("doc_id") === 9999L).count() == 0)
  }

  test("packStats: fills conserve tokens; waste bounded by ctx") {
    import spark.implicits._
    val ctx = 64L
    val g = Packing.greedyPack(toks(300), ctx, nShards = 8)
    val st = Packing.packStats(g, ctx)
    val totalFill = st.agg(sum("fill")).as[Long].collect()(0)
    val totalToks = toks(300).agg(sum("n_tokens")).as[Long].collect()(0)
    assert(totalFill == totalToks)
    // only oversize sequences may have negative waste
    val overSeqs = g.where(col("oversize"))
      .select("shard", "seq_in_shard").distinct()
    assert(st.join(overSeqs, Seq("shard", "seq_in_shard"), "left_anti")
      .where(col("waste") < 0).count() == 0)
  }

  test("plan: concat-and-chunk is a single exchange (the shard window)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def exchanges(p: SparkPlan): Seq[ShuffleExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case q: QueryStageExec => exchanges(q.plan)
      case e: ShuffleExchangeLike => e +: p.children.flatMap(exchanges)
      case _ => p.children.flatMap(exchanges)
    }
    val q = Packing.concatChunkSlices(toks(300), 64, 8)
    q.count()
    val shuffles = exchanges(q.queryExecution.executedPlan)
    assert(shuffles.size == 1,
      s"expected exactly one exchange:\n${q.queryExecution.executedPlan}")
  }
}
