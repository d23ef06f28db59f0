package graft

import graft.operators.Linking
import graft.plans.Pipeline
import graft.sources.{ChemDict, PageGen}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** J1/J2/A1 semantics + broadcast-vs-salted plan equivalence. */
class LinkingSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private val N = 120L

  private lazy val annotated = {
    val names = ChemDict.entries.flatMap(_.synonyms)
    Pipeline.annotate(Pipeline.sentences(PageGen.pages(spark, N)), names).cache()
  }
  private lazy val triples = Pipeline.triples(annotated).cache()

  test("A1 gate: only mentions with count >= 3 link (linker.py:138-155)") {
    import spark.implicits._
    val counts = Linking.mentionCounts(annotated)
    val linked = Linking.linkTriples(triples, annotated, ChemDict.entries)
    // every linked CHEM head must have surface count >= 3
    val linkedHeads = linked
      .filter(col("headLabel") === "CHEM" && col("cid").isNotNull)
      .select("headText").distinct().as[String].collect().toSet
    val eligible = counts.filter(col("occurrences") >= 3)
      .select("mention").as[String].collect().toSet
    assert(linkedHeads.subsetOf(eligible),
      s"linked-but-rare: ${(linkedHeads -- eligible).take(5)}")
    // rare mentions stay unlinked
    val rare = counts.filter(col("occurrences") < 3)
      .select("mention").as[String].collect().toSet
    val unlinkedRare = linked
      .filter(col("headLabel") === "CHEM" && col("cid").isNull)
      .select("headText").distinct().as[String].collect().toSet
    assert(rare.intersect(linkedHeads).isEmpty)
    assert(unlinkedRare.subsetOf(rare))
  }

  test("J1: heads resolve to the right CID via chem_norm") {
    import spark.implicits._
    val linked = Linking.linkTriples(triples, annotated, ChemDict.entries)
    val waterRows = linked.filter(col("headText") === "water" && col("cid").isNotNull)
    if (waterRows.count() > 0)
      assert(waterRows.select("cid").distinct().as[Long].collect().toSeq == Seq(1L))
    // synonym surfaces map to the same cid as the canonical name
    val tnt = linked.filter(lower(col("headText")).isin("tnt", "trinitrotoluene",
      "2,4,6-trinitrotoluene") && col("cid").isNotNull)
    val cids = tnt.select("cid").distinct().as[Long].collect().toSeq
    assert(cids.isEmpty || cids == Seq(10L))
  }

  test("J2 strict: attachToMentions rows = CHEM mentions; CIDs agree with the triple path") {
    import spark.implicits._
    val attached = Linking.attachToMentions(annotated,
      Linking.dictDs(spark, ChemDict.entries)).cache()
    // exactly one row per CHEM mention of the annotated table
    val nMentions = annotated.flatMap(s => s.ents.filter(_.label == "CHEM")).count()
    assert(attached.count() == nMentions)
    // A1 gate holds per mention
    val counts = Linking.mentionCounts(annotated).as[(String, Long)].collect().toMap
    attached.filter(col("cid").isNotNull).select("mention").distinct()
      .as[String].collect().foreach(m => assert(counts(m) >= 3, s"linked-but-rare: $m"))
    // the per-mention cid matches what the triple-head path links
    val tripleCids = Linking.linkTriples(triples, annotated, ChemDict.entries)
      .filter(col("headLabel") === "CHEM" && col("cid").isNotNull)
      .select(col("headText"), col("cid")).distinct()
      .as[(String, Long)].collect().toMap
    val mentionCids = attached.filter(col("cid").isNotNull)
      .select(col("mention"), col("cid")).distinct()
      .as[(String, Long)].collect().toMap
    assert(tripleCids.nonEmpty)
    tripleCids.foreach { case (m, c) =>
      assert(mentionCids.get(m).contains(c), s"cid mismatch for $m")
    }
    attached.unpersist()
  }

  test("attachToMentions runs the annotate subtree ONCE (fused single-pass)") {
    import spark.implicits._
    // instrument the annotate subtree with a row accumulator: both the
    // A1 count and the attach join must be fed from one persisted pass,
    // so each sentence row flows through exactly once (the pre-fuse
    // shape ran the NER stage twice -> 2x the count)
    val acc = spark.sparkContext.longAccumulator("annotate-rows")
    val instrumented = annotated.map { s => acc.add(1); s }
    val nSentences = annotated.count()
    acc.reset()
    val (attached, unpersist) = Linking.attachToMentionsWithHandle(
      instrumented, Linking.dictDs(spark, ChemDict.entries))
    try {
      attached.collect()
      assert(acc.value == nSentences,
        s"annotate subtree ran ${acc.value.toDouble / nSentences}x (expected 1x)")
    } finally unpersist()
  }

  test("salted join produces identical rows to broadcast join") {
    val a = Linking.linkTriples(triples, annotated, ChemDict.entries)
    val b = Linking.linkTriplesSalted(triples, annotated, ChemDict.entries, nSalts = 4)
    assert(a.columns.sorted.sameElements(b.columns.sorted))
    val cols = a.columns.sorted.toSeq
    val ka = a.select(cols.map(col): _*).collect().map(_.toString).sorted
    val kb = b.select(cols.map(col): _*).collect().map(_.toString).sorted
    assert(ka.sameElements(kb))
  }

  test("fused single-pass path produces identical rows to the two-pass path") {
    val a = Linking.linkTriples(triples, annotated, ChemDict.entries)
    val b = Linking.linkTriplesFused(annotated, ChemDict.entries)
    assert(a.columns.sorted.sameElements(b.columns.sorted))
    val cols = a.columns.sorted.toSeq
    val ka = a.select(cols.map(col): _*).collect().map(_.toString).sorted
    val kb = b.select(cols.map(col): _*).collect().map(_.toString).sorted
    assert(ka.sameElements(kb))
  }

  test("salted path contains NO broadcast even with auto-broadcast disabled (large-dict honesty)") {
    // the stated guarantee: this path works when the dictionary cannot
    // broadcast at all. Force Catalyst to never pick broadcast on its
    // own; any BroadcastExchange left in the plan is ours — there must
    // be none — and the rows must still match the broadcast path.
    val conf = spark.conf
    val saved = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = Linking.linkTriples(triples, annotated, ChemDict.entries)
      val b = Linking.linkTriplesSalted(triples, annotated, ChemDict.entries, nSalts = 4)
      b.collect() // finalize adaptive plan
      val plan = b.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastExchange") && !plan.contains("BroadcastHashJoin"),
        s"salted path must not broadcast:\n$plan")
      assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
        s"expected shuffled joins:\n$plan")
      val cols = a.columns.sorted.toSeq
      val ka = a.select(cols.map(col): _*).collect().map(_.toString).sorted
      val kb = b.select(cols.map(col): _*).collect().map(_.toString).sorted
      assert(ka.sameElements(kb))
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("salted-fused path: identical rows, no broadcast under auto-broadcast disabled") {
    val conf = spark.conf
    val saved = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = Linking.linkTriples(triples, annotated, ChemDict.entries)
      val (b, unpersist) = Linking.linkTriplesSaltedFusedWithHandle(
        annotated, ChemDict.entries, nSalts = 4)
      try {
        b.collect() // finalize adaptive plan
        val plan = b.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastExchange") && !plan.contains("BroadcastHashJoin"),
          s"salted-fused path must not broadcast:\n$plan")
        val cols = a.columns.sorted.toSeq
        val ka = a.select(cols.map(col): _*).collect().map(_.toString).sorted
        val kb = b.select(cols.map(col): _*).collect().map(_.toString).sorted
        assert(ka.sameElements(kb))
      } finally unpersist()
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("targeted salting: identical rows; the ONLY broadcast is the bounded heavy list") {
    import spark.implicits._
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
    def broadcasts(p: SparkPlan): Seq[BroadcastExchangeLike] = p match {
      case a: AdaptiveSparkPlanExec => broadcasts(a.executedPlan)
      case q: QueryStageExec => broadcasts(q.plan)
      case e: BroadcastExchangeLike => e +: p.children.flatMap(broadcasts)
      case _ => p.children.flatMap(broadcasts)
    }
    // threshold at the median eligible occurrence count: both the
    // explode-all-salts branch and the single-salt branch are live
    val occs = Linking.mentionCounts(annotated).filter(col("occurrences") >= 3)
      .select("occurrences").as[Long].collect().sorted
    val thr = occs(occs.length / 2)
    assert(occs.exists(_ >= thr) && occs.exists(_ < thr), "fixture must split")
    val conf = spark.conf
    val saved = conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val a = Linking.linkTriples(triples, annotated, ChemDict.entries)
      // at a splitting threshold, at MaxValue (nothing heavy — everything
      // salt 0) and at 0 (everything heavy — degenerates to full salting):
      // rows must be identical in every regime
      for (t <- Seq(thr, Long.MaxValue, 0L)) {
        val (b, unpersist) = Linking.linkTriplesSaltedTargetedWithHandle(
          annotated, ChemDict.entries, nSalts = 4, heavyThreshold = t)
        try {
          b.collect() // finalize adaptive plan
          val bx = broadcasts(b.queryExecution.executedPlan)
          // any broadcast in the plan must be the heavy-mention list —
          // one string column, never dict payload. (With an EMPTY heavy
          // set AQE's empty-relation propagation removes the join and
          // its broadcast altogether, so only require presence when
          // something is heavy.)
          if (t != Long.MaxValue) assert(bx.nonEmpty, "heavy list should broadcast")
          bx.foreach { e =>
            assert(e.child.output.map(_.name) == Seq("heavy_mention"),
              s"only the heavy list may broadcast, saw: ${e.child.output.map(_.name)}")
          }
          val cols = a.columns.sorted.toSeq
          val ka = a.select(cols.map(col): _*).collect().map(_.toString).sorted
          val kb = b.select(cols.map(col): _*).collect().map(_.toString).sorted
          assert(ka.sameElements(kb), s"row mismatch at heavyThreshold=$t")
        } finally unpersist()
      }
    } finally conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("broadcast path plans a BroadcastHashJoin with no shuffle on the probe side") {
    val linked = Linking.linkTriples(triples, annotated, ChemDict.entries)
    val plan = linked.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$plan")
  }
}
