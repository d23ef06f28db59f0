package graft

import graft.operators.Canonicalize
import graft.sources.ChemDict
import org.scalatest.funsuite.AnyFunSuite

/** J5: min-hash blocking + connected-components vs the dictionary's
  * gold clusters (FIXTURES.md §2).
  */
class CanonicalizeSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  test("entity table merges gold near-duplicate families exactly") {
    import spark.implicits._
    val table = Canonicalize.entityTable(spark, ChemDict.entries).collect()
    assert(table.length == ChemDict.entries.length)
    val engine: Map[Long, Long] = table.map(e => e.cid -> e.clusterId).toMap

    // same gold cluster -> same engine cluster (completeness)
    val byGold = ChemDict.goldClusters.groupBy(_._2).values
    byGold.foreach { members =>
      val engineClusters = members.keys.map(engine).toSet
      assert(engineClusters.size == 1,
        s"gold cluster ${members.keys.toSeq.sorted} split into $engineClusters")
    }
    // different gold cluster -> different engine cluster (soundness)
    val engineByCluster = engine.groupBy(_._2).values
    engineByCluster.foreach { members =>
      val goldIds = members.keys.map(ChemDict.goldClusters).toSet
      assert(goldIds.size == 1,
        s"engine merged across gold clusters: ${members.keys.toSeq.sorted} -> $goldIds")
    }
  }

  test("CC converges on a high-diameter path graph (diameter 120 >> old 20-iteration cap)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 0-1-2-...-120 chained synonyms plus a second component 200-...-230:
    // min-label propagation alone needs ~diameter iterations; the
    // pointer-jumping loop must converge in O(log d) and must NOT
    // silently truncate
    val n = 121
    val nodes = ((0 until n) ++ (200 until 231)).map(_.toLong).toDF("cid")
    val pairs = ((0 until n - 1).map(i => (i.toLong, (i + 1).toLong)) ++
      (200 until 230).map(i => (i.toLong, (i + 1).toLong)))
      .toDF("cid_a", "cid_b")
    // threshold 0 pins the DISTRIBUTED loop (this test exists to prove
    // the pointer-jumping loop converges on high diameter; the default
    // threshold would take the driver union-find on a graph this small)
    val labels = Canonicalize.connectedComponents(nodes, pairs,
      driverEdgeThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    (0 until n).foreach(i => assert(labels(i.toLong) == 0L, s"node $i"))
    (200 until 231).foreach(i => assert(labels(i.toLong) == 200L, s"node $i"))
    // the driver path must agree exactly on the same graph
    val viaDriver = Canonicalize.connectedComponents(nodes, pairs)
      .as[(Long, Long)].collect().toMap
    assert(viaDriver == labels)
  }

  test("CC fails LOUDLY when forced to stop before convergence (no silent truncation)") {
    import spark.implicits._
    val nodes = (0L until 40L).toDF("cid")
    val pairs = (0 until 39).map(i => (i.toLong, (i + 1).toLong)).toDF("cid_a", "cid_b")
    val e = intercept[IllegalArgumentException] {
      Canonicalize.connectedComponents(nodes, pairs, maxIter = 2,
        driverEdgeThreshold = 0L).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("CC converges and is idempotent (labels = min cid of component)") {
    val t1 = Canonicalize.entityTable(spark, ChemDict.entries)
      .collect().map(e => (e.cid, e.clusterId)).sortBy(_._1)
    val t2 = Canonicalize.entityTable(spark, ChemDict.entries)
      .collect().map(e => (e.cid, e.clusterId)).sortBy(_._1)
    assert(t1.sameElements(t2))
    // cluster id is the min cid of its members
    t1.groupBy(_._2).foreach { case (cluster, members) =>
      assert(cluster == members.map(_._1).min)
    }
  }
}
