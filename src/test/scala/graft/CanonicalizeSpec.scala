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
