package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark
  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("exact dedup: groups partition the table; survivors unique by text") {
    val groups = Dedup.exactGroups(docs)
    val total = groups.agg(sum("n_dups")).collect()(0).getLong(0)
    assert(total == docs.count())
    val survivors = Dedup.exactSurvivors(docs)
    assert(survivors.count() == groups.count())
    assert(survivors.select(md5(col("text"))).distinct().count() == survivors.count())
  }

  test("minhash pairs: symmetric-free, verified above threshold") {
    import spark.implicits._
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5).cache()
    val rows = pairs.as[(Long, Long)].collect()
    assert(rows.forall { case (a, b) => a < b })
    // spot-verify: every emitted pair really clears the Jaccard threshold
    val texts = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toMap
    rows.take(50).foreach { case (a, b) =>
      assert(Dedup.ngramJaccard(texts(a), texts(b)) >= 0.5)
    }
    // exact duplicates (if any) must be found by minhash too
    val exactDupPairs = docs.as[(Long, String, String, String, Long)]
      .collect().groupBy(_._2).values.filter(_.length > 1)
      .flatMap(g => g.map(_._1).sorted.combinations(2).map(p => (p(0), p(1))))
      .toSet
    val found = rows.toSet
    assert(exactDupPairs.subsetOf(found),
      s"exact dups missed by minhash: ${(exactDupPairs -- found).take(3)}")
  }

  test("minhash clusters: cluster id is min member; exact dups co-clustered") {
    import spark.implicits._
    val clusters = Dedup.minhashClusters(docs, threshold = 0.5)
      .as[(Long, Long)].collect().toMap
    assert(clusters.size == docs.count())
    clusters.groupBy(_._2).foreach { case (c, members) =>
      assert(c == members.keys.min)
    }
  }

  test("simhash: identical text -> distance 0; pairs verified") {
    assert(Dedup.hamming64(Dedup.simhash64("the same text"), Dedup.simhash64("the same text")) == 0)
    val d = Dedup.hamming64(
      Dedup.simhash64("the quick brown fox jumps over the lazy dog in the yard today"),
      Dedup.simhash64("the quick brown fox jumps over the lazy dog in the yard tonight"))
    assert(d <= 16, s"one-word edit moved simhash by $d bits")
    import spark.implicits._
    val pairs = Dedup.simhashPairs(docs, maxHamming = 3).as[(Long, Long)].collect()
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("planted embedding duplicates are found exactly (evidence-bearing driver query)") {
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val planted = emb.filter(col("vec_id") % 50 === 0)
      .withColumn("vec_id", col("vec_id") + lit(1000000L))
    val found = Dedup.embeddingPairs(emb.unionByName(planted), threshold = 0.95)
      .as[(Long, Long)].collect().toSet
    val expected = emb.filter(col("vec_id") % 50 === 0)
      .select(col("vec_id")).as[Long].collect()
      .map(id => (id, id + 1000000L)).toSet
    assert(expected.nonEmpty)
    assert(found == expected,
      s"missing=${(expected -- found).take(3)} spurious=${(found -- expected).take(3)}")
  }

  test("embedding near-dup pairs verified by exact cosine") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val pairs = Dedup.embeddingPairs(emb, threshold = 0.99)
    // verify a sample against a direct cosine computation
    import spark.implicits._
    val sample = pairs.limit(20).as[(Long, Long)].collect()
    if (sample.nonEmpty) {
      val vecs = emb.select(col("vec_id"), col("embedding"))
        .as[(Long, Array[Float])].collect().toMap
      sample.foreach { case (a, b) =>
        val (va, vb) = (vecs(a), vecs(b))
        val dot = va.zip(vb).map { case (x, y) => x.toDouble * y }.sum
        val cos = dot / (math.sqrt(va.map(x => x.toDouble * x).sum) *
          math.sqrt(vb.map(x => x.toDouble * x).sum))
        assert(cos >= 0.99 - 1e-9)
      }
    }
  }
}
