package graft.operators

import graft.functions.Normalize
import graft.model.{ChemDictEntry, Sentence, Triple}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** J1/J2 + A1: PubChem-style entity linking as Spark joins.
  *
  * Reference semantics (cprex/pubchem/linker.py:138-163):
  *  - A1: count chem-mention surface occurrences (exact text, Counter);
  *    only compounds with count >= min_occurences (3) are linked;
  *  - J1: surface → CID via the synonym map keyed by compound.lower()
  *    (linker.py:39,52) — here `chem_norm` (F6, a stricter deterministic
  *    canonicalization per the north star);
  *  - J2: back-attach linked properties to every mention row.
  *
  * Scale design (the part the reference cannot express):
  *  - default path: `broadcast(dict)` hash join — zero shuffle on the
  *    10^12-row probe side; A1 is the only shuffle (partial agg first);
  *  - `salted` path for when the dictionary exceeds broadcast budget at
  *    real scale: explicit salt column on the probe side
  *    (pmod(hash(url), nSalts)) with the dict side exploded ×nSalts, so
  *    head entities ("water": ~15% of all mentions in the fixture
  *    workload) spread over nSalts reducers instead of one. AQE skew
  *    join stays enabled as the backstop (spark.sql.adaptive.*).
  */
object Linking {

  val MinOccurrences = 3 // linker.py:138

  val chemNormUdf = udf((s: String) => Normalize.chemNorm(s))

  /** A1: chem mention counts over annotated sentences (exact surface,
    * like the reference's Counter over ent.text).
    */
  def mentionCounts(annotated: Dataset[Sentence]): DataFrame = {
    val spark = annotated.sparkSession
    import spark.implicits._
    annotated
      .flatMap(s => s.ents.filter(_.label == "CHEM").map(_.text))
      .toDF("mention")
      .groupBy("mention").agg(count(lit(1)).as("occurrences"))
  }

  /** Dictionary rows flattened to (nameNorm, cid) — the join build side. */
  def dictNames(spark: SparkSession, dict: Array[ChemDictEntry]): DataFrame = {
    import spark.implicits._
    dict.flatMap(e => e.synonyms.map(s => (Normalize.chemNorm(s), e.cid)))
      .distinct.toSeq.toDF("name_norm", "cid")
      .groupBy("name_norm").agg(min("cid").as("cid")) // first-wins like linker memoization
  }

  def dictProps(spark: SparkSession, dict: Array[ChemDictEntry]): DataFrame = {
    import spark.implicits._
    dict.map(e => (e.cid, e.canonicalName, e.molecularFormula, e.molecularWeight,
      e.canonicalSmiles, e.iupacName))
      .toSeq.toDF("cid", "canonical_name", "molecular_formula", "molecular_weight",
        "canonical_smiles", "iupac_name")
  }

  /** J1+J2 broadcast path: triples ⟕ dict on normalized head text, with
    * the A1 count>=3 gate applied to CHEM heads (non-CHEM heads pass
    * through unlinked, as in the reference where only CHEM ents carry
    * props).
    */
  def linkTriples(
      triples: Dataset[Triple],
      annotated: Dataset[Sentence],
      dict: Array[ChemDictEntry],
      minOccurrences: Int = MinOccurrences
  ): DataFrame = {
    val spark = triples.sparkSession
    val counts = mentionCounts(annotated)
      .filter(col("occurrences") >= minOccurrences)
      .withColumn("name_norm", chemNormUdf(col("mention")))
      .select("name_norm").distinct()
    val linkable = dictNames(spark, dict)
      .join(counts, Seq("name_norm"), "left_semi") // A1 gate applied on the SMALL side
    val linked = linkable.join(broadcast(dictProps(spark, dict)), Seq("cid"))
    triples.toDF()
      .withColumn("head_norm",
        when(col("headLabel") === "CHEM", chemNormUdf(col("headText"))))
      .join(broadcast(linked), col("head_norm") === linked("name_norm"), "left_outer")
      .drop("name_norm", "head_norm")
  }

  /** The non-broadcast path for dictionaries too large to broadcast:
    * explicit salting of the skewed probe side. Produces identical rows
    * to `linkTriples` (asserted by LinkingSpec).
    */
  def linkTriplesSalted(
      triples: Dataset[Triple],
      annotated: Dataset[Sentence],
      dict: Array[ChemDictEntry],
      nSalts: Int = 8,
      minOccurrences: Int = MinOccurrences
  ): DataFrame = {
    val spark = triples.sparkSession
    val counts = mentionCounts(annotated)
      .filter(col("occurrences") >= minOccurrences)
      .withColumn("name_norm", chemNormUdf(col("mention")))
      .select("name_norm").distinct()
    val linkable = dictNames(spark, dict)
      .join(counts, Seq("name_norm"), "left_semi")
      .join(dictProps(spark, dict), Seq("cid"))
    // dict side exploded ×nSalts
    val saltedDict = linkable
      .withColumn("salt", explode(lit((0 until nSalts).toArray)))
    // probe side: deterministic salt from url hash spreads head entities
    val probe = triples.toDF()
      .withColumn("head_norm",
        when(col("headLabel") === "CHEM", chemNormUdf(col("headText"))))
      .withColumn("salt", pmod(hash(col("url")), lit(nSalts)))
    probe
      .hint("shuffle_hash")
      .join(saltedDict,
        probe("head_norm") === saltedDict("name_norm") && probe("salt") === saltedDict("salt"),
        "left_outer")
      .drop("name_norm", "head_norm", "salt")
  }
}
