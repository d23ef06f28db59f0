package graft.sources

import graft.model.ChemDictEntry

/** Synthesized PubChem-style dictionary (FIXTURES.md §2) — the build
  * side of the entity-linking join and the gazetteer source for chem
  * NER. Reference semantics it stands in for: PubChem name/synonym →
  * CID + properties (cprex/pubchem/linker.py:29-53).
  *
  * Fully deterministic — literal tables plus hash-derived property
  * fields. Head entities (water, NaCl, benzene) are referenced by a
  * large fraction of generated pages to exercise skew salting (J1).
  * `goldClusters` marks groups of *distinct* cids whose names are
  * near-duplicates: the canonicalization stage (J5) must merge them —
  * that mapping is the gold standard for the connected-components test.
  */
object ChemDict {

  private def mkEntry(cid: Long, canonical: String, syns: Seq[String]): ChemDictEntry = {
    val h = scala.util.hashing.MurmurHash3.stringHash(canonical).toLong & 0x7fffffffL
    val formula = s"C${1 + (h % 20)}H${1 + ((h / 20) % 30)}N${(h / 600) % 8}O${(h / 4800) % 10}"
    val weight = 50.0 + (h % 4000) / 10.0
    val smiles = "C" * (1 + (h % 12)).toInt + (if (h % 2 == 0) "O" else "N")
    ChemDictEntry(cid, canonical, (canonical +: syns).toArray, formula, weight, smiles,
      iupacName = canonical)
  }

  /** Hand-written head + domain entries. Water/NaCl/benzene are the
    * skew heads; "high density polyethylene" and "compound 95" are the
    * W2 overlap traps (chem tokens shadow a PROP word / a bare number).
    */
  private val baseEntries: Array[ChemDictEntry] = Array(
    mkEntry(1, "water", Seq("H2O", "dihydrogen monoxide")),
    mkEntry(2, "sodium chloride", Seq("NaCl", "table salt", "halite")),
    mkEntry(3, "benzene", Seq("C6H6", "benzol")),
    mkEntry(10, "2,4,6-trinitrotoluene", Seq("TNT", "trinitrotoluene", "2,4,6-TNT")),
    mkEntry(11, "1,3,5-trinitro-1,3,5-triazinane", Seq("RDX", "hexogen", "cyclonite")),
    mkEntry(12, "octahydro-1,3,5,7-tetranitro-tetrazocine", Seq("HMX", "octogen")),
    mkEntry(13, "pentaerythritol tetranitrate", Seq("PETN")),
    mkEntry(14, "3-nitro-1,2,4-triazol-5-one", Seq("NTO")),
    mkEntry(15, "hexanitrohexaazaisowurtzitane", Seq("CL-20", "HNIW")),
    mkEntry(16, "triaminotrinitrobenzene", Seq("TATB")),
    mkEntry(17, "1,1-diamino-2,2-dinitroethene", Seq("FOX-7", "DADNE")),
    mkEntry(18, "nitroglycerin", Seq("NG", "glyceryl trinitrate")),
    mkEntry(19, "ammonium nitrate", Seq("AN")),
    mkEntry(20, "ammonium perchlorate", Seq("AP")),
    mkEntry(30, "ethanol", Seq("EtOH", "ethyl alcohol")),
    mkEntry(31, "methanol", Seq("MeOH", "methyl alcohol")),
    mkEntry(32, "acetone", Seq("propan-2-one")),
    mkEntry(33, "toluene", Seq("methylbenzene")),
    mkEntry(34, "glycerol", Seq("glycerine", "glycerin")),
    mkEntry(35, "sulfuric acid", Seq("H2SO4", "oil of vitriol")),
    mkEntry(36, "high density polyethylene", Seq("HDPE")),
    mkEntry(37, "heavy water", Seq("D2O", "deuterium oxide")),
    mkEntry(38, "compound 95", Seq("cpd-95")),
    mkEntry(39, "sodium azide", Seq("NaN3")),
    mkEntry(40, "potassium nitrate", Seq("KNO3", "saltpeter"))
  )

  /** Word bank for synthetic near-duplicate families — bases are
    * pairwise dissimilar so min-hash blocking does not bridge families.
    */
  private val familyBases = Array(
    "arcanite selenate", "boracite nitramine", "celestine azide",
    "dravite oxalate", "euclase nitrate", "fayalite peroxide",
    "gahnite chlorate", "hessonite amide", "iolite borate",
    "jadeite sulfonate", "kyanite fulminate", "lazurite picrate",
    "monazite tetrazole", "nephrite furoxan", "olivine triazine",
    "prehnite styphnate", "quartzine nitride", "rhodonite oximate",
    "sodalite plumbate", "tanzanite silane"
  )

  /** Three dict rows per family (distinct cids, near-dup names) that the
    * canonicalization CC must merge, plus extra filler compounds.
    */
  private val familyEntries: Array[ChemDictEntry] = familyBases.zipWithIndex.flatMap {
    case (base, j) =>
      val cid0 = 100L + j * 3
      Array(
        mkEntry(cid0, base, Seq(s"${base.replace(' ', '-')}")),
        mkEntry(cid0 + 1, base.split(' ').mkString("-"), Seq(s"$base salt")),
        mkEntry(cid0 + 2, s"$base hydrate", Seq(s"${base.split(' ').head} hydrate"))
      )
  }

  // filler compounds: pairwise-dissimilar names (single-char suffix
  // variants like "synthate-1"/"synthate-2" would be true near-dups at
  // Jaccard 0.6 and legitimately chain-merge in CC)
  private val fillerPrefixes = Array("brav", "czel", "dusk", "fyng", "gwol",
    "hirm", "jexo", "kupr", "lomb", "mycs", "nerv", "pold")
  private val fillerSuffixes = Array("adine", "olite", "exane", "urate", "imine")
  private val fillerEntries: Array[ChemDictEntry] = (0 until 60).map { k =>
    val name = fillerPrefixes(k % 12) + fillerSuffixes(k / 12)
    mkEntry(300L + k, name, Seq(s"SYN-$k", name.capitalize))
  }.toArray

  val entries: Array[ChemDictEntry] = baseEntries ++ familyEntries ++ fillerEntries

  /** Gold canonicalization clusters: family cids (3 per family) map to
    * one cluster; everything else is its own cluster keyed by cid.
    */
  val goldClusters: Map[Long, Long] = entries.map { e =>
    val cid = e.cid
    val cluster = if (cid >= 100 && cid < 100 + familyBases.length * 3)
      100L + ((cid - 100) / 3) * 3
    else cid
    cid -> cluster
  }.toMap

  /** name (lowercased) -> cid, all synonyms included — the reference's
    * `_synonyms` map (linker.py:49-53). Deterministic first-wins on the
    * (rare) duplicate surface.
    */
  val nameToCid: Map[String, Long] = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    entries.foreach(e => e.synonyms.foreach { s =>
      val k = s.toLowerCase
      if (!m.contains(k)) m(k) = e.cid
    })
    m.toMap
  }

  val byCid: Map[Long, ChemDictEntry] = entries.map(e => e.cid -> e).toMap
}
