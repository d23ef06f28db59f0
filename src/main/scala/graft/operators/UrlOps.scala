package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL normalization and domain-level corpus operations — the stage a
  * Common-Crawl-scale pipeline runs before anything else touches the
  * pages: canonicalize the URL (so re-crawls and tracking-param
  * variants of one page share a key), derive the registered domain
  * (the unit of blocklists and per-site quality policy), keep the
  * latest crawl per canonical URL, and aggregate per-domain corpus
  * stats.
  *
  * Everything except the final dedup/stats aggregations is a single
  * projection of regexp/array Column expressions — no UDF, no shuffle,
  * whole-stage-codegen. The regexes stay in the Java-regex/RE2-common
  * subset (no lookarounds/backreferences), so the DuckDB oracle
  * replays the entire normalization character-exactly.
  *
  * Normalization steps (in order):
  *   1. strip the fragment (`#…` never reaches the server);
  *   2. lowercase scheme and authority (they are case-insensitive;
  *      the path is NOT lowercased — it is case-sensitive);
  *   3. drop the default port (`:80` for http, `:443` for https;
  *      any other explicit port is kept);
  *   4. strip one leading `www.` label;
  *   5. collapse duplicate slashes in the path, strip trailing
  *      slashes, empty path → `/`;
  *   6. drop tracking query params (`utm_*`, `fbclid`, `gclid`,
  *      `msclkid`, `ref`), sort the survivors bytewise, rejoin.
  *
  * At 10^12 rows: the normalization adds zero exchanges to whatever
  * plan consumes it; [[latestPerUrl]] is one hash aggregation keyed on
  * the canonical URL (partial agg map-side, no window/sort);
  * [[domainStats]] is a per-domain aggregate whose key cardinality is
  * domains (~10^7), far below rows, so the final exchange is tiny.
  */
object UrlOps {

  /** Params stripped during normalization (anchored key=value match). */
  val TrackingParamRe = "^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref)="

  /** Second-level labels that combine with a 2-char ccTLD into a
    * multi-part public suffix (deterministic heuristic subset of the
    * public-suffix list — a production deployment would broadcast the
    * full PSL as a map expression; the heuristic keeps the operator
    * oracle-replayable without shipping the list).
    */
  val MultiPartSld = Seq("co", "com", "org", "net", "ac", "gov", "edu")

  /** Adds `host`, `registered_domain`, and `url_norm` columns derived
    * from `urlCol`. One projection — no shuffle, no UDF.
    */
  def withUrlParts(df: DataFrame, urlCol: String = "url_raw"): DataFrame = {
    val u = col(urlCol)
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val rawPath = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    val qs = regexp_extract(noFrag, "\\?(.*)$", 1)
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val host = regexp_replace(regexp_replace(auth, ":[0-9]+$", ""), "^www\\.", "")
    val keepPort = port =!= "" &&
      !((scheme === "http" && port === "80") || (scheme === "https" && port === "443"))
    val path1 = regexp_replace(regexp_replace(rawPath, "/{2,}", "/"), "/+$", "")
    val pathN = when(path1 === "", lit("/")).otherwise(path1)
    val kept = filter(split(qs, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    val qn = array_join(array_sort(kept), "&")
    val urlNorm = concat(
      scheme, lit("://"), host,
      when(keepPort, concat(lit(":"), port)).otherwise(lit("")),
      pathN,
      when(qn =!= "", concat(lit("?"), qn)).otherwise(lit("")))
    df.withColumn("host", host)
      .withColumn("registered_domain", registeredDomain(host))
      .withColumn("url_norm", urlNorm)
  }

  /** Registered domain (site + public suffix) from a lowercased host:
    * last two labels, or last three when the second-to-last label is a
    * known multi-part SLD in front of a 2-char ccTLD (`site.co.uk`).
    */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val tld = get(labels, n - 1)
    val sld = get(labels, n - 2)
    val multi = n >= lit(3) && sld.isin(MultiPartSld: _*) && length(tld) === 2
    when(multi, concat_ws(".", get(labels, n - 3), sld, tld))
      .otherwise(when(n >= lit(2), concat_ws(".", sld, tld)).otherwise(host))
  }

  /** Latest-crawl-wins per canonical URL: one row per `url_norm` with
    * the surviving version id (max of `versionCol` — a crawl timestamp
    * or monotone id) and how many raw versions collapsed into it.
    * Single hash aggregation; partial aggregation halves the exchange
    * on dup-heavy crawls.
    */
  def latestPerUrl(parts: DataFrame, versionCol: String = "doc_id"): DataFrame =
    parts.groupBy("url_norm")
      .agg(max(col(versionCol)).as("survivor_doc_id"),
        count(lit(1)).as("n_versions"))

  /** Per-registered-domain corpus stats: document count, distinct
    * canonical URLs, distinct hosts. Key cardinality = domains, so the
    * exchange is tiny next to the input.
    */
  def domainStats(parts: DataFrame): DataFrame =
    parts.groupBy("registered_domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("url_norm")).as("n_urls"),
        countDistinct(col("host")).as("n_hosts"))

  /** Documents whose registered domain is NOT on the blocklist.
    * Blocklists are tiny next to the corpus — broadcast anti-join,
    * the corpus side never shuffles.
    */
  def domainBlockFilter(parts: DataFrame, blocked: Seq[String]): DataFrame = {
    val spark = parts.sparkSession
    import spark.implicits._
    val bl = broadcast(blocked.toDF("registered_domain"))
    parts.join(bl, Seq("registered_domain"), "left_anti")
  }

  /** Default split recipe in PER-MILLE integers (exact thresholds — no
    * float weight ever touches the assignment).
    */
  val DefaultSplits: Seq[(String, Int)] =
    Seq("train" -> 800, "valid" -> 100, "test" -> 100)

  /** Per-mille bucket of a registered domain: Spark's built-in `hash`
    * (Murmur3-32, codegen) pmod 1000. Exposed so the driver can dump
    * the (domain, bucket) table as oracle parameters.
    */
  def domainBucket(domain: Column): Column =
    pmod(hash(domain), lit(1000))

  /** Leakage-free train/valid/test assignment: the SPLIT UNIT is the
    * registered domain, not the document. Near-duplicate pages and
    * shared boilerplate cluster within sites, so a row-level split
    * leaks train content into eval; assigning whole domains closes
    * that channel (standard web-corpus practice — the same reason
    * `Decontaminate` exists for cross-CORPUS leakage).
    *
    * The assignment is a pure per-row function — split =
    * threshold-lookup of `domainBucket(registered_domain)` against the
    * cumulative per-mille recipe — so it adds ZERO exchanges (no
    * domain table to build, broadcast, or join at 10^8-domain scale)
    * and is stable across crawls: a domain keeps its split forever, so
    * eval never rotates into train between corpus releases.
    *
    * Unparseable URLs (no extractable host ⇒ registered_domain '' or
    * NULL) all share ONE hash bucket, so letting them ride the
    * threshold lookup would dump the entire malformed-URL class into
    * whichever single split that constant bucket lands in — possibly
    * eval. They are assigned to the split NAMED "train" when the
    * recipe has one (falling back to the first split only for recipes
    * without a training split): their near-dup structure cannot be
    * grouped by domain, so eval purity demands they never reach a
    * held-out split — and that must hold regardless of the recipe's
    * ordering, not just for recipes that happen to list train first.
    */
  def domainSplit(parts: DataFrame,
      splits: Seq[(String, Int)] = DefaultSplits): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).forall(_ > 0) &&
      splits.map(_._2).sum == 1000,
      s"split recipe must be positive per-mille weights summing to 1000: $splits")
    val b = domainBucket(col("registered_domain"))
    val thresholds = splits.map(_._2).scanLeft(0)(_ + _).tail
    val assign = splits.zip(thresholds).init
      .foldRight(lit(splits.last._1)) { case (((name, _), cum), rest) =>
        when(b < cum, name).otherwise(rest)
      }
    val domainless = col("registered_domain").isNull ||
      col("registered_domain") === ""
    val fallback = splits.map(_._1).find(_ == "train").getOrElse(splits.head._1)
    parts.withColumn("split_bucket", b)
      .withColumn("split", when(domainless, lit(fallback)).otherwise(assign))
  }
}
