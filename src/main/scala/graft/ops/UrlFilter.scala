package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL blocklist gate — the standard crawl-curation step between
  * canonicalization and dedup (UT1/Blacklists-UT-Capitole shape, the list
  * CCNet/RefinedWeb-style pipelines apply): drop every page whose
  * canonical host is on a HOST blocklist or whose canonical URL starts
  * with a PREFIX rule ("block this subtree, keep the rest of the host").
  *
  * Rules table: (`rule`, `kind`) with kind ∈ {"host", "prefix"}.
  *  - host rules match the CANONICAL host exactly (rules are lowercased
  *    here; a host never carries case);
  *  - prefix rules match `startsWith` against the CANONICAL url and must
  *    themselves be written in canonical form (run raw lists through
  *    [[UrlOps.canonicalize]] at ingest) — a prefix covers
  *    `scheme://host...`, so a prefix hit is host-exact by construction.
  *
  * 100-TB shape (the [[Dedup.incrementalNew]] sketch-then-verify
  * discipline): one NATIVE Bloom filter over every rule's host hash is
  * built blocklist-side and shipped as a literal; corpus rows the filter
  * rejects are DEFINITELY unblocked (Bloom has no false negatives) and
  * never shuffle at all — the common case, since blocklist hit rates are
  * a few percent of a crawl. Only `might_contain` candidates join the
  * rules, keyed by the 8-BYTE host hash (rule sides are pre-grouped per
  * hash, so the join never duplicates rows and collisions are verified
  * exactly by string compare / startsWith after the join). Blocklist-side
  * work (count, bloom build, per-hash grouping) is rules-scale, not
  * corpus-scale.
  */
object UrlFilter {

  /** Gate `docs` through the blocklist: returns the KEPT rows with the
    * input's exact columns. An empty blocklist keeps everything. */
  def blocklistFilter(docs: DataFrame, rules: DataFrame,
      urlCol: String = "url", ruleCol: String = "rule",
      kindCol: String = "kind", bitsPerItem: Int = 10): DataFrame = {
    val spark = docs.sparkSession
    graft.functions.functions.register(spark)
    val outCols = docs.columns.toSeq.map(col)

    // blocklist-scale prep (consumed by the bloom build AND the verify
    // joins — checkpoint so the filter/distinct runs once)
    val hostRules = rules.filter(col(kindCol) === "host")
      .select(lower(trim(col(ruleCol))).as("rhost")).distinct()
      .transform(CheckpointScratch.ckpt)
    val prefRules = rules.filter(col(kindCol) === "prefix")
      .select(col(ruleCol).as("rprefix")).distinct()
      // a malformed (host-less) prefix rule hashes as '' — it routes the
      // (rare) host-less docs to the verify join, where startsWith still
      // decides exactly
      .withColumn("rhost", coalesce(UrlOps.host(col("rprefix")), lit("")))
      .transform(CheckpointScratch.ckpt)

    // ONE bloom over both kinds' rule hosts. The count + head() actions
    // are eager but blocklist-scale (the incrementalNew precedent).
    val ruleHosts = hostRules.select(col("rhost"))
      .unionByName(prefRules.select(col("rhost")))
    val nRules = ruleHosts.count()
    if (nRules == 0) { // empty blocklist — nothing can block
      CheckpointScratch.drop(hostRules); CheckpointScratch.drop(prefRules)
      return docs
    }
    val bloomRow = ruleHosts.select(graft.functions.functions.graft_bloom_agg(
      xxhash64(col("rhost")), lit(nRules),
      lit(math.max(64L, nRules * bitsPerItem))).as("bf")).head()
    val bloom = bloomRow.getAs[Array[Byte]]("bf")

    // corpus side: canonical url + host, tagged ONCE with the bloom
    // verdict and checkpointed — the two branches below must partition
    // one evaluation of a possibly nondeterministic upstream, and the
    // candidate branch must not re-run the source (review r4-3 pattern)
    // COALESCE the null url / null host: xxhash64(null) is null and
    // might_contain propagates it, which would silently drop the row
    // from BOTH branches (the incrementalNew null-text lesson). A null
    // url has no host, so it can only be blocked if '' is a rule host.
    val tagged = docs
      .withColumn("_curl", coalesce(UrlOps.canonicalize(col(urlCol)), lit("")))
      .withColumn("_h", coalesce(UrlOps.host(col("_curl")), lit("")))
      .withColumn("_hh", xxhash64(col("_h")))
      .withColumn("_cand", graft.functions.functions.graft_might_contain(
        lit(bloom), col("_hh")))
      .transform(CheckpointScratch.ckpt)

    // rule sides grouped per host HASH: join keys are 8 bytes, one row
    // per hash (no fan-out), exact verify happens on the carried strings
    val hostSets = hostRules.groupBy(xxhash64(col("rhost")).as("_hh"))
      .agg(collect_list(col("rhost")).as("_rh"))
    val prefSets = prefRules.groupBy(xxhash64(col("rhost")).as("_hh"))
      .agg(collect_list(col("rprefix")).as("_ps"))

    val pass = tagged.filter(!col("_cand"))
    val kept = tagged.filter(col("_cand"))
      .join(hostSets, Seq("_hh"), "left")
      .join(prefSets, Seq("_hh"), "left")
      .filter(
        (col("_rh").isNull || !array_contains(col("_rh"), col("_h"))) &&
        (col("_ps").isNull ||
          !exists(col("_ps"), p => col("_curl").startsWith(p))))
    pass.select(outCols: _*).unionByName(kept.select(outCols: _*))
  }
}
