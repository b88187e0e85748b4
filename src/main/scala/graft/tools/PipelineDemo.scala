package graft.tools

import graft.functions.TextFunctions
import graft.operators.{CacheScope, Dedup, Sampling, Sharding}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Runnable end-to-end training-data pipeline: the full funnel a corpus goes
  * through before pre-training, composed from the library's operators —
  *
  *   quality filter → exact dedup → near-dup clusters → keep-best-per-
  *   cluster → mixture balancing → context-window chunking → token-budget
  *   shard packing → per-language top-k exemplars → label centroids
  *
  * Every stage is the oracle-verified operator behind one of the registered
  * queries (q56, q30, q31/q42, q59, q54, q57, q48, q70, q74); this main
  * strings them together over `documents.parquet`/`embeddings.parquet` and
  * prints the funnel counts — the "what the engine is FOR" twin of
  * [[CdcDemo]].
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val scope = new CacheScope

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    println(f"corpus:          ${docs.count()}%6d docs")

    // 1. quality filter (q56's length + repetition rules; the lang-
    //    consistency check is left out here so the mixture stage below has
    //    several strata to balance at demo scale)
    val stops = TextFunctions.langMarkers.head._2
    val quality = docs.filter(
      TextFunctions.tokenCount(col("text")).between(30, 90) &&
        TextFunctions.dupTokenFraction(col("text")) <= 0.65)
    println(f"quality-kept:    ${quality.count()}%6d docs")

    // 2. exact dedup (q30): keep the minimum id per content digest
    val keepers = Dedup.exactGroups(quality, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val exact = quality.join(keepers, "doc_id")
    println(f"exact-deduped:   ${exact.count()}%6d docs")

    // 3. near-dedup (q31 → q42 → q59): pair → cluster → keep best quality
    val pairs = Dedup.minhashPairs(exact, "doc_id", "text", scope = scope)
      .select("id_a", "id_b")
    val clusters = Dedup.connectedComponents(pairs)
    val qual = exact.select(col("doc_id"),
      TextFunctions.qualityScore(col("text"), stops).as("q"))
    val bestPerCluster = clusters.join(qual, "doc_id")
      .withColumn("rn", row_number().over(Window.partitionBy("cluster_id")
        .orderBy(col("q").desc, col("doc_id").desc)))
      .filter(col("rn") === 1).select("doc_id")
    val clustered = clusters.select("doc_id")
    val nearDeduped = exact
      .join(clustered, Seq("doc_id"), "left_anti") // docs in no cluster
      .unionByName(exact.join(bestPerCluster, "doc_id")) // + one best per cluster
    println(f"near-deduped:    ${nearDeduped.count()}%6d docs")

    // 4. mixture balancing (q54): every language down to the smallest
    // stratum. Persisted under the scope: four downstream consumers (count,
    // per-lang breakdown, chunking, exemplars) would otherwise re-run the
    // whole quality→dedup chain each.
    val balanced = Sampling.balanceStrata(nearDeduped, "doc_id", "lang")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(f"balanced mix:    ${balanced.count()}%6d docs")
    balanced.groupBy("lang").count().orderBy("lang").collect()
      .foreach(r => println(f"   ${r.getString(0)}%-4s ${r.getLong(1)}%5d"))

    // 5. chunk to the context window (q57): 64-token windows, 16 overlap
    val toks = TextFunctions.tokens(col("text"))
    val extra = floor((greatest(size(toks) - 64, lit(0)) + lit(47)) / lit(48)).cast("int")
    val chunks = balanced
      .select(col("doc_id"), toks.as("toks"), extra.as("extra"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), posexplode(transform(sequence(lit(0), col("extra")),
        i => array_join(slice(col("toks"), i * 48 + 1, lit(64)), " "))))
      .select(col("doc_id"), col("pos").as("chunk_idx"), col("col").as("chunk_text"))
    println(f"chunks:          ${chunks.count()}%6d windows")

    // 6. pack into 4000-token shards (q48): distributed prefix sum
    val weighted = chunks.select(
      (col("doc_id") * 1000 + col("chunk_idx")).as("chunk_id"),
      TextFunctions.bpeTokenEstimate(col("chunk_text")).as("w"))
    val sharded = Sharding.packByBudget(weighted, "chunk_id", "w",
      budget = 4000L, scope = scope)
    val shardStats = sharded.groupBy("shard").agg(sum("w").as("tokens"))
      .agg(count(lit(1)).as("n_shards"), max("tokens").as("max_tokens")).head()
    // max over zero shards is NULL — a corpus that empties the funnel must
    // print "0 shards", not NPE
    val maxTok = if (shardStats.isNullAt(1)) 0L else shardStats.getLong(1)
    println(f"shards:          ${shardStats.getLong(0)}%6d shards " +
      f"(max $maxTok tokens vs 4000 budget + largest chunk)")

    // 7. per-language exemplars (q70): longest surviving doc per lang via
    //    the bounded top-k aggregator (no per-group sort)
    val topk = udaf(new graft.functions.TopKAggregator(1),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[graft.functions.ScoredId]())
    val exemplars = balanced.groupBy(col("lang"))
      .agg(topk(col("doc_id"), col("n_chars").cast("double")).as("top"))
      .select(col("lang"), element_at(col("top"), 1).getField("id").as("doc_id"))
      .orderBy("lang").collect()
    println("exemplars:       " + exemplars.map(r =>
      s"${r.getString(0)}=#${r.getLong(1)}").mkString(" "))

    // 8. label centroids over the embedding table (q74): one representative
    //    vector per label, partial sums only across the shuffle
    val centroids = graft.operators.Similarity.groupCentroids(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), "label", "embedding")
    val cStats = centroids.select(col("label"), size(col("centroid")).as("d")).collect()
    val dim = cStats.headOption.map(_.getInt(1)).getOrElse(0)
    println(f"centroids:       ${cStats.length}%6d labels × dim $dim")

    scope.release()
    spark.stop()
  }
}
