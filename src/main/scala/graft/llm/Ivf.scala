package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ml.Distance

/** IVF (inverted-file) approximate nearest-neighbor index — the
  * k-means-partitioned scale path alongside [[SimSearch.knnLsh]].
  *
  * Build: deterministic Lloyd iterations (seeds = first nlist vectors by
  * id — no RNG, reproducible) assign every vector to its nearest coarse
  * centroid; the "index" is just the dataset repartitioned by list id plus
  * a tiny centroid table. Search: rank coarse centroids per query, probe
  * the `nprobe` nearest lists, exact-rank inside the probed lists only —
  * candidate space |C|·nprobe/nlist instead of |C|.
  *
  * All stages are DataFrame plans: centroid update is a groupBy-avg over
  * (list, dim) after posexplode — one shuffle per Lloyd iteration; at
  * 100 TB the iteration input is a sample and only the final assign runs
  * over the full corpus.
  */
object Ivf {

  /** Deterministic k-means: returns (listId, centroid) table. The
    * centroid set is tiny (nlist × dim), so each Lloyd iteration
    * materializes it to the driver — this truncates the lineage (an
    * un-materialized loop re-executes every prior iteration per stage)
    * and is exactly what a 100 TB run does: iterate on a sample/driver,
    * broadcast the final centroids for the one full-corpus assign. */
  def fitCentroids(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int = 3): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.functions.VectorExprs.register(spark)
    val pts = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v")).cache()
    var centroids = pts.orderBy("id").limit(nlist)
      .select(row_number().over(Window.orderBy("id")).as("list_id"),
        col("v").as("c"))
      .withColumn("list_id", col("list_id") - 1)
    var i = 0
    while (i < iters) {
      val updated = assign(pts, centroids)
        .select(col("list_id"), posexplode(col("v")))
        .groupBy(col("list_id"), col("pos"))
        // decimal sum → mean: order-independent, so centroids are
        // bit-reproducible across partitionings (double avg() is not —
        // partial-aggregation order would leak into the last ulps and
        // Lloyd iterations would amplify the divergence). Cast to double
        // BEFORE the division (the repo's davg convention): exact decimal
        // sum, then one IEEE division — the same two steps DuckDB's
        // CAST(SUM(DECIMAL) AS DOUBLE)/COUNT performs, so the oracle
        // (q59) reproduces the centroids bit for bit
        .agg((sum(col("col").cast("decimal(28,14)")).cast("double") /
          count(lit(1))).as("m"))
        .groupBy(col("list_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .getField("m").as("c"))
        .collect() // nlist rows — lineage cut, not a data collect
        .map(r => (r.getInt(0), r.getSeq[Double](1)))
      centroids = updated.toSeq.toDF("list_id", "c")
      i += 1
    }
    pts.unpersist()
    centroids
  }

  /** Nearest-centroid assignment: broadcast + `min_by` argmin. A hash
    * aggregate with map-side partial combine — no per-id sort; the window
    * row_number formulation paid a full sort inside every Lloyd iteration
    * AND the final full-corpus assign. Ties break to the smaller list_id
    * (struct ordering), matching the window orderBy it replaces. */
  private def assign(pts: DataFrame, centroids: DataFrame): DataFrame =
    pts.crossJoin(broadcast(centroids))
      .withColumn("d", Distance.sqEuclidean(col("v"), col("c")))
      .groupBy(col("id"))
      // every row of an id-group carries the same v — first() is
      // deterministic in value here
      .agg(first(col("v")).as("v"),
        min_by(col("list_id"), struct(col("d"), col("list_id")))
          .as("list_id"))
      .select(col("id"), col("v"), col("list_id"))

  /** Build the index: rows tagged with their inverted-list id. */
  def buildIndex(df: DataFrame, idCol: String, vecCol: String,
      nlist: Int): (DataFrame, DataFrame) = {
    val centroids = fitCentroids(df, idCol, vecCol, nlist)
    val pts = df.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("v"))
    (assign(pts, centroids), centroids)
  }

  /** Approximate top-k: probe the nprobe nearest lists per query. */
  def knn(queries: DataFrame, index: DataFrame, centroids: DataFrame,
      qId: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val spark = queries.sparkSession
    graft.functions.VectorExprs.register(spark)
    val q = queries.select(col(qId).as("qid"),
      col(vecCol).cast("array<double>").as("qv"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("cd"), col("list_id"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("cd", Distance.sqEuclidean(col("qv"), col("c")))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("qv"), col("list_id"))
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("cos_sim").desc, col("cid"))
    index.withColumnRenamed("id", "cid")
      .join(probes, "list_id")
      .filter(col("cid") =!= col("qid"))
      .withColumn("cos_sim", round(Distance.cosine(col("v"), col("qv")), 6))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .select(col("qid"), col("cid"), col("cos_sim"), col("rn"))
  }
}
