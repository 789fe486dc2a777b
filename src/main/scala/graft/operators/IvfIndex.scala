package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour: a k-means coarse
  * quantizer partitions the corpus into `nlist` cells; a query scans
  * only its `nprobe` nearest cells, re-ranked by exact cosine.
  *
  * The alternative scale path to sign-LSH (`SimilarityOps.annSignLsh`):
  * LSH needs no training and handles any distribution; IVF scans
  * ~nprobe/nlist of the corpus and wins when the data is clustered
  * (verified on planted clusters in SimilaritySpec — recall 1.0 when
  * nprobe covers the true cell).
  *
  * Scale design: training samples the corpus (k-means on a bounded
  * sample is standard IVF practice); assignment is one broadcast-model
  * map; the search joins queries to candidates on the cell id — a
  * hash-partitioned equi-join, candidates per query bounded by
  * nprobe · cell size. Deterministic: fixed seed, deterministic
  * centroid ordering, exact-cosine tie-break by neighbor id.
  */
object IvfIndex {

  /** Assign every vector to its quantizer cell: (vec_id, embedding, cell).
    *
    * Training fits k-means on a bounded random sample (`maxTrainRows`) —
    * the coarse quantizer needs only enough points to place `nlist`
    * centroids, and an unbounded fit is ~20 distributed passes over the
    * FULL corpus at 100 TB. Only the single-pass `transform` touches
    * every row. Deterministic: fixed seed drives both the sample and the
    * k-means init.
    */
  def assign(emb: DataFrame, nlist: Int, seed: Long = 42L,
      maxTrainRows: Long = 100000L): DataFrame = {
    val withVec = emb.withColumn("_vec", array_to_vector(col("embedding")))
    val n = withVec.count()
    val train =
      if (n <= maxTrainRows) withVec
      else withVec.sample(withReplacement = false, maxTrainRows.toDouble / n, seed)
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setFeaturesCol("_vec").setPredictionCol("cell")
      .fit(train)
    model.transform(withVec).select(col("vec_id"), col("embedding"), col("cell"))
  }

  /** Top-k cosine neighbours per query, scanning only the nprobe nearest
    * cells (by exact cosine between query and every corpus point in the
    * probed cells; cell probe order by centroid distance is folded into
    * the candidate join below via a per-query cell ranking).
    */
  def search(
      emb: DataFrame, queryIds: Seq[Long], k: Int,
      nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val assigned = assign(emb, nlist, seed).cache()
    // centroid per cell (mean embedding) for probe selection
    val dim = emb.select(size(col("embedding"))).head.getInt(0)
    val centers = assigned
      .select(col("cell"), posexplode(col("embedding")))
      .toDF("cell", "i", "x")
      .groupBy("cell", "i").agg(avg(col("x")).as("c"))
      .groupBy("cell").agg(
        array_sort(collect_list(struct(col("i"), col("c")))).as("pairs"))
      .select(col("cell"),
        expr(s"transform(pairs, p -> cast(p.c as float))").as("centroid"))
    val queries = assigned.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    // rank cells per query by centroid cosine; keep nprobe
    val probed = queries.crossJoin(broadcast(centers))
      .withColumn("cdist", expr("graft_cosine(qe, centroid)"))
      .withColumn("crank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cdist").desc, col("cell"))))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("qe"), col("cell"))
    // candidates = corpus points in probed cells; exact re-rank
    probed.join(assigned.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ne"), col("cell")), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        expr("graft_cosine(qe, ne)").as("sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "neighbor_id", "rnk", "sim")
  }
}
