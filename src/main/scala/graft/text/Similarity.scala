package graft.text

import org.apache.spark.sql.{DataFrame, Column, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * - Brute-force cosine top-k: the exact baseline — one broadcast of the
  *   query vector, one narrow map, one top-k (TakeOrdered, no full sort).
  * - IVF (inverted-file) variant: the scale path — k-means-style coarse
  *   cells from sampled centroids; each vector is assigned to its nearest
  *   centroid once (narrow, broadcast centroids); a query probes only the
  *   `nprobe` nearest cells, turning a 100 TB scan into a partition-pruned
  *   fraction. Cell assignment is a partition column on write.
  */
object Similarity {

  /** Cosine similarity of two float vectors, accumulated in double. */
  def cosine(aIn: Seq[Float], bIn: Seq[Float]): Double = {
    // Seq can arrive as a List: indexed loops need O(1) access
    val a = aIn match { case s: scala.collection.IndexedSeq[Float] => s; case s => s.toIndexedSeq }
    val b = bIn match { case s: scala.collection.IndexedSeq[Float] => s; case s => s.toIndexedSeq }
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def cosineUdf = udf((a: Seq[Float], b: Seq[Float]) => cosine(a, b))

  /** Exact top-k cosine neighbors of `query` (excluding `excludeId`). */
  def bruteForceTopK(embeddings: DataFrame, query: Array[Float], k: Int,
                     excludeId: Long = -1L,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = lit(query) // broadcast as a literal array
    embeddings
      .filter(col(idCol) =!= excludeId)
      .select(col(idCol), round(cosineUdf(col(vecCol), q), 4).as("sim"))
      .orderBy(col("sim").desc, col(idCol))
      .limit(k)
  }

  /** Assign each vector to its nearest sampled centroid (IVF coarse
    * quantizer). Centroids are taken deterministically (every `sampleEvery`th
    * id) so tests are stable; a production build would k-means them. */
  def ivfAssign(embeddings: DataFrame, sampleEvery: Int = 50,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = embeddings.sparkSession
    val centroids = embeddings
      .filter(pmod(col(idCol), lit(sampleEvery)) === 0)
      .select(col(idCol).as("centroid_id"), col(vecCol).as("centroid"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val bc = spark.sparkContext.broadcast(centroids)
    val assignUdf = udf { (v: Seq[Float]) =>
      val cs = bc.value
      var best = -1L
      var bestSim = Double.NegativeInfinity
      for ((cid, c) <- cs) {
        val s = cosine(v, c.toSeq)
        if (s > bestSim || (s == bestSim && cid < best)) { best = cid; bestSim = s }
      }
      best
    }
    embeddings.withColumn("cell", assignUdf(col(vecCol)))
  }

  /** IVF search: probe the `nprobe` cells whose centroids are most similar
    * to the query, then exact top-k within the probed fraction. */
  def ivfTopK(assigned: DataFrame, query: Array[Float], k: Int, nprobe: Int = 3,
              excludeId: Long = -1L,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centroidSims = assigned.select(col("cell")).distinct().collect().map(_.getLong(0))
    // rank cells by centroid similarity: centroid id == a member vec id
    val centroidVecs = assigned
      .filter(col(idCol).isin(centroidSims: _*))
      .select(col(idCol), col(vecCol)).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val probeCells = centroidVecs
      .map { case (cid, v) => (cid, cosine(v, query.toSeq)) }
      .sortBy { case (cid, s) => (-s, cid) }
      .take(nprobe).map(_._1)
    bruteForceTopK(assigned.filter(col("cell").isin(probeCells: _*)),
      query, k, excludeId, idCol, vecCol)
  }

  /** All-pairs near-neighbor candidates by random-hyperplane LSH: vectors
    * sharing a sign-pattern bucket are compared exactly. Narrow signature
    * pass + bucket-join, like MinHash for text. */
  def cosineLshPairs(embeddings: DataFrame, planes: Int = 12, minSim: Double = 0.8,
                     seed: Int = 7,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = embeddings.select(size(col(vecCol))).first().getInt(0)
    val rnd = new scala.util.Random(seed)
    val hyper = Array.fill(planes, dim)(rnd.nextGaussian())
    val spark = embeddings.sparkSession
    val bc = spark.sparkContext.broadcast(hyper)
    val sigUdf = udf { (v: Seq[Float]) =>
      val hs = bc.value
      var sig = 0
      for (p <- hs.indices) {
        var dot = 0.0
        var i = 0
        while (i < v.length && i < hs(p).length) { dot += v(i) * hs(p)(i); i += 1 }
        if (dot >= 0) sig |= (1 << p)
      }
      sig
    }
    val sigs = embeddings.select(col(idCol).as("id"), col(vecCol).as("vec"),
      sigUdf(col(vecCol)).as("bucket"))
    sigs.as("a").join(sigs.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(cosineUdf(col("a.vec"), col("b.vec")), 4).as("sim"))
      .filter(col("sim") >= minSim)
  }
}
