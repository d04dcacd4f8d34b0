package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Norm, Tables}

/** Approximate-nearest-neighbor / similarity search over the embedding
  * column (north-star component). Two paths:
  *   - brute-force cosine top-k: one broadcast of the probe row, a single
  *     map-side higher-order-function scan, TakeOrdered for the top-k — the
  *     exact baseline, linear in |embeddings| and embarrassingly parallel;
  *   - sign-LSH bucketed variant: an 8-bit axis-hyperplane signature
  *     partitions vectors into 256 buckets; the probe scans only its bucket
  *     — the 100 TB path (scan shrinks ~256×; recall traded for scale).
  */
object Similarity {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  private def asDouble(c: Column): Column = transform(c, _.cast("double"))

  /** Brute-force cosine top-k of probe vec_id=0. The probe is a 1-row
    * broadcast (never a driver-side collect→literal of data), so the plan is
    * scan + BroadcastNestedLoopJoin(1 row) + project + TakeOrdered.
    */
  def cosineTopK(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val probe = e.filter(col("vec_id") === 0)
      .select(col("v").as("probe_v"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), col("label"),
        Norm.r4(cosine(col("v"), col("probe_v"))).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Sign-LSH ANN: bucket = sign bits of the first 8 dimensions
    * (axis-aligned random-hyperplane LSH; deterministic). Probe joins only
    * its own bucket via an equi-join on the bucket key, then exact cosine +
    * top-k within the bucket.
    */
  def annLsh(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val sig: Column = (0 until 8).map { i =>
      when(element_at(col("v"), i + 1) >= 0.0,
        lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
      .withColumn("bucket", sig)
    val probe = e.filter(col("vec_id") === 0)
      .select(col("bucket").as("probe_bucket"), col("v").as("probe_v"))
    e.filter(col("vec_id") =!= 0)
      .join(broadcast(probe), col("bucket") === col("probe_bucket"))
      .select(col("vec_id"), col("label"), col("bucket"),
        Norm.r4(cosine(col("v"), col("probe_v"))).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Per-label centroid then distance-to-centroid ranking — the IVF
    * building block (coarse quantizer = label here; at scale, a k-means
    * assignment column). Elementwise array average via posexplode +
    * re-assemble keeps state bounded per (label, dim).
    */
  def centroids(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("label"), posexplode(asDouble(col("embedding")))
        .as(Seq("dim", "x")))
    e.groupBy("label", "dim")
      .agg(avg("x").as("c"))
      .groupBy("label")
      .agg(Norm.r4(sqrt(sum(col("c") * col("c")))).as("centroid_norm"),
        count(lit(1)).as("dims"))
      .orderBy("label")
  }
}
