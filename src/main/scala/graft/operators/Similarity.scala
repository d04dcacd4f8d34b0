package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Norm, Tables}

/** Approximate-nearest-neighbor / similarity search over the embedding
  * column (north-star component). Two paths:
  *   - brute-force cosine top-k: one broadcast of the probe row, a single
  *     map-side higher-order-function scan, TakeOrdered for the top-k — the
  *     exact baseline, linear in |embeddings| and embarrassingly parallel;
  *   - multi-table sign-LSH variant: 4 independent 8-bit random-hyperplane
  *     signatures ([[Hyperplanes]]); the probe examines only its 4 buckets
  *     (~n/64 of the data in expectation) — the 100 TB path, with recall
  *     lifted by the candidate union across tables.
  */
object Similarity {

  private def dot(a: Column, b: Column): Column = Hyperplanes.dot64(a, b)

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
      .withColumn("nrm", dot(col("v"), col("v")))
    val probe = e.filter(col("vec_id") === 0)
      .select(col("v").as("probe_v"), col("nrm").as("probe_nrm"))
    e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), col("label"),
        Norm.r4(dot(col("v"), col("probe_v")) /
          (sqrt(col("nrm")) * sqrt(col("probe_nrm")))).as("cosine"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Multi-table sign-LSH ANN ([[Hyperplanes]]): 4 independent hash tables,
    * each an 8-bit random-hyperplane signature (256 buckets). A vector is a
    * candidate if it shares ANY table's bucket with the probe — candidate
    * union across tables is what lifts recall from one table's ~p⁸ to
    * 1-(1-p⁸)⁴ while each table's bucket still holds only ~n/256 vectors.
    * Candidates are ranked by exact cosine, top-k.
    *
    * The bucket keys are deterministic (fixed hyperplane literals shared
    * with the oracle SQL), so the whole query is SQL-checkable. At 100 TB
    * the same band keys feed a bucketed table layout so the probe-side join
    * prunes to 4 buckets per table instead of scanning.
    */
  def annLsh(s: SparkSession, dir: String, k: Int = 10, tables: Int = 4): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), asDouble(col("embedding")).as("v"))
    val keys = e.select(col("vec_id"),
      posexplode(array((0 until tables).map(b =>
        Hyperplanes.bandKey(col("v"), b)): _*)).as(Seq("tbl", "bkey")))
    val probeKeys = keys.filter(col("vec_id") === 0)
      .select(col("tbl").as("p_tbl"), col("bkey").as("p_bkey"))
    val cand = keys.filter(col("vec_id") =!= 0)
      .join(broadcast(probeKeys),
        col("tbl") === col("p_tbl") && col("bkey") === col("p_bkey"))
      .select(col("vec_id")).distinct()
    val en = e.withColumn("nrm", dot(col("v"), col("v")))
    val probe = en.filter(col("vec_id") === 0)
      .select(col("v").as("probe_v"), col("nrm").as("probe_nrm"))
    cand
      .join(en, "vec_id")
      .crossJoin(broadcast(probe))
      .select(col("vec_id"), col("label"),
        Norm.r4(dot(col("v"), col("probe_v")) /
          (sqrt(col("nrm")) * sqrt(col("probe_nrm")))).as("cosine"))
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
