package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Fixed random-hyperplane family for sign-LSH over the 64-dim embedding
  * column, shared by the Spark operators AND the generated DuckDB oracle SQL
  * so the banding is part of the declared (deterministic) semantics rather
  * than an approximation the oracle can't see.
  *
  * 64 hyperplanes with ±1 components from a fixed-seed PRNG. Band b uses
  * hyperplanes [8b, 8b+8): an 8-bit key, 256 buckets per band. Sign-LSH
  * property: P(sign agrees) = 1 − θ/π per hyperplane, so cosine-similar
  * pairs collide in some band with high probability while random pairs
  * (θ≈π/2) match a given band with p ≈ 2⁻⁸ — the equi-join stays sparse at
  * any scale (no O(n²) block).
  */
object Hyperplanes {

  val Dim = 64
  val NumPlanes = 64
  val BitsPerBand = 8
  val NumBands: Int = NumPlanes / BitsPerBand // 8

  /** Widest banding the fixed family supports (wide-band keys for large
    * corpora; see [[bandKeysWide]]).
    */
  val MaxPlanes = 256

  /** ±1 matrix [plane][dim], fixed seed → identical in oracle SQL.
    * Row-major fill from one PRNG stream, so the first [[NumPlanes]] rows
    * are bit-identical whether or not the wide tail is ever used — the
    * 8×8 fixture banding (and the oracle SQL embedding it) is stable.
    */
  val W: Array[Array[Double]] = {
    val rnd = new scala.util.Random(20240612L)
    Array.fill(MaxPlanes, Dim)(if (rnd.nextBoolean()) 1.0 else -1.0)
  }

  /** dot(v, W[h]) with the left-fold accumulation order of DuckDB's
    * list_sum, so the sign bits agree bit-for-bit with the oracle.
    *
    * Backed by the custom codegen [[graft.functions.DotProduct]] loop: the
    * HOF formulation (`aggregate(zip_with(...))`) executes interpreted, and
    * unrolling 64 planes × 64 dims into element_at terms blows past JIT
    * method-size limits and measured ~10× slower (59 s vs 5.3 s at sf0.1).
    */
  def planeDot(v: Column, h: Int): Column = dot64(v, typedlit(W(h).toSeq))

  /** Codegen'd dot product with the same left fold order as DuckDB's
    * `list_sum([a[i]*b[i] ...])`.
    */
  def dot64(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.DotProduct(
        org.apache.spark.sql.GraftSqlBridge.expression(a),
        org.apache.spark.sql.GraftSqlBridge.expression(b)))

  /** One hoisted null-element scan for a vector column (nulls ragged
    * vectors whole, declares containsNull = false) so every downstream
    * [[dot64]]/[[planeDot]] keeps the branch-free codegen loop — apply at
    * the projection that loads embeddings, never per dot.
    */
  def vecClean(v: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      graft.functions.VecClean(
        org.apache.spark.sql.GraftSqlBridge.expression(v)))

  /** Key of band `b` over a `bitsPerBand`-wide banding — THE band-key
    * construction, shared by the batch generators below and the streaming
    * embed scheme (`StreamingNearDedup.withEmbedBands`), so an edit to
    * the plane family or sign convention can never de-synchronize batch
    * and stream dedup semantics.
    */
  def bandKeyWide(v: Column, b: Int, bitsPerBand: Int): Column =
    (0 until bitsPerBand).map { i =>
      when(planeDot(v, b * bitsPerBand + i) >= 0.0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** 8-bit key of band `b` for vector column `v`. */
  def bandKey(v: Column, b: Int): Column = bandKeyWide(v, b, BitsPerBand)

  /** array of all band keys (index = band). */
  def bandKeys(v: Column): Column =
    array((0 until NumBands).map(b => bandKey(v, b)): _*)

  /** Band keys for an arbitrary (numBands × bitsPerBand) banding over the
    * fixed family — the corpus-size knob. Random pairs collide in a given
    * band with p ≈ 2^-bits, so expected random candidate pairs are
    * C(n,2)·bands·2^-bits: QUADRATIC in corpus at fixed width. Sizing
    * bits ≈ log2(n) keeps the candidate set O(n·bands) — at the fixture's
    * 2k vectors 8 bits suffices; a 100 TB corpus wants 24+ bits (and more
    * bands to hold recall, the standard LSH bands×width tradeoff). Key
    * width caps at 31 bits (int key).
    */
  def bandKeysWide(v: Column, numBands: Int, bitsPerBand: Int): Column = {
    require(numBands > 0 && bitsPerBand > 0 && bitsPerBand <= 31,
      s"need numBands > 0, 0 < bitsPerBand <= 31; got $numBands x $bitsPerBand")
    require(numBands * bitsPerBand <= MaxPlanes,
      s"banding $numBands x $bitsPerBand needs ${numBands * bitsPerBand} " +
        s"planes; the fixed family has $MaxPlanes")
    array((0 until numBands).map(b => bandKeyWide(v, b, bitsPerBand)): _*)
  }

  /** DuckDB CTE fragment `(VALUES (0, [..]), ...) AS w(h, wv)` with the
    * fixture's 64-plane prefix (the declared 8×8 banding), for oracle SQL
    * generation — the wide tail is a scale knob, never oracle semantics.
    */
  def sqlValues: String =
    W.take(NumPlanes).zipWithIndex.map { case (row, h) =>
      s"($h, [${row.map(x => if (x > 0) "1.0" else "-1.0").mkString(",")}])"
    }.mkString("(VALUES ", ", ", ") AS w(h, wv)")

  /** DuckDB CTEs computing per-vector band keys from a relation
    * `e(vec_id, label, v, nrm)`; yields `keys(vec_id, band, bkey)`.
    */
  def sqlBandKeysCte: String =
    s"""planes AS (SELECT h, wv FROM ${sqlValues}),
       |bits AS (SELECT e.vec_id, CAST(planes.h // ${BitsPerBand} AS INT) AS band,
       |  CASE WHEN list_sum([e.v[i] * planes.wv[i] FOR i IN generate_series(1, ${Dim})]) >= 0
       |       THEN CAST(1 << (planes.h % ${BitsPerBand}) AS INT) ELSE 0 END AS bit
       |  FROM e CROSS JOIN planes),
       |keys AS (SELECT vec_id, band, CAST(SUM(bit) AS INT) AS bkey FROM bits GROUP BY 1, 2)""".stripMargin
}
