package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs

/** Product quantization (PQ) for embedding columns: split each `dim`-wide
  * vector into `m` subspaces and store, per subspace, the index of the
  * nearest codebook centroid — `m` small ints instead of `dim` floats
  * (64 floats → 8 bytes at m=8: 32× storage compression, the standard
  * serving-side layout for billion-vector ANN).
  *
  * Codebooks here are SEED-ROW codebooks: the centroid for (subspace j,
  * code c) is the j-th subvector of designated corpus row `centroidIds(c)`
  * — deterministic, data-dependent, and reachable by a relational oracle
  * (a learned k-means codebook plugs into the same encode/score shape; see
  * `Similarity.fitQuantizer` for the sampled-fit pattern).
  *
  * Scale shape: codebooks are dim×k doubles — broadcast; encoding and ADC
  * scoring are pure map-side projections over the corpus (no shuffle);
  * the only shuffle anywhere is the final top-k window by query.
  */
object Quantize {

  /** Per-subspace squared L2 between a vector slice and a centroid slice,
    * with the same left-to-right fold order as `VectorExprs.l2sq`. */
  private def subL2(v: Column, c: Column, lo: Int, len: Int): Column =
    VectorExprs.l2sq(slice(v, lo, len), slice(c, lo, len))

  /** Encode: for each row, `m` code columns `c0..c{m-1}` plus the exact
    * reconstruction distortion (sum of per-subspace min distances).
    * `centroids` must be a small relation (code, cv) — it is collected to
    * literals at plan time (codebooks are broadcast-scale by definition). */
  def pqEncode(embs: DataFrame, id: Column, vec: Column,
               centroids: Seq[(Int, Seq[Double])], m: Int,
               dim: Int): DataFrame = {
    require(dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    val v = vec.cast("array<double>")
    val perSubspace = (0 until m).map { j =>
      val lo = j * sub + 1
      // (dist, code) structs; array_min picks min dist, ties → min code
      val cands = centroids.map { case (code, cv) =>
        struct(
          subL2(v, array(cv.map(lit): _*), lo, sub).as("dist"),
          lit(code).as("code"))
      }
      array_min(array(cands: _*)).as(s"__m$j")
    }
    val encoded = embs.select(
      (id.as("id") +: vec.as("__v") +: perSubspace): _*)
    val codeCols = (0 until m).map(j => col(s"__m$j.code").as(s"c$j"))
    val mse = (0 until m).map(j => col(s"__m$j.dist")).reduce(_ + _)
    encoded.select((col("id") +: codeCols :+ round(mse, 6).as("distortion")): _*)
  }

  /** Asymmetric-distance (ADC) top-k: each query precomputes its exact
    * distance to every codebook centroid (m×k tiny table, map-side), and a
    * corpus row's approximate distance is the sum of the m looked-up
    * entries for its stored codes — no float vectors are read at query
    * time, only the PQ codes. */
  def pqAdcTopK(codes: DataFrame, queries: DataFrame, id: String, vec: String,
                centroids: Seq[(Int, Seq[Double])], m: Int, dim: Int,
                k: Int): DataFrame = {
    val sub = dim / m
    val qv = col(vec).cast("array<double>")
    // per query: m arrays of per-code distances (the ADC lookup tables)
    val tables = (0 until m).map { j =>
      val lo = j * sub + 1
      array(centroids.sortBy(_._1).map { case (_, cv) =>
        subL2(qv, array(cv.map(lit): _*), lo, sub)
      }: _*).as(s"__t$j")
    }
    val q = queries.select((col(id).as("query_id") +: tables): _*)
    val adc = (0 until m).map(j =>
      element_at(col(s"__t$j"), col(s"c$j") + 1)).reduce(_ + _)
    val scored = codes.withColumnRenamed("id", "neighbor_id")
      .crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist", adc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("adc_dist"), 6).as("adc_dist"))
  }

  /** Seed-row codebook: subvectors of the designated corpus rows. */
  def seedCodebook(embs: DataFrame, id: Column, vec: Column,
                   centroidIds: Seq[Long]): Seq[(Int, Seq[Double])] = {
    val rows = embs.filter(id.isin(centroidIds.map(lit): _*))
      .select(id.as("cid"), vec.cast("array<double>").as("cv"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toIndexedSeq)
      .toMap
    val missing = centroidIds.filterNot(rows.contains)
    require(missing.isEmpty, s"seed centroid rows not found: $missing")
    centroidIds.zipWithIndex.map { case (cid, code) => code -> rows(cid) }
  }
}
