package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{Portable, VectorFunctions => V}

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the scale posture:
  *  - `bruteForceTopK`: exact cosine top-k against one query vector — a
  *    single scan, no shuffle (the query side is a broadcast of one row);
  *    the correct baseline and fine at any scale for a single query.
  *  - `lshTopK`: random-hyperplane LSH — bucket every vector by the sign
  *    pattern of `numPlanes` fixed hyperplane projections, join queries to
  *    candidates within the same bucket only, rank per query. At 100 TB the
  *    bucket join shuffles each vector once on its bucket id instead of
  *    cross-joining; recall is tuned by numPlanes / multi-probe.
  *
  * Hyperplanes are deterministic (Portable.plane) so the DuckDB oracle can
  * evaluate the identical bucketing.
  */
object Similarity {

  val Dim = 64
  val NumPlanes = 8

  /** Spark-side dot of the embedding column against a literal plane. */
  private def planeDot(embCol: Column, i: Int): Column =
    V.dot(embCol, array(Portable.plane(i, Dim).map(lit): _*))

  /** Sign-pattern bucket id from the hyperplane projections. */
  def bucketCol(embCol: Column): Column =
    (0 until NumPlanes).map { i =>
      when(planeDot(embCol, i) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** DuckDB rendering of the same bucket id. */
  def duckBucket(embCol: String): String = {
    (0 until NumPlanes).map { i =>
      val planeLit = Portable.plane(i, Dim).map(d => f"$d%.6f").mkString("[", ", ", "]")
      s"(CASE WHEN list_dot_product(CAST($embCol AS DOUBLE[]), $planeLit) >= 0 " +
        s"THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** Exact cosine top-k of every vector against the vector with id `queryId`.
    * The query row is broadcast; result ordered by rounded cosine then id so
    * ranking is deterministic across engines. */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = emb.where(col("vec_id") === queryId).select(col("embedding").as("qv"))
    emb.crossJoin(broadcast(q))
      .select(col("vec_id"), V.cosine4(col("embedding"), col("qv")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(k)
  }

  /** Vectors annotated with their LSH bucket. */
  def withBuckets(emb: DataFrame): DataFrame =
    emb.withColumn("bucket", bucketCol(col("embedding")))

  /** ANN: top-k per query among same-bucket candidates.
    * Queries = vec_id < maxQueryId (a parameterized probe set). */
  def lshTopK(emb: DataFrame, maxQueryId: Long, k: Int): DataFrame = {
    val b = withBuckets(emb)
    val q = b.where(col("vec_id") < maxQueryId)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("bucket"))
    val cand = b.select(col("vec_id"), col("embedding"), col("bucket"))
    val scored = broadcast(q).join(cand, Seq("bucket"))
      .where(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        V.cosine4(col("qv"), col("embedding")).as("cos"))
    Relational.topKPerGroup(scored, Seq("qid"),
      Seq(col("cos").desc, col("vec_id")), k)
      .select(col("qid"), col("rn"), col("vec_id"), col("cos"))
  }
}
