package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables

/** Seeded k-means IVF (the trained-centroid path): no hash oracle by design
  * (distributed float summation makes centroid bits engine-specific), so the
  * gate is measured recall against EXACT answers — the same policy as the
  * LSH tier.
  *
  * Two corpora, because what "trained beats arbitrary" means depends on
  * structure (all measured this round):
  *
  *  - The testdata embeddings are ISOTROPIC unit vectors (mean pairwise
  *    cos 0.000, std 0.125, max 0.51 at sf0.01) — on structureless data NO
  *    centroid scheme can systematically beat another, so the gate there is
  *    parity within noise. (Naive small-query comparisons flatter the
  *    deterministic path hugely: its centroids ARE vectors 0..7 and the
  *    probe set starts at vec_id 0, so a query probes its own cell —
  *    recall 0.83 vs 0.50 at 10 queries collapses to 0.44 vs 0.42 once the
  *    query set stops coinciding with the centroid set.)
  *
  *  - A CLUSTERED corpus (built deterministically from corpus vectors, no
  *    RNG) where the first 8 vectors — the deterministic path's centroids —
  *    all sit in ONE cluster: the textbook diversity failure of
  *    arbitrary-vector centroids. Training must recover the true centers
  *    and decisively win.
  */
class IvfTrainingSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val sfDir = "/root/testdata/sf0.01"
  private lazy val emb = Tables(spark, sfDir, "embeddings")

  private val K = 3

  private def exactTopK(df: DataFrame, qids: Seq[Long]): Map[Long, Set[Long]] =
    qids.map { qid =>
      qid -> Similarity.bruteForceTopK(df, qid, K + 1)
        .collect().map(_.getLong(0)).filter(_ != qid).take(K).toSet
    }.toMap

  private def recall(df: DataFrame, truth: Map[Long, Set[Long]],
                     qs: Set[Long]): Double = {
    val rows = df.select("qid", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).filter(p => qs.contains(p._1))
    rows.count { case (q, v) => truth(q).contains(v) }.toDouble / (qs.size * K)
  }

  test("trained centroids have the right shape and respect the seed's k") {
    val cents = Similarity.kmeansCentroids(emb, k = 8, iters = 3, seed = 42L)
    assert(cents.length == 8)
    assert(cents.forall(_.length == Similarity.Dim))
    // spherical: every trained centroid is unit length
    assert(cents.forall(c => math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9))
    // training moved at least one centroid off its (normalized) init vector
    val init = Similarity.kmeansCentroids(emb, k = 8, iters = 0, seed = 42L)
    assert(cents.zip(init).exists { case (a, b) => !a.sameElements(b) })
  }

  test("isotropic corpus: trained recall is at parity with the baseline " +
    "over a query set disjoint from the baseline's centroids") {
    val nQ = 30L
    val truth = exactTopK(emb, 0L until nQ)
    val fair = (8L until nQ).toSet // exclude the baseline's centroid ids
    val base = recall(
      Similarity.ivfTopK(emb, numCentroids = 8, maxQueryId = nQ, k = K),
      truth, fair)
    val trained = recall(
      Similarity.ivfTopKTrained(emb, numCentroids = 8, iters = 5, seed = 42L,
        maxQueryId = nQ, k = K, nprobe = 2),
      truth, fair)
    assert(trained >= base - 0.1,
      s"trained recall $trained more than noise below baseline $base")
  }

  test("clustered corpus: training recovers cluster structure the " +
    "deterministic centroids cannot represent") {
    import spark.implicits._
    // 8 cluster centers = corpus vectors 200..207; 200 members, 25 per
    // cluster IN CLUSTER-MAJOR ORDER so members 0..7 (the deterministic
    // path's centroids) all land in cluster 0. Member i of cluster j mixes
    // the center with corpus vector i — deterministic, corpus-derived.
    val raw = emb.orderBy("vec_id").limit(208).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = (0 until 8).map(j => unit(raw(200 + j)))
    val members = (0 until 200).map { i =>
      val c = centers(i / 25)
      val noise = unit(raw(i))
      val m = unit(c.zip(noise).map { case (a, b) => 0.9 * a + 0.3 * b })
      (i.toLong, m.map(_.toFloat).toSeq)
    }
    val clustered = members.toDF("vec_id", "embedding")

    val nQ = 10L // queries are members 0..9, all of cluster 0
    val truth = exactTopK(clustered, 0L until nQ)
    val all = (0L until nQ).toSet
    val base = recall(
      Similarity.ivfTopK(clustered, numCentroids = 8, maxQueryId = nQ, k = K),
      truth, all)
    val trained = recall(
      Similarity.ivfTopKTrained(clustered, numCentroids = 8, iters = 5,
        seed = 42L, maxQueryId = nQ, k = K, nprobe = 2),
      truth, all)
    assert(trained >= 0.8, s"trained recall $trained below 0.8 on clusters")
    assert(trained > base,
      s"trained recall $trained did not beat same-cluster centroids $base")
  }
}
