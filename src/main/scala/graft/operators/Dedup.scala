package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Portable, VectorFunctions}
import graft.functions.Portable.{Spark => SparkD, Duck => DuckD}

/** Deduplication tier for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale posture (100 TB): every method avoids the naive O(n²) all-pairs
  * comparison — exact dedup is one hash-shuffle; MinHash/LSH compares only
  * within LSH band buckets; n-gram Jaccard only joins docs sharing a shingle;
  * embedding near-dup goes through hyperplane buckets (see Similarity).
  * Signature computation is per-row column arithmetic (no shuffle at all)
  * built from the Portable fragments so the DuckDB oracle evaluates the
  * identical hashes.
  */
object Dedup {

  // 16 minhashes in 2 bands of 8 ⇒ candidate threshold ≈ (1/b)^(1/r) ≈ 0.92
  // Jaccard. The synthetic corpus draws from a tiny vocabulary, so random
  // doc pairs already sit at J≈0.5-0.7; wide bands (4×4, threshold ≈0.7)
  // would flag ~30% of ALL pairs as candidates. Narrow bands keep the
  // candidate set proportional to the true near-dup population — the
  // property that makes LSH linear-ish at 100 TB.
  val NumHashes = 16
  val Bands = 2
  val RowsPerBand: Int = NumHashes / Bands

  /** Exact duplicate groups by content hash: md5(text) → group. One shuffle;
    * at 100 TB this is the standard first pass (hash is 16 bytes/doc, the
    * groupBy shuffles digests not documents). */
  def exactGroups(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("h"))
      .agg(min("doc_id").as("keep_id"), count("*").as("n"))

  /** MinHash signature matrix: doc_id, mh0..mh{NumHashes-1}. Computed by the
    * one-pass [[graft.functions.MinHashSig]] codegen expression (same
    * arithmetic as the Portable fragments the oracle runs — see its spec
    * test pinning declarative ≡ kernel). */
  def minhashSignatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val sig = docs.select(col("doc_id"),
      graft.functions.TextHashFunctions.minhashSig(col(textCol)).as("sig"))
    sig.select((col("doc_id") +: (0 until NumHashes).map(j =>
      element_at(col("sig"), j + 1).as(s"mh$j"))): _*)
  }

  /** LSH banding: one row per (doc, band) with the band's concatenated
    * signature — the bucket key. */
  def minhashBands(sig: DataFrame): DataFrame = {
    val bandStructs = (0 until Bands).map { b =>
      val cols = (0 until RowsPerBand).map(r => s"mh${b * RowsPerBand + r}")
      struct(lit(b).as("band"), expr(Portable.bandKey(cols)).as("bkey"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  /** Candidate near-duplicate pairs: docs sharing at least one LSH bucket.
    * The self-join shuffles on (band, bkey) — each bucket is tiny, so the
    * join is local within buckets; no all-pairs blowup. */
  def minhashCandidatePairs(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val bands = minhashBands(minhashSignatures(docs, textCol))
    val l = bands.as("l"); val r = bands.as("r")
    l.join(r, col("l.band") === col("r.band") && col("l.bkey") === col("r.bkey") &&
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .distinct()
  }

  /** 32-bit SimHash per document (term-frequency weighted majority vote),
    * via the one-pass [[graft.functions.SimHash]] codegen expression. */
  def simhashSignatures(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.TextHashFunctions.simhash(col(textCol)).as("simhash"))

  /** Full MinHash near-dup detection: LSH candidates verified by signature
    * agreement (estimated Jaccard = fraction of equal minhashes). The
    * verification join happens BEFORE the candidate-dedup shuffle, so the
    * expensive distinct+sort runs on the small verified set, not the raw
    * candidate explosion. `minEstJaccard` is compared on the rounded
    * estimate (multiples of 1/16 — exactly representable). */
  def minhashNearDupPairs(docs: DataFrame, minEstJaccard: Double,
                          textCol: String = "text"): DataFrame = {
    val sig = minhashSignatures(docs, textCol)
    val bands = minhashBands(sig)
    val cand = bands.as("l")
      .join(bands.as("r"), col("l.band") === col("r.band") &&
        col("l.bkey") === col("r.bkey") && col("l.doc_id") < col("r.doc_id"))
      .select(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
    // Verification keeps signatures as PACKED arrays (one 16-long column,
    // compared by the codegen ArrayEqCount kernel) instead of 16 scalar
    // columns per side — slimmer pair rows, one primitive loop per pair.
    // The signature table is tiny next to the candidate stream, so it is
    // broadcast to keep verification map-side; past broadcast size
    // (~100M docs) drop the hint and let AQE plan the join.
    val sigArr = docs.select(col("doc_id"),
      graft.functions.TextHashFunctions.minhashSig(col(textCol)).as("sig"))
    val sa = broadcast(sigArr.toDF("a", "sig_a"))
    val sb = broadcast(sigArr.toDF("b", "sig_b"))
    import org.apache.spark.sql.{GraftSqlBridge => B}
    val agree = B.column(graft.functions.ArrayEqCount(
      B.expression(col("sig_a")), B.expression(col("sig_b"))))
    cand.join(sa, "a").join(sb, "b")
      .select(col("a"), col("b"),
        round(agree / lit(16.0), 4).as("est_jaccard"))
      .where(col("est_jaccard") >= minEstJaccard)
      .distinct()
  }

  // ---------------------------------------------------------- n-gram Jaccard

  /** Token n-gram shingles (n=3), Spark dialect. Guarded so docs shorter than
    * n yield an empty array (Spark's `sequence(1, 0)` would count DOWN). */
  def shingleExprSpark(toksCol: String): String =
    s"""CASE WHEN size($toksCol) < 3 THEN array()
       | ELSE transform(sequence(1, size($toksCol) - 2),
       |   i -> concat_ws(' ', element_at($toksCol, i),
       |     element_at($toksCol, i + 1), element_at($toksCol, i + 2)))
       | END""".stripMargin

  /** Same shingles in DuckDB (range() end-exclusive, empty when end <= start). */
  def shingleExprDuck(toksCol: String): String =
    s"list_transform(range(1, greatest(length($toksCol) - 1, 1)), " +
      s"i -> concat_ws(' ', $toksCol[i], $toksCol[i + 1], $toksCol[i + 2]))"

  /** Distinct (doc_id, shingle-hash) pairs via the one-pass
    * [[graft.functions.ShingleSet]] kernel (hash values identical to
    * `xxhash64(concat_ws(' ', ...))`): per-doc dedup happens inside the
    * kernel's hash set, so no distinct shuffle. Shuffles move 8-byte hash
    * keys, not ~30-char strings; a hash collision could perturb a Jaccard
    * count, but over ~10^5 distinct shingles in 2^64 space P ≈ 1e-10. */
  def shingles(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.TextHashFunctions.shingleSet(col(textCol)).as("shs"))
      .select(col("doc_id"), explode(col("shs")).as("sh"))

  /** Near-dup pairs by 3-gram Jaccard ≥ threshold. Inverted-index join: only
    * docs sharing a shingle are ever compared. Jaccard is computed on exact
    * distinct-shingle counts and rounded before thresholding so the oracle
    * can't disagree at the boundary. */
  def ngramJaccardPairs(docs: DataFrame, threshold: Double,
                        textCol: String = "text"): DataFrame = {
    val sh = shingles(docs, textCol)
    val sizes = sh.groupBy("doc_id").agg(count("*").as("nsh"))
    val shared = sh.as("l")
      .join(sh.as("r"), col("l.sh") === col("r.sh") && col("l.doc_id") < col("r.doc_id"))
      .groupBy(col("l.doc_id").as("a"), col("r.doc_id").as("b"))
      .agg(count("*").as("shared"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("nsh", "na"), "a")
      .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("nsh", "nb"), "b")
      .select(col("a"), col("b"),
        round(col("shared") / (col("na") + col("nb") - col("shared")), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Embedding-cosine near-dup pairs at scale: candidates limited to pairs
    * sharing a hyperplane-LSH bucket (Similarity.bucketCol), so the self-join
    * shuffles each vector ONCE on its bucket id instead of building all
    * pairs. Recall for a pair at angle θ is (1-θ/π)^numPlanes — tuned via
    * Similarity.NumPlanes / multi-probe at real scale. */
  def embeddingNearDupLsh(emb: DataFrame, threshold: Double): DataFrame = {
    val e = Similarity.withBuckets(emb).select(col("vec_id"),
      VectorFunctions.asDouble(col("embedding")).as("v"), col("bucket"))
      .withColumn("nrm", VectorFunctions.norm(col("v")))
    val l = e.select(col("vec_id").as("a"), col("v").as("va"),
      col("nrm").as("na"), col("bucket"))
    val r = e.select(col("vec_id").as("b"), col("v").as("vb"),
      col("nrm").as("nb"), col("bucket"))
    l.join(r, Seq("bucket")).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        round(VectorFunctions.dot(col("va"), col("vb")) / (col("na") * col("nb")), 4)
          .as("cos"))
      .where(col("cos") >= threshold)
  }

  /** Embedding-cosine near-dup pairs among a bounded probe set (callers cap
    * the probe side; the unbounded scale path is embeddingNearDupLsh).
    *
    * Implemented with `mapPartitions` + an explicit broadcast of the probe
    * vectors — the documented tier-(d) case (SURVEY.md §2.10): brute-force
    * pair scoring is genuinely per-partition imperative compute, and the
    * row-at-a-time BroadcastNestedLoopJoin alternative measured ~1.4µs/pair
    * of pure join overhead (14× the arithmetic). Shape at scale: candidates
    * scan their partition once, probes ride a broadcast variable, no shuffle
    * until the final (tiny) result.
    *
    * Determinism contract: widening, sequential dot order, and HALF_UP
    * rounding replicate exactly what the declarative form (and the DuckDB
    * oracle) compute, so results hash-match. */
  def embeddingNearDupPairs(emb: DataFrame, maxProbeId: Long,
                            threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    import org.apache.spark.sql.{Encoders, Row}
    val probes: Array[(Long, Array[Double], Double)] = emb
      .where(col("vec_id") < maxProbeId)
      .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")))
      .collect()
      .map { r =>
        val v = r.getSeq[Double](1).toArray
        (r.getLong(0), v, math.sqrt(dotArr(v, v)))
      }
      .sortBy(_._1)
    val bc = spark.sparkContext.broadcast(probes)
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaDouble)
    // repartition spreads the candidate scan across cores (the probe side is
    // broadcast, so this shuffle is just the candidate rows, once)
    emb.select(col("vec_id"), VectorFunctions.asDouble(col("embedding")))
      .repartition(emb.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { rows =>
        val ps = bc.value
        rows.flatMap { r =>
          val b = r.getLong(0)
          val vb = r.getSeq[Double](1).toArray
          val nb = math.sqrt(dotArr(vb, vb))
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
          var i = 0
          while (i < ps.length && ps(i)._1 < b) {
            val p = ps(i)
            val cos = round4(dotArr(p._2, vb) / (p._3 * nb))
            if (cos >= threshold) out += ((p._1, b, cos))
            i += 1
          }
          out
        }
      }(enc)
      .toDF("a", "b", "cos")
  }

  /** Sequential left-to-right dot — the exact summation order of
    * [[graft.functions.DotProduct]] and DuckDB's list_dot_product. */
  private def dotArr(x: Array[Double], y: Array[Double]): Double = {
    val n = math.min(x.length, y.length)
    var s = 0.0; var i = 0
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }

  /** Spark's `round(_, 4)` on doubles: BigDecimal HALF_UP. */
  private def round4(v: Double): Double =
    if (v.isNaN || v.isInfinite) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
}
