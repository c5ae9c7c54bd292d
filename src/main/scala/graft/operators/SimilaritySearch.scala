package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Q
import graft.functions.Similarity
import graft.sources.Tables

/** Approximate-nearest-neighbor surface over the `embeddings` table
  * (BASELINE.json north star): brute-force cosine top-k as the exact
  * baseline, and a random-hyperplane LSH-bucketed variant as the scale path.
  *
  * Scale design: brute force is O(N×Q) — fine when the query set is small
  * and broadcast (as here: corpus×broadcast(queries), no shuffle of the
  * corpus). The LSH variant buckets both sides by sign-bit codes so the join
  * is a bucket equi-join; recall trades off with bucket bits. Norms are
  * computed once per row, not once per pair.
  */
object SimilaritySearch {

  /** q35 — brute-force cosine top-k: for each query vector (vec_id < 8),
    * the 5 nearest other vectors by cosine, ties broken by vec_id. */
  val q35BruteForceTopK: Q = Q(
    "q35_ann_bruteforce",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.toDoubleArray(col("embedding")).as("emb"))
        .withColumn("nrm", Similarity.norm(col("emb")))
      val queries = e.select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("nrm").as("q_nrm"))
        .filter(col("q_id") < 8)
      val scored = e.join(broadcast(queries), col("vec_id") =!= col("q_id"))
        .withColumn("cosine",
          Similarity.cosinePre(Similarity.dot(col("emb"), col("q_emb")),
            col("nrm"), col("q_nrm")))
      scored
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id").asc))
          .cast("long"))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cosine"), col("rank"))
    },
    Some("""WITH e AS (
      |  SELECT vec_id, embedding::DOUBLE[] AS emb,
      |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |  FROM embeddings),
      |q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm FROM e WHERE vec_id < 8),
      |scored AS (
      |  SELECT q.q_id, e.vec_id AS neighbor_id,
      |         list_dot_product(e.emb, q.q_emb) / (e.nrm * q.q_nrm) AS cosine
      |  FROM e JOIN q ON e.vec_id <> q.q_id)
      |SELECT q_id, neighbor_id, cosine, rank FROM (
      |  SELECT q_id, neighbor_id, cosine,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
      |           ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
      |  FROM scored) r
      |WHERE rank <= 5""".stripMargin))

  /** The 4 sign-projection hyperplanes for q36, as explicit constants so the
    * SAME coefficient literals appear in the Spark plan and the generated
    * oracle SQL (Double.toString round-trips, so both engines parse the
    * identical double and the sequential dot products match bitwise). */
  private[operators] val lshPlanes: Seq[Array[Double]] =
    (0 until 4).map { p =>
      Array.tabulate(64)(d => ((((d + 1) * (2 * p + 3)) % 7) - 3) / 3.0)
    }

  /** q36 — LSH-bucketed ANN: 4 fixed hyperplanes give a 4-bit sign code;
    * neighbors are searched only within the query's bucket (a bucket
    * equi-join — the 100 TB path vs the brute cross product). Fully
    * oracle-checked thanks to the literal planes. */
  val q36LshTopK: Q = Q(
    "q36_ann_lsh",
    (s, dir) => {
      def code(embCol: org.apache.spark.sql.Column) =
        lshPlanes.zipWithIndex.map { case (plane, p) =>
          when(Similarity.dot(embCol, typedLit(plane)) > 0, lit(1 << p)).otherwise(lit(0))
        }.reduce(_ + _)
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), Similarity.toDoubleArray(col("embedding")).as("emb"))
        .withColumn("nrm", Similarity.norm(col("emb")))
        .withColumn("bucket", code(col("emb")))
      val qside = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"),
          col("nrm").as("q_nrm"), col("bucket").as("q_bucket"))
      e.join(broadcast(qside),
          col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
        .withColumn("cosine",
          Similarity.cosinePre(Similarity.dot(col("emb"), col("q_emb")),
            col("nrm"), col("q_nrm")))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id").asc))
          .cast("long"))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id").as("neighbor_id"), col("bucket").cast("long").as("bucket"),
          col("cosine"), col("rank"))
    },
    Some {
      def planeSql(plane: Array[Double]) = plane.mkString("[", ", ", "]")
      val bucketSql = lshPlanes.zipWithIndex.map { case (plane, p) =>
        s"(CASE WHEN list_dot_product(emb, ${planeSql(plane)}) > 0 THEN ${1 << p} ELSE 0 END)"
      }.mkString(" + ")
      s"""WITH e AS (
         |  SELECT vec_id, embedding::DOUBLE[] AS emb,
         |         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
         |  FROM embeddings),
         |b AS (SELECT vec_id, emb, nrm, $bucketSql AS bucket FROM e),
         |q AS (SELECT vec_id AS q_id, emb AS q_emb, nrm AS q_nrm, bucket AS q_bucket
         |      FROM b WHERE vec_id < 8),
         |scored AS (
         |  SELECT q.q_id, b.vec_id AS neighbor_id, CAST(b.bucket AS BIGINT) AS bucket,
         |         list_dot_product(b.emb, q.q_emb) / (b.nrm * q.q_nrm) AS cosine
         |  FROM b JOIN q ON b.bucket = q.q_bucket AND b.vec_id <> q.q_id)
         |SELECT q_id, neighbor_id, bucket, cosine, rank FROM (
         |  SELECT q_id, neighbor_id, bucket, cosine,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY q_id
         |           ORDER BY cosine DESC, neighbor_id ASC) AS BIGINT) AS rank
         |  FROM scored) r
         |WHERE rank <= 5""".stripMargin
    })

  /** q37 — IVF-style ANN: a coarse quantizer (here: per-label centroids,
    * computed distributively via posexplode + per-dimension avg) partitions
    * the corpus; each query probes its 2 nearest centroids and searches only
    * those inverted lists. The probe join is broadcast (centroids are tiny);
    * the list search shuffles on the centroid id. Double-mean centroids are
    * aggregation-order-dependent → rows-only check; `SimilaritySpec` pins
    * recall against the brute-force baseline. */
  val q37IvfTopK: Q = Q(
    "q37_ann_ivf",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), Similarity.toDoubleArray(col("embedding")).as("emb"))
        .withColumn("nrm", Similarity.norm(col("emb")))
      // centroid per label: elementwise mean (64 dims → tiny result)
      val centroids = e
        .select(col("label"), posexplode(col("emb")).as(Seq("d", "x")))
        .groupBy(col("label"), col("d")).agg(avg(col("x")).as("cx"))
        .groupBy(col("label"))
        .agg(transform(array_sort(collect_list(struct(col("d"), col("cx")))), s => s.getField("cx"))
          .as("cemb"))
        .withColumn("cnrm", Similarity.norm(col("cemb")))
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("nrm").as("q_nrm"))
      // probe: 2 nearest centroids per query
      val probed = queries.join(broadcast(centroids), lit(true))
        .withColumn("c_cos", Similarity.cosinePre(
          Similarity.dot(col("q_emb"), col("cemb")), col("q_nrm"), col("cnrm")))
        .withColumn("c_rank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("c_cos").desc, col("label").asc)))
        .filter(col("c_rank") <= 2)
        .select(col("q_id"), col("q_emb"), col("q_nrm"), col("label"))
      // search only the probed inverted lists
      probed.join(e, Seq("label"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cosine", Similarity.cosinePre(
          Similarity.dot(col("emb"), col("q_emb")), col("nrm"), col("q_nrm")))
        .withColumn("rank", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id").asc))
          .cast("long"))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id").as("neighbor_id"), col("label").cast("long").as("probed_label"),
          col("cosine"), col("rank"))
    },
    None)

  val all: Seq[Q] = Seq(q35BruteForceTopK, q36LshTopK, q37IvfTopK)
}
