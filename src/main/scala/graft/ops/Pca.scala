package graft.ops

import graft.functions.OracleMath
import graft.functions.VectorFunctions.r6
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Principal-component extraction over the embedding corpus — the
  * whitening/compression precursor every embedding pipeline runs
  * before indexing (PCA-truncation and mean-centering drive OPQ-style
  * quantizers and de-biased cosine retrieval).
  *
  * Scale shape (the MLlib `RowMatrix.computePrincipalComponents`
  * shape): the CORPUS-sized work — the dim×dim Gram matrix Xᵀ X — is
  * one distributed aggregation whose shuffle is at most dim² cells
  * per task (map-side partial aggregation collapses each partition to
  * ≤ dim² rows before the exchange, asserted in PlanSpec); the
  * eigen-solve then runs on dim² = 4,096 scalars driver-side, exactly
  * like k-means keeps k·dim centroid traffic on the driver
  * ([[KMeansVec.fit]]). Nothing corpus-sized ever reaches the driver.
  *
  * Determinism/oracle: Gram cells are decimal-bridged (§8.5 — r6 the
  * per-row product, exact DECIMAL(38,6) sum, order-free); the power
  * iteration's 64-element folds run in fixed ascending index order on
  * the driver, mirrored by DuckDB `list_sum(list(... ORDER BY ...))`
  * (the same sequential-fold convention the cosine kernel uses); the
  * iterate is r6-rounded between steps so both engines walk identical
  * doubles end to end. */
object Pca {
  import Tables.t

  /** Fixture embedding dimensionality (embeddings.parquet, TESTDATA). */
  val Dim = 64

  /** Fixed power-iteration count — like [[KMeansVec.Iters]], a fixed
    * unrollable count instead of a convergence test keeps the oracle
    * replayable as plain CTEs. */
  val Iters = 3

  /** Driver-side twin of the column `r6`: Spark's `round(x, 6)` on
    * DoubleType is BigDecimal HALF_UP (= DuckDB's round-half-away),
    * and `+ 0.0` collapses −0.0 the same way `r6` does. */
  private def r6d(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue() + 0.0

  /** The distributed Gram aggregation: (i, j) → Σ_rows x_i·x_j as a
    * bridged exact sum. dim² rows per input row out of the double
    * posexplode is pure map-side CPU; the exchange carries only the
    * ≤ dim² partially-aggregated cells per task. */
  private[graft] def gram(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("i", "xi")), col("embedding"))
      .select(col("i"), col("xi"), posexplode(col("embedding")).as(Seq("j", "xj")))
      .groupBy(col("i"), col("j"))
      .agg(OracleMath.dsum(
        r6(col("xi").cast("double") * col("xj").cast("double"))).as("g"))

  /** Dominant principal component of the embedding Gram matrix via
    * [[Iters]] power-iteration steps: per dimension index `d`, the
    * component `pc1` and the eigenvalue estimate `lambda` (the final
    * pre-normalization vector norm, constant across rows). */
  def embedPcaPower(s: SparkSession, dir: String): DataFrame = {
    val cells = gram(s, dir).collect()
    val G = Array.ofDim[Double](Dim, Dim)
    cells.foreach(r => G(r.getInt(0))(r.getInt(1)) = r.getDouble(2))
    var v = Array.fill(Dim)(1.0 / math.sqrt(Dim.toDouble))
    var lambda = 0.0
    (1 to Iters).foreach { _ =>
      // s = G·v, sequential fold ascending j (oracle: list_sum ORDER BY j)
      val sv = Array.tabulate(Dim) { i =>
        var acc = 0.0
        var j = 0
        while (j < Dim) { acc += G(i)(j) * v(j); j += 1 }
        acc
      }
      var nn = 0.0
      var i = 0
      while (i < Dim) { nn += sv(i) * sv(i); i += 1 }
      lambda = math.sqrt(nn)
      v = sv.map(x => if (lambda == 0.0) 0.0 else r6d(x / lambda))
    }
    import s.implicits._
    v.zipWithIndex
      .map { case (c, d) => (d.toLong, c, r6d(lambda)) }.toSeq
      .toDF("d", "pc1", "lambda")
      .orderBy(col("d"))
  }

  /** Shared CTE chain: bridged Gram, v₀ = 1/√dim, three unrolled
    * (matvec, norm, r6-normalize) steps with ordered list folds
    * standing in for the driver's sequential loops. */
  private val pcaCtes: String = {
    def step(n: Int, prev: String): String =
      s"""s$n AS (
         |  SELECT g.i AS i, list_sum(list(g.g * $prev.v ORDER BY g.j)) AS s
         |  FROM g JOIN $prev ON $prev.i = g.j GROUP BY g.i),
         |n$n AS (SELECT sqrt(list_sum(list(s*s ORDER BY i))) AS n FROM s$n),
         |v$n AS (
         |  SELECT i, CASE WHEN n = 0 THEN 0.0 ELSE round(s / n, 6) + 0 END AS v
         |  FROM s$n, n$n)""".stripMargin
    s"""WITH g AS (
       |  SELECT di.i AS i, dj.j AS j,
       |    CAST(SUM(CAST(round(
       |      CAST(embedding[di.i+1] AS DOUBLE) * CAST(embedding[dj.j+1] AS DOUBLE),
       |      6) AS DECIMAL(38,6))) AS DOUBLE) AS g
       |  FROM embeddings,
       |    UNNEST(range(0, $Dim)) AS di(i), UNNEST(range(0, $Dim)) AS dj(j)
       |  GROUP BY di.i, dj.j),
       |v0 AS (SELECT i, 1.0 / sqrt(${Dim}.0) AS v FROM UNNEST(range(0, $Dim)) AS t(i)),
       |${step(1, "v0")},
       |${step(2, "v1")},
       |${step(3, "v2")}""".stripMargin
  }

  /** Oracle mirror of [[embedPcaPower]]. */
  val embedPcaPowerSql: String =
    s"""$pcaCtes
       |SELECT v3.i AS d, v3.v AS pc1, round(n3.n, 6) + 0 AS lambda
       |FROM v3, n3 ORDER BY d""".stripMargin

  /** The fitted component CONSUMED: per-label statistics of each
    * embedding's projection onto pc1 — the one-number-per-vector
    * compression a mixture monitor or drift detector reads. The
    * projection pass is map-only (the 64 component doubles ride the
    * closure, the corpus never re-shuffles); only the per-label
    * aggregate moves rows. */
  def pcaProjection(s: SparkSession, dir: String): DataFrame = {
    val pc = embedPcaPower(s, dir).orderBy(col("d")).collect()
      .map(_.getDouble(1))
    val projUdf = udf { (emb: Seq[Float]) =>
      // sequential ascending fold, the cosine-kernel convention
      var acc = 0.0
      var i = 0
      while (i < pc.length && i < emb.length) { acc += emb(i).toDouble * pc(i); i += 1 }
      acc
    }
    t(s, dir, "embeddings")
      .select(col("label"), r6(projUdf(col("embedding"))).as("p"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n"),
        r6(OracleMath.davg(col("p"))).as("avg_proj"),
        min(col("p")).as("min_proj"),
        max(col("p")).as("max_proj"))
      .orderBy(col("label"))
  }

  /** Oracle mirror of [[pcaProjection]]: the full power-iteration CTE
    * chain, then an ordered list-comprehension fold per vector. */
  val pcaProjectionSql: String =
    s"""$pcaCtes,
       |pv AS (SELECT list(v ORDER BY i) AS pv FROM v3),
       |proj AS (
       |  SELECT e.label,
       |    round(list_sum([CAST(e.embedding[k+1] AS DOUBLE) * pv.pv[k+1]
       |                    FOR k IN range(0, $Dim)]), 6) + 0 AS p
       |  FROM embeddings e, pv)
       |SELECT label, COUNT(*) AS n,
       |  round(CAST(SUM(CAST(p AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*), 6) + 0 AS avg_proj,
       |  MIN(p) AS min_proj, MAX(p) AS max_proj
       |FROM proj GROUP BY label ORDER BY label""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "embed_pca_power" -> (embedPcaPower _),
    "pca_projection" -> (pcaProjection _))

  val oracles: Map[String, String] = Map(
    "embed_pca_power" -> embedPcaPowerSql,
    "pca_projection" -> pcaProjectionSql)
}
