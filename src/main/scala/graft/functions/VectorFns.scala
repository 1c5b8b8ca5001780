package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns (SURVEY.md §2.9
  * M1/M4 + the beyond-reference similarity-search operators).
  *
  * Everything is a sequential left-to-right fold (`aggregate` over
  * `zip_with`) rather than a parallel aggregate: per-row work inside
  * codegen, no shuffle, and — critically for the oracle gate — the same
  * addition order as the DuckDB mirror, so doubles match bit-for-bit.
  * Elements are cast to double before multiplying so products are exact.
  *
  * The reference computes cosine with sklearn on the driver
  * (reference utils/metrics.py:4, models/item_cf_model.py:158-161);
  * here it's a Catalyst expression usable on executors at any scale.
  */
object VectorFns {

  /** Σ aᵢ·bᵢ via the native codegen expression (graft.plans.FloatVectorDot)
    * — bit-identical to the sequential fold, but a primitive loop inside
    * whole-stage codegen instead of interpreted lambdas. */
  def dot(a: Column, b: Column): Column =
    graft.plans.FloatVectorDot.dot(a, b)

  /** Reference implementation of [[dot]] as a higher-order fold; kept for
    * differential testing against the native expression. */
  def dotFold(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Σ aᵢ·wᵢ against a literal plane/centroid vector. */
  def dotLit(a: Column, w: Array[Double]): Column =
    graft.plans.FloatVectorDot.dot(a, typedLit(w))

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; NaN-free for the zero vector (returns 0). */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b); val na = norm2(a); val nb = norm2(b)
    when(na === 0.0 || nb === 0.0, lit(0.0)).otherwise(d / (na * nb))
  }

  /** Squared L2 distance to a literal vector (for IVF assignment). */
  def sqDistLit(a: Column, w: Array[Double]): Column =
    aggregate(
      zip_with(a, typedLit(w), (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Squared L2 distance between two vector columns (left-to-right
    * fold, mirrored by [[VectorSql.sqDist]]). */
  def sqDist(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) =>
        (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, x) => acc + x)

  /** Per-vector symmetric int8 quantization: scale = max|xᵢ|/127, code =
    * round(xᵢ/scale) ∈ [−127, 127] — the 4× footprint lever that turns a
    * float32 corpus into a tinyint corpus for billion-vector ANN (rerank
    * the shortlist against the float originals). Zero vectors get zero
    * codes and scale 0. The pre-round ratio is r6-rounded so the HALF_UP
    * boundary is engine-stable (same guard as every other float gate).
    * Returns struct<scale double, codes array<tinyint>>. */
  def quantizeI8(a: Column): Column = {
    val maxabs = array_max(transform(a, x => abs(x.cast("double"))))
    // pair each element with the (once-per-row) maxabs via array_repeat
    // instead of referencing the array_max subtree inside the lambda —
    // the latter re-scans the whole vector per element (O(d²)/row on the
    // corpus-wide quantization path)
    val codes = zip_with(a, array_repeat(maxabs, size(a)), (x, m) =>
      when(m === 0.0, lit(0))
        .otherwise(round(graft.core.Cross.r6(x.cast("double") / (m / lit(127.0)))))
        .cast("tinyint"))
    struct(
      graft.core.Cross.r6(maxabs / lit(127.0)).as("scale"),
      codes.as("codes"))
  }

  /** Dequantize [[quantizeI8]] output back to doubles (codeᵢ · scale). */
  def dequantizeI8(q: Column): Column =
    transform(q.getField("codes"), c => c.cast("double") * q.getField("scale"))

  /** Cosine over int8 code vectors. The per-vector scales CANCEL in the
    * cosine (cos of dequantized = cos of codes), so scoring needs only
    * exact integer sums and one final double division — no float
    * accumulation order to diverge across engines. This is what makes a
    * quantized ANN sweep both 4× smaller AND bit-reproducible. */
  def cosineI8(a: Column, b: Column): Column = {
    val d = aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
      lit(0L), (acc, x) => acc + x)
    val na = aggregate(transform(a, x => x.cast("long") * x.cast("long")),
      lit(0L), (acc, x) => acc + x)
    val nb = aggregate(transform(b, x => x.cast("long") * x.cast("long")),
      lit(0L), (acc, x) => acc + x)
    when(na === 0L || nb === 0L, lit(0.0))
      .otherwise(d.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double"))))
  }
}

/** DuckDB mirrors. `a`/`b` are list-typed SQL expressions. */
object VectorSql {
  def dot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"

  def dotLit(a: String, w: Array[Double]): String = {
    val lits = w.mkString("[", ", ", "]")
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i]::DOUBLE * ($lits)[i]))"
  }

  def norm2(a: String): String = s"sqrt(${dot(a, a)})"

  def cosine(a: String, b: String): String = {
    val d = dot(a, b); val na = norm2(a); val nb = norm2(b)
    s"(CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0 ELSE $d / ($na * $nb) END)"
  }

  def sqDistLit(a: String, w: Array[Double]): String = {
    val lits = w.mkString("[", ", ", "]")
    s"list_sum(list_transform(range(1, len($a) + 1), i -> ($a[i]::DOUBLE - ($lits)[i]) * ($a[i]::DOUBLE - ($lits)[i])))"
  }

  def sqDist(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> ($a[i]::DOUBLE - $b[i]::DOUBLE) * ($a[i]::DOUBLE - $b[i]::DOUBLE)))"

  /** Mirrors of [[VectorFns.quantizeI8]]'s scale and codes. */
  def quantScale(a: String): String =
    s"round((list_max(list_transform($a, x -> abs(x::DOUBLE))) / 127.0) + 1e-9, 6)"

  def quantCodes(a: String): String = {
    val maxabs = s"list_max(list_transform($a, x -> abs(x::DOUBLE)))"
    s"""list_transform($a, x -> CASE WHEN $maxabs = 0.0 THEN 0::TINYINT
       | ELSE round(round(x::DOUBLE / ($maxabs / 127.0) + 1e-9, 6))::TINYINT END)""".stripMargin.replace("\n", "")
  }

  /** Mirror of [[VectorFns.cosineI8]] (exact integer sums, one division). */
  def cosineI8(a: String, b: String): String = {
    val d = s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i]::BIGINT * $b[i]::BIGINT))"
    val na = s"list_sum(list_transform($a, x -> x::BIGINT * x::BIGINT))"
    val nb = s"list_sum(list_transform($b, x -> x::BIGINT * x::BIGINT))"
    s"(CASE WHEN $na = 0 OR $nb = 0 THEN 0.0 ELSE $d::DOUBLE / (sqrt($na::DOUBLE) * sqrt($nb::DOUBLE)) END)"
  }
}
