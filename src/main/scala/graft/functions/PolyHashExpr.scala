package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Kernel for [[PolyGramHash]]: all k-gram polynomial fingerprints of
  * a token array in one pass of pure integer ops.
  *
  * Two independent 30-bit modular polynomial hashes are computed per
  * token over its Unicode CODE POINTS (h ← h·B + cp + 1 mod M), then
  * combined per k-gram with a second polynomial level, and packed as
  * `g1 · 2³¹ + g2` — a 61-bit fingerprint whose collision rate
  * (~2⁻⁶⁰) matches the md5-derived 56-bit hash it replaces while
  * costing ~6 integer ops per character instead of an md5 compression
  * (~1000 ops per 64-byte block). Code points (not UTF-8 bytes) make
  * the DuckDB mirror exact for ALL text: the oracle folds
  * `unicode(c)` per character with identical modular arithmetic, and
  * every intermediate stays < 2⁶² so BIGINT never overflows in either
  * engine.
  *
  * Like md5, this is deterministic and content-defined — the winnowing
  * guarantee (any shared ≥ w+k−1-token run yields a shared selected
  * fingerprint) only needs hash equality on equal grams, which modular
  * polynomials give exactly.
  */
object PolyHash {
  // per-token level: two (base, modulus) pairs, both moduli < 2^30
  private val M1 = 1000000007L
  private val M2 = 998244353L
  private val B1 = 131L
  private val B2 = 137L
  // gram level: bases < 2^20, so acc·B + h < 2^50 — no overflow
  private val G1 = 1000003L
  private val G2 = 1000033L

  /** Combined 61-bit fingerprint of one string (both hash levels in
    * one call) — the per-token primitive, exposed for spec replays.
    */
  def token(s: String): (Long, Long) = {
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h1 = (h1 * B1 + cp + 1) % M1
      h2 = (h2 * B2 + cp + 1) % M2
      i += Character.charCount(cp)
    }
    (h1, h2)
  }

  // ---- DuckDB oracle twins: THE one copy of the SQL-side recipe ----
  // (winnow, ngram diversity, and the shingle CTE family all
  // interpolate these, so the hash can never drift between queries)

  /** SQL: per-token {'a','b'} hash-struct list over token array expr
    * `tokArr` — the token level of the polynomial fingerprint.
    */
  def thSql(tokArr: String): String =
    s"""list_transform($tokArr, tok -> {
       |      'a': list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))), (h, c) -> (h*$B1 + c + 1) % $M1),
       |      'b': list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(tok, ''), c -> CAST(unicode(c) AS BIGINT))), (h, c) -> (h*$B2 + c + 1) % $M2)
       |    })""".stripMargin

  /** SQL: the packed 61-bit fingerprint of the k-gram at 1-based token
    * offset `j` of a [[thSql]] list named `th`. (The fold runs twice —
    * once per packed half — because DuckDB lambdas cannot bind
    * locals; oracle-side cost only.)
    */
  def gramSql(th: String, j: String, k: Int): String = {
    def fold(field: String) =
      s"list_reduce(list_prepend({'a': CAST(0 AS BIGINT), 'b': CAST(0 AS BIGINT)}, $th[$j:$j+${k - 1}]), " +
        s"(acc, x) -> {'a': (acc.a*$G1 + x.a) % $M1, 'b': (acc.b*$G2 + x.b) % $M2}).$field"
    s"(${fold("a")} * 2147483648 + ${fold("b")})"
  }

  /** Driver-side twin for spec replays: fingerprint of one k-gram. */
  def gramLocal(toks: Seq[String]): Long = {
    var g1 = 0L
    var g2 = 0L
    toks.foreach { t =>
      val (h1, h2) = token(t)
      g1 = (g1 * G1 + h1) % M1
      g2 = (g2 * G2 + h2) % M2
    }
    g1 * 2147483648L + g2
  }

  /** All k-gram fingerprints of `tokens`; fewer than k tokens → empty
    * (matching [[TextFunctions.shingles]]).
    */
  def gramHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val t1 = new Array[Long](n)
    val t2 = new Array[Long](n)
    var i = 0
    while (i < n) {
      val (h1, h2) = token(tokens.getUTF8String(i).toString)
      t1(i) = h1
      t2(i) = h2
      i += 1
    }
    val out = new Array[Long](n - k + 1)
    var j = 0
    while (j <= n - k) {
      var g1 = 0L
      var g2 = 0L
      var p = j
      while (p < j + k) {
        g1 = (g1 * G1 + t1(p)) % M1
        g2 = (g2 * G2 + t2(p)) % M2
        p += 1
      }
      out(j) = g1 * 2147483648L + g2 // g1 · 2³¹ + g2 < 2⁶¹
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** `poly_gram_hash(tokens, k)`: the codegen'd k-gram fingerprint array
  * — the winnowing family's hash stage ([[PolyHash]] for the math).
  * Replaces md5-per-shingle: no shingle string concatenation, no
  * digest; one narrow integer pass per document.
  */
case class PolyGramHash(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "poly_gram_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_gram_hash requires ARRAY<STRING> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    PolyHash.gramHashes(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.gramHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): PolyGramHash =
    copy(child = newChild)
}

object PolyGramHash {
  /** Column wrapper: `polyGramHash(tokensCol, k)`. */
  def polyGramHash(c: Column, k: Int): Column = {
    import org.apache.spark.sql.graft.shims
    shims.column(PolyGramHash(shims.expression(c), k))
  }
}
