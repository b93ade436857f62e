package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lower, rtrim}

/** MySQL collation-aware key normalization (reference
  * `tests/new_collation`; TiDB "new collation" turns on real
  * utf8mb4_general_ci comparison semantics for keys, which changes
  * what counts as a duplicate at import time).
  *
  * The Spark-native analog is a key EXPRESSION, not an engine mode:
  * normalize the key once, and every groupBy / join / dedup / unique
  * check on the normalized column is collation-aware with no engine
  * changes — and the normalized key shuffles, partitions and
  * broadcast-joins exactly like any other column at 100 TB.
  *
  * Both helpers are codegen'd builtins (lower/rtrim), so the
  * normalization rides whole-stage codegen on the scan.
  */
object Collation {

  /** `utf8mb4_general_ci` sort key: simple (non-locale, non-expanding)
    * case fold, plus PAD SPACE semantics — MySQL collations compare
    * strings as if right-padded with spaces, so trailing spaces never
    * distinguish keys.
    */
  def generalCiKey(c: Column): Column = lower(rtrim(c))

  /** `utf8mb4_bin` with PAD SPACE (the pre-8.0 default binary
    * collation): byte comparison, but trailing spaces still ignored.
    */
  def binPadKey(c: Column): Column = rtrim(c)
}
