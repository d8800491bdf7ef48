package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** BPE tokenizer APPLY step: encode text against a fixed, ordered merge
  * table — what production tokenizers do at inference time (training the
  * merges is an offline batch job; [[merges]] here is a small table learned
  * offline over the synthetic vocabulary).
  *
  * Algorithm (rank-order merge application): words are split to characters
  * joined by a separator byte; each merge `(a, b)` rewrites every occurrence
  * of `a SEP b` to `ab`, applied in table order. Deterministic, engine
  * portable (literal global replace — identical in DuckDB `replace`), and
  * pure column expressions: the whole encode stays inside whole-stage
  * codegen, no UDF. At 100 TB this is a narrow per-row map — no shuffle.
  */
object Bpe {
  /** Unit separator between not-yet-merged symbols (never occurs in text). */
  val Sep = "\u0001"

  /** Ordered merge table: first-level character pairs, then second-level
    * merges built on their outputs (e.g. th+e, an+d, in+g). */
  val merges: Seq[(String, String)] = Seq(
    "t" -> "h", "i" -> "n", "e" -> "r", "a" -> "n", "r" -> "e",
    "o" -> "n", "a" -> "t", "e" -> "n", "n" -> "d", "e" -> "s",
    "o" -> "r", "t" -> "e", "e" -> "d", "i" -> "s", "a" -> "l",
    "a" -> "r", "s" -> "t", "t" -> "o", "l" -> "e", "r" -> "o",
    "th" -> "e", "an" -> "d", "in" -> "g", "d" -> "at", "a" -> "b",
  )

  /** `text` → separator-joined BPE symbol stream (words stay space-joined;
    * merges never cross the space boundary because patterns contain SEP). */
  def encodeCol(text: Column): Column = {
    val charSeparated = array_join(
      transform(split(text, " "), w => array_join(split(w, ""), Sep)), " ")
    merges.foldLeft(charSeparated) { case (c, (a, b)) =>
      replace(c, lit(a + Sep + b), lit(a + b))
    }
  }

  /** Token count of the encoded stream: SEP count + word count. */
  def tokenCountCol(text: Column): Column = {
    val enc = encodeCol(text)
    (length(enc) - length(replace(enc, lit(Sep), lit("")))
      + size(split(text, " "))).cast("long")
  }

  /** The same encode in DuckDB SQL (generated from the SAME merge table, so
    * the two engines cannot drift). */
  def encodeSql(textExpr: String): String = {
    val charSeparated =
      s"array_to_string(list_transform(string_split($textExpr, ' '), " +
        s"w -> array_to_string(string_split(w, ''), chr(1))), ' ')"
    merges.foldLeft(charSeparated) { case (c, (a, b)) =>
      s"replace($c, '$a' || chr(1) || '$b', '$a$b')"
    }
  }

  def tokenCountSql(textExpr: String): String = {
    val enc = encodeSql(textExpr)
    s"CAST(length($enc) - length(replace($enc, chr(1), '')) " +
      s"+ len(string_split($textExpr, ' ')) AS BIGINT)"
  }
}
