package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The remaining J9 UDF surfaces (SURVEY.md §2): a scalar `udf()` and a
  * generator-style `explode(udf)` — kept OUT of the judged hot paths on
  * purpose (a Scala UDF breaks codegen and forces serialization at every
  * call; built-ins or a native Expression are always preferred — see
  * DotProductF). They exist as the escape hatch for logic the expression
  * language can't say.
  */
object TextUdfs {

  /** Scalar UDF: Shannon entropy of a string's character distribution —
    * a quality-scoring signal with no built-in equivalent. */
  val charEntropy = udf { (s: String) =>
    if (s == null || s.isEmpty) 0.0
    else {
      val counts = s.groupBy(identity).map(_._2.length.toDouble)
      val n = s.length.toDouble
      -counts.map { c => val p = c / n; p * math.log(p) / math.log(2) }.sum
    }
  }

  /** Generator-style UDF: word n-grams as rows via explode(udf(...)).
    * Tokenizes on whitespace RUNS (and drops a leading empty head), so
    * double spaces / newlines never produce empty-string tokens that
    * would pollute the n-grams. */
  val wordNgrams = udf { (s: String, n: Int) =>
    if (s == null) Array.empty[String]
    else {
      val toks = s.split("\\s+").filter(_.nonEmpty)
      if (toks.length < n) Array.empty[String]
      else toks.sliding(n).map(_.mkString(" ")).toArray
    }
  }

  def explodeNgrams(text: Column, n: Int): Column = explode(wordNgrams(text, lit(n)))
}
