package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** fn_try's r13 optimization guards the per-row-failing `try_cast(s AS
  * INT)` with a regex screen so the all-fail column stops paying a caught
  * exception per row. The screen is only sound if it NEVER rejects a
  * string try_cast would parse — a rejected string short-circuits to NULL,
  * so any such miss silently changes the op's values. This spec pins the
  * equivalence `when(screen, try_cast) <=> try_cast` over the adversarial
  * string classes: ANSI-trimmable control chars (everything ≤ 0x20, the
  * UTF8String.trimAll set), signs, leading zeros, int32 boundary and
  * overflow, decimals, exponents, unicode digits/signs/spaces, interior
  * whitespace, and the fixture's own priority strings.
  */
class TryCastScreenSpec extends SparkSpec {
  private val screenRe = "^[\\x00-\\x20]*[+-]?[0-9]+[\\x00-\\x20]*$"

  private val nasty: Seq[String] = Seq(
    "1-URGENT", "2-HIGH", "5-LOW", // the fixture's failing class
    "1", "5", "42", "007", "+7", "-7", "+007", "-007",
    " 12", "12 ", " 12 ", "\t12\n", "\r12\u000b", "\u000c12",
    "\u00012", "\u001f12", "\u000012", // ctl chars <= 0x20 trim away
    "2147483647", "-2147483648", // int32 bounds: parse
    "2147483648", "-2147483649", "99999999999999999999", // overflow: NULL
    "1.5", "1.0", ".5", "1.", "1e3", "0x1F", "1_000", "1,000",
    "", " ", "\t", "+", "-", "+-1", "--1", "1-", "12a", "a12", "1 2",
    "١٢٣", "１２３", // unicode digits: ANSI cast rejects
    " 12", "12 ", // non-ASCII spaces are NOT trimmed: reject
    "−1", "＋1", // unicode minus / fullwidth plus: reject
    null
  )

  test("fn_try's int screen never disagrees with bare try_cast") {
    import spark.implicits._
    val df = nasty.toDF("s")
    val bare = expr("try_cast(s AS INT)")
    val screened = when(col("s").rlike(screenRe), expr("try_cast(s AS INT)"))
    val diff = df
      .select(col("s"), bare.as("bare"), screened.as("scr"))
      .filter(!(col("bare") <=> col("scr")))
      .collect()
    assert(diff.isEmpty,
      s"screen diverges from try_cast on: ${diff.mkString(", ")}")
  }

  test("the screen accepts every parsable string (no exception fallback needed for them)") {
    import spark.implicits._
    val df = nasty.toDF("s")
    // any string bare-parsable must pass the screen — otherwise the screen
    // is load-bearing through the NULL path by luck, not by construction
    val leak = df
      .select(col("s"), expr("try_cast(s AS INT)").as("bare"),
        col("s").rlike(screenRe).as("pass"))
      .filter(col("bare").isNotNull && !col("pass"))
      .collect()
    assert(leak.isEmpty, s"parsable strings rejected by screen: ${leak.mkString(", ")}")
  }
}
