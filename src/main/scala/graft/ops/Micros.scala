package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The library-wide exact integral ratio idiom, shared across op files. */
private[graft] object Micros {
  /** `floor(x · 1e6 / d)` in pure Long arithmetic, 0 when the
    * denominator is 0 — order-free under any partial-aggregation split
    * (floats aggregate order-dependently; integers don't). The final
    * division is the `div` INTEGRAL divide (the numerator is an exact
    * multiple of `d` after the pmod subtraction, so truncation is exact)
    * — a double `/` there would round for numerators above 2^53 and
    * come out one micro below the oracle's exact BIGINT `//`. Exact for
    * every representable long numerator. */
  def ratio(x: Column, d: Column): Column =
    when(d === 0, 0L).otherwise {
      val s = x.cast("long") * 1000000L
      call_function("div", s - pmod(s, d), d)
    }
}
