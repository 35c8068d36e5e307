package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** Array combinatorics shared by the pair-blocking queries. */
object ArrayFns {

  /** All ordered pairs (earlier, later) from a SORTED array column,
    * as structs with the given field names — the C(k,2) local pair
    * expansion both the co-purchase edge build (GraphOps.q139) and
    * the source-overlap audit (CurationOps.q131) block on.
    *
    * The index arithmetic is the subtle part and the reason this is
    * ONE helper: `transform`'s lambda index is 0-based while
    * `slice`'s start is 1-based, so the strictly-later suffix of
    * element i starts at position i + 2; `slice` clamps an over-long
    * length, so the array's own size is a safe length bound.
    */
  def sortedPairs(arr: String, f1: String, f2: String): Column =
    expr(s"flatten(transform($arr, (x, i) -> " +
      s"transform(slice($arr, i + 2, size($arr)), y -> struct(x AS $f1, y AS $f2))))")
}
