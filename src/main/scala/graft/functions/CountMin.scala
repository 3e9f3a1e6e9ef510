package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The Count-Min hash family shared by the batch audit (q279) and the
  * streaming day-sketch maintenance ([[graft.streaming.SketchStream
  * .dayCountMin]]): d = 4 rows × w = 64 counters, row i's cell for key
  * k is ((2i+3)·k + 10007·i) mod P mod 64 — pure BIGINT arithmetic
  * both engines replay bit-equally (the polyhash convention,
  * P = 2³¹−1). One definition so the batch oracle, the stream, and
  * the merge specs can never drift apart.
  */
object CountMin {
  val P: Long = 2147483647L
  val Depth: Int = 4
  val Width: Long = 64L

  /** Counter cell of hash row `i` for key `k` (both BIGINT columns). */
  def cell(k: Column, i: Column): Column =
    ((lit(2L) * i + lit(3L)) * k + i * lit(10007L)) % P % lit(Width)

  /** The exploded row index column 0..Depth-1. */
  def rows: Column = explode(expr("array(0L, 1L, 2L, 3L)"))
}
