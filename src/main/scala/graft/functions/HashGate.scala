package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The deterministic sampling/partitioning gate shared by p06/p07 and the
  * streaming replays (st03/st05): the first two hex digits of
  * `md5(CAST(id AS string))` compared against a hex threshold — `'10'`
  * keeps ~6 %, `'40'` ~25 %, per 256ths. md5 of the decimal id string is
  * bit-identical across engines, so a gated subset is exactly
  * reproducible in the DuckDB oracle; both the Column form and the SQL
  * fragment live HERE so Spark and oracle can never drift. */
object HashGate {

  /** Two-hex-digit md5 prefix of the decimal id. */
  def prefix(id: Column): Column = substring(md5(id.cast("string")), 1, 2)

  /** Gate at a fixed rate: true for ~(0xHH/256) of ids. */
  def apply(id: Column, hexLt: String): Column = prefix(id) < hexLt

  /** Gate against a per-row threshold column (stratified rates). */
  def lt(id: Column, threshold: Column): Column = prefix(id) < threshold

  /** Deterministic shard id in [0, n) from the same two-hex-digit md5
    * prefix (n must divide evenly into 256 for uniform shards; any
    * n ≤ 256 is valid). Content-addressed sharding: re-running the
    * assignment on any engine reproduces it bit-identically. */
  def shard(id: Column, n: Int): Column = {
    require(n > 0 && n <= 256, s"shard count $n out of [1, 256]")
    (conv(prefix(id), 16, 10).cast("int") % n).cast("int")
  }

  /** Seeded full md5 hex of the decimal id — the permutation key for the
    * deterministic training-order shuffle (p11): changing the seed
    * re-deals the whole permutation, while any engine re-derives the same
    * order from (seed, id) alone. */
  def seededHex(id: Column, seed: String): Column =
    md5(concat_ws(":", lit(seed), id.cast("string")))

  /** DuckDB fragment equivalent to [[seededHex]]. */
  def sqlSeededHex(idExpr: String, seed: String): String =
    s"md5('$seed:' || CAST($idExpr AS VARCHAR))"

  /** DuckDB fragment equivalent to [[shard]]. */
  def sqlShard(idExpr: String, n: Int): String =
    s"CAST(CAST('0x' || ${sqlPrefix(idExpr)} AS INT) % $n AS INT)"

  /** DuckDB fragment computing [[prefix]]. */
  def sqlPrefix(idExpr: String): String =
    s"substr(md5(CAST($idExpr AS VARCHAR)), 1, 2)"

  /** DuckDB fragment equivalent to [[apply]]. */
  def sql(idExpr: String, hexLt: String): String =
    s"${sqlPrefix(idExpr)} < '$hexLt'"
}
