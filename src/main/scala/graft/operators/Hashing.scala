package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared engine-portable hash derivations (SURVEY §7.3 discipline). */
private[graft] object Hashing {

  /** md5-derived bucket of a LONG id in [0, mod): the deterministic
    * membership primitive behind train/val/test splits, pack shards,
    * mixture sampling, and increment selection — stable across runs,
    * engines (DuckDB: `('0x' || substring(md5(CAST(id AS VARCHAR)), 1,
    * 15))::BIGINT % mod`), and re-shards. 15 hex chars = 60 bits, inside
    * BIGINT range in both engines.
    */
  def md5Bucket(id: Column, mod: Long): Column =
    conv(substring(md5(id.cast("string").cast("binary")), 1, 15), 16, 10)
      .cast("long") % mod
}
