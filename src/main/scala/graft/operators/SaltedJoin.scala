package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for hot keys — the MANUAL skew remedy next to AQE's
  * runtime skew split (SCALING.md: "skewed keys → salting or AQE"): the
  * fact side's key is widened with a deterministic salt in [0, n), and
  * the dimension side is replicated once per salt value, so a key that
  * owns most of the fact table spreads across n shuffle partitions
  * instead of sorting in one task. Use it when the skew is KNOWN ahead
  * of time (a hot routing key, a null-heavy foreign key) and you want
  * the plan fixed at authoring time rather than discovered per run —
  * e.g. under a fixed execution-plan contract, or when the hot
  * partition would not fit one executor long enough for AQE to measure
  * it.
  *
  * Cost model, explicit: the dimension shuffles n× its size — salting
  * only pays when |dim| · n ≪ |hot partition|. The salt is
  * `pmod(hash(factRow identity cols…), n)` — deterministic, no RNG, so
  * retried tasks re-derive identical salts and exactly-once holds.
  *
  * Inner and left-outer semantics are IDENTICAL to the unsalted join:
  * every (fact, dim) match pairs under exactly one salt value (the
  * fact row's), and a fact row with no dim match survives left-outer
  * with nulls exactly once.
  */
object SaltedJoin {

  /** @param fact     skewed (large) side
    * @param dim      replicated (small) side — shuffles saltCount× its size
    * @param key      equi-join column present on both sides
    * @param saltCount number of ways to spread each hot key
    * @param joinType "inner" (default) or "left_outer"
    */
  def join(fact: DataFrame, dim: DataFrame, key: String,
           saltCount: Int, joinType: String = "inner"): DataFrame = {
    require(saltCount >= 1, s"saltCount must be >= 1, got $saltCount")
    require(Seq("inner", "left_outer").contains(joinType),
      s"salted join supports inner/left_outer, got $joinType " +
        "(right/full outer would need dim-side dedup after replication)")
    val factCols = fact.columns
    // salt from the whole fact row, not the key: rows of ONE hot key get
    // DIFFERENT salts (that is the point), deterministically per row
    val salted = fact.withColumn("__salt",
      pmod(hash(factCols.map(col): _*), lit(saltCount)))
    val replicated = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(saltCount - 1))))
    val out = salted.join(replicated, Seq(key, "__salt"), joinType)
    out.drop("__salt")
  }
}
