package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Edit-distance similarity join (entity resolution / fuzzy record
  * matching) — find all pairs of rows whose string key is within a small
  * edit distance, WITHOUT the O(n²) all-pairs comparison.
  *
  * Blocking is the deletion neighborhood (the FastSS / SymSpell family):
  * every string emits itself plus each single-character deletion as a
  * candidate key. For edit distance <= 1 this is LOSSLESS —
  *  - substitution at position i: both strings share the delete-i key;
  *  - insertion/deletion: the shorter string IS a deletion key of the
  *    longer —
  * so candidate generation is a linear scan emitting len+1 keys per row
  * (the shingling shape: map-side explode, shuffle by key), the same-key
  * self-join touches only bucket-mates, and an exact `levenshtein` verify
  * removes the distance-2 collisions. No all-pairs join exists anywhere,
  * so the plan survives 100x: cost is candidate volume, which the key
  * structure bounds (bucket = strings one edit apart at one position).
  * The k>1 generalization (k-deletion neighborhoods) multiplies keys by
  * O(len^k) — beyond k≈2 prefer the q-gram + length-filter family.
  */
object FuzzyJoin {

  /** All unordered pairs with `levenshtein(s_a, s_b) <= 1` (including
    * exact duplicates at distance 0), as (id_a, id_b, dist) with
    * id_a < id_b. Ids must be numerically ordered-comparable. */
  /** The deletion-neighborhood blocking keys of each row: (id, s, key),
    * distinct (equal-character runs collapse to one key). del_pos 0 keeps
    * the string itself; i>0 deletes character i. */
  private[graft] def deletionKeys(df: DataFrame, idCol: String, strCol: String): DataFrame =
    df.select(F.col(idCol).as("id"), F.col(strCol).as("s"))
      .select(F.col("id"), F.col("s"),
        F.explode(F.sequence(F.lit(0), F.length(F.col("s")))).as("del_pos"))
      .select(F.col("id"), F.col("s"),
        F.when(F.col("del_pos") === 0, F.col("s"))
          .otherwise(F.expr("concat(substring(s, 1, del_pos - 1), substring(s, del_pos + 1, length(s)))"))
          .as("key"))
      .distinct()

  /** Candidate pairs sharing a key -> exact levenshtein <= 1 verify.
    * Inputs are two keyed frames; `ordered` keeps only id_a < id_b (set
    * false for cross-corpus probes where ids come from disjoint spaces). */
  private[graft] def verifyPairs(a: DataFrame, b: DataFrame, ordered: Boolean): DataFrame = {
    val la = a.select(F.col("key"), F.col("id").as("id_a"), F.col("s").as("s_a"))
    val lb = b.select(F.col("key"), F.col("id").as("id_b"), F.col("s").as("s_b"))
    val joined = la.join(lb, "key")
    val scoped = if (ordered) joined.filter(F.col("id_a") < F.col("id_b"))
      else joined.filter(F.col("id_a") =!= F.col("id_b"))
    scoped
      .select("id_a", "id_b", "s_a", "s_b").distinct() // dedup multi-key hits pre-verify
      .withColumn("dist", F.levenshtein(F.col("s_a"), F.col("s_b")))
      .filter(F.col("dist") <= 1)
      .select(F.col("id_a"), F.col("id_b"), F.col("dist").cast("long").as("dist"))
  }

  def editDistance1Pairs(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    val keyed = deletionKeys(df, idCol, strCol)
    verifyPairs(keyed, keyed, ordered = true)
  }
}
