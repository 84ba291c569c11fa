package graft.text

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Fuzzy string matching via deletion-neighborhood blocking (FastSS):
  * entity canonicalization / spell-variant linking over corpus-scale
  * vocabularies, where the naive all-pairs Levenshtein join is O(|V|²·L²)
  * and impossible.
  *
  * Blocking theorem: if edit-distance(a, b) ≤ k, every edit operation in
  * the alignment touches ≤ 1 position on each side, so deleting those
  * positions yields a COMMON string reachable by ≤ k deletions from both.
  * Candidates are therefore an equi-join on the ≤ k-deletion variants —
  * full recall guaranteed — followed by an exact `levenshtein` verify
  * (shared variants can over-approximate: deleting different positions
  * admits pairs up to distance 2k).
  *
  * Cost: O(|V| · L^k) index rows instead of O(|V|²) comparisons; the join
  * is an ordinary hash join on the variant string that AQE can re-plan.
  * The exact verify keeps emitted pairs precise, mirroring the df-capped
  * n-gram Jaccard and LSH candidate stages elsewhere in `graft.dedup`.
  */
object FuzzyJoin {

  /** All strings reachable by deleting up to 2 characters (incl. the word
    * itself), distinct. O(L²) variants per word. */
  def deletionVariants2(w: Column): Column = {
    val L = length(w)
    def del1(s: Column, i: Column): Column =
      concat(s.substr(lit(1), i), s.substr(i + lit(2), length(s)))
    val d0 = array(w)
    val d1 = transform(sequence(lit(0), L - 1), i => del1(w, i))
    // delete positions i < j (0-based in the original): removing j first
    // leaves i unshifted
    val d2 = flatten(transform(sequence(lit(1), L - 1), j =>
      transform(sequence(lit(0), j - 1), i => del1(del1(w, j), i))))
    val empty = array().cast("array<string>")
    array_distinct(concat(d0,
      when(L >= 1, d1).otherwise(empty),
      when(L >= 2, d2).otherwise(empty)))
  }

  /** Word pairs with edit distance ≤ 2 from a single-column vocabulary
    * DataFrame. Output: (wa, wb, ed) with wa < wb.
    *
    * Skew note: very short words collapse into tiny variants ("" is a
    * universal bucket for all length ≤ 2 words) — on corpus-scale
    * vocabularies filter the vocab to length ≥ 3 first (shorter pairs are
    * trivially within distance 2 of each other anyway), or let AQE split
    * the hot buckets. */
  def editDistancePairs2(vocab: DataFrame, word: Column): DataFrame = {
    // two projections: aliasing `word` to "w" in the SAME select that
    // re-references it would resolve as a lateral column alias (explode
    // over LCA is unsupported). The pins are load-bearing: the vocabulary
    // exchange above this point is a few hundred KB, which AQE would
    // coalesce to one partition — serializing the O(L²) variant explode,
    // the candidate join fan-out, AND the levenshtein verify that all
    // execute in this stage (measured 128 s → 12 s at sf1m). Round-robin,
    // NOT keyed on the word: a keyed repartition matches the incoming
    // hashpartitioning from the caller's vocabulary distinct, so the
    // planner elides it as redundant and the coalesce returns. The second
    // pin keeps the join probe itself at full width (the index exchange
    // is small enough for AQE to under-provision).
    val idx = graft.operators.Fanout.pin(
      graft.operators.Fanout.pin(vocab.select(word.as("__w0")))
        .select(col("__w0").as("w"),
          explode(deletionVariants2(col("__w0"))).as("__v"))
        .distinct())
    val a = idx.select(col("w").as("wa"), col("__v").as("__va"))
    val b = idx.select(col("w").as("wb"), col("__v").as("__vb"))
    a.join(b, col("__va") === col("__vb") && col("wa") < col("wb"))
      .select("wa", "wb")
      .distinct()
      .withColumn("ed", levenshtein(col("wa"), col("wb")).cast("long"))
      .where(col("ed") <= 2)
  }
}
