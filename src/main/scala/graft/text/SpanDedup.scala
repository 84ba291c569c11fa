package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Exact duplicated-span removal — the substring-level complement of
  * document-level dedup (the "dedup training data at the span level"
  * recipe): any token position covered by an n-gram that occurs more than
  * once in the corpus is dropped, and the survivors are reassembled in
  * order.
  *
  * Shape (all relational, no per-row state):
  *  1. posexplode to `(doc_id, pos, tok)` — one shuffle by `doc_id` feeds
  *     every window below,
  *  2. n-gram at each start via `lead` windows (no self-join),
  *  3. duplicated grams = one hash aggregate on the gram string,
  *  4. covered positions = duplicated starts × `sequence(pos, pos+n-1)`,
  *  5. keep = left-anti join, reassemble via sorted `collect_list`.
  *
  * The dup aggregate shuffles gram strings — at 100 TB, gram md5 prefixes
  * (8 bytes) replace raw strings on the wire, and a document-frequency cap
  * as in [[graft.dedup.Dedup.ngramJaccardPairs]] bounds the hottest keys;
  * per-doc windows partition by `doc_id`, so parallelism is #docs.
  */
object SpanDedup {

  /** Per-document surviving tokens after corpus-duplicated `n`-gram span
    * removal: `(doc_id, n_kept, kept_md5)` where `kept_md5` fingerprints
    * the reassembled (space-joined) kept-token sequence. Documents whose
    * every token is covered drop out. */
  def removeDuplicatedSpans(docs: DataFrame, idCol: Column, textCol: Column,
                            n: Int): DataFrame =
    removeDuplicatedSpansFromTokens(
      docs.select(idCol.as("doc_id"),
        posexplode(TextFunctions.tokens(lower(textCol))).as(Seq("pos", "tok"))),
      n)

  /** Same operator over a pre-built `(doc_id, pos, tok)` postings table —
    * the shape pipelines share across span removal, phrase search, and
    * skip-gram statistics (compute the explode once, reuse everywhere). */
  def removeDuplicatedSpansFromTokens(toks: DataFrame, n: Int): DataFrame = {
    require(n >= 2, s"span n-gram size must be >= 2, got $n")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    // n-gram starting at pos: tok, lead(1) … lead(n-1); valid start iff the
    // last member exists (concat_ws would silently shorten tail grams and
    // alias them onto real shorter grams — the `ok` gate prevents that)
    val grams = toks
      .withColumn("g", concat_ws(" ",
        col("tok") +: (1 until n).map(i => lead(col("tok"), i).over(w)): _*))
      .withColumn("ok", lead(col("tok"), n - 1).over(w).isNotNull)
    val starts = grams.where(col("ok")).select(col("doc_id"), col("pos"), col("g"))
    val dup = starts.groupBy("g")
      .agg(count(lit(1)).as("cnt")).where(col("cnt") > 1).select("g")
    val covered = starts.join(dup, "g")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (n - 1))).as("pos"))
      .distinct()
    val kept = toks.join(covered, Seq("doc_id", "pos"), "left_anti")
    val agg = kept.groupBy("doc_id").agg(
      count(lit(1)).cast("long").as("n_kept"),
      md5(array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s("tok")), " ")).as("kept_md5"))
    // A fully-deduplicated document must still appear (n_kept = 0, md5 of
    // the empty string) — dropping it made the operator's output EMPTY on
    // a corpus where every span is duplicated (the sf1 verbatim fixture:
    // every 3-gram occurs ≥ 10×), which is precisely when a dedup report
    // matters most, and left the gate row vacuous.
    toks.select(col("doc_id")).distinct()
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_md5"), md5(lit(""))).as("kept_md5"))
  }
}
