package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed BPE merge training — the tokenizer-construction step of a
  * training-data pipeline (Sennrich et al. 2016, the algorithm behind the
  * GPT-2/LLaMA vocabularies): repeatedly find the most frequent adjacent
  * symbol pair in the corpus and fuse it into a new symbol.
  *
  * The classic trainer's scale trick IS the Spark plan here: BPE statistics
  * depend only on the word-frequency table, never on the corpus layout, so
  * the corpus is touched EXACTLY ONCE (one tokenize → one (word, freq)
  * aggregate) and all subsequent iterations run on the vocabulary table —
  * millions of rows at web scale where the corpus is billions. Each
  * iteration is then:
  *
  *   1. adjacent-pair counts: a higher-order-function transform over each
  *      word's symbol sequence (narrow), weighted by word freq, aggregated
  *      by pair — a vocabulary-sized shuffle;
  *   2. argmax by (count desc, lhs, rhs) via TakeOrderedAndProject — a
  *      per-partition heap, no global sort;
  *   3. merge application: a literal `replace` over the symbol string —
  *      narrow, codegen'd, no shuffle.
  *
  * The ONLY driver-side transfer is step 2's single argmax row per
  * iteration — the merge decision is inherently sequential (merge i+1's
  * counts depend on merge i having been applied), exactly like the
  * per-iteration convergence check in [[Graph.pageRankInt]]. Everything
  * sized by the data stays distributed.
  *
  * Symbol sequences are space-delimited strings with sentinel spaces
  * (" h e l l o "), so applying a merge (l, r) is
  * `replace(seq, " l r ", " lr ")` — left-to-right, non-overlapping, the
  * identical semantics in Spark's `StringReplace` and the DuckDB oracle's
  * `replace`, which is what makes the whole training trajectory (argmax
  * choices included) bit-reproducible cross-engine. Ties on count break by
  * (lhs, rhs) — a total order, so the learned merge table is deterministic.
  *
  * Counts are exact corpus pair frequencies (BIGINT) — no floats anywhere.
  *
  * Reference scope: the reference engine tokenizes only for transport
  * (JSON), not subwords; this operator is part of the LLM-pipeline surface
  * (SURVEY.md north star), not reference parity.
  */
object Tokenizer {

  /** Learned merge table: (step, lhs, rhs, merged, pair_count), one row per
    * iteration, ordered by step. Stops early if no adjacent pair remains.
    */
  def bpeMerges(docs: DataFrame, steps: Int = 8): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    val spark = docs.sparkSession

    // one corpus pass: (word, freq) + initial symbol sequence " c1 c2 ... "
    val words = docs
      .select(explode(TextAnalysis.wordArray(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .withColumn("seq",
        concat(lit(" "), regexp_replace(col("word"), "(.)", "$1 ")))
      .cache()

    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var state = words
    var exhausted = false
    var step = 1
    while (step <= steps && !exhausted) {
      val syms = split(trim(col("seq")), " ")
      val top = state
        .select(col("freq"),
          explode(TextAnalysis.wordGrams(syms, 2)).as("pair"))
        .groupBy(substring_index(col("pair"), " ", 1).as("l"),
          substring_index(col("pair"), " ", -1).as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect() // ONE row: the merge decision (inherently sequential)
      if (top.isEmpty) {
        exhausted = true
      } else {
        val l = top(0).getString(0)
        val r = top(0).getString(1)
        val cnt = top(0).getLong(2)
        merges += Row(step, l, r, l + r, cnt)
        state = state.withColumn("seq",
          replace(col("seq"), lit(s" $l $r "), lit(s" $l$r ")))
        step += 1
      }
    }

    val schema = StructType(Seq(
      StructField("step", IntegerType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1), schema)
      .orderBy(col("step"))
  }

  /** Large-`steps` twin of [[bpeMerges]]: identical merge table, one Spark
    * job TOTAL instead of one per merge step.
    *
    * [[bpeMerges]]'s per-iteration cost is genuinely vocabulary-sized, but
    * each iteration is a driver-coordinated Spark job over a
    * lineage-growing cached frame — fine at steps=8, pathological at a
    * real tokenizer's ~32k merges. The classic trainer shape (every
    * production BPE implementation does this): after the ONE corpus pass,
    * the (word, freq) table is bounded by vocabulary size, not corpus
    * size — collect it once and run the merge loop driver-local. The
    * corpus is still touched exactly once and in parallel; only the
    * vocab (≪ corpus; low millions of short rows at web scale, the same
    * thing single-node trainers hold in RAM) crosses to the driver.
    *
    * Bit-identical to [[bpeMerges]] by construction (TokenizerSpec asserts
    * equality on real and adversarial corpora):
    *
    *   - pair counts: overlapping adjacent pairs weighted by freq —
    *     `explode(wordGrams(syms, 2))`'s exact semantics;
    *   - argmax: (cnt desc, lhs asc, rhs asc); symbols are ASCII-only
    *     ([[TextAnalysis.wordArray]] emits `[a-z0-9]+`), where Java String
    *     order == Spark UTF8String byte order, so the tie-break agrees;
    *   - fuse: replays `replace(seq, " l r ", " lr ")` — left-to-right
    *     NON-OVERLAPPING occurrences of the ORIGINAL string, and because
    *     the 5-char pattern consumes the boundary space after `r`, the
    *     symbol right after a fused pair cannot START the next match:
    *     "aaaa" under (a,a) fuses to [aa, a, a] (not [aa, aa]), and
    *     "aaaaa" to [aa, a, aa]. The scan below shields that symbol.
    */
  def bpeMergesLocal(
      docs: DataFrame, steps: Int = 8, minFreq: Long = 1L): DataFrame = {
    require(steps >= 1, "steps must be >= 1")
    require(minFreq >= 1L, "minFreq must be >= 1")
    val spark = docs.sparkSession

    // the same single corpus pass as bpeMerges — then ONE vocab collect.
    // `minFreq` bounds the DRIVER-side vocab against web-scale hapax
    // noise (typos, hashes, OCR garbage routinely inflate raw "vocab"
    // 10-100× over the real word distribution): words below the floor
    // are dropped BEFORE the collect, so driver memory is bounded by the
    // ≥-minFreq vocabulary. CAVEAT (the standard trainer trade, stated
    // not hidden): dropped words still contributed pairs to the exact
    // corpus counts, so with minFreq > 1 pair counts are computed over
    // the floored vocab only — merge choices are invariant exactly when
    // every argmax margin exceeds the total mass of dropped words
    // (guaranteed for pairs whose counts sit above the floor-mass bound;
    // heavy-tail corpora satisfy this for all early merges). The default
    // minFreq = 1 is bit-identical to [[bpeMerges]] unconditionally —
    // TokenizerSpec asserts both the equality at 1 and the
    // shrinking-collect / stable-merges behavior on a hapax-heavy corpus.
    var vocab: Array[(Array[String], Long)] = docs
      .select(explode(TextAnalysis.wordArray(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))
      .filter(col("freq") >= minFreq)
      .collect()
      .map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))

    val merges = scala.collection.mutable.ArrayBuffer.empty[Row]
    var step = 1
    var exhausted = false
    while (step <= steps && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, freq) <- vocab; j <- 0 until syms.length - 1) {
        val k = (syms(j), syms(j + 1))
        counts.update(k, counts.getOrElse(k, 0L) + freq)
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((l, r), cnt) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        merges += Row(step, l, r, l + r, cnt)
        vocab = vocab.map { case (syms, freq) =>
          if (syms.length < 2) (syms, freq)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                out += l + r
                // StringReplace consumed the boundary space after `r`, so
                // the next symbol cannot start a match — emit it shielded.
                if (i + 2 < syms.length) out += syms(i + 2)
                i += 3
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, freq)
          }
        }
        step += 1
      }
    }

    val schema = StructType(Seq(
      StructField("step", IntegerType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false),
      StructField("merged", StringType, nullable = false),
      StructField("pair_count", LongType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges.toSeq, 1), schema)
      .orderBy(col("step"))
  }

  /** Apply a learned merge table to the corpus: encode every document as
    * its BPE symbol sequence and report per-doc subword statistics. This is
    * the ENCODE side of [[bpeMerges]] — the loader-handoff measurement
    * ("how many tokens is my corpus under this vocabulary?") that prices
    * every context-window/packing decision downstream.
    *
    * 100 TB shape: the merge table is tiny (k rows, driver-held) — each
    * merge is folded into the per-row expression chain as a literal
    * `replace`, so the whole encode is ONE narrow codegen'd projection over
    * the corpus: no join, no shuffle, no per-row interpretation. Per-doc
    * outputs only (subword count, fused-symbol count, encoded fingerprint) —
    * the full symbol sequence never needs to leave the expression unless the
    * caller keeps it.
    *
    * Encoding semantics: merges apply in learned order ACROSS THE WHOLE
    * document's word sequence (each word encoded independently — word
    * boundaries are hard, as in [[bpeMerges]]'s training representation).
    */
  def bpeEncode(docs0: DataFrame, mergeTable: Seq[(String, String)]): DataFrame = {
    // the per-doc regexp/replace chain is the operator's CPU — fan it
    // out of the scan stage when the source is single-split (r17)
    val docs = Fanout.bySessionCores(
      docs0.select(col("doc_id"), col("text")), col("doc_id"))
    // " w1c1 w1c2 ... | w2c1 ... " — per-word sentinel form, '|' marks word
    // boundaries so no merge can cross words ('|' is outside [a-z0-9]).
    val base = concat(lit(" "),
      concat_ws(" | ",
        transform(TextAnalysis.wordArray(col("text")),
          w => trim(regexp_replace(w, "(.)", "$1 ")))),
      lit(" "))
    val encoded = mergeTable.foldLeft(base) { case (acc, (l, r)) =>
      replace(acc, lit(s" $l $r "), lit(s" $l$r "))
    }
    val syms = filter(split(trim(encoded), " "),
      s => s =!= "|" && s =!= "")
    docs.select(
      col("doc_id"),
      size(TextAnalysis.wordArray(col("text"))).cast("long").as("n_words"),
      size(syms).cast("long").as("n_subwords"),
      size(filter(syms, s => length(s) >= 2)).cast("long").as("n_fused"),
      md5(concat_ws(" ", syms)).as("encoding_md5"))
      .orderBy(col("doc_id"))
  }
}
