package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic byte-pair-encoding tokenizer — train + encode, the
  * first-class subword step every LLM data pipeline ends in (counting
  * whitespace tokens approximates budgets; packing and context-length
  * decisions want REAL token ids).
  *
  * Determinism contract (both engines replay it exactly):
  *   - pre-tokens are whitespace-split words restricted to
  *     `^[a-z0-9]+$` (makes every symbol SQL-literal-safe and keeps
  *     the two-space separator representation unambiguous; the corpus
  *     tables are lowercase words, so nothing real is dropped — a
  *     production vocabulary would widen the class and the machinery
  *     is unchanged);
  *   - training operates on the word-TYPE table (word, freq) — the
  *     classic BPE formulation — so corpus-sized work is exactly ONE
  *     (word)-keyed aggregate up front; every merge round touches only
  *     the vocabulary-sized type table;
  *   - merge selection is a TOTAL order: (pair count DESC, left ASC,
  *     right ASC) — ASCII-binary string comparison in both engines;
  *   - a word's segmentation state is its symbols each wrapped in
  *     single spaces (`"cat"` → `" c  a  t "`): applying merge (l, r)
  *     is then ONE literal `replace(state, " l  r ", " lr ")` — both
  *     engines scan left-to-right non-overlapping, which IS BPE's
  *     leftmost-first rule ("aaa" + (a,a) → ["aa","a"]);
  *   - applying each merge ONCE in rank order is a fixpoint: a merge
  *     creates adjacencies only WITH its new symbol (never between two
  *     older symbols), and no earlier merge's operands can equal a
  *     later merge's output, so no earlier pattern ever reappears.
  *     Encoding is therefore a stateless chain of `numMerges` literal
  *     replaces — one whole-stage-codegen'd projection, no joins, no
  *     shuffles, no state.
  *
  * 100 TB shape: train = one corpus aggregate + R vocabulary-sized
  * rounds (each one narrow groupBy on fixed-width pair keys + a 1-row
  * driver collect — the IvfIndex centroid pattern: model parameters,
  * not data, cross the driver); encode = map-side projection with the
  * merge table as plan literals + one broadcast vocab join for ids.
  * The per-round body is plan-audited via [[IterTrace]] ("bpe_merge").
  */
object Bpe {

  /** A trained tokenizer: ordered merges + the base alphabet. Ids:
    * alphabet symbols get 0..|A|−1 in lexicographic order, merge of
    * rank r (1-based) gets |A|+r−1 — deterministic and replayable. */
  final case class Model(alphabet: Seq[String],
      merges: Seq[(String, String, Long)]) {
    require(alphabet == alphabet.sorted && alphabet.distinct == alphabet,
      "alphabet must be sorted and distinct")
    def vocab: Seq[(String, Long)] =
      alphabet.zipWithIndex.map { case (s, i) => (s, i.toLong) } ++
        merges.zipWithIndex.map { case ((l, r, _), i) =>
          (l + r, (alphabet.size + i).toLong) }
  }

  /** Word-type table (word, freq) over the whitespace pre-tokens that
    * pass the `[a-z0-9]+` contract — the ONE corpus-sized pass. */
  def wordFreqs(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(col(textCol)), "\\s+")).as("word"))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** `"cat"` → `" c  a  t "`: every symbol wrapped in its own spaces,
    * so symbol boundaries stay unambiguous as merges build multi-char
    * symbols. */
  def initialState(word: Column): Column =
    regexp_replace(word, "(.)", " $1 ")

  /** One merge application — literal replace, leftmost-first
    * non-overlapping in both engines. */
  def applyMerge(state: Column, l: String, r: String): Column =
    replace(state, lit(s" $l  $r "), lit(s" $l$r "))

  /** Adjacent symbol pairs of each state, freq-weighted — the round's
    * counting frame. All native: split + posexplode + element_at. */
  private def pairFrame(states: DataFrame): DataFrame =
    states
      .select(col("freq"),
        split(expr("substring(state, 2, length(state) - 2)"), "  ").as("syms"))
      .select(col("freq"), col("syms"),
        posexplode(col("syms")).as(Seq("i", "lhs")))
      .filter(col("i") < size(col("syms")) - 1)
      .select(col("freq"), col("lhs"),
        element_at(col("syms"), col("i") + 2).as("rhs"))
      .groupBy(col("lhs"), col("rhs")).agg(sum(col("freq")).as("cnt"))

  /** Train `numMerges` merges over `docs(textCol)`. Returns the model;
    * the loop checkpoints the type-table state per round and routes
    * the round body through [[IterTrace]] like every other iterative
    * operator. Requires the corpus to still have at least one adjacent
    * pair at every round (i.e. `numMerges` below the corpus's merge
    * capacity Σ(|word|−1) over types) — a silent early stop would
    * diverge from the oracle's fixed unroll, so running dry throws. */
  def train(spark: SparkSession, docs: DataFrame, textCol: String,
      numMerges: Int, checkpointEvery: Int = 8): Model = {
    require(checkpointEvery >= 1, "checkpointEvery >= 1")
    val words = wordFreqs(docs, textCol).localCheckpoint()
    val alphabet = words
      .select(explode(split(col("word"), "")).as("sym"))
      .filter(col("sym") =!= "").distinct()
      .collect().map(_.getString(0)).toSeq.sorted // ≤36 by the pre-token contract
    var states = words
      .withColumn("state", initialState(col("word")))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String, Long)]
    var rank = 1
    while (rank <= numMerges) {
      val best = pairFrame(states)
        .orderBy(desc("cnt"), col("lhs"), col("rhs"))
        .limit(1).collect() // 1 row: the model parameter, not data
      require(best.nonEmpty,
        s"BPE ran out of pairs at merge $rank/$numMerges — corpus too " +
          "small for the requested vocabulary")
      val (l, r, c) =
        (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
      merges += ((l, r, c))
      // Unlike the graph loops, the loop-carried state here is a PURE
      // PROJECTION (a chain of literal replaces over the checkpointed
      // type table) — no joins, no shuffles — so re-computing a few
      // chained replaces per round is cheaper than a materialization
      // round-trip per merge. Checkpoint every `checkpointEvery`
      // merges instead: plan depth stays bounded, per-round map work
      // stays O(checkpointEvery), and the per-merge barrier is the
      // (unavoidable) best-pair collect alone. Values are unaffected —
      // checkpoint placement never changes the arithmetic.
      states = IterTrace.record("bpe_merge",
        states.withColumn("state", applyMerge(col("state"), l, r)))
      if (rank % checkpointEvery == 0) states = states.localCheckpoint()
      rank += 1
    }
    Model(alphabet, merges.result())
  }

  /** Segmentation state of ANY word under the trained merges — a
    * stateless chain of literal replaces in rank order (the fixpoint
    * argument in the object doc): pure map-side, fully codegen'd. */
  def encodeState(word: Column, model: Model): Column =
    model.merges.foldLeft(initialState(word)) {
      case (acc, (l, r, _)) => applyMerge(acc, l, r) }

  /** Encode documents to token-id sequences: (id, pos, token,
    * token_id), pos = 0-based position over the doc's whole token
    * stream. Scale shape: split → per-word encode chain (map-side) →
    * posexplode → one BROADCAST join against the ≤|vocab| id table;
    * the only window is per-document (never global). Pre-tokens
    * outside the `[a-z0-9]+` contract are dropped exactly as training
    * dropped them. */
  def encode(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, model: Model): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vocabDf = spark.createDataFrame(model.vocab)
      .toDF("token", "token_id")
    val w = Window.partitionBy(col(idCol)).orderBy(col("widx"), col("j"))
    docs
      .select(col(idCol),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("widx", "word")))
      .filter(col("word").rlike("^[a-z0-9]+$"))
      .withColumn("_st", encodeState(col("word"), model))
      .select(col(idCol), col("widx"),
        posexplode(split(expr("substring(_st, 2, length(_st) - 2)"), "  "))
          .as(Seq("j", "token")))
      .join(broadcast(vocabDf), Seq("token"))
      .withColumn("pos", row_number().over(w).cast("long") - 1)
      .select(col(idCol), col("pos"), col("token"), col("token_id"))
  }
}
