package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.api.Canon
import graft.operators.TextQueries

/** Non-ASCII / empty-doc robustness for the text family's shared spellings
  * (VERDICT r09 #2): the fixture corpus is pure ASCII today, but `events.ts`
  * has already flipped physical format once across driver rounds, so every
  * per-character / per-token spelling must hold code-point (NOT byte)
  * semantics the day a fixture regen ships non-ASCII text. Each expectation
  * below was REPLAYED against DuckDB 1.0 (the oracle engine) on the same
  * micro inputs — these are the oracle's answers, not guesses:
  *
  *   - `length`/`char_length` count CODE POINTS ('aé😀' → 3, not 7 bytes
  *     and not 4 JVM UTF-16 units);
  *   - `substring(s, i, n)` addresses code points (substr('aé😀xyz',2,3) =
  *     'é😀x'), with graceful overrun;
  *   - the per-character iteration `explode(transform(seq1(char_length),
  *     substr(i, 1)))` (q216/q64c) yields exactly the code-point list and
  *     NO rows for an empty doc — where `split(text, "")` yields [""] for
  *     empty text (1 row vs the oracle's 0), the divergence that keeps
  *     per-char iteration on this spelling; the same test RE-MEASURES
  *     split-by-empty-pattern itself, which on Spark 4.1.2 splits code
  *     points, not the bytes r08's note claimed;
  *   - the trigram spelling seq1(length − 2) + substr(i, 3) (q150/q157)
  *     emits code-point trigrams and nothing for docs shorter than 3;
  *   - `split(text, " ")` tokenization yields [""] for an empty doc on
  *     BOTH engines (DuckDB string_split('', ' ') = ['']) — the q124/q64
  *     "empty doc has n_tokens 1" convention;
  *   - the q219 chunker and q222 periodicity helpers stay total (one
  *     whole-doc chunk / no-period row) on empty and non-ASCII docs.
  *
  * Byte semantics are LOAD-BEARING (and correct) only at: q70/q66's
  * md5/sha2 over `cast(text as binary)` (content hashing hashes UTF-8
  * bytes on both engines), q176's Deflater (compression is over bytes by
  * definition), and q91/q207's opaque binary payloads — none of which
  * iterate characters.
  */
class TextRobustnessSpec extends SparkSpec {

  import spark.implicits._

  private val micro = Seq(
    (0L, ""), // empty doc: the oracle's range() emits no char rows
    (1L, "aé😀"), // 3 code points, 4 UTF-16 units, 7 UTF-8 bytes
    (2L, "héllo wörld héllo"), // non-ASCII inside tokens
    (3L, "😀😀😀😀 x 😀😀😀😀"), // astral plane (surrogate pairs in JVM)
    (4L, " ")) // whitespace-only

  private def docs = micro.toDF("doc_id", "text")

  private val perChar =
    explode(transform(Canon.seq1(char_length($"text")),
      i => $"text".substr(i, lit(1))))

  test("length and substring count code points, matching the oracle") {
    val row = docs.filter($"doc_id" === 1)
      .select(length($"text"), char_length($"text"),
        substring(concat($"text", lit("xyz")), 2, 3),
        substring($"text", 3, 200))
      .head()
    assert(row.getInt(0) == 3, "length('aé😀') must be 3 code points")
    assert(row.getInt(1) == 3)
    assert(row.getString(2) == "é😀x", "substring must address code points")
    assert(row.getString(3) == "😀", "substring overrun must clamp")
  }

  test("per-character iteration: code points out, no rows for empty docs") {
    val got = docs.select($"doc_id", perChar.as("ch")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getString(1)).toList)
      .toMap
    assert(!got.contains(0L), "empty doc must emit NO char rows (oracle range)")
    assert(got(1L) == List("a", "é", "😀"))
    assert(got(3L).count(_ == "😀") == 8, "astral chars iterate whole")
    assert(got(4L) == List(" "))
    // the hazard this spelling replaces, RE-MEASURED here (this spec
    // corrected the r08 folklore): on Spark 4.1.2 split(text, "") DOES
    // split code points ('aé😀' → 3 pieces, not 7 bytes) — but it still
    // yields [''] for an empty doc where the oracle's substr loop emits
    // no rows, so the seq1+substr spelling remains the only oracle-safe
    // per-char iteration. If either measurement shifts on a Spark
    // upgrade, these asserts fire and the call sites get re-audited.
    val pieces = docs.filter($"doc_id" === 1)
      .select(split($"text", "")).head().getSeq[String](0).toList
    assert(pieces == List("a", "é", "😀"),
      s"split(text, '') semantics changed: $pieces")
    val emptySplit = docs.filter($"doc_id" === 0)
      .select(split($"text", "")).head().getSeq[String](0).toList
    assert(emptySplit == List(""),
      "split('', '') = [''] — the 1-row-vs-0-rows oracle divergence that " +
        "keeps per-char iteration on the seq1+substr spelling")
  }

  test("trigram spelling emits code-point trigrams, nothing under width 3") {
    def trigrams(s: String): List[String] = {
      val d = Seq((1L, s)).toDF("doc_id", "text")
        .select($"doc_id", lower($"text").as("txt"))
      d.select(explode(transform(Canon.seq1(length($"txt") - 2),
          i => $"txt".substr(i, lit(3)))).as("tg"))
        .collect().map(_.getString(0)).toList
    }
    assert(trigrams("HÉLLO") == List("hél", "éll", "llo"),
      "code-point trigrams over lowered non-ASCII (oracle-replayed)")
    assert(trigrams("hé").isEmpty, "sub-width docs emit no trigrams")
    assert(trigrams("").isEmpty)
    assert(trigrams("😀x😀") == List("😀x😀"))
  }

  test("tokenization: empty doc yields [''] on both engines; non-ASCII tokens survive") {
    val toks = docs
      .select($"doc_id", split(lower($"text"), " ").as("toks")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
    assert(toks(0L) == List(""),
      "split('', ' ') = [''] — matches DuckDB string_split('', ' ')")
    assert(toks(4L) == List("", ""),
      "whitespace-only doc: two empty tokens, same as string_split")
    assert(toks(2L) == List("héllo", "wörld", "héllo"))
  }

  test("q219 chunker and q222 periodicity stay total on empty/non-ASCII docs") {
    // empty doc: one whole-doc chunk (1, 1, 1, 1) — replayed against the
    // oracle's recursive CTE (n = len(['']) = 1, no candidates)
    val chunks = TextQueries.semanticChunkRowsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(chunks.filter(_._1 == 0L).toList == List((0L, 1L, 1L, 1L, 1L)))
    assert(chunks.filter(_._1 == 1L).toList == List((1L, 1L, 1L, 1L, 1L)),
      "a one-token doc is one chunk regardless of char width")
    val per = TextQueries.periodicityOf(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(per.keySet == micro.map(_._1).toSet,
      "every doc (incl. empty) must get a periodicity row")
    assert(per(0L) == 0L, "empty doc: no period candidates → best_period 0")
    assert(per(3L) == 2L, "'😀😀😀😀 x 😀😀😀😀' repeats at token period 2")
  }

  test("q248 mojibake repair: planted positives repaired, clean controls " +
      "untouched, replacement-density gate fires (production SQL)") {
    // drive the EXACT production detect/repair chain (mojiScoreSql) over
    // planted adversarial strings — the r12-verdict done-criterion
    val cases = Seq(
      (0L, "s0", "Itâ€™s a â€œtestâ€œ â€“ fine"), // all four token kinds
      (1L, "s1", "clean ascii text stays"), // clean control
      (2L, "s2", "caf" + "Ã©" + " menu"), // Ã© → é
      (3L, "s3", "a" + ("�" * 5)), // dense replacement chars (5 of 6)
      (4L, "s4", "x" + ("y" * 198) + "�"), // 1 of 200 → under the 1% gate
      (5L, "s5", "pÃ©â€™â€œq"), // stacked tokens repair independently
      // adversarial ordering case: the left-dq repair EMITS “, which with
      // the preceding â€ forms the en-dash PATTERN — the en-dash repair
      // runs first (m4-before-m2), so repair output is never re-repaired
      (6L, "s6", "xâ€â€œy"))
    cases.toDF("doc_id", "source", "raw").createOrReplaceTempView("moji_in")
    val got = spark.sql(TextQueries.mojiScoreSql("moji_in"))
      .collect().map(r => r.getLong(0) -> r).toMap
    def fixed(id: Long) = got(id).getString(got(id).fieldIndex("fixed"))
    def moji(id: Long) = got(id).getInt(got(id).fieldIndex("moji_chars"))
    def repl(id: Long) = got(id).getInt(got(id).fieldIndex("repl_ct"))
    def len(id: Long) = got(id).getInt(got(id).fieldIndex("len_raw"))
    assert(fixed(0L) == "It’s a “test“ – fine", fixed(0L))
    assert(moji(0L) == 8, "four 3→1 repairs recover 2 code points each")
    assert(fixed(1L) == "clean ascii text stays" && moji(1L) == 0 &&
      repl(1L) == 0, "clean control must be untouched")
    assert(fixed(2L) == "café menu" && moji(2L) == 1)
    assert(repl(3L) == 5 && repl(3L) * 100 > len(3L),
      "dense replacement chars must trip the drop gate")
    assert(repl(4L) == 1 && repl(4L) * 100 <= len(4L),
      "sparse replacement chars stay under the 1% keep gate")
    assert(fixed(5L) == "pé’“q", fixed(5L))
    assert(fixed(6L) == "xâ€“y",
      "repair output must never be re-repaired (a half-token stays visible)")
    assert(repl(0L) == 0 && moji(3L) == 0)
  }
}
