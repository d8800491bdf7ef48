package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Util._

/** Text-analysis and deduplication operators for LLM-data pipelines, over the
  * `documents` table. All hash-based signatures use the engine-portable
  * char-fold hash so every operator — including MinHash and SimHash — has a
  * full DuckDB oracle, not a rows-only check.
  *
  * Scale design: everything here is a scan + narrow transforms + one
  * aggregation/self-join on a blocking key. No driver-side collection; LSH
  * banding turns the O(n²) candidate space into bucket-local joins.
  */
object TextOps {
  type Q = (SparkSession, String) => DataFrame

  private val tokens = split(col("text"), " ")

  /** Distinct word-3-gram shingles as rows `(doc_id, shingle)` — built with
    * posexplode + lead() so each token is materialized exactly once (an
    * element_at-in-lambda formulation re-evaluates the split per element).
    * One narrow window shuffle on doc_id; scales linearly in corpus size. */
  /** Distinct word-3-gram shingles per document, as HASHES: the fused
    * [[graft.functions.SpanHashes]] pass (tokenize + char-fold + window
    * fold in one compiled loop per row). Replaced the posexplode+lead
    * window formulation — the only full-corpus shuffle+sort in the shingle
    * family, and the bench's dominant cost at 100× data (dedup_minhash
    * 24.8 s → 1.6 s). Downstream joins carry 8-byte longs instead of
    * 3-token strings. */
  private def spanHashRows(s: SparkSession, dir: String, maxDocId: Option[Int]): DataFrame = {
    val base = maxDocId.foldLeft(table(s, dir, "documents"))((d, m) => d.filter(col("doc_id") < m))
    base.select(col("doc_id"),
        explode(graft.functions.SpanHashes(col("text"), 3)).as("shingle"))
      // ONE corpus exchange, on shingle, BEFORE the dedup (the dedup_spans
      // pattern). Spark still plans the distinct as a partial+final
      // HashAggregate pair — what the repartition changes is WHERE the
      // exchange sits: below both aggregates, so no PRE-SHUFFLE partial
      // agg fills/spills a hash map over the full map input. On this
      // operator's keys that pre-shuffle partial combines ~nothing (pairs
      // are already per-doc-unique), and at the chained sf100 clone
      // regime it degenerated into rehash+spill churn at ~15k rows/s/task
      // — the round-14 killed-battery carrier (SCALING.md). The shingle
      // exchange is also reused by every downstream consumer keyed by
      // shingle (containment's df agg + posting joins, ngram-jaccard's
      // inverted index), so none of them re-shuffles.
      .repartition(col("shingle"))
      .distinct()
  }

  /** Token counting: whitespace tokens + a BPE-ish regex token count. */
  val textTokens: Q = (s, dir) =>
    table(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("ws_tokens"),
        size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).as("re_tokens"),
        length(col("text")).as("n_chars_computed"))
  val textTokensSql =
    """SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens,
      |  len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS re_tokens,
      |  length(text) AS n_chars_computed
      |FROM documents""".stripMargin

  /** Quality scoring: length, mean word length, stopword ratio, distinct-token
    * ratio — the classic cheap text-quality heuristics, rounded for the oracle. */
  val textQuality: Q = (s, dir) => {
    val toks = split(col("text"), " ")
    val stop = array(lit("the"), lit("a"))
    table(s, dir, "documents")
      .select(col("doc_id"), col("text"), toks.as("toks"))
      .select(col("doc_id"),
        length(col("text")).as("n_chars_q"),
        size(col("toks")).as("n_tokens"),
        round(length(col("text")).cast("double") / size(col("toks")), 4).as("mean_tok_len"),
        round(size(filter(col("toks"), t => array_contains(stop, t))).cast("double")
          / size(col("toks")), 4).as("stopword_ratio"),
        round(size(array_distinct(col("toks"))).cast("double") / size(col("toks")), 4)
          .as("distinct_ratio"))
  }
  val textQualitySql =
    """SELECT doc_id, length(text) AS n_chars_q, len(toks) AS n_tokens,
      |  round(CAST(length(text) AS DOUBLE) / len(toks), 4) AS mean_tok_len,
      |  round(CAST(len(list_filter(toks, t -> t IN ('the', 'a'))) AS DOUBLE) / len(toks), 4) AS stopword_ratio,
      |  round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 4) AS distinct_ratio
      |FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents)""".stripMargin

  /** Language-ID heuristic: score = stopword-hit ratio against per-language
    * marker lists; argmax with deterministic tie-break. (A real n-gram model
    * plugs into the same shape.) */
  val textLangid: Q = (s, dir) => {
    val toks = split(col("text"), " ")
    // marker lists over the synthetic vocabulary: deterministic, portable
    val enHits = size(filter(toks, t => t === "the" || t === "a" || t === "fast"))
    val dataHits = size(filter(toks, t => t === "data" || t === "table" || t === "row"))
    table(s, dir, "documents")
      .select(col("doc_id"), col("lang").as("labeled_lang"),
        enHits.as("en_score"), dataHits.as("db_score"))
      .withColumn("guessed",
        when(col("en_score") > col("db_score"), "en")
          .when(col("db_score") > col("en_score"), "db").otherwise("tie"))
  }
  val textLangidSql =
    """SELECT doc_id, lang AS labeled_lang,
      |  len(list_filter(string_split(text,' '), t -> t IN ('the','a','fast'))) AS en_score,
      |  len(list_filter(string_split(text,' '), t -> t IN ('data','table','row'))) AS db_score,
      |  CASE WHEN len(list_filter(string_split(text,' '), t -> t IN ('the','a','fast')))
      |          > len(list_filter(string_split(text,' '), t -> t IN ('data','table','row'))) THEN 'en'
      |       WHEN len(list_filter(string_split(text,' '), t -> t IN ('data','table','row')))
      |          > len(list_filter(string_split(text,' '), t -> t IN ('the','a','fast'))) THEN 'db'
      |       ELSE 'tie' END AS guessed
      |FROM documents""".stripMargin

  /** Document fingerprinting: whole-text rolling hash (content-defined id). */
  val textFingerprint: Q = (s, dir) =>
    table(s, dir, "documents")
      .select(col("doc_id"), charFoldHash(col("text")).as("fingerprint"))
  val textFingerprintSql =
    s"SELECT doc_id, ${charFoldHashSql("text")} AS fingerprint FROM documents"

  /** Model-based quality filtering — the fastText-classifier stage
    * (FineWeb/DCLM shape) that sits between the heuristic gates
    * ([[textGopher]]) and dedup in modern curation stacks: a hashed
    * bag-of-words linear model scored over every document. Inference is
    * the fused [[graft.functions.HashedLinearScore]] kernel (one compiled
    * pass per row, integer weights — see its scaladoc for why not a HOF
    * chain), so the corpus pass is scan → narrow projection: ZERO
    * exchanges, and the plan is unchanged when the pseudo-weights are
    * swapped for a trained vector. */
  val ClassifierBuckets = 4096
  val textClassifyLinear: Q = (s, dir) =>
    table(s, dir, "documents")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        graft.functions.HashedLinearScore(col("text"), ClassifierBuckets).as("score_int"))
      .withColumn("quality_pass", when(col("score_int") > 0, 1L).otherwise(0L))
  val textClassifyLinearSql =
    s"""WITH scored AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |    CAST(list_sum(list_transform(string_split(text, ' '), t ->
       |      ((${charFoldHashSql("t")} % $ClassifierBuckets) * 2654435761) % 2001 - 1000))
       |      AS BIGINT) AS score_int
       |  FROM documents)
       |SELECT doc_id, n_tokens, score_int,
       |  CAST(CASE WHEN score_int > 0 THEN 1 ELSE 0 END AS BIGINT) AS quality_pass
       |FROM scored""".stripMargin

  /** Incremental (new-batch-vs-store) dedup screening — the DAILY-INGESTION
    * shape: a corpus already curated yesterday is a fingerprint STORE, and
    * only today's batch is scored against it, never corpus-vs-corpus.
    * The fingerprint is [[dedupPrefix]]'s blocking key (char-fold of the
    * first 8 tokens), the store key a production near-dup screen
    * materializes; an exact-text fingerprint also works but this corpus
    * contains near-dups, not byte-copies. Fixture split: doc_id <
    * [[IncrementalStoreMax]] is the store, the rest is the batch; each
    * batch doc is annotated with whether its fingerprint already exists
    * and the store's canonical id.
    *
    * Scale shape: the store collapses to distinct fingerprints (min id per
    * fp, map-side combining) and the join moves only 16-byte (fp, id)
    * pairs — the store's TEXT never shuffles. With the fingerprint store
    * pre-bucketed on fp (how a production store is materialized) the
    * batch is the only side that moves. */
  val IncrementalStoreMax = 400
  val dedupIncremental: Q = (s, dir) => {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"),
        charFoldHash(array_join(slice(split(col("text"), " "), 1, 8), " ")).as("fp"))
    val store = docs.filter(col("doc_id") < IncrementalStoreMax)
      .groupBy(col("fp")).agg(min(col("doc_id")).as("store_canonical"))
    docs.filter(col("doc_id") >= IncrementalStoreMax)
      .join(store, Seq("fp"), "left")
      .select(col("doc_id"), col("fp"),
        when(col("store_canonical").isNotNull, 1L).otherwise(0L).as("is_dup"),
        col("store_canonical"))
  }
  val dedupIncrementalSql = {
    val pre = "array_to_string(string_split(text, ' ')[1:8], ' ')"
    s"""WITH fps AS (
       |  SELECT doc_id, ${charFoldHashSql(pre)} AS fp FROM documents),
       |store AS (
       |  SELECT fp, min(doc_id) AS store_canonical FROM fps
       |  WHERE doc_id < $IncrementalStoreMax GROUP BY fp)
       |SELECT b.doc_id, b.fp,
       |  CAST(CASE WHEN s.store_canonical IS NULL THEN 0 ELSE 1 END AS BIGINT) AS is_dup,
       |  s.store_canonical
       |FROM fps b LEFT JOIN store s ON b.fp = s.fp
       |WHERE b.doc_id >= $IncrementalStoreMax""".stripMargin
  }

  /** Exact dedup: group identical texts (hash-groupBy); keep min doc_id as
    * the canonical copy. Map-side partial agg; shuffle only on text hash. */
  val dedupExact: Q = (s, dir) =>
    table(s, dir, "documents")
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_id"), col("n_copies"), length(col("text")).as("text_len"))
  val dedupExactSql =
    """SELECT min(doc_id) AS canonical_id, count(*) AS n_copies, length(text) AS text_len
      |FROM documents GROUP BY text""".stripMargin

  /** N-gram Jaccard near-dup: candidate pairs sharing ≥1 word-3-gram shingle
    * (inverted-index join on shingle), scored |A∩B| / |A∪B| over DISTINCT
    * shingles, thresholded. The shingle join IS the blocking step — no n²
    * pair enumeration. Restricted to doc_id<400 to bound the oracle's cost;
    * the unbounded variant is the bench path. */
  val dedupNgramJaccard: Q = (s, dir) => {
    // persist: the inverted index feeds BOTH sides of the self-join and the
    // per-doc counts — without it the span pipeline recomputes three times.
    // Shingles are HASHED spans ([[graft.functions.SpanHashes]]): one
    // compiled pass, 8-byte join keys, no shingle strings, no window.
    // NOTE (round 19, measured): sh's consumers are AQE stages that
    // materialize CONCURRENTLY, and each racing stage fills the cold cache
    // independently — the spanhashes subtree executes ~2× in task time.
    // An eager count() barrier was tried and REJECTED: the duplicate fill
    // rides otherwise-idle cores (wall-neutral at sf0.1 AND sf1) while the
    // barrier serializes the query (+12-16% wall both SFs). On a saturated
    // cluster the trade can flip — revisit with cluster-level evidence.
    val sh = spanHashRows(s, dir, Some(400)).persist()
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inv = sh.join(counts, Seq("doc_id"))
    val a = inv.select(col("doc_id").as("a_id"), col("n_sh").as("a_n"), col("shingle"))
    val b = inv.select(col("doc_id").as("b_id"), col("n_sh").as("b_n"), col("shingle"))
    a.join(b, Seq("shingle")).filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_n"), col("b_n"))
      .agg(count(lit(1)).as("shared"))
      .withColumn("jaccard",
        round(col("shared").cast("double") / (col("a_n") + col("b_n") - col("shared")), 4))
      .filter(col("jaccard") >= 0.2)
      .select(col("a_id"), col("b_id"), col("shared"), col("jaccard"))
  }
  val dedupNgramJaccardSql = {
    s"""WITH docs AS (
       |  SELECT doc_id, list_distinct(${spansOfThSql(3)}) AS sh
       |  FROM (SELECT doc_id, $tokenHashesSql AS th FROM documents WHERE doc_id < 400)),
       |inv AS (SELECT doc_id, len(sh) AS n_sh, unnest(sh) AS shingle FROM docs)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared,
       |  round(CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)), 4) AS jaccard
       |FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |GROUP BY a.doc_id, b.doc_id, a.n_sh, b.n_sh
       |HAVING round(CAST(count(*) AS DOUBLE) / (a.n_sh + b.n_sh - count(*)), 4) >= 0.2""".stripMargin
  }

  /** MinHash signatures: k=8 permutations over word-3-gram shingle hashes.
    * Signature verified bit-for-bit against DuckDB — possible because the
    * span hash is engine-portable. The whole signature comes from ONE
    * fused pass ([[graft.functions.MinHashSig]]: tokenize + char-fold +
    * window-fold + k running minima in a single compiled loop): no shingle
    * strings, no span array, no explode, and — unlike the previous
    * explode+groupBy formulation — NO exchange at all: the plan is a
    * narrow scan + projection (PlanPropertySpec pins it). Duplicated
    * shingles are harmless: min over the multiset IS min over the set.
    * Docs with fewer than 3 tokens have no shingles → NULL signature →
    * filtered, matching the oracle's `WHERE len(hs) > 0`. */
  val dedupMinhash: Q = (s, dir) => {
    val sig = table(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.MinHashSig(col("text"), 3, MinhashK).as("sig"))
      .filter(col("sig").isNotNull)
    sig.select(col("doc_id") +:
      (0 until MinhashK).map(j => col(s"sig.sig$j").as(s"sig$j")): _*)
  }
  val dedupMinhashSql = {
    val sigs = (0 until MinhashK).map { j =>
      s"list_min(list_transform(hs, h -> (h * ${minhashA(j)} + ${minhashB(j)}) % $MinhashP)) AS sig$j"
    }.mkString(",\n  ")
    s"""SELECT doc_id, $sigs
       |FROM (SELECT doc_id, ${spansOfThSql(3)} AS hs
       |      FROM (SELECT doc_id, $tokenHashesSql AS th FROM documents))
       |WHERE len(hs) > 0""".stripMargin
  }

  /** MinHash-LSH near-dup pairs: 4 bands × 2 rows; docs sharing any band
    * bucket become candidates; candidates verified by signature agreement
    * (≥6/8 matching minhashes ≈ Jaccard ≥ 0.75). Bucket join = the scale
    * path: candidates ∝ collisions, not n². */
  val dedupMinhashLsh: Q = (s, dir) => {
    // Banding via ONE pass over the signatures: explode (band, bucket) pairs,
    // persist the tiny banded table so the self-join does not recompute the
    // shingle→hash pipeline per side (signatures are ~rows×(8 longs) — at
    // 100 TB of text this is still GBs, i.e. cache-able or spillable).
    val sig = dedupMinhash(s, dir)
      .select(col("doc_id"), array((0 until MinhashK).map(j => col(s"sig$j")): _*).as("sigv"))
    val bands = sig.select(col("doc_id"), col("sigv"),
        explode(transform(sequence(lit(0), lit(3)),
          b => struct(b.as("band"),
            concat_ws("_", element_at(col("sigv"), b * 2 + 1), element_at(col("sigv"), b * 2 + 2))
              .as("bucket")))).as("bb"))
      .select(col("doc_id"), col("sigv"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .persist()
    val a = bands.select(col("band"), col("bucket"), col("doc_id").as("a_id"), col("sigv").as("a_sig"))
    val b = bands.select(col("band"), col("bucket"), col("doc_id").as("b_id"), col("sigv").as("b_sig"))
    // scale side-records (Bench-only, zero-cost observe — see BenchStats):
    // same-bucket candidate mass and surviving pair mass, the two numbers
    // every output-bound adjudication of this lane (and of dedup_minhash_cc,
    // whose edge table IS this output) has had to re-derive by hand
    val candidates = graft.core.BenchStats.observed(
      a.join(b, Seq("band", "bucket")).filter(col("a_id") < col("b_id")),
      "dedup_minhash_lsh", "cand", "candidate_pairs" -> count(lit(1)))
    val pairs = candidates
      .select(col("a_id"), col("b_id"),
        size(filter(zip_with(col("a_sig"), col("b_sig"), (x, y) => x === y), b => b))
          .as("sig_agree"))
      .distinct()
      .filter(col("sig_agree") >= 6)
    graft.core.BenchStats.observed(pairs, "dedup_minhash_lsh", "out",
      "output_pairs" -> count(lit(1)))
  }
  val dedupMinhashLshSql = {
    val sigSql = dedupMinhashSql
    s"""WITH sig AS ($sigSql),
       |bands AS (
       |  SELECT doc_id, b.band, CASE b.band
       |      WHEN 0 THEN sig0 || '_' || sig1 WHEN 1 THEN sig2 || '_' || sig3
       |      WHEN 2 THEN sig4 || '_' || sig5 ELSE sig6 || '_' || sig7 END AS bucket,
       |    [sig0, sig1, sig2, sig3, sig4, sig5, sig6, sig7] AS sigv
       |  FROM sig, (SELECT unnest([0,1,2,3]) AS band) b)
       |SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
       |  len(list_filter(list_zip(a.sigv, b.sigv), p -> p[1] = p[2])) AS sig_agree
       |FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |WHERE len(list_filter(list_zip(a.sigv, b.sigv), p -> p[1] = p[2])) >= 6""".stripMargin
  }

  /** Incremental FUZZY dedup — the daily-ingest twin of
    * [[dedupMinhashLsh]] and the fuzzy twin of `dedup_incremental`: a new
    * batch (doc_id ≥ 400) is screened against the accumulated STORE
    * (doc_id < 400) by joining their LSH band buckets; a batch doc whose
    * signature agrees with a store doc on ≥ 6/8 minhashes is a near-dup
    * of the store and reports its earliest store match. Production shape:
    * the store's banded signatures are a persisted index that only ever
    * APPENDS (yesterday's corpus is never re-shingled), the batch side is
    * small, and the join is bucket-local — per-day cost is O(batch), not
    * O(corpus). */
  val dedupMinhashIncremental: Q = (s, dir) => {
    val sig = dedupMinhash(s, dir)
      .select(col("doc_id"), array((0 until MinhashK).map(j => col(s"sig$j")): _*).as("sigv"))
    val bands = sig.select(col("doc_id"), col("sigv"),
        explode(transform(sequence(lit(0), lit(3)),
          b => struct(b.as("band"),
            concat_ws("_", element_at(col("sigv"), b * 2 + 1), element_at(col("sigv"), b * 2 + 2))
              .as("bucket")))).as("bb"))
      .select(col("doc_id"), col("sigv"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      .persist()
    val store = bands.filter(col("doc_id") < 400)
      .select(col("band"), col("bucket"), col("doc_id").as("store_id"), col("sigv").as("s_sig"))
    val batch = bands.filter(col("doc_id") >= 400)
      .select(col("band"), col("bucket"), col("doc_id").as("batch_id"), col("sigv").as("b_sig"))
    batch.join(store, Seq("band", "bucket"))
      .select(col("batch_id"), col("store_id"),
        size(filter(zip_with(col("b_sig"), col("s_sig"), (x, y) => x === y), b => b))
          .as("sig_agree"))
      .distinct()
      .filter(col("sig_agree") >= 6)
      .groupBy(col("batch_id"))
      .agg(min(col("store_id")).as("dup_of"),
        max(col("sig_agree")).as("best_agree"),
        countDistinct(col("store_id")).as("n_matches"))
  }
  val dedupMinhashIncrementalSql = {
    s"""WITH sig AS ($dedupMinhashSql),
       |bands AS (
       |  SELECT doc_id, b.band, CASE b.band
       |      WHEN 0 THEN sig0 || '_' || sig1 WHEN 1 THEN sig2 || '_' || sig3
       |      WHEN 2 THEN sig4 || '_' || sig5 ELSE sig6 || '_' || sig7 END AS bucket,
       |    [sig0, sig1, sig2, sig3, sig4, sig5, sig6, sig7] AS sigv
       |  FROM sig, (SELECT unnest([0,1,2,3]) AS band) b),
       |pairs AS (
       |  SELECT DISTINCT n.doc_id AS batch_id, o.doc_id AS store_id,
       |    len(list_filter(list_zip(n.sigv, o.sigv), p -> p[1] = p[2])) AS sig_agree
       |  FROM bands n JOIN bands o ON n.band = o.band AND n.bucket = o.bucket
       |    AND n.doc_id >= 400 AND o.doc_id < 400)
       |SELECT batch_id, min(store_id) AS dup_of, CAST(max(sig_agree) AS INT) AS best_agree,
       |  count(DISTINCT store_id) AS n_matches
       |FROM pairs WHERE sig_agree >= 6 GROUP BY batch_id""".stripMargin
  }

  /** SimHash (16-bit) over token multiset: per-bit weighted vote of token
    * hashes, assembled into an integer fingerprint. Near-dups share most bits;
    * banding on the byte halves gives the LSH variant.
    *
    * Shape: explode tokens → hash ONCE per token row → 16 sum-aggregates
    * (the minhash shape). The earlier array form projected the hash array
    * into 16 separate `aggregate()` expressions, which CollapseProject
    * inlines — recomputing every token hash 16×. The groupBy gets map-side
    * partial aggregation; one shuffle on doc_id of 16 longs per doc. */
  val dedupSimhash: Q = (s, dir) => {
    val tok = table(s, dir, "documents")
      .select(col("doc_id"), explode(tokens).as("tok"))
      .select(col("doc_id"), charFoldHash(col("tok")).as("h"))
    val bitAggs = (0 until 16).map { i =>
      sum(when(shiftright(col("h"), i) % 2 === 1, 1L).otherwise(-1L)).as(s"w$i")
    }
    val weighted = tok.groupBy(col("doc_id")).agg(bitAggs.head, bitAggs.tail: _*)
    val sim = (0 until 16).map(i =>
      when(col(s"w$i") > 0, lit(1L << i)).otherwise(lit(0L))).reduce(_ + _)
    weighted.select(col("doc_id"), sim.as("simhash"))
  }
  val dedupSimhashSql = {
    val hs = s"list_transform(string_split(text, ' '), t -> ${charFoldHashSql("t")})"
    val ws = (0 until 16).map { i =>
      s"list_sum(list_transform(hs, h -> CASE WHEN (h >> $i) % 2 = 1 THEN 1 ELSE -1 END)) AS w$i"
    }.mkString(",\n  ")
    val sim = (0 until 16).map(i => s"CASE WHEN w$i > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ")
    s"""SELECT doc_id, CAST($sim AS BIGINT) AS simhash FROM (
       |  SELECT doc_id, $ws FROM (SELECT doc_id, $hs AS hs FROM documents))""".stripMargin
  }

  /** Content-hash exact dedup over BINARY payloads (the audio-bytes shape):
    * sha256 of the bytes as the dedup key — cryptographic, collision-safe at
    * 100 TB, and shuffle keys are 32-byte digests instead of whole blobs. */
  val dedupSha256: Q = (s, dir) =>
    table(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .groupBy(sha2(col("payload"), 256).as("digest"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
  val dedupSha256Sql =
    """SELECT sha256(text) AS digest, min(doc_id) AS canonical_id, count(*) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** Dedup clusters: n-gram-Jaccard candidate pairs (doc_id<400, ≥0.2) fed
    * through connected components — every doc gets a canonical id (min id of
    * its duplicate cluster; singletons map to themselves). The oracle
    * recomputes components with a recursive CTE. */
  val dedupClusters: Q = (s, dir) => {
    val edges = dedupNgramJaccard(s, dir)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val nodes = table(s, dir, "documents").filter(col("doc_id") < 400)
      .select(col("doc_id").as("id"))
    graft.operators.ConnectedComponents.run(nodes, edges)
      .select(col("id").as("doc_id"), col("comp").as("canonical_id"))
  }
  val dedupClustersSql =
    s"""WITH RECURSIVE pairs AS (${dedupNgramJaccardSql.replace("\n", "\n  ")}),
       |sym AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |        UNION SELECT b_id, a_id FROM pairs),
       |nodes AS (SELECT doc_id AS id FROM documents WHERE doc_id < 400),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.id)
       |SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id""".stripMargin

  /** ASYMMETRIC near-dup detection — shingle containment C(A→B) =
    * |S(A)∩S(B)| / |S(A)| over the rare-shingle vocabulary: catches a
    * document CONTAINED in a longer one (wire-copy inside a page, quoted
    * post, boilerplate-wrapped article), which symmetric Jaccard dilutes
    * below any threshold. Candidates and evidence both come from posting
    * lists blocked to document frequency 2..10 (the same rare-term blocking
    * as `tfidf_pair_sim`: each list joins ≤ C(10,2) pairs, so candidate
    * volume ∝ distinct terms, never n² docs — and the df cap is exactly
    * what bounds list length at 100 TB). Denominator = A's rare-shingle
    * count, so the score is the containment of A's DISCRIMINATIVE content;
    * ubiquitous (df>10) shingles contribute no evidence by construction.
    * Integer ppm arithmetic — bit-portable. */
  val dedupContainment: Q = (s, dir) => {
    // persist the two reused stages (same discipline as dedupMinhashLsh's
    // banded table): sh feeds the df agg AND the posting join, posting
    // feeds sizes AND both pair-join sides — without the persists the
    // explode+distinct shuffle re-executes once per consumer and the
    // query's wall scales with DAG fan-out instead of data (measured 15×
    // for 10× rows at sf10; linear after)
    val sh = spanHashRows(s, dir, None).withColumnRenamed("shingle", "tok")
      .persist()
    val blocked = sh.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, 10))
      .select(col("tok"))
    val posting = sh.join(blocked, Seq("tok")).persist()
    // the n_rare >= 5 gate applies pre-join (inner join ⇒ result-identical):
    // docs below it shed their sizes rows AND their pairs from the shuffle
    val sizes = posting.groupBy(col("doc_id")).agg(count(lit(1)).as("n_rare"))
      .filter(col("n_rare") >= 5)
    val a = posting.select(col("tok"), col("doc_id").as("a_id"))
    val b = posting.select(col("tok"), col("doc_id").as("b_id"))
    val grouped = a.join(b, Seq("tok")).filter(col("a_id") =!= col("b_id"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("n_common"))
    // candidate/output masses ride the query's own action (bench-only
    // observe nodes — Verify's plan is untouched): the r15 clone-probe
    // adjudication hand-counted these from Verify dumps, the last lane
    // still doing so (round-15 verdict task 4 closed for fuzzy/LSH,
    // round-16 for containment)
    graft.core.BenchStats
      .observed(grouped, "dedup_containment", "cand",
        "candidate_pairs" -> count(lit(1)))
      // necessary-condition pushdown: ppm ≥ 8e5 ∧ n_rare ≥ 5 ⇒ n_common ≥ 4.
      // The pair agg emits ~one group per co-occurrence (overwhelmingly
      // n_common ∈ {1..3}), so this one-liner drops >95% of groups BEFORE
      // the sizes join — without it the join re-shuffles the full pair
      // space and the query's wall is 3× the honest work (measured at sf10)
      .filter(col("n_common") >= 4)
      // (sizes stays a shuffled join: one slim row per doc — broadcast
      // would cap the corpus at driver memory)
      .join(sizes.select(col("doc_id").as("a_id"), col("n_rare")), Seq("a_id"))
      .withColumn("containment_ppm", expr("n_common * 1000000 div n_rare"))
      .filter(col("containment_ppm") >= 800000)
      .select(col("a_id"), col("b_id"), col("n_common"), col("n_rare"),
        col("containment_ppm"))
      .transform(graft.core.BenchStats.observed(_, "dedup_containment", "out",
        "output_pairs" -> count(lit(1))))
  }
  val dedupContainmentSql =
    s"""WITH sh AS (
       |  SELECT DISTINCT doc_id, unnest(${spansOfThSql(3)}) AS tok
       |  FROM (SELECT doc_id, $tokenHashesSql AS th FROM documents)),
       |blocked AS (SELECT tok FROM sh GROUP BY tok HAVING count(*) BETWEEN 2 AND 10),
       |p AS (SELECT sh.doc_id, sh.tok FROM sh JOIN blocked USING (tok)),
       |sizes AS (SELECT doc_id, count(*) AS n_rare FROM p GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
       |  FROM p a JOIN p b ON a.tok = b.tok AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2)
       |SELECT a_id, b_id, n_common, n_rare,
       |  n_common * 1000000 // n_rare AS containment_ppm
       |FROM pairs JOIN sizes ON pairs.a_id = sizes.doc_id
       |WHERE n_rare >= 5 AND n_common * 1000000 // n_rare >= 800000""".stripMargin

  /** Dedup-quality evaluation — the text twin of `ann_recall_eval`: score
    * the MinHash-LSH detector ([[dedupMinhashLsh]], sig_agree ≥ 6 ≈ J ≥
    * 0.75) against exact-Jaccard truth (≥ 0.75 over distinct shingles) on
    * the oracle-bounded slice, emitting tp / precision / recall in integer
    * ppm. This is the loop every production dedup deployment runs before
    * trusting a sketch: a band/width change that silently hurts recall now
    * moves a gated number instead of shipping. One full-outer join of two
    * small pair sets → a single-row aggregate. */
  val dedupRecallEval: Q = (s, dir) => {
    val truth = dedupNgramJaccard(s, dir).filter(col("jaccard") >= 0.75)
      .select(col("a_id"), col("b_id"), lit(1).as("t"))
    val pred = dedupMinhashLsh(s, dir)
      .filter(col("a_id") < 400 && col("b_id") < 400)
      .select(col("a_id"), col("b_id"), lit(1).as("p"))
    truth.join(pred, Seq("a_id", "b_id"), "full_outer")
      .agg(
        // coalesce: an empty corpus yields a zero row, not a null row
        coalesce(sum(when(col("t").isNotNull, 1L).otherwise(0L)), lit(0L)).as("n_truth"),
        coalesce(sum(when(col("p").isNotNull, 1L).otherwise(0L)), lit(0L)).as("n_pred"),
        coalesce(sum(when(col("t").isNotNull && col("p").isNotNull, 1L).otherwise(0L)), lit(0L)).as("tp"))
      .select(col("n_truth"), col("n_pred"), col("tp"),
        when(col("n_pred") > 0, expr("tp * 1000000 div n_pred")).otherwise(0L).as("precision_ppm"),
        when(col("n_truth") > 0, expr("tp * 1000000 div n_truth")).otherwise(0L).as("recall_ppm"))
  }
  val dedupRecallEvalSql =
    s"""WITH truth AS (
       |  SELECT a_id, b_id FROM (${dedupNgramJaccardSql.replace("\n", "\n  ")})
       |  WHERE jaccard >= 0.75),
       |pred AS (
       |  SELECT a_id, b_id FROM (${dedupMinhashLshSql.replace("\n", "\n  ")})
       |  WHERE a_id < 400 AND b_id < 400),
       |c AS (SELECT
       |  (SELECT count(*) FROM truth) AS n_truth,
       |  (SELECT count(*) FROM pred) AS n_pred,
       |  (SELECT count(*) FROM truth JOIN pred USING (a_id, b_id)) AS tp)
       |SELECT n_truth, n_pred, tp,
       |  CASE WHEN n_pred > 0 THEN tp * 1000000 // n_pred ELSE 0 END AS precision_ppm,
       |  CASE WHEN n_truth > 0 THEN tp * 1000000 // n_truth ELSE 0 END AS recall_ppm
       |FROM c""".stripMargin

  /** URL canonicalization dedup — the C4/web-curation page-identity rule:
    * synthesize per-doc URLs with the noise real crawls carry (mixed-case
    * scheme+host, tracking params, fragments, trailing slashes), reduce
    * each to canonical form (lowercase scheme/host, path sans trailing
    * slash, tracking/query/fragment stripped), and group — pages reachable
    * under many dressed-up URLs collapse to one canonical identity. The
    * path keys on doc_id % 300, so distinct documents genuinely collide on
    * canonical URL (the dedup is real, not 1:1). Narrow string transforms
    * + ONE map-side-combining agg — the exact `dedup_exact` shuffle
    * profile with a canonicalization scan in front. */
  val dedupUrl: Q = (s, dir) => {
    val raw = table(s, dir, "documents").select(col("doc_id"), col("lang"), col("source"),
      concat(
        when(col("doc_id") % 2 === 0, "https://").otherwise("HTTPS://"),
        when(col("doc_id") % 3 === 0, upper(col("source"))).otherwise(col("source")),
        lit(".Example.COM/pages/"), (col("doc_id") % 300).cast("string"),
        when(col("doc_id") % 4 === 0, "/").otherwise(""),
        when(col("doc_id") % 5 === 0, concat(lit("?utm_source=feed&utm_campaign=c"),
          (col("doc_id") % 7).cast("string"))).otherwise(""),
        when(col("doc_id") % 6 === 0, "#section-2").otherwise("")).as("url"))
    val canonical = raw.withColumn("canon_url",
      concat(lit("https://"),
        lower(regexp_extract(col("url"), "^[Hh][Tt][Tt][Pp][Ss]://([^/?#]+)", 1)),
        regexp_replace(
          regexp_extract(col("url"), "^[Hh][Tt][Tt][Pp][Ss]://[^/?#]+([^?#]*)", 1),
          "/$", "")))
    canonical.groupBy(col("canon_url"))
      .agg(count(lit(1)).as("n_urls"), min(col("doc_id")).as("canonical_doc"),
        countDistinct(col("lang")).as("n_langs"))
      .filter(col("n_urls") >= 2)
  }
  val dedupUrlSql =
    """WITH raw AS (
      |  SELECT doc_id, lang,
      |    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTPS://' END)
      |    || (CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END)
      |    || '.Example.COM/pages/' || CAST(doc_id % 300 AS VARCHAR)
      |    || (CASE WHEN doc_id % 4 = 0 THEN '/' ELSE '' END)
      |    || (CASE WHEN doc_id % 5 = 0 THEN '?utm_source=feed&utm_campaign=c' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END)
      |    || (CASE WHEN doc_id % 6 = 0 THEN '#section-2' ELSE '' END) AS url
      |  FROM documents),
      |canon AS (
      |  SELECT doc_id, lang,
      |    'https://' || lower(regexp_extract(url, '^[Hh][Tt][Tt][Pp][Ss]://([^/?#]+)', 1))
      |    || regexp_replace(regexp_extract(url, '^[Hh][Tt][Tt][Pp][Ss]://[^/?#]+([^?#]*)', 1), '/$', '')
      |      AS canon_url
      |  FROM raw)
      |SELECT canon_url, count(*) AS n_urls, min(doc_id) AS canonical_doc,
      |  count(DISTINCT lang) AS n_langs
      |FROM canon GROUP BY 1 HAVING count(*) >= 2""".stripMargin

  /** The production fuzzy-dedup pipeline end to end: MinHash-LSH candidate
    * pairs ([[dedupMinhashLsh]] — banded buckets, collisions only, never
    * all-pairs) fed through connected components over the WHOLE corpus —
    * every document gets a canonical id (min doc_id of its near-dup
    * cluster; docs with no signature or no collisions map to themselves).
    * This is the shape large-scale corpus dedup actually runs (shingle →
    * minhash → band → bucket-join → component → keep-one): [[dedupClusters]]
    * demonstrates CC over exact-Jaccard edges on a slice; this one composes
    * the scalable candidate generator with the scalable cluster closure,
    * corpus-wide. Shuffle profile: LSH bucket join ∝ collisions + CC rounds
    * ∝ E(V); nothing quadratic in corpus size. */
  val dedupMinhashCc: Q = (s, dir) => {
    val edges = dedupMinhashLsh(s, dir)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val nodes = table(s, dir, "documents").select(col("doc_id").as("id"))
    graft.operators.ConnectedComponents.run(nodes, edges)
      .select(col("id").as("doc_id"), col("comp").as("canonical_id"))
  }
  val dedupMinhashCcSql =
    s"""WITH RECURSIVE pairs AS (${dedupMinhashLshSql.replace("\n", "\n  ")}),
       |sym AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |        UNION SELECT b_id, a_id FROM pairs),
       |nodes AS (SELECT doc_id AS id FROM documents),
       |reach(id, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT s.dst, reach.r FROM reach JOIN sym s ON s.src = reach.id)
       |SELECT id AS doc_id, min(r) AS canonical_id FROM reach GROUP BY id""".stripMargin

  /** Canonical SELECTION policy on top of the duplicate clusters: keep the
    * highest-quality member (longest text; ties break to the smaller
    * doc_id) — what production curation actually retains, where
    * [[dedupClusters]]'s min-id is just a label. One agg over the cluster
    * map: the argmax is a single `max(struct(len, -id))` with map-side
    * combine, no window and no second shuffle beyond the cluster join.
    * The oracle recomputes the same argmax with a rank window. */
  val dedupClustersKeepbest: Q = (s, dir) => {
    val clusters = dedupClusters(s, dir)
    val docs = table(s, dir, "documents").filter(col("doc_id") < 400)
      .select(col("doc_id"), col("n_chars"))
    clusters.join(docs, Seq("doc_id"))
      .groupBy(col("canonical_id"))
      .agg(count(lit(1)).as("n_members"),
        max(col("n_chars")).as("max_len"),
        max(struct(col("n_chars").as("l"), (-col("doc_id")).as("nid"))).as("best"))
      .select(col("canonical_id"), (-col("best.nid")).as("kept_doc"),
        col("n_members"), col("max_len"))
  }
  val dedupClustersKeepbestSql =
    s"""WITH cl AS (${dedupClustersSql.replace("\n", "\n  ")}),
       |j AS (SELECT cl.doc_id, cl.canonical_id, d.n_chars
       |      FROM cl JOIN documents d USING (doc_id)),
       |r AS (SELECT *, row_number() OVER (PARTITION BY canonical_id
       |        ORDER BY n_chars DESC, doc_id ASC) AS rn FROM j),
       |m AS (SELECT canonical_id, count(*) AS n_members, max(n_chars) AS max_len
       |      FROM j GROUP BY 1)
       |SELECT m.canonical_id, r.doc_id AS kept_doc, m.n_members, m.max_len
       |FROM m JOIN r ON r.canonical_id = m.canonical_id AND r.rn = 1""".stripMargin

  /** The same clusters via the alternating large-star/small-star CC variant
    * ([[graft.operators.ConnectedComponents.runStar]] — O(log n) rounds on
    * ANY graph, the path for pathological diameters where min-label's
    * O(diameter) rounds lose). Same candidate edges, same output contract,
    * same oracle as [[dedupClusters]], so the two formulations are
    * hash-pinned to agree. */
  val dedupClustersStar: Q = (s, dir) => {
    val edges = dedupNgramJaccard(s, dir)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val nodes = table(s, dir, "documents").filter(col("doc_id") < 400)
      .select(col("doc_id").as("id"))
    graft.operators.ConnectedComponents.runStar(nodes, edges)
      .select(col("id").as("doc_id"), col("comp").as("canonical_id"))
  }

  /** Deterministic train/val/test split: bucket = content hash mod 100 →
    * 80/10/10. Content-keyed (not row-keyed) so duplicates land in the same
    * split — the leakage-safe way to split training corpora; fully
    * reproducible across engines and runs. */
  val sampleSplit: Q = (s, dir) => {
    val bucket = pmod(charFoldHash(col("text")), lit(100))
    table(s, dir, "documents")
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("first_doc"))
  }
  val sampleSplitSql = {
    val bucket = s"(${charFoldHashSql("text")} % 100 + 100) % 100"
    s"""SELECT lang,
       |  CASE WHEN $bucket < 80 THEN 'train' WHEN $bucket < 90 THEN 'val' ELSE 'test' END AS split,
       |  count(*) AS n, min(doc_id) AS first_doc
       |FROM documents GROUP BY 1, 2""".stripMargin
  }

  /** Size-bounded shard packing: consecutive docs (in id order) packed into
    * shards capped at ~4 KB of text each via cumulative-sum bucketing — the
    * byte-budget variant of X1's count-based chunking. The running byte total
    * is the scale-safe distributed prefix sum
    * ([[graft.operators.Sharding.cumSum]]) — no single-partition window.
    * All outputs BIGINT on both sides (DuckDB sum(INT) is HUGEINT, which the
    * driver comparator types differently). */
  val shardBySize: Q = (s, dir) => {
    graft.operators.Sharding.cumSum(
        table(s, dir, "documents").select(col("doc_id"), col("n_chars")),
        "doc_id", col("n_chars"), "cum_bytes")
      .withColumn("shard_id", floor((col("cum_bytes") - 1) / 4096).cast("int"))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("shard_bytes"),
        min(col("doc_id")).as("min_doc"))
  }
  val shardBySizeSql =
    """SELECT shard_id, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS shard_bytes, min(doc_id) AS min_doc
      |FROM (
      |  SELECT doc_id, n_chars,
      |    CAST(floor((sum(n_chars) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1) / 4096) AS INT) AS shard_id
      |  FROM documents)
      |GROUP BY shard_id""".stripMargin

  /** BPE tokenization (apply step, fixed merge table — graft.functions.Bpe):
    * per-doc token count, chars-per-token compression ratio, and the first
    * word's segmentation as JSON text. The DuckDB oracle is GENERATED from
    * the same merge table, so the engines cannot drift. */
  val textBpe: Q = (s, dir) => {
    import graft.functions.Bpe
    val firstWord = element_at(split(col("text"), " "), 1)
    table(s, dir, "documents")
      .select(col("doc_id"),
        Bpe.tokenCountCol(col("text")).as("n_bpe"),
        round(length(col("text")).cast("double") / Bpe.tokenCountCol(col("text")), 4)
          .as("chars_per_token"),
        to_json(split(Bpe.encodeCol(firstWord), Bpe.Sep)).as("first_word_tokens"))
  }
  val textBpeSql = {
    import graft.functions.Bpe
    val firstWord = "(string_split(text, ' '))[1]"
    s"""SELECT doc_id, ${Bpe.tokenCountSql("text")} AS n_bpe,
       |  round(CAST(length(text) AS DOUBLE) / ${Bpe.tokenCountSql("text")}, 4) AS chars_per_token,
       |  CAST(to_json(string_split(${Bpe.encodeSql(firstWord)}, chr(1))) AS VARCHAR) AS first_word_tokens
       |FROM documents""".stripMargin
  }

  /** PII redaction: mask emails and phone-shaped tokens, count what was
    * masked (the audit trail) — the training-corpus cleaning staple. PII is
    * synthesized deterministically onto the text so the patterns actually
    * fire; patterns use the regex subset common to Java and RE2. */
  val textRedactPii: Q = (s, dir) => {
    val emailRe = "[a-z0-9.]+@[a-z0-9.]+"
    val phoneRe = "555-[0-9]{4}"
    val withPii = concat(col("text"),
      lit(" contact user"), col("doc_id"), lit("@example.com or 555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
    table(s, dir, "documents").filter(col("doc_id") < 400)
      .select(col("doc_id"), withPii.as("raw"))
      .select(col("doc_id"),
        size(expr(s"regexp_extract_all(raw, '$emailRe', 0)")).as("n_emails"),
        size(expr(s"regexp_extract_all(raw, '$phoneRe', 0)")).as("n_phones"),
        regexp_replace(regexp_replace(col("raw"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("redacted"))
  }
  val textRedactPiiSql =
    """SELECT doc_id,
      |  len(regexp_extract_all(raw, '[a-z0-9.]+@[a-z0-9.]+')) AS n_emails,
      |  len(regexp_extract_all(raw, '555-[0-9]{4}')) AS n_phones,
      |  regexp_replace(regexp_replace(raw, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g'),
      |    '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
      |FROM (SELECT doc_id,
      |        text || ' contact user' || doc_id || '@example.com or 555-' ||
      |        lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
      |      FROM documents WHERE doc_id < 400)""".stripMargin

  /** Text normalization: lowercase, strip punctuation, collapse whitespace —
    * the canonical pre-dedup cleanup pass. */
  val textNormalize: Q = (s, dir) =>
    table(s, dir, "documents").filter(col("doc_id") < 300)
      .select(col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(concat(col("text"), lit("  MIXED.case, punct!"))), "[^a-z0-9 ]", ""),
          " +", " ")).as("normalized"))
  val textNormalizeSql =
    """SELECT doc_id,
      |  trim(regexp_replace(regexp_replace(lower(text || '  MIXED.case, punct!'), '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS normalized
      |FROM documents WHERE doc_id < 300""".stripMargin

  /** Context-window chunking — the step that turns documents into
    * training-window rows: token chunks of size 32 with stride 24 (8-token
    * overlap), via sequence+posexplode — a narrow per-row explode, no
    * shuffle, linear at any corpus size. Chunk count = ⌊(n−1)/stride⌋+1. */
  val textChunk: Q = (s, dir) => {
    val C = 32; val S = 24
    table(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(sequence(lit(0), floor((col("n") - 1) / S).cast("int"))).as(Seq("_p", "chunk_id")))
      .select(col("doc_id"), col("chunk_id"),
        concat_ws(" ", slice(col("toks"), col("chunk_id") * S + 1, lit(C))).as("chunk_text"),
        (least(col("chunk_id") * S + C, col("n")) - col("chunk_id") * S).cast("long").as("n_chunk_tokens"))
  }
  val textChunkSql =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks, len(string_split(text, ' ')) AS n
      |  FROM documents),
      |e AS (SELECT doc_id, toks, n, unnest(range((n - 1) // 24 + 1)) AS chunk_id FROM t WHERE n > 0)
      |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
      |  array_to_string(list_slice(toks, chunk_id * 24 + 1, least(chunk_id * 24 + 32, n)), ' ') AS chunk_text,
      |  CAST(least(chunk_id * 24 + 32, n) - chunk_id * 24 AS BIGINT) AS n_chunk_tokens
      |FROM e""".stripMargin

  /** Stratified deterministic sampling: k=5 docs per language, ranked by the
    * engine-portable content hash (content-keyed → stable across runs and
    * engines, no RNG). The rank≤k filter gets WindowGroupLimit: each map
    * task keeps only its local top-k per stratum before the shuffle, so the
    * low-cardinality partition never sees the full data. */
  val sampleStratified: Q = (s, dir) => {
    val w = Window.partitionBy(col("lang")).orderBy(col("h"), col("doc_id"))
    table(s, dir, "documents")
      .select(col("doc_id"), col("lang"), charFoldHash(col("text")).as("h"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("rk"), col("doc_id"), col("h"))
  }
  val sampleStratifiedSql =
    s"""SELECT lang, rk, doc_id, h FROM (
       |  SELECT lang, doc_id, ${charFoldHashSql("text")} AS h,
       |    row_number() OVER (PARTITION BY lang ORDER BY ${charFoldHashSql("text")}, doc_id) AS rk
       |  FROM documents)
       |WHERE rk <= 5""".stripMargin

  /** Exactly-k uniform corpus sample via deterministic bottom-k: each doc
    * gets a content-keyed priority (the portable hash over "doc_id#text" —
    * unique per row, reproducible across engines/runs, no RNG state), and
    * the k smallest priorities win. Bottom-k over a hash IS a uniform
    * sample (every k-subset equally likely under the hash's uniformity),
    * and it is the distributed form of reservoir sampling with none of the
    * sequential-state problem: the plan is TakeOrderedAndProject — each
    * task keeps a local k-heap, the driver merges P·k rows — so a 100 TB
    * corpus is one narrow scan, zero shuffles, k·partitions driver bytes.
    * (The per-stratum twin is [[sampleStratified]]'s WindowGroupLimit.) */
  val sampleReservoir: Q = (s, dir) => {
    val prio = pmod(
      charFoldHash(concat(col("doc_id").cast("string"), lit("#"), col("text"))),
      lit(1000000007L))
    table(s, dir, "documents")
      .select(col("doc_id"), col("lang"), prio.as("prio"))
      .orderBy(col("prio"), col("doc_id"))
      .limit(100)
  }
  val sampleReservoirSql = {
    val h = charFoldHashSql("CAST(doc_id AS VARCHAR) || '#' || text")
    s"""SELECT doc_id, lang, ($h % 1000000007 + 1000000007) % 1000000007 AS prio
       |FROM documents
       |ORDER BY prio, doc_id LIMIT 100""".stripMargin
  }

  /** Gopher-style quality filter battery (Rae et al. 2021, §A1.1, public):
    * word-count bounds, mean-word-length band, alphabetic-word fraction,
    * stop-word hits — each emitted as a boolean plus the conjunctive keep
    * flag. A narrow scan; the real pipeline would filter on `keep`. */
  val textGopher: Q = (s, dir) => {
    val toks = split(col("text"), " ")
    table(s, dir, "documents")
      .select(col("doc_id"), col("text"), toks.as("toks"), size(toks).as("n_words"))
      .select(col("doc_id"), col("n_words"),
        round((length(col("text")) - col("n_words") + 1).cast("double") / col("n_words"), 4).as("mean_word_len"),
        round(size(filter(col("toks"), t => t.rlike("[a-z]"))).cast("double") / col("n_words"), 4).as("alpha_frac"),
        size(filter(col("toks"), t => t.isin("the", "a", "of", "and", "to"))).as("stop_hits"))
      .withColumn("keep",
        col("n_words").between(5, 100000) && col("mean_word_len").between(2.0, 12.0) &&
          col("alpha_frac") >= 0.8 && col("stop_hits") >= 1)
  }
  val textGopherSql =
    """SELECT doc_id, n_words, mean_word_len, alpha_frac, stop_hits,
      |  (n_words BETWEEN 5 AND 100000 AND mean_word_len BETWEEN 2.0 AND 12.0
      |   AND alpha_frac >= 0.8 AND stop_hits >= 1) AS keep
      |FROM (
      |  SELECT doc_id, len(toks) AS n_words,
      |    round(CAST(length(text) - len(toks) + 1 AS DOUBLE) / len(toks), 4) AS mean_word_len,
      |    round(CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / len(toks), 4) AS alpha_frac,
      |    CAST(len(list_filter(toks, t -> list_contains(['the','a','of','and','to'], t))) AS INT) AS stop_hits
      |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents))""".stripMargin

  /** Top TF-IDF term per document: explode → tf per (doc, term) → df per
    * term → score → top-1. The idf is the RATIONAL surrogate
    * `tf · 1e6 div (df+1)` — integer-exact in both engines; `ln` is not
    * bit-portable across math libraries (same reason the WAV oracle avoids
    * `sin`) and a last-ulp flip would reorder knife-edge ties. Shape: one
    * shuffle on (doc, term), one on term, broadcast-joined df, WindowGroupLimit
    * top-1 — the standard distributed tf-idf plan. */
  val textTfidf: Q = (s, dir) => {
    val docs = table(s, dir, "documents")
    val terms = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    tf.join(df, Seq("term"))
      .withColumn("score", expr("tf * 1000000 div (df + 1)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("score"))
  }
  val textTfidfSql =
    """WITH tf AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |  FROM documents),
      |tfc AS (SELECT doc_id, term, count(*) AS tf FROM tf GROUP BY doc_id, term),
      |dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
      |scored AS (
      |  SELECT tfc.doc_id, tfc.term, tfc.tf, dfc.df, tfc.tf * 1000000 // (dfc.df + 1) AS score,
      |    row_number() OVER (PARTITION BY tfc.doc_id ORDER BY tfc.tf * 1000000 // (dfc.df + 1) DESC, tfc.term) AS rk
      |  FROM tfc JOIN dfc USING (term))
      |SELECT doc_id, term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
      |  CAST(score AS BIGINT) AS score
      |FROM scored WHERE rk = 1""".stripMargin

  /** Benchmark decontamination — the pre-training hygiene step: flag
    * training documents sharing ≥2 word-3-gram shingles with a held-out
    * eval set (here: doc_id < 20 stands in for the benchmark). Shape: the
    * eval shingle set is TINY and the join is an inverted-index probe — at
    * 100 TB the eval shingles broadcast and the corpus streams through a
    * map-side semi-probe; no n² anything. */
  val textDecontaminate: Q = (s, dir) => {
    val sh = spanHashRows(s, dir, None)
    val eval = sh.filter(col("doc_id") < 20).select(col("shingle")).distinct()
    sh.filter(col("doc_id") >= 20)
      .join(broadcast(eval), Seq("shingle"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared")) // spanHashRows is per-doc distinct
      .filter(col("n_shared") >= 2)
  }
  val textDecontaminateSql = {
    s"""WITH sh AS (
       |  SELECT doc_id, unnest(list_distinct(${spansOfThSql(3)})) AS shingle
       |  FROM (SELECT doc_id, $tokenHashesSql AS th FROM documents)),
       |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < 20),
       |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= 20)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
       |FROM tr JOIN ev USING (shingle)
       |GROUP BY doc_id HAVING count(*) >= 2""".stripMargin
  }

  /** Intra-document repetition (the other half of the Gopher battery):
    * duplicate word-3-gram fraction = 1 − distinct/total shingles. High
    * values mark boilerplate/spam. A PURE NARROW SCAN: the span hashes and
    * their distinct count happen inside one projection
    * (`array_distinct(SpanHashes(…))`) — no explode, no shuffle, no join. */
  val textRepetition: Q = (s, dir) =>
    table(s, dir, "documents")
      .select(col("doc_id"),
        (size(split(col("text"), " ")) - 2).cast("long").as("total_sh"),
        size(array_distinct(graft.functions.SpanHashes(col("text"), 3)))
          .cast("long").as("distinct_sh"))
      .filter(col("total_sh") >= 1)
      .select(col("doc_id"), col("total_sh"), col("distinct_sh"),
        round(lit(1.0) - col("distinct_sh") / col("total_sh"), 4).as("rep_frac"))
  val textRepetitionSql = {
    s"""SELECT doc_id, CAST(len(th) - 2 AS BIGINT) AS total_sh,
       |  CAST(len(list_distinct(sp)) AS BIGINT) AS distinct_sh,
       |  round(1.0 - CAST(len(list_distinct(sp)) AS DOUBLE) / (len(th) - 2), 4) AS rep_frac
       |FROM (SELECT doc_id, th, ${spansOfThSql(3)} AS sp
       |      FROM (SELECT doc_id, $tokenHashesSql AS th FROM documents))
       |WHERE len(th) >= 3""".stripMargin
  }

  /** Corpus-wide boilerplate removal (the line-level dedup of CCNet /
    * RefinedWeb, expressed over fixed 8-token blocks — the synthetic corpus
    * is single-line, so token blocks stand in for lines). A block occurring
    * in ≥2 distinct documents is boilerplate; each document reports its
    * block counts and its text re-assembled WITHOUT the boilerplate blocks,
    * in original order.
    *
    * Scale shape: blocks are sliced straight off each row's token array
    * (narrow projection, one block-row explode — never a token-row shuffle;
    * the oracle's list_slice build mirrors it), block-frequency agg with
    * map-side combine on the block HASH, and the boilerplate set — rare by
    * construction — broadcasts back. Order-preserving reassembly is
    * sort_array over (blk, text) structs, never a single-partition
    * window. */
  val textBlockDedup: Q = (s, dir) => {
    // blocks come straight off the token ARRAY (slice per 8-token window,
    // narrow projection + one explode of block rows) — the original
    // token-posexplode → groupBy(doc_id, blk) → collect_list/array_sort
    // re-assembly shuffled every token row just to glue them back together
    // (sf100: 168.0 s → 37.5 s isolated, round-11 sixth-battery audit)
    val blocks = table(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), floor((size(col("t")) - 1) / 8).cast("int")),
          b => array_join(slice(col("t"), b * 8 + 1, lit(8)), " "))).as(Seq("blk", "block_text")))
    // frequency + flagging run on the block HASH (longs through the
    // shuffle/broadcast, not multi-KB block strings); reassembly below is
    // the only consumer that needs the actual text
    val hashed = blocks.withColumn("bh", charFoldHash(col("block_text")))
    val bp = hashed.groupBy(col("bh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("bh"), lit(1).as("is_bp"))
    val cleaned = hashed.join(broadcast(bp), Seq("bh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(when(col("is_bp").isNotNull, 1L).otherwise(0L)).as("n_boilerplate"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("is_bp").isNull, struct(col("blk"), col("block_text"))))),
            x => x.getField("block_text")), " ").as("joined"))
    // NULL exactly when NO block survived (string_agg-over-zero-rows
    // semantics) — a length()==0 test would also null out a legitimately
    // empty surviving block and diverge from the oracle
    cleaned.select(col("doc_id"), col("n_blocks"), col("n_boilerplate"),
      when(col("n_boilerplate") === col("n_blocks"), lit(null).cast("string"))
        .otherwise(col("joined")).as("cleaned_text"))
  }
  val textBlockDedupSql =
    s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |blocks AS (
      |  SELECT doc_id, (s).blk AS blk, (s).block_text AS block_text FROM (
      |    SELECT doc_id, unnest(list_transform(range(0, (len(toks) + 7) // 8),
      |      b -> struct_pack(blk := b,
      |             block_text := array_to_string(list_slice(toks, b*8 + 1, b*8 + 8), ' ')))) AS s
      |    FROM docs)),
      |hashed AS (SELECT doc_id, blk, block_text, ${charFoldHashSql("block_text")} AS bh FROM blocks),
      |bp AS (SELECT bh FROM hashed GROUP BY bh
      |       HAVING count(DISTINCT doc_id) >= 2),
      |flagged AS (SELECT h.doc_id, h.blk, h.block_text,
      |              (bp.bh IS NOT NULL) AS is_bp
      |            FROM hashed h LEFT JOIN bp ON h.bh = bp.bh)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_blocks,
      |  CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_boilerplate,
      |  string_agg(CASE WHEN NOT is_bp THEN block_text END, ' ' ORDER BY blk) AS cleaned_text
      |FROM flagged GROUP BY doc_id""".stripMargin

  /** BM25 retrieval for a fixed 3-term query, top-10 by score. The idf is
    * the raw BM25 odds (N−df+0.5)/(df+0.5) WITHOUT the log — ln is not
    * bit-portable across engines, the odds are monotone in it, and every
    * remaining operation is IEEE +,−,×,÷ (deterministic cross-engine given
    * identical expression shape, which both sides pin explicitly).
    *
    * Scale shape: term-filtered explode (the IN-list prunes before the
    * shuffle), per-(doc,term) tf agg, tiny df/corpus aggregates broadcast
    * back, per-doc score via a FIXED-ORDER per-term sum (no
    * order-nondeterministic double aggregation), global top-10 via
    * TakeOrdered — not a single-partition window. */
  val textBm25: Q = (s, dir) => {
    val qTerms = Seq("data", "table", "scan")
    val docs = table(s, dir, "documents")
    val base = docs.select(col("doc_id"), split(col("text"), " ").as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), explode(col("toks")).as("term"))
    val tf = base.filter(col("term").isin(qTerms: _*))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), min(col("dl")).as("dl"))
    val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpus = docs
      .agg(count(lit(1)).as("n_docs"),
        sum(size(split(col("text"), " "))).as("sum_dl"))
      .select(col("n_docs"), (col("sum_dl").cast("double") / col("n_docs")).as("avgdl"))
    val scored = tf.join(broadcast(dfc), Seq("term"))
      .crossJoin(broadcast(corpus))
      .withColumn("tfd", col("tf").cast("double"))
      .withColumn("idf", (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
      .withColumn("denom",
        col("tfd") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
      .withColumn("score", (col("idf") * (col("tfd") * lit(2.2))) / col("denom"))
    scored.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms_hit"),
        sum(when(col("term") === "data", col("score"))).as("s0"),
        sum(when(col("term") === "table", col("score"))).as("s1"),
        sum(when(col("term") === "scan", col("score"))).as("s2"))
      .withColumn("total",
        coalesce(col("s0"), lit(0.0)) + coalesce(col("s1"), lit(0.0))
          + coalesce(col("s2"), lit(0.0)))
      .orderBy(col("total").desc, col("doc_id"))
      .limit(10)
      .select(col("doc_id"), col("n_terms_hit"), round(col("total"), 4).as("bm25"))
  }
  val textBm25Sql =
    """WITH base AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl,
      |    unnest(string_split(text, ' ')) AS term FROM documents),
      |tfc AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
      |        FROM base WHERE term IN ('data', 'table', 'scan') GROUP BY doc_id, term),
      |dfc AS (SELECT term, count(*) AS df FROM tfc GROUP BY term),
      |corpus AS (
      |  SELECT n_docs, CAST(sum_dl AS DOUBLE) / n_docs AS avgdl FROM (
      |    SELECT count(*) AS n_docs, sum(len(string_split(text, ' '))) AS sum_dl
      |    FROM documents)),
      |scored AS (
      |  SELECT doc_id, term,
      |    ((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
      |      * (CAST(tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
      |      / (CAST(tf AS DOUBLE) + CAST(1.2 AS DOUBLE)
      |          * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * dl / avgdl)) AS score
      |  FROM tfc JOIN dfc USING (term), corpus),
      |perdoc AS (
      |  SELECT doc_id, count(*) AS n_terms_hit,
      |    (coalesce(sum(CASE WHEN term = 'data' THEN score END), CAST(0 AS DOUBLE))
      |     + coalesce(sum(CASE WHEN term = 'table' THEN score END), CAST(0 AS DOUBLE)))
      |     + coalesce(sum(CASE WHEN term = 'scan' THEN score END), CAST(0 AS DOUBLE)) AS total
      |  FROM scored GROUP BY doc_id)
      |SELECT doc_id, CAST(n_terms_hit AS BIGINT) AS n_terms_hit,
      |  round(total, 4) AS bm25
      |FROM perdoc ORDER BY total DESC, doc_id LIMIT 10""".stripMargin

  /** Unigram LM surprise score — the shape of LM-based quality filtering:
    * corpus term frequencies, then per-document mean "surprise" where a
    * token's surprise is the integer-scaled reciprocal frequency
    * floor(1e9 / count). Integer arithmetic throughout, so the per-doc sum
    * is order-free and bit-exact cross-engine (a real LM's −log p is not).
    *
    * Scale shape (round 12): everything term-level rides the (doc, term)
    * TF pre-aggregation — raw token rows never cross the wire. The
    * previous form joined the token EXPLODE (a leaf) against the vocab
    * aggregate on term; a leaf-level static SMJ schedules both children's
    * shuffle maps together, so ~10 tokens/row × corpus rows had already
    * shuffled before AQE could broadcast the runtime-small vocab (the
    * q9_nation_profit trap, measured there 11×). Now: one map-side-
    * combining agg to (doc_id, term, tf) — the only corpus-mass exchange,
    * and it carries distinct PAIRS, not tokens; vocab = a second tiny agg
    * OVER tf (term counts re-derive as sum(tf), reusing the pair
    * exchange); the join sits above an exchange, so AQE converts it to a
    * broadcast in time when the measured vocab is small and demotes when
    * it is not (Heaps-law unbounded — exactly why it carries no hint).
    * surprise_sum = Σ tf·floor(1e9/c) is the same integer per doc. */
  val textLmScore: Q = (s, dir) => {
    // Round 13 measured-negative: a fused per-row tokenize+count kernel
    // (array-of-(term, tf)-structs from one compiled pass, the SpanHashes
    // recipe) was built, oracle-greened, and A/B'd against this explode
    // form INTERLEAVED at sf100 in both orders — warm-equalized it was
    // consistently ~1.5-2× SLOWER (legacy ~33-44 s vs kernel ~53-74 s;
    // SCALING.md round 13). Root cause: ~10-token documents leave almost
    // no repeat mass to pre-count, so the kernel's per-row map, generic
    // struct rows, and codegen-fallback boundary cost more than the
    // per-token explode+hash-agg they replace (split+explode+count is
    // fully whole-stage-codegen'd). The explode form stays; do not
    // re-litigate without longer documents.
    val toks = table(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = toks.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val vocab = tf.groupBy(col("term")).agg(sum(col("tf")).as("c"))
    tf.join(vocab, Seq("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * expr("1000000000 div c")).as("surprise_sum"))
      .withColumn("avg_surprise", expr("surprise_sum div n_tokens"))
  }
  val textLmScoreSql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
      |vocab AS (SELECT term, count(*) AS c FROM toks GROUP BY term)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(1000000000 // c) AS BIGINT) AS surprise_sum,
      |  CAST(sum(1000000000 // c) // count(*) AS BIGINT) AS avg_surprise
      |FROM toks JOIN vocab USING (term) GROUP BY doc_id""".stripMargin

  /** URL canonicalization — the web-pipeline staple: parse scheme/host/path/
    * params out of a URL and normalize it (drop tracking params). The corpus
    * is synthetic prose, so the URL column is CONSTRUCTED deterministically
    * per doc (like p5's synthesized WAVs), then parsed back with the same
    * regexes in both engines. Pure narrow scan — no shuffle at any scale. */
  val textUrls: Q = (s, dir) =>
    table(s, dir, "documents")
      .withColumn("url", concat(
        lit("https://"), col("source"), lit(".example.com/docs/"),
        col("doc_id").cast("string"), lit("?lang="), col("lang"),
        lit("&sig="), pmod(charFoldHash(col("text")), lit(1000)).cast("string")))
      .select(col("doc_id"), col("url"),
        regexp_extract(col("url"), "^https://([^/]+)/", 1).as("host"),
        regexp_extract(col("url"), "^https://[^/]+(/[^?]*)", 1).as("path"),
        regexp_extract(col("url"), "[?&]lang=([^&]+)", 1).as("lang_param"))
      .withColumn("url_normalized",
        concat(lit("https://"), col("host"), col("path")))
  val textUrlsSql = {
    val url = "'https://' || source || '.example.com/docs/' || doc_id || " +
      s"'?lang=' || lang || '&sig=' || ((${charFoldHashSql("text")}) % 1000 + 1000) % 1000"
    s"""SELECT doc_id, url,
       |  regexp_extract(url, '^https://([^/]+)/', 1) AS host,
       |  regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
       |  regexp_extract(url, '[?&]lang=([^&]+)', 1) AS lang_param,
       |  'https://' || regexp_extract(url, '^https://([^/]+)/', 1)
       |    || regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS url_normalized
       |FROM (SELECT doc_id, $url AS url FROM documents)""".stripMargin
  }

  /** Bloom-filter decontamination — the constant-memory form of
    * [[textDecontaminate]]: the eval set's shingles are folded into a
    * 252-bit Bloom bitmap (4 longs × 63 usable bits — bit 63 stays clear
    * because DuckDB errors on 1<<63 — 2 probes/shingle), and every training
    * shingle tests against it. At 100 TB the eval side no longer needs a
    * broadcast SET — the filter is O(1) bytes regardless of eval size, the
    * classic trade (false positives possible, negatives exact). Everything
    * is integer hashing, so even the false-positive pattern is deterministic
    * and the op stays fully oracle-checkable; `bloom_hits` is a provable
    * superset count of the exact op's `n_shared`.
    *
    * Scale shape: build = one tiny agg over eval shingles (4 result rows);
    * probe = narrow scan + two broadcast lookups + per-doc count. */
  val decontaminateBloom: Q = (s, dir) => {
    // the span hash IS the Bloom key — no second hashing pass over strings
    val sh = spanHashRows(s, dir, None)
      .withColumn("h", col("shingle"))
      .withColumn("b1", pmod(col("h"), lit(252)))
      .withColumn("b2", pmod(expr("h div 252"), lit(252)))
    val bloom = sh.filter(col("doc_id") < 20)
      .select(explode(array(col("b1"), col("b2"))).as("bit"))
      .select(expr("bit div 63").as("w"), expr("bit % 63").as("b"))
      .groupBy(col("w"))
      .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))")).as("word"))
    val probe = sh.filter(col("doc_id") >= 20)
      .join(broadcast(bloom.select(expr("w").as("w1"), col("word").as("word1"))),
        expr("b1 div 63") === col("w1"), "left")
      .join(broadcast(bloom.select(expr("w").as("w2"), col("word").as("word2"))),
        expr("b2 div 63") === col("w2"), "left")
      .withColumn("hit", // & 1, NOT % 2: >> is arithmetic, so a sign-bit word
        // shifted right is negative and odd values yield −1 under %
        (expr("shiftright(coalesce(word1, CAST(0 AS BIGINT)), CAST(b1 % 63 AS INT)) & 1") === 1) &&
          (expr("shiftright(coalesce(word2, CAST(0 AS BIGINT)), CAST(b2 % 63 AS INT)) & 1") === 1))
    probe.groupBy(col("doc_id"))
      .agg(sum(when(col("hit"), 1L).otherwise(0L)).as("bloom_hits"))
      .filter(col("bloom_hits") >= 2)
  }
  val decontaminateBloomSql = {
    s"""WITH sh AS (
       |  SELECT doc_id, h, h % 252 AS b1, (h // 252) % 252 AS b2 FROM (
       |    SELECT doc_id, unnest(list_distinct(${spansOfThSql(3)})) AS h
       |    FROM (SELECT doc_id, $tokenHashesSql AS th FROM documents))),
       |bloom AS (
       |  SELECT bit // 63 AS w, bit_or(CAST(1 AS BIGINT) << CAST(bit % 63 AS INT)) AS word
       |  FROM (SELECT unnest([b1, b2]) AS bit FROM sh WHERE doc_id < 20)
       |  GROUP BY bit // 63),
       |probe AS (
       |  SELECT s.doc_id,
       |    (((coalesce(w1.word, 0) >> CAST(s.b1 % 63 AS INT)) & 1) = 1
       |     AND ((coalesce(w2.word, 0) >> CAST(s.b2 % 63 AS INT)) & 1) = 1) AS hit
       |  FROM sh s
       |  LEFT JOIN bloom w1 ON s.b1 // 63 = w1.w
       |  LEFT JOIN bloom w2 ON s.b2 // 63 = w2.w
       |  WHERE s.doc_id >= 20)
       |SELECT doc_id, CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS bloom_hits
       |FROM probe GROUP BY doc_id HAVING sum(CASE WHEN hit THEN 1 ELSE 0 END) >= 2""".stripMargin
  }

  /** BPE TRAINING statistics (the other side of [[textBpe]]'s apply): count
    * adjacent-token pairs corpus-wide and return the top-20 merge candidates
    * — iteration 1 of the BPE training loop. Pair build is the NARROW
    * slice/zip_with projection ([[bpeTrainMerges]]'s shape): the original
    * posexplode+lead window shuffled and sorted every token row before the
    * first count — caught at sf100 by the round-11 sixth-battery audit
    * (133.7 s → 18.9 s isolated). One map-side-combining count agg +
    * TakeOrdered top-k; no window, no pre-count shuffle. */
  val bpePairCounts: Q = (s, dir) =>
    table(s, dir, "documents")
      .select(split(col("text"), " ").as("t"))
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => concat_ws(" ", a, b))).as("pair"))
      .groupBy(col("pair"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(20)
  val bpePairCountsSql =
    """WITH pairs AS (
      |  SELECT unnest(list_transform(range(1, len(t)),
      |    i -> t[i] || ' ' || t[i+1])) AS pair
      |  FROM (SELECT string_split(text, ' ') AS t FROM documents))
      |SELECT pair, count(*) AS n FROM pairs
      |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin

  /** Deterministic quality-weighted subsampling (the data-mixing shape:
    * longer/higher-quality docs keep a higher acceptance rate). Acceptance
    * is content-hashed against a per-doc weight — reproducible across runs,
    * engines, and partitionings, unlike rand()-based sampling. Pure narrow
    * scan + small agg. */
  val sampleQualityWeighted: Q = (s, dir) => {
    val weight = least(lit(100L), greatest(lit(1L), expr("n_chars div 10")))
    val accept = pmod(charFoldHash(col("text")), lit(100)) < weight
    table(s, dir, "documents")
      .select(col("lang"), col("source"), weight.as("w"), accept.as("keep"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(col("w")).as("weight_sum"))
  }
  val sampleQualityWeightedSql = {
    val w = "least(100, greatest(1, n_chars // 10))"
    s"""SELECT lang, source, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN (${charFoldHashSql("text")}) % 100 < $w THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum($w) AS BIGINT) AS weight_sum
       |FROM documents GROUP BY lang, source""".stripMargin
  }

  /** Mixture balancing (the data-MIXING shape next to
    * [[sampleQualityWeighted]]'s per-doc weighting): temperature-style
    * down-sampling of over-represented languages toward the smallest one —
    * acceptance rate per lang = sqrt(min_count / n_lang) (τ = 0.5 on the
    * count distribution), materialized as an integer ppm threshold so the
    * hash acceptance is exact. sqrt and one division are IEEE
    * correctly-rounded, hence bit-portable where a general pow() is not.
    * Content-hash acceptance: reproducible across runs, engines, and
    * partitionings. Scale shape: per-lang counts are a tiny agg (broadcast
    * back), the corpus pass is one narrow scan with map-side aggregation —
    * the 100 TB corpus is never shuffled. */
  val sampleMixtureBalance: Q = (s, dir) => {
    // Same two-scan discipline as sampleTemperature (see its comment): the
    // lang-domain-bounded counts come to the driver and the rate table is
    // built locally — deriving min() from the counts DataFrame re-executes
    // the count aggregation as a second full corpus scan (A/B at sf10:
    // 3.44 s declarative → 2.9 s driver-side; the driver hop is a fixed
    // cost, the extra scan grows with the corpus).
    import s.implicits._
    val docs = table(s, dir, "documents").select(col("doc_id"), col("lang"), col("text"))
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_lang")).collect()
    val rates =
      if (counts.isEmpty) Seq.empty[(String, Long, Long)].toDF("lang", "n_lang", "thr")
      else {
        val minC = counts.map(_.getLong(1)).min.toDouble
        counts.toSeq.map { r =>
          (r.getString(0), r.getLong(1),
            math.floor(math.sqrt(minC / r.getLong(1).toDouble) * 1000000.0).toLong)
        }.toDF("lang", "n_lang", "thr")
      }
    docs.join(broadcast(rates), Seq("lang"))
      .withColumn("keep", pmod(charFoldHash(col("text")), lit(1000000L)) < col("thr"))
      .groupBy(col("lang"))
      .agg(max(col("n_lang")).as("n_docs"),
        max(col("thr")).as("accept_ppm"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("doc_id")).otherwise(0L)).as("kept_id_sum"))
  }
  val sampleMixtureBalanceSql =
    s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang FROM documents GROUP BY lang),
       |r AS (SELECT lang, n_lang,
       |  CAST(floor(sqrt(CAST((SELECT min(n_lang) FROM c) AS DOUBLE) / CAST(n_lang AS DOUBLE)) * 1000000) AS BIGINT) AS thr
       |  FROM c)
       |SELECT d.lang, max(r.n_lang) AS n_docs, max(r.thr) AS accept_ppm,
       |  CAST(sum(CASE WHEN (${charFoldHashSql("d.text")}) % 1000000 < r.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN (${charFoldHashSql("d.text")}) % 1000000 < r.thr THEN d.doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
       |FROM documents d JOIN r ON d.lang = r.lang
       |GROUP BY d.lang""".stripMargin

  /** Temperature-based mixture sampling (the mT5/multilingual-balance
    * standard): per-source acceptance ∝ p^α with α = 3/4, referenced to
    * the LARGEST source (rate = (n_src / n_max)^α, so the head source
    * keeps everything and the tail is boosted relative to proportional
    * sampling). Two portability rules make it oracle-exact:
    * x^(3/4) is computed as sqrt(x · sqrt(x)) — sqrt, · and ÷ are IEEE
    * correctly-rounded where a libm pow() is not (the
    * [[sampleMixtureBalance]] argument, extended by composition: both
    * engines execute the same three correctly-rounded steps) — and the
    * reference is max-count, not a normalizing Σ p^α, because a
    * cross-row float sum would round differently under different
    * summation orders. Acceptance itself is the content-hash ppm
    * threshold: reproducible across runs, engines, partitionings.
    * Scale shape: per-source counts are a tiny agg broadcast back; the
    * corpus pass is one narrow scan with map-side aggregation. */
  val sampleTemperature: Q = (s, dir) => {
    // TWO corpus scans total: the per-source count agg (map-side
    // combining) and the acceptance pass. The counts come to the driver
    // (constant size — bounded by the source domain, the same class of
    // action as the kmeans centroid collect) and the rate table is built
    // locally and broadcast; deriving max() from the counts DataFrame
    // instead re-executes the whole count aggregation — a THIRD full
    // corpus scan (seen in the plan as two independent HashAggregate
    // subtrees over the same scan). JVM Math.sqrt/floor are the same
    // correctly-rounded IEEE ops Spark and DuckDB run, so the
    // driver-side threshold arithmetic changes no bits.
    import s.implicits._
    val docs = table(s, dir, "documents").select(col("doc_id"), col("source"), col("text"))
    val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n_src")).collect()
    val rates =
      if (counts.isEmpty) Seq.empty[(String, Long, Long)].toDF("source", "n_src", "thr")
      else {
        val maxC = counts.map(_.getLong(1)).max.toDouble
        counts.toSeq.map { r =>
          val ratio = r.getLong(1).toDouble / maxC
          (r.getString(0), r.getLong(1),
            math.floor(math.sqrt(ratio * math.sqrt(ratio)) * 1000000.0).toLong)
        }.toDF("source", "n_src", "thr")
      }
    docs.join(broadcast(rates), Seq("source"))
      .withColumn("keep", pmod(charFoldHash(col("text")), lit(1000000L)) < col("thr"))
      .groupBy(col("source"))
      .agg(max(col("n_src")).as("n_docs"),
        max(col("thr")).as("accept_ppm"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("doc_id")).otherwise(0L)).as("kept_id_sum"))
  }
  val sampleTemperatureSql =
    s"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM documents GROUP BY source),
       |r AS (SELECT source, n_src,
       |  CAST(floor(sqrt((CAST(n_src AS DOUBLE) / CAST((SELECT max(n_src) FROM c) AS DOUBLE))
       |    * sqrt(CAST(n_src AS DOUBLE) / CAST((SELECT max(n_src) FROM c) AS DOUBLE))) * 1000000) AS BIGINT) AS thr
       |  FROM c)
       |SELECT d.source, max(r.n_src) AS n_docs, max(r.thr) AS accept_ppm,
       |  CAST(sum(CASE WHEN (${charFoldHashSql("d.text")}) % 1000000 < r.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(sum(CASE WHEN (${charFoldHashSql("d.text")}) % 1000000 < r.thr THEN d.doc_id ELSE 0 END) AS BIGINT) AS kept_id_sum
       |FROM documents d JOIN r ON d.source = r.source
       |GROUP BY d.source""".stripMargin

  /** Prefix-duplicate detection: docs whose text is a strict-or-equal prefix
    * of another doc (truncated/extended near-copies — a dedup family LSH
    * misses when the suffix dominates the shingle set). Blocking key = hash
    * of the first 8 tokens, so candidates are an inverted-index join, never
    * n²; within a block the prefix test is substring equality. RECALL
    * CONTRACT: pairs are found when the two docs share ≥8 leading tokens
    * (equivalently: the shorter side has ≥8 tokens) — the standard blocking
    * trade; shorter-prefix pairs would need multi-length keys. */
  val dedupPrefix: Q = (s, dir) => {
    val keyed = table(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        charFoldHash(array_join(slice(split(col("text"), " "), 1, 8), " ")).as("pk"))
    val a = keyed.select(col("pk"), col("doc_id").as("a_id"), col("text").as("a_text"))
    val b = keyed.select(col("pk"), col("doc_id").as("b_id"), col("text").as("b_text"))
    a.join(b, Seq("pk")).filter(col("a_id") < col("b_id"))
      .withColumn("a_prefix_of_b",
        expr("substring(b_text, 1, length(a_text))") === col("a_text"))
      .withColumn("b_prefix_of_a",
        expr("substring(a_text, 1, length(b_text))") === col("b_text"))
      .filter(col("a_prefix_of_b") || col("b_prefix_of_a"))
      .select(col("a_id"), col("b_id"),
        length(col("a_text")).as("len_a"), length(col("b_text")).as("len_b"),
        (col("a_prefix_of_b") && col("b_prefix_of_a")).as("exact_equal"))
  }
  val dedupPrefixSql = {
    val pk = charFoldHashSql("array_to_string(list_slice(string_split(text, ' '), 1, 8), ' ')")
    s"""WITH keyed AS (SELECT doc_id, text, $pk AS pk FROM documents)
       |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |  length(a.text) AS len_a, length(b.text) AS len_b,
       |  (substr(b.text, 1, length(a.text)) = a.text
       |   AND substr(a.text, 1, length(b.text)) = b.text) AS exact_equal
       |FROM keyed a JOIN keyed b ON a.pk = b.pk AND a.doc_id < b.doc_id
       |WHERE substr(b.text, 1, length(a.text)) = a.text
       |   OR substr(a.text, 1, length(b.text)) = b.text""".stripMargin
  }

  /** PMI collocation mining (phrase discovery for tokenizer vocabularies):
    * score adjacent-token pairs by pointwise mutual information. The log is
    * dropped (not bit-portable) in favor of the monotone integer ratio
    * pmi_micro = floor((c_xy·1e6/c_x)·(N/c_y)) computed in DOUBLE — IEEE
    * ×/÷ is bit-portable, counts stay exact below 2^53 (≈9e15 bigrams, past
    * the 100 TB point), and unlike an all-integer form no intermediate can
    * overflow (the true PMI ratio itself approaches N for perfectly
    * correlated rare pairs). Pair build is the NARROW slice/zip_with
    * projection (the `bpe_pair_counts` shape): the original
    * posexplode+lead window shuffled AND sorted every token row
    * (~280M at sf100) before the first count — the round-5 shingle-family
    * anti-pattern, caught here by the round-11 sixth sf100 battery
    * (89.6 s → see SCALING.md). Now: three map-side-combining count aggs
    * + two term joins, no window anywhere; top-15 via TakeOrdered. */
  val textPmi: Q = (s, dir) => {
    val bi = table(s, dir, "documents")
      .select(split(col("text"), " ").as("t"))
      .select(explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => struct(a.as("x"), b.as("y")))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
      .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= 5)
    val uni = table(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    // Σ(len−1) straight off documents — NOT count−countDistinct over the
    // exploded tokens (mixing countDistinct into an agg plans through
    // Expand, doubling the exploded row count)
    val n = table(s, dir, "documents")
      .agg(sum(size(split(col("text"), " ")) - 1).as("n_bigrams"))
    bi.join(uni.select(col("tok").as("x"), col("c").as("c_x")), Seq("x"))
      .join(uni.select(col("tok").as("y"), col("c").as("c_y")), Seq("y"))
      .crossJoin(broadcast(n))
      .withColumn("pmi_micro",
        floor((col("c_xy").cast("double") * lit(1000000.0) / col("c_x"))
          * (col("n_bigrams").cast("double") / col("c_y"))).cast("long"))
      .orderBy(col("pmi_micro").desc, col("x"), col("y"))
      .limit(15)
      .select(col("x"), col("y"), col("c_xy"), col("pmi_micro"))
  }
  val textPmiSql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      |bi AS (
      |  SELECT pr[1] AS x, pr[2] AS y, count(*) AS c_xy FROM (
      |    SELECT unnest(list_transform(range(1, len(t)), i -> [t[i], t[i+1]])) AS pr
      |    FROM (SELECT string_split(text, ' ') AS t FROM documents))
      |  GROUP BY 1, 2 HAVING count(*) >= 5),
      |uni AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok),
      |n AS (SELECT CAST(sum(len(string_split(text, ' ')) - 1) AS BIGINT) AS n_bigrams
      |      FROM documents)
      |SELECT x, y, c_xy, CAST(floor((CAST(c_xy AS DOUBLE) * CAST(1000000 AS DOUBLE) / ux.c)
      |  * (CAST(n_bigrams AS DOUBLE) / uy.c)) AS BIGINT) AS pmi_micro
      |FROM bi JOIN uni ux ON bi.x = ux.tok JOIN uni uy ON bi.y = uy.tok, n
      |ORDER BY pmi_micro DESC, x, y LIMIT 15""".stripMargin

  /** Token-diversity score per document via the Gini/Simpson concentration
    * index 1 − Σ(cᵢ/n)² — low diversity marks keyword-stuffed or repetitive
    * docs. Computed as the exact integer (n²−Σcᵢ²)·1e6 div n² (entropy needs
    * a log; this is the standard log-free diversity measure and it is
    * bit-exact cross-engine). One explode + two narrow aggs. */
  val textDiversity: Q = (s, dir) => {
    val tf = table(s, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    tf.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), sum(col("c") * col("c")).as("c2"),
        count(lit(1)).as("n_distinct"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        expr("(n_tokens * n_tokens - c2) * 1000000 div (n_tokens * n_tokens)")
          .as("diversity_micro"))
  }
  val textDiversitySql =
    """WITH tf AS (
      |  SELECT doc_id, tok, count(*) AS c FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |  GROUP BY doc_id, tok),
      |agg AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    CAST(sum(c * c) AS BIGINT) AS c2, CAST(count(*) AS BIGINT) AS n_distinct
      |  FROM tf GROUP BY doc_id)
      |SELECT doc_id, n_tokens, n_distinct,
      |  (n_tokens * n_tokens - c2) * 1000000 // (n_tokens * n_tokens) AS diversity_micro
      |FROM agg""".stripMargin

  /** Cross-document duplicated SPANS (the Lee et al. "Deduplicating Training
    * Data" granularity): 10-token sliding windows hashed corpus-wide; a span
    * occurring in ≥2 distinct docs is duplicated text, and each doc reports
    * its duplicated-span fraction. Shape: shingle window → span-hash count
    * agg (map-side combine) → join back on span hash — shuffle ∝ spans,
    * never n² docs. */
  val dedupSpans: Q = (s, dir) => {
    // span signatures built MAP-SIDE in one compiled pass per document
    // ([[graft.functions.SpanHashes]] — tokenizer + char-fold + window fold
    // fused): no doc_id window shuffle+sort, no per-element interpreted
    // lambdas. An earlier lead()-window formulation paid two extra
    // full-corpus exchanges; an intermediate HOF-array form removed those
    // but stalled on interpreted lambda evaluation. Trade: a document's
    // span array materializes in one row (fine for web/LLM docs; a single
    // multi-GB document would prefer the window).
    val spans = table(s, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.SpanHashes(col("text"), 10)).as("h"))
      // ONE corpus exchange, on h, BEFORE the dedup: HashPartitioning(h)
      // satisfies ClusteredDistribution for the (doc_id, h) distinct, the
      // per-h count agg AND the h join below, so none of them re-shuffles —
      // distinct-then-repartition would cross the network twice
      .repartition(col("h"))
      .distinct()
    val shared = spans.groupBy(col("h"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("h"), lit(1).as("dup"))
    spans.join(shared, Seq("h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("dup").isNotNull, 1L).otherwise(0L)).as("n_dup_spans"))
      .withColumn("dup_micro", expr("n_dup_spans * 1000000 div n_spans"))
  }
  val dedupSpansSql = {
    val tokHashes = s"list_transform(string_split(text, ' '), tok -> ${charFoldHashSql("tok")})"
    val spans = "list_transform(range(1, len(th) - 8), " +
      "i -> list_reduce(list_slice(th, i, i + 9), (a, b) -> (a * 31 + b) % 1000000007))"
    s"""WITH sp AS (
       |  SELECT DISTINCT doc_id, unnest($spans) AS h
       |  FROM (SELECT doc_id, $tokHashes AS th FROM documents)
       |  WHERE len(th) >= 10),
       |shared AS (SELECT h FROM sp GROUP BY h HAVING count(*) >= 2)
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       |  CAST(sum(CASE WHEN shared.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
       |  CAST(sum(CASE WHEN shared.h IS NOT NULL THEN 1 ELSE 0 END) * 1000000
       |    // count(*) AS BIGINT) AS dup_micro
       |FROM sp LEFT JOIN shared ON sp.h = shared.h
       |GROUP BY doc_id""".stripMargin
  }

  /** LM-training sequence packing: concatenate the corpus in doc_id order
    * and cut every 512 tokens (the GPT-style pack-and-cut — documents
    * straddle sequence boundaries by design). Emits the per-document
    * placement map (start sequence / offset / end sequence). The global
    * running token count is [[graft.operators.Sharding.cumSumBy]]'s
    * two-pass distributed prefix sum — no single-partition window at any
    * scale; the oracle reconstructs it with a plain windowed cumsum. */
  val packSequences: Q = (s, dir) => {
    val docs = table(s, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    graft.operators.Sharding.cumSumBy(docs, Seq("doc_id"), col("n_tok"), "cum_tok")
      .select(col("doc_id"), col("n_tok"),
        expr("(cum_tok - n_tok) div 512").as("start_seq"),
        expr("(cum_tok - n_tok) % 512").as("start_off"),
        expr("(cum_tok - 1) div 512").as("end_seq"))
  }
  val packSequencesSql =
    """SELECT doc_id, n_tok,
      |  (cum_tok - n_tok) // 512 AS start_seq,
      |  (cum_tok - n_tok) % 512 AS start_off,
      |  (cum_tok - 1) // 512 AS end_seq
      |FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
      |        CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT))
      |          OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |          AS BIGINT) AS cum_tok
      |      FROM documents)""".stripMargin

  /** Fuzzy record linkage: document pairs whose 6-token prefixes are within
    * edit distance 12, candidates blocked by (lang, first token) so the
    * join is bucket-local — never n². The distance itself is Spark's
    * threshold-bounded `levenshtein(l, r, k)` (banded DP with early exit:
    * O(k·min(|l|,|r|)) instead of O(|l|·|r|), returns -1 above k) — at
    * 100 TB most candidate pairs exceed the threshold, so the early exit
    * is where the time goes. DuckDB's unbounded `levenshtein` agrees
    * exactly on every surviving pair. */
  val linkFuzzyEdit: Q = (s, dir) => fuzzyPairs(s, dir, "link_fuzzy_edit")

  /** Capped fuzzy linkage — the documented SCALE KNOB for
    * [[linkFuzzyEdit]], whose exact form is output-bound at scale (the
    * true-pair count itself grows 135× for a 10× corpus; SCALING.md
    * "link_fuzzy_edit: output-bound"). Production linkage keeps only the
    * best k matches per left record, so the OUTPUT is bounded ∝ n·k no
    * matter how dense the match graph gets. Candidate generation and the
    * early-exit levenshtein are identical to the exact query; the cap is a
    * per-doc_a rank window that Spark rewrites with `WindowGroupLimit`, so
    * each map task keeps its local top-(k+ties) BEFORE the rank shuffle —
    * the shuffle carries O(n·k) rows even when the pair set is quadratic.
    * The exact query stays as the oracle-bounded ground truth. */
  val LinkFuzzyK = 3
  val linkFuzzyCapped: Q = (s, dir) => {
    val w = Window.partitionBy(col("doc_a"))
      .orderBy(col("edit_dist").asc, col("doc_b").asc)
    val capped = fuzzyPairs(s, dir, "link_fuzzy_capped")
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= LinkFuzzyK)
    graft.core.BenchStats.observed(capped, "link_fuzzy_capped", "out",
      "output_rows" -> count(lit(1)))
  }
  val linkFuzzyCappedSql =
    s"""WITH pref AS (
      |  SELECT doc_id, lang, string_split(text, ' ')[1] AS tok1,
      |    array_to_string(string_split(text, ' ')[1:6], ' ') AS p
      |  FROM documents),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(levenshtein(a.p, b.p) AS BIGINT) AS edit_dist
      |  FROM pref a JOIN pref b
      |    ON a.lang = b.lang AND a.tok1 = b.tok1 AND a.doc_id < b.doc_id
      |  WHERE levenshtein(a.p, b.p) <= 12)
      |SELECT doc_a, doc_b, edit_dist,
      |  CAST(row_number() OVER (PARTITION BY doc_a ORDER BY edit_dist, doc_b) AS BIGINT) AS rank
      |FROM pairs QUALIFY rank <= $LinkFuzzyK""".stripMargin

  /** `statsName`: the caller's registry name for the in-plan scale
    * side-records (round-15 verdict task 4 — round 14 re-derived this
    * lane's candidate/true-pair masses BY HAND to adjudicate its 22.4×
    * battery flag). Two `observe` points ride the query's own action at
    * zero extra cost when Bench enables [[graft.core.BenchStats]]:
    * same-block candidate pairs (post-join, pre-levenshtein) and
    * surviving true pairs; disabled (Verify/oracle) the plan is
    * untouched. */
  private def fuzzyPairs(s: SparkSession, dir: String, statsName: String): DataFrame = {
    // Length banding: ed(pa,pb) ≤ 12 ⇒ |len(pa)−len(pb)| ≤ 12, so pairs
    // can only meet the threshold inside adjacent width-13 length bands.
    // (lang, tok1) alone has a FIXED block count — vocabulary-bounded — so
    // its block sizes grow ∝ n and pair generation is quadratic; the band
    // key multiplies the block count by the occupied-band count, and drops
    // only pairs the levenshtein filter would reject anyway (identical
    // output, provably). Side A explodes to its 3 neighboring bands; each
    // surviving pair matches on exactly one band, so no dedup is needed.
    val W = 13
    val pref = table(s, dir, "documents").select(
      col("doc_id"), col("lang"),
      element_at(split(col("text"), " "), 1).as("tok1"),
      concat_ws(" ", slice(split(col("text"), " "), 1, 6)).as("p"))
      .withColumn("lb", floor(length(col("p")) / W))
    // NOTE a packed char-histogram L1 prefilter (L1 ≤ 2·ed bound, native
    // codegen'd expression) was built, measured at sf10, and REJECTED: the
    // corpus's within-block true-pair rate is ~26% (ed ≤ 12 is loose), the
    // bound pruned only 17% of candidates, and the operator is output-bound
    // at scale — see SCALING.md "link_fuzzy_edit: output-bound".
    val candidates = pref
      .select(col("lang"), col("tok1"), col("doc_id").as("doc_a"), col("p").as("pa"),
        explode(array(col("lb") - 1, col("lb"), col("lb") + 1)).as("lbk"))
      .join(pref.select(col("lang"), col("tok1"), col("doc_id").as("doc_b"),
          col("p").as("pb"), col("lb").as("lbk")),
        Seq("lang", "tok1", "lbk"))
      .filter(col("doc_a") < col("doc_b"))
    val pairs = graft.core.BenchStats
      .observed(candidates, statsName, "cand", "candidate_pairs" -> count(lit(1)))
      .withColumn("ed", expr("levenshtein(pa, pb, 12)"))
      .filter(col("ed") >= 0) // -1 = early-exited above the threshold
      .select(col("doc_a"), col("doc_b"), col("ed").cast("long").as("edit_dist"))
    graft.core.BenchStats.observed(pairs, statsName, "true",
      "true_pairs" -> count(lit(1)))
  }
  val linkFuzzyEditSql =
    """WITH pref AS (
      |  SELECT doc_id, lang, string_split(text, ' ')[1] AS tok1,
      |    array_to_string(string_split(text, ' ')[1:6], ' ') AS p
      |  FROM documents)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(levenshtein(a.p, b.p) AS BIGINT) AS edit_dist
      |FROM pref a JOIN pref b
      |  ON a.lang = b.lang AND a.tok1 = b.tok1 AND a.doc_id < b.doc_id
      |WHERE levenshtein(a.p, b.p) <= 12""".stripMargin

  /** Phrase search through posting lists: docs containing the bigram
    * "hash join" found by intersecting the two tokens' position postings
    * (join on (doc_id, pos) after shifting the second token's positions) —
    * the inverted-index shape, where work scales with the MATCHING tokens'
    * postings, not the corpus. The oracle is a plain substring LIKE scan —
    * a genuinely independent formulation (token-boundary-padded, so both
    * mean "consecutive whitespace tokens"). */
  val phraseSearch: Q = (s, dir) => {
    val tk = table(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val p1 = tk.filter(col("tok") === "hash").select(col("doc_id"), col("pos"))
    val p2 = tk.filter(col("tok") === "join")
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    p1.join(p2, Seq("doc_id", "pos"), "left_semi")
      .select(col("doc_id")).distinct()
  }
  val phraseSearchSql =
    """SELECT DISTINCT doc_id FROM documents
      |WHERE ' ' || text || ' ' LIKE '% hash join %'""".stripMargin

  /** End-to-end corpus-curation composition — the "whole pipeline" a
    * training-data user runs as ONE declarative plan: language-ID filter →
    * Gopher-style quality rules → exact dedup (keep-lowest per identical
    * text) → deterministic content-hash sampling. All pre-dedup stages are
    * narrow transforms that fuse into a single scan stage; the dedup window
    * on the text fingerprint is the only shuffle, and the sample filter is
    * hash-deterministic (no RNG — reproducible at any parallelism). Shows
    * the individually-gated operators COMPOSE without extra exchanges. */
  val pipelineQualityFilter: Q = (s, dir) => {
    val toks = split(col("text"), " ")
    val kept = table(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("text"),
        toks.as("toks"), size(toks).as("n_words"))
      .withColumn("mean_word_len",
        round((length(col("text")) - col("n_words") + 1).cast("double") / col("n_words"), 4))
      .withColumn("alpha_frac",
        round(size(filter(col("toks"), t => t.rlike("[a-z]"))).cast("double") / col("n_words"), 4))
      .filter( // language-ID: en markers strictly beat db markers
        size(filter(col("toks"), t => t.isin("the", "a", "fast"))) >
          size(filter(col("toks"), t => t.isin("data", "table", "row"))))
      .filter( // Gopher rules (same thresholds as text_gopher)
        col("n_words").between(5, 100000) && col("mean_word_len").between(2.0, 12.0) &&
          col("alpha_frac") >= 0.8 &&
          size(filter(col("toks"), t => t.isin("the", "a", "of", "and", "to"))) >= 1)
      .withColumn("fp", charFoldHash(col("text")))
    val w = Window.partitionBy(col("fp")).orderBy(col("doc_id"))
    kept.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("fp") % 10 < 7) // deterministic 70% content-hash sample
      .select(col("doc_id"), col("source"), col("n_words"), col("fp"))
  }
  val pipelineQualityFilterSql =
    s"""WITH scored AS (
       |  SELECT doc_id, source, text, len(toks) AS n_words,
       |    round(CAST(length(text) - len(toks) + 1 AS DOUBLE) / len(toks), 4) AS mean_word_len,
       |    round(CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE) / len(toks), 4) AS alpha_frac,
       |    len(list_filter(toks, t -> t IN ('the','a','of','and','to'))) AS stop_hits,
       |    len(list_filter(toks, t -> t IN ('the','a','fast'))) AS en_score,
       |    len(list_filter(toks, t -> t IN ('data','table','row'))) AS db_score
       |  FROM (SELECT doc_id, source, text, string_split(text, ' ') AS toks FROM documents)),
       |kept AS (
       |  SELECT doc_id, source, n_words, ${charFoldHashSql("text")} AS fp
       |  FROM scored
       |  WHERE en_score > db_score AND n_words BETWEEN 5 AND 100000
       |    AND mean_word_len BETWEEN 2.0 AND 12.0 AND alpha_frac >= 0.8 AND stop_hits >= 1),
       |deduped AS (
       |  SELECT * FROM (SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM kept)
       |  WHERE rn = 1)
       |SELECT doc_id, source, n_words, fp FROM deduped WHERE fp % 10 < 7""".stripMargin

  /** Domain-level curation (the C4/RefinedWeb blocklist shape): derive each
    * document's host, aggregate per-domain statistics, decide keep/block at
    * the DOMAIN level (mean length ≥ 250 chars), and combine with a
    * per-document floor (≥ 50 chars) — then report survival per language.
    * Two quality gates at different granularities, which is exactly what
    * single-doc scoring cannot express.
    *
    * Scale shape: the domain table is corpus-cardinality-bounded (hosts ≪
    * docs — here ~140, at 100 TB ~1e8 rows of three longs): one map-side-
    * combining groupBy(host) builds it, it broadcasts back onto the corpus
    * scan (at 1e8 domains this becomes a shuffle-hash join on host — still
    * one exchange), and the per-lang rollup is a tiny final agg. The corpus
    * itself is scanned once and never shuffled. */
  val domainStats: Q = (s, dir) => {
    val docs = table(s, dir, "documents")
      .withColumn("host",
        concat(col("source"), lit("-"), pmod(col("doc_id"), lit(7)).cast("string"),
          lit(".example.com")))
    val domains = docs.groupBy(col("host"))
      .agg(count(lit(1)).as("d_docs"), sum(col("n_chars")).as("d_chars"))
      .withColumn("domain_keep", expr("d_chars div d_docs") >= 250)
      .select(col("host"), col("domain_keep"))
    docs.join(broadcast(domains), Seq("host"))
      .withColumn("keep", col("domain_keep") && col("n_chars") >= 50)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("kept_chars"))
  }
  val domainStatsSql =
    """WITH docs AS (
      |  SELECT doc_id, lang, n_chars,
      |    source || '-' || CAST(((doc_id % 7) + 7) % 7 AS VARCHAR) || '.example.com' AS host
      |  FROM documents),
      |domains AS (
      |  SELECT host, (sum(n_chars) // count(*)) >= 250 AS domain_keep
      |  FROM docs GROUP BY host)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN domain_keep AND n_chars >= 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN domain_keep AND n_chars >= 50 THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
      |FROM docs JOIN domains USING (host) GROUP BY lang""".stripMargin

  /** Community detection over the duplicate-similarity graph via
    * [[graft.operators.LabelPropagation]] (3 synchronous rounds, most-
    * frequent-neighbour-label with min tie-break). Same candidate edges as
    * [[dedupClusters]] — which finds CONNECTIVITY; LPA finds DENSITY, the
    * distinction that matters when near-dup chains bridge unrelated
    * clusters. The oracle unrolls the three rounds as CTEs over the same
    * vote/argmax algebra (struct-min is lexicographic in both engines). */
  val labelPropagation: Q = (s, dir) => {
    val edges = dedupNgramJaccard(s, dir)
      .select(col("a_id").as("src"), col("b_id").as("dst"))
    val nodes = table(s, dir, "documents").filter(col("doc_id") < 400)
      .select(col("doc_id").as("id"))
    graft.operators.LabelPropagation.run(nodes, edges, iterations = 3)
      .groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_members"), min(col("id")).as("min_member"))
  }
  val labelPropagationSql = {
    def round(i: Int) =
      s"""v$i AS (SELECT s.dst AS id, l.label, count(*) AS n
         |  FROM sym s JOIN l${i - 1} l ON s.src = l.id GROUP BY 1, 2),
         |b$i AS (SELECT id, min(struct_pack(negn := -n, l := label)) AS b FROM v$i GROUP BY id),
         |l$i AS (SELECT nodes.id, coalesce(b$i.b.l, l${i - 1}.label) AS label
         |  FROM nodes LEFT JOIN b$i USING (id) JOIN l${i - 1} USING (id))""".stripMargin
    s"""WITH pairs AS (${dedupNgramJaccardSql.replace("\n", "\n  ")}),
       |sym AS (SELECT a_id AS src, b_id AS dst FROM pairs
       |        UNION ALL SELECT b_id, a_id FROM pairs),
       |nodes AS (SELECT doc_id AS id FROM documents WHERE doc_id < 400),
       |l0 AS (SELECT id, id AS label FROM nodes),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT label AS community, count(*) AS n_members, min(id) AS min_member
       |FROM l3 GROUP BY label""".stripMargin
  }

  /** BPE TRAINING, the actual merge loop (3 rounds unrolled) — the step
    * beyond [[bpePairCounts]]'s single-round statistics: each round counts
    * adjacent-token pairs corpus-wide, picks the argmax pair (count desc,
    * then lexicographic — deterministic), and APPLIES the merge to every
    * sequence before the next round, exactly how a distributed tokenizer
    * trainer iterates.
    *
    * The merge application is the subtle part: greedy leftmost
    * non-overlapping replacement ("a a a" + merge(a,a) → ["a~a", "a"]).
    * Both engines' literal `replace` is greedy-leftmost, so the corpus is
    * carried as a DOUBLE-SPACED padded string (every token flanked by its
    * own spaces); the pattern ` a  b ` consumes one flanking space per side
    * and the replacement ` a~b ` restores it, so adjacent matches still
    * fire and the invariant is preserved for the next round.
    *
    * Scale shape per round: pair build = narrow slice/zip projections (no
    * window, no posexplode shuffle); pair counts = one map-side-combining
    * groupBy; argmax = TakeOrdered(1) (never a global sort); merge apply =
    * narrow map under a broadcast 1-row join. The corpus is never shuffled
    * — the only exchanges are the pair-count aggregations. Output: per
    * round, the merged pair, its count, and the corpus token total after
    * the merge. */
  val bpeTrainMerges: Q = (s, dir) => {
    def pairCounts(d: DataFrame): DataFrame =
      d.select(split(trim(col("s")), "  ").as("t"))
        .select(explode(zip_with(
          slice(col("t"), lit(1), size(col("t")) - 1),
          slice(col("t"), lit(2), size(col("t")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
    def mergeRound(d: DataFrame, i: Int): (DataFrame, DataFrame) = {
      // 1-row eager checkpoint (round 18): `best` feeds BOTH the output row
      // and the next corpus's broadcast replace — unmaterialized, the
      // corpus-wide pair aggregation executed twice per round (once per
      // consumer; guide §2.4). The checkpoint runs it once.
      val best = pairCounts(d).orderBy(col("n").desc, col("a"), col("b")).limit(1)
        .localCheckpoint()
      // persist the loop-carried corpus: round i+1's pair counts, this
      // round's token total, AND the next merge chain all read it — without
      // the cache the replace chain re-derives from the scan once per
      // consumer (a distributed trainer checkpoints the corpus per merge
      // round for the same reason)
      val next = d.crossJoin(broadcast(best.select(col("a"), col("b"))))
        .select(col("doc_id"),
          expr("replace(s, ' ' || a || '  ' || b || ' ', ' ' || a || '~' || b || ' ')").as("s"))
        .persist()
      val after = next
        .select(size(split(trim(col("s")), "  ")).cast("long").as("k"))
        .agg(sum(col("k")).as("tokens_after"))
      val row = best.withColumn("iter", lit(i)).crossJoin(broadcast(after))
        .select(col("iter"), col("a").as("tok_a"), col("b").as("tok_b"),
          col("n").as("pair_n"), col("tokens_after"))
      (next, row)
    }
    val d0 = table(s, dir, "documents")
      .select(col("doc_id"),
        concat(lit(" "), regexp_replace(col("text"), " ", "  "), lit(" ")).as("s"))
    val (d1, r1) = mergeRound(d0, 1)
    val (d2, r2) = mergeRound(d1, 2)
    val (_, r3) = mergeRound(d2, 3)
    r1.unionAll(r2).unionAll(r3)
  }
  val bpeTrainMergesSql = {
    def round(i: Int) =
      s"""c$i AS (SELECT p.a AS a, p.b AS b, count(*) AS n FROM (
         |    SELECT unnest(list_transform(range(1, len(t)),
         |      j -> struct_pack(a := t[j], b := t[j+1]))) AS p
         |    FROM (SELECT string_split(trim(s), '  ') AS t FROM d${i - 1}))
         |  GROUP BY 1, 2),
         |b$i AS (SELECT a, b, n FROM c$i ORDER BY n DESC, a, b LIMIT 1),
         |d$i AS (SELECT doc_id, replace(s,
         |    ' ' || (SELECT a FROM b$i) || '  ' || (SELECT b FROM b$i) || ' ',
         |    ' ' || (SELECT a FROM b$i) || '~' || (SELECT b FROM b$i) || ' ') AS s FROM d${i - 1}),
         |t$i AS (SELECT CAST(sum(len(string_split(trim(s), '  '))) AS BIGINT) AS tokens_after FROM d$i),
         |r$i AS (SELECT $i AS iter, a AS tok_a, b AS tok_b, n AS pair_n,
         |  (SELECT tokens_after FROM t$i) AS tokens_after FROM b$i)""".stripMargin
    s"""WITH d0 AS (SELECT doc_id, ' ' || replace(text, ' ', '  ') || ' ' AS s FROM documents),
       |${round(1)},
       |${round(2)},
       |${round(3)}
       |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3""".stripMargin
  }

  /** LOGISTIC-REGRESSION TRAINING (3 rounds of full-batch gradient descent,
    * unrolled) — the TRAINING step behind [[textClassifyLinear]]'s inference:
    * modern curation stacks (FineWeb-Edu, DCLM) TRAIN their quality
    * classifier on the corpus they are about to filter, so a complete
    * pipeline needs distributed supervised training, not just scoring.
    * Joins [[bpeTrainMerges]] (tokenizer training) and `kmeans_quantized`
    * (codebook training) as the third trained-model lane.
    *
    * Numerics: EXACT FIXED-POINT integer arithmetic (scale 10^6) with a
    * hard-sigmoid link `p = clamp(0, S, S/2 + z div 4)` — every quantity is
    * a BIGINT, so the trained weights are bit-identical across engines and
    * hardware (the reproducibility property a 100 TB training run wants;
    * float GD order-of-summation drift would also break the DuckDB oracle).
    * Both engines' integer division truncates toward zero (probed: Spark
    * `div` = Java semantics; DuckDB `//` on BIGINT and HUGEINT both give
    * -7//2 = -3), so negative gradients fold identically. Features are
    * CENTERED small integers (length, token count, stopword hits — the
    * [[textQuality]] signal set) because GD from w=0 on uncentered features
    * stalls at the majority class; centered, 3 rounds reach 97% train
    * accuracy at sf0.01 with monotonically falling squared loss.
    *
    * Scale shape per round — the MLlib trainer contract (its
    * LogisticRegression does exactly this): weights live on the DRIVER (a
    * 4-long array — the blessed constant-size collect, smaller than
    * `kmeans_quantized`'s K=64 centroid table) and fold into the gradient
    * pass as LITERALS, so the scoring expression is pure whole-stage
    * codegen over the cached feature frame with ZERO joins; the gradient
    * is ONE map-side-combining aggregate (tree-aggregation — no corpus row
    * ever leaves its partition, the only exchange is 7 longs per partition
    * to the final reducer). Features are computed ONCE and cached — they
    * are loop-invariant, the key difference from [[bpeTrainMerges]]'s
    * loop-carried corpus. (A broadcast-weight-frame formulation was
    * measured first: ~12 tiny broadcast/checkpoint jobs for 3 rounds,
    * 4.4 s of pure orchestration at sf0.1 vs ~0.7 s for this shape — the
    * driver-held form is both the faster AND the production one.)
    * An empty corpus (NULL gradient sums) must not kill the job — the
    * model goes NULL, training reports still emit. Output: per round, the
    * POST-update weights + squared loss and training accuracy measured
    * with the PRE-update weights. */
  val trainLogregQuality: Q = (s, dir) => {
    val feat = logregFeatures(s, dir).persist()
    val (_, rows) = logregRounds(feat, Array(0L, 0L, 0L, 0L), rounds = 3, iterOffset = 0)
    logregReport(s, rows)
  }

  /** `rounds` reporting GD rounds over `feat` from `w0`: returns the final
    * weights (None once the corpus is empty — reports go NULL, the job does
    * not die) and one report Row per round (POST-update weights, PRE-update
    * sse / accuracy). The shared loop behind the trainer and the
    * warm-start incremental phases. */
  private def logregRounds(
      feat: DataFrame, w0: Array[Long], rounds: Int, iterOffset: Int)
      : (Option[Array[Long]], Seq[org.apache.spark.sql.Row]) = {
    var w = w0
    var dead = false
    val rows = (1 to rounds).map { i =>
      val g = if (dead) null else logregGradient(feat, w).collect()(0)
      if (g == null || g.isNullAt(0)) {
        dead = true // no corpus -> no model: NULL weights, not a crash
        org.apache.spark.sql.Row((i + iterOffset).toLong, null, null, null, null, null, null)
      } else {
        w = logregUpdate(w, g)
        org.apache.spark.sql.Row((i + iterOffset).toLong, w(0), w(1), w(2), w(3),
          g.getAs[Long]("sse"), g.getAs[Long]("n_correct"))
      }
    }
    (if (dead) None else Some(w), rows)
  }

  private def logregReport(s: SparkSession, rows: Seq[org.apache.spark.sql.Row]): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq("iter", "w0", "w1", "w2", "w3", "sse", "n_correct")
      .map(StructField(_, LongType, nullable = true)))
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
  }

  /** WARM-START INCREMENTAL TRAINING — the daily-retrain shape the dedup
    * lane already has (`dedup_incremental` / `dedup_minhash_incremental`):
    * yesterday's model is a weight STORE, and today's batch continues
    * training FROM it, touching only the batch — 2 GD rounds on the day-1
    * half (doc_id%4<2), then ONE round on the day-2 quarter (doc_id%4=2)
    * seeded with the stored weights. Cost of the increment is O(batch)
    * (one gradient pass over day-2 rows), never O(corpus) — day-1 is not
    * re-read, exactly how per-snapshot retraining must amortize at 100 TB.
    * The oracle composes two prefixed CTE chains, the second seeded from
    * the first's final weight CTE; the gate pins the whole continuous
    * trajectory (warm-start round 3 opens at 97.6% on the UNSEEN day-2
    * batch at sf0.01 — the stored model transfers). */
  val trainLogregIncremental: Q = (s, dir) => {
    val feat = logregFeatures(s, dir).persist()
    val day1 = feat.filter(col("doc_id") % 4 < 2)
    val day2 = feat.filter(col("doc_id") % 4 === 2)
    val (w1, rows1) = logregRounds(day1, Array(0L, 0L, 0L, 0L), rounds = 2, iterOffset = 0)
    val rows2 = w1 match {
      case Some(w) => logregRounds(day2, w, rounds = 1, iterOffset = 2)._2
      // no stored model (empty day-1): the increment reports NULL too —
      // same propagation as the oracle's NULL-weight CTE chain
      case None => Seq(org.apache.spark.sql.Row(3L, null, null, null, null, null, null))
    }
    logregReport(s, rows1 ++ rows2)
  }
  val trainLogregIncrementalSql =
    s"""WITH ${logregSqlChain(" WHERE doc_id % 4 < 2", prefix = "a", rounds = 2)},
       |${logregSqlChain(" WHERE doc_id % 4 = 2", prefix = "b", rounds = 1,
          initW = "aw2", iterOffset = 2)}
       |SELECT * FROM ar1 UNION ALL SELECT * FROM ar2 UNION ALL SELECT * FROM br1""".stripMargin

  /** Centered small-integer features + {0,1} label for [[trainLogregQuality]]
    * / [[trainLogregEval]]. Keyed by doc_id so the eval query can split
    * train/held-out; both queries persist the SAME plan, so the cache entry
    * is shared and the corpus featurizes once per session. */
  private[graft] def logregFeatures(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .select(
        col("doc_id"),
        lit(1L).as("x0"),
        expr("length(text) div 50 - 6").as("x1"),
        expr("size(split(text, ' ')) div 10 - 5").as("x2"),
        (size(filter(split(col("text"), " "), t => t === "the" || t === "a")) - 3)
          .cast("long").as("x3"),
        when(length(col("text")) >= 300, 1L).otherwise(0L).as("y"))

  /** One GD weight update from a collected 1-row gradient; Long./ truncates
    * toward zero — bit-identical to DuckDB's `//`. */
  private def logregUpdate(w: Array[Long], g: org.apache.spark.sql.Row): Array[Long] = {
    val lrDenom = math.max(g.getAs[Long]("n"), 1L) * 5L
    Array.tabulate(4)(j => w(j) - g.getLong(j) / lrDenom)
  }

  /** Run `rounds` GD rounds over `feat`; None on an empty corpus. */
  private[graft] def logregTrain(feat: DataFrame, rounds: Int): Option[Array[Long]] = {
    var w = Array(0L, 0L, 0L, 0L)
    for (_ <- 1 to rounds) {
      val g = logregGradient(feat, w).collect()(0)
      if (g.isNullAt(0)) return None
      w = logregUpdate(w, g)
    }
    Some(w)
  }

  /** One full-batch gradient pass with the weights as folded literals:
    * scan → narrow fixed-point scoring → partial agg → 1-row final agg.
    * Plan shape (no join, single tiny exchange) is pinned by TrainLogRegSpec. */
  private[graft] def logregGradient(feat: DataFrame, w: Array[Long]): DataFrame = {
    val S = 1000000L
    feat
      .withColumn("z",
        lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
          lit(w(2)) * col("x2") + lit(w(3)) * col("x3"))
      .withColumn("p", greatest(lit(0L), least(lit(S), lit(S / 2) + expr("z div 4"))))
      .withColumn("d", col("p") - col("y") * lit(S))
      .agg(
        sum(col("x0") * col("d")).as("g0"),
        sum(col("x1") * col("d")).as("g1"),
        sum(col("x2") * col("d")).as("g2"),
        sum(col("x3") * col("d")).as("g3"),
        sum(expr("(d div 1000) * (d div 1000)")).as("sse"),
        sum(when((col("p") > lit(S / 2)).cast("long") === col("y"), 1L).otherwise(0L))
          .as("n_correct"),
        count(lit(1)).as("n"))
  }
  /** The centered-feature SELECT list shared by every logreg oracle CTE.
    * A def, not a val: oracle-SQL vals above it call the chain builder at
    * object init, and a val here would still be null at that point. */
  private def logregFeatSqlCols =
    """CAST(1 AS BIGINT) AS x0,
      |    CAST(length(text) // 50 - 6 AS BIGINT) AS x1,
      |    CAST(len(string_split(text, ' ')) // 10 - 5 AS BIGINT) AS x2,
      |    CAST(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) - 3
      |      AS BIGINT) AS x3,
      |    CAST(CASE WHEN length(text) >= 300 THEN 1 ELSE 0 END AS BIGINT) AS y""".stripMargin

  /** Shared DuckDB CTE chain (no leading WITH): <p>feat -> <p>w0 -> GD
    * rounds (<p>s/g/w/r per round). `featWhere` narrows the training corpus
    * — "" for the full-corpus trainer, a doc_id split for the held-out
    * evaluator / incremental phases. `prefix` namespaces the CTEs so two
    * chains compose in one query; `initW` seeds round 1 from another
    * chain's weight CTE instead of zeros (the warm-start hook);
    * `iterOffset` shifts the reported iter numbers so composed chains emit
    * one continuous trajectory. */
  private def logregSqlChain(
      featWhere: String, prefix: String = "", rounds: Int = 3,
      initW: String = "", iterOffset: Int = 0): String = {
    val p = prefix
    // NULL-model propagation (degenerate-input parity with the Scala
    // trainer): once a round's weights go NULL (empty split), the engine
    // reports NULL rows and never scores again — but DuckDB's
    // least/greatest IGNORE NULLs, so an unguarded score would fold a NULL
    // z to a concrete p=1000000 and the next round would emit numbers the
    // engine never computes. Guard the score on w0 IS NULL, and make
    // n_correct's CASE re-propagate the NULL p (its inner CASE would
    // otherwise collapse NULL to pred=0 and count y=0 rows).
    def round(i: Int) =
      s"""${p}s$i AS (SELECT f.*, CASE WHEN w.w0 IS NULL THEN NULL
         |    ELSE greatest(0, least(1000000,
         |    500000 + (w.w0*f.x0 + w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3) // 4)) END AS p
         |  FROM ${p}feat f, ${p}w${i - 1} w),
         |${p}g$i AS (SELECT
         |    CAST(sum(x0*(p - y*1000000)) AS BIGINT) AS g0,
         |    CAST(sum(x1*(p - y*1000000)) AS BIGINT) AS g1,
         |    CAST(sum(x2*(p - y*1000000)) AS BIGINT) AS g2,
         |    CAST(sum(x3*(p - y*1000000)) AS BIGINT) AS g3,
         |    CAST(sum(((p - y*1000000) // 1000) * ((p - y*1000000) // 1000)) AS BIGINT) AS sse,
         |    CAST(sum(CASE WHEN p IS NULL THEN NULL
         |      WHEN (CASE WHEN p > 500000 THEN 1 ELSE 0 END) = y
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         |    count(*) AS n FROM ${p}s$i),
         |${p}w$i AS (SELECT
         |    CAST(w.w0 - (g.g0 // (greatest(g.n, 1) * 5)) AS BIGINT) AS w0,
         |    CAST(w.w1 - (g.g1 // (greatest(g.n, 1) * 5)) AS BIGINT) AS w1,
         |    CAST(w.w2 - (g.g2 // (greatest(g.n, 1) * 5)) AS BIGINT) AS w2,
         |    CAST(w.w3 - (g.g3 // (greatest(g.n, 1) * 5)) AS BIGINT) AS w3
         |  FROM ${p}w${i - 1} w, ${p}g$i g),
         |${p}r$i AS (SELECT CAST(${i + iterOffset} AS BIGINT) AS iter,
         |    w.w0, w.w1, w.w2, w.w3,
         |    g.sse, g.n_correct FROM ${p}w$i w, ${p}g$i g)""".stripMargin
    val w0cte =
      if (initW.isEmpty)
        s"""${p}w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
           |  CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3)""".stripMargin
      else s"${p}w0 AS (SELECT * FROM $initW)"
    s"""${p}feat AS (
       |  SELECT $logregFeatSqlCols
       |  FROM documents$featWhere),
       |$w0cte,
       |${(1 to rounds).map(round).mkString(",\n")}""".stripMargin
  }

  val trainLogregQualitySql =
    s"""WITH ${logregSqlChain("")}
       |SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3""".stripMargin

  /** HELD-OUT EVALUATION of the trained classifier — the eval discipline
    * the other detector lanes already have (`dedup_recall_eval`,
    * `ann_recall_eval`): train 3 GD rounds on the even-doc_id half, score
    * the odd-doc_id half the model NEVER saw, and gate the confusion
    * matrix + integer precision/recall (ppm). A trainer whose loss falls
    * can still be memorizing; this is the query that proves the model
    * GENERALIZES (95.2% held-out accuracy at sf0.01). Same scale shape as
    * [[trainLogregQuality]] (driver-held weights, no join) plus one final
    * narrow scoring pass over the held-out partition of the SAME cached
    * feature frame. `coalesce`/`greatest` keep an empty eval split at an
    * all-zero row instead of a NULL-division crash. */
  val trainLogregEval: Q = (s, dir) => {
    val S = 1000000L
    val feat = logregFeatures(s, dir).persist()
    val w = logregTrain(feat.filter(col("doc_id") % 2 === 0), 3)
      .getOrElse(Array(0L, 0L, 0L, 0L)) // empty corpus: eval split is empty too
    feat.filter(col("doc_id") % 2 === 1)
      .withColumn("z",
        lit(w(0)) * col("x0") + lit(w(1)) * col("x1") +
          lit(w(2)) * col("x2") + lit(w(3)) * col("x3"))
      .withColumn("pred",
        (greatest(lit(0L), least(lit(S), lit(S / 2) + expr("z div 4"))) > lit(S / 2))
          .cast("long"))
      .agg(
        count(lit(1)).as("n_eval"),
        coalesce(sum(when(col("pred") === 1L && col("y") === 1L, 1L).otherwise(0L)), lit(0L)).as("tp"),
        coalesce(sum(when(col("pred") === 1L && col("y") === 0L, 1L).otherwise(0L)), lit(0L)).as("fp"),
        coalesce(sum(when(col("pred") === 0L && col("y") === 0L, 1L).otherwise(0L)), lit(0L)).as("tn"),
        coalesce(sum(when(col("pred") === 0L && col("y") === 1L, 1L).otherwise(0L)), lit(0L)).as("fn"))
      .select(col("n_eval"), col("tp"), col("fp"), col("tn"), col("fn"),
        expr("tp * 1000000 div greatest(tp + fp, 1)").as("precision_ppm"),
        expr("tp * 1000000 div greatest(tp + fn, 1)").as("recall_ppm"))
  }
  val trainLogregEvalSql =
    s"""WITH ${logregSqlChain(" WHERE doc_id % 2 = 0")},
       |ev AS (
       |  SELECT $logregFeatSqlCols
       |  FROM documents WHERE doc_id % 2 = 1),
       |sc AS (SELECT e.y,
       |    -- coalesce, not NULL-propagate: the Scala evaluator falls back
       |    -- to ZERO weights when training died on an empty split
       |    -- (logregTrain.getOrElse), so the oracle must score the same
       |    -- zero model, not emit NULLs
       |    CASE WHEN greatest(0, least(1000000,
       |      500000 + (coalesce(w.w0, 0)*e.x0 + coalesce(w.w1, 0)*e.x1
       |        + coalesce(w.w2, 0)*e.x2 + coalesce(w.w3, 0)*e.x3) // 4)) > 500000
       |      THEN 1 ELSE 0 END AS pred
       |  FROM ev e, w3 w),
       |a AS (SELECT count(*) AS n_eval,
       |    CAST(coalesce(sum(CASE WHEN pred = 1 AND y = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS tp,
       |    CAST(coalesce(sum(CASE WHEN pred = 1 AND y = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS fp,
       |    CAST(coalesce(sum(CASE WHEN pred = 0 AND y = 0 THEN 1 ELSE 0 END), 0) AS BIGINT) AS tn,
       |    CAST(coalesce(sum(CASE WHEN pred = 0 AND y = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS fn
       |  FROM sc)
       |SELECT n_eval, tp, fp, tn, fn,
       |  CAST(tp * 1000000 // greatest(tp + fp, 1) AS BIGINT) AS precision_ppm,
       |  CAST(tp * 1000000 // greatest(tp + fn, 1) AS BIGINT) AS recall_ppm
       |FROM a""".stripMargin

  def defs: Map[String, (Q, Option[String])] = Map(
    "domain_stats" -> (domainStats, Some(domainStatsSql)),
    "train_logreg_quality" -> (trainLogregQuality, Some(trainLogregQualitySql)),
    "train_logreg_eval" -> (trainLogregEval, Some(trainLogregEvalSql)),
    "train_logreg_incremental" -> (trainLogregIncremental, Some(trainLogregIncrementalSql)),
    "label_propagation" -> (labelPropagation, Some(labelPropagationSql)),
    "bpe_train_merges" -> (bpeTrainMerges, Some(bpeTrainMergesSql)),
    "pipeline_quality_filter" -> (pipelineQualityFilter, Some(pipelineQualityFilterSql)),
    "phrase_search" -> (phraseSearch, Some(phraseSearchSql)),
    "link_fuzzy_edit" -> (linkFuzzyEdit, Some(linkFuzzyEditSql)),
    "link_fuzzy_capped" -> (linkFuzzyCapped, Some(linkFuzzyCappedSql)),
    "pack_sequences" -> (packSequences, Some(packSequencesSql)),
    "text_diversity" -> (textDiversity, Some(textDiversitySql)),
    "dedup_spans" -> (dedupSpans, Some(dedupSpansSql)),
    "text_pmi" -> (textPmi, Some(textPmiSql)),
    "decontaminate_bloom" -> (decontaminateBloom, Some(decontaminateBloomSql)),
    "bpe_pair_counts" -> (bpePairCounts, Some(bpePairCountsSql)),
    "sample_quality_weighted" -> (sampleQualityWeighted, Some(sampleQualityWeightedSql)),
    "sample_mixture_balance" -> (sampleMixtureBalance, Some(sampleMixtureBalanceSql)),
    "sample_temperature" -> (sampleTemperature, Some(sampleTemperatureSql)),
    "dedup_prefix" -> (dedupPrefix, Some(dedupPrefixSql)),
    "text_block_dedup" -> (textBlockDedup, Some(textBlockDedupSql)),
    "text_bm25" -> (textBm25, Some(textBm25Sql)),
    "text_lm_score" -> (textLmScore, Some(textLmScoreSql)),
    "text_urls" -> (textUrls, Some(textUrlsSql)),
    "text_decontaminate" -> (textDecontaminate, Some(textDecontaminateSql)),
    "text_repetition" -> (textRepetition, Some(textRepetitionSql)),
    "text_chunk" -> (textChunk, Some(textChunkSql)),
    "sample_stratified" -> (sampleStratified, Some(sampleStratifiedSql)),
    "sample_reservoir" -> (sampleReservoir, Some(sampleReservoirSql)),
    "dedup_minhash_incremental" -> (dedupMinhashIncremental, Some(dedupMinhashIncrementalSql)),
    "text_gopher" -> (textGopher, Some(textGopherSql)),
    "text_tfidf" -> (textTfidf, Some(textTfidfSql)),
    "sample_split" -> (sampleSplit, Some(sampleSplitSql)),
    "shard_by_size" -> (shardBySize, Some(shardBySizeSql)),
    "text_normalize" -> (textNormalize, Some(textNormalizeSql)),
    "dedup_clusters" -> (dedupClusters, Some(dedupClustersSql)),
    "dedup_clusters_star" -> (dedupClustersStar, Some(dedupClustersSql)),
    "dedup_clusters_keepbest" -> (dedupClustersKeepbest, Some(dedupClustersKeepbestSql)),
    "dedup_sha256" -> (dedupSha256, Some(dedupSha256Sql)),
    "text_tokens" -> (textTokens, Some(textTokensSql)),
    "text_bpe" -> (textBpe, Some(textBpeSql)),
    "text_redact_pii" -> (textRedactPii, Some(textRedactPiiSql)),
    "text_quality" -> (textQuality, Some(textQualitySql)),
    "text_langid" -> (textLangid, Some(textLangidSql)),
    "text_fingerprint" -> (textFingerprint, Some(textFingerprintSql)),
    "dedup_exact" -> (dedupExact, Some(dedupExactSql)),
    "dedup_incremental" -> (dedupIncremental, Some(dedupIncrementalSql)),
    "text_classify_linear" -> (textClassifyLinear, Some(textClassifyLinearSql)),
    "dedup_ngram_jaccard" -> (dedupNgramJaccard, Some(dedupNgramJaccardSql)),
    "dedup_minhash" -> (dedupMinhash, Some(dedupMinhashSql)),
    "dedup_minhash_lsh" -> (dedupMinhashLsh, Some(dedupMinhashLshSql)),
    "dedup_minhash_cc" -> (dedupMinhashCc, Some(dedupMinhashCcSql)),
    "dedup_containment" -> (dedupContainment, Some(dedupContainmentSql)),
    "dedup_url" -> (dedupUrl, Some(dedupUrlSql)),
    "dedup_recall_eval" -> (dedupRecallEval, Some(dedupRecallEvalSql)),
    "dedup_simhash" -> (dedupSimhash, Some(dedupSimhashSql)),
  )
}
