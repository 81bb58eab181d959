package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions._

/** Round-8 queries: the curation tail of an LLM training-data pipeline —
  * PII redaction, mixture rebalancing, incremental batch-vs-corpus dedup,
  * sequence packing, and the end-to-end quality-gate funnel. Same oracle-
  * parity rules as [[Queries]] (exact integer/decimal arithmetic, total
  * ORDER BY, matched aliases).
  */
object Queries4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ------------------------------------------------------------ q52_redaction
  /** PII redaction ([[graft.operators.Redaction]]): scrub emails, IPv4s,
    * and phone numbers; report per-category counts plus the redacted
    * text. The synthetic corpus carries no PII, so the query injects a
    * deterministic `doc_id`-derived suffix (every doc an email, every
    * 3rd a phone, every 7th an IP) identically in both engines — the
    * oracle pins pattern SEMANTICS (RE2/Java common subset), replacement
    * order (emails, then IPs, then phones), and counts. Narrow map-only
    * pass: at 100 TB this fuses into the scan, no shuffle before the
    * final ORDER BY.
    */
  val q52Redaction = {
    import graft.operators.Redaction._
    // DuckDB regexp_replace is first-match-only without the 'g' flag;
    // Spark's replaces all matches — the flag is part of oracle parity.
    QueryDef(
      "q52_redaction",
      (s, dir) => {
        import s.implicits._
        val raw = concat(
          $"text",
          lit(" Contact user"), $"doc_id".cast("string"), lit("@example.com."),
          when($"doc_id" % 3 === 0,
            concat(lit(" Call ("), ($"doc_id" % 800 + 100).cast("string"),
              lit(") 555-"), lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
              lit("."))).otherwise(""),
          when($"doc_id" % 7 === 0,
            concat(lit(" Host 10."), ($"doc_id" % 256).cast("string"),
              lit(".0."), ($"doc_id" % 200 + 1).cast("string"),
              lit("."))).otherwise(""))
        t(s, dir, "documents")
          .select($"doc_id", raw.as("raw"), length($"text").as("_tl"))
          // the email+IP-redacted intermediate is computed ONCE as a
          // named column; the phone count and the final redaction both
          // read it (inlining the one-shot composed forms re-ran these
          // two regex passes per consumer — the round-8 ~30% finding)
          .select($"doc_id", $"_tl",
            graft.operators.Redaction.emailCount($"raw").cast("long").as("n_email"),
            graft.operators.Redaction.ipv4Count($"raw").cast("long").as("n_ip"),
            graft.operators.Redaction.redactEmailIp($"raw").as("_eir"))
          .select($"doc_id", $"_tl", $"n_email", $"n_ip",
            graft.operators.Redaction.phoneCount($"_eir").cast("long").as("n_phone"),
            graft.operators.Redaction.redactPhones($"_eir").as("_red"))
          // the injected suffix starts right after the original text and
          // redaction never changes the PII-free prefix's length (the
          // corpus carries no bare-text PII — pinned by RedactionSpec's
          // corpus-invariant case), so the tail shows exactly the
          // redacted injections (compact output — the full body would
          // just echo the corpus through the hash)
          .select($"doc_id", $"n_email", $"n_ip", $"n_phone",
            $"_red".substr($"_tl" + 1, length($"_red")).as("redacted_tail"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH raw AS (
          SELECT doc_id, length(text) AS tl,
                 text || ' Contact user' || CAST(doc_id AS VARCHAR) || '@example.com.' ||
                 CASE WHEN doc_id % 3 = 0 THEN
                   ' Call (' || CAST(doc_id % 800 + 100 AS VARCHAR) || ') 555-' ||
                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.'
                 ELSE '' END ||
                 CASE WHEN doc_id % 7 = 0 THEN
                   ' Host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
                   CAST(doc_id % 200 + 1 AS VARCHAR) || '.'
                 ELSE '' END AS raw
          FROM documents),
        eir AS (
          SELECT doc_id, tl,
                 CAST(len(regexp_extract_all(raw, '$EmailPattern')) AS BIGINT) AS n_email,
                 CAST(len(regexp_extract_all(raw, '$Ipv4Pattern')) AS BIGINT) AS n_ip,
                 regexp_replace(regexp_replace(raw, '$EmailPattern', '$EmailToken', 'g'),
                   '$Ipv4Pattern', '$IpToken', 'g') AS e
          FROM raw)
        SELECT doc_id, n_email, n_ip,
               CAST(len(regexp_extract_all(e, '$PhonePattern')) AS BIGINT) AS n_phone,
               substr(regexp_replace(e, '$PhonePattern', '$PhoneToken', 'g'), tl + 1)
                 AS redacted_tail
        FROM eir ORDER BY doc_id"""))
  }

  // ---------------------------------------------------- q57_redaction_unicode
  /** Unicode redaction parity: same operator as q52, but the injected
    * PII is the kind ASCII-only patterns miss on real web text — IDN
    * emails with non-ASCII local parts ("müller…@bücher….example") and
    * phones whose digit groups are separated by NBSP (U+00A0), thin
    * space (U+2009), or narrow NBSP (U+202F). Both engines run the
    * IDENTICAL pattern text (`\p{L}` classes, `\x{…}` space escapes —
    * the Java-regex/RE2 common subset), so the driver's hash compare
    * pins the unicode semantics cross-engine, not just in a spec.
    * Same staged single-evaluation shape and scale story as q52.
    */
  val q57RedactionUnicode = {
    import graft.operators.Redaction._
    QueryDef(
      "q57_redaction_unicode",
      (s, dir) => {
        import s.implicits._
        val raw = concat(
          $"text",
          lit(" Grüße von müller"), $"doc_id".cast("string"),
          lit("@bücher"), ($"doc_id" % 7).cast("string"), lit(".example."),
          when($"doc_id" % 3 === 0,
            concat(lit(" Ruf +1 "), ($"doc_id" % 800 + 100).cast("string"),
              lit(" 555 "), lpad(($"doc_id" % 10000).cast("string"), 4, "0"),
              lit(" an."))).otherwise(""),
          when($"doc_id" % 5 === 0,
            concat(lit(" Tel: "), ($"doc_id" % 800 + 100).cast("string"),
              lit(" 555 "), lpad(($"doc_id" % 9999).cast("string"), 4, "9"),
              lit("."))).otherwise(""))
        t(s, dir, "documents")
          .select($"doc_id", raw.as("raw"), length($"text").as("_tl"))
          .select($"doc_id", $"_tl",
            graft.operators.Redaction.emailCount($"raw").cast("long").as("n_email"),
            graft.operators.Redaction.redactEmailIp($"raw").as("_eir"))
          .select($"doc_id", $"_tl", $"n_email",
            graft.operators.Redaction.phoneCount($"_eir").cast("long").as("n_phone"),
            graft.operators.Redaction.redactPhones($"_eir").as("_red"))
          .select($"doc_id", $"n_email", $"n_phone",
            $"_red".substr($"_tl" + 1, length($"_red")).as("redacted_tail"))
          .orderBy($"doc_id")
      },
      Some(s"""
        WITH raw AS (
          SELECT doc_id, length(text) AS tl,
                 text || ' Grüße von müller' || CAST(doc_id AS VARCHAR) ||
                 '@bücher' || CAST(doc_id % 7 AS VARCHAR) || '.example.' ||
                 CASE WHEN doc_id % 3 = 0 THEN
                   ' Ruf' || chr(160) || '+1' || chr(160) ||
                   CAST(doc_id % 800 + 100 AS VARCHAR) || chr(8201) || '555' || chr(8201) ||
                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' an.'
                 ELSE '' END ||
                 CASE WHEN doc_id % 5 = 0 THEN
                   ' Tel:' || chr(8239) || CAST(doc_id % 800 + 100 AS VARCHAR) ||
                   chr(160) || '555' || chr(160) ||
                   lpad(CAST(doc_id % 9999 AS VARCHAR), 4, '9') || '.'
                 ELSE '' END AS raw
          FROM documents),
        eir AS (
          SELECT doc_id, tl,
                 CAST(len(regexp_extract_all(raw, '$EmailPattern')) AS BIGINT) AS n_email,
                 regexp_replace(regexp_replace(raw, '$EmailPattern', '$EmailToken', 'g'),
                   '$Ipv4Pattern', '$IpToken', 'g') AS e
          FROM raw)
        SELECT doc_id, n_email,
               CAST(len(regexp_extract_all(e, '$PhonePattern')) AS BIGINT) AS n_phone,
               substr(regexp_replace(e, '$PhonePattern', '$PhoneToken', 'g'), tl + 1)
                 AS redacted_tail
        FROM eir ORDER BY doc_id"""))
  }

  // ----------------------------------------------------------- q53_domain_mix
  /** Mixture rebalancing ([[graft.operators.Sampling.rebalanceToMix]]):
    * downsample to a 40/15/15/15/15 language mix. The stratum histogram
    * is one tiny partial-agg shuffle, thresholds are exact BIGINT
    * arithmetic broadcast back, and the keep decision is a narrow
    * deterministic hash cut — the audit query reports the per-language
    * kept counts.
    */
  val q53DomainMix = QueryDef(
    "q53_domain_mix",
    (s, dir) => {
      import s.implicits._
      import graft.operators.Sampling
      val targets = Map(
        "en" -> (8, 20), "de" -> (3, 20), "es" -> (3, 20),
        "fr" -> (3, 20), "zh" -> (3, 20))
      Sampling.rebalanceToMix(
        t(s, dir, "documents"),
        key = $"doc_id".cast("string"), stratum = $"lang",
        targets, seed = 31)
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_kept"),
          sum($"n_chars").cast("long").as("sum_chars"))
        .orderBy($"lang")
    },
    Some("""
      WITH hist AS (SELECT lang, count(*) AS n FROM documents GROUP BY 1),
      tgt AS (SELECT * FROM (VALUES ('en', 8, 20), ('de', 3, 20), ('es', 3, 20),
                                    ('fr', 3, 20), ('zh', 3, 20)) t(lang, num, den)),
      j AS (SELECT lang, n, num, den FROM hist JOIN tgt USING (lang)),
      tt AS (SELECT min(n * den // num) AS t FROM j),
      thr AS (SELECT lang, ((t * num // den) * 10000) // n AS cut
              FROM j CROSS JOIN tt)
      SELECT d.lang, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      FROM documents d JOIN thr ON d.lang = thr.lang
      WHERE CAST(('0x' || substr(md5('31:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
            % 10000 < cut
      GROUP BY d.lang ORDER BY d.lang"""))

  // ----------------------------------------------------- q54_incremental_dedup
  /** Incremental dedup: probe a NEW batch (every 10th doc) against the
    * EXISTING corpus via cross-corpus banded LSH
    * ([[graft.operators.Dedup.lshCrossPairs]]) + exact Jaccard verify —
    * the daily-ingest shape. The query runs the PRODUCTION protocol,
    * not a demo approximation of it: the corpus half is shingled,
    * signed, banded once and written as the bucketed band index
    * ([[graft.operators.Dedup.writeBandIndex]] — at 100 TB this is the
    * one-time index build), the probe and the Jaccard verify equi-join
    * INTO those bucketed tables from disk (no corpus-side shuffle, no
    * corpus-side cache — pinned by DedupSpec's plan assertion), and
    * only the small batch side is persisted. Output: per batch doc,
    * its near-dup partner count in the corpus and the keep verdict.
    */
  val q54IncrementalDedup = QueryDef(
    "q54_incremental_dedup",
    (s, dir) => {
      import s.implicits._
      import graft.operators.Dedup
      val shBase = t(s, dir, "documents")
        .select($"doc_id", ($"doc_id" % 10 === 7).as("is_new"),
          Dedup.shingleHashes3(Dedup.wordHashes(words($"text"))).as("sh"))
        .filter(size($"sh") > 0)
      // corpus half: computed once, written as the bucketed index —
      // NEVER persisted in executor memory (it is corpus-sized)
      val corpus = shBase.filter(!$"is_new").select($"doc_id", $"sh")
      val corpusBands = Dedup.lshBands(
        corpus.select($"doc_id", Dedup.minhashSig($"sh", 8).as("sig")),
        "doc_id", "sig", bands = 4, rowsPerBand = 2)
      Dedup.writeBandIndex(corpusBands, corpus, "doc_id",
        "graft_q54_corpus", buckets = 8)
      val (bandsDisk, shDisk) = Dedup.readBandIndex(s, "graft_q54_corpus")
      // batch half: the only persisted frame — small by construction
      val batchBase = shBase.filter($"is_new")
      val batch =
        if (batchBase.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
          batchBase.persist() else batchBase
      val newBands = Dedup.lshBands(
        batch.select($"doc_id", Dedup.minhashSig($"sh", 8).as("sig")),
        "doc_id", "sig", bands = 4, rowsPerBand = 2)
      val dups = Dedup.lshCrossPairs(newBands, bandsDisk, "doc_id")
        .join(batch.select($"doc_id".as("id_new"), $"sh".as("sh_a")), "id_new")
        .join(shDisk.select($"doc_id".as("id_old"), $"sh".as("sh_b")), "id_old")
        .filter(Dedup.jaccard($"sh_a", $"sh_b") >= 0.5)
        .groupBy($"id_new").agg(count(lit(1)).as("n_dup_partners"))
      batch.select($"doc_id".as("id_new"))
        .join(dups, Seq("id_new"), "left")
        .select($"id_new".as("doc_id"),
          coalesce($"n_dup_partners", lit(0L)).as("n_dup_partners"),
          (coalesce($"n_dup_partners", lit(0L)) === 0).as("kept"))
        .orderBy($"doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS w,
               list_transform(string_split(text, ' '),
                 x -> CAST(('0x' || substr(md5('0:' || x), 1, 15)) AS BIGINT)) AS wh
        FROM documents),
      shf AS (
        SELECT doc_id,
               list_transform(range(0, len(w) - 2), i ->
                 ((wh[i+1] % 1073741824) * 37 + (wh[i+2] % 1073741824)) % 1073741789
                   * 41 + (wh[i+3] % 1073741824)) AS sh0
        FROM toks WHERE len(w) >= 3),
      shx AS (SELECT doc_id, list_transform(sh0, v -> v % 1073741789) AS sh FROM shf),
      mh AS (
        SELECT doc_id,
               list_transform([31, 37, 41, 43, 47, 53, 59, 61], a ->
                 list_min(list_transform(sh,
                   h -> (a * (h % 1073741824) + a*7 + 3) % 1073741789))) AS sig
        FROM shx),
      bands AS (
        SELECT doc_id, b,
               md5(b || ':' || sig[2*b+1] || ',' || sig[2*b+2]) AS band_key
        FROM mh, unnest(range(0, 4)) AS tt(b)),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_new, c.doc_id AS id_old
        FROM bands a JOIN bands c USING (b, band_key)
        WHERE a.doc_id % 10 = 7 AND c.doc_id % 10 != 7),
      dups AS (
        SELECT id_new, count(*) AS n_dup_partners
        FROM cand
        JOIN shx sa ON sa.doc_id = id_new
        JOIN shx sb ON sb.doc_id = id_old
        WHERE CAST(len(list_distinct(list_intersect(sa.sh, sb.sh))) AS DOUBLE)
              / len(list_distinct(list_concat(sa.sh, sb.sh))) >= 0.5
        GROUP BY 1)
      SELECT s.doc_id,
             CAST(coalesce(n_dup_partners, 0) AS BIGINT) AS n_dup_partners,
             coalesce(n_dup_partners, 0) = 0 AS kept
      FROM shx s LEFT JOIN dups ON dups.id_new = s.doc_id
      WHERE s.doc_id % 10 = 7
      ORDER BY s.doc_id"""))

  // -------------------------------------------------------- q55_sequence_pack
  /** Sequence packing ([[graft.operators.Packing.sequencePack]]): lay the
    * corpus out in deterministic hash-shuffled order and assign each doc
    * to the 2048-token pack where its first token lands. Counts are
    * SUBWORD tokens ([[graft.functions.BpeTokenCount]]) so pack
    * boundaries line up with what a trainer's tokenizer would fill —
    * whitespace counts mis-assigned them by the ~1.4x subword/word
    * ratio. The global prefix sum is the two-phase form (range
    * partitions + broadcast offsets — no single-partition window).
    * Output: per-pack audit (doc count, token sum, id range).
    */
  val q55SequencePack = QueryDef(
    "q55_sequence_pack",
    (s, dir) => {
      import s.implicits._
      import graft.operators.{Packing, TextAnalysis}
      val docs = t(s, dir, "documents")
        .select($"doc_id", TextAnalysis.subwordCount($"text").as("n_tok"))
      Packing.sequencePack(docs, "doc_id", "n_tok", packSize = 2048)
        .groupBy($"pack_id")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tok").cast("long").as("pack_tokens"),
          min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
        .orderBy($"pack_id")
    },
    Some(s"""
      WITH d AS (
        SELECT doc_id, ${graft.functions.BpeTokenCount.duckdbSql("text")} AS n_tok,
               CAST(('0x' || substr(md5('17:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        FROM documents),
      c AS (
        SELECT doc_id, n_tok,
               SUM(n_tok) OVER (ORDER BY h, doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM d)
      SELECT CAST((cum - n_tok) // 2048 AS BIGINT) AS pack_id,
             count(*) AS n_docs,
             CAST(sum(n_tok) AS BIGINT) AS pack_tokens,
             min(doc_id) AS min_doc, max(doc_id) AS max_doc
      FROM c GROUP BY 1 ORDER BY pack_id"""))

  // --------------------------------------------------------- q56_quality_gate
  /** The curation funnel end-to-end: every document gets ONE verdict —
    * `repetition` (intra-doc duplicate-shingle fraction > 0.3, the q46
    * gate), else `low_quality` (composite q13 score < 0.5), else `kept`
    * — and the audit reports doc counts and mean quality per (lang,
    * verdict). One narrow scoring pass (shingles + quality fuse into the
    * scan) and one partial-agg shuffle on the tiny (lang, verdict) key.
    */
  val q56QualityGate = {
    import Queries2.Vocab._
    val sqlPunct = graft.operators.TextAnalysis.PunctClass.replace("'", "''")
    def sqlList(ws: Seq[String]) = ws.map(w => s"'$w'").mkString("[", ", ", "]")
    QueryDef(
      "q56_quality_gate",
      (s, dir) => {
        import s.implicits._
        import graft.operators.{Dedup, TextAnalysis}
        val scored = t(s, dir, "documents")
          .select($"doc_id", $"lang",
            Dedup.shingleHashes3(Dedup.wordHashes(words($"text"))).as("sh"),
            TextAnalysis.qualityScore($"text", stopwords).as("quality"))
          .select($"doc_id", $"lang", $"quality",
            when(size($"sh") === 0, lit(0.0)).otherwise(
              round(lit(1.0) - size(array_distinct($"sh")).cast("double")
                / size($"sh"), 6)).as("dup_frac"))
          .select($"doc_id", $"lang", $"quality",
            when($"dup_frac" > 0.3, "repetition")
              .when($"quality" < 0.5, "low_quality")
              .otherwise("kept").as("verdict"))
        // exact decimal sum → double at the end: a float avg is order-
        // dependent across shuffles; this is reproducible at any scale
        scored.groupBy($"lang", $"verdict")
          .agg(count(lit(1)).as("n_docs"),
            round(sum($"quality".cast("decimal(18,6)")).cast("double")
              / count(lit(1)), 6).as("avg_quality"))
          .orderBy($"lang", $"verdict")
      },
      Some(s"""
        WITH base AS (
          SELECT doc_id, lang, text,
                 string_split(text, ' ') AS w,
                 string_split(lower(text), ' ') AS lw,
                 list_transform(string_split(text, ' '),
                   x -> CAST(('0x' || substr(md5('0:' || x), 1, 15)) AS BIGINT)) AS wh
          FROM documents),
        shd AS (
          SELECT doc_id, lang, text, w, lw,
                 CASE WHEN len(w) >= 3 THEN
                   list_transform(
                     list_transform(range(0, len(w) - 2), i ->
                       ((wh[i+1] % 1073741824) * 37 + (wh[i+2] % 1073741824)) % 1073741789
                         * 41 + (wh[i+3] % 1073741824)),
                     v -> v % 1073741789)
                 ELSE CAST([] AS BIGINT[]) END AS sh
          FROM base),
        m AS (
          SELECT doc_id, lang,
                 CASE WHEN len(sh) = 0 THEN 0.0
                      ELSE round(1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh), 6)
                 END AS dup_frac,
                 round(greatest(0.0,
                   least(CAST(len(w) AS DOUBLE) / 100.0, 1.0) * 0.5
                   + least(round(CAST(len(list_filter(lw, x ->
                       list_contains(${sqlList(stopwords)}, x))) AS DOUBLE) / len(lw), 6)
                     * 4.0, 1.0) * 0.3
                   - least(round(CAST(length(text) - length(regexp_replace(text, '$sqlPunct', '', 'g'))
                       AS DOUBLE) / length(text), 6) * 5.0, 1.0) * 0.2
                   + 0.2), 6) AS quality
          FROM shd),
        v AS (
          SELECT lang,
                 CASE WHEN dup_frac > 0.3 THEN 'repetition'
                      WHEN quality < 0.5 THEN 'low_quality'
                      ELSE 'kept' END AS verdict,
                 quality
          FROM m)
        SELECT lang, verdict, count(*) AS n_docs,
               round(CAST(SUM(CAST(quality AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
                 AS avg_quality
        FROM v GROUP BY 1, 2 ORDER BY lang, verdict"""))
  }

  // ------------------------------------------------------ q58_substring_dedup
  /** Substring-level exact dedup ([[graft.operators.Dedup.repeatedSpans]]):
    * 10-token spans repeated across documents — the boilerplate/
    * syndication duplication doc-level dedup can't see. Output: per
    * affected doc, the repeated-window count, merged span count, and
    * covered token count. Scale shape is hashed n-gram offsets
    * (bucketed by hash, never all-pairs) + one per-doc window pass;
    * the oracle replays the zero-initialized fold hash with
    * list_reduce over the same mod-2³⁰/mod-p arithmetic.
    */
  val q58SubstringDedup = QueryDef(
    "q58_substring_dedup",
    (s, dir) => {
      import s.implicits._
      import graft.operators.Dedup
      Dedup.repeatedSpans(t(s, dir, "documents"), "doc_id", "text", n = 10)
        .orderBy($"doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_transform(string_split(text, ' '),
                 x -> CAST(('0x' || substr(md5('0:' || x), 1, 15)) AS BIGINT)
                        % 1073741824) AS u
        FROM documents),
      ng AS (
        SELECT doc_id, i AS off,
               list_reduce(list_concat([CAST(0 AS BIGINT)], list_slice(u, i+1, i+10)),
                 (a, b) -> (a * 37 + b) % 1073741789) AS gh
        FROM toks, unnest(range(0, len(u) - 9)) AS t(i)
        WHERE len(u) >= 10),
      rep AS (SELECT gh FROM ng GROUP BY gh HAVING count(DISTINCT doc_id) >= 2),
      hits AS (SELECT ng.doc_id, ng.off FROM ng JOIN rep USING (gh)),
      sp AS (
        SELECT doc_id, off,
               lag(off) OVER (PARTITION BY doc_id ORDER BY off) AS prev
        FROM hits)
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_rep_windows,
             CAST(sum(CASE WHEN prev IS NULL OR off - prev > 10 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_spans,
             CAST(sum(CASE WHEN prev IS NULL THEN 10 ELSE least(off - prev, 10) END)
               AS BIGINT) AS covered_tokens
      FROM sp GROUP BY doc_id ORDER BY doc_id"""))

  // ------------------------------------------------------ q59_simhash_neardup
  /** SimHash Hamming near-dup retrieval
    * ([[graft.operators.Dedup.simhashNearDup]]): 48-bit fingerprints,
    * pairs within Hamming distance 3 via the 4-chunk pigeonhole join —
    * recall is GUARANTEED (any ≤3-bit difference leaves one 12-bit
    * chunk identical), unlike minhash banding's probabilistic recall.
    * Complements q11 (Jaccard/minhash): simhash weights tokens by
    * multiplicity and catches "identical except a few tokens" pairs.
    * The oracle rebuilds the identical fingerprints (q12's bit-vote
    * formula at 48 bits) and replays the chunk join + popcount verify.
    */
  val q59SimhashNeardup = {
    val bits = 48
    val bitSumsSql = (0 until bits)
      .map(b => s"SUM(CASE WHEN (hv >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS b$b")
      .mkString(",\n                 ")
    val simhashSql = (0 until bits)
      .map(b => s"(CASE WHEN b$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    QueryDef(
      "q59_simhash_neardup",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Dedup
        val fp = t(s, dir, "documents")
          .select($"doc_id", Dedup.simhash(words($"text"), bits, 7).as("simhash"))
        Dedup.simhashNearDup(fp, "doc_id", "simhash", maxHamming = 3, bits = bits)
          .orderBy($"id_a", $"id_b")
      },
      Some(s"""
        WITH w AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents),
        h AS (SELECT doc_id,
                     CAST(('0x' || substr(md5('7:' || word), 1, 15)) AS BIGINT) AS hv
              FROM w),
        bits AS (
          SELECT doc_id,
                 $bitSumsSql
          FROM h GROUP BY doc_id),
        sh AS (SELECT doc_id, CAST($simhashSql AS BIGINT) AS simhash FROM bits),
        bands AS (
          SELECT doc_id, simhash, b, (simhash >> (12*b)) & 4095 AS chunk
          FROM sh, unnest(range(0, 4)) AS t(b)),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
                 bit_count(xor(a.simhash, c.simhash)) AS hamming
          FROM bands a JOIN bands c USING (b, chunk)
          WHERE a.doc_id < c.doc_id)
        SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming
        FROM cand WHERE hamming <= 3 ORDER BY id_a, id_b"""))
  }

  // ------------------------------------------------------------- q60_lm_score
  /** Statistical LM quality scoring
    * ([[graft.operators.TextAnalysis.lmSurprisal]]): mean bigram
    * surprisal per document under corpus-counted add-one-smoothed
    * bigram probabilities, quantized to integer centi-nats so the one
    * transcendental (`ln`) sits ~12 orders of magnitude away from the
    * integer rounding boundary and every aggregate is exact — the
    * determinism contract that lets DuckDB replay a log-based score
    * bit-for-bit. The oracle rebuilds the same count tables and the
    * identical NgramHashes bigram fold (prepend-0 list_reduce).
    */
  val q60LmScore = QueryDef(
    "q60_lm_score",
    (s, dir) => {
      import s.implicits._
      import graft.operators.TextAnalysis
      TextAnalysis.lmSurprisal(t(s, dir, "documents"), "doc_id", "text")
        .orderBy($"doc_id")
    },
    Some("""
      WITH toks AS (
        SELECT doc_id, list_transform(string_split(text, ' '),
                 x -> CAST(('0x' || substr(md5('0:' || x), 1, 15)) AS BIGINT)) AS wh
        FROM documents),
      uni AS (
        SELECT u, count(*) AS c1
        FROM (SELECT unnest(wh) AS u FROM toks) GROUP BY u),
      v AS (SELECT count(*) AS vsz FROM uni),
      big AS (
        SELECT doc_id, i AS off,
               list_reduce(list_concat([CAST(0 AS BIGINT)],
                   list_transform(list_slice(wh, i+1, i+2), x -> x % 1073741824)),
                 (a, b) -> (a * 37 + b) % 1073741789) AS bh,
               wh[i+1] AS u1
        FROM toks, unnest(range(0, len(wh) - 1)) AS t(i)
        WHERE len(wh) >= 2),
      bc AS (SELECT bh, count(*) AS c12 FROM big GROUP BY bh),
      sc AS (
        SELECT big.doc_id,
               CAST(round(ln(CAST(c1 + vsz AS DOUBLE) / (c12 + 1)) * 100, 0)
                 AS BIGINT) AS s
        FROM big JOIN bc USING (bh) JOIN uni ON uni.u = big.u1 CROSS JOIN v)
      SELECT doc_id, count(*) AS n_bigrams,
             round(CAST(sum(s) AS DOUBLE) / count(*), 6) AS score
      FROM sc GROUP BY doc_id ORDER BY doc_id"""))

  // ----------------------------------------------------- q61_knn_ivf_indexed
  /** IVF ANN against a PERSISTED index
    * ([[graft.operators.Similarity.writeIvfIndex]] /
    * [[graft.operators.Similarity.knnIvfIndexed]]): q25's exact
    * semantics — same centroids, nprobe=1, k=3, hash-identical output —
    * but run the production way: cell assignment and norms for the
    * corpus are computed once and written as inverted lists bucketed by
    * cell; the probe batch equi-joins into them from disk with no
    * corpus-side shuffle (IvfIndexSpec pins the plan). The vector twin
    * of q54's band index.
    */
  val q61KnnIvfIndexed = {
    import KmeansSql.{sqlCos, sqlDot}
    QueryDef(
      "q61_knn_ivf_indexed",
      (s, dir) => {
        import s.implicits._
        import graft.operators.Similarity
        val e = t(s, dir, "embeddings")
        val centroids = e.filter($"vec_id" % 37 === 0 && $"vec_id" >= 100)
          .orderBy($"vec_id").limit(8)
          .select($"vec_id".as("centroid_id"), $"embedding".as("centroid_vec"))
        val corpus = e.select($"vec_id".as("cand_id"), $"embedding".as("cv"))
        Similarity.writeIvfIndex(corpus, centroids, "graft_q61_ivf", buckets = 8)
        val (cent, lists) = Similarity.readIvfIndex(s, "graft_q61_ivf")
        val probes = e.filter($"vec_id" < 5)
          .select($"vec_id".as("probe_id"), $"embedding".as("pv"))
        Similarity.knnIvfIndexed(probes, cent, lists, k = 3)
          .select($"probe_id", $"cell", $"rn".cast("long").as("rn"), $"cand_id", $"cos")
          .orderBy($"probe_id", $"rn")
      },
      Some(s"""
        WITH cent AS (
          SELECT vec_id AS centroid_id, embedding AS centroid_vec
          FROM embeddings WHERE vec_id % 37 = 0 AND vec_id >= 100
          ORDER BY vec_id LIMIT 8),
        pa AS (
          SELECT probe_id, pv, centroid_id AS cell,
                 ROW_NUMBER() OVER (PARTITION BY probe_id
                   ORDER BY ${sqlCos("pv", "centroid_vec")} DESC, centroid_id) AS crn
          FROM (SELECT vec_id AS probe_id, embedding AS pv FROM embeddings WHERE vec_id < 5), cent),
        pc AS (SELECT probe_id, pv, cell FROM pa WHERE crn = 1),
        ca AS (
          SELECT cand_id, cv, centroid_id AS cell,
                 ROW_NUMBER() OVER (PARTITION BY cand_id
                   ORDER BY ${sqlCos("cv", "centroid_vec")} DESC, centroid_id) AS crn
          FROM (SELECT vec_id AS cand_id, embedding AS cv FROM embeddings), cent),
        cc AS (SELECT cand_id, cv, cell FROM ca WHERE crn = 1),
        s AS (
          SELECT probe_id, pc.cell AS cell, cand_id, ${sqlCos("pv", "cv")} AS cos
          FROM pc JOIN cc USING (cell) WHERE probe_id != cand_id),
        r AS (
          SELECT probe_id, cell, cand_id, cos,
                 CAST(ROW_NUMBER() OVER (PARTITION BY probe_id ORDER BY cos DESC, cand_id) AS BIGINT) AS rn
          FROM s)
        SELECT probe_id, cell, rn, cand_id, cos FROM r
        WHERE rn <= 3 ORDER BY probe_id, rn"""))
  }

  // ------------------------------------------------------ q62_distinct_approx
  /** Cardinality sketches (HyperLogLog `approx_count_distinct`) under
    * the q43 verdict pattern: sketch estimates are engine-specific
    * (Spark HLL++ vs DuckDB HLL never hash-match raw), so each engine
    * emits the exact distinct count plus a SQL-checked verdict that its
    * OWN sketch lands within a conservative error window (20% of exact
    * with a +10 floor — Spark runs rsd=0.05, ~4σ inside; DuckDB's HLL
    * is tighter still). The emitted relation is engine-independent and
    * hash-green iff both sketches honor their bounds. The exact
    * count_distinct pass exists to verify the contract; at 100 TB the
    * SKETCH is the production path (map-side mergeable, O(kB)/group
    * state) and the exact expand-shuffle is what it replaces.
    */
  val q62DistinctApprox = QueryDef(
    "q62_distinct_approx",
    (s, dir) => {
      import s.implicits._
      val melted = t(s, dir, "lineitem")
        .select($"l_returnflag", explode(map(
          lit("part"), $"l_partkey".cast("long"),
          lit("supp"), $"l_suppkey".cast("long"))).as(Seq("metric", "v")))
      melted.groupBy($"l_returnflag", $"metric")
        .agg(count_distinct($"v").as("n_exact"),
          approx_count_distinct($"v", rsd = 0.05).as("_approx"))
        .select($"l_returnflag", $"metric", $"n_exact",
          (abs($"_approx" - $"n_exact") <=
            greatest($"n_exact" * 0.2, lit(10.0))).as("within_bound"))
        .orderBy($"l_returnflag", $"metric")
    },
    Some("""
      WITH m AS (
        SELECT l_returnflag, 'part' AS metric, CAST(l_partkey AS BIGINT) AS v FROM lineitem
        UNION ALL
        SELECT l_returnflag, 'supp' AS metric, CAST(l_suppkey AS BIGINT) AS v FROM lineitem),
      a AS (
        SELECT l_returnflag, metric,
               count(DISTINCT v) AS n_exact,
               approx_count_distinct(v) AS approx
        FROM m GROUP BY 1, 2)
      SELECT l_returnflag, metric, n_exact,
             abs(approx - n_exact) <= greatest(n_exact * 0.2, 10.0) AS within_bound
      FROM a ORDER BY l_returnflag, metric"""))

  /** Registry. */
  def all: Seq[QueryDef] = Seq(
    q52Redaction, q53DomainMix, q54IncrementalDedup, q55SequencePack,
    q56QualityGate, q57RedactionUnicode, q58SubstringDedup, q59SimhashNeardup,
    q60LmScore, q61KnnIvfIndexed, q62DistinctApprox)
}
