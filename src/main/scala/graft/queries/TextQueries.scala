package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.dedup.{Clusters, Contamination, Dedup, ExactSubstrings}
import graft.multimodal.Multimodal
import graft.text.{Boilerplate, Budget, Cooccur, Curation, Dsir, LangModel, Packing, Redact, Retrieval, Shards, TextMetrics, UrlDedup}

/** Training-data pipeline operators over `documents`: text quality metrics,
  * language ID, fingerprinting, and the dedup family (exact, n-gram
  * Jaccard, MinHash+LSH, SimHash). All hashes are md5-derived so the
  * DuckDB oracle reproduces them exactly.
  */
object TextQueries extends QueryPack {

  /** Local index directory for a source-data tag (q99/q100 share it).
    * The sanitizer alone is not injective (`/a/b` and `/a_b` collide
    * onto one directory — the fingerprint keeps results correct but two
    * such corpora alternating would thrash full rebuilds per query), so
    * a short hash of the UNSANITIZED tag makes the mapping injective
    * while the readable prefix stays for humans. */
  private def indexDirFor(tag: String): String = {
    val short = java.security.MessageDigest.getInstance("SHA-256")
      .digest(tag.getBytes("UTF-8")).take(4)
      .map("%02x".format(_)).mkString
    "target/q99_index/" + tag.replaceAll("[^A-Za-z0-9._-]", "_") +
      "_" + short
  }

  /** DuckDB CTEs for word tokens, distinct 3-gram shingles, and the
    * 60-bit md5 shingle hash the Spark side joins on (`shh` mirrors
    * `Dedup.shingleHash` exactly, collisions included). */
  private val ShingleCte =
    """toks AS (
      |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
      |         unnest(string_split(text, ' ')) AS tok FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id,
      |    tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle
      |  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
      |  QUALIFY lead(tok, 2) OVER w IS NOT NULL),
      |shh AS (
      |  SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS shingle
      |  FROM sh)""".stripMargin

  private val JaccardVerifySql =
    """sizes AS (SELECT doc_id, count(*) AS sz FROM shh GROUP BY doc_id),
      |common AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
      |  FROM shh a JOIN shh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)""".stripMargin

  override def queries: Seq[(String, QueryDef)] = Seq(

    "q25_text_metrics" -> QueryDef(
      (s, dir) => TextMetrics.metrics(balanced(Tables.documents(s, dir)), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
          length(text)::BIGINT AS n_chars,
          len(string_split(text, ' '))::BIGINT AS n_tokens,
          len(regexp_extract_all(text, ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+'))::BIGINT
            AS n_tokens_bpeish,
          len(list_distinct(string_split(text, ' ')))::BIGINT AS n_unique_tokens,
          round((length(text) - len(string_split(text, ' ')) + 1)::DOUBLE
                / len(string_split(text, ' ')), 4) AS avg_token_len,
          round(len(list_distinct(string_split(text, ' ')))::DOUBLE
                / len(string_split(text, ' ')), 4) AS type_token_ratio,
          (len(list_filter(string_split(text, ' '), t -> t = 'the'))
           + len(list_filter(string_split(text, ' '), t -> t = 'a'))
           + len(list_filter(string_split(text, ' '), t -> t = 'of'))
           + len(list_filter(string_split(text, ' '), t -> t = 'and'))
           + len(list_filter(string_split(text, ' '), t -> t = 'is')))::BIGINT AS stopword_hits,
          round((len(list_filter(string_split(text, ' '), t -> t = 'the'))
           + len(list_filter(string_split(text, ' '), t -> t = 'a'))
           + len(list_filter(string_split(text, ' '), t -> t = 'of'))
           + len(list_filter(string_split(text, ' '), t -> t = 'and'))
           + len(list_filter(string_split(text, ' '), t -> t = 'is')))::DOUBLE
                / len(string_split(text, ' ')), 4) AS stopword_ratio
        FROM documents ORDER BY doc_id"""),
      "Token counting + quality metrics, no UDFs (north-star text analysis)"),

    "q26_dedup_exact" -> QueryDef(
      (s, dir) => Dedup.exact(balanced(Tables.documents(s, dir)), "doc_id", "text")
        .orderBy(col("digest")),
      Some("""SELECT md5(text) AS digest, min(doc_id) AS canonical_id,
          count(*) AS dup_count
        FROM documents GROUP BY 1 ORDER BY digest"""),
      "Exact dedup via content-hash groupBy (north-star dedup)"),

    // Routed through the memoized pair stream: q27/q81/q91 consume the
    // SAME PPJoin pairs, and a pipeline session pays candidate
    // generation + verify once (the q70→q84 precedent; JaccardCacheSpec
    // has the stage-count proof). Bench/Verify stay honest — their
    // clearCache() between queries empties the persisted storage.
    "q27_ngram_jaccard" -> QueryDef(
      (s, dir) => Dedup.ngramJaccardCached(balanced(Tables.documents(s, dir)), "doc_id", "text",
          n = 3, threshold = 0.8)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH $ShingleCte,
        $JaccardVerifySql
        SELECT id_a, id_b,
          round(common::DOUBLE / (sa.sz + sb.sz - common), 6) AS jaccard
        FROM common JOIN sizes sa ON sa.doc_id = id_a
                    JOIN sizes sb ON sb.doc_id = id_b
        WHERE common::DOUBLE / (sa.sz + sb.sz - common) >= 0.8
        ORDER BY id_a, id_b"""),
      "n-gram Jaccard near-dup pairs via shingle inverted index"),

    "q28_minhash_lsh" -> QueryDef(
      (s, dir) => Dedup.minhashLsh(balanced(Tables.documents(s, dir)), "doc_id", "text",
          n = 3, numHashes = 12, rowsPerBand = 3, threshold = 0.8)
        .withColumn("jaccard", round(col("jaccard"), 6))
        .orderBy(col("id_a"), col("id_b")),
      Some(s"""WITH $ShingleCte,
        seeds AS (SELECT * FROM (VALUES ${Dedup.minhashParams(12).zipWithIndex
          .map { case ((a, b), s) => s"($s, ${a}::BIGINT, ${b}::BIGINT)" }
          .mkString(", ")}) AS t(seed, a, b)),
        hs AS (
          SELECT doc_id, shingle % ${Dedup.MinhashP} AS h
          FROM shh),
        mh AS (
          SELECT doc_id, seed, min((h * a + b) % ${Dedup.MinhashP}) AS mh
          FROM hs CROSS JOIN seeds GROUP BY doc_id, seed),
        bands AS (
          SELECT doc_id, seed // 3 AS band,
                 string_agg(mh::VARCHAR, '|' ORDER BY seed) AS sig
          FROM mh GROUP BY doc_id, seed // 3),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id),
        $JaccardVerifySql
        SELECT c.id_a, c.id_b,
          round(common::DOUBLE / (sa.sz + sb.sz - common), 6) AS jaccard
        FROM cand c JOIN common ON common.id_a = c.id_a AND common.id_b = c.id_b
        JOIN sizes sa ON sa.doc_id = c.id_a JOIN sizes sb ON sb.doc_id = c.id_b
        WHERE common::DOUBLE / (sa.sz + sb.sz - common) >= 0.8
        ORDER BY c.id_a, c.id_b"""),
      "MinHash+LSH banded near-dup with exact-Jaccard verification"),

    // Frame sampling over the video-kind media built from documents:
    // every 4th 32-byte frame, digested. The oracle slices the SAME bytes
    // via hex(encode(text)) (2 hex chars per byte — DuckDB has no blob
    // substring, but hex-string slicing is byte-accurate), so the digests
    // are hash-exact.
    "q75_frame_sample" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val media = Tables.documents(s, dir)
          .filter(col("doc_id") % 3 === 2)
          .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
          .map { case (id, text) =>
            val w = 16 + (id % 64).toInt * 4
            val h = 16 + (id % 48).toInt * 4
            Multimodal.MediaItem(id, "video",
              Multimodal.MediaCodec.encodeFakeHeader(w, h, 3, text.getBytes("UTF-8")))
          }
        Multimodal.sampleFrames(media, frameBytes = 32, everyNth = 4).toDF()
          .select(col("media_id"), col("frame_idx"),
            md5(hex(col("payload"))).as("digest"))
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some("""WITH v AS (
          SELECT doc_id::BIGINT AS media_id, hex(encode(text)) AS hx,
                 octet_length(encode(text)) // 32 AS n_frames
          FROM documents WHERE doc_id % 3 = 2),
        fr AS (SELECT media_id, unnest(range(0, n_frames, 4)) AS frame_idx, hx FROM v)
        SELECT media_id, frame_idx::INT AS frame_idx,
               md5(substring(hx, frame_idx * 64 + 1, 64)) AS digest
        FROM fr ORDER BY media_id, frame_idx"""),
      "Frame sampling over video payloads, byte-exact digests (north-star multimodal)"),

    "q29_simhash" -> QueryDef(
      (s, dir) => Dedup.simhash(balanced(Tables.documents(s, dir)), "doc_id", "text", bits = 60)
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (
          SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
        bits AS (SELECT range AS bit FROM range(60)),
        votes AS (
          SELECT doc_id, bit,
            sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS votes
          FROM h CROSS JOIN bits GROUP BY doc_id, bit)
        SELECT doc_id,
          sum(CASE WHEN votes > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
        FROM votes GROUP BY doc_id ORDER BY doc_id"""),
      "SimHash 60-bit fingerprint from md5 token hashes"),

    // 60-bit fingerprint, 4 pigeonhole segments of 15 bits: 32k buckets
    // per segment. Narrow (8-bit) segments collide catastrophically on a
    // clustered corpus — candidate generation degraded toward quadratic;
    // production simhash banding uses wide segments for exactly this
    // reason.
    "q30_simhash_pairs" -> QueryDef(
      (s, dir) => Dedup.simhashPairs(balanced(Tables.documents(s, dir)), "doc_id", "text",
          bits = 60, maxDist = 3)
        .orderBy(col("id_a"), col("id_b")),
      Some("""WITH toks AS (
          SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS h FROM toks),
        bits AS (SELECT range AS bit FROM range(60)),
        votes AS (
          SELECT doc_id, bit,
            sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS votes
          FROM h CROSS JOIN bits GROUP BY doc_id, bit),
        fp AS (
          SELECT doc_id,
            sum(CASE WHEN votes > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS simhash
          FROM votes GROUP BY doc_id),
        segs AS (SELECT range AS seg FROM range(4)),
        banded AS (
          SELECT doc_id, simhash, seg, (simhash >> (seg * 15)::INT) % 32768 AS seg_val
          FROM fp CROSS JOIN segs),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM banded a JOIN banded b
            ON a.seg = b.seg AND a.seg_val = b.seg_val AND a.doc_id < b.doc_id)
        SELECT id_a, id_b, bit_count(xor(fa.simhash, fb.simhash)) AS hamming
        FROM cand JOIN fp fa ON fa.doc_id = id_a JOIN fp fb ON fb.doc_id = id_b
        WHERE bit_count(xor(fa.simhash, fb.simhash)) <= 3
        ORDER BY id_a, id_b"""),
      "SimHash near-dup pairs via wide pigeonhole segment banding"),

    "q31_langid" -> QueryDef(
      (s, dir) => TextMetrics.languageId(balanced(Tables.documents(s, dir)), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some {
        val score = TextMetrics.LangMarkers.map { case (lang, words) =>
          val expr = words
            .map(w => s"len(list_filter(string_split(text, ' '), t -> t = '$w'))")
            .mkString(" + ")
          s"($expr)::BIGINT AS s_$lang"
        }.mkString(", ")
        val langs = TextMetrics.LangMarkers.map(_._1)
        val m = "greatest(" + langs.map("s_" + _).mkString(", ") + ")"
        val pick = langs.map(l => s"WHEN s_$l = m THEN '$l'").mkString(" ")
        s"""WITH scored AS (SELECT doc_id, $score FROM documents),
           m AS (SELECT *, $m AS m FROM scored)
           SELECT doc_id,
             CASE WHEN m = 0 THEN 'und' $pick END AS predicted_lang,
             m AS marker_hits
           FROM m ORDER BY doc_id"""
      },
      "Stopword-marker language ID heuristic (north-star text analysis)"),

    "q32_fingerprint" -> QueryDef(
      (s, dir) => TextMetrics.fingerprint(balanced(Tables.documents(s, dir)), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, md5(text) AS text_md5,
          md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
            AS bow_md5
        FROM documents ORDER BY doc_id"""),
      "Content + bag-of-words document fingerprints"),

    // Multimodal binary-column pipeline, oracle-checked: documents are
    // wrapped as opaque media payloads (deterministic fake header + UTF-8
    // body), decoded per-partition by the codec stub (payloads never
    // shuffle), and verified byte-exactly via md5(hex(payload)) — the
    // decode metadata (width/height/channels) round-trips through the
    // binary, so the oracle proves the header/codec plumbing, not just
    // the metadata math.
    "q72_multimodal" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val media = Tables.documents(s, dir)
          .select(col("doc_id").cast("long"), col("text")).as[(Long, String)]
          .map { case (id, text) =>
            val w = 16 + (id % 64).toInt * 4
            val h = 16 + (id % 48).toInt * 4
            Multimodal.MediaItem(id,
              if (id % 3 == 0) "image" else if (id % 3 == 1) "audio" else "video",
              Multimodal.MediaCodec.encodeFakeHeader(w, h, 3, text.getBytes("UTF-8")))
          }
        val meta = Multimodal.decode(media).toDF()
        val digests = media.toDF()
          .select(col("media_id"), md5(hex(col("payload"))).as("digest"))
        meta.join(digests, "media_id")
          .select(col("media_id"), col("kind"), col("width"), col("height"),
            col("channels"), col("n_bytes"), col("digest"), col("valid"))
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (SELECT doc_id::BIGINT AS media_id,
          CASE WHEN doc_id % 3 = 0 THEN 'image'
               WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
          (16 + (doc_id % 64) * 4)::INT AS width,
          (16 + (doc_id % 48) * 4)::INT AS height,
          3 AS channels,
          unhex('01'
            || lpad(to_hex((16 + (doc_id % 64) * 4) // 256), 2, '0')
            || lpad(to_hex((16 + (doc_id % 64) * 4) % 256), 2, '0')
            || lpad(to_hex((16 + (doc_id % 48) * 4) // 256), 2, '0')
            || lpad(to_hex((16 + (doc_id % 48) * 4) % 256), 2, '0')
            || '03') || text::BLOB AS payload
          FROM documents)
        SELECT media_id, kind, width, height, channels,
          (octet_length(payload))::BIGINT AS n_bytes,
          md5(upper(hex(payload))) AS digest, TRUE AS valid
        FROM m ORDER BY media_id"""),
      "Opaque media payloads: header encode/decode round-trip, byte-exact (multimodal)"),

    // Deterministic stratified sampling + reproducible training order:
    // membership is a pure function of (seed, doc_id) via the md5 gate
    // (partitioning/run/engine independent), per-stratum rates resolve
    // in one codegen'd filter, and mix_order is the replayable global
    // shuffle any engine can reproduce.
    "q80_stratified_mix" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val sampled = graft.ops.Sampling.stratifiedHashSample(docs, "doc_id",
          "lang", Map("en" -> 0.25, "de" -> 1.0, "fr" -> 0.5),
          defaultRate = 0.1)
        graft.ops.Sampling.withMixOrder(sampled, "doc_id")
          .select(col("doc_id"), col("lang"), col("source"), col("mix_order"))
          .orderBy(col("mix_order"), col("doc_id"))
      },
      Some("""WITH g AS (SELECT doc_id, lang, source,
            ('0x' || substr(md5('smp:' || doc_id::VARCHAR), 1, 8))::BIGINT AS smp,
            ('0x' || substr(md5('mix:' || doc_id::VARCHAR), 1, 8))::BIGINT AS mix_order
          FROM documents)
        SELECT doc_id, lang, source, mix_order FROM g
        WHERE smp < CASE lang WHEN 'en' THEN 1073741824
                              WHEN 'de' THEN 4294967296
                              WHEN 'fr' THEN 2147483648
                              ELSE 429496729 END
        ORDER BY mix_order, doc_id"""),
      "Deterministic stratified sampling + reproducible mix order (training-data staple)"),

    // Pair stream → connected components → canonical purge table: the
    // last stage of the dedup family. Spark runs alternating
    // large-star/small-star over q27's near-dup pairs; DuckDB closes the
    // same edges transitively with a recursive CTE.
    "q81_dedup_clusters" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.ngramJaccardCached(balanced(docs), "doc_id", "text",
          n = 3, threshold = 0.8)
        Clusters.assign(docs, pairs, "doc_id").orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $ShingleCte,
        $JaccardVerifySql,
        pairs AS (
          SELECT id_a, id_b
          FROM common JOIN sizes sa ON sa.doc_id = id_a
                      JOIN sizes sb ON sb.doc_id = id_b
          WHERE common::DOUBLE / (sa.sz + sb.sz - common) >= 0.8),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst),
        comp AS (
          SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
          FROM reach GROUP BY src),
        lab AS (
          SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN comp c USING (doc_id))
        SELECT doc_id, cluster_id,
          count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
          (doc_id = cluster_id)::INT AS keep
        FROM lab ORDER BY doc_id"""),
      "Near-dup pairs → connected components (large-star/small-star) → purge table"),

    "q82_repetition" -> QueryDef(
      (s, dir) => TextMetrics.repetition(balanced(Tables.documents(s, dir)),
          "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        g2 AS (SELECT doc_id,
          unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS g FROM t),
        c2 AS (SELECT doc_id, max(c) AS topc
          FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1),
        g3 AS (SELECT doc_id,
          unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                  for i in range(1, len(toks) - 1)]) AS g FROM t),
        c3 AS (SELECT doc_id, max(c) AS topc
          FROM (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2) GROUP BY 1),
        g5 AS (SELECT doc_id,
          unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]
                  || ' ' || toks[i+4] for i in range(1, len(toks) - 3)]) AS g FROM t),
        c5 AS (SELECT doc_id, count(*) AS tot, count(DISTINCT g) AS dst
          FROM g5 GROUP BY 1)
        SELECT t.doc_id, len(toks)::BIGINT AS n_tokens,
          round(coalesce((2 * c2.topc)::DOUBLE / len(toks), 0), 6) AS top2gram_frac,
          round(coalesce((3 * c3.topc)::DOUBLE / len(toks), 0), 6) AS top3gram_frac,
          round(coalesce((c5.tot - c5.dst)::DOUBLE / c5.tot, 0), 6) AS dup5gram_frac
        FROM t LEFT JOIN c2 USING (doc_id) LEFT JOIN c3 USING (doc_id)
             LEFT JOIN c5 USING (doc_id)
        ORDER BY doc_id"""),
      "In-document repetition signals (top-n-gram / duplicated-n-gram fractions)"),

    // Train/eval contamination: src0 documents play the held-out
    // benchmark; every other source is "the corpus". The oracle hashes
    // 13-grams exactly like the Spark kernel (first 15 md5 hex chars as
    // a 60-bit int), so the report is hash-exact, collisions included.
    "q83_contamination" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        Contamination.ngramOverlap(
          balanced(docs.filter(col("source") =!= "src0")),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", n = 13)
          .orderBy(col("doc_id"))
      },
      Some {
        val sel13 = (0 until 13)
          .map(k => if (k == 0) "toks[i]" else s"toks[i+$k]")
          .mkString(" || ' ' || ")
        s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
             FROM documents),
        g AS (SELECT doc_id, source,
          unnest([$sel13 for i in range(1, len(toks) - 11)]) AS g FROM t),
        gh AS (SELECT DISTINCT doc_id, source,
          ('0x' || substr(md5(g), 1, 15))::BIGINT AS h FROM g),
        ev AS (SELECT DISTINCT h FROM gh WHERE source = 'src0'),
        tr AS (SELECT doc_id, count(*) AS n_grams FROM gh
               WHERE source <> 'src0' GROUP BY 1),
        hits AS (SELECT gh.doc_id, count(*) AS hit_grams FROM gh JOIN ev USING (h)
                 WHERE gh.source <> 'src0' GROUP BY 1)
        SELECT tr.doc_id, tr.n_grams, hits.hit_grams,
          round(hits.hit_grams::DOUBLE / tr.n_grams, 6) AS contamination
        FROM tr JOIN hits USING (doc_id) ORDER BY tr.doc_id"""
      },
      "Train/eval 13-gram contamination report (broadcast benchmark hash set)"),

    // Exact-substring dedup (Lee et al. 2021 ExactSubstr, k-gram-hash
    // form): maximal repeated spans at 8-token resolution. The oracle
    // replays the identical pipeline — positional 60-bit window hashes,
    // corpus-wide occurrence count, gaps-and-islands merge — so spans
    // are hash-exact, collisions included.
    "q85_substring_dedup" -> QueryDef(
      (s, dir) => ExactSubstrings.duplicatedSpans(
          balanced(Tables.documents(s, dir)), "doc_id", "text", k = 8)
        .orderBy(col("doc_id"), col("span_start")),
      Some {
        val k = 8
        val win = (0 until k)
          .map(j => if (j == 0) "toks[i]" else s"toks[i+$j]")
          .mkString(" || ' ' || ")
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
             FROM documents),
        w AS (SELECT doc_id, unnest(range(1, len(toks) - ${k - 2})) AS i, toks
              FROM t),
        h AS (SELECT doc_id, i - 1 AS pos,
          ('0x' || substr(md5($win), 1, 15))::BIGINT AS h FROM w),
        dup AS (SELECT doc_id, pos FROM (
            SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS c FROM h)
          WHERE c >= 2),
        isl AS (SELECT doc_id, pos,
          CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                 <= $k THEN 0 ELSE 1 END AS brk FROM dup),
        sp AS (SELECT doc_id, pos,
          sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS span FROM isl)
        SELECT doc_id, min(pos) AS span_start, (max(pos) + $k) AS span_end,
          count(*) AS n_windows
        FROM sp GROUP BY doc_id, span ORDER BY doc_id, span_start"""
      },
      "Exact-substring dedup: maximal repeated k-token spans (rolling-hash join)"),

    // PII scrub over deterministically PII-bearing text: each doc gets a
    // synthetic email, IPv4, and phone appended (a pure function of
    // doc_id, built identically in both engines) so the operator is
    // exercised on every row; counts and the redacted digest are exact.
    "q86_pii_redact" -> QueryDef(
      (s, dir) => {
        val d = col("doc_id").cast("long")
        val pii = concat(col("text"),
          lit(" contact user"), d.cast("string"),
          lit("@mail.example.com ip 10.0."), (d % 256).cast("string"),
          lit("."), ((d * 7) % 256).cast("string"),
          lit(" tel 555-"), lpad((d % 10000).cast("string"), 4, "0"))
        // balanced BEFORE the regex chain: the scan's split count caps
        // the cores the six regex passes can use (measured at sf100:
        // 8 files -> 8 busy cores of 32)
        val docs = balanced(Tables.documents(s, dir)).withColumn("pii_text", pii)
        Redact.redactPii(docs, "doc_id", "pii_text")
          .select(col("doc_id"), col("n_emails"), col("n_ips"),
            col("n_phones"), md5(col("redacted")).as("redacted_md5"))
          .orderBy(col("doc_id"))
      },
      Some {
        val ep = Redact.EmailPattern
        val ip = Redact.Ipv4Pattern
        val pp = Redact.PhonePattern
        s"""WITH p AS (SELECT doc_id,
            text || ' contact user' || doc_id::BIGINT::VARCHAR
                 || '@mail.example.com ip 10.0.'
                 || (doc_id::BIGINT % 256)::VARCHAR || '.'
                 || ((doc_id::BIGINT * 7) % 256)::VARCHAR
                 || ' tel 555-'
                 || lpad((doc_id::BIGINT % 10000)::VARCHAR, 4, '0') AS t0
          FROM documents),
        s1 AS (SELECT doc_id, t0,
          regexp_replace(t0, '$ep', '${Redact.EmailTag}', 'g') AS t1 FROM p),
        s2 AS (SELECT doc_id, t0, t1,
          regexp_replace(t1, '$ip', '${Redact.IpTag}', 'g') AS t2 FROM s1),
        s3 AS (SELECT doc_id, t0, t1, t2,
          regexp_replace(t2, '$pp', '${Redact.PhoneTag}', 'g') AS t3 FROM s2)
        SELECT doc_id,
          len(regexp_extract_all(t0, '$ep'))::BIGINT AS n_emails,
          len(regexp_extract_all(t1, '$ip'))::BIGINT AS n_ips,
          len(regexp_extract_all(t2, '$pp'))::BIGINT AS n_phones,
          md5(t3) AS redacted_md5
        FROM s3 ORDER BY doc_id"""
      },
      "PII scrub: email/IPv4/phone detect + redact with per-doc counts"),

    // DSIR importance weights (Xie et al. 2023): every raw-pool doc
    // scored by the likelihood ratio of its hashed unigram+bigram bag
    // under the target (src0) vs raw feature distributions — the
    // data-selection scorer. Two scans (stats must close before any doc
    // scores), one <=4096-row exchange, scoring is pure map work; the
    // oracle replays the identical hashed-multinomial pipeline, with
    // round(...,6) absorbing cross-engine summation-order ULP like the
    // cosine family.
    "q87_dsir_weights" -> QueryDef(
      (s, dir) => Dsir.importanceWeights(
          balanced(Tables.documents(s, dir)), "doc_id", "text",
          col("source") === "src0")
        .orderBy(col("doc_id")),
      Some {
        val B = Dsir.NumBuckets
        s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
             FROM documents),
        uni AS (SELECT doc_id, source, unnest(toks) AS g FROM t),
        big AS (SELECT doc_id, source,
          unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS g
          FROM t),
        feats AS (SELECT doc_id, source,
            ('0x' || substr(md5(g), 1, 15))::BIGINT % $B AS b, count(*) AS c
          FROM (SELECT * FROM uni UNION ALL SELECT * FROM big) GROUP BY 1, 2, 3),
        tot AS (SELECT b, sum(CASE WHEN source = 'src0' THEN c ELSE 0 END) AS ct,
                       sum(CASE WHEN source <> 'src0' THEN c ELSE 0 END) AS cr
                FROM feats GROUP BY 1),
        sums AS (SELECT sum(ct) AS st, sum(cr) AS sr FROM tot),
        lr AS (SELECT b, ln((ct + 1.0) / (st + $B.0))
                        - ln((cr + 1.0) / (sr + $B.0)) AS lr FROM tot, sums)
        SELECT f.doc_id, sum(f.c)::BIGINT AS n_features,
          round(sum(f.c * lr.lr), 6) AS logw
        FROM feats f JOIN lr USING (b)
        WHERE f.source <> 'src0'
        GROUP BY 1 ORDER BY 1"""
      },
      "DSIR hashed n-gram importance weights (target vs raw corpus)"),

    // Corpus curation capstone: the C4/Gopher-style keep/drop decision
    // table, every signal from ONE mapPartitions scan + one digest
    // exchange (a metrics ⋈ repetition ⋈ dedup composition would read
    // the corpus three times — the q85 plan-audit lesson). Signal
    // semantics are exactly q25/q82/q26's, so the oracle reuses their
    // proven SQL forms; thresholds sit where this corpus genuinely
    // splits (keeps AND all-reason drops at sf0.01).
    "q88_corpus_curation" -> QueryDef(
      (s, dir) => Curation.decide(balanced(Tables.documents(s, dir)),
          "doc_id", "text")
        .orderBy(col("doc_id")),
      Some {
        val r = Curation.Rules()
        val sw = TextMetrics.LangMarkers.toMap.apply("en")
          .map(w => s"len(list_filter(toks, t -> t = '$w'))")
          .mkString(" + ")
        s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks
             FROM documents),
        g2 AS (SELECT doc_id,
          unnest([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS g
          FROM t),
        c2 AS (SELECT doc_id, max(c) AS topc
          FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2) GROUP BY 1),
        base AS (SELECT t.doc_id,
            len(toks)::BIGINT AS n_tokens,
            round((length(text) - len(toks) + 1)::DOUBLE / len(toks), 4)
              AS avg_token_len,
            round(($sw)::DOUBLE / len(toks), 4) AS stopword_ratio,
            round(coalesce(2 * c2.topc, 0)::DOUBLE / len(toks), 6)
              AS top2gram_frac,
            min(t.doc_id) OVER (PARTITION BY md5(text)) <> t.doc_id AS is_dup
          FROM t LEFT JOIN c2 USING (doc_id)),
        d AS (SELECT *,
          CASE WHEN is_dup THEN 'exact_dup'
               WHEN n_tokens < ${r.minTokens} THEN 'too_short'
               WHEN n_tokens > ${r.maxTokens} THEN 'too_long'
               WHEN avg_token_len < ${r.minAvgTokenLen}
                 OR avg_token_len > ${r.maxAvgTokenLen} THEN 'bad_token_len'
               WHEN stopword_ratio < ${r.minStopwordRatio} THEN 'low_stopword'
               WHEN top2gram_frac > ${r.maxTop2gramFrac} THEN 'repetitive'
               ELSE 'keep' END AS verdict
          FROM base)
        SELECT doc_id, n_tokens, avg_token_len, stopword_ratio,
          top2gram_frac, is_dup, verdict, verdict = 'keep' AS keep
        FROM d ORDER BY doc_id"""
      },
      "Corpus curation: Gopher-style keep/drop decisions, one scan + one exchange"),

    // Sequence packing (GPT-style concatenate-and-chunk): each doc's
    // global token offset comes from the two-pass distributed prefix sum
    // (GlobalRank.withRunningOffset — no single-partition window), then
    // boundary-crossing docs explode into per-window fragments with pure
    // codegen'd arithmetic. The oracle's window cumsum is the semantic
    // spec; the Spark side refuses to execute it that way.
    "q89_sequence_packing" -> QueryDef(
      (s, dir) => Packing.fragments(balanced(Tables.documents(s, dir)),
          "doc_id", "text", seqLen = 256L)
        .orderBy(col("doc_id"), col("seq_id")),
      Some {
        val L = 256
        s"""WITH t AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n
             FROM documents),
        c AS (SELECT doc_id, n,
          (sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n)::BIGINT
            AS start FROM t),
        f AS (SELECT doc_id, n, start,
          unnest(range(start // $L, (start + n - 1) // $L + 1)) AS seq_id
          FROM c)
        SELECT doc_id, seq_id,
          (greatest(start, seq_id * $L) - start)::BIGINT AS doc_off,
          (greatest(start, seq_id * $L) - seq_id * $L)::BIGINT AS seq_off,
          (least(start + n, (seq_id + 1) * $L) - greatest(start, seq_id * $L))::BIGINT
            AS n_toks
        FROM f ORDER BY doc_id, seq_id"""
      },
      "Sequence packing: fixed-length training windows via distributed prefix sum"),

    // CCNet-style quality gate: bigram-LM perplexity under a model
    // trained on the trusted src0 slice (the contamination check's
    // held-out framing reused). The oracle replays the identical
    // Laplace term — counts are exact longs, one double division, one
    // ln — and both sides round nll before exp'ing it, so ppl is
    // deterministic across engines.
    "q90_lm_perplexity" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        LangModel.perplexity(
          balanced(docs.filter(col("source") =!= "src0")),
          docs.filter(col("source") === "src0"),
          "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS toks
             FROM documents),
        rg AS (SELECT unnest([toks[i] || ' ' || toks[i+1]
                              for i in range(1, len(toks))]) AS g
               FROM t WHERE source = 'src0'),
        bc AS (SELECT g, count(*) AS c_uw FROM rg GROUP BY 1),
        ru AS (SELECT unnest(toks) AS u FROM t WHERE source = 'src0'),
        uc AS (SELECT u, count(*) AS c_u FROM ru GROUP BY 1),
        vv AS (SELECT count(*) AS v FROM uc),
        cg AS (SELECT doc_id, unnest([toks[i] || ' ' || toks[i+1]
                                      for i in range(1, len(toks))]) AS g
               FROM t WHERE source <> 'src0'),
        cu AS (SELECT doc_id, g, string_split(g, ' ')[1] AS u FROM cg),
        sc AS (SELECT doc_id, count(*) AS n_bigrams,
                 sum(CASE WHEN bc.c_uw IS NULL THEN 1 ELSE 0 END) AS oov,
                 sum(-ln((coalesce(bc.c_uw, 0) + 1)::DOUBLE
                         / (coalesce(uc.c_u, 0) + vv.v))) AS s
               FROM cu LEFT JOIN bc USING (g) LEFT JOIN uc USING (u)
                    CROSS JOIN vv
               GROUP BY doc_id)
        SELECT doc_id, n_bigrams,
          round(oov::DOUBLE / n_bigrams, 6) AS oov_frac,
          round(s / n_bigrams, 6) AS nll,
          round(exp(round(s / n_bigrams, 6)), 4) AS ppl
        FROM sc ORDER BY doc_id"""),
      "Bigram-LM perplexity quality score (CCNet-style, src0-trained, Laplace)"),

    // Quality-aware survivor selection: near-dup clusters (q81's pair
    // stream + CC) keep their highest-quality member instead of the
    // minimum id — the "keep the best copy" stage between clustering
    // and export. Score here = token count (longest-variant-wins, a
    // standard rule); ties break to the smallest doc_id so exactly one
    // member per cluster has keep=1.
    "q91_canonical_keep" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val pairs = Dedup.ngramJaccardCached(balanced(docs), "doc_id", "text",
          n = 3, threshold = 0.8)
        Clusters.canonicalKeep(docs, pairs, "doc_id",
            size(split(col("text"), " ")).cast("long"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $ShingleCte,
        $JaccardVerifySql,
        pairs AS (
          SELECT id_a, id_b
          FROM common JOIN sizes sa ON sa.doc_id = id_a
                      JOIN sizes sb ON sb.doc_id = id_b
          WHERE common::DOUBLE / (sa.sz + sb.sz - common) >= 0.8),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION SELECT id_b, id_a FROM pairs),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON e.src = r.dst),
        comp AS (
          SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
          FROM reach GROUP BY src),
        lab AS (
          SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id,
            len(string_split(d.text, ' '))::BIGINT AS score
          FROM documents d LEFT JOIN comp c USING (doc_id))
        SELECT doc_id, cluster_id,
          count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
          score,
          (row_number() OVER (PARTITION BY cluster_id
             ORDER BY score DESC, doc_id ASC) = 1)::INT AS keep
        FROM lab ORDER BY doc_id"""),
      "Near-dup clusters keep their highest-quality member (canonical keep)"),

    // Deterministic training-shard deal of the packed sequences (q89's
    // windows): shard = md5-fold(seq_id) mod 8, within-shard order =
    // ascending fold — a reproducible pseudorandom permutation with no
    // per-shard window hotspot (global range sort + S-row offset join).
    "q92_training_shards" -> QueryDef(
      (s, dir) => {
        val frags = Packing.fragments(balanced(Tables.documents(s, dir)),
          "doc_id", "text", seqLen = 256L)
        Shards.assign(frags.select(col("seq_id")).distinct(), "seq_id",
            nShards = 8)
          .orderBy(col("shard"), col("pos"))
      },
      Some("""WITH t AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n
             FROM documents),
        tot AS (SELECT sum(n)::BIGINT AS s FROM t),
        seqs AS (SELECT unnest(range(0, (s + 255) // 256)) AS seq_id FROM tot),
        a AS (SELECT seq_id,
                ('0x' || substr(md5(seq_id::VARCHAR), 1, 15))::BIGINT AS h
              FROM seqs)
        SELECT seq_id, (h % 8)::INT AS shard,
          (row_number() OVER (PARTITION BY h % 8 ORDER BY h, seq_id) - 1)::BIGINT
            AS pos
        FROM a ORDER BY shard, pos"""),
      "Deterministic shuffled training shards over packed sequences"),

    // Sequence-level near-dup verification: the memoized PPJoin pair
    // stream (q27/q81/q91's — 4th consumer) re-verified by character
    // Levenshtein similarity. Jaccard is order-blind (a shuffled
    // paragraph passes it); consumers exporting "same document, edited"
    // pairs need the sequence-level cut. Threshold 0.95 chosen against
    // the corpus (sf0.01: keeps 24 of 25 Jaccard-0.8 pairs — the one
    // drop is a reordered variant, exactly the case the operator
    // exists to separate).
    "q93_edit_neardup" -> QueryDef(
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        // candidates = the balanced form q27/q81/q91 key the memo on
        // (compute-spread for the shingle kernel); the text joins and
        // length probe read the RAW scan — no repartition re-pay.
        Dedup.editNearDup(docs, "doc_id", "text", n = 3,
            jaccardFloor = 0.8, minEditSim = 0.95,
            candidates = balanced(docs))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""WITH $ShingleCte,
        $JaccardVerifySql,
        jp AS (
          SELECT id_a, id_b,
            round(common::DOUBLE / (sa.sz + sb.sz - common), 6) AS jaccard
          FROM common JOIN sizes sa ON sa.doc_id = id_a
                      JOIN sizes sb ON sb.doc_id = id_b
          WHERE common::DOUBLE / (sa.sz + sb.sz - common) >= 0.8),
        sims AS (
          SELECT id_a, id_b, jaccard,
            round(1.0 - levenshtein(a.text, b.text)::DOUBLE
                  / greatest(length(a.text), length(b.text)), 6) AS edit_sim
          FROM jp JOIN documents a ON a.doc_id = id_a
                  JOIN documents b ON b.doc_id = id_b)
        SELECT id_a, id_b, jaccard, edit_sim FROM sims
        WHERE edit_sim >= 0.95 ORDER BY id_a, id_b"""),
      "Edit-distance near-dup verify over the shared PPJoin pair stream"),

    // Inverted-index BM25 search: the relevance-scoring stage (query-
    // driven data selection / curation triage). Query terms filter the
    // token stream BEFORE any exchange; df is a ≤|query|-row broadcast;
    // top-k plans as TakeOrderedAndProject, never a global sort. The
    // sf0.01 rank-25 boundary gap is ~2e-3, far above the 6-dp rounding
    // both engines share.
    "q95_bm25_search" -> QueryDef(
      (s, dir) => Retrieval.bm25TopK(balanced(Tables.documents(s, dir)),
          "doc_id", "text", query = Seq("spark", "window", "join"), k = 25)
        .orderBy(col("score").desc, col("doc_id")),
      Some(Retrieval.bm25OracleSql("'spark','window','join'", k = 25)),
      "BM25 query search over an inverted index (top-k, TakeOrdered plan)"),

    // TF-IDF keyword extraction: top-m terms per document — the
    // word-count plan shape (map-side combined (doc, term) counts, a
    // vocabulary-sized df join where AQE splits stopword skew, and a
    // per-document window whose state is one doc's vocabulary).
    "q96_tfidf_terms" -> QueryDef(
      (s, dir) => Retrieval.tfidfTopTerms(balanced(Tables.documents(s, dir)),
          "doc_id", "text", m = 3)
        .orderBy(col("doc_id"), col("rank")),
      Some(Retrieval.tfidfOracleSql(m = 3)),
      "TF-IDF top-m keyword extraction per document (word-count shape)"),

    // Token-budget corpus selection: fill a fixed training-token budget
    // with the best-scoring docs (score here = 4-dp type-token ratio, the
    // q25 quality signal). The semantic spec is a corpus-wide ordered
    // cumsum window; the implementation rides GlobalRank's two-pass
    // distributed prefix sum — driver state O(partitions). Budget 15000
    // splits sf0.01 at 356/500 with a clean boundary (cum 14980 in,
    // 15050 out).
    "q97_token_budget" -> QueryDef(
      (s, dir) => Budget.tokenBudgetSelect(balanced(Tables.documents(s, dir)),
          "doc_id", "text",
          score = round(
            size(array_distinct(split(col("text"), " "))).cast("double") /
              size(split(col("text"), " ")).cast("double"), 4),
          budget = 15000L)
        .orderBy(col("doc_id")),
      Some("""WITH s AS (SELECT doc_id,
          round(len(list_distinct(string_split(text, ' ')))::DOUBLE
                / len(string_split(text, ' ')), 4) AS score,
          len(string_split(text, ' '))::BIGINT AS n_tokens
        FROM documents),
        c AS (SELECT *, sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens FROM s)
        SELECT doc_id, score, n_tokens, cum_tokens,
          (cum_tokens <= 15000)::INT AS selected
        FROM c ORDER BY doc_id"""),
      "Token-budget corpus selection via distributed prefix sum (greedy by quality)"),

    // PMI co-occurrence association mining over document frequencies:
    // collocation discovery / tokenizer-merge candidates. Pair stream =
    // per-doc self-join on distinct terms (doc-bounded quadratic,
    // inherent to co-occurrence), aggregates map-side combined.
    "q98_pmi_cooccur" -> QueryDef(
      (s, dir) => Cooccur.pmiPairs(balanced(Tables.documents(s, dir)),
          "doc_id", "text", minPairDf = 2L)
        .orderBy(col("term_a"), col("term_b")),
      Some("""WITH t AS (SELECT doc_id,
            unnest(list_distinct(string_split(text, ' '))) AS term
          FROM documents),
        dft AS (SELECT term, count(*)::BIGINT AS df FROM t GROUP BY 1),
        pd AS (SELECT a.term AS term_a, b.term AS term_b,
                 count(*)::BIGINT AS pair_df
               FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.term < b.term
               GROUP BY 1, 2 HAVING count(*) >= 2),
        n AS (SELECT count(*)::BIGINT AS n FROM documents)
        SELECT term_a, term_b, pair_df, da.df AS df_a, db.df AS df_b,
          round(ln((pair_df::DOUBLE * n::DOUBLE)
                   / (da.df::DOUBLE * db.df::DOUBLE)), 6) AS pmi
        FROM pd JOIN dft da ON da.term = term_a
                JOIN dft db ON db.term = term_b
        CROSS JOIN n ORDER BY term_a, term_b"""),
      "PMI term co-occurrence mining (collocations over doc frequencies)"),

    // Indexed BM25: the amortized-search contract every real retrieval
    // engine uses (q95's per-query form re-tokenizes the corpus each
    // search — inherent; the round-13 ladder showed what that costs).
    // Build materializes a term-range-clustered postings index ONCE
    // (fingerprinted via Catalog.cachedDerived, keyed on the source
    // dir); the query reads ONLY matching postings (parquet row-group
    // pushdown on the sorted term column) — per-query cost ∝ matching
    // postings, never corpus size. Same result set as the q95 pipeline
    // run over the same corpus with the same terms (identical oracle
    // modulo the column name: `doc` is the index's canonical id column).
    "q99_bm25_indexed" -> QueryDef(
      (s, dir) => {
        val tag = java.nio.file.Paths.get(dir).toAbsolutePath.toString
        val idx = indexDirFor(tag)
        Retrieval.buildPostingsIndex(balanced(Tables.documents(s, dir)),
          "doc_id", "text", idx, sourceTag = tag)
        Retrieval.bm25FromIndex(s, idx,
          query = Seq("spark", "window", "join"), k = 25)
          .orderBy(col("score").desc, col("doc"))
      },
      Some(Retrieval.bm25OracleSql("'spark','window','join'", k = 25,
        idCol = "doc")),
      "BM25 served from a persisted term-clustered postings index"),

    // Indexed TF-IDF: the q99 move applied to the second retrieval
    // operator (round-13 verdict #2). Shares q99's index artifact —
    // identical buildPostingsIndex config, so whichever of q99/q100 runs
    // first pays the one-time build and the other hits the fingerprint
    // cache. The query starts from the pre-aggregated (term, doc, dl,
    // tf) postings: no tokenize, no explode, no (doc, term) exchange —
    // df is one aggregate (hot terms auto-routed, same census as q96)
    // and the per-doc top-m window is the only other exchange. Same
    // output as q96 modulo the index's canonical id column name.
    "q100_tfidf_indexed" -> QueryDef(
      (s, dir) => {
        val tag = java.nio.file.Paths.get(dir).toAbsolutePath.toString
        val idx = indexDirFor(tag)
        Retrieval.buildPostingsIndex(balanced(Tables.documents(s, dir)),
          "doc_id", "text", idx, sourceTag = tag)
        Retrieval.tfidfFromIndex(s, idx, m = 3)
          .orderBy(col("doc"), col("rank"))
      },
      Some(Retrieval.tfidfOracleSql(m = 3, idCol = "doc")),
      "TF-IDF top-m served from the persisted postings index"),

    // Boilerplate removal (C4/CCNet line-frequency contract): the corpus
    // has no line structure, so each doc gets a deterministic synthetic
    // header/preamble/footer (pure functions of doc_id/source, mirrored
    // in the oracle — the q86 PII-synthesis trick): the per-source header
    // and footer repeat across every doc of that source (25 docs/source
    // at sf0.01) and must be removed; the per-doc preamble and the body
    // are unique and must be kept. Hash-exact via md5(line) keys and the
    // md5 of the cleaned text.
    "q101_boilerplate" -> QueryDef(
      (s, dir) => {
        val lined = concat_ws("\n",
          concat(lit("subscribe to "), col("source"), lit(" weekly newsletter")),
          concat(lit("preamble "), col("doc_id").cast("string"), lit(" unique")),
          col("text"),
          concat(lit("copyright 2026 "), col("source"), lit(" all rights reserved")))
        val docs = balanced(Tables.documents(s, dir))
          .withColumn("lined_text", lined)
        Boilerplate.removeBoilerplate(docs, "doc_id", "lined_text",
            "source", minDocs = 3L)
          .select(col("doc_id"), col("n_lines"), col("n_boiler"),
            md5(col("clean_text")).as("clean_md5"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH d AS (SELECT doc_id, source,
            'subscribe to ' || source || ' weekly newsletter' || chr(10) ||
            'preamble ' || doc_id::VARCHAR || ' unique' || chr(10) ||
            text || chr(10) ||
            'copyright 2026 ' || source || ' all rights reserved' AS lt
          FROM documents),
        l AS (SELECT doc_id, source,
            generate_subscripts(string_split(lt, chr(10)), 1) AS pos,
            unnest(string_split(lt, chr(10))) AS line FROM d),
        lh AS (SELECT doc_id, source, pos, line, md5(line) AS h FROM l),
        f AS (SELECT source, h FROM lh
              GROUP BY source, h HAVING count(DISTINCT doc_id) >= 3),
        fl AS (SELECT lh.doc_id, lh.pos, lh.line,
                 (f.h IS NOT NULL)::INT AS boiler
               FROM lh LEFT JOIN f ON f.source = lh.source AND f.h = lh.h)
        SELECT doc_id, count(*)::BIGINT AS n_lines,
          sum(boiler)::BIGINT AS n_boiler,
          md5(coalesce(string_agg(CASE WHEN boiler = 0 THEN line END, chr(10)
                         ORDER BY pos), '')) AS clean_md5
        FROM fl GROUP BY doc_id ORDER BY doc_id"""),
      "Boilerplate removal: per-source repeated-line scrub (C4/CCNet contract)"),

    // URL-keyed canonical keep (RefinedWeb-style URL dedup): the corpus
    // has no url column, so a synthetic one derives from doc_id with
    // scheme-case / www / tracking-query / trailing-slash variants that
    // normalization must collapse (140 distinct keys over the 500 sf0.01
    // docs); one canonical doc is kept per normalized key (most tokens,
    // doc-id tie-break) and the key's registrable domain (eTLD+1 with a
    // co.uk-style multi-part suffix) is reported.
    "q102_url_canonical" -> QueryDef(
      (s, dir) => {
        val d = col("doc_id").cast("long")
        val url = concat(
          when(d % 2 === 0, lit("https://")).otherwise(lit("HTTP://")),
          when(d % 3 === 0, lit("www.")).otherwise(lit("")),
          lit("Site"), (d % 7).cast("string"),
          when(d % 2 === 0, lit(".example.com"))
            .otherwise(lit(".example.co.uk")),
          lit("/articles/item"), (d % 10).cast("string"),
          when(d % 5 === 0, lit("/")).otherwise(lit("")),
          when(d % 4 === 0, lit("?utm_source=feed")).otherwise(lit("")))
        val docs = balanced(Tables.documents(s, dir)).withColumn("url", url)
        UrlDedup.canonicalKeep(docs, "doc_id", "url", "text")
          .orderBy(col("url_key"))
      },
      Some("""WITH u AS (SELECT doc_id, text,
            (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END)
            || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
            || 'Site' || (doc_id % 7)::VARCHAR
            || (CASE WHEN doc_id % 2 = 0 THEN '.example.com'
                     ELSE '.example.co.uk' END)
            || '/articles/item' || (doc_id % 10)::VARCHAR
            || (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END)
            || (CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed' ELSE '' END)
              AS url
          FROM documents),
        nq AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(
            url, '^[A-Za-z][A-Za-z0-9+.-]*://', ''), '#.*', ''), '\?.*', '')
              AS v FROM u),
        hp AS (SELECT doc_id, lower(regexp_extract(v, '^[^/]*')) AS host0,
            regexp_replace(v, '^[^/]*', '') AS path0 FROM nq),
        k AS (SELECT doc_id, regexp_replace(host0, '^www\.', '')
            || regexp_replace(path0, '/$', '') AS url_key FROM hp),
        t AS (SELECT doc_id, len(string_split(text, ' '))::BIGINT AS n_tokens
              FROM documents),
        j AS (SELECT k.doc_id, url_key, n_tokens,
                row_number() OVER (PARTITION BY url_key
                  ORDER BY n_tokens DESC, k.doc_id ASC) AS rn,
                count(*) OVER (PARTITION BY url_key) AS nd
              FROM k JOIN t USING (doc_id)),
        dom AS (SELECT *, string_split(regexp_extract(url_key, '^[^/]*'), '.')
                  AS ls FROM j WHERE rn = 1)
        SELECT url_key,
          CASE WHEN len(ls) >= 3 AND ls[-2] IN
                 ('co','com','org','net','ac','gov','edu')
               THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
               WHEN len(ls) >= 2 THEN ls[-2] || '.' || ls[-1]
               ELSE regexp_extract(url_key, '^[^/]*') END AS domain,
          doc_id AS canonical_id, n_tokens AS canonical_tokens,
          nd::BIGINT AS n_dups
        FROM dom ORDER BY url_key"""),
      "URL-keyed canonical keep: normalize + eTLD+1 + most-tokens-wins dedup")
  )
}
