package graft.functions

import graft.{Det, Q, Tables}
import org.apache.spark.sql.functions._

/** Scalar functions, JSON, and generators (SURVEY §2.7).
  *
  * Everything here is a codegen'd built-in running inside a single
  * WholeStageCodegen stage over the scan — no shuffle except the final
  * driver-mandated ORDER BY, so at 100 TB these are pure map-side
  * pipelines that scale linearly with input splits.
  *
  * Cross-engine parity rules applied throughout (SURVEY §2.9):
  * trunc-based rounding instead of round() (half-point semantics differ),
  * floor()+cast instead of double→int casts (DuckDB rounds, Spark
  * truncates), weekday()+1 ≡ isodow (dayofweek bases differ), and
  * 1-based positions on both sides (posexplode is 0-based, DuckDB has no
  * WITH ORDINALITY — zipped unnest(range(...)) is the verified oracle).
  */
object Scalars {

  /** String built-ins over part: case, trim/pad, substring, concat,
    * replace, regexp, edit distance. */
  val fnString: Q = Q(
    "fn_string",
    Some(
      "SELECT p_partkey, upper(p_name) AS up, lower(p_brand) AS lo, " +
        "lpad(p_brand, 12, '*') AS pad, substring(p_name, 1, 8) AS sub, " +
        "concat_ws('|', p_brand, p_type) AS cw, replace(p_type, ' ', '_') AS rep, " +
        "length(p_name) AS len, regexp_extract(p_name, '([a-z]+)', 1) AS rx, " +
        "regexp_replace(p_name, '[aeiou]', '', 'g') AS rr, " +
        "levenshtein(p_brand, p_type) AS lev " +
        "FROM part ORDER BY p_partkey"
    ),
    (spark, dir) =>
      Tables
        .part(spark, dir)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          lpad(col("p_brand"), 12, "*").as("pad"),
          substring(col("p_name"), 1, 8).as("sub"),
          concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
          regexp_replace(col("p_type"), " ", "_").as("rep"),
          length(col("p_name")).cast("long").as("len"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("rx"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("rr"),
          levenshtein(col("p_brand"), col("p_type")).cast("long").as("lev")
        )
        .orderBy(col("p_partkey"))
  )

  /** Math built-ins over part. floor/ceil are cast to BIGINT on both
    * sides (Spark returns LONG, DuckDB DOUBLE); transcendentals are
    * trunc-rounded to 6 dp — IEEE-identical inputs round identically
    * except within 1 ulp of a boundary, which r6 makes astronomically
    * unlikely. */
  val fnMath: Q = Q(
    "fn_math",
    Some(
      "SELECT p_partkey, abs(p_size - 25) AS ab, p_size % 7 AS md, " +
        "cast(sign(p_size - 25) as int) AS sg, " +
        "cast(floor(p_retailprice) as bigint) AS fl, " +
        "cast(ceil(p_retailprice) as bigint) AS ce, " +
        "cast(p_size * p_size as bigint) AS pw, " +
        Det.oRN("sqrt(p_retailprice)", 6) + " AS sq, " +
        Det.oRN("ln(p_retailprice)", 6) + " AS ll, " +
        Det.oRN("log10(p_retailprice)", 6) + " AS lg, " +
        Det.oRN("exp(p_size / 100.0)", 6) + " AS ex " +
        "FROM part ORDER BY p_partkey"
    ),
    (spark, dir) =>
      Tables
        .part(spark, dir)
        .select(
          col("p_partkey"),
          abs(col("p_size") - 25).as("ab"),
          (col("p_size") % 7).as("md"),
          signum(col("p_size") - 25).cast("int").as("sg"),
          floor(col("p_retailprice")).as("fl"),
          ceil(col("p_retailprice")).as("ce"),
          (col("p_size") * col("p_size")).cast("long").as("pw"),
          Det.rN(sqrt(col("p_retailprice")), 6).as("sq"),
          Det.rN(log(col("p_retailprice")), 6).as("ll"),
          Det.rN(log10(col("p_retailprice")), 6).as("lg"),
          Det.rN(exp(col("p_size") / 100.0), 6).as("ex")
        )
        .orderBy(col("p_partkey"))
  )

  /** Date/time built-ins over events (the only table with intraday
    * times). weekday()+1 ≡ DuckDB isodow; day-diff via date casts on
    * both sides; month-add clamps end-of-month identically. */
  val fnDate: Q = Q(
    "fn_date",
    Some(
      "SELECT event_id, date_trunc('hour', ts) AS tr_hour, " +
        "date_trunc('day', ts) AS tr_day, " +
        "year(ts) AS y, month(ts) AS mo, day(ts) AS d, " +
        "hour(ts) AS h, minute(ts) AS mi, isodow(ts) AS dow, " +
        "date_diff('day', DATE '2024-01-01', ts::DATE) AS dd, " +
        "ts + INTERVAL 3 MONTH AS plus3m, " +
        "last_day(ts)::TIMESTAMP AS eom " +
        "FROM events ORDER BY event_id"
    ),
    (spark, dir) =>
      Tables
        .events(spark, dir)
        .select(
          col("event_id"),
          // Det.ntzTrunc*, not date_trunc(..): the built-in would cast
          // the NTZ events column through the session zone (probed:
          // TzRobustnessSpec runs this row under America/New_York).
          Det.ntzTruncHour(col("ts")).as("tr_hour"),
          Det.ntzTruncDay(col("ts")).as("tr_day"),
          year(col("ts")).cast("long").as("y"),
          month(col("ts")).cast("long").as("mo"),
          dayofmonth(col("ts")).cast("long").as("d"),
          hour(col("ts")).cast("long").as("h"),
          minute(col("ts")).cast("long").as("mi"),
          (weekday(col("ts")) + 1).cast("long").as("dow"),
          datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast("long").as("dd"),
          (col("ts") + expr("INTERVAL 3 MONTH")).as("plus3m"),
          last_day(col("ts").cast("date")).cast("timestamp_ntz").as("eom")
        )
        .orderBy(col("event_id"))
  )

  /** CASE / coalesce / nullif / casts over customer. double→int goes
    * through floor() explicitly: bare casts round in DuckDB but
    * truncate in Spark. */
  val fnCondCast: Q = Q(
    "fn_cond_cast",
    Some(
      "SELECT c_custkey, " +
        "CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 5000 THEN 'low' ELSE 'high' END AS bal_band, " +
        "coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg, " +
        "cast(c_custkey as varchar) AS key_str, " +
        "cast(regexp_extract(c_name, '([0-9]+)', 1) as bigint) AS name_num, " +
        "cast(floor(c_acctbal) as bigint) AS bal_floor, " +
        "cast(c_nationkey as double) AS nk_d " +
        "FROM customer ORDER BY c_custkey"
    ),
    (spark, dir) =>
      Tables
        .customer(spark, dir)
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "neg")
            .when(col("c_acctbal") < 5000, "low")
            .otherwise("high")
            .as("bal_band"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"),
          col("c_custkey").cast("string").as("key_str"),
          regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long").as("name_num"),
          floor(col("c_acctbal")).as("bal_floor"),
          col("c_nationkey").cast("double").as("nk_d")
        )
        .orderBy(col("c_custkey"))
  )

  /** Array ops on string token arrays (exact cross-engine equality).
    * The emitted vocab is serialized with array_join — the driver's
    * comparator hashes pandas columns and cannot hash list cells at
    * all (§2.9.3: no raw arrays in verified output; sort_array alone
    * is not enough). list_position and array_position are both
    * 1-based with 0 for missing. */
  val fnArrayTokens: Q = Q(
    "fn_array_tokens",
    Some(
      "SELECT doc_id, len(string_split(text, ' ')) AS n_toks, " +
        "array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ') AS vocab, " +
        "list_contains(string_split(text, ' '), 'scan') AS has_scan, " +
        "cast(list_position(string_split(text, ' '), 'scan') as bigint) AS scan_pos, " +
        "string_split(text, ' ')[2] AS second_tok, " +
        "len(list_filter(string_split(text, ' '), t -> length(t) > 4)) AS n_long " +
        "FROM documents ORDER BY doc_id"
    ),
    (spark, dir) => {
      val toks = split(col("text"), " ")
      Tables
        .documents(spark, dir)
        .select(
          col("doc_id"),
          size(toks).cast("long").as("n_toks"),
          array_join(sort_array(array_distinct(toks)), " ").as("vocab"),
          array_contains(toks, "scan").as("has_scan"),
          array_position(toks, "scan").cast("long").as("scan_pos"),
          element_at(toks, 2).as("second_tok"),
          size(filter(toks, t => length(t) > 4)).cast("long").as("n_long")
        )
        .orderBy(col("doc_id"))
    }
  )

  /** Higher-order array math on embeddings: transform/aggregate/slice/
    * filter. Elements cast float→double before arithmetic (§2.9.4);
    * both engines fold sequentially in list order, so the double sums
    * are bit-identical. */
  val fnArrayVec: Q = Q(
    "fn_array_vec",
    Some(
      "SELECT vec_id, len(embedding) AS dim, " +
        Det.oRN("list_aggregate(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum')", 6) + " AS sq_norm, " +
        Det.oRS("embedding[1]::DOUBLE", 6) + " AS e1, " +
        Det.oRS("list_aggregate(list_transform(list_slice(embedding, 1, 8), x -> x::DOUBLE), 'sum')", 6) + " AS head_sum, " +
        "len(list_filter(embedding, x -> x > 0)) AS n_pos " +
        "FROM embeddings ORDER BY vec_id"
    ),
    (spark, dir) =>
      Tables
        .embeddings(spark, dir)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          Det
            .rN(
              aggregate(
                transform(col("embedding"), x => x.cast("double") * x.cast("double")),
                lit(0.0),
                (acc, x) => acc + x
              ),
              6
            )
            .as("sq_norm"),
          Det.rS(element_at(col("embedding"), 1).cast("double"), 6).as("e1"),
          Det
            .rS(
              aggregate(
                slice(col("embedding"), 1, 8),
                lit(0.0),
                (acc, x) => acc + x.cast("double")
              ),
              6
            )
            .as("head_sum"),
          size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos")
        )
        .orderBy(col("vec_id"))
  )

  /** JSON extraction from events.props + grouped aggregation. */
  val fnJson: Q = Q(
    "fn_json",
    Some(
      "SELECT event_type, count(*) AS n, " +
        "cast(sum(json_extract(props, '$.k')::INT) as bigint) AS sum_k, " +
        "min(json_extract(props, '$.k')::INT) AS min_k, " +
        "max(json_extract(props, '$.k')::INT) AS max_k " +
        "FROM events GROUP BY event_type ORDER BY event_type"
    ),
    (spark, dir) => {
      val k = get_json_object(col("props"), "$.k").cast("int")
      Tables
        .events(spark, dir)
        .groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(k).as("sum_k"),
          min(k).as("min_k"),
          max(k).as("max_k")
        )
        .orderBy(col("event_type"))
    }
  )

  /** Crypto hashes per doc — lowercase hex in both engines; feeds the
    * exact-dedup operator. xxhash64 deliberately avoided (Spark seed). */
  val fnHash: Q = Q(
    "fn_hash",
    Some(
      "SELECT doc_id, sha256(text) AS sha, md5(text) AS md " +
        "FROM documents ORDER BY doc_id"
    ),
    (spark, dir) =>
      Tables
        .documents(spark, dir)
        .select(
          col("doc_id"),
          sha2(col("text"), 256).as("sha"),
          md5(col("text")).as("md")
        )
        .orderBy(col("doc_id"))
  )

  /** Generator: text → one row per token with its 1-based position.
    * posexplode is 0-based; DuckDB lacks WITH ORDINALITY, so the oracle
    * zips unnest(tokens) with unnest(range(1, n+1)) — verified zipped
    * semantics. Restricted to doc_id < 100 to keep t2 output bounded. */
  val genExplodeTokens: Q = Q(
    "gen_explode_tokens",
    Some(
      "SELECT doc_id, unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos, " +
        "unnest(string_split(text, ' ')) AS tok " +
        "FROM documents WHERE doc_id < 100 ORDER BY doc_id, pos"
    ),
    (spark, dir) =>
      Tables
        .documents(spark, dir)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos0", "tok")))
        .select(col("doc_id"), (col("pos0") + 1).cast("long").as("pos"), col("tok"))
        .orderBy(col("doc_id"), col("pos"))
  )

  /** MapType exercise: parse events.props into map<string,int>, emit
    * the sorted key list serialized to a string (the comparator cannot
    * hash list cells — §2.9.3) plus the k value — maps and arrays stay
    * internal, only scalars leave. */
  val fnMap: Q = Q(
    "fn_map",
    Some(
      "SELECT event_id, array_to_string(list_sort(json_keys(props)), ',') AS ks, " +
        "json_extract(props, '$.k')::INT AS k_val, " +
        "len(json_keys(props)) AS n_keys " +
        "FROM events ORDER BY event_id"
    ),
    (spark, dir) => {
      val m = from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType))
      Tables
        .events(spark, dir)
        .select(
          col("event_id"),
          array_join(sort_array(map_keys(m)), ",").as("ks"),
          element_at(m, "k").as("k_val"),
          size(map_keys(m)).cast("long").as("n_keys")
        )
        .orderBy(col("event_id"))
    }
  )

  /** Regexp scalar family over part strings: group extraction, global
    * replace, match predicate, and occurrence counting. Patterns are
    * chosen to always match (cross-engine no-match conventions differ);
    * the boolean lands as int and the count as long so both engines
    * agree on output types. DuckDB needs the 'g' flag where Spark's
    * regexp_replace is global by default, and counts occurrences via
    * len(regexp_extract_all). */
  val fnRegexp: Q = Q(
    "fn_regexp",
    Some(
      "SELECT p_partkey, " +
        "CAST(regexp_extract(p_brand, '([0-9]+)$', 1) AS BIGINT) AS brand_num, " +
        "regexp_extract(p_name, '^([a-z]+)', 1) AS first_word, " +
        "regexp_replace(p_name, '[aeiou]', '', 'g') AS consonants, " +
        "CAST(regexp_matches(p_type, '^(ECONOMY|PROMO)') AS INT) AS is_cheap, " +
        "CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS BIGINT) AS n_vowels " +
        "FROM part ORDER BY p_partkey"
    ),
    (spark, dir) =>
      Tables
        .part(spark, dir)
        .select(
          col("p_partkey"),
          regexp_extract(col("p_brand"), "([0-9]+)$", 1).cast("long").as("brand_num"),
          regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "").as("consonants"),
          col("p_type").rlike("^(ECONOMY|PROMO)").cast("int").as("is_cheap"),
          regexp_count(col("p_name"), lit("[aeiou]")).cast("long").as("n_vowels")
        )
        .orderBy(col("p_partkey"))
  )

  /** NULL-semantics torture: three-valued logic through nullif /
    * coalesce chains, null-safe equality (Spark `<=>` ↔ DuckDB
    * IS NOT DISTINCT FROM), NULL propagation through arithmetic and
    * IN-lists. Booleans land as int; the IN-list result is a genuinely
    * nullable int column (NULL when the probe is NULL — the SQL
    * standard's awkward corner, asserted cross-engine). */
  val fnNull: Q = Q(
    "fn_null",
    Some(
      "SELECT o_orderkey, " +
        "nullif(o_orderstatus, 'O') AS st_nn, " +
        "coalesce(nullif(o_orderstatus, 'O'), 'fallback') AS st_co, " +
        "CAST(nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F' AS INT) AS nse_f, " +
        "CAST(nullif(o_orderstatus, 'O') IS NOT DISTINCT FROM NULL AS INT) AS nse_null, " +
        Det.oRN("coalesce(CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END * 2, -1)", 2) +
        " AS arith_prop, " +
        "CAST(nullif(o_orderstatus, 'O') IN ('F') AS INT) AS in_3vl " +
        "FROM orders ORDER BY o_orderkey"
    ),
    (spark, dir) => {
      val nn = nullif(col("o_orderstatus"), lit("O"))
      Tables
        .orders(spark, dir)
        .select(
          col("o_orderkey"),
          nn.as("st_nn"),
          coalesce(nn, lit("fallback")).as("st_co"),
          (nn <=> "F").cast("int").as("nse_f"),
          (nn <=> lit(null)).cast("int").as("nse_null"),
          Det.rN(
            coalesce(when(col("o_orderstatus") === "O", lit(null)).otherwise(col("o_totalprice")) * 2, lit(-1.0)),
            2
          ).as("arith_prop"),
          nn.isin("F").cast("int").as("in_3vl")
        )
        .orderBy(col("o_orderkey"))
    }
  )

  /** Fuzzy key lookup by edit distance: the 20 part names closest to a
    * (typo'd) probe string — levenshtein is codegen'd in Spark and the
    * classic unit-cost definition in both engines, so distances are
    * exact ints. Linear scan + TakeOrderedAndProject (per-partition
    * top-20 heap, only 20 rows per partition reach the driver) — the
    * fuzzy-match shape that scales to any catalog size. Total order:
    * (dist, p_partkey). */
  val fnFuzzyMatch: Q = Q(
    "fn_fuzzy_match",
    Some(
      "SELECT p_partkey, p_name, cast(levenshtein(p_name, 'smal ring') as bigint) AS dist " +
        "FROM part ORDER BY dist, p_partkey LIMIT 20"
    ),
    (spark, dir) =>
      graft.Tables
        .part(spark, dir)
        .select(
          col("p_partkey"),
          col("p_name"),
          levenshtein(col("p_name"), lit("smal ring")).cast("long").as("dist")
        )
        .orderBy(col("dist"), col("p_partkey"))
        .limit(20)
  )

  /** ANSI-safe arithmetic surface: Spark 4 runs ANSI mode by default,
    * where divide-by-zero and bad casts THROW — `try_divide`/`try_cast`
    * are the null-on-failure escape hatches a migrated pipeline leans
    * on. Oracle spells the identical semantics portably
    * (`x / nullif(y, 0)`, DuckDB TRY_CAST). The division operands are
    * exact small values, so the double results agree bit-for-bit. */
  val fnTrySafe: Q = Q(
    "fn_try_safe",
    Some(
      "SELECT p_partkey, " +
        "p_size / nullif(p_size - 25, 0) AS safe_ratio, " +
        "TRY_CAST(substr(p_name, 1, 3) AS INT) AS bad_parse, " +
        "TRY_CAST(p_partkey AS SMALLINT) AS narrow_key " +
        "FROM part WHERE p_partkey < 500 ORDER BY p_partkey"
    ),
    (spark, dir) =>
      graft.Tables
        .part(spark, dir)
        .filter(col("p_partkey") < 500)
        .select(
          col("p_partkey"),
          try_divide(col("p_size"), col("p_size") - 25).as("safe_ratio"),
          expr("try_cast(substr(p_name, 1, 3) AS INT)").as("bad_parse"),
          expr("try_cast(p_partkey AS SMALLINT)").as("narrow_key")
        )
        .orderBy(col("p_partkey"))
  )

  /** OUTER explode — the generator semantic corner: a doc whose
    * filtered token list is EMPTY must survive with a NULL token
    * (plain explode silently drops it — a curation pipeline loses the
    * doc from downstream counts). Spark spells it `explode_outer`;
    * DuckDB has no outer unnest, so the oracle reconstructs it with a
    * LEFT JOIN against the unnested rows. ~21% of docs have no >6-char
    * token, so the outer path is genuinely exercised. Explicit
    * NULLS FIRST — the engines' default null sort order differs.
    */
  val genExplodeOuter: Q = Q(
    "gen_explode_outer",
    Some(
      "WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> len(t) > 6) AS lt " +
        "FROM documents WHERE doc_id < 500), " +
        "u AS (SELECT doc_id, unnest(lt) AS tok FROM d) " +
        "SELECT d.doc_id, u.tok FROM d LEFT JOIN u ON d.doc_id = u.doc_id " +
        "ORDER BY d.doc_id, u.tok NULLS FIRST"
    ),
    (spark, dir) =>
      Tables
        .documents(spark, dir)
        .filter(col("doc_id") < 500)
        .select(
          col("doc_id"),
          explode_outer(filter(split(col("text"), " "), t => length(t) > 6)).as("tok")
        )
        .orderBy(col("doc_id"), col("tok").asc_nulls_first)
  )

  def qs: Seq[Q] = Seq(
    fnString, fnMath, fnDate, fnCondCast, fnArrayTokens, fnArrayVec,
    fnJson, fnHash, genExplodeTokens, genExplodeOuter, fnMap, fnRegexp, fnNull, fnFuzzyMatch,
    fnTrySafe
  )
}
