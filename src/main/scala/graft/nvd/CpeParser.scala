package graft.nvd

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** CPE 2.3 formatted-string parsing and the normalized CPE star —
  * the reference's declared-but-never-populated phase-2 schema
  * (nvd2mysqlloader.py:328-365 in-code; nvd.sql:97-131 cve2cpe/CPE/
  * cpe_vendor/cpe_prod/cpe_version; population invited by the comment
  * at nvd2mysqlloader.py:366-368).
  *
  * A CPE 2.3 URI is `cpe:2.3:part:vendor:product:version:update:
  * edition:language:sw_edition:target_sw:target_hw:other` where a
  * component may contain an escaped colon (`\:`). Splitting on
  * unescaped colons only is expressible as a Catalyst regex split
  * (negative lookbehind), so no UDF is needed and the projection
  * stays codegen'd.
  */
object CpeParser {

  /** Split a cpe23Uri into its 13 components on unescaped colons.
    *
    * A single-char lookbehind mis-handles an escaped backslash before
    * the separator (`\\\\:` — the colon IS a separator there), so `\\\\`
    * is swapped to a sentinel first, making the lookbehind exact, and
    * restored after the split. */
  def components(cpe: Column): Column = {
    val sentinel = "\u0001"
    transform(
      split(regexp_replace(cpe, "\\\\\\\\", sentinel), "(?<!\\\\):"),
      part => regexp_replace(part, sentinel, "\\\\\\\\"))
  }

  private def comp(cpe: Column, i: Int): Column = {
    // try_element_at: a malformed/short URI yields null components
    // instead of an ANSI INVALID_ARRAY_INDEX crash
    val raw = try_element_at(components(cpe), lit(i))
    regexp_replace(regexp_replace(raw, "\\\\:", ":"), "\\\\\\\\", "\\\\")
  }

  /** cpe23Uri -> struct(part, vendor, product, version). */
  def parsed(cpe: Column): Column = struct(
    comp(cpe, 3).as("part"),
    comp(cpe, 4).as("vendor"),
    comp(cpe, 5).as("product"),
    comp(cpe, 6).as("version"))

  /** The cve2cpe fact: one row per (cve_id, vulnerable cpe23Uri),
    * exploded from the flattened table's typed CPE array column. */
  def cve2cpe(flattened: DataFrame): DataFrame =
    flattened
      .select(col("cve_id"), explode(col("vulnerable_cpes")).as("cpe23Uri"))
      .distinct()
      .withColumn("p", parsed(col("cpe23Uri")))
      .select(col("cve_id"), col("cpe23Uri"),
        col("p.part"), col("p.vendor"), col("p.product"), col("p.version"))

  /** Dimension tables of the star (distinct vendors / products /
    * versions), mirroring nvd.sql:113-131. At scale these are small
    * (bounded by the CPE dictionary, ~10^6) => always broadcastable
    * back against the fact. */
  def vendorDim(fact: DataFrame): DataFrame =
    fact.select(col("vendor")).distinct()
  def productDim(fact: DataFrame): DataFrame =
    fact.select(col("vendor"), col("product")).distinct()
  def versionDim(fact: DataFrame): DataFrame =
    fact.select(col("vendor"), col("product"), col("version")).distinct()

  /** The FULLTEXT-index query idiom, typed: CVEs affecting a vendor/
    * product (reference comments nvd2mysqlloader.py:173-177 describe
    * substring search over the joined string; the star makes it an
    * equi-join instead). */
  def cvesForProduct(fact: DataFrame, vendor: String, product: String): DataFrame =
    fact.filter(col("vendor") === vendor && col("product") === product)
      .select(col("cve_id")).distinct()

  /** Sortable key for dotted numeric versions: first four components,
    * each zero-padded to 10 chars, missing components = 0 — so plain
    * string comparison orders "1.2.9" < "1.2.10" and "1.2" == "1.2.0",
    * the two places naive lexicographic version compare goes wrong.
    * Exact for numeric-dotted versions (the overwhelming NVD case);
    * non-numeric fragments compare bytewise within their slot. */
  def versionKey(v: Column): Column = {
    val parts = split(coalesce(v, lit("")), "\\.")
    concat_ws(".", (0 until 4).map(i =>
      lpad(coalesce(try_element_at(parts, lit(i + 1)), lit("0")), 10, "0")): _*)
  }

  /** NVD cpe_match range containment: is `version` inside the
    * [start, end) bounds? A null bound is OPEN (the feed omits bounds
    * it does not constrain) — exactly the cpe_match
    * versionStart/End Including/Excluding semantics. */
  def versionInRange(
      version: Column,
      startIncl: Column, startExcl: Column,
      endIncl: Column, endExcl: Column): Column = {
    val vk = versionKey(version)
    (startIncl.isNull || vk >= versionKey(startIncl)) &&
      (startExcl.isNull || vk > versionKey(startExcl)) &&
      (endIncl.isNull || vk <= versionKey(endIncl)) &&
      (endExcl.isNull || vk < versionKey(endExcl))
  }

  /** Vulnerable cpe_match entries WITH their version-range bounds —
    * the typed form of the range fields the reference's sidecar
    * archives but never reads (nvd2mysqlloader.py:305-313;
    * NvdSchema.cpeMatch). Strict reference scope: top-level entries
    * only, matching `vulnerableCpeArray`'s default. */
  def vulnerableMatches(configurations: Column): Column =
    flatten(transform(
      coalesce(configurations.getField("nodes"), array()),
      n => transform(
        filter(coalesce(n.getField("cpe_match"), array()),
          m => coalesce(m.getField("vulnerable"), lit(false))),
        m => struct(
          m.getField("cpe23Uri").as("cpe23Uri"),
          m.getField("versionStartIncluding").as("start_incl"),
          m.getField("versionStartExcluding").as("start_excl"),
          m.getField("versionEndIncluding").as("end_incl"),
          m.getField("versionEndExcluding").as("end_excl")))))
}
