package graft

/** Mirror of the driver's t1 smoke gate: the flagship entry query must
  * return rows on sf0.001. */
class EntrySpec extends SparkSpec {
  test("entry returns rows on sf0.001 (driver t1 smoke)") {
    val n = SparkEntry.entry(spark).count()
    assert(n > 0, s"entry returned $n rows")
  }

  test("every declared query has an oracle, and vice versa") {
    // the ONLY queries allowed to ship without a DuckDB oracle are
    // those whose output is not a function of the corpus — each must
    // say why here, and gets the driver's weaker rows-only check
    val rowsOnly = Set(
      // file layout is write history, not corpus: the same rows
      // replayed by SQL land in whatever layout the replaying engine
      // picks — nothing corpus-derived to compare (the operator the
      // audit dispatches to IS oracle-gated, bit-equal, as q183)
      "q184_ivfpq_file_audit",
      // the cadence forecast is pure write history too: batch count =
      // commit markers, growth = tag-prefixed file counts — a SQL
      // replay has no append history at all (same contract as q184;
      // decision branches spec-pinned in IvfPqSpec, the dispatched-to
      // operator gated bit-equal as q183)
      "q186_compaction_cadence",
      // the vector store's file layout, like the index's: bucket file
      // counts and sortBy forfeiture are write history a SQL replay
      // cannot see (branches spec-pinned in VectorStoreSpec; the
      // dispatched-to repair — rebuildStore, round 19 — is spec-pinned
      // bit-equal and fires live in the lifecycle soak)
      "q188_vecstore_audit",
      // the store's rebuild-cadence forecast is the same write
      // history again (q186's contract, store-side): batch count =
      // `_appends` markers, growth rate = tag-prefixed file counts —
      // a SQL replay has no append history at all (branches
      // spec-pinned in VectorStoreSpec; the dispatched-to repair is
      // rebuildStore, exercised bit-equal in spec and soak)
      "q189_vecstore_cadence")
    assert(SparkEntry.queries.keySet -- rowsOnly ===
      SparkEntry.oracleSql.keySet)
    assert(rowsOnly.subsetOf(SparkEntry.queries.keySet))
    assert(rowsOnly.intersect(SparkEntry.oracleSql.keySet).isEmpty,
      "a rows-only query grew an oracle — remove it from the exception list")
  }
}
