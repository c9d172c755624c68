package graft.queries

/** Shared DuckDB-oracle SQL fragments. The FNV-1a fold re-derives the
  * native `graft.plans.Fnv1a64` expression in pure SQL so every oracle
  * that depends on hash placement re-computes the identical 31-bit value;
  * keeping it in ONE place means a future change to the hash (e.g. byte
  * handling beyond ASCII) cannot silently leave one oracle on the old
  * definition.
  */
private[queries] object OracleSql {

  /** FNV-1a 64 over the characters of `expr` (ASCII inputs only, where
    * `unicode(c)` equals the UTF-8 byte), masked to the non-negative
    * 31-bit ihash — byte-exact with `Fnv1a64.ihash31`. Yields a HUGEINT
    * expression in (0, 2^31); wrap/cast at the call site. */
  def fnvIhash31(expr: String): String =
    s"""(list_reduce(
       |    list_prepend(14695981039346656037::HUGEINT,
       |      list_transform(string_split_regex($expr, ''),
       |                     c -> unicode(c)::HUGEINT)),
       |    (h, b) -> (xor(h, b) * 1099511628211::HUGEINT)
       |              % 18446744073709551616::HUGEINT)
       |  % 2147483648)""".stripMargin
}

/** Shared scratch-path helpers for queries that materialize intermediate
  * files (roundtrips, catalog tables): ONE definition of the tmp-root
  * layout and the sfDir sanitization so a future change (say, a new
  * character class in fixture paths) cannot leave one module writing to a
  * different or unsanitized location. */
private[queries] object TmpPaths {
  def root(subdir: String): String =
    sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/" + subdir

  def sfTag(sfDir: String): String =
    sfDir.replaceAll("[^A-Za-z0-9]", "_")
}
