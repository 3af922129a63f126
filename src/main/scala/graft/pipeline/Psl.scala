package graft.pipeline

import scala.io.Source

import org.apache.spark.unsafe.types.UTF8String

/** Public-Suffix-List registrable-domain resolution. The PSL ships as a
  * DATA resource (`graft/public_suffix_list.dat`, standard
  * publicsuffix.org format — swap it for a current full download to pick
  * up the complete rule set) and is parsed once per JVM into three hash
  * sets, so the hot lookup is O(host labels) hash probes — no join, no
  * shuffle, no linear rule scan.
  *
  * Matching follows the published PSL algorithm
  * (https://publicsuffix.org/list/ §"Algorithm"):
  *  - a rule matches when it is a label-wise suffix of the host;
  *  - `*.X` wildcard rules match any ONE extra label under `X`;
  *  - `!Y` exception rules override wildcards — the public suffix is `Y`
  *    minus its leftmost label (so `Y` itself is registrable);
  *  - of all matches the LONGEST wins; no match ⇒ the implicit `*` rule
  *    (the bare TLD is the public suffix);
  *  - registrable domain = public suffix plus one more label; a host
  *    that IS a public suffix has no registrable domain (null here).
  *
  * Hosts are expected lowercased and in ASCII/punycode form (what
  * `Urls.urlHost` emits); IDN label mapping is the caller's concern.
  */
object Psl {

  final case class Rules(
      exact: Set[String], wildcardBases: Set[String], exceptions: Set[String]) {
    /** Deepest suffix (in labels) worth probing: longest exact rule, or
      * wildcard base + 1, or exception rule depth.
      */
    val maxDepth: Int = {
      def d(s: String): Int = s.count(_ == '.') + 1
      val all = exact.map(d) ++ wildcardBases.map(d(_) + 1) ++ exceptions.map(d)
      if (all.isEmpty) 1 else all.max
    }
  }

  /** Parse PSL-format lines: `//` comments and blanks skipped, rule text
    * runs to the first whitespace, `*.` prefixes mark wildcards, `!`
    * prefixes mark exceptions.
    */
  def parse(lines: Iterator[String]): Rules = {
    val exact = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    lines.foreach { raw =>
      val line = raw.takeWhile(!_.isWhitespace)
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.toLowerCase
        if (rule.startsWith("!")) exc += rule.substring(1)
        else if (rule.startsWith("*.")) wild += rule.substring(2)
        else exact += rule
      }
    }
    Rules(exact.result(), wild.result(), exc.result())
  }

  /** The bundled snapshot, parsed once per JVM (tasks share it — the rule
    * sets ride the classpath to every executor, nothing is broadcast).
    */
  lazy val bundled: Rules = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "bundled PSL resource missing")
    try parse(Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** Registrable domain of `host` under `rules`, or null when the host is
    * itself a public suffix (or malformed: empty/dotted-edge/empty label).
    */
  def registrableDomain(host: String, rules: Rules): String = {
    if (host == null || host.isEmpty) return null
    val h = if (host.exists(c => c >= 'A' && c <= 'Z')) host.toLowerCase else host
    if (h.charAt(0) == '.' || h.charAt(h.length - 1) == '.' || h.contains("..")) return null
    // label start offsets, rightmost first: suffix of depth k = h.substring(offs(k-1))
    var starts = List(0)
    var i = h.indexOf('.')
    while (i >= 0) { starts = (i + 1) :: starts; i = h.indexOf('.', i + 1) }
    val offs = starts.toArray // offs(0)=last label start, offs(n-1)=0 (whole host)
    val n = offs.length
    def suffix(depth: Int): String = h.substring(offs(depth - 1))
    // exceptions outrank everything: the matched rule itself is registrable
    var k = math.min(n, rules.maxDepth)
    while (k >= 1) {
      if (rules.exceptions.contains(suffix(k))) return suffix(k)
      k -= 1
    }
    // longest exact-or-wildcard match, else the implicit `*` rule (depth 1)
    var publicDepth = 1
    k = math.min(n, rules.maxDepth)
    while (k >= 1 && publicDepth == 1) {
      if (rules.exact.contains(suffix(k))) publicDepth = k
      else if (k >= 2 && rules.wildcardBases.contains(suffix(k - 1))) publicDepth = k
      k -= 1
    }
    if (n <= publicDepth) null else suffix(publicDepth + 1)
  }

  /** Codegen hot path (called from the generated code of
    * [[graft.functions.RegistrableDomainPsl]]): bundled rules, UTF8String
    * in/out, null for no-registrable-domain hosts.
    */
  def registrable(host: UTF8String): UTF8String = {
    if (host == null) return null
    val r = registrableDomain(host.toString, bundled)
    if (r == null) null else UTF8String.fromString(r)
  }

  // custom rule files, parsed once per (JVM, path, version) — the
  // operational swap for a NEWER full publicsuffix.org download without
  // rebuilding the jar: every executor lazily reads the same path through
  // the storage layer (any Hadoop FS), so nothing is broadcast or
  // shipped. The VERSION component is the file's mtime, captured ONCE at
  // plan time on the driver ([[graft.functions.RegistrableDomainPsl]])
  // and baked into the generated code — overwriting the rule file takes
  // effect on the NEXT query (new plan → new stat → new cache key) while
  // a running query stays pinned to the version it planned with, and the
  // per-row hot path never stats anything.
  private val byPath =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), Rules]()

  def fromPath(path: String, version: Long = 0L): Rules = {
    val key = (path, version)
    val cached = byPath.get(key)
    if (cached != null) return cached
    val rules = parse(graft.core.Storage.readString(
      new org.apache.hadoop.fs.Path(path)).linesIterator)
    // a full PSL is MBs: keep only the newest version per path, so a
    // long-running service that refreshes its rule file periodically
    // doesn't accumulate every superseded parse for the JVM's lifetime.
    // Running queries pinned to an older version re-parse on a cache
    // miss (rare: only during the refresh window) rather than leak.
    byPath.synchronized {
      val it = byPath.keySet.iterator()
      while (it.hasNext) { if (it.next()._1 == path) it.remove() }
      byPath.put(key, rules)
    }
    rules
  }

  /** The rule file's current version (mtime) — the plan-time stat behind
    * the (path, version) cache key.
    */
  def versionOf(path: String): Long =
    graft.core.Storage.mtime(new org.apache.hadoop.fs.Path(path))

  /** Codegen hot path for a CUSTOM rule file (see
    * [[graft.functions.RegistrableDomainPsl]] with a path).
    */
  def registrable(host: UTF8String, path: UTF8String, version: Long): UTF8String = {
    if (host == null) return null
    val r = registrableDomain(host.toString, fromPath(path.toString, version))
    if (r == null) null else UTF8String.fromString(r)
  }
}
