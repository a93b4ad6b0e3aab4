package graft.functions

import java.util.Locale

/** Public Suffix List support for registrable-domain extraction — the
  * domain grouping key of the RefinedWeb/CCNet URL-curation stage
  * (reference: grafeo-memory treats source grouping as exact-string; a
  * web corpus needs PSL semantics or `a.github.io` and `b.github.io`
  * collapse into one "site").
  *
  * Implements the publicsuffix.org algorithm (public specification):
  *  - rules are domain suffixes, matched label-by-label right-to-left;
  *  - `*.foo` matches any single label in the starred position;
  *  - `!bar.foo` is an exception: a host matching it has public suffix
  *    `foo` (the rule minus its leftmost label). Exceptions beat all
  *    other rules;
  *  - otherwise the longest matching rule wins;
  *  - if nothing matches, the prevailing rule is `*` (the last label is
  *    the public suffix).
  * The registrable domain is the public suffix plus one label; a host
  * that IS a public suffix (or shorter) is returned whole.
  *
  * [[Builtin]] is a ~640-rule snapshot in the real PSL file format
  * (comments `//`, one rule per line) covering the ccTLD second-level
  * registries, the wildcard TLDs, the kawasaki.jp-style exception
  * blocks, and the high-traffic private-section hosters (github.io,
  * blogspot.*, …). It is a representative snapshot, not the
  * authoritative list: a production deployment loads the current
  * `public_suffix_list.dat` through [[parse]] and either rebuilds the
  * session (the kernel path reads [[builtin]] once) or runs the
  * join-based [[graft.ops.UrlOps.registrableDomainByTable]], which
  * takes any rule table at runtime.
  */
object PublicSuffixList {

  /** Parsed rule sets: `exact` plain suffixes, `wildcard` the base of
    * each `*.base` rule, `exception` the full `!rule` suffix (bang
    * stripped). All lowercase.
    */
  final case class Rules(
      exact: Set[String],
      wildcard: Set[String],
      exception: Set[String]) {
    def all: Seq[(String, String)] =
      exact.toSeq.sorted.map(("exact", _)) ++
        wildcard.toSeq.sorted.map(("wildcard", _)) ++
        exception.toSeq.sorted.map(("exception", _))
  }

  /** The two sections of the real list, parsed separately. `icann` is
    * the registry-controlled section (true registrable-domain
    * semantics); `priv` is the PRIVATE DOMAINS section (hosting
    * providers like github.io — wanted for site-grouping, unwanted when
    * the consumer needs the registrant-level domain). [[all]] is their
    * union, the default grouping key of the URL-curation stage.
    */
  final case class Sectioned(icann: Rules, priv: Rules) {
    lazy val all: Rules = Rules(
      icann.exact ++ priv.exact,
      icann.wildcard ++ priv.wildcard,
      icann.exception ++ priv.exception)
    /** (rtype, rule, section) rows for the runtime rule-table path and
      * the DuckDB oracle — section ∈ icann|private.
      */
    def allWithSection: Seq[(String, String, String)] =
      icann.all.map { case (t, r) => (t, r, "icann") } ++
        priv.all.map { case (t, r) => (t, r, "private") }
  }

  /** Parse PSL file format: skip blanks and `//` comments, classify
    * `!` and `*.` rules, lowercase everything. The private/ICANN
    * section markers are comments, so both sections load uniformly.
    */
  def parse(lines: Iterator[String]): Rules = {
    val exact = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    lines.foreach { raw =>
      val line = raw.trim
      if (line.nonEmpty && !line.startsWith("//")) {
        val rule = line.split("\\s+")(0).toLowerCase(Locale.ROOT)
        if (rule.startsWith("!")) exc += rule.substring(1)
        else if (rule.startsWith("*.")) wild += rule.substring(2)
        else exact += rule
      }
    }
    Rules(exact.result(), wild.result(), exc.result())
  }

  /** Number of labels in the public suffix of `labels` (host split on
    * '.', already lowercased). Never more than `labels.length`.
    */
  def publicSuffixLength(labels: Array[String], rules: Rules): Int = {
    val n = labels.length
    var best = 1 // the prevailing default rule "*"
    var excK = 0 // longest matching exception rule (0 = none)
    var k = 1
    var prev = "" // suffix of k-1 labels, carried between iterations
    while (k <= n) {
      val suffix =
        if (k == 1) labels(n - 1) else labels(n - k) + "." + prev
      // exception rules beat everything; among several (custom tables
      // can nest them — the real PSL doesn't) the LONGEST prevails,
      // matching the publicsuffix.org spec, the join path
      // (UrlOps max(_exck)), and the oracle's list_max
      if (rules.exception.contains(suffix)) excK = k
      if (rules.exact.contains(suffix) && k > best) best = k
      // "*.base" matches a (k = |base|+1)-label suffix
      if (k >= 2 && rules.wildcard.contains(prev) && k > best) best = k
      prev = suffix
      k += 1
    }
    // exception: public suffix is the rule minus its leftmost label
    if (excK > 0) excK - 1 else math.min(best, n)
  }

  /** Registrable domain of `host` under `rules`: public suffix + one
    * label; the whole (lowercased, root-dot-stripped) host when it is
    * itself a public suffix or shorter. A single trailing dot (DNS
    * root) is stripped before matching — `a.b.c.` == `a.b.c`.
    */
  def registrableDomain(host: String, rules: Rules): String = {
    var h = host.toLowerCase(Locale.ROOT)
    if (h.endsWith(".")) h = h.substring(0, h.length - 1)
    if (h.isEmpty) return h
    val labels = h.split('.')
    if (labels.isEmpty) return h
    val ps = publicSuffixLength(labels, rules)
    val n = labels.length
    if (n <= ps + 1) h
    else {
      val sb = new java.lang.StringBuilder()
      var i = n - ps - 1
      while (i < n) {
        if (i > n - ps - 1) sb.append('.')
        sb.append(labels(i))
        i += 1
      }
      sb.toString
    }
  }

  /** Section-aware parse of the real `public_suffix_list.dat` layout:
    * rules before the `===BEGIN PRIVATE DOMAINS===` marker are ICANN,
    * rules after it are PRIVATE (the markers themselves are `//`
    * comments, so [[parse]] reads the same file section-blind).
    */
  def parseSectioned(lines: Iterator[String]): Sectioned = {
    val (icannLines, privLines) =
      (List.newBuilder[String], List.newBuilder[String])
    var inPrivate = false
    lines.foreach { raw =>
      if (raw.contains("===BEGIN PRIVATE DOMAINS===")) inPrivate = true
      else if (raw.contains("===END PRIVATE DOMAINS===")) inPrivate = false
      if (inPrivate) privLines += raw else icannLines += raw
    }
    Sectioned(parse(icannLines.result().iterator),
      parse(privLines.result().iterator))
  }

  /** The authoritative publicsuffix.org list, vendored verbatim at
    * `src/main/resources/graft/public_suffix_list.dat` (public registry
    * data, MPL-2.0; ~9.5k rules incl. IDN/UTF-8 entries) and parsed
    * once per JVM. This is what the production kernels match against;
    * [[builtin]] below stays as the compact format-documenting snapshot
    * (and the parse()-roundtrip fixture).
    */
  lazy val authoritative: Sectioned = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "vendored public_suffix_list.dat missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try parseSectioned(src.getLines()) finally src.close()
  }

  /** The built-in snapshot, parsed once. */
  lazy val builtin: Rules = parse(BuiltinText.linesIterator)

  /** Snapshot in PSL file format. Sections mirror the real file's
    * layout so [[parse]] exercises the production format.
    */
  val BuiltinText: String = {
    val uk = Seq("uk", "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk",
      "net.uk", "nhs.uk", "org.uk", "plc.uk", "police.uk", "*.sch.uk")
    val jpCore = Seq("jp", "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp",
      "gr.jp", "lg.jp", "ne.jp", "or.jp")
    val jpPref = Seq("aichi", "akita", "aomori", "chiba", "ehime", "fukui",
      "fukuoka", "fukushima", "gifu", "gunma", "hiroshima", "hokkaido",
      "hyogo", "ibaraki", "ishikawa", "iwate", "kagawa", "kagoshima",
      "kanagawa", "kochi", "kumamoto", "kyoto", "mie", "miyagi",
      "miyazaki", "nagano", "nagasaki", "nara", "niigata", "oita",
      "okayama", "okinawa", "osaka", "saga", "saitama", "shiga",
      "shimane", "shizuoka", "tochigi", "tokushima", "tokyo", "tottori",
      "toyama", "wakayama", "yamagata", "yamaguchi", "yamanashi")
      .map(_ + ".jp")
    val jpCity = Seq("kawasaki", "kitakyushu", "kobe", "nagoya", "sapporo",
      "sendai", "yokohama")
      .flatMap(c => Seq(s"*.$c.jp", s"!city.$c.jp"))
    val au = Seq("au", "com.au", "net.au", "org.au", "edu.au", "gov.au",
      "asn.au", "id.au", "info.au", "conf.au", "oz.au", "act.au",
      "nsw.au", "nt.au", "qld.au", "sa.au", "tas.au", "vic.au", "wa.au")
    val nz = Seq("nz", "ac.nz", "co.nz", "cri.nz", "geek.nz", "gen.nz",
      "govt.nz", "health.nz", "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz",
      "net.nz", "org.nz", "parliament.nz", "school.nz")
    val za = Seq("za", "ac.za", "co.za", "edu.za", "gov.za", "law.za",
      "mil.za", "net.za", "nom.za", "org.za", "school.za", "web.za")
    val br = Seq("br", "com.br", "net.br", "org.br", "gov.br", "edu.br",
      "mil.br", "art.br", "adv.br", "arq.br", "ato.br", "bio.br",
      "blog.br", "bmd.br", "cim.br", "cng.br", "cnt.br", "coop.br",
      "ecn.br", "eco.br", "emp.br", "eng.br", "esp.br", "etc.br",
      "eti.br", "far.br", "flog.br", "fnd.br", "fot.br", "fst.br",
      "g12.br", "ggf.br", "imb.br", "ind.br", "inf.br", "jor.br",
      "jus.br", "leg.br", "lel.br", "mat.br", "med.br", "mus.br",
      "not.br", "ntr.br", "odo.br", "ppg.br", "pro.br", "psc.br",
      "psi.br", "qsl.br", "radio.br", "rec.br", "slg.br", "srv.br",
      "taxi.br", "teo.br", "tmp.br", "trd.br", "tur.br", "tv.br",
      "vet.br", "vlog.br", "wiki.br", "zlg.br")
    val cn = Seq("cn", "ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn",
      "org.cn", "mil.cn") ++
      Seq("ah", "bj", "cq", "fj", "gd", "gs", "gz", "gx", "ha", "hb",
        "he", "hi", "hl", "hn", "jl", "js", "jx", "ln", "nm", "nx",
        "qh", "sc", "sd", "sh", "sn", "sx", "tj", "xj", "xz", "yn",
        "zj", "hk", "mo", "tw").map(_ + ".cn")
    val kr = Seq("kr", "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr",
      "kg.kr", "mil.kr", "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr",
      "sc.kr") ++
      Seq("busan", "chungbuk", "chungnam", "daegu", "daejeon", "gangwon",
        "gwangju", "gyeongbuk", "gyeonggi", "gyeongnam", "incheon",
        "jeju", "jeonbuk", "jeonnam", "seoul", "ulsan").map(_ + ".kr")
    val in_ = Seq("in", "co.in", "firm.in", "net.in", "org.in", "gen.in",
      "ind.in", "nic.in", "ac.in", "edu.in", "res.in", "gov.in", "mil.in")
    val tr = Seq("tr", "av.tr", "bbs.tr", "bel.tr", "biz.tr", "com.tr",
      "dr.tr", "edu.tr", "gen.tr", "gov.tr", "info.tr", "mil.tr",
      "k12.tr", "kep.tr", "name.tr", "net.tr", "org.tr", "pol.tr",
      "tel.tr", "tsk.tr", "tv.tr", "web.tr")
    val ua = Seq("ua", "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua",
      "org.ua") ++
      Seq("cherkassy", "chernigov", "crimea", "dnepropetrovsk", "donetsk",
        "kharkov", "kherson", "kiev", "kirovograd", "lugansk", "lutsk",
        "lviv", "nikolaev", "odessa", "poltava", "rovno", "sebastopol",
        "sumy", "ternopil", "uzhgorod", "vinnica", "zaporizhzhe",
        "zhitomir").map(_ + ".ua")
    val pl = Seq("pl", "com.pl", "net.pl", "org.pl", "aid.pl", "agro.pl",
      "atm.pl", "auto.pl", "biz.pl", "edu.pl", "gmina.pl", "gsm.pl",
      "info.pl", "mail.pl", "miasta.pl", "media.pl", "mil.pl", "nom.pl",
      "pc.pl", "powiat.pl", "priv.pl", "realestate.pl", "rel.pl",
      "shop.pl", "sklep.pl", "sos.pl", "szkola.pl", "targi.pl", "tm.pl",
      "tourism.pl", "travel.pl", "turystyka.pl", "gov.pl") ++
      Seq("warszawa", "wroclaw", "krakow", "katowice", "poznan", "lodz",
        "gda", "gdansk", "gdynia", "sopot", "szczecin", "lublin",
        "bialystok", "olsztyn", "torun", "rzeszow").map(_ + ".pl")
    val misc2 = Seq(
      "mx", "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
      "hk", "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
      "sg", "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
      "id", "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id",
      "my.id", "net.id", "or.id", "ponpes.id", "sch.id", "web.id",
      "il", "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il",
      "net.il", "org.il",
      "th", "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th",
      "or.th",
      "tw", "edu.tw", "gov.tw", "mil.tw", "com.tw", "net.tw", "org.tw",
      "idv.tw", "game.tw", "ebiz.tw", "club.tw",
      "ar", "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
      "musica.ar", "net.ar", "org.ar", "tur.ar",
      "my", "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my",
      "name.my",
      "ph", "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph",
      "mil.ph", "i.ph",
      "vn", "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
      "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
      "ru", "com.ru", "msk.ru", "spb.ru",
      "ke", "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
      "me.ke", "mobi.ke", "info.ke",
      "ng", "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng",
      "name.ng", "net.ng", "org.ng", "sch.ng",
      "eg", "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
      "net.eg", "org.eg", "sci.eg",
      "sa", "com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa",
      "edu.sa", "sch.sa",
      "ae", "co.ae", "net.ae", "org.ae", "sch.ae", "ac.ae", "gov.ae",
      "mil.ae",
      "pk", "com.pk", "net.pk", "edu.pk", "org.pk", "fam.pk", "biz.pk",
      "web.pk", "gov.pk", "gob.pk", "gok.pk", "gon.pk", "gop.pk",
      "gos.pk", "info.pk")
    // TLDs delegated entirely to second-level registration
    val wildTlds = Seq("*.bd", "*.er", "*.fk", "*.jm", "*.kh", "*.mm",
      "*.np", "*.pg", "*.ck", "!www.ck")
    val plainTlds = Seq("com", "org", "net", "edu", "gov", "mil", "int",
      "io", "co", "ai", "app", "dev", "info", "biz", "name", "mobi",
      "xyz", "online", "site", "tech", "store", "blog", "cloud", "me",
      "tv", "cc", "ws", "fm", "am", "to", "ly", "gg", "sh", "ac", "eu",
      "us", "ca", "de", "fr", "es", "it", "nl", "be", "ch", "at", "se",
      "no", "fi", "dk", "pt", "gr", "cz", "sk", "hu", "ro", "bg", "hr",
      "si", "lt", "lv", "ee", "ie", "is", "lu", "li", "mt", "cy", "by",
      "kz", "rs", "ba", "mk", "al", "md", "ge", "az", "uy", "cl", "pe",
      "ve", "ec", "bo", "py", "cr", "pa", "do", "gt", "hn", "ni", "sv",
      "cu", "pr", "gh", "tz", "ug", "zw", "mu", "ma", "dz", "tn", "qa",
      "kw", "bh", "om", "jo", "lb", "iq", "ir", "af", "lk", "la", "mn",
      "uz", "tm", "tj", "kg", "bt", "mv", "kh")
    val privateSection = Seq(
      "github.io", "githubusercontent.com", "gitlab.io",
      "blogspot.com", "blogspot.co.uk", "blogspot.ca", "blogspot.com.au",
      "blogspot.de", "blogspot.fr", "blogspot.in", "blogspot.jp",
      "blogspot.it", "blogspot.nl", "blogspot.se", "blogspot.mx",
      "blogspot.com.br", "blogspot.com.ar", "blogspot.co.nz",
      "blogspot.co.za", "blogspot.kr", "blogspot.sg", "blogspot.hk",
      "blogspot.ie", "blogspot.pt", "blogspot.ch",
      "wordpress.com", "appspot.com", "herokuapp.com", "herokussl.com",
      "cloudfront.net", "s3.amazonaws.com", "azurewebsites.net",
      "netlify.app", "vercel.app", "now.sh", "web.app",
      "firebaseapp.com", "glitch.me", "pages.dev", "workers.dev",
      "repl.co", "neocities.org", "dyndns.org", "no-ip.org", "no-ip.com",
      "ddns.net", "duckdns.org", "fastlylb.net", "wixsite.com",
      "weebly.com", "bitbucket.io", "linodeusercontent.com",
      "onrender.com", "fly.dev", "deno.dev", "surge.sh", "tumblr.com")
    val icann = uk ++ jpCore ++ jpPref ++ jpCity ++ au ++ nz ++ za ++
      br ++ cn ++ kr ++ in_ ++ tr ++ ua ++ pl ++ misc2 ++ wildTlds ++
      plainTlds
    "// ===BEGIN ICANN DOMAINS===\n" + icann.mkString("\n") +
      "\n// ===BEGIN PRIVATE DOMAINS===\n" + privateSection.mkString("\n") +
      "\n"
  }
}
