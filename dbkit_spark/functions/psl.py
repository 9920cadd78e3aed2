"""Public-Suffix-List registered-domain extraction (VERDICT r8 item 6).

``functions.text.url_registered_domain`` is a two/three-label HEURISTIC:
it mis-keys every multi-label suffix beyond its hardcoded ccTLD
second-level set (``a.b.ac.uk`` works, ``x.gob.mx`` / ``k12.tr`` /
``alice.github.io`` do not) — per-site crawl quotas and domain-mixing
weights then merge unrelated sites. This module implements the real PSL
algorithm (publicsuffix.org/list/ — public data, Mozilla-maintained)
against a pluggable rules table:

- **normal rule** ``co.uk``: those labels are a public suffix;
- **wildcard rule** ``*.ck``: any single label in the starred position
  extends the suffix (``foo.ck`` is a public suffix);
- **exception rule** ``!www.ck``: overrides a wildcard — the rule minus
  its leading label is the public suffix (``www.ck`` is registrable).

Prevailing rule: any matching exception wins; otherwise the matching
rule with the most labels; otherwise the implicit ``*`` (the bare TLD is
the suffix). Registered domain = public suffix plus one preceding label;
NULL when the host IS a public suffix.

Spark-first shape — and why it is NOT an explode+groupBy: candidate
suffixes per host are bounded by the deepest rule (D ≤ 4 here), so the
lookup is D exact + (D−1) wildcard **broadcast left joins** on computed
suffix-key columns, resolved row-wise with ``coalesce`` in depth-
descending order. Zero shuffles, zero UDFs, whole-stage codegen
throughout; the rules table (15k rows for the full PSL, ~250 for the
vendored snapshot) broadcasts once. At 100 TB the plan is a map-only
pipeline over the scan.

The vendored snapshot below is a PARTIAL, curated cut of the list (the
high-traffic multi-label registries plus the canonical wildcard/
exception families); the full list drops into the same contract via
``psl_registered_domain(df, col, rules=open("public_suffix_list.dat"))``
— parsing skips comments/blank lines, so the raw file works verbatim.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Curated ICANN-section snapshot: the registries whose multi-label
# suffixes dominate real crawl corpora, plus the wildcard/exception
# shapes the algorithm must honor. Source: publicsuffix.org (public
# domain-practice data); this is a SNAPSHOT, not the full list.
PSL_ICANN_SNAPSHOT: tuple[str, ...] = (
    # uk
    "uk", "ac.uk", "co.uk", "gov.uk", "ltd.uk", "me.uk", "net.uk",
    "nhs.uk", "org.uk", "plc.uk", "police.uk", "*.sch.uk",
    # jp (incl. the geographic wildcard/exception family)
    "jp", "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    # au / nz
    "au", "asn.au", "com.au", "edu.au", "gov.au", "id.au", "net.au",
    "org.au",
    "nz", "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "health.nz",
    "iwi.nz", "kiwi.nz", "maori.nz", "mil.nz", "net.nz", "org.nz",
    "parliament.nz", "school.nz",
    # br / ar / mx
    "br", "adv.br", "art.br", "com.br", "edu.br", "gov.br", "ind.br",
    "inf.br", "jus.br", "leg.br", "med.br", "mil.br", "net.br", "org.br",
    "ar", "com.ar", "edu.ar", "gob.ar", "int.ar", "mil.ar", "musica.ar",
    "net.ar", "org.ar", "tur.ar",
    "mx", "com.mx", "edu.mx", "gob.mx", "net.mx", "org.mx",
    # in / cn / kr / tw / hk / sg / my / id / ph / vn / th
    "in", "ac.in", "co.in", "edu.in", "firm.in", "gen.in", "gov.in",
    "ind.in", "mil.in", "net.in", "nic.in", "org.in", "res.in",
    "cn", "ac.cn", "com.cn", "edu.cn", "gov.cn", "mil.cn", "net.cn",
    "org.cn", "bj.cn", "sh.cn",
    "kr", "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr", "busan.kr",
    "seoul.kr",
    "tw", "club.tw", "com.tw", "ebiz.tw", "edu.tw", "game.tw", "gov.tw",
    "idv.tw", "mil.tw", "net.tw", "org.tw",
    "hk", "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "sg", "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    "my", "com.my", "edu.my", "gov.my", "mil.my", "name.my", "net.my",
    "org.my",
    "id", "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id",
    "my.id", "net.id", "or.id", "sch.id", "web.id",
    "ph", "com.ph", "edu.ph", "gov.ph", "i.ph", "mil.ph", "net.ph",
    "ngo.ph", "org.ph",
    "vn", "ac.vn", "biz.vn", "com.vn", "edu.vn", "gov.vn", "health.vn",
    "info.vn", "int.vn", "name.vn", "net.vn", "org.vn", "pro.vn",
    "th", "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    # tr / il / za / ua / pl / ca
    "tr", "av.tr", "bbs.tr", "bel.tr", "biz.tr", "com.tr", "dr.tr",
    "edu.tr", "gen.tr", "gov.tr", "info.tr", "k12.tr", "kep.tr",
    "mil.tr", "name.tr", "net.tr", "org.tr", "pol.tr", "tel.tr",
    "tsk.tr", "tv.tr", "web.tr",
    "il", "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il",
    "net.il", "org.il",
    "za", "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za",
    "net.za", "ngo.za", "nom.za", "org.za", "school.za", "web.za",
    "ua", "com.ua", "edu.ua", "gov.ua", "in.ua", "net.ua", "org.ua",
    "kiev.ua", "lviv.ua", "odessa.ua",
    "pl", "com.pl", "edu.pl", "gov.pl", "net.pl", "org.pl", "waw.pl",
    "wroc.pl", "krakow.pl", "poznan.pl", "gda.pl",
    "ca", "ab.ca", "bc.ca", "gc.ca", "mb.ca", "nb.ca", "nl.ca", "ns.ca",
    "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
    # pure-wildcard registries
    "*.bd", "*.ck", "!www.ck", "*.er", "*.fk", "*.kh", "*.mm", "*.np",
    "*.pg",
)

# Private-section sample: multi-tenant hosting suffixes where per-site
# keying MUST split tenants (user1.github.io and user2.github.io are
# different sites). Toggleable — registrar-facing pipelines use ICANN
# rules only, crawl/dedup pipelines want these on (the PSL's own
# documented split).
PSL_PRIVATE_SNAPSHOT: tuple[str, ...] = (
    "github.io", "githubusercontent.com", "gitlab.io", "blogspot.com",
    "wordpress.com", "tumblr.com", "netlify.app", "vercel.app",
    "web.app", "firebaseapp.com", "herokuapp.com", "pages.dev",
    "workers.dev", "s3.amazonaws.com", "cloudfront.net", "azurewebsites.net",
    "cloudapp.azure.com", "appspot.com", "fastly.net", "neocities.org",
)


def parse_rules(lines: Iterable[str]) -> list[tuple[str, int, bool, bool]]:
    """PSL text → (key, n_labels, is_exception, is_wildcard) rows.
    Accepts the raw public_suffix_list.dat format: comments (``//``) and
    blank lines are skipped, one rule per line. The join key keeps the
    literal ``*.`` prefix for wildcard rules and drops the ``!`` for
    exceptions (exceptions match an exact host suffix)."""
    out: dict[str, tuple[str, int, bool, bool]] = {}
    for raw in lines:
        rule = raw.strip().lower()
        if not rule or rule.startswith("//"):
            continue
        exc = rule.startswith("!")
        key = rule[1:] if exc else rule
        wild = key.startswith("*.")
        out[key] = (key, key.count(".") + 1, exc, wild)
    return list(out.values())


def psl_rules(
    spark: SparkSession,
    rules: Iterable[str] | None = None,
    include_private: bool = True,
) -> DataFrame:
    """The rules table: (key, k, exc, wild). Metadata-sized (snapshot
    ~250 rows; full PSL ~15k) — always broadcast."""
    if rules is None:
        rules = PSL_ICANN_SNAPSHOT + (
            PSL_PRIVATE_SNAPSHOT if include_private else ()
        )
    return spark.createDataFrame(
        parse_rules(rules), "key string, k int, exc boolean, wild boolean"
    )


def psl_registered_domain(
    df: DataFrame,
    col: str | Column,
    out_col: str = "domain",
    rules: Iterable[str] | None = None,
    include_private: bool = True,
    is_host: bool = False,
) -> DataFrame:
    """Append ``out_col`` = PSL registered (pay-level) domain of a URL
    (or bare-host when ``is_host``) column. NULL when the host is itself
    a public suffix (or empty). D exact + D−1 wildcard broadcast left
    joins, no shuffle, no UDF — see module docstring."""
    from .text import url_host

    spark = df.sparkSession
    rdf = psl_rules(spark, rules, include_private)
    depth = rdf.groupBy().max("k").collect()[0][0] or 1  # metadata-sized

    host = (
        F.lower(F.col(col) if isinstance(col, str) else col)
        if is_host
        else url_host(col)
    )
    out = (
        df.withColumn("_psl_h", host)
        .withColumn("_psl_labs", F.split(F.col("_psl_h"), "\\."))
        .withColumn("_psl_n", F.size("_psl_labs"))
    )
    exc_ps: list[Column] = []  # exception matches, depth-descending
    norm_ps: list[Column] = []  # normal + wildcard matches, depth-desc
    drop = ["_psl_h", "_psl_labs", "_psl_n"]
    for k in range(depth, 0, -1):
        suffix_k = F.when(
            F.col("_psl_n") >= k,
            F.concat_ws(".", F.slice("_psl_labs", -k, k)),
        )
        ek = rdf.filter((F.col("k") == k) & ~F.col("wild")).select(
            F.col("key").alias(f"_psl_ek{k}"), F.col("exc").alias(f"_psl_ex{k}")
        )
        out = out.withColumn(f"_psl_ck{k}", suffix_k).join(
            F.broadcast(ek), F.col(f"_psl_ck{k}") == F.col(f"_psl_ek{k}"), "left"
        )
        drop += [f"_psl_ck{k}", f"_psl_ek{k}", f"_psl_ex{k}"]
        exc_ps.append(F.when(F.col(f"_psl_ex{k}"), F.lit(k - 1)))
        norm_ps.append(F.when(~F.col(f"_psl_ex{k}"), F.lit(k)))
        if k >= 2:
            wild_k = F.when(
                F.col("_psl_n") >= k,
                F.concat(
                    F.lit("*."), F.concat_ws(".", F.slice("_psl_labs", -(k - 1), k - 1))
                ),
            )
            wk = rdf.filter((F.col("k") == k) & F.col("wild")).select(
                F.col("key").alias(f"_psl_wk{k}")
            )
            out = out.withColumn(f"_psl_cw{k}", wild_k).join(
                F.broadcast(wk), F.col(f"_psl_cw{k}") == F.col(f"_psl_wk{k}"), "left"
            )
            drop += [f"_psl_cw{k}", f"_psl_wk{k}"]
            norm_ps.append(F.when(F.col(f"_psl_wk{k}").isNotNull(), F.lit(k)))
    # Prevailing rule: any exception beats all, else longest match, else
    # the implicit "*" (ps = 1). Lists are depth-descending so coalesce
    # picks the longest within each class.
    ps = F.coalesce(*exc_ps, *norm_ps, F.lit(1))
    out = out.withColumn("_psl_ps", ps)
    reg = F.when(
        (F.col("_psl_h") != "") & (F.col("_psl_n") > F.col("_psl_ps")),
        F.concat_ws(
            ".",
            F.slice(
                F.col("_psl_labs"),
                (F.col("_psl_ps") + 1) * -1,
                F.col("_psl_ps") + 1,
            ),
        ),
    )
    return out.withColumn(out_col, reg).drop(*drop, "_psl_ps")


def oracle_rules_values() -> str:
    """The snapshot (ICANN + private) as a DuckDB VALUES list — the
    oracle builds its rules CTE from the SAME constants, so Spark and
    SQL can never drift."""
    rules = PSL_ICANN_SNAPSHOT + PSL_PRIVATE_SNAPSHOT
    return ", ".join(f"('{r}')" for r in rules)
