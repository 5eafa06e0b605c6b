"""Link-resolution operator library: the reference's validator pipeline,
re-expressed as columnar Spark (SURVEY.md §2.2-§2.4, §3.1).

Architecture (scale-first):
  1. build_qid_facts(): ALL per-QID knowledge (existence, best interwiki,
     disambig/list/unlinkable classification, dissolved, headquarters, ...)
     is aggregated ONCE PER DISTINCT QID — never per element row. At 10^12
     elements this is the difference between joining a broadcastable facts
     dim and re-running ontology closure per row.
  2. resolve(): the element-side pipeline is a DAG of column expressions +
     broadcast joins against qid_facts/pages/redirects, with three small
     explode->aggregate stages for the per-key loops. The reference's
     short-circuit priority (wikimedia_link_issue_reporter.py:275-298) is
     preserved by a coalesce fold over per-stage error structs, in exactly
     the reference's order.

Deterministic canonicalizations (documented deviations, SURVEY.md §7.3):
  - the reference iterates dict insertion order; we canonicalize to sorted
    key order for the per-key loops (min_by over (key_rank, check_rank)).
  - A5 broad-vs-specific: we pick min(type_qid) among non-broad failures
    (reference keeps the last traversal hit, which is cache-order dependent).

Every error_id string is byte-identical to the reference (citations at
each construction site).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from wikibrain_spark.functions import knowledge, wikitext
from wikibrain_spark.functions.languages import LANGUAGE_CODES_BY_IMPORTANCE
from wikibrain_spark.geo.geodesic import haversine_km_col
from wikibrain_spark.operators import closure as closure_ops

ERR_SCHEMA = "struct<error_id:string,error_message:string>"


def _err(error_id: Column | str, message: Column | str) -> Column:
    eid = error_id if isinstance(error_id, Column) else F.lit(error_id)
    msg = message if isinstance(message, Column) else F.lit(message)
    return F.struct(eid.alias("error_id"), msg.alias("error_message"))


@dataclass
class WikiDims:
    """Dimension tables replacing the reference's network call surface
    (SURVEY.md §2.1 S2-S9); all broadcast-sized relative to elements."""

    wikidata: DataFrame        # qid, label_en, sitelinks map<string,string>, lat, lon
    claims: DataFrame          # qid, pid, value_str, value_qid, value_lat, value_lon, qualifier_pids array<string>
    pages: DataFrame           # lang, title, qid
    page_redirects: DataFrame  # lang, from_title, to_title
    qid_redirects: DataFrame   # from_qid, to_qid
    edges: DataFrame           # child_qid, parent_qid, pid in {P31, P279}


@dataclass
class ResolveConfig:
    expected_language_code: str | None = None
    languages_ordered_by_preference: list[str] = field(default_factory=list)


# =====================================================================
# per-QID facts (computed once per distinct QID, broadcast to elements)
# =====================================================================

def best_interwiki(dims: WikiDims, cfg: ResolveConfig) -> DataFrame:
    """(qid, best_link 'lang:title') — first language in (preference list +
    global importance order) having a sitelink (get_best_interwiki_link_by_id,
    wikimedia_link_issue_reporter.py:692-699 / SURVEY.md A6)."""
    spark = dims.wikidata.sparkSession
    prio = list(dict.fromkeys(list(cfg.languages_ordered_by_preference) + LANGUAGE_CODES_BY_IMPORTANCE))
    prio_df = spark.createDataFrame(list(enumerate(prio)), "rank int, lang string")
    links = dims.wikidata.select("qid", F.explode("sitelinks").alias("lang", "title"))
    return (
        links.join(F.broadcast(prio_df), "lang")
        .groupBy("qid")
        .agg(F.min_by(F.concat("lang", F.lit(":"), "title"), "rank").alias("best_link"))
    )


def build_qid_facts(dims: WikiDims, cfg: ResolveConfig) -> DataFrame:
    """One row per QID with every per-entity fact the pipeline needs.

    Columns: qid, best_link, is_disambig, is_list, unlink_what,
    unlink_replacement, has_p247, has_p279_claim, dissolved (P576 w/o P1011
    qualifier), hq_lats, hq_lons (P159), has_area (P2046), teryt_simc (P4046).
    """
    spark = dims.wikidata.sparkSession
    ignored = knowledge.ontology_ignore_list()

    base = dims.wikidata.select("qid")

    bi = best_interwiki(dims, cfg)

    # instance types (P31 roots + their P279 closure) for disambig/list
    types = closure_ops.instance_types(dims.edges, ignored=ignored)
    type_flags = types.groupBy("qid").agg(
        F.max(F.col("type_qid") == "Q4167410").alias("is_disambig"),   # :1734-1735
        F.max(F.col("type_qid") == "Q13406463").alias("is_list"),      # :1753
    )

    # classifying ancestors (P279-closure of self ∪ closure of P31 roots,
    # :1433-1453) + reflexive self, joined to invalid_types (:1539-1732)
    classifying = closure_ops.classifying_ancestors(dims.edges, ignored=ignored)
    classifying = classifying.union(base.select("qid", F.col("qid").alias("ancestor"))).distinct()
    inv = knowledge.invalid_types_df(spark)
    fails = classifying.join(F.broadcast(inv), classifying["ancestor"] == inv["type_qid"])
    ambiguous = classifying.where(F.col("ancestor") == "Q122754124").select("qid").distinct() \
        .withColumn("is_ambiguous_item", F.lit(True))  # :1503-1506
    unlink = (
        fails.groupBy("qid")
        .agg(
            # A5 specificity preference (:1524-1529): non-broad beats broad;
            # canonical tie-break = min type_qid (see module docstring)
            F.min_by(
                F.struct("what", "replacement"),
                F.struct(F.col("is_broad").cast("int").alias("b"), F.col("type_qid").alias("t")),
            ).alias("u")
        )
        .select("qid", F.col("u.what").alias("unlink_what"), F.col("u.replacement").alias("unlink_replacement"))
    )

    # taxonomy + country facts
    is_taxon = (
        classifying.where(F.col("ancestor") == "Q16521").select("qid").distinct()
        .withColumn("is_taxon", F.lit(True))  # :1776, :1822-1824
    )

    c = dims.claims
    p105 = (
        c.where((F.col("pid") == "P105") & F.col("value_qid").isNotNull())
        .groupBy("qid").agg(F.collect_set("value_qid").alias("p105_qids"))  # :1795
    )
    # P17 countries, excluding statements qualified by P582 (:2684-2701)
    p17 = (
        c.where((F.col("pid") == "P17") & F.col("value_qid").isNotNull()
                & ~F.array_contains(F.coalesce("qualifier_pids", F.array()), "P582"))
        .groupBy("qid").agg(F.collect_set("value_qid").alias("countries"))
    )
    has_p17 = c.where(F.col("pid") == "P17").select("qid").distinct().withColumn("has_p17", F.lit(True))

    sitelink_expected = dims.wikidata.select(
        "qid",
        (F.element_at("sitelinks", cfg.expected_language_code)
         if cfg.expected_language_code else F.lit(None).cast("string")).alias("sitelink_expected"),
    )

    p247 = c.where(F.col("pid") == "P247").select("qid").distinct().withColumn("has_p247", F.lit(True))
    p279c = c.where(F.col("pid") == "P279").select("qid").distinct().withColumn("has_p279_claim", F.lit(True))
    # P576 dissolved unless qualified by P1011 (:736-750)
    dissolved = (
        c.where((F.col("pid") == "P576") & ~F.array_contains(F.coalesce("qualifier_pids", F.array()), "P1011"))
        .select("qid").distinct().withColumn("dissolved", F.lit(True))
    )
    hq = (
        c.where((F.col("pid") == "P159") & F.col("value_lat").isNotNull())
        .groupBy("qid")
        .agg(F.collect_list("value_lat").alias("hq_lats"), F.collect_list("value_lon").alias("hq_lons"))
    )
    area = c.where(F.col("pid") == "P2046").select("qid").distinct().withColumn("has_area", F.lit(True))
    teryt = (
        c.where(F.col("pid") == "P4046")
        .groupBy("qid").agg(F.first("value_str").alias("teryt_simc"))
    )

    facts = (
        base.join(bi, "qid", "left")
        .join(type_flags, "qid", "left")
        .join(ambiguous, "qid", "left")
        .join(unlink, "qid", "left")
        .join(is_taxon, "qid", "left")
        .join(p105, "qid", "left")
        .join(p17, "qid", "left")
        .join(has_p17, "qid", "left")
        .join(sitelink_expected, "qid", "left")
        .join(p247, "qid", "left")
        .join(p279c, "qid", "left")
        .join(dissolved, "qid", "left")
        .join(hq, "qid", "left")
        .join(area, "qid", "left")
        .join(teryt, "qid", "left")
        .fillna(
            {"is_disambig": False, "is_list": False, "is_ambiguous_item": False,
             "is_taxon": False, "has_p17": False,
             "has_p247": False, "has_p279_claim": False, "dissolved": False, "has_area": False}
        )
    )
    return facts


def _facts_cols(prefix: str) -> list[str]:
    return ["best_link", "is_disambig", "is_list", "is_ambiguous_item", "unlink_what",
            "unlink_replacement", "has_p247", "has_p279_claim", "dissolved",
            "hq_lats", "hq_lons", "has_area", "teryt_simc",
            "is_taxon", "p105_qids", "countries", "has_p17", "sitelink_expected"]


def _join_facts(df: DataFrame, facts: DataFrame, qid_col: str, prefix: str) -> DataFrame:
    """Left-join qid_facts for `qid_col`, aliasing fact columns with prefix.
    Adds `{prefix}_exists` (the 404 signal, SURVEY.md J1)."""
    sel = [F.col("qid").alias(f"__{prefix}_qid"), F.lit(True).alias(f"{prefix}_exists")] + [
        F.col(c).alias(f"{prefix}_{c}") for c in _facts_cols(prefix)
    ]
    f = facts.select(*sel)
    out = df.join(F.broadcast(f), df[qid_col] == f[f"__{prefix}_qid"], "left").drop(f"__{prefix}_qid")
    return out.withColumn(f"{prefix}_exists", F.coalesce(F.col(f"{prefix}_exists"), F.lit(False)))


# =====================================================================
# stage helpers (each returns DF(element_id, err struct) or a Column)
# =====================================================================

def _tag(key: str) -> Column:
    return F.element_at("tags", key)


def _should_be_deleted() -> Column:
    """object_should_be_deleted_not_repaired (:2712-2722) — filter, no report."""
    return (
        ((F.col("object_type") == "relation") & (_tag("type") == F.lit("person")))
        | (_tag("historic") == F.lit("battlefield"))
        | (_tag("boundary") == F.lit("timezone"))
        | _tag("xmas:feature").isNotNull()
    )


def _summary_of_tags(wd: Column, wp: Column) -> Column:
    """get_should_use_subject_error_tag_summary (:1329-1336)."""
    return (
        F.when(wd.isNotNull() & wp.isNotNull(), F.lit("wikipedia and wikidata"))
        .when(wd.isNotNull(), F.lit("wikidata"))
        .otherwise(F.lit("wikipedia"))
    )


def _teryt_err() -> Column:
    """use_special_properties_allowing_to_ignore_wikipedia_tags (:300-334).
    Needs columns: wd_teryt_simc (facts of tags.wikidata), wd_best_link."""
    simc_tag = _tag("teryt:simc")
    simc_wd = F.col("wd_teryt_simc")
    applicable = _tag("wikidata").isNotNull() & simc_tag.isNotNull() & simc_wd.isNotNull()
    return F.when(
        applicable & (simc_wd != simc_tag),
        _err(
            "mismatching teryt:simc codes in wikidata and in osm element",  # :313
            F.concat(F.lit("mismatching teryt:simc codes in wikidata ("), _tag("wikidata"),
                     F.lit(") where "), simc_wd, F.lit(" is declared and in osm element, where teryt:simc="),
                     simc_tag, F.lit(" is declared.")),
        ),
    ).when(
        applicable & (simc_wd == simc_tag)
        & ~(F.col("wikipedia").eqNullSafe(F.col("wd_best_link"))),
        F.when(
            F.col("wd_best_link").isNotNull(),
            _err(
                "wikipedia needs to be updated based on wikidata code and teryt:simc identifier",  # :323
                F.concat(F.lit("new wikipedia tag "), F.col("wd_best_link"),
                         F.lit(" proposed based on matching teryt:simc codes")),
            ),
        ).otherwise(
            _err(
                "wikipedia tag needs to be removed based on wikidata code and teryt:simc identifier",  # :330
                F.lit("it seems that wikipedia tag should be removed given matching teryt:simc codes"),
            )
        ),
    )


# ---------------------------------------------------------------- stage 2a

def _old_style_errors(elements: DataFrame, dims: WikiDims, bi: DataFrame) -> DataFrame:
    """remove_old_style_wikipedia_tags (:830-938) -> (element_id, err)."""
    keys = elements.select(
        "element_id", "tags",
        _tag("wikipedia").alias("wikipedia"), _tag("wikidata").alias("wikidata"),
        F.explode(F.filter(F.array_sort(F.map_keys("tags")), lambda k: k.contains("wikipedia:"))).alias("key"),
    )
    invalid = (
        keys.where(~wikitext.is_valid_old_style_key(F.col("key")))
        .groupBy("element_id")
        .agg(F.min("key").alias("bad_key"))
        .select(
            "element_id",
            _err(
                "invalid old-style wikipedia tag",  # :845
                F.concat(F.lit("wikipedia tag in outdated form ("), F.col("bad_key"),
                         F.lit("), is not using any known language code")),
            ).alias("err"),
        )
    )

    # valid old-style keys -> candidate links (:970-997)
    cand = keys.where(wikitext.is_valid_old_style_key(F.col("key"))).select(
        "element_id", "wikipedia", "wikidata",
        wikitext.old_style_lang_of(F.col("key")).alias("k_lang"),
        F.element_at("tags", F.col("key")).alias("k_article"),
    )
    dbl = F.col("k_article").startswith(F.concat("k_lang", F.lit(":")))  # double-prefix (:976-984)
    cand = cand.select(
        "element_id", "wikipedia", "wikidata",
        F.when(dbl, wikitext.lang_code_of(F.col("k_article"))).otherwise(F.col("k_lang")).alias("lang"),
        F.when(dbl, wikitext.article_name_of(F.col("k_article"))).otherwise(F.col("k_article")).alias("article"),
    )
    pages = dims.pages.select(F.col("lang"), F.col("title"), F.col("qid").alias("cand_qid"))
    cand = cand.join(F.broadcast(pages), (cand["lang"] == pages["lang"]) & (cand["article"] == pages["title"]), "left").drop(pages["lang"]).drop("title")
    cand = cand.join(F.broadcast(bi.withColumnRenamed("qid", "cand_qid")), "cand_qid", "left")
    cand = cand.withColumn(
        "link", F.coalesce("best_link", F.concat("lang", F.lit(":"), "article"))
    )
    # resolve each distinct link to a QID (primary wikipedia joins in too)
    prim = elements.where(
        _tag("wikipedia").isNotNull()
        & (F.size(F.filter(F.map_keys("tags"), lambda k: k.contains("wikipedia:"))) > 0)
    ).select(
        "element_id", _tag("wikipedia").alias("wikipedia"), _tag("wikidata").alias("wikidata"),
        _tag("wikipedia").alias("link"),
    )
    links = cand.select("element_id", "wikipedia", "wikidata", "link").union(prim).distinct()
    links = links.withColumn("l_lang", wikitext.lang_code_of(F.col("link"))).withColumn(
        "l_article", wikitext.article_name_of(F.col("link"))
    )
    # follow wikipedia redirect when applicable (:878-881)
    pr = dims.page_redirects.select(
        F.col("lang").alias("l_lang"), F.col("from_title").alias("l_article"),
        F.col("to_title").alias("redir_title"),
    )
    links = links.join(F.broadcast(pr), ["l_lang", "l_article"], "left")
    links = links.withColumn(
        "l_final",
        F.when(F.col("redir_title").isNotNull() & ~F.col("l_article").contains("#"), F.col("redir_title")).otherwise(F.col("l_article")),
    )
    p2 = dims.pages.select(
        F.col("lang").alias("l_lang"), F.col("title").alias("l_final"), F.col("qid").alias("link_qid")
    )
    links = links.join(F.broadcast(p2), ["l_lang", "l_final"], "left")

    agg = links.groupBy("element_id").agg(
        F.first("wikipedia", ignorenulls=True).alias("wp"),
        F.first("wikidata", ignorenulls=True).alias("wd"),
        F.max(F.col("link_qid").isNull()).alias("any_unresolved"),
        F.collect_set("link_qid").alias("qids"),
    )
    # conflicts (canonicalized: see module docstring / :857-900)
    agg = agg.withColumn(
        "all_ids", F.array_distinct(F.filter(F.concat(F.array("wd"), "qids"), lambda x: x.isNotNull()))
    )
    agg = agg.withColumn("has_conflict", F.col("any_unresolved") | (F.size("all_ids") > 1))
    converted = agg.select(
        "element_id",
        F.when(
            F.col("has_conflict"),
            _err(
                "wikipedia tag in outdated form and there is mismatch between links",  # :917
                F.lit("wikipedia tag in outdated form, with conflicts between links; requires human judgment"),
            ),
        )
        .when(
            F.col("wp").isNull(),
            _err(
                "wikipedia tag from wikipedia tag in an outdated form",  # :924
                F.lit("wikipedia tag in outdated form, wikipedia tag may be added"),
            ),
        )
        .otherwise(
            _err(
                "wikipedia tag in an outdated form for removal",  # :934
                F.lit("wikipedia tag in outdated form, with wikipedia and wikidata tag present and may be safely removed"),
            )
        )
        .alias("err"),
    )
    # invalid beats conversion (:833-838)
    return (
        invalid.withColumnRenamed("err", "err_a")
        .join(converted.withColumnRenamed("err", "err_b"), "element_id", "full")
        .select("element_id", F.coalesce("err_a", "err_b").alias("err"))
    )


# ---------------------------------------------------------------- stage 2b

def _per_key_errors(elements: DataFrame, dims: WikiDims) -> DataFrame:
    """The :345-371 per-key malformed/404 loop -> (element_id, err)."""
    tagged = elements.select(
        "element_id",
        F.explode("tags").alias("key", "value"),
        F.array_sort(F.map_keys("tags")).alias("sorted_keys"),
    ).withColumn("key_rank", F.array_position("sorted_keys", F.col("key"))).drop("sorted_keys")

    is_wd = F.col("key").contains("wikidata")
    is_wp = F.col("key").contains("wikipedia")
    tagged = tagged.where(is_wd | is_wp)

    actual = wikitext.is_actual_wiki_key(F.col("key"))
    value = F.col("value")

    # --- wikidata malformed (check_is_wikidata_link_clearly_malformed :604-616)
    ety = (F.col("key") == "name:etymology:wikidata:missing") & (value == "yes")
    wd_broken = wikitext.is_wikidata_value_broken(value)
    prefix = F.regexp_replace(F.col("key"), ":wikidata$", "")
    malformed_wd = F.when(
        is_wd & ety,
        _err("name:etymology:wikidata:missing",  # :608
             F.lit("name:etymology:wikidata:missing with value 'yes' - a really dubious tagging scheme")),
    ).when(
        is_wd & wd_broken & (F.col("key") == "wikidata"),
        _err("malformed wikidata tag",  # :621
             F.concat(F.lit("malformed value in wikidata tag ("), value,
                      F.lit(") value is expected to be like Q63736736  with Q at start and then numbers"))),
    ).when(
        is_wd & wd_broken & (F.col("key") != "wikidata") & actual & F.col("key").endswith(":wikidata"),
        _err(F.concat(F.lit("malformed secondary wikidata tag - for "), prefix, F.lit(" prefixed tags")),  # :630
             F.concat(F.lit("malformed value in "), F.col("key"), F.lit(" tag ("), value, F.lit(")"))),
    ).when(
        is_wd & wd_broken & (F.col("key") != "wikidata") & actual,
        _err(F.concat(F.lit("malformed secondary wikidata tag for "), F.col("key"), F.lit(" tag")),  # :636
             F.concat(F.lit("malformed value in "), F.col("key"), F.lit(" tag ("), value, F.lit(")"))),
    )

    # --- wikipedia malformed (check_is_wikipedia_link_clearly_malformed :583-602)
    lang = wikitext.lang_code_of(value)
    wp_broken = wikitext.is_wikipedia_value_broken(value)
    wp_prefix = F.regexp_replace(F.col("key"), ":wikipedia$", "")
    malformed_wp = F.when(
        is_wp & wp_broken & (F.col("key") == "wikipedia"),
        _err("malformed wikipedia tag",  # :621 via :587
             F.concat(F.lit("malformed value in wikipedia tag ("), value,
                      F.lit(") expected forma will be like en:Idaho - with language code, colon and article name"))),
    ).when(
        is_wp & wp_broken & (F.col("key") != "wikipedia") & actual & F.col("key").endswith(":wikipedia"),
        _err(F.concat(F.lit("malformed secondary wikipedia tag - for "), wp_prefix, F.lit(" prefixed tags")),
             F.concat(F.lit("malformed value in "), F.col("key"), F.lit(" tag ("), value, F.lit(")"))),
    ).when(
        is_wp & wp_broken & (F.col("key") != "wikipedia") & actual,
        _err(F.concat(F.lit("malformed secondary wikipedia tag for "), F.col("key"), F.lit(" tag")),
             F.concat(F.lit("malformed value in "), F.col("key"), F.lit(" tag ("), value, F.lit(")"))),
    ).when(
        is_wp & ~wp_broken & F.array_contains(F.lit(wikitext.LANGUAGE_CODE_REDIRECTS), lang),
        _err("wikipedia tag using redirecting language code",  # :592
             F.concat(F.lit("language code ("), lang, F.lit(") in wikipedia tag ("), value,
                      F.lit(") points to redirecting language code"))),
    ).when(
        is_wp & ~wp_broken & ~F.array_contains(F.lit(LANGUAGE_CODES_BY_IMPORTANCE), lang),
        _err("malformed wikipedia tag - nonexisting language code",  # :598
             F.concat(F.lit("language code ("), lang, F.lit(") in wikipedia tag ("), value,
                      F.lit(") points to nonexisting Wikipedia"))),
    )

    # --- wikidata 404 (check_is_wikidata_page_existing :558-581); needs a join
    # trailing-';' multi-value tolerance mirrors the malformed check
    # (:1163-1164): strip one trailing ';' before splitting secondaries
    value_norm = F.when(
        value.endswith(";") & (F.size(F.split(value, ";", -1)) > 2),
        F.regexp_replace(value, ";$", ""),
    ).otherwise(value)
    parts = tagged.where(is_wd & actual & ~wd_broken & ~ety).select(
        "element_id", "key", "key_rank",
        F.posexplode(
            F.when(F.col("key") == "wikidata", F.array(F.col("value"))).otherwise(F.split(value_norm, ";", -1))
        ).alias("pos", "part"),
    )
    qids = dims.wikidata.select(F.col("qid").alias("part")).withColumn("found", F.lit(True))
    missing = (
        parts.join(F.broadcast(qids), "part", "left")
        .where(F.col("found").isNull())
        .groupBy("element_id", "key", "key_rank")
        .agg(F.min_by("part", "pos").alias("missing_part"))
        .select(
            "element_id", "key_rank",
            F.lit(1).alias("check_rank"),
            F.when(
                F.col("key") == "wikidata",
                _err("wikidata tag links to 404",  # :567
                     F.concat(F.col("key"), F.lit(" tag present on element points to not existing element"))),
            ).otherwise(
                _err("secondary wikidata tag links to 404",  # :569
                     F.concat(F.col("key"), F.lit(" tag present on element points to not existing element"))),
            ).alias("err"),
        )
    )

    # --- wikipedia 404 (primary only, :366-369): closed-world pages lookup
    wp_page = tagged.where((F.col("key") == "wikipedia") & ~wp_broken).select(
        "element_id", "key_rank",
        lang.alias("lang"),
        wikitext.strip_section(wikitext.article_name_of(value)).alias("title"),
    )
    pages = dims.pages.select("lang", "title").withColumn("page_found", F.lit(True))
    wp404 = (
        wp_page.join(F.broadcast(pages), ["lang", "title"], "left")
        .where(F.col("page_found").isNull())
        .select(
            "element_id", "key_rank", F.lit(3).alias("check_rank"),
            _err("wikipedia tag links to 404",  # :711
                 F.lit("Wikipedia article linked from OSM object using wikipedia tag is missing.")).alias("err"),
        )
    )

    inline = tagged.select(
        "element_id", "key_rank",
        F.when(malformed_wd.isNotNull(), F.lit(0)).otherwise(F.lit(2)).alias("check_rank"),
        F.coalesce(malformed_wd, malformed_wp).alias("err"),
    ).where(F.col("err").isNotNull())

    all_errs = inline.unionByName(missing).unionByName(wp404)
    return all_errs.groupBy("element_id").agg(
        F.min_by("err", F.struct("key_rank", "check_rank")).alias("err")
    )


# ---------------------------------------------------------------- stage 2c

def _collision_errors(elements: DataFrame, dims: WikiDims, facts: DataFrame) -> DataFrame:
    """check_for_wikipedia_wikidata_collision (:1017-1128) for the primary
    pair and every prefixed pair (:373-389) -> (element_id, err)."""
    pairs = elements.select(
        "element_id", "tags",
        F.explode(F.filter(F.array_sort(F.map_keys("tags")), lambda k: k.contains("wikidata"))).alias("wd_key"),
    ).withColumn("wp_key", F.regexp_replace("wd_key", "wikidata", "wikipedia"))
    pairs = pairs.where(F.map_contains_key("tags", F.col("wp_key")))
    pairs = pairs.select(
        "element_id",
        "wd_key", "wp_key",
        F.element_at("tags", F.col("wd_key")).alias("wd_val"),
        F.element_at("tags", F.col("wp_key")).alias("wp_val"),
        # primary pair is checked first (:378-382)
        F.when(F.col("wd_key") == "wikidata", F.lit(-1)).otherwise(
            F.array_position(F.array_sort(F.map_keys("tags")), F.col("wd_key"))
        ).alias("pair_rank"),
    )
    prefix = F.regexp_replace(F.col("wd_key"), ":wikidata$", "")
    pairs = pairs.where(
        ~wikitext.is_qid_part_broken(F.col("wd_val"))  # skip broken/multi (:1021)
        & (prefix != "not")                            # :1030-1034
    )
    pairs = pairs.withColumn("lang", wikitext.lang_code_of(F.col("wp_val"))).withColumn(
        "article", wikitext.article_name_of(F.col("wp_val"))
    )
    pairs = pairs.where(F.col("article").isNotNull())  # :1039-1040
    pairs = pairs.withColumn("article_stripped", wikitext.strip_section(F.col("article")))

    p_art = dims.pages.select(
        F.col("lang"), F.col("title").alias("article_stripped"), F.col("qid").alias("qid_article")
    )
    pairs = pairs.join(F.broadcast(p_art), ["lang", "article_stripped"], "left")

    qr = dims.qid_redirects.select(F.col("from_qid").alias("wd_val"), F.col("to_qid").alias("wd_redirected"))
    pairs = pairs.join(F.broadcast(qr), "wd_val", "left")

    pr = dims.page_redirects.select(
        F.col("lang"), F.col("from_title").alias("article"), F.col("to_title").alias("redir_title")
    )
    pairs = pairs.join(F.broadcast(pr), ["lang", "article"], "left")
    p_red = dims.pages.select(
        F.col("lang"), F.col("title").alias("redir_title"), F.col("qid").alias("qid_redirect")
    )
    pairs = pairs.join(F.broadcast(p_red), ["lang", "redir_title"], "left")

    fd = facts.select(F.col("qid"), F.col("is_disambig"))
    pairs = pairs.join(
        F.broadcast(fd.withColumnRenamed("qid", "qid_article").withColumnRenamed("is_disambig", "article_disambig")),
        "qid_article", "left",
    ).join(
        F.broadcast(fd.withColumnRenamed("qid", "wd_val").withColumnRenamed("is_disambig", "wd_disambig")),
        "wd_val", "left",
    )

    sfx = F.when(F.col("wd_key") == "wikidata", F.lit("")).otherwise(
        F.concat(F.lit(" - for "), prefix, F.lit(" prefixed tags"))
    )
    mismatch = ~F.col("wd_val").eqNullSafe(F.col("qid_article"))
    is_redirected = (
        F.col("redir_title").isNotNull()
        & (F.col("redir_title") != F.col("article"))
        & ~F.col("article").contains("#")
    )
    err = F.when(
        mismatch
        & F.col("wd_redirected").isNotNull() & (F.col("wd_redirected") != F.col("wd_val"))
        & F.col("wd_redirected").eqNullSafe(F.col("qid_article")),
        _err(F.concat(F.lit("wikipedia wikidata mismatch - follow wikidata redirect"), sfx),  # :1056
             F.concat(F.col("wd_key"), F.lit(" tag points to a redirect that should be followed"))),
    ).when(
        mismatch & is_redirected & F.col("wd_val").eqNullSafe(F.col("qid_redirect")),
        _err(F.concat(F.lit("wikipedia wikidata mismatch - follow wikipedia redirect"), sfx),  # :1081
             F.concat(F.col("wp_key"), F.lit(" tag points to a redirect that should be followed"))),
    ).when(
        mismatch & F.coalesce("article_disambig", F.lit(False)) & ~F.coalesce("wd_disambig", F.lit(False)),
        _err(
            F.concat(F.lit("wikipedia wikidata mismatch - wikipedia points to disambiguation page and wikidata does not"), sfx),  # :1092
            F.concat(F.lit("article claims to point to disambig, "), F.col("wd_key"), F.lit(" does not.")),
        ),
    ).when(
        mismatch,
        _err(F.concat(F.lit("wikipedia wikidata mismatch"), sfx),  # :1125
             F.concat(F.col("wd_key"), F.lit(" and "), F.col("wp_key"),
                      F.lit(" tags link to a different objects ("),
                      F.coalesce(F.col("wd_val"), F.lit("(missing)")), F.lit(" vs "),
                      F.coalesce(F.col("qid_article"), F.lit("(missing)")),
                      F.lit(" wikidata id assigned to linked Wikipedia article)"))),
    )
    return (
        pairs.select("element_id", "pair_rank", err.alias("err"))
        .where(F.col("err").isNotNull())
        .groupBy("element_id")
        .agg(F.min_by("err", F.col("pair_rank")).alias("err"))
    )


# =====================================================================
# main pipeline
# =====================================================================

def resolve(elements: DataFrame, dims: WikiDims, cfg: ResolveConfig | None = None) -> DataFrame:
    """elements(element_id, object_type, tags, lat, lon) -> one row per
    element that has a report: (element_id, error_id, error_message).

    Mirrors get_the_most_important_problem_generic (:275-298): the coalesce
    order IS the reference's short-circuit priority.
    """
    cfg = cfg or ResolveConfig()
    spark = elements.sparkSession

    facts = build_qid_facts(dims, cfg).persist()
    bi = facts.select("qid", "best_link")

    base = elements.where(~F.coalesce(_should_be_deleted(), F.lit(False)))  # :276-277
    base = base.withColumn("wikipedia", _tag("wikipedia")).withColumn("wikidata", _tag("wikidata"))
    base = base.withColumn("wp_lang", wikitext.lang_code_of(F.col("wikipedia"))).withColumn(
        "wp_article", wikitext.article_name_of(F.col("wikipedia"))
    )
    # qid from the primary wikipedia link (get_wikidata_object_id_from_link)
    p = dims.pages.select(
        F.col("lang").alias("wp_lang"), F.col("title").alias("wp_article"), F.col("qid").alias("qid_from_wp")
    )
    base = base.join(F.broadcast(p), ["wp_lang", "wp_article"], "left")
    base = base.withColumn("effective_wd", F.coalesce("wikidata", "qid_from_wp"))  # :416-423

    base = _join_facts(base, facts, "wikidata", "wd")
    base = _join_facts(base, facts, "effective_wd", "eff")

    # taxon-prefix qid resolution (:1785-1789) + slim taxonomy facts
    for pfx in ("species:", "taxon:", "genus:"):
        name = pfx.rstrip(":")
        wp = _tag(pfx + "wikipedia")
        lang_c = wikitext.lang_code_of(wp)
        art_c = wikitext.article_name_of(wp)
        base = base.withColumn(f"__{name}_lang", lang_c).withColumn(f"__{name}_art", art_c)
        pg = dims.pages.select(
            F.col("lang").alias(f"__{name}_lang"), F.col("title").alias(f"__{name}_art"),
            F.col("qid").alias(f"{name}_wp_qid"),
        )
        base = base.join(F.broadcast(pg), [f"__{name}_lang", f"__{name}_art"], "left")
        base = base.withColumn(
            f"__tx_{name}_qid", F.coalesce(_tag(pfx + "wikidata"), F.col(f"{name}_wp_qid"))
        )
        slim = facts.select(
            F.col("qid").alias(f"__tx_{name}_qid"),
            F.col("p105_qids").alias(f"tx_{name}_p105_qids"),
            F.col("is_taxon").alias(f"tx_{name}_is_taxon"),
        )
        base = base.join(F.broadcast(slim), f"__tx_{name}_qid", "left")
        base = base.withColumn(
            f"tx_{name}_is_taxon", F.coalesce(f"tx_{name}_is_taxon", F.lit(False))
        )

    # ---- stage 1: teryt override (:279-281)
    err1 = _teryt_err()

    # ---- stage 2: critical structural (:283-288)
    e2a = _old_style_errors(elements, dims, bi).withColumnRenamed("err", "err_2a")
    e2b = _per_key_errors(elements, dims).withColumnRenamed("err", "err_2b")
    e2c = _collision_errors(elements, dims, facts).withColumnRenamed("err", "err_2c")
    base = base.join(e2a, "element_id", "left").join(e2b, "element_id", "left").join(e2c, "element_id", "left")
    # the '#' post-rewrite (:285-288)
    base = base.withColumn(
        "err_2c",
        F.when(
            (F.col("err_2c.error_id") == "wikipedia wikidata mismatch")
            & F.coalesce(F.col("wikipedia").contains("#"), F.lit(False)),
            _err("wikipedia wikidata mismatch, wikipedia links to section - high risk of false positive",
                 F.col("err_2c.error_message")),
        ).otherwise(F.col("err_2c")),
    )

    # ---- stage 3: freely reorderable (:445-537)
    fixme = F.when(
        F.map_contains_key("tags", "fixme:wikipedia"),
        _err("something is wrong with wikipedia tag - fixme:wikipedia is present",  # :448
             F.lit("see fixme:wikipedia tag for hints")),
    )

    whitelisted = F.col("effective_wd").isin(knowledge.skipped_cases())  # :460-461

    bl = knowledge.blacklist_df(spark).withColumnRenamed("qid", "effective_wd").withColumnRenamed("prefix", "bl_prefix")
    base = base.join(F.broadcast(bl), "effective_wd", "left")
    blacklist_err = F.when(
        F.col("bl_prefix").isNotNull(),
        _err("blacklisted connection with known replacement",  # :552
             F.concat(F.lit("it is a typical wrong link and it has an obvious replacement, "),
                      F.col("bl_prefix"), F.lit("wikipedia/"), F.col("bl_prefix"),
                      F.lit("wikidata should be used instead"))),
    )

    board = F.when(
        (_tag("information") == "board") & F.col("wikipedia").isNotNull(),
        _err("information board with wikipedia tag, not subject:wikipedia",  # :470
             F.lit("information board topic must be tagged with subject:wikipedia tag - not with wikipedia tag")),
    ).when(
        (_tag("information") == "board") & F.col("wikidata").isNotNull(),
        _err("information board with wikidata tag, not subject:wikidata",  # :476
             F.lit("information board topic must be tagged with subject:wikidata tag - not with wikipedia tag")),
    )

    # not:* contradiction (:481-493) — pure map expression, no explode
    not_keys = F.filter(
        F.map_keys("tags"),
        lambda k: k.startswith("not:")
        & (k.contains("wikipedia") | k.contains("wikidata"))
        & F.element_at("tags", k.substr(F.lit(5), F.length(k))).isNotNull()
        & (F.element_at("tags", k.substr(F.lit(5), F.length(k))) == F.element_at("tags", k)),
    )
    not_err = F.when(
        F.size(not_keys) > 0,
        _err("wikipedia/wikidata type tag that is incorrect according to not:* tag",  # :488
             F.concat(F.array_min(not_keys), F.lit(" contradiction present - at least one of them is wrong"))),
    )

    # wikidata-semantics block (:495-501 → get_problem_based_on_wikidata_base_types)
    tag_summary = _summary_of_tags(F.col("wikidata"), F.col("wikipedia"))
    disambig_err = F.when(
        F.col("eff_is_disambig"),
        _err("link to a disambiguation page",  # :1749
             F.lit("link leads to a disambig page - not a proper wikipedia link")),
    ).when(
        F.col("eff_is_list") & ~F.coalesce(F.col("wikipedia").contains("#"), F.lit(False)),  # :497-501 suppression
        _err("link to a list",  # :1756
             F.lit("article linked in wikipedia tag is a list, so it is very unlikely to be correct")),
    )

    # unlinkable-as-primary (:1480-1533) with tag exemptions (:1512-1522)
    unlink_exempt = (
        ((F.col("eff_unlink_what") == "a human") & _tag("boundary").eqNullSafe("aboriginal_lands"))
        | ((F.col("eff_unlink_what") == "a bicycle sharing system") & _tag("type").eqNullSafe("network"))
        | F.col("eff_is_ambiguous_item")
        | F.coalesce(
            F.col("effective_wd").isin(["Q5338613", "Q5371519"] + knowledge.ontology_ignore_list()),
            F.lit(False),
        )
    )
    unlink_err = F.when(
        F.col("eff_unlink_what").isNotNull() & ~unlink_exempt,
        _err(
            F.concat(F.lit("should use a secondary wikipedia tag - linking from "),
                     tag_summary, F.lit(" tag to "), F.col("eff_unlink_what")),  # :1340
            F.concat(F.lit("linked wikidata entry ("), F.col("effective_wd"), F.lit(") is about "),
                     F.col("eff_unlink_what"), F.lit(", so it is very unlikely to be correct")),
        ),
    )

    # property-based unlinkable (:1421-1431)
    prop_err = F.when(
        F.col("eff_has_p247"),
        _err(F.concat(F.lit("should use a secondary wikipedia tag - linking from "),
                      tag_summary, F.lit(" tag to a spacecraft")),
             F.lit("linked wikidata entry is about a spacecraft")),
    ).when(
        F.col("eff_has_p279_claim"),
        _err(F.concat(F.lit("should use a secondary wikipedia tag - linking from "),
                      tag_summary, F.lit(" tag to an uncoordinable generic object")),
             F.lit("linked wikidata entry is about an uncoordinable generic object")),
    )

    # headquarters distance (:1880-1895): any P159 location > 20 km away
    hq_far = F.when(
        F.col("lat").isNotNull() & F.col("eff_hq_lats").isNotNull() & ~F.col("eff_has_area"),
        F.exists(
            F.zip_with("eff_hq_lats", "eff_hq_lons", lambda a, b: F.struct(a.alias("la"), b.alias("lo"))),
            lambda s: haversine_km_col(F.col("lat"), F.col("lon"), s["la"], s["lo"]) > 20,
        ),
    ).otherwise(F.lit(False))
    hq_err = F.when(
        hq_far,
        _err(F.concat(F.lit("should use a secondary wikipedia tag - linking from "),
                      tag_summary, F.lit(" tag to a company that has multiple locations")),  # :1893
             F.lit("linked wikidata entry is about a company that has multiple locations")),
    )

    # taxon checks (:1772-1830): species:/genus: via P105, taxon: via ontology
    taxon_errs = []
    for pfx, expected, via in (("species:", "Q7432", "p105"), ("taxon:", "Q16521", "ont"), ("genus:", "Q34740", "p105")):
        name = pfx.rstrip(":")
        qid_col = F.col(f"__tx_{name}_qid")
        applicable = qid_col.isNotNull() & ~qid_col.contains(";")  # :1792-1794
        if via == "p105":
            eid = f"{name} secondary tag links something that is not {name} according to wikidata (checking P105)"
            err = F.when(
                applicable & F.col(f"tx_{name}_p105_qids").isNull(),
                _err(eid, "no P105"),  # :1796-1801
            ).when(
                applicable & ~F.array_contains(F.coalesce(f"tx_{name}_p105_qids", F.array()), expected),
                _err(eid, "no matching P105"),  # :1802-1809
            )
        else:
            eid = f"{name} secondary tag links something that is not {name} according to wikidata (checking regular ontology)"
            err = F.when(applicable & ~F.col(f"tx_{name}_is_taxon"), _err(eid, eid))  # :1822-1830
        taxon_errs.append(err)

    semantics_err = F.coalesce(disambig_err, unlink_err, prop_err, hq_err, *taxon_errs)

    # language issues (:1211-1308). expected_language_code None -> only the
    # bot-wikipedia (ceb) check applies (:1224-1232).
    cur_lang = F.col("wp_lang")
    bot = cur_lang == "ceb"
    bot_err = _err("wikipedia tag links bot wikipedia",  # :1227
                   F.concat(F.lit("wikipedia page in unexpected language - "), cur_lang,
                            F.lit(" is a low quality, bot generated wikipedia - it should not be linked")))
    if cfg.expected_language_code is None:
        lang_err = F.when(F.col("wikipedia").isNotNull() & bot, bot_err)
    else:
        enforced = knowledge.official_language_countries(cfg.expected_language_code)
        recommended = F.col("eff_sitelink_expected")
        # why_object_is_allowed_to_have_foreign_language_label (:2657-2682):
        # non-null reason iff no wikidata entry, no P17 data, or any current
        # (non-P582) country outside the enforced set
        any_foreign_country = F.exists(
            F.coalesce("eff_countries", F.array()), lambda cq: ~cq.isin(enforced or ["__none__"])
        )
        allowed_foreign = (
            F.col("effective_wd").isNull()
            | ~F.col("eff_has_p17")
            | (F.size(F.coalesce("eff_countries", F.array())) == 0)
            | any_foreign_country
        )
        lang_err = F.when(
            F.col("wikipedia").isNull(), F.lit(None).cast(ERR_SCHEMA)
        ).when(
            recommended.isNull(), F.when(bot, bot_err)  # :1235-1242
        ).when(
            cur_lang == cfg.expected_language_code, F.lit(None).cast(ERR_SCHEMA)  # :1245-1247
        ).when(
            allowed_foreign,
            F.when(bot, _err("wikipedia tag links bot wikipedia in border region, can be changed to alternative",  # :1263
                             F.lit("bot wikipedia linked in border region"))),  # cur != recommended lang here
        ).when(
            bot,
            _err("wikipedia tag links bot wikipedia",  # :1280
                 F.lit("bot generated wikipedia linked; a potential replacement exists")),
        ).otherwise(
            _err("wikipedia tag unexpected language",  # :1286
                 F.concat(F.lit("wikipedia page in unexpected language - "),
                          F.lit(cfg.expected_language_code), F.lit(" was expected:"))),
        )
    # whole semantics block suppressed for special-skip qids (:1486-1498 via unlink only;
    # disambig/list/property checks are not — but ambiguous-item & ignore apply to unlink only)

    # existence (:507-509, :721-733) on the EFFECTIVE qid
    exist_err = F.when(
        F.col("eff_dissolved") & F.col("effective_wd").isNotNull(),
        _err("no longer existing object (according to Wikidata)",  # :729
             F.lit("Wikidata claims that this object no longer exists")),
    )

    # brand dissolved (:511-514, :752-793) — needs explode over ';' values
    brand_err_df = _brand_errors(elements, facts)
    base = base.join(brand_err_df, "element_id", "left")

    bridge_err = F.when(
        F.map_contains_key("tags", "bridge:wikipedia") & F.map_contains_key("tags", "bridge:wikidata"),
        _err("bridge:wikipedia and bridge:wikidata - move to bridge outline",  # :518
             F.lit("bridge:wikipedia and bridge:wikidata links should be tagged on man_made=bridge outline")),
    ).when(
        F.map_contains_key("tags", "bridge:wikipedia"),
        _err("bridge:wikipedia - move to bridge outline",  # :525
             F.lit("bridge:wikipedia link should be tagged on man_made=bridge outline")),
    ).when(
        F.map_contains_key("tags", "bridge:wikidata"),
        _err("bridge:wikipedia and bridge:wikidata - move to bridge outline",  # :532
             F.lit("bridge:wikidata link should be tagged on man_made=bridge outline")),
    )

    err3 = F.coalesce(
        fixme,
        F.when(whitelisted, F.lit(None).cast(ERR_SCHEMA)).otherwise(
            F.coalesce(blacklist_err, board, not_err, semantics_err, lang_err,
                       exist_err, F.col("brand_err"), bridge_err)
        ),
    )
    # NOTE: fixme precedes the whitelist (reference order :446-461); the
    # whitelist suppresses only the remainder of stage 3.

    # ---- stage 4: completion (:392-408)
    wd_from_wp = F.when(
        F.col("wikidata").isNull() & F.col("qid_from_wp").isNotNull(),
        _err("wikidata from wikipedia tag",  # :675
             F.concat(F.col("qid_from_wp"), F.lit(" may be added as wikidata tag based on wikipedia tag"))),
    )
    has_old_style = F.exists(F.map_keys("tags"), lambda k: k.contains("wikipedia:"))
    bi_lang = wikitext.lang_code_of(F.col("wd_best_link"))
    wp_from_wd = F.when(
        F.col("wikipedia").isNull() & F.col("wikidata").isNotNull() & ~has_old_style
        & F.col("wd_best_link").isNotNull() & (bi_lang != "ceb"),
        F.when(
            F.lit(cfg.expected_language_code).isNotNull() & (bi_lang == F.lit(cfg.expected_language_code)),
            _err("wikipedia from wikidata tag",  # :957
                 F.lit("without wikipedia tag, with wikidata tag present that provides article")),
        ).otherwise(
            _err("wikipedia from wikidata tag, unexpected language",  # :964
                 F.lit("without wikipedia tag, with wikidata tag present that provides article")),
        ),
    )
    err4 = F.coalesce(wd_from_wp, wp_from_wd)

    final = base.withColumn(
        "err",
        F.coalesce(err1, F.col("err_2a"), F.col("err_2b"), F.col("err_2c"), err3, err4),
    )
    return final.where(F.col("err").isNotNull()).select(
        "element_id", F.col("err.error_id").alias("error_id"), F.col("err.error_message").alias("error_message")
    )


def _brand_errors(elements: DataFrame, facts: DataFrame) -> DataFrame:
    """check_is_object_brand_is_existing (:752-793) -> (element_id, brand_err)."""
    b = elements.where(_tag("brand:wikidata").isNotNull())
    main_tags = ["office", "shop", "leisure", "amenity"]
    defunct = F.lit(False)
    active = F.lit(False)
    for mt in main_tags:
        for pre in ["disused:", "abandoned:"]:
            defunct = defunct | _tag(pre + mt).isNotNull()
        if mt == "shop":
            defunct = defunct | (_tag(mt) == "vacant")
        active = active | (_tag(mt).isNotNull() & ~_tag(mt).isin("no", "vacant"))
    b = b.select(
        "element_id", defunct.alias("marked_defunct"), active.alias("marked_active"),
        F.explode(F.split(_tag("brand:wikidata"), ";", -1)).alias("qid"),
    )
    dis = facts.select("qid", "dissolved")
    agg = (
        b.join(F.broadcast(dis), "qid", "left")
        .groupBy("element_id", "marked_defunct", "marked_active")
        .agg(F.collect_list(F.when(F.col("dissolved"), F.col("qid"))).alias("dissolved_qids"))
        .where(F.size("dissolved_qids") > 0)
    )
    state = F.when(
        F.col("marked_defunct") & ~F.col("marked_active"), F.lit(None).cast("string")  # :772-779
    ).when(
        ~F.col("marked_defunct") & F.col("marked_active"),
        F.lit("no longer existing brand (according to Wikidata) - and marked as active shop in OSM"),  # :780-781
    ).when(
        F.col("marked_defunct") & F.col("marked_active"),
        F.lit("no longer existing brand (according to Wikidata) - and marked as active shop in OSM, with tagging referring to defunct one"),  # :782-783
    ).otherwise(
        F.lit("no longer existing brand (according to Wikidata) - and tag processing has not worked well")  # :784-785
    )
    return agg.select(
        "element_id",
        F.when(
            state.isNotNull(),
            _err(state, F.concat(F.lit("wikidata "), F.concat_ws(", ", "dissolved_qids"),
                                 F.lit(" is marked as dissolved"))),  # :770
        ).alias("brand_err"),
    ).where(F.col("brand_err").isNotNull())
