"""J6/J7: the "machine-learning assistance" models as broadcast model
tables.

Reference:
- Path-MLA (machine_learning/MachineLearning.java): learns
  pagePath -> docUrlPath from successful results (gatherMLData :121-168)
  and predicts a docUrl for a new page as docPath + docId (+ext),
  requiring the prediction to appear among the page's internal links
  (predictInternalDocUrl :253-353). Ships DISABLED by default
  (useMLA=false, :33).
- Structure-MLA (machine_learning/PageStructureMLA.java): stores the
  DOM tag/class ancestry ("structure") of each successful doc link per
  pagePath (:35-40) and flags an extracted link whose structure matches
  (predictDocOrDatasetLink :65-100).

Spark-first: both models are small aggregated tables, broadcast-joined
into the link-resolution stage — learning is a groupBy over the results
x links tables, prediction is a join; no mutable state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import urls as U

#: MachineLearning.java:56-58 — a pagePath with >5 distinct docPaths is
#: too noisy to predict from.
MAX_DOC_PATHS_PER_PAGE_PATH = 5

#: html-ish page extensions stripped from the page's docId before the
#: prediction concat (the engine's PLAIN_PAGE_EXT_RE)
_PLAIN_PAGE_EXT = r"(?i)\.(?:html?|php\d?|aspx?|jsp|jspx|do|asp|cfm|cgi|shtml)$"


def _page_path(col):
    """Directory part of the url (UrlUtils.getPathStr semantics)."""
    return U.path_of(col)


def learn_path_model(results: DataFrame) -> DataFrame:
    """Path-MLA learning: successful (pageUrl -> docUrl) pairs ->
    (page_path, doc_path) with noisy page-paths dropped. Rows where
    the page IS the doc are skipped (gatherMLData's first guard,
    MachineLearning.java:123-124 — direct-doc results otherwise teach
    the model self-referential pairs that can push a legitimate
    page_path over the noise cap). The engine's in-crawl learn
    (plans/rounds.py) applies the same guard on final_url."""
    ok = results.filter(
        ~F.col("docOrDatasetUrl").isin("duplicate", "unreachable")
        & F.col("pageUrl").isNotNull()
        & (F.col("pageUrl") != "null")
        & (F.col("pageUrl") != F.col("docOrDatasetUrl"))
    )
    pairs = ok.select(
        _page_path(F.col("pageUrl")).alias("page_path"),
        _page_path(F.col("docOrDatasetUrl")).alias("doc_path"),
    ).filter(F.col("page_path").isNotNull() & F.col("doc_path").isNotNull())
    counted = pairs.groupBy("page_path").agg(
        F.collect_set("doc_path").alias("doc_paths")
    )
    return counted.filter(
        F.size("doc_paths") <= MAX_DOC_PATHS_PER_PAGE_PATH
    ).select("page_path", F.explode("doc_paths").alias("doc_path"))


def predict_doc_urls(
    pages: DataFrame,
    path_model: DataFrame,
    page_url_col: str = "page_url",
    links_col: str = "links",
) -> DataFrame:
    """Path-MLA prediction: for each page, docUrl = doc_path + docId of
    the page; accepted only if it appears among the page's extracted
    links (MachineLearning.java:253-353 membership rule). ``links_col``
    is an array<string> column."""
    # page-extension strip + learned doc-extension append, the
    # engine's in-crawl recipe (plans/rounds.py MLA prediction;
    # MachineLearning.java:289-296,305+): '.../123.html' predicts
    # docPath + '123' + learned ext, not docPath + '123.html'
    pages = pages.withColumn("_pp", _page_path(F.col(page_url_col))).withColumn(
        "_docid",
        F.regexp_replace(
            U.doc_id_of(F.col(page_url_col)), _PLAIN_PAGE_EXT, ""
        ),
    ).filter(F.col("_docid").isNotNull() & (F.col("_docid") != ""))
    joined = pages.join(
        F.broadcast(path_model), pages["_pp"] == path_model["page_path"], "inner"
    )
    ext = (
        F.coalesce(F.col("doc_ext"), F.lit(""))
        if "doc_ext" in path_model.columns else F.lit("")
    )
    predicted = joined.withColumn(
        "predicted_doc_url", F.concat(F.col("doc_path"), F.col("_docid"), ext)
    )
    return predicted.filter(
        F.array_contains(F.col(links_col), F.col("predicted_doc_url"))
    ).select(page_url_col, "predicted_doc_url")


def learn_structure_model(doc_links: DataFrame) -> DataFrame:
    """Structure-MLA learning: (page_url, link, structure) rows of
    VERIFIED doc links -> (page_path, structure) model."""
    return (
        doc_links.select(
            _page_path(F.col("page_url")).alias("page_path"),
            F.col("structure"),
        )
        .filter(F.col("page_path").isNotNull())
        .distinct()
    )


def predict_by_structure(
    extracted: DataFrame, structure_model: DataFrame
) -> DataFrame:
    """Structure-MLA prediction: exploded (page_url, link, structure)
    rows joined against the model on (page_path, structure) — a hit
    marks the link as the page's doc link (PageStructureMLA.java:65-100).
    """
    e = extracted.withColumn("_pp", _page_path(F.col("page_url")))
    return e.join(
        F.broadcast(structure_model),
        (e["_pp"] == structure_model["page_path"])
        & (e["structure"] == structure_model["structure"]),
        "inner",
    ).select("page_url", "link", e["structure"].alias("structure"))
