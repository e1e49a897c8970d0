"""Mime classification (SURVEY.md §2.6, N9) as native column expressions.

Ports the decision ladder of ``ConnSupportUtils.hasDocOrDatasetMimeType()``
(util/http/ConnSupportUtils.java:257-366) and ``getPlainMimeType()``
(:384-409). The known-mime lists are small broadcast-able lookup data
(isin() compiles to a hash-set probe JVM-side).

Categories: 'document' | 'dataset' | NULL (page/other).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import _reference_patterns as P

# knownDocMimeTypes (ConnSupportUtils.setKnownDocMimeTypes :148-202).
# Base list always present; the extended list applies when NOT downloading
# doc files (reference default: shouldDownloadDocFiles=false).
KNOWN_DOC_MIME_TYPES_BASE = [
    "application/pdf", "application/x-pdf", "image/pdf", "image/x-pdf",
    "text/pdf", "text/x-pdf", "application/acrobat", "application/vnd.adobe.pdf",
    "application/vnd.adobe.portable-document-format", "application/vnd.pdf",
    "application/vnd.ms-pdf", "application/pdf-stream", "application/x-pdf-stream",
]
KNOWN_DOC_MIME_TYPES_EXTENDED = KNOWN_DOC_MIME_TYPES_BASE + [
    "application/postscript", "application/x-postscript",
    "application/vnd.cups-postscript", "application/eps", "application/ps",
    "application/x-ps", "application/x-postscript-not-eps", "text/postscript",
    "image/eps", "image/ps", "application/msword", "application/vnd.ms-word",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.template",
    "application/vnd.ms-powerpoint", "application/vnd.oasis.opendocument.presentation",
    "application/x-tex", "application/vnd.oasis.opendocument.text",
    "application/vnd.ms-xpsdocument", "application/epub+zip", "application/oxps",
    "application/rtf", "application/x-impress",
    "application/vnd.oasis.opendocument.formula",
    "application/vnd.oasis.opendocument.graphics",
    "application/vnd.oasis.opendocument.chart",
    "application/vnd.oasis.opendocument.image", "application/vnd.apple.pages",
    "application/vnd.apple.keynote", "application/vnd.wordperfect",
]


def plain_mime_type(mime: Column) -> Column:
    """getPlainMimeType (ConnSupportUtils.java:384-409): strip charset /
    parentheses; NULL on >255 chars (ReDoS guard) or mismatch."""
    extracted = F.regexp_extract(mime, "^" + P.MIME_TYPE_FILTER + "$", 1)
    return F.when(
        mime.isNull() | (F.length(mime) > 255) | (extracted == ""), F.lit(None)
    ).otherwise(extracted)


def _strip_quotes(c: Column) -> Column:
    return F.regexp_replace(c, "['\"]", "")


def classify_mime(
    url: Column,
    mime: Column,
    content_disposition: Column,
    retrieve_documents: bool = True,
    retrieve_datasets: bool = True,
    download_doc_files: bool = False,
) -> Column:
    """N9: struct(mime_category, plain_mime). Mirrors the ladder of
    hasDocOrDatasetMimeType (ConnSupportUtils.java:257-366):

    1. "system.io.fileinfo" oddity -> Content-Disposition, then url.
    2. charset/name/paren-wrapped -> getPlainMimeType; on failure: url
       'pdf' substring / dataset-url-filter fallback.
    3. knownDocMimeTypes / knownDatasetMimeTypes|DATASET_MIME_TYPE regex.
    4. POSSIBLE_DOC_OR_DATASET (octet-stream etc.) -> disposition/url hints.
    5. otherwise page-candidate, unless disposition names a .pdf/dataset.
    6. no mime at all -> disposition-only path.
    """
    doc_list = (
        KNOWN_DOC_MIME_TYPES_BASE if download_doc_files else KNOWN_DOC_MIME_TYPES_EXTENDED
    )
    lower_url = F.lower(url)
    lower_disp = F.lower(content_disposition)
    mime_l = F.lower(mime)

    needs_plain = (
        mime_l.contains("charset") | mime_l.contains("name") | mime_l.startswith("(")
    )
    plain = F.when(needs_plain, plain_mime_type(mime_l)).otherwise(mime_l)
    plain = _strip_quotes(plain)

    url_is_dataset = lower_url.rlike("^(?:" + P.DATASET_URL_FILTER + ")$")
    disp_clear = _strip_quotes(lower_disp)
    disp_is_dataset = disp_clear.rlike("^(?:" + P.DATASET_URL_FILTER + ")$")
    disp_usable = content_disposition.isNotNull() & (lower_disp != "attachment")

    def result(category, plain_val):
        return F.struct(
            F.lit(category).alias("mime_category")
            if isinstance(category, str)
            else category.alias("mime_category"),
            plain_val.alias("plain_mime"),
        )

    null_result = result(F.lit(None).cast("string"), F.lit(None).cast("string"))
    pdf_lit = F.lit("application/pdf")

    # branch 1: System.IO.FileInfo (ConnSupportUtils.java:264-277)
    fileinfo = F.when(
        disp_usable & lower_disp.contains(".pdf"), result("document", pdf_lit)
    ).when(
        content_disposition.isNull() & lower_url.contains(".pdf"),
        result("document", pdf_lit),
    ).otherwise(null_result)

    # branch 2-fallback: plain-mime extraction failed (:285-291).
    # UNGATED on purpose: the reference checks the url's 'pdf' /
    # dataset shape here WITHOUT consulting retrieveDocuments /
    # retrieveDatasets (unlike every other branch) — mirroring the
    # gates diverged in non-default configs
    plain_failed = (
        F.when(lower_url.contains("pdf"), result("document", pdf_lit))
        .when(url_is_dataset, result("dataset", F.lit("unspecified")))
        .otherwise(null_result)
    )

    # branch 4: possible doc-or-dataset mime (:306-334)
    possible = F.when(
        disp_usable,
        F.when(
            F.lit(retrieve_documents) & lower_disp.contains(".pdf"),
            result("document", pdf_lit),
        ).when(
            F.lit(retrieve_datasets) & disp_is_dataset, result("dataset", plain)
        ).otherwise(null_result),
    ).otherwise(
        F.when(
            F.lit(retrieve_documents) & lower_url.contains("pdf"),
            result("document", pdf_lit),
        ).when(F.lit(retrieve_datasets) & url_is_dataset, result("dataset", plain))
        .otherwise(null_result)
    )

    # branch 5: page-candidate with doc-ish Content-Disposition
    # (:336-344). NOTE the reference's dataset check is NOT in an
    # else: when both '.pdf' and the dataset filter match, the
    # dataset assignment OVERWRITES the document one — so dataset
    # takes first position in this when-chain (branch 6 below DOES
    # have the else, document-first there is correct)
    page_disp = F.when(
        content_disposition.isNotNull(),
        F.when(
            F.lit(retrieve_datasets) & disp_is_dataset,
            result("dataset", plain),
        ).when(
            F.lit(retrieve_documents) & lower_disp.contains(".pdf"),
            result("document", pdf_lit),
        ).otherwise(null_result),
    ).otherwise(null_result)

    # branch 6: no mime — disposition only (:354-364)
    disp_only = F.when(
        disp_usable,
        F.when(
            F.lit(retrieve_documents) & lower_disp.contains(".pdf"),
            result("document", pdf_lit),
        ).when(
            F.lit(retrieve_datasets) & disp_is_dataset,
            result("dataset", F.lit("unspecified")),
        ).otherwise(null_result),
    ).otherwise(null_result)

    with_mime = F.when(mime_l.contains("system.io.fileinfo"), fileinfo).when(
        needs_plain & plain.isNull(), plain_failed
    ).when(
        F.lit(retrieve_documents) & plain.isin(doc_list), result("document", plain)
    ).when(
        F.lit(retrieve_datasets)
        & (
            plain.isin(P.KNOWN_DATASET_MIME_TYPES)
            | plain.rlike("^(?:" + P.DATASET_MIME_TYPE + ")$")
        ),
        result("dataset", plain),
    ).when(
        plain.rlike("^(?:" + P.POSSIBLE_DOC_OR_DATASET_MIME_TYPE + ")$"), possible
    ).otherwise(page_disp)

    return F.when(mime.isNotNull(), with_mime).otherwise(disp_only)


def is_html_mime(mime: Column) -> Column:
    """Page detection: text/html family (HttpConnUtils mimeType checks)."""
    return F.lower(mime).contains("html")
