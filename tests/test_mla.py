"""Tests for the J6/J7 MLA model operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from publicationsretriever_spark.operators.mla import (
    learn_path_model,
    learn_structure_model,
    predict_by_structure,
    predict_doc_urls,
)


def test_path_mla_learn_and_predict(spark):
    results = spark.createDataFrame(
        [
            ("a", "https://h.org/article/1", "https://h.org/files/1.pdf"),
            ("b", "https://h.org/article/2", "https://h.org/files/2.pdf"),
            ("c", "https://h.org/article/3", "duplicate"),
        ],
        "id string, pageUrl string, docOrDatasetUrl string",
    )
    model = learn_path_model(results)
    rows = model.collect()
    assert len(rows) == 1
    assert rows[0]["page_path"] == "https://h.org/article/"
    assert rows[0]["doc_path"] == "https://h.org/files/"

    pages = spark.createDataFrame(
        [
            ("https://h.org/article/7",
             ["https://h.org/files/7.pdf", "https://h.org/about"]),
            ("https://h.org/article/8", ["https://h.org/other"]),  # no membership
            ("https://x.org/article/9", ["https://x.org/files/9.pdf"]),  # unknown path
        ],
        "page_url string, links array<string>",
    )
    # docId of /article/7 is '7'; predicted = doc_path + '7' => need ext-free match
    preds = predict_doc_urls(
        pages.withColumn(
            "links", F.transform("links", lambda l: F.regexp_replace(l, "\\.pdf$", ""))
        ),
        model,
    ).collect()
    assert [(r["page_url"], r["predicted_doc_url"]) for r in preds] == [
        ("https://h.org/article/7", "https://h.org/files/7")
    ]


def test_structure_mla(spark):
    verified = spark.createDataFrame(
        [("https://h.org/article/1", "https://h.org/files/1.pdf", "a_btn\ndiv_dl\n")],
        "page_url string, link string, structure string",
    )
    model = learn_structure_model(verified)
    extracted = spark.createDataFrame(
        [
            ("https://h.org/article/2", "https://h.org/files/2.pdf", "a_btn\ndiv_dl\n"),
            ("https://h.org/article/2", "https://h.org/about", "a\nfooter\n"),
            ("https://x.org/article/2", "https://x.org/f.pdf", "a_btn\ndiv_dl\n"),
        ],
        "page_url string, link string, structure string",
    )
    hits = predict_by_structure(extracted, model).collect()
    assert [(r["page_url"], r["link"]) for r in hits] == [
        ("https://h.org/article/2", "https://h.org/files/2.pdf")
    ]
