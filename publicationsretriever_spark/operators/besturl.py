"""J4: best-url-per-id selection as a window operator.

The reference iterates each id's url-group sequentially and keeps the
best candidate (LoaderAndChecker.loadAndCheckIdUrlPairs,
util/url/LoaderAndChecker.java:188-257):

  possible doc/dataset url (F1|F2)  >  '/handle/' url  >  non-doi url
  >  neutral url

with iteration-order tie-breaks: FIRST possible-doc wins (break on
match), LAST '/handle/' wins (overwrite), FIRST non-doi wins (guarded
by bestNonDocNonDatasetUrl==null... the nonDoiUrl slot is only written
while no handle-url has been seen and is never overwritten afterwards
by the same rank), LAST neutral wins (overwrite).

Spark-first: a single ``row_number()`` over
``Window.partitionBy("id").orderBy(priority, order_in_id)`` — no
driver-side loop, scales to any group count. Input order inside an id
group is preserved via an explicit ``order_in_id`` column (the caller
provides it from the seed file's line numbers), making the pick
deterministic — the reference's pick depends on set-iteration order,
which for its LinkedHashMultimap is insertion order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import filters as FL


def priority_expr(
    lower_url: Column,
    url: Column,
    retrieve_documents: bool = True,
    retrieve_datasets: bool = True,
) -> Column:
    """The reference's candidate ladder as one integer priority
    (0 best). Mirrors LoaderAndChecker.java:219-235."""
    is_possible = F.lit(False)
    if retrieve_documents:
        is_possible = is_possible | FL.is_possible_doc_url(lower_url)
    if retrieve_datasets:
        is_possible = is_possible | FL.is_possible_dataset_url(lower_url)
    return (
        F.when(is_possible, 0)
        .when(url.contains("/handle/"), 1)
        .when(~url.contains("doi.org"), 2)
        .otherwise(3)
    )


def pick_best_url_per_id(
    df: DataFrame,
    id_col: str = "id",
    url_col: str = "url",
    order_col: str = "order_in_id",
    retrieve_documents: bool = True,
    retrieve_datasets: bool = True,
) -> DataFrame:
    """Adds ``priority`` and ``is_best`` columns; rows with
    ``is_best=false`` are the "Skipped at loading and will be checked
    later" urls (logged at LoaderAndChecker.java:685-698).

    Tie-breaks within a rank reproduce the reference's slot semantics:
    rank 0 -> first match wins (loop breaks on match,
    LoaderAndChecker.java:219-224); ranks 1-3 -> last wins (slots are
    plain overwrites; the nonDoiUrl slot only matters when no handle-url
    exists, in which case it too is overwritten on every match).
    """
    prio = priority_expr(
        F.lower(F.col(url_col)), F.col(url_col), retrieve_documents, retrieve_datasets
    )
    w = Window.partitionBy(id_col).orderBy(
        *ladder_order(prio, F.col(order_col))
    )
    return df.withColumn("priority", prio).withColumn(
        "is_best", F.row_number().over(w) == 1
    )


def ladder_order(prio: Column, order_in_id: Column) -> list[Column]:
    """The candidate-ladder total order as sort expressions —
    (priority asc, tie asc) with the reference's slot tie-breaks:
    rank 0 first-wins (ascending input order), ranks 1-3 last-wins
    (descending). THE single definition: pick_best_url_per_id uses it
    for the winner and the engine's fallback-pool ranking
    (plans/rounds.py round 0) reuses it for wave order, so a
    tie-break fix propagates to both."""
    tie = F.when(prio == 0, order_in_id).otherwise(-order_in_id)
    return [prio.asc(), tie.asc()]
