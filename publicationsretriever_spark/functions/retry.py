"""Retry / validity classification (SURVEY.md §2.6, N7).

Ports ``LoaderAndChecker.getWasValidAndCouldRetry()``
(util/url/LoaderAndChecker.java:724-767) and the regexes built at
:701-721 into a when-ladder over an ``error_class`` column.

``error_class`` values produced by the fetch stage (our data-ified
version of the reference's exception types):
  - ``http_<code>``   (RuntimeException "HTTP <code> ... Error")
  - ``conn_timeout``  (ConnTimeoutException)
  - ``unsupported_head`` (DomainWithUnsupportedHEADmethodException)
  - ``domain_blocked``  (DomainBlockedException)
  - anything else / NULL -> unspecified error
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: HTTP codes the reference deems invalid-url (INVALID_URL_HTTP_STATUS,
#: LoaderAndChecker.java:701): 400, 404, 410, 414, 422.
INVALID_CODES = [400, 404, 410, 414, 422]

#: client codes that could be retried (setCouldRetryRegex :704-718):
#: 403, 408, 425, 426, 429.
RETRY_CLIENT_CODES = [403, 408, 425, 426, 429]


def was_valid_and_could_retry(
    error_class: Column, url: Column, should_block_most_5xx: bool = True
) -> Column:
    """struct(wasUrlValid, couldRetry, error_msg) — string tristate values
    mirroring the reference output record (DataForOutput.java:20-27).

    ``should_block_most_5xx=True`` (reference default,
    ConnSupportUtils.java:87): only 503 is retryable among 5XX; otherwise
    every 5XX except 511.
    """
    code = F.regexp_extract(error_class, "^http_(\\d{3})$", 1).try_cast("int")
    is_http = code.isNotNull()

    if should_block_most_5xx:
        retry_5xx = code == 503
    else:
        retry_5xx = (code >= 500) & (code <= 599) & (code != 511)

    invalid = is_http & code.isin(INVALID_CODES)
    retry_http = is_http & (code.isin(RETRY_CLIENT_CODES) | retry_5xx)

    # COULD_RETRY_URLS (LoaderAndChecker.java:721): sciencedirect/elsevier
    # urls stay retryable for future special handling.
    retry_url = F.lower(url).rlike(
        "^https?://[^/]*(?:sciencedirect|elsevier).com[^/]*/.*$"
    )

    was_valid = F.when(invalid, "false").otherwise("true")
    could_retry = (
        F.when(invalid, "false")
        .when(retry_http, "true")
        .when(error_class.isin("conn_timeout", "unsupported_head", "domain_blocked"), "true")
        .otherwise("false")
    )
    # url-based retry only applies when the url was valid (ref :762-763)
    could_retry = F.when((was_valid == "true") & retry_url, "true").otherwise(could_retry)

    error_msg = (
        F.when(invalid, "the url is invalid and lead to http-client-error.")
        .when(retry_http, "the url had a non-fatal http-error.")
        .when(error_class == "conn_timeout", "the url had a connection-timeout.")
        .when(
            error_class == "unsupported_head",
            "the url does not support HEAD method for checking most of the internal links.",
        )
        .when(
            error_class == "domain_blocked",
            "the url had its initial or redirected domain blocked.",
        )
        .otherwise("there is a serious unspecified error.")
    )
    return F.struct(
        was_valid.alias("wasUrlValid"),
        could_retry.alias("couldRetry"),
        error_msg.alias("error_msg"),
    )
