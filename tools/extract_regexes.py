"""Extract regex pattern STRINGS (specification data, not code) from the
reference Java source into a generated Python module.

The reference (`LSmyrnaios/PublicationsRetriever`, read-only at
/root/reference) defines WHAT the filter battery computes; the regex
constants are that specification. Spark's `rlike`/`regexp_replace` run
Java regex, so the extracted strings are used verbatim JVM-side.

Usage: python tools/extract_regexes.py   (re-generates
publicationsretriever_spark/functions/_reference_patterns.py)
"""

from __future__ import annotations

import re
from pathlib import Path

REF = Path("/root/reference/src/main/java/eu/openaire/publications_retriever")
OUT = Path(__file__).resolve().parent.parent / (
    "publicationsretriever_spark/functions/_reference_patterns.py"
)


def _java_unescape(lit: str) -> str:
    out = []
    i = 0
    while i < len(lit):
        c = lit[i]
        if c == "\\" and i + 1 < len(lit):
            n = lit[i + 1]
            if n == "\\":
                out.append("\\")
            elif n == '"':
                out.append('"')
            elif n == "n":
                out.append("\n")
            elif n == "t":
                out.append("\t")
            else:  # keep unknown escapes verbatim (shouldn't occur)
                out.append(c + n)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _strip_comments(expr: str) -> str:
    # remove // comments (not inside string literals) and /* */ blocks
    out, i, in_str = [], 0, False
    while i < len(expr):
        c = expr[i]
        if in_str:
            out.append(c)
            if c == "\\":
                out.append(expr[i + 1])
                i += 1
            elif c == '"':
                in_str = False
        elif c == '"':
            in_str = True
            out.append(c)
        elif expr.startswith("//", i):
            j = expr.find("\n", i)
            i = len(expr) if j < 0 else j
            continue
        elif expr.startswith("/*", i):
            j = expr.find("*/", i)
            i = (len(expr) if j < 0 else j + 2)
            continue
        else:
            out.append(c)
        i += 1
    return "".join(out)


def eval_concat(expr: str, env: dict[str, str]) -> str:
    """Evaluate a Java `"lit" + VAR + "lit"` concatenation (no ternaries)."""
    expr = _strip_comments(expr)
    parts, buf, in_str, depth_ok = [], [], False, True
    i = 0
    cur = []
    while i < len(expr):
        c = expr[i]
        if in_str:
            if c == "\\":
                cur.append(c + expr[i + 1])
                i += 2
                continue
            if c == '"':
                in_str = False
                parts.append(("lit", "".join(cur)))
                cur = []
            else:
                cur.append(c)
        elif c == '"':
            in_str = True
        elif c == "+" or c in " \n\t\r":
            if cur:
                parts.append(("var", "".join(cur)))
                cur = []
        else:
            cur.append(c)
        i += 1
    if cur:
        parts.append(("var", "".join(cur)))
    out = []
    for kind, val in parts:
        if kind == "lit":
            out.append(_java_unescape(val))
        else:
            name = val.split(".")[-1]
            if name not in env:
                raise KeyError(f"unknown variable {val!r} in concat: {expr[:120]}")
            out.append(env[name])
    return "".join(out)


def find_assignment(src: str, name: str) -> str:
    """Return the RHS expression of `<name> = Pattern.compile(<EXPR>);` or
    `String <name> = <EXPR>;`."""
    m = re.search(
        rf"\b{re.escape(name)}\s*=\s*Pattern\.compile\(", src
    )
    if m:
        start = m.end()
        depth = 1
        i = start
        in_str = False
        while depth:
            c = src[i]
            if in_str:
                if c == "\\":
                    i += 1
                elif c == '"':
                    in_str = False
            elif c == '"':
                in_str = True
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            i += 1
        expr = src[start : i - 1]
        # drop trailing ", Pattern.CASE_INSENSITIVE" style flags
        expr = re.sub(r",\s*Pattern\.[A-Z_]+\s*$", "", expr.strip())
        return expr
    m = re.search(rf"String\s+{re.escape(name)}\s*=\s*", src)
    if not m:
        raise KeyError(name)
    start = m.end()
    i, in_str = start, False
    while True:
        c = src[i]
        if in_str:
            if c == "\\":
                i += 1
            elif c == '"':
                in_str = False
        elif c == '"':
            in_str = True
        elif c == ";":
            break
        i += 1
    return src[start:i]


def main() -> None:
    url_utils = (REF / "util/url/UrlUtils.java").read_text()
    loader = (REF / "util/url/LoaderAndChecker.java").read_text()
    checker = (REF / "util/url/UrlTypeChecker.java").read_text()
    crawler = (REF / "crawler/PageCrawler.java").read_text()
    conn = (REF / "util/http/ConnSupportUtils.java").read_text()
    meta = (REF / "crawler/MetadataHandler.java").read_text()

    env: dict[str, str] = {}

    def grab(src: str, name: str, cite: str, env_key: str | None = None) -> tuple[str, str, str]:
        expr = find_assignment(src, name)
        val = eval_concat(expr, env)
        env[env_key or name] = val
        return name, val, cite

    results = []
    # --- building-block fragments (order matters for env resolution) ---
    results.append(grab(checker, "htOrPhpExtensionsPattern", "util/url/UrlTypeChecker.java:22"))
    results.append(grab(checker, "mediaExtensionsPattern", "util/url/UrlTypeChecker.java:23"))
    results.append(grab(loader, "docAndDownloadKeywords", "util/url/LoaderAndChecker.java:36"))
    results.append(grab(checker, "docOrDatasetKeywords", "util/url/UrlTypeChecker.java:25"))
    results.append(grab(checker, "wordsPattern", "util/url/UrlTypeChecker.java:26"))
    results.append(grab(checker, "docOrDatasetNegativeLookAroundPattern", "util/url/UrlTypeChecker.java:27"))
    results.append(grab(loader, "dataset_formats", "util/url/LoaderAndChecker.java:41-43"))
    results.append(grab(checker, "unsupportedDocFileTypes", "util/url/UrlTypeChecker.java:32"))
    results.append(grab(crawler, "spaceOrDashes", "crawler/PageCrawler.java:63"))

    # --- full static patterns ---
    results.append(grab(url_utils, "URL_TRIPLE", "util/url/UrlUtils.java:29"))
    results.append(grab(url_utils, "TEMPORAL_IDENTIFIER_FILTER", "util/url/UrlUtils.java:34"))
    results.append(grab(url_utils, "ANCHOR_FILTER", "util/url/UrlUtils.java:36"))
    results.append(grab(url_utils, "TOP_THREE_LEVEL_DOMAIN_FILTER", "util/url/UrlUtils.java:236"))
    results.append(grab(loader, "DOC_URL_FILTER", "util/url/LoaderAndChecker.java:37"))
    results.append(grab(loader, "DATASET_URL_FILTER", "util/url/LoaderAndChecker.java:44"))
    results.append(grab(checker, "CURRENTLY_UNSUPPORTED_DOC_EXTENSION_FILTER", "util/url/UrlTypeChecker.java:33"))
    results.append(grab(checker, "URL_FILE_EXTENSION_FILTER", "util/url/UrlTypeChecker.java:35"))
    results.append(grab(checker, "INTERNAL_LINKS_KEYWORDS_FILTER", "util/url/UrlTypeChecker.java:39"))
    results.append(grab(checker, "PLAIN_PAGE_EXTENSION_FILTER", "util/url/UrlTypeChecker.java:43"))
    results.append(grab(checker, "PLAIN_DOMAIN_FILTER", "util/url/UrlTypeChecker.java:49"))
    results.append(grab(crawler, "INTERNAL_LINKS_STARTING_FROM_FILTER", "crawler/PageCrawler.java:43"))
    results.append(grab(crawler, "JAVASCRIPT_DOC_LINK", "crawler/PageCrawler.java:45"))
    results.append(grab(crawler, "DOCUMENT_TEXT", "crawler/PageCrawler.java:65"))
    results.append(grab(crawler, "NON_VALID_DOCUMENT", "crawler/PageCrawler.java:68-80"))
    results.append(grab(loader, "INVALID_URL_HTTP_STATUS", "util/url/LoaderAndChecker.java:701"))
    results.append(grab(loader, "COULD_RETRY_URLS", "util/url/LoaderAndChecker.java:721"))
    results.append(grab(meta, "LOCALHOST_DOMAIN_REPLACEMENT_PATTERN", "crawler/MetadataHandler.java:59"))
    results.append(grab(conn, "MIME_TYPE_FILTER", "util/http/ConnSupportUtils.java:57"))
    results.append(grab(conn, "POSSIBLE_DOC_OR_DATASET_MIME_TYPE", "util/http/ConnSupportUtils.java:59"))
    results.append(grab(conn, "DATASET_MIME_TYPE", "util/http/ConnSupportUtils.java:63"))
    results.append(grab(conn, "HTML_STRING_INDICATOR", "util/http/ConnSupportUtils.java:65"))

    # dataset mime-type list (config data, src/main/resources/dataset-mimetypes.txt,
    # loader at ConnSupportUtils.java:208-244: strip `// comment` suffixes)
    mimes = []
    resources = Path("/root/reference/src/main/resources")
    for line in (resources / "dataset-mimetypes.txt").read_text().splitlines():
        m = re.match(r"([^/]+/[^/]+?)(?:[\s]*//.*)?$", line)
        if m and m.group(1).strip():
            mimes.append(m.group(1).strip())

    lines = [
        '"""GENERATED by tools/extract_regexes.py — do not edit by hand.',
        "",
        "Regex pattern strings extracted verbatim from the reference",
        "(LSmyrnaios/PublicationsRetriever, /root/reference). These are the",
        "SPECIFICATION of the filter/URL algebra (Java regex dialect — used",
        "via Spark rlike/regexp_* which run java.util.regex).",
        '"""',
        "",
        "# fmt: off",
    ]
    for name, val, cite in results:
        lines.append(f"# {cite}")
        lines.append(f"{name} = {val!r}")
        lines.append("")
    lines.append("# src/main/resources/dataset-mimetypes.txt (92 entries),")
    lines.append("# loaded by ConnSupportUtils.setKnownDatasetMimeTypes() :208-244")
    lines.append(f"KNOWN_DATASET_MIME_TYPES = {mimes!r}")
    lines.append("")
    lines.append("# fmt: on")
    OUT.write_text("\n".join(lines))
    print(f"wrote {OUT} ({len(results)} patterns)")


if __name__ == "__main__":
    main()
