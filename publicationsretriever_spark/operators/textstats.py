"""Text-analysis operators for training-data pipelines: language-ID
heuristic, quality scoring, token counting, document fingerprinting.
All native column expressions (JVM-side); every operator has an exact
DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny marker-word lists for the n-gram/stopword language heuristic.
#: (A real pipeline swaps in fastText/CLD3 via a Pandas UDF — the
#: operator shape, shuffle profile and oracle stay identical.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "de": ["der", "die", "und", "das", "ein"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "los", "que", "y", "una"],
}


def tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), "\\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (the byte-pair-ish regex variant below)."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: word chunks + digits + punctuation
    counted separately (a cheap regex proxy for BPE token counts)."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(r"[a-z]{1,4}|[0-9]+|[^\sa-z0-9]"), 0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(text)
    stop = F.filter(toks, lambda t: t.isin(LANG_MARKERS[lang]))
    return F.round(F.size(stop) / F.greatest(F.size(toks), F.lit(1)), 6)


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.round(n_punct / F.greatest(F.length(text), F.lit(1)), 6)


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: length band + low punct +
    has stopwords (the C4-style filter shape)."""
    length_ok = (F.length(text) >= 50) & (F.length(text) <= 20000)
    punct_ok = punct_ratio(text) < 0.2
    stop_ok = stopword_ratio(text) > 0.01
    return F.round(
        (length_ok.cast("int") + punct_ok.cast("int") + stop_ok.cast("int")) / 3.0, 6
    )


def lang_id(text: Column) -> Column:
    """Marker-word vote: language with most marker hits; 'und' when no
    marker matches. Deterministic tie-break by language code order."""
    toks = tokens(text)

    def _marker_filter(markers: list[str]):
        # NOTE: a two-arg lambda would be treated by F.filter as
        # (element, index) — bind the marker list via closure instead.
        return lambda t: t.isin(markers)

    scores = [
        (code, F.size(F.filter(toks, _marker_filter(markers))))
        for code, markers in sorted(LANG_MARKERS.items())
    ]
    best_code = F.lit("und")
    best_score = F.lit(0)
    for code, score in scores:
        better = score > best_score
        best_code = F.when(better, F.lit(code)).otherwise(best_code)
        best_score = F.when(better, score).otherwise(best_score)
    return best_code


def fingerprint(text: Column, n_prefix: int = 64) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized prefix —
    the cheap rolling-hash-style near-exact key."""
    norm = F.regexp_replace(F.lower(F.trim(text)), "\\s+", " ")
    return F.md5(F.substring(norm, 1, n_prefix))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    fracs: dict[str, float],
    default_frac: float = 0.0,
    seed: str = "sample-v1",
) -> DataFrame:
    """Deterministic per-stratum downsampling — the rebalancing step of
    a training-data pipeline (cap the over-represented language/source,
    keep the rare ones whole). A row survives iff its md5 bucket
    (first 8 hex chars of md5(seed || ':' || id) mod 10^6) falls below
    frac(stratum) * 10^6.

    Properties a plain ``df.sample``/``sampleBy`` lacks:

    - **reproducible across runs, engines and partitionings** — the
      decision is a pure function of (seed, id), not of RNG state or
      row order (Spark's sampleBy draws per-partition, so a
      repartition changes the sample); md5 keeps the exact DuckDB
      oracle, same trick as cluster_safe_split.
    - **stable under corpus growth**: re-running on a grown corpus
      keeps every previously-sampled id's fate, so downstream caches /
      dataset versions stay consistent.
    - **no shuffle**: a WHERE over a hash projection; Catalyst pushes
      it into the scan pipeline (the strata map is a literal when-chain
      — ``fracs`` is a small reviewed dict, never data-derived).

    Strata absent from ``fracs`` get ``default_frac`` (0.0 = drop —
    explicit allowlist semantics; pass 1.0 to pass-through unknowns).
    """
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(str(seed)),
                        F.lit(":"),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        % 1_000_000
    )
    def _micro(v: float) -> int:
        # half-AWAY rounding (floor(x+0.5)) — SQL ROUND semantics, not
        # Python's banker's round(), so a threshold spelled to 7
        # decimals can never disagree with a SQL oracle; plain floor
        # would break on IEEE artifacts (0.3*1e6 = 299999.99...)
        import math

        return int(math.floor(v * 1_000_000 + 0.5))

    thresh = F.lit(_micro(default_frac))
    for k, v in sorted(fracs.items()):
        thresh = F.when(
            F.col(stratum_col) == k, F.lit(_micro(v))
        ).otherwise(thresh)
    return df.filter(bucket < thresh)


#: PII patterns — deliberately restricted to the Java/RE2 shared
#: regex subset (no lookaround, no backrefs) so the Spark expression
#: and the DuckDB oracle compile the SAME automaton. Applied in a
#: fixed order (email -> ipv4 -> phone) on the progressively-redacted
#: text, so the later patterns can never re-match inside an earlier
#: replacement and the output is order-deterministic on every engine.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PII_PHONE = r"\+[0-9][0-9 ()-]{7,}[0-9]"


def pii_redact(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """PII scrubbing for training corpora: replace emails, IPv4
    addresses and international-format phone numbers with typed
    placeholder tokens (``<EMAIL>``/``<IP>``/``<PHONE>``) and report
    per-document match counts — the standard pre-training redaction
    pass (the reference stores contact-bearing pages verbatim; a
    dataset built FROM a crawl must not).

    Pure ``regexp_replace``/``regexp_count`` column expressions:
    whole-stage codegen, no shuffle, no Python — Catalyst pipelines
    the three passes into one projection over the scan, so at 100 TB
    this costs exactly one read of the text column. Counts are taken
    on the same intermediate each replace sees (emails on raw text,
    IPs on the email-redacted text, phones on the IP-redacted text),
    which makes count == number of substitutions, engine-portable.
    Phone matching requires the leading ``+`` on purpose: an
    unanchored digit-run pattern would swallow order ids and ISBNs —
    precision over recall, the production knob is the pattern list.
    """
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return df.select(
        F.col(id_col),
        t3.alias("redacted"),
        F.regexp_count(t0, F.lit(PII_EMAIL)).alias("n_emails"),
        F.regexp_count(t1, F.lit(PII_IPV4)).alias("n_ips"),
        F.regexp_count(t2, F.lit(PII_PHONE)).alias("n_phones"),
    )


def repetition_signals(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al.
    2021, 'Scaling Language Models: ... Gopher', table A1: fraction of
    duplicated n-grams / top-n-gram share — the rules that catch
    keyword-stuffed and boilerplate pages a perplexity filter misses):

    - ``dup_word_frac``   1 - distinct words / words,
    - ``dup_2gram_frac``  1 - distinct 2-grams / 2-grams,
    - ``top_word_frac``   occurrences of the most frequent word / words.

    The two fractions are pure array expressions (split /
    array_distinct / size — whole-stage codegen, no shuffle, no
    Python). ``top_word_frac`` needs a per-(doc, word) count: one
    explode + two keyed aggregations, both with map-side partial
    aggregation — the shuffle key is (doc, word) then doc, so the
    reduce stays balanced however hot a single word is globally (a
    word is only ever counted WITHIN a document).
    """
    # words projected into an attribute FIRST: an inline split(...)
    # referenced inside a per-position lambda is re-evaluated per
    # element (O(tokens²) chars/doc — this query went 25s -> ~2s at
    # sf0.1); the 2-grams are then one zip_with over two one-shot
    # shifted slices instead of a slice-per-index transform.
    words = F.col("_w")
    n = F.size(words)
    len2 = F.greatest(n - 1, F.lit(0))
    grams2 = F.zip_with(
        F.slice(words, 1, len2),
        F.slice(words, 2, len2),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    base = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_w")
    ).select(
        F.col(id_col),
        words.alias("_w"),
        F.round(
            1 - F.size(F.array_distinct(words)) / F.greatest(n, F.lit(1)),
            6,
        ).alias("dup_word_frac"),
        F.when(
            F.size(grams2) > 0,
            F.round(
                1 - F.size(F.array_distinct(grams2)) / F.size(grams2),
                6,
            ),
        )
        .otherwise(F.lit(0.0))  # <2 words: no 2-grams, no repetition
        .alias("dup_2gram_frac"),
    )
    top = (
        base.select(id_col, F.explode("_w").alias("_t"))
        .groupBy(id_col, "_t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(
            F.round(F.max("_c") / F.sum("_c"), 6).alias("top_word_frac")
        )
    )
    return base.drop("_w").join(top, id_col, "left").select(
        id_col,
        "dup_word_frac",
        "dup_2gram_frac",
        F.coalesce(F.col("top_word_frac"), F.lit(0.0)).alias(
            "top_word_frac"
        ),
    )


#: fixed gate order for text_quality_gates' reject_reason — first
#: failing gate wins (same contract as multimodal.IMAGE_GATE_ORDER
#: and the reference's declaration-ordered regex battery).
TEXT_GATE_ORDER = ("lang", "length", "punct", "stopword", "repeat")


def text_quality_gates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    allowed_langs: tuple[str, ...] = ("en",),
    min_chars: int = 50,
    max_chars: int = 20000,
    max_punct_ratio: float = 0.2,
    min_stopword_ratio: float = 0.01,
    max_dup_2gram: float = 0.3,
) -> DataFrame:
    """Composite C4/Gopher-style document gate — the text analogue of
    multimodal.image_quality_gates and the standard corpus-cleaning
    stage between crawl and training (Raffel et al. 2020 §2.2 line
    rules; Rae et al. 2021 table A1 repetition rules):

    - ``lang``      marker-vote language in the allowlist,
    - ``length``    char count in [min_chars, max_chars],
    - ``punct``     punctuation ratio below max_punct_ratio,
    - ``stopword``  stopword ratio above min_stopword_ratio (word
      salad and navigation pages carry almost none),
    - ``repeat``    duplicate-2-gram fraction at most max_dup_2gram
      (keyword stuffing / boilerplate loops).

    Pure column expressions over ONE projected token array (the
    attribute-first discipline — every signal reads ``_w``, never
    re-splits), no shuffle: Catalyst evaluates the whole battery
    inside the scan's codegen stage, so at 100 TB rejected documents
    cost one read and zero data movement. Returns the id, each
    ``gate_<name>`` boolean, ``keep``, and ``reject_reason`` (first
    failing gate in TEXT_GATE_ORDER, NULL when kept)."""
    def _marker_count0(markers: list[str]):
        return F.size(
            F.filter(
                F.col("_w"), (lambda ms: (lambda t: t.isin(ms)))(markers)
            )
        )

    # marker scores staged as columns: the when-chain vote otherwise
    # inlines each size(filter(...)) once per CASE branch (~15 copies
    # for 4 languages) — attributes keep the projection tree small
    base = df.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("_nc"),
        punct_ratio(F.col(text_col)).alias("_pr"),
        tokens(F.col(text_col)).alias("_w"),
    ).select(
        F.col(id_col),
        "_nc",
        "_pr",
        "_w",
        *[
            _marker_count0(markers).alias(f"_s_{code}")
            for code, markers in sorted(LANG_MARKERS.items())
        ],
    )
    w = F.col("_w")
    n = F.size(w)
    len2 = F.greatest(n - 1, F.lit(0))
    grams2 = F.zip_with(
        F.slice(w, 1, len2),
        F.slice(w, 2, len2),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    dup2 = F.when(
        F.size(grams2) > 0,
        F.round(1 - F.size(F.array_distinct(grams2)) / F.size(grams2), 6),
    ).otherwise(F.lit(0.0))

    best_code = F.lit("und")
    best_score = F.lit(0)
    for code in sorted(LANG_MARKERS):
        score = F.col(f"_s_{code}")
        better = score > best_score
        best_code = F.when(better, F.lit(code)).otherwise(best_code)
        best_score = F.when(better, score).otherwise(best_score)
    # stopword ratio against the ALLOWED languages' own marker lists
    # (C4 filters with the target language's stopwords) — max across
    # the allowlist so each doc is judged by its best-matching allowed
    # language; hardcoding _s_en rejected every non-English corpus the
    # lang gate had just admitted. Default ('en',) is unchanged.
    _allowed = [
        F.col(f"_s_{c}") for c in sorted(set(allowed_langs))
        if c in LANG_MARKERS
    ]
    stop_cnt = (
        F.greatest(*_allowed) if len(_allowed) > 1
        else (_allowed[0] if _allowed else F.lit(0))
    )
    stop_ratio = F.round(stop_cnt / F.greatest(n, F.lit(1)), 6)
    gates = {
        "lang": best_code.isin(*allowed_langs),
        "length": (F.col("_nc") >= min_chars)
        & (F.col("_nc") <= max_chars),
        "punct": F.col("_pr") < max_punct_ratio,
        "stopword": stop_ratio > min_stopword_ratio,
        "repeat": dup2 <= max_dup_2gram,
    }
    out = base
    for name in TEXT_GATE_ORDER:
        out = out.withColumn(f"gate_{name}", gates[name])
    keep = F.lit(True)
    for name in TEXT_GATE_ORDER:
        keep = keep & F.col(f"gate_{name}")
    reason = F.lit(None).cast("string")
    for name in reversed(TEXT_GATE_ORDER):
        reason = F.when(~F.col(f"gate_{name}"), F.lit(name)).otherwise(
            reason
        )
    return (
        out.withColumn("keep", keep)
        .withColumn("reject_reason", reason)
        .drop(
            "_nc", "_pr", "_w",
            *[f"_s_{code}" for code in LANG_MARKERS],
        )
    )


def corpus_stats(
    df: DataFrame,
    text_col: str,
    strata_cols: list[str],
    exact: bool = True,
) -> DataFrame:
    """Per-stratum corpus report — the dataset-card numbers a training
    run is sized from: document count, total/mean token counts and
    token-length p50/p90 per (lang, source, ...) stratum.

    ``exact=True`` (default, oracle-mirrored) uses Spark's exact
    ``percentile``, which buffers each group's values — fine for
    report-sized group counts, NOT for 10^10 docs. ``exact=False`` is
    the 100 TB path: ``percentile_approx`` (t-digest, bounded memory,
    mergeable partials — the aggregation stays map-side combinable);
    the report's consumers tolerate approximate quantiles, the oracle
    does not, hence the switch."""
    t = token_count(F.col(text_col))
    base = df.select(*strata_cols, t.alias("_t"))
    if exact:
        p50 = F.percentile("_t", 0.5)
        p90 = F.percentile("_t", 0.9)
    else:
        p50 = F.percentile_approx("_t", 0.5, 10000)
        p90 = F.percentile_approx("_t", 0.9, 10000)
    return base.groupBy(*strata_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_t").cast("long").alias("total_tokens"),
        F.round(F.avg("_t"), 6).alias("mean_tokens"),
        F.round(p50.cast("double"), 6).alias("p50_tokens"),
        F.round(p90.cast("double"), 6).alias("p90_tokens"),
    )


def lm_quality_score(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    hash_keys: bool = True,
) -> DataFrame:
    """Corpus-self-trained n-gram LM quality score (the CCNet/KenLM
    perplexity-filter shape, with the corpus itself as training data):
    per document, the mean log10 MLE probability of each n-gram given
    its (n-1)-gram context, counts taken over the WHOLE input —
    mean_log10_prob = avg over positions of
    log10(count(ngram) / count(context)). Repetitive/templated text
    scores near 0 (its n-grams are corpus-frequent given their
    context); unusual word sequences score strongly negative. Because
    every scored n-gram was counted from the same corpus, both counts
    are >= 1 and the MLE needs no smoothing. Returns
    (id, n_ngrams, mean_log10_prob) — n_ngrams = 0 and NULL score for
    docs shorter than ``n`` tokens. A true CCNet setup trains on a
    held-out clean corpus with a smoothed/backoff LM (KenLM); that is
    a swap of the counts source, the operator's shuffle shape below is
    unchanged.

    Scale shape: ONE explode to ~tokens rows per doc carrying
    (ngram_key, context_key); both global counts are WINDOW counts
    over that single exploded table (partitionBy ngram / context),
    not groupBy+join-back — the join form makes Catalyst specialize
    the count subtrees so the text scan + tokenize + explode run
    FOUR times (verified via .explain, same pathology documented at
    dup_span_stats), and at corpus scale the count tables exceed the
    broadcast threshold so the joins shuffle the exploded rows
    anyway. The window form: one text-column scan, two exchanges of
    the exploded rows (by ngram, then by context), one per-doc
    average; the only other scan is the id-only projection that
    re-attaches zero-ngram docs (parquet column pruning makes it
    read nothing but the id). Skew ceiling: a boilerplate n-gram
    shared by M positions puts M count-only rows in one window
    partition — the same documented ceiling as dup_span_stats. With
    ``hash_keys`` every shuffle key is an 8-byte xxhash64 instead of
    an n-token string; the contract query passes hash_keys=False
    because DuckDB lacks xxhash64 — pytest pins hash/text
    equivalence."""
    words = F.col("_w")
    n_pos = F.size(words) - F.lit(n) + 1
    gram = lambda p, k: F.concat_ws(  # noqa: E731
        " ", F.slice(words, p + 1, k)
    )
    key = (lambda c: F.xxhash64(c)) if hash_keys else (lambda c: c)
    pairs = F.when(
        n_pos > 0,
        F.transform(
            F.sequence(F.lit(0), n_pos.cast("int") - 1),
            lambda p: F.struct(
                key(gram(p, n)).alias("g"),
                key(gram(p, n - 1)).alias("c"),
            ),
        ),
    ).otherwise(
        F.array().cast(
            "array<struct<g:bigint,c:bigint>>"
            if hash_keys
            else "array<struct<g:string,c:string>>"
        )
    )
    base = df.select(F.col(id_col), tokens(F.col(text_col)).alias("_w"))
    ex = base.select(
        F.col(id_col), F.explode(pairs).alias("_p")
    ).select(
        F.col(id_col),
        F.col("_p.g").alias("_g"),
        F.col("_p.c").alias("_c"),
    )
    from pyspark.sql import Window

    # context count = occurrences as an n-gram PREFIX (not standalone
    # (n-1)-gram frequency): sums to the same corpus positions the
    # scored n-grams are drawn from, so probabilities per context sum
    # to 1 over the observed continuations.
    scored = (
        ex.withColumn(
            "_gn", F.count(F.lit(1)).over(Window.partitionBy("_g"))
        )
        .withColumn(
            "_cn", F.count(F.lit(1)).over(Window.partitionBy("_c"))
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.avg(F.log10(F.col("_gn") / F.col("_cn"))).alias("_m"),
        )
    )
    return (
        base.select(F.col(id_col))
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_ngrams"), F.lit(0)).alias("n_ngrams"),
            F.round(F.col("_m"), 6).alias("mean_log10_prob"),
        )
    )


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    text_col: str,
    target_fracs: dict[str, float],
    total_tokens: int | None = None,
    seed: str = "mix-v1",
) -> DataFrame:
    """Data mixing (the Pile/LLaMA-style mixture step): downsample each
    stratum so the sampled corpus' TOKEN mass approximates
    ``target_fracs`` shares of a total budget. Only downsampling — a
    stratum cannot be upsampled, so the achievable budget is capped by
    the scarcest target stratum: T = min(total_tokens,
    min_s avail_s / frac_s); each stratum then keeps rate_s =
    min(1, T * frac_s / avail_s) of its token mass. Strata not in
    ``target_fracs`` are dropped (allowlist semantics, like
    stratified_sample); a target stratum ABSENT from the corpus makes
    the strict budget 0 — mixing ratios are a contract, not a hint.

    Determinism: one bounded aggregation (one row per stratum —
    driver-side rates, same bounded-collect convention as the IVF
    centroid build) computes avail_s; rates become LITERAL integer
    bucket thresholds (floor(rate * 10^6), floor not round — Python
    banker's-rounds, SQL rounds half-away, floor agrees everywhere)
    over the same md5(seed || ':' || id) bucket as stratified_sample,
    so the row-level decision is a pure function of (seed, id):
    reproducible across runs, partitionings and engines, stable under
    corpus growth, exactly DuckDB-oracle-able. The sampling filter
    itself is a scan-pipelined WHERE — no shuffle beyond the one
    stats aggregation."""
    toks = F.size(F.split(F.lower(F.trim(F.col(text_col))), "\\s+"))
    avail = {
        r["s"]: r["t"]
        for r in df.groupBy(F.col(stratum_col).alias("s"))
        .agg(F.sum(toks).alias("t"))
        .collect()
    }
    budget_caps = [
        (avail.get(s) or 0) / f  # `or 0`: a present key can map
        # to None when every row's text is NULL (SUM over NULLs)
        for s, f in target_fracs.items() if f > 0
    ]
    t_max = min(budget_caps) if budget_caps else 0.0
    if total_tokens is not None:
        t_max = min(t_max, float(total_tokens))
    thresh = F.lit(0)
    for s, f in sorted(target_fracs.items()):
        rate = min(1.0, t_max * f / avail[s]) if avail.get(s) else 0.0
        thresh = F.when(
            F.col(stratum_col) == s, F.lit(int(rate * 1_000_000))
        ).otherwise(thresh)
    bucket = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(str(seed)),
                        F.lit(":"),
                        F.col(id_col).cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        % 1_000_000
    )
    return df.filter(bucket < thresh)
