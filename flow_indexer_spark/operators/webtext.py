"""Web-corpus text operators: Gopher quality rules, Luhn-validated PII
scan, URL canonicalization + dedup, and HTML -> text extraction.

The reference indexes entities out of machine logs
(/root/reference/flowindexer/flowindexer.go); a web-scale training-data
pipeline runs the same shape of per-document scan over CRAWLED text,
where the standard operators are published filter rule-sets rather than
IP grammars. This module implements four of them, each as pure in-row
column expressions (JVM whole-stage codegen, zero shuffle, zero Python)
so they scale exactly like the extract stage:

- **Gopher quality rules** (Rae et al. 2021, "Scaling Language Models:
  Methods, Analysis & Insights from Training Gopher", App. A1.1): word
  count in [min,max], mean word length in [3,10], symbol-to-word ratio
  (``#`` / ellipsis) <= 0.1, >= 80% words containing an alphabetic
  character, bullet-started lines <= 90%, ellipsis-ended lines <= 30%,
  and >= 2 distinct required stop words present.
- **PII scan with checksum validation**: credit-card-shaped digit runs
  are only PII when they pass the Luhn check (ISO/IEC 7812) — the
  classic precision fix over a bare regex. SSN / NANP-phone shapes are
  counted alongside. Redaction of the *entity* classes lives in
  :mod:`redact`; this is the detector/auditor.
- **URL canonicalization**: lowercase scheme+host, strip ``www.`` and
  default ports, drop fragments and tracking params (``utm_*``,
  ``gclid``, ``fbclid``), sort the surviving query params, normalize
  trailing slashes — then exact-dedup by canonical form (the standard
  first pass of a crawl dedup, before any near-dup family in
  :mod:`dedup`).
- **HTML -> text**: drop ``<script>``/``<style>`` subtrees, strip tags,
  decode the common character entities (``&amp;`` LAST so encoded
  markup cannot re-enter), collapse whitespace; plus ``<title>``
  extraction.

Everything is written in the RE2-compatible regex subset (no
backrefs / lookaround) so the DuckDB oracle twins run the exact same
expressions; all counts are BIGINT and all flags are INT 0/1 on both
engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ---------------------------------------------------------------------------
# Gopher quality rules
# ---------------------------------------------------------------------------

#: >= REQUIRED_MIN of these must appear (lowercased, as whole words) —
#: Gopher's "contains at least 2 of the following English words" rule.
REQUIRED_WORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
REQUIRED_MIN = 2


def _words(c: Column) -> Column:
    """Whitespace tokens; empty/blank text -> empty array (split would
    otherwise yield [''] and distort every per-word ratio)."""
    return F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(c), r"\s+")
    )


def gopher_flags(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Per-doc Gopher rule table: the raw features each rule reads, one
    INT 0/1 flag per rule, and the conjunction ``keep``. One projection."""
    c = F.col(text_col)
    w = _words(c)
    n_words = F.size(w).cast("bigint")
    total_len = F.aggregate(
        w, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
    )
    mean_wl = total_len.cast("double") / F.greatest(n_words, F.lit(1))
    # symbols: '#' occurrences + non-overlapping '...' runs + unicode ellipsis
    n_hash = F.length(c) - F.length(F.regexp_replace(c, r"#", ""))
    n_ell = F.size(F.regexp_extract_all(c, F.lit(r"\.\.\."), 0)) + (
        F.length(c) - F.length(F.regexp_replace(c, "…", ""))
    )
    sym_ratio = (n_hash + n_ell).cast("double") / F.greatest(n_words, F.lit(1))
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[A-Za-z]"))).cast("bigint")
    alpha_frac = n_alpha.cast("double") / F.greatest(n_words, F.lit(1))
    lines = F.split(c, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_frac = (
        F.size(
            F.filter(lines, lambda x: F.ltrim(x).rlike(r"^[•\*-]"))
        ).cast("double")
        / n_lines
    )
    ellend_frac = (
        F.size(
            F.filter(lines, lambda x: F.rtrim(x).rlike(r"(\.\.\.|…)$"))
        ).cast("double")
        / n_lines
    )
    req = F.array(*[F.lit(s) for s in REQUIRED_WORDS])
    n_req = F.size(
        F.array_intersect(F.array_distinct(F.transform(w, F.lower)), req)
    ).cast("bigint")

    flags = {
        "f_word_count": (n_words >= min_words) & (n_words <= max_words),
        "f_mean_word_len": (mean_wl >= 3.0) & (mean_wl <= 10.0),
        "f_symbol_ratio": sym_ratio <= 0.1,
        "f_alpha_words": alpha_frac >= 0.8,
        "f_bullet_lines": bullet_frac <= 0.9,
        "f_ellipsis_lines": ellend_frac <= 0.3,
        "f_required_words": n_req >= REQUIRED_MIN,
    }
    keep = None
    for expr in flags.values():
        keep = expr if keep is None else (keep & expr)
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        n_req.alias("n_required_words"),
        *[v.cast("int").alias(k) for k, v in flags.items()],
        keep.cast("int").alias("keep"),
    )


# ---------------------------------------------------------------------------
# PII scan (Luhn-validated credit cards + SSN / phone shapes)
# ---------------------------------------------------------------------------

#: 13-19 digits with single optional space/dash separators between them.
CC_CANDIDATE_PAT = r"\b(?:[0-9][ -]?){12,18}[0-9]\b"
SSN_PAT = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
PHONE_PAT = r"\b[0-9]{3}[ .-][0-9]{3}[ .-][0-9]{4}\b"


def luhn_valid(digits: Column) -> Column:
    """ISO/IEC 7812 Luhn check over a pure-digit string column: from the
    right, double every second digit (subtracting 9 when >9); valid iff
    the sum is divisible by 10. Pure fold — no UDF."""
    rev = F.reverse(digits)
    return (
        F.aggregate(
            F.sequence(F.lit(1), F.length(rev)),
            F.lit(0).cast("bigint"),
            lambda acc, i: acc
            + F.when(
                i % 2 == 1, F.substr(rev, i, F.lit(1)).cast("int")
            ).otherwise(
                F.when(
                    F.substr(rev, i, F.lit(1)).cast("int") * 2 > 9,
                    F.substr(rev, i, F.lit(1)).cast("int") * 2 - 9,
                ).otherwise(F.substr(rev, i, F.lit(1)).cast("int") * 2)
            ),
        )
        % 10
        == 0
    )


def pii_scan(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc PII audit: candidate card-shaped runs, how many survive
    the Luhn check, SSN/phone shape counts, and an overall 0/1 flag.
    In-row: extract-all -> normalize separators -> fold. The false-
    positive suppression (candidates vs valid) is the point — a bare
    digit-run regex over 100 TB of web text flags every invoice number."""
    c = F.col(text_col)
    cands = F.transform(
        F.regexp_extract_all(c, F.lit(CC_CANDIDATE_PAT), 0),
        lambda x: F.regexp_replace(x, r"[ -]", ""),
    )
    cands = F.filter(
        cands, lambda x: (F.length(x) >= 13) & (F.length(x) <= 19)
    )
    valid = F.filter(cands, luhn_valid)
    return df.select(
        F.col(id_col),
        F.size(cands).cast("bigint").alias("n_cc_candidates"),
        F.size(valid).cast("bigint").alias("n_cc_valid"),
        F.size(F.regexp_extract_all(c, F.lit(SSN_PAT), 0))
        .cast("bigint")
        .alias("n_ssn"),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_PAT), 0))
        .cast("bigint")
        .alias("n_phone"),
        (
            (F.size(valid) > 0)
            | (F.size(F.regexp_extract_all(c, F.lit(SSN_PAT), 0)) > 0)
            | (F.size(F.regexp_extract_all(c, F.lit(PHONE_PAT), 0)) > 0)
        )
        .cast("int")
        .alias("has_pii"),
    )


# ---------------------------------------------------------------------------
# URL canonicalization + dedup
# ---------------------------------------------------------------------------

#: query params dropped during canonicalization (tracking noise).
TRACKING_PARAM_PAT = r"^(utm_[^=]*|gclid|fbclid)="


def canonical_url(url: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL: lowercase scheme and
    host, strip a leading ``www.``, strip the scheme's default port,
    drop the fragment, drop tracking params, sort surviving params,
    collapse trailing path slashes (empty path -> ``/``). Idempotent:
    canonical_url(canonical_url(u)) == canonical_url(u)."""
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(hostport, r":[0-9]*$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    default_port = F.when(scheme == "https", "443").otherwise(
        F.when(scheme == "http", "80").otherwise("")
    )
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", "/").otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(TRACKING_PARAM_PAT),
    )
    qpart = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")),
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, path, qpart)


def url_dedup(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Exact dedup by canonical URL: one row per canonical form with the
    duplicate count and the smallest id as the deterministic keeper.
    One map-side-combined shuffle on the canonical key."""
    return (
        df.select(F.col(id_col), canonical_url(url_col).alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_dup"),
            F.min(id_col).alias("keeper_id"),
        )
    )


# ---------------------------------------------------------------------------
# HTML -> text
# ---------------------------------------------------------------------------

#: entity decode order: structural entities first, ``&amp;`` LAST —
#: otherwise '&amp;lt;' would decode twice and re-introduce markup.
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def _decode_entities(c: Column) -> Column:
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def html_text(html: Column | str) -> Column:
    """Visible text of an HTML document: script/style subtrees removed
    (case-insensitive, dot-matches-newline), tags stripped to spaces,
    common entities decoded, whitespace collapsed, trimmed."""
    c = F.col(html) if isinstance(html, str) else html
    c = F.regexp_replace(c, r"(?is)<script\b[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style\b[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    c = _decode_entities(c)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def html_title(html: Column | str) -> Column:
    """Entity-decoded contents of the first ``<title>`` element."""
    c = F.col(html) if isinstance(html, str) else html
    return _decode_entities(
        F.trim(F.regexp_extract(c, r"(?is)<title[^>]*>(.*?)</title>", 1))
    )


def extract_html(
    df: DataFrame, id_col: str = "doc_id", html_col: str = "html"
) -> DataFrame:
    """Per-doc HTML extraction table: title, visible text, clean length."""
    body = html_text(html_col)
    return df.select(
        F.col(id_col),
        html_title(html_col).alias("title"),
        body.alias("clean_text"),
        F.length(body).cast("bigint").alias("n_chars_clean"),
    )
