"""Text-analysis column functions for LLM-data-pipeline use
(SURVEY.md §2b north-star ops; absent from the reference).

All built-in-function compositions (split/regexp/transform/aggregate)
— JVM-side, no Python in the hot path, so they stream through
whole-stage codegen over billions of documents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# A BPE-ish word/punct tokenizer: words-with-apostrophes, numbers, or
# single non-space punctuation — close to GPT-2's pre-tokenizer split.
TOKEN_REGEX = r"[A-Za-z]+(?:'[A-Za-z]+)?|[0-9]+|[^\sA-Za-z0-9]"

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Deterministic and SQL-expressible.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "les", "des", "est"),
    "zh": ("de5", "shi4", "le5", "zai4", "you3"),  # pinyin-romanized markers
}

STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "at", "by", "be", "this",
)


def tokens(col: Column | str, pattern: str = TOKEN_REGEX) -> Column:
    """Array of tokens via regexp extraction (BPE-ish pre-tokenize)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(pattern), 0)


def token_count(col: Column | str, *, whitespace: bool = False) -> Column:
    """Token count: whitespace mode (``size(split(text,'\\s+'))``) or
    regex-tokenizer mode."""
    c = F.col(col) if isinstance(col, str) else col
    if whitespace:
        # split("", pat) yields [""] — an empty/blank string has 0 tokens
        return F.when(F.trim(c) == "", F.lit(0)).otherwise(
            F.size(F.split(F.trim(c), r"\s+"))
        )
    return F.size(tokens(c))


def punct_ratio(col: Column | str) -> Column:
    """punctuation chars / total chars (0.0 for empty strings)."""
    c = F.col(col) if isinstance(col, str) else col
    punct = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.when(F.length(c) > 0, punct / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Fraction of whitespace tokens that are stopwords."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_sw = F.size(F.array_intersect(toks, sw))  # distinct-presence variant
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    _ = n_sw  # distinct variant kept for reference; ratio uses full hits
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: length band + low punct +
    healthy stopword ratio. Deterministic, built-ins only."""
    c = F.col(col) if isinstance(col, str) else col
    length_ok = F.when((F.length(c) >= 50) & (F.length(c) <= 20000), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio(c) < 0.2, 1.0).otherwise(0.0)
    sw = stopword_ratio(c)
    sw_ok = F.when((sw > 0.05) & (sw < 0.6), 1.0).otherwise(0.0)
    return (length_ok + punct_ok + sw_ok) / F.lit(3.0)


def lang_id(col: Column | str, markers: dict[str, tuple[str, ...]] | None = None) -> Column:
    """Marker-word language ID: score = count of language marker words
    among whitespace tokens; argmax language, 'und' if all zero.
    Ties break by language code order (deterministic).
    """
    c = F.col(col) if isinstance(col, str) else col
    markers = markers or LANG_MARKERS
    toks = F.split(F.lower(F.trim(c)), r"\s+")
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(markers):
        marker_arr = F.array(*[F.lit(m) for m in markers[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


# PII detection/redaction patterns (north-star training-data op; no
# reference analog — its only regex is the paren-strip at `Spatially
# ETL test.py:156-157`). Same regex flavor accepted by Java regex
# (Spark) and RE2 (DuckDB oracle): char classes, \b, bounded repeats.
# Redaction order matters: emails first (their local parts may contain
# digit runs), then phones, then IPs; replacement tokens are
# letter-only so later patterns can't match inside them.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "phone": (r"\b\d{3}[-.]\d{4}\b", "<PHONE>"),
    "ip": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
}


def pii_count(col: Column | str, kind: str) -> Column:
    """Occurrences of one PII pattern (``email``/``phone``/``ip``) —
    JVM-side ``regexp_count``, codegen'd, no UDF."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PII_PATTERNS[kind][0]))


def redact_pii(col: Column | str, kinds: tuple[str, ...] = ("email", "phone", "ip")) -> Column:
    """Replace every PII match with its typed token, in the fixed
    email→phone→ip order (see ``PII_PATTERNS`` ordering note)."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in kinds:
        pattern, token = PII_PATTERNS[kind]
        c = F.regexp_replace(c, pattern, token)
    return c


def ngrams(col: Column | str, n: int = 3, *, character: bool = True) -> Column:
    """Array of n-grams (character shingles by default) — the input to
    MinHash/Jaccard dedup. Character mode slides over the lowercased
    string; token mode slides over whitespace tokens.

    The normalized input (lowered string / token array) is BOUND as a
    lambda variable via a one-element-array ``transform`` before the
    sliding window runs: a bare outer expression inside a
    higher-order-function lambda is re-evaluated PER ELEMENT (Catalyst
    has no common-subexpression elimination inside lambda bodies, and
    CollapseProject inlines any pre-projected alias right back), which
    made gram extraction O(len²) per document — measured 3.9 s → 1.8 s
    for trigram-hashing 5 000 docs at sf0.1. Values are unchanged;
    only the evaluation count is.
    """
    c = F.col(col) if isinstance(col, str) else col
    empty = F.array().cast("array<string>")
    if character:

        def char_grams(s: Column) -> Column:
            idx = F.sequence(F.lit(1), F.length(s) - (n - 1))
            return F.when(
                F.length(s) >= n, F.transform(idx, lambda i: F.substring(s, i, n))
            ).otherwise(empty)

        return F.get(F.transform(F.array(F.lower(c)), char_grams), 0)

    def token_grams(toks: Column) -> Column:
        idx = F.sequence(F.lit(0), F.size(toks) - n)
        return F.when(
            F.size(toks) >= n,
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))),
        ).otherwise(empty)

    return F.get(
        F.transform(F.array(F.split(F.lower(F.trim(c)), r"\s+")), token_grams), 0
    )


# F.ascii returns the full Unicode CODEPOINT (up to U+10FFFF), not a
# byte — the overflow bound must use the codepoint max or a modulus
# near the cap can still overflow int64 on non-ASCII input.
_MAX_CODEPOINT = 0x10FFFF


def rolling_fingerprint(col: Column | str, *, modulus: int = (1 << 31) - 1, base: int = 257) -> Column:
    """Deterministic polynomial rolling hash of a string (document
    fingerprint). h = sum(cp_i * base^(n-i)) mod m over Unicode
    codepoints via F.aggregate — codegen'd, no UDF.

    A single 2^31-1 residue is ~31 bits: 50% birthday collision at
    ~65k documents — TRIAGE ONLY (candidate generation). Anything that
    treats fingerprint equality as duplicate *identity* should use
    :func:`rolling_fingerprint_dual` (~62 bits) or verify content.

    ``modulus`` must satisfy ``(modulus-1) * base + 0x10FFFF <=
    2^63 - 1`` — the accumulator reaches that product before each pmod
    (``F.ascii`` yields full codepoints, max U+10FFFF), and Spark's
    signed-64 arithmetic raises under ANSI mode (or silently wraps with
    ANSI off) past it. The Mersenne prime 2^31-1 default keeps the
    product comfortably inside int64.
    """
    if modulus <= 1:
        raise ValueError("modulus must be > 1")
    max_modulus = ((1 << 63) - 1 - _MAX_CODEPOINT) // base + 1
    if modulus > max_modulus:
        raise ValueError(
            f"modulus {modulus} overflows int64: need (modulus-1) * base "
            f"+ 0x10FFFF <= 2^63 - 1, i.e. modulus <= {max_modulus}"
        )
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: F.pmod(acc * F.lit(base) + x, F.lit(modulus)),
    )


def rolling_fingerprint_dual(
    col: Column | str,
    *,
    moduli: tuple[int, int] = ((1 << 31) - 1, (1 << 31) - 19),
    base: int = 257,
) -> Column:
    """~62-bit fingerprint: two independent 31-bit residues (distinct
    prime moduli, same base) packed into one int64 as
    ``r0 * 2^31 + r1``. Every intermediate stays int64-safe (each
    residue obeys the :func:`rolling_fingerprint` bound; the pack is
    < 2^62). Collision odds drop from ~n^2/2^32 to ~n^2/2^63 — safe to
    treat equality as near-certain duplicate identity at corpus scale.
    """
    r0 = rolling_fingerprint(col, modulus=moduli[0], base=base)
    r1 = rolling_fingerprint(col, modulus=moduli[1], base=base)
    return (r0 * F.lit(1 << 31) + r1).alias("fingerprint128")


#: query params that never affect content identity — the standard
#: tracking families stripped by every major crawler/dedup pipeline
_TRACKING_PARAM_RE = (
    "^(utm_[a-z]+|gclid|fbclid|msclkid|mc_cid|mc_eid|igshid|ref|ref_src)="
)


def canonicalize_url(col: Column | str) -> Column:
    """Canonical URL form for URL-keyed dedup — the key every
    crawl-scale corpus pipeline groups on BEFORE content dedup (same
    page fetched via tracking links / mixed-case hosts / default
    ports must collapse to one key). Pure codegen string/array ops —
    no UDF, map-only at any scale; the whole transform is replayable
    in any engine with regex + list functions (the DuckDB oracle
    does). Steps, in order:

    1. lowercase the scheme and host (path/query stay case-sensitive
       per RFC 3986);
    2. strip default ports (:80 on http, :443 on https);
    3. drop the fragment (``#…`` never reaches the server);
    4. remove tracking query params (utm_*, gclid, fbclid, …);
    5. sort surviving query params byte-wise (order is not identity);
    6. drop a trailing ``/`` on non-root paths and an empty ``?``.

    Returns NULL for NULL input; non-URL strings pass through these
    transforms unchanged where components don't match (best-effort,
    never raises)."""
    c = F.col(col) if isinstance(col, str) else col
    # split off fragment first
    nofrag = F.regexp_replace(c, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(nofrag, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    tail = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))
    host = F.lower(hostport)
    host = (
        F.when(
            (scheme == "http") & host.endswith(":80"),
            F.substring(host, 1, F.length(host) - 3),
        )
        .when(
            (scheme == "https") & host.endswith(":443"),
            F.substring(host, 1, F.length(host) - 4),
        )
        .otherwise(host)
    )
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.when(
        tail.contains("?"), F.regexp_replace(tail, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    # strip tracking params, sort the rest
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0)
            & ~p.rlike(_TRACKING_PARAM_RE),
        )
    )
    canon_query = F.array_join(kept, "&")
    # trailing slash on non-root paths
    canon_path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.substring(path, 1, F.length(path) - 1),
    ).otherwise(path)
    out = F.concat(
        F.when(scheme != "", F.concat(scheme, F.lit("://"))).otherwise(F.lit("")),
        host,
        canon_path,
        F.when(F.length(canon_query) > 0, F.concat(F.lit("?"), canon_query)).otherwise(
            F.lit("")
        ),
    )
    return F.when(c.isNull(), F.lit(None).cast("string")).otherwise(out)


#: typographic folds: curly quotes → straight, en/em dashes → '-',
#: NBSP → space (1:1 char map — `translate` semantics in any engine)
_TYPO_SRC = "‘’“”–— "
_TYPO_DST = "''\"\"-- "

#: Latin-1/Latin-Extended accent fold (the high-frequency set; extend
#: the pair of constants to widen coverage — lengths must stay equal)
_ACCENT_SRC = (
    "áàâãäåçéèêëíìîïñóòôõöúùûüýÿ"
    "ÁÀÂÃÄÅÇÉÈÊËÍÌÎÏÑÓÒÔÕÖÚÙÛÜÝ"
)
_ACCENT_DST = "aaaaaaceeeeiiiinooooouuuuyy" "AAAAAACEEEEIIIINOOOOOUUUUY"


def normalize_text(col: Column | str) -> Column:
    """Canonical text normalization for matching/dedup keys — the
    cleanup pass every crawl corpus needs before exact or fuzzy
    matching (curly quotes, em-dashes, NBSP and accents otherwise
    split what a human reads as the same string):

    1. fold typographic characters (curly quotes → straight,
       en/em dash → ``-``, NBSP → space);
    2. fold Latin accents (1:1 ``translate`` over the high-frequency
       set — deliberately a FIXED table, not locale-dependent NFKD,
       so any engine replays it byte-identically);
    3. lowercase;
    4. collapse whitespace runs to one space and trim.

    Pure codegen (translate + lower + regexp_replace) — map-only at
    any scale, NULL passes through."""
    c = F.col(col) if isinstance(col, str) else col
    folded = F.translate(
        F.translate(c, _TYPO_SRC, _TYPO_DST), _ACCENT_SRC, _ACCENT_DST
    )
    return F.trim(F.regexp_replace(F.lower(folded), r"\s+", " "))
