"""Text-analysis expression builders: language ID, quality scoring,
token counting, document fingerprinting.

All builders return trees in the engine's expression IR, so they run
inside ``LogicalProjection`` through the full optimizer pipeline and
execute JVM-side (whole-stage codegen — no Python UDFs anywhere).  At
100 TB these are embarrassingly parallel map-only expressions: no
shuffle, prunable to the ``text`` column, vectorized by Tungsten.

Cross-engine determinism: every function here has a DuckDB-SQL twin
(see ``__spark_entry__``) computing bit-identical values — integer
arithmetic wherever possible, shared 60-bit md5 hash
(``conv(substr(md5(x),1,15),16,10)`` ≡ ``('0x'||substr(md5(x),1,15))::BIGINT``).

The reference has NO scalar-function layer at all (SURVEY §2.4
'Scalar functions: absent' — delegated to DataFusion ``Expr``); this
module is part of the BASELINE.json north-star extension surface.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from ..expr import Alias, BinOp, CaseWhen, Cast, Col, Expr, Func, Lit, col, lit

__all__ = [
    "h60",
    "occurrences",
    "LANG_MARKERS",
    "lang_scores",
    "lang_id",
    "lang_id_from_scores",
    "token_count_ws",
    "token_count_bpeish",
    "alpha_ratio_1000",
    "quality_score_1000",
    "doc_fingerprint",
]


def h60(e: Expr) -> Expr:
    """Shared 60-bit hash: first 15 hex chars of md5, parsed base-16.
    Positive, fits in int64, computable identically in DuckDB."""
    return Cast(
        Func("conv", (Func("substring", (Func("md5", (e,)), lit(1), lit(15))), lit(16), lit(10))),
        "bigint",
    )


def _padded_lower(e: Expr) -> Expr:
    return Func("concat", (lit(" "), Func("lower", (e,)), lit(" ")))


def occurrences(e: Expr, marker: str) -> Expr:
    """Count of non-overlapping occurrences of ``marker`` in
    ``' '||lower(e)||' '`` — pure integer arithmetic:
    (len(s) - len(replace(s, m, ''))) / len(m)."""
    s = _padded_lower(e)
    diff = BinOp(
        "-",
        Func("length", (s,)),
        Func("length", (Func("replace", (s, lit(marker), lit(""))),)),
    )
    return Cast(BinOp("/", diff, lit(len(marker))), "bigint")


#: language → marker words (space-padded matching).  The synthetic corpus
#: is English-flavoured word soup, so real-world stopword lists for
#: de/fr/es rarely fire — the POINT is the deterministic computation, and
#: 'und' (undetermined) is the honest answer for unmatched text.
LANG_MARKERS: Tuple[Tuple[str, Tuple[str, ...]], ...] = (
    ("en", (" the ", " a ", " and ", " of ")),
    ("de", (" der ", " die ", " und ", " das ")),
    ("fr", (" le ", " la ", " et ", " les ")),
    ("es", (" el ", " los ", " que ", " y ")),
)


def lang_scores(e: Expr) -> list[Alias]:
    out = []
    for lang, markers in LANG_MARKERS:
        score: Expr = occurrences(e, markers[0])
        for m in markers[1:]:
            score = BinOp("+", score, occurrences(e, m))
        out.append(Alias(score, f"score_{lang}"))
    return out


def lang_id(e: Expr) -> Expr:
    """argmax over language scores; ties broken by LANG_MARKERS order;
    all-zero → 'und'.  Inlines every score into the CASE — prefer
    ``lang_id_from_scores`` after a projection that computes the scores
    once (the inline form re-evaluates each score ~4×)."""
    scores = {a.name.removeprefix("score_"): a.expr for a, (_l, _m) in zip(lang_scores(e), LANG_MARKERS)}
    return _argmax_case(scores)


def lang_id_from_scores() -> Expr:
    """argmax CASE over already-computed ``score_<lang>`` columns — use
    as a second projection stage so each score is evaluated once."""
    return _argmax_case({lang: Col(f"score_{lang}") for lang, _ in LANG_MARKERS})


def _argmax_case(scores: dict) -> Expr:
    branches = []
    langs = [l for l, _ in LANG_MARKERS]
    for i, lang in enumerate(langs):
        cond: Expr = scores[lang].gt(lit(0))
        # strictly greater than every EARLIER lang (earlier wins ties),
        # and >= every later one
        for j, other in enumerate(langs):
            if i == j:
                continue
            cmp = (
                scores[lang].gt(scores[other])
                if j < i
                else scores[lang].ge(scores[other])
            )
            cond = cond.and_(cmp)
        branches.append((cond, lit(lang)))
    return CaseWhen(tuple(branches), lit("und"))


def token_count_ws(e: Expr) -> Expr:
    """Whitespace token count."""
    return Cast(
        Func("size", (Func("split", (Func("trim", (e,)), lit(r"\s+"))),)), "bigint"
    )


def token_count_bpeish(e: Expr) -> Expr:
    """BPE-ish token count: words + standalone punctuation, via the
    regex ``\\w+|[^\\w\\s]`` (same count as DuckDB's
    ``length(regexp_extract_all(text, '\\w+|[^\\w\\s]'))``)."""
    return Cast(
        Func(
            "size",
            (Func("regexp_extract_all", (e, lit(r"\w+|[^\w\s]"), lit(0))),),
        ),
        "bigint",
    )


def _strip_regex_len(e: Expr, pattern: str) -> Expr:
    return Func("length", (Func("regexp_replace", (e, lit(pattern), lit(""))),))


def alpha_ratio_1000(e: Expr) -> Expr:
    """⌊1000 · alpha_chars / chars⌋ (int; 0 for empty text)."""
    alpha = _strip_regex_len(e, "[^A-Za-z]")
    n = Func("length", (e,))
    return Cast(
        Func(
            "floor",
            (
                BinOp(
                    "/",
                    BinOp("*", lit(1000.0), Cast(alpha, "double")),
                    Cast(Func("greatest", (n, lit(1))), "double"),
                ),
            ),
        ),
        "bigint",
    )


def quality_score_1000(e: Expr) -> Expr:
    """Deterministic quality score in [0, 1000]:

    0.5·alpha_ratio + 0.3·min(len,500)/500 + 0.2·(1 − punct_ratio),
    scaled ×1000, floored.  Integer inputs → identical doubles → same
    floor in every IEEE-754 engine.
    """
    n = Func("length", (e,))
    nd = Cast(Func("greatest", (n, lit(1))), "double")
    alpha = Cast(_strip_regex_len(e, "[^A-Za-z]"), "double")
    punct = Cast(_strip_regex_len(e, r"[\w\s]"), "double")
    lenterm = BinOp(
        "/", Cast(Func("least", (n, lit(500))), "double"), lit(500.0)
    )
    score = BinOp(
        "+",
        BinOp(
            "+",
            BinOp("*", lit(0.5), BinOp("/", alpha, nd)),
            BinOp("*", lit(0.3), lenterm),
        ),
        BinOp("*", lit(0.2), BinOp("-", lit(1.0), BinOp("/", punct, nd))),
    )
    return Cast(Func("floor", (BinOp("*", lit(1000.0), score),)), "bigint")


def doc_fingerprint(e: Expr) -> Expr:
    """Whole-document content fingerprint (60-bit md5 hash of the
    lower-cased, whitespace-normalized text) — the exact-dedup key."""
    normalized = Func(
        "regexp_replace", (Func("lower", (Func("trim", (e,)),)), lit(r"\s+"), lit(" "))
    )
    return h60(normalized)
