"""Text-analysis Column expressions — all JVM-side Spark built-ins.

Everything here stays inside whole-stage codegen (no Python UDFs): token
counting, quality scoring, language-ID scoring, and a rolling-hash document
fingerprint via ``F.aggregate``. Each has an exact ANSI-SQL twin used by the
driver's DuckDB oracle (see __spark_entry__.oracle_sql).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "gopher_stats",
    "GOPHER_STOPWORDS",
    "ngram_lang_profiles",
    "ngram_profile_spec",
    "predict_lang_ngram_py",
    "lang_id_ngram",
    "NGRAM_SEED_TEXTS",
    "tokens",
    "token_count",
    "distinct_token_count",
    "punct_ratio",
    "stopword_ratio",
    "quality_score",
    "quality_score_from_stats",
    "lang_marker_score",
    "lang_marker_counts",
    "marker_spec",
    "rolling_fingerprint",
    "text_stats",
    "STOPWORDS_EN",
    "FP_MOD",
    "FP_BASE",
]

STOPWORDS_EN = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]

FP_MOD = 1_000_000_007
FP_BASE = 31


def tokens(col: Column) -> Column:
    """Whitespace tokens; empty/blank text -> empty array (not [''])."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != F.lit(""))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def distinct_token_count(col: Column) -> Column:
    return F.size(F.array_distinct(tokens(col)))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    n = F.length(col)
    stripped = F.length(F.regexp_replace(col, r"[^0-9A-Za-z\s]", ""))
    return F.when(n > 0, (n - stripped) / n).otherwise(F.lit(0.0))


def stopword_ratio(col: Column, stopwords: list[str] | None = None) -> Column:
    sw = stopwords or STOPWORDS_EN
    tok = tokens(F.lower(col))
    hits = F.size(F.filter(tok, lambda t: t.isin(sw)))
    n = F.size(tok)
    return F.when(n > 0, hits / n).otherwise(F.lit(0.0))


def quality_score(col: Column) -> Column:
    """Heuristic [0,1] quality: length band + low punctuation + type/token
    ratio. Deterministic, SQL-twinned; a stand-in for Gopher-style rules."""
    n_tok = token_count(col)
    len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    ttr = F.when(n_tok > 0, distinct_token_count(col) / n_tok).otherwise(F.lit(0.0))
    return F.round((len_ok + (1.0 - punct_ratio(col)) + ttr) / 3.0, 6)


def lang_marker_score(col: Column, markers: list[str]) -> Column:
    """Count of tokens that appear in a language marker list (n-gram-free
    language-ID heuristic; argmax over languages gives the prediction)."""
    return F.size(F.filter(tokens(F.lower(col)), lambda t: t.isin(markers)))


def rolling_fingerprint(col: Column, jvm: bool = False) -> Column:
    """Polynomial rolling hash over the text's code points:
    acc = (acc * 31 + codepoint) mod 1e9+7.
    DuckDB twin: list_reduce over string_split_regex (see oracle_sql).

    ``jvm=True`` (requires a prior ensure_jvm_udfs(spark)) runs the
    compiled one-pass kernel (jvm/TextUdfs.java::RollingFp); the default is
    the pure-expression form — F.aggregate over a per-CHARACTER array,
    which Catalyst interprets (~8.4k docs/s at sf0.1; use the JVM path on
    any hot path). Values are identical: F.split(col, "") yields one
    element per code point and F.ascii returns the code point."""
    if jvm:
        from .jvm_sketch import rolling_fp_jvm

        return rolling_fp_jvm(col)
    chars = F.filter(F.split(col, ""), lambda c: c != F.lit(""))
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(FP_BASE) + F.ascii(c)) % F.lit(FP_MOD),
    )


def text_stats(col: Column, jvm: bool = False) -> Column:
    """array<long> [token_count, distinct_token_count, n_chars, n_kept]
    where n_kept counts characters surviving regexp_replace(col,
    "[^0-9A-Za-z\\s]", "") — the four inputs of every text-quality ratio,
    in ONE pass on the JVM path (vs one interpreted HOF pass per stat as
    expressions). Exact value parity between the engines; null -> null."""
    if jvm:
        from .jvm_sketch import text_stats_jvm

        return text_stats_jvm(col)
    return F.when(
        col.isNotNull(),
        F.array(
            token_count(col).cast("long"),
            distinct_token_count(col).cast("long"),
            F.length(col).cast("long"),
            F.length(F.regexp_replace(col, r"[^0-9A-Za-z\s]", "")).cast("long"),
        ),
    )


def quality_score_from_stats(stats: Column) -> Column:
    """quality_score recomputed from a text_stats() array — same formula,
    same float operation order, so the two entry points never disagree."""
    n_tok, n_dis, n, kept = stats[0], stats[1], stats[2], stats[3]
    len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    ttr = F.when(n_tok > 0, n_dis / n_tok).otherwise(F.lit(0.0))
    punct = F.when(n > 0, (n - kept) / n).otherwise(F.lit(0.0))
    return F.round((len_ok + (1.0 - punct) + ttr) / 3.0, 6)


# the Gopher rule-set stopword list (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", Appendix A1.1 — public heuristics, re-derived)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


# ------------------------- Cavnar-Trenkle n-gram language identification
# "N-Gram-Based Text Categorization" (Cavnar & Trenkle 1994, public
# method): rank profiles of character 1..3-grams, out-of-place distance.
# Seed corpora below are original everyday-register sentences written for
# this repo (a few per language is the method's documented sweet spot for
# coarse web-scale routing; swap in larger corpora for production).

NGRAM_SEED_TEXTS = {
    "en": (
        "the quick brown fox jumps over the lazy dog while the children "
        "watch from the garden. it was the best of times and the worst of "
        "times for everyone in the little town. she said that they would "
        "have to wait until the morning train arrived with the letters. "
        "people often think about what they want from life and how they "
        "can get there with the help of their friends."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund während "
        "die kinder aus dem garten zuschauen. es war die beste und die "
        "schlechteste zeit für alle menschen in der kleinen stadt. sie "
        "sagte dass sie bis zum morgen warten müssen bis der zug mit den "
        "briefen ankommt. die leute denken oft darüber nach was sie vom "
        "leben wollen und wie sie es mit hilfe ihrer freunde erreichen."
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux pendant "
        "que les enfants regardent depuis le jardin. c'était la meilleure "
        "et la pire des époques pour tous les habitants de la petite "
        "ville. elle a dit qu'ils devraient attendre jusqu'au matin que le "
        "train arrive avec les lettres. les gens pensent souvent à ce "
        "qu'ils veulent de la vie et comment y parvenir avec l'aide de "
        "leurs amis."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso mientras los "
        "niños miran desde el jardín. era el mejor y el peor de los "
        "tiempos para toda la gente del pequeño pueblo. ella dijo que "
        "tendrían que esperar hasta la mañana a que llegara el tren con "
        "las cartas. la gente piensa a menudo en lo que quiere de la vida "
        "y en cómo conseguirlo con la ayuda de sus amigos."
    ),
    "it": (
        "la veloce volpe marrone salta sopra il cane pigro mentre i "
        "bambini guardano dal giardino. era il migliore e il peggiore dei "
        "tempi per tutta la gente della piccola città. lei ha detto che "
        "avrebbero dovuto aspettare fino al mattino che il treno arrivasse "
        "con le lettere. la gente pensa spesso a cosa vuole dalla vita e a "
        "come ottenerlo con l'aiuto dei propri amici."
    ),
    "pt": (
        "a rápida raposa marrom salta sobre o cão preguiçoso enquanto as "
        "crianças observam do jardim. era o melhor e o pior dos tempos "
        "para todas as pessoas da pequena cidade. ela disse que teriam de "
        "esperar até a manhã até que o trem chegasse com as cartas. as "
        "pessoas pensam muitas vezes sobre o que querem da vida e como "
        "conseguir isso com a ajuda dos seus amigos."
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond terwijl de "
        "kinderen vanuit de tuin toekijken. het was de beste en de "
        "slechtste tijd voor alle mensen in het kleine stadje. ze zei dat "
        "ze tot de ochtend moesten wachten tot de trein met de brieven "
        "aankwam. mensen denken vaak na over wat ze van het leven willen "
        "en hoe ze dat met de hulp van hun vrienden kunnen bereiken."
    ),
    "ru": (
        "быстрая коричневая лиса прыгает через ленивую собаку пока дети "
        "смотрят из сада. это было лучшее и худшее время для всех людей в "
        "маленьком городе. она сказала что им придется ждать до утра пока "
        "не придет поезд с письмами. люди часто думают о том чего они "
        "хотят от жизни и как этого достичь с помощью своих друзей."
    ),
    "zh": (
        "敏捷的棕色狐狸跳过了懒惰的狗孩子们在花园里看着。那是最好的时代也是"
        "最坏的时代对小镇上的所有人来说都是如此。她说他们必须等到早上火车"
        "带着信件到达。人们常常思考自己想从生活中得到什么以及如何在朋友的"
        "帮助下实现它。"
    ),
}

_NGRAM_K = 300
# Python str.isspace() code points == the Java kernel's isPyWhitespace set
# (Character.isWhitespace + NEL/NBSP/figure/narrow-NBSP) — kept explicit so
# both engines map the identical set to ' ' before n-gramming
_PY_WS = frozenset(
    chr(c)
    for c in (
        list(range(0x09, 0x0E)) + list(range(0x1C, 0x21))
        + [0x85, 0xA0, 0x1680]
        + list(range(0x2000, 0x200B))
        + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
    )
)


def _ngram_counts(text: str) -> dict:
    """Normalized 1..3-gram counts over code points (lowercase, every
    Python-whitespace char mapped to ' ', trimmed). Returns {} for blank."""
    low = text.lower()
    s = "".join(" " if ch in _PY_WS else ch for ch in low).strip(" ")
    if not s:
        return {}
    counts: dict = {}
    for n in (1, 2, 3):
        for i in range(len(s) - n + 1):
            g = s[i:i + n]
            counts[g] = counts.get(g, 0) + 1
    return counts


def _rank_profile(counts: dict, k: int) -> list:
    return [g for g, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]]


def ngram_lang_profiles(seed_texts: dict | None = None, k: int = _NGRAM_K) -> dict:
    """{lang: [ngram, ...]} rank profiles from seed corpora (deterministic)."""
    seed_texts = seed_texts or NGRAM_SEED_TEXTS
    return {lg: _rank_profile(_ngram_counts(t), k) for lg, t in seed_texts.items()}


def ngram_profile_spec(profiles: dict) -> str:
    """Serialize profiles for the JVM kernel (insertion order preserved):
    lang \\x02 ng1 \\x01 ng2 ... languages joined by \\x03. Control
    separators cannot appear in n-grams built by ngram_lang_profiles (the
    normalizer maps whitespace classes to ' ' and text never contains
    \\x01-\\x03 after it) — validated here for externally-built profiles."""
    for lg, ngs in profiles.items():
        for tok in [lg, *ngs]:
            if any(ch in tok for ch in "\x00\x01\x02\x03"):
                raise ValueError(
                    f"profile entry {tok!r} contains a control separator"
                )
    return "\x03".join(lg + "\x02" + "\x01".join(ngs) for lg, ngs in profiles.items())


def _rank_lookup(profiles: dict) -> dict:
    """{lang: {ngram: rank}} — built ONCE and reused per document (building
    these dicts per call dominated the Arrow fallback's per-row cost)."""
    return {lg: {g: r for r, g in enumerate(ngs)} for lg, ngs in profiles.items()}


def _predict_from_ranks(text: str | None, ranks: dict, k: int) -> str | None:
    if text is None:
        return None
    counts = _ngram_counts(text)
    if not counts:
        return None
    doc = _rank_profile(counts, k)
    best, best_d = None, None
    for lg, rank in ranks.items():
        d = sum(abs(r - rank[g]) if g in rank else k for r, g in enumerate(doc))
        if best_d is None or d < best_d:
            best, best_d = lg, d
    return best


def predict_lang_ngram_py(text: str | None, profiles: dict, k: int = _NGRAM_K) -> str | None:
    """Pure-Python twin of the JVM kernel (identical algorithm + tie
    rules for BMP text): blank/None -> None; ties -> first language in
    profile insertion order. For batch use, hoist _rank_lookup(profiles)
    and call _predict_from_ranks (the pandas_udf fallback does)."""
    return _predict_from_ranks(text, _rank_lookup(profiles), k)


def lang_id_ngram(col: Column, profiles: dict | None = None, jvm: bool = False) -> Column:
    """Predicted language code per document via Cavnar-Trenkle rank
    profiles — the statistical upgrade over marker-token counting
    (lang_marker_counts). JVM path: one compiled pass per doc; fallback:
    Arrow pandas_udf running the identical Python twin."""
    profiles = profiles or ngram_lang_profiles()
    if jvm:
        from .jvm_sketch import ngram_lang_id_jvm

        return ngram_lang_id_jvm(col, ngram_profile_spec(profiles))

    ranks = _rank_lookup(profiles)

    @F.pandas_udf("string")
    def pred(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: _predict_from_ranks(t, ranks, _NGRAM_K))

    return pred(col)


def gopher_stats(
    col: Column,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> Column:
    """The full public Gopher quality-rule set as ONE whole-stage-codegen
    struct — no Python, no interpreted higher-order functions; every count
    is a single JVM regexp pass and every pattern is RE2-compatible (no
    lookarounds), so the DuckDB oracle twin computes identical values.

    Fields: n_words, mean_word_len, symbol_ratio (#/ellipsis per word),
    bullet_ratio (lines starting with a bullet), ellipsis_ratio (lines
    ending with an ellipsis), alpha_ratio (words containing a letter),
    stopword_hits (distinct GOPHER_STOPWORDS present), passes (0/1 — all
    rules hold). Ratios are rounded to 6 for display; rule comparisons use
    the unrounded values. Null text -> null struct."""
    n_words = F.regexp_count(col, F.lit(r"\S+"))
    word_chars = F.length(F.regexp_replace(col, r"\s+", ""))
    n_sym = F.regexp_count(col, F.lit(r"#|\.\.\.|…"))
    n_lines = F.regexp_count(col, F.lit(r"\n")) + F.lit(1)
    # (?d) = Java UNIX_LINES: ^/$ anchor ONLY at \n, matching RE2's
    # multiline semantics in the DuckDB twin. Without it Java also anchors
    # at \r/\u0085/\u2028/\u2029, so CRLF text would count ellipsis/bullet
    # lines on one engine and not the other. Consequence (both engines,
    # consistently): lines terminated by \r\n do NOT count as
    # ellipsis-ended (the \r intervenes) — normalize newlines upstream if
    # that matters.
    n_bullet = F.regexp_count(col, F.lit(r"(?dm)^[ \t]*[-*•‣▪]"))
    n_ell = F.regexp_count(col, F.lit(r"(?dm)(\.\.\.|…)[ \t]*$"))
    n_alpha = F.regexp_count(col, F.lit(r"[^\s]*[A-Za-z][^\s]*"))
    low = F.lower(col)
    n_stop = sum(
        F.when(low.rlike(rf"\b{w}\b"), 1).otherwise(0) for w in GOPHER_STOPWORDS
    )

    mean_wl = F.when(n_words > 0, word_chars / n_words).otherwise(F.lit(0.0))
    sym_r = F.when(n_words > 0, n_sym / n_words).otherwise(F.lit(0.0))
    bull_r = n_bullet / n_lines
    ell_r = n_ell / n_lines
    alpha_r = F.when(n_words > 0, n_alpha / n_words).otherwise(F.lit(0.0))
    passes = (
        (n_words >= min_words) & (n_words <= max_words)
        & (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
        & (sym_r <= max_symbol_ratio)
        & (bull_r <= max_bullet_ratio)
        & (ell_r <= max_ellipsis_ratio)
        & (alpha_r >= min_alpha_ratio)
        & (n_stop >= min_stopword_hits)
    )
    return F.when(
        col.isNotNull(),
        F.struct(
            n_words.cast("long").alias("n_words"),
            F.round(mean_wl, 6).alias("mean_word_len"),
            F.round(sym_r, 6).alias("symbol_ratio"),
            F.round(bull_r, 6).alias("bullet_ratio"),
            F.round(ell_r, 6).alias("ellipsis_ratio"),
            F.round(alpha_r, 6).alias("alpha_ratio"),
            n_stop.cast("long").alias("stopword_hits"),
            passes.cast("long").alias("passes"),
        ),
    )


def marker_spec(markers: dict) -> str:
    """Serialize {lang: [marker, ...]} for the JVM marker-counts kernel
    (insertion order preserved — counts come back in this order).

    Markers are DEDUPED per language (the expression path's isin has set
    semantics; a duplicated word must not double-count on the JVM path)
    and validated against the spec delimiters — an unescapable ':' ',' '|'
    or control separator inside a marker would silently corrupt the parsed
    word lists."""
    for lg, ws in markers.items():
        for tok in [lg, *ws]:
            if any(ch in tok for ch in ":,|\x00\x01\x02\x03"):
                raise ValueError(
                    f"marker/lang {tok!r} contains a spec delimiter "
                    "(':', ',', '|' or a control separator)"
                )
    return "|".join(
        f"{lg}:{','.join(dict.fromkeys(ws))}" for lg, ws in markers.items()
    )


def lang_marker_counts(col: Column, markers: dict, jvm: bool = False) -> Column:
    """array<long> of marker-token counts, one per language in ``markers``
    insertion order. JVM path: ONE tokenization pass for all languages
    (jvm/TextUdfs.java::MarkerCounts); expression path: one interpreted
    F.filter pass per language (the round-3 lang_id cost)."""
    if jvm:
        from .jvm_sketch import marker_counts_jvm

        return marker_counts_jvm(col, marker_spec(markers))
    # null text -> NULL (not an array of nulls), matching the JVM kernel
    return F.when(
        col.isNotNull(),
        F.array(*[lang_marker_score(col, mk).cast("long") for mk in markers.values()]),
    )
