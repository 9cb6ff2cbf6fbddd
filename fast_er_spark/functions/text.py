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
# Seed corpora below are original sentences written for this repo across
# several everyday registers (narrative, weather/news, instructions,
# technology, travel) — deliberately varied so the rank profiles capture
# function-word and morphology n-grams rather than one story's vocabulary.
# For production-grade routing swap in profiles built from thousands of
# documents per language; the METHOD and kernels are unchanged by that.

NGRAM_SEED_TEXTS = {
    "en": (
        "the quick brown fox jumps over the lazy dog while the children "
        "watch from the garden. it was the best of times and the worst of "
        "times for everyone in the little town. she said that they would "
        "have to wait until the morning train arrived with the letters. "
        "people often think about what they want from life and how they "
        "can get there with the help of their friends. "
        "the weather this week will be cold and windy in the north with "
        "some rain along the coast during the evening hours. heat the oil "
        "in a large pan and add the onions then cook them slowly until "
        "they are soft and golden. the new software update makes the "
        "application faster and fixes several problems that users had "
        "reported over the last months. when you travel to another "
        "country you should always keep your passport and tickets in a "
        "safe place where you can find them quickly. reading books every "
        "day is one of the best ways to learn new words and understand "
        "how other people see the world around them."
    ),
    "de": (
        "der schnelle braune fuchs springt über den faulen hund während "
        "die kinder aus dem garten zuschauen. es war die beste und die "
        "schlechteste zeit für alle menschen in der kleinen stadt. sie "
        "sagte dass sie bis zum morgen warten müssen bis der zug mit den "
        "briefen ankommt. die leute denken oft darüber nach was sie vom "
        "leben wollen und wie sie es mit hilfe ihrer freunde erreichen. "
        "das wetter wird in dieser woche im norden kalt und windig mit "
        "etwas regen an der küste in den abendstunden. erhitzen sie das "
        "öl in einer großen pfanne und geben sie die zwiebeln dazu dann "
        "lassen sie sie langsam weich und goldbraun werden. das neue "
        "update macht die anwendung schneller und behebt mehrere fehler "
        "die die nutzer in den letzten monaten gemeldet hatten. wenn man "
        "in ein anderes land reist sollte man den reisepass und die "
        "fahrkarten immer an einem sicheren ort aufbewahren. jeden tag "
        "ein buch zu lesen ist eine der besten möglichkeiten neue wörter "
        "zu lernen und die welt besser zu verstehen."
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux pendant "
        "que les enfants regardent depuis le jardin. c'était la meilleure "
        "et la pire des époques pour tous les habitants de la petite "
        "ville. elle a dit qu'ils devraient attendre jusqu'au matin que le "
        "train arrive avec les lettres. les gens pensent souvent à ce "
        "qu'ils veulent de la vie et comment y parvenir avec l'aide de "
        "leurs amis. "
        "le temps sera froid et venteux cette semaine dans le nord avec "
        "quelques pluies sur la côte pendant la soirée. faites chauffer "
        "l'huile dans une grande poêle puis ajoutez les oignons et "
        "laissez les cuire doucement jusqu'à ce qu'ils soient tendres et "
        "dorés. la nouvelle mise à jour rend l'application plus rapide et "
        "corrige plusieurs problèmes que les utilisateurs avaient "
        "signalés ces derniers mois. quand on voyage dans un autre pays "
        "il faut toujours garder son passeport et ses billets dans un "
        "endroit sûr. lire des livres chaque jour est l'un des meilleurs "
        "moyens d'apprendre de nouveaux mots et de comprendre le monde."
    ),
    "es": (
        "el rápido zorro marrón salta sobre el perro perezoso mientras los "
        "niños miran desde el jardín. era el mejor y el peor de los "
        "tiempos para toda la gente del pequeño pueblo. ella dijo que "
        "tendrían que esperar hasta la mañana a que llegara el tren con "
        "las cartas. la gente piensa a menudo en lo que quiere de la vida "
        "y en cómo conseguirlo con la ayuda de sus amigos. "
        "el tiempo esta semana será frío y ventoso en el norte con "
        "algunas lluvias en la costa durante la tarde. calienta el aceite "
        "en una sartén grande y añade las cebollas luego déjalas cocinar "
        "despacio hasta que estén blandas y doradas. la nueva "
        "actualización hace que la aplicación sea más rápida y corrige "
        "varios problemas que los usuarios habían señalado en los últimos "
        "meses. cuando viajas a otro país siempre debes guardar el "
        "pasaporte y los billetes en un lugar seguro donde puedas "
        "encontrarlos. leer libros todos los días es una de las mejores "
        "maneras de aprender palabras nuevas y entender el mundo."
    ),
    "it": (
        "la veloce volpe marrone salta sopra il cane pigro mentre i "
        "bambini guardano dal giardino. era il migliore e il peggiore dei "
        "tempi per tutta la gente della piccola città. lei ha detto che "
        "avrebbero dovuto aspettare fino al mattino che il treno arrivasse "
        "con le lettere. la gente pensa spesso a cosa vuole dalla vita e a "
        "come ottenerlo con l'aiuto dei propri amici. "
        "il tempo questa settimana sarà freddo e ventoso al nord con "
        "qualche pioggia sulla costa durante la sera. scalda l'olio in "
        "una padella grande e aggiungi le cipolle poi lasciale cuocere "
        "lentamente finché non diventano morbide e dorate. il nuovo "
        "aggiornamento rende l'applicazione più veloce e risolve diversi "
        "problemi che gli utenti avevano segnalato negli ultimi mesi. "
        "quando si viaggia in un altro paese bisogna sempre tenere il "
        "passaporto e i biglietti in un posto sicuro. leggere libri ogni "
        "giorno è uno dei modi migliori per imparare parole nuove e "
        "capire il mondo intorno a noi."
    ),
    "pt": (
        "a rápida raposa marrom salta sobre o cão preguiçoso enquanto as "
        "crianças observam do jardim. era o melhor e o pior dos tempos "
        "para todas as pessoas da pequena cidade. ela disse que teriam de "
        "esperar até a manhã até que o trem chegasse com as cartas. as "
        "pessoas pensam muitas vezes sobre o que querem da vida e como "
        "conseguir isso com a ajuda dos seus amigos. "
        "o tempo nesta semana será frio e ventoso no norte com algumas "
        "chuvas no litoral durante a noite. aqueça o óleo numa frigideira "
        "grande e junte as cebolas depois deixe cozinhar devagar até "
        "ficarem macias e douradas. a nova atualização torna o aplicativo "
        "mais rápido e corrige vários problemas que os usuários tinham "
        "relatado nos últimos meses. quando você viaja para outro país "
        "deve sempre guardar o passaporte e as passagens num lugar "
        "seguro onde possa encontrá los. ler livros todos os dias é uma "
        "das melhores maneiras de aprender palavras novas e entender o "
        "mundo ao redor."
    ),
    "nl": (
        "de snelle bruine vos springt over de luie hond terwijl de "
        "kinderen vanuit de tuin toekijken. het was de beste en de "
        "slechtste tijd voor alle mensen in het kleine stadje. ze zei dat "
        "ze tot de ochtend moesten wachten tot de trein met de brieven "
        "aankwam. mensen denken vaak na over wat ze van het leven willen "
        "en hoe ze dat met de hulp van hun vrienden kunnen bereiken. "
        "het weer wordt deze week koud en winderig in het noorden met "
        "wat regen aan de kust in de avonduren. verhit de olie in een "
        "grote pan en voeg de uien toe laat ze daarna langzaam zacht en "
        "goudbruin worden. de nieuwe update maakt de applicatie sneller "
        "en verhelpt verschillende problemen die gebruikers de afgelopen "
        "maanden hadden gemeld. wie naar een ander land reist moet zijn "
        "paspoort en kaartjes altijd op een veilige plek bewaren. elke "
        "dag boeken lezen is een van de beste manieren om nieuwe woorden "
        "te leren en de wereld om je heen te begrijpen."
    ),
    "ru": (
        "быстрая коричневая лиса прыгает через ленивую собаку пока дети "
        "смотрят из сада. это было лучшее и худшее время для всех людей в "
        "маленьком городе. она сказала что им придется ждать до утра пока "
        "не придет поезд с письмами. люди часто думают о том чего они "
        "хотят от жизни и как этого достичь с помощью своих друзей. "
        "погода на этой неделе будет холодной и ветреной на севере с "
        "небольшими дождями на побережье по вечерам. разогрейте масло в "
        "большой сковороде и добавьте лук затем готовьте его медленно "
        "пока он не станет мягким и золотистым. новое обновление делает "
        "приложение быстрее и исправляет несколько ошибок о которых "
        "пользователи сообщали в последние месяцы. когда вы едете в "
        "другую страну всегда держите паспорт и билеты в надежном месте. "
        "читать книги каждый день это один из лучших способов выучить "
        "новые слова и понять мир вокруг нас."
    ),
    "zh": (
        "敏捷的棕色狐狸跳过了懒惰的狗孩子们在花园里看着。那是最好的时代也是"
        "最坏的时代对小镇上的所有人来说都是如此。她说他们必须等到早上火车"
        "带着信件到达。人们常常思考自己想从生活中得到什么以及如何在朋友的"
        "帮助下实现它。"
        "本周北方的天气将会寒冷多风沿海地区晚间有小雨。在大锅里把油烧热然后"
        "加入洋葱慢慢炒到变软变成金黄色。新的软件更新让应用程序运行得更快"
        "并且修复了用户在过去几个月里报告的几个问题。去另一个国家旅行的时候"
        "一定要把护照和车票放在安全的地方以便随时找到。每天读书是学习新词语"
        "和理解周围世界的最好方法之一。"
    ),
    "pl": (
        "szybki brązowy lis przeskakuje nad leniwym psem podczas gdy "
        "dzieci patrzą z ogrodu. to był najlepszy i najgorszy czas dla "
        "wszystkich ludzi w małym miasteczku. powiedziała że będą musieli "
        "czekać do rana aż przyjedzie pociąg z listami. ludzie często "
        "myślą o tym czego chcą od życia i jak to osiągnąć z pomocą "
        "swoich przyjaciół. "
        "pogoda w tym tygodniu będzie zimna i wietrzna na północy z "
        "niewielkimi opadami deszczu na wybrzeżu wieczorem. rozgrzej olej "
        "na dużej patelni i dodaj cebulę potem smaż ją powoli aż będzie "
        "miękka i złota. nowa aktualizacja sprawia że aplikacja działa "
        "szybciej i naprawia kilka błędów które użytkownicy zgłaszali w "
        "ostatnich miesiącach. kiedy podróżujesz do innego kraju zawsze "
        "trzymaj paszport i bilety w bezpiecznym miejscu. czytanie "
        "książek każdego dnia to jeden z najlepszych sposobów na naukę "
        "nowych słów i zrozumienie świata wokół nas."
    ),
    "sv": (
        "den snabba bruna räven hoppar över den lata hunden medan barnen "
        "tittar på från trädgården. det var den bästa och den sämsta "
        "tiden för alla människor i den lilla staden. hon sade att de "
        "skulle behöva vänta till morgonen tills tåget kom med breven. "
        "människor tänker ofta på vad de vill ha av livet och hur de kan "
        "nå dit med hjälp av sina vänner. "
        "vädret den här veckan blir kallt och blåsigt i norr med lite "
        "regn längs kusten under kvällen. värm oljan i en stor panna och "
        "lägg i löken låt den sedan steka långsamt tills den är mjuk och "
        "gyllene. den nya uppdateringen gör programmet snabbare och "
        "rättar flera fel som användarna hade rapporterat under de "
        "senaste månaderna. när man reser till ett annat land bör man "
        "alltid förvara passet och biljetterna på en säker plats. att "
        "läsa böcker varje dag är ett av de bästa sätten att lära sig "
        "nya ord och förstå världen omkring oss."
    ),
    "tr": (
        "hızlı kahverengi tilki tembel köpeğin üzerinden atlarken "
        "çocuklar bahçeden izliyordu. küçük kasabadaki herkes için en iyi "
        "ve en kötü zamanlardı. mektupları getiren tren gelene kadar "
        "sabaha kadar beklemeleri gerektiğini söyledi. insanlar hayattan "
        "ne istediklerini ve arkadaşlarının yardımıyla oraya nasıl "
        "ulaşacaklarını sık sık düşünürler. "
        "bu hafta kuzeyde hava soğuk ve rüzgarlı olacak akşam "
        "saatlerinde kıyıda hafif yağmur bekleniyor. büyük bir tavada "
        "yağı ısıtın ve soğanları ekleyin sonra yumuşayıp altın rengini "
        "alana kadar yavaşça pişirin. yeni güncelleme uygulamayı daha "
        "hızlı hale getiriyor ve kullanıcıların son aylarda bildirdiği "
        "birkaç sorunu düzeltiyor. başka bir ülkeye seyahat ederken "
        "pasaportunuzu ve biletlerinizi her zaman güvenli bir yerde "
        "saklamalısınız. her gün kitap okumak yeni kelimeler öğrenmenin "
        "ve çevremizdeki dünyayı anlamanın en iyi yollarından biridir."
    ),
    "ja": (
        "すばやい茶色のきつねはなまけものの犬を飛びこえて子どもたちは庭から"
        "見ていました。それは小さな町のすべての人にとって最良の時代であり"
        "最悪の時代でもありました。彼女は手紙を積んだ列車が着くまで朝まで"
        "待たなければならないと言いました。人はよく人生に何を求めるのか"
        "友だちの助けを借りてどうやってそこへたどり着くのかを考えます。"
        "今週の北部の天気は寒く風が強くなり夕方には海岸沿いで小雨が降る"
        "でしょう。大きなフライパンで油を熱して玉ねぎを加えやわらかく"
        "金色になるまでゆっくり炒めます。新しい更新によってアプリはより"
        "速くなり利用者がここ数か月で報告したいくつかの問題が直りました。"
        "ほかの国へ旅行するときはパスポートと切符をいつも安全な場所に"
        "しまっておくべきです。毎日本を読むことは新しい言葉を覚えて周りの"
        "世界を理解するいちばんよい方法のひとつです。"
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
