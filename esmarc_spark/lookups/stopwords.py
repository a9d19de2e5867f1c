"""Stopword dimension for language identification: ~30 of the most
frequent function words per language, 15 languages. Function-word lists
of this kind are standard public linguistic knowledge (they appear in
every classic IR stopword list); no external download is involved.

The dim replaces the round-1/2 placeholder (4 words x 2 languages,
ops/text.py) that the round-2 verdict called decorative. The operator
shape is unchanged: pure codegen ``size(filter(isin))`` votes, mirrored
token-for-token in the DuckDB oracle SQL.

``LANG_PRIORITY`` is the deterministic tie-break order (first language in
the list with the maximal vote wins) — both engines apply the same order,
so results are bit-stable.
"""

from __future__ import annotations

STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": (
        "the", "of", "and", "a", "to", "in", "is", "you", "that", "it",
        "he", "was", "for", "on", "are", "as", "with", "his", "they",
        "at", "be", "this", "have", "from", "or", "had", "by", "but",
        "not", "what",
    ),
    "de": (
        "der", "die", "das", "und", "zu", "den", "mit", "von", "sich",
        "des", "auf", "ist", "im", "dem", "nicht", "ein", "eine",
        "als", "auch", "es", "an", "werden", "aus", "er", "hat", "dass",
        "sie", "nach", "wird", "bei",
    ),
    "fr": (
        "le", "la", "les", "des", "un", "une", "et", "en", "du", "dans",
        "est", "que", "qui", "pour", "sur", "avec", "au", "il", "elle",
        "ne", "pas", "ce", "se", "son", "ses", "mais", "ou", "comme",
        "plus", "sont",
    ),
    "es": (
        "el", "los", "las", "del", "un", "una", "y", "en", "que", "es",
        "por", "con", "para", "su", "al", "lo", "como", "más", "pero",
        "sus", "le", "ya", "o", "este", "sí", "porque", "esta", "entre",
        "cuando", "muy",
    ),
    "it": (
        "il", "lo", "gli", "di", "del", "della", "un", "una", "e",
        "che", "è", "per", "con", "non", "si", "da", "al", "dei",
        "delle", "su", "come", "anche", "ma", "più", "questo", "sono",
        "alla", "nel", "ha", "degli",
    ),
    "pt": (
        "o", "os", "as", "de", "do", "da", "dos", "das", "um", "uma",
        "e", "que", "é", "em", "para", "com", "não", "por", "se", "na",
        "no", "mais", "como", "mas", "ao", "ele", "sua", "ou", "seu",
        "uns",
    ),
    "nl": (
        "de", "het", "een", "en", "van", "in", "is", "dat", "op", "te",
        "zijn", "met", "voor", "niet", "aan", "er", "om", "ook", "als",
        "maar", "bij", "of", "uit", "dan", "naar", "dit", "zo", "door",
        "over", "hij",
    ),
    "sv": (
        "och", "i", "att", "det", "som", "en", "på", "är", "av", "för",
        "med", "till", "den", "har", "de", "inte", "om", "ett", "han",
        "men", "var", "jag", "sig", "från", "vi", "så", "kan", "när",
        "år", "efter",
    ),
    "da": (
        "og", "i", "at", "det", "en", "den", "til", "er", "som", "på",
        "de", "med", "han", "af", "for", "ikke", "der", "var", "mig",
        "sig", "men", "et", "har", "om", "vi", "min", "havde", "ham",
        "hun", "nu",
    ),
    "no": (
        "og", "i", "jeg", "det", "at", "en", "et", "den", "til", "er",
        "som", "på", "de", "med", "han", "av", "ikke", "der", "så",
        "var", "meg", "seg", "men", "har", "om", "vi", "min", "mitt",
        "ha", "kunne",
    ),
    "pl": (
        "w", "i", "na", "z", "do", "że", "się", "nie", "jest", "to",
        "jak", "po", "co", "tak", "za", "od", "ale", "o", "przez",
        "przy", "być", "był", "dla", "może", "już", "tylko", "czy",
        "lub", "oraz", "ich",
    ),
    "cs": (
        "a", "v", "se", "na", "je", "že", "o", "s", "z", "do", "i",
        "to", "k", "ve", "pro", "za", "by", "ale", "jako", "po", "co",
        "jeho", "podle", "od", "při", "také", "jen", "až", "nebo", "už",
    ),
    "tr": (
        "ve", "bir", "bu", "da", "de", "için", "ile", "ne", "o", "çok",
        "daha", "gibi", "her", "ama", "en", "kadar", "sonra", "var",
        "yok", "olarak", "olan", "ben", "biz", "siz", "onlar", "ki",
        "ya", "hem", "eğer", "değil",
    ),
    "fi": (
        "ja", "on", "ei", "se", "että", "hän", "oli", "joka", "mutta",
        "niin", "kuin", "myös", "tai", "kun", "ovat", "sen", "sitä",
        "ole", "jos", "he", "mitä", "tämä", "vain", "vielä", "siitä",
        "olla", "hänen", "nyt", "sitten", "jo",
    ),
    "ru": (
        "и", "в", "не", "на", "я", "быть", "он", "с", "что", "а",
        "по", "это", "она", "этот", "к", "но", "они", "мы", "как",
        "из", "у", "который", "то", "за", "свой", "весь", "год", "от",
        "так", "о",
    ),
}

# deterministic tie-break: first language here with the max vote wins
LANG_PRIORITY: tuple[str, ...] = (
    "en", "de", "fr", "es", "it", "pt", "nl", "sv", "da", "no",
    "pl", "cs", "tr", "fi", "ru",
)
