"""Stopword lexicon for language identification.

Hand-authored from the standard public stopword inventories (the usual
NLTK/ISO-639 style most-frequent function words) — ~40-50 words for each
of ten space-tokenized languages. This replaces the r2 4x5-word demo
lists: lang_id stays a single codegen'd scan-project, but over a lexicon
with real discriminative power.

CJK languages are intentionally absent: the operators tokenize on
whitespace, which does not segment Chinese/Japanese; a CJK path needs a
segmenter (a mapInPandas kernel), not a bigger word list.

All words are lowercase; lang_id lowercases text before matching.
"""

from __future__ import annotations

STOPWORDS: dict[str, list[str]] = {
    "en": [
        "the", "a", "an", "and", "of", "to", "in", "is", "it", "you",
        "that", "he", "was", "for", "on", "are", "as", "with", "his",
        "they", "at", "be", "this", "have", "from", "or", "had", "by",
        "but", "not", "what", "all", "were", "we", "when", "your", "can",
        "there", "which", "she", "do", "how", "their", "if", "will",
    ],
    "es": [
        "el", "la", "los", "las", "de", "del", "que", "y", "a", "en",
        "un", "una", "ser", "es", "se", "no", "por", "con", "su", "para",
        "como", "estar", "tener", "le", "lo", "todo", "pero", "más",
        "hacer", "o", "poder", "decir", "este", "esta", "ir", "otro",
        "ese", "si", "me", "ya", "porque", "muy", "sin", "sobre",
        "también", "hasta", "donde", "desde", "nos", "cuando",
    ],
    "de": [
        "der", "die", "das", "und", "in", "den", "von", "zu", "mit",
        "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein",
        "eine", "als", "auch", "es", "an", "werden", "aus", "er", "hat",
        "dass", "sie", "nach", "wird", "bei", "einer", "um", "am",
        "sind", "noch", "wie", "einem", "über", "so", "zum", "war",
        "haben", "nur", "oder", "aber", "vor", "zur", "bis",
    ],
    "fr": [
        "le", "la", "les", "de", "des", "et", "en", "un", "une", "du",
        "que", "est", "pour", "qui", "dans", "par", "plus", "pas", "au",
        "sur", "ne", "se", "ce", "il", "elle", "sont", "comme", "mais",
        "avec", "tout", "nous", "sa", "son", "ses", "ou", "si", "leur",
        "y", "dont", "été", "cette", "aux", "vous", "je", "tu", "avait",
        "lui", "être", "avoir", "veut",
    ],
    "it": [
        "di", "e", "il", "la", "che", "in", "a", "per", "un", "una",
        "è", "del", "della", "con", "non", "le", "si", "da", "come",
        "lo", "i", "al", "dei", "delle", "questo", "questa", "più",
        "anche", "ma", "sono", "ha", "hanno", "nel", "nella", "gli",
        "se", "o", "quando", "essere", "avere", "loro", "suo", "sua",
        "alla", "tra", "fra", "dopo", "dove", "molto", "perché",
    ],
    "pt": [
        "de", "a", "o", "que", "e", "do", "da", "em", "um", "uma",
        "para", "é", "com", "não", "os", "as", "no", "na", "por",
        "mais", "dos", "das", "como", "mas", "foi", "ao", "ele", "ela",
        "tem", "à", "seu", "sua", "ou", "ser", "quando", "muito", "há",
        "nos", "já", "está", "eu", "também", "só", "pelo", "pela",
        "até", "isso", "entre", "depois", "sem",
    ],
    "nl": [
        "de", "het", "een", "van", "en", "in", "is", "dat", "op", "te",
        "zijn", "voor", "met", "die", "niet", "aan", "er", "om", "ook",
        "als", "dan", "maar", "bij", "of", "uit", "nu", "naar", "door",
        "over", "hij", "zij", "ze", "wat", "nog", "wel", "geen", "zo",
        "kan", "worden", "heeft", "hebben", "werd", "tot", "deze",
        "dit", "mijn", "je", "hun", "onder",
    ],
    "sv": [
        "och", "i", "att", "det", "som", "en", "ett", "på", "är", "av",
        "för", "med", "till", "den", "har", "de", "inte", "om", "han",
        "hon", "men", "var", "jag", "sig", "från", "vi", "så", "kan",
        "när", "ska", "skulle", "honom", "henne", "detta", "dessa",
        "mot", "under", "efter", "upp", "ut", "vid", "man", "sin",
        "sitt", "sina", "här", "där", "vad", "alla", "sedan",
    ],
    "ru": [
        "и", "в", "не", "на", "я", "он", "с", "что", "а", "по", "это",
        "она", "этот", "к", "но", "они", "мы", "как", "из", "у",
        "который", "то", "за", "свой", "весь", "год", "от", "так", "о",
        "для", "ты", "же", "все", "тем", "или", "если", "время",
        "когда", "только", "бы", "вот", "быть", "был", "была", "были",
        "его", "их", "них", "есть", "потому",
    ],
    "pl": [
        "i", "w", "nie", "na", "się", "z", "do", "to", "że", "a", "o",
        "jak", "ale", "po", "co", "tak", "za", "od", "jest", "czy",
        "być", "przez", "już", "tylko", "jego", "jej", "ich", "może",
        "było", "był", "która", "który", "które", "bardzo", "przy",
        "bez", "przed", "nad", "pod", "między", "gdy", "kiedy", "też",
        "także", "więc", "dla", "oraz", "są", "ma", "bo",
    ],
}


def lexicon_rows() -> list[tuple[str, str]]:
    """(lang, word) rows — the table form for broadcast-join matching."""
    return [(lang, w) for lang, ws in STOPWORDS.items() for w in ws]


def lexicon_values_sql() -> str:
    """DuckDB VALUES clause mirroring lexicon_rows() (oracle side)."""
    vals = ", ".join(
        f"('{lang}', '{w}')" for lang, ws in STOPWORDS.items() for w in ws
    )
    return f"(VALUES {vals}) AS lex(lang, word)"
