"""Seeded per-language word models for fixtures and model training.

The fixture transcripts, the langid training corpus, and the
perplexity-LM training corpus all come from these generators so the
whole system is closed and deterministic (no downloads, FIXTURES.md F1).
Word lists are small sets of common words per language — enough to give
each language a distinct character n-gram signature.
"""

from __future__ import annotations

import numpy as np

WORDS: dict[str, tuple[str, ...]] = {
    "en": (
        "the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
        "on", "are", "with", "as", "his", "they", "be", "at", "one", "have",
        "this", "from", "or", "had", "by", "word", "but", "not", "what",
        "all", "were", "we", "when", "your", "can", "said", "there", "use",
        "each", "which", "she", "do", "how", "their", "if", "will", "up",
        "other", "about", "out", "many", "then", "them", "these", "so",
        "some", "her", "would", "make", "like", "him", "into", "time",
        "has", "look", "two", "more", "write", "go", "see", "number",
        "way", "could", "people", "my", "than", "first", "water", "been",
        "call", "who", "oil", "its", "now", "find", "long", "down", "day",
        "did", "get", "come", "made", "may", "part", "over", "new", "sound",
        "take", "only", "little", "work", "know", "place", "year", "live",
        "me", "back", "give", "most", "very", "after", "thing", "our",
        "just", "name", "good", "sentence", "man", "think", "say", "great",
        "where", "help", "through", "much", "before", "line", "right",
        "too", "mean", "old", "any", "same", "tell", "boy", "follow",
        "came", "want", "show", "also", "around", "form", "three", "small",
    ),
    "de": (
        "der", "die", "und", "in", "den", "von", "zu", "das", "mit",
        "sich", "des", "auf", "für", "ist", "im", "dem", "nicht", "ein",
        "eine", "als", "auch", "es", "an", "werden", "aus", "er", "hat",
        "dass", "sie", "nach", "wird", "bei", "einer", "um", "am", "sind",
        "noch", "wie", "einem", "über", "einen", "so", "zum", "war",
        "haben", "nur", "oder", "aber", "vor", "zur", "bis", "mehr",
        "durch", "man", "sein", "wurde", "sei", "wenn", "können", "schon",
        "diese", "dann", "unter", "wir", "soll", "ich", "jahr", "zwei",
        "gegen", "vom", "kann", "doch", "jetzt", "ihre", "seiner", "alle",
        "wieder", "meine", "zeit", "gut", "wurden", "recht", "viel",
        "diesem", "keine", "heute", "dieser", "weil", "ihr", "seine",
        "muss", "damit", "etwa", "drei", "ganz", "sehr", "hier", "anderen",
        "ohne", "wurde", "leben", "welt", "könnte", "während", "müssen",
    ),
    "fr": (
        "le", "de", "un", "être", "et", "à", "il", "avoir", "ne", "je",
        "son", "que", "se", "qui", "ce", "dans", "en", "du", "elle", "au",
        "pour", "pas", "vous", "par", "sur", "faire", "plus", "dire",
        "me", "on", "mon", "lui", "nous", "comme", "mais", "pouvoir",
        "avec", "tout", "y", "aller", "voir", "bien", "où", "sans", "tu",
        "ou", "leur", "homme", "si", "deux", "mari", "moi", "vouloir",
        "te", "femme", "venir", "quand", "grand", "celui", "si", "notre",
        "devoir", "là", "jour", "prendre", "même", "votre", "rien",
        "petit", "aussi", "chose", "dont", "très", "donner", "bon",
        "autre", "après", "chez", "bien", "seulement", "alors", "toujours",
        "temps", "monde", "cette", "savoir", "falloir", "encore", "trois",
        "fois", "sous", "parler", "entre", "demander", "toute", "année",
        "trouver", "donc", "depuis", "premier", "aimer", "croire", "vie",
    ),
    "ja": (
        # romanized japanese (romaji) — distinct n-gram signature
        "watashi", "anata", "kare", "kanojo", "kore", "sore", "are",
        "desu", "masu", "arimasu", "imasu", "shimasu", "ikimasu",
        "tabemasu", "nomimasu", "mimasu", "kikimasu", "hanashimasu",
        "gakkou", "sensei", "gakusei", "tomodachi", "kazoku", "kaisha",
        "nihon", "tokyo", "kyou", "ashita", "kinou", "ima", "jikan",
        "ichi", "ni", "san", "yon", "go", "roku", "nana", "hachi",
        "kyuu", "juu", "hyaku", "sen", "man", "hon", "mizu", "ocha",
        "gohan", "sakana", "niku", "yasai", "kudamono", "densha",
        "kuruma", "jitensha", "eki", "michi", "ie", "heya", "mado",
        "genki", "oishii", "takai", "yasui", "atarashii", "furui",
        "ookii", "chiisai", "hayai", "osoi", "atsui", "samui", "ii",
        "warui", "suki", "kirai", "jouzu", "heta", "benri", "taihen",
        "arigatou", "sumimasen", "konnichiwa", "sayounara", "ohayou",
        "oyasumi", "onegai", "shimashita", "deshita", "nai", "kara",
        "made", "node", "kedo", "demo", "soshite", "sorekara", "totemo",
    ),
}

LANGS = tuple(sorted(WORDS))


def make_sentence(rng: np.random.Generator, lang: str, n_words: int) -> str:
    words = WORDS[lang]
    idx = rng.integers(0, len(words), size=n_words)
    return " ".join(words[i] for i in idx)


def make_text(rng: np.random.Generator, lang: str, n_chars: int) -> str:
    """Seeded text of roughly n_chars in the given language."""
    parts: list[str] = []
    total = 0
    while total < n_chars:
        s = make_sentence(rng, lang, int(rng.integers(4, 12)))
        parts.append(s)
        total += len(s) + 2
    return ". ".join(parts) + "."


_GIBBERISH_CHARS = np.array(list("abcdefghijklmnopqrstuvwxyzqxzjvkw0123456789"))


def make_gibberish(rng: np.random.Generator, n_chars: int) -> str:
    """High-perplexity character soup (the 'non-sense read' analogue)."""
    chars = _GIBBERISH_CHARS[rng.integers(0, len(_GIBBERISH_CHARS), size=n_chars)]
    out = []
    i = 0
    while i < n_chars:
        wl = int(rng.integers(2, 9))
        out.append("".join(chars[i : i + wl]))
        i += wl
    return " ".join(out)


def make_repetitive(rng: np.random.Generator, lang: str, n_chars: int) -> str:
    """Transcript dominated by a repeated short phrase (SDUST-positive)."""
    phrase = make_sentence(rng, lang, 2)
    reps = max(n_chars // (len(phrase) + 1), 6)
    return " ".join([phrase] * reps)


def make_corpus(lang: str, n_sentences: int, seed: int) -> list[str]:
    """Deterministic training corpus for langid / LM models."""
    from .text import fnv1a_64

    # NB: not builtins.hash — that is randomized per process
    rng = np.random.default_rng(seed + fnv1a_64(lang.encode()) % 1000)
    return [make_sentence(rng, lang, int(rng.integers(5, 15))) for _ in range(n_sentences)]
