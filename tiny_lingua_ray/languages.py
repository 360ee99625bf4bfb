"""Language inventory: 75 languages + "unknown".

Reference parity: the enum table in
/root/reference/src/main/kotlin/com/github/pemistahl/lingua/api/Language.kt:186-273
(declaration order, ISO codes, Unicode scripts, uniqueCharacters) and the
derived sets at Language.kt:288-312 (allScripts,
scriptsSupportingExactlyOneLanguage).

Languages are identified by ISO-639-1 code strings throughout the engine
("en", "de", ...; "unknown" for Language.UNKNOWN).  The reference's enum
*declaration order* is preserved as ``RANK`` — it is the tie-break key for
confidence sorting (internal/util/EnumDoubleMap.kt:91-121).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LanguageInfo:
    name: str          # reference enum constant name (e.g. "AFRIKAANS")
    iso1: str          # ISO-639-1
    iso3: str          # ISO-639-3
    scripts: tuple[str, ...]
    unique_chars: str | None = None


# Declaration order matters (tie-breaking). Scripts use Java UnicodeScript names.
LANGUAGES: tuple[LanguageInfo, ...] = (
    LanguageInfo("AFRIKAANS", "af", "afr", ("LATIN",)),
    LanguageInfo("ALBANIAN", "sq", "sqi", ("LATIN",)),
    LanguageInfo("ARABIC", "ar", "ara", ("ARABIC",)),
    LanguageInfo("ARMENIAN", "hy", "hye", ("ARMENIAN",)),
    LanguageInfo("AZERBAIJANI", "az", "aze", ("LATIN",), "Əə"),
    LanguageInfo("BASQUE", "eu", "eus", ("LATIN",)),
    LanguageInfo("BELARUSIAN", "be", "bel", ("CYRILLIC",)),
    LanguageInfo("BENGALI", "bn", "ben", ("BENGALI",)),
    LanguageInfo("BOKMAL", "nb", "nob", ("LATIN",)),
    LanguageInfo("BOSNIAN", "bs", "bos", ("LATIN",)),
    LanguageInfo("BULGARIAN", "bg", "bul", ("CYRILLIC",)),
    LanguageInfo("CATALAN", "ca", "cat", ("LATIN",), "Ïï"),
    LanguageInfo("CHINESE", "zh", "zho", ("HAN",)),
    LanguageInfo("CROATIAN", "hr", "hrv", ("LATIN",)),
    LanguageInfo("CZECH", "cs", "ces", ("LATIN",), "ĚěŘřŮů"),
    LanguageInfo("DANISH", "da", "dan", ("LATIN",)),
    LanguageInfo("DUTCH", "nl", "nld", ("LATIN",)),
    LanguageInfo("ENGLISH", "en", "eng", ("LATIN",)),
    LanguageInfo("ESPERANTO", "eo", "epo", ("LATIN",), "ĈĉĜĝĤĥĴĵŜŝŬŭ"),
    LanguageInfo("ESTONIAN", "et", "est", ("LATIN",)),
    LanguageInfo("FINNISH", "fi", "fin", ("LATIN",)),
    LanguageInfo("FRENCH", "fr", "fra", ("LATIN",)),
    LanguageInfo("GANDA", "lg", "lug", ("LATIN",)),
    LanguageInfo("GEORGIAN", "ka", "kat", ("GEORGIAN",)),
    LanguageInfo("GERMAN", "de", "deu", ("LATIN",), "ß"),
    LanguageInfo("GREEK", "el", "ell", ("GREEK",)),
    LanguageInfo("GUJARATI", "gu", "guj", ("GUJARATI",)),
    LanguageInfo("HEBREW", "he", "heb", ("HEBREW",)),
    LanguageInfo("HINDI", "hi", "hin", ("DEVANAGARI",)),
    LanguageInfo("HUNGARIAN", "hu", "hun", ("LATIN",), "ŐőŰű"),
    LanguageInfo("ICELANDIC", "is", "isl", ("LATIN",)),
    LanguageInfo("INDONESIAN", "id", "ind", ("LATIN",)),
    LanguageInfo("IRISH", "ga", "gle", ("LATIN",)),
    LanguageInfo("ITALIAN", "it", "ita", ("LATIN",)),
    LanguageInfo("JAPANESE", "ja", "jpn", ("HIRAGANA", "KATAKANA", "HAN")),
    LanguageInfo("KAZAKH", "kk", "kaz", ("CYRILLIC",), "ӘәҒғҚқҢңҰұ"),
    LanguageInfo("KOREAN", "ko", "kor", ("HANGUL",)),
    LanguageInfo("LATIN", "la", "lat", ("LATIN",)),
    LanguageInfo("LATVIAN", "lv", "lav", ("LATIN",), "ĢģĶķĻļŅņ"),
    LanguageInfo("LITHUANIAN", "lt", "lit", ("LATIN",), "ĖėĮįŲų"),
    LanguageInfo("MACEDONIAN", "mk", "mkd", ("CYRILLIC",), "ЃѓЅѕЌќЏџ"),
    LanguageInfo("MALAY", "ms", "msa", ("LATIN",)),
    LanguageInfo("MAORI", "mi", "mri", ("LATIN",)),
    LanguageInfo("MARATHI", "mr", "mar", ("DEVANAGARI",), "ळ"),
    LanguageInfo("MONGOLIAN", "mn", "mon", ("CYRILLIC",), "ӨөҮү"),
    LanguageInfo("NYNORSK", "nn", "nno", ("LATIN",)),
    LanguageInfo("PERSIAN", "fa", "fas", ("ARABIC",)),
    LanguageInfo("POLISH", "pl", "pol", ("LATIN",), "ŁłŃńŚśŹź"),
    LanguageInfo("PORTUGUESE", "pt", "por", ("LATIN",)),
    LanguageInfo("PUNJABI", "pa", "pan", ("GURMUKHI",)),
    LanguageInfo("ROMANIAN", "ro", "ron", ("LATIN",), "Țţ"),
    LanguageInfo("RUSSIAN", "ru", "rus", ("CYRILLIC",)),
    LanguageInfo("SERBIAN", "sr", "srp", ("CYRILLIC",), "ЂђЋћ"),
    LanguageInfo("SHONA", "sn", "sna", ("LATIN",)),
    LanguageInfo("SLOVAK", "sk", "slk", ("LATIN",), "ĹĺĽľŔŕ"),
    LanguageInfo("SLOVENE", "sl", "slv", ("LATIN",)),
    LanguageInfo("SOMALI", "so", "som", ("LATIN",)),
    LanguageInfo("SOTHO", "st", "sot", ("LATIN",)),
    LanguageInfo("SPANISH", "es", "spa", ("LATIN",), "¿¡"),
    LanguageInfo("SWAHILI", "sw", "swa", ("LATIN",)),
    LanguageInfo("SWEDISH", "sv", "swe", ("LATIN",)),
    LanguageInfo("TAGALOG", "tl", "tgl", ("LATIN",)),
    LanguageInfo("TAMIL", "ta", "tam", ("TAMIL",)),
    LanguageInfo("TELUGU", "te", "tel", ("TELUGU",)),
    LanguageInfo("THAI", "th", "tha", ("THAI",)),
    LanguageInfo("TSONGA", "ts", "tso", ("LATIN",)),
    LanguageInfo("TSWANA", "tn", "tsn", ("LATIN",)),
    LanguageInfo("TURKISH", "tr", "tur", ("LATIN",)),
    LanguageInfo("UKRAINIAN", "uk", "ukr", ("CYRILLIC",), "ҐґЄєЇї"),
    LanguageInfo("URDU", "ur", "urd", ("ARABIC",)),
    LanguageInfo(
        "VIETNAMESE", "vi", "vie", ("LATIN",),
        "ẰằẦầẲẳẨẩẴẵẪẫẮắẤấẠạẶặẬậỀềẺẻỂểẼẽỄễẾếỆệỈỉĨĩỊịƠơỒồỜờỎỏỔổỞởỖỗỠỡỐốỚớỘộỢợ"
        "ƯưỪừỦủỬửŨũỮữỨứỤụỰựỲỳỶỷỸỹỴỵ",
    ),
    LanguageInfo("WELSH", "cy", "cym", ("LATIN",)),
    LanguageInfo("XHOSA", "xh", "xho", ("LATIN",)),
    LanguageInfo("YORUBA", "yo", "yor", ("LATIN",), "Ṣṣ"),
    LanguageInfo("ZULU", "zu", "zul", ("LATIN",)),
)

UNKNOWN = "unknown"

# iso1 codes in declaration order; RANK = declaration index (tie-break key).
ALL_ISO1: tuple[str, ...] = tuple(li.iso1 for li in LANGUAGES)
RANK: dict[str, int] = {iso1: i for i, iso1 in enumerate(ALL_ISO1)}
RANK[UNKNOWN] = len(ALL_ISO1)  # UNKNOWN declared last in the reference enum

BY_ISO1: dict[str, LanguageInfo] = {li.iso1: li for li in LANGUAGES}
BY_NAME: dict[str, LanguageInfo] = {li.name: li for li in LANGUAGES}
ISO1_BY_NAME: dict[str, str] = {li.name: li.iso1 for li in LANGUAGES}

# ISO-639-3 code system (api/IsoCode639_3.kt; Language.kt:178-273 carries
# both code enums per language).  "unknown" maps to NONE's lowercase form.
ISO3_BY_ISO1: dict[str, str] = {li.iso1: li.iso3 for li in LANGUAGES}
ISO3_BY_ISO1[UNKNOWN] = "none"
BY_ISO3: dict[str, LanguageInfo] = {li.iso3: li for li in LANGUAGES}

# All scripts used by any language (Language.kt:288-293).
ALL_SCRIPTS: tuple[str, ...] = tuple(
    sorted({s for li in LANGUAGES for s in li.scripts})
)

# Script -> the single language using it, for scripts used by exactly one
# language (Language.kt:295-312).
_script_langs: dict[str, list[str]] = {}
for _li in LANGUAGES:
    for _s in _li.scripts:
        _script_langs.setdefault(_s, []).append(_li.iso1)
SCRIPTS_SUPPORTING_EXACTLY_ONE_LANGUAGE: dict[str, str] = {
    s: langs[0] for s, langs in _script_langs.items() if len(langs) == 1
}

# Languages whose script set contains each script (for filterLanguagesByRules).
LANGUAGES_BY_SCRIPT: dict[str, frozenset[str]] = {
    s: frozenset(langs) for s, langs in _script_langs.items()
}

LANGUAGES_SUPPORTING_LOGOGRAMS: frozenset[str] = frozenset({"zh", "ja", "ko"})

# Scripts of the logogram languages (CharExtensions.kt:24-38).
SCRIPTS_WITH_LOGOGRAMS: frozenset[str] = frozenset(
    s for iso1 in LANGUAGES_SUPPORTING_LOGOGRAMS for s in BY_ISO1[iso1].scripts
)

# Diacritic/letter -> candidate languages (internal/Constant.kt:73-144).
_CHARS_TO_LANGUAGE_NAMES: dict[str, tuple[str, ...]] = {
    "Ãã": ("PORTUGUESE", "VIETNAMESE"),
    "ĄąĘę": ("LITHUANIAN", "POLISH"),
    "Żż": ("POLISH", "ROMANIAN"),
    "Îî": ("FRENCH", "ROMANIAN"),
    "Ññ": ("BASQUE", "SPANISH"),
    "ŇňŤť": ("CZECH", "SLOVAK"),
    "Ăă": ("ROMANIAN", "VIETNAMESE"),
    "İıĞğ": ("AZERBAIJANI", "TURKISH"),
    "ЈјЉљЊњ": ("MACEDONIAN", "SERBIAN"),
    "ẸẹỌọ": ("VIETNAMESE", "YORUBA"),
    "ÐðÞþ": ("ICELANDIC", "TURKISH"),
    "Ûû": ("FRENCH", "HUNGARIAN"),
    "Ōō": ("MAORI", "YORUBA"),
    "ĀāĒēĪī": ("LATVIAN", "MAORI", "YORUBA"),
    "Şş": ("AZERBAIJANI", "ROMANIAN", "TURKISH"),
    "Ďď": ("CZECH", "ROMANIAN", "SLOVAK"),
    "Ćć": ("BOSNIAN", "CROATIAN", "POLISH"),
    "Đđ": ("BOSNIAN", "CROATIAN", "VIETNAMESE"),
    "Іі": ("BELARUSIAN", "KAZAKH", "UKRAINIAN"),
    "Ìì": ("ITALIAN", "VIETNAMESE", "YORUBA"),
    "Øø": ("BOKMAL", "DANISH", "NYNORSK"),
    "Ūū": ("LATVIAN", "LITHUANIAN", "MAORI", "YORUBA"),
    "Ëë": ("AFRIKAANS", "ALBANIAN", "DUTCH", "FRENCH"),
    "ÈèÙù": ("FRENCH", "ITALIAN", "VIETNAMESE", "YORUBA"),
    "Êê": ("AFRIKAANS", "FRENCH", "PORTUGUESE", "VIETNAMESE"),
    "Õõ": ("ESTONIAN", "HUNGARIAN", "PORTUGUESE", "VIETNAMESE"),
    "Ôô": ("FRENCH", "PORTUGUESE", "SLOVAK", "VIETNAMESE"),
    "ЁёЫыЭэ": ("BELARUSIAN", "KAZAKH", "MONGOLIAN", "RUSSIAN"),
    "ЩщЪъ": ("BULGARIAN", "KAZAKH", "MONGOLIAN", "RUSSIAN"),
    "Òò": ("CATALAN", "ITALIAN", "VIETNAMESE", "YORUBA"),
    "Ææ": ("BOKMAL", "DANISH", "ICELANDIC", "NYNORSK"),
    "Åå": ("BOKMAL", "DANISH", "NYNORSK", "SWEDISH"),
    "Ýý": ("CZECH", "ICELANDIC", "SLOVAK", "TURKISH", "VIETNAMESE"),
    "Ää": ("ESTONIAN", "FINNISH", "GERMAN", "SLOVAK", "SWEDISH"),
    "Àà": ("CATALAN", "FRENCH", "ITALIAN", "PORTUGUESE", "VIETNAMESE"),
    "Ââ": ("FRENCH", "PORTUGUESE", "ROMANIAN", "TURKISH", "VIETNAMESE"),
    "Üü": ("AZERBAIJANI", "CATALAN", "ESTONIAN", "GERMAN", "HUNGARIAN",
           "SPANISH", "TURKISH"),
    "ČčŠšŽž": ("BOSNIAN", "CZECH", "CROATIAN", "LATVIAN", "LITHUANIAN",
               "SLOVAK", "SLOVENE"),
    "Çç": ("ALBANIAN", "AZERBAIJANI", "BASQUE", "CATALAN", "FRENCH",
           "PORTUGUESE", "TURKISH"),
    "Öö": ("AZERBAIJANI", "ESTONIAN", "FINNISH", "GERMAN", "HUNGARIAN",
           "ICELANDIC", "SWEDISH", "TURKISH"),
    "Óó": ("CATALAN", "HUNGARIAN", "ICELANDIC", "IRISH", "POLISH",
           "PORTUGUESE", "SLOVAK", "SPANISH", "VIETNAMESE", "YORUBA"),
    "ÁáÍíÚú": ("CATALAN", "CZECH", "ICELANDIC", "IRISH", "HUNGARIAN",
               "PORTUGUESE", "SLOVAK", "SPANISH", "VIETNAMESE", "YORUBA"),
    "Éé": ("CATALAN", "CZECH", "FRENCH", "HUNGARIAN", "ICELANDIC", "IRISH",
           "ITALIAN", "PORTUGUESE", "SLOVAK", "SPANISH", "VIETNAMESE",
           "YORUBA"),
}

CHARS_TO_LANGUAGES_MAPPING: dict[str, tuple[str, ...]] = {}
for _chars, _names in _CHARS_TO_LANGUAGE_NAMES.items():
    _iso = tuple(ISO1_BY_NAME[n] for n in _names)
    for _c in _chars:
        CHARS_TO_LANGUAGES_MAPPING[_c] = _iso
