"""Fuzz-compare the Python Snowball stemmers against the reference
engine's compiled stemmers (driven via node) — behavior parity check.

Usage: python tools/stem_fuzz.py [de|es|fr] [n_words]
Prints mismatches (word, ours, reference) and a summary line.
"""

import json
import random
import string
import subprocess
import sys

sys.path.insert(0, "/root/repo")

NODE_DRIVER = """
const words = JSON.parse(require('fs').readFileSync(process.argv[2], 'utf8'));
import(process.argv[1]).then(m => {
  console.log(JSON.stringify(words.map(w => m.stemmer(w))));
});
"""

SUFFIXES = {
    "de": [
        "e", "em", "en", "ern", "er", "es", "s", "est", "st", "end",
        "ung", "ig", "ik", "isch", "lich", "heit", "keit", "igkeit",
        "lichkeit", "ungen", "erungen", "igung", "nisse", "nis", "ens",
        "erin", "ler", "chen",
    ],
    "es": [
        "o", "a", "os", "as", "e", "es", "anza", "icos", "ismo", "able",
        "ista", "oso", "amiento", "adora", "ación", "aciones", "ante",
        "ancia", "logía", "ución", "encia", "amente", "mente", "idad",
        "iva", "ivo", "ar", "er", "ir", "ando", "iendo", "ado", "ido",
        "aba", "ía", "ará", "ería", "iría", "aste", "aron", "ieron",
        "amos", "áis", "emos", "an", "en", "ó", "í", "yendo", "ya", "yó",
        "selo", "sela", "melo", "se", "me", "los", "las", "nos", "uciones",
        "amientos", "ísimo", "mente",
    ],
    "fr": [
        "e", "es", "s", "ance", "iqUe".lower(), "isme", "able", "iste",
        "eux", "ances", "atrice", "ateur", "ation", "logie", "usion",
        "ution", "ence", "ement", "ements", "ité", "ive", "ifs", "eaux",
        "aux", "euse", "euses", "issement", "amment", "emment", "ment",
        "ments", "ir", "issais", "issant", "isse", "ira", "irent", "i",
        "ie", "ies", "it", "ît", "ions", "é", "ée", "ées", "és", "èrent",
        "er", "era", "erai", "eraient", "ez", "iez", "a", "ai", "aient",
        "ais", "ait", "ant", "ante", "antes", "asse", "assent", "âmes",
        "âtes", "ion", "ier", "ière", "elle", "ette", "enne", "onne",
        "eille", "ç", "gu", "guë",
    ],
    "pt": [
        "o", "a", "os", "as", "e", "es", "eza", "icos", "ismo", "ável",
        "ível", "ista", "oso", "amento", "imento", "adora", "ação",
        "ações", "ante", "ância", "logia", "ução", "ência", "amente",
        "mente", "idade", "iva", "ivo", "ira", "ar", "er", "ir", "ando",
        "endo", "indo", "ado", "ido", "ava", "ia", "ará", "eria", "iria",
        "aste", "aram", "eram", "amos", "emos", "íamos", "am", "em",
        "ou", "eu", "iu", "ção", "ções", "ãos", "ã", "õe",
    ],
    "it": [
        "o", "a", "i", "e", "anza", "ico", "iche", "ismo", "abile",
        "ibile", "ista", "oso", "mente", "atrice", "ante", "azione",
        "azioni", "atore", "logia", "uzione", "usione", "enza",
        "amento", "imento", "amente", "ità", "ivo", "iva", "ando",
        "endo", "ar", "er", "ir", "ammo", "arono", "asse", "ava", "erà",
        "erebbe", "eremmo", "erono", "eva", "iamo", "irà", "ire",
        "isca", "isce", "isco", "issero", "ita", "ito", "ono", "uto",
        "gli", "cela", "sene", "glielo", "ci", "mi", "ch", "gh", "qu",
        "andolo", "endoci",
    ],
    "nl": [
        "heden", "ene", "en", "se", "s", "e", "heid", "end", "ing",
        "ig", "lijk", "baar", "bar", "je", "tje", "kk", "dd", "tt",
        "aar", "eer", "oor", "uur", "aat", "eet", "oot", "igheid",
        "elijk", "igend",
    ],
    "ru": [
        "в", "вши", "вшись", "ив", "ывши", "ее", "ими", "ей", "ого",
        "ому", "их", "ую", "яя", "ем", "нн", "вш", "ющ", "щ", "ивш",
        "ующ", "ся", "сь", "ла", "ете", "йте", "ли", "ешь", "нно",
        "ила", "ена", "ейте", "уйте", "или", "ует", "уют", "ить",
        "ишь", "й", "л", "н", "иями", "ями", "ами", "ией", "иям",
        "ием", "иях", "ия", "ью", "ов", "ие", "ье", "и", "о", "у",
        "ы", "ь", "ю", "я", "а", "е", "ость", "ост", "ейше", "ейш",
        "ать", "ять", "еть", "анн", "авши", "аем", "ающ", "ьейше",
    ],
    "ie": [
        "íochta", "aíochta", "ire", "aire", "abh", "eabh", "ibh",
        "aibh", "amh", "eamh", "imh", "aimh", "íocht", "aíocht",
        "irí", "airí", "óideacha", "patacha", "achta", "arcachta",
        "eachta", "grafaíochta", "paite", "ach", "each", "óideach",
        "gineach", "patach", "grafaíoch", "pataigh", "óidigh",
        "achtúil", "eachtúil", "gineas", "ginis", "acht", "arcacht",
        "eacht", "grafaíocht", "arcachtaí", "grafaíochtaí", "imid",
        "aimid", "ímid", "aímid", "adh", "eadh", "faidh", "fidh",
        "áil", "ain", "tear", "tar", "a", "e", "í",
    ],
    "hu": [
        "al", "el", "ba", "ra", "be", "re", "ig", "nak", "nek", "val",
        "vel", "ul", "nál", "nél", "ból", "ról", "tól", "ül", "ből",
        "ről", "től", "n", "an", "ban", "en", "ben", "képpen", "on",
        "ön", "képp", "kor", "t", "at", "et", "ként", "anként",
        "enként", "onként", "ot", "ért", "öt", "hez", "hoz", "höz",
        "vá", "vé", "án", "én", "ánként", "stul", "astul", "ástul",
        "stül", "estül", "éstül", "á", "é", "éi", "áéi", "ééi", "ké",
        "aké", "eké", "oké", "áké", "éké", "öké", "éé", "a", "ja",
        "d", "ad", "ed", "od", "ád", "éd", "öd", "e", "je", "nk",
        "unk", "ánk", "énk", "ünk", "uk", "juk", "ájuk", "ük", "jük",
        "éjük", "m", "am", "em", "om", "ám", "ém", "o", "id", "aid",
        "jaid", "eid", "jeid", "áid", "éid", "i", "ai", "jai", "ei",
        "jei", "ái", "itek", "eitek", "jeitek", "éitek", "ik", "aik",
        "jaik", "eik", "jeik", "áik", "éik", "ink", "aink", "jaink",
        "eink", "jeink", "áink", "éink", "aitok", "jaitok", "áitok",
        "im", "aim", "jaim", "eim", "jeim", "áim", "éim", "k", "ak",
        "ek", "ok", "ök", "ák", "ék", "ll", "tt", "ss", "bb", "ccs",
        "ssz", "lly",
    ],
    "fi": [
        "pa", "sti", "kaan", "han", "kin", "hän", "kään", "ko", "pä",
        "kö", "nsa", "nsä", "mme", "nne", "ni", "si", "an", "en", "än",
        "lla", "na", "ssa", "ta", "lta", "sta", "tta", "lle", "ine",
        "ksi", "n", "den", "seen", "hen", "tten", "hin", "siin", "hon",
        "hän", "hön", "a", "ä", "llä", "nä", "ssä", "tä", "ltä", "stä",
        "ttä", "eja", "mma", "imma", "mpa", "impa", "mmi", "immi",
        "mpi", "impi", "ejä", "mmä", "immä", "mpä", "impä", "i", "j",
        "t", "at", "it", "ien", "ssaan", "llaan", "staan", "taan",
        "kseen", "ksineen", "ineen", "iin", "isiin", "poa", "pommi",
        "tt", "ll", "kk", "aa", "ee", "ii", "oo", "uu", "ää", "öö",
        "ie", "oj", "jo",
    ],
    "tr": [
        "lar", "ler", "leri", "ları", "ni", "nu", "nü", "nı", "in",
        "un", "ün", "ın", "a", "e", "na", "ne", "da", "ta", "de",
        "te", "nda", "nde", "dan", "tan", "den", "ten", "ndan",
        "nden", "la", "le", "ca", "ce", "im", "um", "üm", "ım",
        "sin", "sun", "sün", "sın", "iz", "uz", "üz", "ız", "siniz",
        "sunuz", "sünüz", "sınız", "niz", "nuz", "nüz", "nız", "dir",
        "tir", "dur", "tur", "dür", "tür", "dır", "tır", "casına",
        "cesine", "di", "ti", "dik", "tik", "duk", "tuk", "dük",
        "tük", "dık", "tık", "dim", "tim", "dum", "tum", "düm",
        "tüm", "dım", "tım", "din", "tin", "dün", "tün", "dın",
        "tın", "du", "tu", "dü", "tü", "dı", "tı", "sa", "se", "sak",
        "sek", "sam", "sem", "san", "sen", "miş", "muş", "müş",
        "mış", "ken", "ki", "kiler", "kilerden", "m", "n", "miz",
        "niz", "muz", "nuz", "müz", "nüz", "mız", "nız", "ydi",
        "ydı", "ymuş", "ymış", "yse", "ysa", "yken", "yi", "yu",
        "yü", "yı", "ya", "ye", "larını", "lerini", "larından",
        "lerinden", "sındaki", "indeki", "daki", "deki", "teki",
        "taki", "ndaki", "sinde", "sında", "larında", "lerinde",
    ],
}





SUFFIXES["ta"] = [
    "கள்", "ட்கள்", "ற்கள்", "ுங்கள்", "ா", "ே", "ோ", "பி", "வி",
    "ும்", "ுடன்", "ில்லை", "ிடம்", "ின்றி", "ாகி", "ாகிய",
    "ென்று", "ுள்ள", "ுடைய", "ுடை", "ெனும்", "ல்ல", "ென",
    "பட்ட", "பட்டண", "தான்", "படிதான்", "குரிய", "படி", "பற்றி",
    "படு", "விடு", "பட்டு", "விட்டு", "பட்டது", "ெல்லாம்", "னை",
    "ினை", "ை", "ொடு", "ோடு", "ில்", "ிற்", "ின்", "ின்று",
    "ிருந்து", "விட", "ால்", "ாமல்", "ல்", "ுள்", "கண்", "முன்",
    "மேல்", "மேற்", "கீழ்", "பின்", "து", "ீ", "கொண்டிர்", "மார்",
    "மின்", "னன்", "னான்", "னாள்", "னார்", "வன்", "னள்", "வள்",
    "னர்", "வர்", "ன", "ப", "க", "த", "ய", "பன்", "பள்", "பர்",
    "ிற்று", "பம்", "னம்", "தும்", "றும்", "கும்", "னென்", "வை",
    "ான்", "ாள்", "ார்", "ேன்", "ாம்", "ெம்", "ேம்", "ோம்",
    "டும்", "ாய்", "னிர்", "ீர்", "ீயர்", "கு", "கிற", "கின்ற",
    "ாநின்ற", "கிற்", "கின்ற்", "ந்த்", "ந்த", "ந்", "ய்", "ட்ப்",
    "ட்க்", "ன்ற்", "ற்க்", "ட்ட்", "த்த்", "ுக்", "ுக்க்", "வ்",
    "னு", "ங்", "்", "எக்", "அக்", "இத்", "உப்", "வோ", "வொ", "வு",
    "வூ", "ும்கள்",
]

SUFFIXES["gr"] = [
    "ιζα", "ιζε", "ιζαμε", "ιζουμε", "ιζανε", "ιζουνε", "ιζατε",
    "ιζετε", "ιζει", "ιζαν", "ιζουν", "ιζεσ", "ιζεισ", "ιζω",
    "ωθηκα", "ωθηκε", "ωθηκαμε", "ωθηκανε", "ωθηκατε", "ωθηκαν",
    "ωθηκεσ", "ισα", "ισαμε", "ισανε", "ισε", "ισατε", "ισαν",
    "ισεσ", "ισουμε", "ισουνε", "ισετε", "ισει", "ισουν", "ισεισ",
    "ισω", "ιστα", "ιστε", "ιστη", "ιστοι", "ιστων", "ιστο",
    "ιστεσ", "ιστησ", "ιστοσ", "ιστουσ", "ιστου", "ισμοι", "ισμων",
    "ισμο", "ισμοσ", "ισμουσ", "ισμου", "ουδακια", "αρακια",
    "ουδακι", "αρακι", "ακια", "ιτσα", "ακι", "ιτσων", "ιτσασ",
    "ιτσεσ", "ιδια", "ιδιων", "ιδιο", "ισκε", "ισκο", "ισκοσ",
    "ισκου", "αδων", "αδεσ", "εδων", "εδεσ", "ουδων", "ουδεσ",
    "εων", "εωσ", "ια", "ιων", "ιου", "ικα", "ικων", "ικο",
    "ικου", "αγαμε", "ηκαμε", "ηθηκαμε", "ησαμε", "ουσαμε", "αμε",
    "αγανε", "ηκανε", "ηθηκανε", "ησανε", "ουσανε", "οντανε",
    "ιοντανε", "ουντανε", "ιουντανε", "οτανε", "ιοτανε", "ανε",
    "ησετε", "ετε", "οντασ", "ωντασ", "ομαστε", "ιομαστε", "ιεστε",
    "εστε", "ηθηκα", "ηθηκε", "ηθηκεσ", "ηκα", "ηκε", "ηκεσ",
    "ουσα", "ουσε", "ουσεσ", "ησα", "ησε", "ησου", "αγα", "αγε",
    "αγεσ", "ηστε", "ουνε", "ηθουνε", "ησουνε", "ουμε", "ηθουμε",
    "ησουμε", "ματα", "ματων", "ματοσ", "α", "ε", "η", "ι", "ο",
    "οσ", "εσ", "ασ", "ωσ", "ου", "ων", "ομαι", "εται", "ονται",
    "ομουν", "οσουν", "οταν", "ομασταν", "οσασταν", "οτερ",
    "εστερ", "υτερ", "ωτερ", "οτατ", "εστατ", "υτατ", "ωτατ",
    "φαγια", "σκαγια", "ολογια", "κρεατα", "περατα", "γεγονοτα",
    "καθεστωτα", "φωτα",
]

SUFFIXES["ar"] = [
    "\u0643", "\u0647", "\u064a", "\u0646\u0627", "\u0647\u0627", "\u0643\u0645", "\u0647\u0645", "\u0647\u0646", "\u0643\u0645\u0627", "\u0647\u0645\u0627",
    "\u0643\u0646", "\u0646\u064a", "\u0643\u0645\u0648", "\u0627", "\u062a", "\u062a\u0627", "\u062a\u0645\u0627", "\u062a\u0646", "\u0627\u0646", "\u0648\u0646",
    "\u064a\u0646", "\u0648", "\u062a\u0645\u0648", "\u0648\u0627", "\u062a\u0645", "\u0629", "\u0646", "\u0627\u062a", "\u0649",
]

SUFFIXES["rs"] = [
    'a', 'acak', 'acasmo', 'aceg', 'acem', 'acoj', 'ahu', 'ajac',
    'ajaka', 'ajeve', 'aji', 'am', 'ama', 'anem', 'ani', 'anih',
    'anim', 'anjac', 'anjem', 'anjija', 'ano', 'anog', 'anoj', 'anom',
    'are', 'arom', 'asta', 'astadu', 'astaneš', 'astome', 'astući',
    'atan', 'atcima', 'avajući', 'avan', 'ačat', 'aše', 'bija',
    'bilan', 'bojci', 'caje', 'centar', 'centara', 'cinoga', 'cinome',
    'dijom', 'dušan', 'e', 'ece', 'eceg', 'ecih', 'ecome', 'ecuh',
    'ekat', 'elim', 'elom', 'ena', 'enat', 'eni', 'enih', 'enim',
    'eno', 'enog', 'enoj', 'enom', 'enu', 'eran', 'evan', 'evao',
    'evi', 'evito', 'evo', 'fijima', 'ganijama', 'gasem', 'i', 'ije',
    'ijega', 'ijemu', 'ijte', 'iju', 'ima', 'injalo', 'injao',
    'injat', 'inom', 'irajuci', 'iral', 'irala', 'istade',
    'istadoše', 'istajasmo', 'istajaste', 'istala', 'iti', 'ivaste',
    'ivati', 'ivem', 'ivim', 'izam', 'izama', 'jaci', 'jacima',
    'jasa', 'jasem', 'je', 'jetila', 'jetile', 'jetilo', 'kasu',
    'kije', 'ko', 'kstima', 'kuse', 'laran', 'latima', 'lemama',
    'luce', 'lucene', 'luci', 'manijom', 'metar', 'mova', 'move',
    'movi', 'nasima', 'naša', 'nem', 'nijim', 'niju', 'njaca', 'o',
    'og', 'oga', 'ojac', 'ojaka', 'ojsci', 'olac', 'olaca', 'ole',
    'olovima', 'om', 'ost', 'ostaješ', 'ostama', 'ostaneš',
    'ostanila', 'ostima', 'ostom', 'ovah', 'ovao', 'ove', 'ovijima',
    'ozan', 'ošega', 'ošijemu', 'ošću', 'panijama', 'pletan', 'r',
    'rr', 'sac', 'save', 'snjijem', 'stavan', 'tasmo', 'tašu',
    'tetici', 'teticima', 'tilan', 'u', 'ucih', 'ucoga', 'ucomu',
    'ugom', 'uraše', 'usak', 'utcima', 'ućem', 'voljan', 'zijama',
    'zije', 'ćajama', 'činama', 'šaca', 'škemu', 'škijega',
    'škoga', 'škoj', 'šnjoj',
]

PREFIX_AR = [
    "بال", "كال", "ال", "لل", "ف", "و", "ب", "با", "بب", "كك",
    "سي", "ست", "سن", "سأ", "تست", "نست", "يست", "أأ", "أآ", "أؤ",
    "أإ", "أا",
]

ALPH = {
    "de": "abcdefghijklmnopqrstuvwzäöüß",
    "es": "abcdefghijlmnopqrstuvzáéíóúüñ",
    "fr": "abcdefghijlmnopqrstuvzâàëéêèïîôûùçy",
    "pt": "abcdefghijlmnopqrstuvzáéíóúâêôãõç",
    "it": "abcdefghijlmnopqrstuvzàèìòùáéíóú",
    "nl": "abcdefghijklmnopqrstuvwzyäéëïöü",
    "ru": "абвгдежзиклмнопрстуфхцчшщыьэюя",
    "ie": "abcdefghilmnoprstuáéíóú",
    "hu": "abcdefghijklmnoprstuvzáéíóöúüőű",
    "fi": "abdeghijklmnoprstuvyäö",
    "tr": "abcçdefgğhıijklmnoöprsştuüvyz",
    "ar": "ءآأؤإئابةتثجحخدذرزسشصضطظعغفقكلمنهوىي",
    "gr": "αβγδεζηθικλμνξοπρστυφχψωάέήίόύώΑΒΓΕΣΤςϊΐ",
    "ta": "கஙசஞடணதநபமயரலவழளறனஜஷஸஹஅஆஇஈஉஊஎஏஐஒஓஔாிீுூெேைொோௌ்",
    # latin serbian (incl. diacritics) + cyrillic to exercise the
    # transliteration pass; digraph sources lj/nj/dj appear via random
    # combination
    "rs": "abcdefghijklmnoprstuvzćčđšžабвгдђежзијклљмнњопрстћуфхцчџш",
}

# optional word-initial mutation prefixes, applied with p=0.4
PREFIXES = {
    "ar": PREFIX_AR,
    "ta": ["எக்", "எச்", "எத்", "எப்", "அக்", "அச்", "அத்", "அப்",
           "இக்", "இச்", "இத்", "இப்", "உக்", "உத்", "எங்", "அவ்",
           "இந்", "அம்", "வோ", "வு"],
    "ie": [
        "b'", "bh", "bhf", "bp", "ch", "d'", "d'fh", "dh", "dt", "fh",
        "gc", "gh", "h-", "m'", "mb", "mh", "n-", "nd", "ng", "ph",
        "sh", "t-", "th", "ts",
    ],
}


def gen_words(lang: str, n: int, seed: int = 7):
    rng = random.Random(seed)
    alph = ALPH[lang]
    sufs = SUFFIXES[lang]
    out = set()
    while len(out) < n:
        stem_len = rng.randint(1, 8)
        stem = "".join(rng.choice(alph) for _ in range(stem_len))
        word = stem + rng.choice(sufs) if rng.random() < 0.85 else stem
        if rng.random() < 0.15:
            word += rng.choice(sufs)
        pres = PREFIXES.get(lang)
        if pres and rng.random() < 0.4:
            word = rng.choice(pres) + word
        out.add(word)
    return sorted(out)


def ref_stems(lang: str, words):
    import tempfile, os

    with tempfile.NamedTemporaryFile(
        "w", suffix=".json", delete=False
    ) as f:
        json.dump(words, f)
        path = f.name
    try:
        out = subprocess.run(
            ["node", "-e", NODE_DRIVER,
             f"/root/reference/src/lib/stemmers/{lang}.js", path],
            capture_output=True, text=True, check=True, timeout=120,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])
    finally:
        os.unlink(path)


def main():
    lang = sys.argv[1] if len(sys.argv) > 1 else "de"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    from search_engine_ray.analysis.snowball import SNOWBALL_STEMMERS

    fn = SNOWBALL_STEMMERS[lang]
    words = gen_words(lang, n)
    ref = ref_stems(lang, words)
    bad = []
    for w, r in zip(words, ref):
        ours = fn(w)
        if ours != r:
            bad.append((w, ours, r))
    for w, o, r in bad[:40]:
        print(f"  {w!r}: ours={o!r} ref={r!r}")
    print(
        f"{lang}: {len(words) - len(bad)}/{len(words)} match "
        f"({100 * (1 - len(bad) / len(words)):.2f}%)"
    )


if __name__ == "__main__":
    main()
