"""Snowball stemmers (de/es/fr/pt/it/nl/ru/se/no/dk): golden-vector
parity with the reference engine's compiled stemmers, plus build/query
integration of language-aware stemming (reference
Stemmer.ts/SnowballStemmer.ts dispatch semantics)."""

import json

import pyarrow as pa
import pytest

from search_engine_ray.analysis.light_stemmers import (
    armenian_stem,
    bulgarian_stem,
    hindi_stem,
    indonesian_stem,
    lithuanian_stem,
    nepali_stem,
    romanian_stem,
    sanskrit_stem,
    ukrainian_stem,
)
from search_engine_ray.analysis.snowball import (
    CachedStemmer,
    danish_stem,
    dutch_stem,
    french_stem,
    german_stem,
    italian_stem,
    norwegian_stem,
    portuguese_stem,
    russian_stem,
    spanish_stem,
    stemmer_for_lang,
    swedish_stem,
    irish_stem,
    hungarian_stem,
    finnish_stem,
    turkish_stem,
    arabic_stem,
    greek_stem,
    tamil_stem,
    serbian_stem,
)

GOLDEN = json.load(open("tests/golden/snowball_vectors.json"))
FUZZ = json.load(open("tests/golden/snowball_fuzz_vectors.json"))
FNS = {
    "de": german_stem,
    "es": spanish_stem,
    "fr": french_stem,
    "pt": portuguese_stem,
    "it": italian_stem,
    "nl": dutch_stem,
    "ru": russian_stem,
    "se": swedish_stem,
    "no": norwegian_stem,
    "dk": danish_stem,
    "bg": bulgarian_stem,
    "uk": ukrainian_stem,
    "id": indonesian_stem,
    "ro": romanian_stem,
    "in": hindi_stem,
    "sk": sanskrit_stem,
    "np": nepali_stem,
    "am": armenian_stem,
    "lt": lithuanian_stem,
    "ie": irish_stem,
    "hu": hungarian_stem,
    "fi": finnish_stem,
    "tr": turkish_stem,
    "ar": arabic_stem,
    "gr": greek_stem,
    "ta": tamil_stem,
    "rs": serbian_stem,
}
LANGS = sorted(FNS)


@pytest.mark.parametrize("lang", LANGS)
def test_golden_vectors(lang):
    fn = FNS[lang]
    bad = [(w, fn(w), want) for w, want in GOLDEN[lang] if fn(w) != want]
    assert not bad, bad


@pytest.mark.parametrize("lang", LANGS)
def test_fuzz_vectors(lang):
    """500 generated suffix-heavy words per language, expected outputs
    frozen from the reference's compiled Snowball stemmers."""
    fn = FNS[lang]
    bad = [(w, fn(w), want) for w, want in FUZZ[lang] if fn(w) != want]
    assert not bad, bad[:10]


def test_dispatch_and_fallback():
    assert stemmer_for_lang("de")("häuser") == "haus"
    assert stemmer_for_lang("fr")("nationale") == "national"
    assert stemmer_for_lang("es")("corriendo") == "corr"
    assert stemmer_for_lang("pt")("felizmente") == "feliz"
    assert stemmer_for_lang("it")("nazionalità") == "nazional"
    assert stemmer_for_lang("nl")("huizen") == "huiz"
    assert stemmer_for_lang("ru")("организации") == "организац"
    # reference codes se/dk and ISO codes sv/da both dispatch
    assert stemmer_for_lang("sv") is stemmer_for_lang("se")
    assert stemmer_for_lang("da") is stemmer_for_lang("dk")
    # unsupported language falls back to English Porter
    # (SnowballStemmer.ts:26-33)
    assert stemmer_for_lang("xx")("running") == "run"
    assert stemmer_for_lang(None)("running") == "run"


def test_cached_stemmer():
    c = CachedStemmer(cache_size=4)
    assert c.stem("häuser", "de") == "haus"
    assert c.stem("häuser", "de") == "haus"  # cache hit
    assert c.stem_tokens(["kinder", "bücher"], "de") == ["kind", "buch"]
    assert ("häuser", "de") in c.cache


def test_stemming_analyzer_lang_variants():
    from search_engine_ray.analysis.analyzers import tokenize

    # NOTE: the standard analyzer is byte-identical to the reference's
    # (ASCII \w, Tokenizer.ts:176) and the reference's stemming analyzer
    # runs on ITS standard tokens (Tokenizer.ts:401-417) — so non-ASCII
    # letters split words in both engines; use ASCII forms here
    assert tokenize("hauser und kinder", "stemming:de") == [
        "haus", "und", "kind",
    ]
    assert tokenize("running dogs", "stemming") == ["run", "dog"]
    assert tokenize("universidades importantes", "stemming:es") == [
        "univers", "import",
    ]


def test_build_with_stemming_analyzer(tmp_path, ray_session):
    """fields=(('text','stemming:de'),) stems at index time; a searcher
    with stem_lang='de' stems query tokens the same way, so inflected
    query forms match."""
    import pyarrow.parquet as pq

    from search_engine_ray.index_build import BuildConfig, build_index
    from search_engine_ray.query import IndexSearcher

    rows = [
        ("https://de/1", 100, "die hauser der stadte", "de"),
        ("https://de/2", 100, "ein haus am see", "de"),
        ("https://de/3", 100, "kinder lesen bucher", "de"),
    ]
    corpus = tmp_path / "c"
    corpus.mkdir()
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows]),
                "warc_ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),
                "text": pa.array([r[2] for r in rows], pa.large_string()),
                "lang": pa.array([r[3] for r in rows]),
            }
        ),
        str(corpus / "a.parquet"),
    )
    idx = str(tmp_path / "i")
    build_index(
        idx,
        str(corpus),
        BuildConfig(
            fields=(("text", "stemming:de"),),
            extract_html=False,
        ),
    )
    s = IndexSearcher(idx, stem_lang="de")
    # 'hauses' stems to 'haus' → matches both docs containing haus/häuser
    got = s.search({"match": {"field": "text", "value": "hauses"}})
    assert len(got) == 2
    # phrase with inflected forms
    got = s.search({"match_phrase": {"field": "text", "value": "kinder lesen"}})
    assert len(got) == 1
    # unstemmed searcher: the TOKEN path misses (the index carries only
    # stems — 'hauser' stemmed to 'haus'), observable via the string
    # query whose naive branch is token-membership; the dict-form match
    # still finds doc 1 through the naive substring scan over the RAW
    # docstore text ('die hauser der stadte'), exactly like the
    # reference's _stringFieldMatch (QueryEngine.ts:1350-1382)
    s_plain = IndexSearcher(idx)
    assert len(s_plain.search("hauser")) == 0
    got = s_plain.search({"match": {"field": "text", "value": "hauser"}})
    assert len(got) == 1


def test_build_stem_by_lang_dispatch(tmp_path, ray_session):
    """stem_by_lang=True stems each row's text per its lang column —
    German rows with the German stemmer, Spanish with Spanish."""
    import pyarrow.parquet as pq

    from search_engine_ray.index_build import BuildConfig, build_index
    from search_engine_ray.query import IndexSearcher

    rows = [
        ("https://de/1", 100, "die hauser der stadte", "de"),
        ("https://es/1", 100, "las universidades importantes", "es"),
        ("https://en/1", 100, "running dogs everywhere", "en"),
    ]
    corpus = tmp_path / "c"
    corpus.mkdir()
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows]),
                "warc_ts": pa.array(
                    [r[1] for r in rows], pa.timestamp("us")
                ),
                "text": pa.array([r[2] for r in rows], pa.large_string()),
                "lang": pa.array([r[3] for r in rows]),
            }
        ),
        str(corpus / "a.parquet"),
    )
    idx = str(tmp_path / "i")
    build_index(
        idx, str(corpus),
        BuildConfig(extract_html=False, stem_by_lang=True),
    )
    de = IndexSearcher(idx, stem_lang="de")
    assert len(de.search({"match": {"field": "text", "value": "hauses"}})) == 1
    es = IndexSearcher(idx, stem_lang="es")
    assert len(es.search({"match": {"field": "text", "value": "universidad"}})) == 1
    en = IndexSearcher(idx, stem_lang="en")
    assert len(en.search({"match": {"field": "text", "value": "runs"}})) == 1
