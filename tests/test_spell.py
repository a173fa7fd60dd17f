"""Spell suggester: SymSpell deletion-neighborhood lookup over the
corpus vocabulary, popularity-ranked (Speller.cpp:19-54 analogue)."""

import shutil

import pytest

IDX = "/tmp/idx_spell_test"


@pytest.fixture(scope="module")
def spell_index(ray_session):
    from open_source_search_engine_ray.index.build import build_index
    from open_source_search_engine_ray.query.spell import build_vocab
    from open_source_search_engine_ray.sources.transcripts import (
        transcripts_dataset)

    shutil.rmtree(IDX, ignore_errors=True)
    build_index(lambda: transcripts_dataset(300), IDX,
                input_token="synthetic:n=300")
    build_vocab(IDX)
    yield IDX
    shutil.rmtree(IDX, ignore_errors=True)


def test_planted_typos(spell_index):
    from open_source_search_engine_ray.query.spell import SpellSuggester

    sp = SpellSuggester(spell_index)

    # exact vocab word: itself at distance 0, first
    s = sp.suggest("w0042")
    assert s[0][0] == "w0042" and s[0][1] == 0

    # transposition of an injected stopword (Damerau distance 1)
    s = sp.suggest("teh")
    top_d1 = [w for w, d, _ in s if d == 1]
    assert "the" in top_d1

    # single-char deletion: among all distance-1 completions of "w042"
    # the most POPULAR (Zipf head = lowest number) must rank first
    s = sp.suggest("w042")
    assert s[0][0] == "w0042" and s[0][1] == 1

    # insertion typo: distance-1 candidates are {w0042, w0022, w0422}
    # (three single-char deletions of the typo) — the MOST POPULAR of
    # them (lowest Zipf index = w0022) must rank first, and w0042 must
    # be present at distance 1
    s = sp.suggest("w00422")
    assert s[0] == ("w0022", 1, s[0][2])
    assert ("w0042", 1) in [(w, d) for w, d, _ in s]

    # garbage beyond max_edit: no candidates
    assert sp.suggest("zzzzzzzzzz") == []


def test_correct_query(spell_index):
    from open_source_search_engine_ray.query.spell import SpellSuggester

    sp = SpellSuggester(spell_index)
    assert sp.correct_query("w042 teh w0007") == "w0042 the w0007"


def test_popularity_ordering_matches_corpus(spell_index):
    """cf must be the real corpus count: Zipf head words dominate."""
    from open_source_search_engine_ray.query.spell import SpellSuggester

    sp = SpellSuggester(spell_index)
    assert sp.cf_of["w0000"] > sp.cf_of["w5000"]


def test_vocab_missing_raises(tmp_path):
    from open_source_search_engine_ray.query.spell import SpellSuggester

    with pytest.raises(FileNotFoundError):
        SpellSuggester(str(tmp_path))
