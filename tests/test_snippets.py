"""Snippet/highlight assembly (Msg20/Summary/Highlight analogue)."""

import shutil

import pytest

from open_source_search_engine_ray.index.build import build_index
from open_source_search_engine_ray.query.snippets import search_with_snippets
from open_source_search_engine_ray.sources.transcripts import (
    transcripts_dataset)

IDX = "/tmp/osse_snip_idx"


@pytest.fixture(scope="module")
def snip_index(ray_session):
    shutil.rmtree(IDX, ignore_errors=True)
    build_index(lambda: transcripts_dataset(200), IDX,
                input_token="snip:n=200")
    return IDX


def test_snippets_highlight_query_terms(snip_index):
    res = search_with_snippets(snip_index, "w0002", k=5).to_pylist()
    assert len(res) == 5
    for r in res:
        assert r["conv_id"].startswith("conv-")
        assert "<b>w0002</b>" in r["snippet"]
        assert r["snippet_role"] in ("user", "assistant", "tool", "system")


def test_snippets_marker_term_role(snip_index):
    res = search_with_snippets(snip_index, "roleonlyterm_assistant",
                               k=3).to_pylist()
    assert len(res) >= 1
    for r in res:
        # the marker is only planted in assistant turns; underscore is
        # punctuation (Words.cpp semantics) so it tokenizes as two terms
        assert r["snippet_role"] == "assistant"
        assert "<b>roleonlyterm</b>" in r["snippet"]


def test_snippets_empty_query(snip_index):
    assert search_with_snippets(snip_index, "zzqqxoov", k=5).num_rows == 0
