"""UDF indexing hooks (functions/hooks.py): the WantedChecker plugin-API
analogue (``WantedCheckerApi.h``, ``UrlBlockCheck.cpp:72-81``,
``Msg13.cpp:1168``) — conversation gate, turn content gate, text
transform — applied at the input factory and shared with the oracle."""

import shutil

import pyarrow as pa

from open_source_search_engine_ray.functions.ghash import doc_id_for_conv
from open_source_search_engine_ray.functions.hooks import (
    IndexHooks, apply_hooks_batch)
from open_source_search_engine_ray.query.oracle import OracleIndex


def _mk(rows):
    conv_id, turn_idx, role, text, tool = [], [], [], [], []
    for c, t, r, x in rows:
        conv_id.append(c)
        turn_idx.append(t)
        role.append(r)
        text.append(x)
        tool.append("bash" if r == "tool" else None)
    return pa.table({
        "conv_id": pa.array(conv_id),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(role), "text": pa.array(text),
        "tool": pa.array(tool, pa.string()),
        "ts": pa.array([0] * len(rows), pa.timestamp("us")),
    })


HOOKS = IndexHooks(
    name="test-wanted", version="1",
    check_conversation=lambda c: not c.startswith("spam"),
    check_turn=lambda c, r, tool, t: "casino" not in t,
    transform_text=lambda t: t.replace("SECRET", "[redacted]"),
)


def test_apply_hooks_batch():
    b = _mk([("okA", 0, "user", "hello SECRET world"),
             ("spamB", 0, "user", "hello"),
             ("okC", 0, "user", "visit casino now"),
             ("okC", 1, "user", "fine turn")])
    out = apply_hooks_batch(b, HOOKS)
    assert out["conv_id"].to_pylist() == ["okA", "okC"]
    assert out["text"].to_pylist() == ["hello [redacted] world", "fine turn"]


def test_oracle_hooks_change_corpus():
    rows = [("spamX", 0, "user", "target word"),
            ("okY", 0, "user", "target elsewhere"),
            ("okZ", 0, "user", "casino target"),
            ("okZ", 1, "user", "other text")]
    plain = OracleIndex(_mk(rows))
    hooked = OracleIndex(_mk(rows), hooks=HOOKS)
    assert plain.n_docs == 3
    assert hooked.n_docs == 2                    # spamX gone entirely
    d, _ = hooked.search("target", 5)
    assert doc_id_for_conv("spamX") not in d
    assert doc_id_for_conv("okZ") not in d       # its only 'target' turn cut


def test_engine_oracle_identity_and_fingerprint(ray_session, tmp_path):
    import ray.data

    from open_source_search_engine_ray.index.build import build_index
    from open_source_search_engine_ray.query.engine import IndexSearcher
    from open_source_search_engine_ray.sources.transcripts import (
        transcripts_dataset, transcripts_table)

    idx = str(tmp_path / "idx_hooks")
    shutil.rmtree(idx, ignore_errors=True)
    hooks = IndexHooks(
        name="drop-tool-turns", version="7",
        check_turn=lambda c, r, tool, t: r != "tool",
        transform_text=lambda t: t.lower())
    meta = build_index(lambda: transcripts_dataset(100), idx,
                       input_token="synthetic:n=100", hooks=hooks)
    se = IndexSearcher(idx)
    o = OracleIndex(transcripts_table(100), hooks=hooks)
    assert se.n_docs == o.n_docs
    for q in ("error timeout", "the file", '"not found"', "role:user fix"):
        d1, s1 = se.search(q, 10)
        d2, s2 = o.search(q, 10)
        assert list(d1) == list(d2), q
        assert list(s1) == list(s2), q
    # no tool-field postings survive the gate
    d, _ = se.search("tool:bash", 10)
    assert len(d) == 0
    # version bump → different fingerprint (stale resume state invalid)
    shutil.rmtree(idx, ignore_errors=True)
    meta2 = build_index(lambda: transcripts_dataset(100), idx,
                        input_token="synthetic:n=100",
                        hooks=IndexHooks(name="drop-tool-turns", version="8",
                                         check_turn=hooks.check_turn,
                                         transform_text=hooks.transform_text))
    assert meta["fingerprint"] != meta2["fingerprint"]
