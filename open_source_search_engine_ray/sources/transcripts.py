"""Deterministic synthetic multi-turn transcripts (FIXTURES.md §1).

Schema is exactly the ``input_hint`` shape from BASELINE.json:
``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]``.

Generation is a pure function of (seed, conv index) so any partitioning of
the conv-id range produces identical rows — the Ray source is
``ray.data.range(n_conv)`` + ``map_batches`` and scales by streaming; the
driver-side table variant reuses the same batch function.

Vocabulary model (FIXTURES.md §1):
- 10,000 words ``w0000..w9999`` sampled Zipf(s=1.1) → hot head terms for the
  salted-repartition path, rare tail terms for WAND pruning;
- 20 fixed stopwords injected with p=0.3 between words;
- an edge-case token inventory injected every 7th turn (tokenizer goldens);
- role/tool marker terms (``roleonlyterm_assistant`` …) planted only in
  turns of that role → per-field weighting tests;
- the first sentence of a conversation is repeated in its last turn when the
  conversation has ≥4 turns (repeated-fragment analogue).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

SEED = 42
VOCAB_SIZE = 10_000
ZIPF_S = 1.1
EPOCH_US = np.int64(1767225600000000)  # 2026-01-01T00:00:00Z in microseconds

STOP_INJECT = ["the", "to", "be", "or", "not", "of", "and", "a", "in", "is",
               "it", "that", "for", "on", "with", "as", "at", "by", "an", "we"]

EDGE_SENTENCES = [
    "we're sure dave's code is fine",
    "C++ and c# and java++ rock",
    "the cd-rom and e-mail era",
    "prices 1,000 and 3.14 and 1-2 and 8",
    "café naïve résumé quality",
    "日本語test mixed script",
    "i'm told we're ready",
]

ROLE_MARKERS = {
    "user": "roleonlyterm_user",
    "assistant": "roleonlyterm_assistant",
    "tool": "roleonlyterm_tool",
    "system": "roleonlyterm_system",
}

TOOLS = ["bash", "search", "browser", "editor"]

_MIX = np.uint64(2654435761)


def n_conv_for_sf(sf_dir: str) -> int:
    """Scale mapping (FIXTURES.md §1): smoke 200, correctness 5k, bench 50k."""
    if "sf0.001" in sf_dir:
        return 200
    if "sf0.01" in sf_dir:
        return 5_000
    if "sf0.1" in sf_dir:
        return 50_000
    return 5_000


def _zipf_cumprobs() -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_S)
    p /= p.sum()
    return np.cumsum(p)


_ZIPF_CUM = _zipf_cumprobs()
_VOCAB = np.array([f"w{i:04d}" for i in range(VOCAB_SIZE)])


def n_turns_for_conv(i: int) -> int:
    return 1 + int((np.uint64(i) * _MIX) % np.uint64(12))


def _role_for(i: int, t: int) -> str:
    r = int((np.uint64(i) * _MIX + np.uint64(t) * np.uint64(97)) % np.uint64(100))
    if r < 40:
        return "user"
    if r < 80:
        return "assistant"
    if r < 95:
        return "tool"
    return "system"


def _turn_text(rng: np.random.Generator, i: int, t: int, role: str,
               first_sentence: list[str]) -> str:
    n_words = int(rng.integers(4, 24))
    picks = _VOCAB[np.searchsorted(_ZIPF_CUM, rng.random(n_words))]
    words: list[str] = []
    stop_draws = rng.random(n_words)
    stop_picks = rng.integers(0, len(STOP_INJECT), n_words)
    for k in range(n_words):
        words.append(str(picks[k]))
        if stop_draws[k] < 0.3:
            words.append(STOP_INJECT[int(stop_picks[k])])
    parts = [" ".join(words) + "."]
    # edge-case inventory every 7th turn, cycling deterministically
    if (i * 31 + t) % 7 == 0:
        parts.append(EDGE_SENTENCES[(i + t) % len(EDGE_SENTENCES)] + ".")
    # role marker terms (field-weighting signal), sparse
    if (i + t) % 13 == 0:
        parts.append(ROLE_MARKERS[role] + ".")
    if t == 0:
        first_sentence.append(parts[0])
    return " ".join(parts)


# the transcripts input contract (input_hint): every source and every
# zero-row fallback must produce exactly this schema
TRANSCRIPTS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("us")),
])


def generate_conv_rows(conv_indices: np.ndarray) -> pa.Table:
    """Rows for the given conversation indices (pure, deterministic)."""
    conv_id, turn_idx, role, text, tool, ts = [], [], [], [], [], []
    for i in map(int, conv_indices):
        rng = np.random.default_rng([SEED, i])
        nt = n_turns_for_conv(i)
        first_sentence: list[str] = []
        for t in range(nt):
            r = _role_for(i, t)
            body = _turn_text(rng, i, t, r, first_sentence)
            if t == nt - 1 and nt >= 4 and first_sentence:
                body = body + " " + first_sentence[0]
            conv_id.append(f"conv-{i:08d}")
            turn_idx.append(t)
            role.append(r)
            text.append(body)
            tool.append(TOOLS[(i + t) % len(TOOLS)] if r == "tool" else None)
            ts.append(int(EPOCH_US) + i * 3_600_000_000 + t * 7_000_000)
    return pa.table({
        "conv_id": pa.array(conv_id, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(role, pa.string()),
        "text": pa.array(text, pa.string()),
        "tool": pa.array(tool, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    }).cast(TRANSCRIPTS_SCHEMA)


def _gen_batch(batch: pa.Table) -> pa.Table:
    return generate_conv_rows(batch["id"].to_numpy())


def transcripts_dataset(n_conv: int, *, shuffle: bool = False,
                        override_num_blocks: int | None = None):
    """Streaming Ray Dataset of synthetic transcripts."""
    import ray.data

    blocks = override_num_blocks or max(8, min(512, n_conv // 2000 or 8))
    ds = ray.data.range(n_conv, override_num_blocks=blocks)
    ds = ds.map_batches(_gen_batch, batch_format="pyarrow")
    if shuffle:
        ds = ds.random_shuffle(seed=SEED)
    return ds


def transcripts_dataset_range(start: int, stop: int, *,
                              override_num_blocks: int | None = None):
    """Dataset over a conv-index range [start, stop) — incremental ingest."""
    import ray.data

    blocks = override_num_blocks or max(4, min(64, (stop - start) // 2000 or 4))
    ds = ray.data.range(stop - start, override_num_blocks=blocks)

    def gen(batch: pa.Table) -> pa.Table:
        return generate_conv_rows(batch["id"].to_numpy() + start)

    return ds.map_batches(gen, batch_format="pyarrow")


def transcripts_table(n_conv: int) -> pa.Table:
    """Driver-side table (tests / oracle) — identical rows to the Dataset."""
    return generate_conv_rows(np.arange(n_conv))


def transcripts_parquet(n_conv: int, root: str = "/tmp/osse_transcripts"):
    """Materialize the synthetic corpus to partitioned Parquet once and
    return a read factory — the realistic input shape (``input_hint``: the
    corpus is a Parquet table on shared storage; the build reads it with
    column pruning rather than re-running the generator per pass)."""
    import ray.data

    path = os.path.join(root, f"n{n_conv}")
    marker = os.path.join(path, "_COMPLETE")
    if not os.path.exists(marker):
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        transcripts_dataset(n_conv).write_parquet(path)
        with open(marker, "w") as f:
            f.write("ok")
    return lambda: ray.data.read_parquet(path)
