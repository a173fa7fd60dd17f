"""Ragged-array helpers: per-doc variable-length position lists stored as
(flat values, offsets) pairs, manipulated with numpy gathers instead of
per-doc Python loops."""

from __future__ import annotations

import numpy as np


def ragged_arange(lens: np.ndarray) -> np.ndarray:
    """[0..l0), [0..l1), ... concatenated."""
    lens = np.asarray(lens, dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return np.zeros(0, dtype=np.int64)
    ids = np.arange(total, dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return ids - np.repeat(offs, lens)


def ragged_select(flat: np.ndarray, offsets: np.ndarray,
                  sel: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Select/reorder segments ``sel`` (indices) → new (flat, offsets)."""
    offsets = np.asarray(offsets, dtype=np.int64)
    lens = offsets[1:] - offsets[:-1]
    lens_sel = lens[sel]
    idx = np.repeat(offsets[:-1][sel], lens_sel) + ragged_arange(lens_sel)
    new_offsets = np.concatenate([[0], np.cumsum(lens_sel)])
    return flat[idx], new_offsets


def ragged_concat(parts: list[tuple[np.ndarray, np.ndarray]]
                  ) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate (flat, offsets) pairs."""
    if not parts:
        return np.zeros(0, dtype=np.uint64), np.zeros(1, dtype=np.int64)
    flats = [p[0] for p in parts]
    lens = np.concatenate([np.diff(np.asarray(p[1], dtype=np.int64))
                           for p in parts])
    return (np.concatenate(flats),
            np.concatenate([[0], np.cumsum(lens)]).astype(np.int64))
