"""Recognizer character set. Index 0 is the CTC blank."""
from __future__ import annotations

# Printable ASCII plus the symbols textbooks actually use.
# (Round-1 shipped a duplicate '%' as the final symbol — the intended
# per-mille sign — which left class 6 unreachable from encode(); fixed to
# '‰' and the recognizer retrained, ADVICE round-1 item 3.)
CHARS = (
    " !\"#$%&'()*+,-./0123456789:;<=>?@"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ[\\]^_`"
    "abcdefghijklmnopqrstuvwxyz{|}~"
    "€£¥°±×÷–—‘’“”•‰"
)

BLANK = 0
CHAR_TO_ID = {c: i + 1 for i, c in enumerate(CHARS)}
ID_TO_CHAR = {i + 1: c for i, c in enumerate(CHARS)}
NUM_CLASSES = len(CHARS) + 1  # + blank


def encode(text: str, max_len: int) -> tuple[list[int], int]:
    """Text -> (padded id list, true length); unknown chars are dropped."""
    ids = [CHAR_TO_ID[c] for c in text if c in CHAR_TO_ID][:max_len]
    n = len(ids)
    return ids + [0] * (max_len - n), n


def decode_greedy(best_ids) -> str:
    """Collapse repeats then strip blanks (standard CTC greedy decode)."""
    out = []
    prev = -1
    for i in best_ids:
        i = int(i)
        if i != prev and i != BLANK:
            out.append(ID_TO_CHAR.get(i, ""))
        prev = i
    return "".join(out)


# lookup table for the batched decode: id -> char ('' for blank/OOR)
_LUT = None


def decode_greedy_batch(best: "object") -> list[str]:
    """Vectorized CTC greedy decode of an (N, T) int array.

    One numpy pass computes the keep mask (frame differs from its
    predecessor and is non-blank) for the whole batch; per row only the
    kept ids hit Python. ~10x cheaper than per-tile decode_greedy on the
    1-core host (the bench decodes ~15k tiles/book)."""
    import numpy as np

    global _LUT
    if _LUT is None:
        lut = np.array([""] + list(CHARS), dtype=object)
        _LUT = lut
    best = np.asarray(best)
    if best.ndim == 1:
        best = best[None]
    keep = np.empty(best.shape, dtype=bool)
    keep[:, 0] = best[:, 0] != BLANK
    keep[:, 1:] = (best[:, 1:] != best[:, :-1]) & (best[:, 1:] != BLANK)
    safe = np.where(best < len(_LUT), best, 0)
    return [
        "".join(_LUT[safe[i][keep[i]]]) for i in range(best.shape[0])
    ]
