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
