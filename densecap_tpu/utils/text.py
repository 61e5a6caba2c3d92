"""Token <-> string utilities (reference LanguageModel:decodeSequence,
LanguageModel.lua:86-103, and DataLoader:decodeSequence)."""

from __future__ import annotations

import numpy as np


def decode_sequence(seq, idx_to_token, vocab_size):
    """(N, T) int tokens -> list of N strings.

    Stops at END (= vocab_size + 1) or 0; joins with spaces.
    idx_to_token: dict mapping int (or str of int) -> token string.
    """
    end = vocab_size + 1
    seq = np.asarray(seq)
    out = []
    for row in seq:
        words = []
        for idx in row:
            idx = int(idx)
            if idx == end or idx == 0:
                break
            tok = idx_to_token.get(idx, idx_to_token.get(str(idx), "<UNK>"))
            words.append(tok)
        out.append(" ".join(words))
    return out
