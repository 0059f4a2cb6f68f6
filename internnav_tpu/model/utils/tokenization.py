"""Tokenizer loading helpers.

Reference parity: internnav/model/utils/bert_token.py (BertTokenizer
wrapper) and the HF processor/tokenizer usage in the N1 policy wrapper
(internvla_n1_policy.py uses AutoProcessor). Real checkpoints ship HF
tokenizer files; SimpleTokenizer covers dependency-free tests.
"""

from __future__ import annotations

from typing import Any, List, Optional


def load_hf_tokenizer(path_or_name: str):
    """AutoTokenizer from a local checkpoint dir (no hub egress here)."""
    from transformers import AutoTokenizer

    tok = AutoTokenizer.from_pretrained(path_or_name, local_files_only=True)
    if not hasattr(tok, "SPECIALS"):
        # expose the special map the framework's prompt builders read
        specials = {}
        for name in ("<|im_start|>", "<|im_end|>", "<|vision_start|>",
                     "<|vision_end|>", "<|image_pad|>", "<|traj_pad|>"):
            ids = tok.convert_tokens_to_ids(name)
            if isinstance(ids, int) and ids is not None and ids >= 0:
                specials[name] = ids
        tok.SPECIALS = specials
    return tok


class BertTokenizerWrapper:
    """RoBERTa/BERT tokenizer for the RDP/CMA-CLIP text encoders
    (pad id 1 for roberta), padding to max_length like the reference's
    bert_token.py helper."""

    def __init__(self, path_or_name: str = "roberta-base",
                 max_length: int = 80, pad_token_id: int = 1):
        self.max_length = max_length
        self.pad_token_id = pad_token_id
        try:
            from transformers import AutoTokenizer

            self._tok = AutoTokenizer.from_pretrained(path_or_name,
                                                      local_files_only=True)
            self.pad_token_id = self._tok.pad_token_id or pad_token_id
        except Exception:
            self._tok = None  # hash fallback (tests / no local files)

    def __call__(self, texts: List[str]):
        import numpy as np

        out = np.full((len(texts), self.max_length), self.pad_token_id, np.int32)
        for i, t in enumerate(texts):
            if self._tok is not None:
                ids = self._tok.encode(t, truncation=True,
                                       max_length=self.max_length)
            else:
                ids = [(hash(w) % 49000) + 10 for w in t.split()][: self.max_length]
            out[i, : len(ids)] = ids
        return out
