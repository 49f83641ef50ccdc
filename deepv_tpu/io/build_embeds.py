"""Build the precomputed action-vocabulary text-embedding cache.

The reference ships ``assets/text_embeds_len77.pt`` (ref pipeline.py:199) —
which is MISSING from the public snapshot (SURVEY.md: .MISSING_LARGE_BLOBS).
Since the action vocabulary is closed (28 sentences, actions.py), the cache
can be regenerated from the checkpoint's own text encoders; this utility does
that with our JAX towers.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from ..actions import action_vocabulary


def build_action_embeds(text_encoder) -> Dict:
    """text_encoder: an SD3TextEncoder (models/text_encoders.py)."""
    cache = {}
    for sentence in action_vocabulary():
        seq, mask, pooled = text_encoder(sentence)
        cache[sentence] = {
            "prompt_embeds": np.asarray(seq, np.float32),
            "prompt_attention_mask": np.asarray(mask, np.int32),
            "pooled_prompt_embeds": np.asarray(pooled, np.float32),
        }
    return cache
