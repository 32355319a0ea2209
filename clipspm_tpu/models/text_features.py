"""Prompt-ensemble text feature precompute.

The reference encodes 16 prompt templates x every class name with one
``encode_text`` call per (template, class) in a python loop at module init
(reference: models/model_clipspm.py:44-70). Here all prompts tokenize into a
single ``[16*C, 77]`` batch and one jitted ``encode_text`` call produces the
table; the template mean gives ``[C, D]`` features. The table is computed
once per config and carried as plain device arrays (not parameters).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .backbones.clip import CLIPModel
from .backbones.tokenizer import tokenize, SimpleTokenizer

# The 16-template prompt ensemble (reference: models/model_clipspm.py:45-49).
PROMPT_TEMPLATES: List[str] = [
    "a photo of action {}", "a picture of action {}", "Human action of {}",
    "{}, an action", "{} this is an action", "{}, a video of action",
    "Playing action of {}", "{}", "Playing a kind of action, {}",
    "Doing a kind of action, {}", "Look, the human is {}",
    "Can you recognize the action of {}?", "Video classification of {}",
    "A video of {}", "The man is {}", "The woman is {}",
]

# Single-template variant used by clipfsar/sten
# (reference: models/model_clipfsar.py:118-124 "a photo of {}").
SINGLE_TEMPLATE = ["a photo of {}"]


def encode_class_text_features(model: CLIPModel, variables,
                               class_names: Sequence[str],
                               templates: Optional[Sequence[str]] = None,
                               tokenizer: Optional[SimpleTokenizer] = None,
                               batch_size: int = 512) -> jnp.ndarray:
    """Returns the ``[num_classes, embed_dim]`` template-averaged table."""
    templates = list(templates or PROMPT_TEMPLATES)
    prompts = [t.format(name) for t in templates for name in class_names]
    if tokenizer is None and model.arch.vocab_size != 49408:
        # non-standard (test) vocab: build a tokenizer whose ids fit the
        # model's token embedding table
        tokenizer = SimpleTokenizer(vocab_size=model.arch.vocab_size)
    tokens = tokenize(prompts, context_length=model.arch.context_length,
                      truncate=True, tokenizer=tokenizer)

    encode = jax.jit(lambda toks: model.apply(
        variables, toks, method=model.encode_text))
    feats = []
    for i in range(0, tokens.shape[0], batch_size):
        feats.append(encode(jnp.asarray(tokens[i: i + batch_size])))
    table = jnp.concatenate(feats, axis=0)
    table = table.reshape(len(templates), len(class_names), -1)
    return table.mean(axis=0)
