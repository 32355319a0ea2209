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


def encode_class_text_tables(model: CLIPModel, variables,
                             name_lists: Sequence[Sequence[str]],
                             templates: Optional[Sequence[str]] = None,
                             tokenizer: Optional[SimpleTokenizer] = None,
                             batch_size: int = 512) -> List[jnp.ndarray]:
    """Encode several class-name lists (train + test) in ONE padded-batch
    stream and return one ``[num_classes, embed_dim]`` template-averaged
    table per list.

    Every chunk is padded to a single static ``[b, context]`` shape: a
    remote-TPU compile of the full text tower costs MINUTES per DISTINCT
    batch shape, and the natural shapes all differ (trailing partial
    chunk; train vs test class counts) — encoded separately and unpadded,
    one CLI startup paid up to four text-tower compiles (the dominant
    slice of an ~11-minute ``build_learner``, measured round 5). Padded
    rows cost microseconds of MXU time and are dropped on the spot.
    """
    templates = list(templates or PROMPT_TEMPLATES)
    prompts = [t.format(name) for names in name_lists
               for t in templates for name in names]
    if tokenizer is None and model.arch.vocab_size != 49408:
        # non-standard (test) vocab: build a tokenizer whose ids fit the
        # model's token embedding table
        tokenizer = SimpleTokenizer(vocab_size=model.arch.vocab_size)
    tokens = tokenize(prompts, context_length=model.arch.context_length,
                      truncate=True, tokenizer=tokenizer)

    # variables ride as jit ARGUMENTS, never a closure: closed-over device
    # arrays are inlined into the HLO as literal constants, which (a) made
    # the compile constant-fold 63M text-tower weights (~460 s on this
    # host, measured round 5), (b) serialized ~700 MB persistent-cache
    # entries, and (c) keyed the cache on the weight VALUES, so any
    # checkpoint change recompiled from scratch.
    encode = jax.jit(lambda v, toks: model.apply(
        v, toks, method=model.encode_text))

    b = min(batch_size, max(8, tokens.shape[0]))
    feats = []
    for i in range(0, tokens.shape[0], b):
        chunk = np.asarray(tokens[i: i + b])
        n = chunk.shape[0]
        if n < b:
            chunk = np.concatenate(
                [chunk, np.zeros((b - n,) + chunk.shape[1:],
                                 chunk.dtype)], axis=0)
        feats.append(encode(variables, jnp.asarray(chunk))[:n])
    flat = jnp.concatenate(feats, axis=0)

    tables: List[jnp.ndarray] = []
    off = 0
    for names in name_lists:
        block = flat[off: off + len(templates) * len(names)]
        off += block.shape[0]
        tables.append(
            block.reshape(len(templates), len(names), -1).mean(axis=0))
    return tables


def encode_class_text_features(model: CLIPModel, variables,
                               class_names: Sequence[str],
                               templates: Optional[Sequence[str]] = None,
                               tokenizer: Optional[SimpleTokenizer] = None,
                               batch_size: int = 512) -> jnp.ndarray:
    """Returns the ``[num_classes, embed_dim]`` template-averaged table."""
    return encode_class_text_tables(
        model, variables, [class_names], templates,
        tokenizer=tokenizer, batch_size=batch_size)[0]
